"""Model layer: pattern grammar, lemmatizer, word lists, model loading."""
