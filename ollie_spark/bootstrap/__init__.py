"""Bootstrap / model-training pipeline: pattern induction from seed
triples, pattern filtering, template building, and confidence training
(SURVEY.md §2.2, reference openparse/BuildPatterns.scala +
template/BuildTemplates.scala)."""
