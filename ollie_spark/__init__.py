"""ollie_spark: a PySpark-native open-information-extraction and
knowledge-graph construction engine.

Re-expresses the capabilities of the knowitall/ollie reference
(dependency-path pattern extraction of (arg1; rel; arg2) triples with
attribution/enabling-condition context and a logistic confidence score)
as an idiomatic Spark pipeline:

- per-sentence extraction runs inside Arrow-batched ``mapInPandas``
  (one Python call per batch, plain-Python graph walks per row),
- everything around it (confidence scoring, dedup, entity linking,
  canonicalization, n-ary rollup, graph materialization) is declarative
  DataFrame code that Catalyst optimizes.

Layout:
    ollie_spark.graph       dependency-graph data model + pickle codec
    ollie_spark.model       pattern grammar, lemmatizer, word lists, model loader
    ollie_spark.extract     the extraction core (matcher, expansion, features)
    ollie_spark.spark       Spark pipeline stages (corpus, extract, link, materialize)
"""

__version__ = "0.1.0"
