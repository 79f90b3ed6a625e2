"""Spark pipeline layer: session config, synthetic corpus, extraction,
entity linking, graph materialization."""
