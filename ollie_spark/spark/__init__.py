"""Spark pipeline layer: session config, synthetic corpus, extraction,
entity linking (batch + incremental), graph materialization, streaming
(incl. continuous KG maintenance), temporal/event operators, text
curation ops, multimodal stages, and KG graph analytics."""
