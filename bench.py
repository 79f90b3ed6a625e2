#!/usr/bin/env python3
"""Benchmark: headline queries at $SPARK_GRAFT_SF_DIR on
local[$SPARK_GRAFT_CPUS].

Prints ONE JSON line:
  {"metric": "...", "value": N, "unit": "sec",
   "queries": {...}, "sf": ..., "extraction": {...}}

The headline metric is total wall time of the query battery; the
extraction block also reports documents/s and triples/s for the KG
pipeline (the reference's comparable number is 89 sentences/s single
thread, BASELINE.md).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))

# headline relational/training-data queries (oracle-checked subset that
# stresses distinct physical shapes)
HEADLINE = [
    "q01_pricing_summary",      # scan + hash agg
    "q02_top_customers",        # agg + broadcast join + topk
    "q04_frequent_parts_semijoin",
    "q05_diverse_suppliers",    # distinct agg
    "q07_running_window",       # window
    "q12_dedup_minhash",        # minhash LSH self-join
    "q13_dedup_simhash",        # simhash clustering
    "q14_ngram_jaccard_pairs",  # blocked jaccard join
    "q16_token_count",          # token stats
    "q18_ann_cosine_topk",      # brute-force ANN
    "q19_ivf_bucketed_ann",     # bucketed ANN
    "q21_embedding_neardup",    # cell-blocked cosine near-dup pairs
]

# how many synthetic interleaved docs to extract from, per lineitem row
# count (ties corpus size to SF)
DOCS_PER_SF = {"sf0.001": 1_000, "sf0.01": 4_000, "sf0.1": 20_000}


def main():
    import __spark_entry__ as em
    from ollie_spark.spark.corpus import corpus
    from ollie_spark.spark.pipeline import run_extraction
    from ollie_spark.spark.session import build_session

    spark = build_session("ollie-bench", master=f"local[{CPUS}]",
                          shuffle_partitions=max(CPUS, 8))
    spark.sparkContext.setLogLevel("ERROR")

    sf_name = os.path.basename(SF_DIR.rstrip("/"))
    sf = float(sf_name.replace("sf", "") or 0.1)

    queries = em.queries()
    timings = {}
    t_total0 = time.monotonic()
    for name in HEADLINE:
        t0 = time.monotonic()
        df = queries[name](spark, SF_DIR)
        n = df.count()
        timings[name] = round(time.monotonic() - t0, 3)
        _ = n

    # KG extraction throughput (corpus materialized first — the
    # pipeline's real input is a stored table, not a fused generator)
    import tempfile
    n_docs = DOCS_PER_SF.get(sf_name, 20_000)
    corpus_dir = tempfile.mkdtemp(prefix="ollie-bench-corpus-")
    corpus(spark, n_docs, seed=42, partitions=CPUS * 2) \
        .write.mode("overwrite").parquet(corpus_dir)
    docs = spark.read.parquet(corpus_dir).repartition(CPUS * 4)
    t0 = time.monotonic()
    mentions = run_extraction(docs).persist()
    n_triples = mentions.count()
    extract_sec = time.monotonic() - t0
    timings["kg_extract"] = round(extract_sec, 3)

    # linking + canonicalization over the extracted mentions
    from ollie_spark.spark.linking import canonicalize
    t0 = time.monotonic()
    link_split = {}
    link_caches = []
    _, nodes, edges = canonicalize(mentions, metrics_out=link_split,
                                   caches_out=link_caches)
    n_nodes, n_edges = nodes.count(), edges.count()
    for c in link_caches:  # release full-corpus caches post-count
        c.unpersist()
    timings["kg_link"] = round(time.monotonic() - t0, 3)
    timings["kg_link_normalize"] = link_split.get("normalize_sec", 0.0)
    timings["kg_link_lsh_cc"] = link_split.get("lsh_cc_sec", 0.0)
    timings["kg_link_map"] = link_split.get("canon_map_sec", 0.0)
    # the join residual excludes every named sub-stage (r6: normalize
    # runs eagerly inside the kg_link wall too — without subtracting it
    # the "join" line silently absorbed ~10s of normalization at 480k)
    timings["kg_link_join"] = round(
        timings["kg_link"] - timings["kg_link_normalize"]
        - timings["kg_link_lsh_cc"] - timings["kg_link_map"], 3)

    total = round(time.monotonic() - t_total0, 3)
    out = {
        "metric": "headline_queries_total_sec",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": sf,
        "extraction": {
            "docs": n_docs,
            "triples": n_triples,
            "docs_per_sec": round(n_docs / extract_sec, 1),
            "triples_per_sec": round(n_triples / extract_sec, 1),
            "nodes": n_nodes,
            "edges": n_edges,
            # blocking-cap observability: the fused metric rides the
            # same materialized band frame the linking join reads
            # (r5), so reporting it costs one count job, not a second
            # signature computation
            "dropped_buckets": link_split.get("dropped_buckets", 0),
            "cpus": CPUS,
        },
    }
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
