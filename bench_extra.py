#!/usr/bin/env python3
"""Instrumented companion to the FROZEN bench.py (guide §1.4): same flow,
finer attribution.  Never used for the official numbers — it exists to
attribute the bench total (notably the corpus-materialization gap that
bench.py's per-query timers do not cover) and to time suspect queries in
isolation with the noop sink.

Usage:
  SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 SPARK_GRAFT_CPUS=32 \
      python bench_extra.py [names...]

With no args: the full bench flow with extra timers.  With query names:
only those queries, each counted AND noop-sunk, in a fresh session.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))

HEADLINE = [
    "q01_pricing_summary", "q02_top_customers",
    "q04_frequent_parts_semijoin", "q05_diverse_suppliers",
    "q07_running_window", "q12_dedup_minhash", "q13_dedup_simhash",
    "q14_ngram_jaccard_pairs", "q16_token_count", "q18_ann_cosine_topk",
    "q19_ivf_bucketed_ann", "q21_embedding_neardup",
]

DOCS_PER_SF = {"sf0.001": 1_000, "sf0.01": 4_000, "sf0.1": 20_000}


def main():
    import __spark_entry__ as em
    from ollie_spark.spark.corpus import corpus
    from ollie_spark.spark.pipeline import run_extraction
    from ollie_spark.spark.session import build_session

    spark = build_session("ollie-bench-extra", master=f"local[{CPUS}]",
                          shuffle_partitions=max(CPUS, 8))
    spark.sparkContext.setLogLevel("ERROR")
    sc = spark.sparkContext

    queries = em.queries()
    timings = {}
    only = sys.argv[1:]

    def clock(name, fn):
        sc.setJobDescription(name)
        t0 = time.monotonic()
        out = fn()
        timings[name] = round(time.monotonic() - t0, 3)
        sc.setJobDescription(None)
        return out

    if only:
        for name in only:
            clock(name, lambda: queries[name](spark, SF_DIR).count())
            clock(f"{name}_noop",
                  lambda: queries[name](spark, SF_DIR).write
                  .format("noop").mode("overwrite").save())
        print(json.dumps({"timings": timings}))
        spark.stop()
        return

    t_total0 = time.monotonic()
    for name in HEADLINE:
        clock(name, lambda: queries[name](spark, SF_DIR).count())

    import tempfile
    sf_name = os.path.basename(SF_DIR.rstrip("/"))
    n_docs = DOCS_PER_SF.get(sf_name, 20_000)
    corpus_dir = tempfile.mkdtemp(prefix="ollie-bx-corpus-")

    # attribute the bench.py corpus gap: warm the python workers with a
    # trivial python stage, then generate, then write
    clock("py_worker_warmup", lambda: spark.range(0, CPUS * 2, numPartitions=CPUS * 2)
          .mapInPandas(lambda it: it, schema="id long").count())
    cdf = corpus(spark, n_docs, seed=42, partitions=CPUS * 2)
    clock("corpus_noop", lambda: cdf.write.format("noop")
          .mode("overwrite").save())
    clock("corpus_write", lambda: cdf.write.mode("overwrite")
          .parquet(corpus_dir))
    docs = spark.read.parquet(corpus_dir).repartition(CPUS * 4)

    mentions_box = {}

    def _extract():
        m = run_extraction(docs).persist()
        mentions_box["m"] = m
        mentions_box["n"] = m.count()
    clock("kg_extract", _extract)

    from ollie_spark.spark.linking import canonicalize
    link_split = {}
    link_caches = []

    def _link():
        _, nodes, edges = canonicalize(mentions_box["m"],
                                       metrics_out=link_split,
                                       caches_out=link_caches)
        nodes.count(), edges.count()
    clock("kg_link", _link)
    for c in link_caches:
        c.unpersist()
    for k in ("normalize_sec", "lsh_cc_sec", "canon_map_sec"):
        timings[f"kg_link_{k}"] = link_split.get(k, 0.0)

    timings["TOTAL"] = round(time.monotonic() - t_total0, 3)
    print(json.dumps({"timings": timings, "triples": mentions_box["n"]}))
    spark.stop()


if __name__ == "__main__":
    main()
