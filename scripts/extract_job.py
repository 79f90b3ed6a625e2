#!/usr/bin/env python3
"""Standalone spark-submit job: synthetic corpus -> extraction
(-> optional linking + materialize), printing one metrics JSON line.

Usage (the north_rule's cluster-size protocol; see BASELINE.md):
    spark-submit --master local[8]  --py-files ollie_spark.zip \
        scripts/extract_job.py --n-docs 20000
    spark-submit --master local[32] --py-files ollie_spark.zip \
        scripts/extract_job.py --n-docs 20000
"""

from __future__ import annotations

import argparse
import json
import time

from pyspark.sql import SparkSession


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n-docs", type=int, default=20000)
    ap.add_argument("--seed", type=int, default=42)
    ap.add_argument("--repeat", type=int, default=3,
                    help="extraction passes; best is reported (first "
                    "pass pays python-worker startup)")
    ap.add_argument("--link", action="store_true",
                    help="also run linking + canonicalization")
    ap.add_argument("--output", default=None,
                    help="materialize mentions to this root dir")
    args = ap.parse_args()

    spark = SparkSession.builder.appName("ollie-extract-job").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    from ollie_spark.spark.corpus import corpus
    from ollie_spark.spark.pipeline import run_extraction

    cores = spark.sparkContext.defaultParallelism
    # materialize the corpus like a real table scan: the pipeline's
    # input is a stored table, not a python generator fused into the
    # extraction stage
    import tempfile
    corpus_dir = tempfile.mkdtemp(prefix="ollie-corpus-")
    corpus(spark, args.n_docs, seed=args.seed,
           partitions=cores * 2).write.mode("overwrite").parquet(corpus_dir)
    # repartition for the CPU-bound extraction stage: parquet splits by
    # bytes, but the cost driver here is rows-of-text per task
    docs = spark.read.parquet(corpus_dir).repartition(cores * 4)

    mentions = run_extraction(docs)
    extract_sec, n_triples = None, 0
    for _ in range(max(1, args.repeat)):
        t0 = time.monotonic()
        if args.output:
            from ollie_spark.spark.materialize import StageWriter
            writer = StageWriter(spark, args.output,
                                 n_buckets=max(cores, 8))
            stats = writer.run_stage("mentions", mentions)
            n_triples = stats["rows"]
        else:
            n_triples = mentions.count()
        dt = time.monotonic() - t0
        extract_sec = dt if extract_sec is None else min(extract_sec, dt)

    link_sec = None
    n_nodes = n_edges = None
    if args.link:
        from ollie_spark.spark.linking import canonicalize
        t0 = time.monotonic()
        _, nodes, edges = canonicalize(mentions)
        n_nodes, n_edges = nodes.count(), edges.count()
        link_sec = round(time.monotonic() - t0, 3)

    print(json.dumps({
        "cores": cores,
        "n_docs": args.n_docs,
        "triples": n_triples,
        "extract_sec": round(extract_sec, 3),
        "docs_per_sec": round(args.n_docs / extract_sec, 1),
        "triples_per_sec": round(n_triples / extract_sec, 1),
        "link_sec": link_sec,
        "nodes": n_nodes,
        "edges": n_edges,
    }))
    spark.stop()


if __name__ == "__main__":
    main()
