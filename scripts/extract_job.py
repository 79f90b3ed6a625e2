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
    ap.add_argument("--build-graph", action="store_true",
                    help="time the FULL job (extract -> link -> "
                    "materialize all stages via job.build_graph) "
                    "instead of extraction alone")
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

    if args.build_graph:
        # full-pipeline leg (north_rule: the job, not just the map
        # stage): extract -> materialize -> link -> nodes/edges/nary,
        # every stage bucketed+manifested.  Fixed n_buckets so both
        # parallelism legs do identical work; repeats share the JVM, so
        # the best pass reports steady-state cost (first pass pays
        # python-worker startup + the data-independent codegen compile
        # of the minhash expressions, which amortizes to noise on any
        # long-lived production run).
        import shutil

        from ollie_spark.spark.job import build_graph

        job_sec, stage_rows, stage_walls, link_split = None, None, None, None
        for _ in range(max(1, args.repeat)):
            out_root = tempfile.mkdtemp(prefix="ollie-graph-")
            t0 = time.monotonic()
            m = build_graph(spark, docs, out_root, n_buckets=16)
            dt = time.monotonic() - t0
            if job_sec is None or dt < job_sec:
                job_sec = dt
                stage_rows = {k: v["rows"] for k, v in m.items()}
                stage_walls = {k: round(v["wall_ms"] / 1000.0, 3)
                               for k, v in m.items()}
                link_split = m.get("link", {}).get("split")
            shutil.rmtree(out_root, ignore_errors=True)
        print(json.dumps({
            "cores": cores,
            "n_docs": args.n_docs,
            "triples": stage_rows["mentions"],
            "extract_sec": round(job_sec, 3),   # full-job wall
            "docs_per_sec": round(args.n_docs / job_sec, 1),
            "triples_per_sec": round(stage_rows["mentions"] / job_sec, 1),
            "job_sec": round(job_sec, 3),
            "stage_rows": stage_rows,
            "stage_walls": stage_walls,
            "link_split": link_split,
        }))
        spark.stop()
        return

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
