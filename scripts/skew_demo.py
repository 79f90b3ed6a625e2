#!/usr/bin/env python3
"""Skew proof at force for the >1M-entity linking path (r5 judge item 4).

``_fused_salted_link`` (ollie_spark/spark/linking.py) is the join
canonicalize() switches to when the canonical map outgrows broadcast;
it was equivalence-tested at toy scale but had never run at size
against a genuinely skewed corpus.  This script:

1. builds the bench corpus's mentions (default 60k docs, ~300k
   mentions) and PLANTS a head entity: one canonical surface form
   overwrites arg1_text on ~20% of mention rows ("Obama"-class key —
   the exact shape that pins a single reducer in a naive equi-join);
2. drives the fused salted join directly (the canonicalize wiring is
   exercised separately with broadcast_map_threshold=0 to prove the
   switch engages);
3. records, for salt=1 (degenerate: what an unsalted join does) vs
   salt=8 (the default): the join wall and the REDUCER DISTRIBUTION —
   rows per (norm, _salt) shuffle key for the hot entity, and rows per
   actual output partition (spark_partition_id) of the join stage.

The evidence of correct skew handling is the distribution table: at
salt=8 the hot key's rows split ~evenly over 8 shuffle keys and the
max task input drops ~8x; wall at sandbox scale moves less (300k rows
is small next to join fixed costs) and is reported honestly alongside.

Appends nothing; prints a markdown section to paste into
BENCH/BASELINE.md plus one raw-JSON line.
"""

from __future__ import annotations

import argparse
import json
import statistics
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from pyspark.sql import functions as F

HOT = "barack obama"


def build_mentions(spark, n_docs: int):
    from ollie_spark.spark.corpus import corpus
    from ollie_spark.spark.pipeline import run_extraction

    import tempfile

    cdir = tempfile.mkdtemp(prefix="skew-corpus-")
    corpus(spark, n_docs, seed=42, partitions=128) \
        .write.mode("overwrite").parquet(cdir)
    mdir = tempfile.mkdtemp(prefix="skew-mentions-")
    run_extraction(spark.read.parquet(cdir)) \
        .write.mode("overwrite").parquet(mdir)
    return spark.read.parquet(mdir)


def plant_head_entity(mentions, frac_mod: int = 5):
    """Overwrite arg1_text with the hot surface form on ~1/frac_mod of
    rows (deterministic hash pick, replayable)."""
    pick = F.pmod(F.xxhash64("doc_id", "span_idx"), F.lit(frac_mod)) == 0
    return mentions.withColumn(
        "arg1_text", F.when(pick, F.lit("Barack Obama"))
        .otherwise(F.col("arg1_text")))


def run_leg(spark, m, salt: int):
    """One fused-salted-link leg -> (wall, skew stats).

    Runs with autoBroadcastJoinThreshold=-1 and AQE off: the fused
    salted path exists for the regime where the canonical map is too
    big to broadcast, but the demo's map (hundreds of synthetic
    entities) would auto-broadcast — which has no reducer to skew and
    would make the task-input column meaningless.  Forcing the shuffle
    join measures the actual >1M-entity physics; AQE (skew-join
    mitigation) stays ON in production as the second line of defense
    and is disabled here only so the table isolates what the SALT does.
    """
    from ollie_spark.spark.linking import (_fused_salted_link,
                                           entity_mentions,
                                           normalize_entity)

    # canonical map: every distinct norm -> its own node id (isolates
    # the join from LSH/CC; map size ~ distinct entities, realistic)
    ments = entity_mentions(m)
    norm_to_node = (ments.select("norm").distinct()
                    .withColumn("node_id", F.xxhash64("norm")))
    mm = (m.withColumn("_a1", normalize_entity(F.col("arg1_text")))
          .withColumn("_a2", normalize_entity(F.col("arg2_text"))))

    prev_bc = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    prev_aqe = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try:
        t0 = time.monotonic()
        linked = _fused_salted_link(mm, norm_to_node, salt=salt)
        n_linked = linked.count()
        wall = time.monotonic() - t0

        # reducer-side distribution evidence, keyed EXACTLY the way
        # the production join keys its shuffle (shared helpers — no
        # hand-mirrored copy to drift): rows per (norm, _salt) shuffle
        # key for the hot entity, and rows per actual post-shuffle
        # partition of the joined frame (spark_partition_id on the
        # shuffled-join output = task input)
        from ollie_spark.spark.linking import (LINK_SALT_COLS,
                                               _keyed_long_mentions,
                                               salted_join)
        _, long = _keyed_long_mentions(mm)
        hit = salted_join(long, norm_to_node, "norm", salt=salt,
                          keep_salt=True, salt_cols=LINK_SALT_COLS)
        hot_by_salt = [r["count"] for r in
                       hit.where(F.col("norm") == HOT)
                       .groupBy("_salt").count().collect()]
        part_sizes = [r["count"] for r in
                      hit.groupBy(F.spark_partition_id().alias("p"))
                      .count().collect()]
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev_bc)
        spark.conf.set("spark.sql.adaptive.enabled", prev_aqe)
    return {
        "salt": salt,
        "wall_sec": round(wall, 2),
        "linked_rows": n_linked,
        "hot_rows_total": int(sum(hot_by_salt)),
        "hot_shuffle_keys": len(hot_by_salt),
        "hot_rows_per_salt_max": max(hot_by_salt),
        "hot_rows_per_salt_min": min(hot_by_salt),
        "task_input_max": max(part_sizes),
        "task_input_median": int(statistics.median(part_sizes)),
        "n_tasks": len(part_sizes),
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n-docs", type=int, default=60000)
    ap.add_argument("--cores", type=int, default=32)
    args = ap.parse_args()

    from ollie_spark.spark.session import build_session
    spark = build_session("skew-demo", master=f"local[{args.cores}]",
                          shuffle_partitions=args.cores)
    m = plant_head_entity(build_mentions(spark, args.n_docs))
    n_m = m.count()
    n_hot = m.where(F.lower("arg1_text") == F.lit(HOT)).count()

    # prove the canonicalize switch actually engages the fused path at
    # threshold 0 (row parity with the broadcast path on planted data)
    from ollie_spark.spark.linking import canonicalize
    lb, _, _ = canonicalize(m)
    lf, _, _ = canonicalize(m, broadcast_map_threshold=0)
    nb, nf = lb.count(), lf.count()

    legs = [run_leg(spark, m, salt=1), run_leg(spark, m, salt=8),
            run_leg(spark, m, salt=1), run_leg(spark, m, salt=8)]

    print(f"""
## Skew at force: _fused_salted_link with a planted head entity (r5)

Corpus: {args.n_docs} docs -> {n_m} mentions; planted head entity
"{HOT}" on {n_hot} mention rows (~{100.0 * n_hot / n_m:.0f}% of arg1) —
the "Obama"-class key that pins one reducer in a naive equi-join.
canonicalize(broadcast_map_threshold=0) row-parity with the broadcast
path on the planted corpus: {nb} vs {nf} rows ({"MATCH" if nb == nf else "MISMATCH"}).

| leg | salt | join wall (s) | hot-key shuffle keys | hot rows/salt (max/min) | task input max | task input median |
|---|---|---|---|---|---|---|""")
    for i, s in enumerate(legs):
        print(f"| {i + 1} | {s['salt']} | {s['wall_sec']} | "
              f"{s['hot_shuffle_keys']} | {s['hot_rows_per_salt_max']} / "
              f"{s['hot_rows_per_salt_min']} | {s['task_input_max']} | "
              f"{s['task_input_median']} |")
    print()
    print("RAW " + json.dumps({"n_mentions": n_m, "n_hot": n_hot,
                               "parity": [nb, nf], "legs": legs}))
    spark.stop()


if __name__ == "__main__":
    main()
