#!/usr/bin/env python3
"""Dump formatted physical plans for the headline queries -> PLANS.md.

The plan review checklist this exists for (and asserts in
tests/test_plans.py):
- parquet scans carry PushedFilters / pruned ReadSchema
- dimension joins are BroadcastHashJoin, not SortMergeJoin
- the MinHash signature computation has no Exchange
- the extraction pipeline has no shuffle before linking/rollup
"""

from __future__ import annotations

import os
import sys
from pathlib import Path

ROOT = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(ROOT))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")

PLAN_QUERIES = [
    "q01_pricing_summary", "q02_top_customers", "q03_region_rollup",
    "q04_frequent_parts_semijoin", "q07_running_window",
    "q12_dedup_minhash", "q14_ngram_jaccard_pairs",
    "q18_ann_cosine_topk", "q23_lang_id",
    "q24_stratified_hash_sample", "q25_neardup_prune",
    "q26_corpus_term_stats", "q27_decontaminate",
    "q28_repetition_signals", "q29_tfidf_keywords",
    "q31_pii_scrub", "q32_mixture_weights", "q33_pack_shards",
    "q34_line_dedup", "q35_dup_spans",
    "q37_sessionize", "q38_asof_purchase", "q40_session_stats",
    "q42_hopping_rollup", "q43_bm25_search", "q45_cohort_retention",
    "q46_conversion_funnel", "q47_data_quality", "q48_rolling_daily",
]


def main():
    import __spark_entry__ as em
    from ollie_spark.spark.session import build_session

    spark = build_session("plans", master="local[4]",
                          shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")
    out = ["# PLANS — physical plans of the headline queries",
           "", f"Scale dir: {SF_DIR}. Regenerate: "
           "`python scripts/explain_plans.py`.", ""]
    qs = em.queries()
    for name in PLAN_QUERIES:
        df = qs[name](spark, SF_DIR)
        plan = df._jdf.queryExecution().explainString(
            spark._jvm.org.apache.spark.sql.execution
            .ExplainMode.fromString("formatted"))
        out += [f"## {name}", "", "```", plan.strip(), "```", ""]

    # the extraction pipeline plan (shuffle-free claim)
    from ollie_spark.spark.corpus import corpus
    from ollie_spark.spark.pipeline import run_extraction
    m = run_extraction(corpus(spark, 100, seed=42, partitions=4))
    plan = m._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution
        .ExplainMode.fromString("formatted"))
    out += ["## extraction_pipeline", "", "```", plan.strip(), "```", ""]

    (ROOT / "PLANS.md").write_text("\n".join(out))
    print(f"wrote {ROOT/'PLANS.md'}")
    spark.stop()


if __name__ == "__main__":
    main()
