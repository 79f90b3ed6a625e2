#!/usr/bin/env python3
"""End-to-end bootstrap demo: train a pattern model from corpus-derived
seeds, then evaluate it against the corpus oracle — writes TRAINING.md.

Exercises the full §2.2 chain at a non-toy size:
    seeds (lemma-grep rows from the synthetic corpus)
    -> B4 induction -> B5/B6 filters -> B7 histogram -> B8 prep
    generalization -> B9/B11 templates -> B14 confidence
    -> extraction with the *trained* model on held-out documents
    -> B17/B18 scoring (precision/yield, AUC) vs the corpus oracle.
"""

from __future__ import annotations

import random
import sys
from pathlib import Path

ROOT = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(ROOT))


def seed_rows(n_per_template: int, rng_seed: int = 11):
    from ollie_spark.model.lemmatizer import lemmatize
    from ollie_spark.model.wordlists import SIMPLE_PREPOSITIONS
    from ollie_spark.spark.synth import TEMPLATES

    stop = {"the", "a", "an", "is", "was", "be"} | set(SIMPLE_PREPOSITIONS)

    def content(s):
        return " ".join(lemmatize(w) for w in s.split()
                        if w.lower() not in stop)

    rows = []
    rng = random.Random(rng_seed)
    for _, build, _, sample in TEMPLATES:
        for _ in range(n_per_template):
            _, graph, expected = build(sample(rng))
            for a1, rel, a2, _, _ in expected:
                a1c, a2c = content(a1), content(a2)
                if not a1c or not a2c:
                    continue
                lemmas = " ".join(sorted(set(
                    (a1c + " " + content(rel) + " " + a2c).split())))
                rows.append((" ".join(lemmatize(w) for w in rel.split()),
                             a1c, a2c, lemmas, graph.serialize()))
    return rows


def main():
    from pyspark.sql import functions as F

    from ollie_spark.bootstrap.evaluate import auc, precision_yield, score
    from ollie_spark.bootstrap.stages import (SEED_SCHEMA,
                                              model_rows_to_extractors,
                                              train_model)
    from ollie_spark.extract.build import OpenParse, OpenParseConfig
    from ollie_spark.spark.corpus import corpus, expected_triples
    from ollie_spark.spark.session import build_session
    from ollie_spark.spark.pipeline import (MENTIONS_SCHEMA, sentences)

    spark = build_session("train-demo", master="local[16]",
                          shuffle_partitions=16)
    spark.sparkContext.setLogLevel("ERROR")

    n_seeds_per = 200
    seeds = spark.createDataFrame(seed_rows(n_seeds_per), SEED_SCHEMA)
    model_rows = train_model(seeds, max_length=4, min_common=5,
                             min_diverse=2).collect()

    # extract on held-out docs with the TRAINED model
    extractors = model_rows_to_extractors([r.asDict() for r in model_rows])

    n_docs = 2000
    docs = corpus(spark, n_docs, seed=1234, partitions=32)
    sents = sentences(docs)

    bc = spark.sparkContext.broadcast(
        [(r["template"], r["pattern"], float(r["conf"]))
         for r in (x.asDict() for x in model_rows)])

    def run(batches):
        import pandas as pd
        from ollie_spark.bootstrap.stages import model_rows_to_extractors
        from ollie_spark.extract.build import OpenParse
        from ollie_spark.spark.synth import parse_text
        ops = OpenParse(model_rows_to_extractors(
            [{"template": t, "pattern": p, "conf": c}
             for t, p, c in bc.value]))
        for pdf in batches:
            rows = []
            for doc_id, span_idx, text in zip(pdf["doc_id"],
                                              pdf["span_idx"],
                                              pdf["text"]):
                g = parse_text(text)
                if g is None:
                    continue
                for conf, extr, _ in ops.extract(g):
                    rows.append({"doc_id": doc_id,
                                 "span_idx": int(span_idx),
                                 "arg1_text": extr.arg1.text,
                                 "rel_text": extr.rel.text,
                                 "arg2_text": extr.arg2.text,
                                 "conf": float(conf)})
            yield pd.DataFrame(rows, columns=[
                "doc_id", "span_idx", "arg1_text", "rel_text",
                "arg2_text", "conf"])

    mentions = sents.mapInPandas(
        run, schema="doc_id string, span_idx int, arg1_text string, "
                    "rel_text string, arg2_text string, conf double")

    gold_rows = set()
    for i in range(n_docs):
        d = f"doc-{i:012d}"
        for a, r, b, _, _ in expected_triples(d, seed=1234):
            gold_rows.add((f"{a}; {r}; {b}", 1))
    gold = spark.createDataFrame(sorted(gold_rows),
                                 "triple string, label int")

    scored = score(mentions.withColumn("pattern", F.lit("")), gold)
    n_extr = scored.count()
    n_hit = scored.where("label = 1").count()
    py = precision_yield(scored)
    a = auc(py)
    n_gold = len(gold_rows)
    recall_ub = (scored.where("label = 1")
                 .select("triple").distinct().count()) / n_gold

    md = f"""# TRAINING — bootstrap pipeline demo (trained-from-scratch model)

Seeds: {n_seeds_per} per template ({seeds.count()} rows) from the
synthetic bank (training RNG seed 11); model trained with
min_common=5, min_diverse=2, max pattern length 4.

Learned model: {len(model_rows)} (template, pattern, conf) rows.

Held-out evaluation: {n_docs} fresh documents (corpus seed 1234),
extraction with ONLY the trained model:

| metric | value |
|---|---|
| extractions | {n_extr} |
| matching corpus oracle | {n_hit} ({n_hit / max(n_extr, 1):.3f} precision) |
| distinct gold triples recovered | {recall_ub:.3f} of {n_gold} |
| precision-yield AUC | {a:.3f} |

Learned patterns:

"""
    for r in sorted(model_rows, key=lambda r: -r["conf"])[:20]:
        md += f"- `{r['template']}` · `{r['pattern']}` · {r['conf']:.3f}\n"
    (ROOT / "TRAINING.md").write_text(md)
    print(md)
    spark.stop()


if __name__ == "__main__":
    main()
