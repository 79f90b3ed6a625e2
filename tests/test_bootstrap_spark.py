"""End-to-end model-training tests: seeds -> induced pattern model ->
extraction with the trained model; evaluation harness; confidence
training."""

import pytest
from pyspark.sql import functions as F

from ollie_spark.bootstrap.stages import (SEED_SCHEMA, induce_patterns,
                                          model_rows_to_extractors,
                                          train_model)
from ollie_spark.bootstrap.evaluate import (auc, precision_yield,
                                            rank_patterns, score,
                                            triple_key)
from ollie_spark.extract.build import OpenParse
from ollie_spark.graph import DependencyGraph
from ollie_spark.model.lemmatizer import lemmatize
from ollie_spark.spark.synth import TEMPLATES


def _seed_rows(n_per_template=6):
    """Seeds derived from the synthetic sentence bank: (rel, arg1,
    arg2, lemmas, pickled) in the reference's lemma-grep shape."""
    import random

    from ollie_spark.model.wordlists import SIMPLE_PREPOSITIONS
    stop = {"the", "a", "an", "is", "was", "be"} | set(SIMPLE_PREPOSITIONS)

    def content(s):
        return " ".join(lemmatize(w) for w in s.split()
                        if w.lower() not in stop)

    rows = []
    rng = random.Random(7)
    for _, build, _, sample in TEMPLATES:
        for _ in range(n_per_template):
            text, graph, expected = build(sample(rng))
            for a1, rel, a2, _, _ in expected:
                a1c, a2c = content(a1), content(a2)
                if not a1c or not a2c:
                    continue
                lemmas = " ".join(sorted(set(
                    (a1c + " " + content(rel) + " " + a2c).split())))
                rel_lemma = " ".join(lemmatize(w) for w in rel.split())
                rows.append((rel_lemma, a1c, a2c, lemmas,
                             graph.serialize()))
    return rows


@pytest.fixture(scope="module")
def seeds(spark):
    return spark.createDataFrame(_seed_rows(), SEED_SCHEMA).cache()


def test_induction_stage(seeds):
    induced = induce_patterns(seeds, max_length=4)
    rows = induced.collect()
    assert len(rows) > 0
    pats = {r.pattern for r in rows}
    # the canonical active pattern must be learned
    assert any("<nsubj<" in p and ">dobj>" in p for p in pats)


def test_train_model_end_to_end(spark, seeds):
    model = train_model(seeds, max_length=4, min_common=2,
                        min_diverse=2).collect()
    assert len(model) > 0
    assert all(0.0 < r.conf <= 1.0 for r in model)

    # the trained model extracts from a held-out sentence
    extractors = model_rows_to_extractors(
        [r.asDict() for r in model])
    op = OpenParse(extractors)
    g = DependencyGraph.deserialize(
        "nn(Meyer_NNP_1_0, Tina_NNP_0_0); "
        "nsubj(founded_VBD_2_0, Meyer_NNP_1_0); "
        "dobj(founded_VBD_2_0, library_NN_4_0); "
        "det(library_NN_4_0, the_DT_3_0); "
        "punct(founded_VBD_2_0, ._._5_0)")
    got = {str(e) for _, e, _ in op.extract(g)}
    assert "(Tina Meyer; founded; the library)" in got


def test_eval_harness(spark):
    from ollie_spark.spark.corpus import corpus
    from ollie_spark.spark.pipeline import run_extraction
    from ollie_spark.spark.corpus import expected_triples

    docs = corpus(spark, 40, seed=42, partitions=2)
    mentions = run_extraction(docs)
    gold_rows = []
    for i in range(40):
        for a, r, b, _, _ in expected_triples(f"doc-{i:012d}"):
            gold_rows.append((f"{a}; {r}; {b}", 1))
    gold = spark.createDataFrame(
        list({g for g in gold_rows}), "triple string, label int")

    scored = score(mentions, gold)
    assert scored.where("label = 1").count() > 0

    py = precision_yield(scored)
    rows = py.orderBy("n").collect()
    assert all(0 <= r.precision <= 1 for r in rows)
    a = auc(py)
    assert 0.5 < a <= 1.0  # most extractions match the oracle

    rp = rank_patterns(scored)
    assert rp.count() > 0


def test_train_confidence(spark):
    from ollie_spark.bootstrap.train_confidence import (
        cross_validate_confidence, train_confidence)
    from ollie_spark.extract.features import feature_names
    from ollie_spark.model.loader import load_classifier
    from ollie_spark.spark.corpus import corpus, expected_triples
    from ollie_spark.spark.pipeline import extract_mentions, sentences

    _, weights = load_classifier()
    order = feature_names(weights)

    docs = corpus(spark, 60, seed=42, partitions=2)
    m = extract_mentions(sentences(docs)).where("error is null")
    gold = set()
    for i in range(60):
        for a, r, b, _, _ in expected_triples(f"doc-{i:012d}"):
            gold.add((f"doc-{i:012d}", a, r, b))
    gold_df = spark.createDataFrame(
        [(d, a, r, b, 1) for d, a, r, b in gold],
        "doc_id string, arg1_text string, rel_text string, "
        "arg2_text string, label int")
    labelled = (m.join(gold_df,
                       ["doc_id", "arg1_text", "rel_text", "arg2_text"],
                       "left")
                .withColumn("label", F.coalesce("label", F.lit(0)))
                .select("features", "label"))
    intercept, w = train_confidence(labelled, order)
    assert len(w) == len(order)
    acc = cross_validate_confidence(labelled, folds=3)
    assert acc > 0.5


# -------------------------- B13 matcher-level reflections (round 2)

def test_reflect_row_matcher_goldens():
    """PassiveReflections.scala:54-96 semantics: arg captures swap
    wholesale (constraints travel), path untouched, 'be ' template
    gate, nsubj branch wins when both labels present."""
    from ollie_spark.bootstrap.stages import reflect_row

    # nsubj + no 'be ' prefix -> passive twin, constraints travel
    t, p = reflect_row(
        "acquire", "{arg1} <nsubj< {rel:postag=VBD} >dobj> "
                   "{arg2:postag=NNP}")
    assert t == "be acquire"
    assert p == "{arg2:postag=NNP} <nsubj< {rel:postag=VBD} >dobj> {arg1}"

    # nsubjpass + 'be ' prefix -> active twin, prefix stripped
    t, p = reflect_row(
        "be elect", "{arg1} <nsubjpass< {rel:postag=VBN} >prep_of> "
                    "{arg2}")
    assert t == "elect"
    assert p == "{arg2} <nsubjpass< {rel:postag=VBN} >prep_of> {arg1}"

    # gates: nsubj with 'be ' already, nsubjpass without, neither label
    assert reflect_row("be own", "{arg1} <nsubj< {rel} >dobj> {arg2}") \
        is None
    assert reflect_row("own", "{arg1} <nsubjpass< {rel} >dobj> {arg2}") \
        is None
    assert reflect_row("own", "{arg1} <amod< {rel} >dobj> {arg2}") is None

    # nsubj ANYWHERE in the path triggers (baseEdgeMatchers.exists)
    t, p = reflect_row(
        "say", "{arg1} >dobj> {rel:postag=VB} <nsubj< {arg2}")
    assert t == "be say" and p.startswith("{arg2}")

    # both labels -> nsubj branch only (if/else-if): 'be ' template
    # blocks it even though the nsubjpass branch would have fired
    assert reflect_row(
        "be mix", "{arg1} <nsubj< {rel} >nsubjpass> {arg2}") is None


def test_reflected_pattern_binds_swapped_args():
    """Behavioral golden: the reflected pattern run over the same graph
    binds arg1/arg2 swapped relative to the original."""
    from ollie_spark.bootstrap.stages import reflect_row
    from ollie_spark.model.patterns import Pattern, match_pattern
    from ollie_spark.spark.synth import FIXTURE_PARSES
    from ollie_spark.graph import DependencyGraph

    text = "Juliette has a crush on Romeo ."
    graph = DependencyGraph.deserialize(FIXTURE_PARSES[text], text=text) \
        .collapse()
    orig = Pattern.deserialize(
        "{arg1} <nsubj< {rel:postag=VBZ} >dobj> {arg2}")
    m0 = next(iter(match_pattern(orig, graph)))
    a1 = m0.group_text("arg1")
    a2 = m0.group_text("arg2")
    assert (a1, a2) == ("Juliette", "crush")

    _, refl = reflect_row("have", orig.serialize())
    m1 = next(iter(match_pattern(Pattern.deserialize(refl), graph)))
    assert (m1.group_text("arg1"), m1.group_text("arg2")) == (a2, a1)


def test_passive_reflections_frame(spark):
    """Frame-level B13: originals survive, twins appear with the same
    count, non-reflectable rows pass through untouched."""
    from ollie_spark.bootstrap.stages import passive_reflections

    rows = [("acquire", "{arg1} <nsubj< {rel:postag=VBD} >dobj> {arg2}",
             10),
            ("be bear", "{arg1} <nsubjpass< {rel:postag=VBN} >prep_in> "
             "{arg2}", 7),
            ("of", "{arg1} >prep_of> {arg2} <amod< {rel}", 3)]
    tpl = spark.createDataFrame(
        rows, "template string, pattern string, count long")
    got = {(r.template, r.pattern): r['count']
           for r in passive_reflections(tpl).collect()}
    assert len(got) == 5
    assert got[("be acquire",
                "{arg2} <nsubj< {rel:postag=VBD} >dobj> {arg1}")] == 10
    assert got[("bear",
                "{arg2} <nsubjpass< {rel:postag=VBN} >prep_in> "
                "{arg1}")] == 7
    assert got[("of", "{arg1} >prep_of> {arg2} <amod< {rel}")] == 3
