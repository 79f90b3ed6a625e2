"""B1-B3 seed stages, B8 preposition generalization, B21 bootstrap
significance, and the Brat sink."""

from pyspark.sql import functions as F

from ollie_spark.bootstrap.seeds import (filter_target_extractions,
                                         find_target_arguments,
                                         find_target_extractions)
from ollie_spark.bootstrap.stages import generalize_prepositions


def test_find_target_arguments(spark):
    df = spark.createDataFrame(
        [("the Obama", "the obama", "DT NNP", 10),
         ("the Obama", "the obama", "DT NNP", 5),
         ("New York", "new york", "NNP NNP", 9),
         ("big dog", "big dog", "JJ NN", 50),        # not proper
         ("Inc", "inc", "NNP", 99),                   # blacklisted
         ("under_score", "under_score", "NNP", 99)],  # has '_'
        "string string, lemma string, postag string, count int")
    got = {r.arg_lemma: r.total
           for r in find_target_arguments(df, lower_bound=8).collect()}
    assert got == {"obama": 15, "new york": 9}


def test_find_and_filter_target_extractions(spark):
    ex_rows = []
    # 20 occurrences of a good seed (relation gets > 15 seeds)
    for i in range(20):
        ex_rows.append(("bear in", f"obama{i}", "hawaii", "NNP", "VBN IN",
                        "NNP", f"obama{i} bear hawaii", 2))
    # negated -> dropped
    ex_rows.append(("be not bear in", "obamax", "hawaii", "NNP",
                    "VBN RB IN", "NNP", "obamax bear hawaii", 2))
    # args equal -> dropped
    ex_rows.append(("bear in", "hawaii", "hawaii", "NNP", "VBN IN",
                    "NNP", "hawaii bear", 2))
    ex = spark.createDataFrame(
        ex_rows,
        "rel_lemma string, arg1_lemma string, arg2_lemma string, "
        "arg1_postag string, rel_postag string, arg2_postag string, "
        "all_lemmas string, count int")
    freq = spark.createDataFrame(
        [(f"obama{i}",) for i in range(20)] + [("hawaii",)],
        "arg_lemma string")
    seeds = find_target_extractions(ex, freq)
    rows = seeds.collect()
    # each surviving row replicated count=2 times
    assert len(rows) == 40
    assert all(r.rel_lemma == "bear in" for r in rows)

    kept = filter_target_extractions(seeds, min_relation_seeds=15)
    k = kept.collect()
    assert len(k) == 20  # distinct seeds, each seen twice
    assert all(r.rel_lemma == "bear in" for r in k)


def test_generalize_prepositions(spark):
    hist = spark.createDataFrame(
        [("bear in", "{arg1} <nsubjpass< {rel:postag=VBN} >prep_in> {arg2}",
          4),
         ("marry", "{arg1} <nsubj< {rel:postag=VBD} >dobj> {arg2}", 3)],
        "rel string, pattern string, count long")
    got = {r.rel: r.pattern for r in
           generalize_prepositions(hist).collect()}
    assert got["bear {prep}"] == (
        "{arg1} <nsubjpass< {rel:postag=VBN} >{prep:regex=prep_(.*)}> "
        "{arg2}")
    assert got["marry"] == \
        "{arg1} <nsubj< {rel:postag=VBD} >dobj> {arg2}"


def test_paired_bootstrap_significance(spark):
    from ollie_spark.bootstrap.evaluate import (
        paired_bootstrap_significance)
    rows_a, rows_b = [], []
    for i in range(30):
        # system A is right 90% of the time, B 10%
        rows_a.append((f"d{i}", 0, 1 if i % 10 else 0))
        rows_b.append((f"d{i}", 0, 0 if i % 10 else 1))
    schema = "doc_id string, span_idx int, label int"
    a = spark.createDataFrame(rows_a, schema)
    b = spark.createDataFrame(rows_b, schema)
    p = paired_bootstrap_significance(a, b, iterations=50)
    assert p < 0.05  # A clearly better
    p_self = paired_bootstrap_significance(a, a, iterations=20)
    assert p_self == 1.0


def test_feature_evaluation_dump(spark):
    """OllieFeatureEvaluation parity (confidence/OllieFeatureEvaluation
    .scala:80-100): one column per named feature in the reference's
    sorted order, and the dumped columns reproduce conf exactly —
    sigmoid(intercept + w·f) recomputed row-by-row from the table."""
    import math

    from ollie_spark.bootstrap.evaluate import feature_evaluation
    from ollie_spark.extract.features import feature_names
    from ollie_spark.model.loader import load_classifier
    from ollie_spark.spark.corpus import corpus
    from ollie_spark.spark.pipeline import extract_mentions, sentences

    intercept, weights = load_classifier()
    order = feature_names(weights)
    m = extract_mentions(sentences(corpus(spark, 30, seed=7,
                                          partitions=2)))
    fe = feature_evaluation(m)
    assert fe.columns[-len(order):] == order
    rows = fe.collect()
    assert rows
    for r in rows[:25]:
        z = intercept + sum(weights[n] * r[n] for n in order)
        assert abs(r.conf - 1.0 / (1.0 + math.exp(-z))) < 1e-9
    confs = [r.conf for r in rows]
    assert confs == sorted(confs, reverse=True)


def test_feature_evaluation_labeled_adds_yield_precision(spark):
    """With a gold label column the dump grows the reference's running
    yield / precision pair over the conf-descending scan."""
    from ollie_spark.bootstrap.evaluate import feature_evaluation
    from ollie_spark.spark.corpus import corpus
    from ollie_spark.spark.pipeline import extract_mentions, sentences

    m = (extract_mentions(sentences(corpus(spark, 20, seed=11,
                                           partitions=2)))
         .withColumn("gold", (F.col("span_idx") % 2 == 0).cast("int")))
    fe = feature_evaluation(m, label_col="gold").collect()
    assert fe
    run = 0
    for i, r in enumerate(fe, start=1):
        run += r.score
        assert r.yld == run
        assert abs(r.precision - run / i) < 1e-12


def test_brat_output():
    from ollie_spark.extract.ollie import Ollie
    from ollie_spark.extract.serialize import brat_output
    from ollie_spark.spark.synth import parse_text
    text = "OpenParse finds an example extraction ."
    g = parse_text(text)
    results = Ollie().extract(g)
    out = brat_output(g, results).splitlines()
    # reference labeling (BratOutput.scala:37-57): args labelled first
    # (T0, T1), relation T2 printed first, R* are Arg1-of / Arg2-of
    assert out[0] == "T2\tRelation 10 15\tfinds"
    assert out[1] == "T0\tArgument 0 9\tOpenParse"
    assert out[2] == "T1\tArgument 16 37\tan example extraction"
    assert out[3] == "R0\tArg1-of Arg1:T2 Arg2:T0"
    assert out[4] == "R1\tArg2-of Arg1:T2 Arg2:T1"


def test_brat_output_real_char_offsets():
    """Punctuation-adjacent tokens: node char offsets locate 'Oslo'
    inside 'Oslo.' exactly; whitespace reconstruction (which sees one
    token 'Oslo.') would bleed the period into the span."""
    from ollie_spark.extract.serialize import brat_output
    from ollie_spark.graph import DependencyGraph

    text = "Obama visited Oslo."
    pickled = ("punct(visited_VBD_1_6, ._._3_18); "
               "nsubj(visited_VBD_1_6, Obama_NNP_0_0); "
               "dobj(visited_VBD_1_6, Oslo_NNP_2_14)")
    g = DependencyGraph.deserialize(pickled, text=text)

    class R:
        arg1_span, rel_span, arg2_span = (0, 1), (1, 2), (2, 3)

    out = brat_output(g, [R()]).splitlines()
    assert out[0] == "T2\tRelation 6 13\tvisited"
    assert out[1] == "T0\tArgument 0 5\tObama"
    assert out[2] == "T1\tArgument 14 18\tOslo"   # NOT 'Oslo.'
    # document coordinates via the Segment offset
    shifted = brat_output(g, [R()], sentence_offset=100).splitlines()
    assert shifted[2] == "T1\tArgument 114 118\tOslo"
    # a graph whose offsets can't locate their tokens (zeroed) falls
    # back to whitespace reconstruction instead of garbage substrings
    zeroed = ("punct(visited_VBD_1_0, ._._3_0); "
              "nsubj(visited_VBD_1_0, Obama_NNP_0_0); "
              "dobj(visited_VBD_1_0, Oslo_NNP_2_0)")
    gz = DependencyGraph.deserialize(zeroed, text="Obama visited Oslo .")
    outz = brat_output(gz, [R()]).splitlines()
    assert outz[1] == "T0\tArgument 0 5\tObama"
    assert outz[2] == "T1\tArgument 14 18\tOslo"


def test_slot_semantics(spark):
    from ollie_spark.bootstrap.stages import slot_semantics
    rows = [("arrive in", "a", "b", "l",
             "{arg1} <nsubj< {rel:postag=VBD} <rcmod< {slot0:postag=NN} "
             ">prep_to> {arg2}", ["trip"])] * 6
    rows += [("arrive in", "a", "b", "l",
              "{arg1} <nsubj< {rel:postag=VBD} <rcmod< {slot0:postag=NN} "
              ">prep_to> {arg2}", ["visit"])] * 2
    induced = spark.createDataFrame(
        rows, "rel string, arg1 string, arg2 string, lemmas string, "
              "pattern string, slots array<string>")
    got = slot_semantics(induced, min_word_count=5).collect()
    # 'trip' seen 6x -> becomes a slot constraint; 'visit' (2x) doesn't
    pats = {r.pattern for r in got}
    assert pats == {
        "{arg1} <nsubj< {rel:postag=VBD} <rcmod< "
        "{slot0:postag=NN:regex=trip} >prep_to> {arg2}"}


def test_generalize_templates(spark):
    from ollie_spark.bootstrap.stages import generalize_templates
    cats = {"person": ["president", "founder", "director", "chairman",
                       "owner", "manager", "chief", "head", "leader",
                       "boss", "captain", "principal"]}
    model = spark.createDataFrame(
        [("be {rel} of",
          "{arg1} >appos> {rel:postag=NN:regex=president|founder|director"
          "|chairman|owner|manager|chief|head|leader|boss} "
          ">prep_of> {arg2}", 0.5),
         ("be {rel} of",
          "{arg1} >appos> {rel:postag=NN:regex=cat|dog} >prep_of> {arg2}",
          0.2)],
        "template string, pattern string, conf double")
    got = generalize_templates(model, cats).collect()
    widened = [r.pattern for r in got if "principal" in r.pattern]
    assert len(widened) == 1  # 10/10 lemmas in category -> widened
    assert any("regex=cat|dog" in r.pattern for r in got)  # untouched
