"""Serialization round-trip (OllieSpec.scala:20-29 parity) and output
formats; sentence segmentation stage."""

from ollie_spark.extract.ollie import Ollie
from ollie_spark.extract.serialize import (format_interactive,
                                           format_tabbed, tab_deserialize,
                                           tab_serialize)
from ollie_spark.graph import DependencyGraph

EXAMPLE = ("(._._5_37), nsubj(finds_VBZ_1_10, OpenParse_NNP_0_0); "
           "dobj(finds_VBZ_1_10, extraction_NN_4_27); "
           "det(extraction_NN_4_27, an_DT_2_16); "
           "nn(extraction_NN_4_27, example_NN_3_19)")


def test_tab_roundtrip():
    ollie = Ollie()
    results = ollie.extract(DependencyGraph.deserialize(EXAMPLE))
    r = results[0]
    line = tab_serialize(r)
    back = tab_deserialize(line)
    assert back["arg1_text"] == r.arg1_text
    assert back["rel_text"] == r.rel_text
    assert back["arg2_text"] == r.arg2_text
    assert abs(back["openparse_conf"] - r.openparse_conf) < 1e-5
    assert back["enabler"] == r.enabler
    assert back["attribution"] == r.attribution
    # idempotent: serialize(deserialize(x)) == x for the text fields
    assert tab_deserialize(line) == tab_deserialize(
        tab_serialize(r))


def test_roundtrip_with_context():
    ollie = Ollie()
    pickled = (
        "(in_IN_8_0), (._._12_0), det(people_NNS_1_0, Some_DT_0_0); "
        "nsubj(say_VBP_2_0, people_NNS_1_0); "
        "nn(Obama_NNP_4_0, Barack_NNP_3_0); "
        "nsubjpass(born_VBN_7_0, Obama_NNP_4_0); "
        "auxpass(born_VBN_7_0, was_VBD_5_0); neg(born_VBN_7_0, not_RB_6_0); "
        "ccomp(say_VBP_2_0, born_VBN_7_0); "
        "prep_in(born_VBN_7_0, States_NNPS_11_0); "
        "det(States_NNPS_11_0, the_DT_9_0); "
        "nn(States_NNPS_11_0, United_NNP_10_0)")
    results = ollie.extract(DependencyGraph.deserialize(pickled))
    with_attr = [r for r in results if r.attribution]
    assert with_attr
    r = with_attr[0]
    back = tab_deserialize(tab_serialize(r))
    assert back["attribution"] == r.attribution


def test_output_formats():
    ollie = Ollie()
    results = ollie.extract(DependencyGraph.deserialize(EXAMPLE))
    tabbed = format_tabbed(results[0], "the sentence")
    assert tabbed.count("\t") == 4
    inter = format_interactive(results, "the sentence")
    assert "(OpenParse; finds; an example extraction)" in inter
    assert format_interactive([], "x").endswith("No extractions found.")


def test_segment_sentences(spark):
    from ollie_spark.spark.pipeline import segment_sentences
    df = spark.createDataFrame(
        [("d0", 0, "One sentence here. Another one follows! Third."),
         ("d1", 2, "Just one .")],
        "doc_id string, span_idx int, text string")
    got = segment_sentences(df).collect()
    d0 = sorted((r.sent_idx, r.text) for r in got if r.doc_id == "d0")
    assert d0 == [(0, "One sentence here."), (1, "Another one follows!"),
                  (2, "Third.")]
    d1 = [(r.sent_idx, r.text) for r in got if r.doc_id == "d1"]
    assert d1 == [(0, "Just one .")]
