"""Voice-switch goldens ported from DependencyGraphExtrasSpec.scala.

The reference asserts exact serialized strings; edge *order* in its
serialization follows Scala set-iteration order, which is not
meaningful — we compare the canonical edge sets (label, src, dst with
index+offset), which pins down the same graph exactly.
"""

from ollie_spark.extract.voice import switch_voice
from ollie_spark.graph import DependencyGraph


def edge_set(pickled: str):
    g = DependencyGraph.deserialize(pickled)
    return {(e.label, e.src.serialize(), e.dst.serialize())
            for e in g.edges}


def test_switch_to_passive():
    g = DependencyGraph.deserialize(
        "nsubj(hit_VBD_1_8, Michael_NNP_0_0); "
        "dobj(hit_VBD_1_8, ball_NN_3_16); punct(hit_VBD_1_8, ._._4_20); "
        "det(ball_NN_3_16, the_DT_2_12)")
    switched = switch_voice(g)
    assert len(switched) == 1
    expected = edge_set(
        "det(ball_NN_1_4, the_DT_0_0); "
        "auxpass(hit_VBD_2_13, was_VBD_1_9); "
        "nsubjpass(hit_VBD_2_13, ball_NN_1_4); "
        "prep(hit_VBD_2_13, by_IN_3_17); "
        "punct(hit_VBD_2_13, ._._6_28); "
        "pobj(by_IN_3_17, Michael_NNP_4_20)")
    got = {(e.label, e.src.serialize(), e.dst.serialize())
           for e in switched[0].edges}
    assert got == expected


def test_switch_to_active():
    g = DependencyGraph.deserialize(
        "det(ball_NN_1_4, The_DT_0_0); nsubjpass(hit_VBN_3_13, ball_NN_1_4); "
        "auxpass(hit_VBN_3_13, was_VBD_2_9); prep(hit_VBN_3_13, by_IN_4_17); "
        "punct(hit_VBN_3_13, ._._6_27); pobj(by_IN_4_17, Michael_NNP_5_20)")
    switched = switch_voice(g)
    assert len(switched) == 1
    expected = edge_set(
        "nsubj(hit_VBN_1_8, Michael_NNP_0_0); "
        "dobj(hit_VBN_1_8, ball_NN_3_16); punct(hit_VBN_1_8, ._._4_21); "
        "det(ball_NN_3_16, The_DT_2_12)")
    got = {(e.label, e.src.serialize(), e.dst.serialize())
           for e in switched[0].edges}
    assert got == expected


def test_roundtrip_voice():
    """active -> passive -> active returns the original shape."""
    g = DependencyGraph.deserialize(
        "nsubj(hit_VBD_1_8, Michael_NNP_0_0); "
        "dobj(hit_VBD_1_8, ball_NN_3_16); punct(hit_VBD_1_8, ._._4_20); "
        "det(ball_NN_3_16, the_DT_2_12)")
    passive = switch_voice(g)[0]
    back = switch_voice(passive)
    assert len(back) == 1
    labels = sorted(e.label for e in back[0].edges)
    assert labels == ["det", "dobj", "nsubj", "punct"]
