"""Property-based tests (hypothesis) for the codecs and core
invariants: graph pickle round-trip, pattern grammar round-trip over
the full learned model, lemmatizer stability, interval algebra."""

from hypothesis import given, settings
from hypothesis import strategies as st

from ollie_spark.graph import (DependencyGraph, Edge, Node, borders,
                               interval_distance, intersects, span_of,
                               superset)
from ollie_spark.model.lemmatizer import lemmatize
from ollie_spark.model.loader import _load_raw, _PACKAGED
from ollie_spark.model.patterns import Pattern

_token = st.text(
    alphabet=st.characters(whitelist_categories=("Ll", "Lu", "Nd"),
                           max_codepoint=0x7E),
    min_size=1, max_size=8)
_postag = st.sampled_from(
    ["NN", "NNS", "NNP", "VBD", "VBZ", "DT", "JJ", "IN", "PRP$", "."])


@st.composite
def graphs(draw):
    n = draw(st.integers(min_value=2, max_value=8))
    nodes = [Node(draw(_token), draw(_postag), i, i + 1, i * 5)
             for i in range(n)]
    n_edges = draw(st.integers(min_value=1, max_value=n - 1))
    labels = st.sampled_from(
        ["nsubj", "dobj", "det", "nn", "prep_of", "amod", "punct"])
    edges = []
    for i in range(n_edges):
        a, b = draw(st.permutations(range(n)))[:2]
        edges.append(Edge(draw(labels), nodes[a], nodes[b]))
    return DependencyGraph(nodes, edges)


@given(graphs())
@settings(max_examples=60, deadline=None)
def test_graph_pickle_roundtrip(g):
    back = DependencyGraph.deserialize(g.serialize())
    assert [n.serialize() for n in back.nodes] == \
        [n.serialize() for n in g.nodes]
    assert {(e.label, e.src.serialize(), e.dst.serialize())
            for e in back.edges} == \
        {(e.label, e.src.serialize(), e.dst.serialize())
         for e in g.edges}


def test_all_model_patterns_roundtrip():
    raw = _load_raw(_PACKAGED)
    assert len(raw["patterns"]) == 629
    for p in raw["patterns"]:
        assert Pattern.deserialize(p["pattern"]).serialize() == \
            p["pattern"]


@given(st.text(alphabet=st.characters(whitelist_categories=("Ll",)),
               min_size=1, max_size=12))
@settings(max_examples=200, deadline=None)
def test_lemmatizer_stable_and_idempotentish(w):
    lemma = lemmatize(w)
    assert lemma == lemmatize(w)          # deterministic
    assert lemma == lemma.lower()         # lowercase
    assert len(lemma) <= len(w) + 1       # at most e-insertion growth


@given(st.integers(0, 20), st.integers(1, 5), st.integers(0, 20),
       st.integers(1, 5))
@settings(max_examples=200, deadline=None)
def test_interval_algebra(a0, al, b0, bl):
    a, b = (a0, a0 + al), (b0, b0 + bl)
    assert intersects(a, b) == intersects(b, a)
    assert borders(a, b) == borders(b, a)
    assert not (intersects(a, b) and borders(a, b))
    assert superset(span_of([a, b]), a) and superset(span_of([a, b]), b)
    assert interval_distance(a, b) == interval_distance(b, a)
    if intersects(a, b):
        assert interval_distance(a, b) < 1


# ----------------------------- round-2 properties (reflections, CC)

def test_switch_args_is_involution_over_model():
    """switch_args twice reproduces every shipped pattern byte-exactly
    (all 629 have arg1+arg2 captures)."""
    from ollie_spark.bootstrap.stages import switch_args
    from ollie_spark.model.loader import load_extractors
    for e in load_extractors():
        p = e.pattern
        assert switch_args(switch_args(p)).serialize() == p.serialize()


def test_reflect_row_output_never_reflects_again():
    """reflect_row of any reflection is None (the 'be ' gates make B13
    a fixed point after one application) — over the full model."""
    from ollie_spark.bootstrap.stages import reflect_row
    from ollie_spark.model.loader import load_extractors
    from ollie_spark.model.patterns import Pattern
    n_reflected = 0
    for e in load_extractors():
        t = e.template.text if hasattr(e.template, "text") else \
            str(e.template)
        r = reflect_row(t, e.pattern.serialize())
        if r is None:
            continue
        n_reflected += 1
        rt, rp = r
        # reflected pattern is valid grammar and round-trips
        assert Pattern.deserialize(rp).serialize() == rp
        assert reflect_row(rt, rp) is None
    assert n_reflected > 100  # the model is nsubj-heavy


@given(st.integers(min_value=1, max_value=1 << 24))
@settings(max_examples=40, deadline=None)
def test_auto_cell_bits_keeps_cells_bounded(n):
    """auto_cell_bits guarantees expected cell population stays within
    [target/2, target] above the floor (and never exceeds the vector
    dimension)."""
    from ollie_spark.spark.textops import auto_cell_bits
    bits = auto_cell_bits(n, target_cell_rows=1024)
    assert bits >= 4
    if bits > 4:                       # above the floor
        assert n / (2 ** bits) <= 1024
        assert n / (2 ** (bits - 1)) > 1024
    assert auto_cell_bits(n, dim=6) <= 6
