"""Deterministic synthetic sentence bank + template parser.

The corpus generator (corpus.py) renders sentences from closed
vocabularies through a handful of dependency templates; the pluggable
"parser" re-derives the dependency graph from the text by recognizing
the template.  Both sides share the same builder, so they cannot drift.
Fixture sentences from the reference test suite are embedded via an
exact text -> pickle lookup, so correctness cases live inside the
corpus (FIXTURES.md §1).

Everything is pure and hash-deterministic: no wall-clock, no global RNG.
"""

from __future__ import annotations

import random

from ..graph import DependencyGraph, Edge, Node

FIRST = ("Alice Brandon Carla David Elena Frank Grace Hiro Irene Jamal "
         "Karen Liam Maria Noah Olga Pedro Quinn Rosa Samir Tina").split()
LAST = ("Anderson Baker Chen Dawson Eriksen Fischer Garcia Hopkins Ivanov "
        "Jensen Kumar Larsen Meyer Novak Okafor Patel Quiroga Rossi "
        "Suzuki Turner").split()
ORG = ("Acme Globex Initech Umbrella Hooli Vandelay Cyberdyne Tyrell "
       "Monarch Zenith").split()
PLACE = ("Seattle Boston Madrid Tokyo Cairo Lagos Lima Oslo Paris "
         "Delhi").split()
NOUN = ("company team museum report bridge festival garden library "
        "engine harbor").split()
RELNOUN = "president founder director chairman owner manager".split()
VBD = "founded acquired visited praised joined admired".split()
VBN = "born raised educated".split()
SAY = "said claimed believes thinks reported".split()

_FIRST, _LAST, _ORG = set(FIRST), set(LAST), set(ORG)
_PLACE, _NOUN, _RELNOUN = set(PLACE), set(NOUN), set(RELNOUN)
_VBD, _VBN, _SAY = set(VBD), set(VBN), set(SAY)


def _n(text, tag, i):
    return Node(text, tag, i, i + 1, 0)


def _g(nodes, edges):
    return DependencyGraph(nodes, edges)


# Each template: name, arity of slot tuple, build(slots) -> (text, graph,
# expected [(arg1, rel, arg2, enabler, attribution)]), recognize(tokens)
# -> slots | None.

def _t1_text(s):
    f, l, v, n = s
    return f"{f} {l} {v} the {n} ."


def _t1_build(s):
    f, l, v, n = s
    toks = [_n(f, "NNP", 0), _n(l, "NNP", 1), _n(v, "VBD", 2),
            _n("the", "DT", 3), _n(n, "NN", 4), _n(".", ".", 5)]
    edges = [Edge("nn", toks[1], toks[0]), Edge("nsubj", toks[2], toks[1]),
             Edge("dobj", toks[2], toks[4]), Edge("det", toks[4], toks[3]),
             Edge("punct", toks[2], toks[5])]
    text = _t1_text(s)
    return text, _g(toks, edges), [(f"{f} {l}", v, f"the {n}", None, None)]


def _t1_rec(t):
    if (len(t) == 6 and t[0] in _FIRST and t[1] in _LAST and t[2] in _VBD
            and t[3] == "the" and t[4] in _NOUN and t[5] == "."):
        return (t[0], t[1], t[2], t[4])
    return None


def _t2_text(s):
    f, l, r, o = s
    return f"{f} {l} is the {r} of {o} ."


def _t2_build(s):
    f, l, r, o = s
    toks = [_n(f, "NNP", 0), _n(l, "NNP", 1), _n("is", "VBZ", 2),
            _n("the", "DT", 3), _n(r, "NN", 4), _n("of", "IN", 5),
            _n(o, "NNP", 6), _n(".", ".", 7)]
    edges = [Edge("nn", toks[1], toks[0]), Edge("nsubj", toks[4], toks[1]),
             Edge("cop", toks[4], toks[2]), Edge("det", toks[4], toks[3]),
             Edge("prep_of", toks[4], toks[6]),
             Edge("punct", toks[4], toks[7])]
    text = _t2_text(s)
    return text, _g(toks, edges), [
        (f"{f} {l}", f"is the {r} of", o, None, None),
        # the copular pattern also fires with the full predicate as arg2
        (f"{f} {l}", "is", f"the {r} of {o}", None, None)]


def _t2_rec(t):
    if (len(t) == 8 and t[0] in _FIRST and t[1] in _LAST and t[2] == "is"
            and t[3] == "the" and t[4] in _RELNOUN and t[5] == "of"
            and t[6] in _ORG and t[7] == "."):
        return (t[0], t[1], t[4], t[6])
    return None


def _t3_text(s):
    f, l, v, p = s
    return f"{f} {l} was {v} in {p} ."


def _t3_build(s):
    f, l, v, p = s
    toks = [_n(f, "NNP", 0), _n(l, "NNP", 1), _n("was", "VBD", 2),
            _n(v, "VBN", 3), _n("in", "IN", 4), _n(p, "NNP", 5),
            _n(".", ".", 6)]
    edges = [Edge("nn", toks[1], toks[0]),
             Edge("nsubjpass", toks[3], toks[1]),
             Edge("auxpass", toks[3], toks[2]),
             Edge("prep_in", toks[3], toks[5]),
             Edge("punct", toks[3], toks[6])]
    text = _t3_text(s)
    expected = [(f"{f} {l}", f"was {v} in", p, None, None)]
    if v == "born":
        # the learned model contains prep-rewrite templates for the
        # 'bear' semantic class ("born in" -> "born at"/"born on")
        expected += [(f"{f} {l}", "was born at", p, None, None),
                     (f"{f} {l}", "was born on", p, None, None)]
    return text, _g(toks, edges), expected


def _t3_rec(t):
    if (len(t) == 7 and t[0] in _FIRST and t[1] in _LAST and t[2] == "was"
            and t[3] in _VBN and t[4] == "in" and t[5] in _PLACE
            and t[6] == "."):
        return (t[0], t[1], t[3], t[5])
    return None


def _t4_text(s):
    f1, l1, say, f2, l2, v, n = s
    return f"{f1} {l1} {say} {f2} {l2} {v} the {n} ."


def _t4_build(s):
    f1, l1, say, f2, l2, v, n = s
    toks = [_n(f1, "NNP", 0), _n(l1, "NNP", 1), _n(say, "VBD", 2),
            _n(f2, "NNP", 3), _n(l2, "NNP", 4), _n(v, "VBD", 5),
            _n("the", "DT", 6), _n(n, "NN", 7), _n(".", ".", 8)]
    edges = [Edge("nn", toks[1], toks[0]), Edge("nsubj", toks[2], toks[1]),
             Edge("nn", toks[4], toks[3]), Edge("nsubj", toks[5], toks[4]),
             Edge("ccomp", toks[2], toks[5]),
             Edge("dobj", toks[5], toks[7]), Edge("det", toks[7], toks[6]),
             Edge("punct", toks[2], toks[8])]
    text = _t4_text(s)
    return text, _g(toks, edges), [
        (f"{f2} {l2}", v, f"the {n}", None, f"{f1} {l1} {say}")]


def _t4_rec(t):
    if (len(t) == 9 and t[0] in _FIRST and t[1] in _LAST and t[2] in _SAY
            and t[3] in _FIRST and t[4] in _LAST and t[5] in _VBD
            and t[6] == "the" and t[7] in _NOUN and t[8] == "."):
        return tuple(t[:6]) + (t[7],)
    return None


def _t5_text(s):
    f, l, n = s
    return f"If it rains , {f} {l} stays in the {n} ."


def _t5_build(s):
    f, l, n = s
    toks = [_n("If", "IN", 0), _n("it", "PRP", 1), _n("rains", "VBZ", 2),
            _n(",", ",", 3), _n(f, "NNP", 4), _n(l, "NNP", 5),
            _n("stays", "VBZ", 6), _n("in", "IN", 7), _n("the", "DT", 8),
            _n(n, "NN", 9), _n(".", ".", 10)]
    edges = [Edge("mark", toks[2], toks[0]), Edge("nsubj", toks[2], toks[1]),
             Edge("advcl", toks[6], toks[2]),
             Edge("nn", toks[5], toks[4]), Edge("nsubj", toks[6], toks[5]),
             Edge("prep_in", toks[6], toks[9]),
             Edge("det", toks[9], toks[8]),
             Edge("punct", toks[6], toks[10])]
    text = _t5_text(s)
    return text, _g(toks, edges), [
        (f"{f} {l}", "stays in", f"the {n}", "If it rains", None)]


def _t5_rec(t):
    if (len(t) == 11 and t[0] == "If" and t[2] == "rains" and t[3] == ","
            and t[4] in _FIRST and t[5] in _LAST and t[6] == "stays"
            and t[9] in _NOUN and t[10] == "."):
        return (t[4], t[5], t[9])
    return None


def _t6_text(s):
    f, l, p1, p2 = s
    return f"{f} {l} moved from {p1} to {p2} ."


def _t6_build(s):
    f, l, p1, p2 = s
    toks = [_n(f, "NNP", 0), _n(l, "NNP", 1), _n("moved", "VBD", 2),
            _n("from", "IN", 3), _n(p1, "NNP", 4), _n("to", "IN", 5),
            _n(p2, "NNP", 6), _n(".", ".", 7)]
    edges = [Edge("nn", toks[1], toks[0]), Edge("nsubj", toks[2], toks[1]),
             Edge("prep_from", toks[2], toks[4]),
             Edge("prep_to", toks[2], toks[6]),
             Edge("punct", toks[2], toks[7])]
    text = _t6_text(s)
    return text, _g(toks, edges), [
        (f"{f} {l}", "moved from", p1, None, None),
        (f"{f} {l}", "moved to", p2, None, None)]


def _t6_rec(t):
    if (len(t) == 8 and t[0] in _FIRST and t[1] in _LAST and t[2] == "moved"
            and t[3] == "from" and t[4] in _PLACE and t[5] == "to"
            and t[6] in _PLACE and t[7] == "."):
        return (t[0], t[1], t[4], t[6])
    return None


def _t7_text(s):
    f, l, r, o, v, n = s
    return f"{f} {l} , the {r} of {o} , {v} the {n} ."


def _t7_build(s):
    """Appositive relnoun + main clause: two extractions per sentence."""
    f, l, r, o, v, n = s
    toks = [_n(f, "NNP", 0), _n(l, "NNP", 1), _n(",", ",", 2),
            _n("the", "DT", 3), _n(r, "NN", 4), _n("of", "IN", 5),
            _n(o, "NNP", 6), _n(",", ",", 7), _n(v, "VBD", 8),
            _n("the", "DT", 9), _n(n, "NN", 10), _n(".", ".", 11)]
    edges = [Edge("nn", toks[1], toks[0]), Edge("nsubj", toks[8], toks[1]),
             Edge("punct", toks[1], toks[2]),
             Edge("appos", toks[1], toks[4]),
             Edge("det", toks[4], toks[3]),
             Edge("prep_of", toks[4], toks[6]),
             Edge("punct", toks[1], toks[7]),
             Edge("dobj", toks[8], toks[10]),
             Edge("det", toks[10], toks[9]),
             Edge("punct", toks[8], toks[11])]
    text = _t7_text(s)
    return text, _g(toks, edges), [
        (f"{f} {l}", v, f"the {n}", None, None),
        (f"{f} {l}", f"be the {r} of", o, None, None)]


def _t7_rec(t):
    if (len(t) == 12 and t[0] in _FIRST and t[1] in _LAST and t[2] == ","
            and t[3] == "the" and t[4] in _RELNOUN and t[5] == "of"
            and t[6] in _ORG and t[7] == "," and t[8] in _VBD
            and t[9] == "the" and t[10] in _NOUN and t[11] == "."):
        return (t[0], t[1], t[4], t[6], t[8], t[10])
    return None


def _t8_text(s):
    f, l, n = s
    return f"{f} {l} is going to visit the {n} ."


def _t8_build(s):
    """Rel-rel xcomp: 'is going to <vb>'."""
    f, l, n = s
    toks = [_n(f, "NNP", 0), _n(l, "NNP", 1), _n("is", "VBZ", 2),
            _n("going", "VBG", 3), _n("to", "TO", 4),
            _n("visit", "VB", 5), _n("the", "DT", 6), _n(n, "NN", 7),
            _n(".", ".", 8)]
    edges = [Edge("nn", toks[1], toks[0]), Edge("nsubj", toks[3], toks[1]),
             Edge("aux", toks[3], toks[2]), Edge("xcomp", toks[3], toks[5]),
             Edge("aux", toks[5], toks[4]),
             Edge("dobj", toks[5], toks[7]),
             Edge("det", toks[7], toks[6]),
             Edge("punct", toks[3], toks[8])]
    text = _t8_text(s)
    return text, _g(toks, edges), [
        (f"{f} {l}", "is going to visit", f"the {n}", None, None)]


def _t8_rec(t):
    if (len(t) == 9 and t[0] in _FIRST and t[1] in _LAST
            and t[2:6] == ["is", "going", "to", "visit"] and t[6] == "the"
            and t[7] in _NOUN and t[8] == "."):
        return (t[0], t[1], t[7])
    return None


def _pick(rng, xs):
    return xs[rng.randrange(len(xs))]


TEMPLATES = [
    # (weight, build, recognize, slot_sampler)
    (4, _t1_build, _t1_rec,
     lambda r: (_pick(r, FIRST), _pick(r, LAST), _pick(r, VBD),
                _pick(r, NOUN))),
    (3, _t2_build, _t2_rec,
     lambda r: (_pick(r, FIRST), _pick(r, LAST), _pick(r, RELNOUN),
                _pick(r, ORG))),
    (2, _t3_build, _t3_rec,
     lambda r: (_pick(r, FIRST), _pick(r, LAST), _pick(r, VBN),
                _pick(r, PLACE))),
    (2, _t4_build, _t4_rec,
     lambda r: (_pick(r, FIRST), _pick(r, LAST), _pick(r, SAY),
                _pick(r, FIRST), _pick(r, LAST), _pick(r, VBD),
                _pick(r, NOUN))),
    (1, _t5_build, _t5_rec,
     lambda r: (_pick(r, FIRST), _pick(r, LAST), _pick(r, NOUN))),
    (1, _t6_build, _t6_rec,
     lambda r: (_pick(r, FIRST), _pick(r, LAST), _pick(r, PLACE),
                _pick(r, PLACE))),
    (2, _t7_build, _t7_rec,
     lambda r: (_pick(r, FIRST), _pick(r, LAST), _pick(r, RELNOUN),
                _pick(r, ORG), _pick(r, VBD), _pick(r, NOUN))),
    (1, _t8_build, _t8_rec,
     lambda r: (_pick(r, FIRST), _pick(r, LAST), _pick(r, NOUN))),
]

_CUM = []
_total = 0
for _w, *_rest in TEMPLATES:
    _total += _w
    _CUM.append(_total)


# text renderers aligned with TEMPLATES by index — each is the SAME
# function its template's build() calls, so the text-only corpus path
# cannot drift from the full builder
_TEXTS = [_t1_text, _t2_text, _t3_text, _t4_text, _t5_text, _t6_text,
          _t7_text, _t8_text]


def sample_sentence(rng: random.Random):
    """-> (text, graph, expected triples)."""
    x = rng.randrange(_total)
    for i, c in enumerate(_CUM):
        if x < c:
            _, build, _, sample = TEMPLATES[i]
            return build(sample(rng))
    raise AssertionError


def sample_sentence_text(rng: random.Random) -> str:
    """Text of the sentence ``sample_sentence`` would draw — identical
    RNG consumption (one randrange + the template's slot draws) and
    identical text (the shared per-template renderer), WITHOUT building
    Node/Edge/DependencyGraph objects or expected triples.  The corpus
    generator keeps only the text, so the graph construction was ~90%
    of its per-doc cost (equality pinned by
    tests/test_spark_pipeline.py::test_text_only_sampler_matches_full).
    """
    x = rng.randrange(_total)
    for i, c in enumerate(_CUM):
        if x < c:
            return _TEXTS[i](TEMPLATES[i][3](rng))
    raise AssertionError


def parse_text(text: str) -> DependencyGraph | None:
    """The pluggable parser for synthetic + fixture sentences.

    Exact fixture lookup first, then template recognition; None for
    unparseable text (shielded as an error metric downstream, mirroring
    the reference's --ignore-errors path, OpenParse.scala:376-379).
    """
    fx = FIXTURE_PARSES.get(text)
    if fx is not None:
        return DependencyGraph.deserialize(fx, text=text)
    toks = text.split(" ")
    for _, build, rec, _ in TEMPLATES:
        slots = rec(toks)
        if slots is not None:
            _, graph, _ = build(slots)
            return graph
    return None


# ----------------------------------------------------- embedded fixtures

# Reference-spec sentences (text -> graph pickle) embedded in the corpus
# so the correctness cases flow through the full pipeline
# (FIXTURES.md §2-3).  Expected triples per fixture are what the default
# model emits (validated in tests/test_openparse_model.py).
FIXTURE_PARSES = {
    "OpenParse finds an example extraction .":
        "(._._5_37), nsubj(finds_VBZ_1_10, OpenParse_NNP_0_0); "
        "dobj(finds_VBZ_1_10, extraction_NN_4_27); "
        "det(extraction_NN_4_27, an_DT_2_16); "
        "nn(extraction_NN_4_27, example_NN_3_19)",
    "Barack Obama was elected president of the United States .":
        "(of_IN_5_0), (._._9_0), nn(Obama_NNP_1_0, Barack_NNP_0_0); "
        "nsubjpass(elected_VBN_3_0, Obama_NNP_1_0); "
        "auxpass(elected_VBN_3_0, was_VBD_2_0); "
        "dobj(elected_VBN_3_0, president_NN_4_0); "
        "prep_of(president_NN_4_0, States_NNPS_8_0); "
        "det(States_NNPS_8_0, the_DT_6_0); "
        "nn(States_NNPS_8_0, United_NNP_7_0)",
    "Juliette has a crush on Romeo .":
        "(on_IN_4_0), (._._6_0), nsubj(has_VBZ_1_0, Juliette_NNP_0_0); "
        "dobj(has_VBZ_1_0, crush_NN_3_0); det(crush_NN_3_0, a_DT_2_0); "
        "prep_on(crush_NN_3_0, Romeo_NNP_5_0)",
    "Some people say Barack Obama was not born in the United States .":
        "(in_IN_8_0), (._._12_0), det(people_NNS_1_0, Some_DT_0_0); "
        "nsubj(say_VBP_2_0, people_NNS_1_0); "
        "nn(Obama_NNP_4_0, Barack_NNP_3_0); "
        "nsubjpass(born_VBN_7_0, Obama_NNP_4_0); "
        "auxpass(born_VBN_7_0, was_VBD_5_0); neg(born_VBN_7_0, not_RB_6_0); "
        "ccomp(say_VBP_2_0, born_VBN_7_0); "
        "prep_in(born_VBN_7_0, States_NNPS_11_0); "
        "det(States_NNPS_11_0, the_DT_9_0); "
        "nn(States_NNPS_11_0, United_NNP_10_0)",
    "The people fled away chaotically towards the barn .":
        "det(people_NNS_1_0, The_DT_0_0); nsubj(fled_VBD_2_0, people_NNS_1_0); "
        "advmod(fled_VBD_2_0, chaotically_RB_3_0); "
        "det(barn_NN_6_0, the_DT_5_0); "
        "prep_towards(fled_VBD_2_0, barn_NN_6_0)",
    "Microsoft co-founder Bill Gates spoke at a conference on Monday .":
        "(at_IN_5_0), (on_IN_8_0), (._._10_0), "
        "nn(Gates_NNP_3_0, Microsoft_NNP_0_0); "
        "nn(Gates_NNP_3_0, co-founder_NN_1_0); "
        "nn(Gates_NNP_3_0, Bill_NNP_2_0); "
        "nsubj(spoke_VBD_4_0, Gates_NNP_3_0); "
        "prep_at(spoke_VBD_4_0, conference_NN_7_0); "
        "det(conference_NN_7_0, a_DT_6_0); "
        "prep_on(spoke_VBD_4_0, Monday_NNP_9_0)",
    "The 2012 Sasquatch music festival is scheduled for May 25th to "
    "May 28th .":
        "(for_IN_7_0), (to_IN_10_0), (._._13_0), "
        "det(festival_NN_4_0, The_DT_0_0); "
        "num(festival_NN_4_0, 2012_CD_1_0); "
        "nn(festival_NN_4_0, Sasquatch_NNP_2_0); "
        "nn(festival_NN_4_0, music_NN_3_0); "
        "nsubjpass(scheduled_VBN_6_0, festival_NN_4_0); "
        "auxpass(scheduled_VBN_6_0, is_VBZ_5_0); "
        "prep_for(scheduled_VBN_6_0, 25th_CD_9_0); "
        "nn(25th_CD_9_0, May_NNP_8_0); "
        "prep_to(scheduled_VBN_6_0, 28th_CD_12_0); "
        "nn(28th_CD_12_0, May_NNP_11_0); "
        "punct(scheduled_VBN_6_0, ._._13_0)",
}
