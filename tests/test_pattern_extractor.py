"""Golden extraction cases ported from the reference test suite
(core/src/test/scala/edu/knowitall/openparse/PatternExtractorSpec.scala).

Each case feeds a pickled dependency graph through our matcher +
expansion + template core and asserts the exact triple strings the
reference asserts.
"""

from ollie_spark.graph import DependencyGraph
from ollie_spark.model.patterns import Pattern
from ollie_spark.extract.build import Extractor, Template


def general(pattern, conf=1.0):
    return Extractor(Pattern.deserialize(pattern), conf)


def template(tmpl, pattern, conf=1.0):
    return Extractor(Pattern.deserialize(pattern), conf,
                     template=Template.deserialize(tmpl))


def specific(relation, lemmas, pattern, conf=1.0):
    return Extractor(Pattern.deserialize(pattern), conf,
                     relation=relation, relation_lemmas=tuple(lemmas))


def triples(extractor, pickled, simplify=False):
    g = DependencyGraph.deserialize(pickled)
    if simplify:
        g = g.collapse().simplify_postags()
    return [str(e) for e in extractor.extract(g)]


ANGELS = (
    "nsubj(appear_VB_1_0, Angels_NNPS_0_0); det(story_NN_5_0, the_DT_3_0); "
    "nn(story_NN_5_0, Bible_NNP_4_0); prep_in(appear_VB_1_0, story_NN_5_0); "
    "det(pages_NNS_9_0, the_DT_7_0); amod(pages_NNS_9_0, first_JJ_8_0); "
    "prep_from(appear_VB_1_0, pages_NNS_9_0); nn(right_NN_12_0, Genesis_NNP_11_0); "
    "prep_of(pages_NNS_9_0, right_NN_12_0); dep(appear_VB_1_0, through_IN_13_0); "
    "dep(through_IN_13_0, to_TO_14_0); det(pages_NNS_17_0, the_DT_15_0); "
    "amod(pages_NNS_17_0, final_JJ_16_0); pobj(to_TO_14_0, pages_NNS_17_0); "
    "det(Book_NNP_20_0, the_DT_19_0); prep_of(pages_NNS_17_0, Book_NNP_20_0); "
    "prep_of(Book_NNP_20_0, Revelation_NNP_22_0); punct(appear_VB_1_0, ._._23_0)"
)


class TestPostagConstraint:
    # PatternExtractorSpec.scala:24-42 (graph normalized = postags simplified)
    def test_without_postag_constraint(self):
        ex = general("{arg1} <nsubj< {rel} >prep_in> {arg2}")
        got = triples(ex, ANGELS, simplify=True)
        assert got == ["(Angels; appear; the Bible story)"]

    def test_with_postag_constraint(self):
        ex = general("{arg1} <nsubj< {rel:postag=VB} >prep_in> {arg2}")
        got = triples(ex, ANGELS, simplify=True)
        assert got == ["(Angels; appear; the Bible story)"]

    def test_with_wrong_postag_constraint(self):
        ex = general("{arg1} <nsubj< {rel:postag=XXX} >prep_in> {arg2}")
        assert triples(ex, ANGELS, simplify=True) == []


class TestRelnounCases:
    # PatternExtractorSpec.scala:45-126 — graphs NOT normalized
    def test_adjective_descriptor(self):
        pickled = (
            "nn(Obama_NNP_3_0, US_NNP_0_0); nn(Obama_NNP_3_0, President_NNP_1_0); "
            "nn(Obama_NNP_3_0, Barack_NNP_2_0); nsubj(went_VBD_4_0, Obama_NNP_3_0); "
            "prep(went_VBD_4_0, to_TO_5_0); det(store_NN_8_0, the_DT_6_0); "
            "nn(store_NN_8_0, grocery_NN_7_0); pobj(to_TO_5_0, store_NN_8_0)")
        ex = specific("be the president of", ["president"],
                      "{rel} <nn< {arg1} >nn> {arg2}")
        assert triples(ex, pickled) == ["(Barack Obama; be the president of; US)"]

    def test_adjective_descriptor_appositive(self):
        pickled = (
            "nn(Obama_NNP_1_0, Barack_NNP_0_0); nsubj(went_VBD_7_0, Obama_NNP_1_0); "
            "det(President_NNP_5_0, the_DT_3_0); nn(President_NNP_5_0, US_NNP_4_0); "
            "appos(Obama_NNP_1_0, President_NNP_5_0); det(store_NN_10_0, the_DT_9_0); "
            "prep_to(went_VBD_7_0, store_NN_10_0)")
        ex = specific("be the president of", ["president"],
                      "{arg1} >appos> {rel} >nn> {arg2}")
        assert triples(ex, pickled) == ["(Barack Obama; be the president of; US)"]

    def test_appositive(self):
        pickled = (
            "nn(Obama_NNP_1_0, Barack_NNP_0_0); nsubj(went_VBD_9_0, Obama_NNP_1_0); "
            "det(president_NN_4_0, the_DT_3_0); appos(Obama_NNP_1_0, president_NN_4_0); "
            "det(US_NNP_7_0, the_DT_6_0); prep_of(president_NN_4_0, US_NNP_7_0); "
            "det(store_NN_13_0, the_DT_11_0); nn(store_NN_13_0, grocery_NN_12_0); "
            "prep_to(went_VBD_9_0, store_NN_13_0)")
        ex = specific("be the president of", ["president"],
                      "{arg1} >appos> {rel} >prep_of> {arg2}")
        assert triples(ex, pickled) == [
            "(Barack Obama; be the president of; the US)"]

    def test_possessive_appositive(self):
        pickled = (
            "det(US_NNP_1_0, The_DT_0_0); poss(president_NN_3_0, US_NNP_1_0); "
            "nsubj(went_VBD_8_0, president_NN_3_0); nn(Obama_NNP_6_0, Barack_NNP_5_0); "
            "appos(president_NN_3_0, Obama_NNP_6_0); det(store_NN_11_0, the_DT_10_0); "
            "prep_to(went_VBD_8_0, store_NN_11_0)")
        ex = specific("be the president of", ["president"],
                      "{arg1} <appos< {rel} >poss> {arg2}")
        assert triples(ex, pickled) == [
            "(Barack Obama; be the president of; The US)"]

    def test_reverse_possessive_appositive(self):
        pickled = (
            "nn(Obama_NNP_1_0, Barack_NNP_0_0); nsubj(went_VBD_8_0, Obama_NNP_1_0); "
            "det(US_NNP_4_0, the_DT_3_0); poss(president_NN_6_0, US_NNP_4_0); "
            "appos(Obama_NNP_1_0, president_NN_6_0); det(store_NN_11_0, the_DT_10_0); "
            "prep_to(went_VBD_8_0, store_NN_11_0)")
        ex = specific("be the president of", ["president"],
                      "{arg1} >appos> {rel} >poss> {arg2}")
        assert triples(ex, pickled) == [
            "(Barack Obama; be the president of; the US)"]

    def test_possessive_is(self):
        pickled = (
            "det(US_NNP_1_0, The_DT_0_0); poss(President_NNP_3_0, US_NNP_1_0); "
            "nsubj(Obama_NNP_6_0, President_NNP_3_0); cop(Obama_NNP_6_0, is_VBZ_4_0); "
            "nn(Obama_NNP_6_0, Barack_NNP_5_0)")
        ex = specific("be the president of", ["president"],
                      "{arg1} >nsubj> {rel} >poss> {arg2}")
        assert triples(ex, pickled) == [
            "(Barack Obama; be the president of; The US)"]

    def test_is_possessive(self):
        pickled = (
            "nn(Obama_NNP_1_0, Barack_NNP_0_0); nsubj(president_NN_6_0, Obama_NNP_1_0); "
            "cop(president_NN_6_0, is_VBZ_2_0); det(US_NNP_4_0, the_DT_3_0); "
            "poss(president_NN_6_0, US_NNP_4_0)")
        ex = specific("be the president of", ["president"],
                      "{arg1} <nsubj< {rel} >poss> {arg2}")
        assert triples(ex, pickled) == [
            "(Barack Obama; be the president of; the US)"]

    def test_of_is(self):
        pickled = (
            "det(president_NN_1_0, The_DT_0_0); nsubj(Obama_NNP_7_0, president_NN_1_0); "
            "det(US_NNP_4_0, the_DT_3_0); prep_of(president_NN_1_0, US_NNP_4_0); "
            "cop(Obama_NNP_7_0, is_VBZ_5_0); nn(Obama_NNP_7_0, Barack_NNP_6_0)")
        ex = specific("be the president of", ["president"],
                      "{arg1} >nsubj> {rel} >prep_of> {arg2}")
        assert triples(ex, pickled) == [
            "(Barack Obama; be the president of; the US)"]


class TestRelRel:
    # PatternExtractorSpec.scala:128-160
    def test_elected(self):
        pickled = (
            "(of_IN_5_0), (._._9_0), nn(Obama_NNP_1_0, Barack_NNP_0_0); "
            "nsubjpass(elected_VBN_3_0, Obama_NNP_1_0); "
            "auxpass(elected_VBN_3_0, was_VBD_2_0); "
            "dobj(elected_VBN_3_0, president_NN_4_0); "
            "prep_of(president_NN_4_0, States_NNPS_8_0); "
            "det(States_NNPS_8_0, the_DT_6_0); nn(States_NNPS_8_0, United_NNP_7_0)")
        ex = template("be {rel} of",
                      "{arg1} <nsubjpass< {rel1} >dobj> {rel2} >prep_of> {arg2}")
        assert triples(ex, pickled) == [
            "(Barack Obama; was elected president of; the United States)"]

    def test_located(self):
        pickled = (
            "(in_IN_6_0), (._._8_0), det(Mariners_NNPS_1_0, The_DT_0_0); "
            "nsubj(team_NN_4_0, Mariners_NNPS_1_0); cop(team_NN_4_0, are_VBP_2_0); "
            "det(team_NN_4_0, a_DT_3_0); partmod(team_NN_4_0, located_VBN_5_0); "
            "prep_in(located_VBN_5_0, Seattle_NNP_7_0)")
        ex = template("be {rel} in",
                      "{arg1} <nsubj< {rel1} >partmod> {rel2} >prep_in> {arg2}")
        assert triples(ex, pickled) == [
            "(The Mariners; are a team located in; Seattle)"]

    def test_xcomp(self):
        pickled = (
            "(._._7_0), nsubj(going_VBG_2_0, Humans_NNS_0_0); "
            "aux(going_VBG_2_0, are_VBP_1_0); xcomp(going_VBG_2_0, populate_VB_4_0); "
            "aux(populate_VB_4_0, to_TO_3_0); dobj(populate_VB_4_0, earth_NN_6_0); "
            "det(earth_NN_6_0, the_DT_5_0)")
        ex = template("be {rel}",
                      "{arg1} <nsubj< {rel1} >xcomp> {rel2} >dobj> {arg2}")
        assert triples(ex, pickled) == [
            "(Humans; are going to populate; the earth)"]

    def test_crush(self):
        pickled = (
            "(on_IN_4_0), (._._6_0), nsubj(has_VBZ_1_0, Juliette_NNP_0_0); "
            "dobj(has_VBZ_1_0, crush_NN_3_0); det(crush_NN_3_0, a_DT_2_0); "
            "prep_on(crush_NN_3_0, Romeo_NNP_5_0)")
        ex = template("{rel} on",
                      "{arg1} <nsubj< {rel1} >dobj> {rel2} >prep_on> {arg2}")
        assert triples(ex, pickled) == ["(Juliette; has a crush on; Romeo)"]


GOSLING = (
    "(of_IN_4_0), (by_IN_8_0), (of_IN_15_0), (at_IN_17_0), (of_IN_20_0), "
    "(at_IN_22_0), (and_CC_25_0), nsubj(types_NNS_3_0, These_DT_0_0); "
    "cop(types_NNS_3_0, are_VBP_1_0); det(types_NNS_3_0, the_DT_2_0); "
    "prep_of(types_NNS_3_0, clues_NNS_5_0); punct(types_NNS_3_0, ,_,_24_0); "
    "conj_and(types_NNS_3_0, team_NN_27_0); punct(types_NNS_3_0, of..._._28_0); "
    "partmod(clues_NNS_5_0, ferreted_VBN_6_0); prt(ferreted_VBN_6_0, out_RP_7_0); "
    "agent(ferreted_VBN_6_0, Gosling_NNP_10_0); nn(Gosling_NNP_10_0, Sam_NNP_9_0); "
    "punct(Gosling_NNP_10_0, ,_,_11_0); appos(Gosling_NNP_10_0, professor_NN_14_0); "
    "det(professor_NN_14_0, an_DT_12_0); amod(professor_NN_14_0, associate_JJ_13_0); "
    "prep_of(professor_NN_14_0, psychology_NN_16_0); "
    "prep_at(professor_NN_14_0, University_NNP_19_0); "
    "det(University_NNP_19_0, the_DT_18_0); "
    "prep_of(University_NNP_19_0, Texas_NNP_21_0); "
    "prep_at(University_NNP_19_0, Austin_NNP_23_0); "
    "poss(team_NN_27_0, his_PRP$_26_0)")


class TestExpansion:
    def test_advmod_expansion(self):
        # PatternExtractorSpec.scala:162-169
        pickled = (
            "det(people_NNS_1_0, The_DT_0_0); nsubj(fled_VBD_2_0, people_NNS_1_0); "
            "advmod(fled_VBD_2_0, chaotically_RB_3_0); det(barn_NN_6_0, the_DT_5_0); "
            "prep_towards(fled_VBD_2_0, barn_NN_6_0)")
        ex = general("{arg1} <nsubj< {rel} >prep_towards> {arg2}")
        assert triples(ex, pickled) == ["(The people; fled chaotically; the barn)"]

    def test_nounrel_of_expansion_no_overlap(self):
        # PatternExtractorSpec.scala:171-177
        ex = template("be {rel} {prep}",
                      "{arg1} >appos> {rel:postag=NN} >{prep:regex=prep_(.*)}> {arg2}")
        got = triples(ex, GOSLING)
        assert ("(Sam Gosling; be an associate professor of psychology at; "
                "the University of Texas)") in got

    def test_nounrel_of_no_expansion_on_overlap(self):
        # PatternExtractorSpec.scala:179-185
        ex = template("be {rel} {prep}",
                      "{arg1} >appos> {rel:postag=NN} >{prep:regex=prep_(.*)}> {arg2}")
        got = triples(ex, GOSLING)
        assert "(Sam Gosling; be an associate professor of; psychology)" in got


class TestRegexMemoEviction:
    def test_memo_evicts_half_not_all(self):
        """At the 64k bound the memo drops its oldest half (no periodic
        full-recompute spike) and stays correct afterwards."""
        from ollie_spark.model.patterns import NodeMatcher
        from ollie_spark.graph import Node

        m = NodeMatcher(alias="slot", regex="tok[0-9]+x?")
        cap = 65536
        for i in range(cap):
            assert m.matches(Node(f"tok{i}", "NN", i, 0))
        assert len(m._regex_memo) == cap
        # the next MISS triggers eviction of the oldest half, then
        # inserts the new entry
        assert not m.matches(Node("zzz-miss", "NN", 0, 0))
        assert len(m._regex_memo) == cap // 2 + 1
        assert "tok0" not in m._regex_memo          # oldest half gone
        assert f"tok{cap - 1}" in m._regex_memo     # newest half kept
        # evicted entries recompute correctly
        assert m.matches(Node("tok0", "NN", 0, 0))
