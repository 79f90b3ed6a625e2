"""Closed lexicons used by the extractor.

Mirrors the reference's broadcast word lists (ollie/Ollie.scala:76-88 and
nlptools Postagger prepositions): verbs of communication ("said ...") and
cognition ("believes ...") gate attribution detection; enabler prefixes
gate enabling conditions; prepositions drive the relation-lemma blacklist,
n-ary suffix splitting, and the trailing-preposition feature.

These are tiny closed sets — in the Spark pipeline they ride along as
broadcast frozensets, never as DataFrames.
"""

from __future__ import annotations

COMMUNICATION_WORDS = frozenset((
    "acknowledge acquaint add advise affirm allege announce apprise "
    "articulate believe blab blurt claim comment communicate confess "
    "confide confirm consider convey corroborate declare deem demonstrate "
    "disclose divulge elaborate elucidate establish esteem exclaim explain "
    "explicate expound feel illustrate imagine inform insinuate insist "
    "intimate justify know leak lecture mention moralize narrate note "
    "notify observe pose preach proclaim promulgate propose prove rant "
    "rate read reaffirm recite reckon recount reiterate relate relay "
    "remark remember remind repeat reply report respond retort reveal say "
    "see show sniff speak state suppose suspect talk teach tell testify "
    "theorize think update utter venture verify view voice write"
).split())

COGNITIVE_WORDS = frozenset((
    "accept admit affirm aim allow apprehend assert attest aver avouch "
    "avow believe claim comprehend confirm conjecture consider contend "
    "define deny describe discover doubt dream envisage expect fathom feel "
    "follow foreknow foresee foretell grant grasp guarantee guess hold "
    "hope identify imagine infer intend know maintain mean misapprehend "
    "misconstrue misinterpret misunderstand observe plan portray presume "
    "prophesy propose reaffirm realize recognize recollect remember report "
    "represent repute reveal see show speculate suppose surmise suspect "
    "swear think trust understand vaticinate visualize wish yen"
).split())

ENABLER_PREFIXES = frozenset((
    "after although because before but however if once that though when "
    "whenever whether where while would"
).split())

# Single-word prepositions (nlptools Postagger.simplePrepositions
# equivalent): used for the relation-lemma blacklist and for detecting
# relations that end in a preposition (n-ary rollup, features).
SIMPLE_PREPOSITIONS = frozenset((
    "aboard about above across after against along alongside amid amidst "
    "among amongst around as aside astride at atop before behind below "
    "beneath beside besides between beyond but by despite down during "
    "except for from in inside into like near nearby of off on onto out "
    "outside over past per round since than through throughout till to "
    "toward towards under underneath until unto up upon via with within "
    "without"
).split())

# Multi-word prepositions; PREPOSITIONS = simple + complex, used where the
# reference uses Postagger.prepositions (longest-suffix split in the n-ary
# rollup, trailing-preposition regexes).
COMPLEX_PREPOSITIONS = frozenset((
    "according to", "ahead of", "along with", "apart from", "as for",
    "as of", "as per", "as regards", "as to", "aside from", "away from",
    "because of", "by means of", "close to", "due to", "except for",
    "far from", "in accordance with", "in addition to", "in case of",
    "in front of", "in lieu of", "in place of", "in spite of", "inside of",
    "instead of", "near to", "next to", "on account of", "on behalf of",
    "on top of", "out of", "outside of", "owing to", "prior to",
    "pursuant to", "regardless of", "subsequent to", "such as",
    "thanks to", "up to", "with regard to", "with respect to",
))

PREPOSITIONS = SIMPLE_PREPOSITIONS | COMPLEX_PREPOSITIONS

# OpenParse.LEMMA_BLACKLIST (OpenParse.scala:138): lemmas ignored when
# building a relation's lemma set.
LEMMA_BLACKLIST = SIMPLE_PREPOSITIONS | {"like", "be"}

# OpenParse.VALID_ARG_POSTAG (OpenParse.scala:139): postags an argument
# head node must have when restrictArguments is on.
VALID_ARG_POSTAG = frozenset(
    {"NN", "NNS", "NNP", "NNPS", "JJ", "JJS", "CD", "PRP"})
