"""A small rule-based English lemmatizer (Morpha-style behavior).

The reference stems with MorphaStemmer (a finite-state morphological
analyzer; see ollie/Ollie.scala:20,73 in the reference).  We only need
lemmas for (a) relation-lemma sets (with a preposition blacklist),
(b) attribution verb lookup against the communication/cognitive word
lists, and (c) lemma-regex node constraints in the learned pattern
model.  A compact irregular table plus standard suffix rules covers
that vocabulary; outputs are lowercase.
"""

from __future__ import annotations

from functools import lru_cache

# Irregular verb/noun forms -> lemma.  Covers the auxiliaries, the verbs
# appearing in the model's lemma-regex constraints (base|bear|...|situate),
# the communication/cognitive word lists, and common fixture vocabulary.
IRREGULAR = {
    # be / have / do / modals
    "am": "be", "is": "be", "are": "be", "was": "be", "were": "be",
    "been": "be", "being": "be", "'s": "be", "'re": "be", "'m": "be",
    "has": "have", "had": "have", "having": "have", "'ve": "have",
    "does": "do", "did": "do", "done": "do", "doing": "do",
    "would": "will", "'d": "will", "'ll": "will", "ca": "can", "wo": "will",
    # verbs in the model's VBN/VBD regex lists and common fixtures
    "born": "bear", "borne": "bear", "bore": "bear",
    "based": "base", "found": "find", "finds": "find", "founded": "found",
    "held": "hold", "holds": "hold", "holding": "hold",
    "known": "know", "knew": "know", "knows": "know",
    "said": "say", "says": "say", "saying": "say",
    "told": "tell", "tells": "tell", "thought": "think", "thinks": "think",
    "believed": "believe", "believes": "believe",
    "went": "go", "gone": "go", "goes": "go",
    "made": "make", "makes": "make", "took": "take", "taken": "take",
    "came": "come", "comes": "come", "got": "get", "gotten": "get",
    "gave": "give", "given": "give", "saw": "see", "seen": "see",
    "wrote": "write", "written": "write", "spoke": "speak", "spoken": "speak",
    "ate": "eat", "eaten": "eat", "ran": "run", "fled": "flee",
    "led": "lead", "met": "meet", "kept": "keep", "left": "leave",
    "felt": "feel", "meant": "mean", "sent": "send", "built": "build",
    "bought": "buy", "brought": "bring", "caught": "catch",
    "taught": "teach", "sought": "seek", "fought": "fight",
    "sold": "sell", "paid": "pay", "laid": "lay", "lay": "lie",
    "stood": "stand", "understood": "understand", "won": "win",
    "began": "begin", "begun": "begin", "sang": "sing", "sung": "sing",
    "grew": "grow", "grown": "grow", "drew": "draw", "drawn": "draw",
    "flew": "fly", "flown": "fly", "threw": "throw", "thrown": "throw",
    "rose": "rise", "risen": "rise", "chose": "choose", "chosen": "choose",
    "broke": "break", "broken": "break", "drove": "drive", "driven": "drive",
    "wore": "wear", "worn": "wear", "died": "die", "dying": "die",
    "lost": "lose", "read": "read", "put": "put", "set": "set",
    "hit": "hit", "cut": "cut", "let": "let", "shut": "shut",
    "elected": "elect", "located": "locate", "situated": "situate",
    "published": "publish", "composed": "compose", "comprised": "comprise",
    "bordered": "border", "scheduled": "schedule",
    # common -ed/-ing forms the suffix heuristics get wrong
    # (vowel-pair stems take no silent e; unstressed final syllables)
    "looked": "look", "looking": "look", "seemed": "seem",
    "appeared": "appear", "appearing": "appear", "rained": "rain",
    "cleaned": "clean", "joined": "join", "trained": "train",
    "remained": "remain", "gained": "gain", "maintained": "maintain",
    "obtained": "obtain", "explained": "explain", "claimed": "claim",
    "visited": "visit", "visiting": "visit", "opened": "open",
    "opening": "open", "offered": "offer", "entered": "enter",
    "listened": "listen", "ordered": "order", "answered": "answer",
    "covered": "cover", "delivered": "deliver",
    "considered": "consider", "remembered": "remember",
    "gathered": "gather", "happened": "happen", "returned": "return",
    "waited": "wait", "treated": "treat", "repeated": "repeat",
    "defeated": "defeat", "created": "create", "edited": "edit",
    "limited": "limit", "developed": "develop", "signed": "sign",
    "designed": "design", "reached": "reach", "appointed": "appoint",
    "pointed": "point", "printed": "print", "counted": "count",
    "painted": "paint", "learned": "learn", "earned": "earn",
    "retained": "retain", "contained": "contain", "looted": "loot",
    "headed": "head", "needed": "need", "loaded": "load",
    "recorded": "record", "rewarded": "reward", "avoided": "avoid",
    "attended": "attend", "depended": "depend", "extended": "extend",
    "defended": "defend", "intended": "intend", "sounded": "sound",
    "surrounded": "surround", "demanded": "demand",
    "commanded": "command", "expanded": "expand", "landed": "land",
    "ended": "end", "handed": "hand", "funded": "fund",
    # irregular noun plurals
    "men": "man", "women": "woman", "children": "child", "people": "person",
    "feet": "foot", "teeth": "tooth", "geese": "goose", "mice": "mouse",
    "lives": "life", "wives": "wife", "knives": "knife", "leaves": "leaf",
    "states": "state",
}

_VOWELS = set("aeiou")

_KEEP_S = ("ss", "us", "is", "ous", "ies'")  # words ending so, keep as-is


def _strip_plural_s(w: str) -> str:
    if w.endswith("ies") and len(w) > 4:
        return w[:-3] + "y"
    if w.endswith(("ches", "shes", "xes", "zes", "sses")):
        return w[:-2]
    if w.endswith("oes") and len(w) > 4:
        return w[:-2]
    if w.endswith("s") and not w.endswith(("ss", "us", "is")) and len(w) > 3:
        return w[:-1]
    return w


def _strip_ed(w: str) -> str:
    if w.endswith("ied") and len(w) > 4:
        return w[:-3] + "y"
    if w.endswith("ed") and len(w) > 3:
        stem = w[:-2]
        # doubled final consonant: "stopped" -> "stop"
        if (len(stem) >= 3 and stem[-1] == stem[-2]
                and stem[-1] not in _VOWELS and stem[-1] not in "sl"):
            return stem[:-1]
        # e-insertion: "hoped" -> "hope" (heuristic: CVCe pattern)
        if (len(stem) >= 2 and stem[-1] not in _VOWELS
                and stem[-2] in _VOWELS
                and not w.endswith(("eed", "owed", "ayed", "oyed"))):
            cand = stem + "e"
            return cand if cand not in ("the",) else stem
        return stem
    return w


def _strip_ing(w: str) -> str:
    if w.endswith("ing") and len(w) > 5:
        stem = w[:-3]
        if len(stem) >= 3 and stem[-1] == stem[-2] and stem[-1] not in _VOWELS:
            return stem[:-1]
        if (len(stem) >= 2 and stem[-1] not in _VOWELS
                and stem[-2] in _VOWELS and stem[-1] not in "wxy"):
            return stem + "e"
        return stem
    return w


@lru_cache(maxsize=65536)
def lemmatize(word: str) -> str:
    """Lowercase lemma of a single token."""
    w = word.lower()
    if not w or not any(c.isalpha() for c in w):
        return w
    if w in IRREGULAR:
        return IRREGULAR[w]
    if w.endswith("ing"):
        cand = _strip_ing(w)
        if cand != w:
            return IRREGULAR.get(cand, cand)
    if w.endswith("ed"):
        cand = _strip_ed(w)
        if cand != w:
            return IRREGULAR.get(cand, cand)
    if w.endswith("s"):
        cand = _strip_plural_s(w)
        if cand != w:
            return IRREGULAR.get(cand, cand)
    return w
