"""Real-parser adapters for the R3 injection point.

The reference's user-facing default parses arbitrary English with a
bundled MaltParser (OllieCli.scala:200-209, README.md:149-163); this
repo keeps the parser pluggable (``extract_mentions(parser=...)``,
spark/pipeline.py) because no dependency-parser library ships in the
build container.  This module is the optional production adapter: it
converts spaCy's output into :class:`ollie_spark.graph.DependencyGraph`
with Stanford-style collapsing applied, so the shipped pattern model
(whose 629 patterns use the old Stanford-dependency label scheme —
``nn``/``rcmod``/``partmod``/``prep_of``/...) matches real parser
output directly.

Everything here derives from public documentation only: the spaCy
token API (``token.i`` / ``token.idx`` / ``token.tag_`` /
``token.dep_`` / ``token.head``), the ClearNLP dependency label scheme
used by spaCy's English models, and the Stanford typed-dependencies
manual (de Marneffe & Manning, 2008) for the target labels.

The conversion core (:func:`graph_from_doc`) is duck-typed over token
objects, so its semantics are fully unit-tested without spaCy
installed (tests/test_parser_adapter.py); the spaCy-loading wrapper
(:class:`SpacyParser`) is exercised by an integration test that skips
cleanly when spaCy or its model is unavailable.

Install (outside this container)::

    pip install spacy && python -m spacy download en_core_web_sm

then::

    from ollie_spark.parsers import SpacyParser
    mentions = extract_mentions(sents, parser=SpacyParser())
"""

from __future__ import annotations

from .graph import DependencyGraph, Edge, Node

# -------------------------------------------------------- label mapping
#
# spaCy English models emit ClearNLP-style labels; the pattern model
# expects old Stanford-SD labels.  Most labels coincide (nsubj, dobj,
# ccomp, xcomp, appos, amod, poss, conj, cc, prep, pobj, pcomp, ...);
# the dict below maps the ones that differ.  Context-dependent labels
# (acl, dative, npadvmod, agent) are handled in the rewrite pass.
_LABEL_MAP = {
    "compound": "nn",        # noun compound modifier
    "relcl": "rcmod",        # relative clause modifier
    "nummod": "num",         # numeric modifier
    "nmod": "nn",            # ClearNLP nominal modifier of nominal
    "case": "possessive",    # spaCy tags the 's clitic as `case`
    "oprd": "xcomp",         # object predicate -> open clausal comp
    "meta": "dep",
    "intj": "dep",
    "subtok": "dep",
}

# edges dropped entirely (their tokens stay as standalone nodes, which
# is exactly how DependencyGraph models tokens outside the collapsed
# tree — Stanford CCprocessed output also excludes punct edges)
_DROP_LABELS = frozenset({"ROOT", "punct", ""})

# npadvmod whose dependent is a temporal noun is Stanford `tmod`
_TEMPORAL_WORDS = frozenset(
    "monday tuesday wednesday thursday friday saturday sunday "
    "january february march april may june july august september "
    "october november december today yesterday tomorrow tonight "
    "morning afternoon evening night week month year decade century "
    "weekend spring summer autumn fall winter".split())


def _map_label(label, dst_tag, dst_text, dst_children):
    """Map one ClearNLP label to Stanford-SD, using the dependent's
    POS tag / text / children where the schemes split differently."""
    if label == "acl":
        # Stanford splits clausal noun modifiers: participial (VBG/VBN)
        # -> partmod, infinitival (marked by TO) -> infmod
        if any(tag == "TO" for tag, _ in dst_children):
            return "infmod"
        return "partmod"
    if label == "dative":
        # prepositional dative attaches to the preposition token (tag
        # IN/TO) and collapses to prep_to below; bare-noun dative is
        # Stanford iobj
        return "prep" if dst_tag in ("IN", "TO") else "iobj"
    if label == "npadvmod" and dst_text.lower() in _TEMPORAL_WORDS:
        return "tmod"
    return _LABEL_MAP.get(label, label)


def graph_from_doc(doc) -> DependencyGraph:
    """Convert a parsed document into a collapsed DependencyGraph.

    ``doc`` is any iterable of token objects exposing the spaCy token
    surface: ``text``, ``tag_`` (PTB tag), ``i`` (token index),
    ``idx`` (char offset), ``dep_`` (label), ``head`` (token).  A
    multi-sentence doc converts to one graph (a forest — each
    sentence root simply has no incoming edge), matching the
    one-graph-per-input-row parser contract.

    Stanford collapsing (prep_X / prepc_X / conj_X + conjunct
    propagation) is applied via ``DependencyGraph.collapse()``; the
    passive ``agent`` edge — which spaCy leaves pointing at the "by"
    token with a pobj child — is collapsed here onto the object, as
    the Stanford scheme does.
    """
    toks = list(doc)
    nodes = {}
    for t in toks:
        nodes[t.i] = Node(t.text, t.tag_, t.i, t.i + 1, t.idx)
    # raw dependency triples + adjacency (children by head index)
    raw = []
    children = {}
    for t in toks:
        if t.dep_ in _DROP_LABELS or t.head.i == t.i:
            continue
        raw.append((t.dep_, t.head.i, t.i))
        children.setdefault(t.head.i, []).append(t.i)
    child_tags = {
        i: [(nodes[ci].postag, nodes[ci].text) for ci in kids]
        for i, kids in children.items()}

    edges = []
    consumed = set()  # pobj edges absorbed into a collapsed agent
    # collapse passive agent first: agent(gov, by) + pobj(by, obj)
    # -> agent(gov, obj)  (Stanford CCprocessed semantics)
    pobj_of = {}
    for lab, h, d in raw:
        if lab == "pobj":
            pobj_of.setdefault(h, d)
    for lab, h, d in raw:
        if lab == "agent" and d in pobj_of:
            edges.append(Edge("agent", nodes[h], nodes[pobj_of[d]]))
            consumed.add(("pobj", d, pobj_of[d]))
            consumed.add(("agent", h, d))
    for lab, h, d in raw:
        if (lab, h, d) in consumed:
            continue
        mapped = _map_label(
            lab, nodes[d].postag, nodes[d].text, child_tags.get(d, []))
        edges.append(Edge(mapped, nodes[h], nodes[d]))
    g = DependencyGraph(
        nodes.values(), edges,
        text=getattr(doc, "text", None))
    return g.collapse()


# ----------------------------------------------------------- spaCy glue

# one loaded pipeline per (model, exclude) per python worker process —
# SpacyParser instances stay tiny/picklable and the model loads lazily
# on first batch, exactly like the pattern model's lazy-regex load
_NLP_CACHE: dict = {}


def _load_nlp(model: str, exclude: tuple):
    key = (model, exclude)
    nlp = _NLP_CACHE.get(key)
    if nlp is None:
        import spacy  # deferred: optional dependency

        nlp = spacy.load(model, exclude=list(exclude))
        _NLP_CACHE[key] = nlp
    return nlp


class SpacyParser:
    """Picklable ``parser(texts) -> list[DependencyGraph | None]`` for
    ``extract_mentions(parser=...)`` (the R3 injection contract,
    spark/pipeline.py).

    Holds only configuration; the spaCy pipeline itself loads lazily
    per executor python worker and is cached at module level, so the
    instance ships to executors at pickle cost ~bytes.  Per-text parse
    failures yield ``None`` (the pipeline emits an ``unparseable``
    error row); a failed model load raises and is shielded per batch.
    """

    def __init__(self, model: str = "en_core_web_sm",
                 batch_size: int = 64,
                 exclude: tuple = ("ner", "lemmatizer", "textcat")):
        self.model = model
        self.batch_size = batch_size
        self.exclude = tuple(exclude)

    def __call__(self, texts):
        nlp = _load_nlp(self.model, self.exclude)
        out = []
        for doc in nlp.pipe(list(texts), batch_size=self.batch_size):
            try:
                out.append(graph_from_doc(doc))
            except Exception:  # noqa: BLE001 — per-row shielding
                out.append(None)
        return out


def spacy_available(model: str = "en_core_web_sm") -> bool:
    """True when spaCy and ``model`` are importable here (used by the
    integration test to skip cleanly in parser-less containers)."""
    try:
        import spacy

        return spacy.util.is_package(model)
    except Exception:  # noqa: BLE001
        return False
