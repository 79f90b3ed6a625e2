"""Node-expansion rules: grow a matched head node into a phrase.

Faithful re-expression of the reference's expansion semantics
(openparse/GraphExpansions.scala:14-112 and
openparse/extract/Extraction.scala:214-305): argument expansion over a
closed label set with span-cover semantics, relational-noun vs verb
expansion, cop/aux augmentation, and dobj/iobj subcomponents.

All functions are pure, operate on one sentence's DependencyGraph, and
run inside the Arrow-batched extraction UDF — never as Spark joins.
"""

from __future__ import annotations

from operator import attrgetter

from ..graph import DependencyGraph, Node, span_of, superset

_SORT_KEY = attrgetter("sort_key")  # C-level key fn for the hot sorts

ARGUMENT_EXPANSION_LABELS = frozenset(
    {"det", "prep_of", "amod", "num", "number", "nn", "poss", "quantmod",
     "neg"})

RELATION_NOUN_COMPONENTS = frozenset(
    {"rcmod", "infmod", "partmod", "ref", "prepc_of"})

_VERB_REL_EXPANSION_LABELS = frozenset(
    {"det", "amod", "num", "number", "nn", "poss", "quantmod", "neg"})


def _sorted_nodes(nodes) -> list[Node]:
    return sorted(nodes, key=_SORT_KEY)


def nodes_text(nodes) -> str:
    return " ".join(n.text for n in _sorted_nodes(nodes))


def neighbors_until(graph: DependencyGraph, node: Node, ordered: list[Node],
                    until: set) -> list[Node]:
    """Take nodes left and right of ``node`` in ``ordered`` until an
    ``until`` node blocks, then return every sentence token whose last
    index falls inside the covered span (GraphExpansions.scala:14-23)."""
    until_keys = {n.sort_key for n in until}
    lefts, rights, seen_node = [], [], False
    for n in ordered:
        if n.sort_key == node.sort_key:
            seen_node = True
            continue
        (rights if seen_node else lefts).append(n)
    lefts.reverse()  # nearest-left first

    spans = [node.indices]
    for n in lefts:
        if n.sort_key in until_keys:
            break
        spans.append(n.indices)
    for n in rights:
        if n.sort_key in until_keys:
            break
        spans.append(n.indices)
    lo, hi = span_of(spans)
    # node.indices.max (inclusive last) within [lo, hi)
    return [n for n in graph.nodes if lo <= n.end - 1 <= hi - 1]


def expand(graph: DependencyGraph, node: Node, until: set,
           labels: frozenset) -> list[Node]:
    """Span-cover expansion over ``labels`` inferiors plus nn-connected
    nodes (GraphExpansions.scala:51-68)."""
    inferiors = graph.inferiors(node, lambda e: e.label in labels)
    nns = graph.connected(node, lambda e, down: e.label == "nn")
    pool = {n.sort_key: n for n in inferiors}
    pool.update({n.sort_key: n for n in nns})
    ordered = _sorted_nodes(pool.values())
    return neighbors_until(graph, node, ordered, until)


def augment(graph: DependencyGraph, node: Node, pred) -> list[list[Node]]:
    """Full inferior sets of each qualifying successor
    (GraphExpansions.scala:70-77; its ``without`` param is unused there
    too)."""
    out = []
    for e in graph.out_edges(node):
        if pred(e):
            out.append(_sorted_nodes(graph.inferiors(e.dst)))
    return out


def components(graph: DependencyGraph, node: Node, labels: frozenset,
               without: set, nested: bool) -> list[list[Node]]:
    """Subcomponents hanging off ``node`` across ``labels`` edges
    (GraphExpansions.scala:85-112)."""
    across = [e.dst for e in graph.out_edges(node) if e.label in labels]
    across_keys = {n.sort_key for n in across}
    without_keys = {n.sort_key for n in without}
    out = []
    for start in across:
        def cond(e):
            if e.label.startswith("conj") and e.dst.sort_key in across_keys:
                return False
            if e.dst.sort_key == node.sort_key:
                return False
            return nested or e.label not in labels
        inf = graph.inferiors(start, cond)
        if any(n.sort_key in without_keys for n in inf):
            continue
        lo, hi = span_of(n.indices for n in inf)
        out.append([n for n in graph.nodes if superset((lo, hi), n.indices)])
    return out


def expand_argument(graph: DependencyGraph, node: Node,
                    until: set) -> list[Node]:
    """Argument head -> full phrase (Extraction.scala:214-236)."""
    def expand_node(n: Node) -> list[Node]:
        expansion = expand(graph, n, until, ARGUMENT_EXPANSION_LABELS)
        if any(x.is_proper_noun for x in expansion):
            return expansion
        comps = components(graph, n, RELATION_NOUN_COMPONENTS, until, False)
        pool = {x.sort_key: x for x in expansion}
        for comp in comps:
            pool.update({x.sort_key: x for x in comp})
        return _sorted_nodes(pool.values())

    # fan out across conj_and / conj_or edges to non-verbs
    conj = graph.connected(
        node, lambda e, down: (e.label in ("conj_and", "conj_or"))
        and not (e.dst if down else e.src).postag.startswith("VB"))

    if len(conj) == 1:
        return _sorted_nodes(expand_node(node))
    flat = {}
    for n in conj:
        for x in expand_node(n):
            flat[x.sort_key] = x
    lo, hi = span_of(n.indices for n in flat.values())
    return [n for n in graph.nodes if superset((lo, hi), n.indices)]


def expand_relation(graph: DependencyGraph, node: Node,
                    until: set) -> list[tuple[list[Node], str]]:
    """Relation head -> one or more (nodes, text) parts
    (Extraction.scala:244-305).  Multiple parts arise from multiple
    dobj/iobj components."""
    def pred(e):
        if e.dst.sort_key == node.sort_key:
            return False
        return ((e.label == "advmod" and e.dst.postag == "RB")
                or e.label in ("aux", "cop", "auxpass", "prt", "acomp"))

    if node.postag.startswith("NN"):
        expand_noun = expand(graph, node, until, ARGUMENT_EXPANSION_LABELS)
    else:
        expand_noun = expand(graph, node, until, _VERB_REL_EXPANSION_LABELS)
    expand_noun_keys = {n.sort_key for n in expand_noun}

    cops = graph.predecessors(node, lambda e: e.label == "cop")
    cop_sets = augment(graph, cops[0], pred) if cops else []

    def or_empty(comps):
        return comps if comps else [[]]

    dobjs = or_empty(components(graph, node, frozenset({"dobj"}), until, True))
    iobjs = or_empty(components(graph, node, frozenset({"iobj"}), until, True))

    aug_sets = [
        [n for n in s if n.sort_key not in expand_noun_keys]
        for s in augment(graph, node, pred)
    ]

    parts = []
    for dobj in dobjs:
        for iobj in iobjs:
            tail = aug_sets + [dobj, iobj]
            tail = [c for c in tail
                    if c and not (len(c) == 1 and c[0].postag == "WP")]
            expansion = cop_sets + [expand_noun] + tail
            ordered = sorted(expansion,
                             key=lambda ns: span_of(n.indices for n in ns))
            text = " ".join(nodes_text(ns) for ns in ordered)
            pool = {}
            for ns in expansion:
                pool.update({n.sort_key: n for n in ns})
            parts.append((_sorted_nodes(pool.values()), text))
    return parts
