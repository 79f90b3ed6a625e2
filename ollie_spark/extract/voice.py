"""Voice switching: rewrite active graphs to passive and vice versa
(ollie/DependencyGraphExtras.scala:13-115, golden-tested by
DependencyGraphExtrasSpec.scala:10-28).

Experiment-path operator (not in the runtime pipeline).  The port is
behavior-exact, including the reference's quirks: the inserted "was"
node reuses the verb's original index (colliding with a shifted token
until the final re-offset), and the active-voice candidate filter
reduces to "has an outgoing prep edge" (the stricter checks in the
Scala block are computed and discarded); where the reference would
throw on a spurious candidate, we skip it.
"""

from __future__ import annotations

from ..graph import DependencyGraph, Edge, Node, span_of


def _span(nodes):
    return span_of(n.indices for n in nodes)


def _swap_orders(edges, left, right):
    """DependencyGraphExtras.swapOrders: exchange the positions of the
    left and right node groups."""
    left_keys = {(n.text, n.postag, n.start, n.offset) for n in left}
    right_keys = {(n.text, n.postag, n.start, n.offset) for n in right}
    li, ri = _span(left), _span(right)
    assert li[1] <= ri[0]
    tokens_between = ri[0] - li[1] + 1
    left_off = max(n.offset for n in left)
    right_off = min(n.offset for n in right)
    chars_between = right_off - left_off

    def m(n):
        k = (n.text, n.postag, n.start, n.offset)
        if k in left_keys:
            return Node(n.text, n.postag, n.start + tokens_between,
                        n.end + tokens_between, n.offset + chars_between)
        if k in right_keys:
            return Node(n.text, n.postag, n.start - tokens_between,
                        n.end - tokens_between, n.offset - chars_between)
        return n

    return [Edge(e.label, m(e.src), m(e.dst)) for e in edges]


def _rebuild_with_offsets(edges):
    """New graph over the edges' nodes; offsets recomputed from the
    space-joined text (Tokenizer.computeOffsets)."""
    nodes = {}
    for e in edges:
        for n in (e.src, e.dst):
            nodes[n.sort_key] = n
    ordered = sorted(nodes.values(), key=lambda n: n.sort_key)
    offset_map = {}
    pos = 0
    for n in ordered:
        offset_map[n.sort_key] = pos
        pos += len(n.text) + 1

    def m(n):
        return Node(n.text, n.postag, n.start, n.end,
                    offset_map[n.sort_key])

    return DependencyGraph(
        [m(n) for n in ordered],
        [Edge(e.label, m(e.src), m(e.dst)) for e in edges])


def passive_voice(graph: DependencyGraph) -> list[DependencyGraph]:
    out = []
    for v in graph.nodes:
        if not v.postag.startswith("VB"):
            continue
        nsubj = next((e for e in graph.edges
                      if e.label == "nsubj"
                      and e.src.sort_key == v.sort_key), None)
        dobj = next((e for e in graph.edges
                     if e.label == "dobj"
                     and e.src.sort_key == v.sort_key), None)
        if nsubj is None or dobj is None:
            continue
        nsubj_inf = graph.inferiors(nsubj.dst)
        dobj_inf = graph.inferiors(dobj.dst)
        dobj_start = _span(dobj_inf)[0]

        by = Node("by", "IN", dobj_start, dobj_start + 1, -1)
        was = Node("was", "VBD", v.start, v.start + 1, -1)

        def node_map(n, by=by, was=was):
            start = n.start
            if n.start >= by.start and n.sort_key != by.sort_key:
                start += 1
            if n.start >= was.start and n.sort_key != was.sort_key \
                    and not (n.text == was.text and n.offset == -1):
                start += 1
            return Node(n.text, n.postag, start,
                        start + (n.end - n.start), n.offset)

        skip = {id(nsubj), id(dobj)}
        new_edges = [e for e in graph.edges if id(e) not in skip]
        new_edges += [Edge("nsubjpass", v, dobj.dst),
                      Edge("prep", v, by),
                      Edge("pobj", by, nsubj.dst),
                      Edge("auxpass", v, was)]
        mapped = [Edge(e.label, node_map(e.src), node_map(e.dst))
                  for e in new_edges]
        swapped = _swap_orders(mapped,
                               [node_map(n) for n in nsubj_inf],
                               [node_map(n) for n in dobj_inf])
        out.append(_rebuild_with_offsets(swapped))
    return out


def active_voice(graph: DependencyGraph) -> list[DependencyGraph]:
    out = []
    for v in graph.nodes:
        # faithful candidate filter: any outgoing prep edge
        if not any(e.label == "prep" for e in graph.out_edges(v)):
            continue
        nsubjpass = next((e for e in graph.out_edges(v)
                          if e.label == "nsubjpass"), None)
        auxpass = next((e for e in graph.out_edges(v)
                        if e.label == "auxpass"), None)
        prep = next(
            (e for e in graph.out_edges(v)
             if e.label == "prep" and e.dst.text == "by"
             and any(x.label == "pobj" for x in graph.out_edges(e.dst))),
            None)
        if nsubjpass is None or auxpass is None or prep is None:
            continue  # the reference would throw here; we skip
        pobj = next(e for e in graph.out_edges(prep.dst)
                    if e.label == "pobj")

        skip = {id(nsubjpass), id(auxpass), id(prep), id(pobj)}
        new_edges = [e for e in graph.edges if id(e) not in skip]
        new_edges += [Edge("nsubj", v, pobj.dst),
                      Edge("dobj", v, nsubjpass.dst)]
        swapped = _swap_orders(new_edges,
                               graph.inferiors(nsubjpass.dst),
                               graph.inferiors(pobj.dst))
        # compact reindex over the remaining nodes
        nodes = {}
        for e in swapped:
            for n in (e.src, e.dst):
                nodes[n.sort_key] = n
        ordered = sorted(nodes.values(), key=lambda n: n.sort_key)
        idx = {n.sort_key: i for i, n in enumerate(ordered)}

        def reindex(n, idx=idx):
            i = idx[n.sort_key]
            return Node(n.text, n.postag, i, i + 1, -1)

        compact = [Edge(e.label, reindex(e.src), reindex(e.dst))
                   for e in swapped]
        out.append(_rebuild_with_offsets(compact))
    return out


def switch_voice(graph: DependencyGraph) -> list[DependencyGraph]:
    return passive_voice(graph) + active_voice(graph)
