"""The BASELINE.json acceptance metric on REAL data: our engine must
reproduce >= 0.95 of the triples the reference itself emitted on its
own training sentences (data/training.tsv carries 956 reference-
produced extractions with their source graphs)."""

from pathlib import Path

import pytest


@pytest.mark.skipif(
    not Path("/root/reference/data/training.tsv").exists(),
    reason="reference training data not available")
def test_reproduce_reference_extractions():
    from ollie_spark.bootstrap.reference_data import (
        load_training_instances)
    from ollie_spark.extract.ollie import Ollie

    insts, errors = load_training_instances()
    assert errors == 0
    ollie = Ollie()

    by_graph = {}
    for inst in insts:
        key = inst.graph.serialize()
        by_graph.setdefault(key, (inst.graph, []))[1].append(inst)

    hit = miss = 0
    for _, (graph, rows) in by_graph.items():
        try:
            got = {(r.arg1_text, r.rel_text, r.arg2_text)
                   for r in ollie.extract(graph)}
        except Exception:  # noqa: BLE001 — count as miss
            got = set()
        for inst in rows:
            t = (inst.extraction.arg1.text, inst.extraction.rel.text,
                 inst.extraction.arg2.text)
            if t in got:
                hit += 1
            else:
                miss += 1
    rate = hit / (hit + miss)
    assert rate >= 0.95, f"reproduced only {rate:.3f} ({hit}/{hit+miss})"
