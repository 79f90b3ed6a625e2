#!/usr/bin/env python3
"""Convert the published Ollie learned model into ollie_spark's own IR.

Reads the reference's public learned resources (the 629-row template
pattern model and the 39-weight logistic-regression classifier) and
re-serializes them into this engine's structured JSON resource,
validating every pattern through our own grammar round-trip on the way.

Usage:
    python scripts/convert_model.py [REFERENCE_ROOT]

Writes ollie_spark/resources/model.json.gz with:
    {"patterns": [{"template": str, "be": bool, "pattern": str,
                   "conf": float}, ...],
     "classifier": {"intercept": float, "weights": {feature: w}}}
"""

import gzip
import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from ollie_spark.model.patterns import Pattern  # noqa: E402

DEFAULT_REF = "/root/reference"
MODEL_REL = ("core/src/main/resources/edu/knowitall/openparse/"
             "openparse.model")
CLASSIFIER_REL = ("core/src/main/resources/edu/knowitall/ollie/"
                  "confidence/default-classifier.txt")
OUT = Path(__file__).resolve().parents[1] / "ollie_spark/resources/model.json.gz"


def main():
    ref = Path(sys.argv[1] if len(sys.argv) > 1 else DEFAULT_REF)
    lines = (ref / MODEL_REL).read_text().splitlines()
    assert lines[0].strip() == "template", "expected a template-typed model"
    patterns = []
    for line in lines[1:]:
        if not line.strip():
            continue
        template, pattern, conf = line.split("\t")
        # validate through our grammar: parse + exact round-trip
        parsed = Pattern.deserialize(pattern)
        assert parsed.serialize() == pattern, f"round-trip failed: {pattern}"
        be = template.startswith("be ")
        patterns.append({
            "template": template[3:] if be else template,
            "be": be,
            "pattern": pattern,
            "conf": float(conf),
        })

    weights, intercept = {}, 0.0
    for line in (ref / CLASSIFIER_REL).read_text().splitlines():
        if not line.strip():
            continue
        name, w = line.rsplit("\t", 1) if "\t" in line else line.rsplit(" ", 1)
        name = name.strip()
        if name == "Intercept":
            intercept = float(w)
        else:
            weights[name] = float(w)

    OUT.parent.mkdir(parents=True, exist_ok=True)
    blob = json.dumps({
        "patterns": patterns,
        "classifier": {"intercept": intercept, "weights": weights},
    }, sort_keys=True).encode()
    with open(OUT, "wb") as raw:
        with gzip.GzipFile(fileobj=raw, mode="wb", mtime=0) as f:
            f.write(blob)
    print(f"wrote {OUT}: {len(patterns)} patterns, "
          f"{len(weights)} feature weights")


if __name__ == "__main__":
    main()
