"""Load the learned pattern model + confidence classifier.

The model ships in this repo as ``resources/model.json.gz`` — our own
structured IR of the published Ollie learned model (629 template
extractors, 38 logistic-regression feature weights + intercept),
produced by ``scripts/convert_model.py`` (provenance:
core/src/main/resources/edu/knowitall/openparse/openparse.model and
.../ollie/confidence/default-classifier.txt in the reference).

In the Spark pipeline the loaded model is broadcast once per job; it is
never a DataFrame (SURVEY.md §1.1 "Model file").
"""

from __future__ import annotations

import gzip
import json
import os
from functools import lru_cache

from ..extract.build import Extractor, Template
from .patterns import Pattern

_PACKAGED = "__packaged__"   # sentinel: read via importlib.resources


@lru_cache(maxsize=4)
def _load_raw(path: str) -> dict:
    if path == _PACKAGED:
        # zip-safe (works when the package ships via --py-files)
        from importlib.resources import files
        blob = (files("ollie_spark") / "resources/model.json.gz").read_bytes()
        return json.loads(gzip.decompress(blob))
    with gzip.open(path, "rb") as f:
        return json.loads(f.read())


def load_extractors(path: str | None = None) -> list[Extractor]:
    """The 629 template extractors of the default model."""
    raw = _load_raw(str(path or os.environ.get("OLLIE_SPARK_MODEL")
                        or _PACKAGED))
    return [
        Extractor(Pattern.deserialize(p["pattern"]), p["conf"],
                  template=Template(p["template"], p["be"]))
        for p in raw["patterns"]
    ]


def load_classifier(path: str | None = None) -> tuple[float, dict]:
    """(intercept, {feature_name: weight}) of the confidence model."""
    raw = _load_raw(str(path or os.environ.get("OLLIE_SPARK_MODEL")
                        or _PACKAGED))
    c = raw["classifier"]
    return c["intercept"], dict(c["weights"])
