"""Deterministic synthetic corpus of interleaved text+media documents.

Produces the exact input_hint table shape:

    documents(doc_id string,
              spans array<struct<kind string, text string,
                                 media_ref string, offset int>>)

Generation is distributed (``spark.range`` -> ``mapInPandas``) and
hash-deterministic per doc_id, so any scale regenerates identically —
the corpus never lives on the driver.  ~75% of spans are text sentences
drawn from the synthetic template bank (plus embedded reference-fixture
sentences at a fixed rate); the rest are opaque media spans with typed
refs that the pipeline must pass through untouched (span-sequence
invariant, BASELINE.json input_hint).
"""

from __future__ import annotations

import random

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (ArrayType, IntegerType, StringType,
                               StructField, StructType)

from .synth import FIXTURE_PARSES, sample_sentence, sample_sentence_text

SPAN_SCHEMA = StructType([
    StructField("kind", StringType()),
    StructField("text", StringType()),
    StructField("media_ref", StringType()),
    StructField("offset", IntegerType()),
])

DOCUMENTS_SCHEMA = StructType([
    StructField("doc_id", StringType()),
    StructField("spans", ArrayType(SPAN_SCHEMA)),
])

_MEDIA_KINDS = ("image", "audio", "video")
_FIXTURE_TEXTS = sorted(FIXTURE_PARSES)


def build_doc(doc_id: str, seed: int = 42) -> list:
    """The spans of one document — pure function of (seed, doc_id)."""
    rng = random.Random(f"{seed}:{doc_id}")
    n_spans = rng.randint(1, 8)
    spans = []
    offset = 0
    for i in range(n_spans):
        roll = rng.random()
        if roll < 0.25:
            kind = _MEDIA_KINDS[rng.randrange(3)]
            spans.append((kind, None, f"media://{doc_id}/{i}", offset))
            offset += 1
        elif roll < 0.30:
            text = _FIXTURE_TEXTS[rng.randrange(len(_FIXTURE_TEXTS))]
            spans.append(("text", text, None, offset))
            offset += len(text)
        else:
            # text-only sampler: same RNG draws + same rendered string
            # as sample_sentence, minus the graph/expected construction
            # the corpus discards (~10x per-doc cost; synth.py)
            text = sample_sentence_text(rng)
            spans.append(("text", text, None, offset))
            offset += len(text)
    return spans


def corpus(spark: SparkSession, n_docs: int, seed: int = 42,
           partitions: int | None = None) -> DataFrame:
    """The documents table, generated on executors."""
    import pandas as pd  # noqa: deferred for executor import

    def gen(batches):
        for pdf in batches:
            ids = pdf["id"].tolist()
            yield pd.DataFrame({
                "doc_id": [f"doc-{i:012d}" for i in ids],
                "spans": [build_doc(f"doc-{i:012d}", seed) for i in ids],
            })

    rng_df = spark.range(0, n_docs,
                         numPartitions=partitions or
                         spark.sparkContext.defaultParallelism)
    return rng_df.mapInPandas(gen, schema=DOCUMENTS_SCHEMA)


def expected_triples(doc_id: str, seed: int = 42) -> list[tuple]:
    """Oracle for tests: the triples the synthetic template spans of a
    doc should produce (fixture spans are asserted separately)."""
    rng = random.Random(f"{seed}:{doc_id}")
    n_spans = rng.randint(1, 8)
    out = []
    for i in range(n_spans):
        roll = rng.random()
        if roll < 0.25:
            rng.randrange(3)
        elif roll < 0.30:
            rng.randrange(len(_FIXTURE_TEXTS))
        else:
            _, _, expected = sample_sentence(rng)
            out.extend(expected)
    return out
