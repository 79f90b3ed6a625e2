"""Local mirror of the driver's correctness gate: run every
__spark_entry__ query AND its DuckDB oracle at sf0.001, compare
row-count, column names, and order-insensitive values."""

import math

import duckdb
import pytest

import __spark_entry__ as entry_mod

SF_DIR = "/root/testdata/sf0.001"

ORACLES = entry_mod.oracle_sql()
QUERIES = entry_mod.queries()


@pytest.fixture(scope="module")
def ddb():
    con = duckdb.connect()
    for t in ("region nation customer supplier part orders lineitem "
              "events documents embeddings").split():
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM "
                    f"'{SF_DIR}/{t}.parquet'")
    return con


def _norm(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        return round(v, 6)
    return v


def _rows_to_set(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted(tuple(_norm(r[i]) for i in order) for r in rows)


@pytest.mark.parametrize("name", sorted(ORACLES))
def test_query_matches_oracle(spark, ddb, name):
    sdf = QUERIES[name](spark, SF_DIR)
    srows = sdf.collect()
    scols = sdf.columns

    ores = ddb.execute(ORACLES[name])
    ocols = [d[0] for d in ores.description]
    orows = ores.fetchall()

    assert sorted(scols) == sorted(ocols), f"{name}: column mismatch"
    assert len(srows) == len(orows), (
        f"{name}: rowcount {len(srows)} vs {len(orows)}")
    sset = _rows_to_set(scols, [[r[c] for c in scols] for r in srows])
    oset = _rows_to_set(ocols, orows)
    mismatch = [i for i, (a, b) in enumerate(zip(sset, oset)) if a != b]
    assert sset == oset, (
        f"{name}: value mismatch at {mismatch[:3]}: "
        f"{[ (sset[i], oset[i]) for i in mismatch[:2] ]}")


def test_every_query_has_entry():
    for name in ORACLES:
        assert name in QUERIES


def test_kg_queries_run(spark):
    for name in ("kg_extract_mentions", "kg_nary"):
        df = QUERIES[name](spark, SF_DIR)
        assert df.count() > 0, name


def test_entry_smoke(spark):
    df = entry_mod.entry(spark)
    assert df.count() > 0
    assert {"arg1_text", "rel_text", "arg2_text", "conf"} <= set(df.columns)
