"""Replicates the driver's correctness gate locally: every queries() entry
with an oracle_sql() is run on Spark AND DuckDB at sf0.01 and compared
(row count + column names + order-insensitive values)."""

from __future__ import annotations

import math

import duckdb
import pytest

import __spark_entry__ as entry_mod

from .conftest import SF01_DIR

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def _duck(sf_dir: str):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    return con


def _normalize(rows, cols):
    # sort columns by name (driver semantics), then rows
    import decimal

    idx = sorted(range(len(cols)), key=lambda i: cols[i])
    out = []
    for r in rows:
        vals = []
        for i in idx:
            v = r[i]
            if isinstance(v, float):
                # EXACT comparison (the driver hashes raw cell values —
                # any bit drift is a real mismatch there; rows are built
                # to be f32/f64 exact cross-engine, so demand it here too)
                if math.isnan(v):
                    v = "nan"
            elif isinstance(v, decimal.Decimal):
                # The driver hashes cell REPRESENTATIONS: Decimal('1.30')
                # vs float 1.3 is a mismatch there even though the values
                # are equal, so the mirror must compare representations
                # too (do not normalize decimals to float).
                v = ("dec", str(v))
            vals.append(v)
        out.append(tuple(vals))
    out.sort(key=lambda t: tuple(str(x) for x in t))
    return [cols[i] for i in idx], out


@pytest.fixture(scope="module")
def duck():
    return _duck(SF01_DIR)


ORACLED = sorted(entry_mod.oracle_sql().keys())
ALL = sorted(entry_mod.queries().keys())


@pytest.mark.parametrize("name", ORACLED)
def test_query_matches_oracle(spark, duck, name):
    q = entry_mod.queries()[name]
    sdf = q(spark, SF01_DIR)
    s_cols = sdf.columns
    s_rows = [tuple(r) for r in sdf.collect()]
    res = duck.execute(entry_mod.oracle_sql()[name])
    d_cols = [c[0] for c in res.description]
    d_rows = [tuple(r) for r in res.fetchall()]
    sc, sr = _normalize(s_rows, s_cols)
    dc, dr = _normalize(d_rows, d_cols)
    assert sc == dc, f"{name}: column mismatch {sc} vs {dc}"
    assert len(sr) == len(dr), f"{name}: row count {len(sr)} vs {len(dr)}"
    assert sr == dr, f"{name}: first diff: " + str(
        next(((a, b) for a, b in zip(sr, dr) if a != b), None)
    )


@pytest.mark.parametrize("name", [n for n in ALL if n not in ORACLED])
def test_rows_only_queries_run(spark, name):
    df = entry_mod.queries()[name](spark, SF01_DIR)
    assert df.count() >= 0


def test_entry_smoke(spark):
    df = entry_mod.entry(spark)
    rows = df.collect()
    assert len(rows) >= 0
    assert "doc_id" in df.columns and "score" in df.columns
