"""Pins the foundation of the float32-exact DuckDB oracles
(plans/coverage3_queries.py engine rows): DuckDB FLOAT arithmetic is IEEE
binary32 with round-to-nearest-even, i.e. bit-identical to numpy.float32,
for every operator the BM25/phrase oracle chains use (+, -, *, /, casts,
left-fold accumulation via list_reduce). If DuckDB ever changed FLOAT
promotion rules (e.g. computing FLOAT ops in DOUBLE), these tests fail
before the driver's hash gate does.
"""

from __future__ import annotations

import math
import struct

import duckdb
import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

CON = duckdb.connect()


def _f32s(**kw):
    return st.floats(
        min_value=0.0009765625,  # 2^-10, exactly representable in binary32
        max_value=1048576.0,     # 2^20
        allow_nan=False,
        allow_infinity=False,
        width=32,
    )


def _bits(x: float) -> int:
    return struct.unpack("<I", struct.pack("<f", x))[0]


@settings(max_examples=200, deadline=None)
@given(a=_f32s(), b=_f32s())
def test_binary_ops_match_numpy(a, b):
    fa, fb = np.float32(a), np.float32(b)
    for op, npv in [
        ("+", fa + fb),
        ("-", fa - fb),
        ("*", fa * fb),
        ("/", fa / fb),
    ]:
        got = CON.execute(
            f"SELECT ((?::FLOAT) {op} (?::FLOAT))::DOUBLE", [a, b]
        ).fetchone()[0]
        assert _bits(np.float32(got)) == _bits(npv), (op, a, b, got, float(npv))


@settings(max_examples=200, deadline=None)
@given(xs=st.lists(_f32s(), min_size=1, max_size=8))
def test_list_reduce_is_f32_left_fold(xs):
    """list_reduce((a,b)->(a+b)::FLOAT) == the engine's pinned summation:
    float32 left fold in list order."""
    acc = np.float32(xs[0])
    for x in xs[1:]:
        acc = np.float32(acc + np.float32(x))
    # route literals through DOUBLE: bare high-precision literals parse as
    # DECIMAL, whose FLOAT conversion is not IEEE round-to-nearest (the
    # engine oracles only ever use small exact literals + data columns)
    lit = ", ".join(f"({x!r}::DOUBLE)::FLOAT" for x in xs)
    got = CON.execute(
        f"SELECT list_reduce([{lit}], (a, b) -> (a + b)::FLOAT)::DOUBLE"
    ).fetchone()[0]
    assert _bits(np.float32(got)) == _bits(acc), (xs, got, float(acc))


@settings(max_examples=200, deadline=None)
@given(
    freq=st.integers(min_value=1, max_value=500),
    dl=st.integers(min_value=1, max_value=100000),
    df=st.integers(min_value=1, max_value=5000),
    n=st.integers(min_value=1, max_value=100000),
    sum_ttf=st.integers(min_value=1, max_value=10**9),
)
def test_bm25_contribution_chain(freq, dl, df, n, sum_ttf):
    """The full per-term oracle expression == bm25.norm_cache/score_block
    arithmetic, op for op (idf float64 -> FLOAT; denominator addend
    k1*((1-b) + (b*dl)/avgdl); score idf*(f/(f+add)))."""
    df = min(df, n)
    avgdl = sum_ttf / n
    # numpy mirror of bm25.norm_cache + bm25.score_block
    add = np.float32(1.2) * (
        np.float32(0.25)
        + np.float32(0.75) * np.float32(dl) / np.float32(avgdl)
    )
    idf = math.log(1 + (n - df + 0.5) / (df + 0.5))
    f = np.float32(freq)
    want = np.float32(np.float32(idf) * (f / (f + add)))

    got = CON.execute(
        f"""SELECT (((ln(1 + (({n}::DOUBLE) - {df} + 0.5) / ({df} + 0.5)))::FLOAT
        * (({freq}::FLOAT)
           / (({freq}::FLOAT)
              + ((1.2::FLOAT)
                 * ((0.25::FLOAT)
                    + (((0.75::FLOAT) * ({dl}::FLOAT))
                       / (({sum_ttf}::DOUBLE / {n}::DOUBLE)::FLOAT)))))))
         ::FLOAT)::DOUBLE"""
    ).fetchone()[0]
    assert _bits(np.float32(got)) == _bits(want), (freq, dl, df, n, sum_ttf)
