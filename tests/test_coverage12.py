"""Semantic pins for the coverage12 batch (cross-engine parity lives in the
driver-contract mirror; these pin what parity alone wouldn't catch): the
enum ordinal actually reorders vs lexicographic, the currency filter is
applied in the QUERY currency, sampling scales by the exact inverse rate,
and the date-gap facet emits the full calendar spine with a broadcast
spine join."""

from __future__ import annotations

from pyspark.sql import functions as F

import __spark_entry__ as entry_mod  # noqa: F401  (registers the catalog)
from lucene_solr_spark.plans import coverage12_queries as c12

from .conftest import SF_DIR


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_enum_sort_differs_from_lexicographic(spark):
    rows = c12.enum_field_sort(spark, SF_DIR).collect()
    labels = [r.label for r in rows]
    # configured severity order, which is NOT the lexicographic order
    assert labels == [v for v in c12._ENUM_CONFIG if v in set(labels)]
    assert labels != sorted(labels)
    assert [r.ordinal for r in rows] == sorted(r.ordinal for r in rows)


def test_currency_filter_is_in_query_currency(spark):
    """A GBP order whose raw price is below the bound must match when its
    CONVERTED value crosses it — the filter runs after conversion."""
    rows = c12.currency_range_query(spark, SF_DIR).collect()
    assert {r.currency for r in rows} <= {"USD", "EUR", "GBP"}
    o = spark.read.parquet(f"{SF_DIR}/orders.parquet")
    gbp_border = o.filter(
        (F.col("o_orderkey") % 3 == 2)
        & (F.col("o_totalprice") < c12._CUR_LO)
        & (F.col("o_totalprice") * c12._RATES["GBP"] >= c12._CUR_LO)
        & (F.col("o_totalprice") * c12._RATES["GBP"] <= c12._CUR_HI)
    ).count()
    if gbp_border:  # sf-dependent, but when present it must be counted
        gbp_total = next((r.n_orders for r in rows if r.currency == "GBP"), 0)
        raw_in_range = o.filter(
            (F.col("o_orderkey") % 3 == 2)
            & (F.col("o_totalprice") >= c12._CUR_LO)
            & (F.col("o_totalprice") <= c12._CUR_HI)
        ).count()
        assert gbp_total != raw_in_range


def test_sampled_counts_exact_inverse_scale(spark):
    rows = c12.sampled_facet_counts(spark, SF_DIR).collect()
    assert rows, "sample must be non-empty at sf0.001"
    for r in rows:
        assert r.n_est == r.n_sampled * c12._SAMPLE_RATE


def test_date_gap_full_spine_and_broadcast(spark):
    df = c12.facet_range_date_gap(spark, SF_DIR)
    rows = df.collect()
    assert [r.bucket for r in rows] == [f"1996-{m:02d}" for m in range(1, 13)]
    assert all(r.n_orders >= 0 for r in rows)
    plan = _plan(df)
    assert "BroadcastHashJoin" in plan or "BroadcastNestedLoopJoin" in plan


def test_word_delimiter_pinned_example(spark):
    from lucene_solr_spark.functions.analysis import (
        word_delimiter_catenate_col,
        word_delimiter_parts_col,
    )

    df = spark.createDataFrame([("PowerShot500-XTi v2.0",)], "s string").select(
        word_delimiter_parts_col("s").alias("parts"),
        word_delimiter_catenate_col("s").alias("cat"),
    )
    r = df.collect()[0]
    assert r.parts == ["power", "shot", "500", "x", "ti", "v", "2", "0"]
    assert r.cat == "powershot500xtiv20"
    # whole chain stays JVM-side: no Python eval node in the plan
    plan = _plan(df)
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_word_delimiter_sql_mirror_matches():
    """The DuckDB rendering of the SAME rule table splits identically."""
    import duckdb

    from lucene_solr_spark.functions.analysis import (
        word_delimiter_catenate_sql,
        word_delimiter_parts_sql,
    )

    con = duckdb.connect()
    parts, cat = con.execute(
        f"SELECT {word_delimiter_parts_sql(chr(39) + 'PowerShot500-XTi v2.0' + chr(39))},"
        f" {word_delimiter_catenate_sql(chr(39) + 'PowerShot500-XTi v2.0' + chr(39))}"
    ).fetchone()
    assert parts == ["power", "shot", "500", "x", "ti", "v", "2", "0"]
    assert cat == "powershot500xtiv20"


def test_interval_wildcard_expansion_and_cap(spark):
    from lucene_solr_spark.plans import coverage12_queries as c

    rows = c.interval_wildcard_count(spark, SF_DIR).collect()
    assert rows and all(r.n_intervals >= 1 for r in rows)
    # the pattern must have expanded to the documented term set
    import re

    rx = re.compile(
        "^" + re.escape(c._IV_WILD).replace(r"\*", ".*").replace(r"\?", ".") + "$"
    )
    vocab = ["scan", "small", "spark", "stream", "slow", "sort", "batch"]
    assert [t for t in vocab if rx.match(t)] == ["scan", "small", "spark", "stream"]
    # cap refusal path
    old = c._IV_WILD_CAP
    try:
        c._IV_WILD_CAP = 1
        import pytest as _pt

        with _pt.raises(ValueError, match="refuses"):
            c.interval_wildcard_count(spark, SF_DIR)
    finally:
        c._IV_WILD_CAP = old


def test_parallel_rollup_open_group_spans_batches(spark):
    """A key group split across Arrow batch boundaries must be merged by
    the carried open-group state, not emitted twice."""
    import pandas as pd

    from lucene_solr_spark.streaming.parallel import parallel_rollup

    df = spark.createDataFrame(
        [(1, 10.0), (1, 20.0), (2, 5.0)], "k long, v double"
    )
    rolled = {r.k: (r.n, r.sum_v) for r in parallel_rollup(df, "k", ["v"], 2).collect()}
    assert rolled == {1: (2, 30.0), 2: (1, 5.0)}
    # kernel-level: drive the generator with the group split across batches
    import lucene_solr_spark.streaming.parallel as par

    captured = {}

    def fake_map_in_pandas(fn, schema):
        b1 = pd.DataFrame({"k": [1, 1], "v": [10.0, 20.0]})
        b2 = pd.DataFrame({"k": [1, 2], "v": [5.0, 7.0]})
        captured["out"] = pd.concat(list(fn(iter([b1, b2])))).reset_index(drop=True)
        return None

    class FakeRouted:
        def mapInPandas(self, fn, schema):
            return fake_map_in_pandas(fn, schema)

    class FakeDF:
        schema = df.schema

        def select(self, *a):
            return self

        def repartition(self, *a):
            return self

        def sortWithinPartitions(self, *a):
            return FakeRouted()

    par.parallel_rollup(FakeDF(), "k", ["v"], 2)
    out = captured["out"]
    got = {int(r.k): (int(r.n), float(r.sum_v)) for r in out.itertuples()}
    assert got == {1: (3, 35.0), 2: (1, 7.0)}


def test_parallel_rollup_single_exchange_plan(spark):
    from lucene_solr_spark.plans import coverage12_queries as c

    df = c.parallel_stream_rollup(spark, SF_DIR)
    plan = _plan(df)
    assert plan.count("Exchange") == 1  # the hash route, nothing else
    assert "MapInPandas" in plan and "TakeOrderedAndProject" in plan
    # parity with the plain grouped agg
    li = spark.read.parquet(f"{SF_DIR}/lineitem.parquet")
    exp = {
        (r.l_suppkey, r.n)
        for r in li.groupBy("l_suppkey").agg(F.count("*").alias("n")).collect()
    }
    got = {
        (r.l_suppkey, r.n)
        for r in __import__(
            "lucene_solr_spark.streaming.parallel", fromlist=["parallel_rollup"]
        ).parallel_rollup(li, "l_suppkey", [], 4).collect()
    }
    assert got == exp


_CV2_VECTORS = {
    # published vectors from the Caverphone 2.0 paper / commons-codec tests
    "Stevenson": "STFNSN1111",
    "Peter": "PTA1111111",
}


def test_caverphone2_published_vectors():
    from lucene_solr_spark.functions.phonetic import caverphone2_py

    for w, code in _CV2_VECTORS.items():
        assert caverphone2_py(w) == code, w


def test_caverphone2_three_way_parity(spark):
    """Python / Spark / DuckDB renderings of the SAME rule table agree on
    a mixed word list (including the paper's trigger prefixes/suffixes)."""
    import duckdb

    from lucene_solr_spark.functions.phonetic import (
        caverphone2_col,
        caverphone2_py,
        caverphone2_sql,
    )

    words = [
        "Stevenson", "Peter", "Thompson", "enough", "trough", "cough",
        "gnome", "lamb", "batch", "vision", "yellow", "whisky", "wright",
        "hello", "mirror", "williams", "jackson", "xavier", "quick",
        "edge", "nation", "martia", "shash", "buzz", "aeiou",
    ]
    py = {w: caverphone2_py(w) for w in words}
    sp = {
        r.w: r.code
        for r in spark.createDataFrame([(w,) for w in words], "w string")
        .select("w", caverphone2_col("w").alias("code"))
        .collect()
    }
    con = duckdb.connect()
    vals = ", ".join(f"('{w}')" for w in words)
    dk = dict(
        con.execute(
            f"SELECT w, {caverphone2_sql('w')} FROM (VALUES {vals}) v(w)"
        ).fetchall()
    )
    assert sp == py and dk == py
    assert all(len(c) == 10 for c in py.values())


def test_parallel_rollup_keeps_null_key_group(spark):
    """Null rollup keys must form their own group (Spark groupBy
    semantics), not be silently dropped by pandas' dropna default, and
    must not break the one-open-group carry (Spark sorted them FIRST in
    the partition while pandas would have sorted NaN last)."""
    from lucene_solr_spark.streaming.parallel import parallel_rollup

    rows = [(None, 1.0), ("a", 2.0), (None, 3.0), ("b", 4.0), ("a", 5.0)]
    df = spark.createDataFrame(rows, "k string, v double")
    got = {r.k: (r.n, r.sum_v) for r in parallel_rollup(df, "k", ["v"], 2).collect()}
    want = {
        r["k"]: (r["n"], r["s"])
        for r in df.groupBy("k")
        .agg(F.count("*").alias("n"), F.sum("v").alias("s"))
        .collect()
    }
    assert got == want and None in got
