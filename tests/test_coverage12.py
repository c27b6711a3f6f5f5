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
