"""timeAllowed (operators/timeallowed.py) — budgeted collect: in-budget
queries complete untouched, expired budgets cancel the job group and
flag partialResults, real failures propagate."""

from __future__ import annotations

import time

import pytest
from pyspark.sql import functions as F

from lucene_solr_spark.operators.timeallowed import collect_time_allowed


def _slow_df(spark, per_partition_secs: float, parts: int = 4):
    def sleepy(it):
        time.sleep(per_partition_secs)
        yield from it

    rdd = spark.sparkContext.parallelize(range(40), parts).mapPartitions(sleepy)
    return spark.createDataFrame(rdd.map(lambda i: (i,)), "v long")


def test_within_budget_completes(spark):
    df = spark.range(1000).select(F.col("id").alias("v"))
    rows, partial = collect_time_allowed(spark, df, time_allowed_ms=60_000)
    assert not partial and len(rows) == 1000


def test_expired_budget_flags_partial(spark):
    rows, partial = collect_time_allowed(
        spark, _slow_df(spark, per_partition_secs=8.0), time_allowed_ms=300
    )
    assert partial and rows == []


def test_real_failure_propagates(spark):
    df = spark.range(10).select((F.lit(1) / F.col("id")).alias("v"))
    bad = spark.createDataFrame([("x",)], "s string").select(
        F.col("s").cast("int").alias("v")
    )
    # an ANSI cast failure inside the budget must raise, not be reported
    # as a timeout
    spark.conf.set("spark.sql.ansi.enabled", "true")
    try:
        with pytest.raises(Exception):
            collect_time_allowed(spark, bad, time_allowed_ms=60_000)
    finally:
        spark.conf.set("spark.sql.ansi.enabled", "false")


def test_searcher_still_usable_after_cancel(spark):
    """Cancelling the budgeted group must not poison later queries in the
    same session (job-group isolation)."""
    _rows, partial = collect_time_allowed(
        spark, _slow_df(spark, per_partition_secs=8.0), time_allowed_ms=300
    )
    assert partial
    ok = spark.range(100).count()
    assert ok == 100
