"""Durable bucketed layout (sources/bucketed.py) — DocRouter analog:
same-bucketed joins must plan WITHOUT an Exchange on either side."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from lucene_solr_spark.sources import bucketed

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def tables(spark):
    cust = spark.read.parquet(f"{SF_DIR}/customer.parquet")
    orders = spark.read.parquet(f"{SF_DIR}/orders.parquet")
    bucketed.write_bucketed(cust, "t_cust_b", "c_custkey", 8)
    bucketed.write_bucketed(
        orders.withColumnRenamed("o_custkey", "c_custkey"),
        "t_orders_b", "c_custkey", 8,
    )
    yield "t_cust_b", "t_orders_b"
    spark.sql("DROP TABLE IF EXISTS t_cust_b")
    spark.sql("DROP TABLE IF EXISTS t_orders_b")


def test_cohash_join_no_exchange(spark, tables):
    lt, rt = tables
    out = bucketed.cohash_join(spark, lt, rt, "c_custkey")
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "SortMergeJoin" in plan
    assert "Exchange" not in plan, plan  # the whole point of the layout
    # correctness: equals the plain (shuffled) join row count
    plain = (
        spark.read.parquet(f"{SF_DIR}/customer.parquet")
        .join(
            spark.read.parquet(f"{SF_DIR}/orders.parquet").withColumnRenamed(
                "o_custkey", "c_custkey"
            ),
            "c_custkey",
        )
        .count()
    )
    assert out.count() == plain


def test_bucketed_roundtrip_values(spark, tables):
    lt, _ = tables
    got = {
        int(r["c_custkey"])
        for r in bucketed.read_bucketed(spark, lt).select("c_custkey").collect()
    }
    want = {
        int(r["c_custkey"])
        for r in spark.read.parquet(f"{SF_DIR}/customer.parquet")
        .select("c_custkey")
        .collect()
    }
    assert got == want
