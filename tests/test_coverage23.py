"""Semantic pins for the coverage23 batch: two-phase grouping equals
exact, reverse suffix emission, type-filter drop accounting."""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

import __spark_entry__ as entry_mod  # noqa: F401  (registers the catalog)
from lucene_solr_spark.plans import coverage23_queries as c23

from .conftest import SF_DIR


def test_twophase_grouping_equals_exact(spark):
    got = c23.group_distributed_twophase(spark, SF_DIR).collect()
    o = spark.read.parquet(f"{SF_DIR}/orders.parquet")
    b = o.select(
        F.floor(F.sqrt(F.col("o_orderkey") % 10000)).cast("long").alias("grp"),
        "o_orderkey",
        "o_totalprice",
    )
    heads = b.groupBy("grp").agg(F.max("o_totalprice").alias("head"))
    topg = heads.orderBy(F.desc("head"), F.asc("grp")).limit(c23._G2_GROUPS)
    w = Window.partitionBy("grp").orderBy(
        F.desc("o_totalprice"), F.asc("o_orderkey")
    )
    exact = (
        b.join(topg, "grp")
        .withColumn("doc_rank", F.row_number().over(w))
        .where(F.col("doc_rank") <= c23._G2_DOCS)
        .orderBy(F.desc("head"), F.asc("grp"), F.asc("doc_rank"))
        .select("grp", "o_orderkey", "o_totalprice", "doc_rank")
        .collect()
    )
    assert [tuple(r) for r in got] == [tuple(r) for r in exact]
    assert len(got) == c23._G2_GROUPS * c23._G2_DOCS
    # each selected group contributes exactly _G2_DOCS docs, rank 1..n
    for g in {r.grp for r in got}:
        ranks = [r.doc_rank for r in got if r.grp == g]
        assert sorted(ranks) == list(range(1, c23._G2_DOCS + 1))


def test_reverse_suffixes_nest(spark):
    rows = c23.reverse_path_hierarchy(spark, SF_DIR).collect()
    n_docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").count()
    by_tok = {r.path_suffix: r.cnt for r in rows}
    # the 4 bare bucket suffixes together cover every doc once
    bares = {t: c for t, c in by_tok.items() if "/" not in t}
    assert set(bares) <= {"b0", "b1", "b2", "b3"}
    if len(bares) == 4:
        assert sum(bares.values()) == n_docs
    # a two-level suffix never outcounts its own bucket suffix
    for t, c in by_tok.items():
        parts = t.split("/")
        if len(parts) == 2 and parts[1] in by_tok:
            assert c <= by_tok[parts[1]]


def test_type_filter_drops_numeric(spark):
    rows = {r.tok_type: r for r in c23.type_token_filter(spark, SF_DIR).collect()}
    n_cust = spark.read.parquet(f"{SF_DIR}/customer.parquet").count()
    # 'Customer#NNNNNNNNN' -> exactly one alpha + one numeric per row
    assert rows["<ALPHANUM>"].n_tokens == n_cust
    assert rows["<NUM>"].n_tokens == n_cust
    assert rows["<ALPHANUM>"].n_kept == n_cust  # alpha survives
    assert rows["<NUM>"].n_kept == 0  # stop-type dropped
