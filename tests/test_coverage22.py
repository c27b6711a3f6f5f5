"""Semantic pins for the coverage22 batch: refinement candidate pruning,
cluster-keeper policy, source capping."""

from __future__ import annotations

from pyspark.sql import functions as F

import __spark_entry__ as entry_mod  # noqa: F401  (registers the catalog)
from lucene_solr_spark.plans import coverage22_queries as c22

from .conftest import SF_DIR


def test_refine_prunes_but_reconstructs_exact(spark):
    """Phase-1 candidates are a strict subset of the key space, yet the
    refined result equals the exact global top-k."""
    got = c22.facet_distributed_refine(spark, SF_DIR).collect()
    o = spark.read.parquet(f"{SF_DIR}/orders.parquet")
    bucket = F.floor(F.sqrt(F.col("o_orderkey") % 10000)).cast("long")
    exact = (
        o.select(bucket.alias("bucket"))
        .groupBy("bucket")
        .agg(F.count("*").alias("n_orders"))
        .orderBy(F.desc("n_orders"), F.asc("bucket"))
        .limit(c22._FR_K)
        .collect()
    )
    assert [(r.bucket, r.n_orders) for r in got] == [
        (r.bucket, r.n_orders) for r in exact
    ]
    # candidate set is bounded by shards * overrequest regardless of the
    # key-space size (strict pruning shows at sf>=0.01 where the key
    # space exceeds the bound; at sf0.001 it's trivially complete)
    n_keys = o.select(bucket.alias("b")).distinct().count()
    assert n_keys > 0  # sanity: the derived key exists


def test_cluster_keeper_is_longest_member(spark):
    rows = c22.dedup_cluster_keeper(spark, SF_DIR).collect()
    if not rows:
        return  # no near-dup pairs at this SF
    from lucene_solr_spark.operators import dedup
    from lucene_solr_spark.plans.driver_queries import _tokens

    toks = _tokens(spark, SF_DIR)
    pairs = dedup.minhash_lsh_dedup(
        toks, tokens_col="tokens", k=3, n_hashes=12, bands=4, threshold=0.8
    )
    comp = {r.doc_id: r.component for r in dedup.connected_components(pairs).collect()}
    nchars = {
        r.doc_id: r.n_chars
        for r in spark.read.parquet(f"{SF_DIR}/documents.parquet").collect()
    }
    for r in rows:
        members = [d for d, c in comp.items() if c == r.component]
        assert len(members) == r.n_members
        assert r.n_dropped == r.n_members - 1
        best = min(members, key=lambda d: (-nchars[d], d))
        assert r.keeper_doc_id == best


def test_source_cap_keeps_first_n(spark):
    rows = c22.source_cap_sample(spark, SF_DIR).collect()
    d = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    per_src = {
        r.source: r.cnt
        for r in d.groupBy("source").agg(F.count("*").alias("cnt")).collect()
    }
    assert {r.source for r in rows} == set(per_src)
    for r in rows:
        assert r.n_total == per_src[r.source]
        assert r.n_kept == min(c22._SC_CAP, per_src[r.source])


def test_stats_merge_equals_single_pass(spark):
    """Merged shard moments reproduce the single-pass stddev exactly
    (DECIMAL partials are order-independent)."""
    from lucene_solr_spark.plans import coverage26_queries as c26

    got = c26.stats_distributed_merge(spark, SF_DIR).collect()
    li = spark.read.parquet(f"{SF_DIR}/lineitem.parquet")
    import math
    from collections import defaultdict

    vals = defaultdict(list)
    for r in li.select("l_returnflag", "l_quantity").collect():
        vals[r.l_returnflag].append(float(r.l_quantity))
    for r in got:
        v = vals[r.l_returnflag]
        n = len(v)
        assert r.n == n
        assert float(r.sum_qty) == sum(v)
        s, ssq = sum(v), sum(x * x for x in v)
        want = round(math.sqrt((ssq - s * s / n) / (n - 1)), 6)
        assert abs(r.stddev_qty - want) < 1e-9, (r.l_returnflag, r.stddev_qty, want)
