"""Semantic pins for the coverage21 batch: quantization recall overlap,
pure-negative complement, router colocation, parent diversification,
nested query() boost arithmetic."""

from __future__ import annotations

from pyspark.sql import functions as F

import __spark_entry__ as entry_mod  # noqa: F401  (registers the catalog)
from lucene_solr_spark.plans import coverage21_queries as c21

from .conftest import SF_DIR


def test_quantized_recall_is_exact_overlap(spark):
    row = c21.vector_quantized_recall(spark, SF_DIR).collect()[0]
    assert 0 <= row.n_overlap <= c21._QR_K
    assert row.recall_at_10 == round(row.n_overlap / c21._QR_K, 6)
    # recompute the overlap from the two independent rankings
    from lucene_solr_spark.operators import ann
    from lucene_solr_spark.plans.coverage20_queries import _quantize_byte

    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    raw = [float(x) for x in emb.filter("vec_id = 0").collect()[0]["embedding"]]
    full = {r.vec_id for r in ann.cosine_topk(emb, raw, k=c21._QR_K).collect()}
    p = _quantize_byte(raw)
    dots = {
        r.vec_id: sum(a * b for a, b in zip(_quantize_byte([float(x) for x in r.embedding]), p))
        for r in emb.collect()
    }
    quant = {
        vid
        for vid, _ in sorted(dots.items(), key=lambda kv: (-kv[1], kv[0]))[
            : c21._QR_K
        ]
    }
    assert row.n_overlap == len(full & quant)


def test_pure_negative_is_complement(spark):
    from lucene_solr_spark.plans.solr_queries import _engine_searcher

    neg = c21.pure_negative_query(spark, SF_DIR).collect()
    s = _engine_searcher(spark, SF_DIR)
    n_match = s.match_docs(c21._PN_TERM).count()
    n_total = spark.read.parquet(f"{SF_DIR}/documents.parquet").count()
    assert sum(r.n_docs for r in neg) == n_total - n_match
    assert n_match > 0  # the term matches something, so this is a real anti-set


def test_composite_router_colocates_prefixes(spark):
    rows = c21.composite_id_routing(spark, SF_DIR).collect()
    langs = [r.lang for r in rows]
    assert len(langs) == len(set(langs))  # each prefix under exactly one shard
    assert all(0 <= r.shard < c21._CIR_SHARDS for r in rows)
    n_total = spark.read.parquet(f"{SF_DIR}/documents.parquet").count()
    assert sum(r.n_docs for r in rows) == n_total


def test_parent_block_knn_diversifies(spark):
    rows = c21.parent_block_knn(spark, SF_DIR).collect()
    parents = [r.parent_id for r in rows]
    assert len(parents) == len(set(parents)) == 5  # one child per parent
    assert all(
        r.child_vec_id // c21._PB_BLOCK == r.parent_id for r in rows
    )
    scores = [r.cos_sim for r in rows]
    assert scores == sorted(scores, reverse=True)
    # the probe's own parent block wins with the probe itself
    assert rows[0].child_vec_id == 0 and rows[0].cos_sim == 1.0


def test_nested_query_boost_arithmetic(spark):
    from lucene_solr_spark.plans.solr_queries import _engine_searcher

    got = c21.function_query_nested_score(spark, SF_DIR).collect()
    s = _engine_searcher(spark, SF_DIR)
    scores = {
        r.doc_id: r.score
        for r in s.topk(" ".join(c21._QVS_TERMS), k=1000, mode="wand").collect()
    }
    nchars = {
        r.doc_id: r.n_chars
        for r in spark.read.parquet(f"{SF_DIR}/documents.parquet").collect()
    }
    for r in got:
        want = round(float(scores[r.doc_id]) * (nchars[r.doc_id] / 1000.0), 4)
        assert r.boosted == want, (r.doc_id, r.boosted, want)
    vals = [r.boosted for r in got]
    assert vals == sorted(vals, reverse=True)
