"""Semantic pins for the coverage20 batch: RRF fusion arithmetic, byte
dot-product exactness, select-evaluator projection, priority drain order."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

import __spark_entry__ as entry_mod  # noqa: F401  (registers the catalog)
from lucene_solr_spark.plans import coverage20_queries as c20

from .conftest import SF_DIR


def test_rrf_scores_are_reciprocal_rank_sums(spark):
    """Every fused score is 1/(60+r_bm25) + 1/(60+r_vec) with ranks
    recomputed independently from the two branch top-k lists."""
    from lucene_solr_spark.operators import ann
    from lucene_solr_spark.plans.solr_queries import _engine_searcher

    s = _engine_searcher(spark, SF_DIR)
    bm = s.topk(" ".join(c20._RRF_TERMS), k=c20._RRF_DEPTH, mode="wand").collect()
    bm_rank = {r.doc_id: i + 1 for i, r in enumerate(bm)}
    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    probe = [float(x) for x in emb.filter("vec_id = 0").collect()[0]["embedding"]]
    ve = ann.cosine_topk(emb, probe, k=c20._RRF_DEPTH).collect()
    ve_rank = {r.vec_id: i + 1 for i, r in enumerate(ve)}

    got = c20.hybrid_rrf_fusion(spark, SF_DIR).collect()
    assert len(got) == 10
    for r in got:
        want = 0.0
        if r.doc_id in bm_rank:
            want += 1.0 / (c20._RRF_C + bm_rank[r.doc_id])
        if r.doc_id in ve_rank:
            want += 1.0 / (c20._RRF_C + ve_rank[r.doc_id])
        assert want > 0.0  # every fused doc came from a branch
        assert r.rrf_score == round(want, 6), (r.doc_id, r.rrf_score, want)
    # descending fused order
    scores = [r.rrf_score for r in got]
    assert scores == sorted(scores, reverse=True)


def test_byte_dot_integer_exact(spark):
    """Engine scores match a pure-Python int recomputation EXACTLY (the
    whole point of the byte path: integer dot, no float tolerance)."""
    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    vecs = {
        r.vec_id: [float(x) for x in r.embedding]
        for r in emb.collect()
    }
    q = {vid: c20._quantize_byte(v) for vid, v in vecs.items()}
    assert all(-128 <= x <= 127 for v in q.values() for x in v)
    p = q[0]
    denom = float(c20._BYTE_DIMS * (1 << 15))
    want = {
        vid: round(0.5 + sum(a * b for a, b in zip(v, p)) / denom, 6)
        for vid, v in q.items()
    }
    got = c20.vector_byte_dot_topk(spark, SF_DIR).collect()
    for r in got:
        assert r.dot_score == want[r.vec_id], (r.vec_id, r.dot_score)
    # the exact global top-10 by (score desc, vec_id asc)
    ranked = sorted(want.items(), key=lambda kv: (-kv[1], kv[0]))[:10]
    assert [(r.vec_id, r.dot_score) for r in got] == ranked


def test_select_stream_evaluators(spark):
    rows = c20.select_stream_replace(spark, SF_DIR).collect()
    o = {
        r.o_orderkey: r.o_totalprice
        for r in spark.read.parquet(f"{SF_DIR}/orders.parquet")
        .orderBy("o_orderkey")
        .limit(20)
        .collect()
    }
    assert len(rows) == 20
    for r in rows:
        assert r.double_price == o[r.id] * 2  # mult() exact on doubles
        assert r.size_class == ("big" if o[r.id] > 200000 else "small")


def test_priority_stream_drains_high_first(spark):
    rows = c20.priority_stream(spark, SF_DIR).collect()
    assert [r.drain_order for r in rows] == [0] * 10 + [1] * 10
    assert {r.pri for r in rows[:10]} == {"1-URGENT"}
    assert {r.pri for r in rows[10:]} == {"5-LOW"}
    # within each branch: stream order (o_orderkey asc)
    for half in (rows[:10], rows[10:]):
        keys = [r.o_orderkey for r in half]
        assert keys == sorted(keys)


def test_quantizer_clamps_and_floors():
    assert c20._quantize_byte([1.5, -2.0, 0.004, -0.004]) == [127, -128, 0, -1]
    assert c20._quantize_byte([1.0, -1.0]) == [127, -127]
    assert math.floor(0.999 * 127.0) == 126  # floor, not round
