"""Round-5 widening batch #11: hybrid BM25+vector rank fusion, byte-vector
dot-product KNN, and the select/priority streaming-expression decorators.

Each entry re-expresses a reference component (public lucene-solr
path#symbol cited per entry; the reference mount is empty) over the driver
testdata with a DuckDB oracle using identical column aliases.
"""

from __future__ import annotations

import math

from pyspark.sql import Window
from pyspark.sql import functions as F

from ..operators import ann
from .coverage3_queries import _f32_bm25_ctes
from .dataops_queries import _duck_cos
from .driver_queries import _read, register

# ---------------------------------------------------------------------------
# Hybrid rank fusion (RRF) — the two-retriever pattern the reference
# serves with TopDocs#merge (lucene/core/.../search/TopDocs.java#merge,
# Solr's distributed two-phase merge) applied across HETEROGENEOUS
# scorers: a lexical BM25 top-k (the real WAND engine) and a KNN vector
# top-k (KnnFloatVectorQuery's brute-force baseline), fused with
# reciprocal-rank fusion score = sum 1/(60+rank) (Cormack & Clarke,
# SIGIR'09 — the standard fusion for BM25+vector hybrid retrieval).
# ENGINE-PATH: the lexical ranks come from Searcher.topk(mode="wand") on
# packed posting blocks; the oracle re-derives them float32-exactly via
# the shared binary32 BM25 CTEs. Both branches are k-bounded (k=20), so
# rank assignment and the fusion join are k-sized no matter the corpus —
# the 100 TB shape is two TakeOrderedAndProject heads + a tiny join.
# ---------------------------------------------------------------------------

_RRF_TERMS = ["batch", "order", "stream"]
_RRF_DEPTH = 20
_RRF_C = 60


@register(
    "hybrid_rrf_fusion",
    f"""WITH {_f32_bm25_ctes(_RRF_TERMS)},
bm AS (SELECT doc_id, row_number() OVER (ORDER BY score_f DESC, doc_id ASC) AS r
       FROM scored QUALIFY r <= {_RRF_DEPTH}),
probe AS (SELECT embedding::DOUBLE[] AS p FROM embeddings WHERE vec_id = 0),
ve0 AS (SELECT vec_id, round({_duck_cos('embedding::DOUBLE[]', 'p')}, 6) AS c
        FROM embeddings, probe),
ve AS (SELECT vec_id, row_number() OVER (ORDER BY c DESC, vec_id ASC) AS r
       FROM ve0 QUALIFY r <= {_RRF_DEPTH}),
f AS (SELECT coalesce(bm.doc_id, ve.vec_id) AS doc_id,
             coalesce(1.0 / ({_RRF_C} + bm.r), 0.0)
               + coalesce(1.0 / ({_RRF_C} + ve.r), 0.0) AS rrf
      FROM bm FULL JOIN ve ON bm.doc_id = ve.vec_id)
SELECT doc_id, round(rrf, 6) AS rrf_score
FROM f ORDER BY rrf DESC, doc_id ASC LIMIT 10""",
)
def hybrid_rrf_fusion(spark, sf_dir):
    """RRF(60) over WAND BM25 top-20 and cosine KNN top-20: fused top-10."""
    from .solr_queries import _engine_searcher

    s = _engine_searcher(spark, sf_dir)
    bm = s.topk(" ".join(_RRF_TERMS), k=_RRF_DEPTH, mode="wand")
    wb = Window.orderBy(F.desc("score"), F.asc("doc_id"))
    bm = bm.select("doc_id", F.row_number().over(wb).alias("rb"))

    emb = _read(spark, sf_dir, "embeddings")
    probe = [float(x) for x in emb.filter("vec_id = 0").collect()[0]["embedding"]]
    ve = ann.cosine_topk(emb, probe, k=_RRF_DEPTH)
    wv = Window.orderBy(F.desc("cos_sim"), F.asc("vec_id"))
    ve = ve.select(F.col("vec_id"), F.row_number().over(wv).alias("rv"))

    fused = bm.join(ve, bm["doc_id"] == ve["vec_id"], "full_outer").select(
        F.coalesce(bm["doc_id"], ve["vec_id"]).alias("doc_id"),
        (
            F.coalesce(F.lit(1.0) / (F.lit(_RRF_C) + F.col("rb")), F.lit(0.0))
            + F.coalesce(F.lit(1.0) / (F.lit(_RRF_C) + F.col("rv")), F.lit(0.0))
        ).alias("rrf"),
    )
    return (
        fused.orderBy(F.desc("rrf"), F.asc("doc_id"))
        .limit(10)
        .select("doc_id", F.round("rrf", 6).alias("rrf_score"))
    )


# ---------------------------------------------------------------------------
# KnnByteVectorQuery — lucene/core/.../search/KnnByteVectorQuery.java over
# index/VectorSimilarityFunction.java#DOT_PRODUCT's byte branch (score =
# 0.5 + dot / (dims * 2^15)): the int8-quantized vector path
# (ByteVectorValues / the scalar-quantized codec's query side). Vectors
# are quantized with the deterministic floor(x*127) clamp [-128,127] —
# floor instead of the codec's round-half to keep the quantizer
# bit-identical across engines; the dot product is then pure integer
# arithmetic, so scores are exact (no float tolerance at all).
# ---------------------------------------------------------------------------

_BYTE_DIMS = 64


def _quantize_byte(vec: list[float]) -> list[int]:
    return [max(-128, min(127, math.floor(float(x) * 127.0))) for x in vec]


@register(
    "vector_byte_dot_topk",
    f"""WITH q AS (SELECT vec_id,
        {ann.DUCK_BYTE_QUANT.format(e='embedding')} AS qv
      FROM embeddings),
probe AS (SELECT qv AS p FROM q WHERE vec_id = 0)
SELECT vec_id,
       round(0.5 + list_dot_product(qv, p) / {_BYTE_DIMS * (1 << 15)}.0, 6)
         AS dot_score
FROM q, probe ORDER BY dot_score DESC, vec_id ASC LIMIT 10""",
)
def vector_byte_dot_topk(spark, sf_dir):
    """KnnByteVectorQuery(DOT_PRODUCT) top-10 over floor-quantized int8
    vectors: integer dot, exact scores."""
    emb = _read(spark, sf_dir, "embeddings")
    raw = [float(x) for x in emb.filter("vec_id = 0").collect()[0]["embedding"]]
    pq = _quantize_byte(raw)
    p = F.array(*[F.lit(int(x)).cast("long") for x in pq])
    dot = ann.long_dot_expr(ann.byte_quantize_expr(F.col("embedding")), p)
    denom = float(_BYTE_DIMS * (1 << 15))
    return (
        emb.select(
            "vec_id",
            F.round(F.lit(0.5) + dot / F.lit(denom), 6).alias("dot_score"),
        )
        .orderBy(F.desc("dot_score"), F.asc("vec_id"))
        .limit(10)
    )


# ---------------------------------------------------------------------------
# SelectStream + evaluators — solrj/io/stream/SelectStream.java with
# eval/MultiplyEvaluator and eval/IfThenElseEvaluator/GreaterThanEvaluator:
# the streaming-expression field projection/rename/compute decorator
# `select(search(...), "o_orderkey as id, mult(o_totalprice,2) as
# double_price, if(gt(o_totalprice,200000), big, small) as size_class)`.
# Pure per-row codegen over the inner stream — the decorator adds no
# exchange at any scale.
# ---------------------------------------------------------------------------


@register(
    "select_stream_replace",
    """SELECT o_orderkey AS id, o_totalprice * 2 AS double_price,
       CASE WHEN o_totalprice > 200000 THEN 'big' ELSE 'small' END AS size_class
FROM orders ORDER BY o_orderkey ASC LIMIT 20""",
)
def select_stream_replace(spark, sf_dir):
    """select(): rename + mult() + if(gt()) evaluators over the sorted
    inner stream, first 20 tuples."""
    o = _read(spark, sf_dir, "orders")
    return (
        o.select(
            F.col("o_orderkey").alias("id"),
            (F.col("o_totalprice") * 2).alias("double_price"),
            F.when(F.col("o_totalprice") > 200000, F.lit("big"))
            .otherwise(F.lit("small"))
            .alias("size_class"),
        )
        .orderBy(F.asc("id"))
        .limit(20)
    )


# ---------------------------------------------------------------------------
# PriorityStream — solrj/io/stream/PriorityStream.java (the executor's
# scheduler decorator): drain EVERY tuple of the high-priority stream
# before any tuple of the low-priority stream. Modeled exactly: the output
# is ordered (drain_order, stream order) with high=0 first; each branch
# here is a k-bounded sorted head so the row pins the cross-branch drain
# order itself.
# ---------------------------------------------------------------------------


@register(
    "priority_stream",
    """WITH hi AS (SELECT 0 AS drain_order, o_orderkey, o_orderpriority AS pri
      FROM orders WHERE o_orderpriority = '1-URGENT'
      ORDER BY o_orderkey ASC LIMIT 10),
lo AS (SELECT 1 AS drain_order, o_orderkey, o_orderpriority AS pri
      FROM orders WHERE o_orderpriority = '5-LOW'
      ORDER BY o_orderkey ASC LIMIT 10)
SELECT drain_order, o_orderkey, pri FROM (FROM hi UNION ALL FROM lo)
ORDER BY drain_order ASC, o_orderkey ASC""",
)
def priority_stream(spark, sf_dir):
    """priority(topic(high), topic(low)): high tuples drain first."""
    o = _read(spark, sf_dir, "orders")

    def head(pri: str, order: int):
        return (
            o.where(F.col("o_orderpriority") == pri)
            .orderBy(F.asc("o_orderkey"))
            .limit(10)
            .select(
                F.lit(order).alias("drain_order"),
                "o_orderkey",
                F.col("o_orderpriority").alias("pri"),
            )
        )

    return (
        head("1-URGENT", 0)
        .unionByName(head("5-LOW", 1))
        .orderBy(F.asc("drain_order"), F.asc("o_orderkey"))
    )
