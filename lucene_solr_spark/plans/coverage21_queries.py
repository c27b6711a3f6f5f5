"""Round-5 widening batch #12: quantization recall gate, Solr's
pure-negative query rewrite, CompositeIdRouter colocation, diversifying
parent-block KNN, and the nested query() function query.

Each entry re-expresses a reference component (public lucene-solr
path#symbol cited per entry; the reference mount is empty) over the driver
testdata with a DuckDB oracle using identical column aliases.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from ..operators import ann
from ..operators.dedup import DUCK_H60, h60
from .coverage3_queries import _f32_bm25_ctes
from .dataops_queries import _duck_cos
from .driver_queries import _read, register

# ---------------------------------------------------------------------------
# Scalar-quantization recall gate — lucene/core/.../util/quantization/
# ScalarQuantizer.java + the Lucene99 quantized-vectors format's
# acceptance criterion (quantized ranking must preserve full-precision
# recall): recall@10 of the int8 dot-product ranking (the
# vector_byte_dot_topk path) against the full-precision cosine top-10.
# Both rankings are deterministic, so the recall itself is an EXACT
# cross-engine number, not a statistic — the quality gate an embedding
# pipeline runs before switching its index to int8. Both branches are
# k-bounded heads; the overlap join is k-sized at any corpus scale.
# ---------------------------------------------------------------------------

_QR_K = 10


@register(
    "vector_quantized_recall",
    f"""WITH probe AS (SELECT embedding::DOUBLE[] AS p FROM embeddings WHERE vec_id = 0),
full10 AS (SELECT vec_id FROM (
    SELECT vec_id, round({_duck_cos('embedding::DOUBLE[]', 'p')}, 6) AS c
    FROM embeddings, probe)
  ORDER BY c DESC, vec_id ASC LIMIT {_QR_K}),
q AS (SELECT vec_id,
        {ann.DUCK_BYTE_QUANT.format(e='embedding')} AS qv
      FROM embeddings),
qprobe AS (SELECT qv AS p FROM q WHERE vec_id = 0),
quant10 AS (SELECT vec_id FROM (
    SELECT vec_id, list_dot_product(qv, p) AS d FROM q, qprobe)
  ORDER BY d DESC, vec_id ASC LIMIT {_QR_K})
SELECT count(*)::BIGINT AS n_overlap,
       round(count(*) / {_QR_K}.0, 6) AS recall_at_10
FROM full10 JOIN quant10 USING (vec_id)""",
)
def vector_quantized_recall(spark, sf_dir):
    """recall@10 of int8 dot-product ranking vs full-precision cosine."""
    from .coverage20_queries import _quantize_byte

    emb = _read(spark, sf_dir, "embeddings")
    raw = [float(x) for x in emb.filter("vec_id = 0").collect()[0]["embedding"]]
    full10 = ann.cosine_topk(emb, raw, k=_QR_K).select("vec_id")
    pq = _quantize_byte(raw)
    p = F.array(*[F.lit(int(x)).cast("long") for x in pq])
    dot = ann.long_dot_expr(ann.byte_quantize_expr(F.col("embedding")), p)
    quant10 = (
        emb.select("vec_id", dot.alias("d"))
        .orderBy(F.desc("d"), F.asc("vec_id"))
        .limit(_QR_K)
        .select("vec_id")
    )
    return full10.join(quant10, "vec_id").agg(
        F.count("*").alias("n_overlap"),
        F.round(F.count("*") / float(_QR_K), 6).alias("recall_at_10"),
    )


# ---------------------------------------------------------------------------
# Pure-negative query rewrite — Lucene's BooleanQuery rejects a query
# with only prohibited clauses (nothing to enumerate), but Solr rewrites
# a top-level pure negative by injecting MatchAllDocsQuery
# (solr/core/.../search/QueryUtils.java#makeQueryable /
# fixNegativeQuery): q='-order' means "every live doc NOT matching
# 'order'". ENGINE-PATH: MatchAll = the segment docmap, minus the real
# DocSet from the postings (left_anti = the andNot DocSet op); lang
# comes from stored fields. At scale the anti-join streams the docmap
# against the (much smaller) matching DocSet.
# ---------------------------------------------------------------------------

_PN_TERM = "order"


@register(
    "pure_negative_query",
    f"""SELECT lang, count(*)::BIGINT AS n_docs
FROM documents
WHERE NOT list_contains(string_split(text, ' '), '{_PN_TERM}')
GROUP BY lang ORDER BY n_docs DESC, lang ASC""",
)
def pure_negative_query(spark, sf_dir):
    """q='-order': MatchAll minus the DocSet, per-lang counts."""
    from .solr_queries import _engine_searcher

    s = _engine_searcher(spark, sf_dir)
    matched = s.match_docs(_PN_TERM)
    return (
        s.segment.stored_fields(spark)
        .join(matched, "doc_id", "left_anti")
        .groupBy("lang")
        .agg(F.count("*").alias("n_docs"))
        .orderBy(F.desc("n_docs"), F.asc("lang"))
    )


# ---------------------------------------------------------------------------
# CompositeIdRouter — solr/solrj/.../common/cloud/CompositeIdRouter.java:
# a 'prefix!suffix' doc id routes by the hash of the PREFIX, so every doc
# sharing a prefix lands in one shard (multi-tenant colocation). Hash =
# the repo's 60-bit md5 convention (the reference uses murmurhash3; same
# contract, different mixer — Spark's F.hash and DuckDB's hash() don't
# agree cross-engine, the md5 convention does). The row pins the
# colocation invariant itself: (shard, prefix) pairs with counts — each
# prefix appears under exactly ONE shard.
# ---------------------------------------------------------------------------

_CIR_SHARDS = 8


@register(
    "composite_id_routing",
    f"""SELECT ({DUCK_H60.format(e='lang')} % {_CIR_SHARDS}) AS shard,
       lang, count(*)::BIGINT AS n_docs
FROM documents
GROUP BY 1, 2 ORDER BY shard ASC, lang ASC""",
)
def composite_id_routing(spark, sf_dir):
    """'lang!doc_id' composite routing: prefix-hash shard per lang."""
    d = _read(spark, sf_dir, "documents")
    shard = (h60(F.col("lang")) % _CIR_SHARDS).alias("shard")
    return (
        d.groupBy(shard, "lang")
        .agg(F.count("*").alias("n_docs"))
        .orderBy(F.asc("shard"), F.asc("lang"))
    )


# ---------------------------------------------------------------------------
# DiversifyingChildrenFloatKnnVectorQuery — lucene/join/src/java/org/
# apache/lucene/search/join/DiversifyingChildrenFloatKnnVectorQuery.java:
# KNN over CHILD vectors where at most one child per parent block may
# enter the top-k (result diversification across parents), each parent
# represented by its best-scoring child. Parent blocks here are the
# vec_id//5 groups (the block-join layout analog). One window partitioned
# by parent + a k-bounded head.
# ---------------------------------------------------------------------------

_PB_BLOCK = 5


@register(
    "parent_block_knn",
    f"""WITH probe AS (SELECT embedding::DOUBLE[] AS p FROM embeddings WHERE vec_id = 0),
c AS (SELECT vec_id, (vec_id // {_PB_BLOCK}) AS parent_id,
             round({_duck_cos('embedding::DOUBLE[]', 'p')}, 6) AS cos_sim
      FROM embeddings, probe),
best AS (SELECT parent_id, vec_id AS child_vec_id, cos_sim,
                row_number() OVER (PARTITION BY parent_id
                                   ORDER BY cos_sim DESC, vec_id ASC) AS rn
         FROM c)
SELECT parent_id, child_vec_id, cos_sim
FROM best WHERE rn = 1
ORDER BY cos_sim DESC, parent_id ASC LIMIT 5""",
)
def parent_block_knn(spark, sf_dir):
    """Diversified parent-block KNN: best child per parent, top-5
    parents by child cosine."""
    emb = _read(spark, sf_dir, "embeddings")
    probe = [float(x) for x in emb.filter("vec_id = 0").collect()[0]["embedding"]]
    p = F.array(*[F.lit(float(x)) for x in probe])
    c = emb.select(
        "vec_id",
        F.floor(F.col("vec_id") / _PB_BLOCK).cast("long").alias("parent_id"),
        F.round(
            ann.cosine(F.col("embedding").cast("array<double>"), p), 6
        ).alias("cos_sim"),
    )
    w = Window.partitionBy("parent_id").orderBy(
        F.desc("cos_sim"), F.asc("vec_id")
    )
    return (
        c.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select(
            "parent_id", F.col("vec_id").alias("child_vec_id"), "cos_sim"
        )
        .orderBy(F.desc("cos_sim"), F.asc("parent_id"))
        .limit(5)
    )


# ---------------------------------------------------------------------------
# query() function query — solr ValueSourceParser's `query($param)`
# (QueryValueSource in lucene/queries/.../function/valuesource/
# QueryValueSource.java): another query's SCORE used as a value source,
# here boosting BM25 relevance by a doc-value factor
# (score(q) * n_chars/1000). ENGINE-PATH: the inner scores are the real
# WAND engine's float32 BM25; the product ranks in float64. The oracle
# re-derives the f32 scores via the shared binary32 CTEs. The rerank
# window is the full segment doc count so the head provably covers every
# matching doc; at scale a deployment bounds it, accepting the standard
# rerank-window approximation (the ltr_rerank shape).
# ---------------------------------------------------------------------------

_QVS_TERMS = ["batch", "order", "stream"]


@register(
    "function_query_nested_score",
    f"""WITH {_f32_bm25_ctes(_QVS_TERMS)}
SELECT s.doc_id,
       round(s.score_f::DOUBLE * (d.n_chars / 1000.0), 4) AS boosted
FROM scored s JOIN documents d ON d.doc_id = s.doc_id
ORDER BY s.score_f::DOUBLE * (d.n_chars / 1000.0) DESC, s.doc_id ASC
LIMIT 10""",
)
def function_query_nested_score(spark, sf_dir):
    """product(query($q), div(n_chars,1000)): WAND scores reranked by a
    stored doc value."""
    from .solr_queries import _engine_searcher

    s = _engine_searcher(spark, sf_dir)
    # rerank window = the whole segment: the oracle ranks over every
    # matching doc, so the engine head must too (a fixed k<n can miss an
    # oracle-top doc whose BM25 rank is low but n_chars factor is large)
    scores = s.topk(
        " ".join(_QVS_TERMS), k=s.segment.stats.n_docs, mode="wand"
    )
    d = _read(spark, sf_dir, "documents").select("doc_id", "n_chars")
    boosted = scores.join(d, "doc_id").select(
        "doc_id",
        (F.col("score").cast("double") * (F.col("n_chars") / 1000.0)).alias(
            "b"
        ),
    )
    return (
        boosted.orderBy(F.desc("b"), F.asc("doc_id"))
        .limit(10)
        .select("doc_id", F.round("b", 4).alias("boosted"))
    )
