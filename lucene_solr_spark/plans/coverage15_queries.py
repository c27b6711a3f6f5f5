"""Round-5 widening batch #6: group.truncate faceting, RangeFieldQuery
relations, the solrj knn stream, BlendedInfixSuggester position blending,
and CommonGramsQueryFilter query-mode tokenization.

Each entry re-expresses a reference component (public lucene-solr
path#symbol cited per entry; the reference mount is empty) over the driver
testdata with a DuckDB oracle using identical column aliases.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from ..functions.analysis import duckdb_tokenize_sql
from .driver_queries import _read, _tokens, register

_TOKS_CTE = (
    f"toks AS (SELECT doc_id, unnest({duckdb_tokenize_sql('text')}) AS term "
    "FROM documents)"
)


# ---------------------------------------------------------------------------
# group.truncate=true — solr/core/src/java/org/apache/solr/search/
# Grouping.java#setTruncateGroups (CollapsingQParserPlugin shares the
# semantics): facet counts are computed over ONLY the most relevant doc of
# each group, not every doc — the facet domain is the collapsed result.
# Groups = o_custkey, relevance = o_totalprice desc (o_orderkey asc
# tie-break), facet field = o_orderstatus. Spark shape: arg-max via ONE
# map-combined max(struct(...)) agg (no window, no per-group sort — the
# collapse trick), then a tiny second agg over one row per group.
# ---------------------------------------------------------------------------


@register(
    "group_truncate_facet",
    """WITH best AS (
  SELECT o_custkey, o_orderstatus,
         row_number() OVER (PARTITION BY o_custkey
                            ORDER BY o_totalprice DESC, o_orderkey ASC) AS rn
  FROM orders)
SELECT o_orderstatus AS status, count(*)::BIGINT AS n_groups
FROM best WHERE rn = 1
GROUP BY status ORDER BY n_groups DESC, status ASC""",
)
def group_truncate_facet(spark, sf_dir):
    """Facet over the top doc of each group (group.truncate=true)."""
    o = _read(spark, sf_dir, "orders")
    # arg-max without a window: max over a struct ordered by the ranking
    # key; negate the tie-break so DESC price / ASC orderkey is one max().
    best = (
        o.groupBy("o_custkey")
        .agg(
            F.max(
                F.struct(
                    F.col("o_totalprice").alias("p"),
                    (-F.col("o_orderkey")).alias("nk"),
                    F.col("o_orderstatus").alias("status"),
                )
            ).alias("top")
        )
        .select(F.col("top.status").alias("status"))
    )
    return (
        best.groupBy("status")
        .agg(F.count("*").alias("n_groups"))
        .orderBy(F.desc("n_groups"), F.asc("status"))
    )


# ---------------------------------------------------------------------------
# RangeFieldQuery relations — lucene/core/src/java/org/apache/lucene/
# document/DoubleRange.java + search/RangeFieldQuery.java QueryType
# {INTERSECTS, WITHIN, CONTAINS, CROSSES}: each doc stores a range
# [lo, hi]; the query range is compared under the chosen relation.
# Synthesized ranges: [o_totalprice, o_totalprice + 50000 + (key % 4) *
# 50000] per order (widths 50k..200k so every relation can fire against
# the 100k-wide query [100000, 200000]). One scan, four conditional
# aggregates unpivoted (the qparser_dispatch_matrix shape) — the relation
# matrix in one job. CROSSES is defined as the reference does: intersects
# but neither within nor contains.
# ---------------------------------------------------------------------------

_RF_QLO, _RF_QHI, _RF_W = 100000.0, 200000.0, 50000.0
_RF_WIDTH_SQL = f"({_RF_W} + (o_orderkey % 4) * {_RF_W})"


@register(
    "range_field_relation",
    f"""WITH r AS (SELECT o_totalprice AS lo,
                o_totalprice + {_RF_WIDTH_SQL} AS hi FROM orders),
m AS (SELECT
  sum(CASE WHEN lo <= {_RF_QHI} AND hi >= {_RF_QLO} THEN 1 ELSE 0 END)::BIGINT AS n_intersects,
  sum(CASE WHEN lo >= {_RF_QLO} AND hi <= {_RF_QHI} THEN 1 ELSE 0 END)::BIGINT AS n_within,
  sum(CASE WHEN lo <= {_RF_QLO} AND hi >= {_RF_QHI} THEN 1 ELSE 0 END)::BIGINT AS n_contains
  FROM r)
SELECT 'CONTAINS' AS relation, n_contains AS n_docs FROM m
UNION ALL SELECT 'CROSSES', n_intersects - n_within - n_contains FROM m
UNION ALL SELECT 'INTERSECTS', n_intersects FROM m
UNION ALL SELECT 'WITHIN', n_within FROM m
ORDER BY relation ASC""",
)
def range_field_relation(spark, sf_dir):
    """RangeFieldQuery relation matrix over synthesized doc ranges."""
    o = _read(spark, sf_dir, "orders")
    lo = F.col("o_totalprice")
    hi = F.col("o_totalprice") + (_RF_W + (F.col("o_orderkey") % 4) * _RF_W)
    intersects = (lo <= _RF_QHI) & (hi >= _RF_QLO)
    within = (lo >= _RF_QLO) & (hi <= _RF_QHI)
    contains = (lo <= _RF_QLO) & (hi >= _RF_QHI)
    m = o.agg(
        F.sum(intersects.cast("long")).alias("n_intersects"),
        F.sum(within.cast("long")).alias("n_within"),
        F.sum(contains.cast("long")).alias("n_contains"),
    )
    out = (
        m.select(F.lit("CONTAINS").alias("relation"), F.col("n_contains").alias("n_docs"))
        .unionAll(
            m.select(
                F.lit("CROSSES").alias("relation"),
                (F.col("n_intersects") - F.col("n_within") - F.col("n_contains")).alias(
                    "n_docs"
                ),
            )
        )
        .unionAll(
            m.select(F.lit("INTERSECTS").alias("relation"), F.col("n_intersects").alias("n_docs"))
        )
        .unionAll(
            m.select(F.lit("WITHIN").alias("relation"), F.col("n_within").alias("n_docs"))
        )
    )
    return out.orderBy(F.asc("relation"))


# ---------------------------------------------------------------------------
# knn stream — solrj/io/stream/KnnStream.java: `knn(collection, id=...,
# qf=..., k=..., mindf=..., maxdf=...)` — MoreLikeThis exposed as a
# streaming source, with the df-BOUNDED interesting-term selection the
# plain `more_like_this` row doesn't exercise: seed-doc terms are kept
# only when mindf <= df <= maxdf (MoreLikeThis#setMinDocFreq/#setMaxDocFreq),
# then candidates rank by shared interesting terms. The df gate is the
# at-scale control: it drops stopword-like terms whose postings would
# dominate the candidate scan.
# ---------------------------------------------------------------------------

_KNN_SEED, _KNN_MINDF_FRAC, _KNN_MAXDF_FRAC = 1, 0.55, 0.80


@register(
    "knn_stream_topk",
    f"""WITH {_TOKS_CTE},
n AS (SELECT count(DISTINCT doc_id) AS nd FROM toks),
df AS (SELECT term, count(DISTINCT doc_id) AS df FROM toks GROUP BY term),
interesting AS (
  SELECT DISTINCT t.term FROM toks t JOIN df ON df.term = t.term CROSS JOIN n
  WHERE t.doc_id = {_KNN_SEED}
    AND df.df >= {_KNN_MINDF_FRAC} * n.nd AND df.df <= {_KNN_MAXDF_FRAC} * n.nd),
cand AS (SELECT DISTINCT doc_id, term FROM toks WHERE doc_id <> {_KNN_SEED})
SELECT cand.doc_id, count(*)::BIGINT AS shared
FROM cand JOIN interesting i ON i.term = cand.term
GROUP BY cand.doc_id ORDER BY shared DESC, doc_id ASC LIMIT 10""",
)
def knn_stream_topk(spark, sf_dir):
    """knn stream: MLT with df-bounded interesting terms."""
    toks = _tokens(spark, sf_dir)
    pairs = toks.select("doc_id", F.explode("tokens").alias("term")).distinct()
    nd = pairs.select(F.countDistinct("doc_id").alias("nd"))
    df = pairs.groupBy("term").agg(F.countDistinct("doc_id").alias("df"))
    interesting = (
        pairs.filter(F.col("doc_id") == _KNN_SEED)
        .select("term")
        .join(F.broadcast(df), "term")
        .crossJoin(F.broadcast(nd))
        .filter(
            (F.col("df") >= _KNN_MINDF_FRAC * F.col("nd"))
            & (F.col("df") <= _KNN_MAXDF_FRAC * F.col("nd"))
        )
        .select("term")
        .distinct()
    )
    return (
        pairs.filter(F.col("doc_id") != _KNN_SEED)
        .join(F.broadcast(interesting), "term")
        .groupBy("doc_id")
        .agg(F.count("*").alias("shared"))
        .orderBy(F.desc("shared"), F.asc("doc_id"))
        .limit(10)
    )


# ---------------------------------------------------------------------------
# BlendedInfixSuggester — lucene/suggest/src/java/org/apache/lucene/search/
# suggest/analyzing/BlendedInfixSuggester.java (BlenderType.POSITION_LINEAR):
# an infix suggester whose weight is BLENDED by the position of the first
# matching token — coefficient 1 - position/(denominator), here the
# javadoc's linear 1 - 0.10*position. Suggestion corpus = part names,
# weight = max p_size per name; the prefix 'r' matches a token at
# position 0 ('red ...') or position 1 ('... ring', '... rod'), and a
# position-1 match is down-weighted — the whole point of blending vs the
# plain AnalyzingInfixSuggester row. First matching token wins (the
# reference takes the first matched position).
# ---------------------------------------------------------------------------

_BI_PREFIX = "r"


@register(
    "suggest_blended_infix",
    f"""WITH sugg AS (SELECT p_name AS suggestion, max(p_size) AS weight
             FROM part GROUP BY p_name),
pos AS (SELECT suggestion, weight,
        CASE WHEN split_part(suggestion, ' ', 1) LIKE '{_BI_PREFIX}%' THEN 0
             WHEN split_part(suggestion, ' ', 2) LIKE '{_BI_PREFIX}%' THEN 1
             ELSE -1 END AS p
        FROM sugg)
SELECT suggestion, round(weight * (1 - 0.10::DOUBLE * p), 6) AS score
FROM pos WHERE p >= 0
ORDER BY score DESC, suggestion ASC LIMIT 10""",
)
def suggest_blended_infix(spark, sf_dir):
    """Position-linear blended infix suggester over part names."""
    p = _read(spark, sf_dir, "part")
    sugg = p.groupBy(F.col("p_name").alias("suggestion")).agg(
        F.max("p_size").alias("weight")
    )
    w = F.split("suggestion", " ")
    pos = (
        F.when(F.element_at(w, 1).startswith(_BI_PREFIX), 0)
        .when(F.element_at(w, 2).startswith(_BI_PREFIX), 1)
        .otherwise(-1)
    )
    return (
        sugg.select("suggestion", "weight", pos.alias("p"))
        .filter(F.col("p") >= 0)
        .select(
            "suggestion",
            F.round(F.col("weight") * (1 - 0.10 * F.col("p")), 6).alias("score"),
        )
        .orderBy(F.desc("score"), F.asc("suggestion"))
        .limit(10)
    )


# ---------------------------------------------------------------------------
# CommonGramsQueryFilter — lucene/analysis/common/src/java/org/apache/
# lucene/analysis/commongrams/CommonGramsQueryFilter.java: at QUERY time
# the common-word unigram is DROPPED and only the bigram survives, so the
# phrase "the scan" queries the single posting list the_scan (adjacency)
# instead of AND-ing the huge 'the' postings. The row contrasts both
# interpretations on the same corpus — query-mode (adjacency) vs the
# naive conjunction a non-query-mode chain would run — as two counts.
# ---------------------------------------------------------------------------

_CG_COMMON, _CG_NEXT = "the", "scan"


@register(
    "common_grams_query_mode",
    f"""WITH tokarr AS (SELECT doc_id, {duckdb_tokenize_sql('text')} AS t FROM documents),
pos AS (SELECT doc_id, unnest(t) AS term, generate_subscripts(t, 1) AS p FROM tokarr),
adj AS (SELECT DISTINCT a.doc_id FROM pos a JOIN pos b
        ON b.doc_id = a.doc_id AND b.p = a.p + 1
        WHERE a.term = '{_CG_COMMON}' AND b.term = '{_CG_NEXT}'),
conj AS (SELECT doc_id FROM pos WHERE term = '{_CG_COMMON}'
         INTERSECT SELECT doc_id FROM pos WHERE term = '{_CG_NEXT}')
SELECT 'naive_and' AS mode, count(*)::BIGINT AS n_docs FROM conj
UNION ALL SELECT 'query_mode', count(*)::BIGINT FROM adj
ORDER BY mode ASC""",
)
def common_grams_query_mode(spark, sf_dir):
    """CommonGramsQueryFilter: the_scan bigram postings (adjacency) vs the
    naive unigram conjunction."""
    toks = _tokens(spark, sf_dir)
    arr = toks.select("doc_id", F.col("tokens").alias("t"))
    adjacent = F.expr(
        "exists(sequence(0, greatest(size(t) - 2, 0)), "
        f"i -> t[i] = '{_CG_COMMON}' AND t[i + 1] = '{_CG_NEXT}')"
    ) & (F.size("t") >= 2)
    both = F.array_contains("t", _CG_COMMON) & F.array_contains("t", _CG_NEXT)
    m = arr.agg(
        F.sum(both.cast("long")).alias("n_and"),
        F.sum(adjacent.cast("long")).alias("n_adj"),
    )
    return (
        m.select(F.lit("naive_and").alias("mode"), F.col("n_and").alias("n_docs"))
        .unionAll(
            m.select(F.lit("query_mode").alias("mode"), F.col("n_adj").alias("n_docs"))
        )
        .orderBy(F.asc("mode"))
    )
