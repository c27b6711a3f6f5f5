"""Round-5 widening batch #16: ord()/rord() value sources, split-by-prefix
shard splitting, and passage ranking.

Each entry re-expresses a reference component (public lucene-solr
path#symbol cited per entry; the reference mount is empty) over the driver
testdata with a DuckDB oracle using identical column aliases.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from ..operators.dedup import DUCK_H60, h60
from ..functions.analysis import duckdb_tokenize_sql
from .driver_queries import _read, register

# ---------------------------------------------------------------------------
# ord()/rord() function queries — solr ValueSourceParser dispatching to
# lucene/queries/.../function/valuesource/OrdFieldSource.java and
# ReverseOrdFieldSource.java: a doc's value = the ORDINAL of its string
# docvalue in the field's sorted terms dictionary (1-based), rord = the
# reverse ordinal (n_values - ord + 1) — the classic cheap sort key over
# a low-cardinality string field. dense_rank over the value order IS the
# ordinal; at scale the ordinal table is the terms dict (tiny) broadcast
# against the docs.
# ---------------------------------------------------------------------------


@register(
    "function_query_ord",
    """WITH n AS (SELECT count(DISTINCT lang) AS nv FROM documents),
o AS (SELECT doc_id, lang, dense_rank() OVER (ORDER BY lang ASC) AS ord
      FROM documents)
SELECT doc_id, lang, ord::BIGINT AS ord, (n.nv - ord + 1)::BIGINT AS rord
FROM o, n WHERE doc_id < 20 ORDER BY doc_id ASC""",
)
def function_query_ord(spark, sf_dir):
    """ord(lang) / rord(lang) for docs 0-19: terms-dict ordinals."""
    d = _read(spark, sf_dir, "documents")
    nv = d.select("lang").distinct().count()
    w = Window.orderBy(F.asc("lang"))
    o = d.select(
        "doc_id", "lang", F.dense_rank().over(w).cast("long").alias("ord")
    )
    return (
        o.where(F.col("doc_id") < 20)
        .select(
            "doc_id",
            "lang",
            "ord",
            (F.lit(int(nv)) - F.col("ord") + 1).alias("rord"),
        )
        .orderBy(F.asc("doc_id"))
    )


# ---------------------------------------------------------------------------
# Split-by-prefix shard splitting — solr SplitShardCmd with
# `split.byPrefix=true` over CompositeIdRouter
# (solr/core/.../cloud/api/collections/SplitByPrefixUtil.java +
# CompositeIdRouter#partitionRange): choose the split point nearest the
# doc-count midpoint WITHOUT breaking any id prefix apart — every prefix
# stays whole in one sub-shard. Model: prefixes (lang) ordered by their
# router hash (the repo's md5-60 convention), cumulative doc counts, left
# sub-shard = prefixes whose cumulative count BEFORE them is under half
# the total. Pins the two invariants: prefixes whole, split near the
# midpoint. One tiny window over the prefix histogram.
# ---------------------------------------------------------------------------


@register(
    "shard_split_by_prefix",
    f"""WITH p AS (SELECT lang, count(*)::BIGINT AS n_docs,
            {DUCK_H60.format(e='lang')} AS h
     FROM documents GROUP BY lang),
c AS (SELECT lang, n_docs, h,
             coalesce(sum(n_docs) OVER (ORDER BY h ASC
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
               AS cum_before,
             sum(n_docs) OVER () AS total
      FROM p)
SELECT CASE WHEN cum_before * 2 < total THEN 0 ELSE 1 END AS sub_shard,
       lang, n_docs
FROM c ORDER BY sub_shard ASC, lang ASC""",
)
def shard_split_by_prefix(spark, sf_dir):
    """split.byPrefix: hash-ordered prefixes assigned around the doc-count
    midpoint, each prefix whole."""
    d = _read(spark, sf_dir, "documents")
    p = d.groupBy("lang").agg(F.count("*").alias("n_docs")).withColumn(
        "h", h60(F.col("lang"))
    )
    w = Window.orderBy(F.asc("h")).rowsBetween(
        Window.unboundedPreceding, -1
    )
    c = p.withColumn(
        "cum_before", F.coalesce(F.sum("n_docs").over(w), F.lit(0))
    ).withColumn("total", F.sum("n_docs").over(Window.partitionBy()))
    return (
        c.select(
            F.when(F.col("cum_before") * 2 < F.col("total"), 0)
            .otherwise(1)
            .alias("sub_shard"),
            "lang",
            "n_docs",
        )
        .orderBy(F.asc("sub_shard"), F.asc("lang"))
    )


# ---------------------------------------------------------------------------
# Passage ranking — lucene/highlighter/.../uh/UnifiedHighlighter.java's
# PassageScorer contract: rank candidate passages by the query terms they
# contain and return each doc's best passage. Deviation (documented):
# the reference scores passages with BM25-ish float weights; this row
# ranks by (distinct query terms in passage, total occurrences) — an
# integer-exact ordering that keeps the cross-engine oracle tolerance at
# zero while preserving the "most query-dense window wins" contract.
# Passages = fixed 10-token windows (pos // 10). Output: top-5 docs by
# their best passage, with the passage's window start.
# ---------------------------------------------------------------------------

_PR_TERMS = ("order", "batch", "stream")
_PR_WIN = 10


@register(
    "passage_ranking_topk",
    f"""WITH tokarr AS (SELECT doc_id, {duckdb_tokenize_sql('text')} AS t FROM documents),
posd AS (SELECT doc_id, i - 1 AS pos, t[i] AS term
         FROM tokarr, (SELECT unnest(range(1, 4000)) AS i) ix WHERE i <= len(t)),
m AS (SELECT doc_id, (pos // {_PR_WIN}) AS win, term
      FROM posd WHERE term IN {_PR_TERMS}),
ws AS (SELECT doc_id, win, count(DISTINCT term)::BIGINT AS n_terms,
              count(*)::BIGINT AS n_occ
       FROM m GROUP BY doc_id, win),
best AS (SELECT doc_id, win, n_terms, n_occ,
                row_number() OVER (PARTITION BY doc_id
                                   ORDER BY n_terms DESC, n_occ DESC, win ASC)
                  AS rn
         FROM ws)
SELECT doc_id, (win * {_PR_WIN})::BIGINT AS win_start, n_terms, n_occ
FROM best WHERE rn = 1
ORDER BY n_terms DESC, n_occ DESC, doc_id ASC LIMIT 5""",
)
def passage_ranking_topk(spark, sf_dir):
    """Best 10-token passage per doc by query-term density; top-5 docs."""
    from .driver_queries import _tokens

    posd = _tokens(spark, sf_dir).select(
        "doc_id", F.posexplode("tokens").alias("pos", "term")
    )
    m = posd.where(F.col("term").isin(*_PR_TERMS)).select(
        "doc_id", (F.col("pos") / _PR_WIN).cast("long").alias("win"), "term"
    )
    ws = m.groupBy("doc_id", "win").agg(
        F.countDistinct("term").alias("n_terms"),
        F.count("*").alias("n_occ"),
    )
    w = Window.partitionBy("doc_id").orderBy(
        F.desc("n_terms"), F.desc("n_occ"), F.asc("win")
    )
    return (
        ws.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select(
            "doc_id",
            (F.col("win") * _PR_WIN).alias("win_start"),
            "n_terms",
            "n_occ",
        )
        .orderBy(F.desc("n_terms"), F.desc("n_occ"), F.asc("doc_id"))
        .limit(5)
    )
