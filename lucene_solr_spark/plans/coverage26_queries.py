"""Round-5 widening batch #17: MatchAllDocsQuery through the classic
parser syntax.

Each entry re-expresses a reference component (public lucene-solr
path#symbol cited per entry; the reference mount is empty) over the driver
testdata with a DuckDB oracle using identical column aliases.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from .driver_queries import _read, register

# ---------------------------------------------------------------------------
# MatchAllDocsQuery via the classic `*:*` syntax —
# lucene/core/.../search/MatchAllDocsQuery.java reached through
# queryparser/classic/QueryParser.jj's field-'*'/term-'*' production (the
# canonical "everything" query every Solr admin UI issues): every doc,
# constant score 1.0, docID tie-break. ENGINE-PATH: Searcher.search("*:*")
# — a pruned docmap scan, zero postings touched (distinct from the
# `match_all_count` aggregate row: this pins the PARSER route and the
# constant-score/doc-order result shape).
# ---------------------------------------------------------------------------


@register(
    "matchall_engine_constant",
    """SELECT doc_id, 1.0::DOUBLE AS score
FROM documents ORDER BY doc_id ASC LIMIT 20""",
)
def matchall_engine_constant(spark, sf_dir):
    """q='*:*' through the classic parser: first 20 docs, score 1.0."""
    from .solr_queries import _engine_searcher

    s = _engine_searcher(spark, sf_dir)
    return s.search("*:*", k=20).select(
        "doc_id", F.col("score").cast("double").alias("score")
    )


# ---------------------------------------------------------------------------
# Distributed stats merge — solr/core/.../handler/component/StatsComponent
# .java distributed stage (StatsValuesFactory's mergeable stats: each
# shard returns (count, sum, sumOfSquares) and the coordinator combines
# them; variance/stddev come out of the MERGED moments, never from
# per-shard stddevs). ENGINE SHAPE: per-shard (doc-hash) partial moments
# in one grouped agg, one merge agg, stddev from the merged moments —
# provably equal to the single-pass computation because the partial sums
# are DECIMAL-exact (order-independent), so the final float64 formula
# sqrt((ssq - s^2/n)/(n-1)) sees bit-identical inputs either way. The
# oracle computes the same formula single-pass from the same DECIMAL
# moments. This is the map-side-combine algebra every Spark agg uses —
# the row pins that it matches the reference's merge contract exactly.
# ---------------------------------------------------------------------------

_SM_SHARDS = 4


@register(
    "stats_distributed_merge",
    """WITH m AS (SELECT l_returnflag,
        count(*)::BIGINT AS n,
        sum(CAST(l_quantity AS DECIMAL(18,2))) AS s,
        sum(CAST(l_quantity * l_quantity AS DECIMAL(18,2))) AS ssq
     FROM lineitem GROUP BY l_returnflag)
SELECT l_returnflag, n, s AS sum_qty,
       round(sqrt(((ssq::DOUBLE) - (s::DOUBLE) * (s::DOUBLE) / n) / (n - 1)), 6)
         AS stddev_qty
FROM m ORDER BY l_returnflag ASC""",
)
def stats_distributed_merge(spark, sf_dir):
    """Shard-partial (n, sum, sumsq) moments merged to exact global
    stddev per returnflag — the StatsComponent merge algebra."""
    li = _read(spark, sf_dir, "lineitem").select(
        "l_returnflag",
        "l_quantity",
        (F.col("l_orderkey") % _SM_SHARDS).alias("shard"),
    )
    partial = li.groupBy("shard", "l_returnflag").agg(
        F.count("*").alias("n_p"),
        F.sum(F.col("l_quantity").cast("decimal(18,2)")).alias("s_p"),
        F.sum(
            (F.col("l_quantity") * F.col("l_quantity")).cast("decimal(18,2)")
        ).alias("ssq_p"),
    )
    merged = partial.groupBy("l_returnflag").agg(
        F.sum("n_p").alias("n"),
        F.sum("s_p").alias("s"),
        F.sum("ssq_p").alias("ssq"),
    )
    n = F.col("n").cast("double")
    s = F.col("s").cast("double")
    ssq = F.col("ssq").cast("double")
    return (
        merged.select(
            "l_returnflag",
            F.col("n").cast("long").alias("n"),
            F.col("s").cast("decimal(38,2)").alias("sum_qty"),
            F.round(
                F.sqrt((ssq - s * s / n) / (n - F.lit(1))), 6
            ).alias("stddev_qty"),
        )
        .orderBy(F.asc("l_returnflag"))
    )


# ---------------------------------------------------------------------------
# FuzzyQuery via the classic parser with Lucene's default metric —
# queryparser/classic parses `term~N` into search/FuzzyQuery.java whose
# DEFAULT transpositions=true uses the OSA (restricted Damerau) distance
# of util/automaton/LevenshteinAutomata.java. Probe 'atble' is chosen so
# the metrics DISAGREE: OSA('atble','table')=1 (one adjacent swap) but
# plain Levenshtein=2 — a plain-metric engine would return ZERO rows
# here, so the row is a sharp cross-metric pin, scored f32-exactly
# through the real WAND tree over the expanded disjunction. (DuckDB's
# damerau_levenshtein is unrestricted Damerau; it equals OSA at
# distance <= 1, the case exercised.)
# ---------------------------------------------------------------------------

_FZ_PROBE = "atble"


def _osa_fuzzy_oracle() -> str:
    from .coverage3_queries import _f32_bm25_ctes

    base = _f32_bm25_ctes(["__placeholder__"])
    old = "qt AS (SELECT unnest(['__placeholder__']) AS term)"
    new = (
        "qt AS (SELECT DISTINCT term FROM pos "
        f"WHERE damerau_levenshtein(term, '{_FZ_PROBE}') <= 1)"
    )
    assert old in base, "f32 CTE shape drifted"
    return f"""WITH {base.replace(old, new)}
SELECT doc_id, round(score_f::DOUBLE, 4) AS score
FROM scored ORDER BY score_f DESC, doc_id ASC LIMIT 10"""


@register("fuzzy_osa_parser_topk", _osa_fuzzy_oracle())
def fuzzy_osa_parser_topk(spark, sf_dir):
    """`atble~1` through the classic parser: OSA expansion (a plain-
    Levenshtein engine returns nothing), BM25 top-10 over the expansion."""
    from .solr_queries import _engine_searcher

    s = _engine_searcher(spark, sf_dir)
    return s.search(f"{_FZ_PROBE}~1", k=10).select(
        "doc_id", F.round(F.col("score").cast("double"), 4).alias("score")
    )
