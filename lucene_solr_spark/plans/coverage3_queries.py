"""Round-2 session-6 coverage: JDBC import (DataImportHandler / JDBCStream),
timeseries stream evaluators (movingAvg / derivative), HavingStream,
exact-substring dedup at n-gram granularity (suffix-array analog), and
search-result clustering (ClusteringComponent, Lingo-lite).

Each entry re-expresses a reference operator (public lucene-solr path cited
per entry; reference mount is empty, so citations are path#symbol only) over
the driver testdata with a DuckDB oracle using identical column aliases and
matched formulas. Registered into the same REGISTRY/ORACLES as
driver_queries (imported by __spark_entry__).
"""

from __future__ import annotations

import hashlib

from pyspark.sql import functions as F

from ..functions.analysis import duckdb_tokenize_sql
from .driver_queries import _read, _tokens, register

_TOKS_CTE = (
    f"toks AS (SELECT doc_id, unnest({duckdb_tokenize_sql('text')}) AS term "
    "FROM documents)"
)
_TOKARR_CTE = (
    f"tokarr AS (SELECT doc_id, {duckdb_tokenize_sql('text')} AS t FROM documents)"
)


# ---------------------------------------------------------------------------
# JDBC import — solr/contrib/dataimporthandler (JdbcDataSource.java) and the
# streaming-expression JDBCStream (solrj/io/stream/JDBCStream.java): pull rows
# out of an RDBMS and into the indexing pipeline. Spark mapping:
# spark.read.jdbc with a numeric partitionColumn so N executors each issue a
# ranged query — at 100 TB-scale ingest the read parallelizes across the key
# range instead of funneling through one connection (JDBCStream is
# single-connection; this is the scale-out version). The sandbox has no
# external RDBMS, but pyspark ships the Derby embedded driver, so the row
# round-trips supplier through a real JDBC database: write via df.write.jdbc,
# read back via spark.read.jdbc(partitionColumn=s_suppkey, numPartitions=4),
# then aggregate. The oracle aggregates the same source parquet directly —
# equality proves the JDBC hop was lossless.
# ---------------------------------------------------------------------------


@register(
    "jdbc_import_agg",
    """SELECT s_nationkey, count(*)::BIGINT AS n_sup,
       round(sum(s_acctbal), 2) AS sum_bal
FROM supplier GROUP BY s_nationkey ORDER BY s_nationkey""",
)
def jdbc_import_agg(spark, sf_dir):
    """DataImportHandler analog: supplier -> embedded Derby (real JDBC write),
    ranged-parallel spark.read.jdbc back, aggregate the imported rows."""
    sup = _read(spark, sf_dir, "supplier")
    tag = hashlib.md5(sf_dir.encode()).hexdigest()[:8]
    url = f"jdbc:derby:/tmp/lucene_solr_spark_derby_{tag};create=true"
    props = {"driver": "org.apache.derby.jdbc.EmbeddedDriver"}
    sup.write.jdbc(url, "supplier_import", mode="overwrite", properties=props)
    lo, hi = sup.agg(F.min("s_suppkey"), F.max("s_suppkey")).first()
    imported = spark.read.jdbc(
        url,
        "supplier_import",
        column="s_suppkey",
        lowerBound=int(lo),
        upperBound=int(hi) + 1,
        numPartitions=4,
        properties=props,
    )
    return (
        imported.groupBy("s_nationkey")
        .agg(
            F.count("*").alias("n_sup"),
            F.round(F.sum("s_acctbal"), 2).alias("sum_bal"),
        )
        .orderBy("s_nationkey")
    )


# ---------------------------------------------------------------------------
# timeseries stream + movingAvg/derivative evaluators —
# solrj/io/stream/TimeSeriesStream.java plus
# solrj/io/eval/MovingAverageEvaluator.java and DerivativeEvaluator.java:
# bucket by day, aggregate, then post-process the ordered series. Spark
# mapping: groupBy(date_trunc) then window functions over the day ordering —
# the rollup is a map-combined shuffle on the day key and the evaluators are
# a single ordered window pass (at scale: partition the window by a coarser
# key, e.g. month, to avoid a single-partition sort; here the series is tiny
# by construction — one row per day).
# ---------------------------------------------------------------------------


@register(
    "timeseries_moving_avg",
    """WITH daily AS (
  SELECT date_trunc('day', ts) AS day, sum(value) AS total
  FROM events GROUP BY 1
)
SELECT strftime(day, '%Y-%m-%d') AS day,
       round(total, 4) AS total,
       round(avg(total) OVER (ORDER BY day ROWS BETWEEN 2 PRECEDING AND CURRENT ROW), 4) AS mov_avg3,
       round(total - lag(total) OVER (ORDER BY day), 4) AS deriv
FROM daily ORDER BY day""",
)
def timeseries_moving_avg(spark, sf_dir):
    """timeseries(events, day) -> movingAvg(3) + derivative over daily sums."""
    from pyspark.sql import Window

    ev = _read(spark, sf_dir, "events")
    daily = ev.groupBy(F.date_trunc("day", "ts").alias("day")).agg(
        F.sum("value").alias("total")
    )
    w = Window.orderBy("day")
    w3 = w.rowsBetween(-2, 0)
    return (
        daily.select(
            F.date_format("day", "yyyy-MM-dd").alias("day"),
            F.round("total", 4).alias("total"),
            F.round(F.avg("total").over(w3), 4).alias("mov_avg3"),
            F.round(F.col("total") - F.lag("total").over(w), 4).alias("deriv"),
        )
        .orderBy("day")
    )


# ---------------------------------------------------------------------------
# HavingStream — solrj/io/stream/HavingStream.java: a decorator that filters
# aggregated tuples by a boolean evaluator (SQL HAVING). Spark mapping: the
# post-aggregation filter stays in the same stage as the final aggregation —
# Catalyst places it after the partial+final agg, so no extra shuffle.
# ---------------------------------------------------------------------------


@register(
    "having_stream",
    """SELECT event_type, count(*)::BIGINT AS n, round(avg(value), 4) AS avg_val
FROM events GROUP BY event_type HAVING count(*) > 100 AND avg(value) > 0
ORDER BY n DESC, event_type""",
)
def having_stream(spark, sf_dir):
    """having(rollup(events, over=event_type), and(gt(n,100), gt(avg,0)))."""
    ev = _read(spark, sf_dir, "events")
    return (
        ev.groupBy("event_type")
        .agg(F.count("*").alias("n"), F.round(F.avg("value"), 4).alias("avg_val"))
        .filter((F.col("n") > 100) & (F.col("avg_val") > 0))
        .orderBy(F.desc("n"), "event_type")
    )


# ---------------------------------------------------------------------------
# Exact-substring dedup at n-gram granularity — the training-pipeline
# operation from "Deduplicating Training Data Makes Language Models Better"
# (Lee et al., 2022): find verbatim token spans shared across documents.
# The paper builds a suffix array; the distributed analog fingerprints every
# length-W token window and group-counts window hashes — a window occurring
# in >=2 distinct docs is a shared span. One map-combined shuffle on the
# window text; no all-pairs comparison. At 100 TB the window column is
# hashed (xxhash64) before the shuffle so shuffle rows are 8-byte keys; here
# the raw window string is kept so DuckDB can reproduce it exactly.
# ---------------------------------------------------------------------------

_W = 8  # span width in tokens — long enough that sharing implies copying


@register(
    "dup_ngram_spans",
    f"""WITH {_TOKARR_CTE},
wins AS (
  SELECT doc_id,
         unnest([array_to_string(t[i:i+{_W - 1}], ' ')
                 FOR i IN range(1, len(t) - {_W} + 2)]) AS win
  FROM tokarr WHERE len(t) >= {_W}
),
shared AS (
  SELECT win, count(DISTINCT doc_id) AS n_docs
  FROM wins GROUP BY win HAVING count(DISTINCT doc_id) >= 2
)
SELECT count(*)::BIGINT AS shared_spans,
       coalesce(max(n_docs), 0)::BIGINT AS max_span_docs,
       (SELECT count(DISTINCT w.doc_id) FROM wins w
        WHERE w.win IN (SELECT win FROM shared))::BIGINT AS docs_affected
FROM shared""",
)
def dup_ngram_spans(spark, sf_dir):
    """Count verbatim 8-token spans shared by >=2 docs + affected docs."""
    toks = _tokens(spark, sf_dir)
    wins = (
        toks.filter(F.size("tokens") >= _W)
        .select(
            "doc_id",
            F.explode(
                F.transform(
                    F.sequence(F.lit(0), F.size("tokens") - _W),
                    lambda i: F.concat_ws(" ", F.slice("tokens", i + 1, _W)),
                )
            ).alias("win"),
        )
    )
    per_win = wins.groupBy("win").agg(
        F.count_distinct("doc_id").alias("n_docs")
    )
    shared = per_win.filter(F.col("n_docs") >= 2)
    affected = (
        wins.join(shared.select("win"), "win", "left_semi")
        .agg(F.count_distinct("doc_id").alias("docs_affected"))
    )
    stats = shared.agg(
        F.count("*").alias("shared_spans"),
        F.coalesce(F.max("n_docs"), F.lit(0)).alias("max_span_docs"),
    )
    return stats.crossJoin(affected)


# ---------------------------------------------------------------------------
# Search-result clustering — solr/contrib/clustering
# (CarrotClusteringEngine.java): group the result set of a query into
# labeled topical clusters. Full Lingo does SVD over the term-doc matrix;
# this row implements the label-assignment core with pinned topic lexicons
# (deterministic, so both engines agree exactly): for each doc matching the
# query, score each topic by the number of its lexicon terms' occurrences,
# assign argmax (score>0, ties -> lexicographically first topic), emit
# cluster sizes. Spark shape: one tokenize pass, per-topic occurrence counts
# as array-filter expressions (JVM-side, no UDF), one tiny groupBy.
# ---------------------------------------------------------------------------

_TOPICS: dict[str, tuple[str, ...]] = {
    "joins": ("join", "merge", "hash"),
    "scans": ("scan", "table", "row"),
    "streams": ("stream", "batch", "window"),
}


def _topic_score_sql(name: str) -> str:
    return (
        "("
        + " + ".join(
            f"len(list_filter(t, x -> x = '{term}'))" for term in _TOPICS[name]
        )
        + f") AS {name}"
    )


@register(
    "result_clustering",
    f"""WITH {_TOKARR_CTE},
scored AS (SELECT doc_id, {_topic_score_sql('joins')}, {_topic_score_sql('scans')},
           {_topic_score_sql('streams')} FROM tokarr
           WHERE len(list_filter(t, x -> x = 'spark')) > 0),
assigned AS (
  SELECT doc_id, greatest(joins, scans, streams) AS sc,
         CASE WHEN joins >= scans AND joins >= streams THEN 'joins'
              WHEN scans >= streams THEN 'scans'
              ELSE 'streams' END AS cluster
  FROM scored)
SELECT cluster, count(*)::BIGINT AS n_docs
FROM assigned WHERE sc > 0 GROUP BY cluster ORDER BY n_docs DESC, cluster""",
)
def result_clustering(spark, sf_dir):
    """Cluster the 'spark' result set into labeled topics (Lingo-lite)."""
    toks = _tokens(spark, sf_dir)
    matched = toks.filter(F.array_contains("tokens", "spark"))
    def _count(term):
        return F.size(F.filter("tokens", lambda x: x == F.lit(term)))

    score_cols = [
        sum(_count(t) for t in terms).alias(name)
        for name, terms in sorted(_TOPICS.items())
    ]
    scored = matched.select("doc_id", *score_cols)
    names = sorted(_TOPICS)
    # array_max on structs compares fields left-to-right: highest score first;
    # inv inverts the name ordering so ties pin to the lexicographically
    # FIRST topic, matching the oracle's CASE chain.
    pairs_tiefix = F.array(
        *[
            F.struct(
                F.col(n).alias("sc"),
                F.lit(len(names) - i).alias("inv"),
                F.lit(n).alias("tn"),
            )
            for i, n in enumerate(names)
        ]
    )
    best = F.array_max(pairs_tiefix)
    assigned = scored.select(
        "doc_id", best.getField("sc").alias("sc"), best.getField("tn").alias("cluster")
    ).filter(F.col("sc") > 0)
    return (
        assigned.groupBy("cluster")
        .agg(F.count("*").alias("n_docs"))
        .orderBy(F.desc("n_docs"), "cluster")
    )
