"""Driver-facing query catalog: Spark implementations + DuckDB oracle SQL.

Every entry re-expresses an operator from SURVEY.md §2 (reference path cited
per entry) over the driver testdata tables. Spark results and oracle SQL use
IDENTICAL column names/aliases and, where floating point is involved,
matched double-precision formulas with rounding to absorb summation-order
drift (the engine's float32/Lucene-parity path is tested separately in
pytest against tests/oracle.py).

Conventions:
- each Spark callable: (spark, sf_dir) -> DataFrame
- money sums go through DECIMAL(18,2) casts in BOTH engines (exact, no drift)
- timestamps are exported as epoch-derived BIGINTs (tz-safe across engines)
"""

from __future__ import annotations

from typing import Callable

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.analysis import duckdb_tokenize_sql, tokenize_text, tokenize_udf
from ..functions.smallfloat import duckdb_byte4_roundtrip_sql

K1, B = 1.2, 0.75

REGISTRY: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
ORACLES: dict[str, str] = {}


def register(name: str, sql: str | None = None):
    def deco(fn):
        REGISTRY[name] = fn
        if sql is not None:
            ORACLES[name] = sql
        return fn

    return deco


# ---------------------------------------------------------------------------
# shared: tokenized documents (cached per sf_dir within a session)
# ---------------------------------------------------------------------------

_TOK_CACHE: dict[str, DataFrame] = {}


def _tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents with engine-tokenized ``tokens`` column (persisted)."""
    key = sf_dir
    if key not in _TOK_CACHE:
        d = spark.read.parquet(f"{sf_dir}/documents.parquet")
        t = d.select(
            "doc_id", "text", "lang", tokenize_udf(F.col("text")).alias("tokens")
        ).persist()
        _TOK_CACHE[key] = t
    return _TOK_CACHE[key]


def _read(spark: SparkSession, sf_dir: str, table: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{table}.parquet")


# SQL fragment: tokenized documents as (doc_id, term) rows
_TOKS_CTE = (
    f"toks AS (SELECT doc_id, unnest({duckdb_tokenize_sql('text')}) AS term "
    "FROM documents)"
)

# Spark-SQL mirror of the byte4 norm roundtrip (shiftleft/shiftright fns;
# DuckDB side uses << >> operators — see functions/smallfloat.py)
def _spark_byte4_sql(dl: str) -> str:
    j = f"(({dl}) - 24)"
    s = f"(CAST(floor(log2({j})) AS BIGINT) - 3)"
    return (
        f"(CASE WHEN ({dl}) < 32 THEN ({dl}) "
        f"ELSE 24 + shiftleft((shiftright({j}, CAST({s} AS INT)) & 7) | 8, CAST({s} AS INT)) END)"
    )


# ---------------------------------------------------------------------------
# BM25 (double-precision cross-engine variant of the scoring path;
# reference: search/similarities/BM25Similarity.java + TopScoreDocCollector)
# ---------------------------------------------------------------------------

def _bm25_spark(spark, sf_dir, terms: list[str], k: int, conj: bool) -> DataFrame:
    toks = _tokens(spark, sf_dir)
    dl = toks.select("doc_id", F.size("tokens").alias("dl"))
    stats = dl.agg(
        F.count("*").cast("double").alias("n_total"),
        (F.sum("dl") / F.count("*")).alias("avgdl"),
    )
    tf = (
        toks.select("doc_id", F.explode("tokens").alias("term"))
        .filter(F.col("term").isin(terms))
        .groupBy("doc_id", "term")
        .agg(F.count("*").cast("double").alias("freq"))
    )
    dft = tf.groupBy("term").agg(F.count("*").cast("double").alias("dft"))
    dlq = F.expr(_spark_byte4_sql("dl")).cast("double")
    scored = (
        tf.join(dft, "term")
        .join(dl, "doc_id")
        .crossJoin(F.broadcast(stats))
        .withColumn("dlq", dlq)
        .withColumn(
            "contrib",
            F.log(1.0 + (F.col("n_total") - F.col("dft") + 0.5) / (F.col("dft") + 0.5))
            * F.col("freq")
            / (
                F.col("freq")
                + K1 * ((1 - B) + B * F.col("dlq") / F.col("avgdl"))
            ),
        )
    )
    agg = scored.groupBy("doc_id").agg(
        F.round(F.sum("contrib"), 6).alias("score"),
        F.count("*").alias("nmatch"),
    )
    if conj:
        agg = agg.filter(F.col("nmatch") == len(terms))
    return (
        agg.select("doc_id", "score")
        .orderBy(F.desc("score"), F.asc("doc_id"))
        .limit(k)
    )


def _bm25_sql(terms: list[str], k: int, conj: bool) -> str:
    tl = ", ".join(f"'{t}'" for t in terms)
    dlq = duckdb_byte4_roundtrip_sql("dl.dl")
    having = f"HAVING count(*) = {len(terms)}" if conj else ""
    return f"""
WITH {_TOKS_CTE},
dl AS (SELECT d.doc_id, coalesce(t.c, 0) AS dl
       FROM documents d LEFT JOIN (SELECT doc_id, count(*) AS c FROM toks GROUP BY 1) t USING (doc_id)),
stats AS (SELECT count(*)::DOUBLE AS n_total, sum(dl)/count(*) AS avgdl FROM dl),
tf AS (SELECT doc_id, term, count(*)::DOUBLE AS freq FROM toks WHERE term IN ({tl}) GROUP BY 1, 2),
dft AS (SELECT term, count(*)::DOUBLE AS dft FROM tf GROUP BY 1),
scored AS (
  SELECT tf.doc_id,
         ln(1.0 + (s.n_total - dft.dft + 0.5)/(dft.dft + 0.5))
           * tf.freq / (tf.freq + {K1} * ((1 - {B}) + {B} * ({dlq})::DOUBLE / s.avgdl)) AS contrib
  FROM tf JOIN dft USING (term) JOIN dl ON tf.doc_id = dl.doc_id CROSS JOIN stats s)
SELECT doc_id, round(sum(contrib), 6) AS score
FROM scored GROUP BY doc_id {having}
ORDER BY score DESC, doc_id ASC LIMIT {k}
"""


_FLAGSHIP_TERMS = sorted(set(tokenize_text("spark join order batch window")))


@register("bm25_topk_disjunction", _bm25_sql(_FLAGSHIP_TERMS, 10, False))
def bm25_topk_disjunction(spark, sf_dir):
    """Top-k BM25 OR-query (search/TopScoreDocCollector.java + BM25Similarity)."""
    return _bm25_spark(spark, sf_dir, _FLAGSHIP_TERMS, 10, False)


_SINGLE = sorted(set(tokenize_text("merge")))


@register("bm25_term_query", _bm25_sql(_SINGLE, 10, False))
def bm25_term_query(spark, sf_dir):
    """TermQuery -> TermScorer (search/TermQuery.java)."""
    return _bm25_spark(spark, sf_dir, _SINGLE, 10, False)


_CONJ = sorted(set(tokenize_text("table scan filter")))


@register("bm25_conjunction", _bm25_sql(_CONJ, 10, True))
def bm25_conjunction(spark, sf_dir):
    """BooleanQuery MUST clauses -> ConjunctionDISI (search/ConjunctionDISI.java)."""
    return _bm25_spark(spark, sf_dir, _CONJ, 10, True)


# ---------------------------------------------------------------------------
# Boolean query tree (search/BooleanQuery.java, Boolean2ScorerSupplier.java,
# BoostQuery.java): MUST 'spark', SHOULD 'join'^2.0 + 'order', MUST_NOT
# 'window'. Engine-path float32 parity is pytest-pinned (test_boolquery.py);
# this catalog entry is the double-precision cross-engine variant.
# ---------------------------------------------------------------------------

_BOOL_TERMS = ["join", "order", "spark", "window"]


def _contrib_cte(terms: list[str]) -> str:
    """DuckDB CTE chain ending in scored(doc_id, term, contrib)."""
    tl = ", ".join(f"'{t}'" for t in terms)
    dlq = duckdb_byte4_roundtrip_sql("dl.dl")
    return f"""{_TOKS_CTE},
dl AS (SELECT d.doc_id, coalesce(t.c, 0) AS dl
       FROM documents d LEFT JOIN (SELECT doc_id, count(*) AS c FROM toks GROUP BY 1) t USING (doc_id)),
stats AS (SELECT count(*)::DOUBLE AS n_total, sum(dl)/count(*) AS avgdl FROM dl),
tf AS (SELECT doc_id, term, count(*)::DOUBLE AS freq FROM toks WHERE term IN ({tl}) GROUP BY 1, 2),
dft AS (SELECT term, count(*)::DOUBLE AS dft FROM tf GROUP BY 1),
scored AS (
  SELECT tf.doc_id, tf.term,
         ln(1.0 + (s.n_total - dft.dft + 0.5)/(dft.dft + 0.5))
           * tf.freq / (tf.freq + {K1} * ((1 - {B}) + {B} * ({dlq})::DOUBLE / s.avgdl)) AS contrib
  FROM tf JOIN dft USING (term) JOIN dl ON tf.doc_id = dl.doc_id CROSS JOIN stats s)"""


def _contrib_spark(spark, sf_dir, terms: list[str]) -> DataFrame:
    """Spark mirror of _contrib_cte: (doc_id, term, contrib) rows."""
    toks = _tokens(spark, sf_dir)
    dl = toks.select("doc_id", F.size("tokens").alias("dl"))
    stats = dl.agg(
        F.count("*").cast("double").alias("n_total"),
        (F.sum("dl") / F.count("*")).alias("avgdl"),
    )
    tf = (
        toks.select("doc_id", F.explode("tokens").alias("term"))
        .filter(F.col("term").isin(terms))
        .groupBy("doc_id", "term")
        .agg(F.count("*").cast("double").alias("freq"))
    )
    dft = tf.groupBy("term").agg(F.count("*").cast("double").alias("dft"))
    return (
        tf.join(dft, "term")
        .join(dl, "doc_id")
        .crossJoin(F.broadcast(stats))
        .withColumn("dlq", F.expr(_spark_byte4_sql("dl")).cast("double"))
        .select(
            "doc_id",
            "term",
            (
                F.log(1.0 + (F.col("n_total") - F.col("dft") + 0.5) / (F.col("dft") + 0.5))
                * F.col("freq")
                / (F.col("freq") + K1 * ((1 - B) + B * F.col("dlq") / F.col("avgdl")))
            ).alias("contrib"),
        )
    )


@register(
    "bm25_boolean_tree",
    f"""WITH {_contrib_cte(_BOOL_TERMS)},
piv AS (SELECT doc_id,
               sum(CASE WHEN term = 'spark' THEN contrib END) AS c_spark,
               sum(CASE WHEN term = 'join' THEN contrib END) AS c_join,
               sum(CASE WHEN term = 'order' THEN contrib END) AS c_order,
               max(CASE WHEN term = 'window' THEN 1 ELSE 0 END) AS has_excl
        FROM scored GROUP BY doc_id)
SELECT doc_id,
       round(c_spark + coalesce(2.0 * c_join, 0.0) + coalesce(c_order, 0.0), 6) AS score
FROM piv WHERE c_spark IS NOT NULL AND has_excl = 0
ORDER BY score DESC, doc_id ASC LIMIT 10""",
)
def bm25_boolean_tree(spark, sf_dir):
    """Nested BooleanQuery: +spark (join^2.0 order) -window."""
    piv = (
        _contrib_spark(spark, sf_dir, _BOOL_TERMS)
        .groupBy("doc_id")
        .agg(
            F.sum(F.when(F.col("term") == "spark", F.col("contrib"))).alias("c_spark"),
            F.sum(F.when(F.col("term") == "join", F.col("contrib"))).alias("c_join"),
            F.sum(F.when(F.col("term") == "order", F.col("contrib"))).alias("c_order"),
            F.max(F.when(F.col("term") == "window", 1).otherwise(0)).alias("has_excl"),
        )
    )
    return (
        piv.filter(F.col("c_spark").isNotNull() & (F.col("has_excl") == 0))
        .select(
            "doc_id",
            F.round(
                F.col("c_spark")
                + F.coalesce(2.0 * F.col("c_join"), F.lit(0.0))
                + F.coalesce(F.col("c_order"), F.lit(0.0)),
                6,
            ).alias("score"),
        )
        .orderBy(F.desc("score"), F.asc("doc_id"))
        .limit(10)
    )


_MSM_TERMS = ["batch", "join", "order", "stream"]


@register(
    "bm25_min_should_match",
    f"""WITH {_contrib_cte(_MSM_TERMS)}
SELECT doc_id, round(sum(contrib), 6) AS score
FROM scored GROUP BY doc_id HAVING count(*) >= 2
ORDER BY score DESC, doc_id ASC LIMIT 10""",
)
def bm25_min_should_match(spark, sf_dir):
    """minimumNumberShouldMatch=2 of 4 SHOULD terms
    (search/MinShouldMatchSumScorer.java)."""
    return (
        _contrib_spark(spark, sf_dir, _MSM_TERMS)
        .groupBy("doc_id")
        .agg(F.round(F.sum("contrib"), 6).alias("score"), F.count("*").alias("nmatch"))
        .filter(F.col("nmatch") >= 2)
        .select("doc_id", "score")
        .orderBy(F.desc("score"), F.asc("doc_id"))
        .limit(10)
    )


# ---------------------------------------------------------------------------
# Boolean filters / term-level scans (terms-dict access paths)
# ---------------------------------------------------------------------------

@register(
    "term_query_count",
    f"""WITH {_TOKS_CTE}
SELECT count(DISTINCT doc_id) AS n_docs FROM toks WHERE term = 'merge'""",
)
def term_query_count(spark, sf_dir):
    """TermQuery as a counting filter."""
    toks = _tokens(spark, sf_dir)
    return (
        toks.select("doc_id", F.explode("tokens").alias("term"))
        .filter(F.col("term") == "merge")
        .agg(F.countDistinct("doc_id").alias("n_docs"))
    )


@register(
    "term_in_set_by_lang",
    f"""WITH {_TOKS_CTE},
m AS (SELECT DISTINCT doc_id FROM toks WHERE term IN ('batch', 'stream', 'vector'))
SELECT d.lang AS lang, count(*) AS n_docs FROM documents d JOIN m USING (doc_id)
GROUP BY d.lang ORDER BY lang""",
)
def term_in_set_by_lang(spark, sf_dir):
    """TermInSetQuery (search/TermInSetQuery.java) -> semi-join + facet."""
    toks = _tokens(spark, sf_dir)
    docs = _read(spark, sf_dir, "documents")
    m = (
        toks.select("doc_id", F.explode("tokens").alias("term"))
        .filter(F.col("term").isin(["batch", "stream", "vector"]))
        .select("doc_id")
        .distinct()
    )
    return (
        docs.join(m, "doc_id", "left_semi")
        .groupBy("lang")
        .agg(F.count("*").alias("n_docs"))
        .orderBy("lang")
    )


@register(
    "must_not_exclusion",
    f"""WITH {_TOKS_CTE},
req AS (SELECT DISTINCT doc_id FROM toks WHERE term = 'spark'),
excl AS (SELECT DISTINCT doc_id FROM toks WHERE term = 'window')
SELECT count(*) AS n_docs FROM req WHERE doc_id NOT IN (SELECT doc_id FROM excl)""",
)
def must_not_exclusion(spark, sf_dir):
    """BooleanQuery MUST_NOT -> ReqExclScorer (search/ReqExclScorer.java): anti-join."""
    toks = _tokens(spark, sf_dir).select("doc_id", F.explode("tokens").alias("term"))
    req = toks.filter(F.col("term") == "spark").select("doc_id").distinct()
    excl = toks.filter(F.col("term") == "window").select("doc_id").distinct()
    return req.join(excl, "doc_id", "left_anti").agg(F.count("*").alias("n_docs"))


@register(
    "prefix_query_terms",
    f"""WITH {_TOKS_CTE}
SELECT term, count(DISTINCT doc_id) AS df FROM toks WHERE term LIKE 's%'
GROUP BY term ORDER BY term""",
)
def prefix_query_terms(spark, sf_dir):
    """PrefixQuery (search/PrefixQuery.java): terms-dict range scan + df."""
    toks = _tokens(spark, sf_dir)
    return (
        toks.select("doc_id", F.explode("tokens").alias("term"))
        .filter(F.col("term").startswith("s"))
        .groupBy("term")
        .agg(F.countDistinct("doc_id").alias("df"))
        .orderBy("term")
    )


@register(
    "fuzzy_query_terms",
    f"""WITH {_TOKS_CTE}
SELECT DISTINCT term FROM toks WHERE levenshtein(term, 'sart') <= 1 ORDER BY term""",
)
def fuzzy_query_terms(spark, sf_dir):
    """FuzzyQuery (search/FuzzyQuery.java + LevenshteinAutomata): edit-distance
    scan of the terms dict (built-in levenshtein, JVM-side). Probe 'sart' has
    two real <=1-edit neighbors in the corpus vocab ('part', 'sort') so the
    result is non-vacuous."""
    toks = _tokens(spark, sf_dir)
    return (
        toks.select(F.explode("tokens").alias("term"))
        .distinct()
        .filter(F.levenshtein(F.col("term"), F.lit("sart")) <= 1)
        .orderBy("term")
    )


@register(
    "wildcard_query_terms",
    f"""WITH {_TOKS_CTE}
SELECT term, count(*) AS ttf FROM toks WHERE regexp_matches(term, '^s.*k$')
GROUP BY term ORDER BY term""",
)
def wildcard_query_terms(spark, sf_dir):
    """WildcardQuery/RegexpQuery (search/WildcardQuery.java, util/automaton):
    s*k pattern over the terms dict."""
    toks = _tokens(spark, sf_dir)
    return (
        toks.select(F.explode("tokens").alias("term"))
        .filter(F.col("term").rlike("^s.*k$"))
        .groupBy("term")
        .agg(F.count("*").alias("ttf"))
        .orderBy("term")
    )


def _phrase_freq_col(tokens_col: str, seq: list[str]):
    """Exact-phrase occurrence count inside one row's token array, built
    from higher-order array functions (filter over start indices) — stays
    in whole-stage codegen, no explode, no join."""
    n = len(seq)
    toks = F.col(tokens_col)

    def starts_match(i):
        c = None
        for j, t in enumerate(seq):
            e = F.element_at(toks, (i + F.lit(j)).cast("int")) == t
            c = e if c is None else (c & e)
        return c

    return F.when(
        F.size(toks) >= n,
        F.size(F.filter(F.sequence(F.lit(1), F.size(toks) - (n - 1)), starts_match)),
    ).otherwise(F.lit(0))


@register(
    "phrase_query",
    f"""WITH tokarr AS (SELECT doc_id, {duckdb_tokenize_sql('text')} AS toks FROM documents),
pos AS (SELECT doc_id, unnest(toks) AS term, generate_subscripts(toks, 1) AS pos FROM tokarr)
SELECT count(DISTINCT a.doc_id) AS n_docs
FROM pos a JOIN pos b ON a.doc_id = b.doc_id AND b.pos = a.pos + 1
WHERE a.term = 'key' AND b.term = 'order'""",
)
def phrase_query(spark, sf_dir):
    """PhraseQuery exact (search/PhraseQuery.java, ExactPhraseMatcher).
    Spark side: per-row array lambda over the token array — adjacency is
    checked inside the row (higher-order functions, whole-stage codegen),
    no posexplode self-join, no shuffle before the final count."""
    toks = _tokens(spark, sf_dir)
    return toks.agg(
        F.sum((_phrase_freq_col("tokens", ["key", "order"]) > 0).cast("long")).alias(
            "n_docs"
        )
    )


@register(
    "phrase_bm25_topk",
    f"""WITH tokarr AS (SELECT doc_id, {duckdb_tokenize_sql('text')} AS toks FROM documents),
stats AS (SELECT count(*)::DOUBLE AS n_total, avg(len(toks))::DOUBLE AS avgdl FROM tokarr),
dl AS (SELECT doc_id, len(toks) AS dl FROM tokarr),
pos AS (SELECT doc_id, unnest(toks) AS term, generate_subscripts(toks, 1) AS pos FROM tokarr),
dft AS (SELECT term, count(DISTINCT doc_id)::DOUBLE AS dft FROM pos
        WHERE term IN ('key', 'order') GROUP BY term),
idf AS (SELECT sum(ln(1 + (s.n_total - d.dft + 0.5) / (d.dft + 0.5))) AS idf_sum
        FROM dft d CROSS JOIN stats s),
ph AS (SELECT a.doc_id, count(*)::DOUBLE AS freq
       FROM pos a JOIN pos b ON a.doc_id = b.doc_id AND b.pos = a.pos + 1
       WHERE a.term = 'key' AND b.term = 'order' GROUP BY a.doc_id)
SELECT ph.doc_id AS doc_id,
       round(i.idf_sum * ph.freq
             / (ph.freq + {K1} * ((1 - {B}) + {B} * {duckdb_byte4_roundtrip_sql('dl.dl')} / s.avgdl)),
             6) AS score
FROM ph JOIN dl ON dl.doc_id = ph.doc_id
CROSS JOIN idf i CROSS JOIN stats s
ORDER BY score DESC, doc_id ASC LIMIT 10""",
)
def phrase_bm25_topk(spark, sf_dir):
    """Scored phrase query (search/PhraseQuery.java + PhraseWeight): freq =
    exact-phrase occurrences, idf = sum of the phrase terms' idfs, BM25
    tf_part on the byte4-quantized doc length. Double-precision cross-engine
    variant; the float32 engine path (positional postings table +
    operators/phrase.py) is pinned to tests/oracle.py in pytest.

    Spark plan: one narrow pass computes (dl, phrase freq, term presence)
    per row via array lambdas (whole-stage codegen); a tiny broadcast stats
    row carries n/avgdl/dft — no posexplode, no positional self-join."""
    t0, t1 = "key", "order"
    toks = _tokens(spark, sf_dir)
    base = toks.select(
        "doc_id",
        F.size("tokens").alias("dl"),
        _phrase_freq_col("tokens", [t0, t1]).cast("double").alias("freq"),
        F.array_contains("tokens", t0).cast("long").alias("h0"),
        F.array_contains("tokens", t1).cast("long").alias("h1"),
    )
    stats = base.agg(
        F.count("*").cast("double").alias("n_total"),
        (F.sum("dl") / F.count("*")).alias("avgdl"),
        F.sum("h0").cast("double").alias("dft0"),
        F.sum("h1").cast("double").alias("dft1"),
    ).select(
        "n_total",
        "avgdl",
        (
            F.log(1.0 + (F.col("n_total") - F.col("dft0") + 0.5) / (F.col("dft0") + 0.5))
            + F.log(1.0 + (F.col("n_total") - F.col("dft1") + 0.5) / (F.col("dft1") + 0.5))
        ).alias("idf_sum"),
    )
    dlq = F.expr(_spark_byte4_sql("dl")).cast("double")
    return (
        base.filter(F.col("freq") > 0)
        .crossJoin(F.broadcast(stats))
        .withColumn("dlq", dlq)
        .select(
            "doc_id",
            F.round(
                F.col("idf_sum")
                * F.col("freq")
                / (F.col("freq") + K1 * ((1 - B) + B * F.col("dlq") / F.col("avgdl"))),
                6,
            ).alias("score"),
        )
        .orderBy(F.desc("score"), F.asc("doc_id"))
        .limit(10)
    )


@register(
    "phrase_slop_match",
    f"""WITH tokarr AS (SELECT doc_id, {duckdb_tokenize_sql('text')} AS toks FROM documents),
pos AS (SELECT doc_id, unnest(toks) AS term, generate_subscripts(toks, 1) AS pos FROM tokarr)
SELECT count(DISTINCT a.doc_id) AS n_docs
FROM pos a JOIN pos b ON a.doc_id = b.doc_id
WHERE a.term = 'key' AND b.term = 'order' AND abs(b.pos - a.pos - 1) <= 2""",
)
def phrase_slop_match(spark, sf_dir):
    """Sloppy phrase MATCHING (search/SloppyPhraseMatcher.java): docs where
    'key' and 'order' occur with edit distance <= 2 between adjusted
    positions (reordering costs 2, per Lucene). Match semantics only — the
    fractional sloppy-freq SCORING path is the engine's phrase_topk(slop=n),
    pinned to tests/oracle.py in pytest. Spark side: nested array-exists
    lambdas inside the row, no explode/join."""
    slop = 2
    toks_col = F.col("tokens")

    def inner(i):
        return F.exists(
            F.sequence(
                F.greatest(i - 1, F.lit(1)),
                F.least(i + F.lit(1 + slop), F.size(toks_col)),
            ),
            lambda j: (F.element_at(toks_col, j.cast("int")) == "order")
            & (F.abs(j - i - 1) <= slop),
        )

    match = F.when(
        F.size(toks_col) > 0,
        F.exists(
            F.sequence(F.lit(1), F.size(toks_col)),
            lambda i: (F.element_at(toks_col, i.cast("int")) == "key") & inner(i),
        ),
    ).otherwise(F.lit(False))
    return _tokens(spark, sf_dir).agg(F.sum(match.cast("long")).alias("n_docs"))


# ---------------------------------------------------------------------------
# Corpus-stat functions (function queries: docfreq/idf/ttf — SURVEY §2.H)
# ---------------------------------------------------------------------------

@register(
    "term_stats_top20",
    f"""WITH {_TOKS_CTE}
SELECT term, count(DISTINCT doc_id) AS df, count(*) AS ttf
FROM toks GROUP BY term ORDER BY df DESC, term ASC LIMIT 20""",
)
def term_stats_top20(spark, sf_dir):
    """docfreq()/totaltermfreq() value sources (valuesource/DocFreqValueSource
    etc.): the terms-dictionary stats, top-20 by df."""
    toks = _tokens(spark, sf_dir)
    return (
        toks.select("doc_id", F.explode("tokens").alias("term"))
        .groupBy("term")
        .agg(F.countDistinct("doc_id").alias("df"), F.count("*").alias("ttf"))
        .orderBy(F.desc("df"), F.asc("term"))
        .limit(20)
    )


@register(
    "doc_length_norms",
    f"""WITH {_TOKS_CTE},
dl AS (SELECT d.doc_id, coalesce(t.c, 0) AS dl FROM documents d
       LEFT JOIN (SELECT doc_id, count(*) AS c FROM toks GROUP BY 1) t USING (doc_id))
SELECT {duckdb_byte4_roundtrip_sql('dl')} AS dl_bucket, count(*) AS n_docs
FROM dl GROUP BY 1 ORDER BY 1""",
)
def doc_length_norms(spark, sf_dir):
    """Norms (SmallFloat byte4 quantization, util/SmallFloat.java): histogram
    of quantized doc lengths — exercises the norm path cross-engine."""
    toks = _tokens(spark, sf_dir)
    dl = toks.select("doc_id", F.size("tokens").alias("dl"))
    return (
        dl.withColumn("dl_bucket", F.expr(_spark_byte4_sql("dl")))
        .groupBy("dl_bucket")
        .agg(F.count("*").alias("n_docs"))
        .orderBy("dl_bucket")
    )


# ---------------------------------------------------------------------------
# Facets / aggregations (solr facet module — SURVEY §2.E)
# ---------------------------------------------------------------------------

@register(
    "facet_field_top",
    """SELECT event_type, count(*) AS cnt FROM events
GROUP BY event_type ORDER BY cnt DESC, event_type ASC LIMIT 5""",
)
def facet_field_top(spark, sf_dir):
    """Field facet (search/facet/FacetField.java): top-N value counts.
    Spark partial+final agg makes Solr's distributed facet refinement
    (FacetComponent#refine) unnecessary — counts are exact by construction."""
    return (
        _read(spark, sf_dir, "events")
        .groupBy("event_type")
        .agg(F.count("*").alias("cnt"))
        .orderBy(F.desc("cnt"), F.asc("event_type"))
        .limit(5)
    )


@register(
    "facet_range",
    """SELECT CAST(floor(value / 10.0) AS BIGINT) AS bucket, count(*) AS cnt
FROM events GROUP BY 1 ORDER BY 1""",
)
def facet_range(spark, sf_dir):
    """Range facet (search/facet/FacetRange.java): histogram start/gap."""
    return (
        _read(spark, sf_dir, "events")
        .groupBy(F.floor(F.col("value") / 10.0).cast("long").alias("bucket"))
        .agg(F.count("*").alias("cnt"))
        .orderBy("bucket")
    )


@register(
    "facet_query_counts",
    """SELECT
  sum(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END)::BIGINT AS n_error,
  sum(CASE WHEN value > 50 THEN 1 ELSE 0 END)::BIGINT AS n_high,
  count(*) AS n_total
FROM events""",
)
def facet_query_counts(spark, sf_dir):
    """Query facet (search/facet/FacetQuery.java): count per predicate."""
    e = _read(spark, sf_dir, "events")
    return e.agg(
        F.sum(F.when(F.col("event_type") == "error", 1).otherwise(0)).alias("n_error"),
        F.sum(F.when(F.col("value") > 50, 1).otherwise(0)).alias("n_high"),
        F.count("*").alias("n_total"),
    )


@register(
    "stats_component",
    """SELECT l_returnflag,
  count(*) AS cnt,
  round(min(l_extendedprice), 2) AS min_price,
  round(max(l_extendedprice), 2) AS max_price,
  sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS sum_price,
  round(avg(l_quantity), 6) AS avg_qty
FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""",
)
def stats_component(spark, sf_dir):
    """StatsComponent (handler/component/StatsComponent.java): stat bundle.
    Money sums via DECIMAL(18,2) for exact cross-engine equality."""
    li = _read(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_returnflag")
        .agg(
            F.count("*").alias("cnt"),
            F.round(F.min("l_extendedprice"), 2).alias("min_price"),
            F.round(F.max("l_extendedprice"), 2).alias("max_price"),
            F.sum(F.col("l_extendedprice").cast("decimal(18,2)")).alias("sum_price"),
            F.round(F.avg("l_quantity"), 6).alias("avg_qty"),
        )
        .orderBy("l_returnflag")
    )


@register(
    "unique_agg",
    """SELECT count(DISTINCT user_id) AS n_users FROM events WHERE event_type = 'click'""",
)
def unique_agg(spark, sf_dir):
    """unique (exact distinct; search/facet/UniqueAgg.java)."""
    return (
        _read(spark, sf_dir, "events")
        .filter(F.col("event_type") == "click")
        .agg(F.countDistinct("user_id").alias("n_users"))
    )


@register(
    "percentile_agg",
    """SELECT round(quantile_cont(value, 0.5), 6) AS p50,
       round(quantile_cont(value, 0.95), 6) AS p95 FROM events""",
)
def percentile_agg(spark, sf_dir):
    """percentile (search/facet/PercentileAgg.java): exact interpolated
    percentile in both engines (Spark `percentile` == DuckDB quantile_cont)."""
    return _read(spark, sf_dir, "events").agg(
        F.round(F.expr("percentile(value, 0.5)"), 6).alias("p50"),
        F.round(F.expr("percentile(value, 0.95)"), 6).alias("p95"),
    )


@register(
    "hll_approx_distinct",
    """SELECT count(DISTINCT user_id) AS exact_users, true AS within_5pct
FROM events""",
)
def hll_approx_distinct(spark, sf_dir):
    """hll (search/facet/HLLAgg.java): HyperLogLog++ — mergeable across
    partitions like Solr's shard-mergeable HLL. The raw estimate differs by
    engine, so the oracled contract is deterministic: the exact count plus a
    boolean attesting the HLL estimate landed within the 5% error budget
    (HLL++ with default rsd=0.05 — the same mergeable-sketch guarantee Solr's
    HLLAgg documents). Exactness itself is covered by unique_agg."""
    agg = _read(spark, sf_dir, "events").agg(
        F.countDistinct("user_id").alias("exact_users"),
        F.approx_count_distinct("user_id").alias("approx_users"),
    )
    return agg.select(
        "exact_users",
        (
            F.abs(F.col("approx_users") - F.col("exact_users"))
            <= 0.05 * F.col("exact_users")
        ).alias("within_5pct"),
    )


@register(
    "pivot_facet",
    """SELECT event_type, CAST(floor(value / 25.0) AS BIGINT) AS vbucket, count(*) AS cnt
FROM events GROUP BY 1, 2 ORDER BY 1, 2""",
)
def pivot_facet(spark, sf_dir):
    """Pivot/nested facets (handler/component/PivotFacetProcessor.java)."""
    return (
        _read(spark, sf_dir, "events")
        .groupBy(
            "event_type",
            F.floor(F.col("value") / 25.0).cast("long").alias("vbucket"),
        )
        .agg(F.count("*").alias("cnt"))
        .orderBy("event_type", "vbucket")
    )


@register(
    "timeseries_rollup",
    """SELECT floor(epoch(ts))::BIGINT // 3600 AS hour_bucket, event_type,
       count(*) AS cnt, round(sum(value), 4) AS sum_value
FROM events GROUP BY 1, 2 ORDER BY 1, 2""",
)
def timeseries_rollup(spark, sf_dir):
    """timeseries stream (solrj/io/stream/TimeSeriesStream.java): time-bucketed
    rollup; hour buckets exported as epoch-derived BIGINTs (tz-safe)."""
    e = _read(spark, sf_dir, "events")
    return (
        e.groupBy(
            (F.unix_timestamp("ts") / 3600).cast("long").alias("hour_bucket"),
            "event_type",
        )
        .agg(F.count("*").alias("cnt"), F.round(F.sum("value"), 4).alias("sum_value"))
        .orderBy("hour_bucket", "event_type")
    )


# ---------------------------------------------------------------------------
# Grouping / collapse / expand (SURVEY §2.E tail)
# ---------------------------------------------------------------------------

@register(
    "group_topk_per_key",
    """SELECT o_custkey, o_orderkey, o_totalprice FROM (
  SELECT o_custkey, o_orderkey, o_totalprice,
         row_number() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey ASC) AS rn
  FROM orders) WHERE rn <= 2 ORDER BY o_custkey, o_totalprice DESC, o_orderkey""",
)
def group_topk_per_key(spark, sf_dir):
    """Grouping top-N per group (solr/core/.../search/Grouping.java):
    window row_number <= N."""
    o = _read(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(
        F.desc("o_totalprice"), F.asc("o_orderkey")
    )
    return (
        o.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 2)
        .select("o_custkey", "o_orderkey", "o_totalprice")
        .orderBy("o_custkey", F.desc("o_totalprice"), "o_orderkey")
    )


@register(
    "collapse_best_per_group",
    """SELECT o_custkey, o_orderkey AS best_order, o_totalprice AS best_price FROM (
  SELECT *, row_number() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey ASC) AS rn
  FROM orders) WHERE rn = 1 ORDER BY o_custkey""",
)
def collapse_best_per_group(spark, sf_dir):
    """CollapsingQParserPlugin: one doc per group by max sort value."""
    o = _read(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(
        F.desc("o_totalprice"), F.asc("o_orderkey")
    )
    return (
        o.withColumn("rn", F.row_number().over(w))
        .filter("rn = 1")
        .select(
            "o_custkey",
            F.col("o_orderkey").alias("best_order"),
            F.col("o_totalprice").alias("best_price"),
        )
        .orderBy("o_custkey")
    )


# ---------------------------------------------------------------------------
# Joins (lucene/join + solr streaming joins — SURVEY §2.D)
# ---------------------------------------------------------------------------

@register(
    "join_semi_query_time",
    """SELECT c.c_mktsegment AS seg, count(*) AS n_customers FROM customer c
WHERE c.c_custkey IN (SELECT o_custkey FROM orders WHERE o_totalprice > 200000)
GROUP BY 1 ORDER BY 1""",
)
def join_semi_query_time(spark, sf_dir):
    """Query-time join (lucene/join/.../JoinUtil.java, solr {!join}):
    semi-join from matching 'from' docs to 'to' side."""
    c = _read(spark, sf_dir, "customer")
    o = _read(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 200000)
    return (
        c.join(o.select(F.col("o_custkey").alias("c_custkey")), "c_custkey", "left_semi")
        .groupBy(F.col("c_mktsegment").alias("seg"))
        .agg(F.count("*").alias("n_customers"))
        .orderBy("seg")
    )


@register(
    "block_join_parent_child",
    """SELECT o.o_orderkey, round(max(l.l_extendedprice), 2) AS max_child,
       round(avg(l.l_quantity), 6) AS avg_child_qty, count(*) AS n_children
FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
WHERE l.l_discount > 0.05 GROUP BY 1 ORDER BY max_child DESC, o_orderkey LIMIT 25""",
)
def block_join_parent_child(spark, sf_dir):
    """ToParentBlockJoinQuery (lucene/join): child matches aggregated to
    parent, ScoreMode max/avg analogs."""
    o = _read(spark, sf_dir, "orders")
    li = _read(spark, sf_dir, "lineitem").filter(F.col("l_discount") > 0.05)
    return (
        o.join(li, o.o_orderkey == li.l_orderkey)
        .groupBy("o_orderkey")
        .agg(
            F.round(F.max("l_extendedprice"), 2).alias("max_child"),
            F.round(F.avg("l_quantity"), 6).alias("avg_child_qty"),
            F.count("*").alias("n_children"),
        )
        .orderBy(F.desc("max_child"), F.asc("o_orderkey"))
        .limit(25)
    )


@register(
    "complement_anti_join",
    """SELECT count(*) AS n_customers FROM customer
WHERE c_custkey NOT IN (SELECT o_custkey FROM orders)""",
)
def complement_anti_join(spark, sf_dir):
    """complement stream (solrj/io/stream/ComplementStream.java): anti-join."""
    c = _read(spark, sf_dir, "customer")
    o = _read(spark, sf_dir, "orders").select(F.col("o_custkey").alias("c_custkey"))
    return c.join(o, "c_custkey", "left_anti").agg(F.count("*").alias("n_customers"))


@register(
    "hash_join_enrich",
    """SELECT n.n_name AS nation, count(*) AS n_customers,
       round(sum(c.c_acctbal), 2) AS sum_bal
FROM customer c JOIN nation n ON c.c_nationkey = n.n_nationkey
GROUP BY 1 ORDER BY 1""",
)
def hash_join_enrich(spark, sf_dir):
    """hashJoin stream (solrj/io/stream/HashJoinStream.java): broadcast hash
    join against the small dimension — F.broadcast is the explicit analog.

    No decimal anywhere in the output row: the driver hashes cell
    representations, and Decimal('…30') != float …3 even when the values
    are exactly equal.  Both engines emit round(sum, 2) as DOUBLE — exact
    to the cent at these magnitudes.
    """
    c = _read(spark, sf_dir, "customer")
    n = _read(spark, sf_dir, "nation")
    return (
        c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy(F.col("n_name").alias("nation"))
        .agg(
            F.count("*").alias("n_customers"),
            F.round(F.sum(F.col("c_acctbal").cast("decimal(18,2)")), 2)
            .cast("double")
            .alias("sum_bal"),
        )
        .orderBy("nation")
    )


# ---------------------------------------------------------------------------
# Scans / sorts / export (SURVEY §2.B, §2.G)
# ---------------------------------------------------------------------------

@register(
    "point_range_query",
    """SELECT count(*) AS n_rows, sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS sum_price
FROM lineitem WHERE l_shipdate >= '1995-01-01' AND l_shipdate < '1996-01-01'
  AND l_quantity BETWEEN 10 AND 20""",
)
def point_range_query(spark, sf_dir):
    """PointRangeQuery (search/PointRangeQuery.java / BKD tree): numeric+date
    range — parquet min/max pushdown is the BKD analog."""
    li = _read(spark, sf_dir, "lineitem")
    return (
        li.filter(
            (F.col("l_shipdate") >= "1995-01-01")
            & (F.col("l_shipdate") < "1996-01-01")
            & F.col("l_quantity").between(10, 20)
        ).agg(
            F.count("*").alias("n_rows"),
            F.sum(F.col("l_extendedprice").cast("decimal(18,2)")).alias("sum_price"),
        )
    )


@register(
    "export_sorted_scan",
    """SELECT o_orderkey, o_custkey, floor(epoch(o_orderdate))::BIGINT AS order_epoch
FROM orders ORDER BY o_orderdate DESC, o_orderkey ASC LIMIT 100""",
)
def export_sorted_scan(spark, sf_dir):
    """Export handler (solr/core/.../handler/export/ExportWriter.java):
    sorted full scan with limit -> TakeOrderedAndProject."""
    o = _read(spark, sf_dir, "orders")
    return (
        o.select(
            "o_orderkey",
            "o_custkey",
            F.unix_timestamp("o_orderdate").alias("order_epoch"),
        )
        .orderBy(F.desc("order_epoch"), F.asc("o_orderkey"))
        .limit(100)
    )


@register(
    "match_all_count",
    """SELECT count(*) AS n_docs FROM documents""",
)
def match_all_count(spark, sf_dir):
    """MatchAllDocsQuery (search/MatchAllDocsQuery.java)."""
    return _read(spark, sf_dir, "documents").agg(F.count("*").alias("n_docs"))


@register(
    "json_path_extract",
    """SELECT CAST(json_extract(props, '$.k') AS BIGINT) % 10 AS k_mod, count(*) AS cnt
FROM events GROUP BY 1 ORDER BY 1""",
)
def json_path_extract(spark, sf_dir):
    """JSON field access (Solr nested docs / dynamic fields analog; Spark
    get_json_object) over events.props."""
    e = _read(spark, sf_dir, "events")
    return (
        e.groupBy(
            (F.get_json_object("props", "$.k").cast("long") % 10).alias("k_mod")
        )
        .agg(F.count("*").alias("cnt"))
        .orderBy("k_mod")
    )
