"""Additional Solr/Lucene operator coverage for the driver catalog.

Each entry re-expresses a reference operator (SURVEY.md §2, path cited per
entry) over the driver testdata with a DuckDB oracle using identical column
aliases. Registered into the same REGISTRY/ORACLES as driver_queries.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from ..functions.analysis import duckdb_tokenize_sql, shingles, tokenize_udf
from ..functions.smallfloat import duckdb_byte4_roundtrip_sql
from .driver_queries import (
    _TOKS_CTE,
    _phrase_freq_col,
    _read,
    _spark_byte4_sql,
    _tokens,
    B,
    K1,
    register,
)

# ---------------------------------------------------------------------------
# Re-rank (search/ReRankQParserPlugin.java; LTR re-scoring shape):
# first pass ranks by tf('order'), the top-50 are re-scored by adding
# 2 * tf('batch'); everything below the re-rank window keeps its score.
# Integer tfs -> exact cross-engine equality.
# ---------------------------------------------------------------------------


@register(
    "rerank_topn",
    f"""WITH {_TOKS_CTE},
tf AS (SELECT doc_id,
              sum(CASE WHEN term = 'order' THEN 1 ELSE 0 END)::BIGINT AS tf_first,
              sum(CASE WHEN term = 'batch' THEN 1 ELSE 0 END)::BIGINT AS tf_second
       FROM toks GROUP BY doc_id),
first_pass AS (SELECT doc_id, tf_first, tf_second,
                      row_number() OVER (ORDER BY tf_first DESC, doc_id ASC) AS rnk
               FROM tf WHERE tf_first > 0)
SELECT doc_id,
       CASE WHEN rnk <= 50 THEN tf_first + 2 * tf_second ELSE tf_first END AS score
FROM first_pass
ORDER BY score DESC, doc_id ASC LIMIT 10""",
)
def rerank_topn(spark, sf_dir):
    """ReRankQParserPlugin: re-score only the top-N of the first pass."""
    toks = _tokens(spark, sf_dir)
    tf = toks.select("doc_id", F.explode("tokens").alias("term")).groupBy(
        "doc_id"
    ).agg(
        F.sum(F.when(F.col("term") == "order", 1).otherwise(0)).alias("tf_first"),
        F.sum(F.when(F.col("term") == "batch", 1).otherwise(0)).alias("tf_second"),
    )
    w = Window.orderBy(F.desc("tf_first"), F.asc("doc_id"))
    fp = tf.filter(F.col("tf_first") > 0).withColumn("rnk", F.row_number().over(w))
    return (
        fp.select(
            "doc_id",
            F.when(
                F.col("rnk") <= 50, F.col("tf_first") + 2 * F.col("tf_second")
            )
            .otherwise(F.col("tf_first"))
            .alias("score"),
        )
        .orderBy(F.desc("score"), F.asc("doc_id"))
        .limit(10)
    )


# ---------------------------------------------------------------------------
# searchAfter / cursorMark deep paging (search/IndexSearcher.java#searchAfter,
# solr CursorMark): keyset pagination — page 2 starts strictly after the
# last (n_chars, doc_id) of page 1. No offset scan.
# ---------------------------------------------------------------------------

_PAGE = 20


@register(
    "search_after_page2",
    f"""WITH page1 AS (SELECT n_chars, doc_id FROM documents
                      ORDER BY n_chars DESC, doc_id ASC LIMIT {_PAGE}),
cursor AS (SELECT n_chars AS c_n, doc_id AS c_d FROM page1
           ORDER BY n_chars ASC, doc_id DESC LIMIT 1)
SELECT d.doc_id, d.n_chars FROM documents d, cursor
WHERE d.n_chars < cursor.c_n OR (d.n_chars = cursor.c_n AND d.doc_id > cursor.c_d)
ORDER BY d.n_chars DESC, d.doc_id ASC LIMIT {_PAGE}""",
)
def search_after_page2(spark, sf_dir):
    """searchAfter: page 2 via keyset cursor (FieldDoc after-filter)."""
    d = _read(spark, sf_dir, "documents")
    page1 = d.orderBy(F.desc("n_chars"), F.asc("doc_id")).limit(_PAGE)
    cur = page1.orderBy(F.asc("n_chars"), F.desc("doc_id")).limit(1).collect()[0]
    after = (F.col("n_chars") < cur["n_chars"]) | (
        (F.col("n_chars") == cur["n_chars"]) & (F.col("doc_id") > cur["doc_id"])
    )
    return (
        d.filter(after)
        .select("doc_id", "n_chars")
        .orderBy(F.desc("n_chars"), F.asc("doc_id"))
        .limit(_PAGE)
    )


# ---------------------------------------------------------------------------
# scale() function query (valuesource/ScaleFloatFunction.java): min-max
# normalize a field to [0, 1] — needs one global pass, broadcast back.
# ---------------------------------------------------------------------------


@register(
    "scale_minmax",
    """WITH mm AS (SELECT min(n_chars)::DOUBLE AS mn, max(n_chars)::DOUBLE AS mx
               FROM documents)
SELECT doc_id, round((n_chars - mm.mn) / (mm.mx - mm.mn), 9) AS scaled
FROM documents, mm ORDER BY doc_id LIMIT 100""",
)
def scale_minmax(spark, sf_dir):
    """scale(field, 0, 1): global min/max agg broadcast into the expr."""
    d = _read(spark, sf_dir, "documents")
    mm = d.agg(
        F.min("n_chars").cast("double").alias("mn"),
        F.max("n_chars").cast("double").alias("mx"),
    )
    return (
        d.crossJoin(F.broadcast(mm))
        .select(
            "doc_id",
            F.round(
                (F.col("n_chars") - F.col("mn")) / (F.col("mx") - F.col("mn")), 9
            ).alias("scaled"),
        )
        .orderBy("doc_id")
        .limit(100)
    )


# ---------------------------------------------------------------------------
# Synonym expansion (analysis/synonym/SynonymGraphFilter.java): query-time
# expansion of 'fast' -> {fast, quick, rapid}; docs matching any variant.
# ---------------------------------------------------------------------------

_SYNS = ("fast", "quick", "rapid")


@register(
    "synonym_expand_count",
    f"""WITH {_TOKS_CTE}
SELECT term, count(DISTINCT doc_id) AS df FROM toks
WHERE term IN {str(tuple(_SYNS))} GROUP BY term ORDER BY term""",
)
def synonym_expand_count(spark, sf_dir):
    """SynonymGraphFilter at query time: broadcast synonym set -> union of
    postings (here: df per expanded variant)."""
    toks = _tokens(spark, sf_dir)
    return (
        toks.select("doc_id", F.explode("tokens").alias("term"))
        .filter(F.col("term").isin(list(_SYNS)))
        .groupBy("term")
        .agg(F.countDistinct("doc_id").alias("df"))
        .orderBy("term")
    )


# ---------------------------------------------------------------------------
# Graph traversal (solrj/io/graph/GatherNodesStream.java): iterative
# frontier expansion region -> nations -> customers -> order count.
# ---------------------------------------------------------------------------


@register(
    "graph_gather_nodes",
    """SELECT n.n_name AS nation, count(o.o_orderkey) AS n_orders
FROM region r
JOIN nation n ON n.n_regionkey = r.r_regionkey
JOIN customer c ON c.c_nationkey = n.n_nationkey
JOIN orders o ON o.o_custkey = c.c_custkey
WHERE r.r_name = 'EUROPE'
GROUP BY n.n_name ORDER BY n_orders DESC, nation ASC""",
)
def graph_gather_nodes(spark, sf_dir):
    """gatherNodes: 2-hop frontier expansion as iterative joins (the stream
    walks edges breadth-first; each hop is one equi-join here)."""
    region = _read(spark, sf_dir, "region").filter(F.col("r_name") == "EUROPE")
    frontier = _read(spark, sf_dir, "nation").join(
        F.broadcast(region), F.col("n_regionkey") == F.col("r_regionkey")
    )
    frontier2 = _read(spark, sf_dir, "customer").join(
        F.broadcast(frontier.select("n_nationkey", "n_name")),
        F.col("c_nationkey") == F.col("n_nationkey"),
    )
    return (
        _read(spark, sf_dir, "orders")
        .join(frontier2.select("c_custkey", "n_name"), F.col("o_custkey") == F.col("c_custkey"))
        .groupBy(F.col("n_name").alias("nation"))
        .agg(F.count("o_orderkey").alias("n_orders"))
        .orderBy(F.desc("n_orders"), F.asc("nation"))
    )


# ---------------------------------------------------------------------------
# relatedness() semantic-knowledge-graph agg (search/facet/RelatednessAgg.java):
# significance of each lang bucket w.r.t. foreground (docs containing
# 'order') vs background (all docs), simplified to the documented
# fg_popularity/bg_popularity ratio form with counts (exact integers + one
# rounded ratio).
# ---------------------------------------------------------------------------


@register(
    "relatedness_agg",
    f"""WITH {_TOKS_CTE},
fg AS (SELECT DISTINCT doc_id FROM toks WHERE term = 'order'),
tot AS (SELECT count(*)::DOUBLE AS n FROM documents)
SELECT d.lang AS lang,
       count(*) AS bg_count,
       sum(CASE WHEN fg.doc_id IS NOT NULL THEN 1 ELSE 0 END) AS fg_count,
       round(sum(CASE WHEN fg.doc_id IS NOT NULL THEN 1 ELSE 0 END)::DOUBLE
             / count(*), 9) AS relatedness
FROM documents d LEFT JOIN fg ON d.doc_id = fg.doc_id
GROUP BY d.lang ORDER BY lang""",
)
def relatedness_agg(spark, sf_dir):
    """relatedness(): per-bucket foreground-vs-background significance."""
    d = _read(spark, sf_dir, "documents")
    toks = _tokens(spark, sf_dir)
    fg = (
        toks.select("doc_id", F.explode("tokens").alias("term"))
        .filter(F.col("term") == "order")
        .select("doc_id")
        .distinct()
        .withColumn("is_fg", F.lit(1))
    )
    return (
        d.join(fg, "doc_id", "left")
        .groupBy("lang")
        .agg(
            F.count("*").alias("bg_count"),
            F.sum(F.coalesce(F.col("is_fg"), F.lit(0))).alias("fg_count"),
            F.round(
                F.sum(F.coalesce(F.col("is_fg"), F.lit(0)))
                / F.count("*").cast("double"),
                9,
            ).alias("relatedness"),
        )
        .orderBy("lang")
    )


# ---------------------------------------------------------------------------
# Expand component (handler/component/ExpandComponent.java): after
# collapsing to the best doc per group, re-attach the next members.
# ---------------------------------------------------------------------------


@register(
    "expand_collapsed",
    """WITH ranked AS (SELECT lang, doc_id, n_chars,
        row_number() OVER (PARTITION BY lang ORDER BY n_chars DESC, doc_id ASC) AS rn
 FROM documents)
SELECT lang, doc_id, n_chars, rn FROM ranked WHERE rn BETWEEN 2 AND 3
ORDER BY lang, rn""",
)
def expand_collapsed(spark, sf_dir):
    """ExpandComponent: group heads are rn=1 (the collapse); expand returns
    the following members per group (rn 2..3)."""
    d = _read(spark, sf_dir, "documents")
    w = Window.partitionBy("lang").orderBy(F.desc("n_chars"), F.asc("doc_id"))
    return (
        d.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn").between(2, 3))
        .select("lang", "doc_id", "n_chars", "rn")
        .orderBy("lang", "rn")
    )


# ---------------------------------------------------------------------------
# strdist() (solr ValueSourceParser 'strdist' + FuzzyQuery's Levenshtein):
# built-in levenshtein in both engines.
# ---------------------------------------------------------------------------


@register(
    "strdist_levenshtein",
    """SELECT p_name, levenshtein(p_name, 'steel widget mk3') AS dist
FROM part ORDER BY dist ASC, p_name ASC LIMIT 15""",
)
def strdist_levenshtein(spark, sf_dir):
    """strdist(field, const, edit): closest part names by edit distance."""
    p = _read(spark, sf_dir, "part")
    return (
        p.select("p_name", F.levenshtein("p_name", F.lit("steel widget mk3")).alias("dist"))
        .orderBy(F.asc("dist"), F.asc("p_name"))
        .limit(15)
    )


# ---------------------------------------------------------------------------
# RegexpQuery (search/RegexpQuery.java, util/automaton/RegExp.java): pattern
# over the terms dictionary, then df per matched term.
# ---------------------------------------------------------------------------


@register(
    "regexp_query_terms",
    f"""WITH {_TOKS_CTE}
SELECT term, count(DISTINCT doc_id) AS df FROM toks
WHERE regexp_matches(term, '^w.*w$') GROUP BY term ORDER BY term""",
)
def regexp_query_terms(spark, sf_dir):
    """RegexpQuery: automaton over terms dict -> rlike on the term column."""
    toks = _tokens(spark, sf_dir)
    return (
        toks.select("doc_id", F.explode("tokens").alias("term"))
        .filter(F.col("term").rlike("^w.*w$"))
        .groupBy("term")
        .agg(F.countDistinct("doc_id").alias("df"))
        .orderBy("term")
    )


# ---------------------------------------------------------------------------
# BoostQuery / ConstantScoreQuery (search/BoostQuery.java,
# ConstantScoreQuery.java): score algebra over a base score.
# ---------------------------------------------------------------------------


@register(
    "boost_query",
    f"""WITH {_TOKS_CTE},
tf AS (SELECT doc_id, count(*) AS base FROM toks WHERE term = 'merge' GROUP BY doc_id)
SELECT t.doc_id,
       t.base * (CASE WHEN d.lang = 'en' THEN 2.0 ELSE 1.0 END)::DOUBLE AS score
FROM tf t JOIN documents d ON d.doc_id = t.doc_id
ORDER BY score DESC, t.doc_id ASC LIMIT 20""",
)
def boost_query(spark, sf_dir):
    """BoostQuery: multiply base score; constant per-predicate factor."""
    toks = _tokens(spark, sf_dir)
    d = _read(spark, sf_dir, "documents")
    tf = (
        toks.select("doc_id", F.explode("tokens").alias("term"))
        .filter(F.col("term") == "merge")
        .groupBy("doc_id")
        .agg(F.count("*").alias("base"))
    )
    return (
        tf.join(d.select("doc_id", "lang"), "doc_id")
        .select(
            "doc_id",
            (
                F.col("base")
                * F.when(F.col("lang") == "en", F.lit(2.0)).otherwise(F.lit(1.0))
            ).alias("score"),
        )
        .orderBy(F.desc("score"), F.asc("doc_id"))
        .limit(20)
    )


# ---------------------------------------------------------------------------
# ShingleFilter (analysis/shingle/ShingleFilter.java): top word-bigrams.
# Spark side uses the JVM-side higher-order-function shingles();
# DuckDB mirrors via positional self-join.
# ---------------------------------------------------------------------------


@register(
    "shingle_bigram_top",
    f"""WITH tokarr AS (SELECT doc_id, {duckdb_tokenize_sql('text')} AS toks FROM documents),
pos AS (SELECT doc_id, unnest(toks) AS term, generate_subscripts(toks, 1) AS pos FROM tokarr)
SELECT a.term || ' ' || b.term AS bigram, count(*) AS cnt
FROM pos a JOIN pos b ON a.doc_id = b.doc_id AND b.pos = a.pos + 1
GROUP BY bigram ORDER BY cnt DESC, bigram ASC LIMIT 15""",
)
def shingle_bigram_top(spark, sf_dir):
    """ShingleFilter(n=2): corpus-wide top bigram counts."""
    toks = _tokens(spark, sf_dir)
    return (
        toks.select(F.explode(shingles(F.col("tokens"), 2)).alias("bigram"))
        .groupBy("bigram")
        .agg(F.count("*").alias("cnt"))
        .orderBy(F.desc("cnt"), F.asc("bigram"))
        .limit(15)
    )


# ---------------------------------------------------------------------------
# MoreLikeThis (lucene/queries/.../mlt/MoreLikeThis.java): docs most similar
# to a seed doc by shared distinct terms.
# ---------------------------------------------------------------------------


@register(
    "more_like_this",
    f"""WITH {_TOKS_CTE},
seed AS (SELECT DISTINCT term FROM toks WHERE doc_id = 0),
cand AS (SELECT DISTINCT doc_id, term FROM toks WHERE doc_id <> 0)
SELECT cand.doc_id, count(*) AS shared
FROM cand JOIN seed ON cand.term = seed.term
GROUP BY cand.doc_id ORDER BY shared DESC, doc_id ASC LIMIT 10""",
)
def more_like_this(spark, sf_dir):
    """MoreLikeThis: seed doc's terms as a disjunctive query, ranked by
    shared-term overlap (idf-weighted variant left to the BM25 engine)."""
    toks = _tokens(spark, sf_dir)
    pairs = toks.select("doc_id", F.explode("tokens").alias("term")).distinct()
    seed = pairs.filter(F.col("doc_id") == 0).select("term")
    return (
        pairs.filter(F.col("doc_id") != 0)
        .join(F.broadcast(seed), "term")
        .groupBy("doc_id")
        .agg(F.count("*").alias("shared"))
        .orderBy(F.desc("shared"), F.asc("doc_id"))
        .limit(10)
    )


# ---------------------------------------------------------------------------
# Trivial-gap sweep (VERDICT r01 item 6): TermRangeQuery,
# DocValuesFieldExistsQuery, facet missing/countvals, stddev/variance.
# ---------------------------------------------------------------------------


@register(
    "term_range_query",
    f"""WITH {_TOKS_CTE}
SELECT term, count(DISTINCT doc_id) AS df FROM toks
WHERE term >= 'scan' AND term < 'stream' GROUP BY term ORDER BY term""",
)
def term_range_query(spark, sf_dir):
    """TermRangeQuery (search/TermRangeQuery.java): [lo, hi) scan of the
    sorted terms dict + per-term df. The engine analog is
    Searcher.topk_term_range (parquet min/max pruning on the sorted terms
    table is the FST range-seek)."""
    toks = _tokens(spark, sf_dir)
    return (
        toks.select("doc_id", F.explode("tokens").alias("term"))
        .filter((F.col("term") >= "scan") & (F.col("term") < "stream"))
        .groupBy("term")
        .agg(F.countDistinct("doc_id").alias("df"))
        .orderBy("term")
    )


@register(
    "field_exists_query",
    """SELECT count(*) AS n_docs
FROM (SELECT nullif(event_type, 'error') AS attr FROM events) WHERE attr IS NOT NULL""",
)
def field_exists_query(spark, sf_dir):
    """DocValuesFieldExistsQuery (search/DocValuesFieldExistsQuery.java):
    count docs whose field is present. Testdata has no NULL columns, so both
    engines derive the same nullable field via NULLIF first."""
    e = _read(spark, sf_dir, "events")
    return (
        e.select(F.nullif(F.col("event_type"), F.lit("error")).alias("attr"))
        .filter(F.col("attr").isNotNull())
        .agg(F.count("*").alias("n_docs"))
    )


@register(
    "missing_countvals_agg",
    """SELECT event_type,
       count(v) AS countvals,
       count(*) - count(v) AS missing
FROM (SELECT event_type, CASE WHEN value > 90 THEN NULL ELSE value END AS v
      FROM events) GROUP BY event_type ORDER BY event_type""",
)
def missing_countvals_agg(spark, sf_dir):
    """JSON facet missing/countvals aggregates (search/facet/MissingAgg.java,
    CountValsAgg.java) over a derived nullable field (identical CASE in both
    engines — testdata has no native NULLs)."""
    e = _read(spark, sf_dir, "events").select(
        "event_type",
        F.when(F.col("value") > 90, None).otherwise(F.col("value")).alias("v"),
    )
    return (
        e.groupBy("event_type")
        .agg(
            F.count("v").alias("countvals"),
            (F.count("*") - F.count("v")).alias("missing"),
        )
        .orderBy("event_type")
    )


@register(
    "stddev_variance_agg",
    """SELECT event_type,
       round(stddev_samp(value), 6) AS stddev_v,
       round(var_samp(value), 6) AS variance_v
FROM events GROUP BY event_type ORDER BY event_type""",
)
def stddev_variance_agg(spark, sf_dir):
    """JSON facet stddev/variance aggregates (search/facet/StddevAgg.java,
    VarianceAgg.java): sample stddev/variance per facet bucket, rounded to
    absorb summation-order drift."""
    e = _read(spark, sf_dir, "events")
    return (
        e.groupBy("event_type")
        .agg(
            F.round(F.stddev_samp("value"), 6).alias("stddev_v"),
            F.round(F.var_samp("value"), 6).alias("variance_v"),
        )
        .orderBy("event_type")
    )


# ---------------------------------------------------------------------------
# Alternative similarities as driver rows (search/similarities/*.java):
# double-precision cross-engine variants; the float32 engine paths
# (operators/similarity.py) are pinned to scalar oracles in pytest.
# dl is byte4-quantized in every formula, exactly as the engine scores.
# ---------------------------------------------------------------------------

from ..functions.smallfloat import duckdb_byte4_roundtrip_sql as _b4_sql
from .driver_queries import _spark_byte4_sql as _b4_spark

_SIM_TERMS = ["join", "order", "spark"]


def _sim_cte(terms: list[str]) -> str:
    tl = ", ".join(f"'{t}'" for t in terms)
    return f"""{_TOKS_CTE},
dl AS (SELECT d.doc_id, coalesce(t.c, 0) AS dl
       FROM documents d LEFT JOIN (SELECT doc_id, count(*) AS c FROM toks GROUP BY 1) t USING (doc_id)),
dlq AS (SELECT doc_id, greatest({_b4_sql('dl.dl')}, 1)::DOUBLE AS dlq FROM dl),
stats AS (SELECT count(*)::DOUBLE AS n_total, sum(dl)::DOUBLE AS total_tokens,
                 sum(dl)::DOUBLE / count(*) AS avgdl FROM dl),
tf AS (SELECT doc_id, term, count(*)::DOUBLE AS freq FROM toks WHERE term IN ({tl}) GROUP BY 1, 2),
ts AS (SELECT term, count(*)::DOUBLE AS dft, sum(freq)::DOUBLE AS ttf FROM tf GROUP BY 1),
base AS (SELECT tf.doc_id, tf.term, tf.freq, ts.dft, ts.ttf, q.dlq,
                s.n_total, s.total_tokens, s.avgdl
         FROM tf JOIN ts USING (term) JOIN dlq q ON q.doc_id = tf.doc_id CROSS JOIN stats s)"""


def _sim_base(spark, sf_dir, terms: list[str]):
    toks = _tokens(spark, sf_dir)
    dl = toks.select("doc_id", F.size("tokens").alias("dl"))
    stats = dl.agg(
        F.count("*").cast("double").alias("n_total"),
        F.sum("dl").cast("double").alias("total_tokens"),
        (F.sum("dl").cast("double") / F.count("*")).alias("avgdl"),
    )
    tf = (
        toks.select("doc_id", F.explode("tokens").alias("term"))
        .filter(F.col("term").isin(terms))
        .groupBy("doc_id", "term")
        .agg(F.count("*").cast("double").alias("freq"))
    )
    ts = tf.groupBy("term").agg(
        F.count("*").cast("double").alias("dft"),
        F.sum("freq").cast("double").alias("ttf"),
    )
    dlq = dl.select(
        "doc_id",
        F.greatest(F.expr(_b4_spark("dl")), F.lit(1)).cast("double").alias("dlq"),
    )
    return (
        tf.join(ts, "term")
        .join(dlq, "doc_id")
        .crossJoin(F.broadcast(stats))
    )


def _sim_topk(base, score_col):
    return (
        base.groupBy("doc_id")
        .agg(F.round(F.sum(score_col), 6).alias("score"))
        .filter(F.col("score") > 0)
        .orderBy(F.desc("score"), F.asc("doc_id"))
        .limit(10)
    )


_SIM_TAIL = """
SELECT doc_id, round(sum(s), 6) AS score FROM scored GROUP BY doc_id
HAVING round(sum(s), 6) > 0 ORDER BY score DESC, doc_id ASC LIMIT 10"""


@register(
    "sim_classic_topk",
    f"""WITH {_sim_cte(_SIM_TERMS)},
scored AS (SELECT doc_id, sqrt(freq) * pow(1.0 + ln((n_total + 1)/(dft + 1)), 2)
                          / sqrt(dlq) AS s FROM base)
{_SIM_TAIL}""",
)
def sim_classic_topk(spark, sf_dir):
    """ClassicSimilarity (TFIDFSimilarity.java): sqrt(tf) * idf^2 / sqrt(dl)."""
    base = _sim_base(spark, sf_dir, _SIM_TERMS)
    s = (
        F.sqrt(F.col("freq"))
        * F.pow(1.0 + F.log((F.col("n_total") + 1) / (F.col("dft") + 1)), 2)
        / F.sqrt(F.col("dlq"))
    )
    return _sim_topk(base, s)


_MU = 2000.0


@register(
    "sim_lmdirichlet_topk",
    f"""WITH {_sim_cte(_SIM_TERMS)},
scored AS (SELECT doc_id,
                  greatest(ln(1 + freq / ({_MU} * ttf / total_tokens))
                           + ln({_MU} / (dlq + {_MU})), 0) AS s FROM base)
{_SIM_TAIL}""",
)
def sim_lmdirichlet_topk(spark, sf_dir):
    """LMDirichletSimilarity: Dirichlet-smoothed QL, mu=2000, clamped at 0."""
    base = _sim_base(spark, sf_dir, _SIM_TERMS)
    s = F.greatest(
        F.log(1.0 + F.col("freq") / (_MU * F.col("ttf") / F.col("total_tokens")))
        + F.log(F.lit(_MU) / (F.col("dlq") + _MU)),
        F.lit(0.0),
    )
    return _sim_topk(base, s)


_LAM = 0.1


@register(
    "sim_lmjelinekmercer_topk",
    f"""WITH {_sim_cte(_SIM_TERMS)},
scored AS (SELECT doc_id,
                  ln(1 + ((1 - {_LAM}) * freq / dlq) / ({_LAM} * ttf / total_tokens)) AS s
           FROM base)
{_SIM_TAIL}""",
)
def sim_lmjelinekmercer_topk(spark, sf_dir):
    """LMJelinekMercerSimilarity: JM-smoothed QL, lambda=0.1."""
    base = _sim_base(spark, sf_dir, _SIM_TERMS)
    s = F.log(
        1.0
        + ((1 - _LAM) * F.col("freq") / F.col("dlq"))
        / (_LAM * F.col("ttf") / F.col("total_tokens"))
    )
    return _sim_topk(base, s)


@register(
    "sim_dfr_inl2_topk",
    f"""WITH {_sim_cte(_SIM_TERMS)},
scored AS (SELECT doc_id,
                  (ln((n_total + 1)/(dft + 0.5)) / ln(2))
                    * (freq * (ln(1 + avgdl / dlq) / ln(2)))
                    / (freq * (ln(1 + avgdl / dlq) / ln(2)) + 1) AS s
           FROM base)
{_SIM_TAIL}""",
)
def sim_dfr_inl2_topk(spark, sf_dir):
    """DFRSimilarity I(n)L2 (BasicModelIn + AfterEffectL + NormalizationH2,
    c=1): tfn = freq*log2(1+avgdl/dl); score = In * tfn/(tfn+1)."""
    base = _sim_base(spark, sf_dir, _SIM_TERMS)
    ln2 = 0.6931471805599453
    tfn = F.col("freq") * (F.log(1.0 + F.col("avgdl") / F.col("dlq")) / ln2)
    s = (F.log((F.col("n_total") + 1) / (F.col("dft") + 0.5)) / ln2) * tfn / (tfn + 1)
    return _sim_topk(base, s)


@register(
    "sim_ib_ll_topk",
    f"""WITH {_sim_cte(_SIM_TERMS)},
scored AS (SELECT doc_id,
                  ln(1 + (freq * (ln(1 + avgdl / dlq) / ln(2)))
                         / ((dft + 1) / (n_total + 1))) AS s
           FROM base)
{_SIM_TAIL}""",
)
def sim_ib_ll_topk(spark, sf_dir):
    """IBSimilarity LL·DF·H2 (DistributionLL + LambdaDF + NormalizationH2,
    c=1): tfn = freq*log2(1+avgdl/dl), lambda = (df+1)/(N+1),
    score = log1p(tfn/lambda). Engine float32 path: similarity.py#IBSimilarity
    (pytest vs scalar oracle); this row is the double-precision mirror."""
    base = _sim_base(spark, sf_dir, _SIM_TERMS)
    ln2 = 0.6931471805599453
    tfn = F.col("freq") * (F.log(1.0 + F.col("avgdl") / F.col("dlq")) / ln2)
    s = F.log(1.0 + tfn / ((F.col("dft") + 1) / (F.col("n_total") + 1)))
    return _sim_topk(base, s)


# ---------------------------------------------------------------------------
# Highlighting (lucene/highlighter/.../UnifiedHighlighter.java): first-hit
# passage of +/-3 tokens with <em> markers. The index-only engine variant
# (snippets reconstructed from positional postings, no stored text) is
# operators/highlight.py, pytest-pinned; this row is the cross-engine
# stored-text variant.
# ---------------------------------------------------------------------------

_HL_TERM = "vector"


@register(
    "highlight_snippets",
    f"""WITH tokarr AS (SELECT doc_id, {duckdb_tokenize_sql('text')} AS t FROM documents),
hit AS (SELECT doc_id, t, list_position(t, '{_HL_TERM}') AS h, len(t) AS n
        FROM tokarr WHERE list_position(t, '{_HL_TERM}') > 0)
SELECT doc_id,
       array_to_string(
         list_transform(t[greatest(h - 3, 1):least(h + 3, n)],
                        x -> CASE WHEN x = '{_HL_TERM}' THEN '<em>' || x || '</em>' ELSE x END),
         ' ') AS snippet
FROM hit ORDER BY doc_id LIMIT 20""",
)
def highlight_snippets(spark, sf_dir):
    """First-passage highlighting via array lambdas (whole-stage codegen:
    array_position + slice + transform, no explode)."""
    toks = _tokens(spark, sf_dir)
    h = F.array_position(F.col("tokens"), _HL_TERM)
    n = F.size("tokens")
    s = F.greatest(h - 3, F.lit(1)).cast("int")
    ln = (F.least(h + 3, n.cast("long")) - s + 1).cast("int")
    snippet = F.array_join(
        F.transform(
            F.slice(F.col("tokens"), s, ln),
            lambda x: F.when(x == _HL_TERM, F.concat(F.lit("<em>"), x, F.lit("</em>"))).otherwise(x),
        ),
        " ",
    )
    return (
        toks.filter(h > 0)
        .select("doc_id", snippet.alias("snippet"))
        .orderBy("doc_id")
        .limit(20)
    )


# ---------------------------------------------------------------------------
# MoreLikeThis through the BM25 scorer (queries/mlt/MoreLikeThis.java):
# select the seed doc's top-5 terms by tf*idf interestingness, run them as
# a BM25 disjunction over the rest of the corpus.
# ---------------------------------------------------------------------------

_MLT_SEED, _MLT_N = 0, 5


@register(
    "more_like_this_bm25",
    f"""WITH {_TOKS_CTE},
dl AS (SELECT d.doc_id, coalesce(t.c, 0) AS dl
       FROM documents d LEFT JOIN (SELECT doc_id, count(*) AS c FROM toks GROUP BY 1) t USING (doc_id)),
stats AS (SELECT count(*)::DOUBLE AS n_total, sum(dl)::DOUBLE/count(*) AS avgdl FROM dl),
alltf AS (SELECT doc_id, term, count(*)::DOUBLE AS freq FROM toks GROUP BY 1, 2),
dft AS (SELECT term, count(*)::DOUBLE AS dft FROM alltf GROUP BY 1),
sel AS (SELECT a.term FROM alltf a JOIN dft d USING (term) CROSS JOIN stats s
        WHERE a.doc_id = {_MLT_SEED}
        ORDER BY ln(1 + (s.n_total - d.dft + 0.5)/(d.dft + 0.5)) * a.freq DESC, a.term ASC
        LIMIT {_MLT_N}),
scored AS (
  SELECT tf.doc_id,
         ln(1.0 + (s.n_total - d.dft + 0.5)/(d.dft + 0.5))
           * tf.freq / (tf.freq + 1.2 * (0.25 + 0.75 * ({_b4_sql('dl.dl')})::DOUBLE / s.avgdl)) AS contrib
  FROM alltf tf JOIN dft d USING (term) JOIN dl ON tf.doc_id = dl.doc_id CROSS JOIN stats s
  WHERE tf.term IN (SELECT term FROM sel) AND tf.doc_id <> {_MLT_SEED})
SELECT doc_id, round(sum(contrib), 6) AS score
FROM scored GROUP BY doc_id ORDER BY score DESC, doc_id ASC LIMIT 10""",
)
def more_like_this_bm25(spark, sf_dir):
    """MoreLikeThis: tf*idf term selection from the seed doc, BM25-scored
    disjunction over the corpus (seed excluded). Spark selects the same 5
    terms (idf*tf desc, term asc — identical tie-break) then reuses the
    shared BM25 contribution plan."""
    from .driver_queries import _contrib_spark

    toks = _tokens(spark, sf_dir)
    pairs = toks.select("doc_id", F.explode("tokens").alias("term"))
    alltf = pairs.groupBy("doc_id", "term").agg(
        F.count("*").cast("double").alias("freq")
    )
    dft = alltf.groupBy("term").agg(F.count("*").cast("double").alias("dft"))
    n_total = float(toks.count())
    sel_rows = (
        alltf.filter(F.col("doc_id") == _MLT_SEED)
        .join(dft, "term")
        .select(
            "term",
            (
                F.log(1.0 + (F.lit(n_total) - F.col("dft") + 0.5) / (F.col("dft") + 0.5))
                * F.col("freq")
            ).alias("interest"),
        )
        .orderBy(F.desc("interest"), F.asc("term"))
        .limit(_MLT_N)
        .collect()
    )
    terms = [r["term"] for r in sel_rows]
    return (
        _contrib_spark(spark, sf_dir, terms)
        .filter(F.col("doc_id") != _MLT_SEED)
        .groupBy("doc_id")
        .agg(F.round(F.sum("contrib"), 6).alias("score"))
        .orderBy(F.desc("score"), F.asc("doc_id"))
        .limit(10)
    )


# ---------------------------------------------------------------------------
# MultiSearcher lifecycle as a driver-visible row (index/MultiReader.java +
# QueryComponent#distributedProcess + PendingDeletes + SegmentMerger):
# build 2 segments -> delete by query -> search across segments with
# tombstones -> compact to 1 segment -> search again. Counts (exact set
# semantics) make the row oracle-able; the float32 ranked path is pinned in
# pytest (test_engine/test_merge/test_streaming).
# ---------------------------------------------------------------------------

_MS_CACHE: dict = {}


@register(
    "multisearcher_lifecycle",
    f"""WITH {_TOKS_CTE},
m AS (SELECT DISTINCT doc_id FROM toks WHERE term = 'spark'),
live AS (SELECT count(*) AS c FROM m JOIN documents d USING (doc_id) WHERE d.lang <> 'de')
SELECT c::BIGINT AS n_before, 2::BIGINT AS n_segments_before,
       c::BIGINT AS n_after, 1::BIGINT AS n_segments_after
FROM live""",
)
def multisearcher_lifecycle(spark, sf_dir):
    """Full segment lifecycle, results as exact counts: docs matching
    'spark' must exclude tombstoned (lang='de') docs BOTH via the
    MultiSearcher liveDocs mask (2 segments + _deletes) AND after the
    tombstone-purging merge (1 segment)."""
    import hashlib as _h
    import shutil

    from ..corpus import documents_as_corpus
    from ..operators.indexer import build_index
    from ..operators.merge import delete_by_query, merge_segments
    from ..operators.search import MultiSearcher
    from ..sources.catalog import Catalog

    key = sf_dir
    if key not in _MS_CACHE:
        root = "/tmp/spark_graft_ms/" + _h.md5(sf_dir.encode()).hexdigest()[:8]
        shutil.rmtree(root, ignore_errors=True)
        docs = documents_as_corpus(spark, sf_dir)
        n = docs.count()
        half = n // 2
        cat = Catalog(root)
        for i, pred in enumerate(
            [F.col("doc_id") < half, F.col("doc_id") >= half]
        ):
            build_index(
                docs.filter(pred).sparkSession,
                docs.filter(pred),
                out_dir=root,
                segment_id=f"part{i}",
            )
            cat.commit_swap(add=[f"part{i}"])
        n_seg_before = len(cat.segments())
        delete_by_query(spark, cat, F.col("lang") == "de")
        ms = MultiSearcher.from_catalog(spark, cat)
        n_before = ms.topk("spark", k=n).count()
        merge_segments(spark, cat.segments(), catalog=cat)
        n_seg_after = len(cat.segments())
        ms2 = MultiSearcher.from_catalog(spark, cat)
        n_after = ms2.topk("spark", k=n).count()
        _MS_CACHE[key] = (n_before, n_seg_before, n_after, n_seg_after)
    nb, sb, na, sa = _MS_CACHE[key]
    return spark.createDataFrame(
        [(nb, sb, na, sa)],
        "n_before long, n_segments_before long, n_after long, n_segments_after long",
    )


# ---------------------------------------------------------------------------
# Analysis-chain breadth rows (round 2): ASCIIFoldingFilter,
# HTMLStripCharFilter, EdgeNGramTokenFilter, PorterStemFilter.
# The corpora are pure ASCII, so folding/strip rows first SYNTHESIZE their
# input (identical expression in both engines), then apply the filter —
# the roundtrip equality is the cross-engine contract.
# ---------------------------------------------------------------------------

from ..functions.analysis import (
    duckdb_ascii_fold_sql,
    duckdb_html_strip_sql,
    edge_ngrams,
    ascii_fold_col,
    html_strip_col,
    porter_stem_udf,
)


@register(
    "ascii_fold_roundtrip",
    f"""SELECT count(*) AS n_docs,
       sum(CASE WHEN {duckdb_ascii_fold_sql("translate(text, 'aeiou', 'àéîõü')")} = text
                THEN 1 ELSE 0 END)::BIGINT AS n_roundtrip
FROM documents""",
)
def ascii_fold_roundtrip(spark, sf_dir):
    """ASCIIFoldingFilter (analysis/miscellaneous/ASCIIFoldingFilter.java):
    accent text deterministically, fold it back, count exact roundtrips."""
    d = _read(spark, sf_dir, "documents")
    accented = F.translate(F.col("text"), "aeiou", "àéîõü")
    return d.agg(
        F.count("*").alias("n_docs"),
        F.sum(
            F.when(ascii_fold_col(accented) == F.col("text"), 1).otherwise(0)
        ).cast("long").alias("n_roundtrip"),
    )


@register(
    "html_strip_tokens",
    f"""WITH wrapped AS (
  SELECT doc_id,
         '<p class="d">' || text || '</p><script>var x=1;</script> &amp; <b>tail</b>' AS h
  FROM documents)
SELECT count(*) AS n_docs,
       sum(length({duckdb_html_strip_sql('h')}))::BIGINT AS total_chars
FROM wrapped""",
)
def html_strip_tokens(spark, sf_dir):
    """HTMLStripCharFilter (analysis/charfilter/HTMLStripCharFilter.java):
    wrap each doc in markup, strip, compare total stripped length."""
    d = _read(spark, sf_dir, "documents")
    wrapped = F.concat(
        F.lit('<p class="d">'),
        F.col("text"),
        F.lit("</p><script>var x=1;</script> &amp; <b>tail</b>"),
    )
    return d.agg(
        F.count("*").alias("n_docs"),
        F.sum(F.length(html_strip_col(wrapped))).cast("long").alias("total_chars"),
    )


@register(
    "edge_ngram_terms",
    f"""WITH {_TOKS_CTE},
terms AS (SELECT DISTINCT term FROM toks),
grams AS (SELECT unnest(list_transform(range(2, least(length(term), 4) + 1),
                                       i -> substr(term, 1, i::INT))) AS gram
          FROM terms WHERE length(term) >= 2)
SELECT gram, count(*) AS n_terms FROM grams GROUP BY gram ORDER BY gram""",
)
def edge_ngram_terms(spark, sf_dir):
    """EdgeNGramTokenFilter (analysis/ngram/EdgeNGramTokenFilter.java):
    2..4-char leading prefixes over the distinct terms dict (the
    search-as-you-type index): gram -> how many terms share it."""
    toks = _tokens(spark, sf_dir)
    terms = toks.select(F.explode("tokens").alias("term")).distinct()
    return (
        terms.select(F.explode(edge_ngrams(F.col("term"), 2, 4)).alias("gram"))
        .groupBy("gram")
        .agg(F.count("*").alias("n_terms"))
        .orderBy("gram")
    )


@register("porter_stem_top")  # rows-only: no Porter implementation exists in
# offline DuckDB (fts extension needs network); algorithm pinned by the
# published Porter-paper vectors in tests/test_functions.py.
def porter_stem_top(spark, sf_dir):
    """PorterStemFilter (analysis/en/PorterStemFilter.java): stem the token
    stream, top-10 stems by total frequency."""
    toks = _tokens(spark, sf_dir)
    return (
        toks.select(F.explode(porter_stem_udf("tokens")).alias("stem"))
        .groupBy("stem")
        .agg(F.count("*").alias("ttf"))
        .orderBy(F.desc("ttf"), F.asc("stem"))
        .limit(10)
    )


# ---------------------------------------------------------------------------
# Date math (util/DateMathParser.java): the expression is compiled
# driver-side to a timestamp constant; the ORACLE hardcodes the
# INDEPENDENTLY hand-derived instant, so the row fails if the parser is
# wrong. NOW anchored explicitly (determinism).
# ---------------------------------------------------------------------------

_DM_EXPR = "NOW/DAY-5DAYS+6HOURS"
_DM_NOW = "2024-01-20T12:34:56Z"
# hand-derived: /DAY -> 2024-01-20T00:00, -5DAYS -> 01-15, +6HOURS -> 06:00


@register(
    "date_math_range",
    """SELECT event_type, count(*) AS n_events
FROM events WHERE ts >= TIMESTAMP '2024-01-15 06:00:00'
GROUP BY event_type ORDER BY event_type""",
)
def date_math_range(spark, sf_dir):
    """Range filter with a date-math lower bound (fq=ts:[NOW/DAY-5DAYS+6HOURS
    TO *])."""
    from datetime import datetime, timezone

    from ..functions.datemath import parse_date_math

    now = datetime(2024, 1, 20, 12, 34, 56, tzinfo=timezone.utc)
    bound = parse_date_math(_DM_EXPR, now=now).replace(tzinfo=None)
    e = _read(spark, sf_dir, "events")
    return (
        e.filter(F.col("ts") >= F.lit(bound))
        .groupBy("event_type")
        .agg(F.count("*").alias("n_events"))
        .orderBy("event_type")
    )


# ---------------------------------------------------------------------------
# geodist() (solr/core/.../search/function/distance/*, Lucene SloppyMath
# .haversinMeters): haversine distance on the mean-radius sphere
# (6371008.7714 m, Lucene GeoUtils.EARTH_MEAN_RADIUS). Coordinates are
# synthesized deterministically from c_custkey with IDENTICAL expressions
# in both engines (testdata carries no geo columns).
# ---------------------------------------------------------------------------

_R_KM = 6371.0087714


@register(
    "geodist_nearest",
    f"""WITH pts AS (
  SELECT c_custkey, ((c_custkey % 179) - 89)::DOUBLE AS lat,
         (((c_custkey * 7) % 360) - 180)::DOUBLE AS lon
  FROM customer)
SELECT c_custkey,
       round(2 * {_R_KM} * asin(sqrt(
         pow(sin(radians(lat) / 2), 2)
         + cos(radians(lat)) * cos(radians(0.0)) * pow(sin(radians(lon) / 2), 2)
       )), 3) AS dist_km
FROM pts ORDER BY dist_km ASC, c_custkey ASC LIMIT 10""",
)
def geodist_nearest(spark, sf_dir):
    """geodist(lat, lon, 0, 0): 10 nearest synthesized points to the
    origin, haversine on the mean-radius sphere."""
    c = _read(spark, sf_dir, "customer")
    pts = c.select(
        "c_custkey",
        ((F.col("c_custkey") % 179) - 89).cast("double").alias("lat"),
        (((F.col("c_custkey") * 7) % 360) - 180).cast("double").alias("lon"),
    )
    dist = 2 * _R_KM * F.asin(
        F.sqrt(
            F.pow(F.sin(F.radians(F.col("lat")) / 2), 2)
            + F.cos(F.radians(F.col("lat")))
            * F.cos(F.radians(F.lit(0.0)))
            * F.pow(F.sin(F.radians(F.col("lon")) / 2), 2)
        )
    )
    return (
        pts.select("c_custkey", F.round(dist, 3).alias("dist_km"))
        .orderBy(F.asc("dist_km"), F.asc("c_custkey"))
        .limit(10)
    )


# ---------------------------------------------------------------------------
# CSV / JSON loaders (solr UpdateRequestHandler CSV/JSON loaders,
# handler/loader/*.java): export a deterministic slice to both formats,
# read back through spark.read.csv / spark.read.json with explicit
# schemas, aggregate. Oracle reads the parquet slice directly — equality
# proves the loader round-trip.
# ---------------------------------------------------------------------------

_LOADER_CACHE: dict = {}


@register(
    "csv_json_loader_roundtrip",
    """WITH s AS (SELECT * FROM customer ORDER BY c_custkey LIMIT 200)
SELECT (SELECT count(*) FROM s)::BIGINT AS n_csv,
       (SELECT count(*) FROM s)::BIGINT AS n_json,
       (SELECT CAST(sum(CAST(c_acctbal AS DECIMAL(18,2))) AS DECIMAL(18,2)) FROM s) AS sum_bal""",
)
def csv_json_loader_roundtrip(spark, sf_dir):
    """Round-trip the first 200 customers through CSV and JSON loaders."""
    import hashlib as _h

    key = sf_dir
    if key not in _LOADER_CACHE:
        base = "/tmp/spark_graft_load/" + _h.md5(sf_dir.encode()).hexdigest()[:8]
        s = _read(spark, sf_dir, "customer").orderBy("c_custkey").limit(200)
        s.coalesce(1).write.mode("overwrite").option("header", True).csv(base + "/csv")
        s.coalesce(1).write.mode("overwrite").json(base + "/json")
        _LOADER_CACHE[key] = base
    base = _LOADER_CACHE[key]
    schema = _read(spark, sf_dir, "customer").schema
    csv = spark.read.option("header", True).schema(schema).csv(base + "/csv")
    js = spark.read.schema(schema).json(base + "/json")
    return (
        csv.agg(F.count("*").alias("n_csv"))
        .crossJoin(js.agg(F.count("*").alias("n_json")))
        .crossJoin(
            csv.agg(
                F.sum(F.col("c_acctbal").cast("decimal(18,2)"))
                .cast("decimal(18,2)")
                .alias("sum_bal")
            )
        )
    )


# ---------------------------------------------------------------------------
# Phrase clause inside a Boolean query (search/BooleanQuery.java holding a
# PhraseQuery.java clause): '+"key order" batch' — MUST exact phrase,
# SHOULD term; score = phrase BM25 (freq = occurrences, idf summed over
# phrase positions) + term BM25 when present. Double-precision
# cross-engine variant; the float32 engine path (Phrase IR leaf +
# cogrouped postings/positions scorer, operators/search.py
# #score_query_postings) is pinned to tests/test_phrase_bool.py.
# ---------------------------------------------------------------------------

_BPQ_DENOM = f"{K1} * ((1 - {B}) + {B} * {duckdb_byte4_roundtrip_sql('dl.dl')} / s.avgdl)"


@register(
    "bool_phrase_query",
    f"""WITH tokarr AS (SELECT doc_id, {duckdb_tokenize_sql('text')} AS toks FROM documents),
stats AS (SELECT count(*)::DOUBLE AS n_total, avg(len(toks))::DOUBLE AS avgdl FROM tokarr),
dl AS (SELECT doc_id, len(toks) AS dl FROM tokarr),
pos AS (SELECT doc_id, unnest(toks) AS term, generate_subscripts(toks, 1) AS pos FROM tokarr),
dft AS (SELECT term, count(DISTINCT doc_id)::DOUBLE AS dft FROM pos
        WHERE term IN ('key', 'order', 'batch') GROUP BY term),
idfp AS (SELECT sum(ln(1 + (s.n_total - d.dft + 0.5) / (d.dft + 0.5))) AS idf_sum
         FROM dft d CROSS JOIN stats s WHERE d.term IN ('key', 'order')),
idft AS (SELECT ln(1 + (s.n_total - d.dft + 0.5) / (d.dft + 0.5)) AS idf_t
         FROM dft d CROSS JOIN stats s WHERE d.term = 'batch'),
ph AS (SELECT a.doc_id, count(*)::DOUBLE AS freq
       FROM pos a JOIN pos b ON a.doc_id = b.doc_id AND b.pos = a.pos + 1
       WHERE a.term = 'key' AND b.term = 'order' GROUP BY a.doc_id),
tf AS (SELECT doc_id, count(*)::DOUBLE AS freq FROM pos
       WHERE term = 'batch' GROUP BY doc_id)
SELECT ph.doc_id AS doc_id,
       round(i.idf_sum * ph.freq / (ph.freq + {_BPQ_DENOM})
             + coalesce(t.idf_t * tf.freq / (tf.freq + {_BPQ_DENOM}), 0),
             6) AS score
FROM ph JOIN dl ON dl.doc_id = ph.doc_id
LEFT JOIN tf ON tf.doc_id = ph.doc_id
CROSS JOIN idfp i CROSS JOIN idft t CROSS JOIN stats s
ORDER BY score DESC, doc_id ASC LIMIT 10""",
)
def bool_phrase_query(spark, sf_dir):
    """'+"key order" batch': MUST phrase + SHOULD term in one Boolean tree.
    Spark plan mirrors phrase_bm25_topk: one narrow pass computes (dl,
    phrase freq, term tf, presences) per row via array lambdas
    (whole-stage codegen, no posexplode/self-join); a broadcast stats row
    carries n/avgdl/idfs."""
    t0, t1, t2 = "key", "order", "batch"
    toks = _tokens(spark, sf_dir)
    base = toks.select(
        "doc_id",
        F.size("tokens").alias("dl"),
        _phrase_freq_col("tokens", [t0, t1]).cast("double").alias("freq_p"),
        F.size(F.filter(F.col("tokens"), lambda x: x == t2))
        .cast("double")
        .alias("freq_t"),
        F.array_contains("tokens", t0).cast("long").alias("h0"),
        F.array_contains("tokens", t1).cast("long").alias("h1"),
        F.array_contains("tokens", t2).cast("long").alias("h2"),
    )

    def _idf(dft):
        return F.log(
            1.0 + (F.col("n_total") - dft + 0.5) / (dft + 0.5)
        )

    stats = base.agg(
        F.count("*").cast("double").alias("n_total"),
        (F.sum("dl") / F.count("*")).alias("avgdl"),
        F.sum("h0").cast("double").alias("dft0"),
        F.sum("h1").cast("double").alias("dft1"),
        F.sum("h2").cast("double").alias("dft2"),
    ).select(
        "n_total",
        "avgdl",
        (_idf(F.col("dft0")) + _idf(F.col("dft1"))).alias("idf_sum"),
        _idf(F.col("dft2")).alias("idf_t"),
    )
    dlq = F.expr(_spark_byte4_sql("dl")).cast("double")
    denom = lambda f: f + K1 * ((1 - B) + B * F.col("dlq") / F.col("avgdl"))  # noqa: E731
    return (
        base.filter(F.col("freq_p") > 0)
        .crossJoin(F.broadcast(stats))
        .withColumn("dlq", dlq)
        .select(
            "doc_id",
            F.round(
                F.col("idf_sum") * F.col("freq_p") / denom(F.col("freq_p"))
                + F.when(
                    F.col("freq_t") > 0,
                    F.col("idf_t") * F.col("freq_t") / denom(F.col("freq_t")),
                ).otherwise(F.lit(0.0)),
                6,
            ).alias("score"),
        )
        .orderBy(F.desc("score"), F.asc("doc_id"))
        .limit(10)
    )


# ---------------------------------------------------------------------------
# Span queries (search/spans/*.java — SpanNearQuery / SpanFirstQuery;
# engine kernel: operators/spans.py, float32 path pinned to
# tests/test_spans.py). Driver rows re-express the PINNED greedy-ordered
# semantics in double precision on both engines: for each leading-term
# position, the earliest following occurrence of the second term; gap =
# slack between the two spans; matches with gap <= slop contribute
# 1/(1+gap) to the doc's span freq (SpanScorer computeSlopFactor).
# ---------------------------------------------------------------------------

_SPAN_SLOP = 2


@register(
    "span_near_ordered_topk",
    f"""WITH tokarr AS (SELECT doc_id, {duckdb_tokenize_sql('text')} AS toks FROM documents),
stats AS (SELECT count(*)::DOUBLE AS n_total, avg(len(toks))::DOUBLE AS avgdl FROM tokarr),
dl AS (SELECT doc_id, len(toks) AS dl FROM tokarr),
pos AS (SELECT doc_id, unnest(toks) AS term, generate_subscripts(toks, 1) AS pos FROM tokarr),
dft AS (SELECT term, count(DISTINCT doc_id)::DOUBLE AS dft FROM pos
        WHERE term IN ('key', 'order') GROUP BY term),
idf AS (SELECT sum(ln(1 + (s.n_total - d.dft + 0.5) / (d.dft + 0.5))) AS idf_sum
        FROM dft d CROSS JOIN stats s),
lead AS (SELECT a.doc_id, a.pos AS apos, min(b.pos) AS bpos
         FROM pos a JOIN pos b ON b.doc_id = a.doc_id AND b.pos > a.pos
                               AND b.term = 'order'
         WHERE a.term = 'key' GROUP BY a.doc_id, a.pos),
fr AS (SELECT doc_id, sum(1.0 / (1 + (bpos - apos - 1))) AS freq
       FROM lead WHERE bpos - apos - 1 <= {_SPAN_SLOP} GROUP BY doc_id)
SELECT fr.doc_id AS doc_id,
       round(i.idf_sum * fr.freq
             / (fr.freq + {K1} * ((1 - {B}) + {B} * {duckdb_byte4_roundtrip_sql('dl.dl')} / s.avgdl)),
             6) AS score
FROM fr JOIN dl ON dl.doc_id = fr.doc_id
CROSS JOIN idf i CROSS JOIN stats s
ORDER BY score DESC, doc_id ASC LIMIT 10""",
)
def span_near_ordered_topk(spark, sf_dir):
    """SpanNear([key, order], slop=2, inOrder): greedy-ordered span freq,
    BM25 with summed idf. Spark plan: per-row array lambdas build the two
    position lists and fold the gap contributions — whole-stage codegen,
    no posexplode, no self-join; one broadcast stats row."""
    t0, t1 = "key", "order"
    toks_col = F.col("tokens")
    seq = F.sequence(F.lit(1), F.size(toks_col))

    def positions_of(t):
        return F.filter(seq, lambda i: F.element_at(toks_col, i.cast("int")) == t)

    apos, opos = positions_of(t0), positions_of(t1)
    gaps = F.transform(
        apos,
        lambda i: F.array_min(F.filter(opos, lambda j: j > i)) - i - 1,
    )
    good = F.filter(gaps, lambda g: g.isNotNull() & (g <= _SPAN_SLOP))
    freq = F.aggregate(
        good, F.lit(0.0), lambda acc, g: acc + 1.0 / (1.0 + g.cast("double"))
    )

    toks = _tokens(spark, sf_dir)
    base = toks.select(
        "doc_id",
        F.size("tokens").alias("dl"),
        freq.alias("freq"),
        F.array_contains("tokens", t0).cast("long").alias("h0"),
        F.array_contains("tokens", t1).cast("long").alias("h1"),
    )
    stats = base.agg(
        F.count("*").cast("double").alias("n_total"),
        (F.sum("dl") / F.count("*")).alias("avgdl"),
        F.sum("h0").cast("double").alias("dft0"),
        F.sum("h1").cast("double").alias("dft1"),
    ).select(
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
    "span_first_count",
    f"""WITH tokarr AS (SELECT doc_id, {duckdb_tokenize_sql('text')} AS toks FROM documents),
pos AS (SELECT doc_id, unnest(toks) AS term, generate_subscripts(toks, 1) AS pos FROM tokarr)
SELECT count(DISTINCT doc_id) AS n_docs FROM pos
WHERE term = 'key' AND pos <= 12""",
)
def span_first_count(spark, sf_dir):
    """SpanFirst(key, 12): docs where 'key' occurs in the first 12
    positions — per-row array slice, no explode."""
    toks = _tokens(spark, sf_dir)
    hit = F.array_contains(F.slice(F.col("tokens"), 1, 12), "key")
    return toks.agg(F.sum(hit.cast("long")).alias("n_docs"))


@register(
    "span_unordered_match",
    f"""WITH tokarr AS (SELECT doc_id, {duckdb_tokenize_sql('text')} AS toks FROM documents),
pos AS (SELECT doc_id, unnest(toks) AS term, generate_subscripts(toks, 1) AS pos FROM tokarr)
SELECT count(DISTINCT a.doc_id) AS n_docs
FROM pos a JOIN pos b ON b.doc_id = a.doc_id
WHERE a.term = 'key' AND b.term = 'batch' AND abs(a.pos - b.pos) - 1 <= {_SPAN_SLOP}""",
)
def span_unordered_match(spark, sf_dir):
    """SpanNear([key, batch], slop=2, inOrder=false) MATCH semantics:
    a doc matches iff some window slack = |pos_a - pos_b| - 1 <= slop
    (the walk's minimal window for two single-term clauses). Per-row
    nested exists lambdas, codegen, no join."""
    toks_col = F.col("tokens")
    seq = F.sequence(F.lit(1), F.size(toks_col))

    def positions_of(t):
        return F.filter(seq, lambda i: F.element_at(toks_col, i.cast("int")) == t)

    match = F.exists(
        positions_of("key"),
        lambda i: F.exists(
            positions_of("batch"),
            lambda j: F.abs(i - j) - 1 <= _SPAN_SLOP,
        ),
    )
    return _tokens(spark, sf_dir).agg(
        F.sum(F.when(F.size(toks_col) > 0, match).otherwise(F.lit(False)).cast("long")).alias("n_docs")
    )


# ---------------------------------------------------------------------------
# Spellcheck / suggester / elevation (suggest/DirectSpellChecker.java,
# suggest/analyzing/AnalyzingInfixSuggester.java,
# solr handler/component/{SpellCheck,QueryElevation}Component.java;
# engine surface: Searcher.spell_suggest / Searcher.suggest_prefix)
# ---------------------------------------------------------------------------


@register(
    "spellcheck_suggest",
    f"""WITH {_TOKS_CTE},
dict AS (SELECT term, count(DISTINCT doc_id) AS df FROM toks GROUP BY term)
SELECT term, levenshtein(term, 'ordre') AS distance, df
FROM dict WHERE term <> 'ordre' AND levenshtein(term, 'ordre') <= 2
ORDER BY distance ASC, df DESC, term ASC LIMIT 5""",
)
def spellcheck_suggest(spark, sf_dir):
    """DirectSpellChecker: corrections for the misspelling 'ordre' ranked
    (edit distance asc, df desc, term asc)."""
    toks = _tokens(spark, sf_dir)
    dic = (
        toks.select("doc_id", F.explode("tokens").alias("term"))
        .groupBy("term")
        .agg(F.countDistinct("doc_id").alias("df"))
    )
    return (
        dic.filter(F.col("term") != "ordre")
        .withColumn("distance", F.levenshtein(F.col("term"), F.lit("ordre")))
        .filter(F.col("distance") <= 2)
        .orderBy(F.asc("distance"), F.desc("df"), F.asc("term"))
        .limit(5)
    )


@register(
    "suggest_prefix_top",
    f"""WITH {_TOKS_CTE}
SELECT term, count(*) AS weight FROM toks WHERE term LIKE 'st%'
GROUP BY term ORDER BY weight DESC, term ASC LIMIT 10""",
)
def suggest_prefix_top(spark, sf_dir):
    """Autocomplete suggester: 'st' prefix completions weighted by
    collection frequency (AnalyzingInfixSuggester weight ordering)."""
    toks = _tokens(spark, sf_dir)
    return (
        toks.select(F.explode("tokens").alias("term"))
        .filter(F.col("term").startswith("st"))
        .groupBy("term")
        .agg(F.count("*").alias("weight"))
        .orderBy(F.desc("weight"), F.asc("term"))
        .limit(10)
    )


_ELEVATED = (7, 3)  # configured elevation order for q='order'


@register(
    "query_elevation",
    f"""WITH {_TOKS_CTE},
tf AS (SELECT doc_id, count(*)::BIGINT AS score FROM toks
       WHERE term = 'order' GROUP BY doc_id),
organic AS (SELECT doc_id, score,
                   row_number() OVER (ORDER BY score DESC, doc_id ASC) AS rn
            FROM tf WHERE doc_id NOT IN {str(_ELEVATED)})
SELECT doc_id, score FROM (
  SELECT {_ELEVATED[0]}::BIGINT AS doc_id,
         coalesce((SELECT score FROM tf WHERE doc_id = {_ELEVATED[0]}), 0) AS score,
         0 AS grp, 1 AS rnk
  UNION ALL
  SELECT {_ELEVATED[1]}::BIGINT,
         coalesce((SELECT score FROM tf WHERE doc_id = {_ELEVATED[1]}), 0),
         0, 2
  UNION ALL SELECT doc_id, score, 1, rn FROM organic
) ORDER BY grp ASC, rnk ASC LIMIT 10""",
)
def query_elevation(spark, sf_dir):
    """QueryElevationComponent: docs {7, 3} are pinned to the top in
    config order (included even with score 0, as forceElevation does);
    organic tf-ranked results follow, elevated ids excluded."""
    toks = _tokens(spark, sf_dir)
    tf = (
        toks.select("doc_id", F.explode("tokens").alias("term"))
        .filter(F.col("term") == "order")
        .groupBy("doc_id")
        .agg(F.count("*").alias("score"))
    )
    elev = spark.createDataFrame(
        [(int(d), i + 1) for i, d in enumerate(_ELEVATED)], "doc_id long, rnk int"
    )
    elevated = (
        elev.join(tf, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce(F.col("score"), F.lit(0)).alias("score"),
            F.lit(0).alias("grp"),
            "rnk",
        )
    )
    w = Window.orderBy(F.desc("score"), F.asc("doc_id"))
    organic = (
        tf.filter(~F.col("doc_id").isin(list(_ELEVATED)))
        .withColumn("rnk", F.row_number().over(w))
        .select("doc_id", "score", F.lit(1).alias("grp"), "rnk")
    )
    return (
        elevated.unionByName(organic)
        .orderBy(F.asc("grp"), F.asc("rnk"))
        .limit(10)
        .select("doc_id", "score")
    )


# ---------------------------------------------------------------------------
# DisMax over two fields (search/DisjunctionMaxQuery.java, solr
# DisMaxQParserPlugin): body = text, title = its first 5 tokens (heavy
# overlap, so the tie formula is exercised); qf = body^1 title^2,
# tie=0.3. score(doc) = sum over terms of max_f + tie*(sum_f - max_f).
# Double-precision cross-engine mirror; the float32 engine path
# (operators/dismax.py over per-field segments) is pinned to
# tests/test_dismax.py.
# ---------------------------------------------------------------------------

_DM_TIE = 0.3
_DM_TITLE = 5


def _dm_field_cte(tag: str, boost: float) -> str:
    src = "tokarr" if tag == "b" else "title"
    return f"""{tag}_stats AS (SELECT avg(len(toks))::DOUBLE AS avgdl FROM {src}),
{tag}_dl AS (SELECT doc_id, len(toks) AS dl FROM {src}),
{tag}_pos AS (SELECT doc_id, unnest(toks) AS term FROM {src}),
{tag}_tf AS (SELECT doc_id, term, count(*)::DOUBLE AS freq FROM {tag}_pos
             WHERE term IN ('key', 'order') GROUP BY 1, 2),
{tag}_df AS (SELECT term, count(DISTINCT doc_id)::DOUBLE AS dft FROM {tag}_pos
             WHERE term IN ('key', 'order') GROUP BY 1),
{tag}_sc AS (SELECT tf.doc_id, tf.term,
        {boost} * ln(1 + (n.n - d.dft + 0.5) / (d.dft + 0.5)) * tf.freq
        / (tf.freq + {K1} * ((1 - {B}) + {B} * {duckdb_byte4_roundtrip_sql('dl.dl')} / s.avgdl)) AS s
    FROM {tag}_tf tf JOIN {tag}_df d USING (term) JOIN {tag}_dl dl USING (doc_id)
    CROSS JOIN nstat n CROSS JOIN {tag}_stats s)"""


@register(
    "dismax_query",
    f"""WITH tokarr AS (SELECT doc_id, {duckdb_tokenize_sql('text')} AS toks FROM documents),
title AS (SELECT doc_id, list_slice(toks, 1, {_DM_TITLE}) AS toks FROM tokarr),
nstat AS (SELECT count(*)::DOUBLE AS n FROM documents),
{_dm_field_cte('b', 1.0)},
{_dm_field_cte('t', 2.0)},
allf AS (SELECT doc_id, term, s FROM b_sc UNION ALL SELECT doc_id, term, s FROM t_sc),
dm AS (SELECT doc_id, term, max(s) + {_DM_TIE} * (sum(s) - max(s)) AS dmx
       FROM allf GROUP BY 1, 2)
SELECT doc_id, round(sum(dmx), 6) AS score FROM dm GROUP BY doc_id
ORDER BY score DESC, doc_id ASC LIMIT 10""",
)
def dismax_query(spark, sf_dir):
    """dismax(q='key order', qf='body^1 title^2', tie=0.3)."""
    terms = ["key", "order"]
    toks = _tokens(spark, sf_dir)
    fields = {
        "b": (toks, 1.0),
        "t": (toks.select("doc_id", F.slice("tokens", 1, _DM_TITLE).alias("tokens")), 2.0),
    }
    parts = []
    n_docs = toks.count()
    for tag, (fdf, boost) in fields.items():
        dl = fdf.select("doc_id", F.size("tokens").alias("dl"))
        avgdl = float(dl.agg(F.avg("dl")).collect()[0][0])
        pos = fdf.select("doc_id", F.explode("tokens").alias("term")).filter(
            F.col("term").isin(terms)
        )
        tf = pos.groupBy("doc_id", "term").agg(F.count("*").cast("double").alias("freq"))
        df = pos.groupBy("term").agg(
            F.countDistinct("doc_id").cast("double").alias("dft")
        )
        dlq = F.expr(_spark_byte4_sql("dl")).cast("double")
        sc = (
            tf.join(F.broadcast(df), "term")
            .join(dl, "doc_id")
            .withColumn("dlq", dlq)
            .select(
                "doc_id",
                "term",
                (
                    F.lit(boost)
                    * F.log(1.0 + (F.lit(float(n_docs)) - F.col("dft") + 0.5) / (F.col("dft") + 0.5))
                    * F.col("freq")
                    / (F.col("freq") + K1 * ((1 - B) + B * F.col("dlq") / F.lit(avgdl)))
                ).alias("s"),
            )
        )
        parts.append(sc)
    allf = parts[0].unionByName(parts[1])
    dm = allf.groupBy("doc_id", "term").agg(
        (F.max("s") + _DM_TIE * (F.sum("s") - F.max("s"))).alias("dmx")
    )
    return (
        dm.groupBy("doc_id")
        .agg(F.round(F.sum("dmx"), 6).alias("score"))
        .orderBy(F.desc("score"), F.asc("doc_id"))
        .limit(10)
    )


# ---------------------------------------------------------------------------
# Filter query (Solr fq; search/LRUQueryCache.java bitset semantics):
# results restricted to fq=lang:'en', BM25 scores and corpus stats
# UNTOUCHED (the filter is a mask, not a query rewrite). Engine path:
# Searcher.topk(fq=...) cogroups the cached docmap filter set per bucket
# (tests/test_search_extras.py); this row is the double-precision
# cross-engine mirror.
# ---------------------------------------------------------------------------


@register(
    "filter_query_topk",
    f"""WITH tokarr AS (SELECT doc_id, {duckdb_tokenize_sql('text')} AS toks FROM documents),
stats AS (SELECT count(*)::DOUBLE AS n_total, avg(len(toks))::DOUBLE AS avgdl FROM tokarr),
dl AS (SELECT doc_id, len(toks) AS dl FROM tokarr),
pos AS (SELECT doc_id, unnest(toks) AS term FROM tokarr),
tf AS (SELECT doc_id, count(*)::DOUBLE AS freq FROM pos WHERE term = 'order' GROUP BY doc_id),
dft AS (SELECT count(DISTINCT doc_id)::DOUBLE AS dft FROM pos WHERE term = 'order')
SELECT tf.doc_id AS doc_id,
       round(ln(1 + (s.n_total - f.dft + 0.5) / (f.dft + 0.5)) * tf.freq
             / (tf.freq + {K1} * ((1 - {B}) + {B} * {duckdb_byte4_roundtrip_sql('dl.dl')} / s.avgdl)),
             6) AS score
FROM tf JOIN dl ON dl.doc_id = tf.doc_id
JOIN documents d ON d.doc_id = tf.doc_id
CROSS JOIN dft f CROSS JOIN stats s
WHERE d.lang = 'en'
ORDER BY score DESC, doc_id ASC LIMIT 10""",
)
def filter_query_topk(spark, sf_dir):
    """q='order' with fq=lang:'en' — scores identical to the unfiltered
    query (stats over the FULL corpus), result set masked."""
    toks = _tokens(spark, sf_dir)
    base = toks.select(
        "doc_id",
        F.size("tokens").alias("dl"),
        F.size(F.filter(F.col("tokens"), lambda x: x == "order"))
        .cast("double")
        .alias("freq"),
    )
    stats = base.agg(
        F.count("*").cast("double").alias("n_total"),
        (F.sum("dl") / F.count("*")).alias("avgdl"),
        F.sum((F.col("freq") > 0).cast("long")).cast("double").alias("dft"),
    )
    lang = _read(spark, sf_dir, "documents").select("doc_id", "lang")
    dlq = F.expr(_spark_byte4_sql("dl")).cast("double")
    return (
        base.filter(F.col("freq") > 0)
        .join(lang, "doc_id")
        .filter(F.col("lang") == "en")
        .crossJoin(F.broadcast(stats))
        .withColumn("dlq", dlq)
        .select(
            "doc_id",
            F.round(
                F.log(1.0 + (F.col("n_total") - F.col("dft") + 0.5) / (F.col("dft") + 0.5))
                * F.col("freq")
                / (F.col("freq") + K1 * ((1 - B) + B * F.col("dlq") / F.col("avgdl"))),
                6,
            ).alias("score"),
        )
        .orderBy(F.desc("score"), F.asc("doc_id"))
        .limit(10)
    )


# ---------------------------------------------------------------------------
# Faceting over a RESULT SET (Solr SimpleFacets / FacetComponent):
# facet.field=lang over the docs matching q='order'. ENGINE-PATH row —
# runs the real index (match_docs DocSet + docmap bucket counts), not a
# re-expression; the oracle recomputes from raw text in SQL.
# ---------------------------------------------------------------------------

_ENGINE_SEG_CACHE: dict = {}


def _engine_searcher(spark, sf_dir):
    """One engine index per sf_dir, shared by engine-path driver rows."""
    if sf_dir not in _ENGINE_SEG_CACHE:
        from ..corpus import documents_as_corpus
        from ..operators.indexer import build_index
        from ..operators.search import Searcher

        seg = build_index(
            spark, documents_as_corpus(spark, sf_dir), out_dir=None,
            with_positions=True,
        )
        _ENGINE_SEG_CACHE[sf_dir] = Searcher(spark, seg)
    return _ENGINE_SEG_CACHE[sf_dir]


@register(
    "facet_on_query",
    f"""WITH {_TOKS_CTE},
m AS (SELECT DISTINCT doc_id FROM toks WHERE term = 'order')
SELECT d.lang AS lang, count(*) AS n_docs
FROM m JOIN documents d USING (doc_id)
GROUP BY d.lang ORDER BY n_docs DESC, lang ASC LIMIT 10""",
)
def facet_on_query(spark, sf_dir):
    """facet.field=lang over q='order' matches (count desc, value asc)."""
    s = _engine_searcher(spark, sf_dir)
    return (
        s.facet_field("order", "lang", k_buckets=10)
        .withColumnRenamed("count", "n_docs")
    )


@register(
    "facet_on_query_filtered",
    f"""WITH {_TOKS_CTE},
m AS (SELECT DISTINCT doc_id FROM toks WHERE term = 'order')
SELECT d.source AS source, count(*) AS n_docs
FROM m JOIN documents d USING (doc_id)
WHERE d.lang = 'en'
GROUP BY d.source ORDER BY n_docs DESC, source ASC LIMIT 5""",
)
def facet_on_query_filtered(spark, sf_dir):
    """facet.field=source over q='order' fq=lang:'en' — facet counts
    respect the filter query. 'source' is not in the engine docmap (the
    corpus adapter carries repo/path/lang), so the bucket column joins
    from the raw table by doc_id — the external-field facet shape."""
    s = _engine_searcher(spark, sf_dir)
    docs = s.match_docs("order", fq="lang = 'en'")
    src = _read(spark, sf_dir, "documents").select("doc_id", "source")
    return (
        docs.join(src, "doc_id")
        .groupBy("source")
        .agg(F.count("*").alias("n_docs"))
        .orderBy(F.desc("n_docs"), F.asc("source"))
        .limit(5)
    )


# ---------------------------------------------------------------------------
# Field-scoped query ('+title:key order' — MUST in one field, SHOULD in
# another; queryparser/classic field scoping + per-field stats). title =
# first 5 body tokens as in dismax_query. Double-precision cross-engine
# mirror; the float32 engine path (operators/fields.py FieldedSearcher
# tagged-term kernel) is pinned to tests/test_fields.py.
# ---------------------------------------------------------------------------


@register(
    "fielded_query",
    f"""WITH tokarr AS (SELECT doc_id, {duckdb_tokenize_sql('text')} AS toks FROM documents),
title AS (SELECT doc_id, list_slice(toks, 1, {_DM_TITLE}) AS toks FROM tokarr),
nstat AS (SELECT count(*)::DOUBLE AS n FROM documents),
{_dm_field_cte('b', 1.0)},
{_dm_field_cte('t', 1.0)}
SELECT t.doc_id AS doc_id, round(t.s + coalesce(b.s, 0), 6) AS score
FROM (SELECT doc_id, s FROM t_sc WHERE term = 'key') t
LEFT JOIN (SELECT doc_id, s FROM b_sc WHERE term = 'order') b USING (doc_id)
ORDER BY score DESC, doc_id ASC LIMIT 10""",
)
def fielded_query(spark, sf_dir):
    """'+title:key order': required term scored with the title field's
    df/avgdl/norms, optional term with the body field's — per-field
    Similarity stats, one ranking."""
    toks = _tokens(spark, sf_dir)
    fields = {
        "b": (toks, "order"),
        "t": (toks.select("doc_id", F.slice("tokens", 1, _DM_TITLE).alias("tokens")), "key"),
    }
    n_docs = toks.count()
    scored = {}
    for tag, (fdf, term) in fields.items():
        dl = fdf.select("doc_id", F.size("tokens").alias("dl"))
        avgdl = float(dl.agg(F.avg("dl")).collect()[0][0])
        pos = fdf.select("doc_id", F.explode("tokens").alias("term")).filter(
            F.col("term") == term
        )
        tf = pos.groupBy("doc_id").agg(F.count("*").cast("double").alias("freq"))
        dft = float(tf.count())
        dlq = F.expr(_spark_byte4_sql("dl")).cast("double")
        scored[tag] = (
            tf.join(dl, "doc_id")
            .withColumn("dlq", dlq)
            .select(
                "doc_id",
                (
                    F.log(1.0 + (F.lit(float(n_docs)) - dft + 0.5) / (dft + 0.5))
                    * F.col("freq")
                    / (F.col("freq") + K1 * ((1 - B) + B * F.col("dlq") / F.lit(avgdl)))
                ).alias("s"),
            )
        )
    return (
        scored["t"]
        .withColumnRenamed("s", "ts")
        .join(scored["b"].withColumnRenamed("s", "bs"), "doc_id", "left")
        .select(
            "doc_id",
            F.round(F.col("ts") + F.coalesce(F.col("bs"), F.lit(0.0)), 6).alias("score"),
        )
        .orderBy(F.desc("score"), F.asc("doc_id"))
        .limit(10)
    )


# ---------------------------------------------------------------------------
# JSON Facet API nested facet (search/facet/FacetRequest.java,
# FacetField.java): terms facet on lang with a stats subfacet
# (avg n_chars) and a nested terms subfacet (top source per bucket).
# ---------------------------------------------------------------------------


@register(
    "json_facet_nested",
    """WITH l AS (SELECT lang, count(*) AS n_docs, round(avg(n_chars), 6) AS avg_len
          FROM documents GROUP BY lang),
s AS (SELECT lang, source, count(*) AS c,
             row_number() OVER (PARTITION BY lang ORDER BY count(*) DESC, source ASC) AS rn
      FROM documents GROUP BY lang, source)
SELECT l.lang AS lang, l.n_docs AS n_docs, l.avg_len AS avg_len,
       s.source AS top_source, s.c AS top_source_n
FROM l JOIN s ON s.lang = l.lang AND s.rn = 1
ORDER BY l.n_docs DESC, l.lang ASC LIMIT 5""",
)
def json_facet_nested(spark, sf_dir):
    """json.facet: terms(lang){ avg(n_chars), terms(source, limit:1) } —
    each nesting level is one grouped agg; the subfacet's per-bucket
    top-1 is a window row_number (two shuffles total, both on small
    keys)."""
    d = _read(spark, sf_dir, "documents")
    l = d.groupBy("lang").agg(
        F.count("*").alias("n_docs"), F.round(F.avg("n_chars"), 6).alias("avg_len")
    )
    w = Window.partitionBy("lang").orderBy(F.desc("c"), F.asc("source"))
    s = (
        d.groupBy("lang", "source")
        .agg(F.count("*").alias("c"))
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "lang",
            F.col("source").alias("top_source"),
            F.col("c").alias("top_source_n"),
        )
    )
    return (
        l.join(s, "lang")
        .select("lang", "n_docs", "avg_len", "top_source", "top_source_n")
        .orderBy(F.desc("n_docs"), F.asc("lang"))
        .limit(5)
    )


# ---------------------------------------------------------------------------
# Real-time get (solr handler/component/RealTimeGetComponent.java): fetch
# stored fields by id straight from the doc store. ENGINE-PATH row: reads
# the engine's docmap (stored-fields store); equality of content length
# with the raw table proves stored-field fidelity end to end.
# ---------------------------------------------------------------------------

_RTG_IDS = (1, 5, 9)


@register(
    "realtime_get",
    f"""SELECT doc_id, lang, length(text) AS n_chars_stored
FROM documents WHERE doc_id IN {str(_RTG_IDS)} ORDER BY doc_id""",
)
def realtime_get(spark, sf_dir):
    """RTG by id from the stored-fields store (docmap), no search."""
    s = _engine_searcher(spark, sf_dir)
    return (
        s.docmap.filter(F.col("doc_id").isin(list(_RTG_IDS)))
        .select(
            "doc_id", "lang", F.length("content").alias("n_chars_stored")
        )
        .orderBy("doc_id")
    )
