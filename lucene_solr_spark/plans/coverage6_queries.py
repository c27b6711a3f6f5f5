"""Round-4 widening batch: suggester family (FreeText/Fuzzy/WordBreak),
Solr math-expression stream evaluators (corr/regress), uniqueBlock facet
aggregate, numeric PointInSetQuery, BooleanSimilarity ranking, and the
cartesianProduct stream decorator.

Each entry re-expresses a reference operator (public lucene-solr path cited
per entry; the reference mount is empty so citations are path#symbol only)
over the driver testdata with a DuckDB oracle using identical column aliases
and cross-engine-exact arithmetic (integer counts, single-division doubles,
or exact DECIMAL sums folded by one shared double formula). Registered into
the same REGISTRY/ORACLES as driver_queries (imported by __spark_entry__).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ..functions.analysis import duckdb_tokenize_sql, shingles
from .driver_queries import _TOKS_CTE, _read, _tokens, register
from .solr_queries import _SIM_TAIL, _SIM_TERMS, _sim_base, _sim_cte, _sim_topk

# ---------------------------------------------------------------------------
# FreeTextSuggester (lucene/suggest/.../analyzing/FreeTextSuggester.java):
# an n-gram language model with stupid backoff (ALPHA=0.4). Context 'sort',
# n=2: candidates seen after the context score cnt(ctx,w)/cnt(ctx,*); unseen
# words back off to 0.4 * unigram share. Every score is a single IEEE-754
# division (counts are exact BIGINTs), so both engines produce bit-identical
# doubles. Spark side: one shingle pass for bigrams (JVM higher-order fn),
# map-combined counts, a broadcast anti-join for the backoff set — no
# driver-side loops, scales as two hash aggregations.
# ---------------------------------------------------------------------------

_FT_CTX = "sort"
_FT_ALPHA = "0.4"
_FT_K = 8


@register(
    "suggest_freetext",
    f"""WITH tokarr AS (SELECT doc_id, {duckdb_tokenize_sql('text')} AS toks FROM documents),
pos AS (SELECT doc_id, unnest(toks) AS term, generate_subscripts(toks, 1) AS pos FROM tokarr),
bi AS (SELECT a.term AS ctx, b.term AS nxt
       FROM pos a JOIN pos b ON a.doc_id = b.doc_id AND b.pos = a.pos + 1),
ctx AS (SELECT nxt, count(*)::BIGINT AS cnt FROM bi WHERE ctx = '{_FT_CTX}' GROUP BY 1),
ctot AS (SELECT sum(cnt)::BIGINT AS tot FROM ctx),
uni AS (SELECT term, count(*)::BIGINT AS ucnt FROM pos GROUP BY 1),
utot AS (SELECT count(*)::BIGINT AS ut FROM pos),
cand AS (
  SELECT nxt AS term, (cnt::DOUBLE / tot::DOUBLE) AS score, 'bigram' AS src
  FROM ctx CROSS JOIN ctot
  UNION ALL
  SELECT u.term, {_FT_ALPHA} * (u.ucnt::DOUBLE / t.ut::DOUBLE), 'backoff'
  FROM uni u CROSS JOIN utot t
  WHERE u.term NOT IN (SELECT nxt FROM ctx))
SELECT term, score, src FROM cand ORDER BY score DESC, term ASC LIMIT {_FT_K}""",
)
def suggest_freetext(spark, sf_dir):
    """FreeTextSuggester: bigram stupid-backoff next-word suggestions."""
    toks = _tokens(spark, sf_dir)
    bi = toks.select(F.explode(shingles(F.col("tokens"), 2)).alias("bg")).select(
        F.substring_index("bg", " ", 1).alias("ctx"),
        F.substring_index("bg", " ", -1).alias("nxt"),
    )
    ctx = (
        bi.filter(F.col("ctx") == _FT_CTX)
        .groupBy("nxt")
        .agg(F.count("*").alias("cnt"))
    )
    ctot = ctx.agg(F.sum("cnt").alias("tot"))
    uni = (
        toks.select(F.explode("tokens").alias("term"))
        .groupBy("term")
        .agg(F.count("*").alias("ucnt"))
    )
    utot = toks.select(F.explode("tokens").alias("term")).agg(
        F.count("*").alias("ut")
    )
    seen = ctx.select(F.col("nxt").alias("term"))
    bigram_cand = ctx.crossJoin(F.broadcast(ctot)).select(
        F.col("nxt").alias("term"),
        (F.col("cnt").cast("double") / F.col("tot").cast("double")).alias("score"),
        F.lit("bigram").alias("src"),
    )
    backoff_cand = (
        uni.join(F.broadcast(seen), "term", "left_anti")
        .crossJoin(F.broadcast(utot))
        .select(
            "term",
            (
                F.lit(float(_FT_ALPHA))
                * (F.col("ucnt").cast("double") / F.col("ut").cast("double"))
            ).alias("score"),
            F.lit("backoff").alias("src"),
        )
    )
    return (
        bigram_cand.unionByName(backoff_cand)
        .orderBy(F.desc("score"), F.asc("term"))
        .limit(_FT_K)
    )


# ---------------------------------------------------------------------------
# FuzzySuggester (lucene/suggest/.../analyzing/FuzzySuggester.java): typed
# prefix 'pat' with maxEdits=1 applied to the candidate's same-length prefix
# (the automaton-intersection semantics restated over the terms dict);
# suggestions ranked by weight = corpus term frequency. Integer freqs ->
# exact. Spark: one hash agg for the dict, a codegen levenshtein filter,
# TakeOrderedAndProject for the top-k — no shuffle beyond the dict agg.
# ---------------------------------------------------------------------------

_FZ_Q = "pat"


@register(
    "suggest_fuzzy",
    f"""WITH {_TOKS_CTE},
dict AS (SELECT term, count(*)::BIGINT AS freq FROM toks GROUP BY 1)
SELECT term, freq FROM dict
WHERE levenshtein(substr(term, 1, {len(_FZ_Q)}), '{_FZ_Q}') <= 1
ORDER BY freq DESC, term ASC LIMIT 10""",
)
def suggest_fuzzy(spark, sf_dir):
    """FuzzySuggester: maxEdits=1 prefix-tolerant completion by weight."""
    toks = _tokens(spark, sf_dir)
    dic = (
        toks.select(F.explode("tokens").alias("term"))
        .groupBy("term")
        .agg(F.count("*").alias("freq"))
    )
    return (
        dic.filter(
            F.levenshtein(F.substring("term", 1, len(_FZ_Q)), F.lit(_FZ_Q)) <= 1
        )
        .orderBy(F.desc("freq"), F.asc("term"))
        .limit(10)
    )


# ---------------------------------------------------------------------------
# WordBreakSpellChecker.suggestWordBreaks (lucene/suggest/.../spell/
# WordBreakSpellChecker.java): a run-on input is split at every position;
# a split is a suggestion iff BOTH sides are dictionary terms (freq >= 1).
# Outputs carry each side's corpus frequency (Lucene ranks break
# suggestions by freq sums; the raw freqs expose the same ordering key).
# Spark: explode(sequence) generates split points JVM-side; two hash joins
# against the broadcast-size terms dict.
# ---------------------------------------------------------------------------

_WB_INPUTS = ["slowfast", "sortmerge"]


@register(
    "word_break_spell",
    f"""WITH {_TOKS_CTE},
dict AS (SELECT term, count(*)::BIGINT AS freq FROM toks GROUP BY 1),
inp AS (SELECT unnest({_WB_INPUTS!r}) AS input),
splits AS (SELECT input, substr(input, 1, i) AS left_part,
                  substr(input, i + 1) AS right_part
           FROM inp, unnest(generate_series(1, length(input) - 1)) g(i))
SELECT s.input, s.left_part, s.right_part,
       dl.freq AS left_freq, dr.freq AS right_freq
FROM splits s
JOIN dict dl ON dl.term = s.left_part
JOIN dict dr ON dr.term = s.right_part
ORDER BY s.input, s.left_part""",
)
def word_break_spell(spark, sf_dir):
    """WordBreakSpellChecker: split run-on words at dictionary boundaries."""
    toks = _tokens(spark, sf_dir)
    dic = (
        toks.select(F.explode("tokens").alias("term"))
        .groupBy("term")
        .agg(F.count("*").alias("freq"))
    )
    inp = spark.createDataFrame([(w,) for w in _WB_INPUTS], "input string")
    splits = inp.select(
        "input",
        F.explode(F.sequence(F.lit(1), F.length("input") - 1)).alias("i"),
    ).select(
        "input",
        F.expr("substring(input, 1, i)").alias("left_part"),
        F.expr("substring(input, i + 1)").alias("right_part"),
    )
    dl = dic.select(
        F.col("term").alias("left_part"), F.col("freq").alias("left_freq")
    )
    dr = dic.select(
        F.col("term").alias("right_part"), F.col("freq").alias("right_freq")
    )
    return (
        splits.join(dl, "left_part")
        .join(dr, "right_part")
        .select("input", "left_part", "right_part", "left_freq", "right_freq")
        .orderBy("input", "left_part")
    )


# ---------------------------------------------------------------------------
# Solr math-expression stream evaluators corr()/regress() (solrj/io/eval/
# CorrelationEvaluator.java, RegressionEvaluator.java): Pearson correlation
# and OLS slope/intercept of l_extendedprice on l_quantity. Cross-engine
# exactness: the five moments are EXACT DECIMAL sums (2-dec inputs, 4-dec
# products — no float accumulation-order drift), cast once to double, and
# both engines fold them through the textually identical closed-form
# formula; round() only guards the final decimal->double conversion ulp.
# Scale shape: one map-combined aggregation, O(1) result.
# ---------------------------------------------------------------------------

_MOMENTS_SQL = """SELECT CAST(count(*) AS DOUBLE) AS n,
  CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sx,
  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sy,
  CAST(sum(CAST(l_quantity AS DECIMAL(18,2)) * CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sxy,
  CAST(sum(CAST(l_quantity AS DECIMAL(18,2)) * CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sxx,
  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS syy
  FROM lineitem"""

_FOLD_SQL = """SELECT
  round((n*sxy - sx*sy) / sqrt((n*sxx - sx*sx) * (n*syy - sy*sy)), 9) AS corr_xy,
  round((n*sxy - sx*sy) / (n*sxx - sx*sx), 9) AS slope,
  round((sy - ((n*sxy - sx*sy) / (n*sxx - sx*sx)) * sx) / n, 6) AS intercept
FROM corr_moments"""


@register(
    "corr_regress_stream",
    f"WITH corr_moments AS ({_MOMENTS_SQL})\n{_FOLD_SQL}",
)
def corr_regress_stream(spark, sf_dir):
    """corr()/regress() stream evaluators: exact-moment Pearson + OLS."""
    li = _read(spark, sf_dir, "lineitem")
    li.createOrReplaceTempView("lineitem")
    moments = spark.sql(_MOMENTS_SQL)
    moments.createOrReplaceTempView("corr_moments")
    return spark.sql(_FOLD_SQL)


# ---------------------------------------------------------------------------
# uniqueBlock(_root_) facet aggregate (solr/core/.../search/facet/
# UniqueBlockAgg.java): child-domain facet buckets counting distinct PARENT
# blocks instead of child docs — lineitem is the child table, l_orderkey the
# _root_. Exact distinct per bucket; Spark's partial/final distinct agg is
# the scalable plan (two-phase, no collect).
# ---------------------------------------------------------------------------


@register(
    "unique_block_facet",
    """SELECT l_returnflag, count(DISTINCT l_orderkey)::BIGINT AS parent_blocks
FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""",
)
def unique_block_facet(spark, sf_dir):
    """uniqueBlock: distinct parent-block count per child facet bucket."""
    return (
        _read(spark, sf_dir, "lineitem")
        .groupBy("l_returnflag")
        .agg(F.countDistinct("l_orderkey").alias("parent_blocks"))
        .orderBy("l_returnflag")
    )


# ---------------------------------------------------------------------------
# PointInSetQuery (lucene/core/.../search/PointInSetQuery.java): numeric
# set membership over a points field — the numeric sibling of the string
# TermInSetQuery row. The IN-list reaches the parquet scan as a pushed
# filter (In/InSet); money sum via DECIMAL(18,2) for exact equality.
# ---------------------------------------------------------------------------

_PIS_KEYS = [3, 14, 97]


@register(
    "point_in_set_query",
    f"""SELECT count(*)::BIGINT AS n_orders,
       sum(CAST(o_totalprice AS DECIMAL(18,2))) AS sum_total
FROM orders WHERE o_custkey IN ({", ".join(map(str, _PIS_KEYS))})""",
)
def point_in_set_query(spark, sf_dir):
    """PointInSetQuery: numeric-set membership with pushed IN filter."""
    return (
        _read(spark, sf_dir, "orders")
        .filter(F.col("o_custkey").isin(_PIS_KEYS))
        .agg(
            F.count("*").alias("n_orders"),
            F.sum(F.col("o_totalprice").cast("decimal(18,2)")).alias("sum_total"),
        )
    )


# ---------------------------------------------------------------------------
# BooleanSimilarity (lucene/core/.../search/similarities/BooleanSimilarity
# .java): score == query boost, ignoring tf/idf/norms entirely — a matched
# clause contributes exactly its boost (1.0 here), so a disjunction's doc
# score is the count of matched terms. Rides the shared _sim_base frame the
# other five similarity rows use (operators/similarity.py:95 implements the
# same formula for the engine path).
# ---------------------------------------------------------------------------


@register(
    "sim_boolean_topk",
    f"""WITH {_sim_cte(_SIM_TERMS)},
scored AS (SELECT doc_id, CAST(1.0 AS DOUBLE) AS s FROM base)
{_SIM_TAIL}""",
)
def sim_boolean_topk(spark, sf_dir):
    """BooleanSimilarity: score = sum of matched-clause boosts (1.0 each)."""
    base = _sim_base(spark, sf_dir, _SIM_TERMS)
    return _sim_topk(base, F.lit(1.0))


# ---------------------------------------------------------------------------
# LM perplexity filter (LLM-data-pipeline op; the CCNet recipe's quality
# gate restated with the corpus's own bigram model instead of KenLM):
# p(w_i | w_{i-1}) = cnt(bigram)/cnt(ctx-as-prev), backing off to
# 0.4 * unigram share for unseen pairs; the first token scores its unigram
# share. Reported as the top-10 most-surprising docs by mean negative log
# likelihood. Scale shape: two hash aggs (unigram/bigram counts) + hash
# joins keyed on terms — the model is a DataFrame, never collected; at
# 100 TB the bigram table shards like any other keyed agg. round(,6)
# absorbs the sub-1e-12 double-summation-order drift within a doc.
# ---------------------------------------------------------------------------

_LM_ALPHA = "0.4"


@register(
    "lm_doc_perplexity",
    f"""WITH tokarr AS (SELECT doc_id, {duckdb_tokenize_sql('text')} AS toks FROM documents),
pos AS (SELECT doc_id, unnest(toks) AS term, generate_subscripts(toks, 1) AS pos FROM tokarr),
uni AS (SELECT term, count(*)::BIGINT AS ucnt FROM pos GROUP BY 1),
utot AS (SELECT count(*)::BIGINT AS ut FROM pos),
bi AS (SELECT a.doc_id, a.pos + 1 AS pos, a.term AS prev, b.term AS cur
       FROM pos a JOIN pos b ON a.doc_id = b.doc_id AND b.pos = a.pos + 1),
bic AS (SELECT prev, cur, count(*)::BIGINT AS bcnt FROM bi GROUP BY 1, 2),
ctx AS (SELECT prev, sum(bcnt)::BIGINT AS ccnt FROM bic GROUP BY 1),
tokp AS (
  SELECT p.doc_id, ln(u.ucnt::DOUBLE / t.ut::DOUBLE) AS lp
  FROM pos p JOIN uni u USING (term) CROSS JOIN utot t WHERE p.pos = 1
  UNION ALL
  SELECT b.doc_id,
         ln(CASE WHEN bc.bcnt IS NOT NULL
                 THEN bc.bcnt::DOUBLE / c.ccnt::DOUBLE
                 ELSE {_LM_ALPHA} * (u.ucnt::DOUBLE / t.ut::DOUBLE) END) AS lp
  FROM bi b
  LEFT JOIN bic bc ON bc.prev = b.prev AND bc.cur = b.cur
  JOIN ctx c ON c.prev = b.prev
  JOIN uni u ON u.term = b.cur
  CROSS JOIN utot t)
SELECT doc_id, round(-avg(lp), 6) AS nll
FROM tokp GROUP BY doc_id ORDER BY nll DESC, doc_id ASC LIMIT 10""",
)
def lm_doc_perplexity(spark, sf_dir):
    """Bigram stupid-backoff LM quality filter: top-10 most-surprising docs."""
    toks = _tokens(spark, sf_dir)
    pos = toks.select(
        "doc_id", F.posexplode("tokens").alias("p0", "term")
    ).select("doc_id", (F.col("p0") + 1).alias("pos"), "term")
    uni = pos.groupBy("term").agg(F.count("*").alias("ucnt"))
    utot = pos.agg(F.count("*").alias("ut"))
    nxt = pos.select(
        "doc_id", (F.col("pos") - 1).alias("pos"), F.col("term").alias("cur")
    )
    bi = pos.join(nxt, ["doc_id", "pos"]).select(
        "doc_id", F.col("term").alias("prev"), "cur"
    )
    bic = bi.groupBy("prev", "cur").agg(F.count("*").alias("bcnt"))
    ctx = bic.groupBy("prev").agg(F.sum("bcnt").alias("ccnt"))
    first = (
        pos.filter(F.col("pos") == 1)
        .join(uni, "term")
        .crossJoin(F.broadcast(utot))
        .select(
            "doc_id",
            F.log(F.col("ucnt").cast("double") / F.col("ut").cast("double")).alias(
                "lp"
            ),
        )
    )
    rest = (
        bi.join(bic, ["prev", "cur"], "left")
        .join(ctx, "prev")
        .join(uni.withColumnRenamed("term", "cur"), "cur")
        .crossJoin(F.broadcast(utot))
        .select(
            "doc_id",
            F.log(
                F.when(
                    F.col("bcnt").isNotNull(),
                    F.col("bcnt").cast("double") / F.col("ccnt").cast("double"),
                ).otherwise(
                    F.lit(float(_LM_ALPHA))
                    * (F.col("ucnt").cast("double") / F.col("ut").cast("double"))
                )
            ).alias("lp"),
        )
    )
    return (
        first.unionByName(rest)
        .groupBy("doc_id")
        .agg(F.round(-F.avg("lp"), 6).alias("nll"))
        .orderBy(F.desc("nll"), F.asc("doc_id"))
        .limit(10)
    )


# ---------------------------------------------------------------------------
# cartesianProduct stream decorator (solrj/io/stream/CartesianProduct
# Stream.java): explodes a multivalued field into one tuple per value,
# preserving the value's ordinal. Here each order's priority label is split
# into its ranked components; the row aggregates the exploded stream so the
# oracle stays order-insensitive. posexplode keeps the decorator JVM-side.
# ---------------------------------------------------------------------------


@register(
    "cartesian_product_stream",
    """WITH arr AS (SELECT string_split(o_orderpriority, '-') AS parts FROM orders),
t AS (SELECT unnest(parts) AS val, generate_subscripts(parts, 1)::BIGINT AS pos FROM arr)
SELECT pos, val, count(*)::BIGINT AS cnt FROM t GROUP BY pos, val ORDER BY pos, val""",
)
def cartesian_product_stream(spark, sf_dir):
    """cartesianProduct: multivalue explode with ordinal, then rollup."""
    return (
        _read(spark, sf_dir, "orders")
        .select(F.posexplode(F.split("o_orderpriority", "-")).alias("p0", "val"))
        .select((F.col("p0") + 1).cast("bigint").alias("pos"), "val")
        .groupBy("pos", "val")
        .agg(F.count("*").alias("cnt"))
        .orderBy("pos", "val")
    )
