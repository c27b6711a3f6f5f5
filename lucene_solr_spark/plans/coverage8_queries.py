"""Round-4 widening batch #3: DFI + Axiomatic similarities, CoveringQuery,
SpanPayloadCheck, the Lucene classification module (naive Bayes + kNN),
Solr's featuresSelection/train streams, TTL document expiration, tolerant
updates, and time-routed alias partitioning.

Each entry re-expresses a reference operator (public lucene-solr path cited
per entry; the reference mount is empty so citations are path#symbol only)
over the driver testdata with a DuckDB oracle using identical column aliases
and cross-engine-exact arithmetic (BIGINT counts, single-op doubles rounded
to 6 places to absorb libm ulp drift on transcendental terms — the same
budget every sim/bm25 row in this catalog uses).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ..functions.analysis import tokenize_text
from .coverage2_queries import _TOKARR_CTE
from .driver_queries import _TOKS_CTE, _bm25_sql, _bm25_spark, _read, _tokens, register
from .solr_queries import _SIM_TAIL, _SIM_TERMS, _sim_base, _sim_cte, _sim_topk

# ---------------------------------------------------------------------------
# DFISimilarity + IndependenceChiSquared
# (lucene/core/.../search/similarities/DFISimilarity.java,
#  IndependenceChiSquared.java): divergence-from-independence scoring.
# expected = (ttf + 1) * docLen / (totalTokens + 1); a term scores only when
# its observed freq EXCEEDS the chance expectation, by
# log2(chi² + 1) with chi² = (freq - expected)² / expected. docLen is the
# byte4-quantized norm value, exactly as every SimilarityBase subclass sees
# it. Same shared per-(doc, term) frame as the other six similarities — one
# aggregation, no extra scan.
# ---------------------------------------------------------------------------


@register(
    "sim_dfi_chisq_topk",
    f"""WITH {_sim_cte(_SIM_TERMS)},
scored AS (SELECT doc_id,
                  CASE WHEN freq <= (ttf + 1) * dlq / (total_tokens + 1) THEN 0
                       ELSE log2(pow(freq - (ttf + 1) * dlq / (total_tokens + 1), 2)
                                 / ((ttf + 1) * dlq / (total_tokens + 1)) + 1)
                  END AS s
           FROM base)
{_SIM_TAIL}""",
)
def sim_dfi_chisq_topk(spark, sf_dir):
    """DFISimilarity(ChiSquared): log2(chi²+1) when freq > expected."""
    base = _sim_base(spark, sf_dir, _SIM_TERMS)
    expected = (F.col("ttf") + 1) * F.col("dlq") / (F.col("total_tokens") + 1)
    chisq = F.pow(F.col("freq") - expected, 2) / expected
    s = F.when(F.col("freq") <= expected, F.lit(0.0)).otherwise(F.log2(chisq + 1))
    return _sim_topk(base, s)


# ---------------------------------------------------------------------------
# AxiomaticF2EXP (lucene/core/.../search/similarities/AxiomaticF2EXP.java,
# base Axiomatic.java): score = tfln * idf with
# tfln = freq / (freq + s + s*docLen/avgdl), idf = ((N+1)/df)^k,
# s = 0.5, k = 0.35 (the class defaults). Eighth similarity on the shared
# frame.
# ---------------------------------------------------------------------------

_AX_S = 0.5
_AX_K = 0.35


@register(
    "sim_axiomatic_f2exp_topk",
    f"""WITH {_sim_cte(_SIM_TERMS)},
scored AS (SELECT doc_id,
                  (freq / (freq + {_AX_S} + {_AX_S} * dlq / avgdl))
                  * pow((n_total + 1) / dft, {_AX_K}) AS s
           FROM base)
{_SIM_TAIL}""",
)
def sim_axiomatic_f2exp_topk(spark, sf_dir):
    """AxiomaticF2EXP: saturating tf times power-law idf."""
    base = _sim_base(spark, sf_dir, _SIM_TERMS)
    tfln = F.col("freq") / (
        F.col("freq") + F.lit(_AX_S) + F.lit(_AX_S) * F.col("dlq") / F.col("avgdl")
    )
    idf = F.pow((F.col("n_total") + 1) / F.col("dft"), F.lit(_AX_K))
    return _sim_topk(base, tfln * idf)


# ---------------------------------------------------------------------------
# CoveringQuery (lucene/sandbox/.../search/CoveringQuery.java): matches docs
# where the NUMBER of matching sub-queries >= a per-document value from a
# LongValuesSource (not a fixed minimumShouldMatch). Here the threshold is
# 1 + (doc_id % 3) — a genuinely per-doc source — over four term clauses.
# Score in the reference is the sum of matching sub-scores; the catalog row
# keeps the exact-integer shape (n_matched) so the gate is bit-exact; the
# BM25-summed variant is what bool_engine_topk already pins.
# ---------------------------------------------------------------------------

_COVER_TERMS = sorted(set(tokenize_text("spark join order filter")))


@register(
    "covering_query",
    f"""WITH {_TOKS_CTE},
tf AS (SELECT doc_id, count(DISTINCT term)::BIGINT AS n_matched
       FROM toks WHERE term IN ({", ".join(f"'{t}'" for t in _COVER_TERMS)})
       GROUP BY doc_id)
SELECT doc_id, n_matched, (1 + doc_id % 3)::BIGINT AS min_match
FROM tf WHERE n_matched >= 1 + doc_id % 3
ORDER BY n_matched DESC, doc_id ASC LIMIT 10""",
)
def covering_query(spark, sf_dir):
    """CoveringQuery: per-doc LongValuesSource threshold on matched-clause
    count. Distinct-term count per doc is one map-combined aggregation."""
    toks = _tokens(spark, sf_dir)
    return (
        toks.select("doc_id", F.explode("tokens").alias("term"))
        .filter(F.col("term").isin(_COVER_TERMS))
        .groupBy("doc_id")
        .agg(F.count_distinct("term").alias("n_matched"))
        .withColumn("min_match", (F.lit(1) + F.col("doc_id") % 3).cast("long"))
        .filter(F.col("n_matched") >= F.col("min_match"))
        .orderBy(F.desc("n_matched"), F.asc("doc_id"))
        .limit(10)
    )


# ---------------------------------------------------------------------------
# SpanPayloadCheckQuery (lucene/queries/.../payloads/SpanPayloadCheckQuery
# .java): a span matches only when the payloads AT THE MATCH POSITIONS equal
# the required payloads. The catalog's payload scheme is position-derived
# (payload_score_topk): here the required payload on the first span leg
# ("spark" immediately before "join") is "even 0-based position", so a
# "spark join" adjacency counts only when the spark token sits at an even
# position. Pure array-lambda codegen per row, exact BIGINT freqs.
# ---------------------------------------------------------------------------


@register(
    "payload_check_query",
    f"""WITH {_TOKARR_CTE},
ph AS (SELECT doc_id,
              CASE WHEN len(t) >= 2 THEN
                len(list_filter(range(1, len(t)),
                                i -> t[i] = 'spark' AND t[i+1] = 'join'
                                     AND (i - 1) % 2 = 0))
              ELSE 0 END::BIGINT AS freq
       FROM tokarr)
SELECT doc_id, freq FROM ph WHERE freq > 0
ORDER BY freq DESC, doc_id ASC LIMIT 10""",
)
def payload_check_query(spark, sf_dir):
    """SpanPayloadCheck: "spark join" adjacency gated on the first leg's
    position-derived payload (even 0-based position)."""
    toks = _tokens(spark, sf_dir)
    t = F.col("tokens")

    def hit(i):
        j = i.cast("int")
        return (
            (F.element_at(t, j) == "spark")
            & (F.element_at(t, j + 1) == "join")
            & (((j - 1) % 2) == 0)
        )

    freq = F.when(
        F.size(t) >= 2,
        F.size(F.filter(F.sequence(F.lit(1), F.size(t) - 1), hit)),
    ).otherwise(F.lit(0))
    return (
        toks.select("doc_id", freq.cast("long").alias("freq"))
        .filter(F.col("freq") > 0)
        .orderBy(F.desc("freq"), F.asc("doc_id"))
        .limit(10)
    )


# ---------------------------------------------------------------------------
# SimpleNaiveBayesClassifier (lucene/classification/.../classification/
# SimpleNaiveBayesClassifier.java): classify input text against the classes
# observed in the index. Pinned variant (documented deviation, consistent
# with the corpus stats this engine keeps): multinomial NB with add-1
# smoothing over token counts —
#   score(c) = ln(docs_c / N) + sum_w ln((tf(w, c) + 1) / (tokens_c + V))
# where V = |vocabulary|. The reference's doc-freq-based likelihood needs
# per-(term, class) doc counts the same aggregation produces; the
# multinomial form is the classic formulation its javadoc cites (McCallum &
# Nigam 1998). Output is the FULL (query, class) score table so the gate
# compares values, not just an argmax that could flip inside the rounding
# budget. Class stats are one aggregation; query terms are literals.
# ---------------------------------------------------------------------------

_NB_QUERIES = [
    ("q1", tokenize_text("spark join order window")),
    ("q2", tokenize_text("group merge filter batch")),
    ("q3", tokenize_text("table scan spark spark")),
]


def _nb_query_values_sql() -> str:
    rows = []
    for qid, terms in _NB_QUERIES:
        for t in terms:
            rows.append(f"('{qid}', '{t}')")
    return ", ".join(rows)


@register(
    "classify_naive_bayes",
    f"""WITH {_TOKS_CTE},
lab AS (SELECT doc_id, lang FROM documents),
cls AS (SELECT l.lang, count(DISTINCT l.doc_id)::DOUBLE AS docs_c,
               count(t.term)::DOUBLE AS tokens_c
        FROM lab l LEFT JOIN toks t USING (doc_id) GROUP BY 1),
tot AS (SELECT count(*)::DOUBLE AS n FROM documents),
voc AS (SELECT count(DISTINCT term)::DOUBLE AS v FROM toks),
ctf AS (SELECT l.lang, t.term, count(*)::DOUBLE AS tf
        FROM toks t JOIN lab l USING (doc_id) GROUP BY 1, 2),
q(query_id, term) AS (VALUES {_nb_query_values_sql()}),
lik AS (SELECT q.query_id, c.lang,
               ln((coalesce(ctf.tf, 0) + 1) / (c.tokens_c + voc.v)) AS ll
        FROM q CROSS JOIN cls c CROSS JOIN voc
        LEFT JOIN ctf ON ctf.lang = c.lang AND ctf.term = q.term)
SELECT l.query_id, l.lang,
       round(ln(c.docs_c / t.n) + sum(l.ll), 6) AS score
FROM lik l JOIN cls c USING (lang) CROSS JOIN tot t
GROUP BY l.query_id, l.lang, c.docs_c, t.n
ORDER BY query_id ASC, score DESC, lang ASC""",
)
def classify_naive_bayes(spark, sf_dir):
    """Multinomial naive Bayes over (lang) classes; full score table."""
    toks = _tokens(spark, sf_dir)
    exploded = toks.select("doc_id", "lang", F.explode("tokens").alias("term"))
    cls = (
        toks.select("doc_id", "lang", F.size("tokens").alias("ntok"))
        .groupBy("lang")
        .agg(
            F.count("*").cast("double").alias("docs_c"),
            F.sum("ntok").cast("double").alias("tokens_c"),
        )
    )
    tot = toks.agg(F.count("*").cast("double").alias("n"))
    voc = exploded.agg(F.count_distinct("term").cast("double").alias("v"))
    qterms = sorted({t for _, terms in _NB_QUERIES for t in terms})
    # Only the query terms' class counts matter for the left join below;
    # filtering first keeps the join broadcastable at any corpus size.
    ctf = (
        exploded.filter(F.col("term").isin(qterms))
        .groupBy("lang", "term")
        .agg(F.count("*").cast("double").alias("tf"))
    )
    qrows = [(qid, t) for qid, terms in _NB_QUERIES for t in terms]
    q = spark.createDataFrame(qrows, "query_id string, term string")
    lik = (
        F.broadcast(q)
        .crossJoin(F.broadcast(cls))
        .crossJoin(F.broadcast(voc))
        .join(F.broadcast(ctf), ["lang", "term"], "left")
        .select(
            "query_id",
            "lang",
            F.log((F.coalesce(F.col("tf"), F.lit(0.0)) + 1) / (F.col("tokens_c") + F.col("v"))).alias("ll"),
        )
    )
    return (
        lik.groupBy("query_id", "lang")
        .agg(F.sum("ll").alias("ll_sum"))
        .join(F.broadcast(cls), "lang")
        .crossJoin(F.broadcast(tot))
        .select(
            "query_id",
            "lang",
            F.round(F.log(F.col("docs_c") / F.col("n")) + F.col("ll_sum"), 6).alias("score"),
        )
        .orderBy(F.asc("query_id"), F.desc("score"), F.asc("lang"))
    )


# ---------------------------------------------------------------------------
# KNearestNeighborClassifier (lucene/classification/.../classification/
# KNearestNeighborClassifier.java): run the input text as a BM25 query, take
# the top-k neighbours, rank classes by vote count then by summed neighbour
# score (the reference's classifyFromTopDocs tie-break). k = 25 over the
# catalog's flagship BM25 machinery; the vote table itself is the output so
# the gate checks counts AND score sums.
# ---------------------------------------------------------------------------

_KNN_TERMS = sorted(set(tokenize_text("spark join order window group")))
_KNN_K = 25


@register(
    "classify_knn",
    f"""WITH knn AS ({_bm25_sql(_KNN_TERMS, _KNN_K, False)})
SELECT d.lang, count(*)::BIGINT AS votes, round(sum(knn.score), 6) AS score_sum
FROM knn JOIN documents d USING (doc_id)
GROUP BY d.lang ORDER BY votes DESC, score_sum DESC, lang ASC""",
)
def classify_knn(spark, sf_dir):
    """kNN classifier: BM25 top-25 neighbours, class votes + score sums."""
    knn = _bm25_spark(spark, sf_dir, _KNN_TERMS, _KNN_K, False)
    docs = _read(spark, sf_dir, "documents").select("doc_id", "lang")
    return (
        knn.join(docs, "doc_id")
        .groupBy("lang")
        .agg(
            F.count("*").alias("votes"),
            F.round(F.sum("score"), 6).alias("score_sum"),
        )
        .orderBy(F.desc("votes"), F.desc("score_sum"), F.asc("lang"))
    )


# ---------------------------------------------------------------------------
# FeaturesSelectionStream (solr/solrj/.../io/stream/FeaturesSelectionStream
# .java + solr/core/.../handler/IGainTermsQParserPlugin.java): rank terms by
# information gain for a binary outcome (here: lang = 'en'), doc-level
# presence. IG(t) = H(C) - [P(t) H(C|t) + P(!t) H(C|!t)] with the usual
# 0·ln0 = 0 guard, identical CASE in both engines. Restricted to terms with
# df >= 20 (the stream's minDocFreq knob) to keep the frame dense; one
# aggregation builds every contingency cell.
# ---------------------------------------------------------------------------

_IG_MIN_DF = 20

_IG_H = (
    "CASE WHEN {x} <= 0 OR {x} >= 1 THEN 0 "
    "ELSE -({x}) * ln({x}) - (1 - ({x})) * ln(1 - ({x})) END"
)


@register(
    "features_info_gain",
    f"""WITH {_TOKS_CTE},
pres AS (SELECT DISTINCT t.doc_id, t.term FROM toks t),
lab AS (SELECT doc_id, CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS y FROM documents),
tot AS (SELECT count(*)::DOUBLE AS n, sum(y)::DOUBLE AS pos FROM lab),
cell AS (SELECT p.term, count(*)::DOUBLE AS df, sum(l.y)::DOUBLE AS df_pos
         FROM pres p JOIN lab l USING (doc_id)
         GROUP BY 1 HAVING count(*) >= {_IG_MIN_DF}),
ig AS (SELECT term,
              ({_IG_H.format(x='t.pos / t.n')})
              - ((c.df / t.n) * ({_IG_H.format(x='c.df_pos / c.df')})
                 + ((t.n - c.df) / t.n)
                   * ({_IG_H.format(x='(t.pos - c.df_pos) / (t.n - c.df)')})) AS gain
       FROM cell c CROSS JOIN tot t)
SELECT term, round(gain, 6) AS ig FROM ig
ORDER BY ig DESC, term ASC LIMIT 10""",
)
def features_info_gain(spark, sf_dir):
    """featuresSelection: top-10 terms by information gain vs lang='en'."""
    toks = _tokens(spark, sf_dir)
    lab = toks.select(
        "doc_id", F.when(F.col("lang") == "en", 1).otherwise(0).alias("y")
    )
    pres = toks.select(
        "doc_id", F.explode(F.array_distinct("tokens")).alias("term")
    )
    tot = lab.agg(
        F.count("*").cast("double").alias("n"),
        F.sum("y").cast("double").alias("pos"),
    )
    cell = (
        pres.join(lab, "doc_id")
        .groupBy("term")
        .agg(
            F.count("*").cast("double").alias("df"),
            F.sum("y").cast("double").alias("df_pos"),
        )
        .filter(F.col("df") >= _IG_MIN_DF)
    )

    def h(x):
        return F.when((x <= 0) | (x >= 1), F.lit(0.0)).otherwise(
            -x * F.log(x) - (1 - x) * F.log(1 - x)
        )

    j = cell.crossJoin(F.broadcast(tot))
    gain = h(F.col("pos") / F.col("n")) - (
        (F.col("df") / F.col("n")) * h(F.col("df_pos") / F.col("df"))
        + ((F.col("n") - F.col("df")) / F.col("n"))
        * h((F.col("pos") - F.col("df_pos")) / (F.col("n") - F.col("df")))
    )
    return (
        j.select("term", F.round(gain, 6).alias("ig"))
        .orderBy(F.desc("ig"), F.asc("term"))
        .limit(10)
    )


# ---------------------------------------------------------------------------
# TextLogitStream (solr/solrj/.../io/stream/TextLogitStream.java): iterative
# logistic-regression training over the corpus — one scatter-gather pass per
# iteration in the reference. Spark redesign (operators/textlogit.py): with
# binary presence features every doc collapses to one of 2^m patterns, so
# ONE map-combined aggregation builds an exact (pattern, label) contingency
# table and full-batch GD runs on that table — identical gradients,
# deterministic to the bit, one distributed pass per TRAINING RUN instead of
# per iteration. Rows-only by declared design (iterative, not
# SQL-expressible); tests/test_textlogit.py pins parity against an
# independent numpy oracle and monotone loss.
# ---------------------------------------------------------------------------

_LOGIT_TERMS = sorted(set(tokenize_text("spark join order window group filter")))


@register("text_logit_train", None)
def text_logit_train(spark, sf_dir):
    """train stream: logistic regression lang='en' ~ term presence."""
    from ..operators.textlogit import train_text_logit

    toks = _tokens(spark, sf_dir)
    weights, bias, losses, err = train_text_logit(
        toks,
        _LOGIT_TERMS,
        (F.col("lang") == "en").cast("int"),
        iters=10,
        lr=0.5,
    )
    rows = [
        (t, round(w, 9), round(bias, 9), round(losses[-1], 9), round(err, 6))
        for t, w in sorted(weights.items())
    ]
    return spark.createDataFrame(
        rows, "feature string, weight double, bias double, loss double, error_rate double"
    )


# ---------------------------------------------------------------------------
# DocExpirationUpdateProcessorFactory (solr/core/.../update/processor/
# DocExpirationUpdateProcessorFactory.java): documents carry a computed
# _expire_at_; a periodic sweep issues deleteByQuery(_expire_at_ < NOW).
# The row pins the sweep's selection semantics at a fixed NOW: orders expire
# 30 days after o_orderdate when already finalized ('F'), 90 days otherwise;
# the sweep at 1997-06-01 reports per-status expired/live counts. Date
# arithmetic + counts — bit-exact, and the predicate is scan-pushable so a
# 100 TB sweep never materializes the live set.
# ---------------------------------------------------------------------------

_TTL_NOW = "1997-06-01"


@register(
    "ttl_expire_sweep",
    f"""SELECT o_orderstatus AS status,
       sum(CASE WHEN o_orderdate + INTERVAL (CASE WHEN o_orderstatus = 'F' THEN 30 ELSE 90 END) DAY
                     < DATE '{_TTL_NOW}' THEN 1 ELSE 0 END)::BIGINT AS n_expired,
       sum(CASE WHEN o_orderdate + INTERVAL (CASE WHEN o_orderstatus = 'F' THEN 30 ELSE 90 END) DAY
                     < DATE '{_TTL_NOW}' THEN 0 ELSE 1 END)::BIGINT AS n_live
FROM orders GROUP BY 1 ORDER BY 1""",
)
def ttl_expire_sweep(spark, sf_dir):
    """TTL expiration sweep: per-status expired vs live at a fixed NOW."""
    o = _read(spark, sf_dir, "orders")
    ttl_days = F.when(F.col("o_orderstatus") == "F", 30).otherwise(90)
    expired = F.date_add(F.col("o_orderdate"), ttl_days) < F.lit(_TTL_NOW).cast("date")
    return (
        o.groupBy(F.col("o_orderstatus").alias("status"))
        .agg(
            F.sum(F.when(expired, 1).otherwise(0)).alias("n_expired"),
            F.sum(F.when(expired, 0).otherwise(1)).alias("n_live"),
        )
        .orderBy("status")
    )


# ---------------------------------------------------------------------------
# TolerantUpdateProcessorFactory (solr/core/.../update/processor/
# TolerantUpdateProcessorFactory.java): a batch with malformed field values
# indexes the good documents and REPORTS the bad ones instead of aborting.
# Malformation is synthesized deterministically (every doc_id ≡ 3 mod 7
# carries a non-numeric value); TRY_CAST is the tolerant coercion in both
# engines, and the row reports indexed/errored counts plus the first error
# ids — exactly the maxErrors-style response shape.
# ---------------------------------------------------------------------------


@register(
    "tolerant_update_errors",
    """WITH batch AS (
  SELECT doc_id,
         CASE WHEN doc_id % 7 = 3 THEN 'x' || doc_id::VARCHAR
              ELSE doc_id::VARCHAR END AS raw_val
  FROM documents),
coerced AS (SELECT doc_id, TRY_CAST(raw_val AS BIGINT) AS v FROM batch)
SELECT count(CASE WHEN v IS NOT NULL THEN 1 END)::BIGINT AS n_indexed,
       count(CASE WHEN v IS NULL THEN 1 END)::BIGINT AS n_errors,
       min(CASE WHEN v IS NULL THEN doc_id END)::BIGINT AS first_error_id
FROM coerced""",
)
def tolerant_update_errors(spark, sf_dir):
    """Tolerant update: good rows index, bad rows counted + first id."""
    d = _read(spark, sf_dir, "documents").select("doc_id")
    raw = F.when(
        F.col("doc_id") % 7 == 3, F.concat(F.lit("x"), F.col("doc_id").cast("string"))
    ).otherwise(F.col("doc_id").cast("string"))
    coerced = d.select("doc_id", raw.alias("raw_val")).withColumn(
        "v", F.expr("try_cast(raw_val as bigint)")
    )
    return coerced.agg(
        F.count(F.when(F.col("v").isNotNull(), 1)).alias("n_indexed"),
        F.count(F.when(F.col("v").isNull(), 1)).alias("n_errors"),
        F.min(F.when(F.col("v").isNull(), F.col("doc_id"))).alias("first_error_id"),
    )


# ---------------------------------------------------------------------------
# TimeRoutedAlias (solr/core/.../cloud/api/collections/TimeRoutedAlias.java,
# solr/core/.../update/processor/TimeRoutedAliasUpdateProcessor.java):
# documents route to a per-period collection ("orders_1997-01") by their
# time field; a range query only touches the collections its window covers.
# The row pins the routing function + per-collection stats over a window;
# the physical pruning claim is the partitioned-write pytest
# (tests/test_coverage8.py) whose plan guard shows untouched months are
# never scanned.
# ---------------------------------------------------------------------------


@register(
    "time_routed_partitions",
    """SELECT 'orders_' || strftime(o_orderdate, '%Y-%m') AS collection,
       count(*)::BIGINT AS n_docs,
       strftime(min(o_orderdate), '%Y-%m-%d') AS d_min,
       strftime(max(o_orderdate), '%Y-%m-%d') AS d_max
FROM orders
WHERE o_orderdate >= DATE '1997-01-01' AND o_orderdate < DATE '1997-07-01'
GROUP BY 1 ORDER BY 1""",
)
def time_routed_partitions(spark, sf_dir):
    """Time-routed alias: month routing + per-collection stats in a window."""
    o = _read(spark, sf_dir, "orders")
    return (
        o.filter(
            (F.col("o_orderdate") >= "1997-01-01")
            & (F.col("o_orderdate") < "1997-07-01")
        )
        .groupBy(
            F.concat(
                F.lit("orders_"), F.date_format("o_orderdate", "yyyy-MM")
            ).alias("collection")
        )
        .agg(
            F.count("*").alias("n_docs"),
            F.date_format(F.min("o_orderdate"), "yyyy-MM-dd").alias("d_min"),
            F.date_format(F.max("o_orderdate"), "yyyy-MM-dd").alias("d_max"),
        )
        .orderBy("collection")
    )
