"""Round-4 widening batch #2: ComplexPhraseQParser (wildcard-in-phrase),
PathHierarchyTokenizer facets, ExternalFileField keyed-float boosting,
the scoreNodes graph stream, and CommonGramsFilter stopword bigrams.

Each entry re-expresses a reference operator (public lucene-solr path cited
per entry; the reference mount is empty so citations are path#symbol only)
over the driver testdata with a DuckDB oracle using identical column aliases
and cross-engine-exact arithmetic (BIGINT counts, single-op doubles, or a
FLOAT cast to absorb libm ulp drift on transcendental idf terms).
Registered into the same REGISTRY/ORACLES as driver_queries.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ..functions.analysis import shingles
from .coverage2_queries import _TOKARR_CTE
from .driver_queries import _read, _tokens, register
from .solr_queries import _SIM_TAIL, _SIM_TERMS, _sim_base, _sim_cte, _sim_topk

# ---------------------------------------------------------------------------
# ComplexPhraseQParser (solr/core/.../search/ComplexPhraseQParserPlugin.java,
# lucene/queryparser/.../complexPhrase/ComplexPhraseQueryParser.java):
# wildcards INSIDE a phrase — "s* order" rewrites the wildcard slot to the
# set of matching index terms and runs the phrase positionally (a
# SpanNear/MultiPhrase over the expansion). Here the expansion never
# materializes a term list: slot 0 is a prefix predicate evaluated at each
# position, slot 1 an exact match at position+1 — per-row array lambdas
# (JVM codegen), exact BIGINT freqs, no shuffle beyond the final top-k.
# ---------------------------------------------------------------------------

_CP_PREFIX = "s"
_CP_NEXT = "order"


@register(
    "complex_phrase_wildcard",
    f"""WITH {_TOKARR_CTE},
ph AS (SELECT doc_id,
              CASE WHEN len(t) >= 2 THEN
                len(list_filter(range(1, len(t)),
                                i -> t[i] LIKE '{_CP_PREFIX}%' AND t[i+1] = '{_CP_NEXT}'))
              ELSE 0 END::BIGINT AS freq
       FROM tokarr)
SELECT doc_id, freq FROM ph WHERE freq > 0
ORDER BY freq DESC, doc_id ASC LIMIT 10""",
)
def complex_phrase_wildcard(spark, sf_dir):
    """ComplexPhrase "s* order": wildcard slot matched positionally, exact
    adjacency freq, top docs by phrase frequency."""
    toks = _tokens(spark, sf_dir)
    t = F.col("tokens")

    def hit(i):
        j = i.cast("int")
        return F.element_at(t, j).startswith(_CP_PREFIX) & (
            F.element_at(t, j + 1) == _CP_NEXT
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
# PathHierarchyTokenizer (lucene/analysis/common/.../path/
# PathHierarchyTokenizer.java): a path "a/b/c" emits the ancestor chain
# a, a/b, a/b/c so prefix facets count every subtree. The driver corpus has
# no path column, so one is derived deterministically (source/lang/bucket) —
# the tokenizer semantics (explode all ancestors, count each) are the thing
# under test. Pure codegen explode + one hash agg; scales as a map-combined
# count at any corpus size.
# ---------------------------------------------------------------------------


@register(
    "path_hierarchy_facet",
    """WITH p AS (SELECT source AS p1,
                       source || '/' || lang AS p2,
                       source || '/' || lang || '/b' || (doc_id % 4)::VARCHAR AS p3
                FROM documents),
u AS (SELECT unnest([p1, p2, p3]) AS path_prefix FROM p)
SELECT path_prefix, count(*)::BIGINT AS cnt FROM u
GROUP BY 1 ORDER BY cnt DESC, path_prefix ASC LIMIT 15""",
)
def path_hierarchy_facet(spark, sf_dir):
    """PathHierarchyTokenizer facet: every ancestor prefix of the derived
    source/lang/bucket path is a term; top prefixes by count."""
    d = _read(spark, sf_dir, "documents")
    p2 = F.concat_ws("/", "source", "lang")
    p3 = F.concat_ws(
        "/", "source", "lang", F.concat(F.lit("b"), (F.col("doc_id") % 4).cast("string"))
    )
    return (
        d.select(F.explode(F.array(F.col("source"), p2, p3)).alias("path_prefix"))
        .groupBy("path_prefix")
        .agg(F.count("*").alias("cnt"))
        .orderBy(F.desc("cnt"), F.asc("path_prefix"))
        .limit(15)
    )


# ---------------------------------------------------------------------------
# ExternalFileField (solr/core/.../schema/ExternalFileField.java +
# function/FileFloatSource.java): per-key floats maintained OUTSIDE the
# index (keyed file, reloaded on commit) usable only inside function
# queries. Analog: a keyed boost table joined at query time — the index is
# never rewritten when boosts change. Broadcast hash join (the external
# side is tiny by construction), score = one int×double multiply (exact in
# both engines), TakeOrderedAndProject top-k.
# ---------------------------------------------------------------------------

_EFF_BOOSTS = [("en", 1.5), ("de", 1.25), ("fr", 1.1), ("es", 1.0), ("zh", 0.75)]


@register(
    "external_file_boost",
    f"""WITH ef(lang, boost) AS (VALUES {", ".join(f"('{k}', {v})" for k, v in _EFF_BOOSTS)})
SELECT d.doc_id, (d.n_chars::DOUBLE * ef.boost) AS score
FROM documents d JOIN ef ON ef.lang = d.lang
ORDER BY score DESC, d.doc_id ASC LIMIT 10""",
)
def external_file_boost(spark, sf_dir):
    """ExternalFileField: external keyed floats joined at query time into a
    function-query score (n_chars * boost), top-k."""
    d = _read(spark, sf_dir, "documents")
    ef = spark.createDataFrame(_EFF_BOOSTS, "lang string, boost double")
    return (
        d.join(F.broadcast(ef), "lang")
        .select(
            "doc_id",
            (F.col("n_chars").cast("double") * F.col("boost")).alias("score"),
        )
        .orderBy(F.desc("score"), F.asc("doc_id"))
        .limit(10)
    )


# ---------------------------------------------------------------------------
# scoreNodes stream (solr/solrj/.../io/stream/ScoreNodesStream.java): after
# gatherNodes, nodes are re-scored tf-idf style — the traversal count is the
# "tf", the node term's docFreq in the index supplies the idf — so hub nodes
# reached often but ubiquitous overall rank below selective ones. Analog on
# the TPC-H graph: customers of GERMANY -> their orders -> lineitem
# suppliers; cnt = times reached, df = the supplier's total lineitems, N =
# all lineitems. score = (cnt * ln(1 + N/df))::FLOAT — the f32 cast absorbs
# libm ulp drift between engines (same pattern as the bm25 idf rows). All
# shuffled hash joins/aggs, no collect.
# ---------------------------------------------------------------------------


@register(
    "graph_score_nodes",
    """WITH hits AS (
  SELECT l.l_suppkey AS node, count(*)::BIGINT AS cnt
  FROM nation n
  JOIN customer c ON c.c_nationkey = n.n_nationkey
  JOIN orders o ON o.o_custkey = c.c_custkey
  JOIN lineitem l ON l.l_orderkey = o.o_orderkey
  WHERE n.n_name = 'GERMANY'
  GROUP BY 1),
df AS (SELECT l_suppkey AS node, count(*)::BIGINT AS df FROM lineitem GROUP BY 1),
tot AS (SELECT count(*)::BIGINT AS n FROM lineitem)
SELECT h.node, h.cnt,
       ((h.cnt::DOUBLE) * ln(1 + t.n::DOUBLE / d.df::DOUBLE))::FLOAT AS score
FROM hits h JOIN df d ON d.node = h.node CROSS JOIN tot t
ORDER BY score DESC, h.node ASC LIMIT 10""",
)
def graph_score_nodes(spark, sf_dir):
    """scoreNodes: tf-idf re-scoring of gathered supplier nodes (traversal
    count x inverse lineitem frequency)."""
    nation = _read(spark, sf_dir, "nation").filter(F.col("n_name") == "GERMANY")
    cust = _read(spark, sf_dir, "customer").join(
        F.broadcast(nation), F.col("c_nationkey") == F.col("n_nationkey")
    )
    orders = _read(spark, sf_dir, "orders").join(
        cust.select("c_custkey"), F.col("o_custkey") == F.col("c_custkey")
    )
    li = _read(spark, sf_dir, "lineitem")
    hits = (
        li.join(orders.select("o_orderkey"), F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy(F.col("l_suppkey").alias("node"))
        .agg(F.count("*").alias("cnt"))
    )
    df = li.groupBy(F.col("l_suppkey").alias("node")).agg(F.count("*").alias("df"))
    tot = li.agg(F.count("*").alias("n"))
    return (
        hits.join(df, "node")
        .crossJoin(F.broadcast(tot))
        .select(
            "node",
            "cnt",
            (
                F.col("cnt").cast("double")
                * F.log(1.0 + F.col("n").cast("double") / F.col("df").cast("double"))
            )
            .cast("float")
            .alias("score"),
        )
        .orderBy(F.desc("score"), F.asc("node"))
        .limit(10)
    )


# ---------------------------------------------------------------------------
# CommonGramsFilter (lucene/analysis/common/.../commongrams/
# CommonGramsFilter.java): adjacent pairs where either side is a common
# word are emitted as single "w1_w2" gram tokens so phrase queries over
# stopwords stay fast without dropping them. Row: the gram vocabulary the
# filter would add, top grams by frequency. One shingle pass (JVM
# higher-order fn) + map-combined count.
# ---------------------------------------------------------------------------

# ---------------------------------------------------------------------------
# SweetSpotSimilarity (lucene/misc/.../SweetSpotSimilarity.java): Classic
# scoring with a PLATEAU length norm — docs whose length falls inside the
# configured sweet spot [min, max] take norm 1.0 and shorter/longer docs
# decay hyperbolically, instead of Classic's monotone 1/sqrt(dl) that always
# favors short docs. ln(l) = 1/sqrt(steepness*(|l-min|+|l-max|-(max-min))+1),
# steepness=0.5, min=3, max=10; tf/idf inherited from Classic. Seventh
# similarity row on the shared per-(doc,term) frame — same shuffle shape.
# ---------------------------------------------------------------------------

_SS_MIN, _SS_MAX, _SS_STEEP = 3, 10, 0.5


@register(
    "sim_sweetspot_topk",
    f"""WITH {_sim_cte(_SIM_TERMS)},
scored AS (SELECT doc_id, sqrt(freq) * pow(1.0 + ln((n_total + 1)/(dft + 1)), 2)
                  / sqrt({_SS_STEEP} * (abs(dlq - {_SS_MIN}) + abs(dlq - {_SS_MAX})
                                        - {_SS_MAX - _SS_MIN}) + 1) AS s FROM base)
{_SIM_TAIL}""",
)
def sim_sweetspot_topk(spark, sf_dir):
    """SweetSpotSimilarity: Classic tf/idf with the plateau length norm."""
    base = _sim_base(spark, sf_dir, _SIM_TERMS)
    s = (
        F.sqrt(F.col("freq"))
        * F.pow(1.0 + F.log((F.col("n_total") + 1) / (F.col("dft") + 1)), 2)
        / F.sqrt(
            _SS_STEEP
            * (
                F.abs(F.col("dlq") - _SS_MIN)
                + F.abs(F.col("dlq") - _SS_MAX)
                - (_SS_MAX - _SS_MIN)
            )
            + 1.0
        )
    )
    return _sim_topk(base, s)


# ---------------------------------------------------------------------------
# DiversifiedTopDocsCollector (lucene/misc/.../search/
# DiversifiedTopDocsCollector.java): global top-k with AT MOST maxHitsPerKey
# hits per key (de-duplicating e.g. one artist dominating a chart). Analog:
# key = lang, maxHitsPerKey = 2, k = 6, score = n_chars (exact ints).
# Spark: row_number windowed BY KEY (hash-partitioned, never a global
# single-partition window) then a global TakeOrderedAndProject — the same
# two-stage shape survives any corpus size.
# ---------------------------------------------------------------------------

_DIV_PER_KEY, _DIV_K = 2, 6


@register(
    "diversified_topk",
    f"""WITH r AS (SELECT doc_id, lang, n_chars,
         row_number() OVER (PARTITION BY lang ORDER BY n_chars DESC, doc_id ASC) AS rn
       FROM documents)
SELECT doc_id, lang, n_chars FROM r WHERE rn <= {_DIV_PER_KEY}
ORDER BY n_chars DESC, doc_id ASC LIMIT {_DIV_K}""",
)
def diversified_topk(spark, sf_dir):
    """DiversifiedTopDocsCollector: top-k capped at maxHitsPerKey per lang."""
    from pyspark.sql import Window

    d = _read(spark, sf_dir, "documents")
    w = Window.partitionBy("lang").orderBy(F.desc("n_chars"), F.asc("doc_id"))
    return (
        d.select("doc_id", "lang", "n_chars", F.row_number().over(w).alias("rn"))
        .filter(F.col("rn") <= _DIV_PER_KEY)
        .drop("rn")
        .orderBy(F.desc("n_chars"), F.asc("doc_id"))
        .limit(_DIV_K)
    )


# ---------------------------------------------------------------------------
# [subquery] doc transformer (solr/core/.../response/transform/
# SubQueryAugmenterFactory.java): every result doc carries the result of a
# per-doc subquery (e.g. same-source related docs). Analog: top-5 'en' docs
# by n_chars, each augmented with the top-2 doc_ids sharing its source. The
# related sets are computed ONCE per source key (key-partitioned window +
# ordered string_agg), then broadcast-joined to the parent top-k — the
# per-result-doc query never re-executes per row (N+1-free, the scale-safe
# reading of the transformer).
# ---------------------------------------------------------------------------

_SQ_PER_SRC, _SQ_K = 2, 5


@register(
    "subquery_transformer",
    f"""WITH rel AS (SELECT source, doc_id,
         row_number() OVER (PARTITION BY source ORDER BY n_chars DESC, doc_id ASC) AS rn
       FROM documents),
agg AS (SELECT source, string_agg(doc_id::VARCHAR, ',' ORDER BY rn) AS related
        FROM rel WHERE rn <= {_SQ_PER_SRC} GROUP BY source),
parents AS (SELECT doc_id, source, n_chars FROM documents WHERE lang = 'en'
            ORDER BY n_chars DESC, doc_id ASC LIMIT {_SQ_K})
SELECT p.doc_id, p.source, p.n_chars, a.related
FROM parents p JOIN agg a USING (source)
ORDER BY p.n_chars DESC, p.doc_id ASC""",
)
def subquery_transformer(spark, sf_dir):
    """[subquery] transformer: top-k docs each augmented with their
    same-source related doc ids (comma-joined, rank order)."""
    from pyspark.sql import Window

    d = _read(spark, sf_dir, "documents")
    w = Window.partitionBy("source").orderBy(F.desc("n_chars"), F.asc("doc_id"))
    rel = (
        d.select("source", "doc_id", F.row_number().over(w).alias("rn"))
        .filter(F.col("rn") <= _SQ_PER_SRC)
        .groupBy("source")
        .agg(
            F.concat_ws(
                ",",
                F.transform(
                    F.sort_array(F.collect_list(F.struct("rn", "doc_id"))),
                    lambda x: x["doc_id"].cast("string"),
                ),
            ).alias("related")
        )
    )
    parents = (
        d.filter(F.col("lang") == "en")
        .select("doc_id", "source", "n_chars")
        .orderBy(F.desc("n_chars"), F.asc("doc_id"))
        .limit(_SQ_K)
    )
    return parents.join(F.broadcast(rel), "source").select(
        "doc_id", "source", "n_chars", "related"
    ).orderBy(F.desc("n_chars"), F.asc("doc_id"))


# ---------------------------------------------------------------------------
# facet.range.other (solr/core/.../request/SimpleFacets.java,
# RangeFacetProcessor — the other=all param): alongside the gap buckets,
# Solr reports before (< start), after (>= end) and between (the covered
# span). One conditional-aggregation pass (map-combined), bucket rows
# unioned with three scalar rows — exact BIGINT counts.
# ---------------------------------------------------------------------------

_FRO_START, _FRO_END, _FRO_GAP = 20.0, 80.0, 20.0


@register(
    "facet_range_other",
    f"""WITH b AS (SELECT 'bucket_' || CAST(({_FRO_START} + {_FRO_GAP} * floor((value - {_FRO_START}) / {_FRO_GAP}))::BIGINT AS VARCHAR) AS label,
            count(*)::BIGINT AS cnt
     FROM events WHERE value >= {_FRO_START} AND value < {_FRO_END} GROUP BY 1),
o AS (SELECT 'before' AS label, sum(CASE WHEN value < {_FRO_START} THEN 1 ELSE 0 END)::BIGINT AS cnt FROM events
      UNION ALL
      SELECT 'after', sum(CASE WHEN value >= {_FRO_END} THEN 1 ELSE 0 END)::BIGINT FROM events
      UNION ALL
      SELECT 'between', sum(CASE WHEN value >= {_FRO_START} AND value < {_FRO_END} THEN 1 ELSE 0 END)::BIGINT FROM events)
SELECT label, cnt FROM b UNION ALL SELECT label, cnt FROM o
ORDER BY label ASC""",
)
def facet_range_other(spark, sf_dir):
    """Range facet with other=all: gap buckets plus before/after/between."""
    e = _read(spark, sf_dir, "events")
    v = F.col("value")
    buckets = (
        e.filter((v >= _FRO_START) & (v < _FRO_END))
        .groupBy(
            F.concat(
                F.lit("bucket_"),
                (
                    _FRO_START + _FRO_GAP * F.floor((v - _FRO_START) / _FRO_GAP)
                )
                .cast("long")
                .cast("string"),
            ).alias("label")
        )
        .agg(F.count("*").alias("cnt"))
    )
    other = e.agg(
        F.sum(F.when(v < _FRO_START, 1).otherwise(0)).alias("before"),
        F.sum(F.when(v >= _FRO_END, 1).otherwise(0)).alias("after"),
        F.sum(F.when((v >= _FRO_START) & (v < _FRO_END), 1).otherwise(0)).alias(
            "between"
        ),
    ).select(
        F.explode(
            F.create_map(
                F.lit("before"), F.col("before"),
                F.lit("after"), F.col("after"),
                F.lit("between"), F.col("between"),
            )
        ).alias("label", "cnt")
    )
    return buckets.unionByName(other).orderBy(F.asc("label"))


# ---------------------------------------------------------------------------
# MoreLikeThis#retrieveInterestingTerms (lucene/queries/.../mlt/
# MoreLikeThis.java): the term-selection half of MLT — the seed doc's terms
# ranked by tf-in-seed x idf with minTermFreq/minDocFreq gates, BEFORE any
# doc query runs (Solr's mlt.interestingTerms=details). idf = ln(N/df)
# (classic MLT), score cast to FLOAT to absorb libm ulp drift. The seed tf
# is one filtered row, df one map-combined distinct agg.
# ---------------------------------------------------------------------------

_MLT_SEED, _MLT_MINTF, _MLT_MINDF = 0, 1, 2


@register(
    "mlt_interesting_terms",
    f"""WITH {_TOKARR_CTE},
toks AS (SELECT doc_id, unnest(t) AS term FROM tokarr),
seed AS (SELECT term, count(*)::BIGINT AS tf FROM toks
         WHERE doc_id = {_MLT_SEED} GROUP BY 1),
df AS (SELECT term, count(DISTINCT doc_id)::BIGINT AS df FROM toks GROUP BY 1),
n AS (SELECT count(*)::BIGINT AS n_docs FROM documents)
SELECT s.term, (s.tf::DOUBLE * ln(n.n_docs::DOUBLE / d.df::DOUBLE))::FLOAT AS score
FROM seed s JOIN df d USING (term) CROSS JOIN n
WHERE s.tf >= {_MLT_MINTF} AND d.df >= {_MLT_MINDF}
ORDER BY score DESC, s.term ASC LIMIT 10""",
)
def mlt_interesting_terms(spark, sf_dir):
    """MLT interestingTerms: seed-doc terms ranked tf x ln(N/df) with
    min-tf/min-df gates."""
    toks = _tokens(spark, sf_dir)
    pairs = toks.select("doc_id", F.explode("tokens").alias("term"))
    seed = (
        pairs.filter(F.col("doc_id") == _MLT_SEED)
        .groupBy("term")
        .agg(F.count("*").alias("tf"))
        .filter(F.col("tf") >= _MLT_MINTF)
    )
    df = pairs.groupBy("term").agg(F.countDistinct("doc_id").alias("df"))
    n = _read(spark, sf_dir, "documents").agg(F.count("*").alias("n_docs"))
    return (
        seed.join(df, "term")
        .filter(F.col("df") >= _MLT_MINDF)
        .crossJoin(F.broadcast(n))
        .select(
            "term",
            (
                F.col("tf").cast("double")
                * F.log(F.col("n_docs").cast("double") / F.col("df").cast("double"))
            )
            .cast("float")
            .alias("score"),
        )
        .orderBy(F.desc("score"), F.asc("term"))
        .limit(10)
    )


# ---------------------------------------------------------------------------
# Per-bucket percentile (search/facet/PercentileAgg.java inside a field
# facet — json.facet {type:terms, facet:{p50:"percentile(v,50)"}}): exact
# interpolated median per bucket. Spark `percentile` == DuckDB
# quantile_cont (same linear interpolation); round(6) absorbs ordering
# drift. Hash-partitioned group agg — no global sort.
# ---------------------------------------------------------------------------


@register(
    "group_percentile_agg",
    """SELECT event_type, round(quantile_cont(value, 0.5), 6) AS p50,
       count(*)::BIGINT AS cnt
FROM events GROUP BY event_type ORDER BY event_type ASC""",
)
def group_percentile_agg(spark, sf_dir):
    """Facet-bucket percentile: exact interpolated p50 of value per
    event_type."""
    return (
        _read(spark, sf_dir, "events")
        .groupBy("event_type")
        .agg(
            F.round(F.expr("percentile(value, 0.5)"), 6).alias("p50"),
            F.count("*").alias("cnt"),
        )
        .orderBy(F.asc("event_type"))
    )


# ---------------------------------------------------------------------------
# Solr Text Tagger (solr/core/.../handler/tagger/TaggerRequestHandler.java,
# the SolrTextTagger /tag handler): stream text past a dictionary of
# entities, emitting LONGEST dominant-right matches — a 1-gram entry is
# suppressed wherever a 2-gram entry covers the same position. Dictionary:
# {"big data"} (2-gram) + {"data", "spark"} (1-grams); 'data' counts only
# when NOT the tail of 'big data'. Per-row array lambdas (JVM codegen),
# corpus-wide tag totals via one map-combined agg.
# ---------------------------------------------------------------------------


@register(
    "text_tagger",
    f"""WITH {_TOKARR_CTE},
per AS (SELECT doc_id,
  CASE WHEN len(t) >= 2 THEN len(list_filter(range(1, len(t)), i -> t[i] = 'big' AND t[i+1] = 'data')) ELSE 0 END AS n_bigdata,
  len(list_filter(range(1, len(t) + 1), i -> t[i] = 'data' AND (i = 1 OR t[i-1] <> 'big'))) AS n_data,
  len(list_filter(range(1, len(t) + 1), i -> t[i] = 'spark')) AS n_spark
 FROM tokarr)
SELECT tag, cnt FROM (
  SELECT 'big data' AS tag, sum(n_bigdata)::BIGINT AS cnt FROM per
  UNION ALL SELECT 'data', sum(n_data)::BIGINT FROM per
  UNION ALL SELECT 'spark', sum(n_spark)::BIGINT FROM per)
ORDER BY tag ASC""",
)
def text_tagger(spark, sf_dir):
    """SolrTextTagger: longest-match entity tagging — corpus totals per tag,
    1-gram 'data' suppressed under the 2-gram 'big data'."""
    toks = _tokens(spark, sf_dir)
    t = F.col("tokens")

    def n_bigdata():
        return F.when(
            F.size(t) >= 2,
            F.size(
                F.filter(
                    F.sequence(F.lit(1), F.size(t) - 1),
                    lambda i: (F.element_at(t, i.cast("int")) == "big")
                    & (F.element_at(t, i.cast("int") + 1) == "data"),
                )
            ),
        ).otherwise(F.lit(0))

    def n_unigram(term, suppress_after=None):
        def pred(i):
            j = i.cast("int")
            c = F.element_at(t, j) == term
            if suppress_after is not None:
                c = c & ((j == 1) | (F.element_at(t, j - 1) != suppress_after))
            return c

        return F.size(F.filter(F.sequence(F.lit(1), F.size(t)), pred))

    per = toks.select(
        n_bigdata().alias("n_bigdata"),
        n_unigram("data", suppress_after="big").alias("n_data"),
        n_unigram("spark").alias("n_spark"),
    )
    agg = per.agg(
        F.sum("n_bigdata").alias("big data"),
        F.sum("n_data").alias("data"),
        F.sum("n_spark").alias("spark"),
    )
    return agg.select(
        F.explode(
            F.create_map(
                F.lit("big data"), F.col("big data"),
                F.lit("data"), F.col("data"),
                F.lit("spark"), F.col("spark"),
            )
        ).alias("tag", "cnt")
    ).orderBy(F.asc("tag"))


# ---------------------------------------------------------------------------
# Heavy hitters via a mergeable Misra-Gries sketch (operators/sketches.py;
# "Mergeable Summaries", PODS'12). Solr's exact top-N term facets
# (search/facet/FacetFieldProcessor.java) shuffle the full term
# cardinality; at 10^12 files the bounded-memory sketch (<= k rows per
# partition shuffled, error <= N/(k+1)) is the scale path. Deterministic
# contract (HLL-row pattern): the exact heavy-hitter count and top term —
# identical in both engines — plus booleans the Spark side GENUINELY
# verifies against the sketch (coverage of every true heavy hitter, and
# lower-bound validity within the merged error budget); the oracle pins
# them true.
# ---------------------------------------------------------------------------

_MG_K = 8


@register(
    "heavy_hitters_sketch",
    f"""WITH {_TOKARR_CTE},
toks AS (SELECT doc_id, unnest(t) AS term FROM tokarr),
exact AS (SELECT term, count(*)::BIGINT AS cnt FROM toks GROUP BY 1),
s AS (SELECT sum(cnt)::DOUBLE AS n FROM exact),
top AS (SELECT term, cnt FROM exact ORDER BY cnt DESC, term ASC LIMIT 1),
hv AS (SELECT count(*)::BIGINT AS n_heavy
       FROM exact CROSS JOIN s WHERE cnt > s.n / {_MG_K + 1})
SELECT hv.n_heavy, true AS covers_heavy, true AS bounds_valid,
       top.term AS top_term, top.cnt AS top_cnt
FROM hv CROSS JOIN top""",
)
def heavy_hitters_sketch(spark, sf_dir):
    """Misra-Gries heavy hitters: bounded-memory candidate sketch verified
    against the exact counts (coverage + lower-bound budget)."""
    from ..operators.sketches import misra_gries_candidates

    pairs = _tokens(spark, sf_dir).select(F.explode("tokens").alias("term"))
    sketch = misra_gries_candidates(pairs, "term", _MG_K)
    exact = pairs.groupBy("term").agg(F.count("*").alias("cnt"))
    tot = exact.agg(F.sum("cnt").cast("double").alias("n"))
    thr = F.col("n") / (_MG_K + 1)
    j = exact.join(sketch, "term", "left").crossJoin(F.broadcast(tot))
    flags = j.agg(
        F.sum(F.when(F.col("cnt") > thr, 1).otherwise(0))
        .cast("long")
        .alias("n_heavy"),
        (
            F.min(
                F.when(F.col("cnt") > thr, F.col("bound").isNotNull())
                .otherwise(F.lit(True))
                .cast("int")
            )
            == 1
        ).alias("covers_heavy"),
        (
            F.min(
                (
                    F.col("bound").isNull()
                    | (
                        (F.col("bound") <= F.col("cnt"))
                        & (F.col("bound") >= F.col("cnt") - thr)
                    )
                ).cast("int")
            )
            == 1
        ).alias("bounds_valid"),
    )
    top = (
        exact.orderBy(F.desc("cnt"), F.asc("term"))
        .limit(1)
        .select(F.col("term").alias("top_term"), F.col("cnt").alias("top_cnt"))
    )
    return flags.crossJoin(F.broadcast(top))


# ---------------------------------------------------------------------------
# Mergeable quantile sketch (Spark's approx_percentile = Greenwald-Khanna
# QuantileSummaries; the scale sibling of the exact `percentile_agg` row
# the way `heavy_hitters_sketch` is for term facets — exact percentiles
# need a full sort/shuffle of the value column, the GK summary shuffles
# O(accuracy) tuples per partition). Deterministic contract (HLL-row
# pattern): exact p50/p95 identical in both engines, plus a boolean the
# Spark side GENUINELY verifies — the sketch's answers land within the
# documented rank-error budget N/accuracy of their targets.
# ---------------------------------------------------------------------------

_QS_ACC = 100  # rank error <= N/accuracy


@register(
    "quantile_sketch_agg",
    """WITH s AS (SELECT round(quantile_cont(value, 0.5), 6) AS p50_exact,
                round(quantile_cont(value, 0.95), 6) AS p95_exact FROM events)
SELECT p50_exact, p95_exact, true AS within_rank_budget FROM s""",
)
def quantile_sketch_agg(spark, sf_dir):
    """GK quantile sketch vs exact: exact p50/p95 plus a verified
    rank-error-budget attestation for the sketch answers."""
    e = _read(spark, sf_dir, "events").select("value")
    row = e.agg(
        F.expr("percentile(value, 0.5)").alias("p50_exact"),
        F.expr("percentile(value, 0.95)").alias("p95_exact"),
        F.expr(f"approx_percentile(value, 0.5, {_QS_ACC})").alias("p50_apx"),
        F.expr(f"approx_percentile(value, 0.95, {_QS_ACC})").alias("p95_apx"),
        F.count("*").alias("n"),
    )
    # rank of the sketch answer must sit within n/accuracy of the target
    # rank; computed distributed (two conditional counts), no sort
    apx = row.collect()[0]
    budget = apx["n"] / _QS_ACC
    ranks = e.agg(
        F.sum((F.col("value") <= apx["p50_apx"]).cast("long")).alias("r50"),
        F.sum((F.col("value") <= apx["p95_apx"]).cast("long")).alias("r95"),
    ).collect()[0]
    ok = (
        abs(ranks["r50"] - 0.5 * apx["n"]) <= budget
        and abs(ranks["r95"] - 0.95 * apx["n"]) <= budget
    )
    # F.round (HALF_UP, matches DuckDB) — not Python round (banker's)
    return spark.createDataFrame(
        [(float(apx["p50_exact"]), float(apx["p95_exact"]), bool(ok))],
        "p50_exact double, p95_exact double, within_rank_budget boolean",
    ).select(
        F.round("p50_exact", 6).alias("p50_exact"),
        F.round("p95_exact", 6).alias("p95_exact"),
        "within_rank_budget",
    )


_CG_COMMON = ("a", "the")


@register(
    "common_grams_tokens",
    f"""WITH {_TOKARR_CTE},
pos AS (SELECT doc_id, unnest(t) AS term, generate_subscripts(t, 1) AS pos FROM tokarr),
bi AS (SELECT a.term AS w1, b.term AS w2
       FROM pos a JOIN pos b ON a.doc_id = b.doc_id AND b.pos = a.pos + 1)
SELECT w1 || '_' || w2 AS gram, count(*)::BIGINT AS cnt
FROM bi
WHERE w1 IN {_CG_COMMON} OR w2 IN {_CG_COMMON}
GROUP BY 1 ORDER BY cnt DESC, gram ASC LIMIT 10""",
)
def common_grams_tokens(spark, sf_dir):
    """CommonGramsFilter: stopword-adjacent bigrams as single gram tokens,
    top grams by corpus frequency."""
    toks = _tokens(spark, sf_dir)
    bi = toks.select(F.explode(shingles(F.col("tokens"), 2)).alias("bg")).select(
        F.substring_index("bg", " ", 1).alias("w1"),
        F.substring_index("bg", " ", -1).alias("w2"),
    )
    common = list(_CG_COMMON)
    return (
        bi.filter(F.col("w1").isin(common) | F.col("w2").isin(common))
        .select(F.concat_ws("_", "w1", "w2").alias("gram"))
        .groupBy("gram")
        .agg(F.count("*").alias("cnt"))
        .orderBy(F.desc("cnt"), F.asc("gram"))
        .limit(10)
    )
