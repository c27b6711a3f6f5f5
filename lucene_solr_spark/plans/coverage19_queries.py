"""Round-5 widening batch #10: token-level MinHash, keyword-repeat /
stemmer-override analysis chains, pattern capture groups, termfreq/docfreq
function queries (engine-path), KNN euclidean, and the merge/unique
streaming-expression sorts.

Each entry re-expresses a reference component (public lucene-solr
path#symbol cited per entry; the reference mount is empty) over the driver
testdata with a DuckDB oracle using identical column aliases.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from ..operators import ann
from ..operators.dedup import DUCK_H60, h60
from .driver_queries import _TOKS_CTE, _read, register

# ---------------------------------------------------------------------------
# MinHashFilter — lucene/analysis/common/src/java/org/apache/lucene/
# analysis/minhash/MinHashFilter.java (hashCount=1, hashSetSize=k): the
# TOKEN-FILTER that keeps the k smallest hashes of the shingle stream and
# emits them as tokens (LUCENE-6968) — the indexing-side primitive under
# min-hash similarity search. Distinct from dedup_minhash_lsh (the banded
# doc-level signature): this row pins the filter's own contract — per-doc
# DISTINCT shingle hashes, k smallest kept — then counts how many docs
# emit each surviving minhash token (the cross-doc repetition signal the
# filter exists to create). Hash = 60-bit md5 prefix, the cross-engine
# convention of dataops_queries. Scale shape: shingling + hashing are
# per-row codegen; the per-doc k-smallest is one window over (doc_id, h)
# — partitioned by doc, no global sort; the final count is one agg.
# ---------------------------------------------------------------------------

_MH_K = 3


@register(
    "minhash_filter_sig",
    f"""WITH tokarr AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
sh AS (SELECT DISTINCT doc_id, t[i] || ' ' || t[i+1] || ' ' || t[i+2] AS shingle
       FROM tokarr, (SELECT unnest(range(1, 4000)) AS i) ix WHERE i + 2 <= len(t)),
h AS (SELECT DISTINCT doc_id,
             {DUCK_H60.format(e='shingle')} AS mh FROM sh),
r AS (SELECT doc_id, mh,
             row_number() OVER (PARTITION BY doc_id ORDER BY mh ASC) AS rn
      FROM h)
SELECT mh, count(*)::BIGINT AS n_docs
FROM r WHERE rn <= {_MH_K}
GROUP BY mh ORDER BY n_docs DESC, mh ASC LIMIT 20""",
)
def minhash_filter_sig(spark, sf_dir):
    """MinHashFilter(hashSetSize=3) over 3-shingles: docs per surviving
    minhash token, top-20."""
    d = _read(spark, sf_dir, "documents")
    sh = (
        d.where(F.size(F.split("text", " ")) >= 3)
        .select(
            "doc_id",
            F.explode(
                F.array_distinct(
                    F.expr(
                        "transform(sequence(1, size(split(text,' ')) - 2),"
                        " i -> concat_ws(' ', slice(split(text,' '), i, 3)))"
                    )
                )
            ).alias("shingle"),
        )
    )
    h = sh.select("doc_id", h60(F.col("shingle")).alias("mh")).distinct()
    w = Window.partitionBy("doc_id").orderBy(F.asc("mh"))
    kept = h.withColumn("rn", F.row_number().over(w)).where(F.col("rn") <= _MH_K)
    return (
        kept.groupBy("mh")
        .agg(F.count("*").alias("n_docs"))
        .orderBy(F.desc("n_docs"), F.asc("mh"))
        .limit(20)
    )


# ---------------------------------------------------------------------------
# KeywordRepeatFilter + EnglishMinimalStemFilter + RemoveDuplicatesTokenFilter
# — lucene/analysis/common/.../miscellaneous/KeywordRepeatFilter.java,
# en/EnglishMinimalStemFilter.java (EnglishMinimalStemmer: drop a trailing
# 's' when len >= 3 and the preceding char is not 'u'/'s'),
# miscellaneous/RemoveDuplicatesTokenFilter.java: the classic "index both
# the surface form and the stem at the same position" chain; the dedup
# filter collapses the pair when the stemmer was a no-op. The driver
# corpus has no plural forms, so the stream derives a deterministic
# surface form first (position-keyed pluralization, same rule in both
# engines) — the filter semantics under test are unchanged. Output: top-20
# emitted terms. Per-row codegen end-to-end; one agg.
# ---------------------------------------------------------------------------

_KR_STEM_SQL = (
    "CASE WHEN length({t}) >= 3 AND substr({t}, length({t}), 1) = 's' "
    "AND substr({t}, length({t}) - 1, 1) NOT IN ('u', 's') "
    "THEN substr({t}, 1, length({t}) - 1) ELSE {t} END"
)


# Shared position-keyed pluralized surface stream (both stemmer rows must
# test the SAME derived stream): SQL CTEs yielding surf(tok) ...
_SURF_CTES = """tokarr AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
pos AS (SELECT doc_id, i - 1 AS pos, t[i] AS tok
        FROM tokarr, (SELECT unnest(range(1, 4000)) AS i) ix WHERE i <= len(t)),
surf AS (SELECT CASE WHEN (doc_id + pos) % 3 = 0 THEN tok || 's' ELSE tok END AS tok
         FROM pos)"""


def _surf_stream(d):
    """... and the identical Spark rendering over the documents table."""
    pos = d.select(
        "doc_id", F.posexplode(F.split("text", " ")).alias("pos", "tok")
    )
    return pos.select(
        F.when(
            (F.col("doc_id") + F.col("pos")) % 3 == 0,
            F.concat("tok", F.lit("s")),
        )
        .otherwise(F.col("tok"))
        .alias("tok")
    )


@register(
    "keyword_repeat_stems",
    f"""WITH {_SURF_CTES},
em AS (SELECT unnest(list_distinct([tok, {_KR_STEM_SQL.format(t='tok')}])) AS term
       FROM surf)
SELECT term, count(*)::BIGINT AS n
FROM em GROUP BY term ORDER BY n DESC, term ASC LIMIT 20""",
)
def keyword_repeat_stems(spark, sf_dir):
    """KeywordRepeat -> EnglishMinimalStem -> RemoveDuplicates: top-20
    emitted terms over the position-pluralized token stream."""
    surf = _surf_stream(_read(spark, sf_dir, "documents"))
    em = surf.select(
        F.explode(
            F.array_distinct(
                F.array(F.col("tok"), F.expr(_KR_STEM_SQL.format(t="tok")))
            )
        ).alias("term")
    )
    return (
        em.groupBy("term")
        .agg(F.count("*").alias("n"))
        .orderBy(F.desc("n"), F.asc("term"))
        .limit(20)
    )


# ---------------------------------------------------------------------------
# StemmerOverrideFilter + KeywordMarkerFilter —
# lucene/analysis/common/.../miscellaneous/StemmerOverrideFilter.java,
# KeywordMarkerFilter.java: a dictionary maps chosen surface forms
# DIRECTLY to their stems and sets the keyword attribute, so the
# downstream stemmer skips them; keyword-marked terms pass through
# untouched. Pinned here over the same pluralized stream: 'windows' is
# override-mapped to 'window-os' (where the minimal stemmer would have
# said 'window'), 'keys' is keyword-marked (stays 'keys' where the
# stemmer would have said 'key'), everything else takes the stemmer.
# ---------------------------------------------------------------------------

_SO_CASE = (
    "CASE {t} WHEN 'windows' THEN 'window-os' WHEN 'keys' THEN 'keys' "
    f"ELSE {_KR_STEM_SQL.format(t='{t}')} END"
)


@register(
    "stemmer_override_top",
    f"""WITH {_SURF_CTES}
SELECT {_SO_CASE.format(t='tok')} AS term, count(*)::BIGINT AS n
FROM surf GROUP BY 1 ORDER BY n DESC, term ASC LIMIT 20""",
)
def stemmer_override_top(spark, sf_dir):
    """StemmerOverride('windows'->'window-os') + KeywordMarker('keys')
    ahead of EnglishMinimalStem: top-20 index terms."""
    surf = _surf_stream(_read(spark, sf_dir, "documents"))
    return (
        surf.select(F.expr(_SO_CASE.format(t="tok")).alias("term"))
        .groupBy("term")
        .agg(F.count("*").alias("n"))
        .orderBy(F.desc("n"), F.asc("term"))
        .limit(20)
    )


# ---------------------------------------------------------------------------
# PatternCaptureGroupTokenFilter — lucene/analysis/common/.../pattern/
# PatternCaptureGroupTokenFilter.java: emits every capture group of the
# pattern as its own token (preserve_original=false). Over the p_brand
# code 'Brand#NN' with ([A-Za-z]+)#([0-9]+), group 1 yields the literal
# 'Brand' per row and group 2 the brand number — the classic "split a
# structured code into searchable pieces" use. Top-20 emitted tokens.
# ---------------------------------------------------------------------------


@register(
    "pattern_capture_tokens",
    """WITH g AS (
  SELECT unnest(regexp_extract_all(p_brand, '([A-Za-z]+)#([0-9]+)', 1)) AS tok FROM part
  UNION ALL
  SELECT unnest(regexp_extract_all(p_brand, '([A-Za-z]+)#([0-9]+)', 2)) AS tok FROM part)
SELECT tok, count(*)::BIGINT AS n
FROM g GROUP BY tok ORDER BY n DESC, tok ASC LIMIT 20""",
)
def pattern_capture_tokens(spark, sf_dir):
    """PatternCaptureGroupTokenFilter('([A-Za-z]+)#([0-9]+)') over
    p_brand: top-20 captured tokens."""
    p = _read(spark, sf_dir, "part")
    pat = r"([A-Za-z]+)#([0-9]+)"
    g = p.select(
        F.explode(
            F.concat(
                F.regexp_extract_all("p_brand", F.lit(pat), F.lit(1)),
                F.regexp_extract_all("p_brand", F.lit(pat), F.lit(2)),
            )
        ).alias("tok")
    )
    return (
        g.groupBy("tok")
        .agg(F.count("*").alias("n"))
        .orderBy(F.desc("n"), F.asc("tok"))
        .limit(20)
    )


# ---------------------------------------------------------------------------
# termfreq()/docfreq() function queries — solr/core/.../search/
# ValueSourceParser.java dispatching to lucene/queries/.../function/
# valuesource/TermFreqValueSource.java and DocFreqValueSource.java:
# sort=termfreq(text,'spark') desc — the raw within-doc tf as a ranking
# value, plus the corpus df constant. ENGINE-PATH row: tf comes from
# DECODING the real FOR-packed posting blocks of the shared engine
# segment (merge.decode_postings = the Lucene84PostingsReader analog),
# df from the engine's term-stats pre-pass — not a re-tokenization. The
# oracle recomputes both from raw text. Scale shape: one term's postings
# = a few blocks behind a pushed term predicate; TakeOrderedAndProject.
# ---------------------------------------------------------------------------

_TFQ_TERM = "spark"


@register(
    "function_query_termfreq",
    f"""WITH {_TOKS_CTE},
tf AS (SELECT doc_id, count(*)::BIGINT AS tf FROM toks
       WHERE term = '{_TFQ_TERM}' GROUP BY doc_id)
SELECT doc_id, tf, (SELECT count(*) FROM tf)::BIGINT AS df
FROM tf ORDER BY tf DESC, doc_id ASC LIMIT 20""",
)
def function_query_termfreq(spark, sf_dir):
    """sort=termfreq(text,'spark') desc with docfreq(text,'spark'):
    postings-decoded tf + stats-pass df from the real index."""
    from ..operators.merge import decode_postings
    from .solr_queries import _engine_searcher

    s = _engine_searcher(spark, sf_dir)
    df_stat = s.term_stats([_TFQ_TERM])[_TFQ_TERM].df
    rows = decode_postings(s.postings.where(F.col("term") == _TFQ_TERM))
    return (
        rows.select(
            "doc_id",
            F.col("freq").cast("long").alias("tf"),
            F.lit(int(df_stat)).cast("long").alias("df"),
        )
        .orderBy(F.desc("tf"), F.asc("doc_id"))
        .limit(20)
    )


# ---------------------------------------------------------------------------
# KnnFloatVectorQuery with EUCLIDEAN similarity — lucene/core/.../search/
# KnnFloatVectorQuery.java scored by index/VectorSimilarityFunction.java
# #EUCLIDEAN (score = 1 / (1 + d^2)): the L2 companion to the cosine ANN
# rows. Exact brute-force baseline (the graph search's recall target);
# d^2 expanded to dot products so both engines run the identical shape.
# ---------------------------------------------------------------------------


@register(
    "vector_euclidean_topk",
    """WITH probe AS (SELECT embedding::DOUBLE[] AS p FROM embeddings WHERE vec_id = 0)
SELECT vec_id,
       round(1.0 / (1.0 + (list_dot_product(v, v) - 2 * list_dot_product(v, p)
                           + list_dot_product(p, p))), 6) AS l2_score
FROM (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings), probe
ORDER BY l2_score DESC, vec_id ASC LIMIT 10""",
)
def vector_euclidean_topk(spark, sf_dir):
    """KnnFloatVectorQuery(EUCLIDEAN) top-10: 1/(1+d^2) scores."""
    emb = _read(spark, sf_dir, "embeddings")
    probe = [float(x) for x in emb.filter("vec_id = 0").collect()[0]["embedding"]]
    return ann.euclidean_topk(emb, probe, k=10)


# ---------------------------------------------------------------------------
# MergeStream — solr/solrj/src/java/org/apache/solr/client/solrj/io/
# stream/MergeStream.java: merge N already-sorted tuple streams under the
# shared comparator, preserving global order (the streaming-expression
# merge(search(...), search(...), on="...") primitive). Two sorted
# branches (priority partitions of orders) union + global comparator.
# Scale shape: both branches carry the same range partitioning on the
# comparator key, so the merged sort is a partition-local interleave (no
# full resort at 100 TB: repartitionByRange once, sortWithinPartitions).
# ---------------------------------------------------------------------------


@register(
    "merge_stream_sorted",
    """SELECT o_orderkey, o_orderdate, o_orderpriority AS pri
FROM orders WHERE o_orderpriority IN ('1-URGENT', '2-HIGH')
ORDER BY o_orderdate ASC, o_orderkey ASC LIMIT 20""",
)
def merge_stream_sorted(spark, sf_dir):
    """merge(on="o_orderdate asc"): two sorted priority streams
    interleaved under the shared comparator, first 20 tuples."""
    o = _read(spark, sf_dir, "orders")
    sel = ["o_orderkey", "o_orderdate", F.col("o_orderpriority").alias("pri")]
    a = o.where(F.col("o_orderpriority") == "1-URGENT").select(*sel)
    b = o.where(F.col("o_orderpriority") == "2-HIGH").select(*sel)
    return (
        a.unionByName(b)
        .orderBy(F.asc("o_orderdate"), F.asc("o_orderkey"))
        .limit(20)
    )


# ---------------------------------------------------------------------------
# UniqueStream — solrj/io/stream/UniqueStream.java: deduplicate a sorted
# stream on the `over` field, FIRST tuple in stream order wins (the
# streaming-expression unique(search(...), over="...")). Over = o_custkey,
# stream sort = (o_orderdate, o_orderkey): each customer's earliest
# order survives. One window partitioned by the over-key — the same
# hash-partitioned shape the reference gets from its upstream sort.
# ---------------------------------------------------------------------------


@register(
    "unique_stream_first",
    """WITH r AS (SELECT o_custkey, o_orderkey, o_orderdate,
        row_number() OVER (PARTITION BY o_custkey
                           ORDER BY o_orderdate ASC, o_orderkey ASC) AS rn
     FROM orders)
SELECT o_custkey, o_orderkey, o_orderdate
FROM r WHERE rn = 1 AND o_custkey < 100
ORDER BY o_custkey ASC""",
)
def unique_stream_first(spark, sf_dir):
    """unique(over=o_custkey): first order per customer in stream order
    (custkeys < 100 kept for a bounded result)."""
    o = _read(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(
        F.asc("o_orderdate"), F.asc("o_orderkey")
    )
    return (
        o.withColumn("rn", F.row_number().over(w))
        .where((F.col("rn") == 1) & (F.col("o_custkey") < 100))
        .select("o_custkey", "o_orderkey", "o_orderdate")
        .orderBy(F.asc("o_custkey"))
    )
