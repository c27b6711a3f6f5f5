"""Round-2 session-5 coverage: function-range filter ({!frange}), payload
scoring, phonetic (Soundex-variant) bucketing, leading-wildcard via reversed
terms, shortestPath stream (BFS), RandomSortField, and grouped faceting
(group.facet).

Each entry re-expresses a reference operator (public lucene-solr path cited
per entry; reference mount is empty, so citations are path#symbol only) over
the driver testdata with a DuckDB oracle using identical column aliases and
matched formulas. Registered into the same REGISTRY/ORACLES as
driver_queries (imported by __spark_entry__).
"""

from __future__ import annotations

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
# {!frange} — FunctionRangeQuery (solr/core/.../search/FunctionRangeQParserPlugin
# .java, lucene/queries/.../function/FunctionRangeQuery.java): a filter whose
# predicate is l <= f(doc) <= u over a function query, not a stored field.
# Catalyst folds the arithmetic into the scan filter, so the function is
# evaluated streaming at scan time — no materialized function column, and at
# 100 TB the predicate rides the parquet row-group statistics of its inputs.
# ---------------------------------------------------------------------------


@register(
    "frange_function_filter",
    """SELECT o_orderpriority, count(*)::BIGINT AS n
FROM orders WHERE o_totalprice / 100000.0 BETWEEN 0.5 AND 1.5
GROUP BY o_orderpriority ORDER BY o_orderpriority""",
)
def frange_function_filter(spark, sf_dir):
    """fq={!frange l=0.5 u=1.5}div(o_totalprice,100000): count per priority
    of orders whose function value lies in the range."""
    o = _read(spark, sf_dir, "orders")
    f = F.col("o_totalprice") / 100000.0
    return (
        o.filter((f >= 0.5) & (f <= 1.5))
        .groupBy("o_orderpriority")
        .agg(F.count("*").alias("n"))
        .orderBy("o_orderpriority")
    )


# ---------------------------------------------------------------------------
# Payload scoring — PayloadScoreQuery(SpanTermQuery, PayloadFunction=sum)
# (lucene/queries/.../payloads/PayloadScoreQuery.java, PayloadSumFunction;
# solr {!payload_score}): score(doc) = sum of the payload at each matching
# term position. Payload here is a deterministic function of the token
# position (1000/(1+pos)) so both engines compute it exactly; the engine's
# .pos-file analog (delta+FOR packed positions table) is pinned to this same
# computation in tests/test_coverage2.py.
# ---------------------------------------------------------------------------


@register(
    "payload_score_topk",
    f"""WITH {_TOKARR_CTE}
SELECT doc_id, round(sum(1000.0 / i), 6) AS payload_score
FROM tokarr, unnest(range(1, len(t) + 1)) AS ix(i)
WHERE t[i] = 'spark'
GROUP BY doc_id ORDER BY payload_score DESC, doc_id ASC LIMIT 10""",
)
def payload_score_topk(spark, sf_dir):
    """{!payload_score f=text v=spark func=sum}: per-doc sum of
    position-derived payloads at occurrences of 'spark'."""
    toks = _tokens(spark, sf_dir)
    return (
        toks.select("doc_id", F.posexplode("tokens").alias("pos", "term"))
        .filter(F.col("term") == "spark")
        .groupBy("doc_id")
        .agg(F.round(F.sum(1000.0 / (1.0 + F.col("pos"))), 6).alias("payload_score"))
        .orderBy(F.desc("payload_score"), F.asc("doc_id"))
        .limit(10)
    )


# ---------------------------------------------------------------------------
# Phonetic bucketing — PhoneticFilterFactory with a Soundex-family encoder
# (solr/core/.../analysis/PhoneticFilterFactory.java; commons-codec Soundex).
# Variant pinned here (documented deviation: vowels/h/w dropped BEFORE the
# duplicate-collapse, so they do not separate duplicate codes): keep the
# first letter uppercased, map the remaining consonants b f p v->1,
# c g j k q s x z->2, d t->3, l->4, m n->5, r->6, collapse runs, take 3
# digits zero-padded. The chain is the SAME translate/regexp_replace/rpad
# pipeline in both engines -> exact parity.
# ---------------------------------------------------------------------------

_SOUNDEX_DROP = "aeiouyhw"
_SOUNDEX_FROM = "bfpvcgjkqsxzdtlmnr"
_SOUNDEX_TO = "111122222222334556"


def _soundex_sql(col: str) -> str:
    x = f"translate(translate(substr({col}, 2), '{_SOUNDEX_DROP}', ''), '{_SOUNDEX_FROM}', '{_SOUNDEX_TO}')"
    for d in "123456":
        x = f"regexp_replace({x}, '{d}{{2,}}', '{d}', 'g')"
    return f"upper(substr({col}, 1, 1)) || rpad(substr({x}, 1, 3), 3, '0')"


def _soundex_col(col):
    x = F.translate(
        F.translate(F.expr(f"substring({col}, 2)"), _SOUNDEX_DROP, ""),
        _SOUNDEX_FROM,
        _SOUNDEX_TO,
    )
    for d in "123456":
        x = F.regexp_replace(x, f"{d}{{2,}}", d)
    return F.concat(
        F.upper(F.substring(F.col(col), 1, 1)), F.rpad(F.substring(x, 1, 3), 3, "0")
    )


@register(
    "phonetic_soundex_top",
    f"""WITH {_TOKS_CTE},
terms AS (SELECT DISTINCT term FROM toks WHERE regexp_full_match(term, '[a-z]+'))
SELECT {_soundex_sql('term')} AS code, count(*)::BIGINT AS n_terms
FROM terms GROUP BY code ORDER BY n_terms DESC, code ASC LIMIT 10""",
)
def phonetic_soundex_top(spark, sf_dir):
    """Phonetic buckets over the distinct vocabulary: terms per Soundex-variant
    code (the index-time PhoneticFilter view of the terms dict)."""
    toks = _tokens(spark, sf_dir)
    terms = (
        toks.select(F.explode("tokens").alias("term"))
        .filter(F.col("term").rlike("^[a-z]+$"))
        .distinct()
    )
    return (
        terms.select(_soundex_col("term").alias("code"))
        .groupBy("code")
        .agg(F.count("*").alias("n_terms"))
        .orderBy(F.desc("n_terms"), F.asc("code"))
        .limit(10)
    )


# ---------------------------------------------------------------------------
# Leading wildcard via reversed terms — ReversedWildcardFilterFactory
# (solr/core/.../analysis/ReversedWildcardFilterFactory.java): Solr indexes
# each token reversed so a leading-wildcard query (*er) becomes a PREFIX
# query (re*) on the reversed dictionary. ENGINE-PATH: runs against the real
# terms dict (term-sorted parquet -> the reversed prefix filter is the
# re-expression; on a dictionary stored sorted by reverse(term) it is a
# row-group-prunable range scan, exactly Lucene's seek on the reversed FST).
# ---------------------------------------------------------------------------


@register(
    "reversed_wildcard_terms",
    f"""WITH {_TOKS_CTE}
SELECT term, count(DISTINCT doc_id)::BIGINT AS df
FROM toks WHERE term LIKE '%er'
GROUP BY term ORDER BY df DESC, term ASC LIMIT 10""",
)
def reversed_wildcard_terms(spark, sf_dir):
    """q=*er as prefix 're' on the reversed terms dict, with docFreq from
    the dictionary (no postings decode)."""
    from .solr_queries import _engine_searcher

    s = _engine_searcher(spark, sf_dir)
    terms = s.segment.table(spark, "terms")
    return (
        terms.filter(F.reverse(F.col("term")).startswith("re"))
        .select("term", "df")
        .orderBy(F.desc("df"), F.asc("term"))
        .limit(10)
    )


# ---------------------------------------------------------------------------
# shortestPath stream — BFS graph traversal
# (solr/solrj/.../io/stream/ShortestPathStream.java, GatherNodesStream's
# iterated form): frontier-expansion BFS over a co-purchase graph (parts
# that share an order). Spark-first shape: one keyed shuffle per hop
# (Pregel-style), the visited set stays DISTRIBUTED (left-anti join — never
# collected to the driver), and the edge list is built once and persisted
# across hops. At 100 TB the edge build is the dominant shuffle; hops reuse
# its partitioning.
# ---------------------------------------------------------------------------

_BFS_SRC = 1
_BFS_MAX_PART = 400
_BFS_DEPTH = 3


@register(
    "graph_shortest_path",
    f"""WITH RECURSIVE e AS (
  SELECT DISTINCT a.l_partkey AS src, b.l_partkey AS dst
  FROM lineitem a JOIN lineitem b
    ON a.l_orderkey = b.l_orderkey AND a.l_partkey <> b.l_partkey
  WHERE a.l_partkey <= {_BFS_MAX_PART} AND b.l_partkey <= {_BFS_MAX_PART}
), bfs(node, d) AS (
  SELECT {_BFS_SRC}::BIGINT AS node, 0 AS d
  UNION
  SELECT e.dst, bfs.d + 1 FROM bfs JOIN e ON e.src = bfs.node
  WHERE bfs.d < {_BFS_DEPTH}
)
SELECT d AS depth, count(*)::BIGINT AS n_nodes
FROM (SELECT node, min(d) AS d FROM bfs GROUP BY node) m
GROUP BY d ORDER BY d""",
)
def graph_shortest_path(spark, sf_dir):
    """BFS from part {_BFS_SRC}: nodes first reached at each depth <= 3 over
    the shares-an-order part graph (subgraph l_partkey <= 400)."""
    li = (
        _read(spark, sf_dir, "lineitem")
        .filter(F.col("l_partkey") <= _BFS_MAX_PART)
        .select("l_orderkey", "l_partkey")
    )
    a = li.alias("a")
    b = li.alias("b")
    e = (
        a.join(b, "l_orderkey")
        .filter(F.col("a.l_partkey") != F.col("b.l_partkey"))
        .select(
            F.col("a.l_partkey").alias("src"), F.col("b.l_partkey").alias("dst")
        )
        .distinct()
        .persist()
    )
    visited = spark.createDataFrame(
        [(_BFS_SRC, 0)], "node long, depth int"
    )
    frontier = visited.select("node")
    for d in range(1, _BFS_DEPTH + 1):
        nxt = (
            frontier.join(e, frontier["node"] == e["src"])
            .select(F.col("dst").alias("node"))
            .distinct()
            .join(visited, "node", "left_anti")
            .persist()
        )
        visited = visited.unionByName(
            nxt.withColumn("depth", F.lit(d))
        ).persist()
        frontier = nxt
    return (
        visited.groupBy(F.col("depth").alias("depth"))
        .agg(F.count("*").alias("n_nodes"))
        .orderBy("depth")
    )


# ---------------------------------------------------------------------------
# RandomSortField (solr/core/.../schema/RandomSortField.java): a
# deterministic pseudo-random sort keyed by (seed, docid) hash — same Knuth
# multiplicative hash in both engines, exact integer math.
# ---------------------------------------------------------------------------


@register(
    "random_sort_topk",
    """SELECT doc_id, ((doc_id * 2654435761) % 4294967296)::BIGINT AS rand_key
FROM documents ORDER BY rand_key ASC, doc_id ASC LIMIT 10""",
)
def random_sort_topk(spark, sf_dir):
    """sort=random_1337 asc: stable pseudo-random order, reproducible across
    engines and retries (pure function of doc_id)."""
    d = _read(spark, sf_dir, "documents")
    return (
        d.select(
            "doc_id",
            ((F.col("doc_id") * F.lit(2654435761)) % F.lit(4294967296)).alias(
                "rand_key"
            ),
        )
        .orderBy(F.asc("rand_key"), F.asc("doc_id"))
        .limit(10)
    )


# ---------------------------------------------------------------------------
# group.facet — grouped faceting (solr SimpleFacets#getGroupedCounts,
# lucene/grouping/.../term/TermGroupFacetCollector.java): facet counts count
# GROUPS (distinct group-field values) containing >= 1 matching doc, not
# docs. Exact distinct per facet bucket = one map-combined shuffle.
# ---------------------------------------------------------------------------


@register(
    "group_facet_counts",
    f"""WITH {_TOKS_CTE},
m AS (SELECT DISTINCT doc_id FROM toks WHERE term = 'data')
SELECT d.lang, count(DISTINCT d.source)::BIGINT AS n_groups
FROM documents d JOIN m USING (doc_id)
GROUP BY d.lang ORDER BY d.lang""",
)
def group_facet_counts(spark, sf_dir):
    """q=data, group.field=source, group.facet=true, facet.field=lang:
    per lang, the number of source-groups with a matching doc."""
    toks = _tokens(spark, sf_dir)
    d = _read(spark, sf_dir, "documents")
    m = (
        toks.filter(F.array_contains("tokens", "data"))
        .select("doc_id")
        .distinct()
    )
    return (
        d.join(m, "doc_id")
        .groupBy("lang")
        .agg(F.count_distinct("source").alias("n_groups"))
        .orderBy("lang")
    )


# ---------------------------------------------------------------------------
# JSON facet domain switch — {"domain": {"blockChildren": ...}}
# (solr/core/.../search/facet/FacetRequest.java#Domain, BlockJoin facet
# domains): the facet is computed over the CHILDREN of the matching parents.
# Parent filter reduces to a key set that broadcasts; the child-side facet
# is one map-combined shuffle.
# ---------------------------------------------------------------------------


@register(
    "json_facet_block_domain",
    """SELECT l.l_returnflag, count(*)::BIGINT AS n
FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
WHERE o.o_orderpriority = '1-URGENT'
GROUP BY l.l_returnflag ORDER BY l.l_returnflag""",
)
def json_facet_block_domain(spark, sf_dir):
    """q on parents (o_orderpriority=1-URGENT), facet over children's
    l_returnflag via the blockChildren domain switch."""
    o = (
        _read(spark, sf_dir, "orders")
        .filter(F.col("o_orderpriority") == "1-URGENT")
        .select(F.col("o_orderkey").alias("l_orderkey"))
    )
    li = _read(spark, sf_dir, "lineitem").select("l_orderkey", "l_returnflag")
    return (
        li.join(F.broadcast(o), "l_orderkey")
        .groupBy("l_returnflag")
        .agg(F.count("*").alias("n"))
        .orderBy("l_returnflag")
    )


# ---------------------------------------------------------------------------
# Sequence packing (training-data pipeline): assign docs to fixed-size
# context-window bins by STREAMING FILL in doc_id order — bin(doc) =
# floor(prefix_tokens_before_doc / 4096). The prefix sum is computed the
# scalable way: bucket docs by doc_id range, aggregate per-bucket token
# sums (tiny: one row per bucket -> driver), then a window partitioned BY
# BUCKET adds the per-bucket offset — no global single-partition window at
# any point, so the plan survives 100 TB (the classic two-pass distributed
# prefix sum).
# ---------------------------------------------------------------------------

_PACK_WINDOW = 4096
_PACK_BUCKET = 8192  # docs per prefix-sum bucket


@register(
    "seq_packing_bins",
    f"""WITH {_TOKARR_CTE},
lens AS (SELECT doc_id, len(t) AS n_tok FROM tokarr),
c AS (SELECT doc_id, n_tok,
      sum(n_tok) OVER (ORDER BY doc_id ROWS UNBOUNDED PRECEDING) AS cum
      FROM lens)
SELECT ((cum - n_tok) // {_PACK_WINDOW})::BIGINT AS bin,
       count(*)::BIGINT AS n_docs, sum(n_tok)::BIGINT AS n_tokens
FROM c GROUP BY bin ORDER BY bin LIMIT 10""",
)
def seq_packing_bins(spark, sf_dir):
    """First 10 context-window bins (4096 tokens, streaming fill in doc_id
    order): docs and tokens packed into each."""
    from pyspark.sql import Window

    toks = _tokens(spark, sf_dir)
    lens = toks.select(
        "doc_id",
        F.size("tokens").alias("n_tok"),
        (F.col("doc_id") / _PACK_BUCKET).cast("long").alias("bucket"),
    )
    # pass 1: per-bucket token sums -> driver (one scalar per bucket)
    bsums = {
        r["bucket"]: r["s"]
        for r in lens.groupBy("bucket").agg(F.sum("n_tok").alias("s")).collect()
    }
    offsets, acc = {}, 0
    for b in sorted(bsums):
        offsets[b] = acc
        acc += bsums[b]
    off_df = spark.createDataFrame(
        [(b, o) for b, o in offsets.items()], "bucket long, offset long"
    )
    # pass 2: within-bucket running sum + broadcast bucket offset
    w = Window.partitionBy("bucket").orderBy("doc_id").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    c = (
        lens.join(F.broadcast(off_df), "bucket")
        .withColumn("cum", F.sum("n_tok").over(w) + F.col("offset"))
    )
    return (
        c.select(
            F.floor((F.col("cum") - F.col("n_tok")) / _PACK_WINDOW).alias("bin"),
            "n_tok",
        )
        .groupBy("bin")
        .agg(F.count("*").alias("n_docs"), F.sum("n_tok").alias("n_tokens"))
        .orderBy("bin")
        .limit(10)
    )


# ---------------------------------------------------------------------------
# Context-window chunking stats (training-data pipeline): docs split into
# 128-token chunks with 16-token overlap (stride 112); per-corpus totals.
# Pure per-row arithmetic — scales embarrassingly.
# ---------------------------------------------------------------------------


@register(
    "chunk_window_stats",
    f"""WITH {_TOKARR_CTE},
lens AS (SELECT len(t) AS n_tok FROM tokarr),
k AS (SELECT n_tok, CASE WHEN n_tok <= 128 THEN 1
        ELSE 1 + CAST(ceil((n_tok - 128) / 112.0) AS BIGINT) END AS n_chunks
      FROM lens)
SELECT count(*)::BIGINT AS n_docs, sum(n_chunks)::BIGINT AS n_chunks,
       max(n_chunks)::BIGINT AS max_chunks,
       sum(n_chunks * 128)::BIGINT AS padded_tokens
FROM k""",
)
def chunk_window_stats(spark, sf_dir):
    """Corpus totals for 128-token / 16-overlap chunking (sliding-window
    tokenization for a training run)."""
    toks = _tokens(spark, sf_dir)
    n_tok = F.size("tokens")
    n_chunks = F.when(n_tok <= 128, F.lit(1)).otherwise(
        1 + F.ceil((n_tok - 128) / 112.0).cast("long")
    )
    return toks.select(n_chunks.alias("c")).agg(
        F.count("*").alias("n_docs"),
        F.sum("c").alias("n_chunks"),
        F.max("c").alias("max_chunks"),
        F.sum(F.col("c") * 128).alias("padded_tokens"),
    )


# ---------------------------------------------------------------------------
# PII redaction (training-data pipeline): regex-scrub emails and count
# docs touched / total redactions / post-scrub residue (must be 0). The
# testdata carries no PII, so a deterministic synthetic email is appended
# to every 7th doc INSIDE the query — identical expression in both engines,
# no external data.
# ---------------------------------------------------------------------------

_EMAIL_RE = "[a-z0-9]+@[a-z]+\\.[a-z]+"


@register(
    "pii_redact_count",
    f"""WITH aug AS (
  SELECT doc_id,
         text || CASE WHEN doc_id % 7 = 0
                      THEN ' contact user' || doc_id || '@example.com now'
                      ELSE '' END AS text
  FROM documents)
SELECT count(*)::BIGINT AS n_docs,
       sum(CASE WHEN len(regexp_extract_all(text, '{_EMAIL_RE}')) > 0
                THEN 1 ELSE 0 END)::BIGINT AS n_docs_with_pii,
       sum(len(regexp_extract_all(text, '{_EMAIL_RE}')))::BIGINT AS n_redactions,
       sum(len(regexp_extract_all(
           regexp_replace(text, '{_EMAIL_RE}', '<EMAIL>', 'g'),
           '{_EMAIL_RE}')))::BIGINT AS n_residual
FROM aug""",
)
def pii_redact_count(spark, sf_dir):
    """Email-redaction audit: docs touched, redaction count, and residue
    after scrubbing (0 proves the scrub converged)."""
    d = _read(spark, sf_dir, "documents")
    aug = d.select(
        "doc_id",
        F.concat(
            F.col("text"),
            F.when(
                F.col("doc_id") % 7 == 0,
                F.concat(
                    F.lit(" contact user"),
                    F.col("doc_id").cast("string"),
                    F.lit("@example.com now"),
                ),
            ).otherwise(F.lit("")),
        ).alias("text"),
    )
    n_hits = F.regexp_count(F.col("text"), F.lit(_EMAIL_RE))
    residual = F.regexp_count(
        F.regexp_replace("text", _EMAIL_RE, "<EMAIL>"), F.lit(_EMAIL_RE)
    )
    return aug.agg(
        F.count("*").alias("n_docs"),
        F.sum((n_hits > 0).cast("long")).alias("n_docs_with_pii"),
        F.sum(n_hits).alias("n_redactions"),
        F.sum(residual).alias("n_residual"),
    )


# ---------------------------------------------------------------------------
# SynonymQuery — blended multi-term scoring (lucene/core/.../search/
# SynonymQuery.java): member terms score as ONE term — df blended as the MAX
# over members, freq = SUM of member tfs in the doc, a single BM25
# saturation. A doc matching two synonyms is NOT a 2-term disjunction.
# Engine path: operators/query.py#Synonym through Searcher.topk_query
# (float32-pinned vs the scalar oracle in tests/test_boolquery.py); this row
# is the double-precision semantic mirror on raw text in both engines.
# ---------------------------------------------------------------------------

_SYN_TERMS = ["join", "merge"]


def _syn_sql() -> str:
    from ..functions.smallfloat import duckdb_byte4_roundtrip_sql

    tl = ", ".join(f"'{t}'" for t in _SYN_TERMS)
    dlq = duckdb_byte4_roundtrip_sql("dl.dl")
    return f"""
WITH {_TOKS_CTE},
dl AS (SELECT d.doc_id, coalesce(t.c, 0) AS dl
       FROM documents d LEFT JOIN (SELECT doc_id, count(*) AS c FROM toks GROUP BY 1) t USING (doc_id)),
stats AS (SELECT count(*)::DOUBLE AS n_total, sum(dl)/count(*) AS avgdl FROM dl),
tf AS (SELECT doc_id, term, count(*)::DOUBLE AS freq FROM toks WHERE term IN ({tl}) GROUP BY 1, 2),
blend AS (SELECT max(dft) AS df_blend FROM (SELECT term, count(*)::DOUBLE AS dft FROM tf GROUP BY 1) x),
fsum AS (SELECT doc_id, sum(freq) AS freq FROM tf GROUP BY 1)
SELECT f.doc_id,
       round(ln(1.0 + (s.n_total - b.df_blend + 0.5)/(b.df_blend + 0.5))
         * f.freq / (f.freq + 1.2 * ((1 - 0.75) + 0.75 * ({dlq})::DOUBLE / s.avgdl)), 6) AS score
FROM fsum f JOIN dl ON f.doc_id = dl.doc_id CROSS JOIN stats s CROSS JOIN blend b
ORDER BY score DESC, f.doc_id ASC LIMIT 10
"""


@register("synonym_query_blended", _syn_sql())
def synonym_query_blended(spark, sf_dir):
    """SynonymQuery semantics mirror: blended df (max), summed tf, one
    saturation — ranked top-10."""
    from .driver_queries import _spark_byte4_sql

    toks = _tokens(spark, sf_dir)
    dl = toks.select("doc_id", F.size("tokens").alias("dl"))
    stats = dl.agg(
        F.count("*").cast("double").alias("n_total"),
        (F.sum("dl") / F.count("*")).alias("avgdl"),
    )
    tf = (
        toks.select("doc_id", F.explode("tokens").alias("term"))
        .filter(F.col("term").isin(_SYN_TERMS))
        .groupBy("doc_id", "term")
        .agg(F.count("*").cast("double").alias("freq"))
    )
    blend = (
        tf.groupBy("term")
        .agg(F.count("*").cast("double").alias("dft"))
        .agg(F.max("dft").alias("df_blend"))
    )
    fsum = tf.groupBy("doc_id").agg(F.sum("freq").alias("freq"))
    dlq = F.expr(_spark_byte4_sql("dl")).cast("double")
    return (
        fsum.join(dl, "doc_id")
        .crossJoin(F.broadcast(stats))
        .crossJoin(F.broadcast(blend))
        .withColumn("dlq", dlq)
        .select(
            "doc_id",
            F.round(
                F.log(
                    1.0
                    + (F.col("n_total") - F.col("df_blend") + 0.5)
                    / (F.col("df_blend") + 0.5)
                )
                * F.col("freq")
                / (
                    F.col("freq")
                    + 1.2 * ((1 - 0.75) + 0.75 * F.col("dlq") / F.col("avgdl"))
                ),
                6,
            ).alias("score"),
        )
        .orderBy(F.desc("score"), F.asc("doc_id"))
        .limit(10)
    )


# ---------------------------------------------------------------------------
# CommonTermsQuery (lucene/queries/.../CommonTermsQuery.java): query terms
# are split by df against maxTermFrequency·N — rare terms become the
# REQUIRED clause group, common ("stopword-like") terms become OPTIONAL
# score boosters that never gate matching. The df split is computed from
# the corpus itself at query time (the whole point of the class: no static
# stopword list). Cutoff pinned at 0.5·N; query = {dup, join, batch} so the
# corpus splits it into low={dup}, high={join, batch}.
# ---------------------------------------------------------------------------

_CTQ_TERMS = ["batch", "dup", "join"]
_CTQ_CUTOFF = 0.5


def _ctq_sql() -> str:
    from ..functions.smallfloat import duckdb_byte4_roundtrip_sql

    tl = ", ".join(f"'{t}'" for t in _CTQ_TERMS)
    dlq = duckdb_byte4_roundtrip_sql("dl.dl")
    return f"""
WITH {_TOKS_CTE},
dl AS (SELECT d.doc_id, coalesce(t.c, 0) AS dl
       FROM documents d LEFT JOIN (SELECT doc_id, count(*) AS c FROM toks GROUP BY 1) t USING (doc_id)),
stats AS (SELECT count(*)::DOUBLE AS n_total, sum(dl)/count(*) AS avgdl FROM dl),
tf AS (SELECT doc_id, term, count(*)::DOUBLE AS freq FROM toks WHERE term IN ({tl}) GROUP BY 1, 2),
dft AS (SELECT term, count(*)::DOUBLE AS dft FROM tf GROUP BY 1),
lowf AS (SELECT term FROM dft CROSS JOIN stats s WHERE dft <= {_CTQ_CUTOFF} * s.n_total),
req AS (SELECT doc_id FROM tf JOIN lowf USING (term)
        GROUP BY doc_id HAVING count(*) = (SELECT count(*) FROM lowf)),
scored AS (
  SELECT tf.doc_id,
         ln(1.0 + (s.n_total - dft.dft + 0.5)/(dft.dft + 0.5))
           * tf.freq / (tf.freq + 1.2 * ((1 - 0.75) + 0.75 * ({dlq})::DOUBLE / s.avgdl)) AS contrib
  FROM tf JOIN dft USING (term) JOIN dl ON tf.doc_id = dl.doc_id CROSS JOIN stats s
  WHERE tf.doc_id IN (SELECT doc_id FROM req))
SELECT doc_id, round(sum(contrib), 6) AS score
FROM scored GROUP BY doc_id
ORDER BY score DESC, doc_id ASC LIMIT 10
"""


@register("common_terms_query", _ctq_sql())
def common_terms_query(spark, sf_dir):
    """CommonTermsQuery mirror: df-split rewrite (rare terms MUST, common
    terms SHOULD-boost), BM25 sum over all matching query terms."""
    from .driver_queries import _spark_byte4_sql

    toks = _tokens(spark, sf_dir)
    dl = toks.select("doc_id", F.size("tokens").alias("dl"))
    stats = dl.agg(
        F.count("*").cast("double").alias("n_total"),
        (F.sum("dl") / F.count("*")).alias("avgdl"),
    )
    tf = (
        toks.select("doc_id", F.explode("tokens").alias("term"))
        .filter(F.col("term").isin(_CTQ_TERMS))
        .groupBy("doc_id", "term")
        .agg(F.count("*").cast("double").alias("freq"))
    )
    dft = tf.groupBy("term").agg(F.count("*").cast("double").alias("dft"))
    lowf = dft.crossJoin(F.broadcast(stats)).filter(
        F.col("dft") <= _CTQ_CUTOFF * F.col("n_total")
    )
    n_low = lowf.count()  # tiny driver-side scalar (query-term count bound)
    req = (
        tf.join(F.broadcast(lowf.select("term")), "term")
        .groupBy("doc_id")
        .agg(F.count("*").alias("nlow"))
        .filter(F.col("nlow") == n_low)
        .select("doc_id")
    )
    dlq = F.expr(_spark_byte4_sql("dl")).cast("double")
    scored = (
        tf.join(req, "doc_id")
        .join(dft, "term")
        .join(dl, "doc_id")
        .crossJoin(F.broadcast(stats))
        .withColumn("dlq", dlq)
        .withColumn(
            "contrib",
            F.log(
                1.0 + (F.col("n_total") - F.col("dft") + 0.5) / (F.col("dft") + 0.5)
            )
            * F.col("freq")
            / (
                F.col("freq")
                + 1.2 * ((1 - 0.75) + 0.75 * F.col("dlq") / F.col("avgdl"))
            ),
        )
    )
    return (
        scored.groupBy("doc_id")
        .agg(F.round(F.sum("contrib"), 6).alias("score"))
        .orderBy(F.desc("score"), F.asc("doc_id"))
        .limit(10)
    )


# ---------------------------------------------------------------------------
# MultiPhraseQuery (lucene/core/.../search/MultiPhraseQuery.java): phrase
# slot i accepts ANY of a set of terms (synonyms / analysis-graph
# alternatives inside a phrase). freq = starts where every slot is
# satisfied; idf = sum over present (slot, member) terms. Engine path:
# operators/phrase.py#multi_phrase_topk (float32-pinned vs the scalar
# oracle in tests/test_phrase.py); this row is the double-precision
# semantic mirror — per-row array lambdas, no posexplode self-join.
# ---------------------------------------------------------------------------

_MP_SLOTS = [("merge",), ("group", "order")]


def _mp_sql() -> str:
    from ..functions.smallfloat import duckdb_byte4_roundtrip_sql

    all_terms = ", ".join(f"'{t}'" for s in _MP_SLOTS for t in s)
    cond = " AND ".join(
        "list_contains([" + ", ".join(f"'{t}'" for t in _MP_SLOTS[j]) + f"], t[i+{j}])"
        for j in range(len(_MP_SLOTS))
    )
    n = len(_MP_SLOTS)
    dlq = duckdb_byte4_roundtrip_sql("dl.dl")
    return f"""
WITH {_TOKARR_CTE},
stats AS (SELECT count(*)::DOUBLE AS n_total, avg(len(t))::DOUBLE AS avgdl FROM tokarr),
dl AS (SELECT doc_id, len(t) AS dl FROM tokarr),
dft AS (SELECT term, count(*)::DOUBLE AS dft
        FROM (SELECT DISTINCT doc_id, unnest(t) AS term FROM tokarr)
        WHERE term IN ({all_terms}) GROUP BY term),
idf AS (SELECT sum(ln(1 + (s.n_total - d.dft + 0.5) / (d.dft + 0.5))) AS idf_sum
        FROM dft d CROSS JOIN stats s),
ph AS (SELECT doc_id,
              len(list_filter(range(1, len(t) - {n - 2}), i -> {cond}))::DOUBLE AS freq
       FROM tokarr WHERE len(t) >= {n})
SELECT ph.doc_id,
       round(i.idf_sum * ph.freq
             / (ph.freq + 1.2 * ((1 - 0.75) + 0.75 * ({dlq})::DOUBLE / s.avgdl)), 6) AS score
FROM ph JOIN dl ON dl.doc_id = ph.doc_id CROSS JOIN idf i CROSS JOIN stats s
WHERE ph.freq > 0
ORDER BY score DESC, ph.doc_id ASC LIMIT 10
"""


@register("multi_phrase_query", _mp_sql())
def multi_phrase_query(spark, sf_dir):
    """MultiPhraseQuery mirror: "merge (group|order)" — slot alternatives,
    summed present-term idf, BM25 on exact-adjacency freq."""
    toks = _tokens(spark, sf_dir)
    t = F.col("tokens")
    n = len(_MP_SLOTS)

    def starts_match(i):
        c = None
        for j, members in enumerate(_MP_SLOTS):
            e = F.element_at(t, (i + F.lit(j)).cast("int")).isin(list(members))
            c = e if c is None else (c & e)
        return c

    freq_col = F.when(
        F.size(t) >= n,
        F.size(F.filter(F.sequence(F.lit(1), F.size(t) - (n - 1)), starts_match)),
    ).otherwise(F.lit(0))

    all_terms = [tm for s in _MP_SLOTS for tm in s]
    base = toks.select(
        "doc_id",
        F.size("tokens").alias("dl"),
        freq_col.cast("double").alias("freq"),
        *[
            F.array_contains("tokens", tm).cast("long").alias(f"h{i}")
            for i, tm in enumerate(all_terms)
        ],
    )
    stats = base.agg(
        F.count("*").cast("double").alias("n_total"),
        F.avg("dl").alias("avgdl"),
        *[F.sum(f"h{i}").cast("double").alias(f"dft{i}") for i in range(len(all_terms))],
    ).withColumn(
        "idf_sum",
        sum(
            F.log(
                1.0
                + (F.col("n_total") - F.col(f"dft{i}") + 0.5)
                / (F.col(f"dft{i}") + 0.5)
            )
            for i in range(len(all_terms))
        ),
    )
    from .driver_queries import _spark_byte4_sql

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
                / (
                    F.col("freq")
                    + 1.2 * ((1 - 0.75) + 0.75 * F.col("dlq") / F.col("avgdl"))
                ),
                6,
            ).alias("score"),
        )
        .orderBy(F.desc("score"), F.asc("doc_id"))
        .limit(10)
    )
