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
