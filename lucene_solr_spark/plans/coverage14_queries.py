"""Round-5 widening batch #5: FieldMaskingSpanQuery, NGramPhraseQuery,
DaemonStream, CategoryRoutedAlias, and DelimitedTermFrequencyTokenFilter.

Each entry re-expresses a reference component (public lucene-solr
path#symbol cited per entry; the reference mount is empty) over the driver
testdata with a DuckDB oracle using identical column aliases. Synthesized
columns are built identically in both engines (the coverage12/13
convention for surface the lowercase word-soup corpus can't exercise).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from .driver_queries import _read, register

# ---------------------------------------------------------------------------
# FieldMaskingSpanQuery — lucene/core/src/java/org/apache/lucene/search/
# spans/FieldMaskingSpanQuery.java: lie about a span clause's field so
# spans from PARALLEL fields (same token positions, different analysis)
# can compose inside one SpanNearQuery — the javadoc's teacher/name
# example. Here the parallel field is the body tokens truncated to 3
# chars (a Truncate-analyzed copyField), so `alt:tab` at position p masks
# as `text` and composes with `text:scan` at p+1 — a query NO single-field
# span can express (no body token is ever 'tab').
# Spark shape: zero-join — both parallel token streams derive from one
# split() array, the position walk is a filter over sequence() inside
# whole-stage codegen; per-doc match counts aggregate map-side. The
# DuckDB oracle is an independent formulation (positions CTE self-join).
# ---------------------------------------------------------------------------

_FM_ALT, _FM_BODY = "tab", "scan"


@register(
    "field_masking_span_count",
    f"""WITH tokarr AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
pos AS (SELECT doc_id, unnest(toks) AS term, generate_subscripts(toks, 1) AS p
        FROM tokarr),
m AS (SELECT a.doc_id, count(*)::BIGINT AS n_matches
      FROM pos a JOIN pos b ON b.doc_id = a.doc_id AND b.p = a.p + 1
      WHERE substr(a.term, 1, 3) = '{_FM_ALT}' AND b.term = '{_FM_BODY}'
      GROUP BY a.doc_id)
SELECT doc_id, n_matches FROM m
ORDER BY n_matches DESC, doc_id ASC LIMIT 10""",
)
def field_masking_span_count(spark, sf_dir):
    """SpanNear(ordered, slop=0)[FieldMasking(alt:tab -> text), text:scan]
    over parallel token streams sharing one position space."""
    d = _read(spark, sf_dir, "documents")
    n_matches = F.expr(
        "size(filter(sequence(0, size(split(text, ' ')) - 2), "
        f"i -> substring(split(text, ' ')[i], 1, 3) = '{_FM_ALT}' "
        f"AND split(text, ' ')[i + 1] = '{_FM_BODY}'))"
    ).cast("long")
    return (
        d.select("doc_id", n_matches.alias("n_matches"))
        .filter(F.col("n_matches") > 0)
        .orderBy(F.desc("n_matches"), F.asc("doc_id"))
        .limit(10)
    )


# ---------------------------------------------------------------------------
# NGramPhraseQuery — lucene/core/src/java/org/apache/lucene/search/
# NGramPhraseQuery.java: a PhraseQuery over an n-gram-analyzed field,
# OPTIMIZED to check only every n-th gram plus the final gram (the
# in-between grams are implied by overlap) — fewer postings consulted for
# the same matches. The engine runs exactly that stride walk over 2-gram
# positions of p_name; the oracle is the semantic ground truth the
# optimization must preserve: a plain substring containment. If the
# stride logic over- or under-checks, counts diverge.
# ---------------------------------------------------------------------------

_NGP_QUERY, _NGP_N = "ld w", 2


def _ngp_checks() -> list[tuple[int, str]]:
    """(offset, gram) pairs NGramPhraseQuery checks: stride n, plus the
    final gram when the tail would otherwise be uncovered."""
    L = len(_NGP_QUERY)
    offs = list(range(0, L - _NGP_N + 1, _NGP_N))
    if offs[-1] != L - _NGP_N:
        offs.append(L - _NGP_N)
    return [(o, _NGP_QUERY[o : o + _NGP_N]) for o in offs]


@register(
    "ngram_phrase_match",
    f"""SELECT p_brand, count(*)::BIGINT AS n_parts
FROM part WHERE p_name LIKE '%{_NGP_QUERY}%'
GROUP BY p_brand ORDER BY n_parts DESC, p_brand ASC""",
)
def ngram_phrase_match(spark, sf_dir):
    """NGramPhraseQuery('ld w', n=2): stride-2 gram checks over the
    2-gram stream of p_name; must equal substring containment."""
    p = _read(spark, sf_dir, "part")
    checks = _ngp_checks()
    # candidate start positions s (1-based); gram at offset o is
    # substring(p_name, s + o, n)
    conds = " AND ".join(
        f"substring(p_name, s + {o}, {_NGP_N}) = '{g}'" for o, g in checks
    )
    match = F.expr(
        f"exists(sequence(1, greatest(length(p_name) - {len(_NGP_QUERY) - 1}, 0)), "
        f"s -> {conds})"
    )
    return (
        p.filter(match)
        .groupBy("p_brand")
        .agg(F.count("*").alias("n_parts"))
        .orderBy(F.desc("n_parts"), F.asc("p_brand"))
    )


# ---------------------------------------------------------------------------
# DaemonStream — solrj/io/stream/DaemonStream.java (see
# streaming/daemon.py for the full contract): the daemon re-runs its inner
# expression each interval and a consumer drains snapshots from the
# bounded queue. Driven deterministically here: three ticks, each
# widening the arrived data by one batch (o_orderkey % 3), inner run =
# status rollup over everything arrived; the drained FINAL snapshot after
# 3 iterations must equal the rollup over ALL orders. The inner run
# stays a lazy union-of-batches plan — nothing materializes per tick.
# ---------------------------------------------------------------------------


@register(
    "daemon_stream_snapshot",
    """SELECT o_orderstatus AS status, count(*)::BIGINT AS n_orders,
       3 AS n_iterations
FROM orders GROUP BY status ORDER BY status ASC""",
)
def daemon_stream_snapshot(spark, sf_dir):
    """Final drained snapshot of a 3-tick daemon over arriving order
    batches equals the full-corpus rollup."""
    from ..streaming.daemon import DaemonStream

    o = _read(spark, sf_dir, "orders")
    batches = [o.filter(F.col("o_orderkey") % 3 == i) for i in range(3)]
    arrived: list = []

    def run(iteration: int):
        arrived.append(batches[iteration])
        df = arrived[0]
        for b in arrived[1:]:
            df = df.unionAll(b)
        return (
            df.groupBy(F.col("o_orderstatus").alias("status"))
            .agg(F.count("*").alias("n_orders"))
        )

    daemon = DaemonStream("rollup-daemon", run)
    for _ in range(3):
        assert daemon.tick()
    snapshot = daemon.read_latest()
    daemon.close()
    return snapshot.withColumn(
        "n_iterations", F.lit(daemon.iterations)
    ).orderBy(F.asc("status"))


# ---------------------------------------------------------------------------
# CategoryRoutedAlias — solr/core/src/java/org/apache/solr/cloud/api/
# collections/CategoryRoutedAlias.java: route each document to a
# collection named after its category-field VALUE, sanitized
# (non-alphanumerics -> '_', lowercased) exactly as buildCollectionNameFromValue
# does — the categorical sibling of the time-routed alias
# (`time_routed_partitions`). At scale the collection name is a pure
# function of the row, so routing is a partitionBy on the computed
# column — no lookup service.
# ---------------------------------------------------------------------------


@register(
    "category_routed_partitions",
    """SELECT 'cust__' || regexp_replace(lower(c_mktsegment), '[^a-z0-9]', '_', 'g')
         AS collection,
       count(*)::BIGINT AS n_docs,
       count(DISTINCT c_nationkey)::BIGINT AS n_nations
FROM customer GROUP BY collection ORDER BY collection ASC""",
)
def category_routed_partitions(spark, sf_dir):
    """Category-routed alias: sanitized per-value collections + stats."""
    c = _read(spark, sf_dir, "customer")
    collection = F.concat(
        F.lit("cust__"),
        F.regexp_replace(F.lower("c_mktsegment"), "[^a-z0-9]", "_"),
    )
    return (
        c.groupBy(collection.alias("collection"))
        .agg(
            F.count("*").alias("n_docs"),
            F.countDistinct("c_nationkey").alias("n_nations"),
        )
        .orderBy(F.asc("collection"))
    )


# ---------------------------------------------------------------------------
# DelimitedTermFrequencyTokenFilter — lucene/analysis/common/.../
# miscellaneous/DelimitedTermFrequencyTokenFilter.java (solr
# DelimitedTermFrequencyTokenFilterFactory): tokens arrive as
# "term|freq" and the filter splits the payload off, setting the term
# frequency attribute — pre-aggregated external counts injected at index
# time. Synthesized input: every corpus token carries '|' + (1 + p % 3);
# the row aggregates the PARSED tf (sum) next to the raw occurrence
# count, which differ exactly when the filter honors the delimiter.
# ---------------------------------------------------------------------------


@register(
    "delimited_term_freq",
    """WITH tokarr AS (SELECT string_split(text, ' ') AS toks FROM documents),
pos AS (SELECT unnest(toks) AS term, generate_subscripts(toks, 1) AS p FROM tokarr),
synth AS (SELECT term || '|' || cast(1 + p % 3 AS VARCHAR) AS tok FROM pos),
parsed AS (SELECT split_part(tok, '|', 1) AS term,
                  cast(split_part(tok, '|', 2) AS BIGINT) AS tf FROM synth)
SELECT term, sum(tf)::BIGINT AS total_tf, count(*)::BIGINT AS n_tokens
FROM parsed GROUP BY term ORDER BY total_tf DESC, term ASC LIMIT 10""",
)
def delimited_term_freq(spark, sf_dir):
    """Parse 'term|freq' tokens and aggregate the injected tf."""
    d = _read(spark, sf_dir, "documents")
    pos = d.select(
        F.posexplode(F.split("text", " ")).alias("p0", "term0")
    )
    tok = F.concat(
        "term0", F.lit("|"), ((F.col("p0") + 1) % 3 + 1).cast("string")
    )
    # posexplode is 0-based; DuckDB generate_subscripts is 1-based, so
    # p0 + 1 is the shared position: tf = 1 + ((p0 + 1) % 3)... rendered
    # identically above as ((p0 + 1) % 3) + 1.
    parsed = pos.select(tok.alias("tok")).select(
        F.substring_index("tok", "|", 1).alias("term"),
        F.substring_index("tok", "|", -1).cast("long").alias("tf"),
    )
    return (
        parsed.groupBy("term")
        .agg(F.sum("tf").alias("total_tf"), F.count("*").alias("n_tokens"))
        .orderBy(F.desc("total_tf"), F.asc("term"))
        .limit(10)
    )
