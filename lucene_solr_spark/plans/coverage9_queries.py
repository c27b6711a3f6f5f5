"""Round-4 widening batch #4: surround query parser (span front end),
suggester context filtering, fetch stream enrichment, and pivot facets
with attached stats.

Each entry re-expresses a reference operator (public lucene-solr path cited
per entry; the reference mount is empty so citations are path#symbol only)
over the driver testdata with a DuckDB oracle using identical column aliases
and cross-engine-exact arithmetic (float32 per-op casts on the engine-path
row, BIGINT counts elsewhere).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ..functions.analysis import duckdb_tokenize_sql
from ..functions.smallfloat import duckdb_byte4_roundtrip_sql
from .driver_queries import _TOKS_CTE, _read, _tokens, register

# ---------------------------------------------------------------------------
# ENGINE-PATH surround query parser —
# lucene/queryparser/.../surround/parser/QueryParser.jj +
# surround/query/DistanceQuery.java / SrndTruncQuery.java and Solr's
# SurroundQParserPlugin.java ({!surround}): '2W(key, s*)' parses to
# SpanNear([key, SpanOr(expand('s'))], slop=1, inOrder) — distance 2 is
# slop 1, truncation expands against the terms dictionary
# (SpanMultiTermQueryWrapper → SpanOr rewrite). Scoring is the span
# kernel's float32 path: greedy-ordered matching (for each leading 'key'
# position the earliest s*-term position after it; slack = gap between
# the spans), fractional freq = sum of 1/(1+slack) over matches with
# slack <= 1, idf summed over ALL tree terms present (f64 sum, one f32
# cast), byte4 norms.
# ---------------------------------------------------------------------------


@register(
    "surround_query_topk",
    f"""WITH tokarr AS (SELECT doc_id, {duckdb_tokenize_sql('text')} AS t FROM documents),
stats AS (SELECT count(*)::BIGINT AS n_docs, sum(len(t))::BIGINT AS sum_ttf FROM tokarr),
dl AS (SELECT doc_id, len(t) AS dl FROM tokarr),
pos AS (SELECT doc_id, unnest(t) AS term, generate_subscripts(t, 1) AS pos FROM tokarr),
dft AS (SELECT term, count(DISTINCT doc_id)::DOUBLE AS df FROM pos
        WHERE term = 'key' OR term LIKE 's%' GROUP BY term),
idf AS (SELECT (sum(ln(1 + ((s.n_docs::DOUBLE) - d.df + 0.5) / (d.df + 0.5))))::FLOAT
          AS idf_f
        FROM dft d CROSS JOIN stats s),
lead AS (SELECT a.doc_id, a.pos AS apos, min(b.pos) AS bpos
         FROM pos a JOIN pos b ON b.doc_id = a.doc_id AND b.pos > a.pos
                               AND b.term LIKE 's%'
         WHERE a.term = 'key' GROUP BY a.doc_id, a.pos),
fr AS (SELECT doc_id, (sum(1.0 / (1 + (bpos - apos - 1))))::FLOAT AS freq_f
       FROM lead WHERE bpos - apos - 1 <= 1 GROUP BY doc_id),
scored AS (SELECT fr.doc_id,
       ((i.idf_f
         * ((fr.freq_f)
            / ((fr.freq_f)
               + ((1.2::FLOAT)
                  * ((0.25::FLOAT)
                     + (((0.75::FLOAT)
                         * (({duckdb_byte4_roundtrip_sql('dl.dl')})::FLOAT))
                        / ((s.sum_ttf::DOUBLE / s.n_docs::DOUBLE)::FLOAT)))))))
          ::FLOAT) AS score_f
    FROM fr JOIN dl USING (doc_id) CROSS JOIN idf i CROSS JOIN stats s)
SELECT doc_id, round(score_f::DOUBLE, 4) AS score
FROM scored ORDER BY score_f DESC, doc_id ASC LIMIT 10""",
)
def surround_query_topk(spark, sf_dir):
    """Real-engine surround query '2W(key, s*)' top-10: ordered distance
    2 with truncation, float32-exact cross-engine."""
    from ..operators.spans import span_topk
    from ..operators.surround import parse_surround
    from .solr_queries import _engine_searcher

    s = _engine_searcher(spark, sf_dir)
    node = parse_surround(
        "2W(key, s*)", expand=lambda p: s.expand_terms(prefix=p)
    )
    res = span_topk(spark, s.segment, node, k=10)
    return res.select(
        "doc_id", F.round(F.col("score").cast("double"), 4).alias("score")
    )


# ---------------------------------------------------------------------------
# Suggester context filtering —
# lucene/suggest/.../analyzing/AnalyzingInfixSuggester.java#lookup(key,
# contexts, ...): suggestions carry per-entry context sets and a lookup
# restricted to a context only surfaces entries tagged with it (Solr:
# suggest.cfq). Our suggestion corpus = the terms dict; an entry's
# contexts = the langs of the docs it appears in; weight = df WITHIN the
# requested context — exactly the context-intersected weighting the
# suggester's contextFilter computes.
# Scale shape: terms×lang dict is a map-combined agg off the token scan;
# the lookup is a LIKE scan over that narrow dict, never the corpus.
# ---------------------------------------------------------------------------


@register(
    "suggest_context_filtered",
    f"""WITH {_TOKS_CTE}
SELECT t.term AS term, count(DISTINCT t.doc_id)::BIGINT AS weight
FROM toks t JOIN documents d USING (doc_id)
WHERE d.lang = 'en' AND t.term LIKE '%ta%'
GROUP BY 1 ORDER BY weight DESC, term ASC LIMIT 10""",
)
def suggest_context_filtered(spark, sf_dir):
    """Infix suggestions ('ta') filtered to the lang='en' context,
    weight = in-context df."""
    toks = _tokens(spark, sf_dir).select(
        "doc_id", F.explode("tokens").alias("term")
    )
    docs = _read(spark, sf_dir, "documents").select("doc_id", "lang")
    return (
        toks.join(docs, "doc_id")
        .filter((F.col("lang") == "en") & F.col("term").contains("ta"))
        .groupBy("term")
        .agg(F.countDistinct("doc_id").alias("weight"))
        .orderBy(F.desc("weight"), F.asc("term"))
        .limit(10)
    )


# ---------------------------------------------------------------------------
# fetch stream — solrj/io/stream/FetchStream.java: enrich a tuple stream
# with extra fields by batched id lookups against another collection
# (fetch(collection, search(...), fl="...", on="id")). Spark restatement:
# the id set of the inner stream broadcasts into a hash join against the
# stored-fields table — one batch per partition instead of one HTTP
# request per batchSize tuples, same access pattern (point lookups by
# key), no shuffle of the wide side.
# ---------------------------------------------------------------------------


@register(
    "fetch_stream_enrich",
    f"""WITH {_TOKS_CTE},
hits AS (SELECT DISTINCT doc_id FROM toks WHERE term = 'merge'
         ORDER BY doc_id ASC LIMIT 20)
SELECT h.doc_id AS doc_id, d.lang AS lang, d.n_chars AS n_chars
FROM hits h JOIN documents d USING (doc_id) ORDER BY doc_id ASC""",
)
def fetch_stream_enrich(spark, sf_dir):
    """fetch(): first-20 'merge' hits enriched with (lang, n_chars) via a
    broadcast id-batch join."""
    toks = _tokens(spark, sf_dir)
    hits = (
        toks.filter(F.array_contains("tokens", "merge"))
        .select("doc_id")
        .orderBy("doc_id")
        .limit(20)
    )
    docs = _read(spark, sf_dir, "documents").select(
        "doc_id", "lang", "n_chars"
    )
    return (
        F.broadcast(hits).join(docs, "doc_id")
        .select("doc_id", "lang", "n_chars")
        .orderBy("doc_id")
    )


# ---------------------------------------------------------------------------
# Pivot facet with stats —
# solr/core/.../handler/component/FacetComponent.java +
# PivotFacetProcessor.java with stats.field attached to pivot nodes
# (facet.pivot={!stats=s}lang,source): every pivot node carries the stats
# bundle of its bucket, at EVERY level of the pivot tree. Spark-native:
# GROUPING SETS ((lang), (lang, source)) — one pass, partial+final agg,
# no per-node re-query (the reference re-executes stats per pivot bucket;
# rollup gives all levels in one shuffle).
# ---------------------------------------------------------------------------


@register(
    "pivot_facet_stats",
    """SELECT lang, source,
       count(*)::BIGINT AS n_docs,
       sum(n_chars)::BIGINT AS sum_chars,
       round(avg(n_chars::DOUBLE), 6) AS avg_chars,
       min(n_chars)::BIGINT AS min_chars,
       max(n_chars)::BIGINT AS max_chars
FROM documents
GROUP BY GROUPING SETS ((lang), (lang, source))
ORDER BY lang ASC, source ASC NULLS FIRST""",
)
def pivot_facet_stats(spark, sf_dir):
    """Two-level pivot (lang, source) with a stats bundle at each node —
    rollup minus the grand total."""
    d = _read(spark, sf_dir, "documents")
    return (
        d.rollup("lang", "source")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_chars").alias("sum_chars"),
            F.round(F.avg(F.col("n_chars").cast("double")), 6).alias(
                "avg_chars"
            ),
            F.min("n_chars").alias("min_chars"),
            F.max("n_chars").alias("max_chars"),
        )
        .filter(F.col("lang").isNotNull())  # drop the grand-total row
        .orderBy(F.asc("lang"), F.col("source").asc_nulls_first())
    )
