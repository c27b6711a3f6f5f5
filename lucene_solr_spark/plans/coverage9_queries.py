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


# ---------------------------------------------------------------------------
# ENGINE-PATH SpanPositionRangeQuery —
# search/spans/SpanPositionRangeQuery.java#acceptPosition: spans of
# 'order' lying fully inside the 0-based position window [2, 20) (span
# start >= 2, span end <= 20 — SpanFirst generalized with a lower bound).
# freq = surviving span count; BM25 with 'order's idf, byte4 norms,
# float32-exact. DuckDB subscripts are 1-based: position p maps to i=p+1,
# so the window is i in [3, 20].
# ---------------------------------------------------------------------------


@register(
    "span_position_range",
    f"""WITH tokarr AS (SELECT doc_id, {duckdb_tokenize_sql('text')} AS t FROM documents),
stats AS (SELECT count(*)::BIGINT AS n_docs, sum(len(t))::BIGINT AS sum_ttf FROM tokarr),
dl AS (SELECT doc_id, len(t) AS dl FROM tokarr),
dfm AS (SELECT count(*)::BIGINT AS df FROM tokarr
        WHERE list_contains(t, 'order')),
surv AS (SELECT doc_id,
        len(list_filter(range(1, len(t) + 1),
            i -> t[i] = 'order' AND i >= 3 AND i <= 20))::BIGINT AS freq
    FROM tokarr),
scored AS (SELECT s2.doc_id,
       (((ln(1 + ((s.n_docs::DOUBLE) - d.df + 0.5) / (d.df + 0.5)))::FLOAT
         * ((s2.freq::FLOAT)
            / ((s2.freq::FLOAT)
               + ((1.2::FLOAT)
                  * ((0.25::FLOAT)
                     + (((0.75::FLOAT)
                         * (({duckdb_byte4_roundtrip_sql('dl.dl')})::FLOAT))
                        / ((s.sum_ttf::DOUBLE / s.n_docs::DOUBLE)::FLOAT)))))))
          ::FLOAT) AS score_f
    FROM surv s2 JOIN dl USING (doc_id) CROSS JOIN dfm d CROSS JOIN stats s
    WHERE s2.freq > 0)
SELECT doc_id, round(score_f::DOUBLE, 4) AS score
FROM scored ORDER BY score_f DESC, doc_id ASC LIMIT 10""",
)
def span_position_range(spark, sf_dir):
    """Real-engine SpanPositionRange('order', [2, 20)) top-10,
    float32-exact cross-engine."""
    from ..operators.spans import SpanPositionRange, SpanTerm, span_topk
    from .solr_queries import _engine_searcher

    s = _engine_searcher(spark, sf_dir)
    res = span_topk(
        spark, s.segment, SpanPositionRange(SpanTerm("order"), 2, 20), k=10
    )
    return res.select(
        "doc_id", F.round(F.col("score").cast("double"), 4).alias("score")
    )


# ---------------------------------------------------------------------------
# GraphTermsQParser — solr/core/.../search/GraphTermsQParserPlugin.java
# ({!graphTerms f=... maxDocFreq=N}t1,t2,...): a TermInSet that silently
# DROPS terms whose docFreq exceeds maxDocFreq (used by graph traversals
# to skip hot hub terms). The row reports the surviving-term count and
# the matching-doc count for a 4-term set under maxDocFreq=385.
# Scale shape: df screening reads the terms dict only; the doc scan is a
# pushed-down IN filter over the survivors.
# ---------------------------------------------------------------------------


@register(
    "graph_terms_query",
    f"""WITH {_TOKS_CTE},
dft AS (SELECT term, count(DISTINCT doc_id)::BIGINT AS df FROM toks
        WHERE term IN ('data', 'key', 'order', 'value') GROUP BY term),
keep AS (SELECT term FROM dft WHERE df <= 385)
SELECT (SELECT count(*) FROM keep)::BIGINT AS n_terms_kept,
       count(DISTINCT t.doc_id)::BIGINT AS n_docs
FROM toks t JOIN keep k ON t.term = k.term""",
)
def graph_terms_query(spark, sf_dir):
    """{!graphTerms maxDocFreq=385}data,key,order,value — hot terms are
    dropped before matching."""
    toks = _tokens(spark, sf_dir).select(
        "doc_id", F.explode("tokens").alias("term")
    )
    wanted = toks.filter(F.col("term").isin("data", "key", "order", "value"))
    keep = (
        wanted.groupBy("term")
        .agg(F.countDistinct("doc_id").alias("df"))
        .filter(F.col("df") <= 385)
        .select("term")
    )
    return (
        wanted.join(F.broadcast(keep), "term")
        .agg(
            F.countDistinct("term").alias("n_terms_kept"),
            F.countDistinct("doc_id").alias("n_docs"),
        )
    )


# ---------------------------------------------------------------------------
# BoostingQuery — lucene/queries/.../BoostingQuery.java (now
# FunctionScoreQuery#boostByQuery): docs matching the demote query keep
# matching but their score is multiplied by the demote factor (unlike
# MUST_NOT, nothing is excluded). Main = BM25('merge'), demote = docs
# containing 'slow' x 0.2, double precision.
# ---------------------------------------------------------------------------


@register(
    "boosting_query_demote",
    f"""WITH {_TOKS_CTE},
dl AS (SELECT d.doc_id, coalesce(t.c, 0) AS dl
       FROM documents d LEFT JOIN (SELECT doc_id, count(*) AS c FROM toks GROUP BY 1) t USING (doc_id)),
stats AS (SELECT count(*)::DOUBLE AS n_total, sum(dl)/count(*) AS avgdl FROM dl),
tf AS (SELECT doc_id, count(*)::DOUBLE AS freq FROM toks WHERE term = 'merge' GROUP BY 1),
dft AS (SELECT count(*)::DOUBLE AS dft FROM tf),
demote AS (SELECT DISTINCT doc_id FROM toks WHERE term = 'slow'),
scored AS (
  SELECT tf.doc_id,
         ln(1.0 + (s.n_total - f.dft + 0.5)/(f.dft + 0.5))
           * tf.freq / (tf.freq + 1.2 * (0.25 + 0.75 * ({duckdb_byte4_roundtrip_sql('dl.dl')})::DOUBLE / s.avgdl))
           * (CASE WHEN dm.doc_id IS NOT NULL THEN 0.2 ELSE 1.0 END) AS contrib
  FROM tf CROSS JOIN dft f JOIN dl ON tf.doc_id = dl.doc_id
  LEFT JOIN demote dm ON dm.doc_id = tf.doc_id CROSS JOIN stats s)
SELECT doc_id, round(contrib, 6) AS score
FROM scored ORDER BY score DESC, doc_id ASC LIMIT 10""",
)
def boosting_query_demote(spark, sf_dir):
    """BoostingQuery: BM25('merge') with docs containing 'slow' demoted
    by x0.2 (matched, not excluded)."""
    from .driver_queries import _spark_byte4_sql

    toks = _tokens(spark, sf_dir)
    dl = toks.select("doc_id", F.size("tokens").alias("dl"))
    stats = dl.agg(
        F.count("*").cast("double").alias("n_total"),
        (F.sum("dl") / F.count("*")).alias("avgdl"),
    )
    flat = toks.select("doc_id", F.explode("tokens").alias("term"))
    tf = (
        flat.filter(F.col("term") == "merge")
        .groupBy("doc_id")
        .agg(F.count("*").cast("double").alias("freq"))
    )
    dft = tf.agg(F.count("*").cast("double").alias("dft"))
    demote = (
        flat.filter(F.col("term") == "slow").select("doc_id").distinct()
        .withColumn("is_demoted", F.lit(1))
    )
    dlq = F.expr(_spark_byte4_sql("dl")).cast("double")
    scored = (
        tf.join(dl, "doc_id")
        .join(demote, "doc_id", "left")
        .crossJoin(F.broadcast(stats))
        .crossJoin(F.broadcast(dft))
        .withColumn("dlq", dlq)
        .withColumn(
            "contrib",
            F.log(1.0 + (F.col("n_total") - F.col("dft") + 0.5) / (F.col("dft") + 0.5))
            * F.col("freq")
            / (F.col("freq") + 1.2 * (0.25 + 0.75 * F.col("dlq") / F.col("avgdl")))
            * F.when(F.col("is_demoted").isNotNull(), 0.2).otherwise(1.0),
        )
    )
    return (
        scored.select("doc_id", F.round(F.col("contrib"), 6).alias("score"))
        .orderBy(F.desc("score"), F.asc("doc_id"))
        .limit(10)
    )


# ---------------------------------------------------------------------------
# group.query — solr/core/.../search/grouping/distributed/command/
# QueryCommand.java (grouping by QUERIES instead of a field: each
# group.query defines one group, with its own top-N). Two query-defined
# groups ('join' docs, 'window' docs), top-3 per group by n_chars desc.
# ---------------------------------------------------------------------------


@register(
    "group_query_topk",
    f"""WITH {_TOKS_CTE},
m AS (SELECT 'q_join' AS grp, doc_id FROM toks WHERE term = 'join'
      UNION ALL
      SELECT 'q_window', doc_id FROM toks WHERE term = 'window'),
md AS (SELECT DISTINCT grp, doc_id FROM m),
ranked AS (SELECT md.grp, md.doc_id, d.n_chars,
                  row_number() OVER (PARTITION BY md.grp
                                     ORDER BY d.n_chars DESC, md.doc_id ASC) AS rnk
           FROM md JOIN documents d USING (doc_id))
SELECT grp, doc_id, n_chars FROM ranked WHERE rnk <= 3
ORDER BY grp ASC, n_chars DESC, doc_id ASC""",
)
def group_query_topk(spark, sf_dir):
    """group.query: per-query groups with independent top-3 (n_chars
    desc)."""
    from pyspark.sql.window import Window

    toks = _tokens(spark, sf_dir)
    docs = _read(spark, sf_dir, "documents").select("doc_id", "n_chars")
    parts = []
    for grp, term in (("q_join", "join"), ("q_window", "window")):
        parts.append(
            toks.filter(F.array_contains("tokens", term))
            .select(F.lit(grp).alias("grp"), "doc_id")
        )
    m = parts[0].unionByName(parts[1]).join(docs, "doc_id")
    w = Window.partitionBy("grp").orderBy(
        F.desc("n_chars"), F.asc("doc_id")
    )
    return (
        m.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= 3)
        .select("grp", "doc_id", "n_chars")
        .orderBy(F.asc("grp"), F.desc("n_chars"), F.asc("doc_id"))
    )


# ---------------------------------------------------------------------------
# ENGINE-PATH shard split — solr/core/.../update/SplitIndexCommand.java
# (SPLITSHARD): partition a segment's doc space at the midpoint into two
# sub-shards and account for what lands where. The engine side decodes
# the REAL posting blocks (operators/merge.py#decode_postings) and
# aggregates per half — the same doc-id-range routing a split performs;
# the oracle recounts from raw tokens. At scale the split is a
# partition-pruned copy per range (postings blocks never span buckets,
# so a doc-range split never rewrites a block's neighbours).
# ---------------------------------------------------------------------------


@register(
    "shard_split_counts",
    f"""WITH {_TOKS_CTE},
mid AS (SELECT (count(*) // 2)::BIGINT AS m FROM documents)
SELECT CASE WHEN t.doc_id < m.m THEN 'left' ELSE 'right' END AS half,
       count(DISTINCT t.doc_id)::BIGINT AS n_docs,
       count(DISTINCT t.term)::BIGINT AS n_terms,
       count(*)::BIGINT AS sum_tf
FROM toks t CROSS JOIN mid m GROUP BY 1 ORDER BY 1""",
)
def shard_split_counts(spark, sf_dir):
    """SPLITSHARD accounting: decode the real segment postings, split the
    doc space at n_docs/2, count docs/terms/occurrences per half."""
    from ..operators.merge import decode_postings
    from .solr_queries import _engine_searcher

    s = _engine_searcher(spark, sf_dir)
    mid = s.segment.stats.n_docs // 2
    rows = decode_postings(s.segment.table(spark, "postings"))
    return (
        rows.withColumn(
            "half",
            F.when(F.col("doc_id") < mid, "left").otherwise("right"),
        )
        .groupBy("half")
        .agg(
            F.countDistinct("doc_id").alias("n_docs"),
            F.countDistinct("term").alias("n_terms"),
            F.sum("freq").cast("long").alias("sum_tf"),
        )
        .orderBy("half")
    )


# ---------------------------------------------------------------------------
# ENGINE-PATH TermAutomatonQuery —
# lucene/sandbox/.../search/TermAutomatonQuery.java: the automaton
# accepting {"key order", "key value"} (states 0-key->1, 1-order->2,
# 1-value->2, accept {2}) compiled via the #rewrite discipline to
# SpanOr(Phrase(key,order), Phrase(key,value)) and run on the span
# kernel (operators/automaton.py). freq = accepted-window count; idf
# summed over the distinct automaton terms present; float32-exact.
# ---------------------------------------------------------------------------


@register(
    "term_automaton_topk",
    f"""WITH tokarr AS (SELECT doc_id, {duckdb_tokenize_sql('text')} AS t FROM documents),
stats AS (SELECT count(*)::BIGINT AS n_docs, sum(len(t))::BIGINT AS sum_ttf FROM tokarr),
dl AS (SELECT doc_id, len(t) AS dl FROM tokarr),
dft AS (SELECT term, count(DISTINCT doc_id)::DOUBLE AS df
        FROM (SELECT doc_id, unnest(t) AS term FROM tokarr)
        WHERE term IN ('key', 'order', 'value') GROUP BY term),
idf AS (SELECT (sum(ln(1 + ((s.n_docs::DOUBLE) - d.df + 0.5) / (d.df + 0.5))))::FLOAT
          AS idf_f
        FROM dft d CROSS JOIN stats s),
surv AS (SELECT doc_id,
        len(list_filter(range(1, len(t)),
            i -> t[i] = 'key' AND (t[i+1] = 'order' OR t[i+1] = 'value')))
          ::BIGINT AS freq
    FROM tokarr),
scored AS (SELECT s2.doc_id,
       ((i.idf_f
         * ((s2.freq::FLOAT)
            / ((s2.freq::FLOAT)
               + ((1.2::FLOAT)
                  * ((0.25::FLOAT)
                     + (((0.75::FLOAT)
                         * (({duckdb_byte4_roundtrip_sql('dl.dl')})::FLOAT))
                        / ((s.sum_ttf::DOUBLE / s.n_docs::DOUBLE)::FLOAT)))))))
          ::FLOAT) AS score_f
    FROM surv s2 JOIN dl USING (doc_id) CROSS JOIN idf i CROSS JOIN stats s
    WHERE s2.freq > 0)
SELECT doc_id, round(score_f::DOUBLE, 4) AS score
FROM scored ORDER BY score_f DESC, doc_id ASC LIMIT 10""",
)
def term_automaton_topk(spark, sf_dir):
    """Real-engine TermAutomatonQuery {'key order' | 'key value'} top-10,
    float32-exact cross-engine."""
    from ..operators.automaton import TermAutomaton, automaton_topk
    from .solr_queries import _engine_searcher

    s = _engine_searcher(spark, sf_dir)
    auto = TermAutomaton(
        transitions=((0, 1, "key"), (1, 2, "order"), (1, 2, "value")),
        accept=frozenset({2}),
    )
    res = automaton_topk(spark, s.segment, auto, k=10)
    return res.select(
        "doc_id", F.round(F.col("score").cast("double"), 4).alias("score")
    )


# ---------------------------------------------------------------------------
# DateRangeField interval overlap —
# solr/core/.../schema/DateRangeField.java +
# lucene/spatial-extras/.../DateRangePrefixTree.java: documents carry
# DATE RANGES and a query range matches on INTERSECTION (op=Intersects,
# the default). Each lineitem's [o_orderdate, l_shipdate] order-to-ship
# window vs the query month: start <= q_end AND end >= q_start — both
# comparisons push to the scans before the key join (the prefix-tree
# pruning analog is row-group min/max on the two date columns).
# ---------------------------------------------------------------------------


@register(
    "date_range_overlap",
    """SELECT count(*)::BIGINT AS n_rows,
       sum(l_quantity)::BIGINT AS sum_qty,
       min(strftime(o.o_orderdate, '%Y-%m-%d')) AS first_start
FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
WHERE o.o_orderdate <= DATE '1995-06-30' AND l.l_shipdate >= DATE '1995-06-01'""",
)
def date_range_overlap(spark, sf_dir):
    """DateRangeField Intersects: order-to-ship windows overlapping
    June 1995."""
    li = _read(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") >= "1995-06-01"
    )
    o = _read(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") <= "1995-06-30"
    )
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .agg(
            F.count("*").alias("n_rows"),
            F.sum("l_quantity").cast("long").alias("sum_qty"),
            F.date_format(F.min("o_orderdate"), "yyyy-MM-dd").alias(
                "first_start"
            ),
        )
    )


# ---------------------------------------------------------------------------
# Field-mutating update processors —
# solr/core/.../update/processor/CloneFieldUpdateProcessorFactory.java,
# RegexReplaceProcessorFactory.java, TrimFieldUpdateProcessorFactory.java,
# ConcatFieldUpdateProcessorFactory.java: the standard ingest chain that
# rewrites fields before indexing. One narrow projection — every mutation
# is a Column expression inside whole-stage codegen, applied in chain
# order (clone -> regex-replace -> trim -> concat), no UDF.
# ---------------------------------------------------------------------------


@register(
    "field_mutating_update",
    """SELECT doc_id, lang AS lang_orig, upper(lang) AS lang_clone,
       trim(regexp_replace(substring(text, 1, 40), '[0-9]+', '#', 'g'))
         AS text_norm,
       lang || '/' || source AS route_key
FROM documents ORDER BY doc_id ASC LIMIT 25""",
)
def field_mutating_update(spark, sf_dir):
    """Update-processor chain: clone (upper), regexReplace (digits->#),
    trim, concat — all codegen Column exprs."""
    d = _read(spark, sf_dir, "documents")
    return (
        d.select(
            "doc_id",
            F.col("lang").alias("lang_orig"),
            F.upper("lang").alias("lang_clone"),
            F.trim(
                F.regexp_replace(
                    F.substring("text", 1, 40), "[0-9]+", "#"
                )
            ).alias("text_norm"),
            F.concat_ws("/", "lang", "source").alias("route_key"),
        )
        .orderBy("doc_id")
        .limit(25)
    )


# ---------------------------------------------------------------------------
# stats.calcdistinct — solr/core/.../handler/component/
# StatsValuesFactory.java (calcDistinct=true): the stats bundle gains
# countDistinct + distinctValues cardinality. Exact distinct is a
# map-combined aggregation; the HLL sibling (hll_approx_distinct) is the
# 10^12-file path, this row is the exact small-cardinality form the
# reference computes for numeric fields.
# ---------------------------------------------------------------------------


@register(
    "stats_calcdistinct",
    """SELECT count(l_quantity)::BIGINT AS cnt,
       count(DISTINCT l_quantity)::BIGINT AS count_distinct,
       min(l_quantity)::BIGINT AS min_q,
       max(l_quantity)::BIGINT AS max_q,
       sum(l_quantity)::BIGINT AS sum_q
FROM lineitem""",
)
def stats_calcdistinct(spark, sf_dir):
    """StatsComponent with calcdistinct: exact distinct cardinality in
    the same single-pass bundle."""
    li = _read(spark, sf_dir, "lineitem")
    return li.agg(
        F.count("l_quantity").alias("cnt"),
        F.countDistinct("l_quantity").alias("count_distinct"),
        F.min("l_quantity").cast("long").alias("min_q"),
        F.max("l_quantity").cast("long").alias("max_q"),
        F.sum("l_quantity").cast("long").alias("sum_q"),
    )


# ---------------------------------------------------------------------------
# Expressions module — lucene/expressions/.../js/JavascriptCompiler.java
# (+ SimpleBindings): a javascript-like arithmetic expression over named
# doc-value bindings compiled to a per-doc double, used as a sort key /
# boost. functions/expressions.py compiles the SAME source string to a
# Catalyst Column (whole-stage codegen, no UDF) AND to ANSI SQL for the
# oracle — the row pins the compiler on both backends, not hand-copied
# arithmetic. Bindings: n_chars (stored field), dl (token count).
# ---------------------------------------------------------------------------

_EXPR_SRC = (
    "sqrt(n_chars) + 2*dl - (dl > 100 ? 10 : 0) + min(n_chars, 500)/100"
)


def _expr_oracle_sql():
    from ..functions.expressions import compile_sql

    e = compile_sql(_EXPR_SRC, {"n_chars": "dl.n_chars", "dl": "dl.c"})
    return f"""WITH {_TOKS_CTE},
dl AS (SELECT d.doc_id, d.n_chars, coalesce(t.c, 0) AS c
       FROM documents d LEFT JOIN (SELECT doc_id, count(*) AS c FROM toks GROUP BY 1) t USING (doc_id))
SELECT doc_id, round({e}, 6) AS expr_val
FROM dl ORDER BY expr_val DESC, doc_id ASC LIMIT 10"""


@register("expression_sort_topk", _expr_oracle_sql())
def expression_sort_topk(spark, sf_dir):
    """Expression-compiled sort key: top-10 docs by the compiled
    double expression over (n_chars, dl) bindings."""
    from ..functions.expressions import compile_column

    toks = _tokens(spark, sf_dir)
    docs = _read(spark, sf_dir, "documents").select("doc_id", "n_chars")
    base = docs.join(
        toks.select("doc_id", F.size("tokens").alias("dl")), "doc_id", "left"
    ).na.fill({"dl": 0})
    col = compile_column(
        _EXPR_SRC, {"n_chars": F.col("n_chars"), "dl": F.col("dl")}
    )
    return (
        base.select("doc_id", F.round(col, 6).alias("expr_val"))
        .orderBy(F.desc("expr_val"), F.asc("doc_id"))
        .limit(10)
    )


# ---------------------------------------------------------------------------
# ENGINE-PATH XML query parser — lucene/queryparser/.../xml/CoreParser.java
# (+ TermQueryBuilder/BooleanQueryBuilder) and Solr's XmlQParserPlugin:
# the XML form of '+order batch^2 stream -table' parses to the SAME
# engine Boolean tree the classic parser builds and runs through the
# same tree scorer — so the oracle is the bool_engine_topk float32
# mirror verbatim (clause fold in clause order, boost as f32(s·b),
# MUST_NOT gates without scoring).
# ---------------------------------------------------------------------------


def _xml_bool_oracle():
    from .coverage3_queries import _f32_bm25_ctes

    return f"""WITH {_f32_bm25_ctes(['batch', 'order', 'stream', 'table'])},
cand AS (SELECT doc_id FROM contrib WHERE term = 'order'
         EXCEPT SELECT doc_id FROM contrib WHERE term = 'table'),
cl AS (SELECT c.doc_id,
              CASE c.term WHEN 'order' THEN 0 WHEN 'batch' THEN 1 ELSE 2 END
                AS cidx,
              CASE WHEN c.term = 'batch' THEN (c.s_t * (2.0::FLOAT))::FLOAT
                   ELSE c.s_t END AS s_b
       FROM contrib c JOIN cand USING (doc_id) WHERE c.term <> 'table'),
boolscored AS (SELECT doc_id,
                      list_reduce(list(s_b ORDER BY cidx),
                                  (a, b) -> (a + b)::FLOAT) AS score_f
               FROM cl GROUP BY doc_id)
SELECT doc_id, round(score_f::DOUBLE, 4) AS score
FROM boolscored ORDER BY score_f DESC, doc_id ASC LIMIT 10"""


@register("xml_query_topk", _xml_bool_oracle())
def xml_query_topk(spark, sf_dir):
    """Real-engine XML query (CoreParser analog): the XML Boolean form of
    '+order batch^2 stream -table', float32-exact cross-engine."""
    from ..operators.xmlparser import parse_xml_query
    from .solr_queries import _engine_searcher

    xml = (
        '<BooleanQuery>'
        '<Clause occurs="must"><TermQuery>order</TermQuery></Clause>'
        '<Clause occurs="should"><TermQuery boost="2">batch</TermQuery></Clause>'
        '<Clause occurs="should"><TermQuery>stream</TermQuery></Clause>'
        '<Clause occurs="mustNot"><TermQuery>table</TermQuery></Clause>'
        '</BooleanQuery>'
    )
    s = _engine_searcher(spark, sf_dir)
    res = s.topk_query(parse_xml_query(xml), k=10)
    return res.select(
        "doc_id", F.round(F.col("score").cast("double"), 4).alias("score")
    )


# ---------------------------------------------------------------------------
# JSON facet allBuckets — solr/core/.../search/facet/FacetField.java
# (allBuckets:true): alongside the per-value buckets, ONE synthetic
# bucket aggregating the whole facet domain (all docs with the field) —
# rollup on the facet key gives both levels in a single shuffle.
# Per-lang doc counts + sum(n_chars) with the allBuckets row keyed NULL.
# ---------------------------------------------------------------------------


@register(
    "facet_allbuckets",
    """SELECT lang, count(*)::BIGINT AS n_docs, sum(n_chars)::BIGINT AS sum_chars
FROM documents
GROUP BY ROLLUP (lang)
ORDER BY lang ASC NULLS FIRST""",
)
def facet_allbuckets(spark, sf_dir):
    """terms facet with allBuckets:true — the NULL-keyed row is the
    whole-domain aggregate."""
    d = _read(spark, sf_dir, "documents")
    return (
        d.rollup("lang")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_chars").alias("sum_chars"),
        )
        .orderBy(F.col("lang").asc_nulls_first())
    )


# ---------------------------------------------------------------------------
# facet.contains — solr/core/.../request/SimpleFacets.java
# (facet.contains / facet.contains.ignoreCase): restrict the facet value
# enumeration to values containing a substring, counts unchanged. Facet
# over the term vocabulary filtered to values containing 'ar'.
# ---------------------------------------------------------------------------


@register(
    "facet_contains_filter",
    f"""WITH {_TOKS_CTE}
SELECT term, count(DISTINCT doc_id)::BIGINT AS n_docs
FROM toks WHERE contains(lower(term), 'ar')
GROUP BY term ORDER BY n_docs DESC, term ASC LIMIT 10""",
)
def facet_contains_filter(spark, sf_dir):
    """facet.field over terms with facet.contains=ar."""
    toks = _tokens(spark, sf_dir).select(
        "doc_id", F.explode("tokens").alias("term")
    )
    return (
        toks.filter(F.lower("term").contains("ar"))
        .groupBy("term")
        .agg(F.countDistinct("doc_id").alias("n_docs"))
        .orderBy(F.desc("n_docs"), F.asc("term"))
        .limit(10)
    )


# ---------------------------------------------------------------------------
# ENGINE-PATH terms.regex — solr/core/.../handler/component/
# TermsComponent.java (terms.regex / terms.regexFlag): enumerate the
# terms DICTIONARY by regular expression (no postings decode), docFreq +
# totalTermFreq from the dict rows — the regex sibling of
# terms_component_enum's prefix walk.
# ---------------------------------------------------------------------------


@register(
    "terms_regex",
    f"""WITH {_TOKS_CTE}
SELECT term, count(DISTINCT doc_id)::BIGINT AS df, count(*)::BIGINT AS ttf
FROM toks WHERE regexp_matches(term, '^[a-z]*a[a-z]*$')
GROUP BY term ORDER BY df DESC, term ASC LIMIT 10""",
)
def terms_regex(spark, sf_dir):
    """terms.regex='^[a-z]*a[a-z]*$': dictionary-only regex enumeration
    with df/ttf."""
    from .solr_queries import _engine_searcher

    s = _engine_searcher(spark, sf_dir)
    terms = s.segment.table(spark, "terms")
    return (
        terms.filter(F.col("term").rlike("^[a-z]*a[a-z]*$"))
        .select("term", "df", "ttf")
        .orderBy(F.desc("df"), F.asc("term"))
        .limit(10)
    )


# ---------------------------------------------------------------------------
# timeseries gap filling — solrj/io/stream/TimeSeriesStream.java: the
# stream emits EVERY bucket in [start, end] at the requested gap, with
# zero metrics for intervals holding no docs (unlike a plain groupBy,
# which silently drops empty buckets). Dense month axis via sequence()
# + explode (JVM-side), left join, zero-fill; the sum rides an exact
# decimal accumulation and lands as round(•, 2) DOUBLE on both engines.
# ---------------------------------------------------------------------------


@register(
    "timeseries_gap_fill",
    """WITH months AS (
  SELECT unnest(generate_series(DATE '1996-01-01', DATE '1996-12-01',
                                INTERVAL 1 MONTH))::DATE AS mstart),
agg AS (
  SELECT date_trunc('month', o_orderdate)::DATE AS mstart,
         count(*)::BIGINT AS n_orders,
         round(sum(CAST(o_totalprice AS DECIMAL(18,2))), 2)::DOUBLE AS sum_price
  FROM orders
  WHERE o_totalprice > 450000
    AND o_orderdate >= DATE '1996-01-01' AND o_orderdate < DATE '1997-01-01'
  GROUP BY 1)
SELECT strftime(m.mstart, '%Y-%m') AS month,
       coalesce(a.n_orders, 0)::BIGINT AS n_orders,
       coalesce(a.sum_price, 0.0)::DOUBLE AS sum_price
FROM months m LEFT JOIN agg a USING (mstart)
ORDER BY month ASC""",
)
def timeseries_gap_fill(spark, sf_dir):
    """timeseries(gap=+1MONTH) over high-value 1996 orders: every month
    bucket present, empty ones zero-filled."""
    o = _read(spark, sf_dir, "orders")
    months = spark.range(1).select(
        F.explode(
            F.sequence(
                F.lit("1996-01-01").cast("date"),
                F.lit("1996-12-01").cast("date"),
                F.expr("interval 1 month"),
            )
        ).alias("mstart")
    )
    agg = (
        o.filter(
            (F.col("o_totalprice") > 450000)
            & (F.col("o_orderdate") >= "1996-01-01")
            & (F.col("o_orderdate") < "1997-01-01")
        )
        .groupBy(F.trunc("o_orderdate", "MM").alias("mstart"))
        .agg(
            F.count("*").alias("n_orders"),
            F.round(
                F.sum(F.col("o_totalprice").cast("decimal(18,2)")), 2
            ).cast("double").alias("sum_price"),
        )
    )
    return (
        F.broadcast(months)
        .join(agg, "mstart", "left")
        .select(
            F.date_format("mstart", "yyyy-MM").alias("month"),
            F.coalesce("n_orders", F.lit(0)).cast("long").alias("n_orders"),
            F.coalesce("sum_price", F.lit(0.0)).cast("double").alias(
                "sum_price"
            ),
        )
        .orderBy("month")
    )


# ---------------------------------------------------------------------------
# JSON facet numBuckets + missing — solr/core/.../search/facet/
# FacetField.java (numBuckets:true, missing:true): alongside the top-N
# value buckets the response reports HOW MANY distinct buckets exist in
# the whole domain and the count of docs with no value. One pass: the
# top-N agg and the two scalars share the grouped frame (the reference
# runs a separate cardinality pass).
# ---------------------------------------------------------------------------


@register(
    "facet_numbuckets",
    """WITH b AS (SELECT source, count(*)::BIGINT AS n_docs FROM documents
           WHERE source IS NOT NULL GROUP BY source),
top AS (SELECT source, n_docs FROM b ORDER BY n_docs DESC, source ASC LIMIT 5)
SELECT t.source, t.n_docs,
       (SELECT count(*) FROM b)::BIGINT AS num_buckets,
       (SELECT count(*) FROM documents WHERE source IS NULL)::BIGINT AS missing
FROM top t ORDER BY t.n_docs DESC, t.source ASC""",
)
def facet_numbuckets(spark, sf_dir):
    """terms facet with numBuckets:true + missing:true — top-5 buckets
    plus whole-domain bucket cardinality and missing count."""
    d = _read(spark, sf_dir, "documents")
    b = (
        d.filter(F.col("source").isNotNull())
        .groupBy("source")
        .agg(F.count("*").alias("n_docs"))
    )
    scalars = b.agg(F.count("*").alias("num_buckets")).crossJoin(
        d.filter(F.col("source").isNull()).agg(
            F.count("*").alias("missing")
        )
    )
    return (
        b.orderBy(F.desc("n_docs"), F.asc("source"))
        .limit(5)
        .crossJoin(F.broadcast(scalars))
        .select("source", "n_docs", "num_buckets", "missing")
        .orderBy(F.desc("n_docs"), F.asc("source"))
    )


# ---------------------------------------------------------------------------
# Solr Cell / document extraction — solr/contrib/extraction/
# ExtractingRequestHandler.java + ExtractingDocumentLoader.java (Tika):
# binary payloads are type-detected by magic bytes and their text
# extracted in ONE Arrow-batched pass (sources/extraction.py). Deterministic
# mixed-type payloads (doc_id%4 rotates plain/HTML/fake-PDF/fake-PNG);
# plain+HTML extraction is real, PDF is feature-gated (text NULL, the
# ignoreTikaException=true discipline), images carry no text stream.
# ---------------------------------------------------------------------------


@register(
    "extract_content_types",
    """SELECT CASE doc_id % 4 WHEN 0 THEN 'text/plain' WHEN 1 THEN 'text/html'
            WHEN 2 THEN 'application/pdf' ELSE 'image/png' END AS content_type,
       count(*)::BIGINT AS n_docs,
       sum(strlen(text) + CASE doc_id % 4 WHEN 0 THEN 0 WHEN 1 THEN 33
            WHEN 2 THEN 9 ELSE 8 END)::BIGINT AS sum_bytes,
       count(*) FILTER (doc_id % 4 IN (0, 1))::BIGINT AS n_with_text,
       coalesce(sum(CASE doc_id % 4 WHEN 0 THEN length(text)
                    WHEN 1 THEN length(text) + 6 END), 0)::BIGINT
         AS sum_text_chars
FROM documents GROUP BY 1 ORDER BY 1""",
)
def extract_content_types(spark, sf_dir):
    """Tika-pipeline accounting: per detected type — docs, payload bytes,
    extractable docs, extracted text chars."""
    from ..sources.extraction import extract_documents, synth_payloads

    d = _read(spark, sf_dir, "documents").select("doc_id", "text")
    ex = extract_documents(synth_payloads(d))
    return (
        ex.groupBy("content_type")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_bytes").cast("long").alias("sum_bytes"),
            F.count("text").alias("n_with_text"),
            F.coalesce(F.sum(F.length("text")), F.lit(0))
            .cast("long")
            .alias("sum_text_chars"),
        )
        .orderBy("content_type")
    )


# ---------------------------------------------------------------------------
# ENGINE-PATH term vectors with positions —
# solr/core/.../handler/component/TermVectorComponent.java
# (tv.positions=true) / index/TermVectorsWriter.java: per requested doc,
# every term with its ORDERED position list. Decoded from the REAL
# positional postings (pos_bin delta+FOR blocks) in one Arrow pass over
# the three requested docs' rows — the oracle recomputes 0-based token
# subscripts from raw text.
# ---------------------------------------------------------------------------


@register(
    "term_vectors_positions",
    f"""WITH tokarr AS (SELECT doc_id, {duckdb_tokenize_sql('text')} AS t FROM documents
             WHERE doc_id IN (0, 1, 2))
SELECT doc_id, t[i] AS term, (i - 1)::BIGINT AS pos
FROM tokarr, unnest(range(1, len(t) + 1)) AS u(i)
ORDER BY doc_id ASC, term ASC, pos ASC""",
)
def term_vectors_positions(spark, sf_dir):
    """tv.positions=true for docs {0,1,2}: (doc_id, term, position) rows
    decoded from the engine's packed positional postings.

    Scale note: the positions table is term-partitioned (prox file
    layout), so a per-doc read relies on row-group doc_id min/max plus
    the bucket predicate below — fine for small doc sets, but a 100 TB
    deployment serving heavy TV traffic would materialize Lucene's
    actual answer: a doc-keyed term-vectors store (.tvd), i.e. these
    same rows re-partitioned by doc bucket at build time."""
    import pandas as _pd

    from ..functions.packing import delta_decode, unpack_ints
    from .solr_queries import _engine_searcher

    s = _engine_searcher(spark, sf_dir)
    bd = s.segment.stats.bucket_docs
    wanted = (0, 1, 2)
    rows = s.segment.table(spark, "positions").filter(
        F.col("bucket").isin(*sorted({d // bd for d in wanted}))
        & F.col("doc_id").isin(*wanted)
    )

    def decode(batches):
        for pdf in batches:
            out = {"doc_id": [], "term": [], "pos": []}
            for row in pdf.itertuples():
                pos = delta_decode(unpack_ints(row.pos_bin))
                for p in pos.tolist():
                    out["doc_id"].append(int(row.doc_id))
                    out["term"].append(row.term)
                    out["pos"].append(int(p))
            yield _pd.DataFrame(out)

    return (
        rows.select("doc_id", "term", "pos_bin")
        .mapInPandas(decode, "doc_id long, term string, pos long")
        .orderBy("doc_id", "term", "pos")
    )


# ---------------------------------------------------------------------------
# ENGINE-PATH docValues facet — solr/core/.../request/SimpleFacets.java
# with facet.method=fcs over a docValues field: the facet reads the
# SEGMENT's stored-fields/docValues column (never raw input), so
# equality with the raw-text oracle pins stored-field integrity through
# the build. Top-5 langs by doc count.
# ---------------------------------------------------------------------------


@register(
    "facet_engine_docvalues",
    """SELECT lang, count(*)::BIGINT AS n_docs FROM documents
GROUP BY lang ORDER BY n_docs DESC, lang ASC LIMIT 5""",
)
def facet_engine_docvalues(spark, sf_dir):
    """facet.field=lang off the segment docmap (docValues read path)."""
    from .solr_queries import _engine_searcher

    s = _engine_searcher(spark, sf_dir)
    return (
        s.segment.table(spark, "docmap")
        .groupBy("lang")
        .agg(F.count("*").alias("n_docs"))
        .orderBy(F.desc("n_docs"), F.asc("lang"))
        .limit(5)
    )
