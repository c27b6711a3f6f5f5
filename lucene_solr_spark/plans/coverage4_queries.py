"""Round-3 coverage: index-time SynonymGraphFilter (the last
non-environmental analysis gap from VERDICT r02 §"What's missing" #1).

Each entry re-expresses a reference operator (public lucene-solr path cited
per entry; reference mount is empty, so citations are path#symbol only) over
the driver testdata with a DuckDB oracle using identical column aliases and
matched float32 formulas. Registered into the same REGISTRY/ORACLES as
driver_queries (imported by __spark_entry__).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ..functions.analysis import duckdb_tokenize_sql
from ..functions.smallfloat import duckdb_byte4_roundtrip_sql
from .driver_queries import register

# one synonym-graph segment per sf_dir, shared by the rows below
_SYN_SEG_CACHE: dict = {}

_TOKS_CTE_C4 = (
    f"toks AS (SELECT doc_id, unnest({duckdb_tokenize_sql('text')}) AS term "
    "FROM documents)"
)

# the rule set: 'spark' ≡ 'big data' (equivalence, expand=true). The
# multi-token OUTPUT direction — a doc containing the single token 'spark'
# becomes phrase-findable as "big data" — is precisely what Lucene's
# index-time path loses to FlattenGraphFilter and this engine keeps
# (functions/synonyms.py stores token-graph end nodes; phrase matching is
# path-chaining in phrase.py#_exact_freqs_graph).
_SYN_RULES_LINES = ["spark, big data"]


def _syn_segment(spark, sf_dir):
    if sf_dir not in _SYN_SEG_CACHE:
        from ..corpus import documents_as_corpus
        from ..functions.synonyms import parse_synonym_rules
        from ..operators.indexer import build_index

        _SYN_SEG_CACHE[sf_dir] = build_index(
            spark,
            documents_as_corpus(spark, sf_dir),
            out_dir=None,
            with_positions=True,
            synonyms=parse_synonym_rules(_SYN_RULES_LINES),
        )
    return _SYN_SEG_CACHE[sf_dir]


# ---------------------------------------------------------------------------
# ENGINE-PATH index-time synonym graph — analysis/synonym/SynonymGraphFilter
# .java + SolrSynonymParser.java, minus the FlattenGraphFilter loss: phrase
# "big data" must match docs that contain the literal bigram AND docs that
# only contain 'spark' (the rule's expansion threads fresh graph nodes, so
# big->data adjacency holds across the injected path). Scored as a real
# phrase (PhraseWeight): freq = number of graph paths, idf summed over the
# phrase terms' dfs IN THE SYNONYM-AUGMENTED index, byte4 norms counting
# ORIGINAL tokens only (discountOverlaps), avgdl from sumTotalTermFreq
# INCLUDING injected tokens — both exactly Lucene's collection-stats
# contract. The oracle derives every quantity from raw text and emulates
# IEEE binary32 op order (same discipline as synonym_engine_topk in
# coverage3_queries.py).
#
# Identities the oracle leans on (proved in tests/test_synonym_graph.py):
#   paths("big data", doc) = #{literal 'big data' bigrams} + #{'spark'}
#   df('big')  = docs containing literal 'big'  or any 'spark' (injection)
#   df('data') = docs containing literal 'data' or any 'spark'
#   injected tokens per doc = 2*#{'spark'} + #{'big data' bigrams}
# ---------------------------------------------------------------------------


@register(
    "synonym_graph_phrase",
    f"""WITH tokarr AS (SELECT doc_id, {duckdb_tokenize_sql('text')} AS t FROM documents),
per_doc AS (SELECT doc_id, len(t) AS dl0,
       len(list_filter(range(1, len(t)), i -> t[i] = 'big' AND t[i+1] = 'data'))
         AS bigr,
       len(list_filter(t, x -> x = 'spark')) AS sparks,
       list_contains(t, 'big') AS has_big,
       list_contains(t, 'data') AS has_data
    FROM tokarr),
stats AS (SELECT count(*)::BIGINT AS n_docs,
       sum(dl0 + 2 * sparks + bigr)::BIGINT AS sum_ttf,
       count(*) FILTER (has_big OR sparks > 0)::BIGINT AS df_big,
       count(*) FILTER (has_data OR sparks > 0)::BIGINT AS df_data
    FROM per_doc),
hits AS (SELECT doc_id, dl0, (bigr + sparks)::BIGINT AS freq
    FROM per_doc WHERE bigr + sparks > 0),
scored AS (SELECT h.doc_id,
       (((ln(1 + ((s.n_docs::DOUBLE) - s.df_big + 0.5) / (s.df_big + 0.5))
          + ln(1 + ((s.n_docs::DOUBLE) - s.df_data + 0.5) / (s.df_data + 0.5)))::FLOAT
         * ((h.freq::FLOAT)
            / ((h.freq::FLOAT)
               + ((1.2::FLOAT)
                  * ((0.25::FLOAT)
                     + (((0.75::FLOAT)
                         * (({duckdb_byte4_roundtrip_sql('h.dl0')})::FLOAT))
                        / ((s.sum_ttf::DOUBLE / s.n_docs::DOUBLE)::FLOAT)))))))
          ::FLOAT) AS score_f
    FROM hits h CROSS JOIN stats s)
SELECT doc_id, round(score_f::DOUBLE, 4) AS score
FROM scored ORDER BY score_f DESC, doc_id ASC LIMIT 10""",
)
def synonym_graph_phrase(spark, sf_dir):
    """Real-engine phrase "big data" over a synonym-graph index built with
    spark ≡ big data: top-10 docs, float32-exact cross-engine. The hit set
    provably includes docs with no literal 'big data' adjacency (expansion
    paths through fresh graph nodes)."""
    from ..operators.phrase import phrase_topk

    seg = _syn_segment(spark, sf_dir)
    res = phrase_topk(spark, seg, "big data", k=10)
    return res.select(
        "doc_id", F.round(F.col("score").cast("double"), 4).alias("score")
    )


# ---------------------------------------------------------------------------
# Custom facet-aggregate registry — search/facet/AggValueSource.java +
# FacetModule.java (VERDICT r02 §2.J "explicit registry" partial). The row
# registers a USER aggregate (spread = max - min) via
# operators/facets.py#register_agg — Solr's ValueSourceParser plugin
# analog — then runs a nested json.facet spec that references it BY NAME
# from the spec string, through the generic executor (one grouped agg per
# nesting level, top-level limit via distributed TakeOrderedAndProject,
# per-parent limit via bounded windows, subfacet joined back broadcast).
# ---------------------------------------------------------------------------


@register(
    "json_facet_custom_agg",
    """WITH l AS (SELECT lang, count(*)::BIGINT AS count,
            round(avg(n_chars), 6) AS avg_len,
            (max(n_chars) - min(n_chars))::BIGINT AS len_spread
       FROM documents GROUP BY lang),
s AS (SELECT lang, source, count(*)::BIGINT AS c,
             row_number() OVER (PARTITION BY lang ORDER BY count(*) DESC, source ASC) AS rn
      FROM documents GROUP BY lang, source)
SELECT l.lang AS lang, l.count AS count, l.avg_len AS avg_len,
       l.len_spread AS len_spread,
       s.source AS by_src_source, s.c AS by_src_count
FROM l JOIN s ON s.lang = l.lang AND s.rn = 1
ORDER BY l.count DESC, l.lang ASC LIMIT 5""",
)
def json_facet_custom_agg(spark, sf_dir):
    """json.facet with a user-registered aggregate: terms(lang){ count,
    avg(n_chars), spread(n_chars), terms(source, limit:1) } through the
    generic executor."""
    from ..operators import facets
    from .driver_queries import _read

    if "spread" not in facets.AGG_REGISTRY:

        @facets.register_agg("spread")
        def _spread(c):
            return F.max(c) - F.min(c)

    d = _read(spark, sf_dir, "documents")
    out = facets.json_facet(
        d,
        {
            "type": "terms",
            "field": "lang",
            "limit": 5,
            "sort": "count desc",
            "facet": {
                "avg_len": "avg(n_chars)",
                "len_spread": "spread(n_chars)",
                "by_src": {"type": "terms", "field": "source", "limit": 1,
                           "sort": "count desc"},
            },
        },
    )
    return out.select(
        "lang",
        "count",
        F.round("avg_len", 6).alias("avg_len"),
        F.col("len_spread").cast("long").alias("len_spread"),
        "by_src_source",
        F.col("by_src_count").cast("long").alias("by_src_count"),
    ).orderBy(F.desc("count"), F.asc("lang"))


# ---------------------------------------------------------------------------
# ENGINE-PATH CombinedFieldQuery — lucene/sandbox/search/CombinedFieldQuery
# .java (BM25F simple weighting): terms score against a virtual field
# merging body (w=1) and title (w=2, first-5-token segment):
#   freq = 1*tf_body + 2*tf_title ; dl = byte4(1*dl_body + 2*dl_title)
#   df = union over fields ; sumTtf = 1*sumTtf_body + 2*sumTtf_title.
# float32-exact: per-term scores in the binary32 op order of bm25.py,
# summed in lexicographic term order ('merge' then 'spark'); adding an
# absent term's 0 is exact in f32, so COALESCE(…, 0) matches the engine's
# skip. Engine path: operators/fields.py#combined_field_topk (decoded
# postings union -> ONE (term, doc) shuffle -> per-bucket kernel).
# ---------------------------------------------------------------------------


@register(
    "combined_field_topk",
    f"""WITH tokarr AS (SELECT doc_id, {duckdb_tokenize_sql('text')} AS t FROM documents),
fl AS (SELECT doc_id, t AS toks, 1 AS w FROM tokarr
       UNION ALL SELECT doc_id, list_slice(t, 1, 5), 2 FROM tokarr),
pos AS (SELECT doc_id, w, unnest(toks) AS term FROM fl),
tfw AS (SELECT doc_id, term, sum(w)::BIGINT AS wfreq FROM pos
        WHERE term IN ('merge', 'spark') GROUP BY doc_id, term),
dl AS (SELECT doc_id, sum(w * len(toks))::BIGINT AS wdl FROM fl GROUP BY doc_id),
stats AS (SELECT (SELECT count(*) FROM tokarr)::BIGINT AS n_docs,
                 (SELECT sum(w * len(toks)) FROM fl)::BIGINT AS sum_ttf),
dfs AS (SELECT term, count(DISTINCT doc_id)::BIGINT AS df FROM pos
        WHERE term IN ('merge', 'spark') GROUP BY term),
scored AS (SELECT tfw.doc_id, tfw.term,
       (((ln(1 + ((s.n_docs::DOUBLE) - d.df + 0.5) / (d.df + 0.5)))::FLOAT
         * ((tfw.wfreq::FLOAT)
            / ((tfw.wfreq::FLOAT)
               + ((1.2::FLOAT)
                  * ((0.25::FLOAT)
                     + (((0.75::FLOAT)
                         * (({duckdb_byte4_roundtrip_sql('dl.wdl')})::FLOAT))
                        / ((s.sum_ttf::DOUBLE / s.n_docs::DOUBLE)::FLOAT)))))))
          ::FLOAT) AS sc
    FROM tfw JOIN dl USING (doc_id) JOIN dfs d USING (term) CROSS JOIN stats s),
folded AS (SELECT COALESCE(m.doc_id, p.doc_id) AS doc_id,
       ((COALESCE(m.sc, 0::FLOAT) + COALESCE(p.sc, 0::FLOAT))::FLOAT) AS score_f
    FROM (SELECT doc_id, sc FROM scored WHERE term = 'merge') m
    FULL OUTER JOIN (SELECT doc_id, sc FROM scored WHERE term = 'spark') p
    ON m.doc_id = p.doc_id)
SELECT doc_id, round(score_f::DOUBLE, 4) AS score
FROM folded ORDER BY score_f DESC, doc_id ASC LIMIT 10""",
)
def combined_field_topk(spark, sf_dir):
    """Real-engine CombinedFieldQuery top-10 for {merge, spark} over
    body(w=1) + title(w=2), float32-exact cross-engine."""
    from ..operators.fields import combined_field_topk as cfq
    from .coverage3_queries import _title_segment
    from .solr_queries import _engine_searcher

    s = _engine_searcher(spark, sf_dir)
    res = cfq(
        spark,
        {"body": (s.segment, 1), "title": (_title_segment(spark, sf_dir), 2)},
        ["merge", "spark"],
        k=10,
    )
    return res.select(
        "doc_id", F.round(F.col("score").cast("double"), 4).alias("score")
    )


# ---------------------------------------------------------------------------
# ENGINE-PATH FeatureField — document/FeatureField.java: a static per-doc
# feature (here: 'len' = n_chars, a stand-in for pagerank/recency) joins
# the BM25 score through the pinned SaturationFunction w*S/(S+a) as a
# SHOULD clause: total = f32(bm25 + boost). Rescoring window = top-40 BM25
# candidates (4x k, documented over-fetch), boost applied as a JVM-side
# float32 Column over a broadcast feature join — no UDF, no collect.
# Oracle mirrors the window and every f32 op (operators/features.py).
# ---------------------------------------------------------------------------


@register(
    "feature_boost_topk",
    None,  # assembled below (needs the shared f32 BM25 CTEs)
)
def feature_boost_topk(spark, sf_dir):
    """Real-engine BM25('merge') top-40 window re-ranked by saturation
    feature boost 0.5 * len/(len+200), float32-exact cross-engine."""
    from ..operators.features import feature_boost_topk as fbt
    from .driver_queries import _read
    from .solr_queries import _engine_searcher

    s = _engine_searcher(spark, sf_dir)
    feats = _read(spark, sf_dir, "documents").select(
        "doc_id", F.lit("len").alias("feature"),
        F.col("n_chars").cast("float").alias("value"),
    )
    res = fbt(
        spark, s, "merge", feats, "len",
        fn="saturation", k=10, weight=0.5, a=200.0,
    )
    return res.select(
        "doc_id", F.round(F.col("score").cast("double"), 4).alias("score")
    )


def _feature_boost_oracle() -> str:
    from .coverage3_queries import _f32_bm25_ctes

    return f"""WITH {_f32_bm25_ctes(['merge'])},
ranked AS (SELECT doc_id, score_f,
                  row_number() OVER (ORDER BY score_f DESC, doc_id ASC) AS rn
           FROM scored),
cand AS (SELECT r.doc_id, r.score_f, d.n_chars
         FROM ranked r JOIN documents d USING (doc_id) WHERE r.rn <= 40),
boosted AS (SELECT doc_id,
       ((score_f
         + ((0.5::DOUBLE)::FLOAT
            * ((n_chars::FLOAT)
               / (((n_chars::FLOAT) + ((200.0::DOUBLE)::FLOAT))::FLOAT))))
        ::FLOAT) AS score_f2
    FROM cand)
SELECT doc_id, round(score_f2::DOUBLE, 4) AS score
FROM boosted ORDER BY score_f2 DESC, doc_id ASC LIMIT 10"""


from .driver_queries import ORACLES  # noqa: E402

ORACLES["feature_boost_topk"] = _feature_boost_oracle()


# ---------------------------------------------------------------------------
# Bloom-filtered terms dictionary — codecs/bloom/BloomFilteringPostings
# Format.java + FuzzySet.java: a per-segment bitset answers absent-term
# lookups on the DRIVER, skipping the terms-dict scan and the scoring job
# (at 1000 segments: zero no-op jobs instead of 1000). The row probes
# present and absent terms; the oracle pins the no-false-negative
# contract (present => might_contain) — the bit that makes the pruning
# LOSSLESS; false positives only cost the scan that would have run anyway.
# ---------------------------------------------------------------------------


@register(
    "bloom_term_pruning",
    f"""WITH {_TOKS_CTE_C4},
probe AS (SELECT unnest(['merge', 'spark', 'window',
                         'zzzmissing', 'qqqabsent']) AS term),
pres AS (SELECT p.term, count(t.term) > 0 AS present
         FROM probe p LEFT JOIN toks t ON t.term = p.term GROUP BY p.term)
SELECT term, present, true AS no_false_negative
FROM pres ORDER BY term""",
)
def bloom_term_pruning(spark, sf_dir):
    """Per probe term: is it present, and does the bloom honor the
    no-false-negative contract (present -> might_contain)."""
    from ..functions.bloom import TermBloom
    from .solr_queries import _engine_searcher

    s = _engine_searcher(spark, sf_dir)
    bloom = getattr(s, "bloom", None) or s.attach_bloom()
    probes = ["merge", "spark", "window", "zzzmissing", "qqqabsent"]
    present_terms = {
        r["term"]
        for r in s.terms.filter(F.col("term").isin(probes))
        .select("term")
        .collect()
    }
    rows = [
        (
            t,
            t in present_terms,
            bloom.might_contain(t) or t not in present_terms,
        )
        for t in sorted(probes)
    ]
    return spark.createDataFrame(
        rows, "term string, present boolean, no_false_negative boolean"
    )


# ---------------------------------------------------------------------------
# FuzzyQuery with transpositions — search/FuzzyQuery.java: Lucene's
# default metric is OSA (Damerau restricted to one transposition per
# substring, LevenshteinAutomata transpositions=true), under which
# 'mrege' is ONE edit from 'merge' where plain Levenshtein counts two.
# Engine: sound lev <= 2k JVM-side pre-filter over the terms dict, exact
# vectorized OSA on the sliver (search.py#osa_distance). Oracle: DuckDB's
# damerau_levenshtein (identical to OSA on this vocabulary).
# ---------------------------------------------------------------------------


@register(
    "fuzzy_transpositions_terms",
    f"""WITH t AS (SELECT DISTINCT unnest({duckdb_tokenize_sql('text')}) AS term
           FROM documents)
SELECT term FROM t WHERE damerau_levenshtein(term, 'mrege') <= 1
ORDER BY term""",
)
def fuzzy_transpositions_terms(spark, sf_dir):
    """Terms within OSA distance 1 of the transposed probe 'mrege'."""
    from .solr_queries import _engine_searcher

    s = _engine_searcher(spark, sf_dir)
    terms = s.expand_terms(fuzzy=("mrege", 1, True))
    return spark.createDataFrame(
        [(t,) for t in sorted(terms)], "term string"
    )


# ---------------------------------------------------------------------------
# Stream-stream event-time interval join (streaming/windowed.py
# #interval_join_stream): views join the same user's purchases landing
# within 30 minutes after the view, both sides watermarked so join state
# is bounded (Spark drops view state once the purchase watermark passes
# view.ts + horizon). Drained with availableNow over the parquet events
# feed; the oracle is the equivalent batch interval join — equality
# proves the incremental path emits exactly the batch answer.
# ---------------------------------------------------------------------------

_SSJ_CACHE: dict = {}


@register(
    "stream_stream_interval_join",
    """SELECT v.event_id AS view_id, p.event_id AS purchase_id
FROM events v JOIN events p
  ON v.event_type = 'view' AND p.event_type = 'purchase'
 AND p.user_id = v.user_id
 AND p.ts >= v.ts AND p.ts <= v.ts + INTERVAL 30 MINUTE
ORDER BY view_id, purchase_id""",
)
def stream_stream_interval_join(spark, sf_dir):
    """Incremental view->purchase attribution pairs, equal to the batch
    interval join."""
    import hashlib as _h
    import shutil

    from ..streaming.windowed import interval_join_available
    from .driver_queries import _read

    if sf_dir not in _SSJ_CACHE:
        root = "/tmp/spark_graft_ssj/" + _h.md5(sf_dir.encode()).hexdigest()[:8]
        shutil.rmtree(root, ignore_errors=True)
        ev = _read(spark, sf_dir, "events")
        # two drains: incremental emission across resumed checkpoints
        for b in (ev.filter(F.col("ts") < "2024-01-15"),
                  ev.filter(F.col("ts") >= "2024-01-15")):
            b.coalesce(1).write.mode("append").parquet(root + "/in")
            interval_join_available(
                spark, root + "/in", root + "/out", root + "/ckpt"
            )
        _SSJ_CACHE[sf_dir] = root
    out = spark.read.parquet(_SSJ_CACHE[sf_dir] + "/out")
    return (
        out.select(F.col("view_id"), F.col("purchase_id"))
        .orderBy("view_id", "purchase_id")
    )


# ---------------------------------------------------------------------------
# Cross-dataset bloom dedup — dedupe an incoming batch against a huge
# reference corpus by broadcasting a bloom over the reference's doc
# hashes instead of shuffling the reference (operators/dedup.py
# #bloom_dedup_against; the CCNet/RefinedWeb cross-snapshot recipe).
# Bloom-cleared docs are EXACT non-duplicates; only the maybe-dup sliver
# pays the verification join, so the verified dup count equals the exact
# join count — which is what the oracle computes. The maybe-dup count
# itself is hash-dependent and deliberately not part of the contract.
# ---------------------------------------------------------------------------


@register(
    "dedup_bloom_cross",
    """WITH ref AS (SELECT md5(text) AS h FROM documents WHERE doc_id % 2 = 0),
inc AS (SELECT doc_id, md5(text) AS h FROM documents)
SELECT (SELECT count(*) FROM inc)::BIGINT AS n_incoming,
       (SELECT count(*) FROM inc WHERE h IN (SELECT h FROM ref))::BIGINT
         AS n_true_dup,
       true AS no_false_negative""",
)
def dedup_bloom_cross(spark, sf_dir):
    """Incoming = all documents; reference = even doc_ids. Bloom-annotate,
    verify only the maybe-dup sliver, report the exact dup count and the
    no-false-negative contract."""
    from ..operators.dedup import bloom_dedup_against
    from .driver_queries import _read

    d = _read(spark, sf_dir, "documents").select(
        "doc_id", F.md5("text").alias("h")
    )
    ref = d.filter(F.col("doc_id") % 2 == 0).select("h").distinct()
    annotated = bloom_dedup_against(spark, ref, d, "h").persist()
    n_incoming = annotated.count()
    cand = annotated.filter("maybe_dup")
    n_true = (
        cand.join(F.broadcast(ref.withColumnRenamed("h", "h2")),
                  cand.h == F.col("h2"), "left_semi")
        .count()
    )
    # the contract: every exact dup must have been flagged maybe_dup
    exact = d.join(
        F.broadcast(ref.withColumnRenamed("h", "h2")), d.h == F.col("h2"),
        "left_semi",
    ).count()
    annotated.unpersist()
    return spark.createDataFrame(
        [(n_incoming, n_true, bool(n_true == exact))],
        "n_incoming long, n_true_dup long, no_false_negative boolean",
    )


# ---------------------------------------------------------------------------
# ENGINE-PATH SpanNotQuery — search/spans/SpanNotQuery.java: spans of
# 'merge' whose ±1-token exclusion window contains no 'spark'
# (pre=post=1). freq = surviving span count; idf uses the INCLUDE side
# only (scoring_terms contract in operators/spans.py). float32-exact.
# ---------------------------------------------------------------------------


@register(
    "span_not_topk",
    f"""WITH tokarr AS (SELECT doc_id, {duckdb_tokenize_sql('text')} AS t FROM documents),
stats AS (SELECT count(*)::BIGINT AS n_docs, sum(len(t))::BIGINT AS sum_ttf FROM tokarr),
dl AS (SELECT doc_id, len(t) AS dl FROM tokarr),
dfm AS (SELECT count(*)::BIGINT AS df FROM tokarr
        WHERE list_contains(t, 'merge')),
surv AS (SELECT doc_id,
        len(list_filter(range(1, len(t) + 1),
            i -> t[i] = 'merge'
                 AND coalesce(t[i-1], '') <> 'spark'
                 AND coalesce(t[i+1], '') <> 'spark'))::BIGINT AS freq
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
def span_not_topk(spark, sf_dir):
    """Real-engine SpanNot('merge' NOT near 'spark', pre=post=1) top-10,
    float32-exact cross-engine."""
    from ..operators.spans import SpanNot, SpanTerm, span_topk
    from .solr_queries import _engine_searcher

    s = _engine_searcher(spark, sf_dir)
    res = span_topk(
        spark, s.segment,
        SpanNot(SpanTerm("merge"), SpanTerm("spark"), pre=1, post=1),
        k=10,
    )
    return res.select(
        "doc_id", F.round(F.col("score").cast("double"), 4).alias("score")
    )


# ---------------------------------------------------------------------------
# Monitor / percolator — lucene/monitor/Monitor.java +
# TermFilteredPresearcher.java: registered queries match the doc stream in
# ONE mapInPandas pass (trigger-term pruning, no shuffle, no join — see
# operators/monitor.py). The row registers five query shapes (term,
# conjunction, phrase, disjunction, negation) and reports per-query match
# counts; the oracle recomputes each count from raw tokens.
# ---------------------------------------------------------------------------


@register(
    "monitor_percolate",
    f"""WITH tokarr AS (SELECT doc_id, {duckdb_tokenize_sql('text')} AS t FROM documents),
per AS (SELECT doc_id,
        list_contains(t, 'merge') AS m, list_contains(t, 'spark') AS s,
        list_contains(t, 'order') AS o, list_contains(t, 'batch') AS b,
        len(list_filter(range(1, len(t)), i -> t[i] = 'big' AND t[i+1] = 'data')) > 0 AS bd
    FROM tokarr)
SELECT query_id, n_docs FROM (
  SELECT 'q_and' AS query_id, count(*) FILTER (m AND s)::BIGINT AS n_docs FROM per
  UNION ALL SELECT 'q_not', count(*) FILTER (m AND NOT s)::BIGINT FROM per
  UNION ALL SELECT 'q_or', count(*) FILTER (o OR b)::BIGINT FROM per
  UNION ALL SELECT 'q_phrase', count(*) FILTER (bd)::BIGINT FROM per
  UNION ALL SELECT 'q_term', count(*) FILTER (m)::BIGINT FROM per
) ORDER BY query_id""",
)
def monitor_percolate(spark, sf_dir):
    """Percolate the documents stream through five registered queries;
    per-query match counts."""
    from ..operators.monitor import Monitor
    from .driver_queries import _read

    mon = Monitor([
        ("q_term", "merge"),
        ("q_and", "+merge +spark"),
        ("q_phrase", '"big data"'),
        ("q_or", "order batch"),
        ("q_not", "merge -spark"),
    ])
    docs = _read(spark, sf_dir, "documents").select(
        "doc_id", F.col("text").alias("content")
    )
    return (
        mon.match(docs)
        .groupBy("query_id")
        .agg(F.count("*").alias("n_docs"))
        .orderBy("query_id")
    )
