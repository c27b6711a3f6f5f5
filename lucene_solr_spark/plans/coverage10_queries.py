"""Round-5 widening batch: character offsets in the index + offset-based
highlighting, intervals algebra breadth, DoubleMetaphone phonetics, and
locale collation sort.

Each entry re-expresses a reference operator (public lucene-solr path cited
per entry; the reference mount is empty so citations are path#symbol only)
over the driver testdata with a DuckDB oracle using identical column aliases.

The offsets oracles exploit the documents corpus's verified shape (text is
single-space-separated tokens, each pure-lowercase-alpha or pure-digit —
asserted by test_offsets.py — so the pinned tokenizer's char offsets equal
cumulative split-token lengths, computable in pure SQL). The ENGINE path
never assumes that shape: it decodes the real soff_bin/eoff_bin packed
offsets written by the offset-aware scanner.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import functions as F

from .driver_queries import _read, register

_OFF_SEG_CACHE: dict = {}


def _offsets_searcher(spark, sf_dir):
    """One offsets-enabled engine index per sf_dir (shared by the offsets
    rows; separate from solr_queries._engine_searcher because offsets
    builds run the offset-aware scanner)."""
    if sf_dir not in _OFF_SEG_CACHE:
        from ..corpus import documents_as_corpus
        from ..operators.indexer import build_index
        from ..operators.search import Searcher

        seg = build_index(
            spark, documents_as_corpus(spark, sf_dir), out_dir=None,
            with_positions=True, with_offsets=True,
        )
        _OFF_SEG_CACHE[sf_dir] = Searcher(spark, seg)
    return _OFF_SEG_CACHE[sf_dir]


# DuckDB CTE: (doc_id, term, pos, ln, start_off) for the documents table —
# offsets by cumulative token length + one separator char per gap.
_OFFSETS_CTE = """tokarr AS (
  SELECT doc_id, string_split(text, ' ') AS t, text FROM documents
), tok AS (
  SELECT doc_id, text, t[i] AS term, (i - 1)::BIGINT AS pos,
         length(t[i])::BIGINT AS ln,
         (sum(length(t[i])) OVER (PARTITION BY doc_id ORDER BY i)
          - length(t[i]) + (i - 1))::BIGINT AS start_off
  FROM tokarr, unnest(range(1, len(t) + 1)) AS u(i)
)"""


# ---------------------------------------------------------------------------
# ENGINE-PATH term vectors with offsets —
# index/IndexOptions.java#DOCS_AND_FREQS_AND_POSITIONS_AND_OFFSETS +
# codecs/compressing/CompressingTermVectorsWriter.java (offset streams) +
# solr handler/component/TermVectorComponent.java (tv.offsets=true):
# per requested doc, every term occurrence's position AND (start_char,
# end_char), decoded from the REAL packed offset streams (soff_bin
# delta+FOR, eoff_bin token lengths). The oracle recomputes offsets from
# raw text; equality is byte-exact span parity through the whole build.
# ---------------------------------------------------------------------------


@register(
    "term_vectors_offsets",
    f"""WITH {_OFFSETS_CTE}
SELECT doc_id, term, pos, start_off, (start_off + ln) AS end_off
FROM tok WHERE doc_id IN (0, 1, 2)
ORDER BY doc_id ASC, term ASC, pos ASC""",
)
def term_vectors_offsets(spark, sf_dir):
    """tv.offsets=true for docs {0,1,2}: (doc_id, term, pos, start_off,
    end_off) decoded from the engine's packed offset streams."""
    from ..functions.packing import delta_decode, unpack_ints

    s = _offsets_searcher(spark, sf_dir)
    bd = s.segment.stats.bucket_docs
    wanted = (0, 1, 2)
    rows = s.segment.table(spark, "positions").filter(
        F.col("bucket").isin(*sorted({d // bd for d in wanted}))
        & F.col("doc_id").isin(*wanted)
    )

    def decode(batches):
        for pdf in batches:
            out = {"doc_id": [], "term": [], "pos": [],
                   "start_off": [], "end_off": []}
            for row in pdf.itertuples():
                pos = delta_decode(unpack_ints(row.pos_bin))
                so = delta_decode(unpack_ints(row.soff_bin))
                ln = unpack_ints(row.eoff_bin)
                for p, st, l in zip(pos.tolist(), so.tolist(), ln.tolist()):
                    out["doc_id"].append(int(row.doc_id))
                    out["term"].append(row.term)
                    out["pos"].append(int(p))
                    out["start_off"].append(int(st))
                    out["end_off"].append(int(st) + int(l))
            yield pd.DataFrame(out)

    return (
        rows.select("doc_id", "term", "pos_bin", "soff_bin", "eoff_bin")
        .mapInPandas(
            decode,
            "doc_id long, term string, pos long, start_off long, end_off long",
        )
        .orderBy("doc_id", "term", "pos")
    )


# ---------------------------------------------------------------------------
# ENGINE-PATH offset-based highlighting —
# lucene/highlighter/.../uhighlight/UnifiedHighlighter.java
# (OffsetSource.POSTINGS): snippets sliced from the STORED original text
# at index-decoded char offsets, never re-tokenized. First hit of
# q='merge' per doc over docs < 30, 20 context chars each side.
# ---------------------------------------------------------------------------


@register(
    "highlight_offsets_engine",
    f"""WITH {_OFFSETS_CTE},
hits AS (
  SELECT doc_id, count(*)::BIGINT AS n_hits,
         min(start_off) AS s, min_by(ln, start_off) AS l,
         any_value(text) AS text
  FROM tok WHERE term = 'merge' AND doc_id < 30 GROUP BY doc_id
)
SELECT doc_id, n_hits, s AS start_off, (s + l) AS end_off,
       concat(substr(text, greatest(s - 19, 1), least(s, 20)),
              '<em>', substr(text, s + 1, l), '</em>',
              substr(text, s + l + 1, 20)) AS snippet
FROM hits ORDER BY doc_id""",
)
def highlight_offsets_engine(spark, sf_dir):
    """highlight(q=merge, hl.method=unified, offsets source) over the
    first 30 docs: string-equal snippets from index offsets alone."""
    from ..operators.highlight import highlight_offsets

    s = _offsets_searcher(spark, sf_dir)
    return highlight_offsets(
        spark, s.segment, "merge", doc_ids=list(range(30)), context=20
    )


# ---------------------------------------------------------------------------
# Intervals algebra breadth — queries/intervals/Intervals.java
# (unordered / or / containing / notContaining combinators with
# minimal-interval semantics; operators/intervals.py pins the algebra and
# tests/test_intervals.py proves kernel == brute-force spec on random
# cases). Counts are per-doc numbers of MINIMAL intervals — note the
# pinned divergence from span freq: spans emit one greedy match per
# leading span and never minimize, so interval counts <= span counts.
#
# Scale: interval_unordered_count is ENGINE-PATH — it decodes the two
# terms' positional postings (parquet term pushdown into the bucketed
# positions table, applyInPandas per fixed-size doc-space bucket; work
# is O(postings of the two query terms), never O(corpus)). The other
# rows run the identical kernel over the tokens column (the per-doc
# positions dict has the same shape either way).
# ---------------------------------------------------------------------------

_IVU_A, _IVU_B, _IVU_C = "key", "order", "hash"


def _interval_count_udf(node):
    """Arrow-batched per-doc minimal-interval count for a term-leaf node."""
    from ..operators.intervals import (
        doc_intervals,
        interval_terms,
        positions_from_tokens,
    )

    terms = interval_terms(node)

    @F.pandas_udf("long")
    def n_ivs(tokens: pd.Series) -> pd.Series:
        return tokens.map(
            lambda t: len(doc_intervals(node, positions_from_tokens(t, terms)))
        )

    return n_ivs


# Minimal unordered(a, b) intervals == consecutive differing-term pairs in
# the merged position order (any a..b window strictly contains such a pair,
# and two consecutive pairs can never nest — positions strictly increase).
# That characterization IS the SQL oracle; proved against the brute-force
# spec in tests/test_intervals.py::test_unordered_consecutive_pairs.
# ONE parameterized rendering serves every interval oracle here and in
# coverage11 (a tokenization/characterization fix lands in one place).

_IV_BASE = """tokarr AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
pos AS (SELECT doc_id, unnest(toks) AS term, generate_subscripts(toks, 1) AS pos FROM tokarr)"""


def _pairs_cte(name: str, ta: str, tb: str) -> str:
    """Minimal unordered(ta, tb) intervals as (doc_id, s, e) rows."""
    return f"""{name} AS (SELECT doc_id, pos AS s, npos AS e FROM (
  SELECT doc_id, term, pos,
         lead(term) OVER (PARTITION BY doc_id ORDER BY pos) AS nterm,
         lead(pos)  OVER (PARTITION BY doc_id ORDER BY pos) AS npos
  FROM pos WHERE term IN ('{ta}', '{tb}')) q
  WHERE nterm IS NOT NULL AND nterm <> term)"""


_IVU_PAIRS = f"{_IV_BASE},\n{_pairs_cte('mins', _IVU_A, _IVU_B)}"


@register(
    "interval_unordered_count",
    f"""WITH {_IVU_PAIRS}
SELECT doc_id, count(*)::BIGINT AS n_intervals
FROM mins GROUP BY doc_id
ORDER BY n_intervals DESC, doc_id ASC LIMIT 10""",
)
def interval_unordered_count(spark, sf_dir):
    """Intervals.unordered(key, order): per-doc minimal-interval count,
    top-10 — ENGINE-PATH over decoded positional postings."""
    from ..functions.packing import delta_decode, unpack_ints
    from ..operators.intervals import ITerm, IUnordered, doc_intervals
    from .solr_queries import _engine_searcher

    node = IUnordered(ITerm(_IVU_A), ITerm(_IVU_B))
    s = _engine_searcher(spark, sf_dir)
    rows = (
        s.segment.table(spark, "positions")
        .filter(F.col("term").isin(_IVU_A, _IVU_B))
        .select("bucket", "doc_id", "term", "pos_bin")
    )

    def per_bucket(key, pdf):
        out_doc, out_n = [], []
        for doc_id, grp in pdf.groupby("doc_id"):
            positions = {
                r.term: delta_decode(unpack_ints(r.pos_bin))
                for r in grp.itertuples()
            }
            n = len(doc_intervals(node, positions))
            if n > 0:
                out_doc.append(int(doc_id))
                out_n.append(n)
        return pd.DataFrame({"doc_id": out_doc, "n_intervals": out_n})

    return (
        rows.groupBy("bucket")
        .applyInPandas(per_bucket, "doc_id long, n_intervals long")
        .orderBy(F.desc("n_intervals"), F.asc("doc_id"))
        .limit(10)
    )


@register(
    "interval_containing_count",
    f"""WITH {_IVU_PAIRS}
SELECT m.doc_id, count(*)::BIGINT AS n_intervals
FROM mins m
WHERE EXISTS (SELECT 1 FROM pos p WHERE p.doc_id = m.doc_id
              AND p.term = '{_IVU_C}' AND p.pos BETWEEN m.s AND m.e)
GROUP BY m.doc_id
ORDER BY n_intervals DESC, doc_id ASC LIMIT 10""",
)
def interval_containing_count(spark, sf_dir):
    """Intervals.containing(unordered(key, order), hash): big intervals
    that contain a 'hash' occurrence (FilteringIntervalsSource)."""
    from ..operators.intervals import IContaining, ITerm, IUnordered
    from .driver_queries import _tokens

    node = IContaining(
        IUnordered(ITerm(_IVU_A), ITerm(_IVU_B)), ITerm(_IVU_C)
    )
    toks = _tokens(spark, sf_dir)
    return (
        toks.select("doc_id", _interval_count_udf(node)("tokens").alias("n_intervals"))
        .filter(F.col("n_intervals") > 0)
        .orderBy(F.desc("n_intervals"), F.asc("doc_id"))
        .limit(10)
    )


@register(
    "interval_not_containing_count",
    f"""WITH {_IVU_PAIRS}
SELECT m.doc_id, count(*)::BIGINT AS n_intervals
FROM mins m
WHERE NOT EXISTS (SELECT 1 FROM pos p WHERE p.doc_id = m.doc_id
                  AND p.term = '{_IVU_C}' AND p.pos BETWEEN m.s AND m.e)
GROUP BY m.doc_id
ORDER BY n_intervals DESC, doc_id ASC LIMIT 10""",
)
def interval_not_containing_count(spark, sf_dir):
    """Intervals.notContaining(unordered(key, order), hash)."""
    from ..operators.intervals import INotContaining, ITerm, IUnordered
    from .driver_queries import _tokens

    node = INotContaining(
        IUnordered(ITerm(_IVU_A), ITerm(_IVU_B)), ITerm(_IVU_C)
    )
    toks = _tokens(spark, sf_dir)
    return (
        toks.select("doc_id", _interval_count_udf(node)("tokens").alias("n_intervals"))
        .filter(F.col("n_intervals") > 0)
        .orderBy(F.desc("n_intervals"), F.asc("doc_id"))
        .limit(10)
    )


# ordered(or(key, group), order): minimal interval per leading key|group
# position p is [p, min order-pos > p], kept iff no key|group position lies
# strictly inside (a later leading position would nest a smaller interval).
@register(
    "interval_ordered_or_count",
    f"""WITH {_IV_BASE},
lead AS (SELECT a.doc_id, a.pos AS s, min(b.pos) AS e
         FROM pos a JOIN pos b ON b.doc_id = a.doc_id AND b.pos > a.pos
                               AND b.term = '{_IVU_B}'
         WHERE a.term IN ('{_IVU_A}', 'group') GROUP BY a.doc_id, a.pos),
mins AS (SELECT l.doc_id, l.s, l.e FROM lead l
         WHERE NOT EXISTS (SELECT 1 FROM pos p
                           WHERE p.doc_id = l.doc_id
                             AND p.term IN ('{_IVU_A}', 'group')
                             AND p.pos > l.s AND p.pos < l.e))
SELECT doc_id, count(*)::BIGINT AS n_intervals
FROM mins GROUP BY doc_id
ORDER BY n_intervals DESC, doc_id ASC LIMIT 10""",
)
def interval_ordered_or_count(spark, sf_dir):
    """Intervals.ordered(or(key, group), order): disjunction nested in an
    ordered source, minimal semantics."""
    from ..operators.intervals import IOr, IOrdered, ITerm
    from .driver_queries import _tokens

    node = IOrdered(IOr(ITerm(_IVU_A), ITerm("group")), ITerm(_IVU_B))
    toks = _tokens(spark, sf_dir)
    return (
        toks.select("doc_id", _interval_count_udf(node)("tokens").alias("n_intervals"))
        .filter(F.col("n_intervals") > 0)
        .orderBy(F.desc("n_intervals"), F.asc("doc_id"))
        .limit(10)
    )


# ---------------------------------------------------------------------------
# DoubleMetaphone phonetics —
# lucene/analysis/phonetic/.../DoubleMetaphoneFilter.java (commons-codec
# DoubleMetaphone, Philips 2000). The pinned primary-code chain lives in
# functions/phonetic.py: ONE rule table rendered into pyspark Columns AND
# DuckDB SQL (RE2/Java common subset), parity by construction; published
# vectors pinned in tests/test_phonetic_dm.py. Same row shape as the
# Soundex row: phonetic buckets over the distinct vocabulary — the
# index-time PhoneticFilter view of the terms dict. Scale: input is the
# DISTINCT term dictionary (tiny vs corpus); the chain itself is
# whole-stage-codegen regexp/translate, no Python in the path.
# ---------------------------------------------------------------------------


def _dm_register():
    from ..functions.phonetic import double_metaphone_sql

    return f"""WITH toks AS (SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents),
terms AS (SELECT DISTINCT term FROM toks WHERE regexp_full_match(term, '[a-z]+'))
SELECT {double_metaphone_sql('term')} AS code, count(*)::BIGINT AS n_terms
FROM terms GROUP BY code ORDER BY n_terms DESC, code ASC LIMIT 10"""


@register("phonetic_double_metaphone", _dm_register())
def phonetic_double_metaphone(spark, sf_dir):
    """Terms per Double Metaphone primary code over the distinct
    vocabulary (count desc, code asc)."""
    from ..functions.phonetic import double_metaphone_col
    from .driver_queries import _tokens

    toks = _tokens(spark, sf_dir)
    terms = (
        toks.select(F.explode("tokens").alias("term"))
        .filter(F.col("term").rlike("^[a-z]+$"))
        .distinct()
    )
    return (
        terms.select(double_metaphone_col("term").alias("code"))
        .groupBy("code")
        .agg(F.count("*").alias("n_terms"))
        .orderBy(F.desc("n_terms"), F.asc("code"))
        .limit(10)
    )


# ---------------------------------------------------------------------------
# Locale collation sort — solr schema/ICUCollationField.java +
# lucene/analysis/icu (ICUCollationKeyAnalyzer): locale-aware sort keys
# generated at index time so ORDER BY is a binary-key compare. Spark-first
# mapping: Spark 4's collated string type (COLLATE de) generates the ICU
# collation keys JVM-side — the exact ICUCollationKeyAnalyzer analog —
# and the DuckDB oracle sorts with ITS ICU 'de' collation; rank-identical
# output proves the two independent ICU stacks agree on the synthesized
# non-ASCII corpus (umlaut-injected nation names + a pinned German word
# list with ä/ö/ü/ß primary/secondary/tertiary differences).
# Scale: collation keys are per-row narrow byte strings; the sort is the
# ordinary distributed range-partitioned sort.
# ---------------------------------------------------------------------------

_COLL_WORDS = [
    "masse", "maße", "strasse", "straße", "zucker",
    "äpfel", "apfel", "öl", "ol", "übel", "ubel",
]


@register(
    "collation_sort_locale",
    f"""WITH syn AS (
  SELECT translate(lower(n_name), 'aeou', 'äéöü') AS s FROM nation
  UNION ALL
  SELECT * FROM (VALUES {", ".join("('" + w + "')" for w in _COLL_WORDS)}) v(s)
)
SELECT row_number() OVER (ORDER BY s COLLATE "de") AS rk, s
FROM syn ORDER BY rk""",
)
def collation_sort_locale(spark, sf_dir):
    """ORDER BY s COLLATE de over synthesized non-ASCII strings; output
    (rank, raw string) — rank encodes the locale order for the compare."""
    from pyspark.sql import Window

    n = _read(spark, sf_dir, "nation")
    syn = n.select(
        F.translate(F.lower(F.col("n_name")), "aeou", "äéöü").alias("s")
    ).unionAll(spark.createDataFrame([(w,) for w in _COLL_WORDS], "s string"))
    w = Window.orderBy(F.expr("s COLLATE de"))
    return syn.select(F.row_number().over(w).alias("rk"), "s").orderBy("rk")


# ---------------------------------------------------------------------------
# ExecutorStream — stored-query scheduling
# (solrj/io/stream/ExecutorStream.java): a bounded control-plane list of
# stored queries, each compiled to the engine's lazy per-bucket scoring
# plan and executed as ONE unioned Spark DAG (the threads=N worker pool
# generalized to executor-wide parallelism; no result rows pass through
# the driver). Each stored query here is a flat disjunction whose terms
# appear in lexicographic order, so the Boolean scorer's clause-order
# left-fold equals the oracle's ORDER BY term fold — float32-exact
# cross-engine, per stored query.
# ---------------------------------------------------------------------------

_EXEC_STORED = [
    ("q1", "batch order"),
    ("q2", "merge"),
    ("q3", "scan stream table"),
]


def _exec_oracle_sql() -> str:
    from .coverage3_queries import _f32_bm25_ctes

    all_terms = sorted({t for _, qs in _EXEC_STORED for t in qs.split()})
    per_q = []
    for qid, qs in _EXEC_STORED:
        tl = ", ".join(f"'{t}'" for t in sorted(qs.split()))
        per_q.append(
            f"""{qid} AS (SELECT '{qid}' AS query_id, doc_id,
        list_reduce(list(s_t ORDER BY term), (a, b) -> (a + b)::FLOAT)
          AS score_f
     FROM contrib WHERE term IN ({tl}) GROUP BY doc_id
     ORDER BY score_f DESC, doc_id ASC LIMIT 5)"""
        )
    union = " UNION ALL ".join(f"SELECT * FROM {qid}" for qid, _ in _EXEC_STORED)
    return f"""WITH {_f32_bm25_ctes(all_terms)},
{", ".join(per_q)}
SELECT query_id, doc_id, round(score_f::DOUBLE, 4) AS score
FROM ({union}) ORDER BY query_id, score_f DESC, doc_id ASC"""


@register("executor_stream_topk", _exec_oracle_sql())
def executor_stream_topk(spark, sf_dir):
    """ExecutorStream: 3 stored queries -> one unioned engine DAG,
    per-query top-5, float32-exact per stored query."""
    from ..streaming.executor_stream import executor_stream
    from .solr_queries import _engine_searcher

    s = _engine_searcher(spark, sf_dir)
    res = executor_stream(s, _EXEC_STORED, k=5)
    return res.orderBy(
        "query_id", F.desc("score"), F.asc("doc_id")
    ).select(
        "query_id",
        "doc_id",
        F.round(F.col("score").cast("double"), 4).alias("score"),
    )
