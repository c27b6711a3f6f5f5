"""Round-5 widening batch #15: the analyze() stream evaluator,
distributed spellcheck suggestion merging, and per-language field
routing.

Each entry re-expresses a reference component (public lucene-solr
path#symbol cited per entry; the reference mount is empty) over the driver
testdata with a DuckDB oracle using identical column aliases.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ..functions.analysis import duckdb_tokenize_sql, tokens_col
from .coverage19_queries import _KR_STEM_SQL
from .driver_queries import _read, register

# ---------------------------------------------------------------------------
# analyze() stream evaluator — solr/solrj/.../io/eval/AnalyzeEvaluator.java
# (streaming expression `select(..., analyze(text, body) as terms)`): run
# a field's full analysis chain over a string INSIDE a stream expression
# and emit the token list. ENGINE-PATH: the pinned tokenizer
# (functions/analysis.tokens_col — the exact chain the index build uses)
# applied at stream time to three requested docs, tokens emitted with
# positions; the oracle mirrors the chain in SQL. At scale this is the
# same Arrow-vectorized projection the build runs — no extra machinery.
# ---------------------------------------------------------------------------

_AE_DOCS = (0, 1, 2)


@register(
    "analyze_evaluator_tokens",
    f"""WITH tokarr AS (SELECT doc_id, {duckdb_tokenize_sql('text')} AS t
             FROM documents WHERE doc_id IN {_AE_DOCS}),
p AS (SELECT doc_id, i - 1 AS pos, t[i] AS term
      FROM tokarr, (SELECT unnest(range(1, 4000)) AS i) ix WHERE i <= len(t))
SELECT doc_id, pos, term FROM p
ORDER BY doc_id ASC, pos ASC LIMIT 60""",
)
def analyze_evaluator_tokens(spark, sf_dir):
    """analyze(text): pinned-chain tokens with positions for docs 0-2."""
    d = _read(spark, sf_dir, "documents").where(
        F.col("doc_id").isin(*_AE_DOCS)
    )
    return (
        d.select(
            "doc_id",
            F.posexplode(tokens_col("text")).alias("pos", "term"),
        )
        .orderBy(F.asc("doc_id"), F.asc("pos"))
        .limit(60)
    )


# ---------------------------------------------------------------------------
# Distributed spellcheck merge — solr/core/.../handler/component/
# SpellCheckComponent.java#finishStage (and SpellCheckMergeData): each
# shard proposes corrections from its OWN terms dictionary with its local
# document frequencies; the coordinator merges by summing frequencies and
# re-ranking. ENGINE SHAPE: shard-local (doc-hash) term dictionaries
# propose distance<=2 candidates, the merge sums shard dfs — provably
# equal to the global DirectSpellChecker ranking because candidacy is
# term-intrinsic (any shard holding the term proposes it) and shard doc
# sets partition the corpus (sum of local dfs = global df).
# ---------------------------------------------------------------------------

_SP_Q = "ordre"
_SP_SHARDS = 4


@register(
    "spellcheck_distributed_merge",
    f"""WITH tokarr AS (SELECT doc_id, {duckdb_tokenize_sql('text')} AS t FROM documents),
toks AS (SELECT DISTINCT doc_id, unnest(t) AS term FROM tokarr),
df AS (SELECT term, count(*)::BIGINT AS df FROM toks GROUP BY term)
SELECT term, levenshtein(term, '{_SP_Q}')::BIGINT AS distance, df
FROM df WHERE levenshtein(term, '{_SP_Q}') <= 2 AND term <> '{_SP_Q}'
ORDER BY distance ASC, df DESC, term ASC LIMIT 5""",
)
def spellcheck_distributed_merge(spark, sf_dir):
    """Sharded DirectSpellChecker: per-shard candidates + df, merged by
    summing shard frequencies — equals the global ranking."""
    from .driver_queries import _tokens

    toks = (
        _tokens(spark, sf_dir)
        .select("doc_id", F.explode("tokens").alias("term"))
        .distinct()
        .withColumn("shard", F.col("doc_id") % _SP_SHARDS)
    )
    # each shard's local dictionary with local df
    shard_df = toks.groupBy("shard", "term").agg(
        F.count("*").alias("df_local")
    )
    cands = shard_df.withColumn(
        "distance", F.levenshtein(F.col("term"), F.lit(_SP_Q)).cast("long")
    ).where((F.col("distance") <= 2) & (F.col("term") != _SP_Q))
    merged = cands.groupBy("term", "distance").agg(
        F.sum("df_local").alias("df")
    )
    return (
        merged.select("term", "distance", "df")
        .orderBy(F.asc("distance"), F.desc("df"), F.asc("term"))
        .limit(5)
    )


# ---------------------------------------------------------------------------
# Per-language field routing — the Solr schema idiom of language-specific
# field types (`text_en` with an English stemmer vs `text_general`
# pass-through; schema dynamic fields `*_txt_en`, and
# langid routing update processors
# solr/core/.../update/processor/LangDetectLanguageIdentifierUpdateProcessor*
# mapping docs into those fields): tokens of 'en' docs run the English
# minimal stemmer, every other language passes through unanalyzed beyond
# the base chain. Output: top-15 (lang, term) counts — the same corpus
# yields different index terms per language route.
# ---------------------------------------------------------------------------


@register(
    "lang_field_routing",
    f"""WITH tokarr AS (SELECT doc_id, lang, {duckdb_tokenize_sql('text')} AS t FROM documents),
toks AS (SELECT lang, unnest(t) AS tok FROM tokarr),
routed AS (SELECT lang,
                  CASE WHEN lang = 'en' THEN {_KR_STEM_SQL.format(t='tok')}
                       ELSE tok END AS term
           FROM toks)
SELECT lang, term, count(*)::BIGINT AS n
FROM routed GROUP BY lang, term ORDER BY n DESC, lang ASC, term ASC LIMIT 15""",
)
def lang_field_routing(spark, sf_dir):
    """text_en stems, other languages pass through: top-15 (lang, term)."""
    from .driver_queries import _tokens

    toks = _tokens(spark, sf_dir).select(
        "lang", F.explode("tokens").alias("tok")
    )
    routed = toks.select(
        "lang",
        F.when(
            F.col("lang") == "en", F.expr(_KR_STEM_SQL.format(t="tok"))
        )
        .otherwise(F.col("tok"))
        .alias("term"),
    )
    return (
        routed.groupBy("lang", "term")
        .agg(F.count("*").alias("n"))
        .orderBy(F.desc("n"), F.asc("lang"), F.asc("term"))
        .limit(15)
    )
