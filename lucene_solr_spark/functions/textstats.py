"""Text-analysis column functions for training-data pipelines.

All JVM-side Spark SQL expressions (whole-stage codegen; no Python UDFs),
each with a DuckDB-expressible mirror for the driver oracle:

- language id: marker-token voting (n-gram-heuristic class; deterministic)
- quality score: length / punctuation / stopword-ratio features
- token counting: whitespace tokens + a BPE-ish subword chunk count
- document fingerprinting: full-doc digest + winnowing-lite k-gram min-hash
"""

from __future__ import annotations

from pyspark.sql import functions as F

# marker sets per language (deterministic heuristic vocabulary)
LANG_MARKERS: dict[str, list[str]] = {
    "en": ["the", "and", "of", "to", "is", "with"],
    "fr": ["le", "la", "et", "les", "des", "une"],
    "de": ["der", "die", "und", "das", "nicht", "ist"],
    "es": ["el", "los", "las", "una", "por", "para"],
}

STOPWORDS_EN = ["the", "a", "and", "of", "to", "in", "is", "it", "that", "for"]


def marker_hits(tokens_col, markers: list[str]):
    """Count of tokens that are in the marker set (JVM-side filter+size)."""
    arr = F.array(*[F.lit(m) for m in markers])
    return F.size(F.filter(tokens_col, lambda t: F.array_contains(arr, t)))


def lang_id_struct(tokens_col):
    """Predicted language = argmax marker hits, ties -> lexicographic lang.
    Returns struct(pred_lang, hits)."""
    scored = F.array(
        *[
            F.struct(
                (-marker_hits(tokens_col, LANG_MARKERS[lang])).alias("neg_hits"),
                F.lit(lang).alias("lang"),
            )
            for lang in sorted(LANG_MARKERS)
        ]
    )
    best = F.array_min(scored)
    return F.struct(
        best["lang"].alias("pred_lang"), (-best["neg_hits"]).alias("hits")
    )


def quality_features(text_col, tokens_col):
    """struct of quality features + a composite score (deterministic formula):
    score = 0.4*min(n_tokens/100,1) + 0.3*(1-punct_ratio) + 0.3*stop_ratio."""
    n_chars = F.length(text_col)
    n_tokens = F.size(tokens_col)
    n_punct = n_chars - F.length(F.regexp_replace(text_col, r"[^\w\s]", ""))
    punct_ratio = F.when(n_chars > 0, n_punct / n_chars).otherwise(0.0)
    stop_hits = marker_hits(tokens_col, STOPWORDS_EN)
    stop_ratio = F.when(n_tokens > 0, stop_hits / n_tokens).otherwise(0.0)
    score = (
        0.4 * F.least(n_tokens / 100.0, F.lit(1.0))
        + 0.3 * (1.0 - punct_ratio)
        + 0.3 * stop_ratio
    )
    return F.struct(
        n_chars.alias("n_chars"),
        n_tokens.alias("n_tokens"),
        F.round(punct_ratio, 6).alias("punct_ratio"),
        F.round(stop_ratio, 6).alias("stop_ratio"),
        F.round(score, 6).alias("quality"),
    )


def ws_token_count(text_col):
    """Whitespace token count."""
    t = F.trim(text_col)
    return F.when(F.length(t) == 0, 0).otherwise(
        F.size(F.split(t, r"\s+"))
    )


BPE_CHUNK_PATTERN = "[A-Za-z0-9]{1,4}"


def bpe_chunk_count(text_col):
    """BPE-ish subword count: greedy <=4-char alnum chunks (regexp_count —
    identical semantics in Java regex and RE2)."""
    return F.regexp_count(text_col, F.lit(BPE_CHUNK_PATTERN))


def doc_digest(text_col):
    """Full-document fingerprint (content-defined identity)."""
    return F.md5(text_col)


def winnow_fingerprint(tokens_col, k: int = 5):
    """Winnowing-lite: min over k-token windows of md5(window). A single
    stable representative shingle hash per doc (Schleimer et al. 2003,
    collapsed to window-min for determinism)."""
    n = F.size(tokens_col) - (k - 1)
    windows = F.when(n <= 0, F.array(F.concat_ws(" ", tokens_col))).otherwise(
        F.transform(
            F.sequence(F.lit(1), F.greatest(n, F.lit(1))),
            lambda i: F.concat_ws(" ", F.slice(tokens_col, i, k)),
        )
    )
    return F.array_min(F.transform(windows, lambda w: F.md5(w)))

# Gopher repetition-gate thresholds (Rae et al. 2021, "Scaling Language
# Models: ... Gopher" §A1.1), pinned for cross-engine determinism.
REP_TOP2, REP_DUP3, REP_UNIQ = 0.18, 0.02, 0.32


def repetition_flags(toks, tokens_col: str = "tokens", id_col: str = "doc_id"):
    """Per-doc Gopher repetition gates over token n-grams.

    Returns (doc_id, f_top2, f_dup3, f_uniq) for every doc with >0 tokens
    (empty docs are excluded — they fail upstream length gates anyway):
      - f_top2: tokens covered by the most frequent bigram > REP_TOP2
      - f_dup3: fraction of 3-gram occurrences whose gram repeats > REP_DUP3
      - f_uniq: unique-token ratio < REP_UNIQ

    Scale shape: n-gram construction is an array transform (no shuffle);
    the per-(doc, gram) counts are map-combined aggregations keyed by doc.
    """
    t = F.col(tokens_col)
    base = toks.filter(F.size(tokens_col) > 0).select(
        F.col(id_col).alias("doc_id"),
        F.size(t).alias("n_tokens"),
        (F.size(F.array_distinct(t)).cast("double") / F.size(t)).alias("uniq_ratio"),
        F.transform(
            F.sequence(F.lit(1), F.size(t) - 1),
            lambda i: F.concat_ws(
                " ", F.element_at(t, i.cast("int")), F.element_at(t, (i + 1).cast("int"))
            ),
        ).alias("bi"),
        F.when(
            F.size(t) >= 3,
            F.transform(
                F.sequence(F.lit(1), F.size(t) - 2),
                lambda i: F.concat_ws(
                    " ",
                    F.element_at(t, i.cast("int")),
                    F.element_at(t, (i + 1).cast("int")),
                    F.element_at(t, (i + 2).cast("int")),
                ),
            ),
        ).otherwise(F.array().cast("array<string>")).alias("tri"),
    )
    bic = base.select("doc_id", F.explode("bi").alias("g")).groupBy("doc_id", "g").count()
    top2 = bic.groupBy("doc_id").agg(F.max("count").alias("mx"))
    tric = base.select("doc_id", F.explode("tri").alias("g")).groupBy("doc_id", "g").count()
    dup3 = tric.groupBy("doc_id").agg(
        (
            F.sum(F.when(F.col("count") > 1, F.col("count")).otherwise(0)).cast("double")
            / F.sum("count")
        ).alias("frac")
    )
    return (
        base.select("doc_id", "n_tokens", "uniq_ratio")
        .join(top2, "doc_id", "left")
        .join(dup3, "doc_id", "left")
        .select(
            "doc_id",
            (2.0 * F.col("mx") / F.col("n_tokens") > REP_TOP2).alias("f_top2"),
            (F.coalesce(F.col("frac"), F.lit(0.0)) > REP_DUP3).alias("f_dup3"),
            (F.col("uniq_ratio") < REP_UNIQ).alias("f_uniq"),
        )
    )
