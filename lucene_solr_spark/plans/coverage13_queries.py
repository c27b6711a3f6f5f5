"""Round-5 widening batch #4: the remaining analysis-chain token filters and
tokenizers — PatternReplaceFilter, KeepWordFilter + CapitalizationFilter,
ElisionFilter + EnglishPossessiveFilter, DecimalDigitFilter,
LimitTokenCountFilter, UAX29URLEmailTokenizer, PatternTokenizer, and
HyphenatedWordsFilter.

Each entry re-expresses a reference component (public lucene-solr
path#symbol cited per entry; the reference mount is empty) over the driver
testdata with a DuckDB oracle using identical column aliases. The corpus
`text` column is lowercase word-soup with no punctuation or digits, so
filters that only fire on punctuation / digits / case synthesize their
inputs deterministically from the tables — built identically in BOTH
engines, the same convention as `word_delimiter_tokens` and
`collation_sort_locale`.

Scale note: every row here is pure whole-stage-codegen string work over a
single scan (no UDF, no join, one map-combined aggregate exchange) — the
shape survives a 100x corpus unchanged.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from .driver_queries import _read, register

# ---------------------------------------------------------------------------
# PatternReplaceFilter — lucene/analysis/common/src/java/org/apache/lucene/
# analysis/pattern/PatternReplaceFilter.java (solr PatternReplaceFilterFactory
# with replace="all"): apply a compiled regex replacement to every token.
# Pattern '[aeiou]+$' strips the trailing vowel run (a crude stemmer, the
# factory's canonical example class). Anchored pattern = at most one match,
# so Spark's replace-all and DuckDB's replace-first agree by construction.
# ---------------------------------------------------------------------------

_PR_PATTERN = "[aeiou]+$"


@register(
    "pattern_replace_tokens",
    f"""WITH toks AS (SELECT unnest(string_split(text, ' ')) AS term FROM documents),
rep AS (SELECT regexp_replace(term, '{_PR_PATTERN}', '') AS tkey FROM toks)
SELECT tkey, count(*)::BIGINT AS n_tokens
FROM rep GROUP BY tkey ORDER BY n_tokens DESC, tkey ASC LIMIT 15""",
)
def pattern_replace_tokens(spark, sf_dir):
    """Token classes after PatternReplaceFilter('[aeiou]+$' -> '')."""
    d = _read(spark, sf_dir, "documents")
    toks = d.select(F.explode(F.split("text", " ")).alias("term"))
    return (
        toks.select(F.regexp_replace("term", _PR_PATTERN, "").alias("tkey"))
        .groupBy("tkey")
        .agg(F.count("*").alias("n_tokens"))
        .orderBy(F.desc("n_tokens"), F.asc("tkey"))
        .limit(15)
    )


# ---------------------------------------------------------------------------
# KeepWordFilter + CapitalizationFilter — lucene/analysis/common/.../
# miscellaneous/KeepWordFilter.java (the inverse of StopFilter: only tokens
# in the keep set survive) then miscellaneous/CapitalizationFilter.java
# (default mode: uppercase the first character). The keep set is schema
# config (KeepWordFilterFactory words=...), so a literal list is the
# faithful shape — it folds into an isin() pushed to the scan.
# ---------------------------------------------------------------------------

_KEEP_WORDS = ["join", "spark", "filter", "merge", "sort", "window"]


@register(
    "keep_word_capitalize",
    """WITH toks AS (SELECT unnest(string_split(text, ' ')) AS term FROM documents)
SELECT upper(substr(term, 1, 1)) || substr(term, 2) AS token,
       count(*)::BIGINT AS n_tokens
FROM toks WHERE term IN ('join','spark','filter','merge','sort','window')
GROUP BY token ORDER BY n_tokens DESC, token ASC""",
)
def keep_word_capitalize(spark, sf_dir):
    """KeepWordFilter(keep set) then CapitalizationFilter over the corpus."""
    d = _read(spark, sf_dir, "documents")
    toks = d.select(F.explode(F.split("text", " ")).alias("term"))
    cap = F.concat(F.upper(F.substring("term", 1, 1)), F.expr("substr(term, 2)"))
    return (
        toks.filter(F.col("term").isin(_KEEP_WORDS))
        .select(cap.alias("token"))
        .groupBy("token")
        .agg(F.count("*").alias("n_tokens"))
        .orderBy(F.desc("n_tokens"), F.asc("token"))
    )


# ---------------------------------------------------------------------------
# ElisionFilter + EnglishPossessiveFilter — lucene/analysis/common/.../util/
# ElisionFilter.java (strip the French article elision before the
# apostrophe: l'avion -> avion; article set from FrenchAnalyzer
# DEFAULT_ARTICLES) and en/EnglishPossessiveFilter.java (strip trailing
# 's). The corpus has no apostrophes, so each distinct term synthesizes
# three apostrophe variants (l'term, qu'term, term's) plus itself — all
# four must normalize back to the bare term, so every output count is an
# exact multiple of the term's presence. Possessive strips first (as in a
# chain where the possessive filter precedes elision for mixed corpora);
# order is immaterial here because the variants never stack.
# ---------------------------------------------------------------------------

_ELISION_RE = "^(l|m|t|qu|n|s|j|d|c)'"
_POSSESSIVE_RE = "'s$"
# SQL string literals double the apostrophe that the regexes carry
_ELISION_SQL = _ELISION_RE.replace("'", "''")
_POSSESSIVE_SQL = _POSSESSIVE_RE.replace("'", "''")


@register(
    "elision_possessive_tokens",
    f"""WITH terms AS (SELECT DISTINCT unnest(string_split(text, ' ')) AS term FROM documents),
variants AS (
  SELECT term AS v FROM terms
  UNION ALL SELECT 'l''' || term FROM terms
  UNION ALL SELECT 'qu''' || term FROM terms
  UNION ALL SELECT term || '''s' FROM terms),
chain AS (SELECT regexp_replace(regexp_replace(v, '{_POSSESSIVE_SQL}', ''),
                                '{_ELISION_SQL}', '') AS token
          FROM variants)
SELECT token, count(*)::BIGINT AS n_tokens
FROM chain GROUP BY token ORDER BY token ASC""",
)
def elision_possessive_tokens(spark, sf_dir):
    """ElisionFilter + EnglishPossessiveFilter normalize synthesized
    apostrophe variants back to the bare corpus terms."""
    d = _read(spark, sf_dir, "documents")
    terms = d.select(F.explode(F.split("text", " ")).alias("term")).distinct()
    variants = (
        terms.select(F.col("term").alias("v"))
        .unionAll(terms.select(F.concat(F.lit("l'"), "term").alias("v")))
        .unionAll(terms.select(F.concat(F.lit("qu'"), "term").alias("v")))
        .unionAll(terms.select(F.concat("term", F.lit("'s")).alias("v")))
    )
    token = F.regexp_replace(
        F.regexp_replace("v", _POSSESSIVE_RE, ""), _ELISION_RE, ""
    )
    return (
        variants.select(token.alias("token"))
        .groupBy("token")
        .agg(F.count("*").alias("n_tokens"))
        .orderBy(F.asc("token"))
    )


# ---------------------------------------------------------------------------
# DecimalDigitFilter — lucene/analysis/common/.../core/DecimalDigitFilter.java
# (solr DecimalDigitFilterFactory): fold any Unicode decimal digit to its
# ASCII 0-9 equivalent. Synthesized input: order keys rendered into
# Arabic-Indic digits (U+0660..U+0669) — ONE digit-pair table renders the
# synthesis and the fold into both engines (Spark translate(), DuckDB a
# replace chain), parity by construction. n_roundtrip pins fold(synth(k))
# == k for every key, the filter's whole contract.
# ---------------------------------------------------------------------------

_ASCII_DIGITS = "0123456789"
_ARABIC_DIGITS = "٠١٢٣٤٥٦٧٨٩"


def _replace_chain_sql(expr: str, src: str, dst: str) -> str:
    for s, t in zip(src, dst):
        expr = f"replace({expr}, '{s}', '{t}')"
    return expr


def _ddf_sql() -> str:
    synth = _replace_chain_sql(
        "cast(o_orderkey % 100000 AS VARCHAR)", _ASCII_DIGITS, _ARABIC_DIGITS
    )
    fold = _replace_chain_sql("arab", _ARABIC_DIGITS, _ASCII_DIGITS)
    return f"""WITH keys AS (SELECT cast(o_orderkey % 100000 AS VARCHAR) AS ds,
                  {synth} AS arab FROM orders),
folded AS (SELECT ds, arab, {fold} AS back FROM keys)
SELECT length(back)::BIGINT AS n_digits, count(*)::BIGINT AS n_keys,
       sum(CASE WHEN back = ds THEN 1 ELSE 0 END)::BIGINT AS n_roundtrip
FROM folded GROUP BY n_digits ORDER BY n_digits ASC"""


@register("decimal_digit_fold", _ddf_sql())
def decimal_digit_fold(spark, sf_dir):
    """DecimalDigitFilter folds Arabic-Indic digits back to ASCII; grouped
    by digit count with an exact round-trip tally."""
    o = _read(spark, sf_dir, "orders")
    ds = (F.col("o_orderkey") % 100000).cast("string")
    arab = F.translate(ds, _ASCII_DIGITS, _ARABIC_DIGITS)
    back = F.translate(arab, _ARABIC_DIGITS, _ASCII_DIGITS)
    return (
        o.select(ds.alias("ds"), back.alias("back"))
        .select(
            F.length("back").cast("long").alias("n_digits"),
            F.when(F.col("back") == F.col("ds"), 1).otherwise(0).alias("rt"),
        )
        .groupBy("n_digits")
        .agg(
            F.count("*").alias("n_keys"),
            F.sum("rt").alias("n_roundtrip"),
        )
        .orderBy(F.asc("n_digits"))
    )


# ---------------------------------------------------------------------------
# LimitTokenCountFilter — lucene/analysis/common/.../miscellaneous/
# LimitTokenCountFilter.java (solr LimitTokenCountFilterFactory
# maxTokenCount=10, consumeAllTokens=false): the analysis chain stops after
# the first N tokens of each document — the "index only the head of huge
# docs" control. Spark slice() on the split array is the stop; the tail is
# never exploded, so the shuffle carries 10 rows per doc regardless of
# document length (the at-scale point of the filter).
# ---------------------------------------------------------------------------

_LIMIT_N = 10


@register(
    "limit_token_count",
    f"""WITH firstn AS (SELECT unnest((string_split(text, ' '))[1:{_LIMIT_N}]) AS term
             FROM documents)
SELECT term, count(*)::BIGINT AS n_tokens
FROM firstn GROUP BY term ORDER BY n_tokens DESC, term ASC LIMIT 15""",
)
def limit_token_count(spark, sf_dir):
    """Top terms indexed under LimitTokenCountFilter(maxTokenCount=10)."""
    d = _read(spark, sf_dir, "documents")
    toks = d.select(
        F.explode(F.slice(F.split("text", " "), 1, _LIMIT_N)).alias("term")
    )
    return (
        toks.groupBy("term")
        .agg(F.count("*").alias("n_tokens"))
        .orderBy(F.desc("n_tokens"), F.asc("term"))
        .limit(15)
    )


# ---------------------------------------------------------------------------
# UAX29URLEmailTokenizer — lucene/analysis/common/.../standard/
# UAX29URLEmailTokenizer.java: StandardTokenizer's UAX#29 word rules plus
# two extra token types, <URL> and <EMAIL>, kept as SINGLE tokens instead
# of being split on '@' '/' '.'. Synthesized input (one email + one URL per
# customer, built identically in both engines); the row pins the type
# classification — token counts and distincts PER TYPE, which a plain
# StandardTokenizer could never produce (it would shred both).
# ---------------------------------------------------------------------------

_EMAIL_RE = "[a-z0-9]+@[a-z][a-z.]*[a-z]"
_URL_RE = "http://[a-z0-9./]+"


@register(
    "uax_url_email_tokens",
    f"""WITH synth AS (SELECT lower(replace(c_name, 'Customer#', 'cust')) || '@'
         || lower(c_mktsegment) || '.example.com ping http://'
         || lower(c_mktsegment) || '.example.org/p'
         || cast(c_custkey % 97 AS VARCHAR) || ' ok' AS line FROM customer),
emails AS (SELECT unnest(regexp_extract_all(line, '{_EMAIL_RE}')) AS token FROM synth),
urls AS (SELECT unnest(regexp_extract_all(line, '{_URL_RE}')) AS token FROM synth),
typed AS (SELECT 'EMAIL' AS ttype, token FROM emails
          UNION ALL SELECT 'URL' AS ttype, token FROM urls)
SELECT ttype, count(*)::BIGINT AS n_tokens, count(DISTINCT token)::BIGINT AS n_distinct
FROM typed GROUP BY ttype ORDER BY ttype ASC""",
)
def uax_url_email_tokens(spark, sf_dir):
    """<EMAIL> and <URL> token types from UAX29URLEmailTokenizer over
    synthesized contact lines."""
    c = _read(spark, sf_dir, "customer")
    line = F.concat(
        F.lower(F.regexp_replace("c_name", "Customer#", "cust")),
        F.lit("@"),
        F.lower("c_mktsegment"),
        F.lit(".example.com ping http://"),
        F.lower("c_mktsegment"),
        F.lit(".example.org/p"),
        (F.col("c_custkey") % 97).cast("string"),
        F.lit(" ok"),
    )
    synth = c.select(line.alias("line"))
    emails = synth.select(
        F.lit("EMAIL").alias("ttype"),
        F.explode(F.regexp_extract_all("line", F.lit(_EMAIL_RE), 0)).alias("token"),
    )
    urls = synth.select(
        F.lit("URL").alias("ttype"),
        F.explode(F.regexp_extract_all("line", F.lit(_URL_RE), 0)).alias("token"),
    )
    return (
        emails.unionAll(urls)
        .groupBy("ttype")
        .agg(
            F.count("*").alias("n_tokens"),
            F.countDistinct("token").alias("n_distinct"),
        )
        .orderBy(F.asc("ttype"))
    )


# ---------------------------------------------------------------------------
# PatternTokenizer — lucene/analysis/common/.../pattern/PatternTokenizer.java
# (solr PatternTokenizerFactory, group=-1 split mode): the PATTERN is the
# delimiter. Splitting c_name on '#0*' peels the entity prefix from the
# zero-padded id in one step ('Customer#000000120' -> ['Customer','120']) —
# the factory's canonical "structured id" example. Grouping by token length
# characterizes the whole split without exploding the id domain.
# ---------------------------------------------------------------------------

_SPLIT_RE = "#0*"


@register(
    "pattern_tokenizer_split",
    f"""WITH toks AS (SELECT unnest(regexp_split_to_array(c_name, '{_SPLIT_RE}')) AS token
           FROM customer)
SELECT length(token)::BIGINT AS tok_len, count(*)::BIGINT AS n_tokens
FROM toks GROUP BY tok_len ORDER BY tok_len ASC""",
)
def pattern_tokenizer_split(spark, sf_dir):
    """PatternTokenizer('#0*', split mode) token-length profile."""
    c = _read(spark, sf_dir, "customer")
    toks = c.select(F.explode(F.split("c_name", _SPLIT_RE)).alias("token"))
    return (
        toks.select(F.length("token").cast("long").alias("tok_len"))
        .groupBy("tok_len")
        .agg(F.count("*").alias("n_tokens"))
        .orderBy(F.asc("tok_len"))
    )


# ---------------------------------------------------------------------------
# HyphenatedWordsFilter — lucene/analysis/common/.../miscellaneous/
# HyphenatedWordsFilter.java: rejoin words broken across a line wrap
# ("over- flow" -> "overflow"). Synthesized input: each part name's two
# words re-joined as a hyphen-wrapped line (exactly one break per line, so
# Spark's replace-all and DuckDB's replace-first agree). The output top
# tokens are the REJOINED words; the pytest pins that no emitted token
# retains the break hyphen.
# ---------------------------------------------------------------------------

_HYPHEN_RE = "([a-z])- ([a-z])"


@register(
    "hyphenated_words_join",
    f"""WITH synth AS (SELECT split_part(p_name, ' ', 1) || '- '
                  || split_part(p_name, ' ', 2) AS line FROM part),
joined AS (SELECT regexp_replace(line, '{_HYPHEN_RE}', '\\1\\2') AS line FROM synth),
toks AS (SELECT unnest(string_split(line, ' ')) AS term FROM joined)
SELECT term, count(*)::BIGINT AS n_tokens
FROM toks GROUP BY term ORDER BY n_tokens DESC, term ASC LIMIT 15""",
)
def hyphenated_words_join(spark, sf_dir):
    """HyphenatedWordsFilter rejoins synthesized line-wrap breaks."""
    p = _read(spark, sf_dir, "part")
    w = F.split("p_name", " ")
    line = F.concat(F.element_at(w, 1), F.lit("- "), F.element_at(w, 2))
    joined = F.regexp_replace(line, _HYPHEN_RE, "$1$2")
    toks = p.select(F.explode(F.split(joined, " ")).alias("term"))
    return (
        toks.groupBy("term")
        .agg(F.count("*").alias("n_tokens"))
        .orderBy(F.desc("n_tokens"), F.asc("term"))
        .limit(15)
    )
