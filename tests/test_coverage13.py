"""Semantic pins for the coverage13 analysis-chain batch (cross-engine
parity lives in the driver-contract mirror; these pin what parity alone
wouldn't catch): the filters genuinely fire (vowels stripped, apostrophes
removed, non-ASCII digits folded, hyphens rejoined), synthesized inputs
genuinely exercise the non-ASCII / punctuation paths, and every row stays
whole-stage-codegen with no Python evaluation."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

import __spark_entry__ as entry_mod  # noqa: F401  (registers the catalog)
from lucene_solr_spark.plans import coverage13_queries as c13

from .conftest import SF_DIR


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


ROWS = [
    "pattern_replace_tokens",
    "keep_word_capitalize",
    "elision_possessive_tokens",
    "decimal_digit_fold",
    "limit_token_count",
    "uax_url_email_tokens",
    "pattern_tokenizer_split",
    "hyphenated_words_join",
]


@pytest.mark.parametrize("name", ROWS)
def test_no_python_eval(spark, name):
    """Every row in this batch is pure JVM codegen — no Pandas/Python UDF."""
    df = entry_mod.queries()[name](spark, SF_DIR)
    plan = _plan(df)
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_pattern_replace_strips_trailing_vowels(spark):
    rows = c13.pattern_replace_tokens(spark, SF_DIR).collect()
    assert rows
    for r in rows:
        # anchored pattern: nothing the filter emits still ends in a vowel
        # (empty keys would come from all-vowel tokens; corpus has 'a')
        if r.tkey:
            assert r.tkey[-1] not in "aeiou"
    # the filter genuinely fired: 'tabl' only exists as a stripped 'table'
    d = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    toks = d.select(F.explode(F.split("text", " ")).alias("t"))
    if toks.filter(F.col("t") == "table").count():
        assert toks.filter(F.col("t") == "tabl").count() == 0
        assert any(r.tkey == "tabl" for r in rows) or len(rows) == 15


def test_keep_word_counts_match_raw(spark):
    """KeepWordFilter keeps every occurrence; Capitalization only reshapes
    the token text, never the counts."""
    rows = {r.token: r.n_tokens for r in c13.keep_word_capitalize(spark, SF_DIR).collect()}
    assert set(rows) <= {w[0].upper() + w[1:] for w in c13._KEEP_WORDS}
    d = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    toks = d.select(F.explode(F.split("text", " ")).alias("t"))
    for w in c13._KEEP_WORDS:
        raw = toks.filter(F.col("t") == w).count()
        cap = w[0].upper() + w[1:]
        assert rows.get(cap, 0) == raw


def test_elision_possessive_normalizes_all_variants(spark):
    """Each distinct corpus term spawns 4 variants and all 4 normalize back
    to the bare term — so every count is exactly 4 and the token set is the
    corpus vocabulary (the variants genuinely carried apostrophes)."""
    rows = c13.elision_possessive_tokens(spark, SF_DIR).collect()
    assert rows
    assert all(r.n_tokens == 4 for r in rows)
    assert all("'" not in r.token for r in rows)
    d = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    vocab = {
        r.t for r in d.select(F.explode(F.split("text", " ")).alias("t")).distinct().collect()
    }
    assert {r.token for r in rows} == vocab


def test_decimal_digit_roundtrip_and_nonascii(spark):
    rows = c13.decimal_digit_fold(spark, SF_DIR).collect()
    assert rows
    for r in rows:
        assert r.n_roundtrip == r.n_keys  # fold(synth(k)) == k for every key
    # the synthesized column really is non-ASCII Arabic-Indic digits
    o = spark.read.parquet(f"{SF_DIR}/orders.parquet")
    arab = F.translate(
        (F.col("o_orderkey") % 100000).cast("string"),
        c13._ASCII_DIGITS,
        c13._ARABIC_DIGITS,
    )
    sample = o.select(arab.alias("a")).first().a
    assert all(ord(ch) >= 0x0660 for ch in sample)


def test_limit_token_count_caps_per_doc(spark):
    """Total indexed tokens == sum over docs of min(len, 10) — the filter
    stops at the cap and long docs genuinely lose their tails."""
    d = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    expected = d.select(
        F.least(F.size(F.split("text", " ")), F.lit(c13._LIMIT_N)).alias("n")
    ).agg(F.sum("n")).first()[0]
    toks = d.select(
        F.explode(F.slice(F.split("text", " "), 1, c13._LIMIT_N)).alias("t")
    ).count()
    assert toks == expected
    # and the cap binds at sf0.001: some doc exceeds 10 tokens
    assert d.filter(F.size(F.split("text", " ")) > c13._LIMIT_N).count() > 0


def test_uax_types_one_token_per_line(spark):
    rows = {r.ttype: r for r in c13.uax_url_email_tokens(spark, SF_DIR).collect()}
    n_cust = spark.read.parquet(f"{SF_DIR}/customer.parquet").count()
    assert rows["EMAIL"].n_tokens == n_cust
    assert rows["URL"].n_tokens == n_cust
    # emails stay whole (contain '@'); urls stay whole (scheme prefix kept)
    assert rows["EMAIL"].n_distinct == n_cust  # cust ids are unique
    assert rows["URL"].n_distinct <= 5 * 97  # segment x (key % 97) domain


def test_pattern_tokenizer_two_tokens_per_name(spark):
    rows = c13.pattern_tokenizer_split(spark, SF_DIR).collect()
    n_cust = spark.read.parquet(f"{SF_DIR}/customer.parquet").count()
    assert sum(r.n_tokens for r in rows) == 2 * n_cust
    assert any(r.tok_len == len("Customer") for r in rows)


def test_hyphenated_join_leaves_no_breaks(spark):
    rows = c13.hyphenated_words_join(spark, SF_DIR).collect()
    assert rows
    assert all("-" not in r.term for r in rows)
    # every line collapses to exactly ONE rejoined token
    p = spark.read.parquet(f"{SF_DIR}/part.parquet")
    total = (
        c13.hyphenated_words_join(spark, SF_DIR)
        .agg(F.sum("n_tokens"))
        .first()[0]
    )
    # top-15 may truncate; rebuild without the limit for the exact total
    w = F.split("p_name", " ")
    line = F.concat(F.element_at(w, 1), F.lit("- "), F.element_at(w, 2))
    joined = F.regexp_replace(line, c13._HYPHEN_RE, "$1$2")
    n_tokens = p.select(
        F.explode(F.split(joined, " ")).alias("t")
    ).count()
    assert n_tokens == p.count()
    assert total <= n_tokens
