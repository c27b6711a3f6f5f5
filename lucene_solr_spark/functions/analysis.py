"""The pinned analysis chain (tokenizer spec v1 — FROZEN, see FIXTURES.md §5).

Reference parity targets (see SURVEY.md §2.H):
- StandardTokenizer word segmentation:
  lucene/core/src/java/org/apache/lucene/analysis/standard/StandardTokenizer.java
- LowerCaseFilter: lucene/core/.../analysis/core/LowerCaseFilter.java
- WordDelimiterGraphFilter (camelCase / snake_case / alnum-run splitting,
  parts only, no catenations):
  lucene/core/.../analysis/miscellaneous/WordDelimiterGraphFilter.java

Because /root/reference was empty and no Lucene binary exists in the sandbox,
THIS SPEC IS THE GROUND TRUTH shared by the Spark engine, the pure-Python
oracle (tests/oracle.py) and the DuckDB oracle SQL. The spec, in order:

  1. NFC normalize.
  2. Word chars are ``\\w`` (letters, digits, underscore); every maximal run
     of non-word chars is a separator.
  3. Split at underscores.
  4. Split at camelCase boundaries, acronym rule first:
     ``([A-Z]+)([A-Z][a-z])`` -> ``\\1 \\2`` then ``([a-z])([A-Z])`` -> ``\\1 \\2``.
  5. Split at ASCII letter<->digit boundaries (both directions).
  6. Lowercase. No stopword removal, no stemming (hot tokens like ``import``
     / ``return`` are KEPT and skew-handled downstream, per north_star).

Steps 4-5 use ASCII classes deliberately: Python ``re`` lacks \\p{Lu}/\\p{Ll},
so ASCII-only case/digit boundary rules are the largest set expressible
IDENTICALLY in Python re and DuckDB's RE2. Step 2 is ``\\w`` in Python and
``[\\p{L}\\p{N}_]`` in RE2 — equivalent on ASCII text (the test corpora are
100%% ASCII; asserted in tests/test_tokenizer.py).

Everything here is pandas-vectorized (Series.str ops over Arrow batches);
no per-row Python (input_hint requirement).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType, StringType
from pyspark.sql.pandas.functions import pandas_udf

# (pattern, replacement) applied in order AFTER non-word chars -> space.
# Frozen: changing these invalidates every stored index and golden file.
_SPLIT_RULES: list[tuple[str, str]] = [
    (r"_", " "),                          # snake_case
    (r"([A-Z]+)([A-Z][a-z])", r"\1 \2"),  # HTTPServer -> HTTP Server
    (r"([a-z])([A-Z])", r"\1 \2"),        # camelCase -> camel Case
    (r"([A-Za-z])([0-9])", r"\1 \2"),     # utf8 -> utf 8
    (r"([0-9])([A-Za-z])", r"\1 \2"),     # 8bit -> 8 bit
]


def tokenize_pandas(texts: pd.Series) -> pd.Series:
    """Series[str] -> Series[list[str]] under the pinned spec (vectorized)."""
    s = texts.fillna("").str.normalize("NFC")
    s = s.str.replace(r"\W+", " ", regex=True)
    for pat, rep in _SPLIT_RULES:
        s = s.str.replace(pat, rep, regex=True)
    s = s.str.lower().str.strip()
    out = s.str.split(r"\s+", regex=True)
    # empty text -> [''] from split; normalize to []
    return out.map(lambda t: t if t and t[0] != "" else [])


def tokenize_text(text: str) -> list[str]:
    """Single-string convenience wrapper (oracle / tests)."""
    return tokenize_pandas(pd.Series([text])).iloc[0]


@pandas_udf(ArrayType(StringType()))
def tokenize_udf(texts: pd.Series) -> pd.Series:
    return tokenize_pandas(texts)


def tokens_col(text_col):
    """DataFrame column: pinned tokenizer applied to a string column."""
    return tokenize_udf(F.col(text_col) if isinstance(text_col, str) else text_col)


# ---------------------------------------------------------------------------
# DuckDB-side mirror of the pinned spec, for __spark_entry__.oracle_sql().
# RE2's \p{L}\p{N} == Python \w on the (asserted-ASCII) corpora.
# ---------------------------------------------------------------------------

def duckdb_tokenize_sql(text_expr: str) -> str:
    """A DuckDB expression producing ``list<varchar>`` of pinned-spec tokens."""
    e = f"regexp_replace(nfc_normalize({text_expr}), '[^\\p{{L}}\\p{{N}}_]+', ' ', 'g')"
    e = f"regexp_replace({e}, '_', ' ', 'g')"
    e = f"regexp_replace({e}, '([A-Z]+)([A-Z][a-z])', '\\1 \\2', 'g')"
    e = f"regexp_replace({e}, '([a-z])([A-Z])', '\\1 \\2', 'g')"
    e = f"regexp_replace({e}, '([A-Za-z])([0-9])', '\\1 \\2', 'g')"
    e = f"regexp_replace({e}, '([0-9])([A-Za-z])', '\\1 \\2', 'g')"
    e = f"lower(trim({e}))"
    return (
        f"CASE WHEN {e} = '' THEN [] "
        f"ELSE string_split_regex({e}, '\\s+') END"
    )


# ---------------------------------------------------------------------------
# Additional analysis components (Lucene TokenFilter analogs) as pure
# DataFrame column expressions — JVM-side, no Python.
# ---------------------------------------------------------------------------

def stop_filter(tokens_col, stopwords: list[str]):
    """StopFilter analog (analysis/core/StopFilter.java): drop stopwords."""
    return F.array_except(tokens_col, F.array(*[F.lit(w) for w in stopwords]))


def shingles(tokens_col, n: int = 2, sep: str = " "):
    """ShingleFilter analog (analysis/shingle/ShingleFilter.java):
    word n-grams as strings, built with JVM-side higher-order functions."""
    size = F.greatest(F.size(tokens_col) - (n - 1), F.lit(0))
    idx = F.sequence(F.lit(0), size - 1)
    return F.when(size <= 0, F.array().cast("array<string>")).otherwise(
        F.transform(
            idx,
            lambda i: F.concat_ws(sep, F.slice(tokens_col, i + 1, n)),
        )
    )


def char_ngrams(term_col, n: int = 3):
    """NGramTokenFilter analog (analysis/ngram/NGramTokenFilter.java)."""
    size = F.greatest(F.length(term_col) - (n - 1), F.lit(0))
    idx = F.sequence(F.lit(1), F.greatest(size, F.lit(1)))
    return F.when(F.length(term_col) < n, F.array().cast("array<string>")).otherwise(
        F.transform(idx, lambda i: F.substring(term_col, i, n))
    )
