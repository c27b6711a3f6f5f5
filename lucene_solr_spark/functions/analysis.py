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


def edge_ngrams(term_col, min_n: int = 2, max_n: int = 5):
    """EdgeNGramTokenFilter analog (analysis/ngram/EdgeNGramTokenFilter
    .java): leading prefixes of length min_n..max_n (the search-as-you-type
    index shape). JVM-side."""
    hi = F.least(F.length(term_col).cast("int"), F.lit(max_n))
    return F.when(
        F.length(term_col) < min_n, F.array().cast("array<string>")
    ).otherwise(
        F.transform(
            F.sequence(F.lit(min_n), hi),
            lambda i: F.substring(term_col, 1, i.cast("int")),
        )
    )


# ASCIIFoldingFilter analog (analysis/miscellaneous/ASCIIFoldingFilter.java):
# the Latin-1 / Latin-Extended-A subset folded 1:1 via translate, plus the
# common multi-char folds. The pair below is shared verbatim by the DuckDB
# oracle mirror, so both engines fold identically by construction.
ASCII_FOLD_FROM = "àáâãäåèéêëìíîïòóôõöùúûüýÿñçšžłđðþÀÁÂÃÄÅÈÉÊËÌÍÎÏÒÓÔÕÖÙÚÛÜÝÑÇŠŽŁĐ"
ASCII_FOLD_TO = "aaaaaaeeeeiiiiooooouuuuyyncszldpAAAAAAEEEEIIIIOOOOOUUUUYNCSZLD"
_FOLD_MULTI = [("æ", "ae"), ("Æ", "AE"), ("œ", "oe"), ("Œ", "OE"), ("ß", "ss")]


def ascii_fold_col(text_col):
    """Fold accented Latin chars to ASCII (subset documented above)."""
    e = text_col if not isinstance(text_col, str) else F.col(text_col)
    for src, dst in _FOLD_MULTI:
        e = F.replace(e, F.lit(src), F.lit(dst))
    return F.translate(e, ASCII_FOLD_FROM, ASCII_FOLD_TO)


def duckdb_ascii_fold_sql(text_expr: str) -> str:
    e = text_expr
    for src, dst in _FOLD_MULTI:
        e = f"replace({e}, '{src}', '{dst}')"
    return f"translate({e}, '{ASCII_FOLD_FROM}', '{ASCII_FOLD_TO}')"


# HTMLStripCharFilter analog (analysis/charfilter/HTMLStripCharFilter.java):
# drop script/style blocks, replace tags with a space, decode the common
# entities. Regex chain shared with the DuckDB mirror.
# RE2 (DuckDB) has no backreferences, so script/style are separate patterns
_HTML_STEPS = [
    (r"<script[^>]*>.*?</script>", " "),
    (r"<style[^>]*>.*?</style>", " "),
    (r"<!--.*?-->", " "),
    (r"<[^>]*>", " "),
]
_ENTITIES = [
    ("&lt;", "<"), ("&gt;", ">"), ("&quot;", '"'),
    ("&#39;", "'"), ("&nbsp;", " "), ("&amp;", "&"),
]


def html_strip_col(text_col):
    e = text_col if not isinstance(text_col, str) else F.col(text_col)
    for pat, rep in _HTML_STEPS:
        e = F.regexp_replace(e, r"(?s)" + pat, rep)
    for ent, ch in _ENTITIES:
        e = F.replace(e, F.lit(ent), F.lit(ch))
    return e


def duckdb_html_strip_sql(text_expr: str) -> str:
    e = text_expr
    for pat, rep in _HTML_STEPS:
        e = f"regexp_replace({e}, '{pat}', '{rep}', 'gs')"
    for ent, ch in _ENTITIES:
        ch_sql = ch.replace("'", "''")
        e = f"replace({e}, '{ent}', '{ch_sql}')"
    return e


# ---------------------------------------------------------------------------
# Porter stemmer (analysis/en/PorterStemFilter.java — the classic Porter
# 1980 algorithm). Pure-Python per distinct token with per-batch
# memoization (vocabulary is tiny relative to token count), exposed as a
# pandas UDF over token arrays. No DuckDB mirror exists offline, so the
# driver row is rows-only; the algorithm is pinned by the published
# example vectors in tests/test_functions.py.
# ---------------------------------------------------------------------------

_VOWELS = set("aeiou")


def _is_cons(w: str, i: int) -> bool:
    c = w[i]
    if c in _VOWELS:
        return False
    if c == "y":
        return i == 0 or not _is_cons(w, i - 1)
    return True


def _measure(stem: str) -> int:
    m, prev_vowel = 0, False
    for i in range(len(stem)):
        v = not _is_cons(stem, i)
        if not v and prev_vowel:
            m += 1
        prev_vowel = v
    return m


def _has_vowel(stem: str) -> bool:
    return any(not _is_cons(stem, i) for i in range(len(stem)))


def _ends_double_cons(w: str) -> bool:
    return len(w) >= 2 and w[-1] == w[-2] and _is_cons(w, len(w) - 1)


def _cvc(w: str) -> bool:
    if len(w) < 3:
        return False
    return (
        _is_cons(w, len(w) - 3)
        and not _is_cons(w, len(w) - 2)
        and _is_cons(w, len(w) - 1)
        and w[-1] not in "wxy"
    )


def porter_stem(w: str) -> str:
    """Classic Porter (1980) stemmer, steps 1a-5b."""
    if len(w) <= 2:
        return w
    # step 1a
    if w.endswith("sses"):
        w = w[:-2]
    elif w.endswith("ies"):
        w = w[:-2]
    elif not w.endswith("ss") and w.endswith("s"):
        w = w[:-1]
    # step 1b
    flag = False
    if w.endswith("eed"):
        if _measure(w[:-3]) > 0:
            w = w[:-1]
    elif w.endswith("ed") and _has_vowel(w[:-2]):
        w, flag = w[:-2], True
    elif w.endswith("ing") and _has_vowel(w[:-3]):
        w, flag = w[:-3], True
    if flag:
        if w.endswith(("at", "bl", "iz")):
            w += "e"
        elif _ends_double_cons(w) and w[-1] not in "lsz":
            w = w[:-1]
        elif _measure(w) == 1 and _cvc(w):
            w += "e"
    # step 1c
    if w.endswith("y") and _has_vowel(w[:-1]):
        w = w[:-1] + "i"
    # step 2
    for suf, rep in (
        ("ational", "ate"), ("tional", "tion"), ("enci", "ence"),
        ("anci", "ance"), ("izer", "ize"), ("abli", "able"), ("alli", "al"),
        ("entli", "ent"), ("eli", "e"), ("ousli", "ous"), ("ization", "ize"),
        ("ation", "ate"), ("ator", "ate"), ("alism", "al"), ("iveness", "ive"),
        ("fulness", "ful"), ("ousness", "ous"), ("aliti", "al"),
        ("iviti", "ive"), ("biliti", "ble"),
    ):
        if w.endswith(suf):
            if _measure(w[: -len(suf)]) > 0:
                w = w[: -len(suf)] + rep
            break
    # step 3
    for suf, rep in (
        ("icate", "ic"), ("ative", ""), ("alize", "al"), ("iciti", "ic"),
        ("ical", "ic"), ("ful", ""), ("ness", ""),
    ):
        if w.endswith(suf):
            if _measure(w[: -len(suf)]) > 0:
                w = w[: -len(suf)] + rep
            break
    # step 4
    for suf in (
        "al", "ance", "ence", "er", "ic", "able", "ible", "ant", "ement",
        "ment", "ent", "ion", "ou", "ism", "ate", "iti", "ous", "ive", "ize",
    ):
        if w.endswith(suf):
            stem = w[: -len(suf)]
            if suf == "ion" and not stem.endswith(("s", "t")):
                break
            if _measure(stem) > 1:
                w = stem
            break
    # step 5a
    if w.endswith("e"):
        m = _measure(w[:-1])
        if m > 1 or (m == 1 and not _cvc(w[:-1])):
            w = w[:-1]
    # step 5b
    if _measure(w) > 1 and _ends_double_cons(w) and w.endswith("l"):
        w = w[:-1]
    return w


@pandas_udf(ArrayType(StringType()))
def porter_stem_udf(token_arrays: pd.Series) -> pd.Series:
    memo: dict[str, str] = {}

    def stem_list(toks):
        out = []
        if toks is None:
            toks = []
        for t in toks:
            s = memo.get(t)
            if s is None:
                s = memo[t] = porter_stem(t)
            out.append(s)
        return out

    return token_arrays.map(stem_list)
