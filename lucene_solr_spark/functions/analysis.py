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

import re as _re
import unicodedata as _ud

import numpy as _np
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


# ---------------------------------------------------------------------------
# Offset-aware tokenizer — the IndexOptions...AND_OFFSETS analog
# (index/IndexOptions.java#DOCS_AND_FREQS_AND_POSITIONS_AND_OFFSETS,
# analysis OffsetAttribute). Emits the SAME token sequence as the pinned
# spec above plus each token's (start_char, end_char) into the NFC-
# normalized source text, so char spans survive analysis transforms
# (lowercasing, camelCase/digit splits) that make re-tokenized display
# text unrecoverable. Every token is a contiguous source substring:
# token == source[start:end].lower() — pinned by tests/test_offsets.py's
# parity property against tokenize_pandas.
# ---------------------------------------------------------------------------

_RUN_RE = _re.compile(r"\w+", _re.UNICODE)


def tokenize_offsets(text: str):
    """One string -> (tokens list[str], starts ndarray, ends ndarray).

    Offsets index the NFC-normalized text (identity on the asserted-ASCII
    corpora — same normalization step 1 of the pinned spec). The split
    rules are re-expressed as per-character boundary predicates over each
    ``\\w+`` run, which provably equals the pinned regex-rewrite chain on
    any input (the rewrite rules only INSERT separators between
    characters, never reorder or delete non-underscore characters):

      split before char i of a run iff
        prev is ASCII lower  and cur is ASCII upper            (camelCase)
      | prev is ASCII letter and cur is ASCII digit            (utf8)
      | prev is ASCII digit  and cur is ASCII letter           (8bit)
      | prev+cur ASCII upper and next is ASCII lower           (HTTPServer)
      | prev or cur is '_'   (the underscore itself is dropped)
    """
    t = _ud.normalize("NFC", text or "")
    toks: list[str] = []
    starts: list[int] = []
    ends: list[int] = []
    for m in _RUN_RE.finditer(t):
        run, base = m.group(), m.start()
        n = len(run)
        if n == 1:
            if run != "_":
                toks.append(run.lower())
                starts.append(base)
                ends.append(base + 1)
            continue
        codes = _np.frombuffer(run.encode("utf-32-le"), dtype=_np.uint32)
        up = (codes >= 65) & (codes <= 90)
        lo = (codes >= 97) & (codes <= 122)
        dg = (codes >= 48) & (codes <= 57)
        al = up | lo
        us = codes == 95
        split = _np.zeros(n, dtype=bool)
        nxt_lo = _np.zeros(n - 1, dtype=bool)
        nxt_lo[:-1] = lo[2:]
        split[1:] = (
            (lo[:-1] & up[1:])
            | (al[:-1] & dg[1:])
            | (dg[:-1] & al[1:])
            | (up[:-1] & up[1:] & nxt_lo)
        )
        split |= us                      # boundary AT each underscore
        split[1:] |= us[:-1]             # and right after it
        split[0] = True
        bounds = _np.flatnonzero(split).tolist() + [n]
        for s, e in zip(bounds, bounds[1:]):
            if run[s] == "_":            # dropped separator, not a token
                continue
            toks.append(run[s:e].lower())
            starts.append(base + s)
            ends.append(base + e)
    return (
        toks,
        _np.asarray(starts, dtype=_np.int64),
        _np.asarray(ends, dtype=_np.int64),
    )


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
# Tokenizer VARIANTS (analysis/core/*Tokenizer.java) — the non-default
# tokenizers a Solr schema can pick instead of the pinned standard spec.
# All pure JVM-side Column expressions (no Python), each with a DuckDB
# mirror so rows over them stay in the oracle gate.
# ---------------------------------------------------------------------------


def _txt(col):
    return F.col(col) if isinstance(col, str) else col


def whitespace_tokens_col(text_col):
    """WhitespaceTokenizer analog (analysis/core/WhitespaceTokenizer.java):
    maximal runs of non-whitespace, case and punctuation preserved."""
    c = _txt(text_col)
    return F.filter(F.split(F.trim(c), r"\s+"), lambda x: x != "")


def whitespace_tokens_sql(text_expr: str) -> str:
    return (
        f"CASE WHEN trim({text_expr}) = '' THEN [] "
        f"ELSE string_split_regex(trim({text_expr}), '\\s+') END"
    )


def letter_tokens_col(text_col):
    """LetterTokenizer analog (analysis/core/LetterTokenizer.java): maximal
    runs of letters (ASCII [A-Za-z] — the corpora are asserted-ASCII; the
    reference uses Character.isLetter), case preserved."""
    return F.regexp_extract_all(_txt(text_col), F.lit("[A-Za-z]+"), 0)


def letter_tokens_sql(text_expr: str) -> str:
    return f"regexp_extract_all({text_expr}, '[A-Za-z]+')"


def keyword_tokens_col(text_col):
    """KeywordTokenizer analog (analysis/core/KeywordTokenizer.java): the
    whole input as ONE token; empty/null input emits none."""
    c = _txt(text_col)
    return F.when(
        c.isNotNull() & (F.length(c) > 0), F.array(c)
    ).otherwise(F.array().cast("array<string>"))


def keyword_tokens_sql(text_expr: str) -> str:
    return (
        f"CASE WHEN {text_expr} IS NULL OR {text_expr} = '' THEN [] "
        f"ELSE [{text_expr}] END"
    )


# ---------------------------------------------------------------------------
# Additional analysis components (Lucene TokenFilter analogs) as pure
# DataFrame column expressions — JVM-side, no Python.
# ---------------------------------------------------------------------------

def stop_filter(tokens_col, stopwords: list[str]):
    """StopFilter analog (analysis/core/StopFilter.java): drop stopwords.

    array_except would be shorter but dedups the survivors; StopFilter
    preserves order AND repeated non-stop tokens, so filter element-wise.
    """
    return F.filter(tokens_col, lambda x: ~x.isin(stopwords))


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


# ---------------------------------------------------------------------------
# Snowball English stemmer ("Porter2", analysis/snowball/SnowballFilter.java
# with EnglishStemmer — the algorithm published at snowballstem.org).
# Same vectorization shape as porter_stem_udf: pure-Python per DISTINCT
# token, memoized per Arrow batch. Pinned by hand-derived vectors in
# tests/test_functions.py (no network copy of the sample vocabulary).
# ---------------------------------------------------------------------------

_P2_VOWELS = set("aeiouy")
_P2_DOUBLES = ("bb", "dd", "ff", "gg", "mm", "nn", "pp", "rr", "tt")
_P2_LI_END = set("cdeghkmnrt")

_P2_EXC1 = {
    "skis": "ski", "skies": "sky", "dying": "die", "lying": "lie",
    "tying": "tie", "idly": "idl", "gently": "gentl", "ugly": "ugli",
    "early": "earli", "only": "onli", "singly": "singl",
    "sky": "sky", "news": "news", "howe": "howe", "atlas": "atlas",
    "cosmos": "cosmos", "bias": "bias", "andes": "andes",
}
_P2_EXC2 = {
    "inning", "outing", "canning", "herring", "earring",
    "proceed", "exceed", "succeed",
}


def _p2_is_vowel(w: str, i: int) -> bool:
    return w[i] in _P2_VOWELS  # 'Y' (marked consonant y) is not in the set


def _p2_regions(w: str) -> tuple[int, int]:
    """(r1, r2) start indices. R1 = after the first non-vowel following a
    vowel (special-cased gener/commun/arsen prefixes); R2 = same rule
    applied after R1."""
    n = len(w)

    def region_after(start: int) -> int:
        for i in range(start, n - 1):
            if _p2_is_vowel(w, i) and not _p2_is_vowel(w, i + 1):
                return i + 2
        return n

    if w.startswith(("gener", "commun", "arsen")):
        r1 = 6 if w.startswith("commun") else 5
        r1 = min(r1, n)
    else:
        r1 = region_after(0)
    r2 = region_after(r1)
    return r1, r2


def _p2_ends_short_syllable(w: str) -> bool:
    n = len(w)
    if n == 2:
        return _p2_is_vowel(w, 0) and not _p2_is_vowel(w, 1)
    if n < 3:
        return False
    return (
        not _p2_is_vowel(w, n - 3)
        and _p2_is_vowel(w, n - 2)
        and not _p2_is_vowel(w, n - 1)
        and w[n - 1] not in "wxY"
    )


def _p2_is_short(w: str) -> bool:
    r1, _ = _p2_regions(w)
    return r1 >= len(w) and _p2_ends_short_syllable(w)


def snowball_stem(word: str) -> str:
    """Snowball English (Porter2) stemmer."""
    w = word
    if len(w) <= 2:
        return w
    w = w.replace("'", "")
    if len(w) <= 2:
        return w
    if w in _P2_EXC1:
        return _P2_EXC1[w]
    # mark consonant-y: initial y, or y after a vowel
    chars = list(w)
    if chars[0] == "y":
        chars[0] = "Y"
    for i in range(1, len(chars)):
        if chars[i] == "y" and chars[i - 1] in _P2_VOWELS:
            chars[i] = "Y"
    w = "".join(chars)

    # step 0: longest of 's / 's' / ' (already stripped apostrophes above)

    # step 1a
    if w.endswith("sses"):
        w = w[:-2]
    elif w.endswith(("ied", "ies")):
        w = w[:-2] if len(w) > 4 else w[:-1]
    elif w.endswith(("us", "ss")):
        pass
    elif w.endswith("s"):
        if any(_p2_is_vowel(w, i) for i in range(len(w) - 2)):
            w = w[:-1]

    if w.lower() in _P2_EXC2:
        return w.replace("Y", "y")

    # step 1b
    r1, r2 = _p2_regions(w)
    if w.endswith("eedly"):
        if len(w) - 5 >= r1:
            w = w[:-3]
    elif w.endswith("eed"):
        if len(w) - 3 >= r1:
            w = w[:-1]
    else:
        for suf in ("ingly", "edly", "ing", "ed"):
            if w.endswith(suf):
                stem = w[: -len(suf)]
                if any(_p2_is_vowel(stem, i) for i in range(len(stem))):
                    w = stem
                    if w.endswith(("at", "bl", "iz")):
                        w += "e"
                    elif w.endswith(_P2_DOUBLES):
                        w = w[:-1]
                    elif _p2_is_short(w):
                        w += "e"
                break

    # step 1c
    if (
        len(w) > 2
        and w[-1] in "yY"
        and not _p2_is_vowel(w, len(w) - 2)
    ):
        w = w[:-1] + "i"

    r1, r2 = _p2_regions(w)

    # step 2 (longest suffix among:, condition = suffix in R1)
    step2 = (
        ("ization", "ize"), ("ational", "ate"), ("fulness", "ful"),
        ("ousness", "ous"), ("iveness", "ive"), ("tional", "tion"),
        ("biliti", "ble"), ("lessli", "less"), ("entli", "ent"),
        ("ation", "ate"), ("alism", "al"), ("aliti", "al"),
        ("ousli", "ous"), ("iviti", "ive"), ("fulli", "ful"),
        ("enci", "ence"), ("anci", "ance"), ("abli", "able"),
        ("izer", "ize"), ("ator", "ate"), ("alli", "al"),
        ("ogi", "og"), ("bli", "ble"), ("li", ""),
    )
    for suf, rep in step2:
        if w.endswith(suf):
            if len(w) - len(suf) >= r1:
                if suf == "ogi":
                    if w.endswith("logi"):
                        w = w[:-1]
                elif suf == "li":
                    if len(w) >= 3 and w[-3] in _P2_LI_END:
                        w = w[:-2]
                else:
                    w = w[: -len(suf)] + rep
            break

    r1, r2 = _p2_regions(w)

    # step 3 (condition = suffix in R1; ative additionally in R2)
    step3 = (
        ("ational", "ate"), ("tional", "tion"), ("alize", "al"),
        ("icate", "ic"), ("iciti", "ic"), ("ative", ""),
        ("ical", "ic"), ("ness", ""), ("ful", ""),
    )
    for suf, rep in step3:
        if w.endswith(suf):
            if len(w) - len(suf) >= r1:
                if suf == "ative":
                    if len(w) - len(suf) >= r2:
                        w = w[: -len(suf)]
                else:
                    w = w[: -len(suf)] + rep
            break

    r1, r2 = _p2_regions(w)

    # step 4 (condition = suffix in R2)
    step4 = (
        "ement", "ance", "ence", "able", "ible", "ment",
        "ant", "ent", "ism", "ate", "iti", "ous", "ive", "ize",
        "ion", "al", "er", "ic",
    )
    for suf in step4:
        if w.endswith(suf):
            if len(w) - len(suf) >= r2:
                if suf == "ion":
                    if len(w) >= 4 and w[-4] in "st":
                        w = w[:-3]
                else:
                    w = w[: -len(suf)]
            break

    r1, r2 = _p2_regions(w)

    # step 5
    if w.endswith("e"):
        if len(w) - 1 >= r2 or (
            len(w) - 1 >= r1 and not _p2_ends_short_syllable(w[:-1])
        ):
            w = w[:-1]
    elif w.endswith("l"):
        if len(w) - 1 >= r2 and len(w) >= 2 and w[-2] == "l":
            w = w[:-1]

    return w.replace("Y", "y")


@pandas_udf(ArrayType(StringType()))
def snowball_stem_udf(token_arrays: pd.Series) -> pd.Series:
    memo: dict[str, str] = {}

    def stem_list(toks):
        out = []
        if toks is None:
            toks = []
        for t in toks:
            s = memo.get(t)
            if s is None:
                s = memo[t] = snowball_stem(t)
            out.append(s)
        return out

    return token_arrays.map(stem_list)


# ---------------------------------------------------------------------------
# WordDelimiterGraphFilter analog (analysis/miscellaneous/
# WordDelimiterGraphFilter.java), pinned option set: splitOnCaseChange=1,
# splitOnNumerics=1, generateWordParts=1, generateNumberParts=1,
# catenateAll=1, preserveOriginal=0, with lowercasing applied AFTER the
# split (the standard schema chain for product codes / identifiers). The
# flat part list is the graph's FlattenGraphFilter view at index time.
# ONE ordered boundary-rule table renders into the Spark Column chain AND
# the DuckDB SQL, so both engines split identically by construction.
# ---------------------------------------------------------------------------

_WDGF_BOUNDARIES = [
    "([a-z])([A-Z])",        # case transition   fooBar -> foo Bar
    "([A-Z])([A-Z][a-z])",   # acronym run end   XTi    -> X Ti
    "([A-Za-z])([0-9])",     # letter -> digit   shot500 -> shot 500
    "([0-9])([A-Za-z])",     # digit -> letter   500xt   -> 500 xt
]


def word_delimiter_parts_col(text_col):
    """Subword parts (word + number parts) of one source token/string."""
    e = _txt(text_col)
    for pat in _WDGF_BOUNDARIES:
        e = F.regexp_replace(e, pat, r"$1 $2")
    e = F.regexp_replace(e, "[^A-Za-z0-9]+", " ")
    e = F.lower(F.trim(e))
    return F.filter(F.split(e, " "), lambda t: t != F.lit(""))


def word_delimiter_parts_sql(text_expr: str) -> str:
    """DuckDB mirror of word_delimiter_parts_col (same rule table)."""
    e = text_expr
    for pat in _WDGF_BOUNDARIES:
        e = f"regexp_replace({e}, '{pat}', '\\1 \\2', 'g')"
    e = f"regexp_replace({e}, '[^A-Za-z0-9]+', ' ', 'g')"
    return f"list_filter(string_split(lower(trim({e})), ' '), t -> t <> '')"


def word_delimiter_catenate_col(text_col):
    """catenateAll=1: every alphanumeric run concatenated into one token."""
    return F.lower(F.regexp_replace(_txt(text_col), "[^A-Za-z0-9]+", ""))


def word_delimiter_catenate_sql(text_expr: str) -> str:
    return f"lower(regexp_replace({text_expr}, '[^A-Za-z0-9]+', '', 'g'))"
