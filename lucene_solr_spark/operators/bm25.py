"""BM25 scoring math — Lucene 8 semantics, float32, vectorized.

Reference: lucene/core/src/java/org/apache/lucene/search/similarities/
BM25Similarity.java. Pinned semantics (SURVEY.md §4.3):

- LUCENE-8563: the (k1+1) numerator is REMOVED.
  ``score(t,d) = idf(t) * freq / (freq + k1*(1 - b + b*dl/avgdl))``
- ``idf = ln(1 + (N - df + 0.5)/(df + 0.5))`` (#idfExplain), computed in
  float64 then applied in float32.
- ``N`` = docCount (docs with the field), ``avgdl = sumTotalTermFreq/docCount``.
- dl is the byte4-quantized field length (functions/smallfloat.py); the
  whole denominator addend ``k1*(1-b+b*dl/avgdl)`` is precomputed as a
  256-entry float32 cache indexed by norm byte (BM25Similarity#scorer).
- per-term scores summed in float32, fixed lexicographic term order.
- ties: score desc, doc_id asc.
"""

from __future__ import annotations

import math

import numpy as np

from ..functions.smallfloat import BYTE4_DECODE_TABLE

K1 = 1.2
B = 0.75


def idf(N: int, df: int) -> float:
    """float64 idf, per BM25Similarity#idfExplain."""
    return math.log(1.0 + (N - df + 0.5) / (df + 0.5))


def norm_cache(avgdl: float, k1: float = K1, b: float = B) -> np.ndarray:
    """256-entry float32 cache: norm byte -> k1*(1-b+b*dl/avgdl).
    Mirrors BM25Similarity#scorer's ``cache`` array. avgdl is 0 only for
    a segment with zero indexed tokens — no posting can be scored there,
    so any finite cache works; 1.0 keeps the arithmetic warning-free
    (Lucene never hits this: a non-empty index has avgFieldLength > 0)."""
    if avgdl == 0:
        avgdl = 1.0
    dl = BYTE4_DECODE_TABLE.astype(np.float32)
    return (
        np.float32(k1)
        * (np.float32(1 - b) + np.float32(b) * dl / np.float32(avgdl))
    ).astype(np.float32)


def score_block(
    freqs: np.ndarray, norm_bytes: np.ndarray, idf_t: float, cache: np.ndarray
) -> np.ndarray:
    """Vectorized float32 per-doc scores for one term's postings."""
    f = freqs.astype(np.float32)
    denom_add = cache[np.asarray(norm_bytes, dtype=np.uint8)]
    return (np.float32(idf_t) * (f / (f + denom_add))).astype(np.float32)


def block_max_score(max_freq: int, min_dl: int, idf_t: float, avgdl: float) -> float:
    """Upper bound of score(t, d) over a block given its competitive impact
    (max_freq, min_dl) — our analog of Lucene's per-block impacts
    (index/CompetitiveImpactAccumulator.java + Lucene84SkipWriter.java).
    tf_part is increasing in freq and decreasing in dl, so (max_freq, min_dl)
    bounds every (freq, dl) pair in the block."""
    f = np.float32(max_freq)
    add = np.float32(K1) * (
        np.float32(1 - B) + np.float32(B) * np.float32(min_dl) / np.float32(avgdl)
    )
    return float(np.float32(idf_t) * (f / (f + add)))
