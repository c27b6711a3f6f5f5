"""SmallFloat norm quantization — parity with Lucene's one-byte norms.

Reference: lucene/core/src/java/org/apache/lucene/util/SmallFloat.java
(#intToInt4 / #int4ToInt / #intToByte4 / #byte4ToInt), used by
search/similarities/BM25Similarity.java#computeNorm to store the per-doc
field length (token count) as a single lossy byte. BM25 scoring decodes the
byte and precomputes a 256-entry float cache (BM25Similarity#scorer) — we
replicate both (see operators/bm25.py).

Semantics (pinned; /root/reference was empty so this implementation is the
executable ground truth shared with tests/oracle.py):

- int4: a float-ish encoding with 3 stored mantissa bits + implicit leading
  bit. Values < 8 are "subnormal" (exact); otherwise
  ``encoded = ((shift+1) << 3) | ((i >> shift) & 7)`` with
  ``shift = bit_length(i) - 4``. Exact whenever the dropped low bits are
  zero (in particular for all i < 16); always monotonic.
- byte4: ``NUM_FREE_VALUES = 255 - intToInt4(int4ToInt(231)) = 24`` unused
  int4 codes are reassigned to encode 0..23 exactly:
  ``intToByte4(i) = i  if i < 24 else 24 + intToInt4(i - 24)``.
  Hence doc lengths 0..39 are stored exactly; larger ones are bucketed.

All functions have numpy-vectorized variants (the engine path) and scalar
variants (the oracle path); a property test asserts they agree.
"""

from __future__ import annotations

import numpy as np

NUM_FREE_VALUES = 24  # = 255 - intToInt4(MAX_INT4); derivation in module docstring


def int_to_int4(i: int) -> int:
    if i < 0:
        raise ValueError("only positive values")
    if i < 8:
        return i
    num_bits = i.bit_length()
    shift = num_bits - 4
    return ((shift + 1) << 3) | ((i >> shift) & 0x07)


def int4_to_int(i: int) -> int:
    if i < 8:
        return i
    bits = i & 0x07
    shift = (i >> 3) - 1
    return (bits | 0x08) << shift


def int_to_byte4(i: int) -> int:
    """Encode a field length to an unsigned byte 0..255."""
    if i < 0:
        raise ValueError("only positive values")
    if i < NUM_FREE_VALUES:
        return i
    return NUM_FREE_VALUES + int_to_int4(i - NUM_FREE_VALUES)


def byte4_to_int(b: int) -> int:
    """Decode an unsigned byte back to the (bucketed) field length."""
    if b < NUM_FREE_VALUES:
        return b
    return NUM_FREE_VALUES + int4_to_int(b - NUM_FREE_VALUES)


# ---------------------------------------------------------------------------
# Vectorized variants (engine hot path; uint64 inputs)
# ---------------------------------------------------------------------------

def int_to_byte4_np(arr: np.ndarray) -> np.ndarray:
    """Vectorized intToByte4 over a non-negative int array -> uint8."""
    a = np.asarray(arr, dtype=np.int64)
    if (a < 0).any():
        raise ValueError("only positive values")
    j = a - NUM_FREE_VALUES
    small = a < NUM_FREE_VALUES
    jj = np.where(small, 0, j)
    sub = jj < 8
    # bit_length via log2 on int64 is unsafe; use frexp-free integer approach
    nbits = np.zeros_like(jj)
    nz = jj > 0
    nbits[nz] = np.floor(np.log2(jj[nz].astype(np.float64))).astype(np.int64) + 1
    # guard float rounding at exact powers of two
    nbits = np.where((jj >> np.maximum(nbits - 1, 0)) == 0, nbits - 1, nbits)
    nbits = np.where((jj >> nbits) > 0, nbits + 1, nbits)
    shift = np.maximum(nbits - 4, 0)
    enc = ((shift + 1) << 3) | ((jj >> shift) & 0x07)
    enc = np.where(sub, jj, enc)
    out = np.where(small, a, NUM_FREE_VALUES + enc)
    return out.astype(np.uint8)


# Precomputed decode table: uint8 norm byte -> bucketed length (int64).
BYTE4_DECODE_TABLE = np.array([byte4_to_int(b) for b in range(256)], dtype=np.int64)


def byte4_to_int_np(arr: np.ndarray) -> np.ndarray:
    """Vectorized byte4ToInt via the 256-entry table (BM25Similarity#scorer
    does exactly this table precomputation in the reference)."""
    return BYTE4_DECODE_TABLE[np.asarray(arr, dtype=np.uint8)]


def duckdb_byte4_roundtrip_sql(dl_expr: str) -> str:
    """DuckDB SQL computing byte4_to_int(int_to_byte4(dl)) — the quantized
    doc length used in oracle BM25 SQL. Mirrors the pinned semantics:
    exact below 32 (= 24 free + 8 subnormal int4 codes); otherwise
    24 + ((((dl-24) >> s) & 7 | 8) << s), s = floor(log2(dl-24)) - 3.
    """
    j = f"(({dl_expr}) - 24)"
    s = f"(CAST(floor(log2({j})) AS BIGINT) - 3)"
    return (
        f"(CASE WHEN ({dl_expr}) < 32 THEN ({dl_expr}) "
        f"ELSE 24 + (((({j} >> {s}) & 7) | 8) << {s}) END)"
    )
