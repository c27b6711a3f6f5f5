"""FOR (Frame-of-Reference) bit-packing for posting blocks — numpy-vectorized.

Reference: lucene/core/src/java/org/apache/lucene/codecs/lucene84/ForUtil.java
(+ PForUtil.java, Lucene84PostingsWriter.java): postings are written as
128-doc blocks of docID deltas and term frequencies, each block bit-packed at
the minimal width for its max value (FOR; Zukowski et al., ICDE 2006).

Our format (pinned, little-endian):
  byte 0          : bit width w (0..64). w==0 => all values are zero.
  bytes 1..2      : uint16 count n (<= BLOCK_SIZE)
  bytes 3..       : ceil(n*w/8) bytes of packed values, LSB-first within the
                    conceptual bitstream (value v occupies bits [i*w, (i+1)*w)).

Pure numpy (bit matrix via unpackbits/packbits) — no per-value Python loops,
so this runs at Arrow-batch speed inside applyInPandas/mapInPandas stages.
"""

from __future__ import annotations

import numpy as np

BLOCK_SIZE = 128  # matches Lucene84's ForUtil.BLOCK_SIZE


def pack_ints(values: np.ndarray) -> bytes:
    """Bit-pack a 1-D array of non-negative ints (<2^63) to bytes."""
    v = np.asarray(values, dtype=np.uint64)
    n = v.size
    if n > 0xFFFF:
        raise ValueError("block too large")
    maxv = int(v.max()) if n else 0
    w = maxv.bit_length()
    header = bytes([w]) + int(n).to_bytes(2, "little")
    if w == 0 or n == 0:
        return header
    # bit matrix: n rows x w cols, row i = bits of v[i], LSB first
    shifts = np.arange(w, dtype=np.uint64)
    bits = ((v[:, None] >> shifts[None, :]) & np.uint64(1)).astype(np.uint8)
    flat = bits.reshape(-1)  # bitstream, LSB-first
    packed = np.packbits(flat, bitorder="little")
    return header + packed.tobytes()


def unpack_ints(data: bytes) -> np.ndarray:
    """Inverse of :func:`pack_ints` -> uint64 array."""
    w = data[0]
    n = int.from_bytes(data[1:3], "little")
    if w == 0 or n == 0:
        return np.zeros(n, dtype=np.uint64)
    payload = np.frombuffer(data, dtype=np.uint8, offset=3)
    flat = np.unpackbits(payload, bitorder="little")[: n * w]
    bits = flat.reshape(n, w).astype(np.uint64)
    shifts = np.arange(w, dtype=np.uint64)
    return (bits << shifts[None, :]).sum(axis=1, dtype=np.uint64)


def delta_encode(sorted_ids: np.ndarray) -> np.ndarray:
    """Strictly-ascending docIDs -> deltas (first value kept absolute).
    Mirrors Lucene84PostingsWriter doc-delta encoding."""
    a = np.asarray(sorted_ids, dtype=np.uint64)
    if a.size == 0:
        return a
    out = np.empty_like(a)
    out[0] = a[0]
    np.subtract(a[1:], a[:-1], out=out[1:])
    return out


def delta_decode(deltas: np.ndarray) -> np.ndarray:
    return np.cumsum(np.asarray(deltas, dtype=np.uint64), dtype=np.uint64)
