"""Bloom-filtered terms dictionary — absent-term lookups without a scan.

Reference semantics being re-expressed (SURVEY.md §2.A):
  lucene/codecs/src/java/org/apache/lucene/codecs/bloom/
    BloomFilteringPostingsFormat.java + FuzzySet.java — a per-segment
    bitset over the terms so a TermQuery for an ABSENT term answers NO
    without touching the terms dictionary (the common case for fuzzy
    typo-ish traffic and cross-segment fan-out).

Spark restatement: the filter is built with ONE pass over the terms table
(mapInPandas emits per-partition partial bitsets, OR-reduced on the
driver — the bitset for millions of terms is a few MB, far below driver
limits), stored beside the segment, and consulted on the DRIVER before
any job launches: a query whose terms all miss skips the terms-dict scan
AND the postings job entirely. At 1000 segments that's the difference
between 1000 no-op jobs and zero. No false negatives ever (pytest pins
it); false positives only cost the scan that would have happened anyway.

Hashing: FNV-1a 64-bit + double hashing (h1 + i*h2 mod m), k hashes from
the target false-positive rate — standard Bloom arithmetic; Lucene's
FuzzySet uses the same one-big-bitset idea with murmur."""

from __future__ import annotations

import math
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import SparkSession


def _fnv1a64(data: bytes) -> int:
    h = 0xCBF29CE484222325
    for b in data:
        h ^= b
        h = (h * 0x100000001B3) & 0xFFFFFFFFFFFFFFFF
    return h


def _hashes(term: str, k: int, m: int) -> list[int]:
    data = term.encode("utf-8")
    h1 = _fnv1a64(data)
    h2 = _fnv1a64(data + b"\x01") | 1  # odd -> full cycle
    return [((h1 + i * h2) & 0xFFFFFFFFFFFFFFFF) % m for i in range(k)]


def _params(n_terms: int, fp: float) -> tuple[int, int]:
    n = max(n_terms, 1)
    m = max(64, int(-n * math.log(fp) / (math.log(2) ** 2)))
    m = (m + 7) // 8 * 8
    k = max(1, round(m / n * math.log(2)))
    return m, k


class TermBloom:
    """Per-segment term bloom filter (FuzzySet analog)."""

    def __init__(self, bits: np.ndarray, n_bits: int, n_hashes: int):
        self.bits = bits  # uint8 array, little-endian bit order
        self.n_bits = n_bits
        self.n_hashes = n_hashes

    def might_contain(self, term: str) -> bool:
        for h in _hashes(term, self.n_hashes, self.n_bits):
            if not (self.bits[h >> 3] >> (h & 7)) & 1:
                return False
        return True

    @classmethod
    def build(
        cls, spark: SparkSession, segment, fp: float = 0.01
    ) -> "TermBloom":
        terms = segment.table(spark, "terms").select("term")
        n_terms = max(int(segment.stats.n_terms) or terms.count(), 1)
        m, k = _params(n_terms, fp)

        def partial(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            bits = np.zeros(m // 8, dtype=np.uint8)
            any_rows = False
            for pdf in batches:
                for t in pdf["term"]:
                    any_rows = True
                    for h in _hashes(t, k, m):
                        bits[h >> 3] |= 1 << (h & 7)
            if any_rows:
                yield pd.DataFrame({"bits": [bits.tobytes()]})

        parts = terms.mapInPandas(partial, "bits binary").collect()
        acc = np.zeros(m // 8, dtype=np.uint8)
        for r in parts:
            acc |= np.frombuffer(r["bits"], dtype=np.uint8)
        return cls(acc, m, k)

    def to_bytes(self) -> bytes:
        head = self.n_bits.to_bytes(8, "little") + self.n_hashes.to_bytes(
            2, "little"
        )
        return head + self.bits.tobytes()

    @classmethod
    def from_bytes(cls, data: bytes) -> "TermBloom":
        n_bits = int.from_bytes(data[:8], "little")
        k = int.from_bytes(data[8:10], "little")
        bits = np.frombuffer(data[10:], dtype=np.uint8).copy()
        return cls(bits, n_bits, k)
