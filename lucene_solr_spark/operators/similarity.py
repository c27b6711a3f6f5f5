"""Pluggable similarities — search/similarities/Similarity.java analog.

The scorer stage (operators/search.py) is parameterized by a Similarity:
per-term weight from corpus stats + a vectorized per-block score over
(freqs, norm bytes). BM25 (the default, with block-max WAND support) lives
in operators/bm25.py; here are the alternatives from
search/similarities/*.java that the reference registers:

- ClassicSimilarity (TFIDFSimilarity.java, ClassicSimilarity.java):
  score = tf * idf^2 * lengthNorm, tf = sqrt(freq),
  idf = 1 + ln((N+1)/(df+1)), lengthNorm = 1/sqrt(dl) (byte-quantized).
- LMDirichletSimilarity (LMDirichletSimilarity.java):
  score = log(1 + freq/(mu*p(t|C))) + log(mu/(dl+mu)), mu=2000,
  p(t|C) = ttf/total_tokens; negative scores clamp to 0 (the reference
  returns max(score, 0) per #score).
- BooleanSimilarity (BooleanSimilarity.java): constant boost per match.

Only BM25 participates in block-max WAND (its impacts (max_freq, min_dl)
bound the formula monotonically; LMDirichlet's dl term is not covered by
the stored impacts) — the Searcher enforces exhaustive mode for others,
matching the reference where impacts/WAND are wired to the default
similarity's score shape.
"""

from __future__ import annotations

import math

import numpy as np

from ..functions.smallfloat import BYTE4_DECODE_TABLE


class Similarity:
    """Interface: weight(N, df, ttf, sum_ttf) -> per-term state;
    score_block(freqs, norm_bytes, state) -> float32 scores."""

    name = "base"
    supports_wand = False

    def prepare(self, n_docs: int, avgdl: float) -> None:  # noqa: D401
        self.n_docs = n_docs
        self.avgdl = avgdl

    def weight(self, df: int, ttf: int, sum_ttf: int) -> dict:
        raise NotImplementedError

    def score_block(
        self, freqs: np.ndarray, norm_bytes: np.ndarray, state: dict
    ) -> np.ndarray:
        raise NotImplementedError


class ClassicSimilarity(Similarity):
    """TF-IDF: sqrt(tf) * idf^2 * 1/sqrt(dl), float32, dl byte-quantized."""

    name = "classic"

    def weight(self, df: int, ttf: int, sum_ttf: int) -> dict:
        idf = 1.0 + math.log((self.n_docs + 1) / (df + 1))
        return {"idf2": np.float32(idf * idf)}

    def score_block(self, freqs, norm_bytes, state):
        dl = BYTE4_DECODE_TABLE[np.asarray(norm_bytes, dtype=np.uint8)].astype(
            np.float32
        )
        norm = np.float32(1.0) / np.sqrt(np.maximum(dl, np.float32(1.0)))
        tf = np.sqrt(freqs.astype(np.float32))
        return (tf * state["idf2"] * norm).astype(np.float32)


class LMDirichletSimilarity(Similarity):
    """Dirichlet-smoothed query likelihood, mu=2000, clamped at 0."""

    name = "lmdirichlet"

    def __init__(self, mu: float = 2000.0):
        self.mu = mu

    def weight(self, df: int, ttf: int, sum_ttf: int) -> dict:
        p_c = ttf / max(sum_ttf, 1)
        return {"mu_pc": np.float32(self.mu * p_c)}

    def score_block(self, freqs, norm_bytes, state):
        dl = BYTE4_DECODE_TABLE[np.asarray(norm_bytes, dtype=np.uint8)].astype(
            np.float32
        )
        f = freqs.astype(np.float32)
        s = np.log1p(f / state["mu_pc"]) + np.log(
            np.float32(self.mu) / (dl + np.float32(self.mu))
        )
        return np.maximum(s, np.float32(0.0)).astype(np.float32)


class BooleanSimilarity(Similarity):
    """Constant score per matching term (BooleanSimilarity.java)."""

    name = "boolean"

    def __init__(self, boost: float = 1.0):
        self.boost = np.float32(boost)

    def weight(self, df: int, ttf: int, sum_ttf: int) -> dict:
        return {}

    def score_block(self, freqs, norm_bytes, state):
        return np.full(len(freqs), self.boost, dtype=np.float32)


class LMJelinekMercerSimilarity(Similarity):
    """Jelinek-Mercer smoothed query likelihood
    (search/similarities/LMJelinekMercerSimilarity.java):
    score = log(1 + ((1-lambda) * freq/dl) / (lambda * p(t|C))),
    p(t|C) = ttf/total_tokens, lambda=0.1 (the reference's short-query
    default). Always >= 0 (log1p of a non-negative ratio)."""

    name = "lmjelinekmercer"

    def __init__(self, lam: float = 0.1):
        self.lam = lam

    def weight(self, df: int, ttf: int, sum_ttf: int) -> dict:
        p_c = ttf / max(sum_ttf, 1)
        return {"ratio": np.float32((1.0 - self.lam) / (self.lam * p_c))}

    def score_block(self, freqs, norm_bytes, state):
        dl = BYTE4_DECODE_TABLE[np.asarray(norm_bytes, dtype=np.uint8)].astype(
            np.float32
        )
        f = freqs.astype(np.float32)
        return np.log1p(state["ratio"] * f / np.maximum(dl, np.float32(1.0))).astype(
            np.float32
        )


class DFRSimilarity(Similarity):
    """Divergence-from-randomness, combo I(n)L2
    (search/similarities/DFRSimilarity.java with BasicModelIn +
    AfterEffectL + NormalizationH2, c=1):
      tfn   = freq * log2(1 + c * avgdl / dl)          (H2)
      score = (1 / (tfn + 1)) * tfn * log2((N+1)/(df+0.5))   (L * In)
    Always >= 0."""

    name = "dfr_inl2"

    def __init__(self, c: float = 1.0):
        self.c = c

    def weight(self, df: int, ttf: int, sum_ttf: int) -> dict:
        basic = math.log2((self.n_docs + 1) / (df + 0.5))
        return {"basic": np.float32(basic)}

    def score_block(self, freqs, norm_bytes, state):
        dl = BYTE4_DECODE_TABLE[np.asarray(norm_bytes, dtype=np.uint8)].astype(
            np.float32
        )
        f = freqs.astype(np.float32)
        tfn = f * np.log2(
            np.float32(1.0)
            + np.float32(self.c) * np.float32(self.avgdl) / np.maximum(dl, np.float32(1.0))
        ).astype(np.float32)
        return (state["basic"] * tfn / (tfn + np.float32(1.0))).astype(np.float32)


class IBSimilarity(Similarity):
    """Information-based model, combo LL·DF·H2
    (search/similarities/IBSimilarity.java with DistributionLL +
    LambdaDF + NormalizationH2, c=1):
      tfn    = freq * log2(1 + c * avgdl / dl)     (H2, same as DFR)
      lambda = (df + 1) / (N + 1)                  (LambdaDF)
      score  = -log(lambda / (tfn + lambda)) = log1p(tfn / lambda)  (LL)
    Always >= 0."""

    name = "ib_ll"

    def __init__(self, c: float = 1.0):
        self.c = c

    def weight(self, df: int, ttf: int, sum_ttf: int) -> dict:
        lam = (df + 1.0) / (self.n_docs + 1.0)
        return {"lam": np.float32(lam)}

    def score_block(self, freqs, norm_bytes, state):
        dl = BYTE4_DECODE_TABLE[np.asarray(norm_bytes, dtype=np.uint8)].astype(
            np.float32
        )
        f = freqs.astype(np.float32)
        tfn = f * np.log2(
            np.float32(1.0)
            + np.float32(self.c) * np.float32(self.avgdl) / np.maximum(dl, np.float32(1.0))
        ).astype(np.float32)
        return np.log1p(tfn / state["lam"]).astype(np.float32)


SIMILARITIES = {
    "classic": ClassicSimilarity,
    "lmdirichlet": LMDirichletSimilarity,
    "boolean": BooleanSimilarity,
    "lmjelinekmercer": LMJelinekMercerSimilarity,
    "dfr_inl2": DFRSimilarity,
    "ib_ll": IBSimilarity,
}
