"""Phrase queries over positional postings — PhraseQuery analog.

Reference semantics being re-expressed (SURVEY.md §2.C "PhraseQuery"):
  search/PhraseQuery.java        — ordered multi-term positional match
  search/ExactPhraseMatcher.java — slop=0: positions of term_i must appear
                                   at (p + i) for a common base p
  search/SloppyPhraseMatcher.java— slop>0 (subset supported: see below)
  scoring: PhraseWeight scores like a single pseudo-term whose freq is the
  number of phrase occurrences; idf is the SUM of the phrase terms' idfs
  (BM25Similarity#idfExplain over the terms array, duplicates counted),
  tf_part uses the same byte4 norm cache as TermQuery.

Spark restatement: the positions table is (term, bucket, doc_id, norm_byte,
pos_bin) — one row per (term, doc) with delta+FOR-packed in-doc positions.
A phrase query filters that table to its distinct terms (parquet row-group
pruning on the range-partitioned ``term`` column) and scores per bucket in
applyInPandas: per candidate doc, intersect shifted position sets
(np.intersect1d chain — the vectorized leapfrog), count matches, BM25 in
float32, local top-k, then the standard global merge.

Slop support: ``slop=0`` exact only (SloppyPhraseMatcher's full algorithm
with repeats is deliberately out of scope; slop>0 raises). That matches the
dominant production use (quoted phrases).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.analysis import tokenize_text
from ..functions.packing import delta_decode, unpack_ints
from ..sources.catalog import Segment
from . import bm25

_TOPK_SCHEMA = "doc_id long, score float"


def phrase_topk(
    spark: SparkSession,
    segment: Segment,
    phrase_text: str,
    k: int = 10,
    slop: int = 0,
) -> DataFrame:
    """Top-k docs containing the exact phrase (pinned-tokenizer order)."""
    if slop != 0:
        raise NotImplementedError("only exact phrases (slop=0) are supported")
    assert segment.has_table("positions"), (
        "segment was built without positions (build_index(with_positions=True))"
    )
    terms_seq = tokenize_text(phrase_text)
    if not terms_seq:
        return spark.createDataFrame([], _TOPK_SCHEMA)
    distinct = sorted(set(terms_seq))

    # stats pre-pass (Weight analog): every phrase term must exist
    stats_df = (
        segment.table(spark, "terms")
        .filter(F.col("term").isin(distinct))
        .select("term", "df")
        .collect()
    )
    df_by_term = {r["term"]: int(r["df"]) for r in stats_df}
    if len(df_by_term) < len(distinct):
        return spark.createDataFrame([], _TOPK_SCHEMA)
    n_docs = segment.stats.n_docs
    # idf summed over ALL phrase positions (duplicates counted), float64 then
    # applied in float32 — BM25Similarity#idfExplain(collectionStats, termStats[])
    idf_sum = np.float32(sum(bm25.idf(n_docs, df_by_term[t]) for t in terms_seq))
    cache = bm25.norm_cache(segment.stats.avgdl)
    offsets_by_term: dict[str, list[int]] = {}
    for i, t in enumerate(terms_seq):
        offsets_by_term.setdefault(t, []).append(i)

    def score_bucket(pdf: pd.DataFrame) -> pd.DataFrame:
        return _phrase_score_bucket(pdf, offsets_by_term, idf_sum, cache, k)

    rows = segment.table(spark, "positions").filter(F.col("term").isin(distinct))
    per_bucket = rows.groupBy("bucket").applyInPandas(score_bucket, _TOPK_SCHEMA)
    return per_bucket.orderBy(F.desc("score"), F.asc("doc_id")).limit(k)


def _phrase_score_bucket(
    pdf: pd.DataFrame,
    offsets_by_term: dict[str, list[int]],
    idf_sum: np.float32,
    cache: np.ndarray,
    k: int,
) -> pd.DataFrame:
    """One doc-space bucket: exact-phrase freq per doc, BM25, local top-k."""
    n_terms = len(offsets_by_term)
    # candidate docs must contain every distinct term (conjunction gate)
    per_doc = pdf.groupby("doc_id", sort=False)
    out_ids, out_scores = [], []
    for doc_id, g in per_doc:
        if g["term"].nunique() < n_terms:
            continue
        pos = {
            r.term: delta_decode(unpack_ints(r.pos_bin)).astype(np.int64)
            for r in g.itertuples()
        }
        # leapfrog: start from the rarest term's (shifted) positions
        base: np.ndarray | None = None
        for t, offs in offsets_by_term.items():
            p = pos[t]
            for off in offs:
                shifted = p - off
                base = shifted if base is None else np.intersect1d(
                    base, shifted, assume_unique=True
                )
                if base.size == 0:
                    break
            if base is not None and base.size == 0:
                break
        freq = int(base.size) if base is not None else 0
        # phrase must start at a valid position (>= 0)
        if freq and base[0] < 0:
            freq = int((base >= 0).sum())
        if freq == 0:
            continue
        f = np.float32(freq)
        denom_add = cache[np.uint8(g["norm_byte"].iloc[0])]
        out_ids.append(int(doc_id))
        out_scores.append(np.float32(idf_sum * (f / (f + denom_add))))
    if not out_ids:
        return pd.DataFrame(
            {"doc_id": np.array([], dtype=np.int64), "score": np.array([], dtype=np.float32)}
        )
    ids = np.asarray(out_ids, dtype=np.int64)
    scores = np.asarray(out_scores, dtype=np.float32)
    order = np.lexsort((ids, -scores))[: min(k, ids.size)]
    return pd.DataFrame({"doc_id": ids[order], "score": scores[order]})
