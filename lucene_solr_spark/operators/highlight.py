"""Snippet highlighting from positional postings — UnifiedHighlighter analog.

Reference shape being re-expressed (SURVEY.md §2 "Highlighting"):
  lucene/highlighter/.../uhighlight/UnifiedHighlighter.java with
  OffsetSource.POSTINGS / term vectors: highlights are computed from the
  INDEX, not by re-analyzing stored text.

Spark restatement: the positions table (term, bucket, doc_id, norm_byte,
pos_bin) holds every term's in-doc positions, so a doc's full token stream
is reconstructable index-side (tests/test_phrase.py pins the round-trip).
For the requested doc_ids (typically one page of top-k hits — tens of
rows), fetch their position rows, rebuild the token arrays per doc in one
applyInPandas leaf, pick up to ``max_snippets`` non-overlapping windows of
``window`` tokens around query-term hits (best-first by hit density), and
render with pre/post markers. Display-time operation over k docs — the
scan is bounded by the hit page, never the corpus.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.analysis import tokenize_text
from ..functions.packing import delta_decode, unpack_ints
from ..sources.catalog import Segment

_SCHEMA = "doc_id long, n_hits int, snippet string"


def highlight(
    spark: SparkSession,
    segment: Segment,
    query_text: str,
    doc_ids: list[int],
    window: int = 7,
    max_snippets: int = 2,
    pre: str = "<em>",
    post: str = "</em>",
) -> DataFrame:
    """Per-doc snippets for ``doc_ids``: (doc_id, n_hits, snippet) where
    snippet joins up to ``max_snippets`` windows with ' ... '."""
    assert segment.has_table("positions"), "highlighting needs positions"
    q_terms = set(tokenize_text(query_text))
    if not q_terms or not doc_ids:
        return spark.createDataFrame([], _SCHEMA)
    rows = segment.table(spark, "positions").filter(
        F.col("doc_id").isin([int(d) for d in doc_ids])
    )

    def _one_doc(pdf: pd.DataFrame) -> pd.DataFrame:
        out = []
        for doc_id, g in pdf.groupby("doc_id", sort=False):
            toks: dict[int, str] = {}
            hits: list[int] = []
            for r in g.itertuples():
                pos = delta_decode(unpack_ints(r.pos_bin)).astype(np.int64)
                for p in pos:
                    toks[int(p)] = r.term
                if r.term in q_terms:
                    hits.extend(int(p) for p in pos)
            if not hits:
                continue
            hits.sort()
            n = max(toks) + 1
            # greedy non-overlapping windows, earliest-first (the reference's
            # default passage order for equal scores)
            spans: list[tuple[int, int]] = []
            for h in hits:
                lo, hi = max(0, h - window // 2), min(n - 1, h + window // 2)
                if spans and lo <= spans[-1][1]:
                    spans[-1] = (spans[-1][0], max(spans[-1][1], hi))
                else:
                    if len(spans) == max_snippets:
                        break
                    spans.append((lo, hi))
            parts = []
            for lo, hi in spans:
                words = []
                for p in range(lo, hi + 1):
                    w = toks.get(p, "")
                    if w in q_terms:
                        w = f"{pre}{w}{post}"
                    words.append(w)
                parts.append(" ".join(words))
            out.append((int(doc_id), len(hits), " ... ".join(parts)))
        return pd.DataFrame(out, columns=["doc_id", "n_hits", "snippet"])

    return rows.groupBy("doc_id").applyInPandas(
        lambda key, pdf: _one_doc(pdf), _SCHEMA
    ).orderBy("doc_id")


def highlight_topk(
    spark: SparkSession,
    segment: Segment,
    searcher,
    query_text: str,
    k: int = 10,
    **kw,
) -> DataFrame:
    """Top-k search + snippets in one call (the common UI shape): two-phase
    retrieval — ids from the scorer, snippets only for the page."""
    hits = searcher.topk(query_text, k=k)
    ids = [int(r["doc_id"]) for r in hits.collect()]
    snips = highlight(spark, segment, query_text, ids, **kw)
    return hits.join(snips, "doc_id", "left").orderBy(
        F.desc("score"), F.asc("doc_id")
    )
