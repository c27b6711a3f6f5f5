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
    rank_passages: bool = False,
) -> DataFrame:
    """Per-doc snippets for ``doc_ids``: (doc_id, n_hits, snippet) where
    snippet joins up to ``max_snippets`` windows with ' ... '.

    ``rank_passages=False`` keeps the earliest-first greedy windows (the
    engine row's pinned behavior). ``rank_passages=True`` is the
    UnifiedHighlighter PassageScorer analog: candidate windows centered
    on each hit are scored by the sum of the hit terms' idfs inside the
    window (rarer query terms dominate passage choice), the top
    ``max_snippets`` non-overlapping passages win (score desc, start asc
    tie-break), and render in document order."""
    assert segment.has_table("positions"), "highlighting needs positions"
    q_terms = set(tokenize_text(query_text))
    if not q_terms or not doc_ids:
        return spark.createDataFrame([], _SCHEMA)
    idf_by_term: dict[str, float] = {}
    if rank_passages:
        from . import bm25

        stats = (
            segment.table(spark, "terms")
            .filter(F.col("term").isin(sorted(q_terms)))
            .select("term", "df")
            .collect()
        )
        n_docs = segment.stats.n_docs
        idf_by_term = {
            r["term"]: bm25.idf(n_docs, int(r["df"])) for r in stats
        }
    rows = segment.table(spark, "positions").filter(
        F.col("doc_id").isin([int(d) for d in doc_ids])
    )

    def _one_doc(pdf: pd.DataFrame) -> pd.DataFrame:
        from ..functions.synonyms import FRESH_BASE, flatten_starts

        graph = "end_bin" in pdf.columns and pdf["end_bin"].notna().any()
        out = []
        for doc_id, g in pdf.groupby("doc_id", sort=False):
            toks: dict[int, str] = {}
            span_toks: dict[int, str] = {}  # graph: non-trivial edges
            hits: list[int] = []
            for r in g.itertuples():
                pos = delta_decode(unpack_ints(r.pos_bin)).astype(np.int64)
                if graph:
                    # synonym-graph index: rebuild the DISPLAY stream from
                    # original-boundary edges; TRIVIAL edges (i -> i+1, the
                    # document's own tokens) always win over injected
                    # boundary-spanning outputs (e.g. a contraction 'ny'
                    # over 'new york') — deterministic regardless of row
                    # order. Fresh-node chain tokens are never displayed.
                    # Hits use flattened positions so a synonym match
                    # highlights the region of the original token it spans.
                    ends = unpack_ints(r.end_bin).astype(np.int64)
                    for p, e in zip(pos, ends):
                        if p < FRESH_BASE and e < FRESH_BASE:
                            if e == p + 1:
                                toks[int(p)] = r.term
                            else:
                                span_toks[int(p)] = r.term
                    if r.term in q_terms:
                        hits.extend(int(x) for x in flatten_starts(pos))
                else:
                    for p in pos:
                        toks[int(p)] = r.term
                    if r.term in q_terms:
                        hits.extend(int(p) for p in pos)
            if span_toks:
                # replacement rules consume their originals: fill display
                # gaps with the spanning output, never overwrite a real token
                for p, t in span_toks.items():
                    toks.setdefault(p, t)
            if not hits or not toks:
                continue
            n = max(toks) + 1
            # clamp: flattened chain positions can run past the original
            # token range when an injected output is longer than its input
            hits = sorted(min(h, n - 1) for h in hits)
            if rank_passages:
                # PassageScorer analog: score candidate windows by summed
                # idf of contained hits; top-N non-overlapping, rendered
                # in doc order
                hitset = set(hits)
                cands: list[tuple[float, int, int]] = []
                for h in hits:
                    lo = max(0, h - window // 2)
                    hi = min(n - 1, h + window // 2)
                    sc = sum(
                        idf_by_term.get(toks.get(p, ""), 0.0)
                        for p in range(lo, hi + 1)
                        if p in hitset
                    )
                    cands.append((sc, lo, hi))
                cands.sort(key=lambda c: (-c[0], c[1]))
                spans = []
                for _, lo, hi in cands:
                    if any(lo <= e and hi >= s for s, e in spans):
                        continue
                    spans.append((lo, hi))
                    if len(spans) == max_snippets:
                        break
                spans.sort()
            else:
                # greedy non-overlapping windows, earliest-first (the
                # reference's default passage order for equal scores)
                spans = []
                for h in hits:
                    lo, hi = max(0, h - window // 2), min(n - 1, h + window // 2)
                    if spans and lo <= spans[-1][1]:
                        spans[-1] = (spans[-1][0], max(spans[-1][1], hi))
                    else:
                        if len(spans) == max_snippets:
                            break
                        spans.append((lo, hi))
            # emphasis marks the HIT POSITIONS (offset semantics — on a
            # plain index identical to marking query-term tokens; on a
            # graph index the synonym-matched region gets marked even
            # though the displayed word is the document's own token)
            hitset_render = set(hits)
            parts = []
            for lo, hi in spans:
                words = []
                for p in range(lo, hi + 1):
                    w = toks.get(p, "")
                    if w in q_terms or p in hitset_render:
                        w = f"{pre}{w}{post}" if w else w
                    words.append(w)
                parts.append(" ".join(words))
            out.append((int(doc_id), len(hits), " ... ".join(parts)))
        return pd.DataFrame(out, columns=["doc_id", "n_hits", "snippet"])

    return rows.groupBy("doc_id").applyInPandas(
        lambda key, pdf: _one_doc(pdf), _SCHEMA
    ).orderBy("doc_id")


def highlight_offsets(
    spark: SparkSession,
    segment: Segment,
    query_text: str,
    doc_ids: list[int] | None = None,
    context: int = 20,
    pre: str = "<em>",
    post: str = "</em>",
) -> DataFrame:
    """OFFSET-based highlighting — the UnifiedHighlighter production path
    (uhighlight/UnifiedHighlighter.java OffsetSource.POSTINGS with
    IndexOptions...AND_OFFSETS; CompressingTermVectorsWriter stores the
    same offsets for the tv route).

    The snippet is sliced from the STORED ORIGINAL text at the first
    hit's (start_char, end_char) decoded from the index (soff_bin /
    eoff_bin — requires an offsets build), with ``context`` chars either
    side; the display is never re-tokenized, so analysis transforms
    (lowercasing, camelCase/underscore splits, stemming) cannot corrupt
    the char span — the exact failure mode of reconstruction-based
    display (tests/test_offsets.py pins a case where re-tokenized display
    gets the span wrong and offsets get it right).

    Returns (doc_id, n_hits, start_off, end_off, snippet), one row per
    matching doc. Decode touches only the query terms' position rows
    (term-pushdown into the positions scan); the render is pure JVM
    Column slicing over the k-doc page — display-time cost, never a
    corpus scan.
    """
    assert segment.has_table("positions"), "offset highlighting needs positions"
    q_terms = sorted(set(tokenize_text(query_text)))
    if not q_terms:
        return spark.createDataFrame(
            [], "doc_id long, n_hits long, start_off long, end_off long, snippet string"
        )
    rows = segment.table(spark, "positions").filter(F.col("term").isin(q_terms))
    if doc_ids is not None:
        if not doc_ids:
            return spark.createDataFrame(
                [],
                "doc_id long, n_hits long, start_off long, end_off long, snippet string",
            )
        bd = segment.stats.bucket_docs
        rows = rows.filter(
            F.col("bucket").isin(*sorted({int(d) // bd for d in doc_ids}))
            & F.col("doc_id").isin([int(d) for d in doc_ids])
        )
    if "soff_bin" not in rows.columns:
        raise ValueError(
            "segment has no stored offsets; build with with_offsets=True"
        )

    def _decode(batches):
        for pdf in batches:
            out = {"doc_id": [], "start_off": [], "end_off": []}
            for r in pdf.itertuples():
                starts = delta_decode(unpack_ints(r.soff_bin)).astype(np.int64)
                lens = unpack_ints(r.eoff_bin).astype(np.int64)
                out["doc_id"].extend([int(r.doc_id)] * len(starts))
                out["start_off"].extend(starts.tolist())
                out["end_off"].extend((starts + lens).tolist())
            yield pd.DataFrame(out)

    hits = (
        rows.select("doc_id", "soff_bin", "eoff_bin")
        .mapInPandas(_decode, "doc_id long, start_off long, end_off long")
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_hits"),
            F.min(F.struct("start_off", "end_off")).alias("first"),
        )
        .select(
            "doc_id", "n_hits",
            F.col("first.start_off").alias("start_off"),
            F.col("first.end_off").alias("end_off"),
        )
    )
    stored = segment.table(spark, "docmap").select("doc_id", "content")
    ctx = int(context)
    snippet = F.concat(
        F.expr(
            f"substring(content, greatest(start_off - {ctx} + 1, 1), "
            f"least(start_off, {ctx}))"
        ),
        F.lit(pre),
        F.expr("substring(content, start_off + 1, end_off - start_off)"),
        F.lit(post),
        F.expr(f"substring(content, end_off + 1, {ctx})"),
    )
    return (
        stored.join(F.broadcast(hits), "doc_id")
        .select("doc_id", "n_hits", "start_off", "end_off", snippet.alias("snippet"))
        .orderBy("doc_id")
    )


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
