"""DisMax multi-field scoring — the DisjunctionMaxQuery / Solr (e)dismax
query parser analog.

Reference surface being re-expressed (SURVEY.md §2.J; paths relative to
the reference layout):
  search/DisjunctionMaxQuery.java        — per-term max over fields,
                                           tie * (sum - max) added back
  solr/core/.../search/DisMaxQParserPlugin.java, ExtendedDismaxQParser.java
                                           — user query across qf fields
                                           with per-field boosts

Model: one segment per field, built from the SAME doc-id-assigned corpus
(identical ``bucket_docs``) so every field's postings share the doc-space
bucketing — the per-bucket leaf sees all fields of a doc range at once
with no shuffle join (the union just tags rows with their field).

Scoring (pinned, float32 like the rest of the engine):
  score(doc) = sum over query terms t (lexicographic order) of
      dismax_t = max_f s_{f,t} + tie * (sum_f s_{f,t} - max_f s_{f,t})
  where s_{f,t} = BM25(field f's idf/avgdl/norms) * qf_boost_f, computed
  float32; field reduction order is sorted(qf). A doc matches if any
  field matches any term (pure disjunction; Solr's mm applies upstream).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.analysis import tokenize_text
from ..sources.catalog import Segment
from . import bm25
from .search import _decode_block

_TOPK_SCHEMA = "doc_id long, score float"


def dismax_topk(
    spark: SparkSession,
    segments: dict[str, Segment],
    query_text: str,
    qf: dict[str, float],
    tie: float = 0.0,
    k: int = 10,
) -> DataFrame:
    """Top-k DisMax across the ``qf`` fields (field -> boost). Every
    field's segment must come from the same doc-id-assigned corpus with
    the same bucket_docs (asserted)."""
    fields = sorted(qf)
    assert fields and all(f in segments for f in fields), "qf field missing a segment"
    bd = {segments[f].stats.bucket_docs for f in fields}
    assert len(bd) == 1, f"segments disagree on bucket_docs: {bd}"

    q_terms = sorted(set(tokenize_text(query_text)))
    if not q_terms:
        return spark.createDataFrame([], _TOPK_SCHEMA)

    idfs: dict[tuple[str, str], np.float32] = {}
    caches = {}
    for f in fields:
        seg = segments[f]
        caches[f] = bm25.norm_cache(seg.stats.avgdl)
        rows = (
            seg.table(spark, "terms")
            .filter(F.col("term").isin(q_terms))
            .select("term", "df")
            .collect()
        )
        for r in rows:
            idfs[(f, r["term"])] = np.float32(
                bm25.idf(seg.stats.n_docs, int(r["df"]))
            )
    if not idfs:
        return spark.createDataFrame([], _TOPK_SCHEMA)
    matched_terms = sorted({t for (_, t) in idfs})
    boosts = {f: np.float32(qf[f]) for f in fields}
    tie32 = np.float32(tie)

    def score_bucket(pdf: pd.DataFrame) -> pd.DataFrame:
        base = int(pdf["first_doc"].min())
        span = int(pdf["last_doc"].max()) - base + 1
        per: dict[tuple[str, str], tuple[np.ndarray, np.ndarray]] = {}
        for (f, t), g in pdf.groupby(["field", "term"], sort=False):
            sarr = np.zeros(span, dtype=np.float32)
            marr = np.zeros(span, dtype=bool)
            for row in g.itertuples():
                ids, freqs, norms = _decode_block(row)
                rel = ids - base
                sarr[rel] = bm25.score_block(freqs, norms, idfs[(f, t)], caches[f])
                marr[rel] = True
            per[(f, t)] = (
                (sarr * boosts[f]).astype(np.float32),
                marr,
            )
        acc = np.zeros(span, dtype=np.float32)
        hit = np.zeros(span, dtype=bool)
        for t in matched_terms:  # lexicographic accumulation (pinned)
            fs = [per[(f, t)] for f in fields if (f, t) in per]
            if not fs:
                continue
            if len(fs) == 1:
                s, m = fs[0]
            else:
                stack = np.stack([sv for sv, _ in fs])
                mx = stack.max(axis=0)
                sm = np.zeros_like(mx)
                for sv, _ in fs:  # sequential in field order (pinned float32)
                    sm += sv
                s = (mx + tie32 * (sm - mx)).astype(np.float32)
                m = np.logical_or.reduce([mv for _, mv in fs])
            acc += s
            hit |= m
        nz = np.nonzero(hit)[0]
        if nz.size == 0:
            return pd.DataFrame(
                {"doc_id": np.array([], dtype=np.int64),
                 "score": np.array([], dtype=np.float32)}
            )
        scores = acc[nz]
        order = np.lexsort((nz, -scores))[: min(k, nz.size)]
        return pd.DataFrame(
            {"doc_id": (nz[order] + base).astype(np.int64),
             "score": scores[order]}
        )

    parts = []
    for f in fields:
        parts.append(
            segments[f]
            .table(spark, "postings")
            .filter(F.col("term").isin(matched_terms))
            .withColumn("field", F.lit(f))
        )
    u = parts[0]
    for p in parts[1:]:
        u = u.unionByName(p)
    per_bucket = u.groupBy("bucket").applyInPandas(score_bucket, _TOPK_SCHEMA)
    return per_bucket.orderBy(F.desc("score"), F.asc("doc_id")).limit(k)
