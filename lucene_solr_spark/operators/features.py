"""FeatureField — static per-doc feature boosts combined with BM25.

Reference semantics being re-expressed (SURVEY.md §2.F):
  lucene/core/src/java/org/apache/lucene/document/FeatureField.java —
  per-doc static features (pagerank, recency, quality, ...) indexed so
  they can JOIN the score, with three pinned scoring functions:
    LogFunction:        w * ln(a + S)
    SaturationFunction: w * S / (S + a)
    SigmoidFunction:    w * S^a / (S^a + k^a)
  and the final score = query score + feature score (the feature rides a
  SHOULD clause). Lucene quantizes S into the term-frequency slot (9
  significant bits); Spark-first there is no need — features are a plain
  float32 parquet column (doc values), exact.

Spark restatement: the features frame (doc_id, feature, value) is
filtered to the requested feature (predicate pushdown to the scan),
transformed by the scoring function as a JVM-side Column expression in
float32, and joined onto the BM25 ranking BEFORE the global top-k — a
broadcast-sized per-bucket join at query time. The f32 op order
(boost = f32(w) * fn_f32(S), total = f32(bm25 + boost)) is pinned by the
driver oracle.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F


def log_feature(value: Column, weight: float, a: float) -> Column:
    """w * ln(a + S) in float32 (FeatureField$LogFunction)."""
    return (
        F.lit(float(weight)).cast("float")
        * F.log(F.lit(float(a)).cast("float") + value.cast("float")).cast("float")
    ).cast("float")


def saturation_feature(value: Column, weight: float, a: float) -> Column:
    """w * S/(S+a) in float32 (FeatureField$SaturationFunction)."""
    s = value.cast("float")
    return (
        F.lit(float(weight)).cast("float") * (s / (s + F.lit(float(a)).cast("float")).cast("float"))
    ).cast("float")


def sigmoid_feature(value: Column, weight: float, a: float, k: float) -> Column:
    """w * S^a/(S^a + k^a) in float32 (FeatureField$SigmoidFunction)."""
    sa = F.pow(value.cast("float"), F.lit(float(a))).cast("float")
    ka = float(np.float32(float(k) ** float(a)))
    return (
        F.lit(float(weight)).cast("float")
        * (sa / (sa + F.lit(ka).cast("float")).cast("float"))
    ).cast("float")


FEATURE_FNS = {
    "log": log_feature,
    "saturation": saturation_feature,
    "sigmoid": sigmoid_feature,
}


def feature_boost_topk(
    spark: SparkSession,
    searcher,
    query: str,
    features: DataFrame,
    feature: str,
    fn: str = "saturation",
    k: int = 10,
    weight: float = 1.0,
    **params,
) -> DataFrame:
    """BM25 top-k for ``query`` re-ranked by a static feature clause:
    total = f32(bm25 + feature_score); docs missing the feature get no
    boost (SHOULD semantics). The BM25 side keeps its per-bucket pruning;
    candidates are over-fetched (4k) before the boost so a boost cannot
    promote a doc the text query would have pruned out of reach — the
    standard rescoring window, size documented in the row."""
    base = searcher.topk(query, k=max(4 * k, 40), mode="exhaustive")
    feat = features.filter(F.col("feature") == feature).select(
        "doc_id", F.col("value").cast("float").alias("_fv")
    )
    boost = FEATURE_FNS[fn](F.col("_fv"), weight, **params)
    return (
        base.join(F.broadcast(feat), "doc_id", "left")
        .withColumn(
            "score",
            (
                F.col("score").cast("float")
                + F.coalesce(boost, F.lit(0.0).cast("float"))
            ).cast("float"),
        )
        .select("doc_id", "score")
        .orderBy(F.desc("score"), F.asc("doc_id"))
        .limit(k)
    )
