"""TextLogitStream analog: logistic-regression training over the corpus.

Reference: solr/solrj/src/java/org/apache/solr/client/solrj/io/stream/
TextLogitStream.java (+ solr/core/.../handler/sql? no — the worker side is
org.apache.solr.handler.StreamHandler running iterative parallel SGD over
tf vectors; each iteration is one scatter-gather pass over the shards).

Spark-first redesign: with BINARY presence features over a fixed term list
(the shape TextLogitStream's `features` input produces), every document
collapses to one of at most 2^m feature patterns. ONE distributed
aggregation builds the (pattern, label) -> count contingency table — at
most 2^(m+1) rows regardless of corpus size — and full-batch gradient
descent then runs driver-side on that table with exact integer counts.
This is mathematically identical to per-document full-batch GD (the
gradient is a sum of per-doc terms that only depend on (pattern, label)),
deterministic to the bit (fixed iteration order over the sorted table; no
float accumulation-order dependence on partitioning), and the distributed
cost is one map-combined groupBy per TRAINING RUN, not per iteration —
strictly cheaper than the reference's pass-per-iteration design at any
scale.
"""

from __future__ import annotations

import math

from pyspark.sql import functions as F

__all__ = ["train_text_logit"]


def _sigmoid(z: float) -> float:
    # Guarded to avoid overflow for |z| > 700 (same guard both in the
    # engine and in the test oracle).
    if z >= 0:
        ez = math.exp(-z)
        return 1.0 / (1.0 + ez)
    ez = math.exp(z)
    return ez / (1.0 + ez)


def contingency_table(docs, terms: list[str], label_col):
    """(pattern, y) -> count over binary term-presence features.

    ``docs`` needs a ``tokens`` array column; ``label_col`` is a 0/1 Column.
    Returns a sorted list of (pattern:int, y:int, count:int).
    """
    pattern = F.lit(0)
    for j, t in enumerate(terms):
        pattern = pattern + F.array_contains("tokens", t).cast("int") * (1 << j)
    rows = (
        docs.select(pattern.alias("pattern"), label_col.cast("int").alias("y"))
        .groupBy("pattern", "y")
        .count()
        .collect()
    )
    return sorted((r["pattern"], r["y"], r["count"]) for r in rows)


def gd_from_table(table, m: int, iters: int = 10, lr: float = 0.5):
    """Full-batch GD on the contingency table. Returns (weights, bias,
    losses) where weights has one entry per feature.

    lr is scaled by 1/N internally (the table carries exact counts)."""
    n_total = sum(c for _, _, c in table)
    w = [0.0] * m
    b = 0.0
    losses = []
    for _ in range(iters):
        gw = [0.0] * m
        gb = 0.0
        loss = 0.0
        for pattern, y, count in table:
            z = b
            for j in range(m):
                if pattern >> j & 1:
                    z += w[j]
            p = _sigmoid(z)
            err = (p - y) * count
            gb += err
            for j in range(m):
                if pattern >> j & 1:
                    gw[j] += err
            # cross-entropy, clamped away from log(0)
            pc = min(max(p, 1e-12), 1 - 1e-12)
            loss -= count * (y * math.log(pc) + (1 - y) * math.log(1 - pc))
        step = lr / n_total
        for j in range(m):
            w[j] -= step * gw[j]
        b -= step * gb
        losses.append(loss / n_total)
    return w, b, losses


def train_text_logit(
    docs,
    terms: list[str],
    label_col,
    iters: int = 10,
    lr: float = 0.5,
):
    """Train and return ({term: weight}, bias, losses, error_rate).

    error_rate is the training 0/1 error of the final weights, computed
    exactly from the same contingency table (no second scan)."""
    table = contingency_table(docs, terms, label_col)
    w, b, losses = gd_from_table(table, len(terms), iters=iters, lr=lr)
    n_total = sum(c for _, _, c in table)
    wrong = 0
    for pattern, y, count in table:
        z = b + sum(w[j] for j in range(len(terms)) if pattern >> j & 1)
        pred = 1 if z >= 0 else 0
        if pred != y:
            wrong += count
    return dict(zip(terms, w)), b, losses, wrong / n_total
