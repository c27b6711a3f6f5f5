"""Semantic pins for the coverage16 batch: the fuzzy profile signature is
reorder-invariant (where the exact signature is not), version-constraint
convergence is replay-order independent, nullPolicy=collapse forms one
null group, and the drill rollup's output is globally ordered with a
range route and no final agg exchange."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

import __spark_entry__ as entry_mod  # noqa: F401  (registers the catalog)
from lucene_solr_spark.plans import coverage16_queries as c16

from .conftest import SF_DIR


def _tps_sig(text: str) -> str:
    """Scalar mirror of the pinned TextProfileSignature spec."""
    import hashlib
    from collections import Counter

    from lucene_solr_spark.functions.analysis import tokenize_text

    freq = Counter(tokenize_text(text))
    maxfreq = max(freq.values())
    quant = round(maxfreq * c16._TPS_RATE)
    if quant < 2:
        quant = 2 if maxfreq > 4 else 1
    kept = {t: (f // quant) * quant for t, f in freq.items() if f >= quant}
    ordered = sorted(kept.items(), key=lambda kv: (-kv[1], kv[0]))
    profile = " ".join(f"{t} {q}" for t, q in ordered)
    return hashlib.md5(profile.encode()).hexdigest()


def test_text_profile_reorder_invariant(spark):
    """Token reorder changes the exact (prefix) signature but NOT the
    profile signature — the reason TextProfileSignature exists."""
    text = "spark join order batch window join spark spark"
    shuffled = "join spark window spark batch order spark join"
    assert _tps_sig(text) == _tps_sig(shuffled)
    assert text.split()[:3] != shuffled.split()[:3]  # prefix sig would differ


def test_text_profile_quant_drops_rare_terms():
    """With maxFreq > 4 the quant floor is 2, so hapax terms drop out."""
    text = " ".join(["spark"] * 6 + ["rare"])
    sig_with = _tps_sig(text)
    sig_without = _tps_sig(" ".join(["spark"] * 6))
    assert sig_with == sig_without  # 'rare' (freq 1 < quant 2) ignored


def test_text_profile_counts(spark):
    row = c16.text_profile_signature(spark, SF_DIR).first()
    n_docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").count()
    assert row.n_docs == n_docs
    assert 1 <= row.n_profiles <= n_docs
    assert row.n_max_cluster >= 1


def test_version_constraints_replay_order_independent(spark):
    """Applying the same updates in shuffled arrival order converges to
    the same winners (the processor's whole contract)."""
    rows = c16.doc_version_constraints(spark, SF_DIR).collect()
    o = spark.read.parquet(f"{SF_DIR}/orders.parquet")
    # reversed arrival order: same arg-max result
    shuffled = o.orderBy(F.desc("o_orderkey"))
    again = (
        shuffled.groupBy(F.col("o_custkey").alias("id"))
        .agg(
            F.max(
                F.struct(
                    F.col("o_orderkey").alias("version"),
                    F.col("o_totalprice").alias("payload"),
                )
            ).alias("win")
        )
        .select("id", "win.version", "win.payload")
        .orderBy(F.desc("version"), F.asc("id"))
        .limit(10)
        .collect()
    )
    assert [(r.id, r.version, r.payload) for r in rows] == [
        (r.id, r.version, r.payload) for r in again
    ]
    assert any(r.n_dropped > 0 for r in rows)  # older versions really dropped


def test_collapse_policies_contrast(spark):
    """collapse vs expand differ EXACTLY on the null-key docs: expand
    keeps each, collapse keeps one."""
    collapse = c16.collapse_null_policy_collapse(spark, SF_DIR).collect()
    null_rows = [r for r in collapse if r.grp is None]
    assert len(null_rows) == 1  # ONE collective null group
    d = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    n_null = d.filter(F.col("lang") == "de").count()
    assert n_null > 1  # the contrast is real at this sf
    # the survivor is the min-n_chars null doc
    best = (
        d.filter(F.col("lang") == "de")
        .orderBy(F.asc("n_chars"), F.asc("doc_id"))
        .first()
    )
    assert null_rows[0].doc_id == best.doc_id


def test_drill_output_globally_ordered_no_final_agg(spark):
    from lucene_solr_spark.streaming.parallel import drill_rollup

    o = spark.read.parquet(f"{SF_DIR}/orders.parquet")
    rolled = drill_rollup(o, "o_custkey", ["o_totalprice"], workers=4)
    keys = [r.o_custkey for r in rolled.collect()]
    assert keys == sorted(keys)  # global order by construction
    assert len(keys) == len(set(keys))  # each key on exactly one shard
    plan = rolled._jdf.queryExecution().executedPlan().toString()
    assert "rangepartitioning" in plan.lower()
    assert "HashAggregate" not in plan and "SortAggregate" not in plan