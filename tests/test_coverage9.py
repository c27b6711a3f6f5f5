"""Semantic + physical-plan pins for the coverage9 batch (cross-engine
parity is in the driver-contract mirror; these pin what parity alone
wouldn't catch): single-shuffle GROUPING SETS for pivot stats, broadcast
id-batch fetch, graphTerms df screening, demote-vs-exclude semantics,
expression codegen (no Python stage), and split-half conservation."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

import __spark_entry__ as entry_mod

from .conftest import SF_DIR

Q = entry_mod.queries()


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_pivot_facet_stats_single_shuffle(spark):
    """GROUPING SETS must compute every pivot level in ONE pass: exactly
    one Expand node and one aggregation exchange — not one re-query per
    pivot node like the reference's PivotFacetProcessor."""
    df = Q["pivot_facet_stats"](spark, SF_DIR)
    plan = _plan(df)
    assert plan.count("Expand") >= 1, plan
    body = plan.split("TakeOrderedAndProject")[-1] if "TakeOrderedAndProject" in plan else plan
    # exchanges: one for the agg, plus the final sort's range exchange
    n_exchanges = body.count("Exchange hashpartitioning")
    assert n_exchanges == 1, f"expected 1 hash exchange, got {n_exchanges}:\n{plan}"


def test_pivot_facet_stats_levels_consistent(spark):
    rows = Q["pivot_facet_stats"](spark, SF_DIR).collect()
    lvl1 = {r.lang: r for r in rows if r.source is None}
    lvl2 = {}
    for r in rows:
        if r.source is not None:
            lvl2.setdefault(r.lang, []).append(r)
    assert set(lvl1) == set(lvl2)
    for lang, children in lvl2.items():
        assert lvl1[lang].n_docs == sum(c.n_docs for c in children)
        assert lvl1[lang].sum_chars == sum(c.sum_chars for c in children)
        assert lvl1[lang].min_chars == min(c.min_chars for c in children)
        assert lvl1[lang].max_chars == max(c.max_chars for c in children)


def test_fetch_stream_broadcasts_the_id_batch(spark):
    """FetchStream's batched id lookup must be a broadcast hash join —
    the wide stored-fields side never shuffles."""
    plan = _plan(Q["fetch_stream_enrich"](spark, SF_DIR))
    assert "BroadcastHashJoin" in plan, plan


def test_graph_terms_drops_hot_terms(spark):
    """At sf0.001 the screen must keep a strict subset when maxDocFreq
    excludes at least one hot term; matched docs <= union of all four."""
    r = Q["graph_terms_query"](spark, SF_DIR).collect()[0]
    from lucene_solr_spark.plans.driver_queries import _tokens

    toks = _tokens(spark, SF_DIR).select(
        "doc_id", F.explode("tokens").alias("term")
    )
    all4 = (
        toks.filter(F.col("term").isin("data", "key", "order", "value"))
        .select("doc_id")
        .distinct()
        .count()
    )
    assert 0 < r.n_terms_kept <= 4
    assert r.n_docs <= all4


def test_boosting_demotes_but_never_excludes(spark):
    """BoostingQuery semantics: the matched doc SET equals the main
    query's; only scores of demoted docs shrink (x0.2)."""
    from lucene_solr_spark.plans.driver_queries import _tokens

    toks = _tokens(spark, SF_DIR)
    main_docs = {
        r.doc_id
        for r in toks.filter(F.array_contains("tokens", "merge"))
        .select("doc_id")
        .collect()
    }
    got = Q["boosting_query_demote"](spark, SF_DIR).collect()
    assert got and all(r.doc_id in main_docs for r in got)
    slow_docs = {
        r.doc_id
        for r in toks.filter(F.array_contains("tokens", "slow"))
        .select("doc_id")
        .collect()
    }
    # demote ≠ exclude: drop the LIMIT from the registered oracle and the
    # FULL result set must equal the main query's match set — including
    # every demoted ('merge' AND 'slow') doc, each with a nonzero score
    import duckdb

    import __spark_entry__ as em

    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{SF_DIR}/documents.parquet')"
    )
    sql = em.oracle_sql()["boosting_query_demote"]
    assert sql.rstrip().endswith("LIMIT 10")
    full = con.execute(sql.rstrip()[: -len("LIMIT 10")]).fetchall()
    full_ids = {int(d) for d, _s in full}
    assert full_ids == main_docs
    demoted_matched = full_ids & slow_docs
    assert demoted_matched, "fixture has no merge∧slow doc — pin is vacuous"
    scores = {int(d): s for d, s in full}
    assert all(scores[d] > 0 for d in demoted_matched)


def test_expression_column_stays_in_codegen(spark):
    """The compiled expression must be pure Catalyst — no BatchEvalPython
    / ArrowEvalPython stage introduced by the COMPILER (the tokenizer's
    Arrow UDF upstream is the analysis chain, checked separately)."""
    from lucene_solr_spark.functions.expressions import compile_column
    from lucene_solr_spark.plans.coverage9_queries import _EXPR_SRC

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    col = compile_column(
        _EXPR_SRC,
        {"n_chars": F.col("n_chars"), "dl": F.col("n_chars") % 137},
    )
    df = (
        docs.select("doc_id", F.round(col, 6).alias("expr_val"))
        .orderBy(F.desc("expr_val"), F.asc("doc_id"))
        .limit(10)
    )
    plan = _plan(df)
    assert "EvalPython" not in plan, plan
    assert "TakeOrderedAndProject" in plan, plan
    # the full driver row still sorts via TakeOrderedAndProject
    assert "TakeOrderedAndProject" in _plan(Q["expression_sort_topk"](spark, SF_DIR))


def test_shard_split_conserves_totals(spark):
    """left + right must exactly partition the segment: doc counts sum to
    the corpus' non-empty docs, occurrence counts sum to total tokens."""
    rows = {r.half: r for r in Q["shard_split_counts"](spark, SF_DIR).collect()}
    assert set(rows) == {"left", "right"}
    from lucene_solr_spark.plans.driver_queries import _tokens

    toks = _tokens(spark, SF_DIR)
    nonempty = toks.filter(F.size("tokens") > 0).count()
    total_tokens = toks.select(
        F.sum(F.size("tokens")).alias("s")
    ).collect()[0].s
    assert rows["left"].n_docs + rows["right"].n_docs == nonempty
    assert rows["left"].sum_tf + rows["right"].sum_tf == total_tokens


def test_suggest_context_changes_weights(spark):
    """Context filtering must weight by IN-CONTEXT df — the unfiltered
    weight is >= the filtered one for every suggestion."""
    filtered = {
        r.term: r.weight
        for r in Q["suggest_context_filtered"](spark, SF_DIR).collect()
    }
    assert filtered
    from lucene_solr_spark.plans.driver_queries import _tokens

    toks = _tokens(spark, SF_DIR).select(
        "doc_id", F.explode("tokens").alias("term")
    )
    unfiltered = {
        r.term: r.w
        for r in toks.filter(F.col("term").isin(list(filtered)))
        .groupBy("term")
        .agg(F.countDistinct("doc_id").alias("w"))
        .collect()
    }
    for t, w in filtered.items():
        assert w <= unfiltered[t]


def test_timeseries_gap_fill_emits_empty_buckets(spark):
    """At sf0.001 the >450k filter leaves empty months — the stream must
    still emit them, zero-filled, across the full 12-month range."""
    rows = Q["timeseries_gap_fill"](spark, SF_DIR).collect()
    assert len(rows) == 12
    assert [r.month for r in rows] == [f"1996-{m:02d}" for m in range(1, 13)]
    zeros = [r for r in rows if r.n_orders == 0]
    assert zeros, "fixture lost its gap months"
    assert all(r.sum_price == 0.0 for r in zeros)
