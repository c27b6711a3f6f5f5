"""Semantic pins for the coverage25 batch: ordinal arithmetic, prefix-whole
split invariants, passage density ranking."""

from __future__ import annotations

from pyspark.sql import functions as F

import __spark_entry__ as entry_mod  # noqa: F401  (registers the catalog)
from lucene_solr_spark.plans import coverage25_queries as c25

from .conftest import SF_DIR


def test_ord_rord_are_dictionary_ordinals(spark):
    rows = c25.function_query_ord(spark, SF_DIR).collect()
    langs = sorted(
        r.lang
        for r in spark.read.parquet(f"{SF_DIR}/documents.parquet")
        .select("lang")
        .distinct()
        .collect()
    )
    nv = len(langs)
    for r in rows:
        assert r.ord == langs.index(r.lang) + 1  # 1-based dictionary ordinal
        assert r.rord == nv - r.ord + 1


def test_split_by_prefix_invariants(spark):
    rows = c25.shard_split_by_prefix(spark, SF_DIR).collect()
    # every prefix appears exactly once (whole, never split)
    langs = [r.lang for r in rows]
    assert len(langs) == len(set(langs))
    total = sum(r.n_docs for r in rows)
    left = sum(r.n_docs for r in rows if r.sub_shard == 0)
    assert 0 < left < total  # both sub-shards non-empty
    # the split sits at a prefix boundary near the midpoint: moving the
    # boundary prefix to the other side cannot improve balance by more
    # than that prefix's own size
    assert abs(2 * left - total) <= 2 * max(r.n_docs for r in rows)


def test_passage_is_densest_window(spark):
    got = c25.passage_ranking_topk(spark, SF_DIR).collect()
    assert got
    from lucene_solr_spark.plans.driver_queries import _tokens

    toks = {
        r.doc_id: r.tokens
        for r in _tokens(spark, SF_DIR)
        .where(F.col("doc_id").isin(*[r.doc_id for r in got]))
        .collect()
    }
    for r in got:
        t = toks[r.doc_id]
        wins = {}
        for pos, term in enumerate(t):
            if term in c25._PR_TERMS:
                k = pos // c25._PR_WIN
                wins.setdefault(k, []).append(term)
        best = max(
            wins.items(),
            key=lambda kv: (len(set(kv[1])), len(kv[1]), -kv[0]),
        )
        assert r.win_start == best[0] * c25._PR_WIN
        assert r.n_terms == len(set(best[1]))
        assert r.n_occ == len(best[1])
