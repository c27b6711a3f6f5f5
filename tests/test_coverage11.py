"""Semantic + physical-plan pins for the coverage11 batch (cross-engine
parity lives in the driver-contract mirror; these pin what parity alone
wouldn't catch): early-termination bucket pruning + full-sort equality,
the k-vs-bucket refusal, multi-select domain semantics, and the
before/overlapping kernels on the engine's positional-postings path."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

import __spark_entry__ as entry_mod

from .conftest import SF01_DIR, SF_DIR

Q = entry_mod.queries()


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


# ---------------------------------------------------------------------------
# early termination over an index-sorted segment
# ---------------------------------------------------------------------------


def test_early_terminate_equals_full_sort(spark):
    """The bucket-pruned early-terminated top-k must equal the full
    ORDER BY the engine skipped — on the sf0.01 corpus where the segment
    spans ~10 buckets, so the pruning is non-degenerate."""
    from lucene_solr_spark.operators.search import sorted_index_topk
    from lucene_solr_spark.plans.coverage11_queries import _sorted_segment

    seg = _sorted_segment(spark, SF01_DIR)
    assert seg.stats.max_doc_id >= seg.stats.bucket_docs  # >1 bucket
    got = [
        (r.doc_id, r.path)
        for r in sorted_index_topk(spark, seg, 10).collect()
    ]
    full = [
        (r.doc_id, r.path)
        for r in seg.table(spark, "docmap")
        .orderBy("doc_id")
        .limit(10)
        .collect()
    ]
    assert got == full and len(got) == 10
    # doc ids are the index sort: ranks 0..9
    assert [d for d, _ in got] == list(range(10))


def test_early_terminate_prunes_bucket(spark):
    """The physical plan must carry the doc_id < bucket_docs predicate —
    the filter that becomes parquet min/max file pruning on a disk
    segment (the docmap is range-partitioned by doc_id at write time)."""
    from lucene_solr_spark.operators.search import sorted_index_topk
    from lucene_solr_spark.plans.coverage11_queries import (
        _ET_BUCKET_DOCS,
        _sorted_segment,
    )

    seg = _sorted_segment(spark, SF01_DIR)
    plan = _plan(sorted_index_topk(spark, seg, 10))
    assert f"< {_ET_BUCKET_DOCS}" in plan, plan
    assert "TakeOrderedAndProject" in plan, plan


def test_early_terminate_refuses_wide_k(spark):
    from lucene_solr_spark.operators.search import sorted_index_topk
    from lucene_solr_spark.plans.coverage11_queries import _sorted_segment

    seg = _sorted_segment(spark, SF01_DIR)
    with pytest.raises(ValueError, match="early termination"):
        sorted_index_topk(spark, seg, seg.stats.bucket_docs + 1)


# ---------------------------------------------------------------------------
# multi-select faceting
# ---------------------------------------------------------------------------


def test_multiselect_domains(spark):
    """Each facet's domain excludes exactly its own tag: the lang facet
    counts docs under source=src1 ONLY (lang filter excluded), and its
    bucket sum equals that domain's size; a facet excluding nothing sees
    the fully-filtered domain."""
    from lucene_solr_spark.operators.facets import multiselect_facets

    d = spark.read.parquet(f"{SF01_DIR}/documents.parquet")
    tagged = {"L": F.col("lang") == "en", "S": F.col("source") == "src1"}
    out = multiselect_facets(
        d,
        tagged,
        [
            ("lang", "lang", {"L"}),
            ("source", "source", {"S"}),
            ("lang_all", "lang", set()),  # no exclusion: both filters
        ],
        limit=100,
    ).collect()
    by_facet = {}
    for r in out:
        by_facet.setdefault(r.facet, {})[r.bucket] = r.n_docs
    n_src1 = d.filter(F.col("source") == "src1").count()
    n_en = d.filter(F.col("lang") == "en").count()
    n_both = d.filter(tagged["L"] & tagged["S"]).count()
    assert sum(by_facet["lang"].values()) == n_src1
    assert sum(by_facet["source"].values()) == n_en
    # no-exclusion facet: one bucket ('en'), fully filtered domain
    assert by_facet["lang_all"] == {"en": n_both}
    # multi-select contract: the excluded facet still shows the other
    # choices — more than one lang bucket despite the lang:en filter
    assert len(by_facet["lang"]) > 1


# ---------------------------------------------------------------------------
# before/overlapping on the ENGINE positional path (the registry rows run
# the tokens-column kernel; this pins that the same node over decoded
# pos_bin postings agrees — the dict shapes are interchangeable)
# ---------------------------------------------------------------------------


def test_interval_before_engine_path_parity(spark):
    from lucene_solr_spark.functions.packing import delta_decode, unpack_ints
    from lucene_solr_spark.operators.intervals import (
        IBefore,
        ITerm,
        IUnordered,
        doc_intervals,
    )
    from lucene_solr_spark.plans.solr_queries import _engine_searcher

    node = IBefore(IUnordered(ITerm("key"), ITerm("order")), ITerm("hash"))
    s = _engine_searcher(spark, SF_DIR)
    rows = (
        s.segment.table(spark, "positions")
        .filter(F.col("term").isin("key", "order", "hash"))
        .select("doc_id", "term", "pos_bin")
        .collect()
    )
    per_doc: dict[int, dict] = {}
    for r in rows:
        per_doc.setdefault(r.doc_id, {})[r.term] = delta_decode(
            unpack_ints(r.pos_bin)
        )
    engine = {
        d: len(doc_intervals(node, pos))
        for d, pos in per_doc.items()
        if len(doc_intervals(node, pos)) > 0
    }
    toks = spark.read.parquet(f"{SF_DIR}/documents.parquet").collect()
    from lucene_solr_spark.operators.intervals import positions_from_tokens

    want = {}
    for r in toks:
        p = positions_from_tokens(r.text.split(), {"key", "order", "hash"})
        n = len(doc_intervals(node, p))
        if n:
            want[r.doc_id] = n
    assert engine == want and len(want) > 0
