"""Semantic + physical-plan pins for the coverage11 batch (cross-engine
parity lives in the driver-contract mirror; these pin what parity alone
wouldn't catch): early-termination bucket pruning + full-sort equality,
the k-vs-bucket refusal, multi-select domain semantics, and the
before/overlapping kernels on the engine's positional-postings path."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

import __spark_entry__ as entry_mod  # noqa: F401  (registers the catalog)

from .conftest import SF01_DIR, SF_DIR

_ET_SORT = ["_len", "path"]


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


# ---------------------------------------------------------------------------
# early termination over an index-sorted segment
# ---------------------------------------------------------------------------


def test_early_terminate_equals_full_sort(spark):
    """The bucket-pruned early-terminated top-k must equal the REAL query
    sort over the whole docmap — ordered by the sort key columns, not by
    doc_id, so a segment ranked by the wrong key would fail here — on the
    sf0.01 corpus where the segment spans ~8 buckets (non-degenerate
    pruning)."""
    from lucene_solr_spark.operators.search import sorted_index_topk
    from lucene_solr_spark.plans.coverage11_queries import _sorted_segment

    seg = _sorted_segment(spark, SF01_DIR)
    assert seg.stats.max_doc_id >= seg.stats.bucket_docs  # >1 bucket
    assert seg.stats.index_sort == ",".join(_ET_SORT)
    got = [
        (len(r.content), r.path)
        for r in sorted_index_topk(spark, seg, 10, sort=_ET_SORT).collect()
    ]
    full = sorted(
        (len(r.content), r.path)
        for r in seg.table(spark, "docmap").select("content", "path").collect()
    )[:10]
    assert got == full and len(got) == 10


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
    plan = _plan(sorted_index_topk(spark, seg, 10, sort=_ET_SORT))
    assert f"< {_ET_BUCKET_DOCS}" in plan, plan
    assert "TakeOrderedAndProject" in plan, plan


def test_early_terminate_refuses_wide_k(spark):
    from lucene_solr_spark.operators.search import sorted_index_topk
    from lucene_solr_spark.plans.coverage11_queries import _sorted_segment

    seg = _sorted_segment(spark, SF01_DIR)
    with pytest.raises(ValueError, match="early termination"):
        sorted_index_topk(
            spark, seg, seg.stats.bucket_docs + 1, sort=_ET_SORT
        )


def test_early_terminate_refuses_sort_mismatch(spark):
    """Lucene rejects a SortField/index-sort mismatch; so does the
    reader — both against a differently-sorted segment and against an
    insertion-ordered segment with no recorded sort."""
    from lucene_solr_spark.operators.search import sorted_index_topk
    from lucene_solr_spark.plans.coverage11_queries import _sorted_segment
    from lucene_solr_spark.plans.solr_queries import _engine_searcher

    seg = _sorted_segment(spark, SF01_DIR)
    with pytest.raises(ValueError, match="does not match"):
        sorted_index_topk(spark, seg, 5, sort=["lang"])
    unsorted = _engine_searcher(spark, SF_DIR).segment
    with pytest.raises(ValueError, match="index sort"):
        sorted_index_topk(spark, unsorted, 5, sort=["lang"])
    with pytest.raises(ValueError, match="no index sort"):
        sorted_index_topk(spark, unsorted, 5)


def test_early_terminate_honors_live_docs(spark):
    """Tombstoned docs never hold a top-k slot, and the widened window
    still yields k live docs when bucket 0 is partially deleted —
    TopFieldCollector early termination honors liveDocs."""
    from lucene_solr_spark.operators.search import sorted_index_topk
    from lucene_solr_spark.plans.coverage11_queries import _sorted_segment

    seg = _sorted_segment(spark, SF01_DIR)
    bd = seg.stats.bucket_docs
    # delete most of bucket 0: the k-th live doc now lives in bucket 1
    dead = list(range(0, bd - 3))
    got = [
        r.doc_id
        for r in sorted_index_topk(
            spark, seg, 10, sort=_ET_SORT, deleted=dead
        ).collect()
    ]
    assert got == [bd - 3, bd - 2, bd - 1] + list(range(bd, bd + 7))


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


def test_multiselect_refuses_unknown_tag_and_empty(spark):
    """A typo'd exclude tag would silently re-apply the facet's own
    filter — the inverse of the multi-select contract — so it is refused;
    so is an empty facet list."""
    from lucene_solr_spark.operators.facets import multiselect_facets

    d = spark.read.parquet(f"{SF01_DIR}/documents.parquet")
    tagged = {"L": F.col("lang") == "en"}
    with pytest.raises(ValueError, match="unknown tag"):
        multiselect_facets(d, tagged, [("lang", "lang", {"l"})])
    with pytest.raises(ValueError, match="at least one facet"):
        multiselect_facets(d, tagged, [])


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
    engine = {}
    for d, pos in per_doc.items():
        n = len(doc_intervals(node, pos))
        if n:
            engine[d] = n
    toks = spark.read.parquet(f"{SF_DIR}/documents.parquet").collect()
    from lucene_solr_spark.operators.intervals import positions_from_tokens

    want = {}
    for r in toks:
        p = positions_from_tokens(r.text.split(), {"key", "order", "hash"})
        n = len(doc_intervals(node, p))
        if n:
            want[r.doc_id] = n
    assert engine == want and len(want) > 0
