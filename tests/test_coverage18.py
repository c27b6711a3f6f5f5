"""Semantic pins for the coverage18 batch: the update() stream writes a
real destination segment (manifest-committed, idempotent on replay) whose
contents are exactly the matching DocSet."""

from __future__ import annotations

from pyspark.sql import functions as F

import __spark_entry__ as entry_mod  # noqa: F401  (registers the catalog)
from lucene_solr_spark.plans import coverage18_queries as c18

from .conftest import SF_DIR


def test_update_stream_destination_is_docset(spark):
    c18.update_stream_reindex(spark, SF_DIR).collect()  # runs the pipe
    from lucene_solr_spark.sources.catalog import Catalog

    root = c18._US_CACHE[SF_DIR]
    dest = Catalog(f"{root}/dest").segments()[0]
    got = {r.doc_id for r in dest.stored_fields(spark).select("doc_id").collect()}
    d = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    want = {
        r.doc_id
        for r in d.filter(
            F.array_contains(F.split("text", " "), c18._US_TERM)
        ).collect()
    }
    assert got == want and got  # exactly the matching DocSet
    assert dest.stats.n_docs == len(want)  # manifest agrees


def test_update_stream_replay_idempotent(spark):
    """Re-running the same batch_id is a no-op (the tlog-replay contract
    ingest_batch gives every micro-batch)."""
    from lucene_solr_spark.sources.catalog import Catalog
    from lucene_solr_spark.streaming.ingest import ingest_batch

    c18.update_stream_reindex(spark, SF_DIR).collect()
    root = c18._US_CACHE[SF_DIR]
    dest = Catalog(f"{root}/dest")
    before = [s.segment_id for s in dest.segments()]
    src = Catalog(f"{root}/src").segments()[0]
    ingest_batch(dest, src.stored_fields(spark).limit(3), batch_id=0, stream_id="upd-")
    assert [s.segment_id for s in dest.segments()] == before


def test_dynamic_ranges_equal_weight(spark):
    """Tiles hold equal weight (+/-1 doc) and bounds partition the value
    line in order — the computeDynamicRanges contract."""
    rows = c18.dynamic_range_facet(spark, SF_DIR).collect()
    assert [r.tile for r in rows] == list(range(1, c18._DR_N + 1))
    counts = [r.n_docs for r in rows]
    assert max(counts) - min(counts) <= 1
    for a, b in zip(rows, rows[1:]):
        assert a.hi <= b.lo  # ranges ordered, non-overlapping on this data
    n = spark.read.parquet(f"{SF_DIR}/orders.parquet").count()
    assert sum(counts) == n
