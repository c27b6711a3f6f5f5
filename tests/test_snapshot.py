"""Snapshots + time travel (SnapshotDeletionPolicy / IndexCommit analogs):
a pinned commit survives merges physically and stays readable; release +
cleanup reclaims it; the live listing is never affected."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from lucene_solr_spark.corpus import documents_as_corpus
from lucene_solr_spark.operators.indexer import build_index
from lucene_solr_spark.operators.merge import merge_segments
from lucene_solr_spark.operators.search import MultiSearcher
from lucene_solr_spark.sources.catalog import Catalog

from .conftest import SF_DIR


@pytest.fixture()
def cat(spark, tmp_path):
    c = Catalog(str(tmp_path / "cat"))
    docs = documents_as_corpus(spark, SF_DIR).filter(F.col("doc_id") < 120)
    for i, pred in enumerate([F.col("doc_id") < 60, F.col("doc_id") >= 60]):
        build_index(
            spark, docs.filter(pred), out_dir=c.root, bucket_docs=64,
            segment_id=f"s{i}",
        )
        c.commit_swap(add=[f"s{i}"])
    return c


def test_snapshot_survives_merge_and_time_travels(spark, cat):
    snap = cat.snapshot()
    pre_ids = {s.segment_id for s in cat.segments()}
    assert pre_ids == {"s0", "s1"}

    merged = merge_segments(spark, cat.segments(), catalog=cat, bucket_docs=64)
    # live listing swapped to the merged segment only
    assert {s.segment_id for s in cat.segments()} == {merged.segment_id}
    # but the snapshotted segments are STILL on disk (drop deferred)
    assert os.path.isdir(os.path.join(cat.root, "s0"))
    assert os.path.isdir(os.path.join(cat.root, "s1"))

    # time travel: read the index as of the snapshot and search it
    old = cat.segments(at=snap)
    assert {s.segment_id for s in old} == {"s0", "s1"}
    ms_old = MultiSearcher(spark, old)
    ms_new = MultiSearcher.from_catalog(spark, cat)
    q = "spark join"
    old_hits = ms_old.topk(q, k=200).count()
    new_hits = ms_new.topk(q, k=200).count()
    assert old_hits == new_hits  # merge preserved the corpus

    # release + cleanup reclaims the pinned dirs, live set untouched
    cat.release_snapshot(snap)
    removed = cat.cleanup()
    assert set(removed) == {"s0", "s1"}
    assert not os.path.isdir(os.path.join(cat.root, "s0"))
    assert {s.segment_id for s in cat.segments()} == {merged.segment_id}
    assert ms_new.topk(q, k=200).count() == new_hits


def test_cleanup_never_touches_live_or_pinned(spark, cat):
    snap = cat.snapshot()
    assert cat.cleanup() == []  # everything live or pinned
    cat.release_snapshot(snap)
    assert cat.cleanup() == []  # still live


def test_time_travel_to_missing_generation_refuses(spark, tmp_path):
    """segments(at=N) for an unarchived N raises a named error listing
    what exists (IndexNotFoundException analog), not FileNotFoundError."""
    import pytest

    from lucene_solr_spark.corpus import stamp_sha256
    from lucene_solr_spark.operators.indexer import build_index
    from lucene_solr_spark.sources.catalog import Catalog

    root = str(tmp_path / "cat")
    cat = Catalog(root)
    schema = (
        "doc_id long, repo string, path string, commit string, "
        "lang string, content string"
    )
    df = spark.createDataFrame([(0, "r", "a", "c", "en", "order")], schema)
    build_index(spark, stamp_sha256(df), out_dir=root, segment_id="s0")
    cat.commit_swap(add=["s0"])
    with pytest.raises(ValueError, match="no commit generation 999"):
        cat.segments(at=999)
