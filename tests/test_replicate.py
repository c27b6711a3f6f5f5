"""Cross-catalog replication (CDCR / ReplicationHandler analog): replica
serves identical results, passes are incremental + idempotent, deletes are
forwarded, a crashed pass resumes cleanly."""

from __future__ import annotations

import os
import shutil

import pytest
from pyspark.sql import functions as F

from lucene_solr_spark.corpus import documents_as_corpus
from lucene_solr_spark.operators.search import MultiSearcher
from lucene_solr_spark.operators.indexer import build_index
from lucene_solr_spark.sources.catalog import MANIFEST, Catalog
from lucene_solr_spark.streaming.replicate import read_checkpoint, replicate

from .conftest import SF_DIR


def _add_segment(spark, cat: Catalog, seg_id: str, pred) -> None:
    docs = documents_as_corpus(spark, SF_DIR).filter(pred)
    build_index(spark, docs, out_dir=cat.root, bucket_docs=64, segment_id=seg_id)
    cat.commit_swap(add=[seg_id])


@pytest.fixture()
def src(spark, tmp_path):
    c = Catalog(str(tmp_path / "leader"))
    _add_segment(spark, c, "s0", F.col("doc_id") < 60)
    return c


def _hits(spark, cat, q="spark join", k=200):
    return {
        (r["doc_id"], round(r["score"], 5))
        for r in MultiSearcher.from_catalog(spark, cat).topk(q, k=k).collect()
    }


def test_replica_serves_identical_results(spark, src, tmp_path):
    dst = Catalog(str(tmp_path / "follower"))
    out = replicate(spark, src, dst)
    assert out["shipped"] == ["s0"] and not out["up_to_date"]
    assert _hits(spark, dst) == _hits(spark, src)

    # idempotent: second pass is a no-op
    out2 = replicate(spark, src, dst)
    assert out2["up_to_date"] and out2["shipped"] == []


def test_incremental_ship_and_delete_forwarding(spark, src, tmp_path):
    dst = Catalog(str(tmp_path / "follower"))
    replicate(spark, src, dst)

    # leader gains a segment and some tombstones
    _add_segment(spark, src, "s1", (F.col("doc_id") >= 60) & (F.col("doc_id") < 120))
    doomed = [r["doc_id"] for r in
              MultiSearcher.from_catalog(spark, src).topk("spark", k=3).collect()]
    src.add_deletes(
        spark.createDataFrame(
            [("s0", int(d)) for d in doomed], "segment_id string, doc_id long"
        )
    )

    out = replicate(spark, src, dst)
    assert out["shipped"] == ["s1"]  # s0 not re-copied
    assert _hits(spark, dst) == _hits(spark, src)
    assert {r["doc_id"] for r in dst.deletes(spark).collect()} == set(doomed)

    # leader merges away a segment -> follower drops it after the flip
    from lucene_solr_spark.operators.merge import merge_segments

    merged = merge_segments(spark, src.segments(), catalog=src, bucket_docs=64)
    out2 = replicate(spark, src, dst)
    assert out2["shipped"] == [merged.segment_id]
    assert set(out2["removed"]) == {"s0", "s1"}
    assert not os.path.isdir(os.path.join(dst.root, "s0"))
    assert _hits(spark, dst) == _hits(spark, src)


def test_crashed_pass_resumes(spark, src, tmp_path):
    dst = Catalog(str(tmp_path / "follower"))
    # simulate a crash mid-ship: staging dir left behind, no commit, no ckpt
    staging = os.path.join(dst.root, "_incoming-s0")
    shutil.copytree(os.path.join(src.root, "s0"), staging)
    os.remove(os.path.join(staging, MANIFEST))  # partial copy

    assert dst.segments() == []  # reader sees nothing pre-commit
    out = replicate(spark, src, dst)
    assert out["shipped"] == ["s0"]
    assert read_checkpoint(dst)["src_gen"] == out["src_gen"]
    assert not os.path.exists(staging)
    assert _hits(spark, dst) == _hits(spark, src)
