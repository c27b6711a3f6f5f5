"""Atomic updates + optimistic versioning (AtomicUpdateDocumentMerger /
DistributedUpdateProcessor#versionAdd analogs)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from lucene_solr_spark.corpus import documents_as_corpus
from lucene_solr_spark.operators.indexer import build_index
from lucene_solr_spark.operators.search import MultiSearcher
from lucene_solr_spark.operators.updates import atomic_update, _live_docs
from lucene_solr_spark.sources.catalog import Catalog

from .conftest import SF_DIR


@pytest.fixture()
def cat(spark, tmp_path):
    c = Catalog(str(tmp_path / "cat"))
    docs = documents_as_corpus(spark, SF_DIR).filter(F.col("doc_id") < 100)
    build_index(spark, docs, out_dir=c.root, bucket_docs=64, segment_id="base")
    c.commit_swap(add=["base"])
    return c


def _upd(spark, rows, with_expect=False):
    schema = "repo string, path string, commit string, content string"
    if with_expect:
        schema += ", _expected_version_ long"
    return spark.createDataFrame(rows, schema)


def test_atomic_update_set_content(spark, cat):
    n0 = _live_docs(spark, cat).count()
    upd = _upd(
        spark,
        [("testdata", "3", "v0", "qqzz replacement text"),
         ("testdata", "7", "v0", "qqzz other text")],
    )
    res = atomic_update(spark, cat, upd, set_fields=["content"], bucket_docs=64)
    assert res.n_updated == 2 and res.n_rejected == 0
    live = _live_docs(spark, cat)
    assert live.count() == n0  # delete+add keeps the live set size
    row = live.filter(F.col("path") == "3").collect()[0]
    assert row["_version_"] == 2
    assert "qqzz" in row["content"]
    # the new content is searchable, the update segment is committed
    ms = MultiSearcher.from_catalog(spark, cat)
    hits = {r["doc_id"] for r in ms.topk("qqzz", k=10).collect()}
    assert len(hits) == 2
    # unchanged stored fields carried over (lang survived the content set)
    assert row["lang"] is not None


def test_optimistic_version_conflict(spark, cat):
    upd1 = _upd(spark, [("testdata", "5", "v0", "first change")])
    atomic_update(spark, cat, upd1, set_fields=["content"], bucket_docs=64)
    # stale expectation (doc is now at version 2) -> rejected
    stale = _upd(spark, [("testdata", "5", "v0", "lost update", 1)], with_expect=True)
    res = atomic_update(spark, cat, stale, set_fields=["content"], bucket_docs=64)
    assert res.n_updated == 0 and res.n_rejected == 1
    rej = res.rejected.collect()[0]
    assert rej["current_version"] == 2 and rej["expected_version"] == 1
    # correct expectation -> accepted, version 3
    good = _upd(spark, [("testdata", "5", "v0", "won update", 2)], with_expect=True)
    res2 = atomic_update(spark, cat, good, set_fields=["content"], bucket_docs=64)
    assert res2.n_updated == 1 and res2.n_rejected == 0
    row = _live_docs(spark, cat).filter(F.col("path") == "5").collect()[0]
    assert row["_version_"] == 3 and "won update" in row["content"]


def test_update_unknown_key_is_ignored(spark, cat):
    upd = _upd(spark, [("nosuch", "x", "v9", "zzz")])
    res = atomic_update(spark, cat, upd, set_fields=["content"], bucket_docs=64)
    assert res.n_updated == 0 and res.n_rejected == 0 and res.segment_id is None
