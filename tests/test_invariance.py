"""Parallelism invariance + resume idempotency — the reference's
"distributed == single-node control" pattern (SURVEY.md §5.1:
BaseDistributedSearchTestCase) and tlog-replay recovery.

- Same corpus indexed under different parallelism (partition counts,
  shuffle-partition settings) must yield byte-identical (doc_id, score)
  results and identical segment stats — north_rule's two-cluster-size
  criterion at correctness level.
- sha256(content) must survive the pipeline row-for-row (input_hint).
- A build killed after phase k (simulated by deleting later phase tables)
  must resume to an identical segment, reusing completed phases.
"""

from __future__ import annotations

import os
import shutil

import pytest
from pyspark.sql import functions as F

from lucene_solr_spark.corpus import synth_corpus
from lucene_solr_spark.operators.indexer import build_index
from lucene_solr_spark.operators.search import Searcher

N_DOCS = 150
QUERIES = ["import return def", "getnode parseindex", "public self merge"]


def _hits(seg, spark, q):
    return [
        (int(r["doc_id"]), float(r["score"]))
        for r in Searcher(spark, seg).topk(q, k=20, mode="wand").collect()
    ]


def test_parallelism_invariance(spark):
    """partitions 2 vs 16 and different shuffle settings -> identical index."""
    segs = []
    old = spark.conf.get("spark.sql.shuffle.partitions")
    try:
        for parts, shuffle in [(2, 4), (16, 23)]:
            spark.conf.set("spark.sql.shuffle.partitions", str(shuffle))
            c = synth_corpus(spark, N_DOCS, partitions=parts)
            segs.append(build_index(spark, c, out_dir=None, bucket_docs=64))
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", old)
    a, b = segs
    assert a.stats.__dict__ == b.stats.__dict__
    for q in QUERIES:
        assert _hits(a, spark, q) == _hits(b, spark, q), f"parallelism changed {q!r}"
    # per-row invariant: identical (doc_id -> sha256) mapping
    da = {r["doc_id"]: r["content_sha256"] for r in a.dfs["docmap"].collect()}
    db = {r["doc_id"]: r["content_sha256"] for r in b.dfs["docmap"].collect()}
    assert da == db


def test_sha256_preserved_through_pipeline(spark):
    c = synth_corpus(spark, 40, partitions=3).persist()
    seg = build_index(spark, c, out_dir=None, bucket_docs=64)
    src = {
        (r["repo"], r["path"], r["commit"]): r["content_sha256"]
        for r in c.collect()
    }
    out = {
        (r["repo"], r["path"], r["commit"]): r["content_sha256"]
        for r in seg.dfs["docmap"].collect()
    }
    assert src == out  # every row, unchanged digest


@pytest.mark.parametrize("kill_after", ["postings", "terms"])
def test_resume_after_partial_failure(spark, tmp_path, kill_after):
    """Delete phases written after ``kill_after`` (a crash mid-build), rerun
    with the same segment_id, and require an identical final segment."""
    c = synth_corpus(spark, 60, partitions=4).persist()
    full = build_index(
        spark, c, out_dir=str(tmp_path), bucket_docs=64, segment_id="s"
    )
    baseline = {q: _hits(full, spark, q) for q in QUERIES}
    stats0 = dict(full.stats.__dict__)

    seg_path = os.path.join(str(tmp_path), "s")
    phases = ["postings", "terms", "docmap"]
    for ph in phases[phases.index(kill_after) + 1 :]:
        p = os.path.join(seg_path, ph)
        if os.path.isdir(p):
            shutil.rmtree(p)
    os.remove(os.path.join(seg_path, "_MANIFEST.json"))

    # completed phases must be reused: poison-pill check — kept-phase mtime
    kept_marker = os.path.join(seg_path, kill_after, "_SUCCESS")
    mtime_before = os.path.getmtime(kept_marker)

    resumed = build_index(
        spark, c, out_dir=str(tmp_path), bucket_docs=64, segment_id="s"
    )
    assert os.path.getmtime(kept_marker) == mtime_before, "phase was rebuilt"
    assert dict(resumed.stats.__dict__) == stats0
    for q in QUERIES:
        assert _hits(resumed, spark, q) == baseline[q]
