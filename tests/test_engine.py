"""Engine end-to-end: index build + BM25 top-k, rank/score-identical to the
pinned oracle; WAND == exhaustive (TestWANDScorer pattern); CheckIndex
invariants; sha256 per-row invariant.
"""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from lucene_solr_spark.corpus import documents_as_corpus, synth_corpus
from lucene_solr_spark.operators.checker import check_segment
from lucene_solr_spark.operators.indexer import build_index
from lucene_solr_spark.operators.search import Searcher

from . import oracle
from .conftest import SF_DIR

QUERIES = [
    "spark",                      # common term
    "window",                     # common
    "zebra",                      # absent
    "fast merge window",          # disjunction
    "spark join order batch",     # disjunction incl hot-ish terms
    "the table",                  # hot terms
    "customer vector slow",       # mixed
    "dup",                        # rarer
    "spark spark spark",          # repeated query terms collapse
    "agg filter",                 #
]


@pytest.fixture(scope="module")
def built(spark):
    corpus = documents_as_corpus(spark, SF_DIR)
    seg = build_index(spark, corpus, out_dir=None, bucket_docs=128)
    searcher = Searcher(spark, seg)
    docs = [
        (int(r["doc_id"]), r["text"])
        for r in spark.read.parquet(f"{SF_DIR}/documents.parquet")
        .select("doc_id", "text")
        .collect()
    ]
    ora = oracle.OracleIndex(docs)
    return seg, searcher, ora


def test_stats_match_oracle(built):
    seg, searcher, ora = built
    assert seg.stats.n_docs == ora.N
    assert abs(seg.stats.avgdl - ora.avgdl) < 1e-9
    np.testing.assert_array_equal(searcher._cache, ora.cache)


def test_check_index(spark, built):
    seg, _, _ = built
    summary = check_segment(spark, seg)
    assert summary["n_docs"] == 500


@pytest.mark.parametrize("q", QUERIES)
@pytest.mark.parametrize("mode", ["exhaustive", "wand"])
def test_topk_rank_and_score_identical(built, q, mode):
    _, searcher, ora = built
    got = [(r["doc_id"], r["score"]) for r in searcher.topk(q, k=10, mode=mode).collect()]
    want = ora.topk(q, k=10)
    assert [d for d, _ in got] == [d for d, _ in want], f"rank mismatch {q} {mode}"
    for (d1, s1), (d2, s2) in zip(got, want):
        assert np.float32(s1) == np.float32(s2), f"score mismatch {q} doc {d1}: {s1} vs {s2}"


@pytest.mark.parametrize("q", ["fast merge window", "spark join", "the table scan", "dup vector", "the a"])
@pytest.mark.parametrize("mode", ["exhaustive", "wand"])
def test_conjunction_matches_oracle(built, q, mode):
    """exhaustive AND == BlockMaxConjunction AND == oracle (rank + float32)."""
    _, searcher, ora = built
    got = [(r["doc_id"], np.float32(r["score"])) for r in searcher.topk(q, k=10, mode=mode, op="and").collect()]
    want = [(d, np.float32(s)) for d, s in ora.topk_conjunction(q, k=10)]
    assert got == want


def test_wand_equals_exhaustive_many(built):
    _, searcher, _ = built
    for q in QUERIES:
        a = [(r["doc_id"], np.float32(r["score"])) for r in searcher.topk(q, 10, mode="wand").collect()]
        b = [(r["doc_id"], np.float32(r["score"])) for r in searcher.topk(q, 10, mode="exhaustive").collect()]
        assert a == b, q


def test_sha256_invariant_through_pipeline(spark, built):
    seg, _, _ = built
    corpus = documents_as_corpus(spark, SF_DIR)
    src = corpus.select("doc_id", "content_sha256")
    idx = seg.table(spark, "docmap").select("doc_id", F.col("content_sha256").alias("s2"))
    bad = src.join(idx, "doc_id").filter(F.col("content_sha256") != F.col("s2")).count()
    assert bad == 0
    assert idx.count() == src.count()


def test_synth_corpus_deterministic_and_skewed(spark):
    c1 = synth_corpus(spark, 50, partitions=2).orderBy("path").collect()
    c2 = synth_corpus(spark, 50, partitions=7).orderBy("path").collect()
    assert [r["content_sha256"] for r in c1] == [r["content_sha256"] for r in c2]
    joined = " ".join(r["content"] for r in c1)
    assert "import" in joined and "return" in joined


def test_build_refuses_duplicate_doc_ids(spark):
    """Pre-assigned doc ids must be unique (Lucene ids are unique by
    construction); a collision would silently merge two docs' postings."""
    from lucene_solr_spark.corpus import stamp_sha256

    schema = (
        "doc_id long, repo string, path string, commit string, "
        "lang string, content string"
    )
    dup = spark.createDataFrame(
        [(0, "r", "a", "c", "en", "order"), (0, "r", "b", "c", "en", "batch")],
        schema,
    )
    with pytest.raises(ValueError, match="doc_id column has duplicates"):
        build_index(spark, stamp_sha256(dup), out_dir=None)
