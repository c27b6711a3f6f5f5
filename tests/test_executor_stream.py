"""ExecutorStream (solrj/io/stream/ExecutorStream.java analog):
stored-query scheduling over the engine — union-DAG execution, per-query
parity with individual runs, log-and-continue tolerant mode."""

from __future__ import annotations

import pytest

from lucene_solr_spark.corpus import documents_as_corpus
from lucene_solr_spark.operators.indexer import build_index
from lucene_solr_spark.operators.search import Searcher
from lucene_solr_spark.streaming.executor_stream import executor_stream

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def searcher(spark):
    seg = build_index(
        spark, documents_as_corpus(spark, SF_DIR), out_dir=None, bucket_docs=256
    )
    return Searcher(spark, seg)


STORED = [("a", "batch order"), ("b", "merge"), ("c", "scan stream table")]


def test_union_matches_individual_runs(spark, searcher):
    got = executor_stream(searcher, STORED, k=5).collect()
    by_q = {}
    for r in got:
        by_q.setdefault(r["query_id"], []).append((r["doc_id"], r["score"]))
    for qid, qs in STORED:
        solo = [
            (r["doc_id"], r["score"])
            for r in searcher.search(qs, k=5).collect()
        ]
        assert sorted(by_q.get(qid, [])) == sorted(solo), qid
    # every stored query contributed
    assert set(by_q) == {q for q, _ in STORED}


def test_single_lazy_plan_no_driver_rows(spark, searcher):
    # the union is returned UNEXECUTED: building it runs no jobs beyond
    # the per-query stats pre-pass (ExecutorStream's task submission)
    df = executor_stream(searcher, STORED, k=3)
    assert df.schema.simpleString().startswith(
        "struct<query_id:string,doc_id:bigint,score:float"
    )
    assert df.count() <= 3 * len(STORED)


def test_tolerant_skips_and_records(spark, searcher):
    errors: list = []
    stored = [("ok", "merge"), ("bad", '"unbalanced phrase'), ("ok2", "batch")]
    df = executor_stream(searcher, stored, k=3, tolerant=True, errors=errors)
    got = {r["query_id"] for r in df.collect()}
    assert got == {"ok", "ok2"}
    assert len(errors) == 1 and errors[0][0] == "bad"


def test_intolerant_raises(spark, searcher):
    with pytest.raises(Exception):
        executor_stream(searcher, [("bad", '"unbalanced phrase')], k=3)


def test_empty_stored_list(spark, searcher):
    df = executor_stream(searcher, [], k=3)
    assert df.count() == 0
    assert [f.name for f in df.schema.fields] == ["query_id", "doc_id", "score"]
