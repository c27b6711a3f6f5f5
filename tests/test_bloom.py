"""Terms bloom filter (functions/bloom.py) — BloomFilteringPostingsFormat
analog: no false negatives ever, bounded false positives, driver-side
short-circuit for absent terms, bit-parity with the un-bloomed path."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from lucene_solr_spark.corpus import synth_corpus
from lucene_solr_spark.functions.bloom import TermBloom
from lucene_solr_spark.operators.indexer import assign_doc_ids, build_index
from lucene_solr_spark.operators.search import Searcher


@pytest.fixture(scope="module")
def built(spark):
    corpus = assign_doc_ids(
        synth_corpus(spark, 120, partitions=4), ["repo", "path", "commit"]
    )
    seg = build_index(spark, corpus, out_dir=None, bucket_docs=64)
    return seg, TermBloom.build(spark, seg, fp=0.01)


def test_no_false_negatives(spark, built):
    seg, bloom = built
    terms = [r["term"] for r in seg.table(spark, "terms").select("term").collect()]
    assert terms
    missing = [t for t in terms if not bloom.might_contain(t)]
    assert missing == []


def test_false_positive_rate_bounded(spark, built):
    _, bloom = built
    probes = [f"absent{i}token" for i in range(2000)]
    fp = sum(bloom.might_contain(t) for t in probes) / len(probes)
    assert fp <= 0.05, fp  # target 1%, generous margin


def test_roundtrip_bytes(built):
    _, bloom = built
    again = TermBloom.from_bytes(bloom.to_bytes())
    assert again.n_bits == bloom.n_bits and again.n_hashes == bloom.n_hashes
    assert np.array_equal(again.bits, bloom.bits)
    assert again.might_contain("import") == bloom.might_contain("import")


def test_searcher_short_circuit_and_parity(spark, built):
    seg, bloom = built
    plain = Searcher(spark, seg)
    pruned = Searcher(spark, seg)
    pruned.attach_bloom(bloom)
    # absent terms answer with zero jobs (empty stats without a scan)
    assert pruned.term_stats(["zzzneverqqq", "alsoabsent9x"]) == {}
    # present-term rankings are bit-identical with and without the bloom
    a = [tuple(r) for r in plain.topk("import return", k=10).collect()]
    b = [tuple(r) for r in pruned.topk("import return", k=10).collect()]
    assert a == b and a


def test_multisearcher_bloom(spark, built):
    from lucene_solr_spark.operators.search import MultiSearcher

    seg, _ = built
    ms = MultiSearcher(spark, [seg])
    ms.attach_bloom()
    assert ms.term_stats(["zzzneverqqq"]) == {}
    a = [tuple(r) for r in ms.search("import return", k=10).collect()]
    ms2 = MultiSearcher(spark, [seg])
    b = [tuple(r) for r in ms2.search("import return", k=10).collect()]
    assert a == b and a


def test_bloom_cross_dataset_dedup(spark):
    from lucene_solr_spark.operators.dedup import bloom_dedup_against

    ref = spark.createDataFrame(
        [(f"k{i}",) for i in range(0, 400, 2)], "h string"
    )
    inc = spark.createDataFrame(
        [(i, f"k{i}") for i in range(400)], "doc_id long, h string"
    )
    ann = bloom_dedup_against(spark, ref, inc, "h", fp=1e-3)
    rows = {int(r["doc_id"]): bool(r["maybe_dup"]) for r in ann.collect()}
    # no false negatives: every even key (a true dup) must be flagged
    assert all(rows[i] for i in range(0, 400, 2))
    # bloom-cleared docs are guaranteed new
    cleared = {i for i, m in rows.items() if not m}
    assert all(i % 2 == 1 for i in cleared)
    # most odd keys clear (fp target 1e-3; generous bound)
    assert len(cleared) >= 190
