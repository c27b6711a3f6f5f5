"""Semantic pins for the coverage14 batch: the field mask composes spans a
single field can't express, the n-gram stride walk equals substring truth,
the daemon honors the blocking-queue / log-and-continue / EOF contract,
category routing sanitizes, and the delimited tf differs from raw counts."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

import __spark_entry__ as entry_mod  # noqa: F401  (registers the catalog)
from lucene_solr_spark.plans import coverage14_queries as c14
from lucene_solr_spark.streaming.daemon import DaemonClosed, DaemonStream

from .conftest import SF_DIR


# -- FieldMaskingSpanQuery ----------------------------------------------------


def test_field_mask_not_expressible_single_field(spark):
    """No body token is ever the alt token 'tab' — the masked clause
    matches only through the parallel field, so a single-field SpanNear
    on the same terms returns nothing."""
    d = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    toks = d.select(F.explode(F.split("text", " ")).alias("t"))
    assert toks.filter(F.col("t") == c14._FM_ALT).count() == 0
    rows = c14.field_masking_span_count(spark, SF_DIR).collect()
    assert rows and all(r.n_matches >= 1 for r in rows)


def test_field_mask_positions_align(spark):
    """Every counted match is an adjacency: alt prefix at p, body term at
    p+1 — recompute one doc by hand."""
    rows = c14.field_masking_span_count(spark, SF_DIR).collect()
    doc = rows[0]
    text = (
        spark.read.parquet(f"{SF_DIR}/documents.parquet")
        .filter(F.col("doc_id") == doc.doc_id)
        .first()
        .text
    )
    toks = text.split(" ")
    by_hand = sum(
        1
        for i in range(len(toks) - 1)
        if toks[i][:3] == c14._FM_ALT and toks[i + 1] == c14._FM_BODY
    )
    assert by_hand == doc.n_matches


# -- NGramPhraseQuery ---------------------------------------------------------


def test_ngram_stride_checks_are_sparse():
    """The optimization actually skips grams: for 'ld w' with n=2 only
    offsets {0, 2} are consulted, not every offset."""
    offs = [o for o, _ in c14._ngp_checks()]
    assert offs == [0, 2]
    assert len(offs) < len(c14._NGP_QUERY) - c14._NGP_N + 1


def test_ngram_phrase_equals_substring(spark):
    """Stride-gram matching == substring truth on every part row."""
    p = spark.read.parquet(f"{SF_DIR}/part.parquet")
    total = sum(
        r.n_parts for r in c14.ngram_phrase_match(spark, SF_DIR).collect()
    )
    assert total == p.filter(F.col("p_name").contains(c14._NGP_QUERY)).count()
    assert total > 0


# -- DaemonStream contract ----------------------------------------------------


def test_daemon_bounded_queue_blocks_producer():
    d = DaemonStream("d", lambda it: it, queue_size=2)
    assert d.tick() and d.tick()
    assert not d.tick()  # full: producer blocks, run refused
    assert d.iterations == 2
    assert d.read() == 0  # consumer drains the OLDEST first (FIFO)
    assert d.tick()  # space again
    assert d.iterations == 3


def test_daemon_log_and_continue_vs_terminate():
    def boom(it):
        if it == 1:
            raise ValueError("inner failure")
        return it

    d = DaemonStream("d", boom)
    assert d.tick()  # it=0 ok
    assert not d.tick()  # it=1 fails, logged, daemon stays OPEN
    assert d.info()["state"] == "OPEN"
    assert "inner failure" in d.info()["exception"]
    assert d.tick()  # continues (iterations still the run counter)
    assert d.iterations == 2

    t = DaemonStream("t", boom, terminate=True)
    assert t.tick()
    assert not t.tick()  # fails -> closes
    assert t.info()["state"] == "CLOSED"
    with pytest.raises(DaemonClosed):
        t.tick()


def test_daemon_eof_on_close():
    d = DaemonStream("d", lambda it: it)
    d.tick()
    d.close()
    assert d.read() == 0
    with pytest.raises(StopIteration):
        d.read()
    # read_latest on a fresh closed daemon stops before EOF
    d2 = DaemonStream("d2", lambda it: it)
    d2.tick()
    d2.tick()
    d2.close()
    assert d2.read_latest() == 1


def test_daemon_snapshot_lazy_and_iterations(spark):
    """The registered row returns a LAZY plan stamped with iterations=3."""
    df = c14.daemon_stream_snapshot(spark, SF_DIR)
    rows = df.collect()
    n_total = spark.read.parquet(f"{SF_DIR}/orders.parquet").count()
    assert sum(r.n_orders for r in rows) == n_total
    assert all(r.n_iterations == 3 for r in rows)


# -- CategoryRoutedAlias ------------------------------------------------------


def test_category_routing_sanitizes(spark):
    rows = c14.category_routed_partitions(spark, SF_DIR).collect()
    assert rows
    for r in rows:
        name = r.collection
        assert name.startswith("cust__")
        assert name == name.lower()
        assert all(ch.isalnum() or ch == "_" for ch in name)
    n_cust = spark.read.parquet(f"{SF_DIR}/customer.parquet").count()
    assert sum(r.n_docs for r in rows) == n_cust


# -- DelimitedTermFrequencyTokenFilter ---------------------------------------


def test_delimited_tf_differs_from_raw_counts(spark):
    """sum(tf) > count(*) wherever any injected tf exceeds 1 — the filter
    genuinely read the payload rather than counting occurrences."""
    rows = c14.delimited_term_freq(spark, SF_DIR).collect()
    assert rows
    assert all(r.total_tf > r.n_tokens for r in rows)
    # tf values only ever 1..3, so the sum is bounded by 3x occurrences
    assert all(r.total_tf <= 3 * r.n_tokens for r in rows)


@pytest.mark.parametrize(
    "name",
    [
        "field_masking_span_count",
        "ngram_phrase_match",
        "category_routed_partitions",
        "delimited_term_freq",
    ],
)
def test_no_python_eval(spark, name):
    df = entry_mod.queries()[name](spark, SF_DIR)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
