"""Incremental indexing via Structured Streaming — NRT/tlog-replay analogs.

Covers: drain-and-stop ingest (availableNow), checkpointed resume (only new
files processed on the second drain), atomic visibility via the catalog,
and equality with a batch-built control index (the reference's
distributed-vs-control test pattern, SURVEY.md §5.1).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from lucene_solr_spark.corpus import synth_corpus
from lucene_solr_spark.operators.indexer import assign_doc_ids, build_index
from lucene_solr_spark.operators.merge import maybe_compact
from lucene_solr_spark.operators.search import MultiSearcher, Searcher
from lucene_solr_spark.sources.catalog import Catalog
from lucene_solr_spark.streaming.ingest import ingest_available

N_DOCS = 160


@pytest.fixture(scope="module")
def corpus(spark):
    c = synth_corpus(spark, N_DOCS, partitions=4)
    return assign_doc_ids(c, ["repo", "path", "commit"]).persist()


def _write_chunk(corpus, pred, input_dir, name):
    """Land one new parquet file in the watched directory (the file-source
    contract: new files appear atomically at the top level)."""
    import glob
    import os
    import shutil
    import tempfile

    tmp = tempfile.mkdtemp()
    (
        corpus.filter(pred)
        .drop("doc_id", "content_sha256")
        .coalesce(1)
        .write.mode("overwrite")
        .parquet(tmp)
    )
    os.makedirs(input_dir, exist_ok=True)
    (part,) = glob.glob(os.path.join(tmp, "part-*.parquet"))
    shutil.move(part, os.path.join(input_dir, f"{name}.parquet"))
    shutil.rmtree(tmp)


def test_streaming_ingest_resume_and_compact(spark, corpus, tmp_path):
    input_dir = str(tmp_path / "in")
    ckpt = str(tmp_path / "ckpt")
    cat = Catalog(str(tmp_path / "cat"))
    half = N_DOCS // 2

    # drain 1: first half of the corpus
    _write_chunk(corpus, F.col("doc_id") < half, input_dir, "c0")
    ingest_available(spark, input_dir, cat, ckpt, bucket_docs=64)
    segs = cat.segments()
    assert sum(s.stats.n_docs for s in segs) == half

    ms = MultiSearcher.from_catalog(spark, cat)
    assert ms.topk("import return", k=5).count() > 0

    # drain 2: second half arrives; checkpoint must skip chunk 0
    _write_chunk(corpus, F.col("doc_id") >= half, input_dir, "c1")
    ingest_available(spark, input_dir, cat, ckpt, bucket_docs=64)
    segs = cat.segments()
    assert sum(s.stats.n_docs for s in segs) == N_DOCS
    assert len(segs) >= 2

    # drain 3: nothing new -> no new docs (offsets are the subscriber state)
    ingest_available(spark, input_dir, cat, ckpt, bucket_docs=64)
    assert sum(s.stats.n_docs for s in cat.segments()) == N_DOCS

    # compact to one segment; equals the batch-built control
    maybe_compact(spark, cat, bucket_docs=64, size_ratio=10.0, max_merge_at_once=20)
    segs = cat.segments()
    assert len(segs) == 1 and segs[0].stats.n_docs == N_DOCS

    control = build_index(
        spark, corpus.drop("doc_id"), out_dir=None, bucket_docs=64
    )
    s_stream = Searcher(spark, segs[0])
    s_ctrl = Searcher(spark, control)
    for q in ["import return def", "getnode parseindex", "public self merge"]:
        a = [(r["doc_id"], r["score"]) for r in s_stream.topk(q, k=10).collect()]
        b = [(r["doc_id"], r["score"]) for r in s_ctrl.topk(q, k=10).collect()]
        assert a == b, f"streamed+compacted != batch control for {q!r}"


def test_stateful_sessionize_matches_batch(spark, tmp_path):
    """applyInPandasWithState session windows: closed sessions emitted
    across three drains (time-split chunks + a watermark-advancing
    sentinel) must equal the batch sessionization of the full event set."""
    import glob
    import os
    import shutil
    import tempfile

    from lucene_solr_spark.plans.driver_queries import _read
    from lucene_solr_spark.streaming.sessionize import (
        SESSION_GAP_US,
        sessionize_available,
    )

    sf_dir = "/root/testdata/sf0.001"
    events = _read(spark, sf_dir, "events")
    mid, hi = events.selectExpr(
        "percentile(unix_micros(CAST(ts AS TIMESTAMP)), 0.5)",
        "max(unix_micros(CAST(ts AS TIMESTAMP)))",
    ).collect()[0]
    mid = int(mid)

    input_dir = str(tmp_path / "ev_in")
    out_dir = str(tmp_path / "ev_out")
    ckpt = str(tmp_path / "ev_ckpt")

    def land(df, name):
        tmp = tempfile.mkdtemp()
        df.coalesce(1).write.mode("overwrite").parquet(tmp)
        os.makedirs(input_dir, exist_ok=True)
        (part,) = glob.glob(os.path.join(tmp, "part-*.parquet"))
        shutil.move(part, os.path.join(input_dir, f"{name}.parquet"))
        shutil.rmtree(tmp)

    tus = F.unix_micros(F.col("ts").cast("timestamp"))
    land(events.filter(tus <= mid), "c0")
    sessionize_available(spark, input_dir, out_dir, ckpt)
    land(events.filter(tus > mid), "c1")
    sessionize_available(spark, input_dir, out_dir, ckpt)
    # sentinel far past the end: watermark passes every last+gap -> all
    # remaining open sessions time out and flush
    sentinel = spark.createDataFrame(
        [(10**9, None, -1, "flush", 0.0, "{}")],
        "event_id long, ts timestamp_ntz, user_id long, event_type string, value double, props string",
    ).withColumn(
        "ts",
        F.timestamp_micros(F.lit(int(hi) + 100 * SESSION_GAP_US)).cast(
            "timestamp_ntz"
        ),
    )
    land(sentinel, "c2")
    sessionize_available(spark, input_dir, out_dir, ckpt)
    land(sentinel.withColumn("event_id", F.lit(10**9 + 1)), "c3")
    sessionize_available(spark, input_dir, out_dir, ckpt)

    got = {
        (r["user_id"], r["start_us"], r["n_events"], r["duration_us"])
        for r in spark.read.parquet(out_dir).filter("user_id >= 0").collect()
    }
    # full batch mirror (no limit) for the comparison
    from pyspark.sql import Window

    e = events.select(
        "user_id", "event_id", tus.alias("tus"), "ts"
    )
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    marks = e.withColumn("prev", F.lag("tus").over(w)).withColumn(
        "new_s",
        F.when(
            F.col("prev").isNull()
            | (F.col("tus") - F.col("prev") > SESSION_GAP_US),
            1,
        ).otherwise(0),
    )
    wcum = Window.partitionBy("user_id").orderBy("tus").rowsBetween(
        Window.unboundedPreceding, 0
    )
    want = {
        (r["user_id"], r["start_us"], r["n_events"], r["duration_us"])
        for r in marks.withColumn("sid", F.sum("new_s").over(wcum))
        .groupBy("user_id", "sid")
        .agg(
            F.count("*").alias("n_events"),
            (F.max("tus") - F.min("tus")).cast("long").alias("duration_us"),
            F.min("tus").cast("long").alias("start_us"),
        )
        .collect()
    }
    assert got == want and got


def test_stream_stream_interval_join_equals_batch(spark):
    """Incremental view->purchase interval join across two drains equals
    the batch interval join (streaming/windowed.py#interval_join_stream)."""
    import shutil

    from pyspark.sql import functions as F

    from lucene_solr_spark.streaming.windowed import interval_join_available

    root = "/tmp/spark_graft_ssj_test"
    shutil.rmtree(root, ignore_errors=True)
    ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    for b in (ev.filter(F.col("ts") < "2024-01-20"),
              ev.filter(F.col("ts") >= "2024-01-20")):
        b.coalesce(1).write.mode("append").parquet(root + "/in")
        interval_join_available(spark, root + "/in", root + "/out", root + "/ckpt")
    got = {
        (int(r["view_id"]), int(r["purchase_id"]))
        for r in spark.read.parquet(root + "/out").collect()
    }
    v = ev.filter("event_type = 'view'").select(
        F.col("event_id").alias("view_id"), "user_id", F.col("ts").alias("v_ts")
    )
    p = ev.filter("event_type = 'purchase'").select(
        F.col("event_id").alias("purchase_id"),
        F.col("user_id").alias("p_user"), F.col("ts").alias("p_ts"),
    )
    want = {
        (int(r["view_id"]), int(r["purchase_id"]))
        for r in v.join(
            p,
            (v.user_id == p.p_user)
            & (p.p_ts >= v.v_ts)
            & (p.p_ts <= v.v_ts + F.expr("interval 30 minutes")),
        ).collect()
    }
    assert got == want and want
