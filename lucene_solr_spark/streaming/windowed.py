"""Watermarked tumbling-window aggregation — the Structured Streaming
windowed-agg contract made driver-visible.

Reference analog: Solr's timeseries / range-facet rollups run at query time
over a static index; the streaming restatement keeps the same bucketed
counts incrementally, with the standard event-time watermark contract
(SURVEY.md §2.I): a window is emitted (append mode) once the watermark
passes its end, and input older than the watermark is dropped.

Spark-first: this is plain ``withWatermark + groupBy(window(...))`` —
state lives in the HDFS-backed state store per (window, key) partition,
append-mode file sink, resumable via the checkpoint. No custom code in
the hot path; at 100 TB the only knobs are shuffle partitions (state
distribution) and the watermark delay (state size bound).
"""

from __future__ import annotations

from typing import Any

EVENTS_SCHEMA = (
    "event_id long, ts timestamp_ntz, user_id long, event_type string, "
    "value double, props string"
)


def tumbling_counts_stream(events, window: str = "6 hours", delay: str = "1 hour"):
    """(window, event_type) counts with an event-time watermark."""
    from pyspark.sql import functions as F

    return (
        events.withColumn("ts", F.col("ts").cast("timestamp"))
        .withWatermark("ts", delay)
        .groupBy(F.window("ts", window), "event_type")
        .count()
    )


def tumbling_counts_available(
    spark: Any,
    input_dir: str,
    out_dir: str,
    checkpoint_dir: str,
    window: str = "6 hours",
    delay: str = "1 hour",
) -> None:
    """Drain-and-stop runner: watch a parquet directory of events, append
    CLOSED windows (watermark past window end) to a parquet sink. Each
    drain resumes the prior watermark from the checkpoint, so a batch of
    late events older than the restored watermark is dropped — the
    append-mode contract this operator exists to demonstrate."""
    ev = spark.readStream.schema(EVENTS_SCHEMA).parquet(input_dir)
    q = (
        tumbling_counts_stream(ev, window=window, delay=delay)
        .writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def interval_join_stream(views, purchases, horizon: str = "30 minutes",
                         delay: str = "1 hour"):
    """Stream-stream event-time interval join: each 'view' joins the same
    user's 'purchase' events landing within ``horizon`` AFTER the view.

    Spark-first restatement of the follow-on-event pattern (Structured
    Streaming inner interval join): both sides carry watermarks, the join
    range condition bounds the state each side must hold (view state can
    be dropped once the purchase-side watermark passes view.ts + horizon —
    Spark derives that bound from the BETWEEN predicate). At 100 TB the
    state size is watermark-bounded per user partition; no custom
    operator, no replay."""
    from pyspark.sql import functions as F

    v = (
        views.withColumn("v_ts", F.col("ts").cast("timestamp"))
        .withWatermark("v_ts", delay)
        .select(F.col("event_id").alias("view_id"),
                F.col("user_id").alias("v_user"), "v_ts")
    )
    p = (
        purchases.withColumn("p_ts", F.col("ts").cast("timestamp"))
        .withWatermark("p_ts", delay)
        .select(F.col("event_id").alias("purchase_id"),
                F.col("user_id").alias("p_user"), "p_ts")
    )
    return v.join(
        p,
        F.expr(
            f"v_user = p_user AND p_ts >= v_ts AND "
            f"p_ts <= v_ts + interval {horizon}"
        ),
    )


def interval_join_available(
    spark, input_dir: str, out_dir: str, checkpoint_dir: str,
    horizon: str = "30 minutes", delay: str = "1 hour",
) -> None:
    """Drain-and-stop runner for the interval join over a parquet events
    feed (views and purchases split from one stream)."""
    ev = spark.readStream.schema(EVENTS_SCHEMA).parquet(input_dir)
    from pyspark.sql import functions as F

    out = interval_join_stream(
        ev.filter(F.col("event_type") == "view"),
        ev.filter(F.col("event_type") == "purchase"),
        horizon=horizon,
        delay=delay,
    )
    q = (
        out.writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
