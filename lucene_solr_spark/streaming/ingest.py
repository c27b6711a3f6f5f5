"""Incremental / near-real-time indexing — Structured Streaming front end.

Reference mechanisms being re-expressed (SURVEY.md §2.I):
- NRT reopen / soft commit (index/DirectoryReader.java#openIfChanged,
  IndexWriter#getReader; Solr commitWithin): each micro-batch becomes a new
  immutable segment in the catalog; readers (MultiSearcher.from_catalog)
  see it atomically once its manifest lands.
- Transaction log + replay (solr/core/.../update/UpdateLog.java,
  TransactionLog.java): Structured Streaming's checkpoint/WAL is the tlog;
  a failed batch re-runs under the SAME batch_id, and because segment ids
  are derived from batch_id, the per-phase manifest markers make the
  re-run idempotent (phases already written are skipped).
- Background merging (index/ConcurrentMergeScheduler.java): after every
  ``compact_every`` batches the size-tiered policy (operators/merge.py)
  compacts small segments — the LSM shape: many small NRT segments in,
  few big ones retained.
- ``daemon`` stream (solrj/io/stream/DaemonStream.java): a continuous
  trigger (processingTime) re-running ingestion on an interval.
- ``topic`` stream (solrj/io/stream/TopicStream.java): checkpointed
  deliver-once-per-subscriber over a table — that is literally a
  file-source readStream with a checkpoint dir, provided here.

Scale note: each micro-batch runs the same two-shuffle build as the batch
path (doc-id rank + (term,bucket) block build) over only the new rows, so
ingest cost tracks batch size, not index size; compaction amortizes the
segment count. At 1000 executors the only growing state is the catalog
listing, which is O(segments), kept small by tiered merging.
"""

from __future__ import annotations

from typing import Callable

from pyspark.sql import DataFrame, SparkSession

from ..corpus import stamp_sha256
from ..operators.indexer import DEFAULT_BUCKET_DOCS, build_index
from ..operators.merge import maybe_compact
from ..sources.catalog import Catalog

CORPUS_SCHEMA = (
    "repo string, path string, commit string, lang string, content string"
)


def corpus_stream(spark: SparkSession, input_dir: str) -> DataFrame:
    """Topic-stream analog: a checkpointed parquet-directory source of
    corpus rows (new files = new docs)."""
    return spark.readStream.schema(CORPUS_SCHEMA).parquet(input_dir)


def ingest_batch(
    catalog: Catalog,
    batch_df: DataFrame,
    batch_id: int,
    bucket_docs: int = DEFAULT_BUCKET_DOCS,
    stream_id: str = "",
) -> None:
    """foreachBatch body: micro-batch -> one new segment.

    Segment id is a pure function of batch_id, so a replayed batch (after a
    crash, from the streaming WAL) re-enters the same segment directory and
    the phase markers turn the replay into a cheap no-op — exactly the
    tlog-replay recovery contract. A batch whose segment was already
    absorbed by compaction (it appears in a surviving segment's merged_from
    lineage) is skipped entirely: without this, a crash between
    maybe_compact and the streaming offset commit would rebuild the batch
    segment and duplicate its docs.

    ``stream_id`` namespaces the segment ids: REQUIRED (non-empty, unique
    per stream) when more than one stream feeds the same catalog, else
    their batch-derived segment ids collide and batches are skipped.
    """
    seg_id = f"{stream_id}batch{batch_id:08d}"
    live = catalog.segments()
    if any(seg_id == s.segment_id or seg_id in (s.lineage or []) for s in live):
        return
    if not batch_df.isEmpty():
        build_index(
            batch_df.sparkSession,
            stamp_sha256(batch_df),
            out_dir=catalog.root,
            bucket_docs=bucket_docs,
            segment_id=seg_id,
        )
        catalog.commit_swap(add=[seg_id])


def start_indexing_stream(
    stream_df: DataFrame,
    catalog: Catalog,
    checkpoint_dir: str,
    bucket_docs: int = DEFAULT_BUCKET_DOCS,
    compact_every: int = 0,
    trigger: dict | None = None,
    on_batch: Callable[[int], None] | None = None,
    stream_id: str = "",
):
    """Wire a streaming corpus DataFrame into the catalog.

    ``trigger``: kwargs for DataStreamWriter.trigger — e.g.
    ``{"availableNow": True}`` (drain-and-stop, the soft-commit batch shape)
    or ``{"processingTime": "30 seconds"}`` (daemon-stream analog).
    ``compact_every``: run one tiered-compaction round after every N batches
    (0 = never; compaction can also be run out-of-band).
    Returns the StreamingQuery; caller awaits/stops it.
    """

    def _body(batch_df: DataFrame, batch_id: int) -> None:
        ingest_batch(
            catalog, batch_df, batch_id, bucket_docs=bucket_docs, stream_id=stream_id
        )
        if compact_every and (batch_id + 1) % compact_every == 0:
            maybe_compact(batch_df.sparkSession, catalog, bucket_docs=bucket_docs)
        if on_batch is not None:
            on_batch(batch_id)

    writer = (
        stream_df.writeStream.foreachBatch(_body)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
    )
    writer = writer.trigger(**(trigger or {"availableNow": True}))
    return writer.start()


def ingest_available(
    spark: SparkSession,
    input_dir: str,
    catalog: Catalog,
    checkpoint_dir: str,
    bucket_docs: int = DEFAULT_BUCKET_DOCS,
    compact_every: int = 0,
    stream_id: str = "",
) -> None:
    """One drain cycle: index every not-yet-seen file under ``input_dir``
    into the catalog, then stop (availableNow). Re-invoking later picks up
    only NEW files — the checkpoint is the subscriber offset (topic-stream
    semantics). Pass a distinct ``stream_id`` per (input_dir, checkpoint)
    pair when several streams share one catalog."""
    q = start_indexing_stream(
        corpus_stream(spark, input_dir),
        catalog,
        checkpoint_dir,
        bucket_docs=bucket_docs,
        compact_every=compact_every,
        trigger={"availableNow": True},
        stream_id=stream_id,
    )
    q.awaitTermination()
