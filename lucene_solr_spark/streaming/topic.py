"""Topic stream — checkpointed pub/sub over the index.

Reference surface being re-expressed (SURVEY.md §2.I "topic stream"):
  solr/solrj/.../io/stream/TopicStream.java — a persistent subscriber
    that, on each run(), delivers documents whose ``_version_`` is newer
    than its stored checkpoint and then persists the new checkpoint, so a
    restarted consumer resumes where it left off instead of replaying the
    collection.

Spark restatement: segments are immutable and the catalog's commit file
is the published state, so the natural version axis is the SEGMENT — a
checkpoint is the set of segment ids already delivered (plus the commit
generation it saw). A drain reads the docs of the not-yet-delivered
committed segments (a partition-pruned union of their docmaps — never a
rescan of delivered data) and atomically persists the updated checkpoint
AFTER the read materializes. Crash semantics match the reference:
  * crash AFTER a completed drain -> the next consumer (same checkpoint
    path) delivers nothing twice — each doc exactly once across drains;
  * crash MID-drain (before the checkpoint write) -> that batch is
    redelivered in full (at-least-once within an uncommitted batch, the
    same contract TopicStream has between checkpoint persists).
"""

from __future__ import annotations

import json
import os
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.catalog import Catalog


class TopicStream:
    """A named, resumable subscriber over a catalog."""

    def __init__(self, catalog: Catalog, checkpoint_path: str):
        self.catalog = catalog
        self.checkpoint_path = checkpoint_path

    # ---- checkpoint IO (atomic, same tmp+rename protocol as the commit
    # file — a reader sees the old checkpoint or the new one, never a
    # truncated write) ------------------------------------------------------

    def _load(self) -> dict:
        if not os.path.exists(self.checkpoint_path):
            return {"delivered": [], "gen": 0}
        with open(self.checkpoint_path) as f:
            return json.load(f)

    def _store(self, doc: dict) -> None:
        os.makedirs(os.path.dirname(self.checkpoint_path) or ".", exist_ok=True)
        tmp = self.checkpoint_path + f".tmp-{uuid.uuid4().hex[:6]}"
        with open(tmp, "w") as f:
            json.dump(doc, f)
        os.replace(tmp, self.checkpoint_path)

    # ---- the subscriber ----------------------------------------------------

    def _split_pending(self) -> tuple[list, list]:
        """(to_deliver, to_absorb): committed segments not yet delivered.
        A MERGE/compaction product whose entire lineage was already
        delivered is ABSORBED — marked delivered without redelivery
        (TopicStream.java's version checkpoint does not replay merged
        data). A merge mixing delivered and undelivered sources is
        delivered whole (at-least-once for that edge — drain before
        compacting, or merge before subscribing, to avoid it)."""
        seen = set(self._load()["delivered"])
        deliver, absorb = [], []
        for s in self.catalog.segments():
            if s.segment_id in seen:
                continue
            lin = list(s.lineage or [])
            if lin and all(a in seen for a in lin):
                absorb.append(s.segment_id)
            else:
                deliver.append(s)
        return deliver, absorb

    def pending_segments(self) -> list:
        """Committed segments whose docs the next drain will deliver."""
        return self._split_pending()[0]

    def drain(
        self, spark: SparkSession, columns: list[str] | None = None
    ) -> DataFrame:
        """Deliver every doc of the not-yet-delivered segments and commit
        the checkpoint. The read is MATERIALIZED (count forced) before
        the checkpoint moves, so a crash during the read redelivers
        rather than loses (segments are immutable — the returned plan
        recomputes deterministically). Tombstoned docs are excluded the
        same way a searcher would exclude them."""
        deliver, absorb = self._split_pending()
        state = self._load()
        if not deliver:
            if absorb:  # merged-away segments: advance without delivery
                state["delivered"] = sorted(set(state["delivered"]) | set(absorb))
                state["gen"] = state.get("gen", 0) + 1
                self._store(state)
            # empty result with the SAME schema a delivering drain returns
            segs = self.catalog.segments()
            if segs:
                dm = segs[0].table(spark, "docmap").withColumn(
                    "segment_id", F.lit(segs[0].segment_id)
                )
                if columns is not None:
                    dm = dm.select("doc_id", "segment_id", *columns)
                return dm.limit(0)
            return spark.createDataFrame([], "doc_id long, segment_id string")
        parts = []
        for seg in deliver:
            dm = seg.table(spark, "docmap").withColumn(
                "segment_id", F.lit(seg.segment_id)
            )
            parts.append(dm if columns is None else dm.select(
                "doc_id", "segment_id", *columns
            ))
        out = parts[0]
        for p in parts[1:]:
            out = out.unionByName(p)
        deletes = self.catalog.deletes(spark)
        if deletes is not None:
            out = out.join(
                F.broadcast(deletes.select("segment_id", "doc_id")),
                ["segment_id", "doc_id"],
                "left_anti",
            )
        out.count()  # prove readability BEFORE the checkpoint commit
        state["delivered"] = sorted(
            set(state["delivered"])
            | {s.segment_id for s in deliver}
            | set(absorb)
        )
        state["gen"] = state.get("gen", 0) + 1
        self._store(state)
        return out
