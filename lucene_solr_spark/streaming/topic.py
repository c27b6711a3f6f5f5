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

    def pending_segments(self) -> list:
        """Committed segments not yet delivered, in commit order."""
        seen = set(self._load()["delivered"])
        return [
            s for s in self.catalog.segments() if s.segment_id not in seen
        ]

    def drain(
        self, spark: SparkSession, columns: list[str] | None = None
    ) -> DataFrame:
        """Deliver every doc of the not-yet-delivered segments and commit
        the checkpoint. The returned DataFrame is MATERIALIZED (count
        forced) before the checkpoint moves, so a crash during the read
        redelivers rather than loses. Tombstoned docs are excluded the
        same way a searcher would exclude them."""
        pending = self.pending_segments()
        state = self._load()
        if not pending:
            return spark.createDataFrame([], "doc_id long, segment_id string")
        parts = []
        for seg in pending:
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
        out = out.persist()
        out.count()  # materialize BEFORE the checkpoint commit
        state["delivered"] = sorted(
            set(state["delivered"]) | {s.segment_id for s in pending}
        )
        state["gen"] = state.get("gen", 0) + 1
        self._store(state)
        return out
