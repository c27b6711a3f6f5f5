"""Cross-catalog replication (CDCR / ReplicationHandler analog).

Reference analogs:
- solr/core/.../handler/ReplicationHandler.java: followers pull immutable
  index files for the segments named by the leader's latest commit point,
  then flip their own commit atomically.
- solr/core/.../handler/CdcrReplicator.java + CdcrUpdateLog: cross-DC
  forwarding is checkpointed on the TARGET (last source generation applied)
  and idempotent on replay.

Our segments are immutable parquet directories and the commit point is one
JSON file (catalog.py#commit_swap), so replication is exactly the reference
shape: ship missing segment dirs (staged copy + atomic rename), forward the
tombstone table, then ONE atomic commit swap on the target. A crash at any
point leaves the target on its previous commit; re-running resumes (already
-shipped segments are skipped, staging leftovers are swept).

At 100 TB the file copy is a distributed `DistCp`-style job over object
storage and the commit flip is an Iceberg snapshot commit on the replica
catalog — same control flow, different byte mover.
"""

from __future__ import annotations

import json
import os
import shutil
import uuid

from pyspark.sql import SparkSession

from ..sources.catalog import MANIFEST, Catalog

CHECKPOINT = "_replication.json"


def _checkpoint_path(dst: Catalog) -> str:
    return os.path.join(dst.root, CHECKPOINT)


def read_checkpoint(dst: Catalog) -> dict:
    p = _checkpoint_path(dst)
    if not os.path.exists(p):
        return {"src_gen": -1}
    with open(p) as f:
        return json.load(f)


def _write_checkpoint(dst: Catalog, doc: dict) -> None:
    tmp = _checkpoint_path(dst) + f".tmp-{uuid.uuid4().hex[:6]}"
    with open(tmp, "w") as f:
        json.dump(doc, f)
    os.replace(tmp, _checkpoint_path(dst))


def _sweep_staging(dst: Catalog) -> None:
    for d in os.listdir(dst.root):
        if d.startswith("_incoming-"):
            shutil.rmtree(os.path.join(dst.root, d), ignore_errors=True)


def _ship_segment(src_root: str, dst_root: str, seg_id: str) -> None:
    """Copy one immutable segment dir: stage under an underscore-prefixed
    name (never listed by the catalog scan), then atomic rename."""
    final = os.path.join(dst_root, seg_id)
    if os.path.exists(os.path.join(final, MANIFEST)):
        return  # already shipped (resume path)
    staging = os.path.join(dst_root, f"_incoming-{seg_id}")
    if os.path.exists(staging):
        shutil.rmtree(staging)
    shutil.copytree(os.path.join(src_root, seg_id), staging)
    if os.path.exists(final):  # partial dir without manifest: replace
        shutil.rmtree(final)
    os.replace(staging, final)


def _ship_deletes(spark: SparkSession, src: Catalog, dst: Catalog) -> None:
    """Forward the tombstone table (CDCR forwards deletes as operations;
    ours is last-writer-wins table replacement — tombstones are keyed by
    (segment_id, doc_id) and segments are immutable, so the source table
    is authoritative)."""
    sdel = src.deletes(spark)
    tmp = dst._deletes_path + f".tmp-{uuid.uuid4().hex[:6]}"
    sdel.write.mode("overwrite").parquet(tmp)
    if os.path.isdir(dst._deletes_path):
        shutil.rmtree(dst._deletes_path)
    os.replace(tmp, dst._deletes_path)


def replicate(spark: SparkSession, src: Catalog, dst: Catalog) -> dict:
    """One replication pass: make ``dst`` serve exactly ``src``'s current
    commit. Idempotent; incremental (only missing segments are copied);
    atomic from a reader's point of view (single commit swap at the end).

    Returns {"src_gen", "shipped", "removed", "up_to_date"}.
    """
    src_doc = src._commit_doc()
    if src_doc is None:
        src.commit_swap()  # materialize a commit point to replicate
        src_doc = src._commit_doc()
    src_gen = int(src_doc["gen"])
    src_ids = list(src_doc["segments"])

    ckpt = read_checkpoint(dst)
    if ckpt.get("src_gen") == src_gen:
        return {"src_gen": src_gen, "shipped": [], "removed": [], "up_to_date": True}

    shipped = []
    for seg_id in src_ids:
        final = os.path.join(dst.root, seg_id)
        if not os.path.exists(os.path.join(final, MANIFEST)):
            _ship_segment(src.root, dst.root, seg_id)
            shipped.append(seg_id)

    _ship_deletes(spark, src, dst)

    dst_ids = {s.segment_id for s in dst.segments()}
    to_remove = sorted(dst_ids - set(src_ids))
    to_add = [i for i in src_ids if i not in dst_ids]
    dst.commit_swap(add=to_add, remove=to_remove)
    for seg_id in to_remove:  # physical reclaim after the commit flip
        dst.drop(seg_id)

    _write_checkpoint(dst, {"src_gen": src_gen, "segments": src_ids})
    _sweep_staging(dst)
    return {
        "src_gen": src_gen,
        "shipped": shipped,
        "removed": to_remove,
        "up_to_date": False,
    }
