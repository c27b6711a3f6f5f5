"""ParallelStream — hash-partitioned worker execution of a rollup
(solrj/io/stream/ParallelStream.java wrapping RollupStream over a
partitionKeys-routed stream, solrj/io/stream/RollupStream.java) — and
DrillStream, its export-sorted range sibling
(solrj/io/stream/DrillStream.java + the /export handler's drill mode).

The reference sends the same stream expression to N workers; each worker
receives ONLY the documents whose partition key hashes to it
(HashQParserPlugin's `{!hash workers=N worker=i}` route), rolls its sorted
stream up with O(1) state (one open group tuple), and the client unions
worker outputs — correct because the hash route puts every key on exactly
one worker.

Spark-first mapping: `repartition(workers, key)` IS the hash route (one
exchange), `sortWithinPartitions(key)` is the worker's sorted stream, and
the rollup runs as an Arrow-batched mapInPandas kernel that carries ONE
open group across batch boundaries — the reference worker's exact state
shape. No second shuffle and no final aggregation exchange: the union of
per-partition outputs is already the answer. At 100 TB this is the shape
that wins when the key cardinality is huge (a groupBy would shuffle the
same bytes but also build a hash map per task); for small cardinalities
plain groupBy's partial aggregation wins — the operator documents, not
hides, that trade.

DrillStream differs only in the route: drill's shards are RANGE slices of
the export sort order, so `repartitionByRange(key)` replaces the hash
route. Equal keys still land on exactly one partition, each partition
rolls up its sorted slice with the same open-group kernel, and the union
of partition outputs needs NO final combine — it is disjoint and globally
ordered by construction (the reference's sort-merge of shard streams
degenerates to concatenation).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _open_group_kernel(key: str, sum_cols: list[str]):
    """The worker kernel shared by ParallelStream and DrillStream: roll a
    key-sorted partition up (count + per-column sums) carrying ONE open
    group across Arrow batch boundaries."""

    # sentinel for the NULL-key group: pandas groupby would either drop
    # null rows (dropna default) or sort NaN LAST while Spark's
    # sortWithinPartitions put nulls FIRST — both break the one-open-group
    # carry. Nulls are split out and processed first, matching the
    # partition's physical order.
    _NULL = object()
    out_cols = [key, "n"] + [f"sum_{c}" for c in sum_cols]

    def roll(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        open_key = None
        open_n = 0
        open_sums = [0.0] * len(sum_cols)
        for pdf in batches:
            if pdf.empty:
                continue
            done_rows = []
            null_mask = pdf[key].isna()
            groups = []
            if null_mask.any():
                groups.append((_NULL, pdf[null_mask]))
            # groups are contiguous: the partition is sorted by key
            groups.extend(pdf[~null_mask].groupby(key, sort=True))
            for k, g in groups:
                if open_key is not None and k != open_key:
                    done_rows.append(
                        [None if open_key is _NULL else open_key,
                         open_n, *open_sums]
                    )
                    open_key, open_n = None, 0
                    open_sums = [0.0] * len(sum_cols)
                if open_key is None:
                    open_key = k
                open_n += len(g)
                for i, c in enumerate(sum_cols):
                    open_sums[i] += float(g[c].sum())
            if done_rows:
                yield pd.DataFrame(done_rows, columns=out_cols)
        if open_key is not None:
            yield pd.DataFrame(
                [[None if open_key is _NULL else open_key, open_n, *open_sums]],
                columns=out_cols,
            )

    return roll


def _rollup_schema(df: DataFrame, key: str, sum_cols: list[str]) -> str:
    key_type = df.schema[key].dataType.simpleString()
    return ", ".join(
        [f"{key} {key_type}", "n long"] + [f"sum_{c} double" for c in sum_cols]
    )


def parallel_rollup(
    df: DataFrame,
    key: str,
    sum_cols: list[str],
    workers: int,
) -> DataFrame:
    """Roll ``df`` up by ``key`` (count + per-column sums) on ``workers``
    hash-routed partitions, one streaming pass per worker."""
    routed = df.select(key, *sum_cols).repartition(
        workers, F.col(key)
    ).sortWithinPartitions(key)
    return routed.mapInPandas(
        _open_group_kernel(key, sum_cols), _rollup_schema(df, key, sum_cols)
    )


def drill_rollup(
    df: DataFrame,
    key: str,
    sum_cols: list[str],
    workers: int,
) -> DataFrame:
    """DrillStream: the same rollup over RANGE-routed export-sorted
    slices; output partitions are disjoint and globally key-ordered, so
    no final combine or sort-merge runs."""
    routed = (
        df.select(key, *sum_cols)
        .repartitionByRange(workers, F.col(key))
        .sortWithinPartitions(key)
    )
    return routed.mapInPandas(
        _open_group_kernel(key, sum_cols), _rollup_schema(df, key, sum_cols)
    )
