"""ExecutorStream — stored-query scheduling
(solrj/io/stream/ExecutorStream.java; see also DaemonStream for the
long-running variant already in streaming/ingest.py).

Solr's ExecutorStream wraps an inner stream whose tuples each carry a
serialized streaming expression in ``expr_s`` and executes them on a
``threads``-wide worker pool, logging-and-continuing when one task
fails. The Spark-first analog inverts the parallelism: the stored
queries are CONTROL PLANE — a bounded task list, exactly the
reference's in-memory work queue, so iterating it on the driver is the
same O(tasks) cost Solr pays — and each query compiles to the engine's
LAZY per-bucket scoring plan. All plans union into ONE DataFrame, so
one Spark DAG executes every stored query and the scheduler runs their
stages concurrently across the whole cluster (the ``threads=N`` pool
generalized to executor-wide parallelism). No result rows pass through
the driver; the union is returned unexecuted.

At 100 TB the per-query work is the engine's normal bucket-pruned
scoring job, and queries share the cached postings/terms frames, so N
stored queries cost one postings scan per distinct plan stage — not N
index reads.
"""

from __future__ import annotations

from typing import Iterable

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_OUT_SCHEMA = "query_id string, doc_id bigint, score float"


def executor_stream(
    searcher,
    stored: Iterable[tuple[str, str]],
    k: int = 10,
    tolerant: bool = False,
    errors: list | None = None,
) -> DataFrame:
    """Execute stored queries against a Searcher/MultiSearcher.

    ``stored``: (query_id, query_string) pairs; each string goes through
    the classic query parser via ``searcher.search`` (the reference
    evaluates each tuple's ``expr_s`` the same way).
    ``tolerant=False`` (default) re-raises the first failing query;
    ``tolerant=True`` skips it and appends ``(query_id, message)`` to
    ``errors`` when a list is passed — ExecutorStream's log-and-continue
    contract, surfaced instead of hidden.

    Returns a lazy DataFrame ``(query_id, doc_id, score)`` — the union
    of every stored query's top-k plan.
    """
    plans: list[DataFrame] = []
    for qid, qs in stored:
        try:
            hits = searcher.search(qs, k=k)
        except Exception as exc:
            if not tolerant:
                raise
            if errors is not None:
                errors.append((qid, str(exc)))
            continue
        plans.append(
            hits.select(
                F.lit(qid).alias("query_id"),
                F.col("doc_id").cast("bigint").alias("doc_id"),
                F.col("score").cast("float").alias("score"),
            )
        )
    if not plans:
        return searcher.spark.createDataFrame([], _OUT_SCHEMA)
    out = plans[0]
    for p in plans[1:]:
        out = out.unionByName(p)
    return out
