"""timeAllowed — bounded-latency query execution.

Reference surface being re-expressed (SURVEY.md §2.F ops):
  solr/core/.../search/SolrIndexSearcher.java + common/params/
    CommonParams.java#TIME_ALLOWED — a per-request wall-clock budget;
    when it expires the collector stops and the response is flagged
    ``partialResults=true``
  lucene/core/.../index/ExitableDirectoryReader.java /
    TimeLimitingCollector.java — the kill switches under it

Spark restatement: the budget arms a timer that cancels the query's OWN
Spark job group (``interruptOnCancel`` interrupts running tasks — the
TimeLimitingCollector analog at task granularity). A documented
deviation from Solr: a cancelled Spark action yields NO rows, so an
expired budget returns ``(rows=[], partial=True)`` rather than the
partially-accumulated hits Solr can salvage from its single-pass
collector — at cluster scale partial per-executor heaps would be
misleading anyway (whole doc ranges missing, not a score-ordered
prefix). Queries inside budget return ``(rows, partial=False)``
untouched.
"""

from __future__ import annotations

import threading
import uuid

from pyspark.sql import DataFrame, SparkSession


def collect_time_allowed(
    spark: SparkSession, df: DataFrame, time_allowed_ms: int
) -> tuple[list, bool]:
    """Collect ``df`` under a wall-clock budget. Returns
    ``(rows, partial)`` — ``partial=True`` means the budget expired and
    the job group was cancelled (rows is then empty)."""
    assert time_allowed_ms > 0
    sc = spark.sparkContext
    group = f"time-allowed-{uuid.uuid4().hex[:12]}"
    sc.setJobGroup(group, f"timeAllowed={time_allowed_ms}ms",
                   interruptOnCancel=True)
    expired = threading.Event()

    def _cancel() -> None:
        expired.set()
        sc.cancelJobGroup(group)

    timer = threading.Timer(time_allowed_ms / 1000.0, _cancel)
    timer.daemon = True
    timer.start()
    try:
        rows = df.collect()
        # the timer may fire between the last task finishing and cancel
        # taking effect; a completed collect is a complete result
        return rows, False
    except Exception:
        if expired.is_set():
            return [], True
        raise  # a real failure must not masquerade as a timeout
    finally:
        timer.cancel()
        # pyspark's SparkContext has no clearJobGroup; reset the local
        # properties the group rides on so later queries are unaffected
        sc.setLocalProperty("spark.jobGroup.id", None)
        sc.setLocalProperty("spark.job.description", None)
        sc.setLocalProperty("spark.job.interruptOnCancel", None)
