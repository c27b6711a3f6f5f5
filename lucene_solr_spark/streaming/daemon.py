"""DaemonStream — a long-running, repeatedly-executed inner stream
(solrj/io/stream/DaemonStream.java; solr DaemonStreamFactory `daemon(...)`).

Solr's DaemonStream wraps an inner streaming expression and re-runs it on
``runInterval``, pushing each run's tuples into a bounded
ArrayBlockingQueue that a consumer drains with ``read()``; an ``id``
names the daemon in the DaemonCollector admin list, ``iterations`` counts
completed runs, errors are logged and the daemon keeps running unless
``terminate=true``, and ``close()`` enqueues the EOF tuple so a blocked
reader wakes up.

Spark-first restatement: wall-clock scheduling is the host's concern (a
Structured Streaming processingTime trigger at scale —
``streaming/ingest.py#start_indexing_stream`` is that wiring); the daemon
CONTRACT is re-expressed tick-driven so every behavior is deterministic
and testable:

* ``tick()`` = one scheduled run of the inner callable. The inner
  callable returns a LAZY DataFrame — the daemon never collects; a 100 TB
  inner query stays a distributed plan, the queue holds plan handles
  (the reference queue holds materialized tuples only because Solr
  streams are pull-based row iterators).
* The queue is bounded like the reference's ArrayBlockingQueue: when it
  is full the producer BLOCKS — tick-driven, that means the run is
  refused (iterations does not advance) until a consumer drains.
* An inner-run exception is recorded and the daemon stays OPEN
  (log-and-continue) unless ``terminate=True``, in which case the daemon
  closes — both DaemonStream behaviors, surfaced instead of logged.
* ``close()`` enqueues the EOF sentinel; ``read()`` past it raises
  StopIteration, the closed-queue contract.
"""

from __future__ import annotations

from collections import deque
from typing import Any, Callable

EOF = object()


class DaemonClosed(RuntimeError):
    """Raised when ticking a closed daemon."""


class DaemonStream:
    """Tick-driven daemon over a lazy inner run.

    ``run_fn(iteration)`` -> a result handle (typically a DataFrame).
    ``queue_size`` bounds the un-drained results (0 = unbounded).
    """

    def __init__(
        self,
        daemon_id: str,
        run_fn: Callable[[int], Any],
        queue_size: int = 0,
        terminate: bool = False,
    ) -> None:
        self.daemon_id = daemon_id
        self._run_fn = run_fn
        self._queue_size = queue_size
        self._terminate = terminate
        self._queue: deque = deque()
        self.iterations = 0  # completed runs (the admin-list counter)
        self.runs = 0  # attempted runs (the schedule index run_fn sees)
        self.closed = False
        self.last_exception: Exception | None = None

    # -- producer side ----------------------------------------------------
    def tick(self) -> bool:
        """One scheduled run. Returns True iff the run executed and its
        result was enqueued (False = blocked on a full queue)."""
        if self.closed:
            raise DaemonClosed(f"daemon '{self.daemon_id}' is closed")
        if self._queue_size and len(self._queue) >= self._queue_size:
            return False  # ArrayBlockingQueue full: producer blocks
        attempt = self.runs
        self.runs += 1  # a failed run is still consumed by the schedule
        try:
            result = self._run_fn(attempt)
        except Exception as exc:  # log-and-continue unless terminate
            self.last_exception = exc
            if self._terminate:
                self.close()
            return False
        self._queue.append(result)
        self.iterations += 1
        return True

    # -- consumer side ----------------------------------------------------
    def read(self):
        """Pop the oldest un-drained run result; StopIteration past EOF,
        IndexError when the open daemon has nothing queued yet."""
        item = self._queue.popleft()
        if item is EOF:
            raise StopIteration(f"daemon '{self.daemon_id}' EOF")
        return item

    def read_latest(self):
        """Drain everything and return the newest result (the snapshot a
        monitoring consumer wants)."""
        latest = None
        while self._queue:
            item = self._queue.popleft()
            if item is EOF:
                self._queue.appendleft(item)
                break
            latest = item
        return latest

    # -- admin (DaemonCollector list entry) --------------------------------
    def info(self) -> dict:
        return {
            "id": self.daemon_id,
            "iterations": self.iterations,
            "queued": sum(1 for x in self._queue if x is not EOF),
            "state": "CLOSED" if self.closed else "OPEN",
            "exception": str(self.last_exception) if self.last_exception else None,
        }

    def close(self) -> None:
        if not self.closed:
            self.closed = True
            self._queue.append(EOF)
