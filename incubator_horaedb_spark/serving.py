"""Serving-layer concerns: query priority scheduling and concurrent
identical-query dedup.

- Priority (src/query_frontend/src/plan.rs:212-237 decide_query_priority +
  src/interpreters/src/select.rs:86-146 dual runtimes): queries whose
  scanned time range exceeds a threshold run on a low-priority runtime.
  Spark rendering: FAIR scheduler pools — the session is configured with an
  allocation file and ``spark.scheduler.pool`` is set per query thread.
- Query dedup (src/proxy/src/read.rs:89-165 dedup_handle_sql): identical
  concurrent SQL strings share one execution via a notifier map.
"""

from __future__ import annotations

import threading
from dataclasses import dataclass
from typing import Any, Callable

HIGH_PRIORITY_POOL = "horaedb_high"
LOW_PRIORITY_POOL = "horaedb_low"

DEFAULT_TIME_RANGE_THRESHOLD_MS = 24 * 3600 * 1000


def decide_query_priority(
    time_range_ms: int | None, threshold_ms: int = DEFAULT_TIME_RANGE_THRESHOLD_MS
) -> str:
    """plan.rs:212-237: unbounded or wide time range ⇒ LOW priority."""
    if time_range_ms is None or time_range_ms >= threshold_ms:
        return "LOW"
    return "HIGH"


class PriorityExecutor:
    """Runs an action with the scheduler pool matching its priority.

    ``spark.scheduler.mode=FAIR`` plus a pools file gives low-priority
    queries a smaller share — the Spark analogue of the reference's
    dual-runtime split (select.rs:130-145)."""

    def __init__(self, spark):
        self.spark = spark

    def run(self, action: Callable[[], Any], *, time_range_ms: int | None) -> Any:
        pool = (
            HIGH_PRIORITY_POOL
            if decide_query_priority(time_range_ms) == "HIGH"
            else LOW_PRIORITY_POOL
        )
        sc = self.spark.sparkContext
        sc.setLocalProperty("spark.scheduler.pool", pool)
        try:
            return action()
        finally:
            sc.setLocalProperty("spark.scheduler.pool", None)


@dataclass
class _Inflight:
    event: threading.Event
    result: Any = None
    error: BaseException | None = None


class QueryDedup:
    """Concurrent identical-query dedup (read.rs:89-165): the first caller
    executes; followers arriving while it runs wait and share the result."""

    def __init__(self):
        self._lock = threading.Lock()
        self._inflight: dict[str, _Inflight] = {}
        self.executed = 0  # for tests/metrics: actual executions

    def run(self, key: str, compute: Callable[[], Any]) -> Any:
        with self._lock:
            entry = self._inflight.get(key)
            if entry is None:
                entry = _Inflight(event=threading.Event())
                self._inflight[key] = entry
                leader = True
            else:
                leader = False
        if leader:
            try:
                self.executed += 1
                entry.result = compute()
            except BaseException as e:  # noqa: BLE001 — propagate to followers too
                entry.error = e
                raise
            finally:
                with self._lock:
                    self._inflight.pop(key, None)
                entry.event.set()
            return entry.result
        entry.event.wait()
        if entry.error is not None:
            raise entry.error
        return entry.result
