"""CancelRegistry (wire/cancel.py): pinned-thread gating, gid-based
cancellation detection, and the between-jobs pulse window (VERDICT r09
wrong #1 / ADVICE r09 #1+#2)."""

from __future__ import annotations

import threading
import time

from incubator_horaedb_spark.wire.cancel import (
    CancelRegistry,
    is_cancelled,
    pinned_thread_mode,
)


def test_pinned_mode_detected(spark):
    # PySpark 4 defaults to the pinned-thread ClientServer gateway; the
    # registry must detect it and enable the cancel feature
    assert pinned_thread_mode(spark)
    assert CancelRegistry(spark).enabled


def test_disabled_registry_is_inert(spark):
    reg = CancelRegistry(spark)
    reg.enabled = False  # simulate a non-pinned gateway
    assert reg.bind_thread("g", "d") is False
    assert reg.cancel("g") is False


def test_is_cancelled_matches_own_gid_only():
    cancelled = Exception(
        "Job 12 cancelled part of cancelled job group pg-conn-3"
    )
    assert is_cancelled(cancelled, "pg-conn-3")
    # a DIFFERENT connection's cancellation must not match
    assert not is_cancelled(cancelled, "pg-conn-7")
    # a genuine error that merely mentions a cancelled job must not be
    # classified as OUR cancel (ADVICE r09 #2)
    generic = Exception("upstream job was cancelled by the scheduler")
    assert not is_cancelled(generic, "pg-conn-3")
    assert not is_cancelled(cancelled, None)


def test_cancel_pulse_lands_on_next_job(spark):
    """A cancel arriving while the victim statement sits in a driver-side
    phase (no active Spark job) must still kill the statement's NEXT job:
    the registry pulses cancelJobGroup until the bracketed statement
    ends."""
    reg = CancelRegistry(spark)
    assert reg.enabled
    gid = "cancel-test-gid"
    started = threading.Event()
    state: dict = {}

    def victim() -> None:
        spark.sparkContext.setJobGroup(gid, "victim", interruptOnCancel=True)
        gen = reg.stmt_begin(gid)
        try:
            started.set()
            time.sleep(1.0)  # driver-side phase: NO job active yet
            try:
                spark.sql(
                    "select sum(id % 7) as s from range(2000000000000)"
                ).collect()
                state["outcome"] = "completed"
            except Exception as e:  # noqa: BLE001 — asserting on the text
                state["outcome"] = str(e)
        finally:
            reg.stmt_end(gid, gen)

    th = threading.Thread(target=victim)
    th.start()
    assert started.wait(10)
    time.sleep(0.2)  # victim is sleeping between jobs
    assert reg.cancel(gid)  # single cancelJobGroup would be a no-op here
    th.join(timeout=60)
    assert not th.is_alive()
    outcome = state["outcome"]
    assert outcome != "completed"
    # the raised error is recognized as OUR cancellation by gid matching
    assert is_cancelled(Exception(outcome), gid), outcome


def test_cancel_idle_connection_does_not_chase(spark):
    """A cancel on an idle connection (no statement in flight) fires once
    and must NOT kill a statement started afterwards (PG semantics)."""
    reg = CancelRegistry(spark)
    gid = "cancel-idle-gid"
    assert reg.cancel(gid)  # nothing busy → single shot
    spark.sparkContext.setJobGroup(gid, "later", interruptOnCancel=True)
    gen = reg.stmt_begin(gid)
    try:
        rows = spark.sql("select sum(id) as s from range(1000)").collect()
        assert rows[0]["s"] == 499500
    finally:
        reg.stmt_end(gid, gen)
        spark.sparkContext.setJobGroup("", "")
