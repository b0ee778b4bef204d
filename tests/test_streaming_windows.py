"""Streaming window operators: watermarked windowed agg + stateful
sessionizer (streaming/windows.py).  Driven by a file source with
Trigger.AvailableNow and a memory sink for determinism.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from incubator_horaedb_spark.functions.timeutil import epoch_ms
from incubator_horaedb_spark.streaming.windows import (
    sessionize,
    streaming_dedup,
    windowed_agg,
)


def _write_events(spark, path, rows):
    spark.createDataFrame(rows, "user_id long, ms long, value double").withColumn(
        "ts", F.timestamp_millis("ms")
    ).drop("ms").write.mode("overwrite").parquet(path)


def _run_stream(spark, df, name):
    q = (
        df.writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    return spark.sql(f"SELECT * FROM {name}")


def test_windowed_agg_stream(spark, tmp_path):
    path = str(tmp_path / "stream_src")
    base = 1_700_000_000_000
    rows = [
        (1, base + 1_000, 1.0),
        (1, base + 30_000, 2.0),
        (2, base + 61_000, 4.0),
        (1, base + 125_000, 8.0),
    ]
    _write_events(spark, path, rows)
    stream = spark.readStream.schema("user_id long, value double, ts timestamp").parquet(path)
    agg = windowed_agg(stream, "ts", window="1 minute", keys=("user_id",))
    # append-mode windowed agg only emits finalized windows; availableNow
    # finalizes nothing (watermark advances at NEXT batch) — use complete
    # via update? append emits after watermark passes. For a bounded test,
    # run in update mode through foreachBatch-free memory sink:
    q = (
        agg.writeStream.format("memory")
        .queryName("win_agg")
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        (r["window_start"].timestamp(), r["user_id"]): (r["n_events"], r["sum_value"])
        for r in spark.sql("SELECT * FROM win_agg").collect()
    }
    t0 = base / 1000 // 60 * 60
    assert got[(t0, 1)] == (2, 3.0)
    assert got[(t0 + 60, 2)] == (1, 4.0)
    assert got[(t0 + 120, 1)] == (1, 8.0)


def test_streaming_dedup(spark, tmp_path):
    path = str(tmp_path / "dedup_src")
    base = 1_700_000_000_000
    rows = [
        (1, base, 1.0),
        (1, base, 1.0),  # exact duplicate inside the horizon → dropped
        (1, base + 5_000, 2.0),  # same key, different ts → kept
        (2, base + 1_000, 3.0),
    ]
    _write_events(spark, path, rows)
    stream = spark.readStream.schema("user_id long, value double, ts timestamp").parquet(path)
    deduped = streaming_dedup(stream, ["user_id", "ts"], "ts", watermark="1 minute")
    out = _run_stream(spark, deduped, "dedup_out")
    got = sorted(
        (r["user_id"], epoch_ms(r["ts"])) for r in out.collect()
    )
    assert got == [(1, base), (1, base + 5_000), (2, base + 1_000)]


def test_sessionize_stream(spark, tmp_path):
    path = str(tmp_path / "sess_src")
    base = 1_700_000_000_000
    gap = 60_000  # 1 minute inactivity gap
    rows = [
        # user 1: two events 10s apart (one session), then a 2nd session
        # 10 minutes later — the first session closes when event 3 arrives
        (1, base, 1.0),
        (1, base + 10_000, 1.0),
        (1, base + 600_000, 1.0),
        # user 2: single event; its inactivity timeout (base+5s+gap) falls
        # behind the watermark (base+600s), so the state EVICTS and the
        # session closes in the finalizing batch — bounded state store
        (2, base + 5_000, 1.0),
    ]
    _write_events(spark, path, rows)
    stream = spark.readStream.schema("user_id long, value double, ts timestamp").parquet(path)
    sess = sessionize(stream, "user_id", "ts", gap_ms=gap, watermark="0 seconds")
    out = _run_stream(spark, sess, "sessions")
    closed = {(r["key"]): (r["session_start_ms"], r["session_end_ms"], r["n_events"]) for r in out.collect()}
    assert closed == {
        1: (base, base + 10_000, 2),  # closed by the gap-exceeding 3rd event
        2: (base + 5_000, base + 5_000, 1),  # closed by event-time timeout
    }
    # user 1's second session (the base+600s event) is still open — only
    # closed sessions are emitted
    assert all(r["n_events"] >= 1 for r in out.collect())


def test_stream_stream_join(spark, tmp_path):
    lpath = str(tmp_path / "ss_left")
    rpath = str(tmp_path / "ss_right")
    base = 1_700_000_000_000
    _write_events(spark, lpath, [
        (1, base, 1.0),
        (2, base + 10_000, 2.0),
        (3, base + 20_000, 3.0),
    ])
    # right stream: r_user_id/r_ts naming avoids join-column ambiguity
    spark.createDataFrame(
        [
            (1, base + 30_000, 10.0),   # 30s after left(1) → inside [0, 60s]
            (2, base + 100_000, 20.0),  # 90s after left(2) → outside
            (9, base + 5_000, 30.0),    # no matching key
        ],
        "r_user_id long, ms long, r_value double",
    ).withColumn("r_ts", F.timestamp_millis("ms")).drop("ms").write.mode(
        "overwrite"
    ).parquet(rpath)

    from incubator_horaedb_spark.streaming.windows import stream_stream_join

    left = spark.readStream.schema("user_id long, value double, ts timestamp").parquet(lpath)
    right = spark.readStream.schema("r_user_id long, r_value double, r_ts timestamp").parquet(rpath)
    joined = stream_stream_join(
        left, right, "user_id", watermark="1 minute", lower_ms=0, upper_ms=60_000
    )
    out = _run_stream(spark, joined, "ss_join")
    got = [(r["user_id"], r["value"], r["r_value"]) for r in out.collect()]
    assert got == [(1, 1.0, 10.0)]


def test_stream_static_enrichment(spark, tmp_path):
    """Stream-to-static join: the dimension side is a plain DataFrame, so
    Spark broadcasts it into every micro-batch — no state store at all
    (the streaming face of the batch dimension-broadcast joins)."""
    path = str(tmp_path / "enrich_src")
    base = 1_700_000_000_000
    _write_events(spark, path, [(1, base, 1.0), (2, base + 1_000, 2.0), (9, base + 2_000, 3.0)])
    dim = spark.createDataFrame(
        [(1, "gold"), (2, "silver")], "user_id long, tier string"
    )
    stream = spark.readStream.schema("user_id long, value double, ts timestamp").parquet(path)
    joined = stream.join(dim, "user_id", "left")
    out = _run_stream(spark, joined, "enriched")
    got = {r["user_id"]: r["tier"] for r in out.collect()}
    assert got == {1: "gold", 2: "silver", 9: None}


def test_session_window_stream(spark, tmp_path):
    # Spark's NATIVE session_window in streaming mode — the same operator
    # the batch-gated session_window_agg runs, with watermark-driven
    # session finalization (complements the applyInPandasWithState
    # sessionizer: engine-level merging vs custom state logic)
    path = str(tmp_path / "sw_src")
    base = 1_700_000_000_000
    rows = [
        (1, base + 1_000, 1.0),
        (1, base + 10_000, 1.0),          # same session (gap 9s < 30s)
        (1, base + 120_000, 1.0),         # new session (gap 110s > 30s)
        (2, base + 5_000, 1.0),
        (9, base + 3_600_000, 1.0),       # watermark pusher: closes all above
    ]
    _write_events(spark, path, rows)
    stream = (
        spark.readStream.schema("user_id long, value double, ts timestamp")
        .parquet(path)
        .withWatermark("ts", "1 minute")
    )
    agg = (
        stream.groupBy("user_id", F.session_window("ts", "30 seconds"))
        .agg(F.count(F.lit(1)).alias("n"))
        .select(
            "user_id",
            F.unix_millis("session_window.start").alias("s"),
            F.unix_millis("session_window.end").alias("e"),
            "n",
        )
    )
    out = _run_stream(spark, agg, "sw_sessions")
    got = {
        (r["user_id"], r["s"], r["e"], r["n"])
        for r in out.collect()
        if r["user_id"] != 9
    }
    assert (1, base + 1_000, base + 40_000, 2) in got       # merged pair
    assert (1, base + 120_000, base + 150_000, 1) in got    # second session
    assert (2, base + 5_000, base + 35_000, 1) in got
