"""Streaming window operators (beyond-reference, Structured Streaming).

The reference has NO streaming-query abstraction (SURVEY §1.7): late data
just lands in its time segment and dedup resolves at read time
(row_iter/merge.rs:126 need_dedup).  These operators are the Spark-native
extension of that model for pipelines that want *push* semantics:
watermarked tumbling/sliding aggregation, and a custom stateful
sessionizer over ``applyInPandasWithState`` — the pattern for any
reference-less stateful operator (the Spark analogue of writing a new
physical operator like prom_align.rs, but for streams).

Both operate on a streaming DataFrame (``spark.readStream...``) and are
agnostic to the source; tests drive them with file sources +
``Trigger.AvailableNow`` for determinism.

At scale: watermark state is per-key-and-window in the state store —
bounded by (keys × windows inside watermark), not stream length; the
sessionizer's state is one row per open session key.  Both shuffle by key
once per micro-batch (the same hash exchange a batch groupBy does).
"""

from __future__ import annotations

from typing import Iterable

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def windowed_agg(
    stream: DataFrame,
    ts_col: str = "ts",
    *,
    window: str = "1 minute",
    slide: str | None = None,
    watermark: str = "10 minutes",
    keys: Iterable[str] = (),
) -> DataFrame:
    """Watermarked tumbling (or sliding, when ``slide`` differs) window
    aggregation: count + sum(value) per (window, keys).

    Late rows within ``watermark`` update their window; later ones are
    dropped — the streaming rendering of the reference's
    write-into-your-segment model (§1.7), with an explicit bound instead
    of unbounded read-time merge."""
    win = (
        F.window(F.col(ts_col), window, slide)
        if slide and slide != window
        else F.window(F.col(ts_col), window)
    )
    return (
        stream.withWatermark(ts_col, watermark)
        .groupBy(win.alias("win"), *[F.col(k) for k in keys])
        .agg(F.count("*").alias("n_events"), F.sum("value").alias("sum_value"))
        .select(
            F.col("win.start").alias("window_start"),
            F.col("win.end").alias("window_end"),
            *[F.col(k) for k in keys],
            "n_events",
            "sum_value",
        )
    )


def streaming_dedup(
    stream: DataFrame,
    keys: Iterable[str],
    ts_col: str = "ts",
    *,
    watermark: str = "10 minutes",
) -> DataFrame:
    """Streaming EXACT dedup: keep the first occurrence of each key set,
    with state bounded by the watermark (`dropDuplicatesWithinWatermark` —
    a key's dedup state is evicted once the watermark passes it).

    This is the streaming face of the training-pipeline `dedup_exact`
    operator: at ingest time, duplicate documents/events inside the
    lateness horizon are dropped before they ever hit storage, while the
    batch dedup operators handle the full-corpus pass.  State is one entry
    per distinct in-horizon key — bounded, unlike an unwatermarked
    dropDuplicates whose state grows with stream length."""
    return stream.withWatermark(ts_col, watermark).dropDuplicatesWithinWatermark(
        list(keys)
    )


def sessionize(
    stream: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
    *,
    gap_ms: int = 30 * 60 * 1000,
    watermark: str = "10 minutes",
) -> DataFrame:
    """Custom stateful operator: event sessionization with an inactivity
    gap, via ``applyInPandasWithState`` (GroupState per key).

    Emits one row per CLOSED session (a new event arrives more than
    ``gap_ms`` after the previous one, or the key's state times out at
    the watermark).  State per key is (start_ms, last_ms, n) — O(1),
    mergeable, and evicted on timeout, so the state store stays bounded
    by the number of concurrently-active keys."""
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
    from pyspark.sql.types import (
        LongType,
        StructField,
        StructType,
    )

    out_schema = StructType(
        [
            StructField("key", LongType()),
            StructField("session_start_ms", LongType()),
            StructField("session_end_ms", LongType()),
            StructField("n_events", LongType()),
        ]
    )
    state_schema = StructType(
        [
            StructField("start_ms", LongType()),
            StructField("last_ms", LongType()),
            StructField("n", LongType()),
        ]
    )

    def fn(key, pdfs, state: GroupState):
        import pandas as pd

        closed = []
        if state.hasTimedOut:
            start_ms, last_ms, n = state.get
            closed.append((key[0], start_ms, last_ms, n))
            state.remove()
        else:
            ts_list = []
            for pdf in pdfs:
                ts_list.extend(int(v) for v in pdf["__ts"].astype("int64") // 1_000_000)
            ts_list.sort()
            if state.exists:
                start_ms, last_ms, n = state.get
            else:
                start_ms, last_ms, n = None, None, 0
            for t in ts_list:
                if last_ms is not None and t - last_ms > gap_ms:
                    closed.append((key[0], start_ms, last_ms, n))
                    start_ms, n = t, 0
                if start_ms is None:
                    start_ms = t
                last_ms = t
                n += 1
            state.update((start_ms, last_ms, n))
            state.setTimeoutTimestamp(last_ms + gap_ms)
        yield pd.DataFrame(
            closed, columns=["key", "session_start_ms", "session_end_ms", "n_events"]
        )

    # watermark AFTER the projection, on a retained timestamp column —
    # event-time timeout requires the watermarked column to survive into
    # the stateful operator's input
    prepared = stream.select(
        F.col(key_col).alias("__key"), F.col(ts_col).alias("__ts")
    ).withWatermark("__ts", watermark)
    return prepared.groupBy("__key").applyInPandasWithState(
        fn,
        outputStructType=out_schema,
        stateStructType=state_schema,
        outputMode="append",
        timeoutConf=GroupStateTimeout.EventTimeTimeout,
    )


def stream_stream_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    *,
    left_ts: str = "ts",
    right_ts: str = "r_ts",
    watermark: str = "10 minutes",
    lower_ms: int = 0,
    upper_ms: int = 5 * 60 * 1000,
) -> DataFrame:
    """Watermarked stream-stream INNER join: match right-stream rows to
    left-stream rows with the same key whose timestamp falls in
    ``[left_ts + lower_ms, left_ts + upper_ms]``.

    Both sides carry a watermark and the join condition bounds event time
    in BOTH directions, so Spark can evict join state: a buffered left row
    is dropped once the right watermark passes ``left_ts + upper_ms`` (and
    vice versa) — state is bounded by (rate × interval), not stream
    length.  This is the streaming face of the batch interval join
    (operators/temporal.py::interval_join); an unbounded-condition
    stream-stream join would accumulate state forever and is refused by
    Spark in append mode for exactly that reason.

    At scale each micro-batch shuffles both sides by the join key once —
    the same single exchange as the batch equi-join.

    Convention: the right stream's columns are ``r_``-prefixed
    (``r_<key>``, ``r_ts``) so the joined output needs no aliasing —
    stream-stream joins cannot be renamed after the fact without
    re-deriving the watermark."""
    l = left.withWatermark(left_ts, watermark)
    r = right.withWatermark(right_ts, watermark)
    cond = (
        (l[key] == r[f"r_{key}"])
        & (r[right_ts] >= l[left_ts] + F.expr(f"INTERVAL {lower_ms} MILLISECONDS"))
        & (r[right_ts] <= l[left_ts] + F.expr(f"INTERVAL {upper_ms} MILLISECONDS"))
    )
    return l.join(r, cond, "inner")
