"""PromAlign semantics tests — hand-computed Prometheus-extrapolation
examples validating the exact reference math (prom_align.rs:743-900)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from incubator_horaedb_spark.operators.prom_align import prom_align

from incubator_horaedb_spark.functions.timeutil import epoch_ms


def _series(spark, samples):
    """samples: list of (ts_ms, value) for a single series 's'."""
    rows = [("s", ms, float(v)) for ms, v in samples]
    df = spark.createDataFrame(rows, "tag string, ms long, value double")
    return df.select("tag", F.timestamp_millis("ms").alias("ts"), "value")


def _run(spark, samples, func, start, end, step, lookback):
    df = prom_align(
        _series(spark, samples),
        func,
        series_cols=["tag"],
        ts_col="ts",
        value_col="value",
        start_ms=start,
        end_ms=end,
        step_ms=step,
        lookback_ms=lookback,
    )
    return {epoch_ms(r["ts"]): r["value"] for r in df.collect()}


def test_delta_extrapolation_full_window(spark):
    # Samples every 10s over [0, 60s]; window [0, 60s], step lands at 60s.
    # data covers the whole window → extrapolate by boundary distances.
    samples = [(i * 10_000, i * 1.0) for i in range(7)]  # 0..60s, v=0..6
    out = _run(spark, samples, "delta", start=60_000, end=60_000, step=10_000, lookback=60_000)
    # first=(0,0), last=(60s,6): data_duration=60s, range_to_start=0,
    # range_to_end=0 → delta = 6 * 60/60 = 6
    assert out[60_000] == pytest.approx(6.0)


def test_delta_extrapolation_clamped(spark):
    # data only in middle of a 100s window → both ends clamped to avg/2
    samples = [(40_000, 10.0), (50_000, 13.0), (60_000, 16.0)]
    out = _run(spark, samples, "delta", start=100_000, end=100_000, step=10_000, lookback=100_000)
    # diff=6, dd=20s, avg=10s, threshold=11s; range_to_start=40s>th → 5s;
    # range_to_end=40s>th → 5s; delta = 6 * (20+5+5)/20 = 9
    assert out[100_000] == pytest.approx(9.0)


def test_rate_counter_reset_and_zero_point(spark):
    # counter resets between 2nd and 3rd sample
    samples = [(0, 10.0), (10_000, 20.0), (20_000, 5.0), (30_000, 15.0)]
    out = _run(spark, samples, "rate", start=30_000, end=30_000, step=10_000, lookback=30_000)
    # correction=+20 → diff = 15-10+20 = 25; dd=30s; range_to_start=0,
    # range_to_end=0 → increase=25; rate=25/30s
    assert out[30_000] == pytest.approx(25.0 / 30.0, rel=1e-9)


def test_increase_zero_point_shortening(spark):
    # first sample value small → zero-point limits back-extrapolation
    samples = [(20_000, 1.0), (30_000, 101.0)]
    out = _run(spark, samples, "increase", start=40_000, end=40_000, step=10_000, lookback=40_000)
    # diff=100, dd=10s, avg=10s, th=11s; range_to_start=20s→ but zero point:
    # dd*first/diff = 10s*0.01=0.1s → min(20s, 0.1s)=0.1s (≤ th, kept);
    # range_to_end=10s ≤ th → kept.  increase = 100*(10+0.1+10)/10 = 201
    assert out[40_000] == pytest.approx(201.0, rel=1e-9)


def test_irate_needs_three_samples(spark):
    # reference quirk: instant_value requires tail_index >= 2 (≥3 samples)
    two = [(0, 1.0), (10_000, 3.0)]
    assert _run(spark, two, "irate", start=20_000, end=20_000, step=10_000, lookback=30_000) == {}
    three = [(0, 1.0), (10_000, 3.0), (20_000, 7.0)]
    out = _run(spark, three, "irate", start=20_000, end=20_000, step=10_000, lookback=30_000)
    # last two: (10s,3)→(20s,7): 4 / 10s
    assert out[20_000] == pytest.approx(0.4)


def test_irate_counter_reset(spark):
    samples = [(0, 5.0), (10_000, 9.0), (20_000, 2.0)]
    out = _run(spark, samples, "irate", start=20_000, end=20_000, step=10_000, lookback=30_000)
    # reset: last < prev → result = last value / gap = 2/10s
    assert out[20_000] == pytest.approx(0.2)


def test_instant_and_window_bounds(spark):
    # window is [t-lookback, t] inclusive on both ends
    samples = [(10_000, 42.0)]
    out = _run(spark, samples, "instant", start=0, end=40_000, step=10_000, lookback=10_000)
    # sample visible at t=10s (ts==t) and t=20s (ts==t-lookback); not at 30s
    assert out == {10_000: 42.0, 20_000: 42.0}


def test_empty_steps_skipped(spark):
    samples = [(5_000, 1.0), (95_000, 2.0)]
    out = _run(spark, samples, "instant", start=0, end=100_000, step=10_000, lookback=8_000)
    assert set(out) == {10_000, 100_000}


def test_offset_modifier_shifts_samples(spark):
    # prom_align.rs:273-289: offset shifts sample timestamps forward before
    # stepping — prom_align(df, offset=O) must equal prom_align over a
    # pre-shifted copy of the data with offset 0.
    from pyspark.sql import functions as F

    base = spark.createDataFrame(
        [("s", 1_000_000 + i * 15_000, float(i * i)) for i in range(20)],
        "name string, ts_ms long, value double",
    ).select("name", F.timestamp_millis("ts_ms").alias("ts"), "value")
    shifted = base.withColumn(
        "ts", F.timestamp_millis(F.unix_millis("ts") + F.lit(60_000))
    )
    kw = dict(
        series_cols=["name"], ts_col="ts", value_col="value",
        start_ms=1_000_000, end_ms=1_400_000, step_ms=30_000, lookback_ms=90_000,
    )
    with_offset = {
        (r["ts"], round(r["value"], 9))
        for r in prom_align(base, "rate", offset_ms=60_000, **kw).collect()
    }
    manual = {
        (r["ts"], round(r["value"], 9))
        for r in prom_align(shifted, "rate", **kw).collect()
    }
    assert with_offset == manual and with_offset


def test_offset_parses_in_frontend(spark):
    from incubator_horaedb_spark.frontends.promql import parse_promql

    pq = parse_promql('rate(events{event_type="click"}[5m] offset 1h)')
    assert pq.selector.offset_ms == 3_600_000 and pq.selector.range_ms == 300_000
    assert parse_promql("events{}").selector.offset_ms == 0


def test_duplicate_timestamp_samples_deduped_max_wins(spark):
    """Duplicate (series, ts) samples merge to the max value for
    order-sensitive functions (the sf1-sweep divergence: lag/min_by ties
    are engine-dependent) — instant must pick the max survivor, and rate
    must see ONE sample per timestamp."""
    from pyspark.sql import functions as F

    from incubator_horaedb_spark.operators.prom_align import prom_align

    rows = [
        ("a", 0, 5.0), ("a", 0, 9.0),          # duplicate ts: max 9 wins
        ("a", 60_000, 11.0), ("a", 60_000, 7.0),
    ]
    df = spark.createDataFrame(rows, "s string, ms long, value double").select(
        "s", F.timestamp_millis("ms").alias("ts"), "value"
    )
    out = prom_align(
        df, "instant", series_cols=["s"], ts_col="ts", value_col="value",
        start_ms=0, end_ms=60_000, step_ms=60_000, lookback_ms=60_000,
    ).collect()
    vals = {int(r["ts"].timestamp()): r["value"] for r in out}
    assert vals == {0: 9.0, 60: 11.0}

    # count_over_time is order-symmetric: raw multiset, duplicates counted
    cnt = prom_align(
        df, "count_over_time", series_cols=["s"], ts_col="ts", value_col="value",
        start_ms=60_000, end_ms=60_000, step_ms=60_000, lookback_ms=60_000,
    ).collect()
    assert cnt[0]["value"] == 4.0
