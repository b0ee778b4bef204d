"""Unit tests for engine functions: time_bucket, date_bin, hashing,
deterministic float aggregation."""

from __future__ import annotations

import datetime

import pytest
from pyspark.sql import functions as F

from incubator_horaedb_spark.functions.time_bucket import date_bin, parse_period, time_bucket


def _bucket(spark, ts_str: str, period: str, **kw) -> datetime.datetime:
    df = spark.createDataFrame([(ts_str,)], "ts_s string").select(
        time_bucket(F.col("ts_s").cast("timestamp"), period, **kw).alias("b")
    )
    return df.collect()[0]["b"]


def test_parse_period():
    assert parse_period("PT1S") == ("S", 1)
    assert parse_period("PT15M") == ("M", 15)
    assert parse_period("PT2H") == ("H", 2)
    assert parse_period("P3D") == ("D", 3)
    assert parse_period("P1W") == ("W", 1)
    assert parse_period("P1M") == ("MONTH", 1)
    assert parse_period("P1Y") == ("Y", 1)
    for bad in ("PT1D", "P1S", "X1M", "P2W", "P2Y"):
        with pytest.raises(ValueError):
            parse_period(bad)


def test_time_bucket_subday(spark):
    # reference: Timestamp::truncate_by epoch floor (time_bucket.rs:258-271)
    assert _bucket(spark, "2024-03-05 10:47:33", "PT1M") == datetime.datetime(2024, 3, 5, 10, 47)
    assert _bucket(spark, "2024-03-05 10:47:33", "PT15M") == datetime.datetime(2024, 3, 5, 10, 45)
    assert _bucket(spark, "2024-03-05 10:47:33", "PT2H") == datetime.datetime(2024, 3, 5, 10, 0)


def test_time_bucket_calendar(spark):
    # offset 0 isolates the calendar branches from the +0800 default
    kw = dict(tz_offset_secs=0)
    assert _bucket(spark, "2024-03-05 10:47:33", "P1D", **kw) == datetime.datetime(2024, 3, 5)
    # 2024-03-05 is a Tuesday → Monday 2024-03-04 (truncate_week snaps to Monday)
    assert _bucket(spark, "2024-03-05 10:47:33", "P1W", **kw) == datetime.datetime(2024, 3, 4)
    assert _bucket(spark, "2024-03-05 10:47:33", "P1M", **kw) == datetime.datetime(2024, 3, 1)
    assert _bucket(spark, "2024-03-05 10:47:33", "P1Y", **kw) == datetime.datetime(2024, 1, 1)


def test_time_bucket_tz_offset(spark):
    # with +08:00 (the reference default), 2024-03-04 20:00 UTC is 03-05 local
    assert _bucket(spark, "2024-03-04 20:00:00", "P1D", tz_offset_secs=8 * 3600) == (
        datetime.datetime(2024, 3, 4, 16, 0)  # local midnight 03-05 == 16:00 UTC
    )


def test_date_bin(spark):
    df = spark.createDataFrame([("2024-03-05 10:47:33",)], "ts_s string").select(
        date_bin(900000, F.col("ts_s").cast("timestamp")).alias("b")
    )
    assert df.collect()[0]["b"] == datetime.datetime(2024, 3, 5, 10, 45)


def test_tsid_deterministic(spark):
    from incubator_horaedb_spark.functions.hashing import tsid_expr

    df = spark.createDataFrame(
        [("a", "x"), ("a", "x"), ("a", None), ("a", "")], ["t1", "t2"]
    ).select(tsid_expr(["t1", "t2"]).alias("tsid"))
    vals = [r["tsid"] for r in df.collect()]
    assert vals[0] == vals[1]
    # null tag is distinct from empty-string tag (sentinel encoding)
    assert len({vals[1], vals[2], vals[3]}) == 3


def test_dyadic_sum_is_order_independent(spark):
    from incubator_horaedb_spark.functions.detfloat import dyadic

    import random

    rnd = random.Random(7)
    vals = [rnd.uniform(0, 100) for _ in range(5000)]
    df = spark.createDataFrame([(v,) for v in vals], "v double")
    s1 = df.select(F.sum(dyadic("v", 20)).alias("s")).collect()[0]["s"]
    # python fold in different orders over the same quantized values
    qs = [round(v * (1 << 20)) / (1 << 20) for v in vals]
    assert s1 == sum(qs) == sum(reversed(qs))


def test_thetasketch_distinct_within_tolerance(spark, sf_dir):
    # thetasketch_distinct.rs:63-202 — HLL-based approx NDV with error rate
    # 0.008.  Our rendering (approx_count_distinct, HLL++, rsd=0.008) uses a
    # different sketch, so golden values differ (SURVEY §2.4) — the contract
    # we enforce is the error bound: within 5 sigma of exact per group.
    from pyspark.sql import functions as F

    from incubator_horaedb_spark.functions.sketches import thetasketch_distinct
    from incubator_horaedb_spark.querybank.registry import load

    ev = load(spark, sf_dir, "events")
    approx = {
        r["event_type"]: r["approx"]
        for r in ev.groupBy("event_type")
        .agg(thetasketch_distinct("user_id").alias("approx"))
        .collect()
    }
    exact = {
        r["event_type"]: r["exact"]
        for r in ev.groupBy("event_type")
        .agg(F.countDistinct("user_id").alias("exact"))
        .collect()
    }
    assert set(approx) == set(exact)
    for k, ex in exact.items():
        assert abs(approx[k] - ex) <= max(1, 5 * 0.008 * ex), (k, approx[k], ex)
