"""Unit tests for the temporal join operators (operators/temporal.py):
as-of semantics (inclusive match, tolerance window, no-match nulls) and
the interval join's anti-cartesian guard.  The oracle-gated queries
(asof_join_events / interval_join_sessions) prove equivalence against
DuckDB's native ASOF JOIN; these cover the operator API edges."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from incubator_horaedb_spark.operators.temporal import asof_join, interval_join


@pytest.fixture(scope="module")
def frames(spark):
    left = spark.createDataFrame(
        [(1, 10, "a"), (1, 5, "b"), (2, 7, "c"), (3, 1, "d")],
        "k int, t bigint, tag string",
    )
    right = spark.createDataFrame(
        [(1, 4, 100.0), (1, 9, 200.0), (1, 10, 250.0), (2, 8, 300.0)],
        "k int, t bigint, v double",
    )
    return left, right


def test_asof_inclusive_and_no_match(spark, frames):
    left, right = frames
    out = asof_join(left, right, on=["k"], left_ts="t", right_ts="t").collect()
    got = {(r["k"], r["t"]): (r["t_r"], r["v_r"]) for r in out}
    assert len(out) == 4
    assert got[(1, 5)] == (4, 100.0)
    assert got[(1, 10)] == (10, 250.0)  # equal timestamps match (inclusive)
    assert got[(2, 7)] == (None, None)  # right row is later → no match
    assert got[(3, 1)] == (None, None)  # key absent from right


def test_asof_tolerance(spark, frames):
    left, right = frames
    out = asof_join(
        left, right, on=["k"], left_ts="t", right_ts="t", tolerance_ms=1
    ).collect()
    got = {(r["k"], r["t"]): (r["t_r"], r["v_r"]) for r in out}
    assert got[(1, 10)] == (10, 250.0)  # gap 0 ≤ 1
    assert got[(1, 5)] == (4, 100.0)  # gap 5-4=1, within the inclusive bound
    assert len(out) == 4


def test_asof_tolerance_inclusive_bound(spark, frames):
    left, right = frames
    out = asof_join(
        left, right, on=["k"], left_ts="t", right_ts="t", tolerance_ms=0
    ).collect()
    got = {(r["k"], r["t"]): r["t_r"] for r in out}
    assert got[(1, 10)] == 10 and got[(1, 5)] is None


def test_interval_join_keyless_requires_bucket(spark):
    pts = spark.createDataFrame([(5,)], "t bigint")
    iv = spark.createDataFrame([(0, 10)], "s bigint, e bigint")
    with pytest.raises(ValueError, match="bucket_ms"):
        interval_join(pts, iv, point_ts="t", start="s", end="e")
    out = interval_join(pts, iv, point_ts="t", start="s", end="e", bucket_ms=4).collect()
    assert len(out) == 1 and out[0]["t"] == 5


def test_interval_join_bucketed_boundaries(spark):
    # interval spanning multiple buckets; points at inclusive edges
    pts = spark.createDataFrame([(0,), (10,), (11,), (7,)], "t bigint")
    iv = spark.createDataFrame([(0, 10)], "s bigint, e bigint")
    out = interval_join(pts, iv, point_ts="t", start="s", end="e", bucket_ms=3)
    assert sorted(r["t"] for r in out.collect()) == [0, 7, 10]


def test_interval_join_left_keeps_unmatched_points(spark):
    # ADVICE r02: how='left' silently degenerated to inner because the
    # containment predicate ran as a post-join filter.  Now it is part of
    # the join condition, so uncovered points survive with null intervals.
    pts = spark.createDataFrame([(1, 5), (1, 99), (2, 5)], "k int, t bigint")
    iv = spark.createDataFrame([(1, 0, 10, "w1"), (2, 50, 60, "w2")], "k int, s bigint, e bigint, label string")
    out = interval_join(pts, iv, point_ts="t", start="s", end="e", on=["k"], how="left")
    got = {(r["k"], r["t"]): r["label"] for r in out.collect()}
    assert got == {(1, 5): "w1", (1, 99): None, (2, 5): None}
    # keyless bucketed variant keeps unmatched points too
    out2 = interval_join(
        spark.createDataFrame([(5,), (42,)], "t bigint"),
        spark.createDataFrame([(0, 10)], "s bigint, e bigint"),
        point_ts="t", start="s", end="e", bucket_ms=4, how="left",
    )
    got2 = {r["t"]: r["s"] for r in out2.collect()}
    assert got2 == {5: 0, 42: None}


def test_interval_join_rejects_interval_side_outer(spark):
    pts = spark.createDataFrame([(5,)], "t bigint")
    iv = spark.createDataFrame([(0, 10)], "s bigint, e bigint")
    with pytest.raises(ValueError, match="point-centric"):
        interval_join(pts, iv, point_ts="t", start="s", end="e", bucket_ms=4, how="full")
