"""Property tests for the temporal joins: random keyed frames, Spark's
union-marker/window composition (operators/temporal.py) vs DuckDB's
NATIVE ASOF JOIN and a plain containment join — structurally independent
formulations, so agreement on random inputs is strong evidence the
composition implements the textbook semantics (not just the gated
corpus shapes)."""

from __future__ import annotations

import duckdb
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from incubator_horaedb_spark.operators.temporal import asof_join, interval_join

# (key, ts) pairs; right side also carries a value derived from (key, ts)
_key = st.integers(min_value=0, max_value=3)
_ts = st.integers(min_value=0, max_value=50)
_left_rows = st.lists(st.tuples(_key, _ts), min_size=1, max_size=12, unique=True)
_right_rows = st.lists(st.tuples(_key, _ts), min_size=1, max_size=12, unique=True)


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    yield con
    con.close()


@settings(
    max_examples=25,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(left=_left_rows, right=_right_rows)
def test_asof_matches_duckdb_native(spark, duck, left, right):
    ldf = spark.createDataFrame(left, "k int, t bigint")
    rdf = spark.createDataFrame(
        [(k, t, float(k * 1000 + t)) for k, t in right], "k int, t bigint, v double"
    )
    got = {
        (r["k"], r["t"]): (r["t_r"], r["v_r"])
        for r in asof_join(ldf, rdf, on=["k"], left_ts="t", right_ts="t").collect()
    }

    duck.execute("DROP TABLE IF EXISTS l; DROP TABLE IF EXISTS r")
    duck.execute("CREATE TABLE l (k int, t bigint)")
    duck.executemany("INSERT INTO l VALUES (?, ?)", left)
    duck.execute("CREATE TABLE r (k int, t bigint, v double)")
    duck.executemany(
        "INSERT INTO r VALUES (?, ?, ?)", [(k, t, float(k * 1000 + t)) for k, t in right]
    )
    want = {
        (k, t): (rt, rv)
        for k, t, rt, rv in duck.execute(
            "SELECT l.k, l.t, r.t, r.v FROM l ASOF LEFT JOIN r "
            "ON l.k = r.k AND l.t >= r.t"
        ).fetchall()
    }
    assert got == want


@settings(
    max_examples=25,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    points=st.lists(st.tuples(_key, _ts), min_size=1, max_size=10, unique=True),
    intervals=st.lists(
        st.tuples(_key, _ts, st.integers(min_value=0, max_value=20)),
        min_size=1,
        max_size=8,
        unique_by=lambda r: (r[0], r[1]),
    ),
    how=st.sampled_from(["inner", "left"]),
)
def test_interval_join_matches_plain_containment(spark, duck, points, intervals, how):
    iv = [(k, s, s + dur, f"w{k}_{s}") for k, s, dur in intervals]
    pdf = spark.createDataFrame(points, "k int, t bigint")
    idf = spark.createDataFrame(iv, "k int, s bigint, e bigint, label string")
    got = sorted(
        (r["k"], r["t"], r["label"])
        for r in interval_join(
            pdf, idf, point_ts="t", start="s", end="e", on=["k"], how=how
        ).collect()
    )

    duck.execute("DROP TABLE IF EXISTS p; DROP TABLE IF EXISTS iv")
    duck.execute("CREATE TABLE p (k int, t bigint)")
    duck.executemany("INSERT INTO p VALUES (?, ?)", points)
    duck.execute("CREATE TABLE iv (k int, s bigint, e bigint, label varchar)")
    duck.executemany("INSERT INTO iv VALUES (?, ?, ?, ?)", iv)
    join_kw = "JOIN" if how == "inner" else "LEFT JOIN"
    want = sorted(
        tuple(r)
        for r in duck.execute(
            f"SELECT p.k, p.t, iv.label FROM p {join_kw} iv "
            "ON p.k = iv.k AND p.t >= iv.s AND p.t <= iv.e"
        ).fetchall()
    )
    assert got == want
