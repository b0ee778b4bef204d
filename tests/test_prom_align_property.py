"""Property tests for PromAlign: random series vs an independent pure-Python
model of the reference semantics (prom_align.rs:743-945 — FixedStepper
window [t-lookback, t], extrapolate_fn_helper with counter-reset
correction, zero-point shortening BEFORE the 1.1×avg-interval clamp, and
instant_value's tail_index >= 2 requirement).  SURVEY §7.5 calls this math
the hardest correctness piece; the Spark implementation is a structurally
different formulation (explode to step grid + hash agg), so agreement with
the sample-walking model below is strong evidence.
"""

from __future__ import annotations

import math

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from incubator_horaedb_spark.operators.prom_align import prom_align

from incubator_horaedb_spark.functions.timeutil import epoch_ms

START_MS = 1_600_000_000_000


def _model_window(samples, t, lookback_ms):
    """FixedStepper window: ts in [t - lookback, t], both inclusive."""
    return [(ts, v) for ts, v in samples if t - lookback_ms <= ts <= t]


def _model_extrapolate(window, t, lookback_ms, is_counter, is_rate):
    """Pure-Python port of extrapolate_fn_helper (prom_align.rs:743-838)."""
    if len(window) < 2:
        return None
    first_ts, first_v = window[0]
    last_ts, last_v = window[-1]
    correction = 0.0
    if is_counter:
        prev = first_v
        for _, v in window:
            if v < prev:
                correction += prev
            prev = v
    difference = last_v - first_v + correction
    data_duration = float(last_ts - first_ts)
    avg_interval = data_duration / (len(window) - 1)
    range_to_start = float(first_ts - (t - lookback_ms))
    range_to_end = float(t - last_ts)
    if is_counter and difference > 0.0 and first_v >= 0.0:
        # association matches the Spark column expression (dd * fv) / diff
        range_to_start = min(range_to_start, data_duration * first_v / difference)
    threshold = avg_interval * 1.1
    if range_to_start > threshold:
        range_to_start = avg_interval / 2.0
    if range_to_end > threshold:
        range_to_end = avg_interval / 2.0
    result = difference * (data_duration + range_to_start + range_to_end) / data_duration
    if is_rate:
        result /= lookback_ms / 1000.0
    return result


def _model_instant_value(window, is_rate):
    """instant_value (prom_align.rs:909-945): needs >= 3 in-window samples."""
    if len(window) < 3:
        return None
    (prev_ts, prev_v), (last_ts, last_v) = window[-2], window[-1]
    result = last_v if (is_rate and last_v < prev_v) else last_v - prev_v
    if is_rate:
        result /= (last_ts - prev_ts) / 1000.0
    return result


def _model(func, samples, t, lookback_ms):
    w = _model_window(samples, t, lookback_ms)
    if not w:
        return None  # empty-window steps are skipped entirely
    if func == "instant":
        return w[-1][1]
    if func in ("irate", "idelta"):
        return _model_instant_value(w, func == "irate")
    if func.endswith("_over_time") or func in ("changes", "resets"):
        vals = [v for _, v in w]
        pairs = list(zip(vals, vals[1:]))
        return {
            "avg_over_time": sum(vals) / len(vals),
            "min_over_time": min(vals),
            "max_over_time": max(vals),
            "sum_over_time": sum(vals),
            "count_over_time": float(len(vals)),
            "last_over_time": vals[-1],
            "changes": float(sum(1 for a, b in pairs if a != b)),
            "resets": float(sum(1 for a, b in pairs if b < a)),
        }[func]
    return _model_extrapolate(
        w, t, lookback_ms, is_counter=func in ("rate", "increase"), is_rate=func == "rate"
    )


# Values on the 2^-10 dyadic grid: the implementation quantizes
# counter-reset addends to the 2^-20 grid (documented deviation <= 2^-21
# per reset, invisible at the gated queries' 6-digit rounding); dyadic
# inputs make that quantization the identity, so this model remains a
# faithful port of the reference math and the comparison stays exact.
series_strategy = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=120),  # ts offset, seconds
        st.integers(min_value=-(2**30), max_value=2**40).map(lambda n: n / 1024.0),
    ),
    min_size=1,
    max_size=12,
    unique_by=lambda p: p[0],
)


@pytest.mark.parametrize(
    "func",
    [
        "rate", "increase", "delta", "irate", "idelta", "instant",
        # *_over_time: plain window aggregates on the same grid.  Dyadic
        # inputs (2^-10 grid) make the implementation's 2^-20 sum
        # quantization the identity, so sums compare exactly.
        "avg_over_time", "min_over_time", "max_over_time",
        "sum_over_time", "count_over_time", "last_over_time",
        "changes", "resets",
    ],
)
@settings(max_examples=20, deadline=None, suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(points=series_strategy, step_s=st.integers(5, 30), lookback_s=st.integers(10, 60))
def test_prom_align_matches_reference_model(spark, func, points, step_s, lookback_s):
    samples = sorted((START_MS + off * 1000, val) for off, val in points)
    end_ms = START_MS + 120_000
    step_ms, lookback_ms = step_s * 1000, lookback_s * 1000

    df = spark.createDataFrame(
        [("s1", ts, v) for ts, v in samples], "name string, ts_ms long, value double"
    ).select("name", F.timestamp_millis(F.col("ts_ms")).alias("ts"), "value")

    got = {
        epoch_ms(r["ts"]): r["value"]
        for r in prom_align(
            df,
            func,
            series_cols=["name"],
            ts_col="ts",
            value_col="value",
            start_ms=START_MS,
            end_ms=end_ms,
            step_ms=step_ms,
            lookback_ms=lookback_ms,
        ).collect()
    }

    expected = {}
    for k in range((end_ms - START_MS) // step_ms + 1):
        t = START_MS + k * step_ms
        v = _model(func, samples, t, lookback_ms)
        if v is not None:
            expected[t] = v

    assert set(got) == set(expected), (
        f"step set mismatch: extra={sorted(set(got) - set(expected))}, "
        f"missing={sorted(set(expected) - set(got))}"
    )
    for t, v in expected.items():
        g = got[t]
        if math.isnan(v):
            assert math.isnan(g), (t, g, v)
        else:
            assert g == pytest.approx(v, rel=1e-9, abs=1e-9), (t, g, v)


# --- round 7: holt_winters fold equivalence (DuckDB side) ------------------
# The Spark side is pinned by test_promql_frontend.py's reference-fold test
# and the gated promql_parsed_holt_winters pair; this pins the DuckDB
# rendering against the same reference implementation (functions.go
# funcDoubleExponentialSmoothing) over arbitrary windows — it would have
# caught the DuckDB struct-lambda shadowing bug (list_reduce resolving
# acc.s1 to the NEW s1) that the list-accumulator rendering works around.


@settings(max_examples=40, deadline=None)
@given(
    vals=st.lists(
        st.floats(min_value=-1e6, max_value=1e6, allow_nan=False, width=64),
        min_size=2,
        max_size=40,
    ),
    sf=st.floats(min_value=0.01, max_value=0.99),
    tf=st.floats(min_value=0.01, max_value=0.99),
)
def test_holt_winters_duckdb_fold_matches_reference(vals, sf, tf):
    import duckdb

    from incubator_horaedb_spark.operators.prom_align import (
        _holt_winters_value_sql,
    )

    def ref(v, a, b):  # the Prometheus loop, verbatim
        s0, s1, tr = 0.0, v[0], v[1] - v[0]
        for i in range(1, len(v)):
            x = a * v[i]
            if i - 1 > 0:
                tr = b * (s1 - s0) + (1 - b) * tr
            y = (1 - a) * (s1 + tr)
            s0, s1 = s1, x + y
        return s1

    lst = ", ".join(
        f"struct_pack(t := {i}, v := CAST({v!r} AS DOUBLE))"
        for i, v in enumerate(vals)
    )
    sql = (
        f"WITH w AS (SELECT list_sort([{lst}]) AS ts_vals_sorted) "
        f"SELECT {_holt_winters_value_sql('duckdb', sf, tf)} FROM w"
    )
    global _HW_CON
    try:
        got = _HW_CON.execute(sql).fetchall()[0][0]
    except NameError:
        _HW_CON = duckdb.connect()
        got = _HW_CON.execute(sql).fetchall()[0][0]
    exp = ref(vals, sf, tf)
    # identical op order → bit-identical unless an intermediate overflows
    import math

    if math.isfinite(exp):
        assert got == exp or abs(got - exp) <= 1e-9 * max(1.0, abs(exp)), (
            got, exp, vals, sf, tf,
        )
