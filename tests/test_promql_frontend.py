"""PromQL frontend tests: parsing and plan semantics, mirroring the
reference's promql plan tests (promql/udf.rs:180, convert.rs) and the
remote-query.py label-matching assertions."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from incubator_horaedb_spark.frontends.promql import (
    FIELD_LABEL,
    parse_duration_ms,
    parse_promql,
    promql_to_df,
)


def test_parse_selector_and_matchers():
    pq = parse_promql('cpu{host="a", region!="eu", env=~"prod|stage", dc!~"x.*"}[5m]')
    s = pq.selector
    assert s.metric == "cpu" and s.range_ms == 300_000
    assert [(m.name, m.op, m.value) for m in s.matchers] == [
        ("host", "=", "a"),
        ("region", "!=", "eu"),
        ("env", "=~", "prod|stage"),
        ("dc", "!~", "x.*"),
    ]


def test_parse_range_fn_and_agg():
    pq = parse_promql('sum by (host) (rate(cpu{env="p"}[1m]))')
    assert pq.range_fn == "rate" and pq.agg_op == "sum" and pq.agg_by == ["host"]
    pq2 = parse_promql("avg without (dc) (increase(cpu[2h]))")
    assert pq2.agg_without == ["dc"] and pq2.range_fn == "increase"
    pq3 = parse_promql("count(cpu) by (host)")  # trailing by-clause form
    assert pq3.agg_op == "count" and pq3.agg_by == ["host"]


def test_parse_field_selector():
    pq = parse_promql('cpu{%s="usage_sys", host="a"}' % FIELD_LABEL)
    assert pq.selector.field_name == "usage_sys"
    assert [m.name for m in pq.selector.matchers] == ["host"]


def test_parse_rejections():
    with pytest.raises(ValueError):
        parse_promql("rate(cpu)")  # range required
    with pytest.raises(ValueError):
        parse_promql("histogram_quantile(0.9, cpu)")  # NotSupportedFunc
    with pytest.raises(ValueError):
        parse_promql("cpu + cpu2")  # binary exprs rejected (convert.rs:346)
    with pytest.raises(ValueError):
        parse_duration_ms("5x")


def _metric_df(spark):
    rows = [
        ("a", "p", ms * 1000, float(v))
        for ms, v in [(0, 1), (30, 3), (60, 5), (90, 7)]
        for _ in [0]
    ] + [("b", "q", 0, 10.0), ("b", "q", 60_000, 40.0)]
    df = spark.createDataFrame(rows, "host string, env string, ms long, value double")
    return df.select("host", "env", F.timestamp_millis("ms").alias("ts"), "value")


def test_instant_selector_with_matcher(spark):
    df = promql_to_df(
        'cpu{host="a"}',
        {"cpu": _metric_df(spark)},
        start_ms=60_000,
        end_ms=120_000,
        step_ms=60_000,
    )
    rows = df.collect()
    # host=a only; instant at 60s → 5.0 (last ≤ t), at 120s → 7.0 (90s within 5m lookback)
    assert [(r["host"], r["value"]) for r in rows] == [("a", 5.0), ("a", 7.0)]


def test_sum_by_over_rate(spark):
    df = promql_to_df(
        "sum by (host) (delta(cpu[2m]))",
        {"cpu": _metric_df(spark)},
        start_ms=90_000,
        end_ms=90_000,
        step_ms=30_000,
    )
    rows = {r["host"]: r["value"] for r in df.collect()}
    # host a: samples 0..90s values 1..7 → delta full window = 6 * ext
    assert "a" in rows and "b" in rows
    assert df.columns == ["host", "ts", "value", "uid"]


def test_unknown_label_rejected(spark):
    with pytest.raises(ValueError):
        promql_to_df(
            'cpu{nolabel="x"}',
            {"cpu": _metric_df(spark)},
            start_ms=0,
            end_ms=60_000,
            step_ms=60_000,
        )


# --- extended evaluator grammar (parse_promql extended=True) ---------------


def test_extended_functions_rejected_by_default():
    # parity with the reference: outside the pushdown set → error
    from incubator_horaedb_spark.frontends.promql import parse_promql

    for q in (
        "topk(3, rate(m[5m]))",
        "clamp(m, 1, 2)",
        "max_over_time(rate(m[5m])[1h:5m])",
    ):
        with pytest.raises(ValueError):
            parse_promql(q)


def test_extended_parse_shapes():
    from incubator_horaedb_spark.frontends.promql import parse_promql

    pq = parse_promql('topk(3, rate(m{env="prod"}[5m]))', extended=True)
    assert pq.wrap_fn == "topk" and pq.wrap_args == (3.0,)
    assert pq.range_fn == "rate" and pq.selector.range_ms == 300_000
    assert pq.selector.matchers[0].name == "env"

    pq = parse_promql("clamp(m, 20, 100)", extended=True)
    assert pq.wrap_fn == "clamp" and pq.wrap_args == (20.0, 100.0)
    assert pq.range_fn is None

    pq = parse_promql("clamp_min(rate(m[1m]), 0)", extended=True)
    assert pq.wrap_fn == "clamp_min" and pq.wrap_args == (0.0,)

    pq = parse_promql("max_over_time(rate(m[2h])[1h:5m])", extended=True)
    assert pq.subquery == ("max", 3_600_000, 300_000)
    assert pq.range_fn == "rate" and pq.selector.range_ms == 7_200_000


def test_subquery_step_mismatch_rejected(spark):
    with pytest.raises(ValueError, match="subquery step"):
        promql_to_df(
            "max_over_time(rate(cpu[2m])[10m:5m])",
            {"cpu": _metric_df(spark)},
            start_ms=0,
            end_ms=60_000,
            step_ms=60_000,
            extended=True,
        )


def test_extended_topk_selects_per_timestamp(spark):
    df = promql_to_df(
        "topk(1, cpu)",
        {"cpu": _metric_df(spark)},
        start_ms=60_000,
        end_ms=120_000,
        step_ms=60_000,
        extended=True,
    )
    rows = df.collect()
    # one row per grid timestamp, the max-valued series, rn always 1
    assert all(r["rn"] == 1 for r in rows)
    by_ts = {r["ts"]: r for r in rows}
    assert len(by_ts) == len(rows)


def test_extended_clamp_bounds_values(spark):
    df = promql_to_df(
        "clamp(cpu, 5.5, 6.5)",
        {"cpu": _metric_df(spark)},
        start_ms=60_000,
        end_ms=120_000,
        step_ms=60_000,
        extended=True,
    )
    vals = [r["value"] for r in df.collect()]
    assert vals and all(5.5 <= v <= 6.5 for v in vals)
