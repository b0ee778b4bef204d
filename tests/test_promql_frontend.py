"""PromQL frontend tests: parsing and plan semantics, mirroring the
reference's promql plan tests (promql/udf.rs:180, convert.rs) and the
remote-query.py label-matching assertions."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from incubator_horaedb_spark.frontends.promql import (
    FIELD_LABEL,
    BinExpr,
    PromQuery,
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


def test_parse_new_evaluator_functions():
    """Round-6 grammar: direct *_over_time forms, absent, histogram,
    count_values, label ops — all reachable from text."""
    pq = parse_promql("avg_over_time(cpu[5m])", extended=True)
    assert pq.range_fn == "avg_over_time" and pq.selector.range_ms == 300_000
    pq = parse_promql("quantile_over_time(0.75, cpu[5m])", extended=True)
    assert pq.range_fn == "quantile_over_time" and pq.fn_args == (0.75,)
    pq = parse_promql("predict_linear(cpu[5m], 600)", extended=True)
    assert pq.range_fn == "predict_linear" and pq.fn_args == (600.0,)
    pq = parse_promql("absent_over_time(cpu[5m])", extended=True)
    assert pq.range_fn == "absent_over_time"
    pq = parse_promql("histogram_quantile(0.9, cpu_bucket)", extended=True)
    assert pq.wrap_fn == "histogram_quantile" and pq.wrap_args == (0.9,)
    pq = parse_promql('count_values("v", cpu)', extended=True)
    assert pq.wrap_fn == "count_values" and pq.wrap_label == "v"
    pq = parse_promql(
        'label_join(label_replace(cpu, "shard", "$1", "host", "(.).*"),'
        ' "j", "-", "host", "shard")',
        extended=True,
    )
    assert pq.label_ops == [
        ("replace", "shard", "$1", "host", "(.).*"),
        ("join", "j", "-", ["host", "shard"]),
    ]
    # direct over-time forms still reject non-range selectors
    with pytest.raises(ValueError):
        parse_promql("avg_over_time(cpu)", extended=True)


def test_parse_agg_with_wrap_records_both():
    """topk over an aggregation keeps BOTH stages (r05 ADVICE: the agg
    branch previously returned early, silently dropping the wrap)."""
    pq = parse_promql("topk(3, sum by (host) (rate(cpu[5m])))", extended=True)
    assert pq.agg_op == "sum" and pq.agg_by == ["host"] and pq.wrap_fn == "topk"


def test_group_left_prefix_is_operand():
    """A metric merely starting with group_left parses as an operand
    (r05 ADVICE: the peel regex consumed it as a matching modifier)."""
    b = parse_promql("rate(a[5m]) / group_left_total", extended=True)
    assert isinstance(b, BinExpr)
    assert b.rhs.selector.metric == "group_left_total" and not b.group_left


def test_topk_over_sum_applies_after_agg(spark):
    df = promql_to_df(
        "topk(1, sum by (host) (rate(cpu[2m])))",
        {"cpu": _metric_df(spark)},
        start_ms=60_000,
        end_ms=120_000,
        step_ms=60_000,
        extended=True,
    )
    rows = df.collect()
    assert rows and all(r["rn"] == 1 for r in rows)
    # one winner per timestamp among the aggregated (host) series
    assert len({r["ts"] for r in rows}) == len(rows)


def test_group_left_duplicate_rhs_raises(spark):
    """Duplicate right-side series per (ts, match keys) must raise, not
    silently duplicate left rows (r05 ADVICE)."""
    from pyspark.sql.utils import AnalysisException  # noqa: F401

    left = _metric_df(spark)
    # two distinct env series per host: unique per (host, env, ts) so they
    # survive alignment, but duplicates per the on(host) match keys
    dup = left.select(
        "host", F.concat(F.col("env"), F.lit("2")).alias("env"), "ts", "value"
    ).unionAll(left.select("host", "env", "ts", "value"))
    with pytest.raises(Exception, match="duplicate series"):
        promql_to_df(
            BinExpr(
                lhs=parse_promql("cpu", extended=True),
                op="*",
                rhs=parse_promql("info", extended=True),
                on=["host"],
                group_left=True,
            ),
            {"cpu": left, "info": dup},
            start_ms=60_000,
            end_ms=120_000,
            step_ms=60_000,
            extended=True,
        ).collect()


def test_absent_over_time_grid(spark):
    df = promql_to_df(
        'absent_over_time(cpu{host="nosuch"}[1m])',
        {"cpu": _metric_df(spark)},
        start_ms=0,
        end_ms=120_000,
        step_ms=60_000,
        extended=True,
    )
    rows = df.collect()
    assert [r["value"] for r in rows] == [1.0, 1.0, 1.0]


def test_parse_unary_and_comparison():
    pq = parse_promql("sqrt(abs(delta(cpu[5m])))", extended=True)
    assert pq.unary_fns == ["abs", "sqrt"] and pq.range_fn == "delta"
    pq = parse_promql("rate(cpu[5m]) >= bool 0.5", extended=True)
    assert pq.cmp == (">=", 0.5, True)
    # comparison chars inside matcher strings are not the operator
    pq = parse_promql('cpu{env=">"} > 5', extended=True)
    assert pq.cmp == (">", 5.0, False) and pq.selector.matchers[0].value == ">"


def test_comparison_filters_samples(spark):
    df = promql_to_df(
        "cpu > 6",
        {"cpu": _metric_df(spark)},
        start_ms=60_000,
        end_ms=120_000,
        step_ms=60_000,
        extended=True,
    )
    vals = [r["value"] for r in df.collect()]
    assert vals and all(v > 6 for v in vals)


def test_unary_abs_applies(spark):
    df = promql_to_df(
        "abs(delta(cpu[2m]))",
        {"cpu": _metric_df(spark)},
        start_ms=60_000,
        end_ms=120_000,
        step_ms=60_000,
        extended=True,
    )
    assert all(r["value"] >= 0 for r in df.collect())


def test_parse_set_operators():
    b = parse_promql('rate(a[5m]) unless on(host) up', extended=True)
    assert isinstance(b, BinExpr) and b.op == "unless" and b.on == ["host"]
    # set-op keywords inside identifiers or matcher strings do not split
    assert not isinstance(parse_promql("errors_and_total", extended=True), BinExpr)
    assert not isinstance(parse_promql('m{x="a and b"}', extended=True), BinExpr)
    with pytest.raises(ValueError, match="grouping"):
        parse_promql("a and group_left b", extended=True)


def test_set_operators_evaluate(spark):
    kw = dict(start_ms=60_000, end_ms=120_000, step_ms=60_000, extended=True)
    cpu = _metric_df(spark)
    both = promql_to_df('cpu and cpu{host="a"}', {"cpu": cpu}, **kw).collect()
    assert {r["host"] for r in both} == {"a"}
    rest = promql_to_df('cpu unless cpu{host="a"}', {"cpu": cpu}, **kw).collect()
    assert {r["host"] for r in rest} == {"b"}
    merged = promql_to_df(
        'clamp_min(cpu{host="a"}, 100) or cpu', {"cpu": cpu}, **kw
    ).collect()
    by_host = {}
    for r in merged:
        by_host.setdefault(r["host"], []).append(r["value"])
    assert all(v == 100.0 for v in by_host["a"])  # lhs wins for host a
    assert all(v < 100.0 for v in by_host["b"])  # rhs fills host b


def test_parse_scalar_and_vector_forms():
    from incubator_horaedb_spark.frontends.promql import ScalarExpr, VectorLit

    s = parse_promql("time()", extended=True)
    assert isinstance(s, ScalarExpr) and s.kind == "time"
    v = parse_promql("vector(1.5)", extended=True)
    assert isinstance(v, VectorLit) and v.value == 1.5
    b = parse_promql("rate(m[5m]) * 60", extended=True)
    assert isinstance(b, BinExpr) and isinstance(b.rhs, ScalarExpr)
    assert b.rhs.kind == "lit" and b.rhs.value == 60.0
    b = parse_promql("1 - m", extended=True)
    assert isinstance(b.lhs, ScalarExpr) and b.lhs.value == 1.0
    b = parse_promql("m / scalar(sum(rate(m[5m])))", extended=True)
    assert isinstance(b.rhs, ScalarExpr) and b.rhs.kind == "scalar_of"
    assert b.rhs.inner.agg_op == "sum"
    # scalar operands reject vector-matching clauses and set operators
    with pytest.raises(ValueError, match="scalar"):
        parse_promql("m / on() 5", extended=True)
    with pytest.raises(ValueError, match="vector operands"):
        parse_promql("m and 5", extended=True)
    # everything stays rejected without extended=
    for t in ("time()", "vector(1)", "rate(m[5m]) * 60", "m @ 100"):
        with pytest.raises(ValueError):
            parse_promql(t)


def test_parse_group_right_and_at():
    b = parse_promql("sum(rate(m[5m])) / on() group_right rate(m[5m])", extended=True)
    assert isinstance(b, BinExpr) and b.group_right and not b.group_left
    p = parse_promql("rate(m[5m] @ 1704672000)", extended=True)
    assert p.selector.at_s == 1704672000.0 and p.selector.range_ms == 300_000
    p = parse_promql("m @ end()", extended=True)
    assert p.selector.at_ref == "end"
    p = parse_promql("m offset 1h @ start()", extended=True)
    assert p.selector.at_ref == "start" and p.selector.offset_ms == 3_600_000
    # a metric merely starting with group_right is an operand
    b = parse_promql("rate(a[5m]) / group_right_total", extended=True)
    assert b.rhs.selector.metric == "group_right_total" and not b.group_right


def test_at_peel_is_string_aware():
    # a quoted label value containing @<digits> must NOT be split into a
    # truncated matcher + a pinned evaluation time (r6 ADVICE medium)
    p = parse_promql('events{user="bob@123"}', extended=True)
    assert p.selector.matchers[0].value == "bob@123"
    assert p.selector.at_ms is None and p.selector.at_s is None
    # a real @ after a quoted-@ matcher still parses
    p = parse_promql('events{user="a@b"} @ 60', extended=True)
    assert p.selector.matchers[0].value == "a@b" and p.selector.at_ms == 60_000


def test_at_under_over_time_wrappers():
    # @ under the *_over_time / quantile_over_time / predict_linear
    # wrappers (their inner parse is extended=False; the peel must still
    # run — r6 ADVICE low)
    p = parse_promql("avg_over_time(events[2h] @ 1704672000)", extended=True)
    assert p.range_fn == "avg_over_time" and p.selector.at_ms == 1_704_672_000_000
    p = parse_promql("quantile_over_time(0.9, events[1h] @ start())", extended=True)
    assert p.range_fn == "quantile_over_time" and p.selector.at_ref == "start"
    # still a clear rejection outside the extended grammar
    with pytest.raises(ValueError, match="extended"):
        parse_promql("events @ 100")


def test_scalar_arith_evaluates(spark):
    kw = dict(start_ms=60_000, end_ms=120_000, step_ms=60_000, extended=True)
    cpu = _metric_df(spark)
    doubled = promql_to_df("cpu * 2", {"cpu": cpu}, **kw).collect()
    base = promql_to_df("cpu", {"cpu": cpu}, **kw).collect()
    dv = {(r["host"], r["ts"]): r["value"] for r in doubled}
    for r in base:
        assert dv[(r["host"], r["ts"])] == r["value"] * 2
    # time() maps each sample to its grid timestamp in seconds
    t = promql_to_df("time() - cpu", {"cpu": cpu}, **kw).collect()
    for r in t:
        base_v = next(
            b["value"] for b in base if (b["host"], b["ts"]) == (r["host"], r["ts"])
        )
        assert r["value"] == r["ts"].timestamp() - base_v


def test_scalar_of_and_vector_lit(spark):
    kw = dict(start_ms=60_000, end_ms=120_000, step_ms=60_000, extended=True)
    cpu = _metric_df(spark)
    # scalar(sum(..)) divides every sample by the per-step total
    share = promql_to_df(
        "cpu / scalar(sum(cpu))", {"cpu": cpu}, **kw
    ).collect()
    tot = {r["ts"]: r["value"] for r in promql_to_df("sum(cpu)", {"cpu": cpu}, **kw).collect()}
    base = promql_to_df("cpu", {"cpu": cpu}, **kw).collect()
    sv = {(r["host"], r["ts"]): r["value"] for r in share}
    for r in base:
        assert abs(sv[(r["host"], r["ts"])] - r["value"] / tot[r["ts"]]) < 1e-12
    # scalar(cpu) is NULL when more than one series exists
    amb = promql_to_df("cpu / scalar(cpu)", {"cpu": cpu}, **kw).collect()
    assert all(r["value"] is None for r in amb)
    # vector(k) is the bare grid
    vl = promql_to_df("vector(7)", {"cpu": cpu}, **kw).collect()
    assert [r["value"] for r in vl] == [7.0, 7.0]


def test_group_right_mirrors_group_left(spark):
    kw = dict(start_ms=60_000, end_ms=120_000, step_ms=60_000, extended=True)
    cpu = _metric_df(spark)
    gl = promql_to_df(
        "cpu / on() group_left sum(cpu)", {"cpu": cpu}, **kw
    ).collect()
    gr = promql_to_df(
        "sum(cpu) / on() group_right cpu", {"cpu": cpu}, **kw
    ).collect()
    l = {(r["host"], r["ts"]): r["value"] for r in gl}
    r_ = {(r["host"], r["ts"]): r["value"] for r in gr}
    assert set(l) == set(r_)
    for k, v in l.items():
        assert abs(v * r_[k] - 1.0) < 1e-9  # share × inverse-share = 1
    # duplicate "one" (left) side raises under group_right: cpu holds two
    # series per ts, so under on() the left side is not unique per key
    with pytest.raises(Exception, match="group_right"):
        promql_to_df(
            "cpu / on() group_right sum(cpu)", {"cpu": cpu}, **kw
        ).collect()


def test_at_modifier_pins_instant(spark):
    kw = dict(start_ms=60_000, end_ms=120_000, step_ms=60_000, extended=True)
    cpu = _metric_df(spark)
    pinned = promql_to_df("cpu @ 60", {"cpu": cpu}, **kw).collect()
    # the value at t=60s replicates across both grid steps
    by_host = {}
    for r in pinned:
        by_host.setdefault(r["host"], set()).add(r["value"])
    assert by_host["a"] == {5.0} and by_host["b"] == {40.0}
    assert len(pinned) == 4  # 2 hosts x 2 steps
    ref = promql_to_df("cpu @ end()", {"cpu": cpu}, **kw).collect()
    live = promql_to_df("cpu", {"cpu": cpu}, **kw).collect()
    end_vals = {r["host"]: r["value"] for r in live if r["ts"].timestamp() == 120}
    for r in ref:
        assert r["value"] == end_vals[r["host"]]


# --- round-6 code-review fixes: precedence + stage composition ------------


def test_comparison_precedence_below_arithmetic():
    # rate(m) > 2 * 3 filters at the folded constant 6
    pq = parse_promql("rate(m[5m]) > 2 * 3", extended=True)
    assert isinstance(pq, PromQuery) and pq.cmp == (">", 6.0, False)
    pq = parse_promql("rate(m[5m]) > bool 2 + 1", extended=True)
    assert pq.cmp == (">", 3.0, True)
    # scalar on the left flips the operator
    pq = parse_promql("2 < rate(m[5m])", extended=True)
    assert pq.cmp == (">", 2.0, False)
    # comparisons bind tighter than or: both sides keep their thresholds
    pq = parse_promql("rate(a[5m]) > 3 or rate(b[5m]) > 4", extended=True)
    assert isinstance(pq, BinExpr) and pq.op == "or"
    assert pq.lhs.cmp == (">", 3.0, False) and pq.rhs.cmp == (">", 4.0, False)
    # trailing comparison over a binary vector expression
    pq = parse_promql("sum(rate(x[5m])) * 100 > 5", extended=True)
    assert isinstance(pq, BinExpr) and pq.op == "*"
    assert pq.cmp == (">", 5.0, False)
    pq = parse_promql("rate(a[5m]) / rate(b[5m]) > 0.5", extended=True)
    assert isinstance(pq, BinExpr) and pq.op == "/"
    assert pq.cmp == (">", 0.5, False)
    # unary minus after a comparison is a sign, not a split point
    pq = parse_promql("rate(m[5m]) < -1.5", extended=True)
    assert pq.cmp == ("<", -1.5, False)
    # vector-vector and scalar-scalar comparisons refuse loudly
    for bad in ("rate(a[5m]) > rate(b[5m])", "2 > 3"):
        with pytest.raises(ValueError):
            parse_promql(bad, extended=True)


def test_at_modifier_exact_epoch_ms():
    # float(text)*1000 would truncate the .001 to ...000
    pq = parse_promql("events @ 1704067200.001", extended=True)
    assert pq.selector.at_ms == 1704067200001


def test_absent_composes_with_cmp(spark):
    kw = dict(start_ms=60_000, end_ms=300_000, step_ms=60_000, extended=True)
    cpu = _metric_df(spark)
    base = promql_to_df("absent_over_time(cpu[1m])", {"cpu": cpu}, **kw).collect()
    assert base  # some steps have empty 1-minute windows
    filtered = promql_to_df(
        "absent_over_time(cpu[1m]) != 1", {"cpu": cpu}, **kw
    ).collect()
    assert filtered == []  # every absent sample is exactly 1
    boolified = promql_to_df(
        "absent_over_time(cpu[1m]) == bool 1", {"cpu": cpu}, **kw
    ).collect()
    assert [r["value"] for r in boolified] == [1.0] * len(base)


def test_or_pads_differing_label_sets(spark):
    kw = dict(start_ms=60_000, end_ms=120_000, step_ms=60_000, extended=True)
    cpu = _metric_df(spark)
    rows = promql_to_df("cpu or vector(0)", {"cpu": cpu}, **kw).collect()
    labeled = [r for r in rows if r["host"] is not None]
    fallback = [r for r in rows if r["host"] is None]
    # labeled lhs rows all survive; the label-free zero fills EVERY step
    # (no lhs series has the empty label set)
    assert len(labeled) == 4 and len(fallback) == 2
    assert all(r["value"] == 0.0 for r in fallback)
    # fully-aggregated lhs (empty label set) suppresses the fallback at
    # covered steps — the classic sum(...) or vector(0) shape
    rows = promql_to_df("sum(cpu) or vector(0)", {"cpu": cpu}, **kw).collect()
    assert all(r["value"] != 0.0 for r in rows) and len(rows) == 2


def test_scalar_of_empty_inner_keeps_rows(spark):
    kw = dict(start_ms=60_000, end_ms=120_000, step_ms=60_000, extended=True)
    cpu = _metric_df(spark)
    rows = promql_to_df(
        'cpu / scalar(sum(cpu{host="nope"}))', {"cpu": cpu}, **kw
    ).collect()
    live = promql_to_df("cpu", {"cpu": cpu}, **kw).collect()
    assert len(rows) == len(live)  # retention: NULL scalar, rows kept
    assert all(r["value"] is None for r in rows)


def test_cmp_targets_stage_value_column(spark):
    # cmp over a subquery must filter the SUBQUERY result, not the inner
    # per-step value (a flat counter has rate 0 but windowed max > 0)
    rows = [(s, v) for s, v in
            [(0, 0), (30, 10), (60, 20), (90, 40), (120, 40), (150, 40), (180, 40)]]
    import datetime
    base = datetime.datetime(2024, 1, 1)
    df = spark.createDataFrame(
        [(base + datetime.timedelta(seconds=s), "a", float(v)) for s, v in rows],
        "ts timestamp, host string, cpu double",
    )
    kw = dict(
        start_ms=int(base.timestamp()) * 1000 + 60_000,
        end_ms=int(base.timestamp()) * 1000 + 180_000,
        step_ms=60_000, tag_cols=["host"], default_field="cpu", extended=True,
    )
    plain = promql_to_df("max_over_time(rate(cpu[1m])[2m:1m])", {"cpu": df}, **kw).collect()
    kept = promql_to_df(
        "max_over_time(rate(cpu[1m])[2m:1m]) > 0.05", {"cpu": df}, **kw
    ).collect()
    # every step's windowed max exceeds the threshold even where the
    # instantaneous rate is 0 — nothing may drop
    assert len(kept) == len(plain) == 3
    # cmp over count_values filters the series COUNT (all 1 here → empty)
    empty = promql_to_df('count_values("v", cpu) > 1', {"cpu": df}, **kw).collect()
    assert empty == []
    # or on(<label absent from both sides>) matches trivially, no crash
    both = promql_to_df("vector(1) or on(job) vector(0)", {"cpu": df}, **kw).collect()
    assert sorted(set(r["value"] for r in both)) == [1.0]


# --- round-7 grammar residue: holt_winters, extended aggregation ops,
# --- sort/sort_desc, calendar functions, timestamp(), sgn ----------------


def test_parse_round7_grammar():
    p = parse_promql("holt_winters(events[2h], 0.5, 0.3)", extended=True)
    assert p.range_fn == "holt_winters" and p.fn_args == (0.5, 0.3)
    p = parse_promql(
        "double_exponential_smoothing(events[2h], 0.5, 0.3)", extended=True
    )
    assert p.range_fn == "holt_winters"
    with pytest.raises(ValueError, match="0, 1"):
        parse_promql("holt_winters(events[2h], 1.5, 0.3)", extended=True)
    p = parse_promql("quantile(0.9, rate(events[2h]))", extended=True)
    assert p.agg_op == "quantile" and p.agg_param == 0.9
    p = parse_promql("stddev by (h) (events)", extended=True)
    assert p.agg_op == "stddev" and p.agg_by == ["h"]
    p = parse_promql("sort_desc(sum by (h) (rate(events[1h])))", extended=True)
    assert p.sort_dir == "desc" and p.agg_op == "sum"
    p = parse_promql("hour(timestamp(events))", extended=True)
    assert p.unary_fns == ["timestamp", "hour"]
    # reference-parity mode still rejects all of them
    for t in (
        "stddev(m)", "stdvar(m)", "quantile(0.9, m)", "group(m)",
        "sort(m)", "sort_desc(m)", "holt_winters(m[5m], 0.5, 0.3)",
        "sgn(m)", "hour(m)",
    ):
        with pytest.raises(ValueError):
            parse_promql(t)


def test_holt_winters_matches_reference_fold(spark):
    import datetime

    def ts(s):
        return datetime.datetime.fromtimestamp(s, datetime.timezone.utc)

    samples = [(0, 1.0), (30, 2.0), (60, 4.0), (90, 3.0), (120, 8.0), (150, 2.5)]
    df = spark.createDataFrame(
        [("a", ts(t), float(v)) for t, v in samples],
        "s string, ts timestamp, value double",
    )
    from incubator_horaedb_spark.operators.prom_align import prom_align

    out = prom_align(
        df, "holt_winters", series_cols=["s"], ts_col="ts", value_col="value",
        start_ms=0, end_ms=180_000, step_ms=60_000, lookback_ms=120_000,
        hw_sf=0.5, hw_tf=0.3,
    )
    got = {int(r["ts"].timestamp()): r["value"] for r in out.collect()}

    def hw(vals, sf, tf):  # functions.go funcDoubleExponentialSmoothing
        if len(vals) < 2:
            return None
        s0, s1, b = 0.0, vals[0], vals[1] - vals[0]
        for i in range(1, len(vals)):
            x = sf * vals[i]
            if i - 1 > 0:
                b = tf * (s1 - s0) + (1 - tf) * b
            y = (1 - sf) * (s1 + b)
            s0, s1 = s1, x + y
        return s1

    for t in (0, 60, 120, 180):
        w = [v for (st, v) in samples if t - 120 <= st <= t]
        exp = hw(w, 0.5, 0.3)
        if exp is None:
            assert got.get(t) is None
        else:
            assert abs(got[t] - exp) < 1e-12, (t, got.get(t), exp)


def test_sort_desc_rank_and_calendar(spark):
    import datetime

    def ts(s):
        return datetime.datetime.fromtimestamp(s, datetime.timezone.utc)

    rows = [
        ("a", ts(50), 1.0), ("b", ts(50), 9.0), ("c", ts(55), 5.0),
        ("a", ts(110), 7.0), ("b", ts(115), 2.0), ("c", ts(115), 7.0),
    ]
    df = spark.createDataFrame(rows, "h string, ts timestamp, value double")
    kw = dict(
        start_ms=60_000, end_ms=120_000, step_ms=60_000,
        tag_cols=["h"], lookback_ms=60_000, extended=True,
    )
    out = promql_to_df("sort_desc(m)", {"m": df}, **kw).collect()
    by_step = {}
    for r in out:
        by_step.setdefault(int(r["ts"].timestamp()), []).append(r)
    for step_rows in by_step.values():
        ordered = sorted(step_rows, key=lambda r: r["rank"])
        vals = [r["value"] for r in ordered]
        assert vals == sorted(vals, reverse=True)
        # value ties break on the label
        for r1, r2 in zip(ordered, ordered[1:]):
            if r1["value"] == r2["value"]:
                assert r1["h"] < r2["h"]
    # hour(timestamp(v)): the value becomes the sample's own UTC hour
    out = promql_to_df("hour(timestamp(m))", {"m": df}, **kw).collect()
    assert out and all(r["value"] == 0.0 for r in out)  # epoch + <2min = hour 0
    out = promql_to_df("sgn(m)", {"m": df}, **kw).collect()
    assert out and all(r["value"] == 1.0 for r in out)
