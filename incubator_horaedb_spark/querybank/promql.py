"""PromQL surface: PromAlign range functions + PromQL-style aggregation.

Reference query shape (src/query_frontend/src/promql/convert.rs:155-353):
selector → scan + tag filters (incl. regex matchers via regex_match_expr)
→ PromAlignNode(range function) → optional aggregation grouped by
(timestamp, tags) → sort.  The supported pushdown functions are exactly
rate/irate/delta/idelta/increase/instant (promql/pushdown.rs:33-56).

Here: events is the metric table, tag = event_type, field = value,
timestamp key = ts.  Every query rounds `value` to 6 digits on both sides.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from incubator_horaedb_spark.functions.detfloat import dyadic, dyadic_sql, r_out, r_out_sql
from incubator_horaedb_spark.functions.hashing import regex_match
from incubator_horaedb_spark.operators.prom_align import prom_align, prom_align_oracle_sql
from incubator_horaedb_spark.querybank.registry import load, load_time_range, register

# Grid: full January 2024 at 1-hour steps with 2-hour lookback windows
# (~5-6 samples per series per window in the events table).
START_MS = 1704067200000  # 2024-01-01T00:00:00Z
END_MS = 1706659200000  # 2024-01-31T00:00:00Z
STEP_MS = 3_600_000
LOOKBACK_MS = 7_200_000

_PARAMS = dict(
    series_cols=["event_type"],
    ts_col="ts",
    value_col="value",
    start_ms=START_MS,
    end_ms=END_MS,
    step_ms=STEP_MS,
    lookback_ms=LOOKBACK_MS,
)
_ORACLE_PARAMS = dict(
    table="events",
    series_cols=["event_type"],
    ts_col="ts",
    value_col="value",
    start_ms=START_MS,
    end_ms=END_MS,
    step_ms=STEP_MS,
    lookback_ms=LOOKBACK_MS,
)


def _rounded(df: DataFrame) -> DataFrame:
    # floor(x*1e6 + 0.5)/1e6, NOT round(x, 6): Spark's round (BigDecimal
    # HALF_UP of shortest repr) and DuckDB's (scaled double) can disagree
    # within one ulp of a 6th-digit boundary — the exact failure class of
    # the r02 driver-reds.  The oracle renders the identical floor form
    # (prom_align_oracle_sql round_digits).
    v = F.col("value") * F.lit(1000000.0) + F.lit(0.5)
    return df.select(
        "event_type", "ts",
        (F.floor(v).cast("double") / F.lit(1000000.0)).alias("value"),
    )


def _load_range(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Events pruned to the align range [start - lookback, end] on the RAW
    nanos column (PushedFilters / row-group pruning — the Spark analogue of
    the reference's TimeRange extraction); prom_align re-applies the same
    inclusive bounds post-conversion, so results are unchanged."""
    return load_time_range(
        spark, sf_dir, "events", "ts", lo=START_MS - LOOKBACK_MS, hi=END_MS
    )


def _make(func: str):
    def q(spark: SparkSession, sf_dir: str) -> DataFrame:
        return _rounded(prom_align(_load_range(spark, sf_dir), func, **_PARAMS))

    q.__name__ = f"promql_{func}"
    q.__doc__ = (
        f"PromQL {func}() on aligned grid — port of prom_align.rs "
        "(see operators/prom_align.py for the exact semantics)."
    )
    return q


for _func in ("rate", "increase", "delta", "irate", "idelta", "instant"):
    register(f"promql_{_func}", oracle=prom_align_oracle_sql(_func, **_ORACLE_PARAMS))(_make(_func))

# Beyond-reference: the Prometheus `*_over_time` window aggregates on the
# same aligned grid (same window definition, no extrapolation) — see
# operators/prom_align.py OVER_TIME_FUNCS.
for _func in (
    "avg_over_time",
    "min_over_time",
    "max_over_time",
    "sum_over_time",
    "count_over_time",
    "last_over_time",
    "changes",
    "resets",
    "stdvar_over_time",
    "stddev_over_time",
    "quantile_over_time",
    "deriv",
    "predict_linear",
):
    register(f"promql_{_func}", oracle=prom_align_oracle_sql(_func, **_ORACLE_PARAMS))(_make(_func))


@register(
    "promql_rate_offset",
    oracle=prom_align_oracle_sql("rate", offset_ms=600_000, **_ORACLE_PARAMS),
)
def promql_rate_offset(spark: SparkSession, sf_dir: str) -> DataFrame:
    """`rate(metric[2h] offset 10m)` — the PromQL offset modifier: sample
    timestamps shift forward by the offset before stepping (step_helper,
    prom_align.rs:273-289), so each step sees [t - offset - lookback,
    t - offset].  Gated with the oracle applying the identical shift."""
    df = load(spark, sf_dir, "events")
    return _rounded(prom_align(df, "rate", offset_ms=600_000, **_PARAMS))


@register(
    "promql_sum_by_ts",
    oracle=f"""
    WITH aligned AS (
      {prom_align_oracle_sql("rate", round_digits=6, **_ORACLE_PARAMS)}
    )
    SELECT ts, {r_out_sql(f"sum({dyadic_sql('value')})", 6)} AS value
    FROM aligned
    GROUP BY ts
    """,
)
def promql_sum_by_ts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """`sum(rate(metric[2h]))` — PromQL aggregation over the align output,
    grouped by timestamp with tags dropped (convert.rs:270-315 groups by
    ts + kept tags).  Summed addends are dyadic-quantized for cross-engine
    sum determinism; all rounding is the tie-proof floor form
    (functions/detfloat.py)."""
    aligned = prom_align(_load_range(spark, sf_dir), "rate", **_PARAMS)
    q = dyadic(r_out("value", 6))
    return (
        aligned.select("ts", q.alias("value"))
        .groupBy("ts")
        .agg(r_out(F.sum("value"), 6).alias("value"))
    )


@register(
    "promql_parsed_max_rate",
    oracle=f"""
    WITH aligned AS (
      {prom_align_oracle_sql(
          "rate",
          round_digits=None,
          series_filter_sql="regexp_matches(event_type, '^(?:c.*|error)$')",
          **_ORACLE_PARAMS,
      )}
    )
    SELECT ts, {r_out_sql("max(value)", 6)} AS value, CAST(0 AS BIGINT) AS uid
    FROM aligned
    GROUP BY ts
    """,
)
def promql_parsed_max_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full PromQL text path: `max(rate(events{...}[2h]))` parsed by the
    frontend (frontends/promql.py), compiled selector→align→agg→unique_id
    like convert.rs.  max() is order-independent, so no quantization is
    needed for cross-engine determinism."""
    from incubator_horaedb_spark.frontends.promql import promql_to_df

    out = promql_to_df(
        'max(rate(events{event_type=~"c.*|error"}[2h]))',
        {"events": load(spark, sf_dir, "events")},
        start_ms=START_MS,
        end_ms=END_MS,
        step_ms=STEP_MS,
        tag_cols=["event_type"],
    )
    return out.select("ts", r_out("value", 6).alias("value"), "uid")


@register(
    "promql_regex_selector",
    oracle=prom_align_oracle_sql(
        "instant",
        series_filter_sql="regexp_matches(event_type, '^(c.*|error)$')",
        **_ORACLE_PARAMS,
    ),
)
def promql_regex_selector(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Selector with a regex label matcher (`event_type =~ "c.*|error"`) —
    PromQL =~ compiles to regex_match_expr (promql/udf.rs:50-96), here
    `rlike` applied before alignment so it pushes into the scan."""
    ev = load(spark, sf_dir, "events").filter(regex_match("event_type", "^(c.*|error)$"))
    return _rounded(prom_align(ev, "instant", **_PARAMS))
