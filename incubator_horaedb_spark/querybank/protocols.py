"""Protocol query frontends exercised end-to-end: OpenTSDB and InfluxQL.

Both compile to DataFrames through incubator_horaedb_spark.frontends — the
queries here go through the full parse→plan path, not hand-built DataFrames,
mirroring the reference's protocol integration tests
(integration_tests/cases/env/local/{influxql,opentsdb}/basic.sql).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from incubator_horaedb_spark.frontends.influxql import influxql_to_df
from incubator_horaedb_spark.frontends.opentsdb import parse_query_request, query_to_dfs
from incubator_horaedb_spark.functions.detfloat import (
    BITS_SMALL,
    dyadic,
    dyadic_sql,
    r_out,
    r_out_sql,
)
from incubator_horaedb_spark.functions.time_bucket import date_bin_sql
from incubator_horaedb_spark.querybank.registry import load, load_time_range, register

_START = 1704067200000  # 2024-01-01T00:00:00Z
_END = 1706659200000  # 2024-01-31T00:00:00Z


@register(
    "opentsdb_downsample_groupby",
    oracle=f"""
    SELECT event_type,
           {date_bin_sql(3600000, 'ts')} AS ts,
           (CAST(floor((avg(CAST(floor((value * 1048576) + 0.5) AS DOUBLE) / 1048576)) * CAST(10000 AS DOUBLE) + CAST(0.5 AS DOUBLE)) AS DOUBLE) / CAST(10000 AS DOUBLE)) AS value
    FROM events
    WHERE epoch_ms(ts) >= {_START} AND epoch_ms(ts) <= {_END}
      AND event_type IN ('click', 'view')
    GROUP BY 1, 2
    """,
)
def opentsdb_downsample_groupby(spark: SparkSession, sf_dir: str) -> DataFrame:
    """OpenTSDB /api/query: literal_or tag filter + 1h-avg downsample grouped
    by tag (opentsdb/mod.rs:137-200)."""
    request = parse_query_request(
        {
            "start": _START,
            "end": _END,
            "queries": [
                {
                    "metric": "events",
                    "aggregator": "avg",
                    "downsample": "1h-avg",
                    "filters": [
                        {
                            "type": "literal_or",
                            "tagk": "event_type",
                            "filter": "click|view",
                            "groupBy": True,
                        }
                    ],
                }
            ],
        }
    )
    ev = load_time_range(spark, sf_dir, "events", "ts", lo=_START, hi=_END).withColumn(
        "value", dyadic("value", BITS_SMALL)
    )
    (df,) = query_to_dfs(ev, request)
    return df.select("event_type", "ts", r_out("value", 4).alias("value"))


@register(
    "opentsdb_not_literal_or_raw",
    oracle=f"""
    SELECT ts, event_type, (CAST(floor((value) * CAST(10000 AS DOUBLE) + CAST(0.5 AS DOUBLE)) AS DOUBLE) / CAST(10000 AS DOUBLE)) AS value
    FROM events
    WHERE epoch_ms(ts) >= {_START} AND epoch_ms(ts) <= {_END}
      AND event_type NOT IN ('click', 'view', 'signup')
    """,
)
def opentsdb_not_literal_or_raw(spark: SparkSession, sf_dir: str) -> DataFrame:
    """OpenTSDB aggregator=none raw read with not_literal_or filter →
    time-ordered samples (default_sort_exprs, mod.rs:163-166)."""
    request = parse_query_request(
        {
            "start": _START,
            "end": _END,
            "queries": [
                {
                    "metric": "events",
                    "aggregator": "none",
                    "filters": [
                        {
                            "type": "not_literal_or",
                            "tagk": "event_type",
                            "filter": "click|view|signup",
                        }
                    ],
                }
            ],
        }
    )
    (df,) = query_to_dfs(load_time_range(spark, sf_dir, "events", "ts", lo=_START, hi=_END), request)
    return df.select("ts", "event_type", r_out("value", 4).alias("value"))


@register(
    "influxql_groupby_time_tag",
    oracle=f"""
    SELECT {date_bin_sql(21600000, 'ts')} AS time,
           event_type,
           (CAST(floor((avg(CAST(floor((value * 1048576) + 0.5) AS DOUBLE) / 1048576)) * CAST(10000 AS DOUBLE) + CAST(0.5 AS DOUBLE)) AS DOUBLE) / CAST(10000 AS DOUBLE)) AS mean_value,
           count(value) AS count_value
    FROM events
    WHERE ts >= TIMESTAMP '2024-01-05 00:00:00' AND ts < TIMESTAMP '2024-01-20 00:00:00'
    GROUP BY 1, 2
    """,
)
def influxql_groupby_time_tag(spark: SparkSession, sf_dir: str) -> DataFrame:
    """InfluxQL: SELECT mean(value), count(value) ... GROUP BY time(6h), tag
    — parsed by our InfluxQL frontend, compiled to date_bin + groupBy."""
    ev = load_time_range(spark, sf_dir, "events", "ts", lo=_START, hi=_END).withColumn(
        "value", dyadic("value", BITS_SMALL)
    )
    # fill(none) = only buckets with data (the oracle has no grid); the
    # default null-grid path is gated separately by influxql_fill_grid —
    # at sparse SFs the two differ (sf0.001: 231 vs 300 rows)
    df = influxql_to_df(
        "SELECT mean(value), count(value) FROM events "
        "WHERE time >= '2024-01-05 00:00:00' AND time < '2024-01-20 00:00:00' "
        "GROUP BY time(6h), event_type fill(none)",
        {"events": ev},
    )
    return df.select(
        "time",
        "event_type",
        r_out("mean_value", 4).alias("mean_value"),
        F.col("count_value"),
    )


@register(
    "influxql_fill_grid",
    oracle=f"""
    WITH agg AS (
      SELECT {date_bin_sql(21600000, 'ts')} AS time,
             event_type,
             count(value) AS count_value
      FROM events
      WHERE ts >= TIMESTAMP '2024-01-05 00:00:00' AND ts < TIMESTAMP '2024-01-20 00:00:00'
        AND value > 300
      GROUP BY 1, 2
    ),
    grid AS (
      SELECT t.event_type, g.time
      FROM (SELECT DISTINCT event_type FROM agg) t
      CROSS JOIN (
        SELECT unnest(generate_series(TIMESTAMP '2024-01-05 00:00:00',
                                      TIMESTAMP '2024-01-19 18:00:00',
                                      INTERVAL 6 HOUR)) AS time
      ) g
    )
    SELECT g.time, g.event_type, coalesce(a.count_value, 666) AS count_value
    FROM grid g
    LEFT JOIN agg a ON a.time = g.time AND a.event_type = g.event_type
    """,
)
def influxql_fill_grid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """InfluxQL GROUP BY time(..) fill(<n>): the full bucket grid per series
    with missing buckets filled — golden semantics from influxql/
    basic.result (grid spans WHERE bounds; count of an empty generated
    bucket is the fill constant, not 0).  Also exercises `ms`-suffixed
    epoch time literals.  The sparse filter (value > 300) makes ~2/3 of
    the 6h buckets empty, so the grid join is actually exercised."""
    ev = load_time_range(spark, sf_dir, "events", "ts", lo=_START, hi=_END)
    return influxql_to_df(
        "SELECT count(value) FROM events "
        "WHERE time >= 1704412800000ms AND time < 1705708800000ms AND value > 300 "
        "GROUP BY time(6h), event_type fill(666)",
        {"events": ev},
    )


@register(
    "influxql_raw_topn",
    oracle="""
    SELECT ts AS time, (CAST(floor((value) * CAST(10000 AS DOUBLE) + CAST(0.5 AS DOUBLE)) AS DOUBLE) / CAST(10000 AS DOUBLE)) AS value
    FROM events
    WHERE event_type = 'purchase'
    ORDER BY ts DESC
    LIMIT 50
    """,
)
def influxql_raw_topn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """InfluxQL raw field select with ORDER BY time DESC LIMIT — plans as
    Spark TakeOrderedAndProject (top-k, no global sort)."""
    # no time predicate in this query — full-history scan, so plain load
    df = influxql_to_df(
        "SELECT value FROM events WHERE event_type = 'purchase' ORDER BY time DESC LIMIT 50",
        {"events": load(spark, sf_dir, "events")},
    )
    return df.select("time", r_out("value", 4).alias("value"))


@register(
    "influxql_selectors",
    oracle=f"""
    SELECT {date_bin_sql(1800000, 'ts')} AS time,
           event_type,
           min_by(value, ts) AS first_value,
           max_by(value, ts) AS last_value,
           max(value) - min(value) AS spread_value
    FROM events
    WHERE ts >= TIMESTAMP '2024-01-05 00:00:00' AND ts < TIMESTAMP '2024-01-12 00:00:00'
    GROUP BY 1, 2
    """,
)
def influxql_selectors(spark: SparkSession, sf_dir: str) -> DataFrame:
    """InfluxQL selector functions first()/last()/spread() — the IOx
    influxql-query surface the reference reaches through its influxql
    planner crates (query_frontend/src/influxql/planner.rs:51).  first/
    last are value-at-min/max-time via min_by/max_by inside the same
    single hash agg as the other aggregates (no window, no self-join);
    deterministic because (event_type, ts) is unique — the same
    uniqueness contract the dedup read path assumes for (pk, __seq).
    Raw field values pass through untouched (no summation), so the
    outputs are bit-identical with zero quantization."""
    ev = load_time_range(
        spark, sf_dir, "events", "ts",
        lo=1704412800000, hi=1705017600000,  # 2024-01-05 .. 2024-01-12
    )
    return influxql_to_df(
        "SELECT first(value), last(value), spread(value) FROM events "
        "WHERE time >= '2024-01-05 00:00:00' AND time < '2024-01-12 00:00:00' "
        "GROUP BY time(30m), event_type fill(none)",
        {"events": ev},
    )


@register(
    "influxql_derivative",
    oracle=f"""
    WITH agg AS (
      SELECT {date_bin_sql(21600000, 'ts')} AS time,
             event_type,
             avg(CAST(floor((value * 1048576) + 0.5) AS DOUBLE) / 1048576) AS m
      FROM events
      WHERE ts >= TIMESTAMP '2024-01-05 00:00:00' AND ts < TIMESTAMP '2024-01-20 00:00:00'
      GROUP BY 1, 2
    ),
    d AS (
      SELECT time, event_type,
             (m - lag(m) OVER w)
               / ((epoch_ms(time) - lag(epoch_ms(time)) OVER w) / 1000.0) AS der
      FROM agg
      WINDOW w AS (PARTITION BY event_type ORDER BY time)
    )
    SELECT time, event_type,
           (CAST(floor((der) * CAST(1000000 AS DOUBLE) + CAST(0.5 AS DOUBLE)) AS DOUBLE)
            / CAST(1000000 AS DOUBLE)) AS derivative_value
    FROM d WHERE der IS NOT NULL
    """,
)
def influxql_derivative(spark: SparkSession, sf_dir: str) -> DataFrame:
    """InfluxQL DERIVATIVE transformation — `derivative(mean(value), 1s)`
    over 6h buckets: per-series delta between consecutive buckets scaled
    to per-second, one lag window over the bucketed series (never raw
    samples).  Bucket means are exact rationals (dyadic addends sum
    exactly in double at any realistic bucket size), so the single
    division + rounding is engine-stable."""
    ev = load_time_range(spark, sf_dir, "events", "ts", lo=_START, hi=_END).withColumn(
        "value", dyadic("value", BITS_SMALL)
    )
    df = influxql_to_df(
        "SELECT derivative(mean(value), 1s) FROM events "
        "WHERE time >= '2024-01-05 00:00:00' AND time < '2024-01-20 00:00:00' "
        "GROUP BY time(6h), event_type fill(none)",
        {"events": ev},
    )
    return df.select(
        "time", "event_type", r_out("derivative_value", 6).alias("derivative_value")
    )


@register(
    "influxql_non_negative_derivative",
    oracle=f"""
    WITH agg AS (
      SELECT {date_bin_sql(21600000, 'ts')} AS time,
             event_type,
             avg(CAST(floor((value * 1048576) + 0.5) AS DOUBLE) / 1048576) AS m
      FROM events
      WHERE ts >= TIMESTAMP '2024-01-05 00:00:00' AND ts < TIMESTAMP '2024-01-20 00:00:00'
      GROUP BY 1, 2
    ),
    d AS (
      SELECT time, event_type,
             (m - lag(m) OVER w)
               / ((epoch_ms(time) - lag(epoch_ms(time)) OVER w) / 1000.0) AS der
      FROM agg
      WINDOW w AS (PARTITION BY event_type ORDER BY time)
    )
    SELECT time, event_type,
           (CAST(floor((der) * CAST(1000000 AS DOUBLE) + CAST(0.5 AS DOUBLE)) AS DOUBLE)
            / CAST(1000000 AS DOUBLE)) AS non_negative_derivative_value
    FROM d WHERE der IS NOT NULL AND der >= 0
    """,
)
def influxql_non_negative_derivative(spark: SparkSession, sf_dir: str) -> DataFrame:
    """InfluxQL NON_NEGATIVE_DERIVATIVE — derivative with negative results
    OMITTED (not clamped), the standard counter-rate transformation for
    monotonic gauges.  Same exactness argument as influxql_derivative:
    bucket means are single IEEE divisions of exact dyadic sums, the
    delta/scale chain is one subtraction + one division, and the >= 0
    filter compares bit-identical doubles on both engines."""
    ev = load_time_range(spark, sf_dir, "events", "ts", lo=_START, hi=_END).withColumn(
        "value", dyadic("value", BITS_SMALL)
    )
    df = influxql_to_df(
        "SELECT non_negative_derivative(mean(value), 1s) FROM events "
        "WHERE time >= '2024-01-05 00:00:00' AND time < '2024-01-20 00:00:00' "
        "GROUP BY time(6h), event_type fill(none)",
        {"events": ev},
    )
    return df.select(
        "time", "event_type",
        r_out("non_negative_derivative_value", 6).alias("non_negative_derivative_value"),
    )


@register(
    "influxql_moving_average",
    oracle=f"""
    WITH agg AS (
      SELECT {date_bin_sql(21600000, 'ts')} AS time,
             event_type,
             sum(CAST(floor((value * 1048576) + 0.5) AS DOUBLE) / 1048576) AS s
      FROM events
      WHERE ts >= TIMESTAMP '2024-01-05 00:00:00' AND ts < TIMESTAMP '2024-01-20 00:00:00'
      GROUP BY 1, 2
    ),
    ma AS (
      SELECT time, event_type,
             avg(s) OVER w AS mavg,
             count(s) OVER w AS mn
      FROM agg
      WINDOW w AS (PARTITION BY event_type ORDER BY time
                   ROWS BETWEEN 3 PRECEDING AND CURRENT ROW)
    )
    SELECT time, event_type,
           (CAST(floor((mavg) * CAST(1000000 AS DOUBLE) + CAST(0.5 AS DOUBLE)) AS DOUBLE)
            / CAST(1000000 AS DOUBLE)) AS moving_average_value
    FROM ma WHERE mn = 4
    """,
)
def influxql_moving_average(spark: SparkSession, sf_dir: str) -> DataFrame:
    """InfluxQL MOVING_AVERAGE — `moving_average(sum(value), 4)` over 6h
    buckets: rolling mean of the last 4 bucket sums per series, emitted
    from the 4th bucket on (InfluxDB starts at the Nth value).  Exactness:
    bucket sums of dyadic-quantized addends are exact dyadic rationals
    (order-independent), their 4-window sum stays exact, and dividing by
    4 (a power of two) is exact — so the moving average is bit-identical
    on both engines regardless of summation order or DuckDB's
    segment-tree window accumulation."""
    ev = load_time_range(spark, sf_dir, "events", "ts", lo=_START, hi=_END).withColumn(
        "value", dyadic("value", BITS_SMALL)
    )
    df = influxql_to_df(
        "SELECT moving_average(sum(value), 4) FROM events "
        "WHERE time >= '2024-01-05 00:00:00' AND time < '2024-01-20 00:00:00' "
        "GROUP BY time(6h), event_type fill(none)",
        {"events": ev},
    )
    return df.select(
        "time", "event_type",
        r_out("moving_average_value", 6).alias("moving_average_value"),
    )


@register(
    "influxql_difference",
    oracle=f"""
    WITH agg AS (
      SELECT {date_bin_sql(21600000, 'ts')} AS time,
             event_type,
             sum({dyadic_sql('value', BITS_SMALL)}) AS s
      FROM events
      WHERE ts >= TIMESTAMP '2024-01-05 00:00:00' AND ts < TIMESTAMP '2024-01-20 00:00:00'
      GROUP BY 1, 2
    ),
    d AS (
      SELECT time, event_type, s - lag(s) OVER w AS dv
      FROM agg WINDOW w AS (PARTITION BY event_type ORDER BY time)
    )
    SELECT time, event_type, {r_out_sql('dv', 6)} AS difference_value
    FROM d WHERE dv IS NOT NULL
    """,
)
def influxql_difference(spark: SparkSession, sf_dir: str) -> DataFrame:
    """InfluxQL DIFFERENCE transformation — `difference(sum(value))` over
    6h buckets: per-series delta between consecutive bucket values, no unit
    scaling, first point omitted (iox transformation surface reached via
    src/query_frontend/src/influxql/planner.rs:51).  Exactness: bucket sums
    of dyadic-quantized addends are exact rationals, and their difference
    stays exact — bit-identical on both engines."""
    ev = load_time_range(spark, sf_dir, "events", "ts", lo=_START, hi=_END).withColumn(
        "value", dyadic("value", BITS_SMALL)
    )
    df = influxql_to_df(
        "SELECT difference(sum(value)) FROM events "
        "WHERE time >= '2024-01-05 00:00:00' AND time < '2024-01-20 00:00:00' "
        "GROUP BY time(6h), event_type fill(none)",
        {"events": ev},
    )
    return df.select(
        "time", "event_type", r_out("difference_value", 6).alias("difference_value")
    )


@register(
    "influxql_cumulative_sum",
    oracle=f"""
    WITH agg AS (
      SELECT {date_bin_sql(21600000, 'ts')} AS time,
             event_type,
             sum({dyadic_sql('value', BITS_SMALL)}) AS s
      FROM events
      WHERE ts >= TIMESTAMP '2024-01-05 00:00:00' AND ts < TIMESTAMP '2024-01-20 00:00:00'
      GROUP BY 1, 2
    ),
    c AS (
      SELECT time, event_type,
             sum(s) OVER (PARTITION BY event_type ORDER BY time
                          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cs
      FROM agg
    )
    SELECT time, event_type, {r_out_sql('cs', 6)} AS cumulative_sum_value
    FROM c
    """,
)
def influxql_cumulative_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """InfluxQL CUMULATIVE_SUM — `cumulative_sum(sum(value))` over 6h
    buckets: per-series running sum emitted at EVERY bucket (InfluxDB emits
    from the first point, unlike difference/derivative).  A running sum of
    exact dyadic bucket sums stays exact (addends share the 2^-20 grid and
    the total is far below 2^53·2^-20), so both engines agree bitwise."""
    ev = load_time_range(spark, sf_dir, "events", "ts", lo=_START, hi=_END).withColumn(
        "value", dyadic("value", BITS_SMALL)
    )
    df = influxql_to_df(
        "SELECT cumulative_sum(sum(value)) FROM events "
        "WHERE time >= '2024-01-05 00:00:00' AND time < '2024-01-20 00:00:00' "
        "GROUP BY time(6h), event_type fill(none)",
        {"events": ev},
    )
    return df.select(
        "time", "event_type",
        r_out("cumulative_sum_value", 6).alias("cumulative_sum_value"),
    )


@register(
    "influxql_elapsed",
    oracle="""
    WITH d AS (
      SELECT ts AS time, event_type,
             CAST(floor((epoch_ms(ts) - lag(epoch_ms(ts)) OVER (
                    PARTITION BY event_type ORDER BY ts)) / 1000.0) AS BIGINT)
               AS elapsed_value
      FROM events
      WHERE ts >= TIMESTAMP '2024-01-05 00:00:00' AND ts < TIMESTAMP '2024-01-07 00:00:00'
    )
    SELECT time, event_type, elapsed_value FROM d WHERE elapsed_value IS NOT NULL
    """,
)
def influxql_elapsed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """InfluxQL ELAPSED — `elapsed(value, 1s)` over the RAW point stream:
    per-series time delta between consecutive points truncated to whole
    units, first point omitted.  Pure integer arithmetic on epoch ms, so
    exact; ties in ts yield a 0 delta in any stable order, making the
    output multiset order-independent.  One lag window per series — at
    scale a single sort-within-partition after a tag-hash exchange."""
    ev = load_time_range(
        spark, sf_dir, "events", "ts",
        lo=1704412800000, hi=1704585600000,  # 2024-01-05 .. 2024-01-07
    )
    return influxql_to_df(
        "SELECT elapsed(value, 1s) FROM events "
        "WHERE time >= '2024-01-05 00:00:00' AND time < '2024-01-07 00:00:00' "
        "GROUP BY event_type",
        {"events": ev},
    )


@register(
    "influxql_percentile",
    oracle=f"""
    WITH g AS (
      SELECT {date_bin_sql(86400000, 'ts')} AS time, event_type,
             list_sort(list(value)) AS arr, count(*) AS n
      FROM events
      WHERE ts >= TIMESTAMP '2024-01-05 00:00:00' AND ts < TIMESTAMP '2024-01-20 00:00:00'
      GROUP BY 1, 2
    )
    SELECT time, event_type,
           arr[CAST(floor(n * 90 / 100.0 + 0.5) AS INT)] AS percentile_value
    FROM g
    """,
)
def influxql_percentile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """InfluxQL PERCENTILE — `percentile(value, 90)` per 1d bucket and tag:
    InfluxDB's NEAREST-RANK selector (sort ascending, take the element at
    floor(n·p/100 + 0.5), 1-based) — it returns a REAL point value, not an
    interpolated quantile, so the untouched double passes through both
    engines bit-identically.  Spark side is sort_array(collect_list) +
    F.get — per-bucket group sizes, map-side combinable."""
    ev = load_time_range(spark, sf_dir, "events", "ts", lo=_START, hi=_END)
    return influxql_to_df(
        "SELECT percentile(value, 90) FROM events "
        "WHERE time >= '2024-01-05 00:00:00' AND time < '2024-01-20 00:00:00' "
        "GROUP BY time(1d), event_type fill(none)",
        {"events": ev},
    )


@register(
    "influxql_top",
    oracle="""
    WITH r AS (
      SELECT ts AS time, event_type, value,
             row_number() OVER (PARTITION BY event_type
                                ORDER BY value DESC, ts ASC) AS rk
      FROM events
      WHERE ts >= TIMESTAMP '2024-01-05 00:00:00' AND ts < TIMESTAMP '2024-01-20 00:00:00'
    )
    SELECT time, event_type, value AS top_value FROM r WHERE rk <= 3
    """,
)
def influxql_top(spark: SparkSession, sf_dir: str) -> DataFrame:
    """InfluxQL TOP — `top(value, 3)` per tag: the N largest POINTS per
    series with their own timestamps preserved (a multi-row selector, not
    an aggregate).  Rank window ordered (value DESC, ts ASC) so the result
    multiset is deterministic across engines; values pass through exact.
    At scale: per-series top-k via one rank window — Spark pushes a
    partial top-k into each partition before the exchange."""
    ev = load_time_range(spark, sf_dir, "events", "ts", lo=_START, hi=_END)
    return influxql_to_df(
        "SELECT top(value, 3) FROM events "
        "WHERE time >= '2024-01-05 00:00:00' AND time < '2024-01-20 00:00:00' "
        "GROUP BY event_type",
        {"events": ev},
    )


@register(
    "influxql_bottom",
    oracle="""
    WITH r AS (
      SELECT ts AS time, event_type, value,
             row_number() OVER (PARTITION BY event_type
                                ORDER BY value ASC, ts ASC) AS rk
      FROM events
      WHERE ts >= TIMESTAMP '2024-01-05 00:00:00' AND ts < TIMESTAMP '2024-01-20 00:00:00'
    )
    SELECT time, event_type, value AS bottom_value FROM r WHERE rk <= 3
    """,
)
def influxql_bottom(spark: SparkSession, sf_dir: str) -> DataFrame:
    """InfluxQL BOTTOM — `bottom(value, 3)` per tag: the N smallest points
    per series (see influxql_top for the determinism/scale argument)."""
    ev = load_time_range(spark, sf_dir, "events", "ts", lo=_START, hi=_END)
    return influxql_to_df(
        "SELECT bottom(value, 3) FROM events "
        "WHERE time >= '2024-01-05 00:00:00' AND time < '2024-01-20 00:00:00' "
        "GROUP BY event_type",
        {"events": ev},
    )


@register(
    "influxql_multi_transform",
    oracle=f"""
    WITH agg AS (
      SELECT {date_bin_sql(21600000, 'ts')} AS time,
             event_type,
             avg({dyadic_sql('value', BITS_SMALL)}) AS m
      FROM events
      WHERE ts >= TIMESTAMP '2024-01-05 00:00:00' AND ts < TIMESTAMP '2024-01-20 00:00:00'
      GROUP BY 1, 2
    ),
    t AS (
      SELECT time, event_type,
             (m - lag(m) OVER w)
               / ((epoch_ms(time) - lag(epoch_ms(time)) OVER w) / 1000.0) AS d,
             CASE WHEN count(m) OVER w4 = 4 THEN avg(m) OVER w4 END AS ma
      FROM agg
      WINDOW w AS (PARTITION BY event_type ORDER BY time),
             w4 AS (PARTITION BY event_type ORDER BY time
                    ROWS BETWEEN 3 PRECEDING AND CURRENT ROW)
    )
    SELECT time, event_type,
           {r_out_sql('d', 6)} AS derivative_value,
           {r_out_sql('ma', 6)} AS moving_average_value
    FROM t WHERE d IS NOT NULL OR ma IS NOT NULL
    """,
)
def influxql_multi_transform(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Combined InfluxQL transforms in ONE statement —
    `derivative(mean(value), 1s), moving_average(mean(value), 4)`: both
    computed off a SINGLE shared grouped frame (one shuffle, one window
    sort), rows aligned on the union with nulls where a transform has no
    value yet (ADVICE r10: the combination must compute both, not fail).
    The shared inner agg `mean(value)` is deduplicated to one aggregate
    column.  avg of a power-of-two window count (4) over exact dyadic
    means keeps the usual exactness headroom; outputs rounded to 6dp with
    the tie-proof floor form on both sides."""
    ev = load_time_range(spark, sf_dir, "events", "ts", lo=_START, hi=_END).withColumn(
        "value", dyadic("value", BITS_SMALL)
    )
    df = influxql_to_df(
        "SELECT derivative(mean(value), 1s), moving_average(mean(value), 4) "
        "FROM events "
        "WHERE time >= '2024-01-05 00:00:00' AND time < '2024-01-20 00:00:00' "
        "GROUP BY time(6h), event_type fill(none)",
        {"events": ev},
    )
    return df.select(
        "time", "event_type",
        r_out("derivative_value", 6).alias("derivative_value"),
        r_out("moving_average_value", 6).alias("moving_average_value"),
    )


_LIN_START = 1704412800000  # 2024-01-05
_LIN_END = 1705708800000  # 2024-01-20 (exclusive)
_LIN_STEP = 21600000  # 6h


@register(
    "influxql_fill_linear",
    oracle=f"""
    WITH agg AS (
      SELECT {date_bin_sql(_LIN_STEP, 'ts')} AS time,
             event_type,
             sum({dyadic_sql('value', BITS_SMALL)}) AS s
      FROM events
      WHERE ts >= TIMESTAMP '2024-01-05 00:00:00' AND ts < TIMESTAMP '2024-01-20 00:00:00'
        AND (user_id % 20) = 3
      GROUP BY 1, 2
    ),
    grid AS (
      SELECT make_timestamp(g.ms * 1000) AS time, t.event_type
      FROM (SELECT unnest(generate_series({_LIN_START}, {_LIN_END - _LIN_STEP},
                                          {_LIN_STEP})) AS ms) g
      CROSS JOIN (SELECT DISTINCT event_type FROM agg) t
    ),
    j AS (
      SELECT grid.time, grid.event_type, agg.s
      FROM grid LEFT JOIN agg USING (time, event_type)
    ),
    f AS (
      SELECT time, event_type, s,
             last_value(s IGNORE NULLS) OVER wp AS pv,
             first_value(s IGNORE NULLS) OVER wn AS nv,
             last_value(CASE WHEN s IS NOT NULL
                             THEN CAST(epoch_ms(time) AS DOUBLE) END IGNORE NULLS)
               OVER wp AS pt,
             first_value(CASE WHEN s IS NOT NULL
                              THEN CAST(epoch_ms(time) AS DOUBLE) END IGNORE NULLS)
               OVER wn AS nt
      FROM j
      WINDOW wp AS (PARTITION BY event_type ORDER BY time
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
             wn AS (PARTITION BY event_type ORDER BY time
                    ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
    )
    SELECT time, event_type,
           {r_out_sql(
               "coalesce(s, CASE WHEN pv IS NOT NULL AND nv IS NOT NULL THEN "
               "pv + (nv - pv) * (CAST(epoch_ms(time) AS DOUBLE) - pt) / (nt - pt) "
               "END)", 6)} AS sum_value
    FROM f
    """,
)
def influxql_fill_linear(spark: SparkSession, sf_dir: str) -> DataFrame:
    """InfluxQL fill(linear) — the remaining fill() mode (null/none/
    previous/<number> landed earlier): missing grid buckets interpolate
    linearly between the nearest known values per series; buckets outside
    the known range stay NULL.  The source is sparsified (every 20th user)
    so real gaps exist at the small tiers.  Exactness: bucket sums are
    exact dyadics, bucket times are exact integers, and both engines
    compute the same single-division interpolation — rounded to 6dp with
    the tie-proof floor form.  Distributed shape: two per-series
    carry-forward/backward windows over the grid join, never a self-join."""
    ev = (
        load_time_range(spark, sf_dir, "events", "ts", lo=_LIN_START, hi=_LIN_END)
        .filter("(user_id % 20) = 3")
        .withColumn("value", dyadic("value", BITS_SMALL))
    )
    df = influxql_to_df(
        "SELECT sum(value) FROM events "
        "WHERE time >= '2024-01-05 00:00:00' AND time < '2024-01-20 00:00:00' "
        "GROUP BY time(6h), event_type fill(linear)",
        {"events": ev},
    )
    return df.select(
        "time", "event_type", r_out("sum_value", 6).alias("sum_value")
    )


@register(
    "influxql_transform_over_fill",
    oracle=f"""
    WITH agg AS (
      SELECT {date_bin_sql(_LIN_STEP, 'ts')} AS time,
             event_type,
             sum({dyadic_sql('value', BITS_SMALL)}) AS s
      FROM events
      WHERE ts >= TIMESTAMP '2024-01-05 00:00:00' AND ts < TIMESTAMP '2024-01-20 00:00:00'
        AND (user_id % 20) = 3
      GROUP BY 1, 2
    ),
    grid AS (
      SELECT make_timestamp(g.ms * 1000) AS time, t.event_type
      FROM (SELECT unnest(generate_series({_LIN_START}, {_LIN_END - _LIN_STEP},
                                          {_LIN_STEP})) AS ms) g
      CROSS JOIN (SELECT DISTINCT event_type FROM agg) t
    ),
    j AS (
      SELECT grid.time, grid.event_type, agg.s
      FROM grid LEFT JOIN agg USING (time, event_type)
    ),
    f AS (
      SELECT time, event_type, s,
             last_value(s IGNORE NULLS) OVER wp AS pv,
             first_value(s IGNORE NULLS) OVER wn AS nv,
             last_value(CASE WHEN s IS NOT NULL
                             THEN CAST(epoch_ms(time) AS DOUBLE) END IGNORE NULLS)
               OVER wp AS pt,
             first_value(CASE WHEN s IS NOT NULL
                              THEN CAST(epoch_ms(time) AS DOUBLE) END IGNORE NULLS)
               OVER wn AS nt
      FROM j
      WINDOW wp AS (PARTITION BY event_type ORDER BY time
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
             wn AS (PARTITION BY event_type ORDER BY time
                    ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
    ),
    filled AS (
      SELECT time, event_type,
             coalesce(s, CASE WHEN pv IS NOT NULL AND nv IS NOT NULL THEN
               pv + (nv - pv) * (CAST(epoch_ms(time) AS DOUBLE) - pt) / (nt - pt)
             END) AS fv
      FROM f
    ),
    t AS (
      SELECT time, event_type,
             (fv - lag(fv) OVER w)
               / ((epoch_ms(time) - lag(epoch_ms(time)) OVER w) / 1000.0) AS d
      FROM filled
      WINDOW w AS (PARTITION BY event_type ORDER BY time)
    )
    SELECT time, event_type, {r_out_sql('d', 6)} AS derivative_value
    FROM t WHERE d IS NOT NULL
    """,
)
def influxql_transform_over_fill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Composed fill × transform (VERDICT r11 #7) —
    `derivative(sum(value), 1s) .. GROUP BY time(6h), event_type
    fill(linear)`: InfluxDB applies transforms AFTER fill, so the
    derivative runs over the interpolated grid, not the sparse buckets —
    interior gaps contribute the interpolated slope, and the grid's edge
    buckets (no surrounding known pair → still NULL after fill(linear))
    yield NULL derivatives whose rows drop, matching the engine pipeline's
    order (`frontends/influxql.py`: `_fill_time_grid` before
    `_apply_transforms`).  Source sparsified like influxql_fill_linear so
    real gaps exist at every tier; every series keeps ≥2 known buckets,
    so the filled interior is gap-free and lag-based derivative equals
    InfluxDB's skip-nulls walk.  Both engines evaluate the identical
    interpolation and quotient expression over exact dyadic sums → 6dp
    tie-proof rounding hashes bit-for-bit.
    Reference surface: iox transforms via influxql/planner.rs:51."""
    ev = (
        load_time_range(spark, sf_dir, "events", "ts", lo=_LIN_START, hi=_LIN_END)
        .filter("(user_id % 20) = 3")
        .withColumn("value", dyadic("value", BITS_SMALL))
    )
    df = influxql_to_df(
        "SELECT derivative(sum(value), 1s) FROM events "
        "WHERE time >= '2024-01-05 00:00:00' AND time < '2024-01-20 00:00:00' "
        "GROUP BY time(6h), event_type fill(linear)",
        {"events": ev},
    )
    return df.select(
        "time", "event_type", r_out("derivative_value", 6).alias("derivative_value")
    )


@register(
    "influxql_show_tag_values",
    oracle="""
    SELECT 'event_type' AS key, event_type AS value
    FROM events GROUP BY event_type ORDER BY value
    """,
)
def influxql_show_tag_values(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``SHOW TAG VALUES FROM events WITH KEY = event_type`` through the
    InfluxQL metadata dispatcher (frontends/influxql.py — the
    InfluxDB-standard statement beyond the reference's SELECT + SHOW
    MEASUREMENTS surface).  Distributed distinct; output is NDV-sized."""
    from incubator_horaedb_spark.frontends.influxql import influxql_metadata

    ev = load(spark, sf_dir, "events")
    out = influxql_metadata(
        'SHOW TAG VALUES FROM "events" WITH KEY = "event_type"', {"events": ev}
    )
    return out


@register(
    "opentsdb_rate_query",
    oracle=f"""
    WITH d AS (
      SELECT event_type,
             {date_bin_sql(21600000, 'ts')} AS ts,
             avg(CAST(floor((value * 1048576) + 0.5) AS DOUBLE) / 1048576) AS v
      FROM events
      WHERE epoch_ms(ts) >= {_START} AND epoch_ms(ts) <= {_END}
      GROUP BY 1, 2
    ),
    l AS (
      SELECT event_type, ts, v,
             lag(v)  OVER (PARTITION BY event_type ORDER BY ts) AS pv,
             lag(epoch_ms(ts)) OVER (PARTITION BY event_type ORDER BY ts) AS pms
      FROM d
    )
    SELECT event_type, ts,
           (CAST(floor(((v - pv) / ((epoch_ms(ts) - pms) / 1000.0))
                 * CAST(100000000 AS DOUBLE) + CAST(0.5 AS DOUBLE)) AS DOUBLE)
            / CAST(100000000 AS DOUBLE)) AS value
    FROM l WHERE pv IS NOT NULL
    """,
)
def opentsdb_rate_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """OpenTSDB /api/query with the ``rate`` option (the OpenTSDB-standard
    counter view; beyond-reference — the reference's SubQuery type
    carries no rate flag): 6h-avg downsample grouped by tag, then
    per-series first difference per second, emitted from the second
    bucket.  One series-keyed window over the downsampled (not raw)
    rows.  Dyadic input quantization makes the bucket means exact, so
    the rate divides bit-identical operands on both engines."""
    request = parse_query_request(
        {
            "start": _START,
            "end": _END,
            "queries": [
                {
                    "metric": "events",
                    "aggregator": "avg",
                    "rate": True,
                    "downsample": "6h-avg",
                    "filters": [
                        {
                            "type": "literal_or",
                            "tagk": "event_type",
                            "filter": "click|view|error|purchase|signup",
                            "groupBy": True,
                        }
                    ],
                }
            ],
        }
    )
    ev = load_time_range(spark, sf_dir, "events", "ts", lo=_START, hi=_END).withColumn(
        "value", dyadic("value", BITS_SMALL)
    )
    (df,) = query_to_dfs(ev, request)
    return df.select("event_type", "ts", r_out("value", 8).alias("value"))



@register(
    "opentsdb_filter_types",
    oracle=f"""
    SELECT event_type,
           {date_bin_sql(3600000, 'ts')} AS ts,
           {r_out_sql("avg(" + dyadic_sql('value', BITS_SMALL) + ")", 4)} AS value
    FROM events
    WHERE epoch_ms(ts) >= {_START} AND epoch_ms(ts) <= {_END}
      AND event_type LIKE '%i%'
      AND regexp_full_match(event_type, 'click|view|error')
    GROUP BY 1, 2
    """,
)
def opentsdb_filter_types(spark: SparkSession, sf_dir: str) -> DataFrame:
    """OpenTSDB 2.x filter types beyond the reference's literal set
    (mod.rs:103-116 has only literal_or/not_literal_or): a WILDCARD
    filter (*-glob -> SQL LIKE with LIKE metachars escaped, groupBy=True)
    intersected with a REGEXP filter (Java Pattern.matches semantics ->
    anchored rlike), over the standard 1h-avg downsample.  Both filters
    reach the scan as pushable string predicates."""
    request = parse_query_request(
        {
            "start": _START,
            "end": _END,
            "queries": [
                {
                    "metric": "events",
                    "aggregator": "avg",
                    "downsample": "1h-avg",
                    "filters": [
                        {
                            "type": "wildcard",
                            "tagk": "event_type",
                            "filter": "*i*",
                            "groupBy": True,
                        },
                        {
                            "type": "regexp",
                            "tagk": "event_type",
                            "filter": "click|view|error",
                        },
                    ],
                }
            ],
        }
    )
    ev = load_time_range(spark, sf_dir, "events", "ts", lo=_START, hi=_END).withColumn(
        "value", dyadic("value", BITS_SMALL)
    )
    (df,) = query_to_dfs(ev, request)
    return df.select("event_type", "ts", r_out("value", 4).alias("value"))
