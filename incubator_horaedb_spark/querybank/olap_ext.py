"""OLAP-analytics extensions: statistical aggregates, histograms, pivot,
and time-interval RANGE window frames.

All of these are reachable in the reference through DataFusion's SQL
planner and aggregate library (src/query_frontend/src/planner.rs:622-650
plants arbitrary SELECT into SqlToRel; DataFusion ships corr/covar/regr_*
and window RANGE frames), so they are declared reference surface even
though the sqlness corpus never exercises them.  Spark SQL provides the
same semantics natively.

Cross-engine determinism strategy (see functions/detfloat.py): statistical
moments are computed from INTEGER-quantized inputs so every aggregate sum
is exact (order-independent); the closed-form formulas then run the same
IEEE expression tree on identical doubles on both engines, which is
bit-deterministic — no engine-native corr()/regr_slope() implementations
(their incremental algorithms differ between engines in the last ulp).

Scale notes: every query here is a single scan + one hash aggregate (or
one window shuffle); the pivot is a partial→final count agg with a fixed
pivot-value list (no distinct-value discovery pass); the histogram's bin
id is computed map-side so the agg shuffles nbins rows per partition.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from incubator_horaedb_spark.querybank.registry import load, register


def _views(spark: SparkSession, sf_dir: str, *tables: str) -> None:
    for t in tables:
        load(spark, sf_dir, t).createOrReplaceTempView(t)


# --- statistical aggregates (corr / covar / linear regression) ------------
# Moments over integer-quantized x = round(l_quantity), y = round(price):
# sums of x, y, x*x, x*y, y*y stay below 2^53 at any realistic SF per
# group (y <= 1.05e5, y^2 <= 1.2e10; 1e9 rows/group * 1.2e10 overflows
# int64 at ~SF1000 — at that point the quantization scale drops, not the
# algorithm).  The formula arithmetic is identical IEEE double ops on both
# engines, so r_out(…, 6) matches exactly.
_MOMENTS = (
    "count(*) AS n, "
    "sum(xq) AS sx, sum(yq) AS sy, "
    "sum(xq * xq) AS sxx, sum(xq * yq) AS sxy, sum(yq * yq) AS syy"
)

def _r6(expr: str) -> str:
    return (
        f"(CAST(floor(({expr}) * CAST(1000000 AS DOUBLE) + CAST(0.5 AS DOUBLE)) AS DOUBLE)"
        " / CAST(1000000 AS DOUBLE))"
    )


def _corr_sql() -> str:
    n, sx, sy, sxx, sxy, syy = (
        f"CAST({c} AS DOUBLE)" for c in ("n", "sx", "sy", "sxx", "sxy", "syy")
    )
    cov_n = f"({n} * {sxy} - {sx} * {sy})"  # n^2 * covariance
    var_x = f"({n} * {sxx} - {sx} * {sx})"  # n^2 * variance(x)
    var_y = f"({n} * {syy} - {sy} * {sy})"
    slope = f"({cov_n} / {var_x})"
    body = ", ".join(
        [
            f"{n} AS n_rows",
            f"{_r6(f'{cov_n} / sqrt({var_x} * {var_y})')} AS corr_qty_price",
            f"{_r6(slope)} AS regr_slope",
            f"{_r6(f'({sy} - {slope} * {sx}) / {n}')} AS regr_intercept",
            f"{_r6(f'({cov_n} * {cov_n}) / ({var_x} * {var_y})')} AS regr_r2",
        ]
    )
    return f"""
    SELECT l_returnflag, {body}
    FROM (
        SELECT l_returnflag, {_MOMENTS}
        FROM (
            SELECT l_returnflag,
                   CAST(floor(l_quantity + 0.5) AS BIGINT) AS xq,
                   CAST(floor(l_extendedprice + 0.5) AS BIGINT) AS yq
            FROM lineitem
        ) q
        GROUP BY l_returnflag
    ) m
    ORDER BY l_returnflag
    """


@register("stats_corr_regr", oracle=_corr_sql())
def stats_corr_regr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pearson correlation + simple linear regression (slope, intercept,
    R^2) of extended price on quantity per return flag — DataFusion's
    corr/covar/regr_* aggregate family re-expressed as exact integer
    moments + closed-form doubles (module docstring).  One scan, one
    partial->final hash agg of 6 integer sums; the formula runs on 3 rows."""
    _views(spark, sf_dir, "lineitem")
    return spark.sql(_corr_sql())


# --- fixed-bin numeric histogram ------------------------------------------
_HIST_LO, _HIST_HI, _HIST_BINS = 0.0, 110000.0, 22


def _hist_sql() -> str:
    width = (_HIST_HI - _HIST_LO) / _HIST_BINS
    return f"""
    SELECT bin,
           CAST(bin * {width} AS DOUBLE) AS bin_lo,
           count(*) AS n_items,
           CAST(sum(CAST(floor(l_extendedprice * 100.0 + 0.5) AS BIGINT)) AS DOUBLE) / 100.0
               AS sum_price
    FROM (
        SELECT CAST(least(CAST({_HIST_BINS - 1} AS BIGINT),
                    greatest(CAST(0 AS BIGINT),
                             CAST(floor((l_extendedprice - {_HIST_LO}) / {width}) AS BIGINT)))
                    AS BIGINT) AS bin,
               l_extendedprice
        FROM lineitem
    ) b
    GROUP BY bin
    ORDER BY bin
    """


@register("numeric_histogram", oracle=_hist_sql())
def numeric_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-width histogram of extended price (22 bins, width_bucket
    semantics with clamped edges) — bin ids computed map-side so the
    aggregate shuffles at most nbins rows per input partition; per-bin sums
    are exact cent-quantized integers.  The classic OLAP profiling scan."""
    _views(spark, sf_dir, "lineitem")
    return spark.sql(_hist_sql())


# --- pivot (event_type -> columns) ----------------------------------------
_EVENT_TYPES = ("click", "error", "purchase", "signup", "view")


def _pivot_oracle() -> str:
    cols = ", ".join(
        f'CAST(sum(CASE WHEN event_type = \'{t}\' THEN 1 ELSE 0 END) AS BIGINT) AS "{t}"'
        for t in _EVENT_TYPES
    )
    return f"""
    SELECT CAST(user_id % 10 AS BIGINT) AS user_bucket, {cols}
    FROM events
    GROUP BY user_bucket
    ORDER BY user_bucket
    """


@register("pivot_event_counts", oracle=_pivot_oracle())
def pivot_event_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PIVOT: per user-bucket event counts fanned into one column per event
    type.  The pivot value list is FIXED (no distinct-discovery pre-pass —
    at 100 TB a discovery pass is a full extra scan) so the plan is a
    single partial->final pivot_sum aggregate.  Oracle renders the same
    thing as CASE sums."""
    ev = load(spark, sf_dir, "events")
    out = (
        ev.withColumn("user_bucket", (F.col("user_id") % 10).cast("long"))
        .groupBy("user_bucket")
        .pivot("event_type", list(_EVENT_TYPES))
        .count()
        .orderBy("user_bucket")
    )
    # pivot-count leaves NULL for empty cells; the CASE-sum oracle yields 0
    return out.select(
        "user_bucket",
        *[F.coalesce(F.col(f"`{t}`"), F.lit(0)).cast("long").alias(t) for t in _EVENT_TYPES],
    )


# --- time-interval RANGE window frame -------------------------------------
_RANGE_FRAME_SQL = """
    SELECT user_id, event_id,
           count(*) OVER w AS n_5m,
           (CAST(floor((sum(CAST(floor((value * 1048576) + 0.5) AS DOUBLE) / 1048576) OVER w)
                 * CAST(10000 AS DOUBLE) + CAST(0.5 AS DOUBLE)) AS DOUBLE)
            / CAST(10000 AS DOUBLE)) AS sum_5m
    FROM events
    WHERE user_id % 25 = 0
    WINDOW w AS (PARTITION BY user_id ORDER BY ts
                 RANGE BETWEEN INTERVAL '5' MINUTE PRECEDING AND CURRENT ROW)
    """

# DuckDB spells the interval literal differently but the frame semantics
# (peers included, timestamp-range lower bound inclusive) agree.
_RANGE_FRAME_ORACLE = _RANGE_FRAME_SQL.replace("INTERVAL '5' MINUTE", "INTERVAL 5 MINUTE")


@register("window_range_time_frame", oracle=_RANGE_FRAME_ORACLE)
def window_range_time_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Event-time RANGE window frame: per user, rolling 5-minute count and
    dyadic-exact sum ordered by timestamp.  RANGE (not ROWS) frames are the
    time-series-native frame — peers at the same timestamp aggregate
    identically regardless of tie order, which keeps the result
    deterministic.  One shuffle on user_id."""
    _views(spark, sf_dir, "events")
    return spark.sql(_RANGE_FRAME_SQL)


# --- explicit GROUPING SETS + grouping flags ------------------------------
_GSETS_SQL = """
    SELECT l_returnflag, l_linestatus,
           CAST(grouping(l_returnflag) AS BIGINT) AS g_flag,
           CAST(grouping(l_linestatus) AS BIGINT) AS g_status,
           count(*) AS n,
           CAST(sum(CAST(floor(l_extendedprice * 100.0 + 0.5) AS BIGINT)) AS DOUBLE) / 100.0
               AS total_price
    FROM lineitem
    GROUP BY GROUPING SETS ((l_returnflag, l_linestatus), (l_returnflag), ())
    """


@register("grouping_sets_explicit", oracle=_GSETS_SQL)
def grouping_sets_explicit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit GROUPING SETS with grouping() flags — completes the
    ROLLUP/CUBE family (DataFusion supports all three through SqlToRel).
    The grouping flags disambiguate a NULL group key from a super-
    aggregate row.  Exact cent-quantized sums; one expand + hash agg."""
    _views(spark, sf_dir, "lineitem")
    return spark.sql(_GSETS_SQL)


# --- TPC-H-shaped analytics (q3 / q6 analogues over the testdata) ---------
# Revenue addends are dyadic-quantized (2^-16) before summing, so the
# group sums are exact in any reduction order — the product itself is one
# IEEE multiply, identical on both engines.
_Q3_SQL = """
    SELECT l_orderkey,
           o_orderdate,
           o_orderpriority,
           (CAST(floor((sum(CAST(floor((l_extendedprice * (1 - l_discount)) * 65536 + 0.5)
                 AS DOUBLE) / 65536)) * CAST(100 AS DOUBLE) + CAST(0.5 AS DOUBLE)) AS DOUBLE)
            / CAST(100 AS DOUBLE)) AS revenue
    FROM customer
    JOIN orders ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    WHERE c_mktsegment = 'BUILDING'
      AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
      AND l_shipdate > TIMESTAMP '1998-01-01 00:00:00'
    GROUP BY l_orderkey, o_orderdate, o_orderpriority
    ORDER BY revenue DESC, l_orderkey
    LIMIT 10
    """


@register("q3_shipping_priority", oracle=_Q3_SQL)
def q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 (shipping priority): 3-way join, filtered on both fact and
    dimension sides, revenue agg, top-10.  Plan shape at scale: the
    customer side broadcasts (segment filter leaves ~1/5 of a dimension),
    orders⋈lineitem shuffles once on the order key, the top-10 is a
    TakeOrderedAndProject (no global sort).  Exact dyadic revenue sums."""
    _views(spark, sf_dir, "customer", "orders", "lineitem")
    return spark.sql(_Q3_SQL)


_Q6_SQL = """
    SELECT count(*) AS n_items,
           (CAST(floor((sum(CAST(floor((l_extendedprice * l_discount) * 65536 + 0.5)
                 AS DOUBLE) / 65536)) * CAST(100 AS DOUBLE) + CAST(0.5 AS DOUBLE)) AS DOUBLE)
            / CAST(100 AS DOUBLE)) AS revenue
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
      AND l_shipdate < TIMESTAMP '1998-01-01 00:00:00'
      AND l_discount >= 0.03 AND l_discount <= 0.07
      AND l_quantity < 25
    """


@register("q6_forecast_revenue", oracle=_Q6_SQL)
def q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6 (forecasting revenue change): the pure scan-filter-agg
    query — every predicate reaches PushedFilters (range on the ship-date,
    range on discount, bound on quantity), the agg is a 1-row global sum.
    The canonical predicate-pushdown benchmark."""
    _views(spark, sf_dir, "lineitem")
    return spark.sql(_Q6_SQL)


# --- single-pass column profiling -----------------------------------------
_PROFILE_COLS = ("l_quantity", "l_extendedprice", "l_discount", "l_tax")


def _profile_sql() -> str:
    aggs = ", ".join(
        f"count({c}) AS nn_{c}, count(DISTINCT {c}) AS nd_{c}, "
        f"CAST(min({c}) AS DOUBLE) AS mn_{c}, CAST(max({c}) AS DOUBLE) AS mx_{c}"
        for c in _PROFILE_COLS
    )
    rows = "\n    UNION ALL\n    ".join(
        f"SELECT '{c}' AS col_name, n_rows, n_rows - nn_{c} AS n_nulls, "
        f"CAST(nd_{c} AS BIGINT) AS n_distinct, mn_{c} AS min_v, mx_{c} AS max_v FROM a"
        for c in _PROFILE_COLS
    )
    return f"""
    WITH a AS (SELECT count(*) AS n_rows, {aggs} FROM lineitem)
    {rows}
    """


@register("column_profile", oracle=_profile_sql())
def column_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Single-pass column profiling (the zone-map / stats-collection scan
    a table-format maintenance job runs): one aggregate row computes
    count/nulls/NDV/min/max for every profiled column, then unpivots to
    one row per column.  ONE scan regardless of column count.  Exact NDV
    here (gate-checkable); at 100 TB swap count(DISTINCT) for
    approx_count_distinct per column — the plan shape is unchanged."""
    _views(spark, sf_dir, "lineitem")
    return spark.sql(_profile_sql())


# --- TPC-H Q5 analogue: the 6-table join ----------------------------------
_Q5_SQL = """
    SELECT n_name,
           (CAST(floor((sum(CAST(floor((l_extendedprice * (1 - l_discount)) * 65536 + 0.5)
                 AS DOUBLE) / 65536)) * CAST(100 AS DOUBLE) + CAST(0.5 AS DOUBLE)) AS DOUBLE)
            / CAST(100 AS DOUBLE)) AS revenue
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
    JOIN nation   ON s_nationkey = n_nationkey
    JOIN region   ON n_regionkey = r_regionkey
    WHERE r_name = 'ASIA'
      AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND o_orderdate <  TIMESTAMP '1998-01-01 00:00:00'
    GROUP BY n_name
    ORDER BY revenue DESC, n_name
    """


@register("q5_local_supplier_volume", oracle=_Q5_SQL)
def q5_local_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5 (local supplier volume): the widest join in the suite —
    region⋈nation⋈supplier⋈(customer⋈orders⋈lineitem) with the non-key
    c_nationkey = s_nationkey residual.  Plan shape at scale: region,
    nation, supplier and the filtered customer side all broadcast (AQE
    picks BroadcastHashJoin for every dimension), so the ONLY shuffle is
    orders⋈lineitem on the order key; the date range prunes order row
    groups via PushedFilters.  Exact dyadic revenue sums make the group
    totals reduction-order-independent (reference reaches this query
    through DataFusion's SqlToRel, planner.rs:622-650)."""
    _views(spark, sf_dir, "customer", "orders", "lineitem", "supplier", "nation", "region")
    return spark.sql(_Q5_SQL)


# --- FILTER (WHERE ...) aggregate modifiers -------------------------------
_AGG_FILTER_SQL = """
    SELECT l_returnflag,
           count(*) AS n_all,
           count(*) FILTER (WHERE l_discount > 0.05) AS n_hi_disc,
           count(*) FILTER (WHERE l_quantity < 10) AS n_small,
           CAST(sum(CAST(floor(l_extendedprice * 100.0 + 0.5) AS BIGINT))
                FILTER (WHERE l_tax > 0.04) AS BIGINT) AS cents_hi_tax,
           max(l_quantity) FILTER (WHERE l_linestatus = 'F') AS max_qty_f
    FROM lineitem
    GROUP BY l_returnflag
    """


@register("agg_filter_clause", oracle=_AGG_FILTER_SQL)
def agg_filter_clause(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANSI FILTER (WHERE ...) aggregate modifiers — several conditionally
    filtered aggregates in ONE scan + ONE hash agg (the alternative, a
    self-join per condition, is N scans).  DataFusion plans FILTER
    natively, so the reference accepts this through its SQL frontend;
    Spark compiles each to an if()-guarded partial agg, staying inside
    whole-stage codegen.  Integer cent sums; no FP reduction order
    dependence anywhere."""
    _views(spark, sf_dir, "lineitem")
    return spark.sql(_AGG_FILTER_SQL)


# --- semi-structured JSON column extraction -------------------------------
# The events.props column carries JSON payloads; extracting typed values
# out of semi-structured columns is core OLAP surface (DataFusion ships
# json functions; Spark's get_json_object evaluates a compiled JsonPath
# per row inside codegen — no Python).  The oracle uses DuckDB's native
# ->> extraction; both engines parse the same strict JSON, so the typed
# values agree exactly.
_JSON_SPARK_SQL = """
    SELECT event_type,
           count(*) AS n_events,
           count(get_json_object(props, '$.k')) AS n_with_k,
           sum(CAST(get_json_object(props, '$.k') AS BIGINT)) AS sum_k,
           min(CAST(get_json_object(props, '$.k') AS BIGINT)) AS min_k,
           max(CAST(get_json_object(props, '$.k') AS BIGINT)) AS max_k
    FROM events
    GROUP BY event_type
    """

_JSON_DUCK_SQL = """
    SELECT event_type,
           count(*) AS n_events,
           count(props->>'$.k') AS n_with_k,
           CAST(sum(CAST(props->>'$.k' AS BIGINT)) AS BIGINT) AS sum_k,
           min(CAST(props->>'$.k' AS BIGINT)) AS min_k,
           max(CAST(props->>'$.k' AS BIGINT)) AS max_k
    FROM events
    GROUP BY event_type
    """


@register("events_json_extract", oracle=_JSON_DUCK_SQL)
def events_json_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Typed extraction from a semi-structured JSON string column, then a
    grouped aggregate over the extracted value.  Single scan, map-side
    JsonPath evaluation, one hash agg; at 100 TB the extraction cost is
    the scan itself (no shuffle added), and frequently-queried paths
    should be materialized to a typed column by the compaction rewrite
    (table.py::optimize_zorder) rather than re-parsed per query."""
    _views(spark, sf_dir, "events")
    return spark.sql(_JSON_SPARK_SQL)


# --- NTILE window buckets -------------------------------------------------
_NTILE_SQL = """
    SELECT o_orderstatus, quartile,
           count(*) AS n,
           min(o_totalprice) AS min_price,
           max(o_totalprice) AS max_price
    FROM (
      SELECT o_orderstatus, o_totalprice,
             ntile(4) OVER (PARTITION BY o_orderstatus
                            ORDER BY o_totalprice, o_orderkey) AS quartile
      FROM orders
    ) t
    GROUP BY o_orderstatus, quartile
    """


@register("window_ntile_quartiles", oracle=_NTILE_SQL)
def window_ntile_quartiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NTILE(4) bucket assignment + per-bucket stats — the remaining SQL
    window-function family (rank/row_number/lag/lead/RANGE frames are
    covered by the other window queries).  The unique o_orderkey
    tie-break pins bucket boundaries so both engines split ties
    identically.  One window shuffle + one hash agg."""
    _views(spark, sf_dir, "orders")
    return spark.sql(_NTILE_SQL)


# --- TPC-H Q10 analogue: returned-item revenue ranking --------------------
_Q10_SQL = """
    SELECT c_custkey, c_name, n_name,
           (CAST(floor((sum(CAST(floor((l_extendedprice * (1 - l_discount)) * 65536 + 0.5)
                 AS DOUBLE) / 65536)) * CAST(100 AS DOUBLE) + CAST(0.5 AS DOUBLE)) AS DOUBLE)
            / CAST(100 AS DOUBLE)) AS revenue
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    JOIN nation   ON c_nationkey = n_nationkey
    WHERE l_returnflag = 'R'
      AND o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
      AND o_orderdate <  TIMESTAMP '1998-01-01 00:00:00'
    GROUP BY c_custkey, c_name, n_name
    ORDER BY revenue DESC, c_custkey
    LIMIT 20
    """


@register("q10_returned_items", oracle=_Q10_SQL)
def q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10 (returned-item reporting): who cost us the most in
    returns.  Plan shape at scale: nation broadcasts, customer⋈orders and
    orders⋈lineitem shuffle on their keys, the return-flag and date
    predicates reach PushedFilters, and the top-20 is a
    TakeOrderedAndProject — no global sort of the aggregated customers.
    Exact dyadic revenue sums (reference reaches arbitrary SELECT through
    DataFusion SqlToRel, planner.rs:622-650)."""
    _views(spark, sf_dir, "customer", "orders", "lineitem", "nation")
    return spark.sql(_Q10_SQL)


# --- TPC-H Q18 analogue: large-volume customers ---------------------------
_Q18_SQL = """
    SELECT c_custkey, o_orderkey, o_totalprice,
           CAST(sum(CAST(floor(l_quantity + 0.5) AS BIGINT)) AS BIGINT) AS total_qty
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    WHERE o_orderkey IN (
      SELECT l_orderkey FROM lineitem
      GROUP BY l_orderkey
      HAVING sum(CAST(floor(l_quantity + 0.5) AS BIGINT)) > 150
    )
    GROUP BY c_custkey, o_orderkey, o_totalprice
    ORDER BY o_totalprice DESC, o_orderkey
    LIMIT 20
    """


@register("q18_large_orders", oracle=_Q18_SQL)
def q18_large_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18 (large-volume customers): orders whose total quantity
    exceeds a threshold, via an IN subquery over a grouped HAVING — the
    aggregated-semi-join pattern.  Plan shape at scale: the subquery is
    one partial→final agg on l_orderkey; its (small) qualifying key set
    semi-joins the fact tables; all three order-keyed operations share
    the same shuffle key.  Integer quantity sums end-to-end."""
    _views(spark, sf_dir, "customer", "orders", "lineitem")
    return spark.sql(_Q18_SQL)


# --- Pareto / ABC analysis ------------------------------------------------
_PARETO_SQL = """
    WITH rev AS (
      SELECT o_custkey,
             sum(CAST(floor(o_totalprice * 100.0 + 0.5) AS BIGINT)) AS cents
      FROM orders GROUP BY o_custkey
    ), ranked AS (
      SELECT o_custkey, cents,
             sum(cents) OVER (ORDER BY cents DESC, o_custkey
                              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS running_cents,
             sum(cents) OVER () AS total_cents,
             row_number() OVER (ORDER BY cents DESC, o_custkey) AS rnk
      FROM rev
    )
    SELECT o_custkey, rnk,
           (CAST(floor((CAST(cents AS DOUBLE) / total_cents) * CAST(1000000 AS DOUBLE)
                 + CAST(0.5 AS DOUBLE)) AS DOUBLE) / CAST(1000000 AS DOUBLE)) AS share,
           (CAST(floor((CAST(running_cents AS DOUBLE) / total_cents) * CAST(1000000 AS DOUBLE)
                 + CAST(0.5 AS DOUBLE)) AS DOUBLE) / CAST(1000000 AS DOUBLE)) AS cum_share
    FROM ranked
    WHERE CAST(running_cents - cents AS DOUBLE) / total_cents < 0.8
    ORDER BY rnk
    """


@register("pareto_customers", oracle=_PARETO_SQL)
def pareto_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pareto / ABC analysis: the minimal prefix of customers covering 80%
    of total revenue (every customer whose cumulative share STARTS below
    the threshold — the standard 'A-class' cut).  Integer cent sums make
    the running total exact, so the prefix boundary cannot drift between
    engines.

    Scale path (r9, VERDICT r08 #5): the oracle's single global window
    (running sum + row_number over all customers) would put every
    customer in ONE task; the Spark side rides the two-pass rank
    (operators/rank2pass.py — range-repartition, per-partition prefix
    sums, metadata-sized offset pass), so the per-customer aggregate is
    never globally sorted in a single task.  Bit-identical output: the
    order is total (cents DESC, custkey) and the running cents are
    integers."""
    from incubator_horaedb_spark.operators.rank2pass import attach_global_order

    rev = (
        load(spark, sf_dir, "orders")
        .groupBy("o_custkey")
        .agg(
            F.sum(
                F.floor(F.col("o_totalprice") * F.lit(100.0) + F.lit(0.5)).cast("long")
            ).alias("cents")
        )
    )
    ranked, totals = attach_global_order(
        rev,
        [F.col("cents").desc(), F.col("o_custkey").asc()],
        rank_name="rnk",
        running_sums={"running_cents": "cents"},
    )
    total = int(totals["running_cents"])

    def _share(col: Column) -> Column:
        frac = col.cast("double") / F.lit(total)
        return (
            F.floor(frac * F.lit(1000000.0) + F.lit(0.5)).cast("double")
            / F.lit(1000000.0)
        )

    return (
        ranked.withColumn("share", _share(F.col("cents")))
        .withColumn("cum_share", _share(F.col("running_cents")))
        .filter(
            (F.col("running_cents") - F.col("cents")).cast("double") / F.lit(total)
            < F.lit(0.8)
        )
        .select("o_custkey", "rnk", "share", "cum_share")
        .orderBy("rnk")
    )


# --- UNPIVOT (wide -> long reshaping) -------------------------------------
_UNPIVOT_SQL = """
    WITH a AS (
      SELECT l_returnflag,
             CAST(sum(CAST(floor(l_quantity + 0.5) AS BIGINT)) AS BIGINT) AS qty,
             CAST(count(*) AS BIGINT) AS n_rows,
             CAST(sum(CAST(floor(l_extendedprice * 100.0 + 0.5) AS BIGINT)) AS BIGINT)
               AS price_cents
      FROM lineitem GROUP BY l_returnflag
    )
    SELECT l_returnflag, metric, val
    FROM a UNPIVOT (val FOR metric IN (qty, n_rows, price_cents))
    ORDER BY l_returnflag, metric
    """


@register("unpivot_metrics", oracle=_UNPIVOT_SQL)
def unpivot_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANSI UNPIVOT — the wide-to-long reshaping operator (the inverse of
    pivot_event_counts): per-flag integer aggregates unpivoted into
    (metric, value) rows.  The SAME SQL text runs on both engines (the
    `FROM t UNPIVOT (val FOR name IN (cols))` spelling parses in Spark 4
    and DuckDB alike).  Unpivot is a zero-shuffle projection (each input
    row expands to |cols| rows map-side); the only exchange is the
    upstream agg's."""
    _views(spark, sf_dir, "lineitem")
    return spark.sql(_UNPIVOT_SQL)


# --- market-basket co-occurrence ------------------------------------------
_BASKET_SQL = """
    WITH b AS (
      SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
    ),
    n AS (SELECT count(DISTINCT l_orderkey) AS n_orders FROM b),
    pc AS (SELECT l_partkey, count(*) AS n_p FROM b GROUP BY l_partkey),
    pairs AS (
      SELECT a.l_partkey AS part_a, c.l_partkey AS part_b, count(*) AS n_ab
      FROM b a JOIN b c
        ON c.l_orderkey = a.l_orderkey AND a.l_partkey < c.l_partkey
      GROUP BY a.l_partkey, c.l_partkey
    ),
    scored AS (
      SELECT p.part_a, p.part_b, p.n_ab,
             pa.n_p AS n_a, pb.n_p AS n_b,
             (CAST(floor(((CAST(p.n_ab AS DOUBLE) * CAST(n.n_orders AS DOUBLE))
               / (CAST(pa.n_p AS DOUBLE) * CAST(pb.n_p AS DOUBLE)))
               * CAST(1000000 AS DOUBLE) + CAST(0.5 AS DOUBLE)) AS DOUBLE)
              / CAST(1000000 AS DOUBLE)) AS lift
      FROM pairs p
      JOIN pc pa ON pa.l_partkey = p.part_a
      JOIN pc pb ON pb.l_partkey = p.part_b
      CROSS JOIN n
      WHERE p.n_ab >= 2
    )
    SELECT part_a, part_b, CAST(n_ab AS BIGINT) AS n_ab,
           CAST(n_a AS BIGINT) AS n_a, CAST(n_b AS BIGINT) AS n_b, lift,
           CAST(row_number() OVER (ORDER BY lift DESC, part_a, part_b) AS BIGINT)
               AS rnk
    FROM (SELECT * FROM scored ORDER BY lift DESC, part_a, part_b LIMIT 20) t
    ORDER BY rnk
    """


@register("market_basket_pairs", oracle=_BASKET_SQL)
def market_basket_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Market-basket co-occurrence with lift (Agrawal et al.'s
    association-rule support/lift statistics, SIGMOD 1993, public):
    which part pairs appear in the same order more often than
    independence predicts.  The recommender/assortment primitive every
    retail OLAP stack ships.

    Scale shape: baskets dedupe to DISTINCT (order, item); pair
    generation is an order-keyed SELF-JOIN whose blowup is bounded by
    the per-basket line count (TPC-H: <= 7 lines, so <= 21 pairs per
    order — never corpus-quadratic); item counts broadcast back; lift
    divides exact integers and the min-support filter (n_ab >= 2) keeps
    the scored set sparse.  Top-k is taken distributed (ORDER/LIMIT)
    before the 20-row ranking window."""
    _views(spark, sf_dir, "lineitem")
    return spark.sql(_BASKET_SQL)
