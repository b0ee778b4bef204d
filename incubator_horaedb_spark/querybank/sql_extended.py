"""Extended relational surface — subqueries, remaining join types, CUBE,
SQL window functions, exact percentiles, and the UDAF framework.

All of these are reachable in the reference through the DataFusion SQL
planner (src/query_frontend/src/planner.rs:622-650 plants arbitrary SELECT
into DataFusion's SqlToRel) even though its sqlness corpus never exercises
them; Spark SQL / Catalyst provides the same semantics (SURVEY §2.3, §2.4,
§2.5, §2.7).  The UDAF entry exercises our pandas GROUPED_AGG registry
(functions/registry.py), the Spark rendering of the reference's
accumulator-based UDAF framework (src/df_operator/src/udaf.rs:61,
src/df_operator/src/aggregate.rs).

Scale notes: every subquery here is either broadcastable (IN/EXISTS against
a dimension) or rewritten by Catalyst into a join; window functions shuffle
once on their partition key; percentile is a single-pass exact aggregate.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from incubator_horaedb_spark.functions.detfloat import (
    BITS_MONEY,
    BITS_SMALL,
    dyadic,
    r_out,
    r_out_sql,
)
from incubator_horaedb_spark.querybank.registry import load, register


def _views(spark: SparkSession, sf_dir: str, *tables: str) -> None:
    for t in tables:
        load(spark, sf_dir, t).createOrReplaceTempView(t)


# --- remaining join types (SURVEY §2.3) -----------------------------------
@register(
    "join_full_outer",
    oracle="""
    SELECT coalesce(c.c_mktsegment, '<no customer>') AS segment,
           count(o.o_orderkey) AS n_orders,
           CAST(sum(CASE WHEN o.o_orderkey IS NULL THEN 1 ELSE 0 END) AS BIGINT)
               AS n_customers_without_orders
    FROM customer c
    FULL OUTER JOIN orders o ON o.o_custkey = c.c_custkey
    GROUP BY coalesce(c.c_mktsegment, '<no customer>')
    """,
)
def join_full_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders")
    j = c.join(o, o.o_custkey == c.c_custkey, "full_outer")
    seg = F.coalesce(F.col("c_mktsegment"), F.lit("<no customer>")).alias("segment")
    return j.groupBy(seg).agg(
        F.count("o_orderkey").alias("n_orders"),
        F.sum(F.when(F.col("o_orderkey").isNull(), 1).otherwise(0)).alias(
            "n_customers_without_orders"
        ),
    )


@register(
    "join_cross_small",
    oracle="""
    SELECT r.r_name, n.n_name,
           CASE WHEN n.n_regionkey = r.r_regionkey THEN 1 ELSE 0 END AS same_region
    FROM region r CROSS JOIN nation n
    """,
)
def join_cross_small(spark: SparkSession, sf_dir: str) -> DataFrame:
    r = load(spark, sf_dir, "region")
    n = load(spark, sf_dir, "nation")
    return r.crossJoin(n).select(
        "r_name",
        "n_name",
        F.when(F.col("n_regionkey") == F.col("r_regionkey"), 1).otherwise(0).alias("same_region"),
    )


# --- subqueries (Catalyst rewrites to joins; IN-dim side broadcasts) ------
@register(
    "subquery_in",
    oracle="""
    SELECT o_orderstatus, count(*) AS n,
           (CAST(floor((sum(CAST(floor((o_totalprice * 65536) + 0.5) AS DOUBLE) / 65536)) * CAST(100 AS DOUBLE) + CAST(0.5 AS DOUBLE)) AS DOUBLE) / CAST(100 AS DOUBLE)) AS total
    FROM orders
    WHERE o_custkey IN (SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING')
    GROUP BY o_orderstatus
    """,
)
def subquery_in(spark: SparkSession, sf_dir: str) -> DataFrame:
    _views(spark, sf_dir, "orders", "customer")
    return spark.sql(
        """
        SELECT o_orderstatus, count(*) AS n,
               (CAST(floor((sum(CAST(floor((o_totalprice * 65536) + 0.5) AS DOUBLE) / 65536)) * CAST(100 AS DOUBLE) + CAST(0.5 AS DOUBLE)) AS DOUBLE) / CAST(100 AS DOUBLE)) AS total
        FROM orders
        WHERE o_custkey IN (SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING')
        GROUP BY o_orderstatus
        """
    )


@register(
    "subquery_exists_correlated",
    oracle="""
    SELECT n.n_name, count(*) AS n_customers
    FROM customer c JOIN nation n ON n.n_nationkey = c.c_nationkey
    WHERE EXISTS (SELECT 1 FROM orders o
                  WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 400000)
    GROUP BY n.n_name
    """,
)
def subquery_exists_correlated(spark: SparkSession, sf_dir: str) -> DataFrame:
    _views(spark, sf_dir, "customer", "nation", "orders")
    return spark.sql(
        """
        SELECT n.n_name, count(*) AS n_customers
        FROM customer c JOIN nation n ON n.n_nationkey = c.c_nationkey
        WHERE EXISTS (SELECT 1 FROM orders o
                      WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 400000)
        GROUP BY n.n_name
        """
    )


@register(
    "subquery_scalar_agg",
    oracle="""
    SELECT p_brand, count(*) AS n_above_avg
    FROM part
    WHERE p_retailprice > (SELECT avg(CAST(floor((p_retailprice * 65536) + 0.5) AS DOUBLE) / 65536) FROM part)
    GROUP BY p_brand
    """,
)
def subquery_scalar_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    _views(spark, sf_dir, "part")
    return spark.sql(
        """
        SELECT p_brand, count(*) AS n_above_avg
        FROM part
        WHERE p_retailprice > (SELECT avg(CAST(floor((p_retailprice * 65536) + 0.5) AS DOUBLE) / 65536) FROM part)
        GROUP BY p_brand
        """
    )


# --- SQL window functions (SURVEY §2.5: OVER-clauses, DataFusion-reachable)
@register(
    "window_lag_delta",
    oracle="""
    SELECT event_type,
           count(*) AS n_steps,
           (CAST(floor((sum(CAST(floor((delta * 1048576) + 0.5) AS DOUBLE) / 1048576)) * CAST(10000 AS DOUBLE) + CAST(0.5 AS DOUBLE)) AS DOUBLE) / CAST(10000 AS DOUBLE)) AS sum_delta
    FROM (
        SELECT event_type,
               value - lag(value) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS delta
        FROM events
    ) s
    WHERE delta IS NOT NULL
    GROUP BY event_type
    """,
)
def window_lag_delta(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    delta = (F.col("value") - F.lag("value").over(w)).alias("delta")
    return (
        ev.select("event_type", delta)
        .filter(F.col("delta").isNotNull())
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_steps"),
            r_out(F.sum(dyadic("delta", BITS_SMALL)), 4).alias("sum_delta"),
        )
    )


@register(
    "window_moving_avg",
    oracle="""
    SELECT user_id, event_id,
           (CAST(floor((avg(CAST(floor((value * 1048576) + 0.5) AS DOUBLE) / 1048576)
                 OVER (PARTITION BY user_id ORDER BY ts, event_id
                       ROWS BETWEEN 2 PRECEDING AND CURRENT ROW)) * CAST(1000000 AS DOUBLE) + CAST(0.5 AS DOUBLE)) AS DOUBLE) / CAST(1000000 AS DOUBLE)) AS mavg3
    FROM events
    WHERE user_id % 30 = 0
    """,
)
def window_moving_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events").filter(F.col("user_id") % 30 == 0)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id").rowsBetween(-2, 0)
    return ev.select(
        "user_id",
        "event_id",
        r_out(F.avg(dyadic("value", BITS_SMALL)).over(w), 6).alias("mavg3"),
    )


_ORDER_NULLS_SQL = """
    SELECT o_orderkey, o_comment_len
    FROM (
        SELECT o_orderkey,
               CASE WHEN o_orderkey % 7 = 0 THEN NULL
                    ELSE length(o_orderpriority) END AS o_comment_len
        FROM orders
    ) t
    ORDER BY o_comment_len ASC NULLS LAST, o_orderkey ASC
    LIMIT 40
    """


@register("order_nulls_explicit", oracle=_ORDER_NULLS_SQL)
def order_nulls_explicit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ORDER BY with EXPLICIT null placement — a cross-engine semantics
    trap worth pinning: Spark defaults to NULLS FIRST on ASC while DuckDB
    defaults to NULLS LAST, so any gated ordering over a nullable key MUST
    spell the placement out.  This query is the regression canary (same
    SQL text on both engines, explicit NULLS LAST)."""
    _views(spark, sf_dir, "orders")
    return spark.sql(_ORDER_NULLS_SQL)


_RANK_FAMILY_SQL = """
    SELECT user_id, event_id,
           rank() OVER w AS rnk,
           dense_rank() OVER w AS drnk,
           ntile(4) OVER w AS quartile,
           lead(event_id) OVER w AS next_event
    FROM events
    WHERE user_id % 50 = 0
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    """


@register("window_rank_family", oracle=_RANK_FAMILY_SQL)
def window_rank_family(spark: SparkSession, sf_dir: str) -> DataFrame:
    """rank / dense_rank / ntile / lead over a deterministic (ts, event_id)
    order — the ranking-function family (SURVEY §2.5), all-integer outputs.
    One user-keyed shuffle serves all four functions (same WINDOW)."""
    _views(spark, sf_dir, "events")
    return spark.sql(_RANK_FAMILY_SQL)


# --- CUBE (SURVEY §2.4 grouping sets family) ------------------------------
@register(
    "cube_agg",
    oracle="""
    SELECT o_orderstatus, o_orderpriority, count(*) AS n
    FROM orders
    GROUP BY CUBE (o_orderstatus, o_orderpriority)
    """,
)
def cube_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        load(spark, sf_dir, "orders")
        .cube("o_orderstatus", "o_orderpriority")
        .agg(F.count(F.lit(1)).alias("n"))
    )


# --- UNION DISTINCT (SURVEY §2.7) -----------------------------------------
@register(
    "set_union_distinct",
    oracle="""
    SELECT c_nationkey AS nationkey FROM customer
    UNION
    SELECT s_nationkey AS nationkey FROM supplier
    """,
)
def set_union_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("nationkey"))
    s = load(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("nationkey"))
    return c.union(s).distinct()


# --- exact percentile (single-pass aggregate; linear interpolation) -------
@register(
    "percentile_exact",
    oracle="""
    SELECT o_orderstatus,
           (CAST(floor((quantile_cont(o_totalprice, 0.5)) * CAST(10000 AS DOUBLE) + CAST(0.5 AS DOUBLE)) AS DOUBLE) / CAST(10000 AS DOUBLE)) AS p50,
           (CAST(floor((quantile_cont(o_totalprice, 0.95)) * CAST(10000 AS DOUBLE) + CAST(0.5 AS DOUBLE)) AS DOUBLE) / CAST(10000 AS DOUBLE)) AS p95
    FROM orders
    GROUP BY o_orderstatus
    """,
)
def percentile_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Spark `percentile` and DuckDB `quantile_cont` both use linear
    # interpolation on the sorted values — exact, no dyadic quantization
    # needed (no accumulation, just order statistics).
    return (
        load(spark, sf_dir, "orders")
        .groupBy("o_orderstatus")
        .agg(
            r_out(F.expr("percentile(o_totalprice, 0.5)"), 4).alias("p50"),
            r_out(F.expr("percentile(o_totalprice, 0.95)"), 4).alias("p95"),
        )
    )


# --- approximate percentile (DataFusion approx_percentile_cont family) ----
# Exact-by-construction gate (VERDICT r11 #3): the GK sketch's raw value
# can't hash-match DuckDB's t-digest, so the hash lane carries (a) the
# exact p95 (Spark `percentile` vs DuckDB `quantile_cont`, both linear
# interpolation — deterministic to the quantization used everywhere else)
# and (b) `within_5pct` — |approx − exact| ≤ 5%·exact, TRUE by the GK
# error bound (accuracy 10000 → ≤0.01% rank error, orders of magnitude
# inside the bound even under merge-order jitter).  A broken sketch flips
# the boolean and the hash.  The GK path stays what's actually exercised:
# mergeable partials, map-side combine, one small state per group across
# the shuffle instead of the raw values.
@register(
    "approx_percentile_price",
    oracle=f"""
    SELECT o_orderstatus,
           {r_out_sql('quantile_cont(o_totalprice, 0.95)', 4)} AS p95_exact,
           TRUE AS within_5pct
    FROM orders GROUP BY o_orderstatus
    """,
)
def approx_percentile_price(spark: SparkSession, sf_dir: str) -> DataFrame:
    exact = F.expr("percentile(o_totalprice, 0.95)")
    approx = F.expr("approx_percentile(o_totalprice, 0.95, 10000)")
    return (
        load(spark, sf_dir, "orders")
        .groupBy("o_orderstatus")
        .agg(
            r_out(exact, 4).alias("p95_exact"),
            (F.abs(approx - exact) <= F.lit(0.05) * exact).alias("within_5pct"),
        )
    )


# --- UDAF framework demo (pandas GROUPED_AGG ≙ reference udaf.rs) ---------
@register(
    "udaf_energy_by_type",
    oracle="""
    SELECT event_type,
           CAST(sum(CAST(sign(value) * floor(abs(value * 1024) + 0.5) AS BIGINT)
                    * CAST(sign(value) * floor(abs(value * 1024) + 0.5) AS BIGINT))
                AS BIGINT) AS energy_q
    FROM events
    GROUP BY event_type
    """,
)
def udaf_energy_by_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Custom aggregate (sum of squared quantized values) through the pandas
    GROUPED_AGG path — the Spark rendering of the reference's
    accumulator-based UDAF framework (src/df_operator/src/udaf.rs:61).
    Integer arithmetic end-to-end. Quantization is tie-proof
    half-away-from-zero via sign·floor(|x·1024|+0.5) — numpy's .round()
    is half-to-even while DuckDB's CAST(floor(() + 0.5) AS DOUBLE) is half-away, so a raw .5 tie
    would hash-mismatch; this floor form is bit-identical in both engines
    (same IEEE multiply/abs/add/floor sequence)."""
    from pyspark.sql.types import LongType

    @F.pandas_udf(LongType())
    def energy_q(v: pd.Series) -> int:
        x = (v * 1024.0).to_numpy(dtype="float64")
        q = (np.sign(x) * np.floor(np.abs(x) + 0.5)).astype("int64")
        return int((q * q).sum())

    return (
        load(spark, sf_dir, "events")
        .groupBy("event_type")
        .agg(energy_q(F.col("value")).alias("energy_q"))
    )


# --- distribution window functions (percent_rank / cume_dist) -------------
_DIST_WINDOW_SQL = """
    SELECT o_orderkey, o_orderstatus,
           (CAST(floor((percent_rank() OVER w) * CAST(1000000 AS DOUBLE)
                 + CAST(0.5 AS DOUBLE)) AS DOUBLE) / CAST(1000000 AS DOUBLE)) AS pct_rank,
           (CAST(floor((cume_dist() OVER w) * CAST(1000000 AS DOUBLE)
                 + CAST(0.5 AS DOUBLE)) AS DOUBLE) / CAST(1000000 AS DOUBLE)) AS cum_dist
    FROM orders
    WHERE o_orderkey % 17 = 0
    WINDOW w AS (PARTITION BY o_orderstatus ORDER BY o_totalprice, o_orderkey)
    """


@register("window_distribution_family", oracle=_DIST_WINDOW_SQL)
def window_distribution_family(spark: SparkSession, sf_dir: str) -> DataFrame:
    """percent_rank()/cume_dist() — the distribution window functions,
    completing the OVER-clause families (ranking, offset, frames, NTILE
    are covered by their own gated queries).  Both are rank-derived
    ratios of exact integers ((rank-1)/(n-1), rank_hi/n) computed from
    the same total order on both engines (unique o_orderkey tie-break),
    so the single division per row is the identical IEEE tree.  One
    window shuffle; the modulo thins the output, not the semantics."""
    _views(spark, sf_dir, "orders")
    return spark.sql(_DIST_WINDOW_SQL)


# --- value window family (first/last/nth) ---------------------------------
_VALUE_FAMILY_SQL = """
    SELECT user_id, event_id,
           first_value(event_id) OVER w AS first_ev,
           last_value(event_id)  OVER w AS last_ev,
           nth_value(event_id, 3) OVER w AS third_ev,
           lag(event_id, 2) OVER w2 AS lag2_ev
    FROM events
    WHERE user_id % 50 = 1
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING),
           w2 AS (PARTITION BY user_id ORDER BY ts, event_id)
    """


@register("window_value_family", oracle=_VALUE_FAMILY_SQL)
def window_value_family(spark: SparkSession, sf_dir: str) -> DataFrame:
    """first_value / last_value / nth_value / lag-with-offset — the value
    window family (SURVEY §2.5 completion next to window_rank_family).
    The frame is spelled out as the FULL partition: last_value over the
    default frame (UNBOUNDED PRECEDING..CURRENT ROW) is the classic
    running-last trap, and defaults could drift between engines — the
    explicit ROWS frame pins one semantics for both (lag gets its own
    unframed window: Spark rejects frames on offset functions).
    Deterministic (ts, event_id) order; one user-keyed shuffle serves
    all four (same partition + order → one sort)."""
    _views(spark, sf_dir, "events")
    return spark.sql(_VALUE_FAMILY_SQL)


# --- QUALIFY clause (window filtering, round 5) -----------------------------
_QUALIFY_SQL = """
    SELECT o_custkey, o_orderkey,
           (CAST(floor((o_totalprice) * CAST(100 AS DOUBLE) + CAST(0.5 AS DOUBLE))
                 AS DOUBLE) / CAST(100 AS DOUBLE)) AS price
    FROM orders
    QUALIFY row_number() OVER (PARTITION BY o_custkey
                               ORDER BY o_totalprice DESC, o_orderkey) <= 2
    """


@register("window_qualify_topn", oracle=_QUALIFY_SQL)
def window_qualify_topn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """QUALIFY clause support (DuckDB/BigQuery/Snowflake dialect — filter
    on window functions without a subquery).  Spark SQL has no QUALIFY,
    so the shim rewrites it textually into the standard nested-subquery
    form (frontends/sql_shim.py::rewrite_qualify); DuckDB runs the
    ORIGINAL statement natively as the oracle — the two paths agreeing is
    the semantics proof.  Plan: identical to window_rownum_top2 (one
    window shuffle + filter), so the rewrite adds nothing at scale."""
    from incubator_horaedb_spark.frontends.sql_shim import rewrite_qualify

    _views(spark, sf_dir, "orders")
    return spark.sql(rewrite_qualify(_QUALIFY_SQL))


# --- RFM customer segmentation (round 5) ------------------------------------
def _rfm_sql(engine: str) -> str:
    """RFM segmentation (recency / frequency / monetary quartiles — the
    classic mail-order marketing model, public since Hughes 1994): per
    customer, last order time, order count, and quantized spend; NTILE(4)
    over each metric with the customer key as tie-break (total order →
    identical quartile assignment on both engines); output is the 4×4×4
    cell census.  Spend addends are dyadic-quantized (2^-10) so the
    per-customer sums are exact in any aggregation order.  Shape: one
    orders-scan hash agg, three windows over |customers| rows sharing one
    sort each, a 64-row final agg."""
    ems = "unix_millis(o_orderdate)" if engine == "spark" else "epoch_ms(o_orderdate)"
    pq = "(CAST(floor((o_totalprice * 1024) + 0.5) AS DOUBLE) / 1024)"
    return f"""
    WITH a AS (
      SELECT o_custkey,
             max({ems}) AS last_t,
             count(*)   AS freq,
             sum({pq})  AS spend
      FROM orders GROUP BY o_custkey
    ),
    s AS (
      SELECT o_custkey,
             ntile(4) OVER (ORDER BY last_t, o_custkey) AS r_q,
             ntile(4) OVER (ORDER BY freq, o_custkey)   AS f_q,
             ntile(4) OVER (ORDER BY spend, o_custkey)  AS m_q
      FROM a
    )
    SELECT CAST(r_q * 100 + f_q * 10 + m_q AS BIGINT) AS rfm_cell,
           CAST(count(*) AS BIGINT) AS n_customers,
           CAST(min(o_custkey) AS BIGINT) AS sample_custkey
    FROM s GROUP BY r_q * 100 + f_q * 10 + m_q
    """


@register("rfm_segmentation", oracle=_rfm_sql("duckdb"))
def rfm_segmentation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RFM segmentation (see _rfm_sql) — Spark side on the multi-order
    two-pass rank (r10, VERDICT r09 wrong #2): the oracle's three
    NTILE(4) windows each need a total order over ALL customers, which
    Spark would execute as three single-task sorts.  All three global
    row_numbers now ride ONE pinned per-customer aggregate
    (attach_global_orders: one localCheckpoint, driver-computed range
    boundaries, one combined counts job, one final plan) instead of
    three sequential checkpoint+exchange rounds; NTILE buckets derive
    exactly from (rank, n) with SQL-standard remainder semantics.  The
    tie-broken total orders make the bucket assignment bit-identical to
    the window form."""
    from incubator_horaedb_spark.operators.rank2pass import (
        attach_global_orders,
        ntile_from_rank,
    )

    q = 1024.0
    a = (
        load(spark, sf_dir, "orders")
        .groupBy("o_custkey")
        .agg(
            F.max(F.unix_millis("o_orderdate")).alias("last_t"),
            F.count(F.lit(1)).alias("freq"),
            F.sum(
                F.floor(F.col("o_totalprice") * F.lit(q) + F.lit(0.5)).cast("double")
                / F.lit(q)
            ).alias("spend"),
        )
    )
    ranked, n = attach_global_orders(
        a,
        [
            ("__rr", "last_t", "o_custkey"),
            ("__rf", "freq", "o_custkey"),
            ("__rm", "spend", "o_custkey"),
        ],
    )
    s = ranked.select(
        "o_custkey",
        ntile_from_rank(F.col("__rr"), n, 4).alias("r_q"),
        ntile_from_rank(F.col("__rf"), n, 4).alias("f_q"),
        ntile_from_rank(F.col("__rm"), n, 4).alias("m_q"),
    )
    return s.groupBy(
        (F.col("r_q") * 100 + F.col("f_q") * 10 + F.col("m_q"))
        .cast("long")
        .alias("rfm_cell")
    ).agg(
        F.count(F.lit(1)).cast("long").alias("n_customers"),
        F.min("o_custkey").cast("long").alias("sample_custkey"),
    )


# --- LATERAL correlated subquery ------------------------------------------
_LATERAL_SQL = """
    SELECT c.c_custkey, o.o_orderkey,
           (CAST(floor((o.o_totalprice) * CAST(100 AS DOUBLE) + CAST(0.5 AS DOUBLE))
             AS DOUBLE) / CAST(100 AS DOUBLE)) AS totalprice
    FROM (SELECT c_custkey FROM customer WHERE c_custkey <= 50) c,
    LATERAL (
      SELECT o_orderkey, o_totalprice
      FROM orders
      WHERE o_custkey = c.c_custkey
      ORDER BY o_totalprice DESC, o_orderkey
      LIMIT 2
    ) o
    ORDER BY c.c_custkey, totalprice DESC, o.o_orderkey
    """


@register("lateral_topk_per_key", oracle=_LATERAL_SQL)
def lateral_topk_per_key(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated LATERAL subquery — the per-key top-k expressed as a
    dependent join instead of a window (the SQL:1999 surface DataFusion
    and Spark 4 both plan as DomainJoin/rewritten window).  The SAME SQL
    text runs on both engines.  Catalyst decorrelates the LATERAL into a
    ranked join, so at scale this is the window top-k plan, not N
    correlated executions; ORDER BY ties break on o_orderkey (total
    order)."""
    _views(spark, sf_dir, "customer", "orders")
    return spark.sql(_LATERAL_SQL)


# --- ordered-set aggregates (WITHIN GROUP) --------------------------------
_PDISC_SQL = """
    SELECT o_orderstatus,
           CAST(percentile_disc(0.25) WITHIN GROUP (ORDER BY o_totalprice) AS DOUBLE) AS p25,
           CAST(percentile_disc(0.50) WITHIN GROUP (ORDER BY o_totalprice) AS DOUBLE) AS p50,
           CAST(percentile_disc(0.75) WITHIN GROUP (ORDER BY o_totalprice) AS DOUBLE) AS p75
    FROM orders
    GROUP BY o_orderstatus
    ORDER BY o_orderstatus
    """


@register("percentile_disc_group", oracle=_PDISC_SQL)
def percentile_disc_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered-set aggregate `percentile_disc(...) WITHIN GROUP` — the
    discontinuous quantile that RETURNS AN ACTUAL ELEMENT (no
    interpolation), so it is deterministic across engines on raw
    doubles where percentile_cont's interpolation trees are not.  Same
    SQL text on both engines; one sort-based ordered-set agg per
    group."""
    _views(spark, sf_dir, "orders")
    return spark.sql(_PDISC_SQL)


# --- ordered string aggregation -------------------------------------------
def _stragg_sql(engine: str) -> str:
    """Ordered string aggregation (LISTAGG ... WITHIN GROUP / string_agg
    ORDER BY): nations per region, name-ordered — deterministic because
    the intra-group order is total.  One hash agg with sort-based
    aggregation buffers; output is |regions| rows."""
    if engine == "spark":
        agg = "listagg(n_name, ',') WITHIN GROUP (ORDER BY n_name)"
    else:
        agg = "string_agg(n_name, ',' ORDER BY n_name)"
    return f"""
    SELECT r.r_name, {agg} AS nations,
           CAST(count(*) AS BIGINT) AS n_nations
    FROM region r JOIN nation n ON n.n_regionkey = r.r_regionkey
    GROUP BY r.r_name
    ORDER BY r.r_name
    """


@register("string_agg_ordered", oracle=_stragg_sql("duckdb"))
def string_agg_ordered(spark: SparkSession, sf_dir: str) -> DataFrame:
    _views(spark, sf_dir, "region", "nation")
    return spark.sql(_stragg_sql("spark"))


string_agg_ordered.__doc__ = _stragg_sql.__doc__


# --- embedding norm audit --------------------------------------------------
def _norm_audit_sql(engine: str) -> str:
    """Embedding-norm quality audit per label: count, mean L2 norm, and
    outlier counts outside fixed norm bounds — collapsed (near-zero) or
    exploded norms flag bad encoder batches before they poison an index
    build (the vector-pipeline twin of column_profile).  Norms come from
    the same 2^-20-quantized dot products as every similarity operator
    (exact dyadic sums → identical sqrt inputs); per-norm addends are
    re-quantized before the mean."""
    if engine == "spark":
        dot = (
            "aggregate(zip_with(q, q, (x, y) -> CAST(x AS DOUBLE) * CAST(y AS DOUBLE)), "
            "CAST(0.0 AS DOUBLE), (acc, x) -> acc + x)"
        )
        quant = (
            "transform(embedding, v -> CAST(floor(CAST(v AS DOUBLE) * 1048576 + 0.5) "
            "AS DOUBLE) / 1048576)"
        )
    else:
        dot = (
            "list_reduce(list_prepend(CAST(0.0 AS DOUBLE), "
            "list_transform(range(1, len(q) + 1), i -> "
            "CAST(q[i] AS DOUBLE) * CAST(q[i] AS DOUBLE))), (acc, x) -> acc + x)"
        )
        quant = (
            "list_transform(embedding, v -> CAST(floor(CAST(v AS DOUBLE) * 1048576 + 0.5) "
            "AS DOUBLE) / 1048576)"
        )
    q20 = (
        lambda e: f"(CAST(floor(({e}) * CAST(1048576 AS DOUBLE)"
        f" + CAST(0.5 AS DOUBLE)) AS DOUBLE) / CAST(1048576 AS DOUBLE))"
    )
    r6 = (
        lambda e: f"(CAST(floor(({e}) * CAST(1000000 AS DOUBLE) + CAST(0.5 AS DOUBLE))"
        f" AS DOUBLE) / CAST(1000000 AS DOUBLE))"
    )
    return f"""
    WITH n AS (
      SELECT label, sqrt({dot}) AS nrm
      FROM (SELECT label, {quant} AS q FROM embeddings) s
    )
    SELECT label,
           CAST(count(*) AS BIGINT) AS n_vecs,
           {r6(f"sum({q20('nrm')}) / CAST(count(*) AS DOUBLE)")} AS mean_norm,
           CAST(sum(CASE WHEN nrm < 0.1 THEN 1 ELSE 0 END) AS BIGINT) AS n_collapsed,
           CAST(sum(CASE WHEN nrm > 10.0 THEN 1 ELSE 0 END) AS BIGINT) AS n_exploded
    FROM n
    GROUP BY label
    ORDER BY label
    """


@register("embedding_norm_audit", oracle=_norm_audit_sql("duckdb"))
def embedding_norm_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    load(spark, sf_dir, "embeddings").createOrReplaceTempView("embeddings")
    return spark.sql(_norm_audit_sql("spark"))


embedding_norm_audit.__doc__ = _norm_audit_sql.__doc__


# --- NOT IN three-valued-logic semantics ----------------------------------
_NOT_IN_NULL_SQL = """
    SELECT
      (SELECT count(*) FROM supplier
       WHERE s_nationkey NOT IN (
         SELECT CASE WHEN c_acctbal < 500 THEN NULL ELSE c_nationkey END
         FROM customer)) AS n_with_nulls,
      (SELECT count(*) FROM supplier
       WHERE s_nationkey NOT IN (
         SELECT c_nationkey FROM customer WHERE c_acctbal >= 9000))
        AS n_without_nulls,
      (SELECT count(*) FROM supplier) AS n_suppliers
    """


@register("subquery_not_in_null_semantics", oracle=_NOT_IN_NULL_SQL)
def subquery_not_in_null_semantics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANSI NOT IN three-valued logic — the classic correctness trap: a
    NULL anywhere in the IN-list makes `x NOT IN (...)` never TRUE
    (FALSE or UNKNOWN), so the first count is 0 BY SEMANTICS while the
    null-filtered variant counts normally.  Both engines must agree on
    the null-aware anti-join rewrite (Spark plans
    NullAwareAntiJoin/BroadcastNestedLoop for exactly this).  Same SQL
    text on both engines; the counts pin the behavior."""
    _views(spark, sf_dir, "supplier", "customer")
    return spark.sql(_NOT_IN_NULL_SQL)
