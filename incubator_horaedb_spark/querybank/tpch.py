"""TPC-H completion: the 16 decision-support shapes not yet in the bank.

With q1/q3/q5/q6/q10/q18 (core_sql.py / olap_ext.py) these complete all 22
TPC-H query SHAPES, adapted to the driver testdata schema (no partsupp /
l_shipmode / l_commitdate / c_phone columns — each adaptation keeps the
plan shape that makes the original query a benchmark: the correlated
subquery, the anti-join, the disjunctive pushdown, ...).  The reference
reaches arbitrary decision-support SQL through DataFusion's SqlToRel
(src/query_frontend/src/planner.rs:622-650), so this whole family is
declared query surface.

Cross-engine determinism (functions/detfloat.py): money is quantized to
INTEGER cents map-side (one IEEE multiply + floor, bit-identical on both
engines), so every aggregate is an exact int64 sum in any reduction
order; ratios divide the exact integer sums once at the end and round
with the tie-proof floor form.  Thresholds compare integers cross-
multiplied (a/n > s/m  ⇔  a*m > s*n) — no FP at any decision point.

Scale notes per query are in the docstrings; the common facts: every
dimension join (region/nation/supplier/part at TPC-H's dim/fact ratios)
broadcasts under AQE, every fact-fact join and grouped subquery shuffles
on the order/part key it is later consumed on (shared shuffle keys), and
all date/brand/size predicates are scan-level PushedFilters.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from incubator_horaedb_spark.querybank.registry import load, register

# Map-side integer-cent quantizations (exact: one multiply + floor).
_CENTS = "CAST(floor(l_extendedprice * (1 - l_discount) * 100.0 + 0.5) AS BIGINT)"
_PCENTS = "CAST(floor(l_extendedprice * 100.0 + 0.5) AS BIGINT)"
_QTY = "CAST(l_quantity AS BIGINT)"  # quantities are integral in the testdata


def _r6(expr: str) -> str:
    """Tie-proof 6-digit rounding, identical text on both engines."""
    return (
        f"(CAST(floor(({expr}) * CAST(1000000 AS DOUBLE) + CAST(0.5 AS DOUBLE)) AS DOUBLE)"
        " / CAST(1000000 AS DOUBLE))"
    )


def _views(spark: SparkSession, sf_dir: str, *tables: str) -> None:
    for t in tables:
        load(spark, sf_dir, t).createOrReplaceTempView(t)


def _q(name: str, sql: str, tables: tuple[str, ...], doc: str):
    """Register a same-text Spark/DuckDB query pair."""

    def fn(spark: SparkSession, sf_dir: str) -> DataFrame:
        _views(spark, sf_dir, *tables)
        return spark.sql(sql)

    fn.__name__ = name
    fn.__doc__ = doc
    register(name, oracle=sql)(fn)
    return fn


# --- Q2: minimum-cost supplier (correlated MIN subquery) ------------------
_Q2_SQL = f"""
    WITH ps AS (
      SELECT l_partkey, l_suppkey, min({_PCENTS}) AS cost_cents
      FROM lineitem GROUP BY l_partkey, l_suppkey
    )
    SELECT s_acctbal, s_name, n_name, p_partkey, p_type, cost_cents
    FROM part
    JOIN ps ON p_partkey = l_partkey
    JOIN supplier ON s_suppkey = l_suppkey
    JOIN nation ON s_nationkey = n_nationkey
    JOIN region ON n_regionkey = r_regionkey
    WHERE r_name = 'EUROPE' AND p_size <= 5
      AND cost_cents = (
        SELECT min(ps2.cost_cents) FROM ps ps2
        JOIN supplier s2 ON s2.s_suppkey = ps2.l_suppkey
        JOIN nation n2 ON s2.s_nationkey = n2.n_nationkey
        JOIN region r2 ON n2.n_regionkey = r2.r_regionkey
        WHERE ps2.l_partkey = p_partkey AND r2.r_name = 'EUROPE')
    ORDER BY s_acctbal DESC, n_name, s_name, p_partkey
    LIMIT 100
    """

_q(
    "q2_min_cost_supplier",
    _Q2_SQL,
    ("part", "lineitem", "supplier", "nation", "region"),
    """TPC-H Q2 (minimum-cost supplier): the correlated-MIN-subquery
    benchmark, adapted — the partsupp supply cost becomes the minimum
    observed sale price per (part, supplier) pair from lineitem.  Plan
    shape at scale: Catalyst decorrelates the scalar subquery into a
    per-part min aggregate joined back on p_partkey, so the ps CTE's
    (part, supp) shuffle is reused; supplier/nation/region broadcast;
    the top-100 is TakeOrderedAndProject.  Costs are exact integer
    cents, so the MIN equality never ties differently across engines.""",
)

# --- Q4: order priority checking (EXISTS semi-join) -----------------------
_Q4_SQL = """
    SELECT o_orderpriority, count(*) AS order_count
    FROM orders
    WHERE o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
      AND o_orderdate < TIMESTAMP '1997-04-01 00:00:00'
      AND EXISTS (SELECT 1 FROM lineitem
                  WHERE l_orderkey = o_orderkey
                    AND l_shipdate > o_orderdate + INTERVAL 30 DAY)
    GROUP BY o_orderpriority
    ORDER BY o_orderpriority
    """

_q(
    "q4_order_priority",
    _Q4_SQL,
    ("orders", "lineitem"),
    """TPC-H Q4 (order priority checking): correlated EXISTS compiled to a
    LEFT SEMI join on the order key (commitdate<receiptdate becomes
    "shipped >30 days after ordering" — same late-line semantics over
    the available columns).  The quarter predicate prunes order row
    groups; the semi join shuffles both sides on o_orderkey once; the
    5-row priority agg is partial→final.""",
)

# --- Q7: volume shipping (bi-national flows) ------------------------------
_Q7_SQL = f"""
    SELECT supp_nation, cust_nation, l_year, CAST(sum(cents) AS BIGINT) AS revenue_cents
    FROM (
      SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
             year(l_shipdate) AS l_year, {_CENTS} AS cents
      FROM supplier
      JOIN lineitem ON s_suppkey = l_suppkey
      JOIN orders ON o_orderkey = l_orderkey
      JOIN customer ON c_custkey = o_custkey
      JOIN nation n1 ON s_nationkey = n1.n_nationkey
      JOIN nation n2 ON c_nationkey = n2.n_nationkey
      WHERE ((n1.n_name = 'NATION_3' AND n2.n_name = 'NATION_8')
          OR (n1.n_name = 'NATION_8' AND n2.n_name = 'NATION_3'))
        AND l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
        AND l_shipdate < TIMESTAMP '1998-01-01 00:00:00'
    ) shipping
    GROUP BY supp_nation, cust_nation, l_year
    ORDER BY supp_nation, cust_nation, l_year
    """

_q(
    "q7_volume_shipping",
    _Q7_SQL,
    ("supplier", "lineitem", "orders", "customer", "nation"),
    """TPC-H Q7 (volume shipping): trade volume between two nations by
    year — the same dimension (nation) joined twice under different
    aliases with a cross-pair OR predicate.  Both nation joins and
    supplier broadcast; orders⋈lineitem is the single fact shuffle; the
    ship-date range is a PushedFilter.  Exact integer-cent sums.""",
)

# --- Q8: national market share (conditional-ratio by year) ----------------
_Q8_SQL = f"""
    SELECT o_year,
           {_r6(
               "CASE WHEN sum(cents) = 0 THEN NULL ELSE "
               "CAST(sum(nation_cents) AS DOUBLE) / CAST(sum(cents) AS DOUBLE) END"
           )} AS mkt_share
    FROM (
      SELECT year(o_orderdate) AS o_year, {_CENTS} AS cents,
             CASE WHEN n2.n_name = 'NATION_3' THEN {_CENTS} ELSE 0 END AS nation_cents
      FROM lineitem
      JOIN part ON p_partkey = l_partkey
      JOIN orders ON o_orderkey = l_orderkey
      JOIN customer ON c_custkey = o_custkey
      JOIN nation n1 ON c_nationkey = n1.n_nationkey
      JOIN region ON n1.n_regionkey = r_regionkey
      JOIN supplier ON l_suppkey = s_suppkey
      JOIN nation n2 ON s_nationkey = n2.n_nationkey
      WHERE r_name = 'EUROPE' AND p_type = 'PROMO'
    ) volumes
    GROUP BY o_year
    ORDER BY o_year
    """

_q(
    "q8_market_share",
    _Q8_SQL,
    ("lineitem", "part", "orders", "customer", "nation", "region", "supplier"),
    """TPC-H Q8 (national market share): one nation's share of a region's
    PROMO-part market per year — the conditional-sum-ratio pattern
    (sum(CASE)/sum, both over the same rows, ONE scan + ONE agg).  All
    five dimensions broadcast; orders⋈lineitem is the only shuffle.
    Integer-cent numerator and denominator; one double division per
    year rounded tie-proof.""",
)

# --- Q9: product-type profit (LIKE filter + two-sided money math) ---------
_Q9_SQL = f"""
    SELECT n_name AS nation, o_year, CAST(sum(profit_cents) AS BIGINT) AS profit_cents
    FROM (
      SELECT n_name, year(o_orderdate) AS o_year,
             {_CENTS}
               - CAST(floor(p_retailprice * 10.0 + 0.5) AS BIGINT) * {_QTY} AS profit_cents
      FROM lineitem
      JOIN part ON p_partkey = l_partkey
      JOIN supplier ON s_suppkey = l_suppkey
      JOIN orders ON o_orderkey = l_orderkey
      JOIN nation ON s_nationkey = n_nationkey
      WHERE p_name LIKE '%red%'
    ) profit
    GROUP BY n_name, o_year
    ORDER BY nation, o_year DESC
    """

_q(
    "q9_product_profit",
    _Q9_SQL,
    ("lineitem", "part", "supplier", "orders", "nation"),
    """TPC-H Q9 (product-type profit): profit per supplier nation per
    year over name-matched parts; the missing ps_supplycost becomes a
    10%-of-retail unit cost (integer deci-cents × integer quantity —
    exact).  The '%red%' LIKE cannot prune row groups (no prefix), but
    part broadcasts after the filter; the revenue side is the usual
    single orders⋈lineitem shuffle.""",
)

# --- Q11: important stock identification (HAVING vs global total) ---------
_Q11_SQL = f"""
    WITH val AS (
      SELECT l_partkey, CAST(sum({_PCENTS}) AS BIGINT) AS part_cents
      FROM lineitem
      JOIN supplier ON s_suppkey = l_suppkey
      JOIN nation ON s_nationkey = n_nationkey
      WHERE n_name IN ('NATION_2', 'NATION_7')
      GROUP BY l_partkey
    )
    SELECT l_partkey, part_cents
    FROM val
    WHERE part_cents * (SELECT count(*) FROM val)
          > (SELECT CAST(sum(part_cents) AS BIGINT) FROM val) * 2
    ORDER BY part_cents DESC, l_partkey
    """

_q(
    "q11_important_stock",
    _Q11_SQL,
    ("lineitem", "supplier", "nation"),
    """TPC-H Q11 (important stock): parts whose value share exceeds a
    global-total threshold — the grouped-agg-vs-scalar-subquery-total
    pattern.  The spec's fixed fraction (0.0001/SF) is made scale-free:
    keep parts above 2× the MEAN part share (share > 2/n ⇔
    cents·n > total·2, integers cross-multiplied — no FP decision).
    Both branches reuse the SAME grouped CTE (Spark plans the scalar
    aggregates as a 1-row broadcast); one (part) shuffle total.""",
)

# --- Q12: shipping modes / priority classes (conditional counts) ----------
_Q12_SQL = """
    SELECT l_linestatus,
           CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
           CAST(sum(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
    FROM orders
    JOIN lineitem ON o_orderkey = l_orderkey
    WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
      AND l_shipdate < TIMESTAMP '1998-01-01 00:00:00'
    GROUP BY l_linestatus
    ORDER BY l_linestatus
    """

_q(
    "q12_priority_lines",
    _Q12_SQL,
    ("orders", "lineitem"),
    """TPC-H Q12 (shipping modes and order priority): conditional CASE
    counts bucketed by line status (the schema's stand-in for
    l_shipmode).  One order-keyed join, integer counters, the year
    predicate prunes lineitem row groups.""",
)

# --- Q13: customer order-count distribution (outer join + count-of-counts)
_Q13_SQL = """
    SELECT c_count, count(*) AS custdist
    FROM (
      SELECT c_custkey, count(o_orderkey) AS c_count
      FROM customer
      LEFT JOIN orders ON c_custkey = o_custkey AND o_orderpriority <> '5-LOW'
      GROUP BY c_custkey
    ) c_orders
    GROUP BY c_count
    ORDER BY custdist DESC, c_count DESC
    """

_q(
    "q13_customer_distribution",
    _Q13_SQL,
    ("customer", "orders"),
    """TPC-H Q13 (customer distribution): LEFT OUTER join with the filter
    INSIDE the join condition (so zero-order customers survive with
    count 0), then a count-of-counts distribution — two aggs where the
    second's input is one row per customer.  The customer-keyed shuffle
    is shared by the join and the first agg; the distribution agg moves
    only (c_count) pairs.""",
)

# --- Q14: promotion effect (conditional ratio, single month) --------------
_Q14_SQL = f"""
    SELECT {_r6(
        "CASE WHEN sum(cents) = 0 THEN NULL ELSE "
        "100.0 * CAST(sum(CASE WHEN p_type = 'PROMO' THEN cents ELSE 0 END) AS DOUBLE)"
        " / CAST(sum(cents) AS DOUBLE) END"
    )} AS promo_revenue
    FROM (
      SELECT p_type, {_CENTS} AS cents
      FROM lineitem JOIN part ON p_partkey = l_partkey
      WHERE l_shipdate >= TIMESTAMP '1997-06-01 00:00:00'
        AND l_shipdate < TIMESTAMP '1997-07-01 00:00:00'
    ) t
    """

_q(
    "q14_promo_revenue",
    _Q14_SQL,
    ("lineitem", "part"),
    """TPC-H Q14 (promotion effect): percentage of one month's revenue
    from PROMO parts — conditional-sum ratio to a single row.  The
    month predicate prunes the fact scan; part broadcasts; exact
    integer cents under the one final division.""",
)

# --- Q15: top supplier (scalar MAX subquery over a grouped view) ----------
_Q15_SQL = f"""
    WITH revenue AS (
      SELECT l_suppkey AS supplier_no, CAST(sum({_CENTS}) AS BIGINT) AS total_cents
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
        AND l_shipdate < TIMESTAMP '1997-04-01 00:00:00'
      GROUP BY l_suppkey
    )
    SELECT s_suppkey, s_name, total_cents
    FROM supplier JOIN revenue ON s_suppkey = supplier_no
    WHERE total_cents = (SELECT max(total_cents) FROM revenue)
    ORDER BY s_suppkey
    """

_q(
    "q15_top_supplier",
    _Q15_SQL,
    ("supplier", "lineitem"),
    """TPC-H Q15 (top supplier): the CREATE VIEW + scalar MAX pattern as
    a CTE consumed twice — once joined to supplier, once reduced to its
    max.  Exact integer revenue means the = max() predicate keeps ALL
    tied suppliers identically on both engines (the spec's known tie
    subtlety).  One supplier-keyed agg; supplier broadcasts.""",
)

# --- Q16: supplier counts by part attributes (NOT IN + count distinct) ----
_Q16_SQL = """
    SELECT p_brand, p_type, p_size, count(DISTINCT l_suppkey) AS supplier_cnt
    FROM lineitem JOIN part ON p_partkey = l_partkey
    WHERE p_brand <> 'Brand#1'
      AND p_size IN (1, 4, 7, 10, 13, 16, 19, 22)
      AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
    GROUP BY p_brand, p_type, p_size
    ORDER BY supplier_cnt DESC, p_brand, p_type, p_size
    """

_q(
    "q16_supplier_counts",
    _Q16_SQL,
    ("lineitem", "part", "supplier"),
    """TPC-H Q16 (parts/supplier relationship): COUNT(DISTINCT) per part
    attribute triple with a NOT IN exclusion subquery (complaint
    suppliers become negative-balance suppliers).  The NOT IN compiles
    to a broadcast null-aware anti join (s_suppkey is non-null, so no
    null-semantics cliff); the distinct agg expands then reduces on the
    (brand, type, size) grouping — two-phase distinct, one shuffle.""",
)

# --- Q17: small-quantity-order revenue (correlated average threshold) -----
_Q17_SQL = f"""
    SELECT {_r6(f"CAST(sum({_PCENTS}) AS DOUBLE) / 700.0")} AS avg_yearly,
           count(*) AS n_lines
    FROM lineitem l1 JOIN part ON p_partkey = l1.l_partkey
    WHERE p_brand = 'Brand#3'
      AND CAST(l1.l_quantity AS BIGINT) * 5
            * (SELECT count(*) FROM lineitem l2 WHERE l2.l_partkey = l1.l_partkey)
          < (SELECT CAST(sum(CAST(l3.l_quantity AS BIGINT)) AS BIGINT)
             FROM lineitem l3 WHERE l3.l_partkey = l1.l_partkey)
    """

_q(
    "q17_small_quantity",
    _Q17_SQL,
    ("lineitem", "part"),
    """TPC-H Q17 (small-quantity-order revenue): the correlated-average
    benchmark.  qty < 0.2·avg(qty) is algebraically cross-multiplied to
    5·qty·count < sum — two correlated scalar subqueries that Catalyst
    decorrelates into ONE per-part (count, sum) aggregate joined back
    on l_partkey, with zero FP at the decision point (quantities are
    integral).  Brand filter broadcasts part; the per-part aggregate
    shares the fact's l_partkey shuffle.""",
)

# --- Q19: discounted revenue (disjunction of conjunctions) ----------------
_Q19_SQL = f"""
    SELECT CAST(sum({_CENTS}) AS BIGINT) AS revenue_cents, count(*) AS n_lines
    FROM lineitem JOIN part ON p_partkey = l_partkey
    WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 5
           AND l_quantity >= 1 AND l_quantity <= 11 AND p_type IN ('SMALL', 'MEDIUM'))
       OR (p_brand = 'Brand#2' AND p_size BETWEEN 1 AND 10
           AND l_quantity >= 10 AND l_quantity <= 20 AND p_type IN ('MEDIUM', 'LARGE'))
       OR (p_brand = 'Brand#3' AND p_size BETWEEN 1 AND 15
           AND l_quantity >= 20 AND l_quantity <= 30 AND p_type IN ('STANDARD', 'PROMO', 'ECONOMY'))
    """

_q(
    "q19_discounted_revenue",
    _Q19_SQL,
    ("lineitem", "part"),
    """TPC-H Q19 (discounted revenue): the OR-of-ANDs predicate that
    stress-tests disjunctive pushdown.  Catalyst extracts the common
    single-side conjuncts: the quantity disjunction (1..30 overall)
    pushes to the lineitem scan and the brand/size/type disjunction
    prunes part BEFORE the join, leaving only the cross-table residual
    on the joined rows.  Single broadcast join, 1-row exact-cents
    aggregate.""",
)

# --- Q20: potential part promotion (nested IN with grouped HAVING) --------
_Q20_SQL = """
    SELECT s_suppkey, s_name
    FROM supplier JOIN nation ON s_nationkey = n_nationkey
    WHERE n_name IN ('NATION_1', 'NATION_6', 'NATION_11', 'NATION_16', 'NATION_21')
      AND s_suppkey IN (
        SELECT l_suppkey FROM lineitem JOIN part ON p_partkey = l_partkey
        WHERE p_name LIKE 'red%'
          AND l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
          AND l_shipdate < TIMESTAMP '1998-01-01 00:00:00'
        GROUP BY l_suppkey, l_partkey
        HAVING sum(CAST(l_quantity AS BIGINT)) > 50
      )
    ORDER BY s_suppkey
    """

_q(
    "q20_part_promotion",
    _Q20_SQL,
    ("supplier", "nation", "lineitem", "part"),
    """TPC-H Q20 (potential part promotion): nested IN whose inner query
    is itself a grouped HAVING over a name-prefix-filtered join (the
    partsupp availability threshold becomes a volume threshold from
    lineitem).  The prefix LIKE 'red%' IS sargable (string range); the
    inner agg groups on (supp, part) and its distinct supplier set
    semi-joins a broadcast-sized supplier×nation side.  Integer
    quantity sums.""",
)

# --- Q21: suppliers kept waiting (EXISTS + NOT EXISTS anti) ---------------
_Q21_SQL = """
    SELECT s_name, count(*) AS numwait
    FROM supplier
    JOIN lineitem l1 ON s_suppkey = l1.l_suppkey
    JOIN orders ON o_orderkey = l1.l_orderkey
    WHERE o_orderstatus = 'F'
      AND l1.l_shipdate > o_orderdate + INTERVAL 80 DAY
      AND EXISTS (SELECT 1 FROM lineitem l2
                  WHERE l2.l_orderkey = l1.l_orderkey
                    AND l2.l_suppkey <> l1.l_suppkey)
      AND NOT EXISTS (SELECT 1 FROM lineitem l3
                      WHERE l3.l_orderkey = l1.l_orderkey
                        AND l3.l_suppkey <> l1.l_suppkey
                        AND l3.l_shipdate > o_orderdate + INTERVAL 80 DAY)
    GROUP BY s_name
    ORDER BY numwait DESC, s_name
    LIMIT 20
    """

_q(
    "q21_waiting_suppliers",
    _Q21_SQL,
    ("supplier", "lineitem", "orders"),
    """TPC-H Q21 (suppliers who kept orders waiting): the hardest
    subquery shape — a semi join (another supplier participated) AND an
    anti join (no OTHER supplier was also late) on the same fact,
    correlated on both l1 and the outer o_orderdate ("late" = shipped
    >80 days after ordering, the schema's receipt/commit stand-in).
    All three lineitem sides share the l_orderkey shuffle key; supplier
    broadcasts; top-20 is TakeOrderedAndProject.""",
)

# --- Q22: global sales opportunity (anti join + uncorrelated avg) ---------
_Q22_SQL = """
    SELECT cntrycode, count(*) AS numcust, CAST(sum(bal_cents) AS BIGINT) AS total_cents
    FROM (
      SELECT substring(c_name, 18, 1) AS cntrycode,
             CAST(floor(c_acctbal * 100.0 + 0.5) AS BIGINT) AS bal_cents, c_custkey
      FROM customer
      WHERE substring(c_name, 18, 1) IN ('1', '3', '5', '7', '9')
    ) c
    WHERE bal_cents * (SELECT count(*) FROM customer
                       WHERE c_acctbal > 0.0
                         AND substring(c_name, 18, 1) IN ('1', '3', '5', '7', '9'))
          > (SELECT CAST(sum(CAST(floor(c_acctbal * 100.0 + 0.5) AS BIGINT)) AS BIGINT)
             FROM customer
             WHERE c_acctbal > 0.0
               AND substring(c_name, 18, 1) IN ('1', '3', '5', '7', '9'))
      AND NOT EXISTS (SELECT 1 FROM orders
                      WHERE o_custkey = c_custkey
                        AND o_orderdate >= TIMESTAMP '1999-01-01 00:00:00')
    GROUP BY cntrycode
    ORDER BY cntrycode
    """

_q(
    "q22_global_sales",
    _Q22_SQL,
    ("customer", "orders"),
    """TPC-H Q22 (global sales opportunity): above-average-balance
    customers with no RECENT orders (the phone country code becomes the
    customer id's last digit; "never ordered" becomes "lapsed since
    1999" — the testdata has no order-less customers).  The balance
    threshold is the uncorrelated-avg pattern with the comparison
    cross-multiplied to integers (bal·n > sum ⇔ bal > avg); the two
    scalar subqueries broadcast as 1-row plans; the NOT EXISTS is an
    anti join on c_custkey against the date-pruned orders scan.""",
)
