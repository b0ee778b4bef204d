"""Two-pass distributed global ranking (VERDICT r08 next-round #5).

Spark executes an UNPARTITIONED ``OVER (ORDER BY ...)`` window by moving
every row into one task (``WindowExec: No Partition Defined``) — fine for
a 64-row census, a scale-killer when the entity set (customers, users)
grows with the data.  This module gives the classic two-pass rewrite for
the row_number / running-sum / NTILE family over a TOTAL order:

1. ``repartitionByRange`` on the order key (sampled, non-overlapping,
   pid-ordered ranges), pinned with ``localCheckpoint`` so the sampled
   boundaries cannot differ between the two passes;
2. per-partition local rank / local prefix sums (one window PARTITIONED
   by ``spark_partition_id()`` — every partition sorts in parallel);
3. per-partition totals collected to the driver (METADATA-sized: one row
   per partition), turned into exclusive prefix offsets, and broadcast
   back; global value = offset + local value.

The result is bit-identical to the single-task window for any total
order key (ranges are disjoint and ordered, so every row's global rank
is its local rank plus the count of rows in lower ranges — independent
of where the sampled boundaries fell).  Running sums are exact when the
summand is integral or dyadic-quantized (the bank's convention).

The reference delegates window functions wholesale to DataFusion
(df_operator; SURVEY §2.5) — this is the Spark-side scale path for the
global-order subset, used by the entity-ranking queries
(pareto_customers, rfm_segmentation, user_activity_percentiles).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def attach_global_order(
    df: DataFrame,
    order_cols: list[Column],
    *,
    rank_name: str = "rnk",
    running_sums: dict[str, str] | None = None,
    num_partitions: int | None = None,
) -> tuple[DataFrame, dict]:
    """Attach a global ``row_number`` (``rank_name``) and optional global
    running sums (``running_sums``: out-name → input column, UNBOUNDED
    PRECEDING..CURRENT ROW semantics) over the total order ``order_cols``.

    Returns ``(df, totals)`` where ``totals`` carries the driver-side
    grand totals: ``totals['n']`` (row count) and ``totals[name]`` for
    each running sum — callers usually need them (NTILE bucket math,
    share-of-total) and they are free byproducts of the offset pass.

    ``order_cols`` MUST be a total order (tie-broken) — that is what the
    single-task window needs for determinism too, so every caller in the
    bank already has one.
    """
    spark = df.sparkSession
    running_sums = running_sums or {}
    nparts = num_partitions or spark.sparkContext.defaultParallelism
    base = (
        df.repartitionByRange(nparts, *order_cols)
        .withColumn("__pid", F.spark_partition_id())
        # pin the SAMPLED range boundaries: without this, the offsets
        # job and the final job could recompute the exchange with
        # different samples and disagree on partition membership
        .localCheckpoint(eager=True)
    )
    worder = Window.partitionBy("__pid").orderBy(*order_cols)
    wrun = worder.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    out = base.withColumn("__lrn", F.row_number().over(worder))
    aggs = [F.count(F.lit(1)).alias("__n")]
    for name, src in running_sums.items():
        out = out.withColumn(f"__lrs_{name}", F.sum(src).over(wrun))
        aggs.append(F.sum(src).alias(f"__t_{name}"))
    # one row per partition — metadata-sized by construction
    part_rows = sorted(
        base.groupBy("__pid").agg(*aggs).collect(), key=lambda r: r["__pid"]
    )
    # offset column types follow the local-prefix columns (sum(long) →
    # bigint, sum(double) → double) so offset + local never changes type
    dtypes = dict(out.dtypes)
    sum_types = {n: dtypes[f"__lrs_{n}"] for n in running_sums}
    offsets, run_n = [], 0
    run_sums: dict = {
        n: (0.0 if t == "double" else 0) for n, t in sum_types.items()
    }
    totals: dict = {}
    for r in part_rows:
        offsets.append((r["__pid"], run_n, *[run_sums[n] for n in running_sums]))
        run_n += r["__n"]
        for n in running_sums:
            run_sums[n] += r[f"__t_{n}"]
    totals["n"] = run_n
    totals.update(run_sums)

    # Per-partition offsets attached as a LITERAL map lookup rendered in
    # one SQL string (r12 §10) instead of createDataFrame(offsets) + a
    # broadcast join: the offsets are driver-held metadata (one entry per
    # partition), and the createDataFrame path alone cost ~0.5 s of
    # driver work per call (schema parse + Python→JVM row conversion —
    # the same tax the §2 partition-id memo removed).  Every pid present
    # in the data has an entry (offsets are derived from the per-pid
    # counts of the same pinned input), so the map lookup is total —
    # identical semantics to the inner join it replaces.
    def _val_sql(v, t: str) -> str:
        return f"CAST('{v!r}' AS DOUBLE)" if t == "double" else f"CAST({v} AS BIGINT)"

    def _map_sql(col_idx: int, t: str) -> str:
        if not offsets:
            return "map()"
        items = ", ".join(
            f"{row[0]}, {_val_sql(row[col_idx], t)}" for row in offsets
        )
        return f"map({items})"

    rn_map = _map_sql(1, "bigint")
    out = out.withColumn(
        rank_name, (F.expr(f"{rn_map}[__pid]") + F.col("__lrn")).cast("long")
    )
    for j, name in enumerate(running_sums):
        off_map = _map_sql(2 + j, sum_types[name])
        out = out.withColumn(
            name, F.expr(f"{off_map}[__pid]") + F.col(f"__lrs_{name}")
        )
    drop = ["__pid", "__lrn"] + [f"__lrs_{n}" for n in running_sums]
    return out.drop(*drop), totals


def attach_global_orders(
    df: DataFrame,
    specs: list[tuple[str, str, str]],
    *,
    num_partitions: int | None = None,
) -> tuple[DataFrame, int]:
    """Attach SEVERAL independent global ``row_number`` columns in ONE
    pass over ONE pinned input (VERDICT r09 wrong #2: rfm_segmentation
    ran three sequential ``attach_global_order`` calls, each with its own
    localCheckpoint + sampled range exchange + offset collect).

    Each spec is ``(rank_name, metric_col, tiebreak_col)`` — the total
    order is (metric ASC, tiebreak ASC) with a UNIQUE tiebreak (every
    caller in the bank ranks entities by a metric with the entity key as
    tiebreak).  Why one checkpoint suffices here but not in
    ``attach_global_order``: that function relies on
    ``repartitionByRange``, whose SAMPLED boundaries can differ between
    the offsets job and the final job unless the exchange itself is
    pinned.  Here the range boundaries are computed ONCE on the driver
    (from a metadata-sized hash-ordered top-N sample) and the partition
    id becomes a PURE FUNCTION of the row (a codegen'd comparison ladder), so every
    job derives identical partition membership from the single pinned
    input — no per-order checkpoint, no sampling race.

    Jobs: 1 checkpoint materialization + 1 sample job + ONE combined
    per-(order, pid) counts job (exploded — 3·nparts rows, never
    nparts³) + the final job (one window exchange per spec, chained in a
    single plan).  Balance: boundaries are every (sample/nparts)-th
    sampled (metric, tiebreak) PAIR, so heavy metric ties (e.g. order
    counts) still split across partitions by the tiebreak — same
    property the (metric, key) range exchange had.

    Returns ``(df + rank columns, n_rows)``.
    """
    spark = df.sparkSession
    nparts = num_partitions or spark.sparkContext.defaultParallelism
    base = df.localCheckpoint(eager=True)
    need = sorted({c for _, m, k in specs for c in (m, k)})
    # Boundary sample: order by a hash of the sampled columns and take the
    # first 64·nparts rows — TakeOrderedAndProject (per-partition partial
    # top-N, metadata-sized driver merge), ONE job with no RDD conversion.
    # The old rdd.takeSample paid the full DataFrame→pickled-Python-RDD
    # path plus takeSample's own count job (~0.4 s/call, r12 §10).
    # xxhash64 of the (metric, tiebreak) columns is a deterministic
    # uniform order, so the boundary QUALITY matches random sampling; the
    # boundary CHOICE never affects results — every row's global rank is
    # its local rank plus the count of rows in lower ranges regardless of
    # where the boundaries fell (module docstring).
    sample = (
        base.select(*need)
        .orderBy(F.xxhash64(*[F.col(c) for c in need]))
        .limit(64 * nparts)
        .collect()
    )

    def _lit_sql(v) -> str | None:
        """Render a boundary literal for the pid CASE expression; doubles
        round-trip through a string cast (exact IEEE parse).  Returns None
        for types the SQL renderer does not cover."""
        if isinstance(v, bool):
            return None
        if isinstance(v, int):
            return f"CAST({v} AS BIGINT)"
        if isinstance(v, float):
            return f"CAST('{v!r}' AS DOUBLE)"
        return None

    def _pid(metric: str, key: str) -> Column:
        pairs = sorted((r[metric], r[key]) for r in sample)
        step = max(1, len(pairs) // nparts)
        bounds = pairs[step::step][: nparts - 1]
        # pid = count of boundaries ≤ (metric, key): monotone in the
        # total order, so lower pids hold strictly lower-ranked rows.
        # Build the chain ASCENDING so the LARGEST boundary's condition
        # ends up outermost — each iteration wraps the previous chain,
        # and the outermost WHEN is evaluated first (r10 review #1: the
        # reversed order made the smallest boundary outermost, collapsing
        # every pid to {0, 1} — ranks stayed correct because offsets use
        # real counts, but the partition balance this function exists for
        # was silently absent).
        #
        # Rendered as ONE SQL string (r12 §10): the nparts-1 nested WHENs
        # built from pyspark Column objects cost ~8 py4j round-trips per
        # boundary × 3 specs ≈ 2 s of pure driver latency per call —
        # the same construction tax §5 removed from prom_align.  The CASE
        # string is fragment-identical to the Column tree it replaces.
        lits = [(_lit_sql(bm), _lit_sql(bk)) for bm, bk in bounds]
        if all(m is not None and k is not None for m, k in lits):
            expr = "0"
            for i, (bm_s, bk_s) in enumerate(lits):
                cond = (
                    f"(`{metric}` > {bm_s} OR "
                    f"(`{metric}` = {bm_s} AND `{key}` >= {bk_s}))"
                )
                expr = f"CASE WHEN {cond} THEN {i + 1} ELSE ({expr}) END"
            return F.expr(expr)
        # non-numeric boundary types: keep the Column-tree path
        pid: Column = F.lit(0)
        for i, (bm, bk) in enumerate(bounds):
            cond = (F.col(metric) > F.lit(bm)) | (
                (F.col(metric) == F.lit(bm)) & (F.col(key) >= F.lit(bk))
            )
            pid = F.when(cond, F.lit(i + 1)).otherwise(pid)
        return pid

    pid_cols = {
        rank_name: _pid(m, k).alias(f"__pid_{rank_name}")
        for rank_name, m, k in specs
    }
    with_pids = base.select("*", *pid_cols.values())
    # ONE counts job for every (order, pid) — exploded so the collected
    # result is 3·nparts rows by construction, never a pid cross-product
    counts = (
        with_pids.select(
            F.explode(
                F.array(
                    *[
                        F.struct(
                            F.lit(i).alias("o"),
                            F.col(f"__pid_{rank_name}").alias("p"),
                        )
                        for i, (rank_name, _, _) in enumerate(specs)
                    ]
                )
            ).alias("e")
        )
        .groupBy("e.o", "e.p")
        .agg(F.count(F.lit(1)).alias("c"))
        .collect()
    )
    per_order: dict[int, dict[int, int]] = {}
    for r in counts:
        per_order.setdefault(r["o"], {})[r["p"]] = r["c"]
    n_rows = sum(per_order.get(0, {}).values())
    out = with_pids
    for i, (rank_name, m, k) in enumerate(specs):
        cnts = per_order.get(i, {})
        offsets, run = {}, 0
        for p in sorted(cnts):
            offsets[p] = run
            run += cnts[p]
        off_map = (
            F.create_map(
                *[F.lit(x) for p, off in sorted(offsets.items()) for x in (p, off)]
            )
            if offsets
            else F.create_map(F.lit(0), F.lit(0))
        )
        w = Window.partitionBy(f"__pid_{rank_name}").orderBy(
            F.col(m).asc(), F.col(k).asc()
        )
        out = out.withColumn(
            rank_name,
            (
                F.coalesce(
                    off_map[F.col(f"__pid_{rank_name}")], F.lit(0)
                )
                + F.row_number().over(w)
            ).cast("long"),
        )
    return out.drop(*[f"__pid_{rn}" for rn, _, _ in specs]), n_rows


def ntile_from_rank(rank_col: Column, n: int, tiles: int) -> Column:
    """Exact NTILE(tiles) bucket from a 1-based global rank and the total
    row count ``n`` (SQL-standard remainder semantics: the first n % tiles
    buckets get one extra row) — lets NTILE ride a two-pass rank instead
    of a single-task window."""
    q, rem = divmod(n, tiles)
    big = q + 1
    first_span = rem * big
    in_first = (rank_col - 1).cast("long") / F.lit(big)
    if q == 0:
        # fewer rows than tiles: every row is its own bucket
        return rank_col.cast("long")
    rest = (rank_col - F.lit(first_span) - 1).cast("long") / F.lit(q)
    return (
        F.when(rank_col <= F.lit(first_span), F.floor(in_first) + 1)
        .otherwise(F.lit(rem) + F.floor(rest) + 1)
        .cast("long")
    )
