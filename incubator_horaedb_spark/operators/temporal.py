"""Temporal joins (beyond-reference, time-series-native): as-of join and
interval (range) join — the two joins a time-series engine needs that
vanilla SQL equi-joins can't express efficiently.

As-of join — for each left row (key, t) attach the LATEST right row with
t_r ≤ t (optionally within a tolerance).  The scalable composition is the
union-marker trick, NOT a per-row subquery:

    union(right(side=0), left(side=1))
      → window last(right_payload, ignorenulls) over
          (PARTITION BY key ORDER BY t, side ROWS UNBOUNDED PRECEDING)
      → keep left rows

One shuffle on the key, linear scan per partition — the same shape
kdb/pandas merge_asof/DuckDB ASOF JOIN implement natively, re-expressed as
Spark window semantics.  Right rows sort before left rows at equal
timestamps (side 0 < 1), making the match inclusive.

Interval join — points to enclosing intervals.  With a shared key the
equi-join on the key IS the candidate generation (no cartesian); the
containment predicate filters after.  Keyless interval joins must bucket
by time (`bucket_ms`): intervals explode to the buckets they cover, points
join their bucket — candidate pairs are bounded by interval_len/bucket
instead of |points|×|intervals|.

The DuckDB oracles use the engine-native formulations (ASOF JOIN, plain
inequality join), so the correctness gate proves the Spark composition
equals the textbook semantics.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    left_ts: str,
    right_ts: str,
    tolerance_ms: int | None = None,
    suffix: str = "_r",
) -> DataFrame:
    """Left as-of join: every left row, plus the newest right row at or
    before its timestamp (per join key); right columns get ``suffix``.
    Right rows must be unique per (key, ts) for deterministic output —
    pre-aggregate the right side if they are not."""
    rpayload = [c for c in right.columns if c not in on and c != right_ts]
    r = right.select(
        *on,
        F.col(right_ts).alias("__t"),
        F.struct(*[F.col(c) for c in rpayload]).alias("__r"),
        F.lit(0).alias("__side"),
    )
    lcols = left.columns
    lft = left.select(
        *[F.col(c) for c in lcols],
        F.col(left_ts).alias("__t"),
        F.lit(None).cast(r.schema["__r"].dataType).alias("__r"),
        F.lit(1).alias("__side"),
    )
    # align schemas: right side carries left's columns as nulls
    for c in lcols:
        if c not in on and c not in r.columns:
            r = r.withColumn(c, F.lit(None).cast(dict(left.dtypes)[c]))
    r = r.select(*lcols, "__t", "__r", "__side")
    lft = lft.select(*lcols, "__t", "__r", "__side")

    w = (
        Window.partitionBy(*on)
        .orderBy("__t", "__side")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    matched = (
        r.unionByName(lft)
        .withColumn("__match", F.last("__r", ignorenulls=True).over(w))
        .withColumn("__match_t", F.last(F.when(F.col("__side") == 0, F.col("__t")), ignorenulls=True).over(w))
        .filter(F.col("__side") == 1)
    )
    if tolerance_ms is not None:
        within = (
            F.col("__match_t").isNotNull()
            & (F.unix_millis(F.col("__t").cast("timestamp")) - F.unix_millis(F.col("__match_t").cast("timestamp")) <= tolerance_ms)
            if dict(matched.dtypes)["__t"] == "timestamp"
            else F.col("__match_t").isNotNull() & (F.col("__t") - F.col("__match_t") <= tolerance_ms)
        )
        matched = matched.withColumn("__match", F.when(within, F.col("__match"))).withColumn(
            "__match_t", F.when(within, F.col("__match_t"))
        )
    out = matched.select(
        *lcols,
        F.col("__match_t").alias(f"{right_ts}{suffix}"),
        *[F.col("__match").getField(c).alias(f"{c}{suffix}") for c in rpayload],
    )
    return out


def interval_join(
    points: DataFrame,
    intervals: DataFrame,
    point_ts: str,
    start: str,
    end: str,
    on: list[str] | None = None,
    bucket_ms: int | None = None,
    how: str = "inner",
) -> DataFrame:
    """Join points to the intervals containing them ([start, end]
    inclusive).  With ``on`` keys the equi-join bounds candidates; without
    keys ``bucket_ms`` is REQUIRED — intervals explode to covered time
    buckets and points join their bucket, so candidate pairs stay bounded
    at any scale (a keyless containment join without bucketing is a
    cartesian product and is refused).

    ``how``: ``inner`` or ``left`` (points without an enclosing interval
    kept with null interval columns).  The containment predicate is part
    of the JOIN CONDITION, not a post-filter — a post-filter would drop
    outer-side null rows and silently degenerate every join type to inner
    (ADVICE r02).  Point-centric semantics only: right/full outer would
    need interval-side preservation, which this operator does not define.
    """
    if how not in ("inner", "left", "left_outer", "leftouter"):
        raise ValueError(
            f"interval_join supports how='inner'|'left' (point-centric); got {how!r}"
        )
    pt = points.alias("__p")
    iv = intervals.alias("__i")
    contain = (F.col(f"__p.{point_ts}") >= F.col(f"__i.{start}")) & (
        F.col(f"__p.{point_ts}") <= F.col(f"__i.{end}")
    )
    if not on:
        if bucket_ms is None:
            raise ValueError("keyless interval_join requires bucket_ms (anti-cartesian guard)")
        b = F.lit(bucket_ms)
        iv = intervals.withColumn(
            "__bucket",
            F.explode(F.sequence((F.col(start) / b).cast("long"), (F.col(end) / b).cast("long"))),
        ).alias("__i")
        pt = points.withColumn("__bucket", (F.col(point_ts) / b).cast("long")).alias("__p")
        cond = (F.col("__p.__bucket") == F.col("__i.__bucket")) & contain
        dup = ["__bucket"]
    else:
        cond = contain
        for k in on:
            cond = (F.col(f"__p.{k}") == F.col(f"__i.{k}")) & cond
        dup = list(on)
    joined = pt.join(iv, cond, how)
    # one copy of the equi-keys (the point side's — non-null for kept rows)
    keep_iv = [c for c in intervals.columns if c not in dup]
    return joined.select(
        *[F.col(f"__p.{c}") for c in points.columns],
        *[F.col(f"__i.{c}") for c in keep_iv],
    )


def nearest_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    left_ts: str,
    right_ts: str,
    tolerance_ms: int,
    suffix: str = "_r",
) -> DataFrame:
    """Nearest-in-time join (both directions): every left row, plus the
    right row (per key) minimizing |Δt|, within ``tolerance_ms``; ties
    (equal distance before and after) resolve BACKWARD — the at-or-before
    row wins, matching the as-of convention.  The sensor-alignment join:
    as-of is "latest known state", nearest is "closest observation".

    Same single-pass union-marker shape as :func:`asof_join` — one shuffle
    on the key, one sort, TWO window frames over it (running last for the
    backward candidate, following first for the forward candidate), then a
    per-row pick.  The global nearest is always one of those two, so no
    range join and no candidate blowup at any scale.  Left timestamps must
    be numeric (epoch ms); right rows unique per (key, ts)."""
    rpayload = [c for c in right.columns if c not in on and c != right_ts]
    r = right.select(
        *on,
        F.col(right_ts).alias("__t"),
        F.struct(*[F.col(c) for c in rpayload]).alias("__r"),
        F.lit(0).alias("__side"),
    )
    lcols = left.columns
    lft = left.select(
        *[F.col(c) for c in lcols],
        F.col(left_ts).alias("__t"),
        F.lit(None).cast(r.schema["__r"].dataType).alias("__r"),
        F.lit(1).alias("__side"),
    )
    for c in lcols:
        if c not in on and c not in r.columns:
            r = r.withColumn(c, F.lit(None).cast(dict(left.dtypes)[c]))
    r = r.select(*lcols, "__t", "__r", "__side")
    lft = lft.select(*lcols, "__t", "__r", "__side")
    u = r.unionByName(lft)

    # right rows at the same ts sort BEFORE the left row (side 0 < 1), so
    # the backward frame includes same-ts matches and the forward frame
    # starts strictly after — same-ts rows are "backward", never counted
    # twice.
    back = (
        Window.partitionBy(*on)
        .orderBy("__t", "__side")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    fwd = (
        Window.partitionBy(*on)
        .orderBy("__t", "__side")
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    )
    rt = F.when(F.col("__side") == 0, F.col("__t"))
    m = (
        u.withColumn("__bm", F.last("__r", ignorenulls=True).over(back))
        .withColumn("__bt", F.last(rt, ignorenulls=True).over(back))
        .withColumn("__fm", F.first("__r", ignorenulls=True).over(fwd))
        .withColumn("__ft", F.first(rt, ignorenulls=True).over(fwd))
        .filter(F.col("__side") == 1)
    )
    bd = F.col("__t") - F.col("__bt")          # >= 0 when present
    fd = F.col("__ft") - F.col("__t")          # > 0 when present
    b_ok = F.col("__bt").isNotNull() & (bd <= tolerance_ms)
    f_ok = F.col("__ft").isNotNull() & (fd <= tolerance_ms)
    take_back = b_ok & (~f_ok | (bd <= fd))    # tie -> backward
    take_fwd = f_ok & ~take_back
    pick = lambda bcol, fcol: (
        F.when(take_back, bcol).when(take_fwd, fcol)
    )
    out = m.select(
        *lcols,
        pick(F.col("__bt"), F.col("__ft")).alias(f"{right_ts}{suffix}"),
        *[
            pick(F.col("__bm").getField(c), F.col("__fm").getField(c)).alias(f"{c}{suffix}")
            for c in rpayload
        ],
    )
    return out
