"""Skew mitigation: salted two-phase aggregation for hot keys.

At 100 TB a handful of hot series (one tsid carrying a large share of
samples, one boilerplate document dominating an LSH band) can pin a whole
stage on one reducer.  Spark's AQE splits skewed *join* partitions, but a
skewed **aggregation** key still lands on a single task after the shuffle
when the per-key state is large (collect_list, percentile buffers, large
HLL unions).

``salted_agg`` implements the standard fix declaratively: scatter each
key over ``n_salts`` sub-keys (phase 1 partial agg on (key, salt)), then
combine the partials per key (phase 2).  Only aggregates with a
partial/combine decomposition qualify — the caller supplies both sides,
exactly like the reference's UDAF accumulator merge state
(src/df_operator/src/udaf.rs:61, aggregate.rs mergeable states).

For plain algebraic aggregates (sum/count/min/max/avg) Spark's own
map-side partial aggregation already does this — use salting only when
the per-key combine state is heavy or the key distribution is extreme.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

SALT_COL = "__salt"


def salted_agg(
    df: DataFrame,
    keys: Sequence[str],
    partial_aggs: Sequence[Column],
    combine_aggs: Sequence[Column],
    n_salts: int = 16,
) -> DataFrame:
    """Two-phase aggregation over ``keys`` with an ``n_salts``-way scatter.

    ``partial_aggs`` aggregate the raw rows per (keys, salt);
    ``combine_aggs`` merge the per-salt partials per keys.  Example —
    exact distinct count under a hot key::

        salted_agg(
            df, ["k"],
            partial_aggs=[F.collect_set("v").alias("vs")],
            combine_aggs=[F.size(F.array_distinct(F.flatten(F.collect_list("vs")))).alias("ndv")],
        )

    The salt is deterministic (hash of the full row's monotonically
    increasing id is NOT reproducible across runs, so we hash the value
    columns) — re-running the same input yields the same partials.
    """
    value_cols = [c for c in df.columns if c not in set(keys)]
    salt = F.pmod(F.xxhash64(*[F.col(c) for c in value_cols]), F.lit(n_salts))
    phase1 = df.withColumn(SALT_COL, salt).groupBy(*keys, SALT_COL).agg(*partial_aggs)
    return phase1.groupBy(*keys).agg(*combine_aggs)
