"""Bucketed co-located joins — the no-shuffle join strategy for repeated
big-fact joins at 100 TB.

A plain ``fact JOIN fact2 ON key`` shuffles BOTH sides on every query.
Writing both tables bucketed by the join key (Spark ``bucketBy``: rows are
hash-partitioned into a fixed bucket count at WRITE time, recorded in the
catalog) lets every subsequent join read bucket i against bucket i — the
physical plan has SortMergeJoin with NO Exchange on either side.  At
100 TB this converts the dominant per-query shuffle (TBs over the
network, spill risk) into a one-time write-side cost that amortizes over
every downstream join/aggregation on the same key.

The reference co-locates differently (its partitioned tables route by key
at write time, partition/rule/key.rs — our `partition.py` ports that for
point lookups); bucketing is the Spark-native analogue for JOIN
co-location, which the reference cannot express at all.

Requires a persistent session catalog (``saveAsTable``); plain parquet
paths cannot carry bucket metadata.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame, table_name: str, key: str | list[str], n_buckets: int
) -> None:
    """Persist ``df`` bucketed (and sort-ordered) by ``key`` — the
    write-side half of a co-located join.  Sorting within buckets lets the
    join skip its per-task sort too."""
    keys = [key] if isinstance(key, str) else list(key)
    (
        df.write.mode("overwrite")
        .bucketBy(n_buckets, *keys)
        .sortBy(*keys)
        .saveAsTable(table_name)
    )


def cobucketed_join(
    spark: SparkSession, left_table: str, right_table: str, on: str | list[str], how: str = "inner"
) -> DataFrame:
    """Join two tables bucketed on the same key with the same bucket
    count.  The plan must contain no Exchange below the join — asserted by
    :func:`join_is_shuffle_free` (and the bucketing test)."""
    keys = [on] if isinstance(on, str) else list(on)
    return spark.table(left_table).join(spark.table(right_table), on=keys, how=how)


def join_is_shuffle_free(df: DataFrame) -> bool:
    """True when the physical plan has a join with no shuffle exchange
    feeding it (bucket pruning worked).  AQE keeps the initial plan's
    exchanges visible in the simple string, so absence is meaningful."""
    plan = df._jdf.queryExecution().executedPlan().toString()
    return "Exchange hashpartitioning" not in plan
