"""Key-partitioned tables: partition computation and read-side pruning.

Port of src/table_engine/src/partition/rule/key.rs:

- write side: partition = hash(encoded partition-key values) % n
  (compute_partition, key.rs:367).  Here: ``pmod(xxhash64(keys), n)`` — a
  deterministic JVM-side hash; values need not match the reference's
  internal hash (never observable in results).
- read side: ``locate_partitions_for_read(filters)`` (key.rs:192-230) maps
  equality / in-list predicates over ALL partition keys to the candidate
  partition set; any non-equality or missing key → all partitions.

At 100 TB a key-partitioned table is stored partitionBy(__partition,
__segment); the pruning helper turns tag-equality queries into partition
directory pruning on top of time-segment pruning — the Spark rendering of
the reference's sub-table routing (partition_table_engine/, router/).
"""

from __future__ import annotations

from itertools import product
from typing import Any, Sequence

from pyspark.sql import Column
from pyspark.sql import functions as F

PARTITION_COLUMN = "__partition"

_NULL_SENTINEL = "\x00__null__"


def key_partition_expr(key_cols: Sequence[str], num_partitions: int) -> Column:
    """KeyRule partition id for a row (key.rs:40-157)."""
    prepared = [
        F.coalesce(F.col(c).cast("string"), F.lit(_NULL_SENTINEL)) for c in key_cols
    ]
    return F.pmod(F.xxhash64(*prepared), F.lit(num_partitions)).cast("int")


# partition-id lookups memoized: the id is a pure function of
# (key values, n) — xxhash64 is deterministic — and the old
# createDataFrame + first() evaluation cost ~1.4 s of driver work PER
# LOOKUP (schema parse, Python→JVM row conversion, a scheduled job).
# The cold path below evaluates the same expression over literals on a
# one-row local relation instead: Catalyst constant-folds it, so first()
# is a driver-local eval with no tasks.
_PARTITION_ID_CACHE: dict[tuple, int] = {}


def _partition_of(spark, key_cols: Sequence[str], values: Sequence[Any], n: int) -> int:
    """Driver-side evaluation of the same expression for pruning."""
    key = (tuple(key_cols), tuple(values), n)
    p = _PARTITION_ID_CACHE.get(key)
    if p is None:
        prepared = [
            F.coalesce(F.lit(v).cast("string"), F.lit(_NULL_SENTINEL)) for v in values
        ]
        row = spark.range(1).select(
            F.pmod(F.xxhash64(*prepared), F.lit(n)).cast("int").alias("p")
        )
        p = row.first()["p"]
        _PARTITION_ID_CACHE[key] = p
    return p


def locate_partitions_for_read(
    spark,
    key_cols: Sequence[str],
    num_partitions: int,
    filters: dict[str, Any | list[Any]],
) -> list[int] | None:
    """Candidate partitions for the given equality/in-list filters
    (locate_partitions_for_read, key.rs:192-230).

    ``filters`` maps column → value or list of values.  Returns None when
    pruning is impossible (some key missing) — scan all partitions.
    """
    value_lists: list[list[Any]] = []
    for c in key_cols:
        if c not in filters:
            return None
        v = filters[c]
        value_lists.append(list(v) if isinstance(v, (list, tuple, set)) else [v])
    parts = set()
    for combo in product(*value_lists):
        parts.add(
            _partition_of(spark, key_cols, [str(x) if x is not None else None for x in combo], num_partitions)
        )
    return sorted(parts)


def pruned_filter(
    spark,
    key_cols: Sequence[str],
    num_partitions: int,
    filters: dict[str, Any | list[Any]],
) -> Column:
    """A pushdown-able filter: __partition IN (candidates) AND the original
    equality predicates.  Falls back to just the predicates when pruning
    is impossible."""
    cond = F.lit(True)
    for c, v in filters.items():
        col = F.col(c)
        cond = cond & (col.isin(list(v)) if isinstance(v, (list, tuple, set)) else (col == v))
    parts = locate_partitions_for_read(spark, key_cols, num_partitions, filters)
    if parts is not None:
        cond = F.col(PARTITION_COLUMN).isin(parts) & cond
    return cond


def random_partition_expr(num_partitions: int) -> Column:
    """RandomRule write scatter (partition/rule/random.rs:40-48): each write
    batch lands in a random partition.  Spark rendering: uniform per-row
    rand() — at scale this is the write-balancing rule for tables with no
    meaningful key; reads always fan out to all partitions."""
    return (F.rand(seed=None) * num_partitions).cast("int")


def locate_partitions_for_read_random(num_partitions: int) -> list[int]:
    """RandomRule read side (random.rs:50-53): no pruning, scan all."""
    return list(range(num_partitions))
