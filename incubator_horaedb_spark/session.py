"""SparkSession factory tuned for the engine.

The reference runs 8-way partitioned scans with 8192-row batches
(src/table_engine/src/table.rs:170, table_options.rs:62).  On Spark the
equivalents are input-split sizing, AQE, and parquet pushdown — all set here
so every entry point (tests, bench, driver) gets the same plan behavior.

Scale notes (100 TB design): these settings are safe on a real cluster —
AQE re-plans shuffles at runtime (skew joins, partition coalescing),
parquet filter/pushdown keeps scans pruned, and shuffle partitions here are
only a local default (AQE coalesces; on a cluster you'd set
spark.sql.shuffle.partitions ~ 2-3x total cores).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def default_cpus() -> int:
    return int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 4))


def get_spark(
    app_name: str = "incubator-horaedb-spark",
    cpus: int | None = None,
    ui: bool = False,
) -> SparkSession:
    """``ui=True`` enables the Spark UI so callers can read the REST stage
    metrics API (bench.py's per-query executor-CPU attribution); queries and
    tests keep it off — the UI store adds per-stage bookkeeping overhead."""
    cpus = cpus or default_cpus()
    builder = (
        SparkSession.builder.appName(app_name)
        .master(f"local[{cpus}]")
        # Runtime re-planning: partition coalescing, skew-join splitting.
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        # NOTE (r12 optimization round): canChangeCachedPlanOutputPartitioning
        # =true was trialled here — it cut the dedup family 16-40% at sf0.1
        # by coalescing near-empty cached-scan tasks, but at the 10× sf1
        # tier it REGRESSED dedup_simhash ~1.8× (AQE coalesces the cached
        # interpreted-HOF stages' partitioning down to byte-size, starving
        # the compute-dense folds of parallelism).  A small-data-only win
        # that inverts with scale — rejected; see OPTIMIZATION_r12.md §6.
        # Scan pruning — the Spark analogue of the reference's SST row-group
        # pruning (sst/parquet/row_group_pruner.rs) and predicate pushdown
        # (table_engine/provider.rs:313-345).
        .config("spark.sql.parquet.filterPushdown", "true")
        .config("spark.sql.parquet.aggregatePushdown", "true")
        .config("spark.sql.shuffle.partitions", str(max(cpus, 8)))
        # Arrow for the few pandas-UDF paths (multimodal / UDF framework).
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "true" if ui else "false")
    )
    if ui:
        builder = builder.config("spark.ui.port", "4048")  # auto-increments
    return builder.getOrCreate()
