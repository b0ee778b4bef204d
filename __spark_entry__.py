"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship query at sf0.001; ``queries()`` exposes
every implemented operator from SURVEY.md §2 (plus the LLM-pipeline
extensions); ``oracle_sql()`` gives the DuckDB-equivalent SQL for the
correctness gate.  All real logic lives in ``incubator_horaedb_spark``.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from incubator_horaedb_spark import querybank


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return querybank.QUERIES["q1_pricing_summary"].fn(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return querybank.queries()


def oracle_sql() -> dict[str, str]:
    return querybank.oracles()
