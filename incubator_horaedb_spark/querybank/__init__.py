"""Query bank: every implemented operator from SURVEY.md §2 as a pair of
(PySpark DataFrame builder, DuckDB oracle SQL).

The driver's correctness gate runs both sides at sf=0.01 and compares
row-count + schema + order-insensitive value hashes, so:

- every computed column is aliased identically on both sides;
- float aggregates are rounded identically on both sides;
- DuckDB type quirks (sum(BIGINT) → HUGEINT) are cast back to Spark types.

Modules self-register via :func:`register`; importing the package loads all
banks.
"""

from incubator_horaedb_spark.querybank.registry import (
    QUERIES,
    oracles,
    queries,
    register,
    tolerance_oracles,
)

# Import for side effect: each module registers its queries.
from incubator_horaedb_spark.querybank import core_sql  # noqa: E402,F401
from incubator_horaedb_spark.querybank import timeseries  # noqa: E402,F401
from incubator_horaedb_spark.querybank import promql  # noqa: E402,F401
from incubator_horaedb_spark.querybank import protocols  # noqa: E402,F401
from incubator_horaedb_spark.querybank import llm_ops  # noqa: E402,F401
from incubator_horaedb_spark.querybank import multimodal  # noqa: E402,F401
from incubator_horaedb_spark.querybank import sql_extended  # noqa: E402,F401
from incubator_horaedb_spark.querybank import olap_ext  # noqa: E402,F401
from incubator_horaedb_spark.querybank import tpch  # noqa: E402,F401
from incubator_horaedb_spark.querybank import promql_fns  # noqa: E402,F401
from incubator_horaedb_spark.querybank import streaming_e2e  # noqa: E402,F401
from incubator_horaedb_spark.querybank import partitioned  # noqa: E402,F401
from incubator_horaedb_spark.querybank import protocol_e2e  # noqa: E402,F401
from incubator_horaedb_spark.querybank import wire_e2e  # noqa: E402,F401
from incubator_horaedb_spark.querybank import wire_binary_e2e  # noqa: E402,F401

__all__ = ["QUERIES", "register", "queries", "oracles", "tolerance_oracles"]
