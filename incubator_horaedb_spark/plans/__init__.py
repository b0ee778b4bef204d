"""Plan inspection utilities — the Spark analogue of the reference's
EXPLAIN golden tests."""

from incubator_horaedb_spark.plans.inspect import (
    explain_str,
    has_partial_and_final_agg,
    pushed_filters,
    read_schema_columns,
    uses_top_k,
)

__all__ = [
    "explain_str",
    "pushed_filters",
    "read_schema_columns",
    "has_partial_and_final_agg",
    "uses_top_k",
]
