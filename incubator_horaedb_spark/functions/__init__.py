"""Engine scalar/aggregate functions beyond stock ``pyspark.sql.functions``.

The reference registers exactly two custom UDFs — ``time_bucket`` and
``thetasketch_distinct`` (src/df_operator/src/udfs/mod.rs:25-31) — plus two
internal PromQL helpers ``unique_id`` and ``regex_match_expr``
(src/query_frontend/src/promql/udf.rs).  ``date_bin`` is a DataFusion
built-in that Spark lacks.  All are implemented here as *column expression
builders* over Spark built-ins — no Python row-at-a-time UDFs, so every
expression stays inside whole-stage codegen.
"""

from incubator_horaedb_spark.functions.time_bucket import date_bin, time_bucket
from incubator_horaedb_spark.functions.hashing import regex_match, tsid_expr, unique_id
from incubator_horaedb_spark.functions.sketches import thetasketch_distinct

__all__ = [
    "time_bucket",
    "date_bin",
    "tsid_expr",
    "unique_id",
    "regex_match",
    "thetasketch_distinct",
]
