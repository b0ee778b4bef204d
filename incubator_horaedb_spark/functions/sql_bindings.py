"""SQL-text bindings for the reference's custom functions.

The sqlness corpus calls ``time_bucket`` / ``date_bin`` /
``thetasketch_distinct`` inside SQL strings
(integration_tests/cases/common/function/*.sql); our fast implementations
are DataFrame Column expressions (functions/time_bucket.py, sketches.py).
This module makes the same names callable from ``spark.sql`` text:

- ``time_bucket`` / ``date_bin``: registered as Python UDFs whose math is
  the same branch structure as the Column versions (slow path — fine for
  dialect parity; DataFrame pipelines should use the Column functions,
  which stay inside whole-stage codegen).
- ``thetasketch_distinct(x)``: an aggregate, so it cannot be a Python
  scalar UDF — the dialect shim rewrites the call to
  ``approx_count_distinct(x, 0.008)`` textually
  (:func:`rewrite_sql_functions`), mirroring how the reference registry
  resolves it to an HLL accumulator (thetasketch_distinct.rs:63-202).
"""

from __future__ import annotations

import datetime
import re

from pyspark.sql import SparkSession
from pyspark.sql import types as T

from incubator_horaedb_spark.functions.sketches import THETASKETCH_ERROR_RATE
from incubator_horaedb_spark.functions.time_bucket import _SUBDAY_SECONDS, parse_period

_EPOCH = datetime.datetime(1970, 1, 1)


def _from_ms(ms: int) -> datetime.datetime:
    return _EPOCH + datetime.timedelta(milliseconds=ms)


def _to_ms(dt: datetime.datetime) -> int:
    return int((dt - _EPOCH).total_seconds() * 1000)


def time_bucket_py(
    ts: datetime.datetime | None, period: str, tz_offset_secs: int = 0
) -> datetime.datetime | None:
    """Pure-Python time_bucket with the same branches as the Column impl."""
    if ts is None:
        return None
    unit, n = parse_period(period)
    if unit in _SUBDAY_SECONDS:
        stride_ms = n * _SUBDAY_SECONDS[unit] * 1000
        return _from_ms(_to_ms(ts) // stride_ms * stride_ms)
    local = ts + datetime.timedelta(seconds=tz_offset_secs)
    if unit == "D":
        day = local.day - (local.day % n)
        local_trunc = local.replace(day=max(day, 1), hour=0, minute=0, second=0, microsecond=0)
    elif unit == "W":
        start = local.replace(hour=0, minute=0, second=0, microsecond=0)
        local_trunc = start - datetime.timedelta(days=local.weekday())
    elif unit == "MONTH":
        local_trunc = local.replace(day=1, hour=0, minute=0, second=0, microsecond=0)
    else:  # Y
        local_trunc = local.replace(
            month=1, day=1, hour=0, minute=0, second=0, microsecond=0
        )
    return local_trunc - datetime.timedelta(seconds=tz_offset_secs)


def date_bin_py(
    stride_ms: int, ts: datetime.datetime | None, origin_ms: int = 0
) -> datetime.datetime | None:
    if ts is None:
        return None
    ms = _to_ms(ts)
    return _from_ms((ms - origin_ms) // stride_ms * stride_ms + origin_ms)


_REGISTERED: set[int] = set()


def register_sql_functions(spark: SparkSession) -> None:
    """Register time_bucket / date_bin for spark.sql text (once per
    session — re-registering spams 'function replaced' warnings)."""
    key = id(spark)
    if key in _REGISTERED:
        return
    spark.udf.register("time_bucket", time_bucket_py, T.TimestampType())
    spark.udf.register("date_bin", date_bin_py, T.TimestampType())
    _REGISTERED.add(key)


_THETA_RE = re.compile(r"\bthetasketch_distinct\s*\(", re.I)


def rewrite_sql_functions(sql: str) -> str:
    """Rewrite aggregate custom functions to their Spark equivalents.

    ``thetasketch_distinct(expr)`` → ``approx_count_distinct(expr, 0.008)``:
    inserts the rsd argument before the closing paren of the matched call
    (balanced-paren scan, so nested expressions are safe)."""
    out = []
    pos = 0
    for m in _THETA_RE.finditer(sql):
        depth = 1
        i = m.end()
        while i < len(sql) and depth:
            if sql[i] == "(":
                depth += 1
            elif sql[i] == ")":
                depth -= 1
            i += 1
        if depth:
            break  # unbalanced; leave untouched
        out.append(sql[pos : m.start()])
        out.append(f"approx_count_distinct({sql[m.end():i - 1]}, {THETASKETCH_ERROR_RATE})")
        pos = i
    out.append(sql[pos:])
    return "".join(out)
