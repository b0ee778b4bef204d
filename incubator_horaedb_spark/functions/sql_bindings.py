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
    ts: datetime.datetime | None,
    period: str,
    fmt: str | None = None,
    tz: str | None = None,
    outfmt: str | None = None,
) -> datetime.datetime | None:
    """Pure-Python time_bucket with the same branches as the Column impl.

    Full reference arity (ts, period[, input_fmt[, tz[, out_fmt]]]) —
    time_bucket.rs:85-342.  The extra arguments don't affect the computed
    value: golden results return Timestamp for every arity, and the
    reference truncates at its hardcoded +0800 (time_bucket.rs:83) no
    matter what tz is passed — ported faithfully."""
    if ts is None:
        return None
    tz_offset_secs = 8 * 3600
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

_INTERVAL_MS = {"second": 1000, "minute": 60_000, "hour": 3_600_000, "day": 86_400_000}
_DATE_BIN_RE = re.compile(
    r"\bDATE_BIN\(\s*INTERVAL\s+'(\d+)'\s+(second|minute|hour|day)s?\s*,"
    r"\s*([^,]+?)\s*,\s*TIMESTAMP\s+'([^']+)'\s*\)",
    re.I,
)


def _rewrite_date_bin(sql: str) -> str:
    """DataFusion call shape (date_bin.sql corpus):
    DATE_BIN(INTERVAL 'n' unit, col, TIMESTAMP 'origin') → our binding's
    (stride_ms, col, origin_ms) arity."""

    def sub(m: re.Match) -> str:
        stride_ms = int(m.group(1)) * _INTERVAL_MS[m.group(2).lower()]
        origin = datetime.datetime.fromisoformat(m.group(4).replace("Z", "+00:00"))
        origin_ms = int(origin.timestamp() * 1000)
        return f"date_bin({stride_ms}, {m.group(3)}, {origin_ms})"

    return _DATE_BIN_RE.sub(sub, sql)


def rewrite_sql_functions(sql: str) -> str:
    """Rewrite aggregate custom functions to their Spark equivalents.

    ``thetasketch_distinct(expr)`` → ``approx_count_distinct(expr, 0.008)``:
    inserts the rsd argument before the closing paren of the matched call
    (balanced-paren scan, so nested expressions are safe).  Also rewrites
    the DataFusion DATE_BIN(INTERVAL ...) call shape."""
    sql = _rewrite_date_bin(sql)
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
