"""``time_bucket`` and ``date_bin`` as pure Spark column expressions.

``time_bucket(ts, 'PT1M')`` truncates a timestamp to an ISO-8601 period.
Reference: src/df_operator/src/udfs/time_bucket.rs:85-342 — periods
PT{n}S / PT{n}M / PT{n}H / P{n}D / P1W / P1M / P1Y.  Sub-day periods
truncate by epoch-duration floor; day/week/month/year truncate on the
calendar in a fixed timezone (reference default +08:00,
time_bucket.rs:83).  We default to UTC (offset 0) and expose the offset.

``date_bin(stride, ts, origin)`` is the DataFusion built-in the reference's
corpus exercises (integration_tests/cases/common/function/date_bin.sql);
Spark has no equivalent so it is built from epoch math:
``origin + floor((ts - origin) / stride) * stride``.

Everything here compiles to built-in expressions (codegen'd JVM-side) —
no UDFs, so filters/projections around these stay pushdown-friendly and the
expressions are safe in 100 TB-scale scans.
"""

from __future__ import annotations

import re
from typing import Union

from pyspark.sql import Column
from pyspark.sql import functions as F

ColumnOrName = Union[Column, str]

_PERIOD_RE = re.compile(r"^P(T?)(\d+)([SMHDWY])$")

_SUBDAY_SECONDS = {"S": 1, "M": 60, "H": 3600}


def parse_period(period: str) -> tuple[str, int]:
    """Parse an ISO-8601 period string into (unit, n).

    Mirrors Period::parse (time_bucket.rs:209-255): PT→S/M/H with any u16
    count; P→D with any count, W/M/Y only with count 1.  Note 'M' means
    minutes after PT and months after P.
    """
    m = _PERIOD_RE.match(period)
    if not m:
        raise ValueError(f"invalid period: {period!r}")
    is_pt, n, unit = m.group(1) == "T", int(m.group(2)), m.group(3)
    if is_pt:
        if unit not in ("S", "M", "H"):
            raise ValueError(f"invalid period: {period!r}")
        return unit, n
    if unit == "S" or unit == "H":
        raise ValueError(f"invalid period: {period!r}")
    if unit == "D":
        return "D", n
    if unit == "M":
        unit = "MONTH"
    if n != 1:
        raise ValueError(f"period {period!r}: only count 1 supported for W/M/Y")
    return unit, 1


def _col(c: ColumnOrName) -> Column:
    return F.col(c) if isinstance(c, str) else c


DEFAULT_TIMEZONE_OFFSET_SECS = 8 * 3600  # time_bucket.rs:83 — hardcoded +0800


def time_bucket(
    ts: ColumnOrName, period: str, tz_offset_secs: int = DEFAULT_TIMEZONE_OFFSET_SECS
) -> Column:
    """Truncate ``ts`` to ``period``; returns a timestamp column.

    Sub-day periods are epoch-floor (Timestamp::truncate_by in the
    reference — offset-independent); day is day-of-month grouped by
    ``day - day % n``; week snaps to Monday; month/year to the 1st — all
    evaluated at ``tz_offset_secs``, defaulting to the reference's
    hardcoded +0800 (golden time_bucket.result values are +0800-local).
    """
    unit, n = parse_period(period)
    col = _col(ts)
    if unit in _SUBDAY_SECONDS:
        stride_ms = n * _SUBDAY_SECONDS[unit] * 1000
        ms = F.unix_millis(col)
        return F.timestamp_millis((F.floor(ms / stride_ms) * stride_ms).cast("long"))

    local = col if tz_offset_secs == 0 else F.timestamp_millis(
        F.unix_millis(col) + tz_offset_secs * 1000
    )
    if unit == "D":
        # day - day % n (time_bucket.rs:283-296); n=1 → plain date trunc.
        day = F.dayofmonth(local)
        trunc_day = day - (day % n)
        local_trunc = F.to_timestamp(
            F.concat_ws(
                "-",
                F.year(local).cast("string"),
                F.lpad(F.month(local).cast("string"), 2, "0"),
                F.lpad(trunc_day.cast("string"), 2, "0"),
            )
        )
    elif unit == "W":
        # Snap to Monday 00:00 (truncate_week intent, time_bucket.rs:298-312).
        # NB: the reference multiplies the day offset by *week* millis — an
        # apparent unit bug that lands on epoch-phase (Thursday) boundaries;
        # we implement the documented Monday-truncation intent instead.
        days_from_monday = (F.dayofweek(local) + 5) % 7
        local_trunc = F.timestamp_millis(
            F.unix_millis(F.date_trunc("day", local))
            - (days_from_monday * (24 * 3600 * 1000)).cast("long")
        )
    elif unit == "MONTH":
        local_trunc = F.date_trunc("month", local)
    else:  # Y
        local_trunc = F.date_trunc("year", local)
    if tz_offset_secs == 0:
        return local_trunc
    return F.timestamp_millis(F.unix_millis(local_trunc) - tz_offset_secs * 1000)


def date_bin(stride_ms: int, ts: ColumnOrName, origin_ms: int = 0) -> Column:
    """DataFusion ``date_bin(stride, ts, origin)`` on millisecond epochs."""
    ms = F.unix_millis(_col(ts))
    binned = F.floor((ms - F.lit(origin_ms)) / stride_ms) * stride_ms + origin_ms
    return F.timestamp_millis(binned.cast("long"))


def time_bucket_sql(ts_sql: str, period: str) -> str:
    """DuckDB-SQL rendering of sub-day ``time_bucket`` — used to build the
    oracle side of correctness checks with identical integer math."""
    unit, n = parse_period(period)
    if unit not in _SUBDAY_SECONDS:
        raise ValueError("oracle rendering only for sub-day periods")
    stride = n * _SUBDAY_SECONDS[unit] * 1000
    return (
        f"make_timestamp(CAST(floor(epoch_ms({ts_sql}) / {stride}) AS BIGINT)"
        f" * {stride} * 1000)"
    )


def date_bin_sql(stride_ms: int, ts_sql: str, origin_ms: int = 0) -> str:
    """DuckDB-SQL rendering of ``date_bin`` with identical integer math."""
    return (
        f"make_timestamp((CAST(floor((epoch_ms({ts_sql}) - {origin_ms}) / {stride_ms})"
        f" AS BIGINT) * {stride_ms} + {origin_ms}) * 1000)"
    )
