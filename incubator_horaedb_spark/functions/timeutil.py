"""Exact datetime → epoch-milliseconds conversion.

``int(dt.timestamp() * 1000)`` is WRONG for sub-second timestamps: the
float product ``1.001 * 1000`` is ``1000.9999999999999`` and ``int()``
truncates it to 1000 (the round-5 LTTB property-test red).  ``timedelta``
stores days/seconds/microseconds as exact integers, and floor-dividing one
timedelta by another is pure integer arithmetic — no float ever appears.
"""

from __future__ import annotations

import datetime

_EPOCH_NAIVE = datetime.datetime(1970, 1, 1)
_EPOCH_UTC = datetime.datetime(1970, 1, 1, tzinfo=datetime.timezone.utc)
_MS = datetime.timedelta(milliseconds=1)
_US = datetime.timedelta(microseconds=1)


def epoch_ms(dt: datetime.datetime) -> int:
    """Milliseconds since the Unix epoch, exact integer arithmetic.

    Naive datetimes are treated as UTC (the convention for every engine
    surface here: DuckDB result sets, Spark collect() under UTC session
    timezone, parsed wire-protocol literals).
    """
    epoch = _EPOCH_NAIVE if dt.tzinfo is None else _EPOCH_UTC
    return (dt - epoch) // _MS


def epoch_us(dt: datetime.datetime) -> int:
    """Microseconds since the Unix epoch, exact integer arithmetic
    (same naive-as-UTC convention as :func:`epoch_ms`)."""
    epoch = _EPOCH_NAIVE if dt.tzinfo is None else _EPOCH_UTC
    return (dt - epoch) // _US
