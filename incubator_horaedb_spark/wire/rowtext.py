"""Shared text-cell → typed-python parsing for the wire bulk loaders
(PG COPY FROM STDIN, MySQL LOAD DATA LOCAL INFILE).

Both protocols deliver rows as delimited text; the engine's
``Engine.insert_rows`` expects the INSERT path's python types
(timestamps as epoch-ms ints, doubles as floats, booleans as bools,
varbinary as bytes).  Keeping the conversion in one place keeps the two
loaders' type semantics identical.
"""

from __future__ import annotations

import re


def typed_cell(v: str | None, kind: str, col: str, lineno: int):
    """One text cell → the python value ``Engine.insert_rows`` expects for
    the column kind.  Timestamps accept integer epoch-ms or ISO datetimes
    (naive values read as UTC, matching the engine's session zone)."""
    if v is None:
        return None
    try:
        if kind == "timestamp":
            if re.fullmatch(r"[+-]?\d+", v):
                return int(v)
            import datetime

            from incubator_horaedb_spark.functions.timeutil import epoch_ms

            dt = datetime.datetime.fromisoformat(v)
            if dt.tzinfo is None:
                dt = dt.replace(tzinfo=datetime.timezone.utc)
            return epoch_ms(dt)
        if kind in ("double", "float"):
            return float(v)
        if kind == "boolean":
            low = v.strip().lower()
            if low in ("t", "true", "1", "y", "yes", "on"):
                return True
            if low in ("f", "false", "0", "n", "no", "off"):
                return False
            raise ValueError(f"bad boolean {v!r}")
        if kind == "varbinary":
            if v.startswith("\\x"):
                return bytes.fromhex(v[2:])
            return v.encode("utf-8")
        if kind == "string":
            return v
        return int(v)
    except ValueError as e:
        raise ValueError(f"line {lineno}, column {col}: {e}") from None
