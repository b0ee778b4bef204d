"""Write-phase samplers: auto segment duration + auto primary key.

Port of src/analytic_engine/src/sampler.rs:

- DefaultSampler (:116-254): the first memtable samples written timestamps
  and picks a segment duration from the ladder {2h, 1d, 7d, 30d, 180d,
  360d} — here :func:`catalog.pick_segment_duration_ms` applied to the
  observed span.
- PrimaryKeySampler (:278-360): counts per-column distinct values during
  sampling and suggests the lowest-NDV key-capable columns (ascending by
  NDV, take N) as the primary-key prefix, then appends tsid and the
  timestamp column — an auto sort-key chooser.  Low-NDV-first ordering
  maximizes run-length locality in the sorted SSTs (the same reasoning as
  Z-order column choice).

Spark rendering: one single-pass aggregation of approx_count_distinct per
eligible column (HLL partials merge map-side — the DistinctCounter
analogue), then a driver-side sort.  At 100 TB you run this on a sample
partition, exactly like the reference samples only the first memtable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from incubator_horaedb_spark.catalog import pick_segment_duration_ms
from incubator_horaedb_spark.schema import TableSchema

# DatumKind::is_key_kind analogue — float/double cannot be keys
# (column_schema.rs:204-230 is_valid_tag_type shares the same exclusion).
_KEY_KINDS = {
    "string",
    "varbinary",
    "boolean",
    "timestamp",
    "date",
    "int64",
    "int32",
    "int16",
    "int8",
    "uint64",
    "uint32",
    "uint16",
    "uint8",
}


def suggest_primary_key(
    df: DataFrame, schema: TableSchema, max_suggest_num: int = 2
) -> list[str]:
    """PrimaryKeySampler::suggest (sampler.rs:339-360): lowest-NDV
    key-capable columns first (ties keep schema order — the reference's
    stable sort), then tsid (if present) and the timestamp key."""
    candidates = [
        c.name
        for c in schema.columns
        if c.kind in _KEY_KINDS
        and c.name != schema.timestamp_column
        and c.name != "tsid"
        and c.kind != "timestamp"
    ]
    if candidates:
        row = df.agg(
            *[F.approx_count_distinct(c).alias(c) for c in candidates]
        ).first()
        ranked = sorted(candidates, key=lambda c: (row[c], candidates.index(c)))
    else:
        ranked = []
    pk = ranked[:max_suggest_num]
    if any(c.name == "tsid" for c in schema.columns):
        pk.append("tsid")
    pk.append(schema.timestamp_column)
    return pk


def sample_segment_duration_ms(df: DataFrame, ts_col: str) -> int:
    """DefaultSampler analogue: observed timestamp span → ladder pick."""
    row = df.agg(
        F.min(F.unix_millis(F.col(ts_col))).alias("lo"),
        F.max(F.unix_millis(F.col(ts_col))).alias("hi"),
    ).first()
    if row["lo"] is None:
        return pick_segment_duration_ms(0)
    return pick_segment_duration_ms(int(row["hi"]) - int(row["lo"]))
