"""TSDB table schema model.

Port of the reference's schema system (src/common_types/src/schema.rs,
column_schema.rs):

- every table has exactly one timestamp key column (schema.rs:628-637);
- columns may be TAG (series identity, column_schema.rs:189-191) or
  dictionary-encoded hints;
- the primary key is an explicit column prefix, or auto "(tsid, ts)" with a
  hidden tsid column hashed from the tags (schema.rs:143,226;
  planner.rs:651-659);
- tag types are restricted (no float/double, column_schema.rs:204-230);
- schemas carry a version bumped by ALTER (schema.rs:654); the primary key
  cannot change (plan.rs:55-56).

Type mapping (datum.rs:132-150 → Spark, SURVEY §1.2): unsigned ints widen
(u8→int, u16→int, u32→bigint, u64→bigint with documented overflow caveat);
Time becomes ns-since-midnight bigint; timestamps are millisecond-semantics
stored as Spark TimestampType.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any

from pyspark.sql import types as T

TSID_COLUMN = "tsid"  # schema.rs:226
SEQ_COLUMN = "__seq"  # write sequence, the Spark rendering of SequenceNumber
SEGMENT_COLUMN = "__segment"  # time-partition column (segment_duration bucket)

# HoraeDB type name → (Spark type, canonical name)
_TYPE_MAP: dict[str, T.DataType] = {
    "timestamp": T.TimestampType(),
    "double": T.DoubleType(),
    "float": T.FloatType(),
    "varbinary": T.BinaryType(),
    "string": T.StringType(),
    "uint64": T.LongType(),
    "uint32": T.LongType(),
    "uint16": T.IntegerType(),
    "uint8": T.IntegerType(),
    "int64": T.LongType(),
    "bigint": T.LongType(),
    "int32": T.IntegerType(),
    "int": T.IntegerType(),
    "int16": T.ShortType(),
    "smallint": T.ShortType(),
    "int8": T.ByteType(),
    "tinyint": T.ByteType(),
    "boolean": T.BooleanType(),
    "date": T.DateType(),
    "time": T.LongType(),
}

# is_valid_tag_type (column_schema.rs:204-230): everything except float/double
_INVALID_TAG_TYPES = {"double", "float"}


class SchemaError(ValueError):
    pass


@dataclass
class ColumnSchema:
    name: str
    kind: str  # lowercase HoraeDB type name
    is_tag: bool = False
    is_nullable: bool = True
    is_dictionary: bool = False
    comment: str = ""
    default_value: Any = None

    def __post_init__(self):
        if self.kind not in _TYPE_MAP:
            raise SchemaError(f"unsupported type {self.kind!r} for column {self.name!r}")
        if self.is_tag and self.kind in _INVALID_TAG_TYPES:
            raise SchemaError(f"invalid tag type {self.kind!r} for column {self.name!r}")
        if self.is_dictionary and self.kind != "string":
            # column_schema.rs:226-229 is_valid_dictionary_type: String only
            raise SchemaError(
                f"invalid dictionary type {self.kind!r} for column {self.name!r}"
            )

    @property
    def spark_type(self) -> T.DataType:
        return _TYPE_MAP[self.kind]

    def to_dict(self) -> dict:
        return {
            "name": self.name,
            "kind": self.kind,
            "is_tag": self.is_tag,
            "is_nullable": self.is_nullable,
            "is_dictionary": self.is_dictionary,
            "comment": self.comment,
            "default_value": self.default_value,
        }

    @classmethod
    def from_dict(cls, d: dict) -> "ColumnSchema":
        return cls(**d)


@dataclass
class TableSchema:
    columns: list[ColumnSchema]
    timestamp_column: str
    primary_key: list[str] = field(default_factory=list)  # includes ts col; auto mode if empty
    version: int = 1

    def __post_init__(self):
        names = [c.name for c in self.columns]
        if len(set(names)) != len(names):
            raise SchemaError("duplicate column names")
        if self.timestamp_column not in names:
            raise SchemaError(
                f"timestamp key column {self.timestamp_column!r} not in schema"
            )  # find_and_ensure_timestamp_column, planner.rs:729
        ts = self.column(self.timestamp_column)
        if ts.kind != "timestamp":
            raise SchemaError(f"timestamp key column must be timestamp, got {ts.kind!r}")
        if self.primary_key:
            for pk in self.primary_key:
                if pk not in names:
                    raise SchemaError(f"primary key column {pk!r} not in schema")
            if self.timestamp_column not in self.primary_key:
                raise SchemaError("primary key must include the timestamp key column")

    def column(self, name: str) -> ColumnSchema:
        for c in self.columns:
            if c.name == name:
                return c
        raise SchemaError(f"no such column {name!r}")

    @property
    def tsid_mode(self) -> bool:
        """Auto primary key: hidden tsid + timestamp (planner.rs:651-659)."""
        return not self.primary_key

    @property
    def effective_primary_key(self) -> list[str]:
        return self.primary_key if self.primary_key else [TSID_COLUMN, self.timestamp_column]

    @property
    def tag_columns(self) -> list[str]:
        return [c.name for c in self.columns if c.is_tag]

    def spark_schema(self, include_internal: bool = False) -> T.StructType:
        fields = [
            T.StructField(c.name, c.spark_type, c.is_nullable) for c in self.columns
        ]
        if include_internal:
            if self.tsid_mode:
                fields.append(T.StructField(TSID_COLUMN, T.LongType(), False))
            fields.append(T.StructField(SEQ_COLUMN, T.LongType(), False))
        return T.StructType(fields)

    def add_column(self, col: ColumnSchema) -> "TableSchema":
        """ALTER TABLE ADD COLUMN: bump version (alter_table.rs); the new
        column must be nullable so old segments read as NULL."""
        if any(c.name == col.name for c in self.columns):
            raise SchemaError(f"column {col.name!r} already exists")
        if not col.is_nullable:
            raise SchemaError("added columns must be nullable")
        return TableSchema(
            columns=self.columns + [col],
            timestamp_column=self.timestamp_column,
            primary_key=list(self.primary_key),
            version=self.version + 1,
        )

    def to_dict(self) -> dict:
        return {
            "columns": [c.to_dict() for c in self.columns],
            "timestamp_column": self.timestamp_column,
            "primary_key": list(self.primary_key),
            "version": self.version,
        }

    @classmethod
    def from_dict(cls, d: dict) -> "TableSchema":
        return cls(
            columns=[ColumnSchema.from_dict(c) for c in d["columns"]],
            timestamp_column=d["timestamp_column"],
            primary_key=list(d.get("primary_key", [])),
            version=d.get("version", 1),
        )
