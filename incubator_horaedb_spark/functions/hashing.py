"""Series-identity hashing: tsid, unique_id, PromQL regex match.

Reference semantics:
- ``tsid`` — on INSERT into a table with no explicit primary key, a hidden
  uint64 series id is computed as a deterministic hash of the non-null TAG
  values (src/interpreters/src/insert.rs:142-216, TsidBuilder).  The hash
  *value* is internal identity (never asserted in golden files), so we use
  Spark's built-in ``xxhash64`` over the tag columns — JVM-side, codegen'd.
- ``unique_id`` — recreates a 64-bit series id from group-by tag values
  after aggregation for PromAlign (src/query_frontend/src/promql/udf.rs:97-160).
  Same construction here.
- ``regex_match_expr`` — PromQL ``=~`` / ``!~`` label matching
  (promql/udf.rs:50-96) → ``col.rlike``.

Null handling matches the reference's "skip null tags" rule: nulls are
replaced by a sentinel so that (a, null) != (a, '') and hashing stays
deterministic.
"""

from __future__ import annotations

from typing import Sequence, Union

from pyspark.sql import Column
from pyspark.sql import functions as F

ColumnOrName = Union[Column, str]

_NULL_SENTINEL = "\x00__null__"


def _cols(cols: Sequence[ColumnOrName]) -> list[Column]:
    return [F.col(c) if isinstance(c, str) else c for c in cols]


def tsid_expr(tag_cols: Sequence[ColumnOrName]) -> Column:
    """Deterministic 64-bit series id from tag values (long).

    Tag order must be the schema order — the reference encodes
    (column_id, datum) pairs in schema order (insert.rs:179-216).
    """
    prepared = [
        F.coalesce(c.cast("string"), F.lit(_NULL_SENTINEL)) for c in _cols(tag_cols)
    ]
    return F.xxhash64(*prepared)


def unique_id(tag_cols: Sequence[ColumnOrName]) -> Column:
    """PromQL post-aggregation series id — same construction as tsid."""
    return tsid_expr(tag_cols)


def regex_match(col: ColumnOrName, pattern: str, negate: bool = False) -> Column:
    """PromQL ``=~`` (or ``!~`` with negate) label matcher."""
    c = F.col(col) if isinstance(col, str) else col
    matched = c.rlike(pattern)
    return ~matched if negate else matched
