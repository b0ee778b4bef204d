"""Prometheus remote write / remote read.

- Remote write (route http.rs:274-281; proxy handlers): protobuf
  WriteRequest timeseries → rows.  Here the post-protobuf dict form is
  accepted: ``{"labels": {"__name__": metric, ...tags}, "samples":
  [(ts_ms, value), ...]}`` — the ``__name__`` label selects the table,
  other labels are TAG columns, samples become (ts, value) rows.
- Remote read (src/query_frontend/src/promql/remote.rs:60-160): only
  selector + matchers + time range are evaluated; **no alignment** — the
  reference leaves range evaluation to Prometheus itself
  (convert.rs:190-194), so the plan is scan → tag filter → time filter →
  sort, returning raw samples grouped into series.
"""

from __future__ import annotations

from typing import Any

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from incubator_horaedb_spark.frontends.promql import LabelMatcher, matcher_to_column

NAME_LABEL = "__name__"


def parse_remote_write_typed(payload: list[dict[str, Any]]):
    """Timeseries list → metric → ProtocolBatch (ts ms + value + tag
    columns).  Every non-``__name__`` label is a tag by the protocol's own
    definition, tracked explicitly so heterogeneous batches (a label absent
    from the first series) still classify correctly."""
    from incubator_horaedb_spark.frontends.influxql import ProtocolBatch

    out: dict[str, ProtocolBatch] = {}
    for series in payload:
        labels = dict(series["labels"])
        metric = labels.pop(NAME_LABEL)
        batch = out.setdefault(metric, ProtocolBatch())
        batch.tag_keys |= set(labels)
        for ts_ms, value in series["samples"]:
            batch.rows.append({"ts": int(ts_ms), "value": float(value), **labels})
    return out


def parse_remote_write(payload: list[dict[str, Any]]) -> dict[str, list[dict[str, Any]]]:
    """Flat rendering of :func:`parse_remote_write_typed`."""
    return {m: b.rows for m, b in parse_remote_write_typed(payload).items()}


def remote_read_df(
    table: DataFrame,
    matchers: list[LabelMatcher] | list[tuple[str, str, str]],
    start_ms: int,
    end_ms: int,
    *,
    ts_col: str = "ts",
    value_col: str = "value",
    tag_cols: list[str] | None = None,
) -> DataFrame:
    """remote_query_to_plan (remote.rs:60-160): selector-only read."""
    tags = tag_cols or [
        f.name
        for f in table.schema.fields
        if f.dataType.typeName() == "string" and f.name != ts_col
    ]
    df = table
    for m in matchers:
        if isinstance(m, tuple):
            m = LabelMatcher(name=m[0], op=m[1], value=m[2])
        if m.name not in tags:
            raise ValueError(f"unknown label {m.name!r}")
        df = df.filter(matcher_to_column(m))
    ms = F.unix_millis(F.col(ts_col))
    df = df.filter((ms >= start_ms) & (ms <= end_ms))
    return df.select(*tags, F.col(ts_col), F.col(value_col)).orderBy(*tags, ts_col)


def to_remote_read_response(df: DataFrame, ts_col: str = "ts", value_col: str = "value") -> list[dict]:
    """Group rows into the remote-read response shape: one entry per label
    set with its ordered samples (the proxy response encoder analogue)."""
    tags = [c for c in df.columns if c not in (ts_col, value_col)]
    grouped = (
        df.groupBy(*tags)
        .agg(
            F.sort_array(
                F.collect_list(F.struct(F.unix_millis(ts_col).alias("t"), F.col(value_col).alias("v")))
            ).alias("samples")
        )
        .collect()
    )
    return [
        {
            "labels": {t: r[t] for t in tags},
            "samples": [(s["t"], s["v"]) for s in r["samples"]],
        }
        for r in grouped
    ]
