"""OpenTSDB query frontend.

Port of src/query_frontend/src/opentsdb/mod.rs:203-230 (`opentsdb_query_to_plan`):
each sub-query becomes  scan → filter(tags + time range) → sort(ts) →
optional aggregate(group-by tags + downsample bucket).  Filter types
``literal_or`` / ``not_literal_or`` become IN / NOT IN (mod.rs:103-116);
aggregators sum/count/avg/min/max/dev/none map to Spark aggregates with
``dev`` = sample stddev (mod.rs:121-134).  Multiple sub-queries are
independent plans (merged by the response encoder, not the engine).

The write side (/api/put JSON datapoints → rows,
src/proxy/src/opentsdb/types.rs) is `parse_put` below.
"""

from __future__ import annotations

import json
from dataclasses import dataclass, field
from typing import Any

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from incubator_horaedb_spark.functions.time_bucket import date_bin

_AGGREGATORS = {
    "sum": F.sum,
    "count": lambda c: F.count(c),
    "avg": F.avg,
    "min": F.min,
    "max": F.max,
    "dev": F.stddev_samp,
}


@dataclass
class OpenTsdbFilter:
    type: str  # literal_or | not_literal_or | iliteral_or | not_iliteral_or
    #           | wildcard | iwildcard | regexp (OpenTSDB 2.x filter set;
    #           the reference exposes only the literal forms, mod.rs:103-116)
    tagk: str
    filter: str  # pipe-separated values, or a *-glob, or a regex

    def to_column(self) -> Column:
        col = F.col(self.tagk)
        kind = self.type.lower()
        if kind in ("literal_or", "not_literal_or", "iliteral_or", "not_iliteral_or"):
            values = self.filter.split("|")
            if kind.endswith("iliteral_or"):
                col = F.lower(col)
                values = [v.lower() for v in values]
            cond = col.isin(values)
            return ~cond if kind.startswith("not_") else cond
        if kind in ("wildcard", "iwildcard"):
            # OpenTSDB glob: '*' matches anything; translate to SQL LIKE
            # with LIKE's own metacharacters escaped (a literal % or _ in
            # a tag value must not act as a wildcard)
            pat = (
                self.filter.replace("\\", "\\\\")
                .replace("%", "\\%")
                .replace("_", "\\_")
                .replace("*", "%")
            )
            if kind == "iwildcard":
                return F.lower(col).like(pat.lower())
            return col.like(pat)
        if kind == "regexp":
            # OpenTSDB uses Java Pattern.matches (FULL match) — anchor
            return col.rlike(f"^(?:{self.filter})$")
        raise ValueError(f"unsupported filter type {self.type!r}")


@dataclass
class OpenTsdbSubQuery:
    metric: str
    aggregator: str = "none"
    downsample_ms: int | None = None  # e.g. 60000 for "1m-avg"
    downsample_agg: str = "avg"
    filters: list[OpenTsdbFilter] = field(default_factory=list)
    group_by_tags: list[str] = field(default_factory=list)
    rate: bool = False  # OpenTSDB "rate" option: per-series delta/second


@dataclass
class OpenTsdbQueryRequest:
    start_ms: int
    end_ms: int
    queries: list[OpenTsdbSubQuery]


def subquery_to_df(
    table: DataFrame,
    req: OpenTsdbQueryRequest,
    sub: OpenTsdbSubQuery,
    *,
    ts_col: str = "ts",
    value_col: str = "value",
) -> DataFrame:
    """One sub-query → DataFrame (subquery_to_plan, opentsdb/mod.rs:137-200)."""
    ms = F.unix_millis(F.col(ts_col))
    df = table.filter((ms >= req.start_ms) & (ms <= req.end_ms))
    for flt in sub.filters:
        df = df.filter(flt.to_column())

    if sub.aggregator == "none":
        if sub.rate:
            # raw-sample rate needs a per-source-series identity this
            # engine derives from group_by tags; refuse loudly rather
            # than return unrated samples
            raise ValueError(
                "rate with aggregator 'none' is not supported — use an "
                "aggregator with groupBy tag filters (rate applies per "
                "grouped series after downsampling)"
            )
        # default_sort_exprs (mod.rs:163-166): plain time-ordered samples.
        return df.orderBy(ts_col)

    agg_fn = _AGGREGATORS[sub.aggregator]
    group_cols: list[Column] = [F.col(t) for t in sub.group_by_tags]
    if sub.downsample_ms:
        group_cols.append(date_bin(sub.downsample_ms, ts_col).alias(ts_col))
    else:
        group_cols.append(F.col(ts_col))
    out = (
        df.groupBy(*group_cols)
        .agg(agg_fn(value_col).alias(value_col))
    )
    if sub.rate:
        # OpenTSDB `rate` option.  The reference PARSES `rate: bool` on
        # its SubQuery (opentsdb/types.rs:38) but never uses it in
        # planning (subquery_to_plan, opentsdb/mod.rs:137-200 ignores
        # it), same as `msResolution` (types.rs:51-52, parsed-but-unused)
        # — so actually computing rate here goes beyond the reference:
        # per-series first difference per second over the downsampled
        # series — emitted from the second point, like OpenTSDB.  One
        # window sharing the series key; bucket timestamps are exact
        # integers.
        from pyspark.sql import Window

        w = Window.partitionBy(
            *[F.col(t) for t in sub.group_by_tags]
        ).orderBy(F.unix_millis(F.col(ts_col)))
        prev_v = F.lag(value_col).over(w)
        prev_ms = F.lag(F.unix_millis(F.col(ts_col))).over(w)
        out = (
            out.withColumn("__pv", prev_v)
            .withColumn("__pms", prev_ms)
            .filter(F.col("__pv").isNotNull())
            .withColumn(
                value_col,
                (F.col(value_col) - F.col("__pv"))
                / ((F.unix_millis(F.col(ts_col)) - F.col("__pms")) / F.lit(1000.0)),
            )
            .drop("__pv", "__pms")
        )
    return out.orderBy(ts_col)


def query_to_dfs(table: DataFrame, request: dict[str, Any] | OpenTsdbQueryRequest, **kw) -> list[DataFrame]:
    """Full /api/query request → list of DataFrames, one per sub-query."""
    if isinstance(request, dict):
        request = parse_query_request(request)
    return [subquery_to_df(table, request, sub, **kw) for sub in request.queries]


def parse_query_request(payload: dict[str, Any]) -> OpenTsdbQueryRequest:
    subs = []
    for q in payload.get("queries", []):
        ds_ms, ds_agg = None, "avg"
        if ds := q.get("downsample"):
            # "1m-avg" / "15m-sum"
            span, ds_agg = ds.split("-", 1)
            unit = span[-1]
            mult = {"s": 1000, "m": 60_000, "h": 3_600_000, "d": 86_400_000}[unit]
            ds_ms = int(span[:-1]) * mult
        subs.append(
            OpenTsdbSubQuery(
                metric=q["metric"],
                aggregator=q.get("aggregator", "none"),
                rate=bool(q.get("rate", False)),
                downsample_ms=ds_ms,
                downsample_agg=ds_agg,
                filters=[
                    OpenTsdbFilter(type=f["type"], tagk=f["tagk"], filter=f["filter"])
                    for f in q.get("filters", [])
                ]
                # legacy exact-match tag map (`"tags": {"location": "x"}`,
                # corpus env/local/opentsdb/basic.sql) — each entry is a
                # single-value literal_or filter (opentsdb/types.rs tags)
                + [
                    OpenTsdbFilter(type="literal_or", tagk=k, filter=str(v))
                    for k, v in q.get("tags", {}).items()
                ],
                group_by_tags=[f["tagk"] for f in q.get("filters", []) if f.get("groupBy")],
            )
        )
    return OpenTsdbQueryRequest(start_ms=payload["start"], end_ms=payload["end"], queries=subs)


def parse_put_typed(lines: str | list[dict[str, Any]]):
    """/api/put JSON datapoints → metric → ProtocolBatch
    (proxy/src/opentsdb/types.rs:1-573).

    Each row has ``ts`` (ms), ``value`` and one key per tag; tag keys are
    collected separately (unioned over the batch) because the datapoint
    format declares them explicitly — value-type inference would misread
    string fields as tags.  Timestamps in seconds (≤ 10 digits) are
    upscaled to ms, matching OpenTSDB convention.
    """
    from incubator_horaedb_spark.frontends.influxql import ProtocolBatch

    if isinstance(lines, str):
        payload = json.loads(lines)
        if isinstance(payload, dict):
            payload = [payload]
    else:
        payload = lines
    out: dict[str, ProtocolBatch] = {}
    for dp in payload:
        ts = int(dp["timestamp"])
        if ts < 10_000_000_000:  # seconds → ms
            ts *= 1000
        tags = dp.get("tags", {})
        row = {"ts": ts, "value": float(dp["value"]), **tags}
        batch = out.setdefault(dp["metric"], ProtocolBatch())
        batch.rows.append(row)
        batch.tag_keys |= set(tags)
    return out


def parse_put(lines: str | list[dict[str, Any]]):
    """Flat rendering of :func:`parse_put_typed` (metric → row dicts)."""
    return {m: b.rows for m, b in parse_put_typed(lines).items()}
