"""Structured Streaming ingest: source → (auto-create / auto-evolve) →
sequenced append into the time-partitioned table.

The reference's high-rate write path is WAL → memtable → flush
(src/analytic_engine/src/instance/write.rs) with durable replay
(wal_replayer.rs); protocol writes auto-create tables and auto-add columns
from the payload (src/query_frontend/src/planner.rs:426
build_schema_from_write_table_request; src/proxy/src/write.rs:176-260).

Spark rendering:
- the checkpointed streaming query replaces the WAL (exactly-once
  micro-batch replay from the source);
- ``foreachBatch`` appends through Table.write, so every micro-batch gets
  one monotonic ``__seq`` — dedup order for Overwrite tables is total;
- auto-create infers the TSDB schema from the batch schema (strings →
  TAG, like the protocol writes); auto-evolve adds new nullable columns.

Late/out-of-order data needs no special handling: rows land in whichever
time segment their timestamp belongs to and the Overwrite dedup resolves
duplicates at read, matching the reference (merge.rs:126).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import types as T

from incubator_horaedb_spark.catalog import TableOptions
from incubator_horaedb_spark.frontends.sql_shim import Engine
from incubator_horaedb_spark.schema import ColumnSchema, TableSchema
from incubator_horaedb_spark.table import Table

_SPARK_TO_KIND = {
    "string": "string",
    "double": "double",
    "float": "float",
    "long": "int64",
    "bigint": "int64",
    "integer": "int32",
    "int": "int32",
    "short": "int16",
    "byte": "int8",
    "boolean": "boolean",
    "binary": "varbinary",
    "timestamp": "timestamp",
    "date": "date",
}


def infer_table_schema(
    df_schema: T.StructType, ts_col: str, tag_cols: list[str] | None = None
) -> TableSchema:
    """build_schema_from_write_table_request analogue (planner.rs:426):
    unspecified tag set → every string column is a TAG."""
    cols = []
    for f in df_schema.fields:
        kind = _SPARK_TO_KIND.get(f.dataType.typeName())
        if kind is None:
            raise ValueError(f"cannot ingest column {f.name!r} of type {f.dataType}")
        is_tag = f.name in tag_cols if tag_cols is not None else (
            kind == "string" and f.name != ts_col
        )
        cols.append(ColumnSchema(name=f.name, kind=kind, is_tag=is_tag))
    return TableSchema(columns=cols, timestamp_column=ts_col)


def ensure_table(
    engine: Engine,
    table_name: str,
    batch_df: DataFrame,
    ts_col: str,
    tag_cols: list[str] | None = None,
    options: TableOptions | None = None,
) -> None:
    """Auto-create or auto-evolve (write.rs:176-260, execute_add_columns_plan)."""
    if not engine.catalog.exists(table_name):
        schema = infer_table_schema(batch_df.schema, ts_col, tag_cols)
        engine.catalog.create_table(table_name, schema, options, if_not_exists=True)
        return
    meta = engine.catalog.get(table_name)
    known = {c.name for c in meta.schema.columns}
    schema = meta.schema
    for f in batch_df.schema.fields:
        if f.name not in known:
            kind = _SPARK_TO_KIND.get(f.dataType.typeName())
            if kind is None:
                raise ValueError(f"cannot evolve with column {f.name!r}: {f.dataType}")
            schema = schema.add_column(ColumnSchema(name=f.name, kind=kind, is_tag=False))
    if schema is not meta.schema:
        meta.schema = schema
        engine.catalog.update(meta)


def ingest_rows(
    engine: Engine,
    table_name: str,
    rows: list[dict],
    *,
    ts_col: str = "ts",
    options: TableOptions | None = None,
) -> int:
    """Write parsed protocol rows (ms-epoch ``ts``, tag strings, value
    fields) into ``table_name``, auto-creating/evolving first — the shared
    tail of every protocol write path (line protocol, OpenTSDB put, gRPC):
    proxy/src/write.rs:176-260.  Returns the row count."""
    from pyspark.sql import functions as F

    from incubator_horaedb_spark.table import Table

    cols: list[str] = []
    for r in rows:
        for k in r:
            if k not in cols:
                cols.append(k)
    data = [tuple(r.get(c) for c in cols) for r in rows]
    mdf = engine.spark.createDataFrame(data, cols)
    if ts_col in mdf.columns:
        mdf = mdf.withColumn(ts_col, F.timestamp_millis(F.col(ts_col).cast("long")))
    tag_cols = [c for c in cols if isinstance(rows[0].get(c), str)]
    ensure_table(engine, table_name, mdf, ts_col, tag_cols, options)
    Table(engine.spark, engine.catalog, table_name).write(mdf)
    return len(rows)


def start_ingest(
    engine: Engine,
    stream_df: DataFrame,
    table_name: str,
    *,
    ts_col: str,
    checkpoint_dir: str,
    tag_cols: list[str] | None = None,
    options: TableOptions | None = None,
    trigger_available_now: bool = True,
):
    """Start the checkpointed ingest query.  With availableNow the query
    drains the current source backlog and stops — the batch-maintenance
    pattern; pass False for a continuous micro-batch ingest."""

    def process(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        ensure_table(engine, table_name, batch_df, ts_col, tag_cols, options)
        Table(engine.spark, engine.catalog, table_name).write(batch_df)

    writer = stream_df.writeStream.foreachBatch(process).option(
        "checkpointLocation", checkpoint_dir
    )
    if trigger_available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def start_line_protocol_ingest(
    engine: Engine,
    stream_df: DataFrame,
    *,
    checkpoint_dir: str,
    line_col: str = "value",
    options: TableOptions | None = None,
    trigger_available_now: bool = True,
):
    """InfluxDB line-protocol write path as a streaming ingest
    (src/proxy/src/influxdb/types.rs:1-903: measurement → table, tags →
    TAG columns, fields → values, auto-create on first write).

    Each micro-batch's lines are parsed with
    :func:`frontends.influxql.parse_line_protocol` and appended to one
    table per measurement.  Row building happens on the driver — the same
    topology as the reference, whose proxy node builds rows before handing
    them to the insert interpreter (proxy/src/write.rs); micro-batches
    bound the driver memory.  A 100 TB deployment with a fixed measurement
    registry would move the parse into mapInPandas and keep everything
    else unchanged."""
    from pyspark.sql import functions as F  # noqa: F401  (parity with module style)

    from incubator_horaedb_spark.frontends.influxql import parse_line_protocol
    from incubator_horaedb_spark.table import Table

    def process(batch_df: DataFrame, batch_id: int) -> None:
        lines = [r[line_col] for r in batch_df.select(line_col).collect() if r[line_col]]
        if not lines:
            return
        for measurement, rows in parse_line_protocol("\n".join(lines)).items():
            ingest_rows(engine, measurement, rows, options=options)

    writer = stream_df.writeStream.foreachBatch(process).option(
        "checkpointLocation", checkpoint_dir
    )
    if trigger_available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
