"""End-to-end PROTOCOL-WRITE correctness (VERDICT r08 next-round #4).

The InfluxDB line-protocol and OpenTSDB /api/put ingest paths were
pytest-green over real sockets, but no oracle-gated query's fixture ever
flowed through an HTTP write endpoint — the streaming_e2e gates cover
`foreachBatch` ingest, not the protocol parsers.  These two queries close
that: the fixture is produced by POSTing a deterministic subset of the
events table to the ENGINE'S OWN HTTP server (server.py, the http.rs
analogue — /influxdb/v1/write per http.rs:377-399, /opentsdb/api/put per
http.rs:426-461), exactly as an external collector would, and the read
side aggregates the table the server wrote.  The DuckDB oracle states the
same aggregate over the RAW events table, so a value lost, duplicated, or
corrupted anywhere in client rendering → HTTP framing → protocol parse →
auto-create/evolve → segment write → dedup-on-read shows up as a hash
mismatch.

Scale shape: the HTTP client role is inherently driver-side (it composes
request bodies), so the fixture subset is bounded (~1/20 of one event
type; ≈36k rows at sf1, chunked POSTs) — the at-scale ingest path for
unbounded streams is streaming/ingest.py, already gated by the
streaming_e2e family.  The READ side is the standard distributed
dedup-view plan.
"""

from __future__ import annotations

import json

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from incubator_horaedb_spark.functions.detfloat import dyadic_sql, r_out_sql
from incubator_horaedb_spark.querybank.registry import (
    _ts_read_confs,
    load,
    register,
)
from incubator_horaedb_spark.querybank.streaming_e2e import _new_store

# deterministic, oracle-expressible subsets (different family per protocol)
_INFLUX_PRED = "event_type = 'click' AND (user_id % 7) = 0"
_TSDB_PRED = "event_type = 'error' AND (user_id % 9) = 0"
_PROM_PRED = "event_type = 'view' AND (user_id % 11) = 0"
_CHUNK = 8192  # lines / datapoints / series per POST

_STATE: dict = {"influx": {"sf_dir": None, "table": None, "store": None},
                "tsdb": {"sf_dir": None, "table": None, "store": None},
                "prom": {"sf_dir": None, "table": None, "store": None}}


def _esc_tag(v: str) -> str:
    """Line-protocol tag-value escaping (backslash first, then the three
    structural characters) — the server's parser unescapes ``\\(.)``."""
    return (
        v.replace("\\", "\\\\").replace(",", "\\,").replace("=", "\\=").replace(" ", "\\ ")
    )


def _post_chunks(port: int, path: str, bodies: list[bytes], ctype: str,
                 ok_status: int = 204) -> None:
    import http.client

    conn = http.client.HTTPConnection("127.0.0.1", port, timeout=120)
    try:
        for body in bodies:
            conn.request("POST", path, body=body, headers={"Content-Type": ctype})
            resp = conn.getresponse()
            payload = resp.read()
            if resp.status != ok_status:
                raise RuntimeError(f"write failed {resp.status}: {payload[:200]!r}")
    finally:
        conn.close()


def _create_table_http(port: int, name: str) -> None:
    """Pre-create the target table over the server's own /sql route with
    TTL disabled — auto-create would apply the reference's 7-day default
    TTL (table_options.rs:60) and purge the 2024-dated fixture at read.
    Pre-creating with options is exactly what a reference user does before
    pointing a collector at the endpoint."""
    ddl = (
        f"CREATE TABLE IF NOT EXISTS {name} ("
        "event_id string TAG, event_type string TAG, props string TAG, "
        "value double, user_id bigint, ts timestamp NOT NULL, "
        "timestamp KEY(ts)) WITH (enable_ttl='false')"
    )
    _post_chunks(
        port, "/sql", [json.dumps({"query": ddl}).encode()],
        "application/json", ok_status=200,
    )


def _collect_subset(spark: SparkSession, sf_dir: str, pred: str) -> list:
    """The fixture rows: (us, event_id, event_type, props, user_id, value)."""
    df = load(spark, sf_dir, "events").filter(F.expr(pred))
    return df.select(
        F.unix_micros(F.col("ts")).alias("us"),
        "event_id", "event_type", "props", "user_id", "value",
    ).collect()


def _served_table(spark: SparkSession, sf_dir: str, kind: str):
    """Build (once per sf_dir) the HTTP-ingested table and return its
    Table handle.  A fresh EngineServer on an ephemeral port lives only
    for the duration of the POSTs."""
    from incubator_horaedb_spark.frontends.sql_shim import Engine
    from incubator_horaedb_spark.server import EngineServer
    from incubator_horaedb_spark.table import Table

    state = _STATE[kind]
    if state["sf_dir"] == sf_dir and state["table"] is not None:
        tbl = state["table"]
        if tbl.spark is spark:
            return tbl
    _ts_read_confs(spark)
    store = _new_store(f"sg_proto_{kind}_", state)
    engine = Engine(spark, store)
    srv = EngineServer(engine).start()
    try:
        name = {"influx": "ev_http", "tsdb": "ev_tsdb", "prom": "ev_prom"}[kind]
        _create_table_http(srv.port, name)
        if kind == "prom":
            from incubator_horaedb_spark.frontends.prompb import (
                encode_write_request,
                snappy_compress,
            )

            rows = _collect_subset(spark, sf_dir, _PROM_PRED)
            series = [
                {
                    "labels": {
                        "__name__": name,
                        "event_id": str(r.event_id),
                        "event_type": r.event_type,
                        "props": r.props,
                    },
                    "samples": [(r.us // 1000, r.value)],
                }
                for r in rows
            ]
            bodies = [
                snappy_compress(encode_write_request(series[i : i + _CHUNK]))
                for i in range(0, len(series), _CHUNK)
            ]
            _post_chunks(
                srv.port, "/prom/v1/write", bodies, "application/x-protobuf"
            )
        elif kind == "influx":
            rows = _collect_subset(spark, sf_dir, _INFLUX_PRED)
            lines = [
                (
                    f"{name},event_id={r.event_id},event_type={_esc_tag(r.event_type)},"
                    f"props={_esc_tag(r.props)} "
                    f"value={r.value!r},user_id={r.user_id}i "
                    f"{r.us * 1000}"
                )
                for r in rows
            ]
            bodies = [
                "\n".join(lines[i : i + _CHUNK]).encode()
                for i in range(0, len(lines), _CHUNK)
            ]
            _post_chunks(srv.port, "/influxdb/v1/write", bodies, "text/plain")
        else:
            rows = _collect_subset(spark, sf_dir, _TSDB_PRED)
            dps = [
                {
                    "metric": name,
                    "timestamp": r.us // 1000,  # ms (11+ digits — no s upscale)
                    "value": r.value,
                    "tags": {
                        "event_id": str(r.event_id),
                        "event_type": r.event_type,
                        "props": r.props,
                    },
                }
                for r in rows
            ]
            bodies = [
                json.dumps(dps[i : i + _CHUNK]).encode()
                for i in range(0, len(dps), _CHUNK)
            ]
            _post_chunks(srv.port, "/opentsdb/api/put", bodies, "application/json")
    finally:
        srv.stop()
    tbl = Table(spark, engine.catalog, name)
    state["sf_dir"] = sf_dir
    state["table"] = tbl
    return tbl


def _quantized_sum(col: str):
    q = 1 << 20
    qv = F.floor(F.col(col) * F.lit(float(q)) + F.lit(0.5)).cast("double") / F.lit(
        float(q)
    )
    return (
        F.floor(F.sum(qv) * F.lit(1000000.0) + F.lit(0.5)).cast("double")
        / F.lit(1000000.0)
    )


_INFLUX_SQL = f"""
    SELECT CAST(count(*) AS BIGINT) AS n_rows,
           {r_out_sql("sum(" + dyadic_sql("value", 20) + ")", 6)} AS sum_value,
           CAST(count(DISTINCT user_id) AS BIGINT) AS n_users,
           CAST(min(epoch_ms(ts)) AS BIGINT) AS oldest_ms
    FROM events
    WHERE {_INFLUX_PRED}
    """


@register("influx_write_ingest_read", oracle=_INFLUX_SQL)
def influx_write_ingest_read(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Line-protocol write → read gate: clicks of every 7th user rendered
    as InfluxDB line protocol (ns timestamps, escaped tag values carrying
    the raw JSON props, an ``i``-suffixed integer field), POSTed to the
    engine's /influxdb/v1/write (http.rs:377-399 analogue), read back
    through the dedup view.  Counts catch dropped/duplicated lines, the
    quantized sum catches value corruption, the distinct-user count
    catches integer-field decode errors, and the oldest-ms catches
    ns→ms timestamp mishandling."""
    tbl = _served_table(spark, sf_dir, "influx")
    return tbl.read().select(
        F.count(F.lit(1)).cast("long").alias("n_rows"),
        _quantized_sum("value").alias("sum_value"),
        F.countDistinct("user_id").cast("long").alias("n_users"),
        F.min(F.unix_millis("ts")).cast("long").alias("oldest_ms"),
    )


_TSDB_SQL = f"""
    SELECT CAST(count(*) AS BIGINT) AS n_rows,
           {r_out_sql("sum(" + dyadic_sql("value", 20) + ")", 6)} AS sum_value,
           CAST(count(DISTINCT event_id) AS BIGINT) AS n_series,
           CAST(max(epoch_ms(ts)) AS BIGINT) AS newest_ms
    FROM events
    WHERE {_TSDB_PRED}
    """


_PROM_SQL = f"""
    SELECT CAST(count(*) AS BIGINT) AS n_rows,
           {r_out_sql("sum(" + dyadic_sql("value", 20) + ")", 6)} AS sum_value,
           CAST(count(DISTINCT event_id) AS BIGINT) AS n_series,
           CAST(min(epoch_ms(ts)) AS BIGINT) AS oldest_ms
    FROM events
    WHERE {_PROM_PRED}
    """


@register("prom_write_ingest_read", oracle=_PROM_SQL)
def prom_write_ingest_read(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Prometheus remote-write → read gate: views of every 11th user as
    snappy-compressed prompb WriteRequests (the hand-rolled varint/
    protobuf codec a real Prometheus speaks), POSTed to the engine's
    /prom/v1/write (http.rs:274-291 analogue), read back through the
    dedup view.  Doubles ride protobuf fixed64 — exact round-trip — so
    the quantized sum must match the raw source bit-for-bit."""
    tbl = _served_table(spark, sf_dir, "prom")
    return tbl.read().select(
        F.count(F.lit(1)).cast("long").alias("n_rows"),
        _quantized_sum("value").alias("sum_value"),
        F.countDistinct("event_id").cast("long").alias("n_series"),
        F.min(F.unix_millis("ts")).cast("long").alias("oldest_ms"),
    )


@register("opentsdb_put_ingest_read", oracle=_TSDB_SQL)
def opentsdb_put_ingest_read(spark: SparkSession, sf_dir: str) -> DataFrame:
    """OpenTSDB /api/put write → read gate: errors of every 9th user as
    JSON datapoints (ms timestamps, per-point tag maps), POSTed to the
    engine's /opentsdb/api/put (http.rs:426-461 analogue), read back
    through the dedup view.  The unique event_id tag makes the series
    key collision-free, so counts must equal the raw subset exactly."""
    tbl = _served_table(spark, sf_dir, "tsdb")
    return tbl.read().select(
        F.count(F.lit(1)).cast("long").alias("n_rows"),
        _quantized_sum("value").alias("sum_value"),
        F.countDistinct("event_id").cast("long").alias("n_series"),
        F.max(F.unix_millis("ts")).cast("long").alias("newest_ms"),
    )
