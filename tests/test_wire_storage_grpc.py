"""gRPC storage-service surface: codec round-trips and an end-to-end
write → sql_query → route sequence over the framed TCP transport — the
shape of the reference's grpc integration usage (storage_service/mod.rs;
write path proxy/src/write.rs, query path proxy/src/grpc/sql_query.rs)."""

from __future__ import annotations

import time

import pytest

from incubator_horaedb_spark.frontends.sql_shim import Engine
from incubator_horaedb_spark.wire import storage_grpc as sg


# ------------------------------------------------------------------ codec --


def test_value_roundtrip_all_variants():
    cases = [
        ("float64_value", 3.25),
        ("string_value", "héllo"),
        ("int64_value", -(2**62)),
        ("float32_value", 1.5),
        ("int32_value", -7),
        ("int16_value", -300),
        ("int8_value", -3),
        ("bool_value", True),
        ("uint64_value", 2**63 + 11),
        ("uint32_value", 2**31),
        ("uint16_value", 65535),
        ("uint8_value", 255),
        ("timestamp_value", 1683280523000),
        ("varbinary_value", b"\x00\x01\xff"),
    ]
    for variant, v in cases:
        got_variant, got = sg.dec_value(sg.enc_value(variant, v))
        assert got_variant == variant
        assert got == v


def test_write_request_roundtrip_negative_timestamp():
    req = {
        "table": "demo",
        "tag_names": ["host", "dc"],
        "field_names": ["value", "note"],
        "entries": [
            {
                "tags": [(0, "string_value", "web01"), (1, "string_value", "us-east")],
                "field_groups": [
                    {
                        "timestamp": -1,  # pre-epoch: int64 sign handling
                        "fields": [(0, "float64_value", 0.5), (1, "string_value", "x")],
                    },
                    {"timestamp": 1683280523000, "fields": [(0, "float64_value", 1.5)]},
                ],
            }
        ],
    }
    buf = sg.enc_write_request("public", [req])
    dec = sg.dec_write_request(buf)
    assert dec["context"]["database"] == "public"
    tr = dec["table_requests"][0]
    assert tr["table"] == "demo"
    assert tr["tag_names"] == ["host", "dc"]
    assert tr["field_names"] == ["value", "note"]
    fgs = tr["entries"][0]["field_groups"]
    assert fgs[0]["timestamp"] == -1
    assert fgs[1]["timestamp"] == 1683280523000
    assert fgs[0]["fields"][1]["value"] == ("string_value", "x")
    assert tr["entries"][0]["tags"][0]["value"] == ("string_value", "web01")


def test_sql_query_and_route_roundtrip():
    buf = sg.enc_sql_query_request("public", "select 1", ["demo"])
    dec = sg.dec_sql_query_request(buf)
    assert dec == {"context": {"database": "public"}, "tables": ["demo"], "sql": "select 1"}

    rr = sg.dec_route_response(
        sg.enc_route_response(sg.OK, "", [("demo", "127.0.0.1", 8831)])
    )
    assert rr["header"]["code"] == sg.OK
    assert rr["routes"][0]["table"] == "demo"
    assert rr["routes"][0]["endpoint"] == {"ip": "127.0.0.1", "port": 8831}


def test_grpc_frame_roundtrip():
    msg = b"payload-bytes"
    assert sg.unframe(sg.frame(msg)) == msg
    with pytest.raises(ValueError):
        sg.unframe(b"\x01\x00\x00\x00\x01x")  # compressed flag unsupported


# ------------------------------------------------------------ end-to-end --


@pytest.fixture()
def storage_server(spark, tmp_path):
    engine = Engine(spark, str(tmp_path / "store"))
    srv = sg.FramedStorageServer(engine).start()
    yield srv
    srv.stop()


def test_storage_service_write_query_route(storage_server):
    c = sg.FramedStorageClient(storage_server.port)
    # recent timestamps: gRPC auto-created tables carry the reference's
    # default options, including enable_ttl with ttl=7d (table_options.rs:60)
    t0 = int(time.time() * 1000) - 60_000

    # write: auto-creates the table with ts column "timestamp"
    # (TIMESTAMP_COLUMN_NAME, sys_catalog_table.rs:232)
    wreq = sg.enc_write_request(
        "public",
        [
            {
                "table": "cpu",
                "tag_names": ["host"],
                "field_names": ["usage"],
                "entries": [
                    {
                        "tags": [(0, "string_value", "web01")],
                        "field_groups": [
                            {"timestamp": t0, "fields": [(0, "float64_value", 0.5)]},
                            {"timestamp": t0 + 1000, "fields": [(0, "float64_value", 0.7)]},
                        ],
                    },
                    {
                        "tags": [(0, "string_value", "web02")],
                        "field_groups": [
                            {"timestamp": t0, "fields": [(0, "float64_value", 0.9)]},
                        ],
                    },
                ],
            }
        ],
    )
    wresp = sg.dec_write_response(c.call("Write", wreq))
    assert wresp["header"]["code"] == sg.OK, wresp
    assert wresp["success"] == 3

    # query: arrow payload output
    qresp = sg.dec_sql_query_response(
        c.call(
            "SqlQuery",
            sg.enc_sql_query_request(
                "public", "select host, usage from cpu order by timestamp, host"
            ),
        )
    )
    assert qresp["header"]["code"] == sg.OK, qresp
    tbl = sg.payload_to_table(qresp["arrow"])
    assert tbl.column("host").to_pylist() == ["web01", "web02", "web01"]
    assert tbl.column("usage").to_pylist() == [0.5, 0.9, 0.7]

    # affected-rows output arm (sql_query.rs Output::AffectedRows)
    ins = sg.dec_sql_query_response(
        c.call(
            "SqlQuery",
            sg.enc_sql_query_request(
                "public",
                f"insert into cpu (host, usage, timestamp) values ('web03', 0.1, {t0 + 2000})",
            ),
        )
    )
    assert ins["affected_rows"] == 1

    # route: standalone → the serving endpoint itself (grpc/route.rs)
    rresp = sg.dec_route_response(
        c.call("Route", sg.enc_route_request("public", ["cpu", "missing"]))
    )
    assert rresp["header"]["code"] == sg.OK
    assert [r["table"] for r in rresp["routes"]] == ["cpu", "missing"]
    assert rresp["routes"][0]["endpoint"]["port"] == storage_server.port
    c.close()


def test_storage_service_errors(storage_server):
    c = sg.FramedStorageClient(storage_server.port)
    # missing database context → "Database is not set" (sql_query.rs:84-89)
    resp = sg.dec_sql_query_response(
        c.call("SqlQuery", sg.enc_sql_query_request("", "select 1"))
    )
    assert resp["header"]["code"] != sg.OK
    assert "Database is not set" in resp["header"]["error"]
    # errors append " sql:<sql>" like the reference's handler
    bad = sg.dec_sql_query_response(
        c.call("SqlQuery", sg.enc_sql_query_request("public", "select * from nope"))
    )
    assert bad["header"]["code"] != sg.OK
    assert "sql:select * from nope" in bad["header"]["error"]
    c.close()


def test_write_respects_existing_timestamp_column(storage_server):
    """Writing into a SQL-created table maps field_group timestamps onto
    that table's own timestamp key column, not the gRPC default name."""
    eng = storage_server.service.engine
    eng.execute_sql(
        "CREATE TABLE sensors(`site` string TAG, `temp` double, `t` timestamp NOT NULL, "
        "timestamp KEY(t)) ENGINE = Analytic WITH (enable_ttl='false')"
    )
    c = sg.FramedStorageClient(storage_server.port)
    wresp = sg.dec_write_response(
        c.call(
            "Write",
            sg.enc_write_request(
                "public",
                [
                    {
                        "table": "sensors",
                        "tag_names": ["site"],
                        "field_names": ["temp"],
                        "entries": [
                            {
                                "tags": [(0, "string_value", "lab")],
                                "field_groups": [
                                    {
                                        "timestamp": 1683280523000,
                                        "fields": [(0, "float64_value", 21.5)],
                                    }
                                ],
                            }
                        ],
                    }
                ],
            ),
        )
    )
    assert wresp["header"]["code"] == sg.OK and wresp["success"] == 1
    q = sg.dec_sql_query_response(
        c.call("SqlQuery", sg.enc_sql_query_request("public", "select site, temp, t from sensors"))
    )
    tbl = sg.payload_to_table(q["arrow"])
    assert tbl.column("site").to_pylist() == ["lab"]
    assert tbl.column("temp").to_pylist() == [21.5]
    c.close()
