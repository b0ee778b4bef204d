"""HTTP protocol QUERY routes (server.py): GET /route/{table},
GET+POST /influxdb/v1/query (InfluxDB v1 response shape), and
POST /opentsdb/api/query (OpenTSDB response shape) — the read-side
counterparts of the write routes, mirroring http.rs:350-477.
"""

from __future__ import annotations

import json
import time
import urllib.parse
import urllib.request

import pytest

from incubator_horaedb_spark.frontends.sql_shim import Engine
from incubator_horaedb_spark.server import EngineServer


@pytest.fixture()
def server(spark, tmp_path):
    srv = EngineServer(Engine(spark, str(tmp_path / "store"))).start()
    yield srv
    srv.stop()


def _get(srv, path):
    with urllib.request.urlopen(f"http://127.0.0.1:{srv.port}{path}") as resp:
        return resp.status, json.loads(resp.read())


def _post(srv, path, payload, content_type="application/json"):
    data = payload if isinstance(payload, bytes) else json.dumps(payload).encode()
    req = urllib.request.Request(
        f"http://127.0.0.1:{srv.port}{path}",
        data=data,
        headers={"content-type": content_type},
    )
    with urllib.request.urlopen(req) as resp:
        body = resp.read()
        return resp.status, json.loads(body) if body else None


def _seed(srv, ts):
    lines = (
        f"cpu,host=a,region=east usage=1.5 {ts * 1_000_000}\n"
        f"cpu,host=a,region=east usage=2.5 {(ts + 60_000) * 1_000_000}\n"
        f"cpu,host=b,region=west usage=4.0 {(ts + 30_000) * 1_000_000}\n"
    )
    _post(srv, "/influxdb/v1/write", lines.encode(), content_type="text/plain")


def test_route_endpoint(server):
    status, body = _get(server, "/route/nope")
    assert status == 200 and body == {"routes": []}
    ts = int(time.time()) * 1000
    _seed(server, ts)
    status, body = _get(server, "/route/cpu")
    assert status == 200
    assert body["routes"][0]["table"] == "cpu"
    assert body["routes"][0]["endpoint"]["port"] == server.port


def test_influxql_query_route(server):
    ts = int(time.time()) * 1000
    _seed(server, ts)

    # SHOW MEASUREMENTS
    status, body = _get(server, "/influxdb/v1/query?q=" + urllib.parse.quote("SHOW MEASUREMENTS"))
    series = body["results"][0]["series"][0]
    assert series["name"] == "measurements" and ["cpu"] in series["values"]

    # raw select (GET)
    q = urllib.parse.quote("SELECT usage FROM cpu WHERE host = 'a'")
    status, body = _get(server, f"/influxdb/v1/query?q={q}")
    s = body["results"][0]["series"][0]
    assert s["name"] == "cpu" and s["columns"] == ["time", "usage"]
    assert [v[1] for v in s["values"]] == [1.5, 2.5]
    assert s["values"][0][0] == ts  # ms epoch like Datum serialization

    # grouped aggregate (POST form body) → one series per tag combination
    q = "SELECT mean(usage) FROM cpu GROUP BY time(1m), host"
    status, body = _post(
        server,
        "/influxdb/v1/query",
        urllib.parse.urlencode({"q": q}).encode(),
        content_type="application/x-www-form-urlencoded",
    )
    series = body["results"][0]["series"]
    by_host = {s["tags"]["host"]: s for s in series}
    assert set(by_host) == {"a", "b"}
    assert by_host["a"]["columns"] == ["time", "mean_usage"]
    assert {v[1] for v in by_host["a"]["values"]} == {1.5, 2.5}


def test_influxql_show_tag_and_field_keys(server):
    ts = int(time.time()) * 1000
    _seed(server, ts)

    q = urllib.parse.quote("SHOW TAG KEYS FROM cpu")
    status, body = _get(server, f"/influxdb/v1/query?q={q}")
    s = body["results"][0]["series"][0]
    assert s["name"] == "cpu" and s["columns"] == ["tagKey"]
    assert sorted(v[0] for v in s["values"]) == ["host", "region"]

    q = urllib.parse.quote("SHOW FIELD KEYS FROM cpu")
    status, body = _get(server, f"/influxdb/v1/query?q={q}")
    s = body["results"][0]["series"][0]
    assert s["columns"] == ["fieldKey", "fieldType"]
    assert ["usage", "float"] in s["values"]
    # timestamp column is neither a tag key nor a field key
    assert all(v[0] not in ("time", "ts", "timestamp") for v in s["values"])

    # measurement-less form lists keys for every measurement
    q = urllib.parse.quote("SHOW TAG KEYS")
    status, body = _get(server, f"/influxdb/v1/query?q={q}")
    assert any(s["name"] == "cpu" for s in body["results"][0]["series"])


def test_opentsdb_query_route(server):
    ts = int(time.time()) * 1000
    points = [
        {"metric": "sys.cpu", "timestamp": ts, "value": 1.0, "tags": {"host": "a"}},
        {"metric": "sys.cpu", "timestamp": ts + 60_000, "value": 3.0, "tags": {"host": "a"}},
        {"metric": "sys.cpu", "timestamp": ts, "value": 10.0, "tags": {"host": "b"}},
    ]
    assert _post(server, "/opentsdb/api/put", points)[0] == 204

    # grouped sum per host (filter with groupBy)
    req = {
        "start": ts - 1000,
        "end": ts + 120_000,
        "queries": [
            {
                "metric": "sys.cpu",
                "aggregator": "sum",
                "filters": [
                    {"type": "literal_or", "tagk": "host", "filter": "a|b", "groupBy": True}
                ],
            }
        ],
    }
    status, body = _post(server, "/opentsdb/api/query", req)
    assert status == 200
    by_host = {s["tags"]["host"]: s for s in body}
    assert set(by_host) == {"a", "b"}
    assert by_host["a"]["metric"] == "sys.cpu"
    assert by_host["a"]["dps"] == {str(ts): 1.0, str(ts + 60_000): 3.0}
    assert by_host["b"]["dps"] == {str(ts): 10.0}

    # aggregated (no groupBy): single series, host in aggregatedTags
    req["queries"][0]["filters"][0]["groupBy"] = False
    status, body = _post(server, "/opentsdb/api/query", req)
    assert len(body) == 1
    assert body[0]["tags"] == {} and body[0]["aggregatedTags"] == ["host"]
    assert body[0]["dps"] == {str(ts): 11.0, str(ts + 60_000): 3.0}
