"""Launch the engine's HTTP server (the reference's horaedb-server
analogue: SQL + protocol write routes over one engine instance).

    python tools/serve.py [--host 127.0.0.1] [--port 5440] \
        [--store /path/to/catalog] [--cpus N]

Routes: POST /sql, /influxdb/v1/write, /opentsdb/api/put,
/prom/v1/{write,read}; GET /health.  See incubator_horaedb_spark/server.py.
"""

from __future__ import annotations

import argparse
import sys

sys.path.insert(0, "/root/repo")


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--host", default="127.0.0.1")
    ap.add_argument("--port", type=int, default=5440)
    ap.add_argument("--store", default="./horaedb-store")
    ap.add_argument("--cpus", type=int, default=None)
    args = ap.parse_args()

    from incubator_horaedb_spark.frontends.sql_shim import Engine
    from incubator_horaedb_spark.server import EngineServer
    from incubator_horaedb_spark.session import get_spark

    spark = get_spark("horaedb-spark-server", cpus=args.cpus)
    engine = Engine(spark, args.store)
    srv = EngineServer(engine, host=args.host, port=args.port)
    print(f"serving on http://{args.host}:{srv.port} (store: {args.store})", flush=True)
    try:
        srv.httpd.serve_forever()
    except KeyboardInterrupt:
        srv.httpd.shutdown()


if __name__ == "__main__":
    main()
