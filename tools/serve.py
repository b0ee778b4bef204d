"""Launch the engine's servers (the reference's horaedb-server analogue:
SQL + protocol write routes + wire protocols over one engine instance).

    python tools/serve.py [--host 127.0.0.1] [--port 5440] \
        [--mysql-port 3307] [--pg-port 5433] \
        [--store /path/to/catalog] [--cpus N]

HTTP routes: POST /sql, /influxdb/v1/write, /opentsdb/api/put,
/prom/v1/{write,read} (JSON or snappy+protobuf); GET /health.
Wire protocols: MySQL (reference default port 3307) and PostgreSQL
(reference default port 5433) speak to the same engine; pass port 0 to
pick a free port, or --no-mysql/--no-pg to disable.
See incubator_horaedb_spark/{server,wire/mysql,wire/postgresql}.py.
"""

from __future__ import annotations

import argparse
import sys

sys.path.insert(0, "/root/repo")


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--host", default="127.0.0.1")
    ap.add_argument("--port", type=int, default=5440)
    ap.add_argument("--mysql-port", type=int, default=3307)  # mysql/basic.sh port
    ap.add_argument("--pg-port", type=int, default=5433)  # postgresql/basic.sh port
    ap.add_argument("--grpc-port", type=int, default=8831)  # reference default grpc port
    ap.add_argument("--no-mysql", action="store_true")
    ap.add_argument("--no-pg", action="store_true")
    ap.add_argument("--no-grpc", action="store_true")
    ap.add_argument("--store", default="./horaedb-store")
    ap.add_argument("--cpus", type=int, default=None)
    args = ap.parse_args()

    from incubator_horaedb_spark.frontends.sql_shim import Engine
    from incubator_horaedb_spark.server import EngineServer
    from incubator_horaedb_spark.session import get_spark
    from incubator_horaedb_spark.wire.mysql import MySQLServer
    from incubator_horaedb_spark.wire.postgresql import PostgresServer

    spark = get_spark("horaedb-spark-server", cpus=args.cpus)
    engine = Engine(spark, args.store)
    srv = EngineServer(engine, host=args.host, port=args.port)
    print(f"serving on http://{args.host}:{srv.port} (store: {args.store})", flush=True)
    if not args.no_mysql:
        my = MySQLServer(engine, host=args.host, port=args.mysql_port).start()
        print(f"mysql protocol on {args.host}:{my.port}", flush=True)
    if not args.no_pg:
        pg = PostgresServer(engine, host=args.host, port=args.pg_port).start()
        print(f"postgresql protocol on {args.host}:{pg.port}", flush=True)
    if not args.no_grpc:
        # real gRPC when grpcio is installed; framed-TCP stand-in otherwise
        try:
            from incubator_horaedb_spark.wire.storage_grpc import build_grpc_server

            gs, port = build_grpc_server(engine, args.grpc_port)
            gs.start()
            print(f"grpc storage service on {args.host}:{port}", flush=True)
        except NotImplementedError:
            from incubator_horaedb_spark.wire.storage_grpc import FramedStorageServer

            fs = FramedStorageServer(engine, host=args.host, port=args.grpc_port).start()
            print(f"framed storage service (grpc codec) on {args.host}:{fs.port}", flush=True)
    try:
        srv.httpd.serve_forever()
    except KeyboardInterrupt:
        srv.httpd.shutdown()


if __name__ == "__main__":
    main()
