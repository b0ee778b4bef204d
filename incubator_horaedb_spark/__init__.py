"""incubator_horaedb_spark — a PySpark-native analytics engine with the query
and data-processing capabilities of apache/incubator-horaedb.

The reference (at /root/reference) is a Rust time-series database whose query
layer delegates to Apache DataFusion. This package re-expresses that surface
Spark-first:

- ``session``      — tuned SparkSession builder (AQE, pushdown, shuffle sizing).
- ``schema``       — the TSDB table model: TAG columns, timestamp key, primary
                     key, tsid (ref: src/common_types/src/schema.rs).
- ``catalog``      — JSON-backed table catalog with HoraeDB table options
                     (update_mode, segment_duration, ttl ...).
- ``functions``    — time_bucket / date_bin / thetasketch_distinct / tsid
                     hashing (ref: src/df_operator/src/udfs/).
- ``table``        — write path (seq + time partitioning) and read path
                     (dedup view for Overwrite tables; ref: row_iter/).
- ``frontends``    — SQL dialect shim, PromQL, InfluxQL, OpenTSDB planners
                     that compile to DataFrames (ref: src/query_frontend/).
- ``operators``    — PromAlign range functions, dedup family (exact, MinHash
                     LSH, SimHash, n-gram Jaccard), similarity search, text
                     analysis, multimodal plumbing.
- ``streaming``    — Structured Streaming ingest replacing WAL/memtable.
"""

__version__ = "0.1.0"
