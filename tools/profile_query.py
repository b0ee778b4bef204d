"""Stage-level profile of bank queries (VERDICT r08 next-round #2: when
untouched-plan bench medians inflate while the spin calibrations sit at
their floor, profile a query with stage metrics instead of accepting the
environment story again).

Runs each named query with bench.py's warmup/forcing discipline, then N
timed runs; after every run it polls the Spark UI REST API
(``/api/v1/applications/{app}/stages``) and attributes the newly-completed
stage attempts to that run.  Per run it reports:

- ``wall``      — driver-observed seconds (what bench.py times)
- ``run_ms``    — sum of executorRunTime over the run's stages (task time)
- ``cpu_ms``    — sum of executorCpuTime (on-CPU nanoseconds / 1e6)
- ``gc_ms``     — sum of jvmGcTime
- ``sched_ms``  — run_ms - cpu_ms - gc_ms (runnable-but-not-on-CPU: steal,
  frequency throttle, scheduler wait — the environment component)
- input / shuffle-read / shuffle-write bytes and task count

Interpretation: if ``cpu_ms`` is flat across rounds while ``wall`` and
``sched_ms`` inflate, the slowdown is environmental (CPU steal / turbo
licensing); if ``cpu_ms`` itself grows on an unchanged plan digest, the
work grew — profile deeper.  The stage table for the slowest run is
printed so single-stage regressions are visible directly.

Usage::

    python tools/profile_query.py [sf_dir] [query ...] [--runs N] [--json OUT]

Defaults: sf_dir=/root/testdata/sf0.1, queries=bench.py's headline set,
runs=5, OUT=PROFILE.json.
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _get_spark():
    """bench.py's tuned session, plus the UI (REST metrics source)."""
    from pyspark.sql import SparkSession

    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 4))
    return (
        SparkSession.builder.appName("profile")
        .master(f"local[{cpus}]")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.parquet.filterPushdown", "true")
        .config("spark.sql.parquet.aggregatePushdown", "true")
        .config("spark.sql.shuffle.partitions", str(max(cpus, 8)))
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "true")
        .config("spark.ui.port", "4049")  # auto-increments if busy
        .getOrCreate()
    )


def _rest(spark, path: str):
    base = spark.sparkContext.uiWebUrl
    app = spark.sparkContext.applicationId
    with urllib.request.urlopen(f"{base}/api/v1/applications/{app}{path}", timeout=30) as r:
        return json.loads(r.read())


def _completed_stages(spark) -> dict[tuple[int, int], dict]:
    out = {}
    for st in _rest(spark, "/stages?status=complete"):
        out[(st["stageId"], st["attemptId"])] = st
    return out


_SUM_FIELDS = (
    ("run_ms", "executorRunTime", 1),
    ("cpu_ms", "executorCpuTime", 1e-6),  # REST reports nanoseconds
    ("gc_ms", "jvmGcTime", 1),
    ("input_mb", "inputBytes", 1 / (1 << 20)),
    ("shuf_read_mb", "shuffleReadBytes", 1 / (1 << 20)),
    ("shuf_write_mb", "shuffleWriteBytes", 1 / (1 << 20)),
    ("tasks", "numCompleteTasks", 1),
)


def _delta(stages: dict, seen: set) -> tuple[dict, list[dict]]:
    tot = {k: 0.0 for k, _, _ in _SUM_FIELDS}
    new = []
    for key, st in stages.items():
        if key in seen:
            continue
        new.append(st)
        for out_k, rest_k, scale in _SUM_FIELDS:
            tot[out_k] += st.get(rest_k, 0) * scale
    tot["sched_ms"] = tot["run_ms"] - tot["cpu_ms"] - tot["gc_ms"]
    return tot, new


def main() -> None:
    args = [a for a in sys.argv[1:]]
    runs_n, json_out = 5, "PROFILE.json"
    if "--runs" in args:
        i = args.index("--runs")
        runs_n = int(args[i + 1])
        del args[i : i + 2]
    if "--json" in args:
        i = args.index("--json")
        json_out = args[i + 1]
        del args[i : i + 2]
    sf_dir = args[0] if args and os.path.isdir(args[0]) else "/root/testdata/sf0.1"
    names = args[1:] if args and os.path.isdir(args[0]) else args

    import bench
    from incubator_horaedb_spark import querybank
    from incubator_horaedb_spark.querybank import llm_ops

    if not names:
        names = list(bench.BENCH_QUERIES)

    spark = _get_spark()
    qs = querybank.queries()
    spark.range(1).count()  # JVM warm

    # bench.py's per-query warmup discipline (its WARMUPS is main()-local)
    warmups = {"stage_shingles": 3, "dedup_minhash_lsh": 3, "dedup_simhash": 3}
    report: dict[str, dict] = {}
    for name in names:
        warm = warmups.get(name, 1)
        per_run, slowest = [], None
        seen: set = set()
        for i in range(warm + runs_n):
            if name == "stage_shingles":
                spark.catalog.clearCache()
                llm_ops._SHINGLE_STATE["sf_dir"] = None
            elif name in bench.SHINGLE_CONSUMERS:
                for t in spark.catalog.listTables():
                    if t.name not in bench.SHINGLE_VIEWS:
                        try:
                            if spark.catalog.isCached(t.name):
                                spark.catalog.uncacheTable(t.name)
                        except Exception:
                            pass
            else:
                spark.catalog.clearCache()
            seen = set(_completed_stages(spark))
            t0 = time.time()
            if name == "stage_shingles":
                hs = llm_ops._staged_shingles(spark, sf_dir)
            else:
                qs[name](spark, sf_dir).count()
            wall = time.time() - t0
            # small settle so the UI store ingests the final stage events;
            # the snapshot is taken BEFORE any untimed follow-up work so
            # run/cpu metrics cover exactly what wall covers (r9 review #9)
            time.sleep(0.2)
            stages = _completed_stages(spark)
            tot, new_stages = _delta(stages, seen)
            if name == "stage_shingles":
                spark.table(hs).count()  # keep the stage warm for consumers
            tot["wall_s"] = round(wall, 3)
            if i >= warm:
                per_run.append(tot)
                if slowest is None or wall > slowest[0]:
                    slowest = (wall, new_stages)
        med = {
            k: round(statistics.median(r[k] for r in per_run), 1)
            for k in per_run[0]
            if k != "wall_s"
        }
        med["wall_s"] = round(statistics.median(r["wall_s"] for r in per_run), 3)
        report[name] = {"median": med, "runs": per_run}
        print(
            f"{name:28s} wall {med['wall_s']:7.3f}s  run {med['run_ms']:9.0f}ms  "
            f"cpu {med['cpu_ms']:9.0f}ms  gc {med['gc_ms']:6.0f}ms  "
            f"sched {med['sched_ms']:9.0f}ms  tasks {med['tasks']:5.0f}  "
            f"in {med['input_mb']:.1f}MB  shW {med['shuf_write_mb']:.2f}MB",
            file=sys.stderr,
        )
        if slowest and slowest[1]:
            worst = sorted(
                slowest[1], key=lambda s: -s.get("executorRunTime", 0)
            )[:5]
            for st in worst:
                print(
                    f"    stage {st['stageId']:4d} {st.get('name', '')[:60]:60s} "
                    f"run {st.get('executorRunTime', 0):7d}ms "
                    f"cpu {st.get('executorCpuTime', 0) / 1e6:9.0f}ms "
                    f"tasks {st.get('numCompleteTasks', 0)}",
                    file=sys.stderr,
                )
    with open(json_out, "w") as f:
        json.dump(report, f, indent=1)
    print(f"# wrote {json_out}", file=sys.stderr)


if __name__ == "__main__":
    main()
