"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE
JSON line {"metric": ..., "value": total_sec, "unit": "sec", "queries":
{...}, "sf": ...}.

Headline set spans the engine surface: scan+agg, join, top-k, window dedup,
time bucketing, PromQL alignment, LSH dedup, ANN — the operators whose
scaling behavior matters at 100 TB.  Each query is executed with a
count/collect to force full evaluation.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

BENCH_QUERIES = [
    "q1_pricing_summary",
    "join_inner_3way",
    "topk_order_limit",
    "window_rownum_top2",
    "dedup_latest_by_key",
    "time_bucket_minute",
    "downsample_stddev",
    "promql_rate",
    "promql_instant",
    # the documents → token-hash → shingle stage is computed ONCE and
    # shared by every dedup family (llm_ops._staged_shingles) — the
    # curation norm at scale is shingle once, dedup many ways.  It is
    # timed as its own entry; the dedup queries below measure their
    # INCREMENTAL cost over the warm stage (the stage views are the only
    # caches kept across their runs).
    "stage_shingles",
    "dedup_minhash_lsh",
    "dedup_simhash",
    "ann_cosine_bruteforce",
    "ann_topk_blocked",
    "text_fingerprint",
    # r8 (VERDICT r07 #7): tag-equality + time-range read over the
    # key-partitioned + segmented table layout — partition/segment
    # directory pruning is the plan property that matters at 100 TB
    # (fixture table built once in the warm-up run, excluded from timing)
    "partitioned_scan_prune",
    # r10: the multi-resolution GROUPING SETS ladder (Expand ×3 through
    # ONE hash agg — the continuous-aggregate maintenance shape) and the
    # persisted-index incremental dedup (index parquet write + delta band
    # join; consumes the shared shingle stage like the other dedups)
    "ts_rollup_ladder",
    "dedup_incremental_lsh",
    # r11: the mergeable-sketch rollup (day level re-aggregates KB HLL
    # blobs — the 100 TB NDV-ladder shape) joins the headline set so all
    # round-10/11 features carry per-round bench rows
    "hll_rollup_merge",
]

# queries that consume the shared shingle stage: between runs, drop every
# cache EXCEPT the stage views so the timing isolates incremental work
SHINGLE_CONSUMERS = {"dedup_minhash_lsh", "dedup_simhash", "dedup_incremental_lsh"}
SHINGLE_VIEWS = ("__shingle_tokh", "__shingle_hs")


def _py_spin_sec() -> float:
    """Fixed pure-CPU calibration workload (VERDICT r07 next-round #2):
    a constant xorshift loop whose wall time moves ONLY with effective
    CPU speed.  Recorded before and after the bench so a throttled VM
    shows up as data instead of narrative — if the spin time is inflated
    relative to its historical ~baseline, query regressions co-moving
    with it are environmental."""
    x, t0 = 0x9E3779B97F4A7C15, time.time()
    for _ in range(8_000_000):
        x ^= (x << 13) & 0xFFFFFFFFFFFFFFFF
        x ^= x >> 7
        x ^= (x << 17) & 0xFFFFFFFFFFFFFFFF
    if x == 0:  # unreachable; keeps the loop un-eliminable
        print(x, file=sys.stderr)
    return round(time.time() - t0, 3)


def _jvm_spin_sec(spark) -> float:
    """JVM-side calibration: a fixed codegen aggregation over range() —
    no I/O, no shuffle; tracks executor-thread CPU speed."""
    t0 = time.time()
    spark.range(0, 200_000_000, 1, 8).selectExpr(
        "sum(id % 1000003) as s"
    ).collect()
    return round(time.time() - t0, 3)


def _spin_chunk(_seed) -> int:
    # module-level so multiprocessing can pickle it by reference
    x = 0x9E3779B97F4A7C15
    for _ in range(4_000_000):
        x ^= (x << 13) & 0xFFFFFFFFFFFFFFFF
        x ^= x >> 7
        x ^= (x << 17) & 0xFFFFFFFFFFFFFFFF
    return x


def _py_spin_multicore_sec(ncores: int) -> float:
    """ALL-CORES Python calibration (r9, VERDICT r08 #2): one xorshift
    chunk per core, run simultaneously in forked workers.  The r8 rounds
    showed a +20% uniform inflation on 32-core Spark runs while the
    SINGLE-thread spin sat at its idle floor — multi-core turbo licensing
    / steal throttles all-cores workloads without touching a 1-thread
    probe.  Wall time here is the slowest worker; compare against the
    1-thread spin: mc/1t >> 1 under all-cores load means the VM cannot
    currently sustain its single-core speed across cores."""
    import multiprocessing as mp

    t0 = time.time()
    with mp.get_context("fork").Pool(ncores) as pool:
        pool.map(_spin_chunk, range(ncores))
    return round(time.time() - t0, 3)


def _jvm_spin_parallel_sec(spark) -> float:
    """ALL-CORES JVM calibration: the same codegen sum with one partition
    per executor thread and a fixed 250M-row slice each — the workload a
    throttled multi-core JVM cannot hide from."""
    par = spark.sparkContext.defaultParallelism
    t0 = time.time()
    spark.range(0, 250_000_000 * par, 1, par).selectExpr(
        "sum(id % 1000003) as s"
    ).collect()
    return round(time.time() - t0, 3)


def _driver_roundtrip_sec(spark) -> float:
    """DRIVER-SIDE calibration (r9): 20 iterations of the smallest possible
    plan→schedule→collect cycle.  Stage-level profiling (PROFILE.md) showed
    executor task time is a small, stable fraction of wall for every
    sub-second headline query — wall is dominated by driver-side work
    (Catalyst planning, AQE orchestration, py4j round-trips), which the
    pure-CPU spin probes cannot see.  When unchanged-plan medians inflate
    while the spins sit at floor, THIS probe is the one expected to move
    with them."""
    t0 = time.time()
    for _ in range(20):
        spark.range(1).count()
    return round(time.time() - t0, 3)


def _completed_stage_cpu(spark) -> dict[tuple[int, int], float]:
    """(stageId, attemptId) → executorCpuTime ms for completed stages, via
    the UI REST API (same source as tools/profile_query.py).  Returns {}
    when the UI is unavailable — callers degrade to wall-only metrics."""
    import urllib.request

    try:
        base = spark.sparkContext.uiWebUrl
        app = spark.sparkContext.applicationId
        with urllib.request.urlopen(
            f"{base}/api/v1/applications/{app}/stages?status=complete", timeout=30
        ) as r:
            stages = json.loads(r.read())
        return {
            (st["stageId"], st["attemptId"]): st.get("executorCpuTime", 0) * 1e-6
            for st in stages
        }
    except Exception:
        return {}


def _cpu_mhz() -> float | None:
    try:
        with open("/proc/cpuinfo") as f:
            vals = [
                float(line.split(":")[1])
                for line in f
                if line.lower().startswith("cpu mhz")
            ]
        return round(sum(vals) / len(vals), 1) if vals else None
    except Exception:
        return None


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    from incubator_horaedb_spark import querybank
    from incubator_horaedb_spark.session import get_spark

    # UI on: the per-query executor-CPU attribution (queries_cpu_ms) reads
    # the REST stage API.  CPU milliseconds are the stable per-query metric
    # the wall medians are read against (VERDICT r11 #6: shared-stage dedup
    # walls swing with run-order attribution on a bursty VM while their
    # executor CPU is steady).
    spark = get_spark("bench", ui=True)
    qs = querybank.queries()

    ncores = min(32, os.cpu_count() or 1)
    calib = {"cpu_mhz_before": _cpu_mhz(), "mc_cores": ncores}
    calib["py_spin_sec_before"] = _py_spin_sec()
    calib["py_spin_mc_sec_before"] = _py_spin_multicore_sec(ncores)
    _jvm_spin_sec(spark)  # discard: first run pays codegen compilation
    calib["jvm_spin_sec_before"] = _jvm_spin_sec(spark)
    _jvm_spin_parallel_sec(spark)  # discard: codegen for the parallel shape
    calib["jvm_spin_par_sec_before"] = _jvm_spin_parallel_sec(spark)
    _driver_roundtrip_sec(spark)  # discard: first cycle pays codegen/JIT
    calib["driver_rt_sec_before"] = _driver_roundtrip_sec(spark)

    # Warm the JVM, whole-stage-codegen compiler, and vectorized parquet
    # reader before timing — steady-state engine throughput is the metric,
    # not JVM boot.  The warmup query touches scan → filter → hash-agg
    # paths on a small slice; every timed query still does its own full
    # scan and compute.
    spark.range(1).count()
    from incubator_horaedb_spark.querybank.registry import load as _load

    (
        _load(spark, sf_dir, "lineitem")
        .limit(1000)
        .groupBy("l_returnflag")
        .count()
        .count()
    )

    # Per query: discard warm-up runs, then report the MEDIAN of 5 timed
    # runs as the headline plus MIN and SPREAD (max-min) as dispersion
    # (VERDICT r02 #8: single-shot numbers moved ±10% with no code change;
    # VERDICT r04 #5: a round-over-round delta is only interpretable next
    # to the run-to-run variance band — the bursty-CPU VM makes adjacent
    # medians disagree by >10% with zero code change).  The warm-up
    # discard keeps per-query codegen/C2 compilation out of the numbers —
    # the staged LSH queries evaluate interpreted hash-fold expressions
    # whose evaluators only reach C2-compiled steady state around run 3-4
    # (measured 8.6 → 2.0 → 1.8 → 1.5s at sf0.1), so they discard 3.
    # Cached temp views are cleared between runs so every run re-does the
    # work.
    import statistics

    WARMUPS = {
        "stage_shingles": 3,
        "dedup_minhash_lsh": 3,
        "dedup_simhash": 3,
        "dedup_incremental_lsh": 3,
    }
    TIMED_RUNS = 5
    timings: dict[str, float] = {}
    mins: dict[str, float] = {}
    spreads: dict[str, float] = {}
    cpu_ms: dict[str, float | None] = {}
    cpu_all: dict[str, list[float]] = {}
    from incubator_horaedb_spark.querybank import llm_ops

    def _clear_except_shingles() -> None:
        # drop all caches except the shared stage (catalog-listed temp
        # views are the only cache sources in the headline queries)
        for t in spark.catalog.listTables():
            if t.name in SHINGLE_VIEWS:
                continue
            try:
                if spark.catalog.isCached(t.name):
                    spark.catalog.uncacheTable(t.name)
            except Exception:
                pass

    for name in BENCH_QUERIES:
        warm = WARMUPS.get(name, 1)
        runs, n = [], 0
        cpu_runs: list[float | None] = []
        for i in range(warm + TIMED_RUNS):
            if name == "stage_shingles":
                # time the cold stage build itself; the LAST build stays
                # warm for the consumers below
                spark.catalog.clearCache()
                llm_ops._SHINGLE_STATE["sf_dir"] = None
                seen = _completed_stage_cpu(spark) if i >= warm else {}
                t0 = time.time()
                hs = llm_ops._staged_shingles(spark, sf_dir)
                if i >= warm:
                    runs.append(time.time() - t0)
                    time.sleep(0.2)  # let the UI store ingest stage events
                    now = _completed_stage_cpu(spark)
                    cpu_runs.append(
                        sum(v for k, v in now.items() if k not in seen)
                        if now
                        else None
                    )
                n = spark.table(hs).count()  # cache read, outside timing
                continue
            if name in SHINGLE_CONSUMERS:
                _clear_except_shingles()
            else:
                spark.catalog.clearCache()
            seen = _completed_stage_cpu(spark) if i >= warm else {}
            t0 = time.time()
            df = qs[name](spark, sf_dir)
            n = df.count()
            dt = time.time() - t0
            if i >= warm:
                runs.append(dt)
                time.sleep(0.2)  # let the UI store ingest stage events
                now = _completed_stage_cpu(spark)
                cpu_runs.append(
                    sum(v for k, v in now.items() if k not in seen)
                    if now
                    else None
                )
        timings[name] = round(statistics.median(runs), 3)
        mins[name] = round(min(runs), 3)
        spreads[name] = round(max(runs) - min(runs), 3)
        cvals = [c for c in cpu_runs if c is not None]
        cpu_ms[name] = round(statistics.median(cvals), 1) if cvals else None
        cpu_all[name] = [round(c, 1) for c in cvals]
        print(
            f"# {name}: {n} rows median {timings[name]}s min {mins[name]}s "
            f"spread {spreads[name]}s cpu {cpu_ms[name]}ms (n={len(runs)})",
            file=sys.stderr,
        )

    calib["py_spin_sec_after"] = _py_spin_sec()
    calib["py_spin_mc_sec_after"] = _py_spin_multicore_sec(ncores)
    calib["jvm_spin_sec_after"] = _jvm_spin_sec(spark)
    calib["jvm_spin_par_sec_after"] = _jvm_spin_parallel_sec(spark)
    calib["driver_rt_sec_after"] = _driver_roundtrip_sec(spark)
    calib["cpu_mhz_after"] = _cpu_mhz()

    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    print(
        json.dumps(
            {
                "metric": "headline_queries_total",
                "value": round(sum(timings.values()), 3),
                # min-of-5 total: far more robust to the VM's bursty-CPU
                # throttle than the median (VERDICT r07 #2) — compare this
                # across rounds when the spin calibration moved
                "value_min": round(sum(mins.values()), 3),
                "unit": "sec",
                "queries": timings,
                "queries_min": mins,
                "queries_spread": spreads,
                # median executor CPU per query (REST stage attribution):
                # the run-order-insensitive metric — read wall deltas
                # against this before calling anything a regression
                # (VERDICT r11 #6); null when the UI store was unreadable
                "queries_cpu_ms": cpu_ms,
                # every timed run's CPU, so a cross-round reader can see
                # whether two medians differ beyond the per-run dispersion
                # (the ann_cosine_bruteforce lesson, PROFILE.md r12)
                "queries_cpu_runs": cpu_all,
                "runs_per_query": TIMED_RUNS,
                # fixed-workload calibration bracketing the run: if these
                # differ from their cross-round baseline, the environment
                # moved — read query deltas against the spin ratio
                "calibration": calib,
                "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
            }
        )
    )


if __name__ == "__main__":
    main()
