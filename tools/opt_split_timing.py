"""Split each headline query's wall time into CONSTRUCTION (the Python
call building the DataFrame: py4j round-trips, metadata probes, small
fixture jobs) vs EXECUTION (the count() action) — guide §1: decide whether
the driver or the executors own the time before optimizing either.

Usage: python tools/opt_split_timing.py [sf_dir] [query ...] [--plans DIR]

With --plans DIR also writes DIR/<query>_<tag>.txt explain("formatted")
for every measured query (tag from $SPARK_GRAFT_PLAN_TAG, default
"before").
"""

from __future__ import annotations

import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    args = sys.argv[1:]
    plans_dir = None
    if "--plans" in args:
        i = args.index("--plans")
        plans_dir = args[i + 1]
        del args[i : i + 2]
    sf_dir = args[0] if args and os.path.isdir(args[0]) else "/root/testdata/sf0.1"
    names = args[1:] if args and os.path.isdir(args[0]) else args

    import bench
    from incubator_horaedb_spark import querybank
    from incubator_horaedb_spark.querybank import llm_ops
    from incubator_horaedb_spark.session import get_spark

    if not names:
        names = list(bench.BENCH_QUERIES)
    tag = os.environ.get("SPARK_GRAFT_PLAN_TAG", "before")

    spark = get_spark("opt-split")
    qs = querybank.queries()
    spark.range(1).count()

    WARMUPS = {
        "stage_shingles": 3,
        "dedup_minhash_lsh": 3,
        "dedup_simhash": 3,
        "dedup_incremental_lsh": 3,
    }
    RUNS = 5
    print(f"# sf_dir={sf_dir} tag={tag}")
    print(f"{'query':30s} {'build_med':>9s} {'exec_med':>9s} {'total':>7s}")
    for name in names:
        if name == "stage_shingles":
            builds, execs = [], []
            for i in range(WARMUPS[name] + RUNS):
                spark.catalog.clearCache()
                llm_ops._SHINGLE_STATE["sf_dir"] = None
                t0 = time.time()
                hs = llm_ops._staged_shingles(spark, sf_dir)
                t1 = time.time()
                if i >= WARMUPS[name]:
                    builds.append(t1 - t0)
                    execs.append(0.0)
                spark.table(hs).count()
            b, e = statistics.median(builds), statistics.median(execs)
            print(f"{name:30s} {b:9.3f} {e:9.3f} {b + e:7.3f}")
            continue
        warm = WARMUPS.get(name, 1)
        builds, execs = [], []
        for i in range(warm + RUNS):
            if name in bench.SHINGLE_CONSUMERS:
                for t in spark.catalog.listTables():
                    if t.name in bench.SHINGLE_VIEWS:
                        continue
                    try:
                        if spark.catalog.isCached(t.name):
                            spark.catalog.uncacheTable(t.name)
                    except Exception:
                        pass
            else:
                spark.catalog.clearCache()
            t0 = time.time()
            df = qs[name](spark, sf_dir)
            t1 = time.time()
            df.count()
            t2 = time.time()
            if i >= warm:
                builds.append(t1 - t0)
                execs.append(t2 - t1)
        if plans_dir:
            os.makedirs(plans_dir, exist_ok=True)
            df = qs[name](spark, sf_dir)
            plan = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
            with open(os.path.join(plans_dir, f"{name}_{tag}.txt"), "w") as f:
                f.write(plan)
        b, e = statistics.median(builds), statistics.median(execs)
        print(f"{name:30s} {b:9.3f} {e:9.3f} {b + e:7.3f}")


if __name__ == "__main__":
    main()
