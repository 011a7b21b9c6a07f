"""Round-6 optimization harness (bench.py is frozen for measurement).

Times registered queries with the same methodology as bench.py's query
loop (one warm SparkSession at local[$SPARK_GRAFT_CPUS], `.collect()` per
query, wall seconds) and can dump `.explain("formatted")` plans.

Usage:
    python bench_extra.py time [query ...]        # all queries if none given
    python bench_extra.py plan OUTDIR [query ...] # write <query>.txt plans
    python bench_extra.py noop [query ...]        # noop-sink isolation (guide 1.4)

Env: SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1),
     SPARK_GRAFT_CPUS (default 32),
     BENCH_EXTRA_RUNS (default 1 timed run per query).

Prints one JSON line: {"queries": {name: sec}, "sf_dir": ..., "mode": ...}.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
RUNS = int(os.environ.get("BENCH_EXTRA_RUNS", "1"))


def main() -> None:
    mode = sys.argv[1] if len(sys.argv) > 1 else "time"
    rest = sys.argv[2:]
    outdir = None
    if mode == "plan":
        outdir = rest[0]
        rest = rest[1:]
        os.makedirs(outdir, exist_ok=True)

    import __spark_entry__ as entrymod
    from oblate_spark.session import get_spark

    spark = get_spark(cores=CPUS, app_name="bench_extra")
    qmap = entrymod.queries()
    names = rest if rest else [n for n in qmap]
    unknown = set(names) - set(qmap)
    if unknown:
        raise SystemExit(f"unknown queries: {sorted(unknown)}")

    timings: dict[str, float] = {}
    for name in names:
        fn = qmap[name]
        if mode == "plan":
            df = fn(spark, SF_DIR)
            plan = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
            with open(os.path.join(outdir, f"{name}.txt"), "w") as f:
                f.write(plan)
            print(f"# wrote {outdir}/{name}.txt", file=sys.stderr)
            continue
        spark.sparkContext.setJobDescription(f"bench_extra:{name}")
        best = None
        for _ in range(RUNS):
            t0 = time.time()
            if mode == "noop":
                fn(spark, SF_DIR).write.format("noop").mode("overwrite").save()
            else:
                fn(spark, SF_DIR).collect()
            dt = time.time() - t0
            best = dt if best is None or dt < best else best
        timings[name] = round(best, 3)
        print(f"# {name}: {timings[name]}s", file=sys.stderr)
        spark.sparkContext.setJobDescription(None)

    print(json.dumps({"queries": timings, "sf_dir": SF_DIR, "mode": mode, "cpus": CPUS}))


if __name__ == "__main__":
    main()
