#!/usr/bin/env python
"""Extra benchmarks for optimization work (bench.py is frozen for
measurement — see its header).  Modes:

  --plans-dump OUTDIR [names...]   write .explain("formatted") per query
  --time [names...]                noop-sink per-query timing (guide §1.4),
                                   warm pass + best-of-N, one JSON line
  --build [names...]               DataFrame construction (py4j) time only

Env: SPARK_GRAFT_SF_DIR (default /root/testdata/sf1.0 here — the driver's
measured scale), SPARK_GRAFT_CPUS, LPS_BENCH_REPEATS (default 3).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf1.0")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
REPEATS = int(os.environ.get("LPS_BENCH_REPEATS", "3"))


def get_session(cores: int = CPUS):
    from layout_parser_spark.session import get_spark

    return get_spark(
        f"lps-bench-extra-{cores}",
        master=f"local[{cores}]",
        extra_conf={
            "spark.ui.showConsoleProgress": "false",
            "spark.sql.shuffle.partitions": str(max(cores, 8)),
            "spark.driver.memory": "24g",
        },
    )


def _queries(names):
    import __spark_entry__ as entry

    qs = entry.queries()
    return {n: qs[n] for n in (names or qs)}


def plans_dump(outdir: str, names):
    os.makedirs(outdir, exist_ok=True)
    spark = get_session(4)
    for name, fn in _queries(names).items():
        df = fn(spark, SF_DIR)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        with open(os.path.join(outdir, f"{name}.txt"), "w") as f:
            f.write(plan)
        print(name, flush=True)


def time_queries(names):
    spark = get_session(CPUS)
    out = {}
    for name, fn in _queries(names).items():
        spark.sparkContext.setJobDescription(f"bench_extra: {name}")

        def run_once():
            fn(spark, SF_DIR).write.format("noop").mode("overwrite").save()

        run_once()  # warm: codegen + JIT + python workers
        samples = []
        for _ in range(REPEATS):
            t0 = time.perf_counter()
            run_once()
            samples.append(round(time.perf_counter() - t0, 3))
        out[name] = {"best": min(samples), "runs": samples}
        print(json.dumps({name: out[name]}), flush=True)
    print(json.dumps({"sf": os.path.basename(SF_DIR), "cpus": CPUS,
                      "queries": {k: v["best"] for k, v in out.items()}}))


def build_times(names):
    spark = get_session(4)
    out = {}
    for name, fn in _queries(names).items():
        fn(spark, SF_DIR)  # warm lazy imports
        t0 = time.perf_counter()
        fn(spark, SF_DIR)
        out[name] = round(time.perf_counter() - t0, 3)
    print(json.dumps(out))


if __name__ == "__main__":
    args = sys.argv[1:]
    if args and args[0] == "--plans-dump":
        plans_dump(args[1], args[2:])
    elif args and args[0] == "--time":
        time_queries(args[1:])
    elif args and args[0] == "--build":
        build_times(args[1:])
    else:
        print(__doc__)
