"""Extra benchmarks for optimization work (r6) — NOT the driver's bench.

bench.py is frozen for measurement (driver contract); this file holds the
instrumentation the optimization guide asks for (guide §1.1/§1.4):

- a full sweep over EVERY query declared in __spark_entry__.queries(),
  timed with the noop sink so the computation is measured, not the sink
  or a count's column pruning;
- per-query .explain("formatted") capture for plan-shape auditing;
- job descriptions so the (disabled-by-default) UI stays readable.

Usage:
  python bench_extra.py [--sf-dir DIR] [--runs N] [--plans-dir DIR]
                        [--only name1,name2] [--skip name1,...]
Prints one JSON line: {"sweep": {name: {"runs": [...], "tree_cpu": [...]}}}
Env: SPARK_GRAFT_CPUS (default 32).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from bench import _tree_cpu_sec  # noqa: E402  (telemetry helper, frozen)


def noop(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default=os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--runs", type=int, default=3)
    ap.add_argument("--plans-dir", default=None)
    ap.add_argument("--only", default=None)
    ap.add_argument("--skip", default="")
    args = ap.parse_args()

    from pyspark.sql import SparkSession
    import __spark_entry__ as entry

    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName("json-schema-lean-spark-bench-extra")
        .config("spark.sql.shuffle.partitions", str(max(cpus, 8)))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.files.maxPartitionBytes", "4m")
        .config("spark.driver.memory", "48g")
        .config("spark.driver.extraJavaOptions",
                "-XX:ReservedCodeCacheSize=512m")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    qs = entry.queries()
    only = set(args.only.split(",")) if args.only else None
    skip = set(x for x in args.skip.split(",") if x)
    out: dict = {}
    for name, fn in qs.items():
        if (only is not None and name not in only) or name in skip:
            continue
        spark.sparkContext.setJobDescription(f"sweep:{name}")
        try:
            df = fn(spark, args.sf_dir)
        except Exception as exc:
            out[name] = {"error": f"{type(exc).__name__}: {exc}"}
            continue
        if args.plans_dir:
            os.makedirs(args.plans_dir, exist_ok=True)
            with open(os.path.join(args.plans_dir, f"{name}.txt"), "w") as f:
                f.write(df._jdf.queryExecution().explainString(
                    spark._jvm.org.apache.spark.sql.execution
                    .ExplainMode.fromString("formatted")))
        runs, cpu = [], []
        err = None
        for _ in range(args.runs):
            c0 = _tree_cpu_sec()
            t0 = time.perf_counter()
            try:
                # rebuild per run: AQE reuses materialized shuffle stages of
                # a collected DataFrame (bench.py comment), which would time
                # cached results instead of work
                noop(fn(spark, args.sf_dir))
            except Exception as exc:
                err = f"{type(exc).__name__}: {exc}"
                break
            runs.append(round(time.perf_counter() - t0, 3))
            cpu.append(round(_tree_cpu_sec() - c0, 2))
        out[name] = {"runs": runs, "tree_cpu": cpu}
        if err:
            out[name]["error"] = err
        print(json.dumps({name: out[name]}), flush=True)
        spark.sparkContext.setJobDescription(None)
    print(json.dumps({"sweep": out, "sf_dir": args.sf_dir, "cpus": cpus}))


if __name__ == "__main__":
    main()
