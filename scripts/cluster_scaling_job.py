"""Child job for scripts/cluster_scaling_bench.py — submitted via
``spark-submit --py-files engine.zip`` with the master (a
``local-cluster[N,cores,mem]`` URL) chosen by the orchestrator.

Deliberately contains NO repo-path ``sys.path`` insert: every
``json_schema_lean_spark`` import must resolve from the ``--py-files``
zip, exactly as it would on a real cluster. The orchestrator copies this
file to a neutral directory before submitting so the repo checkout
cannot leak onto ``sys.path`` via the script's own dirname.

Usage (via spark-submit): cluster_scaling_job.py <spans-parquet> <runs>
Prints one JSON line: executors/cores seen, per-run wall + steal, best
sec, docs/sec.
"""
from __future__ import annotations

import json
import os
import sys
import time

from pyspark.sql import SparkSession, functions as F

from json_schema_lean_spark.plans import validate_documents_fused
from json_schema_lean_spark.sources.spansgen import SPAN_SCHEMA


def steal_sec() -> float:
    """Hypervisor steal (/proc/stat cpu field 8) — the only guest-visible
    trace of host neighbors; a scaling ratio taken under >1 stolen core
    is weather, not evidence (BENCH/BASELINE.md, r5 variance section)."""
    try:
        with open("/proc/stat") as f:
            return int(f.readline().split()[8]) / os.sysconf("SC_CLK_TCK")
    except (OSError, IndexError, ValueError):
        return 0.0


def needs_more_runs(times: list, cap: int) -> bool:
    """Steady-state convergence rule (pure, unit-tested): a fixed run
    count understates the slow (low-parallelism) side — its minutes of
    C2 ramp span several runs, and a still-improving series fakes
    super-linear scaling (measured: a monotone 22.7->19.3 five-run
    1-executor series produced "efficiency 1.06"). Keep running while
    either of the last two runs still improved >2% on the best of the
    earlier runs, capped at ``cap`` total runs. Fewer than 3 runs so far
    means there is no earlier-runs baseline yet: keep running (ADVICE r5:
    min() of the empty times[:-2] raised ValueError when the job was
    submitted with runs <= 2)."""
    if len(times) >= cap:
        return False
    if len(times) < 3:
        return True
    return min(times[-2:]) < 0.98 * min(times[:-2])


def _executor_count(sc) -> int:
    try:
        return sc._jsc.sc().getExecutorMemoryStatus().size() - 1
    except Exception:
        return -1


def main() -> None:
    path, runs = sys.argv[1], int(sys.argv[2])
    spark = SparkSession.builder.getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    spans = spark.read.parquet(path)

    def job():
        # fused verdict + gated violation collector: the full validation
        # output semantics, all-JVM (no Python on executors)
        out = validate_documents_fused(spans, SPAN_SCHEMA,
                                       keep_cols=["doc_id"])
        return out.select(
            F.count(F.lit(1)), F.sum(F.col("valid").cast("long")),
            F.sum(F.size("violations").cast("long"))).collect()[0]

    r = job()  # warm-up: codegen + JIT on every executor
    times, steals = [], []

    def one():
        s0 = steal_sec()
        t0 = time.perf_counter()
        job()
        wall = time.perf_counter() - t0
        times.append(round(wall, 3))
        steals.append(round((steal_sec() - s0) / max(wall, 1e-6), 2))

    for _ in range(runs):
        one()
    while needs_more_runs(times, cap=runs * 3):
        one()
    best = min(times)
    sc = spark.sparkContext
    print(json.dumps({
        "master": sc.master,
        # block-manager count minus the driver = live executor JVMs
        "executors": _executor_count(sc),
        "default_parallelism": sc.defaultParallelism,
        "engine_zip_import": "engine.zip" in (
            __import__("json_schema_lean_spark").__file__ or ""),
        "docs": r[0], "valid": r[1], "viols": r[2],
        "times": times, "steal_cores": steals,
        "best_steal_cores": steals[times.index(best)],
        "best_sec": round(best, 3),
        "docs_per_sec": round(r[0] / best, 1),
    }))


if __name__ == "__main__":
    main()
