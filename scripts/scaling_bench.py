"""Two-cluster-size scaling evidence (north_rule): the identical validation
job at local[N] and local[4N] on the same input; reports docs/sec at both and
scaling efficiency (target >= 0.8). Sandbox proxy for N vs 4N executors per
the driver instruction.

Usage: python scripts/scaling_bench.py [n_docs] [low_cores] [high_cores]
Writes BENCH/BASELINE.md and prints a JSON summary.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

WORKER = r"""
import json, os, statistics, sys, time
from pyspark.sql import SparkSession, functions as F
sys.path.insert(0, %(repo)r)
from json_schema_lean_spark.plans import validate_documents_fused
from json_schema_lean_spark.sources.spansgen import SPAN_SCHEMA

cores = int(sys.argv[1]); path = sys.argv[2]; runs = int(sys.argv[3])
spark = (SparkSession.builder.master(f"local[{cores}]")
         .config("spark.sql.shuffle.partitions", str(max(cores * 2, 8)))
         .config("spark.sql.files.maxPartitionBytes", "4m")
         .config("spark.sql.adaptive.enabled", "true")
         .config("spark.driver.memory", "48g")
         .config("spark.driver.extraJavaOptions",
                 "-XX:ReservedCodeCacheSize=512m")
         .config("spark.ui.enabled", "false").getOrCreate())
spark.sparkContext.setLogLevel("ERROR")
spans = spark.read.parquet(path)
def job():
    # fused verdict + violation count: full validation output semantics
    out = validate_documents_fused(spans, SPAN_SCHEMA, keep_cols=["doc_id"])
    return out.select(F.count(F.lit(1)), F.sum(F.col("valid").cast("long")),
                      F.sum(F.size("violations").cast("long"))).collect()[0]
def steal_sec():
    # hypervisor steal (/proc/stat field 8): the only guest-visible trace
    # of host neighbors, which inflate our CPU via preemption + memory
    # contention (BENCH/BASELINE.md r5). A scaling ratio taken under
    # steal is weather, not evidence.
    try:
        with open("/proc/stat") as f:
            return int(f.readline().split()[8]) / os.sysconf("SC_CLK_TCK")
    except (OSError, IndexError, ValueError):
        return 0.0

r = job()  # warm-up: codegen + JIT + page cache
times, steals = [], []
for _ in range(runs):
    s0 = steal_sec(); t0 = time.perf_counter()
    job()
    wall = time.perf_counter() - t0
    times.append(wall)
    steals.append(round((steal_sec() - s0) / max(wall, 1e-6), 2))
best = min(times)
print(json.dumps({"cores": cores, "docs": r[0], "valid": r[1], "viols": r[2],
                  "times": [round(t, 3) for t in times],
                  "steal_cores": steals,
                  "best_steal_cores": steals[times.index(best)],
                  "best_sec": round(best, 3),
                  "docs_per_sec": round(r[0] / best, 1)}))
"""


def run_worker(cores: int, path: str, runs: int = 5) -> dict:
    out = subprocess.run(
        [sys.executable, "-c", WORKER % {"repo": REPO}, str(cores), path, str(runs)],
        capture_output=True, text=True, check=True)
    return json.loads(out.stdout.strip().splitlines()[-1])


def main() -> None:
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 3_000_000
    low = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    high = int(sys.argv[3]) if len(sys.argv) > 3 else 32
    path = f"/tmp/spark_graft_spans_{n_docs}"

    if not os.path.exists(path):
        from pyspark.sql import SparkSession
        from json_schema_lean_spark.sources.spansgen import spans_documents
        spark = (SparkSession.builder.master("local[32]")
                 .config("spark.driver.memory", "48g")
                 .config("spark.ui.enabled", "false").getOrCreate())
        spark.sparkContext.setLogLevel("ERROR")
        spans_documents(spark, n_docs, partitions=128).write.mode("overwrite").parquet(path)
        spark.stop()

    lo = run_worker(low, path)
    hi = run_worker(high, path)
    speedup = lo["best_sec"] / hi["best_sec"]
    eff = speedup / (high / low)
    summary = {"n_docs": lo["docs"], "low": lo, "high": hi,
               "speedup": round(speedup, 3), "scaling_efficiency": round(eff, 3)}
    print(json.dumps(summary))

    os.makedirs(f"{REPO}/BENCH", exist_ok=True)
    # preserve hand-written analysis sections (cold/warm, skew, controls):
    # regenerate only the header block up to the first "## " heading
    tail = ""
    baseline_path = f"{REPO}/BENCH/BASELINE.md"
    if os.path.exists(baseline_path):
        old = open(baseline_path).read()
        idx = old.find("\n## ")
        if idx >= 0:
            tail = old[idx:]
    with open(baseline_path, "w") as f:
        f.write(f"""# BENCH/BASELINE — scaling evidence (north_rule)

Identical job — fused-array columnar validation (verdicts + gated
violation collector; see json_schema_lean_spark/plans/fused.py) of the generated
interleaved spans table ({lo['docs']:,} documents, ~8 spans/doc, parquet at
`{path}`) — executed at two parallelism levels on the same input, per the
driver's sandbox proxy for N vs 4N executors. Timing = best of 5 steady-state
runs after a warm-up run (codegen + JIT excluded; this matches cluster
steady-state behavior where the plan compiles once).

| parallelism | best sec | docs/sec | runs (sec) | steal cores/run |
|---|---|---|---|---|
| local[{low}]  | {lo['best_sec']} | {lo['docs_per_sec']:,} | {lo['times']} | {lo.get('steal_cores')} |
| local[{high}] | {hi['best_sec']} | {hi['docs_per_sec']:,} | {hi['times']} | {hi.get('steal_cores')} |

- speedup {low}->{high} cores: **{speedup:.2f}x** (ideal {high//low}x)
- **scaling efficiency: {eff:.3f}** (target >= 0.8)
- hypervisor steal during the best runs: {lo.get('best_steal_cores')} /
  {hi.get('best_steal_cores')} cores — a ratio taken under >1 stolen core
  is weather, not evidence (see the r5 variance section below); re-run
  until both best runs are clean.

The reference publishes no throughput numbers (see BASELINE.md); the verdict
gate is violation-row exactness versus the Lean semantics (pytest suite) and
this scaling criterion.
""" + tail)
    print(f"wrote {baseline_path}")


if __name__ == "__main__":
    main()
