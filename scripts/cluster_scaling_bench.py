"""Executor-count scaling evidence, the north rule's literal shape:
the SAME validation job submitted via ``spark-submit --py-files
engine.zip`` at two cluster sizes — N and 4N separate executor JVMs
(``local-cluster[1,C,mem]`` vs ``local-cluster[4,C,mem]``) — on the same
input, reporting throughput at both plus scaling efficiency (>= 0.8).

This complements scripts/scaling_bench.py (thread-count proxy inside one
JVM): here each executor is a real separate JVM with its own heap,
launched by a real Worker, fed over the real Netty shuffle/broadcast
paths, and the library arrives via the zip exactly as on a cluster.
Cores per executor default to 2 so the 4N point stays in the regime
where this box's memory bandwidth is not the limiter (see
BENCH/BASELINE.md: the 8->32-core ceiling is the box, not the engine).

Usage: python scripts/cluster_scaling_bench.py [n_docs] [cores_per_exec]
Prints a JSON summary and rewrites the "Executor-count scaling" section
of BENCH/BASELINE.md.
"""
from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

SECTION = "## Executor-count scaling via spark-submit (r5, north-rule literal)"


def ensure_dataset(n_docs: int) -> str:
    path = f"/tmp/spark_graft_spans_{n_docs}"
    if not os.path.exists(os.path.join(path, "_SUCCESS")):
        from pyspark.sql import SparkSession
        from json_schema_lean_spark.sources.spansgen import spans_documents
        spark = (SparkSession.builder.master("local[32]")
                 .config("spark.driver.memory", "48g")
                 .config("spark.ui.enabled", "false").getOrCreate())
        spark.sparkContext.setLogLevel("ERROR")
        tmp = f"{path}.tmp-{os.getpid()}"
        for stale in (path, tmp):
            if os.path.exists(stale):
                shutil.rmtree(stale)
        spans_documents(spark, n_docs, partitions=128) \
            .write.mode("overwrite").parquet(tmp)
        os.rename(tmp, path)
        spark.stop()
    return path


def submit(n_exec: int, cores: int, zip_path: str, job_path: str,
           data_path: str, runs: int = 5) -> dict:
    """spark-submit the child at local-cluster[n_exec,cores,mem] from a
    neutral cwd so zip-only imports are the only way the library loads."""
    mem_mb = 6144
    cmd = [
        "spark-submit",
        "--master", f"local-cluster[{n_exec},{cores},{mem_mb}]",
        "--py-files", zip_path,
        "--conf", "spark.executor.memory=5g",
        "--conf", "spark.driver.memory=6g",
        "--conf", "spark.ui.enabled=false",
        "--conf", "spark.sql.adaptive.enabled=true",
        "--conf", f"spark.sql.shuffle.partitions={max(n_exec * cores * 2, 8)}",
        "--conf", "spark.sql.files.maxPartitionBytes=8m",
        "--conf",
        "spark.executor.extraJavaOptions=-XX:ReservedCodeCacheSize=512m",
        "--conf",
        "spark.driver.extraJavaOptions=-XX:ReservedCodeCacheSize=512m",
        job_path, data_path, str(runs),
    ]
    out = subprocess.run(cmd, capture_output=True, text=True, cwd="/tmp",
                         timeout=1800)
    for line in reversed(out.stdout.strip().splitlines()):
        if line.startswith("{"):
            return json.loads(line)
    raise RuntimeError(
        f"no JSON from spark-submit ({n_exec} executors):\n"
        f"stdout tail: {out.stdout[-2000:]}\nstderr tail: {out.stderr[-2000:]}")


def main() -> None:
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 3_000_000
    cores = int(sys.argv[2]) if len(sys.argv) > 2 else 2

    data_path = ensure_dataset(n_docs)

    # stage zip + job OUTSIDE the repo so the submitted script's dirname
    # cannot put the checkout on sys.path (same neutrality proof as the
    # r5 spark-submit deployment run)
    stage = "/tmp/spark_graft_submit"
    os.makedirs(stage, exist_ok=True)
    zip_path = os.path.join(stage, "engine.zip")
    from scripts.build_engine_zip import build
    build(zip_path)
    job_path = os.path.join(stage, "cluster_scaling_job.py")
    shutil.copyfile(os.path.join(REPO, "scripts/cluster_scaling_job.py"),
                    job_path)

    lo = submit(1, cores, zip_path, job_path, data_path)
    hi = submit(4, cores, zip_path, job_path, data_path)
    assert (lo["docs"], lo["valid"], lo["viols"]) == \
        (hi["docs"], hi["valid"], hi["viols"]), (lo, hi)
    speedup = lo["best_sec"] / hi["best_sec"]
    eff = speedup / 4.0
    summary = {"n_docs": lo["docs"], "one_executor": lo,
               "four_executors": hi, "speedup": round(speedup, 3),
               "scaling_efficiency": round(eff, 3)}
    print(json.dumps(summary))

    md = f"""{SECTION}

The rule's literal deployment + scaling shape, one-box edition: the
identical fused-validation job (verdicts + violation counts over the
{lo['docs']:,}-doc interleaved spans table) submitted with
`spark-submit --py-files engine.zip scripts/cluster_scaling_job.py`
(staged in /tmp; zip-only imports, `engine_zip_import` asserted true in
the child) at two cluster sizes: **N=1 and 4N=4 separate executor JVMs**
({cores} cores, 5g heap each) under `local-cluster` — real Worker
processes, real executor launch, real Netty transport, not threads.

| cluster size | best sec | docs/sec | runs (sec) | steal cores/run |
|---|---|---|---|---|
| 1 executor x {cores} cores | {lo['best_sec']} | {lo['docs_per_sec']:,} | {lo['times']} | {lo['steal_cores']} |
| 4 executors x {cores} cores | {hi['best_sec']} | {hi['docs_per_sec']:,} | {hi['times']} | {hi['steal_cores']} |

- identical results both sizes: {lo['docs']:,} docs, {lo['valid']:,}
  valid, {lo['viols']:,} violation rows (asserted by the harness)
- speedup 1 -> 4 executors: **{speedup:.2f}x** (ideal 4x)
- **scaling efficiency: {eff:.3f}** (target >= 0.8)
- steal during best runs: {lo['best_steal_cores']} / {hi['best_steal_cores']}
  cores (see the variance protocol below — re-run the pair if dirty)

Caveat, same as everywhere on this box: all 4 executors share one
machine's memory bandwidth, so this still *understates* a real
4-machine cluster, which adds a memory bus per executor host.
"""
    baseline_path = os.path.join(REPO, "BENCH/BASELINE.md")
    old = open(baseline_path).read()
    if SECTION in old:
        start = old.index(SECTION)
        nxt = old.find("\n## ", start + len(SECTION))
        old = old[:start] + old[nxt + 1:] if nxt >= 0 else old[:start]
    # insert after the first section (the thread-level table) — i.e.
    # before the second "## " heading — so the two scaling views sit
    # together at the top
    second = old.find("\n## ")
    if second >= 0:
        new = old[:second + 1] + md + "\n" + old[second + 1:]
    else:
        new = old + "\n" + md
    with open(baseline_path, "w") as f:
        f.write(new)
    print(f"wrote {baseline_path}")


if __name__ == "__main__":
    main()
