"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR on
local[$SPARK_GRAFT_CPUS]; prints ONE JSON line.

Timing (r3): each query runs three times. TWO numbers are reported per
query: ``queries`` carries the BEST run (steady state — excludes one-time
whole-stage-codegen/JIT and shared-box contention spikes, measured 2.7s vs
26.5s for the same warm query under neighbor load) and ``queries_cold``
carries the FIRST run — the only cost a one-shot batch job pays (plan
analysis + codegen + JIT included; the JVM is process-fresh for the first
query and progressively warmer for later ones, so per-query cold numbers
are upper-bounded by a truly fresh JVM only for the first). Raw runs stay
in extras as <name>_runs_sec.

Contention telemetry (r4, after BENCH_r03's 3x phantom regression —
neighbor load on the shared box inflated a 1.0s warm query to 15.5s):
every run records wall time, the CPU seconds of our WHOLE process tree
(driver + JVM + pyspark worker descendants, from /proc/<pid>/stat —
``time.process_time()`` only covers the Python driver, which does ~none
of the work in PySpark), and the EXTERNAL busy cores on the machine
(machine-wide /proc/stat busy minus our tree's share).
A query whose warm runs disperse >2x, or whose best run saw significant
external load, is re-run up to 3 extra times; if pressure persists the
artifact says so in ``contention_flagged_queries`` instead of silently
publishing a phantom regression.

Headline set:
- spans_validate : flagship columnar validation of the generated interleaved
                   spans table (n_docs scales with sf; ~8 spans/doc) — the
                   north_rule workload; docs/sec reported separately
- events_props   : Arrow-batch JSON validation of events.props
- q1_pricing     : aggregation throughput (TPC-H Q1 shape)
- exact_dedup    : fingerprint groupBy on documents
- ann_topk       : brute-force cosine top-k over embeddings
- ref_integrity  : spans media_ref anti-join vs broadcast asset catalog

Extras additionally carry an sf1-scale steady-state point
(``spans_sf1_docs_per_sec``, 6M docs) so headline-vs-scale lives in ONE
artifact; disable with SPARK_GRAFT_SF1=0 when iterating.
"""

from __future__ import annotations

import json
import os
import sys
import time

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from json_schema_lean_spark.operators.dedup import exact_dup_groups  # noqa: E402
from json_schema_lean_spark.operators.referential import span_media_integrity  # noqa: E402
from json_schema_lean_spark.operators.similarity import brute_force_topk  # noqa: E402
from json_schema_lean_spark.operators.validation import (  # noqa: E402
    validate_json_column,
    validate_spans_best,
)
from json_schema_lean_spark.sources.spansgen import (  # noqa: E402
    SPAN_SCHEMA,
    asset_catalog,
    spans_documents,
)
from __spark_entry__ import EVENT_PROPS_SCHEMA  # noqa: E402

_CLK_TCK = os.sysconf("SC_CLK_TCK")


def _tree_cpu_sec() -> float:
    """CPU seconds owned by THIS process tree: the Python driver, the Spark
    JVM child, and every descendant — crucially the pyspark.daemon/worker
    processes that burn the CPU of pandas-UDF stages (they are
    grandchildren of the driver; counting only the JVM made UDF-heavy
    queries look like NEIGHBOR load and self-flag as contended).
    Includes each process's reaped-children time (cutime+cstime) so a
    worker that dies between samples still shows up in its parent."""
    me = os.getpid()
    ppid_of: dict[int, int] = {}
    cpu_of: dict[int, float] = {}
    for p in os.listdir("/proc"):
        if not p.isdigit():
            continue
        try:
            with open(f"/proc/{p}/stat") as f:
                tail = f.read().rsplit(")", 1)[1].split()
            ppid_of[int(p)] = int(tail[1])
            # utime stime cutime cstime = tail[11..14]
            cpu_of[int(p)] = sum(int(tail[i]) for i in (11, 12, 13, 14)) \
                / _CLK_TCK
        except (OSError, IndexError, ValueError):
            continue
    total = 0.0
    for pid, cpu in cpu_of.items():
        q = pid
        for _ in range(64):  # bounded ancestor walk
            if q == me:
                total += cpu
                break
            q = ppid_of.get(q, 0)
            if q <= 1:
                break
    return total


def _machine_busy_sec() -> float:
    """Machine-wide busy CPU seconds (all cores summed; /proc/stat line 1:
    user nice system idle iowait irq softirq steal ...) — everything except
    idle+iowait counts as busy."""
    try:
        with open("/proc/stat") as f:
            vals = [int(x) for x in f.readline().split()[1:]]
        return (sum(vals) - vals[3] - vals[4]) / _CLK_TCK
    except (OSError, IndexError, ValueError):
        return 0.0


def _steal_sec() -> float:
    """Hypervisor steal seconds (/proc/stat field 8): CPU time the HOST ran
    someone else while our vCPUs wanted to run. This sandbox is a guest on
    a shared host, and host-level neighbors are invisible to every
    guest-side counter except this one — measured here: identical 6M-doc
    runs in ONE warm JVM swung 89 -> 3,177 tree-CPU-seconds with
    external_cores ~0, no GC growth (<0.7 s pauses) and a half-empty code
    cache, i.e. the extra 'CPU' was our threads stalling on host-contended
    memory plus outright vCPU preemption. Per-run steal makes that state
    visible in the artifact instead of reading as an engine regression."""
    try:
        with open("/proc/stat") as f:
            return int(f.readline().split()[8]) / _CLK_TCK
    except (OSError, IndexError, ValueError):
        return 0.0


def force(df) -> int:
    """Fully execute a plan; returns row count via a cheap count agg."""
    return df.select(F.count(F.lit(1))).collect()[0][0]


def measure_runs(fn, ext_cores_cap: float, base_runs: int = 3,
                 max_extra: int = 3) -> dict:
    """Shared timed-run loop with contention telemetry (r5: factored out of
    bench() so the sf1 child self-documents identically — its runs swung
    [190, 34, 10.5] vs [102, 32, 3.8] across invocations with a WARM page
    cache, i.e. neighbor load, which an un-instrumented child could not
    prove). Each run records wall, our whole-tree CPU, loadavg1, and
    external busy cores; dispersed-or-pressured results re-run up to
    ``max_extra`` times, and a fresh quiet run near the best confirms it
    clean. Returns runs/loads/tree_cpu/ext_cores/result/flagged."""
    runs: list[float] = []
    loads: list[float] = []
    tree_cpu: list[float] = []
    ext_cores: list[float] = []
    steal_cores: list[float] = []
    result = [None]

    def one():
        loads.append(round(os.getloadavg()[0], 2))
        busy0 = _machine_busy_sec()
        steal0 = _steal_sec()
        c0 = _tree_cpu_sec()
        t0 = time.perf_counter()
        result[0] = fn()
        wall = time.perf_counter() - t0
        ours = _tree_cpu_sec() - c0
        ext = max(0.0, _machine_busy_sec() - busy0 - ours)
        runs.append(round(wall, 3))
        tree_cpu.append(round(ours, 2))
        ext_cores.append(round(ext / max(wall, 1e-6), 2))
        steal_cores.append(round((_steal_sec() - steal0) / max(wall, 1e-6),
                                 2))

    for _ in range(base_runs):
        one()

    def best_contended() -> bool:
        warm = runs[1:]
        dispersed = max(warm) > 2.0 * min(warm) if len(warm) > 1 else False
        best = runs.index(min(runs))
        # >1 stolen core-equivalent during the best run: even the
        # published number was taken under hypervisor preemption
        return (dispersed or ext_cores[best] > ext_cores_cap
                or steal_cores[best] > 1.0)

    extra = 0
    confirmed_clean = False
    while best_contended() and extra < max_extra:
        one()
        extra += 1
        # a fresh quiet run near the current best refutes the stale
        # contended history — stop early AND clear the flag
        if (runs[-1] <= 1.3 * min(runs) and ext_cores[-1] <= ext_cores_cap
                and steal_cores[-1] <= 1.0):
            confirmed_clean = True
            break

    return {
        "runs": runs, "loads": loads, "tree_cpu": tree_cpu,
        "ext_cores": ext_cores, "steal_cores": steal_cores,
        "result": result[0], "extra": extra,
        "flagged": best_contended() and not confirmed_clean,
    }


def retry_decision(prev_best: float, m: dict) -> tuple[float, bool]:
    """End-of-bench weather-retry policy (pure, unit-tested): given the
    previously published best and a fresh short measurement, return the
    new published best and whether to clear the contention flag. Unflag
    only when the CLEAN retry corroborates the published number — either
    it sets the new best itself, or it lands within 1.3x of it; a retry
    that is clean but much slower leaves the flag standing, since the
    earlier (contended) best then has no corroboration, and a retry that
    is itself flagged never clears anything."""
    best = round(min(m["runs"]), 3)
    new_best = min(prev_best, best)
    return new_best, (not m["flagged"]) and best <= 1.3 * new_best


def _ensure_spans_dataset(spark, path: str, n_docs: int,
                          partitions: int) -> None:
    """Generate the spans parquet at ``path`` unless a COMPLETE copy exists.
    Completeness = Spark's ``_SUCCESS`` marker: a previously killed bench
    leaves a partial directory (part files without the marker) that a bare
    os.path.exists() check would silently reuse, corrupting every doc count
    and docs/sec it feeds (ADVICE r4). Written to a temp dir and atomically
    renamed so a kill during THIS generation can't create a new partial."""
    if os.path.exists(os.path.join(path, "_SUCCESS")):
        return
    import shutil
    tmp = f"{path}.tmp-{os.getpid()}"
    for stale in (path, tmp):
        if os.path.exists(stale):
            shutil.rmtree(stale)
    spans_documents(spark, n_docs, partitions=partitions) \
        .write.mode("overwrite").parquet(tmp)
    os.rename(tmp, path)


def _pretouch(path: str) -> float:
    """Read every byte of the dataset once so timed runs measure compute,
    not this sandbox's disk (first-touch of a ~500 MB parquet varies
    40-125 s purely on page-cache state). Returns seconds spent — reported
    as <name>_io_pretouch_sec so the I/O cost stays visible, separately
    from the compute numbers."""
    t0 = time.perf_counter()
    buf = bytearray(1 << 20)
    for root, _dirs, names in os.walk(path):
        for n in names:
            try:
                with open(os.path.join(root, n), "rb", buffering=0) as f:
                    while f.readinto(buf):
                        pass
            except OSError:
                continue
    return round(time.perf_counter() - t0, 3)


def _sf1_child() -> None:
    """Fresh-JVM child (SPARK_GRAFT_SF1_CHILD=1): the 6M-doc steady-state
    spans_validate point. Prints one JSON line of extras."""
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName("json-schema-lean-spark-bench-sf1")
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
    sf1_docs = 6_000_000
    sf1_path = f"/tmp/spark_graft_spans_{sf1_docs}"
    _ensure_spans_dataset(spark, sf1_path, sf1_docs, partitions=cpus * 4)
    # I/O vs compute split (VERDICT r4 #2): the raw first-touch read of
    # this ~500 MB parquet swings 3.5-155 s with page-cache state on this
    # sandbox's disk, which made the published sf1 point look like a
    # regression whenever the cache was cold. Pre-touch the bytes ONCE
    # (timed, reported) so the three timed runs measure the engine.
    pretouch_sec = _pretouch(sf1_path)
    spans_sf1 = spark.read.parquet(sf1_path)
    # JIT warm-up (r5): a fresh JVM's FIRST full pass used to burn
    # 2,200-4,000 CPU-s (114-190 s wall) executing the giant generated
    # methods in the interpreter while the JIT tiers installed; three
    # passes over a SEPARATE 60k-doc parquet dir — read the same way, so
    # the generated stage source (and thus the JIT-compiled methods) is
    # IDENTICAL to the full run's; a limit() of the big input is NOT,
    # because the fused LocalLimit changes the class — complete the same
    # compilations in ~7 s. The honest one-shot cost = warmup + run 0,
    # reported separately instead of poisoning the throughput point.
    from json_schema_lean_spark.operators.validation import (
        warm_validation_codegen,
    )
    warm_path = "/tmp/spark_graft_spans_60000"
    _ensure_spans_dataset(spark, warm_path, 60_000, partitions=8)
    warmup_sec = warm_validation_codegen(spark.read.parquet(warm_path),
                                         SPAN_SCHEMA, keep_cols=["doc_id"])

    # each run rebuilds the DataFrame: re-collecting ONE DataFrame under
    # AQE reuses its materialized shuffle stages (measured 0.07 s "runs" —
    # cached results, not work). A rebuilt plan lowers to the same
    # generated source, so the janino class cache + JIT stay warm while
    # the job genuinely re-executes.
    def run_once():
        return (validate_spans_best(spans_sf1, SPAN_SCHEMA,
                                    keep_cols=["doc_id"])
                .select(F.count(F.lit(1)).alias("n"),
                        F.sum(F.col("valid").cast("long")).alias("ok"))
                .collect()[0])

    # full telemetry + contention re-runs, same loop as the parent (r5):
    # with the page cache pre-touched this point still swung 4-190 s per
    # run on this multi-tenant box, and without per-run external-cores
    # numbers the artifact could not say WHY. 5 base runs (not 3): this
    # box's memory bandwidth is the scaling ceiling (BENCH/BASELINE.md),
    # so even a sub-core neighbor blip doubles a run's CPU-seconds — the
    # published best-of needs enough draws to catch a quiet window
    m = measure_runs(run_once, ext_cores_cap=max(
        2.0, 0.15 * (os.cpu_count() or cpus)), base_runs=5)
    row = m["result"]
    print(json.dumps({
        "spans_sf1_docs": row["n"],
        "spans_sf1_valid": row["ok"],
        "spans_sf1_io_pretouch_sec": pretouch_sec,
        "spans_sf1_jit_warmup_sec": warmup_sec,
        "spans_sf1_one_shot_sec": round(warmup_sec + m["runs"][0], 3),
        "spans_sf1_runs_sec": m["runs"],
        "spans_sf1_loadavg1": m["loads"],
        "spans_sf1_tree_cpu_sec": m["tree_cpu"],
        "spans_sf1_external_cores": m["ext_cores"],
        "spans_sf1_steal_cores": m["steal_cores"],
        "spans_sf1_contention_flagged": m["flagged"],
        "spans_sf1_docs_per_sec": round(row["n"] / min(m["runs"]), 1),
    }))


def main() -> None:
    if os.environ.get("SPARK_GRAFT_SF1_CHILD") == "1":
        _sf1_child()
        return
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    if not os.path.isdir(sf_dir):
        print(json.dumps({"error": f"SF dir not found: {sf_dir}"}))
        sys.exit(2)
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    try:
        sf = float(sf_dir.rstrip("/").rsplit("sf", 1)[-1])
    except ValueError:
        sf = 0.01
    n_docs = min(int(os.environ.get("SPARK_GRAFT_MAX_DOCS", 3_000_000)),
                 max(10_000, int(6_000_000 * sf)))  # 600k docs at sf0.1

    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName("json-schema-lean-spark-bench")
        .config("spark.sql.shuffle.partitions", str(max(cpus, 8)))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.files.maxPartitionBytes", "4m")
        .config("spark.driver.memory", "48g")
        # ~30 query compilations x 3 runs overflow the default 240m JVM
        # code cache, silently disabling JIT for later queries (measured:
        # the sf1 plan fell from 4.6s to 69s in-process)
        .config("spark.driver.extraJavaOptions",
                "-XX:ReservedCodeCacheSize=512m")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    start_load = round(os.getloadavg()[0], 2)

    timings: dict[str, float] = {}
    cold: dict[str, float] = {}
    extras: dict = {}
    flagged: list[str] = []

    # External pressure a run can absorb before we call it contended:
    # our own JVM legitimately uses ~all cores, so "external" is what the
    # REST of the machine burned during the run, in average cores.
    ext_cores_cap = max(2.0, 0.15 * (os.cpu_count() or cpus))

    query_fns: dict = {}

    def bench(name: str, fn, max_extra: int = 3) -> None:
        query_fns[name] = fn
        m = measure_runs(fn, ext_cores_cap, max_extra=max_extra)
        timings[name] = round(min(m["runs"]), 3)
        cold[name] = m["runs"][0]
        extras[f"{name}_rows"] = m["result"]
        extras[f"{name}_runs_sec"] = m["runs"]
        extras[f"{name}_loadavg1"] = m["loads"]
        extras[f"{name}_tree_cpu_sec"] = m["tree_cpu"]
        extras[f"{name}_external_cores"] = m["ext_cores"]
        extras[f"{name}_steal_cores"] = m["steal_cores"]
        if m["extra"]:
            extras[f"{name}_contention_reruns"] = m["extra"]
        if m["flagged"]:
            flagged.append(name)

    # spans table is the north_rule input: generate once, persist to parquet
    # so validation measures the engine, not the generator
    spans_path = f"/tmp/spark_graft_spans_{n_docs}"
    _ensure_spans_dataset(spark, spans_path, n_docs, partitions=cpus * 2)
    extras["spans_io_pretouch_sec"] = _pretouch(spans_path)
    spans = spark.read.parquet(spans_path)

    def run_spans():
        validated = validate_spans_best(spans, SPAN_SCHEMA, keep_cols=["doc_id"])
        return validated.select(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("valid").cast("long")).alias("ok")).collect()[0]

    bench("spans_validate", run_spans)
    n_valid = extras.pop("spans_validate_rows")
    extras["spans_docs"] = n_valid["n"]
    extras["spans_valid"] = n_valid["ok"]
    extras["docs_per_sec"] = round(n_valid["n"] / timings["spans_validate"], 1)

    # violation_rows_best: fused-verdict prefilter screens passing docs
    # before the heavy per-span collector runs (row-identical to
    # violation_rows_fast, pytest-pinned; measured 2-3.7x faster warm at
    # 600k/6M docs because the collector expression is too large for
    # whole-stage codegen and only rare failing docs should pay it)
    from json_schema_lean_spark.operators.validation import violation_rows_best
    bench("violation_rows", lambda: force(
        violation_rows_best(spans, SPAN_SCHEMA, id_cols=["doc_id"])))

    bench("events_props", lambda: force(
        validate_json_column(
            spark.read.parquet(f"{sf_dir}/events.parquet"), "props",
            EVENT_PROPS_SCHEMA, verdict_only=True).where(F.col("valid"))))

    bench("q1_pricing", lambda: force(
        spark.read.parquet(f"{sf_dir}/lineitem.parquet")
        .where(F.col("l_shipdate") <= F.lit("1998-09-01"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(F.sum("l_quantity"), F.sum("l_extendedprice"), F.count(F.lit(1)))))

    bench("exact_dedup", lambda: force(
        exact_dup_groups(spark.read.parquet(f"{sf_dir}/documents.parquet"),
                         "text", "doc_id")))

    bench("ann_topk", lambda: force(
        brute_force_topk(
            spark.read.parquet(f"{sf_dir}/embeddings.parquet"),
            spark.read.parquet(f"{sf_dir}/embeddings.parquet")
                 .where(F.col("vec_id") < 5), k=5)))

    bench("ref_integrity", lambda: force(
        span_media_integrity(spans, asset_catalog(spark))))

    # end-of-bench weather retry (r5): a flagged query exhausted its
    # re-runs inside ONE bad window (host steal / bandwidth pressure —
    # see BENCH/BASELINE.md), but the bench spans minutes and the weather
    # often clears; one more short measurement per flagged query either
    # publishes a CLEAN number (and unflags it, recording why) or leaves
    # the flag standing with the retry telemetry beside it.
    for name in list(flagged):
        if name not in query_fns:
            continue
        m = measure_runs(query_fns[name], ext_cores_cap, base_runs=2,
                         max_extra=1)
        extras[f"{name}_retry_runs_sec"] = m["runs"]
        extras[f"{name}_retry_steal_cores"] = m["steal_cores"]
        timings[name], unflag = retry_decision(timings[name], m)
        if unflag:
            flagged.remove(name)
            extras[f"{name}_weather_cleared"] = True
    extras["docs_per_sec"] = round(extras["spans_docs"]
                                   / timings["spans_validate"], 1)

    # sf1 steady-state point (verdict r3 #5): at sf0.1 the headline is
    # dominated by fixed per-job cost; a 6M-doc spans_validate run shows the
    # amortized throughput in the SAME artifact. Runs in a FRESH subprocess
    # JVM: measured in-process, the ~30 prior query compilations exhaust the
    # JVM code cache and the sf1 plan runs interpreted (69s instead of ~4s)
    # — a fresh JVM is also the honest "one-shot batch job" being claimed.
    if os.environ.get("SPARK_GRAFT_SF1", "1") == "1" and sf >= 0.05:
        import subprocess
        # the parent is done with Spark: release its JVM (heap + 32 idle
        # threads) so the child's fresh JVM measures alone on the box
        spark.stop()
        env = dict(os.environ, SPARK_GRAFT_SF1_CHILD="1",
                   SPARK_GRAFT_CPUS=str(cpus))
        try:
            child = subprocess.run(
                [sys.executable, os.path.abspath(__file__)], env=env,
                capture_output=True, text=True, timeout=1800)
            extras.update(json.loads(child.stdout.strip().splitlines()[-1]))
            if extras.get("spans_sf1_contention_flagged"):
                flagged.append("spans_sf1")
        except Exception as exc:  # never lose the headline artifact
            extras["spans_sf1_error"] = f"{type(exc).__name__}: {exc}"

    total = round(sum(timings.values()), 3)
    extras["loadavg_at_start"] = start_load
    extras["machine_cores"] = os.cpu_count()
    # surface the latest two-parallelism scaling evidence (north_rule
    # criterion; produced by scripts/scaling_bench.py into BENCH/BASELINE.md)
    # directly in the bench JSON so one artifact carries both
    import re as _re
    try:
        _bp = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                           "BENCH", "BASELINE.md")
        with open(_bp) as _f:
            _m = _re.search(r"scaling efficiency: ([0-9]+\.[0-9]+)", _f.read())
        if _m:
            extras["scaling_efficiency_low_to_high_cores"] = float(_m.group(1))
    except Exception:  # the scrape must never cost a finished bench run
        pass
    result = {
        "metric": "headline_total_sec",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "queries_cold": cold,
        "cold_total_sec": round(sum(cold.values()), 3),
        "sf": sf,
        "cpus": cpus,
        "contention_flagged_queries": flagged,
        "extras": extras,
    }
    # Artifact indestructibility (VERDICT r4 #1): BENCH_r04.json came back
    # `parsed: null` because the driver keeps only the TAIL of stdout and
    # the single full-telemetry JSON line was long enough for its head
    # (metric/value/queries) to be clipped. Two defenses: (a) the COMPLETE
    # result dict is written to BENCH/last_run.json, which survives any
    # stdout capture; (b) the line printed LAST is a slim variant — same
    # metric/value/queries/queries_cold, but extras reduced to its scalar
    # headline numbers (the per-run telemetry arrays are the bulk) — small
    # enough (~1.5 KB) that no tail window can cut it.
    bench_dir = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                             "BENCH")
    try:
        os.makedirs(bench_dir, exist_ok=True)
        tmp = os.path.join(bench_dir, "last_run.json.tmp")
        with open(tmp, "w") as f:
            json.dump(result, f, indent=1)
        os.replace(tmp, os.path.join(bench_dir, "last_run.json"))
        slim_extras = {k: v for k, v in extras.items()
                       if isinstance(v, (int, float, str))}
        slim_extras["full_telemetry_file"] = "BENCH/last_run.json"
        print(json.dumps(dict(result, extras=slim_extras),
                         separators=(",", ":")))
    except OSError:  # read-only checkout: still print the full artifact
        print(json.dumps(result, separators=(",", ":")))


if __name__ == "__main__":
    main()
