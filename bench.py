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
in extras as <name>_runs_sec. Round-1 numbers were cold single runs;
round-2 reported best-of-three only.

Headline set:
- spans_validate : flagship columnar validation of the generated interleaved
                   spans table (n_docs scales with sf; ~8 spans/doc) — the
                   north_rule workload; docs/sec reported separately
- events_props   : Arrow-batch JSON validation of events.props
- q1_pricing     : aggregation throughput (TPC-H Q1 shape)
- exact_dedup    : fingerprint groupBy on documents
- ann_topk       : brute-force cosine top-k over embeddings
- ref_integrity  : spans media_ref anti-join vs broadcast asset catalog
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


def force(df) -> int:
    """Fully execute a plan; returns row count via a cheap count agg."""
    return df.select(F.count(F.lit(1))).collect()[0][0]


def main() -> None:
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
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    timings: dict[str, float] = {}
    cold: dict[str, float] = {}
    extras: dict[str, float] = {}

    def bench(name: str, fn) -> None:
        # r2 methodology: each query runs three times; the reported time is
        # the BEST run — steady state, excluding both one-time plan
        # compile/JIT and transient shared-box contention spikes (measured
        # 2.7s vs 26.5s for the same warm query under a neighbor's load).
        # Raw times are kept in extras for transparency.
        runs = []
        for _ in range(3):
            t0 = time.perf_counter()
            rows = fn()
            runs.append(time.perf_counter() - t0)
        timings[name] = round(min(runs), 3)
        cold[name] = round(runs[0], 3)
        extras[f"{name}_rows"] = rows
        extras[f"{name}_runs_sec"] = [round(t, 3) for t in runs]

    # spans table is the north_rule input: generate once, persist to parquet
    # so validation measures the engine, not the generator
    spans_path = f"/tmp/spark_graft_spans_{n_docs}"
    if not os.path.exists(spans_path):
        spans_documents(spark, n_docs, partitions=cpus * 2) \
            .write.mode("overwrite").parquet(spans_path)
    spans = spark.read.parquet(spans_path)

    def run_spans():
        validated = validate_spans_best(spans, SPAN_SCHEMA, keep_cols=["doc_id"])
        return validated.select(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("valid").cast("long")).alias("ok")).collect()[0]

    spans_runs = []
    for _ in range(3):
        t0 = time.perf_counter()
        n_valid = run_spans()
        spans_runs.append(time.perf_counter() - t0)
    spans_sec = min(spans_runs)
    timings["spans_validate"] = round(spans_sec, 3)
    cold["spans_validate"] = round(spans_runs[0], 3)
    extras["spans_validate_runs_sec"] = [round(t, 3) for t in spans_runs]
    extras["spans_docs"] = n_valid["n"]
    extras["spans_valid"] = n_valid["ok"]
    extras["docs_per_sec"] = round(n_valid["n"] / spans_sec, 1)

    from json_schema_lean_spark.operators.validation import violation_rows_fast
    bench("violation_rows", lambda: force(
        violation_rows_fast(spans, SPAN_SCHEMA, id_cols=["doc_id"])))

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

    total = round(sum(timings.values()), 3)
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
    print(json.dumps({
        "metric": "headline_total_sec",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "queries_cold": cold,
        "cold_total_sec": round(sum(cold.values()), 3),
        "sf": sf,
        "cpus": cpus,
        "extras": extras,
    }))


if __name__ == "__main__":
    main()
