"""spark-submit entry point: checkpointed, resumable validation run.

    spark-submit --py-files engine.zip scripts/run_validation.py \
        --input /data/documents --schema schema.json --out /runs/r42 \
        [--spans-col spans] [--files-per-unit 32] [--run-id r42] \
        [--max-units N]   (simulate a kill / bound a run)

Local sandbox equivalent:

    python scripts/run_validation.py --input /tmp/spark_graft_spans_600000 \
        --schema - --out /tmp/run1          (- = built-in flagship schema)

Prints a one-line JSON report; exit 0 when every unit is committed.
Re-running with the same --out resumes: completed units (matching input
surrogate + schema hash + validator version) are skipped.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession

from json_schema_lean_spark.checkpointing import CheckpointedValidation
from json_schema_lean_spark.sources.spansgen import SPAN_SCHEMA


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", required=True)
    ap.add_argument("--schema", required=True,
                    help="path to schema JSON, or '-' for the flagship span schema")
    ap.add_argument("--out", required=True)
    ap.add_argument("--spans-col", default="spans")
    ap.add_argument("--files-per-unit", type=int, default=32)
    ap.add_argument("--run-id", default="run-0")
    ap.add_argument("--max-units", type=int, default=None)
    ap.add_argument("--range-partitions", type=int, default=0,
                    help="if >0, commit each unit repartitionByRange(doc_id) "
                         "into this many doc_id-disjoint, sorted output files")
    ap.add_argument("--range-col", default="doc_id")
    ap.add_argument("--concurrent-units", type=int, default=1,
                    help="driver threads processing units as overlapping "
                         "Spark jobs (default 1 = sequential); keeps the "
                         "cluster fed through each unit's write tail and "
                         "driver-side commit")
    ap.add_argument("--no-warm-start", action="store_true",
                    help="skip the pre-unit JIT warm-up pass (default: warm "
                         "on the smallest input file when units are pending)")
    ap.add_argument("--master", default=None,
                    help="override master (default: whatever spark-submit set)")
    ap.add_argument("--driver-memory", default=None,
                    help="driver heap for LOCAL runs (the builder launches "
                         "the JVM, so the conf takes effect; under "
                         "spark-submit pass --driver-memory to spark-submit "
                         "instead — a post-launch conf set is ignored)")
    args = ap.parse_args()

    schema = SPAN_SCHEMA if args.schema == "-" else json.loads(
        open(args.schema).read())

    builder = SparkSession.builder.appName("json-schema-lean-spark-validate")
    if args.master:
        builder = builder.master(args.master)
    if args.driver_memory:
        builder = builder.config("spark.driver.memory", args.driver_memory)
    spark = (builder
             .config("spark.sql.adaptive.enabled", "true")
             .config("spark.sql.adaptive.skewJoin.enabled", "true")
             # long checkpointed runs compile many generated classes; the
             # JVM's default 240m code cache overflows and silently disables
             # JIT (bench r4 measured a 15x slowdown once full). Only
             # effective for LOCAL runs (builder launches the JVM); under
             # spark-submit pass it via --conf on the executors instead.
             .config("spark.driver.extraJavaOptions",
                     "-XX:ReservedCodeCacheSize=512m")
             .getOrCreate())
    spark.sparkContext.setLogLevel("WARN")

    ck = CheckpointedValidation(
        spark, args.input, schema, args.out, spans_col=args.spans_col,
        files_per_unit=args.files_per_unit, run_id=args.run_id,
        range_partitions=args.range_partitions, range_col=args.range_col,
        warm_start=not args.no_warm_start,
        concurrent_units=args.concurrent_units)
    report = ck.run(max_units=args.max_units)
    done = report.units_skipped + report.units_processed == report.units_total
    print(json.dumps({
        "run_id": report.run_id,
        "units_total": report.units_total,
        "units_skipped": report.units_skipped,
        "units_processed": report.units_processed,
        "rows_scanned": report.rows,
        "valid_rows": report.valid,
        "violations": report.violations,
        "observed_metrics": ck.summed_observed_metrics() or None,
        "jit_warmup_sec": report.warmup_sec,
        "complete": done,
        "out": args.out,
    }))
    sys.exit(0 if done else 3)


if __name__ == "__main__":
    main()
