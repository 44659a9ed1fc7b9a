"""Benchmark decontamination: flag corpus documents sharing word n-grams
with an evaluation/benchmark set (the standard pretraining hygiene step —
GPT-3-style 13-gram overlap; n is a knob because real corpora tune it).

Scale design: the benchmark side is an eval suite — tiny next to a
100 TB corpus — so its distinct n-gram set is **broadcast** and the
corpus side streams through a broadcast LEFT SEMI join with no
corpus-side shuffle for the matching itself; the only shuffles are the
two doc_id aggregations (map-side combined). Pass
``broadcast_bench=False`` for a pathologically large benchmark set and
the same plan runs as a shuffled semi-join. No reference analog (the
reference validates; pipeline extension like dedup/packing)."""
from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from .text import word_ngrams


def benchmark_overlap(docs: DataFrame, bench: DataFrame,
                      text_col: str = "text", id_col: str = "doc_id",
                      n: int = 13,
                      broadcast_bench: bool = True) -> DataFrame:
    """Per-document overlap with the benchmark set's word n-grams:
    ``(id_col, n_grams, n_matched, overlap_frac)``. A document counts a
    gram at most once (distinct within doc) — the fraction is the share
    of the document's distinct grams that appear anywhere in the
    benchmark, which is partition-insensitive and engine-portable."""
    # r6: n-gram construction (transform + array_join per gram) is the
    # dominant per-row cost and evaluates map-side before any exchange;
    # spread small/unsplittable scans first (guide §2.5 — no-op at
    # production scale where the corpus arrives in thousands of splits)
    from ..parallelism import scale_partitions
    docs = scale_partitions(docs)
    bench = scale_partitions(bench)
    grams = lambda c: F.array_distinct(word_ngrams(c, n))  # noqa: E731
    bench_grams = (bench.select(
        F.explode(grams(F.col(text_col))).alias("gram")).distinct())
    if broadcast_bench:
        bench_grams = F.broadcast(bench_grams)
    doc_grams = docs.select(
        id_col, F.explode(grams(F.col(text_col))).alias("gram"))
    matched = (doc_grams.join(bench_grams, "gram", "left_semi")
               .groupBy(id_col)
               .agg(F.count(F.lit(1)).alias("n_matched")))
    totals = docs.select(id_col, F.size(grams(F.col(text_col)))
                         .cast("long").alias("n_grams"))
    out = (totals.join(matched, id_col, "left")
           .withColumn("n_matched",
                       F.coalesce(F.col("n_matched"), F.lit(0)).cast("long")))
    return out.withColumn(
        "overlap_frac",
        F.round(F.col("n_matched") / F.col("n_grams"), 6))
