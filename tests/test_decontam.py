"""Benchmark decontamination (operators/decontam.py)."""

import pytest
from pyspark.sql import functions as F

from json_schema_lean_spark.operators.decontam import benchmark_overlap


@pytest.fixture(scope="module")
def corpus(spark):
    rows = [
        (0, "the quick brown fox jumps over the lazy dog today"),
        (1, "completely unrelated sentence with different words entirely"),
        (2, "the quick brown fox jumps over something else instead ok"),
        (3, "tiny"),
    ]
    return spark.createDataFrame(rows, "doc_id: long, text: string")


@pytest.fixture(scope="module")
def bench(spark):
    return spark.createDataFrame(
        [("the quick brown fox jumps over the lazy dog today",)], "text: string")


def test_exact_benchmark_doc_is_fully_contaminated(corpus, bench):
    out = {r.doc_id: r for r in
           benchmark_overlap(corpus, bench, n=5).collect()}
    assert out[0].overlap_frac == 1.0
    assert out[1].n_matched == 0 and out[1].overlap_frac == 0.0
    # doc 2 shares the leading 5-gram window(s) only
    assert 0 < out[2].overlap_frac < 1.0
    assert out[3].n_grams == 1 and out[3].n_matched == 0  # <n fallback


def test_counts_are_distinct_within_doc(bench, spark):
    # 10 tokens -> 6 windows, but window 6 repeats window 1: 5 distinct
    # grams, exactly one of which ("the quick brown fox jumps") is in
    # the benchmark — repetition must not double-count
    dup = spark.createDataFrame(
        [(9, "the quick brown fox jumps the quick brown fox jumps")],
        "doc_id: long, text: string")
    row = benchmark_overlap(dup, bench, n=5).collect()[0]
    assert (row.n_grams, row.n_matched) == (5, 1)


def test_broadcast_plan_and_shuffled_fallback(corpus, bench):
    broad = benchmark_overlap(corpus, bench, n=5)._jdf \
        .queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in broad and "LeftSemi" in broad
    shuffled = benchmark_overlap(corpus, bench, n=5, broadcast_bench=False)
    assert shuffled.count() == 4  # same result shape without the hint


def test_partition_insensitive(corpus, bench):
    a = sorted(map(tuple, benchmark_overlap(corpus, bench, n=5).collect()))
    b = sorted(map(tuple, benchmark_overlap(
        corpus.repartition(7), bench, n=5).collect()))
    assert a == b
