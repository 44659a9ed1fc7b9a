"""Bucketed tables: co-located (shuffle-free) joins for repeated big-big
joins on a stable key — the 100 TB alternative to broadcast when neither
side is small (SURVEY.md §4: pre-partitioning / bucketing for co-located
joins).

Spark bucketing rides the session catalog (``saveAsTable``): both sides
bucketed by the same key into the same bucket count join with NO Exchange —
each task reads matching bucket files from both tables. Verified by
tests/test_bucketing.py asserting the physical plan has zero shuffles.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(df: DataFrame, table: str, key: str, buckets: int,
                   sort_by: str | None = None) -> None:
    """Persist as a bucketed (optionally sorted) catalog table."""
    w = df.write.mode("overwrite").bucketBy(buckets, key)
    if sort_by:
        w = w.sortBy(sort_by)
    w.saveAsTable(table)


def colocated_join(spark: SparkSession, left_table: str, right_table: str,
                   key: str, how: str = "inner") -> DataFrame:
    """Join two same-bucketed tables on their bucket key. With matching
    bucket specs Catalyst plans a SortMergeJoin with no Exchange on either
    side."""
    return spark.table(left_table).join(spark.table(right_table), on=key, how=how)
