"""Column statistics + uniqueness checks (north_star extensions — the
reference has no aggregation surface at all, SURVEY.md §2.9).

All native Catalyst aggregates: count/avg/min/max are exact one-pass
(map-side partial aggregation = Welford-equivalent merge without Python),
``approx_count_distinct`` is Spark's HLL++ sketch merged tree-wise. No UDFs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def numeric_column_stats(df: DataFrame, cols: list[str], round_to: int = 6) -> DataFrame:
    """One row per numeric column: count, n_null, null_rate, min/max/mean.

    Single pass over the data (one job, map-side combine); the per-column
    rows are assembled with explode over a literal array, not a shuffle per
    column.
    """
    aggs = []
    for c in cols:
        aggs += [
            F.count(F.col(c)).alias(f"{c}__count"),
            F.sum(F.col(c).isNull().cast("long")).alias(f"{c}__nulls"),
            F.round(F.min(F.col(c)).cast("double"), round_to).alias(f"{c}__min"),
            F.round(F.max(F.col(c)).cast("double"), round_to).alias(f"{c}__max"),
            F.round(F.avg(F.col(c)), round_to).alias(f"{c}__mean"),
            # var_pop is Spark's exact single-pass (Welford-merge) variance
            F.round(F.var_pop(F.col(c)), round_to).alias(f"{c}__var"),
        ]
    wide = df.agg(*aggs)
    per_col = F.array(*[
        F.struct(
            F.lit(c).alias("column"),
            F.col(f"{c}__count").alias("n"),
            F.col(f"{c}__nulls").alias("n_null"),
            F.col(f"{c}__min").alias("min_value"),
            F.col(f"{c}__max").alias("max_value"),
            F.col(f"{c}__mean").alias("mean_value"),
            F.col(f"{c}__var").alias("var_value"),
        ) for c in cols
    ])
    return (wide.select(F.explode(per_col).alias("s"))
                .select("s.column", "s.n", "s.n_null",
                        "s.min_value", "s.max_value", "s.mean_value",
                        "s.var_value"))


def uniqueness_summary(df: DataFrame, key: str) -> DataFrame:
    """(total, distinct, duplicate rows) for a key column — exact, two-phase
    hash aggregation (Spark does map-side partial counts; hot keys are
    handled by AQE skew splitting on the exchange)."""
    per_key = df.groupBy(key).agg(F.count(F.lit(1)).alias("cnt"))
    return per_key.agg(
        F.sum("cnt").alias("total_rows"),
        F.count(F.lit(1)).alias("distinct_keys"),
        F.sum(F.when(F.col("cnt") > 1, F.col("cnt")).otherwise(F.lit(0))).alias("rows_in_dup_keys"),
    )


def duplicate_keys(df: DataFrame, key: str, salt_partitions: int = 0) -> DataFrame:
    """Keys appearing more than once, with counts. For skewed keys pass
    salt_partitions>0: a two-phase salted aggregation (partial count on
    (key, salt), then final merge) defuses hot-key reducers at scale."""
    if salt_partitions > 0:
        salted = df.select(
            F.col(key),
            F.pmod(F.spark_partition_id() + F.monotonically_increasing_id(),
                   F.lit(salt_partitions)).alias("_salt"))
        partial = salted.groupBy(key, "_salt").agg(F.count(F.lit(1)).alias("c"))
        per_key = partial.groupBy(key).agg(F.sum("c").alias("n"))
    else:
        per_key = df.groupBy(key).agg(F.count(F.lit(1)).alias("n"))
    return per_key.where(F.col("n") > 1)


def distinct_count_per_key(df: DataFrame, key: str, val: str,
                           salt_partitions: int = 0) -> DataFrame:
    """Exact per-key distinct-value counts.

    Measured finding (BENCH/BASELINE.md skew section): Spark's countDistinct
    rewrite already aggregates on (key, value) first, so a hot KEY spreads
    across reducers by value hash natively — the default form wins even with
    a 5% hot key. The salted two-phase form (explicit repartition on
    (key, hash(value)) then dedup+count) is kept for custom aggregations the
    rewrite doesn't cover (e.g. collect_list payloads) and engines without
    the distinct expansion."""
    if salt_partitions > 0:
        # phase 1: dedup (key, val) pairs with the hot key spread by val hash
        deduped = (df.select(F.col(key), F.col(val))
                     .repartition(salt_partitions * 8,
                                  F.col(key), F.xxhash64(F.col(val)))
                     .dropDuplicates([key, val]))
        return deduped.groupBy(key).agg(F.count(F.lit(1)).alias("n_distinct"))
    return df.groupBy(key).agg(F.countDistinct(val).alias("n_distinct"))


def approx_distinct(df: DataFrame, cols: list[str], rsd: float = 0.02) -> DataFrame:
    """HLL++ approximate distinct counts, one row per column."""
    aggs = [F.approx_count_distinct(c, rsd).alias(f"{c}__ad") for c in cols]
    wide = df.agg(*aggs)
    per_col = F.array(*[
        F.struct(F.lit(c).alias("column"), F.col(f"{c}__ad").alias("approx_distinct"))
        for c in cols])
    return wide.select(F.explode(per_col).alias("s")).select("s.column", "s.approx_distinct")
