"""Temporal operators: as-of join, gap sessionization, tumbling windows.

Spark has no native AS-OF join; the idiomatic composition (no UDF, no
cross join) is the union-and-carry pattern: tag both sides, union, sort
within user partitions by event time, carry the latest right-side value
forward with ``last(..., ignorenulls=True)`` over an unbounded-preceding
window, then keep left-side rows. One shuffle on the join key, no range
explosion — the 100 TB-safe formulation.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def asof_join(left: DataFrame, right: DataFrame, on: str, ts: str,
              value_cols: list[str], right_prefix: str = "asof_") -> DataFrame:
    """For each left row: the most recent right row (right.ts <= left.ts)
    per `on` key. Ties at equal ts match the right row (<= semantics, like
    DuckDB ASOF JOIN). Output: left columns + asof_<value_cols>."""
    lt = left.withColumn("_side", F.lit(1))
    rt = right.select(
        on, ts, F.lit(0).alias("_side"),
        *[F.col(c).alias(f"{right_prefix}{c}") for c in value_cols])
    carried = [f"{right_prefix}{c}" for c in value_cols]
    unioned = lt.unionByName(rt.select(*rt.columns), allowMissingColumns=True)
    # right rows sort before left rows at equal ts => <= matching
    w = (Window.partitionBy(on).orderBy(F.col(ts).asc(), F.col("_side").asc())
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    out = unioned
    for c in carried:
        out = out.withColumn(c, F.last(c, ignorenulls=True).over(w))
    return out.where(F.col("_side") == 1).drop("_side")


def sessionize(df: DataFrame, key: str, ts: str, gap_minutes: int = 30,
               order_tiebreak: str | None = None) -> DataFrame:
    """Gap-based sessions: a new session starts when the time since the
    previous event of the same key exceeds the gap. Adds ``session_id``
    (0-based per key). Two window passes over one shuffle partitioning."""
    order_cols = [F.col(ts).asc()]
    if order_tiebreak:
        order_cols.append(F.col(order_tiebreak).asc())
    w = Window.partitionBy(key).orderBy(*order_cols)
    prev_ts = F.lag(F.col(ts)).over(w)
    def secs(c: Column) -> Column:
        # TIMESTAMP_NTZ has no direct double cast; go via timestamp
        return c.cast("timestamp").cast("double")

    new_session = (prev_ts.isNull()
                   | (secs(F.col(ts)) - secs(prev_ts)
                      > gap_minutes * 60)).cast("long")
    # window-in-window is not allowed: materialize the flag, then cumsum
    wsum = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return (df.withColumn("_new_session", new_session)
              .withColumn("session_id", F.sum("_new_session").over(wsum) - 1)
              .drop("_new_session"))


def session_stats(df: DataFrame, key: str, ts: str,
                  gap_minutes: int = 30,
                  order_tiebreak: str | None = None) -> DataFrame:
    """(key, n_sessions, n_events) per key."""
    s = sessionize(df, key, ts, gap_minutes, order_tiebreak)
    return (s.groupBy(key)
             .agg((F.max("session_id") + 1).alias("n_sessions"),
                  F.count(F.lit(1)).alias("n_events")))


def tumbling_window_agg(df: DataFrame, ts: str, value: str,
                        window: str = "1 hour", round_to: int = 6) -> DataFrame:
    """Tumbling event-time windows: (window_start, n, sum, avg)."""
    return (df.groupBy(F.window(F.col(ts), window).alias("w"))
              .agg(F.count(F.lit(1)).alias("n"),
                   F.round(F.sum(value), round_to).alias("sum_value"),
                   F.round(F.avg(value), round_to).alias("avg_value"))
              .select(F.col("w.start").alias("window_start"),
                      "n", "sum_value", "avg_value"))
