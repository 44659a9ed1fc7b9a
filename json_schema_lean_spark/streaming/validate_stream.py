"""Structured Streaming validation path (extension; the reference's only
"stream" is a blocking stdin loop, Harness/Harness.lean:42-57).

The forall/projection plan from the columnar compiler is stateless — a pure
per-row projection — so it applies to a streaming DataFrame unchanged (no
state store, no watermark needed for the verdict itself). Windowed violation
metrics add an event-time watermark + tumbling window aggregation for late
data, exactly the Spark-native pattern.
"""

from __future__ import annotations

from typing import Any, Optional

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..operators.validation import validate_dataframe


def validated_stream(stream_df: DataFrame, schema_json: Any,
                     doc_col: Optional[str] = None,
                     registry: Optional[dict[str, Any]] = None,
                     assert_formats: bool = False) -> DataFrame:
    """Attach valid/violations columns to a streaming DataFrame. Stateless
    projection: works with any output mode, no watermark required.
    ``assert_formats`` opts into format assertion (stateless rlike +
    calendar predicates — streaming-safe like every other keyword)."""
    return validate_dataframe(stream_df, schema_json, doc_col=doc_col,
                              registry=registry,
                              assert_formats=assert_formats)


def validation_window_metrics(stream_df: DataFrame, schema_json: Any,
                              ts_col: str, window: str = "1 minute",
                              watermark: str = "2 minutes",
                              doc_col: Optional[str] = None) -> DataFrame:
    """Tumbling-window verdict metrics with late-data watermark:
    (window, n_rows, n_valid, n_violations)."""
    v = validated_stream(stream_df, schema_json, doc_col=doc_col)
    return (v.withWatermark(ts_col, watermark)
             .groupBy(F.window(F.col(ts_col), window).alias("window"))
             .agg(F.count(F.lit(1)).alias("n_rows"),
                  F.sum(F.col("valid").cast("long")).alias("n_valid"),
                  F.sum(F.size("violations").cast("long")).alias("n_violations")))
