"""Streaming exact dedup (extension; completes the dedup family's streaming
story alongside batch exact/MinHash/SimHash/components).

``dropDuplicatesWithinWatermark`` keys the state store by the content
fingerprint and expires state once the watermark passes — bounded state for
an unbounded stream, which a plain ``dropDuplicates`` on a stream does not
give you (its state grows forever). Duplicates arriving within the
watermark horizon are suppressed; a duplicate arriving later than the
horizon is a NEW row by design (the horizon IS the dedup guarantee window —
size it to the ingest pipeline's max disorder).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..operators.text import fingerprint


def exact_dedup_stream(stream_df: DataFrame, text_col: str, ts_col: str,
                       watermark: str = "10 minutes") -> DataFrame:
    """Keep the first row per exact text content within the watermark
    horizon. Uses the SAME ``fingerprint`` column as batch
    exact_dedup/exact_dup_groups, so stream and batch agree on what counts
    as a duplicate."""
    fp = fingerprint(F.col(text_col))
    return (stream_df.withColumn("_fp", fp)
                     .withWatermark(ts_col, watermark)
                     .dropDuplicatesWithinWatermark(["_fp"])
                     .drop("_fp"))
