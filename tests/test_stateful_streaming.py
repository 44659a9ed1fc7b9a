"""applyInPandasWithState sessionization: streaming result == batch result."""

import pytest
from pyspark.sql import functions as F

from json_schema_lean_spark.operators.temporal import session_stats
from json_schema_lean_spark.streaming.stateful import streaming_session_counts


@pytest.fixture(scope="module")
def events_dir(spark, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("sess") / "events")
    ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet") \
              .select("user_id", "ts", "event_id")
    # time-ordered files so micro-batches arrive in event-time order
    ev.repartitionByRange(4, "ts").sortWithinPartitions("ts") \
      .write.parquet(path)
    return path


def test_streaming_sessions_match_batch(spark, events_dir):
    batch = spark.read.parquet(events_dir)
    expected = {r["user_id"]: (r["n_sessions"], r["n_events"])
                for r in session_stats(batch, "user_id", "ts",
                                       gap_minutes=30).collect()}

    stream = (spark.readStream.schema(batch.schema)
              .option("maxFilesPerTrigger", 1).parquet(events_dir))
    # horizon covers the whole (31-day) stream: every event stays in the
    # provisional buffer, so totals are exact regardless of arrival order
    counts = streaming_session_counts(stream, "user_id", "ts", gap_minutes=30,
                                      watermark="40 days")
    q = (counts.writeStream.format("memory").queryName("sess")
         .outputMode("update").start())
    try:
        q.processAllAvailable()
        # update mode: several rows per key; the row with max n_events is final
        rows = spark.sql("""
            SELECT user_key, n_sessions, n_events FROM (
              SELECT *, row_number() OVER (PARTITION BY user_key
                                           ORDER BY n_events DESC) rn FROM sess)
            WHERE rn = 1""").collect()
    finally:
        q.stop()
    got = {r["user_key"]: (r["n_sessions"], r["n_events"]) for r in rows}
    assert got == expected
