"""Structured Streaming validation path: file source -> validate -> memory sink."""

import pytest
from pyspark.sql import functions as F

from json_schema_lean_spark.operators.validation import validate_dataframe
from json_schema_lean_spark.sources.spansgen import SPAN_SCHEMA, spans_documents
from json_schema_lean_spark.streaming import validated_stream


@pytest.fixture(scope="module")
def spans_dir(spark, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("stream") / "spans")
    spans_documents(spark, 600).repartition(4).write.parquet(path)
    return path


def test_stream_verdicts_match_batch(spark, spans_dir):
    batch_df = spark.read.parquet(spans_dir)
    stream_df = (spark.readStream.schema(batch_df.schema)
                 .option("maxFilesPerTrigger", 2).parquet(spans_dir))
    v = validated_stream(stream_df, SPAN_SCHEMA)
    assert v.isStreaming
    q = (v.groupBy("valid").count()
          .writeStream.format("memory").queryName("verdicts")
          .outputMode("complete").start())
    try:
        q.processAllAvailable()
        got = {r["valid"]: r["count"]
               for r in spark.sql("select * from verdicts").collect()}
    finally:
        q.stop()
    expected = {r["valid"]: r["count"]
                for r in validate_dataframe(batch_df, SPAN_SCHEMA)
                .groupBy("valid").count().collect()}
    assert got == expected


def test_variant_json_validation_streams(spark, tmp_path_factory):
    """r2: the variant path (try_parse_json + Generate barrier) is stateless
    and must compose with Structured Streaming — verdict counts equal the
    batch run over the same files."""
    from json_schema_lean_spark.operators.validation import validate_json_column

    path = str(tmp_path_factory.mktemp("stream") / "events")
    ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    ev.repartition(3).write.parquet(path)
    schema = {"type": "object", "required": ["k"],
              "properties": {"k": {"type": "integer", "minimum": 1}}}

    batch = validate_json_column(spark.read.parquet(path), "props", schema,
                                 verdict_only=True)
    expected = {r["valid"]: r["count"]
                for r in batch.groupBy("valid").count().collect()}

    stream_df = (spark.readStream.schema(batch.drop("valid").schema)
                 .option("maxFilesPerTrigger", 1).parquet(path))
    v = validate_json_column(stream_df, "props", schema, verdict_only=True)
    assert v.isStreaming
    q = (v.groupBy("valid").count()
          .writeStream.format("memory").queryName("variant_verdicts")
          .outputMode("complete").start())
    try:
        q.processAllAvailable()
        got = {r["valid"]: r["count"]
               for r in spark.sql("select * from variant_verdicts").collect()}
    finally:
        q.stop()
    assert got == expected


def test_stream_exact_dedup_matches_batch(spark, tmp_path_factory):
    """Streaming exact dedup (dropDuplicatesWithinWatermark on the batch
    fingerprint) keeps exactly one row per distinct normalized text when
    all duplicates arrive within the horizon — same survivor COUNT as
    batch exact_dedup over the same files, and bounded state."""
    from json_schema_lean_spark.operators.dedup import exact_dedup
    from json_schema_lean_spark.streaming.dedup_stream import exact_dedup_stream

    path = str(tmp_path_factory.mktemp("stream") / "docs")
    rows = []
    for i in range(120):
        rows.append((i, f"unique text {i % 40}",   # each text repeated 3x
                     f"2024-01-01 00:{i % 50:02d}:00"))
    df = (spark.createDataFrame(rows, "doc_id long, text string, ts string")
               .withColumn("ts", F.col("ts").cast("timestamp")))
    df.repartition(3).write.parquet(path)

    batch_survivors = exact_dedup(
        spark.read.parquet(path), "text", "doc_id").count()
    assert batch_survivors == 40

    stream_df = (spark.readStream.schema(spark.read.parquet(path).schema)
                 .option("maxFilesPerTrigger", 1).parquet(path))
    out = exact_dedup_stream(stream_df, "text", "ts", watermark="1 hour")
    assert out.isStreaming
    q = (out.writeStream.format("memory").queryName("dedup_stream")
            .outputMode("append").start())
    try:
        q.processAllAvailable()
        got = spark.sql(
            "select count(*) n, count(distinct text) d from dedup_stream"
        ).collect()[0]
    finally:
        q.stop()
    assert got["n"] == got["d"] == batch_survivors
