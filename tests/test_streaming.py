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
