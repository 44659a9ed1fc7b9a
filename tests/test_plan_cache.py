"""Plan-memo correctness: cached Column reuse must be row-identical to a
fresh build, keyed so that any input that could change the expressions
misses the cache."""

from pyspark.sql import functions as F

from json_schema_lean_spark import plan_cache
from json_schema_lean_spark.operators.validation import violation_rows_fast
from json_schema_lean_spark.plans import validate_documents_fused
from json_schema_lean_spark.sources.spansgen import SPAN_SCHEMA, spans_documents


def canon_viol(rows):
    return sorted((r["doc_id"], r["span_idx"], r["keyword"], r["json_pointer"])
                  for r in rows)


def test_cached_plan_is_row_identical(spark):
    plan_cache.clear()
    docs = spans_documents(spark, 400)
    first = canon_viol(
        violation_rows_fast(docs, SPAN_SCHEMA, id_cols=["doc_id"]).collect())
    assert plan_cache.stats == {"hits": 0, "misses": 1}
    second = canon_viol(
        violation_rows_fast(docs, SPAN_SCHEMA, id_cols=["doc_id"]).collect())
    assert plan_cache.stats == {"hits": 1, "misses": 1}
    assert first == second and len(first) > 0

    # same schema, same dtype, DIFFERENT DataFrame: hit is sound (Columns
    # bind by name) and verdict-equivalent to a cleared-cache build
    other = spans_documents(spark, 400, seed=7)
    with_cache = canon_viol(
        violation_rows_fast(other, SPAN_SCHEMA, id_cols=["doc_id"]).collect())
    assert plan_cache.stats["hits"] == 2
    plan_cache.clear()
    fresh = canon_viol(
        violation_rows_fast(other, SPAN_SCHEMA, id_cols=["doc_id"]).collect())
    assert with_cache == fresh


def test_key_discriminates(spark):
    plan_cache.clear()
    docs = spans_documents(spark, 50)
    validate_documents_fused(docs, SPAN_SCHEMA, keep_cols=["doc_id"])
    assert plan_cache.stats["misses"] == 1
    # keep_cols is outside the cached expressions: same key, hit
    validate_documents_fused(docs, SPAN_SCHEMA, keep_cols=["doc_id", "spans"])
    assert plan_cache.stats == {"hits": 1, "misses": 1}
    # message_style changes the violation expressions: miss
    validate_documents_fused(docs, SPAN_SCHEMA, keep_cols=["doc_id"],
                             message_style="reference")
    assert plan_cache.stats["misses"] == 2
    # schema change: miss
    validate_documents_fused(docs, {**SPAN_SCHEMA, "required": []},
                             keep_cols=["doc_id"])
    assert plan_cache.stats["misses"] == 3
    # dtype change (extra column alters the instance struct): miss
    validate_documents_fused(docs.withColumn("extra", F.lit(1)),
                             SPAN_SCHEMA, keep_cols=["doc_id"])
    assert plan_cache.stats["misses"] == 4


def test_fused_cache_row_identical(spark):
    plan_cache.clear()
    docs = spans_documents(spark, 300)
    a = sorted((r["doc_id"], r["valid"]) for r in validate_documents_fused(
        docs, SPAN_SCHEMA, keep_cols=["doc_id"]).collect())
    b = sorted((r["doc_id"], r["valid"]) for r in validate_documents_fused(
        docs, SPAN_SCHEMA, keep_cols=["doc_id"]).collect())
    assert plan_cache.stats["hits"] >= 1
    assert a == b


def test_cache_hit_from_sibling_session_gets_analyzer_budget(spark):
    """r3 review fix: a deep-canonicalizer plan built in session A and
    cache-hit from spark.newSession() must still raise B's analyzer
    iteration budget (B's SQLConf starts at the 100 default; the compiler
    that raises it never runs on a hit)."""
    import json as _json

    from json_schema_lean_spark.variant import validate_json_column_variant

    schema = {"type": "array", "uniqueItems": True}  # deep canonicalizer
    deep = [[[[[[[[[[[[[[[[[[[[1]]]]]]]]]]]]]]]]]]]]  # 20 levels
    rows = [(_json.dumps([deep, deep]),), (_json.dumps([1, 2]),)]

    a = spark
    df_a = a.createDataFrame(rows, "j string")
    out_a = {r["j"]: r["valid"] for r in
             validate_json_column_variant(df_a, "j", schema).collect()}

    b = spark.newSession()
    assert int(b.conf.get("spark.sql.analyzer.maxIterations", "100")) <= 200
    df_b = b.createDataFrame(rows, "j string")
    before_hits = plan_cache.stats["hits"]
    out_b = {r["j"]: r["valid"] for r in
             validate_json_column_variant(df_b, "j", schema).collect()}
    assert plan_cache.stats["hits"] > before_hits  # really exercised the hit
    assert out_b == out_a
    assert out_b[_json.dumps([deep, deep])] is False  # duplicates detected
    assert out_b[_json.dumps([1, 2])] is True
