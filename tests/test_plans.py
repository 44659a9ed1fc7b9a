"""Physical-plan quality gates: pushdown, nested-schema pruning, codegen.

These pin the properties that make the engine scale (SURVEY.md §4): filters
reach the parquet scan, projections prune nested span fields, and the fused
verdict plan stays inside whole-stage codegen with no Python in the loop.
"""

import contextlib
import io

import pytest
from pyspark.sql import functions as F

from json_schema_lean_spark.plans import validate_documents_fused
from json_schema_lean_spark.sources.spansgen import SPAN_SCHEMA, spans_documents


def explain_str(df, mode="formatted") -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain(mode)
    return buf.getvalue()


@pytest.fixture(scope="module")
def spans_path(spark, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("plans") / "spans")
    spans_documents(spark, 500).write.parquet(path)
    return path


def test_filter_pushdown_reaches_scan(spark):
    li = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
    plan = explain_str(li.where(F.col("l_quantity") > 10).select("l_orderkey"))
    assert "PushedFilters" in plan
    assert "GreaterThan(l_quantity" in plan
    # column pruning: only the two referenced columns in ReadSchema
    read_schema = [l for l in plan.splitlines() if "ReadSchema" in l][0]
    assert "l_orderkey" in read_schema and "l_quantity" in read_schema
    assert "l_comment" not in read_schema and "l_extendedprice" not in read_schema


def test_fused_plan_is_codegen_and_python_free(spark, spans_path):
    spans = spark.read.parquet(spans_path)
    out = validate_documents_fused(spans, SPAN_SCHEMA, keep_cols=["doc_id"],
                                   with_violations=False)
    plan = explain_str(out)
    assert "[codegen id" in plan  # scan + ColumnarToRow stay codegen'd
    for marker in ("BatchEvalPython", "ArrowEvalPython", "MapInPandas"):
        assert marker not in plan, marker
    # zero exchanges: verdict mode is a pure projection
    assert "Exchange" not in plan
    # no per-struct lambda predicates: the only lambdas left are the cheap
    # scalar-array null filters that array_compact desugars to
    # (StartsWith is the guarded newline-edge fallback branch of the fused
    # pattern clause — present in the plan, lazily evaluated per row)
    import re
    lams = re.findall(r"lambdafunction\((\w+)", plan)
    assert lams and set(lams) <= {"isnotnull", "StartsWith"}, set(lams)


def test_fused_verdict_counts_stable(spark, spans_path):
    spans = spark.read.parquet(spans_path)
    out = validate_documents_fused(spans, SPAN_SCHEMA, keep_cols=["doc_id"],
                                   with_violations=False)
    a = out.where("valid").count()
    b = out.where("valid").count()
    assert a == b > 0


def test_explode_plan_partial_aggregation(spark, spans_path):
    """The explode strategy's shuffle must be preceded by a partial
    (map-side) aggregation so only per-doc partials move."""
    from json_schema_lean_spark.operators.validation import (
        validate_documents_exploded,
    )
    spans = spark.read.parquet(spans_path)
    out = validate_documents_exploded(spans, SPAN_SCHEMA)
    plan = explain_str(out, "simple")
    assert plan.count("HashAggregate") >= 2  # partial + final
