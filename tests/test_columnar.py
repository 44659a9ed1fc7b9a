"""Columnar compiler vs pure-Python interpreter: verdicts must agree.

The shredded-struct mapping treats a NULL field as an absent JSON key
(SURVEY.md §1.4), so rows are converted to plain JSON by dropping nulls
before feeding the interpreter.
"""

import pytest
from pyspark.sql import functions as F

from json_schema_lean_spark.compiler import ColumnarCompiler, CompileFallback
from json_schema_lean_spark.interpreter import CompiledValidator
from json_schema_lean_spark.operators.validation import (
    validate_dataframe,
    violation_rows,
)
from json_schema_lean_spark.sources.spansgen import SPAN_SCHEMA, spans_documents


def row_to_json(row):
    def clean(v):
        if isinstance(v, dict):
            return {k: clean(x) for k, x in v.items() if x is not None}
        if isinstance(v, list):
            return [clean(x) for x in v]
        return v
    return clean(row.asDict(recursive=True))


@pytest.fixture(scope="module")
def validated(spark):
    docs = spans_documents(spark, 1200)
    return validate_dataframe(docs, SPAN_SCHEMA).collect()


def test_columnar_matches_interpreter(validated):
    ref = CompiledValidator(SPAN_SCHEMA)
    mismatches = []
    for row in validated:
        doc = {k: v for k, v in row_to_json(row).items() if k in ("doc_id", "spans")}
        expected = ref.is_valid(doc)
        if expected != row["valid"]:
            mismatches.append((row["doc_id"], expected, row["valid"]))
    assert not mismatches, mismatches[:5]


def test_columnar_violation_keywords_match_interpreter(validated):
    ref = CompiledValidator(SPAN_SCHEMA)
    for row in validated:
        if row["valid"]:
            continue
        doc = {k: v for k, v in row_to_json(row).items() if k in ("doc_id", "spans")}
        expected = {(v.keyword, v.json_pointer) for v in ref.validate(doc)}
        got = {(v["keyword"], v["json_pointer"]) for v in row["violations"]}
        assert got == expected, (row["doc_id"], got, expected)


def test_injected_violation_rates(spark):
    n = 4000
    docs = spans_documents(spark, n)
    out = validate_dataframe(docs, SPAN_SCHEMA)
    counts = dict(
        violation_rows(out, ["doc_id"]).groupBy("keyword").count().collect())
    # required: bucket 0-4 => ~0.5% of docs
    assert 0.002 * n < counts.get("required", 0) < 0.009 * n
    # minLength (empty text): bucket 5-14 => ~1%
    assert 0.005 * n < counts.get("minLength", 0) < 0.016 * n


def test_duplicated_doc_ids_present(spark):
    docs = spans_documents(spark, 4000)
    dups = (docs.groupBy("doc_id").count().where(F.col("count") > 1)).count()
    assert dups > 0


def test_determinism(spark):
    a = spans_documents(spark, 300).orderBy("doc_id").collect()
    b = spans_documents(spark, 300).orderBy("doc_id").collect()
    assert a == b


def test_compile_fallback_on_python_regex(spark):
    df = spark.createDataFrame([("a",)], "s: string")
    with pytest.raises(CompileFallback):
        validate_dataframe(df, {"properties": {"s": {"pattern": "(?P<x>a)"}}})


def test_cycle_rejected_at_compile_time():
    cyc = {"definitions": {"A": {"allOf": [{"$ref": "#/definitions/B"}]},
                           "B": {"allOf": [{"$ref": "#/definitions/A"}]}},
           "$ref": "#/definitions/A"}
    from json_schema_lean_spark.resolver import SchemaCycleError
    with pytest.raises(SchemaCycleError):
        ColumnarCompiler(cyc)


def test_explode_strategy_matches_forall(spark):
    from json_schema_lean_spark.operators.validation import validate_documents_exploded

    docs = spans_documents(spark, 800)

    def canon(rows):
        return sorted(
            (r["doc_id"], r["valid"],
             tuple(sorted((v["keyword"], v["json_pointer"]) for v in r["violations"])))
            for r in rows)

    a = canon(validate_dataframe(docs, SPAN_SCHEMA)
              .select("doc_id", "valid", "violations").collect())
    b = canon(validate_documents_exploded(docs, SPAN_SCHEMA).collect())
    assert a == b


def test_fused_strategy_matches_forall(spark):
    from json_schema_lean_spark.plans import validate_documents_fused

    docs = spans_documents(spark, 800)

    def canon(rows):
        return sorted(
            (r["doc_id"], r["valid"],
             tuple(sorted((v["keyword"], v["json_pointer"]) for v in r["violations"])))
            for r in rows)

    a = canon(validate_dataframe(docs, SPAN_SCHEMA)
              .select("doc_id", "valid", "violations").collect())
    b = canon(validate_documents_fused(docs, SPAN_SCHEMA,
                                       keep_cols=["doc_id"]).collect())
    assert a == b


def test_fused_rejects_unsupported_keywords(spark):
    import json as _json
    from json_schema_lean_spark.plans import FusedUnsupported, validate_documents_fused

    docs = spans_documents(spark, 10)
    schema = _json.loads(_json.dumps(SPAN_SCHEMA))
    schema["definitions"]["span"]["properties"]["offset"]["multipleOf"] = 2
    with pytest.raises(FusedUnsupported):
        validate_documents_fused(docs, schema)


def test_validate_spans_best_falls_back(spark):
    import json as _json
    from json_schema_lean_spark.operators.validation import validate_spans_best

    docs = spans_documents(spark, 300)
    # fused-eligible schema
    a = validate_spans_best(docs, SPAN_SCHEMA, keep_cols=["doc_id"])
    # fused-ineligible (multipleOf) -> explode strategy, same verdicts shape
    schema = _json.loads(_json.dumps(SPAN_SCHEMA))
    schema["definitions"]["span"]["properties"]["offset"]["multipleOf"] = 1
    b = validate_spans_best(docs, schema, keep_cols=["doc_id"])
    av = {r["doc_id"]: r["valid"] for r in a.collect()}
    bv = {r["doc_id"]: r["valid"] for r in b.collect()}
    assert av == bv  # multipleOf 1 is vacuous for integers


def test_violation_rows_fast_matches_general_path(spark):
    from json_schema_lean_spark.operators.validation import violation_rows_fast

    docs = spans_documents(spark, 800)
    a = sorted(tuple(r) for r in violation_rows(
        validate_dataframe(docs, SPAN_SCHEMA), ["doc_id"]).collect())
    b = sorted(tuple(r) for r in violation_rows_fast(
        docs, SPAN_SCHEMA, id_cols=["doc_id"]).collect())
    assert a == b and len(a) > 0


def test_violation_rows_fast_no_shuffle(spark):
    import contextlib
    import io

    from json_schema_lean_spark.operators.validation import violation_rows_fast

    docs = spans_documents(spark, 100)
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        violation_rows_fast(docs, SPAN_SCHEMA, id_cols=["doc_id"]).explain("simple")
    assert "Exchange" not in buf.getvalue()


def test_null_array_element_is_json_null(spark):
    """A NULL array element is a JSON null (fails type checks that exclude
    null); a NULL struct FIELD is an absent key (passes). All strategies."""
    from json_schema_lean_spark.interpreter import validate_json
    from json_schema_lean_spark.operators.validation import (
        validate_documents_exploded,
        violation_rows_fast,
    )
    from json_schema_lean_spark.plans import validate_documents_fused

    cases = [
        ({"properties": {"arr": {"items": {"type": "integer"}}}}, [1, None], False),
        ({"properties": {"arr": {"items": {"type": ["integer", "null"]}}}}, [1, None], True),
        ({"properties": {"arr": {"items": {"enum": [1, None]}}}}, [None], True),
        ({"properties": {"arr": {"items": {"enum": [1, 2]}}}}, [None], False),
        ({"properties": {"arr": {"items": {"const": None}}}}, [None], True),
        ({"properties": {"arr": {"contains": {"type": "null"}}}}, [1, 2], False),
        ({"properties": {"arr": {"contains": {"type": "null"}}}}, [1, None], True),
    ]
    for schema, arr, expected in cases:
        assert validate_json(schema, {"arr": arr}) is expected, (schema, arr)
        df = spark.createDataFrame([(arr,)], "arr: array<long>")
        got = validate_dataframe(df, schema).collect()[0]["valid"]
        assert got == expected, ("columnar", schema, arr)

    rows = [("doc-a", [{"kind": "text", "text": "x", "media_ref": None,
                        "offset": 0}, None])]
    df = spark.createDataFrame(
        rows, "doc_id string, spans array<struct<kind:string,text:string,"
              "media_ref:string,offset:int>>")
    assert validate_dataframe(df, SPAN_SCHEMA).collect()[0]["valid"] is False
    assert validate_documents_fused(df, SPAN_SCHEMA,
                                    keep_cols=["doc_id"]).collect()[0]["valid"] is False
    assert validate_documents_exploded(df, SPAN_SCHEMA).collect()[0]["valid"] is False
    vr = violation_rows_fast(df, SPAN_SCHEMA, id_cols=["doc_id"]).collect()
    assert [(r["keyword"], r["json_pointer"]) for r in vr] == [("type", "/spans/1")]


def test_fused_null_legal_elements(spark):
    """When items type includes 'null', a null span element is LEGAL and must
    not count as an object missing required keys (code-review regression)."""
    import json as _json
    from json_schema_lean_spark.plans import validate_documents_fused

    schema = _json.loads(_json.dumps(SPAN_SCHEMA))
    schema["definitions"]["span"]["type"] = ["object", "null"]
    rows = [("doc-a", [{"kind": "text", "text": "x", "media_ref": None,
                        "offset": 0}, None]),
            ("doc-b", [None]),
            ("doc-c", [{"kind": None, "text": "x", "media_ref": None,
                        "offset": 0}])]
    df = spark.createDataFrame(
        rows, "doc_id string, spans array<struct<kind:string,text:string,"
              "media_ref:string,offset:int>>")
    fused = {r["doc_id"]: r["valid"]
             for r in validate_documents_fused(df, schema,
                                               keep_cols=["doc_id"]).collect()}
    forall = {r["doc_id"]: r["valid"]
              for r in validate_dataframe(df, schema).collect()}
    assert fused == forall == {"doc-a": True, "doc-b": True, "doc-c": False}


def test_partition_verdict_metrics(spark):
    from json_schema_lean_spark.operators.validation import (
        partition_verdict_metrics,
    )

    docs = spans_documents(spark, 500).repartition(4)
    v = validate_dataframe(docs, SPAN_SCHEMA)
    m = partition_verdict_metrics(v).collect()
    assert sum(r["rows"] for r in m) == v.count()
    assert sum(r["valid_rows"] for r in m) == v.where("valid").count()
    assert len(m) <= 4 and all(r["rows"] > 0 for r in m)


def test_nested_array_lowering(spark):
    """array<array<long>>: items.items recursion with JSON-null element
    semantics at both depths."""
    from json_schema_lean_spark.interpreter import validate_json

    schema = {"properties": {"m": {
        "items": {"type": "array", "minItems": 1,
                  "items": {"type": "integer", "minimum": 0}}}}}
    rows = [
        ([[1, 2], [3]], True),
        ([[1, -2]], False),      # inner minimum
        ([[]], False),           # inner minItems
        ([[1], None], False),    # null inner array is JSON null, not array
        ([], True),
        (None, True),            # absent key
    ]
    df = spark.createDataFrame([(m,) for m, _ in rows], "m: array<array<long>>")
    got = [r["valid"] for r in validate_dataframe(df, schema).collect()]
    expected = [e for _, e in rows]
    assert got == expected
    for (m, e) in rows:
        if m is not None:
            assert validate_json(schema, {"m": m}) is e, m


def test_scalar_keywords_columnar(spark):
    df = spark.createDataFrame(
        [(1, "abc", 4.0), (-2, "x", 3.5), (7, "abcdef", 9.0)],
        "n: long, s: string, d: double")
    schema = {
        "properties": {
            "n": {"type": "integer", "minimum": 0, "multipleOf": 1},
            "s": {"minLength": 2, "maxLength": 5, "pattern": "^a"},
            "d": {"type": "integer", "maximum": 8},
        }
    }
    out = validate_dataframe(df, schema).select("n", "valid").collect()
    got = {r["n"]: r["valid"] for r in out}
    # n=-2 fails minimum; s="x" fails minLength+pattern; d=3.5 fails integer;
    # n=7 ok but d=9 fails maximum
    assert got == {1: True, -2: False, 7: False}


def test_violation_rows_best_equals_fast(spark):
    """r2: the fused-verdict prefilter must not change the violation-row
    output by a single row."""
    from json_schema_lean_spark.operators.validation import (
        violation_rows_best,
        violation_rows_fast,
    )
    from json_schema_lean_spark.sources.spansgen import (
        SPAN_SCHEMA,
        spans_documents,
    )

    spans = spans_documents(spark, 2000)
    a = sorted(map(tuple, violation_rows_fast(
        spans, SPAN_SCHEMA, id_cols=["doc_id"]).collect()))
    b = sorted(map(tuple, violation_rows_best(
        spans, SPAN_SCHEMA, id_cols=["doc_id"]).collect()))
    assert a == b and len(a) > 0

    # non-fusable schema falls back (still identical)
    schema = {"type": "object", "properties": {
        "doc_id": {"type": "string"},
        "spans": {"items": {"type": ["object", "null"],
                            "properties": {"text": {"const": "x"}}}}}}
    c = sorted(map(tuple, violation_rows_fast(
        spans, schema, id_cols=["doc_id"]).collect()))
    d = sorted(map(tuple, violation_rows_best(
        spans, schema, id_cols=["doc_id"]).collect()))
    assert c == d


def test_struct_dynamic_object_violations_per_key(spark):
    """r2: StructType propertyNames / additionalProperties:false violations
    carry per-key granularity matching the interpreter."""
    from json_schema_lean_spark.interpreter import CompiledValidator
    from json_schema_lean_spark.operators.validation import validate_dataframe

    schema = {
        "type": "object",
        "properties": {"ok": {}},
        "propertyNames": {"maxLength": 3},
        "additionalProperties": False,
    }
    df = spark.createDataFrame([(1, 2, 3)], "ok int, zz int, toolong int")
    row = validate_dataframe(df, schema).collect()[0]
    got = {(x["keyword"], x["json_pointer"]) for x in row["violations"]}
    ref = CompiledValidator(schema)
    exp = {(x.keyword, x.json_pointer)
           for x in ref.validate({"ok": 1, "zz": 2, "toolong": 3})}
    assert row["valid"] is False
    assert got == exp
    assert ("propertyNames", "") in got
    assert ("false", "/zz") in got and ("false", "/toolong") in got
