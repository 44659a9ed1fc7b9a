"""Cross-strategy soak: random span-document schemas x random documents;
forall / explode / fused strategies must all reproduce the interpreter's
verdicts. Run ad hoc (~7 min at 150 examples): python scripts/strategy_soak.py
Round-1 result: 150/150 examples agree (115 eligible for the fused subset).
"""
import json, sys
sys.path.insert(0, "/root/repo")
from hypothesis import settings, HealthCheck, given, strategies as st
from pyspark.sql import SparkSession
spark = (SparkSession.builder.master("local[8]")
         .config("spark.sql.shuffle.partitions","8")
         .config("spark.ui.enabled","false").getOrCreate())
spark.sparkContext.setLogLevel("ERROR")
from json_schema_lean_spark.interpreter import CompiledValidator
from json_schema_lean_spark.operators.validation import (
    validate_dataframe, validate_documents_exploded)
from json_schema_lean_spark.plans import FusedUnsupported, validate_documents_fused
from json_schema_lean_spark.compiler import CompileFallback

DDL = ("doc_id string, spans array<struct<kind:string,text:string,"
       "media_ref:string,offset:int>>")

def span_prop():
    return st.one_of(
        st.builds(lambda v: {"enum": v}, st.lists(
            st.sampled_from(["text","image","audio","video","x"]), min_size=1, max_size=3)),
        st.builds(lambda n: {"minLength": n}, st.integers(0, 3)),
        st.builds(lambda n: {"maxLength": n}, st.integers(0, 4)),
        st.just({"pattern": "^asset://"}),
        # dotted pattern: '.' is a metachar — must NOT be fused literally
        st.just({"pattern": "^foo.bar"}),
        st.builds(lambda m: {"minimum": m}, st.integers(-2, 2)),
        st.builds(lambda m: {"maximum": m}, st.integers(-2, 2)),
        st.builds(lambda t: {"type": t},
                  st.sampled_from(["string","integer","null",["string","null"],
                                   ["integer","null"]])),
    )

def schema_gen():
    return st.builds(
        lambda req, kind_s, text_s, off_s, minit, types: {
            "type": "object", "required": ["doc_id", "spans"],
            "properties": {
                "doc_id": {"type": "string"},
                "spans": {"type": "array", "minItems": minit,
                          "items": {"type": types, "required": req,
                                    "properties": {"kind": kind_s, "text": text_s,
                                                   "offset": off_s}}}}},
        st.lists(st.sampled_from(["kind","text","offset"]), max_size=2, unique=True),
        span_prop(), span_prop(), span_prop(),
        st.integers(0, 2),
        st.sampled_from(["object", ["object","null"]]),
    )

def spans_gen():
    span = st.one_of(st.none(), st.fixed_dictionaries({
        "kind": st.one_of(st.none(), st.sampled_from(["text","image","video"])),
        "text": st.one_of(st.none(), st.sampled_from(
            ["", "a", "ab", "asset://x", "hello", "fooXbar", "foo.bar",
             "foobar", "a\nb", "\U0001F4A9"])),
        "media_ref": st.one_of(st.none(), st.sampled_from(["asset://b/1", "http://x"])),
        "offset": st.one_of(st.none(), st.integers(-2, 3)),
    }))
    return st.lists(st.tuples(st.sampled_from(["doc-a","doc-b","xdoc"]),
                              st.one_of(st.none(), st.lists(span, max_size=3))),
                    min_size=1, max_size=5)

def to_json_doc(doc_id, spans):
    doc = {"doc_id": doc_id}
    if spans is not None:
        doc["spans"] = [s if s is None else {k: v for k, v in s.items() if v is not None}
                        for s in spans]
    return doc

checked = [0, 0]
@settings(max_examples=150, deadline=None, suppress_health_check=list(HealthCheck))
@given(schema=schema_gen(), data=spans_gen())
def run(schema, data):
    ref = CompiledValidator(schema)
    expected = {}
    rows = []
    for i, (did, spans) in enumerate(data):
        key = f"{did}-{i}"
        expected[key] = ref.is_valid(to_json_doc(key, spans))
        rows.append((key, spans))
    df = spark.createDataFrame(rows, DDL)
    try:
        a = {r["doc_id"]: r["valid"] for r in validate_dataframe(df, schema).collect()}
    except CompileFallback:
        return
    assert a == expected, ("forall", schema, data, a, expected)
    b = {r["doc_id"]: r["valid"]
         for r in validate_documents_exploded(df, schema).collect()}
    assert b == expected, ("exploded", schema, data, b, expected)
    checked[0] += 1
    try:
        c = {r["doc_id"]: r["valid"]
             for r in validate_documents_fused(df, schema, keep_cols=["doc_id"]).collect()}
        assert c == expected, ("fused", schema, data, c, expected)
        checked[1] += 1
    except FusedUnsupported:
        pass

run()
print(json.dumps({"examples_all3": checked[1], "examples_2paths": checked[0]}))
