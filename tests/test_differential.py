"""Property-based differential testing: for random (schema, rows) pairs the
columnar lowering must produce exactly the interpreter's verdicts.

Strategy: a schema grammar over a FIXED table shape (so the columnar path
applies), hypothesis-driven values including nulls, boundary numerics, empty
strings/arrays. One Spark job validates the whole generated batch at once.
"""

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from json_schema_lean_spark.compiler import CompileFallback
from json_schema_lean_spark.interpreter import CompiledValidator
from json_schema_lean_spark.operators.validation import validate_dataframe

TABLE_SCHEMA = "s: string, n: long, d: double, arr: array<long>, b: boolean"


def scalar_schema():
    return st.one_of(
        st.just(True),
        st.just(False),
        st.builds(lambda lo: {"minimum": lo}, st.integers(-5, 5)),
        st.builds(lambda hi: {"maximum": hi}, st.integers(-5, 5)),
        st.builds(lambda m: {"multipleOf": m}, st.sampled_from([1, 2, 0.5, 3])),
        st.builds(lambda n: {"minLength": n}, st.integers(0, 4)),
        st.builds(lambda n: {"maxLength": n}, st.integers(0, 4)),
        st.just({"pattern": "^a"}),
        st.just({"pattern": "b$"}),
        st.builds(lambda t: {"type": t},
                  st.sampled_from(["string", "integer", "number", "boolean",
                                   "array", "object", "null"])),
        st.builds(lambda vals: {"enum": vals},
                  st.lists(st.one_of(st.integers(-3, 3), st.text("ab", max_size=2),
                                     st.booleans()), min_size=1, max_size=4)),
        st.builds(lambda v: {"const": v},
                  st.one_of(st.integers(-3, 3), st.text("ab", max_size=2))),
    )


def combinator_schema(inner):
    return st.one_of(
        st.builds(lambda xs: {"allOf": xs}, st.lists(inner, min_size=1, max_size=3)),
        st.builds(lambda xs: {"anyOf": xs}, st.lists(inner, min_size=1, max_size=3)),
        st.builds(lambda xs: {"oneOf": xs}, st.lists(inner, min_size=1, max_size=3)),
        st.builds(lambda x: {"not": x}, inner),
        st.builds(lambda i, t, e: {"if": i, "then": t, "else": e},
                  inner, inner, inner),
    )


def doc_schema():
    leaf = scalar_schema()
    node = st.one_of(leaf, combinator_schema(leaf))
    return st.builds(
        lambda s, n, d, arr_items, req, uniq, minit: {
            "type": "object",
            "properties": {
                "s": s, "n": n, "d": d,
                "arr": {"items": arr_items, "uniqueItems": uniq,
                        "minItems": minit},
            },
            "required": req,
        },
        node, node, node, node,
        st.lists(st.sampled_from(["s", "n", "d", "arr", "b"]),
                 max_size=3, unique=True),
        st.booleans(), st.integers(0, 2),
    )


def rows():
    return st.lists(
        st.tuples(
            st.one_of(st.none(), st.sampled_from(["", "a", "ab", "abc", "ba", "b"])),
            st.one_of(st.none(), st.integers(-6, 6)),
            st.one_of(st.none(), st.sampled_from([-2.5, -1.0, 0.0, 0.5, 1.0, 2.0, 3.5])),
            st.one_of(st.none(), st.lists(st.one_of(st.none(), st.integers(-3, 3)),
                                          max_size=3)),
            st.one_of(st.none(), st.booleans()),
        ),
        min_size=1, max_size=8)


def row_to_json(t):
    doc = {}
    for k, v in zip(("s", "n", "d", "arr", "b"), t):
        if v is not None:
            doc[k] = [x for x in v] if isinstance(v, list) else v
    return doc


def map_schema():
    leaf = scalar_schema()
    return st.builds(
        lambda props, req, pn_max, addl, maxp: {
            "type": "object",
            "properties": {k: v for k, v in props},
            "required": req,
            "propertyNames": {"maxLength": pn_max},
            "additionalProperties": addl,
            "maxProperties": maxp,
        },
        st.lists(st.tuples(st.sampled_from(["a", "b", "cc"]), leaf),
                 max_size=3, unique_by=lambda t: t[0]),
        st.lists(st.sampled_from(["a", "b"]), max_size=2, unique=True),
        st.integers(1, 3),
        st.one_of(st.booleans(), leaf),
        st.integers(0, 4),
    )


def map_rows():
    key = st.sampled_from(["a", "b", "cc", "dddd"])
    return st.lists(
        st.one_of(st.none(),
                  st.dictionaries(key, st.integers(-5, 5), max_size=4)),
        min_size=1, max_size=6)


@pytest.mark.slow
@settings(max_examples=30, deadline=None,
          suppress_health_check=[HealthCheck.too_slow,
                                 HealthCheck.function_scoped_fixture])
@given(schema=map_schema(), data=map_rows())
def test_map_lowering_agrees_with_interpreter(spark, schema, data):
    ref = CompiledValidator(schema)
    expected = [True if m is None else ref.is_valid(dict(m)) for m in data]
    exp_viols = [[] if m is None else
                 sorted((x.keyword, x.json_pointer)
                        for x in ref.validate(dict(m)))
                 for m in data]
    df = spark.createDataFrame([(m,) for m in data], "m: map<string,long>")
    try:
        out = validate_dataframe(df, schema, doc_col="m")
    except CompileFallback:
        return
    rows = out.collect()
    got = [r["valid"] for r in rows]
    assert got == expected, (schema, data, got, expected)
    # r2: violation (keyword, pointer) MULTISETS must also agree
    got_viols = [sorted((x["keyword"], x["json_pointer"])
                        for x in (r["violations"] or [])) for r in rows]
    assert got_viols == exp_viols, (schema, data, got_viols, exp_viols)


@pytest.mark.slow
@settings(max_examples=40, deadline=None,
          suppress_health_check=[HealthCheck.too_slow,
                                 HealthCheck.function_scoped_fixture])
@given(schema=doc_schema(), data=rows())
def test_columnar_agrees_with_interpreter(spark, schema, data):
    ref = CompiledValidator(schema)
    # interpreter semantics: null column = absent key; null ARRAY ELEMENT is
    # JSON null (kept)
    expected = []
    for t in data:
        doc = row_to_json(t)
        if "arr" in doc:
            doc["arr"] = [x for x in doc["arr"]]
        expected.append(ref.is_valid(doc))
    exp_viols = []
    for t in data:
        doc = row_to_json(t)
        if "arr" in doc:
            doc["arr"] = [x for x in doc["arr"]]
        exp_viols.append(sorted((x.keyword, x.json_pointer)
                                for x in ref.validate(doc)))
    df = spark.createDataFrame(data, TABLE_SCHEMA)
    try:
        out = validate_dataframe(df, schema)
    except CompileFallback:
        return  # legal: routed to the Arrow path in production
    rows = out.collect()
    got = [r["valid"] for r in rows]
    assert got == expected, (schema, data, got, expected)
    got_viols = [sorted((x["keyword"], x["json_pointer"])
                        for x in (r["violations"] or [])) for r in rows]
    assert got_viols == exp_viols, (schema, data, got_viols, exp_viols)
