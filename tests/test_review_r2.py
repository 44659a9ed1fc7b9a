"""Regressions for the round-2 self-review findings (code-review pass over
the r2 diff): literal braces reaching Java, prefixItems shadowing tuple
items, duplicate valid columns on the variant path, child-barrier name
collisions, empty drift specs, and the events-violations oracle's edge
semantics.
"""

import json
import tempfile

import duckdb
import pytest
from pyspark.sql import functions as F

from json_schema_lean_spark.interpreter import CompiledValidator
from json_schema_lean_spark.regex_dialect import to_java_regex


def test_literal_braces_transpile_to_java_legal_patterns(spark):
    """Python treats a dangling '{' as a literal; bare '{' crashes Java at
    runtime. The transpiled form must escape it (never crash, same
    verdicts)."""
    import re
    # note: a bare "{2}" is invalid in Python re itself ("nothing to
    # repeat") and correctly rejects at the compile gate
    cases = [("a{", ["a{", "a", "{"]), ("a{b}", ["a{b}", "ab"]),
             ("x{1,", ["x{1,", "x"]),
             ("a{2}", ["aa", "a"]), ("a{1,2}b", ["ab", "aab", "b"])]
    pairs, expected = [], []
    for pat, strings in cases:
        jpat = to_java_regex(pat)
        assert jpat is not None, pat
        for s in strings:
            pairs.append((jpat, s))
            expected.append(re.search(pat, s) is not None)
    df = spark.createDataFrame(
        [(i, p, s) for i, (p, s) in enumerate(pairs)],
        "i int, pat string, s string")
    got = {r["i"]: bool(r["m"]) for r in
           df.select("i", F.regexp_like("s", F.col("pat")).alias("m")).collect()}
    assert [got[i] for i in range(len(pairs))] == expected


def test_prefixitems_does_not_shadow_tuple_items():
    """Draft-7 tuple-form items wins when both spellings appear."""
    v = CompiledValidator({"items": [{"type": "string"}],
                           "prefixItems": [{"type": "integer"}]})
    assert v.is_valid(["a"]) is True
    assert v.is_valid([1]) is False


def test_variant_replaces_existing_valid_column(spark):
    """Re-validating prior output must replace valid/violations like the
    Arrow path's withColumns, not produce ambiguous duplicates."""
    from json_schema_lean_spark.operators.validation import validate_json_column

    schema = {"type": "object", "required": ["k"]}
    df = spark.createDataFrame([('{"k":1}', False), ("{}", True)],
                               "props string, valid boolean")
    out = validate_json_column(df, "props", schema)
    assert out.columns.count("valid") == 1
    got = {r["props"]: r["valid"] for r in out.collect()}
    assert got == {'{"k":1}': True, "{}": False}  # recomputed, not stale


def test_variant_child_barrier_name_collision(spark):
    from json_schema_lean_spark.operators.validation import validate_json_column

    schema = {"type": "object", "required": ["k"],
              "properties": {"k": {"type": "integer"}}}
    df = spark.createDataFrame([('{"k":1}', 9)],
                               "props string, _jsl_variant_kids int")
    out = validate_json_column(df, "props", schema)
    assert out.select("valid").collect()[0]["valid"] is True


def test_drift_report_empty_baseline(spark):
    from json_schema_lean_spark.operators.drift import drift_report, histograms

    df = spark.range(5)
    assert histograms(df, []) == {}
    assert drift_report(df, []) == []


def test_events_violations_oracle_agrees_on_adversarial_shapes(spark):
    """The DuckDB oracle must mirror validator semantics on EVERY input
    shape, not just the fixture distribution: NULL input, bad JSON,
    non-object roots, present-null keys, integral doubles, strings,
    booleans."""
    import __spark_entry__ as e

    shapes = [None, "bad json", "5", "null", '{"k": null}', '{"k": 2.0}',
              '{"k": 1.5}', '{"k": "x"}', "{}", '{"k": 0}', '{"k": 99}',
              '{"k": 7}', "[1,2]", '{"k": true}']
    d = tempfile.mkdtemp()
    spark.createDataFrame([(i, s) for i, s in enumerate(shapes)],
                          "event_id long, props string") \
         .coalesce(1).write.mode("overwrite").parquet(f"{d}/events.parquet")
    srows = sorted(tuple(r) for r in
                   e.queries()["events_props_violations"](spark, d).collect())
    con = duckdb.connect()
    con.execute(f"CREATE VIEW events AS SELECT * FROM "
                f"read_parquet('{d}/events.parquet/*.parquet')")
    orows = sorted(tuple(r) for r in
                   con.execute(e.oracle_sql()["events_props_violations"])
                      .fetchall())
    assert srows == orows and len(srows) >= 10
