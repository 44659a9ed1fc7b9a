"""Reconstructed draft-7 ``optional/`` suites (VERDICT r2 #4): bignum,
float-overflow, non-bmp-regex. These stress the engine's hardest edges —
numeric overflow (the r1 ``x % 1.0`` BIGINT-overflow fix) and
codepoint-vs-UTF16 length/regex handling.

Reconstructions from memory of the official JSON-Schema-Test-Suite (same
caveat as the rest of fixtures/suite_official/ — vendor the real files when
the sandbox has network). They are intentionally NOT globbed by the main
suite replays: the reference's Float semantics genuinely DIVERGE from the
official expectation on one case, pinned here as a known difference.

Known difference (reference parity beats official-suite parity):
``{"type":"integer","multipleOf":0.5}`` on ``1e308`` — official says valid
"if overflow is handled"; the reference's validateMultipleOf divides first
(1e308/0.5 = inf, Float.isInt inf = false,
/root/reference/JsonSchema/Validation.lean:106 region), so the Lean engine —
and therefore this one, on every path — says INVALID.
"""

import json
from pathlib import Path

import pytest
from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType

from json_schema_lean_spark.compiler import ColumnarCompiler, CompileFallback
from json_schema_lean_spark.inference import infer_json_dtype
from json_schema_lean_spark.interpreter import CompiledValidator
from json_schema_lean_spark.variant import VariantCompiler

OPTIONAL = (Path(__file__).resolve().parent.parent
            / "fixtures" / "suite_official" / "draft7" / "optional")

#: (file-stem, case-description, test-description) -> verdict OUR engine
#: (and the Lean reference) produces where the official suite disagrees
KNOWN_DIFFERENCES = {
    ("float-overflow",
     "all integers are multiples of 0.5, if overflow is handled",
     "valid if optional overflow handling is implemented"): False,
}


def load_optional():
    out = []
    for f in sorted(OPTIONAL.glob("*.json")):
        for case in json.loads(f.read_text()):
            for t in case["tests"]:
                expected = KNOWN_DIFFERENCES.get(
                    (f.stem, case["description"], t["description"]),
                    t["valid"])
                out.append((f"{f.stem}: {case['description']}: "
                            f"{t['description']}",
                            case["schema"], t["data"], expected))
    return out


def test_optional_fixtures_exist_and_parse():
    cases = load_optional()
    assert len(cases) >= 15, len(cases)


def test_optional_suites_interpreter():
    for vid, schema, data, expected in load_optional():
        got = CompiledValidator(schema).is_valid(data)
        assert got is expected, (vid, got, expected)


def test_optional_suites_variant_path(spark):
    rows, comps = [], []
    for i, (vid, schema, data, expected) in enumerate(load_optional()):
        low = VariantCompiler(schema).lower()  # all lowerable — pin that too
        comps.append((i, low, vid, expected))
        rows.append((i, json.dumps(data)))
    df = spark.createDataFrame(rows, "i int, inst string")
    v = F.try_parse_json("inst")
    expr = F.lit(None).cast("boolean")
    for i, low, _vid, _exp in reversed(comps):
        ok = F.coalesce(low.valid(v), F.lit(False))
        expr = F.when(F.col("i") == i, ok).otherwise(expr)
    got = {r["i"]: r["valid"]
           for r in df.select("i", expr.alias("valid")).collect()}
    for i, _low, vid, expected in comps:
        assert got[i] is expected, (vid, got[i], expected)


def test_optional_suites_static_columnar_path(spark):
    eligible, skipped = [], []
    for vid, schema, data, expected in load_optional():
        dtype, why = infer_json_dtype(data)
        if dtype is None:
            skipped.append((vid, why))
            continue
        try:
            low = ColumnarCompiler(schema).lower(dtype, null_means="null")
        except CompileFallback as e:
            skipped.append((vid, str(e)))
            continue
        eligible.append((vid, dtype, low, json.dumps([data]), expected))
    # every optional case is scalar/flat-object shaped: all must be eligible
    assert not skipped, skipped
    for vid, dtype, low, inst, expected in eligible:
        df = spark.createDataFrame([(inst,)], "inst string")
        col = F.element_at(F.from_json(F.col("inst"), ArrayType(dtype)), 1)
        [row] = df.select(F.coalesce(low.valid(col), F.lit(False))
                          .alias("v")).collect()
        assert row["v"] is expected, (vid, row["v"], expected)
