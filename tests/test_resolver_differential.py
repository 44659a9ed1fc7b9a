"""Differential over the $id/$ref resolution space (r3: this area changed
twice — navigate_schema stops at the parent scope; $ref-sibling $id is not
applied). Enumerate structured combinations of relative/absolute $ids,
ref chains, and decoy registry documents; every combination must agree
across interpreter, columnar, and variant paths. Decoys are planted at the
URIs a mis-ordered or double-applied rebase would hit, so a divergence
flips a verdict instead of erroring out."""

import itertools
import json

from pyspark.sql import functions as F
from pyspark.sql.types import LongType, StringType

from json_schema_lean_spark.compiler import ColumnarCompiler, CompileFallback
from json_schema_lean_spark.operators.validation import CompiledValidator
from json_schema_lean_spark.resolver import SchemaCycleError
from json_schema_lean_spark.variant import VariantCompiler

BASE = "http://fuzz.test/root.json"

# registry: the CORRECT target is integer; every decoy position is string,
# so any wrong base-URI fold lands on a type that flips the verdict
REGISTRY = {
    "http://fuzz.test/leaf.json": {"type": "integer"},
    "http://fuzz.test/sub/leaf.json": {"type": "string"},
    "http://fuzz.test/sub/sub/leaf.json": {"type": "string"},
    "http://fuzz.test/other.json": {"type": "integer"},
    "http://fuzz.test/sub/other.json": {"type": "string"},
    "http://elsewhere.test/leaf.json": {"type": "string"},
}

IDS = [None, "sub/", "http://elsewhere.test/x.json", "sub/deep.json"]
MIDS = [
    {"$ref": "#/definitions/target"},                     # plain hop
    {"$ref": "#/definitions/target", "$id": "sub/"},      # $id ignored ($ref wins)
    {"allOf": [{"$ref": "#/definitions/target"}]},        # hop through combinator
    {"$id": "sub/", "allOf": [{"$ref": "#/definitions/target"}]},  # $id applies
]
TARGETS = [
    {"$ref": "leaf.json"},                                # doc-relative
    {"$id": "sub/", "$ref": "leaf.json"},                 # $ref wins over $id
    {"$id": "sub/", "allOf": [{"$ref": "leaf.json"}]},    # $id rebases child
    {"type": "integer"},                                  # no ref at all
]


def combos():
    seen = set()
    for tid, mid, target in itertools.product(IDS, MIDS, TARGETS):
        tgt = dict(target)
        if tid is not None:
            tgt["$id"] = tid  # replaces a target-level $id: distinct cases
        root = {
            "$id": BASE,
            "definitions": {"mid": dict(mid), "target": tgt},
            "$ref": "#/definitions/mid",
        }
        key = json.dumps(root, sort_keys=True)
        if key not in seen:   # duplicates would double-count coverage
            seen.add(key)
            yield root


INSTANCES = [3, "x"]


def expected_interp(root):
    try:
        v = CompiledValidator(root, registry=REGISTRY)
    except Exception as e:
        if "cycle" in str(e).lower() or isinstance(e, SchemaCycleError):
            return None
        raise
    return [v.is_valid(i) for i in INSTANCES]


def test_id_ref_combinations_agree_across_paths(spark):
    cases = list(combos())
    # distinct roots only; tid=None keeps each target's own $id and
    # tid="sub/" collides with targets already carrying "sub/", so the
    # distinct count (44 at introduction) sits below the 64-cell matrix
    assert len(cases) >= 44, len(cases)

    variant_rows = []   # (idx, lowered, expected)
    columnar_checked = 0
    bad = []
    for root in cases:
        exp = expected_interp(root)
        if exp is None:
            continue

        # columnar: lower for both a long and a string dtype
        for dtype, inst, want in ((LongType(), 3, exp[0]),
                                  (StringType(), "x", exp[1])):
            try:
                low = ColumnarCompiler(root, registry=REGISTRY).lower(
                    dtype, null_means="null")
            except CompileFallback:
                continue
            df = spark.createDataFrame([(inst,)], f"v {dtype.simpleString()}")
            got = df.select(F.coalesce(low.valid(F.col("v")),
                                       F.lit(False)).alias("ok")).head()["ok"]
            columnar_checked += 1
            if got != want:
                bad.append(("columnar", root, inst, want, got))

        try:
            vlow = VariantCompiler(root, registry=REGISTRY).lower()
        except CompileFallback:
            continue
        variant_rows.append((vlow, exp))

    assert columnar_checked >= 40, columnar_checked
    assert len(variant_rows) >= 30, len(variant_rows)

    # variant: one chunked job over every (case, instance) pair
    rows = []
    for i, (_low, exp) in enumerate(variant_rows):
        for j, inst in enumerate(INSTANCES):
            rows.append((i, json.dumps(inst), exp[j]))
    df = spark.createDataFrame(rows, "i int, inst string, expected boolean")
    v = F.try_parse_json("inst")
    expr = F.lit(None).cast("boolean")
    for i in range(len(variant_rows) - 1, -1, -1):
        low = variant_rows[i][0]
        expr = F.when(F.col("i") == i,
                      F.coalesce(low.valid(v), F.lit(False))).otherwise(expr)
    got = df.select("i", "inst", "expected", expr.alias("valid")).collect()
    bad += [("variant", r["i"], r["inst"], r["expected"], r["valid"])
            for r in got if r["valid"] != r["expected"]]
    assert not bad, bad[:8]
