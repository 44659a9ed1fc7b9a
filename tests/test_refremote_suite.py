"""refRemote suite replay with a pre-registered remotes registry (r3).

The reference skips the suite's network-dependent cases (13 of 254,
/root/reference/README.md:7, test.sh:14-36) because running them needs the
suite's ``remotes/`` documents served on localhost:1234. We don't need a
network either: the remote documents are vendored under
``fixtures/suite_official/remotes/`` (reconstructed from memory, same caveat
as the rest of suite_official/) and pre-registered into the resolver by URI —
exactly what the official test harnesses do minus the HTTP hop.

This is the suite area that exercises $id base-URI *rebasing across document
boundaries* (folder $ids, nested relative $ids), which found a real bug when
first wired: ``navigate_schema`` folded the landed node's own $id into the
returned base URI AND the validator re-applied it on entry — a double rebase
that only bites with relative folder $ids (``baseUriChangeFolder/`` applied
twice). Fixed in resolver.py by making navigation stop at the parent scope.
"""

import json
from pathlib import Path

import pytest
from pyspark.sql import functions as F

from json_schema_lean_spark.compiler import ColumnarCompiler, CompileFallback
from json_schema_lean_spark.inference import infer_json_dtype
from json_schema_lean_spark.metaschema import META_REGISTRY, load_suite_remotes
from json_schema_lean_spark.operators.validation import CompiledValidator
from json_schema_lean_spark.variant import VariantCompiler

FIXTURES = Path(__file__).resolve().parent.parent / "fixtures"
REMOTE_FILE = FIXTURES / "suite_official" / "draft7" / "refremote" / "refRemote.json"


def _registry():
    reg = dict(META_REGISTRY)
    reg.update(load_suite_remotes(FIXTURES / "suite_official" / "remotes"))
    return reg


def _verdicts():
    out = []
    for ci, case in enumerate(json.loads(REMOTE_FILE.read_text())):
        for ti, t in enumerate(case["tests"]):
            out.append((f"refRemote/{ci}/{ti}", case["schema"], t["data"],
                        t["valid"]))
    return out


def test_remotes_registry_loads():
    reg = load_suite_remotes(FIXTURES / "suite_official" / "remotes")
    assert "http://localhost:1234/integer.json" in reg
    assert "http://localhost:1234/baseUriChangeFolder/folderInteger.json" in reg
    assert len(reg) == 7


def test_refremote_through_interpreter():
    reg = _registry()
    verdicts = _verdicts()
    assert len(verdicts) >= 14
    cache = {}
    bad = []
    for vid, schema, data, expected in verdicts:
        skey = json.dumps(schema, sort_keys=True)
        v = cache.get(skey) or cache.setdefault(
            skey, CompiledValidator(schema, registry=reg))
        if v.is_valid(data) != expected:
            bad.append(vid)
    assert not bad, bad


def test_refremote_through_variant_path(spark):
    reg = _registry()
    rows, lows = [], []
    skipped = 0
    for vid, schema, data, expected in _verdicts():
        try:
            low = VariantCompiler(schema, registry=reg).lower()
        except CompileFallback:
            skipped += 1
            continue
        lows.append(low)
        rows.append((len(lows) - 1, vid, json.dumps(data), expected))
    # every refRemote schema is variant-lowerable (ints/objects/arrays only)
    assert skipped == 0, skipped
    df = spark.createDataFrame(
        rows, "i int, vid string, inst string, expected boolean")
    v = F.try_parse_json("inst")
    expr = F.lit(None).cast("boolean")
    for i in range(len(lows) - 1, -1, -1):
        ok = F.when(v.isNull(), F.lit(False)) \
              .otherwise(F.coalesce(lows[i].valid(v), F.lit(False)))
        expr = F.when(F.col("i") == i, ok).otherwise(expr)
    got = df.select("vid", "expected", expr.alias("valid")).collect()
    bad = [(r["vid"], r["expected"], r["valid"])
           for r in got if r["valid"] != r["expected"]]
    assert not bad, bad


def test_refremote_through_static_columnar_path(spark):
    from pyspark.sql.types import ArrayType

    reg = _registry()
    eligible, skipped = [], 0
    for vid, schema, data, expected in _verdicts():
        dtype, _why = infer_json_dtype(data)
        if dtype is None:
            skipped += 1
            continue
        try:
            low = ColumnarCompiler(schema, registry=reg).lower(
                dtype, null_means="null")
        except CompileFallback:
            skipped += 1
            continue
        eligible.append((vid, dtype, low, json.dumps([data]), expected))
    assert len(eligible) >= 12, (len(eligible), skipped)
    expr = F.lit(None).cast("boolean")
    rows = [(i, vid, inst, exp)
            for i, (vid, _dt, _low, inst, exp) in enumerate(eligible)]
    df = spark.createDataFrame(
        rows, "i int, vid string, inst string, expected boolean")
    for i in range(len(eligible) - 1, -1, -1):
        _vid, dtype, low, _inst, _exp = eligible[i]
        col = F.element_at(F.from_json(F.col("inst"), ArrayType(dtype)), 1)
        expr = F.when(F.col("i") == i,
                      F.coalesce(low.valid(col), F.lit(False))).otherwise(expr)
    got = df.select("vid", "expected", expr.alias("valid")).collect()
    bad = [(r["vid"], r["expected"], r["valid"])
           for r in got if r["valid"] != r["expected"]]
    assert not bad, bad


def test_landed_id_applied_exactly_once():
    """The regression the refRemote wiring caught: a $ref landing ON a node
    that itself carries a relative $id must rebase by that $id exactly once.
    Minimal single-document reproduction (no remotes needed)."""
    schema = {
        "$id": "http://example.test/root.json",
        "definitions": {
            "sub": {
                "$id": "sub/",
                "type": "object",
                "properties": {"v": {"$ref": "leaf.json"}},
            },
        },
        "$ref": "#/definitions/sub",
    }
    reg = {"http://example.test/sub/leaf.json": {"type": "integer"}}
    v = CompiledValidator(schema, registry=reg)
    assert v.is_valid({"v": 3})
    assert not v.is_valid({"v": "x"})


def test_ref_sibling_id_resolves_against_parent_scope():
    """A node carrying BOTH $id and $ref: the $ref resolves against the
    PARENT scope ($ref-first, interpreter.py:227-240) — the node's own $id
    must not rebase it. Pinned on interpreter AND the fused compile-time
    resolver, with a decoy document registered at the would-be-double-rebased
    URI so a divergence flips the verdict instead of erroring."""
    from json_schema_lean_spark.plans.fused import _resolve_once
    from json_schema_lean_spark.compiler import ColumnarCompiler
    from json_schema_lean_spark.schema_ast import SchemaObject, parse_schema

    root = {
        "$id": "http://t.test/root.json",
        "definitions": {
            "both": {"$id": "sub/", "$ref": "leaf.json"},
        },
    }
    reg = {
        "http://t.test/leaf.json": {"type": "integer"},       # correct target
        "http://t.test/sub/leaf.json": {"type": "string"},    # decoy
    }
    v = CompiledValidator({**root, "$ref": "#/definitions/both"},
                          registry=reg)
    assert v.is_valid(3) and not v.is_valid("x")

    comp = ColumnarCompiler(root, registry=reg)
    landed, base = _resolve_once(comp, parse_schema(
        {"$ref": "#/definitions/both"}), comp.root_base_uri())
    assert isinstance(landed, SchemaObject)
    assert list(landed.types) == ["integer"], (landed.types, base)

    # cycle detector walks the same contract without false cycles
    from json_schema_lean_spark.resolver import find_ref_cycle
    assert find_ref_cycle(comp.resolver) is None


def test_folder_remote_exercised():
    """The official refRemote reconstruction doesn't reference the folder/
    remote; exercise it with a home-grown schema so every vendored remote
    document is load-bearing."""
    reg = _registry()
    v = CompiledValidator(
        {"$ref": "http://localhost:1234/folder/folderInteger.json"},
        registry=reg)
    assert v.is_valid(7) and not v.is_valid("x")

    # a $ref NESTED UNDER a folder $id rebases ($ref as a SIBLING of $id
    # would instead resolve against the parent scope and miss — pinned in
    # test_ref_sibling_id_resolves_against_parent_scope)
    v2 = CompiledValidator(
        {"$id": "http://localhost:1234/", "allOf": [
            {"$id": "folder/",
             "allOf": [{"$ref": "folderInteger.json"}]}]},
        registry=reg)
    assert v2.is_valid(7) and not v2.is_valid("x")
