"""Resolver goldens (ports of JsonSchemaTesting/Resolving.lean:17-165)."""

import json
from pathlib import Path

from json_schema_lean_spark.resolver import Resolver, find_ref_cycle
from json_schema_lean_spark.schema_ast import SchemaObject

FIXTURES = Path(__file__).resolve().parent.parent / "fixtures" / "schemas"


def load(name):
    return json.loads((FIXTURES / name).read_text())


def test_register_paths_counts_anchors():
    r = Resolver().add_schema(load("example_definition.json"),
                              "https://example.com/schemas/customer")
    # root $id + #address + #person
    assert "https://example.com/schemas/customer" in r.registered_paths
    assert "https://example.com/schemas/customer#address" in r.registered_paths
    assert "https://example.com/schemas/customer#person" in r.registered_paths


def test_anchor_resolution_succeeds():
    uri = "https://example.com/schemas/customer"
    r = Resolver().add_schema(load("example_definition.json"), uri)
    for anchor in ("#address", "#person"):
        root, path = r.resolve_path(uri + anchor)
        got = r.get_schema_and_uri(root, path)
        assert got is not None, anchor
        schema, new_uri = got
        assert isinstance(schema, SchemaObject)
        assert schema.types == ["object"]


def test_unknown_anchor_fails():
    uri = "https://example.com/schemas/customer"
    r = Resolver().add_schema(load("example_definition.json"), uri)
    for anchor in ("#meta", "#notarealdef"):
        root, path = r.resolve_path(uri + anchor)
        assert r.get_schema_and_uri(root, path) is None, anchor


def test_pointer_fragment_resolution():
    uri = "https://example.com/schemas/customer"
    r = Resolver().add_schema(load("example_definition.json"), uri)
    root, path = r.resolve_path(uri + "#/definitions/person/properties/name")
    got = r.get_schema_and_uri(root, path)
    assert got is not None
    assert got[0].types == ["string"]


def test_cycle_detected_in_bad_definition():
    r = Resolver().add_schema(load("bad_definition.json"),
                              "https://example.com/schemas/cyclic")
    cycle = find_ref_cycle(r)
    assert cycle is not None
    joined = " ".join(cycle)
    assert "definitions/A" in joined and "definitions/B" in joined


def test_no_cycle_in_clean_schema():
    r = Resolver().add_schema(load("example_definition.json"),
                              "https://example.com/schemas/customer")
    assert find_ref_cycle(r) is None


def test_no_cycle_through_properties():
    # recursion through `properties` is data-bounded, not an evil cycle
    schema = {
        "$id": "https://example.com/schemas/tree",
        "type": "object",
        "properties": {"child": {"$ref": "#"}},
    }
    r = Resolver().add_schema(schema, "https://example.com/schemas/tree")
    assert find_ref_cycle(r) is None


def test_weird_empty_key_pointer_navigates():
    uri = "https://example.com/schemas/weird"
    r = Resolver().add_schema(load("weird_schema.json"), uri)
    root, path = r.resolve_path(uri + "#/definitions//definitions/")
    got = r.get_schema_and_uri(root, path)
    assert got is not None
    assert got[0].types == ["integer"]


def test_anchor_2020_alias():
    """2020-12 $anchor registers like a draft-7 plain-name $id fragment."""
    from json_schema_lean_spark.interpreter import CompiledValidator

    schema = {
        "$id": "https://ex.example/root",
        "definitions": {
            "named": {"$anchor": "intdef", "type": "integer"},
        },
        "properties": {"k": {"$ref": "#intdef"}},
    }
    v = CompiledValidator(schema, uri="https://ex.example/root")
    assert v.is_valid({"k": 3}) is True
    assert v.is_valid({"k": "s"}) is False
