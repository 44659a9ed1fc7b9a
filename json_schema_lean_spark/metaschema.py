"""The draft-07 meta-schema, reconstructed from public knowledge (the
sandbox has no network to fetch http://json-schema.org/draft-07/schema).

Registered by the suite replays and available to users via META_REGISTRY so
schemas that ``$ref`` the meta-schema URI resolve — the official suite's
definitions.json does exactly that. The reconstruction keeps the published
structure (schemaArray / nonNegativeInteger / simpleTypes / stringArray
definitions, ``$ref: "#"`` recursion at every subschema position); the
annotation-only keywords (title/description/default/examples/format/
content*) are inert during validation, so small wording drifts there cannot
change verdicts.
"""

from __future__ import annotations

DRAFT7_META_URI = "http://json-schema.org/draft-07/schema"

DRAFT7_META = {
    "$schema": "http://json-schema.org/draft-07/schema#",
    "$id": "http://json-schema.org/draft-07/schema#",
    "title": "Core schema meta-schema",
    "definitions": {
        "schemaArray": {"type": "array", "minItems": 1, "items": {"$ref": "#"}},
        "nonNegativeInteger": {"type": "integer", "minimum": 0},
        "nonNegativeIntegerDefault0": {
            "allOf": [{"$ref": "#/definitions/nonNegativeInteger"},
                      {"default": 0}]},
        "simpleTypes": {"enum": ["array", "boolean", "integer", "null",
                                 "number", "object", "string"]},
        "stringArray": {"type": "array", "items": {"type": "string"},
                        "uniqueItems": True, "default": []},
    },
    "type": ["object", "boolean"],
    "properties": {
        "$id": {"type": "string", "format": "uri-reference"},
        "$schema": {"type": "string", "format": "uri"},
        "$ref": {"type": "string", "format": "uri-reference"},
        "$comment": {"type": "string"},
        "title": {"type": "string"},
        "description": {"type": "string"},
        "default": True,
        "readOnly": {"type": "boolean", "default": False},
        "examples": {"type": "array", "items": True},
        "multipleOf": {"type": "number", "exclusiveMinimum": 0},
        "maximum": {"type": "number"},
        "exclusiveMaximum": {"type": "number"},
        "minimum": {"type": "number"},
        "exclusiveMinimum": {"type": "number"},
        "maxLength": {"$ref": "#/definitions/nonNegativeInteger"},
        "minLength": {"$ref": "#/definitions/nonNegativeIntegerDefault0"},
        "pattern": {"type": "string", "format": "regex"},
        "additionalItems": {"$ref": "#"},
        "items": {"anyOf": [{"$ref": "#"},
                            {"$ref": "#/definitions/schemaArray"}],
                  "default": True},
        "maxItems": {"$ref": "#/definitions/nonNegativeInteger"},
        "minItems": {"$ref": "#/definitions/nonNegativeIntegerDefault0"},
        "uniqueItems": {"type": "boolean", "default": False},
        "contains": {"$ref": "#"},
        "maxProperties": {"$ref": "#/definitions/nonNegativeInteger"},
        "minProperties": {"$ref": "#/definitions/nonNegativeIntegerDefault0"},
        "required": {"$ref": "#/definitions/stringArray"},
        "additionalProperties": {"$ref": "#"},
        "definitions": {"type": "object",
                        "additionalProperties": {"$ref": "#"}, "default": {}},
        "properties": {"type": "object",
                       "additionalProperties": {"$ref": "#"}, "default": {}},
        "patternProperties": {"type": "object",
                              "additionalProperties": {"$ref": "#"},
                              "propertyNames": {"format": "regex"},
                              "default": {}},
        "dependencies": {"type": "object", "additionalProperties": {
            "anyOf": [{"$ref": "#"},
                      {"$ref": "#/definitions/stringArray"}]}},
        "propertyNames": {"$ref": "#"},
        "const": True,
        "enum": {"type": "array", "items": True},
        "type": {"anyOf": [
            {"$ref": "#/definitions/simpleTypes"},
            {"type": "array", "items": {"$ref": "#/definitions/simpleTypes"},
             "minItems": 1, "uniqueItems": True}]},
        "format": {"type": "string"},
        "contentMediaType": {"type": "string"},
        "contentEncoding": {"type": "string"},
        "if": {"$ref": "#"},
        "then": {"$ref": "#"},
        "else": {"$ref": "#"},
        "allOf": {"$ref": "#/definitions/schemaArray"},
        "anyOf": {"$ref": "#/definitions/schemaArray"},
        "oneOf": {"$ref": "#/definitions/schemaArray"},
        "not": {"$ref": "#"},
    },
    "default": True,
}

#: registry mapping for resolvers that should see the meta-schema
META_REGISTRY = {DRAFT7_META_URI: DRAFT7_META}

def load_suite_remotes(remotes_dir) -> dict:
    """Load a JSON-Schema-Test-Suite ``remotes/`` tree into a registry dict
    keyed by the suite's canonical ``http://localhost:1234/<relpath>`` URIs
    (the reference runs the suite without network, same as us — remote
    documents are pre-registered, /root/reference/README.md:7 notes the
    skipped network cases). Returned mapping composes with META_REGISTRY."""
    import json as _json
    from pathlib import Path

    rdir = Path(remotes_dir)
    out = {}
    for p in sorted(rdir.rglob("*.json")):
        uri = "http://localhost:1234/" + p.relative_to(rdir).as_posix()
        out[uri] = _json.loads(p.read_text())
    return out
