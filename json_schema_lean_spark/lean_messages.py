"""Reference-format violation messages (VERDICT r1 #6, flag-gated).

The reference compresses the offending value into every error string:
``reportError msg json = "{msg} {json.compress}"``
(/root/reference/JsonSchema/Error.lean:8-9). Message bodies are the literal
strings in /root/reference/JsonSchema/Validation.lean (line refs below).

Byte-parity contract: the two published goldens
(/root/reference/JsonSchemaTesting/Examples.lean:17-22, 82-90)

    Expected one of #[string], got  42
    Object is missing required fields: #[street, city], got  {"street":"789 Business Ave"}

compare byte-equal (tests/test_interpreter.py). Messages outside the golden
set follow the same construction but inherit two documented approximations:
Lean's ``Float.toString`` rendering (e.g. "3.000000") is reproduced with
``%f``, and Lean's object compress emits keys in RBNode (sorted) order,
reproduced with ``sort_keys=True``.
"""

from __future__ import annotations

import json
import math
from typing import Any


def lean_compress(v: Any) -> str:
    """Lean ``Json.compress``: compact, object keys in RBNode (sorted)
    order."""
    if isinstance(v, float) and math.isfinite(v) and v == int(v):
        # JsonNumber keeps the decimal point for float-parsed values
        return f"{v:.1f}"
    return json.dumps(v, separators=(",", ":"), sort_keys=True,
                      ensure_ascii=False)


def lean_array(items: list[str]) -> str:
    """Lean ``Array`` ToString: ``#[a, b]`` (elements via their ToString —
    note: NO quotes around strings, per the required-fields golden)."""
    return "#[" + ", ".join(items) + "]"


def lean_float(x: float) -> str:
    """Lean ``Float.toString`` (six decimals for finite values)."""
    if isinstance(x, int):
        return f"{float(x):.6f}"
    return f"{x:.6f}"


def lean_num(x: Any) -> str:
    """Lean ``JsonNumber.toString``: integral values render bare."""
    if isinstance(x, int) and not isinstance(x, bool):
        return str(x)
    if isinstance(x, float) and x == int(x) and math.isfinite(x):
        return f"{x:.1f}"
    return repr(x)


def report(msg: str, value: Any) -> str:
    """``reportError``: message + ' ' + compress (Error.lean:8-9). The
    message bodies already end with a space before 'got', hence the
    double-space in the goldens."""
    return f"{msg} {lean_compress(value)}"


#: runtime tail of each reference message on the COLUMN-BASED paths
#: (compiler.py / variant.py), appended after ``ref_prefix``:
#:   value       -> Json.compress of the offending value
#:   strlen      -> codepoint length of the string (bare Nat — reportError
#:                  takes s.length, and compress of a Nat is bare digits)
#:   num         -> '"' + JsonNumber-ish toString + '"' (reportError coerces
#:                  the n.toString STRING through Json.str, hence quoted)
#:   count_value -> item/property/match count + ' ' + compress(value)
#:   const       -> fully static (no runtime part)
REF_SHAPES = {
    "type": "value", "const": "value", "enum": "value", "required": "value",
    "pattern": "value", "uniqueItems": "value", "not": "value",
    "contains": "value", "contains_empty": "value", "dependencies": "value",
    "propertyNames": "value", "$ref": "value",
    "maxLength": "strlen", "minLength": "strlen",
    "maximum": "num", "exclusiveMaximum": "num", "minimum": "num",
    "exclusiveMinimum": "num", "multipleOf": "num",
    "maxItems": "count_value", "minItems": "count_value",
    "maxProperties": "count_value", "minProperties": "count_value",
    "oneOf": "count_value",
    "false": "const",
}


def ref_prefix(keyword: str, **ctx: Any) -> str:
    """Static prefix of the reference message (everything before the
    runtime part described by REF_SHAPES), INCLUDING reportError's joining
    space. Keyword-specific ctx mirrors reference_message below."""
    if keyword == "type":
        return f"Expected one of {lean_array(ctx['types'])}, got  "
    if keyword == "const":
        return f"Expected {lean_compress(ctx['const'])}, got  "
    if keyword == "enum":
        return ("Expected one of "
                + lean_array([lean_compress(e) for e in ctx["enum"]])
                + ", got  ")
    if keyword == "required":
        return ("Object is missing required fields: "
                + lean_array(ctx["required"]) + ", got  ")
    if keyword == "maxLength":
        return f"String is too long, max length is {ctx['limit']}, got  "
    if keyword == "minLength":
        return f"String is too short, min length is {ctx['limit']}, got  "
    if keyword == "pattern":
        return f"String does not match pattern {ctx['pattern']}, got  "
    if keyword == "maximum" or keyword == "exclusiveMaximum":
        return f"Number is too large, max is {lean_float(ctx['limit'])}, got  "
    if keyword == "minimum" or keyword == "exclusiveMinimum":
        return f"Number is too small, min is {lean_float(ctx['limit'])}, got  "
    if keyword == "multipleOf":
        return f"Number is not multiple of {lean_float(ctx['limit'])}, got  "
    if keyword == "uniqueItems":
        return "Array has duplicate items:  "
    if keyword == "maxItems":
        return f"Array has too many items, max is {ctx['limit']}, got "
    if keyword == "minItems":
        return f"Array has too few items, min is {ctx['limit']}, got "
    if keyword == "maxProperties":
        return f"Object has too many properties, max is {ctx['limit']}, got "
    if keyword == "minProperties":
        return f"Object has too few properties, min is {ctx['limit']}, got "
    if keyword == "oneOf":
        return "oneOf: expected exactly 1 match but got "
    if keyword == "not":
        return "not: expected schema to NOT match but it did "
    if keyword == "contains":
        return "contains: no array elements matched the schema "
    if keyword == "contains_empty":
        return ("contains: array is empty, expected at least one matching "
                "element ")
    if keyword == "dependencies":
        return (f"Property '{ctx['key']}' requires property '{ctx['req']}' "
                f"to be present ")
    if keyword == "propertyNames":
        return f"Property name '{ctx['name']}' is invalid "
    if keyword == "$ref":
        return f"Could not find ({ctx['base']}, {ctx['path']}) "
    if keyword == "false":
        return "Boolean schema 'false' rejects all values"
    raise KeyError(keyword)


def reference_message(keyword: str, value: Any, **ctx: Any) -> str:
    """Reference-format message for one violation. ``ctx`` carries the
    keyword-specific slots (Validation.lean line refs inline)."""
    if keyword == "type":                                     # :205
        return report(
            f"Expected one of {lean_array(ctx['types'])}, got ", value)
    if keyword == "const":                                    # :38
        return report(f"Expected {lean_compress(ctx['const'])}, got ", value)
    if keyword == "maxLength":                                # :45
        return report(
            f"String is too long, max length is {ctx['limit']}, got ",
            len(value))
    if keyword == "minLength":                                # :53
        return report(
            f"String is too short, min length is {ctx['limit']}, got ",
            len(value))
    if keyword == "pattern":                                  # :65
        return report(
            f"String does not match pattern {ctx['pattern']}, got ", value)
    if keyword == "maximum":                                  # :74
        return report(
            f"Number is too large, max is {lean_float(ctx['limit'])}, got ",
            lean_num(value))
    if keyword == "exclusiveMaximum":                         # :82
        return report(
            f"Number is too large, max is {lean_float(ctx['limit'])}, got ",
            lean_num(value))
    if keyword == "minimum":                                  # :90
        return report(
            f"Number is too small, min is {lean_float(ctx['limit'])}, got ",
            lean_num(value))
    if keyword == "exclusiveMinimum":                         # :98
        return report(
            f"Number is too small, min is {lean_float(ctx['limit'])}, got ",
            lean_num(value))
    if keyword == "multipleOf":                               # :106
        return report(
            f"Number is not multiple of {lean_float(ctx['limit'])}, got ",
            lean_num(value))
    if keyword == "enum":                                     # :112
        return report(
            "Expected one of "
            + lean_array([lean_compress(e) for e in ctx['enum']])
            + ", got ", value)
    if keyword == "uniqueItems":                              # :122
        return report("Array has duplicate items: ", value)
    if keyword == "maxItems":                                 # :131
        return report(
            f"Array has too many items, max is {ctx['limit']}, "
            f"got {len(value)}", value)
    if keyword == "minItems":                                 # :139
        return report(
            f"Array has too few items, min is {ctx['limit']}, "
            f"got {len(value)}", value)
    if keyword == "required":                                 # :147
        return report(
            "Object is missing required fields: "
            + lean_array(ctx["required"]) + ", got ", value)
    if keyword == "maxProperties":                            # :155
        return report(
            f"Object has too many properties, max is {ctx['limit']}, "
            f"got {len(value)}", value)
    if keyword == "minProperties":                            # :163
        return report(
            f"Object has too few properties, min is {ctx['limit']}, "
            f"got {len(value)}", value)
    if keyword == "anyOf":                                    # :224
        errs = lean_array([lean_array(b) for b in ctx.get("errors", [])])
        return report(f"anyOf: no schemas matched. Errors: {errs}", value)
    if keyword == "oneOf":                                    # :236-237
        n = ctx.get("matched", 0)
        if n == 0:
            errs = lean_array([lean_array(b) for b in ctx.get("errors", [])])
            return report(
                f"oneOf: expected exactly 1 match but got 0. Errors: {errs}",
                value)
        return report(f"oneOf: expected exactly 1 match but got {n}", value)
    if keyword == "not":                                      # :242
        return report("not: expected schema to NOT match but it did", value)
    if keyword == "contains":                                 # :249, :258
        if ctx.get("empty"):
            return report(
                "contains: array is empty, expected at least one matching "
                "element", value)
        return report(
            "contains: no array elements matched the schema", value)
    if keyword == "dependencies":                             # :349
        return report(
            f"Property '{ctx['key']}' requires property '{ctx['req']}' "
            f"to be present", value)
    if keyword == "$ref":                                     # :383
        return report(f"Could not find ({ctx['base']}, {ctx['path']})", value)
    if keyword == "propertyNames":
        return report(f"Property name '{ctx['name']}' is invalid", value)
    if keyword == "false":                                    # :430
        return "Boolean schema 'false' rejects all values"
    if keyword == "$recursion":                               # :432
        return f"Stack overflow: {lean_compress(ctx.get('schema'))}"
    return report(keyword, value)
