"""Bowtie-style stdin harness speaking the reference's IHOP protocol
(/root/reference/Harness/Harness.lean:29-57, Harness/Command.lean).

Line-oriented JSON commands on stdin, one JSON response per line on stdout:

- ``{"cmd":"start"}``   -> version + implementation metadata
- ``{"cmd":"dialect"}`` -> ``{"ok": true}``
- ``{"cmd":"stop"}``    -> ``{}`` (the loop continues; EOF/blank line exits,
  same as the reference repl)
- ``{"cmd":"run","seq":N,"case":{"schema":...,"registry":{uri:schema}?,
  "tests":[{"instance":...},...]}}``
  -> ``{"seq":N,"results":[{"valid":bool},...]}``
- unknown command -> the reference's literal error string on stdout

Semantics parity: compile-once-per-case (Harness.lean:15-16), registry
pre-registration for $ref cases, verdict-only results (Valid struct carries
just ``valid``). A schema that fails to compile produces the error string,
matching the reference's Except propagation. This is the single-node
conformance surface; the distributed equivalent is
``suite_validator_udf`` + the driver's suite_conformance query.

Usage: python scripts/harness_stdin.py   (then speak the protocol), or
       bowtie-style: pipe one command per line.
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from json_schema_lean_spark import __version__
from json_schema_lean_spark.metaschema import META_REGISTRY
from json_schema_lean_spark.operators.validation import CompiledValidator

METADATA = {
    "version": 1,
    "implementation": {
        "language": "python",
        "name": "json-schema-lean-spark",
        "homepage": "https://example.invalid/json-schema-lean-spark",
        "issues": "https://example.invalid/json-schema-lean-spark/issues",
        "source": "https://example.invalid/json-schema-lean-spark.git",
        "dialects": ["http://json-schema.org/draft-07/schema#"],
        "version": __version__,
    },
}


def run_case(req: dict) -> str:
    seq = req["seq"]
    case = req["case"]
    schema = case["schema"]
    registry = dict(META_REGISTRY)
    reg = case.get("registry")
    if isinstance(reg, dict):
        registry.update(reg)
    try:
        v = CompiledValidator(schema, registry=registry)
    except Exception as e:  # compile failure -> error string, like Except
        return str(e)
    # Run tests OUTSIDE the compile try: a runtime error on test N must not
    # discard the case or drop the seq — the client correlates on seq, so
    # surface it per-test and keep the remaining results intact.
    results = []
    for t in case["tests"]:
        try:
            results.append({"valid": v.is_valid(t["instance"])})
        except Exception as e:
            results.append({"valid": False,
                            "error": f"{type(e).__name__}: {e}"})
    return json.dumps({"seq": seq, "results": results},
                      separators=(",", ":"))


def dispatch(line: str) -> str:
    try:
        j = json.loads(line)
        cmd = j["cmd"]
    except (ValueError, KeyError, TypeError) as e:
        return str(e)
    if cmd == "start":
        return json.dumps(METADATA, separators=(",", ":"))
    if cmd == "dialect":
        return json.dumps({"ok": True}, separators=(",", ":"))
    if cmd == "stop":
        return "{}"
    if cmd == "run":
        try:
            return run_case(j)
        except Exception as e:  # malformed RunRequest -> error string
            return f"{type(e).__name__}: {e}"
    return "fatal error: unknown command:" + str(cmd)


def repl(stdin=None, stdout=None) -> None:
    stdin = stdin or sys.stdin
    stdout = stdout or sys.stdout
    for line in stdin:
        if line.strip() == "":
            return
        stdout.write(dispatch(line) + "\n")
        stdout.flush()


if __name__ == "__main__":
    repl()
