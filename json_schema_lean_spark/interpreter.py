"""Pure-Python Draft-7 validator with the reference's exact verdict semantics.

Semantic parity target: /root/reference/JsonSchema/Validation.lean (whole file;
keyword chain order :375-424, fuel :426-432). Used (a) driver-side by the
pytest conformance suite, (b) executor-side inside Arrow/pandas batches for
dynamic JSON instances (see operators/validation.py) — never as a row-at-a-time
registered Python UDF.

Reference quirks deliberately reproduced (SURVEY.md §7.3):
- ``1.0`` IS an integer (number with zero fraction, Validation.lean:7-8);
- numeric-tolerant deep equality for const/enum/uniqueItems (``1 == 1.0``,
  bools distinct from numbers; Validation.lean:17-33);
- ``pattern`` is an unanchored *search* (Validation.lean:63); invalid regex
  => validation error;
- ``$ref`` overrides sibling keywords (Draft 7 early return, :378-384);
- every keyword silently passes on instances of a type it does not govern;
- ``contains`` on an empty array fails (:245-259);
- ``additionalItems`` ignored unless ``items`` is a tuple (:325-334);
- recursion bounded by fuel (default 1000) => "Stack overflow" error.

Intentional, semantics-preserving improvement: regexes are compiled once per
validator and cached (the reference recompiles per value, Validation.lean:60).
"""

from __future__ import annotations

import math
import re
import sys
from dataclasses import dataclass
from typing import Any, Optional

from .pointer import pointer_to_string
from .resolver import DEFAULT_URI, Resolver, resolve_uri
from .schema_ast import (
    ABSENT,
    Dependency,
    ItemsSchema,
    Schema,
    SchemaObject,
    parse_schema,
)

DEFAULT_FUEL = 1000


@dataclass(frozen=True)
class Violation:
    keyword: str
    json_pointer: str  # RFC 6901 pointer into the INSTANCE
    message: str


def is_number(v: Any) -> bool:
    return isinstance(v, (int, float)) and not isinstance(v, bool)


def number_is_int(v: Any) -> bool:
    """Integer refinement: int, or finite float with zero fraction."""
    if isinstance(v, bool):
        return False
    if isinstance(v, int):
        return True
    if isinstance(v, float):
        return math.isfinite(v) and v == round(v)
    return False


def check_type(name: str, v: Any) -> bool:
    if name == "any":
        return True
    if name == "null":
        return v is None
    if name == "boolean":
        return isinstance(v, bool)
    if name == "string":
        return isinstance(v, str)
    if name == "number":
        return is_number(v)
    if name == "integer":
        return number_is_int(v)
    if name == "object":
        return isinstance(v, dict)
    if name == "array":
        return isinstance(v, list)
    return False


def json_eq(a: Any, b: Any) -> bool:
    """Numeric-tolerant structural equality (parity: jsonSchemaEq)."""
    if a is None or b is None:
        return a is None and b is None
    if isinstance(a, bool) or isinstance(b, bool):
        return isinstance(a, bool) and isinstance(b, bool) and a == b
    if is_number(a) and is_number(b):
        return float(a) == float(b)
    if isinstance(a, str) and isinstance(b, str):
        return a == b
    if isinstance(a, list) and isinstance(b, list):
        return len(a) == len(b) and all(json_eq(x, y) for x, y in zip(a, b))
    if isinstance(a, dict) and isinstance(b, dict):
        return len(a) == len(b) and all(k in b and json_eq(v, b[k]) for k, v in a.items())
    return False


class CompiledValidator:
    """Compile once (driver), apply many (executor batches).

    Parity: the reference's compile-once-per-case / validate-many split
    (Harness/Harness.lean:15-16) scaled to compile-once-per-run.
    """

    def __init__(
        self,
        schema_json: Any,
        uri: str = DEFAULT_URI,
        registry: Optional[dict[str, Any]] = None,
        fuel: int = DEFAULT_FUEL,
        message_style: str = "structured",
        assert_formats: bool = False,
    ) -> None:
        #: "structured" (default, human-oriented) or "reference" —
        #: byte-format of the Lean reportError strings (lean_messages.py;
        #: goldens from JsonSchemaTesting/Examples.lean pinned in tests)
        self.message_style = message_style
        #: draft-7 default: format is an annotation (and the reference
        #: never implemented it — Format.lean 0 LoC); True turns the
        #: formats.py checkers into assertions
        self.assert_formats = assert_formats
        self.schema: Schema = parse_schema(schema_json)
        self.root_uri = uri
        self.fuel = fuel
        self.resolver = Resolver()
        self.resolver.add_schema(schema_json, uri)
        if registry:
            for reg_uri, reg_schema in registry.items():
                self.resolver.add_schema(reg_schema, reg_uri)
        self._regex_cache: dict[str, Optional[re.Pattern]] = {}

    # -- public API -----------------------------------------------------------

    def is_valid(self, value: Any) -> bool:
        return not self.validate(value, collect_all=False)

    def validate(self, value: Any, collect_all: bool = True) -> list[Violation]:
        """Return violation rows ([] = valid).

        collect_all=False short-circuits on the first failing keyword per node
        (the reference's Except-monad behavior); True evaluates every keyword
        so violation rows report all failures (run-mode choice, SURVEY.md §4).
        """
        out: list[Violation] = []
        # fuel-deep schema recursion can out-run CPython's default frame
        # limit (each schema level costs a few frames); raise it for the
        # duration and translate a blown stack into the reference's
        # "Stack overflow" verdict rather than crashing the executor.
        old_limit = sys.getrecursionlimit()
        sys.setrecursionlimit(max(old_limit, self.fuel * 12 + 1000))
        try:
            self._validate(self.schema, value, self.root_uri, self.fuel, [], out, collect_all)
        except RecursionError:
            out.append(Violation("$recursion", "", "Stack overflow"))
        finally:
            sys.setrecursionlimit(old_limit)
        return out

    # -- regex ----------------------------------------------------------------

    def _regex(self, pattern: str) -> Optional[re.Pattern]:
        if pattern not in self._regex_cache:
            try:
                self._regex_cache[pattern] = re.compile(pattern)
            except re.error:
                self._regex_cache[pattern] = None
        return self._regex_cache[pattern]

    # -- core recursion ---------------------------------------------------------

    def _branch_errors(self, subs, value: Any, base_uri: str,
                       fuel: int) -> list[list[str]]:
        """Per-branch error-message arrays for the reference's anyOf/oneOf
        strings (Validation.lean:224,236)."""
        out = []
        for sub in subs:
            sink: list[Violation] = []
            self._validate(sub, value, base_uri, fuel, [], sink, True)
            out.append([v.message for v in sink])
        return out

    def _passes(self, schema: Schema, value: Any, base_uri: str, fuel: int) -> bool:
        """Trial validation for combinators (errors not emitted)."""
        sink: list[Violation] = []
        self._validate(schema, value, base_uri, fuel, [], sink, collect_all=False)
        return not sink

    def _validate(
        self,
        schema: Schema,
        value: Any,
        base_uri: str,
        fuel: int,
        path: list[str],
        out: list[Violation],
        collect_all: bool,
    ) -> None:
        if fuel <= 0:
            msg = "Stack overflow"
            if self.message_style == "reference":
                from .lean_messages import reference_message
                from .schema_ast import schema_to_json
                msg = reference_message("$recursion", value,
                                        schema=schema_to_json(schema))
            out.append(Violation("$recursion", pointer_to_string(path), msg))
            return
        fuel -= 1
        if isinstance(schema, bool):
            if not schema:
                out.append(Violation("false", pointer_to_string(path),
                                     "Boolean schema 'false' rejects all values"))
            return
        assert isinstance(schema, SchemaObject)
        s = schema
        ptr = pointer_to_string(path)

        def err(keyword: str, msg: str, **ctx: Any) -> bool:
            if self.message_style == "reference":
                from .lean_messages import reference_message
                msg = reference_message(keyword, value, **ctx)
            out.append(Violation(keyword, ptr, msg))
            return not collect_all  # True => stop the chain

        # $ref first, overriding all siblings (Draft 7)
        if s.ref is not None:
            target = resolve_uri(base_uri, s.ref)
            root, subpath = self.resolver.resolve_path(target)
            got = self.resolver.get_schema_and_uri(root, subpath)
            if got is None:
                err("$ref", f"Could not find {target!r}", base=root, path=subpath)
                return
            subschema, new_uri = got
            self._validate(subschema, value, new_uri, fuel, path, out, collect_all)
            return

        if s.id is not None:
            base_uri = resolve_uri(base_uri, s.id)

        # ---- keyword chain in the reference's order (Validation.lean:387-424)
        if not any(check_type(t, value) for t in s.types):
            if err("type", f"expected one of {s.types}", types=list(s.types)):
                return
        if s.const is not ABSENT and not json_eq(s.const, value):
            if err("const", f"expected {s.const!r}", const=s.const):
                return
        if s.max_length is not None and isinstance(value, str) and len(value) > s.max_length:
            if err("maxLength", f"length {len(value)} > {s.max_length}",
                   limit=s.max_length):
                return
        if s.min_length is not None and isinstance(value, str) and len(value) < s.min_length:
            if err("minLength", f"length {len(value)} < {s.min_length}",
                   limit=s.min_length):
                return
        if s.pattern is not None and isinstance(value, str):
            rx = self._regex(s.pattern)
            if rx is None:
                if err("pattern", f"invalid regex {s.pattern!r}"):
                    return
            elif rx.search(value) is None:
                if err("pattern", f"no match for {s.pattern!r}",
                       pattern=s.pattern):
                    return
        if (self.assert_formats and s.format is not None
                and isinstance(value, str)):
            from .formats import check_format
            if not check_format(s.format, value):
                # no reference message shape exists for format (the
                # reference never implemented it) — emit directly instead
                # of routing through err()'s reference_message styling
                # same shape as the columnar/variant paths; never embed the
                # value (a multi-MB string would bloat the violation row)
                out.append(Violation(
                    "format", ptr, f"not a valid {s.format!r}"))
                if not collect_all:
                    return
        if is_number(value):
            x = float(value)
            if s.maximum is not None and not (x <= s.maximum):
                if err("maximum", f"{x} > {s.maximum}", limit=s.maximum):
                    return
            if s.exclusive_maximum is not None and not (x < s.exclusive_maximum):
                if err("exclusiveMaximum", f"{x} >= {s.exclusive_maximum}",
                       limit=s.exclusive_maximum):
                    return
            if s.minimum is not None and not (x >= s.minimum):
                if err("minimum", f"{x} < {s.minimum}", limit=s.minimum):
                    return
            if s.exclusive_minimum is not None and not (x > s.exclusive_minimum):
                if err("exclusiveMinimum", f"{x} <= {s.exclusive_minimum}",
                       limit=s.exclusive_minimum):
                    return
            if s.multiple_of is not None:
                # reference semantics: (n / m) must be a finite integer float
                q = x / s.multiple_of if s.multiple_of != 0 else math.inf
                if not (math.isfinite(q) and q == round(q)):
                    if err("multipleOf",
                           f"{x} is not a multiple of {s.multiple_of}",
                           limit=s.multiple_of):
                        return
        if s.enum is not None and not any(json_eq(e, value) for e in s.enum):
            if err("enum", f"not in enum", enum=list(s.enum)):
                return
        if isinstance(value, dict):
            if s.required is not None:
                missing = [k for k in s.required if k not in value]
                if missing:
                    # reference prints the FULL required array, not the
                    # missing subset (Validation.lean:147 golden)
                    if err("required", f"missing {missing}",
                           required=list(s.required)):
                        return
            if s.max_properties is not None and len(value) > s.max_properties:
                if err("maxProperties", f"{len(value)} > {s.max_properties}",
                       limit=s.max_properties):
                    return
            if s.min_properties is not None and len(value) < s.min_properties:
                if err("minProperties", f"{len(value)} < {s.min_properties}",
                       limit=s.min_properties):
                    return
        if s.unique_items and isinstance(value, list):
            dup = _first_duplicate(value)
            if dup is not None:
                if err("uniqueItems", f"duplicate element at index {dup}"):
                    return
        if s.properties is not None and isinstance(value, dict):
            for name, sub in s.properties:
                if name in value:
                    before = len(out)
                    self._validate(sub, value[name], base_uri, fuel,
                                   path + [name], out, collect_all)
                    if len(out) > before and not collect_all:
                        return
        if s.property_names is not None and isinstance(value, dict):
            for name in value:
                if not self._passes(s.property_names, name, base_uri, fuel):
                    if err("propertyNames", f"property name {name!r} invalid",
                           name=name):
                        return
        # patternProperties (collect matched keys) then additionalProperties
        matched_keys: set[str] = set()
        if s.pattern_properties is not None and isinstance(value, dict):
            compiled: list[tuple[re.Pattern, Schema]] = []
            bad_pattern = False
            for pat, sub in s.pattern_properties:
                rx = self._regex(pat)
                if rx is None:
                    if err("patternProperties", f"invalid regex {pat!r}"):
                        return
                    bad_pattern = True
                    break
                compiled.append((rx, sub))
            if not bad_pattern:
                for name, val in value.items():
                    for rx, sub in compiled:
                        if rx.search(name) is not None:
                            matched_keys.add(name)
                            before = len(out)
                            self._validate(sub, val, base_uri, fuel,
                                           path + [name], out, collect_all)
                            if len(out) > before and not collect_all:
                                return
        if s.additional_properties is not None and isinstance(value, dict):
            declared = {n for n, _ in (s.properties or [])}
            for name, val in value.items():
                if name in declared or name in matched_keys:
                    continue
                before = len(out)
                self._validate(s.additional_properties, val, base_uri, fuel,
                               path + [name], out, collect_all)
                if len(out) > before and not collect_all:
                    return
        if s.dependencies is not None and isinstance(value, dict):
            for key, dep in s.dependencies:
                if key not in value:
                    continue
                if dep.required_props is not None:
                    missing = [r for r in dep.required_props if r not in value]
                    if missing:
                        if err("dependencies", f"{key!r} requires {missing}",
                               key=key, req=missing[0]):
                            return
                if dep.schema is not None:
                    before = len(out)
                    self._validate(dep.schema, value, base_uri, fuel, path, out, collect_all)
                    if len(out) > before and not collect_all:
                        return
        if s.items is not None and isinstance(value, list):
            if s.items.is_tuple:
                for i, (elem, sub) in enumerate(zip(value, s.items.tuple_items)):
                    before = len(out)
                    self._validate(sub, elem, base_uri, fuel,
                                   path + [str(i)], out, collect_all)
                    if len(out) > before and not collect_all:
                        return
            else:
                for i, elem in enumerate(value):
                    before = len(out)
                    self._validate(s.items.single, elem, base_uri, fuel,
                                   path + [str(i)], out, collect_all)
                    if len(out) > before and not collect_all:
                        return
        if s.additional_items is not None and isinstance(value, list):
            if s.items is not None and s.items.is_tuple:
                k = len(s.items.tuple_items)
                for i, elem in enumerate(value[k:], start=k):
                    before = len(out)
                    self._validate(s.additional_items, elem, base_uri, fuel,
                                   path + [str(i)], out, collect_all)
                    if len(out) > before and not collect_all:
                        return
        if isinstance(value, list):
            if s.max_items is not None and len(value) > s.max_items:
                if err("maxItems", f"{len(value)} > {s.max_items}",
                       limit=s.max_items):
                    return
            if s.min_items is not None and len(value) < s.min_items:
                if err("minItems", f"{len(value)} < {s.min_items}",
                       limit=s.min_items):
                    return
            if s.contains is not None:
                lo_n = s.min_contains if s.min_contains is not None else 1
                hi_n = s.max_contains
                if lo_n == 1 and hi_n is None:
                    # reference fast path (short-circuits on first match)
                    if not value:
                        if err("contains", "array is empty", empty=True):
                            return
                    elif not any(self._passes(s.contains, e, base_uri, fuel)
                                 for e in value):
                        if err("contains", "no element matches", empty=False):
                            return
                else:
                    # 2020-12 min/maxContains (extension): bound the count
                    matched = sum(1 for e in value
                                  if self._passes(s.contains, e, base_uri, fuel))
                    if matched < lo_n:
                        if err("contains",
                               f"only {matched} elements match, need {lo_n}",
                               empty=not value):
                            return
                    elif hi_n is not None and matched > hi_n:
                        if err("contains",
                               f"{matched} elements match, max {hi_n}",
                               empty=False):
                            return
        if s.all_of is not None:
            for i, sub in enumerate(s.all_of):
                before = len(out)
                self._validate(sub, value, base_uri, fuel, path, out, collect_all)
                if len(out) > before and not collect_all:
                    return
        if s.any_of is not None:
            if not any(self._passes(sub, value, base_uri, fuel) for sub in s.any_of):
                errors = self._branch_errors(s.any_of, value, base_uri, fuel) \
                    if self.message_style == "reference" else []
                if err("anyOf", "no branch matched", errors=errors):
                    return
        if s.one_of is not None:
            n = sum(1 for sub in s.one_of if self._passes(sub, value, base_uri, fuel))
            if n != 1:
                errors = (self._branch_errors(s.one_of, value, base_uri, fuel)
                          if self.message_style == "reference" and n == 0 else [])
                if err("oneOf", f"{n} branches matched, expected exactly 1",
                       matched=n, errors=errors):
                    return
        if s.not_ is not None:
            if self._passes(s.not_, value, base_uri, fuel):
                if err("not", "schema matched but must not"):
                    return
        if s.if_ is not None:
            branch = s.then_ if self._passes(s.if_, value, base_uri, fuel) else s.else_
            if branch is not None:
                self._validate(branch, value, base_uri, fuel, path, out, collect_all)


def _first_duplicate(arr: list[Any]) -> Optional[int]:
    """Index of the first element equal (json_eq) to an earlier one.

    Hashable fast path keyed on a canonical form; falls back to pairwise
    json_eq for nested values (verdict-identical to the reference's O(n²),
    Validation.lean:114-124, but O(n) for flat arrays).
    """
    def canon(v: Any) -> Any:
        if isinstance(v, bool):
            return ("b", v)
        if is_number(v):
            return ("n", float(v))
        if isinstance(v, str):
            return ("s", v)
        if v is None:
            return ("z",)
        if isinstance(v, list):
            return ("a", tuple(canon(x) for x in v))
        if isinstance(v, dict):
            return ("o", tuple(sorted((k, canon(x)) for k, x in v.items())))
        return ("?", id(v))

    seen: set = set()
    for i, v in enumerate(arr):
        c = canon(v)
        if c in seen:
            return i
        seen.add(c)
    return None


def validate_json(schema_json: Any, value: Any, fuel: int = DEFAULT_FUEL) -> bool:
    """Convenience one-shot (parity: Validation.lean:434-436 ``validate``)."""
    return CompiledValidator(schema_json, fuel=fuel).is_valid(value)
