"""Per-instance Spark DataType inference for the STATIC columnar path.

The ColumnarCompiler (compiler.py) specializes a schema against a static
DataType — the 100-TB fast path, where documents arrive shredded as parquet
structs. To replay free-form JSON instances (e.g. the conformance suite)
through that path, infer the narrowest DataType the instance fits, load it
with ``from_json``, and lower with ``null_means="null"`` at the root.

Eligibility: struct shredding represents an ABSENT key and a JSON ``null``
value identically (a NULL struct field), so an instance is only
struct-typeable when the distinction cannot matter:

- no object anywhere maps a key to JSON ``null`` (nulls INSIDE arrays are
  fine — array elements lower with ``null_means='null'``);
- arrays are homogeneous after widening (int+float -> double; null fits any
  element type; object elements merge by field union, recursively);
- no object has case-insensitively colliding or empty keys (Spark field
  resolution is case-insensitive by default and ``getField("")`` is
  unreliable).

``infer_json_dtype`` returns ``(dtype, None)`` or ``(None, reason)``; the
reason string feeds eligibility accounting in the suite replay
(tests/test_columnar_suite.py) so coverage loss is visible, not silent.
"""

from __future__ import annotations

from typing import Any, Optional

from pyspark.sql.types import (
    ArrayType,
    BooleanType,
    DataType,
    DoubleType,
    LongType,
    NullType,
    StringType,
    StructField,
    StructType,
)

_I64_MIN, _I64_MAX = -(2 ** 63), 2 ** 63 - 1


class Ineligible(Exception):
    def __init__(self, reason: str):
        super().__init__(reason)
        self.reason = reason


def infer_json_dtype(value: Any) -> tuple[Optional[DataType], Optional[str]]:
    """Narrowest DataType `value` fits on the struct-shredded path, or
    (None, reason) when the instance is not struct-typeable."""
    try:
        return _solidify(_infer(value, at_object_value=False)), None
    except Ineligible as e:
        return None, e.reason


def _infer(value: Any, at_object_value: bool) -> DataType:
    if value is None:
        if at_object_value:
            raise Ineligible("null object value (absent-vs-null ambiguity)")
        # sentinel: fits any type; resolved to an inert string by _solidify
        return NullType()
    if isinstance(value, bool):
        return BooleanType()
    if isinstance(value, int):
        if _I64_MIN <= value <= _I64_MAX:
            return LongType()
        return DoubleType()  # reference compares numerics as Float anyway
    if isinstance(value, float):
        return DoubleType()
    if isinstance(value, str):
        return StringType()
    if isinstance(value, list):
        merged: DataType = NullType()
        for e in value:
            merged = _merge(merged, _infer(e, at_object_value=False))
        return ArrayType(merged, containsNull=True)
    if isinstance(value, dict):
        lowered = [k.lower() for k in value]
        if len(set(lowered)) != len(lowered):
            raise Ineligible("case-insensitively colliding object keys")
        if any(k == "" for k in value):
            raise Ineligible("empty-string object key")
        return StructType([
            StructField(k, _infer(v, at_object_value=True), nullable=True)
            for k, v in value.items()])
    raise Ineligible(f"untypeable python value {type(value).__name__}")


def _merge(a: DataType, b: DataType) -> DataType:
    if a == b:
        return a
    if isinstance(a, NullType):
        return b
    if isinstance(b, NullType):
        return a
    num = (LongType, DoubleType)
    if isinstance(a, num) and isinstance(b, num):
        return DoubleType()
    if isinstance(a, ArrayType) and isinstance(b, ArrayType):
        return ArrayType(_merge(a.elementType, b.elementType),
                         containsNull=True)
    if isinstance(a, StructType) and isinstance(b, StructType):
        # union of fields; same-name fields merge recursively. An absent
        # field in one element is just NULL there — which struct fields
        # already treat as absent.
        fields: dict[str, DataType] = {f.name: f.dataType for f in a.fields}
        order = [f.name for f in a.fields]
        for f in b.fields:
            if f.name in fields:
                fields[f.name] = _merge(fields[f.name], f.dataType)
            else:
                fields[f.name] = f.dataType
                order.append(f.name)
        lowered = [n.lower() for n in order]
        if len(set(lowered)) != len(lowered):
            raise Ineligible("case-insensitively colliding merged keys")
        return StructType([StructField(n, fields[n], nullable=True)
                           for n in order])
    raise Ineligible(
        f"heterogeneous array ({a.simpleString()} vs {b.simpleString()})")


def _solidify(t: DataType) -> DataType:
    """Replace NullType sentinels with an inert concrete type (no value ever
    inhabits those positions, so any type works; string is the most inert)."""
    if isinstance(t, NullType):
        return StringType()
    if isinstance(t, ArrayType):
        return ArrayType(_solidify(t.elementType), containsNull=True)
    if isinstance(t, StructType):
        return StructType([
            StructField(f.name, _solidify(f.dataType), nullable=True)
            for f in t.fields])
    return t
