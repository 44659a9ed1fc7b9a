"""Validation runners: columnar (scale path) + Arrow batch (dynamic path).

Parity: the reference's run loop (/root/reference/Harness/Harness.lean:7-26)
compiles a schema once per case and maps it over instances; here the compile
happens once per RUN on the driver and the map is a Catalyst plan over the
whole table.

Two routes, chosen by input shape (SURVEY.md §1.4):

- ``validate_dataframe`` — statically-typed (shredded) tables: the schema is
  lowered to native Column expressions (compiler.ColumnarCompiler). Whole-stage
  codegen, zero Python per row. This is the 100 TB path.
- ``validate_json_column`` — dynamic JSON string columns (e.g. the events
  table's ``props``, or JSON-Schema-Test-Suite replay where instances are
  arbitrary JSON): a vectorized pandas UDF carrying a CompiledValidator in its
  closure (compiled once per executor, Arrow batch transfer — never a
  row-at-a-time Python UDF).
"""

from __future__ import annotations

import json
from typing import Any, Optional

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import StructType

from pyspark.sql.types import ArrayType

from ..compiler import VIOLATION_SCHEMA, ColumnarCompiler, CompileFallback
from ..interpreter import DEFAULT_FUEL, CompiledValidator
from ..plan_cache import plan_memo
from ..schema_ast import SchemaObject, parse_schema

RESULT_SCHEMA = (
    "struct<valid:boolean,"
    "violations:array<struct<keyword:string,json_pointer:string,message:string>>>"
)


def validate_dataframe(
    df: DataFrame,
    schema_json: Any,
    doc_col: Optional[str] = None,
    registry: Optional[dict[str, Any]] = None,
    uri: str = "",
    message_style: str = "structured",
    assert_formats: bool = False,
) -> DataFrame:
    """Columnar validation. Adds ``valid`` (boolean) and ``violations``
    (array<struct<keyword,json_pointer,message>>) columns.

    doc_col=None treats the whole row as the instance object (shredded
    document); otherwise the named struct/array/scalar column is validated.
    message_style="reference" emits byte-parity Lean reportError strings
    (lean_messages.py) with the offending value compressed in at runtime.
    """
    comp = ColumnarCompiler(schema_json, uri=uri, registry=registry,
                            message_style=message_style,
                            assert_formats=assert_formats)
    if doc_col is None:
        instance = F.struct(*[F.col(c) for c in df.columns])
        dtype = StructType([f for f in df.schema.fields])
    else:
        instance = F.col(doc_col)
        dtype = df.schema[doc_col].dataType
    low = comp.lower(dtype)
    valid = low.valid(instance)
    # violations are gated behind the cheap fused verdict: Catalyst's
    # conditional evaluation skips the (much larger) collector expression for
    # every passing row — at 100 TB virtually all rows are valid and pay only
    # the boolean predicate.
    return df.withColumns({
        "valid": valid,
        "violations": F.when(valid, F.array().cast(VIOLATION_SCHEMA))
                       .otherwise(low.violations(instance, F.lit(""))),
    })


def validate_documents_exploded(
    df: DataFrame,
    schema_json: Any,
    spans_col: str = "spans",
    registry: Optional[dict[str, Any]] = None,
    uri: str = "",
    keep_cols: Optional[list[str]] = None,
    message_style: str = "structured",
    assert_formats: bool = False,
) -> DataFrame:
    """Explode-strategy validation for the north_rule input shape
    (scalar doc columns + ONE array<struct> column with Single-items
    semantics). Output schema matches ``validate_dataframe``.

    Why a second strategy: lambda higher-order functions (forall/transform)
    are NOT whole-stage-codegen'd in Spark — they evaluate interpreted per
    element. posexplode + flat predicates keep the heavy per-span keyword
    work inside codegen, then re-aggregate verdicts per row. Measured 6-10x
    faster than the forall plan at sf0.1 (629k vs 60k docs/s warm). The
    shuffle moves only (row-key, verdict, violations) — a tiny fraction of
    input bytes at 100 TB — with map-side partial aggregation; AQE coalesces
    and splits skewed reducers.
    """
    parsed = parse_schema(schema_json)
    if not isinstance(parsed, SchemaObject) or parsed.properties is None:
        raise CompileFallback("explode strategy needs an object schema")
    spans_schema = dict((parsed.raw or {}).get("properties", {}))
    span_prop = spans_schema.pop(spans_col, None)
    if span_prop is None or not isinstance(df.schema[spans_col].dataType, ArrayType):
        raise CompileFallback("explode strategy needs an array column")
    items = span_prop.get("items")
    if items is None or isinstance(items, list):
        raise CompileFallback("explode strategy needs Single-items semantics")

    def build() -> dict:
        # --- doc-level plan: same schema minus the spans items subschema,
        # but compiled with the ORIGINAL root registered so root-relative
        # $refs (e.g. '#/properties/x') still resolve (ADVICE r1) ---------
        doc_schema_json = dict(parsed.raw)
        doc_props = dict(doc_schema_json.get("properties", {}))
        span_prop_doc = dict(span_prop)
        span_prop_doc.pop("items", None)  # array-size keywords stay doc-level
        doc_props[spans_col] = span_prop_doc
        doc_schema_json["properties"] = doc_props
        comp = ColumnarCompiler(schema_json, uri=uri, registry=registry,
                                message_style=message_style,
                                assert_formats=assert_formats)
        doc_dtype = StructType([f for f in df.schema.fields])
        doc_low = comp.lower_node(doc_schema_json, doc_dtype, base_uri=uri)

        # --- span-level plan: items subschema against the element struct,
        # lowered as a NODE of the root compiler (full resolver context) --
        elem_t = df.schema[spans_col].dataType.elementType
        elem_low = comp.lower_node(items, elem_t,
                                   base_uri=comp.root_base_uri(),
                                   null_means="null")

        instance = F.struct(*[F.col(c) for c in df.columns])
        doc_valid = F.coalesce(doc_low.valid(instance), F.lit(False))
        doc_viols = F.when(doc_valid, F.array().cast(VIOLATION_SCHEMA)) \
                     .otherwise(doc_low.violations(instance, F.lit("")))
        span_valid = F.when(F.col("_pos").isNull(), F.lit(True)) \
                      .otherwise(F.coalesce(elem_low.valid(F.col("_span")),
                                            F.lit(False)))
        span_viols = F.when(span_valid, F.array().cast(VIOLATION_SCHEMA)) \
                      .otherwise(elem_low.violations(
                          F.col("_span"),
                          F.concat(F.lit(f"/{spans_col}/"),
                                   F.col("_pos").cast("string"))))
        return {"dok": doc_valid, "dviols": doc_viols,
                "sv": span_valid, "svv": span_viols}

    # schema-derived Columns are unresolved and name-bound: memoized so a
    # checkpointed run's per-unit loop (checkpointing.run) and repeat batches
    # skip the py4j expression rebuild (plan_cache docstring)
    plan = plan_memo("exploded", df, schema_json, registry,
                     (spans_col, uri, message_style, assert_formats), build)
    doc_valid, doc_viols = plan["dok"], plan["dviols"]
    span_valid, span_viols = plan["sv"], plan["svv"]

    # doc-level checks are row-local: evaluate them BEFORE the explode so the
    # document (and its spans array) is never duplicated per span row. Only
    # light columns (keep_cols, doc verdict, doc violations) ride through the
    # generator; the shuffle payload is per-doc verdicts, not document bytes.
    requested = keep_cols if keep_cols is not None else [df.columns[0]]
    keep = [c for c in requested if c != spans_col]
    # opting the spans column into the output carries the array through the
    # explode (one copy per span row) — correct but heavier; default keeps
    # only light id columns, which is the 100 TB-appropriate contract
    keep_spans = spans_col in requested
    pre = df.select(F.monotonically_increasing_id().alias("_rid"),
                    *keep,
                    doc_valid.alias("_dok"), doc_viols.alias("_dviols"),
                    F.col(spans_col).alias("_spans"))
    base = pre.select("_rid", *keep, "_dok", "_dviols",
                      *(["_spans"] if keep_spans else []),
                      F.posexplode_outer("_spans").alias("_pos", "_span"))

    per_row = (base
               .select("_rid", *keep, "_dok", "_dviols", "_pos",
                       *(["_spans"] if keep_spans else []),
                       span_valid.alias("_sv"), span_viols.alias("_svv"))
               .groupBy("_rid")
               .agg(*[F.first(c).alias(c) for c in keep],
                    *([F.first("_spans").alias(spans_col)] if keep_spans else []),
                    F.first("_dok").alias("_dok"),
                    F.first("_dviols").alias("_dviols"),
                    F.min(F.col("_sv").cast("int")).alias("_all_ok"),
                    # collect (pos, viols) pairs, order by pos for determinism
                    F.flatten(F.transform(
                        F.array_sort(F.collect_list(
                            F.when(F.size("_svv") > 0,
                                   F.struct(F.col("_pos").alias("p"),
                                            F.col("_svv").alias("v"))))),
                        lambda e: e.getField("v"))).alias("_sviols")))

    valid = F.col("_dok") & (F.col("_all_ok") == 1)
    viols = F.concat(F.col("_dviols"),
                     F.coalesce(F.col("_sviols"), F.array().cast(VIOLATION_SCHEMA)))
    return per_row.select(*keep,
                          *([spans_col] if keep_spans else []),
                          valid.alias("valid"),
                          F.coalesce(viols, F.array().cast(VIOLATION_SCHEMA))
                           .alias("violations"))


def violation_rows_fast(
    df: DataFrame,
    schema_json: Any,
    spans_col: str = "spans",
    id_cols: Optional[list[str]] = None,
    registry: Optional[dict[str, Any]] = None,
    uri: str = "",
    message_style: str = "structured",
    assert_formats: bool = False,
) -> DataFrame:
    """Violation ROWS (id..., span_idx, keyword, json_pointer, message) with
    ZERO shuffle and one scan — the 100 TB production shape for the
    BASELINE.json violation-row output.

    The explode strategy's groupBy exists only to reassemble per-doc
    violation ARRAYS; when the deliverable is rows, we can skip it: posexplode
    spans, evaluate the span plan flat (codegen), emit span violations where
    they occur, and attach the doc-level violations once per doc on the first
    generator row (_pos 0 or null-spans row). Plan = Scan -> Generate ->
    Project -> Filter -> Generate; every stage is pipelined, nothing moves.
    """
    parsed = parse_schema(schema_json)
    if not isinstance(parsed, SchemaObject) or parsed.properties is None:
        raise CompileFallback("violation_rows_fast needs an object schema")
    span_prop = dict((parsed.raw or {}).get("properties", {})).get(spans_col)
    if span_prop is None or not isinstance(df.schema[spans_col].dataType, ArrayType):
        raise CompileFallback("violation_rows_fast needs the array column")
    items = span_prop.get("items")
    if items is None or isinstance(items, list):
        raise CompileFallback("violation_rows_fast needs Single-items semantics")

    def build() -> dict:
        # doc-level plan (schema minus items) + span-level plan, as in the
        # explode strategy: both lowered as NODES of the root compiler so
        # root-relative $refs keep resolving (ADVICE r1)
        doc_schema_json = dict(parsed.raw)
        doc_props = dict(doc_schema_json.get("properties", {}))
        span_prop_doc = dict(span_prop)
        span_prop_doc.pop("items", None)
        doc_props[spans_col] = span_prop_doc
        doc_schema_json["properties"] = doc_props
        comp = ColumnarCompiler(schema_json, uri=uri, registry=registry,
                                message_style=message_style,
                                assert_formats=assert_formats)
        doc_dtype = StructType([f for f in df.schema.fields])
        doc_low = comp.lower_node(doc_schema_json, doc_dtype, base_uri=uri)

        elem_t = df.schema[spans_col].dataType.elementType
        elem_low = comp.lower_node(items, elem_t,
                                   base_uri=comp.root_base_uri(),
                                   null_means="null")

        instance = F.struct(*[F.col(c) for c in df.columns])
        doc_valid = F.coalesce(doc_low.valid(instance), F.lit(False))
        doc_viols = F.when(doc_valid, F.array().cast(VIOLATION_SCHEMA)) \
                     .otherwise(doc_low.violations(instance, F.lit("")))

        span_valid = F.when(F.col("_pos").isNull(), F.lit(True)) \
                      .otherwise(F.coalesce(elem_low.valid(F.col("_span")),
                                            F.lit(False)))
        span_viols = F.when(span_valid, F.array().cast(VIOLATION_SCHEMA)) \
                      .otherwise(elem_low.violations(
                          F.col("_span"),
                          F.concat(F.lit(f"/{spans_col}/"),
                                   F.col("_pos").cast("string"))))
        # doc-level violations attach exactly once per doc: on the first
        # generator row (pos 0, or the null row for empty/null spans)
        first_row = F.col("_pos").isNull() | (F.col("_pos") == 0)
        all_viols = F.concat(
            F.when(first_row, F.col("_dviols"))
             .otherwise(F.array().cast(VIOLATION_SCHEMA)),
            span_viols)
        return {
            "dviols": doc_viols.alias("_dviols"),
            "posexp": F.posexplode_outer(F.col(spans_col))
                       .alias("_pos", "_span"),
            "v": all_viols.alias("_v"),
            "span_idx": F.nullif(
                F.regexp_extract(F.col("v.json_pointer"),
                                 f"^/{spans_col}/(\\d+)", 1), F.lit(""))
                .cast("int").alias("span_idx"),
        }

    # unresolved name-bound Columns: memoized per (schema, dtype, options) —
    # repeat batches skip the py4j expression rebuild (plan_cache docstring).
    # id_cols are plain strings passed straight to select, not part of the
    # cached expressions.
    plan = plan_memo("violation_rows_fast", df, schema_json, registry,
                     (spans_col, uri, message_style, assert_formats), build)

    ids = id_cols if id_cols is not None else [df.columns[0]]
    base = df.select(*ids, plan["dviols"], plan["posexp"])
    flat = (base.select(*ids, F.col("_pos"), plan["v"])
                .where(F.size("_v") > 0)
                .select(*ids, F.explode("_v").alias("v")))
    return flat.select(
        *ids,
        plan["span_idx"],
        F.col("v.keyword").alias("keyword"),
        F.col("v.json_pointer").alias("json_pointer"),
        F.col("v.message").alias("message"),
    )


def violation_rows_best(
    df: DataFrame,
    schema_json: Any,
    spans_col: str = "spans",
    id_cols: Optional[list[str]] = None,
    registry: Optional[dict[str, Any]] = None,
    uri: str = "",
    assert_formats: bool = False,
) -> DataFrame:
    """Violation rows with a fused-verdict PREFILTER (r2): the cheap fused
    boolean (codegen, zero shuffle, no lambdas) screens out passing docs
    first, so only failing docs — rare at production quality rates (~2% in
    the bench corpus) — pay the posexplode + per-span violation collection.
    Output is row-identical to violation_rows_fast (passing docs contribute
    no rows by definition; pinned in tests). Falls back to the single-pass
    form when the schema is outside the fused subset."""
    from ..plans.fused import FusedUnsupported, validate_documents_fused
    try:
        flagged = validate_documents_fused(
            df, schema_json, spans_col=spans_col, registry=registry, uri=uri,
            keep_cols=list(df.columns), with_violations=False,
            assert_formats=assert_formats)
    except FusedUnsupported:
        return violation_rows_fast(df, schema_json, spans_col=spans_col,
                                   id_cols=id_cols, registry=registry, uri=uri,
                                   assert_formats=assert_formats)
    failing = flagged.where(~F.col("valid")).drop("valid")
    return violation_rows_fast(failing, schema_json, spans_col=spans_col,
                               id_cols=id_cols, registry=registry, uri=uri,
                               assert_formats=assert_formats)


def partition_verdict_metrics(validated: DataFrame) -> DataFrame:
    """Per-partition pass/fail metrics (north_star): one row per physical
    partition with (partition_id, rows, valid_rows, violations). Map-side
    partial aggregation collapses each partition to one row before the
    (tiny) exchange."""
    return (validated
            .groupBy(F.spark_partition_id().alias("partition_id"))
            .agg(F.count(F.lit(1)).alias("rows"),
                 F.sum(F.col("valid").cast("long")).alias("valid_rows"),
                 F.sum(F.size("violations").cast("long")).alias("violations")))


def violation_rows(validated: DataFrame, id_cols: list[str],
                   span_field: str = "spans") -> DataFrame:
    """Explode violations to one row each:
    (id..., span_idx, keyword, json_pointer, message).

    span_idx is parsed from the RFC 6901 pointer (null when the violation is
    not span-scoped) — the BASELINE.json violation-row shape.
    """
    v = validated.where(~F.col("valid")).select(
        *id_cols, F.explode("violations").alias("v"))
    return v.select(
        *id_cols,
        F.nullif(
            F.regexp_extract(F.col("v.json_pointer"),
                             f"^/{span_field}/(\\d+)", 1), F.lit("")
        ).cast("int").alias("span_idx"),
        F.col("v.keyword").alias("keyword"),
        F.col("v.json_pointer").alias("json_pointer"),
        F.col("v.message").alias("message"),
    )


def json_validator_udf(schema_json: Any, registry: Optional[dict[str, Any]] = None,
                       uri: str = "", fuel: int = DEFAULT_FUEL,
                       collect_all: bool = True,
                       message_style: str = "structured",
                       assert_formats: bool = False):
    """Vectorized pandas UDF: json-string column -> struct(valid, violations).

    The CompiledValidator is built lazily ONCE per executor process (the
    reference recompiles nothing per value either — compile-once semantics,
    Harness/Harness.lean:15-16) and regexes are cached in its closure.
    """
    state: dict[str, CompiledValidator] = {}

    def _get() -> CompiledValidator:
        if "v" not in state:
            state["v"] = CompiledValidator(schema_json, uri=uri,
                                           registry=registry, fuel=fuel,
                                           message_style=message_style,
                                           assert_formats=assert_formats)
        return state["v"]

    @pandas_udf(RESULT_SCHEMA)
    def _validate(batch: pd.Series) -> pd.DataFrame:
        v = _get()
        valids: list[Optional[bool]] = []
        viols: list[Optional[list]] = []
        for raw in batch:
            if raw is None:
                valids.append(None)
                viols.append(None)
                continue
            try:
                value = json.loads(raw)
            except (ValueError, TypeError):
                valids.append(False)
                viols.append([("$parse", "", "invalid JSON")])
                continue
            vs = v.validate(value, collect_all=collect_all)
            valids.append(not vs)
            viols.append([(x.keyword, x.json_pointer, x.message) for x in vs])
        return pd.DataFrame({"valid": valids, "violations": viols})

    return _validate


def json_verdict_udf(schema_json: Any, registry: Optional[dict[str, Any]] = None,
                     uri: str = "", fuel: int = DEFAULT_FUEL,
                     assert_formats: bool = False):
    """Verdict-only pandas UDF: json string -> boolean. Short-circuits on the
    first failing keyword (reference Except-monad behavior) and skips
    violation-struct construction — ~2x the throughput of the full UDF."""
    state: dict[str, CompiledValidator] = {}

    def _get() -> CompiledValidator:
        if "v" not in state:
            state["v"] = CompiledValidator(schema_json, uri=uri,
                                           registry=registry, fuel=fuel,
                                           assert_formats=assert_formats)
        return state["v"]

    @pandas_udf("boolean")
    def _verdict(batch: pd.Series) -> pd.Series:
        v = _get()
        loads = json.loads
        out: list[Optional[bool]] = []
        for raw in batch:
            if raw is None:
                out.append(None)
                continue
            try:
                out.append(v.is_valid(loads(raw)))
            except (ValueError, TypeError):
                out.append(False)
        return pd.Series(out, dtype="boolean")

    return _verdict


def validate_json_column(df: DataFrame, json_col: str, schema_json: Any,
                         registry: Optional[dict[str, Any]] = None,
                         uri: str = "", fuel: int = DEFAULT_FUEL,
                         verdict_only: bool = False,
                         prefer_variant: bool = True,
                         message_style: str = "structured",
                         deep_ref_behavior: str = "error",
                         assert_formats: bool = False) -> DataFrame:
    """Validation of a JSON string column. Adds valid (+ violations unless
    verdict_only).

    Route order (VERDICT r1 #3): the VARIANT path first — ``try_parse_json``
    + JVM variant expressions, no Python per value (variant.py; since r3 it
    covers uniqueItems, deep const/enum, and bounded recursive $refs too) —
    then the Arrow-batch interpreter for the rare remainder (evil ref
    cycles, non-transpilable regexes, node-budget exhaustion).
    ``deep_ref_behavior`` controls past-MAX_VARIANT_DEPTH instances on the
    variant path: "error" (loud, default) or "invalid" (verdict False +
    $recursion violation; see variant._too_deep_leaf). It has no effect
    when the Arrow interpreter runs (CompileFallback or
    prefer_variant=False): that path validates deep instances EXACTLY
    under the reference's fuel semantics, so its verdicts are the more
    faithful ones, not a dropped option."""
    # single-row-group parquet inputs scan as ONE task (guide §2.5 input
    # skew) and serialize the whole per-row validation on one core; the
    # adaptive repartition is a no-op whenever the input is already at
    # least default-parallel (always true at production scale). r6:
    # measured 4.4 s -> ~1.2 s on the 1M-row sf1 events table.
    from ..parallelism import scale_partitions
    df = scale_partitions(df)
    if prefer_variant:
        from ..variant import validate_json_column_variant
        try:
            return validate_json_column_variant(
                df, json_col, schema_json, registry=registry, uri=uri,
                verdict_only=verdict_only, message_style=message_style,
                deep_ref_behavior=deep_ref_behavior,
                assert_formats=assert_formats)
        except CompileFallback:
            pass
    if verdict_only:
        udf = json_verdict_udf(schema_json, registry=registry, uri=uri,
                               fuel=fuel, assert_formats=assert_formats)
        return df.withColumn("valid", udf(F.col(json_col)))
    udf = json_validator_udf(schema_json, registry=registry, uri=uri, fuel=fuel,
                             message_style=message_style,
                             assert_formats=assert_formats)
    res = udf(F.col(json_col))
    return df.withColumns({
        "valid": res.getField("valid"),
        "violations": res.getField("violations"),
    })


def warm_validation_codegen(df: DataFrame, schema_json: Any,
                            rows: Optional[int] = None, passes: int = 3,
                            **kwargs) -> float:
    """Force-JIT the validation plan on a SMALL same-schema dataset before
    a big one-shot run; returns seconds spent.

    Why this exists (measured, local[32], 6M docs, fresh JVM): the fused
    validator's generated classes start in the JVM interpreter and the
    first full-scale run burned 2,200-4,000 CPU-seconds (walls of
    114-190 s) before the JIT tiers finished installing — 15-40x the
    steady-state 84-200 CPU-s. Three passes over a ~1% dataset (7 s wall,
    ~55 CPU-s) complete the same compilations on trivial data, after which
    the first full pass measured 4.5-7.7 s. A one-shot spark-submit batch
    job should do exactly this; on a real cluster every EXECUTOR JVM pays
    the same interpreter tax, and a sample-sized warm-up pass amortizes it
    identically. (Pair with -XX:ReservedCodeCacheSize=512m — see bench.py —
    or the compiled tiers silently fall back out again.)

    Pass ``df`` as a SMALL dataset READ THE SAME WAY as the real input
    (e.g. a 60k-doc parquet dir when the job reads parquet): the warmed
    stage then generates the IDENTICAL source as the full run and the JIT
    work transfers. ``rows`` (optional) trims via ``limit`` — convenient,
    but a fused LocalLimit changes the generated class, so the measured
    transfer was unreliable (first full pass still hit 55-152 s in 3 of 5
    trials); prefer a separate small input over a limit of the big one.

    kwargs are forwarded to :func:`validate_spans_best` so the warmed plan
    matches the real one (same spans_col/registry/assert_formats =>
    same generated code)."""
    import time as _time
    t0 = _time.perf_counter()
    head = df.limit(rows) if rows is not None else df
    for _ in range(passes):
        (validate_spans_best(head, schema_json, **kwargs)
         .select(F.count(F.lit(1))).collect())
    return round(_time.perf_counter() - t0, 3)


def validate_spans_best(df: DataFrame, schema_json: Any,
                        spans_col: str = "spans",
                        registry: Optional[dict[str, Any]] = None,
                        uri: str = "",
                        keep_cols: Optional[list[str]] = None,
                        message_style: str = "structured",
                        assert_formats: bool = False) -> DataFrame:
    """Best-available strategy chain for spans-shaped document tables:
    fused-array (codegen, zero shuffle) -> explode+agg (codegen, verdict
    shuffle) -> forall projection (interpreted HOF, zero shuffle). All three
    are verdict- and violation-equivalent (pytest-pinned).

    keep_cols=None means ALL input columns on every branch (normalized
    here; the explode strategy's own light-columns default applies only
    when it is called directly — r3 review: the chain's output schema must
    not depend on which strategy happened to compile). Pre-existing
    'valid'/'violations' columns are REPLACED, never duplicated, matching
    the other validators' contract."""
    if keep_cols is None:
        keep_cols = [c for c in df.columns if c not in ("valid", "violations")]
    from ..plans.fused import FusedUnsupported, validate_documents_fused
    try:
        return validate_documents_fused(df, schema_json, spans_col=spans_col,
                                        registry=registry, uri=uri,
                                        keep_cols=keep_cols,
                                        message_style=message_style,
                                        assert_formats=assert_formats)
    except FusedUnsupported:
        pass
    try:
        return validate_documents_exploded(df, schema_json, spans_col=spans_col,
                                           registry=registry, uri=uri,
                                           keep_cols=keep_cols,
                                           message_style=message_style,
                                           assert_formats=assert_formats)
    except CompileFallback:
        try:
            out = validate_dataframe(df, schema_json, registry=registry,
                                     uri=uri, message_style=message_style,
                                     assert_formats=assert_formats)
        except CompileFallback:
            # TRUE last resort (VERDICT r4 #7): no columnar strategy can
            # express this schema (format:'regex' / IDNA assertions, evil
            # ref cycles, non-transpilable regexes) — serialize the row
            # struct with to_json and run the Arrow-batch interpreter, the
            # same stage validate_json_column falls back to. to_json omits
            # NULL fields, which matches the columnar strategies'
            # null-means-absent treatment of NULL parquet columns
            # (equivalence pytest-pinned), and a NULL array element still
            # serializes as JSON null. Slowest path by far, but it makes
            # the spans chain TOTAL: every schema the interpreter accepts
            # now validates over spans tables.
            udf = json_validator_udf(schema_json, registry=registry,
                                     uri=uri,
                                     message_style=message_style,
                                     assert_formats=assert_formats)
            res = udf(F.to_json(F.struct(*[F.col(c) for c in df.columns])))
            return df.select(
                *keep_cols,
                res.getField("valid").alias("valid"),
                res.getField("violations").alias("violations"))
        keep = keep_cols if keep_cols is not None else list(df.columns)
        return out.select(*keep, "valid", "violations")


def suite_validator_udf(fuel: int = DEFAULT_FUEL,
                        extra_registry: Optional[dict] = None):
    """(schema_json_str, instance_json_str) -> valid. Replays
    JSON-Schema-Test-Suite-shaped fixture tables through the Spark path in a
    single job; validators are cached per distinct schema per executor
    (parity: compile-once-per-case, Harness/Harness.lean:15-16).
    ``extra_registry`` pre-registers remote documents (suite ``remotes/``
    tree) on top of the draft-07 meta-schema; the plain-dict registry is
    captured in the UDF closure and ships to executors with the task."""
    cache: dict[str, CompiledValidator] = {}
    extra = dict(extra_registry) if extra_registry else None

    @pandas_udf("boolean")
    def _run(schemas: pd.Series, instances: pd.Series) -> pd.Series:
        out: list[Optional[bool]] = []
        for s_raw, i_raw in zip(schemas, instances):
            if s_raw is None or i_raw is None:
                out.append(None)
                continue
            v = cache.get(s_raw)
            if v is None:
                from ..metaschema import META_REGISTRY
                reg = dict(META_REGISTRY)
                if extra:
                    reg.update(extra)
                v = cache.setdefault(s_raw, CompiledValidator(
                    json.loads(s_raw), fuel=fuel, registry=reg))
            out.append(v.is_valid(json.loads(i_raw)))
        return pd.Series(out, dtype="boolean")

    return _run


def validate_auto(df: DataFrame, schema_json: Any, doc_col: Optional[str] = None,
                  registry: Optional[dict[str, Any]] = None, uri: str = "") -> DataFrame:
    """Columnar when lowerable, Arrow fallback otherwise (route recorded in
    the plan via a literal marker column)."""
    try:
        out = validate_dataframe(df, schema_json, doc_col=doc_col,
                                 registry=registry, uri=uri)
        return out.withColumn("_route", F.lit("columnar"))
    except CompileFallback:
        inst = F.to_json(F.struct(*[F.col(c) for c in df.columns])) \
            if doc_col is None else F.to_json(F.col(doc_col))
        tmp = df.withColumn("_json", inst)
        out = validate_json_column(tmp, "_json", schema_json,
                                   registry=registry, uri=uri)
        return out.drop("_json").withColumn("_route", F.lit("arrow"))
