"""Regression tests for the round-3 ADVICE findings:

1. variant invalid-mode uniqueItems on a too-deep array must emit a
   '$recursion' violation (filterable for Arrow re-validation), not a
   factually wrong 'uniqueItems' failure.
2. two_sample_drift's in-plan dof must clamp to >=1 like its pinned
   reference helper pooled_chi_square_from_histograms.
3. harness_stdin.run_case: a runtime error on test N must not discard the
   case's results or the seq — only compile failures map to the bare
   error-string response.
4. validate_spans_best with keep_cols=None must REPLACE pre-existing
   'valid'/'violations' columns, not duplicate them.
"""

import json
from unittest import mock

import pytest
from pyspark.sql import functions as F

from json_schema_lean_spark.operators.drift import (
    pooled_chi_square_from_histograms,
    two_sample_drift,
)
from json_schema_lean_spark.operators.validation import validate_spans_best
from json_schema_lean_spark.variant import (
    MAX_CANON_DEPTH,
    validate_json_column_variant,
)

DDL = ("doc_id string, spans array<struct<kind:string,text:string,"
       "media_ref:string,offset:int>>")


class TestDeepUniqueItemsInvalidMode:
    """ADVICE medium (variant.py:935): deep-nested array elements under
    uniqueItems in deep_ref_behavior='invalid' mode."""

    SCHEMA = {"type": "array", "uniqueItems": True}

    @staticmethod
    def _deep_elem(depth):
        e = 1
        for _ in range(depth):
            e = [e]
        return e

    def test_deep_array_gets_recursion_violation(self, spark):
        rows = [
            ("deep", json.dumps([self._deep_elem(MAX_CANON_DEPTH + 2), 1])),
            ("dup", json.dumps([1, 1])),
            ("ok", json.dumps([1, 2])),
        ]
        df = spark.createDataFrame(rows, "i string, j string")
        out = {r["i"]: r for r in validate_json_column_variant(
            df, "j", self.SCHEMA, deep_ref_behavior="invalid").collect()}

        # too-deep: invalid, flagged '$recursion' so the documented
        # filter-and-revalidate contract sees it
        assert out["deep"]["valid"] is False
        assert [v["keyword"] for v in out["deep"]["violations"]] \
            == ["$recursion"]
        # genuine duplicates keep the real uniqueItems failure
        assert out["dup"]["valid"] is False
        assert [v["keyword"] for v in out["dup"]["violations"]] \
            == ["uniqueItems"]
        assert out["ok"]["valid"] is True

    def test_default_mode_still_raises_loudly(self, spark):
        df = spark.createDataFrame(
            [(json.dumps([self._deep_elem(MAX_CANON_DEPTH + 2)]),)],
            "j string")
        with pytest.raises(Exception, match="prefer_variant=False"):
            validate_json_column_variant(df, "j", self.SCHEMA).collect()

    def test_reference_messages_unaffected_for_genuine_dups(self, spark):
        df = spark.createDataFrame([(json.dumps([1, 1]),)], "j string")
        out = validate_json_column_variant(
            df, "j", self.SCHEMA, deep_ref_behavior="invalid",
            message_style="reference").collect()[0]
        assert out["valid"] is False
        assert out["violations"][0]["keyword"] == "uniqueItems"
        assert "duplicate items" in out["violations"][0]["message"]


class TestDriftDofClamp:
    """ADVICE low (drift.py:306): dof clamps to max(count-1, 1) to match
    pooled_chi_square_from_histograms on single-populated-bin draws."""

    def test_single_populated_bin(self, spark):
        # every value lands in bucket 0; both samples populated
        df = spark.createDataFrame(
            [(0.1, True)] * 5 + [(0.2, False)] * 7, "v double, s boolean")
        row = two_sample_drift(df, "v", "s", lo=0.0, hi=8.0,
                               nbins=8).collect()[0]
        hist_a = [5, 0, 0, 0, 0, 0, 0, 0]
        hist_b = [7, 0, 0, 0, 0, 0, 0, 0]
        _, ref_dof = pooled_chi_square_from_histograms(hist_a, hist_b)
        assert ref_dof == 1
        assert row["dof"] == ref_dof
        assert row["chi2_stat"] == pytest.approx(0.0)

    def test_multi_bin_dof_unchanged(self, spark):
        df = spark.createDataFrame(
            [(0.5, True), (1.5, True), (2.5, False), (3.5, False)],
            "v double, s boolean")
        row = two_sample_drift(df, "v", "s", lo=0.0, hi=4.0,
                               nbins=4).collect()[0]
        assert row["dof"] == 3  # 4 populated bins - 1


class TestHarnessRuntimeErrorKeepsSeq:
    """ADVICE low (harness_stdin.py:62): runtime errors on one test must
    leave seq + sibling results intact; only compile failures return the
    bare error string."""

    def test_runtime_error_is_per_test(self):
        from scripts import harness_stdin

        real = harness_stdin.CompiledValidator

        class Exploding:
            def __init__(self, *a, **kw):
                self._v = real(*a, **kw)

            def is_valid(self, instance):
                if instance == "boom":
                    raise RuntimeError("synthetic runtime failure")
                return self._v.is_valid(instance)

        req = {"cmd": "run", "seq": 7,
               "case": {"schema": {"type": "string"},
                        "tests": [{"instance": "ok"},
                                  {"instance": "boom"},
                                  {"instance": 3}]}}
        with mock.patch.object(harness_stdin, "CompiledValidator", Exploding):
            resp = json.loads(harness_stdin.run_case(req))
        assert resp["seq"] == 7
        assert resp["results"][0] == {"valid": True}
        assert resp["results"][1]["valid"] is False
        assert "synthetic runtime failure" in resp["results"][1]["error"]
        assert resp["results"][2] == {"valid": False}

    def test_compile_failure_still_bare_error_string(self):
        from scripts import harness_stdin
        req = {"cmd": "run", "seq": 1,
               "case": {"schema": {"maxLength": "x"},  # lenient-parse error
                        "tests": [{"instance": "x"}]}}
        resp = harness_stdin.run_case(req)
        with pytest.raises(ValueError):
            json.loads(resp)  # bare error string, not JSON


class TestSpansBestReplacesVerdictColumns:
    """ADVICE low (validation.py:502): pre-existing 'valid'/'violations'
    input columns are replaced, not duplicated."""

    SCHEMA = {"type": "object",
              "properties": {"doc_id": {"type": "string"}}}

    def test_no_duplicate_columns(self, spark):
        df = (spark.createDataFrame(
            [("d1", [("text", "a", None, 0)])], DDL)
            .withColumn("valid", F.lit(False))
            .withColumn("violations", F.array(F.lit("stale"))))
        out = validate_spans_best(df, self.SCHEMA)
        assert out.columns.count("valid") == 1
        assert out.columns.count("violations") == 1
        row = out.collect()[0]
        assert row["valid"] is True           # replaced, not the stale lit
        assert row["violations"] == []
