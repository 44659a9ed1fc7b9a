"""Deterministic sampling + token-budget packing (operators/packing.py).

Pinned properties: hash-selection is partition- and run-insensitive
(the whole point vs ``df.sample``), strata get their own fractions,
packing is a pure function of (id, tokens) with first-fit-with-overflow
batch semantics, and the plans stay shuffle-minimal (sampling: zero
Exchange; packing: exactly one, on the bucket key)."""

import pandas as pd
import pytest
from pyspark.sql import functions as F

from json_schema_lean_spark.operators.packing import (
    batch_summary,
    deterministic_sample,
    pack_documents,
    stratified_sample,
)


@pytest.fixture(scope="module")
def docs(spark):
    rows = [(i, ["en", "de", "zh"][i % 3], (i * 37) % 90 + 1)
            for i in range(600)]
    return spark.createDataFrame(rows, "doc_id: long, lang: string, n_tokens: long")


def test_deterministic_sample_is_partition_insensitive(docs):
    a = sorted(r.doc_id for r in
               deterministic_sample(docs, "doc_id", 0.3).collect())
    b = sorted(r.doc_id for r in
               deterministic_sample(docs.repartition(13), "doc_id", 0.3).collect())
    assert a == b and 0.15 < len(a) / 600 < 0.45


def test_deterministic_sample_salt_changes_selection(docs):
    a = {r.doc_id for r in deterministic_sample(docs, "doc_id", 0.3).collect()}
    b = {r.doc_id for r in
         deterministic_sample(docs, "doc_id", 0.3, salt="#other").collect()}
    assert a != b


def test_stratified_fractions_apply_per_stratum(docs):
    out = stratified_sample(docs, "doc_id", "lang",
                            {"en": 1.0, "de": 0.0}, default=0.5)
    got = {r.lang: r.n for r in
           out.groupBy("lang").agg(F.count(F.lit(1)).alias("n")).collect()}
    assert got["en"] == 200          # fraction 1.0 keeps every row
    assert "de" not in got           # fraction 0.0 keeps none
    assert 50 < got.get("zh", 0) < 150   # default 0.5 of 200


def test_stratified_sample_plan_has_no_shuffle(docs):
    plan = stratified_sample(docs, "doc_id", "lang", {"en": 0.5}) \
        ._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


def test_pack_matches_independent_greedy_replay(docs):
    budget, n_buckets = 256, 8
    packed = pack_documents(docs, "doc_id", "n_tokens", budget,
                            n_buckets=n_buckets).toPandas()
    # replay per bucket in id order with plain python
    for bucket, grp in packed.groupby("bucket"):
        grp = grp.sort_values("doc_id")
        cum = 0
        for _, row in grp.iterrows():
            assert row["batch_id"] == cum // budget, row
            cum += row["n_tokens"]


def test_pack_batches_respect_budget_plus_overflow(docs):
    budget = 256
    packed = pack_documents(docs, "doc_id", "n_tokens", budget, n_buckets=8)
    summ = batch_summary(packed, "n_tokens").toPandas()
    last = packed.groupBy("bucket", "batch_id").agg(
        F.max("n_tokens").alias("max_tokens")).toPandas()
    m = summ.merge(last, on=["bucket", "batch_id"])
    # first-fit-with-overflow: every doc except the last fits, so a
    # batch exceeds the budget by less than one document
    assert (m["batch_tokens"] - m["max_tokens"] < budget).all()


def test_pack_is_partition_insensitive(docs):
    a = pack_documents(docs, "doc_id", "n_tokens", 256).toPandas() \
        .sort_values("doc_id").reset_index(drop=True)
    b = pack_documents(docs.repartition(17), "doc_id", "n_tokens", 256) \
        .toPandas().sort_values("doc_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b)


def test_pack_plan_has_single_bucket_exchange(docs):
    plan = pack_documents(docs, "doc_id", "n_tokens", 256)._jdf \
        .queryExecution().executedPlan().toString()
    assert plan.count("Exchange") == 1 and "bucket" in plan
