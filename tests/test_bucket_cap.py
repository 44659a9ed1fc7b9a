"""Adversarial-scale guard for the banded-LSH scaffold (VERDICT r3 #2):
degenerate buckets (templated/boilerplate corpora collapsing thousands of
docs into one (band, key) bucket) must not emit quadratic candidate pairs.
``max_bucket_size`` keeps a deterministic per-bucket prefix and the drop is
surfaced through a pyspark Observation — no silent caps.
"""

import pytest
from pyspark.sql import Observation
from pyspark.sql import functions as F

from json_schema_lean_spark.operators.dedup import (
    cap_bucket_rows,
    minhash_candidate_pairs,
    simhash_near_pairs,
)
from json_schema_lean_spark.operators.similarity import lsh_near_dup_pairs

BOILER = "the same boilerplate template text repeated for every document"


def _templated(n, prefix="d"):
    return [(f"{prefix}{i:06d}", BOILER) for i in range(n)]


class TestMinhashBucketCap:
    def test_bounded_pairs_and_observed_drop(self, spark):
        n, cap, bands = 10_000, 16, 8
        docs = _templated(n)
        # two genuinely similar (non-templated) docs in their own small
        # bucket — the cap must not cost their recall
        tail = ("spark shuffles partition data across executors during "
                "wide transformations such as joins and aggregations")
        docs += [("x_near_1", tail + " quickly"), ("x_near_2", tail + " quick"),
                 ("y_other", "completely unrelated content about lean proofs")]
        df = spark.createDataFrame(docs, "doc_id string, text string")

        uncapped_small = minhash_candidate_pairs(
            df.where(F.col("doc_id").startswith("x_")), "text", "doc_id")
        small_pairs = {(r["id_a"], r["id_b"]) for r in uncapped_small.collect()}

        obs = Observation("minhash_cap")
        pairs = minhash_candidate_pairs(df, "text", "doc_id", bands=bands,
                                        max_bucket_size=cap, observation=obs)
        got = {(r["id_a"], r["id_b"]) for r in pairs.collect()}

        # bounded: the 10k-doc bucket contributes at most C(cap,2) distinct
        # pairs (identical prefix per band), plus the small-bucket pairs
        max_bucket_pairs = cap * (cap - 1) // 2
        assert len(got) <= max_bucket_pairs + len(small_pairs)
        # deterministic prefix: kept templated ids are the cap smallest
        templated_ids = {i for p in got for i in p if i.startswith("d")}
        assert templated_ids == {f"d{i:06d}" for i in range(cap)}
        # recall outside oversized buckets is untouched
        assert small_pairs <= got

        m = obs.get
        per_band_drop = n * (n - 1) // 2 - max_bucket_pairs
        assert m["dropped_candidate_pairs"] == bands * per_band_drop
        assert m["oversized_buckets"] == bands
        assert m["max_bucket_rows"] == n

    def test_cap_below_two_raises(self, spark):
        df = spark.createDataFrame(_templated(4), "doc_id string, text string")
        with pytest.raises(ValueError, match="max_bucket_size"):
            minhash_candidate_pairs(df, "text", "doc_id",
                                    max_bucket_size=1).collect()

    def test_uncapped_semantics_unchanged(self, spark):
        # default None keeps exact (oracle-checked) semantics
        docs = _templated(40) + [("z1", "one off doc"), ("z2", "another doc")]
        df = spark.createDataFrame(docs, "doc_id string, text string")
        base = {(r["id_a"], r["id_b"])
                for r in minhash_candidate_pairs(df, "text", "doc_id").collect()}
        assert len(base) == 40 * 39 // 2  # full quadratic set, by design


class TestSimhashBucketCap:
    def test_bounded_with_observation(self, spark):
        n, cap, bands = 3_000, 8, 4
        df = spark.createDataFrame(_templated(n), "doc_id string, text string")
        obs = Observation("simhash_cap")
        pairs = simhash_near_pairs(df, "text", "doc_id", max_hamming=3,
                                   bands=bands, max_bucket_size=cap,
                                   observation=obs)
        got = pairs.collect()
        assert 0 < len(got) <= cap * (cap - 1) // 2
        assert all(r["hamming"] == 0 for r in got)
        m = obs.get
        assert m["oversized_buckets"] == bands
        assert m["dropped_candidate_pairs"] \
            == bands * (n * (n - 1) // 2 - cap * (cap - 1) // 2)


class TestEmbeddingBucketCap:
    def test_identical_vectors_bounded(self, spark):
        n, cap = 2_000, 8
        vec = [0.25, -0.5, 0.125, 0.75]
        df = spark.createDataFrame([(i, vec) for i in range(n)],
                                   "vec_id int, embedding array<float>")
        obs = Observation("emb_cap")
        pairs = lsh_near_dup_pairs(df, dim=4, threshold=0.5,
                                   max_bucket_size=cap, observation=obs)
        got = pairs.collect()
        assert 0 < len(got) <= cap * (cap - 1) // 2
        m = obs.get
        assert m["dropped_candidate_pairs"] > 0
        assert m["max_bucket_rows"] == n


class TestCapBucketRowsUnit:
    def test_deterministic_prefix(self, spark):
        df = spark.createDataFrame(
            [(f"id{i:02d}", 0, 7) for i in range(10)]
            + [("solo", 1, 9)],
            "_id string, band int, key int")
        out = cap_bucket_rows(df, ["band", "key"], "_id", 3)
        kept = sorted(r["_id"] for r in out.collect())
        assert kept == ["id00", "id01", "id02", "solo"]


class TestSampledCapMode:
    """method='sampled': skew-free truncation — no per-bucket window sort,
    survivors chosen by xxhash64(id) % ceil(n/cap) (deterministic)."""

    def test_bounded_and_deterministic(self, spark):
        n, cap, bands = 10_000, 16, 8
        df = spark.createDataFrame(_templated(n), "doc_id string, text string")
        obs = Observation("sampled_cap")
        pairs = minhash_candidate_pairs(df, "text", "doc_id", bands=bands,
                                        max_bucket_size=cap, observation=obs,
                                        cap_method="sampled")
        got1 = {(r["id_a"], r["id_b"]) for r in pairs.collect()}
        # survivors per band ~ cap in expectation; pairs ~ C(survivors, 2).
        # allow generous slack (hash sampling variance) but pin the ORDER:
        # nowhere near the 50M uncapped pairs
        assert 0 < len(got1) <= (4 * cap) * (4 * cap - 1) // 2
        m = obs.get
        assert m["oversized_buckets"] == bands
        assert m["max_bucket_rows"] == n
        assert m["dropped_candidate_pairs"] > 1_000_000  # ~C(10k,2) per band
        # deterministic: same inputs, same survivors
        got2 = {(r["id_a"], r["id_b"])
                for r in minhash_candidate_pairs(
                    df, "text", "doc_id", bands=bands, max_bucket_size=cap,
                    cap_method="sampled").collect()}
        assert got1 == got2

    def test_small_buckets_untouched(self, spark):
        docs = [("a1", "first unique doc about spark"),
                ("a2", "second unique doc about lean"),
                ("a3", "third unique doc about parquet")]
        df = spark.createDataFrame(docs, "doc_id string, text string")
        base = {(r["id_a"], r["id_b"])
                for r in minhash_candidate_pairs(df, "text", "doc_id").collect()}
        capped = {(r["id_a"], r["id_b"])
                  for r in minhash_candidate_pairs(
                      df, "text", "doc_id", max_bucket_size=50,
                      cap_method="sampled").collect()}
        assert base == capped  # no bucket exceeds the cap -> identical

    def test_unknown_method_rejected(self, spark):
        df = spark.createDataFrame(_templated(4), "doc_id string, text string")
        with pytest.raises(ValueError, match="cap method"):
            minhash_candidate_pairs(df, "text", "doc_id", max_bucket_size=2,
                                    cap_method="typo").collect()


class TestSampledPortable:
    def test_portable_survivors_match_md5_replica(self, spark):
        """cap_method='sampled' with portable=True must keep exactly the
        rows whose md5-based portable hash of the stringified id is
        0 mod ceil(n/cap) — replicated here in plain Python (hashlib) so
        the DuckDB oracle (minhash_pairs_capped_sampled) is not the only
        cross-engine pin."""
        import hashlib

        from json_schema_lean_spark.operators.dedup import cap_bucket_rows

        rows = [(f"d{i:03d}", "b", 0) for i in range(30)] \
            + [(f"u{i}", f"k{i}", 0) for i in range(5)]
        df = spark.createDataFrame(rows, "_id string, key string, band int")
        out = cap_bucket_rows(df, ["band", "key"], "_id",
                              max_bucket_size=4, method="sampled",
                              portable=True)
        got = {r["_id"] for r in out.collect()}

        def phash(s: str) -> int:
            return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)

        mod = -(-30 // 4)  # ceil(n/cap) for the one oversized bucket
        expected = {f"d{i:03d}" for i in range(30)
                    if phash(f"d{i:03d}") % mod == 0} \
            | {f"u{i}" for i in range(5)}
        assert got == expected
        assert 0 < len(got & {f"d{i:03d}" for i in range(30)}) < 30

    def test_nonstring_format_is_ignored_everywhere(self, spark):
        """ADVICE r4: {'format': 12} must compile and validate like the
        reference (which has no format field at all) on every path, even
        with assertion enabled."""
        from json_schema_lean_spark.interpreter import CompiledValidator
        from json_schema_lean_spark.operators.validation import (
            validate_json_column,
        )
        schema = {"type": "string", "format": 12}
        assert CompiledValidator(schema, assert_formats=True).is_valid("x")
        df = spark.createDataFrame([("a", '"zz"')], "id string, j string")
        rows = validate_json_column(df, "j", schema,
                                    assert_formats=True).collect()
        assert rows[0]["valid"] is True
