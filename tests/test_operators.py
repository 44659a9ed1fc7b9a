"""Extension-operator tests: drift, dedup, similarity, text, stats, multimodal."""

import pytest
from pyspark.sql import functions as F

from json_schema_lean_spark.operators import drift as drift_ops
from json_schema_lean_spark.operators.dedup import (
    exact_dup_groups,
    minhash_candidate_pairs,
    ngram_jaccard,
    simhash_dup_groups,
)
from json_schema_lean_spark.operators.multimodal import (
    audio_features,
    extract_media_meta,
    image_features,
    sample_frames,
    synth_media_blobs,
)
from json_schema_lean_spark.operators.similarity import brute_force_topk, lsh_topk
from json_schema_lean_spark.operators.stats import (
    approx_distinct,
    duplicate_keys,
    numeric_column_stats,
    uniqueness_summary,
)
from json_schema_lean_spark.operators.text import lang_guess

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet(f"{SF}/documents.parquet")


# ---------------- drift ------------------------------------------------------

def test_drift_self_comparison_no_drift(spark, docs):
    base = drift_ops.baseline_stats(docs, ["n_chars"], run_id="r0")
    report = drift_ops.drift_report(docs, base)
    assert len(report) == 1
    r = report[0]
    assert r["ks_stat"] == 0.0
    assert not r["ks_drifted"] and not r["chi2_drifted"]


def test_drift_detects_shift(spark, docs):
    base = drift_ops.baseline_stats(docs, ["n_chars"], run_id="r0")
    shifted = docs.withColumn("n_chars", F.col("n_chars") * 2 + 300)
    report = drift_ops.drift_report(shifted, base)
    r = report[0]
    assert r["ks_drifted"] and r["chi2_drifted"]
    assert r["ks_stat"] > 0.3


def test_baseline_roundtrip_and_drift(spark, docs, tmp_path):
    base = drift_ops.baseline_stats(docs, ["n_chars", "doc_id"], run_id="r0")
    path = str(tmp_path / "baseline")
    drift_ops.save_baseline(spark, base, path)
    loaded = drift_ops.load_baseline(spark, path, run_id="r0")
    assert {r["column"] for r in loaded} == {"n_chars", "doc_id"}
    report = drift_ops.drift_report(docs, loaded)
    assert all(not r["ks_drifted"] for r in report)


def test_two_sample_drift_matches_python_helpers(spark):
    """The one-row DataFrame plan agrees with the driver-side helpers
    (ks_from_histograms / chi_square_from_histograms) on dense histograms
    where the >=5 merge rule never fires — and the plan never collects
    input rows (bounded-histogram window only)."""
    import random
    rng = random.Random(7)
    rows = ([(rng.uniform(0, 90), True) for _ in range(800)]
            + [(rng.uniform(10, 100), False) for _ in range(600)]
            + [(None, True), (50.0, None)])  # NULL value / NULL split drop
    df = spark.createDataFrame(rows, "value double, is_a boolean")
    out = drift_ops.two_sample_drift(df, "value", "is_a", 0.0, 100.0,
                                     nbins=5).collect()[0]

    # reference histograms computed the slow way
    def hist(vals):
        h = [0] * 5
        for v in vals:
            h[min(max(int((v - 0.0) // 20.0), 0), 4)] += 1
        return h
    a = hist([v for v, s in rows if v is not None and s is True])
    b = hist([v for v, s in rows if v is not None and s is False])
    assert out["n_a"] == sum(a) == 800
    assert out["n_b"] == sum(b) == 600
    assert out["ks_stat"] == round(drift_ops.ks_from_histograms(a, b), 6)
    chi, dof = drift_ops.pooled_chi_square_from_histograms(a, b)
    assert abs(out["chi2_stat"] - chi) < 1e-5
    assert out["dof"] == dof
    assert out["ks_stat"] > 0.05  # the shifted windows genuinely differ


def test_two_sample_drift_bin_only_in_one_sample_counts(spark):
    """Regression (r3 review): a bucket populated ONLY in sample A used to
    divide by a zero expected count, go SQL NULL, and vanish from the sum —
    reporting near-zero drift for a categorically drifted distribution. The
    pooled form must both count it and match the reference helper."""
    rows = ([(5.0, True)] * 500 + [(55.0, True)] * 500
            + [(55.0, False)] * 600)  # bucket 0: A only
    df = spark.createDataFrame(rows, "value double, is_a boolean")
    out = drift_ops.two_sample_drift(df, "value", "is_a", 0.0, 100.0,
                                     nbins=2).collect()[0]
    chi, dof = drift_ops.pooled_chi_square_from_histograms([500, 500],
                                                           [0, 600])
    assert out["chi2_stat"] is not None and out["chi2_stat"] > 100
    assert abs(out["chi2_stat"] - chi) < 1e-5
    assert out["dof"] == dof == 1

    # empty sample B: statistics are undefined -> NULL, not fake zero
    df_a_only = spark.createDataFrame([(5.0, True)] * 10,
                                      "value double, is_a boolean")
    out = drift_ops.two_sample_drift(df_a_only, "value", "is_a",
                                     0.0, 100.0, nbins=2).collect()[0]
    assert out["chi2_stat"] is None and out["ks_stat"] is None


def test_two_sample_drift_identical_split_is_zero(spark):
    # floor(id/2) pairs each value with one even and one odd id, so the
    # two samples are exactly identical distributions
    df = spark.range(0, 2000).select(
        (F.floor(F.col("id") / 2) % 97).cast("double").alias("value"),
        (F.col("id") % 2 == 0).alias("is_a"))
    out = drift_ops.two_sample_drift(df, "value", "is_a", 0.0, 97.0,
                                     nbins=4).collect()[0]
    assert out["ks_stat"] == 0.0 and out["chi2_stat"] == 0.0
    assert out["n_a"] == out["n_b"] == 1000


def test_chi_square_pvalue_sane():
    # chi2 CDF checkpoints (vs published tables)
    assert abs(drift_ops.chi_square_pvalue(3.841, 1) - 0.05) < 0.002
    assert abs(drift_ops.chi_square_pvalue(18.307, 10) - 0.05) < 0.002
    assert drift_ops.chi_square_pvalue(0.0, 5) == pytest.approx(1.0)


# ---------------- dedup ------------------------------------------------------

@pytest.fixture(scope="module")
def dup_corpus(spark):
    rows = []
    base = ("spark engine validates documents with schemas and emits "
            "violation rows for every failed keyword in the corpus")
    for i in range(40):
        rows.append((i, f"unique document number {i} " + base[: 40 + i]))
    rows.append((100, base))
    rows.append((101, base))                          # exact dup of 100
    rows.append((102, base.replace("corpus", "dataset")))  # near dup
    rows.append((103, "totally different text about nothing relevant here"))
    return spark.createDataFrame(rows, "doc_id: long, text: string")


def test_exact_dup_groups(dup_corpus):
    groups = {r["keep_id"]: r["n_rows"]
              for r in exact_dup_groups(dup_corpus, "text", "doc_id").collect()}
    assert groups[100] == 2  # 100 & 101 collapse
    assert groups[102] == 1


def test_minhash_lsh_finds_near_dups(dup_corpus):
    pairs = minhash_candidate_pairs(dup_corpus, "text", "doc_id",
                                    k=32, bands=16, ngram=3)
    got = {(r["id_a"], r["id_b"]) for r in pairs.collect()}
    assert (100, 101) in got
    assert (100, 102) in got or (101, 102) in got
    # verification stage: exact jaccard ranks the exact dup at 1.0
    j = {(r["id_a"], r["id_b"]): r["jaccard"]
         for r in ngram_jaccard(pairs, dup_corpus, "text", "doc_id").collect()}
    assert j[(100, 101)] == 1.0


def test_simhash_groups_exact_dups(dup_corpus):
    groups = {r["keep_id"]: r["n_rows"]
              for r in simhash_dup_groups(dup_corpus, "text", "doc_id").collect()}
    assert groups.get(100) == 2


# ---------------- similarity -------------------------------------------------

def test_lsh_topk_overlaps_bruteforce(spark):
    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    q = emb.where(F.col("vec_id") < 3)
    brute = {(r["query_id"], r["neighbor_id"])
             for r in brute_force_topk(emb, q, k=5).collect()}
    approx = {(r["query_id"], r["neighbor_id"])
              for r in lsh_topk(emb, q, dim=64, k=5, n_planes=4).collect()}
    # 4 planes = 16 buckets over 500 vecs: recall need not be perfect but the
    # bucketing must produce valid, overlapping results
    assert approx
    assert len(approx & brute) >= 1
    assert all(qid in {0, 1, 2} for qid, _ in approx)


def test_lsh_near_dup_pairs_recall_and_plan(spark):
    """The oracled near-dup pipeline (VERDICT r1): banded hyperplane LSH.
    Recall vs brute force is pinned at the driver's operating point, and the
    plan must contain NO cross/nested-loop join — that was the round-1
    scale-killer."""
    import contextlib
    import io

    from json_schema_lean_spark.operators.similarity import (
        cosine,
        lsh_near_dup_pairs,
    )

    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    a = emb.select(F.col("vec_id").alias("id_a"),
                   F.col("embedding").cast("array<double>").alias("va"))
    b = emb.select(F.col("vec_id").alias("id_b"),
                   F.col("embedding").cast("array<double>").alias("vb"))
    brute = {(r["id_a"], r["id_b"])
             for r in (a.join(b, F.col("id_a") < F.col("id_b"))
                        .select("id_a", "id_b",
                                F.round(cosine(F.col("va"), F.col("vb")), 4)
                                 .alias("cos"))
                        .where(F.col("cos") > 0.45)).collect()}
    lsh = lsh_near_dup_pairs(emb, dim=64, threshold=0.45,
                             bands=12, planes_per_band=4)
    got = {(r["id_a"], r["id_b"]) for r in lsh.collect()}
    assert got <= brute  # candidates are verified: no false positives
    assert brute and len(got & brute) / len(brute) >= 0.85

    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        lsh.explain("formatted")
    plan = buf.getvalue()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_ivf_topk_recall(spark):
    from json_schema_lean_spark.operators.similarity import ivf_index, ivf_topk

    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    q = emb.where(F.col("vec_id") < 5)
    assigned, centroids = ivf_index(emb, n_centroids=8)
    assert len(centroids) == 8 and len(centroids[0]) == 64
    got = ivf_topk(assigned, centroids, q, k=5, nprobe=4)
    brute = {(r["query_id"], r["neighbor_id"])
             for r in brute_force_topk(emb, q, k=5).collect()}
    approx = {(r["query_id"], r["neighbor_id"]) for r in got.collect()}
    # nprobe=4 of 8 clusters: expect solid (not perfect) recall
    assert len(approx & brute) >= len(brute) // 2
    # determinism
    approx2 = {(r["query_id"], r["neighbor_id"])
               for r in ivf_topk(assigned, centroids, q, k=5, nprobe=4).collect()}
    assert approx == approx2


def test_ivf_topk_fixed_structure_and_plan(spark):
    """Fixed-centroid IVF: candidates respect the probe structure (every
    returned neighbor's cluster is one of the query's nprobe probes), the
    plan has no cross product, and repeated runs are bit-identical. Value
    equality vs DuckDB is the ann_topk_ivf driver oracle."""
    import io
    from contextlib import redirect_stdout

    from json_schema_lean_spark.operators.similarity import ivf_topk_fixed

    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    q = emb.where(F.col("vec_id") < 5)
    got = ivf_topk_fixed(emb, q, k=5, nprobe=4,
                         centroid_pred=F.col("vec_id") < 16)
    rows = got.collect()
    by_q = {}
    for r in rows:
        by_q.setdefault(r["query_id"], []).append(r["rank"])
    assert set(by_q) == {0, 1, 2, 3, 4}
    for ranks in by_q.values():
        assert sorted(ranks) == list(range(1, len(ranks) + 1))  # contiguous
    # determinism (quantized assignment -> no float ties to flip)
    assert sorted(map(tuple, rows)) == sorted(
        map(tuple, ivf_topk_fixed(emb, q, k=5, nprobe=4,
                                  centroid_pred=F.col("vec_id") < 16)
            .collect()))
    buf = io.StringIO()
    with redirect_stdout(buf):
        got.explain("formatted")
    plan = buf.getvalue()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


# ---------------- text -------------------------------------------------------

def test_lang_guess(spark):
    df = spark.createDataFrame(
        [("the cat and the dog of the house",),
         ("el perro de la casa que los gatos",),
         ("der hund und die katze das ist gut",),
         ("zzz qqq xxx",)], "text: string")
    got = [r[0] for r in df.select(lang_guess(F.col("text"))).collect()]
    assert got == ["en", "es", "de", "und"]


# ---------------- stats ------------------------------------------------------

def test_numeric_column_stats_shape(docs):
    rows = numeric_column_stats(docs, ["doc_id", "n_chars"]).collect()
    by_col = {r["column"]: r for r in rows}
    assert by_col["doc_id"]["n"] == 500 and by_col["doc_id"]["n_null"] == 0
    assert by_col["n_chars"]["min_value"] >= 0


def test_uniqueness_and_duplicates(spark):
    df = spark.createDataFrame([(1,), (1,), (2,)], "k: long")
    s = uniqueness_summary(df, "k").collect()[0]
    assert (s["total_rows"], s["distinct_keys"], s["rows_in_dup_keys"]) == (3, 2, 2)
    d = duplicate_keys(df, "k").collect()
    assert [(r["k"], r["n"]) for r in d] == [(1, 2)]
    d_salted = duplicate_keys(df, "k", salt_partitions=4).collect()
    assert [(r["k"], r["n"]) for r in d_salted] == [(1, 2)]


def test_approx_distinct_close(docs):
    rows = {r["column"]: r["approx_distinct"]
            for r in approx_distinct(docs, ["doc_id", "lang"]).collect()}
    assert abs(rows["doc_id"] - 500) <= 25
    assert rows["lang"] == 5


# ---------------- multimodal -------------------------------------------------

@pytest.fixture(scope="module")
def media(spark):
    refs = spark.createDataFrame(
        [(f"asset://blob/{i:06d}", ["image", "audio", "video"][i % 3])
         for i in range(30)],
        "media_ref: string, media_kind: string")
    return synth_media_blobs(refs)


def test_media_meta(media):
    rows = extract_media_meta(media).collect()
    assert len(rows) == 30
    for r in rows:
        assert r["n_bytes"] > 0 and len(r["content_sha256"]) == 64


def test_image_features_deterministic(media):
    a = sorted(map(tuple, image_features(media).collect()))
    b = sorted(map(tuple, image_features(media).collect()))
    assert a == b
    assert all(64 <= r[1] < 1984 for r in a)  # width range


def test_audio_and_frames_shapes(media):
    au = audio_features(media).collect()
    assert len(au) == 30 and all(r["sample_rate"] == 16000 for r in au)
    fr = sample_frames(media, max_frames=4).collect()
    assert len(fr) >= 30
    per_ref = {}
    for r in fr:
        per_ref.setdefault(r["media_ref"], []).append(r["frame_idx"])
    assert all(len(v) <= 4 for v in per_ref.values())


def test_real_decoder_on_non_media_blobs(media):
    """decoder='real' on synthetic non-media blobs: feature stages yield
    NULL features, the row-expanding frame sampler yields zero rows — the
    robust large-pipeline behavior (r3: video de-stubbed via Y4M; the old
    NotImplementedError is gone)."""
    rows = audio_features(media, decoder="real").collect()
    assert rows and all(r["sample_rate"] is None for r in rows)
    assert sample_frames(media, decoder="real").collect() == []


def test_real_y4m_frame_sampling_roundtrip(spark):
    from json_schema_lean_spark.operators.multimodal import (
        decode_y4m,
        synth_y4m,
    )
    import hashlib

    # driver-side decode sanity
    blob = synth_y4m(width=16, height=8, n_frames=7, seed="v1")
    w, h, frames = decode_y4m(blob)
    assert (w, h, len(frames)) == (16, 8, 7)
    assert all(len(f) == 16 * 8 * 3 // 2 for f in frames)  # 4:2:0
    assert decode_y4m(b"not a video") is None
    assert decode_y4m(blob[:60]) is None                   # truncated mid-frame
    # other colorspaces size correctly
    w4, h4, f4 = decode_y4m(synth_y4m(4, 4, 2, "z", colorspace="C444"))
    assert len(f4[0]) == 4 * 4 * 3

    rows = [("asset://vid/1", bytearray(blob), "video"),
            ("asset://vid/2", bytearray(synth_y4m(8, 8, 2, "v2")), "video"),
            ("asset://vid/bad", bytearray(b"RIFF junk"), "video")]
    df = spark.createDataFrame(
        rows, "media_ref string, media_bytes binary, media_kind string")
    got = sample_frames(df, every_n=3, max_frames=2, decoder="real").collect()
    by_ref = {}
    for r in got:
        by_ref.setdefault(r["media_ref"], {})[r["frame_idx"]] = r["frame_sha256"]
    # 7 frames, every 3rd, max 2 -> indices 0 and 3
    assert sorted(by_ref["asset://vid/1"]) == [0, 3]
    # 2 frames, every 3rd -> only index 0
    assert sorted(by_ref["asset://vid/2"]) == [0]
    assert "asset://vid/bad" not in by_ref  # undecodable -> zero rows
    # distributed hashes match driver-side frame bytes
    assert by_ref["asset://vid/1"][3] == hashlib.sha256(frames[3]).hexdigest()


def test_multi_column_histograms_single_pass_equivalence(spark):
    """r2: histograms() folds all watched columns into one agg; results must
    equal the per-column path bin-for-bin."""
    from json_schema_lean_spark.operators.drift import histogram, histograms

    li = spark.read.parquet(f"{SF}/lineitem.parquet").limit(2000)
    specs = [("l_quantity", 0.0, 50.0, 16), ("l_discount", 0.0, 0.1, 8),
             ("l_tax", 0.0, 0.08, 8)]
    combined = histograms(li, specs)
    for c, lo, hi, nbins in specs:
        assert combined[c] == histogram(li, c, lo, hi, nbins)
        assert len(combined[c]) == nbins


# ---------------- multimodal real decoders (r2) -------------------------------

def test_real_bmp_decode_roundtrip(spark):
    from json_schema_lean_spark.operators.multimodal import (
        decode_bmp,
        image_features,
        synth_bmp,
    )

    # driver-side decode sanity: gradient image has known shape + luma range
    blob = synth_bmp(16, 9, seed="s1")
    w, h, c, luma, sharp = decode_bmp(blob)
    assert (w, h, c) == (16, 9, 3)
    assert 0.2 < luma < 0.8 and sharp > 0

    rows = [("asset://img/1", bytearray(synth_bmp(8, 8, "a")), "image"),
            ("asset://img/2", bytearray(synth_bmp(32, 4, "b")), "image"),
            ("asset://img/bad", bytearray(b"not a bmp"), "image")]
    df = spark.createDataFrame(
        rows, "media_ref string, media_bytes binary, media_kind string")
    got = {r["media_ref"]: r
           for r in image_features(df, decoder="real").collect()}
    assert (got["asset://img/1"]["width"], got["asset://img/1"]["height"]) == (8, 8)
    assert (got["asset://img/2"]["width"], got["asset://img/2"]["height"]) == (32, 4)
    assert got["asset://img/bad"]["width"] is None  # undecodable -> NULLs
    # distributed decode agrees with driver-side decode
    drv = decode_bmp(synth_bmp(8, 8, "a"))
    assert abs(got["asset://img/1"]["mean_luma"] - drv[3]) < 1e-9


def test_real_wav_decode_roundtrip(spark):
    import math

    from json_schema_lean_spark.operators.multimodal import (
        audio_features,
        decode_wav,
        synth_wav,
    )

    blob = synth_wav(n_samples=800, rate=8000, seed="tone")
    rate, n, rms = decode_wav(blob)
    assert (rate, n) == (8000, 800)
    # a full-scale-0.61 sine has rms ~ 0.61/sqrt(2)
    assert abs(rms - (20000 / 32768.0) / math.sqrt(2)) < 0.02

    rows = [("asset://aud/1", bytearray(blob), "audio"),
            ("asset://aud/bad", bytearray(b"mp3 junk"), "audio")]
    df = spark.createDataFrame(
        rows, "media_ref string, media_bytes binary, media_kind string")
    got = {r["media_ref"]: r
           for r in audio_features(df, decoder="real").collect()}
    assert got["asset://aud/1"]["sample_rate"] == 8000
    assert got["asset://aud/1"]["n_samples"] == 800
    assert abs(got["asset://aud/1"]["rms"] - rms) < 1e-9
    assert got["asset://aud/bad"]["sample_rate"] is None


# ---------------- source/sink adapters (r2) -----------------------------------

def test_jsonl_roundtrip_preserves_span_verdicts(spark, tmp_path):
    """JSON Lines interchange: nested spans survive a write/read round trip
    with identical validation verdicts."""
    from json_schema_lean_spark.operators.validation import validate_spans_best
    from json_schema_lean_spark.sources.spansgen import (
        SPAN_SCHEMA,
        spans_documents,
    )
    from json_schema_lean_spark.sources.tables import read_table, write_table

    docs = spans_documents(spark, 300)
    path = str(tmp_path / "docs_jsonl")
    write_table(docs, path, format="json")
    back = read_table(spark, path, format="json", schema=docs.schema)
    assert back.count() == docs.count()
    a = {r["doc_id"]: r["valid"]
         for r in validate_spans_best(docs, SPAN_SCHEMA,
                                      keep_cols=["doc_id"]).collect()}
    b = {r["doc_id"]: r["valid"]
         for r in validate_spans_best(back, SPAN_SCHEMA,
                                      keep_cols=["doc_id"]).collect()}
    assert a == b


def test_csv_roundtrip_flat_table(spark, tmp_path):
    from json_schema_lean_spark.sources.tables import read_table, write_table

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    path = str(tmp_path / "docs_csv")
    write_table(docs, path, format="csv")
    back = read_table(spark, path, format="csv", schema=docs.schema)
    assert back.count() == docs.count()
    assert {r["doc_id"] for r in back.select("doc_id").collect()} == \
           {r["doc_id"] for r in docs.select("doc_id").collect()}


def test_iceberg_format_gated_with_actionable_error(spark):
    """format='iceberg' is a first-class FORMATS member; without the
    runtime jar (this sandbox) both adapters fail fast with a message
    naming the fix instead of a deep executor ClassNotFoundException."""
    import pytest

    from json_schema_lean_spark.sources.tables import (
        FORMATS,
        ICEBERG_READ_OPTIONS,
        read_table,
        write_table,
    )
    assert "iceberg" in FORMATS
    assert "snapshot-id" in ICEBERG_READ_OPTIONS
    with pytest.raises(RuntimeError, match="iceberg-spark-runtime"):
        read_table(spark, "catalog.db.tbl", format="iceberg")
    with pytest.raises(RuntimeError, match="iceberg-spark-runtime"):
        docs = spark.range(3)
        write_table(docs, "catalog.db.tbl", format="iceberg")


def test_lsh_topk_banded_recall_vs_brute(spark):
    from json_schema_lean_spark.operators.similarity import lsh_topk_banded

    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    q = emb.where(F.col("vec_id") < 5)
    brute = {(r["query_id"], r["neighbor_id"])
             for r in brute_force_topk(emb, q, k=5).collect()}
    approx = {(r["query_id"], r["neighbor_id"])
              for r in lsh_topk_banded(emb, q, dim=64, k=5).collect()}
    # banded OR-amplification: good recall at bands=12 x 4 planes
    assert len(approx & brute) / len(brute) >= 0.5
    # deterministic
    approx2 = {(r["query_id"], r["neighbor_id"])
               for r in lsh_topk_banded(emb, q, dim=64, k=5).collect()}
    assert approx == approx2


def test_two_sample_drift_randomized_matches_pooled_helper(spark):
    """Randomized histograms (sparse bins, one-sided bins, size imbalance)
    must reproduce pooled_chi_square_from_histograms / ks_from_histograms
    through the DataFrame plan exactly."""
    import random

    for seed in range(6):
        rng = random.Random(seed)
        nbins = rng.choice([3, 5, 8])
        width = 100.0 / nbins
        a = [rng.choice([0, 0, rng.randint(1, 80)]) for _ in range(nbins)]
        b = [rng.choice([0, rng.randint(1, 60)]) for _ in range(nbins)]
        if sum(a) == 0 or sum(b) == 0:
            continue
        rows = []
        for i, n in enumerate(a):
            rows += [(i * width + 0.5, True)] * n
        for i, n in enumerate(b):
            rows += [(i * width + 0.5, False)] * n
        rng.shuffle(rows)
        df = spark.createDataFrame(rows, "value double, is_a boolean")
        out = drift_ops.two_sample_drift(df, "value", "is_a", 0.0, 100.0,
                                         nbins=nbins, round_to=6).collect()[0]
        # align helper inputs to bins PRESENT in the grouped histogram
        chi, dof = drift_ops.pooled_chi_square_from_histograms(a, b)
        ks = drift_ops.ks_from_histograms(a, b)
        assert abs(out["chi2_stat"] - chi) < 1e-4, (seed, out, chi)
        assert abs(out["ks_stat"] - ks) < 1e-6, (seed, out, ks)
        assert out["dof"] == dof, (seed, out["dof"], dof)
        assert out["n_a"] == sum(a) and out["n_b"] == sum(b)


def test_simhash_near_pairs_radius_and_recall(spark):
    """Distance-tolerant SimHash pairs: near-identical docs pair up within
    the radius, unrelated docs don't; the pigeonhole precondition is
    enforced; brute-force hamming over the same signatures confirms FULL
    recall at distance <= bands-1."""
    from json_schema_lean_spark.operators.dedup import (
        simhash64,
        simhash_near_pairs,
    )

    rows = [(i, f"unique words {i} nothing shared alpha beta gamma {i*7}")
            for i in range(20)]
    rows += [(100, "the quick brown fox jumps over the lazy dog today"),
             (101, "the quick brown fox jumps over the lazy dog tonight")]
    df = spark.createDataFrame(rows, "doc_id long, text string")

    got = {(r["id_a"], r["id_b"]): r["hamming"]
           for r in simhash_near_pairs(df, "text", "doc_id", max_hamming=8,
                                       bands=12, portable=True).collect()}
    assert (100, 101) in got and got[(100, 101)] <= 8

    # brute-force reference: every pair within the radius must be found
    sigs = {r["doc_id"]: r["s"] for r in df.select(
        "doc_id", simhash64(F.col("text"), 2, True).alias("s")).collect()}
    ids = sorted(sigs)
    brute = {(a, b): bin(sigs[a] ^ sigs[b]).count("1")
             for i, a in enumerate(ids) for b in ids[i + 1:]
             if bin(sigs[a] ^ sigs[b]).count("1") <= 8}
    assert got == brute  # full recall at hamming <= bands-1 (pigeonhole)

    with pytest.raises(ValueError, match="pigeonhole"):
        simhash_near_pairs(df, "text", "doc_id", max_hamming=4, bands=4)
