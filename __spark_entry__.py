"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)``     — flagship: columnar schema validation of the sf0.001
                       documents table (verdicts + violations).
``queries()``        — one callable per implemented operator (SURVEY.md §2 +
                       task-mandated pipeline extensions).
``oracle_sql()``     — DuckDB-equivalent SQL per query for the driver's
                       side-by-side correctness check at sf0.01.

Column names are aliased identically on both sides (the driver hash-compares
values after sorting columns by name); float outputs are rounded to 6 dp on
both sides.
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Optional

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from json_schema_lean_spark.operators.dedup import exact_dup_groups
from json_schema_lean_spark.operators.referential import dangling_ref_counts
from json_schema_lean_spark.operators.similarity import brute_force_topk
from json_schema_lean_spark.operators.stats import (
    numeric_column_stats,
    uniqueness_summary,
)
from json_schema_lean_spark.operators.text import (
    bpe_ish_token_count,
    fingerprint,
    punct_ratio,
    stopword_ratio,
    token_count,
)
from json_schema_lean_spark.operators.validation import (
    validate_dataframe,
    validate_json_column,
    violation_rows,
)

# ---------------------------------------------------------------------------
# flagship schema over the flat documents table (driver testdata shape)
# ---------------------------------------------------------------------------

FLAT_DOC_SCHEMA = {
    "$id": "https://engine.example/schemas/flat-doc",
    "type": "object",
    "required": ["doc_id", "text", "lang"],
    "properties": {
        "doc_id": {"type": "integer", "minimum": 0},
        "text": {"type": "string", "minLength": 1},
        "lang": {"enum": ["en", "es", "zh"]},
        "source": {"type": "string", "pattern": "^src[0-9]+$"},
        "n_chars": {"type": "integer", "minimum": 0, "maximum": 400},
    },
}

EVENT_PROPS_SCHEMA = {
    "type": "object",
    "required": ["k"],
    "properties": {"k": {"type": "integer", "minimum": 1}},
}


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


def _docs_par(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents.parquet spread to default parallelism when the planned
    scan is narrower (r6, guide §2.5): the table is a single parquet row
    group at driver scale, so the heavy per-row text operators (regex,
    n-gram construction, entropy) otherwise serialize map-side on ONE
    task before their first exchange. No-op at production scale; used
    only by the queries whose per-row compute dominates — the cheap
    filter/agg queries keep their zero/one-exchange plans."""
    from json_schema_lean_spark.parallelism import scale_partitions
    return scale_partitions(_docs(spark, sf_dir))


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: validate sf0.001 documents against FLAT_DOC_SCHEMA
    (columnar plan, zero Python per row); return verdicts + violations."""
    docs = _docs(spark, "/root/testdata/sf0.001")
    out = validate_dataframe(docs, FLAT_DOC_SCHEMA)
    return out.select("doc_id", "valid",
                      F.transform("violations", lambda v: v.getField("keyword"))
                       .alias("failed_keywords"))


# ---------------------------------------------------------------------------
# queries
# ---------------------------------------------------------------------------

def _q_validate_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    out = validate_dataframe(_docs(spark, sf_dir), FLAT_DOC_SCHEMA)
    return out.select("doc_id", "valid")


def _q_violations_by_keyword(spark: SparkSession, sf_dir: str) -> DataFrame:
    out = validate_dataframe(_docs(spark, sf_dir), FLAT_DOC_SCHEMA)
    return (violation_rows(out, ["doc_id"])
            .groupBy("keyword").agg(F.count(F.lit(1)).alias("n")))


def _q_validate_events_props(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    return validate_json_column(ev, "props", EVENT_PROPS_SCHEMA) \
        .select("event_id", "valid")


def _q_doc_numeric_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    return numeric_column_stats(_docs(spark, sf_dir), ["doc_id", "n_chars"])


def _q_uniqueness_doc_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    return uniqueness_summary(_docs(spark, sf_dir), "doc_id")


def _q_exact_dup_groups(spark: SparkSession, sf_dir: str) -> DataFrame:
    return exact_dup_groups(_docs(spark, sf_dir), "text", "doc_id")


def _q_dangling_partkeys(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    part = spark.read.parquet(f"{sf_dir}/part.parquet")
    return dangling_ref_counts(li, "l_partkey", part, "p_partkey")


def _q_token_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _docs_par(spark, sf_dir)
    return d.select(
        "doc_id",
        token_count(F.col("text")).alias("n_tokens"),
        bpe_ish_token_count(F.col("text")).alias("n_subtokens"),
    )


def _q_quality_ratios(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _docs_par(spark, sf_dir)
    return d.select(
        "doc_id",
        F.round(punct_ratio(F.col("text")), 6).alias("punct_ratio"),
        F.round(stopword_ratio(F.col("text")), 6).alias("stopword_ratio"),
    )


def _q_fingerprints(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _docs(spark, sf_dir)
    return d.select("doc_id", fingerprint(F.col("text")).alias("fp"))


def _q_pii_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII scan (operators/text.py): per-doc email/IPv4/phone match
    counts plus the length delta after typed-placeholder redaction —
    patterns restricted to the Java∩RE2 regex subset so DuckDB counts
    identically. (The synthetic corpus is PII-free, so nonzero semantics
    are pinned by crafted-input pytest; the oracle still value-checks
    the full expression pipeline end-to-end.)"""
    from json_schema_lean_spark.operators.text import pii_counts, redact_pii
    d = _docs_par(spark, sf_dir)
    return d.select(
        "doc_id",
        *pii_counts(F.col("text")),
        (F.length(redact_pii(F.col("text"))) - F.length("text"))
        .cast("long").alias("redact_len_delta"),
    )


def _q_decontam_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark decontamination (operators/decontam.py): per-doc share
    of distinct word 8-grams that appear in a deterministic 'benchmark'
    slice (doc_id % 20 == 0 stands in for an eval suite). Plan:
    benchmark grams broadcast, corpus streams through a broadcast
    left-semi join — no corpus-side shuffle for the matching."""
    from json_schema_lean_spark.operators.decontam import benchmark_overlap
    d = _docs(spark, sf_dir)
    bench = d.where(F.col("doc_id") % 20 == 0).select("text")
    return benchmark_overlap(d, bench, n=8)


def _q_gopher_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher/MassiveText-style repetition + shape signals
    (operators/text.py): bigram repetition, mean word length, symbol
    ratio, repeated-line fraction. Pure Column expressions — scan-speed
    quality filtering; the oracle replays every list op in SQL."""
    from json_schema_lean_spark.operators.text import (
        char_entropy, mean_word_length, ngram_repetition_ratio,
        repeated_line_fraction, symbol_word_ratio)
    d = _docs_par(spark, sf_dir)
    return d.select(
        "doc_id",
        F.round(ngram_repetition_ratio(F.col("text"), 2), 6)
         .alias("bigram_rep"),
        F.round(mean_word_length(F.col("text")), 6).alias("mean_word_len"),
        F.round(symbol_word_ratio(F.col("text")), 6).alias("symbol_ratio"),
        F.round(repeated_line_fraction(F.col("text")), 6)
         .alias("rep_line_frac"),
        F.round(char_entropy(F.col("text")), 6).alias("char_entropy_bits"),
    )


def _q_stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic per-language downsample (operators/packing.py):
    hash-of-key selection, engine-portable — the oracle reproduces the
    exact row set, not just counts. Plan: single Filter, no shuffle."""
    from json_schema_lean_spark.operators.packing import stratified_sample
    d = _docs(spark, sf_dir)
    return stratified_sample(
        d, "doc_id", "lang",
        {"en": 0.5, "zh": 0.8, "es": 0.25}, default=0.1,
    ).select("doc_id", "lang")


def _q_pack_batches(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token-budget sequence packing (operators/packing.py): bucketed
    greedy first-fit-with-overflow, one shuffle on the uniform bucket
    key, per-bucket window cumsum (no global single-task window). The
    oracle replays hash-bucketing + cumsum + DIV in SQL, so batch
    membership is value-checked, not just counted."""
    from json_schema_lean_spark.operators.packing import (
        batch_summary, pack_documents)
    d = _docs(spark, sf_dir).select(
        "doc_id", token_count(F.col("text")).alias("n_tokens"))
    packed = pack_documents(d, "doc_id", "n_tokens", budget=512,
                            n_buckets=16)
    return batch_summary(packed, "n_tokens")


def _q_q1_pricing(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    return (li.where(F.col("l_shipdate") <= F.lit("1998-09-01"))
            .groupBy("l_returnflag", "l_linestatus")
            .agg(F.round(F.sum("l_quantity"), 4).alias("sum_qty"),
                 F.round(F.sum("l_extendedprice"), 4).alias("sum_base_price"),
                 F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 4)
                  .alias("sum_disc_price"),
                 F.round(F.avg("l_quantity"), 6).alias("avg_qty"),
                 F.count(F.lit(1)).alias("count_order")))


def _q_top_orders_per_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = spark.read.parquet(f"{sf_dir}/orders.parquet")
    w = Window.partitionBy("o_custkey").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey").asc())
    return (o.withColumn("rk", F.row_number().over(w))
             .where(F.col("rk") <= 3)
             .select("o_custkey", "o_orderkey", "rk"))


def _q_ann_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    queries = emb.where(F.col("vec_id") < 5)
    return brute_force_topk(emb, queries, k=5)


def _q_suppliers_per_region(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-hop dimension join (supplier -> nation -> region): both dims
    are broadcast-sized, so the plan is two BroadcastHashJoins with zero
    fact-side shuffle before the final tiny aggregation."""
    sup = spark.read.parquet(f"{sf_dir}/supplier.parquet")
    nat = spark.read.parquet(f"{sf_dir}/nation.parquet")
    reg = spark.read.parquet(f"{sf_dir}/region.parquet")
    return (sup.join(F.broadcast(nat),
                     sup["s_nationkey"] == nat["n_nationkey"])
               .join(F.broadcast(reg),
                     nat["n_regionkey"] == reg["r_regionkey"])
               .groupBy("r_name")
               .agg(F.count(F.lit(1)).alias("n_suppliers"),
                    F.round(F.avg("s_acctbal"), 6).alias("avg_acctbal")))


def _q_ann_topk_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scale-path ANN: banded literal-plane LSH buckets (same technique as
    embedding_near_dups) — a query scores only its buckets' rows. Fully
    DuckDB-oracled, unlike the xxhash lsh_topk variant."""
    from json_schema_lean_spark.operators.similarity import lsh_topk_banded
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    queries = emb.where(F.col("vec_id") < 5)
    return lsh_topk_banded(emb, queries, dim=64, k=5)


def _q_ann_topk_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF ANN with the deterministic fixed-centroid coarse quantizer
    (integer-quantized assignment/probing — bit-exact vs the DuckDB
    oracle); the k-means IVF variant shares the probe/scoring plan but
    its centroids are only reproducible by pyspark.ml."""
    from json_schema_lean_spark.operators.similarity import ivf_topk_fixed
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    queries = emb.where(F.col("vec_id") < 5)
    return ivf_topk_fixed(emb, queries, k=5, nprobe=4,
                          centroid_pred=F.col("vec_id") < 16)


def _q_embedding_uniqueitems(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    out = validate_dataframe(
        emb, {"properties": {"embedding": {"uniqueItems": True, "minItems": 1}}})
    return out.select("vec_id", "valid")


def _q_asof_purchase_before_click(spark: SparkSession, sf_dir: str) -> DataFrame:
    from json_schema_lean_spark.operators.temporal import asof_join
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    clicks = ev.where(F.col("event_type") == "click")
    purchases = ev.where(F.col("event_type") == "purchase")
    out = asof_join(clicks, purchases, on="user_id", ts="ts", value_cols=["value"])
    return out.select("event_id", F.round(F.col("asof_value"), 6).alias("asof_value"))


def _q_session_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    from json_schema_lean_spark.operators.temporal import session_stats
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    return session_stats(ev, "user_id", "ts", gap_minutes=30,
                         order_tiebreak="event_id")


def _q_events_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    from json_schema_lean_spark.operators.temporal import tumbling_window_agg
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    return tumbling_window_agg(ev, "ts", "value", "1 hour")


def _q_orders_by_month(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = spark.read.parquet(f"{sf_dir}/orders.parquet")
    return (o.groupBy(F.year("o_orderdate").alias("yr"),
                      F.month("o_orderdate").alias("mo"))
             .agg(F.count(F.lit(1)).alias("n_orders"),
                  F.round(F.sum("o_totalprice"), 4).alias("revenue")))


def _q_q3_building_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = spark.read.parquet(f"{sf_dir}/customer.parquet") \
        .where(F.col("c_mktsegment") == "BUILDING")
    o = spark.read.parquet(f"{sf_dir}/orders.parquet")
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    rev = (li.join(o, li.l_orderkey == o.o_orderkey)
             .join(F.broadcast(c), o.o_custkey == c.c_custkey)
             .groupBy("l_orderkey")
             .agg(F.round(F.sum(F.col("l_extendedprice")
                                * (1 - F.col("l_discount"))), 4).alias("revenue")))
    return (rev.orderBy(F.col("revenue").desc(), F.col("l_orderkey").asc())
               .limit(10))


def _q_lang_guess_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    from json_schema_lean_spark.operators.text import lang_guess
    d = _docs_par(spark, sf_dir)
    return (d.select(lang_guess(F.col("text")).alias("guessed"))
             .groupBy("guessed").agg(F.count(F.lit(1)).alias("n")))


def _q_nchars_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _docs(spark, sf_dir)
    width = 25.0
    bucket = F.least(F.greatest(F.floor(F.col("n_chars") / width), F.lit(0)),
                     F.lit(23)).cast("int")
    return (d.where(F.col("n_chars").isNotNull())
             .groupBy(bucket.alias("bucket"))
             .agg(F.count(F.lit(1)).alias("n")))


def _q_minhash_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash-LSH candidate pairs + exact Jaccard verification, using the
    engine-portable md5 hash so DuckDB reproduces the identical pipeline."""
    from json_schema_lean_spark.operators.dedup import (
        minhash_candidate_pairs, ngram_jaccard)
    d = _docs(spark, sf_dir)
    pairs = minhash_candidate_pairs(d, "text", "doc_id", k=32, bands=16,
                                    ngram=3, portable=True)
    return ngram_jaccard(pairs, d, "text", "doc_id", ngram=3)


def _q_minhash_pairs_capped(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The degenerate-bucket guard as an ORACLE-CHECKED operator: the same
    portable MinHash pipeline with max_bucket_size=2 — small enough that
    the sf0.01 corpus genuinely truncates buckets (15 buckets of 3 docs) —
    whose deterministic per-bucket prefix (cap_bucket_rows, ordered by
    doc_id) is reproduced in DuckDB with a row_number() window. Proves the
    cap is engine-exact semantics, not a Spark-side heuristic."""
    from json_schema_lean_spark.operators.dedup import minhash_candidate_pairs
    d = _docs(spark, sf_dir)
    return minhash_candidate_pairs(d, "text", "doc_id", k=32, bands=16,
                                   ngram=3, portable=True, max_bucket_size=2)


def _q_minhash_pairs_capped_sampled(spark: SparkSession,
                                    sf_dir: str) -> DataFrame:
    """The SCALE-ROBUST cap mode as an ORACLE-CHECKED operator (VERDICT r4
    #3): cap_method="sampled" keeps rows whose portable md5-hash of doc_id
    is 0 mod ceil(n/cap) — no per-bucket window, so no single-task
    straggler on a degenerate 100M-row bucket. With portable=True the
    survivor hash is the same md5 construction in both engines, so DuckDB
    reproduces the exact survivor set (not just pair counts); at sf0.01
    with cap=2 the same 15 oversized buckets are truncated, so the
    truncation path is genuinely exercised at gate scale."""
    from json_schema_lean_spark.operators.dedup import minhash_candidate_pairs
    d = _docs(spark, sf_dir)
    return minhash_candidate_pairs(d, "text", "doc_id", k=32, bands=16,
                                   ngram=3, portable=True, max_bucket_size=2,
                                   cap_method="sampled")


def _q_simhash_groups(spark: SparkSession, sf_dir: str) -> DataFrame:
    from json_schema_lean_spark.operators.dedup import simhash_dup_groups
    return simhash_dup_groups(_docs(spark, sf_dir), "text", "doc_id",
                              portable=True)


def _q_embedding_near_dups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-dup pairs via banded hyperplane LSH — the
    scale path IS the oracled pipeline now (VERDICT r1): candidates come
    from an equi-join on (band, signature), never an all-pairs cross join.
    The DuckDB oracle replays the identical literal planes + integer
    quantization, so bucket membership matches bit-for-bit; recall vs brute
    force at this operating point is pinned in tests/test_operators.py."""
    from json_schema_lean_spark.operators.similarity import lsh_near_dup_pairs
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    return lsh_near_dup_pairs(emb, dim=64, threshold=0.45,
                              bands=12, planes_per_band=4)


def _q_users_click_and_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct users with BOTH a click and a purchase. r6: one scan +
    one map-side-combined aggregation instead of ``intersect`` (which
    scanned events twice and shuffled both raw user_id streams before
    its distinct; measured 9-10.7 s -> ~0.5 s at the 1M-row sf1.0
    layout). Identical result set to the INTERSECT oracle: groupBy
    groups NULL user_ids like INTERSECT matches them (null = null)."""
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    return (ev.where(F.col("event_type").isin("click", "purchase"))
              .groupBy("user_id")
              .agg(F.max(F.col("event_type") == "click").alias("_c"),
                   F.max(F.col("event_type") == "purchase").alias("_p"))
              .where(F.col("_c") & F.col("_p"))
              .select("user_id"))


def _q_event_value_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    return ev.agg(
        F.round(F.percentile("value", 0.5), 6).alias("p50"),
        F.round(F.percentile("value", 0.9), 6).alias("p90"),
        F.round(F.percentile("value", 0.99), 6).alias("p99"))


def _q_quality_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    from json_schema_lean_spark.operators.text import quality_score
    d = _docs_par(spark, sf_dir)
    return d.select("doc_id", quality_score(F.col("text")).alias("quality"))


def _q_ngram_vocab(spark: SparkSession, sf_dir: str) -> DataFrame:
    from json_schema_lean_spark.operators.text import word_ngrams
    d = _docs_par(spark, sf_dir)
    return (d.select(F.explode(word_ngrams(F.col("text"), 3)).alias("ngram"))
             .groupBy("ngram").agg(F.count(F.lit(1)).alias("n"))
             .where(F.col("n") >= 3))


def _q_distinct_sources_per_lang(spark: SparkSession, sf_dir: str) -> DataFrame:
    from json_schema_lean_spark.operators.stats import distinct_count_per_key
    return distinct_count_per_key(_docs(spark, sf_dir), "lang", "source")


def _q_drift_click_vs_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-sample distribution drift (KS + chi-square) of `value` between
    click and purchase events — the north_star drift check as one DataFrame
    plan (operators/drift.two_sample_drift): single scan, bounded-histogram
    shuffle, no driver-side collect."""
    from json_schema_lean_spark.operators.drift import two_sample_drift
    ev = (spark.read.parquet(f"{sf_dir}/events.parquet")
          .where(F.col("event_type").isin("click", "purchase"))
          .withColumn("is_click", F.col("event_type") == "click"))
    return two_sample_drift(ev, "value", "is_click", 0.0, 200.0, nbins=8)


def _q_winnow_fingerprints(spark: SparkSession, sf_dir: str) -> DataFrame:
    from json_schema_lean_spark.operators.text import winnow_fingerprint
    d = _docs_par(spark, sf_dir)
    return d.select("doc_id", winnow_fingerprint(F.col("text")).alias("winnow_fp"))


def _q_simhash_near_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distance-tolerant SimHash near-dup pairs: banded Hamming bucket join
    (pigeonhole recall for distance <= bands-1) + bit_count(xor) verify,
    fully DuckDB-oracled via the portable md5 hash."""
    from json_schema_lean_spark.operators.dedup import simhash_near_pairs
    return simhash_near_pairs(_docs(spark, sf_dir), "text", "doc_id",
                              max_hamming=8, bands=12, portable=True)


def _q_near_dup_components(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Transitive near-dup GROUPS from MinHash candidate pairs: pointer-
    jumping connected components (operators/graph.py) — the pairs→groups
    half of a production dedup retention policy. Fully oracled: DuckDB
    reproduces the identical pairs (portable md5 pipeline) and closes them
    with a recursive CTE."""
    from json_schema_lean_spark.operators.dedup import minhash_candidate_pairs
    from json_schema_lean_spark.operators.graph import connected_components

    d = _docs(spark, sf_dir)
    pairs = minhash_candidate_pairs(d, "text", "doc_id", k=32, bands=16,
                                    ngram=3, portable=True)
    return connected_components(pairs).select(
        F.col("node").cast("long").alias("doc_id"),
        F.col("component").cast("long").alias("component"))


def _q_media_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multimodal metadata extraction, fully SQL-oracled: deterministic blob
    synthesis (repeat(sha256(ref))) stands in for object-store reads, so the
    columnar metadata path (byte length + content digest, no decode) can be
    reproduced exactly in DuckDB."""
    from json_schema_lean_spark.operators.multimodal import (
        extract_media_meta,
        synth_media_blobs,
    )
    d = spark.read.parquet(f"{sf_dir}/documents.parquet")
    refs = d.select(
        F.concat(F.lit("asset://"), F.col("doc_id")).alias("media_ref"))
    kind = F.element_at(
        F.array(F.lit("image"), F.lit("audio"), F.lit("video")),
        (F.ascii(F.substring(F.md5(F.col("media_ref")), 1, 1)) % 3) + 1)
    media = synth_media_blobs(refs.withColumn("media_kind", kind),
                              hash_bits=256)
    return extract_media_meta(media)


def _q_media_image_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Real image decode in the driver gate: deterministic 24-bit BMPs built
    executor-side, decoded by the hand-parsed BMP reader through mapInPandas
    (width/height/channels/mean_luma/sharpness). Rows-only: pixel math over
    hash-noise bytes is not SQL-expressible."""
    from pyspark.sql.functions import PandasUDFType, pandas_udf

    from json_schema_lean_spark.operators.multimodal import image_features

    def _mk_bmp(ids):
        from json_schema_lean_spark.operators.multimodal import synth_bmp
        return ids.map(lambda i: synth_bmp(
            width=4 + int(i) % 5, height=3 + int(i) % 4, seed=str(int(i))))

    mk_bmp = pandas_udf(_mk_bmp, "binary", PandasUDFType.SCALAR)
    d = (spark.read.parquet(f"{sf_dir}/documents.parquet")
         .where(F.col("doc_id").cast("bigint") < 96)
         .select(F.concat(F.lit("img://"), F.col("doc_id").cast("string")).alias("media_ref"),
                 mk_bmp(F.col("doc_id")).alias("media_bytes")))
    out = image_features(d, decoder="real")
    return out.select("media_ref", "width", "height", "channels",
                      F.round("mean_luma", 6).alias("mean_luma"),
                      F.round("sharpness", 6).alias("sharpness"))


def _q_media_audio_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Real audio decode in the driver gate: deterministic 16-bit PCM WAVs
    (seeded sine, varying length) decoded via the stdlib-wave reader through
    mapInPandas (sample_rate/n_samples/rms). Rows-only."""
    from pyspark.sql.functions import PandasUDFType, pandas_udf

    from json_schema_lean_spark.operators.multimodal import audio_features

    def _mk_wav(ids):
        from json_schema_lean_spark.operators.multimodal import synth_wav
        return ids.map(lambda i: synth_wav(
            n_samples=400 + int(i) % 7 * 100, rate=8000 + int(i) % 3 * 4000,
            seed=str(int(i))))

    mk_wav = pandas_udf(_mk_wav, "binary", PandasUDFType.SCALAR)
    d = (spark.read.parquet(f"{sf_dir}/documents.parquet")
         .where(F.col("doc_id").cast("bigint") < 96)
         .select(F.concat(F.lit("wav://"), F.col("doc_id").cast("string")).alias("media_ref"),
                 mk_wav(F.col("doc_id")).alias("media_bytes")))
    out = audio_features(d, decoder="real")
    return out.select("media_ref", "sample_rate", "n_samples",
                      F.round("rms", 6).alias("rms"))


def _q_media_frame_samples(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Real video decode in the driver gate: synthesize YUV4MPEG2 streams
    (varying geometry/colorspace/frame count per doc) executor-side, then
    sample frames through the row-expanding mapInPandas path with the native
    y4m decoder. Deterministic rows; no SQL oracle (frame bytes are not
    SQL-expressible) — rows-only check."""
    from pyspark.sql.functions import pandas_udf

    from json_schema_lean_spark.operators.multimodal import sample_frames

    def _mk_y4m(ids):
        from json_schema_lean_spark.operators.multimodal import synth_y4m
        cols = ["C420jpeg", "C422", "C444", "Cmono"]
        return ids.map(lambda i: synth_y4m(
            width=8 + (int(i) % 3) * 4, height=8, n_frames=4 + int(i) % 5,
            seed=str(int(i)), colorspace=cols[int(i) % 4]))

    from pyspark.sql.functions import PandasUDFType
    mk_y4m = pandas_udf(_mk_y4m, "binary", PandasUDFType.SCALAR)

    d = (spark.read.parquet(f"{sf_dir}/documents.parquet")
         .where(F.col("doc_id").cast("bigint") < 64)
         .select(F.concat(F.lit("vid://"), F.col("doc_id").cast("string")).alias("media_ref"),
                 mk_y4m(F.col("doc_id")).alias("media_bytes")))
    return sample_frames(d, every_n=2, max_frames=3, decoder="real")


STRICT_PROPS_SCHEMA = {
    "type": "object",
    "required": ["k"],
    "properties": {"k": {"type": "integer", "minimum": 1, "maximum": 50}},
}


def _q_events_props_violations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Violation ROWS from the variant path (r2): dynamic JSON -> per-value
    (keyword, RFC 6901 pointer) rows, all JVM-side. Pins violation CONTENT
    through the driver gate, not just verdicts."""
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    out = validate_json_column(ev, "props", STRICT_PROPS_SCHEMA)
    return (out.where(~F.col("valid"))
               .select("event_id", F.explode("violations").alias("v"))
               .select("event_id",
                       F.col("v.keyword").alias("keyword"),
                       F.col("v.json_pointer").alias("json_pointer")))


def _load_suite_verdicts():
    """Shared corpus loader for the three conformance-gate queries:
    ([(test_id, schema_json_str, instance_json_str, expected)], remotes).
    Covers all four fixture suites (home-grown + official draft7 +
    optional/ + refremote/) with the reference-parity float-overflow
    expectation applied."""
    import json as _json
    from pathlib import Path

    from json_schema_lean_spark.metaschema import load_suite_remotes

    fixtures = Path(__file__).resolve().parent / "fixtures"
    suite_dirs = [fixtures / "suite", fixtures / "suite_official" / "draft7",
                  fixtures / "suite_official" / "draft7" / "optional",
                  fixtures / "suite_official" / "draft7" / "refremote"]
    remotes = load_suite_remotes(fixtures / "suite_official" / "remotes")
    # the official optional/float-overflow expectation contradicts the
    # reference's Float semantics (1e308/0.5 = inf is not an integer);
    # reference parity wins — tests/test_optional_suites.py pins the same
    known_diff = {("float-overflow",
                   "valid if optional overflow handling is implemented"): False}
    rows = []
    for fp in sorted(p for d in suite_dirs for p in d.glob("*.json")):
        for ci, case in enumerate(_json.loads(fp.read_text())):
            for ti, test in enumerate(case["tests"]):
                expected = known_diff.get((fp.stem, test["description"]),
                                          test["valid"])
                rows.append((f"{fp.stem}/{ci}/{ti}",
                             _json.dumps(case["schema"], sort_keys=True),
                             _json.dumps(test["data"]),
                             expected))
    return rows, remotes


def _q_suite_conformance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Replay the JSON-Schema-Test-Suite-shaped fixtures through the Spark
    path and return DISAGREEMENTS with the expected (reference-semantics)
    verdicts. Self-checking: an empty result means full conformance.
    Rows-only for the driver (a SQL oracle cannot validate JSON Schema)."""
    from json_schema_lean_spark.operators.validation import suite_validator_udf

    rows, remotes = _load_suite_verdicts()
    df = spark.createDataFrame(
        rows, "test_id string, schema_json string, instance_json string, expected boolean")
    udf = suite_validator_udf(extra_registry=remotes)
    got = df.withColumn("valid", udf(F.col("schema_json"), F.col("instance_json")))
    return got.where(F.col("valid") != F.col("expected")) \
              .select("test_id", "expected", "valid")


def _q_suite_conformance_variant(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Same corpus, replayed through the VARIANT path (VERDICT r3 #4: the
    externally-checked gate previously exercised only the pandas-UDF
    interpreter; the JVM paths were pytest-only). Schemas outside the
    variant subset fall back via CompileFallback and are SKIPPED — but a
    coverage floor raises loudly if the lowerable set ever collapses, so
    the gate can't go vacuously green. Returns disagreements (0 rows =
    every lowerable verdict matches). Rows-only by nature."""
    import json as _json

    from json_schema_lean_spark.compiler import CompileFallback
    from json_schema_lean_spark.metaschema import META_REGISTRY
    from json_schema_lean_spark.resolver import SchemaCycleError
    from json_schema_lean_spark.variant import VariantCompiler

    rows, remotes = _load_suite_verdicts()
    registry = dict(META_REGISTRY)
    registry.update(remotes)

    lowered_cache: dict = {}
    cases: list = []    # (case_key, lowered, [(test_id, inst, expected)...])
    by_case: dict = {}
    for test_id, schema_str, inst, expected in rows:
        case_key = test_id.rsplit("/", 1)[0]
        if case_key not in by_case:
            if schema_str not in lowered_cache:
                try:
                    lowered_cache[schema_str] = VariantCompiler(
                        _json.loads(schema_str), registry=registry).lower()
                except (CompileFallback, SchemaCycleError):
                    lowered_cache[schema_str] = None
            low = lowered_cache[schema_str]
            by_case[case_key] = None
            if low is not None:
                by_case[case_key] = (case_key, low, [])
                cases.append(by_case[case_key])
        if by_case[case_key] is not None:
            by_case[case_key][2].append((test_id, inst, expected))

    if len(cases) < 100:  # variant subset must stay broad (pytest pins same)
        raise RuntimeError(
            f"variant conformance gate degraded: only {len(cases)} lowerable "
            f"cases of {len(by_case)}")

    # one eagerly-evaluated job per chunk (unioning every chunk's CASE tree
    # into a single plan OOMs the analyzer — the per-chunk shape is exactly
    # what tests/test_variant.py pins); the bounded mismatch set (usually
    # empty) is re-wrapped as the result DataFrame
    CHUNK = 80  # r4 measured: ~25% faster than 40 (fewer jobs), still far
    # below the all-chunks-in-one-plan size that exhausts analyzer memory
    mismatches = []
    for start in range(0, len(cases), CHUNK):
        chunk = cases[start:start + CHUNK]
        chunk_rows = [(i, tid, inst, exp)
                      for i, (_ck, _low, tests) in enumerate(chunk)
                      for tid, inst, exp in tests]
        df = spark.createDataFrame(
            chunk_rows, "i int, test_id string, inst string, expected boolean")
        v = F.try_parse_json("inst")
        expr = F.lit(None).cast("boolean")
        for i in range(len(chunk) - 1, -1, -1):
            low = chunk[i][1]
            ok = F.when(v.isNull(), F.lit(False)) \
                  .otherwise(F.coalesce(low.valid(v), F.lit(False)))
            expr = F.when(F.col("i") == i, ok).otherwise(expr)
        got = df.select("test_id", "expected", expr.alias("valid")).collect()
        mismatches += [(r["test_id"], r["expected"], r["valid"])
                       for r in got if r["valid"] != r["expected"]]
    return spark.createDataFrame(
        mismatches, "test_id string, expected boolean, valid boolean")


def _q_suite_conformance_columnar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Same corpus through the STATIC COLUMNAR path via per-instance dtype
    inference (the 100-TB struct-shredded fast path). Instances the shredded
    representation cannot carry (null-vs-absent ambiguity, heterogeneous
    arrays) are excluded with an eligibility floor that raises loudly.
    Returns disagreements; rows-only by nature."""
    import json as _json

    from pyspark.sql.types import ArrayType

    from json_schema_lean_spark.compiler import ColumnarCompiler, CompileFallback
    from json_schema_lean_spark.inference import infer_json_dtype
    from json_schema_lean_spark.metaschema import META_REGISTRY
    from json_schema_lean_spark.resolver import SchemaCycleError

    rows, remotes = _load_suite_verdicts()
    registry = dict(META_REGISTRY)
    registry.update(remotes)

    comp_cache: dict = {}
    eligible = []   # (test_id, dtype, lowered, json.dumps([data]), expected)
    for test_id, schema_str, inst, expected in rows:
        comp = comp_cache.get(schema_str)
        if comp is None:
            try:
                comp = ColumnarCompiler(_json.loads(schema_str),
                                        registry=registry)
            except SchemaCycleError:
                comp = "cycle"
            comp_cache[schema_str] = comp
        if comp == "cycle":
            continue
        data = _json.loads(inst)
        dtype, _why = infer_json_dtype(data)
        if dtype is None:
            continue
        try:
            low = comp.lower(dtype, null_means="null")
        except CompileFallback:
            continue
        eligible.append((test_id, dtype, low, _json.dumps([data]), expected))

    frac = len(eligible) / max(len(rows), 1)
    if frac < 0.85:  # pytest pins 0.90 on the core dirs; optional/ dilutes
        raise RuntimeError(
            f"columnar conformance gate degraded: {len(eligible)}/{len(rows)}"
            f" = {frac:.3f} eligible")

    # per-chunk eager jobs for the same analyzer-memory reason as the
    # variant gate above (shape pinned by tests/test_columnar_suite.py)
    CHUNK = 80  # r4 measured: ~25% faster than 40 (fewer jobs), still far
    # below the all-chunks-in-one-plan size that exhausts analyzer memory
    mismatches = []
    for start in range(0, len(eligible), CHUNK):
        chunk = eligible[start:start + CHUNK]
        chunk_rows = [(i, tid, inst, exp)
                      for i, (tid, _dt, _low, inst, exp) in enumerate(chunk)]
        df = spark.createDataFrame(
            chunk_rows, "i int, test_id string, inst string, expected boolean")
        expr = F.lit(None).cast("boolean")
        for i in range(len(chunk) - 1, -1, -1):
            _tid, dtype, low, _inst, _exp = chunk[i]
            col = F.element_at(F.from_json(F.col("inst"), ArrayType(dtype)), 1)
            ok = F.coalesce(low.valid(col), F.lit(False))
            expr = F.when(F.col("i") == i, ok).otherwise(expr)
        got = df.select("test_id", "expected", expr.alias("valid")).collect()
        mismatches += [(r["test_id"], r["expected"], r["valid"])
                       for r in got if r["valid"] != r["expected"]]
    return spark.createDataFrame(
        mismatches, "test_id string, expected boolean, valid boolean")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        "validate_documents": _q_validate_documents,
        "violations_by_keyword": _q_violations_by_keyword,
        "validate_events_props": _q_validate_events_props,
        "doc_numeric_stats": _q_doc_numeric_stats,
        "uniqueness_doc_id": _q_uniqueness_doc_id,
        "exact_dup_groups": _q_exact_dup_groups,
        "dangling_partkeys": _q_dangling_partkeys,
        "token_counts": _q_token_counts,
        "quality_ratios": _q_quality_ratios,
        "fingerprints": _q_fingerprints,
        "gopher_quality": _q_gopher_quality,  # repetition signals: full oracle
        "pii_scan": _q_pii_scan,            # Java∩RE2 regexes: full oracle
        "decontam_overlap": _q_decontam_overlap,  # n-gram overlap: full oracle
        "stratified_sample": _q_stratified_sample,  # portable hash: full oracle
        "pack_batches": _q_pack_batches,    # bucketed packing: full oracle
        "q1_pricing": _q_q1_pricing,
        "top_orders_per_customer": _q_top_orders_per_customer,
        "ann_topk": _q_ann_topk,
        "embedding_uniqueitems": _q_embedding_uniqueitems,
        "asof_purchase_before_click": _q_asof_purchase_before_click,
        "session_stats": _q_session_stats,
        "events_hourly": _q_events_hourly,
        "orders_by_month": _q_orders_by_month,
        "q3_building_revenue": _q_q3_building_revenue,
        "lang_guess_counts": _q_lang_guess_counts,
        "nchars_histogram": _q_nchars_histogram,
        "minhash_pairs": _q_minhash_pairs,      # portable md5 hash: full oracle
        "minhash_pairs_capped": _q_minhash_pairs_capped,  # bucket-cap: full oracle
        "minhash_pairs_capped_sampled": _q_minhash_pairs_capped_sampled,
        "near_dup_components": _q_near_dup_components,  # CC over pairs: full oracle
        "simhash_groups": _q_simhash_groups,    # portable md5 hash: full oracle
        "simhash_near_pairs": _q_simhash_near_pairs,  # banded hamming: full oracle
        "embedding_near_dups": _q_embedding_near_dups,
        "users_click_and_purchase": _q_users_click_and_purchase,
        "event_value_percentiles": _q_event_value_percentiles,
        "suppliers_per_region": _q_suppliers_per_region,
        "ann_topk_lsh": _q_ann_topk_lsh,
        "ann_topk_ivf": _q_ann_topk_ivf,
        "events_props_violations": _q_events_props_violations,
        "suite_conformance": _q_suite_conformance,  # rows-only; 0 rows = pass
        "suite_conformance_variant": _q_suite_conformance_variant,    # JVM path
        "suite_conformance_columnar": _q_suite_conformance_columnar,  # JVM path
        "quality_scores": _q_quality_scores,
        "ngram_vocab": _q_ngram_vocab,
        "winnow_fingerprints": _q_winnow_fingerprints,
        "media_meta": _q_media_meta,                  # full oracle
        "media_frame_samples": _q_media_frame_samples,  # golden-file oracle
        "media_image_features": _q_media_image_features,  # golden-file oracle
        "media_audio_features": _q_media_audio_features,  # golden-file oracle
        "distinct_sources_per_lang": _q_distinct_sources_per_lang,
        "drift_click_vs_purchase": _q_drift_click_vs_purchase,
    }


# ---------------------------------------------------------------------------
# DuckDB oracles (same column names, same rounding)
# ---------------------------------------------------------------------------

import os as _os

_MEDIA_GOLDEN_DIR = _os.path.join(
    _os.path.dirname(_os.path.abspath(__file__)), "fixtures", "media_golden")

_VALID_DOC_EXPR = """
    (doc_id IS NOT NULL AND text IS NOT NULL AND lang IS NOT NULL)
    AND (doc_id IS NULL OR doc_id >= 0)
    AND (text IS NULL OR length(text) >= 1)
    AND (lang IS NULL OR lang IN ('en','es','zh'))
    AND (source IS NULL OR regexp_matches(source, '^src[0-9]+$'))
    AND (n_chars IS NULL OR (n_chars >= 0 AND n_chars <= 400))
"""


def _ivf_topk_oracle() -> str:
    from json_schema_lean_spark.operators.similarity import (
        ivf_topk_fixed_oracle_sql,
    )
    return ivf_topk_fixed_oracle_sql("embeddings", "vec_id < 5",
                                     "vec_id < 16", k=5, nprobe=4)


def _lsh_topk_oracle() -> str:
    from json_schema_lean_spark.operators.similarity import lsh_topk_oracle_sql
    return lsh_topk_oracle_sql("embeddings", "vec_id < 5", dim=64, k=5)


def _lsh_near_dup_oracle() -> str:
    """DuckDB replica of the banded hyperplane-LSH near-dup pipeline (same
    literal planes + integer quantization as _q_embedding_near_dups)."""
    from json_schema_lean_spark.operators.similarity import (
        lsh_near_dup_oracle_sql,
    )
    return lsh_near_dup_oracle_sql("embeddings", dim=64, threshold=0.45,
                                   bands=12, planes_per_band=4)


def _minhash_cte(k: int = 32, bands: int = 16,
                 cap: Optional[int] = None,
                 cap_method: str = "exact") -> str:
    """Shared DuckDB CTE prefix reproducing the portable-hash MinHash-LSH
    candidate pipeline (same md5-based hashes, same banding) up to the
    ``pairs``/``dg`` relations; composed by the pairs and components
    oracles. ``cap`` reproduces dedup.cap_bucket_rows: ``cap_method`` picks
    the deterministic per-bucket prefix (row_number over (band, bucket)
    ordered by doc_id — "exact") or the hash-modulo survivor set
    (portable_hash64(doc_id) % ceil(n/cap) == 0 — "sampled", the
    scale-robust mode actually recommended at 100 TB, here reproduced
    value-exactly because the survivor hash is the same md5 construction
    DuckDB can compute)."""
    h = "CAST(('0x' || substr(md5({x}), 1, 15)) AS BIGINT)"
    mins = ",\n               ".join(
        "list_min(list_transform(g, x -> "
        + h.format(x=f"x || '#{i}'") + "))"
        for i in range(k))
    rpb = k // bands
    cap_clause = ""
    sampled_ctes = ""
    banded_name = "banded"
    if cap is not None and cap_method == "exact":
        cap_clause = (f"QUALIFY row_number() OVER (PARTITION BY bb.band, "
                      f"bucket ORDER BY s.doc_id) <= {cap}")
    elif cap is not None and cap_method == "sampled":
        banded_name = "banded_all"
        surv = h.format(x="CAST(ba.doc_id AS VARCHAR)")
        sampled_ctes = f""",
        bsz AS (
          SELECT band, bucket, count(*) AS n
          FROM banded_all GROUP BY band, bucket
          HAVING count(*) > {cap}),
        banded AS (
          SELECT ba.doc_id, ba.band, ba.bucket
          FROM banded_all ba
          LEFT JOIN bsz ON ba.band = bsz.band AND ba.bucket = bsz.bucket
          WHERE bsz.n IS NULL
             OR ({surv} % CAST(ceil(bsz.n / {cap}.0) AS BIGINT)) = 0)"""
    elif cap is not None:
        raise ValueError(f"unknown cap_method {cap_method!r}")
    return f"""toks AS (
          SELECT doc_id, string_split_regex(trim(lower(text)), '\\s+') AS t
          FROM documents),
        grams AS (
          SELECT doc_id,
                 CASE WHEN len(t) < 3 THEN [array_to_string(t, ' ')]
                      ELSE list_transform(range(1, len(t) - 1),
                           i -> array_to_string(t[i:i+2], ' '))
                 END AS g
          FROM toks),
        sigs AS (
          SELECT doc_id,
               [{mins}] AS sig
          FROM grams),
        {banded_name} AS (
          SELECT s.doc_id, bb.band,
                 {h.format(x=f"array_to_string(sig[bb.band*{rpb}+1 : bb.band*{rpb}+{rpb}], ',')")} AS bucket
          FROM sigs s, (SELECT unnest(range(0, {bands})) AS band) bb
          {cap_clause}){sampled_ctes},
        pairs AS (
          SELECT DISTINCT l.doc_id AS id_a, r.doc_id AS id_b
          FROM banded l JOIN banded r
            ON l.band = r.band AND l.bucket = r.bucket AND l.doc_id < r.doc_id),
        dg AS (SELECT doc_id, list_distinct(g) AS dgrams FROM grams)"""


def _minhash_oracle_sql(k: int = 32, bands: int = 16) -> str:
    """Candidate pairs + exact Jaccard over the shared MinHash CTEs."""
    return f"""
        WITH {_minhash_cte(k, bands)}
        SELECT p.id_a, p.id_b,
               round(CASE WHEN (len(a.dgrams) + len(b.dgrams)
                               - len(list_intersect(a.dgrams, b.dgrams))) > 0
                          THEN len(list_intersect(a.dgrams, b.dgrams))::DOUBLE
                               / (len(a.dgrams) + len(b.dgrams)
                                  - len(list_intersect(a.dgrams, b.dgrams)))
                          ELSE 0.0 END, 6) AS jaccard
        FROM pairs p
        JOIN dg a ON a.doc_id = p.id_a
        JOIN dg b ON b.doc_id = p.id_b
    """


def _near_dup_components_oracle_sql(k: int = 32, bands: int = 16) -> str:
    """Transitive closure over the SAME candidate pairs via a recursive CTE
    (tractable at oracle scale; the Spark side uses pointer-jumping min
    propagation instead — closure materialization is quadratic per
    component and would not survive 100 TB)."""
    return f"""
        WITH RECURSIVE {_minhash_cte(k, bands)},
        e2 AS (
          SELECT id_a AS a, id_b AS b FROM pairs
          UNION
          SELECT id_b, id_a FROM pairs),
        reach(a, b) AS (
          SELECT a, b FROM e2
          UNION
          SELECT r.a, e.b FROM reach r JOIN e2 e ON r.b = e.a
        )
        SELECT a AS doc_id,
               CAST(least(a, min(b)) AS BIGINT) AS component
        FROM reach GROUP BY a
    """


def _simhash_cte(ngram: int = 2) -> str:
    """Shared DuckDB CTE prefix computing the portable-hash SimHash per doc
    (bits 0..59; the md5-based hash has 60 effective bits) up to the ``sh``
    relation; composed by the grouping and near-pairs oracles."""
    h = "CAST(('0x' || substr(md5(gram), 1, 15)) AS BIGINT)"
    bit_terms = " + ".join(
        f"(CASE WHEN 2 * sum((h >> {b}) & 1) >= count(*) THEN 1 ELSE 0 END) "
        f"* {2 ** b}::BIGINT"
        for b in range(60))
    return f"""toks AS (
          SELECT doc_id, string_split_regex(trim(lower(text)), '\\s+') AS t
          FROM documents),
        grams AS (
          SELECT doc_id,
                 CASE WHEN len(t) < {ngram} THEN [array_to_string(t, ' ')]
                      ELSE list_transform(range(1, len(t) - {ngram - 2}),
                           i -> array_to_string(t[i:i+{ngram - 1}], ' '))
                 END AS g
          FROM toks),
        hv AS (
          SELECT doc_id, {h} AS h
          FROM (SELECT doc_id, unnest(g) AS gram FROM grams)),
        sh AS (
          SELECT doc_id, {bit_terms} AS simhash
          FROM hv GROUP BY doc_id)"""


def _simhash_oracle_sql(ngram: int = 2) -> str:
    """Identical-fingerprint grouping over the shared SimHash CTEs."""
    return f"""
        WITH {_simhash_cte(ngram)}
        SELECT simhash, count(*) AS n_rows, min(doc_id) AS keep_id
        FROM sh GROUP BY simhash
    """


def _simhash_near_pairs_oracle_sql(max_hamming: int = 3, bands: int = 4,
                                   ngram: int = 2) -> str:
    """Banded Hamming near-pairs over the shared SimHash CTEs (pigeonhole
    banding + bit_count(xor) verify — mirrors dedup.simhash_near_pairs)."""
    w = 60 // bands
    mask = (1 << w) - 1
    return f"""
        WITH {_simhash_cte(ngram)},
        banded AS (
          SELECT doc_id, simhash, bb.band,
                 (simhash >> ({w} * bb.band)) & {mask} AS key
          FROM sh, (SELECT unnest(range(0, {bands})) AS band) bb),
        cand AS (
          SELECT DISTINCT l.doc_id AS id_a, r.doc_id AS id_b,
                 l.simhash AS sa, r.simhash AS sb
          FROM banded l JOIN banded r
            ON l.band = r.band AND l.key = r.key AND l.doc_id < r.doc_id)
        SELECT id_a, id_b,
               CAST(bit_count(xor(sa, sb)) AS INT) AS hamming
        FROM cand
        WHERE bit_count(xor(sa, sb)) <= {max_hamming}
    """


def oracle_sql() -> dict[str, str]:
    return {
        "media_meta": """
            WITH refs AS (
              SELECT 'asset://' || doc_id AS media_ref FROM documents
            ), blobs AS (
              SELECT media_ref,
                     CASE (ascii(substr(md5(media_ref), 1, 1)) % 3)
                       WHEN 0 THEN 'image' WHEN 1 THEN 'audio'
                       ELSE 'video' END AS media_kind,
                     repeat(sha256(media_ref), 4) AS blob
              FROM refs
            )
            SELECT media_ref, media_kind,
                   CAST(length(blob) AS BIGINT) AS n_bytes,
                   sha256(blob) AS content_sha256
            FROM blobs
        """,
        # media golden-file oracles (VERDICT r3 #3): expected rows computed
        # OUTSIDE Spark by scripts/build_media_golden.py (plain Python over
        # the same pure decoders) and committed as parquet; the Spark side
        # must reproduce them exactly through its mapInPandas plumbing.
        # Floats: golden stores raw doubles, both engines round(x, 6).
        "media_image_features": f"""
            SELECT media_ref, width, height, channels,
                   round(mean_luma, 6) AS mean_luma,
                   round(sharpness, 6) AS sharpness
            FROM read_parquet('{_MEDIA_GOLDEN_DIR}/image_features.parquet')
        """,
        "media_audio_features": f"""
            SELECT media_ref, sample_rate, n_samples, round(rms, 6) AS rms
            FROM read_parquet('{_MEDIA_GOLDEN_DIR}/audio_features.parquet')
        """,
        "media_frame_samples": f"""
            SELECT media_ref, frame_idx, frame_sha256
            FROM read_parquet('{_MEDIA_GOLDEN_DIR}/frame_samples.parquet')
        """,
        "minhash_pairs": _minhash_oracle_sql(32, 16),
        "minhash_pairs_capped": f"""
            WITH {_minhash_cte(32, 16, cap=2)}
            SELECT id_a, id_b FROM pairs
        """,
        "minhash_pairs_capped_sampled": f"""
            WITH {_minhash_cte(32, 16, cap=2, cap_method="sampled")}
            SELECT id_a, id_b FROM pairs
        """,
        "near_dup_components": _near_dup_components_oracle_sql(32, 16),
        "simhash_groups": _simhash_oracle_sql(2),
        "simhash_near_pairs": _simhash_near_pairs_oracle_sql(8, 12, 2),
        "validate_documents": f"""
            SELECT doc_id, ({_VALID_DOC_EXPR}) AS valid FROM documents
        """,
        "violations_by_keyword": f"""
            WITH v AS (
              SELECT 'required' AS keyword, count(*) AS n FROM documents
                WHERE doc_id IS NULL OR text IS NULL OR lang IS NULL
              UNION ALL
              SELECT 'minimum', count(*) FROM documents WHERE doc_id < 0
              UNION ALL
              SELECT 'minLength', count(*) FROM documents
                WHERE text IS NOT NULL AND length(text) < 1
              UNION ALL
              SELECT 'enum', count(*) FROM documents
                WHERE lang IS NOT NULL AND lang NOT IN ('en','es','zh')
              UNION ALL
              SELECT 'pattern', count(*) FROM documents
                WHERE source IS NOT NULL AND NOT regexp_matches(source, '^src[0-9]+$')
              UNION ALL
              SELECT 'maximum', count(*) FROM documents
                WHERE n_chars IS NOT NULL AND n_chars > 400
              UNION ALL
              SELECT 'minimum', count(*) FROM documents
                WHERE n_chars IS NOT NULL AND n_chars < 0
            )
            SELECT keyword, sum(n)::BIGINT AS n FROM v GROUP BY keyword HAVING sum(n) > 0
        """,
        "events_props_violations": """
            WITH typed AS (
                SELECT event_id,
                       TRY_CAST(props AS JSON) AS pj,
                       TRY_CAST(props AS JSON) IS NOT NULL AS parsed,
                       json_type(TRY_CAST(props AS JSON)) AS roottype,
                       list_contains(json_keys(TRY_CAST(props AS JSON)),
                                     'k') AS has_k,
                       json_type(TRY_CAST(props AS JSON), '$.k') AS ktype,
                       TRY_CAST(json_extract_string(TRY_CAST(props AS JSON),
                                                    '$.k') AS DOUBLE) AS kval
                FROM events
                WHERE props IS NOT NULL   -- NULL input -> NULL verdict row
            ), intk AS (
                SELECT *,
                       (ktype IN ('BIGINT', 'UBIGINT')
                        OR (ktype = 'DOUBLE' AND isfinite(kval)
                            AND kval = floor(kval))) AS k_is_int
                FROM typed
            )
            SELECT event_id, '$parse' AS keyword, '' AS json_pointer
            FROM intk WHERE NOT parsed
            UNION ALL
            SELECT event_id, 'type', ''
            FROM intk WHERE parsed AND roottype != 'OBJECT'
            UNION ALL
            SELECT event_id, 'required', ''
            FROM intk WHERE parsed AND roottype = 'OBJECT' AND NOT has_k
            UNION ALL
            SELECT event_id, 'type', '/k'
            FROM intk WHERE parsed AND roottype = 'OBJECT' AND has_k
                        AND NOT k_is_int
            UNION ALL
            SELECT event_id, 'minimum', '/k'
            FROM intk WHERE parsed AND roottype = 'OBJECT' AND has_k
                        AND k_is_int AND kval < 1
            UNION ALL
            SELECT event_id, 'maximum', '/k'
            FROM intk WHERE parsed AND roottype = 'OBJECT' AND has_k
                        AND k_is_int AND kval > 50
        """,
        "validate_events_props": """
            SELECT event_id,
                   (json_extract(props::JSON, '$.k') IS NOT NULL
                    AND json_type(props::JSON, '$.k') IN ('BIGINT','UBIGINT')
                    AND CAST(json_extract_string(props::JSON, '$.k') AS BIGINT) >= 1
                   ) AS valid
            FROM events
        """,
        "doc_numeric_stats": """
            SELECT 'doc_id' AS "column", count(doc_id) AS n,
                   sum(CASE WHEN doc_id IS NULL THEN 1 ELSE 0 END)::BIGINT AS n_null,
                   round(min(doc_id)::DOUBLE, 6) AS min_value,
                   round(max(doc_id)::DOUBLE, 6) AS max_value,
                   round(avg(doc_id), 6) AS mean_value,
                   round(var_pop(doc_id), 6) AS var_value
            FROM documents
            UNION ALL
            SELECT 'n_chars', count(n_chars),
                   sum(CASE WHEN n_chars IS NULL THEN 1 ELSE 0 END)::BIGINT,
                   round(min(n_chars)::DOUBLE, 6), round(max(n_chars)::DOUBLE, 6),
                   round(avg(n_chars), 6), round(var_pop(n_chars), 6)
            FROM documents
        """,
        "uniqueness_doc_id": """
            SELECT sum(cnt)::BIGINT AS total_rows,
                   count(*)::BIGINT AS distinct_keys,
                   sum(CASE WHEN cnt > 1 THEN cnt ELSE 0 END)::BIGINT AS rows_in_dup_keys
            FROM (SELECT doc_id, count(*) AS cnt FROM documents GROUP BY doc_id)
        """,
        "exact_dup_groups": """
            SELECT md5(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g')) AS fp,
                   min(doc_id) AS keep_id, count(*) AS n_rows
            FROM documents GROUP BY 1
        """,
        "dangling_partkeys": """
            SELECT l_partkey, count(*) AS n_refs
            FROM lineitem l
            WHERE l_partkey IS NOT NULL
              AND NOT EXISTS (SELECT 1 FROM part p WHERE p.p_partkey = l.l_partkey)
            GROUP BY l_partkey
        """,
        "token_counts": """
            SELECT doc_id,
                   CASE WHEN trim(text) = '' THEN 0
                        ELSE length(string_split_regex(trim(text), '\\s+')) END::BIGINT
                     AS n_tokens,
                   length(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]'))::BIGINT
                     AS n_subtokens
            FROM documents
        """,
        "quality_ratios": """
            SELECT doc_id,
                   round(CASE WHEN length(text) > 0
                              THEN length(regexp_replace(text, '[^.,;:!?]', '', 'g'))::DOUBLE
                                   / length(text)
                              ELSE 0.0 END, 6) AS punct_ratio,
                   round(CASE WHEN length(string_split_regex(trim(lower(text)), '\\s+')) > 0
                              THEN len(list_filter(string_split_regex(trim(lower(text)), '\\s+'),
                                       t -> t IN ('the','a','an','and','or','of','to','in','is','it')))::DOUBLE
                                   / length(string_split_regex(trim(lower(text)), '\\s+'))
                              ELSE 0.0 END, 6) AS stopword_ratio
            FROM documents
        """,
        "fingerprints": """
            SELECT doc_id,
                   md5(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g')) AS fp
            FROM documents
        """,
        "pii_scan": """
            SELECT doc_id,
                   len(regexp_extract_all(text,
                       '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}'))::BIGINT
                       AS n_email,
                   len(regexp_extract_all(text,
                       '\\b(\\d{1,3}\\.){3}\\d{1,3}\\b'))::BIGINT AS n_ipv4,
                   len(regexp_extract_all(text,
                       '\\+?\\d[\\d -]{7,}\\d'))::BIGINT AS n_phone,
                   (length(regexp_replace(regexp_replace(regexp_replace(text,
                        '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}',
                        '<EMAIL>', 'g'),
                        '\\b(\\d{1,3}\\.){3}\\d{1,3}\\b', '<IPV4>', 'g'),
                        '\\+?\\d[\\d -]{7,}\\d', '<PHONE>', 'g'))
                    - length(text))::BIGINT AS redact_len_delta
            FROM documents
        """,
        "decontam_overlap": """
            WITH toks AS (
                SELECT doc_id,
                       string_split_regex(lower(trim(text)), '\\s+') AS tk
                FROM documents
            ), grams AS (
                SELECT doc_id, unnest(list_distinct(
                           CASE WHEN len(tk) < 8
                                THEN [array_to_string(tk, ' ')]
                                ELSE list_transform(range(1, len(tk) - 6),
                                     i -> array_to_string(
                                              list_slice(tk, i, i + 7), ' '))
                           END)) AS gram
                FROM toks
            ), totals AS (
                SELECT doc_id, count(*) AS n_grams FROM grams GROUP BY doc_id
            ), bench AS (
                SELECT DISTINCT gram FROM grams WHERE doc_id % 20 = 0
            ), matched AS (
                SELECT g.doc_id, count(*) AS n_matched
                FROM grams g JOIN bench USING (gram)
                GROUP BY g.doc_id
            )
            SELECT t.doc_id, t.n_grams::BIGINT AS n_grams,
                   COALESCE(m.n_matched, 0)::BIGINT AS n_matched,
                   round(COALESCE(m.n_matched, 0)::DOUBLE / t.n_grams, 6)
                       AS overlap_frac
            FROM totals t LEFT JOIN matched m USING (doc_id)
        """,
        "gopher_quality": """
            WITH t AS (
                SELECT doc_id, text,
                       string_split_regex(lower(trim(text)), '\\s+') AS toks,
                       CASE WHEN trim(text) = '' THEN 0
                            ELSE length(string_split_regex(trim(text), '\\s+'))
                       END AS n_tokens
                FROM documents
            ), g AS (
                SELECT doc_id, text, n_tokens,
                       CASE WHEN len(toks) < 2
                            THEN [array_to_string(toks, ' ')]
                            ELSE list_transform(range(1, len(toks)),
                                 i -> array_to_string(
                                          list_slice(toks, i, i + 1), ' '))
                       END AS grams,
                       string_split(text, chr(10)) AS lines
                FROM t
            )
            SELECT doc_id,
                   round((len(grams) - len(list_distinct(grams)))::DOUBLE
                         / len(grams), 6) AS bigram_rep,
                   round(CASE WHEN n_tokens = 0 THEN 0.0
                              ELSE length(regexp_replace(text, '\\s', '', 'g'))::DOUBLE
                                   / n_tokens END, 6) AS mean_word_len,
                   round(CASE WHEN n_tokens = 0 THEN 0.0
                              ELSE length(regexp_replace(text,
                                       '[A-Za-z0-9\\s]', '', 'g'))::DOUBLE
                                   / n_tokens END, 6) AS symbol_ratio,
                   round((len(lines) - len(list_distinct(lines)))::DOUBLE
                         / len(lines), 6) AS rep_line_frac,
                   CASE WHEN length(text) = 0 THEN 0.0
                        ELSE round(log2(length(text)) -
                             list_sum(list_transform(
                                 list_transform(
                                     list_distinct(string_split(text, '')),
                                     c -> len(list_filter(
                                              string_split(text, ''),
                                              x -> x = c))),
                                 c -> c * log2(c))) / length(text), 6)
                   END AS char_entropy_bits
            FROM g
        """,
        "stratified_sample": """
            SELECT doc_id, lang
            FROM documents
            WHERE CAST(('0x' || substr(md5(doc_id::VARCHAR || '#sample'), 1, 15))
                       AS BIGINT) % 1000000 <
                  CASE lang WHEN 'en' THEN 500000
                            WHEN 'zh' THEN 800000
                            WHEN 'es' THEN 250000
                            ELSE 100000 END
        """,
        "pack_batches": """
            WITH t AS (
                SELECT doc_id,
                       CASE WHEN trim(text) = '' THEN 0
                            ELSE length(string_split_regex(trim(text), '\\s+'))
                       END::BIGINT AS n_tokens,
                       CAST(('0x' || substr(md5(doc_id::VARCHAR), 1, 15))
                            AS BIGINT) % 16 AS bucket
                FROM documents
            ), c AS (
                SELECT bucket, doc_id, n_tokens,
                       COALESCE(SUM(n_tokens) OVER (
                           PARTITION BY bucket ORDER BY doc_id
                           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
                       ), 0) AS cum
                FROM t
            )
            SELECT bucket, (cum // 512)::BIGINT AS batch_id,
                   COUNT(*)::BIGINT AS n_docs,
                   SUM(n_tokens)::BIGINT AS batch_tokens
            FROM c
            GROUP BY bucket, (cum // 512)::BIGINT
        """,
        "q1_pricing": """
            SELECT l_returnflag, l_linestatus,
                   round(sum(l_quantity), 4) AS sum_qty,
                   round(sum(l_extendedprice), 4) AS sum_base_price,
                   round(sum(l_extendedprice * (1 - l_discount)), 4) AS sum_disc_price,
                   round(avg(l_quantity), 6) AS avg_qty,
                   count(*) AS count_order
            FROM lineitem
            WHERE l_shipdate <= TIMESTAMP '1998-09-01'
            GROUP BY l_returnflag, l_linestatus
        """,
        "top_orders_per_customer": """
            SELECT o_custkey, o_orderkey, rk FROM (
              SELECT o_custkey, o_orderkey,
                     row_number() OVER (PARTITION BY o_custkey
                                        ORDER BY o_totalprice DESC, o_orderkey ASC) AS rk
              FROM orders)
            WHERE rk <= 3
        """,
        "ann_topk": """
            WITH q AS (SELECT vec_id AS query_id, embedding::DOUBLE[] AS qv
                       FROM embeddings WHERE vec_id < 5),
                 c AS (SELECT vec_id AS neighbor_id, embedding::DOUBLE[] AS cv
                       FROM embeddings),
                 scored AS (
                   SELECT q.query_id, c.neighbor_id,
                          list_cosine_similarity(c.cv, q.qv) AS score
                   FROM c, q WHERE c.neighbor_id <> q.query_id)
            SELECT query_id, neighbor_id, rk AS rank FROM (
              SELECT query_id, neighbor_id,
                     row_number() OVER (PARTITION BY query_id
                                        ORDER BY score DESC, neighbor_id ASC) AS rk
              FROM scored)
            WHERE rk <= 5
        """,
        "embedding_uniqueitems": """
            SELECT vec_id,
                   (embedding IS NULL OR
                    (len(list_distinct(embedding)) = len(embedding)
                     AND len(embedding) >= 1)) AS valid
            FROM embeddings
        """,
        "asof_purchase_before_click": """
            SELECT c.event_id, round(p.value, 6) AS asof_value
            FROM (SELECT * FROM events WHERE event_type = 'click') c
            ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'purchase') p
              ON c.user_id = p.user_id AND c.ts >= p.ts
        """,
        "session_stats": """
            WITH ordered AS (
              SELECT user_id, ts,
                     lag(ts) OVER (PARTITION BY user_id
                                   ORDER BY ts ASC, event_id ASC) AS prev_ts
              FROM events),
            flagged AS (
              SELECT user_id,
                     CASE WHEN prev_ts IS NULL
                            OR epoch(ts) - epoch(prev_ts) > 1800
                          THEN 1 ELSE 0 END AS new_session
              FROM ordered)
            SELECT user_id,
                   sum(new_session)::BIGINT AS n_sessions,
                   count(*) AS n_events
            FROM flagged GROUP BY user_id
        """,
        "events_hourly": """
            SELECT date_trunc('hour', ts) AS window_start,
                   count(*) AS n,
                   round(sum(value), 6) AS sum_value,
                   round(avg(value), 6) AS avg_value
            FROM events GROUP BY 1
        """,
        "orders_by_month": """
            SELECT year(o_orderdate)::INT AS yr, month(o_orderdate)::INT AS mo,
                   count(*) AS n_orders, round(sum(o_totalprice), 4) AS revenue
            FROM orders GROUP BY 1, 2
        """,
        "q3_building_revenue": """
            SELECT l_orderkey,
                   round(sum(l_extendedprice * (1 - l_discount)), 4) AS revenue
            FROM lineitem l
            JOIN orders o ON l.l_orderkey = o.o_orderkey
            JOIN customer c ON o.o_custkey = c.c_custkey
            WHERE c.c_mktsegment = 'BUILDING'
            GROUP BY l_orderkey
            ORDER BY revenue DESC, l_orderkey ASC
            LIMIT 10
        """,
        "lang_guess_counts": """
            WITH toks AS (
              SELECT doc_id,
                     string_split_regex(trim(lower(text)), '\\s+') AS t
              FROM documents),
            scored AS (
              SELECT doc_id,
                     len(list_filter(t, x -> x IN ('the','and','of','to','is'))) AS s_en,
                     len(list_filter(t, x -> x IN ('el','la','de','que','los'))) AS s_es,
                     len(list_filter(t, x -> x IN ('le','la','les','des','est'))) AS s_fr,
                     len(list_filter(t, x -> x IN ('der','die','und','das','ist'))) AS s_de
              FROM toks),
            guessed AS (
              SELECT CASE
                       WHEN greatest(s_en, s_es, s_fr, s_de) = 0 THEN 'und'
                       WHEN s_en = greatest(s_en, s_es, s_fr, s_de) THEN 'en'
                       WHEN s_es = greatest(s_en, s_es, s_fr, s_de) THEN 'es'
                       WHEN s_fr = greatest(s_en, s_es, s_fr, s_de) THEN 'fr'
                       ELSE 'de' END AS guessed
              FROM scored)
            SELECT guessed, count(*) AS n FROM guessed GROUP BY guessed
        """,
        "nchars_histogram": """
            SELECT least(greatest(floor(n_chars / 25.0), 0), 23)::INT AS bucket,
                   count(*) AS n
            FROM documents
            WHERE n_chars IS NOT NULL
            GROUP BY 1
        """,
        "embedding_near_dups": _lsh_near_dup_oracle(),
        "ann_topk_lsh": _lsh_topk_oracle(),
        "ann_topk_ivf": _ivf_topk_oracle(),
        "suppliers_per_region": """
            SELECT r.r_name,
                   count(*)::BIGINT AS n_suppliers,
                   round(avg(s.s_acctbal), 6) AS avg_acctbal
            FROM supplier s
            JOIN nation n ON s.s_nationkey = n.n_nationkey
            JOIN region r ON n.n_regionkey = r.r_regionkey
            GROUP BY r.r_name
        """,
        "users_click_and_purchase": """
            SELECT user_id FROM events WHERE event_type = 'click'
            INTERSECT
            SELECT user_id FROM events WHERE event_type = 'purchase'
        """,
        "event_value_percentiles": """
            SELECT round(quantile_cont(value, 0.5), 6) AS p50,
                   round(quantile_cont(value, 0.9), 6) AS p90,
                   round(quantile_cont(value, 0.99), 6) AS p99
            FROM events
        """,
        "quality_scores": """
            WITH parts AS (
              SELECT doc_id,
                CASE WHEN length(text) BETWEEN 20 AND 10000 THEN 1.0
                     WHEN length(text) > 0 THEN 0.5 ELSE 0.0 END AS len_ok,
                CASE WHEN length(text) > 0
                     THEN length(regexp_replace(text, '[^.,;:!?]', '', 'g'))::DOUBLE
                          / length(text)
                     ELSE 0.0 END AS pr,
                CASE WHEN len(string_split_regex(trim(lower(text)), '\\s+')) > 0
                     THEN len(list_filter(string_split_regex(trim(lower(text)), '\\s+'),
                              t -> t IN ('the','a','an','and','or','of','to','in','is','it')))::DOUBLE
                          / len(string_split_regex(trim(lower(text)), '\\s+'))
                     ELSE 0.0 END AS sr
              FROM documents)
            SELECT doc_id,
                   round((len_ok
                          + (1.0 - least(pr * 5.0, 1.0))
                          + (1.0 - least(abs(sr - 0.2) * 2.0, 1.0))) / 3.0, 6)
                     AS quality
            FROM parts
        """,
        "distinct_sources_per_lang": """
            SELECT lang, count(DISTINCT source)::BIGINT AS n_distinct
            FROM documents GROUP BY lang
        """,
        "drift_click_vs_purchase": """
            WITH base AS (
              SELECT least(greatest(CAST(floor((value - 0.0) / 25.0) AS INT),
                                    0), 7) AS bucket,
                     CASE WHEN event_type = 'click' THEN 1 ELSE 0 END AS is_a
              FROM events
              WHERE event_type IN ('click', 'purchase') AND value IS NOT NULL),
            hist AS (
              SELECT bucket, SUM(is_a) AS cnt_a, SUM(1 - is_a) AS cnt_b
              FROM base GROUP BY bucket),
            cum AS (
              SELECT cnt_a, cnt_b,
                     SUM(cnt_a) OVER (ORDER BY bucket) AS ca,
                     SUM(cnt_b) OVER (ORDER BY bucket) AS cb,
                     SUM(cnt_a) OVER () AS na,
                     SUM(cnt_b) OVER () AS nb
              FROM hist)
            SELECT max(na)::BIGINT AS n_a,
                   max(nb)::BIGINT AS n_b,
                   round(max(abs(ca * 1.0 / na - cb * 1.0 / nb)), 6) AS ks_stat,
                   round(sum(
                     pow(cnt_a - (cnt_a + cnt_b) * na * 1.0 / (na + nb), 2)
                       / ((cnt_a + cnt_b) * na * 1.0 / (na + nb))
                     + pow(cnt_b - (cnt_a + cnt_b) * nb * 1.0 / (na + nb), 2)
                       / ((cnt_a + cnt_b) * nb * 1.0 / (na + nb))), 6)
                     AS chi2_stat,
                   greatest(count(*) - 1, 1)::BIGINT AS dof
            FROM cum
        """,
        "winnow_fingerprints": """
            WITH norm AS (
              SELECT doc_id,
                     regexp_replace(lower(trim(text)), '\\s+', ' ', 'g') AS s
              FROM documents),
            grams AS (
              SELECT doc_id,
                     CASE WHEN length(s) < 5 THEN [s]
                          ELSE list_transform(range(1, length(s) - 3),
                               i -> substr(s, i, 5))
                     END AS g
              FROM norm)
            SELECT doc_id,
                   list_min(list_transform(g,
                     x -> CAST(('0x' || substr(md5(x), 1, 15)) AS BIGINT)))
                     AS winnow_fp
            FROM grams
        """,
        "ngram_vocab": """
            WITH toks AS (
              SELECT string_split_regex(trim(lower(text)), '\\s+') AS t
              FROM documents),
            grams AS (
              SELECT unnest(CASE WHEN len(t) < 3 THEN [array_to_string(t, ' ')]
                                 ELSE list_transform(range(1, len(t) - 1),
                                      i -> array_to_string(t[i:i+2], ' '))
                            END) AS ngram
              FROM toks)
            SELECT ngram, count(*) AS n FROM grams GROUP BY ngram
            HAVING count(*) >= 3
        """,
    }
