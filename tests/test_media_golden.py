"""Golden-file oracles for the media driver queries (VERDICT r3 #3).

The fixtures under fixtures/media_golden/ are built OUTSIDE Spark by
scripts/build_media_golden.py (plain Python over the same pure decoders);
these tests pin (a) that the committed fixtures are exactly what the
builder produces today — a decoder change without a fixture rebuild fails
here, not silently in the driver gate — and (b) that every driver query
has matching queries()/oracle_sql() coverage.
"""

import os

import pyarrow.parquet as pq

import __spark_entry__ as entry
from scripts.build_media_golden import (
    OUT_DIR,
    build_audio,
    build_frames,
    build_image,
)


def test_committed_golden_matches_builder():
    for name, fresh in [("image_features", build_image()),
                        ("audio_features", build_audio()),
                        ("frame_samples", build_frames())]:
        path = os.path.join(OUT_DIR, f"{name}.parquet")
        committed = pq.read_table(path)
        assert committed.schema.equals(fresh.schema), name
        assert committed.equals(fresh), (
            f"{name}: decoders or synth params changed — re-run "
            "scripts/build_media_golden.py")


def test_golden_row_counts():
    assert pq.read_metadata(
        os.path.join(OUT_DIR, "image_features.parquet")).num_rows == 96
    assert pq.read_metadata(
        os.path.join(OUT_DIR, "audio_features.parquet")).num_rows == 96
    assert pq.read_metadata(
        os.path.join(OUT_DIR, "frame_samples.parquet")).num_rows == 179


def test_media_queries_have_oracles():
    oracles = entry.oracle_sql()
    qs = entry.queries()
    for name in ("media_image_features", "media_audio_features",
                 "media_frame_samples", "media_meta"):
        assert name in qs
        assert name in oracles, f"{name} lost its oracle"
    # every oracle key must name a query
    assert set(oracles) <= set(qs)


def test_conformance_gate_queries_registered():
    qs = entry.queries()
    for name in ("suite_conformance", "suite_conformance_variant",
                 "suite_conformance_columnar"):
        assert name in qs
    rows, remotes = entry._load_suite_verdicts()
    assert len(rows) >= 900
    assert remotes  # refremote documents pre-registered
