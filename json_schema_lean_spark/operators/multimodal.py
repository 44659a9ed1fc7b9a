"""Multimodal column plumbing (task-mandated extension).

Media payloads are opaque ``binary`` columns with typed metadata structs; the
decode / feature-extract / resize / frame-sample stages run as Arrow-batched
``mapInPandas`` transforms (the 100 TB pattern: media bytes never leave the
executor, Python sees pyarrow batches, partitioning is preserved).

The actual codecs (PIL/ffmpeg/librosa) are NOT in this container, so the
decode step is STUBBED: ``decoder="fake"`` (default) derives deterministic
pseudo-features from the bytes (hash-based — stable for tests/benchmarks);
``decoder="real"`` import-tries the codec libs and raises
``NotImplementedError`` with a clear message when absent. The Spark-side
plumbing — schemas, batch iteration, UDF signatures — is real and tested.
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MEDIA_META_SCHEMA = (
    "media_ref string, media_kind string, n_bytes long, content_sha256 string"
)

IMAGE_FEATURES_SCHEMA = (
    "media_ref string, width int, height int, channels int, "
    "mean_luma double, sharpness double"
)

AUDIO_FEATURES_SCHEMA = (
    "media_ref string, sample_rate int, n_samples long, rms double"
)

FRAME_SAMPLE_SCHEMA = (
    "media_ref string, frame_idx int, frame_sha256 string"
)


def synth_media_blobs(df: DataFrame, ref_col: str = "media_ref",
                      size: int = 256) -> DataFrame:
    """Attach a deterministic opaque binary payload per media_ref (test/bench
    stand-in for reading object-store bytes; content derives from the ref so
    re-generation is stable)."""
    blob = F.sha2(F.col(ref_col), 512).cast("binary")
    # repeat to the requested size budget (binary concat)
    reps = max(1, size // 64)
    return df.withColumn("media_bytes", F.concat(*([blob] * reps)))


def _fake_u32(data: bytes, salt: bytes) -> int:
    return int.from_bytes(hashlib.sha256(salt + data).digest()[:4], "big")


def extract_media_meta(df: DataFrame, ref_col: str = "media_ref",
                       bytes_col: str = "media_bytes",
                       kind_col: str = "media_kind") -> DataFrame:
    """Typed metadata for opaque media blobs — pure columnar (no decode)."""
    return df.select(
        F.col(ref_col).alias("media_ref"),
        F.col(kind_col).alias("media_kind"),
        F.length(F.col(bytes_col)).cast("long").alias("n_bytes"),
        F.sha2(F.col(bytes_col), 256).alias("content_sha256"),
    )


def image_features(df: DataFrame, ref_col: str = "media_ref",
                   bytes_col: str = "media_bytes",
                   decoder: str = "fake") -> DataFrame:
    """Decode + feature-extract images via mapInPandas (Arrow batches).

    decoder="real" requires PIL (absent in this container -> clear error);
    decoder="fake" emits deterministic hash-derived features with the same
    schema, keeping the distributed plumbing testable.
    """
    if decoder == "real":
        try:
            from PIL import Image  # noqa: F401
        except ImportError as e:  # pragma: no cover - env without PIL
            raise NotImplementedError(
                "real image decode needs PIL, which is not installed in this "
                "container; use decoder='fake' for plumbing tests") from e

    narrow = df.select(F.col(ref_col).alias("media_ref"),
                       F.col(bytes_col).alias("media_bytes"))

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            refs, ws, hs, cs, lumas, sharps = [], [], [], [], [], []
            for ref, data in zip(pdf["media_ref"], pdf["media_bytes"]):
                b = bytes(data) if data is not None else b""
                refs.append(ref)
                # deterministic fake decode (see module docstring)
                ws.append(64 + _fake_u32(b, b"w") % 1920)
                hs.append(64 + _fake_u32(b, b"h") % 1080)
                cs.append(3)
                lumas.append((_fake_u32(b, b"l") % 10_000) / 10_000.0)
                sharps.append((_fake_u32(b, b"s") % 10_000) / 10_000.0)
            yield pd.DataFrame({"media_ref": refs, "width": ws, "height": hs,
                                "channels": cs, "mean_luma": lumas,
                                "sharpness": sharps})

    return narrow.mapInPandas(batches, IMAGE_FEATURES_SCHEMA)


def audio_features(df: DataFrame, ref_col: str = "media_ref",
                   bytes_col: str = "media_bytes",
                   decoder: str = "fake") -> DataFrame:
    """Audio decode stub with the same mapInPandas shape."""
    if decoder == "real":
        raise NotImplementedError(
            "real audio decode needs an audio codec lib (librosa/soundfile), "
            "not installed in this container; use decoder='fake'")

    narrow = df.select(F.col(ref_col).alias("media_ref"),
                       F.col(bytes_col).alias("media_bytes"))

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            out = {"media_ref": [], "sample_rate": [], "n_samples": [], "rms": []}
            for ref, data in zip(pdf["media_ref"], pdf["media_bytes"]):
                b = bytes(data) if data is not None else b""
                out["media_ref"].append(ref)
                out["sample_rate"].append(16000)
                out["n_samples"].append(_fake_u32(b, b"n") % 10_000_000)
                out["rms"].append((_fake_u32(b, b"r") % 10_000) / 10_000.0)
            yield pd.DataFrame(out)

    return narrow.mapInPandas(batches, AUDIO_FEATURES_SCHEMA)


def sample_frames(df: DataFrame, every_n: int = 10, max_frames: int = 4,
                  ref_col: str = "media_ref",
                  bytes_col: str = "media_bytes",
                  decoder: str = "fake") -> DataFrame:
    """Frame-sampling stub: emits up to max_frames rows per video blob
    (mapInPandas fan-out — the row-expanding UDF shape)."""
    if decoder == "real":
        raise NotImplementedError(
            "real frame sampling needs ffmpeg bindings, not installed; "
            "use decoder='fake'")

    narrow = df.select(F.col(ref_col).alias("media_ref"),
                       F.col(bytes_col).alias("media_bytes"))

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            refs, idxs, shas = [], [], []
            for ref, data in zip(pdf["media_ref"], pdf["media_bytes"]):
                b = bytes(data) if data is not None else b""
                n = 1 + _fake_u32(b, b"f") % max_frames
                for i in range(n):
                    refs.append(ref)
                    idxs.append(i * every_n)
                    shas.append(hashlib.sha256(b + i.to_bytes(4, "big")).hexdigest())
            yield pd.DataFrame({"media_ref": refs, "frame_idx": idxs,
                                "frame_sha256": shas})

    return narrow.mapInPandas(batches, FRAME_SAMPLE_SCHEMA)
