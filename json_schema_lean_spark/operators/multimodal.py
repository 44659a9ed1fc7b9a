"""Multimodal column plumbing (task-mandated extension).

Media payloads are opaque ``binary`` columns with typed metadata structs; the
decode / feature-extract / resize / frame-sample stages run as Arrow-batched
``mapInPandas`` transforms (the 100 TB pattern: media bytes never leave the
executor, Python sees pyarrow batches, partitioning is preserved).

Decoders: ``decoder="real"`` genuinely decodes ONE container format per
modality with zero third-party deps — 24-bit uncompressed **BMP** for images
(hand-parsed BITMAPINFOHEADER), 16-bit PCM **WAV** for audio (stdlib
``wave``), and **YUV4MPEG2** (y4m) for video frame sampling (r3 — plain-text
header + raw planar frames, decode_y4m) — and falls back to PIL for other
image formats only if the lib exists (it doesn't in this container: such
rows yield NULL features, the robust large-pipeline behavior).
``decoder="fake"`` (default for benches) derives deterministic hash-based
pseudo-features. Deterministic generators (:func:`synth_bmp`,
:func:`synth_wav`, :func:`synth_y4m`) make every real path testable
end-to-end.
"""

from __future__ import annotations

import hashlib
import io
import math
import struct
import wave
from typing import Iterator, Optional

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
                      size: int = 256, hash_bits: int = 512) -> DataFrame:
    """Attach a deterministic opaque binary payload per media_ref (test/bench
    stand-in for reading object-store bytes; content derives from the ref so
    re-generation is stable). ``hash_bits=256`` makes the blob reproducible
    in DuckDB too (repeat(sha256(ref), size/64) — DuckDB has no sha512), so
    downstream digests can be fully SQL-oracled."""
    blob = F.sha2(F.col(ref_col), hash_bits).cast("binary")
    # repeat to the requested size budget (binary concat); the repeated unit
    # is the HEX digest string (64 chars for 256-bit), cast to utf-8 bytes
    reps = max(1, size // 64)
    # r6: blob synthesis + downstream digests are per-row CPU evaluated
    # map-side; spread small/unsplittable scans first (guide §2.5)
    from ..parallelism import scale_partitions
    return scale_partitions(df).withColumn(
        "media_bytes", F.concat(*([blob] * reps)))


def _fake_u32(data: bytes, salt: bytes) -> int:
    return int.from_bytes(hashlib.sha256(salt + data).digest()[:4], "big")


# ---------------------------------------------------------------------------
# real codecs: 24-bit BMP (hand-parsed) + 16-bit PCM WAV (stdlib wave)
# ---------------------------------------------------------------------------

def synth_bmp(width: int, height: int, seed: str = "x") -> bytes:
    """Deterministic valid 24-bit bottom-up BMP (gradient + hash noise)."""
    row_len = (width * 3 + 3) & ~3
    pixels = bytearray()
    noise = hashlib.sha256(seed.encode()).digest()
    for y in range(height):
        row = bytearray()
        for x in range(width):
            n = noise[(x + y * width) % len(noise)]
            b = (x * 255 // max(width - 1, 1)) ^ (n & 0x0F)
            g = (y * 255 // max(height - 1, 1))
            r = n
            row += bytes((b & 0xFF, g & 0xFF, r & 0xFF))
        row += b"\x00" * (row_len - len(row))
        pixels += row
    img_size = len(pixels)
    off = 14 + 40
    header = b"BM" + struct.pack("<IHHI", off + img_size, 0, 0, off)
    dib = struct.pack("<IiiHHIIiiII", 40, width, height, 1, 24, 0,
                      img_size, 2835, 2835, 0, 0)
    return header + dib + bytes(pixels)


def decode_bmp(data: bytes) -> Optional[tuple[int, int, int, float, float]]:
    """(width, height, channels, mean_luma, sharpness) for a 24-bit
    uncompressed BMP; None when the blob isn't one. mean_luma = Rec.601
    luma in [0,1]; sharpness = mean |horizontal luma gradient|."""
    try:
        if len(data) < 54 or data[:2] != b"BM":
            return None
        off, = struct.unpack_from("<I", data, 10)
        hdr_size, = struct.unpack_from("<I", data, 14)
        if hdr_size < 40:
            return None
        width, height = struct.unpack_from("<ii", data, 18)
        bpp, = struct.unpack_from("<H", data, 28)
        comp, = struct.unpack_from("<I", data, 30)
        if bpp != 24 or comp != 0 or width <= 0 or height == 0:
            return None
        flipped = height < 0
        height = abs(height)
        row_len = (width * 3 + 3) & ~3
        if off + row_len * height > len(data):
            return None
        total = 0.0
        grad = 0.0
        n_grad = 0
        for y in range(height):
            base = off + (y if flipped else height - 1 - y) * row_len
            prev = None
            for x in range(width):
                i = base + x * 3
                b, g, r = data[i], data[i + 1], data[i + 2]
                luma = (0.299 * r + 0.587 * g + 0.114 * b) / 255.0
                total += luma
                if prev is not None:
                    grad += abs(luma - prev)
                    n_grad += 1
                prev = luma
        n = width * height
        return (width, height, 3, total / n, grad / n_grad if n_grad else 0.0)
    except (struct.error, IndexError):
        return None


def synth_wav(n_samples: int = 1600, rate: int = 16000,
              seed: str = "x") -> bytes:
    """Deterministic valid 16-bit PCM mono WAV (seeded sine)."""
    freq = 200 + int.from_bytes(hashlib.sha256(seed.encode()).digest()[:2],
                                "big") % 2000
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(rate)
        frames = bytearray()
        for i in range(n_samples):
            v = int(20000 * math.sin(2 * math.pi * freq * i / rate))
            frames += struct.pack("<h", v)
        w.writeframes(bytes(frames))
    return buf.getvalue()


def decode_wav(data: bytes) -> Optional[tuple[int, int, float]]:
    """(sample_rate, n_samples, rms[0..1]) for a 16-bit PCM WAV; None when
    the blob isn't one."""
    try:
        with wave.open(io.BytesIO(data), "rb") as w:
            if w.getsampwidth() != 2:
                return None
            rate = w.getframerate()
            n = w.getnframes()
            raw = w.readframes(n)
        count = len(raw) // 2
        if count == 0:
            return rate, 0, 0.0
        acc = 0.0
        for (v,) in struct.iter_unpack("<h", raw[:count * 2]):
            acc += (v / 32768.0) ** 2
        return rate, n, math.sqrt(acc / count)
    except (wave.Error, EOFError, struct.error):
        return None


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

    decoder="real" decodes 24-bit BMP natively (decode_bmp — no third-party
    deps); other formats try PIL if present, else the row's features are
    NULL. decoder="fake" emits deterministic hash-derived features with the
    same schema for benches.
    """
    narrow = df.select(F.col(ref_col).alias("media_ref"),
                       F.col(bytes_col).alias("media_bytes"))

    def real_batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = {k: [] for k in ("media_ref", "width", "height",
                                    "channels", "mean_luma", "sharpness")}
            for ref, data in zip(pdf["media_ref"], pdf["media_bytes"]):
                b = bytes(data) if data is not None else b""
                rows["media_ref"].append(ref)
                got = decode_bmp(b)
                if got is None:
                    got = _pil_decode(b)
                if got is None:
                    for k in ("width", "height", "channels",
                              "mean_luma", "sharpness"):
                        rows[k].append(None)
                else:
                    w, h, c, luma, sharp = got
                    rows["width"].append(w)
                    rows["height"].append(h)
                    rows["channels"].append(c)
                    rows["mean_luma"].append(luma)
                    rows["sharpness"].append(sharp)
            yield pd.DataFrame(rows)

    def fake_batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
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

    fn = real_batches if decoder == "real" else fake_batches
    return narrow.mapInPandas(fn, IMAGE_FEATURES_SCHEMA)


def _pil_decode(b: bytes):
    """Optional PIL fallback for non-BMP formats (absent container -> None)."""
    try:  # pragma: no cover - PIL not installed here
        from PIL import Image
    except ImportError:
        return None
    try:  # pragma: no cover
        img = Image.open(io.BytesIO(b)).convert("RGB")
        px = list(img.getdata())
        n = len(px) or 1
        luma = sum(0.299 * r + 0.587 * g + 0.114 * b_ for r, g, b_ in px) \
            / (255.0 * n)
        return img.width, img.height, 3, luma, 0.0
    except Exception:
        return None


def audio_features(df: DataFrame, ref_col: str = "media_ref",
                   bytes_col: str = "media_bytes",
                   decoder: str = "fake") -> DataFrame:
    """Audio features via mapInPandas. decoder="real" decodes 16-bit PCM
    WAV with the stdlib wave module (decode_wav); non-WAV rows yield NULL
    features. decoder="fake" keeps the hash-derived bench path."""
    narrow = df.select(F.col(ref_col).alias("media_ref"),
                       F.col(bytes_col).alias("media_bytes"))

    def real_batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            out = {"media_ref": [], "sample_rate": [], "n_samples": [], "rms": []}
            for ref, data in zip(pdf["media_ref"], pdf["media_bytes"]):
                b = bytes(data) if data is not None else b""
                out["media_ref"].append(ref)
                got = decode_wav(b)
                if got is None:
                    out["sample_rate"].append(None)
                    out["n_samples"].append(None)
                    out["rms"].append(None)
                else:
                    rate, n, rms = got
                    out["sample_rate"].append(rate)
                    out["n_samples"].append(n)
                    out["rms"].append(rms)
            yield pd.DataFrame(out)

    def fake_batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            out = {"media_ref": [], "sample_rate": [], "n_samples": [], "rms": []}
            for ref, data in zip(pdf["media_ref"], pdf["media_bytes"]):
                b = bytes(data) if data is not None else b""
                out["media_ref"].append(ref)
                out["sample_rate"].append(16000)
                out["n_samples"].append(_fake_u32(b, b"n") % 10_000_000)
                out["rms"].append((_fake_u32(b, b"r") % 10_000) / 10_000.0)
            yield pd.DataFrame(out)

    fn = real_batches if decoder == "real" else fake_batches
    return narrow.mapInPandas(fn, AUDIO_FEATURES_SCHEMA)


# ---------------------------------------------------------------------------
# real video codec: YUV4MPEG2 (plain-text header + raw planar frames)
# ---------------------------------------------------------------------------

_Y4M_FRAME_SIZES = {
    "mono": lambda w, h: w * h,
    "420": lambda w, h: w * h + 2 * ((w + 1) // 2) * ((h + 1) // 2),
    "422": lambda w, h: w * h + 2 * ((w + 1) // 2) * h,
    "444": lambda w, h: w * h * 3,
}


def synth_y4m(width: int = 16, height: int = 8, n_frames: int = 6,
              seed: str = "x", colorspace: str = "C420jpeg") -> bytes:
    """Deterministic valid YUV4MPEG2 stream (seeded per-frame gradients)."""
    noise = hashlib.sha256(seed.encode()).digest()
    out = bytearray(
        f"YUV4MPEG2 W{width} H{height} F25:1 Ip A1:1 {colorspace}\n".encode())
    c = colorspace[1:]
    cs = "mono" if c.startswith("mono") else c[:3]
    chroma = _Y4M_FRAME_SIZES[cs](width, height) - width * height
    for f in range(n_frames):
        out += b"FRAME\n"
        for i in range(width * height):            # Y plane
            out.append((noise[(i + f) % len(noise)] + f * 7 + i) & 0xFF)
        for i in range(chroma):                    # Cb + Cr planes
            out.append((128 + f * 3 + (i % 16)) & 0xFF)
    return bytes(out)


def decode_y4m(data: bytes) -> Optional[tuple[int, int, list[bytes]]]:
    """(width, height, [raw frame bytes]) for a YUV4MPEG2 stream; None when
    the blob isn't one. Supports mono/420*/422/444 colorspaces; per-frame
    parameter strings after FRAME are allowed and ignored."""
    try:
        if not data.startswith(b"YUV4MPEG2"):
            return None
        nl = data.index(b"\n")
        width = height = None
        cs = "420"
        for tok in data[9:nl].split():
            t = tok.decode("ascii", "replace")
            if t.startswith("W"):
                width = int(t[1:])
            elif t.startswith("H"):
                height = int(t[1:])
            elif t.startswith("C"):
                c = t[1:]
                cs = "mono" if c.startswith("mono") else c[:3]
        if not width or not height or cs not in _Y4M_FRAME_SIZES:
            return None
        frame_size = _Y4M_FRAME_SIZES[cs](width, height)
        frames: list[bytes] = []
        pos = nl + 1
        while pos < len(data):
            if data[pos:pos + 5] != b"FRAME":
                return None  # stream corrupt mid-way: not a valid y4m
            fnl = data.index(b"\n", pos)
            start = fnl + 1
            if start + frame_size > len(data):
                return None  # truncated frame
            frames.append(bytes(data[start:start + frame_size]))
            pos = start + frame_size
        return width, height, frames
    except (ValueError, IndexError):
        return None


def sample_frames(df: DataFrame, every_n: int = 10, max_frames: int = 4,
                  ref_col: str = "media_ref",
                  bytes_col: str = "media_bytes",
                  decoder: str = "fake") -> DataFrame:
    """Frame sampling via mapInPandas fan-out (the row-expanding UDF shape):
    up to ``max_frames`` rows per video blob, one per sampled frame.

    decoder="real" decodes YUV4MPEG2 natively (decode_y4m — zero deps) and
    samples frames 0, every_n, 2*every_n, ...; blobs that aren't y4m emit NO
    rows (the robust large-pipeline behavior for a row-expanding stage).
    decoder="fake" keeps the deterministic hash-derived bench path."""
    narrow = df.select(F.col(ref_col).alias("media_ref"),
                       F.col(bytes_col).alias("media_bytes"))

    def real_batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            refs, idxs, shas = [], [], []
            for ref, data in zip(pdf["media_ref"], pdf["media_bytes"]):
                b = bytes(data) if data is not None else b""
                got = decode_y4m(b)
                if got is None:
                    continue
                _w, _h, frames = got
                for k in range(max_frames):
                    fi = k * every_n
                    if fi >= len(frames):
                        break
                    refs.append(ref)
                    idxs.append(fi)
                    shas.append(hashlib.sha256(frames[fi]).hexdigest())
            yield pd.DataFrame({"media_ref": refs, "frame_idx": idxs,
                                "frame_sha256": shas})

    def fake_batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
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

    fn = real_batches if decoder == "real" else fake_batches
    return narrow.mapInPandas(fn, FRAME_SAMPLE_SCHEMA)
