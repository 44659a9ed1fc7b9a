"""Build golden-file oracles for the three media driver queries
(media_image_features / media_audio_features / media_frame_samples).

The expected feature rows are computed OUTSIDE Spark — plain Python over
the same pure decoders (multimodal.decode_bmp / decode_wav / decode_y4m,
reference provenance in that module) with the same deterministic synth
parameters the driver queries use — and committed as
fixtures/media_golden/*.parquet. The DuckDB oracle then reads them via
read_parquet(), turning the formerly rows-only media queries into full
value-level checks: the Spark side must reproduce, through its
mapInPandas plumbing (Arrow batching, schema, row expansion), exactly
these rows.

Floats are stored UNROUNDED; the oracle SQL applies round(x, 6), mirroring
the Spark query's F.round — one shared rounding step on bit-identical
doubles (the established embedding-oracle technique).

Run: python scripts/build_media_golden.py   (idempotent; overwrites)
"""

from __future__ import annotations

import hashlib
import os
import sys

import pyarrow as pa
import pyarrow.parquet as pq

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from json_schema_lean_spark.operators.multimodal import (  # noqa: E402
    decode_bmp,
    decode_wav,
    decode_y4m,
    synth_bmp,
    synth_wav,
    synth_y4m,
)

OUT_DIR = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "fixtures", "media_golden")

N_IMAGE_AUDIO = 96   # driver queries: doc_id < 96
N_VIDEO = 64         # driver query: doc_id < 64


def build_image() -> pa.Table:
    refs, ws, hs, cs, lumas, sharps = [], [], [], [], [], []
    for i in range(N_IMAGE_AUDIO):
        blob = synth_bmp(width=4 + i % 5, height=3 + i % 4, seed=str(i))
        w, h, c, luma, sharp = decode_bmp(blob)
        refs.append(f"img://{i}")
        ws.append(w)
        hs.append(h)
        cs.append(c)
        lumas.append(luma)
        sharps.append(sharp)
    return pa.table({
        "media_ref": pa.array(refs, pa.string()),
        "width": pa.array(ws, pa.int32()),
        "height": pa.array(hs, pa.int32()),
        "channels": pa.array(cs, pa.int32()),
        "mean_luma": pa.array(lumas, pa.float64()),
        "sharpness": pa.array(sharps, pa.float64()),
    })


def build_audio() -> pa.Table:
    refs, rates, ns, rmss = [], [], [], []
    for i in range(N_IMAGE_AUDIO):
        blob = synth_wav(n_samples=400 + i % 7 * 100,
                         rate=8000 + i % 3 * 4000, seed=str(i))
        rate, n, rms = decode_wav(blob)
        refs.append(f"wav://{i}")
        rates.append(rate)
        ns.append(n)
        rmss.append(rms)
    return pa.table({
        "media_ref": pa.array(refs, pa.string()),
        "sample_rate": pa.array(rates, pa.int32()),
        "n_samples": pa.array(ns, pa.int64()),
        "rms": pa.array(rmss, pa.float64()),
    })


def build_frames(every_n: int = 2, max_frames: int = 3) -> pa.Table:
    cols = ["C420jpeg", "C422", "C444", "Cmono"]
    refs, idxs, shas = [], [], []
    for i in range(N_VIDEO):
        blob = synth_y4m(width=8 + (i % 3) * 4, height=8,
                         n_frames=4 + i % 5, seed=str(i),
                         colorspace=cols[i % 4])
        _w, _h, frames = decode_y4m(blob)
        for k in range(max_frames):
            fi = k * every_n
            if fi >= len(frames):
                break
            refs.append(f"vid://{i}")
            idxs.append(fi)
            shas.append(hashlib.sha256(frames[fi]).hexdigest())
    return pa.table({
        "media_ref": pa.array(refs, pa.string()),
        "frame_idx": pa.array(idxs, pa.int32()),
        "frame_sha256": pa.array(shas, pa.string()),
    })


def main() -> None:
    os.makedirs(OUT_DIR, exist_ok=True)
    for name, table in [("image_features", build_image()),
                        ("audio_features", build_audio()),
                        ("frame_samples", build_frames())]:
        path = os.path.join(OUT_DIR, f"{name}.parquet")
        pq.write_table(table, path)
        print(f"{path}: {table.num_rows} rows")


if __name__ == "__main__":
    main()
