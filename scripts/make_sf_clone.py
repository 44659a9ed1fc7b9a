"""Build a LOCAL sf1.0-scale perf clone of /root/testdata/sf0.1 (r6).

The driver's round-end measurement runs bench.py at sf1.0 against tables we
cannot regenerate (the generator is driver-side). For optimization we need
inputs of the same scale and the same physical layout — the driver's files
are single-row-group parquet, which is exactly the unsplittable-scan shape
parallelism.scale_partitions guards against — so this script replicates
each sf0.1 table 10x:

- every int64 column named *_id / *key is shifted by copy * 10_000_000
  (ONE global constant, so cross-table key references stay consistent:
  l_orderkey+c*G still matches o_orderkey+c*G, l_partkey+c*G matches
  p_partkey+c*G, and ann_topk's `vec_id < 5` query side stays 5 rows);
- region/nation are fixed-size dimensions at every sf (TPC-H convention)
  and are copied once;
- output is written with pyarrow's DEFAULT row-group size (1,048,576 rows),
  which reproduces every observed driver layout: events.parquet at driver
  sf1.0 scans as ONE task (1M rows = 1 row group — the unsplittable shape
  parallelism.scale_partitions guards against) while lineitem (6M rows =
  6 row groups) scans with parallelism ~6, matching q1_pricing's driver
  timings (BENCH_r05: 0.356 s wall, ~2.1 tree-CPU-s).

This is a PERF measuring aid only — never an oracle input: duplicated text
changes dedup group shapes slightly, timestamps repeat 10x, etc. Output
goes to data/sf1.0 (gitignored).

Usage: python scripts/make_sf_clone.py [src_dir] [dst_dir] [copies]
"""

from __future__ import annotations

import os
import sys

import pyarrow as pa
import pyarrow.parquet as pq

G = 10_000_000  # global per-copy key shift

FIXED_DIMS = {"region.parquet", "nation.parquet"}


def clone_table(src: str, dst: str, copies: int) -> None:
    t = pq.read_table(src)
    shift_cols = [
        f.name for f in t.schema
        if pa.types.is_int64(f.type)
        and (f.name.endswith("_id") or f.name.endswith("key"))
    ]
    parts = []
    import pyarrow.compute as pc
    for c in range(copies):
        if c == 0 or not shift_cols:
            parts.append(t if c == 0 else t)
            continue
        cols = {}
        for f in t.schema:
            col = t.column(f.name)
            if f.name in shift_cols:
                col = pc.add(col, pa.scalar(c * G, type=pa.int64()))
            cols[f.name] = col
        parts.append(pa.table(cols, schema=t.schema))
    out = pa.concat_tables(parts)
    pq.write_table(out, dst, compression="snappy")


def main() -> None:
    src_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    dst_dir = sys.argv[2] if len(sys.argv) > 2 else os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "data", "sf1.0")
    copies = int(sys.argv[3]) if len(sys.argv) > 3 else 10
    os.makedirs(dst_dir, exist_ok=True)
    for name in sorted(os.listdir(src_dir)):
        if not name.endswith(".parquet"):
            continue
        n = 1 if name in FIXED_DIMS else copies
        clone_table(os.path.join(src_dir, name),
                    os.path.join(dst_dir, name), n)
        print("wrote", name, "x", n)


if __name__ == "__main__":
    main()
