"""Build engine.zip for spark-submit --py-files deployment.

    python scripts/build_engine_zip.py [out.zip]    (default: ./engine.zip)

Then (proven end-to-end in this sandbox — the driver script's repo-dir
sys.path insert is a no-op outside the repo, so every import resolves
from the zip exactly as it would on a real cluster's executors):

    spark-submit --master <cluster> --py-files engine.zip \
        scripts/run_validation.py --input <parquet-dir> --schema - \
        --out <checkpoint-dir>
"""
from __future__ import annotations

import os
import sys
import zipfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def build(out_path: str) -> int:
    n = 0
    with zipfile.ZipFile(out_path, "w", zipfile.ZIP_DEFLATED) as z:
        pkg = os.path.join(REPO, "json_schema_lean_spark")
        for root, dirs, files in os.walk(pkg):
            dirs[:] = [d for d in dirs if d != "__pycache__"]
            for f in sorted(files):
                if not f.endswith(".py"):
                    continue
                full = os.path.join(root, f)
                z.write(full, os.path.relpath(full, REPO))
                n += 1
    return n


if __name__ == "__main__":
    out = sys.argv[1] if len(sys.argv) > 1 else "engine.zip"
    n = build(out)
    print(f"{out}: {n} files")
