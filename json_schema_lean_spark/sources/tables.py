"""Table-format adapter: parquet now, catalog slots for Iceberg later.

The reference engine has no sources at all (stdin only,
/root/reference/Harness/Harness.lean:42-57); this module is the engine's scan
layer. Reads are plain ``spark.read.parquet`` so Catalyst gets predicate
pushdown + column pruning for free; an Iceberg catalog can be swapped in by
setting ``format="iceberg"`` (jar not present in this sandbox — the
snapshot-id lineage slot is filled with a content hash surrogate, see
checkpointing.py).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

TABLE_NAMES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]

DEFAULT_SF_DIR = "/root/testdata/sf0.001"


def load_table(spark: SparkSession, name: str, sf_dir: str = DEFAULT_SF_DIR) -> DataFrame:
    return spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))


def load_tables(spark: SparkSession, sf_dir: str = DEFAULT_SF_DIR) -> dict[str, DataFrame]:
    return {n: load_table(spark, n, sf_dir) for n in TABLE_NAMES}
