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


#: formats the scan/sink adapters accept. parquet is the scale default
#: (columnar, statistics, pushdown); json = JSON Lines, full nested-struct
#: fidelity for interchange (spans arrays round-trip); csv is flat-schema
#: interchange only (nested columns are rejected by Spark's CSV writer);
#: iceberg = the north-rule table format, usable when the runtime ships the
#: iceberg-spark-runtime jar (not present in this sandbox — see
#: require_iceberg / checkpointing's snapshot-id surrogate).
FORMATS = ("parquet", "json", "csv", "iceberg")

#: Iceberg time-travel options forwarded verbatim by read_table; with a
#: real catalog these give the checkpoint manifest an exact input pin
#: (lineage: input snapshot-id) instead of the content-hash surrogate.
ICEBERG_READ_OPTIONS = ("snapshot-id", "as-of-timestamp", "branch", "tag")


def require_iceberg(spark: SparkSession) -> None:
    """Fail fast with an actionable message when the Iceberg runtime is
    absent (this sandbox): the DataSource V2 lookup otherwise surfaces as a
    ClassNotFoundException deep inside an executor stack."""
    try:
        spark._jvm.java.lang.Class.forName(
            "org.apache.iceberg.spark.source.IcebergSource")
    except Exception:
        raise RuntimeError(
            "format='iceberg' needs the iceberg-spark-runtime jar on the "
            "cluster (spark.jars.packages=org.apache.iceberg:"
            "iceberg-spark-runtime-...) and a configured catalog; this "
            "sandbox has neither — use format='parquet' (same Catalyst "
            "pushdown/pruning; checkpoint lineage falls back to the "
            "content-hash snapshot surrogate)") from None


def read_table(spark: SparkSession, path: str, format: str = "parquet",
               schema=None, **options) -> DataFrame:
    """Format-dispatching scan. A schema should be passed for json/csv at
    scale — inference re-reads the input; parquet and iceberg carry their
    own. For iceberg, ``path`` is a catalog table identifier (or metadata
    path) and ``snapshot-id`` / ``as-of-timestamp`` / ``branch`` / ``tag``
    options time-travel the scan."""
    if format not in FORMATS:
        raise ValueError(f"unsupported format {format!r}; one of {FORMATS}")
    if format == "iceberg":
        if schema is not None:
            raise ValueError(
                "format='iceberg' carries its own schema (DataSource V2 "
                "rejects a user-specified one at runtime); drop the schema "
                "argument and .select() the projection instead")
        require_iceberg(spark)
        return spark.read.format("iceberg").options(**options).load(path)
    reader = spark.read
    if schema is not None:
        reader = reader.schema(schema)
    if format == "csv":
        options.setdefault("header", "true")
        if schema is None:
            options.setdefault("inferSchema", "true")
    return reader.format(format).options(**options).load(path)


def write_table(df: DataFrame, path: str, format: str = "parquet",
                mode: str = "overwrite", partition_by=None,
                **options) -> None:
    """Format-dispatching sink (verdict/violation outputs, baselines)."""
    if format not in FORMATS:
        raise ValueError(f"unsupported format {format!r}; one of {FORMATS}")
    if format == "iceberg":
        require_iceberg(df.sparkSession)
    if format == "csv":
        options.setdefault("header", "true")
    w = df.write.mode(mode).options(**options)
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.format(format).save(path)
