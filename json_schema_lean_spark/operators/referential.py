"""Referential-integrity checks (north_star extension).

Fact-side keys are validated against a dimension via a **broadcast left-anti
join** — the dimension (asset catalog, part, ...) is broadcast-sized by
design, so no shuffle of the 100 TB fact side ever happens; the scan keeps
predicate pushdown and the anti-join runs map-side.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def dangling_refs(fact: DataFrame, fact_key: str, dim: DataFrame, dim_key: str) -> DataFrame:
    """Rows of `fact` whose key has no match in `dim` (nulls excluded —
    a null ref is 'absent', not dangling)."""
    return (fact.where(F.col(fact_key).isNotNull())
                .join(F.broadcast(dim.select(F.col(dim_key).alias(fact_key)).distinct()),
                      on=fact_key, how="left_anti"))


def dangling_ref_counts(fact: DataFrame, fact_key: str,
                        dim: DataFrame, dim_key: str) -> DataFrame:
    """Dangling keys with occurrence counts (map-side combine then merge)."""
    return (dangling_refs(fact, fact_key, dim, dim_key)
            .groupBy(fact_key).agg(F.count(F.lit(1)).alias("n_refs")))


def span_media_integrity(docs: DataFrame, catalog: DataFrame) -> DataFrame:
    """Spans-table flavor: explode media refs, anti-join the broadcast
    catalog, return (doc_id, span_idx, media_ref) violation rows."""
    # r6: extract the media_ref string array BEFORE the explode — the
    # Generate then materializes one string per span instead of the whole
    # 4-field struct, and nested-schema pruning lets the parquet scan read
    # only spans.media_ref (ReadSchema shrinks from the full span struct to
    # one field). Positions are unchanged: the field array has exactly one
    # (possibly null) element per span, and the null filter still runs
    # after position assignment.
    refs = docs.select(
        "doc_id",
        F.posexplode(F.col("spans").getField("media_ref"))
         .alias("span_idx", "media_ref"),
    ).where(F.col("media_ref").isNotNull())
    return refs.join(F.broadcast(catalog.select("media_ref").distinct()),
                     on="media_ref", how="left_anti") \
               .select("doc_id", "span_idx", "media_ref")
