"""Similarity search over embedding columns (task-mandated extension).

- brute-force cosine top-k: correctness baseline — broadcast the (small)
  query set, score every corpus row JVM-side with higher-order array
  functions, take per-query top-k with a window. One shuffle (the window),
  no Python.
- LSH-bucketed variant (scale path): random-hyperplane signatures bucket the
  corpus; each query only scores its bucket. At 100 TB the bucket join
  replaces the full cross product.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def _dot(a: Column, b: Column) -> Column:
    return F.aggregate(F.zip_with(a, b, lambda x, y: x * y),
                       F.lit(0.0), lambda acc, v: acc + v)


def _norm(a: Column) -> Column:
    return F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, v: acc + v * v))


def cosine(a: Column, b: Column) -> Column:
    """Cosine similarity of two array<double> columns, pure Column algebra."""
    return _dot(a, b) / (_norm(a) * _norm(b))


def brute_force_topk(corpus: DataFrame, queries: DataFrame, k: int = 5,
                     id_col: str = "vec_id", vec_col: str = "embedding") -> DataFrame:
    """Per query: top-k most-cosine-similar corpus rows (excluding itself).

    Plan shape: broadcast-nested-loop join of corpus x broadcast(queries) —
    the corpus side streams, the query side is broadcast; ranking is one
    window shuffle keyed by query id. Ties break on neighbor id (ascending)
    for determinism.
    """
    c = corpus.select(F.col(id_col).alias("neighbor_id"),
                      F.col(vec_col).cast("array<double>").alias("c_vec"))
    q = queries.select(F.col(id_col).alias("query_id"),
                       F.col(vec_col).cast("array<double>").alias("q_vec"))
    scored = (c.join(F.broadcast(q), F.col("neighbor_id") != F.col("query_id"))
                .select("query_id", "neighbor_id",
                        cosine(F.col("c_vec"), F.col("q_vec")).alias("score")))
    w = Window.partitionBy("query_id").orderBy(F.col("score").desc(),
                                               F.col("neighbor_id").asc())
    return (scored.withColumn("rank", F.row_number().over(w))
                  .where(F.col("rank") <= k)
                  .select("query_id", "neighbor_id", "rank"))


def ivf_index(corpus: DataFrame, n_centroids: int = 16, seed: int = 42,
              id_col: str = "vec_id", vec_col: str = "embedding",
              sample_fraction: float = 1.0):
    """IVF coarse quantizer: k-means centroids (pyspark.ml, seeded — fit on
    a sample at scale) + cluster assignment for every corpus row. Returns
    (assigned_corpus, centroids) where centroids is a small driver-side list
    (the broadcastable 'index')."""
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector

    featurized = corpus.withColumn(
        "_features", array_to_vector(F.col(vec_col).cast("array<double>")))
    fit_on = featurized.sample(sample_fraction, seed=seed) \
        if sample_fraction < 1.0 else featurized
    model = (KMeans(k=n_centroids, seed=seed, featuresCol="_features",
                    predictionCol="_cluster")
             .fit(fit_on))
    assigned = model.transform(featurized).drop("_features")
    centroids = [list(c) for c in model.clusterCenters()]
    return assigned, centroids


def _nearest_centroids(vec: Column, centroids: list[list[float]],
                       nprobe: int) -> Column:
    """Array of the nprobe nearest centroid ids (euclidean), pure Columns —
    the centroid list is a literal (broadcast-sized by construction)."""
    dists = [
        (ci, F.aggregate(
            F.zip_with(vec, F.array(*[F.lit(x) for x in c]),
                       lambda a, b: (a - b) * (a - b)),
            F.lit(0.0), lambda acc, v: acc + v))
        for ci, c in enumerate(centroids)
    ]
    pairs = F.array(*[F.struct(d.alias("d"), F.lit(ci).cast("int").alias("c"))
                      for ci, d in dists])
    top = F.slice(F.array_sort(pairs), 1, nprobe)
    return F.transform(top, lambda s: s.getField("c"))


def ivf_topk(assigned: DataFrame, centroids: list[list[float]],
             queries: DataFrame, k: int = 5, nprobe: int = 4,
             id_col: str = "vec_id", vec_col: str = "embedding") -> DataFrame:
    """IVF search: each query scores ONLY rows in its nprobe nearest
    clusters. The probe join keys on the cluster id (queries broadcast), so
    corpus work scales with nprobe/n_centroids of the data instead of all of
    it — the 100 TB alternative to the brute-force cross product."""
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).cast("array<double>").alias("q_vec"))
    q = q.withColumn("_probe", F.explode(
        _nearest_centroids(F.col("q_vec"), centroids, nprobe)))
    c = assigned.select(F.col(id_col).alias("neighbor_id"),
                        F.col(vec_col).cast("array<double>").alias("c_vec"),
                        F.col("_cluster").alias("_probe"))
    scored = (c.join(F.broadcast(q), "_probe")
                .where(F.col("neighbor_id") != F.col("query_id"))
                .select("query_id", "neighbor_id",
                        cosine(F.col("c_vec"), F.col("q_vec")).alias("score")))
    w = Window.partitionBy("query_id").orderBy(F.col("score").desc(),
                                               F.col("neighbor_id").asc())
    return (scored.withColumn("rank", F.row_number().over(w))
                  .where(F.col("rank") <= k)
                  .select("query_id", "neighbor_id", "rank"))


def hyperplane_signature(vec: Column, dim: int, n_planes: int = 16,
                         seed: int = 42) -> Column:
    """Random-hyperplane LSH bit signature as a bigint. The 'random'
    hyperplanes are deterministic hash-derived ±1 weights (no RNG state,
    reproducible across runs/executors)."""
    def plane_weights(p: int):
        # weight for (plane p, dim i): ±1 from xxhash64(seed, p, i); factory
        # closure (default-arg lambdas break pyspark HOF param counting)
        return lambda i: F.when(
            F.pmod(F.xxhash64(F.lit(seed), F.lit(p), i), F.lit(2)) == 0,
            F.lit(1.0)).otherwise(F.lit(-1.0))

    bits = []
    for p in range(n_planes):
        proj = F.aggregate(
            F.zip_with(vec,
                       F.transform(F.sequence(F.lit(0), F.lit(dim - 1)),
                                   plane_weights(p)),
                       lambda x, w: x * w),
            F.lit(0.0), lambda acc, v: acc + v)
        bits.append(F.when(proj >= 0, F.lit(2 ** p).cast("long")).otherwise(F.lit(0).cast("long")))
    out = bits[0]
    for b in bits[1:]:
        out = out + b
    return out


def lsh_topk(corpus: DataFrame, queries: DataFrame, dim: int, k: int = 5,
             n_planes: int = 12, id_col: str = "vec_id",
             vec_col: str = "embedding") -> DataFrame:
    """Approximate top-k: only corpus rows in the query's LSH bucket are
    scored. Recall trades with n_planes; bucket join shuffles signatures,
    not vectors-crossed-with-queries."""
    sig = lambda df: df.withColumn(
        "_sig", hyperplane_signature(F.col(vec_col).cast("array<double>"), dim, n_planes))
    c = sig(corpus).select(F.col(id_col).alias("neighbor_id"),
                           F.col(vec_col).cast("array<double>").alias("c_vec"), "_sig")
    q = sig(queries).select(F.col(id_col).alias("query_id"),
                            F.col(vec_col).cast("array<double>").alias("q_vec"), "_sig")
    scored = (c.join(F.broadcast(q), "_sig")
                .where(F.col("neighbor_id") != F.col("query_id"))
                .select("query_id", "neighbor_id",
                        cosine(F.col("c_vec"), F.col("q_vec")).alias("score")))
    w = Window.partitionBy("query_id").orderBy(F.col("score").desc(),
                                               F.col("neighbor_id").asc())
    return (scored.withColumn("rank", F.row_number().over(w))
                  .where(F.col("rank") <= k)
                  .select("query_id", "neighbor_id", "rank"))
