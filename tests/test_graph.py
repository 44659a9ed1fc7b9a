"""Connected components vs a pure-Python union-find reference, including
the chain shape pointer jumping exists for."""

import random

from json_schema_lean_spark.operators.graph import (
    connected_components,
    dedup_keep_min,
)


def uf_components(edges):
    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    return {n: find(n) for n in parent}


def _check(spark, edges):
    df = spark.createDataFrame(edges, "id_a long, id_b long")
    got = {r["node"]: r["component"]
           for r in connected_components(df).collect()}
    assert got == uf_components(edges)


def test_small_components(spark):
    _check(spark, [(1, 2), (2, 3), (10, 11), (20, 21), (21, 22), (3, 1)])


def test_long_chain_converges_in_log_rounds(spark):
    # a 200-node chain: plain propagation would need ~200 rounds; pointer
    # jumping must finish inside the max_iters=25 bound (~log2(200) + slack)
    edges = [(i, i + 1) for i in range(200)]
    _check(spark, edges)


def test_random_graphs_match_union_find(spark):
    rng = random.Random(11)
    for _ in range(3):
        n = 60
        edges = [(rng.randrange(n), rng.randrange(n)) for _ in range(45)]
        edges = [(a, b) for a, b in edges if a != b]
        _check(spark, edges)


def test_dedup_keep_min_policy(spark):
    edges = spark.createDataFrame([(5, 9), (9, 7)], "id_a long, id_b long")
    ids = spark.createDataFrame([(i,) for i in (1, 5, 7, 9)], "doc_id long")
    rows = {r["doc_id"]: (r["component"], r["keep"])
            for r in dedup_keep_min(edges, ids, "doc_id").collect()}
    assert rows == {1: (1, True), 5: (5, True), 7: (5, False), 9: (5, False)}


def test_zero_width_bands_rejected(spark):
    from json_schema_lean_spark.operators.dedup import simhash_near_pairs
    df = spark.createDataFrame([(1, "a"), (2, "b")], "doc_id long, text string")
    import pytest
    with pytest.raises(ValueError, match="bit width"):
        simhash_near_pairs(df, "text", "doc_id", max_hamming=60, bands=61,
                           portable=True)


def test_hot_label_guard_equivalence(spark):
    """The broadcast hot-label path and the plain shuffled join must produce
    identical labels — the threshold is purely a performance knob."""
    random.seed(7)
    edges = [(random.randrange(60), random.randrange(60)) for _ in range(120)]
    edges = [(a, b) for a, b in edges if a != b]
    df = spark.createDataFrame(edges, "id_a long, id_b long")
    plain = {(r["node"], r["component"])
             for r in connected_components(df).collect()}
    guarded = {(r["node"], r["component"])
               for r in connected_components(
                   df, hot_label_threshold=2, hot_label_topk=4).collect()}
    assert plain == guarded
    assert plain == set(uf_components(edges).items())


def test_planted_giant_component_1m_edges(spark):
    """VERDICT r3 #6 'done' criterion: a graph where >=50% of the nodes form
    ONE component at 1M edges must converge, label correctly, and run within
    ~2x of a uniform-component graph of the same edge count (the hot-label
    broadcast path removes the giant component's shuffle skew)."""
    import time

    from pyspark.sql import functions as F

    n = 1_000_000
    # giant: nodes [hub..2*hub) form a clique-ish core via (j, j-hub edges
    # anchored at 0); nodes [2*hub..n) each attach to a core node =>
    # one ~1M-node component of diameter ~4 (plus no other components)
    hub = 1_000
    core = spark.range(hub).select(F.col("id").alias("id_a"),
                                   F.lit(0).cast("long").alias("id_b"))
    leaves = (spark.range(hub, n)
              .select(F.col("id").alias("id_a"),
                      (F.col("id") % hub).alias("id_b")))
    giant_edges = core.union(leaves).localCheckpoint()
    assert giant_edges.count() == n

    # uniform baseline: 500k disjoint 2-node components from the same count
    uniform_edges = (spark.range(n)
                     .select((F.col("id") * 2).alias("id_a"),
                             (F.col("id") * 2 + 1).alias("id_b"))
                     .localCheckpoint())

    t0 = time.perf_counter()
    uni = connected_components(uniform_edges, hot_label_threshold=10_000)
    n_uni = uni.count()
    t_uniform = time.perf_counter() - t0
    assert n_uni == 2 * n

    t0 = time.perf_counter()
    comp = connected_components(giant_edges, hot_label_threshold=10_000)
    agg = comp.agg(F.count(F.lit(1)).alias("nodes"),
                   F.count_distinct("component").alias("n_comp"),
                   F.sum((F.col("component") == 0).cast("long"))
                    .alias("in_giant")).collect()[0]
    t_giant = time.perf_counter() - t0

    assert agg["nodes"] == n          # hub..n plus 0
    assert agg["n_comp"] == 1         # ONE giant component
    assert agg["in_giant"] == n       # every node labeled by the min (0)
    # runtime parity: generous floor absorbs shared-box jitter on tiny
    # absolute times; the assertion still catches a quadratic/skew blow-up
    assert t_giant <= max(2.0 * t_uniform, t_uniform + 20), (
        t_giant, t_uniform)
