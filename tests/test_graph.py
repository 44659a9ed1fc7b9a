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
