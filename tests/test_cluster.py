"""Connected-components / near-dup clustering tests.

Ground truth for the randomized cases is an in-test union-find — independent
of the Spark implementation's algorithm.
"""

import random

import pytest
from pyspark.sql import functions as F

from dcspark import cluster


def _uf_components(edges):
    parent = {}

    def find(x):
        while parent.setdefault(x, x) != x:
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    return {x: find(x) for x in parent}


def _cc_dict(spark, edges, **kw):
    df = spark.createDataFrame(edges, "doc_a long, doc_b long")
    return {r["node"]: r["component"]
            for r in cluster.connected_components(df, **kw).collect()}


def test_long_chain_converges(spark):
    # path graph 0-1-2-...-63: diameter 63 stresses the O(log n) contraction
    edges = [(i, i + 1) for i in range(63)]
    got = _cc_dict(spark, edges)
    assert got == {i: 0 for i in range(64)}


def test_two_components_and_duplicate_reversed_edges(spark):
    edges = [(5, 3), (3, 9), (9, 5), (20, 21), (21, 20), (20, 21)]
    got = _cc_dict(spark, edges)
    assert got == {3: 3, 5: 3, 9: 3, 20: 20, 21: 20}


def test_random_graphs_match_union_find(spark):
    rng = random.Random(7)
    for trial in range(3):
        n = 120
        edges = [(rng.randrange(n), rng.randrange(n)) for _ in range(90)]
        edges = [(a, b) for a, b in edges if a != b]
        got = _cc_dict(spark, edges)
        assert got == _uf_components(edges), f"trial {trial}"


def test_string_node_ids(spark):
    df = spark.createDataFrame(
        [("b", "c"), ("c", "a"), ("x", "y")], "doc_a string, doc_b string")
    got = {r["node"]: r["component"]
           for r in cluster.connected_components(df).collect()}
    assert got == {"a": "a", "b": "a", "c": "a", "x": "x", "y": "x"}


def test_empty_pairs(spark):
    df = spark.createDataFrame([], "doc_a long, doc_b long")
    assert cluster.connected_components(df).count() == 0
    assert cluster.near_dup_clusters(df).count() == 0


def test_near_dup_clusters_membership(spark):
    # two pair-clusters plus one transitive triple (1-2, 2-7 => {1,2,7})
    df = spark.createDataFrame(
        [(1, 2), (2, 7), (10, 11), (30, 31)], "doc_a long, doc_b long")
    rows = {r["doc_id"]: r for r in cluster.near_dup_clusters(df).collect()}
    assert {d: r["cluster_id"] for d, r in rows.items()} == {
        1: 1, 2: 1, 7: 1, 10: 10, 11: 10, 30: 30, 31: 30}
    assert {d: r["cluster_size"] for d, r in rows.items()} == {
        1: 3, 2: 3, 7: 3, 10: 2, 11: 2, 30: 2, 31: 2}
    canon = {d for d, r in rows.items() if r["is_canonical"]}
    assert canon == {1, 10, 30}


def test_drop_list_dedups_corpus(spark):
    pairs = spark.createDataFrame([(1, 2), (2, 7)], "doc_a long, doc_b long")
    corpus = spark.range(0, 10).select(F.col("id").alias("doc_id"))
    drops = cluster.near_dup_clusters(pairs).filter(~F.col("is_canonical"))
    kept = corpus.join(drops.select("doc_id"), "doc_id", "left_anti")
    assert sorted(r["doc_id"] for r in kept.collect()) == [0, 1, 3, 4, 5, 6, 8, 9]


def test_no_nested_loop_join_in_round(spark):
    df = spark.createDataFrame([(1, 2), (2, 3)], "doc_a long, doc_b long")
    plan = cluster._small_star(cluster._large_star(
        df.select(F.col("doc_a").alias("src"), F.col("doc_b").alias("dst"))
    ))._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan


def test_distributed_path_matches_driver_path(spark):
    """Default adaptive execution solves driver-sized edge sets with exact
    union-find; driver_cutoff=0 forces the alternating-star iteration. Both
    must produce the identical min-id labeling."""
    rng = random.Random(11)
    n = 150
    edges = [(rng.randrange(n), rng.randrange(n)) for _ in range(120)]
    edges = [(a, b) for a, b in edges if a != b]
    fast = _cc_dict(spark, edges)
    dist = _cc_dict(spark, edges, driver_cutoff=0)
    assert fast == dist == _uf_components(edges)


def test_long_chain_converges_distributed(spark):
    edges = [(i, i + 1) for i in range(63)]
    got = _cc_dict(spark, edges, driver_cutoff=0)
    assert got == {i: 0 for i in range(64)}


def test_cutoff_boundary_forces_distributed(spark):
    # 2 distinct edges > cutoff of 1 -> distributed path must run (and agree)
    got = _cc_dict(spark, [(1, 2), (3, 4)], driver_cutoff=1)
    assert got == {1: 1, 2: 1, 3: 3, 4: 3}


def test_survivor_selection_best_score_wins(spark):
    # two clusters via transitivity: {1,2,3} (1-2, 2-3) and {7,8}
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (7, 8)], "doc_a long, doc_b long")
    members = cluster.near_dup_clusters(pairs)
    scores = spark.createDataFrame(
        [(1, 5.0), (2, 9.0), (3, 9.0), (7, 1.0)],  # 8 unscored
        "doc_id long, score double")
    sel = {r["doc_id"]: r for r in
           cluster.survivor_selection(members, scores).collect()}
    assert len(sel) == 5
    # tie 2 vs 3 at 9.0 -> min id (2) survives; 1 dropped
    assert [sel[i]["keep"] for i in (1, 2, 3)] == [False, True, False]
    # unscored 8 ranks below scored 7
    assert sel[7]["keep"] and not sel[8]["keep"]
    assert all(r["cluster_size"] == (3 if r["cluster_id"] == 1 else 2)
               for r in sel.values())
    # exactly one survivor per cluster
    assert sum(r["keep"] for r in sel.values()) == 2


def test_dedup_corpus_keeps_unclustered_and_survivors(spark):
    docs = spark.createDataFrame(
        [(i, f"text-{i}") for i in range(10)], "doc_id long, text string")
    pairs = spark.createDataFrame([(1, 2), (2, 3), (7, 8)],
                                  "doc_a long, doc_b long")
    scores = spark.createDataFrame(
        [(i, float(i)) for i in range(10)], "doc_id long, score double")
    kept = sorted(r["doc_id"] for r in
                  cluster.dedup_corpus(docs, pairs, scores).collect())
    # highest score survives: 3 from {1,2,3}, 8 from {7,8};
    # 0,4,5,6,9 never clustered -> pass through
    assert kept == [0, 3, 4, 5, 6, 8, 9]
