"""SemDeDup cluster-blocked semantic dedup (simsearch.semantic_dedup_pairs)."""

import math

import pytest
from pyspark.sql import functions as F

from dcspark import cluster, pipeline_ckpt, simsearch


def _vecs(spark, rows):
    return spark.createDataFrame(rows, "vec_id long, embedding array<double>")


def test_within_cell_pairs_and_threshold(spark):
    # centroids at +e0 and +e1: vectors along e0 share a cell, e1 the other
    cents = [[1.0, 0.0, 0.0], [0.0, 1.0, 0.0]]
    rows = [
        (0, [1.0, 0.1, 0.0]),     # cell 1
        (1, [0.9, 0.11, 0.0]),    # cell 1, near-dup of 0
        (2, [1.0, 0.0, 0.9]),     # cell 1, far from 0/1 in cosine
        (3, [0.0, 1.0, 0.0]),     # cell 2 — never compared to cell 1
    ]
    out = simsearch.semantic_dedup_pairs(
        _vecs(spark, rows), dim=3, centroids=cents, threshold=0.95
    )
    got = {(r["id_a"], r["id_b"]): r for r in out.collect()}
    pipeline_ckpt.release_caches(out)
    assert set(got) == {(0, 1)}
    # exact cosine, rounded to 4
    a, b = rows[0][1], rows[1][1]
    cos = sum(x * y for x, y in zip(a, b)) / (
        math.sqrt(sum(x * x for x in a)) * math.sqrt(sum(x * x for x in b)))
    assert got[(0, 1)]["score"] == pytest.approx(round(cos, 4))


def test_hot_cell_guard_drops_oversized_cells(spark):
    cents = [[1.0, 0.0], [0.0, 1.0]]
    rows = [(i, [1.0, 0.001 * i]) for i in range(50)]      # all in cell 1
    rows += [(100, [0.0, 1.0]), (101, [0.001, 1.0])]       # small cell 2
    out = simsearch.semantic_dedup_pairs(
        _vecs(spark, rows), dim=2, centroids=cents,
        threshold=0.5, max_bucket=10,
    )
    pairs = [(r["id_a"], r["id_b"]) for r in out.collect()]
    pipeline_ckpt.release_caches(out)
    assert pairs == [(100, 101)]  # the 50-member cell was dropped, not joined


def test_composes_with_cluster_drop_list(spark):
    # chain 0~1~2 in one cell -> one component, min-id canonical
    cents = [[1.0, 0.0]]
    rows = [(0, [1.0, 0.0]), (1, [1.0, 0.01]), (2, [1.0, 0.02]),
            (7, [0.0, 1.0])]
    pairs = simsearch.semantic_dedup_pairs(
        _vecs(spark, rows), dim=2, centroids=cents, threshold=0.99
    )
    members = cluster.near_dup_clusters(pairs, src="id_a", dst="id_b").collect()
    pipeline_ckpt.release_caches(pairs)
    drop = sorted(r["doc_id"] for r in members if not r["is_canonical"])
    assert drop == [1, 2]


def test_scale_plan_shape(spark):
    emb = _vecs(spark, [(0, [1.0, 0.0]), (1, [0.0, 1.0])])
    df = simsearch.semantic_dedup_pairs(emb, dim=2, n_cells=2, max_bucket=10)
    plan = df._jdf.queryExecution().executedPlan().toString()
    # equi-join on cell, never a cross product; hot-cell guard is an anti-join
    assert "CartesianProduct" not in plan and "BroadcastNestedLoopJoin" not in plan
    assert "LeftAnti" in plan
    pipeline_ckpt.release_caches(df)
