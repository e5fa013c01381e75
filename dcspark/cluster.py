"""Near-duplicate cluster formation: connected components over candidate pairs.

The missing last step of a dedup pipeline: pair detection (MinHash-LSH,
SimHash, winnowing, embedding blocks — all in `textops`/`simsearch`) yields
*edges*; training-data dedup needs *clusters* with one canonical survivor per
cluster. Pairs are transitive only through the component structure — A~B and
B~C must collapse A, B, C together even when (A, C) was never scored.

Algorithm: the alternating **large-star / small-star** method (Kiveris et al.,
"Connected Components in MapReduce and Beyond", SoCC 2014), expressed entirely
in DataFrame ops:

  large-star(u): m = min(N(u) + {u}); for every neighbor v > u emit (v, m)
  small-star(u): orient edges (max, min); m = min(N(u) + {u});
                 emit (v, m) for v in N(u) + {u}

Alternating the two contracts every component to a star rooted at its minimum
node id in O(log^2 n) rounds with high probability (2-4 rounds on real dedup
graphs, whose components are near-cliques). Each round is a fixed number of
hash-partition shuffles on the *edge* table — which for near-dup workloads is
orders of magnitude smaller than the corpus (25 pairs per 5k docs in the test
tables) — so the iteration never touches document text or embeddings and
scales with the duplicate count, not the corpus size. Compare GraphFrames'
connectedComponents, which uses the same alternation on RDDs.

Per-round `localCheckpoint(eager=True)` materializes the edge set and truncates
the lineage — without it each round's plan embeds all previous rounds and plan
compilation blows up exponentially. On a production cluster prefer
`spark.sparkContext.setCheckpointDir` + `.checkpoint()` if executor loss during
the (short) iteration must be survivable; the result is deterministic either
way, so a lost job can simply rerun.

Reference parity: the reference (datacontract-cli) has no clustering operator;
this extends the §2.5 graft axes (training-data dedup at 100 TB) the same way
`textops.minhash_near_dups` extends its uniqueness checks.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _large_star(edges: DataFrame) -> DataFrame:
    """One large-star round: every neighbor larger than u relinks to u's min."""
    adj = edges.union(
        edges.select(F.col("dst").alias("src"), F.col("src").alias("dst")))
    mins = adj.groupBy("src").agg(F.min("dst").alias("nmin"))
    mins = mins.select("src", F.least(F.col("nmin"), F.col("src")).alias("m"))
    # emitted edges have dst(alias src) > u >= m, so no self-loops possible
    return (
        adj.join(mins, "src")
        .filter(F.col("dst") > F.col("src"))
        .select(F.col("dst").alias("src"), F.col("m").alias("dst"))
        .distinct()
    )


def _small_star(edges: DataFrame) -> DataFrame:
    """One small-star round: all smaller-or-equal neighbors relink to the min."""
    e = edges.select(
        F.greatest("src", "dst").alias("u"), F.least("src", "dst").alias("v"))
    mins = e.groupBy("u").agg(F.min("v").alias("m"))
    return (
        e.join(mins, "u")
        .select(F.col("v").alias("src"), F.col("m").alias("dst"))
        .union(mins.select(F.col("u").alias("src"), F.col("m").alias("dst")))
        .filter(F.col("src") != F.col("dst"))
        .distinct()
    )


def _driver_union_find(rows, spark, schema) -> DataFrame:
    """Exact union-find with min-id representatives — same (node, component)
    contract as the distributed path, for edge sets already on the driver."""
    parent: dict = {}

    def find(x):
        root = x
        while parent[root] != root:
            root = parent[root]
        while parent[x] != root:  # path compression
            parent[x], x = root, parent[x]
        return root

    for s, d in rows:
        parent.setdefault(s, s)
        parent.setdefault(d, d)
        rs, rd = find(s), find(d)
        if rs != rd:
            # union by min so the representative IS the component min
            lo, hi = (rs, rd) if rs < rd else (rd, rs)
            parent[hi] = lo
    out = [(n, find(n)) for n in parent]
    return spark.createDataFrame(out, schema=schema)


def connected_components(
    pairs: DataFrame,
    src: str = "doc_a",
    dst: str = "doc_b",
    max_rounds: int = 30,
    driver_cutoff: int = 1 << 20,
) -> DataFrame:
    """(node, component) for every node appearing in ``pairs``.

    ``component`` is the minimum node id of the connected component, so labels
    are deterministic and stable across runs/parallelism. Nodes may be any
    orderable type (long ids, string ids). Isolated nodes never enter the edge
    list and are absent from the output — callers union them back if "every
    doc is its own cluster" semantics are wanted.

    Adaptive execution: near-dup edge sets are pairs of *near-duplicates* —
    typically orders of magnitude smaller than the corpus — so when the
    distinct edge count is at most ``driver_cutoff`` (default 2^20 edges,
    ~tens of MB) the components are solved exactly with driver-side
    union-find in one pass instead of O(log^2 n) alternating-star Spark
    rounds, each of which costs several jobs of fixed overhead. Above the
    cutoff (the 100 TB regime, or ``driver_cutoff=0`` to force it) the
    distributed alternating-star iteration runs; both paths produce the
    identical min-id labeling (equivalence test-locked in
    tests/test_cluster.py).

    Convergence of the distributed path is detected by an (edge-count,
    xxhash64-xor) signature of the post-round edge set: a star forest is a
    fixed point of both phases, and the alternation strictly contracts until
    it reaches one.
    """
    edges = (
        pairs.select(F.col(src).alias("src"), F.col(dst).alias("dst"))
        .filter(F.col("src").isNotNull() & F.col("dst").isNotNull())
        .filter(F.col("src") != F.col("dst"))
        .distinct()
        # materialize BEFORE iterating: each phase references the edge frame
        # from both sides of a self-join (adjacency + per-node mins), and
        # Spark evaluates an unpersisted plan once per reference — an
        # expensive upstream pair pipeline (MinHash-LSH + Jaccard verify)
        # would otherwise run 4x in round 1 alone
        .localCheckpoint(eager=True)
    )
    if driver_cutoff and edges.count() <= driver_cutoff:
        # count is one cheap job over the just-checkpointed frame; collect
        # happens only once the set is known to be driver-sized
        schema = edges.select(
            F.col("src").alias("node"), F.col("dst").alias("component")
        ).schema
        return _driver_union_find(
            [(r["src"], r["dst"]) for r in edges.collect()],
            edges.sparkSession, schema)
    prev_sig = None
    for _round in range(max_rounds):
        edges = _small_star(_large_star(edges)).localCheckpoint(eager=True)
        # bit_xor: order-independent and overflow-free (ANSI mode rejects a
        # plain sum of 64-bit hashes); valid as a set signature because the
        # edge frame is distinct
        sig = tuple(
            edges.agg(
                F.count(F.lit(1)),
                F.coalesce(F.bit_xor(F.xxhash64("src", "dst")), F.lit(0)),
            ).first()
        )
        if sig == prev_sig:
            break
        prev_sig = sig
    else:
        raise RuntimeError(
            f"connected_components did not converge in {max_rounds} rounds "
            "(expected O(log^2 n); raise max_rounds for pathological graphs)")
    return (
        edges.select(F.col("src").alias("node"), F.col("dst").alias("component"))
        .union(edges.select(F.col("dst").alias("node"), F.col("dst").alias("component")))
        .groupBy("node")
        .agg(F.min("component").alias("component"))
    )


def near_dup_clusters(
    pairs: DataFrame, src: str = "doc_a", dst: str = "doc_b"
) -> DataFrame:
    """Cluster membership table from a near-dup pair frame.

    Returns (doc_id, cluster_id, cluster_size, is_canonical): ``cluster_id``
    is the component-min doc id, ``is_canonical`` marks the min-id survivor —
    the deterministic keep-one-per-cluster dedup policy. Filtering
    ``~is_canonical`` gives the drop list; anti-joining it against the corpus
    is the final dedup step.
    """
    cc = connected_components(pairs, src=src, dst=dst)
    w = Window.partitionBy("cluster_id")
    return (
        cc.select(
            F.col("node").alias("doc_id"), F.col("component").alias("cluster_id"))
        .withColumn("cluster_size", F.count(F.lit(1)).over(w).cast("long"))
        .withColumn("is_canonical", F.col("doc_id") == F.col("cluster_id"))
    )

def survivor_selection(
    clusters: DataFrame,
    scores: DataFrame,
    id_col: str = "doc_id",
    score_col: str = "score",
) -> DataFrame:
    """Quality-aware keep-one-per-cluster: the survivor is the member with the
    HIGHEST score (ties broken by minimum doc id, so selection is fully
    deterministic across runs and partitionings).

    ``clusters`` is any (doc_id, cluster_id) membership frame —
    `near_dup_clusters` output, an exact-dup fingerprint grouping, or an
    external assignment. ``scores`` maps doc_id -> a quality score (token
    count, a classifier probability, an LM perplexity negated — anything
    orderable); members missing from ``scores`` rank below every scored
    member (NULL sorts last) and among themselves by min id.

    Returns (doc_id, cluster_id, cluster_size, score, keep). `keep` marks
    exactly one row per cluster. The drop list is ``filter(~keep)``; the
    deduplicated corpus is ``docs.join(drop_list, id, "left_anti")``.

    Scale shape: the join and the rank window touch ONLY the cluster
    membership table — sized by the duplicate count, orders of magnitude
    smaller than the corpus — never document payloads. The scores frame is
    filtered to cluster members via the join itself (Catalyst pushes the
    equi-join; with a small membership table AQE converts it to a broadcast
    join), so a corpus-wide score column costs one column-pruned scan. The
    rank shuffle partitions by cluster_id; near-dup clusters are near-cliques
    of bounded size, so no skew beyond AQE's reach.
    """
    m = clusters.select(
        F.col(id_col).alias("doc_id"),
        "cluster_id",
        *(["cluster_size"] if "cluster_size" in clusters.columns else []),
    )
    s = scores.select(F.col(id_col).alias("doc_id"),
                      F.col(score_col).alias("score"))
    joined = m.join(s, "doc_id", "left")
    if "cluster_size" not in joined.columns:
        joined = joined.withColumn(
            "cluster_size",
            F.count(F.lit(1)).over(Window.partitionBy("cluster_id")).cast("long"))
    rk = Window.partitionBy("cluster_id").orderBy(
        F.col("score").desc_nulls_last(), F.col("doc_id").asc())
    return (
        joined
        .withColumn("keep", F.row_number().over(rk) == 1)
        .select("doc_id", "cluster_id", "cluster_size", "score", "keep")
    )


def dedup_corpus(
    docs: DataFrame,
    pairs: DataFrame,
    scores: DataFrame,
    id_col: str = "doc_id",
    score_col: str = "score",
    src: str = "doc_a",
    dst: str = "doc_b",
) -> DataFrame:
    """End-to-end dedup: pairs -> components -> best-quality survivor ->
    corpus minus the losers. Docs in no cluster pass through untouched; one
    left-anti join against the (small) drop list is the only corpus-wide op.
    """
    members = near_dup_clusters(pairs, src=src, dst=dst).select(
        F.col("doc_id").alias(id_col), "cluster_id", "cluster_size")
    drops = (
        survivor_selection(members, scores, id_col=id_col, score_col=score_col)
        .filter(~F.col("keep"))
        .select(F.col("doc_id").alias(id_col))
    )
    return docs.join(drops, id_col, "left_anti")
