"""Cross-table reconciliation: bucketed row-hash diff between two tables.

The validation-tier question the contract engine can't answer by itself:
"is the replicated / migrated / re-ingested copy of this table EXACTLY the
source?" Full-row comparison of two 100 TB tables by joining them on the key
is a worst-case shuffle of both sides. This module does what cross-database
diff tools (e.g. Merkle-tree / segment-hash reconcilers) do, expressed in two
DataFrame passes:

1. **Summary pass** — each side is scanned ONCE and folded to ``buckets``
   rows: ``bucket = pmod(xxhash64(keys), buckets)``, and per bucket a
   ``(row_count, content_digest)`` pair where the digest is the SUM of each
   row's xxhash64 over the NULL-normalized compared columns (sum in
   decimal(38,0), so it is order-independent, mergeable, and cannot
   overflow). Shuffle volume: ``buckets`` rows per side — independent of
   table size. Equal buckets prove (to 64-bit-collision confidence) the two
   slices are identical and are never touched again.
2. **Drill pass** — only rows hashing into DIFFERING buckets are re-read and
   FULL-OUTER-joined on the key columns. The bucket filter is applied before
   the shuffle, so join traffic is proportional to the amount of drift, not
   the table size: a 0.001%-drift table diff shuffles ~0.001% of the rows.
   Each side is pre-aggregated PER KEY (count + content digest +
   representative row) before the join, so duplicate keys can never
   cross-product. Key classification: ``missing_in_right`` /
   ``missing_in_left`` / ``cardinality_changed`` (same key, different copy
   count — e.g. a double-ingested batch of identical rows, invisible to
   per-column comparison) / ``changed`` (with the exact changed-column list
   via null-safe comparison of the representatives); keys that merely share
   a bucket with a drifted key compare equal and are dropped. All hashing is
   over NATIVE column values (see ``_col_hash``), so binary payload columns
   compare byte-exact — no lossy string casts anywhere.

Duplicate keys are supported by the digests (sums don't care) but make the
drill join ambiguous (full-outer on a duplicated key cross-products);
``reconcile`` therefore ESTIMATES key duplicates on both sides during the
summary pass (HLL, 1% rsd) and reports them — dedup or refine the key before
trusting row-level attribution.

Everything is JVM expressions (xxhash64, decimal sum, struct compare) — no
UDF, no driver-side row data; only the ``buckets``-row summaries and the
requested diff sample are ever collected.
"""

from __future__ import annotations

from dataclasses import dataclass, field as dc_field
from typing import Dict, List, Optional

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# NULL normalization: xxhash64 SKIPS null args entirely, which would make
# ("a", NULL) and (NULL, "a") hash identically — so each column is hashed
# SEPARATELY first (a NULL column folds zero children into the seed and
# yields the constant 42, preserving the column's position), and the row
# digest hashes the per-column hashes. Hashing the native values — never a
# string cast — keeps binary columns (audio payloads), decimals, and nested
# types byte-exact: a lossy cast could let two different payloads collide.


def _col_hash(c: str) -> Column:
    return F.xxhash64(F.col(c))


def _row_digest(cols: List[str]) -> Column:
    # no compare columns (keys cover every shared column): the content digest
    # is constant and reconcile degrades to a key-multiset comparison —
    # a zero-arg xxhash64 would be an AnalysisException
    if not cols:
        return F.lit(0).cast("bigint")
    return F.xxhash64(*[_col_hash(c) for c in cols])


def _bucket(keys: List[str], buckets: int) -> Column:
    return F.pmod(F.xxhash64(*[_col_hash(k) for k in keys]), F.lit(buckets))


def bucket_summary(
    df: DataFrame, keys: List[str], cols: List[str], buckets: int,
    dup_keys: bool = True,
) -> DataFrame:
    """One scan -> ``buckets`` rows of (bucket, n_rows, digest, n_dup_keys).

    digest = SUM(xxhash64(normalized compared columns)) per bucket as
    decimal(38,0): order-independent and overflow-free (|hash| <= 2^63,
    so even 10^18 rows per bucket fit in 38 digits). n_dup_keys is the
    ESTIMATED count of rows beyond the first per key (n_rows minus an HLL
    approx-distinct of the key hash, 1% rsd, floored at 0) — an exact count
    would shuffle every distinct key, which is precisely the cost this
    module exists to avoid; the engine's field_unique check certifies
    exact-zero duplicates when that matters. ``dup_keys=False`` skips the
    per-row HLL update entirely — the keyless multiset proof has no use for
    it, and it is the only non-trivial per-row cost in the hot scan. All
    aggregates are map-side combinable, so the shuffle stays at ``buckets``
    rows.
    """
    aggs = [
        F.count(F.lit(1)).alias("n_rows"),
        F.sum("__rowhash").alias("digest"),
    ]
    sel = [
        _bucket(keys, buckets).alias("__bucket"),
        _row_digest(cols).cast("decimal(38,0)").alias("__rowhash"),
    ]
    if dup_keys:
        sel.append(
            F.xxhash64(*[_col_hash(k) for k in keys]).alias("__keyhash"))
        aggs.append(
            F.greatest(
                F.lit(0),
                F.count(F.lit(1)) - F.approx_count_distinct("__keyhash", 0.01),
            ).alias("n_dup_keys"))
    return df.select(*sel).groupBy("__bucket").agg(*aggs)


@dataclass
class MultisetResult:
    """Outcome of a keyless whole-row multiset comparison."""

    identical: bool
    buckets_total: int
    buckets_differing: int
    rows_left: int
    rows_right: int


def multiset_equal(
    left: DataFrame, right: DataFrame, buckets: int = 4096
) -> MultisetResult:
    """Prove (to 64-bit-collision confidence) that two tables hold the same
    row MULTISET — no key column needed. Each side folds to ``buckets``
    (count, digest-sum) rows in one scan over the whole row (every column is
    both bucket key and content), so two identical 100 TB tables compare
    with zero row shuffle. The use case is rewrite verification: a
    compaction / re-clustering / migration that must not change logical
    content, where no per-key attribution is wanted — reach for
    ``reconcile`` when it is."""
    if sorted(left.columns) != sorted(right.columns):
        raise ValueError(
            f"column sets differ: {sorted(left.columns)} vs {sorted(right.columns)}"
        )
    cols = list(left.columns)
    ls = bucket_summary(left, cols, cols, buckets, dup_keys=False).alias("l")
    rs = bucket_summary(right, cols, cols, buckets, dup_keys=False).alias("r")
    merged = ls.join(rs, on="__bucket", how="full_outer").select(
        F.coalesce(F.col("l.n_rows"), F.lit(0)).alias("ln"),
        F.coalesce(F.col("r.n_rows"), F.lit(0)).alias("rn"),
        F.coalesce(F.col("l.digest"), F.lit(0)).alias("ld"),
        F.coalesce(F.col("r.digest"), F.lit(0)).alias("rd"),
    ).collect()
    differing = sum(
        1 for m in merged if m["ln"] != m["rn"] or m["ld"] != m["rd"])
    return MultisetResult(
        identical=differing == 0,
        buckets_total=buckets,
        buckets_differing=differing,
        rows_left=sum(int(m["ln"]) for m in merged),
        rows_right=sum(int(m["rn"]) for m in merged),
    )


@dataclass
class ReconcileResult:
    diff: DataFrame                      # keys + status + changed_cols
    buckets_total: int
    buckets_differing: int
    rows_left: int
    rows_right: int
    dup_keys_left: int
    dup_keys_right: int
    counts: Dict[str, int] = dc_field(default_factory=dict)  # status -> rows

    @property
    def identical(self) -> bool:
        return self.buckets_differing == 0

    def unpersist(self) -> None:
        """Release the cached drill frame (a non-identical result persists
        ``diff`` so counts and the caller's collect/write share one
        execution)."""
        try:
            self.diff.unpersist()
        except Exception:
            pass


def reconcile(
    left: DataFrame,
    right: DataFrame,
    keys: List[str],
    compare_cols: Optional[List[str]] = None,
    buckets: int = 4096,
    count_diff: bool = True,
) -> ReconcileResult:
    """Diff ``right`` against ``left`` on ``keys``.

    ``compare_cols`` defaults to every shared non-key column (in left's
    order). Returns a ReconcileResult whose ``diff`` DataFrame carries the
    key columns plus ``status`` (missing_in_right | missing_in_left |
    cardinality_changed | changed) and ``changed_cols`` (sorted array,
    empty unless changed).
    ``count_diff=False`` skips materializing the per-status counts when the
    caller only wants the lazy diff frame.

    Identical tables cost two single-scan summary passes and a
    ``buckets``-row join — no row ever shuffles. See the module docstring
    for the drift-proportional drill economics.
    """
    if not keys:
        raise ValueError("reconcile needs at least one key column")
    if compare_cols is None:
        shared = [c for c in left.columns if c in set(right.columns)]
        compare_cols = [c for c in shared if c not in set(keys)]
    for side, df in (("left", left), ("right", right)):
        missing = [c for c in list(keys) + list(compare_cols) if c not in df.columns]
        if missing:
            raise ValueError(f"{side} table lacks columns {missing}")

    ls = bucket_summary(left, keys, compare_cols, buckets).alias("l")
    rs = bucket_summary(right, keys, compare_cols, buckets).alias("r")
    merged = ls.join(rs, on="__bucket", how="full_outer").select(
        "__bucket",
        F.coalesce(F.col("l.n_rows"), F.lit(0)).alias("ln"),
        F.coalesce(F.col("r.n_rows"), F.lit(0)).alias("rn"),
        F.coalesce(F.col("l.digest"), F.lit(0)).alias("ld"),
        F.coalesce(F.col("r.digest"), F.lit(0)).alias("rd"),
        F.coalesce(F.col("l.n_dup_keys"), F.lit(0)).alias("ldup"),
        F.coalesce(F.col("r.n_dup_keys"), F.lit(0)).alias("rdup"),
    ).collect()
    rows_left = sum(int(m["ln"]) for m in merged)
    rows_right = sum(int(m["rn"]) for m in merged)
    dup_l = sum(int(m["ldup"]) for m in merged)
    dup_r = sum(int(m["rdup"]) for m in merged)
    differing = sorted(
        int(m["__bucket"]) for m in merged
        if m["ln"] != m["rn"] or m["ld"] != m["rd"]
    )

    spark = left.sparkSession
    if not differing:
        # empty diff frame with faithful key column types
        diff = (
            spark.createDataFrame([], schema=left.select(*keys).schema)
            .withColumn("status", F.lit(""))
            .withColumn("changed_cols", F.array().cast("array<string>"))
        )
        return ReconcileResult(
            diff=diff, buckets_total=buckets, buckets_differing=0,
            rows_left=rows_left, rows_right=rows_right,
            dup_keys_left=dup_l, dup_keys_right=dup_r,
        )

    # drill: ONLY rows in differing buckets are re-read, pre-aggregated PER
    # KEY (count + content digest + a representative row struct) so the join
    # is key-unique on both sides — duplicate keys can never cross-product —
    # and map-side combine keeps the shuffle at one row per drifted key. isin
    # on a literal list is fine for the default 4096 buckets; a pathological
    # all-buckets diff degrades to the per-key diff you'd have written anyway.
    def _side(df: DataFrame, tag: str) -> DataFrame:
        aggs = [
            F.count(F.lit(1)).alias(f"{tag}_n"),
            F.sum(_row_digest(compare_cols).cast("decimal(38,0)"))
            .alias(f"{tag}_d"),
            # representative row for changed-column attribution; with no
            # compare columns a constant presence marker serves the
            # missing-side classification (min(struct()) has no meaning)
            (F.min(F.struct(*[F.col(c) for c in compare_cols]))
             if compare_cols else F.lit(1)).alias(f"__{tag}"),
        ]
        return (
            df.withColumn("__bucket", _bucket(keys, buckets))
            .filter(F.col("__bucket").isin(differing))
            .groupBy(*[F.col(k) for k in keys])
            .agg(*aggs)
        )

    l2 = _side(left, "l").alias("L")
    r2 = _side(right, "r").alias("R")
    # NULL-SAFE key join: a NULL key component is a legitimate key value here
    # (the bucket hash already treats it as one); plain equality would report
    # a byte-identical NULL-keyed row as missing from BOTH sides whenever its
    # bucket drifts
    cond = F.col(f"L.`{keys[0]}`").eqNullSafe(F.col(f"R.`{keys[0]}`"))
    for k in keys[1:]:
        cond = cond & F.col(f"L.`{k}`").eqNullSafe(F.col(f"R.`{k}`"))
    j = l2.join(r2, on=cond, how="full_outer").select(
        *[F.coalesce(F.col(f"L.`{k}`"), F.col(f"R.`{k}`")).alias(k)
          for k in keys],
        "l_n", "l_d", "__l", "r_n", "r_d", "__r",
    )
    changed = F.array_sort(
        F.array_compact(
            F.array(*[
                F.when(
                    ~F.col(f"__l.{c}").eqNullSafe(F.col(f"__r.{c}")), F.lit(c)
                )
                for c in compare_cols
            ])
        )
    ) if compare_cols else F.array().cast("array<string>")
    diff = (
        j.withColumn(
            "status",
            F.when(F.col("__r").isNull(), F.lit("missing_in_right"))
            .when(F.col("__l").isNull(), F.lit("missing_in_left"))
            # same content multiset but a different number of copies: a pure
            # cardinality drift (e.g. a double-ingested batch of identical
            # rows) that per-column comparison alone can never see
            .when(F.col("l_n") != F.col("r_n"), F.lit("cardinality_changed"))
            .when(F.col("l_d") != F.col("r_d"), F.lit("changed")),
        )
        .filter(F.col("status").isNotNull())
        .withColumn(
            "changed_cols",
            # exact attribution from the representative rows; for duplicated
            # keys (n > 1) the representatives may still compare equal even
            # though the digests differ — the key is reported with an empty
            # list rather than guessing
            F.when(F.col("status") == "changed", changed)
            .otherwise(F.array().cast("array<string>")),
        )
        .select(*keys, "status", "changed_cols")
    )
    # the drill re-reads both tables' differing buckets; persist so the
    # per-status counts AND the caller's collect/write execute it once
    from pyspark import StorageLevel

    diff = diff.persist(StorageLevel.MEMORY_AND_DISK)
    counts: Dict[str, int] = {}
    if count_diff:
        counts = {
            r["status"]: int(r["n"])
            for r in diff.groupBy("status").agg(F.count(F.lit(1)).alias("n")).collect()
        }
    return ReconcileResult(
        diff=diff, buckets_total=buckets, buckets_differing=len(differing),
        rows_left=rows_left, rows_right=rows_right,
        dup_keys_left=dup_l, dup_keys_right=dup_r, counts=counts,
    )
