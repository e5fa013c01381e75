"""File-level Bloom-filter index for the pure-Python Iceberg tables.

The scale problem this solves: manifest column stats ([lower, upper]
envelopes, dcspark/iceberg.py `file_may_match`) prune range predicates
well on *sorted* columns, but a point lookup on a high-cardinality
unsorted key (``clip_id IN (...)`` over random uuid-ish ids) matches every
file's envelope — at 10^12 rows a "fetch these 1000 clips" query scans the
whole table. Real Iceberg answers this with Puffin stat blobs and
parquet-level bloom filters; this module is the same idea as a sidecar
dataset the planner consults *before* opening any data file:

- **Build** (`bloom_frame`): ONE column-pruned scan over freshly written
  data files emits ``(file_path, column, h1, h2)`` where ``h1 = F.hash``
  (Spark's Murmur3, seed 42) and ``h2 = F.xxhash64`` — both JVM
  whole-stage-codegen; Python never hashes a value. A per-(file, column)
  ``applyInPandas`` sets ``k`` double-hashed bits (Kirsch–Mitzenmacher:
  ``pos_i = (h1 + i*h2) mod m``) into a numpy bitset, sized at
  ``BITS_PER_ENTRY`` bits per row (10 bits, k=7 -> ~0.8% fpp). The bloom
  frame is written as parquet straight from the executors — it is never
  collected, so a 10k-file commit on a 1000-executor cluster builds and
  lands its blooms fully distributed.
- **Store**: ``<table>/metadata/blooms/<commit>/`` parquet, rows
  ``(file_path, column, m, k, n, bits)``. ~``10/8`` bytes per row per
  indexed column (a 1M-row file -> ~1.2 MB per column). Stale rows for
  compacted-away files are harmless: pruning only ever *intersects* the
  planner's candidate list.
- **Probe** (`prune_files`): the probe literals are hashed by the SAME
  JVM functions (a one-row-per-probe Spark job, so int/long/string typing
  matches the build exactly), then a distributed job over the bloom
  dataset tests all probes against each candidate file's bitset
  (vectorized numpy, one pandas batch per file) and returns only the
  surviving file paths. The driver never holds more than the candidate
  file list. Files with no bloom row (written before the index was
  enabled) always survive — a bloom can only skip, never lie: false
  negatives are impossible by construction, and the final read re-applies
  the exact ``IN`` predicate so false positives cost IO, not correctness.

Used by `IcebergTable.lookup` / `read(where=[("clip_id", "in", ids)])`
(dcspark/iceberg.py) when the table property ``bloom.columns`` is set.
No reference counterpart: datacontract-cli delegates all IO to the
backing engine; this is the 10^12-row point-lookup path the north rule's
Iceberg surface needs.
"""
from __future__ import annotations

import os
from typing import Any, Dict, List, Optional, Sequence, Tuple

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession, functions as F, types as T

BLOOM_PROP = "bloom.columns"          # table property: comma-separated cols
BITS_PER_ENTRY = 10                   # m = 10 * n  -> fpp ~= 0.8% at k=7
NUM_HASHES = 7
MIN_BITS = 8192                       # floor so tiny files still discriminate

BLOOM_SCHEMA = T.StructType([
    T.StructField("file_path", T.StringType(), False),
    T.StructField("column", T.StringType(), False),
    T.StructField("m", T.LongType(), False),
    T.StructField("k", T.IntegerType(), False),
    T.StructField("n", T.LongType(), False),
    T.StructField("bits", T.BinaryType(), False),
])


def _size_bits(n: int) -> int:
    m = max(MIN_BITS, n * BITS_PER_ENTRY)
    return (m + 63) // 64 * 64


def _positions(h1: np.ndarray, h2: np.ndarray, k: int, m: int) -> np.ndarray:
    """(n, k) bit positions via double hashing; h2 forced odd so the k
    probes never collapse onto one position when h2 % m == 0."""
    h1 = h1.astype(np.uint64) & np.uint64(0xFFFFFFFF)
    h2 = (h2.astype(np.uint64) | np.uint64(1))
    i = np.arange(k, dtype=np.uint64)[None, :]
    return ((h1[:, None] + i * h2[:, None]) % np.uint64(m)).astype(np.int64)


def _build_bits(h1: np.ndarray, h2: np.ndarray, m: int, k: int) -> bytes:
    bits = np.zeros(m // 8, dtype=np.uint8)
    # chunk so a 10M-row file never materializes a 10M x k position matrix
    step = 1 << 18
    for s in range(0, len(h1), step):
        pos = _positions(h1[s:s + step], h2[s:s + step], k, m)
        np.bitwise_or.at(bits, pos >> 3, (1 << (pos & 7)).astype(np.uint8))
    return bits.tobytes()


def _test_bits(bits: bytes, m: int, k: int,
               h1: np.ndarray, h2: np.ndarray) -> np.ndarray:
    """Per-probe membership (all k bits set), vectorized."""
    arr = np.frombuffer(bits, dtype=np.uint8)
    pos = _positions(h1, h2, k, m)
    got = (arr[pos >> 3] & (1 << (pos & 7)).astype(np.uint8)) != 0
    return got.all(axis=1)


def _hash_cols(c: str):
    return (F.hash(F.col(c)).alias("h1"), F.xxhash64(F.col(c)).alias("h2"))


def bloom_frame(spark: SparkSession, paths: Sequence[str],
                cols: Sequence[str]) -> DataFrame:
    """(file_path, column, m, k, n, bits) for every (data file, column).

    One scan, pruned to the indexed columns; hashing is JVM codegen
    (`F.hash`/`F.xxhash64`); the bitset build is a vectorized pandas pass
    per (file, column) group. NULLs are skipped — null presence is already
    tracked by manifest null counts and `is_null` predicates never consult
    blooms.
    """
    src = spark.read.parquet(*list(paths)).select(
        F.input_file_name().alias("file_path"),
        F.explode(F.array(*[
            F.struct(F.lit(c).alias("column"), *_hash_cols(c),
                     F.col(c).isNull().alias("is_null"))
            for c in cols])).alias("p"),
    ).select("file_path", "p.*").filter(~F.col("is_null")).drop("is_null")

    def fold(pdf: pd.DataFrame) -> pd.DataFrame:
        n = len(pdf)
        m = _size_bits(n)
        bits = _build_bits(pdf["h1"].to_numpy(), pdf["h2"].to_numpy(),
                           m, NUM_HASHES)
        return pd.DataFrame({
            "file_path": [pdf["file_path"].iloc[0]],
            "column": [pdf["column"].iloc[0]],
            "m": [m], "k": [NUM_HASHES], "n": [n],
            "bits": [bits],
        })

    return src.groupBy("file_path", "column").applyInPandas(
        fold, schema=BLOOM_SCHEMA)


def write_blooms(spark: SparkSession, blooms_dir: str, commit_id: str,
                 paths: Sequence[str], cols: Sequence[str]) -> str:
    """Build + land the bloom sidecar for one commit's data files.

    Written executor-side as parquet (never collected); returns the
    sidecar directory."""
    out = os.path.join(blooms_dir, commit_id)
    bloom_frame(spark, paths, cols).write.parquet(out)
    return out


def probe_hashes(spark: SparkSession, values: Sequence[Any],
                 dtype: T.DataType) -> Tuple[List[int], List[int]]:
    """Hash the probe literals with the SAME JVM functions and the SAME
    column type the build used (IntegerType and LongType hash differently
    under Murmur3 — typing through the table schema is what makes probe
    and build agree)."""
    schema = T.StructType([T.StructField("v", dtype, True)])
    pdf = spark.createDataFrame([(v,) for v in values], schema)
    rows = pdf.select(F.hash("v").alias("h1"),
                      F.xxhash64("v").alias("h2")).collect()
    return [r.h1 for r in rows], [r.h2 for r in rows]


def prune_files(
    spark: SparkSession,
    blooms_dir: str,
    column: str,
    values: Sequence[Any],
    dtype: T.DataType,
    candidates: Sequence[str],
) -> List[str]:
    """Candidate file paths that might contain ANY of ``values``.

    Distributed: the bloom dataset is scanned as a DataFrame, candidates
    are semi-joined in, and each file's bitset tests all probes in one
    vectorized pandas batch. Only the surviving path list (small by
    construction) returns to the driver. Files without a bloom row are
    kept — absence of an index is never evidence of absence of a row.
    """
    if not candidates:
        return []
    dirs = []
    if os.path.isdir(blooms_dir):
        dirs = [os.path.join(blooms_dir, d) for d in sorted(os.listdir(blooms_dir))]
        dirs = [d for d in dirs if os.path.isdir(d)]
    if not dirs:
        return list(candidates)
    h1, h2 = probe_hashes(spark, values, dtype)
    a1 = np.asarray(h1, dtype=np.int64)
    a2 = np.asarray(h2, dtype=np.int64)

    cand_df = spark.createDataFrame([(p,) for p in candidates], "file_path string")
    blooms = (spark.read.parquet(*dirs)
              .filter(F.col("column") == column)
              .join(F.broadcast(cand_df), "file_path"))

    def test(pdf: pd.DataFrame) -> pd.DataFrame:
        # one row per (file, column) group; the probe test inside is
        # vectorized over all probe values at once
        hit = [bool(_test_bits(row["bits"], int(row["m"]), int(row["k"]),
                               a1, a2).any())
               for _, row in pdf.iterrows()]
        return pd.DataFrame({"file_path": pdf["file_path"], "hit": hit})

    rows = blooms.mapInPandas(
        lambda it: (test(pdf) for pdf in it),
        schema="file_path string, hit boolean").collect()
    indexed = {r.file_path for r in rows}
    hit_set = {r.file_path for r in rows if r.hit}
    return [p for p in candidates if p in hit_set or p not in indexed]


# ---------------------------------------------------------------------------
# single-bitset bloom over a column — the approx referential-integrity path
# (engine reference_mode="approx"): parent keys fold into ONE bitset, child
# membership tests run map-only. No reference counterpart (the reference's
# referential check is a TODO); same hash/bitset primitives as the file
# index above, so build and probe can never disagree on hashing.
# ---------------------------------------------------------------------------

def build_column_bloom(df: DataFrame, col: str, *,
                       max_bytes: Optional[int] = None,
                       reduce_partials: int = 8,
                       bits_per_entry: int = BITS_PER_ENTRY
                       ) -> Tuple[int, int, int, Optional[bytes]]:
    """One distributed pass folds every non-null value of ``col`` into a
    single Bloom bitset -> (m, k, n_est, bits).

    Sizing uses ``approx_count_distinct`` (a partial-agg job, no key
    shuffle); duplicates in the input just re-set the same bits, so the
    build reads the RAW column — no distinct shuffle either. When
    ``max_bytes`` is given and the sized bitset would exceed it, returns
    ``bits=None`` WITHOUT scanning again — the caller owns the fallback
    (and can log with the projected m / n_est). Sizing lives here only, so
    the budget check and the build can never disagree.

    Hashing is JVM codegen (F.hash / F.xxhash64) at FULL scan parallelism:
    each input partition folds its hashes into one partial bitset row
    (m/8 bytes) in a single Arrow pass, the partial rows — tiny relative to
    the scan — shuffle down to ``reduce_partials`` tasks for a tree OR, and
    the driver ORs at most that many arrays. No coalesce narrows the scan
    stage (a coalesce would cap the hash+fold work at the partial count —
    exactly wrong on the big-parent case this serves).
    """
    src = df.select(F.col(col).alias("__v")).filter(F.col("__v").isNotNull())
    n_est = int(src.agg(
        F.approx_count_distinct("__v").alias("n")).first()["n"] or 0)
    # bits_per_entry: fpp knob (default 10 bits -> ~0.8% at k=7; e.g. 64
    # bits -> ~1e-7 when a caller needs near-exact membership at scale)
    m = max(MIN_BITS,
            max(1, int(n_est * 1.2)) * bits_per_entry)  # ACD headroom
    m = (m + 63) // 64 * 64
    k = NUM_HASHES
    if max_bytes is not None and m // 8 > max_bytes:
        return m, k, n_est, None
    hashes = src.select(F.hash("__v").alias("h1"),
                        F.xxhash64("__v").alias("h2"))

    def fold(batches):
        bits = np.zeros(m // 8, dtype=np.uint8)
        for pdf in batches:
            if len(pdf):
                partial = np.frombuffer(
                    _build_bits(pdf["h1"].to_numpy(), pdf["h2"].to_numpy(),
                                m, k), dtype=np.uint8)
                np.bitwise_or(bits, partial, out=bits)
        yield pd.DataFrame({"bits": [bits.tobytes()]})

    def fold_or(batches):
        bits = np.zeros(m // 8, dtype=np.uint8)
        for pdf in batches:
            for b in pdf["bits"]:
                bits |= np.frombuffer(b, dtype=np.uint8)
        yield pd.DataFrame({"bits": [bits.tobytes()]})

    partials = hashes.mapInPandas(fold, schema="bits binary")
    reduced = partials.repartition(reduce_partials).mapInPandas(
        fold_or, schema="bits binary")
    out = np.zeros(m // 8, dtype=np.uint8)
    # toLocalIterator, not collect: collect materializes all reduce_partials
    # bitsets at once (~8x the budget in driver heap at the 256MB sizing cap,
    # ADVICE r04); streaming ORs one partial at a time, so peak driver memory
    # stays ~2x the bitset regardless of reduce_partials
    for r in reduced.toLocalIterator():
        out |= np.frombuffer(r["bits"], dtype=np.uint8)
    return m, k, n_est, out.tobytes()


def bloom_fpp(m: int, k: int, n: int) -> float:
    """Expected false-positive probability (1 - e^{-kn/m})^k."""
    import math

    if n <= 0:
        return 0.0
    return float((1.0 - math.exp(-k * n / float(m))) ** k)


def non_members(df: DataFrame, col: str, m: int, k: int,
                bits: bytes, keep_cols: Sequence[str] = (),
                null_is_orphan: bool = False) -> DataFrame:
    """Rows of ``df`` whose non-null ``col`` is PROVABLY absent from the
    bloom — a bloom has no false negatives, so every returned row is a true
    non-member; a member-reported row is wrong with probability fpp only.

    MAP-ONLY: hashing is JVM codegen, the membership test one vectorized
    Arrow pass against the broadcast bitset — the 10^12-row child side of a
    referential check never shuffles. Output column: ``__child`` (original
    type preserved).

    Spark never GCs broadcasts on long-lived sessions, so the bitset
    broadcast is exposed as ``out._dcspark_broadcast`` — destroy it once
    every action on the frame (and anything derived from it) has run.

    F.hash/F.xxhash64 are TYPE-dependent (int32 and int64 hash differently
    under Murmur3 — see probe_hashes): the caller must cast ``col`` to the
    exact type the bloom was built from, or every row reports non-member.

    ``keep_cols`` pass through unchanged beside ``__child`` (e.g. a
    partition column for per-partition orphan attribution).

    ``null_is_orphan=True`` keeps NULL ``col`` rows and reports them as
    non-members (they provably match no parent key) instead of dropping
    them — the engine's approx path uses it with a try_cast'ed key, so a
    malformed child key (string 'abc' vs a long parent) records as an
    orphan rather than aborting the run under ANSI cast semantics; the
    caller is responsible for pre-filtering rows that should not count
    (e.g. originally-NULL foreign keys).
    """
    from pyspark.sql import types as _T

    keep = list(keep_cols)
    sel = [F.col(col).alias("__child")] + [F.col(c) for c in keep]
    base = df.select(*sel)
    if not null_is_orphan:
        base = base.filter(F.col("__child").isNotNull())
    fields = list(base.schema.fields)
    hashes = base.select("__child", *keep,
                         F.hash("__child").alias("h1"),
                         F.xxhash64("__child").alias("h2"))
    bc = df.sparkSession.sparkContext.broadcast(bits)
    out_schema = _T.StructType(fields)
    out_cols = ["__child"] + keep

    def probe(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            member = _test_bits(bc.value, m, k,
                                pdf["h1"].to_numpy(), pdf["h2"].to_numpy())
            if null_is_orphan:
                # F.hash(NULL) is the seed, which may collide into the
                # bitset — force NULL keys to non-member explicitly
                member = member & ~pdf["__child"].isna().to_numpy()
            out = pdf.loc[~member, out_cols]
            if len(out):
                yield out

    result = hashes.mapInPandas(probe, schema=out_schema)
    result._dcspark_broadcast = bc
    return result
