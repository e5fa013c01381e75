"""Bloom-filter point-lookup index over the pure-Python Iceberg tables.

What the index must guarantee (dcspark/bloomfilter.py):
- NO false negatives ever: every file actually holding a probed value
  survives pruning, so lookup results equal a full-scan filter exactly.
- Real pruning: on random high-cardinality keys (where min/max stats
  can't discriminate), probing a few ids must open far fewer files than
  the table holds.
- Files written before the index existed always survive (absence of an
  index is not evidence of absence of a row); `build_blooms` backfills.
- Compaction rewrites index themselves (blooms ride `_write_data_files`).
"""
import os

import pytest
from pyspark.sql import functions as F, types as T

from dcspark.bloomfilter import (
    _build_bits, _test_bits, bloom_frame, BITS_PER_ENTRY, NUM_HASHES)
from dcspark.iceberg import IcebergTable

import numpy as np


def _mk(spark, tmp_path, n=3000, commits=3, props=None):
    loc = os.path.join(str(tmp_path), "tbl")
    schema = T.StructType([
        T.StructField("clip_id", T.StringType(), False),
        T.StructField("score", T.LongType(), False),
    ])
    t = IcebergTable.create(loc, schema, properties=props)
    per = n // commits
    for c in range(commits):
        df = (spark.range(c * per, (c + 1) * per, 1, 4)
              .select(F.md5(F.col("id").cast("string")).alias("clip_id"),
                      F.col("id").alias("score")))
        t.append(df)
    return t


def _ids_for(spark, ids):
    return [r.clip_id for r in
            spark.createDataFrame([(i,) for i in ids], "id long")
            .select(F.md5(F.col("id").cast("string")).alias("clip_id"))
            .collect()]


def test_bitset_roundtrip_no_false_negatives():
    rng = np.random.default_rng(7)
    h1 = rng.integers(-2**31, 2**31, 5000, dtype=np.int64)
    h2 = rng.integers(-2**62, 2**62, 5000, dtype=np.int64)
    m = ((5000 * BITS_PER_ENTRY + 63) // 64) * 64
    bits = _build_bits(h1, h2, m, NUM_HASHES)
    assert _test_bits(bits, m, NUM_HASHES, h1, h2).all()
    # absent probes: fpp in the ballpark of the 10-bits/7-hash design
    q1 = rng.integers(-2**31, 2**31, 20000, dtype=np.int64)
    q2 = rng.integers(-2**62, 2**62, 20000, dtype=np.int64)
    fpp = _test_bits(bits, m, NUM_HASHES, q1, q2).mean()
    assert fpp < 0.03


def test_lookup_exact_and_pruned(spark, tmp_path):
    t = _mk(spark, tmp_path, props={"bloom.columns": "clip_id"})
    probe = _ids_for(spark, [5, 777, 1500, 2999])
    surv, cand, _, _ = t.lookup_plan(spark, "clip_id", probe)
    assert len(cand) > 4  # stats can't prune random md5 ids
    assert 0 < len(surv) < len(cand)
    got = {(r.clip_id, r.score) for r in
           t.lookup(spark, "clip_id", probe).collect()}
    want = {(r.clip_id, r.score) for r in
            t.read(spark).filter(F.col("clip_id").isin(probe)).collect()}
    assert got == want and len(got) == 4


def test_absent_probe_reads_few_files(spark, tmp_path):
    t = _mk(spark, tmp_path, props={"bloom.columns": "clip_id"})
    surv, cand, _, _ = t.lookup_plan(
        spark, "clip_id", ["no-such-id-1", "no-such-id-2"])
    assert len(surv) <= len(cand) // 2
    assert t.lookup(spark, "clip_id", ["no-such-id-1"]).count() == 0


def test_preindex_files_always_survive(spark, tmp_path):
    # first commits land WITHOUT the property; enable later; backfill
    t = _mk(spark, tmp_path, props=None)
    md = t.metadata()
    md["properties"]["bloom.columns"] = "clip_id"
    t._commit_metadata(md, expected_version=t._version())
    df = (spark.range(3000, 4000, 1, 2)
          .select(F.md5(F.col("id").cast("string")).alias("clip_id"),
                  F.col("id").alias("score")))
    t.append(df)  # this commit IS indexed
    probe = _ids_for(spark, [10, 3500])
    surv, cand, _, _ = t.lookup_plan(spark, "clip_id", probe)
    # unindexed files all survive; indexed ones prune
    assert len(surv) < len(cand)
    got = {r.score for r in t.lookup(spark, "clip_id", probe).collect()}
    assert got == {10, 3500}
    # backfill indexes the old files, pruning tightens, results unchanged
    n_backfilled = t.build_blooms(spark)
    assert n_backfilled > 0
    surv2, cand2, _, _ = t.lookup_plan(spark, "clip_id", probe)
    assert len(surv2) < len(surv)
    got2 = {r.score for r in t.lookup(spark, "clip_id", probe).collect()}
    assert got2 == {10, 3500}
    assert t.build_blooms(spark) == 0  # idempotent


def test_compaction_reindexes(spark, tmp_path):
    t = _mk(spark, tmp_path, n=1200, commits=4,
            props={"bloom.columns": "clip_id"})
    t.compact(spark)
    probe = _ids_for(spark, [3, 1100])
    got = {r.score for r in t.lookup(spark, "clip_id", probe).collect()}
    assert got == {3, 1100}
    # absent ids still prune against the post-compaction blooms
    surv, cand, _, _ = t.lookup_plan(spark, "clip_id", ["nope"])
    assert len(surv) <= len(cand)


def test_int_column_typing(spark, tmp_path):
    # IntegerType and LongType hash differently under Murmur3 — the probe
    # must type through the table schema, not python ints
    loc = os.path.join(str(tmp_path), "ints")
    schema = T.StructType([
        T.StructField("k", T.IntegerType(), False),
        T.StructField("v", T.StringType(), False),
    ])
    t = IcebergTable.create(loc, schema,
                            properties={"bloom.columns": "k"})
    t.append(spark.range(0, 500, 1, 2).select(
        F.col("id").cast("int").alias("k"),
        F.md5(F.col("id").cast("string")).alias("v")))
    got = {r.k for r in t.lookup(spark, "k", [7, 450]).collect()}
    assert got == {7, 450}


def test_read_where_prunes_transparently(spark, tmp_path):
    # read(where=[(col, "in"/"=", ...)]) must consult blooms without the
    # caller ever naming the index — and stay exact
    t = _mk(spark, tmp_path, props={"bloom.columns": "clip_id"})
    probe = _ids_for(spark, [42, 2048])
    got = {r.score for r in
           t.read(spark, where=[("clip_id", "in", probe)]).collect()}
    assert got == {42, 2048}
    one = _ids_for(spark, [99])[0]
    assert [r.score for r in
            t.read(spark, where=[("clip_id", "=", one)]).collect()] == [99]
    # absent key: bloom prunes everything (or nearly), result is empty
    assert t.read(spark, where=[("clip_id", "=", "~absent~")]).count() == 0


def test_bloom_frame_one_row_per_file_col(spark, tmp_path):
    p = os.path.join(str(tmp_path), "plain")
    spark.range(0, 100, 1, 3).select(
        F.md5(F.col("id").cast("string")).alias("a"),
        F.col("id").alias("b")).write.parquet(p)
    bf = bloom_frame(spark, [p], ["a", "b"]).collect()
    files = {r.file_path for r in bf}
    assert len(bf) == 2 * len(files)
    assert all(r.k == NUM_HASHES and r.m % 64 == 0 and len(r.bits) == r.m // 8
               for r in bf)
