"""Regression pins for the round-4 deltalog.py review findings."""

import json
import os

import pytest
from pyspark.sql import functions as F

from dcspark.deltalog import (DeltaProtocolError, DeltaTable,
                              _delta_partition_literal)


def _mk(spark, tmp_path, rows=10, partition_by=None):
    loc = str(tmp_path / "t")
    df = spark.range(rows).select(
        F.col("id"), (F.col("id") % 2 == 0).alias("flag"))
    t = DeltaTable.create(loc, df.schema, partition_columns=partition_by)
    t.append(df)
    return t, loc


def test_reader_v2_column_mapping_rejected(spark, tmp_path):
    """minReaderVersion=2 (column mapping) tables carry NO readerFeatures
    list; gating the guard on the list let them through to be silently
    misread (physical col-<uuid> names vs logical schema)."""
    t, loc = _mk(spark, tmp_path)
    # rewrite commit 0's protocol action to reader v2
    p0 = os.path.join(loc, "_delta_log", "%020d.json" % 0)
    lines = [json.loads(l) for l in open(p0) if l.strip()]
    for act in lines:
        if "protocol" in act:
            act["protocol"]["minReaderVersion"] = 2
    with open(p0, "w") as f:
        for act in lines:
            f.write(json.dumps(act) + "\n")
    with pytest.raises(DeltaProtocolError, match="columnMapping"):
        t.read(spark)


def test_replay_raises_on_log_gap(spark, tmp_path):
    """A missing commit in the middle of the log is corruption, not
    something to silently skip (the old guard only fired before the first
    add was seen — a gap AFTER any add returned a stale snapshot)."""
    t, loc = _mk(spark, tmp_path)
    t.append(spark.range(5).select(F.col("id"), F.lit(True).alias("flag")))
    t.append(spark.range(5).select(F.col("id"), F.lit(False).alias("flag")))
    os.unlink(os.path.join(loc, "_delta_log", "%020d.json" % 1))
    with pytest.raises(FileNotFoundError, match="missing Delta commit 1"):
        t.read(spark)


def test_boolean_partition_filter_matches(spark, tmp_path):
    """Delta serializes boolean partition values as 'true'/'false'; Python
    str(True) is 'True', which matched nothing and pruned every file."""
    loc = str(tmp_path / "t")
    df = spark.range(10).select(
        F.col("id"), (F.col("id") % 2 == 0).alias("flag"))
    t = DeltaTable.create(loc, df.schema, partition_columns=["flag"])
    t.append(df)
    got = t.read(spark, partition_filter={"flag": True})
    assert got.count() == 5
    assert _delta_partition_literal(True) == "true"
    assert _delta_partition_literal(False) == "false"
    assert _delta_partition_literal(None) is None
    assert _delta_partition_literal(7) == "7"


def test_checkpoint_is_idempotent_and_retains_tombstones(spark, tmp_path):
    """checkpoint() twice at the same version must not tear the file the
    pointer references (atomic tmp+replace), and remove tombstones within
    the retention window survive into the checkpoint for external VACUUMs."""
    import pyarrow.parquet as pq

    t, loc = _mk(spark, tmp_path)
    t.overwrite(spark.range(4).select(
        F.col("id"), F.lit(True).alias("flag")))   # creates remove tombstones
    p1 = t.checkpoint()
    p2 = t.checkpoint()
    assert p1 == p2
    rows = pq.read_table(p1).to_pylist()
    removes = [r for r in rows if r.get("remove")]
    assert removes, "unexpired tombstones must be retained in the checkpoint"
    # and the table still reads correctly from the checkpoint
    t.clean_log()
    assert t.read(spark).count() == 4


def test_checkpoint_pointer_never_regresses(spark, tmp_path):
    t, loc = _mk(spark, tmp_path)
    t.append(spark.range(3).select(F.col("id"), F.lit(True).alias("flag")))
    t.append(spark.range(3).select(F.col("id"), F.lit(False).alias("flag")))
    t.checkpoint()          # at latest (v2)
    lc = os.path.join(loc, "_delta_log", "_last_checkpoint")
    v_after = json.load(open(lc))["version"]
    t.checkpoint(version=1)  # older snapshot export must not move the pointer
    assert json.load(open(lc))["version"] == v_after


def test_null_partition_value_survives_checkpoint(spark, tmp_path):
    """A null partition value must round-trip through checkpoint compaction:
    dropping it changed partition_filter results after clean_log."""
    loc = str(tmp_path / "t")
    df = spark.createDataFrame(
        [(1, "a"), (2, "a"), (3, None)], "id bigint, p string")
    t = DeltaTable.create(loc, df.schema, partition_columns=["p"])
    t.append(df)
    before = t.read(spark, partition_filter={"p": "a"}).count()
    t.checkpoint()
    t.clean_log()
    after = t.read(spark, partition_filter={"p": "a"}).count()
    assert after == before == 2
