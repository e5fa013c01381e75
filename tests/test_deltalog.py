"""Pure-Python Delta Lake protocol (dcspark/deltalog.py).

Covers: create/append/overwrite round-trips, log replay with removes,
version + timestamp time-travel, partitioned tables (values recovered
from the log/hive layout, pruning prunes), checkpoint-seeded replay,
protocol feature rejection, commit conflicts, schema enforcement, and
the io.py `format: delta` fallback integration.
"""

import json
import os

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from dcspark.deltalog import (
    DeltaCommitConflict,
    DeltaProtocolError,
    DeltaTable,
    read_delta_table,
)


@pytest.fixture()
def docs_df(spark):
    return spark.range(120).select(
        F.concat(F.lit("doc-"), F.col("id")).alias("doc_id"),
        (F.col("id") % 3).cast("int").alias("bucket"),
        F.when(F.col("id") % 2 == 0, "en").otherwise("de").alias("lang"),
    )


def test_create_append_read_roundtrip(spark, docs_df, tmp_path):
    loc = str(tmp_path / "tbl")
    t = DeltaTable.create(loc, docs_df.schema)
    v = t.append(docs_df)
    assert v == 1
    back = t.read(spark)
    assert back.count() == 120
    assert sorted(back.collect(), key=lambda r: r["doc_id"]) == \
           sorted(docs_df.collect(), key=lambda r: r["doc_id"])
    # the log is real newline-JSON actions
    with open(os.path.join(loc, "_delta_log",
                           "00000000000000000000.json")) as f:
        actions = [json.loads(x) for x in f if x.strip()]
    kinds = {next(iter(a)) for a in actions}
    assert {"protocol", "metaData", "commitInfo"} <= kinds


def test_version_time_travel_and_overwrite(spark, docs_df, tmp_path):
    loc = str(tmp_path / "tbl")
    t = DeltaTable.create(loc, docs_df.schema)
    v1 = t.append(docs_df.filter("bucket = 0"))
    v2 = t.append(docs_df.filter("bucket = 1"))
    v3 = t.overwrite(docs_df.filter("bucket = 2"))
    assert t.read(spark).count() == 40
    assert t.read(spark, version_as_of=v1).count() == 40
    assert t.read(spark, version_as_of=v2).count() == 80
    assert t.read(spark, version_as_of=v3).count() == 40
    assert t.read(spark, version_as_of=0).count() == 0
    with pytest.raises(ValueError):
        t.read(spark, version_as_of=99)
    # timestamp travel: the newest commit at/before each commit's own stamp
    with open(os.path.join(loc, "_delta_log",
                           f"{v2:020d}.json")) as f:
        ts2 = next(int(json.loads(x)["commitInfo"]["timestamp"])
                   for x in f if "commitInfo" in x)
    assert t.read(spark, timestamp_as_of_ms=ts2).count() in (40, 80)


def test_partitioned_table_prunes_and_recovers_values(spark, docs_df,
                                                      tmp_path):
    loc = str(tmp_path / "tbl")
    t = DeltaTable.create(loc, docs_df.schema,
                          partition_columns=["lang", "bucket"])
    t.append(docs_df)
    # partition values live in the log, not the data files
    adds = t._replay()[0]
    assert all(set(a["partitionValues"]) == {"lang", "bucket"}
               for a in adds.values())
    all_files = t.files()
    pruned = [a for a in t._replay()[0].values()
              if a["partitionValues"]["lang"] == "en"]
    assert 0 < len(pruned) < len(all_files)
    got = t.read(spark, partition_filter={"lang": "en", "bucket": 0})
    rows = got.collect()
    assert len(rows) == 20
    assert all(r["lang"] == "en" and r["bucket"] == 0 for r in rows)
    # full read restores declared schema order + types
    full = t.read(spark)
    assert full.columns == docs_df.columns
    assert dict(full.dtypes)["bucket"] == "int"
    assert full.count() == 120


def test_checkpoint_seeded_replay(spark, docs_df, tmp_path):
    """A parquet checkpoint replaces the JSON prefix: delete the early
    commits, point _last_checkpoint at the snapshot, and replay must still
    reconstruct the same state."""
    loc = str(tmp_path / "tbl")
    t = DeltaTable.create(loc, docs_df.schema)
    t.append(docs_df.filter("bucket = 0"))
    t.append(docs_df.filter("bucket = 1"))
    adds, meta, _proto, v = t._replay()
    # build a checkpoint at v (one row per action, delta checkpoint shape)
    rows = [{"add": a, "metaData": None, "protocol": None}
            for a in adds.values()]
    rows.append({"add": None, "metaData": meta,
                 "protocol": {"minReaderVersion": 1, "minWriterVersion": 2}})
    # write via toJSON-compatible structure: use spark json->parquet round
    import json as _json

    jpath = str(tmp_path / "cp.jsonl")
    with open(jpath, "w") as f:
        for r in rows:
            f.write(_json.dumps({k: v for k, v in r.items()
                                 if v is not None}) + "\n")
    cp_df = spark.read.json(jpath)
    ld = os.path.join(loc, "_delta_log")
    cp_out = str(tmp_path / "cp_out")
    cp_df.coalesce(1).write.parquet(cp_out)
    part = next(n for n in os.listdir(cp_out) if n.endswith(".parquet"))
    os.rename(os.path.join(cp_out, part),
              os.path.join(ld, f"{v:020d}.checkpoint.parquet"))
    with open(os.path.join(ld, "_last_checkpoint"), "w") as f:
        _json.dump({"version": v, "size": len(rows)}, f)
    # remove the replayed JSON prefix — checkpoint must carry the state
    for i in range(0, v + 1):
        os.unlink(os.path.join(ld, f"{i:020d}.json"))
    t2 = DeltaTable(loc)
    assert t2.read(spark).count() == 80
    # appends after the checkpoint still replay on top of it
    t2.append(docs_df.filter("bucket = 2"))
    assert t2.read(spark).count() == 120


def test_protocol_feature_rejection(spark, docs_df, tmp_path):
    loc = str(tmp_path / "tbl")
    t = DeltaTable.create(loc, docs_df.schema)
    t.append(docs_df)
    # simulate a table that requires deletion vectors
    with open(os.path.join(loc, "_delta_log",
                           f"{2:020d}.json"), "w") as f:
        f.write(json.dumps({"protocol": {
            "minReaderVersion": 3, "minWriterVersion": 7,
            "readerFeatures": ["deletionVectors"]}}) + "\n")
    with pytest.raises(DeltaProtocolError, match="deletionVectors"):
        t.read(spark)


def test_commit_conflict_and_schema_enforcement(spark, docs_df, tmp_path):
    loc = str(tmp_path / "tbl")
    t = DeltaTable.create(loc, docs_df.schema)
    t.append(docs_df)
    with pytest.raises(ValueError, match="schema mismatch"):
        t.append(docs_df.drop("lang"))
    with pytest.raises(DeltaCommitConflict):
        t._commit(1, [{"commitInfo": {"timestamp": 0}}])
    with pytest.raises(FileExistsError):
        DeltaTable.create(loc, docs_df.schema)


def test_io_delta_fallback(spark, docs_df, tmp_path):
    from dcspark.io import _read_files
    from dcspark.spec import Server

    loc = str(tmp_path / "docs.delta")
    t = DeltaTable.create(loc, docs_df.schema, partition_columns=["lang"])
    t.append(docs_df)
    server = Server(type="local", format="delta", path=str(tmp_path))
    # dir path resolves to <path>/docs.delta, the table root
    df = _read_files(spark, None, "docs", "delta", str(tmp_path), server)
    assert df.count() == 120
    assert read_delta_table(spark, loc).count() == 120


def test_checkpoint_writer_and_clean_log(spark, docs_df, tmp_path):
    """The protocol's own maintenance pair: checkpoint() compacts state to
    parquet + _last_checkpoint, clean_log() drops the redundant JSON
    prefix; reads and later appends replay seeded from the checkpoint."""
    loc = str(tmp_path / "tbl")
    t = DeltaTable.create(loc, docs_df.schema,
                          partition_columns=["lang"])
    t.append(docs_df.filter("bucket = 0"))
    t.append(docs_df.filter("bucket = 1"))
    cp = t.checkpoint()
    assert os.path.exists(cp)
    removed = t.clean_log()
    assert removed == 3  # commits 0..2 now redundant
    t2 = DeltaTable(loc)
    assert t2.read(spark).count() == 80
    # partition pruning still works from checkpoint-carried adds
    assert t2.read(spark, partition_filter={"lang": "en"})         .filter("lang = 'en'").count() == 40
    # appends after the checkpoint replay on top of it
    t2.append(docs_df.filter("bucket = 2"))
    assert t2.read(spark).count() == 120
    # roll the checkpoint forward and clean again
    t2.checkpoint()
    assert t2.clean_log() == 1
    assert DeltaTable(loc).read(spark).count() == 120
    # travel below a cleaned checkpoint is gone, like Delta's log retention
    with pytest.raises(FileNotFoundError):
        DeltaTable(loc).read(spark, version_as_of=1)


def test_checkpoint_unpartitioned_and_guard(spark, docs_df, tmp_path):
    loc = str(tmp_path / "tbl")
    t = DeltaTable.create(loc, docs_df.schema)
    with pytest.raises(ValueError, match="requires a checkpoint"):
        t.clean_log()
    t.append(docs_df)
    t.checkpoint()
    t.clean_log()
    assert DeltaTable(loc).read(spark).count() == 120
