"""Pure-Python Iceberg v2 table format (dcspark/iceberg.py).

Covers: spec murmur3 test vectors, transform semantics, schema field-id
assignment, create/append/overwrite round-trips, snapshot time-travel (id
and timestamp), partition pruning correctness AND that it actually prunes,
v2 positional deletes, commit conflicts, metadata/manifest structural
spec-compliance, and the io.py source + results-sink integration.
"""

import datetime
import json
import os
import struct

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from dcspark.avrofile import parse_container
from dcspark.iceberg import (
    CommitConflict,
    IcebergTable,
    Transform,
    murmur3_x86_32,
    read_iceberg_table,
    spark_to_iceberg_schema,
    iceberg_to_spark_schema,
    write_results_iceberg,
)


# ---------------------------------------------------------------------------
# murmur3 + transforms (spec Appendix B vectors)
# ---------------------------------------------------------------------------


def test_murmur3_spec_vectors():
    # published bucket-hash test vectors from the Iceberg spec, Appendix B
    assert murmur3_x86_32(struct.pack("<q", 34)) == 2017239379  # int and long
    assert murmur3_x86_32(b"iceberg") == 1210000089  # string (utf-8)
    # date 2017-11-16 = 17486 days from epoch, hashed as a long
    assert murmur3_x86_32(struct.pack("<q", 17486)) == -653330422
    assert murmur3_x86_32(bytes([0, 1, 2, 3])) == -188683207  # binary


def test_transform_parse_and_apply():
    ident = Transform.parse("identity")
    assert ident.apply_py("x", T.StringType()) == "x"
    b16 = Transform.parse("bucket[16]")
    assert 0 <= b16.apply_py(34, T.LongType()) < 16
    # ints and longs bucket identically (both hash 8-byte LE)
    assert b16.apply_py(34, T.IntegerType()) == b16.apply_py(34, T.LongType())
    tr = Transform.parse("truncate[3]")
    assert tr.apply_py("iceberg", T.StringType()) == "ice"
    assert tr.apply_py(-7, T.LongType()) == -9  # floors toward -inf
    assert tr.apply_py(7, T.LongType()) == 6
    day = Transform.parse("day")
    assert day.apply_py(datetime.date(1970, 1, 2), T.DateType()) == 1
    assert Transform.parse("year").apply_py(
        datetime.date(2017, 11, 16), T.DateType()) == 47
    assert Transform.parse("month").apply_py(
        datetime.date(2017, 11, 16), T.DateType()) == (47 * 12 + 10)
    with pytest.raises(ValueError):
        Transform.parse("nope[3]")


def test_transform_spark_matches_python(spark):
    """The executor-side (Spark column) and driver-side (prune) transform
    paths must agree — otherwise pruning would drop live files."""
    df = spark.createDataFrame(
        [(i, f"s{i}", datetime.date(2020, 1, 1 + i % 28)) for i in range(50)],
        "id: long, s: string, d: date")
    for col, dtype, tr in [
        ("id", T.LongType(), "bucket[8]"),
        ("id", T.LongType(), "truncate[10]"),
        ("s", T.StringType(), "truncate[2]"),
        ("s", T.StringType(), "bucket[5]"),
        ("d", T.DateType(), "day"),
        ("d", T.DateType(), "month"),
        ("d", T.DateType(), "year"),
    ]:
        t = Transform.parse(tr)
        got = df.select(F.col(col).alias("v"),
                        t.spark_col(col, dtype).alias("t")).collect()
        for r in got:
            assert t.apply_py(r["v"], dtype) == r["t"], (tr, r["v"])


# ---------------------------------------------------------------------------
# schema conversion
# ---------------------------------------------------------------------------


def test_schema_roundtrip_and_field_ids():
    st = T.StructType([
        T.StructField("a", T.LongType(), False),
        T.StructField("b", T.StringType(), True),
        T.StructField("c", T.StructType([
            T.StructField("x", T.DoubleType(), True),
            T.StructField("y", T.ArrayType(T.IntegerType(), True), True),
        ]), True),
        T.StructField("m", T.MapType(T.StringType(), T.DateType(), True), True),
        T.StructField("dec", T.DecimalType(10, 2), True),
        T.StructField("bin", T.BinaryType(), True),
        T.StructField("ts", T.TimestampType(), True),
    ])
    ice, last = spark_to_iceberg_schema(st)
    ids = []

    def walk(t):
        if isinstance(t, dict):
            if t.get("type") == "struct":
                for f in t["fields"]:
                    ids.append(f["id"])
                    walk(f["type"])
            elif t.get("type") == "list":
                ids.append(t["element-id"])
                walk(t["element"])
            elif t.get("type") == "map":
                ids.append(t["key-id"])
                ids.append(t["value-id"])
                walk(t["value"])

    walk(ice)
    assert sorted(ids) == list(range(1, last + 1))  # unique, dense
    back = iceberg_to_spark_schema(ice)
    assert [f.dataType.simpleString() for f in back.fields] == \
           [f.dataType.simpleString() for f in st.fields]
    assert [f.nullable for f in back.fields] == [f.nullable for f in st.fields]


# ---------------------------------------------------------------------------
# table lifecycle
# ---------------------------------------------------------------------------


@pytest.fixture()
def clips_df(spark):
    return spark.range(200).select(
        F.concat(F.lit("clip-"), F.col("id")).alias("clip_id"),
        (F.col("id") % 4).cast("int").alias("shard"),
        F.when(F.col("id") % 2 == 0, "pcm_s16le").otherwise("ulaw").alias("codec"),
        (F.col("id") * 10 + 100).cast("int").alias("dur_ms"),
    )


def test_create_append_read_roundtrip(spark, clips_df, tmp_path):
    loc = str(tmp_path / "tbl")
    t = IcebergTable.create(loc, clips_df.schema,
                            partition_by=[("codec", "identity")])
    t.append(clips_df)
    back = t.read(spark)
    assert back.count() == 200
    assert sorted(back.columns) == sorted(clips_df.columns)
    a = sorted(clips_df.collect(), key=lambda r: r["clip_id"])
    b = sorted(back.collect(), key=lambda r: r["clip_id"])
    assert a == b


def test_snapshot_time_travel(spark, clips_df, tmp_path):
    loc = str(tmp_path / "tbl")
    t = IcebergTable.create(loc, clips_df.schema)
    s1 = t.append(clips_df.filter("shard = 0"))
    s2 = t.append(clips_df.filter("shard = 1"))
    assert t.read(spark).count() == 100
    assert t.read(spark, snapshot_id=s1).count() == 50
    assert t.read(spark, snapshot_id=s2).count() == 100
    snaps = t.snapshots()
    assert [s["snapshot-id"] for s in snaps] == [s1, s2]
    assert snaps[0]["sequence-number"] == 1 and snaps[1]["sequence-number"] == 2
    # as-of timestamp resolves to the newest snapshot at/before the instant
    assert t.read(spark, as_of_ms=snaps[0]["timestamp-ms"]).count() in (50, 100)
    assert t.read(spark, as_of_ms=snaps[0]["timestamp-ms"] - 1).count() == 0
    with pytest.raises(ValueError):
        t.read(spark, snapshot_id=999)


def test_overwrite_keeps_history(spark, clips_df, tmp_path):
    loc = str(tmp_path / "tbl")
    t = IcebergTable.create(loc, clips_df.schema)
    s1 = t.append(clips_df)
    t.overwrite(clips_df.filter("shard = 2"))
    assert t.read(spark).count() == 50
    assert t.read(spark, snapshot_id=s1).count() == 200
    assert t.snapshots()[-1]["summary"]["operation"] == "overwrite"


def test_partition_pruning_prunes_and_is_correct(spark, clips_df, tmp_path):
    loc = str(tmp_path / "tbl")
    t = IcebergTable.create(
        loc, clips_df.schema,
        partition_by=[("codec", "identity"), ("shard", "identity")])
    t.append(clips_df)
    all_files = t.data_files()
    pruned = t.data_files(partition_filter={"codec": "ulaw", "shard": 1})
    assert 0 < len(pruned) < len(all_files)
    got = t.read(spark, partition_filter={"codec": "ulaw", "shard": 1})
    # identity pruning is exact: no row filter needed
    rows = got.collect()
    assert len(rows) == 50
    assert all(r["codec"] == "ulaw" and r["shard"] == 1 for r in rows)


def test_bucket_partition_prune_agrees_with_rows(spark, tmp_path):
    df = spark.range(300).select(
        F.col("id"), F.concat(F.lit("k"), F.col("id")).alias("k"))
    loc = str(tmp_path / "tbl")
    t = IcebergTable.create(loc, df.schema, partition_by=[("k", "bucket[8]")])
    t.append(df)
    # every row must survive in exactly the bucket its key hashes to
    total = 0
    for _ in range(1):
        for key in ("k0", "k17", "k255"):
            sub = t.read(spark, partition_filter={"k": key}).filter(
                F.col("k") == key)
            assert sub.count() == 1
    assert t.read(spark).count() == 300
    pruned = t.data_files(partition_filter={"k": "k0"})
    assert len(pruned) < len(t.data_files())


def test_positional_delete_and_travel(spark, clips_df, tmp_path):
    loc = str(tmp_path / "tbl")
    t = IcebergTable.create(loc, clips_df.schema,
                            partition_by=[("codec", "identity")])
    s1 = t.append(clips_df)
    s2 = t.delete_where(spark, "dur_ms >= 1100")  # ids >= 100: 100 rows
    cur = t.read(spark)
    assert cur.count() == 100
    assert cur.filter("dur_ms >= 1100").count() == 0
    assert t.read(spark, snapshot_id=s1).count() == 200
    assert t.snapshots()[-1]["summary"]["operation"] == "delete"
    # a second delete stacks on the first
    t.delete_where(spark, "shard = 0")
    assert t.read(spark).count() == 75
    # appended rows after the delete are untouched by it
    more = clips_df.filter("shard = 3").limit(10)
    t.append(more)
    assert t.read(spark).count() == 85


def test_append_schema_mismatch_rejected(spark, clips_df, tmp_path):
    loc = str(tmp_path / "tbl")
    t = IcebergTable.create(loc, clips_df.schema)
    with pytest.raises(ValueError, match="schema mismatch"):
        t.append(clips_df.drop("dur_ms"))
    with pytest.raises(FileExistsError):
        IcebergTable.create(loc, clips_df.schema)


def test_commit_conflict_detected(spark, clips_df, tmp_path):
    loc = str(tmp_path / "tbl")
    t = IcebergTable.create(loc, clips_df.schema)
    md = t.metadata()
    # simulate a racer: the version we'd write next already exists
    racer = t._meta_path(t._version() + 1)
    with open(racer, "w") as f:
        json.dump(md, f)
    with pytest.raises(CommitConflict):
        t._commit_metadata(md, expected_version=t._version() - 1)


# ---------------------------------------------------------------------------
# spec structural compliance
# ---------------------------------------------------------------------------


def test_metadata_structure_is_spec_shaped(spark, clips_df, tmp_path):
    loc = str(tmp_path / "tbl")
    t = IcebergTable.create(loc, clips_df.schema,
                            partition_by=[("codec", "identity")])
    t.append(clips_df)
    md = t.metadata()
    for key in ("format-version", "table-uuid", "location", "last-column-id",
                "schemas", "current-schema-id", "partition-specs",
                "default-spec-id", "snapshots", "current-snapshot-id",
                "last-sequence-number", "snapshot-log", "metadata-log"):
        assert key in md, key
    assert md["format-version"] == 2
    spec = md["partition-specs"][0]["fields"][0]
    assert spec["transform"] == "identity" and spec["field-id"] == 1000
    snap = md["snapshots"][-1]
    for key in ("snapshot-id", "sequence-number", "timestamp-ms",
                "manifest-list", "summary"):
        assert key in snap
    assert snap["summary"]["operation"] == "append"
    # version-hint points at the latest metadata file
    with open(os.path.join(loc, "metadata", "version-hint.text")) as f:
        v = int(f.read())
    assert os.path.exists(os.path.join(loc, "metadata",
                                       f"v{v}.metadata.json"))


def test_manifest_avro_is_spec_shaped(spark, clips_df, tmp_path):
    loc = str(tmp_path / "tbl")
    t = IcebergTable.create(loc, clips_df.schema,
                            partition_by=[("codec", "identity")])
    t.append(clips_df)
    snap = t.snapshots()[-1]
    with open(snap["manifest-list"][7:], "rb") as f:
        schema, rows = parse_container(f.read())
    rows = list(rows)
    names = {f["name"] for f in schema["fields"]}
    fids = {f["name"]: f.get("field-id") for f in schema["fields"]}
    assert {"manifest_path", "manifest_length", "partition_spec_id",
            "added_snapshot_id", "sequence_number", "content"} <= names
    assert fids["manifest_path"] == 500 and fids["added_snapshot_id"] == 503
    m = rows[0]
    assert m["added_rows_count"] == 200
    with open(m["manifest_path"][7:], "rb") as f:
        eschema, entries = parse_container(f.read())
    entries = list(entries)
    efields = {f["name"]: f.get("field-id") for f in eschema["fields"]}
    assert efields["status"] == 0 and efields["data_file"] == 2
    dfs = eschema["fields"][-1]["type"]["fields"]
    dfids = {f["name"]: f.get("field-id") for f in dfs}
    assert dfids["file_path"] == 100 and dfids["record_count"] == 103
    assert all(e["status"] == 1 for e in entries)
    assert sum(e["data_file"]["record_count"] for e in entries) == 200
    assert all(e["data_file"]["file_format"] == "PARQUET" for e in entries)
    assert all(e["data_file"]["partition"]["codec"] in ("ulaw", "pcm_s16le")
               for e in entries)


# ---------------------------------------------------------------------------
# io.py integration
# ---------------------------------------------------------------------------


def test_io_read_iceberg_real_metadata(spark, clips_df, tmp_path):
    from dcspark.io import _read_iceberg
    from dcspark.spec import Server

    root = str(tmp_path)
    loc = os.path.join(root, "clips")
    t = IcebergTable.create(loc, clips_df.schema)
    t.append(clips_df)
    server = Server(type="iceberg", location=root)
    df = _read_iceberg(spark, server, "clips", None)
    assert df.count() == 200
    # helper surface too
    assert read_iceberg_table(spark, loc).count() == 200


def test_results_sink_commits_iceberg_snapshots(spark, tmp_path):
    from dcspark.io import write_results

    res = spark.createDataFrame(
        [("clip-1", "field_required", "pass", 0),
         ("clip-2", "field_required", "fail", 3)],
        "pk: string, check: string, outcome: string, violations: long")
    loc = str(tmp_path / "results_tbl")
    write_results(res, loc, fmt="iceberg")
    write_results(res, loc, fmt="iceberg")
    t = IcebergTable(loc)
    assert t.exists()
    assert len(t.snapshots()) == 2
    assert t.read(spark).count() == 4
    # snapshot isolation on the sink: first run still readable
    first = t.snapshots()[0]["snapshot-id"]
    assert t.read(spark, snapshot_id=first).count() == 2


def test_empty_table_reads_empty_with_schema(spark, clips_df, tmp_path):
    loc = str(tmp_path / "tbl")
    t = IcebergTable.create(loc, clips_df.schema)
    df = t.read(spark)
    assert df.count() == 0
    assert df.columns == clips_df.columns


def test_expire_snapshots_prunes_files_keeps_current(spark, clips_df, tmp_path):
    """expire drops old snapshots + physically deletes unreferenced files;
    current reads are untouched, travel to an expired snapshot raises."""
    loc = str(tmp_path / "tbl")
    t = IcebergTable.create(loc, clips_df.schema)
    s1 = t.append(clips_df.filter("shard = 0"))
    t.overwrite(clips_df.filter("shard = 1"))  # s1's data now unreferenced
    s3 = t.append(clips_df.filter("shard = 2"))
    def _data_files():
        return {os.path.join(dp, f) for dp, _, fs in os.walk(loc)
                for f in fs if f.endswith(".parquet")}

    files_before = _data_files()
    out = t.expire_snapshots(keep_last=2)
    assert out["snapshots_removed"] == 1 and out["files_deleted"] > 0
    files_after = _data_files()
    assert files_after < files_before  # s1's orphaned data physically gone
    t2 = IcebergTable(loc)
    assert [s["snapshot-id"] for s in t2.snapshots()][-1] == s3
    assert t2.read(spark).count() == 100  # shard1 (50) + shard2 (50)
    with pytest.raises(ValueError):
        t2.read(spark, snapshot_id=s1)
    # no-op below the floor
    assert t2.expire_snapshots(keep_last=5)["snapshots_removed"] == 0


def test_cli_iceberg_maintenance(spark, clips_df, tmp_path, capsys):
    from dcspark.cli import main

    loc = str(tmp_path / "tbl")
    t = IcebergTable.create(loc, clips_df.schema)
    t.append(clips_df.filter("shard = 0"))
    t.append(clips_df.filter("shard = 1"))
    assert main(["iceberg", "snapshots", "--table", loc]) == 0
    lines = [l for l in capsys.readouterr().out.splitlines() if "op=append" in l]
    assert len(lines) == 2
    assert main(["iceberg", "files", "--table", loc]) == 0
    assert capsys.readouterr().out.strip()
    assert main(["iceberg", "expire", "--table", loc, "--keep-last", "1"]) == 0
    assert "expired 1 snapshots" in capsys.readouterr().out
    assert main(["iceberg", "snapshots", "--table", str(tmp_path / "nope")]) == 1
