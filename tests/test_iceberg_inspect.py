"""Iceberg metadata-inspection tables (dcspark/iceberg.py inspect) — the
`tbl.snapshots` / `tbl.files` / `tbl.history` / `tbl.manifests` /
`tbl.refs` / `tbl.partitions` parity surface, all metadata-only walks."""

import json

import pytest
from pyspark.sql import functions as F

from dcspark.iceberg import IcebergTable


@pytest.fixture()
def table(spark, tmp_path):
    df = spark.range(100).select(
        F.col("id").alias("k"),
        (F.col("id") % 4).cast("string").alias("part"),
        (F.col("id") * 2.0).alias("v"),
    )
    t = IcebergTable.create(str(tmp_path / "t"), df.schema,
                            partition_by=[("part", "identity")])
    t.append(df)
    t.create_tag("v1")
    t.append(df.filter("part = '0'"))
    t.delete_where(spark, "k % 10 = 0")
    return t


def test_inspect_snapshots_and_history(spark, table):
    snaps = table.inspect(spark, "snapshots").collect()
    assert [s["operation"] for s in snaps] == ["append", "append", "delete"]
    assert snaps[1]["parent_id"] == snaps[0]["snapshot_id"]
    assert snaps[-1]["total_records"] > 0
    hist = table.inspect(spark, "history").collect()
    assert len(hist) == 3
    assert [h["is_current"] for h in hist] == [False, False, True]
    assert hist[-1]["snapshot_id"] == snaps[-1]["snapshot_id"]


def test_inspect_refs(spark, table):
    refs = {r["name"]: r for r in table.inspect(spark, "refs").collect()}
    assert refs["main"]["type"] == "branch"
    assert refs["v1"]["type"] == "tag"
    assert refs["main"]["snapshot_id"] == table.current_snapshot_id()


def test_inspect_files_accounts_every_row(spark, table):
    files = table.inspect(spark, "files")
    data_rows = (files.filter("content = 0")
                 .agg(F.sum("record_count")).first()[0])
    assert data_rows == 125  # 100 + 25 appended, pre-delete counts
    # positional-delete files are surfaced with their own content flag
    assert files.filter("content = 1").count() > 0
    # every live data row = file records minus delete hits
    deleted = (files.filter("content = 1")
               .agg(F.sum("record_count")).first()[0])
    assert table.read(spark).count() == data_rows - deleted


def test_inspect_partitions_rollup_matches_data(spark, table):
    parts = table.inspect(spark, "partitions").collect()
    by_part = {json.loads(p["partition"])["part"]: p["record_count"]
               for p in parts}
    # pre-delete record counts per identity partition: 25 each + 25 extra
    # rows appended into part=0
    assert by_part == {"0": 50, "1": 25, "2": 25, "3": 25}
    total_files = sum(p["file_count"] for p in parts)
    assert total_files == len(table.data_files())


def test_inspect_manifests(spark, table):
    ms = table.inspect(spark, "manifests").collect()
    assert sum(m["added_files"] + m["existing_files"] for m in ms
               if m["content"] == 0) == len(table.data_files())
    assert any(m["content"] == 1 for m in ms)  # the delete manifest


def test_inspect_unknown_kind(spark, table):
    with pytest.raises(ValueError, match="unknown metadata table"):
        table.inspect(spark, "nope")
