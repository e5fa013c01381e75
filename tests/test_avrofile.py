"""Avro OCF source/sink (dcspark/avrofile.py): spec conformance against the
Java Avro library on Spark's classpath (both directions, both codecs),
distributed write -> read round trip, column pruning, Confluent wire-format
decode, and corrupt-input behavior."""

import json

import pytest
from pyspark.sql import functions as F

from dcspark import avrofile as av

SCHEMA = {"type": "record", "name": "r", "fields": [
    {"name": "id", "type": "long"},
    {"name": "s", "type": ["null", "string"]},
    {"name": "d", "type": "double"},
    {"name": "b", "type": "bytes"},
    {"name": "arr", "type": {"type": "array", "items": "long"}},
    {"name": "m", "type": {"type": "map", "values": "long"}},
    {"name": "e", "type": {"type": "enum", "name": "col",
                           "symbols": ["R", "G", "B"]}},
    {"name": "fx", "type": {"type": "fixed", "name": "f4", "size": 4}},
]}


def _rows(n):
    return [{"id": i, "s": None if i % 3 == 0 else f"v{i}", "d": i * 0.25,
             "b": bytes([i % 256, 7]), "arr": list(range(i % 5)),
             "m": {"k": i, "j": -i}, "e": ["R", "G", "B"][i % 3],
             "fx": bytes([i % 256] * 4)} for i in range(n)]


@pytest.mark.parametrize("codec", ["null", "deflate"])
def test_container_round_trip(codec):
    rows = _rows(3000)
    blob = av.write_container(SCHEMA, rows, codec=codec, rows_per_block=256)
    schema, recs = av.parse_container(blob)
    assert schema == SCHEMA
    assert list(recs) == rows


def test_corrupt_inputs_raise():
    blob = av.write_container(SCHEMA, _rows(10))
    with pytest.raises(ValueError, match="magic"):
        av.parse_container(b"XXXX" + blob[4:])
    bad = bytearray(blob)
    bad[-3] ^= 0xFF
    with pytest.raises(ValueError):
        list(av.parse_container(bytes(bad))[1])
    with pytest.raises(ValueError):
        list(av.parse_container(blob[:len(blob) // 2])[1])
    with pytest.raises(ValueError, match="codec"):
        av.write_container(SCHEMA, [], codec="snappy")


def test_deterministic_bytes():
    rows = _rows(100)
    assert av.write_container(SCHEMA, rows, sync_seed="a") == \
           av.write_container(SCHEMA, rows, sync_seed="a")
    assert av.write_container(SCHEMA, rows, sync_seed="a") != \
           av.write_container(SCHEMA, rows, sync_seed="b")


@pytest.mark.parametrize("codec", ["null", "deflate"])
def test_java_reads_our_bytes(spark, codec):
    """Spec conformance leg 1: the reference Java implementation (the avro
    jar Spark itself ships) decodes our container byte-for-byte."""
    simple = {"type": "record", "name": "r", "fields": [
        {"name": "id", "type": "long"},
        {"name": "s", "type": ["null", "string"]},
        {"name": "d", "type": "double"},
        {"name": "arr", "type": {"type": "array", "items": "long"}},
        {"name": "m", "type": {"type": "map", "values": "long"}}]}
    rows = [{"id": i, "s": None if i % 3 == 0 else f"v{i}", "d": i * 0.25,
             "arr": list(range(i % 5)), "m": {"k": i}} for i in range(300)]
    blob = av.write_container(simple, rows, codec=codec, rows_per_block=64)
    jvm = spark._jvm
    dfs = jvm.org.apache.avro.file.DataFileStream(
        jvm.java.io.ByteArrayInputStream(blob),
        jvm.org.apache.avro.generic.GenericDatumReader())
    got = []
    while dfs.hasNext():
        got.append(json.loads(dfs.next().toString()))
    dfs.close()
    assert got == json.loads(json.dumps(rows))


def test_we_read_java_bytes(spark):
    """Spec conformance leg 2: we decode the Java implementation's output
    (deflate codec, its own random sync markers, its block sizes)."""
    simple = {"type": "record", "name": "r", "fields": [
        {"name": "id", "type": "long"}, {"name": "s", "type": "string"}]}
    jvm = spark._jvm
    jschema = jvm.org.apache.avro.Schema.Parser().parse(json.dumps(simple))
    dfw = jvm.org.apache.avro.file.DataFileWriter(
        jvm.org.apache.avro.generic.GenericDatumWriter(jschema))
    dfw.setCodec(jvm.org.apache.avro.file.CodecFactory.deflateCodec(6))
    baos = jvm.java.io.ByteArrayOutputStream()
    dfw.create(jschema, baos)
    for i in range(200):
        rec = jvm.org.apache.avro.generic.GenericData.Record(jschema)
        rec.put("id", i)
        rec.put("s", f"row{i}")
        dfw.append(rec)
    dfw.close()
    schema, recs = av.parse_container(bytes(baos.toByteArray()))
    assert list(recs) == [{"id": i, "s": f"row{i}"} for i in range(200)]


def test_spark_write_read_round_trip(spark, tmp_path):
    """Distributed sink -> distributed source: values, types, and NULLs
    survive; one file per non-empty partition."""
    df = spark.range(0, 1000).select(
        F.col("id"),
        F.when(F.col("id") % 7 != 0, F.concat(F.lit("t"), F.col("id"))).alias("txt"),
        (F.col("id") * 0.5).alias("score"),
        F.array(F.col("id"), F.col("id") + 1).alias("pair"),
    ).repartition(4)
    out = str(tmp_path / "avro_ds")
    n_files = av.write_avro(df, out)
    assert n_files == 4
    back = av.read_avro(spark, out)
    assert [f.name for f in back.schema.fields] == ["id", "txt", "score", "pair"]
    a = sorted(map(tuple, df.collect()))
    b = sorted(map(tuple, back.collect()))
    assert a == b


def test_read_avro_column_pruning(spark, tmp_path):
    df = spark.range(0, 50).select(
        F.col("id"), F.lit("x").alias("junk"), (F.col("id") * 2).alias("y"))
    out = str(tmp_path / "pruned")
    av.write_avro(df, out)
    got = av.read_avro(spark, out, columns=["id", "y"])
    assert got.columns == ["id", "y"]
    assert sorted(map(tuple, got.collect())) == [(i, 2 * i) for i in range(50)]


def test_read_avro_rejects_schema_drift(spark, tmp_path):
    """A dataset whose files disagree on schema fails loudly, not silently."""
    import os

    out = str(tmp_path / "drift")
    os.makedirs(out)
    s1 = {"type": "record", "name": "r",
          "fields": [{"name": "id", "type": "long"}]}
    s2 = {"type": "record", "name": "r",
          "fields": [{"name": "id", "type": "string"}]}
    with open(os.path.join(out, "a.avro"), "wb") as f:
        f.write(av.write_container(s1, [{"id": 1}]))
    with open(os.path.join(out, "b.avro"), "wb") as f:
        f.write(av.write_container(s2, [{"id": "x"}]))
    with pytest.raises(Exception, match="differs|DIFFERS|schema"):
        av.read_avro(spark, out).collect()


def test_decode_confluent_avro_without_jar(spark):
    """Kafka wire-format decode with the pure-Python reader: 5-byte header
    stripped, contract Avro schema applied — no spark-avro jar involved."""
    schema = {"type": "record", "name": "r", "fields": [
        {"name": "user_id", "type": "long"},
        {"name": "name", "type": ["null", "string"]}]}
    writer = av.compile_writer(schema)
    vals = []
    for i in range(20):
        body = bytearray()
        writer(body, {"user_id": i, "name": None if i % 4 == 0 else f"u{i}"})
        vals.append((b"\x00\x00\x00\x00\x07" + bytes(body),))
    df = spark.createDataFrame(vals, "value binary")
    got = sorted(map(tuple, av.decode_confluent_avro(df, schema).collect()))
    assert got == sorted(
        (i, None if i % 4 == 0 else f"u{i}") for i in range(20))


def test_contract_avro_source_validates(spark, tmp_path):
    """`format: avro` is a first-class contract source: load_tables falls
    back to the pure-Python OCF reader when the spark-avro datasource is
    absent, and the engine validates the loaded frame end to end."""
    from dcspark import DataContractSpecification
    from dcspark.engine import validate
    from dcspark.io import load_tables

    data_root = tmp_path / "lake"
    df = spark.range(0, 100).select(
        F.col("id").alias("user_id"),
        F.concat(F.lit("/p"), (F.col("id") % 5)).alias("page"))
    av.write_avro(df.repartition(3), str(data_root / "clicks.avro"))

    spec = DataContractSpecification.from_string(f"""
id: avro-src
models:
  clicks:
    fields:
      user_id: {{type: long, required: true, unique: true}}
      page: {{type: string, pattern: "^/p[0-4]$"}}
servers:
  lake:
    type: local
    format: avro
    path: {data_root}
""")
    tables = load_tables(spark, spec, "lake")
    assert tables["clicks"].count() == 100
    res = validate(spark, spec, tables)
    assert all(r["result"] == "passed" for r in res.results), res.results
