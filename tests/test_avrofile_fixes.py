"""Regression pins for the round-4 avrofile.py review findings."""

import json

import pytest

from dcspark.avrofile import (compile_reader, compile_writer, parse_container,
                              spark_to_avro_schema, write_container)


def test_map_reader_rejects_negative_key_length():
    """A corrupt map key-length varint (zigzag -3 = byte 0x05) used to
    REWIND the cursor and misparse silently; now ValueError like the
    bytes/string readers."""
    schema = {"type": "map", "values": "int"}
    r = compile_reader(schema)
    # block count 1 (varint 0x02), then key length -3 (varint 0x05)
    with pytest.raises(ValueError, match="map key"):
        r(bytes([0x02, 0x05, 0x00, 0x00]), 0)


def test_block_count_bounded_by_buffer():
    """A corrupt array block count (e.g. 2^40) over zero-byte items must
    raise promptly, not hang/OOM appending trillions of Nones."""
    schema = {"type": "array", "items": "null"}
    r = compile_reader(schema)
    buf = bytearray()
    # varint for 2**40 then nothing
    v = (1 << 40) << 1
    while True:
        b = v & 0x7F
        v >>= 7
        if v:
            buf.append(b | 0x80)
        else:
            buf.append(b)
            break
    with pytest.raises(ValueError, match="block count"):
        r(bytes(buf), 0)


def test_recursive_named_schema_compiles_and_round_trips():
    """A legal self-referential record (linked list) used to crash
    compile_reader/compile_writer with RecursionError."""
    schema = {"type": "record", "name": "Node", "fields": [
        {"name": "v", "type": "int"},
        {"name": "next", "type": ["null", "Node"]},
    ]}
    w = compile_writer(schema)
    out = bytearray()
    w(out, {"v": 1, "next": {"v": 2, "next": None}})
    r = compile_reader(schema)
    rec, pos = r(bytes(out), 0)
    assert pos == len(out)
    assert rec == {"v": 1, "next": {"v": 2, "next": None}}


def test_int64_overflow_fails_at_write_time():
    """Values outside int64 previously wrote a >10-byte varint the reader
    (and Java Avro) rejects — an invalid file produced silently."""
    schema = {"type": "record", "name": "r",
              "fields": [{"name": "n", "type": "long"}]}
    with pytest.raises(ValueError, match="int64"):
        write_container(schema, [{"n": 2 ** 70}])


def _read_varint(b, p):
    shift = out = 0
    while True:
        x = b[p]; p += 1
        out |= (x & 0x7F) << shift
        if not x & 0x80:
            break
        shift += 7
    return ((out >> 1) ^ -(out & 1)), p


def test_corrupt_deflate_block_raises_valueerror():
    """zlib.error escaping broke the corrupt-input -> ValueError contract:
    overwrite a block's entire compressed payload with garbage (raw deflate
    has no checksum, so single-bit flips may decompress 'successfully' —
    total garbage reliably does not)."""
    schema = {"type": "record", "name": "r",
              "fields": [{"name": "n", "type": "long"}]}
    blob = bytearray(write_container(schema, [{"n": 1}], codec="deflate"))
    sync = bytes(blob[-16:])
    p = bytes(blob).find(sync) + 16          # end of header
    _cnt, p = _read_varint(blob, p)
    size, p = _read_varint(blob, p)
    for i in range(p, p + size):
        blob[i] = 0xFF
    with pytest.raises(ValueError, match="corrupt deflate"):
        _s, rows = parse_container(bytes(blob))
        list(rows)


def test_sibling_struct_fields_get_unique_record_names():
    """Two sibling struct fields both generated a record named 'row_rec' —
    an illegal Avro schema conformant readers reject."""
    from pyspark.sql import types as T

    st = T.StructType([
        T.StructField("a", T.StructType([T.StructField("x", T.IntegerType())])),
        T.StructField("b", T.StructType([T.StructField("y", T.StringType())])),
    ])
    schema = spark_to_avro_schema(st)
    names = []

    def walk(node):
        if isinstance(node, dict):
            if node.get("type") == "record":
                names.append(node["name"])
            for v in node.values():
                walk(v)
        elif isinstance(node, list):
            for v in node:
                walk(v)

    walk(schema)
    assert len(names) == len(set(names)), names


def test_confluent_decode_is_permissive_on_corrupt_payloads(spark):
    """One bad Kafka message must not kill the no-jar decode (the JVM path
    it substitutes for runs mode=PERMISSIVE); wrong magic byte included."""
    from dcspark.avrofile import compile_writer, decode_confluent_avro

    schema = {"type": "record", "name": "clicks", "fields": [
        {"name": "user_id", "type": ["null", "long"]},
        {"name": "page", "type": ["null", "string"]},
    ]}
    w = compile_writer(schema)
    body = bytearray()
    w(body, {"user_id": 7, "page": "/home"})
    good = b"\x00\x00\x00\x00\x2a" + bytes(body)
    bad_json = b"\x00\x00\x00\x00\x2a" + b'{"user_id": 7}'
    bad_magic = b"\x09" + bytes(body)
    df = spark.createDataFrame(
        [(bytearray(good),), (bytearray(bad_json),), (bytearray(bad_magic),)],
        "value binary")
    rows = decode_confluent_avro(df, schema).collect()
    assert len(rows) == 3
    ok = [r for r in rows if r["user_id"] == 7 and r["page"] == "/home"]
    nulls = [r for r in rows if r["user_id"] is None and r["page"] is None]
    assert len(ok) == 1 and len(nulls) == 2


def test_read_avro_unknown_column_errors(spark, tmp_path):
    from dcspark.avrofile import read_avro, write_avro

    df = spark.range(5).selectExpr("id", "cast(id as string) as s")
    p = str(tmp_path / "a")
    write_avro(df, p)
    with pytest.raises(ValueError, match="usre_id"):
        read_avro(spark, p, columns=["usre_id"])


def test_array_of_zero_byte_items_parses():
    """ADVICE r04: array items that encode to ZERO bytes (items 'null', empty
    records) can legally outnumber remaining buffer bytes — the block-count
    guard must not reject them. Corrupt counts still die via the absolute
    cap."""
    from dcspark.avrofile import parse_container, write_container

    schema = {"type": "record", "name": "r", "fields": [
        {"name": "xs", "type": {"type": "array", "items": "null"}},
    ]}
    data = write_container(schema, [{"xs": [None] * 100}], codec="null")
    _, rows = parse_container(data)
    out = list(rows)
    assert len(out) == 1 and out[0]["xs"] == [None] * 100

    empty_rec = {"type": "record", "name": "e", "fields": []}
    schema2 = {"type": "record", "name": "r2", "fields": [
        {"name": "xs", "type": {"type": "array", "items": empty_rec}},
    ]}
    data2 = write_container(schema2, [{"xs": [{}] * 64}], codec="null")
    _, rows2 = parse_container(data2)
    assert len(list(rows2)[0]["xs"]) == 64


def test_array_corrupt_count_still_bounded():
    """Non-zero-byte items keep the bytes bound; zero-byte items get the
    absolute cap — a forged huge block count raises, never hangs."""
    import pytest as _pytest

    from dcspark import avrofile
    from dcspark.avrofile import compile_reader, _write_long

    # long items: count bounded by remaining bytes
    r = compile_reader({"type": "array", "items": "long"})
    forged = bytearray(); _write_long(forged, 1 << 40)
    with _pytest.raises(ValueError, match="block count"):
        r(bytes(forged), 0)
    # null items: bounded by the absolute cap
    rn = compile_reader({"type": "array", "items": "null"})
    forged2 = bytearray(); _write_long(forged2, avrofile._MAX_ZERO_BYTE_ITEMS + 1)
    with _pytest.raises(ValueError, match="block count"):
        rn(bytes(forged2), 0)


def test_array_zero_byte_aggregate_bound():
    """The zero-byte-item cap bounds the TOTAL across blocks — a tiny buffer
    claiming many max-size blocks must raise, not build a 100M-item list."""
    import pytest as _pytest

    from dcspark.avrofile import _write_long, compile_reader

    r = compile_reader({"type": "array", "items": "null"})
    forged = bytearray()
    for _ in range(20):
        _write_long(forged, 5_000_000)  # 20 blocks x 5M zero-byte items
    _write_long(forged, 0)
    with _pytest.raises(ValueError, match="block count"):
        r(bytes(forged), 0)


def test_legit_dense_null_array_accepted():
    """Review finding: valid writers emit 100k+ nulls as one ~5-byte block;
    the aggregate budget floor must accept them."""
    from dcspark.avrofile import parse_container, write_container

    schema = {"type": "record", "name": "r", "fields": [
        {"name": "xs", "type": {"type": "array", "items": "null"}},
    ]}
    data = write_container(schema, [{"xs": [None] * 100_000}], codec="null")
    _, rows = parse_container(data)
    assert len(list(rows)[0]["xs"]) == 100_000
