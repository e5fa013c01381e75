"""Avro Object Container Files as a Spark source/sink — pure stdlib codec.

The sandbox's Spark has no `spark-avro` datasource jar (Avro has been an
*external* module since Spark 2.4), so `spark.read.format("avro")` fails.
Rather than gate the format on the environment, this module implements the
Avro 1.11 specification directly (binary encoding + the object container
file layout, https://avro.apache.org/docs/1.11.1/specification/): zigzag
varints, block-encoded arrays/maps, union indices, and OCF headers/blocks
with the ``null`` and ``deflate`` codecs (raw zlib, wbits=-15). Same ethos
as the in-repo JPEG/GIF/ADPCM codecs: a real, spec-conformant implementation
with corrupt-input -> ValueError behavior, not a stub.

Spark integration:

- :func:`read_avro` — ``spark.read.format("binaryFile")`` scans the files
  (one task per file — Avro's sync-marker block structure would allow
  intra-file splits, but binaryFile delivers whole files; for 10^12-row
  corpora Avro datasets are many-file by construction, so file-level
  parallelism is the natural grain), then an Arrow-batched ``mapInArrow``
  decodes records against the schema read from the first file's header.
  Column pruning happens at decode time (``columns=``): skipped fields are
  still *parsed* (Avro binary has no per-field offsets) but never built into
  Python objects or Arrow arrays.
- :func:`write_avro` — partition-parallel encoder (one OCF file per task,
  executors write via the shared filesystem every Spark file sink already
  assumes). Sync markers derive from md5(schema || partition), so output is
  byte-deterministic for a fixed partitioning.
- :func:`decode_confluent_avro` — the same record decoder applied to Kafka
  ``value`` bytes after the 5-byte Confluent header strip, so the Kafka
  Avro path no longer *requires* the spark-avro jar (parity:
  reference engines/soda/connections/kafka.py wire-format handling).

Types: null, boolean, int, long, float, double, bytes, string, record, enum,
array, map, union, fixed. Logical types are passed through as their base
type (documented; timestamp columns round-trip as long micros/millis).
"""

from __future__ import annotations

import io
import json
import struct
import zlib
from hashlib import md5
from typing import Any, Callable, Dict, Iterator, List, Optional, Tuple

MAGIC = b"Obj\x01"
_SYNC_LEN = 16

# ---------------------------------------------------------------------------
# binary primitives
# ---------------------------------------------------------------------------


def _read_long(buf: bytes, pos: int) -> Tuple[int, int]:
    """Zigzag-varint decode; raises on truncation or >10-byte runaways."""
    shift = 0
    acc = 0
    for _ in range(10):
        if pos >= len(buf):
            raise ValueError("avro: truncated varint")
        b = buf[pos]
        pos += 1
        acc |= (b & 0x7F) << shift
        if not (b & 0x80):
            return (acc >> 1) ^ -(acc & 1), pos
        shift += 7
    raise ValueError("avro: varint longer than 10 bytes")


def _write_long(out: bytearray, n: int) -> None:
    n = (n << 1) ^ (n >> 63) if n >= 0 else ((-n - 1) << 1 | 1)
    # the line above must match the spec exactly; zigzag via arithmetic:
    while True:
        b = n & 0x7F
        n >>= 7
        if n:
            out.append(b | 0x80)
        else:
            out.append(b)
            return


# ---------------------------------------------------------------------------
# schema-compiled readers / writers
# ---------------------------------------------------------------------------

Reader = Callable[[bytes, int], Tuple[Any, int]]
Writer = Callable[[bytearray, Any], None]

#: non-string key holding the per-schema compiled-closure cache inside the
#: shared `names` dict — lazy named-type references resolve through it, so
#: RECURSIVE schemas (Node -> ["null", "Node"]) compile without infinite
#: recursion and each named type compiles exactly once
_COMPILED = ("__avro_compiled__",)

# Hang/OOM backstop for arrays whose items encode to ZERO bytes ('null'
# items, empty records, size-0 fixed): the count-vs-remaining-bytes bound
# does not apply to them (a 5-byte block legally holds millions of nulls),
# so cap the TOTAL accumulated item count per array instead — a per-block
# cap alone still lets a few hundred corrupt bytes claim block after block
# (20 blocks x 5M nulls = 100M-item list from an 81-byte buffer). The cap
# scales with the buffer (1024 items per input byte — far above any real
# writer's density) up to an absolute ceiling, with a 4M-item floor so
# LEGITIMATE dense-null arrays (e.g. 100k nulls in one ~5-byte block, which
# valid writers emit) are never rejected: the floor bounds adversarial
# memory at ~32 MB of list slots while accepting any plausible real row.
_MAX_ZERO_BYTE_ITEMS = 1 << 26
_ZERO_BYTE_ITEMS_FLOOR = 1 << 22
_ZERO_BYTE_ITEMS_PER_BUF_BYTE = 1024


def _zero_byte_item_budget(buf_len: int) -> int:
    return min(_MAX_ZERO_BYTE_ITEMS,
               max(_ZERO_BYTE_ITEMS_FLOOR,
                   _ZERO_BYTE_ITEMS_PER_BUF_BYTE * buf_len))


def _min_item_bytes(schema: Any, names: Dict[str, Any],
                    _seen: Optional[frozenset] = None) -> int:
    """Conservative minimum encoded size of one value of ``schema``, used to
    bound array-block item counts by remaining buffer bytes. Returns 0 when a
    value can legally encode to zero bytes (null, empty record, fixed(0),
    recursive reference — recursion is treated as 0 to stay conservative)."""
    seen = _seen or frozenset()
    if isinstance(schema, str):
        t = schema
        if t in names:
            if t in seen:  # recursive named type: no positive lower bound
                return 0
            return _min_item_bytes(names[t], names, seen | {t})
        return 0 if t == "null" else 1
    if isinstance(schema, list):  # union: branch index is >= 1 byte
        return 1
    t = schema["type"]
    if t == "record":
        return sum(_min_item_bytes(f["type"], names, seen)
                   for f in schema["fields"])
    if t == "fixed":
        return int(schema["size"])
    if t in ("array", "map"):
        return 1  # the terminating zero block count
    if t == "enum":
        return 1
    return _min_item_bytes(t, names, seen)  # logical type on a base type


def compile_reader(schema: Any, names: Optional[Dict[str, Any]] = None) -> Reader:
    """Schema node -> closure (buf, pos) -> (value, new_pos). Compiled once
    per schema so the per-row hot path never re-inspects JSON."""
    names = {} if names is None else names
    if isinstance(schema, str):
        t = schema
        if t in names:  # named-type reference — LAZY, see _COMPILED
            cache = names.setdefault(_COMPILED, {})

            def rref(b, p, _t=t, _cache=cache, _names=names):
                r = _cache.get(("r", _t))
                if r is None:
                    r = _cache[("r", _t)] = compile_reader(_names[_t], _names)
                return r(b, p)
            return rref
        if t == "null":
            return lambda b, p: (None, p)
        if t == "boolean":
            def rb(b, p):
                if p >= len(b):
                    raise ValueError("avro: truncated boolean")
                return b[p] != 0, p + 1
            return rb
        if t in ("int", "long"):
            return _read_long
        if t == "float":
            def rf(b, p):
                if p + 4 > len(b):
                    raise ValueError("avro: truncated float")
                return struct.unpack_from("<f", b, p)[0], p + 4
            return rf
        if t == "double":
            def rd(b, p):
                if p + 8 > len(b):
                    raise ValueError("avro: truncated double")
                return struct.unpack_from("<d", b, p)[0], p + 8
            return rd
        if t == "bytes":
            def rby(b, p):
                n, p = _read_long(b, p)
                if n < 0 or p + n > len(b):
                    raise ValueError("avro: bad bytes length")
                return bytes(b[p:p + n]), p + n
            return rby
        if t == "string":
            def rs(b, p):
                n, p = _read_long(b, p)
                if n < 0 or p + n > len(b):
                    raise ValueError("avro: bad string length")
                return b[p:p + n].decode("utf-8"), p + n
            return rs
        raise ValueError(f"avro: unknown type {t!r}")
    if isinstance(schema, list):  # union
        branches = [compile_reader(s, names) for s in schema]
        def ru(b, p):
            i, p = _read_long(b, p)
            if not (0 <= i < len(branches)):
                raise ValueError(f"avro: union index {i} out of range")
            return branches[i](b, p)
        return ru
    t = schema["type"]
    if t == "record":
        names[schema["name"]] = schema
        fields = [(f["name"], compile_reader(f["type"], names))
                  for f in schema["fields"]]
        def rr(b, p):
            row = {}
            for name, rdr in fields:
                row[name], p = rdr(b, p)
            return row, p
        return rr
    if t == "enum":
        names[schema["name"]] = schema
        symbols = list(schema["symbols"])
        def re_(b, p):
            i, p = _read_long(b, p)
            if not (0 <= i < len(symbols)):
                raise ValueError(f"avro: enum index {i} out of range")
            return symbols[i], p
        return re_
    if t == "fixed":
        names[schema["name"]] = schema
        size = int(schema["size"])
        def rx(b, p):
            if p + size > len(b):
                raise ValueError("avro: truncated fixed")
            return bytes(b[p:p + size]), p + size
        return rx
    if t == "array":
        item = compile_reader(schema["items"], names)
        # item-count bound per block: when every item consumes >= 1 byte, a
        # block cannot hold more items than remaining bytes; zero-byte item
        # types (null, empty record) legally pack any count into no bytes, so
        # they get the absolute cap instead (ADVICE r04: the unconditional
        # bytes bound rejected valid arrays of 100 nulls)
        zero_byte_items = _min_item_bytes(schema["items"], names) == 0
        def ra(b, p):
            out: List[Any] = []
            while True:
                n, p = _read_long(b, p)
                if n == 0:
                    return out, p
                if n < 0:  # block with byte-size prefix
                    n = -n
                    _, p = _read_long(b, p)
                if (len(out) + n > _zero_byte_item_budget(len(b))
                        if zero_byte_items else n > len(b) - p):
                    # without a bound a corrupt count hangs/OOMs the parse;
                    # zero-byte items are bounded on the TOTAL across blocks
                    raise ValueError("avro: array block count exceeds buffer")
                for _ in range(n):
                    v, p = item(b, p)
                    out.append(v)
        return ra
    if t == "map":
        val = compile_reader(schema["values"], names)
        def rm(b, p):
            out: Dict[str, Any] = {}
            while True:
                n, p = _read_long(b, p)
                if n == 0:
                    return out, p
                if n < 0:
                    n = -n
                    _, p = _read_long(b, p)
                if n > len(b) - p + 1:
                    raise ValueError("avro: map block count exceeds buffer")
                for _ in range(n):
                    if p >= len(b):
                        raise ValueError("avro: truncated map key")
                    klen, p = _read_long(b, p)
                    if klen < 0 or p + klen > len(b):
                        # same guard the bytes/string readers have: a corrupt
                        # negative length would REWIND the cursor (p += klen)
                        # and misparse silently instead of raising
                        raise ValueError("avro: bad map key length")
                    k = b[p:p + klen].decode("utf-8"); p += klen
                    out[k], p = val(b, p)
        return rm
    # logical types ride their base type ({"type": "long", "logicalType": ...})
    if t in ("null", "boolean", "int", "long", "float", "double",
             "bytes", "string"):
        return compile_reader(t, names)
    raise ValueError(f"avro: unsupported complex type {t!r}")


def compile_writer(schema: Any, names: Optional[Dict[str, Any]] = None) -> Writer:
    """Inverse of :func:`compile_reader` (single-block arrays/maps; unions
    pick the first branch accepting the value's none-ness)."""
    names = {} if names is None else names
    if isinstance(schema, str):
        t = schema
        if t in names:  # named-type reference — LAZY, see _COMPILED
            cache = names.setdefault(_COMPILED, {})

            def wref(o, v, _t=t, _cache=cache, _names=names):
                w = _cache.get(("w", _t))
                if w is None:
                    w = _cache[("w", _t)] = compile_writer(_names[_t], _names)
                w(o, v)
            return wref
        if t == "null":
            def wn(o, v):
                if v is not None:
                    raise ValueError("avro: non-null for null type")
            return wn
        if t == "boolean":
            return lambda o, v: o.append(1 if v else 0)
        if t in ("int", "long"):
            def wl(o, v):
                v = int(v)
                if not (-(1 << 63) <= v < (1 << 63)):
                    # emitting a >10-byte varint writes a file our own
                    # reader (and Java Avro) rejects — fail at WRITE time,
                    # next to the bad value, not at some later read
                    raise ValueError(f"avro: {v} out of int64 range")
                _write_long(o, v)
            return wl
        if t == "float":
            return lambda o, v: o.extend(struct.pack("<f", float(v)))
        if t == "double":
            return lambda o, v: o.extend(struct.pack("<d", float(v)))
        if t == "bytes":
            def wb(o, v):
                v = bytes(v)
                _write_long(o, len(v)); o.extend(v)
            return wb
        if t == "string":
            def ws(o, v):
                e = str(v).encode("utf-8")
                _write_long(o, len(e)); o.extend(e)
            return ws
        raise ValueError(f"avro: unknown type {t!r}")
    if isinstance(schema, list):
        writers = [(s, compile_writer(s, names)) for s in schema]
        null_idx = next((i for i, (s, _) in enumerate(writers) if s == "null"), None)
        other_idx = next((i for i, (s, _) in enumerate(writers) if s != "null"), None)
        def wu(o, v):
            idx = null_idx if v is None else other_idx
            if idx is None:
                raise ValueError("avro: no union branch for value")
            _write_long(o, idx)
            writers[idx][1](o, v)
        return wu
    t = schema["type"]
    if t == "record":
        names[schema["name"]] = schema
        fields = [(f["name"], compile_writer(f["type"], names))
                  for f in schema["fields"]]
        def wr(o, v):
            for name, w in fields:
                w(o, v.get(name) if isinstance(v, dict) else v[name])
        return wr
    if t == "enum":
        names[schema["name"]] = schema
        index = {s: i for i, s in enumerate(schema["symbols"])}
        def we(o, v):
            if v not in index:
                raise ValueError(f"avro: {v!r} not in enum symbols")
            _write_long(o, index[v])
        return we
    if t == "fixed":
        names[schema["name"]] = schema
        size = int(schema["size"])
        def wx(o, v):
            v = bytes(v)
            if len(v) != size:
                raise ValueError("avro: fixed size mismatch")
            o.extend(v)
        return wx
    if t == "array":
        item = compile_writer(schema["items"], names)
        def wa(o, v):
            v = list(v)
            if v:
                _write_long(o, len(v))
                for x in v:
                    item(o, x)
            _write_long(o, 0)
        return wa
    if t == "map":
        val = compile_writer(schema["values"], names)
        def wm(o, v):
            items = list(v.items())
            if items:
                _write_long(o, len(items))
                for k, x in items:
                    e = str(k).encode("utf-8")
                    _write_long(o, len(e)); o.extend(e)
                    val(o, x)
            _write_long(o, 0)
        return wm
    if t in ("null", "boolean", "int", "long", "float", "double",
             "bytes", "string"):
        return compile_writer(t, names)
    raise ValueError(f"avro: unsupported complex type {t!r}")


# ---------------------------------------------------------------------------
# object container files
# ---------------------------------------------------------------------------


def read_container_meta(data: bytes) -> Dict[str, bytes]:
    """OCF bytes -> the header metadata map only (no block decode).

    Iceberg manifests carry the table schema at write time under the
    "schema" key; readers use it to project old data files to the current
    schema by field-id without opening any data block.
    """
    if data[:4] != MAGIC:
        raise ValueError("avro: bad magic (not an Object Container File)")
    meta_reader = compile_reader({"type": "map", "values": "bytes"})
    meta, _pos = meta_reader(data, 4)
    return meta


def parse_container(data: bytes) -> Tuple[Any, Iterator[dict]]:
    """OCF bytes -> (schema, iterator of record dicts). Validates magic,
    codec, per-block sync markers, and block boundary alignment."""
    if data[:4] != MAGIC:
        raise ValueError("avro: bad magic (not an Object Container File)")
    pos = 4
    meta_reader = compile_reader({"type": "map", "values": "bytes"})
    meta, pos = meta_reader(data, pos)
    sync = data[pos:pos + _SYNC_LEN]
    if len(sync) != _SYNC_LEN:
        raise ValueError("avro: truncated header sync")
    pos += _SYNC_LEN
    codec = meta.get("avro.codec", b"null").decode()
    if codec not in ("null", "deflate"):
        raise ValueError(f"avro: unsupported codec {codec!r}")
    try:
        schema = json.loads(meta["avro.schema"])
    except KeyError:
        raise ValueError("avro: header missing avro.schema") from None
    reader = compile_reader(schema)

    def records() -> Iterator[dict]:
        p = pos
        while p < len(data):
            n_rows, p = _read_long(data, p)
            n_bytes, p = _read_long(data, p)
            if n_rows < 0 or n_bytes < 0 or p + n_bytes > len(data):
                raise ValueError("avro: bad block header")
            block = data[p:p + n_bytes]
            p += n_bytes
            if data[p:p + _SYNC_LEN] != sync:
                raise ValueError("avro: sync marker mismatch (corrupt block)")
            p += _SYNC_LEN
            if codec == "deflate":
                try:
                    block = zlib.decompress(block, wbits=-15)
                except zlib.error as e:
                    # the module contract is corrupt-input -> ValueError
                    raise ValueError(f"avro: corrupt deflate block: {e}")
            bp = 0
            for _ in range(n_rows):
                row, bp = reader(block, bp)
                yield row
            if bp != len(block):
                raise ValueError("avro: block not fully consumed")

    return schema, records()


def write_container(schema: Any, rows: List[dict], codec: str = "deflate",
                    sync_seed: str = "", rows_per_block: int = 4096,
                    meta: Optional[Dict[str, bytes]] = None) -> bytes:
    """Rows -> OCF bytes. Deterministic: the sync marker is
    md5(schema || sync_seed), not a random draw. ``meta`` adds extra
    header key/values (e.g. Iceberg manifests carry "schema",
    "partition-spec-id", "format-version", "content")."""
    if codec not in ("null", "deflate"):
        raise ValueError(f"avro: unsupported codec {codec!r}")
    schema_json = json.dumps(schema, sort_keys=True, separators=(",", ":"))
    sync = md5((schema_json + "\x00" + sync_seed).encode()).digest()
    writer = compile_writer(schema)
    meta_writer = compile_writer({"type": "map", "values": "bytes"})
    out = bytearray(MAGIC)
    header = dict(meta or {})
    header["avro.schema"] = schema_json.encode()
    header["avro.codec"] = codec.encode()
    meta_writer(out, header)
    out.extend(sync)
    for start in range(0, len(rows), rows_per_block):
        chunk = rows[start:start + rows_per_block]
        body = bytearray()
        for r in chunk:
            writer(body, r)
        payload = bytes(body)
        if codec == "deflate":
            c = zlib.compressobj(wbits=-15)
            payload = c.compress(payload) + c.flush()
        _write_long(out, len(chunk))
        _write_long(out, len(payload))
        out.extend(payload)
        out.extend(sync)
    return bytes(out)


# ---------------------------------------------------------------------------
# Spark surface
# ---------------------------------------------------------------------------


def avro_to_spark_type(schema: Any):
    """Avro schema node -> pyspark DataType (nullable handled by caller)."""
    from pyspark.sql import types as T

    prim = {"null": T.NullType(), "boolean": T.BooleanType(),
            "int": T.IntegerType(), "long": T.LongType(),
            "float": T.FloatType(), "double": T.DoubleType(),
            "bytes": T.BinaryType(), "string": T.StringType()}
    if isinstance(schema, str):
        if schema in prim:
            return prim[schema]
        raise ValueError(f"avro: cannot map named reference {schema!r} "
                         "(pass the full schema)")
    if isinstance(schema, list):
        non_null = [s for s in schema if s != "null"]
        if len(non_null) != 1:
            raise ValueError("avro: only [null, X] unions map to Spark")
        return avro_to_spark_type(non_null[0])
    t = schema["type"]
    if t == "record":
        return T.StructType([
            T.StructField(f["name"], avro_to_spark_type(f["type"]), True)
            for f in schema["fields"]])
    if t == "enum":
        return T.StringType()
    if t == "fixed":
        return T.BinaryType()
    if t == "array":
        return T.ArrayType(avro_to_spark_type(schema["items"]), True)
    if t == "map":
        return T.MapType(T.StringType(), avro_to_spark_type(schema["values"]), True)
    if t in prim:
        return prim[t]  # logical type riding a primitive
    raise ValueError(f"avro: unsupported type {t!r}")


def _header_schema(spark, path: str) -> Any:
    """Read one file's OCF header to learn the dataset schema (bounded: the
    driver pulls a single file's bytes, never the dataset)."""
    row = (spark.read.format("binaryFile").load(path)
           .select("content").limit(1).collect())
    if not row:
        raise ValueError(f"avro: no files under {path}")
    schema, _ = parse_container(row[0][0])
    return schema


def read_avro(spark, path: str, columns: Optional[List[str]] = None):
    """Distributed Avro OCF read: binaryFile scan (one task per file) +
    Arrow-batched pure-Python decode. ``columns`` prunes the OUTPUT (all
    fields are parsed — Avro binary has no per-field offsets — but pruned
    fields never materialize as Python objects or Arrow arrays)."""
    import pyarrow as pa
    from pyspark.sql import types as T

    schema = _header_schema(spark, path)
    if not (isinstance(schema, dict) and schema.get("type") == "record"):
        raise ValueError("avro: top-level schema must be a record")
    spark_schema = avro_to_spark_type(schema)
    if columns:
        keep = set(columns)
        known = {f.name for f in spark_schema.fields}
        missing = sorted(keep - known)
        if missing:
            # a typo'd projection must error like df.select() would, not
            # silently return a frame without the column
            raise ValueError(
                f"avro: columns {missing} not in schema "
                f"(available: {sorted(known)})")
        spark_schema = T.StructType(
            [f for f in spark_schema.fields if f.name in keep])
    # Spark's own converter gives the exact arrow schema mapInArrow expects
    from pyspark.sql.pandas.types import to_arrow_schema
    arrow_schema = to_arrow_schema(spark_schema)
    field_names = [f.name for f in spark_schema.fields]
    schema_json = json.dumps(schema)

    def decode(batches):
        ref_canon = json.dumps(json.loads(schema_json), sort_keys=True)
        for batch in batches:
            for content in batch.column("content").to_pylist():
                fschema, recs = parse_container(content)
                if json.dumps(fschema, sort_keys=True) != ref_canon:
                    raise ValueError("avro: file schema differs from the "
                                     "dataset schema read from the first file")
                rows = list(recs)
                cols = {n: [r.get(n) for r in rows] for n in field_names}
                yield pa.RecordBatch.from_pydict(cols, schema=arrow_schema)

    files = spark.read.format("binaryFile").load(path).select("content")
    return files.mapInArrow(decode, spark_schema)


def spark_to_avro_schema(spark_schema, name: str = "row") -> Any:
    """pyspark StructType -> Avro record schema (fields nullable unions)."""
    from pyspark.sql import types as T

    def conv(dt, path):
        # `path` threads the field path into generated record names: two
        # sibling struct fields (or array/map element structs) previously
        # all produced a record named '<name>_rec' — an ILLEGAL Avro schema
        # (names must be unique) that conformant readers, including
        # spark-avro on our own files, reject
        if isinstance(dt, T.BooleanType):
            return "boolean"
        if isinstance(dt, (T.ByteType, T.ShortType, T.IntegerType)):
            return "int"
        if isinstance(dt, T.LongType):
            return "long"
        if isinstance(dt, T.FloatType):
            return "float"
        if isinstance(dt, T.DoubleType):
            return "double"
        if isinstance(dt, T.BinaryType):
            return "bytes"
        if isinstance(dt, T.StringType):
            return "string"
        if isinstance(dt, T.ArrayType):
            return {"type": "array",
                    "items": ["null", conv(dt.elementType, f"{path}_item")]}
        if isinstance(dt, T.MapType):
            return {"type": "map",
                    "values": ["null", conv(dt.valueType, f"{path}_value")]}
        if isinstance(dt, T.StructType):
            return spark_to_avro_schema(dt, name=f"{path}_rec")
        raise ValueError(f"avro: cannot map Spark type {dt}")

    return {"type": "record", "name": name,
            "fields": [{"name": f.name,
                        "type": ["null", conv(f.dataType, f"{name}_{f.name}")]}
                       for f in spark_schema.fields]}


def write_avro(df, path: str, codec: str = "deflate") -> int:
    """Partition-parallel OCF sink: each task encodes its partition into
    ``part-<id>.avro`` under ``path`` (executors write through the shared
    filesystem, the same assumption every Spark file sink makes). Returns the
    number of files written. Deterministic bytes for a fixed partitioning."""
    import os

    from pyspark import TaskContext

    os.makedirs(path, exist_ok=True)
    schema = spark_to_avro_schema(df.schema)
    schema_json = json.dumps(schema)
    field_names = [f.name for f in df.schema.fields]

    def dump(rows):
        sc = json.loads(schema_json)
        pid = TaskContext.get().partitionId()
        recs = [dict(zip(field_names, r)) for r in rows]
        if not recs:
            return iter(())
        blob = write_container(sc, recs, codec=codec, sync_seed=str(pid))
        with open(os.path.join(path, f"part-{pid:05d}.avro"), "wb") as f:
            f.write(blob)
        return iter([(pid, len(recs))])

    written = df.rdd.mapPartitions(dump).collect()
    return len(written)


def decode_confluent_avro(df, schema: Any, value_col: str = "value"):
    """Kafka Confluent-Avro decode WITHOUT the spark-avro jar: strip the
    5-byte wire header, then run the pure-Python record decoder in an
    Arrow-batched pass. ``schema`` is the writer's Avro record schema (the
    contract's, via export.to_avro_schema)."""
    import pyarrow as pa
    from pyspark.sql.pandas.types import to_arrow_schema

    spark_schema = avro_to_spark_type(schema)
    arrow_schema = to_arrow_schema(spark_schema)
    field_names = [f.name for f in spark_schema.fields]
    schema_json = json.dumps(schema)

    def decode(batches):
        reader = compile_reader(json.loads(schema_json))
        for batch in batches:
            rows = []
            for v in batch.column(0).to_pylist():
                # PERMISSIVE semantics, matching the JVM from_avro path this
                # substitutes for (io.py passes mode=PERMISSIVE): a corrupt
                # payload, wrong framing (magic byte != 0), or short message
                # becomes an all-null row — one bad Kafka message must not
                # kill the whole read on the no-jar path while passing
                # silently on the jar path
                if v is None or len(v) < 5 or v[0] != 0:
                    rows.append({})
                    continue
                try:
                    rec, _ = reader(v[5:], 0)
                except ValueError:
                    rec = {}
                rows.append(rec)
            cols = {n: [r.get(n) for r in rows] for n in field_names}
            yield pa.RecordBatch.from_pydict(cols, schema=arrow_schema)

    from pyspark.sql import functions as F

    return df.select(F.col(value_col)).mapInArrow(decode, spark_schema)
