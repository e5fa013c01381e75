"""Pure-Python Delta Lake transaction log: read AND append, no jar.

The sandbox has no delta-spark jar, so `format("delta")` is unavailable;
this module implements the published Delta protocol
(https://github.com/delta-io/delta/blob/master/PROTOCOL.md) directly:

- **state reconstruction**: replay `_delta_log/NNNNNNNNNNNNNNNNNNNN.json`
  commits (add / remove / metaData / protocol actions), starting from the
  newest parquet checkpoint referenced by `_last_checkpoint` when present.
  The live file set is adds minus removes, last-metaData-wins for schema.
- **time travel**: `version_as_of` replays a prefix of the log;
  `timestamp_as_of` resolves the newest commit at/before the instant via
  commitInfo/file timestamps.
- **partition handling**: Delta stores partition values in the log (data
  files do NOT contain partition columns). Reads recover them through
  Spark's hive-style partition discovery (`basePath` option) when the
  files sit in `col=value/` dirs — the layout this writer and Spark's own
  delta writer both produce — and fall back to per-partition literal
  columns otherwise. `partition_filter` prunes the file list driver-side,
  O(#files), before any scan.
- **append/overwrite commits**: distributed `partitionBy` parquet write
  into the table dir, then an atomic `os.link` of the next
  `<version>.json` — the same optimistic-concurrency swap the protocol
  specifies (a racer's existing version file fails the link).

Reference parity: the reference CLI reads delta via soda/duckdb's
delta_scan (`datacontract/engines/soda/connections/duckdb.py:60-75`) and
only where a Delta runtime exists; here the protocol itself is
implemented so `server.format: delta` validates real Delta tables with
zero extra dependencies.

Checkpoints are read AND written: `checkpoint()` compacts the state at a
version into the protocol's classic parquet checkpoint + _last_checkpoint
(commits themselves always append JSON), and `clean_log()` drops the
now-redundant JSON commits below it — the two maintenance actions that
keep log replay O(#commits since checkpoint) on long-lived tables.

Documented seams: deletion vectors and column mapping (protocol reader
features beyond minReaderVersion 1 are rejected with a clear error).
"""

from __future__ import annotations

import json
import os
import shutil
import uuid as _uuid
from typing import Any, Dict, List, Optional, Tuple

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T


class DeltaProtocolError(RuntimeError):
    pass


class DeltaCommitConflict(RuntimeError):
    """Another writer committed the log version we raced for."""


def _delta_partition_literal(want) -> "Optional[str]":
    """A filter literal in the log's partitionValues serialization: JSON
    strings 'true'/'false' for booleans (Python str(True) is 'True', which
    never matches and wrongly pruned EVERY file), None for a null partition
    (stored as JSON null), str() otherwise (ints/strings/dates match)."""
    if want is None:
        return None
    if isinstance(want, bool):
        return "true" if want else "false"
    return str(want)


def _log_dir(location: str) -> str:
    return os.path.join(os.path.abspath(location), "_delta_log")


def _commit_path(location: str, version: int) -> str:
    return os.path.join(_log_dir(location), f"{version:020d}.json")


class DeltaTable:
    """A filesystem Delta table. `location` is the table root."""

    def __init__(self, location: str):
        self.location = os.path.abspath(location)

    # -- log replay ---------------------------------------------------------

    def exists(self) -> bool:
        return os.path.exists(_commit_path(self.location, 0)) or \
            os.path.exists(os.path.join(_log_dir(self.location),
                                        "_last_checkpoint"))

    def latest_version(self) -> int:
        ld = _log_dir(self.location)
        best = -1
        if os.path.isdir(ld):
            for name in os.listdir(ld):
                if name.endswith(".json") and name[:20].isdigit():
                    best = max(best, int(name[:20]))
        # a compacted log may hold only a checkpoint (json prefix removed)
        lc = os.path.join(ld, "_last_checkpoint")
        if os.path.exists(lc):
            with open(lc) as f:
                best = max(best, int(json.load(f).get("version", -1)))
        if best < 0:
            raise FileNotFoundError(f"no Delta log under {ld}")
        return best

    def _checkpoint_start(
        self, upto: int
    ) -> Tuple[int, Dict[str, dict], Optional[dict], Optional[dict]]:
        """-> (first json version to replay, adds, metaData, protocol)
        seeded from the newest eligible checkpoint, if any. Read via
        pyarrow so Spark-free metadata paths (schema checks) work too."""
        ld = _log_dir(self.location)
        lc = os.path.join(ld, "_last_checkpoint")
        if not os.path.exists(lc):
            return 0, {}, None, None
        with open(lc) as f:
            info = json.load(f)
        v = int(info["version"])
        if v > upto:
            # checkpoint is newer than the requested version: replay json only
            return 0, {}, None, None
        cp = [os.path.join(ld, f"{v:020d}.checkpoint.parquet")]
        if not os.path.exists(cp[0]):
            cp = [os.path.join(ld, n) for n in sorted(os.listdir(ld))
                  if n.startswith(f"{v:020d}.checkpoint.") and
                  n.endswith(".parquet")]
            if not cp:
                return 0, {}, None, None
        import pyarrow.parquet as pq

        def _plain(x, keep_none=False):
            if isinstance(x, dict):
                # struct level: None = an UNSET optional action field, drop —
                # EXCEPT inside partitionValues, where a None VALUE is real
                # data (a null partition; dropping it changed
                # partition_filter results after checkpoint compaction).
                # pyarrow may hand the map back as a struct-derived dict or
                # as key/value tuples, so both branches honor keep_none.
                return {k: _plain(v2, keep_none=(k == "partitionValues"))
                        for k, v2 in x.items()
                        if keep_none or v2 is not None}
            if isinstance(x, list):
                if x and isinstance(x[0], tuple) and len(x[0]) == 2:
                    return {k: v2 for k, v2 in x}  # map type, values kept
                return [_plain(v2) for v2 in x]
            return x

        adds: Dict[str, dict] = {}
        meta = proto = None
        for path in cp:
            for row in pq.read_table(path).to_pylist():
                act = _plain(row)
                if act.get("add"):
                    adds[act["add"]["path"]] = act["add"]
                elif act.get("metaData"):
                    meta = act["metaData"]
                elif act.get("protocol"):
                    proto = act["protocol"]
        return v + 1, adds, meta, proto

    def _replay(
        self, spark: Optional[SparkSession] = None,
        version_as_of: Optional[int] = None,
        timestamp_as_of_ms: Optional[int] = None,
    ) -> Tuple[Dict[str, dict], dict, Optional[dict], int]:
        """-> (live adds by path, metaData, protocol, resolved version)."""
        latest = self.latest_version()
        upto = latest if version_as_of is None else version_as_of
        if upto > latest:
            raise ValueError(f"version {upto} > latest {latest}")
        if timestamp_as_of_ms is not None:
            upto = self._version_at(timestamp_as_of_ms)
        start, adds, meta, proto = self._checkpoint_start(upto)
        for v in range(start, upto + 1):
            path = _commit_path(self.location, v)
            if not os.path.exists(path):
                # every version in [start, upto] must exist: commits below
                # `start` live in the checkpoint, and latest_version() only
                # reports versions with files — a gap here is a partially
                # deleted log, and silently skipping it would return a stale
                # snapshot missing that commit's adds/removes. (The previous
                # guard only fired before the FIRST add was seen.)
                raise FileNotFoundError(f"missing Delta commit {v}")
            with open(path) as f:
                for line in f:
                    line = line.strip()
                    if not line:
                        continue
                    act = json.loads(line)
                    if act.get("add"):
                        a = act["add"]
                        adds[a["path"]] = a
                    elif act.get("remove"):
                        adds.pop(act["remove"]["path"], None)
                    elif act.get("metaData"):
                        meta = act["metaData"]
                    elif act.get("protocol"):
                        proto = act["protocol"]
        if proto and int(proto.get("minReaderVersion", 1)) > 1:
            # reader v2 = column mapping (physical col-<uuid> names — a v2
            # table has NO readerFeatures list, so gating on the list let
            # these through to be silently misread); v3 = feature list.
            # Reject anything beyond the supported feature set either way.
            unsupported = set(proto.get("readerFeatures")
                              or ["columnMapping"]) - {"timestampNtz"}
            if unsupported:
                raise DeltaProtocolError(
                    f"table requires minReaderVersion "
                    f"{proto.get('minReaderVersion')} features "
                    f"{sorted(unsupported)} "
                    "(deletion vectors / column mapping are documented seams)")
        if meta is None:
            raise DeltaProtocolError("Delta log has no metaData action")
        return adds, meta, proto, upto

    def _version_at(self, ts_ms: int) -> int:
        """Newest version whose commit timestamp <= ts_ms."""
        best = None
        for v in range(0, self.latest_version() + 1):
            path = _commit_path(self.location, v)
            if not os.path.exists(path):
                continue
            commit_ts = None
            with open(path) as f:
                for line in f:
                    act = json.loads(line)
                    if act.get("commitInfo", {}).get("timestamp"):
                        commit_ts = int(act["commitInfo"]["timestamp"])
                        break
            if commit_ts is None:
                commit_ts = int(os.path.getmtime(path) * 1000)
            if commit_ts <= ts_ms:
                best = v
        if best is None:
            raise ValueError(f"no Delta commit at/before {ts_ms}")
        return best

    # -- read ---------------------------------------------------------------

    def schema(self) -> T.StructType:
        _adds, meta, _proto, _v = self._replay()
        return T.StructType.fromJson(json.loads(meta["schemaString"]))

    def read(
        self,
        spark: SparkSession,
        version_as_of: Optional[int] = None,
        timestamp_as_of_ms: Optional[int] = None,
        partition_filter: Optional[Dict[str, Any]] = None,
    ) -> DataFrame:
        """The table as a DataFrame at the requested version: log replay ->
        pruned file list -> one parquet scan with hive partition recovery."""
        adds, meta, _proto, _v = self._replay(spark, version_as_of, timestamp_as_of_ms)
        schema = T.StructType.fromJson(json.loads(meta["schemaString"]))
        part_cols = list(meta.get("partitionColumns") or [])
        live = list(adds.values())
        if partition_filter:
            for col, want in partition_filter.items():
                expect = _delta_partition_literal(want)
                live = [a for a in live
                        if a.get("partitionValues", {}).get(col) == expect
                        or col not in (a.get("partitionValues") or {})]
        if not live:
            return spark.createDataFrame([], schema)
        paths = [os.path.join(self.location, a["path"]) for a in live]
        hive_layout = all(
            all(f"{c}=" in a["path"] for c in part_cols) for a in live
        ) if part_cols else True
        if hive_layout:
            df = (spark.read.option("basePath", self.location)
                  .parquet(*paths))
            # partition discovery types partition cols by inference; cast to
            # the declared schema and restore declared column order
            for c in part_cols:
                declared = schema[c].dataType
                df = df.withColumn(c, F.col(c).cast(declared))
            return df.select(*[f.name for f in schema.fields])
        # non-hive layout: attach partition values as per-file literals
        by_part: Dict[Tuple, List[str]] = {}
        for a in live:
            key = tuple((a.get("partitionValues") or {}).get(c)
                        for c in part_cols)
            by_part.setdefault(key, []).append(
                os.path.join(self.location, a["path"]))
        frames = []
        for key, fpaths in sorted(by_part.items()):
            sub = spark.read.parquet(*fpaths)
            for c, v in zip(part_cols, key):
                sub = sub.withColumn(
                    c, F.lit(v).cast(schema[c].dataType))
            frames.append(sub.select(*[f.name for f in schema.fields]))
        out = frames[0]
        for f2 in frames[1:]:
            out = out.unionByName(f2)
        return out

    def checkpoint(self, version: Optional[int] = None) -> str:
        """Write a classic parquet checkpoint of the state at ``version``
        (default: latest) plus `_last_checkpoint` — the Delta protocol's
        log-compaction point. Replay cost for every later reader drops
        from O(#commits since table birth) to O(#commits since the
        checkpoint): at production commit rates (one per micro-batch,
        10^5-10^6 commits/year) this is the difference between a
        millisecond open and replaying the table's entire history. One
        row per action (add / metaData / protocol), the same shape
        `_checkpoint_start` reads back. Returns the checkpoint path."""
        import pyarrow as pa
        import pyarrow.parquet as pq

        adds, meta, proto, v = self._replay(version_as_of=version)
        proto = proto or {"minReaderVersion": 1, "minWriterVersion": 2}

        def clean(x):
            # empty dicts (unpartitioned partitionValues, metaData
            # configuration) infer as zero-child structs, which parquet
            # cannot store; None round-trips (the reader drops Nones and
            # every consumer defaults missing maps to {})
            if isinstance(x, dict):
                out = {k: clean(v2) for k, v2 in x.items()}
                return out or None
            if isinstance(x, list):
                return [clean(v2) for v2 in x]
            return x

        # The protocol requires checkpoints to RETAIN unexpired remove
        # tombstones (VACUUM reads them to know what it may delete) and the
        # latest txn (setTransaction) per appId (a streaming writer's
        # exactly-once watermark — dropping it makes the writer re-deliver
        # its last batch after clean_log). Collect both from the prior
        # checkpoint and the replayed JSON range; a tombstone is superseded
        # when its path is re-added or its retention window (7 days,
        # Delta's default) has passed.
        removes: Dict[str, dict] = {}
        txns: Dict[str, dict] = {}
        ld = _log_dir(self.location)
        start, _pa, _pm, _pp = self._checkpoint_start(v)
        if start > 0:
            prior = [os.path.join(ld, n) for n in sorted(os.listdir(ld))
                     if n.startswith(f"{start - 1:020d}.checkpoint.")
                     and n.endswith(".parquet")]
            for p in prior:
                for row in pq.read_table(p).to_pylist():
                    r = row.get("remove")
                    if r and r.get("path"):
                        removes[r["path"]] = r
                    t = row.get("txn")
                    if t and t.get("appId"):
                        txns[t["appId"]] = t
        for cv in range(start, v + 1):
            cpath = _commit_path(self.location, cv)
            if not os.path.exists(cpath):
                continue
            with open(cpath) as f:
                for line in f:
                    line = line.strip()
                    if not line:
                        continue
                    act = json.loads(line)
                    if act.get("remove"):
                        removes[act["remove"]["path"]] = act["remove"]
                    elif act.get("add"):
                        removes.pop(act["add"]["path"], None)
                    elif act.get("txn"):
                        txns[act["txn"]["appId"]] = act["txn"]
        import time as _time

        horizon = int(_time.time() * 1000) - 7 * 24 * 3600 * 1000
        removes = {p: r for p, r in removes.items()
                   if int(r.get("deletionTimestamp") or horizon + 1) > horizon}

        def row(**kw):
            # remove/txn columns exist only when present — an all-None
            # column would infer as parquet null type
            base = {"add": None, "metaData": None, "protocol": None}
            if removes:
                base["remove"] = None
            if txns:
                base["txn"] = None
            base.update(kw)
            return base

        rows = [row(add=clean(a)) for _p, a in sorted(adds.items())]
        rows += [row(remove=clean(r)) for _p, r in sorted(removes.items())]
        rows += [row(txn=clean(t)) for _a, t in sorted(txns.items())]
        rows.append(row(metaData=clean(meta)))
        rows.append(row(protocol=clean(proto)))
        path = os.path.join(ld, f"{v:020d}.checkpoint.parquet")
        # atomic: a rerun at the same version otherwise rewrites the file
        # _last_checkpoint already points at IN PLACE — a concurrent reader
        # (or a crash mid-rewrite after clean_log) would see a torn
        # checkpoint with the JSON prefix already gone
        tmp_pq = path + ".tmp"
        pq.write_table(pa.Table.from_pylist(rows), tmp_pq)
        os.replace(tmp_pq, path)
        lc = os.path.join(ld, "_last_checkpoint")
        cur_ver = -1
        if os.path.exists(lc):
            try:
                with open(lc) as f:
                    cur_ver = int(json.load(f).get("version", -1))
            except (ValueError, json.JSONDecodeError):
                cur_ver = -1
        if v >= cur_ver:
            # never regress the pointer: checkpointing an OLDER snapshot
            # (legal — e.g. for an export) must not undo the maintenance a
            # newer checkpoint already provides
            tmp = lc + ".tmp"
            with open(tmp, "w") as f:
                json.dump({"version": v, "size": len(rows)}, f)
            os.replace(tmp, lc)
        return path

    def clean_log(self) -> int:
        """Delete JSON commits at/below the newest checkpoint — they are
        redundant for every read at or after it (replay seeds from the
        checkpoint). Time/version travel BELOW the checkpoint becomes
        unavailable, exactly like Delta's own log retention. Returns the
        number of commit files removed; refuses without a checkpoint."""
        ld = _log_dir(self.location)
        lc = os.path.join(ld, "_last_checkpoint")
        if not os.path.exists(lc):
            raise ValueError("clean_log requires a checkpoint first")
        with open(lc) as f:
            cpv = int(json.load(f)["version"])
        removed = 0
        for name in sorted(os.listdir(ld)):
            if name.endswith(".json") and name[:20].isdigit() and \
                    int(name[:20]) <= cpv:
                os.unlink(os.path.join(ld, name))
                removed += 1
        return removed

    def files(self, **kw) -> List[str]:
        adds, _meta, _proto, _v = self._replay(**kw)
        return sorted(os.path.join(self.location, a["path"])
                      for a in adds.values())

    # -- write --------------------------------------------------------------

    @classmethod
    def create(
        cls, location: str, schema: T.StructType,
        partition_columns: Optional[List[str]] = None,
        properties: Optional[Dict[str, str]] = None,
    ) -> "DeltaTable":
        t = cls(location)
        if t.exists():
            raise FileExistsError(f"Delta table already exists at {location}")
        os.makedirs(_log_dir(location), exist_ok=True)
        import time

        actions = [
            {"protocol": {"minReaderVersion": 1, "minWriterVersion": 2}},
            {"metaData": {
                "id": str(_uuid.uuid4()),
                "format": {"provider": "parquet", "options": {}},
                "schemaString": json.dumps(schema.jsonValue()),
                "partitionColumns": list(partition_columns or []),
                "configuration": dict(properties or {}),
                "createdTime": int(time.time() * 1000),
            }},
            {"commitInfo": {"timestamp": int(time.time() * 1000),
                            "operation": "CREATE TABLE"}},
        ]
        t._commit(0, actions)
        return t

    def _commit(self, version: int, actions: List[dict]) -> None:
        target = _commit_path(self.location, version)
        tmp = os.path.join(_log_dir(self.location),
                           f".tmp-{_uuid.uuid4().hex}.json")
        with open(tmp, "w") as f:
            for a in actions:
                f.write(json.dumps(a) + "\n")
        try:
            os.link(tmp, target)
        except FileExistsError:
            raise DeltaCommitConflict(
                f"Delta version {version} already committed by a "
                "concurrent writer") from None
        finally:
            os.unlink(tmp)

    def _write_files(self, df: DataFrame, part_cols: List[str]) -> List[dict]:
        """Distributed parquet write -> add actions. Partition columns are
        dropped from the data files (protocol: values live in the log) and
        the hive `col=value` layout keeps reads single-scan."""
        import time

        staging = os.path.join(self.location,
                               f".staging-{_uuid.uuid4().hex}")
        if part_cols:
            df.write.partitionBy(*part_cols).parquet(staging)
        else:
            df.write.parquet(staging)
        commit_id = _uuid.uuid4().hex[:12]
        adds = []
        from urllib.parse import unquote

        for root, _d, names in os.walk(staging):
            for name in sorted(names):
                if not name.endswith(".parquet"):
                    continue
                src = os.path.join(root, name)
                rel_dir = os.path.relpath(root, staging)
                pvals: Dict[str, str] = {}
                if rel_dir != ".":
                    for seg in rel_dir.split(os.sep):
                        k, _, v = seg.partition("=")
                        pvals[k] = (None if v == "__HIVE_DEFAULT_PARTITION__"
                                    else unquote(v))
                dest_dir = (self.location if rel_dir == "."
                            else os.path.join(self.location, rel_dir))
                os.makedirs(dest_dir, exist_ok=True)
                fname = f"{commit_id}-{name}"
                os.rename(src, os.path.join(dest_dir, fname))
                rel_path = (fname if rel_dir == "."
                            else os.path.join(rel_dir, fname))
                adds.append({"add": {
                    "path": rel_path.replace(os.sep, "/"),
                    "partitionValues": pvals,
                    "size": os.path.getsize(os.path.join(dest_dir, fname)),
                    "modificationTime": int(time.time() * 1000),
                    "dataChange": True,
                }})
        shutil.rmtree(staging, ignore_errors=True)
        return adds

    def _check_schema(self, df: DataFrame) -> Tuple[dict, List[str], Dict[str, dict], int]:
        """-> (metaData, partition columns, live adds, resolved version) —
        ONE log replay serves the schema check AND the caller's state needs
        (overwrite previously replayed twice and re-listed the log dir a
        third time for latest_version on long logs)."""
        adds, meta, _proto, v = self._replay()
        declared = T.StructType.fromJson(json.loads(meta["schemaString"]))
        want = [(f.name, f.dataType.simpleString()) for f in declared.fields]
        got = [(f.name, f.dataType.simpleString()) for f in df.schema.fields]
        if sorted(want) != sorted(got):
            raise ValueError(f"append schema mismatch: table={want} df={got}")
        return meta, list(meta.get("partitionColumns") or []), adds, v

    def append(self, df: DataFrame) -> int:
        import time

        _meta, part_cols, _adds, cur_v = self._check_schema(df)
        v = cur_v + 1
        actions = self._write_files(df, part_cols)
        actions.append({"commitInfo": {
            "timestamp": int(time.time() * 1000), "operation": "WRITE",
            "operationParameters": {"mode": "Append"}}})
        self._commit(v, actions)
        return v

    def overwrite(self, df: DataFrame) -> int:
        import time

        _meta, part_cols, adds, cur_v = self._check_schema(df)
        v = cur_v + 1
        actions = [{"remove": {"path": p,
                               "deletionTimestamp": int(time.time() * 1000),
                               "dataChange": True}}
                   for p in sorted(adds)]
        actions += self._write_files(df, part_cols)
        actions.append({"commitInfo": {
            "timestamp": int(time.time() * 1000), "operation": "WRITE",
            "operationParameters": {"mode": "Overwrite"}}})
        self._commit(v, actions)
        return v


def read_delta_table(spark: SparkSession, location: str, **kw) -> DataFrame:
    return DeltaTable(location).read(spark, **kw)
