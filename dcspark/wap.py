"""Write-audit-publish ingestion: contract-gated Iceberg commits.

The reference validates tables in place (`datacontract test` reads a
configured server and reports; /root/reference/datacontract/cli.py `test`)
— it has no way to stop a bad batch from becoming visible in the first
place. This module closes that loop using the Iceberg `refs` machinery
(dcspark/iceberg.py): every incoming batch lands on an AUDIT branch, the
contract engine validates ONLY the branch increment, and the batch becomes
visible on main via an atomic, metadata-only fast-forward iff the run is
green. Main readers never observe unaudited rows, and a red batch needs no
rollback of main because it never reached main.

Scale shape: the audit run scans exactly the increment's data files
(`read_incremental` plans manifests by sequence number — already-published
history is never rescanned), publish moves a pointer (zero data rewrites
at any table size), and a red batch's files are reclaimed by the normal
retention pair `expire_snapshots` (its snapshot is ref-unreachable once
the branch resets) + `remove_orphan_files`.
"""

from __future__ import annotations

import threading
from dataclasses import dataclass, field as dc_field
from typing import Dict, List, Optional, Union

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .engine import ValidationConfig, ValidationResult, validate
from .filter import REASONS_COL as _REASONS
from .iceberg import IcebergTable
from .run_model import ResultEnum
from .spec import DataContractSpecification


@dataclass
class WapOutcome:
    """One batch's trip through write-audit-publish."""

    published: bool
    result: Optional[ValidationResult]  # None for an empty batch
    snapshot_id: Optional[int]          # branch snapshot the batch landed as
    main_head: Optional[int]            # main's head AFTER this batch
    rows: int = 0
    failed_checks: List[str] = dc_field(default_factory=list)
    quarantined_rows: int = 0
    salvaged_rows: int = 0              # rows published by salvage split


def _failed_keys(result: ValidationResult) -> List[str]:
    return [c.key for c in result.run.checks
            if c.result in (ResultEnum.failed, ResultEnum.error)]


def wap_append(
    spark: SparkSession,
    spec: DataContractSpecification,
    table: Union[IcebergTable, str],
    df: DataFrame,
    model_name: str,
    branch: str = "audit",
    static_tables: Optional[Dict[str, DataFrame]] = None,
    config: Optional[ValidationConfig] = None,
    quarantine_sink: Optional[str] = None,
    on_fail: str = "quarantine",
) -> WapOutcome:
    """Land `df` on the audit branch, validate the increment, publish iff
    the contract run passes.

    Green path: append to `branch` -> validate the branch-over-main
    increment (plus `static_tables`, e.g. the transcripts reference) ->
    `fast_forward("main", branch)`. Red path: main is untouched, the
    branch is reset to main's head so the bad snapshot becomes
    ref-unreachable (expirable), and — `on_fail="quarantine"` (default) —
    the whole increment is appended to `quarantine_sink` (parquet).
    `on_fail="salvage"` instead quarantines only the rows the contract's
    row-expressible rules reject (with their `__reasons`) and sends the
    clean remainder back through the full gate, so one poison row does
    not block a million good ones; the remainder still re-validates
    end-to-end, so table-level rules (drift, SQL quality) keep their veto.

    Bootstrap: an empty table has no snapshot to branch from, so the first
    batch validates standalone and appends straight to main when green.

    Single-writer per table, like every Iceberg commit path here (the
    metadata commit is version-checked); foreachBatch serializes batches,
    so `wap_stream` satisfies this by construction.
    """
    t = table if isinstance(table, IcebergTable) else IcebergTable(table)
    n = df.count()
    if n == 0:
        return WapOutcome(published=False, result=None, snapshot_id=None,
                          main_head=t.current_snapshot_id(), rows=0)
    tables: Dict[str, DataFrame] = {model_name: df}
    if static_tables:
        tables.update(static_tables)

    if on_fail not in ("quarantine", "salvage"):
        raise ValueError(f"on_fail must be quarantine|salvage, got {on_fail!r}")
    main_head = t.current_snapshot_id()
    if main_head is None:
        # bootstrap: nothing to branch from; audit the batch standalone
        result = validate(spark, spec, tables, config)
        if result.run.result == ResultEnum.passed:
            sid = t.append(df)
            return WapOutcome(published=True, result=result,
                              snapshot_id=sid, main_head=sid, rows=n)
        if on_fail == "salvage":
            from . import filter as filter_mod

            # same one-scan persist as _salvage: both sides + the append
            # below derive from one tagged frame
            tagged = filter_mod.with_reasons(
                df, spec, model_name, tables).persist()
            valid = tagged.filter(
                F.size(filter_mod.REASONS_COL) == 0
            ).drop(filter_mod.REASONS_COL)
            bad = tagged.filter(
                F.size(filter_mod.REASONS_COL) > 0
            ).withColumn(
                filter_mod.REASONS_COL,
                F.array_join(F.col(filter_mod.REASONS_COL), ","))
            try:
                q = _quarantine(bad, quarantine_sink)
                n_valid = valid.count()
                if n_valid:
                    tables = dict(tables)
                    tables[model_name] = valid
                    result2 = validate(spark, spec, tables, config)
                    if result2.run.result == ResultEnum.passed:
                        sid = t.append(valid)
                        return WapOutcome(published=True, result=result2,
                                          snapshot_id=sid, main_head=sid,
                                          rows=n, quarantined_rows=q,
                                          salvaged_rows=n_valid)
                    result = result2
                    q += _quarantine(
                        valid.withColumn(
                            filter_mod.REASONS_COL,
                            F.lit(",".join(_failed_keys(result2)))),
                        quarantine_sink)
                return WapOutcome(published=False, result=result,
                                  snapshot_id=None, main_head=None, rows=n,
                                  failed_checks=_failed_keys(result),
                                  quarantined_rows=q)
            finally:
                tagged.unpersist()
        q = _quarantine(
            df.withColumn(_REASONS, F.lit(",".join(_failed_keys(result)))),
            quarantine_sink)
        return WapOutcome(published=False, result=result, snapshot_id=None,
                          main_head=None, rows=n,
                          failed_checks=_failed_keys(result),
                          quarantined_rows=q)

    # the audit branch is ephemeral per batch: (re)point it at main's head
    refs = t.refs()
    r = refs.get(branch)
    if r is None:
        t.create_branch(branch)
    elif r.get("type") != "branch":
        raise ValueError(f"{branch!r} is a tag — WAP needs a branch")
    elif r["snapshot-id"] != main_head:
        t.drop_ref(branch)
        t.create_branch(branch)

    branch_head = t.append(df, branch=branch)
    inc = t.read_incremental(spark, main_head, to_snapshot_id=branch_head)
    tables[model_name] = inc  # validate what actually landed, not the input
    result = validate(spark, spec, tables, config)
    if result.run.result == ResultEnum.passed:
        head = t.fast_forward("main", branch)
        return WapOutcome(published=True, result=result,
                          snapshot_id=branch_head, main_head=head, rows=n)
    # reset: the red snapshot stays readable by id for debugging but is
    # ref-unreachable, so the next expire_snapshots reclaims it
    t.drop_ref(branch)
    t.create_branch(branch)
    if on_fail == "salvage":
        return _salvage(spark, spec, t, inc, model_name, branch, tables,
                        config, quarantine_sink, result, branch_head, n)
    q = _quarantine(
        inc.withColumn(_REASONS, F.lit(",".join(_failed_keys(result)))),
        quarantine_sink)
    return WapOutcome(published=False, result=result,
                      snapshot_id=branch_head, main_head=main_head, rows=n,
                      failed_checks=_failed_keys(result),
                      quarantined_rows=q)


def _salvage(spark, spec, t, inc, model_name, branch, tables, config,
             quarantine_sink, first_result, branch_head, n) -> WapOutcome:
    """Row-level rescue of a red batch: split the increment on the
    contract's row-expressible rules (dcspark/filter.py — per-row
    predicates + reference anti-joins), quarantine only the violators
    (WITH their `__reasons`), and send the clean remainder back through
    the FULL gate — the re-validation is what catches table-level rules
    (drift, SQL quality, aggregate thresholds) that no row filter can
    attribute to single rows. If even the clean remainder fails the gate,
    everything quarantines and main stays untouched."""
    from . import filter as filter_mod

    # persist the tagged frame ONCE: quarantine write, valid.count(), and
    # the branch append below all derive from it — unpersisted, each would
    # re-run the row predicates + broadcast reference joins over the
    # audited increment (the one-scan posture filter.py itself documents)
    tagged = filter_mod.with_reasons(inc, spec, model_name, tables).persist()
    try:
        valid = tagged.filter(
            F.size(filter_mod.REASONS_COL) == 0).drop(filter_mod.REASONS_COL)
        bad = tagged.filter(F.size(filter_mod.REASONS_COL) > 0).withColumn(
            filter_mod.REASONS_COL,
            F.array_join(F.col(filter_mod.REASONS_COL), ","))
        q = _quarantine(bad, quarantine_sink)
        n_valid = valid.count()
        main_head = t.current_snapshot_id()
        if n_valid == 0:
            return WapOutcome(published=False, result=first_result,
                              snapshot_id=branch_head, main_head=main_head,
                              rows=n, failed_checks=_failed_keys(first_result),
                              quarantined_rows=q)
        retry_head = t.append(valid, branch=branch)
    finally:
        tagged.unpersist()
    inc2 = t.read_incremental(spark, main_head, to_snapshot_id=retry_head)
    tables = dict(tables)
    tables[model_name] = inc2
    result2 = validate(spark, spec, tables, config)
    if result2.run.result == ResultEnum.passed:
        head = t.fast_forward("main", branch)
        return WapOutcome(published=True, result=result2,
                          snapshot_id=retry_head, main_head=head, rows=n,
                          quarantined_rows=q, salvaged_rows=n_valid)
    # table-level rules still red: the whole batch is bad, salvage off
    t.drop_ref(branch)
    t.create_branch(branch)
    q += _quarantine(
        inc2.withColumn(filter_mod.REASONS_COL,
                        F.lit(",".join(_failed_keys(result2)))),
        quarantine_sink)
    return WapOutcome(published=False, result=result2,
                      snapshot_id=retry_head, main_head=main_head, rows=n,
                      failed_checks=_failed_keys(result2),
                      quarantined_rows=q)


def _quarantine(df: DataFrame, sink: Optional[str]) -> int:
    if sink is None:
        return 0
    # persist across the write + count: the quarantine frame derives from
    # the audited increment through the contract's row filters, so computing
    # it twice would re-read (and for payload rules re-evaluate) the batch
    df = df.persist()
    try:
        df.write.mode("append").parquet(sink)
        return df.count()
    finally:
        df.unpersist()


@dataclass
class WapStream:
    """Handle for a running WAP ingestion stream.

    ``outcomes`` is BOUNDED (``max_outcomes``, default 1000): an always-on
    production stream appends one outcome per micro-batch forever, and each
    retains Run objects — unbounded growth is a slow driver leak. Consume
    per-batch state through ``on_batch`` when every outcome matters; the
    retained tail (newest last) is for inspection and ``await_batches``,
    which counts via ``total_batches``, not the trimmed list."""

    query: "object"  # StreamingQuery
    outcomes: List[WapOutcome] = dc_field(default_factory=list)
    max_outcomes: int = 1000
    total_batches: int = 0
    _lock: threading.Lock = dc_field(default_factory=threading.Lock)

    def _record(self, outcome: "WapOutcome") -> None:
        with self._lock:
            self.total_batches += 1
            self.outcomes.append(outcome)
            if len(self.outcomes) > self.max_outcomes:
                del self.outcomes[:len(self.outcomes) - self.max_outcomes]

    def stop(self) -> None:
        self.query.stop()

    def await_batches(self, count: int, timeout_s: float = 120.0) -> bool:
        import time

        deadline = time.monotonic() + timeout_s
        while time.monotonic() < deadline:
            with self._lock:
                if self.total_batches >= count:
                    return True
            time.sleep(0.2)
        return False


def wap_stream(
    spark: SparkSession,
    spec: DataContractSpecification,
    table: Union[IcebergTable, str],
    stream_df: DataFrame,
    model_name: str,
    branch: str = "audit",
    static_tables: Optional[Dict[str, DataFrame]] = None,
    config: Optional[ValidationConfig] = None,
    quarantine_sink: Optional[str] = None,
    checkpoint_location: Optional[str] = None,
    on_fail: str = "quarantine",
) -> WapStream:
    """Continuous contract-gated ingestion: every micro-batch rides
    `wap_append`, so main only ever advances by audited batches while the
    stream keeps flowing past red ones (they quarantine instead of
    poisoning the table or killing the query).

    foreachBatch runs batches strictly in sequence, which is exactly the
    single-writer discipline the Iceberg commit path wants; the streaming
    checkpoint gives at-least-once per batch, and a replayed batch that
    already published simply re-validates identical rows.
    """
    t = table if isinstance(table, IcebergTable) else IcebergTable(table)
    handle = WapStream(query=None)

    def process_batch(batch_df: DataFrame, batch_id: int) -> None:
        out = wap_append(spark, spec, t, batch_df, model_name,
                         branch=branch, static_tables=static_tables,
                         config=config, quarantine_sink=quarantine_sink,
                         on_fail=on_fail)
        handle._record(out)

    writer = stream_df.writeStream.foreachBatch(process_batch)
    if checkpoint_location:
        writer = writer.option("checkpointLocation", checkpoint_location)
    handle.query = writer.start()
    return handle
