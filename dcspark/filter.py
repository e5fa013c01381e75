"""Contract-driven corpus filtering: split a table into passing rows and
quarantined rows (with per-row failure reasons) in ONE scan.

The reference (datacontract-cli) reports violations; a training-data pipeline
additionally needs to *act* on them — keep the clean rows, route the bad ones
to a quarantine table with machine-readable reasons. This module compiles the
contract's row-local constraints (required / length / range / enum / regex /
format / row-expression — every CompiledCheck that carries a
``violation_predicate``; cf. the reference's per-rule semantics in
`/root/reference/datacontract/engines/data_contract_checks.py`) into a single
``reasons`` array column:

    reasons = filter(array(when(pred_k, 'check_key_k'), ...), not-null)

so validity is ``size(reasons) == 0`` and the whole decision is one
whole-stage-codegen projection — no UDFs, no shuffle, one pass over the data.

Referential integrity (``references:``) is the one contract rule that is not
row-local. It joins the distinct parent key set with a marker column (hinted
``broadcast`` — dimension-sized parents ship to every executor; Catalyst
falls back to shuffle join if the hint is infeasible), so orphan rows get
their reason in the same resulting frame without a second pass over the
child.

Scale note: ``split`` returns two lazy frames over the same plan; executing
both actions scans twice. For write-out, ``write_split`` materializes the
reasons column once and writes a single pass partitioned by validity —
at 10^12 rows the corpus is read exactly once.
"""

from __future__ import annotations

from typing import Dict, List, Optional, Tuple

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .compile import CompiledCheck, create_checks
from .spec import DataContractSpecification

REASONS_COL = "__reasons"
VALID_COL = "__valid"


def row_checks(
    spec: DataContractSpecification, model_name: str,
) -> Tuple[List[CompiledCheck], List[CompiledCheck]]:
    """(row-local checks with predicates, reference checks) for a model.
    Aggregate-only rules (unique, freshness, metric thresholds, audio decode)
    have no per-row verdict and are intentionally excluded — they are the
    validation engine's job, not the filter's."""
    checks = create_checks(spec).get(model_name, [])
    preds = [c for c in checks if c.violation_predicate is not None]
    refs = [c for c in checks if c.kind == "reference"]
    return preds, refs


def with_reasons(
    df: DataFrame,
    spec: DataContractSpecification,
    model_name: str,
    tables: Optional[Dict[str, DataFrame]] = None,
    broadcast_references: bool = True,
) -> DataFrame:
    """Input frame + a sorted ``__reasons array<string>`` column of failed
    check keys per row (empty array = clean row). ``tables`` supplies parent
    frames for ``references:`` rules; a reference whose parent table is not
    provided is skipped (the validation engine reports it instead)."""
    preds, refs = row_checks(spec, model_name)
    out = df
    # (check, flag) pairs stay aligned even when some parents are absent —
    # a zip over separately-built lists would misattribute orphan reasons
    joined_refs: List[Tuple[CompiledCheck, str]] = []
    for i, chk in enumerate(refs):
        parent = (tables or {}).get(chk.params["parent_model"])
        if parent is None:
            continue
        if chk.params["parent_field"] not in parent.columns:
            # engine parity: a missing parent column degrades to an error
            # CHECK there (engine._reference_compute), never an
            # AnalysisException — crashing here would kill a WAP salvage
            # stream mid-batch instead of quarantining the batch
            continue
        flag = f"__ref_ok_{i}"
        keys = parent.select(
            F.col(chk.params["parent_field"]).alias(f"__pk_{i}")
        ).where(F.col(chk.params["parent_field"]).isNotNull()).distinct() \
            .withColumn(flag, F.lit(True))
        if broadcast_references:
            keys = F.broadcast(keys)
        out = out.join(
            keys, on=out[chk.field] == keys[f"__pk_{i}"], how="left",
        ).drop(f"__pk_{i}")
        joined_refs.append((chk, flag))

    def _ref_orphan(chk: CompiledCheck, flag: str):
        # NULL child keys are the required-check's concern, never an orphan
        cond = F.col(chk.field).isNotNull() & F.col(flag).isNull()
        # per-check `filter:` scoping (engine parity: the engine filters the
        # child frame BEFORE its anti-join, so an out-of-scope row must
        # never be tagged an orphan here either)
        flt = chk.params.get("filter")
        if flt:
            cond = cond & F.coalesce(F.expr(flt), F.lit(False))
        return F.when(cond, F.lit(chk.key))

    entries = [
        F.when(chk.violation_predicate(), F.lit(chk.key)) for chk in preds
    ] + [_ref_orphan(chk, flag) for chk, flag in joined_refs]
    if not entries:
        return out.withColumn(
            REASONS_COL, F.array().cast("array<string>"))
    reasons = F.array_sort(
        F.filter(F.array(*entries), lambda x: x.isNotNull()))
    return out.withColumn(REASONS_COL, reasons).drop(
        *[flag for _, flag in joined_refs])


def split(
    df: DataFrame,
    spec: DataContractSpecification,
    model_name: str,
    tables: Optional[Dict[str, DataFrame]] = None,
    broadcast_references: bool = True,
) -> Tuple[DataFrame, DataFrame]:
    """(valid_rows, quarantined_rows). Valid rows carry the original schema;
    quarantined rows keep the ``__reasons`` column. Both are lazy views over
    one plan — persist the ``with_reasons`` frame or use ``write_split`` when
    both sides will be materialized."""
    tagged = with_reasons(df, spec, model_name, tables, broadcast_references)
    valid = tagged.filter(F.size(REASONS_COL) == 0).drop(REASONS_COL)
    quarantine = tagged.filter(F.size(REASONS_COL) > 0)
    return valid, quarantine


def write_split(
    df: DataFrame,
    spec: DataContractSpecification,
    model_name: str,
    path: str,
    tables: Optional[Dict[str, DataFrame]] = None,
    broadcast_references: bool = True,
    fmt: str = "parquet",
) -> None:
    """Single-pass split write: the corpus is scanned ONCE and written
    partitioned by validity — ``<path>/__valid=true`` holds the clean rows,
    ``<path>/__valid=false`` the quarantine (reasons serialized to a
    comma-joined string column so every format can carry it)."""
    tagged = with_reasons(df, spec, model_name, tables, broadcast_references)
    tagged = tagged.withColumn(VALID_COL, F.size(REASONS_COL) == 0) \
        .withColumn(REASONS_COL, F.array_join(REASONS_COL, ","))
    tagged.write.partitionBy(VALID_COL).mode("overwrite").format(fmt).save(path)
