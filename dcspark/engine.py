"""Validation executor: plans and runs all compiled checks with minimal passes.

Execution plan per model (scale rationale in SURVEY.md §4):

1. Schema checks (field_is_present / field_type) — driver-side against
   ``df.schema``; never trigger a scan (anti-goal parity with the reference).
2. ONE shared multi-aggregate scan computes every agg-kind metric at once:
   null-counts, invalid-counts (length/range/enum/regex/format/not-equal),
   row_count, freshness max / retention min timestamps, and the KS/PSI drift grid
   sums. Catalyst fuses these into a single Exchange + partial (map-side) aggregate;
   with a partition column we run ``groupBy(partition_col)`` instead and merge
   partition rows into the global metrics on the driver (all metrics are
   decomposable: sum/min/max), which also powers checkpoint/resume.
3. The audio decode-conformance pass (Arrow mapInPandas) aggregates its per-row
   flags through the same partitioned/mergeable path.
4. Dedicated jobs that genuinely need their own shuffle: uniqueness (groupBy-key
   duplicate count — map-side partial aggregation bounds shuffle volume by the
   number of DISTINCT keys per partition, AQE handles skew), referential integrity
   (anti-join; broadcast hint when the parent is declared small), and scalar SQL
   quality queries.
5. A violations pass runs ONLY for checks that failed, evaluating all failed
   predicates in a single scan (array-of-structs -> filter -> explode) with a
   per-check row cap (default 500 — parity with DATACONTRACT_MAX_ERRORS,
   /root/reference/datacontract/engines/fastjsonschema/check_jsonschema.py:55-63).

All checks report results (no short-circuiting), matching the reference's
worst-result-wins fold (/root/reference/datacontract/model/run.py:65-75).
"""

from __future__ import annotations

import datetime as dt
import json
import math
import os
from dataclasses import dataclass, field as dc_field
from typing import Any, Dict, List, Optional, Tuple

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from . import audio as audio_mod
from . import drift as drift_mod
from . import tdigest as td_mod
from .compile import CompiledCheck, create_checks
from .run_model import Check, ResultEnum, Run
from .spec import DataContractSpecification, resolve_schema_field, to_spark_data_type

VIOLATION_CAP_DEFAULT = 500

VIOLATIONS_DDL = (
    "run_id string, partition_id string, check_key string, clip_id string, "
    "observed string, expected string"
)

RESULTS_DDL = (
    "run_id string, partition_id string, model string, field string, "
    "check_key string, check_type string, category string, engine string, "
    "result string, metric_value double, threshold string, reason string, "
    "row_count bigint, ts_start timestamp, ts_end timestamp"
)


@dataclass
class ValidationConfig:
    partition_col: Optional[str] = None
    violation_cap: int = VIOLATION_CAP_DEFAULT
    # model -> column -> ref snapshot (drift_mod.build_ref_stats output)
    ref_stats: Dict[str, Dict[str, dict]] = dc_field(default_factory=dict)
    audio_oracle: Optional[audio_mod.OraclePcm] = None
    audio_snr_fn: Optional[audio_mod.SnrFn] = None  # blocked-SNR scale path (wins over oracle)
    now: Optional[dt.datetime] = None  # injectable clock for freshness/retention
    checkpoint_dir: Optional[str] = None
    resume: bool = False
    checkpoint_chunks: int = 4  # partition-groups per checkpointed scan
    broadcast_references: bool = True  # hint broadcast for reference parents
    server_format: Optional[str] = None
    arrow_batch_rows: int = 512  # audio bytes are large; keep Arrow batches bounded
    parallel_jobs: int = 8  # concurrent driver-side Spark job submissions
    # uniqueness strategy: "exact" runs the dedicated two-phase groupBy job
    # (certifiable zero-duplicates); "approx" folds an HLL sketch into the
    # SHARED multi-aggregate scan (north-star architecture: approx-distinct
    # via HyperLogLog) — no key shuffle at all, duplicates estimated as
    # nonnull_count - hll_estimate with a 3-sigma noise floor. At 10^12 rows
    # the exact path shuffles distinct keys; the approx path ships one
    # 2^lgk-bucket sketch per partition and unions them losslessly.
    unique_mode: str = "exact"
    unique_hll_lgk: int = 14  # 2^14 buckets: rsd ~0.8%, ~16 KB sketch/partition
    # referential-integrity strategy: "exact" anti-joins child vs parent keys
    # (broadcast when the parent fits, else sort-merge — the child table
    # shuffles); "approx" folds the parent keys into ONE Bloom bitset and
    # probes child membership MAP-ONLY (zero child-side shuffle at 10^12
    # rows). One-sided semantics, disclosed in the run log + diagnostics:
    # every reported orphan is real (no bloom false negatives), a pass may
    # miss each true orphan with probability ~fpp (~0.8% at 10 bits/key).
    # Falls back to exact when the bitset would exceed the broadcast budget.
    reference_mode: str = "exact"
    reference_bloom_max_bytes: int = 256 << 20  # 256 MB ~ 1.7e8 parent keys
    # percentile (pNN) strategy: "exact" uses percentile_approx (GK sketch)
    # in the shared scan + a dedicated global pass when partitioned (GK
    # results don't merge on the driver); "sketch" builds mergeable
    # t-digests (north-star: approx quantiles via t-digest) in one
    # column-pruned mapInArrow pass — per-partition digests merge to the
    # global quantile with NO extra scan and persist through the checkpoint
    # manifest as base64, so resumed runs never re-read completed partitions.
    pctl_mode: str = "exact"
    pctl_tdigest_delta: int = 500  # compression: ~0.1-1% rank error, ~16 KB/digest
    # metric-history source for ``type: history`` checks: a results table this
    # engine wrote (RESULTS_DDL schema). The per-key window prune runs
    # distributed; only checks x window floats reach the driver.
    history_path: Optional[str] = None
    history_format: str = "parquet"  # parquet | iceberg | delta
    # pre-flight sampled validation: run every data check on a DETERMINISTIC
    # keyed-hash sample (xxhash64 of the model's pk + seed, pure JVM — stable
    # under repartition, task retries, and across runs, so a violation found
    # once reproduces). The point at 10^12 rows: hunt violations and decode
    # payloads at fraction cost before paying for the certifying full run.
    # Semantics are explicit, not hidden: metrics are RAW sample counts
    # (never scaled up); every check's diagnostics carry sample_fraction;
    # found violations are REAL rows (a failure is definitive), while a pass
    # only bounds the violation rate (~3/sample_n at 95%, rule of three).
    # Checks whose meaning doesn't survive sampling keep honest behavior:
    # uniqueness/referential run on the sample (duplicate pairs survive with
    # prob ~fraction^2 — a found duplicate is real, absence proves little),
    # row_count/freshness see sample counts / sample max — all of which the
    # reason string discloses.
    sample_fraction: Optional[float] = None
    sample_seed: int = 0
    # ad-hoc dataset filters per model (CLI --where): ANDed with the model's
    # contract-declared `filter:` when both are present
    model_where: Dict[str, str] = dc_field(default_factory=dict)
    # resume-time lineage verification: each manifest record stores the
    # partition's input-file lineage (file count + md5 of the sorted file
    # list); on resume, a completed partition whose file set changed is
    # invalidated and rescanned instead of silently serving stale metrics.
    # The probe reads only the partition column (column-pruned scan).
    checkpoint_verify_lineage: bool = True


@dataclass
class ValidationResult:
    run: Run
    results: List[dict]          # validation_results rows (FIXTURES.md §4)
    violations: Optional[DataFrame]
    metrics: Dict[str, Optional[float]]  # check key -> global metric value
    # model -> {job label -> wall seconds}. Jobs overlap (driver-side thread
    # pool), so labels sum to MORE than compute_phase_wall — each label is
    # that job's own start->end wall, the ops-facing "which check family is
    # the expensive one" answer at any scale
    phase_timings: Dict[str, Dict[str, float]] = dc_field(default_factory=dict)


# ---------------------------------------------------------------------------
# metric merge (makes every shared-scan metric decomposable across partitions)
# ---------------------------------------------------------------------------

def _merge_op(alias: str, kind: str) -> str:
    if kind == "freshness" or alias.endswith("__max") or alias.endswith("__max_ts"):
        return "max"
    if kind == "retention" or alias.endswith("__min") or alias.endswith("__min_ts"):
        return "min"
    if alias.endswith("__pctl"):
        # quantile sketches are not driver-mergeable: a single row (flat run)
        # passes through untouched, >=2 partition rows merge to None and the
        # global value comes from the dedicated pruned pass in _run_shared_scan
        return "global"
    return "sum"


def _merge_values(op: str, a: Any, b: Any) -> Any:
    if a is None:
        return b
    if b is None:
        return a
    if op == "sum":
        return a + b
    if op == "max":
        return max(a, b)
    return min(a, b)


def _merge_rows(rows: List[Dict[str, Any]], ops: Dict[str, str]) -> Dict[str, Any]:
    merged: Dict[str, Any] = {}
    for row in rows:
        for alias, op in ops.items():
            if op == "global":
                merged[alias] = row.get(alias)
                continue
            merged[alias] = _merge_values(op, merged.get(alias), row.get(alias))
    if len(rows) > 1:
        # "global" metrics (quantile sketches) are not driver-mergeable: a
        # single row (flat run / one partition) passes through exactly; with
        # >=2 partition rows the merged value is unknowable here and the
        # engine recomputes it in a dedicated column-pruned pass
        for alias, op in ops.items():
            if op == "global":
                merged[alias] = None
    return merged


def _default_fs_is_local() -> bool:
    """True when the active session's Hadoop default filesystem is the local
    disk (fs.defaultFS file:/// — local mode). Unknown/no session -> False,
    so classification conservatively defers to the reader's error message."""
    try:
        spark = SparkSession.getActiveSession()
        if spark is None:
            return False
        fs = spark.sparkContext._jsc.hadoopConfiguration().get(
            "fs.defaultFS", "file:///")
        return (fs or "").startswith("file:")
    except Exception:  # noqa: BLE001 — any introspection failure: not conclusive
        return False


def _missing_table_error(path: str, exc: Exception) -> bool:
    """True when ``exc`` means the table at ``path`` simply does not exist
    yet (the expected first-ever-run bootstrap of a metric-history source),
    as opposed to a corrupt/unreadable table. Local schemeless paths are
    checked directly on disk; remote paths fall back to the reader's
    path-not-found error classes/messages."""
    scheme = path.split("://", 1)[0] if "://" in path else ""
    if scheme == "file":
        local = path.split("://", 1)[-1]
        # file:// is the one scheme where the driver's local disk IS the
        # table's filesystem by declaration, so local existence decides
        # both ways: present -> the failure is real, absent -> bootstrap
        return not os.path.exists(local)
    if scheme == "" and os.path.exists(path) and _default_fs_is_local():
        # schemeless path that EXISTS locally, under a local default FS
        # (local mode, the common case): the table is demonstrably there, so
        # the load failure is real — a corrupt history table must not be
        # classified as a first-run bootstrap. Existence is only ever used to
        # CONFIRM the table; under a REMOTE default FS (spark-submit with
        # HDFS/S3A) a coincidental local directory proves nothing, and local
        # ABSENCE is never conclusive for schemeless paths (the reader's own
        # PATH_NOT_FOUND is the bootstrap signal either way).
        return False
    if isinstance(exc, FileNotFoundError):
        return True
    msg = str(exc)
    return (
        "PATH_NOT_FOUND" in msg
        or "Path does not exist" in msg
        or "FileNotFoundException" in msg
    )


# ---------------------------------------------------------------------------
# job-shape planning predicates — shared by the engine and `test --dry-run`
# (cli._test_dry_run), so the printed plan derives from the SAME logic the
# engine executes and cannot drift from it.
# ---------------------------------------------------------------------------

def plan_approx_unique(unique_checks: List["CompiledCheck"], unique_mode: str
                       ) -> List["CompiledCheck"]:
    """Which unique checks move into the shared scan as HLL sketches under
    ``--unique-mode approx``. Composite-key and row-filtered uniqueness keep
    the exact dedicated job: a composite PK is a certification, and a scoped
    check can't ride the unscoped shared scan's sketch."""
    if unique_mode != "approx":
        return []
    return [c for c in unique_checks
            if not c.params.get("key_cols") and not c.params.get("filter")]


def plan_fused_audio_fp(fp_checks: List["CompiledCheck"], *,
                        default_bytes_col: str,
                        audio_scan_will_run: bool,
                        partition_resume_active: bool
                        ) -> List["CompiledCheck"]:
    """Which audio-fingerprint checks ride the ONE fused decode pass. Only fp
    checks on the default payload column can (the shared scan decodes
    ``BYTES_COL``), only when another audio scan runs anyway, and never when
    the per-partition checkpoint-manifest path is active (near-dup pairs are
    global across partitions and don't fit the per-partition resume model)."""
    fusible = [c for c in fp_checks
               if c.params.get("bytes_col", default_bytes_col) == default_bytes_col]
    if fusible and audio_scan_will_run and not partition_resume_active:
        return fusible
    return []


# ---------------------------------------------------------------------------
# engine
# ---------------------------------------------------------------------------

class Validator:
    def __init__(
        self,
        spark: SparkSession,
        spec: DataContractSpecification,
        tables: Dict[str, DataFrame],
        config: Optional[ValidationConfig] = None,
    ):
        self.spark = spark
        self.spec = spec
        self.tables = tables
        self.config = config or ValidationConfig()
        self.run = Run.create_run(
            data_contract_id=spec.id,
            data_contract_version=spec.info.version if spec.info else None,
        )
        self._violation_frames: List[DataFrame] = []
        self._results_rows: List[dict] = []
        self._metrics: Dict[str, Optional[float]] = {}
        self._phase_timings: Dict[str, Dict[str, float]] = {}

    # -- public ------------------------------------------------------------

    def validate(self) -> ValidationResult:
        checks_by_model = create_checks(self.spec, self.config.server_format)
        # register temp views once so sql-quality checks can reference any model
        for name, df in self.tables.items():
            df.createOrReplaceTempView(name)

        items = list(checks_by_model.items())
        if self.config.parallel_jobs > 1 and len(items) > 1:
            # Models are independent — overlap their Spark jobs instead of
            # paying each model's wall sequentially (the small reference-table
            # model otherwise adds a serial tail after the big fact model).
            # Each model records into an isolated child (same runId), merged
            # back in model order so check ordering is identical to the
            # sequential path.
            import concurrent.futures as cf

            children = [self._child_recorder() for _ in items]
            workers = min(self.config.parallel_jobs, len(items))
            with cf.ThreadPoolExecutor(max_workers=workers) as ex:
                futures = [
                    ex.submit(child._run_model, name, checks, self.tables.get(name))
                    for child, (name, checks) in zip(children, items)
                ]
                for f in futures:
                    f.result()
            for child in children:
                self.run.checks.extend(child.run.checks)
                self.run.logs.extend(child.run.logs)
                self._violation_frames.extend(child._violation_frames)
                self._results_rows.extend(child._results_rows)
                self._metrics.update(child._metrics)
                self._phase_timings.update(child._phase_timings)
        else:
            for model_name, checks in items:
                self._run_model(model_name, checks, self.tables.get(model_name))

        self.run.finish()
        violations = None
        if self._violation_frames:
            violations = self._violation_frames[0]
            for vf in self._violation_frames[1:]:
                violations = violations.unionByName(vf)
        return ValidationResult(
            run=self.run,
            results=self._results_rows,
            violations=violations,
            metrics=self._metrics,
            phase_timings=self._phase_timings,
        )

    def _child_recorder(self) -> "Validator":
        """A clone sharing session/spec/tables/config but with isolated result
        collections and a same-runId Run — lets models record concurrently
        without interleaving check order."""
        child = object.__new__(Validator)
        child.spark = self.spark
        child.spec = self.spec
        child.tables = self.tables
        child.config = self.config
        child.run = self.run.model_copy(update={"checks": [], "logs": []})
        child._violation_frames = []
        child._results_rows = []
        child._metrics = {}
        child._phase_timings = {}
        return child

    # -- per-model orchestration --------------------------------------------

    def _run_model(self, model_name: str, checks: List[CompiledCheck], df: Optional[DataFrame]) -> None:
        if df is None:
            for chk in checks:
                self._record(chk, None, ResultEnum.error, f"table {model_name} not provided", None)
            return

        # dataset filter (SodaCL table-filter analog): the contract's
        # model-level `filter:` and/or the CLI --where scope EVERY check of
        # this model; a Spark filter before anything else, so predicate
        # pushdown / partition pruning reach the source scan. row_count /
        # freshness / drift then describe the SLICE — which is the point.
        scopes = [s for s in (
            getattr(self.spec.models.get(model_name), "filter", None),
            self.config.model_where.get(model_name),
        ) if s]
        for s in scopes:
            df = df.filter(F.expr(s))
        if scopes:
            self.run.log_info(
                f"{model_name}: dataset filter(s) applied: "
                + " AND ".join(f"({s})" for s in scopes))

        if self.config.sample_fraction is not None:
            df = self._sample_frame(model_name, df)

        schema_checks = [c for c in checks if c.kind in ("schema_present", "schema_type")]
        agg_checks = [c for c in checks if c.kind in ("agg", "freshness", "retention") or c.agg_alias == "__row_count"]
        drift_checks = [c for c in checks if c.kind == "drift"]
        unique_checks = [c for c in checks if c.kind == "unique"]
        reference_checks = [c for c in checks if c.kind == "reference"]
        sql_checks = [c for c in checks if c.kind == "sql"]
        audio_checks = [c for c in checks if c.kind == "audio"]
        join_eq_checks = [c for c in checks if c.kind == "join_equality"]
        group_checks = [c for c in checks if c.kind == "group"]
        audio_fp_checks = [c for c in checks if c.kind == "audio_fp"]
        # the whole image family (decode-conformance, signal-quality,
        # content-uniqueness, luminance-drift) shares ONE fused decode pass
        # per payload column
        image_family = [c for c in checks
                        if c.kind in ("image", "image_quality", "image_fp",
                                      "image_drift")]
        video_checks = [c for c in checks if c.kind == "video"]
        audio_drift_checks = [c for c in checks if c.kind == "audio_drift"]
        audio_quality_checks = [c for c in checks if c.kind == "audio_quality"]
        history_checks = [c for c in checks if c.kind == "history"]

        self._run_schema_checks(schema_checks, df)

        # checks on absent columns can't scan — report error, drop from data
        # path; dotted paths resolve through nested structs
        def runnable(chk: CompiledCheck) -> bool:
            if chk.kind == "sql":
                return True
            req = chk.params.get("require_cols") or (
                [chk.field] if chk.field else [])
            for c in req:
                if resolve_schema_field(df.schema, c) is None:
                    self._record(chk, None, ResultEnum.error,
                                 f"column {c} missing", None)
                    return False
            flt = chk.params.get("filter")
            if flt:
                # eager analysis of the scope expression: a typo'd filter
                # column would otherwise raise AnalysisException inside the
                # SHARED scan and abort the whole run — the same isolation
                # the missing-column path above gives a check's own column
                try:
                    df.filter(F.expr(flt)).schema
                except Exception as e:  # noqa: BLE001 — analysis error class varies
                    self._record(chk, None, ResultEnum.error,
                                 f"invalid filter {flt!r}: "
                                 f"{str(e).splitlines()[0][:200]}", None)
                    return False
            return True

        agg_checks = [c for c in agg_checks if runnable(c)]
        drift_checks = [c for c in drift_checks if runnable(c)]
        unique_checks = [c for c in unique_checks if runnable(c)]
        reference_checks = [c for c in reference_checks if runnable(c)]
        group_checks = [c for c in group_checks if runnable(c)]

        # uniqueness joins the shared scan as an HLL sketch in approx mode —
        # the dedicated groupBy job (and its shuffle) disappears entirely
        # (predicate shared with `test --dry-run`: plan_approx_unique)
        approx_unique = plan_approx_unique(unique_checks, self.config.unique_mode)
        unique_checks = [c for c in unique_checks if c not in approx_unique]

        # Content-uniqueness shares the ONE decode pass whenever another audio
        # scan will run anyway (decode-conformance, or loudness-drift with a
        # resolvable snapshot) — a second full decode of the payload corpus is
        # the dominant avoidable cost at scale. Only fp checks on the default
        # payload column can ride the shared scan (it decodes BYTES_COL);
        # a custom bytes_col keeps its standalone pass. The checkpoint-manifest
        # path also keeps the standalone pass: near-dup pairs are global
        # across partitions and don't fit the per-partition resume model.
        part_col_ok = bool(
            self.config.partition_col and self.config.partition_col in df.columns)
        audio_scan_will_run = bool(audio_checks) or bool(audio_quality_checks) or any(
            self.config.ref_stats.get(model_name, {}).get(f"audio:{c.params['feature']}")
            for c in audio_drift_checks)
        # (predicate shared with `test --dry-run`: plan_fused_audio_fp)
        fused_fp_checks = plan_fused_audio_fp(
            audio_fp_checks,
            default_bytes_col=audio_mod.BYTES_COL,
            audio_scan_will_run=audio_scan_will_run,
            partition_resume_active=bool(part_col_ok and self.config.checkpoint_dir),
        )
        audio_fp_checks = [c for c in audio_fp_checks if c not in fused_fp_checks]

        # Compute phase: independent Spark jobs submitted CONCURRENTLY from
        # driver threads (the scheduler overlaps them across free task slots),
        # collapsing ~10 sequential small-job walls into a few waves — the
        # dominant fixed cost at high core counts. Only the shared scan
        # records during this phase; every other job returns a result dict
        # that the main thread records afterwards in a fixed order, so check
        # ordering stays deterministic.
        audio_label = ("shared_scan+fused_decode"
                       if (audio_scan_will_run or fused_fp_checks)
                       else "shared_scan")
        thunks: List[Any] = [
            self._timed(model_name, audio_label, lambda: self._run_shared_scan(
                model_name, df, agg_checks, drift_checks, audio_checks, approx_unique,
                audio_fp_checks=fused_fp_checks, audio_drift_checks=audio_drift_checks,
                audio_quality_checks=audio_quality_checks))
        ]
        thunks += [
            self._timed(model_name, f"unique:{chk.key}",
                        (lambda c=chk: ("unique", c, self._unique_compute(df, c))))
            for chk in unique_checks
        ]
        thunks += [
            self._timed(model_name, f"reference:{chk.key}",
                        (lambda c=chk: ("reference", c, self._reference_compute(df, c))))
            for chk in reference_checks
        ]
        thunks += [
            self._timed(model_name, f"join_eq:{chk.key}",
                        (lambda c=chk: ("join_eq", c, self._join_equality_compute(df, c))))
            for chk in join_eq_checks
        ]
        thunks += [
            self._timed(model_name, f"group:{chk.key}",
                        (lambda c=chk: ("group", c, self._group_compute(df, c))))
            for chk in group_checks
        ]
        thunks += [
            self._timed(model_name, f"audio_fp:{chk.key}",
                        (lambda c=chk: ("audio_fp", c, self._audio_fp_compute(model_name, df, c))))
            for chk in audio_fp_checks
        ]
        image_groups: Dict[str, List[CompiledCheck]] = {}
        for chk in image_family:
            image_groups.setdefault(chk.params["bytes_col"], []).append(chk)
        thunks += [
            self._timed(model_name, f"image_decode:{bc}",
                        (lambda g=grp, bc=bc: (
                            "image_family", g,
                            self._image_family_compute(model_name, df, g, bc))))
            for bc, grp in sorted(image_groups.items())
        ]
        thunks += [
            self._timed(model_name, f"video:{chk.key}",
                        (lambda c=chk: ("video", c, self._video_compute(model_name, df, c))))
            for chk in video_checks
        ]
        thunks += [
            self._timed(model_name, f"sql:{chk.key}",
                        (lambda c=chk: ("sql", c, self._sql_compute(c))))
            for chk in sql_checks
        ]
        import time as _time
        t_phase = _time.perf_counter()
        results = self._parallel(thunks)
        ph = self._phase_timings.setdefault(model_name, {})
        ph["compute_phase_wall"] = round(_time.perf_counter() - t_phase, 3)
        self.run.log_info(
            f"{model_name} phase walls (s, concurrent jobs overlap): "
            + ", ".join(f"{k}={v}" for k, v in
                        sorted(ph.items(), key=lambda kv: -kv[1])))
        for item in results[1:]:
            kind, chk, res = item
            if kind == "unique":
                self._record_unique(chk, res)
            elif kind == "reference":
                self._record_reference(chk, res)
            elif kind == "join_eq":
                self._record_join_equality(chk, res)
            elif kind == "group":
                self._record_group(chk, res)
            elif kind == "audio_fp":
                self._record_audio_fp(chk, res)
            elif kind == "video":
                self._record_video(chk, res)
            elif kind == "image_family":
                # chk is the group list, res maps check key -> result dict;
                # record in compile order so check ordering stays stable
                for c in chk:
                    r = res[c.key]
                    if c.kind == "image":
                        self._record_image(c, r)
                    elif c.kind == "image_quality":
                        self._record_image_quality(c, r)
                    elif c.kind == "image_drift":
                        self._record_image_drift(c, r)
                    else:
                        self._record_image_fp(c, r)
            else:
                self._record_sql(chk, res)

        # History checks judge the CURRENT run's metrics against the trailing
        # window in the results table, so they must run after every other
        # check of this model has recorded (their watched metrics are filled
        # by the loop above). They append at the end of the model's check
        # order; watched keys must be produced by this model's own checks
        # (cross-model watches would race the parallel per-model recorders).
        if history_checks and self.config.sample_fraction is not None:
            # a sampled run's metrics are raw sample counts — judging them
            # against a full-run series (or letting them join it) would make
            # every change/anomaly rule fire on the sampling itself
            for chk in history_checks:
                self._record(chk, None, ResultEnum.passed,
                             "skipped: sampled run (history judges and "
                             "feeds full-run metrics only)", None)
        elif history_checks:
            self._run_history_checks(model_name, history_checks)

    def _run_history_checks(
        self, model_name: str, checks: List[CompiledCheck]
    ) -> None:
        """Evaluate ``type: history`` checks: one distributed window-pruned
        read of the results table for ALL watched keys of this model, then a
        driver-side judgment per check on <= window floats. An absent history
        table (first-ever run) is an empty series, which the compiled
        evaluator reports as an insufficient-history pass, not an error."""
        from . import history as hist_mod

        path = self.config.history_path
        series: Dict[str, List[float]] = {}
        load_err: Optional[str] = None
        if path:
            keys = sorted({c.params["watch_key"] for c in checks})
            max_w = max(int(c.params["window"]) for c in checks)
            try:
                frame = hist_mod.load_history(
                    self.spark, path, self.config.history_format)
                series = hist_mod.collect_series(
                    frame, model_name, keys, max_w, exclude_run_id=self.run.runId)
            except Exception as exc:
                # A MISSING table is the expected first-ever-run bootstrap
                # (this run's results write creates it) -> empty series,
                # insufficient-history pass. Anything else (corrupt files,
                # wrong --history-format, permission) must surface as an
                # ERROR: degrading it to the same silent pass would disarm
                # every change/anomaly tripwire on a config typo.
                if _missing_table_error(path, exc):
                    load_err = None
                else:
                    load_err = f"{type(exc).__name__}: {exc}"
        for chk in checks:
            wkey = chk.params["watch_key"]
            if not path:
                self._record(
                    chk, None, ResultEnum.error,
                    f"{chk.name}: no history source (set ValidationConfig."
                    "history_path / --history-path to this engine's results table)",
                    None)
                continue
            if load_err:
                self._record(
                    chk, None, ResultEnum.error,
                    f"{chk.name}: history table at {path} failed to load "
                    f"({load_err})", None)
                continue
            current = self._metrics.get(wkey)
            if current is None:
                self._record(
                    chk, None, ResultEnum.error,
                    f"{chk.name}: watched metric {wkey} was not computed in "
                    "this run (check the watch key)", None)
                continue
            vals = series.get(wkey, [])[-int(chk.params["window"]):]
            stat, diag = hist_mod.point_stats(
                vals, current, agg=chk.params["agg"], method=chk.params["method"])
            result, reason = chk.eval_metric(stat, diag)
            self._record(chk, stat, result, reason, None, diagnostics=diag)

    def _timed(self, model: str, label: str, fn):
        """Wrap a compute-phase thunk to record its own wall seconds under
        phase_timings[model][label] (threads overlap; dict writes are
        GIL-atomic and labels are unique per model)."""
        import time as _time

        def run():
            t0 = _time.perf_counter()
            try:
                return fn()
            finally:
                self._phase_timings.setdefault(model, {})[label] = round(
                    _time.perf_counter() - t0, 3)
        return run

    def _parallel(self, thunks: List[Any]) -> List[Any]:
        """Run thunks via a driver-side thread pool (Spark job submission is
        thread-safe); sequential when disabled or singleton."""
        if self.config.parallel_jobs <= 1 or len(thunks) <= 1:
            return [t() for t in thunks]
        import concurrent.futures as cf

        with cf.ThreadPoolExecutor(
            max_workers=min(self.config.parallel_jobs, len(thunks))
        ) as ex:
            futures = [ex.submit(t) for t in thunks]
            return [f.result() for f in futures]

    # -- schema checks (driver-side, no scan) --------------------------------

    def _run_schema_checks(self, checks: List[CompiledCheck], df: DataFrame) -> None:
        for chk in checks:
            resolved = resolve_schema_field(df.schema, chk.field)
            if chk.kind == "schema_present":
                ok = resolved is not None
                self._record(
                    chk, 0.0 if ok else 1.0,
                    ResultEnum.passed if ok else ResultEnum.failed,
                    None if ok else f"column {chk.field} missing in schema", None,
                )
            else:  # schema_type
                if resolved is None:
                    self._record(chk, None, ResultEnum.error, f"column {chk.field} missing", None)
                    continue
                actual = resolved.dataType
                expected = chk.params["expected_spark_type"]
                ok = actual == expected
                self._record(
                    chk, 0.0 if ok else 1.0,
                    ResultEnum.passed if ok else ResultEnum.failed,
                    None if ok else f"type is {actual.simpleString()}, expected {expected.simpleString()}",
                    None,
                )

    # -- shared multi-aggregate scan (+ audio; + checkpoint/resume) ----------

    def _shared_agg_specs(
        self, model_name: str, agg_checks: List[CompiledCheck], drift_checks: List[CompiledCheck]
    ) -> Tuple[Dict[str, Column], Dict[str, str], List[dict]]:
        """Shared-scan aggregate columns + merge ops + drift bucket-job specs.

        Drift grids are NOT inlined as per-grid-point aggregate columns: a
        199-point grid would push the aggregate past the whole-stage-codegen
        field limit and onto the erratic interpreted path. They run as one
        narrow bucket-groupBy job (drift_mod.drift_bucket_rows) whose output
        aliases are folded into the same per-partition metric rows.
        """
        exprs: Dict[str, Column] = {"__total_count": F.count(F.lit(1))}
        ops: Dict[str, str] = {"__total_count": "sum"}
        for chk in agg_checks:
            if chk.agg_alias and chk.agg_expr is not None and chk.agg_alias not in exprs:
                exprs[chk.agg_alias] = chk.agg_expr()
                ops[chk.agg_alias] = _merge_op(chk.agg_alias, chk.kind)
            for alias, expr_thunk in chk.extra_aggs.items():
                if alias not in exprs:
                    exprs[alias] = expr_thunk()
                    ops[alias] = _merge_op(alias, chk.kind)
        drift_jobs: List[dict] = []
        for chk in drift_checks:
            stats = self.config.ref_stats.get(model_name, {}).get(chk.params["column"])
            if stats is None:
                continue
            if "categories" in stats and chk.params["method"] != "psi":
                # KS needs an ordered domain; categorical snapshots are
                # frequency-only — surface a config error instead of a
                # meaningless statistic
                chk.params["_invalid"] = (
                    "categorical snapshot supports method psi only")
                continue
            prefix = f"__drift__{chk.key}"
            chk.params["_prefix"] = prefix
            chk.params["_stats"] = stats
            drift_jobs.append({
                "prefix": prefix, "column": chk.params["column"],
                "stats": stats, "method": chk.params["method"],
            })
            for alias in drift_mod.drift_aliases(prefix, stats, chk.params["method"]):
                ops[alias] = "sum"
        return exprs, ops, drift_jobs

    @staticmethod
    def _merge_drift_rows(
        part_rows: List[Dict[str, Any]],
        drift_rows: Dict[Optional[str], Dict[str, int]],
        drift_jobs: List[dict],
        partition_col: Optional[str],
    ) -> None:
        zero: Dict[str, int] = {}
        for job in drift_jobs:
            for alias in drift_mod.drift_aliases(job["prefix"], job["stats"], job["method"]):
                zero[alias] = 0
        if partition_col:
            for prow in part_rows:
                prow.update(drift_rows.get(str(prow.get(partition_col)), zero))
        elif part_rows:
            part_rows[0].update(drift_rows.get(None, zero))

    def _audio_compact(
        self, df: DataFrame, chk: Optional[CompiledCheck], partition_col: Optional[str],
        fp_fn=None, feat_bins=None, feat_limits=None, text_col=None,
    ) -> DataFrame:
        # partition col is threaded through the Arrow batch as __part (no
        # re-join); chk=None (feature-histograms-only scan) skips the SNR
        # oracle — header conformance counts still accumulate but go unread
        return audio_mod.audio_decode_compact(
            df,
            snr_floor_db=chk.params.get("snr_db", 30.0) if chk is not None else 30.0,
            oracle=self.config.audio_oracle if chk is not None else None,
            snr_fn=self.config.audio_snr_fn if chk is not None else None,
            partition_col=partition_col if (partition_col and partition_col in df.columns) else None,
            violation_cap=self.config.violation_cap if (chk is not None or feat_limits) else 0,
            fp_fn=fp_fn,
            feat_bins=feat_bins,
            feat_limits=feat_limits,
            text_col=text_col,
        )

    def _audio_compact_collect(
        self, compact: DataFrame, partition_col: Optional[str],
        own_cache: bool = True,
    ) -> Tuple[List[Dict[str, Any]], List[Tuple[Optional[str], str, str]]]:
        """(per-partition count rows, capped violation tuples) from ONE decode.

        The compact frame is tiny by construction (bounded by tasks x
        (parts_per_task + cap)); persisting it means the first action runs the
        single decode scan and the second reads the cache — never a second
        decode (VERDICT.md defect #1). MEMORY_AND_DISK so cache pressure spills
        instead of recomputing. ``own_cache=False`` when the caller already
        persisted the frame and has more consumers (fused fingerprint path) —
        unpersisting here would silently evict the caller's cache and re-run
        the decode.
        """
        from pyspark import StorageLevel

        if own_cache:
            compact = compact.persist(StorageLevel.MEMORY_AND_DISK)
        try:
            sums = [F.sum(c).alias(f"__audio__{c}") for c in audio_mod.COMPACT_COUNT_COLS]
            aggd = compact.filter(F.col("row_type") == "agg")
            if partition_col:
                rows = [r.asDict() for r in aggd.groupBy("__part").agg(*sums).collect()]
            else:
                rows = [aggd.agg(*sums).first().asDict()]
                rows[0]["__part"] = None
            total_vio = sum(r.get("__audio__violations") or 0 for r in rows)
            vio: List[Tuple[Optional[str], str, str]] = []
            if total_vio:
                vio = [
                    (r["__part"], r["clip_id"], r["observed"])
                    for r in (
                        compact.filter(F.col("row_type") == "vio")
                        .orderBy("clip_id")
                        .limit(self.config.violation_cap)
                        .select("__part", "clip_id", "observed")
                        .collect()
                    )
                ]
            return rows, vio
        finally:
            if own_cache:
                compact.unpersist()

    @staticmethod
    def _fq_count_frame(compact: DataFrame) -> DataFrame:
        """Per-(partition, rule) out-of-range counts from 'fq' compact rows."""
        return (compact.filter(F.col("row_type") == "fq")
                .groupBy("__part", "t").agg(F.sum("hash").alias("c")))

    def _fv_capped_frame(self, compact: DataFrame, per_partition: bool) -> DataFrame:
        """Capped 'fv' violation samples, deterministic by clip_id; the cap
        applies per rule (globally) or per (partition, rule) for the
        checkpoint manifest. Shared by the flat and checkpointed paths so the
        compact 'fq'/'fv' row shape has one decoder."""
        keys = ["__part", "t"] if per_partition else ["t"]
        w = Window.partitionBy(*keys).orderBy("clip_id")
        return (compact.filter(F.col("row_type") == "fv")
                .withColumn("__rn", F.row_number().over(w))
                .filter(F.col("__rn") <= self.config.violation_cap)
                .select("__part", "t", "clip_id", "observed"))

    def _audio_quality_collect(
        self, compact: DataFrame,
    ) -> Tuple[List[Dict[str, Any]], List[Dict[str, Any]]]:
        """(per-partition out-of-range count rows, capped violation rows) from
        the compact frame's 'fq'/'fv' rows — signal-quality bounds evaluated in
        the same single decode pass as everything else. ``t`` is the rule index
        (position in the audio_quality_checks list), so several bounds on the
        same or different features stay separable. Violations are re-capped
        per rule (per-task caps can sum past violation_cap)."""
        fq_rows = [
            {"__part": r["__part"], "t": r["t"], "c": int(r["c"])}
            for r in self._fq_count_frame(compact).collect()
        ]
        fv_rows: List[Dict[str, Any]] = []
        if any(r["c"] > 0 for r in fq_rows):
            fv_rows = [
                r.asDict()
                for r in self._fv_capped_frame(compact, per_partition=False)
                .collect()
            ]
        return fq_rows, fv_rows

    def _audio_hist_collect(self, compact: DataFrame) -> Dict[str, Dict[int, int]]:
        """{feature: {bin: count}} from the compact frame's 'fh' rows — a
        groupBy over a frame bounded by tasks x features x bins, never the
        corpus. Loudness drift is evaluated globally (like the column drift
        checks), so __part sums away here."""
        rows = (
            compact.filter(F.col("row_type") == "fh")
            .groupBy("clip_id", "t").agg(F.sum("hash").alias("c"))
            .collect()
        )
        out: Dict[str, Dict[int, int]] = {}
        for r in rows:
            out.setdefault(r["clip_id"], {})[r["t"]] = r["c"]
        return out

    _AUDIO_OPS = {f"__audio__{c}": "sum" for c in audio_mod.COMPACT_COUNT_COLS}

    @staticmethod
    def _reroute_bytes_aliases(
        agg_checks: List[CompiledCheck],
        exprs: Dict[str, Column],
        ops: Dict[str, str],
    ) -> List[str]:
        """Move the payload column's missing-count out of the JVM metric agg.

        The audio decode pass streams the bytes through Arrow anyway and counts
        nulls there (``bytes_null``). Evaluating the required-check in the JVM
        aggregate instead would materialize the whole binary column on-heap a
        second time — at ~60 KB per cell the vectorized reader's columnar
        batches become humongous G1 allocations and the scan stops scaling past
        a few cores. Only called when an audio check is present on the model.
        """
        rerouted: List[str] = []
        for chk in agg_checks:
            if (
                chk.check_type == "field_required"
                and chk.field == audio_mod.BYTES_COL
                and chk.agg_alias in exprs
                and not chk.extra_aggs
                # a SCOPED required-check must keep its filtered aggregate:
                # the audio pass counts nulls over ALL rows, so substituting
                # it would silently discard the check's filter
                and not chk.params.get("filter")
            ):
                del exprs[chk.agg_alias]
                ops.pop(chk.agg_alias, None)
                rerouted.append(chk.agg_alias)
        return rerouted

    @staticmethod
    def _hll_aliases(chk: CompiledCheck) -> Tuple[str, str]:
        return f"{chk.field}__nonnull_count", f"{chk.field}__hll_sketch"

    def _run_shared_scan(
        self,
        model_name: str,
        df: DataFrame,
        agg_checks: List[CompiledCheck],
        drift_checks: List[CompiledCheck],
        audio_checks: List[CompiledCheck],
        approx_unique: Optional[List[CompiledCheck]] = None,
        audio_fp_checks: Optional[List[CompiledCheck]] = None,
        audio_drift_checks: Optional[List[CompiledCheck]] = None,
        audio_quality_checks: Optional[List[CompiledCheck]] = None,
    ) -> None:
        exprs, ops, drift_jobs = self._shared_agg_specs(model_name, agg_checks, drift_checks)
        for chk in approx_unique or []:
            nn_alias, sk_alias = self._hll_aliases(chk)
            col = chk.field
            exprs[nn_alias] = F.coalesce(
                F.sum(F.when(F.col(col).isNotNull(), 1).otherwise(0)), F.lit(0))
            ops[nn_alias] = "sum"
            # the sketch merges by HLL union, not sum/min/max — evaluated by
            # _record_approx_unique after the scan, never by _merge_rows
            exprs[sk_alias] = F.hll_sketch_agg(F.col(col), F.lit(self.config.unique_hll_lgk))
        partition_col = self.config.partition_col if (
            self.config.partition_col and self.config.partition_col in df.columns
        ) else None

        audio_chk = audio_checks[0] if audio_checks else None
        audio_ops: Dict[str, str] = dict(self._AUDIO_OPS) if audio_chk is not None else {}
        rerouted_aliases: List[str] = []
        if audio_chk is not None:
            rerouted_aliases = self._reroute_bytes_aliases(agg_checks, exprs, ops)

        # loudness-drift: per-clip decoded-feature histograms ride the SAME
        # decode pass (row_type='fh' rows in the compact frame); a check
        # without a reference snapshot errors here and never costs a scan
        feat_bins: Dict[str, List[float]] = {}
        audio_drift_eval: List[Tuple[CompiledCheck, dict]] = []
        for chk in audio_drift_checks or []:
            feature = chk.params["feature"]
            stats = self.config.ref_stats.get(model_name, {}).get(f"audio:{feature}")
            if not stats:
                self._record(
                    chk, None, ResultEnum.error,
                    f"no reference snapshot for audio feature {feature} "
                    "(build with audio.audio_feature_frame + drift.build_ref_stats, "
                    "stored under ref_stats key 'audio:" + feature + "')", None)
                continue
            feat_bins[feature] = [float(x) for x in stats["bin_edges"]]
            audio_drift_eval.append((chk, stats))

        # signal-quality: per-clip decoded-feature bounds, also evaluated
        # inside the one decode pass ('fq' count + capped 'fv' violation rows)
        feat_limits: List[Tuple[str, Optional[float], Optional[float]]] = [
            (c.params["feature"], c.params["minimum"], c.params["maximum"])
            for c in audio_quality_checks or []
        ]
        # speaking-rate rules carry the transcript column the decode scan
        # must add as a JVM length; one text column per model
        rate_cols = {c.params["text_column"]
                     for c in audio_quality_checks or []
                     if c.params.get("text_column")}
        if len(rate_cols) > 1:
            raise ValueError(
                f"speaking-rate rules on one model must share a text "
                f"column, got {sorted(rate_cols)}")
        rate_text_col = next(iter(rate_cols), None)

        part_rows: List[Dict[str, Any]] = []
        audio_part_rows: List[Dict[str, Any]] = []
        audio_vio: List[Tuple[Optional[str], str, str]] = []
        fused_fp_results: List[Tuple[CompiledCheck, dict]] = []
        # quantile-sketch aliases (merge op "global"): per-partition values are
        # exact per partition, but the global value cannot be merged on the
        # driver — recompute it in ONE dedicated pass pruned to just the
        # percentile columns (overlapped with the main scan when parallel)
        pctl_aliases = [a for a, op in ops.items() if op == "global"]
        pctl_row: Optional[Dict[str, Any]] = None

        def pctl_job() -> Dict[str, Any]:
            return df.agg(
                *[exprs[a].alias(a) for a in pctl_aliases]
            ).first().asDict()

        # sketch mode: swap the GK aggregates for mergeable t-digests — the
        # aliases leave the shared agg entirely and their values are injected
        # into the metric rows from driver-merged digests after the scan
        pctl_specs: Dict[str, Tuple[str, float]] = {}
        pctl_digests: Dict[Tuple[str, str], td_mod.TDigest] = {}
        if pctl_aliases and self.config.pctl_mode == "sketch":
            for chk in agg_checks:
                if chk.agg_alias in pctl_aliases and chk.agg_alias not in pctl_specs:
                    # a row-scoped (filter:) percentile keeps the GK path:
                    # the t-digest pass reads the RAW column and would
                    # silently ignore the scope
                    if chk.params.get("filter"):
                        continue
                    pctl_specs[chk.agg_alias] = (
                        chk.params["column"],
                        float(chk.params["metric"][1:]) / 100.0)
            for alias in list(pctl_specs):
                exprs.pop(alias, None)
                ops.pop(alias, None)
            pctl_aliases = [a for a in pctl_aliases if a not in pctl_specs]
        pctl_cols = sorted({c for c, _ in pctl_specs.values()})

        audio_fhists: Dict[str, Dict[int, int]] = {}
        audio_fq_rows: List[Dict[str, Any]] = []
        audio_fv_rows: List[Dict[str, Any]] = []

        if partition_col and self.config.checkpoint_dir:
            (part_rows, audio_part_rows, audio_vio, audio_fhists,
             audio_fq_rows, audio_fv_rows, pctl_digests) = self._checkpointed_scan(
                model_name, df, exprs, ops, audio_chk, partition_col,
                drift_jobs, feat_bins=feat_bins or None,
                feat_limits=feat_limits or None,
                pctl_cols=pctl_cols or None,
                rate_text_col=rate_text_col,
            )
            if pctl_aliases and len(part_rows) > 1:
                pctl_row = pctl_job()
        else:
            agg_list = [v.alias(k) for k, v in exprs.items()]

            def main_job() -> List[Dict[str, Any]]:
                if partition_col:
                    return [r.asDict() for r in df.groupBy(partition_col).agg(*agg_list).collect()]
                return [df.agg(*agg_list).first().asDict()]

            def drift_job():
                return drift_mod.drift_bucket_rows(df, drift_jobs, partition_col)

            def audio_job() -> Tuple[Any, Any, Any, Any, Any, Any]:
                if not audio_fp_checks and not feat_bins and not feat_limits:
                    compact = self._audio_compact(df, audio_chk, partition_col)
                    rows, vio = self._audio_compact_collect(compact, partition_col)
                    return rows, vio, [], {}, [], []
                # fused: fingerprints and/or feature histograms ride along in
                # the same decode pass; the compact frame (counts + capped
                # vios + fp/fh rows, far smaller than the payload) is
                # persisted once and feeds every consumer
                from pyspark import StorageLevel

                from . import audiofp as afp

                compact = self._audio_compact(
                    df, audio_chk, partition_col,
                    fp_fn=afp.fingerprint_hashes if audio_fp_checks else None,
                    feat_bins=feat_bins or None,
                    feat_limits=feat_limits or None,
                    text_col=rate_text_col,
                ).persist(StorageLevel.MEMORY_AND_DISK)
                try:
                    rows, vio = (
                        self._audio_compact_collect(compact, partition_col, own_cache=False)
                        if audio_chk is not None else ([], []))
                    fp_results = []
                    if audio_fp_checks:
                        from .pipeline_ckpt import release_caches

                        fp = compact.filter(F.col("row_type") == "fp").select("clip_id", "hash")
                        for chk in audio_fp_checks:
                            nd = afp.audio_fingerprint_near_dup(
                                fp, threshold=float(chk.params["score_threshold"]))
                            try:
                                fp_results.append(
                                    (chk, self._audio_fp_result(nd, chk)))
                            finally:
                                # the operator persists its internal hash
                                # frame; release per check or repeated runs
                                # on one session leak cached blocks
                                release_caches(nd)
                    fhists = self._audio_hist_collect(compact) if feat_bins else {}
                    fq_rows, fv_rows = (
                        self._audio_quality_collect(compact)
                        if feat_limits else ([], []))
                finally:
                    compact.unpersist()
                # recorded after the merge section (fixed order, main thread)
                return rows, vio, fp_results, fhists, fq_rows, fv_rows

            # the scan's three independent jobs (metric agg / drift buckets /
            # audio decode) overlap on the cluster — decode dominates, the
            # small aggs ride along on spare slots
            thunks: List[Any] = [main_job]
            if drift_jobs:
                thunks.append(drift_job)
            run_audio = (
                audio_chk is not None or bool(feat_bins)
                or bool(audio_fp_checks) or bool(feat_limits))
            if run_audio:
                thunks.append(audio_job)
            run_pctl = bool(pctl_aliases) and partition_col is not None
            if run_pctl:
                thunks.append(pctl_job)

            def sketch_job() -> Dict[Tuple[str, str], td_mod.TDigest]:
                return td_mod.collect_digests(
                    df, pctl_cols, partition_col, self.config.pctl_tdigest_delta)

            if pctl_specs:
                thunks.append(sketch_job)
            with self._arrow_batch_conf():
                outs = self._parallel(thunks)
            part_rows = outs[0]
            idx = 1
            if drift_jobs:
                self._merge_drift_rows(part_rows, outs[idx], drift_jobs, partition_col)
                idx += 1
            if run_audio:
                (audio_part_rows, audio_vio, fused_fp_results, audio_fhists,
                 audio_fq_rows, audio_fv_rows) = outs[idx]
                idx += 1
            if run_pctl:
                pctl_row = outs[idx]
                idx += 1
            if pctl_specs:
                pctl_digests = outs[idx]

        global_row = _merge_rows(part_rows, ops)
        if pctl_row is not None:
            for alias in pctl_aliases:
                global_row[alias] = pctl_row.get(alias)
        if pctl_specs:
            # driver-side digest merge (sorted key order -> deterministic,
            # resume-identical); values injected into the metric rows so
            # recording is byte-for-byte the exact-mode code path
            for alias, (col, frac) in pctl_specs.items():
                col_keys = sorted(k for k in pctl_digests if k[1] == col)
                merged = td_mod.TDigest.merge(
                    [pctl_digests[k] for k in col_keys],
                    self.config.pctl_tdigest_delta)
                global_row[alias] = (
                    merged.quantile(frac) if merged.total_weight else None)
                if partition_col:
                    for prow in part_rows:
                        d = pctl_digests.get((str(prow.get(partition_col)), col))
                        prow[alias] = (
                            d.quantile(frac)
                            if d is not None and d.total_weight else None)
        global_row["__total_count"] = global_row.get("__total_count") or 0
        audio_global = _merge_rows(audio_part_rows, audio_ops) if audio_part_rows else {}
        if audio_chk is not None:
            # empty input (or an empty partition) -> zero counts, exactly as the
            # JVM aggregate's coalesce(sum(..), 0) would report
            for alias in audio_ops:
                if audio_global.get(alias) is None:
                    audio_global[alias] = 0

        if rerouted_aliases:
            # fold the audio pass's bytes-null count back into the metric rows
            # so the required-check evaluates exactly as if it had run JVM-side
            bytes_null = audio_global.get("__audio__bytes_null") or 0
            by_part = {str(r.get("__part")): r for r in audio_part_rows}
            for alias in rerouted_aliases:
                global_row[alias] = bytes_null
                if partition_col:
                    for prow in part_rows:
                        arow = by_part.get(str(prow.get(partition_col)))
                        prow[alias] = 0 if arow is None else (arow.get("__audio__bytes_null") or 0)

        # evaluate + record each agg check (global + per-partition rows)
        failed_agg: List[CompiledCheck] = []
        for chk in agg_checks:
            metric = self._agg_metric(chk, global_row)
            result, reason = chk.eval_metric(metric, global_row)
            self._record(chk, metric, result, reason, global_row.get("__total_count"))
            if partition_col:
                for prow in part_rows:
                    pm = self._agg_metric(chk, prow)
                    pres, preason = chk.eval_metric(pm, prow)
                    self._record(
                        chk, pm, pres, preason, prow.get("__total_count"),
                        partition_id=str(prow.get(partition_col)),
                    )
            if result == ResultEnum.failed and chk.violation_predicate is not None:
                failed_agg.append(chk)

        for chk in approx_unique or []:
            self._record_approx_unique(chk, part_rows, global_row, partition_col)

        for chk in drift_checks:
            if "_invalid" in chk.params:
                self._record(chk, None, ResultEnum.error,
                             f"{chk.name}: {chk.params['_invalid']}", None)
                continue
            if "_stats" not in chk.params:
                self._record(chk, None, ResultEnum.error,
                             f"no reference snapshot for column {chk.params['column']}", None)
                continue
            stat = drift_mod.drift_statistic(
                global_row, chk.params["_stats"], chk.params["method"], chk.params["_prefix"]
            )
            result, reason = chk.eval_metric(stat, global_row)
            self._record(chk, stat, result, reason, global_row.get("__total_count"))

        if audio_chk is not None:
            metric = float(audio_global.get("__audio__violations") or 0)
            diag = {k.replace("__audio__", ""): v for k, v in audio_global.items()}
            result = ResultEnum.passed if metric == 0 else ResultEnum.failed
            reason = None if metric == 0 else (
                f"{int(metric)} rows violate decode conformance "
                f"(decode_error={diag.get('decode_error')}, sr={diag.get('sr_bad')}, "
                f"dur={diag.get('dur_bad')}, codec={diag.get('codec_bad')}, snr={diag.get('snr_bad')})"
            )
            self._record(audio_chk, metric, result, reason,
                         audio_global.get("__audio__rows"), diagnostics=diag)
            if partition_col:
                for prow in audio_part_rows:
                    pm = float(prow.get("__audio__violations") or 0)
                    self._record(
                        audio_chk, pm,
                        ResultEnum.passed if pm == 0 else ResultEnum.failed,
                        None if pm == 0 else f"{int(pm)} decode-conformance violations",
                        prow.get("__audio__rows"), partition_id=str(prow.get("__part")),
                    )
            if audio_vio:
                # capped violation rows came out of the SAME decode pass as the
                # metrics (compact frame) — never a second scan of the payload
                vio_rows = [
                    (self.run.runId, part, audio_chk.key, clip_id, observed, audio_chk.expected)
                    for part, clip_id, observed in audio_vio[: self.config.violation_cap]
                ]
                self._violation_frames.append(
                    self.spark.createDataFrame(vio_rows, schema=VIOLATIONS_DDL))

        for chk, res in fused_fp_results:
            self._record_audio_fp(chk, res)

        for chk, stats in audio_drift_eval:
            got = audio_fhists.get(chk.params["feature"], {})
            counts = [got.get(k, 0) for k in range(len(stats["bin_edges"]) + 1)]
            stat = drift_mod.drift_statistic_from_counts(
                counts, stats, chk.params["method"])
            result, reason = chk.eval_metric(stat, {})
            self._record(chk, stat, result, reason, sum(counts))

        if audio_quality_checks:
            # out-of-range clip counts from the same decode pass ('fq' rows);
            # per-rule index rides in 't'. Absent rows mean zero violations.
            fq_global: Dict[int, int] = {}
            fq_by_part: Dict[Tuple[int, str], int] = {}
            for r in audio_fq_rows:
                li = int(r["t"])
                fq_global[li] = fq_global.get(li, 0) + int(r["c"])
                fq_by_part[(li, str(r["__part"]))] = (
                    fq_by_part.get((li, str(r["__part"])), 0) + int(r["c"]))
            total = (audio_global.get("__audio__rows")
                     if audio_chk is not None else global_row.get("__total_count"))
            for li, chk in enumerate(audio_quality_checks):
                metric = float(fq_global.get(li, 0))
                result, reason = chk.eval_metric(metric, {})
                self._record(chk, metric, result, reason, total)
                if partition_col:
                    for prow in part_rows:
                        pid = str(prow.get(partition_col))
                        pm = float(fq_by_part.get((li, pid), 0))
                        pres, preason = chk.eval_metric(pm, {})
                        self._record(chk, pm, pres, preason,
                                     prow.get("__total_count"), partition_id=pid)
                vio_rows = [
                    (self.run.runId, r["__part"], chk.key, r["clip_id"],
                     r["observed"], chk.expected)
                    for r in audio_fv_rows if int(r["t"]) == li
                ][: self.config.violation_cap]
                if vio_rows:
                    self._violation_frames.append(
                        self.spark.createDataFrame(vio_rows, schema=VIOLATIONS_DDL))

        if failed_agg:
            self._collect_agg_violations(model_name, df, failed_agg, partition_col)

    def _arrow_batch_conf(self):
        return _ConfScope(
            self.spark,
            {"spark.sql.execution.arrow.maxRecordsPerBatch": str(self.config.arrow_batch_rows)},
        )

    def _agg_metric(self, chk: CompiledCheck, row: Dict[str, Any]) -> Optional[float]:
        finisher = chk.params.get("finisher")
        if finisher is not None:
            # metric checks: partials (sum/count/sumsq/min/max) were merged
            # losslessly across partitions; finish them into the final value
            return finisher(row)
        value = row.get(chk.agg_alias) if chk.agg_alias else None
        if chk.kind in ("freshness", "retention"):
            if value is None:
                return None
            now = self.config.now or dt.datetime.now(dt.timezone.utc)
            ts = value
            if isinstance(ts, dt.date) and not isinstance(ts, dt.datetime):
                ts = dt.datetime(ts.year, ts.month, ts.day)
            if ts.tzinfo is None:
                ts = ts.replace(tzinfo=dt.timezone.utc)
            return (now - ts).total_seconds()
        if value is None:
            return None
        return float(value)

    # -- violations (single scan over all failed predicates) -----------------

    def _pk_column(self, model_name: str, df: DataFrame) -> str:
        from .spec import model_pk

        return model_pk(self.spec, model_name, df)

    def _sample_frame(self, model_name: str, df: DataFrame) -> DataFrame:
        """Deterministic keyed-hash sample for pre-flight validation (see
        ValidationConfig.sample_fraction). xxhash64(pk, seed) is uniform over
        the signed 64-bit range, so `hash < frac * 2^64 - 2^63` keeps an
        unbiased ~frac of rows — pure JVM, pushdown-friendly, stable under
        repartition/retries, and the SAME rows every run at a given seed
        (a violation found once reproduces; change the seed to draw a
        different panel)."""
        frac = float(self.config.sample_fraction)
        if not (0.0 < frac < 1.0):
            raise ValueError("sample_fraction must be in (0, 1) — run without "
                             "it for the certifying full scan")
        pk = self._pk_column(model_name, df)
        thr = min(int(frac * 2.0 ** 64) - 2 ** 63, 2 ** 63 - 1)
        self.run.log_warn(
            f"{model_name}: SAMPLED validation at fraction {frac:g} "
            f"(seed {self.config.sample_seed}) — metrics are raw sample "
            "counts; a pass bounds, not certifies, the violation rate")
        return df.filter(
            F.xxhash64(F.col(pk).cast("string"),
                       F.lit(self.config.sample_seed)) < F.lit(thr)
        )

    def _collect_agg_violations(
        self,
        model_name: str,
        df: DataFrame,
        failed: List[CompiledCheck],
        partition_col: Optional[str],
    ) -> None:
        pk = self._pk_column(model_name, df)
        structs = [
            F.when(
                chk.violation_predicate(),
                F.struct(
                    F.lit(chk.key).alias("check_key"),
                    (chk.observed_expr() if chk.observed_expr is not None
                     else F.lit(None).cast("string")).alias("observed"),
                    F.lit(chk.expected).cast("string").alias("expected"),
                ),
            )
            for chk in failed
        ]
        arr = F.filter(F.array(*structs), lambda x: x.isNotNull())
        base = df.select(
            F.col(pk).cast("string").alias("clip_id"),
            (F.col(partition_col).cast("string") if partition_col else F.lit(None).cast("string")
             ).alias("partition_id"),
            arr.alias("__v"),
        ).filter(F.size("__v") > 0)
        exploded = base.select(
            F.lit(self.run.runId).alias("run_id"),
            "partition_id",
            F.explode("__v").alias("v"),
            "clip_id",
        ).select(
            "run_id", "partition_id",
            F.col("v.check_key").alias("check_key"),
            "clip_id",
            F.col("v.observed").alias("observed"),
            F.col("v.expected").alias("expected"),
        )
        # Two-phase cap: a naive window over check_key alone would shuffle
        # EVERY violating row to one reducer per check (billions of rows on a
        # 10^12-row table with a hot failing rule). Phase 1 caps per
        # (check_key, input-partition) — keys are spread across reducers, and
        # the global top-cap by clip_id is a subset of the local top-caps, so
        # results are identical. Phase 2 ranks the <= cap * num_partitions
        # survivors per check, which is small by construction.
        cap = self.config.violation_cap
        w_local = Window.partitionBy("check_key", "__pid").orderBy("clip_id")
        local = (
            exploded.withColumn("__pid", F.spark_partition_id())
            .withColumn("__rn", F.row_number().over(w_local))
            .filter(F.col("__rn") <= cap)
            .drop("__rn", "__pid")
        )
        w = Window.partitionBy("check_key").orderBy("clip_id")
        capped = (
            local.withColumn("__rn", F.row_number().over(w))
            .filter(F.col("__rn") <= cap)
            .drop("__rn")
        )
        self._violation_frames.append(
            self.spark.createDataFrame(capped.collect(), schema=VIOLATIONS_DDL)
        )

    # -- approx uniqueness (HLL sketch in the shared scan; zero extra shuffle) --

    def _record_approx_unique(
        self,
        chk: CompiledCheck,
        part_rows: List[Dict[str, Any]],
        global_row: Dict[str, Any],
        partition_col: Optional[str],
    ) -> None:
        """Evaluate a unique check from the shared scan's HLL sketch.

        Estimated duplicate rows = nonnull_count - hll_estimate. HLL unions
        are lossless for equal lgConfigK, so the global estimate from unioned
        per-partition sketches is identical to a direct global sketch. The
        pass/fail bar is a 3-sigma noise floor (rsd = 1.04/sqrt(2^lgk)) —
        approx mode detects duplicate MASS above sketch noise; use
        unique_mode='exact' to certify zero duplicates.
        """
        nn_alias, sk_alias = self._hll_aliases(chk)
        rsd = 1.04 / math.sqrt(2 ** self.config.unique_hll_lgk)
        sketches = [
            (str(r.get(partition_col)) if partition_col else None, r.get(sk_alias))
            for r in part_rows
            if r.get(sk_alias) is not None
        ]
        if not sketches:
            nn = global_row.get(nn_alias) or 0
            self._record(chk, 0.0, ResultEnum.passed, None, None,
                         diagnostics={"approx": True, "nonnull": nn})
            return
        tiny = self.spark.createDataFrame(
            [(pid, bytearray(sk)) for pid, sk in sketches], "pid string, sk binary")
        per_part = {
            r["pid"]: float(r["est"])
            for r in tiny.select("pid", F.hll_sketch_estimate("sk").alias("est")).collect()
        }
        global_est = float(
            tiny.agg(F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("est")).first()["est"]
        )

        def judge(nonnull: float, est: float):
            dup_est = max(0.0, nonnull - est)
            floor = 3.0 * rsd * nonnull
            if dup_est <= floor:
                return dup_est, ResultEnum.passed, None
            return dup_est, ResultEnum.failed, (
                f"{chk.name}: ~{int(dup_est)} duplicate rows estimated "
                f"(nonnull={int(nonnull)}, approx_distinct={int(est)}, "
                f"noise_floor={floor:.1f})"
            )

        nn_global = float(global_row.get(nn_alias) or 0)
        metric, result, reason = judge(nn_global, global_est)
        self._record(chk, metric, result, reason, None, diagnostics={
            "approx": True, "approx_distinct": global_est,
            "nonnull": nn_global, "rsd": rsd,
        })
        if partition_col:
            for prow in part_rows:
                pid = str(prow.get(partition_col))
                est = per_part.get(pid)
                if est is None:
                    continue
                pm, pres, preason = judge(float(prow.get(nn_alias) or 0), est)
                self._record(chk, pm, pres, preason, None, partition_id=pid)

    # -- uniqueness (dedicated shuffle; AQE-skew-safe) ------------------------

    def _unique_compute(self, df: DataFrame, chk: CompiledCheck) -> dict:
        """Exact duplicate count via two-phase salted aggregation.

        ``groupBy(col).count()`` compiles to partial-agg -> exchange -> final-agg:
        each map task pre-combines its rows per key, so a hot key (every row the
        same clip_id) reaches the reducer as at most ONE row per input partition
        — the map-side partial aggregation IS the explicit salt (salt = input
        partition id), with the salted partial counts summed in the final agg.
        Shuffle volume is bounded by distinct-keys-per-partition, never by row
        count, and AQE skew handling covers residual reducer imbalance when
        distinct keys themselves are many and hot. Never materializes full rows
        (no ``dropDuplicates``) — only (key, count) pairs with count > 1 survive
        the first pass.
        """
        key_cols = chk.params.get("key_cols") or [chk.field]
        flt = chk.params.get("filter")
        base = df.filter(F.expr(flt)) if flt else df
        # alias so dotted (nested-struct) paths keep a stable key column name;
        # composite keys group on every component and report the tuple as a
        # '|'-joined string. Rows with any NULL component are excluded (field
        # semantics: duplicate_count is over non-null values; composite PK
        # semantics: NULL components belong to composite_key_null).
        aliased = [F.col(c).alias(f"__k{i}") for i, c in enumerate(key_cols)]
        names = [f"__k{i}" for i in range(len(key_cols))]
        notnull = F.col(names[0]).isNotNull()
        for n_ in names[1:]:
            notnull = notnull & F.col(n_).isNotNull()
        dup = (
            base.select(*aliased).filter(notnull)
            .groupBy(*names).agg(F.count(F.lit(1)).alias("__cnt"))
            .filter(F.col("__cnt") > 1)
            .select(
                F.concat_ws("|", *[F.col(n_).cast("string") for n_ in names])
                .alias("__key"),
                "__cnt",
            )
        )
        from pyspark import StorageLevel

        # dup holds only keys with count > 1 — tiny relative to the input.
        # Persist it across the stats action and the violation sample so a
        # FAILING unique check does not re-run the key shuffle (the single
        # most expensive job at 10^12 rows) a second time just to collect
        # the capped examples.
        dup = dup.persist(StorageLevel.MEMORY_AND_DISK)
        try:
            stats = dup.agg(
                F.count(F.lit(1)).alias("dup_values"),
                F.coalesce(F.sum(F.col("__cnt") - 1), F.lit(0)).alias("dup_rows"),
            ).first()
            metric = float(stats["dup_values"] or 0)
            vio_rows = None
            if metric > 0:
                vio = dup.orderBy(F.col("__cnt").desc(), F.col("__key")).limit(self.config.violation_cap).select(
                    F.lit(self.run.runId).alias("run_id"),
                    F.lit(None).cast("string").alias("partition_id"),
                    F.lit(chk.key).alias("check_key"),
                    F.col("__key").cast("string").alias("clip_id"),
                    F.concat(F.lit("count="), F.col("__cnt").cast("string")).alias("observed"),
                    F.lit("unique").alias("expected"),
                )
                vio_rows = vio.collect()
        finally:
            dup.unpersist()
        return {"metric": metric, "dup_values": stats["dup_values"],
                "dup_rows": stats["dup_rows"], "vio_rows": vio_rows}

    def _record_unique(self, chk: CompiledCheck, res: dict) -> None:
        metric = res["metric"]
        result, reason = chk.eval_metric(metric, {})
        self._record(chk, metric, result, reason, None,
                     diagnostics={"dup_values": res["dup_values"], "dup_rows": res["dup_rows"]})
        if res["vio_rows"]:
            self._violation_frames.append(
                self.spark.createDataFrame(res["vio_rows"], schema=VIOLATIONS_DDL))

    # -- per-group aggregate thresholds (group quality checks) ----------------

    def _group_compute(self, df: DataFrame, chk: CompiledCheck) -> dict:
        """groupBy(key) + decomposable aggregate + threshold filter.

        Same shuffle shape as `_unique_compute`: map-side partial aggregation
        bounds shuffle volume by distinct-keys-per-partition, AQE covers
        reducer skew. The threshold is a Spark predicate, so violating groups
        are counted distributed and only `violation_cap` examples reach the
        driver — a billion-group key column never materializes driver-side.
        """
        p = chk.params
        gcol, agg_thunk = p["group_col"], p["agg_expr"]
        if agg_thunk is None:
            return {"error": f"unsupported group metric {p['metric']!r} "
                             f"(over column required for sum/avg/min/max)"}
        if resolve_schema_field(df.schema, gcol) is None:
            return {"error": f"group column {gcol} missing"}
        if p["over"] and resolve_schema_field(df.schema, p["over"]) is None:
            return {"error": f"aggregated column {p['over']} missing"}
        if p.get("filter"):
            # scoped group thresholds: out-of-scope rows never reach the
            # groupBy (groups entirely out of scope simply don't exist)
            df = df.filter(F.expr(p["filter"]))
        from pyspark import StorageLevel

        grouped = df.groupBy(F.col(gcol).alias("__gkey")).agg(agg_thunk().alias("__gval"))
        pass_pred = p["pass_pred"](F.col("__gval"))
        # violating groups only (post-aggregate, bounded by group count, not
        # row count) — persist across the count and the capped example sample
        # so a failing group check pays the groupBy shuffle exactly once
        viol = grouped.filter(~F.coalesce(pass_pred, F.lit(False))).persist(
            StorageLevel.MEMORY_AND_DISK)
        try:
            metric = float(viol.count())
            vio_rows = None
            if metric > 0:
                vio_rows = viol.orderBy("__gkey").limit(self.config.violation_cap).select(
                    F.lit(self.run.runId).alias("run_id"),
                    F.lit(None).cast("string").alias("partition_id"),
                    F.lit(chk.key).alias("check_key"),
                    F.col("__gkey").cast("string").alias("clip_id"),
                    F.concat(F.lit(f"{p['metric']}="), F.col("__gval").cast("string")).alias("observed"),
                    F.lit(chk.expected).alias("expected"),
                ).collect()
        finally:
            viol.unpersist()
        return {"metric": metric, "vio_rows": vio_rows}

    def _record_group(self, chk: CompiledCheck, res: dict) -> None:
        if "error" in res:
            self._record(chk, None, ResultEnum.error, res["error"], None)
            return
        metric = res["metric"]
        result = ResultEnum.passed if metric == 0 else ResultEnum.failed
        reason = None if metric == 0 else (
            f"{chk.name}: {int(metric)} group(s) violate {chk.params['threshold']}"
        )
        self._record(chk, metric, result, reason, None)
        if res["vio_rows"]:
            self._violation_frames.append(
                self.spark.createDataFrame(res["vio_rows"], schema=VIOLATIONS_DDL))

    # -- audio content uniqueness (fingerprint near-dup) ----------------------

    def _audio_fp_compute(self, model_name: str, df: DataFrame, chk: CompiledCheck) -> dict:
        """Acoustic near-dup pair count via dcspark/audiofp.py.

        One mapInPandas decode+FFT pass emits (clip_id, hash); candidates come
        from the bucketed hash equi-join (never all-pairs), the pair count is
        aggregated distributed, and only violation_cap example pairs reach the
        driver. Runs concurrently with the shared scan's decode pass in the
        thunk pool.
        """
        from . import audiofp as afp

        p = chk.params
        bytes_col = p["bytes_col"]
        if bytes_col not in df.columns:
            return {"error": f"bytes column {bytes_col} missing"}
        id_col = self._pk_column(model_name, df)
        with self._arrow_batch_conf():
            pairs = afp.audio_near_dup(
                df, id_col=id_col, bytes_col=bytes_col,
                threshold=float(p["score_threshold"]),
            )
            return self._audio_fp_result(pairs, chk)

    def _audio_fp_result(self, pairs: DataFrame, chk: CompiledCheck) -> dict:
        """Count + capped example pairs from a near-dup pair frame (one
        persisted evaluation shared by the count and the violation sample)."""
        from pyspark import StorageLevel

        pairs = pairs.persist(StorageLevel.MEMORY_AND_DISK)
        try:
            metric = float(pairs.count())
            vio_rows = None
            if metric > 0:
                vio_rows = pairs.orderBy("id_a", "id_b").limit(
                    self.config.violation_cap
                ).select(
                    F.lit(self.run.runId).alias("run_id"),
                    F.lit(None).cast("string").alias("partition_id"),
                    F.lit(chk.key).alias("check_key"),
                    F.concat(F.col("id_a"), F.lit("|"), F.col("id_b")).alias("clip_id"),
                    F.concat(
                        F.lit("matches="), F.col("matches").cast("string"),
                        F.lit(" score="), F.col("score").cast("string"),
                    ).alias("observed"),
                    F.lit(chk.expected).alias("expected"),
                ).collect()
        finally:
            pairs.unpersist()
        return {"metric": metric, "vio_rows": vio_rows}

    def _image_compact(self, df: DataFrame, id_col: str, bytes_col: str,
                       with_dhash: bool, features: tuple) -> DataFrame:
        """The single fused image decode pass (imagefp.image_compact), as a
        method so the fusion tests can count invocations."""
        from . import imagefp

        return imagefp.image_compact(
            df, id_col=id_col, bytes_col=bytes_col,
            with_dhash=with_dhash, features=features)

    def _image_family_compute(
        self, model_name: str, df: DataFrame,
        group: List[CompiledCheck], bytes_col: str,
    ) -> Dict[str, dict]:
        """All image contract rules on one payload column from ONE decode.

        A single mapInPandas pass (imagefp.image_compact) emits the compact
        per-image frame — dims + decode_error always, dHash when a
        content-uniqueness rule is present, decoded-raster features when
        signal-quality rules are present. The frame persists (scalar rows
        only — pixels never shuffle or spill) and every check in the group
        evaluates from it: at 100 TB the payload scan IS the job, so the
        family must never decode twice (mirrors the audio family's
        exactly-one-decode invariant). Runs concurrently in the thunk pool."""
        from pyspark import StorageLevel

        if bytes_col not in df.columns:
            return {c.key: {"error": f"bytes column {bytes_col} missing"}
                    for c in group}
        decode_checks = [c for c in group if c.kind == "image"]
        quality_checks = [c for c in group if c.kind == "image_quality"]
        fp_checks = [c for c in group if c.kind == "image_fp"]
        drift_checks = [c for c in group if c.kind == "image_drift"]
        out: Dict[str, dict] = {}
        # drift without a reference snapshot errors at zero cost — and its
        # feature must not join the decode pass it will never consume
        drift_eval: List[Tuple[CompiledCheck, dict]] = []
        for c in drift_checks:
            feat = c.params["feature"]
            stats = self.config.ref_stats.get(model_name, {}).get(f"image:{feat}")
            if not stats:
                out[c.key] = {"error": (
                    f"no reference snapshot for image feature {feat} "
                    "(build with the CLI snapshot command; stored under "
                    f"ref_stats key 'image:{feat}')")}
            else:
                drift_eval.append((c, stats))
        features = tuple(sorted(
            {c.params["feature"] for c in quality_checks}
            | {c.params["feature"] for c, _ in drift_eval}))
        id_col = self._pk_column(model_name, df)
        with self._arrow_batch_conf():
            compact = self._image_compact(
                df, id_col=id_col, bytes_col=bytes_col,
                with_dhash=bool(fp_checks), features=features)
        compact = compact.persist(StorageLevel.MEMORY_AND_DISK)
        try:
            for c in decode_checks:
                out[c.key] = self._image_decode_eval(df, compact, c, id_col)
            for c in quality_checks:
                out[c.key] = self._image_quality_eval(compact, c)
            for c, stats in drift_eval:
                out[c.key] = self._image_drift_eval(compact, c, stats)
            for c in fp_checks:
                out[c.key] = self._image_fp_eval(compact, c)
            return out
        finally:
            compact.unpersist()

    def _image_decode_eval(self, df: DataFrame, compact: DataFrame,
                           chk: CompiledCheck, id_col: str) -> dict:
        """Decode conformance from the compact frame; with declared
        width/height columns the comparison joins back on the primary key
        (8-byte-ish rows only)."""
        p = chk.params
        for dim_col in (p["width_col"], p["height_col"]):
            if dim_col and dim_col not in df.columns:
                return {"error": f"declared dimension column {dim_col} missing"}
        meta = compact.withColumnRenamed("id", "__img_id")
        bad_cond = F.col("decode_error").isNotNull()
        observed = [F.coalesce(F.col("decode_error"), F.lit(""))]
        if p["width_col"] or p["height_col"]:
            # LEFT join (null-pk rows must stay visible) against DEDUPLICATED
            # declared dims (duplicate pks would fan out and overcount); the
            # comparisons are null-SAFE so a NULL declared dimension counts as
            # a violation (the row is unverifiable) instead of slipping
            # through '!=' three-valued logic
            declared = df.select(
                F.col(id_col).cast("string").alias("__img_id"),
                *( [F.col(p["width_col"]).alias("__decl_w")] if p["width_col"] else [] ),
                *( [F.col(p["height_col"]).alias("__decl_h")] if p["height_col"] else [] ),
            ).dropDuplicates(["__img_id"])
            meta = meta.join(declared, "__img_id", "left")
            if p["width_col"]:
                bad_cond = bad_cond | ~F.col("width").eqNullSafe(F.col("__decl_w"))
                observed.append(F.concat(
                    F.lit(" w="), F.coalesce(F.col("width").cast("string"), F.lit("?")),
                    F.lit("/"), F.coalesce(F.col("__decl_w").cast("string"), F.lit("?"))))
            if p["height_col"]:
                bad_cond = bad_cond | ~F.col("height").eqNullSafe(F.col("__decl_h"))
                observed.append(F.concat(
                    F.lit(" h="), F.coalesce(F.col("height").cast("string"), F.lit("?")),
                    F.lit("/"), F.coalesce(F.col("__decl_h").cast("string"), F.lit("?"))))
        bad = meta.filter(bad_cond).select(
            F.col("__img_id").alias("id_a"),
            F.concat_ws("", *observed).alias("__observed"))
        return self._count_and_sample(
            bad, chk, id_expr=F.coalesce(F.col("id_a"), F.lit("<null-id>")),
            observed_expr=F.col("__observed"))

    def _count_and_sample(self, frame: DataFrame, chk: CompiledCheck,
                          id_expr, observed_expr) -> dict:
        """Shared count + capped violation sampling over one persisted
        evaluation of a violating-row frame (used by the image check; the
        audio_fp pair path keeps its pair-specific shape)."""
        from pyspark import StorageLevel

        frame = frame.persist(StorageLevel.MEMORY_AND_DISK)
        try:
            metric = float(frame.count())
            vio_rows = None
            if metric > 0:
                vio_rows = frame.orderBy("id_a").limit(
                    self.config.violation_cap
                ).select(
                    F.lit(self.run.runId).alias("run_id"),
                    F.lit(None).cast("string").alias("partition_id"),
                    F.lit(chk.key).alias("check_key"),
                    id_expr.alias("clip_id"),
                    observed_expr.alias("observed"),
                    F.lit(chk.expected).alias("expected"),
                ).collect()
            return {"metric": metric, "vio_rows": vio_rows}
        finally:
            frame.unpersist()

    def _image_quality_eval(self, compact: DataFrame,
                            chk: CompiledCheck) -> dict:
        """Signal-quality bounds from the compact frame's f_<feature> column.

        Decode failures belong to decode-conformance and are never
        double-counted here (their feature columns are NULL, and the
        explicit decode_error guard keeps the semantics visible)."""
        p = chk.params
        feat = F.col(f"f_{p['feature']}")
        cond = F.lit(False)
        if p["minimum"] is not None:
            cond = cond | (feat < F.lit(float(p["minimum"])))
        if p["maximum"] is not None:
            cond = cond | (feat > F.lit(float(p["maximum"])))
        bad = compact.filter(F.col("decode_error").isNull() & cond).select(
            F.col("id").alias("id_a"),
            F.concat(F.lit(p["feature"] + "="),
                     F.round(feat, 4).cast("string")).alias("__observed"))
        return self._count_and_sample(
            bad, chk, id_expr=F.coalesce(F.col("id_a"), F.lit("<null-id>")),
            observed_expr=F.col("__observed"))

    def _image_drift_eval(self, compact: DataFrame, chk: CompiledCheck,
                          stats: dict) -> dict:
        """Binned KS/PSI of the compact frame's f_<feature> column against
        the snapshot's bin grid — one groupBy over persisted scalars, no
        payload rescan. Decode failures are excluded (they belong to
        decode-conformance; a drift statistic over them is meaningless)."""
        from . import drift as drift_mod

        feat = f"f_{chk.params['feature']}"
        edges = [float(x) for x in stats["bin_edges"]]
        rows = (compact
                .filter(F.col("decode_error").isNull()
                        & F.col(feat).isNotNull())
                .groupBy(drift_mod.bucket_expr(feat, edges).alias("__b"))
                .count().collect())
        counts = [0] * (len(edges) + 1)
        for r in rows:
            counts[int(r["__b"])] += int(r["count"])
        stat = drift_mod.drift_statistic_from_counts(
            counts, stats, chk.params["method"])
        return {"stat": stat, "rows": sum(counts)}

    def _record_image_drift(self, chk: CompiledCheck, res: dict) -> None:
        if "error" in res:
            self._record(chk, None, ResultEnum.error, res["error"], None)
            return
        result, reason = chk.eval_metric(res["stat"], {})
        self._record(chk, res["stat"], result, reason, res["rows"])

    def _image_fp_eval(self, compact: DataFrame, chk: CompiledCheck) -> dict:
        """Content uniqueness: blocked Hamming pairs over the compact
        frame's dhash column (imagefp.near_dup_pairs_from_fp — only 8-byte
        hashes shuffle); metric = pair count, violations = capped pairs."""
        from pyspark import StorageLevel

        from . import imagefp

        p = chk.params
        pairs = imagefp.near_dup_pairs_from_fp(
            compact.select("id", "dhash"),
            max_hamming=p["max_hamming"], max_bucket=p["max_bucket"],
        ).persist(StorageLevel.MEMORY_AND_DISK)
        try:
            metric = float(pairs.count())
            vio_rows = None
            if metric > 0:
                vio_rows = pairs.orderBy("id_a", "id_b").limit(
                    self.config.violation_cap
                ).select(
                    F.lit(self.run.runId).alias("run_id"),
                    F.lit(None).cast("string").alias("partition_id"),
                    F.lit(chk.key).alias("check_key"),
                    F.concat(F.col("id_a"), F.lit("|"),
                             F.col("id_b")).alias("clip_id"),
                    F.concat(F.lit("hamming="),
                             F.col("hamming").cast("string")).alias("observed"),
                    F.lit(chk.expected).alias("expected"),
                ).collect()
            return {"metric": metric, "vio_rows": vio_rows}
        finally:
            pairs.unpersist()
            from .pipeline_ckpt import release_caches

            release_caches(pairs)

    def _video_compute(self, model_name: str, df: DataFrame,
                       chk: CompiledCheck) -> dict:
        """Video decode conformance: one mapInPandas decode pass
        (multimodal.video_metadata) emitting scalars; declared fps /
        frame-count / dims join back on the primary key with the same
        null-safe, left-join, dedup'd-declared-side semantics as the image
        rule (a NULL declared value is unverifiable -> violation; NULL-pk
        corrupt rows stay visible; duplicate pks never fan out)."""
        from . import multimodal

        p = chk.params
        bytes_col = p["bytes_col"]
        if bytes_col not in df.columns:
            return {"error": f"bytes column {bytes_col} missing"}
        decl = {k: v for k, v in p["decl_cols"].items() if v}
        for col in decl.values():
            if col not in df.columns:
                return {"error": f"declared column {col} missing"}
        id_col = self._pk_column(model_name, df)
        with self._arrow_batch_conf():
            meta = multimodal.video_metadata(
                df, id_col=id_col, bytes_col=bytes_col
            ).withColumnRenamed("id", "__vid_id")
        bad_cond = F.col("decode_error").isNotNull()
        observed = [F.coalesce(F.col("decode_error"), F.lit(""))]
        if decl:
            declared = df.select(
                F.col(id_col).cast("string").alias("__vid_id"),
                *[F.col(c).alias(f"__decl_{k}") for k, c in decl.items()],
            ).dropDuplicates(["__vid_id"])
            meta = meta.join(declared, "__vid_id", "left")
            decoded = {"fps": F.col("fps"), "frames": F.col("n_frames"),
                       "width": F.col("width"), "height": F.col("height")}
            for k in decl:
                dv, cv = decoded[k], F.col(f"__decl_{k}")
                if k == "fps":
                    # tolerance compare, but NULL on either side (corrupt
                    # payload / undeclared rate) must count as a violation,
                    # not slip through three-valued logic
                    ok = (dv.isNotNull() & cv.isNotNull()
                          & (F.abs(dv - cv) <= F.lit(p["fps_tolerance"])))
                    bad_cond = bad_cond | ~ok
                else:
                    bad_cond = bad_cond | ~dv.eqNullSafe(cv)
                observed.append(F.concat(
                    F.lit(f" {k}="),
                    F.coalesce(dv.cast("string"), F.lit("?")), F.lit("/"),
                    F.coalesce(cv.cast("string"), F.lit("?"))))
        bad = meta.filter(bad_cond).select(
            F.col("__vid_id").alias("id_a"),
            F.concat_ws("", *observed).alias("__observed"))
        return self._count_and_sample(
            bad, chk, id_expr=F.coalesce(F.col("id_a"), F.lit("<null-id>")),
            observed_expr=F.col("__observed"))

    def _record_video(self, chk: CompiledCheck, res: dict) -> None:
        self._record_zero_default(
            chk, res, lambda m: (f"{chk.name}: {int(m)} video payload(s) "
                                 "failed decode or stream-header conformance"))

    def _record_image(self, chk: CompiledCheck, res: dict) -> None:
        self._record_zero_default(
            chk, res, lambda m: (f"{chk.name}: {int(m)} image payload(s) "
                                 "failed decode or dimension conformance"))

    def _record_image_quality(self, chk: CompiledCheck, res: dict) -> None:
        self._record_zero_default(
            chk, res, lambda m: (f"{chk.name}: {int(m)} image(s) outside "
                                 "decoded-feature bounds"))

    def _record_image_fp(self, chk: CompiledCheck, res: dict) -> None:
        self._record_zero_default(
            chk, res, lambda m: (f"{chk.name}: {int(m)} near-duplicate "
                                 "image pair(s)"))

    def _record_zero_default(self, chk: CompiledCheck, res: dict,
                             fail_reason) -> None:
        """Shared recorder for metric-counts-violations checks: evaluator if
        configured, else zero-is-pass; violation rows appended when present."""
        if "error" in res:
            self._record(chk, None, ResultEnum.error, res["error"], None)
            return
        metric = res["metric"]
        evaluator = chk.params.get("evaluator")
        if evaluator is not None:
            result, reason = evaluator(metric, {})
        else:
            result = ResultEnum.passed if metric == 0 else ResultEnum.failed
            reason = None if metric == 0 else fail_reason(metric)
        self._record(chk, metric, result, reason, None)
        if res["vio_rows"]:
            self._violation_frames.append(
                self.spark.createDataFrame(res["vio_rows"], schema=VIOLATIONS_DDL))

    def _record_audio_fp(self, chk: CompiledCheck, res: dict) -> None:
        self._record_zero_default(
            chk, res,
            lambda m: f"{chk.name}: {int(m)} near-duplicate clip pair(s)")

    # -- referential integrity (anti-join) ------------------------------------

    def _reference_compute(self, df: DataFrame, chk: CompiledCheck) -> dict:
        parent_name = chk.params["parent_model"]
        parent_field = chk.params["parent_field"]
        parent = self.tables.get(parent_name)
        if parent is None:
            return {"error": f"parent table {parent_name} not provided"}
        if parent_field not in parent.columns:
            return {"error": f"parent column {parent_field} missing in {parent_name}"}
        child_col = chk.field
        flt = chk.params.get("filter")
        if flt:
            # scoped referential integrity: only in-scope child rows must
            # resolve (filter applied before the anti-join, so pushdown
            # shrinks the probe side)
            df = df.filter(F.expr(flt))
        part_col = self.config.partition_col if (
            self.config.partition_col
            and self.config.partition_col in df.columns
            and self.config.partition_col != child_col) else None
        diagnostics = None
        orphans = None
        if self.config.reference_mode == "approx":
            built = self._reference_bloom_orphans(df, chk, parent,
                                                  parent_field, child_col,
                                                  part_col)
            if built is not None:
                orphans, diagnostics = built
            # else: bloom over budget — fall through to the exact anti-join
        if orphans is None:
            keys = parent.select(
                F.col(parent_field).alias("__parent_key")).distinct()
            if self.config.broadcast_references:
                keys = F.broadcast(keys)
            # alias so dotted (nested-struct) paths keep a stable key column
            # name; the partition column rides along for per-partition
            # orphan attribution
            sel = [F.col(child_col).alias("__child")]
            if part_col:
                sel.append(F.col(part_col))
            orphans = df.select(*sel).filter(
                F.col("__child").isNotNull()
            ).join(keys, on=F.col("__child") == F.col("__parent_key"),
                   how="left_anti")
        from pyspark import StorageLevel

        # Reduce to (orphan value[, partition], row count) before any action:
        # the grouped frame is bounded by DISTINCT orphan values (map-side
        # partial agg), so persisting it is cheap even when billions of rows
        # are orphaned — and the exact row-level metric, the per-partition
        # rollup, and the capped per-row example sample all derive from it
        # without re-running the anti-join (the full child-table shuffle) a
        # second time.
        gcols = ["__child"] + ([part_col] if part_col else [])
        grouped = orphans.groupBy(*gcols).agg(
            F.count(F.lit(1)).alias("__cnt")
        ).persist(StorageLevel.MEMORY_AND_DISK)
        try:
            metric = float(
                grouped.agg(F.coalesce(F.sum("__cnt"), F.lit(0)).alias("n")).first()["n"]
            )
            part_metrics = None
            if part_col:
                part_metrics = {
                    str(r[part_col]): float(r["n"])
                    for r in grouped.groupBy(part_col)
                    .agg(F.sum("__cnt").alias("n")).collect()
                }
            vio_rows = None
            if metric > 0:
                cap = self.config.violation_cap
                # per-row violation semantics preserved: a value orphaned k
                # times contributes min(k, cap) example rows, capped overall
                vio = grouped.select(
                    (F.col(part_col).cast("string") if part_col
                     else F.lit(None).cast("string")).alias("__part"),
                    F.explode(
                        F.array_repeat(
                            F.col("__child"),
                            F.least(F.col("__cnt"), F.lit(cap)).cast("int"),
                        )
                    ).alias("__child"),
                ).limit(cap).select(
                    F.lit(self.run.runId).alias("run_id"),
                    F.col("__part").alias("partition_id"),
                    F.lit(chk.key).alias("check_key"),
                    F.col("__child").cast("string").alias("clip_id"),
                    F.col("__child").cast("string").alias("observed"),
                    F.lit(chk.expected).alias("expected"),
                )
                vio_rows = vio.collect()
        finally:
            grouped.unpersist()
            # approx path: the bitset broadcast is only needed while the
            # probe can still (re-)run — after grouped is unpersisted nothing
            # derives from it, and Spark never GCs broadcasts on long-lived
            # sessions (a bench loop would accumulate one per check run)
            bc = getattr(orphans, "_dcspark_broadcast", None)
            if bc is not None:
                try:
                    bc.destroy()
                except Exception:  # noqa: BLE001 — cleanup must never mask results
                    pass
        out = {"metric": metric, "vio_rows": vio_rows,
               "part_metrics": part_metrics}
        if diagnostics:
            out["diagnostics"] = diagnostics
        return out

    def _reference_bloom_orphans(self, df: DataFrame, chk: CompiledCheck,
                                 parent: DataFrame, parent_field: str,
                                 child_col: str,
                                 part_col: Optional[str] = None):
        """Approx referential path (``reference_mode="approx"``): parent keys
        fold into ONE Bloom bitset; child rows whose key is provably absent
        are the orphans — the membership probe is MAP-ONLY, so the
        10^12-row child table never shuffles (vs the exact path's anti-join,
        whose sort-merge fallback shuffles every child row when the parent
        outgrows broadcast).

        Semantics are one-sided and disclosed: a Bloom filter has no false
        negatives, so every reported orphan is REAL (a failing check is
        proof); a passing check may miss each true orphan with probability
        ~fpp (~0.8% at the 10 bits/key sizing). Use the exact mode for
        certification; approx for the routine at-scale sweep — the same
        exact/approx contract as unique_mode.

        Returns (orphans_frame, diagnostics) or None when the bitset would
        exceed ``reference_bloom_max_bytes`` (the broadcast budget — same
        guard pattern as decontam's broadcast_max_grams), in which case the
        caller falls back to the exact anti-join.
        """
        from . import bloomfilter as bf

        m, k, n_b, bits = bf.build_column_bloom(
            parent, parent_field,
            max_bytes=self.config.reference_bloom_max_bytes)
        if bits is None:
            self.run.log_info(
                f"{chk.key}: approx reference mode fell back to the exact "
                f"anti-join — parent bloom would need {m // 8} bytes for "
                f"~{n_b} keys (budget {self.config.reference_bloom_max_bytes})")
            return None
        fpp = bf.bloom_fpp(m, k, n_b)
        self.run.log_info(
            f"{chk.key}: approx reference mode — {m // 8}-byte parent bloom "
            f"over ~{n_b} keys, child probe map-only; reported orphans are "
            f"exact, missed-orphan probability ~{fpp:.2%} per row")
        # F.hash/xxhash64 are type-dependent: the child key MUST hash as the
        # parent key's exact type, or a benign int32-vs-int64 FK pairing
        # (parquet writers disagree on key widths all the time) would report
        # EVERY child row as an orphan — the false-positive outcome the
        # mode's one-sided contract promises cannot happen. try_cast, not
        # cast: under ANSI (the Spark 4 default) an unparseable key would
        # abort the whole run with CAST_INVALID_INPUT; a non-null key whose
        # cast is null provably matches no parent key, so it flows through
        # the probe as a definite orphan (ADVICE r04) — still one child
        # scan, zero shuffle.
        parent_type = parent.schema[parent_field].dataType
        sel = [F.col(child_col).try_cast(parent_type).alias("__cast"),
               F.col(child_col).alias("__orig")]
        if part_col:
            sel.append(F.col(part_col))
        src = df.select(*sel).filter(F.col("__orig").isNotNull())
        probe = bf.non_members(
            src, "__cast", m, k, bits,
            keep_cols=["__orig"] + ([part_col] if part_col else []),
            null_is_orphan=True)
        # report the ORIGINAL value for uncastable keys (the cast is null);
        # string-typed __child is fine downstream (groupBy + cast-to-string)
        orphans = probe.select(
            F.coalesce(F.col("__child").cast("string"),
                       F.col("__orig").cast("string")).alias("__child"),
            *([F.col(part_col)] if part_col else []))
        orphans._dcspark_broadcast = probe._dcspark_broadcast
        diagnostics = {"approx": True, "bloom_bytes": m // 8,
                       "bloom_fpp": fpp, "parent_keys_est": n_b}
        return orphans, diagnostics

    def _record_reference(self, chk: CompiledCheck, res: dict) -> None:
        if "error" in res:
            self._record(chk, None, ResultEnum.error, res["error"], None)
            return
        metric = res["metric"]
        result, reason = chk.eval_metric(metric, {})
        self._record(chk, metric, result, reason, None,
                     diagnostics=res.get("diagnostics"))
        # per-partition orphan attribution (partition_col runs): partitions
        # WITH orphans get their own failed row — the "which ingest
        # partition went bad" answer; clean partitions are covered by the
        # global row (enumerating them would need another child scan)
        for pid, pm in sorted((res.get("part_metrics") or {}).items()):
            if pm > 0:
                pres, preason = chk.eval_metric(pm, {})
                self._record(chk, pm, pres, preason, None, partition_id=pid)
        if res["vio_rows"]:
            self._violation_frames.append(
                self.spark.createDataFrame(res["vio_rows"], schema=VIOLATIONS_DDL))

    # -- transcript equality vs oracle reference (join check) ------------------

    def _join_equality_compute(self, df: DataFrame, chk: CompiledCheck) -> dict:
        p = chk.params
        ref = self.tables.get(p["ref_model"])
        if ref is None:
            return {"error": f"reference table {p['ref_model']} not provided"}
        key, child_col, ref_col = p["key"], p["child_col"], p["ref_col"]
        if key not in df.columns or child_col not in df.columns or key not in ref.columns or ref_col not in ref.columns:
            return {"error": "join/compare column missing"}
        part_col = self.config.partition_col if (
            self.config.partition_col
            and self.config.partition_col in df.columns
            and self.config.partition_col not in (key, child_col)) else None
        # inner equi-join on the key (rows absent from the reference are the
        # referential check's concern, not equality's); null-safe inequality;
        # the partition column rides along for per-partition attribution
        child_sel = [F.col(key).alias("__k"), F.col(child_col).alias("__child")]
        if part_col:
            child_sel.append(F.col(part_col))
        joined = df.select(*child_sel).join(
            ref.select(F.col(key).alias("__k"), F.col(ref_col).alias("__ref")),
            on="__k", how="inner",
        )
        from pyspark import StorageLevel

        # mismatching rows only — persist across the count and the capped
        # sample so a FAILING equality check doesn't re-run the key join of
        # two corpus-sized tables (the same single-scan-on-fail guarantee as
        # unique/group/reference; gated in tests/test_single_scan_on_fail.py)
        mismatch = joined.filter(
            ~F.col("__child").eqNullSafe(F.col("__ref"))
        ).persist(StorageLevel.MEMORY_AND_DISK)
        try:
            metric = float(mismatch.count())
            part_metrics = None
            if part_col:
                part_metrics = {
                    str(r[part_col]): float(r["n"])
                    for r in mismatch.groupBy(part_col)
                    .agg(F.count(F.lit(1)).alias("n")).collect()
                }
            vio_rows = None
            if metric > 0:
                vio = mismatch.limit(self.config.violation_cap).select(
                    F.lit(self.run.runId).alias("run_id"),
                    (F.col(part_col).cast("string") if part_col
                     else F.lit(None).cast("string")).alias("partition_id"),
                    F.lit(chk.key).alias("check_key"),
                    F.col("__k").cast("string").alias("clip_id"),
                    F.col("__child").cast("string").alias("observed"),
                    F.concat(F.lit("ref: "), F.col("__ref").cast("string")).alias("expected"),
                )
                vio_rows = vio.collect()
        finally:
            mismatch.unpersist()
        return {"metric": metric, "vio_rows": vio_rows,
                "part_metrics": part_metrics}

    def _record_join_equality(self, chk: CompiledCheck, res: dict) -> None:
        if "error" in res:
            self._record(chk, None, ResultEnum.error, res["error"], None)
            return
        metric = res["metric"]
        result, reason = chk.eval_metric(metric, {})
        self._record(chk, metric, result, reason, None)
        # per-partition attribution, same contract as _record_reference:
        # partitions WITH mismatches get their own failed row
        for pid, pm in sorted((res.get("part_metrics") or {}).items()):
            if pm > 0:
                pres, preason = chk.eval_metric(pm, {})
                self._record(chk, pm, pres, preason, None, partition_id=pid)
        if res["vio_rows"]:
            self._violation_frames.append(
                self.spark.createDataFrame(res["vio_rows"], schema=VIOLATIONS_DDL))

    # -- SQL quality ----------------------------------------------------------

    def _sql_compute(self, chk: CompiledCheck) -> dict:
        query = chk.params.get("query")
        if not query:
            return {"error": "no query"}
        try:
            row = self.spark.sql(query).first()
            metric = None if row is None else float(row[0])
        except Exception as e:  # surfaced as error check, not crash (soda parity)
            return {"error": f"query failed: {e}"}
        return {"metric": metric}

    def _record_sql(self, chk: CompiledCheck, res: dict) -> None:
        if "error" in res:
            self._record(chk, None, ResultEnum.error, res["error"], None)
            return
        result, reason = chk.eval_metric(res["metric"], {})
        self._record(chk, res["metric"], result, reason, None)

    # -- checkpoint / resume ---------------------------------------------------

    def _manifest_path(self, model_name: str) -> str:
        key = f"{self.spec.id or 'contract'}__{model_name}"
        return os.path.join(self.config.checkpoint_dir, f"manifest__{key}.jsonl")

    def _partition_lineage(
        self, df: DataFrame, partition_col: str,
        parts: Optional[List[str]] = None,
    ) -> Dict[str, Dict[str, Any]]:
        """{partition_id: {"files": n, "sig": md5-of-sorted-file-list}} via a
        column-pruned scan of (partition_col, input_file_name()) distinct
        pairs — per-partition provenance for the checkpoint manifest (north
        rule: "per-partition lineage + metrics"). In-memory frames (no
        files) yield a single empty name, which is stable across runs."""
        import hashlib

        sub = df
        if parts is not None:
            sub = df.filter(F.col(partition_col).cast("string").isin(list(parts)))
        rows = (
            sub.select(
                F.col(partition_col).cast("string").alias("p"),
                F.input_file_name().alias("f"))
            .distinct().collect()
        )
        by_part: Dict[str, List[str]] = {}
        for r in rows:
            by_part.setdefault(r["p"], []).append(r["f"])
        return {
            p: {
                "files": len([f for f in fs if f]),
                "sig": hashlib.md5("\n".join(sorted(fs)).encode()).hexdigest(),
            }
            for p, fs in by_part.items()
        }

    def _checkpointed_scan(
        self,
        model_name: str,
        df: DataFrame,
        exprs: Dict[str, Column],
        ops: Dict[str, str],
        audio_chk: Optional[CompiledCheck],
        partition_col: str,
        drift_jobs: Optional[List[dict]] = None,
        feat_bins: Optional[Dict[str, List[float]]] = None,
        feat_limits: Optional[List[Tuple[str, Optional[float], Optional[float]]]] = None,
        pctl_cols: Optional[List[str]] = None,
        rate_text_col: Optional[str] = None,
    ) -> Tuple[
        List[Dict[str, Any]], List[Dict[str, Any]],
        List[Tuple[Optional[str], str, str]], Dict[str, Dict[int, int]],
        List[Dict[str, Any]], List[Dict[str, Any]],
        Dict[Tuple[str, str], "td_mod.TDigest"],
    ]:
        """Chunked partitioned scan with a resume manifest.

        Partition values are grouped into ``checkpoint_chunks`` groups; each group's
        per-partition metric rows are appended to the manifest as they complete. On
        resume, completed partitions are loaded from the manifest and their groups
        skipped — only remaining partitions are scanned. All shared-scan metrics are
        decomposable (sum/min/max), so merged results are identical to a full run.
        Each partition's capped audio-violation sample (<= violation_cap rows,
        from the same single decode pass as its metrics) is stored in its manifest
        record, so resume reproduces violations without rescanning done partitions.
        Loudness-drift feature histograms (``feat_bins``) are likewise per-partition
        decomposable bin counts: they ride the SAME per-chunk decode pass, persist
        in the manifest, and merge by summation on resume — never a second decode.
        Signal-quality bounds (``feat_limits``) follow the same model: per-partition
        out-of-range counts + capped violation samples persist in each manifest
        record ("audio_quality") and merge by summation / concatenation on resume.
        Each record also carries the partition's input-file LINEAGE (file count
        + md5 signature of the sorted file list); on resume that signature is
        re-probed (column-pruned scan, no payload) and any completed partition
        whose files changed is invalidated and rescanned — a checkpoint can
        never silently serve metrics for data that moved underneath it.
        Percentile t-digests (``pctl_cols``, pctl_mode="sketch") are the mergeable
        quantile state: one column-pruned digest pass per chunk, per-partition
        digests persist as base64 ("pctl_digests") and merge associatively on
        resume — the global quantile never needs a rescan of completed partitions
        (unlike exact GK mode, whose global pass re-reads everything).
        """
        os.makedirs(self.config.checkpoint_dir, exist_ok=True)
        manifest = self._manifest_path(model_name)
        # signature of the check configuration whose per-partition state the
        # manifest records: a record written under a DIFFERENT configuration
        # (metric set, audio rules, percentile mode/columns, drift features)
        # cannot be merged — its missing sidecar state would silently read as
        # zero — so such partitions are invalidated and rescanned on resume
        import hashlib

        state_sig = hashlib.md5(json.dumps({
            # ops covers every merged alias INCLUDING the drift bucket
            # aliases (which join ops but not exprs); the drift/feat entries
            # additionally hash the snapshot CONTENT — a rebuilt snapshot
            # with the same grid size but shifted edges (or reordered
            # categories) must also invalidate, not merge misaligned bins
            "aliases": sorted(ops),
            # the alias alone can't see a SEMANTIC change that keeps the name
            # — e.g. a per-check `filter:` added to a field constraint, or an
            # edited bound — so the expression trees themselves join the
            # signature (their reprs are deterministic unresolved-plan text)
            "exprs": sorted((k, str(v)) for k, v in exprs.items()),
            "audio": audio_chk.key if audio_chk is not None else None,
            "feat_bins": feat_bins or {},
            "feat_limits": feat_limits or [],
            # a changed transcript column changes every rate metric; the
            # manifest's per-partition counts cannot be merged across it
            "rate_text_col": rate_text_col,
            "pctl_cols": pctl_cols or [],
            # sketch configs: manifest HLL sketches of a different lgConfigK
            # would make hll_union_agg throw on resume, and t-digests of a
            # different delta would merge at the wrong compression — both are
            # state-compatibility parameters, so a change invalidates and
            # rescans instead of failing the merged run
            "hll_lgk": self.config.unique_hll_lgk,
            "tdigest_delta": self.config.pctl_tdigest_delta,
            # sampled partitions can never merge with full ones (or with a
            # different fraction/seed's panel); same for a changed dataset
            # filter — a different slice is a different table
            "sample": [self.config.sample_fraction, self.config.sample_seed],
            "dataset_filter": [
                getattr(self.spec.models.get(model_name), "filter", None),
                self.config.model_where.get(model_name),
            ],
            "drift": [
                {"p": j["prefix"], "m": j["method"],
                 "s": {k: j["stats"].get(k) for k in
                       ("bin_edges", "quantiles", "categories", "bin_probs")}}
                for j in (drift_jobs or [])
            ],
        }, sort_keys=True, default=str).encode()).hexdigest()
        done: Dict[str, dict] = {}
        if self.config.resume and os.path.exists(manifest):
            with open(manifest, "r", encoding="utf-8") as f:
                for line in f:
                    rec = json.loads(line)
                    if rec.get("status") == "done":
                        done[str(rec["partition_id"])] = rec
            stale = sorted(
                p for p, rec in done.items()
                if rec.get("state_sig") != state_sig)
            if stale:
                self.run.log_warn(
                    f"checkpoint: {len(stale)} completed partition(s) were "
                    "recorded under a different check configuration — "
                    f"rescanning {stale[:5]}{'...' if len(stale) > 5 else ''}")
                for p in stale:
                    del done[p]
        parts = sorted(
            str(r[0]) for r in df.select(partition_col).distinct().collect()
        )
        if done and self.config.checkpoint_verify_lineage:
            # stale-checkpoint detection: a completed partition whose input
            # file set changed since the manifest was written must NOT serve
            # cached metrics — invalidate it and rescan. The lineage probe
            # reads only the partition column (column-pruned scan, no payload).
            current = self._partition_lineage(df, partition_col, sorted(done))
            for pid in sorted(done):
                rec_lin = done[pid].get("lineage")
                if rec_lin is not None and rec_lin != current.get(pid):
                    self.run.log_warn(
                        f"checkpoint: partition {pid} input files changed since "
                        f"manifest (was {rec_lin}, now {current.get(pid)}) — rescanning")
                    del done[pid]
        todo = [p for p in parts if p not in done]
        chunks: List[List[str]] = []
        k = max(1, self.config.checkpoint_chunks)
        size = max(1, math.ceil(len(todo) / k)) if todo else 1
        for i in range(0, len(todo), size):
            chunks.append(todo[i:i + size])

        agg_list = [v.alias(a) for a, v in exprs.items()]
        a_sums = [F.sum(c).alias(f"__audio__{c}") for c in audio_mod.COMPACT_COUNT_COLS]

        part_rows: List[Dict[str, Any]] = []
        audio_part_rows: List[Dict[str, Any]] = []
        audio_vio_by_part: Dict[str, List[Tuple[Optional[str], str, str]]] = {}
        audio_fhists: Dict[str, Dict[int, int]] = {}
        audio_fq_rows: List[Dict[str, Any]] = []
        audio_fv_rows: List[Dict[str, Any]] = []
        pctl_digests: Dict[Tuple[str, str], td_mod.TDigest] = {}

        def merge_fh(by_feature: Optional[Dict[str, Dict[str, int]]]) -> None:
            for feature, bins in (by_feature or {}).items():
                dst = audio_fhists.setdefault(feature, {})
                for b, c in bins.items():
                    dst[int(b)] = dst.get(int(b), 0) + int(c)

        def merge_fq(pid: str, aq: Optional[Dict[str, Any]]) -> None:
            for li, c in ((aq or {}).get("counts") or {}).items():
                audio_fq_rows.append({"__part": pid, "t": int(li), "c": int(c)})
            for li, vs in ((aq or {}).get("violations") or {}).items():
                for clip_id, obs in vs:
                    audio_fv_rows.append(
                        {"__part": pid, "t": int(li),
                         "clip_id": clip_id, "observed": obs})

        for rec in done.values():
            row = _json_to_metrics(rec["metrics_json"])
            row[partition_col] = rec["partition_id"]
            part_rows.append(row)
            if rec.get("audio_metrics_json"):
                arow = _json_to_metrics(rec["audio_metrics_json"])
                arow["__part"] = rec["partition_id"]
                audio_part_rows.append(arow)
            for v in rec.get("audio_violations") or []:
                audio_vio_by_part.setdefault(str(rec["partition_id"]), []).append(
                    (rec["partition_id"], v[0], v[1]))
            merge_fh(rec.get("audio_feature_hists"))
            merge_fq(str(rec["partition_id"]), rec.get("audio_quality"))
            for col, b64 in (rec.get("pctl_digests") or {}).items():
                pctl_digests[(str(rec["partition_id"]), col)] = (
                    td_mod.TDigest.from_b64(b64))

        self.run.log_info(
            f"checkpoint: {len(done)}/{len(parts)} partitions already complete; "
            f"{len(todo)} to scan in {len(chunks)} chunk(s)"
        )

        for chunk in chunks:
            sub = df.filter(F.col(partition_col).cast("string").isin(chunk))
            rows = [r.asDict() for r in sub.groupBy(partition_col).agg(*agg_list).collect()]
            if drift_jobs:
                self._merge_drift_rows(
                    rows,
                    drift_mod.drift_bucket_rows(sub, drift_jobs, partition_col),
                    drift_jobs, partition_col,
                )
            audio_rows_by_part: Dict[str, dict] = {}
            chunk_vio_by_part: Dict[str, List[Tuple[str, str]]] = {}
            chunk_fh_by_part: Dict[str, Dict[str, Dict[str, int]]] = {}
            chunk_aq_by_part: Dict[str, Dict[str, Any]] = {}
            chunk_lineage = self._partition_lineage(sub, partition_col)
            chunk_digests: Dict[Tuple[str, str], td_mod.TDigest] = {}
            if pctl_cols:
                # mergeable quantile state for this chunk's partitions: one
                # column-pruned digest pass (payload never read)
                chunk_digests = td_mod.collect_digests(
                    sub, pctl_cols, partition_col,
                    self.config.pctl_tdigest_delta)
            if audio_chk is not None or feat_bins or feat_limits:
                from pyspark import StorageLevel

                compact = self._audio_compact(
                    sub, audio_chk, partition_col, feat_bins=feat_bins or None,
                    feat_limits=feat_limits or None, text_col=rate_text_col)
                compact = compact.persist(StorageLevel.MEMORY_AND_DISK)
                try:
                    with self._arrow_batch_conf():
                        if feat_bins:
                            for r in (
                                compact.filter(F.col("row_type") == "fh")
                                .groupBy("__part", "clip_id", "t")
                                .agg(F.sum("hash").alias("c")).collect()
                            ):
                                chunk_fh_by_part.setdefault(str(r["__part"]), {}) \
                                    .setdefault(r["clip_id"], {})[str(r["t"])] = int(r["c"])
                        if feat_limits:
                            for r in self._fq_count_frame(compact).collect():
                                d = chunk_aq_by_part.setdefault(
                                    str(r["__part"]), {"counts": {}, "violations": {}})
                                d["counts"][str(r["t"])] = int(r["c"])
                            if chunk_aq_by_part:
                                for r in self._fv_capped_frame(
                                    compact, per_partition=True
                                ).collect():
                                    d = chunk_aq_by_part.setdefault(
                                        str(r["__part"]), {"counts": {}, "violations": {}})
                                    d["violations"].setdefault(str(r["t"]), []).append(
                                        [r["clip_id"], r["observed"]])
                        if audio_chk is not None:
                            audio_rows_by_part = {
                                str(r["__part"]): r.asDict()
                                for r in compact.filter(F.col("row_type") == "agg")
                                .groupBy("__part").agg(*a_sums).collect()
                            }
                        if any((r.get("__audio__violations") or 0) > 0
                               for r in audio_rows_by_part.values()):
                            # re-cap per partition (per-task caps can sum past it)
                            w = Window.partitionBy("__part").orderBy("clip_id")
                            for r in (
                                compact.filter(F.col("row_type") == "vio")
                                .withColumn("__rn", F.row_number().over(w))
                                .filter(F.col("__rn") <= self.config.violation_cap)
                                .select("__part", "clip_id", "observed").collect()
                            ):
                                chunk_vio_by_part.setdefault(str(r["__part"]), []).append(
                                    (r["clip_id"], r["observed"]))
                finally:
                    compact.unpersist()
            with open(manifest, "a", encoding="utf-8") as f:
                for row in rows:
                    pid = str(row[partition_col])
                    arow = audio_rows_by_part.get(pid)
                    vlist = chunk_vio_by_part.get(pid, [])
                    fh = chunk_fh_by_part.get(pid)
                    aq = chunk_aq_by_part.get(pid)
                    digs = {
                        col: chunk_digests[(pid, col)].to_b64()
                        for col in (pctl_cols or [])
                        if (pid, col) in chunk_digests
                    }
                    f.write(json.dumps({
                        "run_id": self.run.runId,
                        "partition_id": pid,
                        "status": "done",
                        "metrics_json": _metrics_to_json(row, partition_col),
                        "audio_metrics_json": _metrics_to_json(arow, "__part") if arow else None,
                        "audio_violations": vlist or None,
                        "audio_feature_hists": fh or None,
                        "audio_quality": aq or None,
                        "pctl_digests": digs or None,
                        "lineage": chunk_lineage.get(pid),
                        "state_sig": state_sig,
                        "ts": dt.datetime.now(dt.timezone.utc).isoformat(),
                    }) + "\n")
                    part_rows.append(row)
                    if arow:
                        audio_part_rows.append(arow)
                    if vlist:
                        audio_vio_by_part[pid] = [(pid, c, o) for c, o in vlist]
                    merge_fh(fh)
                    merge_fq(pid, aq)
                    for (dpid, col), d in chunk_digests.items():
                        if dpid == pid:
                            pctl_digests[(pid, col)] = d
        # global cap across partitions, deterministic by clip_id
        audio_vio = sorted(
            (v for vs in audio_vio_by_part.values() for v in vs), key=lambda t: t[1]
        )[: self.config.violation_cap]
        # signal-quality violation samples: re-cap globally per rule index,
        # deterministic by clip_id (per-partition caps can sum past the cap)
        fv_by_li: Dict[int, List[Dict[str, Any]]] = {}
        for r in sorted(audio_fv_rows, key=lambda r: (r["t"], r["clip_id"])):
            lst = fv_by_li.setdefault(int(r["t"]), [])
            if len(lst) < self.config.violation_cap:
                lst.append(r)
        audio_fv_rows = [r for li in sorted(fv_by_li) for r in fv_by_li[li]]
        return (part_rows, audio_part_rows, audio_vio, audio_fhists,
                audio_fq_rows, audio_fv_rows, pctl_digests)

    # -- result recording -------------------------------------------------------

    def _record(
        self,
        chk: CompiledCheck,
        metric: Optional[float],
        result: ResultEnum,
        reason: Optional[str],
        row_count: Optional[int],
        partition_id: Optional[str] = None,
        diagnostics: Optional[Dict[str, Any]] = None,
    ) -> None:
        if partition_id is None:
            # global rollup -> a Check on the Run (parity with reference fold)
            self.run.checks.append(Check(
                id=chk.key,
                key=chk.key,
                category=chk.category,
                type=chk.check_type,
                name=chk.name,
                model=chk.model,
                field=chk.field,
                engine="dcspark",
                language="spark",
                implementation=chk.implementation,
                result=result,
                reason=(reason if reason is not None
                        else (f"evaluated on a {self.config.sample_fraction:g} "
                              "deterministic sample (bounds, not certifies)"
                              if self.config.sample_fraction is not None
                              and result == ResultEnum.passed else None)),
                diagnostics=(diagnostics or {})
                | ({"metric": metric} if metric is not None else {})
                | ({"sample_fraction": self.config.sample_fraction}
                   if self.config.sample_fraction is not None else {}),
            ))
            self._metrics[chk.key] = metric
        now = dt.datetime.now(dt.timezone.utc)
        self._results_rows.append({
            "run_id": self.run.runId,
            "partition_id": partition_id,
            "model": chk.model,
            "field": chk.field,
            "check_key": chk.key,
            "check_type": chk.check_type,
            "category": chk.category,
            "engine": "dcspark",
            "result": result.value,
            "metric_value": float(metric) if metric is not None else None,
            "threshold": chk.expected,
            "reason": reason,
            "row_count": int(row_count) if row_count is not None else None,
            "ts_start": self.run.timestampStart,
            "ts_end": now,
        })


class _ConfScope:
    """Temporarily set Spark SQL confs (restored on exit)."""

    def __init__(self, spark: SparkSession, confs: Dict[str, str]):
        self.spark = spark
        self.confs = confs
        self.saved: Dict[str, Optional[str]] = {}

    def __enter__(self):
        for k, v in self.confs.items():
            try:
                self.saved[k] = self.spark.conf.get(k)
            except Exception:
                self.saved[k] = None
            self.spark.conf.set(k, v)
        return self

    def __exit__(self, *exc):
        for k, old in self.saved.items():
            if old is None:
                self.spark.conf.unset(k)
            else:
                self.spark.conf.set(k, old)
        return False


def _metrics_to_json(row: Optional[Dict[str, Any]], partition_col: str) -> str:
    import base64

    out = {}
    for k, v in (row or {}).items():
        if k == partition_col:
            continue
        if isinstance(v, (dt.datetime, dt.date)):
            out[k] = {"__ts__": v.isoformat()}
        elif isinstance(v, (bytes, bytearray)):
            # e.g. the approx-unique HLL sketch: mergeable binary state
            out[k] = {"__b64__": base64.b64encode(bytes(v)).decode("ascii")}
        else:
            out[k] = v
    return json.dumps(out)


def _json_to_metrics(blob: str) -> Dict[str, Any]:
    import base64

    raw = json.loads(blob)
    out: Dict[str, Any] = {}
    for k, v in raw.items():
        if isinstance(v, dict) and "__ts__" in v:
            try:
                out[k] = dt.datetime.fromisoformat(v["__ts__"])
            except ValueError:
                out[k] = None
        elif isinstance(v, dict) and "__b64__" in v:
            out[k] = base64.b64decode(v["__b64__"])
        else:
            out[k] = v
    return out


def validate(
    spark: SparkSession,
    spec: DataContractSpecification,
    tables: Dict[str, DataFrame],
    config: Optional[ValidationConfig] = None,
) -> ValidationResult:
    return Validator(spark, spec, tables, config).validate()
