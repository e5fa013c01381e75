"""Metric-history checks: change-over-time + robust anomaly on the engine's
own results table (dcspark/history.py).

Locks (1) the scalar/DataFrame formula twins against each other on random
series, (2) the distributed window prune in collect_series, and (3) the full
engine loop: run -> append results -> rerun with a history rule that judges
the current metric against the stored series.
"""

import math
import random

import pytest
from pyspark.sql import functions as F

from dcspark import DataContractSpecification, ValidationConfig, validate
from dcspark import history as H
from dcspark.compile import create_checks
from dcspark.run_model import ResultEnum

# ---------------------------------------------------------------------------
# scalar twin
# ---------------------------------------------------------------------------


def test_point_stats_change_avg():
    stat, diag = H.point_stats([100.0, 110.0, 90.0], 150.0, agg="avg")
    assert diag["n_history"] == 3 and diag["baseline"] == 100.0
    assert stat == pytest.approx(50.0)


def test_point_stats_change_aggs():
    vals = [10.0, 40.0, 20.0]
    cases = {"median": 20.0, "min": 10.0, "max": 40.0, "last": 20.0}
    for agg, base in cases.items():
        stat, diag = H.point_stats(vals, 30.0, agg=agg)
        assert diag["baseline"] == base
        assert stat == pytest.approx((30.0 - base) / abs(base) * 100.0)


def test_point_stats_undefined_paths():
    stat, diag = H.point_stats([], 5.0)
    assert stat is None and diag["undefined"] == "no_history"
    stat, diag = H.point_stats([0.0, 0.0], 5.0, agg="avg")
    assert stat is None and diag["undefined"] == "zero_baseline"
    # anomaly: zero dispersion, unmoved value -> z == 0; moved -> undefined
    stat, _ = H.point_stats([7.0, 7.0, 7.0], 7.0, method="anomaly")
    assert stat == 0.0
    stat, diag = H.point_stats([7.0, 7.0, 7.0], 8.0, method="anomaly")
    assert stat is None and diag["undefined"] == "zero_dispersion"
    with pytest.raises(ValueError):
        H.point_stats([1.0], 1.0, agg="mode")


def test_point_stats_anomaly_formula():
    vals = [10.0, 12.0, 11.0, 50.0, 13.0]
    med = 12.0
    mad = 1.0  # deviations {2,0,1,38,1} -> median 1
    stat, diag = H.point_stats(vals, 20.0, method="anomaly")
    assert diag["median"] == med and diag["mad"] == mad
    assert stat == pytest.approx(0.6745 * (20.0 - med) / mad)


def test_median_interpolates_even_counts():
    stat, diag = H.point_stats([10.0, 12.0], 11.0, agg="median")
    assert diag["baseline"] == 11.0
    assert stat == pytest.approx(0.0)


# ---------------------------------------------------------------------------
# DataFrame twin == scalar twin (random series, every agg)
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("agg", ["avg", "median", "min", "max", "last"])
def test_series_stats_match_point_stats(spark, agg):
    rng = random.Random(1234)
    vals = [round(rng.uniform(-5, 100), 3) for _ in range(40)]
    window = 7
    df = spark.createDataFrame(
        [(i, v) for i, v in enumerate(vals)], "i int, v double")
    rows = {
        r["i"]: r
        for r in H.series_change_stats(
            df, "i", "v", window=window, agg=agg).collect()
    }
    for i, v in enumerate(vals):
        hist = vals[max(0, i - window):i]
        exp_change, diag = H.point_stats(hist, v, agg=agg, method="change")
        exp_z, zdiag = H.point_stats(hist, v, method="anomaly")
        r = rows[i]
        assert r["n_history"] == len(hist)
        if hist:
            assert r["baseline"] == pytest.approx(diag["baseline"], rel=1e-12)
            assert r["hist_median"] == pytest.approx(zdiag["median"], rel=1e-12)
            assert r["hist_mad"] == pytest.approx(zdiag["mad"], rel=1e-12, abs=1e-12)
        else:
            assert r["baseline"] is None and r["pct_change"] is None
        if exp_change is None:
            assert r["pct_change"] is None
        else:
            assert r["pct_change"] == pytest.approx(exp_change, rel=1e-9)
        if exp_z is None:
            assert r["robust_z"] is None
        else:
            assert r["robust_z"] == pytest.approx(exp_z, rel=1e-9)


def test_series_stats_partitioned(spark):
    # two independent keys must not see each other's history
    rows = [("a", i, float(i)) for i in range(5)] + [("b", i, 100.0) for i in range(5)]
    df = spark.createDataFrame(rows, "k string, i int, v double")
    out = H.series_change_stats(
        df, "i", "v", window=3, agg="avg", partition_by=["k"])
    got = {(r["k"], r["i"]): r for r in out.collect()}
    assert got[("a", 3)]["baseline"] == pytest.approx(1.0)  # avg(0,1,2)
    assert got[("b", 3)]["baseline"] == pytest.approx(100.0)
    assert got[("b", 3)]["pct_change"] == pytest.approx(0.0)


# ---------------------------------------------------------------------------
# collect_series: distributed prune + filters
# ---------------------------------------------------------------------------


def _results_frame(spark, rows):
    from dcspark.engine import RESULTS_DDL

    return spark.createDataFrame(rows, schema=RESULTS_DDL)


def _res_row(run, key, val, ts, partition_id=None, model="m"):
    import datetime as dt

    t = dt.datetime(2026, 1, 1, tzinfo=dt.timezone.utc) + dt.timedelta(hours=ts)
    return {
        "run_id": run, "partition_id": partition_id, "model": model,
        "field": None, "check_key": key, "check_type": "row_count",
        "category": "quality", "engine": "dcspark", "result": "passed",
        "metric_value": float(val), "threshold": None, "reason": None,
        "row_count": None, "ts_start": t, "ts_end": t,
    }


def test_collect_series_prunes_and_filters(spark):
    rows = [_res_row(f"r{i}", "m__row_count", 100 + i, i) for i in range(10)]
    # per-partition rows and other models/keys must be ignored
    rows += [_res_row("r3", "m__row_count", 999, 3, partition_id="p0")]
    rows += [_res_row("r4", "other__row_count", 999, 4, model="other")]
    rows += [_res_row("rX", "m__row_count", 777, 99)]  # current run, excluded
    hist = _results_frame(spark, rows)
    series = H.collect_series(hist, "m", ["m__row_count"], 5, exclude_run_id="rX")
    # newest 5 of r5..r9, ascending
    assert series["m__row_count"] == [105.0, 106.0, 107.0, 108.0, 109.0]


# ---------------------------------------------------------------------------
# compile + engine loop
# ---------------------------------------------------------------------------

CONTRACT = """
id: hist-demo
info: {title: hist, version: 1.0.0}
models:
  m:
    fields:
      v: {type: int, required: true}
    quality:
      - type: history
        watch: row_count
        method: change
        window: 5
        threshold: 20
      - type: history
        watch: row_count
        method: anomaly
        mustBeBetween: [-3.5, 3.5]
"""

CONTRACT_FIELD = """
id: hist-field
info: {title: hist, version: 1.0.0}
models:
  m:
    fields:
      v:
        type: int
        quality:
          - type: history
            watch: field_required
            method: change
            agg: max
            window: 3
            mustBeLessThanOrEqualTo: 0
"""


def test_compile_history_checks():
    spec = DataContractSpecification.from_string(CONTRACT)
    checks = [c for c in create_checks(spec)["m"] if c.kind == "history"]
    assert len(checks) == 2
    chg, anom = checks
    assert chg.params["watch_key"] == "m__row_count"
    assert chg.params["method"] == "change" and chg.params["window"] == 5
    assert chg.check_type == "quality_history"
    assert anom.params["method"] == "anomaly" and anom.params["min_history"] == 3
    # threshold shorthand becomes the symmetric band
    assert "between [-20.0, 20.0]" in chg.expected
    # field-level shorthand resolves against model + field
    fspec = DataContractSpecification.from_string(CONTRACT_FIELD)
    fchk = [c for c in create_checks(fspec)["m"] if c.kind == "history"][0]
    assert fchk.params["watch_key"] == "m__v__field_required"
    assert fchk.field == "v"


def test_compile_history_rejects_bad_method():
    spec = DataContractSpecification.from_string(
        CONTRACT.replace("method: change", "method: trend"))
    with pytest.raises(ValueError):
        create_checks(spec)


def _table(spark, n):
    return spark.range(n).select(F.col("id").cast("int").alias("v"))


def _run(spark, spec, n, history_path, tmpdir, write=True):
    from dcspark.engine import RESULTS_DDL
    from dcspark.io import write_results

    cfg = ValidationConfig(history_path=history_path, parallel_jobs=1)
    res = validate(spark, spec, {"m": _table(spark, n)}, cfg)
    if write:
        rows = spark.createDataFrame(res.results, schema=RESULTS_DDL)
        write_results(rows, history_path)
    return res


def _hist_checks(res):
    return [c for c in res.run.checks if c.type == "quality_history"]


def test_engine_history_loop(spark, tmp_path):
    spec = DataContractSpecification.from_string(CONTRACT)
    hist = str(tmp_path / "results.parquet")

    # first-ever run: no table on disk -> insufficient history, still green
    r1 = _run(spark, spec, 100, hist, tmp_path)
    chg, anom = _hist_checks(r1)
    assert chg.result == ResultEnum.passed and "insufficient history" in chg.reason
    assert r1.run.result == ResultEnum.passed

    # steady state: identical row count -> 0% change, passes; anomaly has
    # zero dispersion with an unmoved value -> z = 0, passes
    for _ in range(3):
        r = _run(spark, spec, 100, hist, tmp_path)
    chg, anom = _hist_checks(r)
    assert chg.result == ResultEnum.passed
    assert chg.diagnostics["metric"] == pytest.approx(0.0)
    assert anom.result == ResultEnum.passed

    # the table halves: -50% change trips the 20% band; anomaly goes
    # undefined (zero dispersion, moved value) -> error result
    r5 = _run(spark, spec, 50, hist, tmp_path, write=False)
    chg, anom = _hist_checks(r5)
    assert chg.result == ResultEnum.failed
    assert chg.diagnostics["metric"] == pytest.approx(-50.0)
    assert anom.result == ResultEnum.error and "zero_dispersion" in anom.reason
    assert r5.run.result == ResultEnum.error


def test_engine_history_window_and_anomaly(spark, tmp_path):
    # noisy-but-stable series, then a spike: change(avg last 5) small,
    # anomaly z large -> the robust rule catches what the band misses
    contract = CONTRACT.replace("threshold: 20", "threshold: 60")
    spec = DataContractSpecification.from_string(contract)
    hist = str(tmp_path / "r.parquet")
    for n in (100, 104, 98, 102, 96, 101):
        r = _run(spark, spec, n, hist, tmp_path)
    spike = _run(spark, spec, 130, hist, tmp_path, write=False)
    chg, anom = _hist_checks(spike)
    assert chg.result == ResultEnum.passed  # ~+29% < 60 band
    assert anom.result == ResultEnum.failed
    assert abs(anom.diagnostics["metric"]) > 3.5
    # the change rule's window=5 trims the 6 stored runs to 5; the anomaly
    # rule kept the default window=7 and sees all 6
    assert chg.diagnostics["n_history"] == 5
    assert anom.diagnostics["n_history"] == 6


def test_engine_history_requires_source(spark):
    spec = DataContractSpecification.from_string(CONTRACT)
    res = validate(spark, spec, {"m": _table(spark, 10)},
                   ValidationConfig(parallel_jobs=1))
    chg, _ = _hist_checks(res)
    assert chg.result == ResultEnum.error and "no history source" in chg.reason


def test_engine_history_bad_watch_key(spark, tmp_path):
    contract = CONTRACT.replace("watch: row_count", "watch: m__nope__field_unique", 1)
    spec = DataContractSpecification.from_string(contract)
    res = _run(spark, spec, 10, str(tmp_path / "h.parquet"), tmp_path, write=False)
    bad = _hist_checks(res)[0]
    assert bad.result == ResultEnum.error and "not computed" in bad.reason


def test_engine_history_corrupt_table_errors(spark, tmp_path):
    """A history table that EXISTS but cannot be read must surface as an
    error result — not the first-run insufficient-history pass, which would
    silently disarm every change/anomaly tripwire on a config typo."""
    spec = DataContractSpecification.from_string(CONTRACT)
    hist = tmp_path / "results.parquet"
    hist.mkdir()
    (hist / "part-00000.parquet").write_bytes(b"this is not parquet")
    res = _run(spark, spec, 100, str(hist), tmp_path, write=False)
    chg, anom = _hist_checks(res)
    assert chg.result == ResultEnum.error
    assert "failed to load" in chg.reason
    assert anom.result == ResultEnum.error
    assert res.run.result == ResultEnum.error


def test_missing_table_error_classifier(tmp_path):
    from dcspark.engine import _missing_table_error

    gone = str(tmp_path / "nope")
    # locally-absent SCHEMELESS path: inconclusive from the driver's disk
    # (may resolve against a remote default FS under spark-submit) — only
    # the reader's own path-not-found error declares bootstrap
    assert _missing_table_error(
        gone, Exception("[PATH_NOT_FOUND] Path does not exist")) is True
    assert _missing_table_error(gone, Exception("connection refused")) is False
    assert _missing_table_error("file://" + gone, Exception("anything")) is True
    here = tmp_path / "t"
    here.mkdir()
    assert _missing_table_error(str(here), Exception("corrupt footer")) is False
    assert _missing_table_error("s3://b/t", FileNotFoundError("x")) is True
    assert _missing_table_error(
        "s3://b/t", Exception("[PATH_NOT_FOUND] Path does not exist")) is True
    assert _missing_table_error("s3://b/t", Exception("corrupt footer")) is False
