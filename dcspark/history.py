"""Metric history: change-over-time and anomaly checks on validation metrics.

Reference parity note: the reference (datacontract-cli) executes quality rules
through soda-core, whose SodaCL grammar includes change-over-time thresholds
(``change avg last 7 for row_count < 10%``) and ``anomaly score`` checks — but
those need Soda Cloud to store the metric series, so the reference CLI alone
cannot run them. This engine closes that gap with its OWN results table
(engine.RESULTS_DDL, written by ``write_results``): every run appends one row
per check with ``metric_value`` and ``ts_end``, and a ``type: history`` quality
rule reads that series back to judge the CURRENT run against the recent past.

Two methods:

- ``method: change`` — percent change of the current metric vs an aggregate
  (avg/median/min/max/last) of the last ``window`` runs. The classic
  "row_count dropped 40% overnight" tripwire.
- ``method: anomaly`` — a robust z-score of the current metric against the
  window: ``0.6745 * (x - median) / MAD``. Median/MAD instead of mean/stddev so
  one past outlier can't widen the band and hide a real regression (soda's
  anomaly detection motivates the same robustness).

Scale design: the results table for a 10^12-row corpus validated hourly for a
year is ~10^6 runs x ~10^2 checks = 10^8 tiny rows. The engine never collects
that: the per-key window is pruned DISTRIBUTED (row_number over a per-check-key
window, keep <= window rows) and only checks x window values — a few hundred
floats — reach the driver. The same formulas are exposed as a DataFrame
transformation (``series_change_stats``) for corpus-scale series analysis
(e.g. per-month ingest volumes), where the window math stays in JVM higher-
order functions over ``collect_list`` frames: no UDF, no driver loop.

The scalar path (``point_stats``) and the DataFrame path are formula-twins;
``tests/test_history.py`` locks their agreement on random series.
"""

from __future__ import annotations

import math
from typing import Any, Dict, List, Optional, Sequence, Tuple

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

# consistency scale factor: for a normal sample, MAD * 1/0.6745 estimates
# sigma, so 0.6745*(x-med)/MAD is comparable to a classic z-score
MAD_Z = 0.6745

AGGS = ("avg", "median", "min", "max", "last")


# ---------------------------------------------------------------------------
# scalar twin (driver-side, used by the engine on <= window collected values)
# ---------------------------------------------------------------------------

def _median(vals: Sequence[float]) -> float:
    s = sorted(vals)
    n = len(s)
    lo = s[(n - 1) // 2]
    hi = s[n // 2]
    return (lo + hi) / 2.0


def point_stats(
    history: Sequence[float],
    current: float,
    agg: str = "avg",
    method: str = "change",
) -> Tuple[Optional[float], Dict[str, Any]]:
    """Judge ``current`` against ``history`` (oldest -> newest).

    Returns (statistic, diagnostics). The statistic is ``pct_change`` for
    method "change" and the robust z-score for method "anomaly"; None when
    undefined (no history, zero baseline, zero dispersion with a moved value)
    with ``diagnostics["undefined"]`` naming why.
    """
    vals = [float(v) for v in history if v is not None]
    diag: Dict[str, Any] = {"n_history": len(vals), "current": float(current)}
    if not vals:
        diag["undefined"] = "no_history"
        return None, diag
    if method == "anomaly":
        med = _median(vals)
        mad = _median([abs(v - med) for v in vals])
        diag["median"] = med
        diag["mad"] = mad
        if mad == 0.0:
            if current == med:
                return 0.0, diag
            diag["undefined"] = "zero_dispersion"
            return None, diag
        return MAD_Z * (current - med) / mad, diag
    if agg == "avg":
        baseline = math.fsum(vals) / len(vals)
    elif agg == "median":
        baseline = _median(vals)
    elif agg == "min":
        baseline = min(vals)
    elif agg == "max":
        baseline = max(vals)
    elif agg == "last":
        baseline = vals[-1]
    else:
        raise ValueError(f"unknown history agg {agg!r}; expected one of {AGGS}")
    diag["baseline"] = baseline
    if baseline == 0.0:
        diag["undefined"] = "zero_baseline"
        return None, diag
    return (current - baseline) / abs(baseline) * 100.0, diag


# ---------------------------------------------------------------------------
# DataFrame twin (corpus-scale series: JVM window + higher-order functions)
# ---------------------------------------------------------------------------

def _arr_median(arr: Column) -> Column:
    """Interpolated median of an array column (matches DuckDB median on
    doubles and the scalar twin above): average of the two middle elements
    of the sorted array."""
    s = F.array_sort(arr)
    n = F.size(arr)
    lo = F.element_at(s, ((n - 1) / 2).cast("int") + 1)
    hi = F.element_at(s, (n / 2).cast("int") + 1)
    return (lo + hi) / 2.0


def series_change_stats(
    df: DataFrame,
    order_col: str,
    value_col: str,
    window: int = 7,
    agg: str = "avg",
    partition_by: Optional[List[str]] = None,
) -> DataFrame:
    """Append change/anomaly statistics to an ordered metric series.

    For every row, the trailing frame is the ``window`` rows strictly before
    it (``ROWS BETWEEN window PRECEDING AND 1 PRECEDING``) within its
    ``partition_by`` group. Adds:

    - ``n_history``    rows actually in the frame (< window near the start)
    - ``baseline``     the ``agg`` of the frame (avg/median/min/max/last)
    - ``pct_change``   (value - baseline) / |baseline| * 100, NULL if the
                       frame is empty or the baseline is exactly 0
    - ``hist_median`` / ``hist_mad``  robust location/dispersion of the frame
    - ``robust_z``     0.6745 * (value - median) / MAD, NULL if the frame is
                       empty or MAD is 0 while the value moved (0.0 when the
                       value equals the median of a zero-MAD frame)

    Everything is JVM expressions (window aggregates + array higher-order
    functions over one collect_list frame) — no UDF, no driver collection —
    so the same call works on a 10^9-row per-key series table.
    """
    if agg not in AGGS:
        raise ValueError(f"unknown history agg {agg!r}; expected one of {AGGS}")
    pby = partition_by or []
    w = (
        Window.partitionBy(*[F.col(c) for c in pby])
        .orderBy(order_col)
        .rowsBetween(-window, -1)
    )
    v = F.col(value_col).cast("double")
    vals = F.collect_list(v).over(w)
    out = df.withColumn("__vals", vals)
    n = F.size(F.col("__vals"))
    if agg == "avg":
        baseline = F.when(
            n > 0,
            F.aggregate(F.col("__vals"), F.lit(0.0), lambda a, x: a + x) / n,
        )
    elif agg == "median":
        baseline = F.when(n > 0, _arr_median(F.col("__vals")))
    elif agg == "min":
        baseline = F.array_min(F.col("__vals"))
    elif agg == "max":
        baseline = F.array_max(F.col("__vals"))
    else:  # last
        baseline = F.when(n > 0, F.element_at(F.col("__vals"), -1))
    out = out.withColumn("n_history", n).withColumn("baseline", baseline)
    out = out.withColumn(
        "pct_change",
        F.when(
            (F.col("n_history") > 0) & (F.col("baseline") != 0.0),
            (v - F.col("baseline")) / F.abs(F.col("baseline")) * 100.0,
        ),
    )
    med = F.when(n > 0, _arr_median(F.col("__vals")))
    out = out.withColumn("hist_median", med)
    devs = F.transform(F.col("__vals"), lambda x: F.abs(x - F.col("hist_median")))
    out = out.withColumn("hist_mad", F.when(n > 0, _arr_median(devs)))
    out = out.withColumn(
        "robust_z",
        F.when(
            F.col("hist_mad") > 0.0,
            F.lit(MAD_Z) * (v - F.col("hist_median")) / F.col("hist_mad"),
        ).when(
            (F.col("n_history") > 0)
            & (F.col("hist_mad") == 0.0)
            & (v == F.col("hist_median")),
            F.lit(0.0),
        ),
    )
    return out.drop("__vals")


# ---------------------------------------------------------------------------
# history store access (the engine's own results table is the series source)
# ---------------------------------------------------------------------------

def load_history(spark: SparkSession, path: str, fmt: str = "parquet") -> DataFrame:
    """Open a results table written by ``write_results`` (engine.RESULTS_DDL
    schema) as the metric-history source. Formats mirror the sink: parquet
    directory (default), pure-Python Iceberg table, or Delta log."""
    fmt = (fmt or "parquet").lower()
    if fmt == "iceberg":
        from .iceberg import read_iceberg_table

        return read_iceberg_table(spark, path)
    if fmt == "delta":
        from .deltalog import read_delta_table

        return read_delta_table(spark, path)
    return spark.read.parquet(path)


def collect_series(
    history: DataFrame,
    model: str,
    watch_keys: List[str],
    max_window: int,
    exclude_run_id: Optional[str] = None,
) -> Dict[str, List[float]]:
    """Pull the trailing <= max_window metric values for each watched check
    key, oldest -> newest, GLOBAL rollup rows only (partition_id IS NULL).

    The prune is distributed: a per-check-key row_number window keeps the
    newest ``max_window`` rows per key BEFORE anything is collected, so the
    driver sees checks x window floats no matter how many runs the results
    table holds. Ties on ts_end break by run_id so the cut is deterministic.
    """
    f = history.filter(
        F.col("partition_id").isNull()
        & (F.col("model") == model)
        & F.col("check_key").isin(watch_keys)
        & F.col("metric_value").isNotNull()
    )
    if exclude_run_id:
        f = f.filter(F.col("run_id") != exclude_run_id)
    w = Window.partitionBy("check_key").orderBy(
        F.desc("ts_end"), F.desc("run_id")
    )
    rows = (
        f.select("check_key", "ts_end", "run_id", "metric_value")
        .withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= max_window)
        .collect()
    )
    out: Dict[str, List[float]] = {k: [] for k in watch_keys}
    for r in sorted(rows, key=lambda r: (r["check_key"], r["ts_end"], r["run_id"])):
        out[r["check_key"]].append(float(r["metric_value"]))
    return out
