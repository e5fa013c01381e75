"""Column profiling: every per-column statistic in ONE multi-aggregate scan.

The north-star execution shape (BASELINE.json): count / null-count / min /
max / approx-distinct via HyperLogLog (``hll_sketch_agg``) / approx quantiles
via Spark's ``percentile_approx`` sketch — all folded into a single aggregate
per model, so profiling a 100 TB table costs exactly one scan and one
singleton Exchange of a few hundred sketch bytes per column. No reference
counterpart (datacontract-cli has no profiler); the shape mirrors the shared
metric scan in ``engine.py``.
"""

from __future__ import annotations

from typing import Any, Dict, List, Optional, Sequence

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

PROFILE_DDL = (
    "model string, column string, dtype string, row_count bigint, "
    "null_count bigint, approx_distinct bigint, min string, max string, "
    "mean double, stddev double, p25 double, p50 double, p75 double, "
    "p95 double, p99 double, avg_length double"
)

_QUANTILES = [0.25, 0.50, 0.75, 0.95, 0.99]


def _is_numeric(dtype: T.DataType) -> bool:
    return isinstance(dtype, T.NumericType)


def _is_orderable(dtype: T.DataType) -> bool:
    return isinstance(
        dtype,
        (T.NumericType, T.StringType, T.DateType, T.TimestampType, T.TimestampNTZType,
         T.BooleanType),
    )


def profile_exprs(
    schema: T.StructType,
    columns: Optional[Sequence[str]] = None,
    accuracy: int = 10000,
    hll_lgk: int = 14,
) -> Dict[str, Column]:
    """Aggregate expressions for one profiling pass, alias -> Column."""
    exprs: Dict[str, Column] = {"__row_count": F.count(F.lit(1))}
    for f in schema.fields:
        if columns is not None and f.name not in columns:
            continue
        c = F.col(f.name)
        name = f.name
        exprs[f"{name}__nulls"] = F.coalesce(
            F.sum(F.when(c.isNull(), 1).otherwise(0)), F.lit(0))
        if isinstance(f.dataType, T.BinaryType):
            # large payload cells: sketch a 64-bit hash, never a string copy
            exprs[f"{name}__distinct"] = F.hll_sketch_estimate(
                F.hll_sketch_agg(F.xxhash64(c), F.lit(hll_lgk)))
        elif not isinstance(f.dataType, (T.MapType, T.ArrayType, T.StructType)):
            exprs[f"{name}__distinct"] = F.hll_sketch_estimate(
                F.hll_sketch_agg(c.cast("string"), F.lit(hll_lgk)))
        if _is_orderable(f.dataType):
            exprs[f"{name}__min"] = F.min(c)
            exprs[f"{name}__max"] = F.max(c)
        if _is_numeric(f.dataType):
            exprs[f"{name}__mean"] = F.avg(c)
            exprs[f"{name}__stddev"] = F.stddev(c)
            exprs[f"{name}__quants"] = F.percentile_approx(c, _QUANTILES, accuracy)
        if isinstance(f.dataType, T.StringType):
            exprs[f"{name}__avg_len"] = F.avg(F.length(c))
        if isinstance(f.dataType, (T.ArrayType, T.MapType)):
            exprs[f"{name}__avg_len"] = F.avg(F.size(c))
    return exprs


def profile_model(
    spark: SparkSession,
    df: DataFrame,
    model_name: str,
    columns: Optional[Sequence[str]] = None,
    accuracy: int = 10000,
    hll_lgk: int = 14,
) -> DataFrame:
    """Profile a model's columns in one scan -> one row per column."""
    exprs = profile_exprs(df.schema, columns, accuracy, hll_lgk)
    row = df.agg(*[v.alias(k) for k, v in exprs.items()]).first().asDict()
    out: List[Dict[str, Any]] = []
    for f in df.schema.fields:
        if columns is not None and f.name not in columns:
            continue
        name = f.name
        quants = row.get(f"{name}__quants") or [None] * len(_QUANTILES)
        distinct = row.get(f"{name}__distinct")
        rec = {
            "model": model_name,
            "column": name,
            "dtype": f.dataType.simpleString(),
            "row_count": int(row["__row_count"] or 0),
            "null_count": int(row.get(f"{name}__nulls") or 0),
            "approx_distinct": int(round(distinct)) if distinct is not None else None,
            "min": _s(row.get(f"{name}__min")),
            "max": _s(row.get(f"{name}__max")),
            "mean": _f(row.get(f"{name}__mean")),
            "stddev": _f(row.get(f"{name}__stddev")),
            "avg_length": _f(row.get(f"{name}__avg_len")),
        }
        for q, v in zip(_QUANTILES, quants):
            rec[f"p{int(q * 100)}"] = _f(v)
        out.append(rec)
    ordered = [
        tuple(rec[k] for k in ("model", "column", "dtype", "row_count", "null_count",
                               "approx_distinct", "min", "max", "mean", "stddev",
                               "p25", "p50", "p75", "p95", "p99", "avg_length"))
        for rec in out
    ]
    return spark.createDataFrame(ordered, PROFILE_DDL)


def profile_tables(
    spark: SparkSession,
    tables: Dict[str, DataFrame],
    columns: Optional[Sequence[str]] = None,
    accuracy: int = 10000,
    hll_lgk: int = 14,
) -> DataFrame:
    """Profile several models (one scan per model) -> unioned stats frame."""
    frames = [
        profile_model(spark, df, name, columns, accuracy, hll_lgk)
        for name, df in tables.items()
    ]
    out = frames[0]
    for fr in frames[1:]:
        out = out.unionByName(fr)
    return out


def _s(v: Any) -> Optional[str]:
    return None if v is None else str(v)


def _f(v: Any) -> Optional[float]:
    return None if v is None else float(v)
