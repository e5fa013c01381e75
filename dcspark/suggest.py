"""Contract bootstrapping: suggest a data contract FROM the data.

The reference's importers map *schemas* into contracts; nothing in it
derives *constraints*. This module closes the cold-start gap: point it at a
table and it drafts a contract whose constraint set the observed data
already satisfies — required flags, uniqueness, enum domains, numeric
ranges, string length bounds, and uuid/email/uri formats — ready to be
hand-tightened and then enforced by the engine.

Execution shape (scale-first):
1. the existing one-scan profiler (``dcspark/profile.py``: count/null/HLL
   distinct/min/max per column in a single multi-aggregate pass);
2. ONE follow-up aggregate pass, pruned to the string columns, that collects
   enum candidate values (``collect_set`` only where the HLL estimate is
   already small), min/max lengths, and format-violation counts — so a
   100 TB table is scanned exactly twice regardless of column count.

Every suggested constraint is conservative: it holds for 100% of the
observed rows (enums come from the exact distinct set, not the sketch), so
``validate(data, suggest_contract(data))`` passes by construction — the
self-consistency property locked in tests/test_suggest.py.
"""

from __future__ import annotations

from typing import Any, Dict, List, Optional

import yaml

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from .compile import FORMAT_REGEX
from .spec import from_spark_schema

ENUM_MAX = 12          # suggest enum only for small, stable-looking domains
ENUM_SLACK = 4         # HLL overshoot allowance before the exact pass
UNIQUE_RATIO = 0.98    # HLL estimate / non-null count to nominate uniqueness


def suggest_model(df: DataFrame, model_name: str = "model") -> Dict[str, Any]:
    """Constraint-annotated model dict (data-contract ``models.<name>``
    shape) derived from two scans of ``df``."""
    from .profile import profile_model

    spark = df.sparkSession
    prof = {
        r["column"]: r.asDict()
        for r in profile_model(spark, df, model_name).collect()
    }

    # follow-up pass: exact enum sets for small-domain strings, length
    # bounds, format-violation counts, and EXACT distinct counts for
    # uniqueness nominees (the HLL estimate nominates; the exact count
    # confirms — a falsely-suggested unique would break the suggested
    # contract's holds-on-this-data guarantee). One aggregate, pruned scan.
    string_cols = [
        f.name for f in df.schema.fields if isinstance(f.dataType, T.StringType)]
    enum_candidates = [
        c for c in string_cols
        if (prof[c]["approx_distinct"] or 0) <= ENUM_MAX + ENUM_SLACK]
    unique_nominees = [
        f.name for f in df.schema.fields
        if not isinstance(f.dataType, (T.ArrayType, T.MapType, T.StructType,
                                       T.BinaryType))
        and (prof[f.name]["row_count"] - prof[f.name]["null_count"]) > 0
        and (prof[f.name]["approx_distinct"] or 0) >= UNIQUE_RATIO * (
            prof[f.name]["row_count"] - prof[f.name]["null_count"])]
    aggs = [
        F.count_distinct(F.col(c)).alias(f"{c}__exact_distinct")
        for c in unique_nominees
    ]
    for c in string_cols:
        aggs.append(F.min(F.length(F.col(c))).alias(f"{c}__len_min"))
        aggs.append(F.max(F.length(F.col(c))).alias(f"{c}__len_max"))
        for fmt, rx in FORMAT_REGEX.items():
            aggs.append(
                F.coalesce(
                    F.sum(F.when(
                        F.col(c).isNotNull() & ~F.col(c).rlike(rx), 1
                    ).otherwise(0)), F.lit(0)
                ).alias(f"{c}__bad_{fmt}"))
    for c in enum_candidates:
        aggs.append(F.collect_set(F.col(c)).alias(f"{c}__values"))
    follow_cols = list(dict.fromkeys(string_cols + unique_nominees))
    follow = (
        df.select(*follow_cols).agg(*aggs).first().asDict() if aggs else {})

    base = from_spark_schema(df.schema)
    model = {"type": "table", "fields": {}}
    pk_assigned = False
    for f in df.schema.fields:
        name = f.name
        p = prof[name]
        fd: Dict[str, Any] = {"type": base.fields[name].type}
        nonnull = p["row_count"] - p["null_count"]
        if p["row_count"] > 0 and p["null_count"] == 0:
            fd["required"] = True
        unique = bool(
            name in unique_nominees
            and follow.get(f"{name}__exact_distinct") == nonnull)
        if unique:
            fd["unique"] = True
            if (not pk_assigned and fd.get("required")
                    and name.lower().endswith("id")):
                fd["primaryKey"] = True
                pk_assigned = True
        if isinstance(f.dataType, T.NumericType) and nonnull > 0:
            lo, hi = p["min"], p["max"]
            # keep integral bounds as ints: float() rounds past 2^53 (a
            # snowflake-style long id's min could round UP and exclude the
            # observed minimum, breaking the validate(data, suggest(data))
            # self-consistency guarantee)
            integral = isinstance(f.dataType, T.IntegralType)
            if lo is not None:
                fd["minimum"] = int(lo) if integral else float(lo)
            if hi is not None:
                fd["maximum"] = int(hi) if integral else float(hi)
        if isinstance(f.dataType, T.StringType) and nonnull > 0:
            lmin = follow.get(f"{name}__len_min")
            lmax = follow.get(f"{name}__len_max")
            if lmin is not None:
                fd["minLength"] = int(lmin)
            if lmax is not None:
                fd["maxLength"] = int(lmax)
            for fmt in FORMAT_REGEX:
                if follow.get(f"{name}__bad_{fmt}") == 0:
                    fd["format"] = fmt
                    break
            values = follow.get(f"{name}__values")
            if (not unique and values is not None
                    and 0 < len(values) <= ENUM_MAX):
                fd["enum"] = sorted(values)
        model["fields"][name] = fd

    # audio-table shape (BASELINE.json input_hint): when the payload columns
    # are present, draft the decode-conformance rule (headers must match the
    # decoded PCM) and a permissive silence floor — the two payload checks a
    # clip corpus always wants; thresholds are starting points to tighten
    names = set(model["fields"])
    if {"bytes", "sr_hz", "dur_ms", "codec"} <= names:
        model["quality"] = [
            {"type": "audio", "invariant": "decode-conformance", "snr_db": 30},
            {"type": "audio", "invariant": "signal-quality",
             "column": "rms_dbfs", "minimum": -80.0},
        ]
    elif "bytes" in names and ({"fps", "n_frames"} & names):
        # video-table shape (fps / frame-count columns are the tell — must
        # be tested BEFORE the image branch, since video tables also carry
        # width/height): draft the video decode-conformance rule over every
        # declared stream-header column present
        q = {"type": "video", "invariant": "decode-conformance",
             "column": "bytes"}
        for key, col in (("fps", "fps"), ("frames", "n_frames"),
                         ("width", "width"), ("height", "height")):
            if col in names:
                q[f"{key}_column"] = col
        model["quality"] = [q]
    elif "bytes" in names and {"width", "height"} <= names:
        # image-table shape: payload plus declared dimensions -> draft the
        # image decode-conformance rule (every payload must decode and match
        # its declared dims)
        model["quality"] = [
            {"type": "image", "invariant": "decode-conformance",
             "column": "bytes", "width_column": "width",
             "height_column": "height"},
        ]
    return model


def suggest_contract(
    tables: Dict[str, DataFrame],
    contract_id: str = "suggested",
) -> str:
    """Draft data-contract YAML for a set of model frames — parseable by
    ``DataContractSpecification.from_string`` and enforceable as-is."""
    doc = {
        "dataContractSpecification": "1.1.0",
        "id": contract_id,
        "info": {
            "title": f"Suggested contract ({', '.join(sorted(tables))})",
            "version": "0.0.1",
            "description": (
                "Drafted by dcspark.suggest from observed data: every "
                "constraint holds for 100% of the profiled rows. Review and "
                "tighten before certification."),
        },
        "models": {
            name: suggest_model(df, name) for name, df in sorted(tables.items())
        },
    }
    return yaml.safe_dump(doc, sort_keys=False, default_flow_style=False)
