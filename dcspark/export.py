"""Contract exporters: spark / jsonschema / sodacl-style checks / iceberg.

Parity targets (the four formats our engine needs of the reference's 26,
SURVEY.md §2.4): spark StructType + DDL (export/spark_converter.py), JSON
Schema draft-07 (export/jsonschema_converter.py:34-157), the compiled-check
document (our analog of export/sodacl_converter.py:15-30 — what
`datacontract export --format sodacl` shows, here the Spark check plan), and
an Iceberg schema JSON (export/iceberg_converter.py). All pure driver code.
"""

from __future__ import annotations

import json
from typing import Any, Dict, Optional

from .compile import create_checks
from .spec import DataContractSpecification, Field, Model, to_spark_schema

# ---------------------------------------------------------------------------
# spark
# ---------------------------------------------------------------------------

def to_spark_ddl(spec: DataContractSpecification) -> str:
    """One `CREATE TABLE`-style DDL block per model (simpleString types)."""
    blocks = []
    for mname, model in spec.models.items():
        schema = to_spark_schema(model)
        cols = ",\n".join(
            f"  {f.name} {f.dataType.simpleString()}"
            + ("" if f.nullable else " NOT NULL")
            for f in schema.fields
        )
        blocks.append(f"CREATE TABLE {mname} (\n{cols}\n)")
    return "\n\n".join(blocks)


def to_spark_dict(spec: DataContractSpecification) -> Dict[str, Any]:
    """model -> StructType JSON (round-trippable via StructType.fromJson)."""
    return {mname: to_spark_schema(m).jsonValue() for mname, m in spec.models.items()}


# ---------------------------------------------------------------------------
# jsonschema (draft-07; parity: export/jsonschema_converter.py:34-128)
# ---------------------------------------------------------------------------

_JSON_TYPES = {
    "string": "string", "text": "string", "varchar": "string",
    "number": "number", "decimal": "number", "numeric": "number",
    "float": "number", "double": "number",
    "int": "integer", "integer": "integer", "long": "integer", "bigint": "integer",
    "boolean": "boolean",
    "timestamp": "string", "timestamp_tz": "string", "timestamp_ntz": "string",
    "date": "string",
    "bytes": "string",
    "array": "array",
    "object": "object", "record": "object", "struct": "object",
    "null": "null",
}

_JSON_FORMATS = {"timestamp": "date-time", "timestamp_tz": "date-time",
                 "timestamp_ntz": "date-time", "date": "date"}


def _field_to_jsonschema(field: Field) -> Dict[str, Any]:
    ftype = (field.type or "").lower()
    out: Dict[str, Any] = {}
    jtype = _JSON_TYPES.get(ftype)
    if jtype:
        # nullable union unless required (jsonschema_converter.py:40-47)
        out["type"] = jtype if field.required else [jtype, "null"]
    if ftype in _JSON_FORMATS:
        out["format"] = _JSON_FORMATS[ftype]
    if field.format in ("uuid", "email", "uri"):
        out["format"] = field.format
    if field.pattern:
        out["pattern"] = field.pattern
    if field.enum:
        out["enum"] = field.enum
    if field.minLength is not None:
        out["minLength"] = field.minLength
    if field.maxLength is not None:
        out["maxLength"] = field.maxLength
    if field.minimum is not None:
        out["minimum"] = field.minimum
    if field.maximum is not None:
        out["maximum"] = field.maximum
    if field.exclusiveMinimum is not None:
        out["exclusiveMinimum"] = field.exclusiveMinimum
    if field.exclusiveMaximum is not None:
        out["exclusiveMaximum"] = field.exclusiveMaximum
    if ftype == "array" and field.items is not None:
        out["items"] = _field_to_jsonschema(field.items)
    if ftype in ("object", "record", "struct") and field.fields:
        out["properties"] = {n: _field_to_jsonschema(f) for n, f in field.fields.items()}
        req = [n for n, f in field.fields.items() if f.required]
        if req:
            out["required"] = req
    if field.description:
        out["description"] = field.description
    return out


def to_jsonschema(model: Model) -> Dict[str, Any]:
    """Model -> JSON Schema draft-07 (parity: to_jsonschema, :145-157)."""
    properties = {n: _field_to_jsonschema(f) for n, f in model.fields.items()}
    required = [n for n, f in model.fields.items() if f.required]
    schema: Dict[str, Any] = {
        "$schema": "http://json-schema.org/draft-07/schema#",
        "type": "object",
        "properties": properties,
    }
    if required:
        schema["required"] = required
    return schema


def to_jsonschema_all(spec: DataContractSpecification) -> Dict[str, Any]:
    return {mname: to_jsonschema(m) for mname, m in spec.models.items()}


# ---------------------------------------------------------------------------
# compiled checks (our sodacl analog — the executable plan as a document)
# ---------------------------------------------------------------------------

def to_checks_dict(spec: DataContractSpecification,
                   server_format: Optional[str] = None) -> Dict[str, Any]:
    """The full compiled check plan as a plain dict (golden-testable; analog of
    the reference's merged SodaCL doc, export/sodacl_converter.py:15-30)."""
    out: Dict[str, Any] = {}
    for mname, checks in create_checks(spec, server_format).items():
        out[mname] = [
            {
                "key": c.key,
                "type": c.check_type,
                "category": c.category,
                "field": c.field,
                "kind": c.kind,
                "implementation": c.implementation,
            }
            for c in checks
        ]
    return out


# ---------------------------------------------------------------------------
# iceberg schema (parity: export/iceberg_converter.py)
# ---------------------------------------------------------------------------

_ICEBERG_TYPES = {
    "string": "string", "text": "string", "varchar": "string",
    "int": "int", "integer": "int",
    "long": "long", "bigint": "long",
    "float": "float", "double": "double",
    "boolean": "boolean",
    "timestamp": "timestamptz", "timestamp_tz": "timestamptz",
    "timestamp_ntz": "timestamp",
    "date": "date",
    "bytes": "binary",
}


def to_iceberg_schema(model: Model) -> Dict[str, Any]:
    """Model -> Iceberg schema JSON (identifier-field-ids from primaryKey,
    parity: export/iceberg_converter.py:83-92)."""
    fields = []
    identifier_ids = []
    next_id = 1
    for name, f in model.fields.items():
        ftype = (f.type or "string").lower()
        if ftype in ("number", "decimal", "numeric"):
            itype: Any = f"decimal({f.precision or 38}, {f.scale or 0})"
        else:
            itype = _ICEBERG_TYPES.get(ftype, "binary")
        fields.append({
            "id": next_id,
            "name": name,
            "required": bool(f.required),
            "type": itype,
        })
        if f.primaryKey or name in (model.primaryKey or []):
            identifier_ids.append(next_id)
        next_id += 1
    out: Dict[str, Any] = {"type": "struct", "schema-id": 0, "fields": fields}
    if identifier_ids:
        out["identifier-field-ids"] = identifier_ids
    return out


# ---------------------------------------------------------------------------
# factory (parity: export/exporter_factory.py)
# ---------------------------------------------------------------------------

def export(spec: DataContractSpecification, fmt: str,
           model: Optional[str] = None) -> str:
    fmt = fmt.lower()
    if fmt == "spark":
        return to_spark_ddl(spec)
    if fmt == "spark-json":
        return json.dumps(to_spark_dict(spec), indent=2)
    if fmt == "jsonschema":
        if model:
            return json.dumps(to_jsonschema(spec.models[model]), indent=2)
        return json.dumps(to_jsonschema_all(spec), indent=2)
    if fmt in ("checks", "sodacl"):
        return json.dumps(to_checks_dict(spec), indent=2)
    if fmt == "iceberg":
        target = spec.models[model] if model else next(iter(spec.models.values()))
        return json.dumps(to_iceberg_schema(target), indent=2)
    raise ValueError(f"unsupported export format: {fmt}")
