"""Schema importers: build a contract from existing data/schemas.

Parity targets (the formats our engine needs of the reference's 14,
SURVEY.md §2.4): a live Spark DataFrame/StructType
(imports/spark_importer.py:33-69), a parquet footer
(imports/parquet_importer.py), and CSV header sniffing
(imports/csv_importer.py:20-25). Importing never starts a Spark job — parquet
uses the pyarrow footer, CSV uses a bounded pandas sniff.
"""

from __future__ import annotations

import os
from typing import Dict, List, Optional

from .spec import (
    DataContractSpecification,
    Field,
    Info,
    Model,
    from_spark_schema,
)


def _base_spec(contract_id: str, title: str) -> DataContractSpecification:
    return DataContractSpecification(
        dataContractSpecification="1.1.0",
        id=contract_id,
        info=Info(title=title, version="0.0.1"),
    )


def import_from_spark(df_or_schema, model_name: str = "imported",
                      contract_id: str = "imported") -> DataContractSpecification:
    """DataFrame or StructType -> contract (parity: spark_importer.py:33-50)."""
    schema = df_or_schema.schema if hasattr(df_or_schema, "schema") else df_or_schema
    spec = _base_spec(contract_id, model_name)
    spec.models[model_name] = from_spark_schema(schema)
    return spec


_ARROW_TO_CONTRACT = {
    "string": "string", "large_string": "string", "utf8": "string",
    "int8": "integer", "int16": "integer", "int32": "integer",
    "int64": "long", "uint32": "long", "uint64": "long",
    "float": "float", "halffloat": "float",
    "double": "double",
    "bool": "boolean",
    "date32[day]": "date", "date64[ms]": "date",
    "binary": "bytes", "large_binary": "bytes",
}


def _arrow_field_to_contract(arrow_type) -> Field:
    import pyarrow as pa

    if pa.types.is_timestamp(arrow_type):
        return Field(type="timestamp" if arrow_type.tz else "timestamp_ntz")
    if pa.types.is_decimal(arrow_type):
        return Field(type="decimal", precision=arrow_type.precision, scale=arrow_type.scale)
    if pa.types.is_list(arrow_type) or pa.types.is_large_list(arrow_type):
        return Field(type="array", items=_arrow_field_to_contract(arrow_type.value_type))
    if pa.types.is_map(arrow_type):
        return Field(
            type="map",
            keys=_arrow_field_to_contract(arrow_type.key_type),
            values=_arrow_field_to_contract(arrow_type.item_type),
        )
    if pa.types.is_struct(arrow_type):
        return Field(type="struct", fields={
            arrow_type.field(i).name: _arrow_field_to_contract(arrow_type.field(i).type)
            for i in range(arrow_type.num_fields)
        })
    return Field(type=_ARROW_TO_CONTRACT.get(str(arrow_type), "bytes"))


def import_from_parquet(path: str, model_name: Optional[str] = None,
                        contract_id: str = "imported") -> DataContractSpecification:
    """Parquet footer -> contract; no data read (parity: parquet_importer.py)."""
    import pyarrow.parquet as pq

    name = model_name or os.path.splitext(os.path.basename(path.rstrip("/")))[0]
    arrow_schema = pq.read_schema(path)
    spec = _base_spec(contract_id, name)
    fields: Dict[str, Field] = {}
    for f in arrow_schema:
        cf = _arrow_field_to_contract(f.type)
        if not f.nullable:
            cf.required = True
        fields[f.name] = cf
    spec.models[name] = Model(type="table", fields=fields)
    return spec


_PANDAS_TO_CONTRACT = {
    "object": "string", "string": "string",
    "int64": "long", "Int64": "long", "int32": "integer", "Int32": "integer",
    "float64": "double", "float32": "float",
    "bool": "boolean", "boolean": "boolean",
    "datetime64[ns]": "timestamp_ntz",
}


def import_from_csv(path: str, model_name: Optional[str] = None,
                    delimiter: str = ",", sniff_rows: int = 1000,
                    contract_id: str = "imported") -> DataContractSpecification:
    """CSV header + bounded type sniff -> contract (parity: csv_importer.py:20-25)."""
    import pandas as pd

    name = model_name or os.path.splitext(os.path.basename(path))[0]
    sample = pd.read_csv(path, sep=delimiter, nrows=sniff_rows)
    spec = _base_spec(contract_id, name)
    fields: Dict[str, Field] = {}
    for col in sample.columns:
        dtype = str(sample[col].dtype)
        ctype = _PANDAS_TO_CONTRACT.get(dtype, "string")
        if ctype == "string" and sample[col].notna().any():
            # try datetime promotion on non-numeric object columns
            try:
                pd.to_datetime(sample[col].dropna().iloc[:50], format="ISO8601")
                ctype = "timestamp_ntz"
            except (ValueError, TypeError):
                pass
        fields[col] = Field(type=ctype)
    spec.models[name] = Model(type="table", fields=fields)
    return spec


_ICEBERG_TO_CONTRACT = {
    "string": "string", "int": "integer", "long": "long",
    "float": "float", "double": "double", "boolean": "boolean",
    "timestamptz": "timestamp", "timestamp": "timestamp_ntz",
    "date": "date", "binary": "bytes", "uuid": "string",
}


def import_from_iceberg(schema_json, model_name: str = "imported",
                        contract_id: str = "imported") -> DataContractSpecification:
    """Iceberg schema JSON (dict or path) -> contract; identifier-field-ids
    become primaryKey (parity: imports/iceberg_importer.py:49-56,126-172)."""
    import json as _json

    if isinstance(schema_json, str):
        with open(schema_json, "r", encoding="utf-8") as f:
            schema_json = _json.load(f)
    spec = _base_spec(contract_id, model_name)
    fields: Dict[str, Field] = {}
    pk: List[str] = []
    ident = set(schema_json.get("identifier-field-ids", []))
    for fdef in schema_json.get("fields", []):
        itype = fdef.get("type")
        if isinstance(itype, str) and itype.startswith("decimal"):
            inner = itype[itype.index("(") + 1:itype.index(")")]
            p, s = [int(x.strip()) for x in inner.split(",")]
            cf = Field(type="decimal", precision=p, scale=s)
        elif isinstance(itype, str):
            cf = Field(type=_ICEBERG_TO_CONTRACT.get(itype, "bytes"))
        else:
            cf = Field(type="bytes")  # nested/struct types: opaque fallback
        if fdef.get("required"):
            cf.required = True
        if fdef.get("id") in ident:
            cf.primaryKey = True
            pk.append(fdef["name"])
        fields[fdef["name"]] = cf
    spec.models[model_name] = Model(type="table", fields=fields, primaryKey=pk)
    return spec


def import_contract(fmt: str, source, **kwargs) -> DataContractSpecification:
    """Factory (parity: imports/importer_factory)."""
    fmt = fmt.lower()
    if fmt == "spark":
        return import_from_spark(source, **kwargs)
    if fmt == "parquet":
        return import_from_parquet(source, **kwargs)
    if fmt == "csv":
        return import_from_csv(source, **kwargs)
    if fmt == "iceberg":
        return import_from_iceberg(source, **kwargs)
    raise ValueError(f"unsupported import format: {fmt}")
