"""Source/sink adapters: pluggable table backend + results/violations writers.

Parity surface: the reference's source adapters create one queryable view per
model over files / Kafka / a live Spark session
(/root/reference/datacontract/engines/soda/connections/duckdb_connection.py:11-67,
kafka.py:46-73, check_soda_execute.py:77-99). Here every backend yields a Spark
DataFrame per model; the Iceberg backend is primary per the north rule, with a
graceful Parquet-directory fallback when no Iceberg catalog is configured in the
session (no Iceberg runtime jar ships in this sandbox).
"""

from __future__ import annotations

import os
from typing import Dict, Optional

from pyspark.sql import DataFrame, SparkSession

from .spec import DataContractSpecification, Server, to_spark_schema


def _template_path(path: str, model: str) -> str:
    # {model} path templating (parity: duckdb_connection.py:36-37)
    return path.replace("{model}", model)


def load_tables(
    spark: SparkSession,
    spec: DataContractSpecification,
    server_name: Optional[str] = None,
    base_path: Optional[str] = None,
) -> Dict[str, DataFrame]:
    """Load one DataFrame per contract model from the selected server.

    Server selection: named, else first (parity: data_contract_test.py:35-41).
    ``base_path`` overrides the server path (testing convenience).
    """
    server: Optional[Server] = None
    if spec.servers:
        if server_name and server_name in spec.servers:
            server = spec.servers[server_name]
        else:
            server = next(iter(spec.servers.values()))

    stype = (server.type if server else "local") or "local"
    sformat = (server.format if server else None) or "parquet"
    path = base_path or (server.path or server.location if server else None)

    tables: Dict[str, DataFrame] = {}
    for model_name, model in spec.models.items():
        if stype == "iceberg":
            df = _read_iceberg(spark, server, model_name, base_path)
        elif stype == "kafka":
            df = _read_kafka(spark, spec, server, model_name)
        elif stype == "dataframe":
            # pre-registered temp view (parity: check_soda_execute.py dataframe server)
            df = spark.table(model_name)
        else:
            df = _read_files(spark, spec, model_name, sformat, path, server)
        tables[model_name] = df
    return tables


def _read_files(
    spark: SparkSession,
    spec: DataContractSpecification,
    model_name: str,
    sformat: str,
    path: Optional[str],
    server: Optional[Server],
) -> DataFrame:
    model_path = _template_path(path, model_name) if path and "{model}" in path else (
        os.path.join(path, f"{model_name}.{ 'parquet' if sformat=='parquet' else sformat }")
        if path and os.path.isdir(path) else path
    )
    if sformat == "parquet":
        return spark.read.parquet(model_path)
    if sformat == "delta":
        return spark.read.format("delta").load(model_path)
    schema = to_spark_schema(spec.models[model_name])
    if sformat == "json":
        return spark.read.schema(schema).json(model_path)
    if sformat == "csv":
        delimiter = (server.delimiter if server else None) or ","
        return spark.read.schema(schema).option("header", "true").option("sep", delimiter).csv(model_path)
    raise ValueError(f"unsupported format: {sformat}")


def _read_iceberg(
    spark: SparkSession, server: Optional[Server], model_name: str, base_path: Optional[str]
) -> DataFrame:
    """Iceberg catalog table; degrade to a parquet directory with identical API.

    Attempt `spark.read.table(catalog.schema.model)` first; when no Iceberg
    catalog/jar is present (this sandbox), fall back to
    ``{base_path|location}/{model}.parquet`` so tests and the engine see the same
    DataFrame surface either way.
    """
    if server is not None and server.catalog:
        qualified = ".".join(x for x in (server.catalog, server.schema_, model_name) if x)
        try:
            return spark.read.table(qualified)
        except Exception:
            pass  # no Iceberg runtime — fall back to parquet
    root = base_path or (server.location or server.path if server else None)
    if not root:
        raise ValueError(f"no Iceberg catalog and no fallback path for model {model_name}")
    return spark.read.parquet(os.path.join(root, f"{model_name}.parquet"))


def _read_kafka(
    spark: SparkSession, spec: DataContractSpecification, server: Server, model_name: str
) -> DataFrame:
    """Batch-read a topic snapshot earliest->latest and decode JSON payloads with
    the contract schema (parity: engines/soda/connections/kafka.py:46-114; the
    reference also batch-reads, it does not stream)."""
    from pyspark.sql import functions as F

    raw = (
        spark.read.format("kafka")
        .option("kafka.bootstrap.servers", server.path or "localhost:9092")
        .option("subscribe", server.topic or model_name)
        .option("startingOffsets", "earliest")
        .load()
    )
    schema = to_spark_schema(spec.models[model_name])
    return raw.select(
        F.from_json(F.col("value").cast("string"), schema, {"mode": "PERMISSIVE"}).alias("j")
    ).select("j.*")


def write_results(results_df: DataFrame, path: str, fmt: str = "parquet") -> None:
    """Results/violations sink: Iceberg table when the session has a catalog,
    else parquet append (identical schema either way)."""
    if fmt == "iceberg":
        try:
            results_df.writeTo(path).append()
            return
        except Exception:
            pass
    results_df.write.mode("append").parquet(path)
