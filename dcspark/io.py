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
        elif stype in JDBC_SERVER_TYPES:
            df = _read_jdbc(spark, spec, server, model_name)
        elif stype == "bigquery":
            df = _read_bigquery(spark, spec, server, model_name)
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
    if sformat == "orc":
        # beyond-reference format (the reference's server.format stops at
        # delta); ORC ships in Spark core, with the same pushdown/pruning
        # behavior as parquet, so warehouse-side ORC lakes validate natively
        return spark.read.orc(model_path)
    if sformat == "delta":
        try:
            return spark.read.format("delta").load(model_path)
        except Exception:
            # no delta-spark jar: the pure-Python protocol reader
            # (dcspark/deltalog.py) replays _delta_log directly
            from .deltalog import DeltaTable

            t = DeltaTable(model_path)
            if t.exists():
                return t.read(spark)
            raise
    if sformat == "avro":
        # prefer the JVM datasource when the external spark-avro module is
        # deployed; otherwise the in-repo pure-Python OCF reader (conformance
        # -tested vs the Java avro library) keeps the format first-class
        try:
            return spark.read.format("avro").load(model_path)
        except Exception as e:
            if "Failed to find data source" not in str(e):
                raise
        from .avrofile import read_avro

        return read_avro(spark, model_path)
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
            pass  # no Iceberg runtime — try the pure-Python format reader
    root = base_path or (server.location or server.path if server else None)
    if not root:
        raise ValueError(f"no Iceberg catalog and no fallback path for model {model_name}")
    # real Iceberg metadata tree (dcspark/iceberg.py implements the spec's
    # v2 format: manifest-list/manifest Avro, snapshots, positional deletes)
    for candidate in (os.path.join(root, model_name), root):
        if os.path.isdir(os.path.join(candidate, "metadata")):
            from .iceberg import IcebergTable

            t = IcebergTable(candidate)
            if t.exists():
                return t.read(spark)
    return spark.read.parquet(os.path.join(root, f"{model_name}.parquet"))


# generic JDBC warehouse servers, one spark.read.jdbc code path
# (parity: engines/soda/connections/{postgres,mysql,sqlserver,trino}.py —
# the reference opens one soda connection per type; Spark's JDBC source gives
# all of them column pruning + filter pushdown into the warehouse for free)
JDBC_SERVER_TYPES = ("postgres", "postgresql", "mysql", "sqlserver", "oracle",
                     "trino", "snowflake", "databricks", "jdbc")

_JDBC_DEFAULTS = {
    "postgres": ("org.postgresql.Driver", "postgresql", 5432),
    "postgresql": ("org.postgresql.Driver", "postgresql", 5432),
    "mysql": ("com.mysql.cj.jdbc.Driver", "mysql", 3306),
    "sqlserver": ("com.microsoft.sqlserver.jdbc.SQLServerDriver", "sqlserver", 1433),
    "oracle": ("oracle.jdbc.OracleDriver", "oracle", 1521),
    "trino": ("io.trino.jdbc.TrinoDriver", "trino", 8080),
    "snowflake": ("net.snowflake.client.jdbc.SnowflakeDriver", "snowflake", 443),
    "databricks": ("com.databricks.client.jdbc.Driver", "databricks", 443),
}


def jdbc_options(server: Server, model_name: str) -> Dict[str, str]:
    """JDBC url/driver/dbtable/credentials for a warehouse server.

    Credentials come from the environment — DATACONTRACT_<TYPE>_USERNAME /
    DATACONTRACT_<TYPE>_PASSWORD — matching the reference's convention
    (engines/soda/connections/postgres.py:13-14). The JDBC driver jar must be
    on the Spark classpath (``spark.jars`` / ``--packages``); none ships in
    this sandbox, so the connect path is exercised by gated integration tests
    only, while this option builder is unit-tested.
    """
    stype = (server.type or "jdbc").lower()
    driver, scheme, default_port = _JDBC_DEFAULTS.get(stype, (None, stype, None))
    host = server.host or "localhost"
    port = server.port or default_port
    if server.path and server.path.startswith("jdbc:"):
        url = server.path  # explicit JDBC url wins (type: jdbc)
    elif stype == "sqlserver":
        url = f"jdbc:sqlserver://{host}:{port};databaseName={server.database or ''}"
    elif stype == "snowflake":
        # account host form (parity: soda snowflake connection's account field)
        sf_host = server.host or (f"{server.account}.snowflakecomputing.com" if server.account else host)
        url = f"jdbc:snowflake://{sf_host}/?db={server.database or ''}" + (
            f"&schema={server.schema_}" if server.schema_ else "")
    elif stype == "databricks":
        http_path = getattr(server, "http_path", None) or (server.model_extra or {}).get("http_path", "")
        url = f"jdbc:databricks://{host}:{port};httpPath={http_path}"
    else:
        url = f"jdbc:{scheme}://{host}:{port}/{server.database or ''}"
    dbtable = f"{server.schema_}.{model_name}" if server.schema_ else model_name
    env_key = stype.upper()
    out = {"url": url, "dbtable": dbtable}
    if server.driver or driver:
        out["driver"] = server.driver or driver
    user = os.environ.get(f"DATACONTRACT_{env_key}_USERNAME")
    password = os.environ.get(f"DATACONTRACT_{env_key}_PASSWORD")
    if user:
        out["user"] = user
    if password:
        out["password"] = password
    if stype == "snowflake":
        # parity: connections/snowflake.py:7-9 — every DATACONTRACT_SNOWFLAKE_*
        # env var passes through (lower-cased) as a connection parameter, which
        # is how the reference carries key-pair auth (private_key_file /
        # private_key_file_pwd), warehouse, role, authenticator, etc. The
        # Snowflake JDBC driver accepts the same lower-case property names.
        prefix = "DATACONTRACT_SNOWFLAKE_"
        for k, v in os.environ.items():
            if not k.startswith(prefix):
                continue
            name = k[len(prefix):].lower()
            if name in ("username", "password"):
                continue  # already mapped to user/password above
            out.setdefault(name, v)
    elif stype == "databricks":
        # parity: connections/databricks.py:7-15 — personal-access-token auth;
        # host and http_path fall back to the reference's env vars. The
        # Databricks JDBC driver's token form is AuthMech=3 + UID 'token'.
        token = os.environ.get("DATACONTRACT_DATABRICKS_TOKEN")
        if token:
            out["AuthMech"] = "3"
            out["UID"] = "token"
            out["PWD"] = token
            out.pop("user", None)
            out.pop("password", None)
    return out


def bigquery_options(server: Server, model_name: str) -> Dict[str, str]:
    """Options for the spark-bigquery-connector (format ``bigquery``).

    Auth parity with the reference (connections/bigquery.py:10-16): a service
    -account JSON keyfile from DATACONTRACT_BIGQUERY_ACCOUNT_INFO_JSON_PATH,
    falling back to GOOGLE_APPLICATION_CREDENTIALS; project/dataset come from
    the server declaration. The connector reads over the BigQuery Storage API
    with column pruning + filter pushdown, so the contract's projection
    reaches BigQuery itself — the right shape at warehouse scale. The
    connector jar is not in this sandbox, so the builder is unit-tested and
    the connect path is exercised only when the jar is deployed."""
    creds = os.environ.get("DATACONTRACT_BIGQUERY_ACCOUNT_INFO_JSON_PATH") or \
        os.environ.get("GOOGLE_APPLICATION_CREDENTIALS")
    table = ".".join(x for x in (server.project, server.dataset, model_name) if x)
    out = {"table": table}
    if server.project:
        out["parentProject"] = server.project
    if creds:
        out["credentialsFile"] = creds
    return out


def _read_bigquery(
    spark: SparkSession, spec: DataContractSpecification, server: Server, model_name: str
) -> DataFrame:
    opts = bigquery_options(server, model_name)
    df = spark.read.format("bigquery").options(**opts).load()
    cols = [c for c in spec.models[model_name].fields if c in df.columns]
    return df.select(*cols) if cols else df


def _read_jdbc(
    spark: SparkSession, spec: DataContractSpecification, server: Server, model_name: str
) -> DataFrame:
    """Read a warehouse table over JDBC, projected to the contract's columns.

    The column list is pushed into the JDBC scan (JDBCRelation prunes columns
    and pushes filters into the generated SELECT), so the warehouse only ships
    the contract's fields — at warehouse scale the projection matters more
    than anything Spark does afterwards.
    """
    opts = jdbc_options(server, model_name)
    df = spark.read.format("jdbc").options(**opts).load()
    # warehouses that fold unquoted identifiers to upper case (Oracle, Derby,
    # Snowflake) return USER_ID for a contract field user_id: match
    # case-insensitively and alias back to the contract's spelling so every
    # downstream check sees contract-cased columns
    from pyspark.sql import functions as F

    by_fold = {c.lower(): c for c in df.columns}
    contract_cols = [
        F.col(by_fold[name.lower()]).alias(name)
        for name in spec.models[model_name].fields
        if name.lower() in by_fold
    ]
    return df.select(*contract_cols) if contract_cols else df


def strip_confluent_header(value_col: str = "value"):
    """Drop the 5-byte Confluent wire-format prefix (magic byte + 4-byte
    schema-registry id) from a Kafka value column, leaving the raw Avro body
    (parity: engines/soda/connections/kafka.py:92 — substring(value, 6, ...))."""
    from pyspark.sql import functions as F

    return F.expr(f"substring({value_col}, 6, length({value_col})-5)")


def decode_kafka_value(
    df: DataFrame, spec: DataContractSpecification, model_name: str, fmt: str = "json"
) -> DataFrame:
    """Decode a Kafka batch frame's ``value`` column with the contract schema.

    json: from_json with the contract's Spark schema (PERMISSIVE).
    avro: strip the Confluent 5-byte header, then ``from_avro`` against the
    contract's Avro schema (requires the spark-avro package on the classpath —
    parity: kafka.py:76-95). Split from ``_read_kafka`` so the decode logic is
    testable without a broker.
    """
    from pyspark.sql import functions as F

    if fmt == "avro":
        import json as _json

        from .export import to_avro_schema

        schema_dict = to_avro_schema(model_name, spec.models[model_name])
        try:
            # JVM path when the external spark-avro module is deployed.
            # The missing-jar failure is the specific AVRO_NOT_LOADED
            # analysis error (raised when the plan is analyzed, not when the
            # expression is built) — only that error falls through to the
            # fallback, so jar-present analysis errors still surface.
            from pyspark.sql.avro.functions import from_avro

            decoded = from_avro(strip_confluent_header(),
                                _json.dumps(schema_dict),
                                {"mode": "PERMISSIVE"})
            return df.select(decoded.alias("a")).select("a.*")
        except Exception as e:
            if "AVRO_NOT_LOADED" not in str(e) and not isinstance(e, ImportError):
                raise
        # no spark-avro jar on the classpath: the pure-Python spec decoder
        # (dcspark/avrofile.py, conformance-tested against the Java avro
        # library) runs in an Arrow-batched pass instead
        from .avrofile import decode_confluent_avro

        return decode_confluent_avro(df, schema_dict)
    schema = to_spark_schema(spec.models[model_name])
    return df.select(
        F.from_json(F.col("value").cast("string"), schema, {"mode": "PERMISSIVE"}).alias("j")
    ).select("j.*")


#: the exact frame schema spark.read.format("kafka") yields — recorded topic
#: segments are parquet files of this shape, so everything downstream of the
#: broker connection (decode, contract checks, violations) is identical in
#: recorded and live mode
KAFKA_WIRE_SCHEMA = ("key binary, value binary, topic string, partition int, "
                     "offset long, timestamp timestamp, timestampType int")


def read_kafka_snapshot(spark: SparkSession, path: str,
                        topic: Optional[str] = None) -> DataFrame:
    """Read a RECORDED topic segment (parquet in Kafka wire shape — the
    columns ``spark.read.format("kafka")`` returns, binary key/value with the
    Confluent framing intact). Produces the same DataFrame a live broker
    batch-read yields, so the decode+validate pipeline runs end-to-end
    without a broker; the only live-only element is the consumer connection
    itself."""
    from pyspark.sql import functions as F

    df = spark.read.parquet(path)
    if "value" not in df.columns:
        raise ValueError(
            f"{path} is not a recorded Kafka segment (no 'value' column); "
            f"expected wire schema: {KAFKA_WIRE_SCHEMA}")
    if topic and "topic" in df.columns:
        df = df.filter(F.col("topic") == topic)
    return df


def _read_kafka(
    spark: SparkSession, spec: DataContractSpecification, server: Server, model_name: str
) -> DataFrame:
    """Batch-read a topic snapshot earliest->latest and decode JSON or
    Confluent-Avro payloads with the contract schema (parity:
    engines/soda/connections/kafka.py:46-114; the reference also batch-reads,
    it does not stream).

    Two sources for the wire frame, identical downstream: a live broker
    (``host: broker:9092``), or a RECORDED segment when ``path:`` is a
    filesystem path (any scheme — file/hdfs/s3a/..., or anything containing
    a ``/``) to parquet in Kafka wire shape — the no-broker e2e path for
    tests, replay, and air-gapped validation. Classification is by SHAPE,
    not driver-local existence (a remote segment path must not silently
    fall through to the broker route): only a scheme-less, slash-less
    ``host:port[,host:port...]`` string keeps the legacy bootstrap-server
    meaning. A missing segment surfaces as the reader's own
    path-not-found error, which names the path."""
    snap = server.path or server.location
    looks_like_path = bool(snap) and (
        "/" in snap or "://" in snap or os.path.exists(snap))
    if looks_like_path:
        raw = read_kafka_snapshot(spark, snap, topic=server.topic or model_name)
    else:
        raw = (
            spark.read.format("kafka")
            .option("kafka.bootstrap.servers", server.host or server.path or "localhost:9092")
            .option("subscribe", server.topic or model_name)
            .option("startingOffsets", "earliest")
            .load()
        )
    return decode_kafka_value(raw, spec, model_name, (server.format or "json").lower())


def write_results(results_df: DataFrame, path: str, fmt: str = "parquet") -> None:
    """Results/violations sink: Iceberg table when the session has a catalog,
    else parquet append (identical schema either way)."""
    if fmt == "iceberg":
        try:
            results_df.writeTo(path).append()
            return
        except Exception:
            pass
        if os.sep in path or "/" in path:
            # no catalog: the pure-Python Iceberg writer commits a real
            # snapshot (metadata + manifests) at the filesystem location
            from .iceberg import write_results_iceberg

            write_results_iceberg(results_df, path)
            return
    results_df.write.mode("append").parquet(path)
