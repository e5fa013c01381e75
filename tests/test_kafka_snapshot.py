"""Topic-snapshot → validate, end-to-end on RECORDED wire bytes.

The reference runs Kafka under testcontainers
(/root/reference/tests/test_test_kafka.py); no broker exists in this sandbox,
so these tests drive the ENTIRE pipeline downstream of the consumer
connection instead: a parquet segment in Kafka wire shape (the exact columns
spark.read.format("kafka") returns, Confluent framing intact) flows through
server dispatch → decode (JSON and Confluent-Avro) → the full contract
engine, violations included. The one untested element is the broker socket;
README documents the one-line server change that turns the live path on.
"""

import datetime

import pytest

from dcspark import DataContractSpecification, ValidationConfig, validate
from dcspark.io import KAFKA_WIRE_SCHEMA, load_tables, read_kafka_snapshot
from dcspark.run_model import ResultEnum

CONTRACT_TMPL = """
id: kafka-clicks
servers:
  production:
    type: kafka
    topic: clicks
    path: {path}
    format: {fmt}
models:
  clicks:
    fields:
      user_id: {{type: long, required: true, minimum: 0}}
      page: {{type: string, required: true, pattern: '^/'}}
"""


def _wire_rows(payloads, topic="clicks"):
    t0 = datetime.datetime(2026, 1, 1)
    return [
        (None, bytearray(v), topic, 0, i, t0 + datetime.timedelta(seconds=i), 0)
        for i, v in enumerate(payloads)
    ]


def _record_segment(spark, tmp_path, payloads, topic="clicks"):
    seg = str(tmp_path / "segment.parquet")
    spark.createDataFrame(_wire_rows(payloads, topic), KAFKA_WIRE_SCHEMA) \
        .write.mode("overwrite").parquet(seg)
    return seg


def _avro_frame(spec, record):
    from dcspark.avrofile import compile_writer
    from dcspark.export import to_avro_schema

    schema = to_avro_schema("clicks", spec.models["clicks"])
    writer = compile_writer(schema)
    body = bytearray()
    writer(body, record)
    return b"\x00\x00\x00\x00\x2a" + bytes(body)  # magic 0 + registry id 42


def test_recorded_json_topic_validates_green(spark, tmp_path):
    payloads = [b'{"user_id": %d, "page": "/p%d"}' % (i, i) for i in range(20)]
    seg = _record_segment(spark, tmp_path, payloads)
    spec = DataContractSpecification.from_string(
        CONTRACT_TMPL.format(path=seg, fmt="json"))
    tables = load_tables(spark, spec)        # server dispatch, no base_path
    assert tables["clicks"].count() == 20
    res = validate(spark, spec, tables, ValidationConfig())
    assert res.run.result == ResultEnum.passed, [
        (c.key, c.result, c.reason) for c in res.run.checks]


def test_recorded_avro_topic_validates_and_fails_bad_rows(spark, tmp_path):
    """Confluent-Avro wire bytes decode through the pure-Python fallback and
    the contract catches planted violations — the complete reference flow
    (produce avro → consume → validate) minus only the broker."""
    spec = DataContractSpecification.from_string(
        CONTRACT_TMPL.format(path="unused", fmt="avro"))
    good = [_avro_frame(spec, {"user_id": i, "page": f"/p{i}"}) for i in range(10)]
    bad = [_avro_frame(spec, {"user_id": 3, "page": "no-slash"})]  # regex fail
    seg = _record_segment(spark, tmp_path, good + bad)
    spec = DataContractSpecification.from_string(
        CONTRACT_TMPL.format(path=seg, fmt="avro"))
    tables = load_tables(spark, spec)
    res = validate(spark, spec, tables, ValidationConfig())
    by_key = {c.key: c for c in res.run.checks}
    assert by_key["clicks__page__field_regex"].result == ResultEnum.failed
    assert by_key["clicks__user_id__field_required"].result == ResultEnum.passed


def test_snapshot_filters_other_topics(spark, tmp_path):
    """A recorded segment can hold several topics; the reader scopes to the
    server's topic like a live subscribe would."""
    mine = _wire_rows([b'{"user_id": 1, "page": "/a"}'], topic="clicks")
    other = _wire_rows([b'{"user_id": 2, "page": "/b"}'] * 5, topic="noise")
    seg = str(tmp_path / "multi.parquet")
    spark.createDataFrame(mine + other, KAFKA_WIRE_SCHEMA) \
        .write.parquet(seg)
    out = read_kafka_snapshot(spark, seg, topic="clicks")
    assert out.count() == 1


def test_snapshot_rejects_non_wire_parquet(spark, tmp_path):
    p = str(tmp_path / "not_wire.parquet")
    spark.range(3).write.parquet(p)
    with pytest.raises(ValueError, match="wire schema"):
        read_kafka_snapshot(spark, p)


def test_remote_segment_path_routes_to_snapshot_reader(spark, tmp_path):
    """Classification is by path SHAPE, not driver-local existence: a
    slash-bearing path that does not exist on the driver's disk (the remote
    -segment case) must still take the snapshot route — surfacing the
    reader's own path error naming the path — never be misread as a
    bootstrap-server string."""
    missing = str(tmp_path / "no" / "such" / "segment.parquet")
    spec = DataContractSpecification.from_string(
        CONTRACT_TMPL.format(path=missing, fmt="json"))
    with pytest.raises(Exception) as ei:
        load_tables(spark, spec)["clicks"].count()
    msg = str(ei.value)
    assert "segment.parquet" in msg or "PATH_NOT_FOUND" in msg


def test_nonexistent_path_keeps_bootstrap_meaning(spark):
    """A path that is not on the filesystem still means a bootstrap-server
    string (legacy), i.e. the live spark.read.format('kafka') route — which
    without a broker jar/connection raises from the datasource, not from the
    snapshot reader."""
    spec = DataContractSpecification.from_string(
        CONTRACT_TMPL.format(path="broker.internal:9092", fmt="json"))
    with pytest.raises(Exception) as ei:
        load_tables(spark, spec)["clicks"].count()
    assert "wire schema" not in str(ei.value)
