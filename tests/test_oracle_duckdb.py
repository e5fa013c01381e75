"""Generic-check metric parity vs DuckDB on driver-provided testdata (sf0.001
here for speed; the driver's own harness runs sf0.01 via __spark_entry__)."""

import duckdb
import pytest

from dcspark import DataContractSpecification, ValidationConfig, validate

SF = "/root/testdata/sf0.001"

CONTRACT = """
id: tpch-checks
models:
  lineitem:
    fields:
      l_orderkey: {type: long, required: true, references: orders.o_orderkey}
      l_quantity: {type: double, minimum: 1, maximum: 50}
      l_returnflag: {type: string, enum: ["A", "N", "R"]}
      l_discount: {type: double, minimum: 0, maximum: 0.1}
  orders:
    fields:
      o_orderkey: {type: long, required: true, unique: true}
      o_orderstatus: {type: string, enum: ["F", "O", "P"]}
  customer:
    fields:
      c_custkey: {type: long, required: true, unique: true}
      c_name: {type: string, pattern: "^Customer#[0-9]{9}$"}
      c_acctbal: {type: double}
"""


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in ("lineitem", "orders", "customer"):
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF}/{t}.parquet')")
    return con


@pytest.fixture(scope="module")
def result(spark):
    spec = DataContractSpecification.from_string(CONTRACT)
    tables = {
        t: spark.read.parquet(f"{SF}/{t}.parquet") for t in ("lineitem", "orders", "customer")
    }
    return validate(spark, spec, tables, ValidationConfig())


def _metric(result, key):
    return result.metrics[key]


def test_null_counts_match(duck, result):
    expected = duck.execute(
        "SELECT count(*) - count(l_orderkey) FROM lineitem").fetchone()[0]
    assert _metric(result, "lineitem__l_orderkey__field_required") == float(expected)


def test_range_violations_match(duck, result):
    low = duck.execute(
        "SELECT count(*) FROM lineitem WHERE l_quantity IS NOT NULL AND l_quantity < 1").fetchone()[0]
    high = duck.execute(
        "SELECT count(*) FROM lineitem WHERE l_quantity IS NOT NULL AND l_quantity > 50").fetchone()[0]
    assert _metric(result, "lineitem__l_quantity__field_minimum") == float(low)
    assert _metric(result, "lineitem__l_quantity__field_maximum") == float(high)


def test_enum_violations_match(duck, result):
    exp = duck.execute(
        "SELECT count(*) FROM lineitem WHERE l_returnflag IS NOT NULL "
        "AND l_returnflag NOT IN ('A','N','R')").fetchone()[0]
    assert _metric(result, "lineitem__l_returnflag__field_enum") == float(exp)
    exp_o = duck.execute(
        "SELECT count(*) FROM orders WHERE o_orderstatus IS NOT NULL "
        "AND o_orderstatus NOT IN ('F','O','P')").fetchone()[0]
    assert _metric(result, "orders__o_orderstatus__field_enum") == float(exp_o)


def test_duplicate_count_matches(duck, result):
    exp = duck.execute(
        "SELECT count(*) FROM (SELECT o_orderkey FROM orders WHERE o_orderkey IS NOT NULL "
        "GROUP BY 1 HAVING count(*) > 1)").fetchone()[0]
    assert _metric(result, "orders__o_orderkey__field_unique") == float(exp)


def test_regex_violations_match(duck, result):
    exp = duck.execute(
        "SELECT count(*) FROM customer WHERE c_name IS NOT NULL "
        "AND NOT regexp_matches(c_name, '^Customer#[0-9]{9}$')").fetchone()[0]
    assert _metric(result, "customer__c_name__field_regex") == float(exp)


def test_referential_orphans_match(duck, result):
    exp = duck.execute(
        "SELECT count(*) FROM lineitem l WHERE l.l_orderkey IS NOT NULL AND NOT EXISTS "
        "(SELECT 1 FROM orders o WHERE o.o_orderkey = l.l_orderkey)").fetchone()[0]
    assert _metric(result, "lineitem__l_orderkey__field_reference") == float(exp)
