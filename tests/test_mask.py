"""Contract-driven PII masking (dcspark/mask.py): plan derivation from
pii/classification, hash/null/keep semantics, join-stable pseudonyms,
single-projection plan gate, CLI command."""

import pytest
from pyspark.sql import functions as F

from dcspark import DataContractSpecification
from dcspark import mask as mask_mod

CONTRACT = """
id: mask-test
models:
  users:
    fields:
      user_id: {type: string, primaryKey: true}
      email: {type: string, pii: true}
      name: {type: string, classification: Restricted}
      age: {type: integer, pii: true}
      note: {type: string, classification: public}
  events:
    fields:
      event_id: {type: string, primaryKey: true}
      email: {type: string, pii: true}
"""

ROWS = [("u1", "a@x.io", "Ann", 30, "hi"),
        ("u2", None, "Bob", None, "yo"),
        ("u3", "c@x.io", None, 44, None)]
SCHEMA = "user_id string, email string, name string, age int, note string"


@pytest.fixture(scope="module")
def spec():
    return DataContractSpecification.from_string(CONTRACT)


def test_plan_derivation(spec):
    plan = dict(mask_mod.masking_plan(spec, "users"))
    assert plan == {"email": "hash", "name": "hash", "age": "null"}
    plan2 = dict(mask_mod.masking_plan(
        spec, "users", overrides={"age": "hash", "name": "keep"}))
    assert plan2 == {"email": "hash", "name": "keep", "age": "hash"}
    with pytest.raises(ValueError, match="masking strategy"):
        mask_mod.masking_plan(spec, "users", overrides={"email": "rot13"})
    assert mask_mod.masking_plan(spec, "nope") == []


def test_mask_semantics(spark, spec):
    df = spark.createDataFrame(ROWS, SCHEMA)
    m = mask_mod.mask(df, spec, "users", salt="s1")
    assert m.columns == df.columns
    rows = {r["user_id"]: r for r in m.collect()}
    # hashed strings are 64-hex digests; NULLs stay NULL
    assert len(rows["u1"]["email"]) == 64 and rows["u1"]["email"] != "a@x.io"
    assert rows["u2"]["email"] is None
    assert rows["u3"]["name"] is None
    # typed null redaction for non-strings
    assert all(r["age"] is None for r in rows.values())
    assert dict(m.dtypes)["age"] == "int"
    # non-sensitive columns untouched
    assert rows["u1"]["note"] == "hi" and rows["u1"]["user_id"] == "u1"


def test_pseudonyms_join_stable_across_tables_and_salts(spark, spec):
    users = spark.createDataFrame(ROWS, SCHEMA)
    events = spark.createDataFrame(
        [("e1", "a@x.io"), ("e2", "c@x.io"), ("e3", "z@x.io")],
        "event_id string, email string")
    mu = mask_mod.mask(users, spec, "users", salt="s1")
    me = mask_mod.mask(events, spec, "events", salt="s1")
    joined = me.join(mu, "email")
    assert sorted(r["event_id"] for r in joined.collect()) == ["e1", "e2"]
    # a different salt unlinks every pseudonym
    me2 = mask_mod.mask(events, spec, "events", salt="s2")
    assert me2.join(mu, "email").count() == 0


def test_mask_is_single_codegen_projection(spark, spec):
    df = spark.createDataFrame(ROWS, SCHEMA)
    m = mask_mod.mask(df, spec, "users", salt="s1")
    m.collect()
    plan = m._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert "*(1) Project" in plan  # one whole-stage-codegen projection


def test_cli_mask_command(spark, spec, tmp_path):
    from dcspark.cli import main

    base = str(tmp_path / "in")
    spark.createDataFrame(ROWS, SCHEMA).write.parquet(f"{base}/users.parquet")
    spark.createDataFrame([("e1", "a@x.io")], "event_id string, email string") \
        .write.parquet(f"{base}/events.parquet")
    cpath = str(tmp_path / "c.yaml")
    with open(cpath, "w") as f:
        f.write(CONTRACT)
    out = str(tmp_path / "out")
    rc = main(["mask", cpath, "--path", base, "--salt", "s1",
               "--output", out, "--master", "local[2]"])
    assert rc == 0
    got = spark.read.parquet(f"{out}/users")
    assert got.filter(F.col("email").rlike("^[0-9a-f]{64}$")).count() == 2


def test_mask_requires_explicit_salt_for_hash(spark, spec):
    """ADVICE r02 #1: unsalted SHA-256 of low-entropy PII is
    dictionary-reversible, so the hash strategy demands an explicit salt."""
    df = spark.createDataFrame(ROWS, SCHEMA)
    with pytest.raises(ValueError, match="explicit salt"):
        mask_mod.mask(df, spec, "users")
    # salt='' is accepted when passed explicitly (caller owns the trade-off)
    assert mask_mod.mask(df, spec, "users", salt="").count() == 3
    # null-only plans need no salt
    plan_null = {"email": "null", "name": "null", "age": "null"}
    assert mask_mod.mask(df, spec, "users", overrides=plan_null).count() == 3
