"""Contract bootstrapping (dcspark/suggest.py): derived constraints, exact
uniqueness confirmation, and the self-consistency guarantee — the suggested
contract VALIDATES on the data it was drafted from."""

import uuid

import pytest
from pyspark.sql import functions as F

from dcspark import DataContractSpecification, ValidationConfig, validate
from dcspark.run_model import ResultEnum
from dcspark.suggest import suggest_contract, suggest_model

ROWS = [
    # user_id (unique, required, id-suffixed), email (format), status (enum),
    # score (range), note (nullable), near_id (distinct-1: NOT unique)
    (f"{uuid.UUID(int=i)}", f"u{i}@example.com",
     ["active", "idle", "banned"][i % 3], float(10 + i), "n" if i % 2 else None,
     min(i, 48))
    for i in range(50)
]
SCHEMA = ("user_id string, email string, status string, score double, "
          "note string, near_id int")


@pytest.fixture(scope="module")
def users(spark):
    df = spark.createDataFrame(ROWS, SCHEMA).persist()
    df.count()
    return df


def test_suggested_constraints(users):
    m = suggest_model(users, "users")
    f = m["fields"]
    assert f["user_id"]["required"] and f["user_id"]["unique"]
    assert f["user_id"]["primaryKey"] is True
    assert f["user_id"]["format"] == "uuid"
    assert f["email"]["format"] == "email"
    assert f["email"]["unique"] is True
    assert f["status"]["enum"] == ["active", "banned", "idle"]
    assert "unique" not in f["status"]
    assert f["score"]["minimum"] == 10.0 and f["score"]["maximum"] == 59.0
    assert "required" not in f["note"]          # has NULLs
    assert "enum" not in f["email"]             # 50 distinct > ENUM_MAX
    # 49 distinct of 50 rows: HLL nominates, exact count must REJECT unique
    assert "unique" not in f["near_id"]
    assert f["near_id"]["minimum"] == 0.0 and f["near_id"]["maximum"] == 48.0
    assert f["note"]["minLength"] == 1 and f["note"]["maxLength"] == 1


def test_self_consistency_suggested_contract_validates(spark, users):
    text = suggest_contract({"users": users}, contract_id="boot")
    spec = DataContractSpecification.from_string(text)
    res = validate(spark, spec, {"users": users}, ValidationConfig())
    bad = [c.key for c in res.run.checks if c.result not in
           (ResultEnum.passed, ResultEnum.info)]
    assert res.run.result == ResultEnum.passed, bad


def test_cli_suggest_bare_parquet_dir(spark, users, tmp_path):
    from dcspark.cli import main

    base = str(tmp_path / "in")
    users.write.parquet(f"{base}/users.parquet")
    out = str(tmp_path / "draft.yaml")
    rc = main(["suggest", "--path", base, "--output", out,
               "--master", "local[2]", "--id", "boot"])
    assert rc == 0
    spec = DataContractSpecification.from_string(open(out).read())
    assert spec.id == "boot"
    assert spec.models["users"].fields["status"].enum == ["active", "banned", "idle"]


def test_audio_shape_gets_payload_rules(spark):
    """A table matching the audio input shape is drafted with the
    decode-conformance and silence-floor rules; the suggested contract still
    validates on the clean synthetic clips (self-consistency incl. the
    payload checks)."""
    from dcspark import synth

    clips = synth.generate_audio_table(spark, 40, seed=5, dur_lo=200,
                                       dur_hi=600, num_partitions=4)
    text = suggest_contract({"clips": clips}, contract_id="audio-boot")
    spec = DataContractSpecification.from_string(text)
    kinds = [(q.type, q.invariant) for q in spec.models["clips"].quality]
    assert ("audio", "decode-conformance") in kinds
    assert ("audio", "signal-quality") in kinds
    res = validate(spark, spec, {"clips": clips}, ValidationConfig())
    assert res.run.result == ResultEnum.passed, [
        c.key for c in res.run.checks if c.result != ResultEnum.passed]


def test_long_bounds_stay_exact_integers(spark):
    """Review finding: float() rounds past 2^53 — a snowflake-style long
    id's suggested minimum could exceed the observed minimum, breaking the
    validate(data, suggest(data)) self-consistency guarantee."""
    from dcspark import suggest as suggest_mod

    from dcspark.spec import DataContractSpecification

    lo, hi = 4611686018427387903, 4611686018427387905  # straddle 2^62
    df = spark.createDataFrame([(lo,), (hi,)], "big_id long")
    spec = DataContractSpecification.from_string(
        suggest_mod.suggest_contract({"m": df}))
    fd = spec.models["m"].fields["big_id"]
    assert int(fd.minimum) == lo
    assert int(fd.maximum) == hi
