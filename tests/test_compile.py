"""Check compiler: inventory, key scheme, thresholds, fold — no Spark jobs."""

from dcspark.compile import create_checks, to_threshold_evaluator
from dcspark.run_model import ResultEnum, fold_results
from dcspark.spec import DataContractSpecification, Quality


def _checks_by_type(checks):
    out = {}
    for c in checks:
        out.setdefault(c.check_type, []).append(c)
    return out


def test_inventory_for_canonical_audio_contract():
    spec = DataContractSpecification.from_file("/root/repo/contracts/audio_clips.yaml")
    by_model = create_checks(spec)
    audio = _checks_by_type(by_model["audio_clips"])
    assert len(audio["field_is_present"]) == 6
    assert len(audio["field_type"]) == 6
    assert len(audio["field_required"]) == 6
    assert len(audio["field_unique"]) == 1
    assert len(audio["field_enum"]) == 2          # sr_hz + codec
    assert len(audio["field_regex"]) == 1
    assert len(audio["field_minimum"]) == 1 and len(audio["field_maximum"]) == 1
    assert len(audio["field_min_length"]) == 1 and len(audio["field_max_length"]) == 1
    assert len(audio["field_reference"]) == 1
    assert len(audio["drift_ks"]) == 1 and len(audio["drift_psi"]) == 1
    assert len(audio["audio_decode_conformance"]) == 1
    assert len(audio["audio_signal_quality"]) == 2  # rms floor + speech_ratio
    assert len(audio["audio_speaking_rate"]) == 1
    assert len(audio["transcript_equality"]) == 1
    assert len(audio["quality_sql"]) == 1
    ref = _checks_by_type(by_model["transcripts_ref"])
    assert len(ref["field_unique"]) == 1


def test_key_scheme():
    spec = DataContractSpecification.from_string(
        "models:\n  m:\n    fields:\n      f: {type: int, required: true}\n"
    )
    checks = create_checks(spec)["m"]
    keys = {c.key for c in checks}
    # key scheme parity: data_contract_checks.py:106
    assert "m__f__field_required" in keys
    assert "m__f__field_is_present" in keys


def test_exclusive_min_emits_two_checks():
    # parity: data_contract_checks.py:48-53
    spec = DataContractSpecification.from_string(
        "models:\n  m:\n    fields:\n      f: {type: int, exclusiveMinimum: 5}\n"
    )
    types = [c.check_type for c in create_checks(spec)["m"]]
    assert "field_minimum" in types and "field_not_equal" in types


def test_threshold_family():
    # parity: to_sodacl_threshold, data_contract_checks.py:517-544
    cases = [
        (Quality(mustBe=5), 5, ResultEnum.passed), (Quality(mustBe=5), 6, ResultEnum.failed),
        (Quality(mustNotBe=5), 6, ResultEnum.passed), (Quality(mustNotBe=5), 5, ResultEnum.failed),
        (Quality(mustBeGreaterThan=5), 6, ResultEnum.passed), (Quality(mustBeGreaterThan=5), 5, ResultEnum.failed),
        (Quality(mustBeGreaterThanOrEqualTo=5), 5, ResultEnum.passed),
        (Quality(mustBeLessThan=5), 4, ResultEnum.passed), (Quality(mustBeLessThan=5), 5, ResultEnum.failed),
        (Quality(mustBeLessThanOrEqualTo=5), 5, ResultEnum.passed),
        (Quality(mustBeBetween=[1, 5]), 3, ResultEnum.passed), (Quality(mustBeBetween=[1, 5]), 6, ResultEnum.failed),
        (Quality(mustNotBeBetween=[1, 5]), 6, ResultEnum.passed), (Quality(mustNotBeBetween=[1, 5]), 3, ResultEnum.failed),
    ]
    for q, metric, expected in cases:
        ev, _ = to_threshold_evaluator(q, "t")
        result, _ = ev(metric, {})
        assert result == expected, f"{q} with {metric}"


def test_worst_result_wins_fold():
    # parity: model/run.py:65-75
    R = ResultEnum
    assert fold_results([R.passed, R.passed]) == R.passed
    assert fold_results([R.passed, R.warning]) == R.warning
    assert fold_results([R.warning, R.failed, R.passed]) == R.failed
    assert fold_results([R.failed, R.error]) == R.error
    assert fold_results([]) == R.unknown
    assert fold_results([None, R.passed]) == R.passed
