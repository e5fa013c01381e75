"""dcspark — a PySpark-native data-contract validation engine.

Rebuilds the capabilities of datacontract-cli (reference at /root/reference,
v0.10.23) as an idiomatic Spark DataFrame pipeline: contract YAML -> compiled
checks -> one shared multi-aggregate scan + dedicated shuffle jobs -> per-check
pass/fail Run + per-partition results + violation rows, resumable from a
checkpoint manifest. See SURVEY.md for the full design rationale.
"""

from .spec import (
    DataContractSpecification,
    Field,
    Model,
    Quality,
    Server,
    to_spark_data_type,
    to_spark_schema,
    from_spark_schema,
)
from .run_model import Check, ResultEnum, Run, fold_results
from .compile import CompiledCheck, create_checks, period_to_seconds
from .engine import ValidationConfig, ValidationResult, Validator, validate
from .lint import lint
from .breaking import breaking, changelog
from .export import export
from .imports import import_contract
from .profile import profile_model, profile_tables
from .publish import publish_run
from .reconcile import ReconcileResult, reconcile

__version__ = "0.2.0"

__all__ = [
    "DataContractSpecification", "Field", "Model", "Quality", "Server",
    "to_spark_data_type", "to_spark_schema", "from_spark_schema",
    "Check", "ResultEnum", "Run", "fold_results",
    "CompiledCheck", "create_checks", "period_to_seconds",
    "ValidationConfig", "ValidationResult", "Validator", "validate",
    "lint", "breaking", "changelog", "export", "import_contract",
    "profile_model", "profile_tables", "publish_run",
    "ReconcileResult", "reconcile",
]
