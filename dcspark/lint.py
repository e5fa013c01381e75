"""Static contract linters — driver-side checks producing passed/warning Check rows.

Functional parity with the reference's linter framework
(/root/reference/datacontract/lint/lint.py:104-142) and its six shipped linters
(/root/reference/datacontract/lint/linters/*): description presence, field
pattern compiles, field references resolve, notice period is ISO-8601, field
constraints are coherent, quality rules reference schema objects. Pure driver
code — linting never touches data or a Spark session.
"""

from __future__ import annotations

import re
from dataclasses import dataclass
from typing import Callable, List, Optional

from .run_model import Check, ResultEnum, Run
from .spec import DATACONTRACT_TYPES, DataContractSpecification, Field

_NUMERIC_TYPES = {"number", "decimal", "numeric", "int", "integer", "long",
                  "bigint", "float", "double"}
_STRING_TYPES = {"string", "text", "varchar"}


@dataclass
class LintResult:
    name: str
    warnings: List[str]

    @property
    def ok(self) -> bool:
        return not self.warnings


Linter = Callable[[DataContractSpecification], LintResult]


def lint_description(spec: DataContractSpecification) -> LintResult:
    """Models/fields should carry descriptions (reference: description_linter)."""
    warns = []
    if not spec.models:
        warns.append("contract has no models")
    if spec.info is None or not spec.info.description:
        warns.append("contract info has no description")
    for mname, model in spec.models.items():
        if not model.description:
            warns.append(f"model {mname} has no description")
        for fname, f in model.fields.items():
            if not f.description:
                warns.append(f"field {mname}.{fname} has no description")
    return LintResult("description", warns)


def lint_field_pattern(spec: DataContractSpecification) -> LintResult:
    """Every pattern must compile as a regex (reference: field_pattern_linter.py:22-34)."""
    warns = []
    for mname, model in spec.models.items():
        for fname, f in model.fields.items():
            if f.pattern:
                try:
                    re.compile(f.pattern)
                except re.error as e:
                    warns.append(f"field {mname}.{fname} pattern does not compile: {e}")
    return LintResult("field_pattern", warns)


def lint_field_reference(spec: DataContractSpecification) -> LintResult:
    """references must point at an existing model.field
    (reference: field_reference_linter.py:20-40)."""
    warns = []
    for mname, model in spec.models.items():
        for fname, f in model.fields.items():
            if not f.references:
                continue
            parts = f.references.split(".")
            if len(parts) != 2:
                warns.append(
                    f"field {mname}.{fname} references '{f.references}' "
                    "(expected model.field)")
                continue
            pmodel, pfield = parts
            if pmodel not in spec.models:
                warns.append(f"field {mname}.{fname} references unknown model {pmodel}")
            elif pfield not in spec.models[pmodel].fields:
                warns.append(
                    f"field {mname}.{fname} references unknown field {pmodel}.{pfield}")
    return LintResult("field_reference", warns)


def lint_valid_constraints(spec: DataContractSpecification) -> LintResult:
    """Constraint coherence (reference: valid_constraints_linter): type-appropriate
    constraints, non-contradictory bounds."""
    warns = []

    def check_field(mname: str, fname: str, f: Field) -> None:
        ftype = (f.type or "").lower()
        if ftype and ftype not in DATACONTRACT_TYPES:
            warns.append(f"field {mname}.{fname} has unknown type '{ftype}'")
        if f.pattern is not None and ftype and ftype not in _STRING_TYPES:
            warns.append(f"field {mname}.{fname}: pattern on non-string type {ftype}")
        if (f.minLength is not None or f.maxLength is not None) and ftype and ftype not in _STRING_TYPES:
            warns.append(f"field {mname}.{fname}: length bounds on non-string type {ftype}")
        if (f.minimum is not None or f.maximum is not None) and ftype and ftype not in _NUMERIC_TYPES:
            warns.append(f"field {mname}.{fname}: numeric bounds on non-numeric type {ftype}")
        if f.minLength is not None and f.maxLength is not None and f.minLength > f.maxLength:
            warns.append(f"field {mname}.{fname}: minLength > maxLength")
        if f.minimum is not None and f.maximum is not None and f.minimum > f.maximum:
            warns.append(f"field {mname}.{fname}: minimum > maximum")
        if f.exclusiveMinimum is not None and f.exclusiveMaximum is not None \
                and f.exclusiveMinimum >= f.exclusiveMaximum:
            warns.append(f"field {mname}.{fname}: exclusiveMinimum >= exclusiveMaximum")
        if f.enum and f.pattern:
            bad = [v for v in f.enum if isinstance(v, str) and not re.search(f.pattern, v)]
            if bad:
                warns.append(
                    f"field {mname}.{fname}: enum values {bad} do not match pattern")
        for cname, child in f.fields.items():
            check_field(mname, f"{fname}.{cname}", child)

    for mname, model in spec.models.items():
        for fname, f in model.fields.items():
            check_field(mname, fname, f)
    return LintResult("valid_constraints", warns)


def lint_quality_schema(spec: DataContractSpecification) -> LintResult:
    """Quality SQL should reference the model it is attached to
    (reference: quality_schema_linter)."""
    warns = []
    for mname, model in spec.models.items():
        for i, q in enumerate(model.quality):
            if q.type == "sql" and q.query:
                tmpl = "{model}" in q.query or "{table}" in q.query
                if not tmpl and mname not in q.query:
                    warns.append(
                        f"model {mname} quality[{i}] SQL does not reference the model")
            if q.type == "drift" and q.column and q.column not in model.fields:
                warns.append(
                    f"model {mname} quality[{i}] drift column '{q.column}' not in schema")
    return LintResult("quality_schema", warns)


_ISO8601_PERIOD = re.compile(r"^P(\d+Y)?(\d+M)?(\d+W)?(\d+D)?(T(\d+H)?(\d+M)?(\d+S)?)?$")


def lint_notice_period(spec: DataContractSpecification) -> LintResult:
    """terms.noticePeriod must be ISO-8601 (reference: notice_period_linter)."""
    warns = []
    terms = getattr(spec, "terms", None)
    notice = None
    if isinstance(terms, dict):
        notice = terms.get("noticePeriod")
    elif terms is not None:
        notice = getattr(terms, "noticePeriod", None)
    if notice and not _ISO8601_PERIOD.match(str(notice)):
        warns.append(f"terms.noticePeriod '{notice}' is not an ISO-8601 period")
    return LintResult("notice_period", warns)


LINTERS: List[Linter] = [
    lint_description,
    lint_field_pattern,
    lint_field_reference,
    lint_valid_constraints,
    lint_quality_schema,
    lint_notice_period,
]


def lint(spec: DataContractSpecification, linters: Optional[List[Linter]] = None) -> Run:
    """Run linters; each becomes one Check (passed / warning; exceptions → error).

    Fold parity with the reference (lint/lint.py:121-142): linter crashes are
    reported as error checks, never raised.
    """
    run = Run.create_run(
        data_contract_id=spec.id,
        data_contract_version=spec.info.version if spec.info else None,
    )
    for linter in (linters or LINTERS):
        name = getattr(linter, "__name__", "linter").replace("lint_", "")
        try:
            result = linter(spec)
            run.checks.append(Check(
                id=f"lint__{result.name}",
                key=f"lint__{result.name}",
                category="lint",
                type="lint",
                name=f"linter {result.name}",
                engine="dcspark",
                result=ResultEnum.passed if result.ok else ResultEnum.warning,
                reason="; ".join(result.warnings) or None,
            ))
        except Exception as e:  # parity: lint.py:121-136
            run.checks.append(Check(
                id=f"lint__{name}", key=f"lint__{name}", category="lint", type="lint",
                name=f"linter {name}", engine="dcspark",
                result=ResultEnum.error, reason=f"linter crashed: {e}",
            ))
    run.finish()
    return run
