"""Contract-driven PII masking / pseudonymization.

The contract already declares sensitivity per field (``pii: true`` /
``classification:``, cf. the reference's field model at
`/root/reference/datacontract/model/data_contract_specification.py:145-187`
— declared there but never acted on). A training-data pipeline must act on
it before the corpus leaves the governed zone. This module derives a masking
plan from those declarations and applies it as a pure-projection pass:

- ``hash`` (default for strings): salted SHA-256 hex. Deterministic, so the
  pseudonym is STABLE across tables and runs sharing a salt — joins and
  referential-integrity checks on the masked corpus still work, while the
  raw value never leaves the cluster. NULLs stay NULL (missing-count
  semantics survive masking).
- ``null``  (default for every non-string type): redact to NULL of the same
  type — numeric distributions are not preservable under hashing, and a
  typed NULL keeps downstream schemas stable.
- ``keep``: explicit opt-out override.

Everything is ``sha2``/``concat`` JVM expressions inside one
whole-stage-codegen projection: no UDFs, no shuffle, no second scan — at
10^12 rows masking rides any existing write for free.
"""

from __future__ import annotations

from typing import Dict, List, Optional, Tuple

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .spec import DataContractSpecification

#: classification labels treated as sensitive when ``pii`` is not set
SENSITIVE_CLASSIFICATIONS = {"pii", "sensitive", "restricted", "confidential"}

_STRING_TYPES = {"string", "text", "varchar"}


def masking_plan(
    spec: DataContractSpecification,
    model_name: str,
    overrides: Optional[Dict[str, str]] = None,
) -> List[Tuple[str, str]]:
    """[(field, strategy)] for every sensitive top-level field of the model.
    Sensitive = ``pii: true`` or ``classification`` in
    SENSITIVE_CLASSIFICATIONS (case-insensitive). ``overrides`` forces a
    strategy per field ("hash" | "null" | "keep")."""
    model = spec.models.get(model_name)
    if model is None:
        return []
    plan: List[Tuple[str, str]] = []
    for fname, field_ in model.fields.items():
        sensitive = bool(field_.pii) or (
            (field_.classification or "").lower() in SENSITIVE_CLASSIFICATIONS)
        if not sensitive:
            continue
        strategy = (overrides or {}).get(fname)
        if strategy is None:
            strategy = (
                "hash" if (field_.type or "string").lower() in _STRING_TYPES
                else "null")
        if strategy not in ("hash", "null", "keep"):
            raise ValueError(
                f"unknown masking strategy {strategy!r} for field {fname!r} "
                "(expected hash | null | keep)")
        plan.append((fname, strategy))
    return plan


def mask(
    df: DataFrame,
    spec: DataContractSpecification,
    model_name: str,
    salt: Optional[str] = None,
    overrides: Optional[Dict[str, str]] = None,
) -> DataFrame:
    """Masked view of ``df`` per the contract's sensitivity declarations —
    one codegen projection, column order unchanged. ``salt`` scopes the
    pseudonym namespace: the same (value, salt) always maps to the same
    digest, a new salt unlinks every prior pseudonym. Forcing ``hash`` on a
    non-string field via ``overrides`` re-types that column to string.

    ``salt`` is REQUIRED whenever any field uses the ``hash`` strategy:
    an unsalted SHA-256 of low-entropy PII (emails, phone numbers, ids) is
    trivially reversible by dictionary attack, so pseudonyms would give
    linkability but no confidentiality. Pass ``salt=""`` explicitly only if
    you accept that trade-off (e.g. cross-dataset linkage is the goal)."""
    exprs = []
    by_field = dict(masking_plan(spec, model_name, overrides))
    if salt is None and any(s == "hash" for s in by_field.values()):
        raise ValueError(
            "mask() requires an explicit salt when any field uses the 'hash' "
            "strategy: unsalted SHA-256 pseudonyms of guessable values are "
            "dictionary-reversible. Pass a secret salt (e.g. "
            "secrets.token_hex(16)), or salt='' to explicitly accept "
            "linkable-but-not-confidential pseudonyms.")
    salt = salt or ""
    for fname in df.columns:
        strategy = by_field.get(fname)
        if strategy is None or strategy == "keep":
            exprs.append(F.col(fname))
        elif strategy == "hash":
            exprs.append(
                F.when(
                    F.col(fname).isNotNull(),
                    F.sha2(F.concat(F.lit(salt), F.col(fname).cast("string")), 256),
                ).alias(fname))
        else:  # null: typed redaction
            exprs.append(
                F.lit(None).cast(df.schema[fname].dataType).alias(fname))
    return df.select(*exprs)
