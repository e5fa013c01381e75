"""Breaking-change detection between two contract versions.

Functional parity with the reference's rule-driven diff
(/root/reference/datacontract/breaking/breaking.py — dynamic rule name
``{entity}_{prop}_{added|removed|updated}`` looked up in a severity table,
breaking/breaking_rules.py:4-130). Severities: error (breaking), warning
(potentially breaking), info (compatible). Pure driver code; useful for gating
contract evolution of the Iceberg/parquet table schema before a validation run.
"""

from __future__ import annotations

from dataclasses import dataclass, field as dc_field
from typing import Any, List, Optional

from .spec import DataContractSpecification, Field

# Severity table (parity: breaking/breaking_rules.py — e.g. field_removed=ERROR
# at :21, field_type_updated=ERROR at :33; additions are info, restrictions
# error, relaxations info/warning).
BREAKING_RULES = {
    "model_added": "info",
    "model_removed": "error",
    "field_added": "info",
    "field_removed": "error",
    "field_type_added": "warning",
    "field_type_removed": "warning",
    "field_type_updated": "error",
    "field_required_added": "error",
    "field_required_removed": "info",
    "field_required_updated": "error",
    "field_unique_added": "error",
    "field_unique_removed": "info",
    "field_unique_updated": "error",
    "field_pattern_added": "error",
    "field_pattern_removed": "info",
    "field_pattern_updated": "error",
    "field_enum_added": "error",
    "field_enum_removed": "info",
    "field_enum_updated": "error",
    "field_minimum_added": "error",
    "field_minimum_removed": "info",
    "field_minimum_updated": "error",
    "field_maximum_added": "error",
    "field_maximum_removed": "info",
    "field_maximum_updated": "error",
    "field_exclusiveMinimum_added": "error",
    "field_exclusiveMinimum_removed": "info",
    "field_exclusiveMinimum_updated": "error",
    "field_exclusiveMaximum_added": "error",
    "field_exclusiveMaximum_removed": "info",
    "field_exclusiveMaximum_updated": "error",
    "field_minLength_added": "error",
    "field_minLength_removed": "info",
    "field_minLength_updated": "error",
    "field_maxLength_added": "error",
    "field_maxLength_removed": "info",
    "field_maxLength_updated": "error",
    "field_references_added": "warning",
    "field_references_removed": "info",
    "field_references_updated": "warning",
    "field_primaryKey_added": "warning",
    "field_primaryKey_removed": "warning",
    "field_primaryKey_updated": "warning",
    "field_pii_added": "warning",
    "field_pii_removed": "warning",
    "field_pii_updated": "warning",
    "field_classification_added": "warning",
    "field_classification_removed": "warning",
    "field_classification_updated": "warning",
    "quality_added": "info",
    "quality_removed": "warning",
    "quality_updated": "warning",
    "info_version_updated": "info",
    "info_owner_updated": "warning",
}

_FIELD_PROPS = [
    "type", "required", "unique", "pattern", "enum", "minimum", "maximum",
    "exclusiveMinimum", "exclusiveMaximum", "minLength", "maxLength",
    "references", "primaryKey", "pii", "classification",
]


@dataclass
class BreakingChange:
    rule: str
    severity: str
    location: str
    description: str


@dataclass
class BreakingChanges:
    changes: List[BreakingChange] = dc_field(default_factory=list)

    @property
    def errors(self) -> List[BreakingChange]:
        return [c for c in self.changes if c.severity == "error"]

    @property
    def warnings(self) -> List[BreakingChange]:
        return [c for c in self.changes if c.severity == "warning"]

    @property
    def has_errors(self) -> bool:
        return bool(self.errors)

    def summary(self) -> str:
        lines = [f"{len(self.changes)} changes: {len(self.errors)} error(s), "
                 f"{len(self.warnings)} warning(s)"]
        for c in self.changes:
            lines.append(f"  [{c.severity}] {c.rule} at {c.location}: {c.description}")
        return "\n".join(lines)


def _emit(out: BreakingChanges, rule: str, location: str, desc: str,
          include_info: bool) -> None:
    severity = BREAKING_RULES.get(rule)
    if severity is None:
        return
    if severity == "info" and not include_info:
        return
    out.changes.append(BreakingChange(rule, severity, location, desc))


def _diff_field(out: BreakingChanges, loc: str, old: Field, new: Field,
                include_info: bool) -> None:
    for prop in _FIELD_PROPS:
        ov, nv = getattr(old, prop, None), getattr(new, prop, None)
        if ov == nv:
            continue
        change = "added" if ov is None else ("removed" if nv is None else "updated")
        _emit(out, f"field_{prop}_{change}", loc,
              f"{prop}: {ov!r} -> {nv!r}", include_info)
    for name in old.fields:
        if name not in new.fields:
            _emit(out, "field_removed", f"{loc}.{name}", "nested field removed", include_info)
        else:
            _diff_field(out, f"{loc}.{name}", old.fields[name], new.fields[name], include_info)
    for name in new.fields:
        if name not in old.fields:
            _emit(out, "field_added", f"{loc}.{name}", "nested field added", include_info)
    # collection element types: array items, map keys/values — an element
    # type change (array<int> -> array<string>) is exactly as breaking as a
    # top-level type change and must not diff as "no change"
    for sub, label in (("items", "[items]"), ("keys", "[keys]"), ("values", "[values]")):
        osub, nsub = getattr(old, sub, None), getattr(new, sub, None)
        if osub is None and nsub is None:
            continue
        if osub is None:
            _emit(out, "field_added", f"{loc}{label}", "element schema added", include_info)
        elif nsub is None:
            _emit(out, "field_removed", f"{loc}{label}", "element schema removed", include_info)
        else:
            _diff_field(out, f"{loc}{label}", osub, nsub, include_info)


def breaking(
    old: DataContractSpecification,
    new: DataContractSpecification,
    include_info: bool = False,
) -> BreakingChanges:
    """Diff two contracts; ``include_info=True`` is the reference's `changelog`
    behavior (all changes), False is `breaking` (errors + warnings only)."""
    out = BreakingChanges()

    if old.info and new.info:
        if old.info.version != new.info.version:
            _emit(out, "info_version_updated", "info.version",
                  f"{old.info.version!r} -> {new.info.version!r}", include_info)
        if old.info.owner != new.info.owner:
            _emit(out, "info_owner_updated", "info.owner",
                  f"{old.info.owner!r} -> {new.info.owner!r}", include_info)

    for mname, model in old.models.items():
        if mname not in new.models:
            _emit(out, "model_removed", mname, "model removed", include_info)
            continue
        nmodel = new.models[mname]
        for fname, f in model.fields.items():
            if fname not in nmodel.fields:
                _emit(out, "field_removed", f"{mname}.{fname}", "field removed", include_info)
            else:
                _diff_field(out, f"{mname}.{fname}", f, nmodel.fields[fname], include_info)
        for fname in nmodel.fields:
            if fname not in model.fields:
                _emit(out, "field_added", f"{mname}.{fname}", "field added", include_info)
        oq = [q.model_dump(exclude_none=True) for q in model.quality]
        nq = [q.model_dump(exclude_none=True) for q in nmodel.quality]
        if oq != nq:
            if not oq:
                _emit(out, "quality_added", mname, "quality rules added", include_info)
            elif not nq:
                _emit(out, "quality_removed", mname, "quality rules removed", include_info)
            else:
                _emit(out, "quality_updated", mname, "quality rules changed", include_info)
    for mname in new.models:
        if mname not in old.models:
            _emit(out, "model_added", mname, "model added", include_info)
    return out


def changelog(old: DataContractSpecification, new: DataContractSpecification) -> BreakingChanges:
    """All changes including compatible ones (reference `changelog` command)."""
    return breaking(old, new, include_info=True)
