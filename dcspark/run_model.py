"""Run / Check result model with worst-result-wins fold.

Shape parity with /root/reference/datacontract/model/run.py:10-110. The fold
precedence (error > failed > warning > passed > unknown, run.py:65-75) is the
behavioral contract every validation run must reproduce.
"""

from __future__ import annotations

import uuid
from datetime import datetime, timezone
from enum import Enum
from typing import Any, Dict, List, Optional

from pydantic import BaseModel, ConfigDict


class ResultEnum(str, Enum):
    passed = "passed"
    warning = "warning"
    failed = "failed"
    error = "error"
    info = "info"
    unknown = "unknown"


class Check(BaseModel):
    """One compiled rule's outcome (parity: model/run.py:19-35).

    ``implementation`` carries the compiled rule: a Spark expression / plan
    description string in this engine (the reference stores a SodaCL fragment).
    """

    model_config = ConfigDict(extra="allow")

    id: Optional[str] = None
    key: Optional[str] = None
    category: Optional[str] = None
    type: Optional[str] = None
    name: Optional[str] = None
    model: Optional[str] = None
    field: Optional[str] = None
    engine: Optional[str] = "dcspark"
    language: Optional[str] = "spark"
    implementation: Optional[str] = None
    result: Optional[ResultEnum] = None
    reason: Optional[str] = None
    details: Optional[str] = None
    diagnostics: Optional[Dict[str, Any]] = None


class Log(BaseModel):
    level: str
    message: str
    timestamp: datetime


class Run(BaseModel):
    """A validation run (parity: model/run.py:44-110)."""

    model_config = ConfigDict(extra="allow")

    runId: str
    dataContractId: Optional[str] = None
    dataContractVersion: Optional[str] = None
    server: Optional[str] = None
    timestampStart: Optional[datetime] = None
    timestampEnd: Optional[datetime] = None
    result: ResultEnum = ResultEnum.unknown
    checks: List[Check] = []
    logs: List[Log] = []

    def log_info(self, message: str) -> None:
        self.logs.append(Log(level="INFO", message=message, timestamp=datetime.now(timezone.utc)))

    def log_warn(self, message: str) -> None:
        self.logs.append(Log(level="WARN", message=message, timestamp=datetime.now(timezone.utc)))

    def log_error(self, message: str) -> None:
        self.logs.append(Log(level="ERROR", message=message, timestamp=datetime.now(timezone.utc)))

    def finish(self) -> None:
        self.timestampEnd = datetime.now(timezone.utc)
        self.result = fold_results([c.result for c in self.checks])

    @staticmethod
    def create_run(
        data_contract_id: Optional[str] = None,
        data_contract_version: Optional[str] = None,
        server: Optional[str] = None,
    ) -> "Run":
        return Run(
            runId=str(uuid.uuid4()),
            dataContractId=data_contract_id,
            dataContractVersion=data_contract_version,
            server=server,
            timestampStart=datetime.now(timezone.utc),
            result=ResultEnum.unknown,
        )


def fold_results(results: List[Optional[ResultEnum]]) -> ResultEnum:
    """Worst-result-wins (parity: model/run.py:65-75).

    Precedence: error > failed > warning > passed > unknown.
    """
    present = {r for r in results if r is not None}
    for worst in (ResultEnum.error, ResultEnum.failed, ResultEnum.warning, ResultEnum.passed):
        if worst in present:
            return worst
    return ResultEnum.unknown
