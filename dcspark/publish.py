"""Publish run results to a results endpoint (Data Mesh Manager wire format).

Parity: /root/reference/datacontract/integration/datamesh_manager.py:8-44 —
POST the Run JSON with an ``x-api-key`` header; failures are logged onto the
run, never raised (a broken results endpoint must not fail the validation).
stdlib urllib only (no requests dependency in this environment).
"""

from __future__ import annotations

import os
import ssl
from typing import Optional

from .run_model import Run

DEFAULT_PUBLISH_URL = "https://api.datamesh-manager.com/api/test-results"


def publish_run(
    run: Run,
    publish_url: Optional[str] = None,
    api_key: Optional[str] = None,
    ssl_verification: bool = True,
    timeout: float = 10.0,
) -> bool:
    """POST the run to a results endpoint; returns True on HTTP 200.

    API key resolution order: explicit arg, DATAMESH_MANAGER_API_KEY,
    DATACONTRACT_MANAGER_API_KEY (reference parity).
    """
    import urllib.request

    try:
        url = publish_url or DEFAULT_PUBLISH_URL
        key = (
            api_key
            or os.getenv("DATAMESH_MANAGER_API_KEY")
            or os.getenv("DATACONTRACT_MANAGER_API_KEY")
        )
        if key is None:
            raise RuntimeError(
                "Cannot publish run results: neither DATAMESH_MANAGER_API_KEY "
                "nor DATACONTRACT_MANAGER_API_KEY is set"
            )
        if run.dataContractId is None:
            raise RuntimeError("Cannot publish run results for unknown data contract ID")
        body = run.model_dump_json().encode("utf-8")
        req = urllib.request.Request(
            url,
            data=body,
            headers={"Content-Type": "application/json", "x-api-key": key},
            method="POST",
        )
        context = None
        if not ssl_verification:
            context = ssl.create_default_context()
            context.check_hostname = False
            context.verify_mode = ssl.CERT_NONE
        with urllib.request.urlopen(req, timeout=timeout, context=context) as resp:
            status = resp.status
            text = resp.read().decode("utf-8", "replace")
        if status != 200:
            run.log_error(f"Error publishing test results to {url}: {text}")
            return False
        run.log_info(f"Published test results to {url}")
        return True
    except Exception as e:  # never crash the validation over a results endpoint
        run.log_error(f"Failed publishing test results. Error: {e}")
        return False
