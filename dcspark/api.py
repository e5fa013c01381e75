"""REST API: test / lint / export endpoints over the engine.

Parity surface: the reference serves POST /test, /lint, /export via FastAPI
(/root/reference/datacontract/api.py:120-210, `datacontract api` at
cli.py:455-481). FastAPI is not available in this environment, so the same
endpoints are served with the stdlib ``http.server`` — zero dependencies,
spark-submit-able, and the handler surface is identical JSON in/out:

- POST /lint    {"contract": "<yaml>"}                       -> Run JSON
- POST /export  {"contract": "<yaml>", "format": "...",
                 "model": "..."(opt)}                        -> {"result": str}
- POST /test    {"contract": "<yaml>", "path": "...",
                 "server": "..."(opt)}                       -> Run JSON

Optional bearer auth: pass ``api_key`` (reference: x-api-key header,
api.py:99-117). The Spark session for /test is created lazily on first use
and reused across requests.
"""

from __future__ import annotations

import json
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from typing import Any, Dict, Optional


def _run_to_dict(run) -> Dict[str, Any]:
    return json.loads(run.model_dump_json())


class _Handler(BaseHTTPRequestHandler):
    server_version = "dcspark-api"
    api_key: Optional[str] = None
    spark_factory = None  # () -> SparkSession, injected by serve()
    _spark = None
    _spark_lock = threading.Lock()

    # -- plumbing -----------------------------------------------------------

    def log_message(self, fmt, *args):  # quiet by default
        pass

    def _reply(self, code: int, payload: Dict[str, Any]) -> None:
        body = json.dumps(payload).encode()
        self.send_response(code)
        self.send_header("Content-Type", "application/json")
        self.send_header("Content-Length", str(len(body)))
        self.end_headers()
        self.wfile.write(body)

    def _read_json(self) -> Optional[Dict[str, Any]]:
        try:
            n = int(self.headers.get("Content-Length", "0"))
            return json.loads(self.rfile.read(n) or b"{}")
        except (ValueError, json.JSONDecodeError):
            return None

    def _authorized(self) -> bool:
        if not self.api_key:
            return True
        return self.headers.get("x-api-key") == self.api_key

    @classmethod
    def _get_spark(cls):
        with cls._spark_lock:
            if cls._spark is None:
                cls._spark = cls.spark_factory()
            return cls._spark

    # -- endpoints ----------------------------------------------------------

    def do_POST(self) -> None:  # noqa: N802 (http.server API)
        if not self._authorized():
            self._reply(401, {"error": "invalid or missing x-api-key"})
            return
        doc = self._read_json()
        if doc is None or "contract" not in doc:
            self._reply(422, {"error": "body must be JSON with a 'contract' key"})
            return

        from .spec import DataContractSpecification

        try:
            spec = DataContractSpecification.from_string(doc["contract"])
        except Exception as e:
            self._reply(400, {"error": f"contract parse failed: {e}"})
            return

        try:
            if self.path == "/lint":
                from .lint import lint

                self._reply(200, _run_to_dict(lint(spec)))
            elif self.path == "/export":
                from .export import export

                out = export(spec, doc.get("format", "jsonschema"),
                             model=doc.get("model"),
                             server=doc.get("server"),
                             template=doc.get("template"))
                self._reply(200, {"result": out})
            elif self.path == "/test":
                from .engine import ValidationConfig, validate
                from .io import load_tables

                spark = self._get_spark()
                tables = load_tables(spark, spec, server_name=doc.get("server"),
                                     base_path=doc.get("path"))
                result = validate(spark, spec, tables, ValidationConfig())
                self._reply(200, _run_to_dict(result.run))
            else:
                self._reply(404, {"error": f"unknown endpoint {self.path}"})
        except Exception as e:
            self._reply(500, {"error": str(e)})


def make_server(
    port: int = 4242,
    host: str = "127.0.0.1",
    api_key: Optional[str] = None,
    spark_factory=None,
) -> ThreadingHTTPServer:
    """Build (don't start) the HTTP server — tests drive it on a thread."""
    handler = type("Handler", (_Handler,), {
        "api_key": api_key,
        "spark_factory": spark_factory or _default_spark_factory,
    })
    return ThreadingHTTPServer((host, port), handler)


def _default_spark_factory():
    from pyspark.sql import SparkSession

    return SparkSession.builder.appName("dcspark-api").getOrCreate()


def serve(port: int = 4242, host: str = "127.0.0.1",
          api_key: Optional[str] = None) -> None:
    """Blocking entrypoint (`python -m dcspark.cli api`)."""
    srv = make_server(port, host, api_key)
    print(f"dcspark api listening on http://{host}:{port} "
          f"(POST /test /lint /export)")
    try:
        srv.serve_forever()
    except KeyboardInterrupt:
        srv.shutdown()
