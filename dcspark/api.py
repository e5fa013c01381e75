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

    def do_GET(self) -> None:  # noqa: N802 (http.server API)
        """GET /openapi.json — machine-readable schema for tooling parity
        with the reference's FastAPI docs (/root/reference/datacontract/
        api.py serves auto-generated OpenAPI; here the spec is static but
        equally consumable by generators/clients). Unauthenticated, like
        FastAPI's /openapi.json."""
        if self.path in ("/openapi.json", "/openapi"):
            self._reply(200, openapi_spec())
        else:
            self._reply(404, {"error": f"unknown endpoint {self.path}"})

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


def openapi_spec() -> Dict[str, Any]:
    """OpenAPI 3.1 document describing the three endpoints. Static by design
    (no FastAPI in this environment); kept in lockstep with do_POST."""
    contract_prop = {"type": "string", "description": "data contract YAML"}
    run_schema = {
        "type": "object",
        "description": "run result: per-check outcomes + overall result",
        "properties": {
            "result": {"type": "string", "enum": ["passed", "warning", "failed", "error", "unknown"]},
            "checks": {"type": "array", "items": {
                "type": "object",
                "properties": {
                    "key": {"type": "string"},
                    "result": {"type": "string"},
                    "name": {"type": "string"},
                    "model": {"type": ["string", "null"]},
                    "field": {"type": ["string", "null"]},
                    "reason": {"type": ["string", "null"]},
                },
            }},
            "logs": {"type": "array", "items": {"type": "object"}},
        },
    }
    err = {"type": "object", "properties": {"error": {"type": "string"}}}

    def op(summary: str, body_props: Dict[str, Any], required, resp_schema) -> Dict[str, Any]:
        return {
            "summary": summary,
            "security": [{"ApiKeyAuth": []}],
            "requestBody": {
                "required": True,
                "content": {"application/json": {"schema": {
                    "type": "object",
                    "properties": body_props,
                    "required": required,
                }}},
            },
            "responses": {
                "200": {"description": "OK", "content": {
                    "application/json": {"schema": resp_schema}}},
                "400": {"description": "contract parse failed", "content": {
                    "application/json": {"schema": err}}},
                "401": {"description": "invalid or missing x-api-key", "content": {
                    "application/json": {"schema": err}}},
                "422": {"description": "malformed body", "content": {
                    "application/json": {"schema": err}}},
                "500": {"description": "execution error", "content": {
                    "application/json": {"schema": err}}},
            },
        }

    return {
        "openapi": "3.1.0",
        "info": {
            "title": "dcspark API",
            "version": "0.3.0",
            "description": "Data-contract lint / export / test over PySpark.",
        },
        "components": {"securitySchemes": {"ApiKeyAuth": {
            "type": "apiKey", "in": "header", "name": "x-api-key"}}},
        "paths": {
            "/lint": {"post": op(
                "Lint a contract", {"contract": contract_prop},
                ["contract"], run_schema)},
            "/export": {"post": op(
                "Export a contract to a target format",
                {"contract": contract_prop,
                 "format": {"type": "string", "default": "jsonschema"},
                 "model": {"type": ["string", "null"]},
                 "server": {"type": ["string", "null"]},
                 "template": {"type": ["string", "null"]}},
                ["contract"],
                {"type": "object", "properties": {"result": {"type": "string"}}})},
            "/test": {"post": op(
                "Validate data against a contract",
                {"contract": contract_prop,
                 "path": {"type": ["string", "null"],
                          "description": "base path overriding the contract's server"},
                 "server": {"type": ["string", "null"]}},
                ["contract"], run_schema)},
        },
    }


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
