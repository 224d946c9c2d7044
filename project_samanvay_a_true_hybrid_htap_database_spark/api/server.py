"""REST API over the engine: the reference's HTTP/JSON surface on stdlib.

Endpoint and envelope parity with the reference server (reference:
StorageEngine/API/api_server.hpp:98-333, envelope json_helpers.hpp:22-51):

- ``POST /api/query``    {"sql": ...} -> {headers, rows, rowsAffected,
  executionTimeMs[, message]}
- ``POST /api/explain``  {"sql": ...} -> {"plan": <text>}
- ``GET  /api/tables``                -> {"tables": [...], "count": N}
- ``GET  /api/tables/<name>``         -> schema JSON (schemaToJson parity)
- ``GET  /api/tables/<name>/describe``-> {"description": <text table>}
- ``GET  /api/tables/<name>/history`` -> {"history": [manifests], "count"}
  (r13, beyond-reference: the transaction log's DESCRIBE HISTORY view)
- ``GET  /api/status``                -> engine.status()
- ``POST /api/admin/flush``           -> flush all hot overlays
- ``POST /api/admin/compact``         -> compact all tables
- ``GET  /api/health``                -> {status, uptime_seconds, version, engine}
- ``GET  /api/info``                  -> capabilities discovery

Every response is ``{"success": bool, "data": ..., "error": null |
{"message", "type"}}``. Uses ``ThreadingHTTPServer`` — handler threads share
one SparkSession, which is thread-safe for job submission (each HTTP request
becomes one or more Spark jobs, as handler threads share the engine in the
reference, api_server.hpp + per-component mutexes).
"""

from __future__ import annotations

import json
import os
import threading
import time
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

from .. import __version__
from ..engine import ResultSet, SamanvayEngine
from ..formatter import format_result

_SUPPORTED = {
    "supportedStatements": [
        "CREATE TABLE",
        "DROP TABLE",
        "INSERT",
        "SELECT",
        "UPDATE",
        "DELETE",
        "SHOW TABLES",
        "DESCRIBE",
        "EXPLAIN",
    ],
    "supportedTypes": [
        "INT",
        "BIGINT",
        "FLOAT",
        "DOUBLE",
        "DECIMAL",
        "CHAR",
        "VARCHAR",
        "TEXT",
        "BOOLEAN",
    ],
    "supportedAggregations": ["COUNT", "SUM", "AVG", "MIN", "MAX"],
    "supportedWhereOps": ["=", "!=", "<", "<=", ">", ">=", "AND", "OR"],
    "features": [
        "HTAP (hot-overlay reads over a Parquet base)",
        "Spark Catalyst analytical execution",
        "Newest-sequence-wins upsert + tombstone delete",
        "EXPLAIN with storage-path narration + Spark physical plan",
    ],
}


def success(data) -> dict:
    return {"success": True, "data": data, "error": None}


def error(message: str, etype: str = "ERROR") -> dict:
    return {
        "success": False,
        "data": None,
        "error": {"message": message, "type": etype},
    }


def result_to_json(rs: ResultSet) -> dict:
    if not rs.ok:
        return error(rs.error_message, "QUERY_ERROR")
    data = {
        "headers": rs.headers,
        "rows": [list(r) for r in rs.rows],
        "rowsAffected": rs.rows_affected,
        "executionTimeMs": rs.execution_time_ms,
    }
    if rs.message:
        data["message"] = rs.message
    return success(data)


def _console_html() -> bytes:
    """The static SQL console page shipped inside the package."""
    path = os.path.join(os.path.dirname(os.path.abspath(__file__)), "console.html")
    with open(path, "rb") as fh:
        return fh.read()


class SamanvayAPIServer:
    """Owns a ThreadingHTTPServer bound to (host, port) and serving `engine`."""

    def __init__(self, engine: SamanvayEngine, host: str = "127.0.0.1", port: int = 0):
        self.engine = engine
        self.start_time = time.monotonic()
        self.httpd = ThreadingHTTPServer((host, port), self._make_handler())
        self.port = self.httpd.server_address[1]
        self._thread: threading.Thread | None = None

    # -- lifecycle ----------------------------------------------------------

    def start_background(self) -> None:
        self._thread = threading.Thread(target=self.httpd.serve_forever, daemon=True)
        self._thread.start()

    def serve_forever(self) -> None:
        self.httpd.serve_forever()

    def shutdown(self) -> None:
        self.httpd.shutdown()
        if self._thread:
            self._thread.join(timeout=10)

    # -- routing ------------------------------------------------------------

    def _schema_json(self, name: str) -> dict | None:
        state = self.engine.tables.get(name.lower())
        if state is None:
            return None
        return {
            "tableName": state.name,
            "primaryKey": state.pk,
            "columns": [
                {
                    "name": f.name,
                    "type": f.dataType.simpleString(),
                    "nullable": f.name not in state.not_null,
                }
                for f in state.schema.fields
            ],
            "columnCount": len(state.schema.fields),
        }

    def _handle_get(self, path: str) -> tuple[int, dict]:
        eng = self.engine
        if path == "/api/tables":
            names = sorted(eng.tables)
            return 200, success({"tables": names, "count": len(names)})
        if path.startswith("/api/tables/"):
            rest = path[len("/api/tables/") :]
            if rest.endswith("/describe"):
                name = rest[: -len("/describe")]
                if name.lower() not in eng.tables:
                    return 404, error(
                        f"Table '{name}' does not exist", "NOT_FOUND"
                    )
                rs = eng.execute(f"DESCRIBE {name}")
                return 200, success({"description": format_result(rs)})
            if rest.endswith("/history"):
                # beyond-reference extension (r13): the transaction log's
                # DESCRIBE HISTORY view — layout commits, newest first
                # (empty for in-memory engines; txlog.py)
                name = rest[: -len("/history")]
                if name.lower() not in eng.tables:
                    return 404, error(
                        f"Table '{name}' does not exist", "NOT_FOUND"
                    )
                hist = eng.table_history(name.lower())
                return 200, success({"history": hist, "count": len(hist)})
            base_path, _, query = rest.partition("?")
            if base_path.endswith("/changes"):
                # change data feed (r15): the row diff between two
                # retained layout versions — the REST twin of
                # `SELECT * FROM t CHANGES BETWEEN a AND b`
                from urllib.parse import parse_qs

                name = base_path[: -len("/changes")]
                if name.lower() not in eng.tables:
                    return 404, error(
                        f"Table '{name}' does not exist", "NOT_FOUND"
                    )
                qs = parse_qs(query)
                try:
                    v_from = int(qs["from"][0])
                    v_to = int(qs["to"][0])
                except (KeyError, IndexError, ValueError):
                    return 400, error(
                        "changes requires integer 'from' and 'to' query "
                        "parameters",
                        "INVALID_REQUEST",
                    )
                rs = eng.execute(
                    f"SELECT * FROM {name} CHANGES BETWEEN {v_from} "
                    f"AND {v_to}"
                )
                return (200, result_to_json(rs)) if rs.ok else (
                    400,
                    error(rs.error_message, "QUERY_ERROR"),
                )
            schema = self._schema_json(rest)
            if schema is None:
                return 404, error(f"Table '{rest}' does not exist", "NOT_FOUND")
            return 200, success(schema)
        if path == "/api/status":
            return 200, success(eng.status())
        if path == "/api/health":
            return 200, success(
                {
                    "status": "ok",
                    "uptime_seconds": int(time.monotonic() - self.start_time),
                    "version": __version__,
                    "engine": "Samanvay on Spark",
                }
            )
        if path == "/api/info":
            return 200, success(
                {
                    "version": __version__,
                    "engine": "Samanvay on Spark - PySpark-native HTAP engine",
                    **_SUPPORTED,
                }
            )
        return 404, error("Endpoint not found", "NOT_FOUND")

    def _handle_post(self, path: str, body: bytes) -> tuple[int, dict]:
        eng = self.engine
        if path in ("/api/query", "/api/explain"):
            try:
                payload = json.loads(body or b"{}")
            except json.JSONDecodeError as exc:
                return 400, error(f"Invalid JSON: {exc}", "PARSE_ERROR")
            sql = payload.get("sql")
            if not isinstance(sql, str) or not sql.strip():
                return 400, error(
                    "Missing 'sql' field in request body", "INVALID_REQUEST"
                )
            sql = sql.strip().rstrip(";")
            if path == "/api/explain":
                if not sql.upper().startswith("EXPLAIN"):
                    sql = f"EXPLAIN {sql}"
                rs = eng.execute(sql)
                if not rs.ok:
                    return 400, error(rs.error_message, "QUERY_ERROR")
                return 200, success(
                    {"plan": "\n".join(row[0] for row in rs.rows)}
                )
            rs = eng.execute(sql)
            return (200 if rs.ok else 400), result_to_json(rs)
        if path == "/api/admin/flush":
            flushed = {name: eng.flush(name) for name in list(eng.tables)}
            return 200, success(
                {
                    "message": "Hot overlays flushed to base",
                    "flushedEntries": flushed,
                }
            )
        if path == "/api/admin/compact":
            for name in list(eng.tables):
                eng.compact(name)
            return 200, success({"message": "Compaction triggered"})
        if path in ("/api/admin/compact/pause", "/api/admin/compact/resume"):
            # Spark has no background compactor thread to pause; acknowledged
            # for endpoint parity (reference: api_server.hpp:270-283).
            verb = "paused" if path.endswith("pause") else "resumed"
            return 200, success({"message": f"Compaction {verb}"})
        return 404, error("Endpoint not found", "NOT_FOUND")

    def _make_handler(self):
        server = self

        class Handler(BaseHTTPRequestHandler):
            protocol_version = "HTTP/1.1"

            def log_message(self, *args):  # silence request logging
                pass

            def _send(self, status: int, payload: dict) -> None:
                raw = json.dumps(payload).encode()
                self.send_response(status)
                self.send_header("Content-Type", "application/json")
                self.send_header("Content-Length", str(len(raw)))
                self.send_header("Access-Control-Allow-Origin", "*")
                self.end_headers()
                self.wfile.write(raw)

            def do_OPTIONS(self):  # CORS preflight (api_server.hpp:95-96)
                self.send_response(204)
                self.send_header("Access-Control-Allow-Origin", "*")
                self.send_header(
                    "Access-Control-Allow-Methods", "GET, POST, OPTIONS"
                )
                self.send_header("Access-Control-Allow-Headers", "Content-Type")
                self.send_header("Content-Length", "0")
                self.end_headers()

            def do_GET(self):
                # The reference ships a JS console consuming this API
                # (sql-console/src/api.js); ours is a single static page
                # served from the package — no build toolchain needed.
                if self.path in ("/", "/console", "/index.html"):
                    page = _console_html()
                    self.send_response(200)
                    self.send_header("Content-Type", "text/html; charset=utf-8")
                    self.send_header("Content-Length", str(len(page)))
                    self.end_headers()
                    self.wfile.write(page)
                    return
                try:
                    status, payload = server._handle_get(self.path)
                except Exception as exc:  # noqa: BLE001
                    status, payload = 500, error(
                        f"Internal error: {exc}", "INTERNAL_ERROR"
                    )
                self._send(status, payload)

            def do_POST(self):
                try:
                    n = int(self.headers.get("Content-Length") or 0)
                    body = self.rfile.read(n) if n else b""
                    status, payload = server._handle_post(self.path, body)
                except Exception as exc:  # noqa: BLE001
                    status, payload = 500, error(
                        f"Internal error: {exc}", "INTERNAL_ERROR"
                    )
                self._send(status, payload)

        return Handler


def make_server(
    engine: SamanvayEngine, host: str = "127.0.0.1", port: int = 0
) -> SamanvayAPIServer:
    return SamanvayAPIServer(engine, host=host, port=port)


def main() -> None:
    from ..session import get_spark

    server = make_server(
        SamanvayEngine(get_spark(app_name="samanvay-api")), port=8080
    )
    print(f"Samanvay API listening on :{server.port}")
    server.serve_forever()


if __name__ == "__main__":
    main()
