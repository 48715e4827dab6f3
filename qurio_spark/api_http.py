"""HTTP transport for the MCP JSON-RPC surface (SURVEY §2.6).

The reference serves its four MCP tools as JSON-RPC 2.0 over HTTP
(features/mcp/handler.go:568-597: one request -> one JSON response,
``Content-Type: application/json`` on every reply, status 200 even for
JSON-RPC-level errors, an empty 200 for notifications, and a Parse
error response for undecodable bodies).  This is the same thin layer
over :class:`qurio_spark.api.Engine` — stdlib ``http.server`` only,
all tool semantics stay in ``api.py``.

Serving is still a test/demo surface, not a deployment story
(BASELINE.json scopes online serving out): the server binds loopback
by default and is driven by the e2e test.  On a real deployment the
Engine's Spark session is shared across handler threads, which Spark
supports (one driver, many scheduler threads).
"""

from __future__ import annotations

import json
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

from qurio_spark.api import ERR_PARSE, Engine, _err


class McpHttpServer:
    """Blocking-free wrapper: ``start()`` serves on a daemon thread,
    ``close()`` shuts the socket down.  ``port=0`` binds an ephemeral
    port (read it back via ``.port`` — the e2e test's shape)."""

    def __init__(self, engine: Engine, host: str = "127.0.0.1", port: int = 0):
        outer = self

        class Handler(BaseHTTPRequestHandler):
            def do_POST(self) -> None:  # noqa: N802 (http.server API)
                length = int(self.headers.get("Content-Length") or 0)
                raw = self.rfile.read(length)
                if not raw.strip():
                    # EOF/empty body: the reference replies nothing but
                    # headers (handler.go: io.EOF -> bare return)
                    self._reply(None)
                    return
                try:
                    req = json.loads(raw)
                except json.JSONDecodeError:
                    self._reply(_err(None, ERR_PARSE, "Parse error"))
                    return
                self._reply(outer.engine.process_request(req))

            def _reply(self, resp: dict | None) -> None:
                body = b"" if resp is None else json.dumps(resp).encode()
                self.send_response(200)
                self.send_header("Content-Type", "application/json")
                self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                if body:
                    self.wfile.write(body)

            def log_message(self, fmt: str, *args) -> None:
                pass  # keep test output quiet; transport has no state to log

        self.engine = engine
        self._httpd = ThreadingHTTPServer((host, port), Handler)
        self._thread: threading.Thread | None = None

    @property
    def port(self) -> int:
        return self._httpd.server_address[1]

    @property
    def url(self) -> str:
        host, port = self._httpd.server_address[:2]
        return f"http://{host}:{port}/"

    def start(self) -> "McpHttpServer":
        self._thread = threading.Thread(
            target=self._httpd.serve_forever, daemon=True
        )
        self._thread.start()
        return self

    def close(self) -> None:
        self._httpd.shutdown()
        self._httpd.server_close()
        if self._thread:
            self._thread.join(timeout=5)

    def __enter__(self) -> "McpHttpServer":
        return self.start()

    def __exit__(self, *exc) -> None:
        self.close()
