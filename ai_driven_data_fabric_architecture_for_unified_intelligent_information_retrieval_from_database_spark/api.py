"""Thin HTTP shell reproducing the reference's four endpoints
(``core/urls.py:6-12`` / ``core/views.py``) over a
:class:`~.engine.DataFabricEngine` — stdlib ``http.server`` only; the
engine stays library-first and this layer is optional.

Routes (reference parity):
- ``POST /api/query/``    body ``{"query": "..."}`` -> engine.process
  (400 on empty query / malformed JSON, mirroring core/views.py:20-24,52-57)
- ``GET  /api/examples/`` the canonical 15-question corpus
- ``GET  /api/health/``   liveness
- ``GET  /api/info/``     capability metadata
"""

from __future__ import annotations

import json
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

from .engine import DataFabricEngine


def make_handler(engine: DataFabricEngine):
    class Handler(BaseHTTPRequestHandler):
        def _send(self, payload: dict, status: int = 200) -> None:
            body = json.dumps(payload).encode()
            self.send_response(status)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def do_GET(self):  # noqa: N802 (http.server API)
            if self.path.rstrip("/") == "/api/examples":
                self._send(engine.examples())
            elif self.path.rstrip("/") == "/api/health":
                self._send(engine.health())
            elif self.path.rstrip("/") == "/api/info":
                self._send(engine.info())
            else:
                self._send({"success": False, "error": "Not found"}, 404)

        def do_POST(self):  # noqa: N802
            if self.path.rstrip("/") != "/api/query":
                self._send({"success": False, "error": "Not found"}, 404)
                return
            try:
                length = int(self.headers.get("Content-Length", 0))
                data = json.loads(self.rfile.read(length) or b"{}")
            except json.JSONDecodeError:
                self._send(
                    {"success": False, "error": "Invalid JSON in request body"}, 400
                )
                return
            query = (data.get("query") or "").strip()
            if not query:
                self._send({"success": False, "error": "Query cannot be empty"}, 400)
                return
            try:
                self._send(engine.process(query))
            except Exception as exc:  # mirrors the 500 envelope
                self._send(
                    {"success": False, "error": f"Unexpected error: {exc}"}, 500
                )

        def log_message(self, *args):  # silence default stderr access log
            pass

    return Handler


def serve(engine: DataFabricEngine, host: str = "127.0.0.1", port: int = 0):
    """Start the API server on a background thread; returns the server
    (``server.server_address`` has the bound port; ``shutdown()`` stops it)."""
    server = ThreadingHTTPServer((host, port), make_handler(engine))
    thread = threading.Thread(target=server.serve_forever, daemon=True)
    thread.start()
    return server
