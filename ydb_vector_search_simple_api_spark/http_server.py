"""Runnable HTTP façade over the library API (O17).

The reference is a Flask app (``/root/reference/app.py:267-441``:
``GET /`` web UI, ``GET /health``, ``GET /config``, ``POST /search``).
This module frames the same four routes over :mod:`.api` with only the
standard library — the validation matrix, error strings, defaults and
status codes all live in ``api.search_request`` and are shared with
any other framing a deployment prefers.

Server-in-a-library shape: :func:`serve` binds and returns a
``ThreadingHTTPServer``; the caller decides the lifecycle (a CLI would
``serve_forever()``, tests run it on a background thread and shut it
down). The Spark driver hosting the engine is the natural process to
host this server — queries fan out to the cluster from here.
"""

from __future__ import annotations

import json
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

from . import api

#: Minimal functional stand-in for the reference's web UI
#: (``templates/index.html``, 471 lines): a form that POSTs to
#: /search with an embedding or a query string and renders results.
INDEX_HTML = """<!doctype html>
<html><head><meta charset="utf-8"><title>Vector Search</title></head>
<body>
<h1>Vector Search</h1>
<form id="f">
  <label>Query text <input name="query"></label>
  <label>or embedding JSON <input name="embedding" placeholder="[0.1, ...]"></label>
  <label>k <input name="k" type="number" value="4"></label>
  <button>Search</button>
</form>
<pre id="out"></pre>
<script>
document.getElementById('f').onsubmit = async (e) => {
  e.preventDefault();
  const fd = new FormData(e.target), body = {k: parseInt(fd.get('k') || '4')};
  if (fd.get('query')) body.query = fd.get('query');
  if (fd.get('embedding')) body.embedding = JSON.parse(fd.get('embedding'));
  const r = await fetch('/search', {method: 'POST',
    headers: {'Content-Type': 'application/json'}, body: JSON.stringify(body)});
  document.getElementById('out').textContent = JSON.stringify(await r.json(), null, 2);
};
</script>
</body></html>
"""


def make_handler(engine: api.VectorSearchEngine) -> type[BaseHTTPRequestHandler]:
    class Handler(BaseHTTPRequestHandler):
        # keep pytest output clean; real deployments override
        def log_message(self, fmt, *args):  # noqa: A002
            pass

        def _send_json(self, payload: dict, status: int) -> None:
            body = json.dumps(payload).encode()
            self.send_response(status)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def do_GET(self) -> None:  # noqa: N802 (stdlib naming)
            if self.path == "/health":
                self._send_json(*api.health())
            elif self.path == "/config":
                self._send_json(*api.config_echo(engine))
            elif self.path in ("/", "/index.html"):
                body = INDEX_HTML.encode()
                self.send_response(200)
                self.send_header("Content-Type", "text/html; charset=utf-8")
                self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                self.wfile.write(body)
            else:
                self._send_json({"error": "Not found"}, 404)

        def do_POST(self) -> None:  # noqa: N802
            if self.path != "/search":
                self._send_json({"error": "Not found"}, 404)
                return
            length = int(self.headers.get("Content-Length") or 0)
            raw = self.rfile.read(length) if length else b""
            if not raw:
                data = None
            else:
                try:
                    data = json.loads(raw)
                except json.JSONDecodeError:
                    # Flask's get_json() failure path -> 400
                    self._send_json({"error": "Request body must be valid JSON"}, 400)
                    return
            self._send_json(*api.search_request(engine, data))

    return Handler


def serve(
    engine: api.VectorSearchEngine, host: str = "127.0.0.1", port: int = 8080
) -> ThreadingHTTPServer:
    """Bind and return the server (port=0 picks a free port; see
    ``server.server_address``). Caller owns the lifecycle."""
    return ThreadingHTTPServer((host, port), make_handler(engine))
