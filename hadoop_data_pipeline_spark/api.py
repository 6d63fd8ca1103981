"""REST façade over :class:`~hadoop_data_pipeline_spark.fs.FS`
(SURVEY.md §2.1 S9).

The reference exposes HDFS list/upload/delete over HTTP
(``hive_hdfs_api.py:37-93``, FastAPI shelling into ``hdfs dfs``).
This engine keeps the same capability surface but serves it from the
Python stdlib (no web-framework dependency) and executes against the
Hadoop FileSystem API through the :class:`FS` seam — so the same
endpoints work on ``file://``, ``hdfs://``, or ``s3a://`` paths, with
no subprocess per request.

Endpoints (JSON in/out):

* ``GET    /fs/list?path=P[&recursive=0]`` -> ``{"path": P, "files": [...]}``
* ``GET    /fs/exists?path=P``             -> ``{"path": P, "exists": bool}``
* ``POST   /fs/upload?path=P``  (body = file bytes) -> ``{"path": P, "bytes": n}``
* ``DELETE /fs/delete?path=P``             -> ``{"path": P, "deleted": bool}``

Scale note: this is a control-plane surface — listings, markers, small
config files. Bulk data movement belongs to the distributed readers /
writers; the façade deliberately has no download-a-dataset endpoint.
"""

from __future__ import annotations

import json
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from urllib.parse import parse_qs, urlparse

from hadoop_data_pipeline_spark.fs import FS

#: Upload bodies above this are rejected: the façade is for
#: control-plane files, not datasets (stream those with the DataFrame
#: writers). Mirrors the reference's single-file upload semantics.
MAX_UPLOAD_BYTES = 64 * 1024 * 1024


class _Handler(BaseHTTPRequestHandler):
    fs: FS  # set by make_server

    # -- plumbing ---------------------------------------------------------
    def _send(self, code: int, payload: dict) -> None:
        body = json.dumps(payload).encode("utf-8")
        self.send_response(code)
        self.send_header("Content-Type", "application/json")
        self.send_header("Content-Length", str(len(body)))
        self.end_headers()
        self.wfile.write(body)

    def _params(self) -> dict[str, str]:
        q = parse_qs(urlparse(self.path).query)
        return {k: v[0] for k, v in q.items()}

    def _route(self) -> str:
        return urlparse(self.path).path

    def _require_path(self) -> str | None:
        p = self._params().get("path")
        if not p:
            self._send(400, {"error": "missing required query param: path"})
        return p

    def log_message(self, fmt: str, *args) -> None:  # noqa: A003
        pass  # quiet by default; callers wrap with their own logging

    # -- verbs ------------------------------------------------------------
    def do_GET(self) -> None:  # noqa: N802 (http.server contract)
        p = self._require_path()
        if p is None:
            return
        try:
            if self._route() == "/fs/list":
                recursive = self._params().get("recursive", "1") != "0"
                self._send(
                    200, {"path": p, "files": self.fs.list_files(p, recursive)}
                )
            elif self._route() == "/fs/exists":
                self._send(200, {"path": p, "exists": self.fs.exists(p)})
            else:
                self._send(404, {"error": f"no such endpoint: {self._route()}"})
        except Exception as e:  # noqa: BLE001 - surface as HTTP 500
            self._send(500, {"error": str(e)})

    def do_POST(self) -> None:  # noqa: N802
        if self._route() != "/fs/upload":
            self._send(404, {"error": f"no such endpoint: {self._route()}"})
            return
        p = self._require_path()
        if p is None:
            return
        length = int(self.headers.get("Content-Length", "0"))
        if length > MAX_UPLOAD_BYTES:
            self._send(
                413,
                {
                    "error": f"upload exceeds {MAX_UPLOAD_BYTES} bytes; "
                    "bulk data belongs to the distributed writers"
                },
            )
            return
        try:
            self.fs.write_bytes(p, self.rfile.read(length))
            self._send(200, {"path": p, "bytes": length})
        except Exception as e:  # noqa: BLE001
            self._send(500, {"error": str(e)})

    def do_DELETE(self) -> None:  # noqa: N802
        if self._route() != "/fs/delete":
            self._send(404, {"error": f"no such endpoint: {self._route()}"})
            return
        p = self._require_path()
        if p is None:
            return
        try:
            self._send(200, {"path": p, "deleted": self.fs.delete(p)})
        except Exception as e:  # noqa: BLE001
            self._send(500, {"error": str(e)})


def make_server(fs: FS, host: str = "127.0.0.1", port: int = 0) -> ThreadingHTTPServer:
    """Build (without starting) the façade server; ``port=0`` picks an
    ephemeral port (``server.server_address[1]`` reports it)."""
    handler = type("BoundHandler", (_Handler,), {"fs": fs})
    return ThreadingHTTPServer((host, port), handler)


def serve_in_background(fs: FS, host: str = "127.0.0.1", port: int = 0):
    """Start the façade on a daemon thread; returns (server, base_url).
    ``server.shutdown()`` stops it."""
    server = make_server(fs, host, port)
    thread = threading.Thread(target=server.serve_forever, daemon=True)
    thread.start()
    return server, f"http://{server.server_address[0]}:{server.server_address[1]}"
