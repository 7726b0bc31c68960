"""HTTP byte-range file server — SURVEY.md §2.1 S16, Spark-first posture.

The reference exposes its parquet lake through a Cloudflare Worker that
serves R2 objects with byte-range support so remote engines (DuckDB httpfs)
can query parquet without downloading whole files
(``worker/src/index.ts:66-117``; range parse ``:20-29``: ``bytes=a-b`` with
an optional open end resolved against the object size; directory listing
for bare/trailing-slash paths; GET/HEAD only, 404 on miss, ``ETag`` +
``Accept-Ranges``/``Content-Range`` exposed).

In a Spark deployment the cluster's filesystem (S3A/ABFS/HTTP FS) already
does range reads natively, so the engine never needs this server for its
own scans — this module is the *outbound* half: it publishes a lake table
directory over HTTP with the same range contract, so external range-read
clients can point at engine output exactly as they point at the reference's
worker. Stdlib-only (``http.server`` on a daemon thread), OPTIONS/CORS
included for parity with the worker's browser clients.

Driver-side by design: serving files is not a distributed computation. At
scale this role is played by the object store itself; the server exists so
the S16 contract is a tested engine capability, not a doc claim.
"""

from __future__ import annotations

import html
import os
import re
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

_RANGE_RE = re.compile(r"^bytes=(\d*)-(\d*)$")

_CORS = {
    "Access-Control-Allow-Origin": "*",
    "Access-Control-Allow-Methods": "GET, HEAD, OPTIONS",
    "Access-Control-Allow-Headers": "*",
    "Access-Control-Expose-Headers": "Content-Length, Content-Range, Accept-Ranges, ETag",
}


def parse_range(header: str, total_size: int) -> tuple[int, int] | None:
    """``bytes=a-b`` / ``bytes=a-`` / suffix ``bytes=-N`` → (offset,
    length), or None if the header is unparseable (an invalid Range
    degrades to a full 200 response, not an error — the degrade path
    mirrors ``worker/src/index.ts:20-29``; suffix ranges, which parquet
    footer readers issue, are a superset of the reference's contract)."""
    m = _RANGE_RE.match(header)
    if not m:
        return None
    if not m.group(1):
        if not m.group(2):
            return None
        n = int(m.group(2))  # bytes=-N: the last N bytes
        if n <= 0:
            return None
        start = max(total_size - n, 0)
        return start, total_size - start
    start = int(m.group(1))
    end = int(m.group(2)) if m.group(2) else total_size - 1
    if start >= total_size or end < start:
        return None
    end = min(end, total_size - 1)
    return start, end - start + 1


def _content_type(key: str) -> str:
    if key.endswith(".parquet"):
        return "application/vnd.apache.parquet"
    if key.endswith(".json") or key.endswith(".ndjson"):
        return "application/json"
    if key.endswith(".csv"):
        return "text/csv"
    return "application/octet-stream"


class _Handler(BaseHTTPRequestHandler):
    root: str  # set by RangeFileServer

    # ----------------------------------------------------------- helpers
    def _resolve(self, key: str) -> str | None:
        path = os.path.realpath(os.path.join(self.root, key))
        if path != self.root and not path.startswith(self.root + os.sep):
            return None  # traversal attempt
        return path

    def _send_headers_common(self, extra: dict[str, str]) -> None:
        for k, v in {**_CORS, **extra}.items():
            self.send_header(k, v)

    def _serve(self, include_body: bool) -> None:
        from urllib.parse import unquote, urlsplit

        key = unquote(urlsplit(self.path).path.lstrip("/"))
        path = self._resolve(key)
        if path is None:
            self.send_response(404)
            self._send_headers_common({})
            self.end_headers()
            return
        if key == "" or key.endswith("/") or os.path.isdir(path):
            self._list_dir(key, path, include_body)
            return
        if not os.path.isfile(path):
            self.send_response(404)
            self._send_headers_common({})
            self.end_headers()
            self.wfile.write(b"Not found") if include_body else None
            return

        st = os.stat(path)
        etag = f'"{st.st_mtime_ns:x}-{st.st_size:x}"'
        rng_header = self.headers.get("Range")
        rng = parse_range(rng_header, st.st_size) if rng_header else None

        offset, length = (rng if rng else (0, st.st_size))
        self.send_response(206 if rng else 200)
        self._send_headers_common(
            {
                "Content-Type": _content_type(key),
                "Content-Length": str(length),
                "Accept-Ranges": "bytes",
                "ETag": etag,
            }
        )
        if rng:
            self.send_header(
                "Content-Range", f"bytes {offset}-{offset + length - 1}/{st.st_size}"
            )
        self.end_headers()
        if include_body:
            with open(path, "rb") as f:
                f.seek(offset)
                remaining = length
                while remaining > 0:
                    chunk = f.read(min(1 << 20, remaining))
                    if not chunk:
                        break
                    self.wfile.write(chunk)
                    remaining -= len(chunk)

    def _list_dir(self, key: str, path: str, include_body: bool) -> None:
        """Directory listing (``worker/src/index.ts:57-63``): HTML body of
        links; files list name + size."""
        if not os.path.isdir(path):
            self.send_response(404)
            self._send_headers_common({})
            self.end_headers()
            return
        # A bare directory path ('/sub') must still produce '/sub/<name>'
        # hrefs, not '/sub<name>'.
        if key and not key.endswith("/"):
            key += "/"
        entries = sorted(os.listdir(path))
        lines = ["<html><body><ul>"]
        for name in entries:
            full = os.path.join(path, name)
            suffix = "/" if os.path.isdir(full) else ""
            size = "" if suffix else f" ({os.path.getsize(full)} bytes)"
            href = html.escape(f"/{key}{name}{suffix}")
            lines.append(f'<li><a href="{href}">{html.escape(name)}{suffix}</a>{size}</li>')
        lines.append("</ul></body></html>")
        body = "\n".join(lines).encode()
        self.send_response(200)
        self._send_headers_common(
            {"Content-Type": "text/html; charset=utf-8", "Content-Length": str(len(body))}
        )
        self.end_headers()
        if include_body:
            self.wfile.write(body)

    # ------------------------------------------------------------- verbs
    def do_GET(self) -> None:  # noqa: N802 — http.server API
        self._serve(include_body=True)

    def do_HEAD(self) -> None:  # noqa: N802
        self._serve(include_body=False)

    def do_OPTIONS(self) -> None:  # noqa: N802
        self.send_response(204)
        self._send_headers_common({})
        self.end_headers()

    def log_message(self, *args) -> None:  # quiet
        pass


class RangeFileServer:
    """Serve ``root`` over HTTP with byte-range support on a daemon thread.

    Usage::

        srv = RangeFileServer(table_root)
        url = srv.start()            # e.g. http://127.0.0.1:PORT/
        ...                          # external clients range-read parquet
        srv.stop()
    """

    def __init__(self, root: str, host: str = "127.0.0.1", port: int = 0):
        self.root = os.path.realpath(root)
        self.host, self.port = host, port
        self._httpd: ThreadingHTTPServer | None = None
        self._thread: threading.Thread | None = None

    def start(self) -> str:
        handler = type("BoundHandler", (_Handler,), {"root": self.root})
        self._httpd = ThreadingHTTPServer((self.host, self.port), handler)
        self.port = self._httpd.server_address[1]
        self._thread = threading.Thread(target=self._httpd.serve_forever, daemon=True)
        self._thread.start()
        return f"http://{self.host}:{self.port}/"

    def stop(self) -> None:
        if self._httpd is not None:
            self._httpd.shutdown()
            self._httpd.server_close()
            self._httpd = None
        if self._thread is not None:
            self._thread.join(timeout=5)
            self._thread = None

    def __enter__(self) -> "RangeFileServer":
        self.start()
        return self

    def __exit__(self, *exc) -> None:
        self.stop()
