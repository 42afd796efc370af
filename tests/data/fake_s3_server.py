"""In-process fake S3 endpoint for store tests: a ThreadingHTTPServer that
speaks the subset of the S3 REST dialect S3ObjectStore uses (the house
fake-S3 style; reference analog: test_build_feature_bucket.py:169-237 fakes
the boto3 client the same way at the SDK layer)."""

from __future__ import annotations

import threading
import urllib.parse
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from xml.sax.saxutils import escape


class FakeS3State:
    def __init__(self) -> None:
        self.objects: dict[tuple[str, str], bytes] = {}
        self.lock = threading.Lock()
        # Observability for assertions.
        self.requests: list[tuple[str, str]] = []
        self.auth_headers: list[str | None] = []
        # Fault injection: fail this many requests with 500 before serving.
        self.failures_remaining = 0
        # Small page size so pagination is actually exercised.
        self.max_keys = 1000


class _Handler(BaseHTTPRequestHandler):
    state: FakeS3State  # set by make_server

    def log_message(self, *args):  # silence
        pass

    def _split(self) -> tuple[str, str, dict[str, list[str]]]:
        parsed = urllib.parse.urlsplit(self.path)
        parts = parsed.path.lstrip("/").split("/", 1)
        bucket = parts[0]
        key = urllib.parse.unquote(parts[1]) if len(parts) > 1 else ""
        return bucket, key, urllib.parse.parse_qs(parsed.query)

    def _record(self) -> bool:
        """Track the request; return False if fault injection consumed it."""
        st = self.state
        with st.lock:
            st.requests.append((self.command, self.path))
            st.auth_headers.append(self.headers.get("Authorization"))
            if st.failures_remaining > 0:
                st.failures_remaining -= 1
                self.send_response(500)
                self.end_headers()
                return False
        return True

    def do_PUT(self):
        if not self._record():
            return
        bucket, key, _ = self._split()
        length = int(self.headers.get("Content-Length", "0"))
        data = self.rfile.read(length)
        with self.state.lock:
            self.state.objects[(bucket, key)] = data
        self.send_response(200)
        self.end_headers()

    def do_GET(self):
        if not self._record():
            return
        bucket, key, query = self._split()
        if not key and "list-type" in query:
            return self._list(bucket, query)
        with self.state.lock:
            data = self.state.objects.get((bucket, key))
        if data is None:
            self.send_response(404)
            self.end_headers()
            return
        self.send_response(200)
        self.send_header("Content-Length", str(len(data)))
        self.end_headers()
        self.wfile.write(data)

    def do_HEAD(self):
        if not self._record():
            return
        bucket, key, _ = self._split()
        with self.state.lock:
            present = (bucket, key) in self.state.objects
        self.send_response(200 if present else 404)
        self.end_headers()

    def do_DELETE(self):
        if not self._record():
            return
        bucket, key, _ = self._split()
        with self.state.lock:
            self.state.objects.pop((bucket, key), None)
        self.send_response(204)
        self.end_headers()

    def _list(self, bucket: str, query: dict[str, list[str]]):
        prefix = query.get("prefix", [""])[0]
        token = query.get("continuation-token", [None])[0]
        with self.state.lock:
            keys = sorted(
                k for (b, k) in self.state.objects if b == bucket
                and k.startswith(prefix)
            )
            page_size = self.state.max_keys
        start = int(token) if token else 0
        page = keys[start : start + page_size]
        truncated = start + page_size < len(keys)
        parts = ['<?xml version="1.0"?>']
        parts.append(
            '<ListBucketResult xmlns="http://s3.amazonaws.com/doc/2006-03-01/">'
        )
        for key in page:
            parts.append(f"<Contents><Key>{escape(key)}</Key></Contents>")
        parts.append(f"<IsTruncated>{'true' if truncated else 'false'}</IsTruncated>")
        if truncated:
            parts.append(
                f"<NextContinuationToken>{start + page_size}</NextContinuationToken>"
            )
        parts.append("</ListBucketResult>")
        body = "".join(parts).encode()
        self.send_response(200)
        self.send_header("Content-Type", "application/xml")
        self.send_header("Content-Length", str(len(body)))
        self.end_headers()
        self.wfile.write(body)


def make_server() -> tuple[ThreadingHTTPServer, FakeS3State, str]:
    """Start a fake S3 endpoint on an ephemeral port; returns
    (server, state, endpoint_url). Caller shuts the server down."""
    state = FakeS3State()
    handler = type("BoundHandler", (_Handler,), {"state": state})
    server = ThreadingHTTPServer(("127.0.0.1", 0), handler)
    thread = threading.Thread(target=server.serve_forever, daemon=True)
    thread.start()
    endpoint = f"http://127.0.0.1:{server.server_address[1]}"
    return server, state, endpoint
