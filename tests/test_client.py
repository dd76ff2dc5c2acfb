"""Kaptive-Web API client against a localhost HTTP server.

Exercises the real request path (ref ``client.py:27-183``): auth header,
multipart genome upload, run polling, gzip-encoded JSONL download, and the
HTTP/network error translation — no mocking of urllib, a live
``http.server`` answers every request.
"""

import gzip
import http.server
import json
import threading

import pytest

from kaptive_tpu.client import KaptiveWebClient, KaptiveWebClientError


class _ApiHandler(http.server.BaseHTTPRequestHandler):
    seen: list[dict] = []

    def log_message(self, *a):
        pass

    def _record(self, body: bytes):
        type(self).seen.append({
            "path": self.path,
            "method": self.command,
            "api_key": self.headers.get("X-API-Key"),
            "content_type": self.headers.get("Content-Type", ""),
            "body": body,
        })

    def _json(self, obj, code=200):
        payload = json.dumps(obj).encode()
        self.send_response(code)
        self.send_header("Content-Type", "application/json")
        self.end_headers()
        self.wfile.write(payload)

    def do_POST(self):
        body = self.rfile.read(int(self.headers.get("Content-Length", 0)))
        self._record(body)
        if self.path.startswith("/api/serotype/results/download/jsonl"):
            lines = b'{"genome":"g1"}\n{"genome":"g2"}\n'
            gz = gzip.compress(lines)
            self.send_response(200)
            self.send_header("Content-Type", "application/jsonl")
            self.send_header("Content-Encoding", "gzip")
            self.end_headers()
            self.wfile.write(gz)
        elif self.path.startswith("/api/serotype/bad"):
            self._json({"detail": "species not recognised"}, code=422)
        elif self.path.startswith("/api/serotype/"):
            self._json({"run_id": "run-123"})
        else:
            self._json({"detail": "not found"}, code=404)

    def do_GET(self):
        self._record(b"")
        if self.path.startswith("/api/serotype/runs/"):
            self._json({"run_id": self.path.rsplit("/", 1)[-1], "status": "complete"})
        else:
            self._json({"detail": "not found"}, code=404)


@pytest.fixture()
def api_server():
    _ApiHandler.seen = []
    server = http.server.ThreadingHTTPServer(("127.0.0.1", 0), _ApiHandler)
    threading.Thread(target=server.serve_forever, daemon=True).start()
    try:
        yield f"http://127.0.0.1:{server.server_address[1]}", _ApiHandler.seen
    finally:
        server.shutdown()


def test_submit_poll_download_roundtrip(api_server, tmp_path):
    base, seen = api_server
    client = KaptiveWebClient("secret-key", base_url=base)
    f1 = tmp_path / "g1.fasta"
    f1.write_bytes(b">c1\nACGT\n")
    f2 = tmp_path / "g2.fasta"
    f2.write_bytes(b">c1\nTTTT\n")

    run_id = client.submit_genomes("Klebsiella pneumoniae", [str(f1), str(f2)])
    assert run_id == "run-123"
    submit = seen[0]
    assert submit["path"] == "/api/serotype/Klebsiella%20pneumoniae"
    assert submit["api_key"] == "secret-key"
    assert submit["content_type"].startswith("multipart/form-data; boundary=")
    # Both files rode the multipart body with their names and contents.
    assert b'filename="g1.fasta"' in submit["body"] and b">c1\nACGT" in submit["body"]
    assert b'filename="g2.fasta"' in submit["body"] and b">c1\nTTTT" in submit["body"]

    run = client.get_run(run_id)
    assert run == {"run_id": "run-123", "status": "complete"}

    jsonl = client.download_jsonl(["g1", "g2"])
    # gzip transport transparently decoded; request carried the id list.
    assert jsonl == b'{"genome":"g1"}\n{"genome":"g2"}\n'
    assert json.loads(seen[-1]["body"]) == {"genome_ids": ["g1", "g2"]}


def test_http_error_translates_detail(api_server, tmp_path):
    base, _ = api_server
    client = KaptiveWebClient("k", base_url=base)
    f = tmp_path / "g.fasta"
    f.write_bytes(b">c\nA\n")
    with pytest.raises(KaptiveWebClientError, match="HTTP 422: species not recognised"):
        client.submit_genomes("bad", [str(f)])


def test_connection_error_translates(tmp_path):
    client = KaptiveWebClient("k", base_url="http://127.0.0.1:9")  # nothing listens
    with pytest.raises(KaptiveWebClientError, match="Network error"):
        client.get_run("x")


def test_base_url_api_suffix():
    assert KaptiveWebClient("k", "http://h:1/").base_url == "http://h:1/api"
    assert KaptiveWebClient("k", "http://h:1/api").base_url == "http://h:1/api"
