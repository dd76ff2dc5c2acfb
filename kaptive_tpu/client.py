r"""HTTP client for the Kaptive-Web API.

Capability parity with ``/root/reference/src/kaptive/client.py:27-183``:
submit genome assemblies (multipart form), poll runs, download JSONL results;
stdlib-urllib only, with gzip response handling and detailed error translation.
"""

from __future__ import annotations

import gzip
import json
import mimetypes
import os
import uuid
from typing import Any
from urllib.error import HTTPError, URLError
from urllib.parse import quote
from urllib.request import Request, urlopen


class KaptiveWebClientError(Exception):
    r"""Raised for HTTP network errors or API protocol failures."""


class KaptiveWebClient:
    r"""Client for Kaptive-Web API endpoints (auth header, multipart upload, polling)."""

    def __init__(self, api_key: str, base_url: str = "http://127.0.0.1:8000") -> None:
        self.api_key = api_key
        self.base_url = base_url.rstrip("/")
        if not self.base_url.endswith("/api"):
            self.base_url += "/api"

    def _request(
        self,
        endpoint: str,
        method: str = "GET",
        data: bytes | None = None,
        headers: dict[str, str] | None = None,
    ) -> Any:
        url = f"{self.base_url}{endpoint}"
        req_headers = {"X-API-Key": self.api_key, "Accept": "application/json"}
        if headers:
            req_headers.update(headers)
        req = Request(url, data=data, method=method, headers=req_headers)
        try:
            with urlopen(req) as response:
                body = response.read()
                if response.info().get("Content-Encoding") == "gzip":
                    body = gzip.decompress(body)
                if response.info().get_content_type() == "application/json":
                    return json.loads(body.decode("utf-8"))
                return body
        except HTTPError as e:
            try:
                err_data = json.loads(e.read().decode("utf-8"))
                detail = err_data.get("detail", str(e))
            except Exception:
                detail = str(e)
            raise KaptiveWebClientError(f"HTTP {e.code}: {detail}")
        except URLError as e:
            raise KaptiveWebClientError(
                f"Network error: Failed to connect to {self.base_url}. "
                f"Ensure you have an active internet connection. ({e.reason})"
            )

    @staticmethod
    def _build_multipart_form(files: list[str]) -> tuple[bytes, str]:
        boundary = uuid.uuid4().hex
        body = bytearray()
        for file_path in files:
            filename = os.path.basename(file_path)
            mime_type, _ = mimetypes.guess_type(file_path)
            if not mime_type:
                mime_type = "application/octet-stream"
            body.extend(f"--{boundary}\r\n".encode())
            body.extend(
                f'Content-Disposition: form-data; name="files"; filename="{filename}"\r\n'.encode()
            )
            body.extend(f"Content-Type: {mime_type}\r\n\r\n".encode())
            with open(file_path, "rb") as f:
                body.extend(f.read())
            body.extend(b"\r\n")
        body.extend(f"--{boundary}--\r\n".encode())
        content_type = f"multipart/form-data; boundary={boundary}"
        return bytes(body), content_type

    def submit_genomes(self, species: str, files: list[str]) -> str:
        body, content_type = self._build_multipart_form(files)
        endpoint = f"/serotype/{quote(species)}"
        response = self._request(
            endpoint, method="POST", data=body, headers={"Content-Type": content_type}
        )
        return response.get("run_id")

    def get_run(self, run_id: str) -> dict[str, Any]:
        return self._request(f"/serotype/runs/{run_id}", method="GET")

    def download_jsonl(self, genome_ids: list[str]) -> bytes:
        data = json.dumps({"genome_ids": genome_ids}).encode("utf-8")
        return self._request(
            "/serotype/results/download/jsonl",
            method="POST",
            data=data,
            headers={"Content-Type": "application/json"},
        )
