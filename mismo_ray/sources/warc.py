"""WARC (Web ARChive, ISO 28500) source — the container Common Crawl ships.

A 100 TB crawl usually arrives as ``*.warc.gz`` segments, not parquet; this
module turns them into the engine's canonical page table
``(url, warc_ts, html: binary, record_type, content_type)`` — the
input_hint shape — so every downstream pipeline (ER, crawl_clean, dedupe)
runs unchanged on raw crawl data.

Design:

- ``read_warc``: ``ray.data.read_binary_files`` (one task per segment —
  Common Crawl segments are ~1 GB, the natural parallel unit; a 100 TB
  crawl is ~100k files, far more than the cluster's cores, so per-file
  parallelism saturates the read) followed by one ``map_batches`` parser.
  Gzip members are decompressed with zlib in streaming windows
  (Common-Crawl files are per-record gzip members concatenated; python
  ``gzip`` handles the concatenation). The parser is pure-python over
  bytes — WARC is a header-delimited binary format with explicit
  Content-Length, so parsing is O(bytes) with no regex backtracking.
- ``write_warc``: a spec-correct writer (used by tests and by exporters) —
  one ``warcinfo`` record followed by one ``response`` record per page,
  with valid HTTP/1.1 response payloads.

WARC record grammar (ISO 28500 §4): ``WARC/1.0 CRLF`` + named headers +
``CRLF CRLF`` + exactly ``Content-Length`` payload bytes + ``CRLF CRLF``.
Response records carry an HTTP response as payload; the page body is
everything after the HTTP header terminator.

No reference analog (mismo reads tables only); this is webtext-tier source
infrastructure alongside sources.read_records.
"""

from __future__ import annotations

import datetime
import gzip
import io
from collections.abc import Sequence

import pyarrow as pa
import ray.data

__all__ = ["read_warc", "parse_warc_bytes", "write_warc"]

_CRLF = b"\r\n"
_HDR_END = b"\r\n\r\n"


def parse_warc_bytes(data: bytes) -> list[dict]:
    """Parse one WARC file's bytes into records:
    (record_type, url, warc_ts, content_type, html). Non-response records
    keep their payload in ``html`` untouched; malformed trailing bytes end
    the scan (truncated segment tails are routine in crawl data)."""
    if data[:2] == b"\x1f\x8b":
        data = gzip.decompress(data)
    out: list[dict] = []
    pos = 0
    n = len(data)
    while pos < n:
        # skip inter-record blank lines
        while data.startswith(_CRLF, pos):
            pos += 2
        if pos >= n:
            break
        hdr_end = data.find(_HDR_END, pos)
        if hdr_end < 0 or not data.startswith(b"WARC/", pos):
            break
        headers: dict[str, str] = {}
        for line in data[pos:hdr_end].split(_CRLF)[1:]:
            k, _, v = line.partition(b":")
            headers[k.strip().lower().decode("ascii", "replace")] = (
                v.strip().decode("utf-8", "replace")
            )
        try:
            length = int(headers.get("content-length", ""))
        except ValueError:
            break
        body_start = hdr_end + len(_HDR_END)
        body = data[body_start : body_start + length]
        if len(body) < length:
            break  # truncated tail
        pos = body_start + length
        rtype = headers.get("warc-type", "")
        url = headers.get("warc-target-uri")
        ts = headers.get("warc-date")
        payload = body
        content_type = headers.get("content-type")
        if rtype == "response" and body[:5] in (b"HTTP/",):
            http_end = body.find(_HDR_END)
            if http_end >= 0:
                for line in body[:http_end].split(_CRLF)[1:]:
                    k, _, v = line.partition(b":")
                    if k.strip().lower() == b"content-type":
                        content_type = v.strip().decode("utf-8", "replace")
                payload = body[http_end + len(_HDR_END) :]
        out.append(
            {
                "record_type": rtype,
                "url": url,
                "warc_ts": (
                    datetime.datetime.fromisoformat(ts.replace("Z", "+00:00"))
                    .replace(tzinfo=None)
                    if ts
                    else None
                ),
                "content_type": content_type,
                "html": payload,
            }
        )
    return out


def read_warc(
    paths: str | Sequence[str],
    *,
    record_types: Sequence[str] = ("response",),
) -> ray.data.Dataset:
    """Read WARC segment(s) into the canonical page table
    ``(url, warc_ts, html, record_type, content_type)``.

    ``paths`` is a file, directory, or list (anything
    ``ray.data.read_binary_files`` accepts); ``.gz`` members are handled.
    ``record_types`` filters records (default: response only — request /
    metadata / warcinfo records carry no page body).
    """
    files = ray.data.read_binary_files(paths)

    def parse(t: pa.Table) -> pa.Table:
        rows = {
            "url": [],
            "warc_ts": [],
            "html": [],
            "record_type": [],
            "content_type": [],
        }
        for blob in t["bytes"]:
            for rec in parse_warc_bytes(blob.as_py()):
                if record_types and rec["record_type"] not in record_types:
                    continue
                rows["url"].append(rec["url"])
                rows["warc_ts"].append(rec["warc_ts"])
                rows["html"].append(rec["html"])
                rows["record_type"].append(rec["record_type"])
                rows["content_type"].append(rec["content_type"])
        return pa.table(
            {
                "url": pa.array(rows["url"], type=pa.string()),
                "warc_ts": pa.array(rows["warc_ts"], type=pa.timestamp("us")),
                "html": pa.array(rows["html"], type=pa.binary()),
                "record_type": pa.array(rows["record_type"], type=pa.string()),
                "content_type": pa.array(rows["content_type"], type=pa.string()),
            }
        )

    return files.map_batches(parse, batch_format="pyarrow")


def _record(
    rtype: str,
    headers: dict[str, str],
    payload: bytes,
) -> bytes:
    buf = io.BytesIO()
    buf.write(b"WARC/1.0\r\n")
    buf.write(f"WARC-Type: {rtype}\r\n".encode())
    for k, v in headers.items():
        buf.write(f"{k}: {v}\r\n".encode())
    buf.write(f"Content-Length: {len(payload)}\r\n".encode())
    buf.write(_CRLF)
    buf.write(payload)
    buf.write(_HDR_END)
    return buf.getvalue()


def write_warc(
    path: str,
    pages: Sequence[dict],
    *,
    compress: bool | None = None,
) -> int:
    """Write pages (dicts with url, warc_ts (datetime), html (bytes)) as a
    WARC file with one warcinfo record + one response record per page.
    ``compress`` defaults to the path suffix (``.gz``). Returns the number
    of response records written."""
    if compress is None:
        compress = path.endswith(".gz")
    body = io.BytesIO()
    info_payload = b"software: mismo_ray\r\nformat: WARC File Format 1.0\r\n"
    body.write(
        _record(
            "warcinfo",
            {
                "WARC-Date": "2024-01-01T00:00:00Z",
                "Content-Type": "application/warc-fields",
            },
            info_payload,
        )
    )
    n = 0
    for p in pages:
        html = p["html"]
        if isinstance(html, str):
            html = html.encode("utf-8")
        ts = p.get("warc_ts")
        ts_s = (
            ts.strftime("%Y-%m-%dT%H:%M:%SZ")
            if isinstance(ts, datetime.datetime)
            else "2024-01-01T00:00:00Z"
        )
        http = (
            b"HTTP/1.1 200 OK\r\nContent-Type: text/html; charset=utf-8\r\n"
            + f"Content-Length: {len(html)}\r\n".encode()
            + _CRLF
            + html
        )
        body.write(
            _record(
                "response",
                {
                    "WARC-Target-URI": p["url"],
                    "WARC-Date": ts_s,
                    "Content-Type": "application/http; msgtype=response",
                },
                http,
            )
        )
        n += 1
    raw = body.getvalue()
    if compress:
        raw = gzip.compress(raw)
    with open(path, "wb") as f:
        f.write(raw)
    return n
