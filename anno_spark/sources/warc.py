"""WARC source — Common-Crawl's container format → the pages table.

Real deployments read the crawl from WARC files (ISO 28500): one file
holds many records, each an HTTP response with WARC headers
(WARC-Target-URI, WARC-Date) and an HTTP payload whose body is the
HTML. Common Crawl ships them as per-record-gzipped members
concatenated into one .warc.gz — which stdlib ``gzip`` decompresses in
one call (multi-member support), so no external codec is needed.

Spark shape: ``binaryFile`` yields (path, bytes) rows — one task per
file, the natural WARC parallelism unit (files are independently
splittable only at gzip-member boundaries; at 100 TB you read the
crawl's many ~1 GB files as many tasks, not one file as many tasks).
Parsing runs in ``mapInPandas``: Arrow batches of file bytes in,
pages rows out. Response records only; others (request, metadata,
warcinfo) are skipped, as is any record without a target URI.

Synthesis (:func:`make_warc`) builds valid WARC/1.0 bytes
deterministically for tests — the parser is exercised against real
container structure, not a mock.
"""

from __future__ import annotations

import gzip
from collections.abc import Iterator
from datetime import datetime, timezone

import pandas as pd
from pyspark.sql import DataFrame, SparkSession

from .pages import PAGES_SCHEMA

CRLF = b"\r\n"


# --------------------------------------------------------------------------
# synthesis (valid WARC/1.0 bytes; stdlib only)


def make_warc_record(url: str, date: str, html: bytes) -> bytes:
    """One WARC/1.0 response record wrapping an HTTP/1.1 response."""
    http = (
        b"HTTP/1.1 200 OK" + CRLF
        + b"Content-Type: text/html; charset=utf-8" + CRLF
        + f"Content-Length: {len(html)}".encode() + CRLF
        + CRLF
        + html
    )
    headers = (
        b"WARC/1.0" + CRLF
        + b"WARC-Type: response" + CRLF
        + f"WARC-Target-URI: {url}".encode() + CRLF
        + f"WARC-Date: {date}".encode() + CRLF
        + b"WARC-Record-ID: <urn:test:" + url.encode() + b">" + CRLF
        + b"Content-Type: application/http; msgtype=response" + CRLF
        + f"Content-Length: {len(http)}".encode() + CRLF
        + CRLF
    )
    return headers + http + CRLF + CRLF


def make_warc(records: list[tuple[str, str, bytes]], gzip_members: bool = True) -> bytes:
    """Concatenate records into a .warc / .warc.gz byte stream.
    ``gzip_members=True`` compresses each record as its own gzip member
    (the Common-Crawl layout)."""
    out = b""
    for url, date, html in records:
        rec = make_warc_record(url, date, html)
        out += gzip.compress(rec) if gzip_members else rec
    return out


# --------------------------------------------------------------------------
# parsing


def _parse_warc_bytes(blob: bytes):
    """→ iterator of (url, warc_ts, html_bytes) from raw or gzipped WARC."""
    if blob[:2] == b"\x1f\x8b":
        blob = gzip.decompress(blob)  # multi-member: whole file in one call
    pos = 0
    n = len(blob)
    while pos < n:
        start = blob.find(b"WARC/1.0", pos)
        if start == -1:
            break
        head_end = blob.find(CRLF + CRLF, start)
        if head_end == -1:
            break
        headers: dict[str, str] = {}
        for line in blob[start:head_end].split(CRLF)[1:]:
            k, _, v = line.decode("utf-8", "replace").partition(":")
            headers[k.strip().lower()] = v.strip()
        length = int(headers.get("content-length", "0"))
        body = blob[head_end + 4 : head_end + 4 + length]
        pos = head_end + 4 + length
        if headers.get("warc-type") != "response":
            continue
        url = headers.get("warc-target-uri")
        if not url:
            continue
        # strip the HTTP response envelope → body is the HTML
        http_end = body.find(CRLF + CRLF)
        html = body[http_end + 4 :] if http_end != -1 else body
        ts = None
        date = headers.get("warc-date")
        if date:
            try:
                ts = datetime.fromisoformat(date.replace("Z", "+00:00")).astimezone(
                    timezone.utc
                ).replace(tzinfo=None)
            except ValueError:
                ts = None
        yield url, ts, html


def pages_from_warc(spark: SparkSession, path: str) -> DataFrame:
    """WARC files under ``path`` → the pages table (url, warc_ts, html,
    text, lang): text via the byte-identical reference extractor, lang
    via the T3 detector — same columns the Iceberg pages table carries.
    """

    def parse(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from anno_spark.core.textops import detect_language, extract_text_from_html

        for pdf in batches:
            rows = []
            for blob in pdf["content"]:
                for url, ts, html in _parse_warc_bytes(bytes(blob)):
                    text = extract_text_from_html(html.decode("utf-8", "replace"))
                    rows.append(
                        {
                            "url": url,
                            "warc_ts": ts,
                            "html": html,
                            "text": text,
                            "lang": detect_language(text),
                        }
                    )
            yield pd.DataFrame(
                rows, columns=["url", "warc_ts", "html", "text", "lang"]
            )

    files = spark.read.format("binaryFile").load(path).select("content")
    return files.mapInPandas(parse, schema=PAGES_SCHEMA)
