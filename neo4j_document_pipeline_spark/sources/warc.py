"""WARC source — read Common-Crawl-style WARC files into the pages table.

Common Crawl ships crawls as WARC (ISO 28500) files: a sequence of
records, each with \r\n-terminated headers, a blank line, a body of
exactly Content-Length bytes, and a trailing \r\n\r\n. This reader turns
``response`` records into rows of the canonical pages schema
(url, warc_ts, html, text, lang):

- url       <- WARC-Target-URI
- warc_ts   <- WARC-Date (ISO-8601)
- html      <- the HTTP response payload (bytes after the HTTP header
               block when the body is an HTTP response, else the raw body)
- text      <- NULL: extraction happens in the pipeline via
               ``text_source='html'`` (functions/text.py::py_html_to_text)
- lang      <- WARC-Identified-Content-Language when present, else NULL

Implementation: ``spark.read.format('binaryFile')`` distributes whole
files to executors (one WARC file = one task, matching Common Crawl's
~1GB-per-file layout where parallelism comes from file count); parsing
is a pure-Python ``mapInPandas`` over the file bytes — no external WARC
library. Gzip members (.warc.gz) are decompressed with stdlib zlib.

No reference analogue (the reference ingests uploaded markdown,
main.py:479-495); this source exists for the north rule's
Common-Crawl-style input.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession

from neo4j_document_pipeline_spark.sources.pages import PAGES_SCHEMA


def parse_warc_bytes(data: bytes) -> list[dict]:
    """Parse one WARC file's bytes into pages-shaped dicts (pure python,
    deterministic). Tolerant: malformed records are skipped, parsing
    continues at the next 'WARC/' magic."""
    if data[:2] == b"\x1f\x8b":  # gzip (possibly multi-member, as CC ships)
        import zlib
        out = bytearray()
        d = zlib.decompressobj(16 + zlib.MAX_WBITS)
        buf = data
        while buf:
            out += d.decompress(buf)
            buf = d.unused_data
            if buf:
                d = zlib.decompressobj(16 + zlib.MAX_WBITS)
        data = bytes(out)

    rows: list[dict] = []
    pos = 0
    n = len(data)
    while pos < n:
        start = data.find(b"WARC/", pos)
        if start < 0:
            break
        hdr_end = data.find(b"\r\n\r\n", start)
        if hdr_end < 0:
            break
        headers: dict[str, str] = {}
        for line in data[start:hdr_end].split(b"\r\n")[1:]:
            k, _, v = line.partition(b":")
            if _:
                headers[k.strip().decode("ascii", "replace").lower()] = \
                    v.strip().decode("utf-8", "replace")
        try:
            clen = int(headers.get("content-length", ""))
        except ValueError:
            pos = hdr_end + 4
            continue
        body = data[hdr_end + 4:hdr_end + 4 + clen]
        pos = hdr_end + 4 + clen

        if headers.get("warc-type") != "response":
            continue
        url = headers.get("warc-target-uri")
        if not url:
            continue
        # an HTTP response body: drop the HTTP header block
        payload = body
        if body[:5] in (b"HTTP/",):
            http_end = body.find(b"\r\n\r\n")
            if http_end >= 0:
                payload = body[http_end + 4:]
        rows.append({
            "url": url,
            "warc_ts": headers.get("warc-date"),
            "html": payload,
            "text": None,
            "lang": headers.get("warc-identified-content-language"),
        })
    return rows


def read_warc_pages(spark: SparkSession, path: str) -> DataFrame:
    """WARC file glob -> pages DataFrame. One input file per task
    (binaryFile source); at CC scale parallelism = number of WARC files,
    which is exactly how Common Crawl partitions a crawl."""
    files = spark.read.format("binaryFile").load(path).select("content")

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows: list[dict] = []
            for blob in pdf["content"]:
                rows.extend(parse_warc_bytes(bytes(blob)))
            out = pd.DataFrame(
                rows, columns=["url", "warc_ts", "html", "text", "lang"])
            if len(out):
                out["warc_ts"] = pd.to_datetime(
                    out["warc_ts"], utc=True, errors="coerce"
                ).dt.tz_localize(None)
            yield out

    return files.mapInPandas(gen, schema=PAGES_SCHEMA)


def make_warc_bytes(records: list[tuple[str, str, bytes]],
                    gzip_compress: bool = False) -> bytes:
    """Synthesize a minimal valid WARC file for tests/fixtures:
    records = [(url, iso_ts, html_bytes)]. Includes a warcinfo record and
    HTTP response headers, like real CC files."""
    out = bytearray()

    def rec(warc_headers: list[tuple[str, str]], body: bytes):
        hdr = b"WARC/1.0\r\n" + b"".join(
            f"{k}: {v}\r\n".encode() for k, v in warc_headers
        ) + f"Content-Length: {len(body)}\r\n".encode()
        out.extend(hdr + b"\r\n" + body + b"\r\n\r\n")

    rec([("WARC-Type", "warcinfo")], b"software: synthetic\r\n")
    for url, ts, html in records:
        http = (b"HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n\r\n" + html)
        rec([("WARC-Type", "response"),
             ("WARC-Target-URI", url),
             ("WARC-Date", ts)], http)
    data = bytes(out)
    if gzip_compress:
        import gzip as _gz
        data = _gz.compress(data)
    return data
