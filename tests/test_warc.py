"""WARC source tests — Common-Crawl-style file parsing into pages."""

import pytest
from pyspark.sql import functions as F

from neo4j_document_pipeline_spark.sources.pages import make_text, _html_wrap
from neo4j_document_pipeline_spark.sources.warc import (
    make_warc_bytes,
    parse_warc_bytes,
    read_warc_pages,
)


def _records(n=5):
    return [(f"https://site{i:03d}.example.org/doc{i:06d}",
             f"2025-11-28T00:00:{i:02d}Z",
             _html_wrap(make_text(i, paras=2)))
            for i in range(n)]


def test_parse_warc_roundtrip_plain_and_gzip():
    recs = _records(5)
    for gz in (False, True):
        rows = parse_warc_bytes(make_warc_bytes(recs, gzip_compress=gz))
        assert len(rows) == 5  # warcinfo record skipped
        for (url, ts, html), row in zip(recs, rows):
            assert row["url"] == url
            assert row["html"] == html  # HTTP headers stripped, body exact
            assert row["text"] is None


def test_parse_warc_skips_malformed_records():
    recs = _records(2)
    data = make_warc_bytes(recs)
    # corrupt the middle: garbage between records must not derail parsing
    data = data.replace(b"WARC/1.0\r\nWARC-Type: response\r\n",
                        b"GARBAGE\r\nWARC/1.0\r\nWARC-Type: response\r\n", 1)
    rows = parse_warc_bytes(data)
    assert [r["url"] for r in rows] == [u for u, _, _ in recs]


def test_read_warc_pages_to_documents(spark, tmp_path):
    """WARC -> pages -> (html extraction) -> documents: the full CC entry
    path, byte-identical text per url."""
    from neo4j_document_pipeline_spark.operators.ingest import (
        pages_to_documents)
    recs = _records(6)
    wdir = tmp_path / "warcs"
    wdir.mkdir()
    (wdir / "a.warc").write_bytes(make_warc_bytes(recs[:3]))
    (wdir / "b.warc.gz").write_bytes(make_warc_bytes(recs[3:], gzip_compress=True))

    pages = read_warc_pages(spark, str(wdir))
    got = {r["url"]: r for r in pages.collect()}
    assert len(got) == 6
    assert got[recs[0][0]]["warc_ts"] is not None
    assert all(r["text"] is None for r in got.values())

    docs = pages_to_documents(pages, text_source="html")
    texts = {r["url"]: r["text"] for r in docs.collect()}
    from neo4j_document_pipeline_spark.functions.text import py_canonicalize
    for url, _, html in recs:
        want = py_canonicalize(
            __import__("neo4j_document_pipeline_spark.functions.text",
                       fromlist=["py_html_to_text"]).py_html_to_text(html))
        assert texts[url] == want
