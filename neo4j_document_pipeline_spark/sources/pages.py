"""Deterministic synthetic ``pages`` table (the pipeline's primary input).

Schema per BASELINE.json input_hint:
    url string, warc_ts timestamp, html binary, text string, lang string

Generated DISTRIBUTED via ``spark.range(n)`` + ``mapInPandas`` so the
generator itself scales: content is a pure function of (row index, seed) —
no driver-side materialization, no wall clock (warc_ts = fixed epoch + i
seconds, FIXTURES.md §1).

Document families (FIXTURES.md §1), cycled by index:
  0: SVO prose matching the frozen ruleset
  1: markdown tables (exercises the table extractor)
  2: timeline sentences -> {start,end} objects
  3: distribution sentences -> {pillar:{term:count}} objects
  4: whitespace-adversarial (CRLF / \r / runs) for byte-identity tests
  5: duplicate content under a different url (same doc_id downstream)
  6: near-duplicate entity names (entity-linking / CC test material)
Rows 0-1 embed the two reference fixture docs verbatim (byte-exact text).

Domains are Zipf-skewed (s≈1.2 over 100 hosts) so head-domain skew
handling is actually exercised at bench scale.
"""

from __future__ import annotations

from datetime import datetime, timezone

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession

PAGES_SCHEMA = "url string, warc_ts timestamp, html binary, text string, lang string"

_EPOCH = datetime(2025, 11, 28, tzinfo=timezone.utc)

_FIXTURE_PATHS = [
    "/root/reference/Test Files/house_of_wisdom_baghdad.markdown",
    "/root/reference/Test Files/vaseline_benefits.markdown",
]

_SCHOLARS = ["Al-Farabi", "Ibn Sina", "Al-Biruni", "Omar Khayyam", "Ibn Rushd",
             "Al-Tusi", "Ibn Khaldun", "Al-Zahrawi"]
_WORKS = ["algebra", "optics", "trigonometry", "medicine", "astronomy",
          "cartography", "philosophy", "chemistry"]
_ORGS = ["Digital Ministry", "Energy Council", "Transport Agency",
         "Health Authority", "Education Ministry"]
_THINGS = ["Broadband Initiative", "Solar Programme", "Rail Strategy",
           "Telehealth Platform", "Literacy Policy"]
_PILLARS = ["Digital Pillar", "Green Pillar", "Social Pillar"]


from functools import lru_cache


@lru_cache(maxsize=8)
def _zipf_cdf(n_hosts: int, s: float):
    ranks = np.arange(1, n_hosts + 1, dtype=np.float64)
    w = ranks ** -s
    return np.cumsum(w) / w.sum()


def _zipf_domain(i: int, n_hosts: int = 100, s: float = 1.2) -> str:
    """Deterministic Zipf-ish host pick: rank r w.p. proportional to r^-s."""
    # inverse-CDF on a fixed pseudo-random uniform from the index; the CDF
    # depends only on (n_hosts, s) — cached, not rebuilt per generated row
    u = ((i * 2654435761) % 2**32) / 2**32
    r = int(np.searchsorted(_zipf_cdf(n_hosts, s), u))
    return f"site{r:03d}.example.org"


def make_text(i: int, paras: int = 1) -> str:
    """Pure function index -> document text.

    ``paras > 1`` concatenates that many DISTINCT sections (parameterized
    by a different sub-index each) to emulate realistic Common-Crawl page
    sizes (~2-50 KB) for throughput/scaling runs; tests use paras=1."""
    if paras > 1:
        return "\n\n".join(
            _make_section(i * 1_000_003 + j) for j in range(paras))
    return _make_section(i)


def _make_section(i: int) -> str:
    fam = i % 7
    s1 = _SCHOLARS[i % len(_SCHOLARS)]
    s2 = _SCHOLARS[(i // 7) % len(_SCHOLARS)]
    w1 = _WORKS[i % len(_WORKS)]
    w2 = _WORKS[(i // 3) % len(_WORKS)]
    org = _ORGS[i % len(_ORGS)]
    thing = _THINGS[i % len(_THINGS)]
    pillar = _PILLARS[i % len(_PILLARS)]
    y0 = 2000 + (i % 20)
    y1 = y0 + 1 + (i % 5)

    if fam == 0:
        return (
            f"# Chronicle {i}\n\n"
            f"{s1} developed {w1} during long study. {s2} authored {w2} treatises.\n\n"
            f"The {org} supports {w1} research. The {thing} targets rural coverage.\n\n"
            f"{s1} founded the Observatory of Knowledge. The {org} is a public body."
        )
    if fam == 1:
        return (
            f"# Registry {i}\n\n"
            f"| Name | Field | Era |\n| --- | --- | --- |\n"
            f"| {s1} | {w1} | {y0}s |\n| {s2} | {w2} | {y1}s |\n"
            f"| Scholar {i} | geometry | classical |\n"
        )
    if fam == 2:
        return (
            f"# Plan {i}\n\n"
            f"{thing} runs from {y0} to {y1}. "
            f"Mentor Cycle {i % 11} spans from {y0 - 10} to {y0}.\n\n"
            f"{org} oversees the schedule."
        )
    if fam == 3:
        terms = f"training {2 + i % 5}, grants {1 + i % 7}, labs {i % 3}, total {9 + i % 9}"
        return (
            f"# Report {i}\n\n"
            f"{org} reports initiative counts for {pillar}: {terms}.\n\n"
            f"The {thing} promotes inclusion."
        )
    if fam == 4:
        return (
            f"# Messy {i}\r\n\r\n\r\n\r\nLine with trailing   \t\r\n"
            f"{s1}  developed\t {w1}.\r\r\n\nDouble  spaced   text here.\t\t\r\n"
        )
    if fam == 5:
        return _make_section(i - 5)  # duplicate of an earlier fam-0 doc
    # fam == 6: near-duplicate entity names for linking/CC tests
    variant = ["Phase Two Programme", "phase 2 programme", "Phase-2 Programme",
               "PHASE TWO PROGRAMME"][i % 4]
    return (
        f"# Variants {i}\n\n"
        f"The {variant} supports {w1} adoption. {s1} leads the {variant}.\n\n"
        f"Cluster Seed {i % 13} includes member {i % 29}."
    )


def _html_wrap(text: str) -> bytes:
    body = "".join(f"<p>{ln}</p>" for ln in text.split("\n\n"))
    return f"<html><body>{body}</body></html>".encode("utf-8")


def synth_pages(spark: SparkSession, n: int, seed: int = 42,
                partitions: int | None = None, paras: int = 1) -> DataFrame:
    """Distributed deterministic pages generator."""
    base = spark.range(0, n, 1, partitions or spark.sparkContext.defaultParallelism)

    fixture_texts = []
    for p in _FIXTURE_PATHS:
        try:
            with open(p, encoding="utf-8") as f:
                fixture_texts.append(f.read())
        except OSError:
            pass

    epoch = _EPOCH

    def gen(batches):
        for pdf in batches:
            idx = pdf["id"].to_numpy()
            rows = []
            for i in idx:
                i = int(i)
                if i < len(fixture_texts):
                    text = fixture_texts[i]
                    url = f"https://fixtures.example.org/doc{i:06d}"
                else:
                    text = make_text(i, paras)
                    url = f"https://{_zipf_domain(i)}/doc{i:06d}"
                rows.append({
                    "url": url,
                    "warc_ts": epoch + pd.Timedelta(seconds=i),
                    "html": _html_wrap(text),
                    "text": text,
                    "lang": "ms" if i % 10 == 9 else "en",
                })
            yield pd.DataFrame(rows, columns=["url", "warc_ts", "html", "text", "lang"])

    return base.mapInPandas(gen, schema=PAGES_SCHEMA)


def _pages_manifest(path: str) -> dict | None:
    """Manifest of a GraphStore-managed pages table dir (the snapshot
    pointer), or None for a plain parquet directory."""
    import json
    import os
    try:
        with open(os.path.join(path, "_manifest.json")) as f:
            man = json.load(f)
        if os.path.isdir(os.path.join(path, man["version"])):
            return man
    except (OSError, json.JSONDecodeError, KeyError, TypeError):
        pass
    return None


def read_pages_resolved(spark: SparkSession,
                        path: str) -> tuple[DataFrame, str | None]:
    """(DataFrame, snapshot identity | None) from ONE manifest read: the
    version directory the frame scans IS the version the resume key
    names. Deriving the two from separate manifest reads (the old
    read_pages + pages_identity pair) let a concurrent writer commit in
    between, keying resume on a snapshot whose content was never
    ingested (round-3 advisory). Plain parquet dirs return identity None
    (callers fall back to the content-crc resume key)."""
    import os
    man = _pages_manifest(path)
    if man:
        df = spark.read.parquet(os.path.join(path, man["version"]))
        return df, f"pages-snap:{man['version']}:{man.get('rows')}"
    return spark.read.parquet(path), None


def read_pages(spark: SparkSession, path: str) -> DataFrame:
    """Scan a persisted pages table. A GraphStore-managed dir (snapshot
    manifest present) reads its committed version; a plain parquet dir
    reads directly (Iceberg would slot in here)."""
    return read_pages_resolved(spark, path)[0]


def pages_identity(path: str) -> str | None:
    """Committed-snapshot identity of a manifested pages table — the
    resume key run_pipeline uses INSTEAD of crc-scanning the whole text
    column (the Iceberg snapshot-id analogue; round-2 verdict item 3).
    None for plain parquet dirs, which keep the content-crc fallback."""
    man = _pages_manifest(path)
    if man:
        return f"pages-snap:{man['version']}:{man.get('rows')}"
    return None
