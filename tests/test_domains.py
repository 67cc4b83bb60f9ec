"""Domain-level hygiene (operators/domains.py + the host/registered-
domain column functions): extraction known values, census hand values,
two-phase cap == single-window brute parity, flag semantics."""

import hashlib

import pytest
from pyspark.sql import functions as F

from neo4j_document_pipeline_spark.functions.textstats import (
    col_registered_domain,
    col_url_host,
)
from neo4j_document_pipeline_spark.operators.domains import (
    domain_cap_sample,
    domain_census,
    domain_filter_flags,
)


def _hostdom(spark, urls):
    df = spark.createDataFrame([(u,) for u in urls], "url string")
    rows = df.select(
        "url",
        col_url_host(F.col("url")).alias("host"),
        col_registered_domain(col_url_host(F.col("url"))).alias("dom"),
    ).collect()
    return {r["url"]: (r["host"], r["dom"]) for r in rows}


def test_host_and_registered_domain_known_values(spark):
    got = _hostdom(spark, [
        "https://WWW.Example.COM/a/b?q=1#frag",
        "http://user:pw@news.bbc.co.uk:8080/story",
        "https://bbc.co.uk/",
        "ftp://files.example.org",
        "https://10.0.0.1:443/x",
        "https://localhost/x",
        "not a url",
        "/relative/path",
        "https://a.b.c.d.example.com/deep",
        "https://shop.example.com.au/item?id=2",
    ])
    assert got["https://WWW.Example.COM/a/b?q=1#frag"] == (
        "www.example.com", "example.com")
    # userinfo stripped, port stripped, subdomain folds into registrant
    assert got["http://user:pw@news.bbc.co.uk:8080/story"] == (
        "news.bbc.co.uk", "bbc.co.uk")
    assert got["https://bbc.co.uk/"] == ("bbc.co.uk", "bbc.co.uk")
    assert got["ftp://files.example.org"] == (
        "files.example.org", "example.org")
    # IPv4 literal groups as itself (never truncated to "0.1")
    assert got["https://10.0.0.1:443/x"] == ("10.0.0.1", "10.0.0.1")
    # dot-less host groups as itself
    assert got["https://localhost/x"] == ("localhost", "localhost")
    assert got["not a url"] == (None, None)
    assert got["/relative/path"] == (None, None)
    assert got["https://a.b.c.d.example.com/deep"] == (
        "a.b.c.d.example.com", "example.com")
    # two-level public suffix: registrant is three labels
    assert got["https://shop.example.com.au/item?id=2"] == (
        "shop.example.com.au", "example.com.au")


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id string, url string, "
                                       "text string")


def test_domain_census_hand_values(spark):
    df = _docs(spark, [
        ("d1", "https://a.example.com/1", "one two three"),
        ("d2", "https://b.example.com/2", "four five"),
        ("d3", "https://other.org/3", "six"),
        ("d4", "broken", "seven eight"),
    ])
    got = {r["domain"]: r for r in
           domain_census(df, "url", "text").collect()}
    assert got["example.com"]["n_docs"] == 2
    assert got["example.com"]["n_tok"] == 5
    assert got["example.com"]["doc_share"] == pytest.approx(0.5)
    assert got["other.org"]["n_docs"] == 1
    # hostless urls stay visible under the NULL domain
    assert got[None]["n_docs"] == 1 and got[None]["n_tok"] == 2
    assert sum(r["doc_share"] for r in got.values()) == pytest.approx(1.0)


def _u(doc_id, salt="v1"):
    h = hashlib.sha256(f"{salt}:{doc_id}".encode()).hexdigest()
    return int(h[:8], 16) / float(1 << 32)


def test_domain_cap_two_phase_matches_brute(spark):
    # skewed synthetic corpus: one hot domain with 60 docs, two cold
    rows = []
    for i in range(60):
        rows.append((f"h{i:03d}", f"https://x.hot.co.uk/{i}", "t"))
    for i in range(7):
        rows.append((f"c{i}", f"https://cold{i % 2}.org/{i}", "t"))
    df = _docs(spark, rows).repartition(7)
    for cap, buckets in [(5, 4), (1, 16), (10, 2)]:
        got = sorted(
            (r["doc_id"], r["domain"])
            for r in domain_cap_sample(df, "url", "doc_id", cap,
                                       salt_buckets=buckets).collect())
        # brute: global per-domain rank by (u, id)
        by_dom = {}
        for did, url, _ in rows:
            dom = ("hot.co.uk" if did.startswith("h")
                   else f"cold{int(did[1:]) % 2}.org")
            by_dom.setdefault(dom, []).append(did)
        want = []
        for dom, ids in by_dom.items():
            keep = sorted(ids, key=lambda d: (_u(d), d))[:cap]
            want.extend((d, dom) for d in keep)
        assert got == sorted(want), f"cap={cap} buckets={buckets}"


def test_domain_cap_deterministic_and_salted(spark):
    rows = [(f"d{i}", f"https://s{i % 3}.net/{i}", "t") for i in range(30)]
    df = _docs(spark, rows)
    a = sorted(r["doc_id"] for r in
               domain_cap_sample(df, "url", "doc_id", 3).collect())
    b = sorted(r["doc_id"] for r in
               domain_cap_sample(df.repartition(13), "url", "doc_id",
                                 3).collect())
    assert a == b  # pure function of (id, salt)
    c = sorted(r["doc_id"] for r in
               domain_cap_sample(df, "url", "doc_id", 3,
                                 salt="v2").collect())
    assert a != c  # independent draw under a different salt
    # cap above domain size keeps everything
    full = domain_cap_sample(df, "url", "doc_id", 99).collect()
    assert len(full) == 30


def test_domain_cap_validation(spark):
    df = _docs(spark, [("d1", "https://a.com/1", "t")])
    with pytest.raises(ValueError, match="cap"):
        domain_cap_sample(df, "url", "doc_id", 0)
    with pytest.raises(ValueError, match="salt_buckets"):
        domain_cap_sample(df, "url", "doc_id", 1, salt_buckets=0)


def test_domain_filter_flags_semantics(spark):
    rows = ([(f"s{i}", f"https://spam.farm.com/{i}", "t")
             for i in range(6)]
            + [("g1", "https://sub.good.org/x", "t"),
               ("g2", "https://good.org/y", "t"),
               ("b1", "bad url", "t")])
    df = _docs(spark, rows)
    got = {r["doc_id"]: r for r in
           domain_filter_flags(df, "url", "doc_id",
                               blocklist=["Farm.com"],
                               max_share=0.5).collect()}
    # blocklist matches the REGISTERED domain, so subdomains block too
    for i in range(6):
        r = got[f"s{i}"]
        assert r["blocked"] and r["over_share"] and not r["keep"]
        assert r["domain"] == "farm.com"
    assert got["g1"]["keep"] and not got["g1"]["blocked"]
    assert got["g1"]["domain"] == "good.org"
    # hostless url: never blocked, but counted toward share (1/9 <= .5)
    assert got["b1"]["domain"] is None
    assert not got["b1"]["blocked"] and got["b1"]["keep"]


def test_domain_filter_flags_null_domain_over_share(spark):
    # a flood of unparseable urls must trip the ceiling like any domain
    rows = ([(f"n{i}", "::garbage::", "t") for i in range(8)]
            + [("g1", "https://ok.com/1", "t")])
    got = {r["doc_id"]: r for r in
           domain_filter_flags(_docs(spark, rows), "url", "doc_id",
                               max_share=0.5).collect()}
    assert all(got[f"n{i}"]["over_share"] for i in range(8))
    assert not got["g1"]["over_share"] and got["g1"]["keep"]


def test_domain_filter_flags_validation(spark):
    df = _docs(spark, [("d1", "https://a.com/1", "t")])
    with pytest.raises(ValueError, match="max_share"):
        domain_filter_flags(df, "url", "doc_id", max_share=0.0)
    with pytest.raises(ValueError, match="max_share"):
        domain_filter_flags(df, "url", "doc_id", max_share=1.5)
