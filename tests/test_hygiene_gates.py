"""Corpus-hygiene ingest gates (operators/hygiene.py): cross-document
line dedup and near-dup resolution wired into BOTH ingest paths, with
committed mergeable state and the documented prefix semantics."""

import datetime

import pytest
from pyspark.sql import functions as F

from neo4j_document_pipeline_spark.plans.pipeline import run_pipeline
from neo4j_document_pipeline_spark.sources.pages import PAGES_SCHEMA
from neo4j_document_pipeline_spark.sources.store import GraphStore
from neo4j_document_pipeline_spark.streaming.ingest import ingest_increment

BANNER = "Accept all cookies to continue reading this site"


def _pages(spark, rows):
    """rows: [(url, text)] -> a pages frame (text_source='text')."""
    data = [
        (u, datetime.datetime(2025, 1, 1, 0, 0, i), None, t, "en")
        for i, (u, t) in enumerate(rows)
    ]
    return spark.createDataFrame(data, PAGES_SCHEMA)


def _doc(name, i, banner=True, tail=""):
    """One page whose body is the synth generator's extractable text
    (the pipeline writes partitioned triples; a zero-triple corpus
    would commit an unreadable empty partitioned table)."""
    from neo4j_document_pipeline_spark.sources.pages import make_text
    body = make_text(i) + tail
    text = (BANNER + "\n" + body) if banner else body
    return (f"https://site-{name}.example.org/{name}.md", text)


def _docs_state(store):
    return sorted((r["url"], r["text"])
                  for r in store.read("documents_final").collect())


def _postings_state(store):
    return sorted((r["lkey"], r["df"])
                  for r in store.read("line_postings")
                  .select("lkey", "df").distinct().collect())


# ---------------------------------------------------------------------------
# line-dedup gate
# ---------------------------------------------------------------------------

def test_line_dedup_gate_batch(spark, tmp_path):
    pages = _pages(spark, [
        _doc("a", 0), _doc("b", 1), _doc("c", 2, banner=False),
    ])
    root = str(tmp_path / "kg")
    man = run_pipeline(spark, pages, root, dedup_lines=2)
    store = GraphStore(root, spark)
    texts = {r["url"]: r["text"] for r in store.read("documents").collect()}
    assert len(texts) == 3
    for url, text in texts.items():
        assert BANNER not in text
    assert any("Chronicle 0" in t for t in texts.values())  # bodies intact
    # state: the banner's lkey counted in 2 distinct docs
    post = store.read("line_postings")
    banner_df = (post.filter(
        F.col("lkey") == F.sha2(F.lit(BANNER), 256))
        .select("df").distinct().collect())
    assert [r["df"] for r in banner_df] == [2]
    assert man["line_postings"]["bucket_by"] == "lkey"
    # doc ids re-keyed over the CLEANED text
    bad = store.read("documents").filter(
        F.col("doc_id") != F.sha2(F.col("text"), 256)).count()
    assert bad == 0


def test_line_dedup_single_increment_matches_batch(spark, tmp_path):
    pages = _pages(spark, [
        _doc("a", 0), _doc("b", 1), _doc("c", 2, banner=False),
    ]).cache()
    batch_root = str(tmp_path / "batch")
    run_pipeline(spark, pages, batch_root, dedup_lines=2)
    inc_root = str(tmp_path / "inc")
    inc_store = GraphStore(inc_root, spark)
    ingest_increment(inc_store, pages, dedup_lines=2)
    assert _docs_state(GraphStore(batch_root, spark)) == _docs_state(inc_store)
    assert _postings_state(GraphStore(batch_root, spark)) == \
        _postings_state(inc_store)


def test_line_dedup_prefix_semantics_and_state_parity(spark, tmp_path):
    """The documented incremental contract: a later batch is gated exactly
    as the full run gates it; the ONLY deviation is the retroactive set
    (early copies committed before their duplicates arrived); the
    postings state converges to the full run's state."""
    b1 = _pages(spark, [
        _doc("a", 0), _doc("x", 3, banner=False),
    ]).cache()
    b2 = _pages(spark, [
        _doc("b", 1),
    ]).cache()

    inc_root = str(tmp_path / "inc")
    inc_store = GraphStore(inc_root, spark)
    ingest_increment(inc_store, b1, dedup_lines=2, stage="b1")
    ingest_increment(inc_store, b2, dedup_lines=2, stage="b2")

    full_root = str(tmp_path / "full")
    run_pipeline(spark, b1.unionByName(b2), full_root, dedup_lines=2)
    full_store = GraphStore(full_root, spark)

    inc = {r["url"]: r["text"] for r in
           inc_store.read("documents_final").collect()}
    full = {r["url"]: r["text"] for r in
            full_store.read("documents_final").collect()}
    url_a = "https://site-a.example.org/a.md"
    url_b = "https://site-b.example.org/b.md"
    url_x = "https://site-x.example.org/x.md"
    # the later batch's doc is gated exactly like the full run
    assert inc[url_b] == full[url_b]
    assert BANNER not in inc[url_b]
    # the deviation is EXACTLY the retroactive set: doc a keeps the
    # banner on the incremental path (its duplicate arrived later),
    # loses it in the full run — and nothing else differs
    assert BANNER in inc[url_a] and BANNER not in full[url_a]
    assert inc[url_a].replace(BANNER + "\n", "") == full[url_a]
    assert inc[url_x] == full[url_x]
    # the committed counting state converges to the full run's
    assert _postings_state(inc_store) == _postings_state(full_store)


def test_line_dedup_increment_redelivery_noop(spark, tmp_path):
    """Re-delivering a batch neither double-counts lines nor changes the
    gated output (postings dedupe on (doc_id, lkey))."""
    b1 = _pages(spark, [
        _doc("a", 0),
    ]).cache()
    root = str(tmp_path / "kg")
    store = GraphStore(root, spark)
    ingest_increment(store, b1, dedup_lines=2, stage="b1")
    docs1, post1 = _docs_state(store), _postings_state(store)
    assert BANNER in docs1[0][1]  # df=1 < 2: nothing removed yet
    ingest_increment(store, b1, dedup_lines=2, stage="b1-again")
    assert _docs_state(store) == docs1
    assert _postings_state(store) == post1  # banner df still 1, not 2


def test_line_gate_threshold_change_semantics(spark, tmp_path, capsys):
    """Changing ``--dedup-lines`` between increments: the committed
    postings state counts RAW lines and is therefore threshold-
    INDEPENDENT, so a later batch is gated at the NEW threshold against
    the full committed counts (not the threshold the counts were
    ingested under), already-committed docs keep their gated form (the
    usual prefix/retroactive contract), and the hygiene report surfaces
    the LATEST threshold the store was gated with."""
    import json

    from neo4j_document_pipeline_spark.__main__ import main
    b1 = _pages(spark, [_doc("a", 0)]).cache()
    b2 = _pages(spark, [_doc("b", 1)]).cache()
    b3 = _pages(spark, [_doc("c", 2)]).cache()

    root = str(tmp_path / "kg")
    store = GraphStore(root, spark)
    ingest_increment(store, b1, dedup_lines=3, stage="b1")
    ingest_increment(store, b2, dedup_lines=3, stage="b2")
    texts = dict(_docs_state(store))
    # at N=3 the banner's combined df (2) never reached the bar
    assert all(BANNER in t for t in texts.values())

    ingest_increment(store, b3, dedup_lines=2, stage="b3")
    texts = dict(_docs_state(store))
    url_c = "https://site-c.example.org/c.md"
    # the new batch is gated at N=2 against the FULL committed counts
    # (df 2+1 >= 2), even though those counts were ingested under N=3
    assert BANNER not in texts[url_c]
    # committed docs keep their gated form — the standard retroactive set
    assert BANNER in texts["https://site-a.example.org/a.md"]
    assert BANNER in texts["https://site-b.example.org/b.md"]

    # the counting state is a pure function of the raw corpus: a store
    # ingested at N=2 throughout holds the identical postings
    ctl_root = str(tmp_path / "ctl")
    ctl = GraphStore(ctl_root, spark)
    for i, b in enumerate((b1, b2, b3)):
        ingest_increment(ctl, b, dedup_lines=2, stage=f"c{i}")
    assert _postings_state(store) == _postings_state(ctl)

    # the report's gate-state section reflects the LATEST threshold
    main(["hygiene", "--store", root])
    gs = json.loads(capsys.readouterr().out)["line_gate_state"]
    assert gs["min_doc_freq"] == 2
    assert gs["boilerplate_lines"] == 1  # the banner qualifies at N=2


# ---------------------------------------------------------------------------
# near-dup gate
# ---------------------------------------------------------------------------

def _long():
    from neo4j_document_pipeline_spark.sources.pages import make_text
    return make_text(4)


def test_near_dup_gate_batch(spark, tmp_path):
    pages = _pages(spark, [
        ("https://m1.example.org/p.md", _long() + " first tail."),
        ("https://m2.example.org/p.md", _long() + " second tail."),
        _doc("d", 10, banner=False),
    ])
    root = str(tmp_path / "kg")
    man = run_pipeline(spark, pages, root, resolve_near_dups=True,
                       near_dup_threshold=0.6)
    store = GraphStore(root, spark)
    docs = store.read("documents_final").collect()
    assert len(docs) == 2  # one mirror dropped
    kept_mirror = [r for r in docs if "tail." in r["text"]]
    assert len(kept_mirror) == 1
    # survivor = min doc_id of the pair (batch resolver semantics)
    sigs = store.read("doc_signatures")
    assert man["doc_signatures"]["bucket_by"] == "bh"
    sig_ids = {r["doc_id"] for r in sigs.select("doc_id").distinct().collect()}
    assert sig_ids == {r["doc_id"] for r in docs}  # survivors only


def test_near_dup_gate_increment_committed_wins_and_idempotent(spark, tmp_path):
    b1 = _pages(spark, [
        ("https://m1.example.org/p.md", _long() + " first tail."),
        _doc("d", 10, banner=False),
    ]).cache()
    root = str(tmp_path / "kg")
    store = GraphStore(root, spark)
    ingest_increment(store, b1, resolve_near_dups=True,
                     near_dup_threshold=0.6, stage="b1")
    state1 = _docs_state(store)
    assert len(state1) == 2

    # a later near-dup of the committed mirror is dropped; a genuinely
    # new doc lands
    b2 = _pages(spark, [
        ("https://m2.example.org/p.md", _long() + " second tail."),
        _doc("n", 17, banner=False),
    ])
    ingest_increment(store, b2, resolve_near_dups=True,
                     near_dup_threshold=0.6, stage="b2")
    docs = {r[0]: r[1] for r in _docs_state(store)}
    assert len(docs) == 3
    assert "https://m2.example.org/p.md" not in docs  # committed copy won
    assert "https://site-n.example.org/n.md" in docs

    # re-delivery of batch 1: a doc never matches itself — no-op
    ingest_increment(store, b1, resolve_near_dups=True,
                     near_dup_threshold=0.6, stage="b1-again")
    assert len(_docs_state(store)) == 3
    assert "https://m1.example.org/p.md" in {u for u, _ in _docs_state(store)}


def test_near_dup_single_increment_matches_batch(spark, tmp_path):
    pages = _pages(spark, [
        ("https://m1.example.org/p.md", _long() + " first tail."),
        ("https://m2.example.org/p.md", _long() + " second tail."),
        _doc("d", 10, banner=False),
    ]).cache()
    batch_root = str(tmp_path / "batch")
    run_pipeline(spark, pages, batch_root, resolve_near_dups=True,
                 near_dup_threshold=0.6)
    inc_root = str(tmp_path / "inc")
    inc_store = GraphStore(inc_root, spark)
    ingest_increment(inc_store, pages, resolve_near_dups=True,
                     near_dup_threshold=0.6)
    assert _docs_state(GraphStore(batch_root, spark)) == _docs_state(inc_store)


# ---------------------------------------------------------------------------
# plumbing: point-lookup pruning + gated resume stays job-free
# ---------------------------------------------------------------------------

def test_read_matching_opens_only_affected_buckets(spark, tmp_path,
                                                   monkeypatch):
    store = GraphStore(str(tmp_path / "s"), spark)
    df = spark.createDataFrame([(f"k{i}", i) for i in range(64)],
                               "k string, v int")
    store.write_bucketed("t", df, bucket_by="k", n_buckets=8)

    opened = []
    import pyspark.sql.readwriter as rw
    orig = rw.DataFrameReader.parquet

    def spy(self, *paths):
        opened.extend(paths)
        return orig(self, *paths)

    monkeypatch.setattr(rw.DataFrameReader, "parquet", spy)
    keys = spark.createDataFrame([("k3",)], "k string")
    out = store.read_matching("t", keys, "k")
    assert [(r["k"], r["v"]) for r in out.collect()] == [("k3", 3)]
    # only the one bucket the key hashes into was opened
    n = 8
    b = spark.createDataFrame([("k3",)], "k string").select(
        F.pmod(F.hash("k"), F.lit(n)).alias("b")).first()["b"]
    assert opened, "bucketed path not taken"
    assert all(f"_{b:05d}.c" in p for p in opened), opened

    # full-scan fallback answers the same on a non-bucketed table
    store.write("t2", df)
    out2 = store.read_matching("t2", keys, "k")
    assert [(r["k"], r["v"]) for r in out2.collect()] == [("k3", 3)]
    # missing table -> None
    assert store.read_matching("nope", keys, "k") is None


def test_gated_resume_runs_zero_pages_jobs(spark, tmp_path):
    """With all three stateful gates on, a fully-current resume must not touch the
    pages input at all (the gates are lazy thunks behind the stage
    skips)."""
    pages = _pages(spark, [
        _doc("a", 0), _doc("b", 1),
    ]).cache()
    root = str(tmp_path / "kg")
    kw = dict(dedup_lines=2, strip_spans=True, resolve_near_dups=True,
              near_dup_threshold=0.6, pages_fingerprint="pf1")
    m1 = run_pipeline(spark, pages, root, **kw)
    assert not m1["documents"].get("skipped")
    assert not m1["line_postings"].get("skipped")
    assert not m1["gram_postings"].get("skipped")
    assert not m1["doc_signatures"].get("skipped")

    def boom(batches):
        raise AssertionError("pages scanned on a fully-current resume")
        yield  # pragma: no cover

    poisoned = pages.mapInPandas(boom, schema=PAGES_SCHEMA)
    m2 = run_pipeline(spark, poisoned, root, **kw)
    assert all(m.get("skipped") for k, m in m2.items()
               if not k.startswith("_"))


def test_gate_rejects_bad_min_doc_freq(spark, tmp_path):
    from neo4j_document_pipeline_spark.operators.hygiene import (
        gate_lines_increment)
    store = GraphStore(str(tmp_path / "s"), spark)
    docs = spark.createDataFrame([("d", "t")], "doc_id string, text string")
    with pytest.raises(ValueError):
        gate_lines_increment(store, docs, 0)


def test_stream_ingest_with_gates(spark, tmp_path):
    """The gate flags ride foreachBatch: a gated stream over a pages
    dir applies line dedup + near-dup resolution per micro-batch with
    the committed state (prefix semantics), and the state tables land
    bucketed."""
    # the near-dup pair differs in LINE structure (one is re-wrapped to
    # a single line) so the line gate — which correctly strips lines
    # duplicated across documents, exact mirrors included — leaves the
    # bodies intact and the near-dup gate does the dropping
    from neo4j_document_pipeline_spark.sources.pages import make_text
    rows = [
        _doc("a", 0), _doc("b", 1),
        ("https://m1.example.org/p.md", make_text(7) + " first tail."),
        ("https://m2.example.org/p.md",
         make_text(7).replace("\n", " ") + " second tail."),
    ]
    pages_dir = str(tmp_path / "pages")
    _pages(spark, rows).repartition(1).write.parquet(pages_dir)

    from neo4j_document_pipeline_spark.streaming.ingest import (
        start_ingest_stream)
    root = str(tmp_path / "kg")
    q = start_ingest_stream(spark, pages_dir, root,
                            str(tmp_path / "ckpt"),
                            dedup_lines=2, resolve_near_dups=True,
                            near_dup_threshold=0.6,
                            max_files_per_trigger=64)
    assert q.awaitTermination(300), "gated ingest stream did not finish"
    store = GraphStore(root, spark)
    docs = {r["url"]: r["text"] for r in
            store.read("documents_final").collect()}
    # one mirror dropped; the shared banner stripped from both docs
    assert len(docs) == 3
    assert sum(1 for t in docs.values() if "tail." in t) == 1
    assert all(BANNER not in t for t in docs.values())
    assert store.manifest("line_postings")["bucket_by"] == "lkey"
    assert store.manifest("doc_signatures")["bucket_by"] == "bh"


def test_hygiene_report_shows_gate_state(spark, tmp_path, capsys):
    """The corpus-quality report surfaces the committed gate state:
    how many distinct/boilerplate lines the line gate tracks and how
    many documents the signature table covers."""
    import json

    from neo4j_document_pipeline_spark.__main__ import main
    pages = _pages(spark, [
        _doc("a", 0), _doc("b", 1), _doc("c", 2, banner=False),
    ])
    root = str(tmp_path / "kg")
    run_pipeline(spark, pages, root, dedup_lines=2, resolve_near_dups=True)
    main(["hygiene", "--store", root])
    out = json.loads(capsys.readouterr().out)
    gs = out["line_gate_state"]
    assert gs["boilerplate_lines"] == 1  # the banner
    assert gs["distinct_lines"] > gs["boilerplate_lines"]
    assert out["near_dup_gate_state"]["signed_docs"] == 3


# ---------------------------------------------------------------------------
# PII-redaction gate (stateless)
# ---------------------------------------------------------------------------

def test_pii_gate_batch_and_exact_increment_parity(spark, tmp_path):
    """The stateless PII gate scrubs identically on the batch and
    multi-batch incremental paths — EXACT byte parity, no prefix
    caveat (no state involved)."""
    from neo4j_document_pipeline_spark.sources.pages import make_text
    mk = lambda name, i, pii: (  # noqa: E731
        f"https://site-{name}.example.org/{name}.md",
        make_text(i) + "\nContact " + pii + " for details.")
    b1 = _pages(spark, [mk("a", 0, "alice@example.com")]).cache()
    b2 = _pages(spark, [mk("b", 1, "+60 12-345 6789")]).cache()

    full_root = str(tmp_path / "full")
    run_pipeline(spark, b1.unionByName(b2), full_root, redact_pii=True)
    full = GraphStore(full_root, spark)
    texts = {r["url"]: r["text"] for r in
             full.read("documents_final").collect()}
    assert "[EMAIL]" in texts["https://site-a.example.org/a.md"]
    assert "alice@example.com" not in str(texts)
    assert "[PHONE]" in texts["https://site-b.example.org/b.md"]
    bad = full.read("documents_final").filter(
        F.col("doc_id") != F.sha2(F.col("text"), 256)).count()
    assert bad == 0  # re-keyed over the scrubbed text

    inc_root = str(tmp_path / "inc")
    inc = GraphStore(inc_root, spark)
    ingest_increment(inc, b1, redact_pii=True, stage="b1")
    ingest_increment(inc, b2, redact_pii=True, stage="b2")
    assert _docs_state(inc) == _docs_state(full)  # byte-identical


def test_pii_gate_runs_before_line_state(spark, tmp_path):
    """Gate order quality -> PII -> lines: a banner containing an email
    is counted (and stripped) in its REDACTED form, so the line state
    never stores raw PII."""
    from neo4j_document_pipeline_spark.sources.pages import make_text
    banner = "Questions? Mail support@example.com for help"
    pages = _pages(spark, [
        (f"https://s{i}.example.org/d.md",
         banner + "\n" + make_text(i)) for i in (0, 1)
    ])
    root = str(tmp_path / "kg")
    run_pipeline(spark, pages, root, redact_pii=True, dedup_lines=2)
    store = GraphStore(root, spark)
    texts = [r["text"] for r in store.read("documents_final").collect()]
    assert all(banner not in t for t in texts)  # banner line stripped
    assert all("support@example.com" not in t for t in texts)
    # the state table holds the REDACTED line's hash, not the raw one
    redacted = banner.replace("support@example.com", "[EMAIL]")
    post = store.read("line_postings")
    assert post.filter(
        F.col("lkey") == F.sha2(F.lit(redacted), 256)).count() > 0
    assert post.filter(
        F.col("lkey") == F.sha2(F.lit(banner), 256)).count() == 0


# ---------------------------------------------------------------------------
# duplicated-span report (CLI)
# ---------------------------------------------------------------------------

def test_cli_spans_report_and_hygiene_section(spark, tmp_path, capsys):
    """Two committed docs share a 12-token pasted paragraph: the spans
    command must flag both (document-level dedup can't — the docs are
    unique), and hygiene --dup-spans must carry the same totals."""
    import json

    from neo4j_document_pipeline_spark.__main__ import main
    PASTE = ("every good boy deserves fudge while clever foxes jump over "
             "lazy dogs")
    pages = _pages(spark, [
        _doc("a", 0, banner=False, tail=" " + PASTE),
        _doc("b", 1, banner=False, tail=" " + PASTE),
        _doc("c", 2, banner=False),
    ])
    root = str(tmp_path / "kg")
    run_pipeline(spark, pages, root)

    main(["spans", "--store", root, "--span-k", "8"])
    rep = json.loads(capsys.readouterr().out)
    assert rep["span_k"] == 8
    assert rep["totals"]["n_docs"] == 3
    assert rep["totals"]["docs_with_spans"] >= 2
    # each doc's flagged region covers at least the 12-token paste
    assert rep["totals"]["dup_tokens"] >= 24
    assert rep["top"] and rep["top"][0]["dup_frac"] > 0
    # a stricter min_count can only shrink the flag set
    main(["spans", "--store", root, "--span-k", "8",
          "--span-min-count", "3"])
    rep3 = json.loads(capsys.readouterr().out)
    assert rep3["totals"]["dup_tokens"] <= rep["totals"]["dup_tokens"]

    main(["hygiene", "--store", root, "--dup-spans", "--span-k", "8"])
    h = json.loads(capsys.readouterr().out)
    assert h["dup_spans"]["span_k"] == 8
    assert h["dup_spans"]["docs_with_spans"] == \
        rep["totals"]["docs_with_spans"]
    assert h["dup_spans"]["dup_tokens"] == rep["totals"]["dup_tokens"]


# ---------------------------------------------------------------------------
# exact-substring span gate
# ---------------------------------------------------------------------------

PASTE = ("every good boy deserves fudge while clever foxes jump over "
         "lazy dogs tonight")


def _span_rows():
    from neo4j_document_pipeline_spark.sources.pages import make_text
    return [
        ("https://a.example.org/a.md", make_text(0) + " " + PASTE),
        ("https://b.example.org/b.md", make_text(1) + " " + PASTE),
        ("https://c.example.org/c.md", make_text(2)),
    ]


def _span_state(store):
    return sorted(map(tuple, store.read("gram_postings")
                  .select("doc_id", "url", "gkey", "n", "kept")
                  .collect()))


def test_span_gate_batch(spark, tmp_path):
    pages = _pages(spark, _span_rows())
    root = str(tmp_path / "kg")
    man = run_pipeline(spark, pages, root, strip_spans=True)
    store = GraphStore(root, spark)
    docs = {r["url"]: r["text"] for r in store.read("documents").collect()}
    assert len(docs) == 3
    # keep-one: exactly one committed copy of the pasted paragraph
    assert sum(1 for t in docs.values() if PASTE in t) == 1
    # the cut doc keeps its body (the paste was appended after it)
    cut_url = next(u for u, t in docs.items()
                   if PASTE not in t and "example.org/c" not in u)
    assert "tonight" not in docs[cut_url]
    assert len(docs[cut_url]) > 50  # body survived
    assert docs["https://c.example.org/c.md"].endswith("schedule.")
    # doc ids re-keyed over the cut text
    bad = store.read("documents").filter(
        F.col("doc_id") != F.sha2(F.col("text"), 256)).count()
    assert bad == 0
    # state: bucketed by gkey, thresholds stamped, post-cut corpus only
    assert man["gram_postings"]["bucket_by"] == "gkey"
    assert man["gram_postings"]["metrics"]["span_k"] == 8
    assert man["gram_postings"]["metrics"]["span_min_count"] == 2
    # kept=true rows cover exactly the committed (post-cut) docs;
    # kept=false rows the pre-cut evidence (a superset of ids)
    committed_ids = {r["doc_id"]
                     for r in store.read("documents").collect()}
    kept_ids = {r[0] for r in _span_state(store) if r[4]}
    assert kept_ids <= committed_ids
    raw_ids = {r[0] for r in _span_state(store) if not r[4]}
    assert len(raw_ids) >= len(kept_ids)


def test_span_gate_single_increment_matches_batch(spark, tmp_path):
    pages = _pages(spark, _span_rows()).cache()
    root_b = str(tmp_path / "b")
    run_pipeline(spark, pages, root_b, strip_spans=True)
    sb = GraphStore(root_b, spark)
    root_i = str(tmp_path / "i")
    si = GraphStore(root_i, spark)
    ingest_increment(si, pages, strip_spans=True, stage="s1")
    assert sorted((r["url"], r["text"])
                  for r in sb.read("documents").collect()) == \
        sorted((r["url"], r["text"])
               for r in si.read("documents_final").collect())
    assert _span_state(sb) == _span_state(si)


def test_span_gate_prefix_semantics_and_redelivery(spark, tmp_path):
    from neo4j_document_pipeline_spark.sources.pages import make_text
    rows = _span_rows()
    root = str(tmp_path / "kg")
    store = GraphStore(root, spark)
    ingest_increment(store, _pages(spark, rows[:1]),
                     strip_spans=True, stage="p1")
    ingest_increment(store, _pages(spark, rows[1:]),
                     strip_spans=True, stage="p2")
    docs = {r["url"]: r["text"] for r in
            store.read("documents_final").collect()}
    # committed early copy keeps its span (the retroactive set);
    # the later arrival is cut against the committed evidence
    assert PASTE in docs["https://a.example.org/a.md"]
    assert PASTE not in docs["https://b.example.org/b.md"]
    assert docs["https://c.example.org/c.md"] == make_text(2)
    before_docs = sorted(docs.items())
    before_state = _span_state(store)
    # re-delivery of either batch is a no-op: the raw survivor must not
    # match its own committed grams (doc_id immunity), and the raw CUT
    # doc must not match its committed cut form's body (url immunity)
    ingest_increment(store, _pages(spark, rows[1:]),
                     strip_spans=True, stage="p3")
    ingest_increment(store, _pages(spark, rows[:1]),
                     strip_spans=True, stage="p4")
    assert sorted((r["url"], r["text"]) for r in
                  store.read("documents_final").collect()) == before_docs
    assert _span_state(store) == before_state


def test_span_gate_within_doc_repeat(spark, tmp_path):
    """min_count counts corpus OCCURRENCES: a document repeating its own
    paragraph trips the gate with no second document involved, and one
    copy survives."""
    from neo4j_document_pipeline_spark.sources.pages import make_text
    pages = _pages(spark, [
        ("https://r.example.org/r.md",
         make_text(0) + " " + PASTE + " " + PASTE),
        ("https://c.example.org/c.md", make_text(2)),
    ])
    root = str(tmp_path / "kg")
    run_pipeline(spark, pages, root, strip_spans=True)
    store = GraphStore(root, spark)
    docs = {r["url"]: r["text"] for r in store.read("documents").collect()}
    t = docs["https://r.example.org/r.md"]
    # the back-to-back copies merge into ONE span whose first k-gram
    # survives... keep-first excludes only the first GRAM occurrence,
    # so the merged region minus the survivor prefix is cut: the text
    # must contain the paste at most once
    assert t.count("lazy dogs tonight") <= 1
    assert docs["https://c.example.org/c.md"] == make_text(2)


def test_cut_spans_known_values(spark):
    from neo4j_document_pipeline_spark.operators.hygiene import _cut_spans
    docs = spark.createDataFrame(
        [("d1", "u1", None, None, "alpha beta, gamma: delta epsilon!"),
         ("d2", "u2", None, None, "alpha beta gamma")],
        "doc_id string, url string, title string, path string, text string")
    spans = spark.createDataFrame(
        [("d1", 2, 3, 2),   # cut "beta, gamma:" -> preceding ws absorbed
         ("d2", 1, 1, 1)],  # doc-head span -> following ws absorbed
        "doc_id string, span_start long, span_end long, span_tokens long")
    out = {r["url"]: r["text"] for r in
           _cut_spans(docs, spans).collect()}
    # chars from token 2 start ("beta") to token 3 end ("gamma") plus
    # the space before — the ": delta" punctuation AFTER the span stays
    assert out["u1"] == "alpha: delta epsilon!"
    assert out["u2"] == "beta gamma"


def test_stream_ingest_with_span_gate(spark, tmp_path):
    """--strip-spans rides foreachBatch: a streamed corpus cuts the
    pasted paragraph per micro-batch against the committed state and
    commits the bucketed gram_postings table."""
    pages_dir = str(tmp_path / "pages")
    _pages(spark, _span_rows()).repartition(1).write.parquet(pages_dir)
    from neo4j_document_pipeline_spark.streaming.ingest import (
        start_ingest_stream)
    root = str(tmp_path / "kg")
    q = start_ingest_stream(spark, pages_dir, root,
                            str(tmp_path / "ckpt"),
                            strip_spans=True, max_files_per_trigger=64)
    assert q.awaitTermination(300), "span-gated stream did not finish"
    store = GraphStore(root, spark)
    docs = {r["url"]: r["text"] for r in
            store.read("documents_final").collect()}
    assert len(docs) == 3
    assert sum(1 for t in docs.values() if PASTE in t) == 1
    assert store.manifest("gram_postings")["bucket_by"] == "gkey"


def test_cli_ingest_strip_spans_and_hygiene_state(spark, tmp_path, capsys):
    import json

    from neo4j_document_pipeline_spark.__main__ import main
    pages_dir = str(tmp_path / "pages")
    _pages(spark, _span_rows()).repartition(1).write.parquet(pages_dir)
    root = str(tmp_path / "kg")
    main(["ingest", "--store", root, "--pages", pages_dir,
          "--strip-spans"])
    capsys.readouterr()
    store = GraphStore(root, spark)
    docs = [r["text"] for r in store.read("documents").collect()]
    assert sum(1 for t in docs if PASTE in t) == 1
    main(["hygiene", "--store", root])
    rep = json.loads(capsys.readouterr().out)
    gs = rep["span_gate_state"]
    assert gs["span_k"] == 8 and gs["span_min_count"] == 2
    assert gs["distinct_grams"] > 0
    # raw-evidence rows record the paste in BOTH source docs
    assert gs["duplicated_grams"] >= 1


def test_span_gate_min_count_3_cross_batch(spark, tmp_path):
    """min_count > 2 must keep gating on the RAW committed evidence:
    after the gate cuts two of three committed copies, a fourth arrival
    still sees 3 raw occurrences and is cut — kept-only state would
    collapse the evidence to one copy and never gate again (the review
    finding this two-kind state design exists for)."""
    from neo4j_document_pipeline_spark.sources.pages import make_text
    root = str(tmp_path / "kg")
    store = GraphStore(root, spark)
    batch1 = _pages(spark, [
        ("https://a.example.org/a.md", make_text(0) + " " + PASTE),
        ("https://b.example.org/b.md", make_text(1) + " " + PASTE),
        ("https://c.example.org/c.md", make_text(3) + " " + PASTE),
    ])
    ingest_increment(store, batch1, strip_spans=True, span_min_count=3,
                     stage="m1")
    docs = {r["url"]: r["text"] for r in
            store.read("documents_final").collect()}
    # three copies >= 3: keep-one leaves exactly one
    assert sum(1 for t in docs.values() if PASTE in t) == 1
    # a later single arrival: batch 1 + committed raw 3 >= 3 -> cut
    batch2 = _pages(spark, [
        ("https://d.example.org/d.md", make_text(2) + " " + PASTE)])
    ingest_increment(store, batch2, strip_spans=True, span_min_count=3,
                     stage="m2")
    docs = {r["url"]: r["text"] for r in
            store.read("documents_final").collect()}
    assert PASTE not in docs["https://d.example.org/d.md"]
    assert sum(1 for t in docs.values() if PASTE in t) == 1


def test_span_gate_rejects_span_k_change(spark, tmp_path):
    """span_k defines the gram key space: probing or merging a table
    stamped with a different k would silently match nothing — it must
    raise instead."""
    root = str(tmp_path / "kg")
    store = GraphStore(root, spark)
    ingest_increment(store, _pages(spark, _span_rows()[:1]),
                     strip_spans=True, stage="k1")
    with pytest.raises(ValueError, match="span_k"):
        ingest_increment(store, _pages(spark, _span_rows()[1:]),
                         strip_spans=True, span_k=6, stage="k2")
    # min_count is a read-time threshold and may change freely
    ingest_increment(store, _pages(spark, _span_rows()[1:]),
                     strip_spans=True, span_min_count=4, stage="k3")


# ---------------------------------------------------------------------------
# corpus sketch state (--track-sketches)
# ---------------------------------------------------------------------------

def _sketch_state(store):
    return sorted(
        (r["kind"], r["r"], r["b"], r["v"], r["u"])
        for r in store.read("corpus_sketches").collect())


def test_sketch_state_increment_equals_batch_rebuild(spark, tmp_path):
    """The merge property end-to-end through the store: batch ingest of
    A∪B and A-then-increment-B commit BIT-IDENTICAL sketch state (cms
    adds, bloom ORs, kmv re-takes bottom-k), and the state equals
    sketching the final corpus directly."""
    from neo4j_document_pipeline_spark.operators.sketches import (
        corpus_sketches_from_docs)
    a = [_doc("a", 0, banner=False), _doc("b", 1, banner=False)]
    b = [_doc("c", 2, banner=False), _doc("d", 4, banner=False)]
    root1 = str(tmp_path / "one")
    run_pipeline(spark, _pages(spark, a + b), root1, track_sketches=True)
    s1 = GraphStore(root1, spark)
    root2 = str(tmp_path / "two")
    run_pipeline(spark, _pages(spark, a), root2, track_sketches=True)
    s2 = GraphStore(root2, spark)
    ingest_increment(s2, _pages(spark, b), track_sketches=True)
    assert _sketch_state(s1) == _sketch_state(s2)
    # and both equal a direct sketch of the final corpus
    direct = sorted(
        (r["kind"], r["r"], r["b"], r["v"], r["u"])
        for r in corpus_sketches_from_docs(
            s2.read("documents_final")).collect())
    assert _sketch_state(s2) == direct


def test_sketch_state_redelivery_is_noop(spark, tmp_path):
    """Re-delivering an already-committed batch must not move the
    state: the anti-join on committed doc_ids empties the delta (an
    at-least-once source cannot double-count cms cells)."""
    a = [_doc("a", 0, banner=False), _doc("b", 1, banner=False)]
    root = str(tmp_path / "kg")
    run_pipeline(spark, _pages(spark, a), root, track_sketches=True)
    store = GraphStore(root, spark)
    before = _sketch_state(store)
    ingest_increment(store, _pages(spark, a), track_sketches=True)
    assert _sketch_state(store) == before
    # a genuinely new doc DOES move it
    ingest_increment(store, _pages(spark, [_doc("c", 2, banner=False)]),
                     track_sketches=True)
    assert _sketch_state(store) != before


def test_sketch_summary_answers_from_state(spark, tmp_path, capsys):
    """The hygiene report's sketch_state section answers from the
    KB-sized table: token total EXACT (cms row-0 sum), vocab exact
    below k, bloom occupancy positive — all without scanning docs."""
    import json

    from neo4j_document_pipeline_spark.__main__ import main
    from neo4j_document_pipeline_spark.functions.textstats import (
        col_token_count)
    a = [_doc("a", 0, banner=False), _doc("b", 1, banner=False),
         _doc("c", 2, banner=False)]
    root = str(tmp_path / "kg")
    run_pipeline(spark, _pages(spark, a), root, track_sketches=True)
    store = GraphStore(root, spark)
    exact_tokens = (store.read("documents_final")
                    .agg(F.sum(col_token_count(F.col("text"))))
                    .collect()[0][0])
    exact_vocab = (store.read("documents_final")
                   .select(F.explode(F.split(F.lower(F.regexp_replace(
                       "text", r"[^A-Za-z0-9']+", " ")), " ")).alias("t"))
                   .filter(F.col("t") != "").select("t").distinct().count())
    main(["hygiene", "--store", root])
    rep = json.loads(capsys.readouterr().out)
    st = rep["sketch_state"]
    assert st["tokens_total"] == exact_tokens
    if st["vocab_exact"]:
        assert st["vocab_estimate"] == float(exact_vocab)
    else:
        assert abs(st["vocab_estimate"] - exact_vocab) / exact_vocab < 0.3
    assert st["bloom_words"] >= 1


def test_sketch_state_midlife_enable_backfills_and_self_maintains(
        spark, tmp_path):
    """Enabling --track-sketches on an EXISTING store backfills the
    state over the already-committed corpus (the summary claims
    whole-corpus totals, so partial coverage would misreport), and a
    later increment WITHOUT the flag keeps maintaining it (state
    existence wins — no silent staleness)."""
    from neo4j_document_pipeline_spark.operators.sketches import (
        corpus_sketches_from_docs)
    a = [_doc("a", 0, banner=False), _doc("b", 1, banner=False)]
    b = [_doc("c", 2, banner=False)]
    c = [_doc("d", 4, banner=False)]
    root = str(tmp_path / "kg")
    run_pipeline(spark, _pages(spark, a), root)  # no flag: no state
    store = GraphStore(root, spark)
    assert not store.exists("corpus_sketches")
    ingest_increment(store, _pages(spark, b), track_sketches=True)
    direct = sorted(
        (r["kind"], r["r"], r["b"], r["v"], r["u"])
        for r in corpus_sketches_from_docs(
            store.read("documents_final")).collect())
    assert _sketch_state(store) == direct  # backfill covered a∪b
    ingest_increment(store, _pages(spark, c))  # flag OFF — still kept
    direct2 = sorted(
        (r["kind"], r["r"], r["b"], r["v"], r["u"])
        for r in corpus_sketches_from_docs(
            store.read("documents_final")).collect())
    assert _sketch_state(store) == direct2
