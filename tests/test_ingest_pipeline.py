"""End-to-end ingest DAG tests on the synthetic pages table."""

import pytest
from pyspark.sql import functions as F

from neo4j_document_pipeline_spark.functions.chunking import chunk_text
from neo4j_document_pipeline_spark.functions.extraction import (
    extract_chunk_triples,
    flatten_triples,
)
from neo4j_document_pipeline_spark.functions.text import py_canonicalize, py_sha256_hex
from neo4j_document_pipeline_spark.operators.graph import build_graph
from neo4j_document_pipeline_spark.operators.ingest import (
    chunks_to_triples,
    documents_to_chunks,
    pages_to_documents,
)
from neo4j_document_pipeline_spark.sources.pages import make_text, synth_pages

N_PAGES = 60


@pytest.fixture(scope="module")
def pages(spark):
    return synth_pages(spark, N_PAGES).cache()


@pytest.fixture(scope="module")
def documents(pages):
    return pages_to_documents(pages).cache()


@pytest.fixture(scope="module")
def chunks(documents):
    return documents_to_chunks(documents).cache()


@pytest.fixture(scope="module")
def triples(chunks):
    return chunks_to_triples(chunks).cache()


def test_pages_deterministic(spark, pages):
    a = sorted(pages.select("url", "text").collect())
    b = sorted(synth_pages(spark, N_PAGES, partitions=3).select("url", "text").collect())
    assert a == b


def test_pages_include_fixture_docs_byte_exact(pages):
    row = pages.filter(F.col("url").contains("fixtures")).orderBy("url").first()
    with open("/root/reference/Test Files/house_of_wisdom_baghdad.markdown",
              encoding="utf-8") as f:
        assert row["text"] == f.read()


def test_documents_byte_identical_canonical_text(pages, documents):
    """The north-rule invariant: per-url canonical text must equal the
    plain-Python reference canonicalizer output, byte for byte."""
    raw = {r["url"]: r["text"] for r in pages.collect()}
    out = {r["url"]: r["text"] for r in documents.collect()}
    for url, text in out.items():
        assert text == py_canonicalize(raw[url]), url


def test_documents_doc_id_is_content_hash(documents):
    for r in documents.select("doc_id", "text").collect():
        assert r["doc_id"] == py_sha256_hex(r["text"])


def test_duplicate_content_collapses(pages, documents):
    # fam-5 rows duplicate fam-0 content under a different url
    assert documents.count() < pages.count()
    assert documents.groupBy("doc_id").count().agg(F.max("count")).first()[0] == 1


def test_chunks_match_reference_chunker(documents, chunks):
    docs = {r["doc_id"]: r["text"] for r in documents.collect()}
    got = {}
    for r in chunks.collect():
        got.setdefault(r["doc_id"], []).append((r["chunk_idx"], r["text"], r["chunk_id"]))
    for doc_id, text in docs.items():
        expected = chunk_text(text, 2500, 0)
        rows = sorted(got.get(doc_id, []))
        assert [t for _, t, _ in rows] == expected, doc_id
        for _, t, cid in rows:
            assert cid == py_sha256_hex(t)


def test_triples_match_plain_python_reference(documents, chunks, triples):
    """The P/R gate skeleton: Spark triples == plain-Python pipeline run."""
    expected = set()
    for r in documents.collect():
        for chunk in chunk_text(r["text"], 2500, 0):
            for t in flatten_triples(extract_chunk_triples(chunk), src_txt=chunk):
                expected.add((r["doc_id"], t["subject"], t["rel_type"],
                              str(t["object"]), t["object_kind"]))
    got = {
        (r["doc_id"], r["subject"], r["rel_type"], str(r["object"]), r["object_kind"])
        for r in triples.collect()
    }
    assert got == expected
    assert len(got) > 20


def test_triples_have_table_and_timeline_and_distribution_kinds(triples):
    kinds = {r["object_kind"] for r in triples.select("object_kind").distinct().collect()}
    assert kinds == {"scalar", "timeline", "distribution"}


def test_graph_build(triples):
    nodes, edges, mentions, emb = build_graph(triples)
    nodes_c = nodes.cache()
    edges_c = edges.cache()

    assert nodes_c.filter(F.col("entity_id").isNull()).count() == 0
    assert nodes_c.groupBy("entity_id").count().agg(F.max("count")).first()[0] == 1

    # every edge endpoint resolves to a node
    ids = {r["entity_id"] for r in nodes_c.select("entity_id").collect()}
    for r in edges_c.select("src_id", "dst_id").collect():
        assert r["src_id"] in ids and r["dst_id"] in ids

    # Time_Period nodes carry start/end
    tp = nodes_c.filter(F.col("label") == "Time_Period").collect()
    assert tp and all(r["start"] and r["end"] for r in tp)

    # distribution edges carry term+count and the fixed rel type
    dist = edges_c.filter(F.col("term").isNotNull()).collect()
    assert dist and all(r["rel_type"] == "HAS_INITIATIVE_COUNT" for r in dist)
    assert all(r["count"] is not None for r in dist)

    # sources contain at least one doc_id; embeddings are l2-normalized
    e = edges_c.first()
    assert e["sources"] and len(e["embedding"]) == 64
    n = nodes_c.first()
    norm = sum(x * x for x in n["embedding"])
    assert abs(norm - 1.0) < 1e-3

    # mentions: unique pairs, both directions covered by one table
    assert mentions.count() == mentions.dropDuplicates(["doc_id", "entity_id"]).count()


def test_edge_sources_accumulate_across_docs(spark):
    """Same triple from two docs -> one edge with both doc_ids (S4)."""
    text = make_text(0)  # fam-0 SVO doc
    pages = spark.createDataFrame(
        [("u1", text + "\n\nExtra unique line one."),
         ("u2", text + "\n\nAnother unique ending.")],
        "url string, text string",
    )
    docs = pages_to_documents(pages)
    triples = chunks_to_triples(documents_to_chunks(docs))
    _, edges, _, _ = build_graph(triples)
    multi = edges.filter(F.size("sources") >= 2).count()
    assert multi > 0


# --- html:binary -> text extraction (north-star item 1) ---

def test_html_to_text_byte_identical_per_url(pages):
    """input_hint invariant: extracted text per url must be byte-identical
    to the reference extractor (the same plain-Python function)."""
    from neo4j_document_pipeline_spark.functions.text import py_html_to_text
    for r in pages.select("url", "html", "text").collect():
        assert py_html_to_text(r["html"]) == r["text"], r["url"]


def test_documents_from_html_match_documents_from_text(spark, pages):
    from_text = pages_to_documents(pages)
    from_html = pages_to_documents(pages, text_source="html")
    cols = ["doc_id", "url", "text"]
    assert sorted(from_text.select(*cols).collect()) == \
        sorted(from_html.select(*cols).collect())
    # 'auto' with text nulled out must also reproduce the same documents
    nulled = pages.withColumn("text", F.lit(None).cast("string"))
    from_auto = pages_to_documents(nulled, text_source="auto")
    assert sorted(from_text.select(*cols).collect()) == \
        sorted(from_auto.select(*cols).collect())


def test_html_to_text_adversarial():
    from neo4j_document_pipeline_spark.functions.text import py_html_to_text
    # script/style/head dropped, entities unescaped, br -> newline
    h = (b"<html><head><title>T</title><style>p{}</style>"
         b"<script>var x='<p>no</p>';</script></head>"
         b"<body><p>A &amp; B</p><div>C<br/>D</div></body></html>")
    assert py_html_to_text(h) == "A & B\n\nC\nD"
    assert py_html_to_text(None) == ""
    assert py_html_to_text(b"") == ""
    assert py_html_to_text(b"no tags at all") == "no tags at all"
    # invalid utf-8 is replaced, not fatal
    assert "�" in py_html_to_text(b"<p>\xff\xfe</p>")
    # unclosed / hostile markup must not raise
    py_html_to_text(b"<p><div><p>x")


def test_default_text_source_prunes_html_from_scan(spark, tmp_path):
    """The 100TB design check: unless html extraction is requested, the
    html binary column must never be read from parquet."""
    import io
    from contextlib import redirect_stdout
    p = str(tmp_path / "pages.parquet")
    synth_pages(spark, 10).write.mode("overwrite").parquet(p)
    df = pages_to_documents(spark.read.parquet(p))
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    read_schema = [l for l in buf.getvalue().splitlines() if "ReadSchema" in l]
    assert read_schema and all("html" not in l for l in read_schema)


def test_unicode_pages_survive_full_pipeline(spark, tmp_path):
    """Common-Crawl reality check: CJK, Arabic (RTL), emoji, combining
    marks, and NBSP-laced text flow through canonicalize → chunk →
    extract → graph build → query without crashing, with well-formed
    tables (extraction may legitimately find no ASCII-pattern triples in
    non-Latin text — the requirement is graceful handling, not facts)."""
    import datetime

    from neo4j_document_pipeline_spark.plans.pipeline import run_pipeline
    from neo4j_document_pipeline_spark.sources.store import GraphStore
    ts = datetime.datetime(2025, 1, 1, tzinfo=datetime.timezone.utc)
    rows = [
        ("https://ex.com/cjk", ts, None,
         "人工智能改变了世界。The Beijing Institute developed quantum "
         "networks. 东京大学は新しい方法を発表した。", "zh"),
        ("https://ex.com/rtl", ts, None,
         "طور الخوارزمي الجبر في بغداد. Al-Khwarizmi developed algebra "
         "in the ninth century.", "ar"),
        ("https://ex.com/emoji", ts, None,
         "The Rocket Team 🚀 launched a satellite 🛰️. Great success! "
         "The Mission Control celebrated the launch.", "en"),
        ("https://ex.com/marks", ts, None,
         "The Institut́ Pasteur published findings. The "
         "Research Council funded the work.", "fr"),
    ]
    pages = spark.createDataFrame(
        rows, "url string, warc_ts timestamp, html binary, text string, "
              "lang string")
    root = str(tmp_path / "kg")
    m = run_pipeline(spark, pages, root)
    assert m["documents"]["rows"] == 4
    store = GraphStore(root, spark)
    nodes = store.read("nodes").collect()
    # Latin-script sentences inside the mixed docs still extract
    names = {r["name"] for r in nodes}
    assert any("Al-Khwarizmi" in n for n in names)
    # every committed name/label is valid non-empty text
    for r in nodes:
        assert r["name"].strip() and r["label"].strip()
    # the read path answers over the mixed-script store
    from neo4j_document_pipeline_spark.operators.retrieval import graphrag
    res = graphrag(spark, store, "What did Al-Khwarizmi develop?")
    assert "algebra" in res.answer
    # textstats never crash on non-Latin input
    from neo4j_document_pipeline_spark.functions.textstats import (
        col_lang_id, col_quality_score, col_token_count)
    stats = pages.select(
        col_token_count(F.col("text")).alias("n"),
        col_lang_id(F.col("text")).alias("lang"),
        col_quality_score(F.col("text")).alias("q")).collect()
    for r in stats:
        assert r["n"] >= 0 and 0.0 <= r["q"] <= 1.0 and r["lang"]


def test_degenerate_pages_survive_full_pipeline(spark, tmp_path):
    """Null text, empty text, whitespace-only, and a single enormous
    paragraph (forces the token-slice chunk path) must flow through the
    pipeline without crashing, alongside one normal page."""
    import datetime

    from neo4j_document_pipeline_spark.plans.pipeline import run_pipeline
    from neo4j_document_pipeline_spark.sources.store import GraphStore
    ts = datetime.datetime(2025, 1, 1, tzinfo=datetime.timezone.utc)
    big = ("The Long Council approved the plan. " * 3000).strip()  # >2500 tok
    rows = [
        ("https://ex.com/null", ts, None, None, "en"),
        ("https://ex.com/empty", ts, None, "", "en"),
        ("https://ex.com/blank", ts, None, "   \n\t  \n", "en"),
        ("https://ex.com/huge", ts, None, big, "en"),
        ("https://ex.com/ok", ts, None,
         "The Science Agency launched the Data Program.", "en"),
    ]
    pages = spark.createDataFrame(
        rows, "url string, warc_ts timestamp, html binary, text string, "
              "lang string")
    root = str(tmp_path / "kg")
    m = run_pipeline(spark, pages, root)
    store = GraphStore(root, spark)
    chunks = store.read("chunks")
    # the huge doc split into multiple chunks, each within budget
    huge_doc = store.read("documents").filter(
        F.col("url") == "https://ex.com/huge").first()["doc_id"]
    n_huge = chunks.filter(F.col("doc_id") == huge_doc).count()
    assert n_huge > 1
    assert chunks.filter(F.col("n_tokens") > 2500).count() == 0
    # graph tables exist and the normal page extracted
    names = {r["name"] for r in store.read("nodes").collect()}
    assert any("Science Agency" in n for n in names)
