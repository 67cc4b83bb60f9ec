"""Admin surface + query-side fixture set (FIXTURES.md §4)."""

import json

import pytest
from pyspark.sql import functions as F

from neo4j_document_pipeline_spark.operators.admin import (
    drop_all,
    graph_schema,
    graph_search,
    graph_stats,
    healthz,
    list_documents,
)
from neo4j_document_pipeline_spark.operators.retrieval import graphrag
from neo4j_document_pipeline_spark.plans.pipeline import run_pipeline
from neo4j_document_pipeline_spark.sources.pages import synth_pages
from neo4j_document_pipeline_spark.sources.store import GraphStore


@pytest.fixture(scope="module")
def kg(spark, tmp_path_factory):
    root = str(tmp_path_factory.mktemp("kgq") / "store")
    run_pipeline(spark, synth_pages(spark, 80), root)
    return GraphStore(root, spark)


def test_graph_stats(kg):
    s = graph_stats(kg)
    assert s["total_nodes"] > 30
    assert s["total_relationships"] > 20
    assert "Stakeholder" in s["nodes_by_label"]
    assert len(s["most_connected"]) == 10
    assert s["most_connected"][0]["degree"] >= s["most_connected"][-1]["degree"]


def test_degree_histogram(kg):
    from neo4j_document_pipeline_spark.operators.admin import (
        degree_histogram)
    h = degree_histogram(kg)
    # buckets partition the degree-table rows exactly
    assert sum(h["histogram"].values()) == h["nodes_with_edges"] > 0
    # the top hub agrees with graph_stats' most_connected
    assert h["max_degree"] == graph_stats(kg)["most_connected"][0]["degree"]
    assert 1 <= h["p50"] <= h["p90"] <= h["p99"] <= h["max_degree"]
    assert h["mean_degree"] >= 1.0
    # bucket keys are the powers-of-two lower bounds
    assert all(int(k) & (int(k) - 1) == 0 for k in h["histogram"])
    # the hub's bucket exists: 2^floor(log2(dmax)) is a key
    top = 1 << (h["max_degree"].bit_length() - 1)
    assert str(top) in h["histogram"]


def test_degree_histogram_empty_graph(spark):
    from neo4j_document_pipeline_spark.operators.admin import (
        degree_histogram)

    class _EdgelessStore:
        def read(self, table):
            assert table == "edges"
            return spark.createDataFrame(
                [], "src_id string, dst_id string")

    h = degree_histogram(_EdgelessStore())
    assert h["nodes_with_edges"] == 0 and h["histogram"] == {}


def test_graph_schema(kg):
    s = graph_schema(kg)
    pats = {(p["from"], p["rel"], p["to"]) for p in s["patterns"]}
    assert ("Stakeholder", "developed", "Entity") in pats
    assert any(p["rel"] == "HAS_INITIATIVE_COUNT" and p["to"] == "Pillar"
               for p in s["patterns"])


def test_graph_search(kg):
    rows = graph_search(kg, "al-").collect()
    assert rows and all("al-" in r["name"].lower() for r in rows)
    lab = graph_search(kg, "pillar", label="Pillar").collect()
    assert all(r["label"] == "Pillar" for r in lab)


def test_list_documents(kg):
    docs = list_documents(kg, limit=10).collect()
    assert docs and all(r["n_entities"] >= 0 for r in docs)


def test_healthz(kg):
    assert healthz(kg)["status"] == "ok"


def test_drop_all(spark, tmp_path):
    root = str(tmp_path / "drop")
    run_pipeline(spark, synth_pages(spark, 15), root)
    store = GraphStore(root, spark)
    assert store.exists("nodes")
    drop_all(store)
    assert not store.exists("nodes")


# ---- query-side fixture set: questions -> expected fact substrings ----

QUERY_FIXTURES = [
    ("Who developed algebra?", ["developed"], dict(top_k=8, hops=1)),
    ("What does the Digital Ministry support?", ["Digital Ministry"], dict(top_k=8, hops=1)),
    ("Broadband Initiative timeline", ["Broadband Initiative"], dict(top_k=8, hops=2)),
    ("initiative counts for the Digital Pillar", ["HAS_INITIATIVE_COUNT"], dict(top_k=10, hops=1)),
    ("Energy Council oversight", ["Energy Council"], dict(top_k=6, hops=1, use_mmr=False)),
    ("Solar Programme schedule", ["Solar"], dict(top_k=6, hops=1, use_cross_doc=False)),
]


@pytest.mark.parametrize("question,expected_substrings,kw", QUERY_FIXTURES)
def test_query_fixtures(spark, kg, question, expected_substrings, kw):
    res = graphrag(spark, kg, question, **kw)
    assert res.answer.startswith("Graph Facts:"), res.answer
    for sub in expected_substrings:
        assert any(sub in f for f in res.facts), (
            f"{question!r}: {sub!r} not in facts:\n" + "\n".join(res.facts[:15]))


def test_noisy_edges_never_in_facts(spark, kg):
    res = graphrag(spark, kg, "Al-Farabi", top_k=10, hops=3)
    assert not any("MENTIONS" in f or "-[SOURCE]->" in f for f in res.facts)


def test_queue_stats_shape(kg, spark):
    from neo4j_document_pipeline_spark.operators.admin import queue_stats
    s = queue_stats(kg, spark)
    assert s["success"] is True
    stats = s["stats"]
    assert stats["worker_count"] >= 1
    assert stats["active_streams"] == 0 and stats["streams"] == []
    committed = {t["table"] for t in stats["committed_stages"]}
    assert {"nodes", "edges", "mentions", "documents_final",
            "node_tokens"} <= committed
    for t in stats["committed_stages"]:
        assert t["rows"] is not None and t["version"].startswith("v-")
        assert t["committed_at_unix"] > 0


def test_ingest_status_states(kg):
    from neo4j_document_pipeline_spark.operators.admin import ingest_status
    missing = ingest_status(kg)  # no job_id — reference's exact error shape
    assert missing["success"] is False and "job_id" in missing["message"]
    ok = ingest_status(kg, "nodes")
    assert ok["state"] == "SUCCESS"
    assert ok["result"]["rows"] > 0 and ok["result"]["partitions"] >= 1
    pending = ingest_status(kg, "no_such_stage")
    assert pending["state"] == "PENDING" and pending["result"] is None


def test_queue_stats_sees_active_stream(spark, kg, tmp_path):
    """A live StreamingQuery must show up as an active 'task'."""
    from neo4j_document_pipeline_spark.operators.admin import queue_stats
    stream = (spark.readStream.format("rate").option("rowsPerSecond", 1).load()
              .writeStream.format("memory").queryName("qs_probe")
              .start())
    try:
        s = queue_stats(kg, spark)
        assert s["stats"]["active_streams"] >= 1
        assert any(q["name"] == "qs_probe" for q in s["stats"]["streams"])
    finally:
        stream.stop()


def test_cli_pages_digit_suggests_synth(spark, tmp_path, capsys):
    """`--pages 40` (a bare count) must fail fast with a did-you-mean
    synth:40 hint instead of a raw AnalysisException."""
    from neo4j_document_pipeline_spark.__main__ import main
    with pytest.raises(SystemExit) as ei:
        main(["ingest", "--store", str(tmp_path / "s"), "--pages", "40"])
    assert "synth:40" in str(ei.value)


def test_cli_status_command(spark, kg, capsys):
    import json

    from neo4j_document_pipeline_spark.__main__ import main
    main(["status", "--store", kg.root])
    out = json.loads(capsys.readouterr().out)
    assert out["success"] and out["stats"]["committed_stages"]
    main(["status", "--store", kg.root, "nodes"])
    out = json.loads(capsys.readouterr().out)
    assert out["state"] == "SUCCESS"


def test_debug_search_components(kg):
    from neo4j_document_pipeline_spark.operators.admin import debug_search
    d = debug_search(kg, "What did Al-Khwarizmi develop?")
    assert d["success"] and d["hybrid_results_count"] > 0
    assert d["label_counts"].get("Stakeholder", 0) > 0
    assert any(i["name"] == "node_tokens" for i in d["existing_indexes"])
    assert d["vector_hits"] and d["keyword_hits"]


def test_queue_status_tracks_inflight_queries(spark, kg):
    from neo4j_document_pipeline_spark.operators.admin import queue_status
    from neo4j_document_pipeline_spark.operators.retrieval import (
        _slot_enter, _slot_exit)
    base = queue_status()
    assert base["active_requests"] == 0 and base["available_slots"] == 20
    _slot_enter()
    try:
        mid = queue_status(max_concurrent=2)
        assert mid["active_requests"] == 1 and mid["available_slots"] == 1
    finally:
        _slot_exit()
    assert queue_status()["active_requests"] == 0
    # a real query leaves the counter balanced even on the happy path
    from neo4j_document_pipeline_spark.operators.retrieval import graphrag
    graphrag(spark, kg, "What did Al-Khwarizmi develop?")
    assert queue_status()["active_requests"] == 0


def test_cli_full_surface_integration(spark, tmp_path, capsys):
    """Capstone: every CLI command against ONE store in a realistic
    sequence — bucketed+canonicalized ingest, query, admin surfaces,
    streaming delta, maintenance — with no cross-feature interference."""
    from neo4j_document_pipeline_spark.__main__ import main
    from neo4j_document_pipeline_spark.sources.pages import synth_pages

    store = str(tmp_path / "kg")

    def run(*args):
        main(list(args) + ["--store", store])
        return capsys.readouterr().out

    run("ingest", "--pages", "synth:60", "--buckets", "4",
        "--canonicalize", "--keep-versions", "2")
    out = run("query", "What did Al-Khwarizmi develop?")
    assert 'Al-Khwarizmi") -[developed]-> Entity("algebra")' in out
    assert '"canonical_graph": 1.0' in out
    assert json.loads(run("stats"))["total_nodes"] > 20
    assert json.loads(run("schema"))["patterns"]
    assert "Al-Khwarizmi" in run("search", "khwarizmi")
    assert run("docs").strip()
    assert json.loads(run("status"))["success"]
    assert json.loads(run("status", "nodes"))["state"] == "SUCCESS"
    hist = json.loads(run("history", "nodes"))
    assert hist and hist[-1]["rows"] > 0
    # streaming delta on top of the bucketed+canonical store
    pages_dir = str(tmp_path / "pages")
    delta = synth_pages(spark, 66).subtract(synth_pages(spark, 60))
    delta.write.mode("overwrite").parquet(pages_dir)
    sout = json.loads(run("stream", "--pages", pages_dir))
    assert sout["stream"]["tables"]["documents_final"] > 0
    # maintenance: compact keeps the bucketed layout; vacuum is a no-op
    cout = json.loads(run("compact", "edges"))
    assert cout["rows"] > 0
    assert json.loads(run("vacuum"))["vacuumed"] == "nothing to remove"
    # the store still answers after the whole sequence (raw fallback is
    # fine: the stream delta refreshed raw tables past the canonical fp)
    out2 = run("query", "What did Al-Khwarizmi develop?")
    assert 'Al-Khwarizmi") -[developed]-> Entity("algebra")' in out2
    run("drop")
    assert json.loads(run("status", "nodes"))["state"] == "PENDING"
