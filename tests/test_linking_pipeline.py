"""Canonicalization pipeline stage + stateful streaming operator tests."""

import pytest
from pyspark.sql import functions as F

from neo4j_document_pipeline_spark.plans.pipeline import run_pipeline
from neo4j_document_pipeline_spark.sources.pages import synth_pages
from neo4j_document_pipeline_spark.sources.store import GraphStore
from neo4j_document_pipeline_spark.streaming.ingest import stateful_user_counters


def test_pipeline_with_canonicalization(spark, tmp_path):
    root = str(tmp_path / "kgc")
    m = run_pipeline(spark, synth_pages(spark, 80), root,
                     canonicalize_entities=True)
    assert "entity_map" in m and "nodes_canonical" in m
    store = GraphStore(root, spark)
    n_raw = store.read("nodes").count()
    n_canon = store.read("nodes_canonical").count()
    assert 0 < n_canon <= n_raw
    # fam-6 near-duplicate names must have merged
    mapping = store.read("entity_map")
    merged = mapping.filter(F.col("entity_id") != F.col("canonical_id")).count()
    assert merged > 0
    # canonical edges resolve against canonical nodes
    ids = {r["entity_id"] for r in store.read("nodes_canonical").collect()}
    for r in store.read("edges_canonical").select("src_id", "dst_id").collect():
        assert r["src_id"] in ids and r["dst_id"] in ids
    # the canonical FTS index commits alongside, stamped to its snapshot
    tok_man = store.manifest("node_tokens_canonical")
    assert tok_man and tok_man["metrics"]["src_nodes_version"] == \
        store.manifest("nodes_canonical")["version"]

    # graphrag auto-serves the CANONICAL graph while fresh: every seed id
    # must be a canonical entity, and the flagship fact still answers
    from neo4j_document_pipeline_spark.operators.retrieval import graphrag
    res = graphrag(spark, store, "What did Al-Khwarizmi develop?")
    assert res.timings["canonical_graph"] == 1.0
    assert 'Al-Khwarizmi") -[developed]-> Entity("algebra")' in res.answer
    assert res.seeds and all(s["entity_id"] in ids for s in res.seeds)
    # explicit opt-out serves the raw graph (byte-identical flagship fact)
    raw = graphrag(spark, store, "What did Al-Khwarizmi develop?",
                   use_canonical=False)
    assert raw.timings["canonical_graph"] == 0.0
    assert 'Al-Khwarizmi") -[developed]-> Entity("algebra")' in raw.answer
    # a raw-table merge AFTER canonicalization (different fingerprint)
    # must auto-fall back to the raw graph, not answer from a stale
    # resolution
    store.write("nodes", store.read("nodes"), input_fingerprint="fp-new")
    res2 = graphrag(spark, store, "What did Al-Khwarizmi develop?")
    assert res2.timings["canonical_graph"] == 0.0
    assert 'developed]-> Entity("algebra")' in res2.answer
    # likewise a PARTIAL canonicalization (one table's fingerprint
    # behind) must not serve a mixed graph
    store.write("nodes", store.read("nodes"),
                input_fingerprint=store.manifest("nodes_canonical")
                ["input_fingerprint"])
    store.write("edges_canonical", store.read("edges_canonical"),
                input_fingerprint="fp-older")
    res3 = graphrag(spark, store, "What did Al-Khwarizmi develop?")
    assert res3.timings["canonical_graph"] == 0.0


def test_stateful_user_counters_stream(spark, tmp_path):
    events = spark.read.parquet("/root/testdata/sf0.001/events.parquet") \
        .withColumn("ts", F.col("ts").cast("timestamp"))
    expected = {
        r["user_id"]: (r["n"], round(r["v"], 6))
        for r in events.groupBy("user_id")
        .agg(F.count("*").alias("n"), F.sum("value").alias("v")).collect()
    }
    d = str(tmp_path / "ev")
    events.write.parquet(d)
    stream = spark.readStream.schema(events.schema).parquet(d)
    q = (stateful_user_counters(stream)
         .writeStream.outputMode("update")
         .format("memory").queryName("statecnt")
         .trigger(availableNow=True).start())
    assert q.awaitTermination(300), "ingest stream did not terminate"
    # last emitted row per user carries the cumulative totals
    got_rows = spark.sql(
        "select * from (select *, row_number() over "
        "(partition by user_id order by n_events desc) rk from statecnt) "
        "where rk = 1").collect()
    got = {r["user_id"]: (r["n_events"], round(r["total_value"], 6))
           for r in got_rows}
    assert got == expected


def test_debug_search_probes_same_graph_as_queries(spark, tmp_path):
    """The debug surface and the live query path must select the SAME
    graph (canonical while fresh, raw after it goes stale)."""
    from neo4j_document_pipeline_spark.operators.admin import debug_search
    from neo4j_document_pipeline_spark.operators.retrieval import graphrag
    root = str(tmp_path / "kgd")
    run_pipeline(spark, synth_pages(spark, 60), root,
                 canonicalize_entities=True)
    store = GraphStore(root, spark)
    d = debug_search(store, "What did Al-Khwarizmi develop?")
    r = graphrag(spark, store, "What did Al-Khwarizmi develop?")
    assert d["canonical_graph"] is True
    assert r.timings["canonical_graph"] == 1.0
    assert any(i["name"] == "node_tokens_canonical"
               for i in d["existing_indexes"])
    # stale the canonical set -> both fall back together
    store.write("nodes", store.read("nodes"), input_fingerprint="fp-x")
    d2 = debug_search(store, "What did Al-Khwarizmi develop?")
    r2 = graphrag(spark, store, "What did Al-Khwarizmi develop?")
    assert d2["canonical_graph"] is False
    assert r2.timings["canonical_graph"] == 0.0


def test_tfidf_linking_runs_no_count_job(spark, tmp_path, monkeypatch):
    """Round-4 verdict item 3: link_entities(score='tfidf') sizes its IDF
    denominator from the caller-supplied manifest row count (exactly how
    the canonicalize pipeline stage invokes it) — no count() job on the
    linking write path — and scores identically to the count()-fallback
    invocation."""
    from pyspark.sql import DataFrame

    from neo4j_document_pipeline_spark.operators.linking import (
        link_entities)
    root = str(tmp_path / "kg")
    run_pipeline(spark, synth_pages(spark, 60), root)
    store = GraphStore(root, spark)
    nodes = store.read("nodes")
    n_rows = store.manifest("nodes")["rows"]
    baseline = sorted(
        (r["id1"], r["id2"], round(r["sim"], 9))
        for r in link_entities(nodes, score="tfidf").collect())

    def boom(self):
        raise AssertionError("count() job on the tfidf linking path")

    monkeypatch.setattr(DataFrame, "count", boom)
    got = sorted(
        (r["id1"], r["id2"], round(r["sim"], 9))
        for r in link_entities(nodes, score="tfidf",
                               n_rows=n_rows).collect())
    assert got == baseline and got
