"""Per-label coarse quantizers (cfg.ann_per_label) — reference parity
with Neo4j's one-vector-index-per-label (ingestMD.py:669-690), expressed
as contiguous per-label ranges of ONE flat cell-id space so the
(label, cell) partition layout, sidecar format, and probe machinery stay
unchanged while each label gets cells sized from ITS OWN row count."""

import dataclasses

import pytest
from pyspark.sql import functions as F

from neo4j_document_pipeline_spark.config import DEFAULT_CONFIG, PipelineConfig
from neo4j_document_pipeline_spark.functions.featurizer import embed_text
from neo4j_document_pipeline_spark.operators.retrieval import (
    build_node_vectors,
    graphrag,
    resolve_ann_cells,
    vector_channel,
)
from neo4j_document_pipeline_spark.plans.pipeline import run_pipeline
from neo4j_document_pipeline_spark.sources.pages import synth_pages
from neo4j_document_pipeline_spark.sources.store import GraphStore


def _nodes(spark, n_big=300, n_small=12, dim=8):
    """Synthetic nodes with one head label and one rare label — the skew
    shape per-label quantizers exist for."""
    return spark.range(0, n_big + n_small).selectExpr(
        "concat('e', id) AS entity_id",
        f"CASE WHEN id < {n_big} THEN 'Entity' ELSE 'Goal' END AS label",
        f"transform(sequence(1, {dim}),"
        " j -> cast(hash(id, j) % 97 AS double) / 97.0) AS embedding")


CFG = PipelineConfig(ann_per_label=True, ann_target_cell_rows=64,
                     ann_train_iters=2, ann_label_train_sample=64)


def test_per_label_geometry_and_range_allocation(spark):
    """Each label's cell count derives from ITS row count; ranges tile
    the flat centroid list contiguously in sorted-label order; every
    indexed row's cell sits inside its own label's range."""
    nodes = _nodes(spark)
    idx, cents, books, ranges = build_node_vectors(nodes, CFG)
    assert books is None
    assert set(ranges) == {"Entity", "Goal"}
    assert ranges["Entity"][0] == 0
    assert ranges["Entity"][1] == resolve_ann_cells(CFG, 300)  # 300/64 -> 5
    assert ranges["Goal"][0] == ranges["Entity"][1]
    # the rare label still gets the 4-cell floor, capped by its sample
    assert ranges["Goal"][1] == min(resolve_ann_cells(CFG, 12), 12)
    assert len(cents) == ranges["Goal"][0] + ranges["Goal"][1]
    for r in idx.collect():
        off, n = ranges[r["label"]]
        assert off <= r["cell"] < off + n, (r["label"], r["cell"], ranges)


def test_per_label_full_probe_is_exact(spark):
    """nprobe == n_cells with per-label quantizers is provably exact —
    byte-identical (id, score) to the brute scan, labeled and not."""
    nodes = _nodes(spark)
    idx, cents, _, ranges = build_node_vectors(nodes, CFG)
    q = embed_text("probe", dim=8).tolist()
    for labels in (None, ["Goal"], ["Entity"]):
        allowed = None
        if labels:
            allowed = set()
            for lab in labels:
                off, n = ranges[lab]
                allowed.update(range(off, off + n))
        brute = [(r["entity_id"], r["vec"]) for r in
                 vector_channel(nodes, q, labels, 10).collect()]
        probed = [(r["entity_id"], r["vec"]) for r in
                  vector_channel(nodes, q, labels, 10, index=idx,
                                 centroids=cents, nprobe=len(cents),
                                 allowed_cells=allowed).collect()]
        assert probed == brute, labels


def test_per_label_probe_for_absent_label_is_empty(spark):
    """A labeled probe for a label the quantizer owns no cells for must
    return empty (a fresh index covers every embedded row, so no-cells
    means no rows) instead of crashing on an empty IN-list."""
    nodes = _nodes(spark)
    idx, cents, _, ranges = build_node_vectors(nodes, CFG)
    q = embed_text("probe", dim=8).tolist()
    out = vector_channel(nodes, q, ["Nope"], 10, index=idx,
                         centroids=cents, nprobe=len(cents),
                         allowed_cells=set()).collect()
    assert out == []


def test_per_label_pq_full_probe_matches_plain(spark):
    """ann_per_label composes with IVFPQ: codebooks stay GLOBAL, codes
    land in per-label cells, and the exact rerank keeps full-probe
    answers byte-identical to the plain per-label index."""
    nodes = _nodes(spark)
    cfg_pq = dataclasses.replace(CFG, ann_pq_m=4, ann_pq_k=16)
    idxp, cents, books, ranges = build_node_vectors(nodes, cfg_pq)
    assert books is not None and "pq_code" in idxp.columns
    idx, cents2, _, ranges2 = build_node_vectors(nodes, CFG)
    assert cents2 == cents and ranges2 == ranges  # same coarse quantizer
    q = embed_text("probe", dim=8).tolist()
    plain = [(r["entity_id"], round(r["vec"], 9)) for r in
             vector_channel(nodes, q, ["Entity"], 8, index=idx,
                            centroids=cents, nprobe=len(cents),
                            min_probe_rows=10_000,
                            allowed_cells=set(range(*_span(ranges, "Entity")))
                            ).collect()]
    pq = [(r["entity_id"], round(r["vec"], 9)) for r in
          vector_channel(nodes, q, ["Entity"], 8, index=idxp,
                         centroids=cents, nprobe=len(cents),
                         min_probe_rows=10_000, pq_codebooks=books,
                         allowed_cells=set(range(*_span(ranges, "Entity")))
                         ).collect()]
    assert pq == plain


def _span(ranges, lab):
    off, n = ranges[lab]
    return off, off + n


def test_per_label_reuse_appends_new_labels_only(spark):
    """Incremental reuse: a delta carrying a NEW label trains and
    APPENDS that label's cells; existing labels' slices are
    byte-identical (committed rows never re-assign, so partition-scoped
    merges stay sound), and the delta's rows assign into the right
    ranges."""
    nodes = _nodes(spark)
    _, cents, _, ranges = build_node_vectors(nodes, CFG)
    delta = spark.range(0, 20).selectExpr(
        "concat('x', id) AS entity_id",
        "CASE WHEN id % 2 = 0 THEN 'Goal' ELSE 'Metric' END AS label",
        "transform(sequence(1, 8),"
        " j -> cast(hash(id + 999, j) % 97 AS double) / 97.0) AS embedding")
    idx2, cents2, _, ranges2 = build_node_vectors(
        delta, CFG, centroids=cents, label_ranges=ranges)
    assert cents2[:len(cents)] == cents
    assert ranges2["Entity"] == list(ranges["Entity"])
    assert ranges2["Goal"] == list(ranges["Goal"])
    assert ranges2["Metric"][0] == len(cents)
    assert len(cents2) == len(cents) + ranges2["Metric"][1]
    for r in idx2.collect():
        off, n = ranges2[r["label"]]
        assert off <= r["cell"] < off + n


def test_per_label_pipeline_graphrag_parity(spark, tmp_path):
    """End-to-end: a per-label-index store commits label_cells in the
    manifest, graphrag serves it (labeled and unlabeled), and the
    flagship answers match the global-quantizer store's."""
    cfg = dataclasses.replace(DEFAULT_CONFIG, ann_per_label=True)
    root = str(tmp_path / "kg_pl")
    run_pipeline(spark, synth_pages(spark, 60), root, cfg=cfg)
    store = GraphStore(root, spark)
    vman = store.manifest("node_vectors")
    lcells = vman["metrics"].get("label_cells")
    assert lcells, "per-label build must stamp label_cells"
    assert sum(n for _, n in lcells.values()) == vman["metrics"]["n_cells"]
    r = graphrag(spark, store, "What did Al-Khwarizmi develop?", cfg=cfg)
    assert r.timings.get("ann_index") == 1.0
    rl = graphrag(spark, store, "What did Al-Khwarizmi develop?",
                  labels=["Stakeholder", "Entity"], cfg=cfg)
    assert rl.timings.get("ann_index") == 1.0

    root2 = str(tmp_path / "kg_global")
    run_pipeline(spark, synth_pages(spark, 60), root2)
    g = GraphStore(root2, spark)
    r2 = graphrag(spark, g, "What did Al-Khwarizmi develop?")
    rl2 = graphrag(spark, g, "What did Al-Khwarizmi develop?",
                   labels=["Stakeholder", "Entity"])
    assert r.answer == r2.answer
    assert rl.answer == rl2.answer
    assert 'Al-Khwarizmi") -[developed]-> Entity("algebra")' in r.answer


def test_per_label_incremental_full_equals_full_plus_delta(spark, tmp_path):
    """ingest_increment on a per-label store reuses the committed
    quantizer (merge path, not rebuild) and the served answers equal a
    single full build over the union corpus."""
    from neo4j_document_pipeline_spark.streaming.ingest import (
        ingest_increment)
    cfg = dataclasses.replace(DEFAULT_CONFIG, ann_per_label=True)
    root = str(tmp_path / "inc")
    run_pipeline(spark, synth_pages(spark, 20), root, cfg=cfg)
    store = GraphStore(root, spark)
    v0 = store.manifest("node_vectors")
    delta = synth_pages(spark, 26).subtract(synth_pages(spark, 20))
    ingest_increment(store, delta, cfg=cfg)
    v1 = store.manifest("node_vectors")
    lc0 = v0["metrics"]["label_cells"]
    lc1 = v1["metrics"]["label_cells"]
    for lab, span in lc0.items():  # existing slices never move
        assert lc1[lab] == span, lab
    full_root = str(tmp_path / "full")
    run_pipeline(spark, synth_pages(spark, 26), full_root, cfg=cfg)
    q = "What did Al-Khwarizmi develop?"
    ri = graphrag(spark, store, q, cfg=cfg)
    rf = graphrag(spark, GraphStore(full_root, spark), q, cfg=cfg)
    assert ri.timings.get("ann_index") == 1.0
    assert ri.answer == rf.answer


def test_cli_ann_per_label_flag(spark, tmp_path, capsys):
    """--ann-per-label reaches both CLI ingest paths: the full pipeline
    commits a per-label quantizer (manifest label_cells) and a later
    --incremental batch under the same flag reuses it (existing labels'
    slices never move)."""
    from neo4j_document_pipeline_spark.__main__ import main
    root = str(tmp_path / "kg")
    main(["ingest", "--store", root, "--pages", "synth:20",
          "--ann-per-label"])
    capsys.readouterr()
    st = GraphStore(root, spark)
    lc0 = (st.manifest("node_vectors")["metrics"] or {})["label_cells"]
    assert lc0  # per-label quantizer committed, not the global one
    main(["ingest", "--store", root, "--pages", "synth:26",
          "--incremental", "--ann-per-label"])
    capsys.readouterr()
    lc1 = (st.manifest("node_vectors")["metrics"] or {})["label_cells"]
    for lab, span in lc0.items():
        assert lc1[lab] == span, lab


def test_per_label_explicit_cells_reuses_on_increment(spark, tmp_path):
    """Explicit geometry (ann_cells>0) under per-label quantizers: the
    committed TOTAL is a sum over labels, so the reuse check must judge
    each label's own slice — comparing the total to ann_cells would
    full-rebuild the index on every batch. Reuse is proven by the
    committed centroid prefix surviving the increment byte-identically
    (a rebuild retrains from the grown corpus and moves it)."""
    from neo4j_document_pipeline_spark.operators.retrieval import (
        load_quantizers)
    from neo4j_document_pipeline_spark.streaming.ingest import (
        ingest_increment)
    cfg = dataclasses.replace(DEFAULT_CONFIG, ann_per_label=True,
                              ann_cells=4)
    root = str(tmp_path / "kg")
    run_pipeline(spark, synth_pages(spark, 20), root, cfg=cfg)
    store = GraphStore(root, spark)
    v0 = store.manifest("node_vectors")
    cents0, _ = load_quantizers(store, "node_vectors", v0)
    lc0 = v0["metrics"]["label_cells"]
    delta = synth_pages(spark, 26).subtract(synth_pages(spark, 20))
    ingest_increment(store, delta, cfg=cfg)
    v1 = store.manifest("node_vectors")
    cents1, _ = load_quantizers(store, "node_vectors", v1)
    lc1 = v1["metrics"]["label_cells"]
    for lab, span in lc0.items():
        assert lc1[lab] == span, lab
    assert cents1[:len(cents0)] == cents0  # reused, not retrained


def test_cli_stream_carries_ann_per_label_cfg(tmp_path, monkeypatch):
    """The stream command must hand the SAME config to the increment
    path as ingest does — a drain under DEFAULT_CONFIG would rebuild a
    --ann-per-label store's committed per-label index as a global one."""
    import neo4j_document_pipeline_spark.streaming.ingest as si
    from neo4j_document_pipeline_spark.__main__ import main
    got = {}

    class _Q:
        def awaitTermination(self):
            return None

    def fake_stream(spark, pages_dir, store_root, ckpt, cfg=None, **kw):
        got["cfg"] = cfg
        return _Q()

    monkeypatch.setattr(si, "start_ingest_stream", fake_stream)
    pages = tmp_path / "pages"
    pages.mkdir()
    main(["stream", "--store", str(tmp_path / "kg"), "--pages",
          str(pages), "--ann-per-label"])
    assert got["cfg"] is not None and got["cfg"].ann_per_label
