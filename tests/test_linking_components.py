"""Entity linking (MinHash-LSH) + connected components tests."""

import pytest
from pyspark.sql import functions as F

from neo4j_document_pipeline_spark.operators.components import connected_components
from neo4j_document_pipeline_spark.operators.linking import (
    apply_canonicalization,
    canonical_map,
    link_entities,
    minhash_signatures,
)
from neo4j_document_pipeline_spark.operators.graph import build_graph
from neo4j_document_pipeline_spark.operators.ingest import (
    chunks_to_triples,
    documents_to_chunks,
    pages_to_documents,
)


def cc_dict(spark, edges):
    df = spark.createDataFrame(edges, "u string, v string")
    return {r["id"]: r["component"] for r in connected_components(df).collect()}


def test_cc_chain(spark):
    got = cc_dict(spark, [("a", "b"), ("b", "c"), ("c", "d"), ("d", "e")])
    assert set(got.values()) == {"a"}
    assert set(got) == {"a", "b", "c", "d", "e"}


def test_cc_star_and_two_clusters(spark):
    edges = [("hub", f"s{i}") for i in range(8)] + [("x", "y"), ("y", "z")]
    got = cc_dict(spark, edges)
    assert got["s3"] == "hub"
    assert got["z"] == "x"
    assert len(set(got.values())) == 2


def test_cc_pathological_long_chain(spark):
    n = 60
    edges = [(f"n{i:03d}", f"n{i+1:03d}") for i in range(n)]
    got = cc_dict(spark, edges)
    assert set(got.values()) == {"n000"}


def test_cc_does_not_merge_disjoint(spark):
    got = cc_dict(spark, [("a", "b"), ("c", "d")])
    assert got["b"] == "a" and got["d"] == "c"
    assert len(set(got.values())) == 2


def test_minhash_identical_names_same_sig(spark):
    df = spark.createDataFrame(
        [("1", "Phase Two"), ("2", "phase-2!"), ("3", "Completely Different Thing")],
        "id string, name string",
    )
    sigs = {r["id"]: r["sig"] for r in minhash_signatures(df, "name").collect()}
    # normalize_name_for_key maps both to 'phase 2' -> identical shingles
    assert sigs["1"] == sigs["2"]
    assert sigs["1"] != sigs["3"]


@pytest.fixture(scope="module")
def variant_nodes(spark):
    """A tiny graph with near-duplicate entity names (fam-6 style)."""
    text = (
        "# Variants\n\n"
        "The Phase Two Programme supports broadband adoption. "
        "Al-Farabi leads the Phase Two Programme.\n\n"
        "The phase 2 programme supports fiber rollout. "
        "Ibn Sina leads the Phase-2 Programme.\n\n"
        "The Solar Strategy targets deserts."
    )
    pages = spark.createDataFrame([("u1", text)], "url string, text string")
    triples = chunks_to_triples(documents_to_chunks(pages_to_documents(pages)))
    nodes, edges, mentions, _ = build_graph(triples)
    return nodes.cache(), edges.cache(), mentions.cache()


def test_link_entities_finds_near_dupes(variant_nodes):
    nodes, _, _ = variant_nodes
    links = link_entities(nodes).collect()
    names = {r["name"] for r in nodes.collect()}
    variants = {n for n in names if "hase" in n}
    assert len(variants) >= 2  # the ingest actually produced variant spellings
    # all variant pairs got linked
    ids = {r["name"]: r["entity_id"] for r in nodes.collect() if "hase" in r["name"]}
    linked = {frozenset((l["id1"], l["id2"])) for l in links}
    idlist = sorted(ids.values())
    for i in range(len(idlist)):
        for j in range(i + 1, len(idlist)):
            assert frozenset((idlist[i], idlist[j])) in linked
    # nothing absurd linked (Solar Strategy stays unlinked)
    solar = [r["entity_id"] for r in nodes.collect() if "Solar" in r["name"]]
    for s in solar:
        assert not any(s in p for p in linked)


def test_canonicalization_rewrites_graph(variant_nodes):
    nodes, edges, mentions = variant_nodes
    links = link_entities(nodes)
    mapping = canonical_map(nodes, links)
    cn, ce, cm = apply_canonicalization(nodes, edges, mentions, mapping)
    n_before = nodes.count()
    n_after = cn.count()
    assert n_after < n_before
    # all edges endpoints exist in canonical nodes
    ids = {r["entity_id"] for r in cn.collect()}
    for r in ce.collect():
        assert r["src_id"] in ids and r["dst_id"] in ids
    # the merged variant entity now carries both lead/support edges
    variant_id = next(r["entity_id"] for r in cn.collect() if "hase" in r["name"].lower())
    deg = ce.filter((F.col("src_id") == variant_id) | (F.col("dst_id") == variant_id)).count()
    assert deg >= 3


def test_empty_normalization_names_never_link(spark):
    """Names outside [a-z0-9 ] normalize to '' and carry no evidence —
    distinct non-ASCII entities must NOT merge (each gets a unique
    sentinel signature, not a shared padded shingle)."""
    from neo4j_document_pipeline_spark.operators.linking import link_entities
    rows = [(f"e{i}", "Stakeholder", name) for i, name in
            enumerate(["北京公司", "上海集团", "Ωμέγα", "!!!", "مؤسسة"])]
    nodes = spark.createDataFrame(rows, "entity_id string, label string, name string")
    assert link_entities(nodes).count() == 0


def test_tfidf_linking_matches_exact_kernel(spark):
    """link_entities(score='tfidf') — the north-star-literal TF-IDF
    cosine scorer behind LSH blocking — must agree with the exhaustive
    shared-shingle kernel on every pair it emits (same scores), find the
    same high-similarity pairs on clean data, and respect label scoping."""
    from neo4j_document_pipeline_spark.operators.linking import (
        link_entities, tfidf_cosine_links_exact)
    rows = [("e1", "Entity", "Phase Two"), ("e2", "Entity", "phase-2"),
            ("e3", "Entity", "Phase Three"), ("e4", "Goal", "Phase Two"),
            ("e5", "Entity", "Digital Transformation Strategy"),
            ("e6", "Entity", "digital transformation strategy!"),
            ("e7", "Entity", "Completely Unrelated"), ("e8", "Entity", "???")]
    df = spark.createDataFrame(rows,
                               "entity_id string, label string, name string")
    lsh = {(r["id1"], r["id2"]): round(r["sim"], 6) for r in
           link_entities(df, jaccard_threshold=0.9, score="tfidf").collect()}
    exact = {(r["id1"], r["id2"]): round(r["sim"], 6) for r in
             tfidf_cosine_links_exact(df, "entity_id", "name", 0.9,
                                      label_col="label").collect()}
    assert lsh == exact  # identical normalized names block together
    assert lsh[("e1", "e2")] == 1.0 and lsh[("e5", "e6")] == 1.0
    assert ("e1", "e4") not in lsh  # cross-label never linked
    assert not any("e7" in k or "e8" in k for k in lsh)


class TestIncrementalComponents:
    """incremental_components == full recompute over base ∪ delta."""

    def _cc(self, spark, pairs):
        df = spark.createDataFrame(pairs, "u string, v string")
        return connected_components(df)

    def _inc(self, spark, labels, delta, **kw):
        from neo4j_document_pipeline_spark.operators.components import (
            incremental_components)
        d = spark.createDataFrame(delta, "u string, v string")
        return incremental_components(labels, d, **kw)

    def _as_dict(self, df):
        return {r["id"]: r["component"] for r in df.collect()}

    def test_parity_with_full_recompute_random(self, spark):
        import random
        rng = random.Random(42)
        nodes = [f"n{i:03d}" for i in range(40)]
        edges = [(rng.choice(nodes), rng.choice(nodes)) for _ in range(60)]
        edges = [(u, v) for u, v in edges if u != v]
        for cut in (10, 30, 50):
            base, delta = edges[:cut], edges[cut:]
            if not base or not delta:
                continue
            labels = self._cc(spark, base)
            got = self._as_dict(self._inc(spark, labels, delta))
            want = self._as_dict(self._cc(spark, base + delta))
            assert got == want, f"cut={cut}"

    def test_bridge_merges_two_committed_clusters(self, spark):
        labels = self._cc(spark, [("a", "b"), ("x", "y")])
        got = self._as_dict(self._inc(spark, labels, [("b", "x")]))
        assert got == {"a": "a", "b": "a", "x": "a", "y": "a"}

    def test_new_node_with_smaller_id_becomes_rep(self, spark):
        labels = self._cc(spark, [("m", "n")])
        got = self._as_dict(self._inc(spark, labels, [("a", "n")]))
        assert got == {"a": "a", "m": "a", "n": "a"}

    def test_noop_delta_changes_nothing(self, spark):
        labels = self._cc(spark, [("a", "b"), ("b", "c")])
        # internal edge + self-loop: quotient is empty
        out = self._inc(spark, labels, [("a", "c"), ("b", "b")],
                        changed_only=True)
        assert out.count() == 0
        full = self._as_dict(self._inc(spark, labels, [("a", "c")]))
        assert full == self._as_dict(labels)

    def test_changed_only_is_exactly_the_merge_set(self, spark):
        labels = self._cc(spark, [("a", "b"), ("x", "y"), ("p", "q")])
        out = self._as_dict(self._inc(spark, labels, [("y", "z")],
                                      changed_only=True))
        # x,y keep component x (unchanged); z is new
        assert out == {"z": "x"}

    def test_labels_table_is_never_shuffled(self, spark):
        # the committed assignment must stream through broadcast joins
        # only — an Exchange over labels is the O(corpus) recompute this
        # operator exists to avoid
        from neo4j_document_pipeline_spark.operators.components import (
            incremental_components)
        labels = self._cc(spark, [("a", "b"), ("x", "y")]) \
            .localCheckpoint()  # sever the base-CC plan; labels is "committed"
        d = spark.createDataFrame([("b", "x")], "u string, v string")
        plan = incremental_components(labels, d) \
            ._jdf.queryExecution().executedPlan().toString()
        assert "BroadcastNestedLoopJoin" not in plan
        assert "CartesianProduct" not in plan
        import re
        # every join the big side participates in is broadcast-built
        assert "SortMergeJoin" not in plan and "ShuffledHashJoin" not in plan
