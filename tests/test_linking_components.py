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
