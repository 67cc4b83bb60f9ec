"""Scale-property tests: CC convergence on big graphs, partition pruning,
LSH block-size caps, Zipf skew presence in the generator."""

import pytest
from pyspark.sql import functions as F

from neo4j_document_pipeline_spark.operators.components import connected_components
from neo4j_document_pipeline_spark.sources.pages import synth_pages


def test_cc_converges_on_large_random_graph(spark):
    """50k-edge preferential-attachment-ish graph: union-find ground truth
    vs the distributed large/small-star result."""
    n_edges = 50_000
    edges = (
        spark.range(n_edges)
        .select(
            F.concat(F.lit("n"), F.lpad((F.pmod(F.hash(F.col("id")), 20_000)).cast("string"), 8, "0")).alias("u"),
            F.concat(F.lit("n"), F.lpad((F.pmod(F.hash(F.col("id") * 7 + 3), 20_000)).cast("string"), 8, "0")).alias("v"),
        )
        .filter(F.col("u") != F.col("v"))
        .cache()
    )
    pairs = [(r["u"], r["v"]) for r in edges.collect()]

    parent = {}
    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x
    def union(a, b):
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    for u, v in pairs:
        union(u, v)
    # union() always reparents the larger root under the smaller, so
    # find() roots ARE the component minimum ids — no normalization needed
    truth_min = {node: find(node) for node in parent}

    got = {r["id"]: r["component"] for r in connected_components(edges).collect()}
    assert got == truth_min


def test_triples_store_partition_pruning(spark, tmp_path):
    """triples_raw is written partitioned by object_kind — a kind filter
    must prune partitions at scan time."""
    from neo4j_document_pipeline_spark.plans.pipeline import run_pipeline
    from neo4j_document_pipeline_spark.sources.store import GraphStore
    root = str(tmp_path / "kg")
    run_pipeline(spark, synth_pages(spark, 40), root)
    store = GraphStore(root, spark)
    df = store.read("triples_raw").filter(F.col("object_kind") == "timeline")
    import io
    from contextlib import redirect_stdout
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    plan = buf.getvalue()
    assert "PartitionFilters" in plan
    assert "object_kind" in plan.split("PartitionFilters", 1)[1][:200]


def test_lsh_oversized_blocks_dropped(spark):
    """A degenerate block (hundreds of identical names) must not explode
    into quadratic pairs — the block cap drops it."""
    from neo4j_document_pipeline_spark.operators.linking import (
        candidate_pairs, lsh_blocks, minhash_signatures)
    rows = [(f"id{i:04d}", "Entity", "Same Name") for i in range(500)]
    rows += [(f"ok{i}", "Entity", f"Unique {i} Name") for i in range(5)]
    df = spark.createDataFrame(rows, "entity_id string, label string, name string")
    sigs = minhash_signatures(df, "name")
    blocks = lsh_blocks(sigs, extra_key="label")
    pairs = candidate_pairs(blocks, "entity_id", max_block_size=64,
                            block_cols=("band", "bh", "label"))
    # 500 identical names -> 124,750 raw pairs; the cap keeps it at zero
    assert pairs.count() < 1000


def test_generator_domains_are_zipf_skewed(spark):
    pages = synth_pages(spark, 3000)
    host = F.element_at(F.split("url", "/"), 3)
    counts = [r["count"] for r in
              pages.groupBy(host.alias("h")).count().orderBy(F.col("count").desc()).collect()]
    # head domain holds far more than the uniform share
    assert counts[0] > 3 * (3000 / 100)
