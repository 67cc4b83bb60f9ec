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


def test_mmr_driver_side_ceiling():
    """mmr_select at the adversarial fan-out ceiling — n = 2*k_vec = 2000
    candidates with k_vec = max(12, top_k) at top_k = 1000 (main.py:270) —
    must stay a sub-second driver-side step (O(n*k*dim) incremental
    max-sim), and at moderate size must match a literal transcription of
    the reference's O(n*k^2*dim) recompute exactly."""
    import random
    import time

    from neo4j_document_pipeline_spark.functions.featurizer import cosine
    from neo4j_document_pipeline_spark.operators.retrieval import mmr_select

    def mk(n, dim, seed):
        rng = random.Random(seed)
        out = []
        for i in range(n):
            emb = None if i % 17 == 0 else \
                [rng.uniform(-1, 1) for _ in range(dim)]
            out.append({"entity_id": str(i), "score": rng.random(),
                        "embedding": emb})
        return out

    # exact parity vs the reference transcription (incl. None embeddings)
    cands = mk(200, 32, seed=3)

    def ref_mmr(candidates, k, lam=0.7):
        embs = [c["embedding"] for c in candidates]
        sel, rest = [], list(range(len(candidates)))
        b0 = max(rest, key=lambda i: candidates[i]["score"])
        sel.append(b0); rest.remove(b0)

        def msim(j):
            if embs[j] is None:
                return 0.0
            sims = [cosine(embs[j], embs[i]) if embs[i] is not None else 0.0
                    for i in sel]
            return max(sims) if sims else 0.0

        while len(sel) < min(k, len(candidates)) and rest:
            bj, bv = None, -1e9
            for j in rest:
                v = lam * candidates[j]["score"] - (1 - lam) * msim(j)
                if v > bv:
                    bv, bj = v, j
            sel.append(bj); rest.remove(bj)
        return [candidates[i]["entity_id"] for i in sel]

    got = [c["entity_id"] for c in mmr_select(cands, 80)]
    assert got == ref_mmr(cands, 80)

    # ceiling: 2000 candidates, k=1000, dim=64 — bounded driver time
    big = mk(2000, 64, seed=9)
    t0 = time.perf_counter()
    sel = mmr_select(big, 1000)
    el = time.perf_counter() - t0
    assert len(sel) == 1000
    assert len({c["entity_id"] for c in sel}) == 1000
    assert el < 5.0, f"mmr at ceiling took {el:.1f}s"


# ---------------------------------------------------------------------------
# higher-order-function let-binding (col_let): n-gram operators must not
# re-tokenize per element
# ---------------------------------------------------------------------------

def test_ngram_lambdas_do_not_retokenize_per_element(spark):
    """Spark HOF lambdas are interpreted with no CSE: a lambda that
    captures the tokenizer subtree re-runs it per element — O(tokens²)
    regex work per row (measured 104s vs 3s on 20 docs × 1500 tokens).
    Every n-gram operator binds tokens via col_let; this test pins the
    fix two ways:
      (1) structurally — in the optimized plans, no slice()/substring()
          positional window consumes a freshly-built token/string
          expression (its first argument must be a lambda variable);
      (2) wall-clock — long docs complete in seconds, not minutes."""
    import re
    import time

    from pyspark.sql import functions as F

    from neo4j_document_pipeline_spark.functions.textstats import (
        col_dup_ngram_fraction, col_rolling_fingerprints, col_top_ngram)
    from neo4j_document_pipeline_spark.operators.corpus import (
        ngram_diversity, winnow_fingerprints)
    from neo4j_document_pipeline_spark.operators.dedup import (
        jaccard_decontam_flags, ngram_overlap_flags)

    rows = [(i, " ".join(
        ["alpha,", "beta.", "(gamma)", "the", "of", "and"][(i + j) % 6]
        + str(j % 11) for j in range(2000))) for i in range(8)]
    df = spark.createDataFrame(rows, "id long, text string")
    bench = spark.createDataFrame(rows[:1], "id long, text string")

    frames = {
        "overlap": ngram_overlap_flags(df, bench, "id", "text", n=13),
        "jaccard_decontam": jaccard_decontam_flags(
            df, bench, "id", "text", shingle_words=3, threshold=0.5),
        "diversity": ngram_diversity(
            df.withColumn("g", F.lit("x")), "g", "text"),
        "winnow": winnow_fingerprints(df, "id", "text"),
        "textstats": df.select(
            col_dup_ngram_fraction(F.col("text")).alias("a"),
            col_top_ngram(F.col("text")).alias("b"),
            col_rolling_fingerprints(F.col("text")).alias("c")),
    }
    # (1) structural: a slice/substring window over a non-variable
    # first argument is the re-tokenize-per-element shape
    bad = re.compile(r"(?:slice|substring)\((?:filter|transform|split|"
                     r"array_join|concat|regexp_replace)\(")
    for name, f in frames.items():
        plan = f._jdf.queryExecution().optimizedPlan().toString()
        assert not bad.search(plan), f"{name}: tokenizer inside window"
    # (2) wall-clock: the quadratic shape needs >100s for ANY one of
    # these on this input; all five together finish in seconds
    t0 = time.perf_counter()
    for f in frames.values():
        f.count()
    el = time.perf_counter() - t0
    assert el < 90.0, f"long-doc n-gram pass took {el:.1f}s"
