"""Deterministic k-means + SemDeDup (operators/clustering.py)."""

import hashlib
import math

import pytest
from pyspark.sql import functions as F

from neo4j_document_pipeline_spark.operators.clustering import (
    kmeans_assign,
    quantize_embeddings,
    semantic_dedup,
)

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def embs(spark):
    return spark.read.parquet(f"{SF}/embeddings.parquet") \
        .filter(F.col("vec_id") < 120).cache()


def _brute_kmeans(rows, k, iters, scale=10_000):
    """The spec in plain python: hash-seeded init, exact-int state,
    left-fold double metric, ties to the smallest cid."""
    qv = {i: [math.floor(x * float(scale) + 0.5) for x in v]
          for i, v in rows}
    order = sorted(qv, key=lambda i: (
        hashlib.sha256(f"km:{i}".encode()).hexdigest(), i))
    cents = {cid: (list(qv[i]), 1) for cid, i in enumerate(order[:k])}

    def metric(q, S, n):
        acc = 0.0
        for d in range(len(q)):
            dd = float(n * q[d] - S[d])
            acc = acc + dd * dd
        return acc / (float(n) * float(n))

    assign = None
    for it in range(iters):
        assign = {}
        for i, q in qv.items():
            assign[i] = min((metric(q, S, n), cid)
                            for cid, (S, n) in cents.items())
        if it < iters - 1:
            cents = {}
            for i, (m, cid) in assign.items():
                S, n = cents.get(cid, ([0] * len(qv[i]), 0))
                cents[cid] = ([a + b for a, b in zip(S, qv[i])], n + 1)
    return {i: (cid, m) for i, (m, cid) in assign.items()}


def test_kmeans_brute_parity(spark, embs):
    rows = [(r["vec_id"], list(r["embedding"]))
            for r in embs.select("vec_id", "embedding").collect()]
    expect = _brute_kmeans(rows, k=4, iters=2)
    got = {r["vec_id"]: (r["cluster_id"], r["metric"])
           for r in kmeans_assign(embs, "vec_id", "embedding",
                                  k=4, iters=2).collect()}
    assert got.keys() == expect.keys()
    for i in got:
        assert got[i][0] == expect[i][0], i
        # python float arithmetic IS IEEE double with the same fold
        # order -> the metric must match bit-for-bit, not approximately
        assert got[i][1] == expect[i][1], i


def test_kmeans_partitioning_invariance(spark, embs):
    a = sorted(map(tuple, kmeans_assign(
        embs.repartition(13), "vec_id", "embedding", k=5, iters=2)
        .collect()))
    b = sorted(map(tuple, kmeans_assign(
        embs.repartition(2), "vec_id", "embedding", k=5, iters=2)
        .collect()))
    assert a == b


def test_kmeans_covers_every_row_once(spark, embs):
    out = kmeans_assign(embs, "vec_id", "embedding", k=8, iters=2)
    n = embs.count()
    assert out.count() == n
    assert out.select("vec_id").distinct().count() == n
    assert out.filter(F.col("cluster_id") >= 8).count() == 0


def test_kmeans_validation(spark, embs):
    with pytest.raises(ValueError, match="k must be"):
        kmeans_assign(embs, "vec_id", "embedding", k=0)
    with pytest.raises(ValueError, match="iters"):
        kmeans_assign(embs, "vec_id", "embedding", iters=0)
    with pytest.raises(ValueError, match="scale"):
        quantize_embeddings(embs, "vec_id", "embedding", scale=0)
    allnull = spark.createDataFrame(
        [(1, None)], "vec_id long, embedding array<float>")
    with pytest.raises(ValueError, match="dim"):
        kmeans_assign(allnull, "vec_id", "embedding")


def test_semantic_dedup_planted_duplicates(spark):
    """An exact duplicate pair plus a transitive chain a~b, b~c (a and c
    farther apart than the threshold) must collapse to ONE survivor per
    group, min id kept."""
    base = [0.1 * ((i * 7) % 13 - 6) for i in range(16)]
    # a DIFFERENT direction for the b-chain (an eps-jitter of `base`
    # itself would be an exact/near dup of a1 and merge the groups)
    base2 = [0.1 * ((i * 5) % 11 - 5) for i in range(16)]

    def jitter(eps):
        return [x + eps for x in base2]

    rows = [
        ("a1", base), ("a2", list(base)),            # exact dup pair
        ("b1", jitter(0.0)), ("b2", jitter(0.012)),  # chain: b1~b2
        ("b3", jitter(0.024)),                       # b2~b3 (b1!~b3 maybe)
        ("z9", [float((-1) ** i) for i in range(16)]),  # unrelated
    ]
    df = spark.createDataFrame(rows, "vid string, embedding array<float>")
    out = {r["vid"]: r for r in semantic_dedup(
        df, "vid", "embedding", k=2, iters=2, threshold=0.995).collect()}
    assert out["a1"]["is_kept"] and not out["a2"]["is_kept"]
    assert out["a2"]["keep_id"] == "a1"
    # the b-chain is one connected group regardless of pair sparsity
    groups = {v["keep_id"] for k, v in out.items() if k.startswith("b")}
    assert groups == {"b1"}
    assert "z9" not in out  # never paired -> implicitly kept


def test_semantic_dedup_transitive_only_chain(spark):
    """b1~b2 and b2~b3 pair, b1~b3 does NOT (cosine below threshold) —
    the group must still collapse to b1 (connected components, not
    pairwise-greedy)."""
    import numpy as np
    rng = np.random.RandomState(5)
    v = rng.normal(size=16)
    v /= np.linalg.norm(v)
    w = rng.normal(size=16)
    w -= (w @ v) * v
    w /= np.linalg.norm(w)

    def mix(theta):
        return (math.cos(theta) * v + math.sin(theta) * w).tolist()

    # cos(b1,b2)=cos(b2,b3)=cos(0.2)≈0.980 >= th; cos(b1,b3)=cos(0.4)≈0.921 < th
    rows = [("b1", mix(0.0)), ("b2", mix(0.2)), ("b3", mix(0.4))]
    df = spark.createDataFrame(rows, "vid string, embedding array<float>")
    pairs_th = 0.95
    out = {r["vid"]: r for r in semantic_dedup(
        df, "vid", "embedding", k=1, iters=1, threshold=pairs_th).collect()}
    assert set(out) == {"b1", "b2", "b3"}
    assert out["b1"]["is_kept"]
    assert not out["b2"]["is_kept"] and not out["b3"]["is_kept"]
    assert out["b3"]["keep_id"] == "b1"


def test_cli_semdedup_runs_and_is_deterministic(spark, tmp_path, capsys):
    """semdedup over a committed store's node embeddings: valid JSON
    with the summary contract, and byte-identical across reruns (the
    whole pass is a pure function of the data)."""
    import json

    from neo4j_document_pipeline_spark.__main__ import main
    from neo4j_document_pipeline_spark.plans.pipeline import run_pipeline
    from neo4j_document_pipeline_spark.sources.pages import synth_pages
    root = str(tmp_path / "kg")
    run_pipeline(spark, synth_pages(spark, 12), root)

    main(["semdedup", "--store", root, "--clusters", "4",
          "--sem-threshold", "0.9"])
    out1 = capsys.readouterr().out
    rep = json.loads(out1)
    assert rep["clusters_k"] == 4 and rep["threshold"] == 0.9
    assert {"docs_in_clusters", "clusters", "removable"} <= \
        set(rep["summary"])
    assert rep["summary"]["docs_in_clusters"] >= rep["summary"]["removable"]
    main(["semdedup", "--store", root, "--clusters", "4",
          "--sem-threshold", "0.9"])
    assert capsys.readouterr().out == out1
