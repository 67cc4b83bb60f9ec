"""Fixed-round exact-arithmetic PCA power iteration."""

import math
import random

import pytest


def brute_pca_project(vecs, rounds=3, scale=10_000, vscale=10_000):
    """Pure-python replay of the EXACT algorithm (ints + the same
    double renormalization) — must match the operator bit-for-bit."""
    q = {i: [math.floor(x * scale + 0.5) for x in v]
         for i, v in vecs.items()}
    n = len(q)
    dim = len(next(iter(q.values())))
    S = [sum(qv[d] for qv in q.values()) for d in range(dim)]
    y = {i: [n * qv[d] - S[d] for d in range(dim)]
         for i, qv in q.items()}
    v = [1] * dim
    for _ in range(rounds):
        t = {i: sum(yd * vd for yd, vd in zip(yi, v))
             for i, yi in y.items()}
        w = [sum(y[i][d] * t[i] for i in y) for d in range(dim)]
        m = max(abs(x) for x in w)
        if m == 0:
            v = [0] * dim
            continue
        first_max = next(x for x in w if abs(x) == m)
        sgn = -1.0 if first_max < 0 else 1.0
        v = [math.floor(float(x) * sgn / float(m) * vscale + 0.5)
             for x in w]
    return {i: sum(yd * vd for yd, vd in zip(yi, v))
            for i, yi in y.items()}


def _run(spark, vecs, **kw):
    from neo4j_document_pipeline_spark.operators.clustering import (
        pca_project)
    df = spark.createDataFrame(
        [(i, v) for i, v in vecs.items()], ["vid", "emb"])
    return {r["vid"]: r["proj"]
            for r in pca_project(df, "vid", "emb", **kw).collect()}


class TestPcaProject:
    def test_bit_exact_brute_parity(self, spark):
        rng = random.Random(5)
        vecs = {i: [rng.uniform(-1, 1) for _ in range(6)]
                for i in range(40)}
        got = _run(spark, vecs)
        brute = brute_pca_project(vecs)
        assert got == brute  # EXACT integer equality, not approx

    def test_direction_matches_numpy_top_component(self, spark):
        import numpy as np
        rng = np.random.RandomState(7)
        # strong first component: x along u with noise
        u = rng.randn(8)
        u /= np.linalg.norm(u)
        data = {i: (rng.randn() * 5.0 * u + rng.randn(8) * 0.3).tolist()
                for i in range(60)}
        got = _run(spark, data, rounds=5)
        x = np.array([data[i] for i in range(60)])
        xc = x - x.mean(axis=0)
        _, _, vt = np.linalg.svd(xc, full_matrices=False)
        ref = xc @ vt[0]
        mine = np.array([got[i] for i in range(60)], dtype=float)
        corr = abs(np.corrcoef(mine, ref)[0, 1])
        assert corr > 0.999, corr

    def test_partitioning_invariance(self, spark):
        rng = random.Random(9)
        vecs = {i: [rng.uniform(-1, 1) for _ in range(4)]
                for i in range(30)}
        from neo4j_document_pipeline_spark.operators.clustering import (
            pca_project)
        df = spark.createDataFrame(
            [(i, v) for i, v in vecs.items()], ["vid", "emb"])
        a = {r["vid"]: r["proj"]
             for r in pca_project(df.repartition(1), "vid", "emb").collect()}
        b = {r["vid"]: r["proj"]
             for r in pca_project(df.repartition(7), "vid", "emb").collect()}
        assert a == b

    def test_degenerate_identical_vectors(self, spark):
        vecs = {i: [0.5, -0.25, 0.125] for i in range(5)}
        got = _run(spark, vecs)
        assert all(p == 0 for p in got.values())

    def test_validation(self, spark):
        from neo4j_document_pipeline_spark.operators.clustering import (
            pca_project)
        df = spark.createDataFrame([(1, [0.1, 0.2])], ["vid", "emb"])
        with pytest.raises(ValueError, match="rounds"):
            pca_project(df, "vid", "emb", rounds=0)
