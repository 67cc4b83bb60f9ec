"""feature_propagation — brute parity, isolated nodes, invariance."""

import pytest


def _brute(edges, feats, rounds):
    nbrs = {}
    seen = set()
    for u, v in edges:
        a, b = (u, v) if u < v else (v, u)
        if a == b or (a, b) in seen:
            continue
        seen.add((a, b))
        nbrs.setdefault(a, []).append(b)
        nbrs.setdefault(b, []).append(a)
    f = dict(feats)
    for _ in range(rounds):
        f = {x: (fx + sum(f[y] for y in nbrs.get(x, [])))
             // (1 + len(nbrs.get(x, [])))
             for x, fx in f.items()}
    return f


class TestFeaturePropagation:
    def test_brute_parity_with_dups_and_isolates(self, spark):
        from neo4j_document_pipeline_spark.operators.graphalgo import (
            feature_propagation)
        edges = [("a", "b"), ("b", "a"), ("b", "c"), ("c", "d"),
                 ("a", "b"), ("d", "a"), ("e", "e")]
        feats = [("a", 100), ("b", 40), ("c", 7), ("d", 1000),
                 ("e", 55), ("iso", 13)]
        e = spark.createDataFrame(edges, ["u", "v"])
        fdf = spark.createDataFrame(feats, ["id", "f"])
        for rounds in (1, 2, 3):
            got = {r["id"]: r["f"] for r in feature_propagation(
                e, fdf, rounds=rounds).collect()}
            assert got == _brute(edges, feats, rounds), rounds

    def test_isolated_and_selfloop_keep_value(self, spark):
        from neo4j_document_pipeline_spark.operators.graphalgo import (
            feature_propagation)
        e = spark.createDataFrame([("x", "x")], ["u", "v"])
        fdf = spark.createDataFrame([("x", 9), ("y", 4)], ["id", "f"])
        got = {r["id"]: r["f"]
               for r in feature_propagation(e, fdf, rounds=3).collect()}
        assert got == {"x": 9, "y": 4}

    def test_partitioning_invariance(self, spark):
        import random
        from neo4j_document_pipeline_spark.operators.graphalgo import (
            feature_propagation)
        rng = random.Random(3)
        edges = [(f"n{rng.randrange(40)}", f"n{rng.randrange(40)}")
                 for _ in range(120)]
        feats = [(f"n{i}", rng.randrange(10**6)) for i in range(40)]
        e = spark.createDataFrame(edges, ["u", "v"])
        fdf = spark.createDataFrame(feats, ["id", "f"])
        a = sorted((r["id"], r["f"]) for r in feature_propagation(
            e.repartition(17), fdf.repartition(5), rounds=2).collect())
        b = sorted((r["id"], r["f"]) for r in feature_propagation(
            e.coalesce(1), fdf.coalesce(1), rounds=2).collect())
        assert a == b == sorted(_brute(edges, feats, 2).items())

    def test_validation(self, spark):
        from neo4j_document_pipeline_spark.operators.graphalgo import (
            feature_propagation)
        e = spark.createDataFrame([("a", "b")], ["u", "v"])
        fdf = spark.createDataFrame([("a", 1)], ["id", "f"])
        with pytest.raises(ValueError):
            feature_propagation(e, fdf, rounds=0)
