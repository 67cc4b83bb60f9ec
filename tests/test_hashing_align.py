"""Feature hashing (operators/features.py::hashed_tf) and mutual-
nearest-neighbor alignment (operators/similarity.py::
reciprocal_best_match): hash-arithmetic parity, dense assembly,
mutuality semantics, candidate-blocking equivalence."""

import hashlib

import pytest
from pyspark.sql import functions as F

from neo4j_document_pipeline_spark.operators.features import (
    hashed_tf,
    hashed_tf_dense,
)
from neo4j_document_pipeline_spark.operators.similarity import (
    reciprocal_best_match,
)


def _bucket_sign(term, dim, salt="ht"):
    h = hashlib.sha256(f"{salt}:{term}".encode()).hexdigest()
    return int(h[:8], 16) % dim, 1 - 2 * (int(h[8], 16) % 2)


class TestHashedTF:
    def test_matches_python_hash_arithmetic(self, spark):
        docs = spark.createDataFrame(
            [("d1", "alpha beta alpha Gamma!"), ("d2", "beta beta")],
            "doc_id string, text string")
        got = {(r["doc_id"], r["bucket"]): r["weight"]
               for r in hashed_tf(docs, "doc_id", "text",
                                  dim=32).collect()}
        want = {}
        for did, toks in [("d1", ["alpha", "beta", "alpha", "gamma"]),
                          ("d2", ["beta", "beta"])]:
            for t in toks:
                b, s = _bucket_sign(t, 32)
                want[(did, b)] = want.get((did, b), 0) + s
        want = {k: v for k, v in want.items() if v != 0}
        assert got == want

    def test_unsigned_counts(self, spark):
        docs = spark.createDataFrame([("d1", "x x y")],
                                     "doc_id string, text string")
        rows = hashed_tf(docs, "doc_id", "text", dim=8,
                         signed=False).collect()
        assert sum(r["weight"] for r in rows) == 3
        assert all(r["weight"] > 0 for r in rows)

    def test_dense_assembly_and_partition_invariance(self, spark):
        docs = spark.createDataFrame(
            [(f"d{i}", f"tok{i % 7} tok{i % 3} common word{i}")
             for i in range(20)], "doc_id string, text string")
        sp = hashed_tf(docs, "doc_id", "text", dim=16)
        dense = {r["doc_id"]: r["features"]
                 for r in hashed_tf_dense(sp, "doc_id",
                                          dim=16).collect()}
        sparse = {}
        for r in sp.collect():
            sparse.setdefault(r["doc_id"], {})[r["bucket"]] = r["weight"]
        for did, vec in dense.items():
            assert len(vec) == 16
            for b, v in enumerate(vec):
                assert v == float(sparse[did].get(b, 0))
        # pure function of the data: identical after a repartition
        a = sorted(map(tuple, sp.collect()))
        b = sorted(map(tuple, hashed_tf(docs.repartition(13), "doc_id",
                                        "text", dim=16).collect()))
        assert a == b

    def test_validation(self, spark):
        docs = spark.createDataFrame([("d1", "x")],
                                     "doc_id string, text string")
        with pytest.raises(ValueError, match="dim"):
            hashed_tf(docs, "doc_id", "text", dim=0)


def _vecs(spark, rows, idn, vn):
    return spark.createDataFrame(rows, f"{idn} string, {vn} array<double>")


class TestReciprocalBestMatch:
    def test_mutual_pairs_only(self, spark):
        # l1<->r1 mutual; l2's best is r1 but r1 prefers l1 -> dropped
        left = _vecs(spark, [("l1", [1.0, 0.0]),
                             ("l2", [0.9, 0.1]),
                             ("l3", [0.0, 1.0])], "lid", "lv")
        right = _vecs(spark, [("r1", [1.0, 0.05]),
                              ("r2", [0.1, 1.0])], "rid", "rv")
        got = {(r["lid"], r["rid"]) for r in
               reciprocal_best_match(left, right).collect()}
        assert got == {("l1", "r1"), ("l3", "r2")}

    def test_min_score_drops_mutual_noise(self, spark):
        left = _vecs(spark, [("l1", [1.0, 0.0])], "lid", "lv")
        right = _vecs(spark, [("r1", [0.0, 1.0])], "rid", "rv")
        assert reciprocal_best_match(left, right).count() == 1
        assert reciprocal_best_match(left, right,
                                     min_score=0.5).count() == 0

    def test_tie_breaks_deterministic(self, spark):
        left = _vecs(spark, [("l1", [1.0, 0.0])], "lid", "lv")
        right = _vecs(spark, [("r2", [2.0, 0.0]),
                              ("r1", [3.0, 0.0])], "rid", "rv")
        # equal cosine 1.0 -> smallest rid wins
        got = reciprocal_best_match(left, right).collect()
        assert [(r["lid"], r["rid"]) for r in got] == [("l1", "r1")]

    def test_candidates_blocking_restricts_scoring(self, spark):
        left = _vecs(spark, [("l1", [1.0, 0.0]), ("l2", [0.0, 1.0])],
                     "lid", "lv")
        right = _vecs(spark, [("r1", [1.0, 0.0]), ("r2", [0.0, 1.0])],
                      "rid", "rv")
        # full: l1-r1 and l2-r2. Candidates forbid l1-r1.
        cand = spark.createDataFrame(
            [("l1", "r2"), ("l2", "r2")], "lid string, rid string")
        got = {(r["lid"], r["rid"]) for r in
               reciprocal_best_match(left, right,
                                     candidates=cand).collect()}
        # within the candidate set, r2's best is l2 (cos 1.0) and l2's
        # best is r2 -> mutual; l1's only candidate r2 prefers l2
        assert got == {("l2", "r2")}

    def test_brute_parity_random(self, spark):
        import random
        rng = random.Random(3)
        L = [(f"l{i}", [rng.uniform(-1, 1) for _ in range(8)])
             for i in range(25)]
        R = [(f"r{i}", [rng.uniform(-1, 1) for _ in range(30)][:8])
             for i in range(20)]
        got = {(r["lid"], r["rid"]) for r in reciprocal_best_match(
            _vecs(spark, L, "lid", "lv"),
            _vecs(spark, R, "rid", "rv")).collect()}

        def cos(a, b):
            dot = sum(x * y for x, y in zip(a, b))
            na = sum(x * x for x in a) ** 0.5
            nb = sum(x * x for x in b) ** 0.5
            return round(dot / (na * nb), 4) if na and nb else 0.0
        bl = {lid: min(((-cos(lv, rv), rid) for rid, rv in R))[1]
              for lid, lv in L}
        br = {rid: min(((-cos(lv, rv), lid) for lid, lv in L))[1]
              for rid, rv in R}
        want = {(lid, rid) for lid, rid in bl.items()
                if br[rid] == lid}
        assert got == want
