"""negative_triples — hash parity, filtering, guard, determinism."""

import hashlib

import pytest


def _draw_idx(salt, s, p, o, j, n):
    h = hashlib.sha256(f"{salt}:{s}|{p}|{o}|{j}".encode()).hexdigest()
    return int(h[:8], 16) % n


class TestNegativeTriples:
    def _pool(self, spark, ents):
        return spark.createDataFrame(
            [(i, e) for i, e in enumerate(ents)], ["idx", "entity"])

    def test_hash_parity_and_filters(self, spark):
        from neo4j_document_pipeline_spark.operators.kgtrain import (
            negative_triples)
        ents = [f"e{i}" for i in range(7)]
        trips = [("s1", "r", "e0"), ("s1", "r", "e1"), ("s2", "r", "e3")]
        t = spark.createDataFrame(trips, ["subject", "predicate", "object"])
        out = negative_triples(t, self._pool(spark, ents), pool_size=7,
                               n_neg=2, attempts=6).collect()
        got = sorted((r["subject"], r["predicate"], r["neg_object"],
                      r["attempt"]) for r in out)
        true = set(trips)
        want = []
        for s, p, o in trips:
            survivors = []
            for j in range(6):
                cand = ents[_draw_idx("v1", s, p, o, j, 7)]
                if cand != o and (s, p, cand) not in true:
                    survivors.append((s, p, cand, j))
            want += survivors[:2]
        assert got == sorted(want)
        # no emitted negative is a true fact or a self-replacement
        for s, p, neg, _ in got:
            assert (s, p, neg) not in true

    def test_partitioning_invariance(self, spark):
        from neo4j_document_pipeline_spark.operators.kgtrain import (
            negative_triples)
        ents = [f"e{i}" for i in range(11)]
        trips = [(f"s{i}", "r", ents[i % 11]) for i in range(50)]
        t = spark.createDataFrame(trips, ["subject", "predicate", "object"])
        run = lambda d: sorted(map(tuple, negative_triples(
            d, self._pool(spark, ents), pool_size=11, n_neg=3).collect()))
        assert run(t.repartition(16)) == run(t.coalesce(1))

    def test_hole_in_pool_raises(self, spark):
        from neo4j_document_pipeline_spark.operators.kgtrain import (
            negative_triples)
        pool = spark.createDataFrame(
            [(0, "e0"), (2, "e2")], ["idx", "entity"])  # hole at 1
        t = spark.createDataFrame(
            [(f"s{i}", "r", "e0") for i in range(20)],
            ["subject", "predicate", "object"])
        with pytest.raises(Exception, match="densely"):
            negative_triples(t, pool, pool_size=3, n_neg=1).collect()

    def test_validation(self, spark):
        from neo4j_document_pipeline_spark.operators.kgtrain import (
            negative_triples)
        t = spark.createDataFrame([("s", "r", "o")],
                                  ["subject", "predicate", "object"])
        pool = self._pool(spark, ["a", "b"])
        with pytest.raises(ValueError):
            negative_triples(t, pool, pool_size=2, n_neg=0)
        with pytest.raises(ValueError):
            negative_triples(t, pool, pool_size=1)
        with pytest.raises(ValueError):
            negative_triples(t, pool, pool_size=2, n_neg=3, attempts=2)
