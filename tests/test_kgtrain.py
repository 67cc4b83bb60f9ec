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


class TestSampleNeighborhoods:
    def _run(self, spark, edges, seeds, fanouts, **kw):
        from neo4j_document_pipeline_spark.operators.kgtrain import (
            sample_neighborhoods)
        e = spark.createDataFrame(edges, "src string, dst string")
        s = spark.createDataFrame([(x,) for x in seeds], "id string")
        return sample_neighborhoods(e, s, fanouts, **kw)

    @staticmethod
    def _brute(edges, seeds, fanouts, directed=False, salt="v1"):
        import hashlib
        adj = {}
        pairs = set()
        for u, v in edges:
            if u == v:
                continue
            pairs.add((u, v))
            if not directed:
                pairs.add((v, u))
        for u, v in pairs:
            adj.setdefault(u, set()).add(v)

        def u01(key):
            h = hashlib.sha256(key.encode()).hexdigest()
            return int(h[:8], 16) / float(1 << 32)

        out = set()
        frontier = {r: {r} for r in set(seeds)}
        for hop, f in enumerate(fanouts, start=1):
            nxt = {r: set() for r in frontier}
            for r, nodes in frontier.items():
                for src in nodes:
                    nbrs = sorted(
                        adj.get(src, ()),
                        key=lambda d: (u01(f"{salt}:{hop}:{r}:{src}:{d}"),
                                       d))
                    for d in nbrs[:f]:
                        out.add((r, hop, src, d))
                        nxt[r].add(d)
            frontier = nxt
        return out

    def test_brute_parity_random_two_hops(self, spark):
        import random
        rng = random.Random(11)
        nodes = [f"n{i}" for i in range(20)]
        edges = list({(rng.choice(nodes), rng.choice(nodes))
                      for _ in range(50)})
        seeds = ["n0", "n3", "n7"]
        got = {(r["root"], r["hop"], r["src"], r["dst"])
               for r in self._run(spark, edges, seeds, [3, 2]).collect()}
        want = self._brute(edges, seeds, [3, 2])
        assert got == want

    def test_fanout_bound_and_hub_truncation(self, spark):
        edges = [("hub", f"x{i}") for i in range(10)]
        out = self._run(spark, edges, ["hub"], [4]).collect()
        assert len(out) == 4
        assert all(r["hop"] == 1 and r["src"] == "hub" for r in out)

    def test_partitioning_invariance_and_salt_redraw(self, spark):
        edges = [("a", f"b{i}") for i in range(8)] + \
                [(f"b{i}", f"c{j}") for i in range(8) for j in range(4)]
        e1 = spark.createDataFrame(edges, "src string, dst string")
        s = spark.createDataFrame([("a",)], "id string")
        from neo4j_document_pipeline_spark.operators.kgtrain import (
            sample_neighborhoods)
        k = lambda df: {(r["root"], r["hop"], r["src"], r["dst"])
                        for r in df.collect()}
        base = k(sample_neighborhoods(e1, s, [2, 2]))
        rep = k(sample_neighborhoods(e1.repartition(13), s, [2, 2]))
        assert base == rep
        redraw = k(sample_neighborhoods(e1, s, [2, 2], salt="v2"))
        assert redraw != base  # an epoch redraw picks a different tree

    def test_directed_does_not_walk_backwards(self, spark):
        out = self._run(spark, [("a", "b"), ("c", "b")], ["b"], [5],
                        directed=True).collect()
        assert out == []  # b has no OUT-edges
        undirected = self._run(spark, [("a", "b"), ("c", "b")], ["b"],
                               [5]).collect()
        assert {r["dst"] for r in undirected} == {"a", "c"}

    def test_fanout_validation(self, spark):
        import pytest as _pt
        for bad in ([], [0], [2, -1], [1.5]):
            with _pt.raises(ValueError):
                self._run(spark, [("a", "b")], ["a"], bad)
