"""Luby maximal independent set + bipartite butterfly census."""

import hashlib
import itertools
import random

import pytest


def _luby_brute(edge_pairs, salt="v1"):
    """Python replay of the deterministic Luby rounds."""
    und = set()
    nodes = set()
    for u, v in edge_pairs:
        u, v = str(u), str(v)
        if u == v:
            continue
        und.add((min(u, v), max(u, v)))
        nodes.update((u, v))
    pri = {n: hashlib.sha256(f"{salt}:{n}".encode()).hexdigest() + ":" + n
           for n in nodes}
    adj = {n: set() for n in nodes}
    for u, v in und:
        adj[u].add(v)
        adj[v].add(u)
    active = set(nodes)
    out = {}
    rnd = 0
    while active:
        sel = {n for n in active
               if all(pri[n] < pri[m] for m in adj[n] if m in active)}
        for n in sel:
            out[n] = rnd
        removed = set(sel)
        for n in sel:
            removed |= adj[n] & active
        active -= removed
        rnd += 1
    return out


class TestMaximalIndependentSet:
    def _edges(self, spark, pairs):
        return spark.createDataFrame([(str(a), str(b)) for a, b in pairs],
                                     ["u", "v"])

    def test_brute_parity_random(self, spark):
        from neo4j_document_pipeline_spark.operators.graphalgo import (
            maximal_independent_set)
        rng = random.Random(3)
        pairs = {(rng.randrange(30), rng.randrange(30)) for _ in range(90)}
        got = {r["id"]: r["round"]
               for r in maximal_independent_set(
                   self._edges(spark, pairs)).collect()}
        assert got == _luby_brute(pairs)

    def test_independent_and_maximal(self, spark):
        from neo4j_document_pipeline_spark.operators.graphalgo import (
            maximal_independent_set)
        rng = random.Random(11)
        pairs = {(rng.randrange(25), rng.randrange(25)) for _ in range(70)}
        und = {(str(min(a, b)), str(max(a, b))) for a, b in pairs if a != b}
        nodes = {n for e in und for n in e}
        mis = {r["id"] for r in maximal_independent_set(
            self._edges(spark, pairs)).collect()}
        adj = {n: set() for n in nodes}
        for u, v in und:
            adj[u].add(v)
            adj[v].add(u)
        for u, v in und:                      # independence
            assert not (u in mis and v in mis)
        for n in nodes - mis:                 # maximality
            assert adj[n] & mis, f"{n} has no MIS neighbor"

    def test_salt_changes_selection(self, spark):
        from neo4j_document_pipeline_spark.operators.graphalgo import (
            maximal_independent_set)
        pairs = [(i, i + 1) for i in range(20)]
        e = self._edges(spark, pairs)
        a = {r["id"] for r in maximal_independent_set(e, salt="v1").collect()}
        b = {r["id"] for r in maximal_independent_set(e, salt="v2").collect()}
        assert a == {str(k) for k in _luby_brute(pairs, "v1")}
        assert b == {str(k) for k in _luby_brute(pairs, "v2")}
        assert a != b  # 2^-20-ish chance of collision for these salts

    def test_partitioning_invariance(self, spark):
        from neo4j_document_pipeline_spark.operators.graphalgo import (
            maximal_independent_set)
        rng = random.Random(5)
        pairs = {(rng.randrange(40), rng.randrange(40)) for _ in range(120)}
        e = self._edges(spark, pairs)
        a = sorted(map(tuple, maximal_independent_set(e).collect()))
        b = sorted(map(tuple,
                       maximal_independent_set(e.repartition(17)).collect()))
        assert a == b

    def test_max_iters_raises_loudly(self, spark):
        from neo4j_document_pipeline_spark.operators.graphalgo import (
            maximal_independent_set)
        pairs = [(i, i + 1) for i in range(30)]  # path: several waves
        with pytest.raises(RuntimeError, match="max_iters"):
            maximal_independent_set(self._edges(spark, pairs), max_iters=1)


class TestButterflyCount:
    def _bip(self, spark, pairs):
        return spark.createDataFrame([(str(a), str(b)) for a, b in pairs],
                                     ["l", "r"])

    @staticmethod
    def _brute(pairs):
        e = {(str(a), str(b)) for a, b in pairs}
        lefts = sorted({a for a, _ in e})
        nbr = {a: {b for x, b in e if x == a} for a in lefts}
        wedges = 0
        bf = 0
        for a, b in itertools.combinations(lefts, 2):
            c = len(nbr[a] & nbr[b])
            wedges += c
            bf += c * (c - 1) // 2
        return (len(lefts), len({b for _, b in e}), len(e), wedges, bf)

    def test_k22_is_one_butterfly(self, spark):
        from neo4j_document_pipeline_spark.operators.graphalgo import (
            butterfly_count)
        row = butterfly_count(
            self._bip(spark, [("a", "x"), ("a", "y"),
                              ("b", "x"), ("b", "y")])).collect()[0]
        assert tuple(row) == (2, 2, 4, 2, 1)

    def test_brute_parity_random(self, spark):
        from neo4j_document_pipeline_spark.operators.graphalgo import (
            butterfly_count)
        rng = random.Random(9)
        pairs = {(f"l{rng.randrange(15)}", f"r{rng.randrange(10)}")
                 for _ in range(80)}
        row = butterfly_count(self._bip(spark, pairs)).collect()[0]
        assert tuple(row) == self._brute(pairs)

    def test_duplicate_edges_collapse(self, spark):
        from neo4j_document_pipeline_spark.operators.graphalgo import (
            butterfly_count)
        pairs = [("a", "x"), ("a", "x"), ("a", "y"), ("b", "x"), ("b", "y")]
        row = butterfly_count(self._bip(spark, pairs)).collect()[0]
        assert tuple(row) == self._brute(pairs)

    def test_right_hub_cap(self, spark):
        from neo4j_document_pipeline_spark.operators.graphalgo import (
            butterfly_count)
        # hub right node 'h' touches every left; capping drops it
        pairs = [(f"l{i}", "h") for i in range(6)] + [
            ("l0", "x"), ("l1", "x"), ("l0", "y"), ("l1", "y")]
        full = butterfly_count(self._bip(spark, pairs)).collect()[0]
        capped = butterfly_count(self._bip(spark, pairs),
                                 max_right_degree=3).collect()[0]
        assert tuple(full) == self._brute(pairs)
        assert tuple(capped) == self._brute(
            [p for p in pairs if p[1] != "h"])
        with pytest.raises(ValueError):
            butterfly_count(self._bip(spark, pairs), max_right_degree=1)

    def test_no_wedges_zero_row(self, spark):
        from neo4j_document_pipeline_spark.operators.graphalgo import (
            butterfly_count)
        row = butterfly_count(
            self._bip(spark, [("a", "x"), ("b", "y")])).collect()[0]
        assert tuple(row) == (2, 2, 2, 0, 0)
