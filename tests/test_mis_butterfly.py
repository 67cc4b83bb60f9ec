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


class TestMaximalMatching:
    def _m(self, spark, edges, **kw):
        from neo4j_document_pipeline_spark.operators.graphalgo import (
            maximal_matching)
        e = spark.createDataFrame(edges, "u string, v string")
        return maximal_matching(e, **kw).collect()

    def test_matching_is_vertex_disjoint_and_maximal(self, spark):
        import random
        rng = random.Random(17)
        nodes = [f"n{i:02d}" for i in range(30)]
        edges = list({(rng.choice(nodes), rng.choice(nodes))
                      for _ in range(80)})
        rows = self._m(spark, edges)
        used = []
        for r in rows:
            used.extend([r["u"], r["v"]])
        assert len(used) == len(set(used))  # vertex-disjoint
        # maximality: every remaining edge touches a matched vertex
        canon = {(min(u, v), max(u, v)) for u, v in edges if u != v}
        matched = set(used)
        for u, v in canon:
            if u not in matched and v not in matched:
                raise AssertionError(f"unmatched addable edge {(u, v)}")

    def test_brute_parity(self, spark):
        import hashlib
        edges = [("a", "b"), ("b", "c"), ("c", "d"), ("d", "a"),
                 ("a", "c"), ("e", "f")]
        got = {(r["u"], r["v"], r["round"]) for r in self._m(spark, edges)}
        canon = sorted({(min(u, v), max(u, v)) for u, v in edges})

        def pri(u, v):
            return (hashlib.sha256(f"v1:{u}|{v}".encode()).hexdigest()
                    + f":{u}|{v}")
        active = dict(((u, v), pri(u, v)) for u, v in canon)
        want = set()
        rnd = 0
        while active:
            mn = {}
            for (u, v), p in active.items():
                for x in (u, v):
                    mn[x] = min(mn.get(x, p), p)
            sel = [(u, v) for (u, v), p in active.items()
                   if p == mn[u] and p == mn[v]]
            gone = {x for u, v in sel for x in (u, v)}
            want |= {(u, v, rnd) for u, v in sel}
            active = {e: p for e, p in active.items()
                      if e[0] not in gone and e[1] not in gone}
            rnd += 1
        assert got == want

    def test_empty_graph(self, spark):
        assert self._m(spark, [("a", "a")]) == []


class TestCoarsenGraph:
    def test_contraction_known_values(self, spark):
        from neo4j_document_pipeline_spark.operators.graphalgo import (
            coarsen_graph)
        # fixed matching: (a,b) and (c,d); e unmatched
        e = spark.createDataFrame(
            [("a", "b"), ("a", "c"), ("b", "d"), ("c", "d"), ("d", "e")],
            "u string, v string")
        m = spark.createDataFrame([("a", "b"), ("c", "d")],
                                  "u string, v string")
        coarse, node_map = coarsen_graph(e, m)
        nm = {r["id"]: r["super"] for r in node_map.collect()}
        assert nm == {"a": "a", "b": "a", "c": "c", "d": "c", "e": "e"}
        cw = {(r["u"], r["v"]): r["weight"] for r in coarse.collect()}
        # a-c and b-d both become (a,c): weight 2; d-e becomes (c,e)
        assert cw == {("a", "c"): 2, ("c", "e"): 1}

    def test_self_matching_round_trip(self, spark):
        from neo4j_document_pipeline_spark.operators.graphalgo import (
            coarsen_graph)
        e = spark.createDataFrame(
            [(f"x{i}", f"x{i+1}") for i in range(10)],
            "u string, v string")
        coarse, node_map = coarsen_graph(e)
        n0 = 11
        n1 = node_map.select("super").distinct().count()
        assert n1 < n0  # the graph actually shrinks
        # total edge multiplicity is preserved minus contracted edges
        from pyspark.sql import functions as F
        kept = coarse.agg(F.sum("weight")).first()[0]
        matched = node_map.filter(F.col("id") != F.col("super")).count()
        assert kept == 10 - matched


def test_matching_converges_at_exactly_max_iters(spark):
    from neo4j_document_pipeline_spark.operators.graphalgo import (
        maximal_matching)
    # a path of 3 edges needs 2 Luby rounds under some priority order;
    # find a max_iters equal to the natural round count and assert no
    # spurious raise
    e = spark.createDataFrame(
        [("a", "b"), ("b", "c"), ("c", "d"), ("d", "e")],
        "u string, v string")
    full = maximal_matching(e).collect()
    rounds_needed = max(r["round"] for r in full) + 1
    tight = maximal_matching(e, max_iters=rounds_needed).collect()
    assert {(r["u"], r["v"]) for r in tight} \
        == {(r["u"], r["v"]) for r in full}


def test_coarsen_weight_col_sums_previous_level(spark):
    from neo4j_document_pipeline_spark.operators.graphalgo import (
        coarsen_graph)
    from pyspark.sql import functions as F
    e = spark.createDataFrame(
        [("a", "b", 3), ("a", "c", 2), ("b", "d", 5), ("c", "d", 1)],
        "u string, v string, weight long")
    m = spark.createDataFrame([("a", "b"), ("c", "d")],
                              "u string, v string")
    coarse, _ = coarsen_graph(e, m, weight_col="weight")
    cw = {(r["u"], r["v"]): r["weight"] for r in coarse.collect()}
    # a-c (2) and b-d (5) both map to (a, c): weights SUM to 7
    assert cw == {("a", "c"): 7}
