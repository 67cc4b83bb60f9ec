"""Brandes betweenness centrality: brute parity, sampling, guards."""

from collections import defaultdict, deque

import pytest


def brute_brandes(edge_list, sources=None, normalized=True):
    """Textbook Brandes accumulation (pure python) for parity."""
    adj = defaultdict(set)
    for u, v in edge_list:
        if u != v:
            adj[u].add(v)
            adj[v].add(u)
    nodes = sorted(adj)
    n = len(nodes)
    s_eff = [s for s in (sources if sources is not None else nodes)
             if s in adj]
    k = len(s_eff)
    total = defaultdict(float)
    for s in s_eff:
        dist, sigma, order = {s: 0}, {s: 1}, [s]
        dq = deque([s])
        while dq:
            u = dq.popleft()
            for w in adj[u]:
                if w not in dist:
                    dist[w] = dist[u] + 1
                    sigma[w] = 0
                    dq.append(w)
                    order.append(w)
                if dist[w] == dist[u] + 1:
                    sigma[w] += sigma[u]
        delta = dict.fromkeys(order, 0.0)
        for w in reversed(order):
            for u in adj[w]:
                if dist.get(u) == dist[w] - 1:
                    delta[u] += sigma[u] / sigma[w] * (1 + delta[w])
            if w != s:
                total[w] += delta[w]
    out = {}
    for v, d in total.items():
        if normalized:
            out[v] = d * n / (k * (n - 1) * (n - 2))
        else:
            out[v] = d * n / (k * 2)
    return out


def _run(spark, edge_list, **kw):
    from neo4j_document_pipeline_spark.operators.graphalgo import (
        betweenness_centrality)
    df = spark.createDataFrame(edge_list, ["u", "v"])
    return {r["id"]: r["betweenness"]
            for r in betweenness_centrality(df, **kw).collect()}


class TestBetweenness:
    def test_path_graph_known_values(self, spark):
        got = _run(spark, [("a", "b"), ("b", "c")])
        assert got["b"] == pytest.approx(1.0)
        assert got["a"] == pytest.approx(0.0)
        assert got["c"] == pytest.approx(0.0)

    def test_path_graph_raw(self, spark):
        got = _run(spark, [("a", "b"), ("b", "c")], normalized=False)
        assert got["b"] == pytest.approx(1.0)  # the one (a,c) pair

    def test_diamond_split_paths(self, spark):
        # a-b-d and a-c-d: sigma(a,d)=2, b and c each carry half
        edges = [("a", "b"), ("b", "d"), ("a", "c"), ("c", "d")]
        got = _run(spark, edges, normalized=False)
        brute = brute_brandes(edges, normalized=False)
        for v in brute:
            assert got[v] == pytest.approx(brute[v]), v

    def test_star_center_dominates(self, spark):
        edges = [("c", f"x{i}") for i in range(5)]
        got = _run(spark, edges)
        assert got["c"] == pytest.approx(1.0)  # on every pair's path
        for i in range(5):
            assert got[f"x{i}"] == pytest.approx(0.0)

    def test_brute_parity_random(self, spark):
        import random
        rng = random.Random(11)
        nodes = [f"n{i}" for i in range(18)]
        edges = sorted({(a, b) for a in nodes for b in nodes
                        if a < b and rng.random() < 0.18})
        got = _run(spark, edges)
        brute = brute_brandes(edges)
        assert set(got) == set(brute)
        for v in brute:
            assert got[v] == pytest.approx(brute[v], abs=1e-9), v

    def test_sampled_sources_match_brute_subset(self, spark):
        import random
        rng = random.Random(3)
        nodes = [f"n{i}" for i in range(15)]
        edges = sorted({(a, b) for a in nodes for b in nodes
                        if a < b and rng.random() < 0.25})
        srcs = ["n0", "n3", "n7", "missing"]  # absent source: no effect
        got = _run(spark, edges, sources=srcs)
        brute = brute_brandes(edges, sources=srcs)
        assert set(got) == set(brute)
        for v in brute:
            assert got[v] == pytest.approx(brute[v], abs=1e-9), v

    def test_max_depth_raises_loudly(self, spark):
        chain = [(f"c{i}", f"c{i+1}") for i in range(8)]
        with pytest.raises(RuntimeError, match="max_depth"):
            _run(spark, chain, max_depth=3)
        got = _run(spark, chain, max_depth=8)
        brute = brute_brandes(chain)
        for v in brute:
            assert got[v] == pytest.approx(brute[v]), v

    def test_disconnected_components(self, spark):
        edges = [("a", "b"), ("b", "c"), ("x", "y")]
        got = _run(spark, edges, normalized=False)
        brute = brute_brandes(edges, normalized=False)
        for v in brute:
            assert got[v] == pytest.approx(brute[v]), v
