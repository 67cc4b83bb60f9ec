"""PageRank + triangle counting (operators/graphalgo.py) — small graphs
with hand-checkable structure plus numpy power-iteration parity."""

import numpy as np
import pytest

from neo4j_document_pipeline_spark.operators.graphalgo import (
    pagerank,
    triangle_count,
)


def _edges(spark, pairs):
    return spark.createDataFrame(
        [(str(a), str(b)) for a, b in pairs], "u string, v string")


def _np_pagerank(pairs, damping=0.85, iters=5, directed=False):
    """Dense-matrix power iteration with uniform dangling redistribution
    — the definition the operator implements."""
    if not directed:
        und = {(min(a, b), max(a, b)) for a, b in pairs if a != b}
        pairs = list(und) + [(b, a) for a, b in und]
    else:
        pairs = list({(a, b) for a, b in pairs if a != b})
    ids = sorted({x for p in pairs for x in p})
    pos = {x: i for i, x in enumerate(ids)}
    n = len(ids)
    out = np.zeros(n)
    for a, _ in pairs:
        out[pos[a]] += 1
    r = np.full(n, 1.0 / n)
    for _ in range(iters):
        nxt = np.full(n, (1 - damping) / n)
        dang = r[out == 0].sum()
        for a, b in pairs:
            nxt[pos[b]] += damping * r[pos[a]] / out[pos[a]]
        nxt += damping * dang / n
        r = nxt
    return {ids[i]: r[i] for i in range(n)}


def test_pagerank_matches_numpy_power_iteration(spark):
    rng = np.random.RandomState(7)
    pairs = [(f"n{rng.randint(0, 30)}", f"n{rng.randint(0, 30)}")
             for _ in range(120)]
    for directed in (False, True):
        want = _np_pagerank(pairs, iters=5, directed=directed)
        got = {r["id"]: r["rank"] for r in
               pagerank(_edges(spark, pairs), iters=5,
                        directed=directed).collect()}
        assert set(got) == set(want)
        for k in want:
            assert got[k] == pytest.approx(want[k], abs=1e-9), k


def test_pagerank_mass_conserved_and_symmetric(spark):
    # undirected graphs never strand mass: ranks sum to 1 every time
    pairs = [("a", "b"), ("b", "c"), ("c", "a"), ("c", "d")]
    rows = pagerank(_edges(spark, pairs), iters=10).collect()
    assert sum(r["rank"] for r in rows) == pytest.approx(1.0, abs=1e-9)
    by = {r["id"]: r["rank"] for r in rows}
    # a and b are automorphic (both: degree 2, adjacent to each other
    # and to c) => identical rank; c (degree 3) outranks all
    assert by["a"] == pytest.approx(by["b"], abs=1e-12)
    assert by["c"] == max(by.values())
    assert by["d"] == min(by.values())


def test_pagerank_directed_dangling_redistribution(spark):
    # b is a pure sink: its mass must recirculate, not vanish
    pairs = [("a", "b"), ("c", "b"), ("c", "a")]
    rows = pagerank(_edges(spark, pairs), iters=20,
                    directed=True).collect()
    assert sum(r["rank"] for r in rows) == pytest.approx(1.0, abs=1e-9)
    by = {r["id"]: r["rank"] for r in rows}
    assert by["b"] == max(by.values())  # everything points at b


def test_pagerank_empty_edges(spark):
    out = pagerank(_edges(spark, []), iters=3)
    assert out.collect() == []
    assert [f.name for f in out.schema.fields] == ["id", "rank"]


def _brute_triangles(pairs):
    und = {frozenset((a, b)) for a, b in pairs if a != b}
    ids = sorted({x for e in und for x in e})
    n = 0
    for i, a in enumerate(ids):
        for j in range(i + 1, len(ids)):
            for k in range(j + 1, len(ids)):
                b, c = ids[j], ids[k]
                if ({frozenset((a, b)), frozenset((a, c)),
                     frozenset((b, c))} <= und):
                    n += 1
    return n


def test_triangle_count_known_graphs(spark):
    k4 = [(a, b) for i, a in enumerate("abcd")
          for b in "abcd"[i + 1:]]
    assert triangle_count(_edges(spark, k4)).first()["triangles"] == 4
    c5 = [("a", "b"), ("b", "c"), ("c", "d"), ("d", "e"), ("e", "a")]
    assert triangle_count(_edges(spark, c5)).first()["triangles"] == 0
    # duplicate / reversed / self-loop edges don't change the answer
    messy = k4 + [(b, a) for a, b in k4] + [("a", "a"), ("a", "b")]
    assert triangle_count(_edges(spark, messy)).first()["triangles"] == 4


def test_triangle_count_matches_brute_force(spark):
    rng = np.random.RandomState(11)
    pairs = [(f"n{rng.randint(0, 25)}", f"n{rng.randint(0, 25)}")
             for _ in range(140)]
    want = _brute_triangles(pairs)
    assert want > 0  # density sanity: the fixture actually has triangles
    got = triangle_count(_edges(spark, pairs)).first()["triangles"]
    assert got == want


def test_cli_pagerank_and_triangles(spark, tmp_path, capsys):
    """The analytics commands run over a committed store and emit
    JSON: pagerank joins names back from nodes, ranks sum to ~1 over
    the full vertex set, triangles returns one integer row."""
    import json

    from neo4j_document_pipeline_spark.__main__ import main
    from neo4j_document_pipeline_spark.plans.pipeline import run_pipeline
    from neo4j_document_pipeline_spark.sources.pages import synth_pages
    root = str(tmp_path / "kg")
    run_pipeline(spark, synth_pages(spark, 15), root)
    main(["pagerank", "--store", root, "--limit", "5", "--iters", "5"])
    rows = [json.loads(line) for line in
            capsys.readouterr().out.strip().splitlines()]
    assert len(rows) == 5
    assert all({"id", "rank", "label", "name"} <= set(r) for r in rows)
    assert rows == sorted(rows, key=lambda r: -r["rank"])
    main(["triangles", "--store", root])
    out = json.loads(capsys.readouterr().out.strip())
    assert isinstance(out["triangles"], int) and out["triangles"] >= 0
