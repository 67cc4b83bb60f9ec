"""Retrieval/classifier evaluation metrics — brute parity + semantics."""

import math
import random

import pytest


def _brute_ranking(results, relevance, k):
    """Python spec for ranking_metrics."""
    rel = {}
    for q, d, r in relevance:
        rel[(q, d)] = float(r)
    by_q = {}
    for q, d, s in results:
        by_q.setdefault(q, []).append((d, s))
    out = {}
    qids = set(by_q)
    for q in qids:
        ranked = sorted(by_q[q], key=lambda x: (-x[1], x[0]))[:k]
        dcg = 0.0
        first = None
        hits = 0
        for i, (d, _) in enumerate(ranked, start=1):
            r = rel.get((q, d), 0.0)
            dcg += (2.0 ** r - 1) / math.log2(i + 1)
            if r > 0:
                hits += 1
                if first is None:
                    first = i
        rels = sorted((r for (qq, _), r in rel.items()
                       if qq == q and r > 0), reverse=True)
        idcg = sum((2.0 ** r - 1) / math.log2(i + 1)
                   for i, r in enumerate(rels[:k], start=1))
        n_rel = len(rels)
        out[q] = (
            1.0 / first if first else 0.0,
            dcg / idcg if idcg > 0 else 0.0,
            hits / k,
            hits / n_rel if n_rel else 0.0,
            n_rel)
    return out


class TestRankingMetrics:
    def test_brute_parity_random(self, spark):
        from neo4j_document_pipeline_spark.operators.evaluation import (
            ranking_metrics)
        rng = random.Random(5)
        results, relevance = [], []
        for q in range(8):
            docs = rng.sample(range(100), 20)
            for d in docs:
                results.append((f"q{q}", f"d{d}", rng.random()))
            for d in rng.sample(docs, 6) + rng.sample(range(100, 120), 3):
                relevance.append((f"q{q}", f"d{d}", rng.randint(0, 3)))
        res = spark.createDataFrame(results, ["query_id", "doc_id", "score"])
        rel = spark.createDataFrame(relevance, ["query_id", "doc_id", "rel"])
        got = {r.query_id: (r.mrr, r.ndcg, r.precision_k, r.recall_k,
                            r.n_rel)
               for r in ranking_metrics(res, rel, k=10).collect()}
        want = _brute_ranking(results, relevance, 10)
        assert set(got) == set(want)
        for q in want:
            for g, w in zip(got[q], want[q]):
                assert abs(g - w) < 1e-9, (q, got[q], want[q])

    def test_perfect_and_empty(self, spark):
        from neo4j_document_pipeline_spark.operators.evaluation import (
            ranking_metrics)
        # q1: perfect ranking of its 3 relevant docs; q2: no relevant
        res = spark.createDataFrame(
            [("q1", "a", 3.0), ("q1", "b", 2.0), ("q1", "c", 1.0),
             ("q2", "x", 1.0)],
            ["query_id", "doc_id", "score"])
        rel = spark.createDataFrame(
            [("q1", "a", 3), ("q1", "b", 2), ("q1", "c", 1)],
            ["query_id", "doc_id", "rel"])
        got = {r.query_id: r for r in
               ranking_metrics(res, rel, k=3).collect()}
        assert got["q1"].mrr == 1.0
        assert abs(got["q1"].ndcg - 1.0) < 1e-12
        assert got["q1"].recall_k == 1.0
        assert got["q2"].mrr == 0.0 and got["q2"].ndcg == 0.0
        assert got["q2"].n_rel == 0

    def test_tie_break_deterministic(self, spark):
        from neo4j_document_pipeline_spark.operators.evaluation import (
            ranking_metrics)
        # equal scores: doc asc wins -> 'a' ranks 1
        res = spark.createDataFrame(
            [("q", "b", 1.0), ("q", "a", 1.0)],
            ["query_id", "doc_id", "score"])
        rel = spark.createDataFrame(
            [("q", "a", 1)], ["query_id", "doc_id", "rel"])
        r = ranking_metrics(res, rel, k=2).collect()[0]
        assert r.mrr == 1.0

    def test_k_validation(self, spark):
        from neo4j_document_pipeline_spark.operators.evaluation import (
            ranking_metrics)
        df = spark.createDataFrame([("q", "d", 1.0)],
                                   ["query_id", "doc_id", "score"])
        with pytest.raises(ValueError):
            ranking_metrics(df, df.select(
                "query_id", "doc_id",
                df.score.alias("rel")), k=0)


class TestClassificationReport:
    def test_brute_parity(self, spark):
        from neo4j_document_pipeline_spark.operators.evaluation import (
            classification_report)
        rng = random.Random(9)
        classes = ["en", "de", "fr", "es"]
        pairs = [(rng.choice(classes), rng.choice(classes))
                 for _ in range(300)]
        df = spark.createDataFrame(pairs, ["label", "pred"])
        got = {r.cls: (r.precision, r.recall, r.f1, r.support)
               for r in classification_report(df).collect()}
        for c in classes:
            tp = sum(1 for l, p in pairs if l == c and p == c)
            npred = sum(1 for _, p in pairs if p == c)
            sup = sum(1 for l, _ in pairs if l == c)
            prec = tp / npred if npred else 0.0
            rec = tp / sup if sup else 0.0
            f1 = 2 * prec * rec / (prec + rec) if prec + rec else 0.0
            g = got[c]
            assert abs(g[0] - prec) < 1e-12
            assert abs(g[1] - rec) < 1e-12
            assert abs(g[2] - f1) < 1e-12
            assert g[3] == sup

    def test_one_sided_classes(self, spark):
        from neo4j_document_pipeline_spark.operators.evaluation import (
            classification_report)
        # 'ghost' only ever predicted; 'missed' never predicted
        df = spark.createDataFrame(
            [("a", "a"), ("a", "ghost"), ("missed", "a")],
            ["label", "pred"])
        got = {r.cls: r for r in classification_report(df).collect()}
        assert got["ghost"].support == 0 and got["ghost"].recall == 0.0
        assert got["ghost"].precision == 0.0  # predicted once, wrong
        assert got["missed"].precision == 0.0
        assert got["missed"].recall == 0.0 and got["missed"].support == 1
        assert got["a"].support == 2
