"""Multinomial Naive Bayes classifier (operators/classify.py)."""

import math

import pytest
from pyspark.sql import functions as F


def _docs(spark, rows, cols="doc_id: string, text: string"):
    return spark.createDataFrame(rows, cols)


def _seeds(spark, rows):
    return spark.createDataFrame(rows, "label: string, text: string")


SEEDS = [
    ("food", "apple pie and apple tart"),
    ("food", "banana bread with butter"),
    ("tech", "spark cluster shuffle join"),
    ("tech", "cluster join optimizer"),
    ("tech", "query optimizer statistics"),
]


def _brute(seeds, docs, add_k=1.0):
    """Python reference: dict-based multinomial NB."""
    import re

    def toks(t):
        return [w for w in re.split(r"[^A-Za-z0-9']+", t.lower()) if w]

    cwc, ctot, ndocs = {}, {}, {}
    vocab = set()
    for lab, text in seeds:
        ndocs[lab] = ndocs.get(lab, 0) + 1
        for w in toks(text):
            cwc[(lab, w)] = cwc.get((lab, w), 0) + 1
            ctot[lab] = ctot.get(lab, 0) + 1
            vocab.add(w)
    n_seed = sum(ndocs.values())
    v = len(vocab)
    out = {}
    for did, text in docs:
        for lab in ndocs:
            s = math.log(ndocs[lab] / n_seed)
            hit = 0
            for w in toks(text):
                if w not in vocab:
                    continue
                hit += 1
                s += math.log((cwc.get((lab, w), 0) + add_k)
                              / (ctot.get(lab, 0) + add_k * v))
            out[(did, lab)] = (hit, s)
    return out


def test_known_values_and_brute_parity(spark):
    from neo4j_document_pipeline_spark.operators.classify import (
        nb_class_scores)
    docs = [("d1", "apple pie with butter"),
            ("d2", "spark shuffle statistics"),
            ("d3", "zzz unseen words only"),
            ("d4", "")]
    got = {(r["doc_id"], r["label"]): (r["n_hit"], r["score"])
           for r in nb_class_scores(
               _docs(spark, docs), "doc_id", "text",
               _seeds(spark, SEEDS), "label").collect()}
    want = _brute(SEEDS, docs)
    assert set(got) == set(want)
    for key, (hit, s) in want.items():
        assert got[key][0] == hit
        assert got[key][1] == pytest.approx(s, abs=1e-9)
    # fully-OOV and empty docs score the prior alone
    assert got[("d3", "food")][1] == pytest.approx(math.log(2 / 5))
    assert got[("d3", "tech")][1] == pytest.approx(math.log(3 / 5))
    assert got[("d4", "food")][0] == 0
    # separable docs sort to the right class
    assert got[("d1", "food")][1] > got[("d1", "tech")][1]
    assert got[("d2", "tech")][1] > got[("d2", "food")][1]


def test_brute_parity_random(spark):
    import random

    from neo4j_document_pipeline_spark.operators.classify import (
        nb_class_scores)
    rng = random.Random(7)
    vocab_a = ["red", "green", "blue", "cyan"]
    vocab_b = ["cat", "dog", "bird", "blue"]  # overlapping term
    seeds = []
    for i in range(20):
        lab, voc = (("a", vocab_a) if i % 2 else ("b", vocab_b))
        seeds.append((lab, " ".join(rng.choice(voc) for _ in range(12))))
    docs = [(f"d{i}", " ".join(
        rng.choice(vocab_a + vocab_b + ["oov"]) for _ in range(9)))
        for i in range(15)]
    got = {(r["doc_id"], r["label"]): (r["n_hit"], r["score"])
           for r in nb_class_scores(
               _docs(spark, docs), "doc_id", "text",
               _seeds(spark, seeds), "label", add_k=0.5).collect()}
    want = _brute(seeds, docs, add_k=0.5)
    assert set(got) == set(want)
    for key, (hit, s) in want.items():
        assert got[key] == (hit, pytest.approx(s, abs=1e-9))


def test_null_seed_rows_ignored_and_validation(spark):
    from neo4j_document_pipeline_spark.operators.classify import (
        nb_class_scores)
    docs = _docs(spark, [("d1", "apple")])
    seeds = spark.createDataFrame(
        [("food", "apple apple"), (None, "poison tokens"),
         ("food", None)], "label: string, text: string")
    rows = nb_class_scores(docs, "doc_id", "text", seeds,
                           "label").collect()
    # only the one real seed row trains: prior ln(1/1)=0, vocab={apple}
    assert len(rows) == 1
    r = rows[0]
    assert (r["label"], r["n_hit"]) == ("food", 1)
    assert r["score"] == pytest.approx(math.log((2 + 1) / (2 + 1 * 1)))
    with pytest.raises(ValueError, match="add_k"):
        nb_class_scores(docs, "doc_id", "text", seeds, "label", add_k=0.0)


def test_partitioning_invariance(spark):
    from neo4j_document_pipeline_spark.operators.classify import (
        nb_class_scores)
    docs = [(f"d{i}", f"apple spark {'pie' * (i % 3)} join") for i in range(40)]
    seeds = _seeds(spark, SEEDS)
    a = nb_class_scores(_docs(spark, docs), "doc_id", "text",
                        seeds, "label")
    b = nb_class_scores(_docs(spark, docs).repartition(13), "doc_id",
                        "text", seeds.repartition(5), "label")
    ra = sorted((r["doc_id"], r["label"], r["n_hit"], round(r["score"], 9))
                for r in a.collect())
    rb = sorted((r["doc_id"], r["label"], r["n_hit"], round(r["score"], 9))
                for r in b.collect())
    assert ra == rb


def test_best_class_argmax_margin_and_ties(spark):
    from neo4j_document_pipeline_spark.operators.classify import (
        nb_best_class, nb_class_scores)
    docs = [("d1", "apple pie"), ("d2", "cluster join"),
            ("d3", "zzz oov only")]
    scores = nb_class_scores(_docs(spark, docs), "doc_id", "text",
                             _seeds(spark, SEEDS), "label")
    best = {r["doc_id"]: r for r in
            nb_best_class(scores, "doc_id").collect()}
    assert best["d1"]["label"] == "food"
    assert best["d2"]["label"] == "tech"
    assert best["d1"]["margin"] > 0 and best["d2"]["margin"] > 0
    # d3 scores priors only: tech prior ln(3/5) > food ln(2/5)
    assert best["d3"]["label"] == "tech"
    # exact tie -> smallest label wins, margin 0
    tied = spark.createDataFrame(
        [("x", "b", 1, -1.0), ("x", "a", 1, -1.0), ("x", "c", 1, -2.0)],
        "doc_id: string, label: string, n_hit: long, score: double")
    r = nb_best_class(tied, "doc_id").collect()[0]
    assert (r["label"], r["margin"]) == ("a", 0.0)
    # single trained class: nothing to beat -> margin NULL
    one = spark.createDataFrame([("x", "a", 1, -1.0)],
                                "doc_id: string, label: string, "
                                "n_hit: long, score: double")
    assert nb_best_class(one, "doc_id").collect()[0]["margin"] is None
