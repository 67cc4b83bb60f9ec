"""Target encoding, standardization, calibration bins, KL novelty."""

import math

import pytest


class TestTargetEncode:
    def test_known_values(self, spark):
        from neo4j_document_pipeline_spark.operators.features import (
            target_encode)
        rows = [("a", 1), ("a", 0), ("a", 1), ("b", 1)]
        df = spark.createDataFrame(rows, ["cat", "t"])
        got = {r["category"]: r.asDict()
               for r in target_encode(df, "cat", "t", alpha=2.0).collect()}
        gm = 3 / 4
        assert got["a"]["n"] == 3
        assert got["a"]["target_mean"] == pytest.approx(2 / 3)
        assert got["a"]["encoded"] == pytest.approx((2 + 2 * gm) / 5)
        assert got["b"]["encoded"] == pytest.approx((1 + 2 * gm) / 3)

    def test_rare_category_shrinks_to_global_mean(self, spark):
        from neo4j_document_pipeline_spark.operators.features import (
            target_encode)
        rows = [("big", 1)] * 50 + [("big", 0)] * 50 + [("rare", 1)]
        df = spark.createDataFrame(rows, ["cat", "t"])
        got = {r["category"]: r["encoded"]
               for r in target_encode(df, "cat", "t", alpha=20.0).collect()}
        # raw rare mean is 1.0 but encoded sits near the 0.5 global mean
        assert got["rare"] < 0.6
        assert got["big"] == pytest.approx(
            (50 + 20 * (51 / 101)) / 120)

    def test_null_handling_and_validation(self, spark):
        from neo4j_document_pipeline_spark.operators.features import (
            target_encode)
        rows = [("a", 1), ("a", None), (None, 1), (None, 0)]
        df = spark.createDataFrame(rows, "cat string, t int")
        got = {r["category"]: r.asDict()
               for r in target_encode(df, "cat", "t", alpha=0.0).collect()}
        assert got["a"]["n"] == 1  # null target excluded
        assert got[None]["n"] == 2  # null category is a real level
        assert got[None]["target_mean"] == pytest.approx(0.5)
        with pytest.raises(ValueError, match="alpha"):
            target_encode(df, "cat", "t", alpha=-1)


class TestStandardScale:
    def test_known_z(self, spark):
        from neo4j_document_pipeline_spark.operators.features import (
            standard_scale)
        df = spark.createDataFrame([(1, 0.0), (2, 10.0)], ["id", "x"])
        got = {r["id"]: r["x_z"]
               for r in standard_scale(df, ["x"]).collect()}
        assert got[1] == pytest.approx(-1.0)
        assert got[2] == pytest.approx(1.0)

    def test_constant_column_null(self, spark):
        from neo4j_document_pipeline_spark.operators.features import (
            standard_scale)
        df = spark.createDataFrame([(1, 5.0), (2, 5.0)], ["id", "x"])
        got = standard_scale(df, ["x"]).collect()
        assert all(r["x_z"] is None for r in got)
        with pytest.raises(ValueError, match="at least one"):
            standard_scale(df, [])


class TestCalibrationBins:
    def test_known_bins(self, spark):
        from neo4j_document_pipeline_spark.operators.evaluation import (
            calibration_bins)
        rows = [(0.05, 1), (0.95, 1), (0.99, 0), (1.0, 1), (1.5, 1),
                (None, 1)]
        df = spark.createDataFrame(rows, "score double, label int")
        got = {r["bin"]: r.asDict()
               for r in calibration_bins(df).collect()}
        assert set(got) == {0, 9}  # 1.5 and NULL filtered; 1.0 -> bin 9
        assert got[0]["n"] == 1
        assert got[0]["accuracy"] == pytest.approx(1.0)
        assert got[0]["abs_gap"] == pytest.approx(0.95)
        assert got[9]["n"] == 3
        assert got[9]["confidence"] == pytest.approx((0.95 + 0.99 + 1.0) / 3)
        assert got[9]["accuracy"] == pytest.approx(2 / 3)
        with pytest.raises(ValueError, match="n_bins"):
            calibration_bins(df, n_bins=0)

    def test_perfectly_calibrated_gap_zero(self, spark):
        from neo4j_document_pipeline_spark.operators.evaluation import (
            calibration_bins)
        # bin 0.65: 20 rows scored 0.65 with 13 positives -> gap 0
        rows = [(0.65, 1)] * 13 + [(0.65, 0)] * 7
        df = spark.createDataFrame(rows, "score double, label int")
        got = calibration_bins(df).collect()
        assert len(got) == 1
        assert got[0]["abs_gap"] == pytest.approx(0.0)


class TestKlNovelty:
    def _kl_brute(self, docs):
        from collections import Counter
        corpus = Counter()
        per = {}
        for did, toks in docs.items():
            per[did] = Counter(toks)
            corpus.update(toks)
        total = sum(corpus.values())
        out = {}
        for did, c in per.items():
            nd = sum(c.values())
            if nd == 0:
                continue
            kl = sum((k / nd) * math.log((k / nd) / (corpus[w] / total))
                     for w, k in c.items())
            out[did] = (nd, kl)
        return out

    def test_brute_parity(self, spark):
        from neo4j_document_pipeline_spark.operators.corpus import (
            kl_novelty_scores)
        texts = {
            1: "the cat sat on the mat",
            2: "the dog sat on the log",
            3: "quantum chromodynamics lattice gauge theory",
            4: "the the the the",
        }
        df = spark.createDataFrame(list(texts.items()), ["doc_id", "text"])
        got = {r["doc_id"]: (r["n_tok"], r["kl"])
               for r in kl_novelty_scores(df, "doc_id", "text").collect()}
        brute = self._kl_brute(
            {k: v.split() for k, v in texts.items()})
        assert set(got) == set(brute)
        for did, (nd, kl) in brute.items():
            assert got[did][0] == nd
            assert got[did][1] == pytest.approx(kl, abs=1e-12), did
        # the rare-topic doc is the most novel
        assert got[3][1] == max(v[1] for v in got.values())

    def test_identical_docs_zero_kl(self, spark):
        from neo4j_document_pipeline_spark.operators.corpus import (
            kl_novelty_scores)
        df = spark.createDataFrame(
            [(1, "alpha beta gamma"), (2, "alpha beta gamma")],
            ["doc_id", "text"])
        got = kl_novelty_scores(df, "doc_id", "text").collect()
        for r in got:
            assert r["kl"] == pytest.approx(0.0, abs=1e-12)

    def test_empty_doc_absent(self, spark):
        from neo4j_document_pipeline_spark.operators.corpus import (
            kl_novelty_scores)
        df = spark.createDataFrame(
            [(1, "some words here"), (2, "")], ["doc_id", "text"])
        got = {r["doc_id"] for r in
               kl_novelty_scores(df, "doc_id", "text").collect()}
        assert got == {1}


class TestRocAuc:
    def _auc(self, spark, rows):
        from neo4j_document_pipeline_spark.operators.evaluation import (
            roc_auc)
        df = spark.createDataFrame(rows, "label int, score double")
        return roc_auc(df).first()

    def test_perfect_and_inverted(self, spark):
        perfect = [(1, 0.9), (1, 0.8), (0, 0.2), (0, 0.1)]
        r = self._auc(spark, perfect)
        assert r["auc"] == 1.0
        assert (r["positives"], r["negatives"]) == (2, 2)
        inverted = [(0, 0.9), (0, 0.8), (1, 0.2), (1, 0.1)]
        assert self._auc(spark, inverted)["auc"] == 0.0

    def test_ties_get_half_credit(self, spark):
        # one positive and one negative at the SAME score: AUC 0.5
        assert self._auc(spark, [(1, 0.5), (0, 0.5)])["auc"] == 0.5

    def test_brute_parity_random(self, spark):
        import random
        rng = random.Random(13)
        rows = [(rng.randint(0, 1), round(rng.random(), 2))
                for _ in range(200)]
        if not any(l for l, _ in rows):
            rows[0] = (1, rows[0][1])
        got = self._auc(spark, rows)["auc"]
        pos = [s for l, s in rows if l == 1]
        neg = [s for l, s in rows if l == 0]
        u = sum(1.0 if p > n else 0.5 if p == n else 0.0
                for p in pos for n in neg)
        assert abs(got - u / (len(pos) * len(neg))) < 1e-12

    def test_single_class_raises(self, spark):
        from py4j.protocol import Py4JJavaError
        from pyspark.errors import SparkRuntimeException
        import pytest as _pt
        with _pt.raises((Py4JJavaError, SparkRuntimeException, Exception),
                        match="roc_auc|raise_error|RAISE_ERROR|one positive"):
            self._auc(spark, [(1, 0.5), (1, 0.7)])


class TestChi2Terms:
    def test_known_discriminative_terms(self, spark):
        from neo4j_document_pipeline_spark.operators.classify import (
            chi2_terms)
        rows = []
        for i in range(10):
            rows.append((i, "paris baguette seine common", "fr"))
        for i in range(10, 20):
            rows.append((i, "london thames tube common", "en"))
        df = spark.createDataFrame(rows, "doc_id long, text string, lang string")
        out = chi2_terms(df, "doc_id", "text", "lang", top_k=6)
        by_label = {}
        for r in out.collect():
            by_label.setdefault(r["label"], []).append(r)
        markers = {"paris", "baguette", "seine", "london", "thames", "tube"}
        # all six class markers are perfectly discriminative for BOTH
        # classes (chi2 is symmetric in presence/absence): chi2 = N = 20,
        # present ones with a=10, the other class's with a=0
        for lab, terms in by_label.items():
            assert len(terms) == 6
            assert {t["term"] for t in terms} == markers
            for t in terms:
                assert t["chi2"] == 20.0 and t["df_t"] == 10
                assert t["a"] in (0, 10)
        # 'common' appears everywhere -> chi2 0, never in the top-6
        assert all(r["term"] != "common"
                   for rs in by_label.values() for r in rs)

    def test_brute_parity_random(self, spark):
        import random
        rng = random.Random(21)
        vocab = [f"w{i}" for i in range(12)]
        rows = [(i, " ".join(rng.sample(vocab, rng.randint(2, 6))),
                 rng.choice(["a", "b"])) for i in range(40)]
        from neo4j_document_pipeline_spark.operators.classify import (
            chi2_terms)
        df = spark.createDataFrame(rows, "doc_id long, text string, lang string")
        got = {(r["label"], r["term"]): round(r["chi2"], 9)
               for r in chi2_terms(df, "doc_id", "text", "lang",
                                   top_k=1000, min_doc_freq=1).collect()}
        n = len(rows)
        docs = [(set(t.split()), l) for _, t, l in rows]
        labels = {l for _, l in docs}
        terms = {w for s, _ in docs for w in s}
        want = {}
        for lab in labels:
            n_c = sum(1 for _, l in docs if l == lab)
            for t in terms:
                df_t = sum(1 for s, _ in docs if t in s)
                a = sum(1 for s, l in docs if t in s and l == lab)
                b, c, d = df_t - a, n_c - a, n - df_t - n_c + a
                den = (a + b) * (c + d) * (a + c) * (b + d)
                chi = n * (a * d - b * c) ** 2 / den if den else 0.0
                want[(lab, t)] = round(chi, 9)
        assert got == want

    def test_min_doc_freq_drops_hapax(self, spark):
        from neo4j_document_pipeline_spark.operators.classify import (
            chi2_terms)
        df = spark.createDataFrame(
            [(1, "unique shared", "a"), (2, "shared", "b")],
            "doc_id long, text string, lang string")
        out = chi2_terms(df, "doc_id", "text", "lang", top_k=10,
                         min_doc_freq=2)
        assert {r["term"] for r in out.collect()} == {"shared"}
