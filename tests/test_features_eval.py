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
