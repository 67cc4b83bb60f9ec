"""Column profiler — brute parity, null/numeric semantics, validation."""

import hashlib

import pytest


def _u(salt, sval):
    h = hashlib.sha256(f"{salt}:{sval}".encode()).hexdigest()
    return int(h[:8], 16) / 4294967296.0


class TestProfileColumns:
    def _df(self, spark):
        rows = [
            (1, "alpha", 10.5, None),
            (2, "beta", None, "x"),
            (3, "alpha", -2.0, "y"),
            (4, None, 7.25, "y"),
            (5, "gamma", 10.5, None),
        ]
        return spark.createDataFrame(
            rows, ["id", "name", "score", "tag"])

    def test_counts_nulls_minmax_mean(self, spark):
        from neo4j_document_pipeline_spark.operators.profile import (
            profile_columns)
        got = {r.col_name: r for r in
               profile_columns(self._df(spark)).collect()}
        assert set(got) == {"id", "name", "score", "tag"}
        assert got["name"].n_rows == 5 and got["name"].n_null == 1
        assert abs(got["name"].null_frac - 0.2) < 1e-12
        assert got["name"].min_str == "alpha"
        assert got["name"].max_str == "gamma"
        assert got["name"].min_num is None  # string column: no numeric
        # numeric column: typed stats + exact mean (sum/count)
        s = got["score"]
        assert s.min_num == -2.0 and s.max_num == 10.5
        assert abs(s.mean_num - (10.5 - 2.0 + 7.25 + 10.5) / 4) < 1e-12
        assert s.n_null == 1
        # ints profile numerically too
        assert got["id"].min_num == 1.0 and got["id"].max_num == 5.0

    def test_distinct_exact_below_k(self, spark):
        from neo4j_document_pipeline_spark.operators.profile import (
            profile_columns)
        got = {r.col_name: r for r in
               profile_columns(self._df(spark), k=64).collect()}
        # name: alpha/beta/gamma -> 3 distinct, exact
        assert got["name"].distinct_exact is True
        assert got["name"].distinct_est == 3.0
        # score: 10.5, -2.0, 7.25 -> 3 distinct (stringified)
        assert got["score"].distinct_est == 3.0
        assert got["tag"].distinct_est == 2.0

    def test_kmv_estimate_replay_above_k(self, spark):
        """Past saturation the estimate is (k-1)/h_k of the engine's
        sha256 bottom-k — replayed here in pure python."""
        from neo4j_document_pipeline_spark.operators.profile import (
            profile_columns)
        k = 8
        vals = [f"v{i}" for i in range(100)]
        df = spark.createDataFrame([(v,) for v in vals], ["c"])
        got = profile_columns(df, k=k, salt="v1").collect()[0]
        us = sorted(_u("v1", v) for v in set(vals))
        want = (k - 1) / us[k - 1]
        assert got.distinct_exact is False
        assert abs(got.distinct_est - want) < 1e-9

    def test_all_null_column(self, spark):
        from neo4j_document_pipeline_spark.operators.profile import (
            profile_columns)
        df = spark.createDataFrame([(1, None), (2, None)],
                                   "id INT, v STRING")
        got = {r.col_name: r for r in profile_columns(df).collect()}
        v = got["v"]
        assert v.n_null == 2 and v.null_frac == 1.0
        assert v.distinct_est == 0.0 and v.distinct_exact is True
        assert v.min_str is None and v.max_str is None

    def test_validation(self, spark):
        from neo4j_document_pipeline_spark.operators.profile import (
            profile_columns)
        df = self._df(spark)
        with pytest.raises(ValueError):
            profile_columns(df, ["nope"])
        with pytest.raises(ValueError):
            profile_columns(df, [])


class TestPsiDrift:
    def _run(self, spark, base, cur, **kw):
        from neo4j_document_pipeline_spark.operators.profile import (
            psi_drift)
        b = spark.createDataFrame([(x,) for x in base], "lang string")
        c = spark.createDataFrame([(x,) for x in cur], "lang string")
        return psi_drift(b, c, "lang", **kw)

    def test_identical_distributions_are_zero(self, spark):
        rows = ["en"] * 6 + ["de"] * 3 + ["zh"]
        out = self._run(spark, rows, rows).collect()
        assert all(abs(r["psi_term"]) < 1e-12 for r in out)

    def test_brute_parity_and_new_category(self, spark):
        import math
        base = ["en"] * 8 + ["de"] * 2
        cur = ["en"] * 5 + ["de"] * 2 + ["ru"] * 3  # ru is NEW
        out = {r["category"]: r for r in
               self._run(spark, base, cur, smoothing=0.5).collect()}
        k, s = 3, 0.5
        tb, tc = len(base), len(cur)
        for cat in ("en", "de", "ru"):
            nb = base.count(cat)
            nc = cur.count(cat)
            p = (nb + s) / (tb + s * k)
            q = (nc + s) / (tc + s * k)
            want = (p - q) * math.log(p / q)
            assert abs(out[cat]["psi_term"] - want) < 1e-12, cat
            assert (out[cat]["n_base"], out[cat]["n_cur"]) == (nb, nc)
        # the vanished/new category carries the largest drift term
        assert out["ru"]["psi_term"] == max(r["psi_term"]
                                            for r in out.values())

    def test_null_is_one_category(self, spark):
        out = self._run(spark, ["en", None], ["en", None, None]).collect()
        cats = [r["category"] for r in out]
        assert cats.count(None) == 1
        nullrow = next(r for r in out if r["category"] is None)
        assert (nullrow["n_base"], nullrow["n_cur"]) == (1, 2)

    def test_smoothing_validation(self, spark):
        import pytest as _pt
        with _pt.raises(ValueError):
            self._run(spark, ["a"], ["a"], smoothing=0.0)
