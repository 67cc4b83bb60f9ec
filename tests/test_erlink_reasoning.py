"""Fellegi–Sunter record-linkage scoring + ontology reasoning."""

import math

import pytest


# ---------------------------------------------------------------------------
# Fellegi–Sunter
# ---------------------------------------------------------------------------

class TestUProbabilities:
    def test_exact_histogram_formula(self, spark):
        from neo4j_document_pipeline_spark.operators.erlink import (
            u_probabilities)
        # city: a,a,a,b  -> agree pairs 3*2 + 1*0 = 6 of N(N-1)=12 -> 0.5
        # zip:  1,2,3,4  -> 0
        rows = [(1, "a", "1"), (2, "a", "2"), (3, "a", "3"), (4, "b", "4")]
        df = spark.createDataFrame(rows, ["id", "city", "zip"])
        got = {r["field"]: r["u"]
               for r in u_probabilities(df, "id", ["city", "zip"]).collect()}
        assert got["city"] == pytest.approx(0.5)
        assert got["zip"] == pytest.approx(0.0)

    def test_nulls_never_agree_but_count_in_n(self, spark):
        from neo4j_document_pipeline_spark.operators.erlink import (
            u_probabilities)
        # 4 records, city a,a,null,null: agree pairs 2 of 12 -> 1/6
        rows = [(1, "a"), (2, "a"), (3, None), (4, None)]
        df = spark.createDataFrame(rows, ["id", "city"])
        got = u_probabilities(df, "id", ["city"]).collect()
        assert got[0]["u"] == pytest.approx(2 / 12)


class TestFellegiSunter:
    def _records(self, spark):
        rows = [
            (1, "berlin", "10115"),
            (2, "berlin", "10115"),
            (3, "berlin", "20095"),
            (4, "munich", "80331"),
        ]
        return spark.createDataFrame(rows, ["id", "city", "zip"])

    def test_known_weights(self, spark):
        from neo4j_document_pipeline_spark.operators.erlink import (
            fellegi_sunter_scores)
        records = self._records(spark)
        pairs = spark.createDataFrame([(1, 2), (1, 3), (1, 4)],
                                      ["id1", "id2"])
        m = {"city": 0.9, "zip": 0.8}
        out = {(r["id1"], r["id2"]): r.asDict()
               for r in fellegi_sunter_scores(
                   records, pairs, "id", ["city", "zip"], m,
                   prior=0.1).collect()}
        # u_city: berlin 3*2=6, munich 0 -> 6/12 = 0.5
        # u_zip : 10115 2*1=2 -> 2/12 = 1/6
        u_city, u_zip = 0.5, 2 / 12
        w12 = math.log2(0.9 / u_city) + math.log2(0.8 / u_zip)
        w13 = math.log2(0.9 / u_city) + math.log2(0.2 / (1 - u_zip))
        w14 = math.log2(0.1 / (1 - u_city)) + math.log2(0.2 / (1 - u_zip))
        assert out[(1, 2)]["match_weight"] == pytest.approx(w12)
        assert out[(1, 3)]["match_weight"] == pytest.approx(w13)
        assert out[(1, 4)]["match_weight"] == pytest.approx(w14)
        assert (out[(1, 2)]["agree_city"], out[(1, 2)]["agree_zip"]) == (1, 1)
        assert (out[(1, 3)]["agree_city"], out[(1, 3)]["agree_zip"]) == (1, 0)
        # posterior: odds = 2^(w + log2(prior odds))
        lo = w12 + math.log2(0.1 / 0.9)
        assert out[(1, 2)]["match_probability"] == pytest.approx(
            2 ** lo / (2 ** lo + 1))
        # monotone: full agreement > partial > none
        assert (out[(1, 2)]["match_probability"]
                > out[(1, 3)]["match_probability"]
                > out[(1, 4)]["match_probability"])

    def test_null_field_contributes_nothing(self, spark):
        from neo4j_document_pipeline_spark.operators.erlink import (
            fellegi_sunter_scores)
        rows = [(1, "berlin", None), (2, "berlin", "10115"),
                (3, "munich", "10115"), (4, "munich", "99999")]
        records = spark.createDataFrame(rows, ["id", "city", "zip"])
        pairs = spark.createDataFrame([(1, 2)], ["id1", "id2"])
        out = fellegi_sunter_scores(
            records, pairs, "id", ["city", "zip"],
            {"city": 0.9, "zip": 0.8}).collect()[0]
        assert out["agree_zip"] == -1
        # weight is the city term alone: u_city = (2*1 + 2*1)/12 = 1/3
        assert out["match_weight"] == pytest.approx(math.log2(0.9 / (1 / 3)))

    def test_validation(self, spark):
        from neo4j_document_pipeline_spark.operators.erlink import (
            fellegi_sunter_scores)
        records = self._records(spark)
        pairs = spark.createDataFrame([(1, 2)], ["id1", "id2"])
        with pytest.raises(ValueError, match="missing field"):
            fellegi_sunter_scores(records, pairs, "id", ["city"], {})
        with pytest.raises(ValueError, match="must be in"):
            fellegi_sunter_scores(records, pairs, "id", ["city"],
                                  {"city": 1.0})
        with pytest.raises(ValueError, match="prior"):
            fellegi_sunter_scores(records, pairs, "id", ["city"],
                                  {"city": 0.9}, prior=0.0)

    def test_brute_parity_random(self, spark):
        import random
        from neo4j_document_pipeline_spark.operators.erlink import (
            fellegi_sunter_scores)
        rng = random.Random(7)
        rows = [(i, rng.choice("abc"), rng.choice("wxyz"),
                 str(rng.randint(0, 2))) for i in range(40)]
        records = spark.createDataFrame(rows, ["id", "f1", "f2", "f3"])
        pair_rows = [(a, b) for a in range(40) for b in range(a + 1, 40)
                     if rng.random() < 0.1]
        pairs = spark.createDataFrame(pair_rows, ["id1", "id2"])
        m = {"f1": 0.95, "f2": 0.9, "f3": 0.7}
        fields = ["f1", "f2", "f3"]
        got = {(r["id1"], r["id2"]): r["match_weight"]
               for r in fellegi_sunter_scores(
                   records, pairs, "id", fields, m).collect()}
        # brute force
        N = len(rows)
        by_id = {r[0]: r for r in rows}
        for (a, b) in pair_rows:
            w = 0.0
            for fi, f in enumerate(fields, start=1):
                vals = [r[fi] for r in rows]
                counts = {}
                for v in vals:
                    counts[v] = counts.get(v, 0) + 1
                u = sum(c * (c - 1) for c in counts.values()) / (N * (N - 1))
                u = min(max(u, 1e-9), 1 - 1e-9)
                if by_id[a][fi] == by_id[b][fi]:
                    w += math.log2(m[f] / u)
                else:
                    w += math.log2((1 - m[f]) / (1 - u))
            assert got[(a, b)] == pytest.approx(w), (a, b)


# ---------------------------------------------------------------------------
# transitive closure + type inference
# ---------------------------------------------------------------------------

class TestTransitiveClosure:
    def _tc(self, spark, edges, **kw):
        from neo4j_document_pipeline_spark.operators.reasoning import (
            transitive_closure)
        df = spark.createDataFrame(edges, ["src", "dst"])
        return {(r["src"], r["dst"]): r["dist"]
                for r in transitive_closure(df, **kw).collect()}

    def test_chain(self, spark):
        got = self._tc(spark, [("a", "b"), ("b", "c"), ("c", "d")])
        assert got == {("a", "b"): 1, ("b", "c"): 1, ("c", "d"): 1,
                       ("a", "c"): 2, ("b", "d"): 2, ("a", "d"): 3}

    def test_dag_min_dist(self, spark):
        # a->b->c plus shortcut a->c: dist(a,c) must be 1
        got = self._tc(spark, [("a", "b"), ("b", "c"), ("a", "c")])
        assert got[("a", "c")] == 1

    def test_cycle_converges(self, spark):
        got = self._tc(spark, [("a", "b"), ("b", "a")])
        assert got == {("a", "b"): 1, ("b", "a"): 1,
                       ("a", "a"): 2, ("b", "b"): 2}

    def test_max_iters_raises_loudly(self, spark):
        chain = [(str(i), str(i + 1)) for i in range(6)]
        with pytest.raises(RuntimeError, match="did not converge"):
            self._tc(spark, chain, max_iters=3)
        # and the same chain converges when the cap is sufficient
        got = self._tc(spark, chain, max_iters=6)
        assert got[("0", "6")] == 6

    def test_duplicate_and_null_edges_ignored(self, spark):
        got = self._tc(spark, [("a", "b"), ("a", "b"), ("a", None),
                               (None, "b")])
        assert got == {("a", "b"): 1}


class TestInferTypes:
    def test_diamond_hierarchy(self, spark):
        from neo4j_document_pipeline_spark.operators.reasoning import (
            infer_types)
        inst = spark.createDataFrame(
            [("x", "sedan"), ("y", "vehicle")], ["entity", "type"])
        sub = spark.createDataFrame(
            [("sedan", "car"), ("car", "vehicle"), ("truck", "vehicle")],
            ["src", "dst"])
        got = {(r["entity"], r["type"]): r["direct"]
               for r in infer_types(inst, sub).collect()}
        assert got == {
            ("x", "sedan"): True, ("x", "car"): False,
            ("x", "vehicle"): False, ("y", "vehicle"): True,
        }

    def test_asserted_wins_over_inferred(self, spark):
        # entity asserted at BOTH levels: one row, direct=True
        from neo4j_document_pipeline_spark.operators.reasoning import (
            infer_types)
        inst = spark.createDataFrame(
            [("x", "sedan"), ("x", "car")], ["entity", "type"])
        sub = spark.createDataFrame([("sedan", "car")], ["src", "dst"])
        got = {(r["entity"], r["type"]): r["direct"]
               for r in infer_types(inst, sub).collect()}
        assert got == {("x", "sedan"): True, ("x", "car"): True}


class TestTopologicalLevels:
    def _lv(self, spark, pairs, **kw):
        e = spark.createDataFrame(pairs, "src string, dst string")
        from neo4j_document_pipeline_spark.operators.reasoning import (
            topological_levels)
        return {r["node"]: r["level"]
                for r in topological_levels(e, **kw).collect()}

    def test_diamond_longest_path(self, spark):
        # a->b->d and a->d: d's level is the LONGEST chain (2), not 1
        got = self._lv(spark, [("a", "b"), ("b", "d"), ("a", "d"),
                               ("a", "c")])
        assert got == {"a": 0, "b": 1, "c": 1, "d": 2}

    def test_multiple_sources_and_isolated_chain(self, spark):
        got = self._lv(spark, [("s1", "x"), ("s2", "x"), ("p", "q")])
        assert got == {"s1": 0, "s2": 0, "p": 0, "x": 1, "q": 1}

    def test_cycle_raises_loudly(self, spark):
        with pytest.raises(RuntimeError, match="cycle"):
            self._lv(spark, [("a", "b"), ("b", "c"), ("c", "a"),
                             ("s", "a")])

    def test_max_iters_raises_on_deep_dag(self, spark):
        chain = [(f"n{i}", f"n{i+1}") for i in range(10)]
        with pytest.raises(RuntimeError, match="max_iters"):
            self._lv(spark, chain, max_iters=5)
        got = self._lv(spark, chain, max_iters=10)
        assert got[f"n{10}"] == 10

    def test_brute_parity_random_dag(self, spark):
        import random
        rng = random.Random(7)
        n = 40
        edges = []
        for _ in range(120):
            a, b = sorted(rng.sample(range(n), 2))
            edges.append((f"v{a:02d}", f"v{b:02d}"))  # a<b => acyclic
        got = self._lv(spark, edges)
        # brute longest-path levels
        from collections import defaultdict
        preds = defaultdict(set)
        nodes = set()
        for s, d in edges:
            preds[d].add(s)
            nodes.update((s, d))
        level = {}
        while len(level) < len(nodes):
            for v in nodes:
                if v in level:
                    continue
                if all(p in level for p in preds[v]):
                    level[v] = (1 + max((level[p] for p in preds[v]),
                                        default=-1))
        assert got == level
