"""market_basket_rules + power_law_alpha — brute parity, known values."""

import math

import pytest


class TestMarketBasketRules:
    BASKETS = [
        (1, "beer"), (1, "chips"), (1, "salsa"),
        (2, "beer"), (2, "chips"),
        (3, "beer"), (3, "bread"),
        (4, "chips"), (4, "salsa"),
        (5, "bread"), (5, "milk"), (5, "milk"),  # dup row collapses
    ]

    def test_known_values(self, spark):
        from neo4j_document_pipeline_spark.operators.assoc import (
            market_basket_rules)
        b = spark.createDataFrame(self.BASKETS, ["basket", "item"])
        got = {(r["antecedent"], r["consequent"]):
               (r["pair_count"], r["support"], r["confidence"], r["lift"])
               for r in market_basket_rules(b).collect()}
        # beer&chips in baskets 1,2; c(beer)=3, c(chips)=3, n=5
        assert got[("beer", "chips")] == (
            2, round(2 / 5, 6), round(2 / 3, 6),
            round((2 / 3) / (3 / 5), 6))
        assert got[("chips", "beer")][2] == round(2 / 3, 6)
        # chips&salsa in baskets 1,4; c(salsa)=2 -> confidence 1.0
        assert got[("salsa", "chips")] == (2, 0.4, 1.0, round(1 / 0.6, 6))
        # pairs below min_pair_count=2 absent (beer,salsa only basket 1)
        assert ("beer", "salsa") not in got

    def test_brute_parity(self, spark):
        import random
        from collections import Counter
        from decimal import ROUND_HALF_UP, Decimal
        from neo4j_document_pipeline_spark.operators.assoc import (
            market_basket_rules)

        def round6(x):  # Spark/DuckDB round HALF_UP; python round banks
            return float(Decimal(repr(x)).quantize(
                Decimal("0.000001"), rounding=ROUND_HALF_UP))
        rng = random.Random(11)
        rows = [(rng.randrange(30), f"i{rng.randrange(12)}")
                for _ in range(300)]
        b = spark.createDataFrame(rows, ["basket", "item"])
        got = sorted(map(tuple, market_basket_rules(
            b, min_pair_count=2, min_confidence=0.1).collect()))
        dist = set(rows)
        n = len({bk for bk, _ in dist})
        ic = Counter(it for _, it in dist)
        pc = Counter()
        by_bk = {}
        for bk, it in dist:
            by_bk.setdefault(bk, set()).add(it)
        for items in by_bk.values():
            for a in items:
                for c in items:
                    if a != c:
                        pc[(a, c)] += 1
        want = []
        for (a, c), k in pc.items():
            if k < 2:
                continue
            conf = round6(k / ic[a])
            if conf >= 0.1:
                want.append((a, c, k, round6(k / n), conf,
                             round6((k / ic[a]) / (ic[c] / n))))
        assert got == sorted(want)

    def test_validation(self, spark):
        from neo4j_document_pipeline_spark.operators.assoc import (
            market_basket_rules)
        b = spark.createDataFrame([(1, "a")], ["basket", "item"])
        with pytest.raises(ValueError):
            market_basket_rules(b, min_pair_count=0)


class TestPowerLawAlpha:
    def test_known_values_star(self, spark):
        """A 6-leaf star at dmin=2: only the hub survives (d=6), so
        alpha = 1 + 1/ln(6/1.5)."""
        from neo4j_document_pipeline_spark.operators.graphalgo import (
            power_law_alpha)
        e = spark.createDataFrame([("h", f"l{i}") for i in range(6)],
                                  ["u", "v"])
        r = power_law_alpha(e, dmin=2).collect()[0]
        assert r["n_tail"] == 1 and r["dmin"] == 2
        assert r["alpha"] == round(1 + 1 / math.log(6 / 1.5), 6)

    def test_brute_parity(self, spark):
        import random
        from collections import Counter
        from neo4j_document_pipeline_spark.operators.graphalgo import (
            power_law_alpha)
        rng = random.Random(5)
        edges = [(f"n{rng.randrange(25)}", f"n{rng.randrange(25)}")
                 for _ in range(120)]
        e = spark.createDataFrame(edges, ["u", "v"])
        canon = {(min(a, b), max(a, b)) for a, b in edges if a != b}
        deg = Counter()
        for a, b in canon:
            deg[a] += 1
            deg[b] += 1
        tail = [d for d in deg.values() if d >= 3]
        want = round(1 + len(tail)
                     / sum(math.log(d / 2.5) for d in tail), 6)
        r = power_law_alpha(e, dmin=3).collect()[0]
        assert r["n_tail"] == len(tail)
        assert abs(r["alpha"] - want) <= 1e-6
        with pytest.raises(ValueError):
            power_law_alpha(e, dmin=0)
