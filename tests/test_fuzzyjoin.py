"""Edit-distance join — brute parity, blocking losslessness, buckets."""

import random

import pytest


def _lev(s, t):
    if len(s) < len(t):
        s, t = t, s
    prev = list(range(len(t) + 1))
    for i, cs in enumerate(s, 1):
        cur = [i]
        for j, ct in enumerate(t, 1):
            cur.append(min(prev[j] + 1, cur[j - 1] + 1,
                           prev[j - 1] + (cs != ct)))
        prev = cur
    return prev[-1]


def _brute_pairs(vals, d):
    vs = sorted(set(v for v in vals if v is not None))
    return {(a, b, _lev(a, b)) for i, a in enumerate(vs)
            for b in vs[i + 1:] if _lev(a, b) <= d}


class TestEditDistancePairs:
    def _run(self, spark, vals, **kw):
        from neo4j_document_pipeline_spark.operators.fuzzyjoin import (
            edit_distance_pairs)
        df = spark.createDataFrame([(v,) for v in vals], ["name"])
        return {(r.name_a, r.name_b, r.dist)
                for r in edit_distance_pairs(df, "name", **kw).collect()}

    def test_known_values(self, spark):
        vals = ["kitten", "sitting", "kitte", "mitten", "cat", "cot",
                "ca", "c", ""]
        got = self._run(spark, vals, max_dist=1)
        assert ("kitte", "kitten", 1) in got
        assert ("kitten", "mitten", 1) in got
        assert ("cat", "cot", 1) in got
        assert ("ca", "cat", 1) in got      # short/long boundary
        assert ("c", "ca", 1) in got        # short bucket
        assert ("", "c", 1) in got          # empty string
        assert not any(a == "sitting" or b == "sitting"
                       for a, b, _ in got)  # lev(kitten,sitting)=3
        assert got == _brute_pairs(vals, 1)

    def test_brute_parity_random(self, spark):
        rng = random.Random(7)
        alpha = "abcde"
        vals = ["".join(rng.choice(alpha)
                        for _ in range(rng.randint(0, 9)))
                for _ in range(160)] + [None]
        for d, q in [(1, 2), (2, 2), (1, 3), (2, 3)]:
            got = self._run(spark, vals, max_dist=d, q=q)
            assert got == _brute_pairs(vals, d), (d, q)

    def test_short_bucket_length_order_vs_lex_order(self, spark):
        """Regression: a pair whose lexicographically SMALLER name is
        the LONGER string must still meet in the length-banded join
        (bands are two-sided)."""
        got = self._run(spark, ["azb", "zb"], max_dist=1)
        assert got == {("azb", "zb", 1)}

    def test_duplicates_collapse_no_self_pairs(self, spark):
        got = self._run(spark, ["cat", "cat", "cot", "cot"], max_dist=1)
        assert got == {("cat", "cot", 1)}

    def test_validation(self, spark):
        from neo4j_document_pipeline_spark.operators.fuzzyjoin import (
            edit_distance_pairs)
        df = spark.createDataFrame([("x",)], ["name"])
        with pytest.raises(ValueError):
            edit_distance_pairs(df, "name", max_dist=0)
        with pytest.raises(ValueError):
            edit_distance_pairs(df, "name", q=1)


class TestEditDistanceJoin:
    def test_gazetteer_lookup(self, spark):
        """Dirty mentions vs a clean entity list: equal strings match
        at dist 0, typos at their true distance, misses drop."""
        from neo4j_document_pipeline_spark.operators.fuzzyjoin import (
            edit_distance_join)
        mentions = spark.createDataFrame(
            [("Al-Khwarizmi",), ("Al-Khwarizm",), ("Algebra",),
             ("Bagdad",), ("xyz",), ("ca",)], ["m"])
        gaz = spark.createDataFrame(
            [("Al-Khwarizmi",), ("Baghdad",), ("cat",)], ["e"])
        got = {(r.left_name, r.right_name, r.dist)
               for r in edit_distance_join(
                   mentions, gaz, "m", "e", max_dist=1).collect()}
        assert got == {("Al-Khwarizmi", "Al-Khwarizmi", 0),
                       ("Al-Khwarizm", "Al-Khwarizmi", 1),
                       ("Bagdad", "Baghdad", 1),
                       ("ca", "cat", 1)}

    def test_brute_parity_two_tables(self, spark):
        from neo4j_document_pipeline_spark.operators.fuzzyjoin import (
            edit_distance_join)
        rng = random.Random(11)
        alpha = "abcd"
        lv = ["".join(rng.choice(alpha)
                      for _ in range(rng.randint(0, 7)))
              for _ in range(80)]
        rv = ["".join(rng.choice(alpha)
                      for _ in range(rng.randint(0, 7)))
              for _ in range(80)]
        ldf = spark.createDataFrame([(v,) for v in lv], ["a"])
        rdf = spark.createDataFrame([(v,) for v in rv], ["b"])
        for d in (1, 2):
            got = {(r.left_name, r.right_name, r.dist)
                   for r in edit_distance_join(
                       ldf, rdf, "a", "b", max_dist=d).collect()}
            want = {(a, b, _lev(a, b)) for a in set(lv)
                    for b in set(rv) if _lev(a, b) <= d}
            assert got == want, d
