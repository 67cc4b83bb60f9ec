"""Temporal-KG operators: SCD2 history, fact conflicts, truth discovery."""

import datetime

import pytest


def _ts(day, hour=0):
    return datetime.datetime(2023, 1, day, hour)


class TestScd2History:
    def test_known_value_runs(self, spark):
        from neo4j_document_pipeline_spark.operators.temporalkg import (
            scd2_history)
        rows = [
            ("e1", "ceo", "alice", _ts(1)),
            ("e1", "ceo", "alice", _ts(2)),   # no-change observation
            ("e1", "ceo", "bob", _ts(3)),
            ("e1", "ceo", "bob", _ts(5)),
            ("e1", "ceo", "alice", _ts(7)),   # value returns -> new run
            ("e1", "hq", "berlin", _ts(2)),
            ("e2", "ceo", "carol", _ts(4)),
        ]
        obs = spark.createDataFrame(rows, ["entity", "property", "value", "ts"])
        got = {(r["entity"], r["property"], r["version"]): r.asDict()
               for r in scd2_history(obs).collect()}
        assert len(got) == 5
        r1 = got[("e1", "ceo", 1)]
        assert (r1["value"], r1["valid_from"], r1["valid_to"],
                r1["is_current"]) == ("alice", _ts(1), _ts(3), False)
        r2 = got[("e1", "ceo", 2)]
        assert (r2["value"], r2["valid_from"], r2["valid_to"]) == (
            "bob", _ts(3), _ts(7))
        r3 = got[("e1", "ceo", 3)]
        assert (r3["value"], r3["valid_to"], r3["is_current"]) == (
            "alice", None, True)
        assert got[("e1", "hq", 1)]["is_current"] is True
        assert got[("e2", "ceo", 1)]["value"] == "carol"

    def test_same_ts_disagreement_resolves_to_max(self, spark):
        from neo4j_document_pipeline_spark.operators.temporalkg import (
            scd2_history)
        rows = [("e1", "p", "aaa", _ts(1)), ("e1", "p", "zzz", _ts(1))]
        obs = spark.createDataFrame(rows, ["entity", "property", "value", "ts"])
        out = scd2_history(obs).collect()
        assert len(out) == 1 and out[0]["value"] == "zzz"

    def test_nulls_dropped(self, spark):
        from neo4j_document_pipeline_spark.operators.temporalkg import (
            scd2_history)
        rows = [("e1", "p", None, _ts(1)), ("e1", "p", "x", _ts(2)),
                (None, "p", "y", _ts(3))]
        obs = spark.createDataFrame(rows, ["entity", "property", "value", "ts"])
        out = scd2_history(obs).collect()
        assert len(out) == 1
        assert out[0]["value"] == "x" and out[0]["version"] == 1

    def test_brute_parity_random(self, spark):
        """Pandas groupby replay of the run-length compaction."""
        import random

        from neo4j_document_pipeline_spark.operators.temporalkg import (
            scd2_history)
        rng = random.Random(7)
        rows = []
        for i in range(400):
            rows.append((f"e{rng.randrange(12)}", f"p{rng.randrange(3)}",
                         f"v{rng.randrange(4)}", _ts(1 + rng.randrange(25),
                                                     rng.randrange(24))))
        obs = spark.createDataFrame(rows, ["entity", "property", "value", "ts"])
        got = sorted((r["entity"], r["property"], r["version"], r["value"],
                      r["valid_from"], r["valid_to"])
                     for r in scd2_history(obs).collect())

        # brute: resolve same-ts to max value, then run-length compact
        best = {}
        for e, p, v, t in rows:
            k = (e, p, t)
            if k not in best or v > best[k]:
                best[k] = v
        series = {}
        for (e, p, t), v in sorted(best.items()):
            series.setdefault((e, p), []).append((t, v))
        want = []
        for (e, p), obs_list in series.items():
            obs_list.sort()
            runs = []
            for t, v in obs_list:
                if not runs or runs[-1][1] != v:
                    runs.append((t, v))
            for i, (t, v) in enumerate(runs):
                nxt = runs[i + 1][0] if i + 1 < len(runs) else None
                want.append((e, p, i + 1, v, t, nxt))
        assert got == sorted(want)

    def test_partitioning_invariance(self, spark):
        from neo4j_document_pipeline_spark.operators.temporalkg import (
            scd2_history)
        rows = [("e1", "p", f"v{i % 3}", _ts(1 + i)) for i in range(20)]
        obs = spark.createDataFrame(rows, ["entity", "property", "value", "ts"])
        a = sorted(map(tuple, scd2_history(obs).collect()))
        b = sorted(map(tuple, scd2_history(obs.repartition(13)).collect()))
        assert a == b


class TestFactConflicts:
    def test_known_conflicts(self, spark):
        from neo4j_document_pipeline_spark.operators.temporalkg import (
            fact_conflicts)
        rows = [
            ("s1", "ceo", "alice"), ("s1", "ceo", "bob"), ("s1", "ceo", "bob"),
            ("s2", "ceo", "carol"),               # consistent -> excluded
            ("s1", "hq", "berlin"), ("s1", "hq", "paris"),
            ("s3", "ceo", None),                  # null objects ignored
        ]
        t = spark.createDataFrame(rows, ["subject", "predicate", "object"])
        got = {(r["subject"], r["predicate"]): r.asDict()
               for r in fact_conflicts(t).collect()}
        assert set(got) == {("s1", "ceo"), ("s1", "hq")}
        assert got[("s1", "ceo")]["objects"] == ["alice", "bob"]
        assert got[("s1", "ceo")]["n_objects"] == 2
        assert got[("s1", "ceo")]["n_assertions"] == 3
        assert got[("s1", "hq")]["objects"] == ["berlin", "paris"]


class TestTruthDiscovery:
    def _claims(self, spark):
        # fact f1: value A asserted by 3 sources, B by 1
        # fact f2: contested between the strong sources and a loner
        rows = [
            ("s1", "f1", "A"), ("s2", "f1", "A"), ("s3", "f1", "A"),
            ("s4", "f1", "B"),
            ("s1", "f2", "X"), ("s4", "f2", "Y"),
            ("s2", "f3", "Z"),
        ]
        return spark.createDataFrame(rows, ["source", "fact", "value"])

    def test_brute_parity_two_rounds(self, spark):
        from neo4j_document_pipeline_spark.operators.temporalkg import (
            truth_discovery)
        claims = [("s%d" % (i % 9), "f%d" % (i % 7), "v%d" % (i % 4))
                  for i in range(300)]
        df = spark.createDataFrame(claims, ["source", "fact", "value"])
        got = {(r["fact"], r["value"]): (r["belief"], r["n_sources"],
                                         r["is_winner"])
               for r in truth_discovery(df, rounds=2).collect()}

        edges = sorted(set(claims))
        belief = {}
        for s, f, v in edges:
            belief[(f, v)] = belief.get((f, v), 0) + 1
        trust = {}
        for s, f, v in edges:
            trust[s] = trust.get(s, 0) + belief[(f, v)]
        belief2 = {}
        for s, f, v in edges:
            belief2[(f, v)] = belief2.get((f, v), 0) + trust[s]
        nsrc = {}
        for s, f, v in edges:
            nsrc[(f, v)] = nsrc.get((f, v), 0) + 1
        winners = {}
        for (f, v), b in belief2.items():
            cur = winners.get(f)
            if cur is None or (-b, v) < (-cur[1], cur[0]):
                winners[f] = (v, b)
        want = {(f, v): (b, nsrc[(f, v)], winners[f][0] == v)
                for (f, v), b in belief2.items()}
        assert got == want

    def test_majority_wins_and_trust_propagates(self, spark):
        from neo4j_document_pipeline_spark.operators.temporalkg import (
            truth_discovery)
        out = {(r["fact"], r["value"]): r.asDict()
               for r in truth_discovery(self._claims(spark),
                                        rounds=2).collect()}
        assert out[("f1", "A")]["is_winner"] is True
        assert out[("f1", "B")]["is_winner"] is False
        # f2: s1 earned trust from the f1 majority -> X beats Y
        assert out[("f2", "X")]["is_winner"] is True
        assert out[("f2", "X")]["belief"] > out[("f2", "Y")]["belief"]

    def test_duplicate_assertions_collapse(self, spark):
        from neo4j_document_pipeline_spark.operators.temporalkg import (
            truth_discovery)
        rows = [("s1", "f", "A")] * 5 + [("s2", "f", "B"), ("s3", "f", "B")]
        df = spark.createDataFrame(rows, ["source", "fact", "value"])
        out = {r["value"]: r.asDict()
               for r in truth_discovery(df, rounds=1).collect()}
        assert out["A"]["belief"] == 1 and out["B"]["belief"] == 2
        assert out["B"]["is_winner"] is True

    def test_rounds_bounds(self, spark):
        from neo4j_document_pipeline_spark.operators.temporalkg import (
            truth_discovery)
        with pytest.raises(ValueError):
            truth_discovery(self._claims(spark), rounds=0)
        with pytest.raises(ValueError):
            truth_discovery(self._claims(spark), rounds=5)

    def test_partitioning_invariance(self, spark):
        from neo4j_document_pipeline_spark.operators.temporalkg import (
            truth_discovery)
        df = self._claims(spark)
        a = sorted(map(tuple, truth_discovery(df, rounds=3).collect()))
        b = sorted(map(tuple,
                       truth_discovery(df.repartition(11), rounds=3).collect()))
        assert a == b
