"""resolve_pointer_chains — terminals, log-round doubling, cycles,
functional-map guard."""

import pytest


class TestResolvePointerChains:
    def test_chains_resolve_to_terminals(self, spark):
        from neo4j_document_pipeline_spark.operators.components import (
            resolve_pointer_chains)
        # two chains and one direct edge: a->b->c->T1, x->T2
        e = spark.createDataFrame(
            [("a", "b"), ("b", "c"), ("c", "T1"), ("x", "T2")],
            ["src", "dst"])
        got = {r["src"]: r["resolved"]
               for r in resolve_pointer_chains(e).collect()}
        assert got == {"a": "T1", "b": "T1", "c": "T1", "x": "T2"}

    def test_long_chain_needs_only_log_rounds(self, spark):
        """A 9-hop chain resolves within 4 doubling rounds (2^4 >= 9)
        and provably does NOT within 2 (2^2 < 9) — the doubling, not a
        per-hop walk, is what the operator buys."""
        from neo4j_document_pipeline_spark.operators.components import (
            resolve_pointer_chains)
        e = spark.createDataFrame(
            [(f"n{i}", f"n{i + 1}") for i in range(9)], ["src", "dst"])
        got = {r["src"]: r["resolved"]
               for r in resolve_pointer_chains(e, max_iter=4).collect()}
        assert all(v == "n9" for v in got.values()) and len(got) == 9
        with pytest.raises(RuntimeError, match="unresolved"):
            resolve_pointer_chains(e, max_iter=2)

    def test_cycle_raises_loudly(self, spark):
        from neo4j_document_pipeline_spark.operators.components import (
            resolve_pointer_chains)
        e = spark.createDataFrame(
            [("a", "b"), ("b", "c"), ("c", "a"), ("x", "T")],
            ["src", "dst"])
        with pytest.raises(RuntimeError, match="cycle"):
            resolve_pointer_chains(e, max_iter=6)

    def test_conflicting_targets_fail_the_job(self, spark):
        """Duplicate source with two different targets must raise via
        the in-plan guard, never resolve to a partition-order winner.
        Exact duplicate rows and self-redirects are fine."""
        from neo4j_document_pipeline_spark.operators.components import (
            resolve_pointer_chains)
        ok = spark.createDataFrame(
            [("a", "T"), ("a", "T"), ("s", "s"), ("b", "T")],
            ["src", "dst"])
        got = {r["src"]: r["resolved"]
               for r in resolve_pointer_chains(ok).collect()}
        assert got == {"a": "T", "b": "T"}  # self-redirect dropped
        bad = spark.createDataFrame(
            [("a", "T1"), ("a", "T2")], ["src", "dst"])
        with pytest.raises(Exception, match="functional"):
            resolve_pointer_chains(bad).collect()
