"""table_diff — add/remove/change classes, null-safety, validation."""

import pytest


class TestTableDiff:
    def test_all_change_classes(self, spark):
        from neo4j_document_pipeline_spark.operators.admin import (
            table_diff)
        old = spark.createDataFrame(
            [(1, "a", 10), (2, "b", 20), (3, "c", 30), (4, "d", 40)],
            ["k", "s", "v"])
        new = spark.createDataFrame(
            [(1, "a", 10), (2, "B", 20), (3, "c", 99), (5, "e", 50)],
            ["k", "s", "v"])
        got = {r["k"]: (r["change"], list(r["changed_cols"]))
               for r in table_diff(old, new, ["k"], ["s", "v"]).collect()}
        assert got == {
            2: ("changed", ["s"]),
            3: ("changed", ["v"]),
            4: ("removed", []),
            5: ("added", []),
        }  # key 1 unchanged -> absent

    def test_null_safe_comparison(self, spark):
        """null -> value and value -> null are changes; null -> null
        is not."""
        from neo4j_document_pipeline_spark.operators.admin import (
            table_diff)
        old = spark.createDataFrame(
            [(1, None), (2, "x"), (3, None)], ["k", "s"])
        new = spark.createDataFrame(
            [(1, "now"), (2, None), (3, None)], ["k", "s"])
        got = {r["k"]: (r["change"], list(r["changed_cols"]))
               for r in table_diff(old, new, ["k"], ["s"]).collect()}
        assert got == {1: ("changed", ["s"]), 2: ("changed", ["s"])}

    def test_validation(self, spark):
        from neo4j_document_pipeline_spark.operators.admin import (
            table_diff)
        d = spark.createDataFrame([(1, "a")], ["k", "s"])
        with pytest.raises(ValueError):
            table_diff(d, d, [], ["s"])
        with pytest.raises(ValueError):
            table_diff(d, d, ["k"], [])


class TestChangesRoundtrip:
    def _frames(self, spark):
        old = spark.createDataFrame(
            [(1, "a", 10.0), (2, "b", 20.0), (3, "c", 30.0),
             (4, "d", 40.0), (5, None, 50.0)],
            "k int, s string, v double")
        new = spark.createDataFrame(
            [(1, "a", 10.0),          # unchanged
             (2, "B", 20.0),          # changed s
             (4, "d", 41.0),          # changed v
             (5, None, 50.0),         # unchanged (null-safe)
             (6, "f", 60.0)],         # added; 3 removed
            "k int, s string, v double")
        return old, new

    def test_feed_contents(self, spark):
        from neo4j_document_pipeline_spark.operators.admin import (
            table_changes)
        old, new = self._frames(spark)
        got = {r["k"]: (r["op"], r["s"], r["v"]) for r in
               table_changes(old, new, ["k"], ["s", "v"]).collect()}
        assert got == {2: ("upsert", "B", 20.0),
                       3: ("delete", None, None),
                       4: ("upsert", "d", 41.0),
                       6: ("upsert", "f", 60.0)}

    def test_apply_reconstructs_new_exactly(self, spark):
        from neo4j_document_pipeline_spark.operators.admin import (
            apply_changes, table_changes)
        old, new = self._frames(spark)
        feed = table_changes(old, new, ["k"], ["s", "v"])
        got = sorted(map(tuple, apply_changes(
            old, feed, ["k"], ["s", "v"]).collect()))
        want = sorted(map(tuple, new.select("k", "s", "v").collect()))
        assert got == want

    def test_empty_feed_is_identity(self, spark):
        from neo4j_document_pipeline_spark.operators.admin import (
            apply_changes, table_changes)
        old, _ = self._frames(spark)
        feed = table_changes(old, old, ["k"], ["s", "v"])
        assert feed.count() == 0
        got = sorted(map(tuple, apply_changes(
            old, feed, ["k"], ["s", "v"]).collect()))
        assert got == sorted(map(tuple,
                                 old.select("k", "s", "v").collect()))

    def test_validation(self, spark):
        import pytest as _pt

        from neo4j_document_pipeline_spark.operators.admin import (
            apply_changes, table_changes)
        old, new = self._frames(spark)
        with _pt.raises(ValueError):
            table_changes(old, new, [], ["s"])
        with _pt.raises(ValueError):
            apply_changes(old, new, ["k"], [])
