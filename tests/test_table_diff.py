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
