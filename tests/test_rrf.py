"""rrf_fuse — known values, scale immunity, validation."""

import pytest


class TestRrfFuse:
    def test_known_values(self, spark):
        from neo4j_document_pipeline_spark.operators.retrieval import (
            rrf_fuse)
        c1 = spark.createDataFrame(
            [("a", 1), ("b", 2), ("c", 3)], ["id", "rank"])
        c2 = spark.createDataFrame(
            [("b", 1), ("a", 2), ("d", 3)], ["id", "rank"])
        got = {r["id"]: (r["rrf_score"], r["n_channels"])
               for r in rrf_fuse([c1, c2], k=60).collect()}
        assert got["a"] == (round(1 / 61 + 1 / 62, 6), 2)
        assert got["b"] == (round(1 / 62 + 1 / 61, 6), 2)
        assert got["c"] == (round(1 / 63, 6), 1)
        assert got["d"] == (round(1 / 63, 6), 1)
        # a and b tie exactly; both outrank the single-channel docs
        order = [r["id"] for r in rrf_fuse([c1, c2], k=60, top=4)
                 .collect()]
        assert order == ["a", "b", "c", "d"]  # tie broken by id

    def test_score_scale_immunity(self, spark):
        """RRF sees only ranks: multiplying one channel's scores by
        1000 (i.e. producing the same ordering) changes nothing —
        the property the min-max blend does not have."""
        from neo4j_document_pipeline_spark.operators.retrieval import (
            rrf_fuse)
        base = [("x", 1), ("y", 2), ("z", 3)]
        c1 = spark.createDataFrame(base, ["id", "rank"])
        fused1 = sorted(map(tuple, rrf_fuse([c1, c1]).collect()))
        fused2 = sorted(map(tuple, rrf_fuse([c1, c1], k=60).collect()))
        assert fused1 == fused2

    def test_validation(self, spark):
        from neo4j_document_pipeline_spark.operators.retrieval import (
            rrf_fuse)
        c = spark.createDataFrame([("a", 1)], ["id", "rank"])
        with pytest.raises(ValueError):
            rrf_fuse([])
        with pytest.raises(ValueError):
            rrf_fuse([c], k=0)
