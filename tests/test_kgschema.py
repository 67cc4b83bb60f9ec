"""predicate_cardinality — hand-checkable classes, distinct collapse."""


class TestPredicateCardinality:
    def test_all_four_classes(self, spark):
        from neo4j_document_pipeline_spark.operators.kgschema import (
            predicate_cardinality)
        rows = [
            # 1:1 — bijection
            ("a1", "id", "x1"), ("a2", "id", "x2"),
            # N:1 — functional, shared object
            ("o1", "by", "c1"), ("o2", "by", "c1"), ("o3", "by", "c2"),
            # 1:N — inverse-functional
            ("c1", "owns", "o1"), ("c1", "owns", "o2"), ("c2", "owns", "o3"),
            # N:M
            ("d1", "tag", "t1"), ("d1", "tag", "t2"),
            ("d2", "tag", "t1"), ("d2", "tag", "t3"),
        ]
        t = spark.createDataFrame(rows, ["subject", "predicate", "object"])
        got = {r["predicate"]: r.asDict()
               for r in predicate_cardinality(t).collect()}
        assert got["id"]["card_class"] == "1:1"
        assert got["by"]["card_class"] == "N:1"
        assert got["owns"]["card_class"] == "1:N"
        assert got["tag"]["card_class"] == "N:M"
        assert (got["by"]["n_triples"], got["by"]["n_subjects"],
                got["by"]["n_objects"]) == (3, 3, 2)
        assert (got["by"]["max_out"], got["by"]["max_in"]) == (1, 2)
        assert (got["owns"]["max_out"], got["owns"]["max_in"]) == (2, 1)
        assert (got["tag"]["max_out"], got["tag"]["max_in"]) == (2, 2)
        assert got["owns"]["avg_out"] == 1.5

    def test_distinct_collapses_provenance_multiplicity(self, spark):
        """The same assertion from three documents must not turn a
        functional predicate into a fake 1:N."""
        from neo4j_document_pipeline_spark.operators.kgschema import (
            predicate_cardinality)
        rows = [("s1", "by", "c1")] * 3 + [("s2", "by", "c2")]
        t = spark.createDataFrame(rows, ["subject", "predicate", "object"])
        d = predicate_cardinality(t).collect()[0]
        assert d["n_triples"] == 2 and d["max_out"] == 1
        assert d["card_class"] == "1:1"
        raw = predicate_cardinality(t, distinct_triples=False).collect()[0]
        assert raw["n_triples"] == 4 and raw["max_out"] == 3
