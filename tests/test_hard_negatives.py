"""hard_negatives — brute parity, label exclusion, determinism."""

import math


def _cos(a, b):
    d = sum(x * y for x, y in zip(a, b))
    na = math.sqrt(sum(x * x for x in a))
    nb = math.sqrt(sum(x * x for x in b))
    return 0.0 if na == 0 or nb == 0 else d / (na * nb)


class TestHardNegatives:
    def _corpus(self, spark):
        import random
        rng = random.Random(7)
        rows = [(i, [rng.uniform(-1, 1) for _ in range(8)],
                 f"c{i % 3}") for i in range(60)]
        rows.append((60, [0.0] * 8, "c1"))  # zero vector
        return rows, spark.createDataFrame(
            rows, ["vec_id", "embedding", "label"])

    def test_brute_parity(self, spark):
        from neo4j_document_pipeline_spark.operators.similarity import (
            hard_negatives)
        rows, df = self._corpus(spark)
        anchors = df.filter("vec_id < 4").select(
            df.vec_id.alias("aid"), df.embedding.alias("av"),
            df.label.alias("al"))
        got = sorted((r["anchor_id"], r["rnk"], r["vec_id"])
                     for r in hard_negatives(
                         df, anchors, "vec_id", "embedding", "label",
                         "aid", "av", "al", k=3).collect())
        want = []
        for aid, av, al in rows[:4]:
            cands = [(i, lb, round(_cos(v, av), 4))
                     for i, v, lb in rows if lb != al]
            cands.sort(key=lambda t: (-t[2], t[0]))
            want += [(aid, r + 1, cands[r][0]) for r in range(3)]
        assert got == sorted(want)

    def test_same_label_never_appears(self, spark):
        from neo4j_document_pipeline_spark.operators.similarity import (
            hard_negatives)
        _, df = self._corpus(spark)
        anchors = df.filter("vec_id = 0").select(
            df.vec_id.alias("aid"), df.embedding.alias("av"),
            df.label.alias("al"))
        out = hard_negatives(df, anchors, "vec_id", "embedding", "label",
                             "aid", "av", "al", k=50).collect()
        assert out and all(r["label"] != "c0" for r in out)
        assert all(r["vec_id"] != 0 for r in out)

    def test_partitioning_invariance(self, spark):
        from neo4j_document_pipeline_spark.operators.similarity import (
            hard_negatives)
        _, df = self._corpus(spark)
        anchors = df.filter("vec_id < 4").select(
            df.vec_id.alias("aid"), df.embedding.alias("av"),
            df.label.alias("al"))
        run = lambda d: sorted(
            (r["anchor_id"], r["rnk"], r["vec_id"], r["score"])
            for r in hard_negatives(
                d, anchors, "vec_id", "embedding", "label",
                "aid", "av", "al", k=5).collect())
        assert run(df.repartition(13)) == run(df.coalesce(1))
