"""leakage_safe_split — hash parity, cluster atomicity, validation."""

import hashlib

import pytest


def _u(salt, key):
    h = hashlib.sha256(f"{salt}:{key}".encode()).hexdigest()
    return int(h[:8], 16) / 4294967296.0


def _split(u, fractions):
    cum = 0.0
    names = list(fractions)
    for n in names[:-1]:
        cum += fractions[n]
        if u < cum:
            return n
    return names[-1]


class TestLeakageSafeSplit:
    FR = {"train": 0.8, "val": 0.1, "test": 0.1}

    def test_hash_parity_unclustered(self, spark):
        """With an empty cluster map every doc keys on itself and the
        assignment is the pure python replay of the hash draw."""
        from neo4j_document_pipeline_spark.operators.sampling import (
            leakage_safe_split)
        docs = spark.createDataFrame(
            [(f"d{i:04d}",) for i in range(400)], ["doc_id"])
        empty = spark.createDataFrame(
            [], "doc_id STRING, keep_id STRING")
        got = {r.doc_id: (r.split_key, r.split)
               for r in leakage_safe_split(
                   docs, "doc_id", self.FR, clusters=empty).collect()}
        assert len(got) == 400
        counts = {}
        for d, (key, s) in got.items():
            assert key == d
            assert s == _split(_u("v1", d), self.FR)
            counts[s] = counts.get(s, 0) + 1
        # rough proportionality — binomial(400, 0.8) 4 sigma
        assert 288 <= counts["train"] <= 352

    def test_cluster_atomicity_transitive_chain(self, spark):
        """A~B and B~C near-dups (A,C never similar enough to pair
        directly) must ALL land in one split, keyed by the cluster
        min — the guarantee a per-doc split cannot give."""
        from neo4j_document_pipeline_spark.operators.sampling import (
            leakage_safe_split)
        base = ("alpha beta gamma delta epsilon zeta eta theta iota "
                "kappa lambda mu nu xi omicron pi rho sigma tau")
        docs = spark.createDataFrame(
            [("a01", base + " endone"),
             ("a02", base + " endone endtwo"),
             ("a03", base + " endone endtwo endthree"),
             ("b99", "совершенно unrelated text about spark shuffles "
                     "and parquet footers nothing shared here at all")],
            ["doc_id", "text"])
        out = leakage_safe_split(docs, "doc_id", self.FR,
                                 text_col="text",
                                 jaccard_threshold=0.5)
        got = {r.doc_id: (r.split_key, r.split) for r in out.collect()}
        assert got["a01"] == got["a02"] == got["a03"]
        assert got["a01"][0] == "a01"
        assert got["b99"][0] == "b99"
        assert got["b99"][1] == _split(_u("v1", "b99"), self.FR)

    def test_precomputed_clusters_match_inline(self, spark):
        from neo4j_document_pipeline_spark.operators.dedup import (
            resolve_near_duplicates)
        from neo4j_document_pipeline_spark.operators.sampling import (
            leakage_safe_split)
        docs = spark.createDataFrame(
            [(f"d{i}", f"shared shingle text block {i % 3} common run "
                       f"of words that repeats common run of words")
             for i in range(12)], ["doc_id", "text"])
        res = resolve_near_duplicates(docs, "doc_id", "text",
                                      jaccard_threshold=0.5)
        a = leakage_safe_split(docs, "doc_id", self.FR,
                               clusters=res).collect()
        b = leakage_safe_split(docs, "doc_id", self.FR,
                               text_col="text",
                               jaccard_threshold=0.5).collect()
        key = lambda rows: sorted((r.doc_id, r.split_key, r.split)
                                  for r in rows)
        assert key(a) == key(b)

    def test_validation(self, spark):
        from neo4j_document_pipeline_spark.operators.sampling import (
            leakage_safe_split)
        docs = spark.createDataFrame([("d1", "t")], ["doc_id", "text"])
        empty = spark.createDataFrame(
            [], "doc_id STRING, keep_id STRING")
        with pytest.raises(ValueError):  # both sources
            leakage_safe_split(docs, "doc_id", self.FR,
                               clusters=empty, text_col="text")
        with pytest.raises(ValueError):  # neither
            leakage_safe_split(docs, "doc_id", self.FR)
        with pytest.raises(ValueError):  # doesn't sum to 1
            leakage_safe_split(docs, "doc_id", {"a": 0.5, "b": 0.4},
                               clusters=empty)
        with pytest.raises(ValueError):  # empty
            leakage_safe_split(docs, "doc_id", {}, clusters=empty)
        with pytest.raises(ValueError):  # out of range
            leakage_safe_split(docs, "doc_id", {"a": 1.2, "b": -0.2},
                               clusters=empty)
