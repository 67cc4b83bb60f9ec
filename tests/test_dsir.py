"""DSIR importance weights (operators/corpus.py dsir_log_weights)."""

import hashlib
import math
import re

import pytest


def _df(spark, rows, schema="doc_id: string, text: string"):
    return spark.createDataFrame(rows, schema)


def _brute(raw, target, buckets=64, add_k=0.5, salt="v1"):
    def toks(t):
        return [w for w in re.split(r"[^A-Za-z0-9']+", t.lower()) if w]

    def feats(t):
        ws = toks(t)
        keyed = [f"{salt}:u:{w}" for w in ws]
        keyed += [f"{salt}:b:{a} {b}" for a, b in zip(ws, ws[1:])]
        return [int(hashlib.sha256(s.encode()).hexdigest()[:8], 16)
                % buckets for s in keyed]

    tc, rc = {}, {}
    for _, t in target:
        for b in feats(t):
            tc[b] = tc.get(b, 0) + 1
    for _, t in raw:
        for b in feats(t):
            rc[b] = rc.get(b, 0) + 1
    tt, rt = sum(tc.values()), sum(rc.values())
    out = {}
    for did, t in raw:
        fs = feats(t)
        lr = sum(
            math.log(((tc.get(b, 0) + add_k) / (tt + add_k * buckets))
                     / ((rc.get(b, 0) + add_k) / (rt + add_k * buckets)))
            for b in fs)
        out[did] = (len(fs), lr)
    return out


RAW = [("d1", "the quick brown fox jumps"),
       ("d2", "buy cheap pills now buy now"),
       ("d3", "the fox and the hound"),
       ("d4", "cheap cheap cheap pills"),
       ("d5", "")]
TARGET = [("t1", "the quick fox ran over the hill"),
          ("t2", "the hound chased the fox")]


def test_brute_parity_and_semantics(spark):
    from neo4j_document_pipeline_spark.operators.corpus import (
        dsir_log_weights)
    got = {r["doc_id"]: (r["n_feat"], r["log_ratio"])
           for r in dsir_log_weights(
               _df(spark, RAW), "doc_id", "text",
               _df(spark, TARGET), buckets=64, add_k=0.5).collect()}
    want = _brute(RAW, TARGET)
    assert set(got) == {"d1", "d2", "d3", "d4", "d5"}
    for did, (nf, lr) in want.items():
        assert got[did][0] == nf
        assert got[did][1] == pytest.approx(lr, abs=1e-9)
    # target-like prose outranks the spam; empty doc is neutral
    assert got["d1"][1] > got["d2"][1]
    assert got["d3"][1] > got["d4"][1]
    assert got["d5"] == (0, 0.0)


def test_partitioning_invariance_and_validation(spark):
    from neo4j_document_pipeline_spark.operators.corpus import (
        dsir_log_weights)
    raw = _df(spark, RAW)
    a = dsir_log_weights(raw, "doc_id", "text", _df(spark, TARGET),
                         buckets=32)
    b = dsir_log_weights(raw.repartition(7), "doc_id", "text",
                         _df(spark, TARGET).repartition(3), buckets=32)
    ra = sorted((r["doc_id"], r["n_feat"], round(r["log_ratio"], 9))
                for r in a.collect())
    rb = sorted((r["doc_id"], r["n_feat"], round(r["log_ratio"], 9))
                for r in b.collect())
    assert ra == rb
    with pytest.raises(ValueError, match="buckets"):
        dsir_log_weights(raw, "doc_id", "text", _df(spark, TARGET),
                         buckets=0)
    with pytest.raises(ValueError, match="add_k"):
        dsir_log_weights(raw, "doc_id", "text", _df(spark, TARGET),
                         add_k=0.0)


def test_resampling_composition(spark):
    """exp(log_ratio) feeds weighted_sample: the DSIR paper's pipeline
    end-to-end — target-like docs survive resampling more often."""
    from pyspark.sql import functions as F

    from neo4j_document_pipeline_spark.operators.corpus import (
        dsir_log_weights)
    from neo4j_document_pipeline_spark.operators.sampling import (
        weighted_sample)
    raw = [(f"g{i}", "the quick fox ran over the hound") for i in range(30)]
    raw += [(f"s{i}", "buy cheap pills now winner prize") for i in range(30)]
    lw = dsir_log_weights(_df(spark, raw), "doc_id", "text",
                          _df(spark, TARGET), buckets=256)
    weighted = lw.withColumn("w", F.exp("log_ratio"))
    kept = weighted_sample(weighted, 20, "w", id_col="doc_id").collect()
    good = sum(1 for r in kept if r["doc_id"].startswith("g"))
    assert len(kept) == 20 and good >= 15
