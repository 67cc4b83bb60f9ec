"""KMV distinct-count sketch (operators/sketches.py) — exactness below
k, error bounds above it, and the bit-exact merge property."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from neo4j_document_pipeline_spark.operators.sketches import (
    kmv_merge,
    kmv_sketch,
)


def _rows(group, ids):
    return [(group, int(i)) for i in ids]


def test_kmv_exact_below_k(spark):
    df = spark.createDataFrame(
        _rows("a", range(10)) * 3,  # duplicates collapse
        "g string, v long")
    r = kmv_sketch(df, "g", "v", k=32).collect()[0]
    assert r["n_min"] == 10
    assert r["estimate"] == 10.0
    assert r["sketch"] == sorted(r["sketch"])


def test_kmv_estimate_error_bound(spark):
    # 2000 distinct values, k=64: relative error ~ 1/sqrt(62) ≈ 13%;
    # assert a generous 3-sigma band
    df = spark.createDataFrame(_rows("a", range(2000)), "g string, v long")
    r = kmv_sketch(df, "g", "v", k=64).collect()[0]
    assert r["n_min"] == 64
    assert abs(r["estimate"] - 2000) / 2000 < 0.4
    # estimate is (k-1)/h_k exactly
    assert abs(r["estimate"] - 63 / r["sketch"][-1]) < 1e-9


def test_kmv_merge_equals_sketch_of_union(spark):
    a = spark.createDataFrame(_rows("g", range(0, 800)), "g string, v long")
    b = spark.createDataFrame(_rows("g", range(400, 1200)),
                              "g string, v long")
    union = kmv_sketch(a.unionByName(b), "g", "v", k=32).collect()[0]
    merged = kmv_merge(
        kmv_sketch(a, "g", "v", k=32).unionByName(
            kmv_sketch(b, "g", "v", k=32)),
        "g", k=32).collect()[0]
    assert merged["sketch"] == union["sketch"]  # bit-for-bit
    assert merged["estimate"] == union["estimate"]
    assert merged["n_min"] == union["n_min"]


def test_kmv_nulls_salt_and_validation(spark):
    df = spark.createDataFrame(
        [("a", 1), ("a", None), ("a", 2)], "g string, v long")
    r = kmv_sketch(df, "g", "v", k=8).collect()[0]
    assert r["n_min"] == 2  # null ignored
    r2 = kmv_sketch(df, "g", "v", k=8, salt="v2").collect()[0]
    assert r2["sketch"] != r["sketch"]  # independent hash draw
    assert r2["n_min"] == r["n_min"]
    with pytest.raises(ValueError, match="k must be"):
        kmv_sketch(df, "g", "v", k=1)
    with pytest.raises(ValueError, match="k must be"):
        kmv_merge(kmv_sketch(df, "g", "v", k=8), "g", k=0)


def test_kmv_determinism_across_partitionings(spark):
    df = spark.createDataFrame(_rows("x", range(300)), "g string, v long")
    s1 = kmv_sketch(df.repartition(13), "g", "v", k=16).collect()[0]
    s2 = kmv_sketch(df.coalesce(1).orderBy(F.desc("v")), "g", "v",
                    k=16).collect()[0]
    assert s1["sketch"] == s2["sketch"]
    assert s1["estimate"] == s2["estimate"]
