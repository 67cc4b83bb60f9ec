"""Skew-salting helper tests: salted results == unsalted results."""

import pytest
from pyspark.sql import functions as F

from neo4j_document_pipeline_spark.operators.skew import (
    salted_aggregate,
    salted_join,
    top_heavy_keys,
)


@pytest.fixture(scope="module")
def skewed(spark):
    # key 'hot' holds 90% of rows (celebrity entity shape)
    hot = spark.range(900).select(
        F.lit("hot").alias("k"), (F.col("id") % 37).alias("doc"))
    cold = spark.range(100).select(
        F.concat(F.lit("c"), (F.col("id") % 20).cast("string")).alias("k"),
        (F.col("id") % 7).alias("doc"))
    return hot.union(cold).cache()


def test_salted_aggregate_matches_plain(spark, skewed):
    plain = {
        (r["k"],): (r["n"], tuple(r["docs"]))
        for r in skewed.groupBy("k")
        .agg(F.count("*").alias("n"),
             F.array_sort(F.collect_set("doc")).alias("docs")).collect()
    }
    salted = {
        (r["k"],): (r["n"], tuple(r["docs"]))
        for r in salted_aggregate(
            skewed, ["k"],
            [F.count("*").alias("pn"), F.collect_set("doc").alias("pd")],
            [F.sum("pn").alias("n"),
             F.array_sort(F.array_distinct(F.flatten(F.collect_list("pd")))).alias("docs")],
            buckets=8).collect()
    }
    assert salted == plain


def test_salted_join_matches_plain(spark, skewed):
    dim = spark.createDataFrame(
        [("hot", "HOT"), ("c1", "C1"), ("c5", "C5")], "k string, label string")
    # column order may differ; compare as sets of (k, doc, label)
    p = sorted((r["k"], r["doc"], r["label"]) for r in skewed.join(dim, "k").collect())
    s = sorted((r["k"], r["doc"], r["label"]) for r in salted_join(skewed, dim, "k", buckets=4).collect())
    assert p == s


def test_top_heavy_keys(spark, skewed):
    heavy = top_heavy_keys(skewed, ["k"], threshold_ratio=0.5)
    rows = heavy.collect()
    assert len(rows) == 1 and rows[0]["k"] == "hot"
