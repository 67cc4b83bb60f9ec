"""As-of join (operators/temporal.py) — pandas merge_asof parity plus
hand-checkable semantics."""

import datetime as dt

import numpy as np
import pandas as pd
import pytest

from neo4j_document_pipeline_spark.operators.temporal import asof_join

T0 = dt.datetime(2025, 3, 1, 12, 0, 0)


def _ts(minutes):
    return T0 + dt.timedelta(minutes=minutes)


def test_asof_backward_known_values(spark):
    left = spark.createDataFrame(
        [(1, _ts(10), "l-a"), (1, _ts(5), "l-b"), (2, _ts(3), "l-c")],
        "k long, ts timestamp, lv string")
    right = spark.createDataFrame(
        [(1, _ts(7), "r-early"), (1, _ts(9), "r-late"),
         (3, _ts(1), "r-otherkey")],
        "k long, ts timestamp, rv string")
    out = {r["lv"]: r for r in asof_join(left, right, "k", "ts").collect()}
    assert out["l-a"]["rv_r"] == "r-late" and out["l-a"]["ts_r"] == _ts(9)
    assert out["l-b"]["rv_r"] is None          # no right row <= ts 5
    assert out["l-c"]["rv_r"] is None          # key 2 has no right rows
    assert set(out["l-a"].asDict()) == {"k", "ts", "lv", "ts_r", "rv_r"}


def test_asof_equal_ts_matches_inclusive(spark):
    left = spark.createDataFrame(
        [(1, _ts(5))], "k long, ts timestamp")
    right = spark.createDataFrame(
        [(1, _ts(5), 42)], "k long, ts timestamp, v long")
    r = asof_join(left, right, "k", "ts").collect()[0]
    assert r["v_r"] == 42


def test_asof_forward_and_tolerance(spark):
    left = spark.createDataFrame(
        [(1, _ts(0)), (1, _ts(20))], "k long, ts timestamp")
    right = spark.createDataFrame(
        [(1, _ts(8), "next")], "k long, ts timestamp, v string")
    fwd = {r["ts"]: r["v_r"] for r in
           asof_join(left, right, "k", "ts", direction="forward").collect()}
    assert fwd[_ts(0)] == "next" and fwd[_ts(20)] is None
    tol = {r["ts"]: r["v_r"] for r in
           asof_join(left, right, "k", "ts", direction="forward",
                     tolerance="5 minutes").collect()}
    assert tol[_ts(0)] is None  # 8 min away > 5 min tolerance


def test_asof_null_handling_and_validation(spark):
    left = spark.createDataFrame(
        [(1, None, "null-ts")], "k long, ts timestamp, lv string")
    right = spark.createDataFrame(
        [(1, _ts(1), "rv"), (1, None, "null-right")],
        "k long, ts timestamp, rv string")
    rows = asof_join(left, right, "k", "ts").collect()
    assert len(rows) == 1 and rows[0]["rv_r"] is None
    with pytest.raises(ValueError, match="direction"):
        asof_join(left, right, "k", "ts", direction="nearest")
    with pytest.raises(ValueError, match="must exist"):
        asof_join(left, right.drop("ts"), "k", "ts")
    from pyspark.sql import functions as F
    with pytest.raises(ValueError, match="collide"):
        asof_join(left.withColumn("rv_r", F.lit(1)), right, "k", "ts")


def test_asof_pandas_merge_asof_parity(spark):
    """Random grid parity with pandas merge_asof across directions and
    tolerances — the reference semantics this operator claims."""
    rng = np.random.RandomState(3)
    lrows = [(int(rng.randint(4)), _ts(int(rng.randint(120))), i)
             for i in range(80)]
    rrows = [(int(rng.randint(4)), _ts(int(rng.randint(120))), 1000 + i)
             for i in range(50)]
    # merge_asof demands unique sortable ts per frame order; dedupe
    # (key, ts) pairs so "most recent" is unambiguous on both engines
    lrows = list({(k, t): (k, t, i) for k, t, i in lrows}.values())
    rrows = list({(k, t): (k, t, i) for k, t, i in rrows}.values())
    left = spark.createDataFrame(lrows, "k long, ts timestamp, lid long")
    right = spark.createDataFrame(rrows, "k long, ts timestamp, rid long")
    lpd = pd.DataFrame(lrows, columns=["k", "ts", "lid"]).sort_values("ts")
    rpd = pd.DataFrame(rrows, columns=["k", "ts", "rid"]).sort_values("ts")
    for direction, tol in [("backward", None), ("forward", None),
                           ("backward", "10 minutes"),
                           ("forward", "25 minutes")]:
        got = {r["lid"]: r["rid_r"] for r in
               asof_join(left, right, "k", "ts", direction=direction,
                         tolerance=tol).collect()}
        expect_df = pd.merge_asof(
            lpd, rpd, on="ts", by="k", direction=direction,
            tolerance=pd.Timedelta(tol) if tol else None)
        expect = {int(r.lid): (None if pd.isna(r.rid) else int(r.rid))
                  for r in expect_df.itertuples()}
        assert got == expect, (direction, tol)
