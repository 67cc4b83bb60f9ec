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


# ---------------------------------------------------------------------------
# range join
# ---------------------------------------------------------------------------

def _brute_range(points, intervals, with_key=True):
    out = set()
    for p in points:
        for iv in intervals:
            if with_key and p[0] != iv[0]:
                continue
            if iv[-2] is None or iv[-1] is None or p[-1] is None:
                continue
            if iv[-2] <= p[-1] < iv[-1]:
                out.add((p[1], iv[1]))
    return out


def test_range_join_brute_parity(spark):
    from neo4j_document_pipeline_spark.operators.temporal import (
        range_join)
    rng = np.random.RandomState(5)
    points = [(int(rng.randint(3)), i, _ts(int(rng.randint(300))))
              for i in range(60)]
    ivs = []
    for i in range(25):
        s = int(rng.randint(300))
        ivs.append((int(rng.randint(3)), 100 + i, _ts(s),
                    _ts(s + int(rng.randint(90)))))
    p_df = spark.createDataFrame(points, "k long, pid long, ts timestamp")
    i_df = spark.createDataFrame(
        ivs, "k long, iid long, t0 timestamp, t1 timestamp")
    for bucket in (60, 600, 3600, 7 * 3600):
        got = {(r["pid"], r["iid_r"]) for r in range_join(
            p_df, i_df, "k", ts_col="ts", start_col="t0", end_col="t1",
            bucket_seconds=bucket).collect()}
        assert got == _brute_range(points, ivs), bucket
    # key-less variant: every containing interval regardless of k
    got = {(r["pid"], r["iid_r"]) for r in range_join(
        p_df, i_df, None, ts_col="ts", start_col="t0", end_col="t1",
        bucket_seconds=600).collect()}
    expect = _brute_range([(None, p, t) for _, p, t in points],
                          [(None, i, a, b) for _, i, a, b in ivs],
                          with_key=False)
    assert got == expect


def test_range_join_half_open_and_degenerate(spark):
    from neo4j_document_pipeline_spark.operators.temporal import (
        range_join)
    p_df = spark.createDataFrame(
        [(1, 1, _ts(0)), (1, 2, _ts(10)), (1, 3, _ts(5))],
        "k long, pid long, ts timestamp")
    i_df = spark.createDataFrame(
        [(1, 100, _ts(0), _ts(10)),    # [0,10): contains 0 and 5, not 10
         (1, 101, _ts(3), _ts(3)),     # empty
         (1, 102, None, _ts(9))],      # null start
        "k long, iid long, t0 timestamp, t1 timestamp")
    got = {(r["pid"], r["iid_r"]) for r in range_join(
        p_df, i_df, "k", ts_col="ts", start_col="t0", end_col="t1",
        bucket_seconds=60).collect()}
    assert got == {(1, 100), (3, 100)}


def test_range_join_bucket_guard_raises(spark):
    import pyspark.errors

    from neo4j_document_pipeline_spark.operators.temporal import (
        range_join)
    p_df = spark.createDataFrame([(1, 1, _ts(0))],
                                 "k long, pid long, ts timestamp")
    i_df = spark.createDataFrame(
        [(1, 9, _ts(0), _ts(10000))], "k long, iid long, t0 timestamp, "
        "t1 timestamp")
    with pytest.raises(Exception, match="range_join"):
        range_join(p_df, i_df, "k", ts_col="ts", start_col="t0",
                   end_col="t1", bucket_seconds=1,
                   max_buckets_per_interval=100).collect()


# ---------------------------------------------------------------------------
# hypertable rollup
# ---------------------------------------------------------------------------

def test_time_rollup_matches_direct_aggregation(spark):
    """Coarse levels re-aggregate fine buckets; the numbers must equal
    aggregating raw events directly at every resolution."""
    from pyspark.sql import functions as F

    from neo4j_document_pipeline_spark.operators.temporal import (
        time_rollup)
    ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    out = time_rollup(ev, "ts", "value",
                      levels=["1 hour", "6 hours", "1 day"],
                      group_cols="event_type").collect()
    by_level = {}
    for r in out:
        by_level.setdefault(r["level"], {})[
            (r["bucket_start"], r["event_type"])] = (r["n"], r["v_sum"])
    for level, secs in [("1 hour", 3600), ("6 hours", 21600),
                        ("1 day", 86400)]:
        direct = {
            (r["b"], r["event_type"]): (r["n"], r["v"])
            for r in ev.withColumn("t", F.col("ts").cast("timestamp"))
            .groupBy(F.timestamp_seconds(
                F.floor(F.unix_timestamp("t") / secs) * secs).alias("b"),
                "event_type")
            .agg(F.count("*").alias("n"), F.sum("value").alias("v"))
            .collect()}
        got = by_level[level]
        assert set(got) == set(direct), level
        for k in direct:
            assert got[k][0] == direct[k][0], (level, k)
            assert abs(got[k][1] - direct[k][1]) < 1e-6, (level, k)


def test_time_rollup_validates_levels(spark):
    from neo4j_document_pipeline_spark.operators.temporal import (
        time_rollup)
    ev = spark.createDataFrame([(T0, 1.0)], "ts timestamp, value double")
    with pytest.raises(ValueError, match="multiple"):
        time_rollup(ev, "ts", "value", levels=["1 hour", "90 minutes"])
    with pytest.raises(ValueError, match="duration"):
        time_rollup(ev, "ts", "value", levels=["fortnight"])
    with pytest.raises(ValueError, match="non-empty"):
        time_rollup(ev, "ts", "value", levels=[])


# ---------------------------------------------------------------------------
# Rolling z-score anomaly detection
# ---------------------------------------------------------------------------

class TestRollingZscoreAnomalies:
    def _brute(self, rows, bucket_h, window, min_periods, zt):
        """Python spec: hourly dense grid per key, trailing-window
        integer-sum mean/var, z and flag."""
        import collections
        import datetime as dt

        counts = collections.Counter()
        keys = collections.defaultdict(list)
        for ts, key in rows:
            b = ts.replace(minute=0, second=0, microsecond=0)
            counts[(key, b)] += 1
            keys[key].append(b)
        out = {}
        for key, bs in keys.items():
            t0, t1 = min(bs), max(bs)
            grid = []
            t = t0
            while t <= t1:
                grid.append(t)
                t += dt.timedelta(hours=bucket_h)
            cnts = [counts.get((key, b), 0) for b in grid]
            for i, b in enumerate(grid):
                prior = cnts[max(0, i - window):i]
                n = len(prior)
                mean = var = z = None
                if n >= 1:
                    s = sum(prior)
                    mean = s / n
                if n >= 2:
                    s, ss = sum(prior), sum(x * x for x in prior)
                    var = (ss - s * s / n) / (n - 1)
                if n >= min_periods and var is not None and var > 0:
                    z = (cnts[i] - mean) / var ** 0.5
                flag = z is not None and abs(z) >= zt
                out[(key, b)] = (cnts[i], n, mean, var, z, flag)
        return out

    def _mkrows(self):
        import datetime as dt
        import random

        rng = random.Random(11)
        base = dt.datetime(2024, 3, 1)
        rows = []
        for h in range(72):
            for key in ("view", "click"):
                lam = 5 if key == "view" else 2
                for _ in range(rng.randint(lam - 1, lam + 1)):
                    rows.append((base + dt.timedelta(
                        hours=h, minutes=rng.randint(0, 59)), key))
        # planted spike: hour 50 of 'click' gets 40 extra events
        for m in range(40):
            rows.append((base + dt.timedelta(hours=50, minutes=m % 60),
                         "click"))
        # planted outage: 'view' goes silent hours 60-62 (zero buckets
        # must exist in the grid and score negative z)
        rows = [(ts, k) for ts, k in rows
                if not (k == "view" and 60 <= (ts - base).total_seconds()
                        // 3600 <= 62)]
        return rows

    def test_brute_parity_and_planted_spike(self, spark):
        from neo4j_document_pipeline_spark.operators.temporal import (
            rolling_zscore_anomalies)
        rows = self._mkrows()
        df = spark.createDataFrame(rows, ["ts", "event_type"])
        got = {(r.key, r.bucket_ts): (r.cnt, r.n_prior, r.mean_prior,
                                      r.var_prior, r.z, r.anomaly)
               for r in rolling_zscore_anomalies(
                   df, "ts", "event_type", bucket="1 hour", window=24,
                   min_periods=8, z_threshold=3.0).collect()}
        want = self._brute(rows, 1, 24, 8, 3.0)
        assert set(got) == set(want)
        import datetime as dt
        base = dt.datetime(2024, 3, 1)
        for k in want:
            g, w = got[k], want[k]
            assert g[0] == w[0] and g[1] == w[1], k
            for gi, wi in zip(g[2:5], w[2:5]):
                if wi is None:
                    assert gi is None, k
                else:
                    assert abs(gi - wi) < 1e-9, k
            assert g[5] == w[5], k
        # the spike hour is flagged
        assert got[("click", base + dt.timedelta(hours=50))][5] is True
        # outage buckets exist with cnt=0 and negative z
        for h in (60, 61, 62):
            row = got[("view", base + dt.timedelta(hours=h))]
            assert row[0] == 0
            assert row[4] is not None and row[4] < 0

    def test_min_periods_gates_early_buckets(self, spark):
        from neo4j_document_pipeline_spark.operators.temporal import (
            rolling_zscore_anomalies)
        rows = self._mkrows()
        df = spark.createDataFrame(rows, ["ts", "event_type"])
        out = rolling_zscore_anomalies(
            df, "ts", "event_type", window=24, min_periods=8).collect()
        for r in out:
            if r.n_prior < 8:
                assert r.z is None and r.anomaly is False

    def test_validation(self, spark):
        import pytest as _pytest
        from neo4j_document_pipeline_spark.operators.temporal import (
            rolling_zscore_anomalies)
        df = spark.createDataFrame(
            [(__import__("datetime").datetime(2024, 1, 1), "a")],
            ["ts", "k"])
        with _pytest.raises(ValueError):
            rolling_zscore_anomalies(df, "ts", "k", window=0)
        with _pytest.raises(ValueError):
            rolling_zscore_anomalies(df, "ts", "k", min_periods=1)
