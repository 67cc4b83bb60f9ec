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


# ---------------------------------------------------------------------------
# sliding-window distinct via bucket-sketch merge
# ---------------------------------------------------------------------------

def test_kmv_sliding_equals_per_window_sketch(spark):
    """The bucket-merge construction gives BIT-identical results to
    sketching each sliding window directly from raw rows (the KMV merge
    property on the time axis), at a k small enough to saturate."""
    import datetime as dt

    from neo4j_document_pipeline_spark.operators.sketches import (
        kmv_sketch, kmv_sliding_distinct)
    base = dt.datetime(2025, 3, 1)
    rows = [(i % 37, "e", base + dt.timedelta(minutes=7 * i))
            for i in range(300)]
    ev = spark.createDataFrame(rows, "user_id long, event_type string, ts timestamp")
    W, S = 3600, 900
    got = {(r["win_start_sec"], r["event_type"]):
           (r["n_min"], r["estimate"])
           for r in kmv_sliding_distinct(
               ev, "user_id", window_sec=W, slide_sec=S,
               group_cols="event_type", k=8).collect()}
    # direct: assign raw rows to each covering window, sketch per window
    from pyspark.sql import functions as F
    r_cnt = W // S
    direct_src = ev.select(
        F.explode(F.sequence(
            (F.floor(F.unix_timestamp("ts") / S) * S) - (r_cnt - 1) * S,
            F.floor(F.unix_timestamp("ts") / S) * S,
            F.lit(S))).alias("win_start_sec"),
        "event_type", "user_id")
    direct = {(r["win_start_sec"], r["event_type"]):
              (r["n_min"], r["estimate"])
              for r in kmv_sketch(direct_src,
                                  ["win_start_sec", "event_type"],
                                  "user_id", k=8).collect()}
    assert got == direct and got


def test_kmv_sliding_exact_below_k(spark):
    import datetime as dt

    from neo4j_document_pipeline_spark.operators.sketches import (
        kmv_sliding_distinct)
    base = dt.datetime(2025, 3, 1)
    # 5 users in hour 0, 3 new users in hour 1
    rows = [(u, "e", base + dt.timedelta(minutes=5 * u))
            for u in range(5)] + \
           [(10 + u, "e", base + dt.timedelta(hours=1, minutes=10 * u))
            for u in range(3)]
    ev = spark.createDataFrame(rows, "user_id long, event_type string, ts timestamp")
    got = {r["win_start_sec"]: r["estimate"]
           for r in kmv_sliding_distinct(
               ev, "user_id", window_sec=7200, slide_sec=3600, k=64).collect()}
    t0 = int(base.replace(tzinfo=dt.timezone.utc).timestamp())
    # window [t0, +2h) sees all 8; [t0+1h, +2h) sees 3; [t0-1h, +1h) sees 5
    assert got[t0] == 8.0
    assert got[t0 + 3600] == 3.0
    assert got[t0 - 3600] == 5.0


def test_kmv_sliding_validation(spark):
    import pytest as _pytest

    from neo4j_document_pipeline_spark.operators.sketches import (
        kmv_sliding_distinct)
    ev = spark.createDataFrame([(1, "e", None)],
                               "user_id long, event_type string, ts timestamp")
    with _pytest.raises(ValueError):
        kmv_sliding_distinct(ev, "user_id", window_sec=3600, slide_sec=1000)
    with _pytest.raises(ValueError):
        kmv_sliding_distinct(ev, "user_id", window_sec=0)
    with _pytest.raises(ValueError):
        kmv_sliding_distinct(ev, "user_id", k=1)


# ---------------------------------------------------------------------------
# hash-sample quantiles
# ---------------------------------------------------------------------------

def test_hash_sample_quantiles_brute_parity_and_stability(spark):
    import hashlib

    from neo4j_document_pipeline_spark.operators.sketches import (
        hash_sample_quantiles)
    rows = [(f"d{i:03d}", (i * 37) % 101) for i in range(400)]
    df = spark.createDataFrame(rows, "doc_id string, v int")

    def u(x):
        return int(hashlib.sha256(f"v1:{x}".encode()).hexdigest()[:8],
                   16) / float(1 << 32)

    sample = sorted(((v, d) for d, v in rows if u(d) < 0.5))
    import math
    expect = {}
    for p in (0.5, 0.9, 0.99):
        expect[p] = (len(sample),
                     sample[math.ceil(p * len(sample)) - 1][0])
    got = {r["p"]: (r["n_sample"], r["value"])
           for r in hash_sample_quantiles(
               df, "v", [0.5, 0.9, 0.99], "doc_id", rate=0.5).collect()}
    assert got == expect
    got2 = {r["p"]: (r["n_sample"], r["value"])
            for r in hash_sample_quantiles(
                df.repartition(11), "v", [0.5, 0.9, 0.99], "doc_id",
                rate=0.5).collect()}
    assert got2 == got  # pure function of the data


def test_hash_sample_quantiles_validation(spark):
    import pytest as _pytest

    from neo4j_document_pipeline_spark.operators.sketches import (
        hash_sample_quantiles)
    df = spark.createDataFrame([("a", 1)], "doc_id string, v int")
    with _pytest.raises(ValueError):
        hash_sample_quantiles(df, "v", [], "doc_id")
    with _pytest.raises(ValueError):
        hash_sample_quantiles(df, "v", [1.5], "doc_id")
    with _pytest.raises(ValueError):
        hash_sample_quantiles(df, "v", [0.5], "doc_id", rate=0.0)


# ---------------------------------------------------------------------------
# count-min sketch
# ---------------------------------------------------------------------------

def _brute_cms(rows, depth, width, salt="v1"):
    """The spec in plain python: sha256 15-hex-digit buckets, per
    (group, r, b) occurrence sums."""
    import hashlib
    from collections import Counter
    cells = Counter()
    for g, v in rows:
        if v is None:
            continue
        for r in range(depth):
            h = hashlib.sha256(f"{salt}:{r}:{v}".encode()).hexdigest()
            b = int(h[:15], 16) % width
            cells[(g, r, b)] += 1
    return cells


def test_cms_brute_parity_and_invariance(spark):
    import random
    from neo4j_document_pipeline_spark.operators.sketches import cms_sketch
    rng = random.Random(11)
    rows = [(rng.choice(["a", "b"]), rng.randint(0, 40))
            for _ in range(500)] + [("a", None)]
    df = spark.createDataFrame(rows, "g string, v long")
    got = {(r["g"], r["r"], r["b"]): r["cnt"] for r in
           cms_sketch(df, "g", "v", depth=3, width=32).collect()}
    assert got == dict(_brute_cms(rows, 3, 32))
    # partitioning invariance (a pure aggregation)
    got13 = {(r["g"], r["r"], r["b"]): r["cnt"] for r in
             cms_sketch(df.repartition(13), "g", "v",
                        depth=3, width=32).collect()}
    assert got13 == got


def test_cms_merge_equals_union(spark):
    from neo4j_document_pipeline_spark.operators.sketches import (
        cms_merge, cms_sketch)
    a = spark.createDataFrame(
        [("g", i % 7) for i in range(100)], "g string, v long")
    b = spark.createDataFrame(
        [("g", i % 5) for i in range(80)], "g string, v long")
    sa = cms_sketch(a, "g", "v", depth=4, width=16)
    sb = cms_sketch(b, "g", "v", depth=4, width=16)
    merged = {(r["g"], r["r"], r["b"]): r["cnt"] for r in
              cms_merge(sa.unionByName(sb), "g").collect()}
    direct = {(r["g"], r["r"], r["b"]): r["cnt"] for r in
              cms_sketch(a.unionByName(b), "g", "v",
                         depth=4, width=16).collect()}
    assert merged == direct  # exact, by linearity


def test_cms_point_estimate_never_underestimates(spark):
    import random
    from collections import Counter
    from neo4j_document_pipeline_spark.operators.sketches import (
        cms_point_estimate, cms_sketch)
    rng = random.Random(3)
    vals = [rng.randint(0, 30) for _ in range(400)]
    exact = Counter(vals)
    df = spark.createDataFrame([("g", v) for v in vals],
                               "g string, v long")
    cells = cms_sketch(df, "g", "v", depth=4, width=64)
    keys = spark.createDataFrame(
        [("g", k) for k in exact] + [("g", 999)], "g string, v long")
    est = {r["v"]: r["estimate"] for r in
           cms_point_estimate(cells, keys, "g", "v",
                              depth=4, width=64).collect()}
    for k, c in exact.items():
        assert est[k] >= c  # the one-sided CMS guarantee
    assert est[999] >= 0  # unseen key: only collision mass
    # parity with the brute estimate (min over brute cells)
    brute = _brute_cms([("g", v) for v in vals], 4, 64)
    import hashlib
    for k in list(exact)[:10] + [999]:
        want = min(
            brute.get(("g", r, int(hashlib.sha256(
                f"v1:{r}:{k}".encode()).hexdigest()[:15], 16) % 64), 0)
            for r in range(4))
        assert est[k] == want, k


def test_cms_validation_and_weights(spark):
    import pytest as _pytest
    from neo4j_document_pipeline_spark.operators.sketches import cms_sketch
    df = spark.createDataFrame([("g", 1, 5), ("g", 1, 2), ("g", 2, 1)],
                               "g string, v long, w long")
    with _pytest.raises(ValueError, match="depth"):
        cms_sketch(df, "g", "v", depth=0)
    with _pytest.raises(ValueError, match="width"):
        cms_sketch(df, "g", "v", width=1)
    cells = cms_sketch(df, "g", "v", depth=2, width=16, weight_col="w")
    # weighted: v=1 contributes 7 per row, v=2 contributes 1
    per_row = {}
    for r in cells.collect():
        per_row.setdefault(r["r"], []).append(r["cnt"])
    for r, counts in per_row.items():
        assert sorted(counts) in ([1, 7], [8])  # collision may merge cells


# ---------------------------------------------------------------------------
# Bloom filter (mergeable membership)
# ---------------------------------------------------------------------------

def _brute_bloom(rows, m_bits, k_hashes, salt="v1"):
    import hashlib
    words = {}
    for g, v in rows:
        if v is None:
            continue
        for i in range(k_hashes):
            p = int(hashlib.sha256(
                f"{salt}:b{i}:{v}".encode()).hexdigest()[:15], 16) % m_bits
            key = (g, p // 32)
            words[key] = words.get(key, 0) | (1 << (p % 32))
    return words


def test_bloom_brute_parity_and_invariance(spark):
    import random
    from neo4j_document_pipeline_spark.operators.sketches import (
        bloom_sketch)
    rng = random.Random(7)
    rows = [(rng.choice(["a", "b"]), rng.randint(0, 50))
            for _ in range(300)] + [("a", None)]
    df = spark.createDataFrame(rows, "g string, v long")
    got = {(r["g"], r["w"]): r["bits"] for r in
           bloom_sketch(df, "g", "v", m_bits=128, k_hashes=3).collect()}
    assert got == _brute_bloom(rows, 128, 3)
    # partitioning invariance (a pure bit_or aggregation)
    got13 = {(r["g"], r["w"]): r["bits"] for r in
             bloom_sketch(df.repartition(13), "g", "v",
                          m_bits=128, k_hashes=3).collect()}
    assert got13 == got


def test_bloom_merge_equals_sketch_of_union(spark):
    from neo4j_document_pipeline_spark.operators.sketches import (
        bloom_merge, bloom_sketch)
    a = spark.createDataFrame(
        [("g", i) for i in range(40)], "g string, v long")
    b = spark.createDataFrame(
        [("g", i) for i in range(20, 60)], "g string, v long")
    sa = bloom_sketch(a, "g", "v", m_bits=256, k_hashes=4)
    sb = bloom_sketch(b, "g", "v", m_bits=256, k_hashes=4)
    merged = {(r["g"], r["w"]): r["bits"] for r in
              bloom_merge(sa.unionByName(sb), "g").collect()}
    direct = {(r["g"], r["w"]): r["bits"] for r in
              bloom_sketch(a.unionByName(b), "g", "v",
                           m_bits=256, k_hashes=4).collect()}
    assert merged == direct  # exact, by idempotent-OR linearity


def test_bloom_contains_no_false_negatives(spark):
    from neo4j_document_pipeline_spark.operators.sketches import (
        bloom_contains, bloom_sketch)
    members = list(range(0, 40))
    df = spark.createDataFrame([("g", v) for v in members],
                               "g string, v long")
    # sized filter: m/n = 1024/40, k=4 -> FP rate ~ 1e-4
    words = bloom_sketch(df, "g", "v", m_bits=1024, k_hashes=4)
    keys = spark.createDataFrame(
        [("g", v) for v in members] +
        [("g", 100000 + i) for i in range(50)], "g string, v long")
    res = {r["v"]: r["member"] for r in
           bloom_contains(words, keys, "g", "v",
                          m_bits=1024, k_hashes=4).collect()}
    for v in members:          # the defining guarantee
        assert res[v] is True
    fps = [v for v in range(100000, 100050) if res[v]]
    assert len(fps) <= 2       # deterministic; 0 at this sizing


def test_bloom_groups_isolated_and_validation(spark):
    import pytest as _pytest
    from neo4j_document_pipeline_spark.operators.sketches import (
        bloom_contains, bloom_sketch)
    df = spark.createDataFrame([("a", 1), ("b", 2)], "g string, v long")
    words = bloom_sketch(df, "g", "v", m_bits=512, k_hashes=3)
    keys = spark.createDataFrame(
        [("a", 1), ("a", 2), ("b", 1), ("b", 2)], "g string, v long")
    res = {(r["g"], r["v"]): r["member"] for r in
           bloom_contains(words, keys, "g", "v",
                          m_bits=512, k_hashes=3).collect()}
    # membership is PER GROUP: b's key is not in a's filter
    assert res[("a", 1)] and res[("b", 2)]
    assert not res[("a", 2)] and not res[("b", 1)]
    with _pytest.raises(ValueError, match="m_bits"):
        bloom_sketch(df, "g", "v", m_bits=1)
    with _pytest.raises(ValueError, match="k_hashes"):
        bloom_sketch(df, "g", "v", k_hashes=0)
    with _pytest.raises(ValueError, match="m_bits"):
        bloom_contains(words, keys, "g", "v", m_bits=0)


# ---------------------------------------------------------------------------
# fixed-width histogram sketch (mergeable quantiles)
# ---------------------------------------------------------------------------

def _hist_cells(rows):
    return {(r[0], r["bucket"]): r["cnt"] for r in rows}


def test_hist_sketch_known_cells_and_negatives(spark):
    from neo4j_document_pipeline_spark.operators.sketches import (
        hist_sketch)
    df = spark.createDataFrame(
        [("a", -0.1), ("a", 0.0), ("a", 9.99), ("a", 10.0),
         ("a", None), ("b", 25.0)],
        "g string, v double")
    cells = _hist_cells(
        hist_sketch(df, "g", "v", width=10.0).collect())
    # -0.1 floors to bucket -1 (floor, not truncation); 10.0 opens
    # bucket 1; NULL ignored
    assert cells == {("a", -1): 1, ("a", 0): 2, ("a", 1): 1,
                     ("b", 2): 1}


def test_hist_merge_equals_union_sketch(spark):
    import numpy as np

    from neo4j_document_pipeline_spark.operators.sketches import (
        hist_merge, hist_sketch)
    rng = np.random.RandomState(3)
    a = [("g%d" % rng.randint(3), float(rng.normal(50, 30)))
         for _ in range(400)]
    b = [("g%d" % rng.randint(3), float(rng.normal(80, 10)))
         for _ in range(300)]
    mk = lambda rows: hist_sketch(
        spark.createDataFrame(rows, "g string, v double"),
        "g", "v", width=7.5)
    merged = _hist_cells(hist_merge(
        mk(a).unionByName(mk(b)), "g").collect())
    direct = _hist_cells(mk(a + b).collect())
    assert merged == direct  # exact, not approximate


def test_hist_quantiles_brute_parity_and_error_bound(spark):
    import math

    import numpy as np

    from neo4j_document_pipeline_spark.operators.sketches import (
        hist_quantiles, hist_sketch)
    rng = np.random.RandomState(11)
    width, origin = 12.5, -40.0
    rows = [("g%d" % rng.randint(2), float(rng.normal(100, 60)))
            for _ in range(2000)]
    df = spark.createDataFrame(rows, "g string, v double")
    cells = hist_sketch(df, "g", "v", width=width, origin=origin)
    out = hist_quantiles(cells, "g", [0.0, 0.5, 0.9, 0.99, 1.0],
                         width=width, origin=origin).collect()
    by_g = {}
    for g, v in rows:
        by_g.setdefault(g, []).append(v)
    for r in out:
        vals = sorted(by_g[r["g"]])
        assert r["total"] == len(vals)
        true_q = vals[max(1, math.ceil(r["q"] * len(vals))) - 1]
        # brute parity: the bucket at the type-1 rank
        assert r["bucket"] == math.floor((true_q - origin) / width)
        # the one-sided guarantee: est <= true quantile < est + width
        assert r["est"] <= true_q < r["est"] + width


def test_hist_sketch_partitioning_invariance(spark):
    from neo4j_document_pipeline_spark.operators.sketches import (
        hist_sketch)
    rows = [("a", float(i * 3 % 97)) for i in range(500)]
    df = spark.createDataFrame(rows, "g string, v double")
    one = _hist_cells(hist_sketch(
        df.repartition(1), "g", "v", width=5.0).collect())
    many = _hist_cells(hist_sketch(
        df.repartition(13, "v"), "g", "v", width=5.0).collect())
    assert one == many


def test_hist_validation(spark):
    import pytest as _pytest

    from neo4j_document_pipeline_spark.operators.sketches import (
        hist_quantiles, hist_sketch)
    df = spark.createDataFrame([("a", 1.0)], "g string, v double")
    with _pytest.raises(ValueError):
        hist_sketch(df, "g", "v", width=0.0)
    cells = hist_sketch(df, "g", "v", width=1.0)
    with _pytest.raises(ValueError):
        hist_quantiles(cells, "g", [], width=1.0)
    with _pytest.raises(ValueError):
        hist_quantiles(cells, "g", [1.5], width=1.0)


# ---------------------------------------------------------------------------
# KMV set algebra (theta-sketch overlap estimates)
# ---------------------------------------------------------------------------

def _sketch_of(spark, vals, k):
    df = spark.createDataFrame([("x", str(v)) for v in vals],
                               "g string, v string")
    return kmv_sketch(df, "g", "v", k=k)


def test_kmv_set_ops_exact_below_saturation(spark):
    from neo4j_document_pipeline_spark.operators.sketches import (
        kmv_set_ops)
    a = _sketch_of(spark, range(20), 64)
    b = _sketch_of(spark, range(10, 40), 64)
    r = kmv_set_ops(a, b, "g", 64).collect()[0]
    # both sketches exhaustive -> every number EXACT
    assert r["k_used"] == 40
    assert r["n_both"] == 10
    assert r["union_est"] == 40.0
    assert r["inter_est"] == 10.0
    assert r["jaccard_est"] == 0.25


def test_kmv_set_ops_self_is_identity(spark):
    from neo4j_document_pipeline_spark.operators.sketches import (
        kmv_set_ops)
    a = _sketch_of(spark, range(500), 32)
    est = a.collect()[0]["estimate"]
    r = kmv_set_ops(a, a, "g", 32).collect()[0]
    assert r["jaccard_est"] == 1.0
    assert r["n_both"] == r["k_used"] == 32
    assert r["union_est"] == pytest.approx(est)
    assert r["inter_est"] == pytest.approx(est)


def test_kmv_set_ops_saturated_error_bands(spark):
    from neo4j_document_pipeline_spark.operators.sketches import (
        kmv_set_ops)
    k = 64
    a = _sketch_of(spark, range(2000), k)
    b = _sketch_of(spark, range(1000, 3000), k)
    r = kmv_set_ops(a, b, "g", k).collect()[0]
    # true union 3000, intersection 1000, jaccard 1/3; k_used draws
    # from the union give jaccard sd ~ sqrt(J(1-J)/k) ≈ 0.059 — use
    # generous 3-sigma-ish bands (deterministic draw, fixed values)
    assert r["k_used"] == k
    assert abs(r["jaccard_est"] - 1 / 3) < 0.18
    assert abs(r["union_est"] - 3000) / 3000 < 0.40
    assert abs(r["inter_est"] - 1000) / 1000 < 0.60


def test_kmv_set_ops_membership_is_exact_in_k(spark):
    # the docstring's membership claim, brute-checked: for every
    # h in K (bottom-k of sketch(A) ∪ sketch(B)), h ∈ sketch(A)
    # iff h ∈ hashes(A) — so n_both counts TRUE A∩B members
    import hashlib

    from neo4j_document_pipeline_spark.operators.sketches import (
        kmv_set_ops)

    def h(v):
        d = hashlib.sha256(f"v1:{v}".encode()).hexdigest()[:8]
        return int(d, 16) / float(1 << 32)

    rng = np.random.RandomState(11)
    for trial in range(3):
        A = set(map(int, rng.choice(5000, 300, replace=False)))
        B = set(map(int, rng.choice(5000, 300, replace=False)))
        k = 48
        ha, hb = {h(v) for v in A}, {h(v) for v in B}
        K = sorted(ha | hb)[:k]
        expected = sum(1 for x in K if x in ha and x in hb)
        r = kmv_set_ops(_sketch_of(spark, A, k),
                        _sketch_of(spark, B, k), "g", k).collect()[0]
        assert r["n_both"] == expected
        assert r["k_used"] == min(k, len(ha | hb))


def test_kmv_set_ops_validation(spark):
    from neo4j_document_pipeline_spark.operators.sketches import (
        kmv_set_ops)
    a = _sketch_of(spark, range(5), 8)
    with pytest.raises(ValueError, match="k must be >= 2"):
        kmv_set_ops(a, a, "g", 1)


class TestSQ8:
    def _embs(self, spark, vecs):
        return spark.createDataFrame(
            [(i, [float(x) for x in v]) for i, v in enumerate(vecs)],
            "vec_id long, embedding array<float>")

    def test_codes_bounded_and_degenerate_dim_zero(self, spark):
        from neo4j_document_pipeline_spark.operators.similarity import (
            sq8_encode)
        df = self._embs(spark, [[0.0, 5.0, 1.0], [1.0, 5.0, 3.0],
                                [0.5, 5.0, 2.0]])
        rows = {r["vec_id"]: r["codes"] for r in
                sq8_encode(df, "vec_id", "embedding").collect()}
        for codes in rows.values():
            assert all(0 <= c <= 255 for c in codes)
            assert codes[1] == 0  # constant dim encodes to 0
        assert rows[0][0] == 0 and rows[1][0] == 255  # range endpoints
        assert rows[2][0] == 128  # floor(0.5*255+0.5)

    def test_brute_parity_numpy(self, spark):
        import numpy as np
        from neo4j_document_pipeline_spark.operators.similarity import (
            sq8_topk)
        rng = np.random.RandomState(5)
        vecs = rng.randn(40, 8).astype("float32")
        q = [float(x) for x in rng.randn(8)]
        df = self._embs(spark, vecs.tolist())
        got = [(r["vec_id"], round(r["score"], 6))
               for r in sq8_topk(df, "vec_id", "embedding", q, 5).collect()]
        v = vecs.astype("float64")
        mn, mx = v.min(axis=0), v.max(axis=0)
        span = mx - mn
        t = np.where(span > 0, (v - mn) / np.where(span > 0, span, 1), 0)
        codes = np.clip(np.floor(t * 255.0 + 0.5), 0, 255)
        dec = mn + codes / 255.0 * span
        qa = np.array(q)
        sc = dec @ qa / (np.linalg.norm(dec, axis=1)
                         * np.linalg.norm(qa))
        order = sorted(range(40), key=lambda i: (-sc[i], i))[:5]
        want = [(i, round(float(sc[i]), 6)) for i in order]
        assert got == want

    def test_quantization_error_is_small_but_real(self, spark):
        import numpy as np
        from neo4j_document_pipeline_spark.operators.similarity import (
            brute_force_topk, sq8_topk)
        rng = np.random.RandomState(9)
        vecs = rng.randn(100, 16).astype("float32")
        q = [float(x) for x in vecs[0]]
        df = self._embs(spark, vecs.tolist())
        exact = [r["vec_id"]
                 for r in brute_force_topk(df, "vec_id", "embedding",
                                           q, 10).collect()]
        sq = [r["vec_id"]
              for r in sq8_topk(df, "vec_id", "embedding", q, 10).collect()]
        # 8-bit decode keeps >= 8/10 of the exact top-10 on gaussian data
        assert len(set(exact) & set(sq)) >= 8
        assert sq[0] == 0  # the query's own vector still wins

    def test_committed_codebook_for_delta_batches(self, spark):
        from neo4j_document_pipeline_spark.operators.similarity import (
            sq8_encode, sq8_stats)
        base = self._embs(spark, [[0.0, 0.0], [4.0, 8.0]])
        stats = sq8_stats(base, "embedding").localCheckpoint()
        delta = self._embs(spark, [[2.0, 4.0], [9.0, -1.0]])
        rows = {r["vec_id"]: r["codes"] for r in
                sq8_encode(delta, "vec_id", "embedding", stats).collect()}
        assert rows[0] == [128, 128]  # midpoint of the COMMITTED range
        assert rows[1] == [255, 0]    # out-of-range delta values clamp
