"""Deterministic embedding clustering + semantic dedup (SemDeDup).

Two operators a training-data pipeline runs over an embedding column:

- ``kmeans_assign`` — Lloyd k-means with a FIXED, bounded number of
  unrolled rounds, deterministic hash-seeded init, and exact-integer
  centroid state, so the full clustering is a pure function of the data
  (identical across partitionings, cluster sizes, and engines) and a
  plain-SQL oracle can replay it bit-for-bit. This is the verifiable
  counterpart to the float/numpy trainer the ANN index uses
  (similarity.py lloyd_kmeans, driver-side over a bounded sample):
  that one is the production path for index builds; this one is the
  corpus-analytics path where reproducibility is the contract.
- ``semantic_dedup`` — SemDeDup (Abbas et al. 2023, public): cluster
  embeddings, then within each cluster flag cosine >= threshold pairs
  and keep one representative per connected near-dup group. Catches
  the paraphrase/re-render duplicates MinHash (lexical) dedup misses.

Determinism design (the whole point of this module):
- vectors are quantized once to integers: qv_d = floor(x_d * scale +
  0.5) — exact in both engines (float32 -> float64 promotion is exact,
  floor is floor);
- centroid state is (S, n) with S_d = SUM of member qv_d (int64) and n
  the member count — integer sums are order-independent, so the
  centroid is identical however Spark partitions the aggregation;
- the assignment metric is ||x - S/n||^2 scaled by n^2: per dimension
  diff_d = n*qv_d - S_d stays in EXACT int64 (safe while n * scale *
  max|x| < 2^63 — ~1.7e15 rows per cluster at the defaults), then the
  square and the across-dim sum run in double with a FIXED left-fold
  order, and every term is >= 0.0, so the fold is bit-identical in any
  IEEE-754 engine that folds left (the oracle uses list_reduce);
- ties (equal metric) break to the smallest cluster id; k-means++-style
  randomness is replaced by a sha256 hash order over row ids, a pure
  function of the data.

Scale shape: one narrow quantize pass; per round one broadcast of the
k x dim integer centroid table (k=4096 at dim 1024 is ~32 MB — still a
broadcast) against the points, one map-side-combinable groupBy(id)
argmin, one groupBy(cid) integer re-sum. No driver action inside the
rounds — the whole clustering is a single lazy plan (rounds are
unrolled, like katz/pagerank's bounded form). SemDeDup's pair join is
per-cluster (quadratic only within a cluster — pick k so clusters stay
bounded, the published recipe) and the survivor choice reuses the
star-contraction connected components.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def quantize_embeddings(df: DataFrame, id_col: str, vec_col: str, *,
                        scale: int = 10_000) -> DataFrame:
    """(id, qv) with qv_d = floor(x_d * scale + 0.5) as int64 — the
    shared exact-integer representation of this module."""
    if scale < 1:
        raise ValueError(f"scale must be >= 1, got {scale}")
    qv = F.transform(
        F.col(vec_col),
        lambda x: F.floor(x * F.lit(float(scale)) + F.lit(0.5)))
    return (df.filter(F.col(vec_col).isNotNull())
            .select(F.col(id_col).alias("id"), qv.alias("qv")))


def _seed_centroids(q: DataFrame, k: int) -> DataFrame:
    """First centroids: the k rows with the smallest sha256('km:' || id)
    — a deterministic, data-independent-looking draw (hash order is a
    pure function of ids). cluster ids 0..k-1 follow the same order.
    Plans as TakeOrderedAndProject (top-k, never a global sort); the
    row_number window runs over the k surviving rows only."""
    hk = F.sha2(F.concat(F.lit("km:"), F.col("id").cast("string")), 256)
    seeds = q.select("id", "qv", hk.alias("_hk")).orderBy("_hk", "id").limit(k)
    w = Window.orderBy("_hk", "id")
    return seeds.select(
        (F.row_number().over(w) - 1).alias("cid"),
        F.col("qv").alias("S"),
        F.lit(1).cast("long").alias("n"))


def _assign(q: DataFrame, cent: DataFrame, dim: int) -> DataFrame:
    """Nearest centroid per point: metric = ||n*qv - S||^2 / n^2 with the
    per-dim diff exact int64 and the square/sum in left-fold double
    (see module docstring); argmin via min(struct(metric, cid)) — a
    map-side-combinable aggregate, ties to the smallest cid."""
    j = q.crossJoin(F.broadcast(cent))
    n = F.col("n")

    def term(d):
        diff = (n * F.element_at("qv", d) - F.element_at("S", d))
        dd = diff.cast("double")
        return dd * dd

    sumdd = F.aggregate(
        F.transform(F.sequence(F.lit(1), F.lit(dim)), term),
        F.lit(0.0), lambda acc, x: acc + x)
    metric = sumdd / (n.cast("double") * n.cast("double"))
    best = (
        j.select("id", "qv", metric.alias("m"), "cid")
        .groupBy("id")
        .agg(F.min(F.struct(F.col("m"), F.col("cid"),
                            F.col("qv"))).alias("b"))
    )
    return best.select(
        "id", F.col("b.cid").alias("cid"), F.col("b.qv").alias("qv"),
        F.col("b.m").alias("m"))


def _update(assigned: DataFrame, dim: int) -> DataFrame:
    """New centroid state per cluster: exact integer sums per dimension
    + the member count (order-independent; empty clusters vanish)."""
    sums = [F.sum(F.element_at("qv", d + 1)).alias(f"_s{d}")
            for d in range(dim)]
    agg = assigned.groupBy("cid").agg(F.count("*").alias("n"), *sums)
    return agg.select(
        "cid",
        F.array(*[F.col(f"_s{d}") for d in range(dim)]).alias("S"),
        "n")


def kmeans_assign(df: DataFrame, id_col: str, vec_col: str, *,
                  k: int = 8, iters: int = 2,
                  scale: int = 10_000, dim: int | None = None) -> DataFrame:
    """Deterministic bounded-round Lloyd k-means over an embedding
    column: hash-seeded init, ``iters`` assignment rounds with one
    integer centroid update between consecutive rounds (iters=2 means
    assign -> update -> assign). Returns (id_col, cluster_id, metric)
    where metric is the final scaled squared distance as a RAW double
    (bit-identical across engines by the fixed-fold construction;
    pre-rounding would REINTRODUCE engine skew: Spark's round is
    HALF_UP on the shortest decimal repr, DuckDB rounds binary)
    — every column replayable by the SQL oracle.

    Rounds are UNROLLED into one lazy plan (zero driver actions beyond
    the optional dim probe); like the other bounded-round analytics
    (katz, pagerank) this is the fixed-round form — convergence-driven
    k-means belongs to the numpy trainer feeding the ANN index."""
    assigned = _kmeans_assign_full(df, id_col, vec_col, k=k, iters=iters,
                                   scale=scale, dim=dim)
    return assigned.select(
        F.col("id").alias(id_col),
        F.col("cid").alias("cluster_id"),
        F.col("m").alias("metric"))


def _kmeans_assign_full(df: DataFrame, id_col: str, vec_col: str, *,
                        k: int, iters: int, scale: int,
                        dim: int | None) -> DataFrame:
    """kmeans_assign's internal form, keeping the quantized vector:
    (id, cid, qv, m) — semantic_dedup reuses qv so the source is
    quantized (and scanned) once instead of re-joined."""
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    if iters < 1:
        raise ValueError(f"iters must be >= 1, got {iters}")
    if dim is None:
        first = df.filter(F.col(vec_col).isNotNull()).select(vec_col).first()
        if first is None:
            raise ValueError("cannot infer dim from an all-null vector "
                             "column; pass dim=")
        dim = len(first[0])
    q = quantize_embeddings(df, id_col, vec_col, scale=scale)
    cent = _seed_centroids(q, k)
    assigned = _assign(q, cent, dim)
    for _ in range(iters - 1):
        cent = _update(assigned, dim)
        assigned = _assign(q, cent, dim)
    return assigned


def semantic_dedup(df: DataFrame, id_col: str, vec_col: str, *,
                   k: int = 8, iters: int = 2, threshold: float = 0.97,
                   scale: int = 10_000, dim: int | None = None) -> DataFrame:
    """SemDeDup (Abbas et al. 2023): k-means-cluster the embeddings,
    flag within-cluster pairs with cosine >= ``threshold`` (the RAW
    cosine double computed from the SAME integer quantization — exact
    dot and norms, deterministic IEEE sqrt/division, so the comparison
    is bit-identical across engines), then keep one document
    per connected near-dup group (transitive: A~B~C collapses to one
    survivor even when A and C never paired). Returns (id_col, keep_id,
    is_kept) for every CLUSTERED row — same contract as
    resolve_near_duplicates; unclustered rows are implicitly kept.

    keep_id is the connected-components representative, i.e. the
    STRING-minimum id — zero-pad numeric ids first if "10" < "9" would
    pick the wrong survivor (exactly the resolve_near_duplicates
    caveat).

    Scale: pair generation is per-cluster only (choose k so clusters
    stay bounded — the published recipe runs k ~ sqrt(N)); everything
    upstream is the kmeans plan above; the survivor pass is the
    O(log n)-round star-contraction components over the (tiny)
    near-dup graph."""
    side = _kmeans_assign_full(df, id_col, vec_col, k=k, iters=iters,
                               scale=scale, dim=dim).select("id", "cid",
                                                            "qv")
    a = side.select(F.col("cid"), F.col("id").alias("id1"),
                    F.col("qv").alias("q1"))
    b = side.select(F.col("cid"), F.col("id").alias("id2"),
                    F.col("qv").alias("q2"))
    dot = F.aggregate(F.zip_with("q1", "q2", lambda x, y: x * y),
                      F.lit(0).cast("long"), lambda acc, x: acc + x)
    n1 = F.aggregate("q1", F.lit(0).cast("long"), lambda acc, x: acc + x * x)
    n2 = F.aggregate("q2", F.lit(0).cast("long"), lambda acc, x: acc + x * x)
    # the RAW cosine double is bit-identical across engines (exact int
    # dot/norms, correctly-rounded IEEE sqrt/division) — compare it
    # directly; pre-rounding would reintroduce the Spark-HALF_UP vs
    # DuckDB-binary-round boundary skew the kmeans metric avoids
    cos = F.when((n1 == 0) | (n2 == 0), F.lit(0.0)).otherwise(
        dot.cast("double")
        / (F.sqrt(n1.cast("double")) * F.sqrt(n2.cast("double"))))
    pairs = (a.join(b, "cid")
             .filter(F.col("id1") < F.col("id2"))
             .select("id1", "id2", cos.alias("cos"))
             .filter(F.col("cos") >= F.lit(float(threshold))))
    from neo4j_document_pipeline_spark.operators.components import (
        connected_components)
    comp = connected_components(
        pairs.select(F.col("id1").alias("u"), F.col("id2").alias("v")))
    return comp.select(
        F.col("id").alias(id_col),
        F.col("component").alias("keep_id"),
        (F.col("id") == F.col("component")).alias("is_kept"))


def pca_project(df: DataFrame, id_col: str, vec_col: str, *,
                rounds: int = 3, scale: int = 10_000,
                vscale: int = 10_000, dim: int | None = None) -> DataFrame:
    """Top-principal-component projections by FIXED-ROUND power
    iteration in exact arithmetic -> (id_col, proj bigint): the
    1-D PCA embedding (data-aware dimensionality reduction for
    visualization buckets, coarse semantic sharding, drift probes)
    with the same reproducibility contract as ``kmeans_assign`` —
    every value is a pure function of the data, bit-identical across
    engines and partitionings, replayable by a plain-SQL oracle.

    Construction (all in-plan, zero driver actions):
    - quantize: qv_d = floor(x_d * scale + 0.5) int64;
    - center WITHOUT division: y_i = n * qv_i - S (S the exact per-dim
      int64 sum; scaling by n leaves the principal direction
      unchanged and keeps centering exact);
    - power iteration with an INTEGER iterate v (v0 = all ones):
        t_i = y_i . v                      (exact int64)
        w_d = Σ_i y_id * t_i               (exact decimal(38,0))
        v'  = floor(w * sgn / max|w| * vscale + 0.5)
      where the renormalization runs in double AFTER the exact decimal
      w is cast (correctly-rounded IEEE either engine, so still
      bit-identical), and sgn flips w so the first dimension achieving
      max|w| is positive — a deterministic sign convention (PCA is
      sign-ambiguous; without this, engines could converge to opposite
      signs);
    - output proj_i = y_i . v_final, exact int64 (scaled projection —
      callers wanting unit-norm scores divide by sqrt(Σ proj²), which
      would reintroduce doubles, so the exact form is what ships).

    Envelope: |y| <= 2 n scale max|x|; t <= dim * |y| * vscale must
    stay inside int64 — n below ~10^8 rows at the defaults (dim 64,
    |x| <= 1); w stays inside decimal(38,0) far beyond that. Power
    iteration converges linearly in the eigengap; ``rounds`` is a
    SPEC (fixed, replayable), not a convergence loop — bump it for
    near-degenerate spectra.
    """
    if rounds < 1:
        raise ValueError(f"rounds must be >= 1, got {rounds}")
    if dim is None:
        first = df.filter(F.col(vec_col).isNotNull()).select(vec_col).first()
        if first is None:
            raise ValueError("cannot infer dim from an all-null vector "
                             "column; pass dim=")
        dim = len(first[0])
    q = quantize_embeddings(df, id_col, vec_col, scale=scale)
    spark = df.sparkSession
    stats = q.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        *[F.sum(F.element_at("qv", d + 1)).alias(f"_s{d}")
          for d in range(dim)])
    stats = stats.select(
        "n", F.array(*[F.col(f"_s{d}") for d in range(dim)]).alias("S"))
    y = F.zip_with("qv", "S", lambda x, s: F.col("n") * x - s)
    pts = (q.crossJoin(F.broadcast(stats))
           .select("id", y.alias("y"))
           .localCheckpoint(eager=False))  # scanned once per round

    vdf = spark.range(1).select(
        F.array(*[F.lit(1).cast("bigint")] * dim).alias("v"))
    dec = "decimal(20,0)"
    for _ in range(rounds):
        t = F.aggregate(F.zip_with("y", "v", lambda a, b: a * b),
                        F.lit(0).cast("long"), lambda acc, x: acc + x)
        scored = pts.crossJoin(F.broadcast(vdf)).select(
            "id", "y", t.alias("t"))
        wagg = scored.agg(
            *[F.sum(F.element_at("y", d + 1).cast(dec)
                    * F.col("t").cast(dec)).alias(f"_w{d}")
              for d in range(dim)])
        w = wagg.select(
            F.array(*[F.col(f"_w{d}") for d in range(dim)]).alias("w"))
        m = F.array_max(F.transform("w", lambda x: F.abs(x)))
        first_max = F.element_at(
            F.filter("w", lambda x: F.abs(x) == m), 1)
        sgn = F.when(first_max < 0, F.lit(-1.0)).otherwise(F.lit(1.0))
        newv = F.when(
            m == F.lit(0).cast(dec),
            F.transform("w", lambda x: F.lit(0).cast("bigint"))
        ).otherwise(F.transform(
            "w",
            lambda x: F.floor(x.cast("double") * sgn / m.cast("double")
                              * F.lit(float(vscale)) + F.lit(0.5))
            .cast("bigint")))
        vdf = w.select(newv.alias("v"))

    t_fin = F.aggregate(F.zip_with("y", "v", lambda a, b: a * b),
                        F.lit(0).cast("long"), lambda acc, x: acc + x)
    return (pts.crossJoin(F.broadcast(vdf))
            .select(F.col("id").alias(id_col), t_fin.alias("proj")))
