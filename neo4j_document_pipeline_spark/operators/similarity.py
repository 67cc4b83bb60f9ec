"""Similarity search over an embedding column (array<float>).

- brute-force cosine top-k: the exactness baseline, fully JVM-side
  (zip_with + aggregate -> whole-stage codegen; TakeOrderedAndProject for
  the top-k — no full sort);
- LSH-bucketed variant: random-hyperplane buckets prune the scan; probes
  the query's bucket +/- multi-probe neighbors, then exact re-rank.
  The scale path when the corpus is billions of vectors.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _dot_col(vec_col: str, q: list[float]):
    qa = F.array(*[F.lit(float(x)) for x in q])
    return F.aggregate(F.zip_with(F.col(vec_col), qa, lambda a, b: a * b),
                       F.lit(0.0), lambda acc, x: acc + x)


def cosine_score(vec_col: str, q: list[float]):
    dot = _dot_col(vec_col, q)
    nv = F.sqrt(F.aggregate(F.col(vec_col), F.lit(0.0), lambda acc, x: acc + x * x))
    nq = float(np.sqrt(sum(x * x for x in q)))
    return F.when((nv == 0) | (F.lit(nq) == 0.0), F.lit(0.0)).otherwise(
        dot / (nv * F.lit(nq)))


def brute_force_topk(df: DataFrame, id_col: str, vec_col: str,
                     query: list[float], k: int = 10) -> DataFrame:
    """Exact cosine top-k. orderBy+limit compiles to TakeOrderedAndProject
    (per-partition heap + driver merge — no global sort shuffle)."""
    return (
        df.select(F.col(id_col), cosine_score(vec_col, query).alias("score"))
        .orderBy(F.col("score").desc(), F.col(id_col))
        .limit(k)
    )


def lsh_bucketed_topk(df: DataFrame, id_col: str, vec_col: str,
                      query: list[float], k: int = 10,
                      n_planes: int = 8, seed: int = 42,
                      multiprobe: int = 1) -> DataFrame:
    """Hyperplane-LSH pre-filter + exact re-rank.

    Buckets = sign pattern of ``n_planes`` random projections. The probe
    set is the query bucket plus all buckets within Hamming distance
    ``multiprobe`` (recall knob). At scale the bucket id becomes the
    table's partition column -> partition pruning does the scan skip."""
    d = len(query)
    rng = np.random.RandomState(seed)
    planes = rng.normal(size=(n_planes, d))

    def bucket_col(vec_col_name: str):
        bits = []
        for p in range(n_planes):
            dot = F.aggregate(
                F.zip_with(F.col(vec_col_name),
                           F.array(*[F.lit(float(x)) for x in planes[p]]),
                           lambda a, b: a * b),
                F.lit(0.0), lambda acc, x: acc + x)
            bits.append(F.when(dot >= 0, F.lit(1 << p)).otherwise(F.lit(0)))
        return sum(bits[1:], bits[0])

    qsigns = [1 if planes[p] @ np.asarray(query) >= 0 else 0 for p in range(n_planes)]
    qbucket = sum((s << p) for p, s in enumerate(qsigns))
    probes = {qbucket}
    if multiprobe >= 1:
        for p in range(n_planes):
            probes.add(qbucket ^ (1 << p))
    if multiprobe >= 2:
        for p in range(n_planes):
            for p2 in range(p + 1, n_planes):
                probes.add(qbucket ^ (1 << p) ^ (1 << p2))

    pruned = df.withColumn("_bucket", bucket_col(vec_col)) \
               .filter(F.col("_bucket").isin(list(probes)))
    return brute_force_topk(pruned.drop("_bucket"), id_col, vec_col, query, k)


def pairwise_topk_join(left: DataFrame, right: DataFrame,
                       id_left: str, id_right: str,
                       vec_left: str, vec_right: str,
                       k: int = 5) -> DataFrame:
    """For each left row, its top-k most-cosine-similar right rows.
    Broadcast the smaller right side; per-left-row ranking via window."""
    from pyspark.sql import Window
    l = left.select(F.col(id_left).alias("lid"), F.col(vec_left).alias("lv"))
    r = right.select(F.col(id_right).alias("rid"), F.col(vec_right).alias("rv"))
    dot = F.aggregate(F.zip_with("lv", "rv", lambda a, b: a * b),
                      F.lit(0.0), lambda acc, x: acc + x)
    nl = F.sqrt(F.aggregate("lv", F.lit(0.0), lambda acc, x: acc + x * x))
    nr = F.sqrt(F.aggregate("rv", F.lit(0.0), lambda acc, x: acc + x * x))
    scored = (
        l.join(F.broadcast(r))
        .withColumn("score", F.when((nl == 0) | (nr == 0), F.lit(0.0))
                    .otherwise(dot / (nl * nr)))
    )
    w = Window.partitionBy("lid").orderBy(F.col("score").desc(), F.col("rid"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("lid", "rid", "score", "rank")
    )
