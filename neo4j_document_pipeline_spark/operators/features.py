"""ML feature preparation: smoothed target encoding + standardization.

The engine already exports training data (sampling.py, prepare); a
model trained ON that data needs features. Two classic, leakage-prone
transforms done right as pure aggregations:

- ``target_encode``: per-category smoothed target means (the public
  "impact/mean encoding" with additive smoothing — Micci-Barreca,
  SIGKDD Explorations 2001): encoded = (sum + alpha * global_mean) /
  (n + alpha). Rare categories shrink toward the global mean instead
  of memorizing noise. Returns the ENCODER TABLE (one row per
  category) rather than row-level joins — at 100 TB the encoder is a
  KB-sized broadcast dimension, and returning it separately is what
  lets the caller fit on train and apply to eval without leakage.
  With an integral target column the sums stay exact int64, so the
  encoder is bit-deterministic across partitionings.
- ``standard_scale``: z-score standardization with IN-PLAN mean/std
  (one broadcast 1-row aggregate — no driver action, no second scan
  per column).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def target_encode(df: DataFrame, cat_col: str, target_col: str, *,
                  alpha: float = 20.0) -> DataFrame:
    """Smoothed target-mean encoder table:
    (category, n, target_mean, encoded).

    ``encoded = (sum_cat + alpha * global_mean) / (n_cat + alpha)``;
    ``alpha`` is the pseudo-count pulling small categories toward the
    global mean (alpha=0 is the raw mean). NULL categories form their
    own row (they are a real level at inference time); NULL targets
    are excluded from both sums. The global mean rides the plan as a
    broadcast 1-row aggregate.
    """
    if alpha < 0:
        raise ValueError(f"alpha must be >= 0, got {alpha}")
    base = df.select(F.col(cat_col).alias("category"),
                     F.col(target_col).alias("_t")) \
        .filter(F.col("_t").isNotNull())
    per_cat = base.groupBy("category").agg(
        F.count(F.lit(1)).alias("n"), F.sum("_t").alias("_s"))
    glob = base.agg(
        (F.sum("_t").cast("double") / F.count(F.lit(1)))
        .alias("_gm"))
    return (per_cat.crossJoin(F.broadcast(glob))
            .select(
                "category", "n",
                (F.col("_s").cast("double") / F.col("n"))
                .alias("target_mean"),
                ((F.col("_s").cast("double")
                  + F.lit(float(alpha)) * F.col("_gm"))
                 / (F.col("n") + F.lit(float(alpha))))
                .alias("encoded")))


def standard_scale(df: DataFrame, cols: list[str],
                   suffix: str = "_z") -> DataFrame:
    """Append z-score columns ``<col><suffix>`` for each numeric col:
    (x - mean) / stddev_pop, with the moments folded into the plan as
    one broadcast aggregate row. Constant columns (std 0) yield NULL
    z-scores (no scale exists) rather than Inf."""
    if not cols:
        raise ValueError("standard_scale needs at least one column")
    stats = df.agg(*[a for c in cols
                     for a in (F.avg(F.col(c)).alias(f"_mu_{c}"),
                               F.stddev_pop(F.col(c)).alias(f"_sd_{c}"))])
    out = df.crossJoin(F.broadcast(stats))
    for c in cols:
        z = F.when(F.col(f"_sd_{c}") > 0,
                   (F.col(c) - F.col(f"_mu_{c}")) / F.col(f"_sd_{c}"))
        out = out.withColumn(f"{c}{suffix}", z)
    return out.drop(*[f"_mu_{c}" for c in cols],
                    *[f"_sd_{c}" for c in cols])


def hashed_tf(df: DataFrame, id_col: str, text_col: str, *,
              dim: int = 1024, signed: bool = True,
              salt: str = "ht") -> DataFrame:
    """Hashing-trick term-frequency features (Weinberger et al., ICML
    2009) -> SPARSE rows (id_col, bucket, weight): each token hashes to
    a bucket in [0, dim) and, when ``signed``, contributes +1/-1 by a
    second hash bit — the signed sum makes collisions cancel in
    expectation instead of biasing upward. This is the vectorizer that
    needs NO vocabulary pass: the feature space is fixed a priori, so
    featurization is one narrow map + one aggregate at any corpus size
    and two corpora hashed with the same (dim, salt) are directly
    comparable (the property a streaming/incremental trainer needs).

    Both hashes come from one sha256 of '<salt>:<token>' (bucket =
    first 8 hex digits mod dim, sign = parity of the 9th) — a pure
    function of the token, bit-replayable in any engine. Entries whose
    signed sum cancels to exactly 0 are dropped (a zero entry is not
    part of a sparse vector). ``hashed_tf_dense`` assembles the dense
    array at the trainer boundary.

    Scale: explode (narrow) + one (id, bucket) hash aggregate,
    map-side combinable; output is bounded by tokens, never dim x docs.
    """
    if dim < 1:
        raise ValueError(f"hashed_tf: dim must be >= 1, got {dim}")
    toks = df.select(F.col(id_col),
                     F.explode(_tokens(F.col(text_col))).alias("term"))
    h = F.sha2(F.concat(F.lit(f"{salt}:"), F.col("term")), 256)
    bucket = F.conv(F.substring(h, 1, 8), 16, 10).cast("long") % dim
    sign = (F.lit(1) - 2 * (F.conv(F.substring(h, 9, 1), 16, 10)
                            .cast("long") % 2)
            if signed else F.lit(1))
    return (toks.select(F.col(id_col), bucket.alias("bucket"),
                        sign.cast("long").alias("_s"))
            .groupBy(id_col, "bucket").agg(F.sum("_s").alias("weight"))
            .filter(F.col("weight") != 0))


def hashed_tf_dense(sparse: DataFrame, id_col: str, *,
                    dim: int) -> DataFrame:
    """Assemble ``hashed_tf`` sparse rows into dense double arrays ->
    (id_col, features array<double>) — the trainer-boundary form.
    One aggregate per id (collect the <= doc-length entries into a
    map), then an in-plan sequence/transform fill; absent buckets are
    0.0 by construction."""
    return (sparse.groupBy(id_col)
            .agg(F.map_from_entries(
                F.collect_list(F.struct("bucket", "weight")))
                .alias("_m"))
            .select(F.col(id_col), F.transform(
                F.sequence(F.lit(0), F.lit(dim - 1)),
                lambda i: F.coalesce(
                    F.element_at("_m", i.cast("long")).cast("double"),
                    F.lit(0.0))).alias("features")))


def _tokens(c):
    from neo4j_document_pipeline_spark.functions.textstats import (
        col_tokens)
    return col_tokens(c)
