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
