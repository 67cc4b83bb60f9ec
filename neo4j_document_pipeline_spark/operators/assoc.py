"""Market-basket association rules — pairwise support / confidence /
lift (Agrawal & Srikant 1994, the Apriori statistics at the k=2 level
that covers almost all production use).

The same wedge shape as the co-purchase graph: items sharing a basket
pair up through one self-equi-join on the basket key, bounded by
basket sizes (never all-pairs over the catalog); item and basket
totals are map-combinable counts; the basket denominator folds into
the plan as a 1-row scalar aggregate (the accepted broadcast fold —
no driver action). Emitted per DIRECTED rule a->b:

    support    = c(a,b) / n_baskets
    confidence = c(a,b) / c(a)
    lift       = confidence / (c(b) / n_baskets)

``min_pair_count`` prunes the long tail BEFORE the ratio math (exact
counts, so pruning is deterministic); ``min_confidence`` filters the
emitted rules. All counts are exact integers; ratios are emitted
rounded (6dp), the engine-parity convention.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def market_basket_rules(baskets: DataFrame, *,
                        basket_col: str = "basket",
                        item_col: str = "item",
                        min_pair_count: int = 2,
                        min_confidence: float = 0.0) -> DataFrame:
    """(antecedent, consequent, pair_count, support, confidence, lift)
    for every directed item pair co-occurring in >= min_pair_count
    baskets with confidence >= min_confidence."""
    if min_pair_count < 1:
        raise ValueError(
            f"min_pair_count must be >= 1, got {min_pair_count}")
    b = (baskets.select(F.col(basket_col).alias("bk"),
                        F.col(item_col).alias("it")).distinct()
         .localCheckpoint(eager=False))
    n_baskets = b.select("bk").distinct().agg(
        F.count(F.lit(1)).alias("_n"))
    item_counts = b.groupBy("it").agg(F.count(F.lit(1)).alias("_c"))
    x, y = b.alias("x"), b.alias("y")
    pairs = (x.join(y, (F.col("x.bk") == F.col("y.bk"))
                    & (F.col("x.it") != F.col("y.it")))
             .groupBy(F.col("x.it").alias("antecedent"),
                      F.col("y.it").alias("consequent"))
             .agg(F.count(F.lit(1)).alias("pair_count"))
             .filter(F.col("pair_count") >= min_pair_count))
    out = (pairs
           .join(item_counts.select(F.col("it").alias("antecedent"),
                                    F.col("_c").alias("_ca")),
                 "antecedent")
           .join(item_counts.select(F.col("it").alias("consequent"),
                                    F.col("_c").alias("_cb")),
                 "consequent")
           .crossJoin(F.broadcast(n_baskets)))
    conf = F.col("pair_count") / F.col("_ca")
    return (out.select(
        "antecedent", "consequent", "pair_count",
        F.round(F.col("pair_count") / F.col("_n"), 6).alias("support"),
        F.round(conf, 6).alias("confidence"),
        F.round(conf / (F.col("_cb") / F.col("_n")), 6).alias("lift"))
        .filter(F.col("confidence") >= min_confidence))
