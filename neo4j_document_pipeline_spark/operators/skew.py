"""Explicit skew handling — salting helpers for head-heavy keys.

The north rule requires explicit partitioning/skew handling for
Common-Crawl-style inputs: Zipf head domains and celebrity entities
concentrate orders of magnitude more rows on a few keys. AQE's skew-join
splitting covers sort-merge joins; these helpers cover the two cases AQE
does NOT fix:

1. ``salted_aggregate`` — a groupBy whose per-key state is large (e.g.
   collect_set over a celebrity entity). Two-phase: salt the key into S
   sub-keys (partial aggregate), then merge the S partials. Works for any
   algebraic aggregation given (partial_aggs, merge_aggs).

2. ``salted_join`` — joining a skewed fact side against a dimension too
   big to broadcast: replicate each dim row S ways, salt the fact side
   randomly-but-deterministically, join on (key, salt).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def with_salt(df: DataFrame, key_cols: list[str], buckets: int,
              salt_col: str = "_salt") -> DataFrame:
    """Deterministic salt derived from the whole row's hash — spreads a
    hot key's rows uniformly over ``buckets`` sub-keys."""
    return df.withColumn(
        salt_col, F.pmod(F.hash(*[F.col(c) for c in df.columns]), F.lit(buckets))
    )


def salted_aggregate(df: DataFrame, keys: list[str],
                     partial_aggs: list, merge_aggs: list,
                     buckets: int = 8) -> DataFrame:
    """Two-phase skew-proof aggregation.

    ``partial_aggs``: aggregations over (keys + salt) sub-groups.
    ``merge_aggs``: aggregations that combine the sub-group partials
    (their input column names are the partial aliases).

    Example — skew-proof distinct-sources count:
        salted_aggregate(df, ["entity_id"],
            [F.collect_set("doc_id").alias("s")],
            [F.size(F.array_distinct(F.flatten(F.collect_list("s")))).alias("n_sources")])
    """
    salted = with_salt(df, keys, buckets)
    partial = salted.groupBy(*keys, "_salt").agg(*partial_aggs)
    return partial.groupBy(*keys).agg(*merge_aggs)


def salted_join(fact: DataFrame, dim: DataFrame, key: str,
                buckets: int = 8, how: str = "inner") -> DataFrame:
    """Skewed-fact x dimension join: replicate dim ``buckets`` ways, salt
    fact rows, join on (key, salt). Shuffle partitions for a hot key are
    split ``buckets`` ways at the cost of a ``buckets``x dim replication."""
    if how not in ("inner", "left", "left_outer", "leftsemi", "left_semi",
                   "leftanti", "left_anti", "cross"):
        # the dim side is replicated `buckets` ways: right/full outer
        # would surface each unmatched dim row `buckets` times
        raise ValueError(f"salted_join does not support how={how!r}: "
                         "dim-side replication breaks right/full outer")
    dim_rep = dim.withColumn(
        "_salt", F.explode(F.sequence(F.lit(0), F.lit(buckets - 1))))
    fact_salted = fact.withColumn(
        "_salt", F.pmod(F.hash(*[F.col(c) for c in fact.columns]), F.lit(buckets)))
    out = fact_salted.join(dim_rep, [key, "_salt"], how)
    return out.drop("_salt")


def top_heavy_keys(df: DataFrame, keys: list[str], threshold_ratio: float = 0.01,
                   max_keys: int = 100) -> DataFrame:
    """Diagnostic: keys holding more than threshold_ratio of all rows —
    the candidates for salting / separate broadcast handling."""
    total = df.count()
    return (
        df.groupBy(*keys).count()
        .filter(F.col("count") >= max(1.0, threshold_ratio * total))
        .orderBy(F.col("count").desc())
        .limit(max_keys)
    )
