"""Connected components — alternating large-star / small-star.

The reference has no canonicalization beyond normalized-key dedup at read
time (graphutil.py:640-674); the north star requires entity
canonicalization via connected components over entity-link edges, as pure
DataFrame ops (no GraphFrames dependency).

Algorithm (Kiveris et al., "Connected Components in MapReduce and
Beyond", SoCC'14 — public): alternate

  large-star: for every node u, connect every STRICTLY LARGER neighbor v
              to the minimum of u's closed neighborhood;
  small-star: direct edges high->low; connect every smaller-or-equal
              neighbor (and u itself) to the minimum of that neighborhood;

until the edge set reaches a fixpoint. Converges in O(log^2 n) rounds;
every round is two hash aggregations + a join, hash-partitioned on node
id. ``localCheckpoint`` truncates lineage each round (SURVEY §4 item 2).

Node ids are arbitrary strings; ordering is lexicographic (sha256 ids ->
uniform partitioning, no skew).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _bidir(e: DataFrame) -> DataFrame:
    return e.union(e.select(F.col("v").alias("u"), F.col("u").alias("v")))


def _large_star(e: DataFrame) -> DataFrame:
    nbrs = _bidir(e)
    m = nbrs.groupBy("u").agg(F.min("v").alias("mn"))
    m = m.withColumn("mn", F.least("mn", "u"))
    return (
        nbrs.join(m, "u")
        .filter(F.col("v") > F.col("u"))
        .select(F.col("v").alias("u"), F.col("mn").alias("v"))
        .filter(F.col("u") != F.col("v"))
        .distinct()
    )


def _small_star(e: DataFrame) -> DataFrame:
    # direct each edge from the larger endpoint to the smaller
    directed = e.select(
        F.greatest("u", "v").alias("u"), F.least("u", "v").alias("v")
    ).filter(F.col("u") != F.col("v"))
    m = directed.groupBy("u").agg(F.min("v").alias("mn"))
    m = m.withColumn("mn", F.least("mn", "u"))
    out = (
        directed.join(m, "u")
        .select(F.col("v").alias("u"), F.col("mn").alias("v"))
        .union(m.select(F.col("u"), F.col("mn").alias("v")))
        .filter(F.col("u") != F.col("v"))
        .distinct()
    )
    return out


def _checksum(e: DataFrame) -> tuple:
    row = (
        e.select(F.crc32(F.concat_ws("|", "u", "v")).alias("h"))
        .agg(F.count("*"), F.sum("h"), F.expr("bit_xor(h)"))
        .first()
    )
    return tuple(row)


def connected_components(edges: DataFrame, max_iter: int = 20) -> DataFrame:
    """edges(u string, v string) -> (id string, component string) where
    component is the minimum node id of the connected component.

    Nodes appearing only as singletons are the caller's concern (left-join
    the result and coalesce to the node's own id)."""
    e = (
        edges.select(F.col("u").cast("string"), F.col("v").cast("string"))
        .filter(F.col("u") != F.col("v"))
        .distinct()
        .localCheckpoint()
    )
    prev = None
    converged = False
    for _ in range(max_iter):
        e = _small_star(_large_star(e)).localCheckpoint()
        cur = _checksum(e)
        if cur == prev:
            converged = True
            break
        prev = cur
    if not converged:
        # a silently-truncated fixpoint splits components (groupBy-min
        # then assigns one true component several ids) — fail loudly;
        # alternating star rounds converge in O(log n), so max_iter=20
        # covers any realistic graph and hitting it means something is wrong
        raise RuntimeError(
            f"connected_components did not converge within {max_iter} "
            "iterations; raise max_iter")
    # fixpoint: every edge points a node at its component min
    members = e.select(F.col("u").alias("id"), F.col("v").alias("component"))
    roots = e.select(F.col("v").alias("id"), F.col("v").alias("component")).distinct()
    return (
        members.union(roots)
        .groupBy("id").agg(F.min("component").alias("component"))
    )
