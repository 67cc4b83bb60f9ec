"""KG-embedding training-data generation — deterministic negative
sampling.

Training a link-prediction / KG-embedding model (TransE, DistMult,
ComplEx — all trained with corrupted-triple negatives, Bordes et al.
2013) needs, for every true (s, p, o), k corrupted triples (s, p, o')
whose o' is NOT a true object for (s, p). At 10^12 triples this is a
data-pipeline job, not a training-loop afterthought — and it must be
reproducible: the same corpus must yield the same negatives on any
cluster size, or training runs aren't comparable.

Construction (pure function of the data + salt, the engine's sha256
convention): attempt j for triple t draws candidate index
sha256('<salt>:<s>|<p>|<o>|<j>') (first 8 hex digits) mod pool_size,
equi-joins the entity pool on that index, drops self-replacements and
anything that collides with a TRUE triple (left-anti join — "filtered"
negative sampling, the variant that doesn't punish the model for
predicting actual facts), then keeps the first ``n_neg`` surviving
attempts per triple in attempt order. Everything is joins +
aggregations on exact integers/strings; no RNG state, no driver loop.

The pool must be DENSELY indexed 0..pool_size-1 (build it once with a
distributed rank — the token_shards prefix-sum pattern — or a plain
row_number for small pools). A hole in the index would silently
starve draws, so the pool join is guarded IN-PLAN: a drawn index with
no pool row raises instead of vanishing.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

_HASH_DENOM = 4294967296  # 2^32


def negative_triples(triples: DataFrame, pool: DataFrame,
                     pool_size: int, n_neg: int = 2, *,
                     attempts: int | None = None, salt: str = "v1",
                     subj_col: str = "subject",
                     pred_col: str = "predicate",
                     obj_col: str = "object",
                     pool_idx_col: str = "idx",
                     pool_ent_col: str = "entity") -> DataFrame:
    """(subject, predicate, neg_object, attempt) — up to ``n_neg``
    filtered corrupted objects per true triple, drawn deterministically.

    ``attempts`` (default n_neg + 8) caps the draw count; a triple
    whose draws all collide with true facts emits fewer negatives
    (deterministically — document/count downstream rather than
    resampling, which would break the pure-function property).
    ``pool_size`` must equal the pool's row count; too small silently
    ignores the pool tail, too large raises via the in-plan guard."""
    if n_neg < 1:
        raise ValueError(f"n_neg must be >= 1, got {n_neg}")
    if pool_size < 2:
        raise ValueError(f"pool_size must be >= 2, got {pool_size}")
    if attempts is None:
        attempts = n_neg + 8
    if attempts < n_neg:
        raise ValueError(f"attempts={attempts} < n_neg={n_neg}")
    t = triples.select(F.col(subj_col).alias("s"),
                       F.col(pred_col).alias("p"),
                       F.col(obj_col).alias("o")).distinct()
    p = pool.select(F.col(pool_idx_col).cast("long").alias("_idx"),
                    F.col(pool_ent_col).alias("_ent"))
    drawn = t.withColumn("attempt",
                         F.explode(F.array(*[F.lit(j)
                                             for j in range(attempts)])))
    h = F.sha2(F.concat_ws("|", F.concat(F.lit(f"{salt}:"), F.col("s")),
                           "p", "o", F.col("attempt").cast("string")), 256)
    drawn = drawn.withColumn(
        "_idx", (F.conv(F.substring(h, 1, 8), 16, 10).cast("long")
                 % F.lit(pool_size)))
    cand = (drawn.join(p, "_idx", "left")
            .select("s", "p", "o", "attempt",
                    # LOAD-BEARING guard: a hole in the dense index (or
                    # pool_size > actual rows) must fail, not vanish
                    F.when(F.col("_ent").isNotNull(), F.col("_ent"))
                    .otherwise(F.raise_error(F.concat(
                        F.lit("negative_triples: drawn pool index "),
                        F.col("_idx").cast("string"),
                        F.lit(" has no entity — pool not densely "
                              "indexed 0..pool_size-1"))))
                    .alias("neg_object")))
    cand = cand.filter(F.col("neg_object") != F.col("o"))
    survivors = cand.join(
        t.select("s", "p", F.col("o").alias("neg_object")),
        ["s", "p", "neg_object"], "left_anti")
    w = Window.partitionBy("s", "p", "o").orderBy("attempt")
    return (survivors.withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") <= n_neg)
            .select(F.col("s").alias(subj_col),
                    F.col("p").alias(pred_col),
                    "neg_object", "attempt"))


def sample_neighborhoods(edges: DataFrame, seeds: DataFrame,
                         fanouts: list[int] | tuple[int, ...], *,
                         src_col: str = "src", dst_col: str = "dst",
                         seed_col: str = "id", directed: bool = False,
                         salt: str = "v1") -> DataFrame:
    """Deterministic GraphSAGE-style neighbor sampling (Hamilton et
    al., NeurIPS 2017): the k-hop sampled computation graphs GNN /
    KG-embedding mini-batch training consumes. For each seed (root),
    hop h samples at most ``fanouts[h-1]`` neighbors of every frontier
    node; the output is the edge set of the sampled trees,
    ``(root, hop, src, dst)``.

    The draw is a pure function of the data: neighbors rank by the
    uniform hash of ``salt:hop:root:src:dst`` (ties by dst string), so
    the same (seeds, edges, salt) yields the SAME computation graphs on
    any partitioning, cluster size, or engine — reproducible training
    batches and an exactly-replayable DuckDB oracle, where
    ``df.sample``/``rand()`` would be neither. Different roots draw
    independently at a shared node (the hash includes root); a new salt
    redraws the whole batch (epoch re-sampling).

    Scale: hop volume is bounded by |seeds|·∏fanouts regardless of
    degree skew — a hub neighbor list is ranked with ONE per-(root,src)
    window over candidate edges (partial shuffle on the frontier keys),
    never materialized whole per root. The frontier↔edges join is a
    plain hash equi-join on src, the partitioning a trillion-edge table
    is already bucketed by.
    """
    fanouts = list(fanouts)
    if not fanouts or any((not isinstance(f, int)) or f < 1
                          for f in fanouts):
        raise ValueError(
            f"fanouts must be a non-empty list of positive ints, "
            f"got {fanouts!r}")
    e = edges.select(F.col(src_col).cast("string").alias("src"),
                     F.col(dst_col).cast("string").alias("dst")) \
        .filter(F.col("src") != F.col("dst")).distinct()
    if not directed:
        e = e.union(e.select(F.col("dst").alias("src"),
                             F.col("src").alias("dst"))).distinct()
    frontier = seeds.select(
        F.col(seed_col).cast("string").alias("root")).distinct() \
        .withColumn("node", F.col("root"))
    out = None
    for hop, f in enumerate(fanouts, start=1):
        cand = (frontier.join(e, frontier["node"] == e["src"])
                .select("root", F.lit(hop).alias("hop"), "src", "dst"))
        from neo4j_document_pipeline_spark.operators.sampling import (
            uniform_hash_col)
        key = F.concat_ws(":", F.lit(str(hop)), F.col("root"),
                          F.col("src"), F.col("dst"))
        h = uniform_hash_col(key, salt)
        w = Window.partitionBy("root", "src").orderBy(h.asc(),
                                                      F.col("dst").asc())
        sampled = (cand.withColumn("_rn", F.row_number().over(w))
                   .filter(F.col("_rn") <= f).drop("_rn")
                   .localCheckpoint())
        out = sampled if out is None else out.unionByName(sampled)
        frontier = sampled.select("root",
                                  F.col("dst").alias("node")).distinct()
    return out
