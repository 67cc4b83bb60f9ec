"""Multi-dimensional data layout: Z-order (Morton) clustering keys.

At 100 TB the single biggest read-path lever after partition pruning
is FILE SKIPPING on min/max column statistics — and min/max stats
only prune when the layout CLUSTERS each column. Sorting clusters one
column perfectly and leaves every other column spanning the full
range in every file; interleaving the bits of several columns
(Z-order / Morton order — the public technique behind Delta Lake's
OPTIMIZE ZORDER BY and Iceberg's sort-order zorder transform) bounds
EVERY participating column's min/max width in every file to ~range /
2^(bits_per_file / n_cols).

``zorder_key`` computes the Morton key with EXACT integer arithmetic:

    bucket_c = (x_c - min_c) * 2^bits DIV (max_c - min_c + 1)
    z        = Σ_c Σ_j  bit_j(bucket_c) << (j * n_cols + c)

Min/max ride the plan as a broadcast 1-row aggregate (no driver
action); integer DIV makes the bucketing bit-reproducible across
engines — the DuckDB oracle replays it verbatim. Write path:
``df.repartitionByRange(N, "zkey")`` then sortWithinPartitions on
zkey — range boundaries on z ARE rectangles in the original space.

``zorder_partition_stats`` is the evidence half: bucket rows by the
TOP bits of z (exactly what range-partitioning the z space does),
measure each bucket's per-column min/max width, and report the mean
fraction of the global range a bucket covers per column. Under a
linear sort the non-leading columns' fraction is ~1.0; under
Z-order every column's fraction shrinks toward 2^-(prefix_bits /
n_cols) — the number that turns "Z-order helps skipping" from a
claim into a measured invariant.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def zorder_key(df: DataFrame, cols: list[str], *, bits: int = 16,
               out_col: str = "zkey") -> DataFrame:
    """Append an exact-integer Morton key over ``cols`` (numeric,
    cast to bigint; nulls map to bucket 0 — they sort first, as in a
    null-first sort layout). ``bits`` per column; n_cols * bits must
    fit in a signed 64-bit key.
    """
    n = len(cols)
    if n == 0:
        raise ValueError("zorder_key needs at least one column")
    if n * bits > 63:
        raise ValueError(f"{n} cols x {bits} bits exceeds the 63-bit "
                         f"signed key budget")
    # one broadcast row carrying every column's min/max
    stats = df.agg(*[a for c in cols
                     for a in (F.min(F.col(c).cast("bigint")).alias(f"_mn_{c}"),
                               F.max(F.col(c).cast("bigint")).alias(f"_mx_{c}"))])
    out = df.crossJoin(F.broadcast(stats))
    z = F.lit(0).cast("bigint")
    scale = F.lit(1 << bits).cast("bigint")
    for ci, c in enumerate(cols):
        x = F.col(c).cast("bigint")
        mn, mx = F.col(f"_mn_{c}"), F.col(f"_mx_{c}")
        # bucketing runs as (x-mn)*2^bits / (range+1) in DOUBLE, which
        # is exactly floor division only while the numerator stays
        # inside 2^53 — guard it IN-PLAN (the min/max live in the plan,
        # not the driver), load-bearing via the same coalesce(assert,0)
        # add-zero trick as range_join so Catalyst can't prune it
        guard = F.coalesce(
            F.assert_true(
                (mx - mn + 1) <= F.lit(1 << (53 - bits)).cast("bigint"),
                f"zorder_key: column range exceeds 2^{53 - bits} — "
                f"the {bits}-bit bucketing would lose exactness; "
                "pre-bucket the column or lower bits",
            ).cast("bigint"),
            F.lit(0).cast("bigint"))
        # exact integer bucketing: (x-mn)*2^bits DIV (range+1) in
        # [0, 2^bits-1]; constant columns (range 0) bucket to 0
        bucket = F.when(
            x.isNull(), F.lit(0).cast("bigint")
        ).otherwise(F.floor((x - mn + guard) * scale
                            / (mx - mn + 1)).cast("bigint"))
        for j in range(bits):
            bit = F.shiftright(bucket, j).bitwiseAND(F.lit(1).cast("bigint"))
            z = z.bitwiseOR(F.shiftleft(bit, j * n + ci))
    return out.withColumn(out_col, z).drop(
        *[f"_mn_{c}" for c in cols], *[f"_mx_{c}" for c in cols])


def zorder_partition_stats(df: DataFrame, cols: list[str], *,
                           bits: int = 16, prefix_bits: int = 4) -> DataFrame:
    """Skipping evidence: bucket rows by the top ``prefix_bits`` of
    their Morton key (the buckets a range partitioner on z would
    cut), and per column report the MEAN fraction of the global range
    a bucket's [min, max] spans, plus bucket count and rows.

    Output: one row per column —
    (col, n_buckets, n_rows, mean_span_fraction).
    A perfect linear sort on col_0 gives col_0 ~1/n_buckets and every
    other column ~1.0; Z-order gives every column
    ~2^-(prefix_bits / n_cols). Pure aggregation over the keyed frame.
    """
    n = len(cols)
    if not 0 < prefix_bits <= n * bits:
        # a larger prefix_bits makes shiftright use a negative shift
        # count — meaningless buckets and garbage span stats, silently
        raise ValueError(
            f"prefix_bits must be in (0, n_cols*bits] = (0, {n * bits}], "
            f"got {prefix_bits}")
    keyed = zorder_key(df, cols, bits=bits, out_col="_z")
    bucket = F.shiftright(F.col("_z"), n * bits - prefix_bits)
    per_bucket = (keyed.withColumn("_zb", bucket)
                  .groupBy("_zb")
                  .agg(F.count(F.lit(1)).alias("_rows"),
                       *[a for c in cols
                         for a in (F.min(F.col(c).cast("bigint")).alias(f"_bmn_{c}"),
                                   F.max(F.col(c).cast("bigint")).alias(f"_bmx_{c}"))]))
    gstats = df.agg(*[a for c in cols
                      for a in (F.min(F.col(c).cast("bigint")).alias(f"_gmn_{c}"),
                                F.max(F.col(c).cast("bigint")).alias(f"_gmx_{c}"))])
    joined = per_bucket.crossJoin(F.broadcast(gstats))
    per_col = []
    for c in cols:
        frac = ((F.col(f"_bmx_{c}") - F.col(f"_bmn_{c}") + 1).cast("double")
                / (F.col(f"_gmx_{c}") - F.col(f"_gmn_{c}") + 1))
        per_col.append(joined.select(
            F.lit(c).alias("col"), F.col("_rows"), frac.alias("_frac")))
    allc = per_col[0]
    for p in per_col[1:]:
        allc = allc.unionByName(p)
    return (allc.groupBy("col")
            .agg(F.count(F.lit(1)).alias("n_buckets"),
                 F.sum("_rows").alias("n_rows"),
                 F.avg("_frac").alias("mean_span_fraction")))


def balanced_partitions(edges: DataFrame, k: int, *, iters: int = 2,
                        salt: str = "part",
                        init: DataFrame | None = None,
                        weight_col: str | None = None,
                        node_weights: DataFrame | None = None) -> DataFrame:
    """Deterministic balanced k-way graph partitioning — the LPA-with-
    capacity scheme of Spinner (Martella et al., ICDE 2017), the move
    that turns "hash-partition the edge list" into "co-locate
    neighborhoods": initialize every node to a uniform sha256 bucket,
    then for ``iters`` synchronous rounds move each node to the
    candidate partition maximizing neighbor affinity MINUS a load
    penalty. Downstream, graph algorithms (PageRank, BFS, LPA — one
    shuffle per round on the edge partitioning) see most edges become
    partition-local while the load bound keeps stragglers away.

    The score is kept in EXACT integers so the argmax is bit-replayable
    on any engine: Spinner's  c(v,p)/deg(v) − load(p)/(n/k)  is
    multiplied through by the positive constant deg(v)·n giving
    S(v,p) = c(v,p)·n − k·load(p)·deg(v); ties break on the smaller
    partition id. Candidates per node are its NEIGHBOR partitions plus
    its current one — bounded by degree, never the k cross product.

    Scale: per round, one (src, part) count over edges joined to the
    k-row load table and a 1-row n fold (both broadcast, in-plan —
    zero driver actions per round), then a map-combinable
    max(struct) argmax. No windows, no collect; ``localCheckpoint``
    per round truncates lineage.

    Returns (id string, part int). Singleton-free by construction
    (nodes appear via edges); isolated vertices can hash anywhere
    without affecting the cut.

    ``init``: optional starting assignment (id, part) — the projected
    labels of a coarser level in multilevel refinement
    (:func:`multilevel_partitions`); nodes absent from it fall back to
    the hash bucket, out-of-range parts raise via the modulo bound
    being applied only to the hash path (caller contract).

    ``weight_col`` / ``node_weights``: integer edge weights (parallel
    adjacency a coarse edge carries) and per-node sizes (id, size —
    supernode member counts); the score generalizes to
    S = c_w·W − k·load_w·deg_w with W the total node weight, every
    term still an exact integer, and with all weights 1 it reduces to
    the unweighted formula BIT-identically (the unweighted oracles
    stay green through this extension). Nulled/non-positive edge
    weights are dropped (a zero-weight edge is no edge); nodes absent
    from ``node_weights`` weigh 1.
    """
    if k < 2:
        raise ValueError(f"k must be >= 2, got {k}")
    if iters < 0:
        raise ValueError(f"iters must be >= 0, got {iters}")
    if weight_col is None:
        # canonical distinct so inputs carrying both orientations
        # collapse (the pre-weights union().distinct() semantics)
        e = (edges.select(F.least(F.col("u").cast("string"),
                                  F.col("v").cast("string")).alias("u"),
                          F.greatest(F.col("u").cast("string"),
                                     F.col("v").cast("string")).alias("v"))
             .filter(F.col("u") != F.col("v")).distinct()
             .select("u", "v", F.lit(1).cast("long").alias("w")))
    else:
        e = (edges.select(F.least(F.col("u").cast("string"),
                                  F.col("v").cast("string")).alias("u"),
                          F.greatest(F.col("u").cast("string"),
                                     F.col("v").cast("string")).alias("v"),
                          F.col(weight_col).cast("long").alias("w"))
             .filter((F.col("u") != F.col("v")) & (F.col("w") > 0))
             .groupBy("u", "v").agg(F.sum("w").alias("w")))
    und = (e.union(e.select(F.col("v").alias("u"), F.col("u").alias("v"),
                            "w"))
           .localCheckpoint())
    nodes = und.select(F.col("u").alias("id")).distinct()
    if node_weights is None:
        sz = nodes.select("id", F.lit(1).cast("long").alias("size"))
    else:
        sz = (nodes.join(node_weights.select("id", F.col("size")
                                             .cast("long").alias("size")),
                         "id", "left")
              .select("id", F.coalesce("size", F.lit(1)).alias("size")))
    sz = sz.localCheckpoint()
    hash_part = (F.conv(F.substring(F.sha2(F.concat(F.lit(f"{salt}:"),
                                                    F.col("id")), 256),
                                    1, 8), 16, 10).cast("long")
                 % F.lit(k)).cast("int")
    if init is None:
        assign = nodes.select("id", hash_part.alias("part")) \
            .localCheckpoint()
    else:
        # enforce the documented contract: an init part outside
        # [0, k) falls back to the hash bucket instead of surviving
        # refinement and yielding an assignment with > k partitions
        ip = F.col("_ip").cast("int")
        ip = F.when((ip >= 0) & (ip < k), ip)
        assign = (nodes.join(init.select("id",
                                         F.col("part").alias("_ip")),
                             "id", "left")
                  .select("id", F.coalesce(ip, hash_part).alias("part"))
                  .localCheckpoint())
    deg = und.groupBy(F.col("u").alias("id")) \
        .agg(F.sum("w").alias("deg"))
    n1 = sz.agg(F.sum("size").alias("n"))
    for _ in range(iters):
        load = (assign.join(sz, "id")
                .groupBy("part").agg(F.sum("size").alias("load")))
        nbr = (und.join(assign.select(F.col("id").alias("v"),
                                      F.col("part")), "v")
               .groupBy(F.col("u").alias("id"), "part")
               .agg(F.sum("w").alias("c")))
        own = assign.select("id", "part", F.lit(0).cast("long").alias("c"))
        cand = (nbr.unionByName(own)
                .groupBy("id", "part").agg(F.max("c").alias("c")))
        scored = (cand.join(F.broadcast(load), "part", "left")
                  .join(deg, "id")
                  .crossJoin(F.broadcast(n1))
                  .select("id", "part",
                          (F.col("c") * F.col("n")
                           - F.lit(k) * F.coalesce("load", F.lit(0))
                           * F.col("deg")).alias("s")))
        assign = (scored.groupBy("id")
                  .agg(F.max(F.struct(F.col("s"), (-F.col("part"))
                                      .alias("np"),
                                      F.col("part").alias("p")))
                       .alias("m"))
                  .select("id", F.col("m.p").alias("part"))
                  .localCheckpoint())
    return assign


def edge_cut_stats(edges: DataFrame, assign: DataFrame) -> DataFrame:
    """Partitioning-quality census for a node->part assignment: ONE
    row (cut_edges, total_edges, cut_fraction, uncovered_edges,
    n_parts, max_load, min_load) — uncovered_edges counts edges with
    an endpoint MISSING from the assignment (nonzero means the census
    and the assignment disagree about the graph; it is reported, never
    silently dropped) — the evidence a placement decision commits alongside
    the layout (same role as ``zorder_partition_stats`` for sort
    layouts). Undirected edges counted once (u < v canonical)."""
    e = (edges.select(F.least("u", "v").alias("u"),
                      F.greatest("u", "v").alias("v"))
         .filter(F.col("u") != F.col("v")).distinct())
    a_u = assign.select(F.col("id").alias("u"), F.col("part").alias("pu"))
    a_v = assign.select(F.col("id").alias("v"), F.col("part").alias("pv"))
    # LEFT joins: an edge whose endpoint the assignment misses must be
    # COUNTED (uncovered_edges), not silently dropped — a census over a
    # quietly smaller edge set is not evidence
    covered = F.col("pu").isNotNull() & F.col("pv").isNotNull()
    cut = (e.join(a_u, "u", "left").join(a_v, "v", "left")
           .agg(F.sum((covered & (F.col("pu") != F.col("pv")))
                      .cast("long")).alias("cut_edges"),
                F.sum(covered.cast("long")).alias("total_edges"),
                F.sum((~covered).cast("long")).alias("uncovered_edges")))
    loads = (assign.groupBy("part").agg(F.count(F.lit(1)).alias("l"))
             .agg(F.count(F.lit(1)).cast("int").alias("n_parts"),
                  F.max("l").alias("max_load"),
                  F.min("l").alias("min_load")))
    return (cut.crossJoin(F.broadcast(loads))
            .select("cut_edges", "total_edges",
                    F.round(F.col("cut_edges") / F.col("total_edges"), 6)
                    .alias("cut_fraction"),
                    "uncovered_edges", "n_parts", "max_load",
                    "min_load"))


def multilevel_partitions(edges: DataFrame, k: int, *, levels: int = 1,
                          coarse_iters: int = 4, refine_iters: int = 1,
                          salt: str = "part") -> DataFrame:
    """Multilevel balanced partitioning — the METIS scheme (Karypis &
    Kumar 1998) composed from this module's deterministic pieces:

      1. COARSEN ``levels`` times: :func:`maximal_matching` pairs
         adjacent nodes, :func:`coarsen_graph` contracts them — each
         level roughly halves the graph while coarse edge weights
         remember how much original adjacency each coarse edge carries;
      2. PARTITION the coarsest graph with
         :func:`balanced_partitions` (``coarse_iters`` rounds — cheap,
         the graph is 2^levels smaller);
      3. UNCOARSEN: project each level's labels through its node_map
         (one equi-join per level) and REFINE with
         ``refine_iters`` rounds of the same label-propagation move on
         the finer graph, seeded by the projection (``init=``).

    Direct flat partitioning sees only immediate neighbors; the coarse
    levels let cluster-scale structure move as a unit, which is why
    multilevel cuts beat flat cuts on clustered graphs (asserted in
    tests). Every stage is the module's exact-integer deterministic
    arithmetic, so the whole composition is bit-replayable — the
    driver oracle unrolls matching, contraction, coarse rounds,
    projection, and refinement as one CTE chain.

    The coarse-level move is WEIGHT-AWARE: coarse edge weights (how
    much original adjacency a coarse edge carries) drive affinity and
    supernode sizes (original-node member counts, accumulated through
    levels) drive the load penalty — S = c_w·W − k·load_w·deg_w, still
    exact integers, so partitioning the contracted graph optimizes the
    ORIGINAL graph's cut and balance, not the contracted topology's.

    Returns (id string, part int) over the ORIGINAL nodes."""
    from neo4j_document_pipeline_spark.operators.graphalgo import (
        coarsen_graph)

    if levels < 1:
        raise ValueError(f"levels must be >= 1, got {levels}")
    # canonical distinct at entry: a directed input carrying both
    # orientations of a link must weigh 1, not 2, exactly like the
    # flat balanced_partitions path dedups orientations
    e = (edges.select(F.least(F.col("u").cast("string"),
                              F.col("v").cast("string")).alias("u"),
                      F.greatest(F.col("u").cast("string"),
                                 F.col("v").cast("string")).alias("v"))
         .filter(F.col("u") != F.col("v")).distinct().localCheckpoint())
    maps = []
    cur = e.select("u", "v", F.lit(1).cast("long").alias("weight"))
    sizes = None  # level-0 nodes weigh 1 (balanced_partitions default)
    for lv in range(levels):
        # coarse weights SUM the current level's weights, so original
        # adjacency propagates through repeated contractions
        coarse, node_map = coarsen_graph(cur, salt=f"{salt}:m{lv}",
                                         weight_col="weight")
        node_map = node_map.localCheckpoint()
        maps.append(node_map)
        cur = coarse.localCheckpoint()
        # supernode sizes accumulate original member counts
        if sizes is None:
            sizes = (node_map.groupBy(F.col("super").alias("id"))
                     .agg(F.count(F.lit(1)).alias("size")))
        else:
            sizes = (sizes.join(node_map, "id")
                     .groupBy(F.col("super").alias("id"))
                     .agg(F.sum("size").alias("size")))
        sizes = sizes.localCheckpoint()
    assign = balanced_partitions(cur, k, iters=coarse_iters, salt=salt,
                                 weight_col="weight",
                                 node_weights=sizes)
    # uncoarsen: project through each node_map; the label-propagation
    # refinement runs on the FINEST (input) graph only — intermediate
    # levels would need their coarse graphs re-materialized for no
    # additional signal the final refine doesn't already see
    for finer, node_map in reversed(list(enumerate(maps))):
        projected = (node_map.join(
            assign.select(F.col("id").alias("super"), "part"), "super")
            .select("id", "part"))
        if finer == 0:
            assign = balanced_partitions(e, k, iters=refine_iters,
                                         salt=salt, init=projected)
        else:
            assign = projected
    return assign
