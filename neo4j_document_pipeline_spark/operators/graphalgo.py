"""Iterative graph analytics over the KG edge list — PageRank, triangle
counting, neighbor-set node similarity, multi-source BFS distances, and
k-core peeling, pure DataFrame ops (no GraphFrames dependency).

The reference exposes no graph analytics beyond traversal (its Cypher
surface could run them, but no endpoint does); these are the
beyond-reference operators a web-scale KG pipeline needs: PageRank ranks
entities by link structure (seed prioritization, quality weighting of
extracted entities — the classic web-graph computation), and triangle
counts measure local clustering (link-farm / boilerplate-graph detection
in webtext corpora). Both are designed to the same scale rules as
``operators/components.py``:

- PageRank: fixed-iteration power method. Each iteration is ONE shuffle
  (contributions grouped by destination) plus a broadcast-size scalar
  for the dangling mass; lineage is truncated with ``localCheckpoint``
  every iteration so 10^2 iterations never build a 10^2-deep plan. The
  edge list is hash-partitioned once on src and persisted — at 100 TB
  the iteration cost is the rank-side shuffle only (the re-used edge
  partitions stream from cache/disk), and AQE's skew split handles
  power-law in-degree hubs.
- Triangles: degree-ordered orientation (each undirected edge directed
  from the lower-(degree, id) endpoint) bounds every node's out-degree
  by O(sqrt(m)), so the wedge self-join — the step that explodes on
  power-law graphs when done naively — generates O(m^{3/2}) candidate
  wedges total (Suri & Vassilvitskii, "Counting Triangles and the Curse
  of the Last Reducer", WWW'11 — public). Two hash joins, no Python.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _undirected(edges: DataFrame,
                weight_col: str | None = None) -> DataFrame:
    """Canonical undirected edge set from (u, v) string pairs:
    self-loops dropped, both orientations collapsed to (min, max).
    Unweighted: duplicates removed (simple graph). With ``weight_col``:
    parallel/reversed duplicates SUM into one (u, v, w) row — null and
    non-positive weights are dropped first (a zero-weight edge is no
    edge; silently keeping them would null out rank contributions and
    destroy probability mass downstream)."""
    if weight_col is None:
        return (
            edges.select(
                F.least(F.col("u").cast("string"),
                        F.col("v").cast("string")).alias("u"),
                F.greatest(F.col("u").cast("string"),
                           F.col("v").cast("string")).alias("v"))
            .filter(F.col("u") != F.col("v"))
            .distinct()
        )
    return (
        edges.select(
            F.least(F.col("u").cast("string"),
                    F.col("v").cast("string")).alias("u"),
            F.greatest(F.col("u").cast("string"),
                       F.col("v").cast("string")).alias("v"),
            F.col(weight_col).cast("double").alias("w"))
        .filter(F.col("u") != F.col("v"))
        .filter(F.col("w").isNotNull() & ~F.isnan("w")
                & (F.col("w") > 0))
        .groupBy("u", "v").agg(F.sum("w").alias("w"))
    )


def pagerank(edges: DataFrame, damping: float = 0.85, iters: int = 5,
             directed: bool = False, weight_col: str | None = None,
             seeds: list[str] | None = None) -> DataFrame:
    """Fixed-iteration PageRank over edges(u string, v string) ->
    (id string, rank double).

    Power method with teleport distribution ``tele``: r_{t+1}(v) =
    (1-d)*tele(v) + d * (sum_{u->v} r_t(u)*w(u,v)/wout(u) +
    dangling_t*tele(v)) — uniform tele = 1/N is classic PageRank;
    ``seeds`` restricts tele to a uniform distribution over the given
    node ids (personalized PageRank, the ranking a KG retrieval path
    wants relative to its query's seed entities). Dangling mass (rank on
    zero-out-degree nodes) redistributes along tele, the standard
    treatment for both variants. ``directed=False`` (default, the KG
    edge list is logically undirected) symmetrizes the edge set first,
    which also guarantees no dangling nodes.

    ``weight_col`` makes edges weighted (e.g. the KG's per-edge source
    counts): parallel/reversed duplicates SUM their weights (unweighted
    edges dedupe to a simple graph), and contributions are
    rank * w / sum-of-outgoing-w. Null and non-positive weights are
    DROPPED edge-wise (a zero-weight edge is no edge) — a node that
    loses every out-edge this way is an ordinary sink, covered by the
    dangling redistribution, so rank mass always sums to 1.

    Fixed ``iters`` rather than convergence-test-per-iteration keeps the
    job count deterministic (one shuffle per iteration; a convergence
    check would add a second full pass per iteration for a delta-norm
    that fixed 10-20 iterations bounds anyway). Exactly reproducible:
    the same edge set always yields the same ranks (sums are
    order-insensitive up to float rounding; oracle compares at 6dp).
    """
    if directed:
        raw = (edges.select(F.col("u").cast("string"),
                            F.col("v").cast("string"),
                            (F.col(weight_col).cast("double")
                             if weight_col else F.lit(1.0)).alias("w"))
               .filter(F.col("u") != F.col("v")))
        e = (raw.filter(F.col("w").isNotNull() & ~F.isnan("w")
                & (F.col("w") > 0))
             .groupBy("u", "v").agg(F.sum("w").alias("w"))
             if weight_col else
             raw.drop("w").distinct().withColumn("w", F.lit(1.0)))
        verts = (e.select(F.col("u").alias("id"))
                 .union(e.select(F.col("v").alias("id"))).distinct())
    else:
        und = _undirected(edges, weight_col)
        if weight_col is None:
            und = und.withColumn("w", F.lit(1.0))
        e = und.union(und.select(F.col("v").alias("u"),
                                 F.col("u").alias("v"), "w"))
        verts = e.select(F.col("u").alias("id")).distinct()
    # one partitioning of the (static) edge side, reused every iteration;
    # localCheckpoint materializes it so iterations never rescan the
    # source. wout rides along to turn rank into per-edge contribution.
    deg = e.groupBy("u").agg(F.sum("w").alias("wout"))
    e = e.join(deg, "u").localCheckpoint()
    verts = verts.localCheckpoint()
    sinks = None
    if directed:
        # the zero-out-degree set is static: derive it ONCE from the
        # checkpointed edge side so the per-iteration dangling-mass
        # scalar joins two materialized tables instead of re-scanning
        # and re-aggregating the full edge list every iteration
        sinks = verts.join(e.select(F.col("u").alias("id")).distinct(),
                           "id", "left_anti").localCheckpoint()
    n = verts.count()
    if n == 0:
        return verts.select("id", F.lit(0.0).alias("rank"))
    if seeds is not None:
        sset = sorted({str(s) for s in seeds})
        # |S| counts only seeds that exist in the graph, so tele still
        # sums to 1 when callers pass ids the corpus doesn't contain
        n_seed = verts.filter(F.col("id").isin(sset)).count()
        if n_seed == 0:
            raise ValueError("personalized pagerank: no seed id exists "
                             "in the edge set")
        tele = F.when(F.col("id").isin(sset),
                      F.lit(1.0 / n_seed)).otherwise(F.lit(0.0))
    else:
        tele = F.lit(1.0 / float(n))
    verts = verts.select("id", tele.alias("tele"))
    ranks = verts.select("id", F.col("tele").alias("rank"))
    for _ in range(max(0, int(iters))):
        contrib = (
            e.join(ranks.withColumnRenamed("id", "u"), "u")
            .groupBy(F.col("v").alias("id"))
            .agg(F.sum(F.col("rank") * F.col("w") / F.col("wout"))
                 .alias("inflow"))
        )
        if directed:
            # dangling mass: rank stranded on zero-outdegree nodes this
            # iteration, redistributed along tele. ONE scalar aggregate
            # over two checkpointed O(V) tables (broadcast back as a
            # literal) — the sink SET never changes, only its rank mass.
            dang = (
                ranks.join(sinks, "id")
                .agg(F.sum("rank")).first()[0]
            ) or 0.0
        else:
            dang = 0.0  # symmetrized graphs have no sinks
        ranks = (
            verts.join(contrib, "id", "left")
            .select(
                "id",
                (F.col("tele")
                 * F.lit(1.0 - damping + damping * dang)
                 + F.lit(damping)
                 * F.coalesce(F.col("inflow"), F.lit(0.0))).alias("rank"))
            .localCheckpoint()  # truncate lineage: plan depth stays O(1)
        )
    return ranks


def node_similarity(edges: DataFrame, min_sim: float = 0.0,
                    top_k: int | None = None,
                    max_degree: int | None = None,
                    metric: str = "jaccard",
                    weight_col: str | None = None) -> DataFrame:
    """Neighbor-set similarity (the Neo4j GDS ``nodeSimilarity``
    analogue the reference's graph never exposes): every pair (a, b),
    a < b, sharing at least one neighbor, scored by ``metric`` ->
    (a string, b string, shared bigint, jaccard double).

    Metrics (all from the same wedge aggregate + true per-node sums, so
    the choice costs nothing extra; the output column keeps the name
    ``jaccard`` for a stable driver schema). Unweighted (default,
    ``weight_col=None``) every edge weighs 1 and these reduce to the
    classic set formulas:

    - ``jaccard``  Σ_n min(wa_n, wb_n) / Σ_n max(wa_n, wb_n)
      (unweighted: |N(a) ∩ N(b)| / |N(a) ∪ N(b)|); Σmax over the union
      = Σwa + Σwb − Σmin, so no second pass is needed
    - ``overlap``  Σ_n min(wa_n, wb_n) / min(Σwa, Σwb) — unweighted this
      is 1.0 whenever one neighborhood CONTAINS the other, the right
      score for sub-entity detection ("Al-Khwarizmi" vs "Al-Khwarizmi
      the elder"); WEIGHTED, set containment alone doesn't pin it at
      1.0 (that needs the smaller-sum side's weights entry-wise ≤ the
      other's), so tune ``min_sim`` against the unweighted run first
    - ``all``      one pass, all three: extra ``overlap`` and
      ``cosine`` columns alongside ``jaccard`` (which stays the
      Jaccard score and is what ``min_sim``/``top_k`` act on)
    - ``cosine``   Σ_n wa_n·wb_n / sqrt(Σwa² · Σwb²) — the true vector
      cosine over neighbor-weight vectors (unweighted this is
      shared / sqrt(|N(a)|·|N(b)|)), less punishing for rich hubs

    With ``weight_col`` set (the GDS relationship-weight analogue), an
    edge's weight is its neighbor-vector entry — in the KG CLI the
    supporting-document count, so two entities co-cited by the same
    heavily-attested neighbors score higher than ones sharing only
    single-mention edges. Parallel/reversed duplicate edges SUM; null /
    non-positive weights are dropped edge-wise (``_undirected``).

    Two entities whose KG neighborhoods overlap heavily are duplicate-
    entity candidates even when their NAMES diverge — the structural
    complement to ``operators/linking.py``'s name-based MinHash/TF-IDF
    blocking.

    Shape: candidate pairs come from a wedge join through shared
    neighbors (only co-neighbors ever meet — never all-pairs), the
    per-pair intersection terms (count, Σmin, Σproduct) ride ONE wedge
    hash-aggregate, and denominators come from a per-node sums table
    joined back. All JVM-side equi-joins + hash aggregates.

    Scale: a neighbor of degree d generates C(d, 2) wedges, so power-law
    hubs dominate the wedge volume (the same curse-of-the-last-reducer
    as triangles, but here the hub CENTER can't be oriented away).
    ``max_degree`` drops wedge centers above the cutoff (by neighbor
    COUNT, weighted or not) — pairs whose only shared neighbors are
    dropped hubs disappear and pairs sharing a dropped hub undercount it
    in the intersection (per-node sums stay exact). That's the
    approximation GDS's degree cutoff makes, appropriate because a
    shared ultra-hub ("mentioned by Wikipedia") carries no similarity
    signal anyway. Default None = exact.

    ``min_sim`` filters pairs below the threshold; ``top_k`` keeps each
    node's k best pairs (by jaccard desc, partner id asc — deterministic
    under ties), counting the pair for BOTH endpoints the way GDS does.
    """
    if metric not in ("jaccard", "overlap", "cosine", "all"):
        raise ValueError(f"unknown node-similarity metric {metric!r}")
    und = _undirected(edges, weight_col)
    if weight_col is None:
        und = und.withColumn("w", F.lit(1.0))
    adj = und.select(F.col("u").alias("node"), F.col("v").alias("nbr"),
                     "w") \
        .union(und.select(F.col("v").alias("node"),
                          F.col("u").alias("nbr"), "w"))
    # true per-node sums FIRST (exact denominators even when the wedge
    # set is capped): count degree for the hub cutoff, Σw for
    # jaccard/overlap, Σw² for cosine
    deg = adj.groupBy("node").agg(
        F.count("*").alias("d"),
        F.sum("w").alias("sw"),
        F.sum(F.col("w") * F.col("w")).alias("sw2"))
    wedge_src = adj
    if max_degree is not None:
        hubs = deg.filter(F.col("d") > int(max_degree)) \
            .select(F.col("node").alias("nbr"))
        wedge_src = adj.join(hubs, "nbr", "left_anti")
    wedge_src = wedge_src.localCheckpoint()
    shared = (
        wedge_src.alias("x")
        .join(wedge_src.alias("y"),
              (F.col("x.nbr") == F.col("y.nbr"))
              & (F.col("x.node") < F.col("y.node")))
        .groupBy(F.col("x.node").alias("a"), F.col("y.node").alias("b"))
        .agg(F.count("*").alias("shared"),
             F.sum(F.least("x.w", "y.w")).alias("imin"),
             F.sum(F.col("x.w") * F.col("y.w")).alias("iprod"))
    )
    out = (
        shared
        .join(deg.select(F.col("node").alias("a"), F.col("sw").alias("sa"),
                         F.col("sw2").alias("s2a")), "a")
        .join(deg.select(F.col("node").alias("b"), F.col("sw").alias("sb"),
                         F.col("sw2").alias("s2b")), "b")
    )
    jac = (F.col("imin")
           / (F.col("sa") + F.col("sb") - F.col("imin"))).alias("jaccard")
    ovl = (F.col("imin") / F.least("sa", "sb")).alias("overlap")
    cos = (F.col("iprod")
           / F.sqrt(F.col("s2a") * F.col("s2b"))).alias("cosine")
    if metric == "all":
        out = out.select("a", "b", "shared", jac, ovl, cos)
    else:
        out = out.select(
            "a", "b", "shared",
            (ovl if metric == "overlap"
             else cos if metric == "cosine" else jac).alias("jaccard"))
    cols = ["a", "b", "shared", "jaccard"] + (
        ["overlap", "cosine"] if metric == "all" else [])
    if min_sim > 0.0:
        out = out.filter(F.col("jaccard") >= float(min_sim))
    if top_k is not None:
        from pyspark.sql import Window
        out = out.localCheckpoint()  # rank both orientations of ONE scoring
        ranked = (
            out.select(F.col("a").alias("node"), F.col("b").alias("other"),
                       *cols)
            .union(out.select(F.col("b").alias("node"),
                              F.col("a").alias("other"), *cols))
        )
        w = Window.partitionBy("node").orderBy(
            F.col("jaccard").desc(), F.col("other").asc())
        out = (ranked.withColumn("rk", F.row_number().over(w))
               .filter(F.col("rk") <= int(top_k))
               .select(*cols).distinct())
    return out


def k_core(edges: DataFrame, k: int, max_iters: int = 100) -> DataFrame:
    """Nodes of the k-core -> (id string): the maximal subgraph where
    every node keeps degree >= k after everything below is peeled away.
    The dense-nucleus signal (GDS k-core analogue): boilerplate /
    link-farm neighborhoods in a webtext KG survive high k, organic
    long-tail entities don't.

    Iterative peeling, the textbook fixpoint: each round computes
    degrees within the SURVIVING subgraph (one hash agg), finds
    under-degree nodes (broadcast-size in practice near the fixpoint),
    and anti-joins them out of the edge set; localCheckpoint per round
    keeps the plan O(1) deep. Rounds are bounded by the longest peeling
    chain — tens on real power-law graphs; ``max_iters`` turns a
    pathological chain (path graph: O(V) rounds) into a loud error
    instead of a silent half-peeled answer.
    """
    if k <= 0:
        raise ValueError("k_core: k must be >= 1")
    und = _undirected(edges).localCheckpoint()
    for _ in range(max_iters):
        adj = und.select(F.col("u").alias("id")).union(
            und.select(F.col("v").alias("id")))
        low = (adj.groupBy("id").agg(F.count("*").alias("d"))
               .filter(F.col("d") < k)
               .select("id").localCheckpoint())
        if low.isEmpty():
            return und.select(F.col("u").alias("id")).union(
                und.select(F.col("v").alias("id"))).distinct()
        und = (und
               .join(low.withColumnRenamed("id", "u"), "u", "left_anti")
               .join(low.withColumnRenamed("id", "v"), "v", "left_anti")
               .select("u", "v").localCheckpoint())
    raise RuntimeError(
        f"k_core did not reach a fixpoint in {max_iters} rounds; "
        "raise max_iters (pathological peeling chain)")


def k_truss(edges: DataFrame, k: int, max_iters: int = 100) -> DataFrame:
    """Edges of the k-truss -> (u, v): the maximal subgraph in which
    every surviving EDGE sits in at least k−2 triangles of the
    subgraph (Cohen 2008, "Trusses: cohesive subgraphs for social
    network analysis" — public; the GDS ``kTruss`` analogue). The
    edge-level sibling of ``k_core`` and a strictly stronger cohesion
    signal: a k-core can be held together by one articulation hub,
    a k-truss cannot — which is what makes it the link-farm /
    mutual-citation detector on a webtext KG (boilerplate cliques
    survive high k, editorially organic links don't).

    Iterative support peeling, the textbook fixpoint: each round
    enumerates the surviving subgraph's triangles ONCE via the same
    degree-oriented wedge join as ``triangle_count`` (out-degree
    bounded by O(sqrt m), so the join never explodes on power-law
    hubs), explodes each triangle to its three canonical edges, hash-
    aggregates per-edge support, and anti-joins away edges below
    k−2 — localCheckpoint per round keeps the plan O(1) deep. Rounds
    are bounded by the longest peeling chain (tens on real graphs);
    ``max_iters`` turns a pathological chain into a loud error instead
    of a silently half-peeled answer.
    """
    if k < 3:
        raise ValueError(f"k_truss: k must be >= 3, got {k}")
    need = k - 2
    und = _undirected(edges).localCheckpoint()
    for _ in range(max_iters):
        tri = _closed_triangles(und)
        supp = (
            tri.select(F.explode(F.array(
                F.struct(F.least("a", "b").alias("u"),
                         F.greatest("a", "b").alias("v")),
                F.struct(F.least("a", "c").alias("u"),
                         F.greatest("a", "c").alias("v")),
                F.struct(F.col("b").alias("u"),
                         F.col("c").alias("v")))).alias("e"))
            .select("e.u", "e.v")
            .groupBy("u", "v").agg(F.count("*").alias("s"))
        )
        low = (und.join(supp, ["u", "v"], "left")
               .filter(F.coalesce(F.col("s"), F.lit(0)) < need)
               .select("u", "v").localCheckpoint())
        if low.isEmpty():
            return und
        und = und.join(low, ["u", "v"], "left_anti") \
            .select("u", "v").localCheckpoint()
    raise RuntimeError(
        f"k_truss did not reach a fixpoint in {max_iters} rounds; "
        "raise max_iters (pathological peeling chain)")


def bfs_distances(edges: DataFrame, sources: list[str],
                  max_hops: int = 3, directed: bool = False) -> DataFrame:
    """Multi-source BFS hop distance -> (id string, dist int): every
    given source at dist 0 (present in the graph or not), every node
    reachable within ``max_hops`` at its MINIMUM hop count. The general
    form of the retrieval path's fixed 1-3 hop expansion
    (`operators/retrieval.py`): "how far is everything from these
    entities", for proximity scoring and neighborhood exports.

    Level-synchronous frontier expansion, the scalable BFS shape: one
    equi-join per hop (frontier ⋈ edges), an anti-join against the
    visited set so each node is settled exactly once (which is what
    makes dist minimal), localCheckpoint per level so the plan stays
    O(1) deep. Frontier size is bounded by |V|; there is never a
    paths-style blowup. The per-hop isEmpty probe short-circuits
    exhausted graphs at one cheap job per level, bounded by max_hops.
    """
    spark = edges.sparkSession
    if directed:
        e = (edges.select(F.col("u").cast("string"),
                          F.col("v").cast("string"))
             .filter(F.col("u") != F.col("v")).distinct())
    else:
        und = _undirected(edges)
        e = und.union(und.select(F.col("v").alias("u"),
                                 F.col("u").alias("v")))
    e = e.localCheckpoint()
    frontier = spark.createDataFrame(
        [(str(s),) for s in sorted({str(s) for s in sources})],
        "id string").localCheckpoint()
    visited = frontier.select("id", F.lit(0).cast("int").alias("dist"))
    for h in range(1, max_hops + 1):
        nxt = (
            e.join(frontier.withColumnRenamed("id", "u"), "u")
            .select(F.col("v").alias("id")).distinct()
            .join(visited, "id", "left_anti")
            .localCheckpoint()
        )
        if nxt.isEmpty():
            break
        visited = visited.union(
            nxt.select("id", F.lit(h).cast("int").alias("dist"))
        ).localCheckpoint()
        frontier = nxt
    return visited


def triangle_count(edges: DataFrame) -> DataFrame:
    """Global triangle count over an undirected edge list -> one row
    (triangles bigint).

    Degree-ordered orientation: every undirected edge is directed from
    its lower-(degree, id) endpoint, so each triangle {a, b, c} is
    counted exactly once as the wedge a->b, a->c closed by b->c (a the
    smallest endpoint in the order). The orientation bounds out-degrees
    by O(sqrt(m)), which bounds the wedge join — the naive
    edges x edges x edges triple join explodes on exactly the power-law
    hubs a webtext entity graph has."""
    und = _undirected(edges)
    closed = _closed_triangles(und)
    return closed.agg(F.count("*").alias("triangles"))


def _degrees(und: DataFrame) -> DataFrame:
    """(id, d) undirected degrees — shared so callers that need both
    the wedge join and the degrees (clustering_coefficients) reuse one
    aggregation instead of planning it twice."""
    return (
        und.select(F.col("u").alias("id"))
        .union(und.select(F.col("v").alias("id")))
        .groupBy("id").agg(F.count("*").alias("d"))
    )


def _closed_triangles(und: DataFrame,
                      deg: DataFrame | None = None) -> DataFrame:
    """Each triangle exactly once as (a, b, c) rows (a the smallest
    endpoint in the degree order; b < c by id) — the degree-oriented
    wedge join shared by the global count and the per-vertex
    coefficients."""
    if deg is None:
        deg = _degrees(und)
    # total order (degree, id): strict, so orientation is acyclic
    w = (
        und.join(deg.withColumnRenamed("id", "u")
                 .withColumnRenamed("d", "du"), "u")
        .join(deg.withColumnRenamed("id", "v")
              .withColumnRenamed("d", "dv"), "v")
    )
    oriented = w.select(
        F.when((F.col("du") < F.col("dv"))
               | ((F.col("du") == F.col("dv")) & (F.col("u") < F.col("v"))),
               F.col("u")).otherwise(F.col("v")).alias("lo"),
        F.when((F.col("du") < F.col("dv"))
               | ((F.col("du") == F.col("dv")) & (F.col("u") < F.col("v"))),
               F.col("v")).otherwise(F.col("u")).alias("hi"),
    ).localCheckpoint()
    wedges = (
        oriented.alias("e1")
        .join(oriented.alias("e2"),
              (F.col("e1.lo") == F.col("e2.lo"))
              & (F.col("e1.hi") < F.col("e2.hi")))
        .select(F.col("e1.lo").alias("a"),
                F.col("e1.hi").alias("b"), F.col("e2.hi").alias("c"))
    )
    # close the wedge against the CANONICAL (id-ordered) edge set — the
    # wedge emits b < c by id, und stores u < v by id, so this is a pure
    # two-column equi-join (an orientation-order predicate would need an
    # OR of conjunctions, which Catalyst can only nested-loop)
    return wedges.join(
        und.select(F.col("u").alias("b"), F.col("v").alias("c")),
        ["b", "c"]).select("a", "b", "c")


def clustering_coefficients(edges: DataFrame) -> DataFrame:
    """Local clustering coefficient -> (id, degree, triangles, coeff):
    coeff(v) = 2·T(v) / (d(v)·(d(v)-1)), the fraction of v's neighbor
    pairs that are themselves connected — the per-node community-
    tightness signal next to the global triangle count (watts-strogatz
    'clustering'; GDS localClusteringCoefficient). Nodes of degree < 2
    have no neighbor pair and score 0.

    Per-vertex T comes from the same degree-oriented wedge join as
    triangle_count (each triangle materialized once, exploded to its
    three corners — never one join per corner), so the hub-bounded
    O(m^1.5) wedge cost is unchanged and the only additions are one
    explode and one hash aggregate."""
    und = _undirected(edges).localCheckpoint()
    # ONE degree aggregation feeds both the orientation and the output
    deg_ids = _degrees(und).localCheckpoint()
    deg = deg_ids.select("id", F.col("d").alias("degree"))
    tri = (
        _closed_triangles(und, deg=deg_ids)
        .select(F.explode(F.array("a", "b", "c")).alias("id"))
        .groupBy("id").agg(F.count("*").alias("triangles"))
    )
    t = F.coalesce(F.col("triangles"), F.lit(0)).cast("long")
    d = F.col("degree")
    return (
        deg.join(tri, "id", "left")
        .select(
            "id", "degree", t.alias("triangles"),
            F.when(d >= 2, F.lit(2.0) * t / (d * (d - 1)))
            .otherwise(F.lit(0.0)).alias("coeff"))
    )


def label_propagation(edges: DataFrame, iters: int = 5,
                      weight_col: str | None = None) -> DataFrame:
    """Community detection by synchronous label propagation (the
    Neo4j GDS ``labelPropagation`` analogue; Raghavan et al. 2007) ->
    (id string, community string). Communities are the coarse
    topic/boilerplate clusters of a webtext KG — the unsupervised
    grouping PageRank (importance) and node_similarity (pairwise
    duplicates) don't give.

    DETERMINISTIC variant: every node starts labeled with its own id;
    each round every node simultaneously adopts the most frequent label
    among its NEIGHBORS (itself excluded), ties broken by the smallest
    label — so identical inputs always yield identical communities,
    which is what lets a SQL oracle replay the rounds exactly (classic
    LPA breaks ties randomly and is run-to-run unstable). Community ids
    are the surviving seed node ids.

    ``weight_col`` makes the vote weighted (the GDS relationship-weight
    analogue): a node adopts the label with the largest SUMMED edge
    weight into it — in the KG CLI the supporting-document count, so a
    heavily-attested neighborhood out-votes a larger set of
    single-mention edges. Parallel/reversed duplicates SUM, null /
    non-positive weights drop edge-wise (``_undirected``); unweighted
    is the same code path with w=1, so results are identical by
    construction. Determinism note: ties are broken on the float sums —
    exact for integer-valued (or binary-fraction) weights; arbitrary
    floats can resolve mathematically-equal ties either way across
    summation orders.

    Shape: one equi-join (adjacency ⋈ labels on nbr) plus one hash
    aggregate per round — the label pick is a single map-combinable
    ``min(struct(-count, label))``, not a window sort. The adjacency is
    partitioned and localCheckpoint-ed ONCE; the labels frame (O(V))
    is re-checkpointed per round so the plan stays O(1) deep. That is
    LPA's Pregel shape on DataFrames: at 10^9 edges each round is one
    shuffle of the (node, nbr_label) stream.

    Fixed ``iters`` rounds, no convergence probe (a stability check
    would cost an extra join-and-count job per round; on power-law
    graphs LPA is within noise of its fixpoint in ~5 rounds). Synchronous
    updates can 2-cycle on bipartite structures — with fixed rounds and
    deterministic ties the output is still stable and oracle-checkable.
    """
    if iters < 1:
        raise ValueError("label_propagation: iters must be >= 1")
    und = _undirected(edges, weight_col)
    # unweighted keeps the count(*) vote (no constant w column riding
    # every adjacency checkpoint + per-round shuffle); weighted sums —
    # identical results when all weights are 1 by construction
    wcols = ["w"] if weight_col is not None else []
    adj = (und.select(F.col("u").alias("node"), F.col("v").alias("nbr"),
                      *wcols)
           .union(und.select(F.col("v").alias("node"),
                             F.col("u").alias("nbr"), *wcols))
           .localCheckpoint())
    labels = adj.select(F.col("node").alias("id"),
                        F.col("node").alias("lbl")).distinct() \
        .localCheckpoint()
    vote = F.sum("w") if weight_col is not None else F.count("*")
    for _ in range(iters):
        nbr_lbl = adj.join(
            labels.select(F.col("id").alias("nbr"), "lbl"), "nbr")
        cnt = nbr_lbl.groupBy("node", "lbl").agg(vote.alias("c"))
        labels = (
            cnt.groupBy("node")
            .agg(F.min(F.struct((-F.col("c")).alias("nc"),
                                F.col("lbl").alias("lbl"))).alias("pick"))
            .select(F.col("node").alias("id"),
                    F.col("pick.lbl").alias("lbl"))
            .localCheckpoint())
    return labels.select("id", F.col("lbl").alias("community"))


def shortest_paths(edges: DataFrame, sources: list[str],
                   max_hops: int = 3, weight_col: str = "w",
                   directed: bool = False) -> DataFrame:
    """Multi-source WEIGHTED shortest distance within ``max_hops`` edges
    (the Neo4j GDS shortest-path/Dijkstra analogue, hop-bounded) ->
    (id string, dist double): every source at 0.0, every node reachable
    in <= max_hops edges at the minimum total edge weight over such
    paths. The weighted complement of ``bfs_distances`` — in the KG CLI
    the edge weight is 1/supporting-document-count, so "distance" is
    attestation-weighted proximity: a 2-hop path over heavily-attested
    edges outranks a 1-hop single-mention edge.

    Hop-bounded Bellman-Ford with a frontier: each round relaxes ONLY
    nodes whose distance improved last round (one equi-join frontier ⋈
    edges + one min-aggregate merge), so settled regions drop out of the
    join instead of re-relaxing every round — the delta-stepping-lite
    shape that survives power-law graphs. localCheckpoint per round
    keeps the plan O(1) deep; the per-round isEmpty probe short-circuits
    once no distance improves. Rounds are bounded by max_hops, so
    negative cycles can't loop (and weights are required positive
    anyway: null / non-positive weights drop edge-wise, and parallel
    edges keep their MINIMUM weight — the shortest-path combine, unlike
    pagerank's SUM).
    """
    spark = edges.sparkSession
    raw = (edges.select(F.col("u").cast("string"),
                        F.col("v").cast("string"),
                        F.col(weight_col).cast("double").alias("w"))
           .filter(F.col("u") != F.col("v"))
           .filter(F.col("w").isNotNull() & ~F.isnan("w")
                & (F.col("w") > 0)))
    if not directed:
        raw = raw.union(raw.select(F.col("v").alias("u"),
                                   F.col("u").alias("v"), "w"))
    e = raw.groupBy("u", "v").agg(F.min("w").alias("w")).localCheckpoint()
    frontier = spark.createDataFrame(
        [(str(s),) for s in sorted({str(s) for s in sources})],
        "id string").select("id", F.lit(0.0).alias("dist")) \
        .localCheckpoint()
    dist = frontier
    for _ in range(max_hops):
        cand = (e.join(frontier.withColumnRenamed("id", "u"), "u")
                .groupBy(F.col("v").alias("id"))
                .agg(F.min(F.col("dist") + F.col("w")).alias("nd")))
        improved = (cand.join(dist, "id", "left")
                    .filter(F.col("dist").isNull()
                            | (F.col("nd") < F.col("dist")))
                    .select("id", F.col("nd").alias("dist"))
                    .localCheckpoint())
        if improved.isEmpty():
            break
        dist = (dist.union(improved).groupBy("id")
                .agg(F.min("dist").alias("dist")).localCheckpoint())
        frontier = improved
    return dist


def npmi_pairs(occurrences: DataFrame, min_pairs: int = 1,
               max_ctx_size: int | None = None) -> DataFrame:
    """Pointwise mutual information collocation scoring over
    (ctx string, item string) occurrence pairs -> (a string, b string,
    n_pair bigint, lift double, npmi double), one row per unordered item
    pair co-occurring in >= ``min_pairs`` contexts. For the KG the
    contexts are documents and the items entities (the mentions table),
    so npmi is ASSOCIATION strength — "how much more often do these two
    entities appear in the same document than chance" — the classic
    webtext collocation signal (word2phrase-style phrase mining, edge
    confidence weighting) that degree-based similarity can't give:
    node_similarity asks "do they share neighbors", npmi asks "is their
    co-occurrence itself surprising".

    With p(x) = contexts containing x / n: lift = p(a,b)/(p(a)p(b))
    (exact integer arithmetic in doubles — bit-stable), pmi = ln(lift),
    npmi = pmi / -ln(p(a,b)) in [-1, 1] (Bouma 2009), with npmi = 1 by
    convention when the pair occurs in EVERY context (pmi/-ln both 0).

    Shape: dedupe occurrences, one self-join WITHIN ctx for pair counts
    (the only shuffle that grows quadratically — in each context of k
    items it emits C(k,2) pairs), two joins against the per-item count
    table. ``max_ctx_size`` drops whole contexts above the cutoff — a
    boilerplate page mentioning 500 entities contributes 125k pairs of
    pure noise; dropping it bounds the join at C(cutoff,2) per context.
    n and the per-item counts are computed over the SURVIVING contexts
    so the probability space stays coherent after the cutoff.
    """
    occ = (occurrences.select(F.col("ctx").cast("string"),
                              F.col("item").cast("string"))
           .na.drop().distinct())
    if max_ctx_size is not None:
        big = (occ.groupBy("ctx").agg(F.count("*").alias("k"))
               .filter(F.col("k") > int(max_ctx_size)).select("ctx"))
        occ = occ.join(big, "ctx", "left_anti")
    occ = occ.localCheckpoint()
    n = occ.select("ctx").distinct().count()
    if n == 0:
        return occ.sparkSession.createDataFrame(
            [], "a string, b string, n_pair bigint, lift double, "
                "npmi double")
    c_item = occ.groupBy("item").agg(F.count("*").alias("c"))
    pairs = (
        occ.alias("x")
        .join(occ.alias("y"), (F.col("x.ctx") == F.col("y.ctx"))
              & (F.col("x.item") < F.col("y.item")))
        .groupBy(F.col("x.item").alias("a"), F.col("y.item").alias("b"))
        .agg(F.count("*").alias("n_pair"))
    )
    if min_pairs > 1:
        pairs = pairs.filter(F.col("n_pair") >= int(min_pairs))
    scored = (
        pairs
        .join(c_item.select(F.col("item").alias("a"),
                            F.col("c").alias("ca")), "a")
        .join(c_item.select(F.col("item").alias("b"),
                            F.col("c").alias("cb")), "b")
        .withColumn("lift", F.col("n_pair") * F.lit(float(n))
                    / (F.col("ca") * F.col("cb")))
        .withColumn(
            "npmi",
            F.when(F.col("n_pair") == n, F.lit(1.0))
            .otherwise(F.log("lift")
                       / -F.log(F.col("n_pair") / F.lit(float(n)))))
    )
    return scored.select("a", "b", "n_pair", "lift", "npmi")


def hits(edges: DataFrame, iters: int = 5) -> DataFrame:
    """Hubs & authorities (Kleinberg's HITS) over DIRECTED edges
    (u string, v string) -> (id string, hub double, auth double),
    L2-normalized. The directed complement of PageRank for a KG whose
    edges carry direction (subject -> object): a high-AUTHORITY entity
    is one many distinct subjects assert facts about (the things the
    corpus is about); a high-HUB entity asserts facts about many
    authorities (aggregator / index pages in webtext, survey-style
    documents' subjects). PageRank mixes both into one score; HITS
    separates them.

    Power iteration on the unweighted adjacency: auth = L2-normalize
    (Σ_incoming hub), then hub = L2-normalize(Σ_outgoing auth) — each
    half-step is ONE equi-join + hash aggregate shuffle, with the
    scalar L2 norm folded INTO the half-step's plan as a broadcast
    cross-join of the 1-row norm aggregate (both branches hang off the
    same exchange, so ReuseExchange runs the O(E) join once and no
    separate driver action fetches the norm). The ONLY action per
    half-step is the scores localCheckpoint that keeps the iterative
    plan O(1) deep — 2 driver barriers per iteration, the same shape
    as pagerank.
    Self-loops and duplicate edges are dropped (simple directed graph).
    Nodes with no in-edges get auth 0 (resp. hub 0 for no out-edges);
    both vectors start uniform, the classic initialization, and fixed
    ``iters`` keeps the job count deterministic (HITS converges
    geometrically to the principal eigenvectors of A^T A / A A^T).
    """
    if iters < 1:
        raise ValueError("hits: iters must be >= 1")
    e = (edges.select(F.col("u").cast("string"),
                      F.col("v").cast("string"))
         .filter(F.col("u") != F.col("v")).distinct().localCheckpoint())
    verts = (e.select(F.col("u").alias("id"))
             .union(e.select(F.col("v").alias("id")))
             .distinct().localCheckpoint())
    n = verts.count()
    if n == 0:
        return verts.select("id", F.lit(0.0).alias("hub"),
                            F.lit(0.0).alias("auth"))
    init = 1.0 / (float(n) ** 0.5)
    scores = verts.select("id", F.lit(init).alias("hub"),
                          F.lit(init).alias("auth"))

    def _half(src_col, out_name, join_on, group_on):
        # one join + one agg: new score(x) = Σ counterpart over edges
        contrib = (
            e.join(scores.select(F.col("id").alias(join_on),
                                 F.col(src_col).alias("s")), join_on)
            .groupBy(F.col(group_on).alias("id"))
            .agg(F.sum("s").alias(out_name)))
        merged = (verts.join(contrib, "id", "left")
                  .na.fill({out_name: 0.0}))
        # the L2 norm stays IN the plan: a 1-row agg broadcast back
        # onto the same frame — no .first() round-trip, and the shared
        # merged subtree's exchanges are reused, not recomputed
        norm_df = merged.agg(
            F.sqrt(F.sum(F.col(out_name) * F.col(out_name)))
            .alias("_z"))
        return (merged.crossJoin(F.broadcast(norm_df))
                .select("id",
                        F.when(F.col("_z").isNull() | (F.col("_z") <= 0.0),
                               F.lit(0.0))
                        .otherwise(F.col(out_name) / F.col("_z"))
                        .alias(out_name)))

    for _ in range(iters):
        auth = _half("hub", "auth", "u", "v")
        scores = (scores.select("id", "hub")
                  .join(auth, "id").localCheckpoint())
        hub = _half("auth", "hub", "v", "u")
        scores = (scores.select("id", "auth")
                  .join(hub, "id")
                  .select("id", "hub", "auth").localCheckpoint())
    return scores


def link_prediction(edges: DataFrame, min_common: int = 1,
                    max_degree: int | None = None) -> DataFrame:
    """Missing-edge candidate scoring (the GDS link-prediction family)
    over an undirected edge list -> (a string, b string, common bigint,
    adamic_adar double, pref_attach bigint): every NON-ADJACENT pair
    sharing >= ``min_common`` neighbors, scored three classic ways —
    the KG-completion signal ("these two entities are probably related
    even though no document asserted it yet"):

    - ``common``       |N(a) ∩ N(b)| — raw shared-neighbor count
    - ``adamic_adar``  Σ_{n ∈ N(a) ∩ N(b)} 1/ln(deg(n)) — shared RARE
      neighbors count more than shared hubs (Adamic & Adar 2003), the
      strongest of the classic predictors on webtext graphs
    - ``pref_attach``  deg(a)·deg(b) — the hubs-attract baseline

    The structural difference from ``node_similarity``: the anti-join
    against the existing edge set keeps only pairs that are NOT already
    edges — similarity ranks what's there, this predicts what's missing.

    Shape: the same wedge join as similarity/triangles (co-neighbors
    only, never all-pairs) with the CENTER's degree joined in before
    the aggregate (a wedge center always has degree >= 2, so ln(deg)
    is never 0), one left_anti against the canonical edge set, then
    two broadcast-size degree joins. All JVM equi-joins.

    Scale: a wedge center of degree d generates C(d, 2) candidate
    pairs, so one power-law ultra-hub ("mentioned by everything",
    degree 10^5) alone contributes ~5·10^9 pairs. ``max_degree`` drops
    wedge CENTERS above the cutoff before the self-join — the same
    approximation as ``node_similarity(max_degree=...)``, and here it
    costs even less signal: Adamic-Adar already discounts a shared hub
    of degree d to 1/ln(d) ≈ 0, and ``common`` through an ultra-hub is
    noise, not evidence of a missing edge. Endpoint degrees (``da``,
    ``db``, and the center's ``dn`` inside Adamic-Adar) stay EXACT —
    only the candidate-generating wedge set is pruned, so surviving
    pairs keep their true pref_attach and per-center AA terms. Pairs
    whose ONLY shared neighbors are dropped hubs disappear; pairs also
    sharing a low-degree neighbor undercount the hub's ~0 AA term.
    Default None = exact.
    """
    und = _undirected(edges).localCheckpoint()
    adj = und.select(F.col("u").alias("node"), F.col("v").alias("nbr")) \
        .union(und.select(F.col("v").alias("node"),
                          F.col("u").alias("nbr")))
    deg = adj.groupBy("node").agg(F.count("*").alias("d"))
    wedge_src = adj.join(deg.select(F.col("node").alias("nbr"),
                                    F.col("d").alias("dn")), "nbr")
    if max_degree is not None:
        wedge_src = wedge_src.filter(F.col("dn") <= int(max_degree))
    wedge_src = wedge_src.localCheckpoint()
    cand = (
        wedge_src.alias("x")
        .join(wedge_src.alias("y"),
              (F.col("x.nbr") == F.col("y.nbr"))
              & (F.col("x.node") < F.col("y.node")))
        .groupBy(F.col("x.node").alias("a"), F.col("y.node").alias("b"))
        .agg(F.count("*").alias("common"),
             F.sum(F.lit(1.0) / F.log("x.dn")).alias("adamic_adar"))
    )
    if min_common > 1:
        cand = cand.filter(F.col("common") >= int(min_common))
    missing = cand.join(
        und.select(F.col("u").alias("a"), F.col("v").alias("b")),
        ["a", "b"], "left_anti")
    return (missing
            .join(deg.select(F.col("node").alias("a"),
                             F.col("d").alias("da")), "a")
            .join(deg.select(F.col("node").alias("b"),
                             F.col("d").alias("db")), "b")
            .select("a", "b", "common", "adamic_adar",
                    (F.col("da") * F.col("db")).alias("pref_attach")))


def modularity(edges: DataFrame, assignment: DataFrame,
               node_col: str = "id", community_col: str = "community",
               weight_col: str | None = None) -> DataFrame:
    """Newman modularity of a community assignment -> one row per
    community: (community, n_nodes, l_in, deg_sum, q_term) with
    Q = sum(q_term) = Σ_c [ l_c/m − (d_c/(2m))² ].

    This is the quality score for ``label_propagation`` output (the
    Neo4j GDS ``modularity`` analogue): l_c counts intra-community
    edges, d_c sums member degrees, m is the total edge count — all on
    the canonical undirected simple graph (``_undirected``: self-loops
    dropped, orientations collapsed; with ``weight_col`` parallel
    duplicates SUM and every count becomes a weight sum, the weighted
    Newman form).

    ``assignment`` must cover every node incident to an edge (LPA and
    connected-components outputs do by construction — their ids come
    from the edge set); edges whose endpoint is missing from the
    assignment are inner-joined away, which would silently shrink m's
    numerator terms, so don't feed partial assignments. Nodes assigned
    but isolated contribute n_nodes only (q_term 0 via empty l/d).

    Shape: two hash joins edge⋈assignment (community lookup per
    endpoint — broadcast when the assignment is small, AQE decides),
    three hash aggregates (intra by community, degree by community,
    size by community), and the scalar m folded IN-PLAN as a broadcast
    cross-join of a 1-row aggregate — zero driver actions, so the whole
    score is one job at any scale.
    """
    und = _undirected(edges, weight_col)
    if weight_col is not None:
        wexpr, zero = F.sum("w"), F.lit(0.0)
    else:
        wexpr, zero = F.count("*").cast("long"), F.lit(0).cast("long")
    asg = assignment.select(
        F.col(node_col).cast("string").alias("node"),
        F.col(community_col).cast("string").alias("community"))
    m1 = und.agg(wexpr.alias("m"))

    a1 = asg.select(F.col("node").alias("u"), F.col("community").alias("cu"))
    a2 = asg.select(F.col("node").alias("v"), F.col("community").alias("cv"))
    intra = (
        und.join(a1, "u").join(a2, "v")
        .filter(F.col("cu") == F.col("cv"))
        .groupBy(F.col("cu").alias("community"))
        .agg(wexpr.alias("l_in"))
    )
    wcols = ["w"] if weight_col is not None else []
    inc = und.select(F.col("u").alias("node"), *wcols).union(
        und.select(F.col("v").alias("node"), *wcols))
    deg = (inc.join(asg, "node")
           .groupBy("community").agg(wexpr.alias("deg_sum")))
    nn = asg.groupBy("community").agg(F.count("*").alias("n_nodes"))

    out = (
        nn.join(intra, "community", "left")
        .join(deg, "community", "left")
        .join(F.broadcast(m1), F.lit(True))
    )
    l_in = F.coalesce(F.col("l_in"), zero)
    d_c = F.coalesce(F.col("deg_sum"), zero)
    q = (l_in.cast("double") / F.col("m")
         - F.pow(d_c.cast("double") / (2 * F.col("m")), F.lit(2.0)))
    return out.select(
        "community", "n_nodes", l_in.alias("l_in"), d_c.alias("deg_sum"),
        q.alias("q_term"))


def conductance(edges: DataFrame, assignment: DataFrame,
                node_col: str = "id", community_col: str = "community",
                weight_col: str | None = None) -> DataFrame:
    """Per-community conductance -> (community, n_nodes, volume, cut,
    conductance): φ_c = cut_c / min(vol_c, 2m − vol_c), the standard
    "how leaky is this community" score (Neo4j GDS ``conductance``
    analogue) — 0 for a perfectly sealed community, →1 when almost
    every incident edge leaves it. The complementary readout to
    ``modularity``: modularity says the PARTITION beats chance,
    conductance says which individual communities are tight.

    Derived ENTIRELY from the aggregates modularity already computes —
    vol_c = deg_sum, cut_c = deg_sum − 2·l_in (every incident edge
    end is either one of the 2 ends of an intra edge or one cut edge),
    and 2m = Σ_c deg_sum (modularity's contract requires the
    assignment to cover every node incident to an edge, so the
    community degree sums partition all 2m edge ends) — so the cost
    and the scale shape ARE ``modularity``'s: the edge set is scanned
    once, and the only additions run over the #communities-row output
    frame (lazily checkpoint-reused so the totals branch never
    re-plans the edge scan) with the 2m scalar folded in-plan as a
    broadcast 1-row aggregate. Unweighted, all inputs to φ are exact
    integers and the single division is bit-reproducible in any
    engine; isolated communities (volume 0) yield NULL (no incident
    edges means conductance is undefined, not perfect)."""
    mod = modularity(edges, assignment, node_col, community_col,
                     weight_col).localCheckpoint(eager=False)
    two_m = mod.agg(F.sum("deg_sum").alias("_2m"))
    out = mod.join(F.broadcast(two_m), F.lit(True))
    cut = F.col("deg_sum") - 2 * F.col("l_in")
    denom = F.least(F.col("deg_sum"), F.col("_2m") - F.col("deg_sum"))
    phi = F.when(denom > 0, cut.cast("double") / denom)
    return out.select(
        "community", "n_nodes", F.col("deg_sum").alias("volume"),
        cut.alias("cut"), phi.alias("conductance"))


def graph_summary(edges: DataFrame) -> DataFrame:
    """One-row structural profile of the canonical undirected simple
    graph -> (n_nodes, n_edges, min_degree, max_degree, avg_degree,
    density, assortativity): the first thing to run on a freshly built
    KG — sanity-check scale, spot the power-law hubs (max_degree vs
    avg), and read the mixing pattern. ``assortativity`` is Newman's
    degree-assortativity coefficient (Newman 2002, "Assortative mixing
    in networks" — public): the Pearson correlation of endpoint
    degrees over edges, r = [Se/M − (S1/2M)²] / [S2/2M − (S1/2M)²]
    with Se = Σ j·k, S1 = Σ (j+k), S2 = Σ (j²+k²) over the M edges —
    negative for hub-to-leaf (most webtext/KG graphs), positive for
    social-style core-core mixing. Degree-regular graphs (zero
    variance) yield NULL.

    Cross-engine determinism: every sum is an exact integer (degrees
    are counts), so the final float formula runs on identical inputs
    in any engine and any summation order. Scale shape: one degree
    aggregate (map-combinable), two hash joins to stamp endpoint
    degrees on edges (AQE splits the hub keys), one 1-row edge
    aggregate crossed with one 1-row degree aggregate — zero driver
    actions; the canonical edge set is lazily checkpoint-reused so the
    input is scanned once."""
    und = _undirected(edges).localCheckpoint(eager=False)
    deg = (_degrees(und)
           .select("id", F.col("d").cast("long").alias("d"))
           .localCheckpoint(eager=False))
    j = (und.join(deg.select(F.col("id").alias("u"),
                             F.col("d").alias("du")), "u")
         .join(deg.select(F.col("id").alias("v"),
                          F.col("d").alias("dv")), "v"))
    es = j.agg(
        F.count("*").cast("long").alias("m"),
        F.sum(F.col("du") * F.col("dv")).cast("long").alias("se"),
        F.sum(F.col("du") + F.col("dv")).cast("long").alias("s1"),
        F.sum(F.col("du") * F.col("du")
              + F.col("dv") * F.col("dv")).cast("long").alias("s2"))
    ns = deg.agg(F.count("*").cast("long").alias("n_nodes"),
                 F.min("d").alias("min_degree"),
                 F.max("d").alias("max_degree"),
                 F.sum("d").cast("long").alias("dsum"))
    out = ns.join(F.broadcast(es), F.lit(True))
    mean = F.col("s1") / (2.0 * F.col("m"))
    var = F.col("s2") / (2.0 * F.col("m")) - mean * mean
    r = F.when(var > 0,
               (F.col("se") / F.col("m") - mean * mean) / var)
    return out.select(
        "n_nodes", F.col("m").alias("n_edges"), "min_degree",
        "max_degree",
        F.when(F.col("n_nodes") > 0,
               F.col("dsum") / F.col("n_nodes")).alias("avg_degree"),
        F.when(F.col("n_nodes") > 1,
               F.col("dsum") / (F.col("n_nodes")
                                * (F.col("n_nodes") - 1.0)))
        .alias("density"),
        r.alias("assortativity"))


def katz_centrality(edges: DataFrame, alpha: float = 0.1,
                    beta: float = 1.0, iters: int = 5,
                    weight_col: str | None = None) -> DataFrame:
    """Fixed-iteration Katz centrality over edges(u, v) -> (id string,
    katz double): x_{t+1} = β + α · Σ_nbr w·x_t, from x_0 = β (Katz
    1953; the GDS ``katz`` analogue). Unlike degree, Katz credits a
    node for its neighbors' importance; unlike PageRank, it does NOT
    normalize by out-degree, so a hub confers full weight to every
    neighbor — the centrality of choice when being cited by a
    well-connected node should count fully (citation and endorsement
    graphs).

    Truncated power series: after T rounds x counts all walks of
    length <= T weighted α^len — convergent when α < 1/λ_max; with
    fixed ``iters`` the output is deterministic and SQL-replayable
    regardless (the oracle unrolls the same rounds). Undirected
    canonical edge set (``_undirected``): parallel duplicates SUM when
    weighted, dedupe otherwise.

    Shape: identical to PageRank's — ONE equi-join + hash aggregate
    per round over the checkpointed adjacency, scores frame
    re-checkpointed per round so the plan stays O(1) deep. No driver
    actions besides the checkpoints.
    """
    if iters < 1:
        raise ValueError("katz_centrality: iters must be >= 1")
    if alpha <= 0:
        raise ValueError(f"katz_centrality: alpha must be > 0, got {alpha}")
    und = _undirected(edges, weight_col)
    wcols = ["w"] if weight_col is not None else []
    adj = (und.select(F.col("u").alias("node"), F.col("v").alias("nbr"),
                      *wcols)
           .union(und.select(F.col("v").alias("node"),
                             F.col("u").alias("nbr"), *wcols))
           .localCheckpoint())
    x = adj.select(F.col("node").alias("id")).distinct() \
        .withColumn("x", F.lit(float(beta))).localCheckpoint()
    contrib = (F.sum(F.col("w") * F.col("x"))
               if weight_col is not None else F.sum("x"))
    for _ in range(iters):
        s = (adj.join(x.select(F.col("id").alias("nbr"), "x"), "nbr")
             .groupBy("node").agg(contrib.alias("s")))
        x = (s.select(F.col("node").alias("id"),
                      (F.lit(float(beta))
                       + F.lit(float(alpha)) * F.col("s")).alias("x"))
             .localCheckpoint())
    return x.select("id", F.col("x").alias("katz"))


def neighborhood_sketches(edges: DataFrame, radius: int, k: int = 64,
                          salt: str = "v1",
                          hub_buckets: int = 16) -> DataFrame:
    """HyperBall (Boldi & Vigna 2013) with the engine's DETERMINISTIC
    KMV bottom-k sketch in place of HyperLogLog: for every node and
    every r = 0..``radius``, a mergeable sketch of the ball B(v, r) =
    {nodes within <= r hops} -> (id, r, n_min, estimate, sketch).
    The neighborhood function (how many nodes are within r hops —
    the effective-diameter / average-distance primitive) at graph
    scale, where exact per-node BFS from every source is O(n·m).

    Round r merges each node's own round-(r-1) sketch with its
    neighbors' and re-takes the k smallest hashes — the same
    bottom-k-union the KMV sketch is mergeable by (sketches.py), so
    sketch(B(v,r)) is EXACTLY kmv_sketch applied to the ball's members:
    exact below k distinct, (k-1)/h_k above, and — because the hash is
    the engine's sha256 draw — a pure function of the graph,
    reproducible bit-for-bit on any partitioning or engine (the oracle
    unrolls the identical rounds as SQL).

    Scale shape: one equi-join (edges ⋈ sketches) + one bottom-k
    re-aggregation per round — HyperBall's cost, O(m·k) rows moved per
    round with no frontier blowup; localCheckpoint truncates lineage
    per round. Estimate error ~ 1/sqrt(k-2).

    ``hub_buckets`` (> 1, default 16) bounds the hot-key straggler a
    power-law hub would otherwise create: a degree-10^6 node funnels
    deg·k candidate rows into ONE bottom-k window task. The two-phase
    form first takes bottom-k per (node, hash(u) % hub_buckets) — hub
    partitions shrink by the bucket factor — then bottom-k per node
    over the ≤ hub_buckets·k survivors. Output is IDENTICAL (each of
    the k smallest hashes is within its own bucket's k smallest — the
    same property that makes KMV sketches mergeable); the cost is one
    extra bounded shuffle per round. 1 disables the pre-phase."""
    from neo4j_document_pipeline_spark.operators.sampling import (
        uniform_hash_col)
    from pyspark.sql import Window
    if radius < 0:
        raise ValueError(f"radius must be >= 0, got {radius}")
    if k < 2:
        raise ValueError(f"k must be >= 2, got {k}")
    und = _undirected(edges)
    e = und.union(und.select(F.col("v").alias("u"),
                             F.col("u").alias("v"))).localCheckpoint()
    spark = edges.sparkSession
    # hash ROWS (id, u), not arrays: bottom-k re-aggregation is a
    # window over rows, and the round merge is a plain union+distinct
    cur = (e.select(F.col("u").alias("id")).distinct()
           .withColumn("u", uniform_hash_col("id", salt))
           .localCheckpoint())
    rounds = [cur.withColumn("r", F.lit(0))]
    w = Window.partitionBy("id").orderBy("u")
    for r in range(1, radius + 1):
        # edges carry (u, v) as endpoints and sketches carry u as the
        # hash — re-alias the endpoints before joining
        contrib = (e.select(F.col("u").alias("dst"),
                            F.col("v").alias("src"))
                   .join(cur.withColumnRenamed("id", "src"), "src")
                   .select(F.col("dst").alias("id"), "u"))
        allr = cur.select("id", "u").unionByName(contrib)
        if hub_buckets > 1:
            w1 = Window.partitionBy("id", "_b").orderBy("u")
            allr = (allr.withColumn(
                        "_b", F.pmod(F.hash("u"), F.lit(hub_buckets)))
                    .dropDuplicates(["id", "_b", "u"])
                    .withColumn("_rn", F.row_number().over(w1))
                    .filter(F.col("_rn") <= k).drop("_rn", "_b"))
        else:
            allr = allr.distinct()
        merged = (allr
                  .withColumn("_rn", F.row_number().over(w))
                  .filter(F.col("_rn") <= k).drop("_rn")
                  .localCheckpoint())
        rounds.append(merged.withColumn("r", F.lit(r)))
        cur = merged
    allr = rounds[0]
    for fr in rounds[1:]:
        allr = allr.unionByName(fr)
    est = F.when(F.col("n_min") < k, F.col("n_min").cast("double")) \
        .otherwise(F.lit(float(k - 1)) / F.element_at("sketch", -1))
    return (allr.groupBy("id", "r")
            .agg(F.array_sort(F.collect_list("u")).alias("sketch"),
                 F.count("*").alias("n_min"))
            .withColumn("estimate", est))


def harmonic_centrality_sketch(edges: DataFrame, radius: int, k: int = 64,
                               salt: str = "v1") -> DataFrame:
    """Approximate harmonic centrality from the HyperBall sketches:
    H(v) = Σ_{r=1..radius} (|B(v,r)| - |B(v,r-1)|) / r — each shell's
    node count discounted by its distance, the centrality HyperBall was
    built to compute (closeness without the disconnected-graph
    pathology). Exact when every ball stays below k distinct nodes;
    (k-1)/h_k-estimated above. -> (id, harmonic)."""
    from pyspark.sql import Window
    nb = neighborhood_sketches(edges, radius, k=k, salt=salt)
    w = Window.partitionBy("id").orderBy("r")
    prev = F.lag("estimate", 1).over(w)
    return (nb.select("id", "r", "estimate")
            .withColumn("_shell", F.col("estimate") - F.coalesce(
                prev, F.lit(0.0)))
            .filter(F.col("r") >= 1)
            .groupBy("id")
            .agg(F.sum(F.col("_shell") / F.col("r")).alias("harmonic")))


def neighborhood_function(edges: DataFrame, radius: int, k: int = 64,
                          salt: str = "v1") -> DataFrame:
    """The graph's distance distribution from the HyperBall sketches:
    per radius r, how many (node, reachable-node) pairs lie within r
    hops -> (r, n_nodes, total_reach_x1e4). This is N(r) of Palmer's
    ANF / HyperBall — the curve whose saturation point is the effective
    diameter (smallest r with N(r) >= 0.9 * N(max)).

    total_reach_x1e4 = Σ_v floor(|B(v,r)|·10^4 + 0.5) — ball estimates
    fixed-pointed to 4dp BEFORE summing so the aggregate is an exact
    integer, independent of float summation order (a double Σ over
    thousands of rows is last-ulp order-dependent and engine-dependent;
    an integer Σ is not). The sum runs as DECIMAL(38,0) — n² pair
    counts overflow int64 past ~10^14 reachable pairs, and a non-ANSI
    long sum would wrap SILENTLY — and is emitted as double (both
    engines round the same exact integer to the same IEEE double).
    Divide by 10^4 for the real value."""
    nb = neighborhood_sketches(edges, radius, k=k, salt=salt)
    fixed = F.floor(F.col("estimate") * 10000.0 + 0.5).cast("decimal(38,0)")
    return (nb.groupBy("r")
            .agg(F.count("*").alias("n_nodes"),
                 F.sum(fixed).cast("double").alias("total_reach_x1e4")))


def effective_diameter(edges: DataFrame, radius: int, k: int = 64,
                       salt: str = "v1", quantile: float = 0.9) -> int:
    """Smallest radius whose neighborhood function reaches ``quantile``
    of its value at ``radius`` (the standard 90%-effective-diameter).
    N(r) is nondecreasing, so a result is always found at r <= radius —
    but when the CURVE is still growing at ``radius`` (N(radius) >
    N(radius-1)) the true N(max) is unknown and the result is only a
    LOWER BOUND; callers who see result == radius should probe with a
    larger radius. Driver-side over radius+1 rows."""
    if not (0.0 < quantile <= 1.0):
        raise ValueError(f"quantile must be in (0, 1], got {quantile}")
    rows = {r["r"]: r["total_reach_x1e4"]
            for r in neighborhood_function(edges, radius, k, salt).collect()}
    if not rows:
        return 0
    target = quantile * rows[max(rows)]
    return min(r for r in sorted(rows) if rows[r] >= target)


def random_walks(edges: DataFrame, walk_len: int = 4,
                 walks_per_node: int = 1, salt: str = "v1",
                 directed: bool = False,
                 starts: list[str] | None = None) -> DataFrame:
    """Deterministic random-walk corpus -> (start, rep, step, node):
    ``walks_per_node`` truncated walks of ``walk_len`` steps from every
    node (or from ``starts``), the DeepWalk/node2vec sampling primitive
    (Perozzi et al. 2014 — public): the emitted node sequences are the
    "sentences" a skip-gram embedding trains on, and walk co-occurrence
    is itself a similarity signal.

    Every transition is a PURE FUNCTION of the graph: the next hop from
    ``cur`` at step ``t`` of walk (start, rep) is the neighbor
    minimizing sha256('<salt>:<start>:<rep>:<t>:<cur>:<neighbor>') —
    per-step-keyed so a walk revisiting a node does not repeat itself
    deterministically forever, uniform over neighbors per draw, and
    bit-reproducible on any partitioning, cluster size, or engine (the
    oracle replays the identical hash ordering in SQL). No
    rand()/sample(): those are partitioning-dependent, which would make
    the training corpus unstable across compactions and cluster sizes.
    Walks that reach a dead end (directed sinks) simply stop — their
    emitted prefix stands; a walk STARTED at a directed sink is just
    its step-0 row. ``starts`` is restricted to nodes actually present
    in the graph — a phantom id must not fabricate a one-token
    training sentence for a node that doesn't exist.

    Scale shape: per step ONE equi-join (state ⋈ adjacency on the
    current node — never BNLJ) and ONE min(struct) aggregate, which is
    map-side combinable: a degree-10^6 hub visited by many walks fans
    out deg·walks candidate rows but partial-combines to one row per
    walk per partition before the shuffle, and AQE's skew split handles
    the hot join key. localCheckpoint per step keeps the plan O(1)
    deep; total output is O(starts · walks_per_node · walk_len) rows —
    walk count, not edge count, bounds the result.
    """
    spark = edges.sparkSession
    if walk_len < 1:
        raise ValueError(f"walk_len must be >= 1, got {walk_len}")
    if walks_per_node < 1:
        raise ValueError(
            f"walks_per_node must be >= 1, got {walks_per_node}")
    if directed:
        e = (edges.select(F.col("u").cast("string"),
                          F.col("v").cast("string"))
             .filter(F.col("u") != F.col("v")).distinct())
    else:
        und = _undirected(edges)
        e = und.union(und.select(F.col("v").alias("u"),
                                 F.col("u").alias("v")))
    e = e.localCheckpoint()
    # every node of the graph — including directed sinks, which appear
    # only as v and whose walks are their step-0 row
    nodes = (e.select(F.col("u").alias("start"))
             .union(e.select(F.col("v").alias("start"))).distinct())
    if starts is not None:
        w0 = spark.createDataFrame(
            [(str(s),) for s in sorted({str(s) for s in starts})],
            "start string").join(nodes, "start", "left_semi")
    else:
        w0 = nodes
    reps = F.explode(
        F.sequence(F.lit(0), F.lit(walks_per_node - 1))).alias("rep")
    state = (w0.select("start", reps)
             .withColumn("cur", F.col("start"))
             .localCheckpoint())
    out = [state.select(
        "start", "rep", F.lit(0).cast("int").alias("step"),
        F.col("cur").alias("node"))]
    for t in range(1, walk_len + 1):
        cand = state.join(e.withColumnRenamed("u", "cur"), "cur")
        h = F.conv(F.substring(F.sha2(F.concat_ws(
            ":", F.lit(salt), F.col("start"), F.col("rep"), F.lit(t),
            F.col("cur"), F.col("v")), 256), 1, 8), 16, 10) \
            .cast("bigint")
        state = (cand.groupBy("start", "rep")
                 .agg(F.min(F.struct(h.alias("h"),
                                     F.col("v").alias("v"))).alias("m"))
                 .select("start", "rep", F.col("m.v").alias("cur"))
                 .localCheckpoint())
        out.append(state.select(
            "start", "rep", F.lit(t).cast("int").alias("step"),
            F.col("cur").alias("node")))
    allw = out[0]
    for fr in out[1:]:
        allw = allw.unionByName(fr)
    return allw


def walk_ppmi(edges: DataFrame, *, walk_len: int = 4,
              walks_per_node: int = 2, window: int = 2,
              salt: str = "v1", directed: bool = False) -> DataFrame:
    """Positive-PMI co-occurrence factors from the deterministic walk
    corpus -> (node, context, cooc, ppmi): count node pairs appearing
    within ``window`` steps of each other on the same walk, then
    ppmi = max-filtered ln(#(a,b)·T / (#a·#b)) over the pair totals.
    Skip-gram-with-negative-sampling implicitly factorizes exactly this
    matrix (Levy & Goldberg 2014 — public), so these rows ARE the
    DeepWalk representation in its closed-form sparse shape: cosine
    over a node's ppmi row ranks structural neighbors the same way the
    trained embedding would, with zero SGD and full replayability —
    bit-reproducible on any partitioning or engine, like every walk
    transition beneath it.

    Only ppmi > 0 rows are emitted (the sparse positive part — the
    standard truncation); symmetric by construction (both orders of a
    pair are counted, so row and context marginals coincide).

    Scale shape: one equi-join of the walk corpus with itself on the
    walk id (per-walk fan-out bounded by walk_len² — walk count, not
    edge count, bounds the volume), one pair aggregate, marginals from
    the pair table, the total folded in-plan as a broadcast 1-row
    aggregate. Zero driver actions beyond the walk's own per-step
    checkpoints."""
    if window < 1:
        raise ValueError(f"window must be >= 1, got {window}")
    w = random_walks(edges, walk_len=walk_len,
                     walks_per_node=walks_per_node, salt=salt,
                     directed=directed)
    a = w.select("start", "rep", F.col("step").alias("sa"),
                 F.col("node").alias("node"))
    b = w.select("start", "rep", F.col("step").alias("sb"),
                 F.col("node").alias("context"))
    pairs = (a.join(b, ["start", "rep"])
             .filter((F.col("sa") != F.col("sb"))
                     & (F.abs(F.col("sa") - F.col("sb")) <= window)))
    cooc = (pairs.groupBy("node", "context")
            .agg(F.count("*").alias("cooc")))
    marg = cooc.groupBy("node").agg(F.sum("cooc").alias("nm"))
    tot = cooc.agg(F.sum("cooc").cast("double").alias("tt"))
    scored = (
        cooc.join(marg.withColumnRenamed("node", "_a"),
                  F.col("node") == F.col("_a"))
        .withColumnRenamed("nm", "na")
        .join(marg.withColumnRenamed("node", "_b"),
              F.col("context") == F.col("_b"))
        .withColumnRenamed("nm", "nb")
        .join(F.broadcast(tot), F.lit(True))
        .withColumn("ppmi", F.log(F.col("cooc") * F.col("tt")
                                  / (F.col("na") * F.col("nb"))))
    )
    return (scored.filter(F.col("ppmi") > 0)
            .select("node", "context", "cooc", "ppmi"))


def strongly_connected_components(edges: DataFrame,
                                  max_rounds: int = 12,
                                  max_prop_iters: int = 60) -> DataFrame:
    """Directed strongly connected components -> (id, scc) with scc =
    the minimum node id of the component — the directed counterpart of
    ``components.connected_components`` and the classic web/KG-graph
    decomposition (Broder et al.'s bow-tie is exactly this operator's
    output). Coloring algorithm (Orzan 2004; the FW-BW family —
    public), deterministic throughout:

    per outer round over the still-unassigned subgraph:
      1. TRIM to fixpoint: nodes with no remaining in-edges or no
         remaining out-edges are singleton SCCs — settled immediately
         (this alone finishes any DAG, so rounds are spent only on
         genuinely cyclic structure);
      2. COLOR to fixpoint: col(v) = min id that reaches v, propagated
         FORWARD one hop per iteration (one equi-join + one min
         aggregate — map-side combinable, never a closure
         materialization);
      3. MARK backward from each color's root r over SAME-COLOR edges:
         the marked set is exactly SCC(r) (any cycle through r and a
         color-r node is monochrome: a smaller-id intruder on it would
         recolor the whole cycle), assigned and removed.

    Every round settles at least one SCC per color class, so cyclic
    cores drain geometrically in practice; ``max_rounds`` /
    ``max_prop_iters`` bound the loops and non-convergence raises
    LOUDLY (a silent truncation would split components). Scale shape:
    every step is an equi-join + aggregate on node ids,
    localCheckpoint-ed per iteration (O(1) plan depth); no step ever
    materializes reachability pairs."""
    spark = edges.sparkSession
    cols = edges.columns
    raw = (edges.select(F.col(cols[0]).cast("string").alias("src"),
                        F.col(cols[1]).cast("string").alias("dst"))
           .filter(F.col("src").isNotNull() & F.col("dst").isNotNull()))
    # nodes BEFORE self-loop removal: a node whose only edge is a
    # self-loop is a singleton SCC, not absent
    active = (raw.select(F.col("src").alias("id"))
              .union(raw.select(F.col("dst").alias("id")))
              .distinct().localCheckpoint())
    e0 = (raw.filter(F.col("src") != F.col("dst"))
          .distinct().localCheckpoint())
    done = spark.createDataFrame([], "id string, scc string")
    ea = e0

    def _chk(df, c):
        row = (df.select(F.crc32(F.concat_ws("|", "id", c)).alias("h"))
               .agg(F.count("*"), F.sum("h"), F.expr("bit_xor(h)"))
               .first())
        return tuple(row)

    for _ in range(max_rounds):
        if active.first() is None:
            return done
        # ---- trim singleton SCCs (no in- or no out-edges) ----
        for _t in range(max_prop_iters):
            srcs = ea.select(F.col("src").alias("id")).distinct()
            dsts = ea.select(F.col("dst").alias("id")).distinct()
            trivial = (active.join(srcs, "id", "left_anti")
                       .union(active.join(dsts, "id", "left_anti"))
                       .distinct().localCheckpoint())
            if trivial.first() is None:
                break
            done = done.unionByName(
                trivial.select("id", F.col("id").alias("scc"))) \
                .localCheckpoint()
            active = active.join(trivial, "id", "left_anti") \
                .localCheckpoint()
            ea = (ea.join(trivial.select(F.col("id").alias("src")),
                          "src", "left_anti")
                  .join(trivial.select(F.col("id").alias("dst")),
                        "dst", "left_anti").localCheckpoint())
        if active.first() is None:
            return done
        # ---- forward min-label coloring to fixpoint ----
        col = (active.select("id", F.col("id").alias("col"))
               .localCheckpoint())
        prev = _chk(col, "col")
        for _p in range(max_prop_iters):
            inc = (ea.join(col.select(F.col("id").alias("src"),
                                      F.col("col").alias("c")), "src")
                   .groupBy("dst").agg(F.min("c").alias("cin")))
            col = (col.join(inc.select(F.col("dst").alias("id"), "cin"),
                            "id", "left")
                   .select("id", F.least(
                       "col", F.coalesce("cin", "col")).alias("col"))
                   .localCheckpoint())
            cur = _chk(col, "col")
            if cur == prev:
                break
            prev = cur
        else:
            raise RuntimeError(
                "strongly_connected_components: coloring did not "
                f"converge within {max_prop_iters} iterations — raise "
                "max_prop_iters (diameter-bound) rather than trusting "
                "a truncated fixpoint")
        # ---- backward marking over same-color edges ----
        colored_e = (ea.join(col.select(F.col("id").alias("src"),
                                        F.col("col").alias("cs")),
                             "src")
                     .join(col.select(F.col("id").alias("dst"),
                                      F.col("col").alias("cd")), "dst")
                     .filter(F.col("cs") == F.col("cd"))
                     .select("src", "dst").localCheckpoint())
        mk = (col.filter(F.col("col") == F.col("id")).select("id")
              .localCheckpoint())
        for _m in range(max_prop_iters):
            grow = (colored_e.join(mk.select(F.col("id").alias("dst")),
                                   "dst")
                    .select(F.col("src").alias("id")).distinct()
                    .join(mk, "id", "left_anti").localCheckpoint())
            if grow.first() is None:
                break
            mk = mk.union(grow).localCheckpoint()
        else:
            raise RuntimeError(
                "strongly_connected_components: backward marking did "
                f"not converge within {max_prop_iters} iterations")
        found = mk.join(col, "id").select(
            "id", F.col("col").alias("scc"))
        done = done.unionByName(found).localCheckpoint()
        active = active.join(mk, "id", "left_anti").localCheckpoint()
        ea = (ea.join(mk.select(F.col("id").alias("src")),
                      "src", "left_anti")
              .join(mk.select(F.col("id").alias("dst")),
                    "dst", "left_anti").localCheckpoint())
    if active.first() is not None:
        raise RuntimeError(
            "strongly_connected_components: unassigned nodes remain "
            f"after {max_rounds} rounds — raise max_rounds (each round "
            "settles at least one SCC per color class; hitting this "
            "on a real graph means an adversarial SCC chain)")
    return done


def feature_propagation(edges: DataFrame, features: DataFrame,
                        rounds: int = 2, *, id_col: str = "id",
                        feat_col: str = "f") -> DataFrame:
    """SGC-style feature smoothing without SGD (Wu et al. 2019,
    "Simplifying Graph Convolutional Networks"): ``rounds`` applications
    of the self-inclusive neighborhood mean,

        f_{r+1}(x) = (f_r(x) + sum_{y in N(x)} f_r(y)) DIV (1 + deg(x)),

    over an undirected graph — the propagated feature a node classifier
    consumes (entity typing over the KG: a node's smoothed feature
    reflects its neighborhood, no training loop involved).

    All arithmetic is NON-NEGATIVE INTEGER (sums + one truncating
    division per round), so results are bit-identical on any
    partitioning, cluster size, or engine — the repo's oracle
    convention; quantize float features to fixed-point upstream
    (floor(x * 10^s)) exactly like kmeans/clustering.py does. Each
    round is ONE equi-join + one map-combinable aggregation; the degree
    frame is computed once; lineage checkpointed per round. Isolated
    nodes keep their feature (deg 0 -> identity).

    ``edges`` (u, v) are canonicalized undirected and deduplicated here
    so provenance multiplicity can't double-count a neighbor; pass
    pre-weighted sums yourself if multiplicity IS the signal.
    Returns (id, f) after all rounds.
    """
    if rounds < 1:
        raise ValueError(f"rounds must be >= 1, got {rounds}")
    e = (edges.select(F.least("u", "v").alias("u"),
                      F.greatest("u", "v").alias("v"))
         .filter(F.col("u") != F.col("v")).distinct())
    bidir = e.union(e.select(F.col("v").alias("u"), F.col("u").alias("v"))) \
             .localCheckpoint(eager=False)
    deg = bidir.groupBy("u").agg(F.count(F.lit(1)).alias("_deg")) \
               .localCheckpoint(eager=False)
    f = features.select(F.col(id_col).alias("id"),
                        F.col(feat_col).cast("long").alias("f"))
    for _ in range(rounds):
        f = f.localCheckpoint(eager=False)
        nsum = (bidir.join(f.select(F.col("id").alias("v"),
                                    F.col("f").alias("_nf")), "v")
                .groupBy("u").agg(F.sum("_nf").alias("_s")))
        f = (f.join(nsum.select(F.col("u").alias("id"), "_s"), "id", "left")
             .join(deg.select(F.col("u").alias("id"), "_deg"), "id", "left")
             .select("id", F.expr(
                 "(f + coalesce(_s, 0L)) DIV (1 + coalesce(_deg, 0L))")
                 .alias("f")))
    return f


def power_law_alpha(edges: DataFrame, dmin: int = 2) -> DataFrame:
    """Degree-tail exponent by discrete MLE (Clauset-Shalizi-Newman
    2009): alpha = 1 + n / sum(ln(d / (dmin - 0.5))) over nodes with
    degree >= dmin. THE skew number for capacity planning: alpha < 2.5
    means hub degrees grow fast enough that every unbounded wedge/pair
    operator needs its hub cap engaged (node_similarity /
    link_prediction max_degree, npmi max_ctx), and shuffle salting is
    mandatory on the head keys. Complements graph_summary's max/avg
    degree with the actual tail shape.

    One degree aggregation + one scalar aggregation; returns a single
    row (n_tail, dmin, alpha). Undirected degrees over deduplicated
    canonical edges, matching graph_summary's convention."""
    if dmin < 1:
        raise ValueError(f"dmin must be >= 1, got {dmin}")
    e = (edges.select(F.least("u", "v").alias("u"),
                      F.greatest("u", "v").alias("v"))
         .filter(F.col("u") != F.col("v")).distinct())
    deg = (e.select(F.col("u").alias("id"))
           .union(e.select(F.col("v").alias("id")))
           .groupBy("id").agg(F.count(F.lit(1)).alias("d"))
           .filter(F.col("d") >= dmin))
    return deg.agg(
        F.count(F.lit(1)).alias("n_tail"),
        F.lit(dmin).alias("dmin"),
        F.round(1.0 + F.count(F.lit(1))
                / F.sum(F.log(F.col("d") / (dmin - 0.5))), 6)
        .alias("alpha"))


def maximal_independent_set(edges: DataFrame, salt: str = "v1",
                            max_iters: int = 20) -> DataFrame:
    """Deterministic Luby maximal independent set -> (id string, round
    int). No two output nodes are adjacent, and every non-output node
    has an output neighbor — the classic conflict-free scheduling /
    landmark-selection primitive (pick one representative per dense
    neighborhood, e.g. one canonical page per mutually-near-duplicate
    cluster when only the adjacency is materialized).

    Luby's algorithm (Luby 1986) with the engine's deterministic draw
    instead of RNG: each node's priority is sha256('<salt>:<id>')
    suffixed with the id itself (globally unique, so comparisons are
    total) — a pure function of the node set, identical across
    partitionings, engines, and cluster sizes; change ``salt`` for an
    independent run. Per round, every ACTIVE node whose priority is
    smaller than all its active neighbors' joins the MIS; winners and
    their neighbors leave the active set. Expected O(log n) rounds on
    any graph (the public analysis); ``max_iters`` turns pathology
    into a loud error, never a silent partial answer.

    Scale: each round is one edge-to-priority equi-join + one min
    aggregation + two anti-joins — O(m) shuffled rows, hash-partitioned
    on node id, plan depth O(1) via localCheckpoint. ``round`` in the
    output records when each node entered (round r selections are the
    r-th independent "wave" — useful as a deterministic scheduling
    order downstream)."""
    und = _undirected(edges).localCheckpoint()
    pri = (und.select(F.col("u").alias("id"))
           .union(und.select(F.col("v").alias("id"))).distinct()
           .select("id", F.concat(
               F.sha2(F.concat(F.lit(f"{salt}:"), F.col("id")), 256),
               F.lit(":"), F.col("id")).alias("p"))
           .localCheckpoint())
    active = pri
    picked = []
    for rnd in range(max_iters):
        if active.isEmpty():
            out = picked[0]
            for df in picked[1:]:
                out = out.union(df)
            return out
        act_ids = active.select("id")
        # adjacency restricted to edges with BOTH endpoints active
        adj = (und.select(F.col("u").alias("id"), F.col("v").alias("nbr"))
               .union(und.select(F.col("v").alias("id"),
                                 F.col("u").alias("nbr")))
               .join(act_ids, "id")
               .join(act_ids.withColumnRenamed("id", "nbr"), "nbr"))
        min_nbr = (adj.join(active.select(F.col("id").alias("nbr"),
                                          F.col("p").alias("nbr_p")), "nbr")
                   .groupBy("id").agg(F.min("nbr_p").alias("min_nbr_p")))
        sel = (active.join(min_nbr, "id", "left")
               .filter(F.col("min_nbr_p").isNull()
                       | (F.col("p") < F.col("min_nbr_p")))
               .select("id").localCheckpoint())
        picked.append(sel.select("id", F.lit(rnd).alias("round")))
        removed = (sel.union(
            adj.join(sel, "id").select(F.col("nbr").alias("id")))
            .distinct())
        active = active.join(removed, "id", "left_anti").localCheckpoint()
    raise RuntimeError(
        f"maximal_independent_set did not finish in {max_iters} rounds; "
        "raise max_iters")


def butterfly_count(edges: DataFrame, *, left_col: str = "l",
                    right_col: str = "r",
                    max_right_degree: int | None = None) -> DataFrame:
    """Bipartite 4-cycle (butterfly) census -> ONE row (n_left,
    n_right, n_edges, n_wedge_pairs, n_butterflies). The butterfly is
    the bipartite clustering primitive (Wang et al., "Butterfly
    Counting in Bipartite Networks"): two left nodes sharing two right
    neighbors. In a page–entity KG a butterfly surplus means templated
    co-mention structure (mirrors, boilerplate); in user–item data it
    is the co-engagement density driving recommender confidence.

    Exact combinatorics, no enumeration of 4-cycles: wedge pairs
    (left pair sharing ONE right node) come from the right-anchored
    self-join; per left pair with c shared rights, butterflies =
    C(c, 2), summed. The self-join is the quadratic risk: its volume
    is sum C(d_r, 2) over right degrees, so ``max_right_degree`` drops
    right-side ultra-hubs first (same hub-cap contract as
    node_similarity / link_prediction — a right node shared by
    everything carries template noise, not signal; None = exact).
    Wedges shuffle on the right id (one hash join), pair counts on the
    left pair — both partial-aggregated map-side."""
    e = (edges.select(F.col(left_col).cast("string").alias("l"),
                      F.col(right_col).cast("string").alias("r"))
         .filter(F.col("l").isNotNull() & F.col("r").isNotNull())
         .distinct().localCheckpoint())
    base = e
    if max_right_degree is not None:
        if max_right_degree < 2:
            raise ValueError("max_right_degree must be >= 2")
        keep = (e.groupBy("r").agg(F.count(F.lit(1)).alias("d"))
                .filter(F.col("d") <= max_right_degree).select("r"))
        base = e.join(keep, "r")
    a, b = base.alias("a"), base.alias("b")
    pair_counts = (a.join(b, (F.col("a.r") == F.col("b.r"))
                          & (F.col("a.l") < F.col("b.l")))
                   .groupBy(F.col("a.l").alias("l1"),
                            F.col("b.l").alias("l2"))
                   .agg(F.count(F.lit(1)).alias("c")))
    wedge_stats = pair_counts.agg(
        F.coalesce(F.sum("c"), F.lit(0)).cast("long")
        .alias("n_wedge_pairs"),
        F.coalesce(F.sum(F.col("c") * (F.col("c") - 1) / 2),
                   F.lit(0)).cast("long").alias("n_butterflies"))
    sizes = base.agg(
        F.countDistinct("l").alias("n_left"),
        F.countDistinct("r").alias("n_right"),
        F.count(F.lit(1)).alias("n_edges"))
    return (sizes.crossJoin(wedge_stats)
            .select("n_left", "n_right", "n_edges", "n_wedge_pairs",
                    "n_butterflies"))


def betweenness_centrality(edges: DataFrame,
                           sources: list[str] | None = None, *,
                           max_depth: int = 12,
                           normalized: bool = True) -> DataFrame:
    """Shortest-path betweenness centrality (Brandes 2001) ->
    (id string, betweenness double), estimated from ``sources``
    (Brandes–Pich 2007 pivot sampling: dependencies from a source
    subset, scaled by n/|S| — the UNBIASED estimator; pass None for
    the exact all-sources computation). On a power-law web KG the
    exact computation is O(n·m) — the sampled form with a few
    hundred deterministic pivots is the 100-TB path.

    Two level-synchronous passes, all equi-joins:
    - forward: multi-source BFS carrying path counts — frontier ⋈
      edges, partial-aggregated σ sum per (source, node), anti-join
      against settled, localCheckpoint per level. σ is exact int64
      (overflows only past ~10^18 shortest paths per pair — raise
      ``max_depth`` thoughtfully on dense graphs).
    - backward: Brandes' dependency accumulation unrolled by level,
      deepest first: δ(v) = Σ_succ (σ_v/σ_w)(1+δ_w), one join + one
      aggregation per level, no driver actions (the level count is
      already known from the forward pass).

    Raises loudly if the BFS needs more than ``max_depth`` levels
    (a silent cap would drop long-path dependencies — wrong answers).
    ``normalized`` divides by (n-1)(n-2)/2 pair count so scores land
    in [0, 1] and stay comparable across sample sizes; either way the
    n/|S| sample scaling is applied. Undirected; each unordered pair
    contributes from both directions, hence the /2.
    """
    spark = edges.sparkSession
    und = _undirected(edges)
    e = (und.union(und.select(F.col("v").alias("u"),
                              F.col("u").alias("v")))
         .localCheckpoint())
    nodes = e.select(F.col("u").alias("id")).distinct().localCheckpoint()
    if sources is None:
        src = nodes
    else:
        src = spark.createDataFrame(
            [(str(s),) for s in sorted({str(s) for s in sources})],
            "id string")
    level = src.select(F.col("id").alias("s"), F.col("id").alias("v"),
                       F.lit(1).cast("long").alias("sigma")) \
        .localCheckpoint()
    levels = [level]
    settled = level.select("s", "v")
    for depth in range(1, max_depth + 2):
        nxt = (level.select("s", F.col("v").alias("u"), "sigma")
               .join(e, "u")
               .groupBy("s", "v")
               .agg(F.sum("sigma").alias("sigma"))
               .join(settled, ["s", "v"], "left_anti")
               .localCheckpoint())
        if nxt.rdd.isEmpty():
            break
        if depth == max_depth + 1:
            raise RuntimeError(
                f"betweenness_centrality: BFS still expanding after "
                f"{max_depth} levels; raise max_depth")
        levels.append(nxt)
        settled = settled.union(nxt.select("s", "v")).localCheckpoint()
        level = nxt

    maxd = len(levels) - 1
    zero = F.lit(0.0).alias("delta")
    if maxd == 0:
        empty = nodes.limit(0).select(
            F.col("id"), F.lit(0.0).alias("betweenness"))
        return empty
    delta = levels[maxd].select("s", "v", "sigma", zero)
    acc = delta
    for lev in range(maxd - 1, 0, -1):
        succ = (delta
                .select("s", F.col("v").alias("w"),
                        F.col("sigma").alias("sigma_w"),
                        F.col("delta").alias("delta_w"))
                .join(e.select(F.col("u").alias("v"),
                               F.col("v").alias("w")), "w")
                .select("s", "v", "sigma_w", "delta_w"))
        delta = (levels[lev].join(succ, ["s", "v"], "left")
                 .groupBy("s", "v", "sigma")
                 .agg(F.coalesce(
                     F.sum(F.col("sigma") / F.col("sigma_w")
                           * (F.lit(1.0) + F.col("delta_w"))),
                     F.lit(0.0)).alias("delta"))
                 .select("s", "v", "sigma", F.col("delta"))
                 .localCheckpoint())
        acc = acc.union(delta)

    nn = nodes.agg(F.count(F.lit(1)).cast("long").alias("_n"))
    kk = (src.join(nodes, "id")
          .agg(F.count(F.lit(1)).cast("long").alias("_k")))
    sd = acc.groupBy("v").agg(F.sum("delta").alias("_sd"))
    out = sd.crossJoin(F.broadcast(nn)).crossJoin(F.broadcast(kk))
    score = F.col("_sd") * F.col("_n") / (F.col("_k") * F.lit(2.0))
    if normalized:
        score = (F.col("_sd") * F.col("_n")
                 / (F.col("_k") * (F.col("_n") - 1.0)
                    * (F.col("_n") - 2.0)))
    return out.select(F.col("v").alias("id"),
                      score.alias("betweenness"))


def maximal_matching(edges: DataFrame, salt: str = "v1",
                     max_iters: int = 20) -> DataFrame:
    """Deterministic Luby-style MAXIMAL MATCHING -> (u, v, round): a
    set of vertex-disjoint edges no further edge can join — the edge
    twin of :func:`maximal_independent_set` and the pairing step of
    multilevel graph coarsening (match -> contract -> partition the
    small graph -> project back, the METIS scheme; see
    :func:`coarsen_graph`). Also the conflict-free pairing primitive
    (merge-candidate pairs where each record may merge at most once
    per pass).

    Each canonical edge gets the priority sha256('salt:u|v')||':u|v'
    (globally unique -> total order, a pure function of the edge set);
    per round, an edge whose priority beats every other ACTIVE edge at
    BOTH endpoints is selected — equivalently p == min over u's edges
    AND min over v's edges, since the order is total — and matched
    endpoints retire. Expected O(log n) rounds (Luby's analysis);
    ``max_iters`` raises loudly, never a silent partial matching.

    Scale per round: one explode to per-endpoint rows, one
    map-combinable min agg, one join back, two anti-joins — O(m)
    shuffled rows on node keys, lineage truncated per round."""
    und = _undirected(edges).localCheckpoint()
    pe = und.select(
        "u", "v",
        F.concat(F.sha2(F.concat(F.lit(f"{salt}:"), F.col("u"),
                                 F.lit("|"), F.col("v")), 256),
                 F.lit(":"), F.col("u"), F.lit("|"), F.col("v"))
        .alias("p")).localCheckpoint()
    picked = []
    for rnd in range(max_iters):
        if pe.isEmpty():
            if not picked:
                return und.select(
                    "u", "v", F.lit(0).alias("round")).filter(F.lit(False))
            out = picked[0]
            for df in picked[1:]:
                out = out.union(df)
            return out
        mn = (pe.select(F.col("u").alias("id"), "p")
              .union(pe.select(F.col("v").alias("id"), "p"))
              .groupBy("id").agg(F.min("p").alias("mp")))
        sel = (pe.join(mn.select(F.col("id").alias("u"),
                                 F.col("mp").alias("mu")), "u")
               .join(mn.select(F.col("id").alias("v"),
                               F.col("mp").alias("mv")), "v")
               .filter((F.col("p") == F.col("mu"))
                       & (F.col("p") == F.col("mv")))
               .select("u", "v").localCheckpoint())
        picked.append(sel.select("u", "v", F.lit(rnd).alias("round")))
        matched = (sel.select(F.col("u").alias("id"))
                   .union(sel.select(F.col("v").alias("id")))).distinct()
        pe = (pe.join(matched.select(F.col("id").alias("u")), "u",
                      "left_anti")
              .join(matched.select(F.col("id").alias("v")), "v",
                    "left_anti").localCheckpoint())
    # the loop's emptiness check runs at round ENTRY: a matching that
    # converges in exactly max_iters rounds exits the loop complete —
    # check once more before declaring failure
    if pe.isEmpty():
        out = picked[0]
        for df in picked[1:]:
            out = out.union(df)
        return out
    raise RuntimeError(
        f"maximal_matching did not retire all edges within {max_iters} "
        "rounds; raise max_iters")


def coarsen_graph(edges: DataFrame, matching: DataFrame | None = None,
                  salt: str = "v1",
                  weight_col: str | None = None
                  ) -> tuple[DataFrame, DataFrame]:
    """One multilevel-coarsening step: contract each matched pair into
    a supernode (the STRING-least endpoint — zero-pad numeric ids
    upstream if '10' < '9' matters) and return

      (coarse_edges(u, v, weight), node_map(id, super))

    where ``weight`` counts the distinct original canonical edges each
    coarse edge aggregates (edge weights of the next level — exactly
    what multilevel partitioners cut against) and ``node_map`` sends
    EVERY original node to its supernode (unmatched nodes map to
    themselves). Intra-pair edges vanish (they're the contraction).
    Repeating match+contract log(n) times shrinks any graph to one a
    single machine partitions exactly; projecting the small labels
    back through the chained node_maps is one broadcast join per
    level. Cost: the matching plus ONE groupBy over the edge set.

    ``weight_col``: input edges already carry weights (a previous
    coarsening level) — coarse weights SUM them instead of counting
    edges, so original adjacency propagates through repeated
    contractions (multilevel_partitions threads this)."""
    und = _undirected(edges, weight_col).localCheckpoint()
    if matching is None:
        matching = maximal_matching(und.select("u", "v"), salt=salt)
    sup = F.least(F.col("u"), F.col("v"))
    pair_map = (matching.select(F.col("u").alias("id"), sup.alias("super"))
                .union(matching.select(F.col("v").alias("id"),
                                       sup.alias("super"))))
    nodes = (und.select(F.col("u").alias("id"))
             .union(und.select(F.col("v").alias("id"))).distinct())
    node_map = (nodes.join(pair_map, "id", "left")
                .select("id", F.coalesce("super", F.col("id"))
                        .alias("super")))
    mu = node_map.select(F.col("id").alias("u"), F.col("super").alias("su"))
    mv = node_map.select(F.col("id").alias("v"), F.col("super").alias("sv"))
    # _undirected normalizes the weight column name to "w"
    keep = [] if weight_col is None else [F.col("w").alias("_w")]
    wexpr = (F.count(F.lit(1)).alias("weight") if weight_col is None
             else F.sum("_w").alias("weight"))
    coarse = (und.join(mu, "u").join(mv, "v")
              .filter(F.col("su") != F.col("sv"))
              .select(F.least("su", "sv").alias("u"),
                      F.greatest("su", "sv").alias("v"), *keep)
              .groupBy("u", "v").agg(wexpr))
    return coarse, node_map
