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


def resolve_pointer_chains(edges: DataFrame, src_col: str = "src",
                           dst_col: str = "dst",
                           max_iter: int = 20) -> DataFrame:
    """Resolve every chain of a FUNCTIONAL map to its terminal —
    URL-canonicalization over redirect edges (src 301-redirects to dst;
    the canonical page is wherever the chain ends), symlink flattening,
    merged-entity forwarding.

    Pointer doubling: each round composes the map with itself
    (ptr <- map[ptr] where defined), so a length-L chain resolves in
    ceil(log2 L) rounds — one equi-join per round, never a per-hop walk
    (a naive hop loop is O(L) shuffles; head-domain redirect chains on
    web crawls run dozens deep). Converged when no pointer is itself a
    source. Cycles (redirect loops — they exist on the real web) never
    resolve and raise loudly at ``max_iter`` rather than silently
    emitting a mid-cycle node.

    The functional-map precondition (one outgoing edge per source) is
    enforced by a LOAD-BEARING in-plan guard: the pointer value itself
    is a CASE over the per-source edge count, so a duplicated source
    with conflicting targets fails the job instead of resolving to a
    partition-order-dependent winner. Exact duplicate (src, dst) rows
    are collapsed first; self-redirects are terminals.

    Returns (src, resolved) for every source node."""
    m = (edges.select(F.col(src_col).cast("string").alias("node"),
                      F.col(dst_col).cast("string").alias("ptr"))
         .filter(F.col("node") != F.col("ptr"))
         .distinct())
    dup = m.groupBy("node").agg(F.count(F.lit(1)).alias("_n"))
    m = (m.join(dup, "node")
         .select("node",
                 F.when(F.col("_n") == 1, F.col("ptr"))
                 .otherwise(F.raise_error(F.concat(
                     F.lit("resolve_pointer_chains: source "),
                     F.col("node"),
                     F.lit(" has conflicting targets — not a "
                           "functional map")))).alias("ptr"))
         .localCheckpoint())
    srcs = m.select("node").localCheckpoint()
    for _ in range(max_iter):
        j = m.select(F.col("node").alias("jn"), F.col("ptr").alias("jp"))
        m = (m.join(j, m["ptr"] == j["jn"], "left")
             .select("node", F.coalesce("jp", "ptr").alias("ptr"))
             .localCheckpoint())
        unresolved = (m.join(srcs.select(F.col("node").alias("ptr")),
                             "ptr", "left_semi").count())
        if unresolved == 0:
            return m.select(F.col("node").alias("src"),
                            F.col("ptr").alias("resolved"))
    raise RuntimeError(
        f"resolve_pointer_chains: {unresolved} chains unresolved after "
        f"{max_iter} doubling rounds (chain length > 2^{max_iter} or a "
        "redirect cycle); break cycles upstream or raise max_iter")


def incremental_components(labels: DataFrame, new_edges: DataFrame,
                           max_iter: int = 20,
                           changed_only: bool = False) -> DataFrame:
    """O(delta) maintenance of a committed connected-components
    assignment — the canonicalization resume path: a new crawl batch
    yields new entity-link edges; re-running ``connected_components``
    over the WHOLE accumulated edge set per batch is an O(corpus)
    fixpoint at every ingest, the classic incremental-pipeline
    scale-killer. Merging into an existing assignment is O(delta):

    1. restrict the committed ``labels(id, component)`` to the delta's
       node set — the ONLY touch of the big table, a broadcast SEMI
       join (labels streams once, narrow, no shuffle of labels);
    2. project delta edges onto components (a node absent from labels
       is its own fresh singleton component);
    3. run the alternating-star fixpoint on the QUOTIENT graph — at
       most 2·|delta| nodes, never the corpus;
    4. broadcast the resulting rep->rep remap back over ``labels``
       (again narrow) and attach the new nodes.

    Correctness hinges on the representative invariant the base
    operator guarantees: ``component`` is the MINIMUM id of its
    cluster, so every member id >= its rep and the min over merged
    reps (and fresh singleton ids, which enter the quotient as
    themselves) IS the min over the merged clusters' members — the
    incremental assignment is bit-identical to a full recompute over
    base ∪ delta edges (parity-tested; the driver oracle recomputes
    the full transitive closure).

    ``changed_only=True`` returns just the rows a MERGE would write:
    existing ids whose component changed plus the new ids. Delta
    self-loops and edges internal to one committed component quotient
    to nothing and produce zero changed rows.
    """
    raw = new_edges.select(F.col("u").cast("string"),
                           F.col("v").cast("string"))
    e = raw.filter(F.col("u") != F.col("v")).distinct()
    # delta node set from the UNFILTERED edges: a brand-new node whose
    # only delta evidence is a self-loop still needs a component row
    dnodes = (raw.select(F.col("u").alias("id"))
              .union(raw.select(F.col("v").alias("id"))).distinct()
              .localCheckpoint())
    # the one pass over the big table: broadcast the delta node set
    touched = (labels.join(F.broadcast(dnodes), "id", "left_semi")
               .localCheckpoint())
    cu = touched.select(F.col("id").alias("u"), F.col("component").alias("cu"))
    cv = touched.select(F.col("id").alias("v"), F.col("component").alias("cv"))
    quot_edges = (e.join(F.broadcast(cu), "u", "left")
                  .join(F.broadcast(cv), "v", "left")
                  .select(F.coalesce("cu", "u").alias("u"),
                          F.coalesce("cv", "v").alias("v"))
                  .filter(F.col("u") != F.col("v")))
    if quot_edges.isEmpty():
        # no merges — but fresh nodes (self-loop-only deltas) still get
        # their singleton rows; silently returning labels unchanged
        # would leave them with no component at all
        fresh0 = (dnodes.join(F.broadcast(touched.select("id")),
                              "id", "left_anti")
                  .select("id", F.col("id").alias("component")))
        if changed_only:
            return fresh0
        return labels.unionByName(fresh0)
    # remap: old rep (or fresh singleton id) -> merged rep
    remap = (connected_components(quot_edges, max_iter)
             .select(F.col("id").alias("component"),
                     F.col("component").alias("new_component"))
             .localCheckpoint())
    new_ids = dnodes.join(F.broadcast(touched.select("id")),
                          "id", "left_anti")
    fresh = (new_ids.join(F.broadcast(remap),
                          new_ids["id"] == remap["component"], "left")
             .select(new_ids["id"],
                     F.coalesce("new_component", new_ids["id"])
                     .alias("component")))
    updated = (labels.join(F.broadcast(remap), "component", "left")
               .select("id", F.coalesce("new_component", "component")
                       .alias("component"),
                       (F.col("new_component").isNotNull()
                        & (F.col("new_component") != F.col("component")))
                       .alias("_chg")))
    if changed_only:
        updated = updated.filter(F.col("_chg"))
    return updated.drop("_chg").unionByName(fresh)
