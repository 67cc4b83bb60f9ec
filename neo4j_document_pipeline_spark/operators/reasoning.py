"""Ontology reasoning: semi-naive transitive closure + RDFS-style
type inference.

A knowledge graph built from web pages (this pipeline's output —
operators/graph.py nodes/edges) carries hierarchy edges: subClassOf,
partOf, locatedIn, redirect chains. Query-time reasoning needs the
TRANSITIVE CLOSURE of those relations — RDFS entailment rules rdfs9/
rdfs11 (subClassOf transitivity and type propagation) are the public
spec. The reference has no reasoning layer at all (Cypher queries at
fixed hop counts, graphutil.py); this implements the standard
datalog semi-naive evaluation as a DataFrame loop:

    delta_0   = edges
    delta_i+1 = (delta_i JOIN edges) ANTI-JOIN closure_i   -- new pairs
    closure   = union of all deltas

Each round shuffles only the FRONTIER (delta) against the base
edges — one hash equi-join + one anti-join per round, never
closure×closure. At 100 TB the closure of a shallow ontology (class
hierarchies are ~10-20 deep) converges in depth rounds over an edge
table that is tiny next to the instance data; the expensive
type-propagation join (instances × closure) is a single broadcast
hash join afterwards.

Termination is checked by counting the frontier per round (one
bounded driver action on an ever-shrinking frame — the same honesty
contract as k_core / maximal_independent_set: ``max_iters`` raises
loudly instead of silently truncating paths). Cycles are safe: a
pair already in the closure anti-joins away, so the frontier on a
cycle empties once every reachable pair is known (dist records the
SHORTEST derivation).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def transitive_closure(edges: DataFrame, *,
                       src_col: str = "src", dst_col: str = "dst",
                       max_iters: int = 20) -> DataFrame:
    """All reachable (src, dst) pairs of the relation, with ``dist``
    = minimum number of base edges on a derivation path (>= 1;
    self-pairs only appear if the graph contains a cycle through the
    node).

    Semi-naive: round i joins the length-i frontier with the base
    edges and anti-joins pairs already derived, so work per round is
    O(|frontier| * avg-degree) and the loop ends when no new pair
    exists. Raises if ``max_iters`` rounds leave a non-empty
    frontier (a silent cap would return an incomplete closure —
    wrong answers, loudly refused).
    """
    base = (edges.select(F.col(src_col).alias("src"),
                         F.col(dst_col).alias("dst"))
            .filter(F.col("src").isNotNull() & F.col("dst").isNotNull())
            .distinct())
    sc = base.sparkSession.sparkContext
    closure = base.withColumn("dist", F.lit(1)).localCheckpoint(eager=True)
    delta = closure
    for i in range(2, max_iters + 2):
        hop = (delta.select("src", F.col("dst").alias("_mid"))
               .join(base.select(F.col("src").alias("_mid"), "dst"),
                     "_mid")
               .select("src", "dst")
               .distinct()
               .withColumn("dist", F.lit(i)))
        new = (hop.join(closure.select("src", "dst"), ["src", "dst"],
                        "left_anti")
               .localCheckpoint(eager=True))
        if new.rdd.isEmpty():
            return closure
        if i == max_iters + 1:
            raise RuntimeError(
                f"transitive_closure did not converge in {max_iters} "
                f"rounds; raise max_iters (paths longer than the cap "
                f"exist)")
        closure = closure.union(new).localCheckpoint(eager=True)
        delta = new
        sc.setJobDescription(f"transitive_closure round {i}")
    return closure


def infer_types(instances: DataFrame, subclass_edges: DataFrame, *,
                entity_col: str = "entity", type_col: str = "type",
                src_col: str = "src", dst_col: str = "dst",
                max_iters: int = 20) -> DataFrame:
    """RDFS rule rdfs9: entity typed C is also typed every superclass
    of C. Returns (entity, type, direct) — ``direct`` true for the
    asserted type rows, false for inferred ancestors; one row per
    distinct (entity, type).

    The subclass closure (small — ontology-sized) broadcasts against
    the instance table (huge), so inference is a single broadcast
    hash join over the instance data.
    """
    closure = transitive_closure(subclass_edges, src_col=src_col,
                                 dst_col=dst_col, max_iters=max_iters)
    asserted = (instances.select(F.col(entity_col).alias("entity"),
                                 F.col(type_col).alias("type"))
                .filter(F.col("entity").isNotNull()
                        & F.col("type").isNotNull())
                .distinct())
    inferred = (asserted.join(
        F.broadcast(closure.select(F.col("src").alias("type"),
                                   F.col("dst").alias("_super"))),
        "type")
        .select("entity", F.col("_super").alias("type")))
    return (asserted.withColumn("direct", F.lit(True))
            .unionByName(
                inferred.join(asserted, ["entity", "type"], "left_anti")
                .distinct()
                .withColumn("direct", F.lit(False))))


def topological_levels(edges: DataFrame, *,
                       src_col: str = "src", dst_col: str = "dst",
                       max_iters: int = 50) -> DataFrame:
    """Longest-path DAG layering -> (node, level): level 0 = nodes with
    no incoming edge, level k = nodes whose LAST prerequisite sits at
    level k-1 (i.e. the longest prerequisite chain has k edges). This
    is the layer assignment for anything dependency-shaped a KG
    carries — class hierarchies, partOf rollups, pipeline/stage DAGs —
    and the level count IS the critical-path depth.

    Level-synchronous Kahn peeling: each round keeps only the edges
    whose source is still unsettled (one anti-join), then settles the
    unsettled nodes with no remaining incoming edge (one anti-join).
    A node settles exactly when its slowest predecessor settled the
    round before, so the assigned round index is the longest-path
    level. Work per round is two hash anti-joins over the shrinking
    remainder; rounds = DAG depth (ontologies: 10-20).

    CYCLE DETECTION is the convergence check: a round that settles
    nothing while nodes remain means every remaining node has an
    unsettled predecessor — only possible on a cycle — and raises
    loudly with the count of trapped nodes (a silent partial layering
    would misreport depths downstream of the cycle). ``max_iters``
    bounds depth the same way.
    """
    base = (edges.select(F.col(src_col).alias("src"),
                         F.col(dst_col).alias("dst"))
            .filter(F.col("src").isNotNull() & F.col("dst").isNotNull())
            .distinct().localCheckpoint(eager=True))
    nodes = (base.select(F.col("src").alias("node"))
             .union(base.select(F.col("dst").alias("node")))
             .distinct())
    sc = base.sparkSession.sparkContext
    settled = None
    unsettled = nodes.localCheckpoint(eager=True)
    remaining = base
    for lvl in range(max_iters + 1):
        frontier = (unsettled.join(
            remaining.select(F.col("dst").alias("node")).distinct(),
            "node", "left_anti")
            .withColumn("level", F.lit(lvl))
            .localCheckpoint(eager=True))
        if frontier.rdd.isEmpty():
            n_left = unsettled.count()
            if n_left:
                raise RuntimeError(
                    f"topological_levels: {n_left} nodes are on or "
                    f"behind a cycle (no progress at level {lvl}); "
                    f"not a DAG")
            return settled if settled is not None else frontier.limit(0)
        settled = (frontier if settled is None
                   else settled.union(frontier))
        unsettled = (unsettled.join(frontier.select("node"), "node",
                                    "left_anti")
                     .localCheckpoint(eager=True))
        if unsettled.rdd.isEmpty():
            return settled
        remaining = (remaining.join(
            frontier.select(F.col("node").alias("src")), "src",
            "left_anti").localCheckpoint(eager=True))
        sc.setJobDescription(f"topological_levels level {lvl}")
    raise RuntimeError(
        f"topological_levels did not finish in {max_iters} rounds; "
        f"raise max_iters (the DAG is deeper than the cap)")
