"""Admin surface — library-function analogues of the reference's admin
endpoints (/root/reference/main.py:590-799, 66-155).

All pure DataFrame ops over the GraphStore tables; each is small enough
to be SQL-expressible, and mirrors the endpoint's response shape.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def graph_stats(store) -> dict:
    """/graph/stats (main.py:590-654): totals + per-label/per-type counts
    + top-10 most-connected entities."""
    nodes = store.read("nodes")
    edges = store.read("edges")
    by_label = {r["label"]: r["count"]
                for r in nodes.groupBy("label").count().collect()}
    by_rel = {r["rel_type"]: r["count"]
              for r in edges.groupBy("rel_type").count().collect()}
    deg = (
        edges.select(F.col("src_id").alias("entity_id"))
        .union(edges.select(F.col("dst_id").alias("entity_id")))
        .groupBy("entity_id").count()
        .join(nodes.select("entity_id", "label", "name"), "entity_id")
        .orderBy(F.col("count").desc(), "name")
        .limit(10)
    )
    return {
        "total_nodes": sum(by_label.values()),
        "total_relationships": sum(by_rel.values()),
        "nodes_by_label": dict(sorted(by_label.items())),
        "relationships_by_type": dict(sorted(by_rel.items())),
        "most_connected": [
            {"name": r["name"], "label": r["label"], "degree": r["count"]}
            for r in deg.collect()
        ],
    }


def degree_histogram(store) -> dict:
    """Log2-bucketed degree distribution + skew quantiles of the KG —
    beyond-reference: the diagnostic that says whether joins/aggs over
    this graph need the salting / AQE-skew paths (`operators/skew.py`).
    A webtext entity graph is power-law; this quantifies HOW power-law
    (p99/median ratio, max-degree hub) before a 100-TB run commits to a
    partitioning. Two jobs over the O(V) degree table: one scalar agg
    (quantiles via percentile_approx — exact quantiles would sort the
    world for a diagnostic), one tiny hash agg for the buckets."""
    edges = store.read("edges")
    deg = (
        edges.select(F.col("src_id").alias("entity_id"))
        .union(edges.select(F.col("dst_id").alias("entity_id")))
        .groupBy("entity_id").agg(F.count("*").alias("d"))
    ).localCheckpoint()  # two consumers, one shuffle
    row = deg.agg(
        F.count("*").alias("n"),
        F.max("d").alias("dmax"),
        F.avg("d").alias("dmean"),
        F.percentile_approx("d", [0.5, 0.9, 0.99]).alias("q"),
    ).first()
    if row["n"] == 0:
        return {"nodes_with_edges": 0, "max_degree": 0,
                "mean_degree": 0.0, "p50": 0, "p90": 0, "p99": 0,
                "histogram": {}}
    hist = (deg.groupBy(F.floor(F.log2("d")).cast("int").alias("b"))
            .count().collect())
    return {
        "nodes_with_edges": row["n"],
        "max_degree": row["dmax"],
        "mean_degree": round(float(row["dmean"]), 3),
        "p50": row["q"][0], "p90": row["q"][1], "p99": row["q"][2],
        # bucket key = the bucket's lower bound: degree in [2^b, 2^(b+1))
        "histogram": {str(2 ** r["b"]): r["count"]
                      for r in sorted(hist, key=lambda r: r["b"])},
    }


def graph_schema(store) -> dict:
    """/graph/schema (main.py:656-726): observed (src_label, rel_type,
    dst_label) patterns with counts."""
    nodes = store.read("nodes").select("entity_id", "label")
    edges = store.read("edges")
    pat = (
        edges.join(nodes.withColumnRenamed("label", "src_label")
                   .withColumnRenamed("entity_id", "src_id"), "src_id")
        .join(nodes.withColumnRenamed("label", "dst_label")
              .withColumnRenamed("entity_id", "dst_id"), "dst_id")
        .groupBy("src_label", "rel_type", "dst_label").count()
        .orderBy(F.col("count").desc(), "src_label", "rel_type")
    )
    return {
        "patterns": [
            {"from": r["src_label"], "rel": r["rel_type"],
             "to": r["dst_label"], "count": r["count"]}
            for r in pat.collect()
        ]
    }


def graph_search(store, value: str, label: str | None = None,
                 prop: str = "name", limit: int = 25) -> DataFrame:
    """/graph/search (main.py:728-799): case-insensitive contains on a
    property, optional label filter, LIMIT."""
    nodes = store.read("nodes")
    df = nodes
    if label:
        df = df.filter(F.col("label") == label)
    df = df.filter(F.lower(F.col(prop)).contains(value.lower()))
    return (df.select("entity_id", "label", "name", "start", "end")
            .orderBy("name", "entity_id").limit(limit))


def list_documents(store, limit: int = 100) -> DataFrame:
    """/documents (main.py:72-107): docs by recency with entity counts."""
    docs = store.read("documents_final")
    mentions = store.read("mentions")
    counts = mentions.groupBy("doc_id").agg(
        F.countDistinct("entity_id").alias("n_entities"))
    return (
        docs.join(counts, "doc_id", "left")
        .withColumn("n_entities", F.coalesce("n_entities", F.lit(0)))
        .select("doc_id", "url", "title", "n_chunks", "n_entities",
                "updated_at")
        .orderBy(F.col("updated_at").desc(), "doc_id")
        .limit(limit)
    )


def queue_status(max_concurrent: int | None = None) -> dict:
    """/queue_status (main.py:55-64): live request-slot accounting for
    the graphrag serving path. ``queued_requests`` is always 0 here —
    graphrag_many blocks callers at the executor instead of queueing.
    The default bound comes from the single shared constant
    (retrieval.MAX_CONCURRENT_QUERIES), so the report can't diverge from
    graphrag_many's default."""
    from neo4j_document_pipeline_spark.operators.retrieval import (
        MAX_CONCURRENT_QUERIES, active_query_count)
    if max_concurrent is None:
        max_concurrent = MAX_CONCURRENT_QUERIES
    active = active_query_count()
    return {
        "success": True,
        "active_requests": active,
        "queued_requests": 0,
        "max_concurrent": max_concurrent,
        "available_slots": max(0, max_concurrent - active),
    }


def healthz(store) -> dict:
    """/healthz (main.py:109-116): a cheap liveness probe — node count."""
    try:
        n = store.read("nodes").count()
        return {"status": "ok", "nodes": n}
    except Exception as e:  # pragma: no cover
        return {"status": "error", "error": str(e)}


def drop_all(store) -> dict:
    """/drop-all (main.py:118-155): O(metadata) truncate of every table —
    no 100k-row batching needed (that exists only for Neo4j txn memory,
    clean.py:53)."""
    store.drop_all()
    return {"status": "dropped"}


def queue_stats(store, spark=None) -> dict:
    """/queue_stats analogue (main.py:497-565). The reference inspects the
    Celery queue (active/reserved/scheduled tasks per worker); here the
    'queue' is the Spark scheduler plus the store's committed stage
    manifests — active jobs and streaming queries stand in for active
    tasks, committed stage manifests for completed ones."""
    import os

    spark = spark or store.spark
    st = spark.sparkContext.statusTracker()
    active_jobs = list(st.getActiveJobsIds())
    active_stages = list(st.getActiveStageIds())
    streams = [{
        "id": q.id,
        "name": q.name,
        "is_active": q.isActive,
        "last_progress": (q.lastProgress or {}).get("batchId")
        if q.lastProgress else None,
    } for q in spark.streams.active]
    tables = []
    root = store.root
    if os.path.isdir(root):
        for name in sorted(os.listdir(root)):
            m = store.manifest(name)
            if m:
                tables.append({
                    "table": name, "stage": m.get("stage"),
                    "rows": m.get("rows"), "n_files": m.get("n_files"),
                    "committed_at_unix": m.get("committed_at_unix"),
                    "version": m.get("version"),
                })
    return {
        "success": True,
        "message": "Queue statistics retrieved successfully",
        "stats": {
            "active_tasks": len(active_jobs),
            "active_stages": len(active_stages),
            "active_streams": len(streams),
            "total_in_progress": len(active_jobs) + len(streams),
            "worker_count": spark.sparkContext.defaultParallelism,
            "streams": streams,
            "committed_stages": tables,
        },
    }


def ingest_status(store, job_id: str | None = None) -> dict:
    """/ingest/status analogue (main.py:566-588). A 'job' is a pipeline
    stage / store table; its state comes from the committed manifest:
    SUCCESS once a snapshot is committed (with the manifest's metrics as
    the result), PENDING when the table is unknown or uncommitted."""
    if not job_id:
        return {"success": False,
                "message": "Missing value: job_id parameter is required."}
    m = store.manifest(job_id)
    state = "SUCCESS" if m and store.exists(job_id) else "PENDING"
    return {
        "success": True,
        "message": "Job status retrieved",
        "job_id": job_id,
        "state": state,
        # result only in SUCCESS: a manifest whose snapshot dir is gone
        # (crash mid-rewrite / manual cleanup) must not surface stale
        # metrics under a PENDING state
        "result": {
            "rows": m.get("rows"),
            "version": m.get("version"),
            "committed_at_unix": m.get("committed_at_unix"),
            "metrics": m.get("metrics"),
            "partitions": len(m.get("partitions") or []),
        } if state == "SUCCESS" else None,
    }


def debug_search(store, question: str = "test", k: int = 5) -> dict:
    """/debug-search analogue (main.py:428-477): exercise each retrieval
    component separately — question embedding, per-channel hits, hybrid
    blend — plus the store's label inventory and 'index' state (the
    committed node_tokens inverted index standing in for Neo4j's SHOW
    INDEXES)."""
    from neo4j_document_pipeline_spark.config import DEFAULT_CONFIG
    from neo4j_document_pipeline_spark.functions.featurizer import embed_text
    from neo4j_document_pipeline_spark.operators.retrieval import (
        hybrid_candidates, keyword_channel, serves_canonical,
        vector_channel)

    cfg = DEFAULT_CONFIG
    # probe the SAME graph the live query path serves (canonical when
    # fresh) — a debug surface on a different table set would send
    # whoever is debugging in the wrong direction
    suffix = "_canonical" if serves_canonical(store) else ""
    nodes = store.read(f"nodes{suffix}")
    nodes_man = store.manifest(f"nodes{suffix}") or {}
    n_nodes = nodes_man.get("rows")
    qvec = embed_text(question, dim=cfg.embedding_dim,
                      seed=cfg.featurizer_seed).tolist()
    label_counts = {r["label"]: r["count"]
                    for r in nodes.groupBy("label").count().collect()}
    # same freshness rule as graphrag: a stale index (src_nodes_version
    # != live nodes version) is bypassed, so this debug surface probes
    # exactly the channels a real query would use
    postings, index_stale = None, False
    indexes = []
    tok_table = f"node_tokens{suffix}"
    if store.exists(tok_table):
        m = store.manifest(tok_table) or {}
        src_v = (m.get("metrics") or {}).get("src_nodes_version")
        index_stale = src_v != nodes_man.get("version")
        if not index_stale:
            postings = store.read(tok_table)
        indexes.append({
            "name": tok_table, "type": "FULLTEXT-analogue",
            "rows": m.get("rows"), "version": m.get("version"),
            "src_nodes_version": src_v,
            "stale": index_stale,
        })
    vec_hits = vector_channel(nodes, qvec, None, k).collect()
    kw_hits = keyword_channel(nodes, question, k, cfg=cfg,
                              n_nodes=n_nodes, postings=postings).collect()
    hybrid = hybrid_candidates(nodes, question, qvec,
                               k_vec=k, k_kw=k, cfg=cfg,
                               n_nodes=n_nodes, postings=postings).collect()
    return {
        "success": True,
        "message": "Debug search completed",
        "question": question,
        "canonical_graph": bool(suffix),
        "existing_labels": sorted(label_counts),
        "existing_indexes": indexes,
        "label_counts": label_counts,
        "vector_hits": [r.asDict() for r in vec_hits],
        "keyword_hits": [r.asDict() for r in kw_hits],
        "hybrid_results_count": len(hybrid),
    }


def table_diff(old: DataFrame, new: DataFrame, keys: list[str],
               compare_cols: list[str]) -> DataFrame:
    """Change feed between two snapshots of a keyed table: one row per
    key that was added, removed, or changed — the diff a KG store emits
    between versions (sources/store.py keeps snapshot history; this is
    the operator that answers "what changed between v3 and v7" without
    shipping either snapshot).

    One full-outer equi-join on the key (co-partitioned on both sides —
    at scale, bucket both snapshots on the key and the join is
    shuffle-free), null-safe per-column comparison (<=>), and a
    ``changed_cols`` array listing exactly which compare columns
    differ, in ``compare_cols`` order. Unchanged rows are dropped —
    output size is the churn, not the table.
    """
    if not keys or not compare_cols:
        raise ValueError("keys and compare_cols must be non-empty")
    o = old.select(*keys, *[F.col(c).alias(f"_o_{c}")
                            for c in compare_cols])
    n = new.select(*keys, *[F.col(c).alias(f"_n_{c}")
                            for c in compare_cols])
    # presence flags: an all-null compare row can't distinguish sides,
    # so flag on a literal carried from each side
    o = o.withColumn("_in_old", F.lit(True))
    n = n.withColumn("_in_new", F.lit(True))
    j = o.join(n, keys, "full_outer")
    diffs = F.filter(
        F.array(*[F.when(~F.col(f"_o_{c}").eqNullSafe(F.col(f"_n_{c}")),
                         F.lit(c)) for c in compare_cols]),
        lambda x: x.isNotNull())
    change = (F.when(F.col("_in_old").isNull(), "added")
              .when(F.col("_in_new").isNull(), "removed")
              .otherwise("changed"))
    return (j.withColumn("change", change)
            .withColumn("changed_cols",
                        F.when(F.col("change") == "changed", diffs)
                        .otherwise(F.array().cast("array<string>")))
            .filter((F.col("change") != "changed")
                    | (F.size("changed_cols") > 0))
            .select(*keys, "change", "changed_cols"))


def table_changes(old: DataFrame, new: DataFrame, keys: list[str],
                  value_cols: list[str]) -> DataFrame:
    """Value-carrying CDC feed between two snapshots -> (keys, op,
    value_cols): ``op = 'upsert'`` rows carry the NEW values for added
    and changed keys, ``op = 'delete'`` rows carry null values for
    removed keys, unchanged keys are absent — the churn-sized stream a
    downstream consumer (a serving store, a replica, an index) needs to
    catch up from one snapshot to the next without reading either.
    ``apply_changes`` is the inverse: old + feed == new, row for row
    (the sufficiency law the roundtrip oracle pins).

    Same shape as ``table_diff``: ONE full-outer equi-join on the key
    (bucket both snapshots and it is shuffle-free), null-safe value
    comparison; output size is the churn.
    """
    if not keys or not value_cols:
        raise ValueError("keys and value_cols must be non-empty")
    o = old.select(*keys, *[F.col(c).alias(f"_o_{c}")
                            for c in value_cols])
    n = new.select(*keys, *[F.col(c).alias(f"_n_{c}")
                            for c in value_cols])
    o = o.withColumn("_in_old", F.lit(True))
    n = n.withColumn("_in_new", F.lit(True))
    j = o.join(n, keys, "full_outer")
    same = None
    for c in value_cols:
        eq = F.col(f"_o_{c}").eqNullSafe(F.col(f"_n_{c}"))
        same = eq if same is None else (same & eq)
    op = (F.when(F.col("_in_new").isNull(), "delete")
          .otherwise(F.lit("upsert")))
    return (j.filter(F.col("_in_old").isNull()
                     | F.col("_in_new").isNull() | ~same)
            .select(*keys, op.alias("op"),
                    *[F.col(f"_n_{c}").alias(c) for c in value_cols]))


def apply_changes(base: DataFrame, changes: DataFrame,
                  keys: list[str], value_cols: list[str]) -> DataFrame:
    """Apply a ``table_changes`` feed to the snapshot it was diffed
    FROM -> the target snapshot (keys + value_cols, exactly): keys in
    the feed replace (upsert) or drop (delete) the base row; untouched
    base rows pass through. One anti-join + one union — the cheap
    catch-up a replica runs per feed batch, and the MERGE INTO
    analogue on plain DataFrames (sources/store.py's MERGE does this
    against committed tables; this form works on any two frames).
    """
    if not keys or not value_cols:
        raise ValueError("keys and value_cols must be non-empty")
    touched = changes.select(*keys)
    kept = (base.join(touched, keys, "left_anti")
            .select(*keys, *value_cols))
    ups = (changes.filter(F.col("op") == "upsert")
           .select(*keys, *value_cols))
    return kept.unionByName(ups)
