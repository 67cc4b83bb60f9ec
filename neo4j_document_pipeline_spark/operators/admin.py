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
