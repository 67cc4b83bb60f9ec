"""Graph materialization: triples_raw -> nodes / edges / mentions.

Set-oriented re-expression of the reference's batched Cypher MERGE
statements (/root/reference/ingestMD.py:327-646). Entity identity is the
Neo4j MERGE key (label, name) (ingestMD.py:505,509) as a deterministic
surrogate ``entity_id = sha2(label || ':' || name, 256)``.

Edge identity:
- normal:       (src_id, rel_type, dst_id)            ingestMD.py:513
- timeline:     (src_id, rel_type, dst_id) — the reference CREATEs
                duplicates via apoc.create.relationship (ingestMD.py:570);
                we merge-on-key instead (documented deviation, SURVEY §1.3)
- distribution: (src_id, rel_type, term, dst_id)      ingestMD.py:614

Edge properties (ingestMD.py:513-547):
- sources: doc_id set, append-if-absent -> ``collect_set`` + array_sort
- source_text_full: last-write-wins -> max_by (doc_id, chunk_idx) rank
- count (distribution): last-write-wins
- embedding: deterministic featurizer of the reference's embedding keys
  "{Type}:{name}" (nodes) / "{s} {p} {o}" (rels) (ingestMD.py:252-265);
  distribution rel text uses the REL LABEL not the raw predicate
  (ingestMD.py:448).

Scale: nodes/edges shuffles hash on sha256 ids (uniform); celebrity
entities only skew the edge GROUP BY — partial aggregation (collect_set is
map-side combinable) plus AQE skew handling covers it. Embedding compute is
deduplicated by key first (the reference's _emb_cache, ingestMD.py:223).
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from neo4j_document_pipeline_spark.config import DEFAULT_CONFIG, PipelineConfig

NODES_SCHEMA = (
    "entity_id string, label string, name string, embedding array<float>, "
    "start string, end string"
)
EDGES_SCHEMA = (
    "src_id string, dst_id string, rel_type string, term string, count int, "
    "embedding array<float>, sources array<string>, source_text_full string, "
    "created_at timestamp, updated_at timestamp"
)


def _embed_map_in_pandas(df: DataFrame, text_col: str, out_schema: str,
                         cfg: PipelineConfig) -> DataFrame:
    """Attach a deterministic embedding column for each row's text key."""
    dim, seed = cfg.embedding_dim, cfg.featurizer_seed

    def embedder(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from neo4j_document_pipeline_spark.functions.featurizer import embed_texts
        for pdf in batches:
            mat = embed_texts(pdf[text_col].tolist(), dim=dim, seed=seed)
            pdf = pdf.copy()
            pdf["embedding"] = [row.astype("float32").tolist() for row in mat]
            yield pdf

    return df.mapInPandas(embedder, schema=out_schema)


def build_embeddings_cache(triples: DataFrame,
                           cfg: PipelineConfig = DEFAULT_CONFIG) -> DataFrame:
    """Distinct embedding-text keys -> vectors; the set-wise analogue of the
    reference's _emb_cache (ingestMD.py:223,267-284). Keys:
      node "{label}:{name}", relation "{s} {p} {o}" (ingestMD.py:252-265).
    """
    t = _with_node_names(triples)
    sub_keys = t.select(F.concat_ws(":", "subject_type", "subject").alias("key"))
    obj_keys = t.select(F.concat_ws(":", "obj_label", "obj_name").alias("key"))
    rel_keys = t.select(_rel_text_col().alias("key"))
    keys = sub_keys.union(obj_keys).union(rel_keys).distinct()
    return _embed_map_in_pandas(
        keys, "key", "key string, embedding array<float>", cfg
    )


def _with_node_names(triples: DataFrame) -> DataFrame:
    """Add object-node (label, name) columns per object_kind dispatch.
    No-op when chunks_to_triples already materialized them (the normal
    path) — kept for callers feeding hand-built triple frames."""
    if "obj_label" in triples.columns:
        return triples
    return (
        triples
        .withColumn(
            "obj_label",
            F.when(F.col("object_kind") == "timeline", F.lit("Time_Period"))
            .when(F.col("object_kind") == "distribution", F.lit("Pillar"))
            .otherwise(F.col("object_type")),
        )
        .withColumn(
            "obj_name",
            F.when(F.col("object_kind") == "distribution", F.col("pillar"))
            .otherwise(F.col("object")),
        )
    )


def _with_ids(t: DataFrame) -> DataFrame:
    """Attach src_id/dst_id if not already materialized upstream."""
    if "src_id" in t.columns:
        return t
    return (
        t.withColumn("src_id", F.sha2(F.concat_ws(":", "subject_type", "subject"), 256))
        .withColumn("dst_id", F.sha2(F.concat_ws(":", "obj_label", "obj_name"), 256))
    )


def _rel_text_col():
    """Relation embedding text (ingestMD.py:379,405,448,474)."""
    return F.when(
        F.col("object_kind") == "distribution",
        F.concat_ws(" ", "subject", F.lit("HAS_INITIATIVE_COUNT"), "pillar"),
    ).otherwise(F.concat_ws(" ", "subject", "predicate", "obj_name"))


def build_nodes(triples: DataFrame, embeddings: DataFrame,
                cfg: PipelineConfig = DEFAULT_CONFIG) -> DataFrame:
    """Distinct entities from subject + object positions, with embeddings.

    Time_Period keeps (start, end) props (ingestMD.py:565-568); everything
    else has null start/end.
    """
    t = _with_node_names(triples)
    subs = t.select(
        F.col("subject_type").alias("label"),
        F.col("subject").alias("name"),
        F.lit(None).cast("string").alias("start"),
        F.lit(None).cast("string").alias("end"),
    )
    objs = t.select(
        F.col("obj_label").alias("label"),
        F.col("obj_name").alias("name"),
        F.when(F.col("object_kind") == "timeline", F.col("start"))
        .otherwise(F.lit(None)).cast("string").alias("start"),
        F.when(F.col("object_kind") == "timeline", F.col("end"))
        .otherwise(F.lit(None)).cast("string").alias("end"),
    )
    nodes = (
        subs.unionByName(objs)
        .filter(F.col("name").isNotNull() & (F.col("name") != ""))
        .groupBy("label", "name")
        .agg(F.max("start").alias("start"), F.max("end").alias("end"))
        .withColumn("entity_id", F.sha2(F.concat_ws(":", "label", "name"), 256))
        .withColumn("key", F.concat_ws(":", "label", "name"))
    )
    return (
        nodes.join(embeddings, "key", "left")
        .select("entity_id", "label", "name", "embedding", "start", "end")
    )


def build_edges(triples: DataFrame, embeddings: DataFrame,
                cfg: PipelineConfig = DEFAULT_CONFIG,
                chunks: DataFrame | None = None) -> DataFrame:
    """Aggregate triples into merged edges with source accumulation.

    ``chunks`` (chunk_id, text) supplies ``source_text_full`` for the
    last-written chunk per edge (rel.source_text_full semantics,
    ingestMD.py:543-547): the argmax carries only the winning chunk_id, so
    chunk TEXT is joined for #edges rows — never shuffled per triple.
    Clamped to cfg.src_txt_clamp (documented deviation: the reference
    stores the full chunk on timeline/distribution paths, ingestMD.py:
    419,462; full text stays recoverable via chunk_id)."""
    t = (
        _with_ids(_with_node_names(triples))
        .withColumn("rel_text", _rel_text_col())
        # distribution edges carry term in the identity key; others term=null
        .withColumn(
            "term_key",
            F.when(F.col("object_kind") == "distribution", F.col("term"))
            .otherwise(F.lit(None).cast("string")),
        )
    )
    # Deterministic last-write-wins via argmax struct: max(struct(order
    # cols, payload)) is MAP-SIDE COMBINABLE (partial aggregation), unlike
    # a window row_number — the shuffle carries at most one payload per
    # (edge key, map partition) instead of every triple occurrence. At
    # celebrity-entity skew this is the difference between a bounded and
    # an O(occurrences x text_size) shuffle.
    clock = F.timestamp_millis(F.lit(cfg.fixed_clock_millis))
    last = F.max(F.struct(
        F.col("doc_id"), F.col("chunk_idx"), F.col("chunk_id"),
        F.col("count"), F.col("rel_text"),
    )).alias("_last")
    edge_key = ["src_id", "rel_type", "term_key", "dst_id"]
    if cfg.max_sources_per_edge:
        # bounded per-edge state: keep the N lexicographically-smallest
        # doc_ids — deterministic under any ingest order (config.py note).
        # SALTED two-phase accumulation (explicit head-entity skew
        # handling, north rule): a celebrity edge appearing in 10^7 docs
        # would otherwise assemble its full distinct doc_id set on ONE
        # reducer before the slice. N-smallest is a distributive order
        # statistic — N smallest of a union == N smallest of the per-salt
        # N-smallest — so each salt bucket pre-truncates and the merge
        # reducer holds at most salt_buckets x N ids per edge. doc_id is
        # the salt hash, so a doc never lands in two buckets (the
        # per-bucket collect_set stays an exact distinct).
        n = cfg.max_sources_per_edge
        b = max(1, cfg.salt_buckets)
        partial = (
            t.withColumn("_salt", F.pmod(F.hash("doc_id"), F.lit(b)))
            .groupBy(*edge_key, "_salt")
            .agg(F.slice(F.array_sort(F.collect_set("doc_id")), 1, n)
                 .alias("_src_part"), last)
        )
        agged = (
            partial.groupBy(*edge_key)
            .agg(F.slice(F.array_sort(F.flatten(F.collect_list("_src_part"))),
                         1, n).alias("sources"),
                 F.max("_last").alias("_last"))
        )
    else:
        agged = (
            t.groupBy(*edge_key)
            .agg(F.array_sort(F.collect_set("doc_id")).alias("sources"), last)
        )
    edges = (
        agged.select(
            "src_id", "rel_type", "term_key", "dst_id", "sources",
            F.col("_last.chunk_id").alias("_chunk_id"),
            F.col("_last.count").alias("count"),
            F.col("_last.rel_text").alias("rel_text"),
        )
        .withColumnRenamed("term_key", "term")
        .withColumn("created_at", clock)
        .withColumn("updated_at", clock)
    )
    if chunks is not None:
        txt = (
            chunks.select("chunk_id", "text").dropDuplicates(["chunk_id"])
            .select(F.col("chunk_id").alias("_chunk_id"),
                    F.substring("text", 1, cfg.src_txt_clamp)
                    .alias("source_text_full"))
        )
        edges = edges.join(txt, "_chunk_id", "left")
    else:
        edges = edges.withColumn("source_text_full",
                                 F.lit(None).cast("string"))
    edges = edges.drop("_chunk_id")
    rel_emb = embeddings.withColumnRenamed("key", "rel_text")
    return (
        edges.join(rel_emb, "rel_text", "left")
        .select("src_id", "dst_id", "rel_type", "term", "count", "embedding",
                "sources", "source_text_full", "created_at", "updated_at")
    )


def build_mentions(triples: DataFrame) -> DataFrame:
    """(doc_id, entity_id) provenance pairs — covers both MENTIONS and the
    mutual inverse SOURCE edges (ingestMD.py:538-541)."""
    t = _with_ids(_with_node_names(triples))
    subs = t.select("doc_id", F.col("src_id").alias("entity_id"))
    objs = t.select("doc_id", F.col("dst_id").alias("entity_id"))
    return subs.union(objs).dropDuplicates(["doc_id", "entity_id"])


def build_graph(triples: DataFrame, cfg: PipelineConfig = DEFAULT_CONFIG,
                chunks: DataFrame | None = None):
    """triples_raw -> (nodes, edges, mentions, embeddings_cache)."""
    embeddings = build_embeddings_cache(triples, cfg)
    nodes = build_nodes(triples, embeddings, cfg)
    edges = build_edges(triples, embeddings, cfg, chunks=chunks)
    mentions = build_mentions(triples)
    return nodes, edges, mentions, embeddings
