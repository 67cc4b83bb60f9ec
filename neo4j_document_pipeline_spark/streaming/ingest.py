"""Structured-Streaming ingest — the Celery-queue replacement.

The reference queues one Celery task per uploaded file
(/root/reference/tasks.py:11-29, celery_app.py:4-11). The Spark-native
analogue is a streaming read over the ``pages`` table directory with
``foreachBatch`` driving the SAME batch stage functions — checkpointing
replaces Celery job state (SURVEY.md §2.9), so a crashed stream resumes
from its last committed epoch exactly like a re-queued task.

Also provides the windowed event aggregation used as the streaming
correctness probe (watermark + tumbling window).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from neo4j_document_pipeline_spark.config import DEFAULT_CONFIG, PipelineConfig
from neo4j_document_pipeline_spark.sources.pages import PAGES_SCHEMA


def stream_pages(spark: SparkSession, pages_dir: str,
                 max_files_per_trigger: int = 4) -> DataFrame:
    return (
        spark.readStream.schema(PAGES_SCHEMA)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(pages_dir)
    )


def ingest_increment(store, batch_df: DataFrame,
                     cfg: PipelineConfig = DEFAULT_CONFIG,
                     stage: str = "increment",
                     text_source: str = "text",
                     min_quality: float | None = None) -> None:
    """Incrementally MERGE one batch of pages into an existing graph store
    — the core shared by streaming foreachBatch and batch delta-ingest
    (CLI --incremental). Unlike run_pipeline, adding new pages never
    recomputes prior pages: each table is union-merged on its identity key
    (idempotent, so re-delivery of the same batch is a no-op).

    The committed max_warc_ts watermark never regresses: re-delivering an
    older batch keeps the prior high-water mark."""
    from neo4j_document_pipeline_spark.operators.graph import (
        build_edges, build_embeddings_cache, build_mentions, build_nodes)
    from neo4j_document_pipeline_spark.operators.ingest import (
        chunks_to_triples, documents_to_chunks, pages_to_documents)

    batch_max = batch_df.agg(F.max("warc_ts").alias("m")).first()["m"]
    prev = ((store.manifest("documents_final") or {}).get("metrics") or {}) \
        .get("max_warc_ts")
    max_ts = max(str(batch_max), prev) if (batch_max and prev) \
        else (str(batch_max) if batch_max else prev)
    documents = pages_to_documents(batch_df, cfg, text_source=text_source)
    if min_quality is not None:
        # gate on the EXTRACTED canonical text (valid for every
        # text_source, including html/auto where the raw column is null)
        from neo4j_document_pipeline_spark.functions.textstats import (
            col_quality_score)
        documents = documents.filter(col_quality_score(F.col("text")) >= min_quality)
    documents = documents.localCheckpoint()
    chunks = documents_to_chunks(documents, cfg).localCheckpoint()
    triples = chunks_to_triples(chunks, cfg).localCheckpoint()
    emb = store.merge_embeddings(build_embeddings_cache(triples, cfg))
    store.write("embeddings_cache", emb, stage=stage)
    emb = store.read("embeddings_cache")
    # merge_write_*: on a bucket(N, key) store this is the Iceberg-MERGE
    # fast path — only the bucket files the batch's keys hash into are
    # read and rewritten; untouched bucket files carry into the new
    # snapshot by hardlink. Non-bucketed stores fall back to the full
    # merge + layout-preserving rewrite (a plain write would silently
    # drop the layout the full run committed).
    nodes_man = store.merge_write_nodes(build_nodes(triples, emb, cfg),
                                        stage=stage)
    # keep the committed read-side indexes in step with the merged nodes
    # (a stale index is bypassed at read time; rebuilding here keeps the
    # indexed fast paths live across incremental batches). The ANN index
    # reuses the previous batch's coarse centroids when present — cells
    # only re-ASSIGN per batch; training reruns only when no quantizer
    # exists yet (or the corpus first crosses ann_min_rows).
    from neo4j_document_pipeline_spark.operators.retrieval import (
        build_node_tokens, build_node_vectors)
    store.update_metrics("nodes", {"label_counts": {
        r["label"]: r["n"] for r in
        store.read("nodes").groupBy("label")
        .agg(F.count("*").alias("n")).collect()}})
    idx_metrics = {"src_nodes_version": nodes_man["version"],
                   "src_nodes_fingerprint":
                       nodes_man.get("input_fingerprint") or None,
                   "src_nodes_rows": nodes_man.get("rows")}
    store.write("node_tokens", build_node_tokens(store.read("nodes")),
                stage=stage, extra_metrics=idx_metrics)
    if (nodes_man.get("rows") or 0) >= cfg.ann_min_rows:
        from neo4j_document_pipeline_spark.operators.similarity import (
            NoVectorsError)
        prior = ((store.manifest("node_vectors") or {})
                 .get("metrics") or {})
        # reuse the prior quantizers ONLY when they match the current
        # config shape — a changed ann_cells / ann_pq_m / ann_pq_k must
        # retrain, never be silently ignored with a wrong manifest stamp
        prior_cents = prior.get("centroids")
        if prior_cents is not None and len(prior_cents) != cfg.ann_cells:
            prior_cents = None
        prior_books = prior.get("pq_codebooks") if cfg.ann_pq_m > 0 else None
        if prior_books is not None and (
                len(prior_books) != cfg.ann_pq_m
                or len(prior_books[0]) != cfg.ann_pq_k):
            prior_books = None
        try:
            vdf, cents, books = build_node_vectors(
                store.read("nodes"), cfg,
                centroids=prior_cents, codebooks=prior_books)
        except NoVectorsError:
            pass  # no embedded rows -> no index; reads brute-force
        else:
            pq_meta = ({"pq_codebooks": books.tolist(),
                        "pq_m": cfg.ann_pq_m}
                       if books is not None else {})
            store.write("node_vectors", vdf, stage=stage,
                        partition_by=["label", "cell"],
                        extra_metrics={**idx_metrics, **pq_meta,
                                       "centroids": cents,
                                       "n_cells": len(cents)})
    store.merge_write_edges(build_edges(triples, emb, cfg, chunks=chunks),
                            max_sources=cfg.max_sources_per_edge,
                            stage=stage)
    store.merge_write_mentions(build_mentions(triples), stage=stage)
    n_chunks = chunks.groupBy("doc_id").agg(F.count("*").alias("_n"))
    docs_final = (documents.join(n_chunks, "doc_id", "left")
                  .withColumn("n_chunks", F.coalesce("_n", F.lit(0)).cast("int"))
                  .drop("_n"))
    store.write("documents_final", store.merge_documents(docs_final),
                stage=stage,
                extra_metrics={"max_warc_ts": max_ts})


def start_ingest_stream(spark: SparkSession, pages_dir: str, store_root: str,
                        checkpoint_dir: str,
                        cfg: PipelineConfig = DEFAULT_CONFIG,
                        text_source: str = "text",
                        min_quality: float | None = None,
                        langs: list[str] | None = None,
                        keep_versions: int = 1,
                        max_files_per_trigger: int = 4):
    """readStream(pages) -> foreachBatch(full ingest DAG with MERGE
    semantics). Each micro-batch is one 'Celery task batch'; the GraphStore
    MERGE keeps re-delivery idempotent (at-least-once -> effectively-once).

    Ingest options (text_source/min_quality/langs) apply per batch exactly
    as on the batch-ingest path; ``keep_versions`` must match the store's
    retention window or streaming commits would prune snapshots the user
    asked to keep. A MERGE rewrites the graph tables per micro-batch, so
    backfills over many files should raise ``max_files_per_trigger`` (or
    use plain ``ingest``) — tiny triggers make an O(n_files/trigger)
    sequence of full rewrites."""
    from neo4j_document_pipeline_spark.sources.store import GraphStore

    store = GraphStore(store_root, spark, keep_versions=keep_versions)

    def process_batch(batch_df: DataFrame, epoch_id: int):
        if langs:
            batch_df = batch_df.filter(F.col("lang").isin(list(langs)))
        if batch_df.isEmpty():
            return
        ingest_increment(store, batch_df, cfg,
                         stage=f"stream-epoch-{epoch_id}",
                         text_source=text_source, min_quality=min_quality)

    return (
        stream_pages(spark, pages_dir,
                     max_files_per_trigger=max_files_per_trigger)
        .writeStream
        .foreachBatch(process_batch)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def stateful_user_counters(events: DataFrame,
                           timeout_ms: int | None = None) -> DataFrame:
    """Custom stateful streaming operator via applyInPandasWithState:
    per-user cumulative (n_events, total_value) carried across
    micro-batches — the pattern for arbitrary keyed state the built-in
    windowed aggregations can't express (SURVEY §2.9 Spark mapping).

    Works on a stream grouped by user_id; on a static frame use the batch
    groupBy equivalent instead."""
    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    out_schema = "user_id long, n_events long, total_value double"
    state_schema = "n long, v double"

    def update(key, pdfs, state: GroupState):
        n, v = state.get if state.exists else (0, 0.0)
        for pdf in pdfs:
            n += len(pdf)
            v += float(pdf["value"].sum())
        state.update((n, v))
        yield pd.DataFrame({
            "user_id": [key[0]], "n_events": [n], "total_value": [v],
        })

    return (
        events.groupBy("user_id")
        .applyInPandasWithState(
            update, out_schema, state_schema, "update",
            GroupStateTimeout.NoTimeout,
        )
    )


def session_windows(events: DataFrame, gap: str = "30 minutes",
                    watermark: str | None = None) -> DataFrame:
    """Spark-NATIVE sessionization via F.session_window: one
    (Object)HashAggregate with in-operator session merging, identical on
    static frames and streams (a watermark closes sessions for append
    output) — the scale path next to the lag/sum gaps-and-islands
    construction (sessionize_events' oracle shape), which needs a
    per-user ordered window over the whole frame. Boundary semantics:
    a session spans [first_ts, last_ts + gap); an event exactly ``gap``
    after the last one starts a NEW session (windows that merely touch
    do not overlap)."""
    e = events.withColumn("ts", F.col("ts").cast("timestamp"))
    if watermark:
        e = e.withWatermark("ts", watermark)
    return (
        e.groupBy(F.session_window("ts", gap).alias("sw"), "user_id")
        .agg(F.count("*").alias("n_events"))
        .select("user_id",
                F.col("sw.start").alias("session_start"),
                F.col("sw.end").alias("session_end"),
                "n_events")
    )


def windowed_event_counts(events: DataFrame, window: str = "5 minutes",
                          watermark: str = "10 minutes") -> DataFrame:
    """Tumbling-window counts with late-data watermark — works on both a
    static frame and a stream (same plan)."""
    # watermarks need TIMESTAMP (LTZ); parquet may carry TIMESTAMP_NTZ
    events = events.withColumn("ts", F.col("ts").cast("timestamp"))
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window).alias("win"), "event_type")
        .agg(F.count("*").alias("n"), F.sum("value").alias("v"))
        .select(F.col("win.start").alias("win_start"), "event_type", "n", "v")
    )
