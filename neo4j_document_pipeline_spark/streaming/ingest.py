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
                     min_quality: float | None = None,
                     redact_pii: bool = False,
                     dedup_lines: int | None = None,
                     strip_spans: bool = False,
                     span_k: int = 8,
                     span_min_count: int = 2,
                     resolve_near_dups: bool = False,
                     near_dup_threshold: float = 0.8,
                     track_sketches: bool = False) -> None:
    """Incrementally MERGE one batch of pages into an existing graph store
    — the core shared by streaming foreachBatch and batch delta-ingest
    (CLI --incremental). Unlike run_pipeline, adding new pages never
    recomputes prior pages: each table is union-merged on its identity key
    (idempotent, so re-delivery of the same batch is a no-op).

    EVERY per-batch cost here is O(delta), never O(table), matching how
    Neo4j updates its Lucene/vector indexes incrementally on MERGE
    (ingestMD.py:648-702) rather than rebuilding them:
    - graph tables: bucket-scoped MERGE (only the buckets the batch's
      keys hash into are rewritten; the rest hardlink forward);
    - node_tokens FTS: the batch's DELTA postings merge into the
      bucket(N, tok) index — touched toks' buckets rewrite with exact
      re-counted document frequencies, untouched buckets carry over;
    - node_vectors ANN: the batch's embeddings re-ASSIGN against the
      committed quantizer and only their (label, cell) partition dirs
      rewrite (an entity's label/embedding are pure functions of its id,
      so its cell is stable under a fixed quantizer); any quantizer
      mismatch (dimension, geometry, PQ shape — round-3 advisory) falls
      back to a full retrain+rebuild instead of committing a wrong index;
    - label_counts: rolled forward from the merge's own new-rows-per-
      label delta metric (no recount job), self-healing to a full
      recount if the rolled total ever disagrees with the committed rows.

    The committed max_warc_ts watermark never regresses: re-delivering an
    older batch keeps the prior high-water mark."""
    from neo4j_document_pipeline_spark.operators.graph import (
        build_edges, build_embeddings_cache, build_mentions, build_nodes)
    from neo4j_document_pipeline_spark.operators.ingest import (
        chunks_to_triples, documents_to_chunks, pages_to_documents)
    from neo4j_document_pipeline_spark.operators.retrieval import (
        QUANTIZER_SIDECAR, _name_tokens, build_node_tokens,
        build_node_vectors, index_is_fresh, load_quantizers,
        node_tokens_merge_fn, node_vectors_merge_fn,
        quantizer_manifest_metrics, quantizer_sidecar_bytes,
        resolve_ann_cells, resolve_index_buckets, stamp_index_metrics)

    def inc_fp(table: str) -> str:
        # deterministic, job-free increment lineage: the parent snapshot
        # this merge grew from (round-3 advisory — a falsy fingerprint
        # broke compact's fingerprint carry-over after increments)
        parent = (store.manifest(table) or {}).get("version") or "genesis"
        return f"inc:{stage}:{parent}"

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
    if redact_pii:
        # stateless scrub, BEFORE the stateful gates (their state and
        # signatures must cover the text that lands in the store) —
        # byte-identical to the batch pipeline in any batch order
        from neo4j_document_pipeline_spark.operators.hygiene import (
            apply_pii_redaction)
        documents = apply_pii_redaction(documents, cfg)
    documents = documents.localCheckpoint()
    # --- corpus-hygiene gates (same order as run_pipeline: quality ->
    # PII -> line dedup -> near-dup resolution; PREFIX semantics vs the
    # batch pipeline — see operators/hygiene.py). Every lookup against
    # the committed state is bucket-pruned (read_matching), every state
    # update a bucket-scoped MERGE: O(delta), never O(corpus).
    if dedup_lines is not None:
        from neo4j_document_pipeline_spark.operators.hygiene import (
            gate_lines_increment, merge_line_postings)
        raw_documents = documents
        documents = gate_lines_increment(
            store, raw_documents, dedup_lines, cfg).localCheckpoint()
        # postings count the RAW pre-clean lines (state parity with the
        # batch pipeline's line_postings stage)
        merge_line_postings(store, raw_documents, cfg, stage=stage,
                            input_fingerprint=inc_fp("line_postings"),
                            min_doc_freq=dedup_lines)
    pre_span = documents
    if strip_spans:
        from neo4j_document_pipeline_spark.operators.hygiene import (
            gate_spans_increment)
        documents = gate_spans_increment(
            store, documents, k=span_k, min_count=span_min_count,
            cfg=cfg).localCheckpoint()
    if resolve_near_dups:
        from neo4j_document_pipeline_spark.operators.hygiene import (
            gate_near_dups_increment, merge_doc_signatures)
        documents, batch_sigs = gate_near_dups_increment(
            store, documents, cfg, near_dup_threshold)
        documents = documents.localCheckpoint()
        merge_doc_signatures(store, documents, cfg, stage=stage,
                             input_fingerprint=inc_fp("doc_signatures"),
                             sigs=batch_sigs)
    if strip_spans:
        # kept=false evidence from the pre-cut batch + kept=true rows
        # from the batch's FINAL survivors (post-cut, post near-dup) —
        # mirrors the batch pipeline's gram_postings stage
        from neo4j_document_pipeline_spark.operators.hygiene import (
            merge_gram_postings)
        merge_gram_postings(store, pre_span, documents, cfg, stage=stage,
                            input_fingerprint=inc_fp("gram_postings"),
                            k=span_k, min_count=span_min_count)
    chunks = documents_to_chunks(documents, cfg).localCheckpoint()
    triples = chunks_to_triples(chunks, cfg).localCheckpoint()
    # merge_write_*: on a bucket(N, key) store this is the Iceberg-MERGE
    # fast path — only the bucket files the batch's keys hash into are
    # read and rewritten; untouched bucket files carry into the new
    # snapshot by hardlink. Non-bucketed stores fall back to the full
    # merge + layout-preserving rewrite (a plain write would silently
    # drop the layout the full run committed).
    store.merge_write_embeddings(build_embeddings_cache(triples, cfg),
                                 stage=stage,
                                 input_fingerprint=inc_fp("embeddings_cache"))
    emb = store.read("embeddings_cache")
    prev_nodes_man = store.manifest("nodes")  # index-freshness baseline
    # one materialization feeds the data merge AND both index deltas
    node_updates = build_nodes(triples, emb, cfg).localCheckpoint()

    def _new_label_counts(existing, updates):
        # evaluated INSIDE the merge against the same affected-bucket
        # frame it reads: the batch's genuinely-new entities per label,
        # O(delta + affected buckets)
        ups = updates.select("entity_id", "label") \
            .dropDuplicates(["entity_id"])
        if existing is not None:
            ups = ups.join(existing.select("entity_id"), "entity_id",
                           "left_anti")
        return {"new_rows_by_label": {
            r["label"]: r["n"] for r in
            ups.groupBy("label").agg(F.count("*").alias("n")).collect()}}

    nodes_man = store.merge_write_nodes(node_updates, stage=stage,
                                        input_fingerprint=inc_fp("nodes"),
                                        metrics_fn=_new_label_counts)
    prior_lc = ((prev_nodes_man or {}).get("metrics") or {}) \
        .get("label_counts")
    new_by = (nodes_man.get("metrics") or {}).get("new_rows_by_label") or {}
    lc = None
    if prior_lc is not None:
        lc = dict(prior_lc)
        for lab, n in new_by.items():
            lc[lab] = lc.get(lab, 0) + n
        if sum(lc.values()) != (nodes_man.get("rows") or 0):
            lc = None  # inconsistent roll-forward: recount
    if lc is None:
        lc = {r["label"]: r["n"] for r in
              store.read("nodes").groupBy("label")
              .agg(F.count("*").alias("n")).collect()}
    store.update_metrics("nodes", {"label_counts": lc})
    idx_metrics = stamp_index_metrics(store.manifest("nodes"))

    # --- node_tokens FTS: delta-postings MERGE when the committed index
    # is bucket(N, tok) and fresh w.r.t. the PRE-merge nodes snapshot;
    # anything else (missing, stale, unbucketed legacy layout) rebuilds.
    tok_man = store.manifest("node_tokens")
    if (tok_man is not None and tok_man.get("bucket_by") == "tok"
            and index_is_fresh(tok_man, prev_nodes_man)):
        delta_post = _name_tokens(
            node_updates.select("entity_id", "label", "name"))
        store.merge_write("node_tokens", delta_post, node_tokens_merge_fn(),
                          stage=stage, extra_metrics=idx_metrics,
                          input_fingerprint=inc_fp("node_tokens"))
    else:
        store.write_bucketed(
            "node_tokens", build_node_tokens(store.read("nodes")),
            bucket_by="tok",
            n_buckets=resolve_index_buckets(
                cfg, (store.manifest("nodes") or {}).get("rows")),
            stage=stage, extra_metrics=idx_metrics,
            input_fingerprint=inc_fp("node_tokens"))

    # --- node_vectors ANN: re-assign ONLY the batch's embeddings against
    # the committed quantizer and rewrite only their (label, cell)
    # partitions; full retrain+rebuild when no valid quantizer can be
    # reused.
    rows = nodes_man.get("rows") or 0
    if rows >= cfg.ann_min_rows:
        import numpy as np
        from neo4j_document_pipeline_spark.operators.similarity import (
            NoVectorsError)
        vman = store.manifest("node_vectors")
        cents, books = load_quantizers(store, "node_vectors", vman) \
            if vman else (None, None)
        prior_ranges = ((vman or {}).get("metrics") or {}) \
            .get("label_cells")
        reuse = (vman is not None and bool(cents)
                 and index_is_fresh(vman, prev_nodes_man)
                 and vman.get("partition_by") == ["label", "cell"]
                 # quantizer SHAPE must match the config: a global index
                 # can't serve per-label probes and vice versa — a
                 # toggle between batches forces a full rebuild
                 and bool(prior_ranges) == bool(cfg.ann_per_label))
        # geometry: explicit config must match exactly; auto geometry
        # retrains only when the corpus has outgrown the committed cell
        # count by >2x (geometric growth => amortized O(delta) retrains).
        # Per-label quantizers are judged PER LABEL — the committed total
        # is a sum over labels, so comparing it to the global geometry
        # would either rebuild every batch (explicit ann_cells) or let a
        # hot label outgrow its own cells forever (auto, the floor-
        # inflated total masks the one label that grew 100x).
        if reuse and cfg.ann_per_label and prior_ranges:
            for lab, off_n in prior_ranges.items():
                n_lab = int(off_n[1])
                if cfg.ann_cells > 0:
                    # a label may hold FEWER cells than the explicit
                    # count (trained on fewer sample points), never more
                    if n_lab > cfg.ann_cells:
                        reuse = False
                        break
                else:
                    lab_rows = lc.get(lab) or 0
                    if lab_rows and 2 * n_lab < resolve_ann_cells(
                            cfg, lab_rows):
                        reuse = False
                        break
        elif reuse and cfg.ann_cells > 0 and len(cents) != cfg.ann_cells:
            reuse = False
        elif reuse and cfg.ann_cells == 0 \
                and 2 * len(cents) < resolve_ann_cells(cfg, rows):
            reuse = False
        if cfg.ann_pq_m > 0:
            if reuse and (books is None or np.asarray(books).shape[:2]
                          != (cfg.ann_pq_m, cfg.ann_pq_k)):
                reuse = False
        else:
            books = None
            if reuse and ((vman.get("metrics") or {}).get("pq_m") or 0) > 0:
                reuse = False  # index stores codes but cfg wants vectors
        # dimension guard (round-3 advisory): a featurizer-width change
        # must retrain over the full corpus, never null-assign the delta
        emb_head = node_updates.filter(F.col("embedding").isNotNull()) \
            .select("embedding").first()
        delta_dim = len(emb_head[0]) \
            if emb_head is not None and emb_head[0] is not None else None
        if reuse and delta_dim is not None and len(cents[0]) != delta_dim:
            reuse = False
        try:
            if reuse and delta_dim is None:
                # batch carries no embeddings: index content is already
                # complete — restamp its source lineage only
                store.update_metrics("node_vectors", idx_metrics)
            elif reuse:
                # per-label quantizers: labels new to this batch get
                # their cells trained from the delta and APPENDED inside
                # build_node_vectors — existing labels' slices never
                # move, so the partition-scoped merge below stays sound
                vdf, cents, books, ranges = build_node_vectors(
                    node_updates, cfg, centroids=cents, codebooks=books,
                    label_ranges=prior_ranges)
                payload = quantizer_sidecar_bytes(cents, books)
                store.merge_write_hive(
                    "node_vectors", vdf, node_vectors_merge_fn(),
                    partition_by=["label", "cell"], stage=stage,
                    extra_files={QUANTIZER_SIDECAR: payload},
                    extra_metrics={**idx_metrics,
                                   **quantizer_manifest_metrics(
                                       payload, len(cents),
                                       cfg.ann_pq_m if books is not None
                                       else 0, label_cells=ranges)},
                    input_fingerprint=inc_fp("node_vectors"))
            else:
                vdf, cents, books, ranges = build_node_vectors(
                    store.read("nodes"), cfg, n_rows=rows)
                payload = quantizer_sidecar_bytes(cents, books)
                store.write(
                    "node_vectors", vdf, stage=stage,
                    partition_by=["label", "cell"],
                    extra_files={QUANTIZER_SIDECAR: payload},
                    extra_metrics={**idx_metrics,
                                   **quantizer_manifest_metrics(
                                       payload, len(cents),
                                       cfg.ann_pq_m if books is not None
                                       else 0, label_cells=ranges)},
                    input_fingerprint=inc_fp("node_vectors"))
        except NoVectorsError:
            pass  # no embedded rows anywhere -> no index; reads brute-force
    store.merge_write_edges(build_edges(triples, emb, cfg, chunks=chunks),
                            max_sources=cfg.max_sources_per_edge,
                            stage=stage,
                            input_fingerprint=inc_fp("edges"))
    store.merge_write_mentions(build_mentions(triples), stage=stage,
                               input_fingerprint=inc_fp("mentions"))
    from neo4j_document_pipeline_spark.operators.sketches import (
        CORPUS_SKETCHES)
    if track_sketches or store.exists(CORPUS_SKETCHES):
        # once the state exists it is SELF-MAINTAINING: an increment
        # run without the flag must not silently stale a table whose
        # summary claims whole-corpus totals
        from neo4j_document_pipeline_spark.operators.sketches import (
            corpus_sketches_from_docs, corpus_sketches_merge_fn)
        # only NEVER-SEEN content contributes: doc_id = sha256(text),
        # so the anti-join against the committed final docs makes
        # re-delivery a no-op and keeps state == batch-rebuild over the
        # final corpus, bit-for-bit (cms adds, bloom ORs, kmv re-takes
        # bottom-k — each the sketch's own exact merge). This runs
        # BEFORE the documents_final MERGE below, which reads the same
        # table in full in this emulation anyway (on real Iceberg both
        # become bucket-pruned MERGE INTO point lookups).
        fresh = documents.select("doc_id", "text")
        if store.exists("documents_final"):
            fresh = fresh.join(
                store.read("documents_final").select("doc_id"),
                "doc_id", "left_anti")
            if not store.exists(CORPUS_SKETCHES):
                # flag enabled mid-life: one-time disclosed O(corpus)
                # backfill over the already-committed docs, so the
                # state describes the WHOLE corpus from its first
                # commit (unlike the prefix-semantics gates, partial
                # coverage here would misreport totals, not just gate
                # a line late)
                fresh = (store.read("documents_final")
                         .select("doc_id", "text").unionByName(fresh))
        store.merge_write(CORPUS_SKETCHES,
                          corpus_sketches_from_docs(fresh),
                          corpus_sketches_merge_fn(), stage=stage,
                          input_fingerprint=inc_fp(CORPUS_SKETCHES))
    n_chunks = chunks.groupBy("doc_id").agg(F.count("*").alias("_n"))
    docs_final = (documents.join(n_chunks, "doc_id", "left")
                  .withColumn("n_chunks", F.coalesce("_n", F.lit(0)).cast("int"))
                  .drop("_n"))
    store.merge_write_documents(
        docs_final, stage=stage,
        extra_metrics={"max_warc_ts": max_ts},
        input_fingerprint=inc_fp("documents_final"))


def start_ingest_stream(spark: SparkSession, pages_dir: str, store_root: str,
                        checkpoint_dir: str,
                        cfg: PipelineConfig = DEFAULT_CONFIG,
                        text_source: str = "text",
                        min_quality: float | None = None,
                        langs: list[str] | None = None,
                        redact_pii: bool = False,
                        dedup_lines: int | None = None,
                        strip_spans: bool = False,
                        span_k: int = 8,
                        span_min_count: int = 2,
                        resolve_near_dups: bool = False,
                        near_dup_threshold: float = 0.8,
                        track_sketches: bool = False,
                        keep_versions: int = 1,
                        max_files_per_trigger: int = 4):
    """readStream(pages) -> foreachBatch(full ingest DAG with MERGE
    semantics). Each micro-batch is one 'Celery task batch'; the GraphStore
    MERGE keeps re-delivery idempotent (at-least-once -> effectively-once).

    Ingest options (text_source/min_quality/langs) apply per batch exactly
    as on the batch-ingest path; ``keep_versions`` must match the store's
    retention window or streaming commits would prune snapshots the user
    asked to keep. On a bucketed store every per-batch cost — data MERGE,
    FTS postings merge, ANN partition rewrite, label-count roll-forward —
    is O(batch), so trigger size trades commit overhead against latency
    rather than multiplying full rewrites; plain ``ingest`` remains the
    cheapest way to backfill a whole corpus at once (one build, one
    index pass)."""
    from neo4j_document_pipeline_spark.sources.store import GraphStore

    store = GraphStore(store_root, spark, keep_versions=keep_versions)

    def process_batch(batch_df: DataFrame, epoch_id: int):
        if langs:
            batch_df = batch_df.filter(F.col("lang").isin(list(langs)))
        if batch_df.isEmpty():
            return
        ingest_increment(store, batch_df, cfg,
                         stage=f"stream-epoch-{epoch_id}",
                         text_source=text_source, min_quality=min_quality,
                         redact_pii=redact_pii,
                         dedup_lines=dedup_lines,
                         strip_spans=strip_spans,
                         span_k=span_k,
                         span_min_count=span_min_count,
                         resolve_near_dups=resolve_near_dups,
                         near_dup_threshold=near_dup_threshold,
                         track_sketches=track_sketches)

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


def attribution_pairs(events: DataFrame, base_type: str = "view",
                      trigger_type: str = "click",
                      max_delay: str = "10 minutes",
                      watermark: str | None = None) -> DataFrame:
    """Stream-stream INTERVAL join (the attribution shape): every
    ``trigger_type`` event paired with each same-user ``base_type``
    event in its preceding ``max_delay`` window — base_ts <= trig_ts <
    base_ts + max_delay -> (user_id, trig_id, trig_ts, base_id,
    base_ts). The classic click-to-view attribution / funnel-stitching
    operator the windowed aggregations can't express (it correlates
    TWO event subsets row-to-row, not one stream to itself by key).

    Same plan on a static frame and a stream. Streaming: pass
    ``watermark`` — Spark requires a watermark on both sides plus the
    time-range join condition exactly so it can BOUND the join state
    (a view's state row is dropped once the watermark passes base_ts +
    max_delay; an unbounded stream-stream join would hold both sides
    forever). Inner join, so results are deterministic across
    micro-batch boundaries: each qualifying pair is emitted exactly
    once, whenever both sides have arrived.

    Scale: the join is an equi-join on user_id with a range predicate —
    state per user is bounded by events inside one max_delay window, so
    skewed users are bounded by their event RATE, not history length."""
    e = events.withColumn("ts", F.col("ts").cast("timestamp"))
    base = e.filter(F.col("event_type") == base_type)
    trig = e.filter(F.col("event_type") == trigger_type)
    if watermark:
        base = base.withWatermark("ts", watermark)
        trig = trig.withWatermark("ts", watermark)
    b = base.select(F.col("user_id").alias("b_user"),
                    F.col("event_id").alias("base_id"),
                    F.col("ts").alias("base_ts"))
    t = trig.select("user_id", F.col("event_id").alias("trig_id"),
                    F.col("ts").alias("trig_ts"))
    return (t.join(
        b,
        (F.col("user_id") == F.col("b_user"))
        & (F.col("base_ts") <= F.col("trig_ts"))
        & (F.col("trig_ts")
           < F.col("base_ts") + F.expr(f"INTERVAL {max_delay}")))
        .select("user_id", "trig_id", "trig_ts", "base_id", "base_ts"))


def dedup_event_stream(events: DataFrame, keys: list[str] | None = None,
                       watermark: str = "1 hour") -> DataFrame:
    """Exactly-once event delivery from an at-least-once source: drop
    re-delivered events by ``keys`` (default event_id). On a stream
    this is dropDuplicatesWithinWatermark — the state row for a key is
    released once the watermark passes its event time, so dedup state
    is bounded by the re-delivery horizon (``watermark``) instead of
    growing with the whole stream's key cardinality (plain
    dropDuplicates on a stream never evicts). On a static frame the
    same call reduces to an ordinary dropDuplicates over the keys.
    Duplicates are assumed byte-identical re-deliveries (the Kafka /
    file-redeliver case), so which copy survives is immaterial."""
    keys = list(keys or ["event_id"])
    e = events.withColumn("ts", F.col("ts").cast("timestamp"))
    if e.isStreaming:
        return (e.withWatermark("ts", watermark)
                .dropDuplicatesWithinWatermark(keys))
    return e.dropDuplicates(keys)


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
