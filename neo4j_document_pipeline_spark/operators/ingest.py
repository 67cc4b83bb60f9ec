"""Write-path stages: pages -> documents -> chunks -> triples_raw.

Spark-first re-expression of the reference ingest procedure
(/root/reference/ingestMD.py:730-779):

- canonicalize + doc_id: Arrow-batched pandas UDF running the EXACT Python
  regex chain (byte-identical invariant) + JVM-side sha2;
- chunking: ``mapInPandas`` flatMap (one input doc -> N chunk rows), the
  UDTF shape of chunk_markdown (ingestMD.py:83-118);
- triple extraction: ``dropDuplicates('chunk_id')`` BEFORE extraction
  reproduces the reference's per-run extraction cache
  (ingestMD.py:745-752) as a set-oriented dedup — each unique chunk is
  extracted once, then results join back to every (doc, chunk) occurrence;
- all heavy stages keep columns pruned (text only where needed) and avoid
  driver-side loops entirely.

Scale notes (100 TB design): every stage is embarrassingly parallel per
row; the only shuffles are the chunk_id dedup (hash partition on a sha256
key — uniform by construction, no skew) and the join-back (same key).
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from neo4j_document_pipeline_spark.config import DEFAULT_CONFIG, PipelineConfig
from neo4j_document_pipeline_spark.functions.extraction import (
    extract_chunk_triples,
    flatten_triples,
)
from neo4j_document_pipeline_spark.functions.text import py_canonicalize

DOCUMENTS_SCHEMA = (
    "doc_id string, url string, title string, path string, text string, "
    "n_chunks int, created_at timestamp, updated_at timestamp"
)
CHUNKS_SCHEMA = (
    "doc_id string, chunk_idx int, chunk_id string, text string, n_tokens int"
)
# NOTE: no src_txt column — carrying chunk text per triple row multiplies
# shuffle volume by text size x triples-per-chunk at scale. The winning
# chunk's text is joined back (by chunk_id) only for the final edges
# (build_edges(..., chunks=...)), reproducing rel.source_text_full.
TRIPLES_SCHEMA = (
    "chunk_id string, subject string, predicate string, object string, "
    "subject_type string, object_type string, rel_type string, "
    "object_kind string, start string, end string, pillar string, "
    "term string, count int"
)


_PY_STAGE_TARGET_BYTES = 32 << 20   # ~32 MB of input text per python task


def _python_stage_partitions(df: DataFrame) -> int:
    """Partition count for an Arrow/python map stage, derived from the
    input's estimated size: ceil(bytes / 32 MB), floored at the core
    count and capped at 1000x cores. Replaces the old fixed 4x-cores
    fan-out, which is wrong at both extremes — 128 near-empty python
    tasks per stage on a test corpus (pure scheduling overhead; the
    rule work is ~30 us/chunk), and far too FEW bytes-per-task at
    100 TB (corpus/128 per task). Catalyst's size estimate is free (no
    job — parquet-backed inputs report real file bytes); an unknown or
    absurd estimate falls back to 4x cores, the old behavior."""
    sc = df.sparkSession.sparkContext
    cores = sc.defaultParallelism
    try:
        est = int(df._jdf.queryExecution().optimizedPlan()
                  .stats().sizeInBytes())
    except Exception:
        est = -1
    if est <= 0 or est > (1 << 50):   # missing / default-huge estimate
        return cores * 4
    return max(cores, min(cores * 1000,
                          -(-est // _PY_STAGE_TARGET_BYTES)))


def _canonicalize_udf():
    # built lazily: pandas_udf needs an active SparkSession to parse the type
    @F.pandas_udf("string")
    def canon(s: pd.Series) -> pd.Series:
        return s.map(py_canonicalize)
    return canon


def _html_to_text_udf():
    from neo4j_document_pipeline_spark.functions.text import pd_html_to_text

    @F.pandas_udf("string")
    def h2t(s: pd.Series) -> pd.Series:
        return pd_html_to_text(s)
    return h2t


def _page_text(pages: DataFrame, text_source: str) -> DataFrame:
    """(url, text) projection under the chosen source column.

    - 'text' (default): trust the pre-extracted text column; the html
      binary column is pruned from the scan entirely;
    - 'html': extract text from the html binary via the Arrow-batched
      pandas UDF (north-star item 1) — byte-identical per url to the
      plain-Python reference extractor, which is the same function;
    - 'auto': use text when non-empty, else extract from html.
    """
    if text_source == "text":
        return pages.select("url", "text")
    h2t = _html_to_text_udf()
    if text_source == "html":
        return pages.select("url", h2t(F.col("html")).alias("text"))
    if text_source == "auto":
        return pages.select(
            "url",
            F.when(F.col("text").isNotNull() & (F.col("text") != ""),
                   F.col("text"))
            .otherwise(h2t(F.col("html"))).alias("text"),
        )
    raise ValueError(f"text_source must be text|html|auto, got {text_source!r}")


def pages_to_canonical(pages: DataFrame,
                       cfg: PipelineConfig = DEFAULT_CONFIG,
                       text_source: str = "text") -> DataFrame:
    """Canonicalize + content-hash WITHOUT the doc-dedup shuffle.

    The chunker only needs (doc_id, text); duplicate pages share a doc_id
    and produce identical chunks, which the chunk_id dedup (extraction
    cache) and the edge/mention merges already collapse — so the
    duplicate-page groupBy can run OFF the extraction critical path (it is
    only needed to materialize the documents TABLE)."""
    return (
        _page_text(pages, text_source)
        .withColumn("text", _canonicalize_udf()(F.col("text")))
        .withColumn("doc_id", F.sha2(F.col("text"), 256))
    )


def pages_to_documents(pages: DataFrame, cfg: PipelineConfig = DEFAULT_CONFIG,
                       text_source: str = "text") -> DataFrame:
    """Canonical text + content-hash doc_id (ingestMD.py:736-737).

    Title = url basename stem (the reference uses the file stem,
    ingestMD.py:732); duplicates by doc_id keep the lexicographically first
    url (deterministic; the reference's MERGE is idempotent on doc_id).
    """
    docs = (
        _page_text(pages, text_source)
        .withColumn("text", _canonicalize_udf()(F.col("text")))
        .withColumn("path", F.col("url"))
        .withColumn(
            "title",
            F.regexp_replace(
                F.element_at(F.split(F.col("url"), "/"), -1),
                r"\.(md|markdown|mdx|html?)$", "",
            ),
        )
    )
    return finalize_documents(docs, cfg)


def finalize_documents(docs: DataFrame,
                       cfg: PipelineConfig = DEFAULT_CONFIG) -> DataFrame:
    """(url, title, path, text) candidates -> the documents schema:
    content-hash doc_id over the (possibly gate-rewritten) text, one row
    per doc_id, injected-clock timestamps. Factored out of
    pages_to_documents so corpus-hygiene ingest gates that REWRITE text
    (cross-doc line dedup) re-key and re-dedupe through the exact same
    path — two raw-distinct pages whose cleaned texts collide collapse
    into one document just like byte-identical raw pages do.

    One row per doc_id: first url wins, deterministically. argmin-struct
    instead of a window: min(struct(url, payload)) has map-side partial
    aggregation, so the shuffle moves one text per (doc_id, partition),
    not one per duplicate page."""
    clock = F.timestamp_millis(F.lit(cfg.fixed_clock_millis))
    first = F.min(F.struct("url", "title", "path", "text")).alias("_f")
    return (
        docs.withColumn("doc_id", F.sha2(F.col("text"), 256))
        .groupBy("doc_id").agg(first)
        .select(
            "doc_id", F.col("_f.url").alias("url"),
            F.col("_f.title").alias("title"), F.col("_f.path").alias("path"),
            F.col("_f.text").alias("text"),
        )
        .withColumn("n_chunks", F.lit(None).cast("int"))
        .withColumn("created_at", clock)
        .withColumn("updated_at", clock)
        .select("doc_id", "url", "title", "path", "text",
                "n_chunks", "created_at", "updated_at")
    )


def documents_to_chunks(documents: DataFrame,
                        cfg: PipelineConfig = DEFAULT_CONFIG) -> DataFrame:
    """Token-budget paragraph packing, one row per chunk (ingestMD.py:83-118)."""
    max_tokens = cfg.chunk_size_tokens
    overlap = cfg.chunk_overlap_tokens

    def chunker(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from neo4j_document_pipeline_spark.functions.chunking import (
            chunk_text_with_counts,
        )
        from neo4j_document_pipeline_spark.functions.text import py_sha256_hex
        for pdf in batches:
            out = []
            for doc_id, text in zip(pdf["doc_id"], pdf["text"]):
                for idx, (chunk, n_tok) in enumerate(
                        chunk_text_with_counts(text, max_tokens, overlap)):
                    out.append((doc_id, idx, py_sha256_hex(chunk), chunk, n_tok))
            yield pd.DataFrame(
                out, columns=["doc_id", "chunk_idx", "chunk_id", "text", "n_tokens"]
            )

    # Explicitly re-spread before the Python stage: AQE sizes partitions by
    # JVM bytes, which underestimates Python-side cost per row — a
    # coalesced 1-partition input would starve the executor pool on the
    # chunker. Fan-out is derived from the input size (see
    # _python_stage_partitions), not a fixed multiple of the core count.
    src = documents.select("doc_id", "text")
    return (src.repartition(_python_stage_partitions(src))
            .mapInPandas(chunker, schema=CHUNKS_SCHEMA))


def chunks_to_triples(chunks: DataFrame,
                      cfg: PipelineConfig = DEFAULT_CONFIG) -> DataFrame:
    """Extract triples once per UNIQUE chunk, then join back to all
    (doc_id, chunk_id) occurrences — the reference's extraction-cache
    semantics (ingestMD.py:745-752) done set-wise.

    Returns the ``triples_raw`` table:
        doc_id, chunk_id, subject, predicate, object, subject_type,
        object_type, rel_type, object_kind, start, end, pillar, term,
        count, src_txt
    """
    # dedup then re-spread: extraction cost per row dwarfs JVM bytes, so
    # never let the dedup shuffle's partitioning throttle the Python
    # stage; fan-out derived from input size (_python_stage_partitions)
    sel = chunks.select("chunk_id", "text")
    uniq = (sel.repartition(_python_stage_partitions(sel), "chunk_id")
            .dropDuplicates(["chunk_id"]))

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cols = ["chunk_id", "subject", "predicate", "object", "subject_type",
                "object_type", "rel_type", "object_kind", "start", "end",
                "pillar", "term", "count"]
        for pdf in batches:
            # columnar accumulation — avoids per-row tuple churn in the
            # hottest Python loop of the pipeline
            data = {c: [] for c in cols}
            for chunk_id, text in zip(pdf["chunk_id"], pdf["text"]):
                rows = flatten_triples(extract_chunk_triples(text))
                if not rows:
                    continue
                data["chunk_id"].extend([chunk_id] * len(rows))
                for c in cols[1:]:
                    col_list = data[c]
                    for r in rows:
                        col_list.append(r[c])
            yield pd.DataFrame(data, columns=cols)

    per_chunk = uniq.mapInPandas(extract, schema=TRIPLES_SCHEMA)
    # join back: every (doc, chunk) pair gets the (cached) extraction result
    occurrences = chunks.select("doc_id", "chunk_id", "chunk_idx")
    joined = occurrences.join(per_chunk, "chunk_id", "inner")
    # Materialize the graph-identity columns ONCE here (they are pure
    # functions of the triple row): object-node dispatch + sha256 entity
    # ids. Every downstream branch (nodes/edges/mentions/embeddings) reads
    # them from the persisted table instead of re-hashing per branch.
    obj_label = (
        F.when(F.col("object_kind") == "timeline", F.lit("Time_Period"))
        .when(F.col("object_kind") == "distribution", F.lit("Pillar"))
        .otherwise(F.col("object_type"))
    )
    obj_name = (
        F.when(F.col("object_kind") == "distribution", F.col("pillar"))
        .otherwise(F.col("object"))
    )
    return (
        joined
        .withColumn("obj_label", obj_label)
        .withColumn("obj_name", obj_name)
        .withColumn("src_id", F.sha2(F.concat_ws(":", "subject_type", "subject"), 256))
        .withColumn("dst_id", F.sha2(F.concat_ws(":", "obj_label", "obj_name"), 256))
    )


def run_ingest_stages(pages: DataFrame, cfg: PipelineConfig = DEFAULT_CONFIG):
    """Convenience: pages -> (documents, chunks, triples_raw) DataFrames."""
    documents = pages_to_documents(pages, cfg)
    chunks = documents_to_chunks(documents, cfg)
    triples = chunks_to_triples(chunks, cfg)
    return documents, chunks, triples
