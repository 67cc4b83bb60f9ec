"""Corpus-hygiene INGEST GATES — the dedup operators wired into the write
path as first-class pipeline stages, with committed mergeable state so the
incremental (streaming foreachBatch / --incremental) path gates each batch
in O(delta) instead of re-scanning the corpus.

The stateful gates, all optional and off by default (plus the
stateless PII scrub below and the exact-substring span gate in its own
section):

- cross-document line dedup (``--dedup-lines N``): the CCNet §4.1
  boilerplate pass (operators/dedup.py::dedup_lines_across_docs) applied
  to every document BEFORE chunking/extraction, so nav bars and cookie
  banners never become triples. State = the ``line_postings`` table
  (doc_id, lkey, df), bucket(N, lkey) — the exact shape of the committed
  FTS postings, merged per batch by rewriting only the buckets the
  batch's line hashes fall into.

- near-duplicate resolution (``--resolve-near-dups``): MinHash-LSH ->
  transitive components -> keep-one (operators/dedup.py::
  resolve_near_duplicates) applied to the gated documents, so a
  re-crawled mirror never double-counts in the graph. State = the
  ``doc_signatures`` table (doc_id, band, bh) of SURVIVING documents'
  LSH band hashes, bucket(N, bh); an arriving batch probes only the
  buckets its own band hashes occupy.

Batch-vs-incremental semantics (the honest contract): a corpus-level
gate cannot be exactly order-independent — a line (or near-dup twin)
whose other occurrence arrives in a LATER batch is only visible to the
later batch. Both gates therefore have PREFIX semantics on the
incremental path: each batch is gated against everything ingested so
far, which makes

- a single-batch incremental run from an empty store byte-identical to
  the full batch pipeline (tested),
- every later batch gated exactly as the full run gates it for evidence
  already ingested (tested),
- the only deviation the RETROACTIVE set: early copies committed before
  their duplicates arrived (tested as exactly that set). Re-running the
  batch pipeline over the full corpus is the convergence pass, the same
  way CCNet recomputes per crawl snapshot.

Near-dup survivor choice: the batch resolver keeps the min-id per
cluster; the incremental path keeps the EARLIEST-INGESTED copy (the
committed doc wins over the arriving one) and min-id within a batch.
Re-delivered documents (same doc_id) are never dropped as duplicates of
themselves — idempotency is preserved.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from neo4j_document_pipeline_spark.config import DEFAULT_CONFIG, PipelineConfig
from neo4j_document_pipeline_spark.operators.dedup import (
    doc_lines,
    doc_minhash_signatures,
    remove_lines,
    resolve_near_duplicates,
)
from neo4j_document_pipeline_spark.operators.ingest import finalize_documents
from neo4j_document_pipeline_spark.operators.linking import lsh_blocks

LINE_POSTINGS = "line_postings"
DOC_SIGNATURES = "doc_signatures"


# ---------------------------------------------------------------------------
# PII-redaction gate (stateless — exact parity on every ingest path)
# ---------------------------------------------------------------------------

def apply_pii_redaction(documents: DataFrame,
                        cfg: PipelineConfig = DEFAULT_CONFIG) -> DataFrame:
    """Replace every PII match (email -> ipv4 -> phone, fixed order)
    with its bracket token and re-key the documents over the scrubbed
    text. Pure per-row expressions, no state: the batch, incremental,
    and streaming paths produce byte-identical documents in ANY batch
    order. Runs BEFORE the line/near-dup gates so their state and
    signatures are built over the text that actually lands in the
    store."""
    from neo4j_document_pipeline_spark.functions.textstats import (
        col_redact_pii)
    cand = documents.select(
        "url", "title", "path",
        col_redact_pii(F.col("text")).alias("text"))
    return finalize_documents(cand, cfg)


# ---------------------------------------------------------------------------
# line-dedup gate
# ---------------------------------------------------------------------------

def _with_df(pairs: DataFrame) -> DataFrame:
    """Stamp each distinct (doc_id, lkey) row with its lkey's document
    frequency via groupBy + join, NOT a count window: the aggregate has
    map-side partial combining, so a boilerplate line present in 10^8
    documents contributes one partial count per input partition instead
    of forcing all its rows through a single window task (the classic
    hot-key straggler); the re-join on lkey is skew-splittable by AQE."""
    counts = pairs.groupBy("lkey").agg(F.count("*").alias("df"))
    return pairs.join(counts, "lkey").select("doc_id", "lkey", "df")


def line_postings_from_docs(documents: DataFrame) -> DataFrame:
    """(doc_id, lkey, df) — one row per distinct (document, line-hash),
    df = number of distinct documents containing the line. All postings
    of an lkey share its bucket, so incremental merges recount df exactly
    from the affected buckets alone (same soundness argument as the FTS
    node_tokens index)."""
    pairs = (
        doc_lines(documents, "doc_id", "text")
        .filter(F.col("lkey").isNotNull())
        .select("doc_id", "lkey").distinct()
    )
    return _with_df(pairs)


def line_postings_merge_fn():
    """MERGE for the committed line postings: dedupe (doc_id, lkey) —
    re-delivery of a document is a no-op — and recount each lkey's
    distinct-document frequency over the merged rows."""
    def fn(existing, new):
        allr = new.select("doc_id", "lkey")
        if existing is not None:
            allr = existing.select("doc_id", "lkey").unionByName(allr)
        return _with_df(allr.distinct())
    return fn


def apply_line_dedup(documents: DataFrame, dup_keys: DataFrame,
                     cfg: PipelineConfig = DEFAULT_CONFIG) -> DataFrame:
    """Strip ``dup_keys`` lines from every document and re-key through
    finalize_documents (text changed => doc_id changes; cleaned texts
    that collide collapse into one document, first url wins)."""
    cleaned = remove_lines(documents, dup_keys, "doc_id", "text")
    cand = (documents.drop("text")
            .join(cleaned.select("doc_id",
                                 F.col("text_clean").alias("text")),
                  "doc_id")
            .select("url", "title", "path", "text"))
    return finalize_documents(cand, cfg)


def gate_lines_increment(store, documents: DataFrame, min_doc_freq: int,
                         cfg: PipelineConfig = DEFAULT_CONFIG) -> DataFrame:
    """Incremental line-dedup gate: the batch's lines are counted TOGETHER
    with the committed postings restricted to the batch's own lkeys
    (read_matching — O(affected buckets) on a bucketed state table), and
    lines whose combined distinct-doc count reaches ``min_doc_freq`` are
    stripped from the batch. Returns the gated, re-keyed documents frame.
    The caller merges the batch's postings delta afterwards (postings
    record the RAW pre-clean lines, matching the batch pipeline)."""
    if min_doc_freq < 1:
        raise ValueError(f"min_doc_freq must be >= 1, got {min_doc_freq}")
    pairs = (doc_lines(documents, "doc_id", "text")
             .filter(F.col("lkey").isNotNull())
             .select("doc_id", "lkey").distinct())
    committed = store.read_matching(LINE_POSTINGS,
                                    pairs.select("lkey"), "lkey")
    if committed is not None:
        pairs = pairs.unionByName(
            committed.select("doc_id", "lkey")).distinct()
    dup_keys = (pairs.groupBy("lkey").agg(F.count("*").alias("ndocs"))
                .filter(F.col("ndocs") >= min_doc_freq).select("lkey"))
    return apply_line_dedup(documents, dup_keys, cfg)


def merge_line_postings(store, raw_documents: DataFrame, cfg: PipelineConfig,
                        *, stage: str, input_fingerprint: str,
                        min_doc_freq: int | None = None) -> None:
    """Commit the batch's line-postings delta into the state table —
    bucket-scoped MERGE when the table exists with the bucket(N, lkey)
    layout; first write creates it bucketed. ``raw_documents`` must be
    the PRE-clean batch (state counts raw lines, like the full pass).
    ``min_doc_freq`` is stamped into the manifest metrics so reporting
    (CLI hygiene) knows which threshold the store was gated with."""
    delta = line_postings_from_docs(raw_documents)
    extra = {"min_doc_freq": min_doc_freq} if min_doc_freq else {}
    man = store.manifest(LINE_POSTINGS)
    if man is not None and man.get("bucket_by") == "lkey":
        store.merge_write(LINE_POSTINGS, delta, line_postings_merge_fn(),
                          stage=stage, input_fingerprint=input_fingerprint,
                          extra_metrics=extra)
    else:
        store.write_bucketed(LINE_POSTINGS, delta, bucket_by="lkey",
                             n_buckets=cfg.fts_index_buckets or 8, stage=stage,
                             input_fingerprint=input_fingerprint,
                             extra_metrics=extra)


# ---------------------------------------------------------------------------
# exact-substring span gate
# ---------------------------------------------------------------------------

GRAM_POSTINGS = "gram_postings"


def gram_postings_from_docs(documents: DataFrame, *, k: int,
                            kept: bool) -> DataFrame:
    """(doc_id, url, gkey, n, kept) — every document's token k-gram keys
    with their per-document occurrence counts, the committed lookup
    table the span gate probes. Bucketed by gkey: an arriving batch
    recounts a gram's corpus total from the buckets its own keys hash
    into (the line_postings soundness argument).

    The state holds TWO row kinds, and both are required (unlike the
    line gate, whose remove-ALL-copies rule needs only raw counts):

    - ``kept=false`` (RAW): postings of the PRE-cut batch — the
      occurrence evidence thresholds count. Raw-only state would break
      survivor re-delivery (the re-delivered keeper matches the ghost
      grams of the copies cut because of it and loses its own text);
      kept-only state would under-gate any ``min_count > 2`` (the cut
      collapses committed evidence to one copy, which can never reach
      ``min_count - 1`` again).
    - ``kept=true``: postings of the FINAL gated documents (post-cut,
      post near-dup) — what the store actually holds; a gram with a
      committed kept copy already has its corpus survivor, so every
      arriving occurrence is cut.

    ``url`` rides along as the CUT-STABLE identity: a re-delivered page
    whose committed form was cut has a different doc_id than its raw
    form (doc ids are content hashes), so the gate's own-batch
    exclusion matches on doc_id OR url. Raw rows carry every input
    page's own url (pre-cut texts are distinct wherever the pages
    are), so the exclusion keeps full fidelity even when cut results
    later collapse in finalize_documents."""
    from neo4j_document_pipeline_spark.operators.dedup import (
        _span_gram_postings)
    posts = (_span_gram_postings(documents, "doc_id", "text", k)
             .groupBy(F.col("id").alias("doc_id"), "gkey")
             .agg(F.count("*").alias("n")))
    return (posts.join(documents.select("doc_id", "url"), "doc_id")
            .withColumn("kept", F.lit(bool(kept))))


def gram_postings_merge_fn():
    """MERGE for the committed gram postings: re-delivery of a document
    (same doc_id => same text => same per-doc counts) is a no-op."""
    def fn(existing, new):
        cols = ["doc_id", "url", "gkey", "n", "kept"]
        allr = new.select(*cols)
        if existing is not None:
            allr = existing.select(*cols).unionByName(allr)
        return allr.dropDuplicates(["doc_id", "gkey", "kept"])
    return fn


def _cut_spans(documents: DataFrame, spans: DataFrame,
               cfg: PipelineConfig = DEFAULT_CONFIG) -> DataFrame:
    """Cut the flagged token spans out of the ORIGINAL text (lossless
    outside the cut — unlike strip_duplicate_spans, which returns the
    normalized stream) and re-key through finalize_documents.

    Per flagged document, an Arrow-batched pass re-finds the token char
    offsets (``[a-z0-9]+`` over ``text.lower()`` — the same sequence the
    JVM-side detection tokenized) and removes each span's char range
    plus the whitespace run immediately before it (after it when the
    span starts the document), so "a SPAN b" collapses to "a b" with no
    doubled separator. In the pathological Unicode case where
    ``lower()`` changes the string LENGTH (e.g. U+0130) the offsets
    cannot be trusted and the document is left uncut. Only flagged
    documents enter the Python pass; everything else stays JVM-side."""
    from typing import Iterator

    import pandas as pd

    cut_list = spans.groupBy(F.col("doc_id")).agg(
        F.array_sort(F.collect_list(
            F.struct("span_start", "span_end"))).alias("_spans"))
    flagged = (documents.join(cut_list, "doc_id")
               .select("doc_id", "url", "title", "path", "text", "_spans"))

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import re
        tok_re = re.compile(r"[a-z0-9]+")
        for pdf in batches:
            out = []
            for text, sp in zip(pdf["text"], pdf["_spans"]):
                lt = (text or "").lower()
                if len(lt) != len(text or ""):
                    out.append(text)
                    continue
                toks = list(tok_re.finditer(lt))
                ranges = []
                for s in sp:
                    s0, e0 = int(s["span_start"]), int(s["span_end"])
                    if s0 < 1 or e0 > len(toks):
                        continue
                    cs, ce = toks[s0 - 1].start(), toks[e0 - 1].end()
                    # absorb the preceding whitespace run (following
                    # when the span opens the document)
                    if cs > 0:
                        while cs > 0 and text[cs - 1].isspace():
                            cs -= 1
                    else:
                        while ce < len(text) and text[ce].isspace():
                            ce += 1
                    ranges.append((cs, ce))
                kept, prev = [], 0
                for cs, ce in sorted(ranges):
                    kept.append(text[prev:cs])
                    prev = max(prev, ce)
                kept.append(text[prev:])
                out.append("".join(kept))
            yield pd.DataFrame({
                "url": pdf["url"], "title": pdf["title"],
                "path": pdf["path"], "text": out})

    cleaned = flagged.mapInPandas(
        gen, schema="url string, title string, path string, text string")
    untouched = (documents.join(cut_list.select("doc_id"), "doc_id",
                                "left_anti")
                 .select("url", "title", "path", "text"))
    return finalize_documents(untouched.unionByName(cleaned), cfg)


def gate_spans_batch(documents: DataFrame,
                     cfg: PipelineConfig = DEFAULT_CONFIG, *,
                     k: int, min_count: int = 2) -> DataFrame:
    """Batch span gate: exactly ``duplicate_spans(keep='first')`` — the
    Lee et al. keep-one policy (every occurrence of a >= ``min_count``
    gram flags except its corpus-minimal (doc_id, pos) copy) — with the
    spans cut from the original text and the documents re-keyed.
    Delegating to the analytics operator keeps ONE implementation of
    the policy and its argument validation (a bad span_k must fail the
    same way on the batch and incremental paths)."""
    from neo4j_document_pipeline_spark.operators.dedup import (
        duplicate_spans)
    spans = duplicate_spans(documents, "doc_id", "text", k=k,
                            min_count=min_count, keep="first")
    return _cut_spans(documents, spans, cfg)


def gate_spans_increment(store, documents: DataFrame, *,
                         k: int, min_count: int,
                         cfg: PipelineConfig = DEFAULT_CONFIG) -> DataFrame:
    """Incremental span gate, O(delta + affected buckets):

    1. the batch's gram keys probe the committed gram_postings buckets
       (read_matching on gkey) — EXCLUDING rows whose doc_id OR url is
       in the batch itself (same id => same text, same url => same
       page: a re-delivered document must not match its own committed
       grams and cut itself — the near-dup gate's self-match-immunity
       rule, extended to the cut-rewritten form);
    2. a gram is duplicated when batch occurrences plus committed RAW
       occurrences (kept=false rows — the full evidence, not just the
       surviving copy) reach ``min_count``;
    3. keep-one survivor rule, committed copy wins: when a gram has a
       committed KEPT occurrence (kept=true rows — the store already
       holds its survivor) every batch occurrence is flagged; when it
       does not, the batch-minimal (doc_id, pos) copy survives (the
       within-batch keep-first);
    4. flagged positions merge to spans and cut exactly like the batch
       gate. PREFIX semantics: committed early copies keep their spans
       (the retroactive set — see the module docstring contract)."""
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    if min_count < 2:
        raise ValueError(f"min_count must be >= 2, got {min_count}")
    _check_span_k(store, k)
    from neo4j_document_pipeline_spark.operators.dedup import (
        _span_gram_postings, spans_from_flagged)
    post = _span_gram_postings(documents, "doc_id", "text", k) \
        .localCheckpoint()
    batch_counts = post.groupBy("gkey").agg(
        F.count("*").alias("_bn"),
        F.min(F.struct("id", "pos")).alias("_first"))
    committed = store.read_matching(GRAM_POSTINGS,
                                    post.select("gkey"), "gkey")
    if committed is not None:
        # own-batch exclusion on BOTH identities: doc_id catches the
        # identical-text re-delivery, url catches the re-delivered page
        # whose committed form was CUT (content hash changed, page
        # identity did not)
        committed = (committed
                     .join(documents.select("doc_id"), "doc_id",
                           "left_anti")
                     .join(documents.select("url"), "url", "left_anti"))
        ccounts = committed.groupBy("gkey").agg(
            F.sum(F.when(~F.col("kept"), F.col("n"))
                  .otherwise(F.lit(0))).alias("_cn_raw"),
            F.sum(F.when(F.col("kept"), F.col("n"))
                  .otherwise(F.lit(0))).alias("_cn_kept"))
        batch_counts = (batch_counts.join(ccounts, "gkey", "left")
                        .withColumn("_cn_raw",
                                    F.coalesce(F.col("_cn_raw"), F.lit(0)))
                        .withColumn("_cn_kept",
                                    F.coalesce(F.col("_cn_kept"),
                                               F.lit(0))))
    else:
        batch_counts = (batch_counts
                        .withColumn("_cn_raw", F.lit(0))
                        .withColumn("_cn_kept", F.lit(0)))
    dup = batch_counts.filter(
        F.col("_bn") + F.col("_cn_raw") >= min_count)
    flagged = (post.join(dup, "gkey")
               .filter((F.col("_cn_kept") > 0)
                       | ~((F.col("id") == F.col("_first.id"))
                           & (F.col("pos") == F.col("_first.pos"))))
               .select("id", "pos"))
    spans = spans_from_flagged(flagged, k, id_alias="doc_id")
    return _cut_spans(documents, spans, cfg)


def _check_span_k(store, k: int) -> None:
    """span_k changes the gram KEY SPACE (k-gram sha256 heads): probing
    or merging a table stamped with a different k would silently match
    nothing and pollute the counts — fail loudly instead. (min_count is
    a read-time threshold and may change freely, like the line gate's
    min_doc_freq.)"""
    man = store.manifest(GRAM_POSTINGS)
    committed_k = ((man or {}).get("metrics") or {}).get("span_k")
    if committed_k is not None and int(committed_k) != int(k):
        raise ValueError(
            f"span_k={k} does not match the committed gram_postings "
            f"state (span_k={committed_k}); re-ingest from scratch to "
            "change the gram length")


def merge_gram_postings(store, raw_documents: DataFrame,
                        survivors: DataFrame,
                        cfg: PipelineConfig, *, stage: str,
                        input_fingerprint: str, k: int,
                        min_count: int | None = None) -> None:
    """Commit the batch's gram-postings delta (bucket-scoped MERGE /
    bucketed first write): kept=false rows from ``raw_documents`` (the
    PRE-cut batch — the occurrence evidence) plus kept=true rows from
    ``survivors`` (the batch's FINAL gated documents — what the store
    holds). See gram_postings_from_docs for why BOTH kinds are needed.
    Raises if ``k`` disagrees with the committed state's stamped
    span_k (disjoint key spaces). span_k and span_min_count land in
    the manifest metrics for reporting."""
    _check_span_k(store, k)
    delta = gram_postings_from_docs(raw_documents, k=k, kept=False) \
        .unionByName(gram_postings_from_docs(survivors, k=k, kept=True))
    extra = {"span_k": k}
    if min_count is not None:
        extra["span_min_count"] = min_count
    man = store.manifest(GRAM_POSTINGS)
    if man is not None and man.get("bucket_by") == "gkey":
        store.merge_write(GRAM_POSTINGS, delta, gram_postings_merge_fn(),
                          stage=stage, input_fingerprint=input_fingerprint,
                          extra_metrics=extra)
    else:
        store.write_bucketed(GRAM_POSTINGS, delta, bucket_by="gkey",
                             n_buckets=cfg.fts_index_buckets or 8, stage=stage,
                             input_fingerprint=input_fingerprint,
                             extra_metrics=extra)


# ---------------------------------------------------------------------------
# near-dup gate
# ---------------------------------------------------------------------------

def doc_signatures_from_docs(documents: DataFrame,
                             cfg: PipelineConfig = DEFAULT_CONFIG,
                             sigs: DataFrame | None = None) -> DataFrame:
    """(doc_id, band, bh) — every document's LSH band hashes, the
    committed lookup table an arriving batch probes for committed
    near-dup candidates. Bucketed by bh: a batch's probe touches only
    the buckets its own band hashes occupy. ``sigs``: precomputed
    signatures (possibly of a superset — restricted to ``documents``'
    ids here) so the Arrow shingling pass runs once per batch."""
    if sigs is None:
        sigs = doc_minhash_signatures(documents, "doc_id", "text", cfg)
    else:
        sigs = sigs.join(documents.select(F.col("doc_id").alias("id")),
                         "id", "left_semi")
    return (lsh_blocks(sigs, cfg)
            .select(F.col("id").alias("doc_id"), "band", "bh").distinct())


def doc_signatures_merge_fn():
    def fn(existing, new):
        allr = new.select("doc_id", "band", "bh")
        if existing is not None:
            allr = existing.select("doc_id", "band", "bh").unionByName(allr)
        return allr.distinct()
    return fn


def gate_near_dups_batch(documents: DataFrame,
                         cfg: PipelineConfig = DEFAULT_CONFIG,
                         threshold: float = 0.8,
                         sigs: DataFrame | None = None) -> DataFrame:
    """Batch near-dup gate: transitive resolution over the whole frame,
    min-doc_id survivor per cluster. ``sigs``: precomputed signatures
    of a SUPERSET of ``documents`` — restricted to its ids before
    resolving (pairs against already-dropped ghosts would elect absent
    keepers)."""
    if sigs is not None:
        sigs = sigs.join(documents.select(F.col("doc_id").alias("id")),
                         "id", "left_semi")
    losers = (resolve_near_duplicates(documents, "doc_id", "text", cfg,
                                      jaccard_threshold=threshold,
                                      sigs=sigs)
              .filter(~F.col("is_kept")).select("doc_id"))
    return documents.join(losers, "doc_id", "left_anti")


def gate_near_dups_increment(store, documents: DataFrame,
                             cfg: PipelineConfig = DEFAULT_CONFIG,
                             threshold: float = 0.8
                             ) -> tuple[DataFrame, DataFrame]:
    """Incremental near-dup gate, O(delta + candidates):

    1. batch LSH band hashes probe the committed doc_signatures buckets
       (read_matching on bh) -> candidate (new, committed) pairs;
    2. committed candidates' texts are fetched by doc_id (read_matching
       on documents_final — bucket-pruned on a bucketed store), their
       shingles recomputed, and pairs verified with exact Jaccard;
    3. verified arrivals drop (the committed copy wins — earliest-
       ingested survivor); a re-delivered doc_id never matches itself;
    4. survivors resolve WITHIN the batch (min-id per cluster).

    Returns (gated documents, the batch's signature frame) — the
    signatures are computed ONCE here and reused for the committed-
    candidate verify, the within-batch resolution, and the caller's
    merge_doc_signatures."""
    sigs = doc_minhash_signatures(documents, "doc_id", "text", cfg) \
        .localCheckpoint()
    blocks = lsh_blocks(sigs, cfg)  # (band, bh, id)
    committed = store.read_matching(DOC_SIGNATURES,
                                    blocks.select("bh"), "bh")
    if committed is not None:
        cand = (blocks.join(committed, ["band", "bh"])
                .filter(F.col("doc_id") != F.col("id"))
                .select(F.col("id").alias("new_id"),
                        F.col("doc_id").alias("old_id"))
                .distinct())
        old_docs = store.read_matching(
            "documents_final",
            cand.select(F.col("old_id").alias("doc_id")), "doc_id")
        if old_docs is not None:
            old_sh = (doc_minhash_signatures(
                old_docs.select("doc_id", "text"), "doc_id", "text", cfg)
                .select(F.col("id").alias("old_id"),
                        F.col("shingles").alias("sh2")))
            new_sh = sigs.select(F.col("id").alias("new_id"),
                                 F.col("shingles").alias("sh1"))
            inter = F.size(F.array_intersect("sh1", "sh2"))
            union = F.size(F.array_union("sh1", "sh2"))
            dropped = (cand.join(new_sh, "new_id").join(old_sh, "old_id")
                       .withColumn("j", F.when(union > 0, inter / union)
                                   .otherwise(F.lit(0.0)))
                       .filter(F.col("j") >= threshold)
                       .select(F.col("new_id").alias("doc_id")).distinct())
            documents = documents.join(dropped, "doc_id", "left_anti")
    return gate_near_dups_batch(documents, cfg, threshold, sigs=sigs), sigs


def merge_doc_signatures(store, survivors: DataFrame, cfg: PipelineConfig,
                         *, stage: str, input_fingerprint: str,
                         sigs: DataFrame | None = None) -> None:
    """Commit the surviving batch documents' LSH signatures into the
    state table (bucket-scoped MERGE / bucketed first write)."""
    delta = doc_signatures_from_docs(survivors, cfg, sigs=sigs)
    man = store.manifest(DOC_SIGNATURES)
    if man is not None and man.get("bucket_by") == "bh":
        store.merge_write(DOC_SIGNATURES, delta, doc_signatures_merge_fn(),
                          stage=stage, input_fingerprint=input_fingerprint)
    else:
        store.write_bucketed(DOC_SIGNATURES, delta, bucket_by="bh",
                             n_buckets=cfg.fts_index_buckets or 8, stage=stage,
                             input_fingerprint=input_fingerprint)
