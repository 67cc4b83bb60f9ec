"""CLI — the library-function replacements of the reference's HTTP
endpoints (/root/reference/main.py), runnable via spark-submit --py-files
or plain python:

    python -m neo4j_document_pipeline_spark ingest --pages <parquet|synth:N> --store <dir>
    python -m neo4j_document_pipeline_spark query  --store <dir> "question..." [--hops 2]
    python -m neo4j_document_pipeline_spark stats  --store <dir>        # /graph/stats
    python -m neo4j_document_pipeline_spark schema --store <dir>        # /graph/schema
    python -m neo4j_document_pipeline_spark search --store <dir> VALUE  # /graph/search
    python -m neo4j_document_pipeline_spark docs   --store <dir>        # /documents
    python -m neo4j_document_pipeline_spark drop   --store <dir>        # /drop-all
    python -m neo4j_document_pipeline_spark status --store <dir> [JOB]  # /queue_stats, /ingest/status
    python -m neo4j_document_pipeline_spark history --store <dir> TABLE # snapshot log
    python -m neo4j_document_pipeline_spark compact --store <dir> TABLE # OPTIMIZE small files
    python -m neo4j_document_pipeline_spark stream --store <dir> --pages <parquet-dir>  # drain new files (availableNow)
    python -m neo4j_document_pipeline_spark pagerank --store <dir> [--iters N --limit K]  # entity importance
    python -m neo4j_document_pipeline_spark hits --store <dir> [--iters N]  # hubs vs authorities (directed)
    python -m neo4j_document_pipeline_spark triangles --store <dir>     # KG clustering signal
    python -m neo4j_document_pipeline_spark similar --store <dir> [--min-sim J --sim-topk K]  # duplicate-entity candidates
    python -m neo4j_document_pipeline_spark entity-groups --store <dir> [--min-sim J]  # similarity -> components clusters
    python -m neo4j_document_pipeline_spark communities --store <dir> [--iters N]  # label-propagation topic clusters
    python -m neo4j_document_pipeline_spark collocations --store <dir> [--min-count N]  # NPMI entity association
    python -m neo4j_document_pipeline_spark suggest --store <dir> [--min-count N]  # missing-edge candidates (KG completion)
    python -m neo4j_document_pipeline_spark reach --store <dir> --seeds NAME[,NAME] [--hops N --weighted]  # BFS / weighted proximity
    python -m neo4j_document_pipeline_spark kcore --store <dir> [--k N]  # dense-nucleus entities
    python -m neo4j_document_pipeline_spark export --store <dir> --out <dir>  # neo4j-admin bulk-import CSVs
    python -m neo4j_document_pipeline_spark sample --store <dir> --rate 0.25 [--salt v1]  # reproducible doc sample
    python -m neo4j_document_pipeline_spark shards --store <dir> [--budget 4096]  # token-budget shard packing plan
    python -m neo4j_document_pipeline_spark docsearch <terms...> --store <dir> [--top-k 10]  # BM25 document retrieval
    python -m neo4j_document_pipeline_spark prepare --store <dir> --out <dir> [--bench <parquet> --decontam-n 13] [--rate R | --rates k=v,..] [--budget 4096]  # decontam -> sample -> shard export + manifest
    python -m neo4j_document_pipeline_spark attribution --store <dir> --events <parquet-dir> [--max-delay "10 minutes"] [--streaming --out <dir>]  # click<-view interval join
    python -m neo4j_document_pipeline_spark dedup-stream --store <dir> --events <parquet-dir> [--watermark "1 hour"] [--streaming --out <dir>]  # exactly-once event delivery
    python -m neo4j_document_pipeline_spark hygiene --store <dir> [--near-dups --dup-spans]  # corpus-quality report (size/langs/quality/repetition/PII[/near-dups/spans])
    python -m neo4j_document_pipeline_spark spans --store <dir> [--span-k 8 --span-min-count 2]  # exact-substring duplicated-region report (Lee et al. 2022)
    python -m neo4j_document_pipeline_spark semdedup --store <dir> [--clusters 16 --sem-threshold 0.95]  # semantically-duplicate entities (SemDeDup over node embeddings)
    python -m neo4j_document_pipeline_spark summary --store <dir>       # one-row graph profile (degrees/density/assortativity)
    python -m neo4j_document_pipeline_spark conductance --store <dir> [--iters N]  # how leaky each LPA community is
    python -m neo4j_document_pipeline_spark truss --store <dir> --k 4   # cohesive edge nucleus (k-truss)
    python -m neo4j_document_pipeline_spark scc --store <dir>           # directed strongly connected components (bow-tie nuclei)
    python -m neo4j_document_pipeline_spark walks --store <dir> [--walk-len N --walks-per-node N --out <dir>]  # deterministic walk corpus (DeepWalk input)
    python -m neo4j_document_pipeline_spark mixture --store <dir> [--alpha 0.5 --train-budget N]  # per-domain pretraining mixture weights
    python -m neo4j_document_pipeline_spark betweenness --store <dir> [--pivots 64 --max-depth 12]  # shortest-path broker entities (Brandes-Pich)
    python -m neo4j_document_pipeline_spark closure --store <dir> [--rel TYPE]  # transitive reachability census (rdfs11-style)
    python -m neo4j_document_pipeline_spark transitions --events <parquet-dir>  # first-order Markov event-transition census
    python -m neo4j_document_pipeline_spark partition --store <dir> [--parts 8 --iters N --levels L]  # balanced k-way graph partitioning (optionally multilevel) + edge-cut evidence
    python -m neo4j_document_pipeline_spark neighborhoods --store <dir> --seeds "Name1,Name2" [--fanouts 5,5]  # deterministic GraphSAGE computation graphs
    python -m neo4j_document_pipeline_spark drift --store <dir> documents lang [v_old v_new]  # PSI distribution drift between snapshots
"""

from __future__ import annotations

import argparse
import json
import os
import sys


def _cfg_from_args(ns):
    """One PipelineConfig for every command that ingests (ingest full +
    incremental, stream) — a flag honored on one path but silently
    dropped on another is destructive: a stream drain under the default
    config would rebuild a --ann-per-label store's index as global."""
    import dataclasses

    from neo4j_document_pipeline_spark.config import DEFAULT_CONFIG
    cfg = DEFAULT_CONFIG
    if ns.buckets:
        cfg = dataclasses.replace(cfg, store_buckets=ns.buckets)
    if ns.ann_per_label:
        cfg = dataclasses.replace(cfg, ann_per_label=True)
    return cfg


def _kg_edges(store, weighted=False):
    """The committed KG edge list projected to the (u, v[, w]) shape the
    graph-analytics operators take; ``weighted`` attaches the supporting-
    document count (size of the accumulated sources set) as edge weight —
    an edge asserted by 40 documents should pull 40x the rank of a
    single-mention one."""
    from pyspark.sql import functions as F
    e = store.read("edges")
    cols = [F.col("src_id").alias("u"), F.col("dst_id").alias("v")]
    if weighted:
        cols.append(F.greatest(F.size("sources"), F.lit(1))
                    .cast("double").alias("w"))
    return e.select(*cols)


def _resolve_seed_ids(store, names):
    """Map user-facing entity names to node ids for personalized
    pagerank (ids are content hashes, not typeable). Normalized-name
    match, same normalization the MERGE key uses."""
    from pyspark.sql import functions as F

    from neo4j_document_pipeline_spark.functions.text import (
        col_normalize_name_for_key, py_normalize_name_for_key)
    want = sorted({py_normalize_name_for_key(n) for n in names} - {""})
    rows = (store.read("nodes")
            .filter(col_normalize_name_for_key(F.col("name"))
                    .isin(want))
            .select("entity_id").collect())
    return [r["entity_id"] for r in rows]


def _int_or_none(s):
    """argparse type for bounded-by-default knobs with a 'none' escape
    hatch (--max-ctx none disables the collocations boilerplate cutoff;
    --max-degree none makes suggest exact). 0 / negatives are rejected
    loudly — they would silently empty the result (every degree and
    context size is >= 1), which is never what a typo meant."""
    import argparse
    if isinstance(s, str) and s.strip().lower() in ("none", "off", ""):
        return None
    v = int(s)
    if v < 1:
        raise argparse.ArgumentTypeError(
            f"expected a positive bound or 'none', got {v}")
    return v


def main(argv=None):
    ap = argparse.ArgumentParser(prog="neo4j_document_pipeline_spark")
    ap.add_argument("command", choices=[
        "ingest", "query", "stats", "schema", "search", "docs", "drop",
        "status", "history", "compact", "stream", "vacuum",
        "pagerank", "hits", "triangles", "similar", "entity-groups",
        "communities", "collocations", "suggest", "reach",
        "kcore", "export", "sample", "shards", "prepare", "docsearch",
        "attribution",
        "dedup-stream", "hygiene", "funnel", "retention",
        "clustering", "harmonic", "summary", "conductance", "truss",
        "walks", "mixture", "spans", "semdedup", "scc",
        "cardinality", "negatives", "bpe", "diff", "split",
        "betweenness", "closure", "transitions", "partition",
        "neighborhoods", "drift"])
    ap.add_argument("args", nargs="*")
    ap.add_argument("--store", required=True)
    ap.add_argument("--pages", default=None,
                    help="parquet dir of pages, or synth:N")
    ap.add_argument("--master", default=None)
    ap.add_argument("--top-k", type=int, default=10)
    ap.add_argument("--hops", type=int, default=1)
    ap.add_argument("--alpha-vec", type=float, default=0.6)
    ap.add_argument("--beta-kw", type=float, default=0.4)
    ap.add_argument("--no-mmr", action="store_true")
    ap.add_argument("--no-cross-doc", action="store_true")
    ap.add_argument("--canonicalize", action="store_true")
    ap.add_argument("--text-source", default="text",
                    choices=["text", "html", "auto"],
                    help="ingest text from the text column (default), "
                         "extract from the html binary, or auto-fallback")
    ap.add_argument("--langs", default=None,
                    help="comma-separated lang codes to ingest (default all)")
    ap.add_argument("--buckets", type=int, default=0,
                    help="bucket(N, key) layout for nodes/edges/mentions "
                         "(shuffle-free read-path joins); 0 = plain parquet")
    ap.add_argument("--checkpoint", default=None,
                    help="stream checkpoint dir (default "
                         "<store>/_stream_checkpoint)")
    ap.add_argument("--max-files-per-trigger", type=int, default=64,
                    help="stream micro-batch size in files; raise for "
                         "large backfills (each batch MERGE-rewrites the "
                         "graph tables)")
    ap.add_argument("--keep-versions", type=int, default=1,
                    help="snapshots retained per table (time-travel "
                         "window); 1 = only the live version")
    ap.add_argument("--redact-pii", action="store_true",
                    help="ingest gate: scrub emails/IPs/phone numbers to "
                         "bracket tokens before anything else (stateless; "
                         "byte-identical on batch, incremental, and "
                         "stream paths)")
    ap.add_argument("--dedup-lines", type=int, default=None,
                    help="ingest gate: strip lines appearing in >= N "
                         "distinct documents (CCNet cross-doc line dedup) "
                         "before chunking/extraction; commits the "
                         "line_postings state table so incremental batches "
                         "gate in O(delta). Default off")
    ap.add_argument("--strip-spans", action="store_true",
                    help="ingest gate: cut corpus-duplicated token runs "
                         "of >= --span-k tokens occurring >= "
                         "--span-min-count times (Lee et al. 2022 "
                         "exact-substring dedup, keep-one survivor); "
                         "commits the gram_postings state table so "
                         "incremental batches gate in O(delta)")
    ap.add_argument("--resolve-near-dups", action="store_true",
                    help="ingest gate: drop near-duplicate documents "
                         "(MinHash-LSH -> transitive clusters -> keep one) "
                         "before chunking; commits the doc_signatures "
                         "state table for O(delta) incremental gating")
    ap.add_argument("--near-dup-threshold", type=float, default=0.8,
                    help="exact-Jaccard threshold for --resolve-near-dups "
                         "(default 0.8)")
    ap.add_argument("--min-quality", type=float, default=None,
                    help="drop pages below this [0,1] heuristic quality "
                         "score before extraction")
    ap.add_argument("--ann-per-label", action="store_true",
                    help="train one ANN coarse quantizer PER LABEL (the "
                         "reference's one-vector-index-per-label); labeled "
                         "queries then probe only their labels' cells. "
                         "Default: one global quantizer with a label-aware "
                         "probe floor")
    ap.add_argument("--incremental", action="store_true",
                    help="MERGE this batch into the existing store instead "
                         "of recomputing staged tables (delta ingest)")
    ap.add_argument("--since-ts", default=None,
                    help="only ingest pages with warc_ts after this ISO "
                         "timestamp; 'auto' = the store's last committed "
                         "max_warc_ts (implies --incremental)")
    ap.add_argument("--label", default=None)
    ap.add_argument("--limit", type=int, default=25)
    ap.add_argument("--iters", type=int, default=10,
                    help="pagerank/hits power-method iterations / "
                         "communities label-propagation rounds")
    ap.add_argument("--weighted", action="store_true",
                    help="pagerank/similar/entity-groups/communities/"
                         "reach: weight edges by their supporting-"
                         "document count (size of the sources set; "
                         "reach uses 1/count as edge length)")
    ap.add_argument("--seeds", default=None,
                    help="pagerank/reach: comma-separated entity NAMES — "
                         "pagerank restricts teleport to them "
                         "(personalized); reach walks outward from them")
    ap.add_argument("--parts", type=int, default=8,
                    help="partition: number of balanced partitions "
                         "(default 8)")
    ap.add_argument("--levels", type=int, default=0,
                    help="partition: multilevel coarsening levels "
                         "(0 = flat Spinner rounds; N>0 = METIS-style "
                         "match/contract N times, partition the coarse "
                         "graph, project back and refine)")
    ap.add_argument("--fanouts", default="5,5",
                    help="neighborhoods: comma-separated per-hop "
                         "fanouts (default 5,5)")
    ap.add_argument("--min-sim", type=float, default=0.1,
                    help="similar: drop pairs below this Jaccard")
    ap.add_argument("--sim-topk", type=int, default=None,
                    help="similar: keep each entity's k best partners "
                         "before the global --limit")
    ap.add_argument("--k", type=int, default=None,
                    help="kcore: minimum surviving degree (default 2) "
                         "/ truss: minimum triangles per surviving "
                         "edge + 2 (>= 3, default 3)")
    ap.add_argument("--walk-len", type=int, default=10,
                    help="walks: steps per walk (default 10)")
    ap.add_argument("--walks-per-node", type=int, default=2,
                    help="walks: walks started from each entity "
                         "(default 2)")
    ap.add_argument("--alpha", type=float, default=0.5,
                    help="mixture: sampling temperature — weight ∝ "
                         "tokens^alpha (1 = natural mix, lower "
                         "flattens toward uniform; default 0.5)")
    ap.add_argument("--train-budget", type=int, default=None,
                    help="mixture: total training-token budget; adds "
                         "the implied epochs-per-source column "
                         "(epochs > 1 flags repetition risk)")
    ap.add_argument("--min-count", type=int, default=2,
                    help="collocations: keep pairs co-occurring in at "
                         "least this many documents / suggest: require "
                         "at least this many shared neighbors")
    ap.add_argument("--max-ctx", type=_int_or_none, default=256,
                    help="collocations: ignore documents mentioning "
                         "more than this many entities (boilerplate "
                         "cutoff; one unbounded 10k-entity document "
                         "alone contributes ~5e7 pairs). Default 256; "
                         "pass 'none' to disable")
    ap.add_argument("--max-degree", type=_int_or_none, default=1000,
                    help="suggest: drop wedge centers above this degree "
                         "before the candidate self-join (ultra-hubs "
                         "carry ~0 Adamic-Adar signal but C(d,2) cost). "
                         "Default 1000; pass 'none' to disable")
    ap.add_argument("--rate", type=float, default=None,
                    help="sample: uniform keep probability, default "
                         "0.1 (ignored when --rates is given); "
                         "prepare: optional — omit to keep every "
                         "document")
    ap.add_argument("--rates", default=None,
                    help="sample: per-stratum rates as "
                         "VALUE=RATE[,VALUE=RATE...] over --strata-col "
                         "(e.g. --strata-col source --rates web=0.2)")
    ap.add_argument("--strata-col", default="source",
                    help="sample: documents column the --rates keys "
                         "match against")
    ap.add_argument("--default-rate", type=float, default=0.0,
                    help="sample: rate for strata absent from --rates "
                         "(default 0 = drop, the loud default)")
    ap.add_argument("--salt", default="v1",
                    help="sample: change to draw an independent sample "
                         "(train vs holdout)")
    ap.add_argument("--pivots", type=_int_or_none, default=64,
                    help="betweenness: number of deterministic pivot "
                         "sources (Brandes-Pich estimator); 'none' = "
                         "exact all-sources (quadratic — small KGs only)")
    ap.add_argument("--max-depth", type=int, default=12,
                    help="betweenness: BFS level cap (raises loudly if "
                         "the graph needs more)")
    ap.add_argument("--rel", default=None,
                    help="closure: restrict to one rel_type (default: "
                         "all edges)")
    ap.add_argument("--budget", type=int, default=4096,
                    help="shards/prepare: target tokens per shard")
    ap.add_argument("--track-sketches", action="store_true",
                    help="ingest/stream: maintain the bounded mergeable "
                         "corpus sketches (cms tokens / kmv vocab / "
                         "bloom doc-ids) as O(batch) state")
    ap.add_argument("--bench", default=None,
                    help="prepare: parquet path of benchmark documents "
                         "(text column) to decontaminate against")
    ap.add_argument("--c4", action="store_true",
                    help="prepare: apply the C4 page/line quality rules "
                         "(Raffel et al. 2019 §2.2) before sampling — "
                         "drops failing pages and exports the line-"
                         "filtered text")
    ap.add_argument("--interleave", default=None,
                    help="prepare: weighted-round-robin training order "
                         "as VALUE=WEIGHT[,VALUE=WEIGHT...] over "
                         "--strata-col (e.g. --strata-col lang "
                         "--interleave en=4,zh=1); shards then pack in "
                         "the interleaved order instead of doc_id "
                         "order")
    ap.add_argument("--decontam-n", type=int, default=13,
                    help="prepare: n-gram size for the decontamination "
                         "flags (13 = the GPT-3/PaLM policy)")
    ap.add_argument("--fuzzy-jaccard", type=float, default=None,
                    help="prepare: ALSO drop documents whose whole-"
                         "document shingle Jaccard vs any --bench doc "
                         "reaches this threshold (catches lightly-"
                         "edited eval copies the 13-gram hit count "
                         "understates)")
    ap.add_argument("--fuzzy-shingle", type=int, default=3,
                    help="prepare: shingle word-length for "
                         "--fuzzy-jaccard (default 3)")
    ap.add_argument("--gopher", action="store_true",
                    help="prepare: apply the Gopher page-quality rules "
                         "(Rae et al. 2021 table A1) before sampling — "
                         "drops failing pages (word-count band, mean "
                         "word length, symbol ratio, alphabetic "
                         "fraction, bullet/ellipsis lines, stop words)")
    ap.add_argument("--gopher-min-words", type=int, default=50,
                    help="prepare/hygiene: Gopher minimum word count "
                         "(50 = the paper's default; lower it for "
                         "short-document corpora)")
    ap.add_argument("--events", default=None,
                    help="attribution/dedup-stream: parquet dir of events "
                         "(event_id, event_type, user_id, ts, ...)")
    ap.add_argument("--base-type", default="view",
                    help="attribution: the earlier event type being "
                         "attributed TO")
    ap.add_argument("--trigger-type", default="click",
                    help="attribution: the later event type being "
                         "attributed")
    ap.add_argument("--max-delay", default="10 minutes",
                    help="attribution: pair a trigger with base events in "
                         "the preceding window of this SQL interval")
    ap.add_argument("--watermark", default=None,
                    help="attribution/dedup-stream --streaming: how late "
                         "events may arrive before their join/dedup state "
                         "is released (defaults: attribution = --max-delay;"
                         " dedup-stream = '1 hour')")
    ap.add_argument("--keys", default="event_id",
                    help="dedup-stream: comma-separated identity columns "
                         "a re-delivered event repeats")
    ap.add_argument("--steps", default="view,click,purchase",
                    help="funnel: comma-separated event types in funnel "
                         "order (default view,click,purchase)")
    ap.add_argument("--within", default=None,
                    help="funnel: SQL interval conversion window anchored "
                         "at step 1 (e.g. '1 hour'); default unbounded")
    ap.add_argument("--cohort-type", default=None,
                    help="retention: cohort users on their first event of "
                         "this type (default: first event of any type)")
    ap.add_argument("--near-dups", action="store_true",
                    help="hygiene: additionally run the MinHash-LSH "
                         "near-duplicate RESOLUTION pass (clusters + "
                         "removable-doc count) — the expensive half of "
                         "the report")
    ap.add_argument("--dup-spans", action="store_true",
                    help="hygiene: additionally run the exact-substring "
                         "duplicated-span pass (corpus-wide k-gram "
                         "postings — the other expensive half)")
    ap.add_argument("--span-k", type=int, default=8,
                    help="spans/hygiene --dup-spans: minimum duplicated "
                         "run length in tokens (default 8)")
    ap.add_argument("--span-min-count", type=int, default=2,
                    help="spans/hygiene --dup-spans: corpus occurrences "
                         "for a k-gram to count as duplicated (default 2)")
    ap.add_argument("--clusters", type=int, default=16,
                    help="semdedup: k-means cluster count (pick so "
                         "clusters stay bounded; pairs are quadratic "
                         "only within a cluster)")
    ap.add_argument("--km-iters", type=int, default=2,
                    help="semdedup: unrolled k-means rounds (default 2)")
    ap.add_argument("--sem-threshold", type=float, default=0.95,
                    help="semdedup: within-cluster cosine at/above which "
                         "two entities are semantic duplicates "
                         "(default 0.95)")
    ap.add_argument("--streaming", action="store_true",
                    help="attribution/dedup-stream: run as a Structured-"
                         "Streaming availableNow drain over --events into "
                         "--out (parquet, checkpointed: re-running "
                         "processes only NEW files) instead of a one-shot "
                         "batch read")
    ap.add_argument("--degrees", action="store_true",
                    help="stats: print the degree histogram / skew "
                         "diagnostic instead of the endpoint stats")
    ap.add_argument("--out", default=None,
                    help="export: output directory for the neo4j-admin "
                         "bulk-import CSVs")
    ap.add_argument("--metric", default="jaccard",
                    choices=["jaccard", "overlap", "cosine"],
                    help="similar: neighbor-set similarity metric "
                         "(overlap scores containment 1.0 — sub-entity "
                         "detection)")
    ap.add_argument("--rounds", type=int, default=8,
                    help="bpe: merge rounds to learn (default 8)")
    ap.add_argument("--n-neg", type=int, default=2,
                    help="negatives: corrupted triples per true edge "
                         "(default 2)")
    ap.add_argument("--fractions", default="train=0.8,val=0.1,test=0.1",
                    help="split: NAME=FRACTION[,...] summing to 1; "
                         "insertion order defines the hash boundaries")
    ap.add_argument("--cols", default=None,
                    help="diff: comma-separated columns to compare "
                         "(default: every shared non-key column)")
    ns, unknown = ap.parse_known_args(argv)
    # argparse won't interleave optionals with a greedy positional list;
    # treat leftover non-flag tokens (the question / search value) as args
    ns.args = list(ns.args) + [t for t in unknown if not t.startswith("-")]

    from neo4j_document_pipeline_spark.session import build_session
    from neo4j_document_pipeline_spark.sources.store import GraphStore

    spark = build_session(ns.master)
    store = GraphStore(ns.store, spark, keep_versions=ns.keep_versions)

    if ns.command == "ingest":
        from neo4j_document_pipeline_spark.plans.pipeline import run_pipeline
        from neo4j_document_pipeline_spark.sources.pages import (
            read_pages_resolved, synth_pages)
        if not ns.pages:
            sys.exit("--pages required for ingest")
        pages_fp = None  # snapshot resume key (manifested dirs only)
        if ns.pages.startswith("synth:"):
            pages = synth_pages(spark, int(ns.pages.split(":", 1)[1]))
        elif ns.pages.startswith("warc:") or ns.pages.endswith((".warc", ".warc.gz")):
            from neo4j_document_pipeline_spark.sources.warc import (
                read_warc_pages)
            pages = read_warc_pages(
                spark, ns.pages.split(":", 1)[1]
                if ns.pages.startswith("warc:") else ns.pages)
            if ns.text_source == "text":
                # WARC pages carry html only (text is NULL); the default
                # text source would canonicalize everything to "" and
                # collapse the corpus into one empty doc
                print("note: WARC input has no text column; "
                      "using --text-source auto", file=sys.stderr)
                ns.text_source = "auto"
        else:
            import re as _re
            # only pre-check plain local paths; scheme URIs (s3a://,
            # hdfs://, file://) go straight to the Spark reader
            is_uri = bool(_re.match(r"^[A-Za-z][A-Za-z0-9+.-]*://", ns.pages))
            if not is_uri and not os.path.exists(ns.pages):
                hint = (f" (did you mean synth:{ns.pages}?)"
                        if ns.pages.isdigit() else "")
                sys.exit(f"--pages: no such parquet path {ns.pages!r}; "
                         f"expected a parquet dir or synth:N{hint}")
            # ONE manifest read derives both the scanned version and the
            # resume key — a concurrent pages commit between two reads
            # could otherwise key resume on content never ingested
            pages, pages_fp = read_pages_resolved(spark, ns.pages)
        from pyspark.sql import functions as F
        if ns.langs:
            pages = pages.filter(F.col("lang").isin(ns.langs.split(",")))
        if ns.since_ts:
            since = ns.since_ts
            if since == "auto":
                m = store.manifest("documents_final") or {}
                since = (m.get("metrics") or {}).get("max_warc_ts")
            if since:
                # >= not >: pages sharing the committed max timestamp may
                # arrive late; the MERGE is idempotent so re-processing the
                # watermark second is safe, dropping latecomers is not
                pages = pages.filter(F.col("warc_ts") >= F.lit(since).cast("timestamp"))
        cfg = _cfg_from_args(ns)
        if ns.incremental or ns.since_ts:
            from neo4j_document_pipeline_spark.streaming.ingest import (
                ingest_increment)
            if ns.canonicalize:
                sys.exit("--canonicalize is not supported with --incremental; "
                         "run `ingest --canonicalize` over the store afterwards")
            if pages.isEmpty():
                print(json.dumps({"increment": {"rows": 0, "note": "no new pages"}}))
            else:
                ingest_increment(store, pages, cfg=cfg,
                                 stage="cli-increment",
                                 text_source=ns.text_source,
                                 min_quality=ns.min_quality,
                                 redact_pii=ns.redact_pii,
                                 dedup_lines=ns.dedup_lines,
                                 strip_spans=ns.strip_spans,
                                 span_k=ns.span_k,
                                 span_min_count=ns.span_min_count,
                                 resolve_near_dups=ns.resolve_near_dups,
                                 near_dup_threshold=ns.near_dup_threshold,
                                 track_sketches=ns.track_sketches)
                print(json.dumps({"increment": {
                    k: (store.manifest(k) or {}).get("rows")
                    for k in ("nodes", "edges", "mentions", "documents_final")}},
                    indent=1))
        else:
            # langs already applied above (shared with the incremental
            # path, as is cfg)
            # manifested pages dirs resume off their committed snapshot id
            # — no content-crc scan of the corpus just to derive the
            # stage-skip key (plain dirs / synth keep the crc fallback);
            # the id comes from the SAME manifest read that resolved the
            # scanned version (read_pages_resolved). langs is passed too
            # (an idempotent re-filter) so the snapshot-keyed resume
            # signature covers it.
            pfp = pages_fp
            manifests = run_pipeline(spark, pages, ns.store, cfg=cfg,
                                     canonicalize_entities=ns.canonicalize,
                                     text_source=ns.text_source,
                                     min_quality=ns.min_quality,
                                     redact_pii=ns.redact_pii,
                                     dedup_lines=ns.dedup_lines,
                                     strip_spans=ns.strip_spans,
                                     span_k=ns.span_k,
                                     span_min_count=ns.span_min_count,
                                     resolve_near_dups=ns.resolve_near_dups,
                                     near_dup_threshold=ns.near_dup_threshold,
                                     track_sketches=ns.track_sketches,
                                     keep_versions=ns.keep_versions,
                                     langs=(ns.langs.split(",")
                                            if ns.langs else None),
                                     pages_fingerprint=pfp)
            print(json.dumps({k: {kk: m.get(kk) for kk in ("rows", "skipped")}
                              for k, m in manifests.items()
                              if not k.startswith("_")}, indent=1))
    elif ns.command == "query":
        from neo4j_document_pipeline_spark.operators.retrieval import graphrag
        question = " ".join(ns.args)
        res = graphrag(spark, store, question, top_k=ns.top_k, hops=ns.hops,
                       alpha_vec=ns.alpha_vec, beta_kw=ns.beta_kw,
                       use_mmr=not ns.no_mmr,
                       use_cross_doc=not ns.no_cross_doc)
        print(res.answer)
        print(json.dumps({"seeds": res.seeds,
                          "timings": {k: round(v, 3) for k, v in res.timings.items()}},
                         indent=1, default=str))
    elif ns.command == "stats":
        from neo4j_document_pipeline_spark.operators.admin import (
            degree_histogram, graph_stats)
        if ns.degrees:
            # skew diagnostic: log2 degree buckets + quantiles
            print(json.dumps(degree_histogram(store), indent=1))
        else:
            print(json.dumps(graph_stats(store), indent=1))
    elif ns.command == "schema":
        from neo4j_document_pipeline_spark.operators.admin import graph_schema
        print(json.dumps(graph_schema(store), indent=1))
    elif ns.command == "search":
        from neo4j_document_pipeline_spark.operators.admin import graph_search
        for r in graph_search(store, " ".join(ns.args), label=ns.label,
                              limit=ns.limit).collect():
            print(json.dumps(r.asDict(), default=str))
    elif ns.command == "docsearch":
        # BM25 document retrieval over the committed corpus — the
        # document-level companion to entity `search`; stateless (no
        # index table needed: matching tokens are filtered before the
        # tf shuffle, so cost follows the query terms' postings)
        from pyspark.sql import functions as F

        from neo4j_document_pipeline_spark.operators.corpus import (
            bm25_scores)
        if not ns.args:
            sys.exit("docsearch requires a query, e.g. "
                     "docsearch spark join order")
        doc_table = ("documents_final" if store.exists("documents_final")
                     else "documents")
        docs = store.read(doc_table)
        cols = [c for c in ("url", "title") if c in docs.columns]
        out = (bm25_scores(docs, "doc_id", "text", " ".join(ns.args))
               .join(docs.select("doc_id", *cols), "doc_id")
               .orderBy(F.desc("score"), "doc_id").limit(ns.top_k))
        for r in out.collect():
            d = r.asDict()
            d["score"] = round(d["score"], 4)
            print(json.dumps(d, default=str))
    elif ns.command == "docs":
        from neo4j_document_pipeline_spark.operators.admin import list_documents
        for r in list_documents(store, limit=ns.limit).collect():
            print(json.dumps(r.asDict(), default=str))
    elif ns.command == "pagerank":
        # entity importance over the committed KG edge list (seed
        # prioritization / extraction-quality weighting); joins names
        # back from nodes for a readable top-N
        from neo4j_document_pipeline_spark.operators.graphalgo import (
            pagerank)
        from pyspark.sql import functions as F
        seeds = None
        if ns.seeds:
            seeds = _resolve_seed_ids(store, ns.seeds.split(","))
            if not seeds:
                sys.exit(f"--seeds: no entity named any of {ns.seeds!r}")
        try:
            ranks = pagerank(_kg_edges(store, weighted=ns.weighted),
                             iters=ns.iters,
                             weight_col="w" if ns.weighted else None,
                             seeds=seeds)
        except ValueError as exc:
            # names resolved to nodes, but none of them touches a usable
            # edge (e.g. only self-loops after canonicalize)
            sys.exit(f"--seeds: {exc}")
        nodes = store.read("nodes").select(
            F.col("entity_id").alias("id"), "label", "name")
        top = (ranks.join(nodes, "id", "left")
               .orderBy(F.col("rank").desc(), "id").limit(ns.limit))
        for r in top.collect():
            print(json.dumps(r.asDict(), default=str))
    elif ns.command == "hits":
        # hubs vs authorities over the DIRECTED subject->object edges:
        # authorities are what the corpus asserts facts ABOUT, hubs are
        # the fact-asserting aggregators — pagerank folds both into one
        from pyspark.sql import functions as F

        from neo4j_document_pipeline_spark.operators.graphalgo import (
            hits)
        sc = hits(_kg_edges(store), iters=ns.iters)
        nodes = store.read("nodes").select(
            F.col("entity_id").alias("id"), "label", "name")
        top = (sc.join(nodes, "id", "left")
               # unique id as the last sort key: zero-auth tie groups
               # are guaranteed (every no-in-edge node), names can dupe
               .orderBy(F.col("auth").desc(), "name", "id")
               .limit(ns.limit)
               .select("name", "label",
                       F.round("hub", 6).alias("hub"),
                       F.round("auth", 6).alias("auth")))
        for r in top.collect():
            print(json.dumps(r.asDict(), default=str))
    elif ns.command == "triangles":
        from neo4j_document_pipeline_spark.operators.graphalgo import (
            triangle_count)
        print(json.dumps(
            {"triangles": triangle_count(_kg_edges(store))
             .first()["triangles"]}))
    elif ns.command == "clustering":
        # per-entity local clustering coefficient: how tightly an
        # entity's neighborhood closes on itself — high-coeff entities
        # sit inside cohesive topic clusters, zero-coeff hubs are pure
        # connectors
        from pyspark.sql import functions as F

        from neo4j_document_pipeline_spark.operators.graphalgo import (
            clustering_coefficients)
        cc = clustering_coefficients(_kg_edges(store))
        names = store.read("nodes").select(
            F.col("entity_id").alias("id"), "name")
        out = (cc.join(names, "id", "left")
               .orderBy(F.col("coeff").desc(), F.col("degree").desc(), "id")
               .limit(ns.limit))
        for r in out.collect():
            print(json.dumps(r.asDict(), default=str))
    elif ns.command == "harmonic":
        # approximate harmonic centrality from HyperBall KMV sketches —
        # "how close is this entity to everything else", sketch-based
        # so it never runs per-node BFS; --hops bounds the radius,
        # --k the sketch size (error ~ 1/sqrt(k-2))
        from pyspark.sql import functions as F

        from neo4j_document_pipeline_spark.operators.graphalgo import (
            harmonic_centrality_sketch)
        h = harmonic_centrality_sketch(_kg_edges(store),
                                       radius=max(1, ns.hops), k=64)
        names = store.read("nodes").select(
            F.col("entity_id").alias("id"), "name")
        out = (h.join(names, "id", "left")
               .orderBy(F.col("harmonic").desc(), "id").limit(ns.limit))
        for r in out.collect():
            d = r.asDict()
            d["harmonic"] = round(d["harmonic"], 4)
            print(json.dumps(d, default=str))
    elif ns.command == "summary":
        # one-row structural profile of the committed KG: scale sanity,
        # hub spotting (max vs avg degree), degree-mixing pattern
        from neo4j_document_pipeline_spark.operators.graphalgo import (
            graph_summary)
        d = graph_summary(_kg_edges(store)).first().asDict()
        for c in ("avg_degree", "density", "assortativity"):
            if d[c] is not None:
                d[c] = round(d[c], 6)
        print(json.dumps(d, default=str))
    elif ns.command == "conductance":
        # how leaky each LPA community is: cut / min(vol, 2m - vol) —
        # the per-community readout next to `communities`' split
        from pyspark.sql import functions as F

        from neo4j_document_pipeline_spark.operators.graphalgo import (
            conductance, label_propagation)
        e = _kg_edges(store)
        asg = label_propagation(e, iters=ns.iters)
        names = store.read("nodes").select(
            F.col("entity_id").alias("community"), "name")
        out = (conductance(e, asg)
               .join(names, "community", "left")
               .orderBy(F.col("n_nodes").desc(), "community")
               .limit(ns.limit))
        for r in out.collect():
            d = r.asDict()
            if d["conductance"] is not None:
                d["conductance"] = round(d["conductance"], 6)
            print(json.dumps(d, default=str))
    elif ns.command == "truss":
        # cohesive edge nucleus: edges sitting in >= k-2 triangles of
        # the surviving subgraph (stronger than kcore — no articulation
        # hubs), resolved back to entity names
        from pyspark.sql import functions as F

        from neo4j_document_pipeline_spark.operators.graphalgo import (
            k_truss)
        k = 3 if ns.k is None else ns.k
        if k < 3:
            sys.exit("truss: --k must be >= 3")
        t = k_truss(_kg_edges(store), k=k)
        names = store.read("nodes").select(
            F.col("entity_id").alias("id"), "name")
        out = (t.join(names.select(F.col("id").alias("u"),
                                   F.col("name").alias("u_name")), "u")
               .join(names.select(F.col("id").alias("v"),
                                  F.col("name").alias("v_name")), "v")
               .orderBy("u_name", "v_name", "u", "v").limit(ns.limit))
        for r in out.collect():
            print(json.dumps(r.asDict(), default=str))
    elif ns.command == "scc":
        # directed strongly connected components over the KG edge list
        # (subj -> obj): the Broder bow-tie decomposition — cyclic
        # entity clusters (mutual-reference nuclei) first, singletons
        # suppressed
        from pyspark.sql import functions as F

        from neo4j_document_pipeline_spark.operators.graphalgo import (
            strongly_connected_components)
        sc = strongly_connected_components(_kg_edges(store))
        names = store.read("nodes").select(
            F.col("entity_id").alias("id"), "name")
        out = (sc.join(names, "id", "left")
               .groupBy("scc")
               .agg(F.count("*").alias("size"),
                    F.array_sort(F.collect_list("name"))
                    .alias("members"))
               .filter(F.col("size") >= 2)
               .orderBy(F.desc("size"), "scc").limit(ns.limit))
        rows = out.collect()
        if not rows:
            print(json.dumps({"sccs": 0,
                              "note": "no non-trivial SCC (the KG "
                                      "is a DAG at this store)"}))
        for r in rows:
            print(json.dumps(r.asDict(), default=str))
    elif ns.command == "betweenness":
        # which entities broker the most shortest paths — the bridge/
        # bottleneck readout (pagerank finds hubs; betweenness finds
        # CONNECTORS between communities). Pivot sources are the
        # --pivots smallest sha256('bc:'||id) node ids: deterministic,
        # data-independent-looking, replayable
        from pyspark.sql import functions as F

        from neo4j_document_pipeline_spark.operators.graphalgo import (
            betweenness_centrality)
        e = _kg_edges(store)
        pivots = None
        if ns.pivots is not None:
            nodes = (e.select(F.col("u").alias("id"))
                     .union(e.select(F.col("v").alias("id"))).distinct())
            hk = F.sha2(F.concat(F.lit("bc:"), F.col("id")), 256)
            pivots = [r["id"] for r in
                      nodes.orderBy(hk, "id").limit(ns.pivots).collect()]
            if not pivots:
                sys.exit("betweenness: the store has no edges")
        bc = betweenness_centrality(e, pivots, max_depth=ns.max_depth)
        names = store.read("nodes").select(
            F.col("entity_id").alias("id"), "name", "label")
        out = (bc.join(names, "id", "left")
               .orderBy(F.desc("betweenness"), "id").limit(ns.limit))
        for r in out.collect():
            d = r.asDict()
            d["betweenness"] = round(d["betweenness"], 6)
            print(json.dumps(d, default=str))
    elif ns.command == "closure":
        # transitive closure of the KG's (optionally one-rel_type)
        # directed edges — the rdfs11-style reachability layer: how
        # many derived pairs each hop level adds, with the deepest
        # chains first (cycle-safe; raises loudly if >20 levels)
        from pyspark.sql import functions as F

        from neo4j_document_pipeline_spark.operators.reasoning import (
            transitive_closure)
        e = store.read("edges")
        if ns.rel:
            e = e.filter(F.col("rel_type") == ns.rel)
            if e.isEmpty():
                sys.exit(f"closure: no edges with rel_type {ns.rel!r}")
        tc = transitive_closure(
            e.select(F.col("src_id").alias("src"),
                     F.col("dst_id").alias("dst")))
        by_depth = (tc.groupBy("dist").agg(F.count("*").alias("pairs"))
                    .orderBy("dist").collect())
        names = store.read("nodes").select(
            F.col("entity_id").alias("src"),
            F.col("name").alias("src_name"))
        deepest = (tc.orderBy(F.desc("dist"), "src", "dst")
                   .limit(ns.limit).join(names, "src", "left").collect())
        print(json.dumps({
            "rel_type": ns.rel or "ALL",
            "pairs_by_depth": {str(r["dist"]): r["pairs"]
                               for r in by_depth},
            "deepest": [{"src": r["src"], "src_name": r["src_name"],
                         "dst": r["dst"], "dist": r["dist"]}
                        for r in deepest]}, indent=1))
    elif ns.command == "cardinality":
        # per-predicate structural census of the committed KG: which
        # rel_types are functional / inverse-functional / N:M, with
        # exact max fan-outs — the readout that decides property-column
        # pivots and skew-salting targets
        from pyspark.sql import functions as F

        from neo4j_document_pipeline_spark.operators.kgschema import (
            predicate_cardinality)
        e = store.read("edges").select(
            F.col("src_id").alias("subject"),
            F.col("rel_type").alias("predicate"),
            F.col("dst_id").alias("object"))
        out = (predicate_cardinality(e)
               .orderBy(F.desc("n_triples"), "predicate").limit(ns.limit))
        for r in out.collect():
            print(json.dumps(r.asDict(), default=str))
    elif ns.command == "negatives":
        # KG-embedding training negatives over the committed edges:
        # deterministic filtered corruption (operators/kgtrain.py);
        # the entity pool is densely indexed by row_number (a single
        # window — fine at CLI scale; use a distributed rank for
        # billion-node pools)
        from pyspark.sql import Window
        from pyspark.sql import functions as F

        from neo4j_document_pipeline_spark.operators.kgtrain import (
            negative_triples)
        e = store.read("edges").select(
            F.col("src_id").alias("subject"),
            F.col("rel_type").alias("predicate"),
            F.col("dst_id").alias("object"))
        pool = (store.read("nodes")
                .select(F.col("entity_id").alias("entity")).distinct()
                .withColumn("idx", F.row_number().over(
                    Window.orderBy("entity")) - 1))
        n = pool.count()
        if n < 2:
            sys.exit("negatives: need at least 2 entities in the store")
        neg = negative_triples(e, pool, pool_size=n, n_neg=ns.n_neg,
                               salt=ns.salt)
        if ns.out:
            neg.write.mode("overwrite").parquet(ns.out)
            print(json.dumps({"out": ns.out, "rows": neg.count(),
                              "n_neg": ns.n_neg, "pool_size": n}))
        else:
            for r in (neg.orderBy("subject", "predicate", "attempt")
                      .limit(ns.limit).collect()):
                print(json.dumps(r.asDict(), default=str))
    elif ns.command == "bpe":
        # learn a BPE merge table from the committed corpus
        # (operators/bpe.py): prints one JSON line per merge round;
        # --out additionally writes the segmented word vocabulary
        from neo4j_document_pipeline_spark.operators.bpe import bpe_learn
        doc_table = ("documents_final"
                     if store.exists("documents_final") else "documents")
        merges, vocab = bpe_learn(store.read(doc_table), "text",
                                  rounds=ns.rounds)
        for r in merges.orderBy("round").collect():
            print(json.dumps(r.asDict(), default=str))
        if ns.out:
            vocab.write.mode("overwrite").parquet(ns.out)
            print(json.dumps({"out": ns.out, "words": vocab.count()}))
    elif ns.command == "diff":
        # change feed between two committed versions of a table:
        # `diff <table> <old_version> <new_version>` — counts by change
        # class plus a preview (operators/admin.py::table_diff)
        from pyspark.sql import functions as F

        from neo4j_document_pipeline_spark.operators.admin import (
            table_diff)
        if len(ns.args) != 3:
            sys.exit("diff: usage — diff <table> <old_ver> <new_ver> "
                     "[--keys k1,k2] [--cols c1,c2]")
        table, v_old, v_new = ns.args
        default_keys = {"nodes": "entity_id",
                        "edges": "src_id,rel_type,dst_id",
                        "documents": "doc_id",
                        "documents_final": "doc_id"}
        keys = (ns.keys if ns.keys != "event_id" or table not in
                default_keys else default_keys[table]).split(",")
        old = store.read_version(table, v_old)
        new = store.read_version(table, v_new)
        shared = [c for c in old.columns
                  if c in new.columns and c not in keys]
        cols = ns.cols.split(",") if ns.cols else shared
        missing = [c for c in keys + cols
                   if c not in old.columns or c not in new.columns]
        if missing:
            sys.exit(f"diff: columns absent from both versions: "
                     f"{missing}; shared = {sorted(shared + keys)}")
        d = table_diff(old, new, keys, cols).localCheckpoint(eager=False)
        counts = {r["change"]: r["n"] for r in
                  d.groupBy("change").agg(F.count("*").alias("n"))
                  .collect()}
        print(json.dumps({"table": table, "old": v_old, "new": v_new,
                          "added": counts.get("added", 0),
                          "removed": counts.get("removed", 0),
                          "changed": counts.get("changed", 0)}))
        for r in d.orderBy("change", *keys).limit(ns.limit).collect():
            print(json.dumps(r.asDict(), default=str))
    elif ns.command == "split":
        # leakage-safe train/val/test assignment over the committed
        # corpus: near-dup clusters share one hash draw, so
        # near-duplicates never straddle an eval boundary
        # (operators/sampling.py::leakage_safe_split)
        from pyspark.sql import functions as F

        from neo4j_document_pipeline_spark.operators.sampling import (
            leakage_safe_split)
        fractions = {}
        try:
            for part in ns.fractions.split(","):
                name, frac = part.split("=")
                fractions[name.strip()] = float(frac)
        except ValueError:
            sys.exit("split: --fractions must be NAME=FRACTION[,...]")
        doc_table = ("documents_final"
                     if store.exists("documents_final") else "documents")
        docs = store.read(doc_table)
        assigned = leakage_safe_split(
            docs, "doc_id", fractions, text_col="text",
            jaccard_threshold=ns.near_dup_threshold, salt=ns.salt
        ).localCheckpoint(eager=False)
        summary = {r["split"]: r["n"] for r in
                   assigned.groupBy("split").agg(F.count("*").alias("n"))
                   .collect()}
        clustered = (assigned
                     .filter(F.col("split_key") != F.col("doc_id")
                             .cast("string")).count())
        print(json.dumps({"splits": summary,
                          "cluster_keyed_docs": clustered,
                          "salt": ns.salt}))
        if ns.out:
            (assigned.select("doc_id", "split_key", "split")
             .write.mode("overwrite").parquet(ns.out))
            print(json.dumps({"out": ns.out}))
    elif ns.command == "walks":
        # deterministic walk corpus (DeepWalk/node2vec input): with
        # --out, the full corpus lands as parquet; without, a preview
        from pyspark.sql import functions as F

        from neo4j_document_pipeline_spark.operators.graphalgo import (
            random_walks)
        rw = random_walks(_kg_edges(store), walk_len=ns.walk_len,
                          walks_per_node=ns.walks_per_node,
                          salt=ns.salt)
        if ns.out:
            rw.write.mode("overwrite").parquet(ns.out)
            print(json.dumps({"out": ns.out, "rows": rw.count(),
                              "walk_len": ns.walk_len,
                              "walks_per_node": ns.walks_per_node}))
        else:
            for r in (rw.orderBy("start", "rep", "step")
                      .limit(ns.limit).collect()):
                print(json.dumps(r.asDict(), default=str))
    elif ns.command == "mixture":
        # per-domain pretraining mixture: weight ∝ tokens^alpha over
        # the committed corpus grouped by url host; --train-budget adds
        # the implied epochs per domain (repetition-risk readout)
        from pyspark.sql import functions as F

        from neo4j_document_pipeline_spark.functions.textstats import (
            col_token_count)
        from neo4j_document_pipeline_spark.operators.corpus import (
            mixture_weights)
        doc_table = ("documents_final"
                     if store.exists("documents_final") else "documents")
        # case-insensitive scheme, authority stops at /?# (query and
        # fragment never leak into the host), userinfo stripped (never
        # print credentials), host lowercased — the same conventions as
        # col_normalize_url (functions/textstats.py)
        host = F.lower(F.regexp_replace(
            F.regexp_extract(
                "url", r"^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]+)", 1),
            r"^.*@", ""))
        d = store.read(doc_table).select(
            # regexp_extract yields '' (not NULL) on no match
            F.when(host != "", host).otherwise("(no-host)")
            .alias("source"),
            col_token_count(F.col("text")).alias("n_tok"))
        out = mixture_weights(d, "source", "n_tok", alpha=ns.alpha,
                              budget_tokens=ns.train_budget)
        for r in (out.orderBy(F.col("weight").desc(), "source")
                  .limit(ns.limit).collect()):
            print(json.dumps(r.asDict(), default=str))
    elif ns.command == "similar":
        # structurally-similar entity pairs (shared-neighbor Jaccard) —
        # duplicate-entity candidates whose NAMES the linking stage's
        # MinHash/TF-IDF blocking wouldn't pair
        from pyspark.sql import functions as F

        from neo4j_document_pipeline_spark.operators.graphalgo import (
            node_similarity)
        sim = node_similarity(_kg_edges(store, weighted=ns.weighted),
                              min_sim=ns.min_sim,
                              top_k=ns.sim_topk, metric=ns.metric,
                              weight_col="w" if ns.weighted else None)
        names = store.read("nodes").select("entity_id", "name")
        top = (sim
               .join(names.select(F.col("entity_id").alias("a"),
                                  F.col("name").alias("name_a")), "a")
               .join(names.select(F.col("entity_id").alias("b"),
                                  F.col("name").alias("name_b")), "b")
               .select("name_a", "name_b", "shared",
                       F.round("jaccard", 6).alias("jaccard"))
               .orderBy(F.col("jaccard").desc(), "name_a", "name_b")
               .limit(ns.limit))
        for r in top.collect():
            print(json.dumps(r.asDict(), default=str))
    elif ns.command == "kcore":
        # dense nucleus of the KG: entities surviving k-core peeling
        # (boilerplate/link-farm neighborhoods survive high k)
        from pyspark.sql import functions as F

        from neo4j_document_pipeline_spark.operators.graphalgo import (
            k_core)
        core = k_core(_kg_edges(store), k=2 if ns.k is None else ns.k)
        names = store.read("nodes").select(
            F.col("entity_id").alias("id"), "label", "name")
        out = (core.join(names, "id", "left")
               .orderBy("name", "id").limit(ns.limit))
        for r in out.collect():
            print(json.dumps(r.asDict(), default=str))
    elif ns.command == "export":
        # neo4j-admin bulk-import CSVs of the committed KG — the
        # migration path back INTO a real Neo4j
        from neo4j_document_pipeline_spark.sources.neo4j_export import (
            export_neo4j_admin)
        if not ns.out:
            sys.exit("export: --out is required")
        print(json.dumps(export_neo4j_admin(store, ns.out), indent=1))
    elif ns.command == "reach":
        # "what's within --hops of these entities" — multi-source BFS
        # over the committed KG, names joined back, nearest first.
        # --weighted swaps hop count for attestation-weighted proximity:
        # edge length 1/supporting-document-count, so a 2-hop path over
        # heavily-attested edges can outrank a single-mention direct edge
        from pyspark.sql import functions as F

        from neo4j_document_pipeline_spark.operators.graphalgo import (
            bfs_distances, shortest_paths)
        if not ns.seeds:
            sys.exit("reach: --seeds is required (entity names)")
        ids = _resolve_seed_ids(store, ns.seeds.split(","))
        if not ids:
            sys.exit(f"--seeds: no entity named any of {ns.seeds!r}")
        if ns.weighted:
            e = _kg_edges(store, weighted=True).withColumn(
                "w", F.lit(1.0) / F.col("w"))
            dist = (shortest_paths(e, ids, max_hops=ns.hops)
                    .withColumn("dist", F.round("dist", 6)))
        else:
            dist = bfs_distances(_kg_edges(store), ids, max_hops=ns.hops)
        nodes = store.read("nodes").select(
            F.col("entity_id").alias("id"), "label", "name")
        out = (dist.join(nodes, "id", "left")
               .orderBy("dist", "name", "id").limit(ns.limit))
        for r in out.collect():
            print(json.dumps(r.asDict(), default=str))
    elif ns.command == "entity-groups":
        # composition: similarity pairs above the threshold are edges of
        # a duplicate-candidate graph; connected components turn them
        # into entity GROUPS ("these are likely the same thing") — the
        # structural twin of the canonicalize stage's name-based
        # link→components flow
        from pyspark.sql import functions as F

        from neo4j_document_pipeline_spark.operators.components import (
            connected_components)
        from neo4j_document_pipeline_spark.operators.graphalgo import (
            node_similarity)
        sim = node_similarity(_kg_edges(store, weighted=ns.weighted),
                              min_sim=ns.min_sim,
                              top_k=ns.sim_topk, metric=ns.metric,
                              weight_col="w" if ns.weighted else None)
        comp = connected_components(
            sim.select(F.col("a").alias("u"), F.col("b").alias("v")))
        names = store.read("nodes").select(
            F.col("entity_id").alias("id"), "name")
        groups = (comp.join(names, "id")
                  .groupBy("component")
                  .agg(F.sort_array(F.collect_list("name"))
                       .alias("members"),
                       F.count("*").alias("n"))
                  .filter(F.col("n") >= 2)
                  .orderBy(F.col("n").desc(), "component")
                  .limit(ns.limit))
        for r in groups.collect():
            print(json.dumps(
                {"group": r["component"], "n": r["n"],
                 "members": list(r["members"])}))
    elif ns.command == "communities":
        # unsupervised topic/boilerplate clusters by deterministic
        # synchronous label propagation — coarser than entity-groups
        # (which needs heavy pairwise overlap), finer than one blob per
        # connected component
        from pyspark.sql import functions as F

        from neo4j_document_pipeline_spark.operators.graphalgo import (
            label_propagation)
        labels = label_propagation(
            _kg_edges(store, weighted=ns.weighted), iters=ns.iters,
            weight_col="w" if ns.weighted else None)
        names = store.read("nodes").select(
            F.col("entity_id").alias("id"), "name")
        groups = (labels.join(names, "id")
                  .groupBy("community")
                  .agg(F.sort_array(F.collect_list("name"))
                       .alias("members"),
                       F.count("*").alias("n"))
                  .filter(F.col("n") >= 2)
                  .orderBy(F.col("n").desc(), "community")
                  .limit(ns.limit))
        for r in groups.collect():
            print(json.dumps(
                {"community": r["community"], "n": r["n"],
                 "members": list(r["members"])}))
    elif ns.command == "collocations":
        # "which entities co-occur in documents more than chance" — NPMI
        # over the mentions table: association strength, the signal for
        # relation discovery / edge-confidence weighting that neighbor
        # overlap (similar) and cluster membership (communities) miss
        from pyspark.sql import functions as F

        from neo4j_document_pipeline_spark.operators.graphalgo import (
            npmi_pairs)
        occ = store.read("mentions").select(
            F.col("doc_id").alias("ctx"),
            F.col("entity_id").alias("item"))
        sc = npmi_pairs(occ, min_pairs=ns.min_count,
                        max_ctx_size=ns.max_ctx)
        names = store.read("nodes").select("entity_id", "name")
        top = (sc
               .join(names.select(F.col("entity_id").alias("a"),
                                  F.col("name").alias("name_a")), "a")
               .join(names.select(F.col("entity_id").alias("b"),
                                  F.col("name").alias("name_b")), "b")
               # entity ids as final sort keys: distinct pairs can share
               # display names (duplicate-name entities are expected)
               .orderBy(F.col("npmi").desc(), "name_a", "name_b",
                        "a", "b")
               .limit(ns.limit)
               .select("name_a", "name_b", "n_pair",
                       F.round("lift", 6).alias("lift"),
                       F.round("npmi", 6).alias("npmi")))
        for r in top.collect():
            print(json.dumps(r.asDict(), default=str))
    elif ns.command == "suggest":
        # KG completion: non-adjacent entity pairs whose shared
        # neighborhoods say "probably related" — ranked by Adamic-Adar
        # (shared RARE neighbors beat shared hubs)
        from pyspark.sql import functions as F

        from neo4j_document_pipeline_spark.operators.graphalgo import (
            link_prediction)
        lp = link_prediction(_kg_edges(store), min_common=ns.min_count,
                             max_degree=ns.max_degree)
        names = store.read("nodes").select("entity_id", "name")
        top = (lp
               .join(names.select(F.col("entity_id").alias("a"),
                                  F.col("name").alias("name_a")), "a")
               .join(names.select(F.col("entity_id").alias("b"),
                                  F.col("name").alias("name_b")), "b")
               .orderBy(F.col("adamic_adar").desc(), "name_a", "name_b",
                        "a", "b")
               .limit(ns.limit)
               .select("name_a", "name_b", "common",
                       F.round("adamic_adar", 6).alias("adamic_adar"),
                       "pref_attach"))
        for r in top.collect():
            print(json.dumps(r.asDict(), default=str))
    elif ns.command == "sample":
        # reproducible corpus sampling over the committed documents
        # table: a pure function of (doc_id, salt), so the same command
        # draws the SAME subset on any rerun / repartition / rig —
        # train/holdout splits that two teams can reproduce independently
        from pyspark.sql import functions as F

        from neo4j_document_pipeline_spark.operators.sampling import (
            stratified_sample, uniform_hash_col)
        docs = store.read("documents")
        if ns.rates:
            if ns.strata_col not in docs.columns:
                sys.exit(f"--strata-col {ns.strata_col!r} is not a "
                         f"documents column (have {docs.columns})")
            try:
                rates = {k: float(v) for k, v in
                         (kv.split("=", 1) for kv in ns.rates.split(","))}
            except ValueError:
                sys.exit("--rates must be VALUE=RATE[,VALUE=RATE...]")
            out = stratified_sample(docs, rates, ns.strata_col,
                                    id_col="doc_id",
                                    default_rate=ns.default_rate,
                                    salt=ns.salt)
        else:
            rate = 0.1 if ns.rate is None else ns.rate
            if not (0.0 <= rate <= 1.0):
                sys.exit("--rate must be in [0, 1]")
            out = docs.filter(
                uniform_hash_col("doc_id", ns.salt) < F.lit(rate))
        for r in (out.select("doc_id", "title")
                  .orderBy("doc_id").limit(ns.limit).collect()):
            print(json.dumps(r.asDict(), default=str))
    elif ns.command == "shards":
        # token-budget shard packing plan over the committed documents
        # table (the training-data delivery unit): per-shard doc/token
        # counts, deterministic in doc_id order
        from pyspark.sql import functions as F

        from neo4j_document_pipeline_spark.functions.textstats import (
            col_token_count)
        from neo4j_document_pipeline_spark.operators.sampling import (
            token_shards)
        docs = store.read("documents").select(
            "doc_id", col_token_count(F.col("text")).alias("n_tok"))
        packed = token_shards(docs, ns.budget)
        rows = (packed.groupBy("shard_id")
                .agg(F.count("*").alias("docs"),
                     F.sum("n_tok").alias("tokens"))
                .orderBy("shard_id").limit(ns.limit).collect())
        for r in rows:
            print(json.dumps(r.asDict(), default=str))
    elif ns.command == "prepare":
        # end-to-end training-data export: committed documents ->
        # (optional) benchmark decontamination -> reproducible sampling
        # -> token-budget shard packing -> shard-partitioned parquet +
        # a JSON manifest. Every stage is a pure function of
        # (data, salt): a rerun produces byte-identical shards, so two
        # teams can derive the same training set independently.
        from pyspark.sql import functions as F

        from neo4j_document_pipeline_spark.functions.textstats import (
            col_token_count)
        from neo4j_document_pipeline_spark.operators.sampling import (
            stratified_sample, token_shards, uniform_hash_col)
        if not ns.out:
            sys.exit("prepare requires --out <dir> for the shard sink")
        if ns.fuzzy_jaccard is not None and not ns.bench:
            sys.exit("--fuzzy-jaccard needs --bench (it scrubs against "
                     "the benchmark documents)")
        doc_table = ("documents_final" if store.exists("documents_final")
                     else "documents")
        docs = store.read(doc_table)
        manifest = {"doc_table": doc_table, "salt": ns.salt,
                    "budget": ns.budget}
        if ns.c4:
            # clean first: decontam/sampling/packing then see the text
            # that would actually be trained on
            from neo4j_document_pipeline_spark.operators.corpus import (
                c4_quality_filters)
            kept = (c4_quality_filters(docs, "doc_id", "text")
                    .filter("keep")
                    .select("doc_id",
                            F.col("text_clean").alias("text")))
            docs = docs.drop("text").join(kept, "doc_id")
            if "n_chars" in docs.columns:
                docs = docs.withColumn("n_chars", F.length("text"))
            manifest["c4"] = True
        if ns.gopher:
            from neo4j_document_pipeline_spark.operators.corpus import (
                gopher_quality_filters)
            if ns.gopher_min_words < 0:
                sys.exit("--gopher-min-words must be >= 0")
            gkeep = (gopher_quality_filters(
                docs, "doc_id", "text",
                min_words=ns.gopher_min_words)
                .filter("keep").select("doc_id"))
            docs = docs.join(gkeep, "doc_id")
            manifest["gopher"] = {"min_words": ns.gopher_min_words}
        if ns.bench:
            import glob as _glob
            import re as _re
            if not _re.match(r"^[A-Za-z][A-Za-z0-9+.-]*://", ns.bench) \
                    and not _glob.glob(ns.bench):
                sys.exit(f"no such benchmark path {ns.bench!r}")
            bench = spark.read.parquet(ns.bench)
            if "text" not in bench.columns:
                sys.exit("--bench parquet must carry a text column "
                         f"(have {bench.columns})")
            if ns.decontam_n < 1:
                sys.exit("--decontam-n must be >= 1")
            from neo4j_document_pipeline_spark.operators.dedup import (
                ngram_overlap_flags)
            flagged = (ngram_overlap_flags(
                docs, bench, "doc_id", "text", n=ns.decontam_n)
                .filter("flagged").select("doc_id"))
            docs = docs.join(flagged, "doc_id", "left_anti")
            manifest["decontam"] = {"bench": ns.bench,
                                    "n": ns.decontam_n}
            if ns.fuzzy_jaccard is not None:
                if not (0.0 < ns.fuzzy_jaccard <= 1.0):
                    sys.exit("--fuzzy-jaccard must be in (0, 1]")
                from neo4j_document_pipeline_spark.operators.dedup \
                    import jaccard_decontam_flags
                # --bench only promises a text column; the fuzzy pass
                # needs a bench id — derive one deterministically
                bench_k = bench if "doc_id" in bench.columns else \
                    bench.withColumn("doc_id", F.sha2("text", 256))
                fz = (jaccard_decontam_flags(
                    docs, bench_k, "doc_id", "text",
                    shingle_words=ns.fuzzy_shingle,
                    threshold=ns.fuzzy_jaccard)
                    .filter("flagged").select("doc_id"))
                docs = docs.join(fz, "doc_id", "left_anti")
                manifest["decontam"]["fuzzy"] = {
                    "jaccard": ns.fuzzy_jaccard,
                    "shingle_words": ns.fuzzy_shingle}
        if ns.rates:
            if ns.strata_col not in docs.columns:
                sys.exit(f"--strata-col {ns.strata_col!r} is not a "
                         f"documents column (have {docs.columns})")
            try:
                rates = {k: float(v) for k, v in
                         (kv.split("=", 1) for kv in ns.rates.split(","))}
            except ValueError:
                sys.exit("--rates must be VALUE=RATE[,VALUE=RATE...]")
            docs = stratified_sample(docs, rates, ns.strata_col,
                                     id_col="doc_id",
                                     default_rate=ns.default_rate,
                                     salt=ns.salt)
            manifest["sample"] = {"rates": rates,
                                  "strata_col": ns.strata_col,
                                  "default_rate": ns.default_rate}
        elif ns.rate is not None:
            if not (0.0 <= ns.rate <= 1.0):
                sys.exit("--rate must be in [0, 1]")
            docs = docs.filter(
                uniform_hash_col("doc_id", ns.salt) < F.lit(ns.rate))
            manifest["sample"] = {"rate": ns.rate}
        order_col = "doc_id"
        if ns.interleave:
            if ns.strata_col not in docs.columns:
                sys.exit(f"--strata-col {ns.strata_col!r} is not a "
                         f"documents column (have {docs.columns})")
            try:
                iw = {k: float(v) for k, v in
                      (kv.split("=", 1)
                       for kv in ns.interleave.split(","))}
            except ValueError:
                sys.exit("--interleave must be "
                         "VALUE=WEIGHT[,VALUE=WEIGHT...]")
            from neo4j_document_pipeline_spark.operators.sampling \
                import interleave_order
            order = interleave_order(docs, ns.strata_col, "doc_id",
                                     weights=iw, salt=ns.salt)
            docs = docs.join(order.select("doc_id", "pos"), "doc_id")
            order_col = "pos"
            manifest["interleave"] = {"weights": iw,
                                      "strata_col": ns.strata_col}
        sized = docs.withColumn(
            "n_tok", col_token_count(F.col("text")))
        packed = token_shards(sized, ns.budget, order_col=order_col)
        packed.write.partitionBy("shard_id").parquet(ns.out)
        # summarize from the packed frame (its prefix-sum input is
        # localCheckpoint-ed, so this re-runs only the narrow pass) —
        # a read-back would fail on a legitimately EMPTY export (all
        # docs decontaminated/sampled away writes only _SUCCESS)
        summary = packed.agg(
            F.count("*").alias("n_docs"),
            F.sum("n_tok").alias("tokens_total"),
            F.countDistinct("shard_id").alias("n_shards")) \
            .collect()[0].asDict()
        manifest.update({k: int(v or 0) for k, v in summary.items()})
        with open(os.path.join(ns.out, "_prepare_manifest.json"),
                  "w") as fh:
            json.dump(manifest, fh, indent=1, sort_keys=True)
        print(json.dumps(manifest, sort_keys=True))
    elif ns.command in ("attribution", "dedup-stream"):
        # the event-correlation surface over an events dir: attribution
        # = stream-stream interval join (every trigger paired with each
        # same-user base event in its preceding window); dedup-stream =
        # exactly-once delivery from an at-least-once source. One code
        # path serves both a one-shot batch read and a checkpointed
        # availableNow drain (--streaming): the operators build the
        # same plan on a static frame and a stream
        from neo4j_document_pipeline_spark.streaming.ingest import (
            attribution_pairs, dedup_event_stream)
        if not ns.events:
            sys.exit("--events <parquet dir> required for "
                     f"{ns.command}")
        import glob as _glob
        import re as _re
        if not _re.match(r"^[A-Za-z][A-Za-z0-9+.-]*://", ns.events) \
                and not _glob.glob(ns.events):
            sys.exit(f"no such events path {ns.events!r}")
        static = spark.read.parquet(ns.events)
        if ns.streaming:
            if not ns.out:
                sys.exit("--streaming requires --out <dir> for the "
                         "parquet sink")
            if os.path.isfile(ns.events):
                sys.exit("--streaming watches a DIRECTORY for new "
                         f"files; {ns.events!r} is a single file "
                         "(put it in a dir, or drop --streaming for "
                         "a one-shot batch read)")
            src = spark.readStream.schema(static.schema) \
                .parquet(ns.events)
        else:
            src = static
        if ns.command == "attribution":
            need = {"event_id", "event_type", "user_id", "ts"}
            if not need.issubset(static.columns):
                sys.exit(f"--events must carry columns {sorted(need)} "
                         f"(have {static.columns})")
            # state is bounded by watermark + the join's time range;
            # matches later than the watermark are DESIGNED to drop,
            # so it defaults to the attribution window itself
            out_df = attribution_pairs(
                src, base_type=ns.base_type,
                trigger_type=ns.trigger_type, max_delay=ns.max_delay,
                watermark=(ns.watermark or ns.max_delay)
                if ns.streaming else None)
        else:
            keys = [k for k in ns.keys.split(",") if k]
            missing = [k for k in keys if k not in static.columns]
            if not keys or missing:
                sys.exit(f"--keys {ns.keys!r} not all events columns "
                         f"(have {static.columns})")
            out_df = dedup_event_stream(
                src, keys=keys, watermark=ns.watermark or "1 hour")
        if ns.streaming:
            ckpt = ns.checkpoint or os.path.join(ns.out, "_checkpoint")
            q = (out_df.writeStream.format("parquet")
                 .option("path", ns.out)
                 .option("checkpointLocation", ckpt)
                 .outputMode("append").trigger(availableNow=True)
                 .start())
            q.awaitTermination()
            print(json.dumps({ns.command: {
                "out": ns.out, "checkpoint": ckpt,
                "rows_total": spark.read.parquet(ns.out).count()}},
                indent=1))
        elif ns.command == "attribution":
            print(json.dumps({"pairs": out_df.count()}))
            for r in (out_df.orderBy("trig_ts", "trig_id", "base_id")
                      .limit(ns.limit).collect()):
                print(json.dumps(r.asDict(), default=str))
        else:
            print(json.dumps({"events_in": static.count(),
                              "events_out": out_df.count()}))
            for r in (out_df.orderBy("ts", *keys).limit(ns.limit)
                      .collect()):
                print(json.dumps(r.asDict(), default=str))
    elif ns.command in ("funnel", "retention", "transitions"):
        # product-analytics reports over an events dir: funnel = the
        # monotone conversion curve (users reaching at least step k of
        # --steps, first-touch anchored, optional --within window);
        # retention = the weekly cohort triangle (optionally cohorted
        # on the first --cohort-type event). Both are one-shot batch
        # reads of the same events shape attribution consumes.
        from neo4j_document_pipeline_spark.operators.funnel import (
            funnel_counts, retention_cohorts)
        if not ns.events:
            sys.exit(f"--events <parquet dir> required for {ns.command}")
        import glob as _glob
        import re as _re
        if not _re.match(r"^[A-Za-z][A-Za-z0-9+.-]*://", ns.events) \
                and not _glob.glob(ns.events):
            sys.exit(f"no such events path {ns.events!r}")
        events = spark.read.parquet(ns.events)
        need = {"event_type", "user_id", "ts"}
        if not need.issubset(events.columns):
            sys.exit(f"--events must carry columns {sorted(need)} "
                     f"(have {events.columns})")
        if ns.command == "transitions":
            # the first-order Markov census: what follows each event
            # type, with exact counts and row-normalized probabilities
            from pyspark.sql import functions as F

            from neo4j_document_pipeline_spark.operators.sequences import (
                event_transitions)
            tiebreak = ("event_id" if "event_id" in events.columns
                        else "ts")
            out = (event_transitions(events, tiebreak_col=tiebreak)
                   .orderBy(F.desc("n"), "state", "next_state")
                   .limit(ns.limit).collect())
            print(json.dumps({"transitions": [
                {"state": r["state"], "next_state": r["next_state"],
                 "n": r["n"], "p": round(r["p"], 6)} for r in out]},
                indent=1))
        elif ns.command == "funnel":
            steps = [s.strip() for s in ns.steps.split(",") if s.strip()]
            if not steps:
                sys.exit("--steps must name at least one event type "
                         "(comma-separated, in funnel order)")
            counts = {r["step"]: r["n_users"] for r in
                      funnel_counts(events, steps,
                                    within=ns.within).collect()}
            report = [{"step": i + 1, "event_type": s,
                       "n_users": counts.get(i + 1, 0)}
                      for i, s in enumerate(steps)]
            print(json.dumps({"funnel": report,
                              "within": ns.within}, indent=1))
        else:
            tri = (retention_cohorts(events, cohort_type=ns.cohort_type)
                   .orderBy("cohort_week", "week_index")
                   .limit(ns.limit).collect())
            print(json.dumps({"retention": [
                {"cohort_week": str(r["cohort_week"]),
                 "week_index": r["week_index"], "n_users": r["n_users"]}
                for r in tri], "cohort_type": ns.cohort_type}, indent=1))
    elif ns.command == "hygiene":
        # corpus-quality report over the committed documents table —
        # the pre-training checklist in one command: size/token totals,
        # language mix, quality + repetition signals, PII exposure.
        # Exact duplicates are ABSENT BY CONSTRUCTION here (doc_id =
        # sha256(text), the ingest MERGE collapses them) — reported as
        # such rather than recounted. --near-dups adds the MinHash-LSH
        # transitive-resolution pass (the expensive half).
        from pyspark.sql import functions as F

        from neo4j_document_pipeline_spark.functions.textstats import (
            col_dup_line_fraction, col_dup_ngram_fraction, col_lang_id,
            col_pii_count, col_quality_score, col_token_count,
            col_top_ngram)
        _tg = col_top_ngram(F.col("text"), 2)
        # prefer the durable MERGE-maintained table: an incremental-only
        # store commits documents_final but never the per-batch
        # `documents` intermediate
        doc_table = ("documents_final" if store.exists("documents_final")
                     else "documents")
        docs = store.read(doc_table).select("doc_id", "text")
        overall = docs.agg(
            F.count("*").alias("n_docs"),
            F.sum(col_token_count(F.col("text"))).alias("tokens_total"),
            F.round(F.avg(col_quality_score(F.col("text"))), 4)
            .alias("quality_mean"),
            F.round(F.min(col_quality_score(F.col("text"))), 4)
            .alias("quality_min"),
            F.sum((col_dup_line_fraction(F.col("text")) > 0.3)
                  .cast("long")).alias("docs_line_repetitive"),
            F.sum((col_dup_ngram_fraction(F.col("text"), 3) > 0.2)
                  .cast("long")).alias("docs_ngram_repetitive"),
            # Gopher top-2-gram rule: one phrase claiming > 20% of the
            # document's characters (looping text the duplicate-gram
            # fractions dilute)
            F.sum((F.when(
                col_token_count(F.col("text")) >= 2,
                _tg["best"] * F.length(_tg["bestg"]) / _tg["total"])
                .otherwise(F.lit(0.0)) > 0.2).cast("long"))
            .alias("docs_topgram_heavy"),
            F.sum(col_pii_count(F.col("text"), "email"))
            .alias("pii_emails"),
            F.sum(col_pii_count(F.col("text"), "ipv4")).alias("pii_ips"),
            F.sum(col_pii_count(F.col("text"), "phone"))
            .alias("pii_phones"),
        ).collect()[0].asDict()
        langs = {r["lang"]: r["n"] for r in
                 docs.groupBy(col_lang_id(F.col("text")).alias("lang"))
                 .agg(F.count("*").alias("n")).collect()}
        # token-length distribution from the deterministic hash sample
        # (exact when the corpus fits the sample budget; the manifest
        # row count sizes the rate — no extra count job)
        from neo4j_document_pipeline_spark.operators.sketches import (
            hash_sample_quantiles)
        n_docs = (store.manifest(doc_table) or {}).get("rows") or 0
        qrate = min(1.0, 200_000 / n_docs) if n_docs else 1.0
        tl = hash_sample_quantiles(
            docs.select("doc_id",
                        col_token_count(F.col("text")).alias("n_tok")),
            "n_tok", [0.5, 0.9, 0.99], "doc_id", rate=qrate).collect()
        report_tl = {f"p{int(r['p'] * 100)}": r["value"] for r in tl}
        report_tl["sample_rate"] = qrate
        # corpus-level bigram diversity: the mode-collapse probe — a
        # synthetic or boilerplate-heavy corpus sits far below organic
        # text long before exact dedup would fire
        from neo4j_document_pipeline_spark.operators.corpus import (
            ngram_diversity)
        drow = ngram_diversity(
            docs.select(F.lit("all").alias("_g"), "text"),
            "_g", "text", ns=(2,)).collect()
        diversity = ({"total_bigrams": drow[0]["total_grams"],
                      "distinct_bigrams": drow[0]["distinct_grams"],
                      "diversity": round(drow[0]["diversity"], 6)}
                     if drow else {"total_bigrams": 0})
        report = {"hygiene": overall, "lang_mix": langs,
                  "token_length_quantiles": report_tl,
                  "bigram_diversity": diversity,
                  "exact_dups": "collapsed at ingest (doc_id = "
                                "sha256(text))"}
        # C4 rule exposure (Raffel et al. 2019 §2.2): how much of the
        # corpus the standard web-cleaning pass would keep, and which
        # rule bites — one extra narrow scan
        from neo4j_document_pipeline_spark.operators.corpus import (
            c4_quality_filters)
        c4row = c4_quality_filters(docs, "doc_id", "text").agg(
            F.sum(F.col("keep").cast("long")).alias("docs_keep"),
            F.sum(F.col("has_lorem").cast("long")).alias("docs_lorem"),
            F.sum(F.col("has_brace").cast("long")).alias("docs_brace"),
            F.sum(F.col("has_badword").cast("long"))
            .alias("docs_badword"),
            F.sum((F.col("sentences_kept") < 3).cast("long"))
            .alias("docs_too_few_sentences"),
            F.round(F.avg(F.col("lines_kept")
                          / F.greatest(F.col("lines_total"),
                                       F.lit(1))), 6)
            .alias("line_keep_frac_mean"),
        ).collect()[0].asDict()
        c4row["keep_rate"] = round(
            (c4row["docs_keep"] or 0)
            / max(overall["n_docs"] or 0, 1), 6)
        report["c4_rules"] = c4row
        # Gopher rule exposure (Rae et al. 2021 table A1): the page-
        # shape sibling of the C4 block — per-rule bite counts and the
        # keep rate, one more narrow scan
        from neo4j_document_pipeline_spark.operators.corpus import (
            gopher_quality_filters)
        gmin = ns.gopher_min_words
        grow = gopher_quality_filters(
            docs, "doc_id", "text", min_words=gmin).agg(
            F.sum(F.col("keep").cast("long")).alias("docs_keep"),
            F.sum((F.col("n_words") < gmin).cast("long"))
            .alias("docs_too_short"),
            F.sum(((F.col("mean_word_len") < 3.0)
                   | (F.col("mean_word_len") > 10.0)).cast("long"))
            .alias("docs_word_len"),
            F.sum((F.col("symbol_ratio") > 0.1).cast("long"))
            .alias("docs_symbol_heavy"),
            F.sum((F.col("alpha_word_frac") < 0.8).cast("long"))
            .alias("docs_low_alpha"),
            F.sum((F.col("n_stopwords") < 2).cast("long"))
            .alias("docs_no_stopwords"),
        ).collect()[0].asDict()
        grow = {k: int(v or 0) for k, v in grow.items()}
        grow["min_words"] = gmin
        grow["keep_rate"] = round(
            grow["docs_keep"] / max(overall["n_docs"] or 0, 1), 6)
        report["gopher_rules"] = grow
        if ns.near_dups:
            from neo4j_document_pipeline_spark.operators.dedup import (
                resolve_near_duplicates)
            res = resolve_near_duplicates(docs, "doc_id", "text")
            near = res.agg(
                F.count("*").alias("docs_in_clusters"),
                F.countDistinct("keep_id").alias("clusters"),
                F.coalesce(F.sum((~F.col("is_kept")).cast("long")),
                           F.lit(0)).alias("removable")) \
                .collect()[0].asDict()
            report["near_dups"] = near
        # gate state, when the store was ingested with the hygiene
        # gates: how much boilerplate the line gate knows about, and
        # how many documents the near-dup signature table covers
        if store.exists("line_postings"):
            # the threshold the store was actually gated with is
            # stamped in the state manifest; counting "boilerplate" at
            # any other N would misstate what the gate strips
            mdf = ((store.manifest("line_postings") or {})
                   .get("metrics") or {}).get("min_doc_freq") or 2
            lp = store.read("line_postings")
            gs = lp.agg(
                F.countDistinct("lkey").alias("distinct_lines"),
                F.countDistinct(
                    F.when(F.col("df") >= int(mdf), F.col("lkey")))
                .alias("boilerplate_lines")).collect()[0].asDict()
            gs["min_doc_freq"] = int(mdf)
            report["line_gate_state"] = gs
        if ns.dup_spans:
            from neo4j_document_pipeline_spark.operators.dedup import (
                duplicate_span_stats)
            st = duplicate_span_stats(docs, "doc_id", "text",
                                      k=ns.span_k,
                                      min_count=ns.span_min_count)
            report["dup_spans"] = st.agg(
                F.sum((F.col("n_spans") > 0).cast("long"))
                .alias("docs_with_spans"),
                F.sum("dup_tokens").alias("dup_tokens"),
                F.round(F.sum("dup_tokens")
                        / F.greatest(F.sum("n_tok"), F.lit(1)), 6)
                .alias("dup_token_frac"),
            ).collect()[0].asDict()
            report["dup_spans"]["span_k"] = ns.span_k
        if store.exists("gram_postings"):
            gm = ((store.manifest("gram_postings") or {})
                  .get("metrics") or {})
            mc = gm.get("span_min_count") or 2
            # corpus evidence lives in the kept=false RAW rows (the
            # kept=true rows are the post-cut survivors and would
            # undercount by construction)
            gp = store.read("gram_postings").filter(~F.col("kept"))
            sg = gp.groupBy("gkey").agg(F.sum("n").alias("tot")).agg(
                F.count("*").alias("distinct_grams"),
                F.sum((F.col("tot") >= int(mc)).cast("long"))
                .alias("duplicated_grams")).collect()[0].asDict()
            sg["span_k"] = gm.get("span_k")
            sg["span_min_count"] = int(mc)
            report["span_gate_state"] = sg
        if store.exists("corpus_sketches"):
            # corpus questions answered from the KB-sized sketch state
            # (no scan): exact token total, KMV vocab estimate
            from neo4j_document_pipeline_spark.operators.sketches import (
                corpus_sketch_summary)
            report["sketch_state"] = corpus_sketch_summary(
                store.read("corpus_sketches"))
        if store.exists("doc_signatures"):
            report["near_dup_gate_state"] = {
                "signed_docs": store.read("doc_signatures")
                .select("doc_id").distinct().count()}
        print(json.dumps(report, indent=1, default=str))
    elif ns.command == "spans":
        # exact-substring duplicated-region report (Lee et al. 2022):
        # which documents contain corpus-duplicated runs of >= span-k
        # tokens, and how much of the corpus those runs claim — the
        # signal document-level dedup can't see (each page unique, the
        # pasted paragraph inside it is not)
        from pyspark.sql import functions as F

        from neo4j_document_pipeline_spark.operators.dedup import (
            duplicate_span_stats)
        doc_table = ("documents_final" if store.exists("documents_final")
                     else "documents")
        docs = store.read(doc_table).select("doc_id", "text")
        st = duplicate_span_stats(docs, "doc_id", "text", k=ns.span_k,
                                  min_count=ns.span_min_count).cache()
        totals = st.agg(
            F.count("*").alias("n_docs"),
            F.sum((F.col("n_spans") > 0).cast("long"))
            .alias("docs_with_spans"),
            F.sum("n_tok").alias("tokens_total"),
            F.sum("dup_tokens").alias("dup_tokens"),
            F.round(F.sum("dup_tokens")
                    / F.greatest(F.sum("n_tok"), F.lit(1)), 6)
            .alias("dup_token_frac"),
        ).collect()[0].asDict()
        top = [r.asDict() for r in
               st.filter(F.col("n_spans") > 0)
               .orderBy(F.desc("dup_frac"), "doc_id")
               .limit(ns.limit).collect()]
        print(json.dumps(
            {"span_k": ns.span_k, "min_count": ns.span_min_count,
             "totals": totals, "top": top}, indent=1, default=str))
    elif ns.command == "semdedup":
        # semantically-duplicate ENTITIES (SemDeDup over the committed
        # node embeddings): the paraphrase/alias duplicates the lexical
        # TF-IDF linker misses; reports clusters + removable count and
        # the top surviving<-removed name pairs
        from pyspark.sql import functions as F

        from neo4j_document_pipeline_spark.operators.clustering import (
            semantic_dedup)
        nodes = store.read("nodes").select("entity_id", "name",
                                           "embedding")
        res = semantic_dedup(nodes, "entity_id", "embedding",
                             k=ns.clusters, iters=ns.km_iters,
                             threshold=ns.sem_threshold).cache()
        summary = res.agg(
            F.count("*").alias("docs_in_clusters"),
            F.countDistinct("keep_id").alias("clusters"),
            F.coalesce(F.sum((~F.col("is_kept")).cast("long")),
                       F.lit(0)).alias("removable"),
        ).collect()[0].asDict()
        names = nodes.select("entity_id", "name")
        pairs = (res.filter(~F.col("is_kept"))
                 .join(names, "entity_id")
                 .join(names.select(F.col("entity_id").alias("keep_id"),
                                    F.col("name").alias("keep_name")),
                       "keep_id")
                 .orderBy("keep_id", "entity_id")
                 .limit(ns.limit).collect())
        print(json.dumps(
            {"clusters_k": ns.clusters, "threshold": ns.sem_threshold,
             "summary": summary,
             "pairs": [{"keep": r["keep_name"], "dup": r["name"]}
                       for r in pairs]}, indent=1, default=str))
    elif ns.command == "status":
        # /queue_stats analogue; with a stage/table name, /ingest/status
        from neo4j_document_pipeline_spark.operators.admin import (
            ingest_status, queue_stats)
        if ns.args:
            print(json.dumps(ingest_status(store, ns.args[0]), indent=1))
        else:
            print(json.dumps(queue_stats(store, spark), indent=1))
    elif ns.command == "stream":
        # Structured-Streaming ingest (the Celery-queue replacement):
        # availableNow trigger drains every unprocessed file under
        # --pages into the store via the MERGE increment path, then
        # stops; re-running picks up only NEW files (checkpointed).
        from neo4j_document_pipeline_spark.streaming.ingest import (
            start_ingest_stream)
        if not ns.pages:
            sys.exit("--pages <parquet dir> required for stream")
        if ns.pages.startswith(("synth:", "warc:")):
            sys.exit(f"stream reads a parquet dir of pages, not "
                     f"{ns.pages.split(':', 1)[0]}: inputs — write the "
                     "corpus to parquet first (or use ingest)")
        import re as _re
        if not _re.match(r"^[A-Za-z][A-Za-z0-9+.-]*://", ns.pages) \
                and not os.path.exists(ns.pages):
            sys.exit(f"no such parquet path {ns.pages!r}")
        ckpt = ns.checkpoint or os.path.join(ns.store, "_stream_checkpoint")
        q = start_ingest_stream(
            spark, ns.pages, ns.store, ckpt, cfg=_cfg_from_args(ns),
            text_source=ns.text_source, min_quality=ns.min_quality,
            langs=ns.langs.split(",") if ns.langs else None,
            redact_pii=ns.redact_pii,
            dedup_lines=ns.dedup_lines,
            strip_spans=ns.strip_spans,
            span_k=ns.span_k,
            span_min_count=ns.span_min_count,
            resolve_near_dups=ns.resolve_near_dups,
            near_dup_threshold=ns.near_dup_threshold,
            track_sketches=ns.track_sketches,
            keep_versions=ns.keep_versions,
            max_files_per_trigger=ns.max_files_per_trigger)
        q.awaitTermination()
        print(json.dumps({
            "stream": {"checkpoint": ckpt, "tables": {
                k: (store.manifest(k) or {}).get("rows")
                for k in ("nodes", "edges", "mentions", "documents_final")}}},
            indent=1))
    elif ns.command == "history":
        # snapshot log (Iceberg t.snapshots analogue) for a table
        if not ns.args:
            sys.exit("history requires a table name, e.g. history nodes")
        print(json.dumps([
            {k: h.get(k) for k in ("version", "parent_version", "rows",
                                   "n_files", "committed_at_unix", "stage")}
            for h in store.history(ns.args[0])], indent=1))
    elif ns.command == "compact":
        # OPTIMIZE analogue: rewrite a table's small files
        if not ns.args:
            sys.exit("compact requires a table name, e.g. compact edges")
        m = store.compact(ns.args[0])
        print(json.dumps({"table": ns.args[0], "version": m["version"],
                          "rows": m["rows"], "n_files": m["n_files"]},
                         indent=1))
    elif ns.command == "vacuum":
        # remove_orphan_files analogue: crash debris older than the grace
        # window, per table (or every table without an argument)
        if ns.args:
            names = ns.args
        elif os.path.isdir(ns.store):
            names = sorted(os.listdir(ns.store))
        else:
            names = []
        out = {n: store.vacuum(n) for n in names}
        print(json.dumps({"vacuumed": {k: v for k, v in out.items() if v}
                          or "nothing to remove"}, indent=1))
    elif ns.command == "drift":
        # PSI distribution drift of a column between two committed
        # snapshot versions: `drift <table> <col> <v_old> <v_new>`
        # (or omit versions to compare the two newest retained) — the
        # per-batch monitoring alarm for a continuously-ingesting store
        from pyspark.sql import functions as F

        from neo4j_document_pipeline_spark.operators.profile import (
            psi_drift)
        if len(ns.args) not in (2, 4):
            sys.exit("drift: usage — drift <table> <col> "
                     "[<old_ver> <new_ver>]")
        table, col = ns.args[0], ns.args[1]
        if len(ns.args) == 4:
            v_old, v_new = ns.args[2], ns.args[3]
        else:
            hist = store.history(table)
            cur = store.manifest(table)
            vers = [h["version"] for h in hist]
            if cur and cur["version"] not in vers:
                vers.append(cur["version"])
            # newest two RETAINED snapshots (history also lists expired)
            readable = []
            for v in reversed(vers):
                try:
                    store.read_version(table, v)
                    readable.append(v)
                except FileNotFoundError:
                    continue
                if len(readable) == 2:
                    break
            if len(readable) < 2:
                sys.exit(f"drift: {table} has fewer than two retained "
                         "snapshots; pass versions explicitly")
            v_new, v_old = readable
        old = store.read_version(table, v_old)
        new = store.read_version(table, v_new)
        if col not in old.columns or col not in new.columns:
            sys.exit(f"drift: column {col!r} not in both snapshots")
        terms = (psi_drift(old, new, col)
                 .orderBy(F.desc(F.abs(F.col("psi_term"))), "category")
                 .collect())
        psi = sum(r["psi_term"] for r in terms)
        # the convention psi_drift documents: < 0.1 stable,
        # 0.1-0.25 drifting (inclusive), > 0.25 broken
        verdict = ("stable" if psi < 0.1
                   else "drifting" if psi <= 0.25 else "broken")
        print(json.dumps({
            "table": table, "column": col, "v_old": v_old,
            "v_new": v_new, "psi": round(psi, 6), "verdict": verdict,
            "top_terms": [
                {"category": r["category"], "n_base": r["n_base"],
                 "n_cur": r["n_cur"],
                 "psi_term": round(r["psi_term"], 6)}
                for r in terms[:ns.limit]]}))
    elif ns.command == "partition":
        # Spinner-style balanced k-way partitioning over the KG edges,
        # reported as before/after edge-cut censuses — the placement
        # decision (and its evidence) for co-locating neighborhoods
        # ahead of iterative analytics at scale
        from neo4j_document_pipeline_spark.operators.layout import (
            balanced_partitions, edge_cut_stats, multilevel_partitions)
        e = _kg_edges(store)
        if e.isEmpty():
            sys.exit("partition: the store has no edges")
        hash_assign = balanced_partitions(e, ns.parts, iters=0)
        if ns.levels > 0:
            refined = multilevel_partitions(e, ns.parts,
                                            levels=ns.levels,
                                            refine_iters=ns.iters)
        else:
            refined = balanced_partitions(e, ns.parts, iters=ns.iters)
        before = edge_cut_stats(e, hash_assign).first().asDict()
        after = edge_cut_stats(e, refined).first().asDict()
        print(json.dumps({"parts": ns.parts, "iters": ns.iters,
                          "levels": ns.levels,
                          "hash_cut": before, "refined_cut": after}))
    elif ns.command == "neighborhoods":
        # deterministic GraphSAGE computation graphs for the named seed
        # entities — the mini-batch sampling a GNN trainer consumes,
        # reproducible across runs/partitionings by construction
        from pyspark.sql import functions as F

        from neo4j_document_pipeline_spark.operators.kgtrain import (
            sample_neighborhoods)
        if not ns.seeds:
            sys.exit("neighborhoods: --seeds entity names are required")
        seed_ids = _resolve_seed_ids(store, ns.seeds.split(","))
        if not seed_ids:
            sys.exit(f"--seeds: no entity named any of {ns.seeds!r}")
        try:
            fanouts = [int(x) for x in ns.fanouts.split(",")]
        except ValueError:
            sys.exit(f"--fanouts must be comma-separated ints, "
                     f"got {ns.fanouts!r}")
        if not fanouts or any(f < 1 for f in fanouts):
            sys.exit(f"--fanouts must all be >= 1, got {ns.fanouts!r}")
        spark = store.spark
        seeds = spark.createDataFrame([(s,) for s in seed_ids],
                                      "id string")
        out = sample_neighborhoods(_kg_edges(store).withColumnRenamed(
            "u", "src").withColumnRenamed("v", "dst"), seeds, fanouts)
        names = store.read("nodes").select(
            F.col("entity_id").alias("dst"), F.col("name").alias("dst_name"))
        rows = (out.join(names, "dst", "left")
                .orderBy("root", "hop", "src", "dst").collect())
        for r in rows:
            print(json.dumps(r.asDict(), default=str))
    elif ns.command == "drop":
        from neo4j_document_pipeline_spark.operators.admin import drop_all
        print(json.dumps(drop_all(store)))


if __name__ == "__main__":
    main()
