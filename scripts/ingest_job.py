"""Standalone KG-ingest job — the north-rule throughput workload.

Run via spark-submit (or plain python) at a chosen parallelism:

    spark-submit --py-files kg_pipeline.zip scripts/ingest_job.py \
        --master local[32] --n-pages 20000 [--store /tmp/kg]

Generates the deterministic synthetic pages corpus DISTRIBUTED, runs the
full write path (canonicalize -> chunk -> rule extraction -> graph
materialize with MERGE semantics), and prints one JSON line with wall
time + docs/sec (excluding session startup).
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--master", default="local[32]")
    ap.add_argument("--n-pages", type=int, default=20000)
    ap.add_argument("--store", default=None)
    ap.add_argument("--paras", type=int, default=10,
                    help="sections per page (~page size); 10 ~ 3KB pages")
    ap.add_argument("--skip-store", action="store_true",
                    help="time extraction+graph-build only (counts), no parquet writes")
    ap.add_argument("--repeat", type=int, default=3,
                    help="timed repetitions; best run reported (noisy host)")
    ap.add_argument("--event-log-dir", default=None,
                    help="write the Spark event log here (for "
                         "scripts/slot_efficiency.py analysis)")
    args = ap.parse_args()

    cores = args.master.split("[")[-1].rstrip("]")
    cores = int(cores) if cores.isdigit() else os.cpu_count()

    from pyspark.sql import SparkSession

    b = (
        SparkSession.builder.master(args.master)
        .appName(f"kg-ingest-{cores}c")
        .config("spark.sql.shuffle.partitions", str(max(8, cores)))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_MEM", "48g"))
    )
    if args.event_log_dir:
        os.makedirs(args.event_log_dir, exist_ok=True)
        b = (b.config("spark.eventLog.enabled", "true")
             .config("spark.eventLog.dir", args.event_log_dir)
             # plain JSONL so slot_efficiency.py can parse without a
             # zstd codec (absent from this environment)
             .config("spark.eventLog.compress", "false"))
    spark = b.getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    from neo4j_document_pipeline_spark.operators.graph import build_graph
    from neo4j_document_pipeline_spark.operators.ingest import (
        chunks_to_triples, documents_to_chunks, pages_to_documents)
    from neo4j_document_pipeline_spark.plans.pipeline import run_pipeline
    from neo4j_document_pipeline_spark.sources.pages import synth_pages

    pages = synth_pages(spark, args.n_pages, partitions=max(8, cores * 2),
                        paras=args.paras)

    # Warm-up: run the identical plan shapes on a tiny prefix first so
    # python-worker spawn + whole-stage-codegen JIT (one-time, several
    # seconds, and proportional to core count) are excluded from the
    # throughput measurement — a cluster's steady-state docs/sec is the
    # north-rule metric, not JVM cold-start.
    # tagged so event-log analysis (scripts/slot_efficiency.py) can
    # exclude cold-start stages from the efficiency evidence
    spark.sparkContext.setJobGroup("warmup", "cold-start warm-up")
    warm = synth_pages(spark, cores * 8, partitions=cores)
    wdocs = pages_to_documents(warm)
    wtrip = chunks_to_triples(documents_to_chunks(wdocs)).localCheckpoint()
    build_graph(wtrip)[1].count()
    spark.sparkContext.setJobGroup("", "")

    def one_run():
        if args.skip_store:
            from neo4j_document_pipeline_spark.operators.graph import (
                build_edges, build_embeddings_cache, build_mentions,
                build_nodes)
            from concurrent.futures import ThreadPoolExecutor

            documents = pages_to_documents(pages)
            chunks = documents_to_chunks(documents).persist()
            # materialize triples once — nodes/edges/mentions branch off it
            triples = chunks_to_triples(chunks).persist()
            emb = build_embeddings_cache(triples).persist()
            emb.count()  # barrier: emb is shared by the branches below
            # submit the three independent output branches CONCURRENTLY —
            # their stages interleave in the scheduler, hiding per-stage
            # barrier latency (the non-scaling tail of the job)
            with ThreadPoolExecutor(3) as ex:
                fn = ex.submit(lambda: build_nodes(triples, emb).count())
                fe = ex.submit(lambda: build_edges(triples, emb,
                                                   chunks=chunks).count())
                fm = ex.submit(lambda: build_mentions(triples).count())
                out = {"nodes": fn.result(), "edges": fe.result(),
                       "mentions": fm.result()}
            chunks.unpersist()
            triples.unpersist()
            emb.unpersist()
            return out
        root = args.store or tempfile.mkdtemp(prefix="kg_scaling_")
        try:
            manifests = run_pipeline(spark, pages, root, resume=False)
            return {k: m.get("rows") for k, m in manifests.items()
                    if not k.startswith("_")}
        finally:
            if not args.store:
                shutil.rmtree(root, ignore_errors=True)

    walls, counts = [], {}
    for _ in range(max(1, args.repeat)):
        t0 = time.perf_counter()
        counts = one_run()
        walls.append(round(time.perf_counter() - t0, 3))
    wall = min(walls)  # steady-state throughput on a noisy shared host

    print(json.dumps({
        "job": "kg_ingest",
        "master": args.master,
        "cores": cores,
        "n_pages": args.n_pages,
        "wall_sec": wall,
        "all_walls_sec": walls,
        "docs_per_sec": round(args.n_pages / wall, 2),
        "counts": counts,
    }))


if __name__ == "__main__":
    main()
