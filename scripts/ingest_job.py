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
    ap.add_argument("--skip-store", action="store_true",
                    help="time extraction+graph-build only (counts), no parquet writes")
    args = ap.parse_args()

    cores = args.master.split("[")[-1].rstrip("]")
    cores = int(cores) if cores.isdigit() else os.cpu_count()

    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master(args.master)
        .appName(f"kg-ingest-{cores}c")
        .config("spark.sql.shuffle.partitions", str(max(8, cores)))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_MEM", "48g"))
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    from neo4j_document_pipeline_spark.operators.graph import build_graph
    from neo4j_document_pipeline_spark.operators.ingest import (
        chunks_to_triples, documents_to_chunks, pages_to_documents)
    from neo4j_document_pipeline_spark.plans.pipeline import run_pipeline
    from neo4j_document_pipeline_spark.sources.pages import synth_pages

    pages = synth_pages(spark, args.n_pages, partitions=max(8, cores * 2))

    t0 = time.perf_counter()
    if args.skip_store:
        documents = pages_to_documents(pages)
        triples = chunks_to_triples(documents_to_chunks(documents))
        nodes, edges, mentions, _ = build_graph(triples)
        n_nodes = nodes.count()
        n_edges = edges.count()
        counts = {"nodes": n_nodes, "edges": n_edges}
    else:
        root = args.store or tempfile.mkdtemp(prefix="kg_scaling_")
        try:
            manifests = run_pipeline(spark, pages, root, resume=False)
            counts = {k: m.get("rows") for k, m in manifests.items()}
        finally:
            if not args.store:
                shutil.rmtree(root, ignore_errors=True)
    wall = time.perf_counter() - t0

    print(json.dumps({
        "job": "kg_ingest",
        "master": args.master,
        "cores": cores,
        "n_pages": args.n_pages,
        "wall_sec": round(wall, 3),
        "docs_per_sec": round(args.n_pages / wall, 2),
        "counts": counts,
    }))


if __name__ == "__main__":
    main()
