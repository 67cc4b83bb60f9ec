"""Optimization-round instrumentation (guide §1). NOT the frozen bench.

Dumps (one JSON line):
- per-stage wall seconds of run_pipeline (manifests["_timings"]) for the
  kg_ingest_synth workload;
- per-phase timings of a graphrag query (GraphRagResult.timings);
- noop-sink isolated timings of the relational bench queries so the
  computation is timed without the collect/driver-serialization cost
  (guide §1.4).

Usage: python bench_extra.py [pipeline|graphrag|queries|all]
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
_SF = SF_DIR.rstrip("/").rsplit("sf", 1)[-1]
try:
    SF_NUM = float(_SF)
except ValueError:
    SF_NUM = 0.1
N_SYNTH = max(500, int(50_000 * SF_NUM))


def main():
    from pyspark.sql import SparkSession

    what = sys.argv[1] if len(sys.argv) > 1 else "all"
    spark = (
        SparkSession.builder.master(f"local[{CPUS}]")
        .appName("kg-pipeline-bench-extra")
        .config("spark.sql.shuffle.partitions", str(CPUS))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_MEM", "48g"))
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    import shutil

    from neo4j_document_pipeline_spark.plans.pipeline import run_pipeline
    from neo4j_document_pipeline_spark.sources.pages import synth_pages

    out: dict = {}
    roots: list[str] = []
    try:
        # warm-up identical to bench.py
        warm_root = tempfile.mkdtemp(prefix="kg_extra_warm_")
        roots.append(warm_root)
        spark.sparkContext.setJobDescription("warmup pipeline")
        run_pipeline(spark, synth_pages(spark, 8 * CPUS), warm_root,
                     resume=False)

        if what in ("pipeline", "all"):
            pages = synth_pages(spark, N_SYNTH)
            stage_runs = []
            for i in range(3):
                root = tempfile.mkdtemp(prefix="kg_extra_run_")
                roots.append(root)
                spark.sparkContext.setJobDescription(f"pipeline rep {i}")
                t0 = time.perf_counter()
                man = run_pipeline(spark, pages, root, resume=False)
                el = time.perf_counter() - t0
                stage_runs.append({"total": round(el, 3),
                                   **man["_timings"]})
            out["pipeline_stages"] = stage_runs
            store_root = roots[-1]
        else:
            root = tempfile.mkdtemp(prefix="kg_extra_run_")
            roots.append(root)
            run_pipeline(spark, synth_pages(spark, N_SYNTH), root,
                         resume=False)
            store_root = root

        if what in ("graphrag", "all"):
            from neo4j_document_pipeline_spark.operators.retrieval import (
                graphrag)
            from neo4j_document_pipeline_spark.sources.store import GraphStore
            store = GraphStore(store_root, spark)
            reps = []
            for i in range(4):
                spark.sparkContext.setJobDescription(f"graphrag rep {i}")
                t0 = time.perf_counter()
                res = graphrag(spark, store,
                               "Who developed algebra and optics?",
                               top_k=10, hops=2)
                el = time.perf_counter() - t0
                reps.append({"total": round(el, 3),
                             **{k: round(v, 3) if isinstance(v, float) else v
                                for k, v in res.timings.items()}})
            out["graphrag_phases"] = reps

        if what in ("queries", "all"):
            import __spark_entry__ as entrymod
            qs = entrymod.queries()
            qt = {}
            for name in ["pricing_summary", "hybrid_blend",
                         "sessionize_events", "round_robin_events",
                         "minmax_order_price", "cosine_topk"]:
                best = None
                for _ in range(3):
                    spark.sparkContext.setJobDescription(f"noop {name}")
                    t0 = time.perf_counter()
                    (qs[name](spark, SF_DIR).write.format("noop")
                     .mode("overwrite").save())
                    el = time.perf_counter() - t0
                    best = el if best is None else min(best, el)
                qt[name] = round(best, 3)
            out["noop_queries"] = qt
    finally:
        for r in roots:
            shutil.rmtree(r, ignore_errors=True)

    print(json.dumps(out))


if __name__ == "__main__":
    main()
