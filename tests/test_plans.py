"""Physical-plan assertions — the 100TB design checks.

Verifies (via explain output) that:
- parquet scans get column pruning + predicate pushdown;
- small/query-side joins go broadcast;
- the edge aggregation uses (Object)HashAggregate with partial
  aggregation, never a sort-based window over text payloads;
- top-k compiles to TakeOrderedAndProject (no global sort).
"""

import io
import os
from contextlib import redirect_stdout

import pytest
from pyspark.sql import functions as F

SF = "/root/testdata/sf0.001"


def plan_of(df) -> str:
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def test_parquet_scan_prunes_and_pushes_down(spark):
    li = spark.read.parquet(f"{SF}/lineitem.parquet")
    q = li.filter(F.col("l_shipdate") < "1996-01-01").select("l_orderkey", "l_quantity")
    p = plan_of(q)
    assert "PushedFilters: [IsNotNull(l_shipdate)" in p
    # ReadSchema restricted to needed columns only
    read_schema = [l for l in p.splitlines() if "ReadSchema" in l][0]
    assert "l_orderkey" in read_schema and "l_quantity" in read_schema
    assert "l_extendedprice" not in read_schema


def test_topk_is_take_ordered(spark):
    li = spark.read.parquet(f"{SF}/lineitem.parquet")
    q = li.orderBy(F.col("l_extendedprice").desc()).limit(5)
    assert "TakeOrderedAndProject" in plan_of(q)


def test_traversal_broadcasts_frontier(spark):
    from neo4j_document_pipeline_spark.operators.retrieval import traverse_neighbors
    edges = spark.createDataFrame(
        [("a", "b", "R")], "src_id string, dst_id string, rel_type string") \
        .withColumn("term", F.lit(None).cast("string")) \
        .withColumn("source_text_full", F.lit("")) \
        .withColumn("sources", F.array().cast("array<string>"))
    # small frontier: a pushed-down IN filter — no join node at all
    out = traverse_neighbors(edges, ["a"], 1, checkpoint=False)
    p = plan_of(out)
    assert "BroadcastNestedLoopJoin" not in p
    assert "Join" not in p  # pure scan filter
    # big frontier (forced via cap=0): an OR-of-equalities join would fall
    # back to a BroadcastNestedLoopJoin — O(|edges| x |frontier|) per hop
    # at scale; the operator must produce two broadcast HASH equi-joins
    out2 = traverse_neighbors(edges, ["a"], 1, checkpoint=False,
                              max_inline_frontier=0)
    p2 = plan_of(out2)
    assert "BroadcastNestedLoopJoin" not in p2
    assert p2.count("BroadcastHashJoin") >= 2


def test_edge_agg_is_hash_based_with_partial(spark):
    from neo4j_document_pipeline_spark.operators.graph import (
        build_edges, build_embeddings_cache)
    from neo4j_document_pipeline_spark.operators.ingest import (
        chunks_to_triples, documents_to_chunks, pages_to_documents)
    from neo4j_document_pipeline_spark.sources.pages import synth_pages
    pages = synth_pages(spark, 30)
    chunks = documents_to_chunks(pages_to_documents(pages))
    triples = chunks_to_triples(chunks)
    emb = build_embeddings_cache(triples)
    p = plan_of(build_edges(triples, emb, chunks=chunks))
    # the edge merge aggregation: ObjectHashAggregate (collect_set +
    # argmax-struct), with a partial mode before the exchange
    assert "ObjectHashAggregate" in p
    assert "Window" not in p


def test_minhash_lsh_join_is_equi_hash_not_cartesian(spark):
    from neo4j_document_pipeline_spark.operators.dedup import (
        minhash_near_duplicates)
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    p = plan_of(minhash_near_duplicates(docs, "doc_id", "text"))
    # LSH blocking exists precisely so candidate generation is an
    # equi-join on (band, band-hash) — a cartesian/NL join here would be
    # O(n^2) at 100TB
    assert "CartesianProduct" not in p
    assert "BroadcastNestedLoopJoin" not in p
    assert "SortMergeJoin" in p or "ShuffledHashJoin" in p or "BroadcastHashJoin" in p


def test_exact_dedup_groups_partial_agg_no_window(spark):
    from neo4j_document_pipeline_spark.operators.dedup import (
        exact_duplicate_groups)
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    p = plan_of(exact_duplicate_groups(docs, "doc_id", "text"))
    # hash-groupBy with map-side partial aggregation; text column is
    # hashed before the exchange so full text never shuffles
    assert "ObjectHashAggregate" in p or "HashAggregate" in p
    assert "Window" not in p
    # formatted explain puts partitioning in the numbered detail section
    parts = [l for l in p.splitlines() if "hashpartitioning(" in l]
    assert parts, "expected a hash exchange"
    assert all("content_hash" in l for l in parts), \
        "shuffle key must be the content hash, never the full text"


def test_cosine_scoring_is_whole_stage_codegen(spark):
    from neo4j_document_pipeline_spark.operators.similarity import brute_force_topk
    e = spark.read.parquet(f"{SF}/embeddings.parquet")
    q = [0.1] * 64
    p = plan_of(brute_force_topk(e, "vec_id", "embedding", q, 5))
    # scoring is pure JVM expression work (higher-order functions don't
    # whole-stage-codegen, but they are Catalyst expressions, not UDFs) and
    # the top-k compiles to TakeOrderedAndProject — no global sort
    assert "TakeOrderedAndProject" in p
    # no python evaluation nodes in the scoring path
    assert "ArrowEvalPython" not in p and "BatchEvalPython" not in p
    assert "pythonUDF" not in p


def test_keyword_channel_index_path_never_scans_names(spark):
    """With the committed inverted index and single query terms, the plan
    must probe the postings table only — no tokenize-explode-aggregate of
    the full nodes table per query (the round-1 read-path scale-killer)."""
    from neo4j_document_pipeline_spark.operators.retrieval import (
        build_node_tokens, keyword_channel)
    nodes = spark.createDataFrame(
        [("e1", "Entity", "Optics"), ("e2", "Stakeholder", "Al Khwarizmi")],
        "entity_id string, label string, name string")
    postings = build_node_tokens(nodes).localCheckpoint()
    out = keyword_channel(nodes, "optics geometry", 10,
                          n_nodes=2, postings=postings)
    p = plan_of(out)
    # the on-the-fly fallback tokenizes names (regexp_replace + explode)
    # and recounts document frequency (count(distinct ...)); the index
    # path must do neither
    assert "regexp_replace" not in p
    assert "explode" not in p
    assert "distinct" not in p.lower()


def test_bucketed_join_is_storage_partitioned(spark, tmp_path):
    """Two tables bucketed into the same N on their join keys equi-join
    with ZERO Exchange on either side (the SURVEY §1.3 bucket(entity_id)
    storage-partitioned join) — and the property survives a fresh
    catalog via manifest re-registration. Broadcast is disabled so the
    plan can't sidestep the question (at 100 TB neither side fits)."""
    from neo4j_document_pipeline_spark.sources.store import GraphStore
    st = GraphStore(str(tmp_path / "kg"), spark)
    nodes = spark.range(0, 500).selectExpr(
        "concat('e', id) AS entity_id", "concat('n', id) AS name")
    edges = spark.range(0, 2000).selectExpr(
        "concat('e', id % 500) AS src_id",
        "concat('e', (id * 7) % 500) AS dst_id")
    st.write_bucketed("nodes", nodes, bucket_by="entity_id", n_buckets=8)
    st.write_bucketed("edges", edges, bucket_by="src_id", n_buckets=8)
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        n, e = st.read("nodes"), st.read("edges")
        j = e.join(n, e.src_id == n.entity_id)
        p = plan_of(j)
        assert "Exchange" not in p, p
        assert p.count("Bucketed: true") == 2, p
        assert j.count() == 2000

        # control: the SAME join over plain-parquet copies must shuffle
        pn = spark.read.parquet(f"{st.root}/nodes/" +
                                st.manifest("nodes")["version"])
        pe = spark.read.parquet(f"{st.root}/edges/" +
                                st.manifest("edges")["version"])
        assert "Exchange" in plan_of(pe.join(pn, pe.src_id == pn.entity_id))

        # fresh-session simulation: drop the catalog entries; read() must
        # re-register from the manifest and keep the bucketed scan
        for t in ("nodes", "edges"):
            spark.sql(f"DROP TABLE IF EXISTS {st.manifest(t)['catalog_table']}")
        st._df_cache = {}
        n2, e2 = st.read("nodes"), st.read("edges")
        p2 = plan_of(e2.join(n2, e2.src_id == n2.entity_id))
        assert "Exchange" not in p2 and p2.count("Bucketed: true") == 2, p2
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


def test_salted_bounded_sources_semantics(spark):
    """The salted two-phase bounded-sources accumulation (head-entity
    skew handling) must emit exactly the N lexicographically-smallest
    distinct doc_ids per edge — identical to the single-phase spec —
    while holding at most salt_buckets x N ids on the merge reducer."""
    import dataclasses

    from neo4j_document_pipeline_spark.config import DEFAULT_CONFIG
    from neo4j_document_pipeline_spark.operators.graph import (
        build_edges, build_embeddings_cache)
    schema = ("doc_id string, chunk_id string, chunk_idx int, "
              "subject string, predicate string, object string, "
              "subject_type string, object_type string, rel_type string, "
              "object_kind string, start string, end string, "
              "pillar string, term string, count int")
    # one celebrity edge (many docs) + one normal edge
    rows = [(f"doc{i:03d}", f"c{i}", 0, "Star", "likes", "Fame",
             "Entity", "Entity", "likes", "entity",
             None, None, None, None, None) for i in range(40)]
    rows += [("doc900", "c900", 0, "Quiet", "likes", "Calm",
              "Entity", "Entity", "likes", "entity",
              None, None, None, None, None)]
    triples = spark.createDataFrame(rows, schema)
    emb = build_embeddings_cache(triples)
    cfg = dataclasses.replace(DEFAULT_CONFIG, max_sources_per_edge=3,
                              salt_buckets=4)
    got = {(r["src_id"], r["dst_id"]): r["sources"]
           for r in build_edges(triples, emb, cfg).collect()}
    star = next(v for k, v in got.items() if len(v) == 3)
    assert star == ["doc000", "doc001", "doc002"]
    assert ["doc900"] in got.values()
    # degenerate bucket count behaves identically
    cfg1 = dataclasses.replace(cfg, salt_buckets=1)
    got1 = {(r["src_id"], r["dst_id"]): r["sources"]
            for r in build_edges(triples, emb, cfg1).collect()}
    assert got1 == got


def test_ivf_cell_partition_pruning(spark, tmp_path):
    """The IVF scale path: vectors written partitioned by assigned cell,
    ivf_topk's probe filter must reach the scan as a PARTITION filter —
    at 100 TB only nprobe/n_cells of the table is listed, let alone
    read."""
    from neo4j_document_pipeline_spark.operators.similarity import (
        ivf_assign, ivf_topk, ivf_train)
    from neo4j_document_pipeline_spark.sources.store import GraphStore
    e = spark.read.parquet(f"{SF}/embeddings.parquet")
    cents = ivf_train(e, "vec_id", "embedding", n_cells=4, iters=2)
    st = GraphStore(str(tmp_path / "kg"), spark)
    st.write("vectors_ivf", ivf_assign(e, "embedding", cents),
             partition_by=["cell"])
    stored = st.read("vectors_ivf")
    q = e.first()["embedding"]
    topk = ivf_topk(stored, "vec_id", "embedding", cents, list(q),
                    k=5, nprobe=2, cell_col="cell")
    p = plan_of(topk)
    seg = p[p.find("PartitionFilters"):].splitlines()[0]
    assert "cell" in seg and ("IN" in seg.upper() or "In(" in seg), p[:2000]
    rows = topk.collect()
    assert 0 < len(rows) <= 5


def test_slot_efficiency_analysis_shape(tmp_path):
    """scripts/slot_efficiency.py: run the ingest job with event logging
    and verify the analysis produces sane per-stage efficiencies."""
    import json
    import subprocess
    import sys

    out = subprocess.run(
        [sys.executable, "scripts/slot_efficiency.py", "run",
         "--n-pages", "500", "--cores", "4"],
        capture_output=True, text=True, timeout=420,
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    assert out.returncode == 0, out.stderr[-2000:]
    d = json.loads([l for l in out.stdout.splitlines() if l.startswith("{")][-1])
    assert d["cores"] == 4 and d["stages"]
    assert 0.0 < d["weighted_mean_efficiency"] <= 1.0
    for r in d["stages"]:
        # a near-idle stage can round to 0.000 on a contended host; the
        # weighted mean above is the meaningful signal
        assert 0.0 <= r["efficiency"] <= 1.0 and r["tasks"] > 0


def test_node_vectors_probe_is_partition_pruned(spark, tmp_path):
    """The committed ANN index is hive-partitioned by (label, cell): a
    query's nprobe cell filter must become PARTITION pruning (directory
    skip at scan planning), never a post-scan row filter over the full
    index — that's the property that replaces the vector channel's
    full-table scan at 10^9 nodes."""
    from neo4j_document_pipeline_spark.config import PipelineConfig
    from neo4j_document_pipeline_spark.functions.featurizer import embed_text
    from neo4j_document_pipeline_spark.operators.retrieval import (
        build_node_vectors, vector_channel)
    from neo4j_document_pipeline_spark.sources.store import GraphStore

    cfg = PipelineConfig(ann_cells=4, ann_train_iters=2)
    nodes = spark.range(0, 200).selectExpr(
        "concat('e', id) AS entity_id",
        "CASE WHEN id % 2 = 0 THEN 'Entity' ELSE 'Goal' END AS label",
        "transform(sequence(1, 8), j -> cast(hash(id, j) % 97 AS double) / 97.0)"
        " AS embedding")
    st = GraphStore(str(tmp_path / "kg"), spark)
    idx, cents, _, _ = build_node_vectors(nodes, cfg)
    st.write("node_vectors", idx, partition_by=["label", "cell"])

    q = embed_text("probe", dim=8).tolist()
    out = vector_channel(nodes, q, None, 5, index=st.read("node_vectors"),
                         centroids=cents, nprobe=2)
    p = plan_of(out)
    scan = [l for l in p.splitlines() if "PartitionFilters" in l]
    assert scan and "cell" in scan[0], p
    # the cell probe must NOT appear as a post-scan data filter (a scan
    # with no PushedFilters line at all is fine — pruning did everything)
    assert all("cell" not in l
               for l in p.splitlines() if "PushedFilters" in l), p
    # labeled probe prunes label directories too
    out_l = vector_channel(nodes, q, ["Goal"], 5,
                           index=st.read("node_vectors"),
                           centroids=cents, nprobe=2)
    pl = plan_of(out_l)
    scan_l = [l for l in pl.splitlines() if "PartitionFilters" in l][0]
    assert "cell" in scan_l and "label" in scan_l, pl


def test_analytics_joins_are_equi_joins(spark):
    """The analytics operators' quadratic-risk steps (similarity wedge
    join, NPMI within-context pair join, triangle closing probe, HITS
    half-step contribution joins) must plan as hash/sort-merge EQUI
    joins — a BroadcastNestedLoopJoin or CartesianProduct here is the
    difference between O(m^1.5)-bounded work and a cluster-killing
    cross product at web scale."""
    from neo4j_document_pipeline_spark.operators.graphalgo import (
        hits,
        node_similarity,
        npmi_pairs,
        triangle_count,
    )
    li = (spark.read.parquet(f"{SF}/lineitem.parquet")
          .filter(F.col("l_orderkey") < 200)
          .select("l_orderkey", "l_partkey"))
    a, b = li.alias("a"), li.alias("b")
    edges = (a.join(b, (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
                    & (F.col("a.l_partkey") < F.col("b.l_partkey")))
             .select(F.col("a.l_partkey").cast("string").alias("u"),
                     F.col("b.l_partkey").cast("string").alias("v")))
    occ = li.select(F.col("l_orderkey").cast("string").alias("ctx"),
                    F.col("l_partkey").cast("string").alias("item"))
    from neo4j_document_pipeline_spark.operators.graphalgo import (
        link_prediction)
    from neo4j_document_pipeline_spark.streaming.ingest import (
        attribution_pairs)
    events = spark.read.parquet(f"{SF}/events.parquet")
    frames = {
        "node_similarity": node_similarity(edges, metric="all"),
        "npmi_pairs": npmi_pairs(occ),
        "triangle_count": triangle_count(edges),
        "hits": hits(edges, iters=1),
        "link_prediction": link_prediction(edges, max_degree=100),
        # the interval join must key on user_id (equi) with the time
        # range as a join-side filter — a pure range join would plan
        # as BNLJ and hold both whole streams
        "attribution_pairs": attribution_pairs(events),
    }
    # Not probed here: k_truss / random_walks localCheckpoint each
    # round, so their RETURNED plans would not show the internal joins
    # (a vacuous assertion) — their per-round joins are pure
    # column-equality joins by construction; graph_summary /
    # conductance / modularity / mixture_weights fold a 1-row scalar
    # aggregate in-plan, which Spark plans as a harmless
    # BroadcastNestedLoopJoin with a single-row build side (the
    # accepted scalar-fold shape, not a data-sized cross product)
    for name, df in frames.items():
        p = plan_of(df)
        assert "BroadcastNestedLoopJoin" not in p, name
        assert "CartesianProduct" not in p, name


def test_corpus_hygiene_plans(spark):
    """decontamination: the benchmark gram set must BROADCAST (it is
    small by nature — eval suites, not corpora) and nothing may plan as
    a nested-loop/cartesian join; line dedup: both shuffles are hash
    EQUI joins on the fixed-width sha2 line key."""
    from neo4j_document_pipeline_spark.operators.dedup import (
        dedup_lines_across_docs, ngram_overlap_flags)
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    flags = ngram_overlap_flags(
        docs.filter(F.col("source") != "src0"),
        docs.filter(F.col("source") == "src0"),
        "doc_id", "text", n=4)
    p = plan_of(flags)
    assert "BroadcastHashJoin" in p
    assert "BroadcastNestedLoopJoin" not in p
    assert "CartesianProduct" not in p
    p2 = plan_of(dedup_lines_across_docs(docs, "doc_id", "text"))
    assert "BroadcastNestedLoopJoin" not in p2
    assert "CartesianProduct" not in p2


def test_bloom_decontam_prefilter_is_all_broadcast(spark):
    """Bloom-prefiltered decontamination: every one of the k prefilter
    joins on the word index must be a BROADCAST hash join (the corpus
    gram stream is never shuffled before the verify join) and nothing
    may plan as a nested-loop/cartesian join."""
    from neo4j_document_pipeline_spark.operators.dedup import (
        ngram_overlap_flags_bloom)
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    flags = ngram_overlap_flags_bloom(
        docs.filter(F.col("source") != "src0"),
        docs.filter(F.col("source") == "src0"),
        "doc_id", "text", n=4, bloom_bits=1 << 16, bloom_hashes=3)
    p = plan_of(flags)
    # k=3 word-index joins + the verify join (formatted explain lists
    # each operator twice — count unique "(N) Op" ids)
    import re
    bhj = set(re.findall(r"\((\d+)\) BroadcastHashJoin", p))
    assert len(bhj) >= 4, sorted(bhj)
    assert "BroadcastNestedLoopJoin" not in p
    assert "CartesianProduct" not in p


def test_duplicate_span_plan_is_equi_join_and_per_doc_window(spark):
    """exact-substring spans: the flag join keys on the fixed-width gram
    hash (hash EQUI join, never nested-loop) and the island merge is a
    per-document window — no global sort/single-partition window may
    appear in the plan."""
    from neo4j_document_pipeline_spark.operators.dedup import (
        duplicate_span_stats)
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    p = plan_of(duplicate_span_stats(docs, "doc_id", "text", k=8))
    assert "BroadcastNestedLoopJoin" not in p
    assert "CartesianProduct" not in p
    # the island merge windows partition by the doc id (a global,
    # partition-less window would be the single-partition scale killer)
    import re
    specs = re.findall(r"windowspecdefinition\((\w+)#", p)
    assert specs and all(s == "id" for s in specs), specs


def test_kmeans_plan_broadcast_centroid_fold_only(spark):
    """deterministic k-means: the ONLY nested-loop joins are the
    broadcast centroid folds (k-row build side, one per assignment
    round — same contract as modularity's 1-row scalar fold) and the
    seed draw plans as TakeOrderedAndProject, never a global sort."""
    from neo4j_document_pipeline_spark.operators.clustering import (
        kmeans_assign)
    e = spark.read.parquet(f"{SF}/embeddings.parquet")
    p = plan_of(kmeans_assign(e, "vec_id", "embedding", k=8, iters=2))
    import re
    bnlj_nodes = set(re.findall(r"\((\d+)\) BroadcastNestedLoopJoin", p))
    assert len(bnlj_nodes) == 2, bnlj_nodes  # one per assign round
    assert "CartesianProduct" not in p
    assert "TakeOrderedAndProject" in p


def test_modularity_scalar_fold_is_only_nested_loop(spark):
    """modularity folds the scalar m in-plan as a broadcast cross-join
    of a ONE-ROW aggregate (zero driver actions) — that single bounded
    BNLJ is intended; every data-sized join must stay hash/SMJ equi and
    no CartesianProduct may appear."""
    from neo4j_document_pipeline_spark.operators.graphalgo import (
        modularity)
    li = (spark.read.parquet(f"{SF}/lineitem.parquet")
          .filter(F.col("l_orderkey") < 200)
          .select("l_orderkey", "l_partkey"))
    a, b = li.alias("a"), li.alias("b")
    edges = (a.join(b, (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
                    & (F.col("a.l_partkey") < F.col("b.l_partkey")))
             .select(F.col("a.l_partkey").cast("string").alias("u"),
                     F.col("b.l_partkey").cast("string").alias("v")))
    asg = edges.select(F.col("u").alias("id")).union(
        edges.select("v")).distinct() \
        .select("id", F.substring("id", 1, 1).alias("community"))
    # count on the physical-plan tree string: explain("formatted")
    # prints every operator twice (tree line + detail block)
    q = modularity(edges, asg)
    p = q._jdf.queryExecution().executedPlan().toString()
    assert p.count("BroadcastNestedLoopJoin") == 1
    assert "CartesianProduct" not in p


def test_asof_join_is_window_not_range_join(spark):
    """asof_join must plan as the union + running-window form (one
    Exchange per side's shuffle into the window, a Window operator, no
    join operator AT ALL) — the naive range-join encoding would appear
    as BroadcastNestedLoopJoin and explode O(|L|x|R|) per key."""
    from neo4j_document_pipeline_spark.operators.temporal import (
        asof_join)
    ev = spark.read.parquet(f"{SF}/events.parquet") \
        .withColumn("ts", F.col("ts").cast("timestamp"))
    clicks = ev.filter(F.col("event_type") == "click") \
        .select("event_id", "user_id", "ts")
    views = ev.filter(F.col("event_type") == "view") \
        .select(F.col("event_id").alias("view_id"), "user_id", "ts")
    p = plan_of(asof_join(clicks, views, "user_id", "ts"))
    assert "Window" in p
    for op in ("BroadcastNestedLoopJoin", "CartesianProduct",
               "SortMergeJoin", "BroadcastHashJoin"):
        assert op not in p, op


def test_range_join_is_bucketed_equi_join(spark):
    """range_join must plan as a hash/SMJ EQUI join on (key, bucket)
    with the range check as a post-filter — a raw BETWEEN predicate
    would be a BroadcastNestedLoopJoin holding both sides whole."""
    from neo4j_document_pipeline_spark.operators.temporal import (
        range_join)
    ev = spark.read.parquet(f"{SF}/events.parquet") \
        .withColumn("ts", F.col("ts").cast("timestamp"))
    spans = ev.filter(F.col("event_type") == "signup").select(
        "user_id", F.col("event_id").alias("span_id"),
        F.col("ts").alias("t0"),
        (F.col("ts") + F.expr("INTERVAL 2 HOURS")).alias("t1"))
    clicks = ev.filter(F.col("event_type") == "click") \
        .select("event_id", "user_id", "ts")
    p = plan_of(range_join(clicks, spans, "user_id", ts_col="ts",
                           start_col="t0", end_col="t1",
                           bucket_seconds=1800))
    assert "BroadcastNestedLoopJoin" not in p
    assert "CartesianProduct" not in p
    assert ("SortMergeJoin" in p or "ShuffledHashJoin" in p
            or "BroadcastHashJoin" in p)


def test_new_analytics_and_sampling_plans(spark):
    """weighted_sample's global form must plan as TakeOrderedAndProject
    (per-partition k-heap, never a full sort); the HyperBall round join
    and clustering wedge must stay hash/SMJ equi joins."""
    from pyspark.sql import functions as F

    from neo4j_document_pipeline_spark.operators.graphalgo import (
        clustering_coefficients, neighborhood_sketches)
    from neo4j_document_pipeline_spark.operators.sampling import (
        weighted_sample)
    docs = (spark.read.parquet(f"{SF}/documents.parquet")
            .select("doc_id", F.length("text").alias("w")))
    p = plan_of(weighted_sample(docs, 10, "w"))
    assert "TakeOrderedAndProject" in p
    assert "Sort " not in p.split("TakeOrderedAndProject")[0]

    li = (spark.read.parquet(f"{SF}/lineitem.parquet")
          .filter(F.col("l_orderkey") < 200)
          .select("l_orderkey", "l_partkey"))
    a, b = li.alias("a"), li.alias("b")
    edges = (a.join(b, (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
                    & (F.col("a.l_partkey") < F.col("b.l_partkey")))
             .select(F.col("a.l_partkey").cast("string").alias("u"),
                     F.col("b.l_partkey").cast("string").alias("v")))
    for name, df in {
        "neighborhood_sketches": neighborhood_sketches(edges, 1, k=8),
        "clustering_coefficients": clustering_coefficients(edges),
    }.items():
        p = plan_of(df)
        assert "BroadcastNestedLoopJoin" not in p, name
        assert "CartesianProduct" not in p, name


def test_edit_distance_join_is_equi_join(spark):
    """Both fuzzyjoin buckets must meet on EQUALITY keys (gram /
    length band) — a BNLJ or cartesian here is the all-pairs join the
    blocking exists to avoid."""
    from neo4j_document_pipeline_spark.operators.fuzzyjoin import (
        edit_distance_join, edit_distance_pairs)
    cust = spark.read.parquet(f"{SF}/customer.parquet")
    part = spark.read.parquet(f"{SF}/part.parquet")
    for name, df in {
        "pairs": edit_distance_pairs(cust, "c_name", max_dist=1),
        "join": edit_distance_join(cust, part, "c_name", "p_name",
                                   max_dist=2),
    }.items():
        p = plan_of(df)
        assert "BroadcastNestedLoopJoin" not in p, name
        assert "CartesianProduct" not in p, name


def test_round5_kg_tooling_plans(spark):
    """The new KG-tooling operators' joins stay equi/bounded:
    negative_triples (pool equi-join on the drawn index + anti-join vs
    true triples), table_diff (one full-outer equi join), and
    leakage_safe_split with a precomputed cluster map (one left equi
    join) must never BNLJ/cartesian; hard_negatives' anchor join IS an
    intended BroadcastNestedLoopJoin with the batch-sized anchor frame
    as the BUILD side — assert it broadcasts and does not fall back to
    a CartesianProduct (which would shuffle the corpus against itself)."""
    from neo4j_document_pipeline_spark.operators.admin import table_diff
    from neo4j_document_pipeline_spark.operators.kgtrain import (
        negative_triples)
    from neo4j_document_pipeline_spark.operators.sampling import (
        leakage_safe_split)
    from neo4j_document_pipeline_spark.operators.similarity import (
        hard_negatives)

    t = spark.createDataFrame(
        [(f"s{i}", "r", f"e{i % 5}") for i in range(30)],
        ["subject", "predicate", "object"])
    pool = spark.createDataFrame(
        [(i, f"e{i}") for i in range(5)], ["idx", "entity"])
    docs = spark.createDataFrame([(f"d{i}",) for i in range(20)],
                                 ["doc_id"])
    cmap = spark.createDataFrame([("d1", "d0"), ("d0", "d0")],
                                 ["doc_id", "keep_id"])
    emb = spark.createDataFrame(
        [(i, [float(i), 1.0], f"c{i % 2}") for i in range(10)],
        ["vec_id", "embedding", "label"])
    anchors = emb.limit(2).select(
        F.col("vec_id").alias("aid"), F.col("embedding").alias("av"),
        F.col("label").alias("al"))

    equi_frames = {
        "negative_triples": negative_triples(t, pool, pool_size=5),
        "table_diff": table_diff(t, t.limit(10), ["subject"],
                                 ["object"]),
        "leakage_safe_split": leakage_safe_split(
            docs, "doc_id", {"train": 0.9, "test": 0.1}, clusters=cmap),
    }
    for name, df in equi_frames.items():
        p = plan_of(df)
        assert "BroadcastNestedLoopJoin" not in p, name
        assert "CartesianProduct" not in p, name

    hn = plan_of(hard_negatives(emb, anchors, "vec_id", "embedding",
                                "label", "aid", "av", "al", k=2))
    assert "BroadcastNestedLoopJoin" in hn
    assert "CartesianProduct" not in hn


def test_round5_linkage_layout_plans(spark):
    """Session additions: every data-sized join stays an equi join —
    the only BroadcastNestedLoopJoins allowed are the 1-row scalar
    folds (u-probability pivot + N in the FS scorer, min/max stats in
    zorder, the corpus-total in KL novelty, moments in
    standard_scale), and nothing may fall back to CartesianProduct."""
    from neo4j_document_pipeline_spark.operators.corpus import (
        kl_novelty_scores)
    from neo4j_document_pipeline_spark.operators.erlink import (
        fellegi_sunter_scores)
    from neo4j_document_pipeline_spark.operators.features import (
        standard_scale, target_encode)
    from neo4j_document_pipeline_spark.operators.layout import zorder_key
    from neo4j_document_pipeline_spark.operators.sequences import (
        event_transitions)

    records = spark.createDataFrame(
        [(i, str(i % 3), str(i % 2)) for i in range(20)],
        ["id", "f1", "f2"])
    pairs = spark.createDataFrame([(1, 2), (3, 4)], ["id1", "id2"])
    nums = spark.createDataFrame([(i, i * 2) for i in range(10)],
                                 ["a", "b"])
    docs = spark.createDataFrame([(1, "a b c"), (2, "b c d")],
                                 ["doc_id", "text"])
    import datetime
    ev = spark.createDataFrame(
        [(1, "x", datetime.datetime(2023, 1, 1), 1)],
        "user_id bigint, event_type string, ts timestamp, event_id bigint")

    bounded = {
        # frame -> max allowed 1-row nested-loop folds
        # formatted explain prints each operator twice (tree + detail
        # section), so ONE 1-row fold counts 2; fs has two folds (the
        # N count and the u-probability pivot) — all builds are 1-row/
        # |fields|-row, never data-sized
        "fs": (fellegi_sunter_scores(records, pairs, "id",
                                     ["f1", "f2"],
                                     {"f1": 0.9, "f2": 0.8}), 4),
        "zorder": (zorder_key(nums, ["a", "b"], bits=4), 2),
        "kl": (kl_novelty_scores(docs, "doc_id", "text"), 2),
        "scale": (standard_scale(nums, ["a"]), 2),
        "encode": (target_encode(records, "f1", "id"), 2),
        "markov": (event_transitions(ev), 0),
    }
    for name, (df, max_bnlj) in bounded.items():
        p = plan_of(df)
        assert "CartesianProduct" not in p, name
        assert p.count("BroadcastNestedLoopJoin") <= max_bnlj, (
            name, p.count("BroadcastNestedLoopJoin"))


def test_domain_hygiene_plans(spark):
    """Domain-hygiene operators: the census share fold and the flags'
    census join are BROADCAST (domain-cardinality-sized build sides),
    and nothing falls back to a CartesianProduct; the cap's windows
    introduce no join at all."""
    from pyspark.sql import functions as F

    from neo4j_document_pipeline_spark.operators.domains import (
        domain_cap_sample, domain_census, domain_filter_flags)

    docs = spark.createDataFrame(
        [(i, f"https://s{i % 4}.example.com/{i}", "some text")
         for i in range(40)], ["doc_id", "url", "text"])
    census = plan_of(domain_census(docs, "url", "text"))
    assert "CartesianProduct" not in census
    assert "BroadcastHashJoin" in census or "BroadcastNestedLoopJoin" in census
    flags = plan_of(domain_filter_flags(docs, "url", "doc_id",
                                        blocklist=["example.com"],
                                        max_share=0.5))
    assert "CartesianProduct" not in flags
    assert "BroadcastHashJoin" in flags
    cap = plan_of(domain_cap_sample(docs, "url", "doc_id", 3))
    assert "Join" not in cap and "CartesianProduct" not in cap


def test_session10_ops_are_equi_joins(spark):
    """containment prefix filter + neighbor sampling: every join is a
    hash EQUI join — a BNLJ/CartesianProduct here is the all-pairs
    blow-up these operators exist to avoid."""
    from neo4j_document_pipeline_spark.operators.dedup import (
        containment_pairs)
    from neo4j_document_pipeline_spark.operators.kgtrain import (
        sample_neighborhoods)
    docs = spark.createDataFrame(
        [(i, f"tok{i} tok{i+1} shared common words here") for i in range(30)],
        "doc_id long, text string")
    p = plan_of(containment_pairs(docs, "doc_id", "text", 0.8))
    assert "BroadcastNestedLoopJoin" not in p
    assert "CartesianProduct" not in p
    e = spark.createDataFrame(
        [(f"n{i}", f"n{(i * 7) % 20}") for i in range(40)],
        "src string, dst string")
    s = spark.createDataFrame([("n1",), ("n2",)], "id string")
    p2 = plan_of(sample_neighborhoods(e, s, [2, 2]))
    assert "BroadcastNestedLoopJoin" not in p2
    assert "CartesianProduct" not in p2
