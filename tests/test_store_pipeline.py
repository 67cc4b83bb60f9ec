"""GraphStore merge semantics + staged pipeline resume tests."""

import json
import os

import pytest
from pyspark.sql import functions as F

from neo4j_document_pipeline_spark.plans.pipeline import graph_stats, run_pipeline
from neo4j_document_pipeline_spark.sources.pages import synth_pages
from neo4j_document_pipeline_spark.sources.store import GraphStore


@pytest.fixture()
def store(spark, tmp_path):
    return GraphStore(str(tmp_path / "graph"), spark)


def test_write_read_roundtrip_and_versioning(spark, store):
    df = spark.createDataFrame([(1, "a"), (2, "b")], "id long, v string")
    m1 = store.write("t", df)
    assert m1["rows"] == 2
    m2 = store.write("t", df.filter("id=1"))
    assert m2["parent_version"] == m1["version"]
    assert store.read("t").count() == 1
    # old version cleaned up
    assert not os.path.isdir(os.path.join(store._tdir("t"), m1["version"]))


def test_merge_nodes_last_write_wins(spark, store):
    a = spark.createDataFrame(
        [("e1", "Entity", "X", [1.0], None, None)],
        "entity_id string, label string, name string, embedding array<float>, start string, end string",
    )
    store.write("nodes", store.merge_nodes(a))
    b = spark.createDataFrame(
        [("e1", "Entity", "X", [2.0], "2020", None),
         ("e2", "Goal", "Y", [3.0], None, None)],
        a.schema,
    )
    merged = store.merge_nodes(b)
    rows = {r["entity_id"]: r for r in merged.collect()}
    assert len(rows) == 2
    assert rows["e1"]["embedding"] == [2.0]   # new write wins
    assert rows["e1"]["start"] == "2020"      # coalesced prop


def test_merge_edges_source_accumulation(spark, store):
    schema = (
        "src_id string, dst_id string, rel_type string, term string, count int, "
        "embedding array<float>, sources array<string>, source_text_full string, "
        "created_at timestamp, updated_at timestamp"
    )
    a = spark.createDataFrame(
        [("s", "d", "R", None, None, [1.0], ["doc1"], "t1", None, None)], schema)
    store.write("edges", store.merge_edges(a))
    b = spark.createDataFrame(
        [("s", "d", "R", None, None, [2.0], ["doc2", "doc1"], "t2", None, None),
         ("s", "d", "R", "term1", 5, [2.0], ["doc3"], "t3", None, None)], schema)
    merged = store.merge_edges(b).collect()
    assert len(merged) == 2  # term in identity key
    plain = next(r for r in merged if r["term"] is None)
    assert plain["sources"] == ["doc1", "doc2"]       # append-if-absent
    assert plain["source_text_full"] == "t2"          # last write wins
    termed = next(r for r in merged if r["term"] == "term1")
    assert termed["count"] == 5


def test_pipeline_end_to_end_and_resume(spark, tmp_path):
    pages = synth_pages(spark, 40).cache()
    root = str(tmp_path / "kg")
    m1 = run_pipeline(spark, pages, root)
    stages1 = {k: m for k, m in m1.items() if not k.startswith("_")}
    assert all(not m.get("skipped") for m in stages1.values())
    assert m1["_timings"]  # per-stage wall timings are reported
    store = GraphStore(root, spark)
    stats = graph_stats(store)
    assert stats["total_nodes"] > 20
    assert stats["total_relationships"] > 10

    # re-run with identical input -> every stage skipped, tables unchanged
    nodes_before = sorted(r["entity_id"] for r in store.read("nodes").collect())
    m2 = run_pipeline(spark, pages, root)
    assert all(m.get("skipped") for k, m in m2.items()
               if not k.startswith("_"))
    nodes_after = sorted(r["entity_id"] for r in store.read("nodes").collect())
    assert nodes_before == nodes_after


def test_pipeline_resume_after_partial_kill(spark, tmp_path):
    """Kill-after-stage-k simulation: delete manifests of later stages and
    re-run; final tables must equal a clean full run (idempotence)."""
    pages = synth_pages(spark, 30).cache()
    root = str(tmp_path / "kg2")
    run_pipeline(spark, pages, root)
    store = GraphStore(root, spark)
    full_nodes = sorted(map(str, store.read("nodes").collect()))
    full_edges = sorted(map(str, store.read("edges").drop("created_at", "updated_at").collect()))

    # simulate a crash mid-run: stages after 'chunks' lost
    for name in ["triples_raw", "embeddings_cache", "nodes", "edges",
                 "mentions", "documents_final"]:
        store.truncate(name)
    m = run_pipeline(spark, pages, root)
    assert m["documents"].get("skipped")
    assert m["chunks"].get("skipped")
    assert not m["triples_raw"].get("skipped")
    assert sorted(map(str, store.read("nodes").collect())) == full_nodes
    assert sorted(map(str, store.read("edges").drop("created_at", "updated_at").collect())) == full_edges


def test_input_change_invalidates(spark, tmp_path):
    root = str(tmp_path / "kg3")
    run_pipeline(spark, synth_pages(spark, 20), root)
    m = run_pipeline(spark, synth_pages(spark, 25), root)
    assert not m["documents"].get("skipped")


def test_manifest_contents(spark, tmp_path):
    root = str(tmp_path / "kg4")
    run_pipeline(spark, synth_pages(spark, 20), root)
    with open(os.path.join(root, "triples_raw", "_manifest.json")) as f:
        man = json.load(f)
    assert man["rows"] > 0
    assert man["input_fingerprint"]
    assert man["stage"] == "triples_raw"
    # per-partition lineage (north rule): one entry per committed data
    # file, counts summing to the global row count
    assert man["n_files"] == len(man["partitions"]) > 0
    assert sum(p["rows"] for p in man["partitions"]) == man["rows"]
    for p in man["partitions"]:
        assert p["file"] and not p["file"].startswith("file:")


def test_manifest_partition_lineage_multifile(spark, tmp_path):
    from neo4j_document_pipeline_spark.sources.store import GraphStore
    store = GraphStore(str(tmp_path / "kg5"), spark)
    df = spark.range(0, 1000, 1, 8).withColumn("k", F.col("id") % 3)
    man = store.write("multi", df, partition_by=["k"])
    assert man["n_files"] >= 3  # at least one file per k= partition
    assert sum(p["rows"] for p in man["partitions"]) == 1000
    # partition directory names surface in the lineage paths
    assert any("k=0" in p["file"] for p in man["partitions"])


def test_truncate(spark, store):
    df = spark.createDataFrame([(1,)], "id long")
    store.write("x", df)
    store.truncate("x")
    assert not store.exists("x")


def test_lang_filter_pushes_down_and_filters(spark, tmp_path):
    import io
    from contextlib import redirect_stdout
    from neo4j_document_pipeline_spark.operators.ingest import (
        pages_to_documents)
    p = str(tmp_path / "pages.parquet")
    synth_pages(spark, 40).write.mode("overwrite").parquet(p)
    pages = spark.read.parquet(p)
    # generator makes every 10th page lang='ms'
    root = str(tmp_path / "kg_lang")
    man = run_pipeline(spark, pages, root, langs=["en"])
    en_docs = pages_to_documents(
        pages.filter(F.col("lang") == "en")).count()
    assert man["documents_final"]["rows"] == en_docs
    # the predicate must reach the parquet scan THROUGH the pipeline's own
    # documents stage (filter -> pandas-UDF canonicalize -> hash), i.e.
    # the same shape run_pipeline builds — not just a bare filter
    buf = io.StringIO()
    with redirect_stdout(buf):
        pages_to_documents(pages.filter(F.col("lang").isin(["en"]))) \
            .explain("formatted")
    plan = buf.getvalue().replace(" ", "")
    pushed = plan[plan.find("PushedFilters"):].splitlines()[0]
    # single-element isin folds to EqualTo; either form must be pushed
    assert "EqualTo(lang,en)" in pushed or "In(lang" in pushed, pushed


def test_min_quality_gate_filters_pages(spark, tmp_path):
    from neo4j_document_pipeline_spark.functions.textstats import (
        col_quality_score)
    from neo4j_document_pipeline_spark.operators.ingest import (
        pages_to_documents)
    pages = synth_pages(spark, 40).cache()
    docs_all = pages_to_documents(pages).cache()
    ungated_docs = docs_all.count()
    # synth corpus scores are 0.75 or 1.0 — 0.9 actually drops pages
    root = str(tmp_path / "kg_q")
    man = run_pipeline(spark, pages, root, min_quality=0.9)
    # the gate scores the extracted CANONICAL text (same as the
    # incremental path) — expectation computed the same way
    expected = docs_all.filter(col_quality_score(F.col("text")) >= 0.9).count()
    assert expected < ungated_docs  # the gate bites
    assert man["documents_final"]["rows"] == expected


def test_max_sources_per_edge_bounded_and_idempotent(spark, store):
    """Bounded per-edge state (config.py note): cap survives merge
    accumulation and is deterministic under any batch order."""
    schema = (
        "src_id string, dst_id string, rel_type string, term string, count int, "
        "embedding array<float>, sources array<string>, source_text_full string, "
        "created_at timestamp, updated_at timestamp"
    )
    def batch(srcs):
        return spark.createDataFrame(
            [("s", "d", "R", None, None, [1.0], sorted(srcs), "t", None, None)],
            schema)
    store.write("edges", store.merge_edges(batch(["d5", "d9"]), max_sources=3))
    store.write("edges", store.merge_edges(batch(["d1", "d7"]), max_sources=3))
    store.write("edges", store.merge_edges(batch(["d3", "d2"]), max_sources=3))
    row = store.read("edges").first()
    assert row["sources"] == ["d1", "d2", "d3"]  # 3 lexicographically smallest
    # re-delivering any earlier batch cannot change the capped set
    store.write("edges", store.merge_edges(batch(["d5", "d9"]), max_sources=3))
    assert store.read("edges").first()["sources"] == ["d1", "d2", "d3"]


def test_bucketed_write_read_roundtrip(spark, store):
    """bucket(N, key) snapshots: content identical to a plain write, one
    file per bucket (repartition aligns with the bucket hash), manifest
    carries the layout, versioning + cleanup still hold."""
    df = spark.range(0, 200).selectExpr(
        "concat('e', id) AS entity_id", "concat('n', id) AS name")
    m1 = store.write_bucketed("nodes", df, bucket_by="entity_id", n_buckets=4)
    assert m1["rows"] == 200 and m1["bucket_by"] == "entity_id"
    assert m1["n_buckets"] == 4 and m1["n_files"] == 4
    got = {r["entity_id"] for r in store.read("nodes").collect()}
    assert got == {f"e{i}" for i in range(200)}
    # superseding version drops the old catalog entry and directory
    m2 = store.write_bucketed("nodes", df.filter("entity_id like 'e1%'"),
                              bucket_by="entity_id", n_buckets=4)
    assert m2["parent_version"] == m1["version"]
    assert not spark.catalog.tableExists(m1["catalog_table"])
    assert spark.catalog.tableExists(m2["catalog_table"])
    store.truncate("nodes")
    assert not spark.catalog.tableExists(m2["catalog_table"])


def test_pipeline_bucketed_layout_same_content(spark, tmp_path):
    """run_pipeline with cfg.store_buckets produces byte-identical graph
    tables to the plain layout — bucketing is physical only."""
    import dataclasses

    from neo4j_document_pipeline_spark.config import DEFAULT_CONFIG
    pages = synth_pages(spark, 12)
    plain = GraphStore(str(tmp_path / "plain"), spark)
    run_pipeline(spark, pages, plain.root)
    cfg = dataclasses.replace(DEFAULT_CONFIG, store_buckets=4)
    buck = GraphStore(str(tmp_path / "buck"), spark)
    run_pipeline(spark, pages, buck.root, cfg=cfg)
    for t in ("nodes", "edges", "mentions"):
        man = buck.manifest(t)
        assert man["n_buckets"] == 4, t
        a = {tuple(str(v) for v in r) for r in plain.read(t).collect()}
        b = {tuple(str(v) for v in r) for r in buck.read(t).collect()}
        assert a == b, t


def test_snapshot_history_time_travel_and_retention(spark, tmp_path):
    """keep_versions>1 retains a time-travel window: read_version serves
    any retained snapshot, the history log records the full lineage
    chain even past expiry, and expiry is loud (FileNotFoundError)."""
    st = GraphStore(str(tmp_path / "kg"), spark, keep_versions=2)
    df = spark.createDataFrame([(1, "a"), (2, "b")], "id long, v string")
    m1 = st.write("t", df)
    m2 = st.write("t", df.filter("id = 1"))
    # both retained: current + parent readable
    assert st.read_version("t", m2["version"]).count() == 1
    assert st.read_version("t", m1["version"]).count() == 2
    m3 = st.write("t", df.limit(0))
    hist = st.history("t")
    assert [h["version"] for h in hist] == [m1["version"], m2["version"],
                                            m3["version"]]
    assert hist[1]["parent_version"] == m1["version"]
    # v1 expired (keep=2), v2 still readable
    with pytest.raises(FileNotFoundError):
        st.read_version("t", m1["version"])
    assert st.read_version("t", m2["version"]).count() == 1
    # explicit maintenance prunes to the live snapshot only
    st.expire_snapshots("t", keep=1)
    with pytest.raises(FileNotFoundError):
        st.read_version("t", m2["version"])
    assert st.read("t").count() == 0


def test_compact_rewrites_small_files(spark, tmp_path):
    """OPTIMIZE analogue: compaction collapses a many-file snapshot into
    few files, preserves content + input fingerprint (stage resume still
    sees the table as current), and keeps a bucketed table bucketed."""
    st = GraphStore(str(tmp_path / "kg"), spark)
    df = spark.range(0, 1000).selectExpr("id", "concat('v', id) AS v")
    m1 = st.write("t", df.repartition(16), input_fingerprint="fp-1")
    assert m1["n_files"] == 16
    m2 = st.compact("t")
    assert m2["n_files"] < 16 and m2["rows"] == 1000
    assert m2["input_fingerprint"] == "fp-1"
    assert st.is_current("t", "fp-1")
    assert m2["metrics"]["compacted_from"] == m1["version"]
    assert st.read("t").count() == 1000
    # bucketed table: compaction preserves the layout
    nodes = spark.range(0, 300).selectExpr("concat('e', id) AS entity_id")
    st.write_bucketed("nodes", nodes, bucket_by="entity_id", n_buckets=4,
                      input_fingerprint="fp-n")
    mc = st.compact("nodes")
    assert mc["bucket_by"] == "entity_id" and mc["n_buckets"] == 4
    assert st.read("nodes").count() == 300


def test_compact_preserves_hive_partitioning(spark, store):
    """Compaction of a partition_by table must re-commit the SAME hive
    layout (partition pruning depends on it), not flatten to plain files."""
    df = spark.range(0, 300, 1, 8).withColumn("k", (F.col("id") % 3).cast("int"))
    m1 = store.write("t", df, partition_by=["k"], input_fingerprint="fp")
    assert m1["partition_by"] == ["k"]
    m2 = store.compact("t")
    assert m2["partition_by"] == ["k"]
    assert any("k=2" in p["file"] for p in m2["partitions"])
    assert store.read("t").count() == 300 and store.is_current("t", "fp")


def test_history_tolerates_torn_line(spark, store):
    """A crash can tear the non-atomic history append; the manifest is
    the commit point, so reads/writes/history must keep working."""
    df = spark.createDataFrame([(1,)], "id long")
    m1 = store.write("t", df)
    with open(store._tdir("t") + "/_history.jsonl", "a") as f:
        f.write('{"version": "v-torn', )  # torn JSON line
    assert [h["version"] for h in store.history("t")] == [m1["version"]]
    m2 = store.write("t", df)  # must not raise
    assert store.read("t").count() == 1
    assert [h["version"] for h in store.history("t")] == [m1["version"],
                                                          m2["version"]]


def test_cli_keep_versions_time_travel(spark, tmp_path, capsys):
    """--keep-versions N exposes time travel through the CLI: after two
    ingests the prior nodes snapshot is still readable by version."""
    from neo4j_document_pipeline_spark.__main__ import main
    root = str(tmp_path / "kg")
    main(["ingest", "--store", root, "--pages", "synth:12",
          "--keep-versions", "2"])
    capsys.readouterr()
    main(["ingest", "--store", root, "--pages", "synth:16",
          "--keep-versions", "2"])
    capsys.readouterr()
    st = GraphStore(root, spark, keep_versions=2)
    hist = st.history("nodes")
    assert len(hist) == 2
    old = st.read_version("nodes", hist[0]["version"])
    new = st.read_version("nodes", hist[1]["version"])
    assert old.count() > 0 and new.count() >= old.count()


def test_manifest_column_stats_and_file_skipping(spark, store):
    """stats_cols commits per-file [min,max] bounds (Iceberg manifest
    stats); read_where plans the scan from the MANIFEST — only files
    whose bounds overlap are opened — and returns exactly the full-scan
    filter result."""
    df = (spark.range(0, 10_000)
          .withColumn("k", F.col("id"))
          .withColumn("payload", F.sha2(F.col("id").cast("string"), 256)))
    # range layout => disjoint per-file bounds (the layout stats need)
    m = store.write("t", df.repartitionByRange(8, "k"), stats_cols=["k"])
    assert all("stats" in p and "k" in p["stats"] for p in m["partitions"])
    spans = sorted(tuple(p["stats"]["k"]) for p in m["partitions"])
    assert spans[0][0] == 0 and spans[-1][1] == 9999
    got = store.read_where("t", "k", 100, 160)
    # the plan reads a strict subset of the snapshot's files
    files = {r["f"] for r in
             got.select(F.input_file_name().alias("f")).distinct().collect()}
    assert 0 < len(files) < m["n_files"]
    expect = {r["id"] for r in
              store.read("t").filter(F.col("k").between(100, 160)).collect()}
    assert {r["id"] for r in got.collect()} == expect and len(expect) == 61
    # point lookup + out-of-range
    assert store.read_where("t", "k", 42).count() == 1
    assert store.read_where("t", "k", 1_000_000).count() == 0
    # string bounds work too (byte-decoded from footer statistics)
    ms = store.write("s", df.selectExpr("payload AS h")
                    .repartitionByRange(4, "h"), stats_cols=["h"])
    probe = df.first()["payload"]
    assert store.read_where("s", "h", probe).count() == 1
    # no stats committed -> falls back to a full filtered read
    store.write("u", df.select("k"))
    assert store.read_where("u", "k", 5).count() == 1


def test_vacuum_removes_only_stale_orphans(spark, store):
    """vacuum deletes crash debris (unreferenced version dirs past the
    grace age) and NEVER touches committed snapshots or fresh dirs that
    may be another writer mid-flight."""
    import time as _t

    df = spark.createDataFrame([(1,)], "id long")
    m = store.write("t", df)
    tdir = store._tdir("t")
    old_orphan = os.path.join(tdir, "v-deadbeef0000")
    new_orphan = os.path.join(tdir, "v-cafebabe0000")
    for d in (old_orphan, new_orphan):
        os.makedirs(d)
    os.utime(old_orphan, (_t.time() - 7200, _t.time() - 7200))
    removed = store.vacuum("t", grace_seconds=3600)
    assert removed == ["v-deadbeef0000"]
    assert not os.path.isdir(old_orphan)
    assert os.path.isdir(new_orphan)          # fresh: maybe in-flight
    assert os.path.isdir(os.path.join(tdir, m["version"]))  # committed
    assert store.read("t").count() == 1


def test_stats_temporal_bounds_and_maintenance_propagation(spark, store):
    """Timestamp stats commit as ISO strings (JSON-safe, order-preserving),
    read_where probes with datetime values, compaction keeps the stats,
    and stats on a hive partition column is a loud error."""
    import datetime

    df = (spark.range(0, 2000)
          .withColumn("ts", F.timestamp_seconds(1_700_000_000 + F.col("id") * 60)))
    m = store.write("ev", df.repartitionByRange(4, "ts"), stats_cols=["ts"],
                    input_fingerprint="fp")
    assert all(isinstance(p["stats"]["ts"][0], str) for p in m["partitions"])
    lo = datetime.datetime(2023, 11, 14, 22, 30, tzinfo=datetime.timezone.utc)
    hi = lo + datetime.timedelta(hours=2)
    got = store.read_where("ev", "ts", lo, hi)
    files = {r["f"] for r in
             got.select(F.input_file_name().alias("f")).distinct().collect()}
    assert 0 < len(files) < m["n_files"]
    expect = store.read("ev").filter(F.col("ts").between(lo, hi)).count()
    assert got.count() == expect > 0
    # maintenance rewrites keep the stats (compact + preserving writer)
    m2 = store.compact("ev")
    assert m2["stats_cols"] == ["ts"]
    assert any((p.get("stats") or {}).get("ts") for p in m2["partitions"])
    m3 = store.write_preserving_layout("ev", store.read("ev"))
    assert any((p.get("stats") or {}).get("ts") for p in m3["partitions"])
    # partition column in stats_cols: loud, not silent no-stats
    with pytest.raises(ValueError):
        store.write("bad", df.withColumn("d", F.to_date("ts")),
                    partition_by=["d"], stats_cols=["d"])


def test_snapshot_keyed_resume_runs_no_pages_job(spark, tmp_path):
    """With pages_fingerprint (the input table's committed snapshot id),
    a fully-resumed run must launch NO job over the pages table at all —
    the crc content scan AND the watermark pass are both gone. Proven
    with a trap frame whose evaluation raises: resume must complete
    without ever computing it."""
    from pyspark.sql import functions as F

    pages = synth_pages(spark, 40).cache()
    root = str(tmp_path / "kg")
    m1 = run_pipeline(spark, pages, root, pages_fingerprint="snap-A")
    assert not m1["documents"].get("skipped")
    # the observe-riding watermark was still committed on the first run
    wm = (GraphStore(root, spark).manifest("documents_final")["metrics"]
          .get("max_warc_ts"))
    assert wm

    @F.udf("string")
    def boom(x):
        raise RuntimeError("pages were scanned on a snapshot-keyed resume")

    trap = spark.range(1).select(
        boom(F.col("id")).alias("url"),
        F.lit(None).cast("timestamp").alias("warc_ts"),
        F.lit(None).cast("binary").alias("html"),
        F.lit("x").alias("text"),
        F.lit("en").alias("lang"))
    m2 = run_pipeline(spark, trap, root, pages_fingerprint="snap-A")
    assert all(m.get("skipped") for k, m in m2.items()
               if not k.startswith("_"))
    # a NEW snapshot id invalidates resume — the trap IS then computed
    with pytest.raises(Exception, match="pages were scanned|Job aborted"):
        run_pipeline(spark, trap, root, pages_fingerprint="snap-B")


def test_read_pages_resolves_manifested_dir(spark, tmp_path):
    """read_pages on a GraphStore-managed pages dir reads the committed
    snapshot (not stale version dirs); pages_identity tracks the
    snapshot and returns None for plain parquet dirs."""
    from neo4j_document_pipeline_spark.sources.pages import (
        pages_identity, read_pages)

    st2 = GraphStore(str(tmp_path), spark, keep_versions=3)
    st2.write("pages_tbl2", synth_pages(spark, 10))
    tdir = str(tmp_path / "pages_tbl2")
    id1 = pages_identity(tdir)
    assert id1 and id1.startswith("pages-snap:")
    assert read_pages(spark, tdir).count() == 10
    # commit a new snapshot -> identity changes, read follows the pointer
    st2.write("pages_tbl2", synth_pages(spark, 12))
    id2 = pages_identity(tdir)
    assert id2 != id1
    assert read_pages(spark, tdir).count() == 12
    # plain parquet dir: no manifest -> None (crc fallback)
    plain = str(tmp_path / "plain")
    synth_pages(spark, 5).write.parquet(plain)
    assert pages_identity(plain) is None
    assert read_pages(spark, plain).count() == 5
