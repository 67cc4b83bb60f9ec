"""Structured-Streaming ingest + windowed aggregation tests."""

import pytest
from pyspark.sql import functions as F

from neo4j_document_pipeline_spark.plans.pipeline import run_pipeline
from neo4j_document_pipeline_spark.sources.pages import synth_pages
from neo4j_document_pipeline_spark.sources.store import GraphStore
from neo4j_document_pipeline_spark.streaming.ingest import (
    start_ingest_stream,
    windowed_event_counts,
)


def test_stream_ingest_matches_batch(spark, tmp_path):
    """foreachBatch streaming ingest over the pages dir must converge to
    the same graph as a one-shot batch run (MERGE idempotence)."""
    pages = synth_pages(spark, 40).cache()
    pages_dir = str(tmp_path / "pages")
    # write as several files so the stream sees multiple micro-batches
    pages.repartition(5).write.parquet(pages_dir)

    batch_root = str(tmp_path / "batch_store")
    run_pipeline(spark, spark.read.parquet(pages_dir), batch_root)

    stream_root = str(tmp_path / "stream_store")
    q = start_ingest_stream(spark, pages_dir, stream_root,
                            str(tmp_path / "ckpt"))
    assert q.awaitTermination(300), "ingest stream did not terminate"

    b = GraphStore(batch_root, spark)
    s = GraphStore(stream_root, spark)
    b_nodes = sorted(r["entity_id"] for r in b.read("nodes").collect())
    s_nodes = sorted(r["entity_id"] for r in s.read("nodes").collect())
    assert b_nodes == s_nodes
    b_edges = sorted(map(str, b.read("edges")
                         .select("src_id", "dst_id", "rel_type", "term", "sources")
                         .collect()))
    s_edges = sorted(map(str, s.read("edges")
                         .select("src_id", "dst_id", "rel_type", "term", "sources")
                         .collect()))
    assert b_edges == s_edges


def test_windowed_counts_stream_equals_batch(spark, tmp_path):
    events = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    batch = {(str(r["win_start"]), r["event_type"]): (r["n"], round(r["v"], 6))
             for r in windowed_event_counts(events).collect()}

    events_dir = str(tmp_path / "events")
    events.write.parquet(events_dir)
    stream = (spark.readStream.schema(events.schema).parquet(events_dir))
    agg = windowed_event_counts(stream)
    q = (agg.writeStream.outputMode("complete")
         .format("memory").queryName("winout")
         .trigger(availableNow=True).start())
    assert q.awaitTermination(300), "ingest stream did not terminate"
    got = {(str(r["win_start"]), r["event_type"]): (r["n"], round(r["v"], 6))
           for r in spark.sql("select * from winout").collect()}
    assert got == batch


def test_batch_incremental_equals_full_run(spark, tmp_path):
    """Delta ingest (the no-recompute path): full(30) + increment(20 new)
    must produce exactly the tables of full(50)."""
    from neo4j_document_pipeline_spark.streaming.ingest import ingest_increment
    all_pages = synth_pages(spark, 50).cache()
    first = all_pages.filter(F.col("url") <= all_pages.orderBy("url").collect()[29]["url"])
    rest = all_pages.subtract(first)

    root_full = str(tmp_path / "full")
    run_pipeline(spark, all_pages, root_full)
    full = GraphStore(root_full, spark)

    root_inc = str(tmp_path / "inc")
    run_pipeline(spark, first, root_inc)
    inc = GraphStore(root_inc, spark)
    ingest_increment(inc, rest)

    for t in ("nodes", "mentions", "documents_final"):
        a = sorted(map(str, full.read(t).drop("embedding").collect()))
        b = sorted(map(str, inc.read(t).drop("embedding").collect()))
        assert a == b, t
    # edges: same identity keys and same SET of sources. source_text_full
    # is last-write-wins (reference sequential-MERGE semantics,
    # ingestMD.py:543-547): a one-shot batch picks a global deterministic
    # winner, an incremental run keeps the latest batch's — both valid
    # chunk texts, so identity/sources are the invariant, not the snippet.
    def edge_keys(s):
        return sorted(
            (r["src_id"], r["dst_id"], r["rel_type"], str(r["term"]),
             str(r["count"]), tuple(sorted(r["sources"])))
            for r in s.read("edges").collect())
    assert edge_keys(full) == edge_keys(inc)
    # re-delivering the same increment is a no-op (idempotent MERGE)
    ingest_increment(inc, rest)
    assert sorted(map(str, inc.read("nodes").drop("embedding").collect())) == \
        sorted(map(str, full.read("nodes").drop("embedding").collect()))
    # lineage metric for --since-ts auto
    m = inc.manifest("documents_final")
    assert m["metrics"].get("max_warc_ts")


def test_incremental_preserves_bucketed_layout(spark, tmp_path):
    """A store built with bucket(N, key) must KEEP that layout (and the
    shuffle-free join property) across incremental merges — the
    incremental path used plain writes and silently degraded it."""
    import dataclasses

    from neo4j_document_pipeline_spark.config import DEFAULT_CONFIG
    from neo4j_document_pipeline_spark.plans.pipeline import run_pipeline
    from neo4j_document_pipeline_spark.sources.pages import synth_pages
    from neo4j_document_pipeline_spark.sources.store import GraphStore
    from neo4j_document_pipeline_spark.streaming.ingest import (
        ingest_increment)
    root = str(tmp_path / "kg")
    cfg = dataclasses.replace(DEFAULT_CONFIG, store_buckets=4)
    run_pipeline(spark, synth_pages(spark, 20), root, cfg=cfg)
    store = GraphStore(root, spark)
    before = {t: store.manifest(t)["rows"]
              for t in ("nodes", "edges", "mentions")}
    delta = synth_pages(spark, 26).subtract(synth_pages(spark, 20))
    ingest_increment(store, delta, cfg=cfg)
    for t, key in [("nodes", "entity_id"), ("edges", "src_id"),
                   ("mentions", "entity_id")]:
        m = store.manifest(t)
        assert m.get("bucket_by") == key and m.get("n_buckets") == 4, t
        assert m["rows"] >= before[t], t
    # the merged tables still storage-partition-join with no shuffle
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        e, n = store.read("edges"), store.read("nodes")
        j = e.join(n, e.src_id == n.entity_id)
        import io
        from contextlib import redirect_stdout
        buf = io.StringIO()
        with redirect_stdout(buf):
            j.explain("formatted")
        assert "Exchange" not in buf.getvalue()
        assert j.count() > 0
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


def test_cli_stream_command(spark, tmp_path, capsys):
    """CLI `stream`: availableNow drain into the store, idempotent on
    re-run with no new files, and new files picked up incrementally."""
    import json

    from neo4j_document_pipeline_spark.__main__ import main
    from neo4j_document_pipeline_spark.sources.pages import synth_pages
    pages_dir = str(tmp_path / "pages")
    store = str(tmp_path / "kg")
    synth_pages(spark, 30).write.mode("overwrite").parquet(pages_dir)
    main(["stream", "--store", store, "--pages", pages_dir])
    out1 = json.loads(capsys.readouterr().out)["stream"]["tables"]
    assert out1["documents_final"] and out1["nodes"] > 0
    # no new files -> no-op
    main(["stream", "--store", store, "--pages", pages_dir])
    out2 = json.loads(capsys.readouterr().out)["stream"]["tables"]
    assert out2 == out1
    # append a delta file -> only the delta merges
    delta = synth_pages(spark, 36).subtract(synth_pages(spark, 30))
    delta.write.mode("append").parquet(pages_dir)
    main(["stream", "--store", store, "--pages", pages_dir])
    out3 = json.loads(capsys.readouterr().out)["stream"]["tables"]
    assert out3["documents_final"] > out1["documents_final"]


def test_bucket_scoped_incremental_merge_rewrites_k_files(spark, tmp_path):
    """On a bucket(N, key) store, an incremental batch touching k buckets
    must rewrite <= k data files per graph table and carry every other
    bucket file into the new snapshot unchanged (hardlink reuse — the
    Iceberg MERGE INTO touch-matching-files-only behavior), while staying
    content-identical to a full run over the union."""
    import dataclasses

    from neo4j_document_pipeline_spark.config import DEFAULT_CONFIG
    from neo4j_document_pipeline_spark.plans.pipeline import run_pipeline
    from neo4j_document_pipeline_spark.sources.pages import synth_pages
    from neo4j_document_pipeline_spark.sources.store import GraphStore
    from neo4j_document_pipeline_spark.streaming.ingest import (
        ingest_increment)

    cfg = dataclasses.replace(DEFAULT_CONFIG, store_buckets=8)
    root = str(tmp_path / "kg")
    run_pipeline(spark, synth_pages(spark, 30), root, cfg=cfg)
    store = GraphStore(root, spark)
    tables = [("nodes", "entity_id"), ("edges", "src_id"),
              ("mentions", "entity_id")]
    old_files = {t: {p["file"] for p in store.manifest(t)["partitions"]}
                 for t, _ in tables}
    delta = synth_pages(spark, 34).subtract(synth_pages(spark, 30))
    ingest_increment(store, delta, cfg=cfg)
    for t, key in tables:
        m = store.manifest(t)
        assert m["metrics"].get("merge_scope") == "bucket", t
        k = m["metrics"]["rewritten_buckets"]
        assert 0 < k <= 8, t
        new_files = {p["file"] for p in m["partitions"]}
        fresh = new_files - old_files[t]
        assert len(fresh) <= k, (t, k, fresh)
        assert m["metrics"]["reused_files"] == len(new_files & old_files[t]), t
        assert m.get("bucket_by") == key and m.get("n_buckets") == 8, t
    # a small delta must actually reuse files somewhere, or the scoping
    # is vacuous
    assert any(store.manifest(t)["metrics"]["reused_files"] > 0
               for t, _ in tables)

    # content parity vs a full bucketed run over the union
    root_full = str(tmp_path / "full")
    run_pipeline(spark, synth_pages(spark, 34), root_full, cfg=cfg)
    full = GraphStore(root_full, spark)
    for t in ("nodes", "mentions"):
        a = sorted(map(str, full.read(t).drop("embedding").collect()))
        b = sorted(map(str, store.read(t).drop("embedding").collect()))
        assert a == b, t
    edge_keys = lambda s: sorted(
        (r["src_id"], r["dst_id"], r["rel_type"], str(r["term"]),
         str(r["count"]), tuple(sorted(r["sources"])))
        for r in s.read("edges").collect())
    assert edge_keys(full) == edge_keys(store)
    # idempotence: re-delivering the same delta changes nothing
    before = sorted(map(str, store.read("nodes").collect()))
    ingest_increment(store, delta, cfg=cfg)
    assert sorted(map(str, store.read("nodes").collect())) == before


def test_session_window_stream_emits_closed_sessions(spark, tmp_path):
    """F.session_window on a stream: with a watermark, a session is
    emitted (append mode) once the watermark passes its end — later
    files advance the watermark and flush earlier users' sessions, while
    still-open sessions stay in state."""
    import datetime as dt

    from neo4j_document_pipeline_spark.streaming.ingest import session_windows

    t0 = dt.datetime(2025, 1, 1, 0, 0, 0)
    d = str(tmp_path / "events")
    schema = "event_id long, user_id long, ts timestamp, value double"

    def write(name, rows):
        spark.createDataFrame(rows, schema).coalesce(1) \
            .write.parquet(f"{d}/{name}")

    # user 1: two events 10 min apart -> one session [t0, t0+40min)
    write("f1", [(1, 1, t0, 1.0),
                 (2, 1, t0 + dt.timedelta(minutes=10), 1.0)])
    # much-later events: each batch advances the watermark for the next
    write("f2", [(3, 2, t0 + dt.timedelta(hours=10), 1.0)])
    write("f3", [(4, 3, t0 + dt.timedelta(hours=20), 1.0)])

    src = (spark.readStream.schema(schema)
           .option("maxFilesPerTrigger", 1).parquet(d + "/*"))
    out = session_windows(src, gap="30 minutes", watermark="1 hour")
    query = (out.writeStream.format("memory").queryName("sess_test")
             .outputMode("append").trigger(availableNow=True).start())
    query.awaitTermination(120)
    rows = {(r["user_id"],
             r["session_start"].replace(tzinfo=None),
             r["session_end"].replace(tzinfo=None),
             r["n_events"])
            for r in spark.sql("SELECT * FROM sess_test").collect()}
    # final watermark = 20:00 - 1h = 19:00 — user 1 (end 00:40) and
    # user 2 (end 10:30) are closed and emitted; user 3's session
    # (end 20:30) is beyond it and stays open in state
    assert rows == {
        (1, t0, t0 + dt.timedelta(minutes=40), 2),
        (2, t0 + dt.timedelta(hours=10),
         t0 + dt.timedelta(hours=10, minutes=30), 1),
    }
    # static mode over the same files sees ALL sessions
    static = session_windows(spark.read.parquet(d + "/*"), gap="30 minutes")
    assert static.count() == 3


def test_attribution_join_stream_equals_batch(spark, tmp_path):
    """Stream-stream interval join: the watermarked streaming run over
    the real events table emits exactly the batch pair set (inner join
    => every qualifying pair exactly once, regardless of micro-batch
    boundaries)."""
    from neo4j_document_pipeline_spark.streaming.ingest import (
        attribution_pairs)
    events = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    batch = {(r["user_id"], r["trig_id"], r["base_id"]) for r in
             attribution_pairs(events, max_delay="12 hours").collect()}
    assert batch, "sf0.001 has click-after-view pairs inside 12h"

    # deliver in event-time order (the realistic stream): out-of-order
    # delivery beyond the watermark is DESIGNED to be dropped, so a
    # random file order would legitimately lose matches
    d = str(tmp_path / "events")
    ordered = events.orderBy("ts").collect()
    chunk = (len(ordered) + 3) // 4
    for i in range(4):
        spark.createDataFrame(ordered[i * chunk:(i + 1) * chunk],
                              events.schema).coalesce(1) \
            .write.parquet(f"{d}/f{i}")
    stream = spark.readStream.schema(events.schema) \
        .option("maxFilesPerTrigger", 1).parquet(d + "/*")
    out = attribution_pairs(stream, max_delay="12 hours",
                            watermark="24 hours")
    assert out.isStreaming
    q = (out.writeStream.format("memory").queryName("attr_out")
         .outputMode("append").trigger(availableNow=True).start())
    assert q.awaitTermination(300), "attribution stream did not finish"
    got = {(r["user_id"], r["trig_id"], r["base_id"]) for r in
           spark.sql("SELECT * FROM attr_out").collect()}
    assert got == batch


def test_dedup_event_stream_exactly_once(spark, tmp_path):
    """dropDuplicatesWithinWatermark collapses at-least-once
    re-deliveries across micro-batches: each event_id survives exactly
    once, and the static branch of the same operator is a plain
    dropDuplicates."""
    import datetime as dt

    from neo4j_document_pipeline_spark.streaming.ingest import (
        dedup_event_stream)
    t0 = dt.datetime(2025, 1, 1, 0, 0, 0)
    schema = ("event_id long, ts timestamp, user_id long, "
              "event_type string, value double")
    a = (1, t0, 7, "view", 1.0)
    b = (2, t0 + dt.timedelta(minutes=5), 7, "click", 2.0)
    c = (3, t0 + dt.timedelta(minutes=9), 8, "view", 3.0)
    d = (4, t0 + dt.timedelta(hours=6), 9, "error", 4.0)
    files = [[a, b], [a, c], [c, d, d]]  # a and c re-delivered later,
    # d duplicated inside one batch
    root = str(tmp_path / "events")
    for i, rows in enumerate(files):
        spark.createDataFrame(rows, schema).coalesce(1) \
            .write.parquet(f"{root}/f{i}")
    stream = spark.readStream.schema(schema) \
        .option("maxFilesPerTrigger", 1).parquet(root + "/*")
    out = dedup_event_stream(stream, watermark="2 hours")
    q = (out.writeStream.format("memory").queryName("dedup_out")
         .outputMode("append").trigger(availableNow=True).start())
    assert q.awaitTermination(300), "dedup stream did not finish"
    got = sorted((r["event_id"], r["value"]) for r in
                 spark.sql("SELECT * FROM dedup_out").collect())
    assert got == [(1, 1.0), (2, 2.0), (3, 3.0), (4, 4.0)]
    # static branch: same operator, ordinary dropDuplicates
    flat = spark.createDataFrame(
        [r for rows in files for r in rows], schema)
    static = dedup_event_stream(flat)
    assert not static.isStreaming
    assert sorted(r["event_id"] for r in static.collect()) == [1, 2, 3, 4]


def test_incremental_index_tail_is_o_delta(spark, tmp_path, monkeypatch):
    """Round-4 north item: the incremental READ-INDEX tail must be
    O(delta) like the data merges — an incremental batch (a) runs NO job
    over the full nodes table (trap on store.read('nodes')), (b) MERGES
    its delta postings into the bucket(N, tok) node_tokens index
    rewriting only touched buckets, (c) re-assigns only its own
    embeddings and rewrites only their (label, cell) node_vectors
    partitions (hardlinking the rest), and (d) rolls label_counts
    forward from the merge's own delta metric — while staying exactly
    index-parity with a full rebuild over the union."""
    import dataclasses

    from neo4j_document_pipeline_spark.config import DEFAULT_CONFIG
    from neo4j_document_pipeline_spark.streaming.ingest import (
        ingest_increment)

    cfg = dataclasses.replace(DEFAULT_CONFIG, store_buckets=8)
    root = str(tmp_path / "kg")
    run_pipeline(spark, synth_pages(spark, 30), root, cfg=cfg)
    store = GraphStore(root, spark)
    tok_before = {p["file"]: p["rows"]
                  for p in store.manifest("node_tokens")["partitions"]}
    vec_before = {p["file"] for p in store.manifest("node_vectors")["partitions"]}
    delta = synth_pages(spark, 34).subtract(synth_pages(spark, 30))

    real_read = GraphStore.read

    def trap_read(self, name):
        assert name != "nodes", \
            "incremental index tail read the FULL nodes table"
        return real_read(self, name)

    monkeypatch.setattr(GraphStore, "read", trap_read)
    try:
        ingest_increment(store, delta, cfg=cfg)
    finally:
        monkeypatch.setattr(GraphStore, "read", real_read)

    # (b) bucket-scoped postings merge: <= k rewritten files, others
    # carried by hardlink (present in both snapshots)
    tm = store.manifest("node_tokens")
    assert tm["metrics"].get("merge_scope") == "bucket"
    k = tm["metrics"]["rewritten_buckets"]
    tok_after = {p["file"] for p in tm["partitions"]}
    assert len(tok_after - set(tok_before)) <= k
    assert tm["metrics"]["reused_files"] == len(tok_after & set(tok_before))
    # (c) partition-scoped ANN merge
    vm = store.manifest("node_vectors")
    assert vm["metrics"].get("merge_scope") == "partition"
    c = vm["metrics"]["rewritten_partitions"]
    vec_after = {p["file"] for p in vm["partitions"]}
    # every fresh file lies in one of the c rewritten partition dirs
    fresh_dirs = {f.rsplit("/", 1)[0] for f in (vec_after - vec_before)}
    assert len(fresh_dirs) <= c
    assert vm["metrics"]["reused_files"] == len(vec_after & vec_before)
    # (d) label_counts rolled forward, consistent with committed rows
    nm = store.manifest("nodes")
    assert sum(nm["metrics"]["label_counts"].values()) == nm["rows"]

    # exact index parity vs a full rebuild over the union
    root_full = str(tmp_path / "full")
    run_pipeline(spark, synth_pages(spark, 34), root_full, cfg=cfg)
    full = GraphStore(root_full, spark)
    tok = lambda s: sorted(
        (r["tok"], r["entity_id"], r["label"], r["df"])
        for r in s.read("node_tokens").collect())
    assert tok(full) == tok(store)
    vec_ids = lambda s: sorted(
        r["entity_id"] for r in s.read("node_vectors").collect())
    assert vec_ids(full) == vec_ids(store)
    assert full.manifest("nodes")["metrics"]["label_counts"] == \
        nm["metrics"]["label_counts"]


def test_streamed_store_serves_fresh_indexes(spark, tmp_path):
    """After a foreachBatch stream run, the committed FTS and ANN
    indexes must be LIVE (graphrag probes them, no fallback) and answer
    identically to a batch-built store over the same pages."""
    from neo4j_document_pipeline_spark.operators.retrieval import graphrag

    pages = synth_pages(spark, 40).cache()
    pages_dir = str(tmp_path / "pages")
    pages.repartition(5).write.parquet(pages_dir)
    stream_root = str(tmp_path / "stream_store")
    q = start_ingest_stream(spark, pages_dir, stream_root,
                            str(tmp_path / "ckpt"))
    assert q.awaitTermination(300)
    s = GraphStore(stream_root, spark)
    r = graphrag(spark, s, "What did Al-Khwarizmi develop?")
    assert r.timings.get("ann_index") == 1.0, \
        "streamed store fell back to the brute vector scan"
    batch_root = str(tmp_path / "batch_store")
    run_pipeline(spark, spark.read.parquet(pages_dir), batch_root)
    rb = graphrag(spark, GraphStore(batch_root, spark),
                  "What did Al-Khwarizmi develop?")
    assert r.answer == rb.answer


# ---------------------------------------------------------------------------
# CLI surface: attribution / dedup-stream over an events dir
# ---------------------------------------------------------------------------

def test_cli_attribution_batch_matches_operator(spark, tmp_path, capsys):
    """CLI batch mode prints the same pair set the operator computes."""
    import json

    from neo4j_document_pipeline_spark.__main__ import main
    from neo4j_document_pipeline_spark.streaming.ingest import (
        attribution_pairs)
    events = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    d = str(tmp_path / "events")
    events.write.parquet(d)
    main(["attribution", "--store", str(tmp_path / "kg"), "--events", d,
          "--max-delay", "12 hours", "--limit", "500"])
    lines = capsys.readouterr().out.strip().splitlines()
    head = json.loads(lines[0])
    rows = [json.loads(x) for x in lines[1:]]
    expect = {(r["user_id"], r["trig_id"], r["base_id"]) for r in
              attribution_pairs(events, max_delay="12 hours").collect()}
    assert head["pairs"] == len(expect) > 0
    assert {(r["user_id"], r["trig_id"], r["base_id"])
            for r in rows} == expect


def test_cli_dedup_stream_drain_checkpointed(spark, tmp_path, capsys):
    """--streaming drains an events dir exactly-once: re-delivered rows
    collapse, a rerun processes nothing new, and a file that arrives
    later is picked up incrementally by the checkpoint."""
    import datetime as dt
    import json

    from neo4j_document_pipeline_spark.__main__ import main
    t0 = dt.datetime(2025, 1, 1, 0, 0, 0)
    schema = ("event_id long, ts timestamp, user_id long, "
              "event_type string, value double")
    rows = [(i, t0 + dt.timedelta(minutes=i), i % 3, "view", 1.0)
            for i in range(20)]
    d, out = str(tmp_path / "ev"), str(tmp_path / "out")
    # file 1 = originals, file 2 = at-least-once re-delivery of half
    spark.createDataFrame(rows, schema).coalesce(1) \
        .write.parquet(f"{d}/f1")
    spark.createDataFrame(rows[:10], schema).coalesce(1) \
        .write.parquet(f"{d}/f2")

    def run():
        main(["dedup-stream", "--store", str(tmp_path / "kg"),
              "--events", d + "/*", "--streaming", "--out", out])
        return json.loads(capsys.readouterr().out)["dedup-stream"]

    assert run()["rows_total"] == 20
    assert run()["rows_total"] == 20  # rerun: nothing new
    fresh = [(100 + i, t0 + dt.timedelta(minutes=30 + i), 9, "view", 1.0)
             for i in range(5)]
    spark.createDataFrame(fresh, schema).coalesce(1) \
        .write.parquet(f"{d}/f3")
    assert run()["rows_total"] == 25  # new file drained incrementally


def test_cli_event_commands_validate_inputs(spark, tmp_path):
    import pytest as _pytest

    from neo4j_document_pipeline_spark.__main__ import main
    store = str(tmp_path / "kg")
    with _pytest.raises(SystemExit, match="--events"):
        main(["attribution", "--store", store])
    with _pytest.raises(SystemExit, match="no such events path"):
        main(["attribution", "--store", store, "--events",
              str(tmp_path / "nope")])
    events = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    d = str(tmp_path / "ev")
    events.limit(5).write.parquet(d)
    with _pytest.raises(SystemExit, match="--keys"):
        main(["dedup-stream", "--store", store, "--events", d,
              "--keys", "not_a_column"])
    with _pytest.raises(SystemExit, match="--out"):
        main(["attribution", "--store", store, "--events", d,
              "--streaming"])
    f = d + "/" + [x for x in __import__("os").listdir(d)
                   if x.endswith(".parquet")][0]
    with _pytest.raises(SystemExit, match="DIRECTORY"):
        main(["attribution", "--store", store, "--events", f,
              "--streaming", "--out", str(tmp_path / "o")])
