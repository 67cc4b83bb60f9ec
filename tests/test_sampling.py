"""Training-data export operators: reproducible stratified sampling +
token-budget shard packing (operators/sampling.py)."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from neo4j_document_pipeline_spark.operators.sampling import (
    stratified_sample,
    token_shards,
    uniform_hash_col,
)


def _docs(spark, n=400):
    langs = ["en", "zh", "de", "fr"]
    rows = [(i, langs[i % 4], 10 + (i * 37) % 90) for i in range(n)]
    return spark.createDataFrame(
        rows, "doc_id long, lang string, n_tok long")


def test_uniform_hash_draw_is_uniform_and_salted(spark):
    d = _docs(spark, 2000).select(
        uniform_hash_col("doc_id", "v1").alias("u"),
        uniform_hash_col("doc_id", "v2").alias("u2"))
    rows = d.collect()
    us = np.array([r["u"] for r in rows])
    assert 0.0 <= us.min() and us.max() < 1.0
    assert abs(us.mean() - 0.5) < 0.03  # 2000 draws: mean within ~3σ
    # independent salts draw independent samples
    both = sum(1 for r in rows if r["u"] < 0.3 and r["u2"] < 0.3)
    assert 0.09 * 2000 * 0.5 < both < 0.09 * 2000 * 2.0


def test_stratified_sample_rates_and_default(spark):
    d = _docs(spark)
    got = stratified_sample(d, {"en": 1.0, "zh": 0.0}, "lang",
                            default_rate=0.0).collect()
    assert {r["lang"] for r in got} == {"en"}
    assert len(got) == 100  # rate 1.0 keeps every en row
    # unlisted strata follow default_rate
    all_de = stratified_sample(d, {"en": 0.0, "zh": 0.0, "fr": 0.0},
                               "lang", default_rate=1.0).collect()
    assert {r["lang"] for r in all_de} == {"de"}
    # fractional rate lands near its binomial expectation
    half = stratified_sample(d, {"en": 0.5}, "lang").count()
    assert 30 <= half <= 70  # 100 en rows at p=.5, ±4σ
    with pytest.raises(ValueError, match="rate"):
        stratified_sample(d, {"en": 1.5}, "lang")
    with pytest.raises(ValueError, match="default_rate"):
        stratified_sample(d, {"en": 0.5}, "lang", default_rate=-0.1)


def test_stratified_sample_stable_across_partitionings(spark):
    """The selection is a pure function of the data: any repartitioning
    of the same rows yields the IDENTICAL sample (the property
    df.sample(seed) does NOT have)."""
    d = _docs(spark)
    base = {r["doc_id"] for r in
            stratified_sample(d, {"en": 0.4, "zh": 0.7}, "lang",
                              default_rate=0.2).collect()}
    for reshaped in (d.repartition(7), d.repartition(1),
                     d.orderBy(F.col("doc_id").desc())):
        got = {r["doc_id"] for r in
               stratified_sample(reshaped, {"en": 0.4, "zh": 0.7},
                                 "lang", default_rate=0.2).collect()}
        assert got == base
    assert base  # non-degenerate fixture


def _brute_shards(rows, budget):
    out, cum = {}, 0
    for doc_id, n_tok in sorted(rows):
        out[doc_id] = cum // budget
        cum += n_tok
    return out


def test_token_shards_matches_global_prefix_sum(spark):
    rng = np.random.RandomState(3)
    rows = [(int(i), int(rng.randint(1, 900))) for i in range(500)]
    d = spark.createDataFrame(rows, "doc_id long, n_tok long")
    for budget, n_parts in ((1000, 8), (4096, 3), (250, 32)):
        want = _brute_shards(rows, budget)
        got = {r["doc_id"]: r["shard_id"] for r in
               token_shards(d.repartition(5), budget,
                            n_partitions=n_parts).collect()}
        assert got == want, (budget, n_parts)
    # oversized documents span their own shard ids without breaking
    # the packing of what follows
    big = [(0, 50), (1, 10_000), (2, 50)]
    got = {r["doc_id"]: r["shard_id"] for r in
           token_shards(spark.createDataFrame(
               big, "doc_id long, n_tok long"), 100).collect()}
    assert got == _brute_shards(big, 100)
    assert got[1] == 0 and got[2] == 100  # doc 2 lands after the giant
    with pytest.raises(ValueError, match="budget"):
        token_shards(d, 0)


def test_token_shards_rejects_corrupt_inputs(spark):
    """Nulls (no width), duplicate order keys (nondeterministic
    packing), and a reserved _pid column all fail loudly before any
    output is produced."""
    nulls = spark.createDataFrame(
        [(0, 10), (1, None), (2, 10)], "doc_id long, n_tok long")
    with pytest.raises(ValueError, match="null"):
        token_shards(nulls, 100, n_partitions=2)
    dups = spark.createDataFrame(
        [(0, 10), (1, 10), (1, 20)], "doc_id long, n_tok long")
    with pytest.raises(ValueError, match="unique"):
        token_shards(dups, 100, n_partitions=2)
    pid = spark.createDataFrame(
        [(0, 10, 0)], "doc_id long, n_tok long, _pid int")
    with pytest.raises(ValueError, match="_pid"):
        token_shards(pid, 100)


def test_cli_bound_flags_reject_nonpositive():
    import argparse

    from neo4j_document_pipeline_spark.__main__ import _int_or_none
    assert _int_or_none("none") is None
    assert _int_or_none("OFF") is None
    assert _int_or_none("7") == 7
    for bad in ("0", "-3"):
        with pytest.raises(argparse.ArgumentTypeError, match="positive"):
            _int_or_none(bad)


def test_cli_sample_and_shards(spark, tmp_path, capsys):
    """The export surface over a committed store: `sample` draws the
    SAME subset on every invocation (and a different one under a new
    salt), `shards` prints a deterministic packing plan whose doc count
    reconciles with the documents table."""
    import json

    from neo4j_document_pipeline_spark.__main__ import main
    from neo4j_document_pipeline_spark.plans.pipeline import run_pipeline
    from neo4j_document_pipeline_spark.sources.pages import synth_pages
    from neo4j_document_pipeline_spark.sources.store import GraphStore
    root = str(tmp_path / "kg")
    run_pipeline(spark, synth_pages(spark, 12), root)
    n_docs = GraphStore(root, spark).read("documents").count()

    def run(args):
        main(args + ["--store", root, "--limit", "500"])
        return [json.loads(line) for line in
                capsys.readouterr().out.strip().splitlines()]

    s1 = run(["sample", "--rate", "0.5"])
    s2 = run(["sample", "--rate", "0.5"])
    assert s1 == s2 and 0 < len(s1) < n_docs
    other = run(["sample", "--rate", "0.5", "--salt", "v2"])
    assert [r["doc_id"] for r in other] != [r["doc_id"] for r in s1]
    # stratified form validates its column loudly
    with pytest.raises(SystemExit, match="strata-col"):
        run(["sample", "--rates", "en=0.5", "--strata-col", "nope"])
    # shards: plan covers every document exactly once, ids contiguous
    plan = run(["shards", "--budget", "512"])
    assert sum(r["docs"] for r in plan) == n_docs
    assert [r["shard_id"] for r in plan] == sorted(
        r["shard_id"] for r in plan)


def test_cli_prepare_end_to_end(spark, tmp_path, capsys):
    """`prepare` = decontam -> sample -> shard export in one command:
    the benchmark-overlapping document is dropped, shards land as
    partitioned parquet + manifest, and a rerun produces the IDENTICAL
    (doc_id, shard_id) assignment (every stage is a pure function of
    data and salt)."""
    import json
    import os

    from neo4j_document_pipeline_spark.__main__ import main
    from neo4j_document_pipeline_spark.plans.pipeline import run_pipeline
    from neo4j_document_pipeline_spark.sources.pages import synth_pages
    from neo4j_document_pipeline_spark.sources.store import GraphStore
    root = str(tmp_path / "kg")
    # plant ONE page with a unique token run: the synth corpus is
    # templated (docs share boilerplate n-grams), so the benchmark
    # must overlap exactly one document, not the template
    import datetime as dt
    secret = " ".join(f"zqsecret{i}" for i in range(12))
    planted = spark.createDataFrame(
        [("p://leak", "A page. " + secret + " End.",
          dt.datetime(2025, 1, 1))],
        "url string, text string, warc_ts timestamp")
    pages = synth_pages(spark, 12).select(
        "url", "text", "warc_ts").unionByName(planted)
    run_pipeline(spark, pages, root)
    docs = GraphStore(root, spark).read("documents")
    n_docs = docs.count()
    leak = docs.filter(F.col("text").contains("zqsecret0")) \
        .select("doc_id").first()
    bench_path = str(tmp_path / "bench")
    spark.createDataFrame([(secret,)], "text string") \
        .write.parquet(bench_path)

    def run(args):
        main(args + ["--store", root])
        return json.loads(capsys.readouterr().out.strip().splitlines()[-1])

    out1 = str(tmp_path / "s1")
    m1 = run(["prepare", "--out", out1, "--bench", bench_path,
              "--decontam-n", "8", "--budget", "512"])
    assert m1["decontam"] == {"bench": bench_path, "n": 8}
    assert 0 < m1["n_docs"] < n_docs  # the leaked doc was dropped
    assert m1["n_shards"] >= 1 and m1["tokens_total"] > 0
    got = spark.read.parquet(out1)
    ids = {r["doc_id"] for r in got.select("doc_id").collect()}
    assert leak["doc_id"] not in ids
    assert len(ids) == m1["n_docs"]
    assert os.path.exists(os.path.join(out1, "_prepare_manifest.json"))
    # determinism: a second run assigns byte-identical shards
    out2 = str(tmp_path / "s2")
    m2 = run(["prepare", "--out", out2, "--bench", bench_path,
              "--decontam-n", "8", "--budget", "512"])
    assert m2 == {**m1}
    a1 = sorted((r["doc_id"], r["shard_id"]) for r in
                got.select("doc_id", "shard_id").collect())
    a2 = sorted((r["doc_id"], r["shard_id"]) for r in
                spark.read.parquet(out2)
                .select("doc_id", "shard_id").collect())
    assert a1 == a2
    # sampling composes: a 0.5 draw keeps a strict, reproducible subset
    out3 = str(tmp_path / "s3")
    m3 = run(["prepare", "--out", out3, "--rate", "0.5",
              "--budget", "512"])
    assert 0 < m3["n_docs"] < n_docs and m3["sample"] == {"rate": 0.5}
    # loud validation
    with pytest.raises(SystemExit, match="--out"):
        run(["prepare"])
    with pytest.raises(SystemExit, match="benchmark path"):
        run(["prepare", "--out", str(tmp_path / "s4"),
             "--bench", str(tmp_path / "missing")])


def test_token_shards_carry_across_arrow_batches(spark):
    """The in-partition cumsum carry survives Arrow batch boundaries:
    force tiny batches so every partition spans several."""
    rows = [(int(i), 7) for i in range(300)]
    d = spark.createDataFrame(rows, "doc_id long, n_tok long")
    key = "spark.sql.execution.arrow.maxRecordsPerBatch"
    old = spark.conf.get(key, None)
    spark.conf.set(key, "10")
    try:
        got = {r["doc_id"]: r["shard_id"] for r in
               token_shards(d, 100, n_partitions=4).collect()}
    finally:
        if old is None:
            spark.conf.unset(key)
        else:
            spark.conf.set(key, old)
    assert got == _brute_shards(rows, 100)


# ---------------------------------------------------------------------------
# weighted sampling (A-ES)
# ---------------------------------------------------------------------------

def test_weighted_sample_matches_brute_aes(spark):
    """The selection equals the brute-force A-ES ranking computed in
    python over the same hash draws."""
    import hashlib

    from neo4j_document_pipeline_spark.operators.sampling import (
        weighted_sample)
    rows = [(f"d{i:03d}", float(1 + (i * 7) % 23)) for i in range(200)]
    df = spark.createDataFrame(rows, "doc_id string, w double")

    def u(doc_id, salt="v1"):
        h = hashlib.sha256(f"{salt}:{doc_id}".encode()).hexdigest()
        return int(h[:8], 16) / float(1 << 32)

    brute = sorted(rows, key=lambda r: (-(u(r[0]) ** (1.0 / r[1])), r[0]))
    expect = {r[0] for r in brute[:25]}
    got = {r["doc_id"] for r in
           weighted_sample(df, 25, "w", id_col="doc_id").collect()}
    assert got == expect


def test_weighted_sample_weight_proportionality(spark):
    """A 100x-weighted minority must be overrepresented vs its share."""
    from neo4j_document_pipeline_spark.operators.sampling import (
        weighted_sample)
    rows = [(f"h{i:04d}", 100.0, "heavy") for i in range(100)] + \
           [(f"l{i:04d}", 1.0, "light") for i in range(900)]
    df = spark.createDataFrame(rows, "doc_id string, w double, kind string")
    got = weighted_sample(df, 100, "w", id_col="doc_id").collect()
    heavy = sum(1 for r in got if r["kind"] == "heavy")
    # heavy mass = 10000/10900 ~ 92%; population share only 10%
    assert heavy > 50


def test_weighted_sample_stable_and_salted(spark):
    from neo4j_document_pipeline_spark.operators.sampling import (
        weighted_sample)
    rows = [(f"d{i:03d}", float(1 + i % 9)) for i in range(300)]
    df = spark.createDataFrame(rows, "doc_id string, w double")
    a = {r["doc_id"] for r in weighted_sample(df, 50, "w").collect()}
    b = {r["doc_id"] for r in
         weighted_sample(df.repartition(7), 50, "w").collect()}
    assert a == b  # pure function of the data
    c = {r["doc_id"] for r in
         weighted_sample(df, 50, "w", salt="v2").collect()}
    assert c != a  # independent draw


def test_weighted_sample_strata_and_validation(spark):
    import pytest as _pytest

    from neo4j_document_pipeline_spark.operators.sampling import (
        weighted_sample)
    rows = [(f"d{i:03d}", 1.0 + i % 3, "en" if i % 2 else "ms")
            for i in range(100)]
    df = spark.createDataFrame(rows, "doc_id string, w double, lang string")
    per = weighted_sample(df, 10, "w", strata_col="lang").collect()
    by = {}
    for r in per:
        by.setdefault(r["lang"], set()).add(r["doc_id"])
    assert set(by) == {"en", "ms"} and all(len(v) == 10 for v in by.values())
    with _pytest.raises(ValueError):
        weighted_sample(df, 0, "w")
    # null / non-positive / NaN weights carry no mass (NaN would
    # otherwise pass w > 0 under Spark's NaN-is-largest ordering, score
    # a NaN key, and crowd out the whole sample)
    bad = spark.createDataFrame(
        [("a", None), ("b", -1.0), ("c", 0.0), ("d", 2.0),
         ("e", float("nan"))],
        "doc_id string, w double")
    assert [r["doc_id"] for r in weighted_sample(bad, 4, "w").collect()] \
        == ["d"]


# ---------------------------------------------------------------------------
# temperature-scaled source-mixture weights (operators/corpus.py)
# ---------------------------------------------------------------------------

def test_mixture_weights_known_values(spark):
    """Two sources with 100 vs 400 tokens at alpha=0.5: sqrt smoothing
    gives 10:20 -> weights 1/3 and 2/3; a 1000-token budget implies
    epochs (1/3)*1000/100 and (2/3)*1000/400."""
    from neo4j_document_pipeline_spark.operators.corpus import (
        mixture_weights)
    rows = [("small", 25), ("small", 25), ("small", 50),
            ("big", 400)]
    df = spark.createDataFrame(rows, "source string, n_tok long")
    got = {r["source"]: r for r in
           mixture_weights(df, "source", "n_tok", alpha=0.5,
                           budget_tokens=1000).collect()}
    assert got["small"]["n_docs"] == 3 and got["small"]["tokens"] == 100
    assert got["big"]["tokens"] == 400
    assert got["small"]["weight"] == pytest.approx(1 / 3, abs=1e-6)
    assert got["big"]["weight"] == pytest.approx(2 / 3, abs=1e-6)
    assert got["small"]["p_raw"] == 0.2 and got["big"]["p_raw"] == 0.8
    assert got["small"]["epochs"] == pytest.approx(10 / 3, abs=1e-4)
    assert got["big"]["epochs"] == pytest.approx(5 / 3, abs=1e-4)


def test_mixture_weights_alpha_one_keeps_natural_mix_and_flattens(spark):
    from neo4j_document_pipeline_spark.operators.corpus import (
        mixture_weights)
    rows = [("a", 100), ("b", 900)]
    df = spark.createDataFrame(rows, "source string, n_tok long")
    nat = {r["source"]: r for r in
           mixture_weights(df, "source", "n_tok", alpha=1.0).collect()}
    assert nat["a"]["weight"] == nat["a"]["p_raw"] == 0.1
    assert nat["b"]["weight"] == nat["b"]["p_raw"] == 0.9
    # lower temperature pulls the mix toward uniform, never past it
    cool = {r["source"]: r["weight"] for r in
            mixture_weights(df, "source", "n_tok", alpha=0.25).collect()}
    assert 0.1 < cool["a"] < 0.5 < cool["b"] < 0.9


def test_mixture_weights_zero_token_source_and_validation(spark):
    from neo4j_document_pipeline_spark.operators.corpus import (
        mixture_weights)
    rows = [("a", 0), ("a", None), ("b", 100)]
    df = spark.createDataFrame(rows, "source string, n_tok long")
    got = {r["source"]: r for r in
           mixture_weights(df, "source", "n_tok",
                           budget_tokens=500).collect()}
    # an empty source carries no mass and an undefined epoch count
    assert got["a"]["tokens"] == 0 and got["a"]["weight"] == 0.0
    assert got["a"]["epochs"] is None
    assert got["b"]["weight"] == 1.0
    assert got["b"]["epochs"] == 5.0
    with pytest.raises(ValueError):
        mixture_weights(df, "source", "n_tok", alpha=0.0)
    with pytest.raises(ValueError):
        mixture_weights(df, "source", "n_tok", budget_tokens=-1)


# ---------------------------------------------------------------------------
# interleave_order (weighted-round-robin training order)
# ---------------------------------------------------------------------------

def _brute_interleave(rows, weights, salt="v1"):
    import hashlib

    def u(i):
        h = hashlib.sha256(f"{salt}:{i}".encode()).hexdigest()
        return int(h[:8], 16) / float(1 << 32)

    by_g = {}
    for i, g in rows:
        by_g.setdefault(g, []).append(i)
    out = []
    for g, ids in by_g.items():
        ids.sort(key=lambda i: (u(i), i))
        for r, i in enumerate(ids, 1):
            out.append((i, g, r, (r - 0.5) / weights[g]))
    out.sort(key=lambda t: (t[3], t[1], t[0]))
    return [(i, g, r, vt, p + 1)
            for p, (i, g, r, vt) in enumerate(out)]


def test_interleave_order_brute_parity(spark):
    from neo4j_document_pipeline_spark.operators.sampling import (
        interleave_order)
    weights = {"a": 3.0, "b": 1.0, "c": 2.0}
    rows = [(i, "abc"[i % 3]) for i in range(120)]
    out = sorted(
        interleave_order(
            spark.createDataFrame(rows, "doc_id long, src string"),
            "src", "doc_id", weights=weights).collect(),
        key=lambda r: r["pos"])
    got = [(r["doc_id"], r["src"], r["grp_rank"], r["vt"], r["pos"])
           for r in out]
    assert got == _brute_interleave(rows, weights)


def test_interleave_order_prefix_ratio_property(spark):
    # stride scheduling: in every prefix, each ACTIVE group's served
    # count is within 1 of its weight share — the property that makes
    # the order a usable per-batch mixture, not just globally fair
    from neo4j_document_pipeline_spark.operators.sampling import (
        interleave_order)
    weights = {"big": 3.0, "small": 1.0}
    rows = [(i, "big" if i < 300 else "small") for i in range(400)]
    out = sorted(
        interleave_order(
            spark.createDataFrame(rows, "doc_id long, src string"),
            "src", "doc_id", weights=weights).collect(),
        key=lambda r: r["pos"])
    seen = {"big": 0, "small": 0}
    for k, r in enumerate(out[:400], 1):
        seen[r["src"]] += 1
        if seen["big"] < 300 and seen["small"] < 100:  # both active
            assert abs(seen["big"] - k * 0.75) <= 1.0
            assert abs(seen["small"] - k * 0.25) <= 1.0


def test_interleave_order_partitioning_invariance(spark):
    from neo4j_document_pipeline_spark.operators.sampling import (
        interleave_order)
    rows = [(i, "ab"[i % 2]) for i in range(200)]
    df = spark.createDataFrame(rows, "doc_id long, src string")
    kw = dict(weights={"a": 2.0, "b": 1.0})
    one = sorted(map(tuple, interleave_order(
        df.coalesce(1), "src", "doc_id", **kw).collect()))
    many = sorted(map(tuple, interleave_order(
        df.repartition(11, "doc_id"), "src", "doc_id",
        n_partitions=5, **kw).collect()))
    assert one == many


def test_interleave_order_validation(spark):
    import pytest as _pytest

    from neo4j_document_pipeline_spark.operators.sampling import (
        interleave_order)
    df = spark.createDataFrame(
        [(1, "a"), (2, "b")], "doc_id long, src string")
    with _pytest.raises(ValueError, match="non-empty"):
        interleave_order(df, "src", "doc_id", weights={})
    with _pytest.raises(ValueError, match="positive"):
        interleave_order(df, "src", "doc_id",
                         weights={"a": 0.0, "b": 1.0})
    with _pytest.raises(ValueError, match="without a weight"):
        interleave_order(df, "src", "doc_id",
                         weights={"a": 1.0}).collect()
    dup = spark.createDataFrame(
        [(1, "a"), (1, "a")], "doc_id long, src string")
    with _pytest.raises(ValueError, match="unique"):
        interleave_order(dup, "src", "doc_id",
                         weights={"a": 1.0}).collect()
    nulls = spark.createDataFrame(
        [(1, "a"), (2, None)], "doc_id long, src string")
    with _pytest.raises(ValueError, match="NULL group"):
        interleave_order(nulls, "src", "doc_id",
                         weights={"a": 1.0}).collect()


def test_cli_prepare_c4_and_interleave(spark, tmp_path, capsys):
    """`prepare --c4` drops failing pages and exports the line-filtered
    text; `prepare --interleave` packs shards in the weighted-round-
    robin order (pos column, manifest record); `hygiene` reports the
    C4 rule exposure."""
    import json
    import re

    from neo4j_document_pipeline_spark.__main__ import main
    from neo4j_document_pipeline_spark.plans.pipeline import run_pipeline
    from neo4j_document_pipeline_spark.sources.pages import synth_pages
    from neo4j_document_pipeline_spark.sources.store import GraphStore
    root = str(tmp_path / "kg")
    run_pipeline(spark, synth_pages(spark, 10), root)
    docs = GraphStore(root, spark).read("documents")
    n_docs = docs.count()

    def run(args):
        main(args + ["--store", root])
        return json.loads(capsys.readouterr().out.strip().splitlines()[-1])

    # --c4: every exported line obeys the line rules; failing pages gone
    out1 = str(tmp_path / "c4out")
    m1 = run(["prepare", "--out", out1, "--c4", "--budget", "512"])
    assert m1["c4"] is True and 0 < m1["n_docs"] <= n_docs
    for r in spark.read.parquet(out1).select("text").collect():
        for line in r["text"].split("\n"):
            assert re.search(r'[.!?"]$', line)
            assert len(line.split()) >= 5
            assert not re.search(r"(?i)\bjavascript\b", line)
    # --interleave: shards pack in pos order; manifest records weights
    titles = sorted(r["title"] for r in
                    docs.select("title").distinct().collect())
    weights = ",".join(f"{t}={1.0 + (i % 2)}"
                       for i, t in enumerate(titles))
    out2 = str(tmp_path / "ileave")
    m2 = run(["prepare", "--out", out2, "--strata-col", "title",
              "--interleave", weights, "--budget", "256"])
    assert m2["interleave"]["strata_col"] == "title"
    assert m2["n_docs"] == n_docs
    got = spark.read.parquet(out2).select("pos", "shard_id").collect()
    assert sorted(r["pos"] for r in got) == list(range(1, n_docs + 1))
    # shard ids are monotone in pos (the packing followed the order)
    by_pos = [r["shard_id"] for r in sorted(got, key=lambda r: r["pos"])]
    assert by_pos == sorted(by_pos)
    # a group missing from the weights fails loudly
    with _raises_value_error("without a weight"):
        run(["prepare", "--out", str(tmp_path / "bad"),
             "--strata-col", "title", "--interleave",
             f"{titles[0]}=1.0", "--budget", "256"])
    # hygiene: the C4 exposure section rides the standard report
    # (multi-line indented JSON — parse the whole stdout)
    main(["hygiene", "--store", root])
    rep = json.loads(capsys.readouterr().out)
    c4 = rep["c4_rules"]
    assert set(c4) >= {"docs_keep", "docs_lorem", "docs_brace",
                       "docs_badword", "docs_too_few_sentences",
                       "line_keep_frac_mean", "keep_rate"}
    assert 0.0 <= c4["keep_rate"] <= 1.0
    assert 0.0 < c4["line_keep_frac_mean"] <= 1.0


def _raises_value_error(match):
    import pytest as _pytest
    return _pytest.raises(ValueError, match=match)


def test_cli_prepare_gopher_and_fuzzy_decontam(spark, tmp_path, capsys):
    """`prepare --gopher` drops pages failing the Gopher shape rules;
    `--fuzzy-jaccard` scrubs whole-document near-copies of bench docs
    that the 13-gram pass can be blinded to; `hygiene` reports the
    Gopher rule exposure."""
    import json

    import pytest

    from neo4j_document_pipeline_spark.__main__ import main
    from neo4j_document_pipeline_spark.operators.corpus import (
        gopher_quality_filters)
    from neo4j_document_pipeline_spark.plans.pipeline import run_pipeline
    from neo4j_document_pipeline_spark.sources.pages import synth_pages
    from neo4j_document_pipeline_spark.sources.store import GraphStore
    root = str(tmp_path / "kg")
    run_pipeline(spark, synth_pages(spark, 10), root)
    docs = GraphStore(root, spark).read("documents")
    n_docs = docs.count()

    def run(args):
        main(args + ["--store", root])
        return json.loads(capsys.readouterr().out.strip().splitlines()[-1])

    # --gopher: the export holds exactly the operator's keep set
    out1 = str(tmp_path / "gout")
    m1 = run(["prepare", "--out", out1, "--gopher",
              "--gopher-min-words", "20", "--budget", "4096"])
    keep_ids = {r["doc_id"] for r in gopher_quality_filters(
        docs, "doc_id", "text", min_words=20)
        .filter("keep").select("doc_id").collect()}
    assert m1["gopher"] == {"min_words": 20}
    assert m1["n_docs"] == len(keep_ids) > 0
    got_ids = {r["doc_id"] for r in
               spark.read.parquet(out1).select("doc_id").collect()}
    assert got_ids == keep_ids

    # --fuzzy-jaccard: a whole-document copy of a bench doc is
    # scrubbed even when the exact n-gram pass is blind (n larger
    # than every document)
    victim = docs.select("doc_id", "text").collect()[0]
    bench_dir = str(tmp_path / "bench")
    spark.createDataFrame(
        [(victim["text"],)], "text string").write.parquet(bench_dir)
    out2 = str(tmp_path / "fz")
    m2 = run(["prepare", "--out", out2, "--bench", bench_dir,
              "--decontam-n", "100000", "--fuzzy-jaccard", "0.8",
              "--budget", "4096"])
    assert m2["decontam"]["fuzzy"] == {"jaccard": 0.8,
                                       "shingle_words": 3}
    assert m2["n_docs"] == n_docs - 1
    left = {r["doc_id"] for r in
            spark.read.parquet(out2).select("doc_id").collect()}
    assert victim["doc_id"] not in left

    # loud validation: fuzzy without a bench set, threshold range
    with pytest.raises(SystemExit):
        run(["prepare", "--out", str(tmp_path / "x1"),
             "--fuzzy-jaccard", "0.5"])
    capsys.readouterr()
    with pytest.raises(SystemExit):
        run(["prepare", "--out", str(tmp_path / "x2"), "--bench",
             bench_dir, "--fuzzy-jaccard", "1.5"])
    capsys.readouterr()

    # hygiene: the Gopher exposure section rides the standard report
    main(["hygiene", "--store", root, "--gopher-min-words", "20"])
    rep = json.loads(capsys.readouterr().out)
    g = rep["gopher_rules"]
    assert set(g) >= {"docs_keep", "docs_too_short", "docs_word_len",
                      "docs_symbol_heavy", "docs_low_alpha",
                      "docs_no_stopwords", "keep_rate", "min_words"}
    assert g["min_words"] == 20 and 0.0 <= g["keep_rate"] <= 1.0
    assert g["docs_keep"] == len(keep_ids)
