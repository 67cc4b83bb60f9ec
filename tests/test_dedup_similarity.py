"""Dedup, similarity, textstats, multimodal operator tests."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from neo4j_document_pipeline_spark.functions.featurizer import cosine
from neo4j_document_pipeline_spark.functions.textstats import (
    col_fingerprint,
    col_lang_id,
    col_quality_score,
    col_token_count,
)
from neo4j_document_pipeline_spark.operators.dedup import (
    dedup_exact,
    embedding_near_duplicates,
    exact_duplicate_groups,
    minhash_near_duplicates,
    simhash_near_duplicates,
)
from neo4j_document_pipeline_spark.operators.multimodal import (
    attach_media_metadata,
    extract_media_features,
    sample_frames,
    synth_media,
)
from neo4j_document_pipeline_spark.operators.similarity import (
    brute_force_topk,
    lsh_bucketed_topk,
    pairwise_topk_join,
)

SF = "/root/testdata/sf0.001"




@pytest.fixture(scope="module")
def embs(spark):
    return spark.read.parquet(f"{SF}/embeddings.parquet").cache()


def test_exact_dedup(spark):
    df = spark.createDataFrame(
        [(1, "same text"), (2, "same text"), (3, "other"), (4, "same text")],
        "id long, text string",
    )
    groups = exact_duplicate_groups(df, "id", "text").collect()
    assert len(groups) == 1
    assert groups[0]["n_dups"] == 3 and groups[0]["keep_id"] == 1
    kept = dedup_exact(df, "id", "text")
    assert sorted(r["id"] for r in kept.collect()) == [1, 3]


def test_minhash_near_duplicates(spark):
    base = ("the quick brown fox jumps over the lazy dog and runs far away "
            "into the deep green forest tonight") * 3
    near = base.replace("green", "blue")
    far = "completely different content about spark shuffle partitions " * 5
    df = spark.createDataFrame(
        [(1, base), (2, near), (3, far), (4, base)], "id long, text string")
    pairs = {(r["id1"], r["id2"]): r["jaccard"]
             for r in minhash_near_duplicates(df, "id", "text", jaccard_threshold=0.5).collect()}
    assert (1, 4) in pairs and pairs[(1, 4)] == 1.0
    assert (1, 2) in pairs
    assert not any(3 in p for p in pairs)


def test_resolve_near_duplicates_transitive(spark):
    """Resolution clusters TRANSITIVELY: A~B and B~C land in one cluster
    (one survivor) even when J(A, C) is below the threshold — the case
    pairwise-greedy dedup gets wrong — and untouched docs never appear."""
    from neo4j_document_pipeline_spark.operators.dedup import (
        minhash_near_duplicates, resolve_near_duplicates)
    words = [f"tok{i}" for i in range(50)]
    a = " ".join(words)
    b_words = list(words)
    b_words[10] = "changedone"          # J(a,b) ~ 45/51 ≈ 0.88
    b = " ".join(b_words)
    c_words = list(b_words)
    c_words[40] = "changedtwo"          # J(b,c) ≈ 0.88, J(a,c) ≈ 0.78
    c = " ".join(c_words)
    far = "entirely different text about spark adaptive execution " * 5
    df = spark.createDataFrame(
        [("d1", a), ("d2", b), ("d3", c), ("d4", far)],
        "doc_id string, text string")
    pairs = {(r["id1"], r["id2"]) for r in minhash_near_duplicates(
        df, "doc_id", "text", jaccard_threshold=0.8).collect()}
    assert ("d1", "d3") not in pairs  # the chain link really is missing
    assert ("d1", "d2") in pairs and ("d2", "d3") in pairs
    got = {r["doc_id"]: (r["keep_id"], r["is_kept"]) for r in
           resolve_near_duplicates(df, "doc_id", "text",
                                   jaccard_threshold=0.8).collect()}
    assert got == {"d1": ("d1", True), "d2": ("d1", False),
                   "d3": ("d1", False)}  # d4 untouched, absent
    # the corpus filter shape: drop is_kept=false rows, keep the rest
    res = resolve_near_duplicates(df, "doc_id", "text",
                                  jaccard_threshold=0.8)
    survivors = df.join(res.filter(~F.col("is_kept")).select("doc_id"),
                        "doc_id", "left_anti")
    assert sorted(r["doc_id"] for r in survivors.collect()) == ["d1", "d4"]


def test_simhash_near_duplicates(spark):
    base = " ".join(f"word{i}" for i in range(300))
    near = base.replace("word299", "changed")  # 1/300 tokens differ
    far = "orange apple banana " * 30
    df = spark.createDataFrame(
        [(1, base), (2, near), (3, far)], "id long, text string")
    pairs = {(r["id1"], r["id2"]): r["hamming"]
             for r in simhash_near_duplicates(df, "id", "text", max_hamming=6).collect()}
    assert (1, 2) in pairs
    assert not any(3 in p for p in pairs)


def test_embedding_near_duplicates(spark):
    rng = np.random.RandomState(0)
    v = rng.normal(size=16)
    v = v / np.linalg.norm(v)
    near = v + rng.normal(scale=0.01, size=16)
    near = near / np.linalg.norm(near)
    far = rng.normal(size=16)
    far = far / np.linalg.norm(far)
    df = spark.createDataFrame(
        [(1, v.tolist()), (2, near.tolist()), (3, far.tolist())],
        "id long, vec array<float>",
    )
    pairs = {(r["id1"], r["id2"]) for r in
             embedding_near_duplicates(df, "id", "vec", threshold=0.98).collect()}
    assert (1, 2) in pairs
    assert not any(3 in p for p in pairs)


def test_brute_force_topk_matches_numpy(spark, embs):
    q = embs.filter(F.col("vec_id") == 0).first()["embedding"]
    got = brute_force_topk(embs, "vec_id", "embedding", list(q), k=10).collect()
    assert got[0]["vec_id"] == 0 and abs(got[0]["score"] - 1.0) < 1e-6
    rows = embs.select("vec_id", "embedding").collect()
    scores = sorted(
        ((cosine(r["embedding"], q), r["vec_id"]) for r in rows),
        key=lambda t: (-t[0], t[1]))
    expect = [vid for _, vid in scores[:10]]
    assert [r["vec_id"] for r in got] == expect


def test_lsh_topk_recall(spark, embs):
    q = list(embs.filter(F.col("vec_id") == 7).first()["embedding"])
    exact = [r["vec_id"] for r in brute_force_topk(embs, "vec_id", "embedding", q, 5).collect()]
    approx = [r["vec_id"] for r in
              lsh_bucketed_topk(embs, "vec_id", "embedding", q, 5,
                                n_planes=8, multiprobe=2).collect()]
    # top-1 (the query vector itself) must survive bucketing; on random
    # near-orthogonal vectors tail recall is inherently low — that's the
    # LSH recall/cost trade-off, tuned via n_planes/multiprobe
    assert approx and approx[0] == exact[0]
    assert len(set(approx) & set(exact)) >= 1


def test_pairwise_topk_join(spark, embs):
    left = embs.limit(4)
    out = pairwise_topk_join(left, embs, "vec_id", "vec_id",
                             "embedding", "embedding", k=3).collect()
    by_left = {}
    for r in out:
        by_left.setdefault(r["lid"], []).append(r)
    for lid, rows in by_left.items():
        assert len(rows) == 3
        top = next(r for r in rows if r["rank"] == 1)
        assert top["rid"] == lid  # self is the most similar (rank, not row order)


def test_textstats_columns(spark):
    df = spark.createDataFrame(
        [(1, "The house of wisdom was a great center of learning and science."),
         (2, "yang dan di untuk dengan ini pada adalah dari dalam."),
         (3, "@@@ ### $$$ %%%")],
        "id long, text string",
    )
    out = df.select(
        "id",
        col_token_count(F.col("text")).alias("n_tok"),
        col_lang_id(F.col("text")).alias("lang"),
        col_quality_score(F.col("text")).alias("q"),
        col_fingerprint(F.col("text")).alias("fp"),
    ).collect()
    rows = {r["id"]: r for r in out}
    assert rows[1]["lang"] == "en"
    assert rows[2]["lang"] == "ms"
    assert rows[3]["lang"] == "unknown"
    assert rows[1]["q"] > rows[3]["q"]
    assert rows[1]["n_tok"] == 12
    assert len(rows[1]["fp"]) == 64
    # fingerprint is order/whitespace-insensitive
    df2 = spark.createDataFrame(
        [(1, "science and learning:   of great center was THE house wisdom a of.")],
        "id long, text string")
    fp2 = df2.select(col_fingerprint(F.col("text")).alias("fp")).first()["fp"]
    assert fp2 == rows[1]["fp"]


def test_repetition_fractions_known_values(spark):
    """Gopher-style in-document repetition: duplicate-line and
    duplicate-trigram fractions on hand-computable fixtures."""
    from neo4j_document_pipeline_spark.functions.textstats import (
        col_dup_line_fraction, col_dup_ngram_fraction)
    nav = "home | about | contact"
    boiler = f"{nav}\nSome real prose here.\n{nav}\n  \n{nav}\n"
    looping = "x y z " * 2 + "x y z"  # toks: x y z x y z x y z
    df = spark.createDataFrame(
        [(1, boiler), (2, "unique one\nunique two"), (3, looping),
         (4, "too short"), (5, ""), (6, None)],
        "id long, text string")
    rows = {r["id"]: r for r in df.select(
        "id",
        col_dup_line_fraction(F.col("text")).alias("dl"),
        col_dup_ngram_fraction(F.col("text"), 3).alias("dg")).collect()}
    # boiler: 4 non-empty lines (blank line dropped), nav ×3 -> 2 dups
    assert rows[1]["dl"] == pytest.approx(2 / 4)
    assert rows[2]["dl"] == 0.0 and rows[2]["dg"] == 0.0
    # looping: 9 tokens -> 7 trigrams, 3 distinct -> 4/7 repeated
    assert rows[3]["dg"] == pytest.approx(4 / 7)
    assert rows[4]["dg"] == 0.0  # 2 tokens < n: no gram space
    assert rows[5]["dl"] == 0.0 and rows[5]["dg"] == 0.0
    assert rows[6]["dl"] is None or rows[6]["dl"] == 0.0  # null text


def test_top_ngram_known_values(spark):
    """The Gopher top-n-gram signal: most frequent gram, tie-break to
    the smallest gram, exact char fraction from integer inputs."""
    from neo4j_document_pipeline_spark.functions.textstats import (
        col_top_ngram)
    looping = "spam ham spam ham spam"  # bigrams: (spam ham)x2,
    #                                     (ham spam)x2 -> tie
    df = spark.createDataFrame(
        [(1, looping),
         (2, "all words here are different ones"),
         (3, "buy now " * 5 + "and some real prose follows here")],
        "id long, text string")
    got = {r["id"]: r["s"].asDict() for r in df.select(
        "id", col_top_ngram(F.col("text"), 2).alias("s")).collect()}
    # tie at count 2 resolves to the lexicographically smaller gram
    assert got[1]["best"] == 2 and got[1]["bestg"] == "ham spam"
    assert got[1]["total"] == len(looping)
    # all-distinct bigrams: any gram at count 1, smallest wins
    assert got[2]["best"] == 1 and got[2]["bestg"] == "all words"
    # "buy now" x5 dominates: 5 * len("buy now") / total chars
    s3 = got[3]
    text3 = "buy now " * 5 + "and some real prose follows here"
    assert s3["best"] == 5 and s3["bestg"] == "buy now"
    frac = s3["best"] * len(s3["bestg"]) / s3["total"]
    assert frac == pytest.approx(5 * 7 / len(text3))


def test_multimodal_plumbing(spark):
    media = synth_media(spark, 30).cache()
    meta = attach_media_metadata(media)
    assert meta.filter(F.col("n_bytes") > 0).count() == 30
    feats = extract_media_features(media, dim=16).collect()
    assert len(feats) == 30
    by_kind = {}
    for r in feats:
        assert len(r["feature"]) == 16
        by_kind.setdefault(r["kind"], []).append(r)
    # image/audio rows are REALLY decoded: image mean-RGB descriptors sit
    # in [0,1]; audio rows carry rms/peak/zcr in [0,1] with peak ~0.5
    for r in by_kind["image"]:
        assert all(0.0 <= x <= 1.0 for x in r["feature"][:6])
        assert r["n_frames"] == 1
    for r in by_kind["audio"]:
        rms, peak = r["feature"][0], r["feature"][1]
        assert 0.2 < rms < 0.5 and 0.45 < peak <= 0.51
    # video payloads have no stdlib codec -> fake path (unit-norm vector)
    for r in by_kind["video"]:
        assert abs(sum(x * x for x in r["feature"]) - 1.0) < 1e-3
    # deterministic across runs
    feats2 = extract_media_features(media, dim=16).collect()
    assert sorted(map(str, feats)) == sorted(map(str, feats2))
    # video frame sampling plan
    frames = sample_frames(media, every_ms=5000)
    vids = media.filter(F.col("kind") == "video").count()
    assert frames.select("media_id").distinct().count() == vids


def test_media_codec_needed_raises_only_for_undecodable(spark):
    media = synth_media(spark, 6).cache()
    # image+audio decode natively even with the fake disabled
    ok = extract_media_features(
        media.filter(F.col("kind") != "video"),
        deterministic_fake=False).collect()
    assert len(ok) == 4
    # a compressed-codec payload (video) without the fake raises
    with pytest.raises(Exception):
        extract_media_features(media.filter(F.col("kind") == "video"),
                               deterministic_fake=False).collect()


def test_image_decoders_roundtrip_exact():
    """BMP encode→decode is pixel-exact (incl. stride padding); PPM and
    PGM parse with comments; truncated/unknown payloads raise."""
    import numpy as np

    from neo4j_document_pipeline_spark.operators.multimodal import (
        decode_image_bytes, encode_bmp)
    rng = np.random.RandomState(7)
    for w, h in [(16, 12), (3, 5), (1, 1), (7, 2)]:  # odd widths: stride pad
        px = rng.randint(0, 256, size=(h, w, 3)).astype(np.uint8)
        assert np.array_equal(decode_image_bytes(encode_bmp(px)), px)
    ppm = b"P6\n# a comment\n2 2\n255\n" + bytes(range(12))
    got = decode_image_bytes(ppm)
    assert got.shape == (2, 2, 3) and got[0, 0, 0] == 0 and got[1, 1, 2] == 11
    pgm = b"P5\n2 1\n255\n" + bytes([7, 250])
    gray = decode_image_bytes(pgm)
    assert gray.shape == (1, 2, 3) and list(gray[0, 1]) == [250, 250, 250]
    # maxval != 255 rescales: raw 15 at maxval 15 IS white
    lowmax = decode_image_bytes(b"P5\n2 1\n15\n" + bytes([15, 3]))
    assert list(lowmax[0, 0]) == [255, 255, 255]
    assert list(lowmax[0, 1]) == [51, 51, 51]  # round(3 * 255/15)
    for bad in (b"JPEG", b"BM\x00", b"P6\n2 2\n255\n" + b"\x00"):
        with pytest.raises(ValueError):
            decode_image_bytes(bad)


def test_audio_decoder_roundtrip():
    import numpy as np

    from neo4j_document_pipeline_spark.operators.multimodal import (
        decode_audio_bytes, encode_wav)
    t = np.arange(8000) / 8000.0
    x = 0.25 * np.sin(2 * np.pi * 440 * t)
    got, rate = decode_audio_bytes(encode_wav(x, rate=8000))
    assert rate == 8000 and got.size == 8000
    assert abs(np.sqrt(np.mean(got ** 2)) - 0.25 / np.sqrt(2)) < 1e-3
    with pytest.raises(ValueError):
        decode_audio_bytes(b"\x00" * 64)


# --- IVF ANN (the cell-probing scale path) ---

def test_ivf_full_probe_equals_brute_force(spark):
    from neo4j_document_pipeline_spark.operators.similarity import (
        brute_force_topk, ivf_topk, ivf_train)
    e = spark.read.parquet(f"{SF}/embeddings.parquet")
    q = [0.1, -0.2] * 32
    cents = ivf_train(e, "vec_id", "embedding", n_cells=4, iters=2)
    exact = brute_force_topk(e, "vec_id", "embedding", q, 10).collect()
    full = ivf_topk(e, "vec_id", "embedding", cents, q, 10, nprobe=4).collect()
    assert [r["vec_id"] for r in full] == [r["vec_id"] for r in exact]


def test_ivf_train_deterministic_and_partitions_all_rows(spark):
    from neo4j_document_pipeline_spark.operators.similarity import (
        ivf_assign, ivf_train)
    e = spark.read.parquet(f"{SF}/embeddings.parquet")
    c1 = ivf_train(e, "vec_id", "embedding", n_cells=4, iters=2)
    c2 = ivf_train(e, "vec_id", "embedding", n_cells=4, iters=2)
    assert c1 == c2
    cells = ivf_assign(e, "embedding", c1)
    assert cells.count() == e.count()
    dist = {r["cell"]: r["count"] for r in cells.groupBy("cell").count().collect()}
    assert set(dist) <= set(range(4)) and sum(dist.values()) == e.count()


def test_ivf_probe_recall_grows_with_nprobe(spark):
    from neo4j_document_pipeline_spark.operators.similarity import (
        brute_force_topk, ivf_topk, ivf_train)
    e = spark.read.parquet(f"{SF}/embeddings.parquet")
    q = [0.3] * 64
    cents = ivf_train(e, "vec_id", "embedding", n_cells=4, iters=2)
    exact = {r["vec_id"] for r in brute_force_topk(e, "vec_id", "embedding", q, 10).collect()}
    recalls = []
    for npb in (1, 2, 4):
        got = {r["vec_id"] for r in
               ivf_topk(e, "vec_id", "embedding", cents, q, 10, nprobe=npb).collect()}
        recalls.append(len(got & exact) / 10)
    assert recalls[-1] == 1.0          # full probe is exact
    assert recalls == sorted(recalls)  # more cells never lose recall


def test_ivf_assignment_is_expression_only(spark):
    """Scale check: cell assignment must be JVM expressions, never a
    Python UDF stage."""
    import io
    from contextlib import redirect_stdout
    from neo4j_document_pipeline_spark.operators.similarity import ivf_assign
    e = spark.read.parquet(f"{SF}/embeddings.parquet")
    cents = [[0.1] * 64, [-0.1] * 64]
    buf = io.StringIO()
    with redirect_stdout(buf):
        ivf_assign(e, "embedding", cents).explain("formatted")
    p = buf.getvalue()
    assert "BatchEvalPython" not in p and "ArrowEvalPython" not in p


def test_normalize_url_cases(spark):
    from neo4j_document_pipeline_spark.functions.textstats import (
        col_normalize_url)
    cases = [
        ("HTTPS://Example.COM:443/Path/?utm_source=x&q=1#frag",
         "https://example.com/Path/?q=1"),
        ("http://A.com:80/", "http://a.com"),
        ("https://a.com:4433/p", "https://a.com:4433/p"),  # non-default port kept
        ("https://a.com/p?utm_a=1&utm_b=2&q=3", "https://a.com/p?q=3"),
        ("https://a.com/p?q=1&utm_x=2&r=4", "https://a.com/p?q=1&r=4"),
        ("https://a.com/p?q=1&utm_x=2", "https://a.com/p?q=1"),
        ("https://a.com/p/", "https://a.com/p"),
        ("https://a.com/?gclid=1", "https://a.com"),
        ("ftp://X.org/A/", "ftp://x.org/A"),  # path case preserved
        ("not a url", "not a url"),
        ("", ""),
        # '&' is a legal PATH char (RFC 3986 sub-delims): path content
        # must survive query cleanup untouched
        ("https://a.com/a&&b/c", "https://a.com/a&&b/c"),
        ("https://a.com/x&utm_a=1/y?utm_b=2", "https://a.com/x&utm_a=1/y"),
        ("https://a.com/p&", "https://a.com/p&"),
    ]
    df = spark.createDataFrame(cases, "u string, want string")
    bad = df.select("u", col_normalize_url(F.col("u")).alias("got"), "want") \
            .filter(F.col("got") != F.col("want")).collect()
    assert not bad, bad


def test_ivf_pandas_assign_matches_expression(spark):
    """The broadcast-matmul assignment (large-dim path) must agree with
    the literal-expression argmax on the same centroids."""
    from neo4j_document_pipeline_spark.operators.similarity import (
        _assign_cells_pandas, _cell_col, ivf_train)
    e = spark.read.parquet(f"{SF}/embeddings.parquet")
    cents = ivf_train(e, "vec_id", "embedding", n_cells=4, iters=2)
    expr = {r["vec_id"]: r["cell"] for r in
            e.withColumn("cell", _cell_col("embedding", cents))
            .select("vec_id", "cell").collect()}
    pnd = {r["vec_id"]: r["cell"] for r in
           _assign_cells_pandas(e, "embedding", cents, "cell")
           .select("vec_id", "cell").collect()}
    assert pnd == expr


def test_ivf_assign_null_vector_parity(spark):
    """A NULL embedding must yield a null cell on BOTH assignment paths —
    the pandas path used to crash the task on np.stack, while the
    expression path nulled the cell, making behavior depend on
    dimensionality for identical data."""
    from neo4j_document_pipeline_spark.operators.similarity import (
        _assign_cells_pandas, _cell_col, ivf_train)
    e = spark.createDataFrame(
        [(0, [1.0, 0.0]), (1, [0.0, 1.0]), (2, None), (3, [0.9, 0.1])],
        "vec_id long, embedding array<double>")
    cents = ivf_train(e.filter("embedding IS NOT NULL"),
                      "vec_id", "embedding", n_cells=2, iters=2)
    expr = {r["vec_id"]: r["cell"] for r in
            e.withColumn("cell", _cell_col("embedding", cents))
            .select("vec_id", "cell").collect()}
    pnd = {r["vec_id"]: r["cell"] for r in
           _assign_cells_pandas(e, "embedding", cents, "cell")
           .select("vec_id", "cell").collect()}
    assert pnd == expr and expr[2] is None
    # training on a frame CONTAINING the null row must not crash either
    cents2 = ivf_train(e, "vec_id", "embedding", n_cells=2, iters=2)
    assert len(cents2) == 2


def test_ivf_at_reference_dimensionality(spark):
    """dim=3072 x n_cells=64 — the config that melted the literal
    expression tree in round 1. Trains + assigns via the broadcast numpy
    path in sane time; full-probe top-k equals brute force."""
    import time

    from neo4j_document_pipeline_spark.operators.similarity import (
        _EXPR_ASSIGN_LIMIT, brute_force_topk, ivf_assign, ivf_topk,
        ivf_train)
    dim, n, k = 3072, 400, 64
    assert k * dim > _EXPR_ASSIGN_LIMIT  # must exercise the pandas path
    rng = np.random.RandomState(7)
    rows = [(i, rng.normal(size=dim).astype("float32").tolist())
            for i in range(n)]
    e = spark.createDataFrame(rows, "vec_id long, embedding array<float>") \
        .repartition(8).cache()
    e.count()
    t0 = time.perf_counter()
    # train_sample=0 forces the fully-distributed stats path — the one
    # that melted in round 1 and must keep working at these dims; the
    # default sampled-driver path is covered by the parity check below
    cents = ivf_train(e, "vec_id", "embedding", n_cells=k, iters=2,
                      train_sample=0)
    sampled = ivf_train(e, "vec_id", "embedding", n_cells=k, iters=2)
    assert len(sampled) == k and len(sampled[0]) == dim
    # sample >= table size -> sampled training sees every row, so the
    # centroids match the distributed result up to float reduction order
    assert all(abs(a - b) < 1e-6
               for ca, cb in zip(cents, sampled) for a, b in zip(ca, cb))
    assigned = ivf_assign(e, "embedding", cents)
    counts = assigned.groupBy().agg(
        F.count("*").alias("n"),
        F.countDistinct("cell").alias("k_used")).first()
    elapsed = time.perf_counter() - t0
    assert len(cents) == k and len(cents[0]) == dim
    assert counts["n"] == n and counts["k_used"] > 1
    assert elapsed < 120, f"IVF at 3072x64 took {elapsed:.0f}s"
    q = rows[0][1]
    full = ivf_topk(e, "vec_id", "embedding", cents, q, 5, nprobe=k,
                    cell_col=None).collect()
    brute = brute_force_topk(e, "vec_id", "embedding", q, 5).collect()
    assert [r["vec_id"] for r in full] == [r["vec_id"] for r in brute]


def test_bmp_roundtrip_property():
    """Pixel-exact BMP encode→decode for arbitrary small geometries
    (exercises every stride-padding remainder and degenerate 1-pixel
    rows/columns)."""
    import numpy as np
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from neo4j_document_pipeline_spark.operators.multimodal import (
        decode_image_bytes, encode_bmp)

    @settings(max_examples=40, deadline=None)
    @given(st.integers(1, 13), st.integers(1, 9), st.integers(0, 2**31 - 1))
    def check(w, h, seed):
        px = np.random.RandomState(seed).randint(
            0, 256, size=(h, w, 3)).astype(np.uint8)
        assert np.array_equal(decode_image_bytes(encode_bmp(px)), px)

    check()


def test_wav_roundtrip_property():
    """WAV decode recovers sample count, rate, and amplitude within
    16-bit quantization for arbitrary short signals."""
    import numpy as np
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from neo4j_document_pipeline_spark.operators.multimodal import (
        decode_audio_bytes, encode_wav)

    @settings(max_examples=30, deadline=None)
    @given(st.integers(1, 400), st.sampled_from([4000, 8000, 16000]),
           st.integers(0, 2**31 - 1))
    def check(n, rate, seed):
        x = np.random.RandomState(seed).uniform(-1, 1, size=n)
        got, r = decode_audio_bytes(encode_wav(x, rate=rate))
        assert r == rate and got.size == n
        # encode rounds at scale 32767, decode divides by 32768: worst
        # error = half an LSB + the 1/32768 scale asymmetry at |x|=1
        assert np.max(np.abs(got - np.clip(x, -1, 1))) <= 2.0 / 32768

    check()


# --- Product quantization (the memory-scale ANN path) ---

def test_pq_roundtrip_and_search(spark):
    """PQ codes are m small ints (vs 4*dim bytes); ADC+rerank recovers
    the exact brute-force top-k on clustered vectors; degenerate inputs
    (null vec) carry a null code."""
    from neo4j_document_pipeline_spark.operators.similarity import (
        brute_force_topk, pq_encode, pq_topk, pq_train)
    rng = np.random.RandomState(3)
    dim, m = 32, 4
    centers = rng.normal(size=(8, dim))
    rows = []
    for i in range(240):
        v = centers[i % 8] + rng.normal(scale=0.05, size=dim)
        rows.append((i, v.tolist()))
    rows.append((999, None))
    e = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    books = pq_train(e, "embedding", m=m, k=16, sample=200, seed=7)
    assert books.shape == (m, 16, dim // m)
    # deterministic training
    books2 = pq_train(e, "embedding", m=m, k=16, sample=200, seed=7)
    assert np.allclose(books, books2)
    enc = pq_encode(e, "embedding", books).cache()
    got = {r["vec_id"]: r["pq_code"] for r in enc.collect()}
    assert got[999] is None
    assert all(len(c) == m for i, c in got.items() if c is not None)
    # two-stage search (ADC candidates + exact rerank) == brute force
    q = rows[5][1]
    exact = [r["vec_id"] for r in
             brute_force_topk(e, "vec_id", "embedding", q, 5).collect()]
    reranked = [r["vec_id"] for r in
                pq_topk(enc, "vec_id", "pq_code", books, q, 5,
                        candidates=60, vec_col="embedding").collect()]
    assert reranked == exact and reranked[0] == 5
    # ADC-only search still puts the query's own cluster on top
    adc_only = [r["vec_id"] for r in
                pq_topk(enc, "vec_id", "pq_code", books, q, 5).collect()]
    assert adc_only and adc_only[0] % 8 == 5 % 8
    # dim not divisible by m raises loudly
    with pytest.raises(ValueError):
        pq_train(e, "embedding", m=5)


def test_ivfpq_full_probe_equals_brute_force(spark):
    """IVF cells + PQ codes composed: at full probe with exact rerank the
    result equals brute force; at nprobe=1 the scan is cell-pruned."""
    from neo4j_document_pipeline_spark.operators.similarity import (
        brute_force_topk, ivf_assign, ivf_train, ivfpq_topk, pq_encode,
        pq_train)
    rng = np.random.RandomState(11)
    dim = 32
    centers = rng.normal(size=(6, dim))
    rows = [(i, (centers[i % 6] + rng.normal(scale=0.05, size=dim)).tolist())
            for i in range(180)]
    e = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    cents = ivf_train(e, "vec_id", "embedding", n_cells=6, iters=3)
    books = pq_train(e, "embedding", m=4, k=16, seed=5)
    enc = pq_encode(ivf_assign(e, "embedding", cents), "embedding",
                    books).cache()
    q = rows[7][1]
    exact = [r["vec_id"] for r in
             brute_force_topk(e, "vec_id", "embedding", q, 5).collect()]
    full = [r["vec_id"] for r in
            ivfpq_topk(enc, "vec_id", "pq_code", cents, books, q, 5,
                       nprobe=6, candidates=180,
                       vec_col="embedding").collect()]
    assert full == exact
    # pruned probe still finds the query's own vector first
    pruned = [r["vec_id"] for r in
              ivfpq_topk(enc, "vec_id", "pq_code", cents, books, q, 5,
                         nprobe=1, vec_col="embedding").collect()]
    assert pruned and pruned[0] == 7


def test_corrupt_media_distinct_from_codec_gap(spark):
    """A recognized-but-truncated payload is CORRUPT data: strict mode
    (deterministic_fake=False) must report corruption — never the
    missing-codec message — while fake mode degrades to the hashed
    feature like any undecodable payload."""
    import numpy as np

    from neo4j_document_pipeline_spark.operators.multimodal import (
        CorruptMediaError, decode_image_bytes, encode_bmp)

    good = encode_bmp(np.zeros((4, 4, 3), dtype=np.uint8))
    truncated = good[: len(good) - 10]
    with pytest.raises(CorruptMediaError):
        decode_image_bytes(truncated)

    media = spark.createDataFrame(
        [("m1", "image", bytearray(truncated), "image/bmp", 4, 4, 0)],
        "media_id string, kind string, payload binary, mime string, "
        "width int, height int, duration_ms int")
    try:
        extract_media_features(media, deterministic_fake=False).collect()
        raise AssertionError("expected corruption error")
    except Exception as e:
        msg = str(e)
        assert "corrupt" in msg and "external codec" not in msg
    # fake mode: degrades deterministically instead of failing the job
    out = extract_media_features(media, deterministic_fake=True).collect()
    assert len(out) == 1 and len(out[0]["feature"]) == 32


def test_graphrag_many_refcounted_persist(spark, tmp_path):
    """Concurrent graphrag calls share the cached nodes handle via the
    refcounted persist. A non-sticky acquire still unpersists when the
    last in-flight holder releases; a STICKY acquire (serving residency)
    keeps the cache warm after release and is evicted when a commit
    supersedes the snapshot (store.read swap -> evict_persisted)."""
    from neo4j_document_pipeline_spark.operators import retrieval as R
    from neo4j_document_pipeline_spark.plans.pipeline import run_pipeline
    from neo4j_document_pipeline_spark.sources.pages import synth_pages
    from neo4j_document_pipeline_spark.sources.store import GraphStore

    root = str(tmp_path / "kg")
    run_pipeline(spark, synth_pages(spark, 40), root)
    store = GraphStore(root, spark)
    nodes = store.read("nodes")
    a = R._persist_acquire(nodes)
    b = R._persist_acquire(store.read("nodes"))
    assert a is b  # the store hands out one handle per snapshot
    R._persist_release(a)
    assert nodes.storageLevel.useMemory  # still cached: b holds a ref
    R._persist_release(b)
    assert not nodes.storageLevel.useMemory  # non-sticky: fully released
    # sticky residency: survives release, dies with the snapshot
    c = R._persist_acquire(store.read("nodes"), sticky=True)
    R._persist_release(c)
    assert c.storageLevel.useMemory  # warm between requests
    store.write("nodes", c.limit(1), stage="supersede")
    fresh = store.read("nodes")  # swap evicts the superseded handle
    assert fresh is not c
    assert not c.storageLevel.useMemory
    # end-to-end: a burst of concurrent queries all succeed
    res = R.graphrag_many(spark, store,
                          ["What did Al-Khwarizmi develop?"] * 4,
                          max_concurrent=4)
    assert all(not isinstance(r, Exception) for r in res)


def test_ngram_jaccard_exact_superset_of_lsh(spark):
    """The exhaustive shared-shingle path must find every pair the banded
    LSH path finds at its design threshold (exact candidates are a
    superset), agree on the jaccard values, and never plan a cartesian
    product."""
    import io
    from contextlib import redirect_stdout

    from neo4j_document_pipeline_spark.operators.dedup import (
        minhash_near_duplicates, ngram_jaccard_exact)

    base = ("the quick brown fox jumps over the lazy dog and runs far "
            "away into the deep dark forest tonight")
    rows = [("a", base), ("b", base + " again"), ("c", base),
            ("d", "completely different text about spark physical plans"),
            ("e", "")]
    df = spark.createDataFrame(rows, "doc_id string, text string")
    exact = {(r["id1"], r["id2"]): round(r["jaccard"], 6)
             for r in ngram_jaccard_exact(df, "doc_id", "text",
                                          threshold=0.8).collect()}
    lsh = {(r["id1"], r["id2"]): round(r["jaccard"], 6)
           for r in minhash_near_duplicates(df, "doc_id", "text",
                                            jaccard_threshold=0.8).collect()}
    assert set(lsh) <= set(exact)
    for k in lsh:
        assert lsh[k] == exact[k]
    assert ("a", "c") in exact and exact[("a", "c")] == 1.0
    assert not any("d" in k or "e" in k for k in exact)
    buf = io.StringIO()
    with redirect_stdout(buf):
        ngram_jaccard_exact(df, "doc_id", "text").explain("formatted")
    p = buf.getvalue()
    assert "CartesianProduct" not in p and "BroadcastNestedLoopJoin" not in p


# ---------------------------------------------------------------------------
# benchmark decontamination
# ---------------------------------------------------------------------------

def test_ngram_overlap_flags_known_values(spark):
    from neo4j_document_pipeline_spark.operators.dedup import (
        ngram_overlap_flags)
    bench = spark.createDataFrame(
        [(100, "the quick brown fox jumps over the lazy dog")],
        "id long, text string")
    docs = spark.createDataFrame(
        [
            # contains "quick brown fox jumps" -> 1 hit of 6 distinct grams
            (1, "a very quick brown fox jumps high today yes"),
            # no 4-gram overlap
            (2, "completely different words in every position here"),
            # shorter than n tokens -> zero grams, never flagged
            (3, "too short"),
            # verbatim copy: all grams hit
            (4, "the quick brown fox jumps over the lazy dog"),
        ],
        "id long, text string")
    out = {r["id"]: r for r in
           ngram_overlap_flags(docs, bench, "id", "text", n=4).collect()}
    assert out[1]["n_grams"] == 6 and out[1]["n_hit"] == 1
    assert out[1]["flagged"] is True
    assert abs(out[1]["overlap_frac"] - 1 / 6) < 1e-9
    assert out[2]["n_hit"] == 0 and out[2]["flagged"] is False
    assert out[3]["n_grams"] == 0 and out[3]["flagged"] is False
    assert abs(out[3]["overlap_frac"]) < 1e-9
    # "the quick brown fox ... the lazy dog": 9 tokens -> 6 positions, all
    # distinct -> 6 grams, all hits
    assert out[4]["n_grams"] == 6 and out[4]["n_hit"] == 6
    assert abs(out[4]["overlap_frac"] - 1.0) < 1e-9


def test_ngram_overlap_threshold_gates_flag(spark):
    from neo4j_document_pipeline_spark.operators.dedup import (
        ngram_overlap_flags)
    bench = spark.createDataFrame(
        [(1, "alpha beta gamma delta")], "id long, text string")
    docs = spark.createDataFrame(
        [(1, "alpha beta gamma delta epsilon zeta eta theta")],
        "id long, text string")
    # 5 positions, 1 hit -> frac 0.2: flagged at 0.0, not at 0.5
    lo = ngram_overlap_flags(docs, bench, "id", "text", n=4).collect()[0]
    hi = ngram_overlap_flags(
        docs, bench, "id", "text", n=4, threshold=0.5).collect()[0]
    assert lo["flagged"] is True and hi["flagged"] is False


def test_ngram_overlap_repeated_grams_counted_once(spark):
    from neo4j_document_pipeline_spark.operators.dedup import (
        ngram_overlap_flags)
    bench = spark.createDataFrame([(1, "a b c d")], "id long, text string")
    # "a b c d a b c d a b c d": gram "a b c d" occurs repeatedly but is
    # ONE distinct gram; distinct grams here: 4 ("a b c d","b c d a",
    # "c d a b","d a b c"), 1 hit
    docs = spark.createDataFrame(
        [(1, "a b c d a b c d a b c d")], "id long, text string")
    r = ngram_overlap_flags(docs, bench, "id", "text", n=4).collect()[0]
    assert r["n_grams"] == 4 and r["n_hit"] == 1


def test_ngram_overlap_bloom_path_is_lossless(spark):
    import random

    from neo4j_document_pipeline_spark.operators.dedup import (
        ngram_overlap_flags, ngram_overlap_flags_bloom)
    rng = random.Random(23)
    vocab = ["alpha", "beta", "gamma", "delta", "eps", "zeta", "eta"]

    def txt(lo, hi):
        return " ".join(rng.choice(vocab)
                        for _ in range(rng.randint(lo, hi)))

    bench = spark.createDataFrame(
        [(i, txt(4, 10)) for i in range(8)], "id long, text string")
    docs = spark.createDataFrame(
        [(i, txt(0, 14)) for i in range(40)], "id long, text string")

    def key(rows):
        return sorted((r["id"], r["n_grams"], r["n_hit"],
                       round(r["overlap_frac"], 12), r["flagged"])
                      for r in rows)

    exact = key(ngram_overlap_flags(
        docs, bench, "id", "text", n=4).collect())
    # sized filter AND a pathologically tiny one (false positives on
    # nearly every probe): the exact verify join must erase them all
    for m_bits in (1 << 16, 64):
        got = key(ngram_overlap_flags_bloom(
            docs, bench, "id", "text", n=4, bloom_bits=m_bits,
            bloom_hashes=3).collect())
        assert got == exact, m_bits


def test_ngram_overlap_bloom_validation(spark):
    import pytest as _pytest

    from neo4j_document_pipeline_spark.operators.dedup import (
        ngram_overlap_flags_bloom)
    df = spark.createDataFrame([(1, "a b c")], "id long, text string")
    with _pytest.raises(ValueError, match="bloom_bits"):
        ngram_overlap_flags_bloom(df, df, "id", "text", bloom_bits=1)
    with _pytest.raises(ValueError, match="bloom_hashes"):
        ngram_overlap_flags_bloom(df, df, "id", "text", bloom_hashes=0)
    with _pytest.raises(ValueError, match="n must be"):
        ngram_overlap_flags_bloom(df, df, "id", "text", n=0)


# ---------------------------------------------------------------------------
# CCNet-style cross-document line dedup
# ---------------------------------------------------------------------------

def test_dedup_lines_across_docs(spark):
    from neo4j_document_pipeline_spark.operators.dedup import (
        dedup_lines_across_docs)
    footer = "copyright acme corp all rights reserved"
    docs = spark.createDataFrame(
        [
            (1, f"unique first line\n{footer}\nbody of doc one"),
            (2, f"doc two opening\n\n{footer}"),
            (3, f"{footer}"),  # all-boilerplate doc
            (4, "standalone document with no shared lines"),
        ],
        "id long, text string")
    out = {r["id"]: r for r in
           dedup_lines_across_docs(docs, "id", "text").collect()}
    assert out[1]["text_clean"] == "unique first line\nbody of doc one"
    assert out[1]["n_lines"] == 3 and out[1]["n_removed"] == 1
    # empty line kept (formatting, not boilerplate)
    assert out[2]["text_clean"] == "doc two opening\n"
    assert out[2]["n_removed"] == 1
    assert out[3]["text_clean"] == "" and out[3]["n_removed"] == 1
    assert out[4]["text_clean"] == out[4]["text_clean"].strip()
    assert out[4]["n_removed"] == 0


def test_dedup_lines_trim_matching_and_min_doc_freq(spark):
    from neo4j_document_pipeline_spark.operators.dedup import (
        dedup_lines_across_docs)
    docs = spark.createDataFrame(
        [
            (1, "  shared line  \nkeep a"),
            (2, "shared line\nkeep b"),
            (3, "shared line\nkeep c"),
        ],
        "id long, text string")
    # trimmed forms match across whitespace variants
    out = {r["id"]: r for r in
           dedup_lines_across_docs(docs, "id", "text").collect()}
    assert all(out[i]["n_removed"] == 1 for i in (1, 2, 3))
    # raising the threshold above the duplication level keeps everything
    out3 = {r["id"]: r for r in dedup_lines_across_docs(
        docs, "id", "text", min_doc_freq=4).collect()}
    assert all(out3[i]["n_removed"] == 0 for i in (1, 2, 3))


def test_dedup_lines_within_doc_repeat_not_cross_doc(spark):
    from neo4j_document_pipeline_spark.operators.dedup import (
        dedup_lines_across_docs)
    # a line repeated WITHIN one doc only is not cross-document
    # boilerplate: countDistinct(doc) == 1 < min_doc_freq
    docs = spark.createDataFrame(
        [(1, "echo\necho\necho"), (2, "other text")], "id long, text string")
    out = {r["id"]: r for r in
           dedup_lines_across_docs(docs, "id", "text").collect()}
    assert out[1]["n_removed"] == 0 and out[1]["text_clean"] == "echo\necho\necho"


# ---------------------------------------------------------------------------
# corpus-level text analytics (operators/corpus.py)
# ---------------------------------------------------------------------------

def test_tfidf_top_terms_known_values(spark):
    import math

    from neo4j_document_pipeline_spark.operators.corpus import (
        corpus_tfidf_top_terms)
    docs = spark.createDataFrame(
        [
            (1, "apple apple banana common"),
            (2, "banana cherry common"),
            (3, "cherry cherry cherry common"),
            (4, ""),  # empty: contributes to N, yields no rows
        ],
        "id long, text string")
    out = corpus_tfidf_top_terms(docs, "id", "text", k=2).collect()
    by_doc = {}
    for r in out:
        by_doc.setdefault(r["id"], []).append(r)
    assert 4 not in by_doc
    # doc 1: apple tf=2 df=1 -> 2*ln(4); banana tf=1 df=2 -> ln(2);
    # common tf=1 df=3 -> ln(4/3): top2 = apple, banana
    d1 = sorted(by_doc[1], key=lambda r: r["rank"])
    assert [r["term"] for r in d1] == ["apple", "banana"]
    assert abs(d1[0]["score"] - 2 * math.log(4)) < 1e-9
    assert d1[0]["tf"] == 2 and d1[0]["dfreq"] == 1
    # doc 3: cherry tf=3 df=2 -> 3*ln(2) tops common
    d3 = sorted(by_doc[3], key=lambda r: r["rank"])
    assert d3[0]["term"] == "cherry"
    assert abs(d3[0]["score"] - 3 * math.log(2)) < 1e-9


def test_tfidf_top_terms_tie_breaks_by_term(spark):
    from neo4j_document_pipeline_spark.operators.corpus import (
        corpus_tfidf_top_terms)
    # both terms: tf=1, df=1 -> identical scores; rank must order by
    # term ascending deterministically
    docs = spark.createDataFrame(
        [(1, "zebra alpha"), (2, "filler")], "id long, text string")
    d1 = sorted((r for r in
                 corpus_tfidf_top_terms(docs, "id", "text", k=2).collect()
                 if r["id"] == 1), key=lambda r: r["rank"])
    assert [r["term"] for r in d1] == ["alpha", "zebra"]


def test_tfidf_brute_parity(spark):
    import math

    import numpy as np

    from neo4j_document_pipeline_spark.operators.corpus import (
        corpus_tfidf_top_terms)
    rng = np.random.RandomState(11)
    vocab = [f"w{i}" for i in range(12)]
    rows = [(i, " ".join(vocab[rng.randint(12)] for _ in range(30)))
            for i in range(20)]
    out = corpus_tfidf_top_terms(
        spark.createDataFrame(rows, "id long, text string"),
        "id", "text", k=3).collect()
    # brute
    tfs, dfs = {}, {}
    for i, text in rows:
        seen = {}
        for w in text.split():
            seen[w] = seen.get(w, 0) + 1
        tfs[i] = seen
        for w in seen:
            dfs[w] = dfs.get(w, 0) + 1
    n = len(rows)
    for i, _ in rows:
        scored = sorted(
            ((-tf * math.log(n / dfs[w]), w) for w, tf in tfs[i].items()))
        expect = [w for _, w in scored[:3]]
        got = [r["term"] for r in sorted(
            (r for r in out if r["id"] == i), key=lambda r: r["rank"])]
        assert got == expect, i


def test_unigram_logprob_known_values(spark):
    import math

    from neo4j_document_pipeline_spark.operators.corpus import (
        unigram_logprob_scores)
    # corpus: a x3, b x1 -> p(a)=3/4, p(b)=1/4
    docs = spark.createDataFrame(
        [(1, "a a b"), (2, "a"), (3, "")], "id long, text string")
    out = {r["id"]: r for r in
           unigram_logprob_scores(docs, "id", "text").collect()}
    pa, pb = math.log(3 / 4), math.log(1 / 4)
    assert out[1]["n_tok"] == 3
    assert abs(out[1]["avg_logprob"] - (2 * pa + pb) / 3) < 1e-9
    assert abs(out[2]["avg_logprob"] - pa) < 1e-9
    assert out[3]["n_tok"] == 0 and out[3]["avg_logprob"] is None


def test_unigram_logprob_surfaces_gibberish(spark):
    from neo4j_document_pipeline_spark.operators.corpus import (
        unigram_logprob_scores)
    typical = "the data table joins the other data table by key"
    rows = [(i, typical) for i in range(10)] + [
        (99, "zxqv jkwp qqyz vvbn mmxr")]
    out = {r["id"]: r["avg_logprob"] for r in unigram_logprob_scores(
        spark.createDataFrame(rows, "id long, text string"),
        "id", "text").collect()}
    # the rare-token doc scores strictly below every typical doc
    assert all(out[99] < out[i] for i in range(10))


def test_bm25_brute_parity(spark):
    import math
    import random
    from collections import Counter

    from neo4j_document_pipeline_spark.operators.corpus import bm25_scores
    rng = random.Random(41)
    vocab = ["spark", "join", "order", "table", "scan", "row", "key"]
    rows = [(i, " ".join(rng.choice(vocab)
                         for _ in range(rng.randint(1, 20))))
            for i in range(40)]
    df = spark.createDataFrame(rows, "id long, text string")
    query, k1, b = "spark JOIN order", 1.2, 0.75
    got = {r["id"]: (r["n_hit"], r["score"]) for r in
           bm25_scores(df, "id", "text", query, k1=k1, b=b).collect()}
    terms = sorted({"spark", "join", "order"})
    n = len(rows)
    avgdl = sum(len(t.split()) for _, t in rows) / n
    dfreq = {t: sum(1 for _, txt in rows if t in txt.split())
             for t in terms}
    for i, txt in rows:
        cnt, dl = Counter(txt.split()), len(txt.split())
        want = 0.0
        hits = 0
        for t in terms:
            if cnt[t]:
                hits += 1
                idf = math.log(1 + (n - dfreq[t] + 0.5) / (dfreq[t] + 0.5))
                want += idf * cnt[t] * (k1 + 1) / (
                    cnt[t] + k1 * (1 - b + b * dl / avgdl))
        if hits:
            assert got[i][0] == hits
            assert abs(got[i][1] - want) < 1e-9, i
        else:
            assert i not in got


def test_bm25_semantics_and_validation(spark):
    import pytest as _pytest

    from neo4j_document_pipeline_spark.operators.corpus import bm25_scores
    df = spark.createDataFrame(
        [(1, "spark joins the table"),
         (2, "spark " + "filler " * 40),
         (3, "nothing relevant here")], "id long, text string")
    out = {r["id"]: r["score"] for r in
           bm25_scores(df, "id", "text", "spark").collect()}
    # same tf=1: the SHORTER document outranks (length normalization)
    assert out[1] > out[2] > 0
    assert 3 not in out  # no matching term -> no row
    with _pytest.raises(ValueError, match="no tokens"):
        bm25_scores(df, "id", "text", "!!!")
    with _pytest.raises(ValueError, match="k1"):
        bm25_scores(df, "id", "text", "spark", k1=-1)


def test_cli_docsearch(spark, tmp_path, capsys):
    """BM25 retrieval over a committed store: a query made of one
    document's distinctive tokens ranks that document first; loud
    validation on an empty query."""
    import datetime as dt
    import json

    import pytest as _pytest

    from neo4j_document_pipeline_spark.__main__ import main
    from neo4j_document_pipeline_spark.plans.pipeline import run_pipeline
    from neo4j_document_pipeline_spark.sources.pages import synth_pages
    root = str(tmp_path / "kg")
    planted = spark.createDataFrame(
        [("p://target", "the quokka wallaby marsupial survey results",
          dt.datetime(2025, 1, 1))],
        "url string, text string, warc_ts timestamp")
    pages = synth_pages(spark, 10).select(
        "url", "text", "warc_ts").unionByName(planted)
    run_pipeline(spark, pages, root)
    main(["docsearch", "quokka", "wallaby", "--store", root,
          "--top-k", "3"])
    rows = [json.loads(line) for line in
            capsys.readouterr().out.strip().splitlines()]
    assert rows and rows[0]["url"] == "p://target"
    assert rows[0]["n_hit"] == 2 and rows[0]["score"] > 0
    with _pytest.raises(SystemExit, match="query"):
        main(["docsearch", "--store", root])


def test_ngram_diversity_known_values_and_brute(spark):
    import random
    from collections import Counter

    from neo4j_document_pipeline_spark.operators.corpus import (
        ngram_diversity)
    # group a: "x x x x" -> 1-grams 4 total/1 distinct; 2-grams
    # 3 total/1 distinct. group b: "p q" + "q" -> 1-grams 3/2,
    # 2-grams 1/1. group c: "" -> no rows at all.
    docs = spark.createDataFrame(
        [("a", "x x x x"), ("b", "p q"), ("b", "q"), ("c", "")],
        "g string, text string")
    out = {(r["g"], r["n"]): (r["total_grams"], r["distinct_grams"],
                              r["diversity"])
           for r in ngram_diversity(docs, "g", "text",
                                    ns=(1, 2)).collect()}
    assert out[("a", 1)] == (4, 1, 0.25)
    assert out[("a", 2)] == (3, 1, 1 / 3)
    assert out[("b", 1)] == (3, 2, 2 / 3)
    assert out[("b", 2)] == (1, 1, 1.0)
    assert not any(g == "c" for g, _ in out)
    # brute parity on random text
    rng = random.Random(31)
    vocab = ["aa", "bb", "cc", "dd"]
    rows = [("g", " ".join(rng.choice(vocab)
                           for _ in range(rng.randint(0, 9))))
            for _ in range(25)]
    got = {r["n"]: (r["total_grams"], r["distinct_grams"]) for r in
           ngram_diversity(spark.createDataFrame(
               rows, "g string, text string"), "g", "text",
               ns=(1, 2, 3)).collect()}
    for n in (1, 2, 3):
        grams = Counter()
        for _, t in rows:
            ts = t.split()
            for i in range(len(ts) - n + 1):
                grams[" ".join(ts[i:i + n])] += 1
        if grams:
            assert got[n] == (sum(grams.values()), len(grams)), n
        else:
            assert n not in got
    import pytest as _pytest
    with _pytest.raises(ValueError, match="non-empty"):
        ngram_diversity(docs, "g", "text", ns=())
    with _pytest.raises(ValueError, match=">= 1"):
        ngram_diversity(docs, "g", "text", ns=(0,))


def test_ngram_diversity_flags_mode_collapse(spark):
    from neo4j_document_pipeline_spark.operators.corpus import (
        ngram_diversity)
    organic = [("org", f"doc {i} about topic {i * 7 % 13} with detail "
                       f"{i * 3 % 11}") for i in range(20)]
    collapsed = [("syn", "the model repeats the same phrasing again")
                 for _ in range(20)]
    out = {(r["g"], r["n"]): r["diversity"] for r in
           ngram_diversity(spark.createDataFrame(
               organic + collapsed, "g string, text string"),
               "g", "text", ns=(2,)).collect()}
    # the collapsed source's bigram diversity is an order below
    assert out[("syn", 2)] < out[("org", 2)] / 5


def test_bigram_logprob_known_values(spark):
    import math

    from neo4j_document_pipeline_spark.operators.corpus import (
        bigram_logprob_scores)
    # corpus bigrams: doc1 "a b a" -> (a,b),(b,a); doc2 "a b" -> (a,b)
    # c2: (a,b)=2, (b,a)=1; c1: a=2, b=1; V = 2
    docs = spark.createDataFrame(
        [(1, "a b a"), (2, "a b"), (3, "a"), (4, "")],
        "id long, text string")
    out = {r["id"]: r for r in
           bigram_logprob_scores(docs, "id", "text", add_k=0.5)
           .collect()}
    p_ab = math.log((2 + 0.5) / (2 + 0.5 * 2))
    p_ba = math.log((1 + 0.5) / (1 + 0.5 * 2))
    assert out[1]["n_big"] == 2
    assert abs(out[1]["avg_logprob"] - (p_ab + p_ba) / 2) < 1e-9
    assert out[2]["n_big"] == 1
    assert abs(out[2]["avg_logprob"] - p_ab) < 1e-9
    # fewer than two tokens: no bigrams, NULL score (no evidence)
    assert out[3]["n_big"] == 0 and out[3]["avg_logprob"] is None
    assert out[4]["n_big"] == 0 and out[4]["avg_logprob"] is None
    # k=0 is the raw MLE (valid when self-scoring: every pair seen)
    mle = {r["id"]: r for r in
           bigram_logprob_scores(docs, "id", "text", add_k=0.0)
           .collect()}
    assert abs(mle[2]["avg_logprob"] - math.log(2 / 2)) < 1e-9
    import pytest as _pytest
    with _pytest.raises(ValueError, match="add_k"):
        bigram_logprob_scores(docs, "id", "text", add_k=-1.0)


def test_bigram_logprob_brute_parity(spark):
    import math
    import random
    from collections import Counter

    from neo4j_document_pipeline_spark.operators.corpus import (
        bigram_logprob_scores)
    rng = random.Random(19)
    vocab = ["red", "green", "blue", "join", "scan", "sort"]
    rows = [(i, " ".join(rng.choice(vocab)
                         for _ in range(rng.randint(0, 12))))
            for i in range(30)]
    docs = spark.createDataFrame(rows, "id long, text string")
    k = 0.5
    toks = {i: t.split() for i, t in rows}
    c2 = Counter(p for ts in toks.values()
                 for p in zip(ts, ts[1:]))
    c1 = Counter(w for ts in toks.values() for w in ts[:-1])
    v = len({w for ts in toks.values() for w in ts})
    out = {r["id"]: r for r in
           bigram_logprob_scores(docs, "id", "text", add_k=k)
           .collect()}
    for i, ts in toks.items():
        pairs = list(zip(ts, ts[1:]))
        assert out[i]["n_big"] == len(pairs)
        if pairs:
            want = sum(math.log((c2[p] + k) / (c1[p[0]] + k * v))
                       for p in pairs) / len(pairs)
            assert abs(out[i]["avg_logprob"] - want) < 1e-9, i
        else:
            assert out[i]["avg_logprob"] is None


def test_bigram_logprob_sees_word_order(spark):
    from neo4j_document_pipeline_spark.operators.corpus import (
        bigram_logprob_scores, unigram_logprob_scores)
    typical = "the query joins the data table by the key"
    # identical unigram profile, scrambled order -> unigram-blind
    scrambled = "key the by joins data the query table the"
    rows = [(i, typical) for i in range(10)] + [(99, scrambled)]
    docs = spark.createDataFrame(rows, "id long, text string")
    uni = {r["id"]: r["avg_logprob"] for r in
           unigram_logprob_scores(docs, "id", "text").collect()}
    assert abs(uni[99] - uni[0]) < 1e-9  # unigram cannot tell
    big = {r["id"]: r["avg_logprob"] for r in
           bigram_logprob_scores(docs, "id", "text").collect()}
    assert all(big[99] < big[i] for i in range(10))


# ---------------------------------------------------------------------------
# PII scrubbing
# ---------------------------------------------------------------------------

def test_pii_redaction_known_values(spark):
    from neo4j_document_pipeline_spark.functions.textstats import (
        col_pii_count, col_redact_pii)
    docs = spark.createDataFrame(
        [
            (1, "mail a.b+c@sub.example.co.uk now"),
            (2, "server at 10.0.255.3 and 192.168.1.1, version 1.2"),
            (3, "call +60 12-345 6789 or 0123456789 today"),
            (4, "year 2024 and price 1234 stay untouched"),
            (5, "mixed: x@y.io from 8.8.8.8 tel +1 555-123-4567"),
        ],
        "id long, text string")
    out = {r["id"]: r for r in docs.select(
        "id", col_redact_pii(F.col("text")).alias("red"),
        col_pii_count(F.col("text"), "email").alias("ne"),
        col_pii_count(F.col("text"), "ipv4").alias("ni"),
        col_pii_count(F.col("text"), "phone").alias("np")).collect()}
    assert out[1]["red"] == "mail [EMAIL] now" and out[1]["ne"] == 1
    assert out[2]["red"] == "server at [IPV4] and [IPV4], version 1.2"
    assert out[2]["ni"] == 2
    assert out[3]["red"] == "call [PHONE] or [PHONE] today"
    assert out[3]["np"] == 2
    assert out[4]["red"] == "year 2024 and price 1234 stay untouched"
    assert out[5]["red"] == "mixed: [EMAIL] from [IPV4] tel [PHONE]"


def test_pii_redaction_unknown_kind_raises(spark):
    import pytest as _pytest

    from neo4j_document_pipeline_spark.functions.textstats import (
        col_redact_pii)
    with _pytest.raises(ValueError, match="unknown PII kind"):
        col_redact_pii(F.lit("x"), kinds=["ssn"])


# ---------------------------------------------------------------------------
# winnowing fingerprints (MOSS)
# ---------------------------------------------------------------------------

def _brute_winnow(text, k, window, salt="v1"):
    import hashlib
    import re as _re
    toks = [t for t in _re.sub(r"[^A-Za-z0-9']+", " ", text.lower()).split()
            if t]
    grams = [" ".join(toks[i:i + k]) for i in range(len(toks) - k + 1)]
    if not grams:
        return set()
    hs = [int(hashlib.sha256(f"{salt}:{g}".encode()).hexdigest()[:8], 16)
          for g in grams]
    n = len(hs)
    out = set()
    for p in range(max(n - window + 1, 1)):
        out.add(min(hs[p:p + window]))
    return out


def test_winnow_brute_parity_and_guarantee(spark):
    from neo4j_document_pipeline_spark.operators.corpus import (
        winnow_fingerprints)
    shared = "the quick brown fox jumps over the lazy dog again and again"
    docs = {
        1: "intro words here " + shared + " closing remark",
        2: shared + " completely different tail content follows now",
        3: "nothing in common with anybody else at all whatsoever",
        4: "tiny doc of five words",  # grams < window -> single min
        5: "xy",  # fewer tokens than k -> zero grams, zero prints
    }
    df = spark.createDataFrame(list(docs.items()), "id long, text string")
    got = {}
    for r in winnow_fingerprints(df, "id", "text", k=3,
                                 window=4).collect():
        got.setdefault(r["id"], set()).add(r["fp"])
    for i, text in docs.items():
        assert got.get(i, set()) == _brute_winnow(text, 3, 4), i
    # winnowing guarantee: the shared >= k+window-1 token substring
    # yields at least one shared fingerprint
    assert got[1] & got[2]
    assert not (got[3] & got[1])
    assert len(got[4]) == 1
    assert 5 not in got


def test_winnow_validation(spark):
    from neo4j_document_pipeline_spark.operators.corpus import (
        winnow_fingerprints)
    df = spark.createDataFrame([(1, "x")], "id long, text string")
    with pytest.raises(ValueError, match="k and window"):
        winnow_fingerprints(df, "id", "text", k=0)


def test_cli_hygiene_report(spark, tmp_path, capsys):
    """The corpus-quality report: totals/lang-mix/PII from the column
    functions, and --near-dups resolves a planted near-duplicate pair
    into one cluster with one removable doc."""
    import json

    from neo4j_document_pipeline_spark.__main__ import main
    from neo4j_document_pipeline_spark.plans.pipeline import run_pipeline
    root = str(tmp_path / "kg")
    base = " ".join(f"tok{i}" for i in range(60))
    near = base.replace("tok7", "changed")
    import datetime as dt

    from neo4j_document_pipeline_spark.sources.pages import synth_pages
    t = dt.datetime(2025, 1, 1)
    looping = ("click here " * 30
               + " ".join(f"word{i}" for i in range(20)))
    planted = spark.createDataFrame(
        [("p://a", base + " mail me at someone@example.org", t),
         ("p://b", near, t),
         ("p://c", looping, t)],  # top bigram claims >20% of chars
        "url string, text string, warc_ts timestamp")
    # the synth corpus supplies extractable triples (an all-planted
    # corpus would write a zero-row triples table); the planted pair
    # supplies the PII hit and the near-dup cluster
    pages = synth_pages(spark, 10).select(
        "url", "text", "warc_ts").unionByName(planted)
    run_pipeline(spark, pages, root)
    main(["hygiene", "--store", root, "--near-dups"])
    rep = json.loads(capsys.readouterr().out)
    assert rep["hygiene"]["n_docs"] >= 3
    assert rep["hygiene"]["pii_emails"] == 1
    # exactly the planted looping doc trips the Gopher top-2-gram rule
    assert rep["hygiene"]["docs_topgram_heavy"] == 1
    assert sum(rep["lang_mix"].values()) == rep["hygiene"]["n_docs"]
    dv = rep["bigram_diversity"]
    # the looping doc alone repeats "click here" 30x, so corpus bigram
    # diversity must sit strictly below 1; counts are exact integers
    assert dv["total_bigrams"] > dv["distinct_bigrams"] > 0
    assert 0 < dv["diversity"] < 1
    nd = rep["near_dups"]
    assert nd["clusters"] >= 1 and nd["docs_in_clusters"] >= 2
    assert nd["removable"] == nd["docs_in_clusters"] - nd["clusters"] >= 1


# ---------------------------------------------------------------------------
# semantic (embedding) decontamination
# ---------------------------------------------------------------------------

def test_embedding_decontam_broadcast_known_values(spark):
    import numpy as np

    from neo4j_document_pipeline_spark.operators.dedup import (
        embedding_decontam_flags)
    rng = np.random.RandomState(3)
    bench_vecs = [rng.normal(size=8).tolist() for _ in range(4)]
    bench = spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in enumerate(bench_vecs)],
        "bid long, bv array<float>")
    # corpus: an exact copy of bench[2], a scaled copy of bench[1]
    # (cosine 1.0), and noise
    corpus_rows = [
        ("copy", [float(x) for x in bench_vecs[2]]),
        ("scaled", [float(2.0 * x) for x in bench_vecs[1]]),
        ("noise", [float(x) for x in rng.normal(size=8)]),
    ]
    corpus = spark.createDataFrame(corpus_rows,
                                   "doc_id string, v array<float>")
    got = {r["doc_id"]: (r["bench_id"], r["cos"]) for r in
           embedding_decontam_flags(
               corpus, bench, "doc_id", "v", "bid", "bv",
               threshold=0.99).collect()}
    assert got["copy"] == (2, 1.0)
    assert got["scaled"] == (1, 1.0)
    assert "noise" not in got


def test_embedding_decontam_lsh_subset_and_recall(spark):
    import numpy as np

    from neo4j_document_pipeline_spark.operators.dedup import (
        embedding_decontam_flags)
    rng = np.random.RandomState(11)
    bench_vecs = [rng.normal(size=16) for _ in range(6)]
    bench = spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in enumerate(bench_vecs)],
        "bid long, bv array<float>")
    rows = [(f"n{i}", [float(x) for x in rng.normal(size=16)])
            for i in range(40)]
    # planted: tiny perturbation of bench[0] -> cosine ~1
    rows.append(("leak", [float(x + 0.01) for x in bench_vecs[0]]))
    corpus = spark.createDataFrame(rows, "doc_id string, v array<float>")
    exact = {(r["doc_id"], r["bench_id"]) for r in embedding_decontam_flags(
        corpus, bench, "doc_id", "v", "bid", "bv",
        threshold=0.95, method="broadcast").collect()}
    lsh = {(r["doc_id"], r["bench_id"]) for r in embedding_decontam_flags(
        corpus, bench, "doc_id", "v", "bid", "bv",
        threshold=0.95, method="lsh").collect()}
    assert lsh <= exact  # LSH can only miss, never invent
    assert ("leak", 0) in lsh  # near-identical vectors share all signs
    import pytest as _pytest
    with _pytest.raises(ValueError):
        embedding_decontam_flags(corpus, bench, "doc_id", "v", "bid",
                                 "bv", method="nope")


# ---------------------------------------------------------------------------
# Exact-substring duplicate spans (Lee et al. 2022 style)
# ---------------------------------------------------------------------------

def _span_rows(spark, rows, **kw):
    from neo4j_document_pipeline_spark.operators.dedup import duplicate_spans
    df = spark.createDataFrame(rows, "id long, text string")
    out = duplicate_spans(df, "id", "text", **kw).collect()
    return sorted((r["id"], r["span_start"], r["span_end"]) for r in out)


def test_duplicate_spans_known_values(spark):
    # a shared 10-token phrase at different offsets; k=8 -> exactly the
    # phrase's positions come back as ONE maximal span in each doc
    phrase = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    rows = [
        (1, "intro words here " + phrase + " trailing tail text"),
        (2, phrase + " something else entirely follows now"),
        (3, "no duplicated content in this document at all whatsoever"),
    ]
    got = _span_rows(spark, rows, k=8)
    # doc1: phrase tokens are positions 4..13; doc2: 1..10
    assert got == [(1, 4, 13), (2, 1, 10)]


def test_duplicate_spans_merge_adjacent(spark):
    # the phrase repeated back-to-back WITHIN one doc: the two copies and
    # the bridging grams merge into one contiguous span (and the repeat
    # alone satisfies min_count without any second document)
    phrase = "one two three four five six seven eight"
    rows = [(1, "lead " + phrase + " " + phrase + " tail")]
    got = _span_rows(spark, rows, k=8)
    assert got == [(1, 2, 17)]


def test_duplicate_spans_keep_first(spark):
    from neo4j_document_pipeline_spark.operators.dedup import (
        duplicate_spans, strip_duplicate_spans)
    phrase = "red orange yellow green blue indigo violet ultraviolet"
    rows = [(1, phrase), (2, phrase), (3, phrase)]
    df = spark.createDataFrame(rows, "id long, text string")
    # keep='none': all three copies flagged
    allf = duplicate_spans(df, "id", "text", k=8, keep="none").collect()
    assert sorted(r["id"] for r in allf) == [1, 2, 3]
    # keep='first': the corpus-minimal (id, pos) occurrence survives
    firstf = duplicate_spans(df, "id", "text", k=8, keep="first").collect()
    assert sorted(r["id"] for r in firstf) == [2, 3]
    stripped = {r["id"]: r for r in strip_duplicate_spans(
        df, "id", "text", k=8, keep="first").collect()}
    assert stripped[1]["text_clean"] == phrase
    assert stripped[2]["text_clean"] == "" and stripped[2]["n_removed"] == 8
    assert stripped[3]["n_removed"] == 8


def test_duplicate_span_stats_and_strip(spark):
    from neo4j_document_pipeline_spark.operators.dedup import (
        duplicate_span_stats, strip_duplicate_spans)
    phrase = "alpha beta gamma delta epsilon zeta eta theta"
    rows = [
        (1, "AAA bbb ccc " + phrase + " xx yy zz"),
        (2, phrase + " unrelated words following here"),
        (3, "clean document with no shared content at all"),
    ]
    df = spark.createDataFrame(rows, "id long, text string")
    st = {r["id"]: r for r in duplicate_span_stats(
        df, "id", "text", k=8).collect()}
    assert st[1]["n_spans"] == 1 and st[1]["dup_tokens"] == 8
    assert st[1]["n_tok"] == 14
    assert abs(st[1]["dup_frac"] - 8 / 14) < 1e-6
    assert st[3]["n_spans"] == 0 and st[3]["dup_frac"] == 0.0
    sp = {r["id"]: r for r in strip_duplicate_spans(
        df, "id", "text", k=8, keep="none").collect()}
    assert sp[1]["text_clean"] == "aaa bbb ccc xx yy zz"
    assert sp[2]["text_clean"] == "unrelated words following here"
    assert sp[3]["text_clean"] == "clean document with no shared content at all"


def test_duplicate_spans_brute_parity(spark):
    import random
    from neo4j_document_pipeline_spark.operators.dedup import duplicate_spans
    rng = random.Random(7)
    vocab = [f"w{i}" for i in range(12)]
    rows = [(i, " ".join(rng.choice(vocab) for _ in range(rng.randint(3, 40))))
            for i in range(40)]
    k, min_count = 4, 2

    # brute: same spec in plain python
    toks = {i: t.split() for i, t in rows}
    from collections import Counter
    cnt = Counter()
    for i, ts in toks.items():
        for p in range(len(ts) - k + 1):
            cnt[" ".join(ts[p:p + k])] += 1
    expect = []
    for i, ts in toks.items():
        flagged = [p + 1 for p in range(len(ts) - k + 1)
                   if cnt[" ".join(ts[p:p + k])] >= min_count]
        spans, cur = [], None
        for p in flagged:
            if cur is not None and p - cur[1] <= k:
                cur = (cur[0], p)
            else:
                if cur is not None:
                    spans.append(cur)
                cur = (p, p)
            continue
        if cur is not None:
            spans.append(cur)
        for s, e in spans:
            expect.append((i, s, e + k - 1))
    got = duplicate_spans(
        spark.createDataFrame(rows, "id long, text string"),
        "id", "text", k=k, min_count=min_count).collect()
    assert sorted((r["id"], r["span_start"], r["span_end"]) for r in got) \
        == sorted(expect)


def test_duplicate_spans_min_count_and_validation(spark):
    from neo4j_document_pipeline_spark.operators.dedup import duplicate_spans
    phrase = "p q r s t u v w"
    rows = [(1, phrase), (2, phrase), (3, phrase)]
    df = spark.createDataFrame(rows, "id long, text string")
    assert duplicate_spans(df, "id", "text", k=8, min_count=3).count() == 3
    assert duplicate_spans(df, "id", "text", k=8, min_count=4).count() == 0
    with pytest.raises(ValueError, match="k must be"):
        duplicate_spans(df, "id", "text", k=0)
    with pytest.raises(ValueError, match="min_count"):
        duplicate_spans(df, "id", "text", min_count=1)
    with pytest.raises(ValueError, match="keep"):
        duplicate_spans(df, "id", "text", keep="all")


# ---------------------------------------------------------------------------
# C4 page/line quality filters
# ---------------------------------------------------------------------------

def test_c4_filters_known_values(spark):
    from neo4j_document_pipeline_spark.operators.corpus import (
        c4_quality_filters)
    good = ("the quick brown fox jumps today.\n"
            "a second full sentence arrives right here!\n"
            'he said "this one ends with a quote"\n'
            "short line.\n"                       # < 5 words -> dropped
            "no terminal punctuation on this line\n"  # no punct -> dropped
            "please enable javascript to view this page.")  # js -> dropped
    docs = spark.createDataFrame(
        [
            (1, good),
            (2, good + "\nlorem ipsum dolor sit amet okay."),
            (3, good + '\nvar config = { "mode": 1 };'),
            (4, good + "\nwin big at the casino tonight folks."),
            # only 2 sentences survive -> below min_sentences=3
            (5, "the quick brown fox jumps today.\n"
                "a second full sentence arrives right here!"),
            (6, ""),  # empty page: 1 empty line, nothing kept
        ],
        "id long, text string")
    out = {r["id"]: r for r in
           c4_quality_filters(docs, "id", "text").collect()}
    r1 = out[1]
    assert r1["lines_total"] == 6 and r1["lines_kept"] == 3
    # kept text = the three surviving lines, trimmed, in order
    assert r1["text_clean"].split("\n") == good.split("\n")[:3]
    # sentences: '.' + '!' + the '.' inside nothing else = 2? no:
    # line3 ends with '"' and contains no .!? -> 2 terminators... the
    # quote line has none, so 2 < 3 would drop doc 1 — recount: line1
    # '.', line2 '!', line3 none -> sentences_kept == 2
    assert r1["sentences_kept"] == 2
    assert not r1["keep"]  # below min_sentences=3 despite clean flags
    assert out[2]["has_lorem"] and not out[2]["keep"]
    assert out[3]["has_brace"] and not out[3]["keep"]
    assert out[4]["has_badword"] and not out[4]["keep"]
    assert out[5]["lines_kept"] == 2 and not out[5]["keep"]
    assert out[6]["lines_kept"] == 0 and not out[6]["keep"]


def test_c4_filters_keep_true_path_and_badword_word_boundary(spark):
    from neo4j_document_pipeline_spark.operators.corpus import (
        c4_quality_filters)
    page = ("one full sentence with enough words.\n"
            "two full sentences with enough words!\n"
            "three full sentences with enough words?\n"
            # 'casinos'/'Lotteryx' must NOT trip the whole-word list;
            # capitalized CASINO inside another doc must
            "the casinos lotteryx words are safe here.")
    docs = spark.createDataFrame(
        [(1, page), (2, page + "\nthe CASINO word is banned here.")],
        "id long, text string")
    out = {r["id"]: r for r in
           c4_quality_filters(docs, "id", "text").collect()}
    assert out[1]["keep"] and not out[1]["has_badword"]
    assert out[1]["sentences_kept"] == 4 and out[1]["lines_kept"] == 4
    assert out[2]["has_badword"] and not out[2]["keep"]


def test_c4_filters_brute_parity(spark):
    import re

    import numpy as np

    from neo4j_document_pipeline_spark.operators.corpus import (
        C4_BADWORDS, c4_quality_filters)
    rng = np.random.RandomState(7)
    vocab = ["alpha", "beta", "gamma", "delta", "javascript", "casino",
             "lorem", "ipsum", "{brace", "plain"]
    pages = []
    for i in range(40):
        lines = []
        for _ in range(rng.randint(1, 8)):
            words = [vocab[rng.randint(len(vocab))]
                     for _ in range(rng.randint(1, 9))]
            end = [".", "!", "?", '"', ""][rng.randint(5)]
            lines.append(" ".join(words) + end)
        pages.append((i, "\n".join(lines)))
    out = {r["id"]: r for r in
           c4_quality_filters(
               spark.createDataFrame(pages, "id long, text string"),
               "id", "text").collect()}
    bad_re = re.compile(r"\b(" + "|".join(C4_BADWORDS) + r")\b", re.I)
    for i, text in pages:
        kept = [l.strip() for l in text.split("\n")
                if re.search(r'[.!?"]$', l.strip())
                and len(l.split()) >= 5
                and not re.search(r"\bjavascript\b", l, re.I)]
        clean = "\n".join(kept)
        sents = len(re.findall(r"[.!?]", clean))
        flags = ("lorem ipsum" in text.lower(), "{" in text,
                 bool(bad_re.search(text)))
        r = out[i]
        assert r["lines_kept"] == len(kept) and r["text_clean"] == clean
        assert r["sentences_kept"] == sents
        assert (r["has_lorem"], r["has_brace"], r["has_badword"]) == flags
        assert r["keep"] == (len(kept) > 0 and sents >= 3
                             and not any(flags))


def test_c4_filters_validation(spark):
    import pytest as _pytest

    from neo4j_document_pipeline_spark.operators.corpus import (
        c4_quality_filters)
    docs = spark.createDataFrame([(1, "x.")], "id long, text string")
    with _pytest.raises(ValueError):
        c4_quality_filters(docs, "id", "text", min_words_per_line=0)
    with _pytest.raises(ValueError):
        c4_quality_filters(docs, "id", "text", badwords=())


def test_c4_filters_trim_is_single_arg(spark):
    # regression: F.transform(lines, F.trim) would pass the element
    # INDEX as trim's second parameter (two-param TRIM), stripping
    # index digits from line edges — a line legitimately ending in a
    # digit-dot like "...season 1." must keep its terminal '.' intact
    from neo4j_document_pipeline_spark.operators.corpus import (
        c4_quality_filters)
    docs = spark.createDataFrame(
        [(1, "0 zero indexed words fill season 1.\n"
             "1 one indexed words fill season 2.")],
        "id long, text string")
    r = c4_quality_filters(docs, "id", "text").collect()[0]
    assert r["lines_kept"] == 2
    assert r["text_clean"].endswith("season 2.")
    assert r["text_clean"].startswith("0 zero")


# ---------------------------------------------------------------------------
# Gopher page-quality filters
# ---------------------------------------------------------------------------

def test_gopher_filters_known_values(spark):
    from neo4j_document_pipeline_spark.operators.corpus import (
        gopher_quality_filters)
    docs = spark.createDataFrame(
        [
            # passes every rule (min_words=5 for the test)
            (1, "the cat sat with that dog and they ran over there "
                "quite happily today"),
            # mean word length < 3 -> dropped
            (2, "a b c d e f g h i j the to of"),
            # symbol-heavy -> dropped on symbol_ratio
            (3, "the count with # and # and ... and … marks that be"),
            # too few alphabetic words -> dropped
            (4, "the 111 222 333 444 555 666 777 888 999 000 with"),
            # bullet lines dominate -> dropped
            (5, "- one bullet line here\n- two bullet line here\n"
                "• three bullet line here\nthe plain with line"),
            # ellipsis-ended lines dominate -> dropped
            (6, "the first line trails off...\nthe second also…\n"
                "a plain line with that"),
            # no stop words -> dropped
            (7, "alpha beta gamma delta epsilon zeta eta theta iota"),
            (8, ""),
        ],
        "id long, text string")
    out = {r["id"]: r for r in gopher_quality_filters(
        docs, "id", "text", min_words=5, max_bullet_line_frac=0.5,
        max_ellipsis_line_frac=0.5).collect()}
    assert out[1]["keep"]
    assert out[1]["n_stopwords"] >= 2 and out[1]["symbol_ratio"] == 0.0
    assert not out[2]["keep"] and out[2]["mean_word_len"] < 3.0
    assert not out[3]["keep"] and out[3]["symbol_ratio"] > 0.1
    assert out[3]["n_words"] == 13 and round(
        out[3]["symbol_ratio"] * 13) == 4
    assert not out[4]["keep"] and out[4]["alpha_word_frac"] < 0.8
    assert not out[5]["keep"] and out[5]["bullet_line_frac"] == 0.75
    assert not out[6]["keep"] and out[6]["ellipsis_line_frac"] == \
        pytest.approx(2 / 3)
    assert not out[7]["keep"] and out[7]["n_stopwords"] == 0
    assert not out[8]["keep"] and out[8]["n_words"] == 0


def test_gopher_filters_brute_parity(spark):
    import re

    import numpy as np

    from neo4j_document_pipeline_spark.operators.corpus import (
        GOPHER_STOPWORDS, gopher_quality_filters)
    rng = np.random.RandomState(13)
    vocab = ["the", "with", "alpha", "be", "x1", "###", "a", "...",
             "elongatedword", "42", "- lead", "…"]
    pages = []
    for i in range(40):
        lines = []
        for _ in range(rng.randint(1, 6)):
            words = [vocab[rng.randint(len(vocab))]
                     for _ in range(rng.randint(0, 8))]
            lines.append(" ".join(words)
                         + ["", "...", "…"][rng.randint(3)])
        pages.append((i, "\n".join(lines)))
    docs = spark.createDataFrame(pages, "id long, text string")
    got = {r["id"]: r for r in gopher_quality_filters(
        docs, "id", "text", min_words=3).collect()}
    tok_re = re.compile(r"[a-z0-9']+")
    for i, text in pages:
        words = re.findall(r"\S+", text)
        nw = len(words)
        mwl = sum(len(w) for w in words) / nw if nw else 0.0
        nsym = len(re.findall(r"#|\.\.\.|…", text))
        symr = nsym / nw if nw else 0.0
        alphaf = (sum(1 for w in words if re.search("[a-zA-Z]", w)) / nw
                  if nw else 0.0)
        lines = [l.strip() for l in text.split("\n") if l.strip()]
        nl = len(lines)
        bulf = (sum(1 for l in lines if l[:1] in "•-*") / nl
                if nl else 0.0)
        ellf = (sum(1 for l in lines
                    if l.endswith("...") or l.endswith("…")) / nl
                if nl else 0.0)
        nstop = len(set(tok_re.findall(text.lower()))
                    & set(GOPHER_STOPWORDS))
        r = got[i]
        assert r["n_words"] == nw
        assert r["mean_word_len"] == pytest.approx(mwl)
        assert r["symbol_ratio"] == pytest.approx(symr)
        assert r["alpha_word_frac"] == pytest.approx(alphaf)
        assert r["bullet_line_frac"] == pytest.approx(bulf)
        assert r["ellipsis_line_frac"] == pytest.approx(ellf)
        assert r["n_stopwords"] == nstop
        assert r["keep"] == (3 <= nw <= 100_000 and 3.0 <= mwl <= 10.0
                             and symr <= 0.1 and alphaf >= 0.8
                             and bulf <= 0.9 and ellf <= 0.3
                             and nstop >= 2)


def test_gopher_filters_validation(spark):
    from neo4j_document_pipeline_spark.operators.corpus import (
        gopher_quality_filters)
    docs = spark.createDataFrame([(1, "x")], "id long, text string")
    with pytest.raises(ValueError, match="min_words"):
        gopher_quality_filters(docs, "id", "text", min_words=10,
                               max_words=5)
    with pytest.raises(ValueError, match="empty stopwords"):
        gopher_quality_filters(docs, "id", "text", stopwords=())
    with pytest.raises(ValueError, match="min_stopwords"):
        gopher_quality_filters(docs, "id", "text", min_stopwords=-1)


# ---------------------------------------------------------------------------
# Fuzzy (whole-document Jaccard) decontamination
# ---------------------------------------------------------------------------

def test_jaccard_decontam_known_values(spark):
    from neo4j_document_pipeline_spark.operators.dedup import (
        jaccard_decontam_flags)
    corpus = spark.createDataFrame(
        [(1, "alpha beta gamma delta epsilon zeta"),   # == bench 100
         (2, "alpha beta gamma delta epsilon eta"),    # 3/5 grams
         (3, "totally different words in here now"),
         (4, "")],
        "doc_id long, text string")
    bench = spark.createDataFrame(
        [(100, "alpha beta gamma delta epsilon zeta"),
         (101, "different words entirely elsewhere")],
        "doc_id long, text string")
    out = {r["doc_id"]: r for r in jaccard_decontam_flags(
        corpus, bench, "doc_id", "text",
        shingle_words=3, threshold=0.5).collect()}
    assert out[1]["jaccard"] == 1.0 and out[1]["flagged"]
    assert out[1]["bench_id"] == 100
    # doc 2: grams {abg, bgd, gde, dee-eta...}: shares 3 of its 4
    # 3-grams with bench 100 -> 3 / (4 + 4 - 3)
    assert out[2]["jaccard"] == pytest.approx(0.6)
    assert out[2]["flagged"] and out[2]["bench_id"] == 100
    assert out[3]["jaccard"] == 0.0 and not out[3]["flagged"]
    assert out[3]["bench_id"] is None
    assert out[4]["n_grams"] == 0 and not out[4]["flagged"]


def test_jaccard_decontam_tie_breaks_to_greatest_bench_id(spark):
    from neo4j_document_pipeline_spark.operators.dedup import (
        jaccard_decontam_flags)
    corpus = spark.createDataFrame(
        [(1, "alpha beta gamma delta")], "doc_id long, text string")
    bench = spark.createDataFrame(
        [(7, "alpha beta gamma delta"),
         (9, "alpha beta gamma delta")], "doc_id long, text string")
    r = jaccard_decontam_flags(
        corpus, bench, "doc_id", "text",
        shingle_words=2, threshold=0.5).collect()[0]
    assert r["jaccard"] == 1.0 and r["bench_id"] == 9


def test_jaccard_decontam_brute_parity_and_join_modes(spark):
    import re

    import numpy as np

    from neo4j_document_pipeline_spark.operators.dedup import (
        jaccard_decontam_flags)
    rng = np.random.RandomState(5)
    vocab = [f"w{i}" for i in range(12)]

    def doc():
        return " ".join(vocab[rng.randint(len(vocab))]
                        for _ in range(rng.randint(0, 15)))

    corpus = [(i, doc()) for i in range(30)]
    bench = [(100 + i, doc()) for i in range(6)]
    cdf = spark.createDataFrame(corpus, "doc_id long, text string")
    bdf = spark.createDataFrame(bench, "doc_id long, text string")
    got = {r["doc_id"]: r for r in jaccard_decontam_flags(
        cdf, bdf, "doc_id", "text",
        shingle_words=2, threshold=0.3).collect()}
    tok_re = re.compile(r"[a-z0-9']+")

    def grams(t):
        toks = tok_re.findall(t.lower())
        if len(toks) < 2:
            return set()
        return {" ".join(toks[i:i + 2]) for i in range(len(toks) - 1)}

    bg = {bid: grams(t) for bid, t in bench}
    assert len(got) == len(corpus)
    for did, text in corpus:
        g = grams(text)
        best = None
        for bid, gb in bg.items():
            inter = len(g & gb)
            if inter == 0:
                continue
            j = inter / (len(g) + len(gb) - inter)
            if best is None or (j, bid) > best:
                best = (j, bid)
        r = got[did]
        assert r["n_grams"] == len(g)
        if best is None:
            assert r["jaccard"] == 0.0 and r["bench_id"] is None
        else:
            assert r["jaccard"] == pytest.approx(best[0])
            assert r["bench_id"] == best[1]
            assert r["flagged"] == (best[0] >= 0.3)
    # shuffled-join fallback is byte-identical to the broadcast path
    alt = {r["doc_id"]: r for r in jaccard_decontam_flags(
        cdf, bdf, "doc_id", "text", shingle_words=2,
        threshold=0.3, broadcast_bench=False).collect()}
    for did in got:
        assert got[did] == alt[did]


def test_jaccard_decontam_validation(spark):
    from neo4j_document_pipeline_spark.operators.dedup import (
        jaccard_decontam_flags)
    d = spark.createDataFrame([(1, "x")], "doc_id long, text string")
    with pytest.raises(ValueError, match="shingle_words"):
        jaccard_decontam_flags(d, d, "doc_id", "text", shingle_words=0)
    with pytest.raises(ValueError, match="threshold"):
        jaccard_decontam_flags(d, d, "doc_id", "text", threshold=0.0)


# ---------------------------------------------------------------------------
# Prefix-filtered exact set-similarity join
# ---------------------------------------------------------------------------

def _brute_jaccard_pairs(rows, threshold):
    """Exhaustive token-set Jaccard over (id, text) rows — the spec."""
    import itertools
    import re

    def toks(text):
        return set(t for t in re.sub(r"[^A-Za-z0-9']+", " ",
                                     text.lower()).split() if t)

    sets = {i: toks(t) for i, t in rows}
    out = {}
    for a, b in itertools.combinations(sorted(sets), 2):
        sa, sb = sets[a], sets[b]
        if not sa or not sb:
            continue
        u = len(sa | sb)
        j = len(sa & sb) / u if u else 0.0
        if j >= threshold:
            out[(a, b)] = (len(sa), len(sb), j)
    return out


class TestPrefixFilterJaccard:
    def _run(self, spark, rows, threshold):
        from neo4j_document_pipeline_spark.operators.dedup import (
            prefix_filter_jaccard_pairs)
        df = spark.createDataFrame(rows, ["doc_id", "text"])
        got = {(r.id1, r.id2): (r.n1, r.n2, r.jaccard)
               for r in prefix_filter_jaccard_pairs(
                   df, "doc_id", "text", threshold).collect()}
        return got

    def test_exhaustive_parity_random(self, spark):
        """Output == the exhaustive all-pairs join (the prefix filter
        is lossless, the verify is exact) on a random corpus with a
        hot shared vocabulary."""
        import random

        rng = random.Random(7)
        common = ["the", "of", "and", "data", "spark"]
        rare = [f"w{i}" for i in range(60)]
        rows = []
        for i in range(40):
            k = rng.randint(3, 12)
            words = rng.sample(rare, k) + rng.sample(common,
                                                     rng.randint(0, 4))
            rng.shuffle(words)
            rows.append((i, " ".join(words)))
        # planted near-dups
        rows.append((100, rows[0][1]))
        rows.append((101, rows[1][1] + " extra"))
        for t in (0.3, 0.5, 0.8):
            got = self._run(spark, rows, t)
            want = _brute_jaccard_pairs(rows, t)
            assert set(got) == set(want), f"t={t}"
            for k in want:
                assert got[k][0] == want[k][0]
                assert got[k][1] == want[k][1]
                assert abs(got[k][2] - want[k][2]) < 1e-12

    def test_threshold_boundary_exact_integer(self, spark):
        """t*n landing exactly on an integer (the ceil 1-ulp trap:
        0.4*5) must not shorten the prefix below lossless — the pair
        at exactly J == t survives."""
        # |x| = |y| = 5, overlap 4 -> J = 4/6 = 0.666..; use t where
        # t*5 is integral: t = 0.4 -> need J >= 0.4: J = 0.666 passes;
        # also a pair at exactly J = 0.4: overlap 2 of 3+4 (J=2/5=0.4)
        rows = [(1, "a b c d e"), (2, "a b c d f"),
                (3, "p q r"), (4, "p q s t")]
        got = self._run(spark, rows, 0.4)
        want = _brute_jaccard_pairs(rows, 0.4)
        assert set(got) == set(want)
        assert (3, 4) in got  # J exactly 0.4

    def test_empty_and_identical_docs(self, spark):
        rows = [(1, ""), (2, "   "), (3, "same words here"),
                (4, "same words here"), (5, "!!!")]
        got = self._run(spark, rows, 0.9)
        assert set(got) == {(3, 4)}
        assert got[(3, 4)][2] == 1.0

    def test_prefix_prunes_candidates(self, spark):
        """The point of the operator: on a corpus where every doc
        shares hot boilerplate tokens, prefix candidates are a strict
        subset of the full shared-token candidate set (which is
        all-pairs here), while output stays exact."""
        from neo4j_document_pipeline_spark.operators.dedup import (
            _prefix_candidate_count)
        import random

        rng = random.Random(3)
        boiler = "copyright terms privacy contact home"
        rows = [(i, boiler + " " + " ".join(
            f"u{i}x{j}" for j in range(rng.randint(4, 8))))
            for i in range(30)]
        df = spark.createDataFrame(rows, ["doc_id", "text"])
        n_pref = _prefix_candidate_count(df, "doc_id", "text", 0.8)
        all_pairs = 30 * 29 // 2  # every pair shares the boilerplate
        assert n_pref < all_pairs * 0.2, (n_pref, all_pairs)
        got = self._run(spark, rows, 0.8)
        assert set(got) == set(_brute_jaccard_pairs(rows, 0.8))

    def test_bad_threshold_raises(self, spark):
        import pytest as _pytest
        from neo4j_document_pipeline_spark.operators.dedup import (
            prefix_filter_jaccard_pairs)
        df = spark.createDataFrame([(1, "a")], ["doc_id", "text"])
        with _pytest.raises(ValueError):
            prefix_filter_jaccard_pairs(df, "doc_id", "text", 0.0)
        with _pytest.raises(ValueError):
            prefix_filter_jaccard_pairs(df, "doc_id", "text", 1.5)


class TestLatestSnapshotPerUrl:
    def _df(self, spark, rows):
        return spark.createDataFrame(
            rows, "url string, warc_ts timestamp, text string")

    def test_variants_fold_and_latest_wins(self, spark):
        import datetime as dt
        t = lambda s: dt.datetime(2025, 1, 1, 0, 0, s)
        from neo4j_document_pipeline_spark.operators.dedup import (
            latest_snapshot_per_url)
        df = self._df(spark, [
            ("https://a.com/p", t(1), "old"),
            ("HTTPS://A.COM/p?utm_source=x", t(5), "newest"),
            ("https://a.com/p/#frag", t(3), "mid"),
            ("https://b.com/q", t(2), "only"),
        ])
        got = {r["url_norm"]: r["text"]
               for r in latest_snapshot_per_url(df, "url",
                                                "warc_ts").collect()}
        assert got == {"https://a.com/p": "newest",
                       "https://b.com/q": "only"}

    def test_null_ts_loses_and_tie_is_deterministic(self, spark):
        import datetime as dt
        t0 = dt.datetime(2025, 1, 1)
        from neo4j_document_pipeline_spark.operators.dedup import (
            latest_snapshot_per_url)
        df = self._df(spark, [
            ("https://a.com/p", None, "undated"),
            ("https://a.com/p", t0, "dated"),
            # equal-ts pair: winner must be stable across partitionings
            ("https://c.com/r", t0, "x"),
            ("https://c.com/r", t0, "y"),
        ])
        out1 = {r["url_norm"]: r["text"] for r in
                latest_snapshot_per_url(df, "url", "warc_ts").collect()}
        out2 = {r["url_norm"]: r["text"] for r in
                latest_snapshot_per_url(df.repartition(7), "url",
                                        "warc_ts").collect()}
        assert out1["https://a.com/p"] == "dated"
        assert out1 == out2
        # explicit tiebreak column overrides the JSON-hash order
        out3 = {r["url_norm"]: r["text"] for r in
                latest_snapshot_per_url(df, "url", "warc_ts",
                                        tiebreak_col="text").collect()}
        assert out3["https://c.com/r"] == "y"  # max(text)

    def test_tiebreak_validation(self, spark):
        from neo4j_document_pipeline_spark.operators.dedup import (
            latest_snapshot_per_url)
        df = self._df(spark, [("https://a.com", None, "t")])
        import pytest as _pt
        with _pt.raises(ValueError, match="tiebreak_col"):
            latest_snapshot_per_url(df, "url", "warc_ts",
                                    tiebreak_col="nope")


class TestContainmentPairs:
    def _pairs(self, spark, rows, t):
        from neo4j_document_pipeline_spark.operators.dedup import (
            containment_pairs)
        df = spark.createDataFrame(rows, "doc_id long, text string")
        return containment_pairs(df, "doc_id", "text", threshold=t)

    def test_quote_inside_wrapper_is_one_directional(self, spark):
        quote = "alpha beta gamma delta"
        wrapper = quote + " " + " ".join(f"w{i}" for i in range(20))
        out = self._pairs(spark, [(1, quote), (2, wrapper)], 0.9)
        got = {(r["id_a"], r["id_b"]): r["containment"]
               for r in out.collect()}
        # the quote is fully contained in the wrapper; the wrapper's
        # containment in the quote is 4/24 and must NOT appear
        assert got == {(1, 2): 1.0}

    def test_brute_parity_random(self, spark):
        import random
        rng = random.Random(7)
        vocab = [f"t{i}" for i in range(30)]
        rows = [(i, " ".join(rng.sample(vocab, rng.randint(1, 12))))
                for i in range(25)]
        for t in (0.5, 0.8, 1.0):
            got = {(r["id_a"], r["id_b"]): round(r["containment"], 9)
                   for r in self._pairs(spark, rows, t).collect()}
            sets = {i: set(s.split()) for i, s in rows}
            want = {}
            for a in sets:
                for b in sets:
                    if a == b or not sets[a]:
                        continue
                    c = len(sets[a] & sets[b]) / len(sets[a])
                    if c >= t:
                        want[(a, b)] = round(c, 9)
            assert got == want, f"t={t}"

    def test_empty_doc_never_qualifies(self, spark):
        out = self._pairs(spark, [(1, ""), (2, "alpha beta")], 0.5)
        assert out.count() == 0

    def test_threshold_validation(self, spark):
        import pytest as _pt
        df = spark.createDataFrame([(1, "a")], "doc_id long, text string")
        from neo4j_document_pipeline_spark.operators.dedup import (
            containment_pairs)
        for bad in (0.0, -0.1, 1.5):
            with _pt.raises(ValueError):
                containment_pairs(df, "doc_id", "text", threshold=bad)
