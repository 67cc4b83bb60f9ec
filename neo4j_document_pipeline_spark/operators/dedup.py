"""Corpus deduplication operators — training-data pipeline first-class ops.

Exact (hash groupBy), MinHash-LSH near-dup, SimHash, n-gram Jaccard,
embedding-cosine near-dup. All operate on a generic (id, text) frame such
as the ``documents`` table.

Scale design:
- exact dedup: one hash aggregation on sha256(text) — uniform keys;
- MinHash: signatures in one Arrow-batched pass; LSH banding explodes to
  bands × rows block keys; pair generation only within blocks (quadratic
  ONLY in block size, capped); verification = exact shingle Jaccard with
  JVM array ops;
- SimHash: 64-bit signature; candidate pairs via 4x16-bit band equality
  (catches all pairs within Hamming distance 3); verify with bit_count;
- embedding near-dup: random-hyperplane sign buckets -> within-bucket
  cosine (exact re-rank).
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from neo4j_document_pipeline_spark.config import DEFAULT_CONFIG, PipelineConfig
from neo4j_document_pipeline_spark.operators.linking import (
    _MERSENNE,
    _minhash_params,
    candidate_pairs,
    lsh_blocks,
)

def _word_gram_arr(c, n: int):
    """Distinct word n-grams of a text column as one array — engine
    tokenization (``col_tokens``), inclusive windows, empty array for
    docs shorter than ``n`` tokens. The token array is let-bound
    (``col_let``) so the interpreted per-gram lambda slices a
    materialized array instead of re-running the tokenizer regex per
    gram — inlining it is O(tokens²) regex work per row (the
    higher-order-function CodegenFallback trap; see col_let)."""
    from neo4j_document_pipeline_spark.functions.textstats import (
        col_let, col_tokens)

    def with_toks(toks):
        return F.when(
            F.size(toks) >= n,
            F.array_distinct(F.transform(
                F.sequence(F.lit(1), F.size(toks) - n + 1),
                lambda i: F.concat_ws(" ", F.slice(toks, i, n)),
            )),
        ).otherwise(F.array().cast("array<string>"))

    return col_let(col_tokens(c), with_toks)


# ---------------------------------------------------------------------------
# Exact dedup
# ---------------------------------------------------------------------------

def exact_duplicate_groups(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Group rows by content hash; return groups with >1 member:
    (content_hash, n_dups, keep_id = min id, dup_ids sorted)."""
    h = df.select(F.col(id_col).alias("id"), F.sha2(F.col(text_col), 256).alias("content_hash"))
    return (
        h.groupBy("content_hash")
        .agg(F.count("*").alias("n_dups"),
             F.min("id").alias("keep_id"),
             F.array_sort(F.collect_list("id")).alias("dup_ids"))
        .filter(F.col("n_dups") > 1)
    )


def dedup_exact(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Keep the min-id row per identical text (deterministic)."""
    w = Window.partitionBy(F.sha2(F.col(text_col), 256)).orderBy(F.col(id_col))
    return df.withColumn("_rn", F.row_number().over(w)).filter(F.col("_rn") == 1).drop("_rn")


# ---------------------------------------------------------------------------
# MinHash-LSH near-dup (documents: word shingles)
# ---------------------------------------------------------------------------

def doc_minhash_signatures(df: DataFrame, id_col: str, text_col: str,
                           cfg: PipelineConfig = DEFAULT_CONFIG,
                           shingle_words: int = 3) -> DataFrame:
    """(id, text) -> (id, sig, shingles) over word n-gram shingles.

    ``sig`` (minhash over crc32 gram hashes) drives LSH banding only;
    ``shingles`` carries the raw gram STRINGS so the exact-Jaccard
    verification kernel is hash-free (no crc32-collision noise) and
    reproducible by a plain-SQL oracle."""
    k = cfg.minhash_sig_len
    a_, b_ = _minhash_params(k, cfg.featurizer_seed)

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import re
        import zlib
        tok_re = re.compile(r"[a-z0-9]+")
        for pdf in batches:
            sigs, shingles = [], []
            for doc_id, text in zip(pdf[id_col], pdf[text_col]):
                toks = tok_re.findall((text or "").lower())
                grams = {
                    " ".join(toks[i:i + shingle_words])
                    for i in range(max(1, len(toks) - shingle_words + 1))
                } if toks else set()
                if not grams:
                    # token-less docs carry no shingle evidence: a UNIQUE
                    # per-id sentinel keeps unrelated empty docs out of
                    # each other's blocks (a shared all-zero signature
                    # would pair every empty doc with every other one)
                    sigs.append([zlib.crc32(str(doc_id).encode())] * k)
                    shingles.append([])
                    continue
                hashed = np.fromiter(
                    (zlib.crc32(g.encode()) for g in grams),
                    dtype=np.int64, count=len(grams))
                x = hashed[:, None] % _MERSENNE
                hv = (x * a_[None, :] + b_[None, :]) % _MERSENNE
                sigs.append(hv.min(axis=0).tolist())
                shingles.append(sorted(grams))
            out = pd.DataFrame({
                "id": pdf[id_col], "sig": sigs, "shingles": shingles,
            })
            yield out

    id_type = dict(zip(df.columns, [f.dataType.simpleString() for f in df.schema.fields]))[id_col]
    return df.select(F.col(id_col), F.col(text_col)).mapInPandas(
        gen, schema=f"id {id_type}, sig array<bigint>, shingles array<string>"
    )


def minhash_near_duplicates(df: DataFrame, id_col: str, text_col: str,
                            cfg: PipelineConfig = DEFAULT_CONFIG,
                            jaccard_threshold: float = 0.8,
                            shingle_words: int = 3) -> DataFrame:
    """Near-duplicate pairs (id1, id2, jaccard) with exact verification.

    The signature subplan appears under three consumers (LSH blocking +
    both sides of the shingle join-back); runtime exchange reuse already
    dedups the duplicated shuffles (A/B-measured neutral vs an explicit
    localCheckpoint at sf0.1), so the operator stays fully lazy — gate
    callers that reuse signatures across SEVERAL operators pass a
    pre-checkpointed frame via near_duplicate_pairs_from_sigs."""
    sigs = doc_minhash_signatures(df, id_col, text_col, cfg, shingle_words)
    return near_duplicate_pairs_from_sigs(sigs, cfg, jaccard_threshold)


def near_duplicate_pairs_from_sigs(sigs: DataFrame,
                                   cfg: PipelineConfig = DEFAULT_CONFIG,
                                   jaccard_threshold: float = 0.8) -> DataFrame:
    """Pair generation + exact-Jaccard verification over PRECOMPUTED
    (id, sig, shingles) rows — callers that already hold the signatures
    (the ingest gates run the Arrow shingling pass once and reuse it
    for gating, within-batch resolution, and the committed signature
    table) skip re-shingling, the dominant near-dup cost."""
    blocks = lsh_blocks(sigs, cfg)
    pairs = candidate_pairs(blocks, "id", cfg, block_cols=("band", "bh"))
    sh = sigs.select("id", "shingles")
    s1 = sh.select(F.col("id").alias("id1"), F.col("shingles").alias("sh1"))
    s2 = sh.select(F.col("id").alias("id2"), F.col("shingles").alias("sh2"))
    inter = F.size(F.array_intersect("sh1", "sh2"))
    union = F.size(F.array_union("sh1", "sh2"))
    return (
        pairs.join(s1, "id1").join(s2, "id2")
        .withColumn("jaccard", F.when(union > 0, inter / union).otherwise(F.lit(0.0)))
        .filter(F.col("jaccard") >= jaccard_threshold)
        .select("id1", "id2", "jaccard")
    )


def resolve_near_duplicates(df: DataFrame, id_col: str, text_col: str,
                            cfg: PipelineConfig = DEFAULT_CONFIG,
                            jaccard_threshold: float = 0.8,
                            shingle_words: int = 3,
                            sigs: DataFrame | None = None) -> DataFrame:
    """Corpus-level near-dup RESOLUTION — the operation a training-data
    pipeline actually runs (pairs are evidence; the deliverable is
    "which rows survive"): MinHash-LSH near-dup pairs -> connected
    components (TRANSITIVE closure: A~B and B~C collapse into one
    cluster even when A and C were never paired — pairwise-greedy
    dedup would keep both A and C) -> keep the minimum id per cluster
    -> (id, keep_id, is_kept) for every CLUSTERED document. Documents
    in no cluster are implicitly kept: filter the corpus with a
    left_anti join against this result's is_kept=false rows.

    keep_id is the component representative from connected_components,
    i.e. the STRING-minimum id of the cluster — zero-pad numeric ids
    first if "10" < "9" would pick the wrong survivor (the driver
    oracle query does exactly that).

    Scale: inherits the banded-LSH pair bound (never all-pairs) and
    the O(log n)-round star-contraction components; the near-dup graph
    is tiny relative to the corpus (only clustered docs enter CC)."""
    from neo4j_document_pipeline_spark.operators.components import (
        connected_components)
    if sigs is not None:
        # precomputed (id, sig, shingles) rows — MUST cover exactly the
        # rows of df (a wider frame would resolve against ghosts)
        pairs = near_duplicate_pairs_from_sigs(sigs, cfg, jaccard_threshold)
    else:
        pairs = minhash_near_duplicates(df, id_col, text_col, cfg,
                                        jaccard_threshold, shingle_words)
    comp = connected_components(
        pairs.select(F.col("id1").alias("u"), F.col("id2").alias("v")))
    return comp.select(
        F.col("id").alias(id_col),
        F.col("component").alias("keep_id"),
        (F.col("id") == F.col("component")).alias("is_kept"))


def ngram_jaccard_pairs(df: DataFrame, id_col: str, text_col: str,
                        cfg: PipelineConfig = DEFAULT_CONFIG,
                        shingle_words: int = 3) -> DataFrame:
    """Exact all-candidate n-gram Jaccard (no threshold) — the verification
    kernel exposed standalone; candidates still come from LSH blocking so
    the operator scales."""
    return minhash_near_duplicates(df, id_col, text_col, cfg,
                                   jaccard_threshold=0.0,
                                   shingle_words=shingle_words)


def ngram_jaccard_exact(df: DataFrame, id_col: str, text_col: str,
                        threshold: float = 0.4,
                        shingle_words: int = 3) -> DataFrame:
    """EXACT n-gram Jaccard pairs at a threshold, with EXHAUSTIVE
    candidate generation: a pair has J > 0 iff it shares at least one
    shingle, so an inverted shared-shingle equi-join misses no candidate
    (unlike LSH banding, whose recall degrades below its design
    threshold — which is why ngram_jaccard_pairs could never have an
    all-pairs oracle). Everything is JVM expression work: tokenize/
    shingle via higher-order functions, candidates via the shingle
    equi-join, verify via array_intersect/array_union.

    Scale note: the shingle self-join multiplies on boilerplate shingles
    shared by many documents — this is the exact kernel for BOUNDED
    subsets (dedup audits, oracle verification, final-verify of LSH
    candidates); at corpus scale use minhash_near_duplicates, whose
    banding bounds candidate counts per block."""
    from neo4j_document_pipeline_spark.functions.textstats import col_let

    def with_toks(toks):
        n = F.size(toks)
        grams = F.array_distinct(F.transform(
            F.sequence(F.lit(0), F.greatest(n - shingle_words, F.lit(0))),
            lambda i: F.array_join(
                F.slice(toks, i + 1, shingle_words), " ")))
        return F.when(n > 0, grams).otherwise(
            F.array().cast("array<string>"))

    # let-bound so the shingle lambda slices a materialized token
    # array instead of re-tokenizing per shingle (see col_let)
    shingles = col_let(
        F.filter(
            F.split(F.regexp_replace(F.lower(F.col(text_col)),
                                     r"[^a-z0-9]+", " "), " "),
            lambda x: x != ""),
        with_toks)
    sh = df.select(F.col(id_col).alias("id"), shingles.alias("shingles"))
    posting = sh.select("id", F.explode("shingles").alias("gram"))
    p1 = posting.select(F.col("id").alias("id1"), "gram")
    p2 = posting.select(F.col("id").alias("id2"), "gram")
    pairs = (p1.join(p2, "gram")
             .filter(F.col("id1") < F.col("id2"))
             .select("id1", "id2").distinct())
    s1 = sh.select(F.col("id").alias("id1"), F.col("shingles").alias("sh1"))
    s2 = sh.select(F.col("id").alias("id2"), F.col("shingles").alias("sh2"))
    inter = F.size(F.array_intersect("sh1", "sh2"))
    union = F.size(F.array_union("sh1", "sh2"))
    return (
        pairs.join(s1, "id1").join(s2, "id2")
        .withColumn("jaccard",
                    F.when(union > 0, inter / union).otherwise(F.lit(0.0)))
        .filter(F.col("jaccard") >= threshold)
        .select("id1", "id2", "jaccard")
    )


# ---------------------------------------------------------------------------
# SimHash
# ---------------------------------------------------------------------------

def simhash_signatures(df: DataFrame, id_col: str, text_col: str,
                       seed: int = 42) -> DataFrame:
    """64-bit SimHash over 64-bit md5 token hashes (weighted by tf).

    The token hash is the low 8 digest bytes of md5('{seed}:{tok}') read
    little-endian — exactly SQL ``md5_number_lower('{seed}:' || tok)``, so
    the full signature is reproducible by a plain-SQL oracle (md5 is
    already avalanched; no extra finalizer needed)."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib
        import re
        from collections import Counter
        tok_re = re.compile(r"[a-z0-9]+")
        for pdf in batches:
            out = []
            for text in pdf[text_col]:
                toks = tok_re.findall((text or "").lower())
                if toks:
                    # hash each DISTINCT token once; weight by tf
                    tf = Counter(toks)
                    h = np.fromiter(
                        (int.from_bytes(
                            hashlib.md5(f"{seed}:{t}".encode()).digest()[8:16],
                            "little") for t in tf),
                        dtype=np.uint64, count=len(tf))
                    w = np.fromiter(tf.values(), dtype=np.int64, count=len(tf))
                    bits = (h[:, None] >> np.arange(64, dtype=np.uint64)) & np.uint64(1)
                    acc = (np.where(bits == 1, 1, -1) * w[:, None]).sum(axis=0)
                else:
                    acc = np.full(64, -1)
                sig = 0
                for i in range(64):
                    if acc[i] > 0:
                        sig |= 1 << i
                out.append(np.uint64(sig).astype(np.int64))
            yield pd.DataFrame({"id": pdf[id_col], "simhash": out})

    id_type = dict(zip(df.columns, [f.dataType.simpleString() for f in df.schema.fields]))[id_col]
    return df.select(id_col, text_col).mapInPandas(
        gen, schema=f"id {id_type}, simhash bigint")


def simhash_near_duplicates(df: DataFrame, id_col: str, text_col: str,
                            max_hamming: int = 3, seed: int = 42,
                            max_block_size: int = 64) -> DataFrame:
    """Pairs within Hamming distance <= max_hamming. Candidates: split the
    64-bit signature into 4 x 16-bit bands; any pair within distance 3
    agrees on >= 1 band (pigeonhole). Verify via bit_count(xor)."""
    sigs = simhash_signatures(df, id_col, text_col, seed)
    bands = sigs.select(
        "id", "simhash",
        F.explode(F.array(*[
            F.struct(F.lit(b).alias("band"),
                     F.shiftright("simhash", b * 16).bitwiseAND(F.lit(0xFFFF)).alias("bh"))
            for b in range(4)
        ])).alias("bk"),
    ).select("id", "simhash", F.col("bk.band").alias("band"), F.col("bk.bh").alias("bh"))
    # head-block skew control (same rule as candidate_pairs): a 16-bit
    # band has only 65536 values, so degenerate corpora (every empty doc
    # simhashes to 0) would make the self-join quadratic without a cap
    bands = bands.withColumn(
        "_bs", F.count("*").over(Window.partitionBy("band", "bh"))
    ).filter(F.col("_bs") <= max_block_size).drop("_bs")
    a = bands.select("band", "bh", F.col("id").alias("id1"), F.col("simhash").alias("s1"))
    b = bands.select("band", "bh", F.col("id").alias("id2"), F.col("simhash").alias("s2"))
    return (
        a.join(b, ["band", "bh"])
        .filter(F.col("id1") < F.col("id2"))
        .select("id1", "id2",
                F.bit_count(F.col("s1").bitwiseXOR(F.col("s2"))).alias("hamming"))
        # verify BEFORE the distinct so the dedup shuffle carries only
        # surviving pairs, not the full candidate set
        .filter(F.col("hamming") <= max_hamming)
        .distinct()
    )


# ---------------------------------------------------------------------------
# Embedding-cosine near-dup
# ---------------------------------------------------------------------------

def embedding_near_duplicates(df: DataFrame, id_col: str, vec_col: str,
                              threshold: float = 0.95,
                              n_planes: int = 12, seed: int = 42,
                              dim: int | None = None) -> DataFrame:
    """Cosine >= threshold pairs via random-hyperplane buckets + exact
    rerank. High-cosine pairs agree on all hyperplane signs w.h.p.; we use
    two independent banded sign-groups to boost recall."""
    first = df.filter(F.col(vec_col).isNotNull()).select(vec_col).first()
    if first is None:
        # empty input: the pair schema's id type must mirror the caller's
        # actual id column (string doc_ids would otherwise come back long)
        id_type = df.schema[id_col].dataType.simpleString()
        return df.sparkSession.createDataFrame(
            [], f"id1 {id_type}, id2 {id_type}, cos double")
    d = dim or len(first[0])
    rng = np.random.RandomState(seed)
    planes = rng.normal(size=(n_planes, d))

    base = df.select(F.col(id_col).alias("id"), F.col(vec_col).alias("v"))
    sign_bits = []
    for p in range(n_planes):
        dot = F.aggregate(
            F.zip_with(F.col("v"),
                       F.array(*[F.lit(float(x)) for x in planes[p]]),
                       lambda a, b2: a * b2),
            F.lit(0.0), lambda acc, x: acc + x)
        sign_bits.append(F.when(dot >= 0, F.lit(1)).otherwise(F.lit(0)))
    # two bands of n_planes/2 bits each
    half = n_planes // 2
    b1 = sum(sign_bits[i] * F.lit(2 ** i) for i in range(half))
    b2 = sum(sign_bits[half + i] * F.lit(2 ** i) for i in range(n_planes - half))
    base = base.withColumn("bk1", b1).withColumn("bk2", b2)
    cands = None
    for bcol in ["bk1", "bk2"]:
        a = base.select(F.col(bcol).alias("b"), F.col("id").alias("id1"), F.col("v").alias("v1"))
        c = base.select(F.col(bcol).alias("b"), F.col("id").alias("id2"), F.col("v").alias("v2"))
        p = a.join(c, "b").filter(F.col("id1") < F.col("id2")).drop("b")
        cands = p if cands is None else cands.unionByName(p)
    cands = cands.dropDuplicates(["id1", "id2"])
    dot = F.aggregate(F.zip_with("v1", "v2", lambda a, b3: a * b3),
                      F.lit(0.0), lambda acc, x: acc + x)
    n1 = F.sqrt(F.aggregate("v1", F.lit(0.0), lambda acc, x: acc + x * x))
    n2 = F.sqrt(F.aggregate("v2", F.lit(0.0), lambda acc, x: acc + x * x))
    return (
        cands.withColumn(
            "cos",
            F.when((n1 == 0) | (n2 == 0), F.lit(0.0)).otherwise(dot / (n1 * n2)))
        .filter(F.col("cos") >= threshold)
        .select("id1", "id2", "cos")
    )


# ---------------------------------------------------------------------------
# Benchmark decontamination (n-gram overlap flags)
# ---------------------------------------------------------------------------

def ngram_overlap_flags(docs: DataFrame, bench: DataFrame,
                        id_col: str, text_col: str, *,
                        n: int = 13, threshold: float = 0.0,
                        broadcast_bench: bool = True) -> DataFrame:
    """Flag training documents whose word n-grams overlap a benchmark set
    — the GPT-3/PaLM-style decontamination pass (training corpora are
    scrubbed of eval-set n-grams so benchmark numbers measure
    generalization, not memorization).

    Returns one row per ``docs`` row: (id_col, n_grams, n_hit,
    overlap_frac, flagged) where ``n_grams`` counts the document's
    DISTINCT word n-grams, ``n_hit`` how many of those appear anywhere in
    ``bench``, and ``flagged`` = overlap_frac > threshold (the default
    threshold 0.0 flags ANY overlap, the usual 13-gram policy).
    Documents shorter than ``n`` tokens have zero grams and are never
    flagged. Tokenization is the engine's ``col_tokens`` (lowercase,
    punctuation-stripped), so the whole computation is plain-SQL
    reproducible.

    Scale shape: per-row ``array_distinct`` replaces a global distinct
    (no extra shuffle); the benchmark gram set is tiny by nature (eval
    suites, not corpora) and broadcasts — the only shuffle is the final
    hash aggregation by document id. Set ``broadcast_bench=False`` for a
    pathological giant benchmark to fall back to a shuffled hash join.
    """
    if n < 1:
        raise ValueError(f"n must be >= 1, got {n}")

    def gram_arr(c):
        return _word_gram_arr(c, n)

    bench_grams = (
        bench.select(F.explode(gram_arr(F.col(text_col))).alias("gram"))
        .distinct().withColumn("_hit", F.lit(1))
    )
    if broadcast_bench:
        bench_grams = F.broadcast(bench_grams)

    idc = F.col(id_col)
    # grams materialized ONCE per row (size + explode both read the
    # projected array; building the array twice would double the work)
    ex = (docs.select(idc, gram_arr(F.col(text_col)).alias("_g"))
          .select(idc, F.size("_g").alias("n_grams"),
                  F.explode_outer("_g").alias("gram")))
    agg = (
        ex.join(bench_grams, "gram", "left")
        .groupBy(id_col)
        .agg(F.max("n_grams").alias("n_grams"),
             F.sum(F.coalesce(F.col("_hit"), F.lit(0))).alias("n_hit"))
    )
    frac = F.when(F.col("n_grams") > 0,
                  F.col("n_hit") / F.col("n_grams")).otherwise(F.lit(0.0))
    return agg.select(
        id_col, "n_grams", "n_hit", frac.alias("overlap_frac"),
        (frac > F.lit(float(threshold))).alias("flagged"))


def ngram_overlap_flags_bloom(docs: DataFrame, bench: DataFrame,
                              id_col: str, text_col: str, *,
                              n: int = 13, threshold: float = 0.0,
                              bloom_bits: int = 1 << 20,
                              bloom_hashes: int = 4,
                              salt: str = "v1") -> DataFrame:
    """``ngram_overlap_flags`` for a benchmark gram set too large to
    broadcast as STRINGS: identical output (same columns, same rows,
    bit-for-bit), reached through a broadcast BLOOM FILTER of the
    bench grams instead of the bench grams themselves.

    Why this exists at 100 TB: a pooled eval registry can hold 10^8+
    grams — hundreds of MB of strings, unbroadcastable — while its
    Bloom filter at ~10 bits/gram is a few hundred MB of BITS at
    worst and here rides the sparse packed-word form
    (``bloom_sketch``). The probe side then drops every
    definite-miss gram NARROWLY: per hash function one broadcast-hash
    join against the word table plus a bit test — no shuffle touches
    the corpus-sized gram stream. Only the surviving grams (true
    overlaps + the filter's false positives) reach the exact hash
    join against the bench grams, so false positives are verified
    away and the no-false-negative guarantee makes the prefilter
    LOSSLESS: output == the exact path's, provably (the oracle for
    this operator IS the exact decontamination SQL).

    Scale shape: bench-side one gram aggregate + the O(m_bits/32)-row
    word table (broadcast k times); docs-side a narrow gram explode,
    k broadcast joins + bit filters, then the exact verify join and
    one per-doc aggregate over SURVIVORS ONLY — the shuffled volume is
    proportional to the (tiny) overlap, not the corpus."""
    if n < 1:
        raise ValueError(f"n must be >= 1, got {n}")
    if bloom_bits < 2:
        raise ValueError(f"bloom_bits must be >= 2, got {bloom_bits}")
    if bloom_hashes < 1:
        raise ValueError(f"bloom_hashes must be >= 1, got {bloom_hashes}")
    from neo4j_document_pipeline_spark.operators.sketches import (
        _bloom_pos, bloom_sketch)

    def gram_arr(c):
        return _word_gram_arr(c, n)

    # lazy checkpoint: the k prefilter joins and the verify join all
    # consume these two frames — without it Catalyst re-plans the bench
    # gram aggregate once per consumer (the differently-aliased word
    # projections defeat exchange reuse)
    bench_grams = (
        bench.select(F.explode(gram_arr(F.col(text_col))).alias("gram"))
        .distinct().localCheckpoint(eager=False))
    words = bloom_sketch(bench_grams, [], "gram", m_bits=bloom_bits,
                         k_hashes=bloom_hashes, salt=salt) \
        .localCheckpoint(eager=False)

    # narrow prefilter: per hash function, one broadcast join on the
    # word index + a bit test; a gram missing ANY of its bits is a
    # definite miss and is dropped before it can cost a shuffle
    survivors = docs.select(
        F.col(id_col), F.explode(gram_arr(F.col(text_col))).alias("gram"))
    for i in range(bloom_hashes):
        wi = words.select(F.col("w").alias(f"_w{i}"),
                          F.col("bits").alias(f"_b{i}"))
        p = _bloom_pos("gram", i, bloom_bits, salt)
        mask = F.expr(
            f"shiftleft(cast(1 as bigint), cast(_p{i} % 32 as int))")
        survivors = (
            survivors.withColumn(f"_p{i}", p)
            .join(F.broadcast(wi),
                  F.floor(F.col(f"_p{i}") / 32) == F.col(f"_w{i}"), "left")
            .filter(F.coalesce(
                F.col(f"_b{i}").bitwiseAND(mask) != 0, F.lit(False)))
            .drop(f"_p{i}", f"_w{i}", f"_b{i}"))

    # exact verify on survivors only — false positives die here
    hits = (survivors.join(bench_grams, "gram")
            .groupBy(id_col).agg(F.count("*").alias("n_hit")))
    base = docs.select(F.col(id_col),
                       F.size(gram_arr(F.col(text_col))).alias("n_grams"))
    out = (base.join(hits, [id_col], "left")
           .withColumn("n_hit", F.coalesce(F.col("n_hit"), F.lit(0))))
    frac = F.when(F.col("n_grams") > 0,
                  F.col("n_hit") / F.col("n_grams")).otherwise(F.lit(0.0))
    return out.select(
        id_col, "n_grams", "n_hit", frac.alias("overlap_frac"),
        (frac > F.lit(float(threshold))).alias("flagged"))


# ---------------------------------------------------------------------------
# Cross-document line dedup (CCNet-style)
# ---------------------------------------------------------------------------

def dedup_lines_across_docs(df: DataFrame, id_col: str, text_col: str, *,
                            min_doc_freq: int = 2,
                            joiner: str = "\n") -> DataFrame:
    """Remove lines duplicated ACROSS documents — the CCNet §4.1 pass
    that strips nav bars, cookie banners, and footer boilerplate that
    document-level dedup can't see (every page is unique; its chrome is
    not).

    A line is removed from EVERY document when its trimmed form appears
    in >= ``min_doc_freq`` DISTINCT documents. Whitespace-only lines are
    kept (they carry formatting, never boilerplate identity). Returns
    one row per input row: (id_col, text_clean, n_lines, n_removed);
    documents whose every line was boilerplate come back with
    ``text_clean = ''``.

    Scale shape: line counting and the removal anti-join key on
    ``sha2(trim(line))`` — fixed-width keys instead of arbitrary-length
    line text — and line hashes are near-uniform, so both shuffles
    (count by line hash, reassemble by doc id) partition evenly. This is
    the same two-aggregation shape CCNet runs over Common Crawl; for
    trillion-line corpora swap the exact count for a count-min sketch
    without touching the surrounding plan.
    """
    if min_doc_freq < 1:
        raise ValueError(f"min_doc_freq must be >= 1, got {min_doc_freq}")
    idc = F.col(id_col)
    lines = doc_lines(df, id_col, text_col)
    dup_keys = (
        lines.filter(F.col("lkey").isNotNull())
        .groupBy("lkey").agg(F.countDistinct(idc).alias("ndocs"))
        .filter(F.col("ndocs") >= min_doc_freq).select("lkey")
    )
    return remove_lines(df, dup_keys, id_col, text_col, joiner=joiner)


def doc_lines(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """(id, pos, line, lkey) — one row per newline-split line of every
    document. ``lkey`` = sha2(trim(line)); whitespace-only lines carry a
    NULL lkey (they are formatting, never boilerplate identity, and every
    line-dedup consumer keeps them). Shared by the standalone corpus pass
    (dedup_lines_across_docs) and the ingest gate so both remove exactly
    the same lines."""
    return (
        df.select(
            F.col(id_col),
            F.posexplode(F.split(F.col(text_col), "\n")).alias("pos", "line"))
        .withColumn(
            "lkey",
            F.when(F.trim("line") == "", F.lit(None))
            .otherwise(F.sha2(F.trim("line"), 256)))
    )


def remove_lines(df: DataFrame, dup_keys: DataFrame, id_col: str,
                 text_col: str, joiner: str = "\n") -> DataFrame:
    """Strip every line whose lkey appears in ``dup_keys`` (one ``lkey``
    column) from every document: (id_col, text_clean, n_lines,
    n_removed). Whitespace-only lines (NULL lkey) never match and are
    kept; documents whose every line was boilerplate come back with
    ``text_clean = ''``."""
    idc = F.col(id_col)
    lines = doc_lines(df, id_col, text_col)
    kept = lines.join(dup_keys.select("lkey"), "lkey", "left_anti")
    reassembled = kept.groupBy(id_col).agg(
        F.concat_ws(
            joiner,
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "line"))),
                lambda s: s["line"]),
        ).alias("text_clean"),
        F.count("*").alias("n_kept"),
    )
    base = df.select(idc, F.size(F.split(F.col(text_col), "\n")).alias("n_lines"))
    return (
        base.join(reassembled, id_col, "left")
        .select(
            id_col,
            F.coalesce(F.col("text_clean"), F.lit("")).alias("text_clean"),
            "n_lines",
            (F.col("n_lines") - F.coalesce(F.col("n_kept"), F.lit(0)))
            .alias("n_removed"))
    )


# ---------------------------------------------------------------------------
# Exact-substring duplicate spans (suffix-array-style dedup)
# ---------------------------------------------------------------------------

def _span_gram_postings(df: DataFrame, id_col: str, text_col: str,
                        k: int) -> DataFrame:
    """(id, pos, gkey) — one row per token position that starts a k-gram,
    keyed by the first 16 hex chars of sha256(space-joined gram). The
    gram STRING never leaves the per-row expression: the posting carries
    a fixed-width 16-char key, so the shuffle is O(total tokens) rows of
    constant width regardless of gram length. pos is 1-based."""
    from neo4j_document_pipeline_spark.functions.textstats import col_let

    def with_toks(toks):
        n = F.size(toks)
        return F.when(
            n >= k,
            F.transform(
                F.sequence(F.lit(1), F.greatest(n - (k - 1), F.lit(1))),
                lambda i: F.substring(
                    F.sha2(F.array_join(F.slice(toks, i, k), " "), 256),
                    1, 16)),
        ).otherwise(F.array().cast("array<string>"))

    # let-bound so the per-position lambda slices a materialized token
    # array instead of re-tokenizing per position (see col_let) — this
    # is the ingest-gate hot path
    gkeys = col_let(
        F.filter(
            F.split(F.regexp_replace(F.lower(F.col(text_col)),
                                     r"[^a-z0-9]+", " "), " "),
            lambda x: x != ""),
        with_toks)
    return (
        df.select(F.col(id_col).alias("id"),
                  F.posexplode(gkeys).alias("pos0", "gkey"))
        .select("id", (F.col("pos0") + 1).cast("long").alias("pos"), "gkey")
    )


def duplicate_spans(df: DataFrame, id_col: str, text_col: str, *,
                    k: int = 8, min_count: int = 2,
                    keep: str = "none") -> DataFrame:
    """Maximal duplicated token spans per document — the exact-substring
    dedup signal of Lee et al. 2022 ("Deduplicating Training Data Makes
    Language Models Better"), re-expressed Spark-first: instead of a
    corpus suffix array, every token k-gram becomes a posting, a gram is
    *duplicated* when it occurs >= ``min_count`` times in the corpus
    (within-doc repeats count, exactly like repeated suffixes do), and
    each document's flagged positions are merged into maximal intervals
    — two flagged starts p1 < p2 merge when p2 <= p1 + k, i.e. their
    [p, p+k-1] token ranges overlap or touch, so every returned span is
    a contiguous duplicated region of >= k tokens. This catches the
    pasted paragraph / licence block / syndicated article that document-
    level (exact or MinHash) dedup can't see because the containing
    documents are unique.

    ``keep``:
    - 'none' (default): every occurrence of a duplicated gram is
      flagged — the conservative remove-all-copies policy.
    - 'first': per gram, the corpus-minimal (id, pos) occurrence is NOT
      flagged, so one copy of each duplicated region survives (Lee et
      al.'s keep-one semantics at gram granularity).

    Returns (id_col, span_start, span_end, span_tokens) with 1-based
    inclusive token positions over the normalized token stream
    (lowercase, [a-z0-9]+ — the module's shingle tokenizer).

    Scale shape: postings are one narrow pass (no explode of gram
    strings — fixed 16-char keys); duplicated-gram detection is a
    map-side-combinable count aggregate; the flag join keys on gkey
    (near-uniform sha256 keys; the duplicated side is post-filter small
    and AQE-broadcastable, and AQE skew-join splits any boilerplate hot
    gram); island merging is a per-document window (partitioned by doc,
    never global). The only O(corpus) shuffles are the gram count and
    the flag join — the same two-pass shape as the published
    suffix-array pipelines' merge step.
    """
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    if min_count < 2:
        raise ValueError(f"min_count must be >= 2, got {min_count}")
    if keep not in ("none", "first"):
        raise ValueError(f"keep must be 'none' or 'first', got {keep!r}")
    post = _span_gram_postings(df, id_col, text_col, k)
    # the per-gram min-(id,pos) aggregate only exists to exempt the
    # keep-one survivor — don't carry its map-side state on the
    # corpus-wide shuffle when keep='none' never reads it
    aggs = [F.count("*").alias("_cnt")]
    if keep == "first":
        aggs.append(F.min(F.struct("id", "pos")).alias("_first"))
    dup = post.groupBy("gkey").agg(*aggs).filter(
        F.col("_cnt") >= min_count)
    flagged = post.join(dup, "gkey")
    if keep == "first":
        flagged = flagged.filter(
            ~((F.col("id") == F.col("_first.id"))
              & (F.col("pos") == F.col("_first.pos"))))
    return spans_from_flagged(flagged.select("id", "pos"), k,
                              id_alias=id_col)


def spans_from_flagged(flagged: DataFrame, k: int, *,
                       id_alias: str = "id") -> DataFrame:
    """(id, pos) flagged k-gram start positions -> maximal merged spans
    (id_alias, span_start, span_end, span_tokens): starts p1 < p2 merge
    when p2 <= p1 + k (their [p, p+k-1] ranges overlap or touch). The
    island merge is a per-document window — shared by the standalone
    span analytics and the ingest span gate so both flag exactly the
    same regions."""
    w = Window.partitionBy("id").orderBy("pos")
    lag = F.lag("pos").over(w)
    brk = F.when(lag.isNull() | (F.col("pos") - lag > k),
                 F.lit(1)).otherwise(F.lit(0))
    islands = (flagged.withColumn("_brk", brk)
               .withColumn("_island", F.sum("_brk").over(
                   w.rowsBetween(Window.unboundedPreceding,
                                 Window.currentRow))))
    return (
        islands.groupBy("id", "_island")
        .agg(F.min("pos").alias("span_start"),
             (F.max("pos") + (k - 1)).alias("span_end"))
        .select(F.col("id").alias(id_alias), "span_start", "span_end",
                (F.col("span_end") - F.col("span_start") + 1)
                .alias("span_tokens"))
    )


def duplicate_span_stats(df: DataFrame, id_col: str, text_col: str, *,
                         k: int = 8, min_count: int = 2,
                         keep: str = "none") -> DataFrame:
    """Per-document rollup of ``duplicate_spans``: (id_col, n_tok,
    n_spans, dup_tokens, dup_frac) for EVERY input document (zero-span
    docs included) — the corpus-report form: dup_frac is the fraction
    of the document's tokens inside duplicated regions, the number the
    published dedup papers report before/after scrubbing."""
    spans = duplicate_spans(df, id_col, text_col, k=k,
                            min_count=min_count, keep=keep)
    agg = spans.groupBy(id_col).agg(
        F.count("*").alias("_n_spans"),
        F.sum("span_tokens").alias("_dup_tokens"))
    toks = F.filter(
        F.split(F.regexp_replace(F.lower(F.col(text_col)),
                                 r"[^a-z0-9]+", " "), " "),
        lambda x: x != "")
    base = df.select(F.col(id_col),
                     F.size(toks).cast("long").alias("n_tok"))
    return (
        base.join(agg, id_col, "left")
        .select(
            id_col, "n_tok",
            F.coalesce(F.col("_n_spans"), F.lit(0)).alias("n_spans"),
            F.coalesce(F.col("_dup_tokens"), F.lit(0)).alias("dup_tokens"),
            F.round(
                F.when(F.col("n_tok") > 0,
                       F.coalesce(F.col("_dup_tokens"), F.lit(0))
                       / F.col("n_tok"))
                .otherwise(F.lit(0.0)), 6).alias("dup_frac"))
    )


def strip_duplicate_spans(df: DataFrame, id_col: str, text_col: str, *,
                          k: int = 8, min_count: int = 2,
                          keep: str = "first") -> DataFrame:
    """Remove duplicated spans from the corpus: each document comes back
    as its normalized token stream minus every token inside a flagged
    span — (id_col, text_clean, n_tok, n_removed). With the default
    ``keep='first'`` one copy of each duplicated region survives (the
    Lee et al. policy); ``keep='none'`` cuts every copy. The output is
    the NORMALIZED stream (lowercase, punctuation collapsed to single
    spaces) — span positions index that stream, not raw bytes."""
    spans = duplicate_spans(df, id_col, text_col, k=k,
                            min_count=min_count, keep=keep)
    toks = F.filter(
        F.split(F.regexp_replace(F.lower(F.col(text_col)),
                                 r"[^a-z0-9]+", " "), " "),
        lambda x: x != "")
    base = df.select(F.col(id_col), toks.alias("_toks"))
    cut = spans.groupBy(id_col).agg(
        F.collect_list(F.struct("span_start", "span_end")).alias("_spans"))
    joined = base.join(cut, id_col, "left")
    def in_span(i):
        return F.exists(
            F.col("_spans"),
            lambda s: (i >= s["span_start"]) & (i <= s["span_end"]))

    kept_toks = F.when(F.col("_spans").isNull(), F.col("_toks")).otherwise(
        F.transform(
            F.filter(
                F.transform(F.col("_toks"),
                            lambda t, i0: F.struct(
                                t.alias("t"),
                                in_span(i0 + 1).alias("cut"))),
                lambda s: ~s["cut"]),
            lambda s: s["t"]))
    return joined.select(
        id_col,
        F.array_join(kept_toks, " ").alias("text_clean"),
        F.size("_toks").cast("long").alias("n_tok"),
        (F.size("_toks") - F.size(kept_toks)).cast("long")
        .alias("n_removed"))


# ---------------------------------------------------------------------------
# Semantic (embedding) benchmark decontamination
# ---------------------------------------------------------------------------

def embedding_decontam_flags(corpus: DataFrame, bench: DataFrame,
                             id_col: str, vec_col: str,
                             bench_id_col: str, bench_vec_col: str,
                             threshold: float = 0.9,
                             method: str = "broadcast",
                             n_planes: int = 12,
                             seed: int = 42) -> DataFrame:
    """SEMANTIC decontamination beside the n-gram pass
    (ngram_overlap_flags): flag corpus rows whose EMBEDDING is within
    cosine >= ``threshold`` of any benchmark row — catches the
    paraphrased/translated eval leakage that exact n-gram scrubbing
    misses (the Llama/GPT-4-report practice). Returns one row per
    FLAGGED corpus row: (id_col, bench_id, cos) with the best match
    (highest 4dp-rounded cosine, smallest bench id on ties — a total
    order, so the row is deterministic and SQL-replayable). The
    threshold compares against the ROUNDED cosine so engine/oracle
    boundary behavior is identical.

    ``method``:
    - 'broadcast' (default, exact): eval suites are small by nature —
      the bench side broadcasts and every corpus row scores all B
      bench vectors JVM-side in one narrow pass (no shuffle); per-row
      cost O(B·d). The oracle-verifiable kernel.
    - 'lsh': for when B is itself large — both sides key into the same
      random-hyperplane sign bands (embedding_near_duplicates'
      blocking, two band groups for recall), candidates = corpus ⋈
      broadcast bench band keys, exact verify after. Subset of the
      broadcast result by construction (LSH can only MISS); recall is
      pytest-checked against the exact kernel, not oracle-gated."""
    from pyspark.sql import Window
    b = bench.select(F.col(bench_id_col).alias("bench_id"),
                     F.col(bench_vec_col).alias("bv")) \
        .filter(F.col("bv").isNotNull())
    c = corpus.select(F.col(id_col), F.col(vec_col).alias("cv")) \
        .filter(F.col("cv").isNotNull())
    if method == "broadcast":
        cand = c.crossJoin(F.broadcast(b))
    elif method == "lsh":
        first = c.select("cv").first()
        if first is None:
            cand = c.crossJoin(F.broadcast(b)).limit(0)
        else:
            d = len(first[0])
            rng = np.random.RandomState(seed)
            planes = rng.normal(size=(n_planes, d))
            half = n_planes // 2

            def band_cols(vc):
                bits = []
                for p in range(n_planes):
                    dot = F.aggregate(
                        F.zip_with(vc, F.array(*[F.lit(float(x))
                                                 for x in planes[p]]),
                                   lambda a, b2: a * b2),
                        F.lit(0.0), lambda acc, x: acc + x)
                    bits.append(F.when(dot >= 0, F.lit(1)).otherwise(F.lit(0)))
                k1 = sum(bits[i] * F.lit(2 ** i) for i in range(half))
                k2 = sum(bits[half + i] * F.lit(2 ** i)
                         for i in range(n_planes - half))
                return k1, k2

            ck1, ck2 = band_cols(F.col("cv"))
            bk1, bk2 = band_cols(F.col("bv"))
            cb = c.withColumn("k1", ck1).withColumn("k2", ck2)
            bb = b.withColumn("k1", bk1).withColumn("k2", bk2)
            cand = None
            for kc in ("k1", "k2"):
                side = bb.select(F.col(kc).alias("_k"), "bench_id", "bv")
                p = (cb.select(F.col(kc).alias("_k"), id_col, "cv")
                     .join(F.broadcast(side), "_k").drop("_k"))
                cand = p if cand is None else cand.unionByName(p)
            cand = cand.dropDuplicates([id_col, "bench_id"])
    else:
        raise ValueError(f"unknown method {method!r} "
                         "(have 'broadcast', 'lsh')")
    dot = F.aggregate(F.zip_with("cv", "bv", lambda a, b2: a * b2),
                      F.lit(0.0), lambda acc, x: acc + x)
    na = F.sqrt(F.aggregate("cv", F.lit(0.0), lambda acc, x: acc + x * x))
    nb = F.sqrt(F.aggregate("bv", F.lit(0.0), lambda acc, x: acc + x * x))
    scored = cand.withColumn(
        "cos", F.round(F.when((na == 0) | (nb == 0), F.lit(0.0))
                       .otherwise(dot / (na * nb)), 4))
    w = Window.partitionBy(id_col).orderBy(F.col("cos").desc(), "bench_id")
    return (scored.filter(F.col("cos") >= threshold)
            .withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") == 1)
            .select(id_col, "bench_id", "cos"))


def jaccard_decontam_flags(docs: DataFrame, bench: DataFrame,
                           id_col: str, text_col: str, *,
                           shingle_words: int = 3,
                           threshold: float = 0.5,
                           broadcast_bench: bool = True) -> DataFrame:
    """FUZZY decontamination: flag training documents whose word
    n-gram shingle set is near-duplicate (Jaccard >= ``threshold``)
    to ANY benchmark document — the whole-document companion to
    ``ngram_overlap_flags`` (which scores gram-level leakage; this
    catches lightly-edited full copies of eval items, the case a
    13-gram hit-count understates when the paraphrase breaks most
    grams but the doc is still the eval row).

    Returns one row per ``docs`` row: (id_col, n_grams, bench_id,
    jaccard, flagged). ``bench_id`` is the best-matching benchmark
    document (highest Jaccard; ties -> the greatest bench id — the
    argmax-struct tie rule) or NULL when the document shares no
    shingle with any bench doc (then jaccard = 0.0). Exact by
    construction, NOT an LSH estimate: J > 0 requires a shared
    shingle, so the inverted shingle join misses no candidate, and
    the per-pair Jaccard is computed from true distinct-gram counts.

    Scale shape: the bench side is an eval registry (tiny by nature)
    — its (gram -> bench doc) postings broadcast, so the corpus-sized
    gram stream is probed narrowly and only true co-shingle pairs
    reach the (id, bench_id) hash aggregate; volume is bounded by
    bench postings × their corpus hit counts, not corpus².
    ``broadcast_bench=False`` falls back to a shuffled hash join for
    a pathologically large registry (or switch to the Bloom-prefilter
    pattern of ``ngram_overlap_flags_bloom``)."""
    if shingle_words < 1:
        raise ValueError(f"shingle_words must be >= 1, got {shingle_words}")
    if not (0.0 < threshold <= 1.0):
        raise ValueError(f"threshold must be in (0, 1], got {threshold}")

    def gram_arr(c):
        return _word_gram_arr(c, shingle_words)

    bg = bench.select(F.col(id_col).alias("bench_id"),
                      gram_arr(F.col(text_col)).alias("_bg"))
    bpost = bg.select("bench_id", F.size("_bg").alias("bn"),
                      F.explode("_bg").alias("gram"))
    if broadcast_bench:
        bpost = F.broadcast(bpost)
    # grams materialized ONCE per row (size + explode read the
    # projected array)
    dg = (docs.select(F.col(id_col),
                      gram_arr(F.col(text_col)).alias("_g"))
          .select(F.col(id_col), F.size("_g").alias("n_grams"),
                  F.explode_outer("_g").alias("gram")))
    shared = (dg.join(bpost, "gram")
              .groupBy(id_col, "bench_id")
              .agg(F.max("n_grams").alias("n_grams"),
                   F.max("bn").alias("bn"),
                   F.count("*").alias("inter")))
    jac = F.col("inter") / (F.col("n_grams") + F.col("bn")
                            - F.col("inter"))
    best = (shared.withColumn("jaccard", jac)
            .groupBy(id_col)
            .agg(F.max(F.struct(F.col("jaccard"),
                                F.col("bench_id"))).alias("_b"))
            .select(id_col, F.col("_b.bench_id").alias("bench_id"),
                    F.col("_b.jaccard").alias("jaccard")))
    base = docs.select(F.col(id_col),
                       F.size(gram_arr(F.col(text_col))).alias("n_grams"))
    out = base.join(best, id_col, "left")
    j = F.coalesce(F.col("jaccard"), F.lit(0.0))
    return out.select(
        id_col, "n_grams", "bench_id", j.alias("jaccard"),
        (j >= F.lit(float(threshold))).alias("flagged"))


# ---------------------------------------------------------------------------
# Prefix-filtered exact set-similarity join (SSJoin / PPJoin prefix filter)
# ---------------------------------------------------------------------------

def prefix_filter_jaccard_pairs(df: DataFrame, id_col: str, text_col: str,
                                threshold: float = 0.4) -> DataFrame:
    """EXACT token-set Jaccard pairs at a threshold via the PREFIX
    FILTER (SSJoin, Chaudhuri/Ganti/Kaushik ICDE 2006; PPJoin, Xiao et
    al. WWW 2008) — the scalable exact similarity join.

    Where ``ngram_jaccard_exact`` joins postings on EVERY shared
    shingle (hot boilerplate tokens multiply the candidate set),
    this operator orders each record's distinct tokens by GLOBAL
    frequency ascending (rarest first, ties by token string — one
    canonical total order) and joins only on each record's PREFIX of
    length ``|s| - ceil(t*|s|) + 1``. The prefix filter is LOSSLESS
    for Jaccard >= t (Xiao et al. lemma 1: two sets with overlap
    >= ceil(t*max(|x|,|y|)) under a common total order must share a
    prefix token), so the exact verify step sees every qualifying
    pair — output is identical to the exhaustive join, but candidate
    generation touches only the rarest slice of each posting list:
    the hottest tokens land in SUFFIXES by construction, which is the
    skew bound. A symmetric length filter (``t*|x| <= |y|``) prunes
    pairs whose sizes alone forbid J >= t.

    FP guard: ``ceil(t*n)`` is computed as ``ceil(round(t*n, 9))`` so
    a 1-ulp excursion above an exact integer (0.4*5 = 2.0000...04)
    cannot shorten a prefix below its lossless length; the length
    filter compares against the same rounded product.

    Returns (id1, id2, n1, n2, jaccard) for pairs with jaccard >=
    threshold, id1 < id2. Empty-token docs yield no pairs.

    Scale: one agg for global token counts (map-combinable), one
    shuffle to order tokens per doc, candidate join on prefix tokens
    only, exact array verify JVM-side. No LSH recall caveat — this is
    the exact path that survives boilerplate-heavy corpora."""
    from neo4j_document_pipeline_spark.functions.textstats import col_tokens

    t = float(threshold)
    if not (0.0 < t <= 1.0):
        raise ValueError(f"threshold must be in (0, 1], got {threshold}")

    toks = df.select(
        F.col(id_col).alias("id"),
        F.array_distinct(col_tokens(F.col(text_col))).alias("toks"))
    posting = toks.select("id", F.explode("toks").alias("tok"))
    freq = posting.groupBy("tok").agg(F.count("*").alias("tf"))
    # canonical global order: frequency ascending, ties by token text
    ordered = (posting.join(freq, "tok")
               .groupBy("id")
               .agg(F.transform(
                   F.array_sort(F.collect_list(
                       F.struct(F.col("tf"), F.col("tok")))),
                   lambda s: s["tok"]).alias("sorted_toks")))
    n = F.size("sorted_toks")
    need = F.ceil(F.round(F.lit(t) * n, 9)).cast("int")
    pre = ordered.select(
        "id", n.alias("n"),
        F.slice("sorted_toks", 1, (n - need + 1)).alias("prefix"))
    cand = pre.select("id", "n", F.explode("prefix").alias("tok"))
    c1 = cand.select(F.col("id").alias("id1"), F.col("n").alias("n1"),
                     "tok")
    c2 = cand.select(F.col("id").alias("id2"), F.col("n").alias("n2"),
                     "tok")
    pairs = (c1.join(c2, "tok")
             .filter((F.col("id1") < F.col("id2"))
                     & (F.col("n2") >= F.round(F.lit(t) * F.col("n1"), 9))
                     & (F.col("n1") >= F.round(F.lit(t) * F.col("n2"), 9)))
             .select("id1", "id2").distinct())
    s1 = toks.select(F.col("id").alias("id1"), F.col("toks").alias("t1"))
    s2 = toks.select(F.col("id").alias("id2"), F.col("toks").alias("t2"))
    inter = F.size(F.array_intersect("t1", "t2"))
    union = F.size(F.array_union("t1", "t2"))
    return (pairs.join(s1, "id1").join(s2, "id2")
            .withColumn("jaccard",
                        F.when(union > 0, inter / union)
                        .otherwise(F.lit(0.0)))
            .filter(F.col("jaccard") >= t)
            .select("id1", "id2", F.size("t1").alias("n1"),
                    F.size("t2").alias("n2"), "jaccard"))


def _prefix_candidate_count(df: DataFrame, id_col: str, text_col: str,
                            threshold: float) -> int:
    """Candidate-pair count the prefix filter generates (pre-verify) —
    the instrumentation hook the pruning test asserts against the full
    shared-token candidate count. Not a production API."""
    from neo4j_document_pipeline_spark.functions.textstats import col_tokens

    t = float(threshold)
    toks = df.select(
        F.col(id_col).alias("id"),
        F.array_distinct(col_tokens(F.col(text_col))).alias("toks"))
    posting = toks.select("id", F.explode("toks").alias("tok"))
    freq = posting.groupBy("tok").agg(F.count("*").alias("tf"))
    ordered = (posting.join(freq, "tok")
               .groupBy("id")
               .agg(F.transform(
                   F.array_sort(F.collect_list(
                       F.struct(F.col("tf"), F.col("tok")))),
                   lambda s: s["tok"]).alias("sorted_toks")))
    n = F.size("sorted_toks")
    need = F.ceil(F.round(F.lit(t) * n, 9)).cast("int")
    pre = ordered.select(
        "id", F.slice("sorted_toks", 1, (n - need + 1)).alias("prefix"))
    cand = pre.select("id", F.explode("prefix").alias("tok"))
    c1 = cand.select(F.col("id").alias("id1"), "tok")
    c2 = cand.select(F.col("id").alias("id2"), "tok")
    return (c1.join(c2, "tok").filter(F.col("id1") < F.col("id2"))
            .select("id1", "id2").distinct().count())


def latest_snapshot_per_url(df: DataFrame, url_col: str, ts_col: str, *,
                            tiebreak_col: str | None = None) -> DataFrame:
    """Recrawl dedup: keep ONE row per NORMALIZED url — the newest
    snapshot. A Common-Crawl-style corpus carries the same page many
    times (recrawls, tracking-parameter variants, fragment links,
    scheme/host case); training on all of them is url-level duplication
    that text dedup only partially catches because boilerplate shifts
    between crawls. Output = the surviving input rows plus ``url_norm``
    (the group key, from ``col_normalize_url`` — the engine's
    SQL-replayable canonicalization).

    Selection: max(struct(ts, tiebreak, row)) per url_norm — a
    map-combinable argmax, so hot urls partial-aggregate instead of
    serializing through a window sort (the same shape as the ingest
    path's last-write-wins props). NULL timestamps lose to any real
    timestamp. Ties on the timestamp break on ``tiebreak_col`` when
    given, else on sha256 of the JSON of the whole row — an arbitrary
    but TOTAL deterministic order, so two equal-ts snapshots pick the
    same winner on any partitioning, cluster size, or engine.
    """
    from neo4j_document_pipeline_spark.functions.textstats import (
        col_normalize_url)
    cols = df.columns
    if tiebreak_col is not None and tiebreak_col not in cols:
        raise ValueError(
            f"latest_snapshot_per_url: tiebreak_col {tiebreak_col!r} "
            f"not in columns {cols}")
    row = F.struct(*[F.col(c) for c in cols])
    tb = (F.col(tiebreak_col) if tiebreak_col is not None
          else F.sha2(F.to_json(row), 256))
    # ordering key: (ts, tiebreak, sha-of-row-json) — the trailing row
    # hash makes the key TOTAL and deterministic even when an explicit
    # tiebreak_col ties across different rows, and max_by never orders
    # the payload struct itself (a max(struct(..., row)) would fail to
    # plan whenever any column is non-orderable, e.g. a map)
    key = F.struct(F.col(ts_col).alias("_ts"), tb.alias("_tb"),
                   F.sha2(F.to_json(row), 256).alias("_tb2"))
    base = df.select(col_normalize_url(F.col(url_col)).alias("url_norm"),
                     key.alias("_key"), row.alias("_row"))
    kept = (base.filter(F.col("url_norm").isNotNull())
            .groupBy("url_norm").agg(F.max_by("_row", "_key").alias("_row"))
            .select("url_norm", "_row.*"))
    # rows with no url pass through untouched: collapsing every
    # NULL-url row into one "newest" survivor would silently discard
    # unrelated documents that merely lack a url
    null_rows = (base.filter(F.col("url_norm").isNull())
                 .select("url_norm", "_row.*"))
    return kept.unionByName(null_rows)


def containment_pairs(df: DataFrame, id_col: str, text_col: str,
                      threshold: float = 0.8) -> DataFrame:
    """EXACT asymmetric CONTAINMENT pairs: ordered (a, b) with
    |tokens(a) ∩ tokens(b)| / |tokens(a)| >= threshold — the near-dup
    relation Jaccard structurally misses. A page quoting a paragraph,
    a syndicated article re-wrapped in a bigger boilerplate shell, a
    recrawl that appended a comment section: the small side is ~fully
    inside the big side while Jaccard (which divides by the UNION)
    drops below any usable threshold as the size ratio grows. Corpus
    hygiene needs both relations: Jaccard for same-size near-dups,
    containment for quote/wrapper/superset chains.

    Candidate generation is the containment prefix filter (the
    T-occurrence bound of SSJoin, Chaudhuri/Ganti/Kaushik ICDE 2006):
    if |A∩B| >= ceil(t·|A|) then A misses at most |A| - ceil(t·|A|)
    of its OWN tokens, so at least one of A's first
    |A| - ceil(t·|A|) + 1 tokens (under any fixed order of A's set)
    is in B — joining A's PREFIX against B's FULL postings is
    lossless. The order is global frequency ascending (ties by token
    text), so A's prefix holds its RAREST tokens and the B posting
    lists it probes are the short ones; hot boilerplate tokens sit in
    A-suffixes and are never join keys. The size filter
    |B| >= ceil(t·|A|) prunes pairs the intersection bound already
    forbids. Same 1-ulp guard as the Jaccard twin: ceil(round(t·n, 9)).

    Returns (id_a, id_b, n_a, n_b, containment) for ordered pairs
    id_a != id_b with containment >= threshold; empty-token docs never
    qualify (their containment is undefined, not 1).
    """
    from neo4j_document_pipeline_spark.functions.textstats import col_tokens

    t = float(threshold)
    if not (0.0 < t <= 1.0):
        raise ValueError(f"threshold must be in (0, 1], got {threshold}")

    toks = df.select(
        F.col(id_col).alias("id"),
        F.array_distinct(col_tokens(F.col(text_col))).alias("toks"))
    posting = toks.select("id", F.explode("toks").alias("tok"))
    freq = posting.groupBy("tok").agg(F.count("*").alias("tf"))
    ordered = (posting.join(freq, "tok")
               .groupBy("id")
               .agg(F.transform(
                   F.array_sort(F.collect_list(
                       F.struct(F.col("tf"), F.col("tok")))),
                   lambda s: s["tok"]).alias("sorted_toks")))
    n = F.size("sorted_toks")
    need = F.ceil(F.round(F.lit(t) * n, 9)).cast("int")
    pre = ordered.select(
        "id", n.alias("n"),
        F.slice("sorted_toks", 1, (n - need + 1)).alias("prefix"))
    ca = pre.select(F.col("id").alias("id_a"), F.col("n").alias("n_a"),
                    F.explode("prefix").alias("tok"))
    cb = posting.select(F.col("id").alias("id_b"), "tok")
    pairs = (ca.join(cb, "tok")
             .filter(F.col("id_a") != F.col("id_b"))
             .select("id_a", "id_b", "n_a").distinct()
             # size bound: |B| >= ceil(t*|A|)
             .join(toks.select(F.col("id").alias("id_b"),
                               F.size("toks").alias("n_b")), "id_b")
             .filter(F.col("n_b") >= F.round(F.lit(t) * F.col("n_a"), 9)))
    sa = toks.select(F.col("id").alias("id_a"), F.col("toks").alias("ta"))
    sb = toks.select(F.col("id").alias("id_b"), F.col("toks").alias("tb"))
    inter = F.size(F.array_intersect("ta", "tb"))
    return (pairs.join(sa, "id_a").join(sb, "id_b")
            .withColumn("containment",
                        F.when(F.col("n_a") > 0, inter / F.col("n_a"))
                        .otherwise(F.lit(0.0)))
            .filter(F.col("containment") >= t)
            .select("id_a", "id_b", "n_a", "n_b", "containment"))
