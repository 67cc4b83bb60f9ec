"""Mergeable data sketches — KMV (distinct counts), count-min
(frequencies), and Bloom filters (membership).

The KMV / bottom-k sketch estimates a group's distinct count from the
k smallest hash values it has ever seen: if k uniform draws occupy
[0, h_k], there are ≈ (k-1)/h_k distinct values in total. Its defining
property is MERGEABILITY — union the two bottom-k sets, keep the k
smallest again — which is what lets a 1000-executor cluster sketch each
partition independently and combine results without a global distinct
(Bar-Yossef et al. 2002, the construction theta sketches generalize).

Unlike library HLL implementations, this sketch is a pure DETERMINISTIC
function of the data (the engine's sha256 uniform hash,
``sampling.uniform_hash_col``), so the same sketch is produced on any
partitioning, cluster size, or engine — a plain-SQL oracle reproduces
it bit-for-bit, and two teams sketching the same table can compare
sketches byte-wise.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from neo4j_document_pipeline_spark.operators.sampling import (
    uniform_hash_col,
)


def _finish(agg: DataFrame, k: int) -> DataFrame:
    est = F.when(F.col("n_min") < k, F.col("n_min").cast("double")) \
        .otherwise(F.lit(float(k - 1)) / F.element_at("sketch", -1))
    return agg.withColumn("estimate", est)


def kmv_sketch(df: DataFrame, group_cols: str | list[str],
               value_col: str, k: int = 64,
               salt: str = "v1") -> DataFrame:
    """Per-group KMV distinct-count sketch -> (group_cols…, sketch =
    ascending array of the k smallest normalized hashes, n_min =
    len(sketch), estimate). Fewer than k distinct values makes the
    sketch exhaustive and the estimate EXACT (= n_min); at k or more
    the estimate is (k-1)/h_k with relative error ≈ 1/sqrt(k-2).

    NULL values are ignored (SQL COUNT DISTINCT semantics). ``salt``
    keys the hash — sketches are only comparable/mergeable under the
    same salt and k.

    Shape: distinct (group, hash) — one hash aggregate — then a
    per-group window keeping ranks <= k and one collect into the
    bounded array. The window sorts each group's distinct hashes; for
    extreme per-group cardinality swap it for a partial bottom-k
    aggregate (merge per-partition sketches with ``kmv_merge`` — the
    sketch is mergeable precisely so that works) without changing any
    output bit.
    """
    if k < 2:
        raise ValueError(f"k must be >= 2, got {k}")
    groups = [group_cols] if isinstance(group_cols, str) \
        else list(group_cols)
    h = (df.filter(F.col(value_col).isNotNull())
         .select(*groups, uniform_hash_col(value_col, salt).alias("u"))
         .distinct())
    w = Window.partitionBy(*groups).orderBy("u")
    agg = (
        h.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= k)
        .groupBy(*groups)
        .agg(F.array_sort(F.collect_list("u")).alias("sketch"),
             F.count("*").alias("n_min"))
    )
    return _finish(agg, k)


def kmv_merge(sketches: DataFrame, group_cols: str | list[str],
              k: int) -> DataFrame:
    """Merge KMV sketches (same salt, same k): union the hash sets per
    group, keep the k smallest again, re-derive the estimate. By
    construction ``kmv_merge(sketch(A) ∪ sketch(B)) == sketch(A ∪ B)``
    bit-for-bit — the distributive property that lets sketches roll up
    across partitions, days, or tables without touching raw data."""
    if k < 2:
        raise ValueError(f"k must be >= 2, got {k}")
    groups = [group_cols] if isinstance(group_cols, str) \
        else list(group_cols)
    h = (sketches.select(*groups, F.explode("sketch").alias("u"))
         .distinct())
    w = Window.partitionBy(*groups).orderBy("u")
    agg = (
        h.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= k)
        .groupBy(*groups)
        .agg(F.array_sort(F.collect_list("u")).alias("sketch"),
             F.count("*").alias("n_min"))
    )
    return _finish(agg, k)


def kmv_sliding_distinct(events: DataFrame, value_col: str,
                         ts_col: str = "ts",
                         window_sec: int = 3600, slide_sec: int = 900,
                         group_cols: str | list[str] | None = None,
                         k: int = 64, salt: str = "v1") -> DataFrame:
    """Distinct-count estimates over SLIDING time windows from
    per-bucket KMV sketches -> (win_start_sec [, group_cols…], n_min,
    estimate): window [w, w + window_sec) counts distinct ``value_col``
    among events whose timestamp falls inside it, for every
    slide-aligned w that has data.

    This is the mergeable property doing its job on the time axis: raw
    rows are sketched ONCE into window_sec/slide_sec-aligned buckets
    (bottom-k per bucket), and each sliding window's sketch is the
    MERGE of its constituent buckets — merge(bottom-k sets) ==
    bottom-k(union) bit-for-bit, so the window estimates are EXACTLY
    what sketching each window from raw would give, while every raw row
    is read once and contributes to one bucket instead of
    window/slide overlapping windows. The trailing-distinct-users
    dashboard query at stream scale (same trick HLL-based systems use;
    deterministic here, so a plain-SQL oracle reproduces every bit).

    ``window_sec`` must be a multiple of ``slide_sec`` (buckets must
    tile windows exactly). NULL values/timestamps are ignored.

    Shape: one distinct + bottom-k per bucket (rows ~ min(k, distinct)
    per bucket), an explode by window/slide assignments (bounded fan-out
    R = window/slide on SKETCH rows, never raw rows), one bottom-k per
    window."""
    if window_sec <= 0 or slide_sec <= 0:
        raise ValueError("window_sec and slide_sec must be positive")
    if window_sec % slide_sec:
        raise ValueError(f"window_sec ({window_sec}) must be a multiple "
                         f"of slide_sec ({slide_sec}) so buckets tile "
                         "windows exactly")
    if k < 2:
        raise ValueError(f"k must be >= 2, got {k}")
    groups = [] if group_cols is None else (
        [group_cols] if isinstance(group_cols, str) else list(group_cols))
    r = window_sec // slide_sec
    bucket = (F.floor(F.unix_timestamp(F.col(ts_col).cast("timestamp"))
                      / slide_sec) * slide_sec).alias("bucket_sec")
    h = (events.filter(F.col(value_col).isNotNull()
                       & F.col(ts_col).isNotNull())
         .select(bucket, *groups,
                 uniform_hash_col(value_col, salt).alias("u"))
         .distinct())
    wb = Window.partitionBy("bucket_sec", *groups).orderBy("u")
    bucket_sk = (h.withColumn("_rn", F.row_number().over(wb))
                 .filter(F.col("_rn") <= k).drop("_rn"))
    # each bucket b serves windows starting at b, b - slide, ...,
    # b - (r-1)*slide — explode the bounded assignment on sketch rows
    assigned = bucket_sk.select(
        F.explode(F.sequence(
            F.col("bucket_sec") - (r - 1) * slide_sec,
            F.col("bucket_sec"), F.lit(slide_sec))).alias("win_start_sec"),
        *groups, "u")
    ww = Window.partitionBy("win_start_sec", *groups).orderBy("u")
    agg = (assigned.dropDuplicates(["win_start_sec", *groups, "u"])
           .withColumn("_rn", F.row_number().over(ww))
           .filter(F.col("_rn") <= k)
           .groupBy("win_start_sec", *groups)
           .agg(F.array_sort(F.collect_list("u")).alias("sketch"),
                F.count("*").alias("n_min")))
    return (_finish(agg, k)
            .select("win_start_sec", *groups, "n_min", "estimate"))


def hash_sample_quantiles(df: DataFrame, value_col: str,
                          probs: list[float], id_col: str,
                          rate: float = 0.01,
                          salt: str = "v1") -> DataFrame:
    """Approximate quantiles from a DETERMINISTIC hash sample ->
    (p, n_sample, value): the value at rank ceil(p·n) of the sample
    drawn by ``uniform_hash(id) < rate`` — the same pure-function-of-
    the-data draw the engine's sampling/sketch family uses, so the
    quantile estimates are identical on any partitioning, cluster
    size, or engine (a plain-SQL oracle reproduces them exactly),
    unlike approx_percentile whose sketch is partitioning-dependent.

    Rank semantics are the discrete (type-1) quantile over the sample;
    sampling error follows the usual DKW bound (~sqrt(ln(2/δ)/2m) on
    the CDF for sample size m). NULL values are excluded; duplicate
    sample ids are an error surface left to the caller (ids feed the
    draw, values the ranks — tie-broken on id so the picked ROW is
    deterministic even when values repeat).

    Scale: the full table sees one narrow filter (the hash predicate);
    only the m ≈ rate·n sample rows pass through the rank window —
    size the rate so m stays ~10^5-10^6 and the single-partition rank
    of the SAMPLE is trivial (the same bounded-sample contract as the
    ANN quantizer trainer)."""
    if not probs:
        raise ValueError("hash_sample_quantiles: probs must be non-empty")
    for p in probs:
        if not (0.0 < float(p) <= 1.0):
            raise ValueError(f"prob {p!r} outside (0, 1]")
    if not (0.0 < rate <= 1.0):
        raise ValueError(f"rate {rate!r} outside (0, 1]")
    spark = df.sparkSession
    sample = (df.filter(F.col(value_col).isNotNull())
              .filter(uniform_hash_col(id_col, salt) < rate)
              .select(F.col(value_col).alias("value"),
                      F.col(id_col).alias("_id")))
    w = Window.orderBy("value", "_id")
    ranked = (sample.withColumn("rn", F.row_number().over(w))
              .withColumn("n_sample", F.count("*").over(
                  Window.partitionBy())))
    pdf = spark.createDataFrame([(float(p),) for p in sorted(set(probs))],
                                "p double")
    return (ranked.join(
        pdf, F.col("rn") == F.ceil(F.col("p") * F.col("n_sample")))
        .select("p", "n_sample", "value"))


# ---------------------------------------------------------------------------
# Count-min sketch (mergeable frequency estimation)
# ---------------------------------------------------------------------------

def _cms_bucket(value_col: str, row: int, width: int, salt: str):
    """Bucket of hash row ``row``: the first 15 hex digits (60 bits) of
    sha256('<salt>:<row>:<value>') mod width — JVM-side, reproducible
    verbatim in any engine with sha256 (the oracle computes the
    identical expression)."""
    h = F.sha2(F.concat(F.lit(f"{salt}:{row}:"),
                        F.col(value_col).cast("string")), 256)
    return (F.conv(F.substring(h, 1, 15), 16, 10).cast("long")
            % F.lit(int(width)))


def cms_sketch(df: DataFrame, group_cols: str | list[str],
               value_col: str, *, depth: int = 4, width: int = 256,
               salt: str = "v1", weight_col: str | None = None
               ) -> DataFrame:
    """Per-group count-min sketch (Cormode & Muthukrishnan 2005) in
    SPARSE form: one row per non-zero cell, (group_cols…, r, b, cnt)
    with cnt = Σ weight of the values hashing to bucket ``b`` under
    hash row ``r``. The frequency-estimation companion to the KMV
    distinct sketch: a point query's estimate (``cms_point_estimate``)
    is min over rows of its cell count — never an underestimate, and
    within ε·N of the truth w.h.p. for width ≈ e/ε.

    Deterministic BY CONSTRUCTION in a way register-based libraries are
    not: the cells are plain integer sums over sha256 buckets — a pure
    aggregation, so the sketch is identical on any partitioning,
    cluster size, or engine, and MERGEABLE by adding cells
    (``cms_merge``: cms(A) + cms(B) == cms(A ∪ B) exactly, by
    linearity). NULL values are ignored; ``weight_col`` switches from
    occurrence counting to weighted totals.

    Scale shape: one map-side-combinable hash aggregation over
    depth × |rows| exploded postings with bounded key cardinality
    (groups × depth × width) — no window, no distinct, no shuffle
    beyond the single agg; this is the operator that answers "how hot
    is key x per group" at 100 TB without a groupBy over raw keys."""
    if depth < 1:
        raise ValueError(f"depth must be >= 1, got {depth}")
    if width < 2:
        raise ValueError(f"width must be >= 2, got {width}")
    groups = [group_cols] if isinstance(group_cols, str) \
        else list(group_cols)
    w = F.col(weight_col).cast("long") if weight_col else F.lit(1)
    pairs = F.array(*[
        F.struct(F.lit(r).cast("long").alias("r"),
                 _cms_bucket(value_col, r, width, salt).alias("b"))
        for r in range(depth)
    ])
    return (
        df.filter(F.col(value_col).isNotNull())
        .select(*groups, F.explode(pairs).alias("_rb"), w.alias("_w"))
        .groupBy(*groups, F.col("_rb.r").alias("r"),
                 F.col("_rb.b").alias("b"))
        .agg(F.sum("_w").alias("cnt"))
    )


def cms_merge(cells: DataFrame, group_cols: str | list[str]) -> DataFrame:
    """Merge sketches built under the SAME (depth, width, salt): add
    cell counts — exact by linearity, so merging per-partition or
    per-day sketches equals sketching the union."""
    groups = [group_cols] if isinstance(group_cols, str) \
        else list(group_cols)
    return cells.groupBy(*groups, "r", "b").agg(F.sum("cnt").alias("cnt"))


def _bloom_pos(value_col: str, i: int, m_bits: int, salt: str):
    """Bit position of hash function ``i``: the first 15 hex digits
    (60 bits) of sha256('<salt>:b<i>:<value>') mod m_bits — the same
    reproducible-hash construction as ``_cms_bucket`` under a disjoint
    key prefix (``b<i>`` vs ``<i>``), so building a Bloom filter and a
    CMS under one salt never correlates their hash families."""
    h = F.sha2(F.concat(F.lit(f"{salt}:b{i}:"),
                        F.col(value_col).cast("string")), 256)
    return (F.conv(F.substring(h, 1, 15), 16, 10).cast("long")
            % F.lit(int(m_bits)))


def _bloom_words(groups: list[str], positioned: DataFrame) -> DataFrame:
    mask = F.expr("shiftleft(cast(1 as bigint), cast(_p % 32 as int))")
    return (positioned
            .select(*groups, F.floor(F.col("_p") / 32).alias("w"),
                    mask.alias("_m"))
            .groupBy(*groups, "w")
            .agg(F.bit_or("_m").alias("bits")))


def bloom_sketch(df: DataFrame, group_cols: str | list[str],
                 value_col: str, *, m_bits: int = 1024,
                 k_hashes: int = 4, salt: str = "v1") -> DataFrame:
    """Per-group Bloom filter (Bloom 1970) in SPARSE packed form: one
    row per non-empty 32-bit word, (group_cols…, w, bits) with ``bits``
    the OR of ``1 << (pos % 32)`` over every hashed bit position ``pos``
    falling in word ``w = pos // 32``. The MEMBERSHIP companion to the
    engine's KMV (cardinality) and CMS (frequency) sketches: a key is
    reported present iff all ``k_hashes`` of its bit positions are set
    (``bloom_contains``) — no false negatives ever, false positives at
    ≈ (1 - e^(-k·n/m))^k for n inserted keys.

    Deterministic BY CONSTRUCTION: bit positions are sha256 of the
    value (``_bloom_pos``), and the words are a plain bit_or
    aggregation — identical on any partitioning, cluster size, or
    engine (the oracle replays every bit), and MERGEABLE by OR-ing
    words (``bloom_merge``: bloom(A) | bloom(B) == bloom(A ∪ B)
    exactly, by idempotent-OR linearity). NULL values are ignored.

    This is the build side of the scalable semi-join: sketch the small
    relation's keys per group, broadcast the O(m_bits/8)-byte filter,
    and pre-filter a 100-TB probe side down to definite-misses-removed
    before the exact join — the same shape runtime row-level filtering
    uses, here as an explicit, persistable, mergeable artifact (e.g. a
    benchmark-membership filter shipped to every decontamination run).

    Scale shape: one map-side-combinable hash aggregation over
    k_hashes × |rows| exploded postings with bounded key cardinality
    (groups × m_bits/32) — no window, no distinct, one shuffle."""
    if m_bits < 2:
        raise ValueError(f"m_bits must be >= 2, got {m_bits}")
    if k_hashes < 1:
        raise ValueError(f"k_hashes must be >= 1, got {k_hashes}")
    groups = [group_cols] if isinstance(group_cols, str) \
        else list(group_cols)
    pos = F.array(*[_bloom_pos(value_col, i, m_bits, salt)
                    for i in range(k_hashes)])
    positioned = (df.filter(F.col(value_col).isNotNull())
                  .select(*groups, F.explode(pos).alias("_p")))
    return _bloom_words(groups, positioned)


def bloom_merge(words: DataFrame,
                group_cols: str | list[str]) -> DataFrame:
    """Merge Bloom filters built under the SAME (m_bits, k_hashes,
    salt): OR the words per group — exact by idempotent-OR linearity,
    so merging per-partition or per-day filters equals building one
    filter over the union."""
    groups = [group_cols] if isinstance(group_cols, str) \
        else list(group_cols)
    return (words.groupBy(*groups, "w")
            .agg(F.bit_or("bits").alias("bits")))


def bloom_contains(words: DataFrame, keys: DataFrame,
                   group_cols: str | list[str], value_col: str, *,
                   m_bits: int = 1024, k_hashes: int = 4,
                   salt: str = "v1") -> DataFrame:
    """Probe the filter: for each (group, value) row of ``keys``,
    member = every one of the value's ``k_hashes`` bit positions is set
    in the group's filter (an absent word means unset bits). member =
    false is DEFINITE absence; member = true is presence up to the
    filter's false-positive rate. Parameters must match the sketch's.

    Shape: k_hashes probe rows per key, one equi-join on (group, word)
    against the sparse words (broadcast-sized for any real m_bits), one
    bool_and aggregate back to keys."""
    if m_bits < 2:
        raise ValueError(f"m_bits must be >= 2, got {m_bits}")
    if k_hashes < 1:
        raise ValueError(f"k_hashes must be >= 1, got {k_hashes}")
    groups = [group_cols] if isinstance(group_cols, str) \
        else list(group_cols)
    pos = F.array(*[_bloom_pos(value_col, i, m_bits, salt)
                    for i in range(k_hashes)])
    mask = F.expr("shiftleft(cast(1 as bigint), cast(_p % 32 as int))")
    probes = (keys
              .select(*groups, F.col(value_col),
                      F.explode(pos).alias("_p"))
              .select(*groups, value_col,
                      F.floor(F.col("_p") / 32).alias("w"),
                      mask.alias("_m")))
    joined = probes.join(words, [*groups, "w"], "left")
    hit = F.coalesce(
        F.col("bits").bitwiseAND(F.col("_m")) != 0, F.lit(False))
    return (joined.groupBy(*groups, value_col)
            .agg(F.bool_and(hit).alias("member")))


def cms_point_estimate(cells: DataFrame, keys: DataFrame,
                       group_cols: str | list[str], value_col: str, *,
                       depth: int = 4, width: int = 256,
                       salt: str = "v1") -> DataFrame:
    """Point-query the sketch: for each (group, value) row of ``keys``,
    estimate = min over hash rows of that row's cell count (0 when a
    cell is absent — the value was never seen in that row's bucket).
    One broadcast-sized join per key row; parameters must match the
    sketch's."""
    groups = [group_cols] if isinstance(group_cols, str) \
        else list(group_cols)
    probes = keys.select(
        *groups, F.col(value_col),
        F.explode(F.array(*[
            F.struct(F.lit(r).cast("long").alias("r"),
                     _cms_bucket(value_col, r, width, salt).alias("b"))
            for r in range(depth)
        ])).alias("_rb"),
    ).select(*groups, value_col, F.col("_rb.r").alias("r"),
             F.col("_rb.b").alias("b"))
    joined = probes.join(cells, [*groups, "r", "b"], "left") \
        .withColumn("cnt", F.coalesce(F.col("cnt"), F.lit(0)))
    return (joined.groupBy(*groups, value_col)
            .agg(F.min("cnt").alias("estimate")))


# ---------------------------------------------------------------------------
# Corpus sketch state (O(delta)-maintained at ingest)
# ---------------------------------------------------------------------------

CORPUS_SKETCHES = "corpus_sketches"
SKETCH_CMS_DEPTH = 4
SKETCH_CMS_WIDTH = 1024
SKETCH_KMV_K = 256
SKETCH_BLOOM_BITS = 1 << 16
SKETCH_BLOOM_HASHES = 4
SKETCH_SALT = "v1"


def corpus_sketches_from_docs(documents: DataFrame) -> DataFrame:
    """The corpus's three sketches over the documents frame, unified
    into ONE bounded state table -> (kind, r, b, v, u):

    - ``cms_tokens``  (r, b, v=count): token-frequency count-min over
      the corpus vocabulary — per-term hotness at O(depth × width) state;
      the v-sum of any single hash row is the EXACT total token count.
    - ``kmv_vocab``   (u=hash): bottom-k of the distinct-token hashes —
      the distinct-vocabulary estimator (exact below k).
    - ``bloom_docids`` (b=word, v=bits): Bloom filter over committed
      doc_ids (sha256 of the text) — "was this exact content ever
      ingested" membership without touching the documents table.

    Why this is ingest state and not a query: each sketch is MERGEABLE
    (sum / bottom-k / OR), so the ingest paths maintain the table in
    O(batch) per increment while the result stays bit-identical to
    sketching the full corpus — the hygiene report then answers corpus
    questions from a KB-sized table instead of a 100-TB scan. The state
    stays bounded (depth×width + k + m_bits/32 rows) no matter the
    corpus size; there is nothing to compact, ever.

    Bottom-k is computed via sort+limit (TakeOrderedAndProject — no
    single-partition window). NULL-safe: docs with no tokens simply
    contribute nothing."""
    from neo4j_document_pipeline_spark.functions.textstats import (
        col_tokens,
    )
    base = (documents.select("doc_id", "text")
            .dropDuplicates(["doc_id"]))
    toks = base.select(F.explode(col_tokens(F.col("text"))).alias("term"))
    nul_u = F.lit(None).cast("double").alias("u")
    nul_v = F.lit(None).cast("long").alias("v")
    zero = F.lit(0).cast("long")
    cms = (cms_sketch(toks, [], "term", depth=SKETCH_CMS_DEPTH,
                      width=SKETCH_CMS_WIDTH, salt=SKETCH_SALT)
           .select(F.lit("cms_tokens").alias("kind"), "r", "b",
                   F.col("cnt").alias("v"), nul_u))
    kmv = (toks.select(uniform_hash_col("term", SKETCH_SALT).alias("u"))
           .distinct().orderBy("u").limit(SKETCH_KMV_K)
           .select(F.lit("kmv_vocab").alias("kind"), zero.alias("r"),
                   zero.alias("b"), nul_v, "u"))
    bloom = (bloom_sketch(base, [], "doc_id", m_bits=SKETCH_BLOOM_BITS,
                          k_hashes=SKETCH_BLOOM_HASHES, salt=SKETCH_SALT)
             .select(F.lit("bloom_docids").alias("kind"), zero.alias("r"),
                     F.col("w").alias("b"), F.col("bits").alias("v"),
                     nul_u))
    return cms.unionByName(kmv).unionByName(bloom)


def corpus_sketches_merge_fn():
    """MERGE for the committed sketch state: cms cells ADD, bloom words
    OR, kmv keeps the k smallest of the union — each exactly the
    sketch's own merge operator, so state after any number of
    increments == ``corpus_sketches_from_docs`` over the union of the
    increments' documents, bit-for-bit."""
    def fn(existing, new):
        allr = new if existing is None else existing.unionByName(new)
        cms = (allr.filter(F.col("kind") == "cms_tokens")
               .groupBy("kind", "r", "b")
               .agg(F.sum("v").alias("v"))
               .withColumn("u", F.lit(None).cast("double")))
        bloom = (allr.filter(F.col("kind") == "bloom_docids")
                 .groupBy("kind", "r", "b")
                 .agg(F.bit_or("v").alias("v"))
                 .withColumn("u", F.lit(None).cast("double")))
        zero = F.lit(0).cast("long")
        kmv = (allr.filter(F.col("kind") == "kmv_vocab")
               .select("u").distinct().orderBy("u").limit(SKETCH_KMV_K)
               .select(F.lit("kmv_vocab").alias("kind"), zero.alias("r"),
                       zero.alias("b"), F.lit(None).cast("long").alias("v"),
                       "u"))
        return cms.unionByName(bloom).unionByName(kmv)
    return fn


def corpus_sketch_summary(state: DataFrame) -> dict:
    """Answer the corpus questions the sketches carry, from the
    KB-sized state alone: exact total token count (v-sum of cms hash
    row 0 — every token lands in exactly one of its buckets), the KMV
    distinct-vocabulary estimate (exact below k), and the doc-id
    filter's occupancy. One collect over a bounded table."""
    rows = state.collect()
    tokens_total = sum((r["v"] or 0) for r in rows
                      if r["kind"] == "cms_tokens" and r["r"] == 0)
    kmv_u = sorted(r["u"] for r in rows if r["kind"] == "kmv_vocab")
    if not kmv_u:
        vocab = 0.0
    elif len(kmv_u) < SKETCH_KMV_K:
        vocab = float(len(kmv_u))
    else:
        vocab = (SKETCH_KMV_K - 1) / kmv_u[-1]
    bloom_words = sum(1 for r in rows if r["kind"] == "bloom_docids")
    return {"tokens_total": int(tokens_total),
            "vocab_estimate": round(vocab, 1),
            "vocab_exact": len(kmv_u) < SKETCH_KMV_K,
            "bloom_words": bloom_words}


def kmv_set_ops(a: DataFrame, b: DataFrame,
                group_cols: str | list[str], k: int) -> DataFrame:
    """Set-operation estimates from two KMV sketches built with the
    SAME salt and k (the theta-sketch set algebra, Beyer et al. 2007)
    -> (group_cols…, k_used, n_both, union_est, inter_est,
    jaccard_est) per group present in BOTH inputs.

    Construction: K = the k smallest hashes of sketch(A) ∪ sketch(B)
    (a valid KMV sketch of A ∪ B by mergeability), ``k_used`` = |K|.
    Membership tests against the input sketches are EXACT for every
    h ∈ K: if h ∈ A but h ∉ sketch(A), then sketch(A) already holds k
    hashes of A smaller than h, all of which are in the union — so h
    could not be among the union's k smallest. Hence
    ``n_both`` = |{h ∈ K : h ∈ sketch(A) ∧ h ∈ sketch(B)}| counts
    true A∩B members among k_used uniform draws from A∪B:
    jaccard_est = n_both / k_used, inter_est = jaccard_est ·
    union_est. Below saturation (k_used < k — only possible when both
    sketches are exhaustive) every output is EXACT.

    Deterministic end to end (pure array arithmetic over deterministic
    sketches — same bits on any engine, plain-SQL oracle). Scale: one
    equi-join on the group key + O(k) array expressions per group;
    never touches raw data — the point of doing set algebra on
    sketches at all."""
    if k < 2:
        raise ValueError(f"k must be >= 2, got {k}")
    groups = _as_groups(group_cols)
    sa = a.select(*groups, F.col("sketch").alias("_sa"))
    sb = b.select(*groups, F.col("sketch").alias("_sb"))
    j = sa.join(sb, groups)
    union_k = F.slice(F.array_sort(F.array_union("_sa", "_sb")), 1, k)
    d = j.select(*groups, "_sa", "_sb", union_k.alias("_k"))
    kk = F.size("_k")
    n_both = F.size(F.filter(
        "_k", lambda h: F.array_contains("_sa", h)
        & F.array_contains("_sb", h)))
    union_est = F.when(kk < k, kk.cast("double")) \
        .otherwise(F.lit(float(k - 1)) / F.element_at("_k", -1))
    out = d.select(
        *groups, kk.alias("k_used"), n_both.alias("n_both"),
        union_est.alias("union_est"))
    jac = F.when(F.col("k_used") > 0,
                 F.col("n_both") / F.col("k_used")).otherwise(F.lit(0.0))
    return out.select(
        *groups, "k_used", "n_both", "union_est",
        (jac * F.col("union_est")).alias("inter_est"),
        jac.alias("jaccard_est"))


# ---------------------------------------------------------------------------
# Fixed-width histogram sketch (mergeable quantiles / distributions)
# ---------------------------------------------------------------------------

def _as_groups(group_cols: str | list[str]) -> list[str]:
    return [group_cols] if isinstance(group_cols, str) else list(group_cols)


def hist_sketch(df: DataFrame, group_cols: str | list[str],
                value_col: str, *, width: float,
                origin: float = 0.0) -> DataFrame:
    """Per-group fixed-width histogram sketch -> (group_cols…, bucket =
    floor((value - origin) / width) as BIGINT, cnt). The quantile /
    distribution member of the engine's mergeable-sketch family (KMV =
    cardinality, CMS = frequency, Bloom = membership, HIST = ranks):
    counts are EXACTLY mergeable by addition, the sketch is a pure
    deterministic function of the data (same cells on any partitioning,
    cluster size, or engine), and any rank query answered from it is
    wrong by at most one bucket ``width``.

    Scale: one hash aggregate (map-side partial combine) over the raw
    rows; the sketch is O(value_range / width) rows per group
    regardless of input size. NULL values are ignored (COUNT
    semantics). Negative values bucket correctly (floor, not
    truncation)."""
    if not (width > 0):
        raise ValueError("hist_sketch: width must be positive")
    groups = _as_groups(group_cols)
    bucket = F.floor((F.col(value_col).cast("double") - F.lit(float(origin)))
                     / F.lit(float(width))).cast("bigint")
    return (df.filter(F.col(value_col).isNotNull())
            .groupBy(*groups, bucket.alias("bucket"))
            .agg(F.count("*").alias("cnt")))


def hist_merge(cells: DataFrame,
               group_cols: str | list[str]) -> DataFrame:
    """Merge histogram sketches built with the SAME width/origin:
    plain addition per (group, bucket) — exact by linearity of
    counting, the property that lets every partition/batch/day sketch
    independently and combine without a re-scan."""
    groups = _as_groups(group_cols)
    return (cells.groupBy(*groups, "bucket")
            .agg(F.sum("cnt").alias("cnt")))


def hist_quantiles(cells: DataFrame, group_cols: str | list[str],
                   probs: list[float], *, width: float,
                   origin: float = 0.0) -> DataFrame:
    """Quantile estimates from a histogram sketch -> (group_cols…, q,
    bucket, est, total): for each q the smallest bucket whose running
    count reaches rank ceil(q·total) (type-1 semantics), with ``est``
    the bucket's LOWER edge — the true quantile lies in
    [est, est + width) by construction, the sketch's one-sided
    guarantee.

    Shape: one window pass over the CELLS (already tiny — O(buckets)
    rows per group) computing running and total counts, then ONE
    aggregate with a min-when per q and an in-plan explode back to
    rows — no join against a probs table, no per-q scan."""
    if not probs:
        raise ValueError("hist_quantiles: probs must be non-empty")
    qs = sorted(set(float(p) for p in probs))
    for p in qs:
        if not (0.0 <= p <= 1.0):
            raise ValueError(f"hist_quantiles: prob {p!r} outside [0, 1]")
    if not (width > 0):
        raise ValueError("hist_quantiles: width must be positive")
    groups = _as_groups(group_cols)
    w_cum = (Window.partitionBy(*groups).orderBy("bucket")
             .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    w_all = Window.partitionBy(*groups)
    c = (cells
         .withColumn("_cum", F.sum("cnt").over(w_cum))
         .withColumn("_tot", F.sum("cnt").over(w_all)))
    aggs = [
        F.min(F.when(
            F.col("_cum") >= F.greatest(
                F.lit(1).cast("bigint"),
                F.ceil(F.lit(p) * F.col("_tot"))),
            F.col("bucket"))).alias(f"_b{i}")
        for i, p in enumerate(qs)
    ]
    g = c.groupBy(*groups).agg(F.max("_tot").alias("total"), *aggs)
    pairs = F.explode(F.array(*[
        F.struct(F.lit(p).alias("q"), F.col(f"_b{i}").alias("bucket"))
        for i, p in enumerate(qs)])).alias("_p")
    return (g.select(*groups, "total", pairs)
            .select(*groups,
                    F.col("_p.q").alias("q"),
                    F.col("_p.bucket").alias("bucket"),
                    (F.lit(float(origin))
                     + F.col("_p.bucket") * F.lit(float(width)))
                    .alias("est"),
                    "total"))
