"""Training-data export operators: reproducible sampling and
token-budget shard packing.

The reference pipeline's end product is a corpus (documents + entities
feeding retrieval); exporting a TRAINING corpus at 100 TB needs two
more primitives on top of the dedup/quality gates:

- a sample that is a pure function of the data (``stratified_sample``)
  — ``DataFrame.sample(seed=...)`` is partitioning-dependent, so the
  "same" seed yields a different corpus after a repartition, a
  compaction, or a cluster-size change; a hash threshold keeps the
  selection stable across all of those and lets two teams draw
  IDENTICAL subsets from independent scans;
- deterministic packing of documents into ~fixed-token shards
  (``token_shards``) — the unit of training-data delivery — without a
  global-window prefix sum (a single-partition sort would be the
  classic 100-TB scale-killer; this uses the textbook distributed
  prefix sum: per-partition totals -> driver-side offsets -> local
  cumsum).
"""
from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# 2^32: the hash-threshold denominator — 8 hex digits of sha256 give a
# uniform 32-bit integer, so u = int(hex8) / 2^32 is uniform on [0, 1)
_HASH_DENOM = float(1 << 32)


def uniform_hash_col(id_col, salt: str):
    """Deterministic uniform [0, 1) draw per id: the first 8 hex digits
    of sha256('<salt>:<id>') over 2^32. JVM-side (sha2 + conv), exactly
    reproducible in any engine with sha256 (the DuckDB oracle computes
    the identical expression), independent of partitioning, cluster
    size, and row order. Change ``salt`` to draw an independent sample
    from the same corpus (holdout vs train splits). ``id_col``: a
    column name or any Column expression (composite keys concat their
    parts upstream)."""
    key = F.col(id_col) if isinstance(id_col, str) else id_col
    h = F.sha2(F.concat(F.lit(f"{salt}:"), key.cast("string")), 256)
    return (F.conv(F.substring(h, 1, 8), 16, 10).cast("double")
            / F.lit(_HASH_DENOM))


def stratified_sample(df: DataFrame, rates: dict[str, float],
                      strata_col: str, id_col: str = "doc_id",
                      default_rate: float = 0.0,
                      salt: str = "v1") -> DataFrame:
    """Reproducible stratified Bernoulli sample: keep a row iff its
    uniform hash draw (``uniform_hash_col``) is below its stratum's
    rate — e.g. ``rates={"en": 0.5, "zh": 0.9}`` downsamples dominant
    languages while keeping rare ones, the standard corpus-mixing move.
    Strata absent from ``rates`` fall back to ``default_rate`` (0.0 =
    drop, the loud default: an unlisted stratum in a mixing recipe is
    a bug, not "keep everything").

    Scale: a narrow projection + filter — no shuffle, no sampling jobs;
    the filter pushes past column pruning like any other predicate, and
    re-running it on any re-partitioning of the same rows selects the
    SAME sample (asserted in tests)."""
    for s, r in rates.items():
        if not (0.0 <= float(r) <= 1.0):
            raise ValueError(f"stratified_sample: rate {r!r} for "
                             f"stratum {s!r} outside [0, 1]")
    if not (0.0 <= float(default_rate) <= 1.0):
        raise ValueError("stratified_sample: default_rate outside [0, 1]")
    rate = F.lit(float(default_rate))
    for s, r in sorted(rates.items()):
        rate = F.when(F.col(strata_col) == s, F.lit(float(r))) \
            .otherwise(rate)
    return df.filter(uniform_hash_col(id_col, salt) < rate)


def token_shards(df: DataFrame, budget: int, tokens_col: str = "n_tok",
                 order_col: str = "doc_id",
                 n_partitions: int | None = None) -> DataFrame:
    """Pack consecutive documents (by ``order_col``) into token-budget
    shards: with cum(i) the running sum of ``tokens_col`` in order,
    shard_id(i) = floor((cum(i) - tokens_i) / budget) — a document
    starts in the shard its PRECEDING total fills into, so every shard
    holds ~``budget`` tokens (an oversized document simply spans its
    own shard ids). The export planner for "write the corpus as N-token
    training shards".

    Shape — the distributed prefix sum, NOT a global window (a
    single-partition ORDER BY window is the 100-TB scale-killer this
    replaces):
      1. range-repartition + in-partition sort by ``order_col``
         (localCheckpoint pins the partitioning so both passes see the
         same layout),
      2. per-partition token totals — one tiny agg (n_partitions rows)
         collected to the driver and turned into per-partition OFFSETS,
      3. one mapInPandas pass: local cumsum + broadcast offset, carry
         maintained across Arrow batches within each partition.
    Total cost: one range shuffle + one O(n_partitions) collect + one
    narrow pass. The oracle is the global-window SQL over the same
    ordering (exact parity — the prefix sum is associative)."""
    if budget <= 0:
        raise ValueError("token_shards: budget must be positive")
    if "_pid" in df.columns:
        raise ValueError("token_shards: input must not carry a _pid "
                         "column (reserved for the partition stamp)")
    spark = df.sparkSession
    n = int(n_partitions
            or spark.conf.get("spark.sql.shuffle.partitions", "32"))
    d = (df.repartitionByRange(n, F.col(order_col))
         .sortWithinPartitions(order_col)
         .withColumn("_pid", F.spark_partition_id())
         .localCheckpoint())
    # per-partition totals + the two loud-input checks, ONE tiny agg:
    # null token counts would corrupt the offsets (F.sum skips them,
    # pandas cumsum can't), and duplicate order keys make "consecutive"
    # ill-defined (ties sort arbitrarily, so packing would vary run to
    # run — on both engines). Equal keys are range-partitioned into ONE
    # partition, so summed per-partition distincts equal the global
    # distinct count.
    stats = (d.groupBy("_pid")
             .agg(F.sum(F.col(tokens_col).cast("long")).alias("t"),
                  F.count("*").alias("rows"),
                  F.sum(F.col(tokens_col).isNull().cast("long"))
                  .alias("nulls"),
                  F.countDistinct(order_col).alias("keys"))
             .collect())
    if sum(r["nulls"] for r in stats):
        raise ValueError(f"token_shards: {tokens_col} contains nulls — "
                         "fill or drop them first (a null has no width)")
    if sum(r["keys"] for r in stats) != sum(r["rows"] for r in stats):
        raise ValueError(f"token_shards: {order_col} must be unique — "
                         "ties make the packing order (and therefore "
                         "shard ids) nondeterministic")
    totals = {r["_pid"]: r["t"] for r in stats}
    offsets, acc = {}, 0
    for pid in range(n):
        offsets[pid] = acc
        acc += int(totals.get(pid) or 0)
    out_schema = d.drop("_pid").schema.add("shard_id", "long")

    def pack(it):
        carry = None
        for pdf in it:
            if len(pdf) == 0:
                continue
            if carry is None:
                carry = offsets[int(pdf["_pid"].iloc[0])]
            toks = pdf[tokens_col].astype("int64")
            ends = toks.cumsum() + carry
            starts = ends - toks
            carry = int(ends.iloc[-1])
            pdf = pdf.drop(columns=["_pid"])
            pdf["shard_id"] = (starts // budget).astype("int64")
            yield pdf

    return d.mapInPandas(pack, out_schema)


def weighted_sample(df: DataFrame, k: int, weight_col: str,
                    id_col: str = "doc_id", salt: str = "v1",
                    strata_col: str | None = None) -> DataFrame:
    """Reproducible weighted sampling WITHOUT replacement — the
    Efraimidis–Spirakis A-ES scheme with the same deterministic hash
    draw as stratified_sample: each row scores key = u^(1/w) (u = its
    uniform [0,1) hash draw, w = its weight) and the k LARGEST keys are
    the sample. Inclusion probability is proportional to weight (the
    quality-weighted corpus-export move: weight by token count, quality
    score, or domain priority), and the draw is a pure function of
    (id, salt) — identical across partitionings, cluster sizes, and
    re-runs; change ``salt`` for an independent draw.

    ``strata_col``: take k per stratum instead of k overall.

    Rows with NULL or non-positive weight carry no mass and are
    dropped (A-ES requires w > 0). Ties (two equal keys) break on the
    id, so the selection is total-ordered and exactly replayable in
    SQL — the oracle computes the identical key expression.

    Scale: global form is sort+limit k — Catalyst's
    TakeOrderedAndProject keeps a k-row heap per partition and merges
    once, no full sort. The stratified form is one row_number window
    partitioned by stratum (shuffle by stratum; a stratum's candidates
    must co-locate by definition)."""
    if k <= 0:
        raise ValueError("weighted_sample: k must be positive")
    w = F.col(weight_col).cast("double")
    # ~isnan too: Spark orders NaN above every number, so a NaN weight
    # would pass (w > 0), score a NaN key, and crowd out the whole
    # sample under the descending sort
    keyed = (df.filter(w.isNotNull() & ~F.isnan(w) & (w > 0))
             .withColumn("_wkey",
                         F.pow(uniform_hash_col(id_col, salt), 1.0 / w)))
    if strata_col is None:
        return (keyed.orderBy(F.col("_wkey").desc(), F.col(id_col))
                .limit(k).drop("_wkey"))
    from pyspark.sql import Window
    win = (Window.partitionBy(strata_col)
           .orderBy(F.col("_wkey").desc(), F.col(id_col)))
    return (keyed.withColumn("_rn", F.row_number().over(win))
            .filter(F.col("_rn") <= k).drop("_wkey", "_rn"))


def interleave_order(df: DataFrame, group_col: str, id_col: str, *,
                     weights: dict[str, float], salt: str = "v1",
                     n_partitions: int | None = None) -> DataFrame:
    """Deterministic weighted-round-robin training order across
    sources -> (id, group, grp_rank, vt, pos): each group's rows are
    shuffled by the engine's uniform hash draw (pure function of the
    id, so the order survives repartitions/re-runs/engines), ranked
    within their group, and assigned the stride-scheduling virtual
    time vt = (grp_rank - 0.5) / weight. Sorting by vt interleaves the
    groups at their weight ratios from position one — the blendable-
    dataset order a trainer consumes after ``mixture_weights`` decides
    the ratios (ties at equal vt break on (group, id)).

    Scale shape — per-group ranks AND global positions via the
    distributed prefix sum, never a global/per-group window sort:
      1. range-repartition by (group, u, id) + in-partition sort;
         per-(partition, group) counts (one tiny agg, n_partitions x
         n_groups rows) -> driver offsets -> one mapInPandas cumcount
         with a per-group carry,
      2. vt folded in-plan as a literal-map lookup (JVM expression),
      3. the same prefix-sum once more ordered by (vt, group, id) for
         the global position.
    Total: two range shuffles + two O(n_partitions·n_groups) collects
    + two narrow passes, independent of data volume per partition.

    Validation is loud: empty/non-positive weights, a group in the
    data missing from ``weights``, NULL groups, and duplicate ids all
    raise (duplicates would make both ranks nondeterministic)."""
    if not weights:
        raise ValueError("interleave_order: weights must be non-empty")
    wmap = {}
    for g, w in weights.items():
        if not (float(w) > 0.0):
            raise ValueError(f"interleave_order: weight {w!r} for "
                             f"group {g!r} must be positive")
        wmap[g] = float(w)
    if "_pid" in df.columns:
        raise ValueError("interleave_order: input must not carry a "
                         "_pid column (reserved)")
    spark = df.sparkSession
    n = int(n_partitions
            or spark.conf.get("spark.sql.shuffle.partitions", "32"))

    d = (df.select(F.col(id_col).alias("id"),
                   F.col(group_col).alias("grp"))
         .withColumn("_u", uniform_hash_col("id", salt))
         .repartitionByRange(n, "grp", "_u", "id")
         .sortWithinPartitions("grp", "_u", "id")
         .withColumn("_pid", F.spark_partition_id())
         .localCheckpoint())
    # equal (grp, id) pairs share a range key, so per-partition
    # distinct counts sum to the global distinct count
    stats = (d.groupBy("_pid", "grp")
             .agg(F.count("*").alias("rows"),
                  F.count_distinct("id").alias("keys"))
             .collect())
    if any(r["grp"] is None for r in stats):
        raise ValueError("interleave_order: NULL group values — fill "
                         "or drop them first")
    seen = {r["grp"] for r in stats}
    missing = sorted(seen - set(wmap))
    if missing:
        raise ValueError("interleave_order: groups without a weight: "
                         f"{missing} — every group in the data needs "
                         "an explicit ratio")
    if (sum(r["keys"] for r in stats)
            != sum(r["rows"] for r in stats)):
        raise ValueError(f"interleave_order: {id_col} must be unique "
                         "per group — duplicates make the order "
                         "nondeterministic")
    per_group_running: dict[str, int] = {}
    offsets: dict[tuple[int, str], int] = {}
    for r in sorted(stats, key=lambda r: (r["_pid"], str(r["grp"]))):
        offsets[(r["_pid"], r["grp"])] = \
            per_group_running.get(r["grp"], 0)
        per_group_running[r["grp"]] = \
            per_group_running.get(r["grp"], 0) + r["rows"]

    rank_schema = d.drop("_pid", "_u").schema.add("grp_rank", "long")

    def rank_pass(it):
        carry: dict[str, int] = {}
        pid = None
        for pdf in it:
            if len(pdf) == 0:
                continue
            if pid is None:
                pid = int(pdf["_pid"].iloc[0])
            ranks = []
            for g in pdf["grp"]:
                base = carry.get(g)
                if base is None:
                    base = offsets[(pid, g)]
                base += 1
                carry[g] = base
                ranks.append(base)
            out = pdf.drop(columns=["_pid", "_u"])
            out["grp_rank"] = ranks
            yield out

    ranked = d.mapInPandas(rank_pass, rank_schema)
    wlit = F.create_map(*[x for g in sorted(wmap)
                          for x in (F.lit(g), F.lit(wmap[g]))])
    v = (ranked.withColumn(
        "vt", (F.col("grp_rank").cast("double") - F.lit(0.5))
        / F.element_at(wlit, F.col("grp")))
        .repartitionByRange(n, "vt", "grp", "id")
        .sortWithinPartitions("vt", "grp", "id")
        .withColumn("_pid", F.spark_partition_id())
        .localCheckpoint())
    counts = {r["_pid"]: r["c"] for r in
              v.groupBy("_pid").agg(F.count("*").alias("c")).collect()}
    pos_offsets, acc = {}, 0
    for pid in range(n):
        pos_offsets[pid] = acc
        acc += int(counts.get(pid, 0))
    pos_schema = v.drop("_pid").schema.add("pos", "long")

    def pos_pass(it):
        carry = None
        for pdf in it:
            if len(pdf) == 0:
                continue
            if carry is None:
                carry = pos_offsets[int(pdf["_pid"].iloc[0])]
            out = pdf.drop(columns=["_pid"])
            out["pos"] = range(carry + 1, carry + 1 + len(pdf))
            carry += len(pdf)
            yield out

    return (v.mapInPandas(pos_pass, pos_schema)
            .select(F.col("id").alias(id_col),
                    F.col("grp").alias(group_col),
                    "grp_rank", "vt", "pos"))


def leakage_safe_split(df: DataFrame, id_col: str,
                       fractions: dict[str, float], *,
                       clusters: DataFrame | None = None,
                       text_col: str | None = None,
                       jaccard_threshold: float = 0.8,
                       salt: str = "v1") -> DataFrame:
    """Train/val/test assignment that near-duplicates can NEVER
    straddle — the contamination guard a corpus split needs AFTER
    near-dup detection: splitting documents independently puts one
    copy of a near-dup pair in train and the other in test, and the
    eval set silently measures memorization (the reason decontam and
    dedup papers split by CLUSTER, not by document).

    Every document is keyed by its near-dup cluster representative
    (``resolve_near_duplicates``'s keep_id; unclustered documents key
    on their own id) and the CLUSTER KEY — not the document — takes
    the engine's deterministic uniform hash draw, mapped to named
    splits by cumulative ``fractions`` (insertion order defines the
    boundary order; the last split takes the remainder, so float
    boundary dust never drops a row). Two near-dups therefore share a
    draw and land in the same split, by construction, on any
    partitioning or cluster size.

    Pass ``clusters`` (any (id, keep_id)-shaped frame — e.g. a
    committed resolution) to reuse existing state, or ``text_col`` to
    compute MinHash-LSH resolution in-line. Returns df's rows plus
    (split_key, split).

    Scale: one equi-join against the cluster map (tiny: only clustered
    docs have rows) plus a narrow per-row hash — no shuffle beyond the
    join; the split is a pure function of (corpus text, fractions,
    salt)."""
    if (clusters is None) == (text_col is None):
        raise ValueError("pass exactly one of clusters= or text_col=")
    if not fractions:
        raise ValueError("fractions must be non-empty")
    vals = list(fractions.values())
    if any(not (0.0 < v <= 1.0) for v in vals):
        raise ValueError(f"fractions must be in (0, 1]: {fractions}")
    if abs(sum(vals) - 1.0) > 1e-9:
        raise ValueError(f"fractions must sum to 1: {fractions}")
    if clusters is None:
        from neo4j_document_pipeline_spark.operators.dedup import (
            resolve_near_duplicates)
        clusters = resolve_near_duplicates(
            df, id_col, text_col,
            jaccard_threshold=jaccard_threshold)
    cmap = clusters.select(F.col(clusters.columns[0]).alias(id_col),
                           F.col("keep_id").alias("split_key"))
    keyed = (df.join(cmap, id_col, "left")
             .withColumn("split_key",
                         F.coalesce("split_key",
                                    F.col(id_col).cast("string"))))
    u = uniform_hash_col("split_key", salt)
    names = list(fractions)
    expr = F.lit(names[-1])  # remainder bucket: immune to float dust
    cum = 0.0
    bounds = []
    for n in names[:-1]:
        cum += fractions[n]
        bounds.append((n, cum))
    for n, b in reversed(bounds):
        expr = F.when(u < F.lit(b), F.lit(n)).otherwise(expr)
    return keyed.withColumn("split", expr)
