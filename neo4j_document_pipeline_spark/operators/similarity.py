"""Similarity search over an embedding column (array<float>).

- brute-force cosine top-k: the exactness baseline, fully JVM-side
  (zip_with + aggregate -> whole-stage codegen; TakeOrderedAndProject for
  the top-k — no full sort);
- LSH-bucketed variant: random-hyperplane buckets prune the scan; probes
  the query's bucket +/- multi-probe neighbors, then exact re-rank.
  The scale path when the corpus is billions of vectors.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _dot_col(vec_col: str, q: list[float]):
    qa = F.array(*[F.lit(float(x)) for x in q])
    return F.aggregate(F.zip_with(F.col(vec_col), qa, lambda a, b: a * b),
                       F.lit(0.0), lambda acc, x: acc + x)


def cosine_score(vec_col: str, q: list[float]):
    dot = _dot_col(vec_col, q)
    nv = F.sqrt(F.aggregate(F.col(vec_col), F.lit(0.0), lambda acc, x: acc + x * x))
    nq = float(np.sqrt(sum(x * x for x in q)))
    return F.when((nv == 0) | (F.lit(nq) == 0.0), F.lit(0.0)).otherwise(
        dot / (nv * F.lit(nq)))


def pairwise_cosine(a_col, b_col):
    """Column-to-column cosine, zero-norm-safe (0.0, matching
    cosine_score's convention), fully JVM-side."""
    dot = F.aggregate(F.zip_with(a_col, b_col, lambda x, y: x * y),
                      F.lit(0.0), lambda acc, x: acc + x)
    na = F.sqrt(F.aggregate(a_col, F.lit(0.0), lambda acc, x: acc + x * x))
    nb = F.sqrt(F.aggregate(b_col, F.lit(0.0), lambda acc, x: acc + x * x))
    return F.when((na == 0) | (nb == 0), F.lit(0.0)).otherwise(
        dot / (na * nb))


def hard_negatives(corpus: DataFrame, anchors: DataFrame,
                   id_col: str, vec_col: str, label_col: str,
                   anchor_id_col: str, anchor_vec_col: str,
                   anchor_label_col: str, k: int = 5) -> DataFrame:
    """Contrastive hard-negative mining: for every anchor, the ``k``
    most-similar corpus vectors with a DIFFERENT label — the negatives
    that actually move a contrastive/triplet loss (random negatives are
    trivially far; training on them wastes the batch).

    Anchors broadcast (mining runs per training batch, so the anchor
    side is small by construction); the corpus side streams through the
    broadcast join with the label-mismatch filter applied before
    scoring. Ranking uses the ROUNDED (4dp) cosine with the candidate
    id as tie-break, so the top-k set is partitioning- and engine-
    independent (the embedding_decontam convention). For anchor sets
    too large to broadcast, mine through the committed IVF index
    (operators/retrieval.py) and post-filter labels instead.

    Returns (anchor_id, id, label, score, rnk), rnk 1..k per anchor."""
    from pyspark.sql import Window
    a = anchors.select(F.col(anchor_id_col).alias("anchor_id"),
                       F.col(anchor_vec_col).alias("_av"),
                       F.col(anchor_label_col).alias("_al"))
    scored = (corpus.crossJoin(F.broadcast(a))
              .filter(F.col(label_col) != F.col("_al"))
              .select("anchor_id", F.col(id_col), F.col(label_col),
                      F.round(pairwise_cosine(F.col(vec_col),
                                              F.col("_av")), 4)
                      .alias("score")))
    w = Window.partitionBy("anchor_id").orderBy(
        F.col("score").desc(), F.col(id_col))
    return (scored.withColumn("rnk", F.row_number().over(w))
            .filter(F.col("rnk") <= k))


def brute_force_topk(df: DataFrame, id_col: str, vec_col: str,
                     query: list[float], k: int = 10) -> DataFrame:
    """Exact cosine top-k. orderBy+limit compiles to TakeOrderedAndProject
    (per-partition heap + driver merge — no global sort shuffle)."""
    return (
        df.select(F.col(id_col), cosine_score(vec_col, query).alias("score"))
        .orderBy(F.col("score").desc(), F.col(id_col))
        .limit(k)
    )


def lsh_bucketed_topk(df: DataFrame, id_col: str, vec_col: str,
                      query: list[float], k: int = 10,
                      n_planes: int = 8, seed: int = 42,
                      multiprobe: int = 1) -> DataFrame:
    """Hyperplane-LSH pre-filter + exact re-rank.

    Buckets = sign pattern of ``n_planes`` random projections. The probe
    set is the query bucket plus all buckets within Hamming distance
    ``multiprobe`` (recall knob). At scale the bucket id becomes the
    table's partition column -> partition pruning does the scan skip."""
    d = len(query)
    rng = np.random.RandomState(seed)
    planes = rng.normal(size=(n_planes, d))

    def bucket_col(vec_col_name: str):
        bits = []
        for p in range(n_planes):
            dot = F.aggregate(
                F.zip_with(F.col(vec_col_name),
                           F.array(*[F.lit(float(x)) for x in planes[p]]),
                           lambda a, b: a * b),
                F.lit(0.0), lambda acc, x: acc + x)
            bits.append(F.when(dot >= 0, F.lit(1 << p)).otherwise(F.lit(0)))
        return sum(bits[1:], bits[0])

    qsigns = [1 if planes[p] @ np.asarray(query) >= 0 else 0 for p in range(n_planes)]
    qbucket = sum((s << p) for p, s in enumerate(qsigns))
    probes = {qbucket}
    if multiprobe >= 1:
        for p in range(n_planes):
            probes.add(qbucket ^ (1 << p))
    if multiprobe >= 2:
        for p in range(n_planes):
            for p2 in range(p + 1, n_planes):
                probes.add(qbucket ^ (1 << p) ^ (1 << p2))

    pruned = df.withColumn("_bucket", bucket_col(vec_col)) \
               .filter(F.col("_bucket").isin(list(probes)))
    return brute_force_topk(pruned.drop("_bucket"), id_col, vec_col, query, k)


def pairwise_topk_join(left: DataFrame, right: DataFrame,
                       id_left: str, id_right: str,
                       vec_left: str, vec_right: str,
                       k: int = 5) -> DataFrame:
    """For each left row, its top-k most-cosine-similar right rows.
    Broadcast the smaller right side; per-left-row ranking via window."""
    from pyspark.sql import Window
    l = left.select(F.col(id_left).alias("lid"), F.col(vec_left).alias("lv"))
    r = right.select(F.col(id_right).alias("rid"), F.col(vec_right).alias("rv"))
    dot = F.aggregate(F.zip_with("lv", "rv", lambda a, b: a * b),
                      F.lit(0.0), lambda acc, x: acc + x)
    nl = F.sqrt(F.aggregate("lv", F.lit(0.0), lambda acc, x: acc + x * x))
    nr = F.sqrt(F.aggregate("rv", F.lit(0.0), lambda acc, x: acc + x * x))
    scored = (
        l.join(F.broadcast(r))
        .withColumn("score", F.when((nl == 0) | (nr == 0), F.lit(0.0))
                    .otherwise(dot / (nl * nr)))
    )
    w = Window.partitionBy("lid").orderBy(F.col("score").desc(), F.col("rid"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("lid", "rid", "score", "rank")
    )


# ---------------------------------------------------------------------------
# IVF (inverted-file) ANN — the cell-probing scale path
# ---------------------------------------------------------------------------

# above this many literal floats (n_cells * dim), embedding centroids into
# the Catalyst expression tree stops being sane (multi-MB plans at e.g.
# 3072 dims x 64 cells) — switch to a broadcast numpy matmul in mapInPandas
_EXPR_ASSIGN_LIMIT = 8192


class NoVectorsError(ValueError):
    """Training input has no usable (non-null, well-formed) vectors.
    Kept distinct from plain ValueError so callers that legitimately
    skip index builds on empty corpora don't also swallow real
    misconfigurations (e.g. dim % m != 0)."""


def collect_train_sample(df: DataFrame, vec_col: str, n: int,
                         seed: int, dim: int) -> np.ndarray:
    """Deterministic pseudo-random training sample: one TakeOrdered pass
    over xxhash64(seed, vector) — shared by the IVF and PQ trainers so
    an IVFPQ index build collects the (identical) sample once, not
    twice. The key hashes the vector VALUE directly: the previous
    sha2(cast(vector as string)) key spent ~90% of the index build
    formatting every embedding as a string (measured 1.36 s vs 0.17 s
    for the sample pass at 9.3k x 64 floats — the hash only orders the
    sample, any deterministic pure function of the value serves).
    Arrow transfer (toPandas) instead of row-based collect: values and
    order are identical, the pickled-row path is just slower."""
    pdf = (
        df.select(F.col(vec_col).alias("v"))
        .filter(F.col("v").isNotNull() & (F.size("v") == dim))
        .orderBy(F.xxhash64(F.lit(str(seed)), F.col("v")))
        .limit(n).toPandas()
    )
    if not len(pdf):
        raise NoVectorsError(
            f"no non-null vectors of width {dim} in column {vec_col!r}")
    return np.stack([np.asarray(v, dtype=float) for v in pdf["v"]])


def lloyd_kmeans(X: np.ndarray, n_cells: int, iters: int) -> list[list[float]]:
    """Driver-side Lloyd k-means by cosine over a pre-collected (n, dim)
    sample: deterministic first-n seeding, first-max tie-break (the same
    argmax array_position uses), empty cells keep their centroid. Shared
    by ivf_train's sampled path and the per-label quantizer trainer
    (retrieval.build_node_vectors with cfg.ann_per_label — one call per
    label over one stratified sample). Returns min(n_cells, len(X))
    centroids — a sample smaller than the requested cell count cannot
    seed more distinct cells than it has points."""
    cents = X[:n_cells].copy()
    for _ in range(iters):
        M = _normed_matrix(cents.tolist())
        cells = (X @ M.T).argmax(axis=1)
        for c in range(len(cents)):
            mask = cells == c
            if mask.any():
                cents[c] = X[mask].mean(axis=0)
    return [list(map(float, c)) for c in cents]


def _normed_matrix(centroids: list[list[float]]) -> np.ndarray:
    """Centroids L2-normalized row-wise (zero rows kept as zero)."""
    arr = np.asarray(centroids, dtype=float)
    norms = np.linalg.norm(arr, axis=1)
    norms[norms == 0] = 1.0
    return arr / norms[:, None]


def _cell_col(vec_col: str, centroids: list[list[float]]):
    """0-based nearest-centroid index by cosine, computed entirely with
    JVM higher-order functions over a literal centroid array — no explode
    (no row multiplication), no shuffle, no Python. Centroids are
    L2-normalized here so the dot IS the cosine ranking (the row vector's
    own norm is constant across cells and cannot change the argmax)."""
    normed = []
    for c in centroids:
        n = float(np.sqrt(sum(x * x for x in c))) or 1.0
        normed.append([float(x) / n for x in c])
    # ONE parsed SQL expression: the Column-DSL equivalent costs
    # n_cells*dim py4j round trips (F.lit per element) to construct per
    # build; repr round-trips each double exactly, so the parsed tree
    # computes the identical dots/argmax
    cents_sql = ", ".join(
        "array(" + ", ".join(f"{x!r}D" for x in c) + ")" for c in normed)
    dots = (f"transform(array({cents_sql}), "
            f"c -> aggregate(zip_with(`{vec_col}`, c, (a, b) -> a * b), "
            "0.0D, (acc, x) -> acc + x))")
    # array_position: 1-based, first occurrence -> deterministic tie-break
    return F.expr(
        f"CAST(array_position({dots}, array_max({dots})) - 1 AS INT)")


def _assign_cells_pandas(df: DataFrame, vec_col: str,
                         centroids: list[list[float]],
                         cell_col: str) -> DataFrame:
    """Nearest-centroid assignment as a broadcast numpy matmul over Arrow
    batches — the large-dimensionality path (centroids travel as a Spark
    broadcast variable, never as plan literals)."""
    import pandas as pd
    from pyspark.sql.types import IntegerType, StructField, StructType

    M = _normed_matrix(centroids)
    bc = df.sparkSession.sparkContext.broadcast(M)
    # a NEW StructType — StructType.add would mutate the source frame's
    # cached schema object in place
    out_schema = StructType(list(df.schema.fields)
                            + [StructField(cell_col, IntegerType())])

    def gen(batches):
        mat = bc.value
        dim = mat.shape[1]
        for pdf in batches:
            # NULL / wrong-width vectors get a null cell — identical to
            # the expression path, where zip_with over a null/ragged
            # array nulls the dots (np.stack would crash on them)
            cells = pd.array([pd.NA] * len(pdf), dtype="Int32")
            vals = [None if v is None else np.asarray(v, dtype=float)
                    for v in pdf[vec_col]]
            ok = [i for i, v in enumerate(vals)
                  if v is not None and v.ndim == 1 and v.size == dim]
            if ok:
                V = np.stack([vals[i] for i in ok])
                cells[ok] = (V @ mat.T).argmax(axis=1).astype("int32")
            pdf[cell_col] = cells
            yield pdf

    return df.mapInPandas(gen, schema=out_schema)


def ivf_assign_ranges(df: DataFrame, vec_col: str,
                      centroids: list[list[float]],
                      label_ranges: dict[str, tuple[int, int]],
                      cell_col: str = "cell",
                      label_col: str = "label") -> DataFrame:
    """Nearest-centroid assignment under PER-LABEL quantizers: each label
    owns a contiguous slice [offset, offset+n) of the flat centroid list
    (``label_ranges[label] = (offset, n)``), and a row competes only
    within its own label's cells — so the emitted cell id is globally
    unique AND label-scoped, keeping the (label, cell) partition layout
    and the flat probe machinery unchanged. One broadcast numpy matmul
    over Arrow batches, sliced per label inside each batch; rows whose
    label has no cells or whose vector is null/ragged get a null cell
    (callers must only feed labels the quantizer covers — build appends
    cells for new labels before assigning)."""
    import pandas as pd
    from pyspark.sql.types import IntegerType, StructField, StructType

    M = _normed_matrix(centroids)
    ranges = {str(k): (int(v[0]), int(v[1]))
              for k, v in label_ranges.items()}
    bc = df.sparkSession.sparkContext.broadcast((M, ranges))
    out_schema = StructType(list(df.schema.fields)
                            + [StructField(cell_col, IntegerType())])

    def gen(batches):
        mat, rng = bc.value
        dim = mat.shape[1]
        for pdf in batches:
            cells = pd.array([pd.NA] * len(pdf), dtype="Int32")
            vals = [None if v is None else np.asarray(v, dtype=float)
                    for v in pdf[vec_col]]
            labs = pdf[label_col].tolist()
            by_label: dict[str, list[int]] = {}
            for i, v in enumerate(vals):
                if (v is not None and v.ndim == 1 and v.size == dim
                        and labs[i] in rng):
                    by_label.setdefault(labs[i], []).append(i)
            for lab, idxs in by_label.items():
                off, n = rng[lab]
                if n <= 0:
                    continue
                V = np.stack([vals[i] for i in idxs])
                local = (V @ mat[off:off + n].T).argmax(axis=1)
                cells[idxs] = (local + off).astype("int32")
            pdf[cell_col] = cells
            yield pdf

    return df.mapInPandas(gen, schema=out_schema)


def _train_stats(df: DataFrame, vec_col: str,
                 centroids: list[list[float]]) -> tuple[np.ndarray, np.ndarray]:
    """One Lloyd step's sufficient statistics in ONE pass: per-partition
    numpy assign (broadcast matmul) + scatter-added partial (sum, count)
    per cell, reduced driver-side. The shuffle-free replacement of the
    per-dimension avg() aggregation, whose dim separate aggregate
    expressions melt Catalyst at real embedding widths (3072+)."""
    import pandas as pd

    M = _normed_matrix(centroids)
    k, dim = M.shape
    bc = df.sparkSession.sparkContext.broadcast(M)

    def gen(batches):
        mat = bc.value
        sums = np.zeros((k, dim))
        cnts = np.zeros(k, dtype=np.int64)
        for pdf in batches:
            if not len(pdf):
                continue
            # skip NULL / wrong-width vectors: they carry no usable
            # coordinates for a centroid update (np.stack would crash)
            rows = [np.asarray(v, dtype=float) for v in pdf[vec_col]
                    if v is not None]
            rows = [v for v in rows if v.ndim == 1 and v.size == dim]
            if not rows:
                continue
            V = np.stack(rows)
            cells = (V @ mat.T).argmax(axis=1)
            np.add.at(sums, cells, V)
            cnts += np.bincount(cells, minlength=k)
        yield pd.DataFrame({
            "cell": np.arange(k, dtype="int32"),
            "s": [row.tolist() for row in sums],
            "n": cnts,
        })

    parts = df.select(vec_col).mapInPandas(
        gen, schema="cell int, s array<double>, n bigint").collect()
    sums = np.zeros((k, dim))
    cnts = np.zeros(k, dtype=np.int64)
    for r in parts:
        sums[r["cell"]] += np.asarray(r["s"])
        cnts[r["cell"]] += r["n"]
    return sums, cnts


def ivf_train(df: DataFrame, id_col: str, vec_col: str,
              n_cells: int = 16, iters: int = 5,
              seed: int = 42,
              train_sample: int = 65_536,
              _sample: np.ndarray | None = None) -> list[list[float]]:
    """IVF coarse-quantizer training (Lloyd k-means by cosine).

    Default path — SAMPLED DRIVER-SIDE training: ONE Spark pass collects
    a deterministic pseudo-random sample of up to ``train_sample``
    vectors (xxhash64 order, TakeOrdered heap — no full sort), then every
    Lloyd iteration is a local numpy matmul. This is how IVF quantizers
    are trained at billion scale in practice (a bounded sample
    characterizes the density; faiss does the same), and it replaces
    iters+1 cluster jobs with one — on a small nodes table the job
    overhead of the distributed iterations dominates the entire index
    build. 64k × 3072 floats ≈ 1.5 GB driver peak at reference dims;
    lower ``train_sample`` if the driver is tighter.

    ``train_sample=0`` forces the fully-distributed path (training on
    every row):
    - small dims (n_cells*dim <= _EXPR_ASSIGN_LIMIT): expression-only
      argmax over literal centroids + one avg per dimension (map-side
      partial aggregation), whole-stage codegen, no Python;
    - large dims: one numpy mapInPandas pass per iteration computing
      per-partition (cell, sum, count) partials against BROADCAST
      centroids, reduced driver-side — k*dim floats cross the wire per
      partition, nothing enters the expression tree.
    Empty cells keep their previous centroid on every path.

    ``_sample``: pre-collected (n, dim) training matrix (the
    collect_train_sample output) — lets an IVFPQ build share ONE sample
    collection between the IVF and PQ trainers."""
    head = df.select(vec_col).filter(F.col(vec_col).isNotNull()).first()
    if head is None or head[0] is None:
        raise NoVectorsError("ivf_train: input has no non-null vectors "
                             f"in column {vec_col!r}")
    dim = len(head[0])
    # train only on well-formed vectors: a NULL picked by the init sample
    # crashes centroid seeding, and a null/ragged cell assignment has no
    # cell to update (ivf_assign nulls those rows' cells at query time)
    df = df.filter(F.col(vec_col).isNotNull() & (F.size(vec_col) == dim))
    if _sample is not None or (train_sample and train_sample > 0):
        X = _sample if _sample is not None else \
            collect_train_sample(df, vec_col, train_sample, seed, dim)
        return lloyd_kmeans(X, n_cells, iters)
    # SAME ordering key as collect_train_sample, so the sampled path
    # with sample >= table size seeds (and therefore trains) identically
    # to the distributed path — the parity the tests pin
    init = (
        df.select(F.col(vec_col).alias("v"))
        .orderBy(F.xxhash64(F.lit(str(seed)), F.col("v")))
        .limit(n_cells).collect()
    )
    centroids = [list(map(float, r["v"])) for r in init]
    use_expr = n_cells * dim <= _EXPR_ASSIGN_LIMIT
    for _ in range(iters):
        if use_expr:
            assigned = df.select(_cell_col(vec_col, centroids).alias("cell"),
                                 F.col(vec_col).alias("v"))
            rows = (
                assigned.groupBy("cell")
                .agg(*[F.avg(F.col("v")[i]).alias(f"d{i}") for i in range(dim)])
                .collect()
            )
            new = list(centroids)
            for r in rows:
                new[r["cell"]] = [float(r[f"d{i}"]) for i in range(dim)]
            centroids = new
        else:
            sums, cnts = _train_stats(df, vec_col, centroids)
            new = list(centroids)
            for c in range(n_cells):
                if cnts[c] > 0:
                    new[c] = (sums[c] / cnts[c]).tolist()
            centroids = new
    return centroids


def ivf_assign(df: DataFrame, vec_col: str,
               centroids: list[list[float]],
               cell_col: str = "cell") -> DataFrame:
    """Attach the IVF cell id. At scale, write the table partitioned by
    this column so ivf_topk's cell filter becomes partition pruning.
    Small centroid sets stay a pure JVM expression; large ones switch to
    a broadcast numpy matmul (identical argmax up to float tie-breaks)."""
    if len(centroids) * len(centroids[0]) <= _EXPR_ASSIGN_LIMIT:
        return df.withColumn(cell_col, _cell_col(vec_col, centroids))
    return _assign_cells_pandas(df, vec_col, centroids, cell_col)


def _nearest_cells(centroids: list[list[float]], query: list[float],
                   nprobe: int) -> list[int]:
    """Coarse-probe selection shared by ivf_topk / ivfpq_topk: indices of
    the nprobe centroids nearest the query by cosine, index tie-break."""
    q = np.asarray(query, dtype=float)
    qn = np.linalg.norm(q) or 1.0
    sims = []
    for i, c in enumerate(centroids):
        ca = np.asarray(c, dtype=float)
        cn = np.linalg.norm(ca) or 1.0
        sims.append((float(q @ ca / (qn * cn)), i))
    return [i for _, i in
            sorted(sims, key=lambda t: (-t[0], t[1]))[:max(1, nprobe)]]


def ivf_topk(df: DataFrame, id_col: str, vec_col: str,
             centroids: list[list[float]], query: list[float],
             k: int = 10, nprobe: int = 4,
             cell_col: str | None = None) -> DataFrame:
    """Probe the nprobe cells nearest the query (ranked driver-side over
    the tiny centroid set), exact cosine re-rank within. nprobe ==
    len(centroids) degrades to exact brute force."""
    probes = _nearest_cells(centroids, query, nprobe)
    cells = df if cell_col else ivf_assign(df, vec_col, centroids, "_ivf_cell")
    col = cell_col or "_ivf_cell"
    pruned = cells.filter(F.col(col).isin(probes)).drop("_ivf_cell")
    return brute_force_topk(pruned, id_col, vec_col, query, k)


# ---------------------------------------------------------------------------
# Product quantization (PQ) — the memory-scale ANN path
# ---------------------------------------------------------------------------

def pq_train(df: DataFrame, vec_col: str, m: int = 8, k: int = 256,
             sample: int = 10_000, iters: int = 8,
             seed: int = 42,
             _sample: np.ndarray | None = None) -> np.ndarray:
    """Train PQ codebooks: split each (L2-normalized) vector into ``m``
    subspaces, k-means each subspace to ``k`` centroids.

    Returns codebooks of shape (m, k, dim//m). Training runs driver-side
    over a deterministic ≤``sample``-row subset (sha2-ordered, the same
    seeded pseudo-sample ivf_train uses) — at 100 TB the codebook is
    trained once on a sample and broadcast, never on the full table.
    Requires dim % m == 0 (raises otherwise)."""
    head = df.select(F.col(vec_col).alias("v")) \
        .filter(F.col("v").isNotNull()).first()
    if head is None:
        raise NoVectorsError(f"pq_train: no non-null vectors in {vec_col!r}")
    dim = len(head["v"])
    if dim % m:
        raise ValueError(f"pq_train: dim {dim} not divisible by m={m}")
    X = _sample if _sample is not None else \
        collect_train_sample(df, vec_col, sample, seed, dim)
    # (X / norms below allocates a fresh array — a shared _sample is safe)
    norms = np.linalg.norm(X, axis=1)
    norms[norms == 0] = 1.0
    X = X / norms[:, None]
    dsub = dim // m
    k_eff = min(k, len(X))
    rng = np.random.RandomState(seed)
    books = np.zeros((m, k_eff, dsub))
    for s in range(m):
        S = X[:, s * dsub:(s + 1) * dsub]
        cents = S[rng.choice(len(S), size=k_eff, replace=False)]
        for _ in range(iters):
            # matmul form, (n, k) temp only: the broadcast (n, k, dsub)
            # difference tensor would be multi-GB at reference dims
            # (10000×256×384 ≈ 8 GB) — same lesson as _train_stats.
            # ||s||² is constant per row, so argmin needs only
            # ||c||² - 2·S·Cᵀ
            d2 = (cents ** 2).sum(axis=1)[None, :] - 2.0 * (S @ cents.T)
            assign = d2.argmin(axis=1)
            for c in range(k_eff):
                mask = assign == c
                if mask.any():
                    cents[c] = S[mask].mean(axis=0)
        books[s] = cents
    return books


def pq_encode(df: DataFrame, vec_col: str, codebooks: np.ndarray,
              code_col: str = "pq_code") -> DataFrame:
    """Attach the ``m``-byte PQ code (array<int>, one codebook index per
    subspace) for each L2-normalized vector — broadcast numpy, Arrow
    batches, nothing in the plan expression tree. NULL / wrong-width
    vectors get a null code. At scale the stored table carries ONLY
    (id, pq_code): m bytes instead of 4*dim."""
    import pandas as pd
    from pyspark.sql.types import ArrayType, IntegerType, StructField, StructType

    m, k_eff, dsub = codebooks.shape
    dim = m * dsub
    bc = df.sparkSession.sparkContext.broadcast(codebooks)
    out_schema = StructType(list(df.schema.fields)
                            + [StructField(code_col, ArrayType(IntegerType()))])

    def gen(batches):
        books = bc.value
        for pdf in batches:
            codes = [None] * len(pdf)
            vals = [None if v is None else np.asarray(v, dtype=float)
                    for v in pdf[vec_col]]
            ok = [i for i, v in enumerate(vals)
                  if v is not None and v.ndim == 1 and v.size == dim]
            if ok:
                V = np.stack([vals[i] for i in ok])
                norms = np.linalg.norm(V, axis=1)
                norms[norms == 0] = 1.0
                V = V / norms[:, None]
                enc = np.empty((len(ok), m), dtype=np.int64)
                for s in range(m):
                    S = V[:, s * dsub:(s + 1) * dsub]
                    # (batch, k) temp via matmul — the broadcast
                    # difference tensor would OOM executors at real dims
                    d2 = (books[s] ** 2).sum(axis=1)[None, :] \
                        - 2.0 * (S @ books[s].T)
                    enc[:, s] = d2.argmin(axis=1)
                for j, i in enumerate(ok):
                    codes[i] = enc[j].tolist()
            pdf[code_col] = pd.Series(codes, index=pdf.index, dtype=object)
            yield pdf

    return df.mapInPandas(gen, schema=out_schema)


def pq_topk(df: DataFrame, id_col: str, code_col: str,
            codebooks: np.ndarray, query: list[float], k: int = 10,
            candidates: int | None = None,
            vec_col: str | None = None) -> DataFrame:
    """Asymmetric-distance (ADC) top-k over PQ codes: one m × k lookup
    table of query-subvector · centroid dot products is broadcast, each
    code scores as the sum of m table lookups (approximate cosine on
    normalized vectors). With ``vec_col`` present, the top ``candidates``
    (default 10*k) ADC hits are re-ranked by exact cosine — the standard
    two-stage PQ search."""
    m, k_eff, dsub = codebooks.shape
    q = np.asarray(query, dtype=float)
    qn = np.linalg.norm(q) or 1.0
    q = q / qn
    lut = np.stack([codebooks[s] @ q[s * dsub:(s + 1) * dsub]
                    for s in range(m)])          # (m, k_eff)
    # ADC as a JVM expression over the flattened lookup table: each code
    # scores as a sequential sum of m element_at lookups — no Python
    # worker round trip, no per-query sc.broadcast (the old mapInPandas
    # path shipped every probed code through Arrow per query; the m*k
    # LUT is tiny and inlines as one parsed array literal). Null-code
    # rows are dropped exactly like the old notna() filter.
    flat = lut.ravel()
    vals = ", ".join(f"{float(x)!r}D" for x in flat)
    adc = F.expr(
        f"aggregate(zip_with({code_col}, sequence(0, {m - 1}), "
        f"(c, s) -> element_at(array({vals}), "
        f"CAST(s * {k_eff} + c + 1 AS INT))), "
        "0.0D, (acc, x) -> acc + x)")
    out_cols = [id_col] + ([vec_col] if vec_col else [])
    scored = (df.filter(F.col(code_col).isNotNull())
              .select(*out_cols, adc.alias("adc")))
    n_cand = candidates or 10 * k
    top = scored.orderBy(F.col("adc").desc(), F.col(id_col)).limit(n_cand)
    if vec_col is None:
        return top.select(id_col, F.col("adc").alias("score")).limit(k)
    return (top.select(F.col(id_col),
                       cosine_score(vec_col, query).alias("score"))
            .orderBy(F.col("score").desc(), F.col(id_col)).limit(k))


def ivfpq_topk(df: DataFrame, id_col: str, code_col: str,
               centroids: list[list[float]], codebooks: np.ndarray,
               query: list[float], k: int = 10, nprobe: int = 4,
               cell_col: str = "cell",
               candidates: int | None = None,
               vec_col: str | None = None) -> DataFrame:
    """IVF + PQ composed — the standard billion-scale ANN shape: prune to
    the ``nprobe`` nearest coarse cells (partition pruning when the table
    is written partitioned by ``cell_col``), then ADC-score only those
    cells' m-byte codes, optionally exact-reranking with ``vec_col``.
    Scan cost ≈ (nprobe/n_cells) · n · m bytes."""
    probes = _nearest_cells(centroids, query, nprobe)
    pruned = df.filter(F.col(cell_col).isin(probes))
    return pq_topk(pruned, id_col, code_col, codebooks, query, k,
                   candidates=candidates, vec_col=vec_col)


def reciprocal_best_match(left: DataFrame, right: DataFrame, *,
                          left_id: str = "lid", left_vec: str = "lv",
                          right_id: str = "rid", right_vec: str = "rv",
                          candidates: DataFrame | None = None,
                          min_score: float | None = None) -> DataFrame:
    """Mutual-nearest-neighbor alignment between two embedding sets ->
    (left_id, right_id, score): keep a pair only when each side is the
    other's single best cosine match — the standard high-precision
    seed-pair extractor for entity alignment across two KGs /
    languages / snapshots (one-sided best-match is noisy; mutuality is
    the cheap filter that makes the pairs trustworthy enough to train
    or merge on).

    Ranking uses the ROUNDED (4dp) cosine with the partner id as the
    tie-break — the same total-order convention as hard_negatives, so
    the selection is deterministic and exactly SQL-replayable.
    ``min_score`` drops weak pairs before ranking (a mutual-best pair
    at cosine 0.02 is mutual noise).

    Scale: by default the RIGHT side broadcasts against the left (use
    it when one side is batch-sized — the common "align the new
    snapshot's novel entities" shape). For big-x-big, pass
    ``candidates`` (left_id, right_id) from a blocker (LSH bands /
    IVF cells / shared tokens) and scoring becomes two equi-joins on
    the candidate pairs; mutuality is then mutual-best WITHIN the
    candidate set, exactly what an aligner wants from its blocker.
    """
    from pyspark.sql import Window

    l = left.select(F.col(left_id).alias("_lid"),
                    F.col(left_vec).alias("_lv"))
    r = right.select(F.col(right_id).alias("_rid"),
                     F.col(right_vec).alias("_rv"))
    if candidates is not None:
        pairs = (candidates.select(F.col(left_id).alias("_lid"),
                                   F.col(right_id).alias("_rid"))
                 .distinct()
                 .join(l, "_lid").join(r, "_rid"))
    else:
        pairs = l.crossJoin(F.broadcast(r))
    scored = pairs.select(
        "_lid", "_rid",
        F.round(pairwise_cosine(F.col("_lv"), F.col("_rv")), 4)
        .alias("score"))
    if min_score is not None:
        scored = scored.filter(F.col("score") >= float(min_score))
    wl = Window.partitionBy("_lid").orderBy(F.desc("score"),
                                            F.asc("_rid"))
    wr = Window.partitionBy("_rid").orderBy(F.desc("score"),
                                            F.asc("_lid"))
    best = (scored.withColumn("_rl", F.row_number().over(wl))
            .withColumn("_rr", F.row_number().over(wr))
            .filter((F.col("_rl") == 1) & (F.col("_rr") == 1)))
    return best.select(F.col("_lid").alias(left_id),
                       F.col("_rid").alias(right_id), "score")


def sq8_stats(df: DataFrame, vec_col: str) -> DataFrame:
    """Per-dimension (min, max) over the corpus — the SQ8 codebook.
    ONE posexplode + hash agg (map-combinable) + a bounded collect into
    a 1-row frame; at 10^9 vectors this is a single pass. Values are
    widened float->double BEFORE aggregation (float32 is exactly
    representable in double, so min/max are exact and engine-portable).

    Returns one row (mins array<double>, maxs array<double>)."""
    per_dim = (df.select(F.posexplode(vec_col).alias("d", "x"))
               .select("d", F.col("x").cast("double").alias("x"))
               .groupBy("d").agg(F.min("x").alias("mn"),
                                 F.max("x").alias("mx")))
    return per_dim.agg(
        F.transform(F.array_sort(F.collect_list(
            F.struct("d", "mn"))), lambda s: s["mn"]).alias("mins"),
        F.transform(F.array_sort(F.collect_list(
            F.struct("d", "mx"))), lambda s: s["mx"]).alias("maxs"))


def sq8_encode(df: DataFrame, id_col: str, vec_col: str,
               stats: DataFrame | None = None) -> DataFrame:
    """8-bit scalar quantization (faiss SQ8): each dimension maps
    linearly onto 0..255 between its corpus (min, max) — 4x smaller
    than float32 residency with none of PQ's codebook training, the
    standard first memory rung before IVFPQ. The rounding is the
    engine-portable floor(t*255 + 0.5) (double arithmetic end to end);
    a degenerate dimension (max == min) encodes to 0.

    Returns (id, codes array<int>). Pass a precomputed ``stats``
    (from :func:`sq8_stats`) to encode a delta batch against the
    COMMITTED codebook — the incremental path must not re-derive
    per-dim ranges from the batch, or old and new codes stop being
    comparable."""
    stats = sq8_stats(df, vec_col) if stats is None else stats
    enc = F.zip_with(
        F.zip_with(F.col(vec_col),
                   F.col("mins"),
                   lambda x, mn: x.cast("double") - mn),
        F.zip_with(F.col("maxs"), F.col("mins"), lambda a, b: a - b),
        lambda t, s: F.when(
            s > 0,
            F.greatest(F.lit(0), F.least(F.lit(255), F.floor(
                t / s * 255.0 + 0.5).cast("int"))))
        .otherwise(F.lit(0)))
    return (df.crossJoin(F.broadcast(stats))
            .select(F.col(id_col), enc.alias("codes")))


def sq8_topk(df: DataFrame, id_col: str, vec_col: str,
             query: list[float], k: int = 10,
             round_scores: int | None = None) -> DataFrame:
    """Asymmetric SQ8 search: the corpus lives as 8-bit codes, the
    query stays float, scores are cosine(query, decode(codes)) —
    exactly what a code-resident index serves, so the scores (and any
    quantization error) are the REAL ones, bit-replayable by the
    oracle. decode(c) = min_d + c/255·(max_d − min_d), double
    arithmetic. orderBy+limit compiles to TakeOrderedAndProject."""
    # checkpoint the 1-row codebook: it feeds BOTH the encode join and
    # the decode join — uncached, the full-corpus min/max scan would
    # run twice
    stats = sq8_stats(df, vec_col).localCheckpoint()
    codes = sq8_encode(df, id_col, vec_col, stats)
    # decode needs all three arrays; nest (min, span) into one zip_with
    dec = F.zip_with(
        F.col("codes"),
        F.zip_with(F.col("mins"), F.col("maxs"),
                   lambda mn, mx: F.struct(mn.alias("mn"),
                                           (mx - mn).alias("span"))),
        lambda c, s: s["mn"] + c.cast("double") / 255.0 * s["span"])
    qn = float(np.sqrt(sum(float(x) * float(x) for x in query))) or 1.0
    q = [float(x) for x in query]
    dot = F.aggregate(
        F.zip_with(dec, F.array(*[F.lit(x) for x in q]),
                   lambda a, b: a * b),
        F.lit(0.0), lambda acc, v: acc + v)
    nrm = F.sqrt(F.aggregate(
        F.zip_with(dec, dec, lambda a, b: a * b),
        F.lit(0.0), lambda acc, v: acc + v))
    score = F.when(nrm > 0, dot / (nrm * F.lit(qn))).otherwise(F.lit(0.0))
    if round_scores is not None:
        # round BEFORE the sort: near-tie scores that agree at the
        # serving precision then order by id on every engine — the
        # boundary of the top-k stops depending on last-ulp fma noise
        score = F.round(score, round_scores)
    return (codes.crossJoin(F.broadcast(stats))
            .select(F.col(id_col), score.alias("score"))
            .orderBy(F.col("score").desc(), F.col(id_col))
            .limit(k))
