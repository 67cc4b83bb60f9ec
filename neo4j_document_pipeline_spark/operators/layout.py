"""Multi-dimensional data layout: Z-order (Morton) clustering keys.

At 100 TB the single biggest read-path lever after partition pruning
is FILE SKIPPING on min/max column statistics — and min/max stats
only prune when the layout CLUSTERS each column. Sorting clusters one
column perfectly and leaves every other column spanning the full
range in every file; interleaving the bits of several columns
(Z-order / Morton order — the public technique behind Delta Lake's
OPTIMIZE ZORDER BY and Iceberg's sort-order zorder transform) bounds
EVERY participating column's min/max width in every file to ~range /
2^(bits_per_file / n_cols).

``zorder_key`` computes the Morton key with EXACT integer arithmetic:

    bucket_c = (x_c - min_c) * 2^bits DIV (max_c - min_c + 1)
    z        = Σ_c Σ_j  bit_j(bucket_c) << (j * n_cols + c)

Min/max ride the plan as a broadcast 1-row aggregate (no driver
action); integer DIV makes the bucketing bit-reproducible across
engines — the DuckDB oracle replays it verbatim. Write path:
``df.repartitionByRange(N, "zkey")`` then sortWithinPartitions on
zkey — range boundaries on z ARE rectangles in the original space.

``zorder_partition_stats`` is the evidence half: bucket rows by the
TOP bits of z (exactly what range-partitioning the z space does),
measure each bucket's per-column min/max width, and report the mean
fraction of the global range a bucket covers per column. Under a
linear sort the non-leading columns' fraction is ~1.0; under
Z-order every column's fraction shrinks toward 2^-(prefix_bits /
n_cols) — the number that turns "Z-order helps skipping" from a
claim into a measured invariant.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def zorder_key(df: DataFrame, cols: list[str], *, bits: int = 16,
               out_col: str = "zkey") -> DataFrame:
    """Append an exact-integer Morton key over ``cols`` (numeric,
    cast to bigint; nulls map to bucket 0 — they sort first, as in a
    null-first sort layout). ``bits`` per column; n_cols * bits must
    fit in a signed 64-bit key.
    """
    n = len(cols)
    if n == 0:
        raise ValueError("zorder_key needs at least one column")
    if n * bits > 63:
        raise ValueError(f"{n} cols x {bits} bits exceeds the 63-bit "
                         f"signed key budget")
    # one broadcast row carrying every column's min/max
    stats = df.agg(*[a for c in cols
                     for a in (F.min(F.col(c).cast("bigint")).alias(f"_mn_{c}"),
                               F.max(F.col(c).cast("bigint")).alias(f"_mx_{c}"))])
    out = df.crossJoin(F.broadcast(stats))
    z = F.lit(0).cast("bigint")
    scale = F.lit(1 << bits).cast("bigint")
    for ci, c in enumerate(cols):
        x = F.col(c).cast("bigint")
        mn, mx = F.col(f"_mn_{c}"), F.col(f"_mx_{c}")
        # bucketing runs as (x-mn)*2^bits / (range+1) in DOUBLE, which
        # is exactly floor division only while the numerator stays
        # inside 2^53 — guard it IN-PLAN (the min/max live in the plan,
        # not the driver), load-bearing via the same coalesce(assert,0)
        # add-zero trick as range_join so Catalyst can't prune it
        guard = F.coalesce(
            F.assert_true(
                (mx - mn + 1) <= F.lit(1 << (53 - bits)).cast("bigint"),
                f"zorder_key: column range exceeds 2^{53 - bits} — "
                f"the {bits}-bit bucketing would lose exactness; "
                "pre-bucket the column or lower bits",
            ).cast("bigint"),
            F.lit(0).cast("bigint"))
        # exact integer bucketing: (x-mn)*2^bits DIV (range+1) in
        # [0, 2^bits-1]; constant columns (range 0) bucket to 0
        bucket = F.when(
            x.isNull(), F.lit(0).cast("bigint")
        ).otherwise(F.floor((x - mn + guard) * scale
                            / (mx - mn + 1)).cast("bigint"))
        for j in range(bits):
            bit = F.shiftright(bucket, j).bitwiseAND(F.lit(1).cast("bigint"))
            z = z.bitwiseOR(F.shiftleft(bit, j * n + ci))
    return out.withColumn(out_col, z).drop(
        *[f"_mn_{c}" for c in cols], *[f"_mx_{c}" for c in cols])


def zorder_partition_stats(df: DataFrame, cols: list[str], *,
                           bits: int = 16, prefix_bits: int = 4) -> DataFrame:
    """Skipping evidence: bucket rows by the top ``prefix_bits`` of
    their Morton key (the buckets a range partitioner on z would
    cut), and per column report the MEAN fraction of the global range
    a bucket's [min, max] spans, plus bucket count and rows.

    Output: one row per column —
    (col, n_buckets, n_rows, mean_span_fraction).
    A perfect linear sort on col_0 gives col_0 ~1/n_buckets and every
    other column ~1.0; Z-order gives every column
    ~2^-(prefix_bits / n_cols). Pure aggregation over the keyed frame.
    """
    n = len(cols)
    keyed = zorder_key(df, cols, bits=bits, out_col="_z")
    bucket = F.shiftright(F.col("_z"), n * bits - prefix_bits)
    per_bucket = (keyed.withColumn("_zb", bucket)
                  .groupBy("_zb")
                  .agg(F.count(F.lit(1)).alias("_rows"),
                       *[a for c in cols
                         for a in (F.min(F.col(c).cast("bigint")).alias(f"_bmn_{c}"),
                                   F.max(F.col(c).cast("bigint")).alias(f"_bmx_{c}"))]))
    gstats = df.agg(*[a for c in cols
                      for a in (F.min(F.col(c).cast("bigint")).alias(f"_gmn_{c}"),
                                F.max(F.col(c).cast("bigint")).alias(f"_gmx_{c}"))])
    joined = per_bucket.crossJoin(F.broadcast(gstats))
    per_col = []
    for c in cols:
        frac = ((F.col(f"_bmx_{c}") - F.col(f"_bmn_{c}") + 1).cast("double")
                / (F.col(f"_gmx_{c}") - F.col(f"_gmn_{c}") + 1))
        per_col.append(joined.select(
            F.lit(c).alias("col"), F.col("_rows"), frac.alias("_frac")))
    allc = per_col[0]
    for p in per_col[1:]:
        allc = allc.unionByName(p)
    return (allc.groupBy("col")
            .agg(F.count(F.lit(1)).alias("n_buckets"),
                 F.sum("_rows").alias("n_rows"),
                 F.avg("_frac").alias("mean_span_fraction")))
