"""Temporal joins — the as-of join Spark's built-in operators lack.

An as-of join attaches to every left row the single most recent right
row at-or-before its timestamp (per key) — the point-in-time lookup of
feature stores ("the user's profile as it was when the event fired"),
market data (trade ⋈ latest quote), and slowly-changing dimensions.
Spark has no native ASOF JOIN (DuckDB/Pandas do); the naive range-join
encoding explodes to O(|L|·|R|) per key and plans as a nested loop.

This implementation is the union + running-window form: tag both
sides, union them, and take per key the last right payload seen in
timestamp order — ONE shuffle, no range explosion, O((|L|+|R|) log p)
work. The same shape handles forward as-of (next event at-or-after) by
reversing the order.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(left: DataFrame, right: DataFrame,
              key_cols: str | list[str], ts_col: str, *,
              direction: str = "backward",
              tolerance: str | None = None,
              suffix: str = "_r") -> DataFrame:
    """Pandas ``merge_asof`` / DuckDB ``ASOF JOIN`` semantics on
    DataFrames: every left row exactly once, joined to the single
    right row with the largest right ts <= left ts (``backward``; ties
    at equal ts match — inclusive, like DuckDB's ``l.ts >= r.ts``) or
    the smallest right ts >= left ts (``forward``), per ``key_cols``.
    Unmatched left rows keep NULL right columns (left-join semantics).

    Output: all left columns, plus every non-key right column renamed
    with ``suffix`` (the right timestamp becomes ``{ts_col}{suffix}``).
    ``tolerance`` (a SQL interval, e.g. ``'2 hours'``) NULLs the match
    when it is farther than that from the left timestamp — the pandas
    ``merge_asof(tolerance=...)`` contract (the row survives; the
    match doesn't).

    Right rows with NULL timestamps are dropped (an unknown event time
    can't be "most recent"); left rows with NULL timestamps survive
    unmatched. NULL keys group together (SQL window semantics), so
    null-keyed left rows match null-keyed right rows — pre-filter if
    that's not wanted.

    Scale shape: tag-and-union both sides, then ONE window per key in
    (ts, side) order carrying the last non-null right payload — a
    single hash shuffle of |L|+|R| rows and a per-key sort; never the
    O(|L|·|R|) range-join explosion, never a nested-loop plan. Caveat:
    a pathologically hot key serializes into one partition's sort (the
    window's inherent skew); pre-split such keys by time bucket and
    carry each bucket's last right row forward if one key dominates.
    """
    if direction not in ("backward", "forward"):
        raise ValueError(
            f"direction must be 'backward' or 'forward', got {direction!r}")
    keys = [key_cols] if isinstance(key_cols, str) else list(key_cols)
    for c in keys + [ts_col]:
        if c not in left.columns or c not in right.columns:
            raise ValueError(f"column {c!r} must exist on both sides "
                             f"(left {left.columns}, right {right.columns})")
    lpay_cols = [c for c in left.columns if c not in keys]
    rpay_cols = [c for c in right.columns if c not in keys]
    out_rename = {c: c + suffix for c in rpay_cols}
    clash = [out_rename[c] for c in rpay_cols
             if out_rename[c] in left.columns]
    if clash:
        raise ValueError(f"suffixed right columns collide with left "
                         f"columns: {clash} (change suffix=)")

    lstruct = left.select(F.struct(*lpay_cols).alias("s")) \
        .schema["s"].dataType
    rstruct = right.select(F.struct(*rpay_cols).alias("s")) \
        .schema["s"].dataType
    l2 = left.select(
        *keys, F.col(ts_col).alias("_ats"), F.lit(1).alias("_is_left"),
        F.struct(*lpay_cols).alias("_lpay"),
        F.lit(None).cast(rstruct).alias("_rpay"))
    r2 = right.filter(F.col(ts_col).isNotNull()).select(
        *keys, F.col(ts_col).alias("_ats"), F.lit(0).alias("_is_left"),
        F.lit(None).cast(lstruct).alias("_lpay"),
        F.struct(*rpay_cols).alias("_rpay"))

    # backward: ascending ts — the running last right payload is the
    # most recent at-or-before (right sorts before left at equal ts =>
    # inclusive). forward: descending ts, same logic mirrored.
    ts_order = F.col("_ats").asc_nulls_first() if direction == "backward" \
        else F.col("_ats").desc_nulls_first()
    w = (Window.partitionBy(*keys)
         .orderBy(ts_order, F.col("_is_left").asc())
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    u = l2.unionByName(r2).withColumn(
        "_m", F.last("_rpay", ignorenulls=True).over(w))

    if tolerance is not None:
        bound = F.expr(f"INTERVAL {tolerance}")
        m_ts = F.col("_m")[ts_col]
        ok = (m_ts >= F.col("_ats") - bound) if direction == "backward" \
            else (m_ts <= F.col("_ats") + bound)
        u = u.withColumn("_m", F.when(ok, F.col("_m")))

    return u.filter(F.col("_is_left") == 1).select(
        *keys,
        *[F.col("_lpay")[c].alias(c) for c in lpay_cols],
        *[F.col("_m")[c].alias(out_rename[c]) for c in rpay_cols],
    ).select(  # restore the caller's left column order
        *[c for c in left.columns],
        *[out_rename[c] for c in rpay_cols])


def range_join(points: DataFrame, intervals: DataFrame,
               key_cols: str | list[str] | None, *,
               ts_col: str, start_col: str, end_col: str,
               bucket_seconds: int = 3600,
               max_buckets_per_interval: int = 4096,
               suffix: str = "_r") -> DataFrame:
    """Interval-containment join: every point row paired with every
    interval row (same ``key_cols``, if given) whose half-open range
    ``[start_col, end_col)`` contains ``ts_col`` — campaign windows ⋈
    events, maintenance windows ⋈ alerts, validity ranges ⋈ readings.

    Spark plans a raw BETWEEN predicate as a nested loop (O(|P|·|I|)
    per key); this is the BUCKETIZED form (the same trick as
    Databricks' range-join bins): each interval explodes into the
    ``bucket_seconds``-wide epoch buckets it covers, each point maps
    to its single bucket, and the join is a hash EQUI join on
    (keys…, bucket) with the exact range check as a post-filter. Each
    qualifying pair matches in exactly one bucket (the point's), so no
    dedup pass is needed.

    Cost scales with interval_length / bucket_seconds — pick a bucket
    near the typical interval length (candidate fan-out ≈ 2×|I| then).
    An interval spanning more than ``max_buckets_per_interval`` buckets
    raises in-plan (assert_true): a mis-set bucket against month-long
    intervals silently exploding 10^5× is the failure mode this guards.
    Degenerate intervals (``end <= start``) match nothing; NULL
    endpoints or timestamps match nothing.

    Output: all point columns, then every non-key interval column
    renamed with ``suffix``.
    """
    if bucket_seconds < 1:
        raise ValueError(f"bucket_seconds must be >= 1, got {bucket_seconds}")
    keys = [] if key_cols is None else (
        [key_cols] if isinstance(key_cols, str) else list(key_cols))
    for c in keys:
        if c not in points.columns or c not in intervals.columns:
            raise ValueError(f"key {c!r} must exist on both sides")
    ipay = [c for c in intervals.columns if c not in keys]
    rename = {c: c + suffix for c in ipay}
    clash = [rename[c] for c in ipay if rename[c] in points.columns]
    if clash:
        raise ValueError(f"suffixed interval columns collide with point "
                         f"columns: {clash} (change suffix=)")
    bus = int(bucket_seconds) * 1_000_000

    b0 = F.floor(F.unix_micros(F.col(start_col)) / bus)
    # end is EXCLUSIVE: the last covered microsecond is end - 1
    b1 = F.floor((F.unix_micros(F.col(end_col)) - 1) / bus)
    n_b = b1 - b0 + 1
    # the guard must be LOAD-BEARING (folded into the bucket arithmetic)
    # or Catalyst column-prunes it away: assert_true yields NULL when the
    # bound holds, so coalesce(assert, 0) is an add-zero that raises on
    # oversized intervals
    guard = F.coalesce(
        F.assert_true(
            n_b <= max_buckets_per_interval,
            "range_join: an interval spans more than "
            f"{max_buckets_per_interval} buckets of {bucket_seconds}s "
            "— raise bucket_seconds or max_buckets_per_interval",
        ).cast("bigint"),
        F.lit(0).cast("bigint"))
    iv = (
        intervals
        .filter(F.col(start_col).isNotNull() & F.col(end_col).isNotNull()
                & (F.col(end_col) > F.col(start_col)))
        .withColumn("_b", F.explode(F.sequence(b0 + guard, b1)))
        .select(*keys, "_b",
                *[F.col(c).alias(rename[c]) for c in ipay])
    )
    pt = points.filter(F.col(ts_col).isNotNull()).withColumn(
        "_b", F.floor(F.unix_micros(F.col(ts_col)) / bus))
    out = pt.join(iv, keys + ["_b"]).filter(
        (F.col(ts_col) >= F.col(rename[start_col]))
        & (F.col(ts_col) < F.col(rename[end_col])))
    return out.select(*points.columns, *[rename[c] for c in ipay])


_UNIT_SECONDS = {
    "second": 1, "seconds": 1, "minute": 60, "minutes": 60,
    "hour": 3600, "hours": 3600, "day": 86400, "days": 86400,
    "week": 604800, "weeks": 604800,
}


def _duration_seconds(s: str) -> int:
    parts = s.strip().lower().split()
    if len(parts) != 2 or not parts[0].isdigit() or \
            parts[1] not in _UNIT_SECONDS:
        raise ValueError(
            f"duration must look like '5 minutes' / '1 hour', got {s!r}")
    return int(parts[0]) * _UNIT_SECONDS[parts[1]]


def time_rollup(events: DataFrame, ts_col: str, value_col: str,
                levels: list[str] | tuple[str, ...] = (
                    "1 hour", "6 hours", "1 day"),
                group_cols: str | list[str] | None = None) -> DataFrame:
    """Hypertable-style continuous-aggregate rollup: tumbling-window
    counts/sums at every resolution in ``levels``, where each COARSER
    level re-aggregates the next finer level's buckets instead of
    rescanning the raw events — the TimescaleDB hierarchical
    continuous-aggregate shape. Raw data is touched exactly once (the
    finest level); a day bucket then sums 24 hour-rows, not 10^9
    events, which is what makes multi-resolution dashboards and
    incremental refresh viable at 100 TB (refresh the finest level for
    the new time range, and the coarser levels refresh from O(buckets)
    rows).

    Every level must be an integer multiple of the finest level (so
    fine buckets nest exactly into coarse ones — validated loudly);
    buckets align to the 1970 epoch (Spark ``window()`` semantics).
    Returns (level, bucket_start, *group_cols, n, v_sum) for all
    levels unioned, counts/sums over ``value_col`` (NULL values count
    toward ``n`` but not ``v_sum`` — plain SQL SUM semantics).
    """
    if not levels:
        raise ValueError("levels must be non-empty")
    secs = [_duration_seconds(lv) for lv in levels]
    order = sorted(range(len(levels)), key=lambda i: secs[i])
    finest = secs[order[0]]
    for i in order[1:]:
        if secs[i] % finest:
            raise ValueError(
                f"level {levels[i]!r} is not a multiple of the finest "
                f"level {levels[order[0]]!r} — buckets would not nest")
    groups = [] if group_cols is None else (
        [group_cols] if isinstance(group_cols, str) else list(group_cols))

    ev = events.withColumn("_ts", F.col(ts_col).cast("timestamp"))
    fine = (
        ev.groupBy(F.window("_ts", levels[order[0]]).alias("_w"), *groups)
        .agg(F.count("*").alias("n"), F.sum(value_col).alias("v_sum"))
        .select(F.col("_w.start").alias("bucket_start"), *groups,
                "n", "v_sum")
    )
    out = fine.withColumn("level", F.lit(levels[order[0]]))
    for i in order[1:]:
        coarse = (
            fine.groupBy(F.window("bucket_start", levels[i]).alias("_w"),
                         *groups)
            .agg(F.sum("n").alias("n"), F.sum("v_sum").alias("v_sum"))
            .select(F.col("_w.start").alias("bucket_start"), *groups,
                    "n", "v_sum")
            .withColumn("level", F.lit(levels[i]))
        )
        out = out.unionByName(coarse)
    return out.select("level", "bucket_start", *groups, "n", "v_sum")


def rolling_zscore_anomalies(events: DataFrame, ts_col: str, key_col: str,
                             *, bucket: str = "1 hour", window: int = 24,
                             min_periods: int = 8,
                             z_threshold: float = 3.0) -> DataFrame:
    """Per-key event-rate anomaly detection: bucket events into fixed
    time windows, DENSIFY the bucket grid (a silent hour is a zero, not
    a missing row — an outage IS an anomaly), and score each bucket's
    count against the mean/stddev of the ``window`` buckets strictly
    before it. ``anomaly`` is true when at least ``min_periods`` prior
    buckets exist, the trailing variance is positive, and
    ``|z| >= z_threshold``.

    Replayability: mean and variance are derived from the frame's
    INTEGER sums (n, sum, sum of squares) with one fixed expression —
    ``mean = s/n``, ``var = (ss - s*s/n) / (n-1)`` — so any engine
    computing the same int64 sums lands on bit-identical doubles (no
    dependence on a stddev aggregate's internal accumulation order).

    Scale: one map-combinable count agg on (key, bucket); the dense
    grid is one sequence-explode per key (rows = time range / bucket,
    independent of event count); the rolling frame is a per-key window
    sort — partitioned by key, never global. Row frames equal time
    frames because the grid is dense."""
    if window < 1:
        raise ValueError(f"window must be >= 1, got {window}")
    if min_periods < 2:
        raise ValueError(
            f"min_periods must be >= 2 (variance needs it), "
            f"got {min_periods}")
    counts = (events
              .filter(F.col(ts_col).isNotNull()
                      & F.col(key_col).isNotNull())
              .groupBy(F.col(key_col).alias("key"),
                       F.window(F.col(ts_col), bucket)
                       .getField("start").alias("bucket_ts"))
              .agg(F.count("*").alias("cnt")))
    grid = (counts.groupBy("key")
            .agg(F.min("bucket_ts").alias("t0"),
                 F.max("bucket_ts").alias("t1"))
            .select("key", F.explode(F.sequence(
                "t0", "t1", F.expr(f"interval {bucket}")))
                .alias("bucket_ts")))
    dense = (grid.join(counts, ["key", "bucket_ts"], "left")
             .select("key", "bucket_ts",
                     F.coalesce("cnt", F.lit(0)).alias("cnt")))
    w = (Window.partitionBy("key").orderBy("bucket_ts")
         .rowsBetween(-window, -1))
    n = F.count("cnt").over(w)
    s = F.sum("cnt").over(w)
    ss = F.sum(F.col("cnt") * F.col("cnt")).over(w)
    stats = dense.select(
        "key", "bucket_ts", "cnt",
        n.alias("n_prior"), s.alias("_s"), ss.alias("_ss"))
    mean = F.col("_s") / F.col("n_prior")
    var = ((F.col("_ss") - F.col("_s") * F.col("_s") / F.col("n_prior"))
           / (F.col("n_prior") - 1))
    scored = stats.withColumn(
        "mean_prior",
        F.when(F.col("n_prior") >= 1, mean)).withColumn(
        "var_prior",
        F.when(F.col("n_prior") >= 2, var))
    z = F.when(
        (F.col("n_prior") >= min_periods) & (F.col("var_prior") > 0),
        (F.col("cnt") - F.col("mean_prior"))
        / F.sqrt(F.col("var_prior")))
    return (scored.withColumn("z", z)
            .select("key", "bucket_ts", "cnt", "n_prior",
                    "mean_prior", "var_prior", "z",
                    F.coalesce(F.abs(F.col("z"))
                               >= F.lit(float(z_threshold)),
                               F.lit(False)).alias("anomaly")))
