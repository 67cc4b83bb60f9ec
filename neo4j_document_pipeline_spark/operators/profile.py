"""One-pass column profiling — the data-quality census of a table.

Per column: row/null counts, lexicographic min/max of the string form,
numeric min/max/mean for numeric columns, and a DETERMINISTIC KMV
distinct-count estimate (exact below the sketch size) — the profile a
pipeline prints before committing to a partitioning or join strategy
(skewed key? constant column? null-riddled feature?).

Scale design: the table is melted to (column, value) rows — a narrow
projection, no shuffle — then everything is two aggregates keyed by
column name: one plain stats agg and one bottom-k sketch agg (reusing
``kmv_sketch``), joined on the column name (#columns rows — trivially
broadcast). Work is O(rows × profiled columns); nothing is collected.
The distinct estimate reuses the engine's sha256 KMV construction so
any engine replays it bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

_NUMERIC_TYPES = (T.ByteType, T.ShortType, T.IntegerType, T.LongType,
                  T.FloatType, T.DoubleType, T.DecimalType)


def profile_columns(df: DataFrame, cols: list[str] | None = None, *,
                    k: int = 64, salt: str = "v1") -> DataFrame:
    """Profile ``cols`` (default: every column) of ``df``.

    Returns one row per column: (col_name, n_rows, n_null, null_frac,
    distinct_est, distinct_exact [true when the sketch saw fewer than
    k distinct values, making the estimate exact], min_str, max_str,
    min_num, max_num, mean_num). Numeric stats are NULL for
    non-numeric columns — the numeric cast is decided from the SCHEMA
    at plan time, never by runtime string coercion, so a string column
    of digit characters stays a string (no engine-specific TRY_CAST
    drift). ``mean_num`` is sum/count over doubles — exact for
    integral columns below 2^53.

    String forms use ``CAST(col AS STRING)``; for timestamp columns
    the rendered format is engine-specific, so cross-engine replay of
    their distinct estimate requires pre-formatting (document columns
    here are strings/ints). NULLs are excluded from min/max/distinct
    (SQL semantics) but counted in n_null."""
    from neo4j_document_pipeline_spark.operators.sketches import kmv_sketch

    names = list(cols) if cols is not None else list(df.columns)
    if not names:
        raise ValueError("no columns to profile")
    missing = [c for c in names if c not in df.columns]
    if missing:
        raise ValueError(f"columns not in frame: {missing}")
    by_name = {f.name: f.dataType for f in df.schema.fields}

    structs = []
    for c in names:
        is_num = isinstance(by_name[c], _NUMERIC_TYPES)
        structs.append(F.struct(
            F.lit(c).alias("col_name"),
            F.col(c).cast("string").alias("sval"),
            (F.col(c).cast("double") if is_num
             else F.lit(None).cast("double")).alias("dval")))
    melt = df.select(F.explode(F.array(*structs)).alias("m")) \
        .select("m.col_name", "m.sval", "m.dval")

    stats = melt.groupBy("col_name").agg(
        F.count("*").alias("n_rows"),
        F.sum(F.when(F.col("sval").isNull(), 1).otherwise(0))
        .alias("n_null"),
        F.min("sval").alias("min_str"),
        F.max("sval").alias("max_str"),
        F.min("dval").alias("min_num"),
        F.max("dval").alias("max_num"),
        F.sum("dval").alias("_dsum"),
        F.count("dval").alias("_dn"))
    sk = kmv_sketch(melt, "col_name", "sval", k=k, salt=salt).select(
        "col_name", F.col("estimate").alias("distinct_est"),
        (F.col("n_min") < k).alias("distinct_exact"))
    return (stats.join(sk, "col_name", "left")
            .select(
                "col_name", "n_rows", "n_null",
                (F.col("n_null") / F.col("n_rows")).alias("null_frac"),
                F.coalesce("distinct_est", F.lit(0.0))
                .alias("distinct_est"),
                F.coalesce("distinct_exact", F.lit(True))
                .alias("distinct_exact"),
                "min_str", "max_str", "min_num", "max_num",
                F.when(F.col("_dn") > 0,
                       F.col("_dsum") / F.col("_dn")).alias("mean_num")))


def psi_drift(baseline: DataFrame, current: DataFrame, col: str, *,
              smoothing: float = 0.5) -> DataFrame:
    """Population Stability Index between two snapshots of a
    CATEGORICAL column — the drift alarm a continuously-ingesting
    corpus runs per batch (language mix shifting, a domain suddenly
    dominating, a quality-label distribution sliding): per category
    (p - q)·ln(p/q), summed; the banking-scorecard convention reads
    < 0.1 stable, 0.1–0.25 drifting, > 0.25 broken.

    Categories are the UNION of both sides; counts get ``smoothing``
    added (Laplace) so a category present in exactly one side —
    precisely the drift you most want to catch — contributes a finite
    term instead of ±inf. Proportions use the smoothed totals, so each
    side's p's still sum to 1 and the index stays exactly replayable:
    two hash aggregates (map-combinable), a category-sized full-outer
    join, one sum. NULL category is a real category (nulls appearing
    IS drift).

    Returns per-category rows (category, n_base, n_cur, p_base, p_cur,
    psi_term) — sum psi_term for the index; keeping terms visible shows
    WHICH categories moved, which is the actionable half."""
    if smoothing <= 0:
        raise ValueError(f"smoothing must be > 0, got {smoothing}")
    key = F.col(col).cast("string")
    b = (baseline.groupBy(key.alias("category"))
         .agg(F.count(F.lit(1)).alias("n_base")))
    c = (current.groupBy(key.alias("category"))
         .agg(F.count(F.lit(1)).alias("n_cur")))
    # null-safe join: a NULL category is one category, not two
    # unmatched rows (nulls APPEARING on one side is exactly the drift
    # this exists to catch)
    both = (b.join(c, b["category"].eqNullSafe(c["category"]),
                   "full_outer")
            .select(F.coalesce(b["category"], c["category"])
                    .alias("category"),
                    F.coalesce("n_base", F.lit(0)).alias("n_base"),
                    F.coalesce("n_cur", F.lit(0)).alias("n_cur")))
    tot = both.agg(
        F.sum("n_base").alias("tb"), F.sum("n_cur").alias("tc"),
        F.count(F.lit(1)).alias("k"))
    s = F.lit(float(smoothing))
    out = both.crossJoin(F.broadcast(tot))
    p = (F.col("n_base") + s) / (F.col("tb") + s * F.col("k"))
    q = (F.col("n_cur") + s) / (F.col("tc") + s * F.col("k"))
    return out.select(
        "category", "n_base", "n_cur",
        p.alias("p_base"), q.alias("p_cur"),
        ((p - q) * F.log(p / q)).alias("psi_term"))
