"""Edit-distance similarity join — fuzzy matching on entity names.

Finds every pair of strings within Levenshtein distance ``max_dist``
WITHOUT the all-pairs cross join, using a LOSSLESS two-bucket blocking
scheme built from the classic q-gram count filter (Gravano et al.,
"Approximate String Joins in a Database (Almost) for Free", VLDB 2001):

* an edit operation destroys at most ``q`` of a string's overlapping
  q-grams, so two strings s, t with ``lev(s, t) <= d`` share at least
  ``max(|s|,|t|) - q + 1 - q*d`` q-grams (bag count). Whenever
  ``max(|s|,|t|) >= q*(d+1)`` that bound is >= 1, i.e. the pair shares
  at least one q-gram TYPE — so an equi-join on distinct q-grams plus
  the length filter ``||s|-|t|| <= d`` generates every such pair.
* the only pairs the gram join can miss have ``max(|s|,|t|) <
  q*(d+1)`` — BOTH strings shorter than a small constant (4 chars at
  q=2, d=1). Those go through a length-banded equi-join over the short
  bucket alone. (A long/short pair needs no special case: the length
  filter already excludes it, since |s| >= q*(d+1) and |t| < q forces
  ||s|-|t|| >= q*d + 1 > d; and when the shorter side survives the
  length filter it has length >= q*(d+1) - d >= q, so it owns q-grams.)

Candidates are deduplicated BEFORE verification and verified with the
JVM-side ``levenshtein`` expression — never a Python loop. The union of
the two buckets is provably the complete candidate set, so the driver
oracle can be the EXHAUSTIVE cross-join SQL: blocking correctness is
checked against ground truth, not against a replay of itself.

Scale: the gram join's volume is sum over gram types of (#names
carrying the gram)^2 within a length band — the standard q-gram join
shape; hot grams are an AQE-skew-join case, and the short bucket is
bounded by the alphabet (strings shorter than q*(d+1) chars). Both
buckets are hash equi-joins; nothing is quadratic in the corpus.

Beyond-reference operator (the reference links entities only by
normalized-key equality and TF-IDF cosine, ``graphutil.py:636-651``);
this adds the typo/transliteration modality those miss.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _distinct_names(df: DataFrame, col: str) -> DataFrame:
    return (df.select(F.col(col).cast("string").alias("name"))
            .filter(F.col("name").isNotNull())
            .distinct()
            .withColumn("len", F.length("name")))


def _grams(names: DataFrame, q: int) -> DataFrame:
    """Distinct overlapping q-grams per name (names shorter than q
    contribute none — they are always in the short bucket)."""
    idx = F.sequence(F.lit(1), F.col("len") - q + 1)
    return (names.filter(F.col("len") >= q)
            .select("name", "len",
                    F.explode(idx).alias("i"))
            .select("name", "len",
                    F.substring("name", F.col("i"), q).alias("gram"))
            .distinct())


def edit_distance_pairs(df: DataFrame, col: str, *, max_dist: int = 1,
                        q: int = 2) -> DataFrame:
    """All unordered pairs of DISTINCT values of ``col`` within
    Levenshtein distance ``max_dist`` -> (name_a, name_b, dist) with
    ``name_a < name_b``. Lossless blocking as per the module docstring;
    exact verification; identical-string pairs are not emitted (the
    input is deduplicated — exact duplicates are ``dedup.py``'s job).
    """
    if max_dist < 1:
        raise ValueError(f"max_dist must be >= 1, got {max_dist}")
    if q < 2:
        raise ValueError(f"q must be >= 2, got {q}")
    names = _distinct_names(df, col)
    thr = q * (max_dist + 1)

    g = _grams(names, q)
    ga = g.select(F.col("name").alias("name_a"),
                  F.col("len").alias("len_a"), "gram")
    gb = g.select(F.col("name").alias("name_b"),
                  F.col("len").alias("len_b"), "gram")
    long_cand = (
        ga.join(gb, "gram")
        .filter((F.col("name_a") < F.col("name_b"))
                & (F.abs(F.col("len_a") - F.col("len_b")) <= max_dist)
                & (F.greatest("len_a", "len_b") >= thr))
        .select("name_a", "name_b")
        .distinct())

    short = names.filter(F.col("len") < thr)
    # length-banded equi-join: the name_a side claims every band its
    # partner's length could fall in (TWO-sided — name_a < name_b is a
    # lexicographic order, not a length order), so |len_a - len_b| <=
    # d pairs meet on an EQUALITY key (no BNLJ)
    sa = short.select(
        F.col("name").alias("name_a"), F.col("len").alias("len_a"),
        F.explode(F.sequence(
            F.col("len") - max_dist,
            F.col("len") + max_dist)).alias("band"))
    sb = short.select(F.col("name").alias("name_b"),
                      F.col("len").alias("band"))
    short_cand = (
        sa.join(sb, "band")
        .filter(F.col("name_a") < F.col("name_b"))
        .select("name_a", "name_b")
        .distinct())

    return (long_cand.unionByName(short_cand).distinct()
            .withColumn("dist", F.levenshtein("name_a", "name_b"))
            .filter(F.col("dist") <= max_dist))


def edit_distance_join(left: DataFrame, right: DataFrame,
                       left_col: str, right_col: str, *,
                       max_dist: int = 1, q: int = 2) -> DataFrame:
    """Two-table form: (left_name, right_name, dist) for every
    cross-table value pair within ``max_dist`` — including equal
    strings (dist 0), the lookup-table use (dirty mentions vs a clean
    entity gazetteer). Same lossless buckets as the self-join."""
    if max_dist < 1:
        raise ValueError(f"max_dist must be >= 1, got {max_dist}")
    if q < 2:
        raise ValueError(f"q must be >= 2, got {q}")
    ln = _distinct_names(left, left_col)
    rn = _distinct_names(right, right_col)
    thr = q * (max_dist + 1)

    ga = _grams(ln, q).select(F.col("name").alias("left_name"),
                              F.col("len").alias("len_a"), "gram")
    gb = _grams(rn, q).select(F.col("name").alias("right_name"),
                              F.col("len").alias("len_b"), "gram")
    long_cand = (
        ga.join(gb, "gram")
        .filter((F.abs(F.col("len_a") - F.col("len_b")) <= max_dist)
                & (F.greatest("len_a", "len_b") >= thr))
        .select("left_name", "right_name")
        .distinct())

    sa = (ln.filter(F.col("len") < thr)
          .select(F.col("name").alias("left_name"),
                  F.col("len").alias("len_a"),
                  F.explode(F.sequence(
                      F.col("len") - max_dist,
                      F.col("len") + max_dist)).alias("band")))
    sb = (rn.filter(F.col("len") < thr)
          .select(F.col("name").alias("right_name"),
                  F.col("len").alias("band")))
    short_cand = (sa.join(sb, "band")
                  .select("left_name", "right_name").distinct())

    return (long_cand.unionByName(short_cand).distinct()
            .withColumn("dist", F.levenshtein("left_name", "right_name"))
            .filter(F.col("dist") <= max_dist))
