"""Temporal knowledge-graph maintenance operators.

The reference pipeline upserts node properties with a last-write-wins
coalesce (ingestMD.py:503-547) — history is destroyed on every
re-crawl. Over Common-Crawl-style pages each url carries a
``warc_ts``, so the same extraction run at 100 TB actually observes
FACTS CHANGING OVER TIME: a company's CEO in the 2019 crawl differs
from the 2023 crawl, and two mirrors disagree about it in the SAME
crawl. Three operators turn those raw observations into the temporal
layer a production KG needs:

- ``scd2_history``: slowly-changing-dimension type-2 compaction
  (Kimball's SCD2, public warehouse practice): per (entity, property)
  collapse repeated observations into validity intervals
  [valid_from, valid_to), keeping only rows where the value actually
  changed. One hash shuffle on (entity, property); both window passes
  reuse the same sort order, so Spark plans a single Exchange.
- ``fact_conflicts``: functional-predicate contradiction census —
  (subject, predicate) groups asserted with more than one distinct
  object, with the sorted value set and assertion counts. One
  map-combinable aggregation; output is bounded by the number of
  CONFLICTING keys, not the corpus.
- ``truth_discovery``: fixed-round Sums voting (Pasternack & Roth
  2010, "Knowing What to Believe"): claim belief = sum of asserting
  sources' trust; source trust = sum of its claims' beliefs. Run
  UNNORMALIZED for a bounded number of rounds so every score is an
  exact 64-bit integer — bit-reproducible across engines and
  partitionings (normalizing each round by the max would make scores
  engine-ordering-dependent doubles; ranks are identical either way
  because per-fact normalization is monotone). Each half-round is one
  equi-join + one partial-aggregating groupBy — O(claims) rows
  shuffled per round, never quadratic.

All three are pure DataFrame plans (no Python rows): at a trillion
observations the SCD2 shuffle partitions by entity hash, the conflict
census partial-aggregates map-side, and truth discovery's joins are
plain hash joins on (source) / (fact, value) keys.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def scd2_history(observations: DataFrame, *,
                 entity_col: str = "entity",
                 prop_col: str = "property",
                 value_col: str = "value",
                 ts_col: str = "ts") -> DataFrame:
    """Compact (entity, property, value, ts) observations into SCD2
    validity intervals: one row per value RUN with ``valid_from`` (the
    first ts observing the value), ``valid_to`` (the ts of the next
    change, null while current), ``version`` (1-based change ordinal)
    and ``is_current``.

    Same-timestamp disagreements (two mirrors crawled in the same
    second) resolve deterministically to the MAX value string, so the
    output is a pure function of the observation SET. Null values are
    dropped (an observation that extracted nothing is not a change).
    """
    e, p, v, t = entity_col, prop_col, value_col, ts_col
    obs = (observations
           .filter(F.col(v).isNotNull() & F.col(e).isNotNull()
                   & F.col(p).isNotNull() & F.col(t).isNotNull())
           .groupBy(F.col(e).alias("entity"), F.col(p).alias("property"),
                    F.col(t).alias("ts"))
           .agg(F.max(F.col(v)).alias("value")))
    w = Window.partitionBy("entity", "property").orderBy("ts")
    changes = (obs
               .withColumn("_prev", F.lag("value").over(w))
               .filter(F.col("_prev").isNull()
                       | (F.col("_prev") != F.col("value")))
               .drop("_prev"))
    # the second window shares the first's partitioning AND ordering,
    # so Catalyst reuses the sort — one Exchange total
    return (changes
            .withColumn("valid_from", F.col("ts"))
            .withColumn("valid_to", F.lead("ts").over(w))
            .withColumn("version", F.row_number().over(w))
            .withColumn("is_current", F.col("valid_to").isNull())
            .select("entity", "property", "value", "valid_from",
                    "valid_to", "version", "is_current"))


def fact_conflicts(triples: DataFrame, *,
                   subj_col: str = "subject",
                   pred_col: str = "predicate",
                   obj_col: str = "object") -> DataFrame:
    """Contradiction census for functional predicates: (subject,
    predicate) keys asserted with >1 distinct object, with the sorted
    distinct-value list, its size, and the total assertion count.

    The aggregation partial-combines map-side (collect_set + count);
    output is one row per conflicting key — at web scale that is the
    interesting tail, not the corpus. Feed the result to
    ``truth_discovery`` to resolve the conflicts it finds."""
    s, p, o = subj_col, pred_col, obj_col
    return (triples
            .filter(F.col(o).isNotNull())
            .groupBy(F.col(s).alias("subject"), F.col(p).alias("predicate"))
            .agg(F.array_sort(F.collect_set(F.col(o))).alias("objects"),
                 F.count(F.lit(1)).alias("n_assertions"))
            .withColumn("n_objects", F.size("objects"))
            .filter(F.col("n_objects") > 1)
            .select("subject", "predicate", "n_objects", "objects",
                    "n_assertions"))


def truth_discovery(claims: DataFrame, *,
                    source_col: str = "source",
                    fact_col: str = "fact",
                    value_col: str = "value",
                    rounds: int = 2) -> DataFrame:
    """Resolve conflicting claims by fixed-round unnormalized Sums
    voting (Pasternack & Roth 2010). A claim is a distinct (fact,
    value) pair; a source asserts a set of claims.

    round 0:  belief(claim)  = number of distinct asserting sources
    round i:  trust(source)  = sum of belief over its claims
              belief(claim)  = sum of trust over its asserting sources

    Unnormalized integer arithmetic keeps every score exact (64-bit),
    so results are bit-identical across engines and partitionings;
    per-fact ranking is unaffected because normalization is a
    positive per-round scalar. Returns one row per (fact, value) with
    the final integer ``belief``, ``n_sources``, and ``is_winner``
    (top belief for the fact, ties broken on the smaller value string).

    Scale: ``rounds`` equi-joins over the claims edge list — each
    round shuffles O(|claims|) rows on source / (fact, value) hash
    keys with map-side partial sums. Beliefs grow ~|claims|-fold per
    round; rounds is capped at 4 to keep far inside int64 (the
    published algorithm converges in rank after very few rounds).
    """
    if not 1 <= rounds <= 4:
        raise ValueError("rounds must be in 1..4 (exact-int64 envelope)")
    edges = (claims
             .filter(F.col(source_col).isNotNull()
                     & F.col(fact_col).isNotNull()
                     & F.col(value_col).isNotNull())
             .select(F.col(source_col).alias("src"),
                     F.col(fact_col).alias("fact"),
                     F.col(value_col).alias("value"))
             .distinct())
    belief = (edges.groupBy("fact", "value")
              .agg(F.count(F.lit(1)).cast("long").alias("belief")))
    for _ in range(1, rounds):
        trust = (edges.join(belief, ["fact", "value"])
                 .groupBy("src").agg(F.sum("belief").alias("trust")))
        belief = (edges.join(trust, "src")
                  .groupBy("fact", "value")
                  .agg(F.sum("trust").cast("long").alias("belief")))
    n_src = (edges.groupBy("fact", "value")
             .agg(F.count(F.lit(1)).alias("n_sources")))
    w = Window.partitionBy("fact").orderBy(F.col("belief").desc(), "value")
    return (belief.join(n_src, ["fact", "value"])
            .withColumn("is_winner", F.row_number().over(w) == 1)
            .select("fact", "value", "belief", "n_sources", "is_winner"))
