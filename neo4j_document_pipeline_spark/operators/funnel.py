"""Funnel analysis — ordered multi-step conversion over an event log.

The product-analytics classic (Amplitude/Mixpanel funnels): of the
users who did step 1, how many went on to do step 2 AFTER it, then
step 3 after that — optionally all inside a conversion window anchored
at step 1. Spark has no funnel operator; window-function encodings
either scan per-step with self-joins (this module's shape, linear in
steps) or sessionize-and-scan in Python (the slow path).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def funnel_steps(events: DataFrame, steps: list[str], *,
                 user_col: str = "user_id", type_col: str = "event_type",
                 ts_col: str = "ts",
                 within: str | None = None) -> DataFrame:
    """First-touch funnel -> one row per user who completed at least
    step 1: (user_col, n_steps, t_first, t_last).

    Semantics (the standard first-touch definition): the funnel anchors
    at each user's EARLIEST step-1 event; step k is the earliest step-k
    event STRICTLY after the user's step-(k-1) time; ``within`` (an SQL
    interval) additionally requires every step inside
    ``t_first + within``. Greedy-earliest is deterministic and exactly
    SQL-replayable; it can under-count windowed conversions that a
    later anchor would have caught — that is the standard trade-off
    every funnel product makes, stated here rather than hidden.

    Shape: one equi-join + one hash aggregate per step, all keyed on
    the user — k steps cost k co-partitioned shuffles (AQE reuses the
    exchange), never a per-user sort or a Python pass. Repeated events
    collapse in the min() aggregates, so hot users cost their event
    count, not its square.
    """
    if len(steps) < 1:
        raise ValueError("funnel_steps: need at least one step")
    e = events.select(
        F.col(user_col).alias("_u"),
        F.col(type_col).alias("_k"),
        F.col(ts_col).cast("timestamp").alias("_ts"),
    ).filter(F.col("_ts").isNotNull())
    bound = F.expr(f"INTERVAL {within}") if within else None

    cur = (e.filter(F.col("_k") == steps[0])
           .groupBy("_u").agg(F.min("_ts").alias("_t1"))
           .withColumn("_tlast", F.col("_t1")))
    levels = [cur.select("_u", F.lit(1).alias("_lvl"), "_t1", "_tlast")]
    for i, s in enumerate(steps[1:], start=2):
        m = (e.filter(F.col("_k") == s)
             .join(cur, "_u")
             .filter(F.col("_ts") > F.col("_tlast")))
        if bound is not None:
            m = m.filter(F.col("_ts") <= F.col("_t1") + bound)
        cur = (m.groupBy("_u")
               .agg(F.max("_t1").alias("_t1"),
                    F.min("_ts").alias("_tlast")))
        levels.append(
            cur.select("_u", F.lit(i).alias("_lvl"), "_t1", "_tlast"))
    lev = levels[0]
    for fr in levels[1:]:
        lev = lev.unionByName(fr)
    # max(struct) picks the deepest level reached, carrying its times —
    # map-combinable, no window sort
    return (
        lev.groupBy("_u")
        .agg(F.max(F.struct("_lvl", "_tlast", "_t1")).alias("_m"))
        .select(F.col("_u").alias(user_col),
                F.col("_m._lvl").alias("n_steps"),
                F.col("_m._t1").alias("t_first"),
                F.col("_m._tlast").alias("t_last"))
    )


def funnel_counts(events: DataFrame, steps: list[str], *,
                  user_col: str = "user_id", type_col: str = "event_type",
                  ts_col: str = "ts",
                  within: str | None = None) -> DataFrame:
    """The funnel report: (step, n_users) where n_users counts users
    reaching AT LEAST that step — the monotone conversion curve."""
    per_user = funnel_steps(events, steps, user_col=user_col,
                            type_col=type_col, ts_col=ts_col,
                            within=within)
    return (
        per_user.select(
            F.explode(F.sequence(F.lit(1), F.col("n_steps")))
            .alias("step"))
        .groupBy("step").agg(F.count("*").alias("n_users"))
    )


def retention_cohorts(events: DataFrame, *, user_col: str = "user_id",
                      ts_col: str = "ts",
                      cohort_type: str | None = None,
                      type_col: str = "event_type") -> DataFrame:
    """Weekly retention triangle -> (cohort_week, week_index, n_users):
    users grouped by the ISO week of their FIRST event (optionally
    first ``cohort_type`` event — e.g. cohort on 'signup'), counted
    distinctly in every later week they were active. week_index 0 is
    the cohort week itself; a user active in weeks 0, 2 and 5
    contributes to exactly those three cells. The classic cohort
    retention report.

    Users whose first ``cohort_type`` event comes after other activity
    still cohort on that event, and their EARLIER activity is excluded
    (you can't be retained before you exist) — the standard convention.

    Shape: one aggregate for cohort assignment, one distinct over
    (user, week), one join on the user, one final count aggregate —
    all hash operations on the user/week keys, no windows, no Python.
    """
    e = events.select(
        F.col(user_col).alias("_u"),
        F.col(ts_col).cast("timestamp").alias("_ts"),
        F.col(type_col).alias("_k") if type_col in events.columns
        else F.lit(None).alias("_k"),
    ).filter(F.col("_ts").isNotNull())
    first = e if cohort_type is None else e.filter(F.col("_k") == cohort_type)
    cohorts = (first.groupBy("_u")
               .agg(F.date_trunc("week", F.min("_ts")).alias("cw")))
    active = (e.select("_u", F.date_trunc("week", "_ts").alias("aw"))
              .distinct())
    return (
        active.join(cohorts, "_u")
        .filter(F.col("aw") >= F.col("cw"))
        .select("cw",
                F.floor(F.datediff("aw", "cw") / 7).cast("int")
                .alias("week_index"),
                "_u")
        .groupBy(F.col("cw").alias("cohort_week"), "week_index")
        .agg(F.countDistinct("_u").alias("n_users"))
    )
