"""Event-sequence modeling: Markov transition census.

The events table is a log of (user, event_type, ts) — the raw
material for behavior modeling. The first-order Markov transition
matrix (state -> next-state counts and row-normalized probabilities)
is the standard summary: it feeds session simulation, anomaly
scoring (improbable transitions), and next-event prediction
baselines. The funnel/retention operators answer "did X then Y
happen"; this answers "what follows X, with what probability".

Scale shape: ONE window pass per user ordered by (ts, tiebreak) —
a single hash shuffle on the user key (the same partitioning the
sessionizers use) — then a map-combinable count aggregation over
(state, next). The row-normalizing total is a second tiny
aggregation joined back on state; output is O(|distinct states|^2)
at most, corpus-independent. No driver actions, no Python rows.

Determinism: same-timestamp events are ordered by the tiebreak
column (default event_id), so the pair multiset is a pure function
of the data — the DuckDB oracle replays the identical LEAD window.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def event_transitions(events: DataFrame, *,
                      user_col: str = "user_id",
                      state_col: str = "event_type",
                      ts_col: str = "ts",
                      tiebreak_col: str = "event_id",
                      include_end: bool = False) -> DataFrame:
    """First-order Markov transition census over per-user event
    sequences: (state, next_state, n, p) where n counts adjacent
    pairs across all users and p = n / Σ_next n (row-normalized,
    exact counts divided once at the end).

    ``include_end`` adds an absorbing '∅' next-state for each user's
    final event, making each state's outgoing p sum to exactly 1 — useful
    when the matrix feeds simulation; off by default to keep the
    census purely observed-pairs.
    """
    w = (Window.partitionBy(F.col(user_col))
         .orderBy(F.col(ts_col), F.col(tiebreak_col)))
    nxt = F.lead(F.col(state_col)).over(w)
    pairs = (events
             .filter(F.col(user_col).isNotNull()
                     & F.col(state_col).isNotNull()
                     & F.col(ts_col).isNotNull())
             .select(F.col(state_col).alias("state"),
                     nxt.alias("next_state")))
    if include_end:
        pairs = pairs.withColumn(
            "next_state", F.coalesce("next_state", F.lit("∅")))
    else:
        pairs = pairs.filter(F.col("next_state").isNotNull())
    counts = (pairs.groupBy("state", "next_state")
              .agg(F.count(F.lit(1)).alias("n")))
    totals = counts.groupBy("state").agg(F.sum("n").alias("_tot"))
    return (counts.join(totals, "state")
            .select("state", "next_state", "n",
                    (F.col("n").cast("double") / F.col("_tot")).alias("p")))
