"""Fellegi–Sunter probabilistic record linkage scoring.

The reference links entities only on exact (label, name) equality
(/root/reference/ingestMD.py:505,509); the engine's MinHash/TF-IDF
linkers (operators/linking.py) score a single name field. Real
entity resolution over web-extracted records compares SEVERAL noisy
fields at once — and the canonical public model for combining them is
Fellegi & Sunter (JASA 1969): each field contributes a log-likelihood
ratio depending on whether it agrees, and the pair's match weight is
the sum.

    agreement  weight_f = log2(m_f / u_f)
    disagree   weight_f = log2((1 - m_f) / (1 - u_f))

where m_f = P(field f agrees | pair is a match) — supplied by the
caller (domain knowledge / labeled data; Splink's public default
workflow does the same before EM refinement) — and u_f = P(field f
agrees | pair is NOT a match), which this operator estimates EXACTLY
from the corpus value distribution instead of sampling:

    u_f = sum_v n_v (n_v - 1) / (N (N - 1))

i.e. the probability two distinct random records agree on f. That is
a closed-form function of the value histogram, so the estimate is
deterministic, partitioning-independent, and cheap: ONE exploded
(field, value) aggregation over the records covers every field.

Scale design:
- u estimation: records are exploded to (field, value) rows once;
  two partial-aggregating groupBys produce a |fields|-row frame that
  is BROADCAST into the scoring join. No driver action — N and every
  u_f are folded into the plan as 1-row/|fields|-row joins.
- scoring: pairs equi-join records twice on id (hash joins), then a
  per-field agreement struct and one column sum. O(|pairs|) rows
  shuffled; candidate generation stays the caller's problem (LSH
  blocks, shared-shingle joins — anything bounded).
- posterior: P(match | pattern) from the caller's prior via Bayes in
  log space, so `match_probability` is monotone in `match_weight`.

Null semantics: a comparison where either side is NULL carries no
evidence — its field weight is 0 (neither agreement nor
disagreement), the standard treatment in public FS implementations.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, functions as F


def u_probabilities(records: DataFrame, id_col: str,
                    fields: list[str]) -> DataFrame:
    """Exact random-pair agreement probabilities per field.

    Returns a |fields|-row frame (field, u) where
    u = Σ_v n_v(n_v−1) / (N(N−1)) over NON-NULL values of the field
    (agreement requires both sides non-null, so null rows can never
    agree and are excluded from the numerator; N counts all records,
    matching the denominator of the pair space the scorer ranges
    over). Pure aggregation — no sampling, no driver action.
    """
    fv = records.select(
        F.col(id_col).alias("_id"),
        F.explode(F.create_map(*[x for f in fields
                                 for x in (F.lit(f), F.col(f).cast("string"))]
                               )).alias("field", "value"))
    counts = (fv.filter(F.col("value").isNotNull())
              .groupBy("field", "value")
              .agg(F.count(F.lit(1)).alias("n")))
    n_total = records.select(
        F.count(F.lit(1)).cast("double").alias("_N"))
    return (counts.groupBy("field")
            .agg(F.sum(F.col("n") * (F.col("n") - 1)).alias("_agree_pairs"))
            .crossJoin(F.broadcast(n_total))
            .select("field",
                    (F.col("_agree_pairs")
                     / (F.col("_N") * (F.col("_N") - 1))).alias("u")))


def fellegi_sunter_scores(records: DataFrame, pairs: DataFrame,
                          id_col: str, fields: list[str],
                          m_probs: dict[str, float],
                          prior: float = 0.01) -> DataFrame:
    """Score candidate (id1, id2) pairs with Fellegi–Sunter weights.

    records: one row per entity with ``id_col`` and the comparison
    ``fields``; pairs: candidate pairs (id1, id2) from any blocking
    scheme. ``m_probs[f]`` is P(agree on f | match) in (0, 1);
    ``prior`` is P(match) for the posterior.

    Returns (id1, id2, agree_<f>... , match_weight,
    match_probability) where agree_<f> ∈ {1, 0, NULL-evidence -1}
    (−1 = either side null, weight contribution 0), match_weight is
    the summed log2 likelihood ratio and match_probability the Bayes
    posterior. u probabilities come from :func:`u_probabilities`
    (exact corpus histogram) and ride the plan as a broadcast pivot —
    the whole scorer is one records-explode aggregation plus two hash
    joins on id, no driver actions.
    """
    for f in fields:
        if f not in m_probs:
            raise ValueError(f"m_probs missing field {f!r}")
        if not 0.0 < m_probs[f] < 1.0:
            raise ValueError(f"m_probs[{f!r}] must be in (0,1)")
    if not 0.0 < prior < 1.0:
        raise ValueError("prior must be in (0,1)")

    # |fields|-row u frame -> one broadcast row (u_<f> columns) so the
    # scoring select references plain columns, not a per-field join
    u_row = (u_probabilities(records, id_col, fields)
             .groupBy()
             .pivot("field", fields)
             .agg(F.first("u")))
    u_row = u_row.select(*[F.col(f).alias(f"_u_{f}") for f in fields])

    r1 = records.select(F.col(id_col).alias("id1"),
                        *[F.col(f).cast("string").alias(f"_l_{f}")
                          for f in fields])
    r2 = records.select(F.col(id_col).alias("id2"),
                        *[F.col(f).cast("string").alias(f"_r_{f}")
                          for f in fields])
    scored = (pairs.select("id1", "id2")
              .join(r1, "id1").join(r2, "id2")
              .crossJoin(F.broadcast(u_row)))

    weight_terms = []
    agree_cols = []
    for f in fields:
        l, r, u = F.col(f"_l_{f}"), F.col(f"_r_{f}"), F.col(f"_u_{f}")
        m = F.lit(float(m_probs[f]))
        agree = (F.when(l.isNull() | r.isNull(), F.lit(-1))
                 .when(l == r, F.lit(1)).otherwise(F.lit(0)))
        agree_cols.append(agree.alias(f"agree_{f}"))
        # u == 0 (every value unique) or u == 1 (constant column) make
        # a log term infinite; clamp into the open interval like public
        # implementations do so weights stay finite
        u_c = F.greatest(F.least(u, F.lit(1.0 - 1e-9)), F.lit(1e-9))
        w = (F.when(agree == 1, F.log2(m / u_c))
             .when(agree == 0, F.log2((1.0 - m) / (1.0 - u_c)))
             .otherwise(F.lit(0.0)))
        weight_terms.append(w)

    total = weight_terms[0]
    for t in weight_terms[1:]:
        total = total + t
    prior_log_odds = math.log2(prior / (1.0 - prior))
    post_log_odds = total + F.lit(prior_log_odds)
    prob = F.pow(F.lit(2.0), post_log_odds) \
        / (F.pow(F.lit(2.0), post_log_odds) + 1.0)
    return scored.select(
        "id1", "id2", *agree_cols,
        total.alias("match_weight"),
        prob.alias("match_probability"))
