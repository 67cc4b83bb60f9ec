"""KG schema statistics — the predicate-cardinality census.

After triple extraction and linking (the reference's write path,
ingestMD.py:392-547), the first question a downstream consumer asks of
a knowledge graph is structural: which predicates are functional
(every subject has exactly one object — safe to pivot into a property
column), which are inverse-functional (object identifies the subject —
a candidate entity key for linking), and which are genuinely many-to-
many (must stay edges). The same numbers drive physical decisions at
100 TB: a 1:N predicate with a bounded fan-out can be stored as a
grouped list column; an N:M predicate with a huge max fan-out is the
skew-salting candidate (operators/skew.py).

One job: an optional exact distinct, then three map-combinable
aggregations per predicate (triple/endpoint counts plus max in/out
fan-out via a two-level groupBy), joined on the tiny predicate key —
every step partial-aggregates before the shuffle, nothing is
quadratic, and the output is one row per predicate (KBs at any corpus
size).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def predicate_cardinality(triples: DataFrame, *,
                          subj_col: str = "subject",
                          pred_col: str = "predicate",
                          obj_col: str = "object",
                          distinct_triples: bool = True) -> DataFrame:
    """Per-predicate structural census: (predicate, n_triples,
    n_subjects, n_objects, max_out, max_in, avg_out, card_class) where
    ``max_out`` is the largest object fan-out of any subject, ``max_in``
    the largest subject fan-in of any object, and ``card_class`` the
    relational reading: '1:1' (both maxima 1), 'N:1' (functional:
    max_out 1), '1:N' (inverse-functional: max_in 1), else 'N:M'.

    ``distinct_triples`` (default) collapses repeated assertions first
    so provenance multiplicity doesn't masquerade as fan-out."""
    t = triples.select(F.col(subj_col).alias("s"),
                       F.col(pred_col).alias("p"),
                       F.col(obj_col).alias("o"))
    if distinct_triples:
        t = t.distinct()
    base = t.groupBy("p").agg(
        F.count(F.lit(1)).alias("n_triples"),
        F.countDistinct("s").alias("n_subjects"),
        F.countDistinct("o").alias("n_objects"))
    out_deg = (t.groupBy("p", "s").agg(F.count(F.lit(1)).alias("d"))
               .groupBy("p").agg(F.max("d").alias("max_out")))
    in_deg = (t.groupBy("p", "o").agg(F.count(F.lit(1)).alias("d"))
              .groupBy("p").agg(F.max("d").alias("max_in")))
    card = (F.when((F.col("max_out") == 1) & (F.col("max_in") == 1), "1:1")
            .when(F.col("max_out") == 1, "N:1")
            .when(F.col("max_in") == 1, "1:N")
            .otherwise("N:M"))
    return (base.join(out_deg, "p").join(in_deg, "p")
            .select(F.col("p").alias("predicate"),
                    "n_triples", "n_subjects", "n_objects",
                    "max_out", "max_in",
                    F.round(F.col("n_triples") / F.col("n_subjects"), 4)
                    .alias("avg_out"),
                    card.alias("card_class")))
