"""Distributed text classification — the trainable rung of the corpus
quality ladder.

``nb_class_scores`` is multinomial Naive Bayes (train + score in one
declarative plan): the model CCNet/fastText-style pipelines use to keep
"wiki-like" text and drop junk, and the classic statistical language
identifier. Unlike the fixed heuristics in ``functions/textstats.py``
(stopword-ratio quality, n-gram lang-id), this one learns from labeled
seed documents — any labeling the pipeline already has (lang column,
curated source buckets, a hand-audited sample) becomes a scorer over
the whole corpus.

Every number is a pure function of (seeds, docs, add_k): integer count
aggregates, one ln per (term, class), so a plain-SQL oracle replays the
scores bit-for-bit up to float rounding. Training is two hash
aggregates over the seed corpus; scoring is one token explode joined to
the model table — no iteration, no driver actions, nothing quadratic.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from neo4j_document_pipeline_spark.functions.textstats import col_tokens


def nb_class_scores(docs: DataFrame, id_col: str, text_col: str,
                    seeds: DataFrame, label_col: str,
                    seed_text_col: str | None = None, *,
                    add_k: float = 1.0) -> DataFrame:
    """Multinomial Naive Bayes log-scores of every document against
    every seed class -> (id_col, label, n_hit, score), one row per
    (document, trained class):

        score = ln p(c) + sum_{w in doc ∩ seed vocab} tf(w) · ln p(w|c)
        p(c)   = seed docs labeled c / seed docs          (MLE prior)
        p(w|c) = (count(w, c) + k) / (tokens_c + k·V)     (Lidstone)

    with V the seed corpus's distinct-term vocabulary. Tokens outside
    the seed vocabulary are DROPPED (the standard fixed-vocabulary
    treatment — the model has no evidence about them; smoothing them
    would add a class-dependent penalty for words the training never
    saw). ``n_hit`` is the count of in-vocabulary token OCCURRENCES
    scored, the coverage readout: argmax over rows with n_hit 0 is the
    prior alone, worth gating on. Every document gets a row for every
    class (an empty or fully-OOV document scores ln p(c)), so the
    output is exactly |docs| × |classes| rows and downstream argmax /
    margin logic never hits a missing pair. Seed rows with a NULL
    label or NULL text carry no training evidence and are ignored.

    add_k must be > 0: with k = 0 an in-vocabulary word unseen in one
    class would send that class to -inf, and real corpora hit that on
    the first scored document.

    Tokenization is the engine's ``col_tokens`` on both sides, so the
    whole computation is plain-SQL reproducible (the oracle replays
    counts, priors, and the ln arithmetic; compare at 6dp).

    Shape at 100 TB: training is one (label, term) hash aggregate and
    one (label) aggregate over the seed corpus (map-side combinable,
    near-uniform keys — hot terms are hot ROWS of a count table, not
    hot partitions). The model is V×C rows, joined to the scored
    corpus's (doc, term) tf rows on the term — per-doc fan-out bounded
    by document length × C. V, priors, and class totals fold in-plan
    via broadcast one-row/tiny aggregates; zero driver actions, so the
    scorer is a single job at any scale.
    """
    if not add_k > 0:
        raise ValueError(f"add_k must be > 0, got {add_k}")
    seed_text = seed_text_col or text_col
    labeled = (seeds.select(F.col(label_col).cast("string").alias("label"),
                            F.col(seed_text).alias("_txt"))
               .filter(F.col("label").isNotNull()
                       & F.col("_txt").isNotNull()))
    stoks = labeled.select(
        "label", F.explode(col_tokens(F.col("_txt"))).alias("term"))
    cwc = stoks.groupBy("label", "term").agg(F.count("*").alias("cnt"))
    ctot = stoks.groupBy("label").agg(
        F.count("*").cast("double").alias("tok_c"))
    vocab = stoks.select("term").distinct()
    v1 = vocab.agg(F.count("*").cast("double").alias("v"))
    n1 = labeled.agg(F.count("*").cast("double").alias("n_seed"))
    priors = (labeled.groupBy("label").agg(F.count("*").alias("n_c"))
              .join(F.broadcast(n1), F.lit(True))
              .select("label",
                      F.log(F.col("n_c") / F.col("n_seed"))
                      .alias("prior_lp")))
    # model table: every (vocab term, class) pair with its smoothed
    # log-likelihood — the unseen-in-class pairs come from the cross
    # join (classes are a tiny broadcast side), count coalesced to 0
    k = float(add_k)
    model = (
        vocab.join(F.broadcast(ctot), F.lit(True))
        .join(cwc, ["label", "term"], "left")
        .join(F.broadcast(v1), F.lit(True))
        .select("term", "label",
                F.log((F.coalesce(F.col("cnt"), F.lit(0)) + F.lit(k))
                      / (F.col("tok_c") + F.lit(k) * F.col("v")))
                .alias("lp"))
    )
    tf = (docs.select(F.col(id_col),
                      F.explode(col_tokens(F.col(text_col))).alias("term"))
          .groupBy(id_col, "term").agg(F.count("*").alias("tf")))
    # the inner join to the model drops OOV terms by construction
    sums = (tf.join(model, "term")
            .groupBy(id_col, "label")
            .agg(F.sum("tf").alias("n_hit"),
                 F.sum(F.col("tf") * F.col("lp")).alias("ev")))
    return (
        docs.select(id_col)
        .join(F.broadcast(priors), F.lit(True))
        .join(sums, [id_col, "label"], "left")
        .select(id_col, "label",
                F.coalesce(F.col("n_hit"), F.lit(0)).cast("bigint")
                .alias("n_hit"),
                (F.col("prior_lp") + F.coalesce(F.col("ev"), F.lit(0.0)))
                .alias("score"))
    )


def nb_best_class(scores: DataFrame, id_col: str) -> DataFrame:
    """Argmax + margin over ``nb_class_scores`` output -> (id_col,
    label, n_hit, score, margin): the winning class per document and
    its lead in nats over the runner-up (margin NULL when only one
    class was trained — there is nothing to beat). Ties break on label
    ascending so the pick is deterministic and SQL-replayable.

    Three map-side-combinable aggregates over per-document groups of
    |classes| rows — no window sort (a per-doc group is tiny, but the
    number of GROUPS is the corpus size, and hash aggregates partial-
    combine where a row_number window would shuffle-and-sort).
    max(struct(score, label)) alone would break score ties toward the
    LARGEST label; min(label) among the max-score rows breaks them
    toward the smallest.
    """
    mx = scores.groupBy(id_col).agg(F.max("score").alias("_mx"))
    top = (scores.join(mx, id_col)
           .filter(F.col("score") == F.col("_mx"))
           .groupBy(id_col)
           .agg(F.min("label").alias("label")))
    runner = (scores.join(top, [id_col, "label"], "left_anti")
              .groupBy(id_col).agg(F.max("score").alias("_second")))
    return (scores.join(top, [id_col, "label"])
            .join(runner, id_col, "left")
            .select(id_col, "label", "n_hit", "score",
                    (F.col("score") - F.col("_second")).alias("margin")))


def chi2_terms(docs: DataFrame, id_col: str, text_col: str,
               label_col: str, *, top_k: int = 20,
               min_doc_freq: int = 2) -> DataFrame:
    """Chi-squared feature selection (one-vs-rest, document presence):
    for every (term, class), the 2x2 contingency of "doc contains
    term" x "doc is in class" scored as
    chi2 = N(ad-bc)^2 / ((a+b)(c+d)(a+c)(b+d)) — the classic vocab
    pruner before training a quality/language classifier (Yang &
    Pedersen 1997), and a corpus-drift probe (which terms became
    class-discriminative between snapshots). Everything up to the
    final division is EXACT integer counting, so the ranking is
    bit-replayable.

    Scale: one explode + (term, label) count (map-combinable), per-term
    and per-class marginals by re-aggregation (never a second corpus
    scan), a broadcast of the class totals (|classes| rows), and a
    per-class top-k window over the VOCAB-sized score table.
    ``min_doc_freq`` drops hapax terms before scoring (a term in one
    document always looks perfectly discriminative; it's noise).

    Returns (label, term, chi2, a, df_t, n_class) — ``a`` docs of the
    class containing the term, ``df_t`` total docs containing it —
    top_k rows per class, ties chi2 DESC then term ASC."""
    if top_k < 1:
        raise ValueError(f"top_k must be >= 1, got {top_k}")
    base = docs.select(F.col(id_col).alias("id"),
                       F.col(label_col).alias("label"),
                       F.array_distinct(col_tokens(F.col(text_col)))
                       .alias("toks")) \
        .filter(F.col("label").isNotNull())
    n1 = base.agg(F.count(F.lit(1)).alias("n_total"))
    cls = base.groupBy("label").agg(F.count(F.lit(1)).alias("n_class"))
    tl = (base.select("label", F.explode("toks").alias("term"))
          .groupBy("term", "label").agg(F.count(F.lit(1)).alias("a")))
    df_t = (tl.groupBy("term").agg(F.sum("a").alias("df_t"))
            .filter(F.col("df_t") >= min_doc_freq))
    # full (term x class) grid: a term ABSENT from a class can still be
    # that class's most discriminative signal (a=0, b=df_t); the
    # observed (term, label) counts alone would silently skip it
    scored = (df_t.crossJoin(F.broadcast(cls))
              .join(tl, ["term", "label"], "left")
              .withColumn("a", F.coalesce("a", F.lit(0)))
              .crossJoin(F.broadcast(n1)))
    a = F.col("a")
    b = F.col("df_t") - a
    c = F.col("n_class") - a
    d = F.col("n_total") - F.col("df_t") - F.col("n_class") + a
    # marginals/cross-products as DOUBLE from the first factor: the
    # all-long products overflow 2^63 around ~1e5 balanced labeled docs
    # (ANSI ArithmeticException under Spark 4; silent wraparound under
    # Spark 3 defaults). Below 2^53 every product is exact in double, so
    # small-corpus results are bit-identical to the old long path.
    diff = a.cast("double") * d - b.cast("double") * c
    num = F.col("n_total").cast("double") * diff * diff
    den = (a + b).cast("double") * (c + d) * (a + c) * (b + d)
    scored = scored.select(
        "label", "term",
        F.when(den > 0, num / den).otherwise(F.lit(0.0)).alias("chi2"),
        "a", "df_t", "n_class")
    w = Window.partitionBy("label").orderBy(F.desc("chi2"), F.asc("term"))
    return (scored.withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") <= top_k).drop("_rn"))
