"""Retrieval and classifier evaluation metrics as one-pass aggregates.

A retrieval engine needs to measure itself: ranking quality (MRR,
NDCG@k, precision/recall@k — Järvelin & Kekäläinen 2002 for DCG) over a
(query, ranked results) table vs a graded relevance table, and
classifier quality (per-class precision/recall/F1) over (label,
prediction) pairs — e.g. the corpus-quality Naive Bayes gate.

Scale design: every metric is a groupBy aggregate over an equi-join —
no windows wider than one query's result list, no driver loops. The
result lists are top-k by construction so per-query state is O(k);
queries×k rows shuffle once on query_id. Tie-breaks are deterministic
(score desc, then doc id asc) so ranks — and therefore every metric —
are a pure function of the data.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def ranking_metrics(results: DataFrame, relevance: DataFrame, *,
                    query_col: str = "query_id", doc_col: str = "doc_id",
                    score_col: str = "score", rel_col: str = "rel",
                    k: int = 10) -> DataFrame:
    """Per-query ranking metrics at cutoff ``k``: MRR (reciprocal rank
    of the first relevant hit within the top-k, 0 if none), NDCG@k with
    exponential gains ``(2^rel - 1) / log2(rank + 1)``, precision@k,
    recall@k, and the relevant-document count.

    ``results`` carries (query, doc, score); ranks are derived as
    ``row_number`` over (score desc, doc asc) so ties break
    deterministically. ``relevance`` carries graded (query, doc, rel);
    rel > 0 counts as relevant. Queries with no relevant documents get
    ndcg/recall 0.0 (idcg and n_rel are 0 — disclosed convention, not
    NaN, so downstream averages are well-defined).

    One window per query list (bounded by the list, never global), one
    equi-join on (query, doc), two aggregates. IDCG re-ranks the
    relevance side the same way (rel desc, doc asc)."""
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    res = results.select(
        F.col(query_col).alias("qid"), F.col(doc_col).alias("doc"),
        F.col(score_col).alias("score"))
    rel = relevance.select(
        F.col(query_col).alias("qid"), F.col(doc_col).alias("doc"),
        F.col(rel_col).cast("double").alias("rel"))
    wr = Window.partitionBy("qid").orderBy(F.desc("score"), F.asc("doc"))
    topk = (res.withColumn("rank", F.row_number().over(wr))
            .filter(F.col("rank") <= k))
    joined = topk.join(rel, ["qid", "doc"], "left").select(
        "qid", "rank", F.coalesce("rel", F.lit(0.0)).alias("rel"))
    gain = (F.pow(F.lit(2.0), F.col("rel")) - 1) / F.log2(F.col("rank") + 1)
    per_q = joined.groupBy("qid").agg(
        F.sum(gain).alias("dcg"),
        F.min(F.when(F.col("rel") > 0, F.col("rank"))).alias("first_rel"),
        F.sum(F.when(F.col("rel") > 0, 1).otherwise(0)).alias("hits"),
        F.count("*").alias("returned"))
    # ideal DCG: the relevance list itself ranked rel desc, doc asc
    wi = Window.partitionBy("qid").orderBy(F.desc("rel"), F.asc("doc"))
    ideal = (rel.filter(F.col("rel") > 0)
             .withColumn("irank", F.row_number().over(wi))
             .groupBy("qid")
             .agg(F.sum(F.when(
                 F.col("irank") <= k,
                 (F.pow(F.lit(2.0), F.col("rel")) - 1)
                 / F.log2(F.col("irank") + 1))).alias("idcg"),
                 F.count("*").alias("n_rel")))
    out = per_q.join(ideal, "qid", "left")
    idcg = F.coalesce("idcg", F.lit(0.0))
    n_rel = F.coalesce("n_rel", F.lit(0))
    return out.select(
        F.col("qid").alias(query_col),
        F.when(F.col("first_rel").isNotNull(),
               1.0 / F.col("first_rel")).otherwise(F.lit(0.0)).alias("mrr"),
        F.when(idcg > 0, F.col("dcg") / idcg)
        .otherwise(F.lit(0.0)).alias("ndcg"),
        (F.col("hits") / F.lit(float(k))).alias("precision_k"),
        F.when(n_rel > 0, F.col("hits") / n_rel)
        .otherwise(F.lit(0.0)).alias("recall_k"),
        n_rel.alias("n_rel"))


def classification_report(pairs: DataFrame, *,
                          label_col: str = "label",
                          pred_col: str = "pred") -> DataFrame:
    """Per-class precision/recall/F1 + support from (label, prediction)
    pairs — the evaluation side of the corpus-quality classifier.

    Computed from three map-combinable aggregates (true positives per
    class, predicted count per class, actual count per class) joined on
    the class — never a collect, never a confusion-matrix pivot in the
    driver. Classes appearing only in predictions get support 0 and
    recall 0; classes never predicted get precision 0. F1 is 0 when
    p + r is 0 (disclosed convention)."""
    p = pairs.select(F.col(label_col).alias("label"),
                     F.col(pred_col).alias("pred"))
    tp = (p.filter(F.col("label") == F.col("pred"))
          .groupBy(F.col("label").alias("cls"))
          .agg(F.count("*").alias("tp")))
    pred_n = (p.groupBy(F.col("pred").alias("cls"))
              .agg(F.count("*").alias("n_pred")))
    act_n = (p.groupBy(F.col("label").alias("cls"))
             .agg(F.count("*").alias("support")))
    out = (act_n.join(pred_n, "cls", "full")
           .join(tp, "cls", "left")
           .select("cls",
                   F.coalesce("tp", F.lit(0)).alias("tp"),
                   F.coalesce("n_pred", F.lit(0)).alias("n_pred"),
                   F.coalesce("support", F.lit(0)).alias("support")))
    prec = F.when(F.col("n_pred") > 0,
                  F.col("tp") / F.col("n_pred")).otherwise(F.lit(0.0))
    rec = F.when(F.col("support") > 0,
                 F.col("tp") / F.col("support")).otherwise(F.lit(0.0))
    return (out.withColumn("precision", prec).withColumn("recall", rec)
            .withColumn("f1", F.when(
                (F.col("precision") + F.col("recall")) > 0,
                2 * F.col("precision") * F.col("recall")
                / (F.col("precision") + F.col("recall")))
                .otherwise(F.lit(0.0)))
            .select("cls", "precision", "recall", "f1", "support"))


def calibration_bins(scored: DataFrame, *,
                     score_col: str = "score", label_col: str = "label",
                     n_bins: int = 10) -> DataFrame:
    """Reliability diagram bins for a probabilistic classifier ->
    (bin, n, confidence, accuracy, abs_gap): fixed-width bins over
    [0, 1] (score exactly 1.0 lands in the top bin), per-bin mean
    predicted score (confidence) vs observed positive rate (accuracy).
    The count-weighted mean of ``abs_gap`` is the Expected Calibration
    Error (Guo et al. 2017); the per-bin rows are the diagram itself.

    One map-combinable aggregation; counts and the label sum are exact
    integers, so accuracy is bit-deterministic. Scores outside [0, 1]
    or NULL raise no silent clamping — they are filtered out and would
    distort calibration silently; callers feeding logits must
    normalize first (documented contract).
    """
    if n_bins < 1:
        raise ValueError(f"n_bins must be >= 1, got {n_bins}")
    s = (scored.select(F.col(score_col).cast("double").alias("s"),
                       F.col(label_col).cast("int").alias("y"))
         .filter(F.col("s").isNotNull() & F.col("y").isNotNull()
                 & (F.col("s") >= 0) & (F.col("s") <= 1)))
    b = F.least(F.floor(F.col("s") * n_bins).cast("int"),
                F.lit(n_bins - 1))
    return (s.withColumn("bin", b)
            .groupBy("bin")
            .agg(F.count(F.lit(1)).alias("n"),
                 F.avg("s").alias("confidence"),
                 (F.sum("y").cast("double") / F.count(F.lit(1)))
                 .alias("accuracy"))
            .withColumn("abs_gap",
                        F.abs(F.col("confidence") - F.col("accuracy"))))


def roc_auc(scored: DataFrame, *, label_col: str = "label",
            score_col: str = "score") -> DataFrame:
    """EXACT ROC-AUC (the Mann-Whitney U form, ties at half credit):
    AUC = Σ_s  p_s · (N_<s + n_s/2)  / (P·N)  where p_s/n_s are the
    positive/negative counts AT score s and N_<s the negatives strictly
    below — the probability a random positive outranks a random
    negative. This is the classifier-quality number behind every
    "quality filter at threshold θ" decision; ECE (calibration_bins)
    says whether scores are honest, AUC says whether they ORDER.

    Scale: one map-combinable (score -> p, n) aggregate first, THEN a
    running window over the DISTINCT-score table — the global sort
    touches |distinct scores| rows (thousands), never the corpus. An
    exact AUC needs a total order over scores; aggregating before
    ordering is what keeps that from being a corpus-wide
    single-partition sort.

    Returns ONE row (auc double, positives long, negatives long).
    Raises if either class is absent — AUC is undefined, and a silent
    0.5 would hide a broken upstream label join."""
    per = (scored.groupBy(F.col(score_col).alias("s"))
           .agg(F.sum(F.col(label_col).cast("long")).alias("p"),
                F.sum(F.lit(1) - F.col(label_col).cast("long"))
                .alias("n")))
    w = Window.orderBy("s").rowsBetween(Window.unboundedPreceding, -1)
    contrib = per.select(
        "p", "n",
        (F.col("p").cast("double")
         * (F.coalesce(F.sum("n").over(w), F.lit(0)).cast("double")
            + F.col("n").cast("double") / 2.0)).alias("c"))
    out = contrib.agg(F.sum("p").alias("positives"),
                      F.sum("n").alias("negatives"),
                      F.sum("c").alias("num"))
    return out.select(
        F.when((F.col("positives") > 0) & (F.col("negatives") > 0),
               F.col("num") / (F.col("positives")
                               * F.col("negatives")).cast("double"))
        .otherwise(F.raise_error(F.lit(
            "roc_auc: need at least one positive and one negative "
            "label"))).alias("auc"),
        "positives", "negatives")
