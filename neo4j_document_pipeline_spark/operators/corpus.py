"""Corpus-level text analytics — statistics that need the WHOLE corpus,
not one document: TF-IDF keyword extraction and unigram language-model
scoring (the perplexity-proxy quality filter; CCNet filters Common
Crawl with a KenLM 5-gram the same way — the unigram form is the
sandbox-honest version with the identical pipeline shape).

Both share one scale skeleton: explode tokens (narrow), hash-aggregate
counts, join docs to the corpus statistics, and fold every corpus-wide
scalar (document count, token total) IN-PLAN as a broadcast one-row
aggregate — zero driver actions, so each scorer is a single job at any
scale. Tokenization is the engine's ``col_tokens`` so every number is
plain-SQL reproducible.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from neo4j_document_pipeline_spark.functions.textstats import (
    col_let, col_tokens)


def corpus_tfidf_top_terms(df: DataFrame, id_col: str, text_col: str,
                           k: int = 3) -> DataFrame:
    """Top-``k`` TF-IDF terms per document -> (id_col, term, tf, dfreq,
    score, rank): the classic keyword-extraction / index-term primitive
    (what a search head shows as "why this document matched" and a
    training-data pipeline uses as cheap topic tags).

    score = tf · ln(N / dfreq) with raw term counts, N = total docs and
    dfreq = documents containing the term; ties rank by term ascending
    so the output is deterministic and SQL-replayable. Documents with
    no tokens yield no rows.

    Shape: one (doc, term) hash aggregate, one term-level aggregate
    joined back on the term (both near-uniform keys at corpus scale:
    hot terms have high dfreq but one row each), N folded in-plan via a
    broadcast 1-row aggregate, and the per-document top-k window — a
    partition-local sort over each doc's distinct terms (bounded by
    document length, never a global sort).
    """
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    tf = (
        df.select(F.col(id_col), F.explode(col_tokens(F.col(text_col)))
                  .alias("term"))
        .groupBy(id_col, "term").agg(F.count("*").alias("tf"))
    )
    dfreq = tf.groupBy("term").agg(F.count("*").alias("dfreq"))
    n1 = df.agg(F.count("*").cast("double").alias("n_docs"))
    scored = (
        tf.join(dfreq, "term")
        .join(F.broadcast(n1), F.lit(True))
        .withColumn("score",
                    F.col("tf") * F.log(F.col("n_docs") / F.col("dfreq")))
    )
    w = Window.partitionBy(id_col).orderBy(F.desc("score"), F.asc("term"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(id_col, "term", "tf", "dfreq", "score", "rank")
    )


def unigram_logprob_scores(df: DataFrame, id_col: str,
                           text_col: str) -> DataFrame:
    """Average per-token log-probability of each document under the
    corpus's own unigram distribution -> (id_col, n_tok, avg_logprob):
    the perplexity-proxy quality filter (CCNet §4.3 shape). Documents
    full of corpus-typical words score near the entropy ceiling;
    gibberish, character noise, and wrong-language text score far
    below it — sort ascending and the junk surfaces first. Empty
    documents return n_tok 0 with NULL avg_logprob (no tokens means no
    evidence, not evidence of quality).

    p(w) = count(w) / total_tokens over the WHOLE corpus (every token
    has p > 0 by construction — the vocabulary is the corpus's own, so
    no smoothing is needed). avg_logprob = mean ln p(w) over the
    document's tokens, counted WITH multiplicity.

    Shape: token explode -> one corpus-level hash aggregate (word
    counts, near-uniform after the head; the head words are single hot
    ROWS, not hot partitions of a skewed join — the join back is on the
    token string with per-doc fan-out bounded by document length) ->
    total folded in-plan via a broadcast 1-row aggregate -> one hash
    aggregate back to documents. Two shuffles total, zero driver
    actions.
    """
    toks = df.select(F.col(id_col),
                     F.explode_outer(col_tokens(F.col(text_col)))
                     .alias("term"))
    counts = (toks.filter(F.col("term").isNotNull())
              .groupBy("term").agg(F.count("*").alias("c")))
    tot = counts.agg(F.sum("c").cast("double").alias("total"))
    scored = (
        toks.join(counts, "term", "left")
        .join(F.broadcast(tot), F.lit(True))
        .withColumn("lp", F.log(F.col("c") / F.col("total")))
    )
    return (
        scored.groupBy(id_col)
        .agg(F.count("lp").alias("n_tok"),
             F.avg("lp").alias("avg_logprob"))
    )


def bigram_logprob_scores(df: DataFrame, id_col: str, text_col: str,
                          *, add_k: float = 0.5) -> DataFrame:
    """Average per-bigram conditional log-probability of each document
    under the corpus's own add-k-smoothed bigram model -> (id_col,
    n_big, avg_logprob): the context-aware upgrade of
    ``unigram_logprob_scores`` (one rung up the CCNet/KenLM n-gram
    ladder). A document whose word ORDER is corpus-typical scores
    high; shuffled or template-spliced text with a normal unigram
    profile — which the unigram filter cannot see — scores low,
    because p(w₂|w₁) collapses on never-seen-adjacent pairs.

    p(w₂|w₁) = (c(w₁w₂) + k) / (c₁(w₁) + k·V) with c(w₁w₂) the corpus
    bigram count, c₁(w₁) the count of w₁ as a LEFT context, and V the
    corpus unigram vocabulary size — Laplace/Lidstone smoothing, so the
    scorer stays well-defined when applied to held-out text containing
    unseen pairs (k=0 is the raw MLE; every self-scored pair has
    c ≥ 1, so k=0 is valid here too). avg_logprob = mean ln p over the
    document's bigrams WITH multiplicity; documents with fewer than
    two tokens return n_big 0 with NULL avg_logprob.

    Shape: bigrams are built inside the token ARRAY (zip_with over two
    slices — no positional self-join), exploded once; one corpus hash
    aggregate for bigram counts, one for left-context counts, V folded
    in-plan as a broadcast 1-row distinct-count aggregate, one hash
    aggregate back to documents. Head bigrams are hot ROWS of the
    count tables, not hot partitions of the join back (per-doc fan-out
    is bounded by document length). Zero driver actions.
    """
    if add_k < 0:
        raise ValueError(f"add_k must be >= 0, got {add_k}")
    toks = col_tokens(F.col(text_col))
    # tokens let-bound: the two slices + size would otherwise each
    # re-run the tokenizer (constant-factor, not quadratic — the
    # lambda only touches its own variables)
    bigrams = col_let(toks, lambda tk: F.when(
        F.size(tk) >= 2,
        F.zip_with(F.slice(tk, 1, F.size(tk) - 1),
                   F.slice(tk, 2, F.size(tk) - 1),
                   lambda a, b: F.struct(a.alias("w1"), b.alias("w2")))))
    pairs = (df.select(F.col(id_col), F.explode_outer(bigrams)
                       .alias("_bg"))
             .select(id_col, F.col("_bg.w1").alias("w1"),
                     F.col("_bg.w2").alias("w2")))
    seen = pairs.filter(F.col("w1").isNotNull())
    c2 = seen.groupBy("w1", "w2").agg(F.count("*").alias("c2"))
    c1 = seen.groupBy("w1").agg(F.count("*").alias("c1"))
    vocab = (df.select(F.explode(toks).alias("term"))
             .agg(F.countDistinct("term").cast("double").alias("v")))
    scored = (
        pairs.join(c2, ["w1", "w2"], "left")
        .join(c1, ["w1"], "left")
        .join(F.broadcast(vocab), F.lit(True))
        .withColumn("lp", F.log(
            (F.col("c2") + F.lit(float(add_k)))
            / (F.col("c1") + F.lit(float(add_k)) * F.col("v"))))
    )
    return (
        scored.groupBy(id_col)
        .agg(F.count("lp").alias("n_big"),
             F.avg("lp").alias("avg_logprob"))
    )


def bm25_scores(df: DataFrame, id_col: str, text_col: str,
                query: str, *, k1: float = 1.2,
                b: float = 0.75) -> DataFrame:
    """Okapi BM25 relevance of every document to ``query`` ->
    (id_col, n_hit, score): the classic probabilistic IR scorer
    (Robertson et al., TREC-3) in its Lucene form — idf(t) =
    ln(1 + (N - df + 0.5)/(df + 0.5)), tf saturating at k1, length
    normalization b against the corpus mean. Documents matching no
    query term yield no row. The document-level retrieval companion to
    the entity FTS index: same bag-of-words model, stateless over any
    documents frame.

    Query terms are tokenized with the engine's ``col_tokens`` and
    deduplicated (bag-of-words query, standard BM25). Every number is
    a pure function of the corpus + query, so a plain-SQL oracle
    reproduces the scores bit-for-bit.

    Shape: one narrow token explode FILTERED to the query's terms
    before it ever shuffles (the per-doc tf aggregate sees only
    matching tokens — at 100 TB the shuffled volume is proportional to
    the query terms' postings, not the corpus); per-term document
    frequencies from one tiny aggregate over the tf rows; N and the
    average length folded in-plan as a broadcast 1-row aggregate over
    a second narrow pass (no driver action)."""
    if k1 < 0 or not (0.0 <= b <= 1.0):
        raise ValueError(f"need k1 >= 0 and 0 <= b <= 1, got k1={k1}, "
                         f"b={b}")
    import re as _re
    q_terms = sorted({t for t in _re.split(
        r"[^A-Za-z0-9']+", query.lower()) if t})
    if not q_terms:
        raise ValueError("bm25_scores: query has no tokens")
    toks = col_tokens(F.col(text_col))
    lens = df.select(F.col(id_col), F.size(toks).alias("dl"))
    stats = lens.agg(F.count("*").cast("double").alias("n_docs"),
                     F.avg("dl").alias("avgdl"))
    tf = (df.select(F.col(id_col), F.explode(toks).alias("term"))
          .filter(F.col("term").isin(q_terms))
          .groupBy(id_col, "term").agg(F.count("*").alias("tf")))
    dfreq = tf.groupBy("term").agg(F.count("*").alias("dfreq"))
    idf = F.log(F.lit(1.0) + (F.col("n_docs") - F.col("dfreq") + 0.5)
                / (F.col("dfreq") + 0.5))
    norm = F.col("tf") * (k1 + 1) / (
        F.col("tf") + k1 * (1 - b + b * F.col("dl") / F.col("avgdl")))
    per_term = (
        tf.join(dfreq, "term")
        .join(lens, id_col)
        .join(F.broadcast(stats), F.lit(True))
        .withColumn("contrib", idf * norm)
    )
    return (per_term.groupBy(id_col)
            .agg(F.count("*").alias("n_hit"),
                 F.sum("contrib").alias("score")))


def ngram_diversity(df: DataFrame, group_col: str, text_col: str, *,
                    ns: tuple[int, ...] = (1, 2, 3)) -> DataFrame:
    """Corpus n-gram diversity per group -> (group_col, n, total_grams,
    distinct_grams, diversity): for each gram size, the fraction of the
    group's n-gram OCCURRENCES that are distinct types. The
    distinct-n-gram ratio is the standard mode-collapse check for
    synthetic / model-generated corpora (the corpus-level complement of
    Self-BLEU: duplicated phrasing drags diversity toward 0 long before
    exact-dedup would fire) and a Zipf-shape probe for scraped text
    (boilerplate-heavy sources sit far below organic ones at n=2,3).
    n=1 is the classic type-token ratio.

    Groups with no tokens of size >= n yield no row for that n (no
    evidence). Tokenization is the engine's ``col_tokens``, so every
    number is plain-SQL reproducible.

    Shape: every gram size is built inside the token ARRAY and tagged
    (n, gram) before ONE explode — a single narrow pass over the corpus
    feeding one (group, n) aggregate with a distinct count; no
    per-size re-scan, no join. At 100 TB the aggregate keys are
    (groups × |ns|) — trivially small — and the distinct runs
    map-side-combinable over near-uniform gram hashes."""
    if not ns:
        raise ValueError("ngram_diversity: ns must be non-empty")
    if any(n < 1 for n in ns):
        raise ValueError(f"every n must be >= 1, got {ns}")
    def tagged(toks, n):
        grams = F.when(
            F.size(toks) >= n,
            F.transform(
                F.sequence(F.lit(1), F.size(toks) - n + 1),
                lambda i: F.concat_ws(" ", F.slice(toks, i, n))),
        ).otherwise(F.array().cast("array<string>"))
        return F.transform(
            grams, lambda g: F.struct(F.lit(n).cast("int").alias("n"),
                                      g.alias("gram")))

    # tokens let-bound ONCE for every n (the gram lambdas slice a
    # materialized array instead of re-tokenizing per gram; see col_let)
    combos = col_let(
        col_tokens(F.col(text_col)),
        lambda toks: F.flatten(
            F.array(*[tagged(toks, n) for n in sorted(set(ns))])))
    ex = df.select(F.col(group_col), F.explode(combos).alias("_t")) \
           .select(group_col, F.col("_t.n").alias("n"),
                   F.col("_t.gram").alias("gram"))
    return (ex.groupBy(group_col, "n")
            .agg(F.count("*").alias("total_grams"),
                 F.countDistinct("gram").alias("distinct_grams"))
            .withColumn("diversity",
                        F.col("distinct_grams") / F.col("total_grams")))


def dsir_log_weights(raw: DataFrame, id_col: str, text_col: str,
                     target: DataFrame, target_text_col: str | None = None,
                     *, buckets: int = 8192, add_k: float = 0.5,
                     salt: str = "v1") -> DataFrame:
    """DSIR importance weights (Xie et al. 2023, "Data Selection for
    Language Models via Importance Resampling") -> (id_col, n_feat,
    log_ratio): for every raw document, the log importance ratio

        log_ratio = sum_{f in feats(doc)} ln( p_target(f) / p_raw(f) )

    under hashed-n-gram bag-of-features unigram models of the TARGET
    corpus (the distribution you want — curated text) and the RAW
    corpus (the distribution you have — the crawl). Features are the
    document's unigrams and bigrams hashed into ``buckets`` cells with
    the engine's deterministic sha256 draw (the paper's hashing trick:
    a fixed feature space whatever the vocabulary), each distribution
    Lidstone-smoothed with ``add_k`` over the full bucket range so
    every feature has positive mass in both models and nothing is
    dropped. Resampling is then exactly the existing machinery: keep
    documents with probability ∝ exp(log_ratio) via
    ``operators/sampling.py::weighted_sample`` — together they are the
    paper's pipeline. Documents with no tokens get n_feat 0 and
    log_ratio 0 (no evidence either way).

    Everything is a pure function of (raw, target, buckets, add_k,
    salt): integer hash-bucket counts and one ln per scored feature,
    so a plain-SQL oracle replays the weights (compare at 4dp — the
    sums run over hundreds of ln terms).

    Shape at 100 TB: each corpus is scanned ONCE — the exploded
    (doc, bucket) frame is lazily checkpoint-reused between the
    bucket-count aggregate and the scoring join (without it Catalyst
    re-runs the scan for each consumer). Both models are at most
    ``buckets`` rows (broadcast side of the scoring join), totals fold
    in-plan as broadcast one-row aggregates, and the per-doc sum is one
    hash aggregate. Zero driver actions, nothing quadratic, no skew:
    hot buckets are hot ROWS of a count table, and the scoring join's
    fan-out is bounded by document length.
    """
    if buckets < 1:
        raise ValueError(f"buckets must be >= 1, got {buckets}")
    if not add_k > 0:
        raise ValueError(f"add_k must be > 0, got {add_k}")
    tcol = target_text_col or text_col

    def feats(text_col_name):
        # tokens let-bound: size + two slices + the unigram transform
        # would otherwise each re-run the tokenizer per row
        def with_toks(toks):
            n = F.size(toks)
            uni = F.transform(
                toks, lambda t: F.concat(F.lit(f"{salt}:u:"), t))
            big = F.when(
                n >= 2,
                F.zip_with(F.slice(toks, 1, n - 1),
                           F.slice(toks, 2, n - 1),
                           lambda a, b: F.concat(F.lit(f"{salt}:b:"), a,
                                                 F.lit(" "), b)),
            ).otherwise(F.array().cast("array<string>"))
            keyed = F.concat(uni, big)
            return F.transform(
                keyed,
                lambda s: (F.conv(F.substring(F.sha2(s, 256), 1, 8),
                                  16, 10).cast("bigint") % buckets))

        return col_let(col_tokens(F.col(text_col_name)), with_toks)

    tb = (target.select(F.explode(feats(tcol)).alias("b"))
          .groupBy("b").agg(F.count("*").alias("tc")))
    rb_rows = raw.select(F.col(id_col), F.explode_outer(feats(text_col))
                         .alias("b")).localCheckpoint(eager=False)
    rb = (rb_rows.filter(F.col("b").isNotNull())
          .groupBy("b").agg(F.count("*").alias("rc")))
    t_tot = tb.agg(F.coalesce(F.sum("tc"), F.lit(0)).cast("double")
                   .alias("tt"))
    r_tot = rb.agg(F.coalesce(F.sum("rc"), F.lit(0)).cast("double")
                   .alias("rt"))
    k, bf = float(add_k), float(buckets)
    model = (
        tb.join(rb, "b", "full")
        .join(F.broadcast(t_tot), F.lit(True))
        .join(F.broadcast(r_tot), F.lit(True))
        .select("b", F.log(
            ((F.coalesce(F.col("tc"), F.lit(0)) + k)
             / (F.col("tt") + k * bf))
            / ((F.coalesce(F.col("rc"), F.lit(0)) + k)
               / (F.col("rt") + k * bf))).alias("lr"))
    )
    # buckets absent from BOTH corpora score ln((k/(tt+kB))/(k/(rt+kB)))
    # — a constant that never multiplies anything (no document contains
    # them), so the full-join model table is complete for every scored
    # feature without materializing all `buckets` rows
    return (
        rb_rows.join(model, "b", "left")
        .groupBy(id_col)
        .agg(F.count("lr").cast("bigint").alias("n_feat"),
             F.coalesce(F.sum("lr"), F.lit(0.0)).alias("log_ratio"))
    )


def winnow_fingerprints(df: DataFrame, id_col: str, text_col: str, *,
                        k: int = 5, window: int = 4,
                        salt: str = "v1") -> DataFrame:
    """Winnowing document fingerprints (Schleimer, Wilkerson, Aiken
    2003 — the MOSS algorithm) -> distinct (id_col, fp) rows: the
    minimum k-gram hash of every ``window`` consecutive positions.

    Winnowing's guarantee: any shared substring of at least
    k + window - 1 tokens between two documents produces at least one
    SHARED fingerprint — so plagiarized/quoted/mirrored passages are
    detectable from a sample ~2/(window+1) the size of the full gram
    set, which is the storage knob full-shingle MinHash lacks.
    Documents with fewer than ``window`` grams (but at least one)
    contribute their single minimum hash, so every tokenizable doc has
    a fingerprint. Hashes are the engine's deterministic sha256 head
    (bit-exact in any engine); fingerprint ties inside a window are a
    SET union here (positions aren't emitted), so the rightmost-tie
    rule of the paper — which only disambiguates positions — doesn't
    apply.

    Shape: gram explode (narrow), one per-document window (min over
    the next ``window`` rows in position order — partition-local,
    bounded by document length), one distinct. At corpus scale the
    heavy join these fingerprints feed (find docs sharing a print) is
    a hash groupBy on fp — near-uniform keys by construction.
    """
    if k < 1 or window < 1:
        raise ValueError(f"k and window must be >= 1, got k={k}, "
                         f"window={window}")
    # tokens let-bound so the gram lambda slices a materialized array
    # instead of re-tokenizing per position (see col_let)
    grams = col_let(
        col_tokens(F.col(text_col)),
        lambda toks: F.when(
            F.size(toks) >= k,
            F.transform(F.sequence(F.lit(1), F.size(toks) - k + 1),
                        lambda i: F.concat_ws(" ", F.slice(toks, i, k))),
        ).otherwise(F.array().cast("array<string>")))
    g = (df.select(F.col(id_col), grams.alias("_grams"))
         .select(id_col, F.size("_grams").alias("_n"),
                 F.posexplode("_grams").alias("_pos", "_gram")))
    h = F.conv(F.substring(
        F.sha2(F.concat(F.lit(f"{salt}:"), F.col("_gram")), 256),
        1, 8), 16, 10).cast("bigint")
    from pyspark.sql import Window as W
    win = (W.partitionBy(id_col).orderBy("_pos")
           .rowsBetween(W.currentRow, window - 1))
    return (
        g.withColumn("_h", h)
        .withColumn("_wmin", F.min("_h").over(win))
        # one window per position 1..max(n-window+1, 1); posexplode is
        # 0-based, so positions 0..max(n-window, 0)
        .filter(F.col("_pos") <= F.greatest(F.col("_n") - window,
                                            F.lit(0)))
        .select(id_col, F.col("_wmin").alias("fp"))
        .distinct()
    )


def mixture_weights(df: DataFrame, group_col: str, tokens_col: str, *,
                    alpha: float = 0.5,
                    budget_tokens: int | None = None) -> DataFrame:
    """Temperature-scaled source-mixture weights -> (group_col, n_docs,
    tokens, p_raw, weight[, epochs]): the pretraining data-mixing
    primitive (GPT-3 §2.2 / multilingual temperature sampling). Raw
    source shares p_raw = tokens_g / T are smoothed to
    weight_g ∝ tokens_g^alpha — alpha 1 keeps the natural mix, alpha→0
    flattens toward uniform, the standard knob that keeps a giant crawl
    from drowning small high-quality sources. With ``budget_tokens``
    set, ``epochs`` = weight_g · budget / tokens_g is the implied
    number of passes over each source (epochs > 1 flags sources the
    mixture would repeat — the memorization-risk readout).

    Cross-engine determinism: per-group token totals are exact integer
    sums; the smoothed score is fixed-pointed to 1e-6 BEFORE the
    normalizing sum (floor(s·1e6 + 0.5) as bigint), so the denominator
    is an exact integer in any summation order and any engine, and
    every emitted ratio is one correctly-rounded division of identical
    integers. alpha = 1 never touches a double at all — the raw token
    counts ARE the scores (weight ≡ p_raw exactly, no 1e6 scaling, so
    a multi-trillion-token source can neither saturate the bigint nor
    lose integer exactness above 2^53); alpha = 0.5 uses sqrt
    (IEEE-exact, bit-identical across engines, and sqrt(int64)·1e6
    stays far below the bigint ceiling); other alphas go through pow,
    whose last-ulp may differ between libm builds — fine in practice,
    but the bit-exact guarantee is documented for the sqrt/identity
    paths.

    Shape: ONE hash aggregate over the corpus (map-side partial sums —
    a 10^9-document source is one partial per input partition, never a
    hot task). The grouped frame (#sources rows) is lazily
    checkpoint-reused by the totals pass, so the corpus is scanned and
    tokenized ONCE — without it Catalyst prunes the two branches
    differently and re-runs the full scan for the 1-row totals
    aggregate. Totals fold back in-plan as a broadcast 1-row aggregate
    (tree-combined partials, never a single-task global window, so a
    by-domain grouping with 10^7 keys still scales). Output rows =
    number of sources.
    """
    if not alpha > 0:
        raise ValueError(f"alpha must be > 0, got {alpha}")
    if budget_tokens is not None and budget_tokens < 0:
        raise ValueError(f"budget_tokens must be >= 0, got {budget_tokens}")
    g = df.groupBy(group_col).agg(
        F.count("*").alias("n_docs"),
        F.coalesce(F.sum(F.col(tokens_col).cast("long")), F.lit(0))
        .cast("long").alias("tokens"))
    if alpha == 1.0:
        # identity smoothing: keep the exact integer counts as the
        # scores — no double round-trip, no fixed-point scaling
        g = g.withColumn("_k", F.col("tokens"))
    else:
        if alpha == 0.5:
            s = F.sqrt(F.col("tokens").cast("double"))
        else:
            s = F.pow(F.col("tokens").cast("double"),
                      F.lit(float(alpha)))
        g = g.withColumn("_k", F.floor(s * 1e6 + 0.5).cast("long"))
    g = g.localCheckpoint(eager=False)
    tot = g.agg(F.sum("tokens").cast("long").alias("_t"),
                F.sum("_k").cast("long").alias("_ksum"))
    out = (
        g.join(F.broadcast(tot), F.lit(True))
        .withColumn("_w", F.col("_k") / F.col("_ksum"))
        .withColumn("p_raw", F.round(F.col("tokens") / F.col("_t"), 6))
        .withColumn("weight", F.round("_w", 6))
    )
    cols = [group_col, "n_docs", "tokens", "p_raw", "weight"]
    if budget_tokens is not None:
        out = out.withColumn(
            "epochs",
            F.when(F.col("tokens") > 0,
                   F.round(F.col("_w") * F.lit(float(budget_tokens))
                           / F.col("tokens"), 4)))
        cols.append("epochs")
    return out.select(*cols)


# ---------------------------------------------------------------------------
# C4-style page/line quality filters (Raffel et al. 2019, §2.2)
# ---------------------------------------------------------------------------

# Placeholder skip-list standing in for C4's "List of Dirty, Naughty ...
# Words" (the real list ships with the deployment, not the engine);
# matched as whole words, case-insensitively.
C4_BADWORDS = ("casino", "viagra", "lottery")

_TERMINAL_RE = r'[.!?"]$'


def c4_quality_filters(df: DataFrame, id_col: str, text_col: str, *,
                       min_words_per_line: int = 5,
                       min_sentences: int = 3,
                       badwords: tuple[str, ...] = C4_BADWORDS) -> DataFrame:
    """The C4 cleaning rules (Raffel et al. 2019 §2.2) as one narrow
    pass -> (id, lines_total, lines_kept, sentences_kept, has_lorem,
    has_brace, has_badword, keep, text_clean).

    Line rules (a trimmed line survives iff ALL hold):
      - ends in terminal punctuation (``.`` ``!`` ``?`` ``"``),
      - has >= ``min_words_per_line`` whitespace-separated words,
      - does not contain the word "javascript" (case-insensitive).
    Page rules (``keep`` is true iff ALL hold):
      - >= ``min_sentences`` sentence terminators in the KEPT text,
      - no "lorem ipsum" placeholder (case-insensitive substring),
      - no ``{`` anywhere (the code/JSON tell),
      - no word from the bad-word skip-list.

    Scale shape: pure ``Column`` expressions over one split/filter/join
    chain — whole-stage codegen, zero shuffles, zero UDFs; cost is one
    scan regardless of cluster size. Every rule is plain-SQL
    reproducible (the oracle replays it verbatim). C4's remaining rule
    (three-sentence-span dedup across pages) is the committed span gate
    (operators/spans.py) — it needs corpus state, not a row pass.
    """
    if min_words_per_line < 1 or min_sentences < 0:
        raise ValueError("c4_quality_filters: min_words_per_line >= 1 "
                         "and min_sentences >= 0 required")
    if not badwords:
        raise ValueError("c4_quality_filters: empty badwords — pass "
                         "None semantics via a never-matching word "
                         "is not supported; supply at least one word")
    bad_re = "(?i)\\b(" + "|".join(badwords) + ")\\b"
    text = F.col(text_col)
    lines = F.split(text, "\n")
    # NOT F.transform(lines, F.trim): transform sees trim's optional
    # second parameter and passes the element INDEX as the trim
    # character set (two-parameter TRIM), silently stripping index
    # digits from line edges
    trimmed = F.transform(lines, lambda l: F.trim(l))

    def _nwords(line):
        return F.size(F.regexp_extract_all(line, F.lit(r"\S+"), 0))

    kept_arr = F.filter(
        trimmed,
        lambda l: l.rlike(_TERMINAL_RE)
        & (_nwords(l) >= F.lit(min_words_per_line))
        & ~l.rlike(r"(?i)\bjavascript\b"))
    d = df.select(
        F.col(id_col),
        F.size(lines).alias("lines_total"),
        F.size(kept_arr).alias("lines_kept"),
        F.array_join(kept_arr, "\n").alias("text_clean"),
        F.lower(text).contains("lorem ipsum").alias("has_lorem"),
        text.contains("{").alias("has_brace"),
        text.rlike(bad_re).alias("has_badword"),
    ).withColumn(
        "sentences_kept",
        F.size(F.regexp_extract_all(F.col("text_clean"),
                                    F.lit(r"[.!?]"), 0)),
    )
    keep = ((F.col("lines_kept") > 0)
            & (F.col("sentences_kept") >= F.lit(min_sentences))
            & ~F.col("has_lorem") & ~F.col("has_brace")
            & ~F.col("has_badword"))
    return d.select(id_col, "lines_total", "lines_kept",
                    "sentences_kept", "has_lorem", "has_brace",
                    "has_badword", keep.alias("keep"), "text_clean")


GOPHER_STOPWORDS = ("the", "be", "to", "of", "and", "that", "have",
                    "with")
_GOPHER_SYMBOL_RE = r"#|\.\.\.|…"
_BULLET_CHARS = ("•", "-", "*")


def gopher_quality_filters(df: DataFrame, id_col: str, text_col: str, *,
                           min_words: int = 50,
                           max_words: int = 100_000,
                           min_mean_word_len: float = 3.0,
                           max_mean_word_len: float = 10.0,
                           max_symbol_ratio: float = 0.1,
                           min_alpha_word_frac: float = 0.8,
                           max_bullet_line_frac: float = 0.9,
                           max_ellipsis_line_frac: float = 0.3,
                           min_stopwords: int = 2,
                           stopwords: tuple[str, ...] = GOPHER_STOPWORDS
                           ) -> DataFrame:
    """The Gopher page-quality rules (Rae et al. 2021, table A1) as one
    narrow pass -> (id, n_words, mean_word_len, symbol_ratio,
    alpha_word_frac, bullet_line_frac, ellipsis_line_frac,
    n_stopwords, keep) — the rule-based sibling of
    ``c4_quality_filters`` (C4 cuts LINES; Gopher judges the PAGE by
    shape statistics). ``keep`` is true iff ALL hold:

      - ``min_words`` <= word count <= ``max_words``
        (words = whitespace-separated runs of the RAW text),
      - mean word length in [``min_mean_word_len``,
        ``max_mean_word_len``],
      - (count of ``#`` / ``...`` / ``…`` symbols) / words
        <= ``max_symbol_ratio``,
      - fraction of words containing >= 1 ASCII letter
        >= ``min_alpha_word_frac``,
      - fraction of non-empty trimmed lines starting with a bullet
        (``•`` ``-`` ``*``) <= ``max_bullet_line_frac``,
      - fraction of non-empty trimmed lines ending with an ellipsis
        <= ``max_ellipsis_line_frac``,
      - >= ``min_stopwords`` DISTINCT words from ``stopwords`` present
        (engine tokenization, so "The"/"the." both count).

    The paper's remaining rule (top-n-gram repetition) is the
    committed ``col_top_ngram`` signal — it rides the same hygiene
    report. Scale shape: pure ``Column`` expressions, zero shuffles,
    zero UDFs, one scan; every statistic is plain-SQL reproducible
    and the ratio arithmetic is integer/integer double division, so
    the oracle matches bit-for-bit."""
    if min_words < 0 or max_words < min_words:
        raise ValueError("gopher_quality_filters: need 0 <= min_words "
                         "<= max_words")
    if min_stopwords < 0:
        raise ValueError("gopher_quality_filters: min_stopwords >= 0 "
                         "required")
    if not stopwords:
        raise ValueError("gopher_quality_filters: empty stopwords — "
                         "pass min_stopwords=0 to disable the rule, "
                         "not an empty list")
    text = F.col(text_col)

    # words and lines are let-bound (col_let): the word stats reference
    # the \S+ extraction four times and the line stats the trimmed
    # split three times — binding evaluates each ONCE per row
    def word_stats(words):
        n_words = F.size(words)
        mean_len = F.when(
            n_words > 0,
            F.aggregate(words, F.lit(0).cast("bigint"),
                        lambda acc, w: acc + F.length(w)).cast("double")
            / n_words).otherwise(F.lit(0.0))
        n_sym = F.size(
            F.regexp_extract_all(text, F.lit(_GOPHER_SYMBOL_RE), 0))
        sym_ratio = F.when(n_words > 0,
                           n_sym / n_words).otherwise(F.lit(0.0))
        alpha_frac = F.when(
            n_words > 0,
            F.size(F.filter(words, lambda w: w.rlike("[a-zA-Z]")))
            / n_words
        ).otherwise(F.lit(0.0))
        return F.struct(n_words.alias("n_words"),
                        mean_len.alias("mean_word_len"),
                        sym_ratio.alias("symbol_ratio"),
                        alpha_frac.alias("alpha_word_frac"))

    def line_stats(lines):
        n_lines = F.size(lines)
        bullet = F.size(F.filter(lines, lambda l: F.substring(l, 1, 1)
                                 .isin(*_BULLET_CHARS)))
        ellip = F.size(F.filter(
            lines, lambda l: l.endswith("...") | l.endswith("…")))
        bullet_frac = F.when(n_lines > 0, bullet / n_lines) \
            .otherwise(F.lit(0.0))
        ellip_frac = F.when(n_lines > 0, ellip / n_lines) \
            .otherwise(F.lit(0.0))
        return F.struct(bullet_frac.alias("bullet_line_frac"),
                        ellip_frac.alias("ellipsis_line_frac"))

    ws = col_let(F.regexp_extract_all(text, F.lit(r"\S+"), 0),
                 word_stats)
    ls = col_let(F.filter(F.transform(F.split(text, "\n"),
                                      lambda l: F.trim(l)),
                          lambda l: l != ""),
                 line_stats)
    n_stop = F.size(F.array_intersect(
        F.array_distinct(col_tokens(text)),
        F.array(*[F.lit(s) for s in stopwords])))
    d = (df.select(F.col(id_col), ws.alias("_w"), ls.alias("_l"),
                   n_stop.alias("n_stopwords"))
         .select(F.col(id_col), F.col("_w.n_words").alias("n_words"),
                 F.col("_w.mean_word_len").alias("mean_word_len"),
                 F.col("_w.symbol_ratio").alias("symbol_ratio"),
                 F.col("_w.alpha_word_frac").alias("alpha_word_frac"),
                 F.col("_l.bullet_line_frac").alias("bullet_line_frac"),
                 F.col("_l.ellipsis_line_frac")
                 .alias("ellipsis_line_frac"),
                 F.col("n_stopwords")))
    keep = ((F.col("n_words") >= F.lit(int(min_words)))
            & (F.col("n_words") <= F.lit(int(max_words)))
            & (F.col("mean_word_len") >= F.lit(float(min_mean_word_len)))
            & (F.col("mean_word_len") <= F.lit(float(max_mean_word_len)))
            & (F.col("symbol_ratio") <= F.lit(float(max_symbol_ratio)))
            & (F.col("alpha_word_frac")
               >= F.lit(float(min_alpha_word_frac)))
            & (F.col("bullet_line_frac")
               <= F.lit(float(max_bullet_line_frac)))
            & (F.col("ellipsis_line_frac")
               <= F.lit(float(max_ellipsis_line_frac)))
            & (F.col("n_stopwords") >= F.lit(int(min_stopwords))))
    return d.select(id_col, "n_words", "mean_word_len", "symbol_ratio",
                    "alpha_word_frac", "bullet_line_frac",
                    "ellipsis_line_frac", "n_stopwords",
                    keep.alias("keep"))


def kl_novelty_scores(df: DataFrame, id_col: str,
                      text_col: str) -> DataFrame:
    """Per-document novelty as KL(doc unigram || corpus unigram) ->
    (id_col, n_tok, kl): how far each document's word distribution
    sits from the corpus average, in nats. Boilerplate and template
    text score near 0 (they ARE the corpus distribution); documents
    about rare topics score high. The diversity-side complement of
    ``unigram_logprob_scores`` (which ranks corpus-TYPICAL text high):
    sampling by KL weight up-weights the long tail a proportional
    sample would drown.

    KL = Σ_w p_d(w) · ln(p_d(w) / p_c(w)) over the document's distinct
    tokens, p_d = c_dw / n_d, p_c = C_w / N. Every doc token is in the
    corpus vocabulary by construction, so the ratio is always finite
    and KL >= 0 exactly (Gibbs). Documents with no tokens are absent
    from the output (no distribution, no divergence).

    Shape: one explode, one (id, term) aggregate (co-partitioned with
    the per-doc total — same key prefix, one shuffle), one corpus term
    aggregate joined back on the term string, total folded in-plan as
    a broadcast row. No windows, no driver actions.
    """
    toks = df.select(F.col(id_col),
                     F.explode(col_tokens(F.col(text_col))).alias("term"))
    dterm = toks.groupBy(id_col, "term").agg(F.count("*").alias("cdt"))
    dtot = dterm.groupBy(id_col).agg(F.sum("cdt").alias("nd"))
    cterm = toks.groupBy("term").agg(F.count("*").alias("cw"))
    ctot = cterm.agg(F.sum("cw").cast("double").alias("ctotal"))
    term_part = (dterm.join(cterm, "term")
                 .join(F.broadcast(ctot), F.lit(True))
                 .groupBy(id_col)
                 .agg(F.sum(
                     F.col("cdt") * (F.log(F.col("cdt"))
                                     - F.log(F.col("cw") / F.col("ctotal"))))
                     .alias("_num")))
    # KL = (Σ c_dt·(ln c_dt − ln p_c)) / n_d − ln n_d, factored so the
    # per-term pass never needs n_d (keeps the aggregate map-combinable)
    return (term_part.join(dtot, id_col)
            .select(F.col(id_col),
                    F.col("nd").alias("n_tok"),
                    (F.col("_num") / F.col("nd")
                     - F.log(F.col("nd"))).alias("kl")))
