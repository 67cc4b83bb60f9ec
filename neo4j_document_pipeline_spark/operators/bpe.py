"""Distributed BPE vocabulary learning — the tokenizer-training rung of
the training-data pipeline.

A webtext corpus engine that exports token-budget shards
(``operators/sampling.py::token_shards``) eventually needs the
tokenizer itself trained on the same corpus. Byte-pair encoding
(Sennrich et al. 2016, the construction behind GPT-2/cl100k vocabs:
count adjacent symbol pairs over the word vocabulary, merge the most
frequent pair everywhere, repeat) is usually presented as a
single-machine loop over a Counter; this module expresses each round as
two DataFrame operations — one pair-count aggregation and one
broadcast-fold string rewrite — so vocabulary learning runs where the
corpus lives.

Determinism (the property every oracle in this repo is built on):

- pair counts are exact integers (sum of word frequencies), so the
  argmax is partitioning-independent; ties break on (count DESC,
  left ASC, right ASC);
- the merge rewrite is a single literal ``replace()`` pass per round
  over a DOUBLE-SPACE-delimited symbol string. Searching
  ``' left  right '`` (single-space flanks) and writing ``' merged '``
  consumes only the inner halves of the flanking double spaces, so
  back-to-back occurrences ``a b a b`` both merge in one left-to-right
  pass while overlapping runs ``a a a`` merge greedily left-first —
  exactly canonical BPE's non-overlapping greedy semantics, with no
  fixpoint iteration and no regex lookarounds (RE2-safe: the oracle
  replays the identical literal replace in DuckDB);
- the scalar best-pair fold rides the plan as a broadcast one-row
  cross join (the k-means centroid-fold pattern, clustering.py) — zero
  driver actions per round.

Scale: the state is the WORD VOCABULARY (word, freq, symbol string),
not the corpus — one explode+agg builds it, after which every round
costs one pair aggregation over vocab rows and one narrow rewrite.
Vocab rows are bounded by distinct-token count (≪ corpus rows at any
scale); lineage is truncated per round with a lazy localCheckpoint so
the unrolled plan stays linear in ``rounds``.

Reference anchor: the reference pipeline tokenizes with a fixed
pretrained vocab (ingestMD.py:32); learning the vocab from the corpus
is the beyond-reference counterpart a from-scratch 100 TB pipeline
needs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from neo4j_document_pipeline_spark.functions.textstats import col_tokens

WORD_END = "</w>"


def word_vocab(df: DataFrame, text_col: str) -> DataFrame:
    """(word, freq) over the engine's canonical tokenization —
    the only corpus-sized pass BPE learning makes."""
    return (df.select(F.explode(col_tokens(F.col(text_col))).alias("word"))
              .groupBy("word").agg(F.count(F.lit(1)).alias("freq")))


def _initial_state(vocab: DataFrame, marker: str) -> DataFrame:
    # '  l  o  w  </w>  ': every symbol flanked by double spaces,
    # double spaces at both ends (the rewrite invariant each round's
    # replace() preserves)
    s0 = F.concat(F.lit("  "),
                  F.regexp_replace(F.col("word"), r"(.)", "$1  "),
                  F.lit(marker + "  "))
    return vocab.select("word", "freq", s0.alias("s"))


def _pair_counts(state: DataFrame) -> DataFrame:
    syms = F.split(F.trim(F.col("s")), "  ")
    n = F.size(syms)
    pairs = F.arrays_zip(F.slice(syms, F.lit(1), n - 1).alias("l"),
                         F.slice(syms, F.lit(2), n - 1).alias("r"))
    return (state
            .select("freq", F.explode(pairs).alias("p"))
            .groupBy(F.col("p.l").alias("left"), F.col("p.r").alias("right"))
            .agg(F.sum("freq").alias("pair_count")))


def _best_pair(counts: DataFrame) -> DataFrame:
    # exact-integer argmax, deterministic ties -> TakeOrderedAndProject
    return counts.orderBy(F.col("pair_count").desc(), "left", "right") \
                 .limit(1)


def bpe_learn(df: DataFrame, text_col: str, rounds: int = 3, *,
              marker: str = WORD_END) -> tuple[DataFrame, DataFrame]:
    """Learn ``rounds`` BPE merges over ``df[text_col]``.

    Returns ``(merges, vocab)``:

    - ``merges``: one row per round — (round, left, right, merged,
      pair_count), the merge table a tokenizer ships;
    - ``vocab``: (word, segmented, freq) — every word's symbol
      sequence after all merges, single-space joined.

    The whole computation is one lazy plan; nothing executes until the
    caller acts on a result.
    """
    if rounds < 1:
        raise ValueError(f"rounds must be >= 1, got {rounds}")
    if not marker or " " in marker:
        raise ValueError(f"marker must be non-empty and space-free: "
                         f"{marker!r}")
    state = _initial_state(word_vocab(df, text_col), marker)
    merge_frames = []
    for r in range(1, rounds + 1):
        # vocab state feeds BOTH the pair count and the rewrite below:
        # truncate lineage so the unrolled plan grows linearly
        state = state.localCheckpoint(eager=False)
        best = _best_pair(_pair_counts(state)).select(
            F.lit(r).alias("round"), "left", "right",
            F.concat("left", "right").alias("merged"), "pair_count")
        merge_frames.append(best)
        search = F.concat(F.lit(" "), F.col("left"), F.lit("  "),
                          F.col("right"), F.lit(" "))
        repl = F.concat(F.lit(" "), F.col("merged"), F.lit(" "))
        state = (state.crossJoin(F.broadcast(best))
                 .select("word", "freq",
                         F.replace(F.col("s"), search, repl).alias("s")))
    merges = merge_frames[0]
    for f in merge_frames[1:]:
        merges = merges.unionByName(f)
    vocab = state.select(
        "word",
        F.replace(F.trim(F.col("s")), F.lit("  "), F.lit(" "))
        .alias("segmented"),
        "freq")
    return merges, vocab


def bpe_segment(df: DataFrame, text_col: str, merges: list[tuple[str, str]],
                *, marker: str = WORD_END,
                out_col: str = "bpe_tokens") -> DataFrame:
    """Apply a learned merge table to new text: per word, the same
    delimiter-rewrite chain in merge order, then split — the inference
    half of :func:`bpe_learn` (training/serving use one construction,
    so segmentation of the training corpus equals the learned vocab's
    ``segmented`` by construction). Adds ``out_col`` as an
    array<array<string>> — one symbol sequence per word."""
    if not marker or " " in marker:
        raise ValueError(f"marker must be non-empty and space-free: "
                         f"{marker!r}")
    def seg(w):
        s = F.concat(F.lit("  "), F.regexp_replace(w, r"(.)", "$1  "),
                     F.lit(marker + "  "))
        for left, right in merges:
            s = F.replace(s, F.lit(f" {left}  {right} "),
                          F.lit(f" {left}{right} "))
        return F.split(F.trim(s), "  ")

    toks = col_tokens(F.col(text_col))
    return df.withColumn(out_col, F.transform(toks, seg))
