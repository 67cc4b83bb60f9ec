"""Distributed BPE learning — brute parity, canonical semantics,
segment/vocab consistency, validation."""

import re
from collections import Counter

import pytest


def _tokens(text):
    return [t for t in re.sub(r"[^A-Za-z0-9']+", " ", text).lower()
            .split(" ") if t]


def _brute_bpe(texts, rounds, marker="</w>"):
    """Canonical BPE: count every adjacent symbol position weighted by
    word freq; argmax (count DESC, left, right); merge left-to-right
    non-overlapping greedily."""
    freq = Counter(t for x in texts for t in _tokens(x))
    vocab = {w: list(w) + [marker] for w in freq}
    merges = []
    for _ in range(rounds):
        pc = Counter()
        for w, syms in vocab.items():
            for i in range(len(syms) - 1):
                pc[(syms[i], syms[i + 1])] += freq[w]
        best = min(pc.items(), key=lambda kv: (-kv[1], kv[0]))
        (a, b), cnt = best
        merges.append((a, b, a + b, cnt))
        for w, syms in vocab.items():
            out, i = [], 0
            while i < len(syms):
                if (i < len(syms) - 1 and syms[i] == a
                        and syms[i + 1] == b):
                    out.append(a + b)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            vocab[w] = out
    return merges, {w: " ".join(s) for w, s in vocab.items()}, freq


class TestBpeLearn:
    def test_textbook_known_values(self, spark):
        """The Sennrich low/lower/newest corpus: merge table and final
        segmentation are hand-checkable."""
        from neo4j_document_pipeline_spark.operators.bpe import bpe_learn
        df = spark.createDataFrame(
            [("low lower lowest low low newer newest new",),
             ("wider wide widest low lower newer newer",)], ["text"])
        merges, vocab = bpe_learn(df, "text", rounds=2)
        got = [(r["round"], r["left"], r["right"], r["merged"],
                r["pair_count"]) for r in merges.orderBy("round").collect()]
        # 'l o' appears in low/lower/lowest occurrences: 4+2+1 = 7
        assert got == [(1, "l", "o", "lo", 7), (2, "lo", "w", "low", 7)]
        seg = {r["word"]: r["segmented"] for r in vocab.collect()}
        assert seg["low"] == "low </w>"
        assert seg["lowest"] == "low e s t </w>"
        assert seg["wide"] == "w i d e </w>"

    def test_brute_parity_random_corpus(self, spark):
        """5 rounds on a corpus with repeats, runs ('aaaa'), and
        shared prefixes must match the canonical python loop exactly —
        merge table AND every word's final segmentation."""
        from neo4j_document_pipeline_spark.operators.bpe import bpe_learn
        texts = [
            "aaaa aaa aa aaaa banana bandana ana anna",
            "the cat sat on the mat the cat ran",
            "running runner ran runs running running",
            "aaaa banana the the the sat mat ana",
        ]
        bm, bv, _ = _brute_bpe(texts, rounds=5)
        df = spark.createDataFrame([(t,) for t in texts], ["text"])
        merges, vocab = bpe_learn(df, "text", rounds=5)
        got = [(r["left"], r["right"], r["merged"], r["pair_count"])
               for r in merges.orderBy("round").collect()]
        assert got == bm
        seg = {r["word"]: r["segmented"] for r in vocab.collect()}
        assert seg == bv

    def test_overlapping_run_is_greedy_left_first(self, spark):
        """'aaaaa' with pair (a,a): canonical greedy gives
        aa aa a </w> — the delimiter rewrite must not double-merge or
        skip the back-to-back second occurrence."""
        from neo4j_document_pipeline_spark.operators.bpe import bpe_learn
        df = spark.createDataFrame([("aaaaa aaaaa aaaaa",)], ["text"])
        merges, vocab = bpe_learn(df, "text", rounds=1)
        m = merges.collect()[0]
        assert (m["left"], m["right"], m["pair_count"]) == ("a", "a", 12)
        assert vocab.collect()[0]["segmented"] == "aa aa a </w>"

    def test_segment_matches_learned_vocab(self, spark):
        """bpe_segment with the learned merge list reproduces the
        training vocab's segmentation (one construction, two halves)."""
        from neo4j_document_pipeline_spark.operators.bpe import (
            bpe_learn, bpe_segment)
        texts = ["low lower lowest newer newest wide wider",
                 "low low newer the the cat cat cat"]
        df = spark.createDataFrame([(t,) for t in texts], ["text"])
        merges, vocab = bpe_learn(df, "text", rounds=4)
        mlist = [(r["left"], r["right"])
                 for r in merges.orderBy("round").collect()]
        seg = {r["word"]: r["segmented"].split(" ")
               for r in vocab.collect()}
        out = bpe_segment(df, "text", mlist).collect()
        for row in out:
            for word, syms in zip(_tokens(row["text"]),
                                  row["bpe_tokens"]):
                assert list(syms) == seg[word], word

    def test_validation(self, spark):
        from neo4j_document_pipeline_spark.operators.bpe import (
            bpe_learn, bpe_segment)
        df = spark.createDataFrame([("x",)], ["text"])
        with pytest.raises(ValueError):
            bpe_learn(df, "text", rounds=0)
        with pytest.raises(ValueError):
            bpe_learn(df, "text", marker="bad marker")
        with pytest.raises(ValueError):
            bpe_segment(df, "text", [], marker=" ")
