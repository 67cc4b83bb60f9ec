"""Paragraph-packing token chunker.

Re-expresses the reference chunking semantics
(/root/reference/ingestMD.py:74-118) exactly:

- split the canonical text on blank lines into stripped, non-empty paragraphs;
- greedily pack paragraphs into a buffer while
  ``tokens_so_far + len(tokens(p)) + 1 <= max_tokens`` (the +1 models the
  paragraph separator);
- a single paragraph longer than ``max_tokens`` flushes the buffer and is
  token-sliced into windows of ``max_tokens`` with ``overlap`` token overlap;
- a final pass re-slices any packed chunk that still exceeds the budget.

Chunk ids are sha256 of the chunk text (ingestMD.py:745); duplicate chunks
across documents share ids, giving us the reference's extraction-cache
semantics (ingestMD.py:746-752) via ``dropDuplicates('chunk_id')`` before
extraction.
"""

from __future__ import annotations

from neo4j_document_pipeline_spark.functions.tokenizer import (
    TOKENIZER,
    count_tokens,
    decode,
    encode,
)

# With the regex fallback tokenizer, token counts are exactly additive over
# stripped paragraphs joined by "\n\n": no token class can span the
# boundary (paragraphs end/start on non-whitespace, so each separator is
# one whole \s+ token), hence tokens(join(buf)) == sum(tokens(p)) +
# (len(buf)-1). That makes the final re-encode of every packed chunk
# redundant. BPE merges (tiktoken) break additivity, so the exact path
# keeps the re-encode there.
_ADDITIVE_COUNTS = TOKENIZER == "regex_fallback"


def split_by_tokens(text: str, size: int, overlap: int) -> list[str]:
    """Slice text into token windows (ingestMD.py:74-81 semantics)."""
    return [c for c, _ in split_by_tokens_with_counts(text, size, overlap)]


def split_by_tokens_with_counts(text: str, size: int,
                                overlap: int) -> list[tuple[str, int]]:
    ids = encode(text)
    step = max(1, size - overlap)
    return [
        (decode(ids[start:start + size]), min(size, len(ids) - start))
        for start in range(0, len(ids), step)
    ]


def chunk_text(text: str, max_tokens: int = 2500, overlap_tokens: int = 0) -> list[str]:
    """Pack paragraphs into token-bounded chunks (ingestMD.py:83-118)."""
    return [c for c, _ in chunk_text_with_counts(text, max_tokens, overlap_tokens)]


def chunk_text_with_counts(text: str, max_tokens: int = 2500,
                           overlap_tokens: int = 0) -> list[tuple[str, int]]:
    """Same semantics as chunk_text, returning (chunk, n_tokens) with each
    chunk tokenized exactly once (the distributed chunker needs the count
    anyway — avoids a second full tokenization pass per chunk)."""
    paras = [p.strip() for p in text.split("\n\n") if p.strip()]
    # (chunk, derived_count); derived_count is exact under _ADDITIVE_COUNTS,
    # an upper-bound placeholder otherwise (recomputed in the final pass)
    pairs: list[tuple[str, int]] = []
    buf: list[str] = []
    ns: list[int] = []
    tcount = 0

    for p in paras:
        # only the COUNT is needed here (the token list is discarded in
        # the common fits-in-budget case) — count_tokens memoizes per
        # paragraph, so repeated boilerplate paragraphs across a corpus
        # tokenize once per executor instead of once per occurrence
        n = count_tokens(p)
        if n > max_tokens:
            if buf:
                pairs.append(("\n\n".join(buf), sum(ns) + len(ns) - 1))
                buf, ns, tcount = [], [], 0
            pairs.extend(split_by_tokens_with_counts(p, max_tokens, overlap_tokens))
            continue
        if tcount + n + 1 > max_tokens and buf:
            pairs.append(("\n\n".join(buf), sum(ns) + len(ns) - 1))
            buf, ns, tcount = [p], [n], n
        else:
            buf.append(p)
            ns.append(n)
            tcount += n + 1

    if buf:
        pairs.append(("\n\n".join(buf), sum(ns) + len(ns) - 1))

    out: list[tuple[str, int]] = []
    for c, n in pairs:
        if not _ADDITIVE_COUNTS:
            n = len(encode(c))
        if n <= max_tokens:
            out.append((c, n))
        else:
            out.extend(split_by_tokens_with_counts(c, max_tokens, overlap_tokens))
    return out
