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

from neo4j_document_pipeline_spark.functions.tokenizer import decode, encode


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
    chunks: list[str] = []
    buf: list[str] = []
    tcount = 0

    for p in paras:
        n = len(encode(p))
        if n > max_tokens:
            if buf:
                chunks.append("\n\n".join(buf))
                buf, tcount = [], 0
            chunks.extend(split_by_tokens(p, max_tokens, overlap_tokens))
            continue
        if tcount + n + 1 > max_tokens and buf:
            chunks.append("\n\n".join(buf))
            buf, tcount = [p], n
        else:
            buf.append(p)
            tcount += n + 1

    if buf:
        chunks.append("\n\n".join(buf))

    out: list[tuple[str, int]] = []
    for c in chunks:
        n = len(encode(c))
        if n <= max_tokens:
            out.append((c, n))
        else:
            out.extend(split_by_tokens_with_counts(c, max_tokens, overlap_tokens))
    return out
