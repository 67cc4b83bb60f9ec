"""Deterministic tokenizer — stand-in for tiktoken cl100k_base.

The reference chunks by cl100k_base token count
(/root/reference/ingestMD.py:32,74-118). tiktoken is not available in this
environment, so we substitute a deterministic regex tokenizer with the two
properties the chunker actually relies on:

1. encode() -> list of tokens whose concatenation round-trips the input
   exactly (lossless), so decode(encode(t)[a:b]) is a well-defined slice of
   the original text;
2. token counts are BPE-ish (words ~1 token, long numbers split, punctuation
   runs separate, whitespace runs separate).

If tiktoken IS importable, we use it (gated import) — the public API is
identical either way. Golden fixtures are frozen with whichever tokenizer is
active, so internal parity always holds.
"""

from __future__ import annotations

import re
from functools import lru_cache

try:  # pragma: no cover - tiktoken absent in this environment
    import tiktoken

    _ENC = tiktoken.get_encoding("cl100k_base")

    def encode(text: str) -> list:
        return _ENC.encode(text)

    def decode(ids: list) -> str:
        return _ENC.decode(ids)

    TOKENIZER = "cl100k_base"
except Exception:  # fall back to the deterministic regex tokenizer
    # Order matters: contraction-aware words, 1-3 digit groups (BPE-ish
    # number splitting), punctuation runs, whitespace runs. The alternation
    # covers every character class, so ''.join(findall(t)) == t.
    _TOKEN_RE = re.compile(
        r"[A-Za-z]+(?:'[a-z]+)?|[0-9]{1,3}|[^\sA-Za-z0-9]|\s+"
    )

    def encode(text: str) -> list:
        return _TOKEN_RE.findall(text)

    def decode(ids: list) -> str:
        return "".join(ids)

    TOKENIZER = "regex_fallback"


@lru_cache(maxsize=4096)
def _count_cached(text: str) -> int:
    return len(encode(text))


def count_tokens(text: str) -> int:
    if len(text) < 10_000:
        return _count_cached(text)
    return len(encode(text))
