"""Deterministic text featurizer — stand-in for the remote embedding model.

The reference embeds node/edge texts via a vLLM/Qwen server
(/root/reference/ingestMD.py:237-250, dim 3072). We replace it with a
seeded hashed-TF feature map + signed hashing (a.k.a. the hashing trick),
l2-normalized — a pure function of (text, dim, seed) that preserves every
downstream algorithm (cosine, MMR, hybrid blend) exactly.

Embedding-text keys match the reference (ingestMD.py:252-265):
``"{Type}:{name}"`` for nodes, ``"{s} {p} {o}"`` for relations.

Vectorized numpy implementation; called from mapInPandas over Arrow
batches — no per-row Python in the Spark hot path beyond the batched
string hashing itself.
"""

from __future__ import annotations

import re
import zlib

import numpy as np

_TOKEN_RE = re.compile(r"[a-z0-9]+")


def _tokens(text: str) -> list[str]:
    toks = _TOKEN_RE.findall((text or "").lower())
    # word unigrams + character trigrams of the joined text for robustness
    joined = " ".join(toks)
    tris = [joined[i:i + 3] for i in range(0, max(0, len(joined) - 2), 1)]
    return toks + tris


def embed_text(text: str, dim: int = 64, seed: int = 42) -> np.ndarray:
    """Signed hashed term-frequency vector, l2-normalized. Deterministic
    across processes (crc32-based hashing; no PYTHONHASHSEED dependence)."""
    v = np.zeros(dim, dtype=np.float64)
    for tok in _tokens(text):
        h = zlib.crc32(f"{seed}:{tok}".encode("utf-8"))
        idx = h % dim
        sign = 1.0 if (h >> 16) & 1 else -1.0
        v[idx] += sign
    n = np.linalg.norm(v)
    if n > 0:
        v /= n
    return v


def embed_texts(texts, dim: int = 64, seed: int = 42) -> np.ndarray:
    """Batch variant: (n, dim) float64 matrix."""
    out = np.zeros((len(texts), dim), dtype=np.float64)
    for i, t in enumerate(texts):
        out[i] = embed_text(t, dim, seed)
    return out


def cosine(a, b) -> float:
    """Reference cosine semantics: 0.0 on zero norm
    (/root/reference/graphutil.py:173-183)."""
    a = np.asarray(a, dtype=np.float64)
    b = np.asarray(b, dtype=np.float64)
    da = float(a @ a)
    db = float(b @ b)
    if da == 0.0 or db == 0.0:
        return 0.0
    return float(a @ b) / (np.sqrt(da) * np.sqrt(db))
