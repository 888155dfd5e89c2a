"""Deterministic text embeddings for the ER embedding-confirmation band.

The reference embeds ``f"{name} {type}"`` with Gemini text-embedding-004
(768-d) and uses cosine similarity for (a) confirming 0.8-0.9 name matches
and (b) a kNN fallback candidate source (extraction_pipeline.py:661-727,
config.py:68).  A network embedder is out of scope here, so the pluggable
default is a **character-trigram feature-hashing embedding**: L2-normalized
bag of char 3-grams hashed into ``dim`` buckets (signed hashing trick).
Similar surface forms share trigrams → high cosine; unrelated strings are
near-orthogonal.  Deterministic, dependency-free, identical on every
executor, and swappable for a real model UDF without touching the ER stage.

Pure-Python kernels live here (importable by tests without Spark); the
pandas UDF wrappers are vectorized over Arrow batches (no per-row Python in
the Spark plan beyond the batched kernel itself).
"""
from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd

DIM = 64


def _trigrams(text: str) -> list[str]:
    t = " " + (text or "").lower().strip() + " "
    if len(t) < 3:
        return [t]
    return [t[i:i + 3] for i in range(len(t) - 2)]


# md5-per-trigram dominates the kernel (~1 µs/gram vs ~50 ns for a dict
# hit), and the distinct-trigram vocabulary of any real corpus is tiny
# relative to the gram stream — memoize the 64-bit digest per gram.  Votes
# are ±1.0 (exact in float64, sums exact integers), so accumulation order
# is irrelevant and the memoized path is bit-identical to the direct one.
_GRAM_HASH: dict = {}
_GRAM_HASH_MAX = 4_000_000  # ~0.3 GB worst case; stop inserting past this


def _gram_hash(g: str) -> int:
    h = _GRAM_HASH.get(g)
    if h is None:
        h = int.from_bytes(hashlib.md5(g.encode()).digest()[:8], "little")
        if len(_GRAM_HASH) < _GRAM_HASH_MAX:
            _GRAM_HASH[g] = h
    return h


def hash_embedding(text: str, dim: int = DIM) -> np.ndarray:
    """L2-normalized signed feature-hashing embedding of char trigrams."""
    v = np.zeros(dim, dtype=np.float64)
    for g in _trigrams(text):
        h = _gram_hash(g)
        v[h % dim] += 1.0 if (h >> 62) & 1 else -1.0
    n = np.linalg.norm(v)
    return v / n if n > 0 else v


def cosine(a: np.ndarray, b: np.ndarray) -> float:
    na, nb = np.linalg.norm(a), np.linalg.norm(b)
    if na == 0 or nb == 0:
        return 0.0
    return float(np.dot(a, b) / (na * nb))


def batch_embed(texts: pd.Series, dim: int = DIM) -> pd.Series:
    return pd.Series([hash_embedding(t, dim).tolist() for t in texts])


def batch_pair_cosine(a: pd.Series, b: pd.Series, dim: int = DIM) -> pd.Series:
    return pd.Series(
        [cosine(hash_embedding(x, dim), hash_embedding(y, dim))
         for x, y in zip(a, b)], dtype="float64")
