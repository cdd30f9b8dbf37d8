"""Stable 64-bit string hashing for url -> vertex-id assignment and dedup.

The reference assumes pre-assigned dense int64 vertex ids
(`engine/Worker.cc:30-31`); our engine removes that assumption (SURVEY.md
§7.1 step 3): ids are 63-bit hashes of the url, partition = id % P, and
per-shard sorted-vid lookup arrays replace the reference's `vid / W` dense
slot arithmetic (`engine/Worker.cc:303-311`).

Primary path is polars' vectorized hash (scale path — no Python loop);
fallback is blake2b per string. Both are deterministic in-process and
across processes for a fixed library install; ids are persisted with CSR
shards and checkpoints, so resume never recomputes them.

At 10^12 urls a 63-bit space yields ~5e4 expected birthday collisions:
`collision_check` detects them (groupby id -> n_distinct url) and callers
remediate by salting the colliding urls (documented scale path; zero
collisions at test scale, asserted in tests).
"""

from __future__ import annotations

import hashlib

import numpy as np

try:
    import polars as pl

    _HAVE_POLARS = True
except Exception:  # pragma: no cover
    _HAVE_POLARS = False

_HASH_SEED = 42


def hash_strings(values, salt: int = 0) -> np.ndarray:
    """Vectorized stable hash: sequence[str] -> np.uint64 array."""
    if _HAVE_POLARS:
        s = pl.Series(values=list(values), dtype=pl.Utf8)
        return s.hash(seed=_HASH_SEED + salt).to_numpy().astype(np.uint64)
    return np.array(
        [_blake64(v, salt) for v in values], dtype=np.uint64
    )  # pragma: no cover


def _blake64(s: str, salt: int) -> int:  # pragma: no cover
    h = hashlib.blake2b(
        s.encode("utf-8"), digest_size=8, key=str(_HASH_SEED + salt).encode()
    )
    return int.from_bytes(h.digest(), "little")


def ids_from_urls(urls, salt: int = 0) -> np.ndarray:
    """urls -> non-negative int64 vertex ids (63-bit)."""
    return (hash_strings(urls, salt) >> np.uint64(1)).astype(np.int64)


def hash_tokens_u64(tokens: np.ndarray) -> np.ndarray:
    """Vectorized hash of an array of token/shingle strings -> uint64."""
    return hash_strings(tokens)
