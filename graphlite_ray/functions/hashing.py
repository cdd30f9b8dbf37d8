"""Stable 64-bit string hashing for url -> vertex-id assignment and dedup.

The reference assumes pre-assigned dense int64 vertex ids
(`engine/Worker.cc:30-31`); our engine removes that assumption (SURVEY.md
§7.1 step 3): ids are 63-bit hashes of the url, partition = id % P, and
per-shard sorted-vid lookup arrays replace the reference's `vid / W` dense
slot arithmetic (`engine/Worker.cc:303-311`).

The hash is a SELF-CONTAINED vectorized FNV-1a-64 over the UTF-8 bytes
(seed mixed in as an 8-byte prefix). It depends on nothing but numpy +
pyarrow buffer layout, so persisted CSR shards, urlmaps and checkpoints
keep matching resumed runs across library upgrades — a library-provided
hash (polars/pandas) is NOT versioned and silently breaks resume.

Vectorization: strings are hashed byte-position-by-byte-position over a
shrinking index set (total work O(total_bytes), ~tens of numpy gathers for
url-length strings — no Python loop over rows).

At 10^12 urls a 63-bit space yields ~5e4 expected birthday collisions:
`stages/extract.py::id_collision_check` detects them (groupby id ->
n_distinct url) and callers remediate by salting the colliding urls
(documented scale path; zero collisions at test scale, asserted in
tests).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

_HASH_SEED = 42
_FNV_OFFSET = np.uint64(14695981039346656037)
_FNV_PRIME = np.uint64(1099511628211)

HASH_VERSION = 2  # bumped when the hash function changes (invalidates state)


def _as_large_utf8(values) -> pa.Array:
    if isinstance(values, pa.ChunkedArray):
        values = values.combine_chunks()
    if isinstance(values, pa.Array):
        return values.cast(pa.large_utf8())
    if isinstance(values, np.ndarray) and values.dtype.kind in ("U", "O"):
        return pa.array(values.tolist(), type=pa.large_utf8())
    return pa.array(list(values), type=pa.large_utf8())


def hash_strings(values, salt: int = 0) -> np.ndarray:
    """Vectorized stable hash: sequence[str] -> np.uint64 array (FNV-1a-64
    with the seed+salt mixed in as an 8-byte prefix)."""
    arr = _as_large_utf8(values)
    n = len(arr)
    if n == 0:
        return np.empty(0, np.uint64)
    bufs = arr.buffers()
    offsets = np.frombuffer(bufs[1], dtype=np.int64)[arr.offset : arr.offset + n + 1]
    data = (
        np.frombuffer(bufs[2], dtype=np.uint8)
        if bufs[2] is not None
        else np.empty(0, np.uint8)
    )
    starts = offsets[:-1]
    lengths = offsets[1:] - starts

    with np.errstate(over="ignore"):
        h = np.full(n, _FNV_OFFSET, np.uint64)
        seed = np.uint64((_HASH_SEED + salt) & 0xFFFFFFFFFFFFFFFF)
        for shift in range(0, 64, 8):
            h = (h ^ ((seed >> np.uint64(shift)) & np.uint64(0xFF))) * _FNV_PRIME
        idx = np.flatnonzero(lengths > 0)
        pos = 0
        while len(idx):
            b = data[starts[idx] + pos].astype(np.uint64)
            h[idx] = (h[idx] ^ b) * _FNV_PRIME
            pos += 1
            idx = idx[lengths[idx] > pos]
    return h


def ids_from_urls(urls, salt: int = 0) -> np.ndarray:
    """urls -> non-negative int64 vertex ids (63-bit)."""
    return (hash_strings(urls, salt) >> np.uint64(1)).astype(np.int64)


def hash_tokens_u64(tokens: np.ndarray) -> np.ndarray:
    """Vectorized hash of an array of token/shingle strings -> uint64."""
    return hash_strings(tokens)
