"""Benchmark decontamination: flag training documents that overlap an
evaluation/benchmark set by shared word n-grams — the standard hygiene
step before LLM training (no reference analog; SURVEY.md north-rule
training-data family).

Shape: the benchmark corpus is SMALL by nature (eval sets), so its
distinct shingle hashes are collected once and broadcast via `ray.put`;
every training batch then computes its per-document overlap with one
vectorized `np.isin` against the sorted hash array. One pass over the
training corpus, no shuffle.

The operator works on 64-bit shingle hashes (`hash_strings`), the scale
path; the DuckDB oracle intersects the shingle STRINGS exactly. A hash
collision could diverge the two — probability ~n_shingles^2 / 2^65
(~1e-10 at millions of shingles), accepted and documented.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

import ray
import ray.data

from graphlite_ray.stages.dedup import _batch_shingle_hashes


def benchmark_shingle_hashes(
    bench_docs: "ray.data.Dataset", k: int = 5, text_col: str = "text"
) -> np.ndarray:
    """Distinct k-gram shingle hashes of the benchmark corpus (sorted
    uint64, ready for searchsorted/isin)."""

    def _hashes(batch: pd.DataFrame) -> pd.DataFrame:
        h, _, _ = _batch_shingle_hashes(batch[text_col].tolist(), k)
        return pd.DataFrame({"h": np.unique(h)})

    parts = bench_docs.map_batches(_hashes, batch_format="pandas").to_pandas()
    if not len(parts):
        return np.empty(0, np.uint64)
    return np.unique(parts["h"].to_numpy().astype(np.uint64))


def contamination_scores(
    docs: "ray.data.Dataset",
    bench_hashes: np.ndarray,
    k: int = 5,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> "ray.data.Dataset":
    """(doc_id, contaminated_frac): per document, the fraction of its
    DISTINCT k-gram shingles that appear in the benchmark set. A single
    ratio of integer counts — bit-exact vs the string-intersection SQL
    oracle (modulo the documented hash-collision bound). Documents with
    no shingles score 0.0."""
    ref = ray.put(np.sort(bench_hashes.astype(np.uint64)))

    class _Score:
        def __init__(self):
            self.bench = ray.get(ref)  # zero-copy plasma view

        def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
            texts = batch[text_col].tolist()
            h, starts, counts = _batch_shingle_hashes(texts, k)
            fracs = np.zeros(len(texts), np.float64)
            for i in range(len(texts)):
                if not counts[i]:
                    continue
                d = np.unique(h[starts[i] : starts[i] + counts[i]])
                if self.bench.size:
                    pos = np.searchsorted(self.bench, d)
                    pos_c = np.minimum(pos, len(self.bench) - 1)
                    hits = int(((pos < len(self.bench)) & (self.bench[pos_c] == d)).sum())
                else:
                    hits = 0
                fracs[i] = hits / len(d)
            return pd.DataFrame({id_col: batch[id_col], "contaminated_frac": fracs})

    return docs.map_batches(
        _Score, batch_format="pandas", batch_size=1024, concurrency=(1, 8)
    )


def _bloom_positions(h: np.ndarray, m_bits: int, n_hashes: int) -> np.ndarray:
    """(n_hashes, n) int64 bit positions via Kirsch-Mitzenmacher double
    hashing: pos_j = (h1 + j*h2) mod m with h1 = top 32 bits of the shingle
    hash, h2 = low 32 bits forced odd. With `m_bits` a power of two and h2
    odd, h2 is invertible mod m, so one key's n_hashes positions are
    PAIRWISE DISTINCT — the SQL oracle's count-based membership
    (hits == n_hashes) relies on this."""
    h1 = (h >> np.uint64(32)).astype(np.int64)
    h2 = ((h & np.uint64(0xFFFFFFFF)) | np.uint64(1)).astype(np.int64)
    j = np.arange(n_hashes, dtype=np.int64)[:, None]
    return (h1[None, :] + j * h2[None, :]) % np.int64(m_bits)


def bloom_build(
    bench_docs: "ray.data.Dataset",
    m_bits: int = 1 << 20,
    n_hashes: int = 4,
    k: int = 5,
    text_col: str = "text",
) -> np.ndarray:
    """Packed Bloom bitmap (uint8, m_bits/8 bytes) of the benchmark
    corpus's k-gram shingle hashes.

    Scale shape: `benchmark_shingle_hashes` broadcasts the FULL distinct
    hash set (8 bytes/shingle — fine for eval sets, GBs for a
    hundreds-of-millions-shingle blocklist); the Bloom variant caps the
    broadcast at m_bits/8 bytes REGARDLESS of set size, trading a
    deterministic, oracle-replayable false-positive rate (conservative:
    FPs only ever DROP extra training docs). Per-block partial bitmaps are
    OR-merged on the driver — n_blocks × m_bits/8 bytes of driver traffic,
    not the shingle set."""
    if m_bits % 8:
        raise ValueError("m_bits must be a multiple of 8")

    def _partial(batch: pd.DataFrame) -> pd.DataFrame:
        h, _, _ = _batch_shingle_hashes(batch[text_col].tolist(), k)
        bm = np.zeros(m_bits // 8, np.uint8)
        if h.size:
            pos = _bloom_positions(np.unique(h), m_bits, n_hashes).ravel()
            np.bitwise_or.at(bm, pos >> 3, np.uint8(1) << (pos & 7).astype(np.uint8))
        return pd.DataFrame({"bm": [bm.tobytes()]})

    out = np.zeros(m_bits // 8, np.uint8)
    for row in bench_docs.map_batches(_partial, batch_format="pandas").take_all():
        out |= np.frombuffer(row["bm"], np.uint8)
    return out


def bloom_contamination_scores(
    docs: "ray.data.Dataset",
    bitmap: np.ndarray,
    m_bits: int,
    n_hashes: int = 4,
    k: int = 5,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> "ray.data.Dataset":
    """(doc_id, bloom_frac): per document, the fraction of its DISTINCT
    k-gram shingles whose n_hashes Bloom bits are ALL set in `bitmap` —
    the fixed-memory analog of `contamination_scores` (bloom_frac >=
    contaminated_frac always; the gap is the false-positive mass, which
    the DuckDB oracle replays bit-for-bit since the positions are pure
    integer arithmetic on the shingle hash)."""
    ref = ray.put(np.ascontiguousarray(bitmap, np.uint8))

    class _Score:
        def __init__(self):
            self.bm = ray.get(ref)  # zero-copy plasma view

        def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
            texts = batch[text_col].tolist()
            h, starts, counts = _batch_shingle_hashes(texts, k)
            fracs = np.zeros(len(texts), np.float64)
            for i in range(len(texts)):
                if not counts[i]:
                    continue
                d = np.unique(h[starts[i] : starts[i] + counts[i]])
                pos = _bloom_positions(d, m_bits, n_hashes)
                bits = (self.bm[pos >> 3] >> (pos & 7).astype(np.uint8)) & 1
                fracs[i] = bits.all(axis=0).sum() / len(d)
            return pd.DataFrame({id_col: batch[id_col], "bloom_frac": fracs})

    return docs.map_batches(
        _Score, batch_format="pandas", batch_size=1024, concurrency=(1, 8)
    )


def decontaminate(
    docs: "ray.data.Dataset",
    bench_docs: "ray.data.Dataset",
    threshold: float = 0.1,
    k: int = 5,
    id_col: str = "doc_id",
    text_col: str = "text",
    broadcast_drop_max: int = 1_000_000,
    work_dir: str | None = None,
) -> "ray.data.Dataset":
    """Drop training docs whose benchmark-shingle overlap >= threshold
    (streaming filter; the kept corpus is the output).

    Scale shape (r5 — replaces the per-row `filter(lambda)` + unguarded
    `take_all` of the drop set): the threshold filter is a vectorized
    `map_batches` over the score stream; the drop-id set is size-gated
    like `q_customers_without_orders` — a `limit(max+1)` probe decides
    between broadcasting the ids (`ray.put`, one corpus pass, no shuffle)
    and the bucketed streaming anti-join (`anti_join_bucketed`: one
    shuffle each side, no driver-side id set) when a dirty corpus drops
    more than `broadcast_drop_max` documents."""
    import pyarrow as pa

    bench = benchmark_shingle_hashes(bench_docs, k=k, text_col=text_col)
    scored = contamination_scores(docs, bench, k=k, id_col=id_col, text_col=text_col)

    def _over(t: "pa.Table") -> "pa.Table":
        keep = np.asarray(t["contaminated_frac"].to_numpy()) >= threshold
        return pa.table({id_col: t[id_col].to_numpy(zero_copy_only=False)[keep]})

    drop_ds = scored.map_batches(_over, batch_format="pyarrow")
    # fused guard probe: one limited take both collects the broadcast set
    # and proves it fits (a max+1-th row switches strategies)
    head = drop_ds.limit(broadcast_drop_max + 1).take_all()
    if len(head) <= broadcast_drop_max:
        drop = {r[id_col] for r in head}
        ref = ray.put(drop)

        class _Keep:
            def __init__(self):
                self.drop = ray.get(ref)

            def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
                return batch[~batch[id_col].isin(self.drop)]

        return docs.map_batches(_Keep, batch_format="pandas", concurrency=(1, 8))

    import tempfile

    from graphlite_ray.pipelines.joins import anti_join_bucketed

    work = work_dir or tempfile.mkdtemp(prefix="glr_decontam_", dir="/tmp")
    return anti_join_bucketed(docs, id_col, drop_ds, id_col, work)
