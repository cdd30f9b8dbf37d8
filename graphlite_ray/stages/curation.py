"""Training-data curation operators: sequence packing and stratified
sampling — the selection/layout steps that run between corpus cleanup and
tokenized shard writing in an LLM data pipeline. No reference analog
(GraphLite has no text surface at all); both are north-rule training-data
operators with exact SQL oracles.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray.data

from graphlite_ray.functions.scan import exclusive_prefix_sum
from graphlite_ray.stages.textstats import TokenCounter

# doc_sample's Knuth multiplicative hash (stages/textstats.py HashSampler):
# one sampling-hash definition shared by every curation operator
KNUTH = 2654435761
KNUTH_MOD = 1 << 32


def sequence_pack(
    docs: "ray.data.Dataset", capacity: int = 2048
) -> "ray.data.Dataset":
    """GPT-style streaming sequence packing: documents are concatenated in
    doc_id order into fixed `capacity`-token windows; each doc is assigned
    the window its FIRST token lands in (docs may straddle a boundary).

      (doc_id, text) -> (doc_id, n_tokens, bin_id, bin_offset)

    bin_id = floor(prefix / capacity), bin_offset = prefix % capacity,
    where prefix = exclusive running token sum in doc_id order — computed
    with the two-pass distributed scan (`functions.scan`): per-block
    totals -> driver exclusive-prefix over block metadata -> per-block
    rescan. The global sort is the only wide step; everything else
    streams."""
    counted = docs.map_batches(TokenCounter, batch_format="pandas", concurrency=(1, 4))
    ordered = counted.sort("doc_id").materialize()  # scan contract: sorted + stable blocks
    scanned = exclusive_prefix_sum(ordered, "doc_id", "n_tokens", out_col="prefix")

    def _bins(t: pa.Table) -> pa.Table:
        p = t["prefix"].to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "doc_id": t["doc_id"],
                "n_tokens": t["n_tokens"],
                "bin_id": p // capacity,
                "bin_offset": p % capacity,
            }
        )

    return scanned.map_batches(_bins, batch_format="pyarrow")


def chunk_documents(
    docs: "ray.data.Dataset", window: int = 128, stride: int = 64
) -> "ray.data.Dataset":
    """Fixed-token document chunking with overlap (the RAG / long-context
    pretraining chunker): each document's token list (the ONE tokenization
    contract, `functions/tokenize.py` — case preserved) is cut into
    windows of `window` tokens starting every `stride` tokens; the last
    window(s) are the short tails, so every token lands in >= 1 chunk.

      (doc_id, text) -> (doc_id, chunk_id, start_tok, n_tokens, chunk_text)

    Starts are 0, stride, 2*stride, ... < n_tokens; chunk_id = start /
    stride. chunk_text re-joins tokens with single spaces (whitespace-
    normalizing — deliberate: the chunker feeds tokenizers/embedders, not
    byte-exact reconstructors). Token-less docs emit no chunks. Documents
    chunk independently — map-only, NO shuffle, embarrassingly parallel
    at 100 TB; output order inside a batch is (doc, start) so the
    partitioned-parquet sink keeps chunks of a doc adjacent."""
    import pyarrow as pa

    from graphlite_ray.functions.tokenize import tokens

    if window < 1 or stride < 1:
        raise ValueError("chunk_documents needs window >= 1 and stride >= 1")

    def _chunks(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_numpy(zero_copy_only=False)
        out_id: list[int] = []
        out_chunk: list[int] = []
        out_start: list[int] = []
        out_n: list[int] = []
        out_text: list[str] = []
        for i, text in enumerate(t["text"].to_pylist()):
            tl = tokens(text)
            n = len(tl)
            for start in range(0, n, stride):
                piece = tl[start : start + window]
                out_id.append(int(ids[i]))
                out_chunk.append(start // stride)
                out_start.append(start)
                out_n.append(len(piece))
                out_text.append(" ".join(piece))
        return pa.table(
            {
                "doc_id": pa.array(out_id, pa.int64()),
                "chunk_id": pa.array(out_chunk, pa.int64()),
                "start_tok": pa.array(out_start, pa.int64()),
                "n_tokens": pa.array(out_n, pa.int64()),
                "chunk_text": pa.array(out_text, pa.string()),
            }
        )

    return docs.map_batches(_chunks, batch_format="pyarrow")


def stratified_sample(
    docs: "ray.data.Dataset",
    strata_col: str,
    k: int,
    id_col: str = "doc_id",
) -> "ray.data.Dataset":
    """Deterministic k-per-stratum sample: within each stratum keep the k
    rows with the smallest Knuth hash of the id (ties -> smaller id).
    Skew-safe at scale: each batch pre-prunes to its local top-k per
    stratum, so the final per-stratum groupby sees at most k * n_blocks
    rows regardless of stratum size."""

    def _local_topk(df: pd.DataFrame) -> pd.DataFrame:
        ids = df[id_col].to_numpy().astype(np.uint64)
        with np.errstate(over="ignore"):  # same wrap as HashSampler/SplitAssigner
            h = (ids * np.uint64(KNUTH)) % np.uint64(KNUTH_MOD)
        out = df.assign(__h=h).sort_values(["__h", id_col])
        return out.groupby(strata_col, sort=False).head(k)

    pruned = docs.map_batches(_local_topk, batch_format="pandas")

    def _final_topk(g: pd.DataFrame) -> pd.DataFrame:
        return (
            g.sort_values(["__h", id_col])
            .groupby(strata_col, sort=False)
            .head(k)
            .drop(columns="__h")
        )

    # strata cardinality is small (languages, splits, buckets): a per-key
    # groupby is a handful of groups, not a per-row loop
    return pruned.groupby(strata_col).map_groups(_final_topk, batch_format="pandas")


def corpus_shuffle(
    docs: "ray.data.Dataset", seed: int = 0, id_col: str = "doc_id"
) -> "ray.data.Dataset":
    """Deterministic seeded global shuffle for training-data export:

      (doc_id, ...) -> (doc_id, shuffle_key, position)

    shuffle_key = knuth31(doc_id + seed) * 2^32 + doc_id — unique (the id
    rides the low bits), seeded, and plain modular arithmetic on BIGINTs
    so a SQL oracle replays it exactly. The order is one distributed sort
    on the key; `position` (0-based global rank) comes from the two-pass
    block-metadata prefix scan — no row data ever gathers on the driver,
    and positions make the downstream shard writer resumable (position
    range -> shard file). Requires 0 <= id < 2^31 (the guard raises):
    wider ids need a 64-bit mix + HUGEINT oracle, a documented boundary."""

    def _key(t: pa.Table) -> pa.Table:
        ids = t[id_col].to_numpy(zero_copy_only=False)
        if len(ids) and (ids.min() < 0 or ids.max() >= (1 << 31)):
            raise ValueError("corpus_shuffle requires 0 <= id < 2^31")
        h31 = ((ids + seed) * KNUTH % KNUTH_MOD) // 2
        return pa.table(
            {
                id_col: ids,
                "shuffle_key": h31 * KNUTH_MOD + ids,
                "__one": np.ones(len(ids), np.int64),
            }
        )

    keyed = docs.map_batches(_key, batch_format="pyarrow")
    ordered = keyed.sort("shuffle_key").materialize()  # scan contract
    scanned = exclusive_prefix_sum(ordered, "shuffle_key", "__one", out_col="position")
    return scanned.drop_columns(["__one"])


def weighted_mix(
    docs: "ray.data.Dataset",
    rates: dict[str, int],
    label_col: str = "source",
    id_col: str = "doc_id",
    default_pct: int = 0,
) -> "ray.data.Dataset":
    """Deterministic DOMAIN-WEIGHTED corpus mixing — the data-mixing step
    that sets per-source sampling rates before training (e.g. wiki 100%,
    web 30%, forums 5%). Each row keeps iff

        (id * KNUTH) mod 2^32 mod 100 < rates[label]

    the shared Knuth sampling hash (`HashSampler` / `doc_sample` oracle),
    so the mix is leakage-free, resumable (same rows kept on every run and
    partition layout), composable with the split assigner (independent
    streams would need a distinct salt), and exactly SQL-replayable.
    Labels absent from `rates` keep `default_pct` percent. One streaming
    pass, no shuffle."""
    items = sorted(rates.items())
    ref = ray.put(items)

    class _Mix:
        def __init__(self):
            self.rates = dict(ray.get(ref))

        def __call__(self, t: pa.Table) -> pa.Table:
            ids = t[id_col].to_numpy(zero_copy_only=False).astype(np.uint64)
            with np.errstate(over="ignore"):
                h = (ids * np.uint64(KNUTH)) % np.uint64(KNUTH_MOD) % np.uint64(100)
            labels = t[label_col].to_pylist()
            pct = np.fromiter(
                (self.rates.get(l, default_pct) for l in labels),
                np.uint64,
                len(labels),
            )
            return t.filter(pa.array(h < pct))

    return docs.map_batches(_Mix, batch_format="pyarrow", concurrency=(1, 8))


def upsert_corpus(
    base_dir: str,
    delta: "ray.data.Dataset",
    key_col: str = "doc_id",
    ver_col: str = "version",
    B: int = 32,
) -> str:
    """CDC-style corpus maintenance: merge a delta snapshot into a
    bucketed document store, latest `ver_col` per `key_col` wins (ties
    go to the delta — a re-crawl at the same version replaces). The
    store layout IS `joins.write_bucketed`'s: one parquet per key
    bucket, so the merge touches each bucket file exactly once and only
    buckets the delta hits are rewritten (resumable, partition-parallel
    — the property the 100-TB brief calls resumable output).

    Scale shape: ONE bucketed shuffle of the delta co-partitions it with
    the store; each bucket group reads its single base file, concatenates,
    keeps the (ver, delta-wins) argmax per key vectorized, and rewrites
    atomically (write-then-rename via `storage.write_table_atomic`).
    Nothing reaches the driver but per-bucket row counts."""
    from graphlite_ray.pipelines.joins import bucket_of
    from graphlite_ray.state import storage

    def _tag(t: pa.Table) -> pa.Table:
        # the STORE's bucket function (key % B, `joins.bucket_of`) — the
        # same layout `write_bucketed` wrote, so each group maps to
        # exactly one base file
        if t.schema.metadata:
            t = t.replace_schema_metadata(None)
        k = t[key_col].to_numpy(zero_copy_only=False)
        return t.append_column("__bucket", pa.array(bucket_of(k, B)))

    def _merge(g: pd.DataFrame) -> pd.DataFrame:
        b = int(g["__bucket"].iloc[0])
        g = g.drop(columns="__bucket")
        path = storage.join(base_dir, f"bucket_{b}.parquet")
        g = g.assign(__src=1)  # delta rows win version ties
        if storage.exists(path):
            base = storage.read_table(path).to_pandas().assign(__src=0)
            g = pd.concat([base, g[base.columns.tolist()[:-1] + ["__src"]]],
                          ignore_index=True)
        g = g.sort_values([key_col, ver_col, "__src"], kind="stable")
        last = np.ones(len(g), bool)
        k = g[key_col].to_numpy()
        last[:-1] = k[:-1] != k[1:]
        out = g[last].drop(columns="__src").sort_values(key_col, kind="stable")
        storage.write_table_atomic(
            pa.Table.from_pandas(out, preserve_index=False), path
        )
        return pd.DataFrame({"bucket": [b], "rows": [len(out)]})

    (
        delta.map_batches(_tag, batch_format="pyarrow")
        .groupby("__bucket")
        .map_groups(_merge, batch_format="pandas")
        .materialize()
    )
    return base_dir
