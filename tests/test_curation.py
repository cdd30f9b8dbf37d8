"""Curation operators: distributed prefix scan, sequence packing,
stratified sampling — exactness vs driver-side numpy/pandas replays."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

import ray.data


def test_exclusive_prefix_sum_matches_numpy_across_blocks():
    from graphlite_ray.functions.scan import exclusive_prefix_sum

    rng = np.random.default_rng(3)
    n = 5000
    keys = rng.permutation(n).astype(np.int64)  # unique, shuffled
    vals = rng.integers(0, 50, n).astype(np.int64)
    ds = (
        ray.data.from_arrow(pa.table({"k": keys, "v": vals}))
        .repartition(13)  # force many blocks
        .sort("k")
        .materialize()
    )
    out = (
        exclusive_prefix_sum(ds, "k", "v", out_col="p")
        .to_pandas()
        .sort_values("k", ignore_index=True)
    )
    order = np.argsort(keys)
    exp = np.concatenate([[0], np.cumsum(vals[order])[:-1]])
    assert (out["p"].to_numpy() == exp).all()


def test_sequence_pack_matches_window_replay():
    from graphlite_ray.stages.curation import sequence_pack
    from graphlite_ray.functions.tokenize import TOKEN_RE

    rng = np.random.default_rng(5)
    texts = [
        " ".join(f"w{j}" for j in range(rng.integers(1, 40))) for _ in range(300)
    ]
    ids = rng.permutation(10_000)[:300].astype(np.int64)
    docs = pd.DataFrame({"doc_id": ids, "text": texts})
    ds = ray.data.from_arrow(
        pa.Table.from_pandas(docs, preserve_index=False).replace_schema_metadata(None)
    ).repartition(7)
    cap = 64
    out = (
        sequence_pack(ds, capacity=cap).to_pandas().sort_values("doc_id", ignore_index=True)
    )
    ref = docs.copy()
    ref["n_tokens"] = ref["text"].map(lambda t: len(TOKEN_RE.findall(t)))
    ref = ref.sort_values("doc_id", ignore_index=True)
    prefix = np.concatenate([[0], np.cumsum(ref["n_tokens"].to_numpy())[:-1]])
    assert out["n_tokens"].tolist() == ref["n_tokens"].tolist()
    assert out["bin_id"].tolist() == (prefix // cap).tolist()
    assert out["bin_offset"].tolist() == (prefix % cap).tolist()
    # packing invariant: bins are dense from 0 and offsets stay < capacity
    assert out["bin_offset"].max() < cap
    assert set(np.diff(np.unique(out["bin_id"]))) <= {1}


def test_stratified_sample_exact_and_skew_safe():
    from graphlite_ray.stages.curation import KNUTH, KNUTH_MOD, stratified_sample

    rng = np.random.default_rng(9)
    n = 2000
    ids = np.arange(n, dtype=np.int64) * 7 + 1
    # heavy skew: one stratum holds 90% of rows
    strata = np.where(rng.random(n) < 0.9, "big", rng.choice(["s1", "s2"], n))
    df = pd.DataFrame({"doc_id": ids, "lang": strata})
    ds = ray.data.from_arrow(
        pa.Table.from_pandas(df, preserve_index=False).replace_schema_metadata(None)
    ).repartition(11)
    k = 7
    out = stratified_sample(ds, "lang", k=k).to_pandas()
    h = (ids.astype(np.uint64) * np.uint64(KNUTH)) % np.uint64(KNUTH_MOD)
    exp = (
        df.assign(h=h)
        .sort_values(["h", "doc_id"])
        .groupby("lang", sort=False)
        .head(k)[["doc_id", "lang"]]
    )
    got = set(map(tuple, out[["doc_id", "lang"]].to_numpy()))
    want = set(map(tuple, exp.to_numpy()))
    assert got == want
    assert out.groupby("lang").size().max() == k


def test_corpus_shuffle_positions_are_exact_seeded_permutation():
    from graphlite_ray.stages.curation import KNUTH, KNUTH_MOD, corpus_shuffle

    ids = np.random.default_rng(1).permutation(4000).astype(np.int64)
    ds = ray.data.from_arrow(pa.table({"doc_id": ids})).repartition(9)
    out = corpus_shuffle(ds, seed=13).to_pandas().sort_values("doc_id", ignore_index=True)
    # driver-side replay
    h31 = ((ids + 13) * KNUTH % KNUTH_MOD) // 2
    key = h31 * KNUTH_MOD + ids
    want = pd.DataFrame({"doc_id": ids, "shuffle_key": key})
    want["position"] = want["shuffle_key"].rank(method="first").astype(np.int64) - 1
    want = want.sort_values("doc_id", ignore_index=True)
    assert (out["shuffle_key"].to_numpy() == want["shuffle_key"].to_numpy()).all()
    assert (out["position"].to_numpy() == want["position"].to_numpy()).all()
    # positions are a permutation of 0..n-1
    assert sorted(out["position"].tolist()) == list(range(4000))
    # a different seed produces a different order
    out2 = corpus_shuffle(ds, seed=14).to_pandas().sort_values("doc_id", ignore_index=True)
    assert (out2["position"].to_numpy() != out["position"].to_numpy()).any()


def test_corpus_shuffle_rejects_wide_ids():
    from graphlite_ray.stages.curation import corpus_shuffle

    ds = ray.data.from_arrow(pa.table({"doc_id": np.array([1, 1 << 31], np.int64)}))
    with pytest.raises(Exception, match="2\\^31"):
        corpus_shuffle(ds).to_pandas()
