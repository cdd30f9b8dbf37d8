"""Round-5 additions: distributed near-dup clustering (the r4 verdict's one
remaining 100-TB blocker), contamination scale path, BPE tokenizer stage,
model-inference exemplar stage, incremental graph update."""

import numpy as np
import pandas as pd
import pytest

import ray
import ray.data


# ------------------------------------------------ distributed clustering


def test_cluster_pairs_distributed_matches_union_find(ray_session, work_dir):
    from graphlite_ray.stages.dedup import _cluster, cluster_pairs

    rng = np.random.RandomState(3)
    a = rng.randint(0, 2000, 3000)
    b = a + rng.randint(1, 40, 3000)
    pairs = pd.DataFrame({"a": a, "b": b}).drop_duplicates(ignore_index=True)
    drv = (
        _cluster(pairs)
        .sort_values("doc_id", ignore_index=True)
        .reset_index(drop=True)
    )
    dist = cluster_pairs(pairs, driver_max=0, work_dir=work_dir).sort_values(
        "doc_id", ignore_index=True
    )
    pd.testing.assert_frame_equal(drv, dist)


def test_over_100k_candidates_cluster_instead_of_raising(ray_session, work_dir):
    """r4's minhash guard hard-raised beyond 100k candidate docs; the BSP
    clustering path must handle >100k docs-in-pairs as a sharded job."""
    from graphlite_ray.stages.dedup import cluster_pairs

    n_stars = 40_000  # 3 docs per star -> 120k candidate docs, 80k pairs
    hub = np.arange(n_stars, dtype=np.int64) * 3
    pairs = pd.DataFrame(
        {
            "a": np.concatenate([hub, hub]),
            "b": np.concatenate([hub + 1, hub + 2]),
        }
    )
    out = cluster_pairs(pairs, driver_max=50_000, work_dir=work_dir)
    assert len(out) == 3 * n_stars
    out = out.sort_values("doc_id", ignore_index=True)
    # every doc's rep is its star hub (= component min)
    expect = (out["doc_id"].to_numpy() // 3) * 3
    assert (out["cluster_rep"].to_numpy() == expect).all()


def test_minhash_dedup_distributed_cluster_path_identical(ray_session):
    from graphlite_ray.stages.dedup import minhash_dedup

    base = (
        "the quick brown fox jumps over the lazy dog and runs far away "
        "while the cat watches from the tall green tree near the river"
    )
    rows = []
    for i in range(30):
        rows.append({"doc_id": 2 * i, "text": f"{base} variant {i}"})
        rows.append({"doc_id": 2 * i + 1, "text": f"{base} variant {i} extra"})
    docs = ray.data.from_items(rows)
    res_drv = minhash_dedup(docs, threshold=0.6)
    res_bsp = minhash_dedup(docs, threshold=0.6, driver_cluster_max=0)
    assert len(res_drv.pairs) > 0
    pd.testing.assert_frame_equal(
        res_drv.clusters.sort_values("doc_id", ignore_index=True),
        res_bsp.clusters.sort_values("doc_id", ignore_index=True),
    )


# --------------------------------------------- contamination scale path


def _contam_corpus():
    bench_text = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    docs = [
        {"doc_id": i, "text": f"{bench_text} tail {i}" if i % 3 == 0 else f"clean document number {i} with its own fresh words entirely {i}"}
        for i in range(60)
    ]
    bench = [{"doc_id": 0, "text": bench_text}]
    return docs, bench


def test_decontaminate_bucketed_path_matches_broadcast(ray_session, work_dir):
    from graphlite_ray.stages.contamination import decontaminate

    docs_rows, bench_rows = _contam_corpus()
    docs = ray.data.from_items(docs_rows)
    bench = ray.data.from_items(bench_rows)
    kept_b = (
        decontaminate(docs, bench, threshold=0.3, k=5)
        .to_pandas()
        .sort_values("doc_id", ignore_index=True)
    )
    # broadcast_drop_max=0 forces the streaming anti-join path
    kept_s = (
        decontaminate(
            docs, bench, threshold=0.3, k=5, broadcast_drop_max=0, work_dir=work_dir
        )
        .to_pandas()
        .sort_values("doc_id", ignore_index=True)
    )
    assert len(kept_b) < len(docs_rows)  # something was dropped
    pd.testing.assert_frame_equal(kept_b, kept_s)
