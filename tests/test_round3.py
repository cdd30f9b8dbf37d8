"""Round-3 additions: scale-shaped relational paths, oracle plumbing."""

import numpy as np
import pandas as pd
import pytest

SF = "/root/testdata/sf0.001"


def test_topk_per_block_matches_global_sort(ray_session):
    from graphlite_ray.pipelines.relational import q_topk_orders

    fast = q_topk_orders(SF, k=7)
    slow = q_topk_orders(SF, k=7, use_sort=True)
    pd.testing.assert_frame_equal(fast, slow)


def test_distinct_users_matches_pandas(ray_session):
    from graphlite_ray.pipelines.relational import q_distinct_users

    got = q_distinct_users(SF, B=8)
    raw = pd.read_parquet(f"{SF}/events.parquet", columns=["user_id", "event_type"])
    want = (
        raw.groupby("event_type")["user_id"]
        .nunique()
        .rename("n_users")
        .reset_index()
        .sort_values("event_type", ignore_index=True)
    )
    pd.testing.assert_frame_equal(
        got, want.astype({"n_users": "int64"}), check_dtype=False
    )


def test_join_revenue_never_materializes_fact_rows(ray_session):
    """Both join paths must agree AND produce only per-segment rows."""
    from graphlite_ray.pipelines import relational as R

    a = R.q_native_join_revenue(SF, strategy="broadcast")
    b = R.q_native_join_revenue(SF)
    pd.testing.assert_frame_equal(
        a.round({"revenue": 6}), b.round({"revenue": 6})
    )
    assert len(a) <= 10  # segments only, never the joined fact table


def test_minhash_dedup_survives_duplicate_doc_ids(ray_session):
    """A dirty corpus with a repeated doc_id must not crash the
    distributed verify stage (slots dedup on (pair_id, role))."""
    import ray.data

    from graphlite_ray.stages.dedup import minhash_dedup

    base = "the quick brown fox jumps over the lazy dog " * 5
    rows = [
        {"doc_id": 1, "text": base},
        {"doc_id": 2, "text": base + "extra tail"},
        {"doc_id": 2, "text": base + "extra tail"},  # duplicated id
        {"doc_id": 3, "text": "completely different content entirely " * 6},
    ]
    res = minhash_dedup(ray.data.from_items(rows), threshold=0.5)
    pairs = set(map(tuple, res.pairs[["a", "b"]].to_numpy()))
    assert (1, 2) in pairs


def test_staged_edges_failure_surfaces_cause(monkeypatch):
    import __ray_entry__ as entrymod
    import graphlite_ray.pipelines.linkgraph as lg

    def _boom(*a, **k):
        raise OSError("disk on fire")

    monkeypatch.setattr(lg, "prepare_edges", _boom)
    with pytest.raises(RuntimeError, match="staging.*failed.*disk on fire"):
        entrymod._staged_edges_glob()
