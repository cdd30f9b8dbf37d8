"""Property-based tests (hypothesis) for the message combiners — the
correctness kernel of producer-side combining (SURVEY.md §2.12: results
must be invariant to message order and grouping)."""

import numpy as np
import pandas as pd
from hypothesis import given, settings
from hypothesis import strategies as st

from graphlite_ray.worker import combine_min, combine_sum, combine_sum_by_key

ids = st.lists(st.integers(min_value=0, max_value=50), min_size=1, max_size=200)


@settings(max_examples=50, deadline=None)
@given(ids, st.randoms())
def test_combine_sum_matches_pandas_and_is_order_invariant(dst_list, rnd):
    dst = np.array(dst_list, np.int64)
    val = np.arange(len(dst), dtype=np.float64) * 0.5 + 1
    d1, v1 = combine_sum(dst, val)
    want = pd.Series(val).groupby(dst).sum()
    assert np.array_equal(d1, want.index.to_numpy())
    assert np.allclose(v1, want.to_numpy())
    # order invariance (commutative reduction)
    perm = np.array(rnd.sample(range(len(dst)), len(dst)))
    d2, v2 = combine_sum(dst[perm], val[perm])
    assert np.array_equal(d1, d2)
    assert np.allclose(v1, v2)


@settings(max_examples=50, deadline=None)
@given(ids)
def test_combine_min_matches_pandas(dst_list):
    dst = np.array(dst_list, np.int64)
    val = (np.arange(len(dst), dtype=np.int64) * 37) % 11
    d, v = combine_min(dst, val)
    want = pd.Series(val).groupby(dst).min()
    assert np.array_equal(d, want.index.to_numpy())
    assert np.array_equal(v, want.to_numpy())


@settings(max_examples=50, deadline=None)
@given(ids, ids)
def test_combine_sum_by_key_matches_pandas(dst_list, key_list):
    n = min(len(dst_list), len(key_list))
    dst = np.array(dst_list[:n], np.int64)
    key = np.array(key_list[:n], np.int64)
    cnt = np.ones(n, np.int64)
    d, k, c = combine_sum_by_key(dst, key, cnt)
    want = (
        pd.DataFrame({"d": dst, "k": key, "c": cnt})
        .groupby(["d", "k"], as_index=False)["c"]
        .sum()
        .sort_values(["d", "k"], ignore_index=True)
    )
    assert np.array_equal(d, want["d"].to_numpy())
    assert np.array_equal(k, want["k"].to_numpy())
    assert np.array_equal(c, want["c"].to_numpy())
    # two-level combine: combining combined output is a no-op
    d2, k2, c2 = combine_sum_by_key(d, k, c)
    assert np.array_equal(c, c2) and np.array_equal(d, d2) and np.array_equal(k, k2)
