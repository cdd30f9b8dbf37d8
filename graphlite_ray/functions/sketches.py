"""Mergeable, ORDER-INDEPENDENT sketches for the wide aggregations that
cannot hold a group's raw values at 100 TB.

Both sketches here are deterministic functions of the input MULTISET (not
of arrival order or partitioning), so distributed runs are repeatable and
testable:

  - HyperLogLog: approximate distinct count. Registers are per-bucket
    maxima of a deterministic 64-bit hash -> max is commutative/
    associative -> partition-order invariant. Partials merge with
    elementwise max.
  - Fixed-range histogram: approximate quantiles with a hard error bound
    of (max-min)/bins per estimate. Two passes (exact min/max, then bin
    counts); bin assignment is pure IEEE arithmetic, so a DuckDB oracle
    can replay it EXACTLY — the rare approximate operator with an exact
    SQL oracle (`q_event_percentiles_hist`).

The reference engine has neither (its only aggregate is the BSP
aggregator); these are north-rule training-data additions.
"""

from __future__ import annotations

import numpy as np

# splitmix64 constants — the standard 64-bit finalizer (public domain)
_SM_GAMMA = np.uint64(0x9E3779B97F4A7C15)
_SM_M1 = np.uint64(0xBF58476D1CE4E5B9)
_SM_M2 = np.uint64(0x94D049BB133111EB)


def mix64(x: np.ndarray) -> np.ndarray:
    """Deterministic 64-bit mix of int64/uint64 arrays (splitmix64
    finalizer): uniform hash for integer keys."""
    with np.errstate(over="ignore"):
        z = x.astype(np.uint64) + _SM_GAMMA
        z = (z ^ (z >> np.uint64(30))) * _SM_M1
        z = (z ^ (z >> np.uint64(27))) * _SM_M2
        return z ^ (z >> np.uint64(31))


def bit_length_u64(x: np.ndarray) -> np.ndarray:
    """Exact vectorized bit length of uint64 values (0 -> 0). Branchless
    shift cascade — 6 numpy passes, exact for the FULL 64-bit range
    (unlike the frexp trick, which float64 rounding limits to <= 53-bit
    suffixes; see `HyperLogLog.add_hashes`)."""
    x = x.astype(np.uint64)
    n = np.zeros(x.shape, np.uint8)
    for shift in (32, 16, 8, 4, 2, 1):
        s = np.uint64(shift)
        big = x >= (np.uint64(1) << s)
        n[big] += np.uint8(shift)
        x = np.where(big, x >> s, x)
    return n + (x > 0).astype(np.uint8)


def _hll_alpha(m: int) -> float:
    """Standard HLL bias constants (Flajolet et al. 2007) — the small-m
    table the closed-form approximation replaces at m >= 128."""
    if m == 16:
        return 0.673
    if m == 32:
        return 0.697
    if m == 64:
        return 0.709
    return 0.7213 / (1 + 1.079 / m)


def init_registers(ids: np.ndarray, p: int) -> np.ndarray:
    """Per-row dense HLL registers (n, 2^p) uint8 for SINGLE-element sets
    {mix64(id)} — the HyperBall counter seed. Any 4 <= p <= 18 (rho uses
    the exact `bit_length_u64`, not the frexp trick)."""
    assert 4 <= p <= 18
    m = 1 << p
    h = mix64(np.asarray(ids, np.int64))
    bucket = (h >> np.uint64(64 - p)).astype(np.int64)
    rem = h & np.uint64((1 << (64 - p)) - 1)
    rho = ((64 - p) - bit_length_u64(rem) + 1).astype(np.uint8)
    regs = np.zeros((len(h), m), np.uint8)
    regs[np.arange(len(h)), bucket] = rho
    return regs


def estimate_registers(regs: np.ndarray) -> np.ndarray:
    """Vectorized bias-corrected HLL estimate per ROW of an (n, m) uint8
    register matrix (same estimator as `HyperLogLog.estimate`, including
    the linear-counting small-range correction)."""
    n, m = regs.shape
    inv = np.power(2.0, -regs.astype(np.float64))
    E = _hll_alpha(m) * m * m / inv.sum(axis=1)
    zeros = (regs == 0).sum(axis=1)
    small = (E <= 2.5 * m) & (zeros > 0)
    if small.any():
        with np.errstate(divide="ignore"):
            E = np.where(small, m * np.log(m / np.maximum(zeros, 1)), E)
    return E


class HyperLogLog:
    """Dense HLL with 2^p uint8 registers (p=12 -> 4 KiB partials).

    add_hashes() is fully vectorized: bucket = top p bits, rho = leading
    zeros of the (64-p)-bit suffix + 1 (bit length via frexp — exact for
    <= 52-bit suffixes). Standard bias-corrected estimate with
    linear-counting small-range correction.
    """

    def __init__(self, p: int = 12):
        # p >= 11 keeps the (64-p)-bit suffix <= 53 bits, where the frexp
        # bit-length trick is exact (beyond that float64 rounding can
        # overestimate rho by 1 near powers of two)
        assert 11 <= p <= 18
        self.p = p
        self.m = 1 << p
        self.registers = np.zeros(self.m, np.uint8)

    def add_hashes(self, h: np.ndarray) -> "HyperLogLog":
        h = h.astype(np.uint64)
        bucket = (h >> np.uint64(64 - self.p)).astype(np.int64)
        rem = h & np.uint64((1 << (64 - self.p)) - 1)
        # bit_length(rem) via frexp exponent; rem has <= 52 bits for p>=12
        _, exp = np.frexp(rem.astype(np.float64))
        rho = ((64 - self.p) - exp + 1).astype(np.uint8)  # rem==0 -> max rho
        np.maximum.at(self.registers, bucket, rho)
        return self

    def add_ints(self, values: np.ndarray) -> "HyperLogLog":
        return self.add_hashes(mix64(np.asarray(values)))

    def merge(self, other: "HyperLogLog") -> "HyperLogLog":
        assert self.p == other.p
        np.maximum(self.registers, other.registers, out=self.registers)
        return self

    @classmethod
    def from_bytes(cls, blob: bytes, p: int = 12) -> "HyperLogLog":
        h = cls(p)
        h.registers = np.frombuffer(blob, np.uint8).copy()
        assert len(h.registers) == h.m
        return h

    def to_bytes(self) -> bytes:
        return self.registers.tobytes()

    def estimate(self) -> float:
        """Bias-corrected estimate with the linear-counting small-range
        branch. The register sum is an EXACT integer — sum of 2^(63-reg)
        per register, each term a power of two, total <= m * 2^63 held as
        a Python int — so the estimate is order-independent and
        bit-replayable in SQL (HUGEINT sum; see the distinct_users_approx
        oracle in __ray_entry__.py)."""
        m = float(self.m)
        alpha = 0.7213 / (1 + 1.079 / m)
        counts = np.bincount(self.registers, minlength=64)
        S = 0  # exact: sum over registers of 2^(63 - reg)
        for reg, c in enumerate(counts.tolist()):
            if c:
                S += c << (63 - reg)
        E = (alpha * m * m * 2.0**63) / S
        if E <= 2.5 * m:
            zeros = int(counts[0])
            if zeros:
                E = m * np.log(m / zeros)  # linear counting
        return float(E)


def approx_distinct_per_group(
    ds,
    group_col: str,
    value_col: str,
    p: int = 12,
):
    """Approximate distinct `value_col` per `group_col` group: per-batch
    partial HLL registers (one 2^p-byte row per group per batch), ONE
    bucketed shuffle on the group key, vectorized register-max merge per
    group, tiny (group, estimate) result. Never holds raw values; partial
    size is groups x 2^p bytes regardless of data volume.

    Returns a pandas DataFrame (group_col, n_approx:int64).
    """
    import pandas as pd
    import pyarrow as pa

    from graphlite_ray.functions.grouping import grouped_map_bucketed

    def _partial(t: pa.Table) -> pd.DataFrame:
        g = t[group_col].to_numpy(zero_copy_only=False)
        v = t[value_col].to_numpy(zero_copy_only=False)
        groups, inv = np.unique(g, return_inverse=True)
        rows = []
        for i, key in enumerate(groups):
            hll = HyperLogLog(p).add_ints(v[inv == i])
            rows.append((key, hll.to_bytes()))
        return pd.DataFrame(rows, columns=[group_col, "regs"])

    def _merge_frame(frame: pd.DataFrame) -> pd.DataFrame:
        out = []
        for key, grp in frame.groupby(group_col, sort=False):
            mats = np.stack(
                [np.frombuffer(b, np.uint8) for b in grp["regs"]]
            )
            hll = HyperLogLog(p)
            hll.registers = mats.max(axis=0).copy()
            # half-away-from-zero to the nearest int — mirrors the SQL
            # oracle's FLOOR(E + 0.5) (estimates are nonnegative)
            out.append((key, int(np.floor(hll.estimate() + 0.5))))
        return pd.DataFrame(out, columns=[group_col, "n_approx"]).astype(
            {"n_approx": "int64"}
        )

    return (
        grouped_map_bucketed(
            ds.map_batches(_partial, batch_format="pyarrow"),
            [group_col],
            _merge_frame,
            B=8,
        )
        .to_pandas()
        .sort_values(group_col, ignore_index=True)
    )


def histogram_quantiles(
    ds,
    group_col: str,
    value_col: str,
    qs: tuple[float, ...] = (0.5, 0.95),
    bins: int = 256,
):
    """Approximate per-group quantiles via a fixed-range histogram sketch:
    pass 1 = exact per-group (min, max, n); pass 2 = per-batch partial bin
    counts on (group, bin), small groupby sum, then the deterministic
    estimate mid(bin) where the cumulative count first reaches ceil(q*n).
    Error bound: (max-min)/(2*bins) per estimate; all distributed state is
    groups x bins counters. Bin assignment is plain IEEE arithmetic —
    exactly replayable in SQL (see the q_event_percentiles_hist oracle).

    `ds` is CONSUMED TWICE (stats pass + bin pass): pass a deterministic
    source (parquet read / persisted staging table), not a pipeline with
    nondeterministic stages, or the two passes may disagree.

    Returns pandas (group_col, q<..>_est per q, n:int64) sorted by group.
    """
    import pandas as pd
    import pyarrow as pa

    from graphlite_ray.functions.grouping import grouped_map_bucketed

    # pass 1: exact min/max/n per group (partial + tiny final)
    def _stats_partial(t: pa.Table) -> pd.DataFrame:
        g = t[group_col].to_numpy(zero_copy_only=False)
        v = t[value_col].to_numpy(zero_copy_only=False).astype(np.float64)
        groups, inv = np.unique(g, return_inverse=True)
        mn = np.full(len(groups), np.inf)
        mx = np.full(len(groups), -np.inf)
        np.minimum.at(mn, inv, v)
        np.maximum.at(mx, inv, v)
        n = np.bincount(inv)
        return pd.DataFrame(
            {group_col: groups, "mn": mn, "mx": mx, "n": n.astype(np.int64)}
        )

    def _stats_final(frame: pd.DataFrame) -> pd.DataFrame:
        return frame.groupby(group_col, as_index=False).agg(
            mn=("mn", "min"), mx=("mx", "max"), n=("n", "sum")
        )

    stats = (
        grouped_map_bucketed(
            ds.map_batches(_stats_partial, batch_format="pyarrow"),
            [group_col],
            _stats_final,
            B=8,
        )
        .to_pandas()
        .set_index(group_col)
    )

    import ray

    stats_ref = ray.put(stats)

    # pass 2: partial bin counts per batch (plain task fn — the broadcast
    # stats frame is a zero-copy plasma read per task, no actor-pool
    # startup cost)
    def _bins_partial(t: pa.Table) -> pd.DataFrame:
        stats_l = ray.get(stats_ref)
        g = t[group_col].to_numpy(zero_copy_only=False)
        v = t[value_col].to_numpy(zero_copy_only=False).astype(np.float64)
        mn = stats_l["mn"].reindex(g).to_numpy()
        mx = stats_l["mx"].reindex(g).to_numpy()
        width = (mx - mn) / float(bins)
        with np.errstate(invalid="ignore", divide="ignore"):
            b = np.floor((v - mn) / width)
        b = np.where(width > 0, b, 0.0)
        b = np.minimum(b, bins - 1).astype(np.int64)
        df = pd.DataFrame({group_col: g, "bin": b})
        return df.groupby([group_col, "bin"], as_index=False).agg(c=("bin", "size"))

    def _quantile_frame(frame: pd.DataFrame) -> pd.DataFrame:
        stats_l = ray.get(stats_ref)
        out = []
        for key, grp in frame.groupby(group_col, sort=False):
            cnt = grp.groupby("bin")["c"].sum().sort_index()
            cum = cnt.cumsum()
            mn = float(stats_l.loc[key, "mn"])
            mx = float(stats_l.loc[key, "mx"])
            n = int(stats_l.loc[key, "n"])
            width = (mx - mn) / float(bins)
            row = {group_col: key, "n": n}
            for q in qs:
                target = np.ceil(q * n)
                hit = cum[cum >= target]
                b = int(hit.index[0]) if len(hit) else bins - 1
                est = mn if width == 0 else mn + (b + 0.5) * width
                row[f"p{int(q * 100)}_est"] = est
            out.append(row)
        cols = [group_col] + [f"p{int(q * 100)}_est" for q in qs] + ["n"]
        return pd.DataFrame(out)[cols].astype({"n": "int64"})

    return (
        grouped_map_bucketed(
            ds.map_batches(_bins_partial, batch_format="pyarrow"),
            [group_col],
            _quantile_frame,
            B=8,
        )
        .to_pandas()
        .sort_values(group_col, ignore_index=True)
    )


def cms_token_table(
    docs, width: int = 1024, depth: int = 4, B: int = 16
):
    """Count-min sketch of the corpus token multiset (Cormode &
    Muthukrishnan 2005) as a SPARSE mergeable table: one row per touched
    cell, (row:int64, bucket:int64, c:int64), c = sum of counts of every
    token hashing there. Cell totals are order-independent sums, so the
    sketch is a deterministic function of the input multiset (the
    sketches-module contract) and merges across corpora by summing cells.

    Row r's bucket for a token is `hash_strings(token, salt=r) % width` —
    depth independent FNV variants via the library's salt prefix, the
    same hash family the simhash oracle already replays byte-for-byte in
    SQL. Size <= depth*width rows regardless of corpus size; estimate
    error <= e*N/width with prob 1 - e^-depth, always >= the true count.
    """
    import pandas as pd
    import pyarrow as pa

    import ray.data  # noqa: F401

    from graphlite_ray.functions.grouping import grouped_map_bucketed
    from graphlite_ray.functions.hashing import hash_strings
    from graphlite_ray.functions.tokenize import lower_tokens

    def _cells(t: "pa.Table") -> "pa.Table":
        toks: list[str] = []
        for text in t["text"].to_pylist():
            toks.extend(lower_tokens(text))
        if not toks:
            e = np.empty(0, np.int64)
            return pa.table({"row": e, "bucket": e.copy(), "c": e.copy()})
        u, c = np.unique(np.asarray(toks, object), return_counts=True)
        rows, buckets, cs = [], [], []
        for r in range(depth):
            b = (hash_strings(u.tolist(), salt=r) % np.uint64(width)).astype(np.int64)
            # per-batch cell pre-combine
            cell, inv = np.unique(b, return_inverse=True)
            cc = np.bincount(inv, weights=c).astype(np.int64)
            rows.append(np.full(len(cell), r, np.int64))
            buckets.append(cell)
            cs.append(cc)
        return pa.table(
            {
                "row": np.concatenate(rows),
                "bucket": np.concatenate(buckets),
                "c": np.concatenate(cs),
            }
        )

    def _sum_cells(g: "pd.DataFrame") -> "pd.DataFrame":
        out = g.groupby(["row", "bucket"], as_index=False)["c"].sum()
        return out.astype({"c": "int64"})

    return grouped_map_bucketed(
        docs.map_batches(_cells, batch_format="pyarrow"),
        ["row", "bucket"],
        _sum_cells,
        B=B,
    )


def cms_estimates(cms_df, tokens: list[str], width: int, depth: int):
    """Point estimates for a candidate token list from a collected sparse
    CMS (pandas (row, bucket, c)): est(t) = min over rows of the cell
    count. The candidate list is the caller's (per-batch local heavy
    hitters at scale; the full vocabulary when it is enumerable)."""
    import pandas as pd

    from graphlite_ray.functions.hashing import hash_strings

    cell = {(int(r), int(b)): int(c) for r, b, c in cms_df.to_numpy()}
    ests = []
    for t in tokens:
        est = None
        for r in range(depth):
            b = int(hash_strings([t], salt=r)[0] % np.uint64(width))
            v = cell.get((r, b), 0)
            est = v if est is None else min(est, v)
        ests.append(int(est or 0))
    return pd.DataFrame({"token": list(tokens), "n_est": ests}).astype(
        {"n_est": "int64"}
    )
