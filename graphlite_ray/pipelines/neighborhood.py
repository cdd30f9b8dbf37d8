"""Neighborhood function + effective diameter over the page graph.

Two sibling BSP programs (`programs.py`):
  - `neighborhood_exact` — multi-source BFS wavefronts, exact pair counts
    per distance (the DuckDB-oracled small-scale truth).
  - `hyperball` — HLL-counter union per superstep (Boldi & Vigna), the
    fixed-memory web-scale path; per-superstep aggregator deltas telescope
    into the N_hat(t) estimate.

This module shapes either run's aggregator history into the canonical
(t, new_pairs, cum_pairs) table and derives the interpolated effective
diameter from it.
"""

from __future__ import annotations

import numpy as np
import pandas as pd


def neighborhood_table(result, exact: bool = True) -> pd.DataFrame:
    """BSPResult -> (t, new_pairs, cum_pairs), one row per superstep 0..T.
    t=0 is the self-pair row (|sources|). Exact runs return int64 counts;
    HyperBall runs return float64 estimates. Reads the accumulated `hist`
    aggregator (full curve in ANY attempt's final aggregator value), so
    resumed and already-complete runs reconstruct the same table."""
    hist = result.aggr_history[-1]["hist"]
    ts = np.arange(result.final_superstep + 1, dtype=np.int64)
    dtype = np.int64 if exact else np.float64
    new = np.array([hist.get(int(t), 0) for t in ts], dtype)
    return pd.DataFrame({"t": ts, "new_pairs": new, "cum_pairs": np.cumsum(new)})


def effective_diameter(nf: pd.DataFrame, frac: float = 0.9) -> float:
    """Interpolated effective diameter (HyperANF convention): the smallest
    (fractional) t at which cum_pairs reaches `frac` of its final value."""
    cum = nf["cum_pairs"].to_numpy(np.float64)
    t = nf["t"].to_numpy(np.float64)
    target = frac * cum[-1]
    i = int(np.searchsorted(cum, target))
    if i == 0:
        return float(t[0])
    lo, hi = cum[i - 1], cum[i]
    if hi == lo:
        return float(t[i])
    return float(t[i - 1] + (target - lo) / (hi - lo) * (t[i] - t[i - 1]))
