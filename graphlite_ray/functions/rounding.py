"""THE rounding convention for every oracled float column.

Round half-AWAY-from-zero (signed) — DuckDB ROUND's tie rule. pandas
`.round()` / numpy `round` are half-even; the two differ by a full ulp on
exact decimal ties, which small-denominator rationals (energy = S/1024,
mean = sum/288) genuinely hit. Library stages that emit floats destined
for a DuckDB-oracled query round HERE so the convention cannot drift per
call site (ADVICE r3; `__ray_entry__._round_half_away` delegates here).
"""
from __future__ import annotations

import numpy as np
import pandas as pd


def round_half_away(s, nd: int):
    """Signed half-away-from-zero rounding to `nd` decimals.

    Accepts a pandas Series (returns a Series with the same index) or any
    array-like (returns a float64 ndarray)."""
    f = 10.0 ** nd
    v = np.asarray(s, np.float64)
    out = np.sign(v) * np.floor(np.abs(v) * f + 0.5) / f
    return pd.Series(out, index=s.index) if isinstance(s, pd.Series) else out
