"""Large deterministic synthetic edge tables for engine benchmarks.

The pages generator (`sources.pages`) exercises the full extraction path
but renders HTML per page in Python — too slow beyond ~10^5 pages. For
engine-scaling measurements (the north rule's supersteps/hour criterion)
the input contract is the integer edge table itself (the reference's own
boundary, `engine/Worker.cc:29-57`), so this generator emits hub-skewed
random edges directly with vectorized numpy: ~10^7 edges/second, cached as
Parquet. Deterministic from (n_vertices, n_edges, seed); no external data.

Skew model: 85% of destinations uniform, 15% directed at a small hub set
with a harmonic-ish profile — the web's in-link skew shape that the
producer-side combiner must absorb (SURVEY.md §4)."""

from __future__ import annotations

import os
import shutil

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from graphlite_ray.sources.pages import CACHE_ROOT


def synthetic_edges_path(
    n_vertices: int,
    n_edges: int,
    seed: int = 42,
    hub_fraction: float = 0.15,
    n_hubs: int = 64,
    rows_per_file: int = 4_000_000,
) -> str:
    out = os.path.join(CACHE_ROOT, f"edges_v{n_vertices}_e{n_edges}_s{seed}")
    if os.path.isdir(out):
        return out
    tmp = out + f".tmp.{os.getpid()}"
    os.makedirs(tmp, exist_ok=True)
    rng = np.random.RandomState(seed)
    # hub popularity ~ 1/rank
    w = 1.0 / np.arange(1, n_hubs + 1)
    w /= w.sum()
    written = 0
    f = 0
    while written < n_edges:
        m = min(rows_per_file, n_edges - written)
        src = rng.randint(0, n_vertices, size=m).astype(np.int64)
        dst = rng.randint(0, n_vertices, size=m).astype(np.int64)
        hub_mask = rng.rand(m) < hub_fraction
        n_hub = int(hub_mask.sum())
        if n_hub:
            dst[hub_mask] = rng.choice(n_hubs, size=n_hub, p=w).astype(np.int64)
        pq.write_table(
            pa.table({"src": src, "dst": dst}),
            os.path.join(tmp, f"part-{f:05d}.parquet"),
        )
        written += m
        f += 1
    try:
        os.rename(tmp, out)
    except OSError:
        shutil.rmtree(tmp, ignore_errors=True)
    return out
