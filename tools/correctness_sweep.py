#!/usr/bin/env python
"""Local replica of the driver's correctness harness: run EVERY
`queries()` entry and its `oracle_sql()` twin at sf0.01, compare
row count / schema / value hash (columns sorted by name, rows sorted by
all columns, floats as-is — both sides already round by the shared
convention), and write CORRECTNESS_LOCAL_r05.json.

The driver caps each round at 50 queries, so doc/emb/media-family rows
rotate out of CORRECTNESS_r{N}.json; this sweep is the recorded evidence
that the full slate is green on the current tree (r4 ADVICE item 3)."""

from __future__ import annotations

import hashlib
import json
import os
import sys
import time

import pandas as pd


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
    return df.sort_values(list(df.columns), ignore_index=True)


def _hash(df: pd.DataFrame) -> str:
    h = hashlib.sha256()
    for c in df.columns:
        col = df[c]
        if col.dtype.kind == "f":
            h.update(col.round(9).to_numpy().tobytes())
        elif col.dtype.kind in ("i", "u", "b"):
            h.update(col.to_numpy().astype("int64").tobytes())
        else:
            h.update("\x1f".join(col.astype(str)).encode())
    return h.hexdigest()


def main() -> None:
    import duckdb

    import ray

    ray.init(
        address="local",
        num_cpus=int(os.environ.get("RAY_GRAFT_CPUS", 16)),
        include_dashboard=False,
        logging_level="ERROR",
        log_to_driver=False,
    )
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    import __ray_entry__ as E

    sf = os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.01")
    qs = E.queries()
    only = sys.argv[1].split(",") if len(sys.argv) > 1 else None
    results: dict[str, dict] = {}
    con = duckdb.connect()
    for t in (
        "region nation customer supplier part orders lineitem events "
        "documents embeddings"
    ).split():
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf}/{t}.parquet'")
    oracles = E.oracle_sql()

    for name, fn in qs.items():
        if only and name not in only:
            continue
        row: dict = {"err": None}
        t0 = time.time()
        try:
            out = fn(sf)
            df = out if isinstance(out, pd.DataFrame) else out.to_pandas()
            row["spark_rows"] = int(len(df))
            sql = oracles.get(name)
            if sql is None:
                row.update(rows_match=None, schema_match=None, hash_match=None,
                           oracle_rows=None, err="no_oracle")
            else:
                o = con.execute(sql).df()
                row["oracle_rows"] = int(len(o))
                a, b = _canon(df), _canon(o)
                row["rows_match"] = len(a) == len(b)
                row["schema_match"] = list(a.columns) == list(b.columns)
                if row["rows_match"] and row["schema_match"]:
                    b = b.astype(a.dtypes.to_dict(), errors="ignore")
                    row["hash_match"] = _hash(a) == _hash(b)
                else:
                    row["hash_match"] = False
        except Exception as e:  # noqa: BLE001
            row["err"] = f"{type(e).__name__}: {e}"[:300]
            row.setdefault("rows_match", False)
            row.setdefault("hash_match", False)
        row["sec"] = round(time.time() - t0, 2)
        results[name] = row
        status = (
            "PASS" if row.get("hash_match")
            else (row["err"] or "FAIL")
        )
        print(f"{name}: {status} ({row['sec']}s)", flush=True)

    n_pass = sum(1 for r in results.values() if r.get("hash_match"))
    print(f"== {n_pass}/{len(results)} hash-exact ==")
    out_path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "CORRECTNESS_LOCAL_r05.json",
    )
    if only:
        # filtered runs MERGE into the recorded slate instead of
        # overwriting it with a partial file
        try:
            with open(out_path) as f:
                merged = json.load(f)
        except (OSError, ValueError):
            merged = {}
        merged.update(results)
        results = merged
    with open(out_path, "w") as f:
        json.dump(results, f, indent=1, sort_keys=True)
    ray.shutdown()


if __name__ == "__main__":
    main()
