"""URL canonicalization — the normalization pass web-crawl pipelines run
before URL-level dedup (no reference analog; SURVEY.md north-rule
training-data family).

The canonical form is a FIXED ORDERED rule chain, each rule expressible
identically in Python `re` and DuckDB RE2 / list functions so the driver
oracle replays it exactly (same contract style as `stages/pii.py`):

  1. strip the fragment ('#' and everything after)
  2. lowercase the scheme://host prefix (path/query case preserved)
  3. strip explicit default ports (http :80, https :443)
  4. drop utm_* tracking params from the query, preserving the rest;
     an emptied query drops its '?'
  5. strip one trailing '/' from the pre-query part (non-'/' preceded,
     so 'http://host/' -> 'http://host')

Vectorization: rules 1-3 and 5 are pandas `.str.replace` (C regex
kernels); rule 4 is a per-row split/filter/join on the query string only
(bounded by query length, not document length).
"""
from __future__ import annotations

import re

import numpy as np
import pandas as pd

import ray.data

# explicit patterns, identical semantics in Python re and RE2
FRAG_RE = r"#.*$"
PREFIX_RE = r"^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*"
PORT80_RE = r"^(http://[^/?#:]*):80([/?#]|$)"
PORT443_RE = r"^(https://[^/?#:]*):443([/?#]|$)"
TRAIL_RE = r"([^/])/$"
UTM_RE = re.compile(r"^utm_")

_prefix = re.compile(PREFIX_RE)


def canonicalize_url(u: str) -> str:
    """One URL through the rule chain (the per-row contract; the stage
    below vectorizes the regex rules across a batch)."""
    u = re.sub(FRAG_RE, "", u)
    m = _prefix.match(u)
    if m:
        u = m.group(0).lower() + u[m.end():]
    u = re.sub(PORT80_RE, r"\1\2", u)
    u = re.sub(PORT443_RE, r"\1\2", u)
    if "?" in u:
        base, q = u.split("?", 1)
    else:
        base, q = u, None
    base = re.sub(TRAIL_RE, r"\1", base)
    if q is None:
        return base
    params = [p for p in q.split("&") if p and not UTM_RE.match(p)]
    return base + ("?" + "&".join(params) if params else "")


class UrlCanonicalizer:
    """(url) -> (url, canonical_url). Rules 1/3/5 run as pandas C regex
    kernels over the whole batch; the prefix-lowercase splice and the
    query-param filter are per-row over URL-length strings (tens of
    bytes — bounded by key size, not document size, so this is not a
    hot-path row loop in the per-token sense).

    Stays pandas deliberately (r5 Arrow-native sweep): measured 50k
    urls/batch, the regex kernels are 15% of stage time and the
    irreducibly per-row splice/filter is 85% — an Arrow port moves only
    the 15% and RE2 replacement cannot lowercase the prefix."""

    def __init__(self, url_col: str = "url"):
        self.url_col = url_col

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        u = batch[self.url_col].fillna("").astype(str)
        u = u.str.replace(FRAG_RE, "", regex=True)
        pref = u.str.extract(f"({PREFIX_RE})", expand=False).fillna("")
        lowered = pd.Series(
            [p.lower() + s[len(p):] for s, p in zip(u, pref)], index=u.index
        )
        lowered = lowered.str.replace(PORT80_RE, r"\1\2", regex=True)
        lowered = lowered.str.replace(PORT443_RE, r"\1\2", regex=True)
        canon = []
        for s in lowered:
            if "?" in s:
                base, q = s.split("?", 1)
                base = re.sub(TRAIL_RE, r"\1", base)
                params = [p for p in q.split("&") if p and not UTM_RE.match(p)]
                canon.append(base + ("?" + "&".join(params) if params else ""))
            else:
                canon.append(re.sub(TRAIL_RE, r"\1", s))
        out = batch.copy()
        out["canonical_url"] = canon
        return out


def canonical_url_counts(
    ds: "ray.data.Dataset", url_col: str = "url", B: int = 32
) -> "ray.data.Dataset":
    """(url, ...) -> (canonical_url, n_variants): canonicalize then ONE
    bucketed shuffle on the canonical form — the URL-level dedup key at
    crawl scale."""
    from graphlite_ray.functions.grouping import grouped_map_bucketed

    canon = ds.map_batches(
        UrlCanonicalizer(url_col), batch_format="pandas", batch_size=4096
    )

    def _count(g: pd.DataFrame) -> pd.DataFrame:
        out = (
            g.groupby("canonical_url").size().rename("n_variants").reset_index()
        )
        return out.astype({"n_variants": "int64"})

    return grouped_map_bucketed(canon, ["canonical_url"], _count, B=B)
