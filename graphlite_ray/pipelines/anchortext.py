"""Anchor-text aggregation: the inbound-anchor index of the web graph.

For every link target, aggregate the anchor TEXT of all inbound links —
the classic web-search signal (anchor text describes the TARGET page, not
the source) and the standard companion table to a Common-Crawl link graph.
The reference engine has no analog (its input contract starts at an
integer edge list, `engine/Worker.cc:29-57`); the north rule's
pages→link-graph scope makes this the natural next table derived from the
same extraction pass.

Shape (scale-safe at 100 TB):
  1. streaming `map_batches` extraction over (url, html) — compiled regex
     per document, columnar out, nothing driver-side;
  2. per-batch PARTIAL combine on (dst_url, anchor_text, src_url) — a
     page repeating the same anchor collapses before the shuffle (the
     n_src_pages distinct-count stays exact: src duplicates merge);
  3. ONE bucketed shuffle on (dst_url, anchor_text) via
     `grouped_map_bucketed` — every key's rows co-locate in one of B
     buckets, vectorized pandas aggregation per bucket, no per-key Python.
"""

from __future__ import annotations

import pandas as pd
import pyarrow as pa

import ray.data

from graphlite_ray.functions.grouping import grouped_map_bucketed
from graphlite_ray.functions.html import extract_anchors


def anchor_rows(pages: "ray.data.Dataset") -> "ray.data.Dataset":
    """(url, html, ...) -> (src_url, dst_url, anchor_text, n) rows,
    pre-combined per batch on the full key (partial combine: `n` counts
    repeats of an identical anchor within the batch)."""

    def _extract(batch: pa.Table) -> pa.Table:
        urls = batch["url"].to_pylist()
        htmls = batch["html"].to_pylist()
        srcs: list[str] = []
        dsts: list[str] = []
        texts: list[str] = []
        for u, h in zip(urls, htmls):
            for d, a in extract_anchors(h):
                srcs.append(u)
                dsts.append(d)
                texts.append(a)
        if not srcs:
            # explicitly typed empty table: object-dtype pandas would type
            # these as null columns and break schema unification on
            # anchor-sparse corpora (r4 ADVICE)
            return pa.table(
                {
                    "dst_url": pa.array([], pa.string()),
                    "anchor_text": pa.array([], pa.string()),
                    "src_url": pa.array([], pa.string()),
                    "n": pa.array([], pa.int64()),
                }
            )
        df = pd.DataFrame(
            {"src_url": srcs, "dst_url": dsts, "anchor_text": texts}
        )
        part = (
            df.groupby(["dst_url", "anchor_text", "src_url"], sort=False)
            .size()
            .rename("n")
            .reset_index()
        )
        return pa.Table.from_pandas(part, preserve_index=False)

    return pages.map_batches(_extract, batch_format="pyarrow")


def anchor_text_index(pages: "ray.data.Dataset", B: int = 32) -> "ray.data.Dataset":
    """pages -> (dst_url, anchor_text, n_refs, n_src_pages).

    n_refs = total inbound anchors with this exact text (parallel anchors
    count, mirroring the engine's parallel-edge semantics);
    n_src_pages = distinct source pages using this text for this target.
    """

    def _agg(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby(["dst_url", "anchor_text"], sort=False).agg(
            n_refs=("n", "sum"), n_src_pages=("src_url", "nunique")
        )
        out = g.reset_index()
        out["n_refs"] = out["n_refs"].astype("int64")
        out["n_src_pages"] = out["n_src_pages"].astype("int64")
        return out

    return grouped_map_bucketed(
        anchor_rows(pages), ["dst_url", "anchor_text"], _agg, B=B
    )
