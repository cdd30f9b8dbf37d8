"""Ray Data stages: page table -> extracted text / link edges.

The reference has no HTML stage — its input contract starts at the integer
edge list (`engine/Worker.cc:29-57`); these stages produce exactly that
boundary from the north rule's page schema. Stateless `map_batches`
functions, Arrow in / Arrow out; the regex work is inherently per-document
but all regexes are compiled once at module import
(`graphlite_ray.functions.html`), and each batch emits columnar output.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray.data

from graphlite_ray.functions.html import extract_links, extract_text
from graphlite_ray.functions.hashing import ids_from_urls


def extract_text_batch(batch: pa.Table) -> pa.Table:
    """(url, html, ...) -> (url, text). The north-rule invariant: output
    `text` must be byte-identical per url to the frozen extractor."""
    htmls = batch["html"].to_pylist()
    texts = [extract_text(h) for h in htmls]
    return pa.table({"url": batch["url"], "text": pa.array(texts, pa.string())})


def extract_links_batch(batch: pa.Table) -> pa.Table:
    """(url, html, ...) -> (src_url, dst_url), one row per anchor, duplicates
    kept (parallel edges — SURVEY.md §2.7)."""
    urls = batch["url"].to_pylist()
    htmls = batch["html"].to_pylist()
    srcs: list[str] = []
    dsts: list[str] = []
    for u, h in zip(urls, htmls):
        links = extract_links(h)
        srcs.extend([u] * len(links))
        dsts.extend(links)
    return pa.table(
        {"src_url": pa.array(srcs, pa.string()), "dst_url": pa.array(dsts, pa.string())}
    )


def assign_ids_batch(batch: pa.Table) -> pa.Table:
    """(src_url, dst_url) -> (src, dst) int64 hash ids + the url columns
    (kept so the url dictionary can be derived from the same pass)."""
    src = ids_from_urls(batch["src_url"].to_pylist())
    dst = ids_from_urls(batch["dst_url"].to_pylist())
    return pa.table(
        {
            "src": pa.array(src),
            "dst": pa.array(dst),
            "src_url": batch["src_url"],
            "dst_url": batch["dst_url"],
        }
    )


def pages_to_edge_urls(pages: "ray.data.Dataset") -> "ray.data.Dataset":
    return pages.map_batches(extract_links_batch, batch_format="pyarrow")


def edge_urls_to_edges(edge_urls: "ray.data.Dataset") -> "ray.data.Dataset":
    return edge_urls.map_batches(assign_ids_batch, batch_format="pyarrow").select_columns(
        ["src", "dst"]
    )


def build_url_map(edge_urls: "ray.data.Dataset") -> "ray.data.Dataset":
    """Distinct (vertex_id, url) over both edge endpoints — the inverse of
    the hash id assignment, used to join readable urls back onto results.
    Exact dedup by hash-shuffle groupby (SURVEY.md §2.7)."""

    def _pairs(batch: pa.Table) -> pa.Table:
        urls = np.concatenate(
            [
                batch["src_url"].to_numpy(zero_copy_only=False),
                batch["dst_url"].to_numpy(zero_copy_only=False),
            ]
        )
        urls = np.unique(urls)  # per-batch pre-dedup before the shuffle
        return pa.table(
            {
                "vertex_id": pa.array(ids_from_urls(urls)),
                "url": pa.array(urls, pa.string()),
            }
        )

    from graphlite_ray.functions.grouping import grouped_map_bucketed

    def _first_frame(g):
        return g.drop_duplicates("vertex_id")

    return grouped_map_bucketed(
        edge_urls.map_batches(_pairs, batch_format="pyarrow"),
        ["vertex_id"],
        _first_frame,
        B=32,
    )


def id_collision_check(url_map: "ray.data.Dataset") -> int:
    """Number of vertex ids claimed by >1 distinct url (must be 0; at
    10^12-url scale remediate by salting — functions/hashing.py)."""

    from graphlite_ray.functions.grouping import grouped_map_bucketed

    def _dups_frame(g):
        nun = g.groupby("vertex_id")["url"].nunique()
        bad = nun[nun > 1].index.to_numpy()
        import pandas as pd

        return pd.DataFrame({"vertex_id": bad})

    return grouped_map_bucketed(url_map, ["vertex_id"], _dups_frame, B=16).count()
