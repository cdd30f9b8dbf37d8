"""Deterministic synthetic Common-Crawl-style page tables (FIXTURES.md F1).

Schema per BASELINE.json `input_hint`:
    url: string, warc_ts: timestamp[us], html: binary, text: string, lang: string

The html of page *i* embeds anchors encoding a KNOWN graph, reproducible
from (n_pages, seed) alone via `expected_graph` — the edge list is built
first and the html rendered from it, so the generator and the test oracle
share one source of truth. The graph includes (FIXTURES.md F1): ring edges,
hub-skewed extra links, parallel edges (duplicate anchors — the reference
keeps parallel edges, SURVEY.md §2.7), self-links, and links to dangling
urls with no page row (in-edge-only vertices, the analog of the reference's
zero-out-degree nodes, `engine/Worker.cc:342-355`).

The `text` column is produced by running the frozen extractor
(`functions.html.extract_text`) at generation time, making the north rule's
per-url byte-identity testable forever after.

All randomness flows through one seeded `np.random.RandomState`; no wall
clock, no external data.
"""

from __future__ import annotations

import datetime
import os
import shutil

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from graphlite_ray.functions.html import extract_text

_WORDS = (
    "stream graph rank vertex edge crawl page link partition shard actor "
    "batch arrow superstep message combine halt score label component "
    "cluster token shingle window lattice quarry ember cedar harbor"
).split()

_WORDS_DE = "der die das und graph knoten kante seite strom rang nachricht".split()
_CJK = "数据图节点边页面链接分区流排名消息聚合"

CACHE_ROOT = "/tmp/glr_cache"
_BASE_TS = datetime.datetime(2024, 1, 1, 0, 0, 0)


def url_of(i: int, n_pages: int) -> str:
    h = i % max(1, n_pages // 50)
    return f"https://h{h}.example/p{i}"


def dangling_url(j: int) -> str:
    return f"https://dangling.example/d{j}"


def expected_graph(n_pages: int, seed: int = 42) -> tuple[list[str], list[tuple[str, str]]]:
    """Returns (page_urls, edge list as (src_url, dst_url)) — the oracle.

    Edge multiplicity and order match the anchors rendered into the html
    exactly.
    """
    rng = np.random.RandomState(seed)
    urls = [url_of(i, n_pages) for i in range(n_pages)]
    n_hubs = min(20, max(1, n_pages // 100))
    n_dangling = max(5, n_pages // 50)
    edges: list[tuple[str, str]] = []
    for i in range(n_pages):
        src = urls[i]
        edges.append((src, urls[(i + 1) % n_pages]))  # ring: graph is connected
        k = int(rng.randint(0, 6))
        extras: list[str] = []
        for _ in range(k):
            if rng.rand() < 0.3:
                t = int(rng.randint(0, n_hubs))  # hub skew
            else:
                t = int(rng.randint(0, n_pages))
            extras.append(urls[t])
        if i % 7 == 0 and extras:
            extras.append(extras[0])  # parallel edge (duplicate anchor)
        if i % 13 == 0:
            extras.append(src)  # self-link
        if i % 11 == 0:
            extras.append(dangling_url(i % n_dangling))  # dangling target
        edges.extend((src, d) for d in extras)
    return urls, edges


def _paragraph(rng: np.random.RandomState, lang: str, n_words: int) -> str:
    if lang == "zh":
        idx = rng.randint(0, len(_CJK), size=n_words)
        return "".join(_CJK[j] for j in idx)
    vocab = _WORDS_DE if lang == "de" else _WORDS
    idx = rng.randint(0, len(vocab), size=n_words)
    return " ".join(vocab[j] for j in idx)


def _render_html(i: int, url: str, lang: str, targets: list[str], rng: np.random.RandomState) -> str:
    p1 = _paragraph(rng, lang, 8 + int(rng.randint(0, 24)))
    p2 = _paragraph(rng, lang, 8 + int(rng.randint(0, 24)))
    anchors = []
    for j, t in enumerate(targets):
        # every 3rd anchor carries a fragment (stripped by the extractor)
        href = f"{t}#s{j}" if j % 3 == 2 else t
        anchors.append(f'<a href="{href}">ref {j}</a>')
    a_html = " ".join(anchors)
    return (
        f"<html><head><title>Page {i} &amp; notes</title>\n"
        f"<script>var hidden_{i} = {i}; /* must not appear in text */</script>\n"
        "<style>p { color: #333; }</style></head>\n"
        f"<body>\n<h1>Page {i}</h1>\n"
        f"<p>{p1}</p>\n"
        f'<p>See also <a href="mailto:nobody@example.com">mail</a> {a_html}</p>\n'
        f"<p>{p2} &lt;end&gt;</p>\n"
        "</body></html>\n"
    )


def generate_pages_table(n_pages: int, seed: int = 42) -> pa.Table:
    """Build the page table in memory (small/medium scales)."""
    urls, edges = expected_graph(n_pages, seed)
    out_by_src: dict[str, list[str]] = {u: [] for u in urls}
    for s, d in edges:
        out_by_src[s].append(d)
    rng = np.random.RandomState(seed + 1)  # text randomness, separate stream
    htmls: list[bytes] = []
    texts: list[str] = []
    langs: list[str] = []
    for i, u in enumerate(urls):
        lang = "de" if i % 17 == 5 else ("zh" if i % 23 == 7 else "en")
        h = _render_html(i, u, lang, out_by_src[u], rng)
        htmls.append(h.encode("utf-8"))
        texts.append(extract_text(h))
        langs.append(lang)
    ts = [( _BASE_TS + datetime.timedelta(seconds=i)) for i in range(n_pages)]
    return pa.table(
        {
            "url": pa.array(urls, pa.string()),
            "warc_ts": pa.array(ts, pa.timestamp("us")),
            "html": pa.array(htmls, pa.binary()),
            "text": pa.array(texts, pa.string()),
            "lang": pa.array(langs, pa.string()),
        }
    )


def pages_path(n_pages: int, seed: int = 42, rows_per_file: int = 50_000) -> str:
    """Generate (once, cached) and return a directory of page parquet files.

    Atomic write (tmp dir + rename) so concurrent bench subprocesses and
    resumed runs never see a half-written table.
    """
    out = os.path.join(CACHE_ROOT, f"pages_n{n_pages}_s{seed}")
    if os.path.isdir(out):
        return out
    tmp = out + f".tmp.{os.getpid()}"
    os.makedirs(tmp, exist_ok=True)
    table = generate_pages_table(n_pages, seed)
    n_files = max(1, (n_pages + rows_per_file - 1) // rows_per_file)
    step = (n_pages + n_files - 1) // n_files
    for f in range(n_files):
        pq.write_table(table.slice(f * step, step), os.path.join(tmp, f"part-{f:05d}.parquet"))
    try:
        os.rename(tmp, out)
    except OSError:
        shutil.rmtree(tmp, ignore_errors=True)  # another process won the race
    return out
