"""Frozen, versioned HTML text + link extraction.

The reference engine (GraphLite) has no HTML stage at all — its input
contract starts at an integer edge list (`engine/Worker.cc:29-57` in the
reference). The north rule requires our pipeline to *produce* that boundary
from Common-Crawl-style pages with a per-url byte-identical `text` column,
so the extractor here is the frozen contract: pure functions of the html
bytes, no environment dependence, versioned so goldens stay valid forever.

Do not change the behavior of `extract_text` / `extract_links` without
bumping EXTRACTOR_VERSION and regenerating goldens.
"""

from __future__ import annotations

import html as _htmlmod
import re

EXTRACTOR_VERSION = "1"

# Remove <script>/<style> blocks entirely (content must not leak into text).
_SCRIPT_STYLE_RE = re.compile(r"(?is)<(script|style)\b[^>]*>.*?</\1\s*>")
# Any remaining tag.
_TAG_RE = re.compile(r"(?s)<[^>]*>")
# Whitespace normalization.
_WS_RE = re.compile(r"\s+")
# Anchor hrefs, double-quoted (the only form our page generator emits; a
# real-web extractor would widen this — widening bumps the version).
_HREF_RE = re.compile(r'(?is)<a\b[^>]*?href="([^"]*)"')


def extract_text(html: bytes | str) -> str:
    """html bytes -> canonical extracted text. Deterministic, byte-stable.

    Rules (EXTRACTOR_VERSION=1):
      1. decode UTF-8 with replacement chars
      2. drop <script>/<style> elements including content
      3. replace every remaining tag with a single space
      4. unescape HTML entities
      5. collapse all whitespace runs to single spaces; strip ends
    """
    s = html.decode("utf-8", errors="replace") if isinstance(html, bytes) else html
    s = _SCRIPT_STYLE_RE.sub(" ", s)
    s = _TAG_RE.sub(" ", s)
    s = _htmlmod.unescape(s)
    return _WS_RE.sub(" ", s).strip()


ANCHOR_TEXT_VERSION = "1"

# Full anchor elements with a plain-text body: contract v1 deliberately
# requires `[^<]*` inner text (no nested markup) so the SQL oracle can
# replay the extraction with RE2 alone; anchors wrapping other tags are
# skipped on BOTH sides. Widening this bumps ANCHOR_TEXT_VERSION.
_ANCHOR_TAG_RE = re.compile(r'(?is)<a\b[^>]*?href="([^"]*)"[^>]*>([^<]*)</a\s*>')
# Minimal entity chain, applied in THIS order with &amp; last (so the
# chain's output on inputs like '&amp;lt;' matches single-pass unescape)
# — replayed verbatim as nested replace() calls in the SQL oracle.
ANCHOR_ENTITIES = (
    ("&lt;", "<"),
    ("&gt;", ">"),
    ("&quot;", '"'),
    ("&#39;", "'"),
    ("&amp;", "&"),
)
# ASCII whitespace collapse (the corpus tokenization contract's class —
# RE2 `\s` is ASCII-only, Python's is Unicode; both sides use this class).
_ASCII_WS_RE = re.compile(r"[ \t\n\r\f\v]+")


def clean_anchor_text(s: str) -> str:
    """Anchor body -> canonical anchor text (ANCHOR_TEXT_VERSION=1):
    entity chain, ASCII-whitespace collapse to single spaces, space-strip.
    Exactly replayable in SQL as replace()+regexp_replace()+trim()."""
    for k, v in ANCHOR_ENTITIES:
        s = s.replace(k, v)
    return _ASCII_WS_RE.sub(" ", s).strip(" ")


def extract_anchors(html: bytes | str) -> list[tuple[str, str]]:
    """html bytes -> ordered (dst_url, anchor_text) pairs.

    Same target rules as `extract_links` SQL-oracle semantics: absolute
    http(s) hrefs only, fragment stripped, duplicates kept, href taken raw
    (no entity unescape — matching the `extract_edges` oracle convention;
    the synthetic corpus emits entity-free hrefs). Anchor text cleaned per
    `clean_anchor_text`. Empty anchor bodies are kept (an image link's
    anchor text is legitimately '')."""
    s = html.decode("utf-8", errors="replace") if isinstance(html, bytes) else html
    out: list[tuple[str, str]] = []
    for href, body in _ANCHOR_TAG_RE.findall(s):
        if not (href.startswith("http://") or href.startswith("https://")):
            continue
        frag = href.find("#")
        if frag >= 0:
            href = href[:frag]
        if href:
            out.append((href, clean_anchor_text(body)))
    return out


def extract_links(html: bytes | str) -> list[str]:
    """html bytes -> ordered list of absolute http(s) link targets.

    Keeps duplicates (the reference keeps parallel edges — SURVEY.md §2.7)
    and self-links; strips URL fragments; ignores non-absolute and
    non-http(s) hrefs. Order is document order.
    """
    s = html.decode("utf-8", errors="replace") if isinstance(html, bytes) else html
    out: list[str] = []
    for href in _HREF_RE.findall(s):
        href = _htmlmod.unescape(href)
        if not (href.startswith("http://") or href.startswith("https://")):
            continue
        frag = href.find("#")
        if frag >= 0:
            href = href[:frag]
        if href:
            out.append(href)
    return out
