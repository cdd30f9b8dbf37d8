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
