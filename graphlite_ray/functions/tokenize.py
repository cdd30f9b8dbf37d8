"""The ONE corpus-tokenization contract, shared by every Python stage and
every DuckDB oracle.

Python's `str.split()` / `\\S+` split on all UNICODE whitespace (NBSP,
U+2028, ...) while DuckDB's RE2 `\\s` is ASCII-only — a corpus containing
non-ASCII whitespace silently diverges pipeline vs oracle. Both sides now
use the SAME explicit ASCII class, so the definition cannot drift:

  Python:  TOKEN_RE = [^ \\t\\n\\r\\f\\v]+  (findall)
  SQL:     regexp_split_to_array(col, '[ \\t\\n\\r\\f\\v]+') + drop ''

A null/non-string text tokenizes to [] instead of crashing.
"""

from __future__ import annotations

import re

# ASCII whitespace, explicit on both sides of the contract.
WS_CHARS = " \t\n\r\f\v"
TOKEN_RE = re.compile(r"[^ \t\n\r\f\v]+")

# Literal regex STRING to embed in SQL: regexp_split_to_array(x, '<this>').
# (SQL single-quoted literals pass backslashes through to RE2 untouched.)
SQL_WS_SPLIT = r"[ \t\n\r\f\v]+"


def tokens(text) -> list[str]:
    """ASCII-whitespace tokens; null/non-string -> []."""
    if not isinstance(text, str):
        return []
    return TOKEN_RE.findall(text)


def lower_tokens(text) -> list[str]:
    if not isinstance(text, str):
        return []
    return TOKEN_RE.findall(text.lower())
