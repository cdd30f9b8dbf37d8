"""PII detection/redaction — the scrubbing pass a web-text training
pipeline runs before releasing or training on a corpus (no reference
analog; SURVEY.md north-rule training-data family).

Patterns are EXPLICIT ASCII (no \\d / \\w shorthand): Python's `re`
treats those as Unicode classes while DuckDB's RE2 is ASCII — the same
divergence the tokenization contract closes. Each pattern is written to
mean the same thing in both engines, so the driver oracle replays the
counts with `regexp_extract_all` exactly.

Stage shape: one compiled-regex actor pool, batch-vectorized via
pandas `.str.count` / `.str.replace` (C-level regex loops, no Python
per-row work beyond the pandas kernel).
"""

from __future__ import annotations

import re

import numpy as np
import pandas as pd

import ray.data

# Explicit-ASCII PII patterns (identical semantics in Python re and RE2)
EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z][A-Za-z]+"
PHONE_RE = r"\+?[0-9][0-9][0-9][- .][0-9][0-9][0-9][- .][0-9][0-9][0-9][0-9]"
IPV4_RE = (
    r"\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b"
)

PATTERNS = {"email": EMAIL_RE, "phone": PHONE_RE, "ipv4": IPV4_RE}
REDACTION = {"email": "<EMAIL>", "phone": "<PHONE>", "ipv4": "<IP>"}


class PIIScanner:
    """(id, text) -> per-document PII match counts
    (n_email, n_phone, n_ipv4) — the audit pass."""

    def __init__(self, id_col: str = "doc_id", text_col: str = "text"):
        self.id_col, self.text_col = id_col, text_col
        self.compiled = {k: re.compile(p) for k, p in PATTERNS.items()}

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        texts = batch[self.text_col].fillna("")
        out = {self.id_col: batch[self.id_col]}
        for name, pat in PATTERNS.items():
            out[f"n_{name}"] = texts.str.count(pat).astype("int64")
        return pd.DataFrame(out)


class PIIRedactor:
    """(id, text) -> (id, text, n_redactions): every PII match replaced by
    its placeholder token; the scrubbed corpus is the output."""

    def __init__(self, id_col: str = "doc_id", text_col: str = "text"):
        self.id_col, self.text_col = id_col, text_col

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        texts = batch[self.text_col].fillna("")
        n = np.zeros(len(batch), np.int64)
        for name, pat in PATTERNS.items():
            n += texts.str.count(pat).to_numpy(np.int64)
            texts = texts.str.replace(pat, REDACTION[name], regex=True)
        return pd.DataFrame(
            {
                self.id_col: batch[self.id_col],
                self.text_col: texts,
                "n_redactions": n,
            }
        )


def scan_pii(docs: "ray.data.Dataset", **kw) -> "ray.data.Dataset":
    return docs.map_batches(
        PIIScanner, fn_constructor_kwargs=kw, batch_format="pandas",
        batch_size=2048, concurrency=(1, 8),
    )


def redact_pii(docs: "ray.data.Dataset", **kw) -> "ray.data.Dataset":
    return docs.map_batches(
        PIIRedactor, fn_constructor_kwargs=kw, batch_format="pandas",
        batch_size=2048, concurrency=(1, 8),
    )
