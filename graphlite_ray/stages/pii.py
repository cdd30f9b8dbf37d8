"""PII detection/redaction — the scrubbing pass a web-text training
pipeline runs before releasing or training on a corpus (no reference
analog; SURVEY.md north-rule training-data family).

Patterns are EXPLICIT ASCII (no \\d / \\w shorthand): Python's `re`
treats those as Unicode classes while DuckDB's RE2 is ASCII — the same
divergence the tokenization contract closes. Each pattern is written to
mean the same thing in both engines, so the driver oracle replays the
counts with `regexp_extract_all` exactly.

Stage shape: one actor pool, batch-vectorized on pyarrow's C++ RE2
string kernels (`count_substring_regex` / `replace_substring_regex`) —
Arrow in/out, zero pandas copies, and the SAME RE2 engine the DuckDB
oracle runs (r5; measured 7-13x over the previous pandas `.str` path
with bit-identical output).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray.data

# Explicit-ASCII PII patterns (identical semantics in Python re and RE2)
EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z][A-Za-z]+"
PHONE_RE = r"\+?[0-9][0-9][0-9][- .][0-9][0-9][0-9][- .][0-9][0-9][0-9][0-9]"
IPV4_RE = (
    r"\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b"
)

PATTERNS = {"email": EMAIL_RE, "phone": PHONE_RE, "ipv4": IPV4_RE}
REDACTION = {"email": "<EMAIL>", "phone": "<PHONE>", "ipv4": "<IP>"}


def _clean_texts(t: "pa.Table", col: str) -> "pa.ChunkedArray":
    import pyarrow.compute as pc

    return pc.fill_null(t[col].combine_chunks(), "")


class PIIScanner:
    """(id, text) -> per-document PII match counts
    (n_email, n_phone, n_ipv4) — the audit pass.

    Arrow-native (r5): the patterns are RE2-compatible by contract (module
    docstring), so matching runs on pyarrow's C++ RE2 kernels — measured
    7-13x faster than the previous pandas `.str.count` (Python `re` per
    row) with bit-identical counts, and the batch never copies to pandas."""

    def __init__(self, id_col: str = "doc_id", text_col: str = "text"):
        self.id_col, self.text_col = id_col, text_col

    def __call__(self, t: "pa.Table") -> "pa.Table":
        import pyarrow as pa
        import pyarrow.compute as pc

        texts = _clean_texts(t, self.text_col)
        cols = {self.id_col: t[self.id_col]}
        for name, pat in PATTERNS.items():
            cols[f"n_{name}"] = pc.cast(
                pc.count_substring_regex(texts, pat), pa.int64()
            )
        return pa.table(cols)


class PIIRedactor:
    """(id, text) -> (id, text, n_redactions): every PII match replaced by
    its placeholder token; the scrubbed corpus is the output. Arrow-native
    RE2 kernels, same contract note as `PIIScanner`."""

    def __init__(self, id_col: str = "doc_id", text_col: str = "text"):
        self.id_col, self.text_col = id_col, text_col

    def __call__(self, t: "pa.Table") -> "pa.Table":
        import pyarrow as pa
        import pyarrow.compute as pc

        texts = _clean_texts(t, self.text_col)
        n = np.zeros(t.num_rows, np.int64)
        for name, pat in PATTERNS.items():
            n += pc.count_substring_regex(texts, pat).to_numpy(
                zero_copy_only=False
            ).astype(np.int64)
            texts = pc.replace_substring_regex(texts, pat, REDACTION[name])
        return pa.table(
            {
                self.id_col: t[self.id_col],
                self.text_col: texts,
                "n_redactions": n,
            }
        )


def scan_pii(docs: "ray.data.Dataset", **kw) -> "ray.data.Dataset":
    return docs.map_batches(
        PIIScanner, fn_constructor_kwargs=kw, batch_format="pyarrow",
        batch_size=2048, concurrency=(1, 8),
    )


def redact_pii(docs: "ray.data.Dataset", **kw) -> "ray.data.Dataset":
    return docs.map_batches(
        PIIRedactor, fn_constructor_kwargs=kw, batch_format="pyarrow",
        batch_size=2048, concurrency=(1, 8),
    )
