"""Subword (BPE) tokenization stage — token budgeting in model-tokenizer
units rather than whitespace words (no reference analog; the r4 verdict's
#2 missing training-pipeline operator).

Semantics (exactly SQL-replayable, the repo's oracle discipline):
  1. words = the shared ASCII-whitespace contract (`functions/tokenize.py`),
     lowercased.
  2. a word that is not pure [a-z]+ counts as ONE token (the UNK fallback —
     numbers/punctuation don't enter the merge alphabet).
  3. an alphabetic word becomes the marker-joined char sequence
     "_h _e _l _l _o"; each merge (x, y) in RANK ORDER is ONE global
     left-to-right non-overlapping replacement of "_x _y" -> "_xy"
     (Sennrich-style: a merge is a global substitution pass over the
     sequence). Python `str.replace` and DuckDB `replace` share these
     exact semantics, so the DuckDB oracle replays the merge loop as
     nested `replace()` calls — bit-exact, no float anywhere.
  4. token count = number of '_' markers left (the alphabet is [a-z], so
     '_' cannot occur inside a token).

The merge table is VOCAB-FILE-DRIVEN: `BPETokenizer` loads it once per
actor in `__init__` (path or in-memory list); per-word results are memoized
in an actor-local cache (web text is Zipfian — the cache hit rate is the
throughput story, same trick as production tokenizers).
"""

from __future__ import annotations

import re

import numpy as np
import pyarrow as pa

import ray.data

from graphlite_ray.functions.tokenize import SQL_WS_SPLIT, lower_tokens

# Default merge table: 24 high-frequency English pairs, rank-ordered.
# Deterministic and tiny by design — the oracle SQL nests one replace()
# per merge. Real deployments pass `merges_path` with a learned table.
DEFAULT_MERGES: list[tuple[str, str]] = [
    ("t", "h"),
    ("th", "e"),
    ("i", "n"),
    ("a", "n"),
    ("e", "r"),
    ("o", "n"),
    ("an", "d"),
    ("r", "e"),
    ("in", "g"),
    ("o", "r"),
    ("e", "n"),
    ("a", "t"),
    ("o", "u"),
    ("i", "t"),
    ("i", "s"),
    ("t", "o"),
    ("e", "d"),
    ("s", "t"),
    ("a", "r"),
    ("o", "f"),
    ("a", "l"),
    ("e", "s"),
    ("o", "m"),
    ("l", "e"),
]

_ALPHA = re.compile(r"^[a-z]+$")


def write_merges_file(path: str, merges: list[tuple[str, str]] | None = None) -> str:
    """Persist a merge table, one 'x y' pair per line in rank order (the
    standard merges.txt layout)."""
    with open(path, "w") as f:
        for x, y in merges or DEFAULT_MERGES:
            f.write(f"{x} {y}\n")
    return path


def read_merges_file(path: str) -> list[tuple[str, str]]:
    out = []
    with open(path) as f:
        for line in f:
            line = line.strip()
            if not line or line.startswith("#"):
                continue
            x, y = line.split(" ")
            out.append((x, y))
    return out


def bpe_word_tokens(word: str, merges: list[tuple[str, str]]) -> list[str]:
    """Greedy rank-ordered merge of one lowercase alphabetic word."""
    seq = " ".join("_" + c for c in word)
    for x, y in merges:
        seq = seq.replace(f"_{x} _{y}", f"_{x}{y}")
    return [t[1:] for t in seq.split(" ")]


class BPETokenizer:
    """(doc_id, text) -> (doc_id, words:int64, bpe_tokens:int64).

    Stateful actor-pool stage: the merge table is loaded ONCE per actor
    (`merges_path` file or `merges` list), and per-word token counts are
    memoized in an actor-local dict across batches."""

    def __init__(
        self,
        merges: list[tuple[str, str]] | None = None,
        merges_path: str | None = None,
    ):
        if merges_path is not None:
            merges = read_merges_file(merges_path)
        self.merges = [
            (f"_{x} _{y}", f"_{x}{y}") for x, y in (merges or DEFAULT_MERGES)
        ]
        self.cache: dict[str, int] = {}

    def _count(self, w: str) -> int:
        c = self.cache.get(w)
        if c is None:
            if _ALPHA.match(w):
                seq = " ".join("_" + ch for ch in w)
                for pat, rep in self.merges:
                    seq = seq.replace(pat, rep)
                c = seq.count("_")
            else:
                c = 1
            self.cache[w] = c
        return c

    def __call__(self, t: pa.Table) -> pa.Table:
        ids = t["doc_id"]
        texts = t["text"].to_pylist()
        words = np.zeros(len(texts), np.int64)
        toks = np.zeros(len(texts), np.int64)
        for i, s in enumerate(texts):
            ws = lower_tokens(s)
            words[i] = len(ws)
            toks[i] = sum(self._count(w) for w in ws)
        return pa.table({"doc_id": ids, "words": words, "bpe_tokens": toks})


def bpe_token_counts(
    docs: "ray.data.Dataset",
    merges: list[tuple[str, str]] | None = None,
    merges_path: str | None = None,
    concurrency=(1, 8),
    batch_size: int = 1024,
) -> "ray.data.Dataset":
    """Per-document BPE token counts over a (doc_id, text) corpus."""
    return docs.map_batches(
        BPETokenizer,
        fn_constructor_kwargs={"merges": merges, "merges_path": merges_path},
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
    )


def bpe_count_sql_expr(
    word_expr: str, merges: list[tuple[str, str]] | None = None
) -> str:
    """DuckDB expression: BPE token count of one lowercase word — the
    EXACT replay of `BPETokenizer._count` (same marker encoding, same
    rank-ordered global replaces, same UNK fallback). Both sides derive
    from the SAME merge list, so the contract cannot drift."""
    seq = f"rtrim(regexp_replace({word_expr}, '(.)', '_\\1 ', 'g'))"
    for x, y in merges or DEFAULT_MERGES:
        seq = f"replace({seq}, '_{x} _{y}', '_{x}{y}')"
    return (
        f"CASE WHEN regexp_matches({word_expr}, '^[a-z]+$') "
        f"THEN length({seq}) - length(replace({seq}, '_', '')) ELSE 1 END"
    )


def bpe_doc_counts_sql(
    table: str = "documents", merges: list[tuple[str, str]] | None = None
) -> str:
    """Full per-document oracle: (doc_id, words, bpe_tokens), zero rows for
    token-less docs handled by the left join."""
    cnt = bpe_count_sql_expr("w", merges)
    return (
        "WITH toks AS (SELECT doc_id, unnest(list_filter("
        f"regexp_split_to_array(lower(text), '{SQL_WS_SPLIT}'), x -> x <> '')) AS w "
        f"FROM {table}), "
        f"per_word AS (SELECT doc_id, {cnt} AS c FROM toks), "
        "agg AS (SELECT doc_id, COUNT(*) AS words, SUM(c) AS bpe_tokens "
        "FROM per_word GROUP BY doc_id) "
        "SELECT d.doc_id, COALESCE(agg.words, 0) AS words, "
        "COALESCE(agg.bpe_tokens, 0) AS bpe_tokens "
        f"FROM {table} d LEFT JOIN agg USING (doc_id) ORDER BY d.doc_id"
    )
