"""Text-analysis stages for large-scale training-data pipelines:
language-ID, quality scoring, token counting, document fingerprinting.

All are actor-pool `map_batches` stages: regexes / stopword tables are
compiled once per actor in `__init__`, batches are processed with
pandas/numpy kernels. Deterministic, dependency-free heuristics (no model
downloads in this environment); each function is versioned by its module
constants — change them and downstream fingerprints/goldens change.
"""

from __future__ import annotations

import re

import numpy as np
import pandas as pd

import ray.data

from graphlite_ray.functions.tokenize import TOKEN_RE, lower_tokens

WORD_RE = re.compile(r"[A-Za-zÀ-ÿ']+")

STOPWORDS = {
    "en": frozenset(
        "the of and to a in is it you that he was for on are with as i his they be "
        "at one have this from or had by not word but what some we can out other".split()
    ),
    "de": frozenset(
        "der die das und ist ich nicht mit sich des auf für als auch es an werden "
        "aus er hat dass sie nach wird bei einer um am sind noch wie einem über".split()
    ),
    "fr": frozenset(
        "le la les de des et un une est pour que qui dans ce il elle au aux avec "
        "ne pas sur se plus par je tu nous vous ils sont cette mais ou donc".split()
    ),
    "es": frozenset(
        "el la los las de y un una es en que no con por para se su al lo como "
        "más pero sus le ya o este sí porque esta entre cuando muy sin sobre".split()
    ),
}

_CJK_RANGES = ((0x4E00, 0x9FFF), (0x3040, 0x30FF), (0xAC00, 0xD7AF))


def token_count(text: str) -> int:
    """ASCII-whitespace token count; ''/all-whitespace/null -> 0.
    SQL-equivalent (the shared contract, `functions.tokenize`):
    len(list_filter(regexp_split_to_array(text, SQL_WS_SPLIT), x -> x <> ''))."""
    if not isinstance(text, str):
        return 0
    return len(TOKEN_RE.findall(text))


class TokenCounter:
    """(doc_id, text) -> (doc_id, n_tokens)."""

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "doc_id": batch["doc_id"],
                "n_tokens": batch["text"].map(token_count).astype("int64"),
            }
        )


def _cjk_ratio(text: str) -> float:
    if not text:
        return 0.0
    n = sum(1 for ch in text if any(lo <= ord(ch) <= hi for lo, hi in _CJK_RANGES))
    return n / len(text)


class LangId:
    """n-gram/stopword heuristic language ID -> (doc_id, lang_pred, lang_conf).

    CJK-character ratio > 0.15 -> "zh" (covers CJK scripts generically);
    otherwise the language whose stopword set covers the largest fraction
    of word tokens; "und" when no evidence."""

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        preds, confs = [], []
        for text in batch["text"]:
            cjk = _cjk_ratio(text)
            if cjk > 0.15:
                preds.append("zh")
                confs.append(cjk)
                continue
            words = [w.lower() for w in WORD_RE.findall(text)]
            if not words:
                preds.append("und")
                confs.append(0.0)
                continue
            best_lang, best = "und", 0.0
            for lang, sw in STOPWORDS.items():
                r = sum(1 for w in words if w in sw) / len(words)
                if r > best:
                    best_lang, best = lang, r
            preds.append(best_lang if best > 0.05 else "und")
            confs.append(best)
        return pd.DataFrame(
            {"doc_id": batch["doc_id"], "lang_pred": preds, "lang_conf": confs}
        )


class QualityScorer:
    """(doc_id, text) -> per-doc quality features + composite score.

    Features (all SQL-expressible except stopword_ratio):
      n_chars, n_tokens, alpha_ratio, digit_ratio, space_ratio,
      mean_token_len, stopword_ratio, quality_score in [0, 1].
    """

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        texts = batch["text"]
        n_chars = texts.str.len().astype("int64")
        n_alpha = texts.str.count(r"[A-Za-z]").astype("int64")
        n_digit = texts.str.count(r"[0-9]").astype("int64")
        n_space = texts.str.count(r"[ \t\n\r\f\v]").astype("int64")
        toks = texts.map(lambda t: TOKEN_RE.findall(t))
        n_tokens = toks.map(len).astype("int64")
        safe_chars = n_chars.replace(0, 1)
        mean_tok = [
            (sum(len(w) for w in ws) / len(ws)) if ws else 0.0 for ws in toks
        ]
        sw = STOPWORDS["en"]
        stop_ratio = [
            (sum(1 for w in ws if w.lower() in sw) / len(ws)) if ws else 0.0
            for ws in toks
        ]
        alpha_ratio = n_alpha / safe_chars
        digit_ratio = n_digit / safe_chars
        space_ratio = n_space / safe_chars
        mt = np.array(mean_tok)
        score = (
            0.35 * np.clip(alpha_ratio / 0.7, 0, 1)
            + 0.25 * np.clip(np.array(stop_ratio) / 0.3, 0, 1)
            + 0.2 * np.clip(1 - digit_ratio * 4, 0, 1)
            + 0.2 * np.exp(-0.5 * ((mt - 5.0) / 3.0) ** 2)
        )
        return pd.DataFrame(
            {
                "doc_id": batch["doc_id"],
                "n_chars": n_chars,
                "n_tokens": n_tokens,
                "alpha_ratio": alpha_ratio,
                "digit_ratio": digit_ratio,
                "space_ratio": space_ratio,
                "mean_token_len": mean_tok,
                "stopword_ratio": stop_ratio,
                "quality_score": score,
            }
        )


FP_WINDOW = 8
FP_KEEP = 4
_FP_BASE = np.uint64(1099511628211)


def fingerprint(text: str) -> int:
    """Deterministic 64-bit document fingerprint: min-sampled rolling
    polynomial hashes of FP_WINDOW-byte windows, xor-folded. Near-identical
    prefixes/suffixes yield overlapping window sets, so small edits change
    few of the sampled minima (winnowing-style robustness)."""
    data = np.frombuffer(text.encode("utf-8"), dtype=np.uint8).astype(np.uint64)
    if len(data) < FP_WINDOW:
        data = np.pad(data, (0, FP_WINDOW - len(data)), constant_values=0)
    n = len(data) - FP_WINDOW + 1
    h = np.zeros(n, np.uint64)
    with np.errstate(over="ignore"):
        for i in range(FP_WINDOW):  # FP_WINDOW=8 vectorized passes
            h = h * _FP_BASE + data[i : i + n]
    k = min(FP_KEEP, len(h))
    mins = np.sort(np.unique(h))[:k]
    out = np.uint64(0)
    with np.errstate(over="ignore"):
        for i, m in enumerate(mins):
            out ^= m * _FP_BASE ** np.uint64(i + 1)
    return int(out)


class Fingerprinter:
    """(doc_id, text) -> (doc_id, fp:int64)."""

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        fps = batch["text"].map(lambda t: fingerprint(t) & 0x7FFFFFFFFFFFFFFF)
        return pd.DataFrame({"doc_id": batch["doc_id"], "fp": fps.astype("int64")})


def token_doc_frequency(
    docs: "ray.data.Dataset", B: int = 32
) -> "ray.data.Dataset":
    """Document frequency per token (the TF-IDF building block): explode
    each doc's DISTINCT lowercase whitespace tokens once per batch, then
    one bucketed shuffle on token groups a token's (token, doc_id) rows
    and counts distinct docs vectorized. Vocabulary shards across buckets;
    nothing driver-side."""
    import pyarrow as pa

    def _pairs(t: "pa.Table") -> "pa.Table":
        ids = t["doc_id"].to_numpy(zero_copy_only=False)
        toks: list[str] = []
        out_ids: list[np.ndarray] = []
        for i, text in enumerate(t["text"].to_pylist()):
            u = sorted(set(lower_tokens(text)))
            toks.extend(u)
            out_ids.append(np.full(len(u), ids[i], np.int64))
        return pa.table(
            {
                "token": pa.array(toks, pa.string()),
                "doc_id": np.concatenate(out_ids) if out_ids else np.empty(0, np.int64),
            }
        )

    from graphlite_ray.functions.grouping import grouped_map_bucketed

    def _df_frame(g: pd.DataFrame) -> pd.DataFrame:
        out = (
            g.drop_duplicates(["token", "doc_id"])
            .groupby("token")
            .size()
            .rename("df")
            .reset_index()
        )
        return out.astype({"df": "int64"})

    return grouped_map_bucketed(
        docs.map_batches(_pairs, batch_format="pyarrow"), ["token"], _df_frame, B=B
    )


def inverted_index(
    docs: "ray.data.Dataset", B: int = 32
) -> "ray.data.Dataset":
    """Inverted index build (the web-search serving companion of the link
    graph): token -> (df, cf, postings), postings = "doc_id:tf" entries
    sorted by doc_id, comma-joined. Per-batch explode computes each doc's
    term frequencies locally (a doc lives in exactly one batch), then ONE
    bucketed shuffle on token assembles every token's complete posting
    list vectorized inside its bucket. Output is one row per token —
    the natural partitioned-parquet layout for a sharded index.

    Scale note: a stop-word's posting list is O(corpus); real deployments
    cap or tier hot terms (impact-ordered blocks). The one-row-per-token
    contract keeps that a post-filter (`WHERE df < cap`) rather than a
    shuffle change."""
    import pyarrow as pa

    def _tf(t: "pa.Table") -> "pa.Table":
        ids = t["doc_id"].to_numpy(zero_copy_only=False)
        toks: list[str] = []
        tfs: list[np.ndarray] = []
        out_ids: list[np.ndarray] = []
        for i, text in enumerate(t["text"].to_pylist()):
            tl = lower_tokens(text)
            if not tl:
                continue
            u, c = np.unique(np.asarray(tl, object), return_counts=True)
            toks.extend(u.tolist())
            tfs.append(c.astype(np.int64))
            out_ids.append(np.full(len(u), ids[i], np.int64))
        if not toks:
            return pa.table(
                {
                    "token": pa.array([], pa.string()),
                    "doc_id": pa.array([], pa.int64()),
                    "tf": pa.array([], pa.int64()),
                }
            )
        return pa.table(
            {
                "token": pa.array(toks, pa.string()),
                "doc_id": np.concatenate(out_ids),
                "tf": np.concatenate(tfs),
            }
        )

    from graphlite_ray.functions.grouping import grouped_map_bucketed

    def _assemble(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["token", "doc_id"], kind="stable")
        g["entry"] = g["doc_id"].astype(str) + ":" + g["tf"].astype(str)
        out = g.groupby("token", as_index=False).agg(
            df=("doc_id", "size"),
            cf=("tf", "sum"),
            postings=("entry", ",".join),
        )
        return out.astype({"df": "int64", "cf": "int64"})

    return grouped_map_bucketed(
        docs.map_batches(_tf, batch_format="pyarrow"), ["token"], _assemble, B=B
    )


def token_heavy_hitters(
    docs: "ray.data.Dataset", k: int = 20, B: int = 32
) -> pd.DataFrame:
    """Top-k most frequent tokens across the corpus (the vocabulary /
    heavy-hitter operator): per-batch token counts collapse each batch to
    its distinct tokens (producer combine), ONE bucketed shuffle on token
    sums exact totals per bucket, each bucket emits only its local top-k,
    and the driver merges <= B*k rows. Exact (not sketched) because every
    token's rows land in one bucket; swap the final per-bucket head(k) for
    a count-min sketch only if the vocabulary itself outgrows a bucket."""
    import pyarrow as pa

    def _counts(t: "pa.Table") -> "pa.Table":
        toks: list[str] = []
        for text in t["text"].to_pylist():
            toks.extend(lower_tokens(text))
        if not toks:
            return pa.table(
                {"token": pa.array([], pa.string()), "c": pa.array([], pa.int64())}
            )
        u, c = np.unique(np.asarray(toks, object), return_counts=True)
        return pa.table({"token": pa.array(u.tolist(), pa.string()), "c": c})

    from graphlite_ray.functions.grouping import grouped_map_bucketed

    def _bucket_topk(g: pd.DataFrame) -> pd.DataFrame:
        s = g.groupby("token", as_index=False)["c"].sum()
        return s.sort_values(["c", "token"], ascending=[False, True]).head(k)

    parts = grouped_map_bucketed(
        docs.map_batches(_counts, batch_format="pyarrow"), ["token"], _bucket_topk, B=B
    ).to_pandas()
    out = (
        parts.sort_values(["c", "token"], ascending=[False, True])
        .head(k)
        .reset_index(drop=True)
        .rename(columns={"c": "n"})
    )
    out["n"] = out["n"].astype("int64")
    return out


def tfidf_top_terms(
    docs: "ray.data.Dataset",
    k: int = 5,
    B: int = 32,
    n_docs: int | None = None,
) -> "ray.data.Dataset":
    """Top-k TF-IDF terms per document (keyword extraction / relevance
    weighting over a web corpus):

      (doc_id, text) -> (doc_id, token, tf:int64, df:int64, score:float64)

    score = tf * ln(N / df) rounded half-away to 6 decimals; ranking uses
    the ROUNDED score (ties broken by token asc) so the cut is replayable.

    Shape: per-batch (doc, token, tf) explode (a doc is one row, so
    per-batch tf is complete) -> ONE bucketed shuffle on token computes df
    AND attaches idf in the same bucket (all rows of a token co-locate; no
    separate df pass over the corpus) -> ONE bucketed shuffle on doc_id
    takes the per-doc top-k. At 100 TB both exchanges carry (doc, distinct
    token) rows — the same volume class as token_doc_frequency.

    idf uses `math.log` (libm) per DISTINCT df value, not numpy's SIMD
    log: DuckDB's ln is libm-bit-exact on this platform while np.log
    diverges in the last ulp on ~20% of inputs (measured), which would
    break the oracle's bit-exact hash compare.

    N counts ALL input docs (token-less included). Pass `n_docs` when
    known; otherwise `docs.count()` runs (metadata-cheap on a fresh
    parquet read, a full pass on a derived dataset)."""
    import math

    import pyarrow as pa

    from graphlite_ray.functions.grouping import grouped_map_bucketed
    from graphlite_ray.functions.rounding import round_half_away

    if n_docs is None:
        n_docs = docs.count()
    N = float(n_docs)

    def _tf(t: "pa.Table") -> "pa.Table":
        ids = t["doc_id"].to_numpy(zero_copy_only=False)
        toks: list[str] = []
        out_ids: list[np.ndarray] = []
        tfs: list[np.ndarray] = []
        for i, text in enumerate(t["text"].to_pylist()):
            ts = lower_tokens(text)
            if not ts:
                continue
            u, c = np.unique(np.asarray(ts, object), return_counts=True)
            toks.extend(u.tolist())
            tfs.append(c.astype(np.int64))
            out_ids.append(np.full(len(u), ids[i], np.int64))
        return pa.table(
            {
                "doc_id": np.concatenate(out_ids) if out_ids else np.empty(0, np.int64),
                "token": pa.array(toks, pa.string()),
                "tf": np.concatenate(tfs) if tfs else np.empty(0, np.int64),
            }
        )

    def _score(g: pd.DataFrame) -> pd.DataFrame:
        # every row of a token is in this bucket -> df is exact here
        df = g.groupby("token")["doc_id"].transform("size").to_numpy(np.int64)
        uniq = np.unique(df)
        idf_by_df = {int(d): math.log(N / d) for d in uniq}  # libm, matches ln()
        idf = np.array([idf_by_df[int(d)] for d in uniq])[np.searchsorted(uniq, df)]
        out = g[["doc_id", "token", "tf"]].copy()
        out["df"] = df
        out["score"] = round_half_away(out["tf"].to_numpy(np.float64) * idf, 6)
        return out

    def _topk(g: pd.DataFrame) -> pd.DataFrame:
        s = g.sort_values(
            ["doc_id", "score", "token"], ascending=[True, False, True],
            kind="mergesort",
        )
        return s.groupby("doc_id", as_index=False, sort=False).head(k)

    scored = grouped_map_bucketed(
        docs.map_batches(_tf, batch_format="pyarrow"), ["token"], _score, B=B
    )
    return grouped_map_bucketed(scored, ["doc_id"], _topk, B=B)


def vocab_size(docs: "ray.data.Dataset", B: int = 32) -> int:
    """Distinct lowercase-token count over the corpus: per-batch distinct
    explode -> one bucketed shuffle (a token's rows land in exactly one
    bucket, so per-bucket nunique sums are exact) -> B tiny rows to the
    driver."""
    import pyarrow as pa

    from graphlite_ray.functions.grouping import grouped_map_bucketed

    def _toks(t: "pa.Table") -> "pa.Table":
        toks: list[str] = []
        for text in t["text"].to_pylist():
            toks.extend(set(lower_tokens(text)))
        return pa.table({"token": pa.array(toks, pa.string())})

    def _nuniq(g: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({"n": np.array([g["token"].nunique()], np.int64)})

    parts = grouped_map_bucketed(
        docs.map_batches(_toks, batch_format="pyarrow"), ["token"], _nuniq, B=B
    )
    return int(sum(r["n"] for r in parts.take_all()))


def lm_score(
    docs: "ray.data.Dataset",
    alpha: float = 0.1,
    V: int | None = None,
    B: int = 32,
) -> "ray.data.Dataset":
    """Bigram language-model quality scoring (the CCNet-style perplexity
    filter, with the LM trained on the corpus itself):

      (doc_id, text) -> (doc_id, n_bigrams:int64, avg_logp:float64)

    avg_logp = mean over a doc's adjacent token pairs (w1, w2) of
      ln( (c(w1,w2) + alpha) / (c_ctx(w1) + alpha*V) )
    where c(w1,w2) is the corpus bigram count, c_ctx(w1) = sum_w c(w1,w)
    is w1's count AS A CONTEXT (doc-final tokens never open a bigram, so
    the conditional sums to 1 exactly), V is the corpus vocabulary size
    (distinct lowercase tokens; computed via `vocab_size` when not given)
    and alpha is add-alpha smoothing. Docs with < 2 tokens emit no row.
    Low avg_logp = improbable token sequences = the filter's cut signal.

    Shape (no broadcast model — at web scale the bigram table is far
    bigger than a worker): per-batch (doc, w1, w2, c_doc) explode -> ONE
    bucketed shuffle on w1 where the model IS the bucket (all rows opening
    with w1 co-locate, so c(w1,w2) and c_ctx(w1) are exact per-bucket
    groupby sums — no separate training pass or join) -> ONE bucketed
    shuffle on doc_id sums the per-pair log terms. Both exchanges carry
    (doc, distinct bigram) rows, the same volume class as
    `token_doc_frequency`.

    ln via `math.log` per DISTINCT (count, context) pair — libm-bit-exact
    vs DuckDB's ln (see `tfidf_top_terms`); avg_logp is a float SUM, so it
    is rounded half-away to 6 decimals on both sides of the oracle."""
    import math

    import pyarrow as pa

    from graphlite_ray.functions.grouping import grouped_map_bucketed
    from graphlite_ray.functions.rounding import round_half_away

    if V is None:
        V = vocab_size(docs, B=B)
    aV = alpha * float(V)

    def _bigrams(t: "pa.Table") -> "pa.Table":
        ids = t["doc_id"].to_numpy(zero_copy_only=False)
        did: list[np.ndarray] = []
        w1s: list[np.ndarray] = []
        w2s: list[np.ndarray] = []
        for i, text in enumerate(t["text"].to_pylist()):
            ts = lower_tokens(text)
            if len(ts) < 2:
                continue
            a = np.asarray(ts, object)
            did.append(np.full(len(ts) - 1, ids[i], np.int64))
            w1s.append(a[:-1])
            w2s.append(a[1:])
        if not did:
            return pa.table(
                {
                    "doc_id": np.empty(0, np.int64),
                    "w1": pa.array([], pa.string()),
                    "w2": pa.array([], pa.string()),
                    "c_doc": np.empty(0, np.int64),
                }
            )
        g = (
            pd.DataFrame(
                {
                    "doc_id": np.concatenate(did),
                    "w1": np.concatenate(w1s),
                    "w2": np.concatenate(w2s),
                }
            )
            .groupby(["doc_id", "w1", "w2"], sort=False)
            .size()
            .rename("c_doc")
            .reset_index()
            .astype({"c_doc": "int64"})
        )
        return pa.Table.from_pandas(g, preserve_index=False).replace_schema_metadata(
            None
        )

    def _model_score(g: pd.DataFrame) -> pd.DataFrame:
        # all rows opening with a given w1 are in this bucket -> corpus
        # counts are exact local groupby sums
        c_doc = g["c_doc"].to_numpy(np.float64)
        big = g.groupby(["w1", "w2"])["c_doc"].transform("sum").to_numpy(np.float64)
        ctx = g.groupby("w1")["c_doc"].transform("sum").to_numpy(np.float64)
        pairs = np.stack([big, ctx], 1)
        u, inv = np.unique(pairs, axis=0, return_inverse=True)
        lps = np.array([math.log((b + alpha) / (c + aV)) for b, c in u])
        out = g[["doc_id"]].copy()
        out["c_doc"] = g["c_doc"].to_numpy(np.int64)
        out["wlp"] = c_doc * lps[inv]
        return out

    def _per_doc(g: pd.DataFrame) -> pd.DataFrame:
        agg = g.groupby("doc_id", sort=True).agg(
            n_bigrams=("c_doc", "sum"), s=("wlp", "sum")
        )
        return pd.DataFrame(
            {
                "doc_id": agg.index.to_numpy(np.int64),
                "n_bigrams": agg["n_bigrams"].to_numpy(np.int64),
                "avg_logp": round_half_away(
                    agg["s"].to_numpy(np.float64)
                    / agg["n_bigrams"].to_numpy(np.float64),
                    6,
                ),
            }
        )

    scored = grouped_map_bucketed(
        docs.map_batches(_bigrams, batch_format="pyarrow"), ["w1"], _model_score, B=B
    )
    return grouped_map_bucketed(scored, ["doc_id"], _per_doc, B=B)


class HashSampler:
    """Deterministic corpus sampling by id hash (leakage-free, resumable —
    the same rows are sampled on every run/partition layout): keep rows
    with (id * 2654435761) mod 2^32 mod 100 < pct. Same SQL-replicable
    hash as SplitAssigner, so the sample is auditable outside the engine."""

    def __init__(self, pct: int = 5, id_col: str = "doc_id"):
        self.pct, self.id_col = pct, id_col

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        ids = batch[self.id_col].to_numpy().astype(np.uint64)
        with np.errstate(over="ignore"):
            h = (ids * np.uint64(_SPLIT_MULT)) % np.uint64(1 << 32) % np.uint64(100)
        return batch[h < self.pct]


class PropsExtractor:
    """events.props JSON sidecar -> typed column (the JSON-field-extraction
    operator): one vectorized regex per batch, no per-row json.loads.
    Rows whose props lack a numeric "k" field are DROPPED (coerce +
    filter), not crashed on — malformed sidecar rows are expected in dirty
    web data."""

    import re as _re

    K_RE = r'"k":\s*(-?\d+)'

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        k = pd.to_numeric(
            batch["props"].str.extract(self.K_RE, expand=False), errors="coerce"
        )
        keep = k.notna()
        out = batch.loc[keep].drop(columns=["props"]).copy()
        out["k"] = k[keep].astype("int64")
        return out


class RepetitionScorer:
    """(doc_id, text) -> Gopher-style repetition signals over the token
    stream (the boilerplate/low-quality filter a Common-Crawl pipeline
    runs before training):

      dup_token_frac  = 1 - distinct_tokens / n_tokens   (0 if empty)
      top_bigram_frac = count(most frequent bigram) / n_bigrams (0 if <2)

    Both are single ratios of integer counts — bit-exact against the SQL
    oracle with no rounding. Vectorized per batch: one token explode, one
    np.unique per doc segment."""

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        dup, top = [], []
        for text in batch["text"]:
            toks = lower_tokens(text)
            n = len(toks)
            if n == 0:
                dup.append(0.0)
                top.append(0.0)
                continue
            arr = np.asarray(toks, object)
            dup.append(1.0 - len(np.unique(arr)) / n)
            if n < 2:
                top.append(0.0)
                continue
            big = np.char.add(np.char.add(arr[:-1].astype(str), " "), arr[1:].astype(str))
            _, counts = np.unique(big, return_counts=True)
            top.append(int(counts.max()) / (n - 1))
        return pd.DataFrame(
            {
                "doc_id": batch["doc_id"],
                "dup_token_frac": np.asarray(dup, np.float64),
                "top_bigram_frac": np.asarray(top, np.float64),
            }
        )


_SPLIT_MULT = 2654435761  # Knuth multiplicative hash (SQL-replicable)


class SplitAssigner:
    """Deterministic train/val/test split by id hash — the standard
    leakage-free corpus split. The hash is (id * 2654435761) mod 2^32
    mod 100, chosen to be exactly replicable in ANSI SQL (modular
    arithmetic only) so the split is auditable outside the engine."""

    def __init__(self, id_col: str = "doc_id", train: int = 90, val: int = 5):
        self.id_col, self.train, self.val = id_col, train, val

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        ids = batch[self.id_col].to_numpy().astype(np.uint64)
        with np.errstate(over="ignore"):
            h = (ids * np.uint64(_SPLIT_MULT)) % np.uint64(1 << 32) % np.uint64(100)
        split = np.where(
            h < self.train, "train", np.where(h < self.train + self.val, "val", "test")
        )
        out = batch.copy()
        out["split"] = split
        return out


def text_stats_pipeline(
    docs: "ray.data.Dataset", stage: str = "quality", concurrency=(1, 8), batch_size: int = 1024
) -> "ray.data.Dataset":
    cls = {
        "tokens": TokenCounter,
        "langid": LangId,
        "quality": QualityScorer,
        "fingerprint": Fingerprinter,
    }[stage]
    return docs.map_batches(
        cls, batch_format="pandas", batch_size=batch_size, concurrency=concurrency
    )


def token_pmi(
    docs: "ray.data.Dataset",
    min_count: int = 2,
    max_tokens_per_doc: int = 24,
    B: int = 32,
    n_docs: int | None = None,
) -> "ray.data.Dataset":
    """Pointwise-mutual-information word-association mining over the
    corpus (collocation discovery / phrase-table seeding — the classic
    corpus-statistics companion of TF-IDF):

      (doc_id, text) -> (tok_a, tok_b, co_df:int64, pmi:float64)

    for every unordered token pair (tok_a < tok_b) co-occurring in at
    least `min_count` documents, with

      pmi = ln(co_df * N / (df_a * df_b))   rounded half-away to 6,

    N = TOTAL input docs, df = per-token document frequency over the same
    kept-token set the pairs are built from.

    Per doc only the first `max_tokens_per_doc` DISTINCT tokens in sorted
    order enter the statistic — the deterministic (and therefore
    SQL-replayable) fan-out guard: pair volume per doc is bounded by
    M*(M-1)/2 regardless of document length, so a pathological 1M-token
    page cannot explode the pair exchange.

    Shape: three bucketed exchanges, nothing driver-side.
      1. per-batch kept-token explode (a doc is one row, so the per-doc
         distinct+cap is complete locally);
      2. shuffle on token: df is exact inside the bucket (all rows of a
         token co-locate) and rides along on each (doc, token) row —
         same trick as `tfidf_top_terms`, no separate df pass;
      3. shuffle on doc_id: each doc's kept tokens (with dfs) co-locate,
         pairs emit vectorized (np.triu_indices) and pre-combine to
         per-bucket (tok_a, tok_b, partial co) subtotals before
      4. the pair-keyed shuffle sums co_df, applies `min_count` and
         computes pmi.
    At 100 TB each exchange carries O(docs * M) / O(docs * M^2 / 2) fixed-
    width rows; `B` grows with `auto_bucket_count` upstream conventions.

    ln uses `math.log` (libm) per DISTINCT ratio, not np.log — DuckDB's
    ln is libm-bit-exact on this platform while np.log diverges in the
    last ulp (`tfidf_top_terms` note), which would break the oracle's
    hash compare."""
    import math

    import pyarrow as pa

    from graphlite_ray.functions.grouping import grouped_map_bucketed
    from graphlite_ray.functions.rounding import round_half_away

    if n_docs is None:
        n_docs = docs.count()
    N = float(n_docs)
    M = int(max_tokens_per_doc)

    def _kept(t: "pa.Table") -> "pa.Table":
        ids = t["doc_id"].to_numpy(zero_copy_only=False)
        toks: list[str] = []
        out_ids: list[np.ndarray] = []
        for i, text in enumerate(t["text"].to_pylist()):
            u = sorted(set(lower_tokens(text)))[:M]
            toks.extend(u)
            out_ids.append(np.full(len(u), ids[i], np.int64))
        return pa.table(
            {
                "doc_id": np.concatenate(out_ids) if out_ids else np.empty(0, np.int64),
                "token": pa.array(toks, pa.string()),
            }
        )

    def _attach_df(g: pd.DataFrame) -> pd.DataFrame:
        out = g.copy()
        out["df"] = g.groupby("token")["doc_id"].transform("size").to_numpy(np.int64)
        return out

    def _pairs(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["doc_id", "token"], kind="mergesort")
        ids = g["doc_id"].to_numpy(np.int64)
        tok = g["token"].to_numpy(object)
        dfv = g["df"].to_numpy(np.int64)
        starts = np.flatnonzero(np.r_[True, ids[1:] != ids[:-1]])
        ends = np.r_[starts[1:], len(ids)]
        ai: list[np.ndarray] = []
        bi: list[np.ndarray] = []
        for s, e in zip(starts, ends):
            n = e - s
            if n < 2:
                continue
            r, c = np.triu_indices(n, k=1)
            ai.append(r + s)
            bi.append(c + s)
        if not ai:
            return pd.DataFrame(
                {
                    "tok_a": pd.Series([], dtype=object),
                    "tok_b": pd.Series([], dtype=object),
                    "df_a": pd.Series([], dtype=np.int64),
                    "df_b": pd.Series([], dtype=np.int64),
                    "co": pd.Series([], dtype=np.int64),
                }
            )
        a = np.concatenate(ai)
        b = np.concatenate(bi)
        part = pd.DataFrame(
            {"tok_a": tok[a], "tok_b": tok[b], "df_a": dfv[a], "df_b": dfv[b]}
        )
        # pre-combine inside the bucket: repeated pairs across this
        # bucket's docs collapse before the pair exchange (df_* is
        # constant per token, so it survives the groupby unchanged)
        out = (
            part.groupby(["tok_a", "tok_b", "df_a", "df_b"], sort=False)
            .size()
            .rename("co")
            .reset_index()
        )
        return out.astype({"co": "int64"})

    def _pmi(g: pd.DataFrame) -> pd.DataFrame:
        agg = g.groupby(["tok_a", "tok_b", "df_a", "df_b"], as_index=False, sort=False)[
            "co"
        ].sum()
        agg = agg[agg["co"] >= int(min_count)]
        if not len(agg):
            return pd.DataFrame(
                {
                    "tok_a": pd.Series([], dtype=object),
                    "tok_b": pd.Series([], dtype=object),
                    "co_df": pd.Series([], dtype=np.int64),
                    "pmi": pd.Series([], dtype=np.float64),
                }
            )
        co = agg["co"].to_numpy(np.int64)
        denom = (agg["df_a"].to_numpy(np.int64) * agg["df_b"].to_numpy(np.int64)).astype(
            np.float64
        )
        q = (co.astype(np.float64) * N) / denom
        uq = np.unique(q)
        ln_by_q = np.array([math.log(v) for v in uq])  # libm, matches ln()
        pmi = round_half_away(ln_by_q[np.searchsorted(uq, q)], 6)
        return pd.DataFrame(
            {
                "tok_a": agg["tok_a"].to_numpy(object),
                "tok_b": agg["tok_b"].to_numpy(object),
                "co_df": co,
                "pmi": pmi,
            }
        )

    kept = docs.map_batches(_kept, batch_format="pyarrow")
    with_df = grouped_map_bucketed(kept, ["token"], _attach_df, B=B)
    pair_parts = grouped_map_bucketed(with_df, ["doc_id"], _pairs, B=B)
    return grouped_map_bucketed(pair_parts, ["tok_a", "tok_b"], _pmi, B=B)


def bm25_topk(
    docs: "ray.data.Dataset",
    query: str,
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
    B: int = 32,
) -> pd.DataFrame:
    """BM25 ranked retrieval over the corpus (the serving-side companion
    of `inverted_index`): top-k documents for a query string, Robertson
    idf = ln((N - df + 0.5)/(df + 0.5) + 1),

      score(d) = sum_t idf(t) * tf*(k1+1) / (tf + k1*(1 - b + b*dl/avgdl))

    ranked by the 6-decimal ROUNDED score (doc_id asc tie-break) so the
    cut is SQL-replayable.

    Shape: the query is tiny — its corpus statistics are the ONLY thing
    collected. Pass 1 computes N, total token count (-> avgdl) and the
    query terms' dfs as B-bounded partials (one bucketed exchange over
    <= |Q| * batches rows). Pass 2 scores every doc locally in
    `map_batches` against the broadcast (df, avgdl, N) — no per-doc
    exchange at all — and keeps a per-block top-k; the driver merges
    <= blocks * k rows. At 100 TB both passes stream; nothing scales
    with the corpus on the driver.

    ln is `math.log` per distinct df (libm — `tfidf_top_terms` note);
    scoring arithmetic replays the oracle's operation order exactly."""
    import math

    import pyarrow as pa

    from graphlite_ray.functions.grouping import grouped_map_bucketed
    from graphlite_ray.functions.rounding import round_half_away

    terms = sorted(set(lower_tokens(query)))
    N = docs.count()

    # ---- pass 1: corpus stats (dl totals + per-term df), one exchange
    def _stats(t: "pa.Table") -> "pa.Table":
        keys: list[str] = []
        vals: list[int] = []
        tot = 0
        dfs = {w: 0 for w in terms}
        for text in t["text"].to_pylist():
            tl = lower_tokens(text)
            tot += len(tl)
            s = set(tl)
            for w in terms:
                if w in s:
                    dfs[w] += 1
        keys.append("\x00dl_total")  # \x00 cannot collide with a token
        vals.append(tot)
        for w in terms:
            keys.append(w)
            vals.append(dfs[w])
        return pa.table(
            {"key": pa.array(keys, pa.string()), "v": pa.array(vals, pa.int64())}
        )

    def _sum(g: pd.DataFrame) -> pd.DataFrame:
        return g.groupby("key", as_index=False)["v"].sum()

    stats = (
        grouped_map_bucketed(
            docs.map_batches(_stats, batch_format="pyarrow"), ["key"], _sum, B=B
        )
        .to_pandas()
        .set_index("key")["v"]
    )
    avgdl = float(stats["\x00dl_total"]) / N
    df_by_term = {w: int(stats.get(w, 0)) for w in terms}
    idf_by_term = {
        w: math.log((N - d + 0.5) / (d + 0.5) + 1.0) for w, d in df_by_term.items()
    }

    # ---- pass 2: local scoring + per-block top-k, driver merges blocks*k
    def _score(t: "pa.Table") -> "pa.Table":
        from collections import Counter

        ids = t["doc_id"].to_numpy(zero_copy_only=False)
        out_id: list[int] = []
        out_s: list[float] = []
        for i, text in enumerate(t["text"].to_pylist()):
            tl = lower_tokens(text)
            if not tl:
                continue
            dl = float(len(tl))
            cnt = Counter(tl)
            s = 0.0
            hit = False
            for w in terms:  # fixed sorted order = the oracle's sum order
                tf = cnt[w]
                if tf:
                    hit = True
                    s += idf_by_term[w] * (
                        (tf * (k1 + 1.0)) / (tf + k1 * (1.0 - b + b * dl / avgdl))
                    )
            if hit:
                out_id.append(int(ids[i]))
                out_s.append(s)
        tb = pd.DataFrame({"doc_id": out_id, "score": round_half_away(out_s, 6)})
        tb = tb.sort_values(["score", "doc_id"], ascending=[False, True]).head(k)
        return pa.Table.from_pandas(
            tb.astype({"doc_id": "int64", "score": "float64"}), preserve_index=False
        )

    parts = docs.map_batches(_score, batch_format="pyarrow").to_pandas()
    return (
        parts.sort_values(["score", "doc_id"], ascending=[False, True])
        .head(k)
        .reset_index(drop=True)
    )
