"""Composite corpus-cleanup pipeline: the canonical training-data prep
chain (language filter -> quality floor -> exact dedup -> token count)
composed from the individual operators in `stages/` — the shape a
Common-Crawl-scale text pipeline actually runs, expressed end-to-end as
one streaming Ray Data graph.

Stage order is the scale-relevant design decision: the cheap stateless
filters run FIRST so the dedup shuffle (the only all-to-all step) moves
only surviving rows; at a 100 TB corpus with typical 40-60% filter rates
that halves the shuffle volume. The reference has no text stages at all
(SURVEY.md §2.8) — this is north-rule ground.
"""

from __future__ import annotations

import pandas as pd

import ray.data

from graphlite_ray.stages.dedup import exact_dedup
from graphlite_ray.stages.textstats import LangId, QualityScorer, TokenCounter


def corpus_clean(
    docs: "ray.data.Dataset",
    lang: str = "en",
    min_chars: int = 120,
    min_alpha_ratio: float = 0.8,
    B: int = 16,
) -> "ray.data.Dataset":
    """(doc_id, text) -> (doc_id, n_tokens) of the cleaned corpus:

      1. keep docs whose LangId prediction == `lang`
      2. keep docs with >= `min_chars` chars and alpha_ratio >=
         `min_alpha_ratio` (QualityScorer features)
      3. exact-dedup by full text (min doc_id survives)
      4. token counts over the survivors (shared tokenization contract)

    Steps 1+2 are ONE fused map_batches (each batch is scored by both
    stages, rows masked once); step 3 is the bucketed content-hash shuffle
    from `exact_dedup` (pass an explicit `B` — the corpus reaching the
    shuffle is a derived dataset, so the byte-estimate auto-sizing would
    execute the pipeline early)."""
    lang_stage, q_stage = LangId(), QualityScorer()

    def _filter(batch: pd.DataFrame) -> pd.DataFrame:
        lg = lang_stage(batch)
        q = q_stage(batch)
        keep = (
            (lg["lang_pred"] == lang)
            & (q["n_chars"] >= min_chars)
            & (q["alpha_ratio"] >= min_alpha_ratio)
        )
        return batch.loc[keep.to_numpy(), ["doc_id", "text"]]

    kept = docs.map_batches(_filter, batch_format="pandas")
    deduped = exact_dedup(kept, B=B)
    return deduped.map_batches(TokenCounter, batch_format="pandas", concurrency=(1, 4))
