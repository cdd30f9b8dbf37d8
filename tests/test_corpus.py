"""corpus_clean composite chain: each stage (language filter, quality
floor, exact dedup, token count) must do real, observable work on a
hand-built corpus with known-language texts, a low-quality doc, and
planted exact duplicates."""

import numpy as np
import pandas as pd
import pyarrow as pa

import ray.data

EN = (
    "the quick brown fox jumps over the lazy dog and then the fox runs "
    "into the forest where it finds a quiet place to rest for a while "
    "and the day passes slowly with a warm wind in the trees above"
)
DE = (
    "der schnelle braune fuchs springt und der hund schlaeft unter dem "
    "baum waehrend die sonne langsam untergeht und das licht ist weich "
    "und die voegel singen leise in den zweigen ueber dem alten haus"
)
DIGITS = "12345 67890 " * 20  # alpha_ratio ~ 0 -> quality-filtered


def test_corpus_clean_stages_all_bite():
    from graphlite_ray.pipelines.corpus import corpus_clean

    docs = pd.DataFrame(
        {
            "doc_id": [1, 2, 3, 4, 5],
            "text": [EN, EN, DE, DIGITS, EN + " extra tail words here"],
        }
    )
    ds = ray.data.from_arrow(
        pa.Table.from_pandas(docs, preserve_index=False).replace_schema_metadata(None)
    )
    out = (
        corpus_clean(ds, min_chars=50, min_alpha_ratio=0.7, B=4)
        .to_pandas()
        .sort_values("doc_id", ignore_index=True)
    )
    # doc 3 fails the language filter, doc 4 the quality floor, doc 2 is
    # an exact duplicate of doc 1 (min id survives), docs 1 and 5 remain
    assert out["doc_id"].tolist() == [1, 5]
    assert out["n_tokens"].tolist() == [len(EN.split()), len(EN.split()) + 4]


def test_corpus_clean_dedup_keeps_min_id_across_blocks():
    from graphlite_ray.pipelines.corpus import corpus_clean

    # many re-keyed copies of one text spread over several blocks: the
    # bucketed dedup must still converge on the single global min id
    docs = pd.DataFrame({"doc_id": [50, 9, 23, 117, 4], "text": [EN] * 5})
    ds = ray.data.from_arrow(
        pa.Table.from_pandas(docs, preserve_index=False).replace_schema_metadata(None)
    ).repartition(5)
    out = corpus_clean(ds, min_chars=50, min_alpha_ratio=0.7, B=4).to_pandas()
    assert out["doc_id"].tolist() == [4]
