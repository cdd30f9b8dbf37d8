"""Training-data operator tests: text stats, dedup family, similarity
search, multimodal plumbing."""

import numpy as np
import pandas as pd
import pytest
import ray.data

from graphlite_ray.stages.dedup import (
    embedding_near_dup,
    exact_dedup,
    jaccard,
    minhash_dedup,
    simhash_dedup,
)
from graphlite_ray.stages.similarity import build_ivf, knn_bruteforce, knn_ivf
from graphlite_ray.stages.textstats import (
    Fingerprinter,
    LangId,
    QualityScorer,
    TokenCounter,
    fingerprint,
    token_count,
)

SF = "/root/testdata/sf0.001"


def _docs(rows):
    return ray.data.from_pandas(pd.DataFrame(rows))


def test_token_count_edge_cases():
    assert token_count("") == 0
    assert token_count("   ") == 0
    assert token_count("a b  c\n d") == 4


def test_textstats_on_real_documents():
    docs = ray.data.read_parquet(f"{SF}/documents.parquet", columns=["doc_id", "text"])
    tok = docs.map_batches(TokenCounter, batch_format="pandas", concurrency=2).take_all()
    assert len(tok) == 500 and all(r["n_tokens"] >= 0 for r in tok)
    q = docs.map_batches(QualityScorer, batch_format="pandas", concurrency=2).take(50)
    for r in q:
        assert 0.0 <= r["quality_score"] <= 1.0
        assert 0.0 <= r["alpha_ratio"] <= 1.0


def test_langid_heuristic():
    rows = [
        {"doc_id": 1, "text": "the cat sat on the mat and it was a good day for all of them"},
        {"doc_id": 2, "text": "der hund ist nicht mit der katze auf der straße und das ist gut"},
        {"doc_id": 3, "text": "数据图节点边页面链接分区流排名消息聚合数据图节点"},
        {"doc_id": 4, "text": ""},
    ]
    out = {r["doc_id"]: r["lang_pred"] for r in _docs(rows).map_batches(LangId, batch_format="pandas", concurrency=1).take_all()}
    assert out == {1: "en", 2: "de", 3: "zh", 4: "und"}


def test_fingerprint_deterministic_and_locality():
    a = "the quick brown fox jumps over the lazy dog " * 10
    assert fingerprint(a) == fingerprint(a)
    assert fingerprint(a) != fingerprint(a[:-20] + "different ending here")
    out = _docs([{"doc_id": 1, "text": a}]).map_batches(
        Fingerprinter, batch_format="pandas", concurrency=1
    ).take_all()
    assert out[0]["fp"] == fingerprint(a) & 0x7FFFFFFFFFFFFFFF


def test_exact_dedup_planted():
    rows = [{"doc_id": i, "text": f"unique text {i}"} for i in range(20)]
    rows += [{"doc_id": 100 + i, "text": "unique text 3"} for i in range(3)]  # dups of 3
    out = exact_dedup(_docs(rows)).to_pandas()
    assert len(out) == 20
    assert 3 in set(out["doc_id"]) and 100 not in set(out["doc_id"])  # min id kept


def test_minhash_dedup_planted():
    base = (
        "large scale web corpora require careful deduplication because near "
        "duplicate documents skew language model training distributions badly "
        "and waste compute on repeated content across many shards of data"
    )
    rows = [{"doc_id": i, "text": f"totally distinct document number {i} about topic "
                                  + " ".join(f"w{i}_{j}" for j in range(30))} for i in range(30)]
    rows.append({"doc_id": 200, "text": base})
    rows.append({"doc_id": 201, "text": base.replace("badly", "poorly")})  # near-dup
    rows.append({"doc_id": 202, "text": base})                              # exact dup
    res = minhash_dedup(_docs(rows), threshold=0.6)
    got_pairs = {tuple(sorted((int(a), int(b)))) for a, b in zip(res.pairs["a"], res.pairs["b"])}
    assert (200, 201) in got_pairs and (200, 202) in got_pairs
    cl = dict(zip(res.clusters["doc_id"], res.clusters["cluster_rep"]))
    assert cl[201] == 200 and cl[202] == 200
    # representatives filter drops non-reps only
    kept = res.representatives(_docs(rows)).to_pandas()
    ids = set(kept["doc_id"])
    assert 200 in ids and 201 not in ids and 202 not in ids and len(ids) == 31
    # verification is exact jaccard
    assert jaccard(base, base) == 1.0


def test_ngram_jaccard_dedup_wrapper():
    """The explicit n-gram-Jaccard operator (higher-resolution banding,
    threshold on EXACT Jaccard) finds a moderate near-dup the default
    minhash banding is tuned away from."""
    from graphlite_ray.stages.dedup import ngram_jaccard_dedup

    base = " ".join(f"word{i}" for i in range(40))
    edited = " ".join(f"word{i}" if i % 8 else f"edit{i}" for i in range(40))
    rows = [{"doc_id": i, "text": " ".join(f"x{i}_{j}" for j in range(30))} for i in range(15)]
    rows += [{"doc_id": 500, "text": base}, {"doc_id": 501, "text": edited}]
    res = ngram_jaccard_dedup(_docs(rows), threshold=0.3)
    pairs = {tuple(sorted((int(a), int(b)))) for a, b in zip(res.pairs["a"], res.pairs["b"])}
    assert (500, 501) in pairs
    score = float(res.pairs.loc[(res.pairs[["a", "b"]].min(axis=1) == 500), "score"].iloc[0])
    from graphlite_ray.stages.dedup import jaccard

    assert score == pytest.approx(jaccard(base, edited), abs=1e-12)  # exact


def test_simhash_dedup_planted():
    words = [f"tok{i}" for i in range(60)]
    base = " ".join(words)
    rows = [{"doc_id": i, "text": " ".join(f"z{i}_{j}" for j in range(40))} for i in range(20)]
    rows.append({"doc_id": 300, "text": base})
    rows.append({"doc_id": 301, "text": base})  # identical -> hamming 0
    res = simhash_dedup(_docs(rows), max_hamming=3)
    pairs = {tuple(sorted((int(a), int(b)))) for a, b in zip(res.pairs["a"], res.pairs["b"])}
    assert (300, 301) in pairs


def test_embedding_near_dup_planted():
    rng = np.random.RandomState(0)
    V = rng.standard_normal((40, 16))
    V[31] = V[30] + 0.001 * rng.standard_normal(16)  # planted near-dup pair
    rows = [{"vec_id": i, "embedding": V[i].astype(np.float32)} for i in range(40)]
    res = embedding_near_dup(_docs(rows), tau=0.99, nbits=6)
    pairs = {tuple(sorted((int(a), int(b)))) for a, b in zip(res.pairs["a"], res.pairs["b"])}
    assert (30, 31) in pairs


def _knn_oracle(V, ids, Q, k):
    Vn = V / np.linalg.norm(V, axis=1, keepdims=True)
    Qn = Q / np.linalg.norm(Q, axis=1, keepdims=True)
    S = Vn @ Qn.T
    out = {}
    for q in range(Q.shape[0]):
        order = sorted(range(len(ids)), key=lambda i: (-S[i, q], ids[i]))[:k]
        out[q] = [int(ids[i]) for i in order]
    return out


def test_knn_bruteforce_exact():
    emb = ray.data.read_parquet(f"{SF}/embeddings.parquet")
    rows = emb.take_all()
    ids = np.array([r["vec_id"] for r in rows])
    V = np.stack([r["embedding"] for r in rows]).astype(np.float64)
    Q = V[:3] + 0.01  # three probe queries
    got = knn_bruteforce(emb, Q, k=5)
    oracle = _knn_oracle(V, ids, Q, 5)
    for q in range(3):
        g = got[got["query_id"] == q].sort_values("rank")["vec_id"].tolist()
        assert g == oracle[q]


def test_knn_ivf_recall():
    emb = ray.data.read_parquet(f"{SF}/embeddings.parquet")
    rows = emb.take_all()
    ids = np.array([r["vec_id"] for r in rows])
    V = np.stack([r["embedding"] for r in rows]).astype(np.float64)
    assigned, C = build_ivf(emb, n_clusters=8, seed=1)
    Q = V[:4]
    got = knn_ivf(assigned, C, Q, k=5, nprobe=4)
    oracle = _knn_oracle(V, ids, Q, 5)
    hits = total = 0
    for q in range(4):
        g = set(got[got["query_id"] == q]["vec_id"].tolist())
        hits += len(g & set(oracle[q]))
        total += 5
    assert hits / total >= 0.6  # approximate path: recall, not exactness


def test_knn_ivf_disk_index(tmp_path):
    from graphlite_ray.stages.similarity import build_ivf_index, knn_ivf_indexed

    emb = ray.data.read_parquet(f"{SF}/embeddings.parquet")
    rows = emb.take_all()
    ids = np.array([r["vec_id"] for r in rows])
    V = np.stack([r["embedding"] for r in rows]).astype(np.float64)
    build_ivf_index(emb, str(tmp_path), n_clusters=8, seed=1)
    import os

    files = [f for f in os.listdir(tmp_path) if f.startswith("cluster_")]
    assert 1 < len(files) <= 8  # index actually sharded by cluster
    Q = V[:4]
    got = knn_ivf_indexed(str(tmp_path), Q, k=5, nprobe=4)
    oracle = _knn_oracle(V, ids, Q, 5)
    hits = sum(
        len(set(got[got["query_id"] == q]["vec_id"]) & set(oracle[q])) for q in range(4)
    )
    assert hits / 20 >= 0.6


def test_multimodal_plumbing():
    from graphlite_ray.stages.multimodal import (
        decode_images,
        featurize_images,
        sample_audio_frames,
        synthetic_media_table,
    )

    media = ray.data.from_pandas(synthetic_media_table(30, real_codecs=False))
    imgs = media.filter(lambda r: r["media_type"] == "image")

    out = decode_images(imgs, deterministic_fake=True).take_all()
    assert len(out) == 10
    for r in out:
        assert r["channels"] == 3 and 16 <= r["height"] < 64

    feats = featurize_images(imgs, dim=16, deterministic_fake=True).take_all()
    assert all(len(r["embedding"]) == 16 for r in feats)

    frames = sample_audio_frames(imgs, deterministic_fake=True).take_all()
    assert all(r["frame_idx"] % 4 == 0 for r in frames)

    # without the fake flag an unknown codec must refuse loudly
    with pytest.raises(Exception) as ei:
        decode_images(imgs, deterministic_fake=False).take_all()
    assert "NotImplementedError" in str(ei.value) or isinstance(
        ei.value, NotImplementedError
    )


def test_multimodal_real_codecs():
    """BMP / WAV / GLRV payloads decode FOR REAL (no fake flag): pixel
    sums, audio frame energies and video frame dims all verifiable from
    the same arrays the encoder embedded."""
    import json

    from graphlite_ray.stages.jpeg import decode_jpeg
    from graphlite_ray.stages.multimodal import (
        PNG_MAGIC,
        decode_bmp,
        decode_images,
        decode_png,
        resize_images,
        sample_audio_frames,
        sample_video_frames,
        synthetic_media_table,
    )

    table = synthetic_media_table(30)  # real BMP/PNG/JPEG/WAV/GLRV payloads
    media = ray.data.from_pandas(table)

    def _img(payload: bytes):
        if payload[:8] == PNG_MAGIC:
            return decode_png(payload)
        if payload[:2] == b"\xff\xd8":
            return decode_jpeg(payload)
        return decode_bmp(payload)

    imgs = media.filter(lambda r: r["media_type"] == "image")
    out = {r["media_id"]: r for r in decode_images(imgs).take_all()}
    for _, row in table[table["media_type"] == "image"].iterrows():
        meta = json.loads(row["meta"])
        got = out[row["media_id"]]
        assert (got["height"], got["width"]) == (meta["h"], meta["w"])
        assert got["pixels_sum"] == int(_img(row["payload"]).sum())

    resized = resize_images(imgs, size=(16, 16)).take_all()
    for r in resized:
        assert (r["height"], r["width"]) == (16, 16)
        assert decode_bmp(bytes(r["payload"])).shape == (16, 16, 3)

    auds = media.filter(lambda r: r["media_type"] == "audio")
    frames = sample_audio_frames(auds, every_n=2).take_all()
    assert len(frames) and all(r["frame_idx"] % 2 == 0 for r in frames)
    assert all(r["energy"] > 0 for r in frames)

    vids = media.filter(lambda r: r["media_type"] == "video")
    vf = sample_video_frames(vids, every_n=2).take_all()
    assert len(vf) and all((r["height"], r["width"]) == (8, 12) for r in vf)


def test_inverted_index_hand_checked(ray_session):
    import pyarrow as pa

    from graphlite_ray.stages.textstats import inverted_index

    docs = ray.data.from_arrow(
        pa.table(
            {
                "doc_id": pa.array([1, 2, 3], pa.int64()),
                "text": ["the cat sat", "The the dog", None],
            }
        )
    )
    out = (
        inverted_index(docs, B=4)
        .to_pandas()
        .sort_values("token", ignore_index=True)
    )
    want = pd.DataFrame(
        {
            "token": ["cat", "dog", "sat", "the"],
            "df": [1, 1, 1, 2],
            "cf": [1, 1, 1, 3],
            "postings": ["1:1", "2:1", "1:1", "1:1,2:2"],
        }
    )
    pd.testing.assert_frame_equal(
        out[["token", "df", "cf", "postings"]].astype({"df": "int64", "cf": "int64"}),
        want.astype({"df": "int64", "cf": "int64"}),
    )


def test_cms_one_sided_and_exact_when_wide(ray_session):
    import pyarrow as pa

    from graphlite_ray.functions.sketches import cms_estimates, cms_token_table
    from graphlite_ray.functions.tokenize import lower_tokens

    texts = ["a b a c", "b b d", "a e", None]
    docs = ray.data.from_arrow(
        pa.table({"doc_id": pa.array([1, 2, 3, 4], pa.int64()), "text": texts})
    )
    true = {}
    for t in texts:
        for tok in lower_tokens(t):
            true[tok] = true.get(tok, 0) + 1

    # tight width -> collisions; estimates are NEVER below the truth
    cms = cms_token_table(docs, width=2, depth=2, B=2).to_pandas()
    est = cms_estimates(cms, sorted(true), 2, 2)
    assert all(
        int(n) >= true[t] for t, n in zip(est["token"], est["n_est"])
    )

    # wide sketch -> no collisions -> exact counts
    cms2 = cms_token_table(docs, width=4096, depth=3, B=2).to_pandas()
    est2 = cms_estimates(cms2, sorted(true), 4096, 3)
    assert {t: int(n) for t, n in zip(est2["token"], est2["n_est"])} == true
