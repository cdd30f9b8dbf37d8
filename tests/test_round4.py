"""Round-4 additions: shared tokenization contract, unified rounding,
wavefront PNG unfiltering, distributed simhash verify, multi-table
embedding LSH, auto-sized buckets, IVF recall, bulk k-NN merge."""

from __future__ import annotations

import struct
import zlib

import numpy as np
import pandas as pd
import pytest


# ------------------------------------------------ tokenization contract


def test_tokenize_contract_matches_duckdb_on_exotic_whitespace():
    """The ONE tokenization definition (functions/tokenize.py) must agree
    between the Python stages and the DuckDB oracles on every whitespace
    kind — including the non-ASCII whitespace where str.split() and RE2
    '\\s' historically diverged (ADVICE r3)."""
    import duckdb

    from graphlite_ray.functions.tokenize import SQL_WS_SPLIT, tokens

    cases = [
        "plain ascii words",
        "tab\tand\nnewline\rand\fform\x0bvtab",
        "nbsp\xa0joined",  # NBSP is NOT a separator under the contract
        "line sep",  # U+2028 is NOT a separator either
        "  leading and trailing  ",
        "",
        " \t\n ",
        "one",
    ]
    con = duckdb.connect()
    for t in cases:
        got = con.execute(
            f"SELECT list_filter(regexp_split_to_array(?, '{SQL_WS_SPLIT}'), "
            "x -> x <> '')",
            [t],
        ).fetchone()[0]
        assert got == tokens(t), t
    assert tokens(None) == []


def test_token_stages_null_safe():
    from graphlite_ray.functions.tokenize import lower_tokens
    from graphlite_ray.stages.textstats import token_count

    assert token_count(None) == 0
    assert lower_tokens(None) == []
    assert lower_tokens("A\tB") == ["a", "b"]


# ------------------------------------------------------- rounding helper


def test_round_half_away_matches_duckdb_round():
    import duckdb

    import __ray_entry__ as E

    vals = [0.5e-6, 1.5e-6, 2.5e-6, -0.5e-6, -1.5e-6, 0.1234565, -0.1234565,
            1.0, 0.0, -2.0000005]
    s = pd.Series(vals)
    got = E._round_half_away(s, 6)
    con = duckdb.connect()
    for v, g in zip(vals, got):
        (want,) = con.execute("SELECT ROUND(?::DOUBLE, 6)", [v]).fetchone()
        assert g == pytest.approx(want, abs=0), (v, g, want)


# ------------------------------------------------------ PNG wavefront


def _forward_filter_png(img: np.ndarray, filt_choice) -> bytes:
    from graphlite_ray.stages.multimodal import PNG_MAGIC, _paeth, _png_chunk

    h, w, _ = img.shape
    flat = img.reshape(h, w * 3).astype(np.int16)
    raw = b""
    prior = np.zeros(w * 3, np.int16)
    for y in range(h):
        f = filt_choice(y)
        row = flat[y]
        left = np.concatenate([np.zeros(3, np.int16), row[:-3]])
        pl = np.concatenate([np.zeros(3, np.int16), prior[:-3]])
        if f == 0:
            filt = row
        elif f == 1:
            filt = row - left
        elif f == 2:
            filt = row - prior
        elif f == 3:
            filt = row - (left + prior) // 2
        else:
            filt = row - _paeth(
                left.astype(np.uint8), prior.astype(np.uint8), pl.astype(np.uint8)
            ).astype(np.int16)
        raw += bytes([f]) + (filt % 256).astype(np.uint8).tobytes()
        prior = row
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    return (
        PNG_MAGIC
        + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"IDAT", zlib.compress(raw))
        + _png_chunk(b"IEND", b"")
    )


@pytest.mark.parametrize(
    "choice",
    [lambda y: 4, lambda y: 3, lambda y: (3 if y % 2 else 4), lambda y: y % 5],
    ids=["all_paeth", "all_avg", "mixed_run", "cycled"],
)
def test_png_wavefront_unfilter_exact(choice):
    from graphlite_ray.stages.multimodal import decode_png

    rng = np.random.RandomState(11)
    img = rng.randint(0, 256, size=(41, 29, 3)).astype(np.uint8)
    assert (decode_png(_forward_filter_png(img, choice)) == img).all()


def test_png_paeth_512_fast_and_exact():
    """The r3 per-pixel Paeth loop was ~1M interpreter iterations on a
    512^2 image; the wavefront does it in ~1k vectorized steps. Bound is
    generous (5x the measured ~0.1 s) to stay green on a noisy VM while
    still catching a fallback to per-pixel (~10 s)."""
    import time

    from graphlite_ray.stages.multimodal import decode_png

    rng = np.random.RandomState(3)
    img = rng.randint(0, 256, size=(512, 512, 3)).astype(np.uint8)
    payload = _forward_filter_png(img, lambda y: 4)
    decode_png(payload)  # warm
    t0 = time.perf_counter()
    out = decode_png(payload)
    dt = time.perf_counter() - t0
    assert (out == img).all()
    assert dt < 0.5, f"paeth unfilter took {dt:.2f}s — per-pixel loop regression?"


# ------------------------------------------- simhash distributed verify


def _ray_docs(rows):
    import ray.data

    return ray.data.from_pandas(pd.DataFrame(rows))


def test_simhash_verify_is_distributed_and_exact(ray_session):
    """The Hamming verify now runs inside the band-bucket tasks; the
    driver result must equal a brute-force all-pairs Hamming check."""
    import pyarrow as pa

    from graphlite_ray.stages.dedup import SimHasher, hamming64, simhash_dedup

    rng = np.random.RandomState(5)
    words = [f"w{i}" for i in range(400)]
    rows = []
    for i in range(40):
        toks = list(rng.choice(words, size=60))
        rows.append({"doc_id": i, "text": " ".join(toks)})
        if i % 4 == 0:  # planted near-dup: small edit
            edited = toks.copy()
            edited[0] = "CHANGED"
            rows.append({"doc_id": 1000 + i, "text": " ".join(edited)})
    res = simhash_dedup(_ray_docs(rows), max_hamming=3)

    # brute force over the same signatures
    sh = SimHasher()(pa.Table.from_pylist(rows)).to_pandas()
    sims = sh["simhash"].to_numpy()
    ids = sh["doc_id"].to_numpy()
    i, j = np.triu_indices(len(ids), k=1)
    d = hamming64(sims[i], sims[j])
    keep = d <= 3
    want = {
        tuple(sorted((int(a), int(b))))
        for a, b in zip(ids[i][keep], ids[j][keep])
    }
    got = {tuple(sorted((int(a), int(b)))) for a, b in zip(res.pairs["a"], res.pairs["b"])}
    assert got == want and len(want) >= 5
    assert res.n_candidates >= len(want)


def test_minhash_bucket_guard_raises_not_truncates(ray_session):
    """A band bucket over max_group used to be silently truncated (silent
    under-dedup); it must raise with actionable guidance now."""
    from graphlite_ray.stages.dedup import minhash_dedup

    # 30 identical docs collide in every band; guard set below that
    rows = [
        {"doc_id": i, "text": "identical boilerplate words " * 5} for i in range(30)
    ]
    import ray.data

    docs = ray.data.from_pandas(pd.DataFrame(rows))
    with pytest.raises(RuntimeError, match="max_group"):
        # reach into the bucket stage via a tiny max through the pipeline:
        # minhash_dedup exposes no max_group knob, so patch the default
        from graphlite_ray.stages import dedup as D

        band_rows = docs.map_batches(
            D.MinHashBander,
            fn_constructor_kwargs={"num_perm": 64, "bands": 16, "k": 3},
            batch_format="pyarrow",
            concurrency=1,
        )
        from graphlite_ray.functions.grouping import grouped_map_bucketed

        grouped_map_bucketed(
            band_rows,
            ["band", "band_hash"],
            lambda g: D._pairs_from_bucket_frame(
                g, ["band", "band_hash"], "doc_id", max_group=10
            ),
            B=4,
        ).to_pandas()


def test_simhash_band_collision_guard_raises(ray_session):
    """Templated pages collide whole 16-bit bands; the per-bucket pair
    guard must raise instead of enumerating the quadratic pair list."""
    from graphlite_ray.stages.dedup import simhash_dedup

    # identical docs: every band collides, C(40,2)=780 pairs > guard of 100
    rows = [{"doc_id": i, "text": "the same boilerplate page"} for i in range(40)]
    with pytest.raises(RuntimeError, match="max_band_pairs"):
        simhash_dedup(_ray_docs(rows), max_hamming=3, max_band_pairs=100)


# ------------------------------------- multi-table LSH OR-amplification


def _planted_emb_ds(n=800, d=64, n_pairs=60, cos=0.75, seed=0):
    import pyarrow as pa
    import ray.data

    rng = np.random.RandomState(seed)
    V = rng.standard_normal((n, d)).astype(np.float64)
    extra = []
    for i in range(n_pairs):
        v = V[i] / np.linalg.norm(V[i])
        r = rng.standard_normal(d)
        r -= (r @ v) * v
        r /= np.linalg.norm(r)
        extra.append((cos * v + np.sqrt(1 - cos * cos) * r) * np.linalg.norm(V[i]))
    Vall = np.vstack([V, np.array(extra)]).astype(np.float32)
    ids = np.concatenate([np.arange(n), np.arange(n_pairs) + 1_000_000]).astype(np.int64)
    t = pa.table(
        {
            "vec_id": pa.array(ids),
            "embedding": pa.FixedSizeListArray.from_arrays(
                pa.array(Vall.reshape(-1), pa.float32()), d
            ),
        }
    )
    return ray.data.from_arrow(t)


def test_lsh_amplification_recall_and_precision(ray_session):
    """Single-table hyperplane LSH is unusable at tau=0.7 (measured ~0.01
    recall in r3); 16 OR-combined tables at nbits=8 must reach >=0.8
    recall on planted cos-0.75 pairs while exact verification keeps
    precision 1.0."""
    from graphlite_ray.stages.dedup import embedding_near_dup, embedding_near_dup_exact

    ds = _planted_emb_ds()
    e = set(map(tuple, embedding_near_dup_exact(ds, tau=0.7).pairs[["a", "b"]].to_numpy()))
    lsh = embedding_near_dup(ds, tau=0.7, nbits=8, n_tables=16)
    l = set(map(tuple, lsh.pairs[["a", "b"]].to_numpy()))
    assert len(e) >= 60
    assert len(l & e) / len(e) >= 0.8, f"recall {len(l & e) / len(e):.3f}"
    assert l <= e  # exact within-bucket verify -> precision 1.0
    assert (lsh.pairs["score"] >= 0.7).all()


def test_emb_exact_guard_raises_over_max_rows(ray_session):
    """The fused guard (limited take_all) must still raise on an
    oversized corpus without materializing more than max_rows+1 rows."""
    from graphlite_ray.stages.dedup import embedding_near_dup_exact

    ds = _planted_emb_ds(n=50, d=8, n_pairs=2)
    with pytest.raises(RuntimeError, match="broadcast-exact baseline"):
        embedding_near_dup_exact(ds, tau=0.9, max_rows=10)


def test_lsh_query_pairs_nonempty_subset_of_exact(ray_session):
    """The driver query emb_near_dup_lsh must emit verified rows (the r3
    version returned 0 rows at tau=0.98 — zero evidential value) and be a
    subset of the exact pairs over the identical planted corpus."""
    import __ray_entry__ as E
    from graphlite_ray.stages.dedup import embedding_near_dup_exact

    sf = "/root/testdata/sf0.001"
    got = E.queries()["emb_near_dup_lsh"](sf)
    assert len(got) > 0, "LSH query returned 0 rows again"
    exact = embedding_near_dup_exact(E._planted_near_dup_corpus(sf), tau=0.7)
    e = set(map(tuple, exact.pairs[["a", "b"]].to_numpy()))
    g = set(map(tuple, got[["a", "b"]].to_numpy()))
    assert g and g <= e
    # the planted pairs give a known recall floor for the amplified regime
    planted = {p for p in e if p[1] - p[0] == 10_000_000}
    assert len(g & planted) / max(len(planted), 1) >= 0.8


# ----------------------------------------------------- auto bucket count


def test_auto_bucket_count_grows_with_data(ray_session, tmp_path):
    """Small corpus keeps today's default B; an oversized one must pick
    B > 64 automatically (target bytes per bucket scaled down so the test
    corpus counts as 'oversized' without writing gigabytes)."""
    import pyarrow as pa
    import pyarrow.parquet as pq
    import ray.data

    from graphlite_ray.functions.grouping import auto_bucket_count

    t = pa.table(
        {
            "doc_id": np.arange(5000, dtype=np.int64),
            "text": ["x" * 200 for _ in range(5000)],
        }
    )
    path = str(tmp_path / "docs.parquet")
    pq.write_table(t, path)
    ds = ray.data.read_parquet(path)
    assert auto_bucket_count(ds) == 64  # ~1 MB corpus: default unchanged
    B = auto_bucket_count(ds, target_bytes_per_bucket=4096)
    assert B > 64
    assert auto_bucket_count(ds, target_bytes_per_bucket=1) == 4096  # capped


def test_exact_dedup_auto_B_still_exact(ray_session, tmp_path):
    import pyarrow as pa
    import pyarrow.parquet as pq
    import ray.data

    from graphlite_ray.stages.dedup import exact_dedup

    t = pa.table(
        {
            "doc_id": np.arange(200, dtype=np.int64),
            "text": [f"doc {i % 50}" for i in range(200)],  # 50 distinct
        }
    )
    path = str(tmp_path / "docs.parquet")
    pq.write_table(t, path)
    ds = ray.data.read_parquet(path)
    out = exact_dedup(ds, target_bytes_per_bucket=2048).to_pandas()
    assert len(out) == 50
    assert sorted(out["doc_id"]) == list(range(50))  # min id per text


# -------------------------------------- IVF v2 (kmeans++ / replicas) + bulk k-NN


def _rand_emb_ds(n=3000, d=32, seed=0):
    import pyarrow as pa
    import ray.data

    rng = np.random.RandomState(seed)
    V = rng.standard_normal((n, d)).astype(np.float32)
    t = pa.table(
        {
            "vec_id": pa.array(np.arange(n, dtype=np.int64)),
            "embedding": pa.FixedSizeListArray.from_arrays(pa.array(V.reshape(-1)), d),
        }
    )
    return ray.data.from_arrow(t), V


def test_replicated_ivf_index_exact_at_full_probe(ray_session, tmp_path):
    """With every cluster probed, the replicas=2 disk index must return
    EXACTLY the brute-force result — duplicates from multi-assignment are
    deduped per block and in the final merge, never costing top-k slots."""
    from graphlite_ray.stages.similarity import (
        build_ivf_index,
        knn_bruteforce,
        knn_ivf_indexed,
    )

    ds, V = _rand_emb_ds()
    Q = V[:5].astype(np.float64)
    exact = knn_bruteforce(ds, Q, k=10)
    idx = str(tmp_path / "ivf")
    build_ivf_index(ds, idx, n_clusters=8, replicas=2)
    ivf = knn_ivf_indexed(idx, Q, k=10, nprobe=8)
    for qid in range(5):
        e = exact[exact["query_id"] == qid]["vec_id"].tolist()
        i = ivf[ivf["query_id"] == qid]["vec_id"].tolist()
        assert e == i  # same ids, same rank order


def test_ivf_recall_at_low_nprobe(ray_session, tmp_path):
    """The r4 target: recall@10 >= 0.8 at nprobe=4 of 16 clusters on a
    near-uniform corpus (kmeans++ seeding + replicas=2; r3 measured 0.67
    with random seeding and single assignment)."""
    from graphlite_ray.stages.similarity import (
        build_ivf_index,
        knn_bruteforce,
        knn_ivf_indexed,
    )

    ds, V = _rand_emb_ds(n=4000, d=32, seed=3)
    Q = V[10:16].astype(np.float64)
    exact = knn_bruteforce(ds, Q, k=10)
    idx = str(tmp_path / "ivf")
    build_ivf_index(ds, idx, n_clusters=16, replicas=2)
    ivf = knn_ivf_indexed(idx, Q, k=10, nprobe=4)
    hits = total = 0
    for qid in range(6):
        e = set(exact[exact["query_id"] == qid]["vec_id"])
        i = set(ivf[ivf["query_id"] == qid]["vec_id"])
        hits, total = hits + len(e & i), total + len(e)
    assert hits / total >= 0.8, f"recall {hits / total:.3f}"


def test_knn_bruteforce_bulk_queries_bucketed_merge(ray_session):
    """10k queries through the bucketed final merge (the r3 per-key
    map_groups would make 10k interpreter calls); spot-check exactness
    against numpy on a sample of queries."""
    from graphlite_ray.stages.similarity import knn_bruteforce

    ds, V = _rand_emb_ds(n=2000, d=16, seed=7)
    rng = np.random.RandomState(8)
    Q = rng.standard_normal((10_000, 16))
    out = knn_bruteforce(ds, Q, k=5)
    assert len(out) == 10_000 * 5
    assert out.groupby("query_id")["rank"].apply(list).map(
        lambda r: r == [1, 2, 3, 4, 5]
    ).all()
    Vn = V / np.linalg.norm(V, axis=1, keepdims=True)
    Qn = Q / np.linalg.norm(Q, axis=1, keepdims=True)
    for qid in [0, 137, 9999]:
        S = Vn.astype(np.float64) @ Qn[qid]
        want = np.lexsort((np.arange(len(S)), -S))[:5]
        got = out[out["query_id"] == qid].sort_values("rank")["vec_id"].to_numpy()
        assert list(got) == list(want)


# ------------------------------------------- write_formatted collision


def test_write_formatted_keeps_duplicate_content_blocks(ray_session, tmp_path):
    """Two distinct blocks rendering identical text must both land on
    disk (pure content-hash names silently merged them), and the manifest
    line count must equal the lines actually on disk."""
    import ray.data

    from graphlite_ray.sources.formatters import write_formatted
    from graphlite_ray.state import storage

    # two single-row blocks with identical content
    dfs = [pd.DataFrame({"vertex_id": [7], "value": [0.5]}) for _ in range(2)]
    ds = ray.data.from_pandas(dfs)  # one block per frame
    out = str(tmp_path / "shards")
    manifest = write_formatted(ds, out)
    assert int(manifest["n_lines"].sum()) == 2
    files = [n for n in storage.listdir(out) if n.startswith("part-")]
    on_disk = sum(
        len(storage.read_text(storage.join(out, n)).splitlines()) for n in files
    )
    assert on_disk == 2, f"{on_disk} lines on disk, manifest says 2"
    # orphan reconciliation: a leftover file not in the manifest is removed
    storage.write_text(storage.join(out, "part-deadbeef-orphan.txt"), "junk\n")
    manifest2 = write_formatted(ds, out)
    files2 = [n for n in storage.listdir(out) if n.startswith("part-")]
    assert sorted(files2) == sorted(manifest2["path"])


# -------------------------------- repetition signals + decontamination


def test_repetition_scorer_known_values():
    from graphlite_ray.stages.textstats import RepetitionScorer

    out = RepetitionScorer()(
        pd.DataFrame(
            {
                "doc_id": [1, 2, 3, 4],
                "text": [
                    "a a a a",          # 1 distinct of 4; bigram 'a a' 3/3
                    "w x y z",          # all distinct; every bigram once 1/3
                    "",                 # empty -> 0, 0
                    "solo",             # 1 token -> dup 0, no bigrams
                ],
            }
        )
    )
    assert out["dup_token_frac"].tolist() == [0.75, 0.0, 0.0, 0.0]
    assert out["top_bigram_frac"].tolist() == [1.0, 1.0 / 3.0, 0.0, 0.0]


def test_decontaminate_drops_planted_overlap(ray_session):
    """A training doc sharing most 5-grams with a benchmark doc must be
    dropped; unrelated docs must survive."""
    import ray.data

    from graphlite_ray.stages.contamination import decontaminate

    bench_text = "the quick brown fox jumps over the lazy dog tonight"
    rows = [
        {"doc_id": 1, "text": bench_text + " extra tail words here"},  # contaminated
        {"doc_id": 2, "text": "completely different tokens about graphs and rays"},
        {"doc_id": 3, "text": "another clean document with its own vocabulary set"},
    ]
    docs = ray.data.from_pandas(pd.DataFrame(rows))
    bench = ray.data.from_pandas(pd.DataFrame([{"doc_id": 100, "text": bench_text}]))
    kept = decontaminate(docs, bench, threshold=0.3, k=5).to_pandas()
    assert sorted(kept["doc_id"]) == [2, 3]


def test_contamination_scores_exact_fraction(ray_session):
    import ray.data

    from graphlite_ray.stages.contamination import (
        benchmark_shingle_hashes,
        contamination_scores,
    )
    from graphlite_ray.stages.dedup import word_shingles

    bench_text = "b1 b2 b3 b4 b5 b6"
    doc_text = "b1 b2 b3 b4 b5 x1 x2 x3 x4 x5"
    bench = ray.data.from_pandas(pd.DataFrame([{"doc_id": 0, "text": bench_text}]))
    docs = ray.data.from_pandas(pd.DataFrame([{"doc_id": 1, "text": doc_text}]))
    h = benchmark_shingle_hashes(bench, k=5)
    out = contamination_scores(docs, h, k=5).to_pandas()
    doc_sh = set(word_shingles(doc_text, 5))
    bench_sh = set(word_shingles(bench_text, 5))
    want = len(doc_sh & bench_sh) / len(doc_sh)
    assert out["contaminated_frac"].iloc[0] == want > 0


# ------------------------------------------------------ PII scrubbing


def test_pii_scan_and_redact_roundtrip(ray_session):
    import ray.data

    from graphlite_ray.stages.pii import redact_pii, scan_pii

    rows = [
        {
            "doc_id": 1,
            "text": "mail me at jo.doe+x@sub.example.org or 555-123-4567 "
            "from 10.0.0.1 thanks",
        },
        {"doc_id": 2, "text": "no personal data in this one at all"},
        {"doc_id": 3, "text": "two mails a@b.co c@d.io and ip 192.168.1.255"},
    ]
    docs = ray.data.from_arrow(
        __import__("pyarrow").table(
            {
                "doc_id": [r["doc_id"] for r in rows],
                "text": [r["text"] for r in rows],
            }
        )
    )
    scan = scan_pii(docs).to_pandas().sort_values("doc_id", ignore_index=True)
    assert scan["n_email"].tolist() == [1, 0, 2]
    assert scan["n_phone"].tolist() == [1, 0, 0]
    assert scan["n_ipv4"].tolist() == [1, 0, 1]
    red = redact_pii(docs).to_pandas().sort_values("doc_id", ignore_index=True)
    assert red["n_redactions"].tolist() == [3, 0, 3]
    assert "<EMAIL>" in red["text"].iloc[0] and "<PHONE>" in red["text"].iloc[0]
    assert "jo.doe" not in red["text"].iloc[0]
    assert "10.0.0.1" not in red["text"].iloc[0]
    # scrubbed corpus has no remaining matches
    assert (scan_pii(ray.data.from_pandas(red[["doc_id", "text"]]))
            .to_pandas()[["n_email", "n_phone", "n_ipv4"]].to_numpy().sum() == 0)


def test_png_corrupt_payloads_raise_value_error():
    from graphlite_ray.stages.multimodal import PNG_MAGIC, _png_chunk, decode_png

    with pytest.raises(ValueError, match="no IHDR"):
        decode_png(
            PNG_MAGIC
            + _png_chunk(b"IDAT", zlib.compress(b"\x00abc"))
            + _png_chunk(b"IEND", b"")
        )
    ihdr = struct.pack(">IIBBBBB", 4, 4, 8, 2, 0, 0, 0)
    with pytest.raises(ValueError, match="inflated IDAT"):
        decode_png(
            PNG_MAGIC
            + _png_chunk(b"IHDR", ihdr)
            + _png_chunk(b"IDAT", zlib.compress(b"\x00short"))
            + _png_chunk(b"IEND", b"")
        )


def test_span_dedup_planted_spans(ray_session):
    """Keep-first rule on planted cross-doc and within-doc duplicate spans,
    partial last chunks, and empty/whitespace docs."""
    import ray
    import pyarrow as pa

    from graphlite_ray.stages.dedup import span_dedup

    shared = " ".join(f"s{i}" for i in range(8))  # one exact 8-token chunk
    docs = ray.data.from_arrow(
        pa.table(
            {
                "doc_id": pa.array([0, 1, 2, 3, 4], pa.int64()),
                "text": [
                    shared + " " + " ".join(f"a{i}" for i in range(8)),  # 2 chunks
                    shared + " tailword",  # chunk0 dup of doc0, chunk1 partial unique
                    shared + " " + shared,  # within-doc repeat: 2nd occurrence dropped
                    "",  # no tokens
                    "   \t  ",  # whitespace only
                ],
            }
        )
    )
    out = (
        span_dedup(docs, chunk_tokens=8, B=4)
        .to_pandas()
        .sort_values("doc_id", ignore_index=True)
    )
    assert out["doc_id"].tolist() == [0, 1, 2, 3, 4]
    assert out["n_chunks"].tolist() == [2, 2, 2, 0, 0]
    # doc0 owns both its chunks (smallest (doc_id,pos) for `shared`);
    # doc1 loses the shared chunk, keeps its partial tail; doc2 loses both
    # occurrences (doc0 owns the text corpus-wide).
    assert out["kept_chunks"].tolist() == [2, 1, 0, 0, 0]


def test_tfidf_top_terms_known_values(ray_session):
    """tf/df/idf on a 3-doc corpus with hand-checkable values; ranking on
    the rounded score with token tie-break; token-less doc contributes to
    N but emits no rows."""
    import math

    import ray
    import pyarrow as pa

    from graphlite_ray.stages.textstats import tfidf_top_terms

    docs = ray.data.from_arrow(
        pa.table(
            {
                "doc_id": pa.array([0, 1, 2], pa.int64()),
                "text": [
                    "apple apple banana",
                    "apple cherry",
                    "",  # token-less: counts toward N only
                ],
            }
        )
    )
    out = (
        tfidf_top_terms(docs, k=2, B=4, n_docs=3)
        .to_pandas()
        .sort_values(["doc_id", "score", "token"], ascending=[True, False, True])
        .reset_index(drop=True)
    )
    # doc0: apple tf=2 df=2 -> 2*ln(1.5); banana tf=1 df=1 -> ln(3)
    # doc1: cherry tf=1 df=1 -> ln(3); apple tf=1 df=2 -> ln(1.5)
    assert out["doc_id"].tolist() == [0, 0, 1, 1]
    assert out["token"].tolist() == ["banana", "apple", "cherry", "apple"]
    assert out["tf"].tolist() == [1, 2, 1, 1]
    assert out["df"].tolist() == [1, 2, 1, 2]
    from graphlite_ray.functions.rounding import round_half_away

    exp = [math.log(3.0), 2 * math.log(1.5), math.log(3.0), math.log(1.5)]
    assert out["score"].tolist() == list(round_half_away(exp, 6))


def test_random_walks_brute_force_replay(ray_session, work_dir):
    """RandomWalks hop-for-hop vs a Python replay of the documented mixer
    on a hand-built graph with parallel edges and a dead end; the trace
    must also survive resume from the completed checkpoint (the engine's
    early return keeps only the FINAL aggregator state)."""
    import numpy as np

    from graphlite_ray.pipelines.linkgraph import run_on_edges
    from graphlite_ray.pipelines.walks import walk_trace
    from graphlite_ray.programs import RandomWalks

    # 9 is a dead end; 0 -> 2 is a parallel edge (multiset multiplicity)
    src = np.array([0, 0, 0, 1, 2, 2, 3, 4, 1], np.int64)
    dst = np.array([1, 2, 2, 3, 0, 3, 4, 0, 9], np.int64)
    seeds, length = [0, 2, 9], 5

    def replay():
        nbrs = {}
        for s_, d_ in zip(src.tolist(), dst.tolist()):
            nbrs.setdefault(s_, []).append(d_)
        for v in nbrs:
            nbrs[v].sort()
        rows = []
        for w, v in enumerate(seeds):
            rows.append((w, 0, v))
            for s_ in range(length):
                out = nbrs.get(v, [])
                if not out:
                    break
                h = ((w * 1000003 + s_) % 2**32 * 2654435761 + (v % 2**32) * 40503) % 2**32
                v = out[h % len(out)]
                rows.append((w, s_ + 1, v))
        return sorted(rows)

    res = run_on_edges(
        RandomWalks(seeds=seeds, length=length), src, dst, work_dir, P=2
    )
    got = walk_trace(res)
    exp = replay()
    assert list(map(tuple, got.to_numpy())) == exp
    # dead-end walk 2 stops at step 0; walks 0 and 1 run to full length
    # (trails hand-checked: 0->1->3->4->0->2 and 2->3->4->0->1->3)
    assert got.groupby("walk_id").size().tolist() == [length + 1, length + 1, 1]

    res2 = run_on_edges(
        RandomWalks(seeds=seeds, length=length), src, dst, work_dir, P=2, resume=True
    )
    assert res2.halted and res2.supersteps_run == 0  # early return, no actors
    assert walk_trace(res2).equals(got)


def test_lm_score_hand_checked(ray_session):
    """Bigram LM scores on a 3-doc corpus vs hand arithmetic; the 1-token
    doc contributes to the vocabulary but emits no row."""
    import math

    import ray
    import pyarrow as pa

    from graphlite_ray.functions.rounding import round_half_away
    from graphlite_ray.stages.textstats import lm_score, vocab_size

    docs = ray.data.from_arrow(
        pa.table(
            {
                "doc_id": pa.array([0, 1, 2], pa.int64()),
                "text": ["a b a", "b a", "c"],
            }
        )
    )
    assert vocab_size(docs, B=4) == 3  # {a, b, c}
    out = lm_score(docs, alpha=0.5, B=4).to_pandas().sort_values(
        "doc_id", ignore_index=True
    )
    # corpus: c(a,b)=1 c(b,a)=2; ctx a=1 b=2; V=3, aV=1.5
    lp_ab = math.log((1 + 0.5) / (1 + 1.5))
    lp_ba = math.log((2 + 0.5) / (2 + 1.5))
    assert out["doc_id"].tolist() == [0, 1]
    assert out["n_bigrams"].tolist() == [2, 1]
    exp = [(lp_ab + lp_ba) / 2.0, lp_ba]
    assert out["avg_logp"].tolist() == list(round_half_away(exp, 6))


# --------------------------------------------------------- baseline JPEG


def test_jpeg_huffman_tables_complete():
    """The embedded Annex-K AC tables must cover exactly EOB + ZRL + every
    (run 0-15, size 1-10) combination — a mistyped entry would fail encode
    of some coefficient pattern."""
    from graphlite_ray.stages.jpeg import AC_CHROM_VALS, AC_LUM_VALS, ZIGZAG

    want = {0x00, 0xF0} | {(r << 4) | s for r in range(16) for s in range(1, 11)}
    assert set(AC_LUM_VALS) == want and len(AC_LUM_VALS) == 162
    assert set(AC_CHROM_VALS) == want and len(AC_CHROM_VALS) == 162
    assert sorted(ZIGZAG.tolist()) == list(range(64))
    assert ZIGZAG[:6].tolist() == [0, 1, 8, 16, 9, 2]


@pytest.mark.parametrize("sub", [False, True], ids=["444", "420"])
@pytest.mark.parametrize("ri", [0, 3], ids=["no_rst", "rst3"])
def test_jpeg_decode_matches_encoder_reconstruction(sub, ri):
    """decode_jpeg must reproduce the encoder's own coefficient
    reconstruction BIT-exactly (markers, Huffman, DC prediction, zigzag,
    restart handling) on odd dims that force edge padding."""
    from graphlite_ray.stages.jpeg import decode_jpeg, encode_jpeg

    rng = np.random.RandomState(13)
    img = rng.randint(0, 256, size=(21, 35, 3)).astype(np.uint8)
    payload, recon = encode_jpeg(
        img, quality=80, subsample=sub, restart_interval=ri, return_recon=True
    )
    assert (decode_jpeg(payload) == recon).all()


def test_jpeg_lossy_fidelity_on_smooth_image():
    """PSNR sanity on a natural-ish gradient: lossy, but faithful."""
    from graphlite_ray.stages.jpeg import decode_jpeg, encode_jpeg

    xx, yy = np.meshgrid(np.arange(64), np.arange(48))
    img = np.stack([(xx * 2) % 256, (yy * 3) % 256, (xx + yy) % 256], -1).astype(
        np.uint8
    )
    dec = decode_jpeg(encode_jpeg(img, quality=90))
    mse = ((dec.astype(np.float64) - img) ** 2).mean()
    psnr = 10 * np.log10(255.0**2 / mse)
    assert psnr > 35.0, psnr


def test_jpeg_boundaries_raise():
    from graphlite_ray.stages.jpeg import decode_jpeg

    with pytest.raises(NotImplementedError, match="SOF2"):
        decode_jpeg(b"\xff\xd8\xff\xc2\x00\x0b" + b"\x08" * 9)
    with pytest.raises(ValueError, match="SOI"):
        decode_jpeg(b"not a jpeg")
    with pytest.raises(ValueError):
        # valid headers, truncated entropy data
        from graphlite_ray.stages.jpeg import encode_jpeg

        img = np.zeros((16, 16, 3), np.uint8)
        img[::2, ::2] = 255  # force non-trivial entropy data
        payload = encode_jpeg(img)
        decode_jpeg(payload[:-24])


def test_image_decoder_routes_jpeg(ray_session):
    """The ImageDecoder stage auto-detects JPEG payloads next to BMP/PNG
    and the media sidecar's psum is reproduced from the bitstream."""
    import json

    from graphlite_ray.stages.multimodal import ImageDecoder, synthetic_media_table

    tbl = synthetic_media_table(60)
    imgs = tbl[tbl.media_type == "image"].reset_index(drop=True)
    codecs = {json.loads(m)["codec"] for m in imgs["meta"]}
    assert codecs == {"bmp", "png", "jpeg"}
    out = ImageDecoder()(imgs)
    for _, row in out.merge(imgs, on="media_id").iterrows():
        m = json.loads(row["meta"])
        assert (row["height"], row["width"]) == (m["h"], m["w"])
        assert row["pixels_sum"] == m["psum"], m["codec"]


# ------------------------------------------------------------------- SCC


def _kosaraju(src, dst):
    import collections

    adj, radj = collections.defaultdict(list), collections.defaultdict(list)
    verts = sorted(set(src) | set(dst))
    for s, d in zip(src, dst):
        adj[s].append(d)
        radj[d].append(s)
    seen, order = set(), []
    for v in verts:
        if v in seen:
            continue
        stack = [(v, iter(adj[v]))]
        seen.add(v)
        while stack:
            u, it = stack[-1]
            for w in it:
                if w not in seen:
                    seen.add(w)
                    stack.append((w, iter(adj[w])))
                    break
            else:
                order.append(u)
                stack.pop()
    comp = {}
    for v in reversed(order):
        if v in comp:
            continue
        stack, members = [v], [v]
        comp[v] = None
        while stack:
            u = stack.pop()
            for w in radj[u]:
                if w not in comp:
                    comp[w] = None
                    members.append(w)
                    stack.append(w)
        m = max(members)
        for u in members:
            comp[u] = m
    return comp


@pytest.mark.parametrize("seed", [0, 3, 9])
def test_scc_matches_kosaraju(ray_session, work_dir, seed):
    """The multi-phase coloring SCC program vs a sequential Kosaraju on
    random digraphs (cycles, parallel edges, self-loops, singletons)."""
    import ray.data
    import pyarrow as pa

    from graphlite_ray.pipelines.linkgraph import scc_labels

    rng = np.random.RandomState(seed)
    n = int(rng.randint(10, 45))
    m = int(rng.randint(n, 4 * n))
    src = rng.randint(0, n, m).astype(np.int64)
    dst = rng.randint(0, n, m).astype(np.int64)
    edges = ray.data.from_arrow(pa.table({"src": src, "dst": dst}))
    got = {
        r["vertex_id"]: r["scc_id"]
        for r in scc_labels(edges, f"{work_dir}/s{seed}", P=4).take_all()
    }
    assert got == _kosaraju(src.tolist(), dst.tolist())


def test_scc_resume_midrun(ray_session, work_dir):
    """extra_state (colors + live degrees) must survive a mid-run
    checkpoint: a resumed run finishes to the same labels."""
    import ray.data
    import pyarrow as pa

    from graphlite_ray.pipelines.linkgraph import run_on_edge_dataset, scc_tagged_edges

    rng = np.random.RandomState(21)
    src = rng.randint(0, 30, 90).astype(np.int64)
    dst = rng.randint(0, 30, 90).astype(np.int64)
    edges = ray.data.from_arrow(pa.table({"src": src, "dst": dst}))
    part = run_on_edge_dataset(
        "scc", scc_tagged_edges(edges), f"{work_dir}/a", P=2, tag="sccdir",
        max_supersteps=4, ckpt_every=2,
    )
    assert not part.halted
    resumed = run_on_edge_dataset(
        "scc", scc_tagged_edges(edges), f"{work_dir}/a", P=2, tag="sccdir",
        resume=True,
    )
    assert resumed.halted
    got = {
        r["vertex_id"]: int(r["value"]) for r in resumed.values().take_all()
    }
    assert got == _kosaraju(src.tolist(), dst.tolist())


def test_harmonic_centrality_brute_force(ray_session, work_dir):
    """HarmonicCentrality vs a per-source BFS replay on a random digraph
    (parallel edges + self-loops must not shorten distances), including
    the radius truncation."""
    import collections

    import ray.data
    import pyarrow as pa

    from graphlite_ray.pipelines.linkgraph import run_on_edge_dataset

    rng = np.random.RandomState(4)
    n, m, radius, mod = 30, 120, 3, 2
    src = rng.randint(0, n, m).astype(np.int64)
    dst = rng.randint(0, n, m).astype(np.int64)
    adj = collections.defaultdict(set)
    for s, d in zip(src.tolist(), dst.tolist()):
        if s != d:
            adj[s].add(d)
    verts = sorted(set(src.tolist()) | set(dst.tolist()))
    want = {v: 0.0 for v in verts}
    for u in (v for v in verts if v % mod == 0):
        dist = {u: 0}
        frontier = [u]
        for t in range(1, radius + 1):
            nxt = [w for x in frontier for w in adj[x] if w not in dist]
            frontier = sorted(set(nxt))
            for w in frontier:
                dist[w] = t
                want[w] += 1.0 / t
        del dist

    edges = ray.data.from_arrow(pa.table({"src": src, "dst": dst}))
    res = run_on_edge_dataset(
        "harmonic_centrality", edges, work_dir, P=3, radius=radius,
        source_mod=mod,
    )
    got = {r["vertex_id"]: r["value"] for r in res.values().take_all()}
    assert set(got) == set(want)
    for v in verts:
        assert got[v] == pytest.approx(want[v], abs=1e-12), v


def test_url_canonicalization_rules():
    """Hand-checked rule-chain cases (each rule exercised); the stage and
    the per-row function must agree."""
    from graphlite_ray.stages.urlnorm import UrlCanonicalizer, canonicalize_url as c

    cases = {
        "http://Example.COM:80/Path/?utm_source=x&a=1#frag": "http://example.com/Path?a=1",
        "https://Host.org:443/": "https://host.org",
        "http://h.com/p/?utm_a=1&utm_b=2": "http://h.com/p",
        "http://h.com/p?a=1&utm_medium=m&b=2": "http://h.com/p?a=1&b=2",
        "http://h.com": "http://h.com",
        "HTTP://H.com/QQ": "http://h.com/QQ",  # path case preserved
        "http://h.com:8080/x": "http://h.com:8080/x",  # non-default port kept
        "http://h.com/a//": "http://h.com/a//",  # rule strips ONE non-'/'-preceded slash
    }
    for u, want in cases.items():
        assert c(u) == want, u
    df = UrlCanonicalizer()(pd.DataFrame({"url": list(cases)}))
    assert list(df["canonical_url"]) == [c(u) for u in cases]


def test_canonical_url_counts_groups_variants(ray_session):
    import ray.data
    import pyarrow as pa

    from graphlite_ray.stages.urlnorm import canonical_url_counts

    urls = [
        "http://a.com/x",
        "http://A.COM:80/x#f",
        "http://a.com/x?utm_source=s",
        "http://a.com/y",
    ]
    out = (
        canonical_url_counts(
            ray.data.from_arrow(pa.table({"url": pa.array(urls, pa.string())})), B=4
        )
        .to_pandas()
        .sort_values("canonical_url", ignore_index=True)
    )
    assert out["canonical_url"].tolist() == ["http://a.com/x", "http://a.com/y"]
    assert out["n_variants"].tolist() == [3, 1]


# -------------------------------------------------------------- WARC IO


def test_warc_roundtrip_and_pipeline(ray_session, tmp_path, work_dir):
    """pages -> .warc.gz shards (one gzip member per record, the real
    Common-Crawl layout) -> read back -> BYTE-identical url/ts/html — and
    the re-read pages drive the extraction pipeline to the same edges as
    the parquet path."""
    import pyarrow.parquet as pq
    import ray.data

    from graphlite_ray.sources.pages import pages_path
    from graphlite_ray.sources.warc import read_warc_pages, write_warc
    from graphlite_ray.stages.extract import pages_to_edge_urls

    src = pages_path(120, seed=42)
    pages = ray.data.read_parquet(src, columns=["url", "warc_ts", "html"])
    manifest = write_warc(pages, str(tmp_path / "warc"), gzip_records=True)
    assert manifest["n_records"].sum() == 120
    assert all(p.endswith(".warc.gz") for p in manifest["path"])

    back = (
        read_warc_pages(str(tmp_path / "warc"))
        .to_pandas()
        .sort_values("url", ignore_index=True)
    )
    want = pages.to_pandas().sort_values("url", ignore_index=True)
    assert back["url"].tolist() == want["url"].tolist()
    assert back["warc_ts"].tolist() == want["warc_ts"].tolist()
    assert [bytes(h) for h in back["html"]] == [bytes(h) for h in want["html"]]

    # same edges through the extraction pipeline as the parquet path
    via_warc = (
        pages_to_edge_urls(read_warc_pages(str(tmp_path / "warc")))
        .to_pandas()
        .sort_values(["src_url", "dst_url"], ignore_index=True)
    )
    via_parquet = (
        pages_to_edge_urls(ray.data.read_parquet(src, columns=["url", "html"]))
        .to_pandas()
        .sort_values(["src_url", "dst_url"], ignore_index=True)
    )
    pd.testing.assert_frame_equal(via_warc, via_parquet)


def test_warc_plain_and_corrupt(ray_session, tmp_path):
    import datetime

    from graphlite_ray.sources.warc import decode_warc, encode_warc

    ts = datetime.datetime(2024, 1, 1, 0, 0, 5)
    blob = encode_warc(
        ["http://a.com/x"], [ts], [b"<html>hi</html>"], gzip_records=False
    )
    recs = decode_warc(blob)
    assert recs == [("http://a.com/x", ts, b"<html>hi</html>")]
    with pytest.raises(ValueError, match="expected record header"):
        decode_warc(b"not a warc")
    with pytest.raises(ValueError, match="truncated"):
        decode_warc(blob[:-20])
    # microsecond timestamps survive the .%fZ form
    ts2 = datetime.datetime(2024, 1, 1, 0, 0, 5, 123456)
    blob2 = encode_warc(["http://b.com/"], [ts2], [b"<p>x</p>"])
    assert decode_warc(blob2)[0][1] == ts2
