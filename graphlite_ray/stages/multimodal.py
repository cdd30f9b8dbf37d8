"""Multimodal columns: image/audio/video as opaque binary columns with
typed metadata, decoded/featurized by actor-pool `map_batches` stages.

Codec reality in this container (no PIL/ffmpeg/torchaudio):
  - REAL decoders, dependency-free: 24-bit uncompressed **BMP** (struct +
    numpy), **PNG** 8-bit truecolor (stdlib zlib + numpy unfiltering, all
    five row filters — a genuinely COMPRESSED format), baseline **JPEG**
    (`stages/jpeg.py`: markers + canonical Huffman + IDCT, 4:4:4/4:2:0,
    restart markers — the dominant web image format), PCM **WAV**
    (stdlib `wave`), and **GLRV** — a documented raw video container
    (header + concatenated BMP frames) of the kind raw frame-dump
    pipelines use. Encode + decode round-trip exactly (tested).
  - Codecs still needing external libraries (progressive JPEG / H.264 /
    MP3) raise NotImplementedError at the decode boundary, which is
    exactly where a real codec plugs in; `deterministic_fake=True` keeps
    the old content-derived fake for plumbing tests.

Design points that are load-bearing at scale:
  - binary payloads stay in Arrow buffers end-to-end,
  - stages are ACTOR POOLS (`map_batches(Cls, concurrency=...)`) because
    real codecs/models have heavy per-process init,
  - batch_size is small (default 64) because each row may be megabytes —
    batch BYTES, not rows, is the budget,
  - outputs carry typed metadata columns next to the payload.
"""

from __future__ import annotations

import hashlib
import io
import struct
import wave

import numpy as np
import pandas as pd

import ray.data

MEDIA_SCHEMA = {
    "media_id": "int64",
    "media_type": "string",   # "image" | "audio" | "video"
    "payload": "binary",
    "meta": "string",         # JSON sidecar (dims, codec, duration, ...)
}


# ------------------------------------------------------------ real codecs


def encode_bmp(img: np.ndarray) -> bytes:
    """(h, w, 3) uint8 RGB -> 24-bit uncompressed BMP bytes."""
    h, w, _ = img.shape
    row = w * 3
    pad = (-row) % 4
    body_size = (row + pad) * h
    header = struct.pack("<2sIHHI", b"BM", 54 + body_size, 0, 0, 54)
    info = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, body_size, 2835, 2835, 0, 0)
    rows = []
    bgr = img[:, :, ::-1]  # BMP stores BGR, bottom-up
    zero = b"\x00" * pad
    for y in range(h - 1, -1, -1):
        rows.append(bgr[y].tobytes() + zero)
    return header + info + b"".join(rows)


def decode_bmp(payload: bytes) -> np.ndarray:
    """24-bit uncompressed BMP bytes -> (h, w, 3) uint8 RGB."""
    if payload[:2] != b"BM":
        raise ValueError("not a BMP payload")
    off = struct.unpack("<I", payload[10:14])[0]
    w, h = struct.unpack("<ii", payload[18:26])
    bpp = struct.unpack("<H", payload[28:30])[0]
    comp = struct.unpack("<I", payload[30:34])[0]
    if bpp != 24 or comp != 0:
        raise NotImplementedError(f"BMP variant bpp={bpp} comp={comp} unsupported")
    row = w * 3
    stride = row + ((-row) % 4)
    flipped = h > 0
    h = abs(h)
    data = np.frombuffer(payload, np.uint8, count=stride * h, offset=off)
    img = data.reshape(h, stride)[:, :row].reshape(h, w, 3)
    if flipped:
        img = img[::-1]
    return img[:, :, ::-1].copy()  # BGR -> RGB


def encode_wav(samples: np.ndarray, rate: int = 16000) -> bytes:
    """int16 mono samples -> PCM WAV bytes (stdlib wave)."""
    buf = io.BytesIO()
    with wave.open(buf, "wb") as f:
        f.setnchannels(1)
        f.setsampwidth(2)
        f.setframerate(rate)
        f.writeframes(np.asarray(samples, np.int16).tobytes())
    return buf.getvalue()


def decode_wav(payload: bytes) -> tuple[int, np.ndarray]:
    """PCM WAV bytes -> (sample_rate, int16 mono samples)."""
    with wave.open(io.BytesIO(payload), "rb") as f:
        if f.getsampwidth() != 2:
            raise NotImplementedError("only 16-bit PCM WAV supported")
        rate = f.getframerate()
        raw = f.readframes(f.getnframes())
        s = np.frombuffer(raw, np.int16)
        if f.getnchannels() > 1:
            s = s.reshape(-1, f.getnchannels()).mean(axis=1).astype(np.int16)
    return rate, s


# ------------------------------------------------------------- PNG codec
# A real COMPRESSED image codec with no external deps: zlib (stdlib) +
# numpy unfiltering. Supports 8-bit truecolor RGB (color type 2), the
# standard web-image baseline; other color types / bit depths raise at
# the documented boundary. Decode handles all five PNG row filters.

PNG_MAGIC = b"\x89PNG\r\n\x1a\n"


def _png_chunk(ctype: bytes, data: bytes) -> bytes:
    import zlib

    return (
        struct.pack(">I", len(data))
        + ctype
        + data
        + struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF)
    )


def encode_png(img: np.ndarray) -> bytes:
    """(h, w, 3) uint8 RGB -> PNG bytes (8-bit truecolor, filter 0 rows,
    zlib-compressed IDAT)."""
    import zlib

    h, w, _ = img.shape
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    raw = b"".join(b"\x00" + img[y].tobytes() for y in range(h))
    return (
        PNG_MAGIC
        + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"IDAT", zlib.compress(raw, 6))
        + _png_chunk(b"IEND", b"")
    )


def _paeth(a: np.ndarray, b: np.ndarray, c: np.ndarray) -> np.ndarray:
    p = a.astype(np.int16) + b.astype(np.int16) - c.astype(np.int16)
    pa, pb, pc = np.abs(p - a), np.abs(p - b), np.abs(p - c)
    return np.where((pa <= pb) & (pa <= pc), a, np.where(pb <= pc, b, c))


def _unfilter_wavefront(
    raw3: np.ndarray, filters: np.ndarray, prior: np.ndarray
) -> np.ndarray:
    """Unfilter a RUN of consecutive average/paeth rows vectorized.

    Both filters make pixel (y, x) depend on (y, x-1), (y-1, x) and
    (y-1, x-1) — a classic wavefront: every anti-diagonal y+x is
    independent given the previous two. So instead of the H*W Python-loop
    the run is solved in R+W-1 vectorized steps, each a fancy-indexed
    gather/scatter over one diagonal (all 3 channels at once). A 512x512
    all-paeth image drops from ~10^6 interpreter iterations to ~10^3 numpy
    calls (<100 ms).

    raw3: (R, W, 3) filtered bytes; filters: (R,) each 3 (avg) or 4
    (paeth); prior: (W, 3) reconstructed row above the run (zeros at the
    image top). Returns (R, W, 3) uint8.
    """
    R, W, _ = raw3.shape
    rec = np.zeros((R + 1, W + 1, 3), np.int16)  # guard row above, col left
    rec[0, 1:] = prior
    raw_i = raw3.astype(np.int16)
    is_paeth = filters == 4
    all_paeth, all_avg = bool(is_paeth.all()), bool(~is_paeth.any())
    ys_full = np.arange(1, R + 1)
    for d in range(2, R + W + 1):
        y_lo, y_hi = max(1, d - W), min(R, d - 1)
        if y_lo > y_hi:
            continue
        ys = ys_full[y_lo - 1 : y_hi]
        xs = d - ys  # in [1, W]
        a = rec[ys, xs - 1]  # left
        b = rec[ys - 1, xs]  # up
        if all_avg:
            pred = (a + b) >> 1
        else:
            c = rec[ys - 1, xs - 1]  # upper-left
            p = a + b - c
            pa, pb, pc = np.abs(p - a), np.abs(p - b), np.abs(p - c)
            pred = np.where((pa <= pb) & (pa <= pc), a, np.where(pb <= pc, b, c))
            if not all_paeth:  # mixed run: select per row
                pred = np.where(is_paeth[ys - 1][:, None], pred, (a + b) >> 1)
        rec[ys, xs] = (raw_i[ys - 1, xs - 1] + pred) & 255
    return rec[1:, 1:].astype(np.uint8)


def decode_png(payload: bytes) -> np.ndarray:
    """PNG bytes -> (h, w, 3) uint8 RGB. 8-bit truecolor only; all five
    row filters (none/sub/up/average/paeth) are unfiltered — none/sub/up
    per-row vectorized, average/paeth runs via the anti-diagonal wavefront
    (`_unfilter_wavefront`)."""
    import zlib

    if payload[:8] != PNG_MAGIC:
        raise ValueError("not a PNG payload")
    off = 8
    w = h = None
    idat = []
    while off < len(payload):
        if off + 8 > len(payload):
            raise ValueError("truncated PNG: chunk header past end of payload")
        (length,) = struct.unpack(">I", payload[off : off + 4])
        ctype = payload[off + 4 : off + 8]
        data = payload[off + 8 : off + 8 + length]
        off += 12 + length
        if ctype == b"IHDR":
            w, h, depth, color, comp, filt, inter = struct.unpack(">IIBBBBB", data)
            if depth != 8 or color != 2 or comp != 0 or filt != 0 or inter != 0:
                raise NotImplementedError(
                    f"PNG variant depth={depth} color={color} interlace={inter} "
                    "unsupported (8-bit truecolor RGB only)"
                )
        elif ctype == b"IDAT":
            idat.append(data)
        elif ctype == b"IEND":
            break
    if w is None or h is None:
        raise ValueError("corrupt PNG: no IHDR chunk before IDAT/IEND")
    raw = zlib.decompress(b"".join(idat))
    stride = w * 3
    if len(raw) != h * (stride + 1):
        raise ValueError(
            f"corrupt PNG: inflated IDAT is {len(raw)} bytes, "
            f"expected h*(stride+1) = {h * (stride + 1)}"
        )
    rows = np.frombuffer(raw, np.uint8).reshape(h, stride + 1)
    filters = rows[:, 0]
    raw_rows = rows[:, 1:]
    if (filters > 4).any():
        raise ValueError(f"bad PNG filter {int(filters[filters > 4][0])}")
    out = np.zeros((h, stride), np.uint8)
    prior = np.zeros(stride, np.uint8)
    y = 0
    while y < h:
        f = int(filters[y])
        if f in (3, 4):  # maximal avg/paeth run -> one wavefront solve
            y_end = y
            while y_end < h and int(filters[y_end]) in (3, 4):
                y_end += 1
            out[y:y_end] = _unfilter_wavefront(
                raw_rows[y:y_end].reshape(y_end - y, w, 3),
                filters[y:y_end],
                prior.reshape(w, 3),
            ).reshape(y_end - y, stride)
            prior = out[y_end - 1]
            y = y_end
            continue
        row = raw_rows[y].copy()
        if f == 0:
            recon = row
        elif f == 2:  # up
            recon = row + prior
        else:  # f == 1, sub: per-channel prefix sum mod 256, vectorized
            recon = (
                np.cumsum(row.reshape(-1, 3).astype(np.int64), axis=0) % 256
            ).astype(np.uint8).reshape(-1)
        out[y] = recon
        prior = out[y]
        y += 1
    return out.reshape(h, w, 3)


GLRV_MAGIC = b"GLRV"


def encode_glrv(frames: list[np.ndarray]) -> bytes:
    """Raw video container: magic + n_frames + per-frame (size, BMP)."""
    parts = [GLRV_MAGIC, struct.pack("<I", len(frames))]
    for fr in frames:
        b = encode_bmp(fr)
        parts.append(struct.pack("<I", len(b)))
        parts.append(b)
    return b"".join(parts)


def decode_glrv(payload: bytes) -> list[np.ndarray]:
    if payload[:4] != GLRV_MAGIC:
        raise ValueError("not a GLRV payload")
    (n,) = struct.unpack("<I", payload[4:8])
    off = 8
    frames = []
    for _ in range(n):
        (size,) = struct.unpack("<I", payload[off : off + 4])
        off += 4
        frames.append(decode_bmp(payload[off : off + size]))
        off += size
    return frames


def _content_rng(payload: bytes) -> np.random.RandomState:
    seed = int.from_bytes(hashlib.blake2b(payload, digest_size=4).digest(), "little")
    return np.random.RandomState(seed)


# ---------------------------------------------------------------- stages


class ImageDecoder:
    """payload -> (media_id, height, width, channels, pixels_sum).

    BMP payloads decode for real; other codecs raise at the decode
    boundary unless `deterministic_fake=True` (plumbing-test mode)."""

    def __init__(self, deterministic_fake: bool = False):
        self.fake = deterministic_fake

    def _decode(self, payload: bytes) -> np.ndarray:
        if payload[:2] == b"BM":
            return decode_bmp(payload)
        if payload[:8] == PNG_MAGIC:
            return decode_png(payload)
        if payload[:2] == b"\xff\xd8":
            from graphlite_ray.stages.jpeg import decode_jpeg

            return decode_jpeg(payload)
        if not self.fake:
            raise NotImplementedError(
                "no dependency-free codec for this payload (BMP, 8-bit "
                "RGB PNG and baseline JPEG decode for real; progressive "
                "JPEG/WebP/etc. need external libs); construct with "
                "deterministic_fake=True or plug a real decoder here"
            )
        rng = _content_rng(payload)
        h, w = int(rng.randint(16, 64)), int(rng.randint(16, 64))
        return rng.randint(0, 256, size=(h, w, 3)).astype(np.uint8)

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        rows = []
        for mid, payload in zip(batch["media_id"], batch["payload"]):
            img = self._decode(bytes(payload))
            rows.append((mid, img.shape[0], img.shape[1], img.shape[2], int(img.sum())))
        return pd.DataFrame(
            rows, columns=["media_id", "height", "width", "channels", "pixels_sum"]
        )


class ImageResizer:
    """payload -> resized payload (nearest-neighbor, pure numpy): the
    canonical pre-training image normalization stage, real end-to-end on
    BMP payloads (decode -> resize -> re-encode)."""

    def __init__(self, size: tuple[int, int] = (32, 32), deterministic_fake: bool = False):
        self.size = size
        self.decoder = ImageDecoder(deterministic_fake)

    def _resize(self, img: np.ndarray) -> np.ndarray:
        th, tw = self.size
        h, w, _ = img.shape
        yi = (np.arange(th) * h // th).clip(0, h - 1)
        xi = (np.arange(tw) * w // tw).clip(0, w - 1)
        return img[yi][:, xi]

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        out = []
        for mid, payload in zip(batch["media_id"], batch["payload"]):
            img = self._resize(self.decoder._decode(bytes(payload)))
            out.append((mid, encode_bmp(img), img.shape[0], img.shape[1]))
        return pd.DataFrame(out, columns=["media_id", "payload", "height", "width"])


class ImageFeaturizer:
    """payload -> fixed-size feature vector (the "model inference" stage).
    Feature extraction is batched: one matrix op per batch, not per row."""

    def __init__(self, dim: int = 32, deterministic_fake: bool = False):
        self.dim = dim
        self.decoder = ImageDecoder(deterministic_fake)

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        feats = np.zeros((len(batch), self.dim), np.float32)
        for i, payload in enumerate(batch["payload"]):
            img = self.decoder._decode(bytes(payload))
            flat = img.reshape(-1).astype(np.float32)
            pad = (-len(flat)) % self.dim
            feats[i] = flat[: len(flat) - (len(flat) % self.dim)].reshape(
                -1, self.dim
            ).mean(axis=0) if len(flat) >= self.dim else np.pad(flat, (0, pad))[: self.dim]
        return pd.DataFrame(
            {"media_id": batch["media_id"], "embedding": list(feats)}
        )


class AudioFrameSampler:
    """payload -> every Nth frame's energy (media_id, frame_idx, energy).

    WAV payloads decode for real: a frame is `frame_samples` PCM samples,
    energy = mean square (vectorized reshape, no per-sample loop)."""

    def __init__(
        self,
        every_n: int = 4,
        frame_samples: int = 1024,
        deterministic_fake: bool = False,
    ):
        self.every_n = every_n
        self.frame_samples = frame_samples
        self.fake = deterministic_fake

    def _frame_energies(self, payload: bytes) -> np.ndarray:
        if payload[:4] == b"RIFF" and payload[8:12] == b"WAVE":
            _, samples = decode_wav(payload)
            n = len(samples) // self.frame_samples
            if n == 0:
                return np.empty(0, np.float64)
            frames = (
                samples[: n * self.frame_samples]
                .astype(np.float64)
                .reshape(n, self.frame_samples)
            )
            return (frames**2).mean(axis=1)
        if not self.fake:
            raise NotImplementedError(
                "no dependency-free codec for this payload; construct with "
                "deterministic_fake=True or plug a real decoder here"
            )
        rng = _content_rng(payload)
        return rng.standard_normal(int(rng.randint(8, 64))) ** 2

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        mids, idxs, energies = [], [], []
        for mid, payload in zip(batch["media_id"], batch["payload"]):
            e = self._frame_energies(bytes(payload))
            sel = np.arange(0, len(e), self.every_n)
            mids.append(np.full(len(sel), mid, np.int64))
            idxs.append(sel.astype(np.int64))
            energies.append(e[sel])
        if not mids:
            return pd.DataFrame({"media_id": [], "frame_idx": [], "energy": []})
        return pd.DataFrame(
            {
                "media_id": np.concatenate(mids),
                "frame_idx": np.concatenate(idxs),
                "energy": np.concatenate(energies),
            }
        )


class VideoFrameSampler:
    """payload -> every Nth decoded frame's summary (media_id, frame_idx,
    height, width, mean_intensity). GLRV raw-frame containers decode for
    real; compressed video raises at the boundary."""

    def __init__(self, every_n: int = 8, deterministic_fake: bool = False):
        self.every_n = every_n
        self.fake = deterministic_fake

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        rows = []
        for mid, payload in zip(batch["media_id"], batch["payload"]):
            payload = bytes(payload)
            if payload[:4] == GLRV_MAGIC:
                frames = decode_glrv(payload)
            elif self.fake:
                rng = _content_rng(payload)
                frames = [
                    rng.randint(0, 256, size=(8, 8, 3)).astype(np.uint8)
                    for _ in range(int(rng.randint(4, 16)))
                ]
            else:
                raise NotImplementedError(
                    "no dependency-free codec for this payload; use GLRV raw "
                    "frames, deterministic_fake=True, or plug a real decoder"
                )
            for f in range(0, len(frames), self.every_n):
                fr = frames[f]
                rows.append(
                    (mid, f, fr.shape[0], fr.shape[1], float(fr.mean()))
                )
        return pd.DataFrame(
            rows,
            columns=["media_id", "frame_idx", "height", "width", "mean_intensity"],
        )


# -------------------------------------------------------------- pipelines


def decode_images(
    media: "ray.data.Dataset",
    deterministic_fake: bool = False,
    batch_size: int = 64,
    concurrency=(1, 4),
) -> "ray.data.Dataset":
    return media.map_batches(
        ImageDecoder,
        fn_constructor_kwargs={"deterministic_fake": deterministic_fake},
        batch_format="pandas",
        batch_size=batch_size,
        concurrency=concurrency,
    )


def resize_images(
    media: "ray.data.Dataset",
    size: tuple[int, int] = (32, 32),
    deterministic_fake: bool = False,
    batch_size: int = 64,
    concurrency=(1, 4),
) -> "ray.data.Dataset":
    return media.map_batches(
        ImageResizer,
        fn_constructor_kwargs={"size": size, "deterministic_fake": deterministic_fake},
        batch_format="pandas",
        batch_size=batch_size,
        concurrency=concurrency,
    )


def featurize_images(
    media: "ray.data.Dataset",
    dim: int = 32,
    deterministic_fake: bool = False,
    batch_size: int = 64,
    concurrency=(1, 4),
) -> "ray.data.Dataset":
    return media.map_batches(
        ImageFeaturizer,
        fn_constructor_kwargs={"dim": dim, "deterministic_fake": deterministic_fake},
        batch_format="pandas",
        batch_size=batch_size,
        concurrency=concurrency,
    )


def sample_audio_frames(
    media: "ray.data.Dataset",
    every_n: int = 4,
    deterministic_fake: bool = False,
    batch_size: int = 64,
    concurrency=(1, 4),
) -> "ray.data.Dataset":
    return media.map_batches(
        AudioFrameSampler,
        fn_constructor_kwargs={"every_n": every_n, "deterministic_fake": deterministic_fake},
        batch_format="pandas",
        batch_size=batch_size,
        concurrency=concurrency,
    )


def sample_video_frames(
    media: "ray.data.Dataset",
    every_n: int = 8,
    deterministic_fake: bool = False,
    batch_size: int = 16,
    concurrency=(1, 4),
) -> "ray.data.Dataset":
    return media.map_batches(
        VideoFrameSampler,
        fn_constructor_kwargs={"every_n": every_n, "deterministic_fake": deterministic_fake},
        batch_format="pandas",
        batch_size=batch_size,  # video rows are the largest payloads: small batches
        concurrency=concurrency,
    )


def synthetic_media_table(n: int, seed: int = 42, real_codecs: bool = True) -> pd.DataFrame:
    """Deterministic media rows. With `real_codecs` (default) payloads are
    genuine BMP / WAV / GLRV bytes so the decode stages exercise REAL
    parsing; `real_codecs=False` keeps the legacy opaque random payloads
    for the fake-codec plumbing path.

    The meta sidecar records ENCODE-TIME ground truth (dims, pixel sum,
    per-frame energies / means) so downstream decode stages are
    independently verifiable from the sidecar alone — the pipeline must
    actually parse the binary payload to reproduce them (this is what the
    media_* DuckDB oracles check)."""
    import json

    rng = np.random.RandomState(seed)
    rows = []
    for i in range(n):
        mtype = ["image", "audio", "video"][i % 3]
        if not real_codecs:
            payload, meta = rng.bytes(int(rng.randint(64, 4096))), '{"codec":"fake"}'
        elif mtype == "image":
            h, w = int(rng.randint(8, 32)), int(rng.randint(8, 32))
            img = rng.randint(0, 256, size=(h, w, 3)).astype(np.uint8)
            # rotate raw BMP / compressed PNG / lossy baseline JPEG —
            # all three decode for real
            codec = ["bmp", "png", "jpeg"][(i // 3) % 3]
            if codec == "jpeg":
                from graphlite_ray.stages.jpeg import encode_jpeg

                # lossy: the sidecar ground truth is the RECONSTRUCTION
                # the bitstream exactly decodes to (encoder-computed from
                # its own quantized coefficients), not the original pixels
                payload, recon = encode_jpeg(
                    img, quality=85, subsample=bool(i % 2), return_recon=True
                )
                psum = int(recon.sum())
            else:
                payload = encode_png(img) if codec == "png" else encode_bmp(img)
                psum = int(img.sum())
            meta = json.dumps({"codec": codec, "h": h, "w": w, "psum": psum})
        elif mtype == "audio":
            ns = int(rng.randint(2048, 8192))
            samples = (rng.standard_normal(ns) * 3000).astype(np.int16)
            payload = encode_wav(samples)
            nf = ns // 1024
            energies = (
                samples[: nf * 1024].astype(np.float64).reshape(nf, 1024) ** 2
            ).mean(axis=1)
            meta = json.dumps({"codec": "pcm_wav", "n": ns, "e": energies.tolist()})
        else:
            frames = [
                rng.randint(0, 256, size=(8, 12, 3)).astype(np.uint8)
                for _ in range(int(rng.randint(4, 12)))
            ]
            payload = encode_glrv(frames)
            meta = json.dumps(
                {
                    "codec": "glrv",
                    "frames": len(frames),
                    "fh": 8,
                    "fw": 12,
                    "fm": [float(f.mean()) for f in frames],
                }
            )
        rows.append((i, mtype, payload, meta))
    return pd.DataFrame(rows, columns=["media_id", "media_type", "payload", "meta"])
