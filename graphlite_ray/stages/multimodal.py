"""Multimodal column plumbing: image/audio/video as opaque binary columns.

The decode libraries (PIL/ffmpeg/torchaudio) are NOT in this container, so
the codec layer is stubbed behind a clearly-marked switch: with
`deterministic_fake=True` every stage produces seeded, content-derived fake
outputs (so schemas, batch sizing, actor lifecycles and output layouts are
real and tested); with the default `deterministic_fake=False` the stages
raise NotImplementedError at the decode boundary, which is exactly where a
real codec plugs in.

Design points that ARE real and load-bearing at scale:
  - binary payloads stay in Arrow buffers end-to-end (batch_format
    "pyarrow" at the IO edge, numpy inside),
  - stages are ACTOR POOLS (`map_batches(Cls, concurrency=...)`) because
    real codecs/models have heavy per-process init,
  - batch_size is small (default 64) because each row may be megabytes —
    batch bytes, not rows, is the budget,
  - outputs carry typed metadata columns next to the payload.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd

import ray.data

MEDIA_SCHEMA = {
    "media_id": "int64",
    "media_type": "string",   # "image" | "audio" | "video"
    "payload": "binary",
    "meta": "string",         # JSON sidecar (dims, codec, duration, ...)
}


def _content_rng(payload: bytes) -> np.random.RandomState:
    seed = int.from_bytes(hashlib.blake2b(payload, digest_size=4).digest(), "little")
    return np.random.RandomState(seed)


class ImageDecoder:
    """payload -> (media_id, height, width, channels, pixels_sum).

    Real codec goes in `_decode`; the fake derives a deterministic
    (h, w, 3) array from the payload bytes."""

    def __init__(self, deterministic_fake: bool = False):
        self.fake = deterministic_fake

    def _decode(self, payload: bytes) -> np.ndarray:
        if not self.fake:
            raise NotImplementedError(
                "image codec not available in this environment; construct with "
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
    """payload -> every Nth 'frame' summary (media_id, frame_idx, energy)."""

    def __init__(self, every_n: int = 4, deterministic_fake: bool = False):
        self.every_n = every_n
        self.fake = deterministic_fake

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        if not self.fake:
            raise NotImplementedError(
                "audio codec not available; construct with deterministic_fake=True"
            )
        rows = []
        for mid, payload in zip(batch["media_id"], batch["payload"]):
            rng = _content_rng(bytes(payload))
            n_frames = int(rng.randint(8, 64))
            wave = rng.standard_normal(n_frames)
            for f in range(0, n_frames, self.every_n):
                rows.append((mid, f, float(wave[f] ** 2)))
        return pd.DataFrame(rows, columns=["media_id", "frame_idx", "energy"])


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


class VideoFrameSampler(AudioFrameSampler):
    """Every-Nth-frame sampling for video payloads — identical plumbing to
    the audio sampler (binary payload -> per-frame rows); a real codec
    replaces `_content_rng`-derived frames with decoded ones."""


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


def synthetic_media_table(n: int, seed: int = 42) -> pd.DataFrame:
    """Deterministic fake media rows for plumbing tests."""
    rng = np.random.RandomState(seed)
    rows = []
    for i in range(n):
        payload = rng.bytes(int(rng.randint(64, 4096)))
        mtype = ["image", "audio", "video"][i % 3]
        rows.append((i, mtype, payload, '{"codec":"fake"}'))
    return pd.DataFrame(rows, columns=["media_id", "media_type", "payload", "meta"])
