"""Multimodal columns: opaque binary payloads + typed metadata, processed by
actor-pool map_batches stages.

The decode step is STUBBED — image/audio libraries are not available in this
container — but the Ray-side plumbing is real and tested: binary column in,
actor pool with per-actor init, small batch sizes for wide rows, typed
feature columns out. ``real=True`` raises NotImplementedError at the exact
point a PIL/ffmpeg call would go.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa

from ray.data import Dataset


class MediaDecodeStub:
    """Callable-class stage (one instance per actor). ``__init__`` does the
    once-per-actor setup (the place a real model/codec would load);
    ``__call__`` processes one Arrow batch."""

    def __init__(self, feature_dim: int = 16, real: bool = False):
        self.feature_dim = feature_dim
        self.real = real
        # deterministic fake "decoder": a fixed projection seeded once
        self.proj = np.random.default_rng(42).standard_normal((32, feature_dim))

    def _decode(self, payload: bytes) -> np.ndarray:
        if self.real:
            raise NotImplementedError(
                "real media decode requires an image/audio library not present "
                "in this environment; wire PIL/ffmpeg here"
            )
        digest = hashlib.blake2b(payload, digest_size=32).digest()
        raw = np.frombuffer(digest, dtype=np.uint8).astype(np.float64) / 255.0
        return raw @ self.proj

    def __call__(self, batch: pa.Table) -> pa.Table:
        payloads = batch["media"].to_pylist()
        n = len(payloads)
        feats = np.zeros((n, self.feature_dim))
        widths = np.zeros(n, np.int32)
        heights = np.zeros(n, np.int32)
        sizes = np.zeros(n, np.int64)
        for i, p in enumerate(payloads):
            p = p or b""
            sizes[i] = len(p)
            feats[i] = self._decode(p)
            # fake intrinsic dims derived deterministically from content
            h = hashlib.blake2b(p, digest_size=4).digest()
            widths[i] = 64 + h[0] % 192
            heights[i] = 64 + h[1] % 192
        cols = {name: batch[name] for name in batch.column_names if name != "media"}
        cols["n_bytes"] = pa.array(sizes, pa.int64())
        cols["width"] = pa.array(widths, pa.int32())
        cols["height"] = pa.array(heights, pa.int32())
        cols["feature"] = pa.array(feats.tolist(), pa.list_(pa.float64()))
        return pa.table(cols)


def media_features(
    ds: Dataset,
    *,
    feature_dim: int = 16,
    concurrency: int = 2,
    batch_size: int = 64,
    num_cpus: float = 1,
) -> Dataset:
    """Actor-pool decode/feature-extract over a (id, media: binary) dataset.
    Small batch_size on purpose: binary rows are wide, so batch × concurrency
    must fit the worker heap (SURVEY-level memory note)."""
    return ds.map_batches(
        MediaDecodeStub,
        fn_constructor_kwargs={"feature_dim": feature_dim},
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
        num_cpus=num_cpus,
    )
