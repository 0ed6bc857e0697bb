"""Multimodal column plumbing: opaque binary payloads with typed
metadata, processed by actor-pool ``map_batches`` stages.

Image/audio decode libraries are not present in this container, so the
decode kernel is a clearly-marked deterministic stand-in
(``FakeDecoder``) — but the Ray-side contract is real and tested:
binary column in, small batches (payload-size-aware), actor pool with
per-actor setup, fixed output schema with feature vectors, and a
``NotImplementedError`` seam (``RealDecoder``) where a real codec
drops in.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa
import ray.data

FEATURE_DIM = 8


class FakeDecoder:
    """Deterministic decode + feature-extract stand-in.

    "Decode" parses payload length/shape from the bytes; "features" are
    a mean-pooled projection of the raw bytes through a fixed random
    matrix compiled once per actor — the exact shape a real
    image-embedding stage would have.
    """

    def __init__(self, feature_dim: int = FEATURE_DIM, seed: int = 42):
        rng = np.random.default_rng(seed)
        self.projection = rng.standard_normal((256, feature_dim))

    def __call__(self, batch: pa.Table) -> pa.Table:
        payloads = batch.column("payload").to_pylist()
        widths, heights, checksums, feats = [], [], [], []
        for data in payloads:
            data = data or b""
            digest = hashlib.sha256(data).digest()
            # "Decoded" dimensions derive deterministically from content.
            widths.append(64 + digest[0] % 192)
            heights.append(64 + digest[1] % 192)
            checksums.append(digest.hex()[:16])
            if data:
                hist = np.bincount(np.frombuffer(data, dtype=np.uint8), minlength=256).astype(
                    np.float64
                )
                hist /= hist.sum()
                feats.append((hist @ self.projection).round(6).tolist())
            else:
                feats.append([0.0] * self.projection.shape[1])
        return pa.Table.from_pydict(
            {
                "url": batch.column("url"),
                "width": pa.array(widths, pa.int32()),
                "height": pa.array(heights, pa.int32()),
                "checksum": pa.array(checksums, pa.string()),
                "features": pa.array(feats, pa.list_(pa.float64())),
            }
        )


class RealDecoder:
    """The seam for a real codec (PIL/ffmpeg/torchvision). Keeping the
    class here pins the constructor/batch contract."""

    def __init__(self, *_args, **_kwargs):
        raise NotImplementedError(
            "image/audio decode libraries are not available in this "
            "environment; swap FakeDecoder for a real codec with the "
            "same (batch: pa.Table['url','payload']) -> features contract"
        )


def decode_features(
    media: ray.data.Dataset, concurrency=(1, 8), batch_size: int = 16
) -> ray.data.Dataset:
    """Actor-pool decode/feature stage over a (url, payload) dataset.

    ``batch_size`` is small because payload bytes dominate batch memory
    (batch bytes ≈ batch_size × payload size — the same sizing rule as
    the extract stage).
    """
    return media.map_batches(
        FakeDecoder,
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
        num_cpus=1,
    )


def media_from_pages(pages: ray.data.Dataset) -> ray.data.Dataset:
    """Adapt the pages table to a (url, payload) media dataset."""

    def _adapt(batch: pa.Table) -> pa.Table:
        return pa.Table.from_pydict(
            {"url": batch.column("url"), "payload": batch.column("html")}
        )

    return pages.map_batches(_adapt, batch_format="pyarrow")
