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


MAX_DIM = 512


class FakeResizer:
    """Deterministic resize stand-in: scales (width, height) to fit
    ``max_dim`` preserving aspect ratio — the real geometry a thumbnail
    stage computes — and "re-encodes" the payload as a deterministic
    content-keyed slice (a real codec would emit new bytes here; the
    stand-in keeps output size proportional to the scaled area so
    downstream batch-sizing math stays honest)."""

    def __init__(self, max_dim: int = MAX_DIM):
        self.max_dim = max_dim

    def __call__(self, batch: pa.Table) -> pa.Table:
        payloads = batch.column("payload").to_pylist()
        widths = batch.column("width").to_pylist()
        heights = batch.column("height").to_pylist()
        out_w, out_h, out_p = [], [], []
        for data, w, h in zip(payloads, widths, heights):
            data = data or b""
            scale = min(1.0, self.max_dim / max(w, h, 1))
            nw, nh = max(1, int(w * scale)), max(1, int(h * scale))
            # stand-in re-encode: proportional prefix of the original
            # bytes, keyed so an identity resize passes through whole.
            keep = len(data) if scale >= 1.0 else max(1, int(len(data) * scale * scale))
            out_w.append(nw)
            out_h.append(nh)
            out_p.append(data[:keep])
        return pa.Table.from_pydict(
            {
                "url": batch.column("url"),
                "width": pa.array(out_w, pa.int32()),
                "height": pa.array(out_h, pa.int32()),
                "payload": pa.array(out_p, pa.binary()),
            }
        )


def resize_media(
    media: ray.data.Dataset, max_dim: int = MAX_DIM, concurrency=(1, 8),
    batch_size: int = 16,
) -> ray.data.Dataset:
    """Actor-pool resize stage over (url, payload, width, height).

    Same payload-aware batch sizing as ``decode_features``; output rows
    keep the binary column (resized), so stages compose:
    decode → resize → feature-extract."""
    return media.map_batches(
        FakeResizer,
        fn_constructor_kwargs={"max_dim": max_dim},
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
        num_cpus=1,
    )


FRAME_BYTES = 4096


class FrameSampler:
    """Frame-sampling stand-in for video payloads: the payload is
    treated as ``ceil(len/FRAME_BYTES)`` frames; every ``stride``-th
    frame is emitted as its own row (capped at ``max_frames``), with
    the frame's byte slice as payload and a derived timestamp. This is
    the row-EXPANDING media stage shape (one input row → k output
    rows) with a hard per-row output bound — the same contract a real
    ffmpeg keyframe sampler needs on a 100 TB corpus."""

    def __init__(self, stride: int = 2, max_frames: int = 8, frame_ms: int = 1000):
        self.stride = max(1, stride)
        self.max_frames = max_frames
        self.frame_ms = frame_ms

    def __call__(self, batch: pa.Table) -> pa.Table:
        urls = batch.column("url").to_pylist()
        payloads = batch.column("payload").to_pylist()
        out_url, out_idx, out_ts, out_p = [], [], [], []
        for url, data in zip(urls, payloads):
            data = data or b""
            n_frames = max(1, -(-len(data) // FRAME_BYTES)) if data else 0
            taken = 0
            for idx in range(0, n_frames, self.stride):
                if taken >= self.max_frames:
                    break
                out_url.append(url)
                out_idx.append(idx)
                out_ts.append(idx * self.frame_ms)
                out_p.append(data[idx * FRAME_BYTES : (idx + 1) * FRAME_BYTES])
                taken += 1
        return pa.Table.from_pydict(
            {
                "url": pa.array(out_url, pa.string()),
                "frame_idx": pa.array(out_idx, pa.int32()),
                "ts_ms": pa.array(out_ts, pa.int64()),
                "payload": pa.array(out_p, pa.binary()),
            }
        )


def sample_frames(
    media: ray.data.Dataset, stride: int = 2, max_frames: int = 8,
    concurrency=(1, 8), batch_size: int = 8,
) -> ray.data.Dataset:
    """Actor-pool frame-sampling stage over (url, payload).

    ``batch_size`` is smaller than the other media stages because the
    output multiplies rows (≤ max_frames per input)."""
    return media.map_batches(
        FrameSampler,
        fn_constructor_kwargs={"stride": stride, "max_frames": max_frames},
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
        num_cpus=1,
    )
