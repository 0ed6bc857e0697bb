"""WAV (RIFF PCM) codec + audio feature stage — pure stdlib+numpy.

Audio is the third multimodal payload class (after raster images and
multi-frame GIF); 16-bit PCM WAV is fully parseable without codec
libraries, so the decode path is REAL: RIFF chunk walk, fmt
validation (PCM, 16-bit), data extraction, and typed failures for
truncation and unsupported variants (8-bit, float, ADPCM, multi-GB
declared sizes).

The feature stage emits EXACT-INTEGER signals so the DuckDB gate can
verify them value-for-value: duration on the ms grid
(``n*1000 // rate``), energy as the exact sum of squared samples
(int64 — bounded by n·32768² per payload), and the zero-crossing
count under a frozen rule (strict sign product < 0 on channel 0,
zeros are sign-less). Spectral features (FFT argmax) are
float-domain and pinned by pytest on known sinusoids instead of the
SQL gate — the same split the raster codecs use (dims/flags via
oracle, pixel math via pytest).

Oracle strategy (``multimodal_wav_features``): the corpus generator
derives each sample from the ASCII hex of ``md5(doc text)`` —
``s_i = ascii(c_{2i}) + 256·ascii(c_{2i+1}) - 26000`` — so plain
DuckDB string+window arithmetic reproduces sum_sq and the
zero-crossing count of the DECODED samples, verifying the RIFF/PCM
round-trip through the value-hash gate.
"""

from __future__ import annotations

import struct

import numpy as np
import pyarrow as pa
import ray.data


def parse_wav(data: bytes):
    """WAV → (sample_rate, n_channels, samples (n, ch) int16).
    Supports PCM 16-bit; raises ValueError with deterministic
    messages otherwise."""
    if len(data) < 12 or data[:4] != b"RIFF" or data[8:12] != b"WAVE":
        raise ValueError("not a WAV")
    pos = 12
    fmt = None
    samples = None
    while pos + 8 <= len(data):
        cid, size = struct.unpack_from("<4sI", data, pos)
        pos += 8
        if pos + size > len(data):
            raise ValueError("truncated WAV")
        chunk = data[pos : pos + size]
        if cid == b"fmt ":
            if size < 16:
                raise ValueError("truncated WAV")
            audio_fmt, n_ch, rate, _br, _ba, bits = struct.unpack_from(
                "<HHIIHH", chunk, 0
            )
            if audio_fmt != 1:
                raise ValueError(f"unsupported WAV (format {audio_fmt})")
            if bits != 16:
                raise ValueError(f"unsupported WAV ({bits}-bit)")
            if n_ch == 0 or rate == 0:
                raise ValueError("bad WAV header")
            fmt = (rate, n_ch)
        elif cid == b"data":
            if fmt is None:
                raise ValueError("WAV data before fmt")
            samples = np.frombuffer(
                chunk[: len(chunk) - (len(chunk) % (2 * fmt[1]))], "<i2"
            ).reshape(-1, fmt[1])
        pos += size + (size & 1)  # chunks are word-aligned
    if fmt is None:
        raise ValueError("truncated WAV")
    if samples is None:
        raise ValueError("WAV has no data chunk")
    return fmt[0], fmt[1], samples


def encode_wav(samples: np.ndarray, rate: int) -> bytes:
    """(n, ch) int16 → RIFF PCM WAV bytes."""
    n, ch = samples.shape
    payload = samples.astype("<i2").tobytes()
    fmt = struct.pack("<HHIIHH", 1, ch, rate, rate * ch * 2, ch * 2, 16)
    out = b"RIFF" + struct.pack("<I", 4 + 8 + len(fmt) + 8 + len(payload))
    out += b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt
    out += b"data" + struct.pack("<I", len(payload)) + payload
    return out


def wav_from_documents(sf_dir: str) -> ray.data.Dataset:
    """Deterministic PCM WAV corpus derived from the documents table.
    Samples tile the ASCII hex of ``md5(doc text)``:
    ``s_i = c_{2i} + 256·c_{2i+1} - 26000`` (signed, straddling zero
    so crossings occur), n = 64 + doc_id%128 samples, rate = 8000 +
    4000·(doc_id%4), mono. Failure injection: every 8th doc
    (``doc_id % 8 == 6``) truncates mid-fmt; ``doc_id % 10 == 7``
    docs get their bits-per-sample field rewritten to 8 (unsupported
    variant, detected not mis-decoded)."""
    import hashlib

    def _make(batch: pa.Table) -> pa.Table:
        urls, payloads = [], []
        for doc_id, text in zip(
            batch.column("doc_id").to_pylist(), batch.column("text").to_pylist()
        ):
            seed = hashlib.md5((text or "").encode("utf-8")).hexdigest()
            stream = (seed * 24).encode("ascii")
            n = 64 + doc_id % 128
            raw = np.frombuffer(stream[: 2 * n], np.uint8).astype(np.int64)
            s = (raw[0::2] + 256 * raw[1::2] - 26000).astype(np.int16)
            rate = 8000 + 4000 * (doc_id % 4)
            data = encode_wav(s[:, None], rate)
            if doc_id % 8 == 6:
                data = data[:30]  # mid-fmt chunk
            elif doc_id % 10 == 7:
                buf = bytearray(data)
                # bits-per-sample lives at RIFF(12)+"fmt "+size(8)+14
                struct.pack_into("<H", buf, 12 + 8 + 14, 8)
                data = bytes(buf)
            urls.append(f"wav://doc/{doc_id}")
            payloads.append(data)
        return pa.Table.from_pydict(
            {"url": pa.array(urls, pa.string()), "payload": pa.array(payloads, pa.binary())}
        )

    return ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    ).map_batches(_make, batch_format="pyarrow")


_WAV_FEATURE_SCHEMA = pa.schema(
    [
        ("url", pa.string()),
        ("sample_rate", pa.int64()),
        ("n_samples", pa.int64()),
        ("n_channels", pa.int64()),
        ("duration_ms", pa.int64()),
        ("sum_sq", pa.int64()),
        ("zero_crossings", pa.int64()),
        ("decode_ok", pa.bool_()),
        ("error", pa.string()),
    ]
)


class WavFeatureExtractor:
    """REAL audio decode + exact-integer feature stage (see module
    docstring). Frozen zero-crossing rule: count of i>0 with
    ``sign(s_i) · sign(s_{i-1}) < 0`` on channel 0 (zeros sign-less:
    a zero sample never participates in a crossing)."""

    def __call__(self, batch: pa.Table) -> pa.Table:
        from .audio import parse_wav  # self-import keeps actor pickling simple

        cols: dict[str, list] = {f.name: [] for f in _WAV_FEATURE_SCHEMA}
        for url, data in zip(
            batch.column("url").to_pylist(), batch.column("payload").to_pylist()
        ):
            rate = n = ch = dur = ssq = zc = 0
            ok, err = False, ""
            try:
                rate, ch, samples = parse_wav(data or b"")
                n = samples.shape[0]
                dur = n * 1000 // rate
                s64 = samples.astype(np.int64)
                ssq = int((s64 * s64).sum())
                c0 = np.sign(s64[:, 0])
                zc = int(((c0[1:] * c0[:-1]) < 0).sum())
                ok = True
            except ValueError as exc:
                err = str(exc)
            cols["url"].append(url)
            cols["sample_rate"].append(rate if ok else 0)
            cols["n_samples"].append(n if ok else 0)
            cols["n_channels"].append(ch if ok else 0)
            cols["duration_ms"].append(dur if ok else 0)
            cols["sum_sq"].append(ssq if ok else 0)
            cols["zero_crossings"].append(zc if ok else 0)
            cols["decode_ok"].append(ok)
            cols["error"].append(err)
        return pa.Table.from_pydict(cols, schema=_WAV_FEATURE_SCHEMA)


def wav_features(
    sf_dir: str, concurrency=(1, 8), batch_size: int = 32
) -> ray.data.Dataset:
    """Actor-pool real-WAV decode + feature stage over the
    deterministic audio corpus — payload-size-aware batches like the
    other media stages."""
    return wav_from_documents(sf_dir).map_batches(
        WavFeatureExtractor,
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
        num_cpus=1,
    )


def spectral_peak_bin(samples: np.ndarray, rate: int) -> tuple[int, float]:
    """Dominant-frequency helper (float domain — pinned by pytest, not
    the SQL gate): (argmax bin of the rFFT magnitude over channel 0,
    its frequency in Hz). DC excluded."""
    mag = np.abs(np.fft.rfft(samples[:, 0].astype(np.float64)))
    mag[0] = 0.0
    k = int(np.argmax(mag))
    return k, k * rate / samples.shape[0]
