"""Adversarial-input robustness: arbitrary bytes, mojibake, deep
nesting, and giant payloads must produce typed rows — never a crash,
never an unbounded stall (SURVEY §4.2 resilience posture)."""

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from smart_ocr_ray.document import process_payload

_ROW_KEYS = {
    "unit_id", "sub_id", "text", "word_count", "attempt_failures", "extractor",
    "audit_passed", "failure_mode", "confidence", "n_attempts",
    "extractors_tried", "agreement", "spans_json", "route", "is_native",
    "processing_ms",
}


@settings(max_examples=120, deadline=None)
@given(st.binary(min_size=0, max_size=4096), st.text(max_size=512))
def test_process_payload_never_raises_on_fuzz(html, text):
    rows = process_payload(html, text)
    assert rows, "at least one unit row"
    for r in rows:
        assert _ROW_KEYS <= set(r)
        assert isinstance(r["text"], str)


def test_mojibake_and_control_chars():
    nasty = (
        b"<html><body><p>" + bytes(range(256)) + b"</p>"
        b"<p>\xff\xfe\x00\x01 overlong \xc0\xaf sequence</p></body></html>"
    )
    rows = process_payload(nasty, "")
    assert rows[0]["failure_mode"] in (
        "none", "garbage", "low_word_count", "empty_output"
    )


def test_deeply_nested_html_is_bounded():
    depth = 4000
    payload = b"<div>" * depth + b"<p>core prose survives deep nesting with words</p>" + b"</div>" * depth
    rows = process_payload(b"<html><body>" + payload + b"</body></html>", "")
    assert rows  # no RecursionError, no crash
    assert "core prose survives" in rows[0]["text"]


def test_malformed_layout_magic_variants():
    from smart_ocr_ray.extractors.layout import MAGIC

    for payload in (
        MAGIC,                                  # header only, no newline
        MAGIC + b" v1 npages=zzz offsets=\n",   # unparseable count
        MAGIC + b" v1 npages=3 offsets=0,5\n",  # offsets/count mismatch
        MAGIC + b" v1 npages=1 offsets=0\nnot-zlib-data",
    ):
        rows = process_payload(payload, "")
        assert rows
        assert all(isinstance(r["text"], str) for r in rows)


def test_giant_html_row_chunks_and_survives(ray_session):
    """A single multi-MB html row takes the explode/chunk path and
    round-trips byte-identically to the whole-doc oracle."""
    import pyarrow as pa
    import ray.data

    from smart_ocr_ray.document import oracle_extract
    from smart_ocr_ray.pipelines.extract_pipeline import extract_pipeline

    paras = "".join(
        f"<p>Giant paragraph number {i} has enough ordinary words to pass audits "
        f"without tripping repetition checks since each index {i} differs.</p>"
        for i in range(20_000)
    )
    html = f"<html><body>{paras}</body></html>".encode()
    assert len(html) > 2_000_000
    row = {"url": "https://fixture.test/giant/000001", "warc_ts": 0,
           "html": html, "text": "", "lang": "en"}
    ds = ray.data.from_arrow(pa.Table.from_pylist([row]))
    out = extract_pipeline(ds, max_html_bytes=256 * 1024).take_all()
    assert len(out) == 1
    oracle = oracle_extract(html, "")
    assert out[0]["extracted_text"] == oracle["extracted_text"]
    assert out[0]["audit_passed"]


# ---- multimodal stand-in stages under codec-hostile inputs (r2
# VERDICT item 9): truncated payloads, zero-byte frames, max_dim=1 —
# the edge cases a real codec hits. Stages are exercised as plain
# callables (the actor-pool wrapper adds nothing to the semantics).


def _media_batch(rows):
    import pyarrow as pa

    cols = {k: [r.get(k) for r in rows] for k in rows[0]}
    schema_map = {
        "url": pa.string(), "payload": pa.binary(),
        "width": pa.int32(), "height": pa.int32(),
    }
    return pa.Table.from_pydict(
        {k: pa.array(v, schema_map[k]) for k, v in cols.items()}
    )


def test_decoder_truncated_and_empty_payloads():
    """FakeDecoder: zero-byte, one-byte, and mid-'frame' truncated
    payloads all produce typed rows with a full-length feature vector —
    the exact failure surface of a real codec on truncated files."""
    from smart_ocr_ray.ops.multimodal import FEATURE_DIM, FakeDecoder

    rows = [
        {"url": "u0", "payload": b""},
        {"url": "u1", "payload": b"\x00"},
        {"url": "u2", "payload": b"\xff" * 3},          # truncated header
        {"url": "u3", "payload": b"JFIF" + b"\x00" * 7},  # magic, no body
    ]
    out = FakeDecoder()(_media_batch(rows)).to_pylist()
    assert [r["url"] for r in out] == ["u0", "u1", "u2", "u3"]
    for r in out:
        assert len(r["features"]) == FEATURE_DIM
        assert r["width"] >= 1 and r["height"] >= 1
        assert all(f == f for f in r["features"])  # no NaNs
    assert out[0]["features"] == [0.0] * FEATURE_DIM  # empty → zero vector


def test_resizer_max_dim_one_and_truncated():
    """FakeResizer at max_dim=1 (the degenerate thumbnail): dims clamp
    to >= 1, payload shrinks but never empties for non-empty input, and
    zero-byte payloads survive."""
    from smart_ocr_ray.ops.multimodal import FakeResizer

    rows = [
        {"url": "u0", "payload": b"", "width": 4096, "height": 2048},
        {"url": "u1", "payload": b"x" * 10_000, "width": 4096, "height": 2048},
        {"url": "u2", "payload": b"y" * 5, "width": 0, "height": 0},  # hostile dims
        {"url": "u3", "payload": b"z" * 100, "width": 1, "height": 1},
    ]
    out = FakeResizer(max_dim=1)(_media_batch(rows)).to_pylist()
    for r in out:
        assert r["width"] >= 1 and r["height"] >= 1
        assert r["width"] <= max(1, 4096) and r["height"] <= 4096
    assert out[0]["payload"] == b""          # empty in, empty out
    assert len(out[1]["payload"]) >= 1       # never empties non-empty input
    assert out[1]["width"] == 1 and out[1]["height"] == 1
    assert out[3]["payload"] == b"z" * 100   # identity resize passes through


def test_frame_sampler_zero_byte_and_subframe_payloads(ray_session):
    """FrameSampler: a zero-byte video emits NO frame rows (not a
    phantom frame); a payload smaller than one frame emits exactly one
    truncated frame; output row count honors the hard per-row bound.
    The multimodal_frames row count over the canonical corpus is pinned
    stable."""
    from smart_ocr_ray.ops.multimodal import FRAME_BYTES, FrameSampler

    rows = [
        {"url": "u0", "payload": b""},
        {"url": "u1", "payload": b"a" * 10},               # sub-frame
        {"url": "u2", "payload": b"b" * (FRAME_BYTES * 100)},  # long video
    ]
    out = FrameSampler(stride=2, max_frames=8)(_media_batch(rows)).to_pylist()
    by_url = {}
    for r in out:
        by_url.setdefault(r["url"], []).append(r)
    assert "u0" not in by_url                 # zero-byte → no frames
    assert len(by_url["u1"]) == 1
    assert by_url["u1"][0]["payload"] == b"a" * 10
    assert len(by_url["u2"]) == 8             # hard cap honored
    assert all(len(r["payload"]) <= FRAME_BYTES for r in out)
    assert all(r["ts_ms"] == r["frame_idx"] * 1000 for r in out)


def test_pixmap_decoder_real_formats_and_corruption():
    """PixmapDecoder is a REAL pixel parser: known-value PPM/PGM/BMP
    payloads decode to exact dims and channel means; truncated and
    malformed payloads produce typed decode_ok=False rows."""
    import struct

    from smart_ocr_ray.ops.multimodal import PixmapDecoder

    # 2x1 PPM: one red pixel, one blue pixel.
    ppm = b"P6\n# comment\n2 1\n255\n" + bytes([255, 0, 0, 0, 0, 255])
    # 2x2 PGM, all gray 128.
    pgm = b"P5\n2 2\n255\n" + bytes([128] * 4)
    # 2x2 24-bit BMP, all white (stride 8 with 2 pad bytes per row).
    need = 8 * 2
    bmp = (b"BM" + struct.pack("<IHHI", 54 + need, 0, 0, 54)
           + struct.pack("<IiiHHIIiiII", 40, 2, 2, 1, 24, 0, need, 0, 0, 0, 0)
           + (bytes([255] * 6) + b"\x00\x00") * 2)
    rows = [
        {"url": "ppm", "payload": ppm},
        {"url": "pgm", "payload": pgm},
        {"url": "bmp", "payload": bmp},
        {"url": "trunc", "payload": ppm[:-3]},          # missing pixels
        {"url": "garbage", "payload": b"\x89PNG not supported"},
        {"url": "empty", "payload": b""},
        {"url": "badhdr", "payload": b"P6\n0 0\n255\n"},
    ]
    out = {r["url"]: r for r in PixmapDecoder()(_media_batch(rows)).to_pylist()}

    assert out["ppm"]["decode_ok"] and (out["ppm"]["width"], out["ppm"]["height"]) == (2, 1)
    f = out["ppm"]["features"]
    assert f[0] == 127.5 and f[1] == 0.0 and f[2] == 127.5  # mean R/G/B
    assert out["pgm"]["decode_ok"] and out["pgm"]["features"][0] == 128.0
    assert out["pgm"]["features"][3] == 0.0  # uniform gray → zero std
    assert out["bmp"]["decode_ok"] and (out["bmp"]["width"], out["bmp"]["height"]) == (2, 2)
    assert out["bmp"]["features"][:3] == [255.0, 255.0, 255.0]
    assert out["bmp"]["features"][6] == 1.0  # all bright

    for bad in ("trunc", "garbage", "empty", "badhdr"):
        assert not out[bad]["decode_ok"], bad
        assert out[bad]["error"], bad
        assert out[bad]["features"] == [0.0] * 8, bad


def test_raster_corpus_roundtrip(ray_session):
    """Writer/parser duality on the deterministic raster corpus: the
    real decoder recovers the generator's dims for every intact
    BMP/PNG/JPEG (progressive SOF2 for doc_id%8==7 JPEGs, baseline
    otherwise), flags exactly the every-7th truncated payloads, the
    %11==5 CRC-corrupt PNGs and the %13==11 mid-entropy-cut JPEGs."""
    from smart_ocr_ray.ops.multimodal import decode_rasters, raster_from_documents

    out = decode_rasters(raster_from_documents("/root/testdata/sf0.001")).take_all()
    assert out
    seen_fmts = set()
    prog_ok = 0
    fmt_of = {0: "bmp", 1: "png", 2: "png", 3: "jpg"}
    for r in out:
        doc_id = int(r["url"].rsplit("/", 1)[1])
        seen_fmts.add(r["fmt"])
        assert r["fmt"] == fmt_of[doc_id % 4]
        if doc_id % 7 == 3:
            assert not r["decode_ok"] and "truncated" in r["error"], r["url"]
        elif doc_id % 4 in (1, 2) and doc_id % 11 == 5:
            assert not r["decode_ok"], r["url"]
            assert r["error"] == "bad PNG chunk CRC (IDAT)"
        elif doc_id % 4 == 3 and doc_id % 13 == 11:
            assert not r["decode_ok"], r["url"]
            assert r["error"] == "truncated JPEG entropy stream"
        else:
            assert r["decode_ok"], (r["url"], r["error"])
            assert r["width"] == 8 + doc_id % 48
            assert r["height"] == 8 + (doc_id * 7) % 48
            if doc_id % 8 == 7:
                prog_ok += 1  # progressive JPEG decoded successfully
    assert seen_fmts == {"bmp", "png", "jpg"}
    assert prog_ok > 10  # the progressive class is actually exercised


def test_jpeg_codec_roundtrip_and_failures():
    """Baseline JPEG codec (ops/jpeg.py): uniform images round-trip
    EXACTLY (DC-only blocks land on the quantization grid), smooth
    gradients round-trip within tight error at q90, restart intervals
    decode identically to a single entropy segment, and the typed
    failure surface (truncation / not-a-JPEG / progressive) raises the
    oracle-predicted messages."""
    import numpy as np
    import pytest

    from smart_ocr_ray.ops.jpeg import encode_jpeg, parse_jpeg

    flat = np.full((16, 24, 1), 128, np.uint8)
    w, h, ch, rec = parse_jpeg(encode_jpeg(flat))
    assert (w, h, ch) == (24, 16, 1)
    assert np.array_equal(rec, flat)  # exact: uniform -> DC-only

    rgb = np.zeros((8, 8, 3), np.uint8)
    rgb[...] = (200, 50, 100)
    _, _, _, rec = parse_jpeg(encode_jpeg(rgb))
    assert np.abs(rec.astype(int) - rgb.astype(int)).max() <= 1

    yy, xx = np.mgrid[0:40, 0:56]
    grad = np.stack([yy * 4, xx * 3, (yy + xx) * 2], -1).clip(0, 255).astype(np.uint8)
    data = encode_jpeg(grad, quality=90)
    w, h, ch, rec = parse_jpeg(data)
    assert (w, h, ch) == (56, 40, 3)
    assert np.abs(rec.astype(int) - grad.astype(int)).max() <= 4

    _, _, _, rec_rst = parse_jpeg(encode_jpeg(grad, quality=90, restart=3))
    assert np.array_equal(rec, rec_rst)

    with pytest.raises(ValueError, match="truncated JPEG"):
        parse_jpeg(data[:40])
    with pytest.raises(ValueError, match="not a JPEG"):
        parse_jpeg(b"\x89PNG")
    # a baseline full-band scan inside a progressive frame violates
    # T.81's DC-scan rule (Ss=0 requires Se=0) — typed, not mis-decoded
    prog = bytearray(data)
    sof = prog.find(b"\xff\xc0")
    prog[sof + 1] = 0xC2
    with pytest.raises(ValueError, match="bad JPEG progressive scan"):
        parse_jpeg(bytes(prog))
    # arithmetic-coded SOF9 stays a typed unsupported variant
    arith = bytearray(data)
    arith[sof + 1] = 0xC9
    with pytest.raises(ValueError, match="not baseline"):
        parse_jpeg(bytes(arith))


def test_jpeg_progressive_decodes_identically_to_baseline():
    """Progressive JPEG (SOF2) decode correctness, pinned against the
    baseline decoder as reference: encode_jpeg_progressive quantizes
    identically to encode_jpeg, so decoding its multi-scan stream
    (DC first/refine, per-band AC first/refine with EOBn runs and
    correction bits) must reproduce BYTE-IDENTICAL pixels to decoding
    the baseline encoding — any error in any scan path breaks the
    equality. Mid-entropy truncation is the typed failure the
    raster-corpus oracle predicts."""
    import numpy as np
    import pytest

    from smart_ocr_ray.ops.jpeg import (
        encode_jpeg,
        encode_jpeg_progressive,
        parse_jpeg,
    )

    rng = np.random.default_rng(17)
    for h, w, ch, q in ((8, 8, 1, 75), (24, 17, 3, 40), (41, 56, 3, 90)):
        if ch == 3 and q == 90:
            yy, xx = np.mgrid[0:h, 0:w]
            px = (
                np.stack([yy * 4, xx * 3, (yy + xx) * 2], -1)
                .clip(0, 255)
                .astype(np.uint8)
            )
        else:
            px = rng.integers(0, 256, (h, w, ch)).astype(np.uint8)
        base = parse_jpeg(encode_jpeg(px, quality=q))
        prog_bytes = encode_jpeg_progressive(px, quality=q)
        prog = parse_jpeg(prog_bytes)
        assert base[:3] == prog[:3] == (w, h, ch)
        assert np.array_equal(base[3], prog[3])

    # strict prefix of a scan's entropy data -> typed truncation
    sos = prog_bytes.index(b"\xff\xda")
    import struct as _st

    seg_len = _st.unpack_from(">H", prog_bytes, sos + 2)[0]
    with pytest.raises(ValueError, match="truncated JPEG entropy stream"):
        parse_jpeg(prog_bytes[: sos + 2 + seg_len + 1])
    # cut between scans: missing EOI is still a typed truncation
    with pytest.raises(ValueError, match="truncated JPEG"):
        parse_jpeg(prog_bytes[: len(prog_bytes) - 2])


def test_png_codec_roundtrip_exact_pixels():
    """_write_png → _parse_png recovers the EXACT pixel array for RGB
    and grayscale images tall enough that every filter type (0-4) is
    used on some scanline — byte-exact reconstruction through zlib
    inflate + Sub/Up/Average/Paeth filter inversion."""
    import numpy as np

    from smart_ocr_ray.ops.multimodal import _parse_png, _write_png

    rng = np.random.default_rng(7)
    for ch in (3, 1):
        px = rng.integers(0, 256, size=(11, 5, ch), dtype=np.uint8)
        w, h, ch_out, rec = _parse_png(_write_png(px))
        assert (w, h, ch_out) == (5, 11, ch)
        assert np.array_equal(rec, px)


def test_png_codec_failure_surface():
    """Typed failures: truncation mid-chunk, CRC corruption, corrupt
    IDAT stream, unsupported variants — each a ValueError with a
    deterministic message (the oracle-predicted strings)."""
    import struct
    import zlib

    import numpy as np
    import pytest

    from smart_ocr_ray.ops.multimodal import _parse_png, _write_png

    px = np.arange(60, dtype=np.uint8).reshape(4, 5, 3)
    good = _write_png(px)
    assert _parse_png(good)[:2] == (5, 4)

    with pytest.raises(ValueError, match="truncated PNG chunk"):
        _parse_png(good[:39])
    buf = bytearray(good)
    buf[-13] ^= 0xFF  # last byte of IDAT CRC
    with pytest.raises(ValueError, match=r"bad PNG chunk CRC \(IDAT\)"):
        _parse_png(bytes(buf))
    # corrupt the deflate stream but fix the CRC so the chunk passes
    bad = bytearray(good)
    idat_len = struct.unpack_from(">I", good, 33)[0]
    bad[41 + 2] ^= 0xFF  # inside IDAT payload
    crc = zlib.crc32(bytes(bad[37 : 41 + idat_len])) & 0xFFFFFFFF
    struct.pack_into(">I", bad, 41 + idat_len, crc)
    with pytest.raises(ValueError, match="bad PNG IDAT stream"):
        _parse_png(bytes(bad))
    # unsupported: 16-bit depth in IHDR (CRC fixed)
    deep = bytearray(good)
    deep[24] = 16
    crc = zlib.crc32(bytes(deep[12:29])) & 0xFFFFFFFF
    struct.pack_into(">I", deep, 29, crc)
    with pytest.raises(ValueError, match="unsupported PNG"):
        _parse_png(bytes(deep))
    with pytest.raises(ValueError, match="not a PNG"):
        _parse_png(b"\x89PNG but not really")


@given(
    st.lists(st.integers(min_value=0, max_value=200), min_size=1, max_size=60),
    st.integers(min_value=1, max_value=20),
)
@settings(max_examples=200, deadline=None)
def test_span_union_gap_identity(positions, w):
    """The sorted-gap identity substring_dedup and its SQL oracle both
    use — covered = w + Σ min(gap, w) — equals the brute-force union of
    [pos, pos+w) intervals for ANY position multiset."""
    import numpy as np

    pos = np.sort(np.unique(np.asarray(positions, dtype=np.int64)))
    fast = w + int(np.minimum(np.diff(pos), w).sum())
    brute = len({p + i for p in pos for i in range(w)})
    assert fast == brute


@given(
    st.lists(st.integers(min_value=0, max_value=50), min_size=1, max_size=40),
    st.integers(min_value=1, max_value=64),
)
@settings(max_examples=200, deadline=None)
def test_token_packing_window_invariants(counts, budget):
    """Window arithmetic invariants for any doc-length sequence: spans
    are contiguous, consecutive docs abut exactly, and total windows =
    ceil(total_tokens / budget)."""
    cum = 0
    last_end = None
    for n in counts:
        if n == 0:
            continue
        start = cum
        first, last = start // budget, (start + n - 1) // budget
        assert first <= last
        if last_end is not None:
            assert first in (last_end, last_end + 1) or start % budget == 0
            # The next doc starts exactly where the previous ended.
        cum += n
        last_end = last
    total = sum(counts)
    if total:
        assert last_end == (total - 1) // budget


def test_new_link_ops_survive_malformed_markup(ray_session, tmp_path):
    """The ninth-session link ops (section graph/profile, HyperBall,
    HITS, clustering, frontier) run to completion on adversarial
    markup — unclosed tags, attribute-less anchors, href-less anchors,
    self-closing anchors, entity soup, a link to a '//'-prefixed
    protocol-relative target — and agree on the page set."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from smart_ocr_ray.ops.links import (
        link_clustering,
        link_frontier,
        link_harmonic,
        link_hits,
        section_graph,
        section_profile,
    )

    pages = [
        b"<html><body><a href='/p/1'>unquoted attr style</a><p>t</p>",
        b'<html><body><a>no href</a><a href>empty</a><a href="/p/0">ok</a>',
        b'<html><body><a href="//cdn.test/x">protocol-relative</a><p>&amp;&bogus;</p></body></html>',
        b'<html><body><a href="/p/1"/><a href="/p/1"></a><table><tr><td><a href="/p/0">nested',
    ]
    urls = [f"https://h.test/p/{i}" for i in range(len(pages))]
    pdir = tmp_path / "pages"; pdir.mkdir()
    pq.write_table(
        pa.Table.from_pydict({
            "url": pa.array(urls),
            "warc_ts": pa.array(list(range(len(pages))), pa.timestamp("us")),
            "html": pa.array(pages, pa.binary()),
            "text": pa.array(["t"] * len(pages)),
            "lang": pa.array(["en"] * len(pages)),
        }),
        pdir / "pages.parquet",
    )
    p = str(pdir)
    n = len(urls)
    assert len(link_harmonic(p).take_all()) == n
    assert len(link_hits(p).take_all()) == n
    assert len(link_clustering(p).take_all()) == n
    assert len(link_frontier(p).take_all()) == n
    prof = {r["section"]: r for r in section_profile(p).take_all()}
    assert sum(r["n_pages"] for r in prof.values()) == n
    # protocol-relative '//cdn.test/x' resolves as site-internal by the
    # frozen href-starts-with-'/' rule: it becomes a dangling target
    # (https://h.test//cdn.test/x does not exist) and forms no edge.
    sg = section_graph(p).take_all()
    assert all(r["dst_section"].startswith("https://h.test") for r in sg)


def test_gif_codec_lzw_roundtrip_and_failures():
    """GIF codec (ops/gif.py): LZW encode/decode round-trips random
    index streams across palette sizes (dictionary growth + 4096
    reset), a 3-frame animated GIF with frame-0 interlacing decodes
    to the exact source indices with the right delays, and truncated
    payloads raise the typed errors."""
    import numpy as np
    import pytest

    from smart_ocr_ray.ops.gif import (
        _lzw_decode,
        _lzw_encode,
        encode_gif,
        parse_gif,
    )

    rng = np.random.default_rng(1)
    for alpha in (4, 16, 256):
        n = int(rng.integers(1, 6000))
        data = bytes(rng.integers(0, alpha, n, dtype=np.uint8))
        mcs = max(2, (alpha - 1).bit_length())
        assert _lzw_decode(mcs, _lzw_encode(mcs, data), n) == data

    pal = np.stack([np.arange(256)] * 3, 1).astype(np.uint8)
    frames = [rng.integers(0, 256, (13, 17), dtype=np.uint8) for _ in range(3)]
    data = encode_gif(frames, pal, delays_cs=[4, 5, 6], interlace_frame0=True)
    w, h, decoded, delays = parse_gif(data)
    assert (w, h, delays) == (17, 13, [4, 5, 6])
    for src, out in zip(frames, decoded):
        assert np.array_equal(out[..., 0], src)  # exact pixel recovery
        assert np.array_equal(out[..., 0], out[..., 1])  # gray palette

    with pytest.raises(ValueError, match="truncated GIF"):
        parse_gif(data[:20])
    with pytest.raises(ValueError, match="not a GIF"):
        parse_gif(b"NOPE")
    with pytest.raises(ValueError, match="truncated GIF"):
        parse_gif(data[:-1])  # missing trailer


def test_wav_codec_and_spectral_peak():
    """WAV codec (ops/audio.py): encode/parse round-trips exact int16
    samples; a pure 440 Hz sinusoid's spectral peak lands on the right
    FFT bin; failures are typed (truncation, 8-bit, float format,
    not-a-WAV)."""
    import struct

    import numpy as np
    import pytest

    from smart_ocr_ray.ops.audio import (
        encode_wav,
        parse_wav,
        spectral_peak_bin,
    )

    rate = 8000
    t = np.arange(2048) / rate
    sine = (10000 * np.sin(2 * np.pi * 440 * t)).astype(np.int16)[:, None]
    data = encode_wav(sine, rate)
    r2, ch, rec = parse_wav(data)
    assert (r2, ch) == (rate, 1)
    assert np.array_equal(rec, sine)  # exact PCM round-trip
    k, hz = spectral_peak_bin(rec, rate)
    assert k == round(440 * 2048 / rate)  # bin 113
    assert abs(hz - 440) < rate / 2048  # within one bin width

    with pytest.raises(ValueError, match="truncated WAV"):
        parse_wav(data[:30])
    with pytest.raises(ValueError, match="not a WAV"):
        parse_wav(b"RIFFxxxxAIFF")
    bad = bytearray(data)
    struct.pack_into("<H", bad, 12 + 8 + 14, 8)
    with pytest.raises(ValueError, match=r"unsupported WAV \(8-bit\)"):
        parse_wav(bytes(bad))
    fl = bytearray(data)
    struct.pack_into("<H", fl, 12 + 8 + 0, 3)  # IEEE float format tag
    with pytest.raises(ValueError, match=r"unsupported WAV \(format 3\)"):
        parse_wav(bytes(fl))


@given(st.data())
@settings(max_examples=120, deadline=None)
def test_codec_fuzz_typed_failures_only(data):
    """Crawl-decoder robustness property: ANY single-byte mutation,
    truncation, or extension of a valid PNG/JPEG/GIF/WAV payload
    either decodes or raises ValueError — never any other exception,
    never a hang. (The PixmapDecoder/actor stages rely on exactly
    this contract to emit typed failure rows.)"""
    import numpy as np

    from smart_ocr_ray.ops.audio import encode_wav, parse_wav
    from smart_ocr_ray.ops.gif import encode_gif, parse_gif
    from smart_ocr_ray.ops.jpeg import (
        encode_jpeg,
        encode_jpeg_progressive,
        parse_jpeg,
    )
    from smart_ocr_ray.ops.multimodal import _parse_png, _write_png

    rng = np.random.default_rng(99)
    px = rng.integers(0, 256, (9, 11, 3), dtype=np.uint8)
    pal = np.stack([np.arange(256)] * 3, 1).astype(np.uint8)
    samples = rng.integers(-3000, 3000, (64, 1)).astype(np.int16)
    corpus = [
        (_write_png(px), _parse_png),
        (encode_jpeg(px), parse_jpeg),
        (encode_gif([px[..., 0]], pal), parse_gif),
        (encode_wav(samples, 8000), parse_wav),
        (encode_jpeg_progressive(px), parse_jpeg),
    ]
    payload, parser = corpus[data.draw(st.integers(0, 4))]
    mode = data.draw(st.integers(0, 2))
    buf = bytearray(payload)
    if mode == 0:  # single-byte mutation
        i = data.draw(st.integers(0, len(buf) - 1))
        buf[i] ^= data.draw(st.integers(1, 255))
    elif mode == 1:  # truncation
        buf = buf[: data.draw(st.integers(0, len(buf) - 1))]
    else:  # garbage extension
        buf += bytes(data.draw(st.binary(min_size=1, max_size=64)))
    try:
        parser(bytes(buf))
    except ValueError:
        pass  # the one allowed failure type


@settings(max_examples=300, deadline=None)
@given(st.text(max_size=200))
def test_canonicalize_url_idempotent(u):
    """Canonicalization is a projection: applying it twice equals
    applying it once on ANY string — the property every url-keyed
    stage (dedup, resume, link joins, redirect resolution) relies on
    when it canonicalizes its own output and re-keys."""
    from smart_ocr_ray.ops.urls import canonicalize_url

    once = canonicalize_url(u)
    assert canonicalize_url(once) == once


def test_jpeg_fill_bytes_before_markers():
    """T.81 B.1.1.2: any number of 0xFF fill bytes may precede a
    marker. Inject fill bytes before a mid-file segment marker of both
    a baseline and a progressive file — decode must be byte-identical
    to the unpadded file, not a spurious truncation error."""
    import numpy as np

    from smart_ocr_ray.ops.jpeg import (
        encode_jpeg,
        encode_jpeg_progressive,
        parse_jpeg,
    )

    rng = np.random.default_rng(5)
    px = rng.integers(0, 256, (16, 13, 3)).astype(np.uint8)
    for enc in (encode_jpeg, encode_jpeg_progressive):
        data = enc(px)
        want = parse_jpeg(data)
        # pad before the first DHT (0xFFC4) and before EOI
        dht = data.index(b"\xff\xc4")
        padded = data[:dht] + b"\xff\xff\xff" + data[dht:]
        eoi = padded.rindex(b"\xff\xd9")
        padded = padded[:eoi] + b"\xff" + padded[eoi:]
        got = parse_jpeg(padded)
        assert got[:3] == want[:3]
        assert np.array_equal(got[3], want[3])
