"""Layout extractor ("layout") for binary page payloads — the heavy,
stateful stage (A2/A3 analog).

Real PDF rasterization/OCR libraries are not available in this
environment, so binary documents use a deterministic synthetic layout
format (``%FIX-LAYOUT``): per-page zlib blobs of positioned text /
image / table / drawing blocks with bboxes and font metadata. The
*parsing work is real layout analysis* — the same geometry the
reference runs via PyMuPDF:

  * column estimation by x-center gap clustering
    (/root/reference/src/socr/core/difficulty.py:200-231 semantics),
  * reading-order reconstruction (sort by column, then y, then x),
  * span merging: lines within a block merge with hyphenation repair,
  * tables → markdown (born_digital.py:593-642 semantics),
  * image blocks → figure spans with bboxes
    (/root/reference/src/socr/figures/extractor.py:222-258 analog).

Payload layout::

    %FIX-LAYOUT v1 npages=N offsets=o1,o2,...\\n
    <zlib(page-1 JSON)><zlib(page-2 JSON)>...

offsets are relative to the end of the header line, so a contiguous
page range can be byte-sliced without decompressing — the chunk
explode path (M14/C7) relies on this.
"""

from __future__ import annotations

import json
import zlib

from .base import Block, FIGURE, HEADING, TABLE, UnitResult

MAGIC = b"%FIX-LAYOUT"
COLUMN_GAP_FRACTION = 0.15  # difficulty.py:224
MAX_COLUMNS = 4


# ---------------------------------------------------------------- payload io


def build_payload(pages: list[dict]) -> bytes:
    """Serialize page dicts into the %FIX-LAYOUT container."""
    blobs = [zlib.compress(json.dumps(p, sort_keys=True).encode("utf-8"), 6) for p in pages]
    offsets = []
    pos = 0
    for blob in blobs:
        offsets.append(pos)
        pos += len(blob)
    header = (
        MAGIC
        + b" v1 npages=%d offsets=%s\n" % (len(pages), ",".join(map(str, offsets)).encode())
    )
    return header + b"".join(blobs)


def _parse_header(payload: bytes) -> tuple[int, list[int], int]:
    """Return (npages, offsets, body_start)."""
    nl = payload.index(b"\n")
    header = payload[:nl].decode("ascii")
    fields = dict(f.split("=", 1) for f in header.split(" ") if "=" in f)
    npages = int(fields["npages"])
    offsets = [int(x) for x in fields["offsets"].split(",")] if npages else []
    return npages, offsets, nl + 1


def peek_npages(payload: bytes) -> int:
    """Page count from the header only (used by the explode router)."""
    try:
        return _parse_header(payload)[0]
    except Exception:
        return 0


def slice_pages(payload: bytes, start: int, end: int) -> bytes:
    """Byte-slice pages [start, end) into a standalone payload (0-based).

    No decompression — this is the cheap chunk split the skew path needs.
    """
    npages, offsets, body = _parse_header(payload)
    start = max(0, start)
    end = min(npages, end)
    bounds = offsets + [len(payload) - body]
    blobs = [payload[body + bounds[i] : body + bounds[i + 1]] for i in range(start, end)]
    new_offsets = []
    pos = 0
    for blob in blobs:
        new_offsets.append(pos)
        pos += len(blob)
    header = MAGIC + b" v1 npages=%d offsets=%s\n" % (
        len(blobs),
        ",".join(map(str, new_offsets)).encode(),
    )
    return header + b"".join(blobs)


def _decode_pages(payload: bytes) -> list[dict]:
    npages, offsets, body = _parse_header(payload)
    bounds = offsets + [len(payload) - body]
    pages = []
    for i in range(npages):
        blob = payload[body + bounds[i] : body + bounds[i + 1]]
        pages.append(json.loads(zlib.decompress(blob)))
    return pages


# ---------------------------------------------------------------- layout analysis


def _estimate_columns(blocks: list[dict], page_width: float) -> list[float]:
    """Column boundaries from text-block x-centers (gap clustering, capped
    at 4 columns). Returns sorted column-start x positions."""
    centers = sorted(
        (b["bbox"][0] + b["bbox"][2]) / 2.0 for b in blocks if b.get("kind", "text") == "text"
    )
    if len(centers) < 2 or page_width <= 0:
        return [0.0]
    gap_threshold = page_width * COLUMN_GAP_FRACTION
    starts = [0.0]
    for i in range(1, len(centers)):
        if centers[i] - centers[i - 1] > gap_threshold and len(starts) < MAX_COLUMNS:
            starts.append((centers[i] + centers[i - 1]) / 2.0)
    return starts


def _column_of(block: dict, starts: list[float]) -> int:
    center = (block["bbox"][0] + block["bbox"][2]) / 2.0
    col = 0
    for i, s in enumerate(starts):
        if center >= s:
            col = i
    return col


def _merge_lines(lines: list[str]) -> str:
    """Span merging: join physical lines into block text, repairing
    end-of-line hyphenation (``exam-`` + ``ple`` → ``example``)."""
    out = ""
    for line in lines:
        line = " ".join(line.split())
        if not line:
            continue
        if out.endswith("-") and out[-2:-1].isalpha() and line[:1].isalpha():
            out = out[:-1] + line
        elif out:
            out += " " + line
        else:
            out = line
    return out


def _table_md(cells: list[list]) -> str:
    rows = [[(c.strip() if isinstance(c, str) else "") for c in row] for row in cells]
    rows = [r for r in rows if r]
    if not rows:
        return ""
    col_count = max(len(r) for r in rows)
    for r in rows:
        r.extend("" for _ in range(col_count - len(r)))
    lines = ["| " + " | ".join(rows[0]) + " |"]
    lines.append("| " + " | ".join("---" for _ in range(col_count)) + " |")
    for r in rows[1:]:
        lines.append("| " + " | ".join(r) + " |")
    return "\n".join(lines)


def parse_page(page: dict, unit_id: int) -> UnitResult:
    """Layout-analyze one page dict into ordered blocks."""
    width = float(page.get("width", 612.0))
    raw_blocks = page.get("blocks", [])
    text_blocks = [b for b in raw_blocks if b.get("kind", "text") in ("text", "table")]
    starts = _estimate_columns(raw_blocks, width)

    # Reading order: column-major (left column top-to-bottom first),
    # then y0, then x0 — the reading-order reconstruction the north
    # star asks for.
    ordered = sorted(
        raw_blocks,
        key=lambda b: (
            _column_of(b, starts) if b.get("kind", "text") in ("text", "table") else 0,
            round(b["bbox"][1], 2),
            round(b["bbox"][0], 2),
        ),
    )

    # Font-size median over text blocks → heading threshold.
    sizes = sorted(b.get("size", 10.0) for b in text_blocks if b.get("kind", "text") == "text")
    median_size = sizes[len(sizes) // 2] if sizes else 10.0

    blocks: list[Block] = []
    for b in ordered:
        kind = b.get("kind", "text")
        if kind == "drawing":
            continue
        if kind == "image":
            bbox = ",".join(f"{v:g}" for v in b["bbox"])
            blocks.append(Block(FIGURE, "", meta=f"image@{bbox}"))
            continue
        if kind == "table":
            md = _table_md(b.get("cells", []))
            if md:
                blocks.append(Block(TABLE, md))
            continue
        text = _merge_lines(b.get("lines", []))
        if not text:
            continue
        if b.get("size", 10.0) > 1.5 * median_size:
            blocks.append(Block(HEADING, "# " + text))
        elif b.get("size", 10.0) > 1.2 * median_size:
            blocks.append(Block(HEADING, "## " + text))
        else:
            from .base import PROSE, EQUATION

            if text.startswith("$$") and text.endswith("$$"):
                blocks.append(Block(EQUATION, text))
            else:
                blocks.append(Block(PROSE, text))
    return UnitResult(unit_id=unit_id, blocks=blocks)


def extract_layout(payload: bytes, text_layer: str = "", unit_base: int = 0) -> list[UnitResult]:
    """Parse a %FIX-LAYOUT payload into one UnitResult per page.

    ``unit_base`` rebases page numbers for chunked payloads so units of
    a split document keep their original 1-based ids.
    """
    try:
        pages = _decode_pages(payload)
    except Exception as exc:
        return [UnitResult(unit_id=unit_base + 1, error=f"parse_error: {exc}")]
    return [parse_page(p, unit_base + i + 1) for i, p in enumerate(pages)]
