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
    (/root/reference/src/socr/figures/extractor.py:222-258 analog),
  * drawing blocks → vector-figure clustering: union-find over bboxes
    with a 30pt gap threshold, area/aspect/margin filters, landscape
    relaxation + presentation fallback, capped at 3 figures/page
    (figures/extractor.py:60-78,108-217,351-413 — X1/O6).

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

# Figure-pass constants (/root/reference/src/socr/figures/extractor.py:60-78).
MIN_AREA = 80 * 80
MIN_DRAWINGS_FOR_VECTOR = 5
MIN_VECTOR_AREA_RATIO = 0.05
MAX_VECTOR_AREA_RATIO = 0.85
HEADER_FOOTER_MARGIN = 0.1
CLUSTER_GAP = 30.0
MAX_FIGURES_PER_PAGE = 3  # FigureExtractor(max_per_page=3)


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
    from ..functions import deadline

    npages, offsets, body = _parse_header(payload)
    bounds = offsets + [len(payload) - body]
    pages = []
    for i in range(npages):
        deadline.check()  # decompress is per-page work too (X4)
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


def _cluster_drawings(
    boxes: list[list[float]], gap: float = CLUSTER_GAP
) -> list[tuple[int, tuple[float, float, float, float]]]:
    """Union-find clustering of drawing bboxes into figure regions
    (figures/extractor.py:351-413): two boxes join when their horizontal
    AND vertical gaps are both <= ``gap`` (30pt). Returns
    ``[(n_drawings, merged_bbox)]`` sorted by (y0, x0).

    O(n^2) pairwise within one page — fine because a page's drawing
    count is small and bounded by the payload, never the corpus.
    """
    n = len(boxes)
    parent = list(range(n))

    def find(x: int) -> int:
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for i in range(n):
        x0i, y0i, x1i, y1i = boxes[i]
        for j in range(i + 1, n):
            x0j, y0j, x1j, y1j = boxes[j]
            h_gap = max(0.0, x0j - x1i, x0i - x1j)
            v_gap = max(0.0, y0j - y1i, y0i - y1j)
            if h_gap <= gap and v_gap <= gap:
                ri, rj = find(i), find(j)
                if ri != rj:
                    parent[ri] = rj

    clusters: dict[int, list[int]] = {}
    for i in range(n):
        clusters.setdefault(find(i), []).append(i)
    out = []
    for idxs in clusters.values():
        bs = [boxes[i] for i in idxs]
        out.append(
            (
                len(idxs),
                (
                    min(b[0] for b in bs),
                    min(b[1] for b in bs),
                    max(b[2] for b in bs),
                    max(b[3] for b in bs),
                ),
            )
        )
    out.sort(key=lambda r: (r[1][1], r[1][0]))
    return out


def _vector_figures(
    raw_blocks: list[dict], width: float, height: float, processed: set
) -> list[dict]:
    """Strategy-0 vector-figure pass (figures/extractor.py:108-217, X1):
    cluster drawing-block bboxes, filter by area / aspect / page-area
    ratio / header-footer margin with landscape relaxation, and return
    accepted figure pseudo-blocks, already capped at
    ``MAX_FIGURES_PER_PAGE``. Includes the landscape presentation
    fallback (whole-slide region when clusters all fail the filters).
    ``processed`` collects int-bbox dedup keys shared with the image
    pass."""
    drawings = [b["bbox"] for b in raw_blocks if b.get("kind") == "drawing"]
    is_landscape = width > height
    min_drawings = 3 if is_landscape else MIN_DRAWINGS_FOR_VECTOR
    if len(drawings) < min_drawings:
        return []
    min_ratio = MIN_VECTOR_AREA_RATIO * 0.5 if is_landscape else MIN_VECTOR_AREA_RATIO
    max_ratio = 0.98 if is_landscape else MAX_VECTOR_AREA_RATIO
    page_area = (width * height) or 1.0

    accepted: list[dict] = []
    for count, (x0, y0, x1, y1) in _cluster_drawings(drawings):
        if len(accepted) >= MAX_FIGURES_PER_PAGE:
            break
        w, h = x1 - x0, y1 - y0
        area = w * h
        ratio = area / page_area
        if area < MIN_AREA or w < 50 or h < 50:
            continue
        if ratio < min_ratio or ratio > max_ratio:
            continue
        if count < min_drawings:
            continue
        if not is_landscape:
            cy = (y0 + y1) / 2.0
            in_margin = cy < height * HEADER_FOOTER_MARGIN or cy > height * (
                1 - HEADER_FOOTER_MARGIN
            )
            if in_margin and count < 20:
                continue
        key = (int(x0), int(y0), int(x1), int(y1))
        if key in processed:
            continue
        processed.add(key)
        accepted.append({"bbox": [x0, y0, x1, y1], "kind": "vfigure", "n": count})

    # Presentation fallback (extractor.py:205-217): a landscape slide
    # whose strokes never cluster into a filter-passing region is itself
    # the figure.
    if is_landscape and not accepted and len(drawings) >= 10:
        accepted.append(
            {
                "bbox": [width * 0.05, height * 0.15, width * 0.95, height * 0.90],
                "kind": "vfigure",
                "n": len(drawings),
            }
        )
    return accepted


def _accept_images(
    raw_blocks: list[dict], processed: set, budget: int
) -> list[dict]:
    """Strategy-1 image-block pass (figures/extractor.py:222-258, X2):
    area/aspect filters + shared dedup, capped by the page's remaining
    figure budget. Walks blocks in (y0, x0) order so the cap keeps the
    top-of-page figures, matching the reference's reading-order walk."""
    accepted: list[dict] = []
    images = sorted(
        (b for b in raw_blocks if b.get("kind") == "image"),
        key=lambda b: (b["bbox"][1], b["bbox"][0]),
    )
    for b in images:
        if len(accepted) >= budget:
            break
        x0, y0, x1, y1 = b["bbox"]
        w, h = x1 - x0, y1 - y0
        area = w * h
        aspect = w / max(h, 1)
        if area < MIN_AREA or aspect > 8 or aspect < 0.125:
            continue
        key = (int(x0), int(y0), int(x1), int(y1))
        if key in processed:
            continue
        processed.add(key)
        accepted.append(b)
    return accepted


def parse_page(page: dict, unit_id: int) -> UnitResult:
    """Layout-analyze one page dict into ordered blocks."""
    width = float(page.get("width", 612.0))
    height = float(page.get("height", 792.0))
    raw_blocks = page.get("blocks", [])
    text_blocks = [b for b in raw_blocks if b.get("kind", "text") in ("text", "table")]
    starts = _estimate_columns(raw_blocks, width)

    # Figure pass in the reference's strategy order (vector clusters
    # first, then image blocks), sharing the per-page dedup set and the
    # per-page cap (O6): vector figures consume the budget before
    # images, as in extractor.py:158-258.
    processed: set = set()
    vector_figs = _vector_figures(raw_blocks, width, height, processed)
    image_figs = _accept_images(
        raw_blocks, processed, MAX_FIGURES_PER_PAGE - len(vector_figs)
    )
    figure_blocks = vector_figs + image_figs

    # Reading order: column-major (left column top-to-bottom first),
    # then y0, then x0 — the reading-order reconstruction the north
    # star asks for. Accepted figures take their bbox position.
    ordered = sorted(
        [b for b in raw_blocks if b.get("kind", "text") in ("text", "table")]
        + figure_blocks,
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
        if kind == "vfigure":
            bbox = ",".join(f"{v:g}" for v in b["bbox"])
            blocks.append(Block(FIGURE, "", meta=f"vector@{bbox}|n={b['n']}"))
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
    from ..functions import deadline

    try:
        pages = _decode_pages(payload)
    except deadline.DeadlineExceeded:
        raise
    except Exception as exc:
        return [UnitResult(unit_id=unit_base + 1, error=f"parse_error: {exc}")]
    out = []
    for i, p in enumerate(pages):
        # Cooperative per-page deadline poll: a pathological multi-page
        # payload aborts between pages, not after the full parse (X4).
        deadline.check()
        out.append(parse_page(p, unit_base + i + 1))
    return out
