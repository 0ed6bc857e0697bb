"""Conformance corpus for the normalizer (M9–M11) — literal in/out pairs
matching the reference semantics (normalizer.py, tests/test_normalizer.py
in /root/reference)."""

from smart_ocr_ray.functions.normalize import (
    UNIT_SEPARATOR,
    clean_grounded,
    clean_latex_wrapper,
    clean_meta_header,
    clean_missing_page_markers,
    normalize,
    split_units,
    strip_phantom_images,
)


def test_grounding_tag_strip():
    assert clean_grounded("Hello <|ref|>x<|/ref|> world") == "Hello  world"


def test_det_tag_and_bbox_strip():
    assert clean_grounded("a <|det|>[[1,2,3,4]]<|/det|> b") == "a  b"
    assert clean_grounded("x [[10, 20, 30, 40]] y") == "x  y"


def test_special_token_strip():
    assert clean_grounded("<|grounding|>text<|end|>") == "text"


def test_html_strip_in_grounded():
    assert clean_grounded("line<br/>break <b>bold</b>") == "line\nbreak bold"


def test_meta_header_strip():
    assert normalize("# OCR Results\n\nActual content here.", extractor="meta") == (
        "Actual content here."
    )


def test_meta_lines_strip():
    text = "# OCR Results\n**Original File:** x.pdf\n**Processed:** now\nBody."
    assert clean_meta_header(text).strip() == "Body."


def test_latex_preamble_strip():
    text = "\\documentclass[12pt]{article}\\begin{document}Body text\\end{document}"
    assert clean_latex_wrapper(text) == "Body text"


def test_missing_page_markers():
    assert clean_missing_page_markers("a [MISSING_PAGE_POST:3] b [MISSING_PAGE_EMPTY:4] c") == "a  b  c"


def test_crlf_normalization():
    assert normalize("a\r\nb\rc") == "a\nb\nc"


def test_whole_output_fence_strip():
    assert normalize("```markdown\n# Title\n\nBody\n```") == "# Title\n\nBody"


def test_inner_fence_untouched():
    text = "intro\n```python\ncode\n```\noutro"
    assert normalize(text) == text


def test_line_repeat_collapse():
    line = "This line is long enough to be collapsed"
    assert normalize(("\n".join([line] * 6))) == line + "\n" + line
    # (the reference's regex leaves the final unterminated repeat, same here)


def test_short_line_repeat_kept():
    text = "ab\nab\nab\nab\nab\nab"
    assert normalize(text) == text


def test_unicode_map():
    assert normalize("‘a’ “b” – — …") == "'a' \"b\" - -- ..."


def test_ligatures_via_nfkc():
    assert normalize("ﬁne ﬂow oﬃce") == "fine flow office"


def test_trailing_ws_and_blank_collapse():
    assert normalize("a   \n\n\n\n\nb\t") == "a\n\nb"


def test_normalize_idempotent():
    samples = [
        "# H\n\npara one\n\n| a | b |\n| --- | --- |\n| 1 | 2 |",
        "text with  ‘quotes’ and ﬁ",
        "a\r\nb\n\n\n\nc",
    ]
    for s in samples:
        once = normalize(s)
        assert normalize(once) == once


def test_phantom_image_strip():
    text = "before ![fig](missing.png) after"
    assert strip_phantom_images(text) == "before  after"
    keep = "![f](https://x/y.png) and ![g](data:image/png;base64,xx)"
    assert strip_phantom_images(keep) == keep
    live = strip_phantom_images("![f](fig1.png)", live_paths=frozenset({"fig1.png"}))
    assert live == "![f](fig1.png)"


def test_unit_separator_roundtrip():
    units = ["page one", "page two", "page three"]
    assert split_units(UNIT_SEPARATOR.join(units)) == units
