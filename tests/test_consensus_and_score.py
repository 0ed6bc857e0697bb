"""Multi-extractor consensus mode (C5/D5), benchmark scoring pipeline
(F1-F4/G7/J4), figure captioning (A6), and the CLI."""

import json

import pytest

from smart_ocr_ray.document import process_payload
from smart_ocr_ray.fixtures import build_row, class_of
from smart_ocr_ray.functions.captions import classify_figure_type, describe_figure


def _rows_of(cls, n=2):
    idx = [i for i in range(300) if class_of(i) == cls][:n]
    return [build_row(i) for i in idx]


# ---------------------------------------------------------------- consensus


def test_multi_extractor_runs_all_and_dom_wins_on_boilerplate():
    row = _rows_of("boilerplate")[0]
    rows = process_payload(row["html"], row["text"], multi_extractor=True)
    assert len(rows) == 1
    r = rows[0]
    tried = r["extractors_tried"].split(",")
    assert set(tried) >= {"dom", "rawtext"}
    assert r["n_attempts"] >= 2
    # dom strips boilerplate; rawtext keeps nav/footer noise — the
    # consensus scorer must pick dom.
    assert r["extractor"] == "dom"
    assert 0.0 <= r["agreement"] < 1.0


def test_multi_extractor_grounded_against_native_text():
    row = _rows_of("prose")[0]
    rows = process_payload(row["html"], row["text"], multi_extractor=True)
    r = rows[0]
    # Grounded scoring (consensus.py:137-169): dom's output tracks the
    # native reference closely (tiny WER from the page heading) and
    # earns the +5 structure bonus for its markdown heading, so it
    # outscores the structure-less native attempt — exactly the
    # reference formula's preference for structured output near the
    # grounding text.
    assert r["extractor"] == "dom"
    assert r["audit_passed"]
    assert set(r["extractors_tried"].split(",")) == {"native", "dom", "rawtext"}


def test_multi_extractor_agreement_high_for_consistent_sources():
    row = _rows_of("prose")[0]
    rows = process_payload(row["html"], row["text"], multi_extractor=True)
    # native text and dom extraction of the same prose largely agree.
    assert rows[0]["agreement"] > 0.5


# ---------------------------------------------------------------- captions


def test_classify_figure_type_taxonomy():
    assert classify_figure_type("fig1.png|Output gap chart") == "chart"
    assert classify_figure_type("f.png|scatter plot of errors") == "graph"
    assert classify_figure_type("x.png|network architecture diagram") == "diagram"
    assert classify_figure_type("y.png|regional map") == "map"
    assert classify_figure_type("z.png|") == "figure"


def test_describe_figure_formats():
    assert describe_figure("image@200,500,400,640") == "figure (200x140pt) at (200, 500)"
    assert describe_figure("fig1.png|Output gap chart") == "chart: Output gap chart"


def test_figures_pipeline(ray_session, fixture_parquet):
    from smart_ocr_ray.pipelines.extract_pipeline import extract_from_parquet
    from smart_ocr_ray.pipelines.figures import describe_figures

    figures = describe_figures(extract_from_parquet(fixture_parquet)).take_all()
    assert figures
    assert all(f["figure_type"] for f in figures)
    urls = {f["url"] for f in figures}
    # figure-class html rows and image-bearing layout pages both surface.
    assert any("/figure/" in u for u in urls)
    assert any("/scanned/" in u for u in urls)


# ---------------------------------------------------------------- scoring


def test_score_pipeline_exact_and_perturbed(ray_session, fixture_parquet):
    import pyarrow.parquet as pq

    from smart_ocr_ray.document import oracle_extract
    from smart_ocr_ray.pipelines.extract_pipeline import extract_from_parquet
    from smart_ocr_ray.pipelines.score import rollup_by_extractor, score_against_golden

    pages = pq.read_table(fixture_parquet)
    golden = {}
    for i in range(pages.num_rows):
        url = pages["url"][i].as_py()
        golden[url] = oracle_extract(
            pages["html"][i].as_py(), pages["text"][i].as_py()
        )["extracted_text"]

    extracted = extract_from_parquet(fixture_parquet, max_html_bytes=16 * 1024)
    scores = score_against_golden(extracted, golden)
    rollup = {r["extractor"]: r for r in rollup_by_extractor(scores).take_all()}
    # Pipeline output is byte-identical to the oracle → perfect scores.
    for r in rollup.values():
        assert r["avg_wer_e6"] == 0
        assert r["avg_nes_e6"] == 1_000_000
        assert r["exact_rate_e6"] == 1_000_000

    # Perturbed golden → nonzero WER, exact rate drops.
    perturbed = {u: t + " extra trailing words" for u, t in golden.items()}
    rollup2 = rollup_by_extractor(
        score_against_golden(extracted, perturbed)
    ).take_all()
    assert all(r["exact_rate_e6"] == 0 for r in rollup2)
    assert any(r["avg_wer_e6"] > 0 for r in rollup2)


# ---------------------------------------------------------------- CLI


def test_cli_fixtures_and_extract(ray_session, tmp_path):
    from smart_ocr_ray.cli import main

    pages = tmp_path / "pages.parquet"
    out = tmp_path / "out"
    assert main(["fixtures", "--rows", "40", "--output", str(pages)]) == 0
    assert main(
        ["extract", "--input", str(pages), "--output", str(out), "--partitions", "2"]
    ) == 0
    manifest = json.loads((out / "_manifests" / "part-0.json").read_text())
    assert manifest["status"] == "completed"


def test_multi_extractor_latex_reconciliation():
    """HPC-mode reconcile: an equation present only in a secondary
    attempt's output merges into the passing primary's text."""
    # Build an html doc whose dom extraction lacks the display equation
    # (inside a boilerplate-stripped container) while rawtext keeps it.
    sentences = " ".join(
        f"Sentence number {i} discusses the quarterly results in moderate detail."
        for i in range(12)
    )
    body = (
        b"<p>The model solution is given by: as derived below. "
        + sentences.encode() + b"</p>"
    )
    eq = b'<div class="sidebar"><p>$$x = \\frac{-b}{2a}$$</p></div>'
    html = b"<html><body>" + body + eq + b"</body></html>"
    rows = process_payload(html, "", multi_extractor=True)
    r = rows[0]
    # dom dropped the sidebar equation; rawtext kept it; reconciliation
    # inserted it at the "given by:" reference phrase.
    assert r["extractor"] == "dom"
    assert "$$x = \\frac{-b}{2a}$$" in r["text"]
