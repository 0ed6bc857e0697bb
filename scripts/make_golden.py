"""Generate the committed golden table (tests/golden/golden.parquet)
from the single-row oracle over the canonical test fixture corpus.

Run once (and re-run deliberately when extraction semantics change):
    python scripts/make_golden.py
The pytest suite byte-compares both the oracle and the Ray pipeline
against this file, so accidental semantic drift fails loudly.
"""

import os
import sys

import pyarrow as pa
import pyarrow.parquet as pq

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from smart_ocr_ray.document import oracle_extract
from smart_ocr_ray.fixtures import generate_pages

# Must match tests/conftest.py::fixture_pages exactly.
N_ROWS = 110
OVERSIZED_BYTES = 60_000
BIG_DOC_PAGES = 35


def main() -> None:
    pages = generate_pages(N_ROWS, oversized_bytes=OVERSIZED_BYTES, big_doc_pages=BIG_DOC_PAGES)
    rows = {
        "url": [], "extracted_text": [], "spans_json": [], "audit_passed": [],
        "failure_mode": [], "route": [], "extractor": [], "n_units": [],
    }
    for i in range(pages.num_rows):
        html = pages["html"][i].as_py()
        text = pages["text"][i].as_py()
        doc = oracle_extract(html, text)
        rows["url"].append(pages["url"][i].as_py())
        for key in ("extracted_text", "spans_json", "audit_passed", "failure_mode",
                    "route", "extractor", "n_units"):
            rows[key].append(doc[key])

    out_dir = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                           "tests", "golden")
    os.makedirs(out_dir, exist_ok=True)
    pq.write_table(pa.Table.from_pydict(rows), os.path.join(out_dir, "golden.parquet"))
    print(f"wrote {len(rows['url'])} golden rows")


if __name__ == "__main__":
    main()
