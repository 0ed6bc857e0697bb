import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


@pytest.fixture(scope="session")
def ray_session():
    """One Ray session for the whole pytest run (driver requirement)."""
    import ray

    ray.init(
        address="local",
        num_cpus=4,
        include_dashboard=False,
        ignore_reinit_error=True,
        logging_level="ERROR",
    )
    yield
    ray.shutdown()


@pytest.fixture(scope="session")
def fixture_pages():
    """Small deterministic pages corpus with every row class present.

    oversized/big-doc knobs are shrunk so the explode path triggers with
    test-sized thresholds (pipeline runs pass max_html_bytes=16 KiB).
    """
    from smart_ocr_ray.fixtures import generate_pages

    return generate_pages(110, oversized_bytes=60_000, big_doc_pages=35)


@pytest.fixture(scope="session")
def fixture_parquet(fixture_pages, tmp_path_factory):
    import pyarrow.parquet as pq

    path = tmp_path_factory.mktemp("pages") / "pages.parquet"
    pq.write_table(fixture_pages, path)
    return str(path)
