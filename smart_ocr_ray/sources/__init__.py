"""Alternative input sources for the pages corpus (Parquet is the
primary path, ``pipelines.extract_pipeline.read_pages``)."""

from .warc import pages_to_warc_shards, read_warc

__all__ = ["pages_to_warc_shards", "read_warc"]
