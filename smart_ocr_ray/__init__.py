"""smart_ocr_ray — a Ray-Data-native main-content extraction engine.

A from-scratch rebuild of the capabilities of the reference engine
(r-uben/smart-ocr, ``socr``) as a pure bounded transform over Parquet
tables of Common-Crawl-style web pages::

    url:string, warc_ts:timestamp[us], html:binary, text:string, lang:string

The execution model is idiomatic Ray Data: a streaming
``ray.data.Dataset`` of ``map_batches`` over zero-copy Arrow batches,
an actor pool for the stateful layout-parsing stage, and a single
``groupby("url")`` hash shuffle for document assembly.  See SURVEY.md
for the operator-by-operator mapping to the reference.

No module in this package calls ``ray.init()`` — the session is owned
by the caller (driver / bench.py / pytest fixture).
"""

__version__ = "0.1.0"
