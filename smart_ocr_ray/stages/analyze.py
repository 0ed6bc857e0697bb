"""Analyze stage: fingerprint + assessment + routing columns (S3, M1–M8).

Stateless ``map_batches`` function over zero-copy Arrow batches. Adds:

  content_hash  sha256 hex of the payload (document.py:50-56 analog)
  n_bytes       payload size
  doc_kind      html | binary | empty (magic sniff)
  route         native | html | binary | empty (C2 routing)
  is_native     text layer passed the born-digital cascade
  difficulty    easy | hard (difficulty.py thresholds analog)
  has_tables / has_figures / has_equations   content flags
"""

from __future__ import annotations

import hashlib

import pyarrow as pa

from ..functions.assess import assess_row


def analyze_batch(batch: pa.Table) -> pa.Table:
    html_col = batch.column("html")
    text_col = batch.column("text")

    n = batch.num_rows
    content_hash = [""] * n
    n_bytes = [0] * n
    doc_kind = [""] * n
    route = [""] * n
    is_native = [False] * n
    difficulty = [""] * n
    has_tables = [False] * n
    has_figures = [False] * n
    has_equations = [False] * n

    for i in range(n):
        html = html_col[i].as_py() or b""
        text = text_col[i].as_py() or ""
        a = assess_row(html, text)
        content_hash[i] = hashlib.sha256(html).hexdigest()
        n_bytes[i] = len(html)
        doc_kind[i] = a.doc_kind
        route[i] = a.route
        is_native[i] = a.is_native
        difficulty[i] = a.difficulty
        has_tables[i] = a.has_tables
        has_figures[i] = a.has_figures
        has_equations[i] = a.has_equations

    return (
        batch.append_column("content_hash", pa.array(content_hash, pa.string()))
        .append_column("n_bytes", pa.array(n_bytes, pa.int64()))
        .append_column("doc_kind", pa.array(doc_kind, pa.string()))
        .append_column("route", pa.array(route, pa.string()))
        .append_column("is_native", pa.array(is_native, pa.bool_()))
        .append_column("difficulty", pa.array(difficulty, pa.string()))
        .append_column("has_tables", pa.array(has_tables, pa.bool_()))
        .append_column("has_figures", pa.array(has_figures, pa.bool_()))
        .append_column("has_equations", pa.array(has_equations, pa.bool_()))
    )
