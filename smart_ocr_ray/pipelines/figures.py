"""Figure description pipeline stage (A6/J7/X1-X3 surface).

Consumes the assembled ``extracted`` table and emits one row per
figure span with its rule-based type + description. Stateless
``map_batches`` — the caption context is the document's own extracted
text, already in-row (a self-lookup, J7)."""

from __future__ import annotations

import json

import pyarrow as pa
import ray.data

from ..functions.captions import classify_figure_type, describe_figure


def describe_figures(extracted: ray.data.Dataset) -> ray.data.Dataset:
    """(url, unit_id, figure_type, description, start, end) per figure span."""

    def _batch(batch: pa.Table) -> pa.Table:
        urls, unit_ids, types, descs, starts, ends = [], [], [], [], [], []
        for url, spans_json, text in zip(
            batch.column("url").to_pylist(),
            batch.column("spans_json").to_pylist(),
            batch.column("extracted_text").to_pylist(),
        ):
            for span in json.loads(spans_json or "[]"):
                if span.get("kind") != "figure":
                    continue
                meta = span.get("meta", "")
                urls.append(url)
                unit_ids.append(span.get("unit_id", 0))
                types.append(classify_figure_type(meta, text or ""))
                descs.append(describe_figure(meta, text or ""))
                starts.append(span.get("start", 0))
                ends.append(span.get("end", 0))
        return pa.Table.from_pydict(
            {
                "url": pa.array(urls, pa.string()),
                "unit_id": pa.array(unit_ids, pa.int32()),
                "figure_type": pa.array(types, pa.string()),
                "description": pa.array(descs, pa.string()),
                "start": pa.array(starts, pa.int64()),
                "end": pa.array(ends, pa.int64()),
            }
        )

    return extracted.map_batches(_batch, batch_format="pyarrow")
