"""Mojibake repair — the ftfy-style encoding fix every web-text
curation pipeline runs before tokenization.

The dominant real-world artifact is UTF-8 bytes decoded as
cp1252/latin-1 ("double encoding"): ``é`` becomes ``Ã©``, ``’``
becomes ``â€™``, and so on. This op repairs a FROZEN, ordered bank of
the most common such sequences (each mapping is the exact cp1252
mis-decoding of the target's UTF-8 bytes) and reports per-document
fix counts — the signal used both to clean and to QUARANTINE (a
document that is mostly mojibake is usually a binary/charset
misparse, not prose).

Frozen semantics (mirrored exactly by the SQL oracle):

* ``n_fixes`` = Σ over bank patterns of the non-overlapping
  occurrence count in the ORIGINAL text (no bank pattern is a
  substring of another, so counts are order-independent);
* repaired text = the bank applied as an ordered ``replace`` chain;
  shipped as ``fixed_md5`` so corpus-scale text never lands in the
  gate's compare (the ``majority_lang_strip`` convention).

Mojibake is seeded into the corpus deterministically from doc_id
(the ``pii_scrub`` pattern — the oracle inlines the same seeding), so
the repair paths are exercised on every gate run with no external
data.

Scale shape: one stateless column-pruned ``map_batches`` pass; the
count/repair kernels are vectorized pyarrow ``count_substring`` /
``replace_substring`` chains; the only per-row Python is the md5
witness (hashing is inherent, and the digest is what keeps text out
of the gate). No shuffle at any corpus size.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc
import ray.data

# Ordered (broken, fixed) bank: each left side is exactly
# bytes(fixed, "utf-8").decode("cp1252"). Frozen — part of the oracle
# contract.
MOJIBAKE_BANK: tuple[tuple[str, str], ...] = (
    ("â€™", "’"),
    ("â€œ", "“"),
    ("â€“", "–"),
    ("Ã©", "é"),
    ("Ã¨", "è"),
    ("Ã¤", "ä"),
    ("Ã¶", "ö"),
    ("Ã¼", "ü"),
    ("Ã±", "ñ"),
    ("Ã§", "ç"),
)

_SCHEMA = pa.schema(
    [
        ("doc_id", pa.int64()),
        ("n_fixes", pa.int64()),
        ("fixed_md5", pa.string()),
    ]
)


def _seeded(batch: pa.Table) -> pa.ChunkedArray | pa.Array:
    """Deterministic doc_id-derived mojibake seeding (inlined verbatim
    in the SQL oracle): %3==0 docs get a 1-fix suffix, %3==1 a 1-fix
    smart-quote suffix, %3==2 stay clean; %5==0 docs additionally get
    a 2-fix quote fragment."""
    import numpy as np

    text = pc.fill_null(batch.column("text").cast(pa.string()), "")
    ids = batch.column("doc_id").cast(pa.int64()).to_numpy(
        zero_copy_only=False
    )
    m3 = pa.array(ids % 3, pa.int64())
    m5_is0 = pa.array(ids % 5 == 0)
    suffix = pc.if_else(
        pc.equal(m3, 0),
        " cafÃ© menu",
        pc.if_else(pc.equal(m3, 1), " itâ€™s hot", ""),
    )
    extra = pc.if_else(m5_is0, " â€œquoteâ€“", "")
    return pc.binary_join_element_wise(text, suffix, extra, "")


def mojibake_repair(sf_dir: str) -> ray.data.Dataset:
    """Per-document mojibake repair over the (seeded) documents table:
    (doc_id, n_fixes, fixed_md5) — see module docstring."""
    import hashlib

    def _repair(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return _SCHEMA.empty_table()
        text = _seeded(batch)
        n = pa.array([0] * batch.num_rows, pa.int64())
        for broken, _fixed in MOJIBAKE_BANK:
            n = pc.add(
                n, pc.count_substring(text, broken).cast(pa.int64())
            )
        fixed = text
        for broken, fixed_to in MOJIBAKE_BANK:
            fixed = pc.replace_substring(fixed, broken, fixed_to)
        md5s = pa.array(
            [
                hashlib.md5(t.encode("utf-8")).hexdigest()
                for t in fixed.to_pylist()
            ],
            pa.string(),
        )
        return pa.Table.from_arrays(
            [batch.column("doc_id").cast(pa.int64()), n, md5s],
            schema=_SCHEMA,
        )

    return ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    ).map_batches(_repair, batch_format="pyarrow")


_CHARSET_SCHEMA = pa.schema(
    [
        ("doc_id", pa.int64()),
        ("charset", pa.string()),
        ("n_bytes", pa.int64()),
        ("n_chars", pa.int64()),
    ]
)


def charset_sniff(sf_dir: str) -> ray.data.Dataset:
    """Charset detection over raw page bytes — the step a crawler
    runs BEFORE any text op (``mojibake_repair`` fixes pages that
    were mis-decoded because this step was skipped): BOM checks, then
    strict UTF-8 validation, then the Latin-1 fallback (ISO-8859-1
    accepts any byte string, the standard last resort).

    Deterministic payload synthesis (ground truth by construction,
    the sitemap-coin discipline): per doc, the text plus ``' café'``
    (the é guarantees a non-ASCII byte in every variant) is encoded
    by ``doc_id % 4`` — 0: UTF-8; 1: UTF-8 with BOM; 2: UTF-16LE
    with BOM; 3: Latin-1 (whose 0xE9 é is an invalid UTF-8 sequence,
    so strict validation genuinely rejects it). The DETECTION kernel
    sees only bytes; the oracle reproduces verdict AND byte/char
    counts with pure arithmetic (utf8 bytes via octet_length,
    utf-16le = 2·chars + 2, …), so a sniffing bug that still lands
    on the right verdict but mis-measures is caught too.

    Frozen sniff rules: FF FE prefix → 'utf-16le' (decode drops the
    BOM); EF BB BF → 'utf-8-sig'; strict-UTF-8-decodable → 'utf-8';
    else → 'latin-1'. Output (doc_id, charset, n_bytes, n_chars)
    ordered by doc_id; n_chars counts the decoded code points
    WITHOUT the BOM.

    Scale shape: stateless per-batch map; nothing shuffles but the
    doc-sized sort.
    """
    docs = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    )

    def _make_payload(doc_id: int, text: str) -> bytes:
        s = (text or "") + " café"
        k = doc_id % 4
        if k == 0:
            return s.encode("utf-8")
        if k == 1:
            return b"\xef\xbb\xbf" + s.encode("utf-8")
        if k == 2:
            return b"\xff\xfe" + s.encode("utf-16-le")
        # errors="replace": a non-Latin-1 char becomes exactly one '?'
        # byte, so the oracle's latin-1 arithmetic (n_bytes = n_chars =
        # 1 byte per char) stays exact for ANY input text instead of
        # raising UnicodeEncodeError and killing the batch task on a
        # multilingual corpus (ADVICE r4). The k==2 utf-16-le branch
        # still assumes BMP-only text (2 bytes/char; an astral char
        # would take a 4-byte surrogate pair) — true of the synthetic
        # corpus and asserted by the oracle's 2*chars+2 formula.
        return s.encode("latin-1", errors="replace")

    def _sniff(payload: bytes) -> tuple[str, int]:
        """(charset, decoded chars) from bytes alone."""
        if payload.startswith(b"\xff\xfe"):
            return "utf-16le", len(payload[2:].decode("utf-16-le"))
        if payload.startswith(b"\xef\xbb\xbf"):
            return "utf-8-sig", len(payload[3:].decode("utf-8"))
        try:
            return "utf-8", len(payload.decode("utf-8"))
        except UnicodeDecodeError:
            return "latin-1", len(payload.decode("latin-1"))

    def _per_batch(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return _CHARSET_SCHEMA.empty_table()
        ids, charsets, nbytes, nchars = [], [], [], []
        for d, t in zip(
            batch.column("doc_id").to_pylist(), batch.column("text").to_pylist()
        ):
            payload = _make_payload(int(d), t)
            cs, nc = _sniff(payload)
            ids.append(int(d))
            charsets.append(cs)
            nbytes.append(len(payload))
            nchars.append(nc)
        return pa.Table.from_pydict(
            {
                "doc_id": ids,
                "charset": charsets,
                "n_bytes": nbytes,
                "n_chars": nchars,
            },
            schema=_CHARSET_SCHEMA,
        )

    return docs.map_batches(_per_batch, batch_format="pyarrow").sort("doc_id")
