"""URL operators — canonicalization and recrawl dedup over crawl logs.

A Common-Crawl-style corpus carries the same logical page under many
raw URL spellings: mixed-case scheme/host, default ports, tracking
parameters (``utm_*``, ``fbclid``, ...), unordered query strings and
fragments. Canonicalizing before any url-keyed stage (dedup, resume,
link joins) is the first step of every real crawl-curation pipeline;
the reference keys all of its per-document state by a sanitized
identifier for the same reason (SURVEY.md §2.2 M15, reference
``src/smart_ocr/utils/files.py`` filename sanitization — here the
identifier is the canonical url itself).

Frozen canonicalization rules (mirrored exactly by the DuckDB oracle):

  1. scheme and host lowercased (scheme-PRESENT urls only: a
     scheme-less string gets just the fragment/query rules, per the
     code comment — hosts are never guessed from relative refs);
  2. default port stripped (``:443`` for https, ``:80`` for http);
  3. fragment dropped;
  4. tracking query params dropped: name starts with ``utm_`` or is
     one of ``fbclid`` / ``gclid`` / ``ref`` — bare (valueless) and
     ``=``-valued spellings alike;
  5. remaining ``k=v`` params sorted bytewise as whole strings;
  6. ``?`` dropped when no params remain. Path is untouched.

``url_canonical`` then performs the recrawl pick: group by canonical
url, keep the row with the LATEST ``warc_ts`` (``arg_max``), counting
the collapsed spellings. The crawl log is synthesized
deterministically from the ``documents`` table (no external data):
every doc contributes one decorated raw url, and ``doc_id % 4 == 1``
docs contribute a second, later, differently-spelled crawl of the
same page — the rows the dedup must collapse.

Scale shape: canonicalization is a stateless ``map_batches`` pass;
the only shuffle is a sort keyed by the canonical url string with a
vectorized per-block argmax (``grouped.block_topk`` k=1) — rows are
(canon, url, ts), never page payloads.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray.data

from .grouped import block_topk, group_bounds
from .text_analysis import read_documents

_TRACKING_EXACT = frozenset({"fbclid", "gclid", "ref"})

_OUT_SCHEMA = pa.schema(
    [
        ("canon_url", pa.string()),
        ("url", pa.string()),
        ("last_ts", pa.int64()),
        ("n_variants", pa.int64()),
    ]
)


def canonicalize_url(url: str) -> str:
    """Apply the module's frozen canonicalization rules to one url."""
    base, _, _frag = url.partition("#")
    pre, _, query = base.partition("?")
    scheme, sep, rest = pre.partition("://")
    if not sep:  # no scheme — leave untouched apart from frag/query rules
        scheme, rest = "", pre
    scheme = scheme.lower()
    hostport, slash, path = rest.partition("/")
    if sep:  # rule 1 applies only when a scheme marks hostport AS a host
        hostport = hostport.lower()
    if scheme == "https" and hostport.endswith(":443"):
        hostport = hostport[:-4]
    elif scheme == "http" and hostport.endswith(":80"):
        hostport = hostport[:-3]
    params = [
        p
        for p in query.split("&")
        if p
        and not p.split("=", 1)[0].startswith("utm_")
        and p.split("=", 1)[0] not in _TRACKING_EXACT
    ]
    out = (scheme + "://" if sep else "") + hostport + slash + path
    if params:
        out += "?" + "&".join(sorted(params))
    return out


def _synth_crawl_rows(batch: pa.Table) -> pa.Table:
    """Deterministic raw crawl-log rows for one documents batch (the
    same arithmetic the SQL oracle unrolls): decorated url + ts per
    doc, plus a second later crawl for ``doc_id % 4 == 1``."""
    urls: list[str] = []
    tss: list[int] = []
    for d, s in zip(
        batch.column("doc_id").to_pylist(), batch.column("source").to_pylist()
    ):
        d = int(d)
        host = f"{s}.example.com"
        raw = (
            ("HTTPS" if d % 2 == 0 else "https")
            + "://"
            + (host.upper() if d % 3 == 0 else host)
            + (":443" if d % 11 == 0 else "")
            + f"/docs/{d}"
            + (
                f"?utm_source=feed&page=2&id={d}"
                if d % 4 == 0
                else "?b=2&a=1"
                if d % 4 == 1
                else "?fbclid=abc123"
                if d % 4 == 2
                else ""
            )
            + ("#sec" if d % 5 == 0 else "")
        )
        urls.append(raw)
        tss.append(d * 1000 + 1)
        if d % 4 == 1:
            urls.append(f"https://{host}/docs/{d}?a=1&b=2")
            tss.append(d * 1000 + 2)
    return pa.Table.from_pydict(
        {
            "canon_url": pa.array([canonicalize_url(u) for u in urls], pa.string()),
            "url": pa.array(urls, pa.string()),
            "warc_ts": pa.array(tss, pa.int64()),
        }
    )


def url_canonical(sf_dir: str) -> ray.data.Dataset:
    """Canonical-url recrawl dedup: latest crawl per canonical url with
    the number of collapsed raw spellings."""
    docs = read_documents(sf_dir)
    rows = docs.map_batches(_synth_crawl_rows, batch_format="pyarrow")

    def _pick_latest(block: pa.Table) -> pa.Table:
        block = block.combine_chunks()
        if block.num_rows == 0:
            return _OUT_SCHEMA.empty_table()
        bounds = group_bounds(block, ["canon_url"])
        counts = np.diff(bounds)
        group = np.repeat(np.arange(len(counts)), counts)
        ts = block.column("warc_ts").to_numpy(zero_copy_only=False)
        take, _ranks = block_topk(group, (-ts,), 1)
        win = block.take(pa.array(take))
        return pa.Table.from_pydict(
            {
                "canon_url": win.column("canon_url"),
                "url": win.column("url"),
                "last_ts": win.column("warc_ts"),
                "n_variants": pa.array(counts, pa.int64()),
            },
            schema=_OUT_SCHEMA,
        )

    # Sort by exactly the grouping key (grouped.py co-location
    # invariant), then vectorized per-block argmax — no per-group UDF.
    return rows.sort("canon_url").map_batches(
        _pick_latest, batch_format="pyarrow", batch_size=None
    )


_TEMPLATE_SCHEMA = pa.schema(
    [
        ("template", pa.string()),
        ("n_pages", pa.int64()),
        ("example_url", pa.string()),
    ]
)


def url_templates(pages_path: str) -> ray.data.Dataset:
    """URL path-template mining: collapse digit runs to ``N`` and count
    pages per resulting template — the sitemap-structure discovery a
    crawler runs to find parametric page families (product/article/
    listing patterns), prioritize crawl frontiers by family size, and
    spot infinite URL spaces (calendar traps show up as one template
    with an enormous count).

    Frozen semantics (mirrored by the SQL oracle): ``template =
    regexp_replace(url, '[0-9]+' -> 'N', global)``; output one row per
    template with its page count and the lexicographically-min example
    url. Scale shape: both aggregates are algebraic (count = sum of
    partial counts, example = min of partial mins), so the template map
    COLLAPSES each block to one partial row per distinct template
    before the sort — the very hot template this op exists to surface
    (a calendar trap is one template with millions of pages) ships as
    one row per map block instead of one row per page, so it can never
    skew the sort's range partitioning; the final sorted pass merges
    partials per template.
    """
    import re

    from .grouped import group_bounds

    digit_re = re.compile(r"[0-9]+")
    pages = ray.data.read_parquet(pages_path, columns=["url"])

    part_schema = pa.schema(
        [
            ("template", pa.string()),
            ("n_pages", pa.int64()),
            ("example_url", pa.string()),
        ]
    )

    def _template(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0 or "url" not in batch.column_names:
            return part_schema.empty_table()
        urls = [u or "" for u in batch.column("url").to_pylist()]
        partial: dict[str, tuple[int, str]] = {}
        for u in urls:
            t = digit_re.sub("N", u)
            seen = partial.get(t)
            partial[t] = (
                (1, u)
                if seen is None
                else (seen[0] + 1, u if u < seen[1] else seen[1])
            )
        keys = sorted(partial)
        return pa.Table.from_pydict(
            {
                "template": pa.array(keys, pa.string()),
                "n_pages": pa.array([partial[t][0] for t in keys], pa.int64()),
                "example_url": pa.array([partial[t][1] for t in keys], pa.string()),
            },
            schema=part_schema,
        )

    def _rollup(block: pa.Table) -> pa.Table:
        if block.num_rows == 0 or "template" not in block.column_names:
            return _TEMPLATE_SCHEMA.empty_table()
        # Keys-only global sort co-locates each template (the
        # map_key_groups contract); the example-url min is a local sort.
        block = block.sort_by(
            [("template", "ascending"), ("example_url", "ascending")]
        ).combine_chunks()
        bounds = group_bounds(block, ["template"])
        starts = pa.array(bounds[:-1])
        counts = block.column("n_pages").to_numpy(zero_copy_only=False)
        return pa.Table.from_pydict(
            {
                "template": block.column("template").take(starts),
                "n_pages": pa.array(
                    np.add.reduceat(counts, bounds[:-1]), pa.int64()
                ),
                "example_url": block.column("example_url").take(starts),
            },
            schema=_TEMPLATE_SCHEMA,
        )

    return (
        pages.map_batches(_template, batch_format="pyarrow")
        .sort(["template"])
        .map_batches(_rollup, batch_format="pyarrow", batch_size=None)
    )


_ROBOTS_SCHEMA = pa.schema(
    [
        ("url", pa.string()),
        ("host", pa.string()),
        ("allowed", pa.bool_()),
        ("matched_rule", pa.string()),
    ]
)


def robots_filter(pages_path: str) -> ray.data.Dataset:
    """Crawl-policy gate: apply per-host robots.txt rules to every
    page url with RFC 9309 longest-match semantics — the admission
    filter every real crawl pipeline runs before fetch/extract (and
    re-runs over stored corpora when policies change retroactively).

    The per-host rule set is synthesized deterministically from the
    host (no external data, the raster-corpus pattern): with
    ``seed = md5(host)`` hex, the host's robots.txt is

        Disallow: /<seed[0]>
        Allow:    /<seed[0:2]>
        Disallow: /<seed[2]>

    Frozen matching (mirrored exactly by the SQL oracle): a rule
    matches iff its path is a byte-prefix of the url path (path = the
    part from the first ``/`` after the host; ``/`` when absent); the
    LONGEST matching rule wins, allow beating disallow on ties — the
    RFC 9309 rule. With this rule shape the allow (3 chars) dominates
    its parent disallow (2 chars) exactly when it matches, giving the
    classic "deny the /a subtree except /ab" nesting. No match →
    allowed (matched_rule '').

    Scale shape: one stateless column-pruned ``map_batches`` pass; the
    per-row md5 runs once per DISTINCT host per block (dictionary
    encode → hash dictionary values → take), so the Python hashing
    loop is host-vocabulary-bounded, not row-bounded; all matching is
    fixed-width slice equality (pyarrow kernels). No shuffle at any
    corpus size.
    """
    import hashlib

    import pyarrow.compute as pc

    def _gate(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0 or "url" not in batch.column_names:
            return _ROBOTS_SCHEMA.empty_table()
        url = batch.column("url").cast(pa.string()).combine_chunks()
        ext = pc.extract_regex(url, r"^(?P<h>[a-z]+://[^/]+)(?P<p>/.*)?$")
        full = pc.struct_field(ext, "h")
        host = pc.replace_substring_regex(
            pc.fill_null(full, ""), r"^[a-z]+://", ""
        )
        path = pc.fill_null(pc.struct_field(ext, "p"), "/")
        path = pc.if_else(pc.equal(path, ""), "/", path)

        # host-vocabulary-bounded hashing: md5 only dictionary values
        if isinstance(host, pa.ChunkedArray):
            host = host.combine_chunks()
        denc = host.dictionary_encode()
        seeds = [
            hashlib.md5(h.encode("utf-8")).hexdigest()
            for h in denc.dictionary.to_pylist()
        ]
        d1_dict = pa.array(["/" + s[0] for s in seeds], pa.string())
        al_dict = pa.array(["/" + s[0:2] for s in seeds], pa.string())
        d2_dict = pa.array(["/" + s[2] for s in seeds], pa.string())
        idx = denc.indices
        d1 = d1_dict.take(idx)
        al = al_dict.take(idx)
        d2 = d2_dict.take(idx)

        p2 = pc.utf8_slice_codeunits(path, 0, 2)
        p3 = pc.utf8_slice_codeunits(path, 0, 3)
        m_d1 = pc.equal(p2, d1)
        m_al = pc.equal(p3, al)
        m_d2 = pc.equal(p2, d2)
        allowed = pc.or_(m_al, pc.invert(pc.or_(m_d1, m_d2)))
        empty = pa.scalar("", pa.string())
        matched = pc.if_else(
            m_al,
            pc.binary_join_element_wise("allow:", al, ""),
            pc.if_else(
                m_d1,
                pc.binary_join_element_wise("disallow:", d1, ""),
                pc.if_else(
                    m_d2,
                    pc.binary_join_element_wise("disallow:", d2, ""),
                    empty,
                ),
            ),
        )
        return pa.Table.from_arrays(
            [url, host, allowed, matched], schema=_ROBOTS_SCHEMA
        )

    return ray.data.read_parquet(pages_path, columns=["url"]).map_batches(
        _gate, batch_format="pyarrow"
    )


_SITEMAP_SCHEMA = pa.schema(
    [
        ("host", pa.string()),
        ("n_listed", pa.int64()),
        ("n_known", pa.int64()),
        ("n_discovered", pa.int64()),
    ]
)


def sitemap_discovery(pages_path: str) -> ray.data.Dataset:
    """Sitemap-driven URL discovery — the crawl-frontier feed that
    complements the ``robots_filter`` admission gate (RFC 9309's
    companion: publishers ADVERTISE urls via sitemap.xml; the crawler
    diffs them against what it already has). Per host: build the
    host's sitemap.xml, parse it back (REAL XML parse — the
    writer/parser duality discipline of the raster corpora), and diff
    the advertised urls against the host's crawled set.

    Frozen synthesis rules (mirrored exactly by the SQL oracle; both
    sides pure md5 arithmetic):

    * a page url is LISTED in its host's sitemap iff
      ``md5(url)[0]`` is an even hex digit;
    * a page url is already CRAWLED iff ``md5(url)[1]`` is even
      (an independent coin — so listed∩crawled is a non-trivial
      overlap the counts must get right);
    * every sitemap additionally advertises two synthetic urls
      ``https://<host>/new/<md5(host)[0:4]>/{0,1}`` — never crawled,
      always discovered.

    Output per host: ``n_listed`` (loc entries in the parsed XML),
    ``n_known`` (parsed urls already crawled), ``n_discovered``
    (parsed urls new to the crawler). Hosts with no listed page urls
    still emit a sitemap (the two synthetic urls).

    Scale shape: ONE host-keyed sort (the ``map_key_groups``
    shuffle); the XML build+parse runs per host group with rows
    (host, url, flags) — page payloads never enter; per-url md5 is
    the inherent hashing cost (the fingerprint-op precedent). Output
    is O(hosts).
    """
    import hashlib
    import re as _re

    from .grouped import map_key_groups

    tag_schema = pa.schema(
        [
            ("host", pa.string()),
            ("url", pa.string()),
            ("listed", pa.bool_()),
            ("crawled", pa.bool_()),
        ]
    )

    def _tag(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        if batch.num_rows == 0 or "url" not in batch.column_names:
            return tag_schema.empty_table()
        urls = batch.column("url").cast(pa.string()).combine_chunks()
        host = pc.fill_null(
            pc.struct_field(
                pc.extract_regex(urls, r"^[a-z]+://(?P<h>[^/]+)"), "h"
            ),
            "",
        )
        digs = [hashlib.md5(u.encode()).hexdigest() for u in urls.to_pylist()]
        listed = pa.array([d[0] in "02468ace" for d in digs])
        crawled = pa.array([d[1] in "02468ace" for d in digs])
        return pa.Table.from_arrays(
            [host, urls, listed, crawled], schema=tag_schema
        )

    loc_re = _re.compile(r"<loc>([^<]*)</loc>")

    def _per_host(group: pa.Table) -> pa.Table:
        if group.num_rows == 0:
            return _SITEMAP_SCHEMA.empty_table()
        host = group.column("host")[0].as_py()
        urls = group.column("url").to_pylist()
        listed = group.column("listed").to_pylist()
        crawled_set = {
            u for u, c in zip(urls, group.column("crawled").to_pylist()) if c
        }
        seed = hashlib.md5(host.encode()).hexdigest()[:4]
        advertised = sorted(u for u, l in zip(urls, listed) if l) + [
            f"https://{host}/new/{seed}/0",
            f"https://{host}/new/{seed}/1",
        ]
        xml = (
            '<?xml version="1.0" encoding="UTF-8"?>\n'
            '<urlset xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">\n'
            + "".join(f"  <url><loc>{u}</loc></url>\n" for u in advertised)
            + "</urlset>\n"
        )
        # REAL parse of the XML we just serialized — the counts come
        # from the PARSED side, so a serializer/parser mismatch fails
        # the gate.
        parsed = loc_re.findall(xml)
        n_known = sum(1 for u in parsed if u in crawled_set)
        return pa.Table.from_pydict(
            {
                "host": pa.array([host], pa.string()),
                "n_listed": pa.array([len(parsed)], pa.int64()),
                "n_known": pa.array([n_known], pa.int64()),
                "n_discovered": pa.array([len(parsed) - n_known], pa.int64()),
            },
            schema=_SITEMAP_SCHEMA,
        )

    tagged = ray.data.read_parquet(pages_path, columns=["url"]).map_batches(
        _tag, batch_format="pyarrow"
    )
    return map_key_groups(tagged, "host", _per_host)


_SITEMAP_INDEX_SCHEMA = pa.schema(
    [
        ("host", pa.string()),
        ("n_sitemaps", pa.int64()),
        ("n_listed", pa.int64()),
        ("n_known", pa.int64()),
        ("n_discovered", pa.int64()),
    ]
)


def sitemap_index(pages_path: str, n_chunks: int = 16) -> ray.data.Dataset:
    """Chunked sitemap build behind a sitemap INDEX file — the
    protocol's own answer to big hosts (sitemaps.org caps one file at
    50,000 urls; beyond that a ``<sitemapindex>`` references child
    sitemaps), and the parallel answer to ``sitemap_discovery``'s
    per-host serialization (BASELINE.md r4 headroom #2: a single-host
    corpus builds ONE giant XML in one group). Children are
    hash-sharded: advertised url → chunk ``int(md5(url)[2], 16) %
    n_chunks`` (a production deployment sizes ``n_chunks ≈
    ceil(expected_urls / 50_000)``).

    Frozen coins (same as ``sitemap_discovery``, plus the chunk
    digit, all mirrored by the SQL oracle): listed iff ``md5(url)[0]``
    even hex, crawled iff ``md5(url)[1]`` even, chunk from
    ``md5(url)[2]``; every host additionally advertises the two
    synthetic ``/new/<md5(host)[0:4]>/{0,1}`` urls (never crawled),
    hash-sharded by the same rule. A chunk emits a child sitemap iff
    it has >= 1 advertised url.

    Writer/parser duality: per-url counts come from REAL-parsing each
    child sitemap we serialize; ``n_sitemaps`` comes from
    REAL-parsing the ``<sitemapindex>`` built over the children — a
    serializer/parser mismatch on either layer fails the gate.

    Output per host: (n_sitemaps, n_listed, n_known, n_discovered);
    the last three match ``sitemap_discovery`` exactly.

    Scale shape: the per-url md5 + XML build/parse runs in (host,
    chunk) groups — ``n_chunks``-way parallel within a host, the fix
    for the single-host serialization — off ONE (host, chunk) sort;
    the host rollup is a second sort over O(hosts × n_chunks) chunk
    rows that never sees urls (only synthetic-only chunks, <= 2 urls,
    build XML there).
    """
    import hashlib
    import re as _re

    from .grouped import map_key_groups

    tag_schema = pa.schema(
        [
            ("host", pa.string()),
            ("chunk", pa.int64()),
            ("url", pa.string()),
            ("listed", pa.bool_()),
            ("crawled", pa.bool_()),
        ]
    )

    def _tag(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        if batch.num_rows == 0 or "url" not in batch.column_names:
            return tag_schema.empty_table()
        urls = batch.column("url").cast(pa.string()).combine_chunks()
        host = pc.fill_null(
            pc.struct_field(
                pc.extract_regex(urls, r"^[a-z]+://(?P<h>[^/]+)"), "h"
            ),
            "",
        )
        digs = [hashlib.md5(u.encode()).hexdigest() for u in urls.to_pylist()]
        return pa.Table.from_arrays(
            [
                host,
                pa.array([int(d[2], 16) % n_chunks for d in digs], pa.int64()),
                urls,
                pa.array([d[0] in "02468ace" for d in digs]),
                pa.array([d[1] in "02468ace" for d in digs]),
            ],
            schema=tag_schema,
        )

    loc_re = _re.compile(r"<loc>([^<]*)</loc>")

    def _synthetics(host: str) -> list[tuple[str, int]]:
        seed = hashlib.md5(host.encode()).hexdigest()[:4]
        out = []
        for i in (0, 1):
            u = f"https://{host}/new/{seed}/{i}"
            out.append((u, int(hashlib.md5(u.encode()).hexdigest()[2], 16) % n_chunks))
        return out

    def _child_counts(advertised: list[str], crawled_set: set) -> tuple[int, int]:
        """Serialize one child sitemap over ``advertised``, REAL-parse
        it back, and diff the PARSED urls against the crawled set."""
        xml = (
            '<?xml version="1.0" encoding="UTF-8"?>\n'
            '<urlset xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">\n'
            + "".join(f"  <url><loc>{u}</loc></url>\n" for u in advertised)
            + "</urlset>\n"
        )
        parsed = loc_re.findall(xml)
        n_known = sum(1 for u in parsed if u in crawled_set)
        return len(parsed), n_known

    chunk_schema = pa.schema(
        [
            ("host", pa.string()),
            ("chunk", pa.int64()),
            ("n_listed", pa.int64()),
            ("n_known", pa.int64()),
            ("n_discovered", pa.int64()),
        ]
    )

    def _per_chunk(group: pa.Table) -> pa.Table:
        if group.num_rows == 0:
            return chunk_schema.empty_table()
        host = group.column("host")[0].as_py()
        chunk = int(group.column("chunk")[0].as_py())
        urls = group.column("url").to_pylist()
        listed = group.column("listed").to_pylist()
        crawled_set = {
            u for u, c in zip(urls, group.column("crawled").to_pylist()) if c
        }
        advertised = sorted(u for u, l in zip(urls, listed) if l) + [
            u for u, c in _synthetics(host) if c == chunk
        ]
        if not advertised:  # no child sitemap for this shard
            return chunk_schema.empty_table()
        n_listed, n_known = _child_counts(advertised, crawled_set)
        return pa.Table.from_pydict(
            {
                "host": [host],
                "chunk": [chunk],
                "n_listed": [n_listed],
                "n_known": [n_known],
                "n_discovered": [n_listed - n_known],
            },
            schema=chunk_schema,
        )

    def _per_host(group: pa.Table) -> pa.Table:
        if group.num_rows == 0:
            return _SITEMAP_INDEX_SCHEMA.empty_table()
        host = group.column("host")[0].as_py()
        rows = {
            int(c): (int(nl), int(nk), int(nd))
            for c, nl, nk, nd in zip(
                group.column("chunk").to_pylist(),
                group.column("n_listed").to_pylist(),
                group.column("n_known").to_pylist(),
                group.column("n_discovered").to_pylist(),
            )
        }
        # A synthetic url whose shard holds NO page url never formed a
        # stage-1 group; its (<= 2-url) child sitemap is built here.
        for chunk in sorted({c for _, c in _synthetics(host)} - rows.keys()):
            adv = [u for u, c in _synthetics(host) if c == chunk]
            n_listed, n_known = _child_counts(adv, set())
            rows[chunk] = (n_listed, n_known, n_listed - n_known)
        index_xml = (
            '<?xml version="1.0" encoding="UTF-8"?>\n'
            '<sitemapindex xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">\n'
            + "".join(
                f"  <sitemap><loc>https://{host}/sitemap-{c}.xml</loc></sitemap>\n"
                for c in sorted(rows)
            )
            + "</sitemapindex>\n"
        )
        n_sitemaps = len(loc_re.findall(index_xml))
        return pa.Table.from_pydict(
            {
                "host": [host],
                "n_sitemaps": [n_sitemaps],
                "n_listed": [sum(r[0] for r in rows.values())],
                "n_known": [sum(r[1] for r in rows.values())],
                "n_discovered": [sum(r[2] for r in rows.values())],
            },
            schema=_SITEMAP_INDEX_SCHEMA,
        )

    tagged = ray.data.read_parquet(pages_path, columns=["url"]).map_batches(
        _tag, batch_format="pyarrow"
    )
    chunks = map_key_groups(tagged, ["host", "chunk"], _per_chunk)
    # The chunk table is O(hosts × n_chunks) rows spread over one
    # near-empty block per upstream task; coalescing it first saves
    # the host-rollup sort ~2.3 s of fixed per-block overhead on this
    # box (320 tiny blocks → a handful), measured in BASELINE.md.
    from ..tuning import join_partitions as _jp

    return map_key_groups(chunks.repartition(_jp()), "host", _per_host)


_REDIRECT_SCHEMA = pa.schema(
    [
        ("url", pa.string()),
        ("final_url", pa.string()),
        ("n_hops", pa.int64()),
        ("terminated", pa.int64()),
    ]
)


def redirect_resolve(pages_path: str, max_hops: int = 8) -> ray.data.Dataset:
    """Redirect-chain resolution — the 3xx-following step between URL
    discovery and fetch dedup (a crawler must canonicalize through
    redirect chains or it refetches and recounts the same page under
    every alias; RFC 9110 §15.4 caps the follow depth exactly like
    ``max_hops`` here).

    Deterministic redirect map (the sitemap-coin discipline): a url
    ``u`` redirects iff ``md5(u)[3]`` ∈ '0123' (a 1/4 coin, so chain
    lengths are geometric and the corpus exercises 0..max_hops), and
    its target is ``https://<host>/r/<md5(u)[4:12]>`` — a fresh url
    whose own coin decides whether the chain continues. Resolution
    follows at most ``max_hops`` redirects; ``terminated = 0`` marks
    chains still redirecting at the cap (the crawler's redirect-loop
    budget firing).

    Output per input url, ordered by url: (url, final_url, n_hops,
    terminated). The SQL oracle unrolls the same ``max_hops`` md5
    rounds.

    Scale shape: stateless per-batch map — per-hop md5 over the
    still-active subset only (geometric decay: expected total hashes
    ≈ 4/3 per url); no shuffle beyond the url-sized sort.
    """
    import hashlib
    import re as _re

    host_re = _re.compile(r"^([a-z]+://[^/]+)")

    def _per_batch(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0 or "url" not in batch.column_names:
            return _REDIRECT_SCHEMA.empty_table()
        urls = batch.column("url").cast(pa.string()).to_pylist()
        finals, hops, terms = [], [], []
        for u in urls:
            m = host_re.match(u)
            host = m.group(1) if m else ""
            cur = u
            h = 0
            while h < max_hops:
                d = hashlib.md5(cur.encode()).hexdigest()
                if d[3] not in "0123":
                    break
                cur = f"{host}/r/{d[4:12]}"
                h += 1
            still = (
                h == max_hops
                and hashlib.md5(cur.encode()).hexdigest()[3] in "0123"
            )
            finals.append(cur)
            hops.append(h)
            terms.append(0 if still else 1)
        return pa.Table.from_pydict(
            {
                "url": urls,
                "final_url": finals,
                "n_hops": hops,
                "terminated": terms,
            },
            schema=_REDIRECT_SCHEMA,
        )

    return (
        ray.data.read_parquet(pages_path, columns=["url"])
        .map_batches(_per_batch, batch_format="pyarrow")
        .sort("url")
    )
