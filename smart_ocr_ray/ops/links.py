"""Link-graph operators over the pages corpus — the outlink/WAT side
of a web-extraction pipeline (Common Crawl ships exactly this as its
"wat" metadata: every anchor target per page, and the host/page graph
built from them).

Frozen semantics (mirrored by an INDEPENDENT DuckDB regexp oracle —
the Ray side walks a real stdlib-``html.parser`` DOM, the SQL side
scans ``href="..."`` attributes; agreement on well-formed markup is
the cross-check):

  * a page participates iff its payload is HTML (non-empty, not a
    ``%FIX-LAYOUT`` binary payload — ``functions/assess.sniff_doc_kind``);
  * its outlinks are the ``href`` values of its ``<a>`` tags, in
    document order, duplicates kept;
  * site-internal links (href starting ``/``) resolve against the
    page's own scheme+host; everything else is external;
  * the page graph keeps only resolved edges whose target exists in
    the corpus (dangling links are counted but form no edge).

Scale shape: outlink extraction is a stateless ``map_batches`` pass
(the parse state is per-row); only the EDGE LIST — (src, dst) string
pairs, ~3 rows/page, payload-free — enters any shuffle. In-degree is
one ``groupby(dst)`` count over edges; the final join is
per-page-rows ⋈ degree-table on url (both corpus-scale but narrow).
"""

from __future__ import annotations

from html.parser import HTMLParser

import numpy as np
import pyarrow as pa
import ray.data

from ..functions.assess import sniff_doc_kind


class _AnchorCollector(HTMLParser):
    """Collects href attribute values of <a> tags in document order."""

    def __init__(self) -> None:
        super().__init__()
        self.hrefs: list[str] = []

    def handle_starttag(self, tag: str, attrs) -> None:
        if tag == "a":
            for name, value in attrs:
                if name == "href" and value is not None:
                    self.hrefs.append(value)

    handle_startendtag = handle_starttag


def page_hrefs(html: bytes) -> list[str]:
    """Anchor hrefs of one page ('' kind-sniffed non-HTML → [])."""
    if sniff_doc_kind(html) != "html":
        return []
    parser = _AnchorCollector()
    parser.feed(html.decode("utf-8", errors="replace"))
    return parser.hrefs


def _host(url: str) -> str:
    """scheme://host prefix of a url (everything before the 3rd '/')."""
    parts = url.split("/", 3)
    return "/".join(parts[:3]) if len(parts) >= 3 else url


_EDGE_SCHEMA = pa.schema([("src", pa.string()), ("dst", pa.string())])
_PAGE_SCHEMA = pa.schema(
    [
        ("url", pa.string()),
        ("out_links", pa.int64()),
        ("out_internal", pa.int64()),
    ]
)
_PAGE_DEG_SCHEMA = _PAGE_SCHEMA.append(pa.field("in_degree", pa.int64()))


def _read_pages(pages_path: str) -> ray.data.Dataset:
    return ray.data.read_parquet(pages_path, columns=["url", "html"])


_PARSED_SCHEMA = pa.schema(
    [
        ("url", pa.string()),
        ("out_links", pa.int64()),
        ("out_internal", pa.int64()),
        ("dsts", pa.list_(pa.string())),
    ]
)


def _parsed_pages(pages_path: str) -> ray.data.Dataset:
    """ONE HTML parse of the corpus, materialized: per html page, its
    anchor counts plus the resolved internal targets as a list column.
    Every link operator (degrees, edges, pagerank) derives from this
    narrow table, so a query composing several of them parses each
    payload exactly once — payload bytes never survive past this map."""

    def _parse(batch: pa.Table) -> pa.Table:
        urls, outs, ints, dsts = [], [], [], []
        for url, html in zip(
            batch.column("url").to_pylist(), batch.column("html").to_pylist()
        ):
            if sniff_doc_kind(html or b"") != "html":
                continue
            # One sniff per payload: parse directly rather than via
            # page_hrefs (which would re-sniff what the guard above
            # already established).
            collector = _AnchorCollector()
            collector.feed((html or b"").decode("utf-8", errors="replace"))
            hrefs = collector.hrefs
            host = _host(url)
            urls.append(url)
            outs.append(len(hrefs))
            internal = [host + h for h in hrefs if h.startswith("/")]
            ints.append(len(internal))
            dsts.append(internal)
        return pa.Table.from_pydict(
            {
                "url": pa.array(urls, pa.string()),
                "out_links": pa.array(outs, pa.int64()),
                "out_internal": pa.array(ints, pa.int64()),
                "dsts": pa.array(dsts, pa.list_(pa.string())),
            },
            schema=_PARSED_SCHEMA,
        )

    from ..tuning import join_partitions as _jp

    return (
        _read_pages(pages_path)
        .map_batches(_parse, batch_format="pyarrow")
        .repartition(_jp())
        .materialize()
    )


def _parsed_edges(parsed: ray.data.Dataset) -> ray.data.Dataset:
    """(src, dst) edge rows from the parsed table — a vectorized Arrow
    list explode, no re-parse."""

    def _explode(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        if batch.num_rows == 0 or "dsts" not in batch.column_names:
            return _EDGE_SCHEMA.empty_table()
        lists = batch.column("dsts").combine_chunks()
        parents = pc.list_parent_indices(lists)
        return pa.Table.from_pydict(
            {
                "src": batch.column("url").take(parents),
                "dst": pc.list_flatten(lists),
            },
            schema=_EDGE_SCHEMA,
        )

    return parsed.map_batches(_explode, batch_format="pyarrow")


def page_links(pages_path: str) -> ray.data.Dataset:
    """Resolved site-internal outlink edges, one row per anchor:
    (src, dst) with dst = page host + href. Duplicates kept (a page
    linking twice contributes two edges)."""
    return _parsed_edges(_parsed_pages(pages_path))


def link_graph(
    pages_path: str, parsed: ray.data.Dataset | None = None
) -> ray.data.Dataset:
    """Per-page degree rollup over the corpus link graph:

        (url, out_links, out_internal, in_degree)

    for every HTML page — out_links counts ALL anchors, out_internal
    the site-internal subset, in_degree the internal links arriving
    from other corpus pages (dangling targets never count).

    Join-free (ninth r3 session): the original existing-target inner
    join + left-outer degree join on url strings were the heaviest
    stages of every dependent (Acero string-key joins — the measured
    pathology BASELINE.md's sort-gather note documents). Instead, the
    per-url zero rows and the edge-target one rows UNION into one
    ``reduce_by_keys`` sum — dangling targets accumulate counts under
    keys no page row carries, so the subsequent ``gather_by_key``
    (attach in_degree onto the page rows) drops them for free,
    preserving the existing-target rule with two sorts and no hash
    join.
    """
    from ..tuning import join_partitions as _jp
    from .grouped import gather_by_key, reduce_by_keys

    jp = _jp()
    if parsed is None:
        parsed = _parsed_pages(pages_path)
    if parsed.count() == 0:
        # all-binary/empty corpus: the materialized parse is schema-less
        # (map_batches skips empty blocks) and would break downstream.
        return ray.data.from_arrow(_PAGE_DEG_SCHEMA.empty_table())
    per_page = parsed.map_batches(
        lambda b: b.select(["url", "out_links", "out_internal"]),
        batch_format="pyarrow",
    )

    cnt_schema = pa.schema([("url", pa.string()), ("c", pa.int64())])

    def _zero(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0 or "url" not in batch.column_names:
            return cnt_schema.empty_table()
        return pa.Table.from_pydict(
            {
                "url": batch.column("url").cast(pa.string()),
                "c": pa.array(np.zeros(batch.num_rows, np.int64), pa.int64()),
            },
            schema=cnt_schema,
        )

    def _one(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0 or "dst" not in batch.column_names:
            return cnt_schema.empty_table()
        return pa.Table.from_pydict(
            {
                "url": batch.column("dst").cast(pa.string()),
                "c": pa.array(np.ones(batch.num_rows, np.int64), pa.int64()),
            },
            schema=cnt_schema,
        )

    in_deg = reduce_by_keys(
        parsed.map_batches(_zero, batch_format="pyarrow")
        .union(_parsed_edges(parsed).map_batches(_one, batch_format="pyarrow"))
        .repartition(jp),
        ["url"], "c", how="sum",
    )

    return gather_by_key(
        per_page, "url", in_deg, "url", "c", "in_degree",
        _PAGE_SCHEMA, pa.int64(),
    )


_DEG_HIST_SCHEMA = pa.schema(
    [("axis", pa.string()), ("degree", pa.int64()), ("n_pages", pa.int64())]
)


def link_degree_hist(pages_path: str) -> ray.data.Dataset:
    """Degree-distribution histogram over the page link graph — the
    power-law diagnostic every webgraph paper plots first (and the
    sanity check that catches a broken link harvest instantly: a
    missing tail or a spike at 0 is visible in ten rows). One row per
    (axis, degree value): axis 'out' counts pages by out_links, 'in'
    by in_degree (resolved internal targets only, the ``link_graph``
    semantics).

    Scale shape: composes ``link_graph``'s per-page degrees; per-block
    Counters collapse to one row per distinct (axis, degree) before
    the shuffle — the histogram is degree-bounded, corpus-independent.
    """
    from ray.data.aggregate import Sum

    lg = link_graph(pages_path)

    def _part(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0 or "out_links" not in batch.column_names:
            return _DEG_HIST_SCHEMA.empty_table()
        from collections import Counter

        cnt: Counter = Counter()
        for v in batch.column("out_links").to_pylist():
            cnt[("out", int(v))] += 1
        for v in batch.column("in_degree").to_pylist():
            cnt[("in", int(v))] += 1
        keys = sorted(cnt)
        return pa.Table.from_pydict(
            {
                "axis": pa.array([k[0] for k in keys], pa.string()),
                "degree": pa.array([k[1] for k in keys], pa.int64()),
                "n_pages": pa.array([cnt[k] for k in keys], pa.int64()),
            },
            schema=_DEG_HIST_SCHEMA,
        )

    return (
        lg.map_batches(_part, batch_format="pyarrow")
        .groupby(["axis", "degree"])
        .aggregate(Sum("n_pages", alias_name="n_pages"))
    )


_BUDGET_SCHEMA = pa.schema(
    [
        ("section", pa.string()),
        ("n_pages", pa.int64()),
        ("quota", pa.int64()),
    ]
)


def crawl_budget(pages_path: str, budget: int = 10_000) -> ray.data.Dataset:
    """Apportion a global recrawl fetch budget across host sections
    proportionally to their page counts — the allocation step between
    frontier discovery (``link_frontier``) and fetch scheduling
    (``crawl_schedule``). Uses the largest-remainder method (Hamilton
    apportionment), the standard way to hand out an integer budget
    with zero rounding loss: quotas sum to EXACTLY ``budget``.

    Frozen semantics (mirrored by the SQL oracle): sections = the
    ``section_graph`` url rule; base quota ``(budget · c_s) // C``
    (C = total pages); the ``budget − Σbase`` leftover units go one
    each to the sections with the largest remainders
    ``(budget · c_s) % C``, ties broken by section ascending.

    Scale shape: a column-pruned url read collapses to per-section
    counts (section-count-bounded); only that tiny table reaches the
    driver for the remainder ranking (the ``doc_length_quantiles``
    contract).
    """
    import pyarrow.compute as pc

    pages = ray.data.read_parquet(pages_path, columns=["url"])

    sec_schema = pa.schema([("section", pa.string())])

    def _sec(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0 or "url" not in batch.column_names:
            return sec_schema.empty_table()
        m = pc.extract_regex(batch.column("url").cast(pa.string()), _SECTION_RE)
        return pa.Table.from_pydict(
            {"section": pc.fill_null(pc.struct_field(m, "sec"), "")},
            schema=sec_schema,
        )

    counts = (
        pages.map_batches(_sec, batch_format="pyarrow")
        .groupby("section")
        .count()
        .take_all()
    )
    if not counts:
        return ray.data.from_arrow(_BUDGET_SCHEMA.empty_table())
    c = {r["section"]: int(r["count()"]) for r in counts}
    total = sum(c.values())
    base = {s: (budget * v) // total for s, v in c.items()}
    leftover = budget - sum(base.values())
    by_remainder = sorted(
        c, key=lambda s: (-((budget * c[s]) % total), s)
    )
    for s in by_remainder[:leftover]:
        base[s] += 1
    secs = sorted(c)
    return ray.data.from_arrow(
        pa.Table.from_pydict(
            {
                "section": pa.array(secs, pa.string()),
                "n_pages": pa.array([c[s] for s in secs], pa.int64()),
                "quota": pa.array([base[s] for s in secs], pa.int64()),
            },
            schema=_BUDGET_SCHEMA,
        )
    )


def link_pagerank(
    pages_path: str,
    n_iter: int = 3,
    seed_mod: int | None = None,
    out_col: str = "pr_e12",
) -> ray.data.Dataset:
    """Integer-grid PageRank over the REAL page link graph (the
    centrality signal crawl curation uses to weight pages by link
    authority), reusing ``graph.graph_pagerank``'s distributed
    iteration core — every power step is one hash join + one groupby
    sum over the edge table; ranks never touch the driver.

    Node ids are ``_hash64(url) % 2^63`` (== DuckDB
    ``md5_number_lower(url) % 2^63`` — int64-safe, collision odds
    ~n²/2^64); nodes are the corpus's HTML pages, edges the resolved
    internal links whose target exists. Output: (url, pr_e12).

    ``seed_mod`` switches to personalized PageRank (see
    ``graph_pagerank``); ``link_ppr`` is the query-facing wrapper.
    """
    from ..functions.hashing import _hash64
    from ..tuning import join_partitions as _jp
    from .graph import graph_pagerank

    jp = _jp()
    M = 2**63

    id_schema = pa.schema([("vec_id", pa.int64()), ("url", pa.string())])

    def _ids(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0 or "url" not in batch.column_names:
            return id_schema.empty_table()
        urls = batch.column("url").to_pylist()
        return pa.Table.from_pydict(
            {
                "vec_id": pa.array([int(_hash64(u)) % M for u in urls], pa.int64()),
                "url": pa.array(urls, pa.string()),
            },
            schema=id_schema,
        )

    # ONE corpus parse shared by the node table and the edge list.
    parsed = _parsed_pages(pages_path)
    if parsed.count() == 0:  # all-binary corpus: no nodes (guard as in link_graph)
        return ray.data.from_arrow(
            pa.schema([("url", pa.string()), (out_col, pa.int64())]).empty_table()
        )

    # Node table: html pages only, (vec_id, url); reused by the final
    # rank→url join.
    nodes_urls = (
        parsed.map_batches(lambda b: b.select(["url"]), batch_format="pyarrow")
        .map_batches(_ids, batch_format="pyarrow")
        .repartition(jp)
        .materialize()
    )

    edge_schema = pa.schema([("src", pa.int64()), ("dst", pa.int64())])

    def _edge_ids(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0 or "src" not in batch.column_names:
            return edge_schema.empty_table()
        return pa.Table.from_pydict(
            {
                "src": pa.array(
                    [int(_hash64(u)) % M for u in batch.column("src").to_pylist()],
                    pa.int64(),
                ),
                "dst": pa.array(
                    [int(_hash64(u)) % M for u in batch.column("dst").to_pylist()],
                    pa.int64(),
                ),
            },
            schema=edge_schema,
        )

    # Edges restricted to existing targets: inner join on the node set
    # (dangling links carry no rank mass, matching link_graph).
    node_ids = nodes_urls.map_batches(
        lambda b: b.select(["vec_id"]).rename_columns(["dst"]),
        batch_format="pyarrow",
    )
    edges = (
        _parsed_edges(parsed)
        .map_batches(_edge_ids, batch_format="pyarrow")
        .repartition(jp)
        .join(node_ids, "inner", jp, on=("dst",))
        .repartition(jp)
    )

    ranks = graph_pagerank(
        "",  # sf_dir unused: nodes+edges supplied
        n_iter=n_iter,
        edges=edges,
        nodes=nodes_urls.map_batches(
            lambda b: b.select(["vec_id"]), batch_format="pyarrow"
        ),
        seed_mod=seed_mod,
    )

    out_schema = pa.schema([("url", pa.string()), (out_col, pa.int64())])

    def _out(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0 or "url" not in batch.column_names:
            return out_schema.empty_table()
        return pa.Table.from_pydict(
            {
                "url": batch.column("url").cast(pa.string()),
                out_col: batch.column("pr_e12").cast(pa.int64()),
            },
            schema=out_schema,
        )

    return (
        ranks.repartition(jp)
        .join(nodes_urls, "inner", jp, on=("vec_id",))
        .map_batches(_out, batch_format="pyarrow")
    )


class _AnchorTextCollector(HTMLParser):
    """Collects (href, inner text) of FLAT <a> elements — the
    oracle-expressible subset (the regexp side matches
    ``<a href="...">text</a>`` without nested markup). The regexp's
    text capture is ``[^<]*`` over RAW bytes, so anything that starts
    with ``<`` inside the anchor — a nested tag, a comment, a
    declaration, a processing instruction — voids its text, and
    entity/character references stay UNDECODED (``&amp;`` is a literal
    term character to the regexp). ``convert_charrefs=False`` plus the
    raw-reconstruction handlers below pin the parser to exactly that."""

    def __init__(self) -> None:
        super().__init__(convert_charrefs=False)
        self.pairs: list[tuple[str, str]] = []
        self._href: str | None = None
        self._text: list[str] = []
        self._flat = True

    def handle_starttag(self, tag: str, attrs) -> None:
        if tag == "a":
            self._href = next(
                (v for k, v in attrs if k == "href" and v is not None), None
            )
            self._text = []
            self._flat = True
        elif self._href is not None:
            self._flat = False

    def handle_data(self, data: str) -> None:
        if self._href is not None:
            self._text.append(data)

    def handle_entityref(self, name: str) -> None:  # '&amp;' stays raw
        if self._href is not None:
            self._text.append(f"&{name};")

    def handle_charref(self, name: str) -> None:  # '&#38;' stays raw
        if self._href is not None:
            self._text.append(f"&#{name};")

    def _void(self, *_args) -> None:  # any '<...' construct breaks [^<]*
        if self._href is not None:
            self._flat = False

    handle_comment = _void
    handle_decl = _void
    handle_pi = _void
    unknown_decl = _void

    def handle_endtag(self, tag: str) -> None:
        if tag == "a" and self._href is not None:
            if self._flat:
                self.pairs.append((self._href, "".join(self._text)))
            self._href = None


def anchor_texts(pages_path: str) -> ray.data.Dataset:
    """Incoming anchor-text profile — for every corpus page, the
    words other pages use when linking TO it (the classic link-based
    relevance/labeling signal; Common Crawl's WAT metadata carries
    exactly these anchor strings):

        (url, term, n_refs)   term = whitespace token of an anchor's
                              inner text, counted over every internal
                              flat anchor whose target is ``url``.

    Scale shape: anchor harvest is ONE stateless pass over the payload
    corpus (the page-url set the existing-target filter needs rides
    along as zero-count ``term=''`` sentinel rows — terms are
    ``str.split()`` output so '' can never collide with a real term);
    per batch, (dst, term) counts pre-combine in a Counter so the
    shuffle moves one row per distinct (dst, term) per block; the
    narrow harvest materializes once, then one ``groupby(dst, term)``
    sum and one inner join against the sentinel page set (dangling
    targets drop, as in ``link_graph``).
    """
    from ..tuning import join_partitions as _jp

    jp = _jp()
    at_schema = pa.schema(
        [("url", pa.string()), ("term", pa.string()), ("n_refs", pa.int64())]
    )

    def _harvest(batch: pa.Table) -> pa.Table:
        from collections import Counter

        counts: Counter = Counter()
        page_urls: list[str] = []
        for url, html in zip(
            batch.column("url").to_pylist(), batch.column("html").to_pylist()
        ):
            if sniff_doc_kind(html or b"") != "html":
                continue
            page_urls.append(url)
            host = _host(url)
            parser = _AnchorTextCollector()
            parser.feed((html or b"").decode("utf-8", errors="replace"))
            for href, text in parser.pairs:
                if not href.startswith("/"):
                    continue
                for term in text.split():
                    counts[(host + href, term)] += 1
        keys = list(counts.keys())
        return pa.Table.from_pydict(
            {
                "url": pa.array([k[0] for k in keys] + page_urls, pa.string()),
                "term": pa.array(
                    [k[1] for k in keys] + [""] * len(page_urls), pa.string()
                ),
                "n_refs": pa.array(
                    list(counts.values()) + [0] * len(page_urls), pa.int64()
                ),
            },
            schema=at_schema,
        )

    from ray.data.aggregate import Sum

    def _retype(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0 or "url" not in batch.column_names:
            return at_schema.empty_table()
        return pa.Table.from_pydict(
            {
                "url": batch.column("url").cast(pa.string()),
                "term": batch.column("term").cast(pa.string()),
                "n_refs": batch.column("n_refs").cast(pa.int64()),
            },
            schema=at_schema,
        )

    def _split(batch: pa.Table, *, markers: bool) -> pa.Table:
        import pyarrow.compute as pc

        if batch.num_rows == 0 or "term" not in batch.column_names:
            return (
                pa.schema([("url", pa.string())]).empty_table()
                if markers
                else at_schema.empty_table()
            )
        mask = pc.equal(batch.column("term"), "")
        if markers:
            return batch.filter(mask).select(["url"])
        return batch.filter(pc.invert(mask))

    # Materialized so the pair branch and the page-set branch both
    # derive from a SINGLE corpus read+parse (branching an unmaterialized
    # dataset would re-execute the harvest per consumer).
    harvest = (
        _read_pages(pages_path)
        .map_batches(_harvest, batch_format="pyarrow")
        .repartition(jp)
        .materialize()
    )
    counted = (
        harvest.map_batches(
            lambda b: _split(b, markers=False), batch_format="pyarrow"
        )
        .groupby(["url", "term"])
        .aggregate(Sum("n_refs", alias_name="n_refs"))
        .map_batches(_retype, batch_format="pyarrow")
        .repartition(jp)
    )
    page_urls = harvest.map_batches(
        lambda b: _split(b, markers=True), batch_format="pyarrow"
    )
    return counted.join(page_urls.repartition(jp), "inner", jp, on=("url",))


def link_components(pages_path: str) -> ray.data.Dataset:
    """Connected components over the UNDIRECTED page link graph — the
    canonical webgraph structure measurement (site sections / link
    islands; the "bow-tie" family of analyses) and the grouping signal
    site-level curation rules act on. Reference has no link ops —
    novel per SURVEY §2 'beyond the reference'.

    Nodes are the corpus's html pages under the same int64 id rule as
    ``link_pagerank`` (``_hash64(url) % 2^63`` ==
    ``md5_number_lower % 2^63``); edges the resolved internal links
    whose target exists, taken undirected. Output: (url, component_id)
    for EVERY html page, component_id = min node id of its component;
    pages with no qualifying edges are singleton components labeled by
    their own id.

    Scale shape: one corpus parse (shared ``_parsed_pages`` table);
    components via ``dedup.cluster_pairs`` — distributed min-label
    propagation with pointer jumping, O(log diameter) join+groupby
    rounds over the (src, dst) pair table; singletons re-attach with
    one left-outer join. Only fixed-width id rows and url strings
    shuffle; payload bytes die at the parse.
    """
    from ..functions.hashing import _hash64
    from ..tuning import join_partitions as _jp
    from .dedup import cluster_pairs

    jp = _jp()
    M = 2**63
    out_schema = pa.schema([("url", pa.string()), ("component_id", pa.int64())])

    parsed = _parsed_pages(pages_path)
    if parsed.count() == 0:  # all-binary corpus (guard as in link_graph)
        return ray.data.from_arrow(out_schema.empty_table())

    id_schema = pa.schema([("vec_id", pa.int64()), ("url", pa.string())])

    def _ids(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0 or "url" not in batch.column_names:
            return id_schema.empty_table()
        urls = batch.column("url").to_pylist()
        return pa.Table.from_pydict(
            {
                "vec_id": pa.array([int(_hash64(u)) % M for u in urls], pa.int64()),
                "url": pa.array(urls, pa.string()),
            },
            schema=id_schema,
        )

    nodes_urls = (
        parsed.map_batches(lambda b: b.select(["url"]), batch_format="pyarrow")
        .map_batches(_ids, batch_format="pyarrow")
        .repartition(jp)
        .materialize()
    )

    pair_schema = pa.schema([("left_id", pa.int64()), ("right_id", pa.int64())])

    def _pair_ids(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0 or "src" not in batch.column_names:
            return pair_schema.empty_table()
        return pa.Table.from_pydict(
            {
                "left_id": pa.array(
                    [int(_hash64(u)) % M for u in batch.column("src").to_pylist()],
                    pa.int64(),
                ),
                "right_id": pa.array(
                    [int(_hash64(u)) % M for u in batch.column("dst").to_pylist()],
                    pa.int64(),
                ),
            },
            schema=pair_schema,
        )

    node_ids = nodes_urls.map_batches(
        lambda b: b.select(["vec_id"]).rename_columns(["right_id"]),
        batch_format="pyarrow",
    )
    pairs = (
        _parsed_edges(parsed)
        .map_batches(_pair_ids, batch_format="pyarrow")
        .repartition(jp)
        .join(node_ids, "inner", jp, on=("right_id",))
        .repartition(jp)
    )

    # cluster_pairs emits (doc_id, cluster_id) — join on its own column
    # names (right_on) rather than renaming: a rename map_batches never
    # runs on an all-empty label table. An ALL-empty right side breaks
    # the join anyway (repartition has no non-empty block to take a
    # schema from — the dedup_survivors hazard), so the zero-edge
    # corpus (seen at bench scale, where the replicated #rN urls make
    # every internal link dangle) branches around the join entirely:
    # every page is its own singleton component.
    comp = cluster_pairs(pairs, join_partitions=jp)
    if comp.count() == 0:
        def _single(batch: pa.Table) -> pa.Table:
            if batch.num_rows == 0 or "url" not in batch.column_names:
                return out_schema.empty_table()
            return pa.Table.from_pydict(
                {
                    "url": batch.column("url").cast(pa.string()),
                    "component_id": batch.column("vec_id").cast(pa.int64()),
                },
                schema=out_schema,
            )

        return nodes_urls.map_batches(_single, batch_format="pyarrow")
    # Launder the schema-less empty blocks the final groupby leaves
    # behind (the cluster_pairs hazard note) — safe now that at least
    # one typed block exists.
    comp = comp.repartition(jp)

    def _out(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0 or "url" not in batch.column_names:
            return out_schema.empty_table()
        import pyarrow.compute as pc

        comp_col = (
            batch.column("cluster_id")
            if "cluster_id" in batch.column_names
            else pa.nulls(batch.num_rows, pa.int64())
        )
        return pa.Table.from_pydict(
            {
                "url": batch.column("url").cast(pa.string()),
                "component_id": pc.coalesce(
                    comp_col.cast(pa.int64()), batch.column("vec_id").cast(pa.int64())
                ),
            },
            schema=out_schema,
        )

    return (
        nodes_urls.join(
            comp, "left_outer", jp, on=("vec_id",), right_on=("doc_id",)
        )
        .map_batches(_out, batch_format="pyarrow")
    )


def _triangle_core(pages_path: str):
    """Shared core of ``link_triangles`` / ``link_clustering``: the
    (node, url) table, distinct undirected edges, per-node degrees and
    per-node triangle counts. Returns (nodes_urls, und, deg, counts,
    jp); each element after the first is None from its first
    degenerate stage on (all-binary corpus → all None; no undirected
    edges → und/deg/counts None; no wedges or no triangles → counts
    None).

    Graph: same node/edge rule as ``link_components`` — nodes are the
    corpus's html pages as ``_hash64(url) % 2^63`` ids, edges the
    resolved internal links whose target exists, taken undirected and
    deduped (parallel links collapse, self-loops drop).

    Algorithm (the standard degree-ordered wedge enumeration, exact):
    orient every undirected edge from its lower-(degree, id) endpoint
    to the higher one — a total order, so each triangle {a,b,c} is
    counted EXACTLY once: as the wedge at its smallest vertex closed
    by the oriented edge between the other two. Orientation bounds
    every out-neighborhood by O(sqrt(E)) regardless of hub skew (a
    hub's edges mostly point INTO it), which is what keeps the wedge
    self-join from exploding on power-law webgraphs — without it the
    wedge count at a degree-d hub is d².

    Scale shape: one corpus parse (shared ``_parsed_pages``); dedup
    and degree via ``reduce_by_keys`` sorts over fixed-width id pairs;
    two hash joins attach degrees; ONE wedge self-join on the oriented
    edge table (output bounded by Σ outdeg² ≤ E·sqrt(E)) and one
    closing-edge semijoin; per-node counts are another
    ``reduce_by_keys``. Payload bytes die at the parse; nothing
    corpus-sized touches the driver.
    """
    from ..functions.hashing import _hash64
    from ..tuning import join_partitions as _jp
    from .grouped import reduce_by_keys

    jp = _jp()
    M = 2**63

    parsed = _parsed_pages(pages_path)
    if parsed.count() == 0:  # all-binary corpus
        return None, None, None, None, jp

    id_schema = pa.schema([("vec_id", pa.int64()), ("url", pa.string())])

    def _ids(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0 or "url" not in batch.column_names:
            return id_schema.empty_table()
        urls = batch.column("url").to_pylist()
        return pa.Table.from_pydict(
            {
                "vec_id": pa.array([int(_hash64(u)) % M for u in urls], pa.int64()),
                "url": pa.array(urls, pa.string()),
            },
            schema=id_schema,
        )

    nodes_urls = (
        parsed.map_batches(lambda b: b.select(["url"]), batch_format="pyarrow")
        .map_batches(_ids, batch_format="pyarrow")
        .repartition(jp)
        .materialize()
    )

    pair_schema = pa.schema([("a", pa.int64()), ("b", pa.int64())])

    def _pair_ids(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0 or "src" not in batch.column_names:
            return pair_schema.empty_table()
        return pa.Table.from_pydict(
            {
                "a": pa.array(
                    [int(_hash64(u)) % M for u in batch.column("src").to_pylist()],
                    pa.int64(),
                ),
                "b": pa.array(
                    [int(_hash64(u)) % M for u in batch.column("dst").to_pylist()],
                    pa.int64(),
                ),
            },
            schema=pair_schema,
        )

    node_ids = nodes_urls.map_batches(
        lambda t: t.select(["vec_id"]).rename_columns(["b"]),
        batch_format="pyarrow",
    )
    raw = (
        _parsed_edges(parsed)
        .map_batches(_pair_ids, batch_format="pyarrow")
        .repartition(jp)
        .join(node_ids, "inner", jp, on=("b",))  # existing targets only
        .repartition(jp)
    )

    def _canon(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0 or "a" not in batch.column_names:
            return pair_schema.empty_table()
        a = batch.column("a").to_numpy(zero_copy_only=False)
        b = batch.column("b").to_numpy(zero_copy_only=False)
        lo, hi = np.minimum(a, b), np.maximum(a, b)
        keep = lo != hi  # self-loops drop
        return pa.Table.from_pydict(
            {"a": pa.array(lo[keep], pa.int64()), "b": pa.array(hi[keep], pa.int64())},
            schema=pair_schema,
        )

    und = (
        reduce_by_keys(
            raw.map_batches(_canon, batch_format="pyarrow"),
            ["a", "b"], None, how="count", out="_n",
        )
        .map_batches(lambda t: t.select(["a", "b"]), batch_format="pyarrow")
        .repartition(jp)
        .materialize()
    )
    if und.count() == 0:  # dangling-link corpus: no edges, no triangles
        return nodes_urls, None, None, None, jp

    def _endpoints(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0 or "a" not in batch.column_names:
            return pa.schema([("node", pa.int64())]).empty_table()
        return pa.Table.from_pydict(
            {
                "node": pa.concat_arrays(
                    [
                        batch.column("a").combine_chunks().cast(pa.int64()),
                        batch.column("b").combine_chunks().cast(pa.int64()),
                    ]
                )
            }
        )

    deg = reduce_by_keys(
        und.map_batches(_endpoints, batch_format="pyarrow"),
        ["node"], None, how="count", out="d",
    ).repartition(jp)

    # Attach both endpoint degrees (two hash joins on the edge table).
    deg_a = deg.map_batches(
        lambda t: t.rename_columns(["a", "da"]), batch_format="pyarrow"
    )
    deg_b = deg.map_batches(
        lambda t: t.rename_columns(["b", "db"]), batch_format="pyarrow"
    )
    withdeg = (
        und.join(deg_a, "inner", jp, on=("a",))
        .repartition(jp)
        .join(deg_b, "inner", jp, on=("b",))
        .repartition(jp)
    )

    o_schema = pa.schema(
        [("src", pa.int64()), ("dst", pa.int64()), ("ddst", pa.int64())]
    )

    def _orient(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0 or "da" not in batch.column_names:
            return o_schema.empty_table()
        a = batch.column("a").to_numpy(zero_copy_only=False)
        b = batch.column("b").to_numpy(zero_copy_only=False)
        da = batch.column("da").to_numpy(zero_copy_only=False)
        db = batch.column("db").to_numpy(zero_copy_only=False)
        fwd = (da < db) | ((da == db) & (a < b))
        return pa.Table.from_pydict(
            {
                "src": pa.array(np.where(fwd, a, b), pa.int64()),
                "dst": pa.array(np.where(fwd, b, a), pa.int64()),
                "ddst": pa.array(np.where(fwd, db, da), pa.int64()),
            },
            schema=o_schema,
        )

    oriented = (
        withdeg.map_batches(_orient, batch_format="pyarrow")
        .repartition(jp)
        .materialize()
    )

    # Wedge enumeration: all ordered out-neighbor pairs at each source,
    # the pair itself ordered by the same (degree, id) total order so
    # the closing edge's stored orientation matches the lookup key.
    right = oriented.map_batches(
        lambda t: t.rename_columns(["src", "w", "dw"]), batch_format="pyarrow"
    )
    wedge_schema = pa.schema(
        [("u", pa.int64()), ("v", pa.int64()), ("w", pa.int64())]
    )

    def _wedges(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0 or "dst" not in batch.column_names:
            return wedge_schema.empty_table()
        v = batch.column("dst").to_numpy(zero_copy_only=False)
        dv = batch.column("ddst").to_numpy(zero_copy_only=False)
        w = batch.column("w").to_numpy(zero_copy_only=False)
        dw = batch.column("dw").to_numpy(zero_copy_only=False)
        keep = (dv < dw) | ((dv == dw) & (v < w))
        return pa.Table.from_pydict(
            {
                "u": batch.column("src").cast(pa.int64()).filter(pa.array(keep)),
                "v": pa.array(v[keep], pa.int64()),
                "w": pa.array(w[keep], pa.int64()),
            },
            schema=wedge_schema,
        )

    wedges = (
        oriented.join(right, "inner", jp, on=("src",))
        .map_batches(_wedges, batch_format="pyarrow")
        .repartition(jp)
        .materialize()
    )
    if wedges.count() == 0:
        return nodes_urls, und, deg, None, jp

    closing = oriented.map_batches(
        lambda t: t.select(["src", "dst"]).rename_columns(["v", "w"]),
        batch_format="pyarrow",
    )
    tri = wedges.join(closing, "inner", jp, on=("v", "w")).repartition(jp)

    def _tri_nodes(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0 or "u" not in batch.column_names:
            return pa.schema([("node", pa.int64())]).empty_table()
        return pa.Table.from_pydict(
            {
                "node": pa.concat_arrays(
                    [
                        batch.column(c).combine_chunks().cast(pa.int64())
                        for c in ("u", "v", "w")
                    ]
                )
            }
        )

    counts = (
        reduce_by_keys(
            tri.map_batches(_tri_nodes, batch_format="pyarrow"),
            ["node"], None, how="count", out="n_triangles",
        )
        .repartition(jp)
        .materialize()
    )
    if counts.count() == 0:
        return nodes_urls, und, deg, None, jp
    return nodes_urls, und, deg, counts, jp


def link_triangles(pages_path: str) -> ray.data.Dataset:
    """Per-page triangle counts over the UNDIRECTED page link graph —
    the webgraph clustering-coefficient numerator (link-farm / spam
    neighborhoods are triangle-dense; editorial link structures are
    tree-like), and the classic two-hop-join distributed-graph shape
    none of the other graph ops exercise. Reference has no link ops —
    novel per SURVEY §2 'beyond the reference'. Algorithm, graph rule
    and scale shape: see ``_triangle_core``.

    Output: (url, n_triangles) for pages in >= 1 triangle, sorted by
    url. Zero-triangle pages are absent (``link_clustering`` is the
    dense per-page table).
    """
    out_schema = pa.schema([("url", pa.string()), ("n_triangles", pa.int64())])
    nodes_urls, _und, _deg, counts, jp = _triangle_core(pages_path)
    if counts is None:
        return ray.data.from_arrow(out_schema.empty_table())

    labeled = counts.join(
        nodes_urls, "inner", jp, on=("node",), right_on=("vec_id",)
    )

    def _shape(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0 or "url" not in batch.column_names:
            return out_schema.empty_table()
        return pa.Table.from_pydict(
            {
                "url": batch.column("url").cast(pa.string()),
                "n_triangles": batch.column("n_triangles").cast(pa.int64()),
            },
            schema=out_schema,
        )

    return labeled.map_batches(_shape, batch_format="pyarrow").sort("url")


_CLUSTERING_SCHEMA = pa.schema(
    [
        ("url", pa.string()),
        ("degree", pa.int64()),
        ("n_triangles", pa.int64()),
        ("coeff_e6", pa.int64()),
    ]
)


def link_clustering(pages_path: str) -> ray.data.Dataset:
    """Per-page local clustering coefficient over the undirected page
    link graph — THE spam/link-farm density signal (a page whose
    neighbors all interlink sits in a clique-like boosting
    neighborhood; editorial link structures are locally tree-like):

        coeff_e6 = (2 * n_triangles * 10^6) // (degree * (degree - 1))

    on the exact e6 integer grid (0 when degree < 2). Dense output —
    EVERY html page gets a row (degree/triangles 0-filled), unlike
    ``link_triangles``' sparse numerator:

        (url, degree, n_triangles, coeff_e6)       sorted by url

    Graph rule and triangle algorithm are shared with
    ``link_triangles`` (``_triangle_core``); this op adds two
    left-outer joins (degree and triangle tables onto the page table —
    narrow int tables, V rows) and one vectorized coefficient map.
    """
    nodes_urls, _und, deg, counts, jp = _triangle_core(pages_path)
    if nodes_urls is None:  # all-binary corpus
        return ray.data.from_arrow(_CLUSTERING_SCHEMA.empty_table())

    out = nodes_urls
    if deg is not None:
        out = out.join(
            deg.map_batches(
                lambda t: t.rename_columns(["vec_id", "degree"]),
                batch_format="pyarrow",
            ),
            "left_outer", jp, on=("vec_id",),
        ).repartition(jp)
    if counts is not None:
        out = out.join(
            counts.map_batches(
                lambda t: t.rename_columns(["vec_id", "n_triangles"]),
                batch_format="pyarrow",
            ),
            "left_outer", jp, on=("vec_id",),
        ).repartition(jp)

    def _coeff(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        if batch.num_rows == 0 or "url" not in batch.column_names:
            return _CLUSTERING_SCHEMA.empty_table()
        n = batch.num_rows
        zero = pa.array(np.zeros(n, np.int64), pa.int64())
        d = (
            pc.fill_null(batch.column("degree"), 0).cast(pa.int64())
            if "degree" in batch.column_names
            else zero
        )
        t = (
            pc.fill_null(batch.column("n_triangles"), 0).cast(pa.int64())
            if "n_triangles" in batch.column_names
            else zero
        )
        dn = d.to_numpy(zero_copy_only=False)
        tn = t.to_numpy(zero_copy_only=False)
        denom = dn * (dn - 1)
        coeff = np.where(denom > 0, (2_000_000 * tn) // np.maximum(denom, 1), 0)
        return pa.Table.from_pydict(
            {
                "url": batch.column("url").cast(pa.string()),
                "degree": d,
                "n_triangles": t,
                "coeff_e6": pa.array(coeff.astype(np.int64), pa.int64()),
            },
            schema=_CLUSTERING_SCHEMA,
        )

    return out.map_batches(_coeff, batch_format="pyarrow").sort("url")


class _StructureCollector(HTMLParser):
    """Start-tag counter + title text for the page-structure profile.

    Counts START tags only (VOID elements like <img> never have end
    tags) so the regexp oracle's '<tag[ >/]' scan agrees on well-formed
    markup; the first <title>'s immediate text is the page title.
    """

    _COUNTED = ("h1", "h2", "h3", "p", "table", "img", "a")

    def __init__(self) -> None:
        super().__init__(convert_charrefs=True)
        self.counts = dict.fromkeys(self._COUNTED, 0)
        self.title = ""
        self._in_title = False
        self._title_done = False

    def handle_starttag(self, tag: str, attrs) -> None:
        if tag in self.counts:
            self.counts[tag] += 1
        if tag == "title" and not self._title_done:
            self._in_title = True

    def handle_data(self, data: str) -> None:
        if self._in_title:
            self.title += data

    def handle_endtag(self, tag: str) -> None:
        if tag == "title" and self._in_title:
            self._in_title = False
            self._title_done = True


_STRUCT_SCHEMA = pa.schema(
    [
        ("url", pa.string()),
        ("title", pa.string()),
        ("n_headings", pa.int64()),
        ("n_paragraphs", pa.int64()),
        ("n_tables", pa.int64()),
        ("n_images", pa.int64()),
        ("n_anchors", pa.int64()),
    ]
)


def page_structure(pages_path: str) -> ray.data.Dataset:
    """Per-page structural profile — the layout-aware curation signal
    (table-heavy pages, image galleries, heading-less walls of text
    each get different treatment in a webtext recipe) and the WAT-style
    page-metadata product: title plus start-tag counts for headings
    (h1-h3), paragraphs, tables, images and anchors. Reference has no
    link/DOM ops — novel per SURVEY §2 'beyond the reference'.

    Verified by the same parser-vs-regexp duality as ``link_graph``:
    the Ray side walks the stdlib HTMLParser DOM, the oracle counts
    ``<tag[ >/]`` regexp hits and extracts the first <title> — two
    independent implementations that must agree on well-formed markup.

    Scale shape: one stateless streaming parse, no shuffle at all
    (the profile is per-row); payload bytes die at the map. Output
    sorted by url.
    """
    def _profile(batch: pa.Table) -> pa.Table:
        rows = {k: [] for k in _STRUCT_SCHEMA.names}
        for url, html in zip(
            batch.column("url").to_pylist(), batch.column("html").to_pylist()
        ):
            if sniff_doc_kind(html or b"") != "html":
                continue
            c = _StructureCollector()
            c.feed((html or b"").decode("utf-8", errors="replace"))
            rows["url"].append(url)
            rows["title"].append(c.title)
            rows["n_headings"].append(
                c.counts["h1"] + c.counts["h2"] + c.counts["h3"]
            )
            rows["n_paragraphs"].append(c.counts["p"])
            rows["n_tables"].append(c.counts["table"])
            rows["n_images"].append(c.counts["img"])
            rows["n_anchors"].append(c.counts["a"])
        return pa.Table.from_pydict(rows, schema=_STRUCT_SCHEMA)

    return (
        _read_pages(pages_path)
        .map_batches(_profile, batch_format="pyarrow")
        .sort("url")
    )


def lpa_labels(
    und: ray.data.Dataset, n_rounds: int, jp: int
) -> ray.data.Dataset:
    """Synchronous label-propagation core over a DISTINCT undirected
    edge table ``und(node, peer)``: every round, each node adopts the
    most frequent label among its neighbors' current labels (ties →
    smallest label); nodes keep their own id as the initial label.
    Exactly ``n_rounds`` synchronous rounds — LPA is a heuristic whose
    value is the frozen, order-free recurrence, not a fixed point (the
    oracle unrolls the same rounds as plain SQL).

    Every round is the materialized-round sort-gather shape that won
    the ``cluster_pairs`` A/B (BASELINE.md): gather each peer's label
    onto the edge rows (``grouped.gather_by_key``), count (node,
    label) votes and take the per-node max count via
    ``grouped.reduce_by_keys`` sort+reduceat, then min-label among the
    tied winners — plus the load-bearing ``repartition(jp)`` before
    each materialize so union+sort rounds don't compound block counts.
    Labels never touch the driver. Returns (node, label) for every
    node present in ``und``.
    """
    from .grouped import gather_by_key, reduce_by_keys

    nl_schema = pa.schema([("node", pa.int64()), ("label", pa.int64())])
    und_schema = pa.schema([("node", pa.int64()), ("peer", pa.int64())])
    cnt_schema = pa.schema(
        [("node", pa.int64()), ("label", pa.int64()), ("cnt", pa.int64())]
    )

    def _self(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0 or "node" not in batch.column_names:
            return nl_schema.empty_table()
        return pa.Table.from_pydict(
            {"node": batch.column("node"), "label": batch.column("node")},
            schema=nl_schema,
        )

    labels = (
        reduce_by_keys(
            und.map_batches(_self, batch_format="pyarrow"),
            ["node"], "label", "min",
        )
        .repartition(jp)
        .materialize()
    )

    def _vote(batch: pa.Table) -> pa.Table:
        # after gathering the peer's label onto (node, peer): one vote
        # row (node, label) per incident edge.
        if batch.num_rows == 0 or "node" not in batch.column_names:
            return nl_schema.empty_table()
        return pa.Table.from_pydict(
            {"node": batch.column("node"), "label": batch.column("label")},
            schema=nl_schema,
        )

    def _keep_winners(batch: pa.Table) -> pa.Table:
        # rows (node, label, cnt, best): keep the labels whose vote
        # count equals the node's max.
        import pyarrow.compute as pc

        if batch.num_rows == 0 or "node" not in batch.column_names:
            return nl_schema.empty_table()
        kept = batch.filter(pc.equal(batch.column("cnt"), batch.column("best")))
        return pa.Table.from_pydict(
            {"node": kept.column("node"), "label": kept.column("label")},
            schema=nl_schema,
        )

    for _ in range(n_rounds):
        votes = gather_by_key(
            und, "peer", labels, "node", "label", "label",
            und_schema, pa.int64(),
        ).map_batches(_vote, batch_format="pyarrow")
        cnt = reduce_by_keys(votes, ["node", "label"], None, "count", out="cnt")
        best = reduce_by_keys(cnt, ["node"], "cnt", "max", out="best")
        winners = gather_by_key(
            cnt, "node", best, "node", "best", "best",
            cnt_schema, pa.int64(),
        ).map_batches(_keep_winners, batch_format="pyarrow")
        labels = (
            reduce_by_keys(winners, ["node"], "label", "min")
            .repartition(jp)
            .materialize()
        )
    return labels


def link_communities(pages_path: str, n_rounds: int = 2) -> ray.data.Dataset:
    """Community detection over the UNDIRECTED page link graph by
    synchronous label propagation (LPA, Raghavan et al. 2007) — the
    site-section / topic-cluster grouping a curation pipeline uses
    where connected components are too coarse (one bridge link fuses
    two sites into one component; LPA's majority vote keeps densely
    linked clusters separate). Reference has no link ops — novel scale
    operator per SURVEY §2 'beyond the reference'.

    Frozen semantics (mirrored exactly by the unrolled-SQL oracle):
      * nodes/ids/edges exactly as ``link_components`` (HTML pages,
        ids = ``_hash64(url) % 2^63``, edges resolved-internal links
        whose target exists in the corpus);
      * the vote graph is the DISTINCT undirected edge set (parallel
        links collapse to one vote; a self-loop is one self-vote);
      * init label = own id; per round, label ← most frequent label
        among neighbor labels, ties → smallest label (synchronous:
        all votes read the previous round's labels);
      * exactly ``n_rounds`` rounds (default 2 — hop radius 2, the
        point where site sections stabilize on bridge-shaped graphs);
      * pages with no edges are their own singleton community.

    Output: (url, community_id), community_id = the final label.
    Scale shape: only (int64, int64) edge/label/vote rows enter any
    shuffle; per round 3 sorts over O(E) rows; labels never touch the
    driver (``lpa_labels``).
    """
    from ..functions.hashing import _hash64
    from ..tuning import join_partitions as _jp

    jp = _jp()
    M = 2**63
    out_schema = pa.schema([("url", pa.string()), ("community_id", pa.int64())])

    parsed = _parsed_pages(pages_path)
    if parsed.count() == 0:
        return ray.data.from_arrow(out_schema.empty_table())

    id_schema = pa.schema([("vec_id", pa.int64()), ("url", pa.string())])

    def _ids(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0 or "url" not in batch.column_names:
            return id_schema.empty_table()
        urls = batch.column("url").to_pylist()
        return pa.Table.from_pydict(
            {
                "vec_id": pa.array([int(_hash64(u)) % M for u in urls], pa.int64()),
                "url": pa.array(urls, pa.string()),
            },
            schema=id_schema,
        )

    nodes_urls = (
        parsed.map_batches(lambda b: b.select(["url"]), batch_format="pyarrow")
        .map_batches(_ids, batch_format="pyarrow")
        .repartition(jp)
        .materialize()
    )

    und_schema = pa.schema([("node", pa.int64()), ("peer", pa.int64())])

    def _pair_ids(batch: pa.Table) -> pa.Table:
        # both directions at once; corpus-membership of dst is filtered
        # by the gather below (ids are the side table).
        if batch.num_rows == 0 or "src" not in batch.column_names:
            return und_schema.empty_table()
        s = pa.array(
            [int(_hash64(u)) % M for u in batch.column("src").to_pylist()],
            pa.int64(),
        )
        d = pa.array(
            [int(_hash64(u)) % M for u in batch.column("dst").to_pylist()],
            pa.int64(),
        )
        return pa.Table.from_pydict(
            {"node": pa.concat_arrays([s, d]), "peer": pa.concat_arrays([d, s])},
            schema=und_schema,
        )

    # Keep only edges whose dst exists in the corpus: gather the known
    # node id onto each (node, peer) row by peer — unknown peers drop
    # (inner semantics). Both directions were emitted, so filtering on
    # peer alone covers dst-membership for both orientations (src is a
    # corpus page by construction). Then collapse duplicates.
    from .grouped import gather_by_key, reduce_by_keys

    node_side = nodes_urls.map_batches(
        lambda b: b.select(["vec_id"]), batch_format="pyarrow"
    )
    und_all = gather_by_key(
        _parsed_edges(parsed).map_batches(_pair_ids, batch_format="pyarrow"),
        "peer", node_side, "vec_id", "vec_id", "known",
        und_schema, pa.int64(),
    ).map_batches(
        lambda b: b.select(["node", "peer"]) if b.num_rows else und_schema.empty_table(),
        batch_format="pyarrow",
    )
    und = (
        reduce_by_keys(und_all, ["node", "peer"], None, "count", out="n")
        .map_batches(
            lambda b: b.select(["node", "peer"])
            if b.num_rows
            else und_schema.empty_table(),
            batch_format="pyarrow",
        )
        .repartition(jp)
        .materialize()
    )

    if und.count() == 0:
        def _single(batch: pa.Table) -> pa.Table:
            if batch.num_rows == 0 or "url" not in batch.column_names:
                return out_schema.empty_table()
            return pa.Table.from_pydict(
                {
                    "url": batch.column("url").cast(pa.string()),
                    "community_id": batch.column("vec_id").cast(pa.int64()),
                },
                schema=out_schema,
            )

        return nodes_urls.map_batches(_single, batch_format="pyarrow")

    labels = lpa_labels(und, n_rounds, jp)

    # Attach the final label onto every page row; label-less pages
    # (no edges) are their own singleton community.
    def _out(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0 or "url" not in batch.column_names:
            return out_schema.empty_table()
        return pa.Table.from_pydict(
            {
                "url": batch.column("url").cast(pa.string()),
                "community_id": batch.column("label").cast(pa.int64()),
            },
            schema=out_schema,
        )

    def _own(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0 or "url" not in batch.column_names:
            return out_schema.empty_table()
        return pa.Table.from_pydict(
            {
                "url": batch.column("url").cast(pa.string()),
                "community_id": batch.column("vec_id").cast(pa.int64()),
            },
            schema=out_schema,
        )

    labeled = gather_by_key(
        nodes_urls, "vec_id", labels, "node", "label", "label",
        id_schema, pa.int64(),
    ).map_batches(_out, batch_format="pyarrow")
    # The inner gather dropped edge-less pages; they come back as their
    # own singleton communities via a vectorized anti-join (pages whose
    # vec_id has no label row) — same sort-gather machinery, no
    # per-group Python calls.
    from .grouped import anti_by_key

    singletons = anti_by_key(
        nodes_urls, "vec_id", labels, "node", id_schema
    ).map_batches(_own, batch_format="pyarrow")
    return labeled.union(singletons)


def link_ppr(
    pages_path: str, n_iter: int = 3, seed_mod: int = 8
) -> ray.data.Dataset:
    """Seed-personalized PageRank over the page link graph — the
    seed-expansion signal targeted-crawl curation ranks candidate
    pages by (random walk with restart to a trusted seed set; see
    e.g. Haveliwala 2002, topic-sensitive PageRank). The seed set is
    the hash-deterministic {page : _hash64(url) % 2^63 % seed_mod ==
    0} stand-in for a curated allowlist; teleport mass goes ONLY to
    seeds, so a page's rank measures its link proximity to the seed
    set rather than global centrality (``link_pagerank``). Exact
    integer-grid recurrence — see ``graph.graph_pagerank``.

    Output: (url, ppr_e12) for every HTML page.
    """
    return link_pagerank(
        pages_path, n_iter=n_iter, seed_mod=seed_mod, out_col="ppr_e12"
    )


_SECTION_RE = r"^(?P<sec>https?://[^/]+(?:/[^/]+)?)"
_SECTION_SCHEMA = pa.schema(
    [
        ("src_section", pa.string()),
        ("dst_section", pa.string()),
        ("n_links", pa.int64()),
        ("n_src_pages", pa.int64()),
    ]
)


def section_graph(pages_path: str) -> ray.data.Dataset:
    """Host/section-level webgraph rollup — the aggregation Common
    Crawl ships as its host- and domain-level graphs: page→page edges
    collapsed to coarse nodes with edge weights, the unit at which
    crawl curation reasons about sites (spam-site neighborhoods,
    per-host caps, domain-level PageRank seeds). Reference has no link
    ops — novel per SURVEY §2 'beyond the reference'.

    The coarse node is the url's SECTION: ``scheme://host/<first path
    segment>`` (just ``scheme://host`` for segment-less urls). On a
    multi-host corpus the same rule degrades gracefully toward the
    host graph (every host contributes its top-level sections); on the
    single-host fixture corpus it yields the site-section graph.

    Output, one row per (src_section, dst_section) with ≥1 edge:

        (src_section, dst_section, n_links, n_src_pages)

    ``n_links`` counts page-level internal edges whose target EXISTS
    in the corpus (same edge rule as ``link_graph``; parallel links
    count each time), ``n_src_pages`` the distinct source pages
    contributing them.

    Scale shape: one shared corpus parse; the edge table joins the
    page-url table once (existing targets), sections are derived
    vectorized (``pc.extract_regex``), and both aggregates come from
    ONE ``map_key_groups`` sort on (src_section, dst_section) — the
    distinct-src count is a vectorized in-group ``pc.count_distinct``,
    no corpus-wide count-distinct shuffle. Output is O(sections²),
    tiny at any corpus size.
    """
    from ..tuning import join_partitions as _jp
    from .grouped import map_key_groups

    jp = _jp()
    parsed = _parsed_pages(pages_path)
    if parsed.count() == 0:  # all-binary corpus
        return ray.data.from_arrow(_SECTION_SCHEMA.empty_table())

    url_tbl = parsed.map_batches(
        lambda b: b.select(["url"]).rename_columns(["dst"]),
        batch_format="pyarrow",
    )
    edges = (
        _parsed_edges(parsed)
        .repartition(jp)
        .join(url_tbl, "inner", jp, on=("dst",))  # existing targets only
    )

    tri_schema = pa.schema(
        [
            ("src_section", pa.string()),
            ("dst_section", pa.string()),
            ("src", pa.string()),
        ]
    )

    def _sections(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        if batch.num_rows == 0 or "src" not in batch.column_names:
            return tri_schema.empty_table()

        def sec(col: pa.ChunkedArray) -> pa.Array:
            m = pc.extract_regex(col.cast(pa.string()), _SECTION_RE)
            return pc.struct_field(m, "sec")

        return pa.Table.from_pydict(
            {
                "src_section": sec(batch.column("src")),
                "dst_section": sec(batch.column("dst")),
                "src": batch.column("src").cast(pa.string()),
            },
            schema=tri_schema,
        )

    tri = edges.map_batches(_sections, batch_format="pyarrow")

    def _rollup(group: pa.Table) -> pa.Table:
        # One (src_section, dst_section) group: n_links is the row
        # count, n_src_pages the vectorized distinct-src count.
        import pyarrow.compute as pc

        if group.num_rows == 0:
            return _SECTION_SCHEMA.empty_table()
        n_src = pc.count_distinct(group.column("src")).as_py()
        return pa.Table.from_pydict(
            {
                "src_section": group.column("src_section").slice(0, 1),
                "dst_section": group.column("dst_section").slice(0, 1),
                "n_links": pa.array([group.num_rows], pa.int64()),
                "n_src_pages": pa.array([n_src], pa.int64()),
            },
            schema=_SECTION_SCHEMA,
        )

    return map_key_groups(tri, ["src_section", "dst_section"], _rollup)


# HyperBall constants (m = 16 registers, b = 4): the raw HyperLogLog
# estimator numerator alpha_16 * m^2 * 2^61 * 1e6 = 172288000 * 2^61
# (alpha_16 = 0.673), the rank ceiling 61 (60-bit hash suffix), and a
# defensive estimate cap keeping est_e6 inside int64 even under
# astronomically improbable register states. Injected verbatim into
# the SQL oracle, so both engines share one integer grid.
HB_M = 16
HB_RANK0 = 61
HB_NUM_E6 = 172288000 << 61
HB_EST_CAP_E6 = 10**18
_HB_SCHEMA = pa.schema(
    [
        ("url", pa.string()),
        ("est1_e6", pa.int64()),
        ("est2_e6", pa.int64()),
        ("est3_e6", pa.int64()),
        ("harmonic_e6", pa.int64()),
    ]
)


def _hb_est(regs_col: pa.ChunkedArray) -> pa.Array:
    """Raw-HLL ball estimate per packed-register row, exact integers:
    est_e6 = min(HB_NUM_E6 // S, cap) with S = sum_j 2^(61 - M_j)
    (M_j = 0 for never-touched registers). The power sums are
    vectorized uint64 (zero-register count split out so nothing can
    overflow); only the final big-int division is per-row Python —
    two machine ints per node, the same cost class as the per-row md5
    id mapping every link op already does."""
    vals = regs_col.to_pylist()
    if not vals:
        return pa.array([], pa.int64())
    arr = np.frombuffer(b"".join(vals), np.uint8).reshape(-1, HB_M)
    cnt0 = (arr == 0).sum(axis=1).astype(np.uint64)
    # present registers (val >= 1): 2^(60 - val) <= 2^59, row sum
    # <= 16 * 2^59 = 2^63 — always inside uint64
    half = np.where(
        arr == 0, np.uint64(0), np.uint64(1) << (np.uint64(60) - arr.astype(np.uint64))
    ).sum(axis=1, dtype=np.uint64)
    p61 = 1 << HB_RANK0
    return pa.array(
        [
            min(HB_NUM_E6 // (int(c) * p61 + 2 * int(s)), HB_EST_CAP_E6)
            for c, s in zip(cnt0.tolist(), half.tolist())
        ],
        pa.int64(),
    )


def link_harmonic(pages_path: str, n_rounds: int = 3) -> ray.data.Dataset:
    """HyperBall neighborhood function + harmonic centrality over the
    page link graph (Boldi & Vigna, "In-core computation of geometric
    centralities with HyperBall", 2013) — the algorithm and metric
    Common Crawl uses to rank its host-level webgraph. Reference has
    no link ops — novel per SURVEY §2 'beyond the reference'.

    Per page v the op estimates |B_r(v)| = #{u : d(u, v) <= r} (the
    IN-ball: pages that can reach v, the authority direction) for
    r = 1..n_rounds with one HyperLogLog counter per node, and derives
    the radius-bounded harmonic centrality

        harmonic_e6 = sum_r (est_r_e6 - est_{r-1}_e6) // r .

    Frozen integer semantics (shared with the SQL oracle as injected
    literals): node hash = the 64-bit md5 hash (`_kgram_hash64(url)`
    == DuckDB ``md5_number_lower``); register index = low 4 bits, rank
    = 61 - bit_length(high 60 bits) (61 when zero); counter merge =
    element-wise register max; ball estimate = the RAW HLL estimator
    floor(alpha_16 * 256 * 2^61 * 1e6 / sum_j 2^(61 - M_j)) with NO
    small/large-range bias corrections — corrections are a float
    epilogue a consumer applies driver-side (cf. ``hll_registers``);
    the frozen rule keeps every intermediate an exact integer. Graph:
    distinct existing-target internal edges, self-loops dropped; a
    counter update round absorbs, for every edge (w, v), w's counter
    into v's.

    Output: (url, est1_e6, est2_e6, est3_e6, harmonic_e6) per page.

    Scale shape: counters are V rows of (int64 node, 16-byte packed
    registers) — constant per node regardless of ball size, WHY the
    sketch exists (exact balls are O(V * ball) pair rows). Each round
    is one `gather_by_key` sort (attach src counters to edges) + one
    node-sorted per-block `np.maximum.reduceat` byte-max — no hash
    joins, no Aggregate; blocks are repartition-bounded per round
    (the cluster_pairs lesson). Estimates per round are one stateless
    map; the per-round est columns attach back with n_rounds+1 more
    narrow-table gathers.
    """
    from ..functions.hashing import _hash64
    from ..functions.textstats import _kgram_hash64
    from ..tuning import join_partitions as _jp
    from .grouped import gather_by_key, group_bounds, reduce_by_keys

    jp = _jp()
    M = 2**63

    parsed = _parsed_pages(pages_path)
    if parsed.count() == 0:  # all-binary corpus
        return ray.data.from_arrow(_HB_SCHEMA.empty_table())

    cnt_schema = pa.schema([("node", pa.int64()), ("regs", pa.binary())])
    node_url_schema = pa.schema([("node", pa.int64()), ("url", pa.string())])

    init_schema = pa.schema(
        list(node_url_schema) + [pa.field("regs", pa.binary())]
    )

    def _init(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0 or "url" not in batch.column_names:
            return init_schema.empty_table()
        urls = batch.column("url").to_pylist()
        nodes, regs = [], []
        for u in urls:
            h = _kgram_hash64(u)
            v = h >> 4
            rank = HB_RANK0 - v.bit_length() if v else HB_RANK0
            b = bytearray(HB_M)
            b[h & (HB_M - 1)] = rank
            nodes.append(int(_hash64(u)) % M)
            regs.append(bytes(b))
        return pa.Table.from_pydict(
            {
                "node": pa.array(nodes, pa.int64()),
                "url": pa.array(urls, pa.string()),
                "regs": pa.array(regs, pa.binary()),
            },
            schema=init_schema,
        )

    init = (
        parsed.map_batches(lambda b: b.select(["url"]), batch_format="pyarrow")
        .map_batches(_init, batch_format="pyarrow")
        .repartition(jp)
        .materialize()
    )
    nodes_urls = init.map_batches(
        lambda b: b.select(["node", "url"]), batch_format="pyarrow"
    )

    def _max_regs(block: pa.Table) -> pa.Table:
        # node-sorted block: element-wise byte max across each node's
        # register rows, fully vectorized.
        if block.num_rows == 0:
            return cnt_schema.empty_table()
        block = block.combine_chunks()
        bounds = group_bounds(block, ["node"])
        starts = bounds[:-1]
        arr = np.frombuffer(
            b"".join(block.column("regs").to_pylist()), np.uint8
        ).reshape(-1, HB_M)
        merged = np.maximum.reduceat(arr, starts, axis=0)
        return pa.Table.from_pydict(
            {
                "node": block.column("node").take(pa.array(starts)),
                "regs": pa.array(
                    [merged[i].tobytes() for i in range(len(starts))], pa.binary()
                ),
            },
            schema=cnt_schema,
        )

    def _merge(ds: ray.data.Dataset) -> ray.data.Dataset:
        return (
            ds.repartition(jp)
            .sort(["node"])
            .map_batches(_max_regs, batch_format="pyarrow", batch_size=None)
            .repartition(jp)
            .materialize()
        )

    # Merge at init too: two urls hashing to one node id (possible,
    # however unlikely, in the 2^63 id space) must share one counter —
    # the SQL oracle's GROUP BY does, and the per-round gather requires
    # unique side keys.
    counters = _merge(
        init.map_batches(
            lambda b: b.select(["node", "regs"]), batch_format="pyarrow"
        )
    )

    # Distinct existing-target edges as (src, dst) int64 ids, no
    # self-loops. Duplicates would be idempotent under max-merge but
    # would multiply gather rows.
    pair_schema = pa.schema([("src", pa.int64()), ("dst", pa.int64())])

    def _pair_ids(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0 or "src" not in batch.column_names:
            return pair_schema.empty_table()
        s = [int(_hash64(u)) % M for u in batch.column("src").to_pylist()]
        d = [int(_hash64(u)) % M for u in batch.column("dst").to_pylist()]
        keep = [i for i in range(len(s)) if s[i] != d[i]]
        return pa.Table.from_pydict(
            {
                "src": pa.array([s[i] for i in keep], pa.int64()),
                "dst": pa.array([d[i] for i in keep], pa.int64()),
            },
            schema=pair_schema,
        )

    node_ids = nodes_urls.map_batches(
        lambda t: t.select(["node"]).rename_columns(["dst"]), batch_format="pyarrow"
    )
    raw_pairs = (
        _parsed_edges(parsed)
        .map_batches(_pair_ids, batch_format="pyarrow")
        .repartition(jp)
        .materialize()
    )
    # Ray 2.49 all-empty datasets are schema-less and break the join
    # (ArrowInvalid FieldRef) — branch around it for link-free corpora.
    have_edges = raw_pairs.count() > 0
    if have_edges:
        edges = (
            reduce_by_keys(
                raw_pairs.join(node_ids, "inner", jp, on=("dst",)),  # existing targets
                ["src", "dst"], None, how="count", out="_n",
            )
            .map_batches(lambda t: t.select(["src", "dst"]), batch_format="pyarrow")
            .repartition(jp)
            .materialize()
        )
        have_edges = edges.count() > 0

    est_tables = []  # (node, est) per radius 0..n_rounds

    def _est_tbl(cnts: ray.data.Dataset) -> ray.data.Dataset:
        def _m(batch: pa.Table) -> pa.Table:
            if batch.num_rows == 0 or "node" not in batch.column_names:
                return pa.schema(
                    [("node", pa.int64()), ("est", pa.int64())]
                ).empty_table()
            return pa.Table.from_pydict(
                {"node": batch.column("node"), "est": _hb_est(batch.column("regs"))}
            )

        return cnts.map_batches(_m, batch_format="pyarrow").materialize()

    est_tables.append(_est_tbl(counters))
    for _ in range(n_rounds):
        if not have_edges:
            est_tables.append(est_tables[-1])
            continue
        gathered = gather_by_key(
            edges, "src", counters, "node", "regs", "regs", pair_schema, pa.binary()
        ).map_batches(
            lambda t: t.select(["dst", "regs"]).rename_columns(["node", "regs"]),
            batch_format="pyarrow",
        )
        counters = _merge(counters.union(gathered))
        est_tables.append(_est_tbl(counters))

    # Attach est_0..est_R onto the node/url table, then the harmonic
    # epilogue — all narrow int tables.
    out = nodes_urls
    schema_so_far = node_url_schema
    for r, tbl in enumerate(est_tables):
        out = gather_by_key(
            out, "node", tbl, "node", "est", f"_e{r}", schema_so_far, pa.int64()
        )
        schema_so_far = pa.schema(
            list(schema_so_far) + [pa.field(f"_e{r}", pa.int64())]
        )

    def _final(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0 or "url" not in batch.column_names:
            return _HB_SCHEMA.empty_table()
        e = [
            batch.column(f"_e{r}").to_numpy(zero_copy_only=False)
            for r in range(n_rounds + 1)
        ]
        harm = np.zeros(batch.num_rows, np.int64)
        for r in range(1, n_rounds + 1):
            harm += (e[r] - e[r - 1]) // r
        return pa.Table.from_pydict(
            {
                "url": batch.column("url"),
                "est1_e6": pa.array(e[1], pa.int64()),
                "est2_e6": pa.array(e[min(2, n_rounds)], pa.int64()),
                "est3_e6": pa.array(e[min(3, n_rounds)], pa.int64()),
                "harmonic_e6": pa.array(harm, pa.int64()),
            },
            schema=_HB_SCHEMA,
        )

    return out.map_batches(_final, batch_format="pyarrow")


HITS_T = 10**12  # L1 normalization grid: each score vector sums to ~T
HITS_INIT = 10**6
_HITS_SCHEMA = pa.schema(
    [
        ("url", pa.string()),
        ("auth_e12", pa.int64()),
        ("hub_e12", pa.int64()),
    ]
)


def link_hits(pages_path: str, n_iter: int = 2) -> ray.data.Dataset:
    """HITS hub/authority scores over the page link graph (Kleinberg
    1999) — the complementary centrality pair to PageRank a webgraph
    product ships: authorities are pages good hubs point AT, hubs are
    pages that point at good authorities (directory/link-roundup pages
    rank as hubs, canonical content as authorities). Reference has no
    link ops — novel per SURVEY §2 'beyond the reference'.

    Frozen integer semantics (mirrored by the SQL oracle):
      * graph = distinct existing-target internal edges, self-loops
        dropped, nodes = `_hash64(url) % 2^63` (the link-family rule);
      * hub_0 = 10^6 per node;
      * iteration r: auth_raw(v) = sum of hub_{r-1} over in-edges,
        then L1-renormalize to the 10^12 grid — auth(v) =
        (10^12 * auth_raw(v)) // S_a with S_a the global raw sum
        (all-zero stays all-zero); hub_raw(v) = sum of auth_r over
        out-edges, renormalized the same way. Exact floor division —
        the L1 (not the classical L2) norm keeps every intermediate
        an exact integer; the RANKING is what consumers use and the
        grid is deterministic at any cluster size.

    Output: (url, auth_e12, hub_e12) after ``n_iter`` iterations.

    Scale shape: each half-step is one `gather_by_key` sort (scores
    onto edges) + a union-with-zeros + one `reduce_by_keys` integer
    sum — the pagerank shape with normalization instead of damping.
    The global S is a driver SCALAR (`Dataset.sum`), never a
    materialized table. Per-node scores <= 10^12, so an int64 raw sum
    is safe up to in-degree ~9*10^6 on a single node; beyond that the
    grid constant should shrink with cluster size.
    """
    from ..functions.hashing import _hash64
    from ..tuning import join_partitions as _jp
    from .grouped import gather_by_key, reduce_by_keys

    jp = _jp()
    M = 2**63

    parsed = _parsed_pages(pages_path)
    if parsed.count() == 0:  # all-binary corpus
        return ray.data.from_arrow(_HITS_SCHEMA.empty_table())

    node_url_schema = pa.schema([("node", pa.int64()), ("url", pa.string())])

    def _ids(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0 or "url" not in batch.column_names:
            return node_url_schema.empty_table()
        urls = batch.column("url").to_pylist()
        return pa.Table.from_pydict(
            {
                "node": pa.array(
                    [int(_hash64(u)) % M for u in urls], pa.int64()
                ),
                "url": pa.array(urls, pa.string()),
            },
            schema=node_url_schema,
        )

    nodes_urls = (
        parsed.map_batches(lambda b: b.select(["url"]), batch_format="pyarrow")
        .map_batches(_ids, batch_format="pyarrow")
        .repartition(jp)
        .materialize()
    )
    # distinct node ids (hash collisions share one score row, as the
    # SQL oracle's DISTINCT does)
    nds = reduce_by_keys(
        nodes_urls.map_batches(
            lambda t: t.select(["node"]), batch_format="pyarrow"
        ),
        ["node"], None, how="count", out="_n",
    ).map_batches(
        lambda t: t.select(["node"]), batch_format="pyarrow"
    ).repartition(jp).materialize()  # repartition launders Ray 2.49's
    # schema-less empty sort blocks (they break the Acero edge join)

    score_schema = pa.schema([("node", pa.int64()), ("s", pa.int64())])

    def _const(value: int):
        def _m(batch: pa.Table) -> pa.Table:
            if batch.num_rows == 0 or "node" not in batch.column_names:
                return score_schema.empty_table()
            return pa.Table.from_pydict(
                {
                    "node": batch.column("node"),
                    "s": pa.array(
                        np.full(batch.num_rows, value, np.int64), pa.int64()
                    ),
                },
                schema=score_schema,
            )

        return _m

    zeros = nds.map_batches(_const(0), batch_format="pyarrow").materialize()
    hub = nds.map_batches(_const(HITS_INIT), batch_format="pyarrow").materialize()

    pair_schema = pa.schema([("src", pa.int64()), ("dst", pa.int64())])

    def _pair_ids(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0 or "src" not in batch.column_names:
            return pair_schema.empty_table()
        s = [int(_hash64(u)) % M for u in batch.column("src").to_pylist()]
        d = [int(_hash64(u)) % M for u in batch.column("dst").to_pylist()]
        keep = [i for i in range(len(s)) if s[i] != d[i]]
        return pa.Table.from_pydict(
            {
                "src": pa.array([s[i] for i in keep], pa.int64()),
                "dst": pa.array([d[i] for i in keep], pa.int64()),
            },
            schema=pair_schema,
        )

    node_ids = nds.map_batches(
        lambda t: t.rename_columns(["dst"]), batch_format="pyarrow"
    )
    raw_pairs = (
        _parsed_edges(parsed)
        .map_batches(_pair_ids, batch_format="pyarrow")
        .repartition(jp)
        .materialize()
    )
    have_edges = raw_pairs.count() > 0
    if have_edges:
        edges = (
            reduce_by_keys(
                raw_pairs.join(node_ids, "inner", jp, on=("dst",)),
                ["src", "dst"], None, how="count", out="_n",
            )
            .map_batches(lambda t: t.select(["src", "dst"]), batch_format="pyarrow")
            .repartition(jp)
            .materialize()
        )
        have_edges = edges.count() > 0

    def _step(score: ray.data.Dataset, from_col: str, to_col: str) -> ray.data.Dataset:
        """One half-step: sum `score` over edges arriving at `to_col`
        endpoints from `from_col` endpoints, then L1-renormalize."""
        gathered = gather_by_key(
            edges, from_col, score, "node", "s", "sv", pair_schema, pa.int64()
        ).map_batches(
            lambda t: t.select([to_col, "sv"]).rename_columns(["node", "s"]),
            batch_format="pyarrow",
        )
        raw = (
            reduce_by_keys(
                gathered.union(zeros).repartition(jp), ["node"], "s", how="sum"
            )
            .repartition(jp)
            .materialize()
        )
        total = int(raw.sum("s") or 0)

        def _norm(batch: pa.Table) -> pa.Table:
            if batch.num_rows == 0 or "node" not in batch.column_names:
                return score_schema.empty_table()
            vals = batch.column("s").to_pylist()
            return pa.Table.from_pydict(
                {
                    "node": batch.column("node"),
                    "s": pa.array(
                        [0 if total == 0 else (HITS_T * v) // total for v in vals],
                        pa.int64(),
                    ),
                },
                schema=score_schema,
            )

        return raw.map_batches(_norm, batch_format="pyarrow").materialize()

    auth = zeros
    if have_edges:
        for _ in range(n_iter):
            auth = _step(hub, "src", "dst")   # authorities collect hub mass
            hub = _step(auth, "dst", "src")   # hubs collect authority mass
    else:
        hub = zeros

    out = gather_by_key(
        nodes_urls, "node", auth, "node", "s", "auth_e12",
        node_url_schema, pa.int64(),
    )
    out = gather_by_key(
        out, "node", hub, "node", "s", "hub_e12",
        pa.schema(list(node_url_schema) + [pa.field("auth_e12", pa.int64())]),
        pa.int64(),
    )
    return out.map_batches(
        lambda t: t.select(["url", "auth_e12", "hub_e12"]),
        batch_format="pyarrow",
    )


_SECTION_PROFILE_SCHEMA = pa.schema(
    [
        ("section", pa.string()),
        ("n_pages", pa.int64()),
        ("out_links", pa.int64()),
        ("in_degree", pa.int64()),
        ("text_bytes", pa.int64()),
        ("mean_text_bytes", pa.int64()),
        ("mean_out_links_e3", pa.int64()),
    ]
)


def section_profile(pages_path: str) -> ray.data.Dataset:
    """Host/section-level curation stats — the node-side companion to
    ``section_graph``'s edge rollup, and the per-host statistic table
    crawl curation filters urls BY (C4/FineWeb-style: hosts with
    tiny mean document length or link-farm-grade outlink density get
    blocked wholesale before any per-document scoring runs).

    Per url section (``scheme://host/<first path segment>``), over the
    corpus's html pages:

        (section, n_pages, out_links, in_degree, text_bytes,
         mean_text_bytes, mean_out_links_e3)

    — anchor/in-degree sums from the ``link_graph`` degree rollup
    (existing-target edge rule), reference-text byte totals, and the
    two floor-division means (mean_out_links on the e3 grid).

    Scale shape: the shared corpus parse via ``link_graph``; ONE extra
    column-pruned read of (url, text) whose strings die at a
    byte-length map; one url-keyed ``gather_by_key`` sort attaches the
    bytes to the degree rows; the final rollup is one
    ``map_key_groups`` sort on the section key with vectorized
    in-group sums — output is O(sections).
    """
    from .grouped import map_key_groups

    per_page = link_graph(pages_path).materialize()
    if per_page.count() == 0:  # all-binary corpus
        return ray.data.from_arrow(_SECTION_PROFILE_SCHEMA.empty_table())

    bytes_schema = pa.schema([("url", pa.string()), ("tb", pa.int64())])

    def _bytes(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        if batch.num_rows == 0 or "url" not in batch.column_names:
            return bytes_schema.empty_table()
        # Vectorized UTF-8 byte length: binary_length on the string
        # column counts bytes (not codepoints); nulls count as 0 to
        # match the frozen `len((t or "").encode())` semantics.
        tb = pc.fill_null(
            pc.binary_length(batch.column("text").cast(pa.string())).cast(
                pa.int64()
            ),
            0,
        )
        return pa.Table.from_pydict(
            {"url": batch.column("url").cast(pa.string()), "tb": tb},
            schema=bytes_schema,
        )

    tb = ray.data.read_parquet(pages_path, columns=["url", "text"]).map_batches(
        _bytes, batch_format="pyarrow"
    )
    # gather_by_key, not a hash join: the url-string Acero join
    # measured 5x the whole-op budget here (the same pathology the
    # pair-attachment ops hit; see BASELINE.md "sort-gather").
    from .grouped import gather_by_key

    joined = gather_by_key(
        per_page, "url", tb, "url", "tb", "tb", _PAGE_DEG_SCHEMA, pa.int64()
    )

    sec_schema = pa.schema(
        [
            ("section", pa.string()),
            ("out_links", pa.int64()),
            ("in_degree", pa.int64()),
            ("tb", pa.int64()),
        ]
    )

    def _sec(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        if batch.num_rows == 0 or "url" not in batch.column_names:
            return sec_schema.empty_table()
        m = pc.extract_regex(batch.column("url").cast(pa.string()), _SECTION_RE)
        return pa.Table.from_pydict(
            {
                "section": pc.struct_field(m, "sec"),
                "out_links": batch.column("out_links").cast(pa.int64()),
                "in_degree": batch.column("in_degree").cast(pa.int64()),
                "tb": batch.column("tb").cast(pa.int64()),
            },
            schema=sec_schema,
        )

    def _rollup(group: pa.Table) -> pa.Table:
        if group.num_rows == 0:
            return _SECTION_PROFILE_SCHEMA.empty_table()
        n = group.num_rows
        ol = int(group.column("out_links").to_numpy(zero_copy_only=False).sum())
        ind = int(group.column("in_degree").to_numpy(zero_copy_only=False).sum())
        tbs = int(group.column("tb").to_numpy(zero_copy_only=False).sum())
        return pa.Table.from_pydict(
            {
                "section": group.column("section").slice(0, 1),
                "n_pages": pa.array([n], pa.int64()),
                "out_links": pa.array([ol], pa.int64()),
                "in_degree": pa.array([ind], pa.int64()),
                "text_bytes": pa.array([tbs], pa.int64()),
                "mean_text_bytes": pa.array([tbs // n], pa.int64()),
                "mean_out_links_e3": pa.array([(1000 * ol) // n], pa.int64()),
            },
            schema=_SECTION_PROFILE_SCHEMA,
        )

    return map_key_groups(
        joined.map_batches(_sec, batch_format="pyarrow"), ["section"], _rollup
    )


_FRONTIER_SCHEMA = pa.schema([("url", pa.string()), ("dist", pa.int64())])


def link_frontier(
    pages_path: str, n_rounds: int = 3, seed_mod: int = 8
) -> ray.data.Dataset:
    """Crawl-frontier BFS over the page link graph: the minimum link
    distance from a seed set within ``n_rounds`` hops — the
    crawl-scheduling / seed-expansion-depth product (a targeted crawl
    fetches frontier depth 1, then 2, ...; distance from the trusted
    seed list is also a curation trust signal, cf. the random-walk
    variant ``link_ppr``). The min-plus iteration completes the
    distributed graph-recurrence family: sum (`link_pagerank`,
    `link_hits`), max (`link_harmonic`), min (here).

    Frozen semantics (mirrored by the SQL oracle): seeds = pages with
    ``_hash64(url) % 2^63 % seed_mod == 0`` (the `link_ppr` allowlist
    stand-in), dist 0; round r relaxes every edge (w, v):
    dist(v) <- min(dist(v), dist_{r-1}(w) + 1); pages unreached after
    ``n_rounds`` report dist = -1 (dense output, one row per html
    page).

    Scale shape: the distance table is one int64 pair per REACHED
    node; each round is one `gather_by_key` sort (frontier distances
    onto edges) + one `reduce_by_keys` min — no hash joins, blocks
    repartition-bounded per round; the final dense fill is one
    left-outer join of the V-row url table.
    """
    from ..functions.hashing import _hash64
    from ..tuning import join_partitions as _jp
    from .grouped import gather_by_key, reduce_by_keys

    jp = _jp()
    M = 2**63

    parsed = _parsed_pages(pages_path)
    if parsed.count() == 0:  # all-binary corpus
        return ray.data.from_arrow(_FRONTIER_SCHEMA.empty_table())

    node_url_schema = pa.schema([("node", pa.int64()), ("url", pa.string())])

    def _ids(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0 or "url" not in batch.column_names:
            return node_url_schema.empty_table()
        urls = batch.column("url").to_pylist()
        return pa.Table.from_pydict(
            {
                "node": pa.array([int(_hash64(u)) % M for u in urls], pa.int64()),
                "url": pa.array(urls, pa.string()),
            },
            schema=node_url_schema,
        )

    nodes_urls = (
        parsed.map_batches(lambda b: b.select(["url"]), batch_format="pyarrow")
        .map_batches(_ids, batch_format="pyarrow")
        .repartition(jp)
        .materialize()
    )
    nds = reduce_by_keys(
        nodes_urls.map_batches(
            lambda t: t.select(["node"]), batch_format="pyarrow"
        ),
        ["node"], None, how="count", out="_n",
    ).map_batches(
        lambda t: t.select(["node"]), batch_format="pyarrow"
    ).repartition(jp).materialize()  # repartition launders Ray 2.49's
    # schema-less empty sort blocks (they break the Acero edge join)

    dist_schema = pa.schema([("node", pa.int64()), ("d", pa.int64())])

    def _seed(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0 or "node" not in batch.column_names:
            return dist_schema.empty_table()
        nodes = batch.column("node").to_numpy(zero_copy_only=False)
        keep = nodes % seed_mod == 0
        return pa.Table.from_pydict(
            {
                "node": pa.array(nodes[keep], pa.int64()),
                "d": pa.array(np.zeros(int(keep.sum()), np.int64), pa.int64()),
            },
            schema=dist_schema,
        )

    dist = nds.map_batches(_seed, batch_format="pyarrow").materialize()
    have_seeds = dist.count() > 0

    pair_schema = pa.schema([("src", pa.int64()), ("dst", pa.int64())])

    def _pair_ids(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0 or "src" not in batch.column_names:
            return pair_schema.empty_table()
        s = [int(_hash64(u)) % M for u in batch.column("src").to_pylist()]
        d = [int(_hash64(u)) % M for u in batch.column("dst").to_pylist()]
        keep = [i for i in range(len(s)) if s[i] != d[i]]
        return pa.Table.from_pydict(
            {
                "src": pa.array([s[i] for i in keep], pa.int64()),
                "dst": pa.array([d[i] for i in keep], pa.int64()),
            },
            schema=pair_schema,
        )

    have_edges = False
    if have_seeds:
        node_ids = nds.map_batches(
            lambda t: t.rename_columns(["dst"]), batch_format="pyarrow"
        )
        raw_pairs = (
            _parsed_edges(parsed)
            .map_batches(_pair_ids, batch_format="pyarrow")
            .repartition(jp)
            .materialize()
        )
        have_edges = raw_pairs.count() > 0
        if have_edges:
            edges = (
                reduce_by_keys(
                    raw_pairs.join(node_ids, "inner", jp, on=("dst",)),
                    ["src", "dst"], None, how="count", out="_n",
                )
                .map_batches(
                    lambda t: t.select(["src", "dst"]), batch_format="pyarrow"
                )
                .repartition(jp)
                .materialize()
            )
            have_edges = edges.count() > 0

    if have_seeds and have_edges:
        for _ in range(n_rounds):
            relaxed = gather_by_key(
                edges, "src", dist, "node", "d", "dsrc", pair_schema, pa.int64()
            ).map_batches(
                lambda t: pa.Table.from_pydict(
                    {
                        "node": t.column("dst").cast(pa.int64()),
                        "d": pa.array(
                            t.column("dsrc").to_numpy(zero_copy_only=False) + 1,
                            pa.int64(),
                        ),
                    },
                    schema=dist_schema,
                )
                if t.num_rows
                else dist_schema.empty_table(),
                batch_format="pyarrow",
            )
            dist = (
                reduce_by_keys(
                    dist.union(relaxed).repartition(jp), ["node"], "d", how="min"
                )
                .repartition(jp)
                .materialize()
            )

    out = nodes_urls
    if dist.count() > 0:
        out = nodes_urls.join(dist, "left_outer", jp, on=("node",)).repartition(jp)

    def _fill(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        if batch.num_rows == 0 or "url" not in batch.column_names:
            return _FRONTIER_SCHEMA.empty_table()
        d = (
            pc.fill_null(batch.column("d"), -1).cast(pa.int64())
            if "d" in batch.column_names
            else pa.array(np.full(batch.num_rows, -1, np.int64), pa.int64())
        )
        return pa.Table.from_pydict(
            {"url": batch.column("url").cast(pa.string()), "dist": d},
            schema=_FRONTIER_SCHEMA,
        )

    return out.map_batches(_fill, batch_format="pyarrow")


_KCORE_SCHEMA = pa.schema([("url", pa.string()), ("core", pa.int64())])


def link_kcore(pages_path: str, n_rounds: int = 4) -> ray.data.Dataset:
    """k-core decomposition (coreness) over the UNDIRECTED page link
    graph — the classic density measure crawl curation ranks against
    (the dense "core" of a site survives aggressive filtering; low-core
    pages are the fringe), completing the distributed graph family
    (pagerank/HITS = sum, harmonic = max, frontier = min, here = order
    statistic).

    Frozen semantics (mirrored by the SQL oracle): the h-index
    iteration of Lü et al. — init c(v) = degree, then ``n_rounds``
    synchronous rounds of c(v) <- H({c(u) : u ~ v}) where H is the
    h-index (the largest h with >= h neighbors of value >= h). The
    sequence decreases monotonically to the exact coreness; rounds are
    PINNED (like ``link_harmonic``/``link_hits``) so both engines
    compute the identical intermediate. Edgeless pages report core 0
    (dense output, one row per html page).

    Scale shape: one corpus parse; the edge table is distinct
    undirected id pairs built once (the ``link_frontier`` shape); each
    round is one ``gather_by_key`` sort (values onto edges) + one
    (node, value)-sorted block pass computing per-group h-indexes with
    ``group_bounds`` + reduceat — no per-group UDF, no hash joins in
    the loop; only fixed-width id rows shuffle.
    """
    from ..functions.hashing import _hash64
    from ..tuning import join_partitions as _jp
    from .grouped import gather_by_key, group_bounds, reduce_by_keys

    jp = _jp()
    M = 2**63

    parsed = _parsed_pages(pages_path)
    if parsed.count() == 0:  # all-binary corpus
        return ray.data.from_arrow(_KCORE_SCHEMA.empty_table())

    node_url_schema = pa.schema([("node", pa.int64()), ("url", pa.string())])

    def _ids(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0 or "url" not in batch.column_names:
            return node_url_schema.empty_table()
        urls = batch.column("url").to_pylist()
        return pa.Table.from_pydict(
            {
                "node": pa.array([int(_hash64(u)) % M for u in urls], pa.int64()),
                "url": pa.array(urls, pa.string()),
            },
            schema=node_url_schema,
        )

    nodes_urls = (
        parsed.map_batches(lambda b: b.select(["url"]), batch_format="pyarrow")
        .map_batches(_ids, batch_format="pyarrow")
        .repartition(jp)
        .materialize()
    )

    raw_schema = pa.schema([("srcid", pa.int64()), ("dstid", pa.int64())])
    pair_schema = pa.schema([("a", pa.int64()), ("b", pa.int64())])

    def _pair_ids(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0 or "src" not in batch.column_names:
            return raw_schema.empty_table()
        s = np.array(
            [int(_hash64(u)) % M for u in batch.column("src").to_pylist()],
            np.int64,
        )
        d = np.array(
            [int(_hash64(u)) % M for u in batch.column("dst").to_pylist()],
            np.int64,
        )
        keep = s != d  # self-loops drop
        return pa.Table.from_pydict(
            {
                "srcid": pa.array(s[keep], pa.int64()),
                "dstid": pa.array(d[keep], pa.int64()),
            },
            schema=raw_schema,
        )

    def _canon(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0 or "srcid" not in batch.column_names:
            return pair_schema.empty_table()
        s = batch.column("srcid").to_numpy(zero_copy_only=False)
        d = batch.column("dstid").to_numpy(zero_copy_only=False)
        return pa.Table.from_pydict(
            {
                "a": pa.array(np.minimum(s, d), pa.int64()),
                "b": pa.array(np.maximum(s, d), pa.int64()),
            },
            schema=pair_schema,
        )

    node_ids = nodes_urls.map_batches(
        lambda t: t.select(["node"]).rename_columns(["dstid"]),
        batch_format="pyarrow",
    )
    und = (
        reduce_by_keys(
            _parsed_edges(parsed)
            .map_batches(_pair_ids, batch_format="pyarrow")
            .repartition(jp)
            .join(node_ids, "inner", jp, on=("dstid",))  # existing targets only
            .repartition(jp)
            .map_batches(_canon, batch_format="pyarrow"),
            ["a", "b"], None, how="count", out="_n",
        )
        .map_batches(lambda t: t.select(["a", "b"]), batch_format="pyarrow")
        .repartition(jp)
        .materialize()
    )

    c_schema = pa.schema([("node", pa.int64()), ("c", pa.int64())])
    e2_schema = pa.schema([("src", pa.int64()), ("dst", pa.int64())])

    c = None
    if und.count() > 0:

        def _bidir(batch: pa.Table) -> pa.Table:
            if batch.num_rows == 0 or "a" not in batch.column_names:
                return e2_schema.empty_table()
            a = batch.column("a").cast(pa.int64())
            b = batch.column("b").cast(pa.int64())
            return pa.concat_tables(
                [
                    pa.Table.from_pydict({"src": a, "dst": b}, schema=e2_schema),
                    pa.Table.from_pydict({"src": b, "dst": a}, schema=e2_schema),
                ]
            ).combine_chunks()

        e2 = und.map_batches(_bidir, batch_format="pyarrow").repartition(jp).materialize()

        # init: c(v) = degree (each e2 row contributes 1 to its src)
        c = (
            reduce_by_keys(
                e2.map_batches(
                    lambda t: t.select(["src"]).rename_columns(["node"]),
                    batch_format="pyarrow",
                ),
                ["node"], None, how="count", out="c",
            )
            .repartition(jp)
            .materialize()
        )

        def _hindex(block: pa.Table) -> pa.Table:
            if block.num_rows == 0 or "dst" not in block.column_names:
                return c_schema.empty_table()
            # The global sort co-locates each dst (keys-only sort, the
            # map_key_groups contract); the value ordering the h-index
            # scan needs is a local vectorized sort.
            block = block.sort_by(
                [("dst", "ascending"), ("v", "ascending")]
            ).combine_chunks()
            bounds = group_bounds(block, ["dst"])
            starts = bounds[:-1]
            v = block.column("v").to_numpy(zero_copy_only=False)
            # ascending within group: element j of an m-group scores
            # min(v_j, m - j); the group max is the h-index.
            rank_from_end = np.repeat(bounds[1:], np.diff(bounds)) - np.arange(
                len(v)
            )
            h_elem = np.minimum(v, rank_from_end)
            return pa.Table.from_pydict(
                {
                    "node": block.column("dst").take(pa.array(starts)).cast(
                        pa.int64()
                    ),
                    "c": pa.array(np.maximum.reduceat(h_elem, starts), pa.int64()),
                },
                schema=c_schema,
            )

        for _ in range(n_rounds):
            vals = gather_by_key(
                e2, "src", c, "node", "c", "v", e2_schema, pa.int64()
            )
            c = (
                vals.sort(["dst"])
                .map_batches(_hindex, batch_format="pyarrow", batch_size=None)
                .repartition(jp)
                .materialize()
            )

    out = nodes_urls
    if c is not None and c.count() > 0:
        out = nodes_urls.join(c, "left_outer", jp, on=("node",)).repartition(jp)

    def _fill(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        if batch.num_rows == 0 or "url" not in batch.column_names:
            return _KCORE_SCHEMA.empty_table()
        core = (
            pc.fill_null(batch.column("c"), 0).cast(pa.int64())
            if "c" in batch.column_names
            else pa.array(np.zeros(batch.num_rows, np.int64), pa.int64())
        )
        return pa.Table.from_pydict(
            {"url": batch.column("url").cast(pa.string()), "core": core},
            schema=_KCORE_SCHEMA,
        )

    return out.map_batches(_fill, batch_format="pyarrow")


_SCHEDULE_SCHEMA = pa.schema(
    [
        ("url", pa.string()),
        ("section", pa.string()),
        ("wave", pa.int64()),
        ("slot", pa.int64()),
    ]
)


def crawl_schedule(pages_path: str, per_host: int = 4) -> ray.data.Dataset:
    """Politeness-bounded crawl scheduling: assign every url a fetch
    WAVE and connection SLOT such that no host-section ever sees more
    than ``per_host`` concurrent fetches — the frontier-to-fetch-plan
    step every polite crawler runs (robots.txt concurrency budgets /
    crawl-delay honoring), and the planning counterpart to
    ``link_frontier``'s discovery BFS.

    Frozen semantics (mirrored by the SQL oracle): the politeness key
    is the url's SECTION (the ``section_graph`` rule —
    ``scheme://host/<first path segment>``, '' for non-matching urls);
    within a section urls rank 0-based by (warc_ts asc, url asc) —
    recrawl freshness order with a deterministic tie-break; then
    ``wave = rank // per_host`` (the round in which the url is
    fetched) and ``slot = rank % per_host`` (which of the host's
    connections fetches it). Dense output: one row per page, ALL
    pages (binary payloads get fetched too — no html parse in this op
    at all).

    Scale shape: a column-pruned (url, warc_ts) read — payload bytes
    never load; ONE groupby-shaped sort on the section key with a
    per-group vectorized local sort + arange (``map_key_groups``).
    A single section's rows must fit one worker heap (the
    ``events_running_total`` contract); if one host ever outgrows
    that, the two-level prefix-sum pattern (`token_packing`) applies
    per section.
    """
    from .grouped import map_key_groups

    pages = ray.data.read_parquet(pages_path, columns=["url", "warc_ts"])

    key_schema = pa.schema(
        [
            ("section", pa.string()),
            ("url", pa.string()),
            ("warc_ts", pa.timestamp("us")),
        ]
    )

    def _key(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        if batch.num_rows == 0 or "url" not in batch.column_names:
            return key_schema.empty_table()
        m = pc.extract_regex(batch.column("url").cast(pa.string()), _SECTION_RE)
        return pa.Table.from_pydict(
            {
                "section": pc.fill_null(pc.struct_field(m, "sec"), ""),
                "url": batch.column("url").cast(pa.string()),
                "warc_ts": batch.column("warc_ts").cast(pa.timestamp("us")),
            },
            schema=key_schema,
        )

    def _rank(group: pa.Table) -> pa.Table:
        if group.num_rows == 0:
            return _SCHEDULE_SCHEMA.empty_table()
        g = group.sort_by(
            [("warc_ts", "ascending"), ("url", "ascending")]
        ).combine_chunks()
        rank = np.arange(g.num_rows, dtype=np.int64)
        return pa.Table.from_pydict(
            {
                "url": g.column("url"),
                "section": g.column("section"),
                "wave": pa.array(rank // per_host, pa.int64()),
                "slot": pa.array(rank % per_host, pa.int64()),
            },
            schema=_SCHEDULE_SCHEMA,
        )

    return map_key_groups(
        pages.map_batches(_key, batch_format="pyarrow"), "section", _rank
    )


_WALKS_SCHEMA = pa.schema(
    [
        ("start_url", pa.string()),
        ("step", pa.int64()),
        ("url", pa.string()),
    ]
)


def link_walks(
    pages_path: str, n_steps: int = 3, seed_mod: int = 4
) -> ray.data.Dataset:
    """Deterministic graph random walks over the directed page link
    graph — the walk-corpus primitive graph-embedding training
    (DeepWalk / node2vec) and random-walk-based sampling consume: one
    bounded-length walk per seed page, materialized as (start_url,
    step, url) rows. Completes the graph family with the
    iterated-frontier-of-ONE shape (PPR walks in expectation; this op
    walks literally).

    Frozen semantics (mirrored by the SQL oracle): seeds are pages
    with ``node % seed_mod == 0`` (the ``link_frontier`` allowlist
    rule), emitted as step 0; at step t (1-based) a walker at v moves
    to the out-neighbor u minimizing
    ``md5_number_lower(f"{v}:{t}:{u}")`` (ties by u) over the DISTINCT
    resolved-target edge set — a pseudo-random but engine-independent
    choice, exactly reproducible in SQL; a walker at a node with no
    out-edges stops (no further rows).

    Scale shape: one corpus parse; per step ONE hash join of the
    walker table (≤ seeds rows, two int64s each) against the edge
    table plus one ``map_key_groups`` argmin — candidate fan-out is
    bounded by the walkers' out-degrees; urls attach once at the end
    via two ``gather_by_key`` sorts. Payload bytes die at the parse;
    nothing corpus-sized touches the driver.
    """
    from ..functions.hashing import _hash64
    from ..tuning import join_partitions as _jp
    from .grouped import gather_by_key, map_key_groups, reduce_by_keys

    jp = _jp()
    M = 2**63

    parsed = _parsed_pages(pages_path)
    if parsed.count() == 0:  # all-binary corpus
        return ray.data.from_arrow(_WALKS_SCHEMA.empty_table())

    node_url_schema = pa.schema([("node", pa.int64()), ("url", pa.string())])

    def _ids(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0 or "url" not in batch.column_names:
            return node_url_schema.empty_table()
        urls = batch.column("url").to_pylist()
        return pa.Table.from_pydict(
            {
                "node": pa.array([int(_hash64(u)) % M for u in urls], pa.int64()),
                "url": pa.array(urls, pa.string()),
            },
            schema=node_url_schema,
        )

    nodes_urls = (
        parsed.map_batches(lambda b: b.select(["url"]), batch_format="pyarrow")
        .map_batches(_ids, batch_format="pyarrow")
        .repartition(jp)
        .materialize()
    )

    edge_schema = pa.schema([("src", pa.int64()), ("dst", pa.int64())])

    def _pair_ids(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0 or "src" not in batch.column_names:
            return edge_schema.empty_table()
        s = np.array(
            [int(_hash64(u)) % M for u in batch.column("src").to_pylist()],
            np.int64,
        )
        d = np.array(
            [int(_hash64(u)) % M for u in batch.column("dst").to_pylist()],
            np.int64,
        )
        keep = s != d
        return pa.Table.from_pydict(
            {
                "src": pa.array(s[keep], pa.int64()),
                "dst": pa.array(d[keep], pa.int64()),
            },
            schema=edge_schema,
        )

    node_ids = nodes_urls.map_batches(
        lambda t: t.select(["node"]).rename_columns(["dst"]),
        batch_format="pyarrow",
    )
    edges = (
        reduce_by_keys(
            _parsed_edges(parsed)
            .map_batches(_pair_ids, batch_format="pyarrow")
            .repartition(jp)
            .join(node_ids, "inner", jp, on=("dst",))  # existing targets only
            .repartition(jp),
            ["src", "dst"], None, how="count", out="_n",
        )
        .map_batches(lambda t: t.select(["src", "dst"]), batch_format="pyarrow")
        .repartition(jp)
        .materialize()
    )

    state_schema = pa.schema([("walk", pa.int64()), ("src", pa.int64())])
    trace_schema = pa.schema(
        [("walk", pa.int64()), ("step", pa.int64()), ("cur", pa.int64())]
    )

    def _seed(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0 or "node" not in batch.column_names:
            return state_schema.empty_table()
        nodes = batch.column("node").to_numpy(zero_copy_only=False)
        keep = nodes % seed_mod == 0
        return pa.Table.from_pydict(
            {
                "walk": pa.array(nodes[keep], pa.int64()),
                "src": pa.array(nodes[keep], pa.int64()),
            },
            schema=state_schema,
        )

    state = (
        nodes_urls.map_batches(_seed, batch_format="pyarrow")
        .repartition(jp)
        .materialize()
    )

    def _trace_of(st: ray.data.Dataset, step: int) -> ray.data.Dataset:
        def _t(batch: pa.Table) -> pa.Table:
            if batch.num_rows == 0 or "walk" not in batch.column_names:
                return trace_schema.empty_table()
            return pa.Table.from_pydict(
                {
                    "walk": batch.column("walk").cast(pa.int64()),
                    "step": pa.array(
                        np.full(batch.num_rows, step, np.int64), pa.int64()
                    ),
                    "cur": batch.column("src").cast(pa.int64()),
                },
                schema=trace_schema,
            )

        return st.map_batches(_t, batch_format="pyarrow")

    traces = [_trace_of(state, 0)]
    have_edges = edges.count() > 0

    cand_schema = pa.schema(
        [("walk", pa.int64()), ("dst", pa.int64()), ("h", pa.uint64())]
    )

    for t in range(1, n_steps + 1):
        if not have_edges or state.count() == 0:
            break

        def _score(batch: pa.Table, _t=t) -> pa.Table:
            if batch.num_rows == 0 or "walk" not in batch.column_names:
                return cand_schema.empty_table()
            srcs = batch.column("src").to_pylist()
            dsts = batch.column("dst").to_pylist()
            return pa.Table.from_pydict(
                {
                    "walk": batch.column("walk").cast(pa.int64()),
                    "dst": pa.array(dsts, pa.int64()),
                    "h": pa.array(
                        [int(_hash64(f"{s}:{_t}:{d}")) for s, d in zip(srcs, dsts)],
                        pa.uint64(),
                    ),
                },
                schema=cand_schema,
            )

        cands = (
            edges.join(state, "inner", jp, on=("src",))
            .map_batches(_score, batch_format="pyarrow")
        )

        def _pick(group: pa.Table) -> pa.Table:
            if group.num_rows == 0:
                return state_schema.empty_table()
            g = group.sort_by([("h", "ascending"), ("dst", "ascending")])
            return pa.Table.from_pydict(
                {
                    "walk": g.column("walk").slice(0, 1).cast(pa.int64()),
                    "src": g.column("dst").slice(0, 1).cast(pa.int64()),
                },
                schema=state_schema,
            )

        state = (
            map_key_groups(cands, "walk", _pick)
            .repartition(jp)
            .materialize()
        )
        traces.append(_trace_of(state, t))

    trace = traces[0]
    for extra in traces[1:]:
        trace = trace.union(extra)
    trace = trace.repartition(jp)

    with_start = gather_by_key(
        trace, "walk", nodes_urls, "node", "url", "start_url",
        trace_schema, pa.string(),
    )
    ws_schema = pa.schema(list(trace_schema) + [pa.field("start_url", pa.string())])
    with_url = gather_by_key(
        with_start, "cur", nodes_urls, "node", "url", "url",
        ws_schema, pa.string(),
    )

    def _out(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0 or "start_url" not in batch.column_names:
            return _WALKS_SCHEMA.empty_table()
        return pa.Table.from_pydict(
            {
                "start_url": batch.column("start_url").cast(pa.string()),
                "step": batch.column("step").cast(pa.int64()),
                "url": batch.column("url").cast(pa.string()),
            },
            schema=_WALKS_SCHEMA,
        )

    return with_url.map_batches(_out, batch_format="pyarrow")
