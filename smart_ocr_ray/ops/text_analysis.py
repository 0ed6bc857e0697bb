"""Per-document text analysis over the ``documents`` table.

Stateless vectorized ``map_batches`` stages: token counting, quality
signals, language-ID, fingerprinting. Column semantics are frozen to
stay exactly DuckDB-expressible so the driver's oracle comparison
verifies them value-for-value (see ``__ray_entry__.oracle_sql``).
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc
import ray.data

from ..functions.textstats import (
    STOPWORDS,
    bpeish_token_count,
    content_md5,
    predict_lang,
    quality_score,
    stopword_hits,
    token_count,
    winnow_fingerprint,
    word_lengths_total,
)


def read_documents(sf_dir: str) -> ray.data.Dataset:
    return ray.data.read_parquet(f"{sf_dir}/documents.parquet")


def _flat(arr) -> pa.Array:
    """ChunkedArray → single Array (empty-safe)."""
    if isinstance(arr, pa.ChunkedArray):
        return (
            arr.combine_chunks()
            if arr.num_chunks
            else pa.array([], type=arr.type)
        )
    return arr


def _arrow_token_stream(
    batch: pa.Table, col: str = "text", lower: bool = True
) -> tuple[pa.Array, pa.Array]:
    """Vectorized ``(t or "").lower().split()`` over a whole batch:
    returns ``(tokens, parents)`` — the flattened token stream and each
    token's row index within the batch. One RE2 ``\\s+`` split +
    list-flatten + empty-filter, all pyarrow kernels; equals Python
    ``str.split()`` on ASCII whitespace, which is also exactly the
    ``regexp_split_to_array(..., '\\s+')`` class every token-grid SQL
    oracle uses — so vectorizing ALIGNS the engine with the oracle
    rather than drifting from it (r3 advice: vectorize the per-row
    token loops where the oracle grid survives)."""
    src = pc.fill_null(batch.column(col).cast(pa.string()), "")
    if lower:
        src = pc.utf8_lower(src)
    lists = pc.split_pattern_regex(src, r"\s+")
    flat = pc.list_flatten(lists)
    parents = pc.list_parent_indices(lists)
    mask = pc.not_equal(flat, "")
    return _flat(flat.filter(mask)), _flat(parents.filter(mask))


def _arrow_ngrams(
    tokens: pa.Array, parents: pa.Array, n: int
) -> tuple[pa.Array, pa.Array]:
    """Space-joined word ``n``-grams over a (tokens, parents) stream:
    returns (grams, parent-row-of-gram). A window is a gram iff its
    first and last token share a parent (parents are nondecreasing, so
    the endpoints pin the whole window). Vectorized: ``n`` array
    slices + one ``binary_join_element_wise``."""
    m = len(tokens)
    if m < n:
        return pa.array([], pa.string()), pa.array([], pa.int64())
    width = m - n + 1
    cols = [tokens.slice(i, width) for i in range(n)]
    par0 = parents.slice(0, width)
    same = pc.equal(par0, parents.slice(n - 1, width))
    grams = pc.binary_join_element_wise(*cols, " ")
    return _flat(grams.filter(same)), _flat(par0.filter(same))


_LANG_CODES = sorted(STOPWORDS)
# value_set arrays built once at import, not per batch per bank on the
# corpus-wide scan hot path
_LANG_SETS = {lang: pa.array(STOPWORDS[lang]) for lang in _LANG_CODES}


def _lang_hit_matrix(tokens: pa.Array, unit_ids, n_units: int):
    """(len(_LANG_CODES), n_units) int64 stopword-hit counts over a
    token stream: one ``pc.is_in`` + one ``np.bincount`` per bank —
    the vectorized core of the language-ID family (r4 task #7: the
    last per-row Python loop on a corpus-wide scan). ``unit_ids`` maps
    each token to its scoring unit (document row or window)."""
    import numpy as np

    counts = np.zeros((len(_LANG_CODES), n_units), np.int64)
    if len(tokens):
        for li, lang in enumerate(_LANG_CODES):
            mask = pc.is_in(
                tokens, value_set=_LANG_SETS[lang]
            ).to_numpy(zero_copy_only=False)
            if mask.any():
                counts[li] = np.bincount(unit_ids[mask], minlength=n_units)
    return counts


def _lang_argmax(counts, has_tokens):
    """(pred, best, second) per unit under ``predict_lang``'s frozen
    tie-break — hits desc, code asc ('und' when the unit is empty or
    best < 2). ``_LANG_CODES`` is sorted, so np.argmax's first-max
    rule IS the asc-code tie-break."""
    import numpy as np

    n = counts.shape[1]
    best_idx = counts.argmax(axis=0)
    best = counts.max(axis=0)
    tmp = counts.copy()
    tmp[best_idx, np.arange(n)] = -1
    second = tmp.max(axis=0)
    pred = np.where(
        has_tokens & (best >= 2),
        np.array(_LANG_CODES, dtype=object)[best_idx],
        "und",
    )
    return pred, best, second


def token_counts(sf_dir: str) -> ray.data.Dataset:
    """doc_id, n_tokens (whitespace), n_bpeish (sub-word-ish)."""

    def _batch(batch: pa.Table) -> pa.Table:
        # Vectorized token_count / bpeish_token_count: one RE2
        # count_substring_regex per column (same \S+ / BPE-ish classes
        # as the frozen scalar functions and their SQL oracles).
        text = pc.fill_null(batch.column("text").cast(pa.string()), "")
        return pa.Table.from_pydict(
            {
                "doc_id": batch.column("doc_id"),
                "n_tokens": pc.count_substring_regex(text, r"\S+").cast(
                    pa.int64()
                ),
                "n_bpeish": pc.count_substring_regex(
                    text, r"[A-Za-z]+|\d+|[^\sA-Za-z\d]"
                ).cast(pa.int64()),
            }
        )

    return read_documents(sf_dir).map_batches(_batch, batch_format="pyarrow")


def quality(sf_dir: str) -> ray.data.Dataset:
    """doc_id, n_tokens, token_chars, stop_hits_en — exact-integer quality
    signals (SQL-checkable); plus the float composite quality_score."""

    def _batch(batch: pa.Table) -> pa.Table:
        texts = [t or "" for t in batch.column("text").to_pylist()]
        return pa.Table.from_pydict(
            {
                "doc_id": batch.column("doc_id"),
                "n_tokens": pa.array([token_count(t) for t in texts], pa.int64()),
                "token_chars": pa.array([word_lengths_total(t) for t in texts], pa.int64()),
                "stop_hits_en": pa.array([stopword_hits(t, "en") for t in texts], pa.int64()),
                "quality_score": pa.array(
                    [round(quality_score(t), 6) for t in texts], pa.float64()
                ),
            }
        )

    return read_documents(sf_dir).map_batches(_batch, batch_format="pyarrow")


def lang_id(sf_dir: str) -> ray.data.Dataset:
    """doc_id, pred_lang — stopword-bank language-ID (SQL-mirrored),
    fully vectorized (``_lang_hit_matrix``: one is_in + bincount per
    bank, no per-row ``predict_lang`` calls)."""

    def _batch(batch: pa.Table) -> pa.Table:
        import numpy as np

        n = batch.num_rows
        tokens, parents = _arrow_token_stream(batch)
        par = parents.to_numpy(zero_copy_only=False)
        counts = _lang_hit_matrix(tokens, par, n)
        has = np.bincount(par, minlength=n) > 0
        pred, _, _ = _lang_argmax(counts, has)
        return pa.Table.from_pydict(
            {
                "doc_id": batch.column("doc_id"),
                "pred_lang": pa.array(list(pred), pa.string()),
            }
        )

    return read_documents(sf_dir).map_batches(_batch, batch_format="pyarrow")


def lang_margin(sf_dir: str) -> ray.data.Dataset:
    """Language-ID with a CONFIDENCE MARGIN — the CCNet move of keeping
    only documents whose language call is unambiguous (a page scoring
    en 9 / fr 8 is code-switched or template noise; a downstream
    monolingual corpus wants margin, not just argmax).

    Frozen semantics (mirrored by the SQL oracle): per doc, stopword
    hits per bank (the ``predict_lang`` rule); ``pred_lang`` = the
    argmax with its tie-break (hits desc, code asc; 'und' below 2
    hits); ``margin`` = best hits − second-best hits (0 for empty
    docs); ``confident`` = pred_lang ≠ 'und' AND margin ≥ 2. Dense
    output, one row per doc.

    Scale shape: stateless VECTORIZED map (``_lang_hit_matrix``: one
    is_in + bincount per bank), no shuffle at any corpus size.
    """
    out_schema = pa.schema(
        [
            ("doc_id", pa.int64()),
            ("pred_lang", pa.string()),
            ("best_hits", pa.int64()),
            ("margin", pa.int64()),
            ("confident", pa.bool_()),
        ]
    )

    def _batch(batch: pa.Table) -> pa.Table:
        import numpy as np

        n = batch.num_rows
        tokens, parents = _arrow_token_stream(batch)
        par = parents.to_numpy(zero_copy_only=False)
        counts = _lang_hit_matrix(tokens, par, n)
        has = np.bincount(par, minlength=n) > 0
        pred, best, second = _lang_argmax(counts, has)
        margin = best - second
        return pa.Table.from_pydict(
            {
                "doc_id": batch.column("doc_id").cast(pa.int64()),
                "pred_lang": pa.array(list(pred), pa.string()),
                "best_hits": pa.array(best, pa.int64()),
                "margin": pa.array(margin, pa.int64()),
                "confident": pa.array((pred != "und") & (margin >= 2)),
            },
            schema=out_schema,
        )

    return (
        ray.data.read_parquet(
            f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
        ).map_batches(_batch, batch_format="pyarrow")
    )


def domain_stats(sf_dir: str) -> ray.data.Dataset:
    """Per-(source, lang) corpus rollup — the per-domain quality view a
    crawl pipeline runs before sampling (``source`` is this corpus's
    domain analog): doc count, token sum, integer-grid mean tokens, and
    exact distinct-text count (content md5, so recrawled duplicates are
    visible per domain).

    Skew-bounded two-stage shape: stage 1 groups by the FINE key
    (source, lang, text_md5) — per-batch Arrow partials first, so the
    shuffle moves one row per distinct text per block and no reducer
    ever sees a whole hot domain; stage 2 aggregates the (already
    distinct-text-sized) table by (source, lang), where
    ``Count() == n_distinct_texts`` exactly because stage 1's key made
    rows distinct."""

    def _prep(batch: pa.Table) -> pa.Table:
        texts = [t or "" for t in batch.column("text").to_pylist()]
        prepped = pa.Table.from_pydict(
            {
                "source": batch.column("source"),
                "lang": batch.column("lang"),
                "text_md5": pa.array([content_md5(t) for t in texts], pa.string()),
                "n_tokens": pa.array([token_count(t) for t in texts], pa.int64()),
            }
        )
        out = pa.TableGroupBy(prepped, ["source", "lang", "text_md5"]).aggregate(
            [("n_tokens", "sum"), ([], "count_all")]
        )
        rename = {"n_tokens_sum": "tok_sum", "count_all": "cnt"}
        return out.rename_columns([rename.get(c, c) for c in out.column_names])

    from ray.data.aggregate import Count, Sum

    per_text = (
        read_documents(sf_dir)
        .map_batches(_prep, batch_format="pyarrow")
        .groupby(["source", "lang", "text_md5"])
        .aggregate(Sum("cnt", alias_name="cnt"), Sum("tok_sum", alias_name="tok_sum"))
    )

    final = per_text.groupby(["source", "lang"]).aggregate(
        Sum("cnt", alias_name="n_docs"),
        Sum("tok_sum", alias_name="total_tokens"),
        Count(alias_name="n_distinct_texts"),
    )

    def _finish(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        mean = pc.divide(
            pc.multiply(batch.column("total_tokens"), pa.scalar(100, pa.int64())),
            batch.column("n_docs"),
        )
        return pa.Table.from_pydict(
            {
                "source": batch.column("source"),
                "lang": batch.column("lang"),
                "n_docs": batch.column("n_docs"),
                "total_tokens": batch.column("total_tokens"),
                "mean_tokens_e2": pc.cast(mean, pa.int64()),
                "n_distinct_texts": pc.cast(batch.column("n_distinct_texts"), pa.int64()),
            }
        )

    return final.map_batches(_finish, batch_format="pyarrow")


def top_ngrams(sf_dir: str, n: int = 2, k: int = 20) -> ray.data.Dataset:
    """Corpus-wide top-k word n-grams by document-token count (the
    vocabulary/contamination sweep a training pipeline runs): per-batch
    Counter partials → one small groupby(ngram) sum → global top-k.

    The shuffle moves one row per distinct n-gram per block (the
    partial combine), never per occurrence; top-k is a sort over the
    aggregated (distinct-ngram-sized) table with a deterministic
    (count desc, ngram asc) tie order mirrored by the SQL oracle."""

    _schema = pa.schema([("ngram", pa.string()), ("cnt", pa.int64())])

    def _partial(batch: pa.Table) -> pa.Table:
        toks, par = _arrow_token_stream(batch)
        grams, _ = _arrow_ngrams(toks, par, n)
        if len(grams) == 0:
            return _schema.empty_table()
        vc = pc.value_counts(grams)
        return pa.Table.from_arrays(
            [vc.field("values"), vc.field("counts")], schema=_schema
        )

    from ray.data.aggregate import Sum

    return (
        read_documents(sf_dir)
        .map_batches(_partial, batch_format="pyarrow")
        .groupby("ngram")
        .aggregate(Sum("cnt", alias_name="cnt"))
        .sort(["cnt", "ngram"], descending=[True, False])
        .limit(k)
    )


_SYM_RE = None


def quality_reason(
    text: str, lang: str, min_tokens: int = 50, max_tokens: int = 100_000
) -> str:
    """First failing Gopher-style rule for one document ('' = keep).
    The single home of the rule chain — shared by ``quality_filter``
    and ``dsir_weights``'s target-set definition, and mirrored
    verbatim by both SQL oracles."""
    global _SYM_RE
    if _SYM_RE is None:
        import re

        _SYM_RE = re.compile(r"[^A-Za-z0-9 \t\n\r]")
    n_tok = token_count(text)
    if n_tok < min_tokens:
        return "too_short"
    if n_tok > max_tokens:
        return "too_long"
    if not (300 <= (word_lengths_total(text) * 100) // n_tok <= 1000):
        return "word_length"
    if len(_SYM_RE.findall(text)) * 10 > len(text):
        return "symbol_ratio"
    if lang == "en" and stopword_hits(text, "en") < 2:
        return "stopwords"
    return ""


def quality_filter(
    sf_dir: str, min_tokens: int = 50, max_tokens: int = 100_000
) -> ray.data.Dataset:
    """Gopher-style document quality filter (the keep/drop gate a
    training pipeline runs before tokenization), with every rule on an
    integer grid so the SQL oracle applies the identical comparisons:

      1. too_short / too_long — token count outside [min, max]
      2. word_length — mean word length (chars*100 // tokens) outside
         [300, 1000] (3–10 chars)
      3. symbol_ratio — >10% of characters outside [A-Za-z0-9 \\t\\n\\r]
         (ASCII-centric by design, like the published filters: CJK text
         fails here and would be routed to a per-script filter)
      4. stopwords — English docs with <2 English stopword hits

    Output: (doc_id, keep, reason) with reason = first failing rule.
    Stateless vectorized map — no shuffle."""

    def _filter(batch: pa.Table) -> pa.Table:
        out_keep, out_reason = [], []
        for text, lang in zip(
            batch.column("text").to_pylist(), batch.column("lang").to_pylist()
        ):
            reason = quality_reason(text or "", lang, min_tokens, max_tokens)
            out_keep.append(reason == "")
            out_reason.append(reason)
        return pa.Table.from_pydict(
            {
                "doc_id": batch.column("doc_id"),
                "keep": pa.array(out_keep, pa.bool_()),
                "reason": pa.array(out_reason, pa.string()),
            }
        )

    return read_documents(sf_dir).map_batches(_filter, batch_format="pyarrow")


def stratified_sample(
    sf_dir: str, rates: dict[str, int] | None = None, default_permille: int = 100
) -> ray.data.Dataset:
    """Deterministic per-language stratified sample (the rebalancing
    pass that caps over-represented languages in a training mix): keep
    a doc iff ``md5-hash(doc_id) % 1000 < permille[lang]``. The hash is
    content-stable (``functions.hashing._hash64`` == DuckDB's
    ``md5_number_lower``), so the sample is reproducible across runs,
    engines, and cluster sizes — no RNG state, no coordination.

    Output: the sampled (doc_id, lang) rows."""
    from ..functions.hashing import _hash64

    rates = rates or {"en": 500, "de": 300, "es": 300, "fr": 300, "zh": 150}

    def _sample(batch: pa.Table) -> pa.Table:
        keep = [
            int(_hash64(str(int(d)))) % 1000
            < rates.get(lang, default_permille)
            for d, lang in zip(
                batch.column("doc_id").to_pylist(), batch.column("lang").to_pylist()
            )
        ]
        return pa.Table.from_pydict(
            {"doc_id": batch.column("doc_id"), "lang": batch.column("lang")}
        ).filter(pa.array(keep))

    return read_documents(sf_dir).map_batches(_sample, batch_format="pyarrow")


SAMPLE_EXACT_SCHEMA = pa.schema(
    [("doc_id", pa.int64()), ("lang", pa.string()), ("sample_rank", pa.int64())]
)


def sample_exact_k(sf_dir: str, k: int = 100) -> ray.data.Dataset:
    """Deterministic EXACT-k corpus sample: order every document by
    ``md5-hash(doc_id)`` (== DuckDB ``md5_number_lower``, the same
    content-stable key ``stratified_sample`` rates against) and keep
    the k smallest. A rate-based sample's output size varies with the
    corpus; this one hits a fixed budget exactly — the shape needed
    when a downstream consumer (eval set, human-audit batch, pilot
    training mix) must receive precisely k docs, reproducibly across
    runs, engines, and cluster sizes. No RNG state, no coordination:
    membership of a doc depends only on its own id and the corpus.

    Scale shape: per-block bottom-k combiner (each block emits ≤k rows,
    the corpus itself never shuffles) → one tiny merge block for the
    global bottom-k; the merge sees at most blocks×k rows.

    Output: (doc_id, lang, sample_rank 1..k) in hash order, ties (an
    md5 collision) broken by doc_id ascending."""
    import numpy as np

    from ..functions.hashing import _hash64

    def _bottom_k(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return SAMPLE_EXACT_SCHEMA.empty_table()
        ids = np.asarray(batch.column("doc_id").to_pylist(), dtype=np.int64)
        keys = np.fromiter(
            (_hash64(str(int(d))) for d in ids), dtype=np.uint64, count=len(ids)
        )
        order = np.lexsort((ids, keys))[:k]
        out = batch.select(["doc_id", "lang"]).take(pa.array(order))
        return pa.Table.from_pydict(
            {
                "doc_id": out.column("doc_id").cast(pa.int64()),
                "lang": out.column("lang").cast(pa.string()),
                "sample_rank": pa.array(
                    np.arange(1, len(order) + 1, dtype=np.int64), pa.int64()
                ),
            },
            schema=SAMPLE_EXACT_SCHEMA,
        )

    partial = read_documents(sf_dir).map_batches(_bottom_k, batch_format="pyarrow")
    # Global merge: blocks×k rows — tiny by construction — re-ranked in
    # one block (repartition(1) is safe ONLY because the combiner above
    # already shrank each block to ≤k rows).
    return partial.repartition(1).map_batches(_bottom_k, batch_format="pyarrow")


def sample_stratified_k(sf_dir: str, k: int = 20) -> ray.data.Dataset:
    """Deterministic EXACT-k-PER-STRATUM sample — the balanced-eval-set
    shape (k docs from EVERY language, reproducibly): within each
    ``lang``, order documents by ``md5-hash(doc_id)`` (the same
    content-stable key as ``sample_exact_k`` / ``stratified_sample``)
    and keep the k smallest. ``stratified_sample`` is rate-based (its
    per-language output size varies with the corpus);
    ``sample_exact_k`` is a global budget — this is the missing cell
    of that matrix: a fixed per-stratum budget. No RNG state, no
    coordination.

    Scale shape: per-block per-lang bottom-k combiner (each block
    emits ≤ strata_in_block × k rows — the standard combiner argument
    makes the composition exact: any row in a stratum's true global
    bottom-k survives its own block's cut); the final per-stratum
    bottom-k runs via ``map_key_groups`` over the combined table, so
    only O(blocks × strata × k) rows shuffle and NO single task sees
    all strata (unlike a ``repartition(1)`` merge, this holds for
    high-cardinality strata like per-domain sampling).

    Output: (doc_id, lang, sample_rank 1..k per lang) in hash order,
    ties broken by doc_id ascending.
    """
    import numpy as np

    from ..functions.hashing import _hash64
    from .grouped import block_topk, map_key_groups

    def _bottom_k(batch: pa.Table, rank: bool) -> pa.Table:
        if batch.num_rows == 0:
            return SAMPLE_EXACT_SCHEMA.empty_table()
        ids = np.asarray(batch.column("doc_id").to_pylist(), dtype=np.int64)
        keys = np.fromiter(
            (_hash64(str(int(d))) for d in ids), dtype=np.uint64, count=len(ids)
        )
        langs = np.asarray(batch.column("lang").to_pylist())
        _, group = np.unique(langs, return_inverse=True)
        take, ranks = block_topk(group, (ids, keys), k)
        out = batch.select(["doc_id", "lang"]).take(pa.array(take))
        return pa.Table.from_pydict(
            {
                "doc_id": out.column("doc_id").cast(pa.int64()),
                "lang": out.column("lang").cast(pa.string()),
                "sample_rank": pa.array(
                    ranks if rank else np.zeros(len(take), dtype=np.int64),
                    pa.int64(),
                ),
            },
            schema=SAMPLE_EXACT_SCHEMA,
        )

    partial = read_documents(sf_dir).map_batches(
        lambda b: _bottom_k(b, rank=False), batch_format="pyarrow"
    )
    return map_key_groups(
        partial.select_columns(["doc_id", "lang"]),
        "lang",
        lambda g: _bottom_k(g, rank=True),
    )


def contamination_check(
    sf_dir: str, n: int = 8, bench_docs: int = 20, min_hits: int = 1
) -> ray.data.Dataset:
    """Benchmark-contamination sweep (the n-gram-overlap decontamination
    pass a training pipeline runs before a data release, per the
    published GPT-3/PaLM recipes): flag documents sharing any word
    ``n``-gram with a benchmark set.

    The benchmark here is a deterministic stand-in — the ``bench_docs``
    lowest doc_ids (a real run would load the eval suites); its n-gram
    set is SMALL and ships once via ``ray.put``, every batch doing a
    vectorized set-membership count — the broadcast-small-side pattern,
    never a shuffle join.

    Output: (doc_id, n_hits = distinct overlapping n-grams,
    contaminated = n_hits >= min_hits). Benchmark docs themselves are
    excluded from the output (they trivially self-overlap)."""
    import ray as _ray

    import pyarrow.compute as pc
    import pyarrow.parquet as pq

    # Driver loads ONLY the id column to pick the benchmark ids, then a
    # predicate-pushdown read fetches just those bench_docs texts — the
    # corpus text never materializes driver-side (the r2 anti-pattern).
    ids = pq.read_table(f"{sf_dir}/documents.parquet", columns=["doc_id"]).column(
        "doc_id"
    )
    bench_ids = {int(v) for v in sorted(ids.to_pylist())[:bench_docs]}
    bench_table = pq.read_table(
        f"{sf_dir}/documents.parquet",
        columns=["doc_id", "text"],
        filters=pc.field("doc_id").isin(sorted(bench_ids)),
    )
    grams: set[str] = set()
    for text in bench_table.column("text").to_pylist():
        toks = (text or "").lower().split()
        grams.update(
            " ".join(toks[j : j + n]) for j in range(len(toks) - n + 1)
        )
    ref = _ray.put((frozenset(grams), frozenset(bench_ids)))

    def _check(batch: pa.Table) -> pa.Table:
        bench_grams, bench = _ray.get(ref)
        out_id, out_hits = [], []
        for doc_id, text in zip(
            batch.column("doc_id").to_pylist(), batch.column("text").to_pylist()
        ):
            if int(doc_id) in bench:
                continue
            toks = (text or "").lower().split()
            doc_grams = {
                " ".join(toks[j : j + n]) for j in range(len(toks) - n + 1)
            }
            out_id.append(int(doc_id))
            out_hits.append(len(doc_grams & bench_grams))
        return pa.Table.from_pydict(
            {
                "doc_id": pa.array(out_id, pa.int64()),
                "n_hits": pa.array(out_hits, pa.int64()),
                "contaminated": pa.array(
                    [h >= min_hits for h in out_hits], pa.bool_()
                ),
            }
        )

    return read_documents(sf_dir).map_batches(_check, batch_format="pyarrow")


def fingerprints(sf_dir: str) -> ray.data.Dataset:
    """doc_id, text_md5 (exact; SQL md5), n_winnow (winnowing
    fingerprint cardinality, rolling-hash based — rows-only check)."""

    def _batch(batch: pa.Table) -> pa.Table:
        texts = [t or "" for t in batch.column("text").to_pylist()]
        return pa.Table.from_pydict(
            {
                "doc_id": batch.column("doc_id"),
                "text_md5": pa.array([content_md5(t) for t in texts], pa.string()),
                "n_winnow": pa.array(
                    [len(winnow_fingerprint(t)) for t in texts], pa.int64()
                ),
            }
        )

    return read_documents(sf_dir).map_batches(_batch, batch_format="pyarrow")


def doc_length_quantiles(
    sf_dir: str, quantiles: tuple[int, ...] = (25, 50, 75, 90, 99)
) -> "pa.Table":
    """Exact token-length quantiles of the corpus, distributed as a
    histogram aggregate: per-batch token counts → ``groupby(n_tokens)``
    count → driver-side cumulative walk over the histogram.

    The only thing the driver ever holds is the histogram — one row per
    DISTINCT document length, bounded by the max token count (≤100k for
    any real webtext corpus) regardless of corpus row count, so the
    take_all() is scale-safe where a sort-based quantile would be an
    all-to-all over every row.

    Quantile definition (integer grid, shared verbatim with the SQL
    oracle): the q-th percentile is the smallest length v with
    ``cum_count(v) * 100 >= q * n_total``.
    """

    def _tok(batch: pa.Table) -> pa.Table:
        return pa.Table.from_pydict(
            {
                "n_tokens": pa.array(
                    [token_count(t or "") for t in batch.column("text").to_pylist()],
                    pa.int64(),
                )
            }
        )

    hist = (
        read_documents(sf_dir)
        .map_batches(_tok, batch_format="pyarrow")
        .groupby("n_tokens")
        .count()
        .sort("n_tokens")
        .take_all()
    )
    n_total = sum(r["count()"] for r in hist)
    out_q, out_v = [], []
    for q in quantiles:
        cum = 0
        for r in hist:
            cum += r["count()"]
            if cum * 100 >= q * n_total:
                out_q.append(q)
                out_v.append(int(r["n_tokens"]))
                break
    return pa.Table.from_pydict(
        {
            "quantile_pct": pa.array(out_q, pa.int64()),
            "n_tokens": pa.array(out_v, pa.int64()),
        }
    )


def lang_length_quantiles(
    sf_dir: str, quantiles: tuple[int, ...] = (25, 50, 75, 90, 99)
) -> ray.data.Dataset:
    """Exact PER-LANGUAGE token-length quantiles — the grouped variant
    of ``doc_length_quantiles`` (same integer-grid rule: the q-th
    percentile is the smallest length v with ``cum_count(v) * 100 >=
    q * n_lang``). Curation pipelines cut length thresholds per
    language because script density differs (CJK packs a sentence into
    what a whitespace tokenizer calls 3 "tokens"); a single global
    quantile table over-prunes one language and under-prunes another.

    Scale shape: fully distributed, no driver walk — per-batch token
    counts → ``groupby(lang, n_tokens).count()`` collapses the corpus
    to per-language histograms (rows bounded by distinct lengths ×
    languages, independent of corpus size), then ``map_key_groups`` on
    lang runs the cumulative walk inside each co-located histogram.

    Output: one row per (lang, quantile_pct), sorted upstream of the
    driver by the map_key_groups key sort.
    """
    import numpy as np

    from .grouped import map_key_groups

    out_schema = pa.schema(
        [
            ("lang", pa.string()),
            ("quantile_pct", pa.int64()),
            ("n_tokens", pa.int64()),
        ]
    )

    def _tok(batch: pa.Table) -> pa.Table:
        return pa.Table.from_pydict(
            {
                "lang": batch.column("lang"),
                "n_tokens": pa.array(
                    [token_count(t or "") for t in batch.column("text").to_pylist()],
                    pa.int64(),
                ),
            }
        )

    def _walk(group: pa.Table) -> pa.Table:
        if group.num_rows == 0:
            return out_schema.empty_table()
        group = group.sort_by("n_tokens")
        lang = group.column("lang")[0].as_py()
        lens = group.column("n_tokens").to_numpy(zero_copy_only=False)
        cum = np.cumsum(group.column("count()").to_numpy(zero_copy_only=False))
        n_total = int(cum[-1])
        # smallest v with cum*100 >= q*n_total — searchsorted on the
        # monotone cum array, one shot for all quantiles.
        idx = np.searchsorted(cum * 100, [q * n_total for q in quantiles], side="left")
        return pa.Table.from_pydict(
            {
                "lang": pa.array([lang] * len(quantiles), pa.string()),
                "quantile_pct": pa.array(list(quantiles), pa.int64()),
                "n_tokens": pa.array(lens[idx], pa.int64()),
            },
            schema=out_schema,
        )

    hist = (
        ray.data.read_parquet(f"{sf_dir}/documents.parquet", columns=["lang", "text"])
        .map_batches(_tok, batch_format="pyarrow")
        .groupby(["lang", "n_tokens"])
        .count()
    )
    return map_key_groups(hist, "lang", _walk)


def _window_stream(batch: pa.Table, window: int):
    """Vectorized window structure over a batch's token stream: maps
    each token to a GLOBAL window id (``window`` tokens per window,
    last partial kept, one synthetic empty window per empty doc — the
    ``code_switch_spans`` frozen rule) without any per-row Python.
    Returns (tokens, par, gwin, total_windows, n_win_per_row,
    win_doc_row, win_idx_in_doc)."""
    import numpy as np

    n = batch.num_rows
    tokens, parents = _arrow_token_stream(batch)
    par = parents.to_numpy(zero_copy_only=False)
    row_counts = np.bincount(par, minlength=n)
    starts = np.concatenate(([0], np.cumsum(row_counts)))
    pos = np.arange(len(par), dtype=np.int64) - starts[par]
    n_win = np.maximum(1, -(-row_counts // window))
    wbase = np.concatenate(([0], np.cumsum(n_win)))
    gwin = wbase[par] + pos // window
    total = int(wbase[-1])
    win_doc = np.repeat(np.arange(n, dtype=np.int64), n_win)
    win_idx = np.arange(total, dtype=np.int64) - wbase[win_doc]
    return tokens, par, gwin, total, n_win, win_doc, win_idx


def code_switch_spans(sf_dir: str, window: int = 32) -> ray.data.Dataset:
    """Windowed language-ID — the CCNet move of running langid per
    PARAGRAPH instead of per document, here on fixed token windows:
    multilingual pages (boilerplate in one language, content in
    another; quoted passages; code-switched forums) get a per-window
    language so curation can keep the majority-language spans instead
    of dropping the whole page.

    Frozen semantics (mirrored by the SQL oracle): tokens = lowered
    whitespace split of the trimmed text (the ``lang_id`` rule);
    non-overlapping ``window``-token windows, last partial window
    kept; per-window ``predict_lang`` (stopword-bank argmax, ≥2 hits
    else 'und'); ``doc_lang`` = predict_lang over the whole doc;
    ``switched`` = window lang differs from doc lang and is not 'und'.
    Dense output: one row per window.

    Scale shape: a stateless FULLY-VECTORIZED map — the former
    per-window ``predict_lang`` Python loop (the last per-row Python
    on a corpus-wide scan, BASELINE.md headroom #4) is now one
    ``_lang_hit_matrix`` bincount pass over window ids and one over
    doc ids; no shuffle, no broadcast, no driver state at any corpus
    size; output rows are corpus_tokens/window, written/consumed
    streaming.
    """
    out_schema = pa.schema(
        [
            ("doc_id", pa.int64()),
            ("win_idx", pa.int64()),
            ("win_lang", pa.string()),
            ("doc_lang", pa.string()),
            ("switched", pa.bool_()),
        ]
    )

    def _spans(batch: pa.Table) -> pa.Table:
        import numpy as np

        n = batch.num_rows
        tokens, par, gwin, total, n_win, win_doc, win_idx = _window_stream(
            batch, window
        )
        wcounts = _lang_hit_matrix(tokens, gwin, total)
        whas = np.bincount(gwin, minlength=total) > 0
        win_lang, _, _ = _lang_argmax(wcounts, whas)
        dcounts = _lang_hit_matrix(tokens, par, n)
        dhas = np.bincount(par, minlength=n) > 0
        doc_lang, _, _ = _lang_argmax(dcounts, dhas)
        ids = batch.column("doc_id").cast(pa.int64()).to_numpy(
            zero_copy_only=False
        )
        dl = doc_lang[win_doc]
        switched = (win_lang != dl) & (win_lang != "und")
        return pa.Table.from_pydict(
            {
                "doc_id": pa.array(ids[win_doc], pa.int64()),
                "win_idx": pa.array(win_idx, pa.int64()),
                "win_lang": pa.array(list(win_lang), pa.string()),
                "doc_lang": pa.array(list(dl), pa.string()),
                "switched": pa.array(switched),
            },
            schema=out_schema,
        )

    return (
        ray.data.read_parquet(
            f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
        ).map_batches(_spans, batch_format="pyarrow")
    )


def majority_lang_strip(sf_dir: str, window: int = 32) -> ray.data.Dataset:
    """Majority-language text rewrite — the KEEP half of
    ``code_switch_spans`` (the CCNet cleanup that drops foreign-language
    paragraphs instead of the whole page): windows whose language
    differs from the document's (and is not 'und') are removed, the
    rest rejoin in order.

    Frozen semantics (mirrored by the SQL oracle): windows/langs as in
    ``code_switch_spans``; keep a window iff NOT switched; rebuilt
    text = kept windows' LOWERED tokens joined with single spaces in
    window order (the tokenization is lossy by design — this op's
    contract is the token stream, like ``repetition_strip``'s line
    windows). Output: (doc_id, n_windows, kept_windows, kept_md5) —
    the rebuilt text ships as an md5 so corpus-scale text never lands
    in the gate's compare.

    Scale shape: identical to ``code_switch_spans`` — one stateless
    FULLY-VECTORIZED map (window langs via ``_lang_hit_matrix``
    bincounts, window/doc text rebuilds via ``pc.binary_join`` over
    offset-built list arrays); the only remaining per-row Python is
    the one inherent md5 per document. No shuffle at any corpus size.
    """
    out_schema = pa.schema(
        [
            ("doc_id", pa.int64()),
            ("n_windows", pa.int64()),
            ("kept_windows", pa.int64()),
            ("kept_md5", pa.string()),
        ]
    )

    def _strip(batch: pa.Table) -> pa.Table:
        import numpy as np

        n = batch.num_rows
        tokens, par, gwin, total, n_win, win_doc, _ = _window_stream(
            batch, window
        )
        wcounts = _lang_hit_matrix(tokens, gwin, total)
        whas = np.bincount(gwin, minlength=total) > 0
        win_lang, _, _ = _lang_argmax(wcounts, whas)
        dcounts = _lang_hit_matrix(tokens, par, n)
        dhas = np.bincount(par, minlength=n) > 0
        doc_lang, _, _ = _lang_argmax(dcounts, dhas)
        # rebuild each window's piece text: tokens are contiguous per
        # window in stream order, so offsets + binary_join vectorize
        # the " ".join
        woff = np.concatenate(
            ([0], np.cumsum(np.bincount(gwin, minlength=total)))
        ).astype(np.int64)
        pieces = pc.binary_join(
            pa.LargeListArray.from_arrays(
                pa.array(woff, pa.int64()), _flat(tokens)
            ),
            " ",
        )
        kept_mask = ~(
            (win_lang != doc_lang[win_doc]) & (win_lang != "und")
        )
        kept_pieces = _flat(pieces.filter(pa.array(kept_mask)))
        kept_per_doc = np.bincount(win_doc[kept_mask], minlength=n)
        doff = np.concatenate(([0], np.cumsum(kept_per_doc))).astype(np.int64)
        rebuilt = pc.binary_join(
            pa.LargeListArray.from_arrays(
                pa.array(doff, pa.int64()), kept_pieces
            ),
            " ",
        )
        return pa.Table.from_pydict(
            {
                "doc_id": batch.column("doc_id").cast(pa.int64()),
                "n_windows": pa.array(n_win, pa.int64()),
                "kept_windows": pa.array(kept_per_doc, pa.int64()),
                "kept_md5": pa.array(
                    [content_md5(s) for s in rebuilt.to_pylist()],
                    pa.string(),
                ),
            },
            schema=out_schema,
        )

    return (
        ray.data.read_parquet(
            f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
        ).map_batches(_strip, batch_format="pyarrow")
    )


def tokenizer_fertility(sf_dir: str) -> ray.data.Dataset:
    """Per-language tokenizer fertility — sub-word tokens produced per
    whitespace word (the multilingual tokenizer-budget diagnostic: a
    tokenizer trained lopsidedly emits 2-4× more tokens per word for
    under-represented languages, inflating their effective sequence
    cost). Here the sub-word side is the deterministic ``bpeish``
    stand-in tokenizer shared with ``token_counts``.

    Frozen semantics (mirrored by the SQL oracle):
    ``fertility_e6 = (1_000_000 * sum_bpeish) // max(sum_tokens, 1)``
    per language — integer grid, exact across engines; Python bigint
    on the Ray side so corpus-scale sums never overflow before the
    floor-div.

    Scale shape: per-block partial sums collapse each batch to one row
    per language BEFORE the shuffle; the groupby moves rows bounded by
    languages × blocks; the fertility division runs over the tiny
    per-language table.
    """
    from ray.data.aggregate import Sum

    part_schema = pa.schema(
        [
            ("lang", pa.string()),
            ("n_docs", pa.int64()),
            ("sum_tokens", pa.int64()),
            ("sum_bpeish", pa.int64()),
        ]
    )

    def _part(batch: pa.Table) -> pa.Table:
        agg: dict[str, list[int]] = {}
        for lang, t in zip(
            batch.column("lang").to_pylist(), batch.column("text").to_pylist()
        ):
            text = t or ""
            a = agg.setdefault(lang or "", [0, 0, 0])
            a[0] += 1
            a[1] += token_count(text)
            a[2] += bpeish_token_count(text)
        keys = sorted(agg)
        return pa.Table.from_pydict(
            {
                "lang": pa.array(keys, pa.string()),
                "n_docs": pa.array([agg[k][0] for k in keys], pa.int64()),
                "sum_tokens": pa.array([agg[k][1] for k in keys], pa.int64()),
                "sum_bpeish": pa.array([agg[k][2] for k in keys], pa.int64()),
            },
            schema=part_schema,
        )

    out_schema = pa.schema(
        list(part_schema) + [("fertility_e6", pa.int64())]
    )

    def _fin(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return out_schema.empty_table()
        fert = [
            (1_000_000 * int(bp)) // max(int(tk), 1)
            for bp, tk in zip(
                batch.column("sum_bpeish").to_pylist(),
                batch.column("sum_tokens").to_pylist(),
            )
        ]
        return pa.Table.from_pydict(
            {
                "lang": batch.column("lang"),
                "n_docs": batch.column("n_docs"),
                "sum_tokens": batch.column("sum_tokens"),
                "sum_bpeish": batch.column("sum_bpeish"),
                "fertility_e6": pa.array(fert, pa.int64()),
            },
            schema=out_schema,
        )

    return (
        ray.data.read_parquet(
            f"{sf_dir}/documents.parquet", columns=["lang", "text"]
        )
        .map_batches(_part, batch_format="pyarrow")
        .groupby("lang")
        .aggregate(
            Sum("n_docs", alias_name="n_docs"),
            Sum("sum_tokens", alias_name="sum_tokens"),
            Sum("sum_bpeish", alias_name="sum_bpeish"),
        )
        .map_batches(_fin, batch_format="pyarrow")
    )


def tfidf_top_terms(sf_dir: str, k: int = 3) -> ray.data.Dataset:
    """Per-document top-k terms by an integer-grid tf-idf:
    ``score = tf * ((1_000_000 * n_docs) // df)`` — the idf factor is a
    floor-divided integer ratio instead of a float log so the SQL
    oracle computes bit-identical scores (ranking is order-isomorphic
    to tf·(N/df) for fixed tf). Ties break by term ascending.

    Scale shape: (doc_id, term, tf) rows are distinct per (doc, term);
    df comes from a groupby(term) count over them; df joins BACK to the
    term rows with a distributed hash join (the document-frequency
    table is vocabulary-sized — corpus-scale on real webtext, so no
    broadcast); per-doc top-k runs through a vectorized per-block
    combiner (lossless: keeps k rows per (block, doc)) before the final
    ``map_key_groups`` rank.
    """
    import numpy as np

    from ..tuning import join_partitions as _jp
    from .grouped import map_key_groups

    docs = read_documents(sf_dir)
    n_docs = docs.count()
    jp = _jp()

    _tf_schema = pa.schema(
        [("doc_id", pa.int64()), ("term", pa.string()), ("tf", pa.int64())]
    )

    def _tf(batch: pa.Table) -> pa.Table:
        # _TOKEN_RE.findall == \S+ tokens, case preserved: the
        # unlowered vectorized token stream.
        toks, par = _arrow_token_stream(batch, lower=False)
        if len(toks) == 0:
            return _tf_schema.empty_table()
        ids = _flat(batch.column("doc_id").cast(pa.int64())).take(par)
        agg = (
            pa.table({"doc_id": ids, "term": toks})
            .group_by(["doc_id", "term"])
            .aggregate([([], "count_all")])
        )
        return agg.rename_columns(["doc_id", "term", "tf"]).cast(_tf_schema)

    tf = docs.map_batches(_tf, batch_format="pyarrow")

    from .grouped import rename_agg

    # One row per distinct (doc, term) ⇒ count() == distinct docs.
    df = rename_agg(tf.groupby("term").count(), {"count()": "df"}, jp)

    scored_schema = pa.schema(
        [
            ("doc_id", pa.int64()),
            ("term", pa.string()),
            ("tf", pa.int64()),
            ("df", pa.int64()),
            ("score", pa.int64()),
        ]
    )

    def _score(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return scored_schema.empty_table()
        tfv = batch.column("tf").to_numpy(zero_copy_only=False)
        dfv = batch.column("df").to_numpy(zero_copy_only=False)
        score = tfv * ((1_000_000 * n_docs) // dfv)
        return pa.Table.from_pydict(
            {
                "doc_id": batch.column("doc_id"),
                "term": batch.column("term"),
                "tf": batch.column("tf"),
                "df": batch.column("df"),
                "score": pa.array(score, pa.int64()),
            },
            schema=scored_schema,
        )

    scored = tf.join(df, "inner", jp, on=("term",)).map_batches(
        _score, batch_format="pyarrow"
    )

    out_schema = pa.schema(
        [
            ("doc_id", pa.int64()),
            ("rnk", pa.int64()),
            ("term", pa.string()),
            ("tf", pa.int64()),
            ("df", pa.int64()),
            ("score", pa.int64()),
        ]
    )

    from .grouped import block_topk

    def _topk(tbl: pa.Table, *, ranked: bool) -> pa.Table:
        if tbl.num_rows == 0:
            return out_schema.empty_table() if ranked else tbl
        tbl = tbl.combine_chunks()
        doc = tbl.column("doc_id").to_numpy(zero_copy_only=False)
        score = tbl.column("score").to_numpy(zero_copy_only=False)
        terms = np.asarray(tbl.column("term").to_pylist(), dtype=object)
        # doc asc; within: score desc, term asc.
        take, ranks = block_topk(doc, (terms, -score), k)
        out = tbl.take(pa.array(take))
        if not ranked:
            return out
        return pa.Table.from_pydict(
            {
                "doc_id": out.column("doc_id"),
                "rnk": pa.array(ranks, pa.int64()),
                "term": out.column("term"),
                "tf": out.column("tf"),
                "df": out.column("df"),
                "score": out.column("score"),
            },
            schema=out_schema,
        )

    partial = scored.map_batches(
        lambda b: _topk(b, ranked=False), batch_format="pyarrow"
    )
    return map_key_groups(partial, "doc_id", lambda g: _topk(g, ranked=True))


def doc_repetition(sf_dir: str, line_tokens: int = 8) -> ray.data.Dataset:
    """Per-document repetition signals (the Gopher repetition-filter
    family), all on integer grids shared verbatim with the SQL oracle:

      * ``ttr_e6``          — type/token ratio: (1e6 * distinct_tokens)
                              // n_tokens (0 for empty docs)
      * ``dup_line_frac_e6``— duplicated fixed-window "lines":
                              (1e6 * (n_lines - distinct_lines)) //
                              n_lines over ``line_tokens``-token windows
                              (the corpus has no newlines; same
                              windowing as ``line_dedup``)
      * ``top_bigram_frac_e6`` — tokens covered by the most frequent
                              bigram: (1e6 * top_count * 2) // n_tokens
                              (0 when n_tokens < 2; ties don't matter —
                              only the max count enters)

    Stateless vectorized map — no shuffle; a pure streaming stage at
    any corpus size.
    """
    from collections import Counter

    from ..functions.textstats import _TOKEN_RE

    def _batch(batch: pa.Table) -> pa.Table:
        ttr, dup_line, top_bigram = [], [], []
        for t in batch.column("text").to_pylist():
            toks = _TOKEN_RE.findall(t or "")
            n = len(toks)
            ttr.append((1_000_000 * len(set(toks))) // n if n else 0)
            n_lines = (n + line_tokens - 1) // line_tokens
            if n_lines:
                lines = {
                    " ".join(toks[i * line_tokens : (i + 1) * line_tokens])
                    for i in range(n_lines)
                }
                dup_line.append((1_000_000 * (n_lines - len(lines))) // n_lines)
            else:
                dup_line.append(0)
            if n >= 2:
                top = max(Counter(zip(toks, toks[1:])).values())
                top_bigram.append((1_000_000 * top * 2) // n)
            else:
                top_bigram.append(0)
        return pa.Table.from_pydict(
            {
                "doc_id": batch.column("doc_id"),
                "ttr_e6": pa.array(ttr, pa.int64()),
                "dup_line_frac_e6": pa.array(dup_line, pa.int64()),
                "top_bigram_frac_e6": pa.array(top_bigram, pa.int64()),
            }
        )

    return read_documents(sf_dir).map_batches(_batch, batch_format="pyarrow")


def unigram_surprisal(sf_dir: str) -> ray.data.Dataset:
    """Per-document unigram-LM surprisal — the CCNet-style
    "perplexity filter" signal (docs whose tokens are rare under the
    corpus language model score high and get routed to the tail
    quality bucket), on an exact integer grid:

      * per token t: ``bits(t) = bit_length(A // cf(t))`` where A is
        the corpus token total and cf the token's corpus frequency —
        an integer ⌊log2⌋+1 surrogate for −log p(t), exact on both
        engines (numpy ``frexp`` exponent here, DuckDB
        ``length(to_base(x, 2))`` in the oracle; exact below 2^53);
      * per doc: ``surprisal_bits = Σ tf·bits``, ``n_tokens = Σ tf``,
        ``mean_bits_e3 = (1000·surprisal_bits) // n_tokens``.

    Scale shape: identical to ``tfidf_top_terms`` — (doc, term, tf)
    rows, a vocabulary-sized corpus-frequency groupby joined back with
    a distributed hash join (never broadcast: real-webtext vocabulary
    is corpus-scale), then a per-doc integer-sum groupby. The single
    driver scalar is A.
    """
    import numpy as np

    from ..tuning import join_partitions as _jp
    from .grouped import map_key_groups

    jp = _jp()
    docs = read_documents(sf_dir)

    tf_schema = pa.schema(
        [("doc_id", pa.int64()), ("term", pa.string()), ("tf", pa.int64())]
    )

    def _tf(batch: pa.Table) -> pa.Table:
        # _TOKEN_RE.findall == \S+ tokens, case preserved — the
        # unlowered vectorized token stream + Arrow group_by.
        toks, par = _arrow_token_stream(batch, lower=False)
        if len(toks) == 0:
            return tf_schema.empty_table()
        ids = _flat(batch.column("doc_id").cast(pa.int64())).take(par)
        agg = (
            pa.table({"doc_id": ids, "term": toks})
            .group_by(["doc_id", "term"])
            .aggregate([([], "count_all")])
        )
        return agg.rename_columns(["doc_id", "term", "tf"]).cast(tf_schema)

    tf = docs.map_batches(_tf, batch_format="pyarrow")

    # Materialize the vocabulary-sized cf table once: A derives from it
    # (Σcf = Σtf) without a separate corpus pass, and the join below
    # reads it from the object store instead of re-running the groupby.
    from .grouped import rename_agg

    cf = rename_agg(tf.groupby("term").sum("tf"), {"sum(tf)": "cf"}, jp).materialize()
    a_total = int(cf.sum("cf") or 0)

    out_schema = pa.schema(
        [
            ("doc_id", pa.int64()),
            ("n_tokens", pa.int64()),
            ("surprisal_bits", pa.int64()),
            ("mean_bits_e3", pa.int64()),
        ]
    )
    if a_total == 0:
        return ray.data.from_arrow(out_schema.empty_table())

    contrib_schema = pa.schema(
        [("doc_id", pa.int64()), ("tf", pa.int64()), ("bits", pa.int64())]
    )

    def _bits(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return contrib_schema.empty_table()
        tfv = batch.column("tf").to_numpy(zero_copy_only=False)
        cfv = batch.column("cf").to_numpy(zero_copy_only=False)
        # bit_length via the frexp exponent: exact for ints < 2^53.
        blen = np.frexp((a_total // cfv).astype(np.float64))[1].astype(np.int64)
        return pa.Table.from_pydict(
            {
                "doc_id": batch.column("doc_id"),
                "tf": batch.column("tf"),
                "bits": pa.array(tfv * blen, pa.int64()),
            },
            schema=contrib_schema,
        )

    contrib = tf.join(cf, "inner", jp, on=("term",)).map_batches(
        _bits, batch_format="pyarrow"
    )

    def _finish(group: pa.Table) -> pa.Table:
        if group.num_rows == 0:
            return out_schema.empty_table()
        n_tok = int(pa.compute.sum(group.column("tf")).as_py())
        bits = int(pa.compute.sum(group.column("bits")).as_py())
        return pa.Table.from_pydict(
            {
                "doc_id": group.column("doc_id").slice(0, 1),
                "n_tokens": pa.array([n_tok], pa.int64()),
                "surprisal_bits": pa.array([bits], pa.int64()),
                "mean_bits_e3": pa.array([(1000 * bits) // n_tok], pa.int64()),
            },
            schema=out_schema,
        )

    return map_key_groups(contrib, "doc_id", _finish)


BM25_QUERY_TERMS: tuple[str, ...] = ("join", "window", "scan")


def bm25_topk(
    sf_dir: str,
    query_terms: tuple[str, ...] = BM25_QUERY_TERMS,
    k: int = 10,
) -> ray.data.Dataset:
    """Top-k documents for a fixed term query under an exact-integer
    BM25 (k1 = 1.2, b = 0.75) — the ranked-retrieval primitive quality
    pipelines use for targeted corpus probes (and the scoring core of
    a distributed search index).

    The classic float formula is rewritten as exact integer rationals
    so the DuckDB oracle computes bit-identical scores:

      * saturation  tf·(k1+1) / (tf + k1·(1−b + b·dl·N/A)) with
        k1 = 6/5, b = 3/4 multiplies out to the integer ratio
        ``44·A·tf / (20·A·tf + 6·A + 18·dl·N)``; the engine keeps
        ``sat_e6 = (1e6·44·A·tf) // (20·A·tf + 6·A + 18·dl·N)``.
      * idf uses the log-free rational surrogate
        ``idf_e6 = (1e6·(N − df + 1)) // (df + 1)`` — strictly
        decreasing in df, same high-low ordering family as the log idf
        for fixed queries.
      * per-term contribution ``idf_e6 · sat_e6 // 1e6`` summed over
        query terms ⇒ ``score_e6``; ranking score desc, doc_id asc.

    Arithmetic is Python int (arbitrary precision) on the Ray side and
    HUGEINT in the oracle, so no corpus size overflows the grid.

    Scale shape: two streaming passes over ``documents``. Pass 1
    reduces per-block partials (df per query term, doc/token totals)
    through a |q|+1-row groupby — only those rows reach the driver.
    Pass 2 scores each doc block-locally against the broadcast stats
    (a handful of ints), keeps a lossless per-block top-k, and the
    final sort+limit runs over ≤ k·blocks rows. The corpus itself is
    never shuffled.
    """
    from collections import Counter

    from ..functions.textstats import _TOKEN_RE

    qset = frozenset(query_terms)
    docs = read_documents(sf_dir)

    stats_schema = pa.schema(
        [
            ("term", pa.string()),
            ("df", pa.int64()),
            ("n_docs", pa.int64()),
            ("n_tok", pa.int64()),
        ]
    )

    def _partial_stats(batch: pa.Table) -> pa.Table:
        n_docs = 0
        n_tok = 0
        df: dict[str, int] = dict.fromkeys(qset, 0)
        for t in batch.column("text").to_pylist():
            toks = _TOKEN_RE.findall(t or "")
            if not toks:
                continue
            n_docs += 1
            n_tok += len(toks)
            for qt in qset.intersection(toks):
                df[qt] += 1
        terms = sorted(qset) + [""]
        return pa.Table.from_pydict(
            {
                "term": pa.array(terms, pa.string()),
                "df": pa.array([df[t] for t in sorted(qset)] + [0], pa.int64()),
                "n_docs": pa.array([0] * len(qset) + [n_docs], pa.int64()),
                "n_tok": pa.array([0] * len(qset) + [n_tok], pa.int64()),
            },
            schema=stats_schema,
        )

    stats_rows = (
        docs.map_batches(_partial_stats, batch_format="pyarrow")
        .groupby("term")
        .sum(["df", "n_docs", "n_tok"])
        .take_all()
    )
    df_by_term = {r["term"]: int(r["sum(df)"]) for r in stats_rows if r["term"]}
    totals = next(r for r in stats_rows if not r["term"])
    n_corpus_docs = int(totals["sum(n_docs)"])
    n_corpus_tok = int(totals["sum(n_tok)"])

    out_schema = pa.schema(
        [("doc_id", pa.int64()), ("dl", pa.int64()), ("score_e6", pa.int64())]
    )

    def _score(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0 or n_corpus_tok == 0:
            return out_schema.empty_table()
        ids_out, dl_out, score_out = [], [], []
        a_tot, n_tot = n_corpus_tok, n_corpus_docs
        for d, t in zip(
            batch.column("doc_id").to_pylist(), batch.column("text").to_pylist()
        ):
            toks = _TOKEN_RE.findall(t or "")
            dl = len(toks)
            if not dl:
                continue
            hits = Counter(tk for tk in toks if tk in qset)
            score = 0
            for term, tf in hits.items():
                dfv = df_by_term.get(term, 0)
                if dfv == 0:
                    continue
                idf_e6 = (1_000_000 * (n_tot - dfv + 1)) // (dfv + 1)
                sat_e6 = (1_000_000 * 44 * a_tot * tf) // (
                    20 * a_tot * tf + 6 * a_tot + 18 * dl * n_tot
                )
                score += idf_e6 * sat_e6 // 1_000_000
            if score > 0:
                ids_out.append(int(d))
                dl_out.append(dl)
                score_out.append(score)
        return pa.Table.from_pydict(
            {
                "doc_id": pa.array(ids_out, pa.int64()),
                "dl": pa.array(dl_out, pa.int64()),
                "score_e6": pa.array(score_out, pa.int64()),
            },
            schema=out_schema,
        )

    def _block_topk(batch: pa.Table) -> pa.Table:
        # Lossless combiner: global top-k ⊆ union of per-block top-k.
        if batch.num_rows <= k:
            return batch
        import numpy as np

        score = batch.column("score_e6").to_numpy(zero_copy_only=False)
        doc = batch.column("doc_id").to_numpy(zero_copy_only=False)
        order = np.lexsort((doc, -score))[:k]
        return batch.take(pa.array(np.sort(order)))

    scored = docs.map_batches(_score, batch_format="pyarrow").map_batches(
        _block_topk, batch_format="pyarrow"
    )
    return scored.sort(["score_e6", "doc_id"], descending=[True, False]).limit(k)


def token_packing(
    sf_dir: str, budget: int = 512, bucket: int = 4096
) -> ray.data.Dataset:
    """GPT-style sequence packing (concat-and-chunk): documents are
    concatenated in doc_id order and sliced into fixed ``budget``-token
    training windows; per document, report where its tokens land —
    (doc_id, n_tokens, start_tok, first_window, last_window). This is
    the placement map an LLM pretraining loader materializes before
    writing packed shards (boundary-crossing docs =
    ``last_window > first_window``).

    The core primitive is a DISTRIBUTED PREFIX SUM, expressed as
    two-level aggregation instead of a sequential scan:

      1. one streaming pass emits (doc_id, g = doc_id // bucket,
         n_tokens) for non-empty docs;
      2. a bucket-sum groupby reduces to corpus/bucket rows; only
         those reach the driver, which prefix-sums them in g order and
         broadcasts the per-bucket start offsets (``ray.put`` once);
      3. one ``map_key_groups`` pass per bucket sorts its ≤``bucket``
         docs by doc_id, local-cumsums, and adds the bucket offset.

    Exact and deterministic at any parallelism: token counts are
    integers, bucket boundaries are pure doc_id arithmetic. Driver
    state is O(n_docs / bucket) ints — raise ``bucket`` for trillion-
    row corpora.
    """
    import numpy as np

    from ..functions.textstats import _TOKEN_RE
    from .grouped import map_key_groups

    docs = read_documents(sf_dir)

    tok_schema = pa.schema(
        [("doc_id", pa.int64()), ("g", pa.int64()), ("n_tokens", pa.int64())]
    )

    def _tok(batch: pa.Table) -> pa.Table:
        ids, gs, ns = [], [], []
        for d, t in zip(
            batch.column("doc_id").to_pylist(), batch.column("text").to_pylist()
        ):
            n = len(_TOKEN_RE.findall(t or ""))
            if n:
                ids.append(int(d))
                gs.append(int(d) // bucket)
                ns.append(n)
        return pa.Table.from_pydict(
            {
                "doc_id": pa.array(ids, pa.int64()),
                "g": pa.array(gs, pa.int64()),
                "n_tokens": pa.array(ns, pa.int64()),
            },
            schema=tok_schema,
        )

    # Materialized: (doc_id, g, n_tokens) is three int64s per doc —
    # tiny next to the text — and both the bucket-sum pass and the
    # packing pass read it, so the corpus is tokenized exactly once.
    toks = docs.map_batches(_tok, batch_format="pyarrow").materialize()

    bucket_rows = sorted(
        toks.groupby("g").sum("n_tokens").take_all(), key=lambda r: r["g"]
    )
    off_keys = np.fromiter((r["g"] for r in bucket_rows), dtype=np.int64)
    off_vals = np.concatenate(
        (
            [0],
            np.cumsum(
                np.fromiter(
                    (r["sum(n_tokens)"] for r in bucket_rows), dtype=np.int64
                )
            )[:-1],
        )
    ) if len(bucket_rows) else np.zeros(0, dtype=np.int64)
    offsets_ref = ray.put((off_keys, off_vals))

    def _add_off(batch: pa.Table) -> pa.Table:
        # Vectorized bucket-offset lookup, one ray.get per BATCH (not
        # per group): searchsorted against the sorted bucket keys.
        keys, vals = ray.get(offsets_ref)
        g = batch.column("g").to_numpy(zero_copy_only=False)
        off = vals[np.searchsorted(keys, g)]
        return batch.append_column("off", pa.array(off, pa.int64()))

    toks = toks.map_batches(_add_off, batch_format="pyarrow")

    out_schema = pa.schema(
        [
            ("doc_id", pa.int64()),
            ("n_tokens", pa.int64()),
            ("start_tok", pa.int64()),
            ("first_window", pa.int64()),
            ("last_window", pa.int64()),
        ]
    )

    def _pack(group: pa.Table) -> pa.Table:
        if group.num_rows == 0:
            return out_schema.empty_table()
        group = group.sort_by([("doc_id", "ascending")]).combine_chunks()
        off = int(group.column("off")[0].as_py())
        n = group.column("n_tokens").to_numpy(zero_copy_only=False)
        start = off + np.concatenate(([0], np.cumsum(n)[:-1]))
        return pa.Table.from_pydict(
            {
                "doc_id": group.column("doc_id"),
                "n_tokens": group.column("n_tokens"),
                "start_tok": pa.array(start, pa.int64()),
                "first_window": pa.array(start // budget, pa.int64()),
                "last_window": pa.array((start + n - 1) // budget, pa.int64()),
            },
            schema=out_schema,
        )

    return map_key_groups(toks, "g", _pack)


def mixture_weights(sf_dir: str) -> ray.data.Dataset:
    """Per-source data-mixing weights: the up/down-sampling factor
    that rebalances the corpus to a uniform-over-sources target mix
    (the "data mixture" step pretraining recipes apply after quality
    filtering — Pile/Dolma-style source reweighting, with uniform as
    the deterministic oracle-checkable target):

        weight_e6(s) = (1e6 · total_docs) // (n_sources · n_docs(s))

    — >1e6 means up-sample, <1e6 down-sample, exact integers on both
    engines.

    Scale shape: one groupby(source) count (the per-domain table —
    domain-sized, stays a Dataset); the only driver state is two ints
    (total docs, source count); the weight map is a streaming
    ``map_batches`` over the counts table.
    """
    docs = read_documents(sf_dir)
    # Materialized once (domain-sized): the two scalar reductions and
    # the weight map below otherwise each re-run the corpus groupby.
    counts = docs.groupby("source").count().materialize()
    n_sources = counts.count()
    total = int(counts.sum("count()") or 0)

    out_schema = pa.schema(
        [("source", pa.string()), ("n_docs", pa.int64()), ("weight_e6", pa.int64())]
    )

    def _weight(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return out_schema.empty_table()
        import numpy as np

        n = batch.column("count()").to_numpy(zero_copy_only=False)
        w = np.floor_divide(1_000_000 * total, n_sources * n)
        return pa.Table.from_pydict(
            {
                "source": batch.column("source"),
                "n_docs": pa.array(n, pa.int64()),
                "weight_e6": pa.array(w, pa.int64()),
            },
            schema=out_schema,
        )

    return counts.map_batches(_weight, batch_format="pyarrow")


def mixture_temperature(sf_dir: str) -> ray.data.Dataset:
    """Temperature-scaled source sampling — the multilingual-mixture
    rule (mBERT / XLM-R / mT5: sample source i with p_i ∝ n_i^alpha,
    alpha < 1, so low-resource sources are up-weighted without going
    fully uniform) at alpha = 1/2, the temperature exactly computable
    on an integer grid (n^0.5 = isqrt; fractional alphas like XLM-R's
    0.3 need float pow — 1/2 is the deterministic oracle-checkable
    instance of the technique, sitting between ``mixture_weights``'
    uniform target (alpha = 0) and the natural mix (alpha = 1)).

    Frozen arithmetic (mirrored bit-for-bit in SQL): per source,
    s_i = isqrt(n_i * 10^10) (the 1e5-scaled square root, exact — the
    scaled count stays far below 2^53 so floor(sqrt(double)) plus a
    one-step correction IS isqrt), then with S = sum(s_i) and
    total = sum(n_i):

        p_e6(i)     = (1e6 * s_i) // S            -- sampling prob
        boost_e6(i) = (1e6 * s_i * total) // (S * n_i)
                                                  -- vs natural mix

    boost > 1e6 means the source is up-sampled relative to its natural
    frequency (small sources), < 1e6 down-sampled (dominant sources).

    Scale shape: identical to ``mixture_weights`` — one
    groupby(source) count (domain-sized table, stays a Dataset), two
    scalar driver ints (S, total), one streaming map over the counts
    table. Output: (source, n_docs, p_e6, boost_e6).
    """
    docs = read_documents(sf_dir)
    counts = docs.groupby("source").count().materialize()

    sqrt_schema = pa.schema(
        [("source", pa.string()), ("n_docs", pa.int64()), ("s", pa.int64())]
    )

    def _isqrt(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return sqrt_schema.empty_table()
        import numpy as np

        n = batch.column("count()").to_numpy(zero_copy_only=False).astype(np.int64)
        x = n * 10_000_000_000
        # floor(sqrt(double)) is exact for x << 2^53; the two
        # correction steps make it provably isqrt either way and are
        # the exact CASE arms the SQL oracle applies.
        c = np.floor(np.sqrt(x.astype(np.float64))).astype(np.int64)
        c = np.where((c + 1) * (c + 1) <= x, c + 1, c)
        c = np.where(c * c > x, c - 1, c)
        return pa.Table.from_pydict(
            {
                "source": batch.column("source"),
                "n_docs": pa.array(n, pa.int64()),
                "s": pa.array(c, pa.int64()),
            },
            schema=sqrt_schema,
        )

    scaled = counts.map_batches(_isqrt, batch_format="pyarrow").materialize()
    s_total = int(scaled.sum("s") or 0)
    total = int(scaled.sum("n_docs") or 0)

    out_schema = pa.schema(
        [
            ("source", pa.string()),
            ("n_docs", pa.int64()),
            ("p_e6", pa.int64()),
            ("boost_e6", pa.int64()),
        ]
    )

    def _weights(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return out_schema.empty_table()
        # Python ints, not numpy: 1e6*s*total overflows int64 once a
        # source passes ~10^6 docs (s grows as 1e5*sqrt(n)), and this
        # table is domain-sized — arbitrary precision is free here and
        # matches DuckDB's HUGEINT intermediate exactly.
        n = batch.column("n_docs").to_pylist()
        s = batch.column("s").to_pylist()
        p = [(1_000_000 * si) // s_total for si in s]
        boost = [
            (1_000_000 * si * total) // (s_total * ni) for si, ni in zip(s, n)
        ]
        return pa.Table.from_pydict(
            {
                "source": batch.column("source"),
                "n_docs": pa.array(n, pa.int64()),
                "p_e6": pa.array(p, pa.int64()),
                "boost_e6": pa.array(boost, pa.int64()),
            },
            schema=out_schema,
        )

    return scaled.map_batches(_weights, batch_format="pyarrow")


def hll_registers(sf_dir: str) -> ray.data.Dataset:
    """HyperLogLog register table for distinct-text cardinality
    (Flajolet et al. 2007) — the constant-memory sketch a crawl
    pipeline maintains to track distinct-document counts across
    trillions of rows without a distinct shuffle.

    256 registers (b=8) over the 64-bit md5-derived text hash (the
    same ``_kgram_hash64`` the winnowing family uses, so DuckDB's
    ``md5_number_lower`` recomputes it exactly): register = low 8
    bits; rank = position of the highest set bit in the remaining 56
    (57 − bit_length, 57 when they are all zero); register value =
    max rank observed. The float cardinality estimate (harmonic-mean
    α correction) is a trivial driver-side epilogue over 256 ints —
    the REGISTERS are the exact, oracle-checkable state, emitted here.

    Scale shape: duplicates cannot change a max, so no distinct pass
    is needed anywhere — each block reduces to ≤256 (register, rank)
    partial rows and the shuffle carries only those; the groupby max
    is register-keyed (256 groups) regardless of corpus size.
    """
    from ..functions.textstats import _kgram_hash64
    from ..tuning import join_partitions as _jp
    from .grouped import rename_agg

    docs = read_documents(sf_dir)

    part_schema = pa.schema([("register", pa.int64()), ("rank", pa.int64())])

    def _partial(batch: pa.Table) -> pa.Table:
        regs: dict[int, int] = {}
        for t in batch.column("text").to_pylist():
            h = _kgram_hash64(t or "")
            idx = h & 0xFF
            v = h >> 8
            rank = 57 - v.bit_length() if v else 57
            if rank > regs.get(idx, 0):
                regs[idx] = rank
        return pa.Table.from_pydict(
            {
                "register": pa.array(sorted(regs), pa.int64()),
                "rank": pa.array([regs[k] for k in sorted(regs)], pa.int64()),
            },
            schema=part_schema,
        )

    partial = docs.map_batches(_partial, batch_format="pyarrow")
    return rename_agg(
        partial.groupby("register").max("rank"), {"max(rank)": "max_rank"}, _jp()
    )


def source_caps(sf_dir: str, k: int = 3) -> ray.data.Dataset:
    """Per-source document cap — the "at most k documents per host"
    rule crawl pipelines apply against SEO farms and boilerplate mills
    (one hostname contributing millions of near-identical pages must
    not dominate the training mix; cf. the per-domain caps in C4/Dolma
    corpus construction). Keeps the k LONGEST documents per source
    (n_tokens desc, doc_id asc for determinism) and reports their rank:

        (source, rnk, doc_id, n_tokens)        rnk in 1..k

    Scale shape (mirrors ``relational.events_topk_per_hour``): a
    vectorized PER-BLOCK top-k combiner runs before the shuffle — at
    most k rows per (block, source) ever enter the all-to-all, so the
    shuffle moves O(sources × k), not O(corpus). Within a block,
    sources are factorized with ``np.unique`` (exact codes — no hash
    collisions); the final per-source top-k runs via
    ``map_key_groups`` on the source string.
    """
    import numpy as np

    docs = read_documents(sf_dir)

    def _tokenize(batch: pa.Table) -> pa.Table:
        return pa.Table.from_pydict(
            {
                "source": batch.column("source"),
                "doc_id": batch.column("doc_id").cast(pa.int64()),
                "n_tokens": pa.array(
                    [token_count(t or "") for t in batch.column("text").to_pylist()],
                    pa.int64(),
                ),
            }
        )

    return topk_per_source(
        docs.map_batches(_tokenize, batch_format="pyarrow"), k
    ).sort(["source", "rnk"])


TOPK_SOURCE_SCHEMA = pa.schema(
    [
        ("source", pa.string()),
        ("rnk", pa.int64()),
        ("doc_id", pa.int64()),
        ("n_tokens", pa.int64()),
    ]
)


def topk_per_source(tbl_ds: ray.data.Dataset, k: int) -> ray.data.Dataset:
    """Shared grouped top-k core over a (source, doc_id, n_tokens)
    dataset (``source_caps`` runs it on the whole corpus,
    ``curation.corpus_curation`` on the quality+dedup survivors):
    per-block top-k combiner → map_key_groups final rank."""
    import numpy as np

    from .grouped import block_topk, map_key_groups

    def _block_topk(tbl: pa.Table, *, ranked: bool) -> pa.Table:
        if tbl.num_rows == 0 or "source" not in tbl.column_names:
            return TOPK_SOURCE_SCHEMA.empty_table() if ranked else \
                pa.schema(
                    [("source", pa.string()), ("doc_id", pa.int64()),
                     ("n_tokens", pa.int64())]
                ).empty_table()
        tbl = tbl.select(["source", "doc_id", "n_tokens"]).combine_chunks()
        src = tbl.column("source").to_numpy(zero_copy_only=False)
        _, codes = np.unique(src, return_inverse=True)
        n_tok = tbl.column("n_tokens").to_numpy(zero_copy_only=False)
        doc = tbl.column("doc_id").to_numpy(zero_copy_only=False)
        take, ranks = block_topk(codes, (doc, -n_tok), k)
        out = tbl.take(pa.array(take))
        if not ranked:
            return out
        return pa.Table.from_pydict(
            {
                "source": out.column("source"),
                "rnk": pa.array(ranks, pa.int64()),
                "doc_id": out.column("doc_id").cast(pa.int64()),
                "n_tokens": out.column("n_tokens").cast(pa.int64()),
            },
            schema=TOPK_SOURCE_SCHEMA,
        )

    def _partial(batch: pa.Table) -> pa.Table:
        return _block_topk(batch, ranked=False)

    def _final(group: pa.Table) -> pa.Table:
        return _block_topk(group, ranked=True)

    return map_key_groups(
        tbl_ds.map_batches(_partial, batch_format="pyarrow"), "source", _final
    )


def ccnet_buckets(sf_dir: str) -> ray.data.Dataset:
    """CCNet-style perplexity bucketing (Wenzek et al. 2020,
    arXiv:1911.00359): per LANGUAGE, split documents into head /
    middle / tail thirds by language-model surprisal — the step CCNet
    uses to route low-perplexity (head) webtext into training and
    quarantine the tail. The LM signal is ``unigram_surprisal``'s
    exact-integer ``mean_bits_e3`` (low bits = well-modeled = head).

    Output: (doc_id, lang, mean_bits_e3, bucket) for every non-empty
    document, bucket in {'head','middle','tail'}.

    Cutoff definition (integer grid, shared verbatim with the SQL
    oracle): within a language of n docs, c1 is the smallest
    mean_bits_e3 value v with ``cum_count(v) * 3 >= n`` and c2 the
    smallest with ``cum_count(v) * 3 >= 2n``; bucket = head if
    v <= c1, middle if v <= c2, else tail. Boundary TIES share a
    bucket (CCNet cuts on the percentile value, not the row).

    Scale shape: cutoffs come from a ``groupby(lang, mean_bits_e3)``
    HISTOGRAM — the driver holds one row per distinct (lang, bits)
    value (bounded by the value grid, not the corpus) exactly like
    ``doc_length_quantiles``; the bucket map is then a broadcast
    lookup inside one streaming ``map_batches`` pass. No corpus-wide
    sort, no per-lang map_groups materialization.
    """
    import numpy as np
    import ray

    from ..tuning import join_partitions as _jp

    jp = _jp()
    docs = read_documents(sf_dir)
    # repartition launders the schema-less empty blocks map_key_groups
    # leaves on sparse corpora (most blocks own no doc group) — an
    # untyped block on either join side raises ArrowInvalid (see the
    # hazard note at dedup.cluster_pairs).
    surp = unigram_surprisal(sf_dir).repartition(jp)

    lang_tbl = docs.map_batches(
        lambda b: b.select(["doc_id", "lang"]), batch_format="pyarrow"
    )
    joined_schema = pa.schema(
        [("doc_id", pa.int64()), ("lang", pa.string()), ("mean_bits_e3", pa.int64())]
    )

    def _project(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0 or "doc_id" not in batch.column_names:
            return joined_schema.empty_table()
        return pa.Table.from_pydict(
            {
                "doc_id": batch.column("doc_id").cast(pa.int64()),
                "lang": batch.column("lang").cast(pa.string()),
                "mean_bits_e3": batch.column("mean_bits_e3").cast(pa.int64()),
            },
            schema=joined_schema,
        )

    # Materialized: both the histogram pass and the bucket map read it,
    # so the surprisal join runs exactly once. Three fixed-width
    # columns per doc — tiny next to the corpus text.
    joined = (
        surp.join(lang_tbl, "inner", jp, on=("doc_id",))
        .map_batches(_project, batch_format="pyarrow")
        .repartition(jp)
        .materialize()
    )

    hist = (
        joined.groupby(["lang", "mean_bits_e3"])
        .count()
        .sort(["lang", "mean_bits_e3"])
        .take_all()
    )
    totals: dict[str, int] = {}
    for r in hist:
        totals[r["lang"]] = totals.get(r["lang"], 0) + r["count()"]
    cuts: dict[str, tuple[int, int]] = {}
    cum: dict[str, int] = {}
    for r in hist:
        lang, v = r["lang"], int(r["mean_bits_e3"])
        c = cum.get(lang, 0) + r["count()"]
        cum[lang] = c
        n = totals[lang]
        c1, c2 = cuts.get(lang, (None, None))
        if c1 is None and c * 3 >= n:
            c1 = v
        if c2 is None and c * 3 >= 2 * n:
            c2 = v
        cuts[lang] = (c1, c2)

    cuts_ref = ray.put(cuts)
    out_schema = joined_schema.append(pa.field("bucket", pa.string()))

    def _bucket(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return out_schema.empty_table()
        cut = ray.get(cuts_ref)
        langs = batch.column("lang").to_pylist()
        bits = batch.column("mean_bits_e3").to_numpy(zero_copy_only=False)
        buckets = [
            "head"
            if v <= cut[l][0]
            else ("middle" if v <= cut[l][1] else "tail")
            for l, v in zip(langs, bits)
        ]
        return batch.append_column("bucket", pa.array(buckets, pa.string()))

    return joined.map_batches(_bucket, batch_format="pyarrow")


DSIR_BUCKETS = 256

# Gram→bucket memo, per worker process (module-level so it survives
# across batches): natural text repeats grams heavily (Zipf), and the
# per-doc Counter already collapses within-doc repeats, so each
# DISTINCT gram is md5-hashed once per worker. Bounded: cleared when
# it outgrows a reasonable working set.
_DSIR_MEMO: dict[str, int] = {}


def _dsir_bucket(g: str) -> int:
    b = _DSIR_MEMO.get(g)
    if b is None:
        from ..functions.hashing import _hash64

        if len(_DSIR_MEMO) > 2_000_000:
            _DSIR_MEMO.clear()
        b = int(_hash64(g)) % DSIR_BUCKETS
        _DSIR_MEMO[g] = b
    return b


def dsir_weights(sf_dir: str) -> ray.data.Dataset:
    """DSIR-style importance weights (Data Selection via Importance
    Resampling — Xie et al. 2023, arXiv:2302.03169): score every raw
    document by how much more likely it is under a TARGET distribution
    than under the raw corpus, using hashed n-gram bag-of-words models.
    Documents with positive weight look like the target; importance
    resampling then samples proportionally to exp(weight).

    Frozen deterministic instantiation (mirrored bit-for-bit in SQL):

      * features: unigrams + bigrams of the whitespace tokens, hashed
        into ``DSIR_BUCKETS`` (256) buckets via
        ``_hash64(gram) % 256`` (== DuckDB ``md5_number_lower``);
      * target set: documents passing ``quality_filter`` (the shared
        ``quality_reason`` rule chain) — DSIR's "formal text" target
        stood in by the quality gate so the op needs no external data;
      * integer log-probability surrogate (same ``bit_length`` grid as
        ``unigram_surprisal``), Laplace-smoothed:
        ``bits_x(b) = bit_length(A_x // (cnt_x(b)+1))``,
        ``A_x = total grams in x + 256``;
      * per doc: ``weight_bits = Σ_b c_b(doc) · (bits_raw(b) −
        bits_target(b))`` — ≈ log2 p_target(doc)/p_raw(doc).

    Output: (doc_id, n_grams, weight_bits) for every document with at
    least one token.

    Scale shape: TWO streaming passes over the text, zero corpus-scale
    shuffles. Pass 1 bincounts gram buckets per batch (a 256-row
    partial per batch) and a ``groupby(bucket)`` reduces to exactly
    256 rows — the only driver state. The 256-entry delta table is
    broadcast via ``ray.put`` and pass 2 scores each doc locally.
    """
    import numpy as np
    import ray

    from ..functions.hashing import _hash64
    from ..functions.textstats import _TOKEN_RE

    B = DSIR_BUCKETS
    docs = read_documents(sf_dir)

    def _bucket_counts(text: str) -> np.ndarray:
        from collections import Counter

        toks = _TOKEN_RE.findall(text)
        counts = np.zeros(B, np.int64)
        grams = Counter(toks)
        grams.update(map(" ".join, zip(toks, toks[1:])))
        for g, c in grams.items():
            counts[_dsir_bucket(g)] += c
        return counts

    cnt_schema = pa.schema(
        [("bucket", pa.int64()), ("c_raw", pa.int64()), ("c_tgt", pa.int64())]
    )

    def _partial(batch: pa.Table) -> pa.Table:
        raw = np.zeros(B, np.int64)
        tgt = np.zeros(B, np.int64)
        for text, lang in zip(
            batch.column("text").to_pylist(), batch.column("lang").to_pylist()
        ):
            c = _bucket_counts(text or "")
            raw += c
            if quality_reason(text or "", lang) == "":
                tgt += c
        return pa.Table.from_pydict(
            {
                "bucket": pa.array(np.arange(B), pa.int64()),
                "c_raw": pa.array(raw, pa.int64()),
                "c_tgt": pa.array(tgt, pa.int64()),
            },
            schema=cnt_schema,
        )

    cnt_rows = (
        docs.map_batches(_partial, batch_format="pyarrow")
        .groupby("bucket")
        .sum(["c_raw", "c_tgt"])
        .take_all()
    )
    c_raw = np.zeros(B, np.int64)
    c_tgt = np.zeros(B, np.int64)
    for r in cnt_rows:
        c_raw[r["bucket"]] = r["sum(c_raw)"]
        c_tgt[r["bucket"]] = r["sum(c_tgt)"]
    a_raw = int(c_raw.sum()) + B
    a_tgt = int(c_tgt.sum()) + B

    def _bits(a_total: int, cnt: np.ndarray) -> np.ndarray:
        # bit_length via the frexp exponent: exact for ints < 2^53.
        return np.frexp((a_total // (cnt + 1)).astype(np.float64))[1].astype(np.int64)

    delta = _bits(a_raw, c_raw) - _bits(a_tgt, c_tgt)
    delta_ref = ray.put(delta)

    out_schema = pa.schema(
        [("doc_id", pa.int64()), ("n_grams", pa.int64()), ("weight_bits", pa.int64())]
    )

    def _score(batch: pa.Table) -> pa.Table:
        d = ray.get(delta_ref)
        ids, n_grams, weights = [], [], []
        for doc_id, text in zip(
            batch.column("doc_id").to_pylist(), batch.column("text").to_pylist()
        ):
            c = _bucket_counts(text or "")
            n = int(c.sum())
            if n == 0:
                continue
            ids.append(int(doc_id))
            n_grams.append(n)
            weights.append(int(np.dot(c, d)))
        return pa.Table.from_pydict(
            {
                "doc_id": pa.array(ids, pa.int64()),
                "n_grams": pa.array(n_grams, pa.int64()),
                "weight_bits": pa.array(weights, pa.int64()),
            },
            schema=out_schema,
        )

    return docs.map_batches(_score, batch_format="pyarrow")


CMS_DEPTH = 4
CMS_WIDTH = 1024


def cms_heavy_hitters(sf_dir: str, k: int = 20) -> "pa.Table":
    """Count-min-sketch frequency estimates for the corpus's top-k
    tokens (Cormode & Muthukrishnan 2005) — the streaming heavy-hitter
    primitive a 100-TB pipeline uses when the exact vocabulary groupby
    is too wide: a fixed ``CMS_DEPTH × CMS_WIDTH`` counter grid absorbs
    any token stream, and estimates only ever OVER-count
    (``cms_est >= exact_cnt``).

    Frozen arithmetic (mirrored in SQL): row j of the sketch indexes
    token t at ``(_hash64(t) >> 16·j) % 1024`` (== DuckDB
    ``(md5_number_lower // 2^(16j)) % 1024``); tokens are the
    ``lower().split()`` stream (same tokenization as ``top_ngrams``).
    Candidates are the EXACT top-k unigrams (count desc, term asc), so
    the output pins both the sketch and its error against truth:

        (term, exact_cnt, cms_est)

    Scale shape: one streaming pass emits ≤4096 partial cell rows per
    batch (per-batch Counter collapse first); a ``groupby(row, col)``
    reduces to exactly 4096 driver-held ints regardless of corpus or
    vocabulary size. The exact candidate list reuses ``top_ngrams``'s
    distinct-per-block combine. No broadcast, no corpus shuffle.
    """
    import numpy as np

    from ..functions.hashing import _hash64

    D, W = CMS_DEPTH, CMS_WIDTH
    docs = read_documents(sf_dir)

    cell_schema = pa.schema(
        [("row", pa.int64()), ("col", pa.int64()), ("cell", pa.int64())]
    )

    def _cells(batch: pa.Table) -> pa.Table:
        # Vectorized token counting (value_counts over the stream);
        # the residual _hash64 loop runs once per DISTINCT term per
        # block (vocabulary-bounded), and the D-row sketch update is
        # one np.add.at per row over all terms at once.
        grid = np.zeros((D, W), np.int64)
        toks, _ = _arrow_token_stream(batch)
        if len(toks):
            vc = pc.value_counts(toks)
            counts = vc.field("counts").to_numpy(zero_copy_only=False)
            hashes = np.array(
                [int(_hash64(t)) for t in vc.field("values").to_pylist()],
                dtype=np.uint64,
            )
            for j in range(D):
                cols_j = ((hashes >> np.uint64(16 * j)) % np.uint64(W)).astype(
                    np.int64
                )
                np.add.at(grid[j], cols_j, counts)
        rows, cols = np.nonzero(grid)
        return pa.Table.from_pydict(
            {
                "row": pa.array(rows, pa.int64()),
                "col": pa.array(cols, pa.int64()),
                "cell": pa.array(grid[rows, cols], pa.int64()),
            },
            schema=cell_schema,
        )

    cell_rows = (
        docs.map_batches(_cells, batch_format="pyarrow")
        .groupby(["row", "col"])
        .sum("cell")
        .take_all()
    )
    grid = np.zeros((D, W), np.int64)
    for r in cell_rows:
        grid[r["row"], r["col"]] = r["sum(cell)"]

    cand = top_ngrams(sf_dir, n=1, k=k).take_all()
    terms = [r["ngram"] for r in cand]
    exact = [int(r["cnt"]) for r in cand]
    ests = []
    for t in terms:
        h = int(_hash64(t))
        ests.append(int(min(grid[j, (h >> (16 * j)) % W] for j in range(D))))
    return pa.Table.from_pydict(
        {
            "term": pa.array(terms, pa.string()),
            "exact_cnt": pa.array(exact, pa.int64()),
            "cms_est": pa.array(ests, pa.int64()),
        }
    )


def bpe_pair_counts(sf_dir: str, k: int = 20) -> ray.data.Dataset:
    """The first BPE merge round of tokenizer training (Sennrich et al.
    2016, arXiv:1508.07909): corpus-wide counts of ADJACENT SYMBOL
    PAIRS inside words, whose argmax is the first merge a BPE
    tokenizer learns. Words are the lowercased whitespace tokens;
    symbols are their characters; a word occurring c times contributes
    c to each of its adjacent pairs (standard BPE counting). Output:
    the top-k pairs, (pair, cnt), count desc / pair asc.

    Scale shape (the tokenizer-training primitive at corpus scale):
    per-batch word Counter → per-word pair expansion into a pair
    Counter — both collapse repeats before anything leaves the task —
    then ONE ``groupby(pair)`` sum over the distinct-pair-per-block
    partials and a tiny top-k sort. The corpus text never shuffles,
    and the pair table is alphabet²-bounded per block.
    """
    from ray.data.aggregate import Sum

    def _partial(batch: pa.Table) -> pa.Table:
        from collections import Counter

        # Vectorized word counting (value_counts over the token
        # stream); the residual Python loop runs over DISTINCT words
        # only — vocabulary-bounded per block, not token-bounded.
        toks, _ = _arrow_token_stream(batch)
        vc = pc.value_counts(toks) if len(toks) else None
        pairs: Counter = Counter()
        if vc is not None:
            for w, c in zip(
                vc.field("values").to_pylist(), vc.field("counts").to_pylist()
            ):
                for a, b in zip(w, w[1:]):
                    pairs[a + b] += c
        return pa.Table.from_pydict(
            {
                "pair": pa.array(list(pairs.keys()), pa.string()),
                "cnt": pa.array(list(pairs.values()), pa.int64()),
            }
        )

    return (
        read_documents(sf_dir)
        .map_batches(_partial, batch_format="pyarrow")
        .groupby("pair")
        .aggregate(Sum("cnt", alias_name="cnt"))
        .sort(["cnt", "pair"], descending=[True, False])
        .limit(k)
    )


def pmi_pairs(
    sf_dir: str, window: int = 2, min_count: int = 5, k: int = 100
) -> ray.data.Dataset:
    """Skip-gram PMI co-occurrence pairs — the word2vec/GloVe
    preprocessing sweep (Church & Hanks 1990; Mikolov et al. 2013):
    which word pairs co-occur within a ±``window`` token window far
    more often than chance. Tokens are lowercased whitespace tokens;
    pairs are unordered (w1 ≤ w2); a pair must reach ``min_count``
    corpus occurrences (the standard rare-pair PMI mitigation).

    PMI is kept on an exact integer grid so the driver's value-hash
    gate applies: with T = corpus token total, P = corpus pair total,
    num = c_xy·T², den = P·c_x·c_y,

        pmi_bits =  bit_length(num // den)   if num ≥ den   (≥ +1)
                   −bit_length(den // num)   otherwise      (≤ −1)

    an integer ⌊log2⌋+1 surrogate for PMI(x,y), exact on both engines
    (Python big ints here; HUGEINT products + ``to_base`` on the
    BIGINT-sized ratio in DuckDB — products can pass 2^63 but the
    ratio cannot).

    Scale shape: per-block pair/unigram Counters collapse repeats
    before the shuffle (the pair table is vocab²-bounded per block,
    vocab-bounded after min_count); totals T and P are two scalars off
    the materialized aggregate tables; unigram counts join back onto
    the qualifying pairs with a distributed hash join keyed on each
    side in turn (never broadcast — real-webtext vocabulary is
    corpus-scale). Output: top-k by (pmi_bits desc, pair_cnt desc,
    pair asc): (w1, w2, pair_cnt, c1, c2, pmi_bits).
    """
    from ..tuning import join_partitions as _jp
    from .grouped import rename_agg

    jp = _jp()
    docs = read_documents(sf_dir)

    pair_schema = pa.schema(
        [("w1", pa.string()), ("w2", pa.string()), ("cnt", pa.int64())]
    )
    uni_schema = pa.schema([("term", pa.string()), ("cnt", pa.int64())])

    def _pair_partial(batch: pa.Table) -> pa.Table:
        # Vectorized skip-gram sweep: for each offset d, one pair of
        # array slices + same-parent mask; canonical (w1 <= w2) order
        # via min/max_element_wise (UTF-8 byte order == Python string
        # order); counting via Arrow's C++ group_by.
        toks, par = _arrow_token_stream(batch)
        m = len(toks)
        parts = []
        for d in range(1, window + 1):
            if m <= d:
                break
            a, b = toks.slice(0, m - d), toks.slice(d)
            same = pc.equal(par.slice(0, m - d), par.slice(d))
            a, b = a.filter(same), b.filter(same)
            parts.append(
                pa.table(
                    {
                        "w1": pc.min_element_wise(a, b),
                        "w2": pc.max_element_wise(a, b),
                    }
                )
            )
        if not parts:
            return pair_schema.empty_table()
        agg = (
            pa.concat_tables(parts)
            .group_by(["w1", "w2"])
            .aggregate([([], "count_all")])
        )
        return agg.rename_columns(["w1", "w2", "cnt"]).cast(pair_schema)

    def _uni_partial(batch: pa.Table) -> pa.Table:
        toks, _ = _arrow_token_stream(batch)
        if len(toks) == 0:
            return uni_schema.empty_table()
        vc = pc.value_counts(toks)
        return pa.Table.from_arrays(
            [vc.field("values"), vc.field("counts")], schema=uni_schema
        )

    pairs = rename_agg(
        docs.map_batches(_pair_partial, batch_format="pyarrow")
        .groupby(["w1", "w2"])
        .sum("cnt"),
        {"sum(cnt)": "pair_cnt"},
        jp,
    ).materialize()
    cf = rename_agg(
        docs.map_batches(_uni_partial, batch_format="pyarrow").groupby("term").sum("cnt"),
        {"sum(cnt)": "cf"},
        jp,
    ).materialize()

    out_schema = pa.schema(
        [
            ("w1", pa.string()),
            ("w2", pa.string()),
            ("pair_cnt", pa.int64()),
            ("c1", pa.int64()),
            ("c2", pa.int64()),
            ("pmi_bits", pa.int64()),
        ]
    )

    p_total = int(pairs.sum("pair_cnt") or 0)
    t_total = int(cf.sum("cf") or 0)
    if p_total == 0:
        return ray.data.from_arrow(out_schema.empty_table())

    qualifying = pairs.filter(expr=f"pair_cnt >= {int(min_count)}")

    def _rn(old: str, new: str):
        def _f(b: pa.Table) -> pa.Table:
            return b.rename_columns([new if c == old else c for c in b.column_names])

        return _f

    j1 = qualifying.join(
        cf.map_batches(_rn("term", "w1"), batch_format="pyarrow"), "inner", jp, on=("w1",)
    ).map_batches(_rn("cf", "c1"), batch_format="pyarrow")
    j2 = j1.join(
        cf.map_batches(_rn("term", "w2"), batch_format="pyarrow"), "inner", jp, on=("w2",)
    ).map_batches(_rn("cf", "c2"), batch_format="pyarrow")

    def _pmi(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return out_schema.empty_table()
        # Python big ints: num = c_xy*T^2 can pass 2^63 at corpus
        # scale; this loop runs over the qualifying-pair table (vocab-
        # bounded), never the corpus.
        bits = []
        for c_xy, c_x, c_y in zip(
            batch.column("pair_cnt").to_pylist(),
            batch.column("c1").to_pylist(),
            batch.column("c2").to_pylist(),
        ):
            num = c_xy * t_total * t_total
            den = p_total * c_x * c_y
            bits.append(
                (num // den).bit_length() if num >= den else -((den // num).bit_length())
            )
        return pa.Table.from_pydict(
            {
                "w1": batch.column("w1"),
                "w2": batch.column("w2"),
                "pair_cnt": batch.column("pair_cnt").cast(pa.int64()),
                "c1": batch.column("c1").cast(pa.int64()),
                "c2": batch.column("c2").cast(pa.int64()),
                "pmi_bits": pa.array(bits, pa.int64()),
            },
            schema=out_schema,
        )

    return (
        j2.map_batches(_pmi, batch_format="pyarrow")
        .sort(["pmi_bits", "pair_cnt", "w1", "w2"], descending=[True, True, False, False])
        .limit(k)
    )


def bpe_merges(sf_dir: str, rounds: int = 6) -> ray.data.Dataset:
    """Iterative BPE tokenizer training (Sennrich et al. 2016,
    arXiv:1508.07909) — ``rounds`` merge rounds, not just the first
    (``bpe_pair_counts``). Vocabulary: lowercased whitespace tokens
    matching ``[a-z]+`` (keeps symbols free of the oracle's delimiter
    and mirrors standard alphabetic pretokenization); each word starts
    as its character sequence; every round counts adjacent symbol
    pairs weighted by word frequency, merges the argmax pair (count
    desc, (left, right) asc), and rewrites every word's symbols with
    the standard greedy left-to-right application. SELF-PAIRS (left ==
    right) are counted but never selected — documented variant: the
    SQL oracle applies merges with two ``replace`` passes over a
    delimiter-encoded symbol string, which provably reaches the greedy
    fixpoint for left ≠ right but diverges on runs of a self-pair.

    Scale shape: the CORPUS shuffles once (the distinct-word count);
    every round then operates on the vocabulary-bounded word table —
    a Counter partial per block, one pair-keyed groupby sum, a k=1
    argmax (driver-side single row, the only driver state), and a
    broadcast merge applied per block. State (word, c, syms) is
    materialized per round so round r+1 never re-runs rounds 1..r.

    Output: (round, left_sym, right_sym, cnt) for each performed
    merge; training stops early when no non-self pair remains.
    """
    from collections import Counter

    from ..tuning import join_partitions as _jp
    from .grouped import rename_agg

    docs = read_documents(sf_dir)

    wc_schema = pa.schema([("word", pa.string()), ("c", pa.int64())])

    def _wcount(batch: pa.Table) -> pa.Table:
        # Vectorized: token stream → RE2 [a-z]+ fullmatch filter →
        # value_counts (replaces the per-token Counter loop).
        toks, _ = _arrow_token_stream(batch)
        if len(toks) == 0:
            return wc_schema.empty_table()
        toks = _flat(toks.filter(pc.match_substring_regex(toks, r"^[a-z]+$")))
        if len(toks) == 0:
            return wc_schema.empty_table()
        vc = pc.value_counts(toks)
        return pa.Table.from_arrays(
            [vc.field("values"), vc.field("counts")], schema=wc_schema
        )

    words = rename_agg(
        docs.map_batches(_wcount, batch_format="pyarrow").groupby("word").sum("c"),
        {"sum(c)": "c"},
        _jp(),
    )

    state_schema = pa.schema(
        [("word", pa.string()), ("c", pa.int64()), ("syms", pa.list_(pa.string()))]
    )

    def _init(batch: pa.Table) -> pa.Table:
        ws = batch.column("word").to_pylist()
        return pa.Table.from_pydict(
            {"word": batch.column("word"), "c": batch.column("c"),
             "syms": pa.array([list(w) for w in ws], pa.list_(pa.string()))},
            schema=state_schema,
        )

    state = words.map_batches(_init, batch_format="pyarrow").materialize()

    out_schema = pa.schema(
        [
            ("round", pa.int64()),
            ("left_sym", pa.string()),
            ("right_sym", pa.string()),
            ("cnt", pa.int64()),
        ]
    )
    pc_schema = pa.schema([("pair", pa.string()), ("cnt", pa.int64())])

    def _pair_partial(batch: pa.Table) -> pa.Table:
        c: Counter = Counter()
        for syms, wc in zip(
            batch.column("syms").to_pylist(), batch.column("c").to_pylist()
        ):
            for a, b in zip(syms, syms[1:]):
                c[a + " " + b] += wc
        return pa.Table.from_pydict(
            {"pair": pa.array(list(c.keys()), pa.string()),
             "cnt": pa.array(list(c.values()), pa.int64())},
            schema=pc_schema,
        )

    merges = []
    for rnd in range(1, rounds + 1):
        counts = rename_agg(
            state.map_batches(_pair_partial, batch_format="pyarrow")
            .groupby("pair")
            .sum("cnt"),
            {"sum(cnt)": "cnt"},
            _jp(),
        )
        def _drop_self(batch: pa.Table) -> pa.Table:
            if batch.num_rows == 0:
                return pc_schema.empty_table()
            parts = pa.compute.split_pattern(batch.column("pair"), " ")
            mask = pa.compute.not_equal(
                pa.compute.list_element(parts, 0), pa.compute.list_element(parts, 1)
            )
            return batch.filter(mask)

        top = (
            counts.map_batches(_drop_self, batch_format="pyarrow")
            .sort(["cnt", "pair"], descending=[True, False])
            .limit(1)
            .take_all()
        )
        if not top:
            break
        left, right = top[0]["pair"].split(" ")
        merges.append((rnd, left, right, int(top[0]["cnt"])))

        def _apply(batch: pa.Table, a=left, b=right) -> pa.Table:
            out = []
            for syms in batch.column("syms").to_pylist():
                res, i, n = [], 0, len(syms)
                while i < n:
                    if i + 1 < n and syms[i] == a and syms[i + 1] == b:
                        res.append(a + b)
                        i += 2
                    else:
                        res.append(syms[i])
                        i += 1
                out.append(res)
            return pa.Table.from_pydict(
                {"word": batch.column("word"), "c": batch.column("c"),
                 "syms": pa.array(out, pa.list_(pa.string()))},
                schema=state_schema,
            )

        state = state.map_batches(_apply, batch_format="pyarrow").materialize()

    if not merges:
        return ray.data.from_arrow(out_schema.empty_table())
    return ray.data.from_arrow(
        pa.Table.from_pydict(
            {
                "round": pa.array([m[0] for m in merges], pa.int64()),
                "left_sym": pa.array([m[1] for m in merges], pa.string()),
                "right_sym": pa.array([m[2] for m in merges], pa.string()),
                "cnt": pa.array([m[3] for m in merges], pa.int64()),
            },
            schema=out_schema,
        )
    )


PHRASE_QUERY: tuple[str, str] = ("window", "join")


def phrase_search(sf_dir: str, phrase: tuple[str, str] = PHRASE_QUERY) -> ray.data.Dataset:
    """Positional-index phrase search: documents containing the exact
    adjacent phrase ``w1 w2``, found by intersecting per-term postings
    — the inverted-index shape, not a text re-scan. Output:
    (doc_id, n_hits) for docs with ≥1 occurrence.

    Scale shape: postings (doc_id, term, pos) are emitted ONLY for the
    query's terms at tokenize time, so the shuffle moves O(matching
    tokens), not O(corpus); the per-doc intersection is a vectorized
    ``np.intersect1d(pos1 + 1, pos2)`` inside ``map_key_groups`` (docs
    lacking either term never reach the UDF via min_group_size=2). At
    an index-serving deployment the same postings would be keyed by
    (term, doc-range) buckets; doc-keyed grouping is the right shape
    for the one-shot search this op implements.
    """
    import numpy as np

    from .grouped import map_key_groups

    w1, w2 = phrase
    docs = read_documents(sf_dir)

    post_schema = pa.schema(
        [("doc_id", pa.int64()), ("term", pa.string()), ("pos", pa.int64())]
    )
    out_schema = pa.schema([("doc_id", pa.int64()), ("n_hits", pa.int64())])

    def _postings(batch: pa.Table) -> pa.Table:
        ids, terms, poss = [], [], []
        for d, t in zip(
            batch.column("doc_id").to_pylist(), batch.column("text").to_pylist()
        ):
            for i, tok in enumerate((t or "").lower().split()):
                if tok == w1 or tok == w2:
                    ids.append(int(d))
                    terms.append(tok)
                    poss.append(i + 1)  # 1-based, matches the SQL unnest
        return pa.Table.from_pydict(
            {
                "doc_id": pa.array(ids, pa.int64()),
                "term": pa.array(terms, pa.string()),
                "pos": pa.array(poss, pa.int64()),
            },
            schema=post_schema,
        )

    def _match(group: pa.Table) -> pa.Table:
        if group.num_rows == 0:
            return out_schema.empty_table()
        terms = group.column("term").to_pylist()
        pos = group.column("pos").to_numpy(zero_copy_only=False)
        p1 = pos[[t == w1 for t in terms]]
        p2 = pos[[t == w2 for t in terms]]
        hits = np.intersect1d(p1 + 1, p2).size
        if hits == 0:
            return out_schema.empty_table()
        return pa.Table.from_pydict(
            {
                "doc_id": group.column("doc_id").slice(0, 1),
                "n_hits": pa.array([hits], pa.int64()),
            },
            schema=out_schema,
        )

    postings = docs.map_batches(_postings, batch_format="pyarrow")
    return map_key_groups(postings, "doc_id", _match, min_group_size=2)


def dataset_split(
    sf_dir: str, salt: str = "split-v1", val_permille: int = 10, test_permille: int = 10
) -> ray.data.Dataset:
    """Deterministic train/val/test assignment — the hash-based split
    every training pipeline needs (stable under re-runs, resharding,
    and corpus growth; a doc's split never depends on which other docs
    exist). bucket = md5-derived 64-bit hash of ``salt:doc_id`` mod
    1000; the top ``test_permille`` buckets are test, the next
    ``val_permille`` val, the rest train.

    Pure stateless map — no shuffle, no driver state; exactly DuckDB-
    expressible via ``md5_number_lower``. Output: (doc_id, bucket,
    split).
    """
    from ..functions.textstats import _kgram_hash64

    docs = read_documents(sf_dir)
    lo_test = 1000 - int(test_permille)
    lo_val = lo_test - int(val_permille)

    out_schema = pa.schema(
        [("doc_id", pa.int64()), ("bucket", pa.int64()), ("split", pa.string())]
    )

    def _assign(batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_pylist()
        buckets = [_kgram_hash64(f"{salt}:{int(d)}") % 1000 for d in ids]
        split = [
            "test" if b >= lo_test else ("val" if b >= lo_val else "train")
            for b in buckets
        ]
        return pa.Table.from_pydict(
            {
                "doc_id": batch.column("doc_id").cast(pa.int64()),
                "bucket": pa.array(buckets, pa.int64()),
                "split": pa.array(split, pa.string()),
            },
            schema=out_schema,
        )

    return docs.map_batches(_assign, batch_format="pyarrow")


def cluster_safe_split(
    sf_dir: str,
    salt: str = "split-v1",
    val_permille: int = 10,
    test_permille: int = 10,
    threshold: float = 0.7,
) -> ray.data.Dataset:
    """Leakage-safe train/val/test assignment: ``dataset_split``'s hash
    rule keyed by the document's NEAR-DUP CLUSTER representative
    instead of its own id, so an entire MinHash near-duplicate cluster
    always lands in ONE split — the classic eval-leakage bug (a test
    document's near-copy in train) is impossible by construction.
    Singleton documents key by their own id, making this a strict
    superset of ``dataset_split``'s guarantees with identical marginal
    split rates.

    Frozen semantics (mirrored by the SQL oracle): ``group_id =
    cluster_id`` from ``dedup_clusters`` when the doc is in a near-dup
    cluster else ``doc_id``; ``bucket = md5-hash(salt:group_id) %
    1000``; same permille thresholds as ``dataset_split``.

    Scale shape: the cluster table holds only near-dup members (far
    smaller than the corpus) and attaches via ONE left_outer join;
    the split map is stateless. Empty cluster tables branch around the
    schema-less-empty-join hazard (the ``dedup_survivors`` idiom).
    """
    from ..functions.textstats import _kgram_hash64
    from ..tuning import join_partitions as _jp
    from .dedup import dedup_clusters

    jp = _jp()
    lo_test = 1000 - int(test_permille)
    lo_val = lo_test - int(val_permille)

    out_schema = pa.schema(
        [
            ("doc_id", pa.int64()),
            ("group_id", pa.int64()),
            ("bucket", pa.int64()),
            ("split", pa.string()),
        ]
    )

    cluster_schema = pa.schema([("doc_id", pa.int64()), ("cluster_id", pa.int64())])

    def _retype(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0 or "doc_id" not in batch.column_names:
            return cluster_schema.empty_table()
        return pa.Table.from_pydict(
            {
                "doc_id": batch.column("doc_id").cast(pa.int64()),
                "cluster_id": batch.column("cluster_id").cast(pa.int64()),
            },
            schema=cluster_schema,
        )

    clusters = (
        dedup_clusters(sf_dir, threshold=threshold)
        .map_batches(_retype, batch_format="pyarrow")
        .repartition(jp)
        .materialize()
    )

    joined = read_documents(sf_dir).map_batches(
        lambda b: b.select(["doc_id"]), batch_format="pyarrow"
    )
    if clusters.count() > 0:
        joined = joined.join(clusters, "left_outer", jp, on=("doc_id",))

    def _assign(batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_pylist()
        cl = (
            batch.column("cluster_id").to_pylist()
            if "cluster_id" in batch.column_names
            else [None] * len(ids)
        )
        groups = [int(c) if c is not None else int(d) for d, c in zip(ids, cl)]
        buckets = [_kgram_hash64(f"{salt}:{g}") % 1000 for g in groups]
        split = [
            "test" if b >= lo_test else ("val" if b >= lo_val else "train")
            for b in buckets
        ]
        return pa.Table.from_pydict(
            {
                "doc_id": pa.array([int(d) for d in ids], pa.int64()),
                "group_id": pa.array(groups, pa.int64()),
                "bucket": pa.array(buckets, pa.int64()),
                "split": pa.array(split, pa.string()),
            },
            schema=out_schema,
        )

    return joined.map_batches(_assign, batch_format="pyarrow")


def bpe_encode(sf_dir: str, rounds: int = 6) -> ray.data.Dataset:
    """Apply the corpus-trained BPE merge table (``bpe_merges``,
    Sennrich et al. 2016) back onto every document — the tokenizer
    train→encode loop a training-data pipeline runs to budget sequence
    lengths before packing. Vocabulary and merge application are
    exactly ``bpe_merges``'s: lowercased whitespace tokens matching
    ``[a-z]+``, each merge applied greedily left-to-right in training
    order. Output per document: (doc_id, n_words, n_tokens) — the
    alpha-word count (with multiplicity) and the total BPE symbol
    count after all merges. Docs with no alpha words report (0, 0).

    Scale shape: training happens once (the ``bpe_merges`` pipeline —
    vocabulary-bounded rounds); the merge table (``rounds`` rows) is a
    driver-side constant closed over by a stateless ``map_batches``
    encode pass, with a per-worker word→token-count memo so repeated
    words across a block cost one merge walk. Nothing but the final
    (doc_id, two ints) rows leaves the encode task.
    """
    merges = [
        (r["left_sym"], r["right_sym"])
        for r in sorted(bpe_merges(sf_dir, rounds).take_all(), key=lambda r: r["round"])
    ]

    out_schema = pa.schema(
        [("doc_id", pa.int64()), ("n_words", pa.int64()), ("n_tokens", pa.int64())]
    )

    import re as _re

    word_re = _re.compile(r"[a-z]+$")

    def _encode_len(word: str, memo: dict) -> int:
        n = memo.get(word)
        if n is not None:
            return n
        syms = list(word)
        for a, b in merges:
            res, i, ln = [], 0, len(syms)
            while i < ln:
                if i + 1 < ln and syms[i] == a and syms[i + 1] == b:
                    res.append(a + b)
                    i += 2
                else:
                    res.append(syms[i])
                    i += 1
            syms = res
        memo[word] = len(syms)
        return memo[word]

    memo: dict[str, int] = {}

    def _batch(batch: pa.Table) -> pa.Table:
        n_words, n_tokens = [], []
        for t in batch.column("text").to_pylist():
            ws = [w for w in (t or "").lower().split() if word_re.match(w)]
            n_words.append(len(ws))
            n_tokens.append(sum(_encode_len(w, memo) for w in ws))
        return pa.Table.from_pydict(
            {
                "doc_id": batch.column("doc_id").cast(pa.int64()),
                "n_words": pa.array(n_words, pa.int64()),
                "n_tokens": pa.array(n_tokens, pa.int64()),
            },
            schema=out_schema,
        )

    return read_documents(sf_dir).map_batches(_batch, batch_format="pyarrow")


def curriculum_rank(sf_dir: str, bucket: int = 4096) -> ray.data.Dataset:
    """Global curriculum ordering — every document's exact 1-based rank
    in the corpus-wide training order (here: English stopword density
    desc — a fluency proxy — ties → doc_id asc), the placement pass a
    curriculum-learning loader runs before sharding. The interesting
    part at scale is assigning a GLOBAL dense rank without any driver
    materialization or sequential scan: the same two-level distributed
    prefix sum as ``token_packing``, but over the VALUE distribution
    instead of the doc_id axis.

      1. one streaming pass computes the exact integer score
         ``stop_density_e6 = (1e6·stop_hits_en)//n_tokens`` (0 for
         empty docs) and its coarse value bucket ``sde6 // bucket``;
      2. a bucket-count groupby reduces to ≤ 1e6/bucket rows; the
         driver prefix-sums them in score-desc order and broadcasts
         per-bucket rank offsets;
      3. one ``map_key_groups`` pass per bucket sorts its rows
         (sde6 desc, doc_id asc) and adds the offset.

    Output: (doc_id, stop_density_e6, rank). Exact at any parallelism;
    driver state is O(1e6 / bucket) ints regardless of corpus size.
    """
    import numpy as np

    from ..functions.textstats import stopword_hits, token_count
    from .grouped import map_key_groups

    docs = read_documents(sf_dir)

    sc_schema = pa.schema(
        [("doc_id", pa.int64()), ("b", pa.int64()), ("stop_density_e6", pa.int64())]
    )
    out_schema = pa.schema(
        [("doc_id", pa.int64()), ("stop_density_e6", pa.int64()), ("rank", pa.int64())]
    )

    def _score(batch: pa.Table) -> pa.Table:
        ids, bs, ss = [], [], []
        for d, t in zip(
            batch.column("doc_id").to_pylist(), batch.column("text").to_pylist()
        ):
            t = t or ""
            n = token_count(t)
            sde6 = (1_000_000 * stopword_hits(t, "en")) // n if n else 0
            ids.append(int(d))
            bs.append(sde6 // bucket)
            ss.append(sde6)
        return pa.Table.from_pydict(
            {
                "doc_id": pa.array(ids, pa.int64()),
                "b": pa.array(bs, pa.int64()),
                "stop_density_e6": pa.array(ss, pa.int64()),
            },
            schema=sc_schema,
        )

    scored = docs.map_batches(_score, batch_format="pyarrow").materialize()

    bucket_rows = sorted(
        scored.groupby("b").count().take_all(), key=lambda r: -r["b"]
    )  # rank order is score DESC, so higher buckets rank first
    offs = {}
    acc = 0
    for r in bucket_rows:
        offs[int(r["b"])] = acc
        acc += int(r["count()"])
    off_ref = ray.put(offs)

    def _rank(group: pa.Table) -> pa.Table:
        if group.num_rows == 0:
            return out_schema.empty_table()
        off_map = ray.get(off_ref)
        g = group.combine_chunks()
        sde = g.column("stop_density_e6").to_numpy(zero_copy_only=False)
        ids = g.column("doc_id").to_numpy(zero_copy_only=False)
        order = np.lexsort((ids, -sde))
        base = off_map[int(g.column("b")[0].as_py())]
        ranks = np.empty(len(order), dtype=np.int64)
        ranks[order] = base + 1 + np.arange(len(order))
        return pa.Table.from_pydict(
            {
                "doc_id": g.column("doc_id"),
                "stop_density_e6": g.column("stop_density_e6"),
                "rank": pa.array(ranks, pa.int64()),
            },
            schema=out_schema,
        )

    return map_key_groups(scored, "b", _rank)


def repetition_strip(sf_dir: str, line_tokens: int = 2) -> ray.data.Dataset:
    """Intra-document duplicate-line removal, keeping the FIRST copy —
    the within-document half of the CCNet/RefinedWeb repetition cleanup
    (``line_dedup`` is the cross-corpus half): navigation menus, footer
    blocks and scraper echo repeat INSIDE one page, and stripping them
    needs no corpus state at all.

    A "line" is a fixed window of ``line_tokens`` whitespace tokens
    (the synthetic corpus has no newlines; at the default of 2 the
    corpus exhibits real intra-doc repeats — ~35% of documents at
    sf0.001 — so the keep-first path is genuinely exercised). Later
    copies of a line already seen in the SAME document are dropped;
    kept lines are rejoined with '\\n' in original order.

    Output: (doc_id, n_lines, n_removed, cleaned_md5) — one row per
    document ('' cleans to md5('') for empty docs).

    Scale shape: a stateless ``map_batches`` pass — every document is
    cleaned locally with a per-doc seen-set; zero shuffles, zero
    broadcast state, streams at any corpus size.
    """
    from ..functions.textstats import _TOKEN_RE, content_md5

    out_schema = pa.schema(
        [
            ("doc_id", pa.int64()),
            ("n_lines", pa.int64()),
            ("n_removed", pa.int64()),
            ("cleaned_md5", pa.string()),
        ]
    )

    def _batch(batch: pa.Table) -> pa.Table:
        n_lines_col, n_removed_col, md5_col = [], [], []
        for t in batch.column("text").to_pylist():
            toks = _TOKEN_RE.findall(t or "")
            n = (len(toks) + line_tokens - 1) // line_tokens
            seen: set[str] = set()
            kept: list[str] = []
            for i in range(n):
                line = " ".join(toks[i * line_tokens : (i + 1) * line_tokens])
                if line in seen:
                    continue
                seen.add(line)
                kept.append(line)
            n_lines_col.append(n)
            n_removed_col.append(n - len(kept))
            md5_col.append(content_md5("\n".join(kept)))
        return pa.Table.from_pydict(
            {
                "doc_id": batch.column("doc_id"),
                "n_lines": pa.array(n_lines_col, pa.int64()),
                "n_removed": pa.array(n_removed_col, pa.int64()),
                "cleaned_md5": pa.array(md5_col, pa.string()),
            },
            schema=out_schema,
        )

    return read_documents(sf_dir).map_batches(_batch, batch_format="pyarrow")


FT_BUCKETS = 1024

# Distinct-gram → bucket memo, per worker process (same rationale and
# bound as _DSIR_MEMO: Zipfian gram reuse makes the md5 per distinct
# gram, not per occurrence).
_FT_MEMO: dict[str, int] = {}


def _ft_bucket(g: str) -> int:
    b = _FT_MEMO.get(g)
    if b is None:
        from ..functions.hashing import _hash64

        if len(_FT_MEMO) > 2_000_000:
            _FT_MEMO.clear()
        b = int(_hash64(g)) % FT_BUCKETS
        _FT_MEMO[g] = b
    return b


def ft_weights() -> "np.ndarray":
    """The frozen "pre-trained" weight vector: w[b] =
    md5_number_lower('w' || b) % 17 - 8 — ints in [-8, 8], derived
    only from the bucket index so the model is a constant of the repo
    (and of the SQL oracle), not of any corpus."""
    import numpy as np

    from ..functions.hashing import _hash64

    return np.array(
        [int(_hash64(f"w{b}")) % 17 - 8 for b in range(FT_BUCKETS)], np.int64
    )


def quality_classifier(sf_dir: str) -> ray.data.Dataset:
    """fastText-style linear quality classifier INFERENCE (Joulin et
    al. 2016, arXiv:1607.01759 — the model family CCNet and LLaMA's
    webtext pipeline use for quality/domain filtering): score every
    document with a frozen linear model over hashed unigram+bigram
    bag-of-words features and emit the keep/drop label.

    Where ``dsir_weights`` ESTIMATES a model from the corpus (two
    passes), this op is the pure inference shape: a pre-trained weight
    vector (``ft_weights()``, FT_BUCKETS=1024 ints — see its docstring
    for the frozen derivation) rides into every task as a closure
    constant, and one streaming pass scores each document locally:

      * features: unigrams + bigrams of the whitespace tokens, hashed
        via ``_hash64(gram) % 1024`` (== DuckDB ``md5_number_lower``);
      * score = Σ_gram w[bucket(gram)] (occurrence-weighted, exact
        integer — the margin of a linear classifier, sign = label);
      * keep = 1 when score > 0.

    Output: (doc_id, n_grams, score, keep) for every document with at
    least one token.

    Scale shape: ONE stateless streaming pass, zero shuffles; the
    model is 8 KB and serialized once per task spec, not per batch. A
    real fastText model (300k buckets × dim) would swap in via
    ``ray.put`` + an actor-pool stage holding the matrix; the
    hash-features → lookup → reduce dataflow is identical.
    """
    import numpy as np

    w = ft_weights()
    docs = read_documents(sf_dir)

    out_schema = pa.schema(
        [
            ("doc_id", pa.int64()),
            ("n_grams", pa.int64()),
            ("score", pa.int64()),
            ("keep", pa.int64()),
        ]
    )

    def _score(batch: pa.Table) -> pa.Table:
        # Vectorized gram stream (uni + bigram slices), with _ft_bucket
        # hashed once per DISTINCT gram per block (dictionary encode);
        # per-doc sums via np.add.at over the parent indices — no
        # Python loop over gram OCCURRENCES.
        toks, par = _arrow_token_stream(batch, lower=False)
        m = len(toks)
        if m == 0:
            return out_schema.empty_table()
        same = pc.equal(par.slice(0, m - 1), par.slice(1))
        bi = pc.binary_join_element_wise(
            toks.slice(0, m - 1), toks.slice(1), " "
        ).filter(same)
        grams = pa.concat_arrays([toks, _flat(bi)])
        gpar = pa.concat_arrays(
            [par, _flat(par.slice(0, m - 1).filter(same))]
        )
        denc = grams.dictionary_encode()
        wts = np.array(
            [int(w[_ft_bucket(g)]) for g in denc.dictionary.to_pylist()],
            dtype=np.int64,
        )
        per_gram = wts[denc.indices.to_numpy(zero_copy_only=False)]
        gp = gpar.to_numpy(zero_copy_only=False)
        n_rows = batch.num_rows
        sums = np.zeros(n_rows, np.int64)
        counts = np.zeros(n_rows, np.int64)
        np.add.at(sums, gp, per_gram)
        np.add.at(counts, gp, 1)
        ids_all = batch.column("doc_id").cast(pa.int64()).to_numpy(
            zero_copy_only=False
        )
        has = counts > 0  # docs with zero tokens emit no row
        sc = sums[has]
        return pa.Table.from_pydict(
            {
                "doc_id": pa.array(ids_all[has], pa.int64()),
                "n_grams": pa.array(counts[has], pa.int64()),
                "score": pa.array(sc, pa.int64()),
                "keep": pa.array((sc > 0).astype(np.int64), pa.int64()),
            },
            schema=out_schema,
        )

    return docs.map_batches(_score, batch_format="pyarrow")


DSIR_MAX_DROP_BITS = 40


def dsir_resample(sf_dir: str) -> ray.data.Dataset:
    """DSIR importance RESAMPLING — the selection step that completes
    ``dsir_weights`` (Xie et al. 2023, arXiv:2302.03169 §2: sample raw
    documents with probability proportional to the importance weight).
    The paper samples ∝ exp(log p_tgt − log p_raw); the frozen exact
    instantiation here is base-2 Bernoulli resampling on the integer
    weight grid ``dsir_weights`` already computes:

      * acceptance probability ``p = 2^min(weight_bits, 0)`` — docs at
        least as likely under the target as under the raw corpus are
        always kept, others kept with exponentially decaying odds;
      * the coin is deterministic and content-stable: keep iff
        ``md5-hash("dsir:" + doc_id) % 2^(−weight_bits) == 0``
        (``_hash64`` == DuckDB ``md5_number_lower``) — reproducible
        across runs, engines, and cluster sizes, no RNG state;
      * ``weight_bits < −DSIR_MAX_DROP_BITS`` (40) drops outright
        (p < 2⁻⁴⁰ — keeps the modulus inside int64).

    Output: the KEPT documents as (doc_id, weight_bits, p_log2) where
    ``p_log2 = min(weight_bits, 0)`` is the log2 acceptance probability
    the doc survived.

    Scale shape: composes on ``dsir_weights``'s dataset (two streaming
    passes, one 256-row groupby) plus one more stateless map over the
    tiny (doc_id, weight_bits) stream — no additional shuffle; the
    text column is never re-read.
    """
    from ..functions.hashing import _hash64

    out_schema = pa.schema(
        [("doc_id", pa.int64()), ("weight_bits", pa.int64()), ("p_log2", pa.int64())]
    )

    def _accept(batch: pa.Table) -> pa.Table:
        ids, wbs, ps = [], [], []
        for doc_id, wb in zip(
            batch.column("doc_id").to_pylist(), batch.column("weight_bits").to_pylist()
        ):
            wb = int(wb)
            if wb >= 0:
                kept = True
            elif wb < -DSIR_MAX_DROP_BITS:
                kept = False
            else:
                kept = int(_hash64(f"dsir:{int(doc_id)}")) % (1 << -wb) == 0
            if kept:
                ids.append(int(doc_id))
                wbs.append(wb)
                ps.append(min(wb, 0))
        return pa.Table.from_pydict(
            {
                "doc_id": pa.array(ids, pa.int64()),
                "weight_bits": pa.array(wbs, pa.int64()),
                "p_log2": pa.array(ps, pa.int64()),
            },
            schema=out_schema,
        )

    return dsir_weights(sf_dir).map_batches(_accept, batch_format="pyarrow")


# Frozen keyword bank for topic_classify: topic -> (priority rank,
# keywords). A repo constant (mirrored literally in the SQL oracle),
# standing in for the keyword/URL taxonomy banks curation pipelines use
# for topic tagging (e.g. the curated-domain buckets in Dolma/RefinedWeb
# source analyses). Ties break toward the lower rank.
TOPIC_BANK: tuple[tuple[str, tuple[str, ...]], ...] = (
    ("storage", ("scan", "column", "table", "row", "part")),
    ("relational", ("join", "merge", "group", "agg", "sort", "order", "window")),
    ("streaming", ("stream", "batch", "filter", "query")),
    ("tuning", ("fast", "slow", "small", "big", "vector", "hash")),
)


def topic_classify(sf_dir: str) -> ray.data.Dataset:
    """Keyword-bank topic classification — the rule-based topic tagger
    a corpus-curation pipeline runs to build mixture statistics before
    sampling (the lexicon-matching shape of UT1-style category lists,
    applied to body text instead of URLs): every document is assigned
    the topic whose keyword bank its tokens hit most often.

      * tokens: whitespace tokens (``_TOKEN_RE``), exact match against
        the frozen ``TOPIC_BANK`` lexicon (occurrence-counted);
      * winner: max hit count, ties broken by bank order
        (storage < relational < streaming < tuning);
      * no hits at all → topic ``"none"`` — every document gets exactly
        one output row.

    Output: (doc_id, topic, n_hits) with n_hits = winning topic's hits.

    Scale shape: ONE stateless streaming pass, zero shuffles; the
    lexicon is a closure constant (bytes, not a broadcast)."""
    from ..functions.textstats import _TOKEN_RE

    kw_rank: dict[str, int] = {}
    for rank, (_, kws) in enumerate(TOPIC_BANK):
        for kw in kws:
            kw_rank[kw] = rank
    names = [t for t, _ in TOPIC_BANK]

    out_schema = pa.schema(
        [("doc_id", pa.int64()), ("topic", pa.string()), ("n_hits", pa.int64())]
    )

    def _classify(batch: pa.Table) -> pa.Table:
        ids, topics, hits = [], [], []
        for doc_id, text in zip(
            batch.column("doc_id").to_pylist(), batch.column("text").to_pylist()
        ):
            counts = [0] * len(TOPIC_BANK)
            for tok in _TOKEN_RE.findall(text or ""):
                r = kw_rank.get(tok)
                if r is not None:
                    counts[r] += 1
            best = max(range(len(counts)), key=lambda i: (counts[i], -i))
            ids.append(int(doc_id))
            if counts[best] == 0:
                topics.append("none")
                hits.append(0)
            else:
                topics.append(names[best])
                hits.append(counts[best])
        return pa.Table.from_pydict(
            {
                "doc_id": pa.array(ids, pa.int64()),
                "topic": pa.array(topics, pa.string()),
                "n_hits": pa.array(hits, pa.int64()),
            },
            schema=out_schema,
        )

    return read_documents(sf_dir).map_batches(_classify, batch_format="pyarrow")


def trending_terms(sf_dir: str, k: int = 20, min_new: int = 5) -> ray.data.Dataset:
    """Trending-term detection between crawl snapshots — the
    rising-vocabulary signal a recrawl pipeline surfaces (emerging
    topics, spam campaigns, template shifts). Snapshot split is the
    ``bloom_dedup`` rule: OLD = even doc_id, NEW = odd doc_id.

    Frozen rule (mirrored exactly in SQL): per term, occurrence counts
    c_old / c_new (the ``top_ngrams`` tokenization: lowercase
    whitespace split) and snapshot token totals T_old / T_new; a
    term's trend score compares its RATES exactly by clearing the
    denominators —

        score = c_new * T_old  -  c_old * T_new

    (> 0 iff c_new/T_new > c_old/T_old — no float division). Keep
    terms with c_new >= ``min_new`` (raw-count noise floor), top-k by
    (score desc, term asc). int64 envelope: |score| < c * T — fine
    through ~10^9-token snapshots with 10^9-count terms; switch the
    score map to Python ints past that.

    Scale shape: per-batch term Counters keyed by snapshot side (the
    partial combine — one row per distinct term per block, never per
    occurrence); ONE groupby(term) sum; totals are two driver ints
    summed off the term table; the score map is stateless and top-k
    is a sort over the distinct-term table with a deterministic tie
    order. Document text never shuffles.
    """
    from ray.data.aggregate import Sum

    _part_schema = pa.schema(
        [("term", pa.string()), ("c_old", pa.int64()), ("c_new", pa.int64())]
    )

    def _partial(batch: pa.Table) -> pa.Table:
        # Vectorized: token stream + doc-parity split in one Arrow
        # group_by over (term, parity); a term active in both halves
        # emits two partial rows — the downstream Sum merges them
        # identically to the old single-row Counter partial.
        toks, par = _arrow_token_stream(batch)
        if len(toks) == 0:
            return _part_schema.empty_table()
        parity = pc.bit_wise_and(
            _flat(batch.column("doc_id").cast(pa.int64())).take(par), 1
        )
        agg = (
            pa.table({"term": toks, "p": parity})
            .group_by(["term", "p"])
            .aggregate([([], "count_all")])
        )
        cnt = agg.column("count_all")
        is_old = pc.equal(agg.column("p"), 0)
        zero = pa.scalar(0, pa.int64())
        return pa.Table.from_arrays(
            [
                _flat(agg.column("term")),
                _flat(pc.if_else(is_old, cnt, zero)),
                _flat(pc.if_else(is_old, zero, cnt)),
            ],
            schema=_part_schema,
        )

    counts = (
        read_documents(sf_dir)
        .map_batches(_partial, batch_format="pyarrow")
        .groupby("term")
        .aggregate(Sum("c_old", alias_name="c_old"), Sum("c_new", alias_name="c_new"))
        .materialize()
    )
    t_old = int(counts.sum("c_old") or 0)
    t_new = int(counts.sum("c_new") or 0)

    out_schema = pa.schema(
        [
            ("term", pa.string()),
            ("c_old", pa.int64()),
            ("c_new", pa.int64()),
            ("score", pa.int64()),
        ]
    )

    def _score(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0 or "term" not in batch.column_names:
            return out_schema.empty_table()
        import numpy as np

        co = batch.column("c_old").to_numpy(zero_copy_only=False)
        cn = batch.column("c_new").to_numpy(zero_copy_only=False)
        keep = cn >= min_new
        return pa.Table.from_pydict(
            {
                "term": batch.column("term").filter(pa.array(keep)),
                "c_old": pa.array(co[keep], pa.int64()),
                "c_new": pa.array(cn[keep], pa.int64()),
                "score": pa.array(
                    cn[keep] * t_old - co[keep] * t_new, pa.int64()
                ),
            },
            schema=out_schema,
        )

    return (
        counts.map_batches(_score, batch_format="pyarrow")
        .sort(["score", "term"], descending=[True, False])
        .limit(k)
    )


PROFILE_COLUMNS: tuple[tuple[str, str], ...] = (
    # (column, kind): kind governs the distinct key and min/max rule.
    ("doc_id", "int"),
    ("text", "hash"),   # distinct over md5(text); no min/max (doc-sized values)
    ("lang", "str"),
    ("source", "str"),
    ("n_chars", "int"),
)


def corpus_profile(sf_dir: str) -> ray.data.Dataset:
    """Pre-flight data-validation profile of the documents table — the
    Great-Expectations-style check a pipeline runs BEFORE committing a
    100 TB job to a corpus: per column, row count, null count, EXACT
    distinct count, and min/max. A wrong shard glob, a half-written
    snapshot, or a column of nulls shows up here as one wrong number
    instead of a day of wasted compute.

    Frozen rules (mirrored in SQL): distinct for ``text`` is counted
    over ``md5(text)`` so full documents never enter the shuffle
    (== ``content_md5``; the frozen exact-dedup key); min/max are the
    numeric extremes stringified for int columns, lexicographic for
    short string columns, and '' for ``text`` (doc-sized values don't
    belong in a profile row). Nulls are excluded from distinct and
    min/max and counted in ``n_nulls``.

    Output: one row per column — (column, n_rows, n_nulls, n_distinct,
    min_value, max_value) — sorted by column name.

    Scale shape: ONE streaming pass emits per-block meta partials
    (O(columns) rows/block) and in-block-deduped (column, key) distinct
    rows; the only all-to-all is the distinct reduce over that
    pre-deduped narrow key table; final assembly touches O(columns)
    rows on the driver (schema-sized, not corpus-sized).
    """
    from ..functions.textstats import content_md5
    from .grouped import reduce_by_keys

    meta_schema = pa.schema(
        [
            ("column", pa.string()),
            ("n_rows", pa.int64()),
            ("n_nulls", pa.int64()),
            ("min_num", pa.int64()),
            ("max_num", pa.int64()),
            ("min_str", pa.string()),
            ("max_str", pa.string()),
        ]
    )
    key_schema = pa.schema([("column", pa.string()), ("vkey", pa.string())])

    def _meta(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return meta_schema.empty_table()
        import numpy as np

        rows = {k: [] for k in meta_schema.names}
        for col, kind in PROFILE_COLUMNS:
            arr = batch.column(col)
            n = len(arr)
            nulls = arr.null_count
            vals = arr.drop_null()
            rows["column"].append(col)
            rows["n_rows"].append(n)
            rows["n_nulls"].append(nulls)
            if kind == "int" and len(vals):
                v = vals.to_numpy(zero_copy_only=False).astype(np.int64)
                rows["min_num"].append(int(v.min()))
                rows["max_num"].append(int(v.max()))
                rows["min_str"].append(None)
                rows["max_str"].append(None)
            elif kind == "str" and len(vals):
                v = vals.to_pylist()
                rows["min_num"].append(None)
                rows["max_num"].append(None)
                rows["min_str"].append(min(v))
                rows["max_str"].append(max(v))
            else:
                rows["min_num"].append(None)
                rows["max_num"].append(None)
                rows["min_str"].append(None)
                rows["max_str"].append(None)
        return pa.Table.from_pydict(rows, schema=meta_schema)

    def _keys(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return key_schema.empty_table()
        cols, keys = [], []
        for col, kind in PROFILE_COLUMNS:
            vals = batch.column(col).drop_null().to_pylist()
            if kind == "hash":
                uniq = {content_md5(v) for v in vals}
            elif kind == "int":
                uniq = {str(int(v)) for v in vals}
            else:
                uniq = set(vals)
            cols += [col] * len(uniq)
            keys += sorted(uniq)
        return pa.Table.from_pydict(
            {"column": pa.array(cols, pa.string()), "vkey": pa.array(keys, pa.string())},
            schema=key_schema,
        )

    def _meta_reduce(group: pa.Table) -> pa.Table:
        if group.num_rows == 0:
            return meta_schema.empty_table()
        import numpy as np

        def _agg(name, how):
            col = group.column(name).drop_null()
            if len(col) == 0:
                return None
            v = col.to_pylist()
            return how(v)

        return pa.Table.from_pydict(
            {
                "column": [group.column("column")[0].as_py()],
                "n_rows": [int(np.sum(group.column("n_rows").to_numpy(zero_copy_only=False)))],
                "n_nulls": [int(np.sum(group.column("n_nulls").to_numpy(zero_copy_only=False)))],
                "min_num": [_agg("min_num", min)],
                "max_num": [_agg("max_num", max)],
                "min_str": [_agg("min_str", min)],
                "max_str": [_agg("max_str", max)],
            },
            schema=meta_schema,
        )

    from .grouped import map_key_groups

    docs = read_documents(sf_dir)
    # Per-block partials (columns x blocks rows) reduce DISTRIBUTED to
    # one row per column before the driver sees them — at 100 TB the
    # partial table is itself millions of rows.
    metas = map_key_groups(
        docs.map_batches(_meta, batch_format="pyarrow"), "column", _meta_reduce
    ).take_all()
    distinct_keys = reduce_by_keys(
        docs.map_batches(_keys, batch_format="pyarrow"),
        ["column", "vkey"], None, how="count", out="_n",
    )
    distincts = {
        r["column"]: r["n_distinct"]
        for r in reduce_by_keys(
            distinct_keys, ["column"], None, how="count", out="n_distinct"
        ).take_all()
    }

    out_schema = pa.schema(
        [
            ("column", pa.string()),
            ("n_rows", pa.int64()),
            ("n_nulls", pa.int64()),
            ("n_distinct", pa.int64()),
            ("min_value", pa.string()),
            ("max_value", pa.string()),
        ]
    )
    final = {k: [] for k in out_schema.names}
    for col, kind in sorted(PROFILE_COLUMNS):
        mine = [m for m in metas if m["column"] == col]
        final["column"].append(col)
        final["n_rows"].append(sum(m["n_rows"] for m in mine))
        final["n_nulls"].append(sum(m["n_nulls"] for m in mine))
        final["n_distinct"].append(int(distincts.get(col, 0)))
        if kind == "int":
            nums = [m for m in mine if m["min_num"] is not None]
            final["min_value"].append(str(min(m["min_num"] for m in nums)) if nums else "")
            final["max_value"].append(str(max(m["max_num"] for m in nums)) if nums else "")
        elif kind == "str":
            strs = [m for m in mine if m["min_str"] is not None]
            final["min_value"].append(min(m["min_str"] for m in strs) if strs else "")
            final["max_value"].append(max(m["max_str"] for m in strs) if strs else "")
        else:
            final["min_value"].append("")
            final["max_value"].append("")
    return ray.data.from_arrow(pa.Table.from_pydict(final, schema=out_schema))


def _global_rank_asc(
    scored: ray.data.Dataset, value_col: str, bucket: int
) -> ray.data.Dataset:
    """Exact 1-based GLOBAL rank of every row by (value asc, doc_id
    asc) — the ``curriculum_rank`` two-level prefix sum generalized to
    any integer column: bounded bucket-count groupby → driver prefix in
    value order → broadcast offsets → per-bucket vectorized rank.
    Driver state is O(value_range / bucket) ints. Input needs columns
    (doc_id, value_col); output is (doc_id, rank)."""
    import numpy as np

    from .grouped import map_key_groups

    b_schema = pa.schema(
        [("doc_id", pa.int64()), ("b", pa.int64()), ("v", pa.int64())]
    )

    def _bucketize(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return b_schema.empty_table()
        v = batch.column(value_col).to_numpy(zero_copy_only=False).astype("int64")
        return pa.Table.from_pydict(
            {
                "doc_id": batch.column("doc_id").cast(pa.int64()),
                "b": pa.array(v // bucket, pa.int64()),
                "v": pa.array(v, pa.int64()),
            },
            schema=b_schema,
        )

    bucketed = scored.map_batches(_bucketize, batch_format="pyarrow").materialize()
    offs, acc = {}, 0
    for r in sorted(bucketed.groupby("b").count().take_all(), key=lambda r: r["b"]):
        offs[int(r["b"])] = acc
        acc += int(r["count()"])
    off_ref = ray.put(offs)

    out_schema = pa.schema([("doc_id", pa.int64()), ("rank", pa.int64())])

    def _rank(group: pa.Table) -> pa.Table:
        if group.num_rows == 0:
            return out_schema.empty_table()
        off_map = ray.get(off_ref)
        g = group.combine_chunks()
        v = g.column("v").to_numpy(zero_copy_only=False)
        ids = g.column("doc_id").to_numpy(zero_copy_only=False)
        order = np.lexsort((ids, v))
        base = off_map[int(g.column("b")[0].as_py())]
        ranks = np.empty(len(order), dtype=np.int64)
        ranks[order] = base + 1 + np.arange(len(order))
        return pa.Table.from_pydict(
            {"doc_id": pa.array(ids, pa.int64()), "rank": pa.array(ranks, pa.int64())},
            schema=out_schema,
        )

    return map_key_groups(bucketed, "b", _rank)


def length_quality_spearman(sf_dir: str, bucket: int = 4096) -> ray.data.Dataset:
    """Exact distributed Spearman rank correlation between document
    LENGTH (token count) and the stopword-density QUALITY proxy — the
    metric-diagnostics pass a curation pipeline runs to check whether a
    proposed filter is just re-measuring length (a classic webtext
    failure mode: quality heuristics that secretly correlate ~1 with
    document size filter nothing new).

    Frozen rule (mirrored in SQL): both metrics on their existing
    integer grids (``token_count``; ``curriculum_rank``'s
    ``(1e6*stop_hits)//n_tok``); ranks are the DETERMINISTIC distinct
    ranks by (value asc, doc_id asc) — the frozen tie rule, not
    average ranks, so both engines derive identical integers; then

        rho_e6 = 1e6 - (6e6 * sum(d^2)) // (n * (n^2 - 1)),  d = rx - ry

    Output: one row (n_docs, sum_d2, rho_e6); (0, 0, 0) when n < 2.
    int64 envelope: sum_d2 < n^3/3 overflows past n ~ 3e6 — switch the
    d^2 partials to Python ints beyond that.

    Scale shape: both global rankings run the two-level bucket prefix
    sum (no corpus-wide row_number, no driver materialization); ONE
    doc_id hash join aligns them; d^2 reduces via per-block partials
    to two driver ints.
    """
    import numpy as np

    from ..functions.textstats import stopword_hits, token_count
    from ..tuning import join_partitions as _jp

    jp = _jp()
    out_schema = pa.schema(
        [("n_docs", pa.int64()), ("sum_d2", pa.int64()), ("rho_e6", pa.int64())]
    )

    sc_schema = pa.schema(
        [("doc_id", pa.int64()), ("x", pa.int64()), ("y", pa.int64())]
    )

    def _score(batch: pa.Table) -> pa.Table:
        ids, xs, ys = [], [], []
        for d, t in zip(
            batch.column("doc_id").to_pylist(), batch.column("text").to_pylist()
        ):
            t = t or ""
            n = token_count(t)
            ids.append(int(d))
            xs.append(n)
            ys.append((1_000_000 * stopword_hits(t, "en")) // n if n else 0)
        return pa.Table.from_pydict(
            {
                "doc_id": pa.array(ids, pa.int64()),
                "x": pa.array(xs, pa.int64()),
                "y": pa.array(ys, pa.int64()),
            },
            schema=sc_schema,
        )

    scored = read_documents(sf_dir).map_batches(_score, batch_format="pyarrow").materialize()

    rx = _global_rank_asc(scored, "x", bucket).repartition(jp)
    ry = _global_rank_asc(scored, "y", bucket).map_batches(
        lambda t: t.rename_columns(["doc_id", "rank_y"]), batch_format="pyarrow"
    ).repartition(jp)
    joined = rx.join(ry, "inner", jp, on=("doc_id",))

    part_schema = pa.schema([("n", pa.int64()), ("d2", pa.int64())])

    def _partial(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0 or "rank" not in batch.column_names:
            return part_schema.empty_table()
        d = (
            batch.column("rank").to_numpy(zero_copy_only=False)
            - batch.column("rank_y").to_numpy(zero_copy_only=False)
        ).astype(np.int64)
        return pa.Table.from_pydict(
            {"n": [batch.num_rows], "d2": [int((d * d).sum())]},
            schema=part_schema,
        )

    parts = joined.map_batches(_partial, batch_format="pyarrow").take_all()
    n = sum(p["n"] for p in parts)
    sum_d2 = sum(p["d2"] for p in parts)
    if n < 2:
        n, sum_d2, rho = 0, 0, 0
    else:
        rho = 1_000_000 - (6_000_000 * sum_d2) // (n * (n * n - 1))
    return ray.data.from_arrow(
        pa.Table.from_pydict(
            {"n_docs": [n], "sum_d2": [sum_d2], "rho_e6": [rho]},
            schema=out_schema,
        )
    )


def passage_chunks(
    sf_dir: str, window: int = 64, stride: int = 48
) -> ray.data.Dataset:
    """Fixed-window passage chunking with overlap — the
    retrieval-corpus / training-sequence segmentation pass (every RAG
    indexing pipeline runs this before embedding): each document
    splits into ``window``-token passages starting every ``stride``
    tokens (overlap = window − stride), the last passage short.

    Chunk count rule (deterministic, shared with the SQL oracle):
    ``1`` if ``n_tok ≤ window`` else ``1 + ceil((n_tok − window) /
    stride)`` — every token is covered, no chunk starts past the end,
    empty docs emit nothing. ``chunk_md5`` fingerprints the passage
    text so downstream exact-dedup can run at passage granularity
    (the `line_dedup` / `substring_dedup` family at a coarser unit).

    Scale shape: one stateless streaming map, no shuffle at any corpus
    size; output rows carry the fingerprint, never the passage text.
    """
    from ..functions.textstats import content_md5

    schema = pa.schema(
        [
            ("doc_id", pa.int64()),
            ("chunk_id", pa.int64()),
            ("start_tok", pa.int64()),
            ("n_tokens", pa.int64()),
            ("chunk_md5", pa.string()),
        ]
    )

    def _chunks(batch: pa.Table) -> pa.Table:
        ids, cids, starts, lens, md5s = [], [], [], [], []
        for doc_id, text in zip(
            batch.column("doc_id").to_pylist(), batch.column("text").to_pylist()
        ):
            toks = (text or "").split()
            n = len(toks)
            if n == 0:
                continue
            n_chunks = 1 if n <= window else 1 + -(-(n - window) // stride)
            for i in range(n_chunks):
                start = i * stride
                chunk = toks[start : start + window]
                ids.append(int(doc_id))
                cids.append(i)
                starts.append(start)
                lens.append(len(chunk))
                md5s.append(content_md5(" ".join(chunk)))
        return pa.Table.from_pydict(
            {
                "doc_id": pa.array(ids, pa.int64()),
                "chunk_id": pa.array(cids, pa.int64()),
                "start_tok": pa.array(starts, pa.int64()),
                "n_tokens": pa.array(lens, pa.int64()),
                "chunk_md5": pa.array(md5s, pa.string()),
            },
            schema=schema,
        )

    return read_documents(sf_dir).map_batches(_chunks, batch_format="pyarrow")


BM25_QUERY: tuple[str, ...] = ("dup", "hash", "join")
_BM25_SCHEMA = pa.schema(
    [("rnk", pa.int64()), ("doc_id", pa.int64()), ("score_e6", pa.int64())]
)


def bm25_search(
    sf_dir: str, query: tuple[str, ...] = BM25_QUERY, k: int = 10
) -> ray.data.Dataset:
    """BM25 ranked retrieval for one query over the documents corpus —
    the query-time inverted-index product a curation pipeline uses for
    retrieval-based decontamination and dedup-candidate mining
    (`tfidf_top_terms` is the per-DOC offline profile; this is the
    per-QUERY ranked search with the Robertson saturation + length
    normalization tf-idf lacks).

    Frozen exact-integer BM25 (k1 = 6/5, b = 3/4 — the standard 1.2 /
    0.75 as exact rationals; mirrored literally by the SQL oracle):

      * tokens: lowercase whitespace split of trimmed text ('' → 0);
      * N = ALL docs, avgdl = total_tokens // N (floor);
      * idf_bits(t) = bit_length(N // df(t)) — the repo's bit-grid
        integer log2 (cf. ``unigram_surprisal``), df = docs containing
        t (ranking-isomorphic to log-idf on the bit grid);
      * per (doc, query term): clearing k1/b denominators by 10*avgdl,

            part_e6 = (idf_bits * 22 * avgdl * tf * 10^6)
                      // (10 * avgdl * tf + 3 * avgdl + 9 * dl)

        (exactly idf * tf*(k1+1) / (tf + k1*(1 - b + b*dl/avgdl)) on
        the e6 floor grid); doc score = sum over query terms present;
      * top-k by (score_e6 desc, doc_id asc) with 1-based rank.

    Output: (rnk, doc_id, score_e6), k rows.

    Scale shape: ONE tokenize pass per document emits (a) a per-doc dl
    row — two ints, feeding the global N/total scalar sums — and (b) a
    (doc_id, term, tf, dl) row per query term PRESENT (dl carried
    inline, so no dl join later), so the shuffle moves O(matching docs
    * |query|), not O(corpus); df is a |query|-row driver-side table;
    scoring is a stateless map over the match rows with a broadcast
    idf dict; per-doc sums via one ``reduce_by_keys``; top-k via the
    per-block ``block_topk`` combiner + one tiny final rank pass
    (O(blocks * k) rows move).
    """
    from collections import Counter

    import numpy as np

    from .grouped import block_topk, map_key_groups, reduce_by_keys

    qterms = tuple(query)
    qset = set(qterms)
    docs = read_documents(sf_dir)

    scan_schema = pa.schema(
        [
            ("doc_id", pa.int64()),
            ("term", pa.string()),  # "" marks the per-doc dl row
            ("tf", pa.int64()),
            ("dl", pa.int64()),
        ]
    )

    def _scan(batch: pa.Table) -> pa.Table:
        # ONE text pass per doc: the dl row (term "") plus one row per
        # query term present.
        ids, terms, tfs, dls = [], [], [], []
        for i, t in zip(
            batch.column("doc_id").to_pylist(), batch.column("text").to_pylist()
        ):
            toks = (t or "").strip().lower().split()
            ids.append(int(i)); terms.append(""); tfs.append(0)
            dls.append(len(toks))
            c = Counter(tok for tok in toks if tok in qset)
            for term, tf in c.items():
                ids.append(int(i)); terms.append(term); tfs.append(tf)
                dls.append(len(toks))
        return pa.Table.from_pydict(
            {
                "doc_id": pa.array(ids, pa.int64()),
                "term": pa.array(terms, pa.string()),
                "tf": pa.array(tfs, pa.int64()),
                "dl": pa.array(dls, pa.int64()),
            },
            schema=scan_schema,
        )

    import pyarrow.compute as pc

    scan = docs.map_batches(_scan, batch_format="pyarrow").materialize()
    dl_tbl = scan.map_batches(
        lambda t: t.filter(pc.equal(t.column("term"), "")).select(
            ["doc_id", "dl"]
        ),
        batch_format="pyarrow",
    ).materialize()
    n_docs = dl_tbl.count()
    if n_docs == 0:
        return ray.data.from_arrow(_BM25_SCHEMA.empty_table())
    total_tokens = int(dl_tbl.sum("dl") or 0)
    avgdl = max(total_tokens // n_docs, 1)  # avgdl 0 would zero every denom

    # match rows already carry dl from the single scan — no join needed
    tf_tbl = scan.map_batches(
        lambda t: t.filter(pc.not_equal(t.column("term"), "")),
        batch_format="pyarrow",
    ).materialize()
    if tf_tbl.count() == 0:  # no doc contains any query term
        return ray.data.from_arrow(_BM25_SCHEMA.empty_table())

    # df per query term: a |query|-row table — driver-side by design.
    df_rows = reduce_by_keys(
        tf_tbl.map_batches(
            lambda t: t.select(["term"]), batch_format="pyarrow"
        ),
        ["term"], None, how="count", out="df",
    ).take_all()
    idf_bits = {r["term"]: (n_docs // r["df"]).bit_length() for r in df_rows}

    matched = tf_tbl
    part_schema = pa.schema([("doc_id", pa.int64()), ("part", pa.int64())])

    def _score(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0 or "doc_id" not in batch.column_names:
            return part_schema.empty_table()
        parts = [
            (idf_bits[term] * 22 * avgdl * tf * 1_000_000)
            // (10 * avgdl * tf + 3 * avgdl + 9 * dl)
            for term, tf, dl in zip(
                batch.column("term").to_pylist(),
                batch.column("tf").to_pylist(),
                batch.column("dl").to_pylist(),
            )
        ]
        return pa.Table.from_pydict(
            {
                "doc_id": batch.column("doc_id").cast(pa.int64()),
                "part": pa.array(parts, pa.int64()),
            },
            schema=part_schema,
        )

    scores = reduce_by_keys(
        matched.map_batches(_score, batch_format="pyarrow"),
        ["doc_id"], "part", how="sum", out="score_e6",
    )

    # per-block top-k combiner, then one global rank over O(blocks*k)
    def _block_top(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0 or "doc_id" not in batch.column_names:
            return batch
        s = batch.column("score_e6").to_numpy(zero_copy_only=False)
        d = batch.column("doc_id").to_numpy(zero_copy_only=False)
        take, _ = block_topk(np.zeros(len(s), np.int64), (d, -s), k)
        return batch.take(pa.array(take))

    pre = scores.map_batches(
        _block_top, batch_format="pyarrow", batch_size=None
    )

    def _rank(group: pa.Table) -> pa.Table:
        if group.num_rows == 0:
            return _BM25_SCHEMA.empty_table()
        s = group.column("score_e6").to_numpy(zero_copy_only=False)
        d = group.column("doc_id").to_numpy(zero_copy_only=False)
        take, ranks = block_topk(np.zeros(len(s), np.int64), (d, -s), k)
        return pa.Table.from_pydict(
            {
                "rnk": pa.array(ranks, pa.int64()),
                "doc_id": pa.array(d[take], pa.int64()),
                "score_e6": pa.array(s[take], pa.int64()),
            },
            schema=_BM25_SCHEMA,
        )

    # single-group final rank: constant key co-locates the O(blocks*k)
    # combiner survivors
    final = pre.map_batches(
        lambda t: t.append_column("_g", pa.array(np.zeros(t.num_rows, np.int64))),
        batch_format="pyarrow",
    )
    return map_key_groups(final, "_g", lambda g: _rank(g))


# ngram_cardinality constants: alpha_256 = 0.7213/(1 + 1.079/256)
# frozen on the e6 rational grid, the 57-rank register rule shared with
# hll_registers, and the raw-estimator numerator
# alpha_e6 * 256^2 * 2^57 (exact integer, injected into the SQL oracle).
NGRAM_HLL_ALPHA_E6 = 718274
NGRAM_HLL_NUM = NGRAM_HLL_ALPHA_E6 * 65536 * (1 << 57)
NGRAM_HLL_CAP = 10**18
_NGRAM_CARD_SCHEMA = pa.schema([("n", pa.int64()), ("est", pa.int64())])


def ngram_cardinality(sf_dir: str, max_n: int = 3) -> ray.data.Dataset:
    """Corpus-distinct n-gram cardinality estimates for n = 1..max_n —
    the Heaps-law / vocabulary-growth diagnostic a pretraining corpus
    ships ("how much unique text is in here"), and the sketch answer
    to a question whose exact form (count-distinct over ~corpus-sized
    n-gram sets) needs an all-to-all shuffle per n.

    Frozen exact-integer semantics (mirrored by the SQL oracle):
    tokens = lowercase whitespace split ('' drops — the `bm25_search`
    rule); an n-gram is n adjacent tokens joined by one space; hash =
    the 64-bit md5 (`_kgram_hash64` == ``md5_number_lower``); 256
    registers per n with the ``hll_registers`` rank rule (register =
    low byte, rank = 57 − bit_length(high 56 bits), 57 when zero);
    estimate = the RAW HLL estimator on the integer grid

        est = (alpha_e6 * 256^2 * 2^57) // (10^6 * S),
        S   = sum_j 2^(57 - M_j)   (M_j = 0 for untouched registers)

    with NO bias corrections (cf. ``link_harmonic``'s rationale) and a
    defensive 10^18 cap. Output: (n, est), one row per n that has at
    least one n-gram in the corpus.

    Scale shape: duplicates cannot change a register max, so there is
    NO distinct pass — each block reduces to <= 256*max_n partial
    (n, register, rank) rows, the groupby is (n, register)-keyed
    (768 groups at any corpus size), and the estimator runs per n over
    256 ints. This is the sketch counterpart to the exact
    ``vocab_ngrams`` counts.
    """
    from .grouped import map_key_groups, reduce_by_keys

    from ..functions.textstats import _kgram_hash64

    docs = read_documents(sf_dir)
    part_schema = pa.schema(
        [("n", pa.int64()), ("register", pa.int64()), ("rank", pa.int64())]
    )

    def _partial(batch: pa.Table) -> pa.Table:
        regs: dict[tuple[int, int], int] = {}
        for t in batch.column("text").to_pylist():
            toks = (t or "").strip().lower().split()
            for n in range(1, max_n + 1):
                for i in range(len(toks) - n + 1):
                    h = _kgram_hash64(" ".join(toks[i : i + n]))
                    idx = h & 0xFF
                    v = h >> 8
                    rank = 57 - v.bit_length() if v else 57
                    key = (n, idx)
                    if rank > regs.get(key, 0):
                        regs[key] = rank
        keys = sorted(regs)
        return pa.Table.from_pydict(
            {
                "n": pa.array([k[0] for k in keys], pa.int64()),
                "register": pa.array([k[1] for k in keys], pa.int64()),
                "rank": pa.array([regs[k] for k in keys], pa.int64()),
            },
            schema=part_schema,
        )

    merged = reduce_by_keys(
        docs.map_batches(_partial, batch_format="pyarrow"),
        ["n", "register"], "rank", how="max",
    )

    def _est(group: pa.Table) -> pa.Table:
        if group.num_rows == 0:
            return _NGRAM_CARD_SCHEMA.empty_table()
        vals = group.column("rank").to_pylist()
        s = sum(1 << (57 - v) for v in vals) + (256 - len(vals)) * (1 << 57)
        est = min(NGRAM_HLL_NUM // (1_000_000 * s), NGRAM_HLL_CAP)
        return pa.Table.from_pydict(
            {
                "n": group.column("n").slice(0, 1),
                "est": pa.array([est], pa.int64()),
            },
            schema=_NGRAM_CARD_SCHEMA,
        )

    return map_key_groups(merged, ["n"], _est)


# gopher_rules: the published Gopher (Rae et al. 2021, arXiv:2112.11446
# Table A1) filter thresholds, frozen on exact integer inequalities so
# the SQL oracle is bit-identical. Bits set = rule VIOLATED.
GOPHER_STOPS = ("the", "be", "to", "of", "and", "that", "have", "with")
GOPHER_FLAG_WORD_COUNT = 1       # n_words outside [50, 100_000]
GOPHER_FLAG_MEAN_WORD_LEN = 2    # mean word length outside [3, 10]
GOPHER_FLAG_SYMBOL_RATIO = 4     # (#'#' + #'...') / words > 0.1
GOPHER_FLAG_ALPHA_WORDS = 8      # < 80% of words contain [a-z]
GOPHER_FLAG_STOPWORDS = 16       # < 2 distinct Gopher stop words
_GOPHER_SCHEMA = pa.schema(
    [
        ("doc_id", pa.int64()),
        ("n_words", pa.int64()),
        ("flags", pa.int64()),
        ("keep", pa.int64()),
    ]
)


def gopher_rules(sf_dir: str) -> ray.data.Dataset:
    """The Gopher quality-filter rule bank — the named filter battery
    (Rae et al. 2021) most pretraining pipelines run verbatim, as a
    per-document flag bitmask + keep decision (bits record WHICH rule
    fired, the diagnostic a curation dashboard needs; ``doc_quality``
    is the scoring view, this is the published decision table).

    Frozen exact-integer semantics (mirrored by the SQL oracle); words
    = lowercase whitespace tokens (the ``bm25_search`` rule):

      bit 1: n_words outside [50, 100000]
      bit 2: mean word length outside [3, 10]
             (3·n ≤ Σlen(w) AND Σlen(w) ≤ 10·n)
      bit 4: symbol ratio — 10·(count('#') + count('...')) > n_words
      bit 8: alphabetic words — 5·|{w: w has [a-z]}| < 4·n_words
      bit 16: fewer than 2 DISTINCT Gopher stop words present
              ("the be to of and that have with")

    ``keep = 1`` iff flags == 0. The paper's line-shape rules (bullet/
    ellipsis line fractions) are N/A on this corpus's single-line
    documents and deliberately omitted. Stateless single-pass map —
    the trivially-parallel scale shape; no shuffle at any corpus size.
    """
    import re

    alpha_re = re.compile(r"[a-z]")

    def _batch(batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_pylist()
        out_n, out_f, out_k = [], [], []
        for t in batch.column("text").to_pylist():
            raw = t or ""
            toks = raw.strip().lower().split()
            n = len(toks)
            chars = sum(len(w) for w in toks)
            symbols = raw.count("#") + raw.count("...")
            alpha = sum(1 for w in toks if alpha_re.search(w))
            stops = sum(1 for s in GOPHER_STOPS if s in toks)
            flags = 0
            if not (50 <= n <= 100_000):
                flags |= GOPHER_FLAG_WORD_COUNT
            if not (3 * n <= chars <= 10 * n):
                flags |= GOPHER_FLAG_MEAN_WORD_LEN
            if 10 * symbols > n:
                flags |= GOPHER_FLAG_SYMBOL_RATIO
            if 5 * alpha < 4 * n:
                flags |= GOPHER_FLAG_ALPHA_WORDS
            if stops < 2:
                flags |= GOPHER_FLAG_STOPWORDS
            out_n.append(n)
            out_f.append(flags)
            out_k.append(1 if flags == 0 else 0)
        return pa.Table.from_pydict(
            {
                "doc_id": pa.array(ids, pa.int64()),
                "n_words": pa.array(out_n, pa.int64()),
                "flags": pa.array(out_f, pa.int64()),
                "keep": pa.array(out_k, pa.int64()),
            },
            schema=_GOPHER_SCHEMA,
        )

    return read_documents(sf_dir).map_batches(_batch, batch_format="pyarrow")


_BIGRAM_LM_SCHEMA = pa.schema(
    [
        ("w1", pa.string()),
        ("rnk", pa.int64()),
        ("w2", pa.string()),
        ("c", pa.int64()),
        ("p_e6", pa.int64()),
    ]
)


def bigram_surprisal(sf_dir: str) -> ray.data.Dataset:
    """Per-document bigram-LM surprisal — the KenLM-style conditional
    step up from ``unigram_surprisal``: a doc scores high when its
    ADJACENT word pairs are improbable under the corpus bigram model,
    catching shuffled/templated word salad that unigram frequencies
    miss entirely (every token common, no pair ever seen together).

    Frozen semantics (mirrored by the SQL oracle): tokens/bigrams as
    in ``bigram_lm``; per bigram ``bits = bit_length(den(w1) //
    c(w1, w2))`` — the integer ⌊log2⌋+1 surrogate for −log p(w2|w1),
    exact on both engines; per doc ``surprisal_bits = Σ tf·bits``,
    ``n_bigrams = Σ tf``, ``mean_bits_e3 = (1000·surprisal_bits) //
    n_bigrams``. Docs with fewer than 2 tokens have no bigrams and no
    row (the filter consumer treats absent as unscorable).

    Scale shape: per-doc bigram tf rows (repeats collapsed in-block);
    the corpus bigram-count table reduces FROM them (no second pass),
    den gathers back by w1; bits attach to the doc rows via ONE
    distributed (w1, w2) hash join — the bigram table is vocab²-
    bounded, corpus-scale on real webtext, so never broadcast; final
    per-doc integer-sum groupby. Text never shuffles.
    """
    import numpy as np

    from ..tuning import join_partitions as _jp
    from .grouped import gather_by_key, reduce_by_keys

    jp = _jp()
    docs = read_documents(sf_dir)

    dtf_schema = pa.schema(
        [
            ("doc_id", pa.int64()),
            ("w1", pa.string()),
            ("w2", pa.string()),
            ("tf", pa.int64()),
        ]
    )

    def _doc_tf(batch: pa.Table) -> pa.Table:
        # Vectorized per-doc bigram tf: adjacent-slice pair formation
        # with a same-parent mask, then Arrow's C++ group_by collapses
        # repeats in-block (replaces the per-row Counter loop).
        toks, par = _arrow_token_stream(batch)
        m = len(toks)
        if m < 2:
            return dtf_schema.empty_table()
        same = pc.equal(par.slice(0, m - 1), par.slice(1))
        ids = _flat(batch.column("doc_id").cast(pa.int64())).take(
            _flat(par.slice(0, m - 1).filter(same))
        )
        agg = (
            pa.table(
                {
                    "doc_id": ids,
                    "w1": _flat(toks.slice(0, m - 1).filter(same)),
                    "w2": _flat(toks.slice(1).filter(same)),
                }
            )
            .group_by(["doc_id", "w1", "w2"])
            .aggregate([([], "count_all")])
        )
        return agg.rename_columns(["doc_id", "w1", "w2", "tf"]).cast(dtf_schema)

    # The repartitions launder schema-less empty blocks ahead of the
    # (w1, w2) join (the cluster_pairs lesson: Acero's key resolution
    # raises on an untyped block on either side).
    dtf = (
        docs.map_batches(_doc_tf, batch_format="pyarrow")
        .repartition(jp)
        .materialize()
    )

    out_schema = pa.schema(
        [
            ("doc_id", pa.int64()),
            ("n_bigrams", pa.int64()),
            ("surprisal_bits", pa.int64()),
            ("mean_bits_e3", pa.int64()),
        ]
    )
    # A corpus with zero bigrams (every doc < 2 tokens) leaves every
    # downstream table schema-less-empty — branch around the whole
    # chain (the winnow_containment lesson; dtf is already
    # materialized so the count is free).
    if dtf.count() == 0:
        return ray.data.from_arrow(out_schema.empty_table())

    pair_schema = pa.schema(
        [("w1", pa.string()), ("w2", pa.string()), ("c", pa.int64())]
    )
    pairs = reduce_by_keys(
        dtf.map_batches(
            lambda t: t.select(["w1", "w2", "tf"]), batch_format="pyarrow"
        ),
        ["w1", "w2"], "tf", how="sum", out="c",
    ).materialize()
    den = reduce_by_keys(pairs, ["w1"], "c", how="sum", out="den")
    withden = gather_by_key(
        pairs, "w1", den, "w1", "den", "den", pair_schema, pa.int64()
    )

    bits_schema = pa.schema(
        [("w1", pa.string()), ("w2", pa.string()), ("bits", pa.int64())]
    )

    def _bits(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0 or "den" not in batch.column_names:
            return bits_schema.empty_table()
        c = batch.column("c").to_numpy(zero_copy_only=False)
        dn = batch.column("den").to_numpy(zero_copy_only=False)
        blen = np.frexp((dn // c).astype(np.float64))[1].astype(np.int64)
        return pa.Table.from_pydict(
            {
                "w1": batch.column("w1"),
                "w2": batch.column("w2"),
                "bits": pa.array(blen, pa.int64()),
            },
            schema=bits_schema,
        )

    bits = withden.map_batches(_bits, batch_format="pyarrow").repartition(jp)

    contrib_schema = pa.schema(
        [("doc_id", pa.int64()), ("tf", pa.int64()), ("wbits", pa.int64())]
    )

    def _contrib(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0 or "bits" not in batch.column_names:
            return contrib_schema.empty_table()
        tf = batch.column("tf").to_numpy(zero_copy_only=False)
        b = batch.column("bits").to_numpy(zero_copy_only=False)
        return pa.Table.from_pydict(
            {
                "doc_id": batch.column("doc_id").cast(pa.int64()),
                "tf": pa.array(tf, pa.int64()),
                "wbits": pa.array(tf * b, pa.int64()),
            },
            schema=contrib_schema,
        )

    from ray.data.aggregate import Sum

    sums = (
        dtf.join(bits, "inner", jp, on=("w1", "w2"))
        .map_batches(_contrib, batch_format="pyarrow")
        .groupby("doc_id")
        .aggregate(
            Sum("tf", alias_name="n_bigrams"),
            Sum("wbits", alias_name="surprisal_bits"),
        )
    )

    def _fin(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0 or "doc_id" not in batch.column_names:
            return out_schema.empty_table()
        nb = batch.column("n_bigrams").to_numpy(zero_copy_only=False)
        sb = batch.column("surprisal_bits").to_numpy(zero_copy_only=False)
        return pa.Table.from_pydict(
            {
                "doc_id": batch.column("doc_id").cast(pa.int64()),
                "n_bigrams": pa.array(nb, pa.int64()),
                "surprisal_bits": pa.array(sb, pa.int64()),
                "mean_bits_e3": pa.array((1000 * sb) // nb, pa.int64()),
            },
            schema=out_schema,
        )

    return sums.map_batches(_fin, batch_format="pyarrow")


def source_gini(sf_dir: str) -> "pa.Table":
    """Source-concentration Gini coefficient — the one-number diversity
    diagnostic for a corpus mix (0 = every source contributes equally,
    →1 = one source dominates); data-mixture work tracks it because a
    skewed crawl silently becomes a single-domain model.

    Frozen semantics (mirrored by the SQL oracle): per-source doc
    counts c_i ranked ascending by (count, source) i = 1..n;
    ``gini_e6 = (1e6 · (2·Σ i·c_i − (n+1)·Σc)) // (n·Σc)`` — the
    standard rank formula on the exact integer grid (rank ties within
    equal counts cannot change Σ i·c_i). Output: one row
    (n_sources, n_docs, gini_e6).

    Scale shape: the corpus collapses to per-source counts (a
    ``groupby(source).count()`` — source-count-bounded, the
    ``doc_length_quantiles`` driver-walk contract); only that tiny
    table reaches the driver.
    """
    counts = (
        ray.data.read_parquet(f"{sf_dir}/documents.parquet", columns=["source"])
        .groupby("source")
        .count()
        .take_all()
    )
    out_schema = pa.schema(
        [
            ("n_sources", pa.int64()),
            ("n_docs", pa.int64()),
            ("gini_e6", pa.int64()),
        ]
    )
    if not counts:
        return out_schema.empty_table()
    ranked = sorted(
        ((int(r["count()"]), r["source"] or "") for r in counts),
        key=lambda t: (t[0], t[1]),
    )
    n = len(ranked)
    tot = sum(c for c, _ in ranked)
    ic = sum(i * c for i, (c, _) in enumerate(ranked, start=1))
    gini_e6 = (1_000_000 * (2 * ic - (n + 1) * tot)) // (n * tot)
    return pa.Table.from_pydict(
        {
            "n_sources": pa.array([n], pa.int64()),
            "n_docs": pa.array([tot], pa.int64()),
            "gini_e6": pa.array([gini_e6], pa.int64()),
        },
        schema=out_schema,
    )


def vocab_coverage(
    sf_dir: str, targets: tuple[int, ...] = (50, 90, 95, 99)
) -> "pa.Table":
    """Vocabulary coverage curve — the smallest vocabulary (most-
    frequent-first) covering each target percentage of corpus token
    mass: the sizing analysis run before fixing a tokenizer's vocab
    budget or an embedding table (pairs with ``tokenizer_fertility``;
    Zipf makes the 50→99 gap the interesting number).

    Frozen semantics (mirrored by the SQL oracle): tokens = lowered
    whitespace split; vocabulary ordered by (cf desc, token asc);
    ``vocab_size`` = smallest rank r whose cumulative frequency
    satisfies ``cum(r) * 100 >= p * A`` (A = corpus token total);
    within the boundary frequency class every term contributes the
    same cf, so the partial rank is the exact integer ceil
    ``(p·A − 100·cum_before) / (100·cf)`` — the tie order never
    changes the answer and no per-term global sort is needed.

    Scale shape: per-block token Counters collapse before the ONE
    vocabulary shuffle (``reduce_by_keys``); the vocabulary then
    collapses to its FREQUENCY HISTOGRAM (one row per distinct cf —
    bounded ~O(√total_tokens) by Zipf, independent of vocab size), and
    only that histogram reaches the driver for the cumulative walk
    (the ``doc_length_quantiles`` contract).
    """
    from .grouped import reduce_by_keys

    docs = read_documents(sf_dir)

    tok_schema = pa.schema([("tok", pa.string()), ("c", pa.int64())])

    def _tok_partial(batch: pa.Table) -> pa.Table:
        # Vectorized token-count partial (value_counts over the
        # flattened token stream, replacing the Counter loop).
        toks, _ = _arrow_token_stream(batch)
        if len(toks) == 0:
            return tok_schema.empty_table()
        vc = pc.value_counts(toks)
        return pa.Table.from_arrays(
            [vc.field("values"), vc.field("counts")], schema=tok_schema
        )

    cf = reduce_by_keys(
        docs.map_batches(_tok_partial, batch_format="pyarrow"),
        ["tok"], "c", how="sum", out="cf",
    )
    hist = reduce_by_keys(
        cf.map_batches(lambda t: t.select(["cf"]), batch_format="pyarrow"),
        ["cf"], None, how="count", out="n_terms",
    ).take_all()

    out_schema = pa.schema(
        [
            ("coverage_pct", pa.int64()),
            ("vocab_size", pa.int64()),
            ("cum_tokens", pa.int64()),
        ]
    )
    hist.sort(key=lambda r: -int(r["cf"]))
    a_total = sum(int(r["cf"]) * int(r["n_terms"]) for r in hist)
    if a_total == 0:
        return out_schema.empty_table()

    pcts, sizes, cums = [], [], []
    for p in targets:
        need = p * a_total
        cum_before = 0
        n_higher = 0
        for r in hist:
            cfv, nt = int(r["cf"]), int(r["n_terms"])
            mass = cfv * nt
            if (cum_before + mass) * 100 >= need:
                k = (need - 100 * cum_before + 100 * cfv - 1) // (100 * cfv)
                pcts.append(p)
                sizes.append(n_higher + k)
                cums.append(cum_before + k * cfv)
                break
            cum_before += mass
            n_higher += nt
    return pa.Table.from_pydict(
        {
            "coverage_pct": pa.array(pcts, pa.int64()),
            "vocab_size": pa.array(sizes, pa.int64()),
            "cum_tokens": pa.array(cums, pa.int64()),
        },
        schema=out_schema,
    )


def bigram_lm(
    sf_dir: str, min_count: int = 5, k: int = 3
) -> ray.data.Dataset:
    """Bigram language-model table: the top-``k`` continuations of
    every prefix word with their exact conditional probabilities — the
    count-based n-gram LM estimation step (Kneser-Ney's raw-count
    input; also the autocomplete / next-token-suggestion table), and
    the CONDITIONAL ranking the symmetric ``pmi_pairs`` /
    ``top_bigrams`` rollups don't give.

    Frozen semantics (mirrored by the SQL oracle): tokens = lowercase
    whitespace split; adjacent ordered pairs (w1, w2); continuations
    with corpus count < ``min_count`` drop; ``p_e6 = (1e6·c(w1,w2)) //
    den(w1)`` where den(w1) = Σ_w2 c(w1,w2) over ALL continuations
    (so kept rows of a prefix need not sum to 1e6 — the denominator
    is the true LM normalizer, not the survivors'); rank by (c desc,
    w2 asc), top ``k`` per prefix.

    Scale shape: per-block bigram Counters collapse repeats before
    the ONE (w1, w2) shuffle; the denominator reduces FROM the pair
    table (no second corpus pass) and gathers back by w1 with the
    sort-gather; ranking is a per-prefix ``map_key_groups`` top-k.
    Text never shuffles; the pair table is vocab²-bounded per block.
    """
    import numpy as np

    from .grouped import gather_by_key, map_key_groups, reduce_by_keys

    docs = read_documents(sf_dir)

    pair_schema = pa.schema(
        [("w1", pa.string()), ("w2", pa.string()), ("c", pa.int64())]
    )

    def _pair_partial(batch: pa.Table) -> pa.Table:
        # Vectorized ordered-bigram partial (adjacent slices + same-
        # parent mask + Arrow group_by), replacing the Counter loop.
        toks, par = _arrow_token_stream(batch)
        m = len(toks)
        if m < 2:
            return pair_schema.empty_table()
        same = pc.equal(par.slice(0, m - 1), par.slice(1))
        agg = (
            pa.table(
                {
                    "w1": _flat(toks.slice(0, m - 1).filter(same)),
                    "w2": _flat(toks.slice(1).filter(same)),
                }
            )
            .group_by(["w1", "w2"])
            .aggregate([([], "count_all")])
        )
        return agg.rename_columns(["w1", "w2", "c"]).cast(pair_schema)

    pairs = reduce_by_keys(
        docs.map_batches(_pair_partial, batch_format="pyarrow"),
        ["w1", "w2"], "c", how="sum",
    ).materialize()

    den = reduce_by_keys(pairs, ["w1"], "c", how="sum", out="den")

    withden = gather_by_key(
        pairs, "w1", den, "w1", "den", "den", pair_schema, pa.int64()
    )

    def _filter(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        if batch.num_rows == 0:
            return batch
        return batch.filter(pc.greater_equal(batch.column("c"), min_count))

    def _topk(group: pa.Table) -> pa.Table:
        if group.num_rows == 0:
            return _BIGRAM_LM_SCHEMA.empty_table()
        g = group.sort_by([("c", "descending"), ("w2", "ascending")]).slice(0, k)
        c = g.column("c").to_numpy(zero_copy_only=False)
        den_v = g.column("den").to_numpy(zero_copy_only=False)
        return pa.Table.from_pydict(
            {
                "w1": g.column("w1"),
                "rnk": pa.array(np.arange(1, g.num_rows + 1, dtype=np.int64)),
                "w2": g.column("w2"),
                "c": g.column("c").cast(pa.int64()),
                "p_e6": pa.array(1_000_000 * c // den_v, pa.int64()),
            },
            schema=_BIGRAM_LM_SCHEMA,
        )

    return map_key_groups(
        withden.map_batches(_filter, batch_format="pyarrow"), "w1", _topk
    )


# The registered gram width for ngram_novelty — the oracle SQL in
# __ray_entry__.py is GENERATED from this constant (gram concat, length
# floor and range bounds all derive from it), so op and oracle cannot
# drift if a future registration changes n (ADVICE r4 #2).
NGRAM_NOVELTY_N = 3


def ngram_novelty(sf_dir: str, n: int = NGRAM_NOVELTY_N) -> ray.data.Dataset:
    """Per-document n-gram novelty in ingest order — the
    marginal-contribution diagnostic an incremental crawl uses to
    decide when further fetching stops adding new content (novelty
    collapsing toward zero means the frontier is exhausted).
    ``ngram_cardinality`` gives the corpus-level Heaps-law view; this
    is its exact per-document attribution.

    Frozen rule (mirrored exactly in SQL): tokens are the
    ``top_ngrams`` tokenization (lowercase whitespace split); a
    document's gram set is its DISTINCT word ``n``-grams keyed by
    ``substr(md5(gram), 1, 16)`` (dedup happens on the KEY, so both
    sides agree even under a hash collision); ingest order is
    ``doc_id`` ascending; a gram is NOVEL in exactly the minimum-
    doc_id document containing it. Output one row per document with
    >= 1 gram: (doc_id, n_distinct, n_novel) ordered by doc_id — the
    novelty rate is the exact integer pair, no float division.

    Gate-level cross-check (cheap invariant): sum(n_novel) over all
    documents MUST equal the corpus-wide distinct gk count (one
    groupby-count over the pair rows) — each gram is novel in exactly
    one document. Correctness of the block pass depends on Ray's
    range sort keeping all rows of an equal gk in one block (the
    ``line_dedup`` invariant); a silent split would inflate n_novel.
    Two detectors: this equality at the gate
    (``tests/test_ops.py::test_ngram_novelty_invariant``) and, in the
    production path itself, in-band RANGE_GUARD_KEY sentinel rows
    carrying each block's [min, max] gk range, checked for pairwise
    disjointness in the summing pass (raises loudly on a split key).

    Scale shape (the ``line_dedup`` discipline — nothing corpus-scale
    ever lands on the driver, ONE corpus shuffle):

      1. map_batches docs -> DISTINCT (gk, doc_id) pair rows, bounded
         by tokens/doc; the fixed-width 16-hex md5 key ships instead
         of gram text, so the shuffle payload is independent of gram
         length.
      2. ONE global ``sort("gk")`` co-locates each gram's rows (Ray's
         range sort keeps equal single-column keys in one block — the
         same invariant ``line_dedup`` pins with its sorted-block
         pass); a vectorized block pass computes each group's min
         doc_id with ``np.minimum.reduceat`` and collapses the block
         to per-doc PARTIALS (doc_id, nd, nn) — at most one row per
         doc per block, so step 3's input is doc-sized, not
         gram-sized.
      3. one small ``groupby(doc_id).sum`` over the partials, then a
         doc-sized sort.
    """
    import hashlib

    import numpy as np

    from .grouped import RANGE_GUARD_KEY, group_bounds, guarded_sum_by_key

    docs = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    )

    def _pairs(batch: pa.Table) -> pa.Table:
        gks: list[str] = []
        ids: list[int] = []
        for d, t in zip(
            batch.column("doc_id").to_pylist(), batch.column("text").to_pylist()
        ):
            toks = (t or "").lower().split()
            if len(toks) < n:
                continue
            keys = {
                hashlib.md5(
                    " ".join(toks[i : i + n]).encode("utf-8")
                ).hexdigest()[:16]
                for i in range(len(toks) - n + 1)
            }
            gks.extend(keys)
            ids.extend([int(d)] * len(keys))
        return pa.Table.from_pydict(
            {
                "gk": pa.array(gks, pa.string()),
                "doc_id": pa.array(ids, pa.int64()),
            }
        )

    pairs = docs.map_batches(_pairs, batch_format="pyarrow")

    # gkey carries the guard sentinels' block min/max gram key (null on
    # real partial rows); nn doubles as the sentinels' 0=min/1=max flag.
    _PARTIAL_SCHEMA = pa.schema(
        [
            ("doc_id", pa.int64()),
            ("nd", pa.int64()),
            ("nn", pa.int64()),
            ("gkey", pa.string()),
        ]
    )

    def _partials(block: pa.Table) -> pa.Table:
        if block.num_rows == 0:
            return _PARTIAL_SCHEMA.empty_table()
        block = block.sort_by([("gk", "ascending")]).combine_chunks()
        n = block.num_rows
        ids = block.column("doc_id").to_numpy(zero_copy_only=False)
        bounds = group_bounds(block, ["gk"])
        min_doc = np.minimum.reduceat(ids, bounds[:-1])
        tot_ids, tot_c = np.unique(ids, return_counts=True)
        nn = np.zeros(len(tot_ids), dtype=np.int64)
        nov_ids, nov_c = np.unique(min_doc, return_counts=True)
        # every group min is one of the block's doc_ids, so searchsorted
        # into tot_ids is exact
        nn[np.searchsorted(tot_ids, nov_ids)] = nov_c
        data = pa.Table.from_pydict(
            {
                "doc_id": pa.array(tot_ids.astype(np.int64)),
                "nd": pa.array(tot_c.astype(np.int64)),
                "nn": pa.array(nn),
                "gkey": pa.nulls(len(tot_ids), pa.string()),
            },
            schema=_PARTIAL_SCHEMA,
        )
        # In-band guard rows: min-doc attribution above relies on no gk
        # spanning two sorted blocks; ship this block's [min, max] gk
        # range for the co-located disjointness check downstream.
        guard = pa.Table.from_pydict(
            {
                "doc_id": pa.array([RANGE_GUARD_KEY] * 2, pa.int64()),
                "nd": pa.array([n, n], pa.int64()),
                "nn": pa.array([0, 1], pa.int64()),
                "gkey": pa.array(
                    [
                        block.column("gk")[0].as_py(),
                        block.column("gk")[n - 1].as_py(),
                    ],
                    pa.string(),
                ),
            },
            schema=_PARTIAL_SCHEMA,
        )
        return pa.concat_tables([data, guard])

    partials = pairs.sort("gk").map_batches(
        _partials, batch_format="pyarrow", batch_size=None
    )
    agg = guarded_sum_by_key(
        partials,
        "doc_id",
        {"nd": "n_distinct", "nn": "n_novel"},
        guard_val_col="gkey",
        guard_flag_col="nn",
        op="ngram_novelty",
        out_schema=pa.schema(
            [
                ("doc_id", pa.int64()),
                ("n_distinct", pa.int64()),
                ("n_novel", pa.int64()),
            ]
        ),
    )
    return agg.sort("doc_id")


_READABILITY_SCHEMA = pa.schema(
    [
        ("doc_id", pa.int64()),
        ("n_words", pa.int64()),
        ("n_sentences", pa.int64()),
        ("n_syllables", pa.int64()),
        ("fk_grade_e3", pa.int64()),
        ("ease_e3", pa.int64()),
    ]
)


def readability(sf_dir: str) -> ray.data.Dataset:
    """Flesch reading ease + Flesch-Kincaid grade (Flesch 1948;
    Kincaid et al. 1975) — the classic readability axis the quality
    family (length/punct/stopword shapes, Gopher rules, surprisal)
    doesn't measure: sentence length x syllable density. Web-corpus
    curation uses it both as a filter (strip word-salad and legal
    boilerplate) and as a curriculum key (easy-first ordering).

    Frozen integer rules (mirrored exactly by the SQL oracle — floor
    divisions on the e3 grid, same discipline as the surprisal ops):
    words = lowercase whitespace tokens; syllables(word) = max(1,
    count of [aeiouy]+ runs in it); sentences = max(1, count of
    [.!?]+ runs in the RAW text); with W, S, Syl per document:

      fk_grade_e3 = (390·W) // S + (11800·Syl) // W - 15590
      ease_e3     = 206835 - (1015·W) // S - (84600·Syl) // W

    Output one row per document with >= 1 word, ordered by doc_id.

    Scale shape: pure per-batch map — the token stream, per-token
    vowel-run counts (one RE2 kernel), and per-doc sums (bincount)
    are all vectorized; no shuffle at all beyond the final doc-sized
    sort.
    """
    import numpy as np

    docs = read_documents(sf_dir)

    def _per_batch(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return _READABILITY_SCHEMA.empty_table()
        n = batch.num_rows
        ids = batch.column("doc_id").cast(pa.int64()).to_numpy(
            zero_copy_only=False
        )
        raw = pc.fill_null(batch.column("text").cast(pa.string()), "")
        sent = pc.count_substring_regex(raw, r"[.!?]+").to_numpy(
            zero_copy_only=False
        ).astype(np.int64)
        toks, par = _arrow_token_stream(batch)
        par_np = par.to_numpy(zero_copy_only=False).astype(np.int64)
        words = np.bincount(par_np, minlength=n).astype(np.int64)
        runs = pc.count_substring_regex(toks, r"[aeiouy]+").to_numpy(
            zero_copy_only=False
        ).astype(np.int64)
        syl = np.bincount(
            par_np, weights=np.maximum(runs, 1), minlength=n
        ).astype(np.int64)
        keep = words >= 1
        if not keep.any():
            return _READABILITY_SCHEMA.empty_table()
        W, Syl = words[keep], syl[keep]
        S = np.maximum(sent[keep], 1)
        fk = (390 * W) // S + (11800 * Syl) // W - 15590
        ease = 206_835 - (1015 * W) // S - (84_600 * Syl) // W
        return pa.Table.from_pydict(
            {
                "doc_id": pa.array(ids[keep]),
                "n_words": pa.array(W),
                "n_sentences": pa.array(S),
                "n_syllables": pa.array(Syl),
                "fk_grade_e3": pa.array(fk),
                "ease_e3": pa.array(ease),
            },
            schema=_READABILITY_SCHEMA,
        )

    return docs.map_batches(_per_batch, batch_format="pyarrow").sort("doc_id")


_SCRIPT_SCHEMA = pa.schema(
    [
        ("doc_id", pa.int64()),
        ("n_latin", pa.int64()),
        ("n_cyrillic", pa.int64()),
        ("n_greek", pa.int64()),
        ("n_han", pa.int64()),
        ("n_arabic", pa.int64()),
        ("majority", pa.string()),
    ]
)

_SCRIPT_SNIPPETS = [
    " привет мир",        # doc_id % 5 == 0: Cyrillic
    " γειά σου κόσμε",    # 1: Greek
    " 你好世界",           # 2: Han
    " مرحبا بالعالم",      # 3: Arabic
    "",                    # 4: none
]

_SCRIPT_NAMES = ["arabic", "cyrillic", "greek", "han", "latin"]


def script_profile(sf_dir: str) -> ray.data.Dataset:
    """Unicode-script histogram + majority script per document — the
    writing-system axis of language ID (a page can be ``lang=ru`` yet
    Latin-transliterated, or mix CJK into English; script mixture is
    the standard pre-filter before n-gram language models, cf. CLD's
    script stage). Since the synthetic corpus is ASCII, deterministic
    multilingual snippets are appended per ``doc_id % 5`` (the
    mojibake/pii seeding discipline) so every script path is
    exercised end-to-end.

    Frozen rules (mirrored exactly by the SQL oracle — BOTH engines
    run RE2, so ``\\p{Script}`` classes agree by construction):
    per-script counts are ``\\p{Latin|Cyrillic|Greek|Han|Arabic}``
    char matches over text + snippet; ``majority`` = the script with
    the highest count, ties broken by name ascending ('arabic' <
    'cyrillic' < 'greek' < 'han' < 'latin'); all-zero docs report
    'latin' (the tie rule would say 'arabic'; an explicit empty
    fallback is more honest than a coin). Output one row per doc
    ordered by doc_id.

    Scale shape: pure vectorized per-batch map (five RE2 count
    kernels + one argmax), no shuffle beyond the doc-sized sort.
    """
    import numpy as np

    docs = read_documents(sf_dir)

    def _per_batch(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return _SCRIPT_SCHEMA.empty_table()
        ids = batch.column("doc_id").cast(pa.int64())
        ids_np = ids.to_numpy(zero_copy_only=False)
        base = pc.fill_null(batch.column("text").cast(pa.string()), "")
        snip = pa.array([_SCRIPT_SNIPPETS[int(d) % 5] for d in ids_np])
        text = pc.binary_join_element_wise(base, snip, "")
        counts = {
            name: pc.count_substring_regex(text, rf"\p{{{cls}}}")
            .cast(pa.int64())
            .to_numpy(zero_copy_only=False)
            for name, cls in [
                ("arabic", "Arabic"),
                ("cyrillic", "Cyrillic"),
                ("greek", "Greek"),
                ("han", "Han"),
                ("latin", "Latin"),
            ]
        }
        mat = np.stack([counts[n] for n in _SCRIPT_NAMES])  # name-asc rows
        best = mat.argmax(axis=0)  # argmax takes the FIRST max → name asc
        majority = np.array(_SCRIPT_NAMES, dtype=object)[best]
        majority[mat.sum(axis=0) == 0] = "latin"
        return pa.Table.from_pydict(
            {
                "doc_id": ids,
                "n_latin": pa.array(counts["latin"]),
                "n_cyrillic": pa.array(counts["cyrillic"]),
                "n_greek": pa.array(counts["greek"]),
                "n_han": pa.array(counts["han"]),
                "n_arabic": pa.array(counts["arabic"]),
                "majority": pa.array(list(majority), pa.string()),
            },
            schema=_SCRIPT_SCHEMA,
        )

    return docs.map_batches(_per_batch, batch_format="pyarrow").sort("doc_id")


_COMPRESS_SCHEMA = pa.schema(
    [
        ("doc_id", pa.int64()),
        ("raw_bytes", pa.int64()),
        ("zlib_bytes", pa.int64()),
        ("ratio_e6", pa.int64()),
        ("keep", pa.int64()),
    ]
)


def compression_quality(sf_dir: str, min_ratio_e6: int = 250_000) -> ray.data.Dataset:
    """Compression-ratio quality filter — the "too compressible"
    heuristic web-curation pipelines run alongside the Gopher rules:
    highly repetitive pages (keyword stuffing, template spam, scraped
    tag soup) deflate far below natural prose, so a zlib ratio under
    ``min_ratio_e6`` flags the page for removal. (Deduplicating at
    chunk level catches cross-document repetition; this catches
    WITHIN-document repetition in one cheap pass.)

    Frozen rule: raw = UTF-8 bytes of ``coalesce(text, '')``; comp =
    ``len(zlib.compress(raw, 9))``; ``ratio_e6 = 1e6·comp // raw``
    (empty docs report 1e6); ``keep = 0`` iff raw > 0 and ratio <
    ``min_ratio_e6``. Output one row per doc ordered by doc_id.

    Correctness surface: DuckDB has no zlib, so the oracle is the
    SEQUENTIAL-kernel pseudo-oracle (the extract_pipeline
    discipline) — a driver-side single-process pass over the corpus
    materializes (doc_id, raw_bytes, zlib_bytes), code-signed and
    cached, and plain SQL derives ratio/keep from it; the gate then
    verifies the DISTRIBUTED run byte-for-byte against the sequential
    kernel (row loss, shuffle and merge bugs are the detectable
    class; the kernel itself is stdlib zlib on both sides).

    Scale shape: stateless per-batch map (zlib per row is the
    inherent cost, same class as payload hashing); no shuffle beyond
    the doc-sized sort.
    """
    import zlib

    docs = read_documents(sf_dir)

    def _per_batch(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return _COMPRESS_SCHEMA.empty_table()
        ids, raws, comps, ratios, keeps = [], [], [], [], []
        for d, t in zip(
            batch.column("doc_id").to_pylist(), batch.column("text").to_pylist()
        ):
            raw = (t or "").encode("utf-8")
            comp = len(zlib.compress(raw, 9))
            ratio = 1_000_000 * comp // len(raw) if raw else 1_000_000
            ids.append(int(d))
            raws.append(len(raw))
            comps.append(comp)
            ratios.append(ratio)
            keeps.append(0 if (raw and ratio < min_ratio_e6) else 1)
        return pa.Table.from_pydict(
            {
                "doc_id": ids,
                "raw_bytes": raws,
                "zlib_bytes": comps,
                "ratio_e6": ratios,
                "keep": keeps,
            },
            schema=_COMPRESS_SCHEMA,
        )

    return docs.map_batches(_per_batch, batch_format="pyarrow").sort("doc_id")


_KAPPA_SCHEMA = pa.schema(
    [
        ("n_docs", pa.int64()),
        ("n11", pa.int64()),
        ("n10", pa.int64()),
        ("n01", pa.int64()),
        ("n00", pa.int64()),
        ("p_o_e6", pa.int64()),
        ("p_e_e6", pa.int64()),
        ("kappa_e6", pa.int64()),
    ]
)


def classifier_agreement(sf_dir: str) -> ray.data.Dataset:
    """Cohen's kappa between the two quality gates — the rule-based
    ``quality_filter`` (Gopher shapes) and the model-based
    ``quality_classifier`` (fastText-style inference). Curation
    pipelines run exactly this audit before swapping one gate for the
    other: raw percent agreement overstates consensus when both
    classifiers mostly keep, and kappa corrects for that chance
    agreement (Cohen 1960).

    Frozen integer rules (mirrored by a SQL oracle COMPOSED from the
    two ops' own oracles, so the three can never drift): docs scored
    by BOTH gates (inner join on doc_id); with the 2×2 table (n11 =
    both keep … n00 = both drop), ``p_o_e6 = 1e6·(n11+n00) // n``,
    ``p_e_e6 = 1e6·((n11+n10)·(n11+n01) + (n01+n00)·(n10+n00)) //
    n²``, and ``kappa_e6`` = toward-ZERO division of
    ``1e6·(p_o_e6 - p_e_e6)`` by ``1e6 - p_e_e6`` (toward-zero
    because DuckDB's ``//`` truncates negatives while Python floors;
    degenerate ``p_e_e6 = 1e6`` reports 0). One output row.

    Scale shape: both inputs are doc-sized keep tables; the join is
    the ``gather_by_key`` sort-gather, the 2×2 table reduces via
    per-block partials into one tiny aggregate — only five counters
    ever reach the driver.
    """
    import numpy as np
    from ray.data.aggregate import Sum

    from .grouped import gather_by_key

    fk_schema = pa.schema([("doc_id", pa.int64()), ("fk", pa.int64())])

    def _fk(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return fk_schema.empty_table()
        return pa.Table.from_pydict(
            {
                "doc_id": batch.column("doc_id").cast(pa.int64()),
                "fk": batch.column("keep").cast(pa.int64()),
            },
            schema=fk_schema,
        )

    def _ck(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return pa.schema(
                [("doc_id", pa.int64()), ("ck", pa.int64())]
            ).empty_table()
        return pa.Table.from_pydict(
            {
                "doc_id": batch.column("doc_id").cast(pa.int64()),
                "ck": batch.column("keep").cast(pa.int64()),
            }
        )

    a = quality_filter(sf_dir).map_batches(_fk, batch_format="pyarrow")
    b = quality_classifier(sf_dir).map_batches(_ck, batch_format="pyarrow")
    joined = gather_by_key(
        a, "doc_id", b, "doc_id", "ck", "ck", fk_schema, pa.int64()
    )

    part_schema = pa.schema(
        [(c, pa.int64()) for c in ("n", "n11", "n10", "n01", "n00")]
    )

    def _partial(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return part_schema.empty_table()
        f = batch.column("fk").to_numpy(zero_copy_only=False)
        c = batch.column("ck").to_numpy(zero_copy_only=False)
        return pa.Table.from_pydict(
            {
                "n": [len(f)],
                "n11": [int(((f == 1) & (c == 1)).sum())],
                "n10": [int(((f == 1) & (c == 0)).sum())],
                "n01": [int(((f == 0) & (c == 1)).sum())],
                "n00": [int(((f == 0) & (c == 0)).sum())],
            },
            schema=part_schema,
        )

    agg = joined.map_batches(_partial, batch_format="pyarrow").aggregate(
        *(Sum(c) for c in ("n", "n11", "n10", "n01", "n00"))
    )
    n = int(agg["sum(n)"] or 0)
    n11, n10 = int(agg["sum(n11)"] or 0), int(agg["sum(n10)"] or 0)
    n01, n00 = int(agg["sum(n01)"] or 0), int(agg["sum(n00)"] or 0)
    if n == 0:
        return ray.data.from_arrow(_KAPPA_SCHEMA.empty_table())
    p_o = 1_000_000 * (n11 + n00) // n
    p_e = 1_000_000 * ((n11 + n10) * (n11 + n01) + (n01 + n00) * (n10 + n00)) // (
        n * n
    )
    if p_e == 1_000_000:
        kappa = 0
    else:
        num, den = 1_000_000 * (p_o - p_e), 1_000_000 - p_e
        kappa = -((-num) // den) if num < 0 else num // den  # toward zero
    return ray.data.from_arrow(
        pa.Table.from_pydict(
            {
                "n_docs": [n],
                "n11": [n11],
                "n10": [n10],
                "n01": [n01],
                "n00": [n00],
                "p_o_e6": [p_o],
                "p_e_e6": [p_e],
                "kappa_e6": [kappa],
            },
            schema=_KAPPA_SCHEMA,
        )
    )


_DATE_SCHEMA = pa.schema(
    [
        ("doc_id", pa.int64()),
        ("n_dates", pa.int64()),
        ("best_date", pa.string()),
    ]
)

_MONTHS = [
    "January", "February", "March", "April", "May", "June",
    "July", "August", "September", "October", "November", "December",
]


def date_extract(sf_dir: str) -> ray.data.Dataset:
    """Publication-date extraction — the metadata step a main-content
    extractor runs per page (trafilatura's ``extract_date``): collect
    date candidates and pick the most trustworthy by source priority.
    Deterministic seeding per ``doc_id % 4`` (the script-profile
    discipline) gives every path ground truth: 0 → an
    ``article:published_time`` meta tag; 1 → a textual
    "Month DD, YYYY"; 2 → a bare ISO date; 3 → none.

    Frozen rules (identical RE2 on both engines): candidates are ISO
    ``\\d{4}-\\d{2}-\\d{2}`` matches plus "MonthName D, YYYY"
    matches; ``n_dates`` counts both; ``best_date`` prefers the meta
    tag's content, then the first ISO match, then the (zero-padded)
    converted textual date, else ''. Output one row per doc ordered
    by doc_id.

    Scale shape: stateless vectorized map — three RE2 kernels + one
    ``index_in`` month lookup; no shuffle beyond the doc-sized sort.
    """
    import numpy as np

    docs = read_documents(sf_dir)

    month_arr = pa.array(_MONTHS, pa.string())

    def _per_batch(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return _DATE_SCHEMA.empty_table()
        ids = batch.column("doc_id").cast(pa.int64())
        ids_np = ids.to_numpy(zero_copy_only=False)
        base = pc.fill_null(batch.column("text").cast(pa.string()), "")
        mm = 1 + ids_np % 12
        dd = 1 + ids_np % 28
        snips = []
        for d, m, day in zip(ids_np, mm, dd):
            k = int(d) % 4
            if k == 0:
                snips.append(
                    f' <meta property="article:published_time" '
                    f'content="2023-{m:02d}-{day:02d}">'
                )
            elif k == 1:
                snips.append(f" Published {_MONTHS[int(m) - 1]} {day}, 2022")
            elif k == 2:
                snips.append(f" changelog 2021-{m:02d}-{day:02d} entry")
            else:
                snips.append("")
        text = pc.binary_join_element_wise(base, pa.array(snips), "")

        meta = pc.struct_field(
            pc.extract_regex(
                text,
                r'article:published_time" content="(?P<d>\d{4}-\d{2}-\d{2})"',
            ),
            "d",
        )
        iso = pc.struct_field(
            pc.extract_regex(text, r"(?P<d>\d{4}-\d{2}-\d{2})"), "d"
        )
        mon_pat = "|".join(_MONTHS)
        named = pc.extract_regex(
            text, rf"(?P<mon>{mon_pat}) (?P<day>\d{{1,2}}), (?P<y>\d{{4}})"
        )
        mon_num = pc.add(
            pc.index_in(pc.struct_field(named, "mon"), month_arr),
            pa.scalar(1, pa.int32()),
        )
        n_iso = pc.count_substring_regex(text, r"\d{4}-\d{2}-\d{2}")
        n_named = pc.count_substring_regex(
            text, rf"(?:{mon_pat}) \d{{1,2}}, \d{{4}}"
        )
        n_dates = pc.add(n_iso.cast(pa.int64()), n_named.cast(pa.int64()))

        meta_np = meta.to_pylist()
        iso_np = iso.to_pylist()
        mon_np = mon_num.to_pylist()
        day_np = pc.struct_field(named, "day").to_pylist()
        y_np = pc.struct_field(named, "y").to_pylist()
        best = []
        for mt, io, mn, day, y in zip(meta_np, iso_np, mon_np, day_np, y_np):
            if mt:
                best.append(mt)
            elif io:
                best.append(io)
            elif mn is not None:
                best.append(f"{y}-{int(mn):02d}-{int(day):02d}")
            else:
                best.append("")
        return pa.Table.from_pydict(
            {
                "doc_id": ids,
                "n_dates": n_dates,
                "best_date": pa.array(best, pa.string()),
            },
            schema=_DATE_SCHEMA,
        )

    return docs.map_batches(_per_batch, batch_format="pyarrow").sort("doc_id")


_DRIFT_SCHEMA = pa.schema(
    [
        ("n_tokens_a", pa.int64()),
        ("n_tokens_b", pa.int64()),
        ("vocab_a", pa.int64()),
        ("vocab_b", pa.int64()),
        ("vocab_union", pa.int64()),
        ("tv_e6", pa.int64()),
    ]
)


def corpus_drift(sf_dir: str) -> ray.data.Dataset:
    """Distribution drift between two crawl snapshots — the monitor a
    production pipeline runs on every ingest (data-drift detection):
    total-variation distance between the token distributions of the
    two halves, ``TV = ½ Σ_t |p_t - q_t|`` — 0 for identical mixes, 1
    for disjoint vocabularies. Snapshot split is the ``bloom_dedup``
    coin: side A = even doc_id, side B = odd.

    Frozen exact arithmetic (mirrored by the SQL oracle): with
    per-token occurrence counts c1/c2 and totals N1/N2,
    ``tv_e6 = (1e6 · Σ_t |c1_t·N2 - c2_t·N1|) // (2·N1·N2)`` — the
    cross-multiplied form avoids any division until the single final
    floor. Products reach ~N² and overflow int64 at true corpus
    scale, so the per-token accumulation uses Python big ints (the
    SQL side uses HUGEINT); the shuffled rows themselves stay int64.
    Output one row: (n_tokens_a, n_tokens_b, vocab_a, vocab_b,
    vocab_union, tv_e6).

    Scale shape: per-block Arrow group_by partials collapse repeats
    before ONE (token, side) ``reduce_by_keys`` sum (text never
    shuffles, tokens do — the ``line_dedup`` cost class); the reduced
    table materializes once and is consumed twice (totals fold, then
    a token-sorted block pass emitting one partial row per block);
    only six counters reach the driver.
    """
    from .grouped import group_bounds, reduce_by_keys

    docs = read_documents(sf_dir)

    pair_schema = pa.schema(
        [("tok", pa.string()), ("side", pa.int64()), ("c", pa.int64())]
    )

    def _pairs(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return pair_schema.empty_table()
        toks, par = _arrow_token_stream(batch)
        if len(toks) == 0:
            return pair_schema.empty_table()
        ids = batch.column("doc_id").cast(pa.int64())
        side = pc.bit_wise_and(ids, pa.scalar(1, pa.int64()))
        agg = (
            pa.table({"tok": toks, "side": side.take(par)})
            .group_by(["tok", "side"])
            .aggregate([([], "count_all")])
        )
        return agg.rename_columns(["tok", "side", "c"]).cast(pair_schema)

    counts = reduce_by_keys(
        docs.map_batches(_pairs, batch_format="pyarrow"),
        ["tok", "side"], "c", how="sum",
    ).materialize()

    totals = {0: 0, 1: 0}
    for r in counts.map_batches(
        lambda b: pa.TableGroupBy(b, "side").aggregate([("c", "sum")]),
        batch_format="pyarrow",
    ).take_all():
        totals[int(r["side"])] += int(r["c_sum"])
    n1, n2 = totals[0], totals[1]

    part_schema = pa.schema(
        [(c, pa.int64()) for c in ("s", "v1", "v2", "vu")]
    )

    def _block(block: pa.Table) -> pa.Table:
        if block.num_rows == 0:
            return part_schema.empty_table()
        block = block.sort_by(
            [("tok", "ascending"), ("side", "ascending")]
        ).combine_chunks()
        bounds = group_bounds(block, ["tok"])
        sides = block.column("side").to_pylist()
        cs = block.column("c").to_pylist()
        s = 0  # Python int: |c1*N2 - c2*N1| sums past int64 at scale
        v1 = v2 = 0
        for lo, hi in zip(bounds[:-1], bounds[1:]):
            c1 = c2 = 0
            for i in range(lo, hi):
                if sides[i] == 0:
                    c1 += cs[i]
                else:
                    c2 += cs[i]
            s += abs(c1 * n2 - c2 * n1)
            v1 += 1 if c1 > 0 else 0
            v2 += 1 if c2 > 0 else 0
        return pa.Table.from_pydict(
            {"s": [s], "v1": [v1], "v2": [v2], "vu": [len(bounds) - 1]},
            schema=part_schema,
        )

    s = v1 = v2 = vu = 0
    for r in counts.sort("tok").map_batches(
        _block, batch_format="pyarrow", batch_size=None
    ).take_all():
        s += int(r["s"]); v1 += int(r["v1"]); v2 += int(r["v2"]); vu += int(r["vu"])
    tv = 1_000_000 * s // (2 * n1 * n2) if n1 and n2 else 1_000_000
    return ray.data.from_arrow(
        pa.Table.from_pydict(
            {
                "n_tokens_a": [n1],
                "n_tokens_b": [n2],
                "vocab_a": [v1],
                "vocab_b": [v2],
                "vocab_union": [vu],
                "tv_e6": [tv],
            },
            schema=_DRIFT_SCHEMA,
        )
    )


_WILSON_SCHEMA = pa.schema(
    [
        ("source", pa.string()),
        ("n_docs", pa.int64()),
        ("n_passed", pa.int64()),
        ("pass_rate_e6", pa.int64()),
        ("wilson_lb_e6", pa.int64()),
    ]
)


def domain_quality_wilson(sf_dir: str) -> ray.data.Dataset:
    """Wilson-lower-bound domain quality ranking — the curation move of
    ordering domains by quality pass rate with a small-sample penalty
    (Wilson 1927 score interval): a 3/3 domain must not outrank a
    950/1000 domain, which the raw rate does and the interval's lower
    bound does not. This is how a crawl pipeline picks which domains to
    up-sample or re-crawl when most domains have few documents.

    Frozen rule (mirrored by the composed SQL oracle, which embeds the
    ``quality_filter`` oracle verbatim so the rollup can never drift
    from the per-doc gate): per source, ``n`` docs and ``k`` =
    quality_filter keeps; at z = 2 the lower bound reduces to
    ``(k + 2 - 2*sqrt((k*(n-k) + n)/n)) / (n + 4)``, computed exactly
    on integers as ``x = (1e12*(k*(n-k) + n)) // n``, ``s = isqrt(x)``
    (SQL: floor(sqrt(double)) + the one-step correction of the
    ``mixture_temperature`` precedent — the double's relative error is
    orders below 1 ulp of s at any corpus size), ``wilson_lb_e6 =
    (1e6*(k+2) - 2*s) // (n+4)``; ``pass_rate_e6 = (1e6*k) // n``.
    Output one row per source, ordered (wilson_lb_e6 desc, source asc).

    Scale shape: per-batch Arrow partials collapse each block to one
    row per source before the shuffle; the Wilson fold runs on the
    per-source table (Python bigints — the 1e12 product overflows
    int64 near n=6e3) and the final sort is source-sized.
    """
    import math

    from ray.data.aggregate import Sum

    docs = read_documents(sf_dir)

    def _partial(batch: pa.Table) -> pa.Table:
        keeps = [
            1 if quality_reason(t or "", lang) == "" else 0
            for t, lang in zip(
                batch.column("text").to_pylist(),
                batch.column("lang").to_pylist(),
            )
        ]
        tbl = pa.table(
            {
                "source": batch.column("source"),
                "n": pa.array([1] * batch.num_rows, pa.int64()),
                "k": pa.array(keeps, pa.int64()),
            }
        )
        out = pa.TableGroupBy(tbl, ["source"]).aggregate(
            [("n", "sum"), ("k", "sum")]
        )
        return out.rename_columns(["source", "n", "k"])

    agg = (
        docs.map_batches(_partial, batch_format="pyarrow")
        .groupby("source")
        .aggregate(Sum("n", alias_name="n"), Sum("k", alias_name="k"))
    )

    def _wilson(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return _WILSON_SCHEMA.empty_table()
        srcs = batch.column("source").to_pylist()
        ns = [int(v) for v in batch.column("n").to_pylist()]
        ks = [int(v) for v in batch.column("k").to_pylist()]
        lbs, rates = [], []
        for n, k in zip(ns, ks):
            x = (10**12 * (k * (n - k) + n)) // n
            s = math.isqrt(x)
            lbs.append((1_000_000 * (k + 2) - 2 * s) // (n + 4))
            rates.append((1_000_000 * k) // n)
        return pa.Table.from_pydict(
            {
                "source": pa.array(srcs, pa.string()),
                "n_docs": pa.array(ns, pa.int64()),
                "n_passed": pa.array(ks, pa.int64()),
                "pass_rate_e6": pa.array(rates, pa.int64()),
                "wilson_lb_e6": pa.array(lbs, pa.int64()),
            },
            schema=_WILSON_SCHEMA,
        )

    return agg.map_batches(_wilson, batch_format="pyarrow").sort(
        ["wilson_lb_e6", "source"], descending=[True, False]
    )
