"""Vectorized group-wise mapping for bucket-shaped keys.

``Dataset.groupby(key).map_groups(fn)`` is, in Ray 2.49, exactly
``sort(key)`` followed by a per-block ``map_batches`` whose wrapper
slices each group out of the block and invokes the UDF once per group
(``ray/data/grouped_data.py::map_groups`` →
``_apply_udf_to_groups``).  On LSH-bucket-shaped data — millions of
buckets, almost all singletons — that per-group Python call + output
table construction dominates end-to-end time (measured locally: a
no-op ``map_groups`` over 80k MinHash band rows costs ~2.7 s at 32
CPUs, vs ~0.5 s of actual signature math).

``map_key_groups`` keeps the identical shuffle (the same
``Dataset.sort`` call map_groups issues, so it inherits the same
equal-keys-co-located-per-block guarantee) but detects group
boundaries vectorized with ``pyarrow.compute`` and only invokes the
UDF for groups of at least ``min_group_size`` rows.

CO-LOCATION INVARIANT: Ray's range-partitioned sort only guarantees
that rows sharing the FULL sort-key tuple land in one block. Sorting
by a superset of the grouping keys (e.g. sort by (line, doc_id) to
group by line) can split one group across blocks at a secondary-key
boundary — observed empirically, one key's rows spread over 3 blocks.
This helper therefore always sorts by exactly the grouping keys; if a
UDF needs a secondary order, re-sort inside the UDF (cheap, per
group) or ``sort_by`` block-locally.  For candidate
pair generation (``min_group_size=2``) the singleton buckets — the
overwhelming majority at any scale — cost one vectorized comparison
each instead of a UDF call.
"""

from __future__ import annotations

from typing import Callable

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray.data


def group_bounds(block: pa.Table, keys: list[str]) -> np.ndarray:
    """Group boundary offsets of a key-sorted block.

    Returns the sorted offsets ``[0, b1, ..., n]`` such that rows
    ``[b_i, b_{i+1})`` share the same key tuple.  Null keys compare
    equal to nothing (a null row is its own group), matching
    groupby-null semantics of one-group-per-null being safe for pair
    generation.
    """
    n = block.num_rows
    if n == 0:
        return np.array([0], dtype=np.int64)
    changed = np.zeros(n - 1, dtype=bool)
    for key in keys:
        col = block.column(key).combine_chunks()
        neq = pc.not_equal(col.slice(1), col.slice(0, n - 1))
        changed |= pc.fill_null(neq, True).to_numpy(zero_copy_only=False)
    return np.concatenate(
        ([0], np.flatnonzero(changed) + 1, [n])
    ).astype(np.int64)


def block_topk(
    group: np.ndarray, order_keys: tuple, k: int
) -> tuple[np.ndarray, np.ndarray]:
    """Vectorized per-group top-k selection for one block.

    ``group`` is the group id per row; ``order_keys`` are the within-
    group sort keys in ``np.lexsort`` order (LAST is most significant;
    negate a numeric key for descending). Returns ``(take, ranks)``:
    row indices of the kept rows (at most ``k`` per group, in rank
    order) and their 1-based ranks.

    This is the single home of the boundary/rank index arithmetic the
    grouped top-k operators share (events_topk_per_hour,
    embedding_knn_graph, tfidf_top_terms).
    """
    n = len(group)
    order = np.lexsort((*order_keys, group))
    gs = group[order]
    starts = np.concatenate(([0], np.flatnonzero(gs[1:] != gs[:-1]) + 1))
    sizes = np.diff(np.concatenate((starts, [n])))
    rank_in_group = np.arange(n) - np.repeat(starts, sizes)
    keep = rank_in_group < k
    return order[keep], rank_in_group[keep] + 1


def map_key_groups(
    ds: ray.data.Dataset,
    key: str | list[str],
    fn: Callable[[pa.Table], pa.Table],
    *,
    min_group_size: int = 1,
    **map_batches_kwargs,
) -> ray.data.Dataset:
    """``groupby(key).map_groups(fn)`` with vectorized group slicing.

    Semantics match ``map_groups`` with ``batch_format="pyarrow"`` for
    UDFs whose output does not depend on UDF invocation order, plus
    one extension: groups smaller than ``min_group_size`` are skipped
    without invoking ``fn`` (for pair-generating UDFs, a singleton
    bucket can never emit a pair — set ``min_group_size=2``).

    ``fn`` must tolerate an empty input slice and return an
    empty-but-typed table for it; that call pins the output schema on
    blocks where no group qualifies.
    """
    keys = [key] if isinstance(key, str) else list(key)

    def _per_block(block: pa.Table) -> pa.Table:
        block = block.combine_chunks()
        bounds = group_bounds(block, keys)
        outs = [
            fn(block.slice(int(s), int(e - s)))
            for s, e in zip(bounds[:-1], bounds[1:])
            if e - s >= min_group_size
        ]
        if not outs:
            return fn(block.slice(0, 0))
        return pa.concat_tables(outs)

    return ds.sort(keys).map_batches(
        _per_block,
        batch_format="pyarrow",
        batch_size=None,
        **map_batches_kwargs,
    )


# Sentinel group key for in-band block-range guard rows (far below any
# real id; every guarded op's id space is non-negative).
RANGE_GUARD_KEY = -(1 << 62)


def check_block_key_ranges(mins: list, maxes: list, op: str) -> None:
    """Production guard for the equal-key-per-block range-sort invariant.

    The dedup-family block passes (line_dedup, substring_dedup,
    cdc_dedup, ngram_novelty) tag/collapse per key inside ONE
    key-sorted block and are correct only if Ray's range sort never
    splits one key's rows across two blocks. That invariant held on
    every observed execution and is pinned by
    ``tests/test_grouped.py::test_sorted_blocks_never_share_keys`` —
    but a future Ray version re-bundling sorted blocks would fail
    SILENTLY (inflated survivor/novelty counts). This check makes the
    production path raise instead: each block pass emits, in-band, one
    (min_key) and one (max_key) sentinel row under
    ``RANGE_GUARD_KEY``; the op's existing per-id shuffle co-locates
    every sentinel into one group, where this function asserts the
    per-block [min, max] key ranges are pairwise disjoint.

    Block identity is not required: range-sorted blocks must have
    totally ordered key ranges, so pairing the SORTED multiset of mins
    with the SORTED multiset of maxes and requiring
    ``max_i < min_{i+1}`` is exactly pairwise disjointness (any
    overlap — shared boundary key, contained range, or crossed range —
    violates some adjacent pair after sorting).

    Known blind spots, documented rather than defended: (a) a task
    retry re-reports nothing here (sentinels ride the retried block's
    own output, so the group sees each logical block exactly once);
    (b) if the SECOND shuffle also split the sentinel group itself,
    each fragment checks a subset of ranges — a pervasive regression
    still raises on the first overlapping pair within any fragment.
    """
    if len(mins) != len(maxes):
        raise RuntimeError(
            f"{op}: block-range guard saw {len(mins)} min / {len(maxes)} "
            "max sentinel rows (must pair 1:1 per sorted block)"
        )
    mins = sorted(mins)
    maxes = sorted(maxes)
    for i, (hi, lo) in enumerate(zip(maxes[:-1], mins[1:])):
        if not hi < lo:
            raise RuntimeError(
                f"{op}: range-sorted blocks share a key — block range "
                f"#{i} ends at {hi!r} but block range #{i + 1} starts at "
                f"{lo!r}; Ray's range sort split one key across blocks, "
                "which silently corrupts the per-block tag/collapse pass. "
                "Do not trust this run's output."
            )


_REDUCE_UFUNC = {"max": np.maximum, "min": np.minimum, "sum": np.add}


def reduce_by_keys(
    ds: ray.data.Dataset,
    keys: list[str],
    value: str | None,
    how: str = "max",
    out: str | None = None,
) -> ray.data.Dataset:
    """Vectorized ``groupby(keys).<how>(value)`` for max/min/sum/count:
    one sort co-locates each key tuple (the same shuffle Ray's
    Aggregate issues), then a per-block ``np.<ufunc>.reduceat`` over
    the group starts — no per-group UDF, no Aggregate operator.
    Motivated by the embedding-LSH pair dedup, where Ray 2.49's hash
    Aggregate spent 176 s of remote work collapsing 473k (left,right)
    pair rows that this path handles in under a second of vectorized
    compute.

    ``how="count"`` counts ROWS per key tuple and requires ``out``
    (there is no value column to borrow a name from); ``out``
    otherwise renames the reduced column (defaults to ``value``). Use
    ``sum`` only where it is exact (integers / integer-grid values) —
    float sums are order-dependent and this helper makes no ordering
    promise within a group. The value column must be null-free: nulls
    reach numpy as NaN (``to_numpy`` widens nullable ints to float64),
    which would either poison the reduction or fail the int cast, so
    they are rejected loudly up front instead."""
    if how == "count" and out is None:
        # `out = None or None` would otherwise become a column literally
        # named "None" via from_pydict's str() coercion of dict keys.
        raise ValueError("reduce_by_keys(how='count') requires an explicit `out`")
    out = out or value
    key_list = list(keys)

    def _block(block: pa.Table) -> pa.Table:
        block = block.combine_chunks()
        bounds = group_bounds(block, key_list)
        starts = bounds[:-1]
        cols = {k: block.column(k).take(pa.array(starts)) for k in key_list}
        if how == "count":
            cols[out] = pa.array(np.diff(bounds), pa.int64())
        else:
            col = block.column(value)
            if col.null_count:
                raise ValueError(
                    f"reduce_by_keys: value column {value!r} contains "
                    f"{col.null_count} null(s); drop or fill them upstream "
                    "(SQL-style ignore-null semantics are not provided here)"
                )
            v = col.to_numpy(zero_copy_only=False)
            cols[out] = pa.array(
                _REDUCE_UFUNC[how].reduceat(v, starts) if len(starts) else v[:0],
                type=block.schema.field(value).type,
            )
        return pa.Table.from_pydict(cols)

    return ds.sort(key_list).map_batches(
        _block, batch_format="pyarrow", batch_size=None
    )


def guarded_sum_by_key(
    ds: ray.data.Dataset,
    key: str,
    sums: dict[str, str],
    guard_val_col: str,
    guard_flag_col: str,
    op: str,
    out_schema: pa.Schema,
) -> ray.data.Dataset:
    """``groupby(key).sum(*)`` as one sort + per-block
    ``np.add.reduceat`` (the ``reduce_by_keys`` idiom — no hash
    Aggregate), extended to consume in-band block-range guard rows.

    Sentinel rows carry ``key == RANGE_GUARD_KEY`` with the guarded
    sort key's per-block min/max in ``guard_val_col`` and a 0=min /
    1=max flag in ``guard_flag_col``. The sort co-locates every
    sentinel (RANGE_GUARD_KEY is the global key minimum), the block
    holding them runs ``check_block_key_ranges`` — raising loudly if
    the upstream range sort split a key across blocks — and the
    sentinels are dropped from the summed output. Sums must be exact
    (integer) per ``reduce_by_keys``'s contract; ``out_schema`` is
    ``(key, *sums.values())`` in order.

    Residual exposure, acknowledged: THIS pass's own sort relies on
    the same equal-key-per-block property for the real keys (a split
    here would emit two partial rows for one key instead of raising).
    The in-band guard deliberately checks the UPSTREAM corpus-scale
    sort — under the threat model (a Ray version re-bundling sorted
    blocks) that sort splits keys with near-certainty first, because
    it has orders of magnitude more blocks and rows than this doc-
    sized pass; and duplicate output keys additionally fail the
    oracle gate's row-count/value-hash compare. A fully guarded
    second level would need a third shuffle per op for an O(docs)
    table — not worth it against a failure mode the first guard
    already detects systemically.
    """

    def _block(block: pa.Table) -> pa.Table:
        if block.num_rows == 0:
            return out_schema.empty_table()
        block = block.combine_chunks()
        keys_np = block.column(key).to_numpy(zero_copy_only=False)
        guard_mask = keys_np == RANGE_GUARD_KEY
        if guard_mask.any():
            g = block.filter(pa.array(guard_mask))
            flags = g.column(guard_flag_col).to_numpy(zero_copy_only=False)
            vals = g.column(guard_val_col).to_pylist()
            mins = [v for v, f in zip(vals, flags) if f == 0]
            maxes = [v for v, f in zip(vals, flags) if f == 1]
            check_block_key_ranges(mins, maxes, op)
            block = block.filter(pa.array(~guard_mask))
            if block.num_rows == 0:
                return out_schema.empty_table()
        bounds = group_bounds(block, [key])
        starts = bounds[:-1]
        cols = {
            key: block.column(key)
            .take(pa.array(starts))
            .cast(out_schema.field(key).type)
        }
        for src, dst in sums.items():
            v = block.column(src).to_numpy(zero_copy_only=False)
            cols[dst] = pa.array(
                np.add.reduceat(v, starts) if len(starts) else v[:0],
                out_schema.field(dst).type,
            )
        return pa.Table.from_pydict(cols, schema=out_schema)

    return ds.sort([key]).map_batches(
        _block, batch_format="pyarrow", batch_size=None
    )


def max_by_keys(
    ds: ray.data.Dataset, keys: list[str], value: str
) -> ray.data.Dataset:
    """``groupby(keys).max(value)`` via ``reduce_by_keys``."""
    return reduce_by_keys(ds, keys, value, "max")


def rename_agg(
    ds: ray.data.Dataset, renames: dict[str, str], launder_partitions: int
) -> ray.data.Dataset:
    """Rename aggregate output columns (``count()`` / ``sum(x)``) and
    repartition to launder the schema-less empty blocks Ray 2.49
    aggregates emit (they break downstream joins with ArrowInvalid
    FieldRef — see ops/dedup.cluster_pairs). One home for the
    workaround instead of a per-op copy."""

    def _rename(batch: pa.Table) -> pa.Table:
        return batch.rename_columns(
            [renames.get(c, c) for c in batch.column_names]
        )

    return ds.map_batches(_rename, batch_format="pyarrow").repartition(
        launder_partitions
    )


def typed_if_empty(ds: ray.data.Dataset, schema: pa.Schema) -> ray.data.Dataset:
    """Materialize ``ds`` and, if it has zero rows, replace it with one
    typed empty block. Ray 2.49 all-empty datasets are schema-less
    end-to-end (``to_pandas()`` drops every column, joins raise
    ArrowInvalid FieldRef) — the companion workaround to
    ``rename_agg``, one home instead of a per-op copy."""
    ds = ds.materialize()
    if ds.count() == 0:
        return ray.data.from_arrow(schema.empty_table())
    return ds


def anti_by_key(
    rows: ray.data.Dataset,
    key: str,
    side: ray.data.Dataset,
    side_key: str,
    rows_schema: pa.Schema,
) -> ray.data.Dataset:
    """Anti-join: the ``rows`` whose ``key`` does NOT appear in
    ``side`` — the same union + key-sort + per-block vectorized pass
    as ``gather_by_key`` (and the same reason to prefer it over a
    hash join), with the gather replaced by a drop of every key group
    containing a side marker. ``side`` keys need not be unique here
    (any number of markers kills the group); key columns must be
    null-free on the rows side (a null row key is its own group and
    would always survive).
    """
    marker = "__anti_marker"
    out_schema = pa.schema(list(rows_schema) + [pa.field(marker, pa.int8())])
    row_cols = [f.name for f in rows_schema]

    def _tag_rows(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0 or key not in batch.column_names:
            return out_schema.empty_table()
        cols = {name: batch.column(name) for name in row_cols}
        cols[marker] = pa.nulls(batch.num_rows, pa.int8())
        return pa.Table.from_pydict(cols, schema=out_schema)

    def _tag_side(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0 or side_key not in batch.column_names:
            return out_schema.empty_table()
        cols = {}
        for name in row_cols:
            if name == key:
                cols[name] = batch.column(side_key)
            else:
                cols[name] = pa.nulls(batch.num_rows, rows_schema.field(name).type)
        cols[marker] = pa.array(
            np.ones(batch.num_rows, dtype=np.int8), pa.int8()
        )
        return pa.Table.from_pydict(cols, schema=out_schema)

    unioned = rows.map_batches(_tag_rows, batch_format="pyarrow").union(
        side.map_batches(_tag_side, batch_format="pyarrow")
    )

    def _drop_marked(block: pa.Table) -> pa.Table:
        if block.num_rows == 0:
            return rows_schema.empty_table()
        block = block.combine_chunks()
        marked = pc.is_valid(block.column(marker)).to_numpy(zero_copy_only=False)
        bounds = group_bounds(block, [key])
        n_groups = len(bounds) - 1
        row_grp = np.repeat(np.arange(n_groups), np.diff(bounds))
        group_hit = np.zeros(n_groups, dtype=bool)
        group_hit[row_grp[np.flatnonzero(marked)]] = True
        keep = np.flatnonzero((~marked) & (~group_hit[row_grp]))
        kept = block.take(pa.array(keep))
        return pa.Table.from_pydict(
            {name: kept.column(name) for name in row_cols}, schema=rows_schema
        )

    return unioned.sort([key]).map_batches(
        _drop_marked, batch_format="pyarrow", batch_size=None
    )


def gather_by_key(
    rows: ray.data.Dataset,
    key: str,
    side: ray.data.Dataset,
    side_key: str,
    side_val: str,
    out: str,
    rows_schema: pa.Schema,
    val_type: pa.DataType,
) -> ray.data.Dataset:
    """Inner-join-style attachment of ONE side column onto a row table,
    as a sort + per-block vectorized gather instead of an Acero hash
    join: union the (tagged) side rows with the row table, range-sort
    by the key — the same co-location guarantee ``map_key_groups``
    relies on — and gather the side value across each key group.

    Motivation (measured, embedding-LSH candidate verify at sf0.1):
    Ray 2.49's JoinOperator hash shuffle spent 55 s of remote wall
    moving 473k pair rows + 2k embedding blobs; the identical
    attachment as sort + ``group_bounds`` gather is a ~0.4 s sort and
    a vectorized take. Same all-to-all bytes, none of the per-block
    hash-partition/build cost.

    Contract: ``side`` keys are UNIQUE (one value per key — duplicate
    side keys RAISE: sorting co-locates every copy of a key in one
    block, so the per-block check below is a complete global
    uniqueness guard, turning an upstream bug that would otherwise
    silently attach an arbitrary copy's value into a loud failure);
    row keys missing from ``side`` drop (inner-join semantics);
    neither key column may contain nulls.
    ``rows_schema`` is the row table's static schema (passing it in
    avoids a schema() materialization); the output schema is
    ``rows_schema + (out, val_type)``.
    """
    out_schema = pa.schema(list(rows_schema) + [pa.field(out, val_type)])
    row_cols = [f.name for f in rows_schema]

    def _tag_rows(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0 or key not in batch.column_names:
            return out_schema.empty_table()
        cols = {name: batch.column(name) for name in row_cols}
        cols[out] = pa.nulls(batch.num_rows, val_type)
        return pa.Table.from_pydict(cols, schema=out_schema)

    def _tag_side(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0 or side_key not in batch.column_names:
            return out_schema.empty_table()
        cols = {}
        for name in row_cols:
            if name == key:
                cols[name] = batch.column(side_key)
            else:
                cols[name] = pa.nulls(
                    batch.num_rows, rows_schema.field(name).type
                )
        cols[out] = batch.column(side_val).cast(val_type)
        return pa.Table.from_pydict(cols, schema=out_schema)

    unioned = rows.map_batches(_tag_rows, batch_format="pyarrow").union(
        side.map_batches(_tag_side, batch_format="pyarrow")
    )

    def _gather(block: pa.Table) -> pa.Table:
        if block.num_rows == 0:
            return out_schema.empty_table()
        block = block.combine_chunks()
        val = block.column(out).combine_chunks()
        valid = pc.is_valid(val).to_numpy(zero_copy_only=False)
        bounds = group_bounds(block, [key])
        n_groups = len(bounds) - 1
        row_grp = np.repeat(np.arange(n_groups), np.diff(bounds))
        side_rows = np.flatnonzero(valid)
        per_group = np.bincount(row_grp[side_rows], minlength=n_groups)
        if per_group.max(initial=0) > 1:
            dup_grp = int(np.argmax(per_group))
            dup_key = block.column(key)[int(bounds[dup_grp])].as_py()
            raise ValueError(
                f"gather_by_key: side has {int(per_group[dup_grp])} rows "
                f"for key {dup_key!r} (side keys must be unique)"
            )
        side_idx = np.full(n_groups, -1, dtype=np.int64)
        side_idx[row_grp[side_rows]] = side_rows
        gather = side_idx[row_grp]
        take_rows = np.flatnonzero((~valid) & (gather >= 0))
        cols = {
            name: block.column(name).take(pa.array(take_rows))
            for name in row_cols
        }
        cols[out] = val.take(pa.array(gather[take_rows]))
        return pa.Table.from_pydict(cols, schema=out_schema)

    return unioned.sort([key]).map_batches(
        _gather, batch_format="pyarrow", batch_size=None
    )
