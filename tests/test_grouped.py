"""map_key_groups: vectorized group slicing vs Dataset.map_groups.

Pins the contract ops/grouped.py relies on: identical output to
``groupby(key).map_groups(fn, batch_format="pyarrow")`` for
order-independent UDFs, singleton skipping under ``min_group_size=2``,
and a typed empty table when no group qualifies.
"""

import numpy as np
import pyarrow as pa
import pytest
import ray.data

from smart_ocr_ray.ops.grouped import group_bounds, map_key_groups


def _mk_table(keys, vals):
    return pa.table({"k": pa.array(keys), "v": pa.array(vals)})


def test_group_bounds_basic_and_nulls():
    t = _mk_table([1, 1, 2, 2, 2, 3], [0, 1, 2, 3, 4, 5])
    assert group_bounds(t, ["k"]).tolist() == [0, 2, 5, 6]
    # Null keys: each null row is its own group (safe for pair gen).
    t = _mk_table([None, None, 1, 1], [0, 1, 2, 3])
    assert group_bounds(t, ["k"]).tolist() == [0, 1, 2, 4]
    # Single row and empty block.
    assert group_bounds(_mk_table([7], [0]), ["k"]).tolist() == [0, 1]
    assert group_bounds(_mk_table([], []), ["k"]).tolist() == [0]


def test_group_bounds_multi_key():
    t = pa.table(
        {
            "a": [1, 1, 1, 2, 2],
            "b": ["x", "x", "y", "y", "y"],
            "v": [0, 1, 2, 3, 4],
        }
    )
    assert group_bounds(t, ["a", "b"]).tolist() == [0, 2, 3, 5]


def _make_group_summary():
    """Order-independent per-group UDF: (key, n, sum_v).

    Returned as a closure so cloudpickle ships it by value — a
    module-level function in tests/ is pickled by reference and fails
    to import on Ray workers.
    """

    def _group_summary(tbl: pa.Table) -> pa.Table:
        schema = pa.schema(
            [("k", pa.int64()), ("n", pa.int64()), ("sum_v", pa.int64())]
        )
        if tbl.num_rows == 0:
            return schema.empty_table()
        vals = tbl.column("v").to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "k": [tbl.column("k")[0].as_py()],
                "n": [tbl.num_rows],
                "sum_v": [int(vals.sum())],
            },
            schema=schema,
        )

    return _group_summary


def test_map_key_groups_matches_map_groups(ray_session):
    rng = np.random.default_rng(7)
    keys = rng.integers(0, 40, size=500)  # ~12 rows/group + singletons
    vals = rng.integers(0, 1000, size=500)
    rows = {"k": keys.astype("int64"), "v": vals.astype("int64")}

    _group_summary = _make_group_summary()
    ours = (
        map_key_groups(
            ray.data.from_arrow(pa.table(rows)).repartition(5),
            "k",
            _group_summary,
        )
        .to_pandas()
        .sort_values("k")
        .reset_index(drop=True)
    )
    ref = (
        ray.data.from_arrow(pa.table(rows))
        .repartition(5)
        .groupby("k")
        .map_groups(_group_summary, batch_format="pyarrow")
        .to_pandas()
        .sort_values("k")
        .reset_index(drop=True)
    )
    assert ours.equals(ref)


def test_min_group_size_skips_singletons(ray_session):
    # keys 1..6 once each, key 9 three times, key 10 twice.
    keys = [1, 2, 3, 4, 5, 6, 9, 9, 9, 10, 10]
    vals = list(range(len(keys)))
    _group_summary = _make_group_summary()
    ds = ray.data.from_arrow(_mk_table(keys, vals))
    out = (
        map_key_groups(ds, "k", _group_summary, min_group_size=2)
        .to_pandas()
        .sort_values("k")
        .reset_index(drop=True)
    )
    assert out["k"].tolist() == [9, 10]
    assert out["n"].tolist() == [3, 2]


def test_all_singletons_yields_typed_empty(ray_session):
    _group_summary = _make_group_summary()
    ds = ray.data.from_arrow(_mk_table([1, 2, 3], [0, 1, 2]))
    out = map_key_groups(ds, "k", _group_summary, min_group_size=2)
    assert out.count() == 0
    # Schema pinned by the UDF's empty-slice call, not inferred as null.
    assert set(out.schema().names) == {"k", "n", "sum_v"}


def test_empty_slice_contract():
    empty = _make_group_summary()(_mk_table([], []))
    assert empty.num_rows == 0
    assert empty.schema.names == ["k", "n", "sum_v"]


def test_groups_never_split_across_blocks(ray_session):
    """Regression: Ray's range-partitioned sort only co-locates FULL
    sort-key tuples. map_key_groups must sort by exactly the grouping
    keys — sorting by a superset (e.g. (k, v) to group by k) was
    observed to split one key's rows across 3 blocks, yielding
    duplicate per-group outputs."""
    rng = np.random.default_rng(11)
    n = 600
    rows = {
        "k": pa.array((rng.integers(0, 3, n)).astype("int64")),
        "v": pa.array((rng.integers(0, 1000, n)).astype("int64")),
    }
    _group_summary = _make_group_summary()
    out = (
        map_key_groups(
            ray.data.from_arrow(pa.table(rows)).repartition(12),
            "k",
            _group_summary,
        )
        .to_pandas()
        .sort_values("k")
        .reset_index(drop=True)
    )
    # Exactly one output row per key — a split group would emit several.
    assert out["k"].tolist() == [0, 1, 2]
    assert int(out["n"].sum()) == n


def test_max_by_keys_matches_pandas(ray_session):
    """max_by_keys == pandas groupby().max() across many blocks, with
    multi-column int keys and negative values."""
    from smart_ocr_ray.ops.grouped import max_by_keys

    rng = np.random.default_rng(7)
    n = 2000
    tbl = pa.table(
        {
            "a": pa.array(rng.integers(0, 40, n).astype("int64")),
            "b": pa.array(rng.integers(0, 5, n).astype("int64")),
            "v": pa.array(rng.integers(-1000, 1000, n).astype("int64")),
        }
    )
    out = (
        max_by_keys(ray.data.from_arrow(tbl).repartition(16), ["a", "b"], "v")
        .to_pandas()
        .sort_values(["a", "b"])
        .reset_index(drop=True)
    )
    exp = (
        tbl.to_pandas()
        .groupby(["a", "b"], as_index=False)["v"]
        .max()
        .sort_values(["a", "b"])
        .reset_index(drop=True)
    )
    assert out.equals(exp)


def test_item_cooccurrence_cap_and_threshold(ray_session, tmp_path):
    """Hot-user guard: a user with more than `cap` items contributes
    only the cap smallest, so pairs involving capped-out items never
    appear; n_users counts DISTINCT users (duplicate events collapse);
    pairs under min_users are dropped."""
    import json

    import pyarrow as pa
    import pyarrow.parquet as pq

    from smart_ocr_ray.ops.relational import item_cooccurrence

    rows = []
    eid = 0

    def ev(user, item, times=1):
        nonlocal eid
        for _ in range(times):
            rows.append(
                {
                    "event_id": eid,
                    "ts": 1_700_000_000_000_000 + eid,
                    "user_id": user,
                    "event_type": "view",
                    "value": 1.0,
                    "props": json.dumps({"k": item}),
                }
            )
            eid += 1

    # users 1..3 share items (10, 11) — above the threshold; user 3
    # hits item 10 five times (distinct-user count must stay 3).
    for u in (1, 2, 3):
        ev(u, 10)
        ev(u, 11)
    ev(3, 10, times=4)
    # users 1 and 2 also share (10, 12): only 2 users -> dropped at 3.
    ev(1, 12)
    ev(2, 12)
    # hot user 9: items 0..4 (cap=3 keeps 0,1,2) — pairs with 3 or 4
    # must not exist anywhere.
    for it in range(5):
        ev(9, it)

    sf = tmp_path / "cooc"; sf.mkdir()
    t = pa.Table.from_pylist(rows)
    t = t.set_column(
        t.schema.get_field_index("ts"),
        "ts",
        t.column("ts").cast(pa.timestamp("us")),
    )
    pq.write_table(t, sf / "events.parquet")

    got = {
        (r["item_a"], r["item_b"]): r["n_users"]
        for r in item_cooccurrence(str(sf), cap=3, min_users=3).take_all()
    }
    assert got == {(10, 11): 3}

    # min_users=1 exposes the hot user's capped pairs exactly
    got1 = {
        (r["item_a"], r["item_b"]): r["n_users"]
        for r in item_cooccurrence(str(sf), cap=3, min_users=1).take_all()
    }
    assert (0, 1) in got1 and (1, 2) in got1 and (0, 2) in got1
    assert not any(3 in p or 4 in p for p in got1)
    assert got1[(10, 12)] == 2


def test_gather_by_key_attaches_and_drops(ray_session):
    """gather_by_key attaches the side value to every row sharing the
    key (inner-join semantics: keyless rows drop), across blocks."""
    import numpy as np
    import pyarrow as pa
    import ray.data

    from smart_ocr_ray.ops.grouped import gather_by_key

    rows_schema = pa.schema([("k", pa.int64()), ("payload", pa.int64())])
    rows = ray.data.from_arrow(
        pa.table({"k": pa.array([1, 2, 2, 3, 7], pa.int64()),
                  "payload": pa.array([10, 20, 21, 30, 70], pa.int64())})
    ).repartition(3)
    side = ray.data.from_arrow(
        pa.table({"sk": pa.array([3, 1, 2], pa.int64()),
                  "val": pa.array([b"three", b"one", b"two"], pa.binary())})
    ).repartition(2)

    got = sorted(
        (r["k"], r["payload"], r["v"])
        for r in gather_by_key(
            rows, "k", side, "sk", "val", "v", rows_schema, pa.binary()
        ).take_all()
    )
    assert got == [
        (1, 10, b"one"),
        (2, 20, b"two"),
        (2, 21, b"two"),
        (3, 30, b"three"),
    ]  # k=7 has no side row and drops


def test_gather_by_key_duplicate_side_keys_raise(ray_session):
    """The side-keys-unique contract is ENFORCED, not assumed: a
    duplicated side key raises (naming the key) instead of silently
    attaching an arbitrary copy's value. The sort co-locates all
    copies of a key in one block, so the per-block check is global."""
    import pyarrow as pa
    import pytest
    import ray.data

    from smart_ocr_ray.ops.grouped import gather_by_key

    rows_schema = pa.schema([("k", pa.int64())])
    rows = ray.data.from_arrow(
        pa.table({"k": pa.array([1, 2], pa.int64())})
    )
    side = ray.data.from_arrow(
        pa.table({"sk": pa.array([2, 2, 1], pa.int64()),
                  "val": pa.array([7, 8, 9], pa.int64())})
    ).repartition(2)

    with pytest.raises(Exception, match="side keys must be unique"):
        gather_by_key(
            rows, "k", side, "sk", "val", "v", rows_schema, pa.int64()
        ).take_all()


def test_anti_by_key_drops_matched_keys(ray_session):
    """anti_by_key keeps exactly the rows whose key never appears in
    the side table (duplicate side keys allowed), across blocks."""
    import pyarrow as pa
    import ray.data

    from smart_ocr_ray.ops.grouped import anti_by_key

    rows_schema = pa.schema([("k", pa.int64()), ("payload", pa.int64())])
    rows = ray.data.from_arrow(
        pa.table({"k": pa.array([1, 2, 2, 3, 7], pa.int64()),
                  "payload": pa.array([10, 20, 21, 30, 70], pa.int64())})
    ).repartition(3)
    side = ray.data.from_arrow(
        pa.table({"sk": pa.array([2, 2, 3], pa.int64())})
    ).repartition(2)

    got = sorted(
        (r["k"], r["payload"])
        for r in anti_by_key(rows, "k", side, "sk", rows_schema).take_all()
    )
    assert got == [(1, 10), (7, 70)]

    # empty side: everything survives
    empty = ray.data.from_arrow(pa.table({"sk": pa.array([], pa.int64())}))
    got_all = sorted(
        (r["k"], r["payload"])
        for r in anti_by_key(rows, "k", empty, "sk", rows_schema).take_all()
    )
    assert got_all == [(1, 10), (2, 20), (2, 21), (3, 30), (7, 70)]


def test_sorted_blocks_never_share_keys(ray_session):
    """The equal-key-per-block invariant of Ray's range sort, pinned
    DIRECTLY: line_dedup / substring_dedup / cdc_dedup / ngram_novelty
    tag hotness in per-block passes over a key-sorted dataset, which
    is only sound if no key value spans two blocks. 50k rows over 400
    heavily-colliding keys and 16 input partitions; adjacent sorted
    blocks must have strictly increasing key ranges. (ADVICE r3: a
    silent split would inflate per-block first-owner counts with no
    detectable failure — this is the detector, alongside the
    ngram-novelty sum invariant.)"""
    rng = np.random.default_rng(23)
    n = 50_000
    ds = ray.data.from_arrow(
        pa.table({"k": pa.array(rng.integers(0, 400, n).astype("int64"))})
    ).repartition(16)

    def _edges(block: pa.Table) -> pa.Table:
        if block.num_rows == 0:
            return pa.table({"first": pa.array([], pa.int64()),
                             "last": pa.array([], pa.int64()),
                             "n": pa.array([], pa.int64())})
        k = block.column("k").to_numpy(zero_copy_only=False)
        return pa.table({"first": pa.array([int(k.min())]),
                         "last": pa.array([int(k.max())]),
                         "n": pa.array([len(k)])})

    edges = sorted(
        ds.sort("k").map_batches(
            _edges, batch_format="pyarrow", batch_size=None
        ).take_all(),
        key=lambda r: r["first"],
    )
    assert sum(r["n"] for r in edges) == n
    assert len(edges) > 1  # the multi-block case is the one under test
    for prev, cur in zip(edges, edges[1:]):
        assert cur["first"] > prev["last"], (
            f"key {cur['first']} spans blocks: {prev} -> {cur}"
        )


def test_check_block_key_ranges_unit():
    """The production guard's disjointness check: sorted-multiset
    pairing of per-block [min, max] key ranges. Disjoint ordered
    ranges pass; a shared boundary key (the silent-split signature),
    a contained range, and an unpaired sentinel all raise."""
    from smart_ocr_ray.ops.grouped import check_block_key_ranges

    # disjoint, unordered input order must not matter
    check_block_key_ranges(["m", "a"], ["z", "f"], "op")
    check_block_key_ranges([1, 100], [50, 200], "op")
    check_block_key_ranges(["solo"], ["solo"], "op")  # single block
    check_block_key_ranges([], [], "op")

    # key "f" ends block 1 AND starts block 2 — the split signature
    with pytest.raises(RuntimeError, match="share a key"):
        check_block_key_ranges(["a", "f"], ["f", "z"], "op")
    # contained range
    with pytest.raises(RuntimeError, match="share a key"):
        check_block_key_ranges(["a", "b"], ["y", "c"], "op")
    # unpaired sentinels
    with pytest.raises(RuntimeError, match="must pair 1:1"):
        check_block_key_ranges(["a"], [], "op")


def test_guarded_sum_by_key_sums_and_raises_on_split(ray_session):
    """End-to-end fake-split injection through the production summing
    pass (VERDICT r4 task #2): guarded_sum_by_key must (a) reproduce a
    plain per-key integer sum while consuming disjoint in-band guard
    sentinels, and (b) RAISE when injected sentinel ranges overlap —
    the failure mode of a future Ray version re-bundling sorted
    blocks, which previously would have silently corrupted
    line_dedup / substring_dedup / cdc_dedup / ngram_novelty."""
    from smart_ocr_ray.ops.grouped import RANGE_GUARD_KEY, guarded_sum_by_key

    out_schema = pa.schema(
        [("doc_id", pa.int64()), ("total", pa.int64())]
    )

    def _mk(guard_rows):
        data = [
            {"doc_id": 2, "v": 10, "flag": 0, "gkey": None},
            {"doc_id": 1, "v": 1, "flag": 0, "gkey": None},
            {"doc_id": 2, "v": 5, "flag": 0, "gkey": None},
            {"doc_id": 3, "v": 7, "flag": 0, "gkey": None},
        ] + [
            {"doc_id": RANGE_GUARD_KEY, "v": 0, "flag": f, "gkey": k}
            for f, k in guard_rows
        ]
        tbl = pa.Table.from_pylist(
            data,
            schema=pa.schema(
                [
                    ("doc_id", pa.int64()),
                    ("v", pa.int64()),
                    ("flag", pa.int64()),
                    ("gkey", pa.string()),
                ]
            ),
        )
        return ray.data.from_arrow(tbl).repartition(3)

    # disjoint block ranges: sums come through untouched
    ok = guarded_sum_by_key(
        _mk([(0, "aa"), (1, "mm"), (0, "nn"), (1, "zz")]),
        "doc_id",
        {"v": "total"},
        guard_val_col="gkey",
        guard_flag_col="flag",
        op="test_op",
        out_schema=out_schema,
    )
    got = {r["doc_id"]: r["total"] for r in ok.take_all()}
    assert got == {1: 1, 2: 15, 3: 7}

    # injected split: key "mm" ends one block and starts the next
    bad = guarded_sum_by_key(
        _mk([(0, "aa"), (1, "mm"), (0, "mm"), (1, "zz")]),
        "doc_id",
        {"v": "total"},
        guard_val_col="gkey",
        guard_flag_col="flag",
        op="test_op",
        out_schema=out_schema,
    )
    with pytest.raises(Exception, match="share a key"):
        bad.take_all()
