"""Ray-level tests for the training-data ops: dedup accuracy,
similarity recall, multimodal plumbing, discrepancy detection, and the
within-partition content-hash skip."""

import json

import numpy as np
import pytest

SF = "/root/testdata/sf0.001"


def test_find_discrepancies():
    from smart_ocr_ray.functions.scoring import Attempt, find_discrepancies

    a = Attempt("dom", "word " * 100, True)
    b = Attempt("rawtext", "word " * 30, False)
    discs = find_discrepancies([a, b])
    assert any("Word count spread" in d for d in discs)
    assert any("Audit divergence" in d for d in discs)
    assert find_discrepancies([a]) == []


def test_dedup_exact_survivor_is_min_doc_id(ray_session):
    from smart_ocr_ray.ops.dedup import dedup_exact

    rows = dedup_exact(SF).take_all()
    assert rows
    # one survivor per distinct hash, survivor = min doc_id.
    assert len({r["text_md5"] for r in rows}) == len(rows)


def test_minhash_lsh_finds_exact_duplicates(ray_session):
    """Identical texts must surface as candidate pairs with est≈1."""
    from smart_ocr_ray.ops.dedup import dedup_minhash_lsh
    from smart_ocr_ray.ops.dedup import read_documents

    docs = read_documents(SF).to_pandas()
    exact_dup_groups = docs.groupby("text")["doc_id"].apply(list)
    dup_pairs = {
        (min(a, b), max(a, b))
        for ids in exact_dup_groups
        if len(ids) > 1
        for a in ids
        for b in ids
        if a < b
    }
    found = {
        (r["left_id"], r["right_id"])
        for r in dedup_minhash_lsh(SF, threshold=0.9).take_all()
    }
    if dup_pairs:
        missed = dup_pairs - found
        assert not missed, f"missed exact duplicates: {sorted(missed)[:5]}"


def test_ivf_recall_against_exact(ray_session):
    """IVF is approximate; recall@10 vs brute force should still be
    substantial with 4/16 probes on this data."""
    from smart_ocr_ray.ops.similarity import ann_cosine_topk, ivf_topk

    exact = {}
    for r in ann_cosine_topk(SF).take_all():
        exact.setdefault(r["query_id"], set()).add(r["vec_id"])
    approx = {}
    for r in ivf_topk(SF).take_all():
        approx.setdefault(r["query_id"], set()).add(r["vec_id"])
    recalls = [
        len(exact[q] & approx.get(q, set())) / len(exact[q]) for q in exact
    ]
    assert np.mean(recalls) >= 0.3


def test_multimodal_decode_contract(ray_session, fixture_parquet):
    import ray.data

    from smart_ocr_ray.ops.multimodal import RealDecoder, decode_features, media_from_pages

    pages = ray.data.read_parquet(fixture_parquet, columns=["url", "html"])
    feats = decode_features(media_from_pages(pages), concurrency=(1, 2)).take_all()
    assert len(feats) == 110
    sample = feats[0]
    assert set(sample) == {"url", "width", "height", "checksum", "features"}
    assert len(sample["features"]) == 8
    # Deterministic: same payload → same features.
    by_checksum = {}
    for f in feats:
        prev = by_checksum.setdefault(f["checksum"], f["features"])
        assert prev == f["features"]
    # The real-codec seam is explicit.
    with pytest.raises(NotImplementedError):
        RealDecoder()


def test_content_hash_skip_filter(ray_session, fixture_parquet, tmp_path):
    """Row-level resume is a distributed left_anti join on content_hash
    (r2 VERDICT item 3) — committed keys stay a Dataset, never a driver
    set."""
    from smart_ocr_ray.pipelines.extract_pipeline import read_pages
    from smart_ocr_ray.state.manifests import (
        committed_keys_ds,
        filter_processed,
        run_partitioned,
    )

    out = str(tmp_path / "out")
    run_partitioned(fixture_parquet, out, num_partitions=2, input_sig="s", max_html_bytes=16 * 1024)
    done = committed_keys_ds(out)
    assert done is not None and done.count() == 110
    remaining = filter_processed(read_pages(fixture_parquet), done)
    # Every payload was processed → nothing remains (duplicate payloads
    # share hashes, so the filter drops them all).
    assert remaining.count() == 0
    # Nothing committed yet → everything passes through untouched.
    assert committed_keys_ds(str(tmp_path / "empty")) is None
    assert filter_processed(read_pages(fixture_parquet), None).count() == 110
    # The join restores the input schema (hash plumbing dropped); use a
    # partial skip-set so the remainder is non-empty and has a schema.
    partial = committed_keys_ds(out, parts=[0])
    remaining = filter_processed(read_pages(fixture_parquet), partial)
    assert 0 < remaining.count() < 110
    assert remaining.columns() == read_pages(fixture_parquet).columns()


def test_analyze_batch_columns(fixture_pages):
    from smart_ocr_ray.stages.analyze import analyze_batch

    out = analyze_batch(fixture_pages)
    for col in ("content_hash", "n_bytes", "doc_kind", "route", "is_native",
                "difficulty", "has_tables", "has_figures", "has_equations"):
        assert col in out.column_names
    kinds = set(out.column("doc_kind").to_pylist())
    assert kinds == {"html", "binary", "empty"}
    routes = set(out.column("route").to_pylist())
    assert routes == {"native", "html", "binary", "empty"}


def test_dedup_clusters_transitive(ray_session):
    """Connected components: near-dup pairs sharing a doc collapse into
    one cluster labelled by the component's min doc_id."""
    from smart_ocr_ray.ops.dedup import dedup_clusters, dedup_minhash_lsh

    pairs = dedup_minhash_lsh(SF, threshold=0.7).take_all()
    clusters = {r["doc_id"]: r["cluster_id"] for r in dedup_clusters(SF).take_all()}
    if not pairs:
        pytest.skip("no near-dup pairs at this sf")
    # every paired doc is labelled, both ends share a label, and the
    # label is a member of the cluster (its minimum).
    for p in pairs:
        assert clusters[p["left_id"]] == clusters[p["right_id"]]
    for doc_id, label in clusters.items():
        assert label <= doc_id
        assert clusters[label] == label  # the representative labels itself


def test_events_sliding_covers_tumbling(ray_session):
    """Every (type, hour) tumbling bucket appears in the sliding output
    with >= its tumbling count (each event joins 2 sliding windows)."""
    from smart_ocr_ray.ops.relational import events_hourly, events_sliding

    tumbling = {
        (r["event_type"], r["window_start"]): r["n_events"]
        for r in events_hourly(SF).take_all()
    }
    sliding = {
        (r["event_type"], r["window_start"]): r["n_events"]
        for r in events_sliding(SF).take_all()
    }
    assert sum(sliding.values()) == 2 * sum(tumbling.values())
    for key, n in tumbling.items():
        assert sliding.get(key, 0) >= n


def test_cluster_pairs_long_chain_pointer_jumping(ray_session):
    """A chain-shaped component with diameter 40 — far past the old
    max_rounds=5 — must converge (pointer jumping: O(log d) rounds)."""
    import pyarrow as pa
    import ray.data

    from smart_ocr_ray.ops.dedup import cluster_pairs

    n = 41
    pairs = ray.data.from_arrow(
        pa.Table.from_pydict(
            {
                "left_id": pa.array(list(range(n - 1)), pa.int64()),
                "right_id": pa.array(list(range(1, n)), pa.int64()),
                "est_jaccard": pa.array([1.0] * (n - 1), pa.float64()),
            }
        )
    )
    rows = cluster_pairs(pairs).take_all()
    assert len(rows) == n
    assert {r["cluster_id"] for r in rows} == {0}
    assert [r["doc_id"] for r in rows] == list(range(n))


def test_cluster_pairs_raises_on_nonconvergence(ray_session):
    """Never return silently wrong clusters: exhausting max_rounds
    without the fixed point raises."""
    import pyarrow as pa
    import pytest
    import ray.data

    from smart_ocr_ray.ops.dedup import cluster_pairs

    n = 41
    pairs = ray.data.from_arrow(
        pa.Table.from_pydict(
            {
                "left_id": pa.array(list(range(n - 1)), pa.int64()),
                "right_id": pa.array(list(range(1, n)), pa.int64()),
                "est_jaccard": pa.array([1.0] * (n - 1), pa.float64()),
            }
        )
    )
    with pytest.raises(RuntimeError, match="did not converge"):
        cluster_pairs(pairs, max_rounds=1)


def test_minhash_hot_bucket_collapses_exact_dups(ray_session, tmp_path):
    """A degenerate corpus (100 identical texts) exceeds
    HOT_BUCKET_LIMIT in every band bucket: the verify collapses the
    identical signatures to a representative star — O(m) pairs, one
    connected component — instead of O(m^2) pairwise work."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    import ray.data

    from smart_ocr_ray.ops.dedup import cluster_pairs, dedup_minhash_lsh

    boiler = (
        "Terms of service apply to all visitors of this site and use "
        "constitutes acceptance of the policy in full without exception."
    )
    distinct = (
        "A completely different article about monetary policy outcomes "
        "in small open economies during the tightening cycle of 2026."
    )
    table = pa.Table.from_pydict(
        {
            "doc_id": pa.array(list(range(101)), pa.int64()),
            "text": pa.array([boiler] * 100 + [distinct], pa.string()),
        }
    )
    sf = tmp_path / "hotsf"
    sf.mkdir()
    pq.write_table(table, sf / "documents.parquet")

    pairs = dedup_minhash_lsh(str(sf)).take_all()
    # Star topology: every duplicate pairs with representative 0 only.
    assert len(pairs) == 99
    assert all(p["left_id"] == 0 and p["est_jaccard"] == 1.0 for p in pairs)
    assert sorted(p["right_id"] for p in pairs) == list(range(1, 100))
    # The distinct doc never pairs; the dups form one cluster.
    clusters = cluster_pairs(
        ray.data.from_arrow(
            pa.Table.from_pylist(pairs) if pairs else pa.Table.from_pydict({})
        )
    ).take_all()
    assert {c["cluster_id"] for c in clusters} == {0}
    assert len(clusters) == 100


def test_dedup_normalized_catches_case_and_punct_variants(ray_session, tmp_path):
    """CCNet-style fuzzy-exact dedup: case/punctuation/whitespace
    variants share a normal form; genuinely different text doesn't."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from smart_ocr_ray.ops.dedup import dedup_normalized, normalized_text

    assert normalized_text("Hello,   World!") == normalized_text("hello world")
    assert normalized_text("a-b c") == "a b c"
    assert normalized_text("«§»") == ""  # no ASCII runs → empty norm

    texts = [
        "The Quick Brown Fox!",
        "the quick   brown fox",   # dup of 0 modulo case/punct/ws
        "THE QUICK BROWN FOX.",    # dup of 0
        "an entirely different document here",
    ]
    sf = tmp_path / "ndsf"; sf.mkdir()
    pq.write_table(
        pa.Table.from_pydict({
            "doc_id": pa.array(range(4), pa.int64()),
            "text": pa.array(texts, pa.string()),
        }),
        sf / "documents.parquet",
    )
    rows = {r["doc_id"]: r for r in dedup_normalized(str(sf)).take_all()}
    assert set(rows) == {0, 3}           # min-id survivors
    assert rows[0]["n_dups"] == 3
    assert rows[3]["n_dups"] == 1


def test_domain_stats_and_top_ngrams(ray_session, tmp_path):
    import pyarrow as pa
    import pyarrow.parquet as pq

    from smart_ocr_ray.ops.text_analysis import domain_stats, top_ngrams

    rows = [
        (0, "alpha beta gamma", "en", "s1"),
        (1, "alpha beta gamma", "en", "s1"),   # exact dup, same domain
        (2, "alpha beta delta", "en", "s2"),
        (3, "un deux trois", "fr", "s2"),
    ]
    sf = tmp_path / "dssf"; sf.mkdir()
    pq.write_table(
        pa.Table.from_pydict({
            "doc_id": pa.array([r[0] for r in rows], pa.int64()),
            "text": pa.array([r[1] for r in rows], pa.string()),
            "lang": pa.array([r[2] for r in rows], pa.string()),
            "source": pa.array([r[3] for r in rows], pa.string()),
        }),
        sf / "documents.parquet",
    )
    stats = {(r["source"], r["lang"]): r for r in domain_stats(str(sf)).take_all()}
    assert stats[("s1", "en")]["n_docs"] == 2
    assert stats[("s1", "en")]["n_distinct_texts"] == 1  # dup collapsed
    assert stats[("s1", "en")]["total_tokens"] == 6
    assert stats[("s1", "en")]["mean_tokens_e2"] == 300
    assert stats[("s2", "en")]["n_docs"] == 1
    assert stats[("s2", "fr")]["n_distinct_texts"] == 1

    grams = top_ngrams(str(sf), n=2, k=3).take_all()
    assert grams[0]["ngram"] == "alpha beta" and grams[0]["cnt"] == 3
    # deterministic tie order: cnt desc, then ngram asc
    assert [g["ngram"] for g in grams[1:]] == ["beta gamma", "beta delta"]


def test_events_asof_join_semantics(ray_session, tmp_path):
    """As-of join: each left event matches the most recent right event
    at-or-before its ts for the same user; no prior right → dropped;
    equal-ts rights dedupe to max event_id."""
    import datetime as dt

    import pyarrow as pa
    import pyarrow.parquet as pq

    from smart_ocr_ray.ops.relational import events_asof_join

    t0 = dt.datetime(2024, 1, 1)
    rows = [
        # (event_id, ts_offset_s, user, type)
        (1, 0, 7, "click"),
        (2, 10, 7, "click"),      # latest click before the purchase
        (3, 10, 7, "click"),      # same ts — max event_id wins
        (4, 20, 7, "purchase"),
        (5, 5, 8, "purchase"),    # user 8 has no prior click → dropped
        (6, 30, 8, "click"),
        (7, 30, 8, "purchase"),   # click at the SAME instant counts (<=)
    ]
    sf = tmp_path / "asofsf"; sf.mkdir()
    pq.write_table(
        pa.Table.from_pydict({
            "event_id": pa.array([r[0] for r in rows], pa.int64()),
            "ts": pa.array([t0 + dt.timedelta(seconds=r[1]) for r in rows],
                           pa.timestamp("us")),
            "user_id": pa.array([r[2] for r in rows], pa.int64()),
            "event_type": pa.array([r[3] for r in rows], pa.string()),
            "value": pa.array([1.0] * len(rows), pa.float64()),
        }),
        sf / "events.parquet",
    )
    out = {r["event_id"]: r for r in events_asof_join(str(sf)).take_all()}
    assert set(out) == {4, 7}                       # purchase 5 dropped
    assert out[4]["matched_event_id"] == 3          # equal-ts tie → max id
    assert out[4]["gap_us"] == 10_000_000
    assert out[7]["matched_event_id"] == 6 and out[7]["gap_us"] == 0


def test_events_running_total_semantics(ray_session, tmp_path):
    """Per-user running totals: inclusive prefix sums on the 1e-2 grid
    under (ts, event_id) order — equal-ts rows ordered by event_id,
    seq restarts per user, negatives sum exactly."""
    import datetime as dt

    import pyarrow as pa
    import pyarrow.parquet as pq

    from smart_ocr_ray.ops.relational import events_running_total

    t0 = dt.datetime(2024, 1, 1)
    rows = [
        # (event_id, ts_offset_s, user, value)
        (5, 10, 7, 1.25),
        (2, 10, 7, 0.50),   # same ts as event 5 — event_id breaks the tie
        (9, 0, 7, -2.00),   # earliest despite the largest value
        (1, 0, 8, 0.01),
        (3, 60, 8, 0.02),
    ]
    sf = tmp_path / "runsf"; sf.mkdir()
    pq.write_table(
        pa.Table.from_pydict({
            "event_id": pa.array([r[0] for r in rows], pa.int64()),
            "ts": pa.array([t0 + dt.timedelta(seconds=r[1]) for r in rows],
                           pa.timestamp("us")),
            "user_id": pa.array([r[2] for r in rows], pa.int64()),
            "event_type": pa.array(["click"] * len(rows), pa.string()),
            "value": pa.array([r[3] for r in rows], pa.float64()),
        }),
        sf / "events.parquet",
    )
    got = {r["event_id"]: r for r in events_running_total(str(sf)).take_all()}
    assert len(got) == len(rows)
    # user 7 order: 9 (ts=0), then ts=10 ties → 2 before 5.
    assert [(got[e]["seq"], got[e]["cum_value_e2"]) for e in (9, 2, 5)] == [
        (1, -200), (2, -150), (3, -25)
    ]
    assert [(got[e]["seq"], got[e]["cum_value_e2"]) for e in (1, 3)] == [
        (1, 1), (2, 3)
    ]
    for eid, r in got.items():
        assert r["user_id"] == {5: 7, 2: 7, 9: 7, 1: 8, 3: 8}[eid]


def test_events_funnel_chaining(ray_session, tmp_path):
    """Funnel depth rule: chained min-ts with >= (same-instant events
    progress), later-step events BEFORE the reached step don't count,
    missing first step excludes the user entirely."""
    import datetime as dt

    import pyarrow as pa
    import pyarrow.parquet as pq

    from smart_ocr_ray.ops.relational import events_funnel

    t0 = dt.datetime(2024, 1, 1)
    rows = [
        # user A: full path incl. a same-ts view→click hop → depth 4
        (1, "signup", 0), (1, "view", 5), (1, "click", 5), (1, "purchase", 10),
        # user B: view BEFORE the signup only → depth 1
        (2, "view", 5), (2, "signup", 10),
        # user C: signup then view → depth 2
        (3, "signup", 0), (3, "view", 15),
        # user D: no signup at all → depth 0, counted nowhere
        (4, "view", 0), (4, "click", 1), (4, "purchase", 2),
        # user E: all four at the same instant → depth 4
        (5, "signup", 100), (5, "view", 100), (5, "click", 100),
        (5, "purchase", 100),
        # user F: click predates the chained view min (t2=20) → depth 2
        (6, "signup", 0), (6, "click", 10), (6, "view", 20),
    ]
    sf = tmp_path / "funsf"; sf.mkdir()
    pq.write_table(
        pa.Table.from_pydict({
            "event_id": pa.array(range(len(rows)), pa.int64()),
            "ts": pa.array([t0 + dt.timedelta(seconds=r[2]) for r in rows],
                           pa.timestamp("us")),
            "user_id": pa.array([r[0] for r in rows], pa.int64()),
            "event_type": pa.array([r[1] for r in rows], pa.string()),
            "value": pa.array([1.0] * len(rows), pa.float64()),
        }),
        sf / "events.parquet",
    )
    out = {r["step"]: r for r in events_funnel(str(sf)).take_all()}
    assert [out[s]["event_type"] for s in (1, 2, 3, 4)] == [
        "signup", "view", "click", "purchase"
    ]
    assert [out[s]["n_users"] for s in (1, 2, 3, 4)] == [5, 4, 2, 2]


def test_events_retention_cohorts(ray_session, tmp_path):
    """Cohort retention: cohort = day of first event, cells count
    DISTINCT users — repeated same-day activity collapses even when
    the repeats live in different input shards (blocks)."""
    import datetime as dt

    import pyarrow as pa
    import pyarrow.parquet as pq

    from smart_ocr_ray.ops.relational import events_retention

    t0 = dt.datetime(2024, 3, 1)

    def _tbl(rows, start_id):
        return pa.Table.from_pydict({
            "event_id": pa.array(range(start_id, start_id + len(rows)), pa.int64()),
            "ts": pa.array(
                [t0 + dt.timedelta(days=r[1], seconds=r[2]) for r in rows],
                pa.timestamp("us"),
            ),
            "user_id": pa.array([r[0] for r in rows], pa.int64()),
            "event_type": pa.array(["view"] * len(rows), pa.string()),
            "value": pa.array([1.0] * len(rows), pa.float64()),
        })

    sf = tmp_path / "retsf"; (sf / "events.parquet").mkdir(parents=True)
    # Shard A: user 1 on days 0 (twice), 1, 5; user 3 on day 0.
    pq.write_table(
        _tbl([(1, 0, 10), (1, 0, 60), (1, 1, 0), (1, 5, 0), (3, 0, 0)], 0),
        sf / "events.parquet" / "a.parquet",
    )
    # Shard B: user 1 AGAIN on day 0 (cross-block duplicate), user 2
    # cohorted at day 1, user 3 on day 1.
    pq.write_table(
        _tbl([(1, 0, 99), (2, 1, 0), (2, 2, 0), (3, 1, 0)], 100),
        sf / "events.parquet" / "b.parquet",
    )

    got = {
        (r["cohort_day"], r["day_offset"]): r["n_users"]
        for r in events_retention(str(sf)).take_all()
    }
    d0 = (t0 - dt.datetime(1970, 1, 1)).days
    assert got == {
        (d0, 0): 2,      # users 1 and 3 — day-0 repeats collapsed
        (d0, 1): 2,      # both active the next day
        (d0, 5): 1,      # only user 1
        (d0 + 1, 0): 1,  # user 2's own cohort
        (d0 + 1, 1): 1,
    }


def test_events_range_join_semantics(ray_session, tmp_path):
    """Range join: every purchase strictly after an error within the
    window, across users; window end inclusive; bucket-boundary pairs
    (left near a bucket edge, right in the next bucket) are produced
    exactly once via the 2-bucket left replication."""
    import datetime as dt

    import pyarrow as pa
    import pyarrow.parquet as pq

    from smart_ocr_ray.ops.relational import events_range_join

    t0 = dt.datetime(2024, 1, 1)
    W = 600  # window/bucket width in seconds
    rows = [
        # (event_id, ts_offset_s, user, type)
        (1, 0, 7, "error"),
        (2, 0, 8, "purchase"),        # same instant — NOT after → excluded
        (3, 1, 8, "purchase"),        # in window, other user → pair
        (4, W, 9, "purchase"),        # exactly ts+W → inclusive end, pair
        (5, W + 1, 9, "purchase"),    # just past the window → excluded
        (6, W - 5, 5, "error"),       # left 5s before bucket 0 ends...
        (7, W + 2, 5, "purchase"),    # ...right in bucket 1 → cross-bucket pair
        (8, 3 * W, 1, "error"),       # no purchases in its window
    ]
    sf = tmp_path / "rjsf"; sf.mkdir()
    pq.write_table(
        pa.Table.from_pydict({
            "event_id": pa.array([r[0] for r in rows], pa.int64()),
            "ts": pa.array([t0 + dt.timedelta(seconds=r[1]) for r in rows],
                           pa.timestamp("us")),
            "user_id": pa.array([r[2] for r in rows], pa.int64()),
            "event_type": pa.array([r[3] for r in rows], pa.string()),
            "value": pa.array([1.0] * len(rows), pa.float64()),
        }),
        sf / "events.parquet",
    )
    out = events_range_join(str(sf), window_s=W).take_all()
    pairs = sorted((r["left_id"], r["right_id"]) for r in out)
    # error 1 → purchases 3 and 4 (same-instant 2 and past-window 5 out);
    # error 6 → purchases 4, 5 and 7 (4 at +5s, 5 at +6s, 7 cross-bucket);
    # each pair exactly once (no replication duplicates).
    assert pairs == [(1, 3), (1, 4), (6, 4), (6, 5), (6, 7)]
    gaps = {(r["left_id"], r["right_id"]): r["gap_us"] for r in out}
    assert gaps[(1, 4)] == W * 1_000_000          # inclusive end
    assert gaps[(6, 7)] == 7 * 1_000_000          # cross-bucket pair
    assert all(0 < g <= W * 1_000_000 for g in gaps.values())


def test_events_hll_hourly_registers_and_estimate(ray_session, tmp_path):
    """Windowed HLL: registers equal the sequential single-pass kernel,
    duplicates never change them, and the estimate epilogue lands
    within HLL's expected error (1.04/sqrt(64) ~ 13%) of the truth."""
    import datetime as dt

    import pyarrow as pa
    import pyarrow.parquet as pq

    from smart_ocr_ray.functions.textstats import _kgram_hash64
    from smart_ocr_ray.ops.relational import events_hll_hourly, hll_estimate

    t0 = dt.datetime(2024, 3, 1, 12)
    n_users = 500
    # every user twice in hour 0 (duplicates), users 0..9 again in hour 1
    rows = [(u, 0) for u in range(n_users)] * 2 + [(u, 1) for u in range(10)]
    sf = tmp_path / "hllsf"; sf.mkdir()
    pq.write_table(
        pa.Table.from_pydict({
            "event_id": pa.array(range(len(rows)), pa.int64()),
            "ts": pa.array(
                [t0 + dt.timedelta(hours=h, seconds=i % 60) for i, (_, h) in enumerate(rows)],
                pa.timestamp("us"),
            ),
            "user_id": pa.array([u for u, _ in rows], pa.int64()),
            "event_type": pa.array(["view"] * len(rows), pa.string()),
            "value": pa.array([0.0] * len(rows), pa.float64()),
        }),
        sf / "events.parquet",
    )
    out = events_hll_hourly(str(sf)).take_all()
    by_window = {}
    for r in out:
        by_window.setdefault(r["window_start"].hour, {})[r["register"]] = r["max_rank"]

    # sequential kernel over hour 0's distinct users
    expect = {}
    for u in range(n_users):
        h = _kgram_hash64(str(u))
        reg, v = h & 0x3F, h >> 6
        rank = 59 - v.bit_length() if v else 59
        expect[reg] = max(expect.get(reg, 0), rank)
    assert by_window[12] == expect  # duplicates changed nothing

    est = hll_estimate(by_window[12])
    assert abs(est - n_users) / n_users < 0.15
    # hour 1: 10 distinct users → linear-counting regime, still close
    assert abs(hll_estimate(by_window[13]) - 10) <= 3


def test_pmi_pairs_known_answer(ray_session, tmp_path):
    """PMI: an always-adjacent pair scores high positive bits, an
    anti-correlated frequent pair scores negative, sub-min_count pairs
    are dropped, and distance-2 (skip-gram) pairs count."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from smart_ocr_ray.ops.text_analysis import pmi_pairs

    # 20 docs: "alpha beta" always together; filler words everywhere;
    # "left" and "right" each frequent but never within the window.
    texts = ["alpha beta common1 common2 left common1 common2 right"] * 10 + [
        "common1 alpha beta common2 right common1 common2 left"
    ] * 10
    texts.append("rare1 rare2")  # pair_cnt 1 → dropped by min_count
    sf = tmp_path / "pmisf"; sf.mkdir()
    pq.write_table(
        pa.Table.from_pydict({
            "doc_id": pa.array(range(len(texts)), pa.int64()),
            "text": pa.array(texts, pa.string()),
            "lang": pa.array(["en"] * len(texts), pa.string()),
            "source": pa.array(["t"] * len(texts), pa.string()),
        }),
        sf / "documents.parquet",
    )
    out = pmi_pairs(str(sf), min_count=5).take_all()
    by_pair = {(r["w1"], r["w2"]): r for r in out}
    assert ("rare1", "rare2") not in by_pair            # min_count
    ab = by_pair[("alpha", "beta")]
    assert ab["pair_cnt"] == 20 and ab["pmi_bits"] >= 3  # always adjacent
    assert ("left", "right") not in by_pair              # never co-window
    # distance-2 pair exists ("alpha", "common1" in doc type 1)
    assert ("alpha", "common1") in by_pair
    # an independent frequent pair scores below the correlated one
    cc = by_pair[("common1", "common2")]
    assert cc["pmi_bits"] < ab["pmi_bits"]


def test_bpe_merges_known_answer(ray_session, tmp_path):
    """Iterative BPE: greedy chain application, count-desc/pair-asc
    argmax, self-pair exclusion, and early stop when only self-pairs
    remain."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from smart_ocr_ray.ops.text_analysis import bpe_merges

    # vocab: 'ababab' (chain of (a,b)), 'cd' x3, 'eeee' (self-pairs only)
    texts = ["ababab cd eeee", "cd cd"]
    sf = tmp_path / "bpesf"; sf.mkdir()
    pq.write_table(
        pa.Table.from_pydict({
            "doc_id": pa.array(range(len(texts)), pa.int64()),
            "text": pa.array(texts, pa.string()),
            "lang": pa.array(["en"] * len(texts), pa.string()),
            "source": pa.array(["t"] * len(texts), pa.string()),
        }),
        sf / "documents.parquet",
    )
    out = bpe_merges(str(sf), rounds=6).take_all()
    got = [(r["round"], r["left_sym"], r["right_sym"], r["cnt"]) for r in out]
    # r1: (a,b)=3 ties (c,d)=3 → pair asc picks (a,b); greedy turns
    # ababab into [ab,ab,ab] (ALL chain occurrences merge).
    # r2: (ab,ab)=2 is a self-pair (excluded); (c,d)=3 wins.
    # r3: only self-pairs (ab,ab) and (e,e) remain → early stop.
    assert got == [(1, "a", "b", 3), (2, "c", "d", 3)]


def test_phrase_search_adjacency_and_counts(ray_session, tmp_path):
    """Phrase search: exact adjacency only, multiple hits counted,
    docs with both terms but never adjacent excluded, repeated-word
    phrases handled."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from smart_ocr_ray.ops.text_analysis import phrase_search

    texts = [
        "window join now and window join again",   # 2 hits
        "join window",                               # reversed → 0
        "window x join",                             # gap → 0
        "the Window JOIN case",                      # lowercased → 1
        "no terms here",                             # no postings
    ]
    sf = tmp_path / "phsf"; sf.mkdir()
    pq.write_table(
        pa.Table.from_pydict({
            "doc_id": pa.array(range(len(texts)), pa.int64()),
            "text": pa.array(texts, pa.string()),
            "lang": pa.array(["en"] * len(texts), pa.string()),
            "source": pa.array(["t"] * len(texts), pa.string()),
        }),
        sf / "documents.parquet",
    )
    out = {r["doc_id"]: r["n_hits"] for r in phrase_search(str(sf)).take_all()}
    assert out == {0: 2, 3: 1}
    # repeated-word phrase: "batch batch batch" has 2 adjacent pairs
    out2 = {
        r["doc_id"]: r["n_hits"]
        for r in phrase_search(str(sf), phrase=("and", "window")).take_all()
    }
    assert out2 == {0: 1}


def test_dataset_split_deterministic_and_stable(ray_session, tmp_path):
    """Hash split: permille ratios hold roughly, assignment depends
    only on doc_id (stable under corpus subsetting)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from smart_ocr_ray.ops.text_analysis import dataset_split

    def write(sf, ids):
        sf.mkdir()
        pq.write_table(
            pa.Table.from_pydict({
                "doc_id": pa.array(ids, pa.int64()),
                "text": pa.array(["x"] * len(ids), pa.string()),
                "lang": pa.array(["en"] * len(ids), pa.string()),
                "source": pa.array(["t"] * len(ids), pa.string()),
            }),
            sf / "documents.parquet",
        )

    full = tmp_path / "full"; write(full, list(range(5000)))
    rows = dataset_split(str(full)).take_all()
    by_split = {}
    for r in rows:
        by_split.setdefault(r["split"], set()).add(r["doc_id"])
    n = len(rows)
    assert 0.005 < len(by_split["val"]) / n < 0.02
    assert 0.005 < len(by_split["test"]) / n < 0.02
    assert len(by_split["train"]) / n > 0.95

    # subsetting the corpus never moves a doc between splits
    sub = tmp_path / "sub"; write(sub, list(range(0, 5000, 7)))
    for r in dataset_split(str(sub)).take_all():
        assert r["doc_id"] in by_split[r["split"]]


def test_quality_filter_rules_and_order(ray_session, tmp_path):
    """Gopher-style filter: each rule fires in order with its reason;
    clean prose keeps."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from smart_ocr_ray.ops.text_analysis import quality_filter

    clean = ("the committee reviewed the quarterly figures and it was for "
             "a detailed discussion of market conditions that " * 3)
    rows = [
        (0, "too short", "en"),                               # too_short
        (1, "x " * 60, "en"),                                 # word_length (mean 1)
        (2, clean + "@@!! " * 40, "en"),                      # symbol_ratio
        (3, ("lorem ipsum dolor sit amet " * 12), "en"),      # stopwords (no EN stopwords)
        (4, clean, "en"),                                     # keep
        (5, ("palabras sin stopwords ingleses aqui mismo " * 10), "es"),  # keep (rule 5 en-only)
    ]
    sf = tmp_path / "qfsf"; sf.mkdir()
    pq.write_table(
        pa.Table.from_pydict({
            "doc_id": pa.array([r[0] for r in rows], pa.int64()),
            "text": pa.array([r[1] for r in rows], pa.string()),
            "lang": pa.array([r[2] for r in rows], pa.string()),
        }),
        sf / "documents.parquet",
    )
    out = {r["doc_id"]: r for r in quality_filter(str(sf)).take_all()}
    assert out[0]["reason"] == "too_short"
    assert out[1]["reason"] == "word_length"
    assert out[2]["reason"] == "symbol_ratio"
    assert out[3]["reason"] == "stopwords"
    assert out[4]["keep"] and out[4]["reason"] == ""
    assert out[5]["keep"]


def test_stratified_sample_deterministic_and_rate_shaped(ray_session):
    from smart_ocr_ray.ops.text_analysis import stratified_sample

    sf = "/root/testdata/sf0.01"
    a = sorted(r["doc_id"] for r in stratified_sample(sf).take_all())
    b = sorted(r["doc_id"] for r in stratified_sample(sf).take_all())
    assert a == b and len(a) > 0  # reproducible, no RNG state
    by_lang = {}
    for r in stratified_sample(sf).take_all():
        by_lang[r["lang"]] = by_lang.get(r["lang"], 0) + 1
    # en keeps ~50%, zh ~15% — the rate shaping is visible.
    assert by_lang.get("en", 0) > by_lang.get("zh", 0)


def test_sample_exact_k_budget_and_hash_order(ray_session):
    """Exact-k sample: precisely k rows, ranked 1..k in md5-hash order,
    and membership is stable under a different block layout (the
    per-block combiner + merge must agree with a single-pass oracle)."""
    import hashlib

    from smart_ocr_ray.ops.text_analysis import sample_exact_k

    sf = "/root/testdata/sf0.001"
    rows = sample_exact_k(sf, k=17).take_all()
    assert len(rows) == 17
    assert sorted(r["sample_rank"] for r in rows) == list(range(1, 18))
    # Single-pass oracle over the raw table.
    import pyarrow.parquet as pq

    ids = pq.read_table(f"{sf}/documents.parquet", columns=["doc_id"]).column(
        "doc_id"
    ).to_pylist()
    key = lambda d: (
        int.from_bytes(hashlib.md5(str(d).encode()).digest()[8:16], "little"),
        d,
    )
    expect = sorted(ids, key=key)[:17]
    got = [r["doc_id"] for r in sorted(rows, key=lambda r: r["sample_rank"])]
    assert got == expect


def test_contamination_check_flags_benchmark_overlap(ray_session, tmp_path):
    """Decontamination sweep: a doc sharing an 8-gram with a benchmark
    doc is flagged; unrelated docs aren't; benchmark docs are excluded
    from the output."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from smart_ocr_ray.ops.text_analysis import contamination_check

    bench_text = "the capital of france is paris and its river is the seine today"
    leak = "QUESTION: " + bench_text + " ANSWER IGNORED"  # contains bench 8-grams
    clean = "completely unrelated prose about deep sea vents and mineral chimneys forming slowly"
    texts = [bench_text, clean, leak]
    sf = tmp_path / "ccsf"; sf.mkdir()
    pq.write_table(
        pa.Table.from_pydict({
            "doc_id": pa.array([0, 10, 20], pa.int64()),
            "text": pa.array(texts, pa.string()),
        }),
        sf / "documents.parquet",
    )
    rows = {r["doc_id"]: r for r in contamination_check(str(sf), bench_docs=1).take_all()}
    assert set(rows) == {10, 20}       # benchmark doc 0 excluded
    assert rows[20]["contaminated"] and rows[20]["n_hits"] >= 1
    assert not rows[10]["contaminated"] and rows[10]["n_hits"] == 0


def test_collapse_hot_bucket_noop_below_limit():
    """The shared guard is exactly free on non-degenerate buckets: at or
    below HOT_BUCKET_LIMIT it returns the input list object untouched
    and no star pairs (profiled r3: no sf0.1 MinHash band bucket
    exceeds 4 members, so bench overhead is one len() comparison)."""
    from smart_ocr_ray.ops.dedup import HOT_BUCKET_LIMIT, collapse_hot_bucket

    ordered = list(range(HOT_BUCKET_LIMIT))
    reps, stars = collapse_hot_bucket(ordered, key_of=lambda d: d % 7)
    assert reps is ordered  # identity, not a copy — zero work
    assert stars == []
    # One past the limit: collapse engages (distinct keys → no stars,
    # same membership; duplicate keys → star pairs).
    over = list(range(HOT_BUCKET_LIMIT + 1))
    reps, stars = collapse_hot_bucket(over, key_of=lambda d: d)
    assert reps == over and stars == []
    reps, stars = collapse_hot_bucket(over, key_of=lambda d: 0)
    assert reps == [0]
    assert stars == [(0, m) for m in over[1:]]


def test_simhash_pairs_semantics_and_degenerate_guard(ray_session, tmp_path):
    """dedup_simhash_pairs: identical texts pair at hamming 0; unrelated
    texts don't pair; a degenerate corpus (hundreds of identical docs
    in one bucket) collapses to a linear star via the shared guard."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from smart_ocr_ray.ops.dedup import dedup_simhash_pairs

    base = "the quick brown fox jumps over the lazy dog again and again " * 5
    other = "completely different content about maritime navigation charts " * 5
    n_dup = 300
    texts = [base] * n_dup + [other]
    sf = tmp_path / "shsf"; sf.mkdir()
    pq.write_table(
        pa.Table.from_pydict({
            "doc_id": pa.array(range(len(texts)), pa.int64()),
            "text": pa.array(texts, pa.string()),
        }),
        sf / "documents.parquet",
    )
    pairs = dedup_simhash_pairs(str(sf)).take_all()
    star = [p for p in pairs if p["left_id"] == 0 and p["hamming"] == 0]
    # Guard engaged (bucket of 300 > HOT_BUCKET_LIMIT): duplicates pair
    # with representative 0 only — linear, not C(300,2).
    assert len(star) == n_dup - 1
    assert sorted(p["right_id"] for p in star) == list(range(1, n_dup))
    assert len(pairs) == n_dup - 1  # the distinct doc never pairs


def test_simhash_clusters_star_and_isolation(ray_session, tmp_path):
    """dedup_simhash_clusters: two identical-text families become two
    components labeled by their min doc_id; the distinct doc is absent;
    the guarded star (family A > HOT_BUCKET_LIMIT) still yields ONE
    component — the collapse is component-preserving."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from smart_ocr_ray.ops.dedup import dedup_simhash_clusters

    fam_a = "the quick brown fox jumps over the lazy dog again and again " * 5
    fam_b = "completely different content about maritime navigation charts " * 5
    lone = "a third unrelated essay on volcanic basalt column formation " * 5
    n_a = 80  # > HOT_BUCKET_LIMIT — exercises the star collapse
    texts = [fam_a] * n_a + [fam_b, fam_b, lone]
    sf = tmp_path / "shcl"; sf.mkdir()
    pq.write_table(
        pa.Table.from_pydict({
            "doc_id": pa.array(range(len(texts)), pa.int64()),
            "text": pa.array(texts, pa.string()),
        }),
        sf / "documents.parquet",
    )
    rows = dedup_simhash_clusters(str(sf)).take_all()
    labels = {r["doc_id"]: r["cluster_id"] for r in rows}
    assert len(labels) == n_a + 2  # lone doc never appears
    assert all(labels[d] == 0 for d in range(n_a))
    assert labels[n_a] == n_a and labels[n_a + 1] == n_a


def test_code_switch_spans_windows(ray_session, tmp_path):
    """code_switch_spans: a doc whose first 32 tokens are English and
    next 32 French gets win0=en (unswitched), win1=fr (switched); doc
    lang is the tie-break winner 'en'; an empty doc yields one 'und'
    row at win_idx 0."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from smart_ocr_ray.ops.text_analysis import code_switch_spans

    mixed = " ".join(["the and of it"] * 8 + ["le est dans une"] * 8)
    sf = tmp_path / "cs"; sf.mkdir()
    pq.write_table(
        pa.Table.from_pydict({
            "doc_id": pa.array([0, 1], pa.int64()),
            "text": pa.array([mixed, ""], pa.string()),
        }),
        sf / "documents.parquet",
    )
    rows = {(r["doc_id"], r["win_idx"]): r
            for r in code_switch_spans(str(sf)).take_all()}
    assert len(rows) == 3
    assert rows[(0, 0)]["win_lang"] == "en" and not rows[(0, 0)]["switched"]
    assert rows[(0, 1)]["win_lang"] == "fr" and rows[(0, 1)]["switched"]
    assert rows[(0, 0)]["doc_lang"] == "en"  # 32-32 tie breaks by code
    assert rows[(1, 0)]["win_lang"] == "und" and not rows[(1, 0)]["switched"]


def test_domain_dedup_stats_rollup(ray_session, tmp_path):
    """domain_dedup_stats: a mirror source (every doc an exact copy of
    doc 0) collapses to kept_permille 0 except the representative's
    source; an original source keeps 1000 permille."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from smart_ocr_ray.ops.dedup import domain_dedup_stats

    dup = "the same mirrored article body repeated across the mirror " * 6
    rows = [(0, "orig", dup)]  # representative lives in 'orig'
    rows += [(i, "mirror", dup) for i in range(1, 5)]
    rows += [(10, "orig", "a unique piece of original writing " * 6)]
    sf = tmp_path / "dds"; sf.mkdir()
    pq.write_table(
        pa.Table.from_pydict({
            "doc_id": pa.array([r[0] for r in rows], pa.int64()),
            "source": pa.array([r[1] for r in rows], pa.string()),
            "text": pa.array([r[2] for r in rows], pa.string()),
        }),
        sf / "documents.parquet",
    )
    out = {r["source"]: r for r in domain_dedup_stats(str(sf)).take_all()}
    assert out["orig"]["n_docs"] == 2 and out["orig"]["kept_permille"] == 1000
    assert out["mirror"]["n_docs"] == 4 and out["mirror"]["n_kept"] == 0
    assert out["mirror"]["n_exact_dup"] == 4
    assert out["mirror"]["kept_permille"] == 0


def test_bot_users_metronome_flag(ray_session, tmp_path):
    """bot_users: a 25-event perfectly periodic user flags as bot
    (var 0); a bursty 3-event user doesn't (n < 20 and high var);
    single-event users emit no row."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from smart_ocr_ray.ops.relational import bot_users

    us = 1_000_000
    rows = []
    for i in range(25):  # user 1: every 60 s exactly
        rows.append((100 + i, 1, i * 60 * us))
    rows.append((200, 2, 0))  # user 2: gaps 10 s, 1000 s
    rows.append((201, 2, 10 * us))
    rows.append((202, 2, 1010 * us))
    rows.append((300, 3, 5 * us))  # single event: no row
    sf = tmp_path / "bot"; sf.mkdir()
    pq.write_table(
        pa.Table.from_pydict({
            "event_id": pa.array([r[0] for r in rows], pa.int64()),
            "user_id": pa.array([r[1] for r in rows], pa.int64()),
            "ts": pa.array([r[2] for r in rows], pa.timestamp("us")),
        }),
        sf / "events.parquet",
    )
    out = {r["user_id"]: r for r in bot_users(str(sf)).take_all()}
    assert set(out) == {1, 2}
    assert out[1]["n_events"] == 25 and out[1]["gap_var"] == 0
    assert out[1]["mean_gap_s"] == 60 and out[1]["is_bot"]
    # user 2: gaps 10,1000 -> mean 505, var = (2*1000100 - 1020100)//4
    assert out[2]["mean_gap_s"] == 505
    assert out[2]["gap_var"] == (2 * (100 + 1_000_000) - 1010 * 1010) // 4
    assert not out[2]["is_bot"]


def test_lang_margin_confidence(ray_session, tmp_path):
    """lang_margin: a clean-English doc is confident; an en/fr tie has
    margin 0 (tie-break picks en, not confident); empty and
    no-stopword docs are 'und'."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from smart_ocr_ray.ops.text_analysis import lang_margin

    sf = tmp_path / "lm"; sf.mkdir()
    pq.write_table(
        pa.Table.from_pydict({
            "doc_id": pa.array([0, 1, 2, 3], pa.int64()),
            "text": pa.array([
                "the and of it",                    # en 4 / others 0
                "the and of it le est dans une",    # en 4 / fr 4 tie
                "",                                  # empty
                "xyz qrs",                           # no stopwords
            ], pa.string()),
        }),
        sf / "documents.parquet",
    )
    rows = {r["doc_id"]: r for r in lang_margin(str(sf)).take_all()}
    assert rows[0]["pred_lang"] == "en" and rows[0]["margin"] == 4
    assert rows[0]["confident"]
    assert rows[1]["pred_lang"] == "en" and rows[1]["margin"] == 0
    assert not rows[1]["confident"]
    assert rows[2]["pred_lang"] == "und" and not rows[2]["confident"]
    assert rows[3]["pred_lang"] == "und" and rows[3]["best_hits"] == 0


def test_source_gini_exact(ray_session, tmp_path):
    """source_gini: equal sources -> 0; a 1:9 split -> exactly 0.4 on
    the e6 grid (rank formula)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from smart_ocr_ray.ops.text_analysis import source_gini

    def _write(d, sources):
        d.mkdir()
        pq.write_table(
            pa.Table.from_pydict({
                "doc_id": pa.array(range(len(sources)), pa.int64()),
                "source": pa.array(sources, pa.string()),
            }),
            d / "documents.parquet",
        )

    even = tmp_path / "even"; _write(even, ["a", "b"])
    skew = tmp_path / "skew"; _write(skew, ["a"] + ["b"] * 9)
    r_even = source_gini(str(even)).to_pylist()[0]
    r_skew = source_gini(str(skew)).to_pylist()[0]
    assert r_even == {"n_sources": 2, "n_docs": 2, "gini_e6": 0}
    assert r_skew == {"n_sources": 2, "n_docs": 10, "gini_e6": 400000}


def test_vocab_coverage_exact_curve(ray_session, tmp_path):
    """vocab_coverage: hand-computed Zipf toy (a×6 b×3 c×1, A=10) —
    boundary-class partial ranks are exact integers."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from smart_ocr_ray.ops.text_analysis import vocab_coverage

    sf = tmp_path / "vc"; sf.mkdir()
    pq.write_table(
        pa.Table.from_pydict({
            "doc_id": pa.array([0, 1], pa.int64()),
            "text": pa.array(["a a a a b b c", "a a b"], pa.string()),
        }),
        sf / "documents.parquet",
    )
    rows = {r["coverage_pct"]: (r["vocab_size"], r["cum_tokens"])
            for r in vocab_coverage(str(sf)).to_pylist()}
    assert rows == {50: (1, 6), 90: (2, 9), 95: (3, 10), 99: (3, 10)}


def test_bigram_surprisal_exact_bits(ray_session, tmp_path):
    """bigram_surprisal: hand-computed den//c bit-lengths; docs with
    fewer than 2 tokens emit no row."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from smart_ocr_ray.ops.text_analysis import bigram_surprisal

    sf = tmp_path / "bs"; sf.mkdir()
    pq.write_table(
        pa.Table.from_pydict({
            "doc_id": pa.array([0, 1, 2], pa.int64()),
            "text": pa.array(["a b a b", "a b x", ""], pa.string()),
        }),
        sf / "documents.parquet",
    )
    rows = {r["doc_id"]: r for r in bigram_surprisal(str(sf)).take_all()}
    # c: (a,b)=3 (b,a)=1 (b,x)=1; den: a=3 b=2
    # bits: (a,b)=bitlen(1)=1, (b,a)=bitlen(2)=2, (b,x)=2
    assert len(rows) == 2
    assert rows[0]["n_bigrams"] == 3 and rows[0]["surprisal_bits"] == 4
    assert rows[0]["mean_bits_e3"] == 1333
    assert rows[1]["n_bigrams"] == 2 and rows[1]["surprisal_bits"] == 3
    assert rows[1]["mean_bits_e3"] == 1500


def test_bigram_surprisal_zero_bigram_corpus(ray_session, tmp_path):
    """bigram_surprisal: a corpus where every doc has < 2 tokens yields
    a TYPED empty dataset (the schema-less-empty hazard class)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from smart_ocr_ray.ops.text_analysis import bigram_surprisal

    sf = tmp_path / "bz"; sf.mkdir()
    pq.write_table(
        pa.Table.from_pydict({
            "doc_id": pa.array([0, 1], pa.int64()),
            "text": pa.array(["solo", ""], pa.string()),
        }),
        sf / "documents.parquet",
    )
    ds = bigram_surprisal(str(sf))
    assert ds.count() == 0
    assert set(ds.schema().names) == {
        "doc_id", "n_bigrams", "surprisal_bits", "mean_bits_e3"}


def test_cluster_safe_split_leakage_guard(ray_session, tmp_path):
    """cluster_safe_split: near-dup docs share group_id (= cluster min)
    and therefore the SAME split; singletons key by their own id with
    the exact dataset_split hash rule."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from smart_ocr_ray.functions.textstats import _kgram_hash64
    from smart_ocr_ray.ops.text_analysis import cluster_safe_split

    dup = "an identical paragraph of webtext repeated verbatim " * 6
    texts = {5: dup, 9: dup, 2: "a completely different standalone page " * 6}
    sf = tmp_path / "css"; sf.mkdir()
    pq.write_table(
        pa.Table.from_pydict({
            "doc_id": pa.array(sorted(texts), pa.int64()),
            "text": pa.array([texts[d] for d in sorted(texts)], pa.string()),
        }),
        sf / "documents.parquet",
    )
    rows = {r["doc_id"]: r for r in cluster_safe_split(str(sf)).take_all()}
    assert rows[5]["group_id"] == 5 and rows[9]["group_id"] == 5
    assert rows[5]["split"] == rows[9]["split"]
    assert rows[2]["group_id"] == 2
    for d in (2, 5, 9):
        want = _kgram_hash64(f"split-v1:{rows[d]['group_id']}") % 1000
        assert rows[d]["bucket"] == want


def test_tokenizer_fertility_grid(ray_session, tmp_path):
    """tokenizer_fertility: exact per-language (1e6*sum_bpeish)//sum_tokens
    with empty docs counted into n_docs but not the sums."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from smart_ocr_ray.ops.text_analysis import tokenizer_fertility

    sf = tmp_path / "tf"; sf.mkdir()
    pq.write_table(
        pa.Table.from_pydict({
            "doc_id": pa.array([0, 1, 2], pa.int64()),
            "lang": pa.array(["en", "fr", "fr"], pa.string()),
            # en: 2 words / 2 bpeish; fr: "a-b x!" = 2 words / 5 bpeish
            "text": pa.array(["ab cd", "a-b x!", ""], pa.string()),
        }),
        sf / "documents.parquet",
    )
    rows = {r["lang"]: r for r in tokenizer_fertility(str(sf)).take_all()}
    assert rows["en"]["n_docs"] == 1 and rows["en"]["fertility_e6"] == 1_000_000
    assert rows["fr"]["n_docs"] == 2
    assert rows["fr"]["sum_tokens"] == 2 and rows["fr"]["sum_bpeish"] == 5
    assert rows["fr"]["fertility_e6"] == 2_500_000


def test_majority_lang_strip_keep_rule(ray_session, tmp_path):
    """majority_lang_strip: the French window of a majority-English doc
    is dropped, the rebuilt text is the kept lowered-token stream, and
    an empty doc keeps its single 'und' window (md5 of '')."""
    import hashlib

    import pyarrow as pa
    import pyarrow.parquet as pq

    from smart_ocr_ray.ops.text_analysis import majority_lang_strip

    en_piece = " ".join(["the and of it"] * 8)   # 32 en tokens
    fr_piece = " ".join(["le est dans une"] * 8)  # 32 fr tokens
    sf = tmp_path / "mls"; sf.mkdir()
    pq.write_table(
        pa.Table.from_pydict({
            "doc_id": pa.array([0, 1], pa.int64()),
            # doc 0: en + fr + en -> middle window dropped
            "text": pa.array([f"{en_piece} {fr_piece} {en_piece}", ""],
                             pa.string()),
        }),
        sf / "documents.parquet",
    )
    rows = {r["doc_id"]: r for r in majority_lang_strip(str(sf)).take_all()}
    assert rows[0]["n_windows"] == 3 and rows[0]["kept_windows"] == 2
    want = hashlib.md5(f"{en_piece} {en_piece}".encode()).hexdigest()
    assert rows[0]["kept_md5"] == want
    assert rows[1]["n_windows"] == 1 and rows[1]["kept_windows"] == 1
    assert rows[1]["kept_md5"] == hashlib.md5(b"").hexdigest()


def test_shard_plan_greedy_packing(ray_session, tmp_path):
    """shard_plan: exclusive-prefix-sum floor-div packing over basename
    order, row counts from footers; a file straddling the target
    boundary stays in the shard its cum_prev places it in."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from smart_ocr_ray.ops.storage import shard_plan

    sizes = {"a.parquet": 400, "b.parquet": 700, "c.parquet": 100,
             "d.parquet": 900}
    d = tmp_path / "shards"; d.mkdir()
    for name, n in sizes.items():
        pq.write_table(
            pa.Table.from_pydict({"x": pa.array(range(n), pa.int64())}),
            d / name,
        )
    (d / "_SUCCESS").touch()  # non-parquet files are ignored
    plan = {r["file"]: (r["n_rows"], r["shard"])
            for r in shard_plan(str(d), target_rows=1000).take_all()}
    # cum_prev: a=0, b=400, c=1100, d=1200 -> shards 0,0,1,1
    assert plan == {"a.parquet": (400, 0), "b.parquet": (700, 0),
                    "c.parquet": (100, 1), "d.parquet": (900, 1)}


def test_compact_shards_atomic_resume(ray_session, tmp_path):
    """compact_shards executes the plan with per-shard atomic commits:
    the row multiset is byte-identical pre/post; a kill mid-compaction
    (simulated: one shard's commit record removed, stale tmp file left
    behind) resumes by recomputing exactly the uncommitted shard; an
    input_sig change invalidates everything."""
    import os

    import pyarrow as pa
    import pyarrow.parquet as pq

    from smart_ocr_ray.ops.storage import compact_shards

    src = tmp_path / "src"; src.mkdir()
    rng_rows = 0
    for i in range(6):
        n = 50 + i * 17
        pq.write_table(
            pa.Table.from_pydict({
                "url": pa.array([f"u{i}-{j}" for j in range(n)], pa.string()),
                "v": pa.array(range(rng_rows, rng_rows + n), pa.int64()),
            }),
            src / f"f{i}.parquet",
        )
        rng_rows += n
    out = tmp_path / "out"

    s1 = compact_shards(str(src), str(out), target_rows=120, input_sig="s1")
    assert s1["skipped"] == [] and s1["rows"] == rng_rows
    assert s1["n_shards"] == len(s1["completed"]) >= 3

    def read_all():
        t = pa.concat_tables([
            pq.read_table(out / f) for f in sorted(os.listdir(out))
            if f.endswith(".parquet") and not f.startswith("_")
        ])
        return sorted(zip(t["url"].to_pylist(), t["v"].to_pylist()))

    orig = sorted(
        (u, v)
        for i in range(6)
        for u, v in zip(
            pq.read_table(src / f"f{i}.parquet")["url"].to_pylist(),
            pq.read_table(src / f"f{i}.parquet")["v"].to_pylist(),
        )
    )
    assert read_all() == orig  # byte-identical row multiset post-compaction

    # Kill simulation: shard 1 committed its file but lost its manifest
    # (or vice versa — either way it is uncommitted); a stale tmp file
    # from the dead worker lingers.
    victim = s1["completed"][1]
    os.remove(out / "_manifests" / f"shard-{victim}.json")
    (out / "_tmp-shard-99-12345.parquet").write_bytes(b"garbage")

    s2 = compact_shards(str(src), str(out), target_rows=120, input_sig="s1")
    assert s2["completed"] == [victim]
    assert sorted(s2["skipped"] + s2["completed"]) == s1["completed"]
    assert s2["rows"] == rng_rows
    assert not any(f.startswith("_tmp-") for f in os.listdir(out))
    assert read_all() == orig

    # Changed input signature: nothing is trusted, everything rebuilt.
    s3 = compact_shards(str(src), str(out), target_rows=120, input_sig="s2")
    assert s3["skipped"] == [] and sorted(s3["completed"]) == s1["completed"]
    assert read_all() == orig


def test_lang_length_quantiles_exact(ray_session, tmp_path):
    """lang_length_quantiles: per-language integer-grid quantiles match
    the hand-computed rule (smallest v with cum*100 >= q*n) on a corpus
    with two languages of different length profiles."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from smart_ocr_ray.ops.text_analysis import lang_length_quantiles

    # en: lengths 1..10 (one doc each); fr: lengths 5, 5, 20.
    texts = [("en", "w " * n) for n in range(1, 11)]
    texts += [("fr", "m " * 5), ("fr", "m " * 5), ("fr", "m " * 20)]
    sf = tmp_path / "lq"; sf.mkdir()
    pq.write_table(
        pa.Table.from_pydict({
            "doc_id": pa.array(range(len(texts)), pa.int64()),
            "lang": pa.array([l for l, _ in texts], pa.string()),
            "text": pa.array([t.strip() for _, t in texts], pa.string()),
        }),
        sf / "documents.parquet",
    )
    rows = {(r["lang"], r["quantile_pct"]): r["n_tokens"]
            for r in lang_length_quantiles(str(sf)).take_all()}
    # en, n=10: q25 -> cum>=2.5 -> len 3; q50 -> 5; q75 -> 8; q90 -> 9; q99 -> 10
    assert rows[("en", 25)] == 3 and rows[("en", 50)] == 5
    assert rows[("en", 75)] == 8 and rows[("en", 90)] == 9
    assert rows[("en", 99)] == 10
    # fr, n=3: cum(5)=2 -> covers q25/q50 (2*100 >= 50*3); q75+ -> 20
    assert rows[("fr", 25)] == 5 and rows[("fr", 50)] == 5
    assert rows[("fr", 75)] == 20 and rows[("fr", 99)] == 20
    assert len(rows) == 10


def test_embedding_neardup_exact_and_lsh_recall(ray_session, tmp_path):
    """Embedding-cosine near-dup: the exact variant finds every pair, and
    the hyperplane-LSH scale path recovers most true near-dup pairs on a
    corpus with REAL near-duplicates (clusters of perturbed copies)."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    from smart_ocr_ray.ops.similarity import (
        embedding_neardup_lsh,
        embedding_neardup_pairs,
    )

    rng = np.random.default_rng(7)
    vecs, ids = [], []
    vid = 0
    for cluster in range(12):
        base = rng.standard_normal(64)
        base /= np.linalg.norm(base)
        for _ in range(4):  # 4 near-copies per cluster (cos ~0.99)
            v = base + 0.02 * rng.standard_normal(64)
            vecs.append((v / np.linalg.norm(v)).astype(np.float32))
            ids.append(vid); vid += 1
    for _ in range(40):  # unrelated background vectors
        v = rng.standard_normal(64)
        vecs.append((v / np.linalg.norm(v)).astype(np.float32))
        ids.append(vid); vid += 1

    sf = tmp_path / "embsf"; sf.mkdir()
    pq.write_table(
        pa.Table.from_pydict({
            "vec_id": pa.array(ids, pa.int64()),
            "embedding": pa.array([v.tolist() for v in vecs], pa.list_(pa.float32())),
        }),
        sf / "embeddings.parquet",
    )

    # ground truth at cos >= 0.95
    mat = np.stack([v.astype(np.float64) for v in vecs])
    mat /= np.linalg.norm(mat, axis=1, keepdims=True)
    e3 = np.round((mat @ mat.T) * 1000)
    truth = {(i, j) for i in range(len(ids)) for j in range(i + 1, len(ids)) if e3[i, j] >= 950}
    assert len(truth) >= 12 * 6 * 0.8  # clusters actually are near-dups

    exact = {(p["left_id"], p["right_id"])
             for p in embedding_neardup_pairs(str(sf), threshold_e3=950, max_vec_id=10**9).take_all()}
    assert exact == truth

    lsh = {(p["left_id"], p["right_id"])
           for p in embedding_neardup_lsh(str(sf), threshold_e3=950).take_all()}
    assert lsh <= exact  # never invents pairs
    recall = len(lsh) / len(truth)
    assert recall >= 0.8, f"LSH recall {recall:.2f} below floor"

    # Cluster composition: every perturbed-copy cluster the LSH pairs
    # connect collapses to one component labeled by its min vec_id.
    from smart_ocr_ray.ops.similarity import embedding_neardup_clusters

    comp = {r["vec_id"]: r["cluster_id"]
            for r in embedding_neardup_clusters(str(sf), threshold_e3=950).take_all()}
    assert comp  # the near-dup clusters produced components
    for vec_id, label in comp.items():
        assert label <= vec_id          # labels are component minima
        assert label in comp and comp[label] == label  # representative is its own label
        assert vec_id // 4 == label // 4  # members stay within their true cluster


def test_embedding_lsh_degenerate_corpus_linear(ray_session, tmp_path):
    """Hot-bucket guard (r2 VERDICT item 1): thousands of byte-identical
    embeddings land in the same bucket of every band; the shared
    representative-collapse guard must emit a linear star (n-1 pairs at
    e3=1000), never O(n^2) verify work."""
    import time

    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    from smart_ocr_ray.ops.similarity import embedding_neardup_lsh

    rng = np.random.default_rng(3)
    base = rng.standard_normal(64).astype(np.float32)
    base /= np.linalg.norm(base)
    n_dup = 2000
    vecs = [base] * n_dup
    ids = list(range(n_dup))
    for i in range(5):  # a few unrelated distinct vectors
        v = rng.standard_normal(64)
        vecs.append((v / np.linalg.norm(v)).astype(np.float32))
        ids.append(n_dup + i)

    sf = tmp_path / "degsf"; sf.mkdir()
    pq.write_table(
        pa.Table.from_pydict({
            "vec_id": pa.array(ids, pa.int64()),
            "embedding": pa.array([v.tolist() for v in vecs], pa.list_(pa.float32())),
        }),
        sf / "embeddings.parquet",
    )

    t0 = time.perf_counter()
    pairs = embedding_neardup_lsh(str(sf), threshold_e3=950).take_all()
    elapsed = time.perf_counter() - t0

    star = [p for p in pairs if p["left_id"] == 0 and p["cos_sim_e3"] == 1000]
    assert len(star) == n_dup - 1  # every duplicate pairs with rep 0 only
    assert sorted(p["right_id"] for p in star) == list(range(1, n_dup))
    # No quadratic blow-up: total pairs stay linear in the duplicates
    # (star + at most the distinct-vector cross pairs).
    assert len(pairs) < n_dup + 30
    assert elapsed < 60, f"degenerate corpus took {elapsed:.1f}s — guard not engaged?"


def test_embedding_lsh_zero_vectors_never_pair(ray_session, tmp_path):
    """Zero-norm embeddings (failed/null embeds are routinely
    zero-filled) have cosine 0 with everything — even byte-identical
    copies. A degenerate bucket of >HOT_BUCKET_LIMIT zero vectors must
    NOT be starred at e3=1000 by the hot-bucket guard (review finding
    r3): per-vec vhashes keep them un-collapsed and the exact verify
    rejects their pairs."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    from smart_ocr_ray.ops.similarity import embedding_neardup_lsh

    n_zero = 300
    vecs = [np.zeros(64, dtype=np.float32)] * n_zero
    rng = np.random.default_rng(11)
    v = rng.standard_normal(64)
    vecs.append((v / np.linalg.norm(v)).astype(np.float32))
    sf = tmp_path / "zsf"; sf.mkdir()
    pq.write_table(
        pa.Table.from_pydict({
            "vec_id": pa.array(range(len(vecs)), pa.int64()),
            "embedding": pa.array([x.tolist() for x in vecs], pa.list_(pa.float32())),
        }),
        sf / "embeddings.parquet",
    )
    pairs = embedding_neardup_lsh(str(sf), threshold_e3=450).take_all()
    assert pairs == []  # no spurious e3=1000 stars among zero vectors


def test_embedding_lsh_band_rows_are_compact(ray_session, tmp_path):
    """The band shuffle must not carry embedding floats (r2 VERDICT
    item 2): _HyperplaneStage emits only (vec_id, band_key, vhash)."""
    import numpy as np
    import pyarrow as pa

    from smart_ocr_ray.ops.similarity import _HyperplaneStage

    rng = np.random.default_rng(5)
    vecs = [rng.standard_normal(64).astype(np.float32) for _ in range(10)]
    batch = pa.Table.from_pydict({
        "vec_id": pa.array(range(10), pa.int64()),
        "embedding": pa.array([v.tolist() for v in vecs], pa.list_(pa.float32())),
    })
    out = _HyperplaneStage()(batch)
    assert out.column_names == ["vec_id", "band_key", "vhash"]
    assert out.num_rows == 10 * 4  # one row per (vec, band)
    # Byte-identical embeddings share a vhash; distinct ones don't.
    dup = pa.Table.from_pydict({
        "vec_id": pa.array([0, 1], pa.int64()),
        "embedding": pa.array([vecs[0].tolist(), vecs[0].tolist()], pa.list_(pa.float32())),
    })
    vh = _HyperplaneStage()(dup).column("vhash").to_pylist()
    assert vh[0] == vh[4]  # row 0 band 0 == row 1 band 0


def test_resize_media_geometry_and_payload(ray_session):
    """Resize stage: dims scale to fit max_dim preserving aspect; small
    media pass through untouched; payload size tracks the scaled area."""
    import pyarrow as pa
    import ray.data

    from smart_ocr_ray.ops.multimodal import resize_media

    rows = [
        {"url": "u1", "payload": b"x" * 10_000, "width": 2048, "height": 1024},
        {"url": "u2", "payload": b"y" * 1_000, "width": 100, "height": 50},
    ]
    out = {r["url"]: r for r in resize_media(
        ray.data.from_arrow(pa.Table.from_pylist(rows)), max_dim=512
    ).take_all()}
    big = out["u1"]
    assert (big["width"], big["height"]) == (512, 256)  # aspect preserved
    assert 0 < len(big["payload"]) < 10_000  # re-encode shrank bytes
    small = out["u2"]
    assert (small["width"], small["height"]) == (100, 50)
    assert small["payload"] == b"y" * 1_000  # identity resize = passthrough


def test_sample_frames_bounded_and_sliced(ray_session):
    """Frame sampler: every stride-th frame, hard cap, correct slices."""
    import pyarrow as pa
    import ray.data

    from smart_ocr_ray.ops.multimodal import FRAME_BYTES, sample_frames

    payload = bytes(range(256)) * 160  # 40960 bytes = 10 frames
    rows = [
        {"url": "v1", "payload": payload},
        {"url": "v2", "payload": b""},
        {"url": "v3", "payload": b"z" * (FRAME_BYTES * 100)},  # 100 frames
    ]
    frames = sample_frames(
        ray.data.from_arrow(pa.Table.from_pylist(rows)), stride=2, max_frames=8
    ).take_all()
    by_url = {}
    for f in frames:
        by_url.setdefault(f["url"], []).append(f)
    v1 = sorted(by_url["v1"], key=lambda f: f["frame_idx"])
    assert [f["frame_idx"] for f in v1] == [0, 2, 4, 6, 8]
    assert v1[1]["payload"] == payload[2 * FRAME_BYTES : 3 * FRAME_BYTES]
    assert v1[1]["ts_ms"] == 2000
    assert "v2" not in by_url  # empty payload emits no frames
    assert len(by_url["v3"]) == 8  # hard cap bounds the blowup


def test_doc_length_quantiles_known_distribution(ray_session, tmp_path):
    """Histogram quantiles on a known distribution: 100 docs of length
    1..100 tokens — the q-th percentile is exactly q tokens under the
    cum*100 >= q*n rule."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from smart_ocr_ray.ops.text_analysis import doc_length_quantiles

    sf = tmp_path / "qsf"; sf.mkdir()
    pq.write_table(
        pa.Table.from_pydict({
            "doc_id": pa.array(range(100), pa.int64()),
            "text": pa.array([" ".join(["w"] * (i + 1)) for i in range(100)]),
            "lang": pa.array(["en"] * 100),
            "source": pa.array(["s"] * 100),
            "n_chars": pa.array([0] * 100, pa.int64()),
        }),
        sf / "documents.parquet",
    )
    out = {r["quantile_pct"]: r["n_tokens"]
           for r in doc_length_quantiles(str(sf)).to_pylist()}
    assert out == {25: 25, 50: 50, 75: 75, 90: 90, 99: 99}


def test_events_topk_per_hour_ranks_and_ties(ray_session, tmp_path):
    """Grouped top-k: 3 best values per hour, ties broken by event_id
    ascending; hours with fewer than k events emit all of them."""
    import datetime as dt

    import pyarrow as pa
    import pyarrow.parquet as pq

    from smart_ocr_ray.ops.relational import events_topk_per_hour

    t0 = dt.datetime(2024, 1, 1)
    rows = [
        # hour 0: five events, top-3 by value = ids 13 (9.0), 11 (5.0),
        # 12 (5.0) — tie on 5.0 broken by id asc.
        (10, 0, 1.0), (11, 1, 5.0), (12, 2, 5.0), (13, 3, 9.0), (14, 4, 2.0),
        # hour 1: two events only.
        (20, 60, 4.0), (21, 61, 7.0),
    ]
    sf = tmp_path / "topksf"; sf.mkdir()
    pq.write_table(
        pa.Table.from_pydict({
            "event_id": pa.array([r[0] for r in rows], pa.int64()),
            "ts": pa.array([t0 + dt.timedelta(minutes=r[1]) for r in rows],
                           pa.timestamp("us")),
            "user_id": pa.array([r[0] % 5 for r in rows], pa.int64()),
            "event_type": pa.array(["click"] * len(rows), pa.string()),
            "value": pa.array([r[2] for r in rows], pa.float64()),
        }),
        sf / "events.parquet",
    )
    out = events_topk_per_hour(str(sf)).take_all()
    got = [(r["window_start"].hour, r["rnk"], r["event_id"]) for r in out]
    assert got == [(0, 1, 13), (0, 2, 11), (0, 3, 12), (1, 1, 21), (1, 2, 20)]


def test_events_topk_partial_combiner_is_lossless(ray_session, tmp_path):
    """The per-block partial top-k cannot drop a global winner: run the
    same input through 1 block and through many tiny blocks — identical
    output."""
    import datetime as dt

    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    from smart_ocr_ray.ops.relational import events_topk_per_hour

    rng = np.random.default_rng(3)
    n = 400
    t0 = dt.datetime(2024, 1, 1)
    table = pa.Table.from_pydict({
        "event_id": pa.array(range(n), pa.int64()),
        "ts": pa.array(
            [t0 + dt.timedelta(seconds=int(s)) for s in rng.integers(0, 4 * 3600, n)],
            pa.timestamp("us")),
        "user_id": pa.array((rng.integers(0, 9, n)).astype("int64")),
        "event_type": pa.array(["click"] * n, pa.string()),
        "value": pa.array(np.round(rng.uniform(0, 100, n), 2)),
    })
    one = tmp_path / "one"; one.mkdir()
    pq.write_table(table, one / "events.parquet")
    many = tmp_path / "many"; many.mkdir()
    # 40 row-groups → many input blocks → many partial combiners.
    pq.write_table(table, many / "events.parquet", row_group_size=10)

    a = events_topk_per_hour(str(one)).take_all()
    b = events_topk_per_hour(str(many)).take_all()
    assert a == b
    assert len(a) == 4 * 3  # 4 busy hours × k


def test_line_dedup_semantics(ray_session, tmp_path):
    """Boilerplate line removal: a line shared by >=2 docs is removed
    from ALL docs (every copy, incl. within-doc repeats); doc-local
    repeats alone are kept; fully-boilerplate docs clean to ''."""
    import hashlib

    import pyarrow as pa
    import pyarrow.parquet as pq

    from smart_ocr_ray.ops.dedup import line_dedup

    B = "b0 b1 b2 b3"              # boilerplate line (shared)
    U1, U2, U3 = "u1 x y z", "u2 x y z", "u3 x y z"
    texts = [
        f"{B} {U1}",               # doc 0: boilerplate + unique
        f"{B} {U2} {B}",           # doc 1: boilerplate twice
        f"{U3} {U3}",              # doc 2: SAME line twice, one doc only
        f"{B}",                    # doc 3: all boilerplate
        "",                        # doc 4: empty
    ]
    sf = tmp_path / "ldsf"; sf.mkdir()
    pq.write_table(
        pa.Table.from_pydict({
            "doc_id": pa.array(range(len(texts)), pa.int64()),
            "text": pa.array(texts),
            "lang": pa.array(["en"] * len(texts)),
            "source": pa.array(["s"] * len(texts)),
            "n_chars": pa.array([len(t) for t in texts], pa.int64()),
        }),
        sf / "documents.parquet",
    )
    md5 = lambda s: hashlib.md5(s.encode()).hexdigest()
    out = {r["doc_id"]: r for r in line_dedup(str(sf), line_tokens=4).take_all()}

    assert (out[0]["n_lines"], out[0]["n_removed"]) == (2, 1)
    assert out[0]["cleaned_md5"] == md5(U1)
    # Every copy of the hot line goes, including doc 1's second one.
    assert (out[1]["n_lines"], out[1]["n_removed"]) == (3, 2)
    assert out[1]["cleaned_md5"] == md5(U2)
    # Within-doc repeat in a single doc is NOT boilerplate.
    assert (out[2]["n_lines"], out[2]["n_removed"]) == (2, 0)
    assert out[2]["cleaned_md5"] == md5(f"{U3}\n{U3}")
    # Fully-boilerplate and empty docs both clean to ''.
    assert (out[3]["n_lines"], out[3]["n_removed"]) == (1, 1)
    assert out[3]["cleaned_md5"] == md5("")
    assert (out[4]["n_lines"], out[4]["n_removed"]) == (0, 0)
    assert out[4]["cleaned_md5"] == md5("")


def test_tfidf_top_terms_ranking(ray_session, tmp_path):
    """Integer-grid tf-idf: rare terms outrank common ones; tf scales
    the score; ties break by term asc; empty docs emit nothing."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from smart_ocr_ray.ops.text_analysis import tfidf_top_terms

    texts = [
        "apple apple rare common",   # doc 0: tf(apple)=2, rare df=1
        "banana common",             # doc 1
        "cherry common",             # doc 2
        "",                          # doc 3: empty
    ]
    sf = tmp_path / "tfsf"; sf.mkdir()
    pq.write_table(
        pa.Table.from_pydict({
            "doc_id": pa.array(range(len(texts)), pa.int64()),
            "text": pa.array(texts),
            "lang": pa.array(["en"] * len(texts)),
            "source": pa.array(["s"] * len(texts)),
            "n_chars": pa.array([len(t) for t in texts], pa.int64()),
        }),
        sf / "documents.parquet",
    )
    rows = tfidf_top_terms(str(sf)).take_all()
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r["doc_id"], []).append(r)
    for v in by_doc.values():
        v.sort(key=lambda r: r["rnk"])

    n = 4  # idf_e6(df) = (1e6 * 4) // df
    # doc 0: apple tf=2 df=1 -> 8e6; rare tf=1 df=1 -> 4e6; common df=3 -> 1333333
    d0 = [(r["term"], r["score"]) for r in by_doc[0]]
    assert d0 == [("apple", 2 * 4_000_000), ("rare", 4_000_000),
                  ("common", (1_000_000 * n) // 3)]
    # doc 1: banana (df=1) beats common.
    assert [r["term"] for r in by_doc[1]] == ["banana", "common"]
    assert 3 not in by_doc  # empty doc emits no rows
    # ranks are 1-based and consecutive
    assert [r["rnk"] for r in by_doc[0]] == [1, 2, 3]


def test_dedup_survivors_reasons(ray_session, tmp_path):
    """Keep/drop verdicts: exact-dup losers flagged exact_dup (wins over
    near_dup), near-dup cluster non-representatives flagged near_dup,
    everything else kept."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from smart_ocr_ray.ops.dedup import dedup_survivors

    # docs 0/1: byte-identical (exact pair, also trivially near-dup) —
    # 0 survives both. docs 2/3: near-identical long texts (one token
    # differs) -> near-dup pair, 2 survives. doc 4: unique.
    base = " ".join(f"tok{i}" for i in range(60))
    texts = [
        "dup dup dup common words here",
        "dup dup dup common words here",
        base + " ending-one",
        base + " ending-two",
        "completely different text with its own words",
    ]
    sf = tmp_path / "survsf"; sf.mkdir()
    pq.write_table(
        pa.Table.from_pydict({
            "doc_id": pa.array(range(len(texts)), pa.int64()),
            "text": pa.array(texts),
            "lang": pa.array(["en"] * len(texts)),
            "source": pa.array(["s"] * len(texts)),
            "n_chars": pa.array([len(t) for t in texts], pa.int64()),
        }),
        sf / "documents.parquet",
    )
    out = {r["doc_id"]: r for r in dedup_survivors(str(sf)).take_all()}
    assert len(out) == 5
    assert out[0]["keep"] and out[0]["reason"] == ""
    assert not out[1]["keep"] and out[1]["reason"] == "exact_dup"
    assert out[2]["keep"] and out[2]["reason"] == ""
    assert not out[3]["keep"] and out[3]["reason"] == "near_dup"
    assert out[4]["keep"] and out[4]["reason"] == ""


def test_dedup_survivors_no_duplicates_all_keep(ray_session, tmp_path):
    """A corpus with no duplicates (empty loser tables — the schema-less
    empty-join hazard) keeps every doc."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from smart_ocr_ray.ops.dedup import dedup_survivors

    texts = [f"unique document number {i} with distinct content {i*7}" for i in range(6)]
    sf = tmp_path / "survsf2"; sf.mkdir()
    pq.write_table(
        pa.Table.from_pydict({
            "doc_id": pa.array(range(len(texts)), pa.int64()),
            "text": pa.array(texts),
            "lang": pa.array(["en"] * len(texts)),
            "source": pa.array(["s"] * len(texts)),
            "n_chars": pa.array([len(t) for t in texts], pa.int64()),
        }),
        sf / "documents.parquet",
    )
    out = dedup_survivors(str(sf)).take_all()
    assert len(out) == 6 and all(r["keep"] and r["reason"] == "" for r in out)


def test_doc_repetition_signals(ray_session, tmp_path):
    """Gopher repetition signals: known-answer docs for ttr, duplicate
    windows, and top-bigram coverage."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from smart_ocr_ray.ops.dedup import read_documents  # noqa: F401
    from smart_ocr_ray.ops.text_analysis import doc_repetition

    W = " ".join(["w"] * 8)                      # one 8-token window
    texts = [
        "a b c d",                               # all distinct: ttr 1e6
        "a a a a",                               # ttr 250000; bigram (a,a)x3 -> 1500000//... (1e6*3*2)//4
        f"{W} {W}",                              # two identical windows -> dup 500000
        "",                                      # empty: all zeros
        "solo",                                  # n=1: no bigram
    ]
    sf = tmp_path / "repsf"; sf.mkdir()
    pq.write_table(
        pa.Table.from_pydict({
            "doc_id": pa.array(range(len(texts)), pa.int64()),
            "text": pa.array(texts),
            "lang": pa.array(["en"] * len(texts)),
            "source": pa.array(["s"] * len(texts)),
            "n_chars": pa.array([len(t) for t in texts], pa.int64()),
        }),
        sf / "documents.parquet",
    )
    out = {r["doc_id"]: r for r in doc_repetition(str(sf)).take_all()}
    assert out[0]["ttr_e6"] == 1_000_000
    assert out[0]["dup_line_frac_e6"] == 0
    # "a b c d": top bigram count 1, coverage (1e6*1*2)//4 = 500000
    assert out[0]["top_bigram_frac_e6"] == 500_000
    assert out[1]["ttr_e6"] == 250_000
    assert out[1]["top_bigram_frac_e6"] == (1_000_000 * 3 * 2) // 4
    assert out[2]["dup_line_frac_e6"] == 500_000
    assert out[3] == {"doc_id": 3, "ttr_e6": 0, "dup_line_frac_e6": 0,
                      "top_bigram_frac_e6": 0}
    assert out[4]["ttr_e6"] == 1_000_000 and out[4]["top_bigram_frac_e6"] == 0


def test_embedding_knn_graph_contract(ray_session):
    """k-NN graph: per-vector ranks are 1..k, ordered by similarity
    desc with neighbor-id tie-break; every edge's reverse candidate
    exists (the symmetrized pair list); self-edges never appear."""
    from smart_ocr_ray.ops.similarity import embedding_knn_graph

    rows = embedding_knn_graph("/root/testdata/sf0.001", k=5).take_all()
    by_vec = {}
    for r in rows:
        assert r["nbr"] != r["vec_id"]
        by_vec.setdefault(r["vec_id"], []).append(r)
    assert len(by_vec) > 0
    for vec, rs in by_vec.items():
        rs.sort(key=lambda r: r["rnk"])
        assert [r["rnk"] for r in rs] == list(range(1, len(rs) + 1))
        # Total order: similarity desc, neighbor id asc on ties.
        pairs = [(-r["cos_sim_e3"], r["nbr"]) for r in rs]
        assert pairs == sorted(pairs)
        assert len(rs) <= 5


def test_embedding_kmeans_separated_groups(ray_session, tmp_path):
    """Spherical k-means over two well-separated direction groups
    (k=3, seeds: one per group + one exact duplicate of seed 0):
    every vector lands with its group after 2 Lloyd iterations, the
    duplicated seed's cluster drains empty (keep-previous-centroid +
    min-ci tie-break ⇒ no vector labeled with it), a zero vector gets
    the −2 sentinel similarity, and the labels match an exact numpy
    mirror of the integer-grid iteration."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    from smart_ocr_ray.ops.similarity import embedding_kmeans

    rng = np.random.default_rng(11)
    dim = 16
    a_axis = np.zeros(dim); a_axis[0] = 1.0
    b_axis = np.zeros(dim); b_axis[1] = 1.0
    vecs = [a_axis, b_axis, a_axis.copy()]  # seeds 0,1 + duplicate of 0
    for axis in (a_axis, b_axis):
        for _ in range(20):
            v = axis + 0.05 * rng.standard_normal(dim)
            vecs.append(v / np.linalg.norm(v))
    vecs.append(np.zeros(dim))  # degenerate zero vector
    ids = list(range(len(vecs)))

    sf = tmp_path / "kmsf"; sf.mkdir()
    pq.write_table(
        pa.Table.from_pydict({
            "vec_id": pa.array(ids, pa.int64()),
            "embedding": pa.array(
                [np.asarray(v, dtype=np.float32).tolist() for v in vecs],
                pa.list_(pa.float32()),
            ),
        }),
        sf / "embeddings.parquet",
    )

    rows = embedding_kmeans(str(sf), k=3, n_iter=2).take_all()
    got = {r["vec_id"]: (r["cluster"], r["cos_sim_e6"]) for r in rows}
    assert len(got) == len(ids)

    # Exact numpy mirror of the integer-grid Lloyd iteration.
    q = np.round(
        np.asarray([np.asarray(v, dtype=np.float32) for v in vecs], dtype=np.float64)
        * 1_000_000
    ).astype(np.int64)

    def sims(mat, cents):
        dot = (mat @ cents.T).astype(np.float64)
        qn = (mat * mat).sum(axis=1).astype(np.float64)
        cn = (cents * cents).sum(axis=1).astype(np.float64)
        d2 = qn[:, None] * cn[None, :]
        with np.errstate(divide="ignore", invalid="ignore"):
            s = dot / np.sqrt(d2)
        s[d2 == 0] = -2.0
        return s

    cents = q[:3].copy()
    for _ in range(2):
        a = np.argmax(sims(q, cents), axis=1)
        new = cents.copy()
        for ci in range(3):
            members = q[a == ci]
            if len(members):
                new[ci] = np.floor_divide(members.sum(axis=0), len(members))
        cents = new
    final = sims(q, cents)
    a = np.argmax(final, axis=1)
    e6 = np.floor(final[np.arange(len(a)), a] * 1_000_000).astype(np.int64)
    for i in ids:
        assert got[i] == (a[i], e6[i]), f"vec {i}: {got[i]} != {(a[i], e6[i])}"

    # Semantic checks on top of the mirror: the two direction groups
    # never mix. Cluster 2 (the duplicated seed) drains empty during
    # iterations — ties go to min ci — so its centroid stays the
    # PRISTINE a-axis; at labeling it wins back the on-axis vectors
    # (and any noise member closer to the axis than to cluster 0's
    # noise-shifted mean), so a-side labels span {0, 2} while b-side
    # stays pure {1}.
    a_side = {got[i][0] for i in (0, 2, *range(3, 23))}
    assert a_side <= {0, 2} and 0 in a_side and 2 in a_side
    assert {got[i][0] for i in (1, *range(23, 43))} == {1}
    assert all(got[i][1] >= 950_000 for i in range(43))
    # Exact-axis vector: cluster 2's iter-2 centroid is the mean of the
    # on-axis vectors plus its few recaptured near-axis members, so the
    # similarity is near-1 but no longer exactly 1.
    assert got[0][0] == 2 and got[0][1] >= 999_000
    # Zero vector: sentinel similarity, tie-broken to cluster 0.
    zero_id = len(ids) - 1
    assert got[zero_id] == (0, -2_000_000)


def test_bm25_topk_exact_integer_scores(ray_session, tmp_path):
    """BM25 on the frozen integer grid: scores match the rational
    formula exactly; docs without query terms (or empty) are excluded;
    short docs get the length-normalization boost; ranking is score
    desc, doc_id asc."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from smart_ocr_ray.ops.text_analysis import bm25_topk

    texts = [
        "join join scan filler",            # doc 0: dl=4, join×2, scan×1
        "window other other other other other",  # doc 1: dl=6, window×1
        "nothing here at all",              # doc 2: dl=4, no query terms
        "",                                 # doc 3: empty — not in N or A
        "join",                             # doc 4: dl=1, join×1
    ]
    sf = tmp_path / "bmsf"; sf.mkdir()
    pq.write_table(
        pa.Table.from_pydict({
            "doc_id": pa.array(range(len(texts)), pa.int64()),
            "text": pa.array(texts),
            "lang": pa.array(["en"] * len(texts)),
            "source": pa.array(["s"] * len(texts)),
            "n_chars": pa.array([len(t) for t in texts], pa.int64()),
        }),
        sf / "documents.parquet",
    )

    n, a = 4, 15  # docs 0,1,2,4 have tokens; 4+6+4+1 tokens total
    df = {"join": 2, "window": 1, "scan": 1}

    def expected(tf_map, dl):
        s = 0
        for term, tf in tf_map.items():
            idf_e6 = (1_000_000 * (n - df[term] + 1)) // (df[term] + 1)
            sat_e6 = (1_000_000 * 44 * a * tf) // (
                20 * a * tf + 6 * a + 18 * dl * n
            )
            s += idf_e6 * sat_e6 // 1_000_000
        return s

    want = {
        0: expected({"join": 2, "scan": 1}, 4),
        1: expected({"window": 1}, 6),
        4: expected({"join": 1}, 1),
    }

    rows = bm25_topk(str(sf)).take_all()
    got = {r["doc_id"]: (r["dl"], r["score_e6"]) for r in rows}
    assert set(got) == {0, 1, 4}  # docs 2 (no hits) and 3 (empty) absent
    assert got[0] == (4, want[0])
    assert got[1] == (6, want[1])
    assert got[4] == (1, want[4])
    # Result arrives ranked: score desc, doc_id asc.
    ranked = [r["doc_id"] for r in rows]
    assert ranked == sorted(want, key=lambda d: (-want[d], d))
    # Length normalization: a 1-token doc's single 'join' saturation
    # exceeds doc 0's (same idf, smaller dl ⇒ bigger sat).
    sat_d4 = (1_000_000 * 44 * a) // (20 * a + 6 * a + 18 * 1 * n)
    sat_d0_tf1 = (1_000_000 * 44 * a) // (20 * a + 6 * a + 18 * 4 * n)
    assert sat_d4 > sat_d0_tf1


def test_graph_pagerank_hand_built_graph(ray_session):
    """Integer-grid PageRank on an explicit graph: hub concentrates
    rank, isolated node stays at the base term, values match an
    independent driver-side recurrence exactly."""
    import ray.data

    from smart_ocr_ray.ops.graph import PR_SCALE, graph_pagerank

    # 0→1, 1→2, 2→0 (cycle); 0→3, 1→3, 2→3 (hub 3); 4 isolated.
    srcs = [0, 1, 2, 0, 1, 2]
    dsts = [1, 2, 0, 3, 3, 3]
    nodes = ray.data.from_items([{"vec_id": i} for i in range(5)])
    edges = ray.data.from_items(
        [{"src": s, "dst": d} for s, d in zip(srcs, dsts)]
    )

    n_iter, n = 3, 5
    got = {
        r["vec_id"]: r["pr_e12"]
        for r in graph_pagerank("", n_iter=n_iter, edges=edges, nodes=nodes).take_all()
    }
    # Force the distributed join loop (local_max_edges=0): bit-identical.
    got_dist = {
        r["vec_id"]: r["pr_e12"]
        for r in graph_pagerank(
            "", n_iter=n_iter, edges=edges, nodes=nodes, local_max_edges=0
        ).take_all()
    }
    assert got == got_dist

    # Independent reference: plain dict/loop recurrence, same grid.
    outdeg = {0: 2, 1: 2, 2: 2}
    pr = {v: PR_SCALE // n for v in range(5)}
    base = (15 * PR_SCALE) // (100 * n)
    for _ in range(n_iter):
        contrib = {v: 0 for v in range(5)}
        for s, d in zip(srcs, dsts):
            contrib[d] += pr[s] // outdeg[s]
        pr = {v: base + (85 * contrib[v]) // 100 for v in range(5)}

    assert got == pr
    # Hub 3 outranks cycle members; isolated node 4 sits at the base.
    assert got[3] > got[0] == got[1] == got[2] > got[4] == base


def test_unigram_surprisal_known_counts(ray_session, tmp_path):
    """bits(t) = bit_length(A // cf): rare tokens carry more bits than
    common ones; per-doc sums and the e3 mean match hand-computed
    values; empty docs emit nothing."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from smart_ocr_ray.ops.text_analysis import unigram_surprisal

    texts = ["a a b", "a c", ""]
    sf = tmp_path / "ussf"; sf.mkdir()
    pq.write_table(
        pa.Table.from_pydict({
            "doc_id": pa.array(range(len(texts)), pa.int64()),
            "text": pa.array(texts),
            "lang": pa.array(["en"] * len(texts)),
            "source": pa.array(["s"] * len(texts)),
            "n_chars": pa.array([len(t) for t in texts], pa.int64()),
        }),
        sf / "documents.parquet",
    )
    # A = 5; cf(a)=3, cf(b)=cf(c)=1.
    # bits(a) = bitlen(5//3=1) = 1; bits(b) = bits(c) = bitlen(5) = 3.
    got = {
        r["doc_id"]: (r["n_tokens"], r["surprisal_bits"], r["mean_bits_e3"])
        for r in unigram_surprisal(str(sf)).take_all()
    }
    assert got == {
        0: (3, 2 * 1 + 3, (1000 * 5) // 3),   # "a a b"
        1: (2, 1 + 3, (1000 * 4) // 2),        # "a c"
    }


def test_substring_dedup_sliding_coverage(ray_session, tmp_path):
    """Sliding-window repeated-substring detection: cross-doc spans are
    hot, overlapping hot windows union into one covered interval, docs
    without repeats are absent."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from smart_ocr_ray.ops.dedup import substring_dedup

    texts = [
        "x y z k1 k2 k3 k4",        # doc 0: shares "x y z" with doc 1
        "q r x y z s t",            # doc 1
        "unique tokens only here",  # doc 2: no repeats -> absent
        "a b c d e f",              # docs 3/4 share 3 overlapping windows
        "a b c d e zz",
        "too short",                # doc 5: fewer tokens than the window
    ]
    sf = tmp_path / "sssf"; sf.mkdir()
    pq.write_table(
        pa.Table.from_pydict({
            "doc_id": pa.array(range(len(texts)), pa.int64()),
            "text": pa.array(texts),
            "lang": pa.array(["en"] * len(texts)),
            "source": pa.array(["s"] * len(texts)),
            "n_chars": pa.array([len(t) for t in texts], pa.int64()),
        }),
        sf / "documents.parquet",
    )
    got = {
        r["doc_id"]: (
            r["n_tokens"], r["n_windows"], r["n_hot_windows"],
            r["covered_tokens"], r["coverage_e6"],
        )
        for r in substring_dedup(str(sf), window_tokens=3).take_all()
    }
    assert got == {
        0: (7, 5, 1, 3, 3_000_000 // 7),
        1: (7, 5, 1, 3, 3_000_000 // 7),
        # Overlapping hot windows at pos 0,1,2 union to [0,5): 5 tokens.
        3: (6, 4, 3, 5, 5_000_000 // 6),
        4: (6, 4, 3, 5, 5_000_000 // 6),
    }


def test_semdedup_sample_contract(ray_session):
    """Per-cluster top-m centrality sample: consistent with the kmeans
    labeling, ranks 1..n_m consecutive per cluster, ordered by
    cos_sim_e6 desc with vec_id tie-break, never more than m rows."""
    from smart_ocr_ray.ops.similarity import embedding_kmeans, semdedup_sample

    sf = "/root/testdata/sf0.001"
    labels = {
        r["vec_id"]: (r["cluster"], r["cos_sim_e6"])
        for r in embedding_kmeans(sf).take_all()
    }
    by_cluster = {}
    for r in semdedup_sample(sf, m=10).take_all():
        by_cluster.setdefault(r["cluster"], []).append(r)

    for cl, rows in by_cluster.items():
        rows.sort(key=lambda r: r["rnk"])
        assert len(rows) <= 10
        assert [r["rnk"] for r in rows] == list(range(1, len(rows) + 1))
        # Members carry the kmeans labeling verbatim.
        for r in rows:
            assert labels[r["vec_id"]] == (cl, r["cos_sim_e6"])
        # Ordered by centrality desc, vec_id asc.
        keys = [(-r["cos_sim_e6"], r["vec_id"]) for r in rows]
        assert keys == sorted(keys)
        # The rank-1 row is the true argmax of the full cluster.
        best = min(
            (v for v in labels.items() if v[1][0] == cl),
            key=lambda v: (-v[1][1], v[0]),
        )
        assert rows[0]["vec_id"] == best[0]


def test_embedding_outliers_manual_rule_identity(ray_session):
    """Outlier flags over the real sf0.001 corpus equal the percentile
    rule computed by hand from the kmeans labeling: per cluster,
    cutoff = smallest cos_sim_e6 with cum*100 >= q*n, outlier iff
    strictly below — so boundary ties are kept and strictly less than
    q% of any cluster is flagged."""
    from smart_ocr_ray.ops.similarity import embedding_kmeans, embedding_outliers

    sf = "/root/testdata/sf0.001"
    labels = {
        r["vec_id"]: (r["cluster"], r["cos_sim_e6"])
        for r in embedding_kmeans(sf).take_all()
    }
    q = 10
    by_cluster: dict[int, list[int]] = {}
    for cl, sim in labels.values():
        by_cluster.setdefault(cl, []).append(sim)
    cuts = {}
    for cl, sims in by_cluster.items():
        sims.sort()
        n = len(sims)
        cum = 0
        seen = 0
        for v in sims:
            seen += 1
            if seen * 100 >= q * n:
                cuts[cl] = v
                break

    rows = embedding_outliers(sf, q=q).take_all()
    assert len(rows) == len(labels)
    flagged = {cl: 0 for cl in by_cluster}
    for r in rows:
        cl, sim = labels[r["vec_id"]]
        assert (r["cluster"], r["cos_sim_e6"]) == (cl, sim)
        assert r["outlier"] == (sim < cuts[cl])
        flagged[cl] += bool(r["outlier"])
    # Strictly-below rule: always under q% per cluster; and the corpus
    # must exercise BOTH branches somewhere.
    for cl, n_flag in flagged.items():
        assert n_flag * 100 < q * len(by_cluster[cl])
    assert any(flagged.values())
    assert any(n_flag < len(by_cluster[cl]) for cl, n_flag in flagged.items())


def test_embedding_outliers_engineered_tail(ray_session, tmp_path):
    """A tight direction group plus three deliberately off-axis vectors
    (same cluster, much lower centroid similarity): with q sized to the
    tail the off-axis vectors are exactly the flagged set; q=100 flags
    nothing anywhere (cutoff = max value, nothing strictly below it is
    past the boundary-tie rule only when all sims equal — here the tail
    IS below, so q=100's cutoff is the max sim and the tail stays
    flagged; the no-flag invariant instead holds for a cluster whose
    sims are all identical)."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    from smart_ocr_ray.ops.similarity import embedding_outliers

    rng = np.random.default_rng(7)
    dim = 8
    a = np.zeros(dim); a[0] = 1.0
    b = np.zeros(dim); b[1] = 1.0
    vecs = [a, b]  # seeds for k=2
    for _ in range(28):
        v = a + 0.02 * rng.standard_normal(dim)
        vecs.append(v / np.linalg.norm(v))
    # Three off-axis members: closer to a than b, but far off the mean.
    off = []
    for i in range(3):
        v = a + 0.9 * b + 0.01 * i * np.ones(dim)
        off.append(len(vecs))
        vecs.append(v / np.linalg.norm(v))
    # An exact-duplicate pile on b: all sims in that cluster identical.
    for _ in range(10):
        vecs.append(b.copy())

    sf = tmp_path / "outsf"; sf.mkdir()
    pq.write_table(
        pa.Table.from_pydict({
            "vec_id": pa.array(range(len(vecs)), pa.int64()),
            "embedding": pa.array(
                [np.asarray(v, dtype=np.float32).tolist() for v in vecs],
                pa.list_(pa.float32()),
            ),
        }),
        sf / "embeddings.parquet",
    )

    rows = embedding_outliers(str(sf), q=12, k=2).take_all()

    by_id = {r["vec_id"]: r for r in rows}
    a_cluster = by_id[0]["cluster"]
    # The off-axis trio shares cluster a and is exactly the flagged set
    # there (3 of 32 a-side members ⇒ 9.4% < q=12% ≤ next value's cum).
    a_members = [r for r in rows if r["cluster"] == a_cluster]
    flagged = sorted(r["vec_id"] for r in a_members if r["outlier"])
    assert flagged == sorted(off)
    # The identical-duplicate cluster can never flag anything: the
    # cutoff is the shared value and nothing is strictly below it.
    b_members = [r for r in rows if r["cluster"] != a_cluster]
    assert b_members and not any(r["outlier"] for r in b_members)


def test_token_packing_distributed_prefix_sum(ray_session, tmp_path):
    """Concat-and-chunk packing: global prefix sums are exact across
    bucket boundaries (bucket=3 forces multi-bucket offsets), empty
    docs vanish without consuming positions, window spans follow
    floor arithmetic."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from smart_ocr_ray.ops.text_analysis import token_packing

    # token counts per doc: 3, 4, 0 (empty), 7, 2, 6, 1
    texts = [
        "a b c", "d e f g", "", "h i j k l m n", "o p", "q r s t u v", "w",
    ]
    sf = tmp_path / "tpsf"; sf.mkdir()
    pq.write_table(
        pa.Table.from_pydict({
            "doc_id": pa.array(range(len(texts)), pa.int64()),
            "text": pa.array(texts),
            "lang": pa.array(["en"] * len(texts)),
            "source": pa.array(["s"] * len(texts)),
            "n_chars": pa.array([len(t) for t in texts], pa.int64()),
        }),
        sf / "documents.parquet",
    )
    budget = 5
    got = {
        r["doc_id"]: (
            r["n_tokens"], r["start_tok"], r["first_window"], r["last_window"]
        )
        for r in token_packing(str(sf), budget=budget, bucket=3).take_all()
    }
    # Reference: sequential scan over non-empty docs in doc_id order.
    want, cum = {}, 0
    for d, t in enumerate(texts):
        n = len(t.split())
        if not n:
            continue
        want[d] = (n, cum, cum // budget, (cum + n - 1) // budget)
        cum += n
    assert got == want
    assert 2 not in got  # the empty doc holds no window position
    # Doc 3 (7 tokens starting at 7) spans windows 1..2.
    assert got[3] == (7, 7, 1, 2)


def test_mixture_weights_uniform_target(ray_session, tmp_path):
    """Uniform-over-sources reweighting: weight_e6 = (1e6*total) //
    (n_sources*n_docs); scarce sources up-sample (>1e6), dominant ones
    down-sample (<1e6), exact integers."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from smart_ocr_ray.ops.text_analysis import mixture_weights

    sources = ["big"] * 6 + ["mid"] * 3 + ["rare"]
    sf = tmp_path / "mwsf"; sf.mkdir()
    pq.write_table(
        pa.Table.from_pydict({
            "doc_id": pa.array(range(len(sources)), pa.int64()),
            "text": pa.array(["tok"] * len(sources)),
            "lang": pa.array(["en"] * len(sources)),
            "source": pa.array(sources),
            "n_chars": pa.array([3] * len(sources), pa.int64()),
        }),
        sf / "documents.parquet",
    )
    got = {
        r["source"]: (r["n_docs"], r["weight_e6"])
        for r in mixture_weights(str(sf)).take_all()
    }
    # total=10, n_sources=3 → weight = 1e7 // (3*n)
    assert got == {
        "big": (6, 10_000_000 // 18),
        "mid": (3, 10_000_000 // 9),
        "rare": (1, 10_000_000 // 3),
    }
    assert got["big"][1] < 1_000_000 < got["rare"][1]


def test_bm25_topk_no_hits_empty(ray_session, tmp_path):
    """A corpus containing none of the query terms returns no rows
    (df=0 terms contribute nothing rather than dividing by zero)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from smart_ocr_ray.ops.text_analysis import bm25_topk

    sf = tmp_path / "bmnone"; sf.mkdir()
    pq.write_table(
        pa.Table.from_pydict({
            "doc_id": pa.array([0, 1], pa.int64()),
            "text": pa.array(["alpha beta", "gamma delta"]),
            "lang": pa.array(["en", "en"]),
            "source": pa.array(["s", "s"]),
            "n_chars": pa.array([10, 11], pa.int64()),
        }),
        sf / "documents.parquet",
    )
    assert bm25_topk(str(sf)).take_all() == []


def test_winnow_pairs_shared_passage_and_stop_guard(ray_session, tmp_path):
    """The winnowing guarantee: a shared verbatim passage of length >=
    k + window - 1 (23 chars) produces shared fingerprints, so the
    sharing pair is reported; unrelated docs are not. Stop-fingerprint
    guard: fingerprints in more than max_fp_docs docs never pair."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from smart_ocr_ray.ops.dedup import winnow_pairs

    passage = "the quick brown fox jumps over the lazy dog again"
    texts = [
        f"intro words here {passage} closing remarks",
        f"totally different opening {passage} and another tail",
        "nothing in common with the others at all whatsoever",
    ]
    sf = tmp_path / "wpsf"; sf.mkdir()
    pq.write_table(
        pa.Table.from_pydict({
            "doc_id": pa.array(range(len(texts)), pa.int64()),
            "text": pa.array(texts),
            "lang": pa.array(["en"] * len(texts)),
            "source": pa.array(["s"] * len(texts)),
            "n_chars": pa.array([len(t) for t in texts], pa.int64()),
        }),
        sf / "documents.parquet",
    )
    rows = winnow_pairs(str(sf), min_shared=1).take_all()
    got = {(r["left_id"], r["right_id"]): r["n_shared"] for r in rows}
    assert (0, 1) in got and got[(0, 1)] >= 1
    assert all(k == (0, 1) for k in got)  # doc 2 pairs with nobody

    # Stop guard: identical text in EVERY doc -> each fp's df (3)
    # exceeds max_fp_docs=2, so no pairs survive.
    sf2 = tmp_path / "wpsf2"; sf2.mkdir()
    pq.write_table(
        pa.Table.from_pydict({
            "doc_id": pa.array([0, 1, 2], pa.int64()),
            "text": pa.array([passage] * 3),
            "lang": pa.array(["en"] * 3),
            "source": pa.array(["s"] * 3),
            "n_chars": pa.array([len(passage)] * 3, pa.int64()),
        }),
        sf2 / "documents.parquet",
    )
    assert winnow_pairs(str(sf2), min_shared=1, max_fp_docs=2).take_all() == []


def test_hll_registers_exact_and_dup_insensitive(ray_session, tmp_path):
    """Registers match an independent bit-ops reference, and
    duplicating documents changes nothing (max is dup-insensitive) —
    the property that makes the sketch shuffle-free at scale."""
    import hashlib

    import pyarrow as pa
    import pyarrow.parquet as pq

    from smart_ocr_ray.ops.text_analysis import hll_registers

    def write(sf, texts):
        sf.mkdir()
        pq.write_table(
            pa.Table.from_pydict({
                "doc_id": pa.array(range(len(texts)), pa.int64()),
                "text": pa.array(texts),
                "lang": pa.array(["en"] * len(texts)),
                "source": pa.array(["s"] * len(texts)),
                "n_chars": pa.array([len(t) for t in texts], pa.int64()),
            }),
            sf / "documents.parquet",
        )

    texts = [f"document number {i} payload" for i in range(40)]
    write(tmp_path / "h1", texts)
    write(tmp_path / "h2", texts * 3)  # every doc duplicated 3x

    def reference(ts):
        regs = {}
        for t in ts:
            h = int.from_bytes(hashlib.md5(t.encode()).digest()[8:16], "little")
            idx, v = h & 0xFF, h >> 8
            rank = 57 - v.bit_length() if v else 57
            regs[idx] = max(regs.get(idx, 0), rank)
        return regs

    got1 = {
        r["register"]: r["max_rank"]
        for r in hll_registers(str(tmp_path / "h1")).take_all()
    }
    got2 = {
        r["register"]: r["max_rank"]
        for r in hll_registers(str(tmp_path / "h2")).take_all()
    }
    assert got1 == reference(texts)
    assert got2 == got1  # duplicates are invisible to the sketch
    assert all(1 <= v <= 57 for v in got1.values())


def test_token_packing_sparse_doc_ids(ray_session, tmp_path):
    """Sparse doc_ids spanning empty buckets: the bucket-offset lookup
    must hit each doc's own bucket exactly (searchsorted over only the
    NON-EMPTY bucket keys)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from smart_ocr_ray.ops.text_analysis import token_packing

    ids = [0, 5000, 9000]           # buckets 0, 1, 2 with bucket=4096
    texts = ["a b c", "d e", "f g h i"]
    sf = tmp_path / "tpsparse"; sf.mkdir()
    pq.write_table(
        pa.Table.from_pydict({
            "doc_id": pa.array(ids, pa.int64()),
            "text": pa.array(texts),
            "lang": pa.array(["en"] * 3),
            "source": pa.array(["s"] * 3),
            "n_chars": pa.array([len(t) for t in texts], pa.int64()),
        }),
        sf / "documents.parquet",
    )
    got = {
        r["doc_id"]: (r["start_tok"], r["first_window"], r["last_window"])
        for r in token_packing(str(sf), budget=4).take_all()
    }
    # Global concat order: 3 + 2 + 4 tokens.
    assert got == {
        0: (0, 0, 0),        # tokens 0-2 -> window 0
        5000: (3, 0, 1),     # tokens 3-4 -> windows 0..1
        9000: (5, 1, 2),     # tokens 5-8 -> windows 1..2
    }


def test_winnow_clusters_transitive_chain(ray_session, tmp_path):
    """A—B share passage X, B—C share passage Y, A—C share nothing:
    connected components still collapse all three into one cluster
    labeled by the min doc_id."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from smart_ocr_ray.ops.dedup import winnow_clusters

    px = "alpha beta gamma delta epsilon zeta eta theta"
    py_ = "one two three four five six seven eight nine"
    texts = [
        f"doc a starts {px} ends",
        f"doc b holds {px} and also {py_} inside",
        f"doc c carries {py_} only",
        "the unrelated fourth document stands alone here",
    ]
    sf = tmp_path / "wcsf"; sf.mkdir()
    pq.write_table(
        pa.Table.from_pydict({
            "doc_id": pa.array(range(len(texts)), pa.int64()),
            "text": pa.array(texts),
            "lang": pa.array(["en"] * len(texts)),
            "source": pa.array(["s"] * len(texts)),
            "n_chars": pa.array([len(t) for t in texts], pa.int64()),
        }),
        sf / "documents.parquet",
    )
    got = {
        r["doc_id"]: r["cluster_id"]
        for r in winnow_clusters(str(sf), min_shared=1).take_all()
    }
    assert got == {0: 0, 1: 0, 2: 0}  # one component, min-id label; doc 3 absent


def test_cluster_quality_cross_modal_join(ray_session):
    """The embedding-cluster × document-text join: per-cluster doc
    counts sum to the embedded-corpus size, token totals match the
    kmeans labeling joined to per-doc token counts independently."""
    from smart_ocr_ray.functions.textstats import token_count
    from smart_ocr_ray.ops.similarity import cluster_quality, embedding_kmeans

    import pyarrow.parquet as pq

    sf = "/root/testdata/sf0.001"
    labels = {r["vec_id"]: r["cluster"] for r in embedding_kmeans(sf).take_all()}
    docs = pq.read_table(f"{sf}/documents.parquet", columns=["doc_id", "text"])
    ntok = {
        d: token_count(t or "")
        for d, t in zip(docs.column("doc_id").to_pylist(), docs.column("text").to_pylist())
    }
    want = {}
    for vid, cl in labels.items():
        n, tot = want.get(cl, (0, 0))
        want[cl] = (n + 1, tot + ntok[vid])

    got = {
        r["cluster"]: (r["n_docs"], r["total_tokens"], r["mean_tokens_e2"])
        for r in cluster_quality(sf).take_all()
    }
    assert {c: (n, t) for c, (n, t, _) in got.items()} == want
    assert sum(n for n, _, _ in got.values()) == len(labels)
    for c, (n, t, m) in got.items():
        assert m == (100 * t) // n


def test_source_caps_keeps_k_longest_per_source(ray_session, tmp_path):
    """Per-source cap: only the 3 longest docs per source survive,
    ranked by n_tokens desc then doc_id asc (ties deterministic)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from smart_ocr_ray.ops.text_analysis import source_caps

    # source "farm": 5 docs of decreasing length (2 must be dropped,
    # incl. a tie on n_tokens broken by doc_id); "solo": 1 doc.
    texts = [
        "a b c d e",    # farm, 5 tok -> rnk 1
        "a b c d",      # farm, 4 tok -> rnk 2
        "a b c",        # farm, 3 tok -> rnk 3 (doc_id 2 beats doc_id 3)
        "x y z",        # farm, 3 tok -> dropped (tie, higher doc_id)
        "q",            # farm, 1 tok -> dropped
        "only doc",     # solo, 2 tok -> rnk 1
    ]
    sources = ["farm"] * 5 + ["solo"]
    sf = tmp_path / "capsf"; sf.mkdir()
    pq.write_table(
        pa.Table.from_pydict({
            "doc_id": pa.array(range(len(texts)), pa.int64()),
            "text": pa.array(texts),
            "lang": pa.array(["en"] * len(texts)),
            "source": pa.array(sources),
            "n_chars": pa.array([len(t) for t in texts], pa.int64()),
        }),
        sf / "documents.parquet",
    )
    rows = [
        (r["source"], r["rnk"], r["doc_id"], r["n_tokens"])
        for r in source_caps(str(sf)).take_all()
    ]
    assert rows == [
        ("farm", 1, 0, 5),
        ("farm", 2, 1, 4),
        ("farm", 3, 2, 3),
        ("solo", 1, 5, 2),
    ]


def test_ccnet_buckets_order_and_ties(ray_session, tmp_path):
    """Per-lang perplexity thirds: buckets follow mean_bits_e3 order
    (low bits = head), every third is populated, and equal-surprisal
    docs (byte-identical texts) always share a bucket."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from smart_ocr_ray.ops.text_analysis import ccnet_buckets

    # 6 docs, one language, engineered corpus frequencies (A=32 total
    # tokens): mean_bits_e3 = 2000,2000,4000,5000,6000,6000 → with n=6
    # the cutoffs land at c1=2000, c2=5000 → head/head/middle/middle/
    # tail/tail. Docs 0-1 are byte-identical (the boundary-tie case).
    texts = [
        "the the the the the the the the",  # cf(the)=16 → 2 bits
        "the the the the the the the the",
        "aa aa aa aa",                        # cf(aa)=4 → 4 bits
        "bb bb",                              # cf(bb)=2 → 5 bits
        "cc dd",                              # singletons → 6 bits
        "ee ff gg hh ii jj kk ll",            # singletons → 6 bits
    ]
    sf = tmp_path / "ccnetsf"; sf.mkdir()
    pq.write_table(
        pa.Table.from_pydict({
            "doc_id": pa.array(range(len(texts)), pa.int64()),
            "text": pa.array(texts),
            "lang": pa.array(["en"] * len(texts)),
            "source": pa.array(["s"] * len(texts)),
            "n_chars": pa.array([len(t) for t in texts], pa.int64()),
        }),
        sf / "documents.parquet",
    )
    rows = sorted(
        ccnet_buckets(str(sf)).take_all(), key=lambda r: (r["mean_bits_e3"], r["doc_id"])
    )
    assert len(rows) == 6
    order = {"head": 0, "middle": 1, "tail": 2}
    seq = [order[r["bucket"]] for r in rows]
    assert seq == sorted(seq), "buckets must be monotone in mean_bits_e3"
    assert set(seq) == {0, 1, 2}, "all three buckets populated"
    tied = {r["doc_id"]: r["bucket"] for r in rows if r["doc_id"] in (0, 1)}
    assert tied[0] == tied[1], "equal-surprisal docs share a bucket"


def test_dsir_weights_favor_target_like_docs(ray_session, tmp_path):
    """DSIR: docs sharing vocabulary with the target set (quality-filter
    passers) must score a higher importance weight than docs whose
    grams only ever appear in filtered-out text."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from smart_ocr_ray.ops.text_analysis import dsir_weights, quality_reason

    # 4 long clean docs (pass the filter; vocabulary A) + 4 short
    # spammy docs (fail 'too_short'; vocabulary B) + 2 probes below.
    good = "the data and pipeline of tokens " + " ".join(
        f"clean{i} words the and of" for i in range(12)
    )
    bad = "zzz buy spam now"
    # probe docs FAIL the filter too (too_short) so they contribute
    # nothing to the target counts — pure held-out queries.
    probe_good = "the data and pipeline of tokens"
    probe_bad = "zzz buy spam now again"
    texts = [good] * 4 + [bad] * 4 + [probe_good, probe_bad]
    assert quality_reason(good, "en") == ""
    assert quality_reason(bad, "en") == "too_short"
    sf = tmp_path / "dsirsf"; sf.mkdir()
    pq.write_table(
        pa.Table.from_pydict({
            "doc_id": pa.array(range(len(texts)), pa.int64()),
            "text": pa.array(texts),
            "lang": pa.array(["en"] * len(texts)),
            "source": pa.array(["s"] * len(texts)),
            "n_chars": pa.array([len(t) for t in texts], pa.int64()),
        }),
        sf / "documents.parquet",
    )
    out = {r["doc_id"]: r for r in dsir_weights(str(sf)).take_all()}
    assert len(out) == 10
    pg, pb = out[8], out[9]
    # per-gram mean so the two probes' different lengths don't matter
    assert pg["weight_bits"] * pb["n_grams"] > pb["weight_bits"] * pg["n_grams"]
    assert pg["n_grams"] == 2 * 6 - 1


def test_link_graph_degrees_match_fixture_targets(ray_session, tmp_path):
    """Page-graph degrees over the html payloads equal the closed-form
    expectation from the fixture link rule (targets i-1, i//2, i//3 on
    html-class pages; binary/empty pages contribute and receive no
    anchor edges but CAN be link targets... dangling targets to
    non-html pages still resolve because in-degree joins on page url,
    which exists for every corpus row that is html-kind)."""
    import pyarrow.parquet as pq

    from smart_ocr_ray.fixtures import (
        build_row,
        class_of,
        generate_pages,
        related_targets,
    )
    from smart_ocr_ray.functions.assess import sniff_doc_kind
    from smart_ocr_ray.ops.links import link_graph, page_hrefs

    n = 40
    table = generate_pages(n)
    pdir = tmp_path / "pages"; pdir.mkdir()
    pq.write_table(table, pdir / "pages.parquet")

    # closed-form expectation from the fixture rule + the DOM parse of
    # each single row (independent of the distributed path under test)
    url_of = {i: f"https://fixture.test/{class_of(i)}/{i:06d}" for i in range(n)}
    html_kind = {
        i: sniff_doc_kind(table.column("html")[i].as_py() or b"") == "html"
        for i in range(n)
    }
    exp_out = {}
    exp_in = {i: 0 for i in range(n)}
    for i in range(n):
        if not html_kind[i]:
            continue
        hrefs = page_hrefs(table.column("html")[i].as_py() or b"")
        exp_out[i] = len(hrefs)
        for h in hrefs:
            for j in range(n):
                if h == f"/{class_of(j)}/{j:06d}":
                    exp_in[j] += 1
    rows = {r["url"]: r for r in link_graph(str(pdir)).take_all()}
    assert len(rows) == sum(html_kind.values())
    for i in range(n):
        if not html_kind[i]:
            assert url_of[i] not in rows
            continue
        r = rows[url_of[i]]
        assert r["out_links"] == exp_out[i]
        assert r["in_degree"] == exp_in[i]
        # every html page with class targets links to them
        want = {
            f"/{class_of(j)}/{j:06d}" for j in related_targets(i)
        }
        got = set(page_hrefs(table.column("html")[i].as_py() or b""))
        assert want <= got
    # hub skew exists: low-id pages collect multiple in-links
    assert max(exp_in.values()) >= 3


def test_link_pagerank_matches_pure_python_recurrence(ray_session, tmp_path):
    """Distributed link PageRank == a sequential integer recurrence
    over the same DOM-harvested edges (hubs must outrank leaves)."""
    import pyarrow.parquet as pq

    from smart_ocr_ray.fixtures import generate_pages
    from smart_ocr_ray.functions.assess import sniff_doc_kind
    from smart_ocr_ray.ops.links import _host, link_pagerank, page_hrefs

    n = 30
    table = generate_pages(n)
    pdir = tmp_path / "pages"; pdir.mkdir()
    pq.write_table(table, pdir / "pages.parquet")

    urls, htmls = table.column("url").to_pylist(), table.column("html").to_pylist()
    nodes = [u for u, h in zip(urls, htmls) if sniff_doc_kind(h or b"") == "html"]
    node_set = set(nodes)
    edges = []
    for u, h in zip(urls, htmls):
        if u not in node_set:
            continue
        for href in page_hrefs(h or b""):
            if href.startswith("/"):
                dst = _host(u) + href
                if dst in node_set:
                    edges.append((u, dst))
    SCALE, N = 10**12, len(nodes)
    pr = {u: SCALE // N for u in nodes}
    odeg = {}
    for s, _ in edges:
        odeg[s] = odeg.get(s, 0) + 1
    for _ in range(3):
        contrib = {u: 0 for u in nodes}
        for s, d in edges:
            contrib[d] += pr[s] // odeg[s]
        pr = {u: (15 * SCALE) // (100 * N) + (85 * contrib[u]) // 100 for u in nodes}

    got = {r["url"]: r["pr_e12"] for r in link_pagerank(str(pdir)).take_all()}
    assert got == pr
    # link hubs (low-id pages) collect rank above the uniform floor
    floor = (15 * SCALE) // (100 * N)
    assert max(got.values()) > 2 * floor


def test_crawl_budget_largest_remainder(ray_session, tmp_path):
    """crawl_budget: Hamilton apportionment — equal thirds of budget 10
    give 3 each, the leftover unit goes to the lexicographically first
    section; quotas always sum to exactly the budget."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from smart_ocr_ray.ops.links import crawl_budget

    urls = [f"https://s.test/{sec}/{i}" for sec in ("a", "b", "c")
            for i in range(1)]
    pdir = tmp_path / "pages"; pdir.mkdir()
    pq.write_table(
        pa.Table.from_pydict({
            "url": pa.array(urls, pa.string()),
            "html": pa.array([b"<html></html>"] * len(urls), pa.binary()),
        }),
        pdir / "pages.parquet",
    )
    rows = {r["section"]: r["quota"]
            for r in crawl_budget(str(pdir), budget=10).take_all()}
    assert rows == {"https://s.test/a": 4, "https://s.test/b": 3,
                    "https://s.test/c": 3}
    assert sum(rows.values()) == 10


def test_link_degree_hist_matches_link_graph(ray_session, tmp_path):
    """link_degree_hist: the histogram equals a Counter over the
    link_graph rows it composes from, for both axes."""
    from collections import Counter

    import pyarrow.parquet as pq

    from smart_ocr_ray.fixtures import generate_pages
    from smart_ocr_ray.ops.links import link_degree_hist, link_graph

    table = generate_pages(40)
    pdir = tmp_path / "pages"; pdir.mkdir()
    pq.write_table(table, pdir / "pages.parquet")

    lg = link_graph(str(pdir)).take_all()
    want = Counter()
    for r in lg:
        want[("out", r["out_links"])] += 1
        want[("in", r["in_degree"])] += 1
    got = {(r["axis"], r["degree"]): r["n_pages"]
           for r in link_degree_hist(str(pdir)).take_all()}
    assert got == dict(want)


def test_link_components_match_union_find(ray_session, tmp_path):
    """Connected components over the fixture link graph == a
    sequential union-find over the same DOM-harvested edges; isolated
    html pages are singleton components labeled by their own id."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from smart_ocr_ray.fixtures import generate_pages
    from smart_ocr_ray.functions.assess import sniff_doc_kind
    from smart_ocr_ray.functions.hashing import _hash64
    from smart_ocr_ray.ops.links import _host, link_components, page_hrefs

    # --- explicit topology: one 2-clique, one isolated page ---
    def page(body):
        return f"<html><body>{body}</body></html>".encode()

    rows = [
        ("https://h.test/a", page('<a href="/b">to b</a>')),
        ("https://h.test/b", page('<a href="/a">back</a>')),
        ("https://h.test/lone", page("no links at all")),
    ]
    pdir = tmp_path / "pages0"; pdir.mkdir()
    pq.write_table(
        pa.Table.from_pydict({
            "url": pa.array([r[0] for r in rows], pa.string()),
            "html": pa.array([r[1] for r in rows], pa.binary()),
        }),
        pdir / "pages.parquet",
    )
    M = 2**63
    got = {r["url"]: r["component_id"]
           for r in link_components(str(pdir)).take_all()}
    ids = {u: int(_hash64(u)) % M for u, _ in rows}
    ab = min(ids["https://h.test/a"], ids["https://h.test/b"])
    assert got == {
        "https://h.test/a": ab,
        "https://h.test/b": ab,
        "https://h.test/lone": ids["https://h.test/lone"],
    }

    # --- zero-edge corpus: every internal link dangles (the bench
    # replication shape) — all pages singleton, empty label table ---
    rows_d = [
        ("https://h.test/x", page('<a href="/nowhere">gone</a>')),
        ("https://h.test/y", page('<a href="/also-gone">gone</a>')),
    ]
    pdir_d = tmp_path / "pagesd"; pdir_d.mkdir()
    pq.write_table(
        pa.Table.from_pydict({
            "url": pa.array([r[0] for r in rows_d], pa.string()),
            "html": pa.array([r[1] for r in rows_d], pa.binary()),
        }),
        pdir_d / "pages.parquet",
    )
    got_d = {r["url"]: r["component_id"]
             for r in link_components(str(pdir_d)).take_all()}
    assert got_d == {u: int(_hash64(u)) % M for u, _ in rows_d}

    # --- fixture corpus: mirror a sequential union-find ---
    n = 30
    table = generate_pages(n)
    pdir2 = tmp_path / "pages1"; pdir2.mkdir()
    pq.write_table(table, pdir2 / "pages.parquet")

    urls, htmls = table.column("url").to_pylist(), table.column("html").to_pylist()
    nodes = [u for u, h in zip(urls, htmls) if sniff_doc_kind(h or b"") == "html"]
    node_set = set(nodes)
    parent = {u: u for u in nodes}

    def find(u):
        while parent[u] != u:
            parent[u] = parent[parent[u]]
            u = parent[u]
        return u

    for u, h in zip(urls, htmls):
        if u not in node_set:
            continue
        for href in page_hrefs(h or b""):
            if href.startswith("/"):
                dst = _host(u) + href
                if dst in node_set:
                    ra, rb = find(u), find(dst)
                    if ra != rb:
                        parent[ra] = rb
    comp_min: dict[str, int] = {}
    for u in nodes:
        r = find(u)
        comp_min[r] = min(comp_min.get(r, M), int(_hash64(u)) % M)
    expected = {u: comp_min[find(u)] for u in nodes}

    got2 = {r["url"]: r["component_id"]
            for r in link_components(str(pdir2)).take_all()}
    assert got2 == expected


def test_anchor_texts_counts_and_nested_voiding(ray_session, tmp_path):
    """Incoming anchor-text counts: terms aggregate across referring
    pages; nested markup voids an anchor's text (regexp-parity rule);
    dangling targets drop."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from smart_ocr_ray.ops.links import anchor_texts

    def page(body):
        return f"<html><body>{body}</body></html>".encode()

    rows = [
        ("https://h.test/a", page('<a href="/b">good stuff</a> <a href="/b">good</a>')),
        ("https://h.test/b", page('<a href="/a">back <b>bold</b></a>'
                                  '<a href="/missing">dangling words</a>')),
        ("https://h.test/c", page('<a href="/a">plain text</a>')),
    ]
    pdir = tmp_path / "pages"; pdir.mkdir()
    pq.write_table(
        pa.Table.from_pydict({
            "url": pa.array([r[0] for r in rows]),
            "warc_ts": pa.array([0] * 3, pa.timestamp("us")),
            "html": pa.array([r[1] for r in rows], pa.binary()),
            "text": pa.array([""] * 3),
            "lang": pa.array(["en"] * 3),
        }),
        pdir / "pages.parquet",
    )
    got = {
        (r["url"], r["term"]): r["n_refs"]
        for r in anchor_texts(str(pdir)).take_all()
    }
    assert got == {
        ("https://h.test/b", "good"): 2,
        ("https://h.test/b", "stuff"): 1,
        ("https://h.test/a", "plain"): 1,
        ("https://h.test/a", "text"): 1,
        # /a's nested-<b> anchor voided; /missing dangling dropped
    }


def test_anchor_text_collector_regexp_parity():
    """The collector must agree with the oracle's raw-byte regexp
    ``<a href="(/[^\\"]*)">([^<]*)</a>`` on the constructs where an
    HTML parser naturally diverges: comments void (they contain '<'),
    entity/char references stay UNDECODED, declarations/PIs void."""
    import re

    from smart_ocr_ray.ops.links import _AnchorTextCollector

    rx = re.compile(r'<a href="(/[^"]*)">([^<]*)</a>')
    cases = [
        '<a href="/x">te<!--c-->xt</a>',          # comment voids
        '<a href="/x">a&amp;b</a>',                # entity stays raw
        '<a href="/x">n&#38;m</a>',                # charref stays raw
        '<a href="/x">a<?pi?>b</a>',               # PI voids
        '<a href="/x">plain words</a>',            # control
        '<a href="/x">one</a> <a href="/y">two</a>',
    ]
    for html in cases:
        parser = _AnchorTextCollector()
        parser.feed(html)
        got = [(h, t) for h, t in parser.pairs]
        want = rx.findall(html)
        assert got == want, (html, got, want)


def test_bloom_dedup_hits_and_misses(ray_session, tmp_path):
    """Broadcast-Bloom incremental dedup: odd docs sharing an even
    doc's exact text probe positive; fresh odd docs probe negative
    (65536-bit filter over a handful of old texts — false-positive
    odds are ~(n*4/65536)^4, negligible here)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from smart_ocr_ray.ops.dedup import bloom_dedup

    texts = [
        "old snapshot text alpha",   # 0 old
        "old snapshot text alpha",   # 1 new == old -> dup
        "old snapshot text beta",    # 2 old
        "completely fresh content",  # 3 new -> not dup
        "another old page gamma",    # 4 old
        "old snapshot text beta",    # 5 new == old -> dup
    ]
    sf = tmp_path / "bloomsf"; sf.mkdir()
    pq.write_table(
        pa.Table.from_pydict({
            "doc_id": pa.array(range(len(texts)), pa.int64()),
            "text": pa.array(texts),
            "lang": pa.array(["en"] * len(texts)),
            "source": pa.array(["s"] * len(texts)),
            "n_chars": pa.array([len(t) for t in texts], pa.int64()),
        }),
        sf / "documents.parquet",
    )
    out = {r["doc_id"]: r["maybe_dup"] for r in bloom_dedup(str(sf)).take_all()}
    assert out == {1: True, 3: False, 5: True}


def test_cms_heavy_hitters_overcounts_only(ray_session, tmp_path):
    """CMS invariant: estimates never undercount, and with a tiny
    vocabulary (no collisions plausible at 4x1024) they are exact."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from smart_ocr_ray.ops.text_analysis import cms_heavy_hitters

    texts = ["alpha alpha beta", "alpha beta gamma", "beta beta beta delta"]
    sf = tmp_path / "cmssf"; sf.mkdir()
    pq.write_table(
        pa.Table.from_pydict({
            "doc_id": pa.array(range(len(texts)), pa.int64()),
            "text": pa.array(texts),
            "lang": pa.array(["en"] * len(texts)),
            "source": pa.array(["s"] * len(texts)),
            "n_chars": pa.array([len(t) for t in texts], pa.int64()),
        }),
        sf / "documents.parquet",
    )
    out = {r["term"]: r for r in cms_heavy_hitters(str(sf)).to_pylist()}
    assert out["beta"]["exact_cnt"] == 5 and out["alpha"]["exact_cnt"] == 3
    for r in out.values():
        assert r["cms_est"] >= r["exact_cnt"]
    assert out["beta"]["cms_est"] == 5  # no collisions in a 5-term vocab


def test_corpus_curation_stage_precedence(ray_session, tmp_path):
    """Composed keep-list: quality reason wins over dup reason wins over
    source_cap; the cap ranks only among quality+dedup survivors."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from smart_ocr_ray.ops.curation import corpus_curation

    long = lambda tag, n: " ".join(
        f"{tag}{i} the and of to common words here" for i in range(n)
    )
    texts = [
        long("a", 10),     # 0: eligible, 80 tok -> rnk1
        long("b", 9),      # 1: eligible, 72 tok -> rnk2
        long("c", 8),      # 2: eligible, 64 tok -> rnk3
        long("d", 7),      # 3: eligible, 56 tok -> rnk4 -> source_cap
        long("a", 10),     # 4: exact dup of 0 -> exact_dup (quality passes)
        "too short",       # 5: quality 'too_short' wins
    ]
    sf = tmp_path / "cursf"; sf.mkdir()
    pq.write_table(
        pa.Table.from_pydict({
            "doc_id": pa.array(range(len(texts)), pa.int64()),
            "text": pa.array(texts),
            "lang": pa.array(["en"] * len(texts)),
            "source": pa.array(["host"] * len(texts)),
            "n_chars": pa.array([len(t) for t in texts], pa.int64()),
        }),
        sf / "documents.parquet",
    )
    out = {r["doc_id"]: r for r in corpus_curation(str(sf)).take_all()}
    assert len(out) == 6
    assert [out[i]["reason"] for i in range(6)] == [
        "", "", "", "source_cap", "exact_dup", "too_short",
    ]
    assert [out[i]["keep"] for i in range(6)] == [
        True, True, True, False, False, False,
    ]


def test_bpe_pair_counts_known_answer(ray_session, tmp_path):
    """First BPE merge: 'aaab aaab ab' -> pair counts aa=4, ab=3
    (word-frequency-weighted adjacent char pairs)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from smart_ocr_ray.ops.text_analysis import bpe_pair_counts

    texts = ["aaab aaab", "ab"]
    sf = tmp_path / "bpesf"; sf.mkdir()
    pq.write_table(
        pa.Table.from_pydict({
            "doc_id": pa.array(range(len(texts)), pa.int64()),
            "text": pa.array(texts),
            "lang": pa.array(["en"] * len(texts)),
            "source": pa.array(["s"] * len(texts)),
            "n_chars": pa.array([len(t) for t in texts], pa.int64()),
        }),
        sf / "documents.parquet",
    )
    rows = [(r["pair"], r["cnt"]) for r in bpe_pair_counts(str(sf)).take_all()]
    assert rows == [("aa", 4), ("ab", 3)]


def test_link_graph_no_html_pages(ray_session, tmp_path):
    """A corpus of only binary/empty payloads yields a typed empty
    link graph (no schema-less-block crash in the joins)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from smart_ocr_ray.ops.links import link_graph

    pdir = tmp_path / "pages"; pdir.mkdir()
    pq.write_table(
        pa.Table.from_pydict({
            "url": pa.array(["https://h.test/a", "https://h.test/b"]),
            "warc_ts": pa.array([0, 1], pa.timestamp("us")),
            "html": pa.array([b"%FIX-LAYOUT junk", b""], pa.binary()),
            "text": pa.array(["", ""]),
            "lang": pa.array(["en", "en"]),
        }),
        pdir / "pages.parquet",
    )
    out = link_graph(str(pdir)).take_all()
    assert out == []


def test_ccnet_buckets_single_doc_lang(ray_session, tmp_path):
    """n=1 per language: the only doc is its own head cutoff."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from smart_ocr_ray.ops.text_analysis import ccnet_buckets

    sf = tmp_path / "ccsf"; sf.mkdir()
    pq.write_table(
        pa.Table.from_pydict({
            "doc_id": pa.array([0, 1], pa.int64()),
            "text": pa.array(["ein deutscher satz", "one english sentence"]),
            "lang": pa.array(["de", "en"]),
            "source": pa.array(["s", "s"]),
            "n_chars": pa.array([18, 20], pa.int64()),
        }),
        sf / "documents.parquet",
    )
    out = {r["doc_id"]: r["bucket"] for r in ccnet_buckets(str(sf)).take_all()}
    assert out == {0: "head", 1: "head"}


def test_dsir_weights_empty_target_set(ray_session, tmp_path):
    """Every doc fails the quality gate (all too_short): the target
    model is pure Laplace smoothing and weights are still defined."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from smart_ocr_ray.ops.text_analysis import dsir_weights

    texts = ["short one", "short two", ""]
    sf = tmp_path / "dsir0"; sf.mkdir()
    pq.write_table(
        pa.Table.from_pydict({
            "doc_id": pa.array(range(3), pa.int64()),
            "text": pa.array(texts),
            "lang": pa.array(["en"] * 3),
            "source": pa.array(["s"] * 3),
            "n_chars": pa.array([len(t) for t in texts], pa.int64()),
        }),
        sf / "documents.parquet",
    )
    out = dsir_weights(str(sf)).take_all()
    assert {r["doc_id"] for r in out} == {0, 1}  # empty doc emits no row
    assert all(isinstance(r["weight_bits"], int) for r in out)


def test_corpus_curation_all_filtered(ray_session, tmp_path):
    """Everything fails quality: no eligible set, no source_cap rows,
    every reason is the quality reason."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from smart_ocr_ray.ops.curation import corpus_curation

    texts = ["tiny", "also tiny"]
    sf = tmp_path / "curall"; sf.mkdir()
    pq.write_table(
        pa.Table.from_pydict({
            "doc_id": pa.array(range(2), pa.int64()),
            "text": pa.array(texts),
            "lang": pa.array(["en"] * 2),
            "source": pa.array(["s"] * 2),
            "n_chars": pa.array([len(t) for t in texts], pa.int64()),
        }),
        sf / "documents.parquet",
    )
    out = corpus_curation(str(sf)).take_all()
    assert len(out) == 2
    assert all(not r["keep"] and r["reason"] == "too_short" for r in out)


def test_link_pagerank_no_html_pages(ray_session, tmp_path):
    """All-binary corpus: pagerank over zero nodes is a typed empty."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from smart_ocr_ray.ops.links import link_pagerank

    pdir = tmp_path / "pages"; pdir.mkdir()
    pq.write_table(
        pa.Table.from_pydict({
            "url": pa.array(["https://h.test/a"]),
            "warc_ts": pa.array([0], pa.timestamp("us")),
            "html": pa.array([b"%FIX-LAYOUT junk"], pa.binary()),
            "text": pa.array([""]),
            "lang": pa.array(["en"]),
        }),
        pdir / "pages.parquet",
    )
    assert link_pagerank(str(pdir)).take_all() == []


def test_crawl_diff_classifies_added_removed_changed(ray_session, tmp_path):
    """Snapshot delta over a hand-built table: doc_id % 5 == 4 is
    absent from the synthesized prev snapshot (added), % 7 == 2 has a
    mutated prev fingerprint (changed), % 13 == 6 contributes a
    prev-only row at doc_id + 10_000_000 (removed); everything else is
    unchanged and must NOT appear."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from smart_ocr_ray.ops.dedup import crawl_diff

    n = 40
    sf = tmp_path / "diffsf"; sf.mkdir()
    pq.write_table(
        pa.Table.from_pydict({
            "doc_id": pa.array(range(n), pa.int64()),
            "text": pa.array([f"page body {i}" for i in range(n)]),
            "lang": pa.array(["en"] * n),
            "source": pa.array(["s"] * n),
            "n_chars": pa.array([11] * n, pa.int64()),
        }),
        sf / "documents.parquet",
    )
    out = {r["doc_id"]: r["status"] for r in crawl_diff(str(sf)).take_all()}
    for i in range(n):
        if i % 5 == 4:
            assert out[i] == "added"
        elif i % 7 == 2:
            assert out[i] == "changed"
        else:
            assert i not in out  # unchanged rows dropped
        if i % 13 == 6:
            assert out[i + 10_000_000] == "removed"
    expect = (
        {i for i in range(n) if i % 5 == 4}
        | {i for i in range(n) if i % 7 == 2 and i % 5 != 4}
        | {i + 10_000_000 for i in range(n) if i % 13 == 6}
    )
    assert set(out) == expect


def test_canonicalize_url_rules():
    """Each frozen rule in isolation and composed."""
    from smart_ocr_ray.ops.urls import canonicalize_url as c

    assert c("HTTPS://WWW.Ex.COM/Path") == "https://www.ex.com/Path"  # case; path kept
    assert c("https://ex.com:443/a") == "https://ex.com/a"  # default port
    assert c("http://ex.com:80/a") == "http://ex.com/a"
    assert c("http://ex.com:8080/a") == "http://ex.com:8080/a"  # non-default kept
    assert c("https://ex.com/a#frag") == "https://ex.com/a"  # fragment
    assert c("https://ex.com/a?utm_source=x&id=3") == "https://ex.com/a?id=3"
    assert c("https://ex.com/a?fbclid=z") == "https://ex.com/a"  # all dropped -> no ?
    assert c("https://ex.com/a?b=2&a=1") == "https://ex.com/a?a=1&b=2"  # sorted
    assert (
        c("HTTPS://EX.com:443/d/1?z=9&utm_campaign=c&a=1#s")
        == "https://ex.com/d/1?a=1&z=9"
    )
    # Bare (valueless) tracking params drop exactly like valued ones —
    # pinned on both engines (the SQL oracle has matching p='fbclid'
    # arms), and near-miss names are kept.
    assert c("https://ex.com/p?fbclid&a=1") == "https://ex.com/p?a=1"
    assert c("https://ex.com/p?ref") == "https://ex.com/p"
    assert c("https://ex.com/p?fbclidX=1") == "https://ex.com/p?fbclidX=1"
    # Scheme-less strings: ONLY the fragment/query rules apply — the
    # leading segment is not assumed to be a host, so no lowercasing.
    assert c("Example.COM/Some/Path?b=2&a=1#f") == "Example.COM/Some/Path?a=1&b=2"


def test_url_canonical_collapses_recrawls(ray_session, tmp_path):
    """doc_id % 4 == 1 docs get a second, later, differently-spelled
    crawl of the same page: exactly those groups report n_variants=2
    and keep the snapshot-2 spelling/ts; every doc yields one row."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from smart_ocr_ray.ops.urls import url_canonical

    n = 24
    sf = tmp_path / "urlsf"; sf.mkdir()
    pq.write_table(
        pa.Table.from_pydict({
            "doc_id": pa.array(range(n), pa.int64()),
            "text": pa.array([f"t{i}" for i in range(n)]),
            "lang": pa.array(["en"] * n),
            "source": pa.array(["s"] * n),
            "n_chars": pa.array([2] * n, pa.int64()),
        }),
        sf / "documents.parquet",
    )
    rows = url_canonical(str(sf)).take_all()
    assert len(rows) == n  # one canonical row per document
    by_doc = {int(r["canon_url"].rsplit("/", 1)[1].split("?")[0]): r for r in rows}
    for d, r in by_doc.items():
        if d % 4 == 1:
            assert r["n_variants"] == 2
            assert r["last_ts"] == d * 1000 + 2
            assert r["url"] == f"https://s.example.com/docs/{d}?a=1&b=2"
        else:
            assert r["n_variants"] == 1
            assert r["last_ts"] == d * 1000 + 1
        assert r["canon_url"].startswith("https://s.example.com/docs/")


def test_bpe_encode_matches_reference_trainer(ray_session, tmp_path):
    """bpe_encode vs an independent in-test BPE trainer+encoder over a
    tiny hand-built corpus: per-doc (n_words, n_tokens) must match
    greedy application of the 6 learned merges."""
    import re
    from collections import Counter

    import pyarrow as pa
    import pyarrow.parquet as pq

    from smart_ocr_ray.ops.text_analysis import bpe_encode

    texts = [
        "the cat sat on the mat",
        "the rat and the cat",
        "Mats and Rats! 42",     # non-[a-z]+ tokens dropped
        "",                       # zero alpha words -> (0, 0)
        "thematic theme the",
    ]
    sf = tmp_path / "bpesf"; sf.mkdir()
    pq.write_table(
        pa.Table.from_pydict({
            "doc_id": pa.array(range(len(texts)), pa.int64()),
            "text": pa.array(texts),
            "lang": pa.array(["en"] * len(texts)),
            "source": pa.array(["s"] * len(texts)),
            "n_chars": pa.array([len(t) for t in texts], pa.int64()),
        }),
        sf / "documents.parquet",
    )

    # Independent reference: same frozen semantics, straight-line code.
    word_re = re.compile(r"[a-z]+$")
    wc: Counter = Counter()
    for t in texts:
        wc.update(w for w in t.lower().split() if word_re.match(w))
    syms = {w: list(w) for w in wc}
    merges = []
    for _ in range(6):
        pairs: Counter = Counter()
        for w, c in wc.items():
            s = syms[w]
            for a, b in zip(s, s[1:]):
                pairs[(a, b)] += c
        viable = [(p, c) for p, c in pairs.items() if p[0] != p[1]]
        if not viable:
            break
        (a, b), _c = min(viable, key=lambda kv: (-kv[1], kv[0]))
        merges.append((a, b))
        for w, s in syms.items():
            res, i = [], 0
            while i < len(s):
                if i + 1 < len(s) and s[i] == a and s[i + 1] == b:
                    res.append(a + b); i += 2
                else:
                    res.append(s[i]); i += 1
            syms[w] = res
    expect = {}
    for d, t in enumerate(texts):
        ws = [w for w in t.lower().split() if word_re.match(w)]
        expect[d] = (len(ws), sum(len(syms[w]) for w in ws))

    got = {r["doc_id"]: (r["n_words"], r["n_tokens"]) for r in bpe_encode(str(sf)).take_all()}
    assert got == expect
    assert got[3] == (0, 0)


def test_pq_encode_matches_numpy_lloyd(ray_session, tmp_path):
    """pq_encode vs a straight-line numpy mirror of the frozen
    semantics (int-grid quantization, per-subspace L2 Lloyd with
    floor-div updates, first-min argmin ties, exact int error)."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    from smart_ocr_ray.ops.similarity import pq_encode

    rng = np.random.default_rng(7)
    n, d, m_sub, k, n_iter = 60, 16, 4, 8, 2
    vecs = rng.standard_normal((n, d)).astype(np.float32)
    sf = tmp_path / "pqsf"; sf.mkdir()
    pq.write_table(
        pa.Table.from_pydict({
            "vec_id": pa.array(range(n), pa.int64()),
            "embedding": pa.array([v.tolist() for v in vecs], pa.list_(pa.float32())),
        }),
        sf / "embeddings.parquet",
    )

    q = np.round(vecs.astype(np.float64) * 1_000_000).astype(np.int64)
    bounds = [(j * d) // m_sub for j in range(m_sub + 1)]
    books = [q[:k, bounds[j]:bounds[j + 1]].copy() for j in range(m_sub)]

    def assign(q_m, book):
        diff = q_m[:, None, :] - book[None, :, :]
        return np.argmin((diff * diff).sum(axis=2), axis=1)

    for _ in range(n_iter):
        for m in range(m_sub):
            q_m = q[:, bounds[m]:bounds[m + 1]]
            a = assign(q_m, books[m])
            nb = books[m].copy()
            for ci in range(k):
                sel = q_m[a == ci]
                if len(sel):
                    nb[ci] = np.floor_divide(sel.sum(axis=0), len(sel))
            books[m] = nb
    expect = {}
    for i in range(n):
        codes, err = [], 0
        for m in range(m_sub):
            q_m = q[i, bounds[m]:bounds[m + 1]]
            a = int(assign(q_m[None, :], books[m])[0])
            codes.append(a)
            diff = q_m - books[m][a]
            err += int((diff * diff).sum())
        expect[i] = (tuple(codes), err)

    got = {
        r["vec_id"]: ((r["code_0"], r["code_1"], r["code_2"], r["code_3"]), r["err"])
        for r in pq_encode(str(sf), m_sub=m_sub, k=k, n_iter=n_iter).take_all()
    }
    assert got == expect
    # codes actually use multiple centroids (not degenerate)
    assert len({c for codes, _ in got.values() for c in codes}) > 2


def test_pq_search_matches_lut_mirror(ray_session, tmp_path):
    """pq_search vs an independent numpy mirror: train the same
    Lloyd-L2 codebooks, build per-query LUTs, rank by summed lookups
    (ties vec_id asc) — top-k must match exactly, and a query's
    nearest code-identical vector must rank first."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    from smart_ocr_ray.ops.similarity import pq_search

    rng = np.random.default_rng(11)
    n, d, m_sub, kc, n_iter, topk, nq = 50, 16, 4, 8, 2, 5, 3
    vecs = rng.standard_normal((n, d)).astype(np.float32)
    sf = tmp_path / "pqssf"; sf.mkdir()
    pq.write_table(
        pa.Table.from_pydict({
            "vec_id": pa.array(range(n), pa.int64()),
            "embedding": pa.array([v.tolist() for v in vecs], pa.list_(pa.float32())),
        }),
        sf / "embeddings.parquet",
    )

    q = np.round(vecs.astype(np.float64) * 1_000_000).astype(np.int64)
    bounds = [(j * d) // m_sub for j in range(m_sub + 1)]
    books = [q[:kc, bounds[j]:bounds[j + 1]].copy() for j in range(m_sub)]

    def assign(q_m, book):
        diff = q_m[:, None, :] - book[None, :, :]
        return np.argmin((diff * diff).sum(axis=2), axis=1)

    for _ in range(n_iter):
        for m in range(m_sub):
            q_m = q[:, bounds[m]:bounds[m + 1]]
            a = assign(q_m, books[m])
            nb = books[m].copy()
            for ci in range(kc):
                sel = q_m[a == ci]
                if len(sel):
                    nb[ci] = np.floor_divide(sel.sum(axis=0), len(sel))
            books[m] = nb

    codes = np.stack(
        [assign(q[:, bounds[m]:bounds[m + 1]], books[m]) for m in range(m_sub)],
        axis=1,
    )  # (n, m_sub)
    expect = {}
    for qi in range(nq):
        lut = [
            ((q[qi, bounds[m]:bounds[m + 1]][None, :] - books[m]) ** 2).sum(axis=1)
            for m in range(m_sub)
        ]
        adist = np.zeros(n, dtype=np.int64)
        for m in range(m_sub):
            adist += lut[m][codes[:, m]]
        order = np.lexsort((np.arange(n), adist))[:topk]
        expect.update({
            (qi, int(v)): (int(adist[v]), r + 1) for r, v in enumerate(order)
        })

    got = {
        (r["query_id"], r["vec_id"]): (r["adist"], r["rank"])
        for r in pq_search(str(sf), k=topk, n_queries=nq).take_all()
    }
    assert got == expect


def test_curriculum_rank_dense_and_bucket_invariant(ray_session, tmp_path):
    """Global ranks are a dense 1..N permutation matching the frozen
    order (density desc, doc_id asc), and identical across bucket
    granularities (cross-bucket offset arithmetic is exact)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from smart_ocr_ray.ops.text_analysis import curriculum_rank

    texts = [
        "the cat and the dog",        # 4 stop hits / 5 tokens -> 800000
        "rocks minerals quartz",      # 0/3 -> 0
        "it is a fine day for it",    # 4/7 -> 571428... wait: it,is,a,for,it = 5/7
        "",                           # empty -> 0
        "the the the",                # 3/3 -> 1000000
        "a b c d e f g h i j",        # a=1/10 -> 100000
    ]
    n = len(texts)
    sf = tmp_path / "cursf"; sf.mkdir()
    pq.write_table(
        pa.Table.from_pydict({
            "doc_id": pa.array(range(n), pa.int64()),
            "text": pa.array(texts),
            "lang": pa.array(["en"] * n),
            "source": pa.array(["s"] * n),
            "n_chars": pa.array([len(t) for t in texts], pa.int64()),
        }),
        sf / "documents.parquet",
    )
    rows = curriculum_rank(str(sf)).take_all()
    assert sorted(r["rank"] for r in rows) == list(range(1, n + 1))
    by_rank = sorted(rows, key=lambda r: r["rank"])
    order = [(-r["stop_density_e6"], r["doc_id"]) for r in by_rank]
    assert order == sorted(order)  # frozen order respected
    assert by_rank[0]["doc_id"] == 4  # "the the the" ranks first

    fine = {r["doc_id"]: r["rank"] for r in rows}
    coarse = {
        r["doc_id"]: r["rank"] for r in curriculum_rank(str(sf), bucket=100_000).take_all()
    }
    tiny = {r["doc_id"]: r["rank"] for r in curriculum_rank(str(sf), bucket=7).take_all()}
    assert fine == coarse == tiny


def test_blocklist_filter_domain_precedence_and_keywords(ray_session, tmp_path):
    """Domain rule ('blk10.example.com' md5 starts '0') blocks every
    doc of that source and wins precedence over keywords; keyword rule
    fires on substring matches in clean-domain docs."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from smart_ocr_ray.ops.curation import blocklist_filter

    rows = [
        (0, "plain wholesome text", "ok0"),
        (1, "win the lottery today", "ok0"),       # keyword
        (2, "VIAGRA deals inside", "ok0"),         # keyword (case-folded)
        (3, "also has lottery words", "blk10"),    # domain wins precedence
        (4, "innocent text", "blk10"),             # domain
        (5, "cas ino split words", "ok0"),         # no match (not substring)
    ]
    sf = tmp_path / "blsf"; sf.mkdir()
    pq.write_table(
        pa.Table.from_pydict({
            "doc_id": pa.array([r[0] for r in rows], pa.int64()),
            "text": pa.array([r[1] for r in rows]),
            "lang": pa.array(["en"] * len(rows)),
            "source": pa.array([r[2] for r in rows]),
            "n_chars": pa.array([len(r[1]) for r in rows], pa.int64()),
        }),
        sf / "documents.parquet",
    )
    out = {r["doc_id"]: (r["blocked"], r["reason"]) for r in blocklist_filter(str(sf)).take_all()}
    assert out == {
        0: (False, ""),
        1: (True, "keyword"),
        2: (True, "keyword"),
        3: (True, "domain"),
        4: (True, "domain"),
        5: (False, ""),
    }


def test_lsh_recall_eval_counts_consistent(ray_session, tmp_path):
    """On a clustered corpus: LSH finds a nonzero subset of the exact
    pairs (precision 1 by construction), counts are consistent, and
    recall_e6 is the exact integer ratio."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    from smart_ocr_ray.ops.similarity import lsh_recall_eval

    rng = np.random.default_rng(3)
    vecs, ids, vid = [], [], 0
    for _ in range(10):
        base = rng.standard_normal(64)
        base /= np.linalg.norm(base)
        for _ in range(3):
            v = base + 0.02 * rng.standard_normal(64)
            vecs.append((v / np.linalg.norm(v)).astype(np.float32))
            ids.append(vid); vid += 1
    for _ in range(20):
        v = rng.standard_normal(64)
        vecs.append((v / np.linalg.norm(v)).astype(np.float32))
        ids.append(vid); vid += 1
    sf = tmp_path / "recsf"; sf.mkdir()
    pq.write_table(
        pa.Table.from_pydict({
            "vec_id": pa.array(ids, pa.int64()),
            "embedding": pa.array([v.tolist() for v in vecs], pa.list_(pa.float32())),
        }),
        sf / "embeddings.parquet",
    )
    row = lsh_recall_eval(str(sf), threshold_e3=950).take_all()[0]
    assert row["n_exact"] > 0
    assert 0 < row["n_common"] <= row["n_lsh"] <= row["n_exact"]
    assert row["recall_e6"] == (1_000_000 * row["n_common"]) // row["n_exact"]


def test_repetition_strip_keep_first(ray_session, tmp_path):
    """Intra-doc duplicate-line removal: later copies of a window the
    SAME doc already produced are dropped (keep-first), cross-doc
    sharing is irrelevant, empty docs clean to ''."""
    import hashlib

    import pyarrow as pa
    import pyarrow.parquet as pq

    from smart_ocr_ray.ops.text_analysis import repetition_strip

    texts = [
        "a b c d a b",      # windows: "a b","c d","a b" -> drop 3rd
        "a b a b a b",      # "a b" x3 -> keep one
        "x y z",            # "x y","z" -> no repeats (tail window short)
        "a b c d",          # cross-doc repeats don't matter
        "",
    ]
    sf = tmp_path / "rssf"; sf.mkdir()
    pq.write_table(
        pa.Table.from_pydict({
            "doc_id": pa.array(range(len(texts)), pa.int64()),
            "text": pa.array(texts),
            "lang": pa.array(["en"] * len(texts)),
            "source": pa.array(["s"] * len(texts)),
            "n_chars": pa.array([len(t) for t in texts], pa.int64()),
        }),
        sf / "documents.parquet",
    )
    md5 = lambda s: hashlib.md5(s.encode()).hexdigest()
    out = {r["doc_id"]: r for r in repetition_strip(str(sf)).take_all()}

    assert (out[0]["n_lines"], out[0]["n_removed"]) == (3, 1)
    assert out[0]["cleaned_md5"] == md5("a b\nc d")
    assert (out[1]["n_lines"], out[1]["n_removed"]) == (3, 2)
    assert out[1]["cleaned_md5"] == md5("a b")
    # Short tail window "z" differs from "x y" — nothing removed.
    assert (out[2]["n_lines"], out[2]["n_removed"]) == (2, 0)
    assert out[2]["cleaned_md5"] == md5("x y\nz")
    # Doc 3 shares lines with doc 0 but has no INTERNAL repeats.
    assert (out[3]["n_lines"], out[3]["n_removed"]) == (2, 0)
    assert out[3]["cleaned_md5"] == md5("a b\nc d")
    assert (out[4]["n_lines"], out[4]["n_removed"]) == (0, 0)
    assert out[4]["cleaned_md5"] == md5("")


def test_quality_classifier_scores_match_manual(ray_session, tmp_path):
    """Frozen linear model: score equals the hand-computed
    occurrence-weighted sum of md5-derived weights; empty docs are
    excluded; keep == (score > 0)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from smart_ocr_ray.functions.hashing import _hash64
    from smart_ocr_ray.ops.text_analysis import (
        FT_BUCKETS,
        ft_weights,
        quality_classifier,
    )

    texts = ["hello world hello", "one", "", "   "]
    sf = tmp_path / "qcsf"; sf.mkdir()
    pq.write_table(
        pa.Table.from_pydict({
            "doc_id": pa.array(range(len(texts)), pa.int64()),
            "text": pa.array(texts),
            "lang": pa.array(["en"] * len(texts)),
            "source": pa.array(["s"] * len(texts)),
            "n_chars": pa.array([len(t) for t in texts], pa.int64()),
        }),
        sf / "documents.parquet",
    )
    w = ft_weights()
    assert w.min() >= -8 and w.max() <= 8 and len(w) == FT_BUCKETS

    def manual(text):
        toks = text.split()
        grams = toks + [" ".join(p) for p in zip(toks, toks[1:])]
        return len(grams), sum(int(w[int(_hash64(g)) % FT_BUCKETS]) for g in grams)

    out = {r["doc_id"]: r for r in quality_classifier(str(sf)).take_all()}
    # Tokenless docs (2: empty, 3: whitespace) emit no row.
    assert set(out) == {0, 1}
    for d in (0, 1):
        n, s = manual(texts[d])
        assert out[d]["n_grams"] == n
        assert out[d]["score"] == s
        assert out[d]["keep"] == (1 if s > 0 else 0)


def test_dsir_resample_matches_manual_rule(ray_session, tmp_path):
    """dsir_resample == the frozen Bernoulli rule applied to
    dsir_weights' output: keep iff weight_bits >= 0 or the
    md5('dsir:'+doc_id) coin lands 0 mod 2^-weight_bits; p_log2 =
    min(weight_bits, 0). The corpus is built so both weight signs
    occur (coin branch exercised, not just the always-keep path)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from smart_ocr_ray.functions.hashing import _hash64
    from smart_ocr_ray.ops.text_analysis import (
        DSIR_MAX_DROP_BITS,
        dsir_resample,
        dsir_weights,
    )

    good = "the data and pipeline of tokens " + " ".join(
        f"clean{i} words the and of" for i in range(12)
    )
    bad = "zzz buy spam now extra junk words here"
    texts = [good] * 4 + [bad] * 6
    sf = tmp_path / "dsirres"; sf.mkdir()
    pq.write_table(
        pa.Table.from_pydict({
            "doc_id": pa.array(range(len(texts)), pa.int64()),
            "text": pa.array(texts),
            "lang": pa.array(["en"] * len(texts)),
            "source": pa.array(["s"] * len(texts)),
            "n_chars": pa.array([len(t) for t in texts], pa.int64()),
        }),
        sf / "documents.parquet",
    )
    weights = {r["doc_id"]: r["weight_bits"] for r in dsir_weights(str(sf)).take_all()}
    assert any(w < 0 for w in weights.values()), "corpus must produce negative weights"
    assert any(w >= 0 for w in weights.values())

    def manual_keep(doc_id: int, wb: int) -> bool:
        if wb >= 0:
            return True
        if wb < -DSIR_MAX_DROP_BITS:
            return False
        return int(_hash64(f"dsir:{doc_id}")) % (1 << -wb) == 0

    expect = {d: wb for d, wb in weights.items() if manual_keep(d, wb)}
    got = {r["doc_id"]: r for r in dsir_resample(str(sf)).take_all()}
    assert set(got) == set(expect)
    for d, r in got.items():
        assert r["weight_bits"] == expect[d]
        assert r["p_log2"] == min(expect[d], 0)


def test_topic_classify_known_answers(ray_session, tmp_path):
    """Engineered docs hit each branch: clear winner, occurrence
    weighting, rank tie-break (storage beats relational on a 1-1 tie),
    zero hits -> 'none', empty text -> 'none'."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from smart_ocr_ray.ops.text_analysis import topic_classify

    texts = [
        "scan column table extras",       # storage 3
        "stream stream fast",             # streaming 2 > tuning 1
        "join scan",                      # 1-1 tie -> storage (rank 0)
        "totally unrelated words xyz",    # none
        "",                               # none (no tokens)
        "join merge group agg row",       # relational 4 > storage 1
    ]
    sf = tmp_path / "topics"; sf.mkdir()
    pq.write_table(
        pa.Table.from_pydict({
            "doc_id": pa.array(range(len(texts)), pa.int64()),
            "text": pa.array(texts),
            "lang": pa.array(["en"] * len(texts)),
            "source": pa.array(["s"] * len(texts)),
            "n_chars": pa.array([len(t) for t in texts], pa.int64()),
        }),
        sf / "documents.parquet",
    )
    got = {r["doc_id"]: (r["topic"], r["n_hits"]) for r in topic_classify(str(sf)).take_all()}
    assert got == {
        0: ("storage", 3),
        1: ("streaming", 2),
        2: ("storage", 1),
        3: ("none", 0),
        4: ("none", 0),
        5: ("relational", 4),
    }


def test_events_anomaly_three_sigma_integer_rule(ray_session, tmp_path):
    """3-sigma hourly burst flags: the exact-boundary hour flags (>=),
    sigma=0 users and single-hour users never flag, and the emitted
    stats are the user's own (n_hours, total_events)."""
    import datetime as dt

    import pyarrow as pa
    import pyarrow.parquet as pq

    from smart_ocr_ray.ops.relational import events_anomaly

    t0 = dt.datetime(2024, 1, 1)
    rows = []  # (user, hour, copies)
    # user 7: counts [1]*9 + [100] → n=10, S=109, nQ-S² = 88209 = 297²,
    # mean+3σ = 10.9 + 89.1 = 100.0 exactly — the >= boundary flags.
    for h in range(9):
        rows.append((7, h, 1))
    rows.append((7, 9, 100))
    # user 8: perfectly regular [5,5,5] — σ=0, strict dev>0 keeps all
    # hours unflagged.
    for h in range(3):
        rows.append((8, h, 5))
    # user 9: a single active hour — n*c-S == 0, never flags.
    rows.append((9, 0, 42))

    eid, ts, uid = [], [], []
    for u, h, copies in rows:
        for i in range(copies):
            eid.append(len(eid))
            ts.append(t0 + dt.timedelta(hours=h, seconds=i))
            uid.append(u)
    sf = tmp_path / "anomsf"; sf.mkdir()
    pq.write_table(
        pa.Table.from_pydict({
            "event_id": pa.array(eid, pa.int64()),
            "ts": pa.array(ts, pa.timestamp("us")),
            "user_id": pa.array(uid, pa.int64()),
            "event_type": pa.array(["click"] * len(eid), pa.string()),
            "value": pa.array([1.0] * len(eid), pa.float64()),
        }),
        sf / "events.parquet",
    )
    got = events_anomaly(str(sf)).take_all()
    assert len(got) == 1
    (r,) = got
    assert r["user_id"] == 7
    assert r["window_start"] == t0 + dt.timedelta(hours=9)
    assert (r["n_events"], r["n_hours"], r["total_events"]) == (100, 10, 109)


def test_events_anomaly_sub_boundary_not_flagged(ray_session, tmp_path):
    """Just under the 3-sigma boundary must NOT flag. For counts
    [1]*(n-1) + [c] the rule collapses to dev² = (n-1)²(c-1)² vs
    9(nQ-S²) = 9(n-1)(c-1)² — i.e. flagged iff n >= 10, for ANY burst
    size c. n = 9 active hours therefore sits strictly under the
    boundary however extreme the burst."""
    import datetime as dt

    import pyarrow as pa
    import pyarrow.parquet as pq

    from smart_ocr_ray.ops.relational import events_anomaly

    t0 = dt.datetime(2024, 1, 1)
    eid, ts = [], []
    for h in range(8):
        eid.append(len(eid)); ts.append(t0 + dt.timedelta(hours=h))
    for i in range(1000):
        eid.append(len(eid)); ts.append(t0 + dt.timedelta(hours=9, seconds=i))
    sf = tmp_path / "anomsf2"; sf.mkdir()
    pq.write_table(
        pa.Table.from_pydict({
            "event_id": pa.array(eid, pa.int64()),
            "ts": pa.array(ts, pa.timestamp("us")),
            "user_id": pa.array([7] * len(eid), pa.int64()),
            "event_type": pa.array(["click"] * len(eid), pa.string()),
            "value": pa.array([1.0] * len(eid), pa.float64()),
        }),
        sf / "events.parquet",
    )
    assert events_anomaly(str(sf)).take_all() == []


def test_mixture_temperature_sqrt_grid(ray_session, tmp_path):
    """alpha=1/2 temperature sampling: perfect-square counts give exact
    closed-form weights; a non-square count matches the independent
    math.isqrt mirror of the frozen rule; boosts straddle 1e6 the
    right way (rare up, dominant down)."""
    import math

    import pyarrow as pa
    import pyarrow.parquet as pq

    from smart_ocr_ray.ops.text_analysis import mixture_temperature

    counts = {"big": 16, "mid": 4, "rare": 1, "odd": 2}
    sources = [s for s, n in counts.items() for _ in range(n)]
    sf = tmp_path / "mtsf"; sf.mkdir()
    pq.write_table(
        pa.Table.from_pydict({
            "doc_id": pa.array(range(len(sources)), pa.int64()),
            "text": pa.array(["tok"] * len(sources)),
            "lang": pa.array(["en"] * len(sources)),
            "source": pa.array(sources),
            "n_chars": pa.array([3] * len(sources), pa.int64()),
        }),
        sf / "documents.parquet",
    )
    got = {
        r["source"]: (r["n_docs"], r["p_e6"], r["boost_e6"])
        for r in mixture_temperature(str(sf)).take_all()
    }
    # Independent mirror of the frozen rule.
    s = {k: math.isqrt(n * 10**10) for k, n in counts.items()}
    S, total = sum(s.values()), sum(counts.values())
    want = {
        k: (n, (10**6 * s[k]) // S, (10**6 * s[k] * total) // (S * n))
        for k, n in counts.items()
    }
    assert got == want
    # Perfect squares land exactly on the 1e5*sqrt(n) grid.
    assert s["big"] == 400_000 and s["rare"] == 100_000
    # sqrt flattening: dominant source down-sampled, rare up-sampled.
    assert got["big"][2] < 1_000_000 < got["rare"][2]
    # Probabilities floor-sum to at most 1e6.
    assert sum(v[1] for v in got.values()) <= 1_000_000


def test_weighted_sample_join_rule_mirror(ray_session, tmp_path):
    """Revenue-weighted Bernoulli sample over lineitem⋈orders: matches
    an independent hashlib/int mirror of the frozen rule; the dominant
    order caps at p_e6 = 1e6 and is always kept."""
    import datetime as dt
    import hashlib

    import pyarrow as pa
    import pyarrow.parquet as pq

    from smart_ocr_ray.ops.relational import weighted_sample_join

    # (orderkey, price, discount) — exact-cent prices, exact-hundredth
    # discounts so revenue_e4 is exact. Order 1 outweighs all others
    # combined → with k=2 its p caps at 1e6.
    lines = [
        (1, 9000.00, 0.00), (1, 1000.00, 0.10),   # rev 9900.0
        (2, 100.00, 0.10),                        # rev 90.0
        (3, 250.00, 0.20),                        # rev 200.0
        (4, 33.33, 0.00),                         # rev 33.33
        (5, 500.00, 0.50),                        # rev 250.0
    ]
    sf = tmp_path / "wsjsf"; sf.mkdir()
    pq.write_table(
        pa.Table.from_pydict({
            "l_orderkey": pa.array([r[0] for r in lines], pa.int64()),
            "l_extendedprice": pa.array([r[1] for r in lines], pa.float64()),
            "l_discount": pa.array([r[2] for r in lines], pa.float64()),
        }),
        sf / "lineitem.parquet",
    )
    t0 = dt.datetime(1995, 1, 1)
    pq.write_table(
        pa.Table.from_pydict({
            "o_orderkey": pa.array([1, 2, 3, 4, 5], pa.int64()),
            "o_orderdate": pa.array(
                [t0 + dt.timedelta(days=i) for i in range(5)], pa.timestamp("us")
            ),
        }),
        sf / "orders.parquet",
    )

    got = {
        r["o_orderkey"]: (r["o_orderdate"], r["revenue_e4"], r["p_e6"])
        for r in weighted_sample_join(str(sf), k=2).take_all()
    }

    # Independent mirror of the frozen rule.
    rev = {}
    for o, price, disc in lines:
        rev[o] = rev.get(o, 0) + round(price * (1 - disc) * 10_000)
    total = sum(rev.values())
    coin = lambda o: int.from_bytes(  # noqa: E731
        hashlib.md5(f"ws:{o}".encode()).digest()[8:16], "little"
    ) % 1_000_000
    want = {
        o: (t0 + dt.timedelta(days=o - 1), r, min(1_000_000, (1_000_000 * 2 * r) // total))
        for o, r in rev.items()
        if coin(o) < min(1_000_000, (1_000_000 * 2 * r) // total)
    }
    assert got == want
    # The dominant order saturates the cap and always survives the coin.
    assert got[1][2] == 1_000_000


def test_events_anomaly_shard_invariant(ray_session, tmp_path):
    """The 3-sigma flags are invariant to input sharding: one shard vs
    many shards of the same events produce identical rows (the hourly
    partial-combine and the user-keyed group map both re-key globally)."""
    import datetime as dt

    import pyarrow as pa
    import pyarrow.parquet as pq

    from smart_ocr_ray.ops.relational import events_anomaly

    t0 = dt.datetime(2024, 1, 1)
    eid, ts, uid = [], [], []
    # 6 users with mixed profiles: bursty (flag), regular, sparse.
    for u in range(6):
        for h in range(12):
            copies = 40 if (h == 11 and u % 2 == 0) else (u % 3) + 1
            for i in range(copies):
                eid.append(len(eid))
                ts.append(t0 + dt.timedelta(hours=h, seconds=i))
                uid.append(u)
    table = pa.Table.from_pydict({
        "event_id": pa.array(eid, pa.int64()),
        "ts": pa.array(ts, pa.timestamp("us")),
        "user_id": pa.array(uid, pa.int64()),
        "event_type": pa.array(["click"] * len(eid), pa.string()),
        "value": pa.array([1.0] * len(eid), pa.float64()),
    })

    outs = []
    for n_shards, name in ((1, "one"), (7, "many")):
        sf = tmp_path / f"anominv_{name}"; sf.mkdir()
        d = sf / "events.parquet"; d.mkdir()
        step = (len(eid) + n_shards - 1) // n_shards
        for s in range(n_shards):
            pq.write_table(
                table.slice(s * step, step), d / f"part-{s}.parquet"
            )
        outs.append(
            sorted(
                (tuple(r.values()) for r in events_anomaly(str(sf)).take_all())
            )
        )
    assert outs[0] == outs[1]
    assert len(outs[0]) > 0  # the bursty users actually flag


def test_sample_stratified_k_rule_mirror_and_shards(ray_session, tmp_path):
    """Exact-k-per-stratum sample: matches an independent hashlib
    mirror of the per-language bottom-k rule, under-k strata keep all
    their docs, and the result is invariant to input sharding (the
    per-block combiner composes exactly)."""
    import hashlib

    import pyarrow as pa
    import pyarrow.parquet as pq

    from smart_ocr_ray.ops.text_analysis import sample_stratified_k

    # 3 strata: two with > k docs, one with fewer than k.
    langs = ["en"] * 9 + ["de"] * 7 + ["zh"] * 2
    table = pa.Table.from_pydict({
        "doc_id": pa.array(range(len(langs)), pa.int64()),
        "text": pa.array(["tok"] * len(langs)),
        "lang": pa.array(langs),
        "source": pa.array(["s"] * len(langs)),
        "n_chars": pa.array([3] * len(langs), pa.int64()),
    })

    h = lambda d: int.from_bytes(  # noqa: E731
        hashlib.md5(str(d).encode()).digest()[8:16], "little"
    )
    k = 4
    want = set()
    for lang in set(langs):
        ids = sorted(
            (d for d, l in enumerate(langs) if l == lang),
            key=lambda d: (h(d), d),
        )
        want |= {(d, lang, r + 1) for r, d in enumerate(ids[:k])}

    outs = []
    for n_shards, name in ((1, "one"), (5, "many")):
        sf = tmp_path / f"ssk_{name}"; sf.mkdir()
        d = sf / "documents.parquet"; d.mkdir()
        step = (len(langs) + n_shards - 1) // n_shards
        for s in range(n_shards):
            pq.write_table(table.slice(s * step, step), d / f"part-{s}.parquet")
        outs.append({
            (r["doc_id"], r["lang"], r["sample_rank"])
            for r in sample_stratified_k(str(sf), k=k).take_all()
        })
    assert outs[0] == want
    assert outs[1] == want
    # The under-k stratum keeps both docs (ranks 1..2).
    assert sum(1 for t in want if t[1] == "zh") == 2


def test_link_triangles_topology_and_fixture_mirror(ray_session, tmp_path):
    """Triangle counts: a 4-clique gives every member exactly 3
    triangles, paths and isolated pages emit nothing, a dangling-link
    corpus is empty, and the fixture graph matches a brute-force
    triple-loop mirror over the same DOM-harvested edges."""
    from itertools import combinations

    import pyarrow as pa
    import pyarrow.parquet as pq

    from smart_ocr_ray.fixtures import generate_pages
    from smart_ocr_ray.functions.assess import sniff_doc_kind
    from smart_ocr_ray.ops.links import _host, link_triangles, page_hrefs

    def page(body):
        return f"<html><body>{body}</body></html>".encode()

    def links(*names):
        return "".join(f'<a href="/{n}">{n}</a> ' for n in names)

    # 4-clique a..d (one direction per pair suffices — undirected),
    # path x—y—z (wedges but no closing edge), isolated lone page.
    rows = [
        ("https://h.test/a", page(links("b", "c", "d"))),
        ("https://h.test/b", page(links("c", "d"))),
        ("https://h.test/c", page(links("d"))),
        ("https://h.test/d", page("leaf")),
        ("https://h.test/x", page(links("y"))),
        ("https://h.test/y", page(links("z"))),
        ("https://h.test/z", page("end")),
        ("https://h.test/lone", page("nothing")),
    ]
    pdir = tmp_path / "tri0"; pdir.mkdir()
    pq.write_table(
        pa.Table.from_pydict({
            "url": pa.array([r[0] for r in rows], pa.string()),
            "html": pa.array([r[1] for r in rows], pa.binary()),
        }),
        pdir / "pages.parquet",
    )
    got = {r["url"]: r["n_triangles"]
           for r in link_triangles(str(pdir)).take_all()}
    assert got == {f"https://h.test/{n}": 3 for n in "abcd"}

    # Dangling-link corpus → no edges → empty.
    rows_d = [("https://h.test/p", page(links("gone")))]
    pdir_d = tmp_path / "trid"; pdir_d.mkdir()
    pq.write_table(
        pa.Table.from_pydict({
            "url": pa.array([r[0] for r in rows_d], pa.string()),
            "html": pa.array([r[1] for r in rows_d], pa.binary()),
        }),
        pdir_d / "pages.parquet",
    )
    assert link_triangles(str(pdir_d)).take_all() == []

    # Fixture corpus vs brute-force mirror.
    n = 30
    table = generate_pages(n)
    pdir2 = tmp_path / "tri1"; pdir2.mkdir()
    pq.write_table(table, pdir2 / "pages.parquet")

    urls, htmls = table.column("url").to_pylist(), table.column("html").to_pylist()
    nodes = [u for u, h in zip(urls, htmls) if sniff_doc_kind(h or b"") == "html"]
    node_set = set(nodes)
    adj = {u: set() for u in nodes}
    for u, h in zip(urls, htmls):
        if u not in node_set:
            continue
        for href in page_hrefs(h or b""):
            if not href.startswith("/"):
                continue
            dst = _host(u) + href
            if dst in node_set and dst != u:
                adj[u].add(dst); adj[dst].add(u)
    want = {}
    for a, b, c in combinations(sorted(nodes), 3):
        if b in adj[a] and c in adj[a] and c in adj[b]:
            for x in (a, b, c):
                want[x] = want.get(x, 0) + 1
    got2 = {r["url"]: r["n_triangles"]
            for r in link_triangles(str(pdir2)).take_all()}
    assert got2 == want
    assert sum(want.values()) % 3 == 0 and want  # sanity: triangles exist


def test_events_decayed_q40_exact(ray_session, tmp_path):
    """Decayed counters: hand-computed Q40 values — the horizon hour
    contributes c<<40, each hour of lag halves the shift, lags beyond
    40 floor to 0 but still count toward n_hours."""
    import datetime as dt

    import pyarrow as pa
    import pyarrow.parquet as pq

    from smart_ocr_ray.ops.relational import events_decayed

    t0 = dt.datetime(2024, 1, 1)  # epoch-aligned hours
    rows = [  # (user, hour, copies)
        (7, 100, 3),   # horizon hour (global max) → 3 << 40
        (7, 99, 5),    # lag 1 → 5 << 39
        (7, 58, 1),    # lag 42 > 40 → contributes 0, still an active hour
        (8, 60, 2),    # lag 40 → 2 << 0 = 2 (the boundary survives)
        (9, 10, 9),    # lag 90 → 0; single fully-decayed user
    ]
    eid, ts, uid = [], [], []
    for u, h, copies in rows:
        for i in range(copies):
            eid.append(len(eid))
            ts.append(t0 + dt.timedelta(hours=h, seconds=i))
            uid.append(u)
    sf = tmp_path / "decsf"; sf.mkdir()
    pq.write_table(
        pa.Table.from_pydict({
            "event_id": pa.array(eid, pa.int64()),
            "ts": pa.array(ts, pa.timestamp("us")),
            "user_id": pa.array(uid, pa.int64()),
            "event_type": pa.array(["click"] * len(eid), pa.string()),
            "value": pa.array([1.0] * len(eid), pa.float64()),
        }),
        sf / "events.parquet",
    )
    got = {
        r["user_id"]: (r["decayed_q40"], r["n_hours"])
        for r in events_decayed(str(sf)).take_all()
    }
    assert got == {
        7: ((3 << 40) + (5 << 39), 3),
        8: (2, 1),
        9: (0, 1),
    }


def test_trending_terms_exact_rate_rule(ray_session, tmp_path):
    """Trending score is the denominator-cleared rate comparison:
    a term with more NEW occurrences but a LOWER new rate must score
    negative; the noise floor drops low-support terms; ties order by
    term."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from smart_ocr_ray.ops.text_analysis import trending_terms

    # doc 0 (OLD, even id), doc 1 (NEW, odd id).
    # T_old = 10 tokens, T_new = 40 tokens.
    # 'up':   old 0, new 8  → score 8*10 - 0      = 80     (rising)
    # 'flat': old 2, new 8  → score 8*10 - 2*40   = 0      (same rate)
    # 'down': old 5, new 6  → score 6*10 - 5*40   = -140   (more hits,
    #         lower rate — the float-free comparison catches it)
    # 'rare': old 0, new 4  → dropped (c_new < 5)
    old = " ".join(["flat"] * 2 + ["down"] * 5 + ["pad"] * 3)
    new = " ".join(["up"] * 8 + ["flat"] * 8 + ["down"] * 6 + ["rare"] * 4 + ["pad"] * 14)
    sf = tmp_path / "trsf"; sf.mkdir()
    pq.write_table(
        pa.Table.from_pydict({
            "doc_id": pa.array([0, 1], pa.int64()),
            "text": pa.array([old, new]),
            "lang": pa.array(["en", "en"]),
            "source": pa.array(["s", "s"]),
            "n_chars": pa.array([len(old), len(new)], pa.int64()),
        }),
        sf / "documents.parquet",
    )
    got = [
        (r["term"], r["c_old"], r["c_new"], r["score"])
        for r in trending_terms(str(sf), k=10).take_all()
    ]
    assert got == [
        ("up", 0, 8, 80),
        ("pad", 3, 14, 14 * 10 - 3 * 40),  # 20
        ("flat", 2, 8, 0),
        ("down", 5, 6, -140),
    ]


def test_rrf_fuse_mirror_of_input_rankings(ray_session):
    """RRF fusion equals a pure-Python mirror built from the two input
    rankers' own outputs: contributions 1e9//(60+rank) summed per
    (query, doc), top-10 by (score desc, vec_id asc), 1-based ranks,
    n_lists = rankers returning the doc."""
    from collections import defaultdict

    from smart_ocr_ray.ops.similarity import ann_cosine_topk, ivf_topk, rrf_fuse

    a = ann_cosine_topk(SF).take_all()
    b = ivf_topk(SF).take_all()
    score: dict = defaultdict(int)
    nlists: dict = defaultdict(int)
    for rows in (a, b):
        for r in rows:
            key = (r["query_id"], r["vec_id"])
            score[key] += 1_000_000_000 // (60 + r["rank"])
            nlists[key] += 1
    want = []
    for q in sorted({k[0] for k in score}):
        docs = sorted(
            (k[1] for k in score if k[0] == q),
            key=lambda v: (-score[(q, v)], v),
        )[:10]
        want += [
            (q, v, score[(q, v)], nlists[(q, v)], i + 1)
            for i, v in enumerate(docs)
        ]
    got = [
        (r["query_id"], r["vec_id"], r["rrf_e9"], r["n_lists"], r["rank"])
        for r in rrf_fuse(SF).take_all()
    ]
    assert got == want
    # Agreement between rankers exists: some doc fused from both lists.
    assert any(n == 2 for (_, _, _, n, _) in got)


def test_dedup_weights_cluster_sizes(ray_session, tmp_path):
    """Soft-dedup weights: a 3-clone cluster gets size 3 / weight
    333333 for every member, unique docs get 1 / 1e6, and a corpus
    with no near-dups takes the branch where everything is a
    singleton."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from smart_ocr_ray.ops.dedup import dedup_weights

    clone = (
        "the quick brown fox jumps over the lazy dog again and again "
        "while the slow green turtle watches from the muddy river bank"
    )
    texts = [
        clone, clone, clone,
        "completely different content about distributed query engines and arrow",
        "yet another unrelated document discussing tokenizer training corpora",
    ]

    def write(sf, tt):
        sf.mkdir()
        pq.write_table(
            pa.Table.from_pydict({
                "doc_id": pa.array(range(len(tt)), pa.int64()),
                "text": pa.array(tt),
                "lang": pa.array(["en"] * len(tt)),
                "source": pa.array(["s"] * len(tt)),
                "n_chars": pa.array([len(t) for t in tt], pa.int64()),
            }),
            sf / "documents.parquet",
        )

    sf = tmp_path / "dwsf"; write(sf, texts)
    got = {
        r["doc_id"]: (r["cluster_size"], r["weight_e6"])
        for r in dedup_weights(str(sf)).take_all()
    }
    assert got == {
        0: (3, 333_333), 1: (3, 333_333), 2: (3, 333_333),
        3: (1, 1_000_000), 4: (1, 1_000_000),
    }

    sf2 = tmp_path / "dwsf2"; write(sf2, texts[3:])
    got2 = {
        r["doc_id"]: (r["cluster_size"], r["weight_e6"])
        for r in dedup_weights(str(sf2)).take_all()
    }
    assert got2 == {0: (1, 1_000_000), 1: (1, 1_000_000)}


def test_cli_query_runs_registered_pipeline(ray_session, tmp_path):
    """`cli query` lists the registry, runs a Dataset query and a
    pandas query by name, writes parquet, and rejects unknown names."""
    import io
    from contextlib import redirect_stdout

    import pyarrow.parquet as pq

    from smart_ocr_ray import cli

    buf = io.StringIO()
    with redirect_stdout(buf):
        assert cli.main(["query", "--list"]) == 0
    names = buf.getvalue().split()
    assert "pricing_summary" in names and "dedup_exact" in names

    out = tmp_path / "q_out"
    buf = io.StringIO()
    with redirect_stdout(buf):
        rc = cli.main([
            "query", "dedup_exact", "--sf", SF, "--output", str(out),
        ])
    assert rc == 0
    summary = json.loads(buf.getvalue().strip().splitlines()[-1])
    assert summary["rows"] == 500
    written = pq.read_table(str(out))
    assert written.num_rows == 500
    assert set(written.column_names) == {"text_md5", "doc_id"}

    assert cli.main(["query", "no_such_query", "--sf", SF]) == 2


def test_corpus_profile_nulls_and_extremes(ray_session, tmp_path):
    """Profile rows: exact distinct counts (text via md5), null
    exclusion from distinct/min-max but inclusion in n_nulls, numeric
    vs lexicographic extremes, '' for text min/max."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from smart_ocr_ray.ops.text_analysis import corpus_profile

    sf = tmp_path / "cpsf"; sf.mkdir()
    pq.write_table(
        pa.Table.from_pydict({
            "doc_id": pa.array([2, 10, 9, 4], pa.int64()),
            "text": pa.array(["same", "same", None, "other"]),
            "lang": pa.array(["en", None, "de", "en"]),
            "source": pa.array(["b", "a", "a", "c"]),
            "n_chars": pa.array([4, 4, None, 5], pa.int64()),
        }),
        sf / "documents.parquet",
    )
    got = {
        r["column"]: (
            r["n_rows"], r["n_nulls"], r["n_distinct"],
            r["min_value"], r["max_value"],
        )
        for r in corpus_profile(str(sf)).take_all()
    }
    assert got == {
        # numeric extremes, not lexicographic: min 2, max 10.
        "doc_id": (4, 0, 4, "2", "10"),
        "lang": (4, 1, 2, "de", "en"),
        "n_chars": (4, 1, 2, "4", "5"),
        "source": (4, 0, 3, "a", "c"),
        "text": (4, 1, 2, "", ""),
    }


def test_winnow_containment_quote_page(ray_session, tmp_path):
    """A short page quoted verbatim inside a much longer one reaches
    containment >= 0.8 of its own fingerprint set even though the
    symmetric winnow_pairs overlap view treats the pair like any
    near-dup; an unrelated page emits nothing."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from smart_ocr_ray.ops.dedup import winnow_containment

    quote = (
        "the committee concluded that the proposed amendment to the "
        "charter would require a two thirds majority of all voting "
        "members present at the annual assembly in order to pass"
    )
    filler = " ".join(
        f"unique host filler sentence number {i} with distinct trailing content"
        for i in range(40)
    )
    texts = [
        quote,                       # doc 0: the contained page
        filler + " " + quote + " " + filler[::-1],  # doc 1: hosts the quote
        "an entirely unrelated document about spherical codebook training",
    ]
    sf = tmp_path / "wcsf"; sf.mkdir()
    pq.write_table(
        pa.Table.from_pydict({
            "doc_id": pa.array(range(len(texts)), pa.int64()),
            "text": pa.array(texts),
            "lang": pa.array(["en"] * 3),
            "source": pa.array(["s"] * 3),
            "n_chars": pa.array([len(t) for t in texts], pa.int64()),
        }),
        sf / "documents.parquet",
    )
    got = {
        (r["inner_id"], r["outer_id"]): (r["cont_e6"], r["n_shared"], r["fp_inner"])
        for r in winnow_containment(str(sf)).take_all()
    }
    assert set(got) == {(0, 1)}
    cont, shared, fp_inner = got[(0, 1)]
    assert cont >= 800_000
    assert shared <= fp_inner  # containment is a ratio of the inner set


def test_page_structure_tag_semantics(ray_session, tmp_path):
    """Structure profile: attributes and self-closing tags count as
    start tags, only the FIRST title's immediate text is captured,
    titleless pages get '', and non-html payloads are excluded."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from smart_ocr_ray.ops.links import page_structure

    rows = [
        (
            "https://h.test/a",
            b'<html><head><title>First Page</title></head><body>'
            b'<h1>A</h1><h2 class="x">B</h2><h3>C</h3>'
            b'<p>one</p><p id="2">two</p><img src="/i.png"/>'
            b'<table><tr><td>c</td></tr></table>'
            b'<a href="/b">x</a><a>anchor without href</a>'
            b'<title>second ignored</title></body></html>',
        ),
        ("https://h.test/b", b"<html><body><p>no title here</p></body></html>"),
        ("https://h.test/bin", b"%FIX-LAYOUT\x00binary payload"),
    ]
    pdir = tmp_path / "psdir"; pdir.mkdir()
    pq.write_table(
        pa.Table.from_pydict({
            "url": pa.array([r[0] for r in rows], pa.string()),
            "html": pa.array([r[1] for r in rows], pa.binary()),
        }),
        pdir / "pages.parquet",
    )
    got = {r["url"]: r for r in page_structure(str(pdir)).take_all()}
    assert set(got) == {"https://h.test/a", "https://h.test/b"}
    a = got["https://h.test/a"]
    assert a["title"] == "First Page"
    assert (a["n_headings"], a["n_paragraphs"], a["n_tables"]) == (3, 2, 1)
    assert (a["n_images"], a["n_anchors"]) == (1, 2)
    assert got["https://h.test/b"]["title"] == ""


def test_length_quality_spearman_exact_poles(ray_session, tmp_path):
    """Spearman poles are exact on the integer grid: strictly reversed
    rankings give rho_e6 == -1e6 (sum d^2 hits n(n^2-1)/3 exactly),
    aligned rankings give +1e6."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from smart_ocr_ray.ops.text_analysis import length_quality_spearman

    def write(sf, texts):
        sf.mkdir()
        pq.write_table(
            pa.Table.from_pydict({
                "doc_id": pa.array(range(len(texts)), pa.int64()),
                "text": pa.array(texts),
                "lang": pa.array(["en"] * len(texts)),
                "source": pa.array(["s"] * len(texts)),
                "n_chars": pa.array([len(t) for t in texts], pa.int64()),
            }),
            sf / "documents.parquet",
        )

    # Anti-correlated: longer docs have strictly lower stopword share.
    # doc i: (i+1)*4 tokens, of which exactly 2 are stopwords.
    anti = [
        " ".join(["the", "and"] + ["zz"] * ((i + 1) * 4 - 2)) for i in range(6)
    ]
    sf1 = tmp_path / "sp_anti"; write(sf1, anti)
    (r1,) = length_quality_spearman(str(sf1)).take_all()
    assert (r1["n_docs"], r1["rho_e6"]) == (6, -1_000_000)
    assert r1["sum_d2"] == 6 * (36 - 1) // 3  # n(n^2-1)/3

    # Aligned: longer docs also have strictly higher stopword share.
    # doc i: 20 tokens, i+1 of them stopwords... length must also grow:
    # tokens = 10 + i, stopwords = 2 + i (density strictly rising).
    pos = [
        " ".join(["the"] * (2 + i) + ["zz"] * (8 - 2)) + " " + " ".join(["qq"] * i)
        for i in range(5)
    ]
    # recompute honestly: doc i has (2+i) stops of (2+i+6+i) = 8+2i tokens
    # density (2+i)/(8+2i) strictly increasing; tokens strictly increasing.
    sf2 = tmp_path / "sp_pos"; write(sf2, pos)
    (r2,) = length_quality_spearman(str(sf2)).take_all()
    assert (r2["n_docs"], r2["sum_d2"], r2["rho_e6"]) == (5, 0, 1_000_000)


def test_setjoin_pairs_matches_bruteforce(ray_session, tmp_path):
    """Prefix-filtered set-similarity join equals the brute-force
    all-pairs answer (losslessness of the prefix filter): exact jac_e6
    on an engineered corpus with a clear near-dup (one token edited),
    an identical-text pair (jac exactly 1e6), a sub-threshold pair and
    a too-short doc (< 5 tokens, no set, never pairs)."""
    from itertools import combinations

    import pyarrow as pa
    import pyarrow.parquet as pq

    from smart_ocr_ray.functions.hashing import _hash64
    from smart_ocr_ray.ops.dedup import setjoin_pairs

    base_toks = [f"tok{i}alpha" for i in range(50)]
    near = base_toks[:-1] + ["EDITED"]
    far = [t if i % 4 else "CHANGED%d" % i for i, t in enumerate(base_toks)]
    texts = [
        " ".join(base_toks),          # 0
        " ".join(near),               # 1: one-token edit of 0
        " ".join(base_toks),          # 2: byte-identical to 0
        " ".join(far),                # 3: heavily edited (sub-threshold)
        "only four tokens here"[:21], # 4: < 5 tokens, no set
        "completely unrelated words " + " ".join(f"z{i}" for i in range(30)),  # 5
    ]
    sf = tmp_path / "sjsf"; sf.mkdir()
    pq.write_table(
        pa.Table.from_pydict({
            "doc_id": pa.array(range(len(texts)), pa.int64()),
            "text": pa.array(texts),
            "lang": pa.array(["en"] * len(texts)),
            "source": pa.array(["s"] * len(texts)),
            "n_chars": pa.array([len(t) for t in texts], pa.int64()),
        }),
        sf / "documents.parquet",
    )

    M = 1 << 63
    sets = {}
    for i, t in enumerate(texts):
        toks = t.split()
        if len(toks) < 5:
            continue
        sets[i] = {
            int(_hash64(" ".join(toks[j:j + 5]))) % M
            for j in range(len(toks) - 4)
        }
    expected = {}
    for a, b in combinations(sorted(sets), 2):
        inter = len(sets[a] & sets[b])
        union = len(sets[a] | sets[b])
        if union and 10 * inter >= 7 * union:
            expected[(a, b)] = (1_000_000 * inter) // union

    got = {
        (r["left_id"], r["right_id"]): r["jac_e6"]
        for r in setjoin_pairs(str(sf)).take_all()
    }
    assert got == expected
    assert got[(0, 2)] == 1_000_000      # identical sets
    assert 700_000 <= got[(0, 1)] < 1_000_000  # the one-token edit
    assert (0, 3) not in got             # sub-threshold
    assert all(4 not in pair for pair in got)


def test_setjoin_hot_bucket_star_collapse(ray_session, tmp_path):
    """A degenerate corpus (70 byte-identical docs > HOT_BUCKET_LIMIT)
    engages the shared guard: identical sets collapse to an id-min
    star — 69 pairs at jac exactly 1e6, linear not O(m^2)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from smart_ocr_ray.ops.dedup import setjoin_pairs

    text = " ".join(f"w{i}" for i in range(30))
    n = 70
    sf = tmp_path / "sjhot"; sf.mkdir()
    pq.write_table(
        pa.Table.from_pydict({
            "doc_id": pa.array(range(n), pa.int64()),
            "text": pa.array([text] * n),
            "lang": pa.array(["en"] * n),
            "source": pa.array(["s"] * n),
            "n_chars": pa.array([len(text)] * n, pa.int64()),
        }),
        sf / "documents.parquet",
    )
    rows = setjoin_pairs(str(sf)).take_all()
    assert len(rows) == n - 1
    assert all(r["left_id"] == 0 and r["jac_e6"] == 1_000_000 for r in rows)
    assert sorted(r["right_id"] for r in rows) == list(range(1, n))


def test_embedding_lsh_all_star_pending_branch(ray_session, tmp_path):
    """70 byte-identical embeddings: every candidate pair is a star
    verdict from the hot-bucket guard, so the pending-verify side is
    empty — the op must branch around the pair joins (Ray 2.49 renders
    all-empty datasets schema-less) and return the 69 star pairs."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from smart_ocr_ray.ops.similarity import embedding_neardup_lsh

    n, dim = 70, 64
    vec = [0.25] * dim
    sf = tmp_path / "lshstar"; sf.mkdir()
    pq.write_table(
        pa.Table.from_pydict({
            "vec_id": pa.array(range(n), pa.int64()),
            "embedding": pa.array([vec] * n, pa.list_(pa.float32())),
            "label": pa.array([0] * n, pa.int32()),
        }),
        sf / "embeddings.parquet",
    )
    rows = embedding_neardup_lsh(str(sf)).take_all()
    assert len(rows) == n - 1
    assert all(r["left_id"] == 0 and r["cos_sim_e3"] == 1000 for r in rows)


def test_bitext_mine_margin_rule_mirror(ray_session, tmp_path):
    """Margin mining matches an independent numpy mirror of the rule on
    an engineered corpus: a true translation pair clears the ratio
    margin, a hub vector (near everything) is suppressed even though
    its raw cosine is high, and a zero-norm vector is excluded."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    from smart_ocr_ray.ops.similarity import bitext_mine

    rng_dim = 8
    def unit(*coords):
        v = np.zeros(rng_dim); v[list(range(len(coords)))] = coords
        return v.tolist()

    # en side: 0 = aligned with de vec 10 (a true translation pair,
    # orthogonal to the hub direction); 1/4/5/6 = a cluster sitting ON
    # the hub direction; 2 = zero vector (excluded).
    # de side: 10 = translation of 0; 11-14 = hub twins. Every hub-
    # cluster vector's best match is a hub twin at cosine ~1, but its
    # top-4 NN sums on BOTH sides are also ~1, so the ratio margin
    # ~2/(1+1) ~ 1.0 < 1.2 suppresses it; the aligned pair's NN sums
    # are dominated by low off-pair cosines, so its margin is high.
    vecs = {
        0: unit(0.0, 0.0, 1.0, 0.02), 2: [0.0] * rng_dim,
        1: unit(1.0, 0.95), 4: unit(0.99, 0.96), 5: unit(1.0, 0.94, 0.01),
        6: unit(0.98, 0.95, 0.0, 0.01),
        10: unit(0.0, 0.0, 0.99, 0.03),
        11: unit(1.0, 0.95, 0.005), 12: unit(0.99, 0.945, 0.0, 0.005),
        13: unit(1.0, 0.96), 14: unit(0.985, 0.95, 0.01),
    }
    langs = {i: ("en" if i < 10 else "de") for i in vecs}
    ids = sorted(vecs)
    sf = tmp_path / "btsf"; sf.mkdir()
    pq.write_table(
        pa.Table.from_pydict({
            "doc_id": pa.array(ids, pa.int64()),
            "text": pa.array(["x y z w v u t s"] * len(ids)),
            "lang": pa.array([langs[i] for i in ids]),
            "source": pa.array(["s"] * len(ids)),
            "n_chars": pa.array([15] * len(ids), pa.int64()),
        }),
        sf / "documents.parquet",
    )
    pq.write_table(
        pa.Table.from_pydict({
            "vec_id": pa.array(ids, pa.int64()),
            "embedding": pa.array([vecs[i] for i in ids], pa.list_(pa.float32())),
            "label": pa.array([0] * len(ids), pa.int32()),
        }),
        sf / "embeddings.parquet",
    )

    # independent mirror of the integer rule
    k, thr = 4, 1_200_000
    q = {
        i: np.round(np.array(vecs[i], dtype=np.float32).astype(np.float64) * 1e6).astype(np.int64)
        for i in ids
    }
    a_ids = [i for i in ids if langs[i] == "en" and (q[i] ** 2).sum() > 0]
    b_ids = [i for i in ids if langs[i] == "de" and (q[i] ** 2).sum() > 0]
    sim = {}
    for ai in a_ids:
        for bi in b_ids:
            dot = float((q[ai] * q[bi]).sum())
            den = np.sqrt(float((q[ai] ** 2).sum()) * float((q[bi] ** 2).sum()))
            sim[(ai, bi)] = int(np.floor(dot / den * 1e6))
    expected = {}
    for ai in a_ids:
        row = sorted(((sim[(ai, bi)], -bi) for bi in b_ids), reverse=True)
        best_sim, best_b = row[0][0], -row[0][1]
        dsrc = sum(s for s, _ in row[:k])
        col = sorted((sim[(aj, best_b)] for aj in a_ids), reverse=True)
        dtgt = sum(col[:k])
        num, den = 8_000_000 * best_sim, dsrc + dtgt
        if den > 0 and num >= thr * den:
            expected[ai] = (best_b, best_sim, num // den)

    got = {
        r["src_id"]: (r["tgt_id"], r["sim_e6"], r["margin_e6"])
        for r in bitext_mine(str(sf)).take_all()
    }
    assert got == expected
    assert set(got) == {0} and got[0][0] == 10  # only the aligned pair
    assert 2 not in got                   # zero-norm excluded
    # every hub-cluster vector is suppressed by the ratio margin even
    # though its best cosine (~1.0) beats the mined pair's
    assert all(i not in got for i in (1, 4, 5, 6))


def test_passage_chunks_boundary_arithmetic(ray_session, tmp_path):
    """Window/stride boundary rule: n <= 64 gives ONE chunk (short
    last), n = 65 gives two (second starts at 48, 17 tokens), empty
    docs emit nothing; fingerprints are md5 of the space-joined
    window."""
    import hashlib

    import pyarrow as pa
    import pyarrow.parquet as pq

    from smart_ocr_ray.ops.text_analysis import passage_chunks

    toks65 = [f"t{i}" for i in range(65)]
    texts = [" ".join(toks65[:64]), " ".join(toks65), "", " ".join(toks65[:10])]
    sf = tmp_path / "pcsf"; sf.mkdir()
    pq.write_table(
        pa.Table.from_pydict({
            "doc_id": pa.array(range(len(texts)), pa.int64()),
            "text": pa.array(texts),
            "lang": pa.array(["en"] * len(texts)),
            "source": pa.array(["s"] * len(texts)),
            "n_chars": pa.array([len(t) for t in texts], pa.int64()),
        }),
        sf / "documents.parquet",
    )
    rows = sorted(
        ((r["doc_id"], r["chunk_id"], r["start_tok"], r["n_tokens"], r["chunk_md5"])
         for r in passage_chunks(str(sf)).take_all())
    )
    md5 = lambda ts: hashlib.md5(" ".join(ts).encode()).hexdigest()  # noqa: E731
    assert rows == [
        (0, 0, 0, 64, md5(toks65[:64])),
        (1, 0, 0, 64, md5(toks65[:64])),
        (1, 1, 48, 17, md5(toks65[48:65])),
        (3, 0, 0, 10, md5(toks65[:10])),
    ]


def _lpa_mirror(und_pairs, n_rounds):
    """Sequential synchronous LPA mirror: und_pairs is the DISTINCT
    undirected (node, peer) set; label <- most frequent neighbor label,
    ties -> smallest; n_rounds synchronous rounds."""
    from collections import Counter, defaultdict

    nbrs = defaultdict(list)
    for a, b in und_pairs:
        nbrs[a].append(b)
    lab = {v: v for v in nbrs}
    for _ in range(n_rounds):
        new = {}
        for v, ns in nbrs.items():
            cnt = Counter(lab[p] for p in ns)
            m = max(cnt.values())
            new[v] = min(l for l, c in cnt.items() if c == m)
        lab = new
    return lab


def test_lpa_labels_matches_sequential_mirror(ray_session):
    """Distributed LPA core == the sequential synchronous recurrence
    on a bridge-of-triangles graph (the shape where communities differ
    from connected components: one component, two vote clusters)."""
    import pyarrow as pa
    import ray.data

    from smart_ocr_ray.ops.links import lpa_labels

    tri1 = [(1, 2), (2, 3), (1, 3)]
    tri2 = [(10, 11), (11, 12), (10, 12)]
    bridge = [(3, 10)]
    und = set()
    for a, b in tri1 + tri2 + bridge:
        und.add((a, b)); und.add((b, a))

    und_ds = ray.data.from_arrow(
        pa.table({
            "node": pa.array([p[0] for p in sorted(und)], pa.int64()),
            "peer": pa.array([p[1] for p in sorted(und)], pa.int64()),
        })
    ).repartition(3)

    for n_rounds in (1, 2, 3):
        got = {
            r["node"]: r["label"]
            for r in lpa_labels(und_ds, n_rounds, jp=2).take_all()
        }
        assert got == _lpa_mirror(und, n_rounds), f"n_rounds={n_rounds}"
    # after 2 rounds the triangles are distinct communities despite
    # being one connected component
    got2 = {
        r["node"]: r["label"]
        for r in lpa_labels(und_ds, 2, jp=2).take_all()
    }
    assert len({got2[1], got2[2], got2[3]} & {got2[10], got2[11], got2[12]}) == 0


def test_link_communities_fixture_matches_mirror(ray_session, tmp_path):
    """link_communities over the fixture corpus == the sequential LPA
    mirror over the same DOM-harvested distinct undirected edges;
    edge-less html pages are singletons; zero-edge corpus all-singleton."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from smart_ocr_ray.fixtures import generate_pages
    from smart_ocr_ray.functions.assess import sniff_doc_kind
    from smart_ocr_ray.functions.hashing import _hash64
    from smart_ocr_ray.ops.links import _host, link_communities, page_hrefs

    M = 2**63
    n = 30
    table = generate_pages(n)
    pdir = tmp_path / "pages_lpa"; pdir.mkdir()
    pq.write_table(table, pdir / "pages.parquet")

    urls, htmls = table.column("url").to_pylist(), table.column("html").to_pylist()
    nodes = [u for u, h in zip(urls, htmls) if sniff_doc_kind(h or b"") == "html"]
    node_set = set(nodes)
    ids = {u: int(_hash64(u)) % M for u in nodes}
    und = set()
    for u, h in zip(urls, htmls):
        if u not in node_set:
            continue
        for href in page_hrefs(h or b""):
            if href.startswith("/"):
                dst = _host(u) + href
                if dst in node_set:
                    und.add((ids[u], ids[dst])); und.add((ids[dst], ids[u]))
    mirror = _lpa_mirror(und, 2)
    want = {u: mirror.get(ids[u], ids[u]) for u in nodes}

    got = {r["url"]: r["community_id"]
           for r in link_communities(str(pdir)).take_all()}
    assert got == want
    # sanity: communities are FINER than components on this corpus
    assert len(set(got.values())) >= len(set(want.values()))

    # zero-edge corpus: every page its own community
    def page(body):
        return f"<html><body>{body}</body></html>".encode()

    rows_d = [
        ("https://h.test/x", page('<a href="/nowhere">gone</a>')),
        ("https://h.test/y", page("plain")),
    ]
    pdir_d = tmp_path / "pages_lpa0"; pdir_d.mkdir()
    pq.write_table(
        pa.Table.from_pydict({
            "url": pa.array([r[0] for r in rows_d], pa.string()),
            "html": pa.array([r[1] for r in rows_d], pa.binary()),
        }),
        pdir_d / "pages.parquet",
    )
    got_d = {r["url"]: r["community_id"]
             for r in link_communities(str(pdir_d)).take_all()}
    assert got_d == {u: int(_hash64(u)) % M for u, _ in rows_d}


def test_semantic_decontam_matches_numpy_mirror(ray_session):
    """Distributed fuzzy-decontamination flags == a sequential numpy
    mirror over the same embeddings (eval = vec_id < n_eval, e3-grid
    threshold, argmax tie -> lowest eval_id)."""
    import numpy as np
    import pyarrow.parquet as pq

    from smart_ocr_ray.ops.similarity import semantic_decontam

    sf = "/root/testdata/sf0.001"
    thr, n_eval = 450, 50
    t = pq.read_table(f"{sf}/embeddings.parquet", columns=["vec_id", "embedding"])
    ids = np.asarray(t.column("vec_id").to_pylist(), dtype=np.int64)
    emb = np.asarray([np.asarray(e, float) for e in t.column("embedding").to_pylist()])
    n = np.linalg.norm(emb, axis=1, keepdims=True); n[n == 0] = 1.0
    emb = emb / n
    ev = np.argsort(ids[ids < n_eval])
    ev_ids = np.sort(ids[ids < n_eval])
    ev_mat = emb[ids < n_eval][ev]
    want = {}
    for i in np.flatnonzero(ids >= n_eval):
        e3 = np.round(emb[i] @ ev_mat.T * 1000).astype(np.int64)
        hits = e3 >= thr
        if hits.any():
            best = int(np.argmax(e3))
            want[int(ids[i])] = (int(hits.sum()), int(ev_ids[best]), int(e3[best]))

    got = {
        r["vec_id"]: (r["n_hits"], r["best_eval_id"], r["best_sim_e3"])
        for r in semantic_decontam(sf, thr, n_eval).take_all()
    }
    assert got == want
    assert len(got) >= 1  # the synthetic corpus plants at least one leak


def test_graph_ppr_hand_built_graph(ray_session):
    """Personalized PageRank (seed_mod): teleport mass lands only on
    seed nodes; non-seeds earn rank solely through link proximity;
    local and distributed branches bit-identical to a driver-side
    mirror; empty seed set -> all-zero ranks."""
    import ray.data

    from smart_ocr_ray.ops.graph import PR_SCALE, graph_pagerank

    # 0→1, 1→2, 2→0 (cycle); 0→3, 1→3, 2→3 (hub 3); 4 isolated.
    # seed_mod=2 -> seeds {0, 2, 4}.
    srcs = [0, 1, 2, 0, 1, 2]
    dsts = [1, 2, 0, 3, 3, 3]
    nodes = ray.data.from_items([{"vec_id": i} for i in range(5)])
    edges = ray.data.from_items(
        [{"src": s, "dst": d} for s, d in zip(srcs, dsts)]
    )

    n_iter, seed_mod = 3, 2
    seeds = [v for v in range(5) if v % seed_mod == 0]
    S = len(seeds)
    got = {
        r["vec_id"]: r["pr_e12"]
        for r in graph_pagerank(
            "", n_iter=n_iter, edges=edges, nodes=nodes, seed_mod=seed_mod
        ).take_all()
    }
    got_dist = {
        r["vec_id"]: r["pr_e12"]
        for r in graph_pagerank(
            "", n_iter=n_iter, edges=edges, nodes=nodes,
            local_max_edges=0, seed_mod=seed_mod,
        ).take_all()
    }
    assert got == got_dist

    outdeg = {0: 2, 1: 2, 2: 2}
    pr = {v: (PR_SCALE // S if v % seed_mod == 0 else 0) for v in range(5)}
    base = (15 * PR_SCALE) // (100 * S)
    for _ in range(n_iter):
        contrib = {v: 0 for v in range(5)}
        for s, d in zip(srcs, dsts):
            contrib[d] += pr[s] // outdeg[s]
        pr = {
            v: (base if v % seed_mod == 0 else 0) + (85 * contrib[v]) // 100
            for v in range(5)
        }
    assert got == pr
    # Non-seed 1 holds rank only via its seed in-neighbor 0; isolated
    # seed 4 sits exactly at the base; non-seed hub 3 still earns rank.
    assert got[4] == base and got[1] > 0 and got[3] > 0

    # Empty seed set (no node % 7 == 0 among 1..5): all-zero ranks.
    nodes2 = ray.data.from_items([{"vec_id": i} for i in range(1, 6)])
    edges2 = ray.data.from_items([{"src": 1, "dst": 2}])
    got0 = {
        r["vec_id"]: r["pr_e12"]
        for r in graph_pagerank(
            "", n_iter=2, edges=edges2, nodes=nodes2, seed_mod=7
        ).take_all()
    }
    assert got0 == {v: 0 for v in range(1, 6)}


def test_section_graph_matches_sequential_mirror(ray_session, tmp_path):
    """section_graph over the fixture corpus == a sequential mirror of
    the frozen rule (DOM-harvested existing-target edges → endpoints
    collapsed to scheme://host/<first segment> → count + distinct-src
    per section pair)."""
    import re
    from collections import defaultdict

    import pyarrow.parquet as pq

    from smart_ocr_ray.fixtures import generate_pages
    from smart_ocr_ray.functions.assess import sniff_doc_kind
    from smart_ocr_ray.ops.links import _host, page_hrefs, section_graph

    n = 60
    table = generate_pages(n)
    pdir = tmp_path / "pages"; pdir.mkdir()
    pq.write_table(table, pdir / "pages.parquet")

    urls = table.column("url").to_pylist()
    htmls = table.column("html").to_pylist()
    html_urls = {
        u for u, h in zip(urls, htmls) if sniff_doc_kind(h or b"") == "html"
    }

    def section(u: str) -> str:
        return re.match(r"^(https?://[^/]+(/[^/]+)?)", u).group(1)

    links_cnt: dict[tuple[str, str], int] = defaultdict(int)
    srcs: dict[tuple[str, str], set] = defaultdict(set)
    for u, h in zip(urls, htmls):
        if u not in html_urls:
            continue
        for href in page_hrefs(h or b""):
            if not href.startswith("/"):
                continue
            dst = _host(u) + href
            if dst not in html_urls:
                continue  # dangling targets form no edge
            key = (section(u), section(dst))
            links_cnt[key] += 1
            srcs[key].add(u)

    got = {
        (r["src_section"], r["dst_section"]): (r["n_links"], r["n_src_pages"])
        for r in section_graph(str(pdir)).take_all()
    }
    want = {k: (links_cnt[k], len(srcs[k])) for k in links_cnt}
    assert got == want
    # the fixture corpus actually exercises both aggregates: some pair
    # has more links than distinct sources (a page linking a section
    # twice) and there are cross-section edges
    assert any(a > b for a, b in got.values())
    assert any(s != d for s, d in got)


def test_section_graph_no_html_pages(ray_session, tmp_path):
    """All-binary corpus yields a typed empty section graph."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from smart_ocr_ray.ops.links import section_graph

    pdir = tmp_path / "pages"; pdir.mkdir()
    pq.write_table(
        pa.Table.from_pydict({
            "url": pa.array(["https://h.test/a"]),
            "warc_ts": pa.array([0], pa.timestamp("us")),
            "html": pa.array([b"%FIX-LAYOUT junk"], pa.binary()),
            "text": pa.array([""]),
            "lang": pa.array(["en"]),
        }),
        pdir / "pages.parquet",
    )
    ds = section_graph(str(pdir))
    assert ds.take_all() == []
    assert ds.schema().names == [
        "src_section", "dst_section", "n_links", "n_src_pages",
    ]


def test_section_graph_segmentless_url_falls_back_to_host(ray_session, tmp_path):
    """Urls with no path segment section to bare scheme://host, and a
    multi-host corpus aggregates at host level (the Common-Crawl
    host-graph degenerate case)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from smart_ocr_ray.ops.links import section_graph

    page = lambda target: f'<html><body><a href="{target}">x</a></body></html>'.encode()
    pdir = tmp_path / "pages"; pdir.mkdir()
    pq.write_table(
        pa.Table.from_pydict({
            "url": pa.array([
                "https://a.test",          # segment-less source
                "https://a.test/s/one",
                "https://b.test/t/two",
            ]),
            "warc_ts": pa.array([0, 1, 2], pa.timestamp("us")),
            "html": pa.array([
                page("/s/one"),            # a.test -> a.test/s
                page("/t/ignored"),        # dangling on a.test (no such page)
                page("/t/two"),            # self-link within b.test/t
            ], pa.binary()),
            "text": pa.array(["x", "x", "x"]),
            "lang": pa.array(["en", "en", "en"]),
        }),
        pdir / "pages.parquet",
    )
    got = {
        (r["src_section"], r["dst_section"]): (r["n_links"], r["n_src_pages"])
        for r in section_graph(str(pdir)).take_all()
    }
    assert got == {
        ("https://a.test", "https://a.test/s"): (1, 1),
        ("https://b.test/t", "https://b.test/t"): (1, 1),
    }


def _hb_mirror_est(regs: dict[int, int]) -> int:
    """Sequential raw-HLL estimate mirror (independent of links.py's
    packed-byte vectorized path): regs maps register index -> rank."""
    from smart_ocr_ray.ops.links import HB_EST_CAP_E6, HB_M, HB_NUM_E6, HB_RANK0

    s = sum(2 ** (HB_RANK0 - regs.get(j, 0)) for j in range(HB_M))
    return min(HB_NUM_E6 // s, HB_EST_CAP_E6)


def test_link_harmonic_matches_sequential_hyperball(ray_session, tmp_path):
    """link_harmonic over the fixture corpus == a pure-Python
    sequential HyperBall (dict-of-dicts registers, explicit round
    loop) using the same frozen integer rules."""
    import pyarrow.parquet as pq

    from smart_ocr_ray.fixtures import generate_pages
    from smart_ocr_ray.functions.assess import sniff_doc_kind
    from smart_ocr_ray.functions.hashing import _hash64
    from smart_ocr_ray.functions.textstats import _kgram_hash64
    from smart_ocr_ray.ops.links import (
        HB_M,
        HB_RANK0,
        _host,
        link_harmonic,
        page_hrefs,
    )

    n = 60
    table = generate_pages(n)
    pdir = tmp_path / "pages"; pdir.mkdir()
    pq.write_table(table, pdir / "pages.parquet")

    urls = table.column("url").to_pylist()
    htmls = table.column("html").to_pylist()
    html_urls = [
        u for u, h in zip(urls, htmls) if sniff_doc_kind(h or b"") == "html"
    ]
    node_of = {u: int(_hash64(u)) % 2**63 for u in html_urls}
    node_set = set(node_of.values())

    # sequential init
    counters: dict[int, dict[int, int]] = {}
    for u in html_urls:
        h = _kgram_hash64(u)
        v = h >> 4
        rank = HB_RANK0 - v.bit_length() if v else HB_RANK0
        regs = counters.setdefault(node_of[u], {})
        regs[h & (HB_M - 1)] = max(regs.get(h & (HB_M - 1), 0), rank)

    # sequential distinct existing-target edge set, no self-loops
    edges = set()
    for u, h in zip(urls, htmls):
        if u not in node_of:
            continue
        for href in page_hrefs(h or b""):
            if not href.startswith("/"):
                continue
            dst = _host(u) + href
            if dst in node_of and node_of[dst] != node_of[u]:
                edges.add((node_of[u], node_of[dst]))

    ests = {v: [_hb_mirror_est(counters[v])] for v in counters}
    for _ in range(3):  # synchronous rounds
        nxt = {v: dict(counters[v]) for v in counters}
        for s, d in edges:
            for j, val in counters[s].items():
                if val > nxt[d].get(j, 0):
                    nxt[d][j] = val
        counters = nxt
        for v in counters:
            ests[v].append(_hb_mirror_est(counters[v]))

    want = {}
    for u in html_urls:
        e = ests[node_of[u]]
        harm = sum((e[r] - e[r - 1]) // r for r in range(1, 4))
        want[u] = (e[1], e[2], e[3], harm)

    got = {
        r["url"]: (r["est1_e6"], r["est2_e6"], r["est3_e6"], r["harmonic_e6"])
        for r in link_harmonic(str(pdir)).take_all()
    }
    assert got == want
    # the graph actually grows balls: some page has est3 > est1, and
    # fixture hubs give a positive top harmonic score
    assert any(v[2] > v[0] for v in got.values())
    assert max(v[3] for v in got.values()) > 0


def test_link_harmonic_edge_free_graph_zero_centrality(ray_session, tmp_path):
    """Pages with no internal links keep their radius-0 ball at every
    radius: est1 == est2 == est3 and harmonic == 0 (and the op does
    not crash on the empty edge table)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from smart_ocr_ray.ops.links import link_harmonic

    pdir = tmp_path / "pages"; pdir.mkdir()
    pq.write_table(
        pa.Table.from_pydict({
            "url": pa.array([f"https://h.test/p/{i}" for i in range(5)]),
            "warc_ts": pa.array(list(range(5)), pa.timestamp("us")),
            "html": pa.array(
                [b"<html><body><p>plain page</p></body></html>"] * 5, pa.binary()
            ),
            "text": pa.array(["plain page"] * 5),
            "lang": pa.array(["en"] * 5),
        }),
        pdir / "pages.parquet",
    )
    rows = link_harmonic(str(pdir)).take_all()
    assert len(rows) == 5
    for r in rows:
        assert r["est1_e6"] == r["est2_e6"] == r["est3_e6"] > 0
        assert r["harmonic_e6"] == 0


def test_link_harmonic_all_binary_corpus_empty(ray_session, tmp_path):
    import pyarrow as pa
    import pyarrow.parquet as pq

    from smart_ocr_ray.ops.links import link_harmonic

    pdir = tmp_path / "pages"; pdir.mkdir()
    pq.write_table(
        pa.Table.from_pydict({
            "url": pa.array(["https://h.test/a"]),
            "warc_ts": pa.array([0], pa.timestamp("us")),
            "html": pa.array([b"%FIX-LAYOUT junk"], pa.binary()),
            "text": pa.array([""]),
            "lang": pa.array(["en"]),
        }),
        pdir / "pages.parquet",
    )
    ds = link_harmonic(str(pdir))
    assert ds.take_all() == []
    assert ds.schema().names == [
        "url", "est1_e6", "est2_e6", "est3_e6", "harmonic_e6",
    ]


def test_link_hits_matches_sequential_mirror(ray_session, tmp_path):
    """link_hits over the fixture corpus == a pure-Python sequential
    HITS with the same frozen integer L1-renormalization rules."""
    import pyarrow.parquet as pq

    from smart_ocr_ray.fixtures import generate_pages
    from smart_ocr_ray.functions.assess import sniff_doc_kind
    from smart_ocr_ray.functions.hashing import _hash64
    from smart_ocr_ray.ops.links import (
        HITS_INIT,
        HITS_T,
        _host,
        link_hits,
        page_hrefs,
    )

    n = 60
    table = generate_pages(n)
    pdir = tmp_path / "pages"; pdir.mkdir()
    pq.write_table(table, pdir / "pages.parquet")

    urls = table.column("url").to_pylist()
    htmls = table.column("html").to_pylist()
    html_urls = [
        u for u, h in zip(urls, htmls) if sniff_doc_kind(h or b"") == "html"
    ]
    node_of = {u: int(_hash64(u)) % 2**63 for u in html_urls}
    nodes = sorted(set(node_of.values()))

    edges = set()
    for u, h in zip(urls, htmls):
        if u not in node_of:
            continue
        for href in page_hrefs(h or b""):
            if href.startswith("/"):
                dst = _host(u) + href
                if dst in node_of and node_of[dst] != node_of[u]:
                    edges.add((node_of[u], node_of[dst]))

    def norm(raw: dict) -> dict:
        total = sum(raw.values())
        if total == 0:
            return {v: 0 for v in nodes}
        return {v: (HITS_T * raw.get(v, 0)) // total for v in nodes}

    hub = {v: HITS_INIT for v in nodes}
    auth = {v: 0 for v in nodes}
    for _ in range(2):
        raw_a = {}
        for s, d in edges:
            raw_a[d] = raw_a.get(d, 0) + hub[s]
        auth = norm(raw_a)
        raw_h = {}
        for s, d in edges:
            raw_h[s] = raw_h.get(s, 0) + auth[d]
        hub = norm(raw_h)

    got = {
        r["url"]: (r["auth_e12"], r["hub_e12"])
        for r in link_hits(str(pdir)).take_all()
    }
    want = {u: (auth[node_of[u]], hub[node_of[u]]) for u in html_urls}
    assert got == want
    # both score vectors renormalize to ~the grid and are non-trivial
    assert abs(sum(a for a, _ in got.values()) - HITS_T) < len(got)
    assert len({a for a, _ in got.values()}) > 5


def test_link_hits_edge_free_graph_all_zero(ray_session, tmp_path):
    import pyarrow as pa
    import pyarrow.parquet as pq

    from smart_ocr_ray.ops.links import link_hits

    pdir = tmp_path / "pages"; pdir.mkdir()
    pq.write_table(
        pa.Table.from_pydict({
            "url": pa.array([f"https://h.test/p/{i}" for i in range(4)]),
            "warc_ts": pa.array(list(range(4)), pa.timestamp("us")),
            "html": pa.array(
                [b"<html><body><p>plain page</p></body></html>"] * 4, pa.binary()
            ),
            "text": pa.array(["plain page"] * 4),
            "lang": pa.array(["en"] * 4),
        }),
        pdir / "pages.parquet",
    )
    rows = link_hits(str(pdir)).take_all()
    assert len(rows) == 4
    assert all(r["auth_e12"] == 0 and r["hub_e12"] == 0 for r in rows)


def test_link_clustering_topology_and_triangles_consistency(ray_session, tmp_path):
    """Closed-form topology: a 4-clique (coeff 1.0), a 3-path middle
    (degree 2, no triangle, coeff 0), and a link-less page (degree 0)
    — dense output covers every html page; n_triangles agrees with
    link_triangles where nonzero."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from smart_ocr_ray.ops.links import link_clustering, link_triangles

    def page(*targets: str) -> bytes:
        body = "".join(f'<a href="{t}">x</a>' for t in targets)
        return f"<html><body>{body}<p>content</p></body></html>".encode()

    # clique pages c0..c3 all link each other; path p0-p1-p2; lone
    urls = [f"https://h.test/c{i}" for i in range(4)] + [
        "https://h.test/p0", "https://h.test/p1", "https://h.test/p2",
        "https://h.test/lone",
    ]
    htmls = (
        [page(*[f"/c{j}" for j in range(4) if j != i]) for i in range(4)]
        + [page("/p1"), page("/p2"), page("/p1"), page()]
    )
    pdir = tmp_path / "pages"; pdir.mkdir()
    pq.write_table(
        pa.Table.from_pydict({
            "url": pa.array(urls),
            "warc_ts": pa.array(list(range(len(urls))), pa.timestamp("us")),
            "html": pa.array(htmls, pa.binary()),
            "text": pa.array(["x"] * len(urls)),
            "lang": pa.array(["en"] * len(urls)),
        }),
        pdir / "pages.parquet",
    )
    got = {
        r["url"]: (r["degree"], r["n_triangles"], r["coeff_e6"])
        for r in link_clustering(str(pdir)).take_all()
    }
    assert len(got) == 8
    for i in range(4):  # clique: d=3, 3 triangles each, coeff = 1.0
        assert got[f"https://h.test/c{i}"] == (3, 3, 1_000_000)
    assert got["https://h.test/p1"] == (2, 0, 0)  # path middle
    assert got["https://h.test/p0"] == (1, 0, 0)
    assert got["https://h.test/p2"] == (1, 0, 0)
    assert got["https://h.test/lone"] == (0, 0, 0)

    tri = {r["url"]: r["n_triangles"] for r in link_triangles(str(pdir)).take_all()}
    assert tri == {u: t for u, (_, t, _) in got.items() if t > 0}


def test_link_clustering_no_edges_dense_zero(ray_session, tmp_path):
    """Dangling-link corpus: every page present with all-zero stats
    (the degenerate _triangle_core levels compose)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from smart_ocr_ray.ops.links import link_clustering

    pdir = tmp_path / "pages"; pdir.mkdir()
    pq.write_table(
        pa.Table.from_pydict({
            "url": pa.array(["https://h.test/a", "https://h.test/b"]),
            "warc_ts": pa.array([0, 1], pa.timestamp("us")),
            "html": pa.array(
                [b'<html><body><a href="/nowhere">x</a></body></html>',
                 b"<html><body><p>plain</p></body></html>"], pa.binary()
            ),
            "text": pa.array(["x", "plain"]),
            "lang": pa.array(["en", "en"]),
        }),
        pdir / "pages.parquet",
    )
    got = {r["url"]: (r["degree"], r["n_triangles"], r["coeff_e6"])
           for r in link_clustering(str(pdir)).take_all()}
    assert got == {
        "https://h.test/a": (0, 0, 0),
        "https://h.test/b": (0, 0, 0),
    }


def test_bm25_search_manual_rule_identity(ray_session, tmp_path):
    """bm25_search == the frozen integer BM25 rule computed by hand on
    an engineered corpus exercising idf contrast (rare vs common
    term), tf saturation, length normalization, empty docs, and the
    (score desc, doc_id asc) tie-break."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from smart_ocr_ray.ops.text_analysis import bm25_search

    texts = [
        "dup dup dup join filler words here",       # rare term, high tf
        "dup join filler words here padding x",     # rare term, tf 1
        "hash join hash join hash join",            # common terms only
        "join " + "pad " * 40,                      # long doc: length penalty
        "join join",                                # short doc: length boost
        "nothing relevant at all",                  # no query term
        "",                                         # empty
        "join join",                                # exact tie with doc 4
    ]
    sf = tmp_path / "bm"
    sf.mkdir()
    pq.write_table(
        pa.Table.from_pydict({
            "doc_id": pa.array(list(range(len(texts))), pa.int64()),
            "text": pa.array(texts, pa.string()),
        }),
        sf / "documents.parquet",
    )

    # hand mirror of the frozen rule
    toks = [t.strip().lower().split() for t in texts]
    n = len(texts)
    dl = [len(tk) for tk in toks]
    avgdl = max(sum(dl) // n, 1)
    q = ("dup", "hash", "join")
    df = {t: sum(1 for tk in toks if t in tk) for t in q}
    idf = {t: (n // df[t]).bit_length() for t in q if df[t]}
    scores = {}
    for i, tk in enumerate(toks):
        s = 0
        for t in q:
            tf = tk.count(t)
            if tf:
                s += (idf[t] * 22 * avgdl * tf * 10**6) // (
                    10 * avgdl * tf + 3 * avgdl + 9 * dl[i]
                )
        if s:
            scores[i] = s
    want = sorted(scores.items(), key=lambda kv: (-kv[1], kv[0]))[:10]

    got = [
        (r["doc_id"], r["score_e6"], r["rnk"])
        for r in sorted(bm25_search(str(sf)).take_all(), key=lambda r: r["rnk"])
    ]
    assert got == [(d, s, i + 1) for i, (d, s) in enumerate(want)]
    # the engineered properties actually hold
    by_doc = dict(scores)
    assert by_doc[0] > by_doc[1]          # tf raises score, sublinearly
    assert by_doc[4] > by_doc[3]          # shorter doc outranks longer
    assert by_doc[4] == by_doc[7]         # exact tie -> doc_id order
    assert 5 not in by_doc and 6 not in by_doc
    tie_ranks = {d: r for d, _s, r in got if d in (4, 7)}
    assert tie_ranks[4] + 1 == tie_ranks[7]


def test_bm25_search_no_match_and_empty_corpus(ray_session, tmp_path):
    import pyarrow as pa
    import pyarrow.parquet as pq

    from smart_ocr_ray.ops.text_analysis import bm25_search

    sf = tmp_path / "bm0"
    sf.mkdir()
    pq.write_table(
        pa.Table.from_pydict({
            "doc_id": pa.array([0, 1], pa.int64()),
            "text": pa.array(["nothing here", "still nothing"], pa.string()),
        }),
        sf / "documents.parquet",
    )
    ds = bm25_search(str(sf))
    assert ds.take_all() == []
    assert ds.schema().names == ["rnk", "doc_id", "score_e6"]


def test_section_profile_matches_sequential_mirror(ray_session, tmp_path):
    """section_profile == sequential mirror: per section, page count,
    anchor/in-degree sums (link_graph edge rule), utf-8 text bytes and
    the floor-division means."""
    import re
    from collections import defaultdict

    import pyarrow.parquet as pq

    from smart_ocr_ray.fixtures import generate_pages
    from smart_ocr_ray.functions.assess import sniff_doc_kind
    from smart_ocr_ray.ops.links import _host, page_hrefs, section_profile

    n = 60
    table = generate_pages(n)
    pdir = tmp_path / "pages"; pdir.mkdir()
    pq.write_table(table, pdir / "pages.parquet")

    urls = table.column("url").to_pylist()
    htmls = table.column("html").to_pylist()
    texts = table.column("text").to_pylist()
    html_urls = {
        u for u, h in zip(urls, htmls) if sniff_doc_kind(h or b"") == "html"
    }

    def section(u: str) -> str:
        return re.match(r"^(https?://[^/]+(/[^/]+)?)", u).group(1)

    out_links = {}
    in_deg = {u: 0 for u in html_urls}
    tb = {}
    for u, h, t in zip(urls, htmls, texts):
        if u not in html_urls:
            continue
        hrefs = page_hrefs(h or b"")
        out_links[u] = len(hrefs)
        tb[u] = len((t or "").encode("utf-8"))
        for href in hrefs:
            if href.startswith("/"):
                dst = _host(u) + href
                if dst in html_urls:
                    in_deg[dst] += 1

    agg = defaultdict(lambda: [0, 0, 0, 0])  # n, ol, ind, tb
    for u in html_urls:
        a = agg[section(u)]
        a[0] += 1; a[1] += out_links[u]; a[2] += in_deg[u]; a[3] += tb[u]

    want = {
        s: (v[0], v[1], v[2], v[3], v[3] // v[0], (1000 * v[1]) // v[0])
        for s, v in agg.items()
    }
    got = {
        r["section"]: (
            r["n_pages"], r["out_links"], r["in_degree"], r["text_bytes"],
            r["mean_text_bytes"], r["mean_out_links_e3"],
        )
        for r in section_profile(str(pdir)).take_all()
    }
    assert got == want
    assert len(got) > 3  # several sections actually present


def test_section_profile_all_binary_empty(ray_session, tmp_path):
    import pyarrow as pa
    import pyarrow.parquet as pq

    from smart_ocr_ray.ops.links import section_profile

    pdir = tmp_path / "pages"; pdir.mkdir()
    pq.write_table(
        pa.Table.from_pydict({
            "url": pa.array(["https://h.test/a"]),
            "warc_ts": pa.array([0], pa.timestamp("us")),
            "html": pa.array([b"%FIX-LAYOUT junk"], pa.binary()),
            "text": pa.array([""]),
            "lang": pa.array(["en"]),
        }),
        pdir / "pages.parquet",
    )
    ds = section_profile(str(pdir))
    assert ds.take_all() == []


def test_link_frontier_matches_sequential_bfs(ray_session, tmp_path):
    """link_frontier == sequential BFS (bounded rounds, seed rule,
    -1 fill) over the fixture corpus."""
    import pyarrow.parquet as pq

    from smart_ocr_ray.fixtures import generate_pages
    from smart_ocr_ray.functions.assess import sniff_doc_kind
    from smart_ocr_ray.functions.hashing import _hash64
    from smart_ocr_ray.ops.links import _host, link_frontier, page_hrefs

    n = 60
    table = generate_pages(n)
    pdir = tmp_path / "pages"; pdir.mkdir()
    pq.write_table(table, pdir / "pages.parquet")

    urls = table.column("url").to_pylist()
    htmls = table.column("html").to_pylist()
    html_urls = [u for u, h in zip(urls, htmls)
                 if sniff_doc_kind(h or b"") == "html"]
    node_of = {u: int(_hash64(u)) % 2**63 for u in html_urls}

    edges = set()
    for u, h in zip(urls, htmls):
        if u not in node_of:
            continue
        for href in page_hrefs(h or b""):
            if href.startswith("/"):
                dst = _host(u) + href
                if dst in node_of and node_of[dst] != node_of[u]:
                    edges.add((node_of[u], node_of[dst]))

    dist = {v: 0 for v in set(node_of.values()) if v % 8 == 0}
    for _ in range(3):
        nxt = dict(dist)
        for s, d in edges:
            if s in dist and dist[s] + 1 < nxt.get(d, 1 << 60):
                nxt[d] = dist[s] + 1
        dist = nxt

    got = {r["url"]: r["dist"] for r in link_frontier(str(pdir)).take_all()}
    want = {u: dist.get(node_of[u], -1) for u in html_urls}
    assert got == want
    # the corpus exercises every band: seeds, hops 1..3, unreached
    vals = set(got.values())
    assert {0, 1, -1} <= vals and (2 in vals or 3 in vals)


def test_link_frontier_no_seeds_all_unreached(ray_session, tmp_path):
    """seed_mod with no matching node: every page reports -1."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from smart_ocr_ray.functions.hashing import _hash64
    from smart_ocr_ray.ops.links import link_frontier

    urls = [f"https://h.test/p/{i}" for i in range(6)]
    # a prime far above any node id cannot divide it (ids < 2^63)
    seed_mod = 2**63 + 5
    pdir = tmp_path / "pages"; pdir.mkdir()
    pq.write_table(
        pa.Table.from_pydict({
            "url": pa.array(urls),
            "warc_ts": pa.array(list(range(6)), pa.timestamp("us")),
            "html": pa.array(
                [b'<html><body><a href="/p/0">x</a><p>t</p></body></html>'] * 6,
                pa.binary(),
            ),
            "text": pa.array(["t"] * 6),
            "lang": pa.array(["en"] * 6),
        }),
        pdir / "pages.parquet",
    )
    assert all(int(_hash64(u)) % 2**63 % seed_mod != 0 for u in urls)
    rows = link_frontier(str(pdir), seed_mod=seed_mod).take_all()
    assert len(rows) == 6
    assert all(r["dist"] == -1 for r in rows)


def test_ngram_cardinality_mirror_and_duplicate_insensitivity(ray_session, tmp_path):
    """ngram_cardinality == the sequential register mirror, and —
    the property that justifies the sketch — duplicating every
    document leaves all estimates bit-identical."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from smart_ocr_ray.functions.textstats import _kgram_hash64
    from smart_ocr_ray.ops.text_analysis import (
        NGRAM_HLL_CAP,
        NGRAM_HLL_NUM,
        ngram_cardinality,
    )

    texts = [
        "the quick brown fox jumps over the lazy dog",
        "pack my box with five dozen liquor jugs",
        "the quick brown fox strikes again and again",
        "",
        "single",
    ]

    def mirror(docs):
        regs = {}
        for t in docs:
            toks = t.strip().lower().split()
            for n in (1, 2, 3):
                for i in range(len(toks) - n + 1):
                    h = _kgram_hash64(" ".join(toks[i:i + n]))
                    idx, v = h & 0xFF, h >> 8
                    rank = 57 - v.bit_length() if v else 57
                    regs[(n, idx)] = max(regs.get((n, idx), 0), rank)
        out = {}
        for n in (1, 2, 3):
            vals = [r for (m, _i), r in regs.items() if m == n]
            if not vals:
                continue
            s = sum(1 << (57 - v) for v in vals) + (256 - len(vals)) * (1 << 57)
            out[n] = min(NGRAM_HLL_NUM // (1_000_000 * s), NGRAM_HLL_CAP)
        return out

    def run(docs, name):
        sf = tmp_path / name
        sf.mkdir()
        pq.write_table(
            pa.Table.from_pydict({
                "doc_id": pa.array(list(range(len(docs))), pa.int64()),
                "text": pa.array(docs, pa.string()),
            }),
            sf / "documents.parquet",
        )
        return {r["n"]: r["est"] for r in ngram_cardinality(str(sf)).take_all()}

    got = run(texts, "a")
    assert got == mirror(texts)
    assert set(got) == {1, 2, 3} and all(v > 0 for v in got.values())
    # sketch property: duplicates are invisible
    assert run(texts * 2, "b") == got


def test_frame_dedup_counts_and_survivors(ray_session):
    """frame_dedup: copy counts per distinct frame content, with the
    (url, frame_idx)-lexicographic-min survivor — a repeated frame
    inside one video AND across videos collapses to one row."""
    import hashlib

    import pyarrow as pa
    import ray.data

    from smart_ocr_ray.ops.multimodal import FRAME_BYTES, frame_dedup

    a = b"\x01" * FRAME_BYTES
    b = b"\x02" * FRAME_BYTES
    tail = b"\x03" * 100  # short final frame
    rows = [
        # frames sampled at stride 2: indices 0, 2, 4 → a, a, tail
        {"url": "v1", "payload": a + b + a + b + tail},
        # index 0 → a (cross-video duplicate of v1's)
        {"url": "v0", "payload": a},
        {"url": "v2", "payload": b""},  # no frames
    ]
    out = frame_dedup(ray.data.from_arrow(pa.Table.from_pylist(rows))).take_all()

    def h(data: bytes) -> str:
        return hashlib.md5(data.hex().upper().encode()).hexdigest()

    got = {r["frame_hash"]: r for r in out}
    assert len(out) == len(got) == 2  # a-frames collapse; tail distinct
    ra = got[h(a)]
    assert ra["n_copies"] == 3
    assert (ra["url"], ra["frame_idx"]) == ("v0", 0)  # lexicographic min
    rt = got[h(tail)]
    assert rt["n_copies"] == 1
    assert (rt["url"], rt["frame_idx"]) == ("v1", 4)


def test_link_kcore_matches_mirror_and_exact_coreness(ray_session, tmp_path):
    """link_kcore == the sequential h-index mirror (4 pinned rounds),
    AND — validating the round budget — the mirror equals TRUE
    coreness (exact iterative peeling) on the fixture corpus."""
    import pyarrow.parquet as pq

    from smart_ocr_ray.fixtures import generate_pages
    from smart_ocr_ray.functions.assess import sniff_doc_kind
    from smart_ocr_ray.functions.hashing import _hash64
    from smart_ocr_ray.ops.links import _host, link_kcore, page_hrefs

    table = generate_pages(60)
    pdir = tmp_path / "pages"; pdir.mkdir()
    pq.write_table(table, pdir / "pages.parquet")

    urls = table.column("url").to_pylist()
    htmls = table.column("html").to_pylist()
    html_urls = [u for u, h in zip(urls, htmls)
                 if sniff_doc_kind(h or b"") == "html"]
    node_of = {u: int(_hash64(u)) % 2**63 for u in html_urls}

    und = set()
    for u, h in zip(urls, htmls):
        if u not in node_of:
            continue
        for href in page_hrefs(h or b""):
            if href.startswith("/"):
                dst = _host(u) + href
                if dst in node_of and node_of[dst] != node_of[u]:
                    und.add(tuple(sorted((node_of[u], node_of[dst]))))
    adj = {}
    for a, b in und:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)

    def hindex(vals):
        vals = sorted(vals, reverse=True)
        h = 0
        for i, v in enumerate(vals, 1):
            if v >= i:
                h = i
        return h

    c = {v: len(ns) for v, ns in adj.items()}
    for _ in range(4):
        c = {v: hindex([c[u] for u in ns]) for v, ns in adj.items()}

    got = {r["url"]: r["core"] for r in link_kcore(str(pdir)).take_all()}
    want = {u: c.get(node_of[u], 0) for u in html_urls}
    assert got == want

    # exact peeling: remove nodes of degree < k repeatedly, k = 1, 2, ...
    core = {v: 0 for v in adj}
    live = dict(adj)
    k = 1
    while live:
        while True:
            drop = [v for v, ns in live.items() if len(ns) < k]
            if not drop:
                break
            for v in drop:
                core[v] = k - 1
                for u in live[v]:
                    if u in live:
                        live[u].discard(v)
                del live[v]
        k += 1
    assert c == core  # 4 rounds reach the fixpoint on this corpus
    assert max(c.values(), default=0) >= 2  # corpus exercises a 2-core


def test_link_kcore_zero_edge_corpus_all_zero(ray_session, tmp_path):
    """Pages whose only links dangle (no resolvable targets): every
    page is edgeless and reports core 0."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from smart_ocr_ray.ops.links import link_kcore

    urls = [f"https://h.test/p/{i}" for i in range(5)]
    pdir = tmp_path / "pages"; pdir.mkdir()
    pq.write_table(
        pa.Table.from_pydict({
            "url": pa.array(urls),
            "warc_ts": pa.array(list(range(5)), pa.timestamp("us")),
            "html": pa.array(
                [b'<html><body><a href="/nowhere/x">x</a><p>t</p></body></html>'] * 5,
                pa.binary(),
            ),
            "text": pa.array(["t"] * 5),
            "lang": pa.array(["en"] * 5),
        }),
        pdir / "pages.parquet",
    )
    rows = link_kcore(str(pdir)).take_all()
    assert len(rows) == 5
    assert all(r["core"] == 0 for r in rows)


def test_crawl_schedule_politeness_invariants(ray_session, tmp_path):
    """crawl_schedule: per-section (wave, slot) is a bijection onto
    rank order by (warc_ts, url); no (section, wave) exceeds per_host
    concurrent fetches; earlier timestamps never land in later waves
    than later ones within a section."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from smart_ocr_ray.ops.links import crawl_schedule

    rows = []
    # section A: 6 urls, two ts ties (url tie-break); section B: 1 url
    for i, (u, ts) in enumerate([
        ("https://h.test/a/p3", 30), ("https://h.test/a/p1", 10),
        ("https://h.test/a/p2", 10), ("https://h.test/a/p5", 50),
        ("https://h.test/a/p4", 40), ("https://h.test/a/p0", 60),
        ("https://h.test/b/q0", 5),
    ]):
        rows.append({"url": u, "warc_ts": ts})
    pdir = tmp_path / "pages"; pdir.mkdir()
    pq.write_table(
        pa.Table.from_pydict({
            "url": pa.array([r["url"] for r in rows]),
            "warc_ts": pa.array([r["warc_ts"] for r in rows], pa.timestamp("us")),
            "html": pa.array([b"<html></html>"] * len(rows), pa.binary()),
        }),
        pdir / "pages.parquet",
    )
    out = crawl_schedule(str(pdir), per_host=2).take_all()
    got = {r["url"]: (r["section"], r["wave"], r["slot"]) for r in out}
    assert len(got) == 7
    # rank order in section A: p1 (ts10), p2 (ts10, url tie-break),
    # p3 (30), p4 (40), p5 (50), p0 (60)
    assert got["https://h.test/a/p1"] == ("https://h.test/a", 0, 0)
    assert got["https://h.test/a/p2"] == ("https://h.test/a", 0, 1)
    assert got["https://h.test/a/p3"] == ("https://h.test/a", 1, 0)
    assert got["https://h.test/a/p4"] == ("https://h.test/a", 1, 1)
    assert got["https://h.test/a/p5"] == ("https://h.test/a", 2, 0)
    assert got["https://h.test/a/p0"] == ("https://h.test/a", 2, 1)
    assert got["https://h.test/b/q0"] == ("https://h.test/b", 0, 0)
    # politeness bound: no (section, wave) bucket exceeds per_host
    from collections import Counter
    per_wave = Counter((s, w) for s, w, _ in got.values())
    assert max(per_wave.values()) <= 2


def test_link_walks_matches_sequential_mirror(ray_session, tmp_path):
    """link_walks == the sequential walk mirror: hash-argmin next hop
    per step over distinct resolved edges, dead ends stop the walk."""
    import pyarrow.parquet as pq

    from smart_ocr_ray.fixtures import generate_pages
    from smart_ocr_ray.functions.assess import sniff_doc_kind
    from smart_ocr_ray.functions.hashing import _hash64
    from smart_ocr_ray.ops.links import _host, link_walks, page_hrefs

    table = generate_pages(60)
    pdir = tmp_path / "pages"; pdir.mkdir()
    pq.write_table(table, pdir / "pages.parquet")

    urls = table.column("url").to_pylist()
    htmls = table.column("html").to_pylist()
    html_urls = [u for u, h in zip(urls, htmls)
                 if sniff_doc_kind(h or b"") == "html"]
    node_of = {u: int(_hash64(u)) % 2**63 for u in html_urls}
    url_of = {v: u for u, v in node_of.items()}

    adj = {}
    for u, h in zip(urls, htmls):
        if u not in node_of:
            continue
        for href in page_hrefs(h or b""):
            if href.startswith("/"):
                dst = _host(u) + href
                if dst in node_of and node_of[dst] != node_of[u]:
                    adj.setdefault(node_of[u], set()).add(node_of[dst])

    want = set()
    for start in node_of.values():
        if start % 4 != 0:
            continue
        cur = start
        want.add((url_of[start], 0, url_of[cur]))
        for t in (1, 2, 3):
            nbrs = adj.get(cur)
            if not nbrs:
                break
            cur = min(nbrs, key=lambda d: (int(_hash64(f"{cur}:{t}:{d}")), d))
            want.add((url_of[start], t, url_of[cur]))

    got = {
        (r["start_url"], r["step"], r["url"])
        for r in link_walks(str(pdir)).take_all()
    }
    assert got == want
    steps = {s for _, s, _ in got}
    assert steps == {0, 1, 2, 3}  # the corpus sustains full-length walks


def test_dedup_incremental_minhash_matches_and_hot_bucket_guard(ray_session, tmp_path):
    """dedup_incremental_minhash: only cross-side (new odd vs old
    even) matches surface, each new doc reports its id-min best old
    match; a degenerate corpus (hundreds of identical docs → every
    band bucket hot) completes with every new doc matched to the
    GLOBAL min old id at k=64 — the per-side star collapse preserves
    exact results."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from smart_ocr_ray.ops.dedup import dedup_incremental_minhash

    def write(docs, name):
        sf = tmp_path / name
        sf.mkdir()
        pq.write_table(
            pa.Table.from_pydict({
                "doc_id": pa.array(list(range(len(docs))), pa.int64()),
                "text": pa.array(docs, pa.string()),
            }),
            sf / "documents.parquet",
        )
        return str(sf)

    base = "the quick brown fox jumps over the lazy dog again and again today"
    other = "completely different content about distributed dataflow engines"
    # doc 0 (old) == doc 1 (new) == doc 3 (new); doc 2 (old) distinct;
    # doc 5 (new) matches nothing old.
    docs = [base, base, other, base, other + " shifted", "unrelated text entirely here"]
    rows = dedup_incremental_minhash(write(docs, "a")).take_all()
    got = {r["doc_id"]: (r["matched_old"], r["match_k64"]) for r in rows}
    assert got[1] == (0, 64) and got[3] == (0, 64)
    assert 5 not in got  # no old near-dup
    assert all(d % 2 == 1 for d in got)  # only new docs report

    # degenerate: 300 identical docs — every bucket hot (> 64 members)
    rows = dedup_incremental_minhash(write([base] * 300, "b")).take_all()
    got = {r["doc_id"]: (r["matched_old"], r["match_k64"]) for r in rows}
    assert set(got) == set(range(1, 300, 2))  # every new doc matched
    assert all(v == (0, 64) for v in got.values())  # global min old id


def test_gopher_rules_flag_matrix(ray_session, tmp_path):
    """gopher_rules: each rule fires on a targeted violation and a
    clean long document keeps."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from smart_ocr_ray.ops.text_analysis import (
        GOPHER_FLAG_ALPHA_WORDS,
        GOPHER_FLAG_MEAN_WORD_LEN,
        GOPHER_FLAG_STOPWORDS,
        GOPHER_FLAG_SYMBOL_RATIO,
        GOPHER_FLAG_WORD_COUNT,
        gopher_rules,
    )

    clean = ("the report says that we have to work with care and be sure "
             "of every number before anyone moves ahead ") * 3  # 60 words
    docs = [
        clean,                                      # 0: keeps
        "short text with the and of that",          # 1: word count only... stops ok
        clean + " " + "## ### #### ##### " * 4,     # 2: symbols
        ("aa " * 60) + "the be",                     # 3: mean len + alpha ok... len 2 <3 viol
        ("1234 " * 60) + "the be",                   # 4: alpha violation
        clean.replace("the ", "xx ").replace("that ", "yy ")
             .replace("have ", "zz ").replace("to ", "qq ")
             .replace("of ", "pp ").replace("and ", "rr ")
             .replace("be ", "ss ").replace("with ", "tt "),  # 5: no stops
        "",                                          # 6: empty
    ]
    sf = tmp_path / "gsf"; sf.mkdir()
    pq.write_table(
        pa.Table.from_pydict({
            "doc_id": pa.array(list(range(len(docs))), pa.int64()),
            "text": pa.array(docs, pa.string()),
        }),
        sf / "documents.parquet",
    )
    got = {r["doc_id"]: r for r in gopher_rules(str(sf)).take_all()}
    assert got[0]["flags"] == 0 and got[0]["keep"] == 1
    assert got[1]["flags"] & GOPHER_FLAG_WORD_COUNT
    assert got[2]["flags"] & GOPHER_FLAG_SYMBOL_RATIO
    assert got[3]["flags"] & GOPHER_FLAG_MEAN_WORD_LEN
    assert got[4]["flags"] & GOPHER_FLAG_ALPHA_WORDS
    assert got[5]["flags"] & GOPHER_FLAG_STOPWORDS
    assert got[6]["n_words"] == 0
    assert got[6]["flags"] & GOPHER_FLAG_WORD_COUNT
    assert got[6]["flags"] & GOPHER_FLAG_STOPWORDS
    assert all(r["keep"] == (1 if r["flags"] == 0 else 0) for r in got.values())


def test_bigram_lm_known_counts(ray_session, tmp_path):
    """bigram_lm: exact conditional probabilities against the FULL
    denominator, min_count drop, (count desc, w2 asc) ranking."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from smart_ocr_ray.ops.text_analysis import bigram_lm

    # one bigram per doc (single-doc chaining would create extra
    # bigrams at the joins: "a b a b" contains 'b a')
    docs = (["a b"] * 6) + (["a c"] * 5) + (["a d"] * 2) + (["b a"] * 5)
    sf = tmp_path / "blm"; sf.mkdir()
    pq.write_table(
        pa.Table.from_pydict({
            "doc_id": pa.array(list(range(len(docs))), pa.int64()),
            "text": pa.array(docs, pa.string()),
        }),
        sf / "documents.parquet",
    )
    rows = bigram_lm(str(sf)).take_all()
    got = {(r["w1"], r["w2"]): (r["rnk"], r["c"], r["p_e6"]) for r in rows}
    # den(a) = 13 (6+5+2 including the dropped 'a d')
    assert got[("a", "b")] == (1, 6, 1_000_000 * 6 // 13)
    assert got[("a", "c")] == (2, 5, 1_000_000 * 5 // 13)
    assert ("a", "d") not in got  # min_count
    assert got[("b", "a")] == (1, 5, 1_000_000)
    assert len(got) == 3


def test_url_templates_digit_collapse(ray_session, tmp_path):
    """url_templates: digit runs collapse to N, counts and min example
    per template, non-digit urls stay themselves."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from smart_ocr_ray.ops.urls import url_templates

    urls = [
        "https://h.test/item/123",
        "https://h.test/item/7",
        "https://h.test/item/99/reviews",
        "https://h.test/about",
        "https://h2.test/item/4",
    ]
    pdir = tmp_path / "pages"; pdir.mkdir()
    pq.write_table(pa.Table.from_pydict({"url": pa.array(urls)}),
                   pdir / "pages.parquet")
    got = {r["template"]: (r["n_pages"], r["example_url"])
           for r in url_templates(str(pdir)).take_all()}
    assert got["https://h.test/item/N"] == (2, "https://h.test/item/123")
    assert got["https://h.test/item/N/reviews"] == (1, "https://h.test/item/99/reviews")
    assert got["https://h.test/about"] == (1, "https://h.test/about")
    assert got["https://hN.test/item/N"] == (1, "https://h2.test/item/4")
    assert len(got) == 4


def test_ngram_novelty_first_owner(ray_session, tmp_path):
    """ngram_novelty: a gram is novel only in its min-doc_id document;
    docs with fewer than n tokens are absent; counts are exact."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from smart_ocr_ray.ops.text_analysis import ngram_novelty

    sf = tmp_path / "nn"; sf.mkdir()
    pq.write_table(
        pa.Table.from_pydict({
            "doc_id": pa.array([0, 1, 2, 3], pa.int64()),
            "text": pa.array([
                "a b c d",    # {abc, bcd} both novel
                "a b c",      # {abc} first seen in doc 0
                "b c d e",    # {bcd} old, {cde} novel
                "x y",        # no trigram -> absent
            ], pa.string()),
        }),
        sf / "documents.parquet",
    )
    rows = ngram_novelty(str(sf)).take_all()
    assert [r["doc_id"] for r in rows] == [0, 1, 2]
    by = {r["doc_id"]: (r["n_distinct"], r["n_novel"]) for r in rows}
    assert by[0] == (2, 2)
    assert by[1] == (1, 0)
    assert by[2] == (2, 1)
    # each gram is novel exactly once: {abc, bcd, cde}
    assert sum(r["n_novel"] for r in rows) == 3


def test_ngram_novelty_invariant(ray_session, tmp_path):
    """Cross-block invariant: sum(n_novel) == corpus-wide distinct
    gram count. Detects the equal-gk-split-across-blocks hazard the
    block pass silently depends on (ADVICE r3): each gram has exactly
    one min-doc_id owner, so the totals must balance even when the
    pair table spans many blocks. Uses a small vocab over many docs so
    grams collide heavily across documents, and repartitions the input
    so the sorted pair table genuinely has multiple blocks."""
    import random

    import pyarrow as pa
    import pyarrow.parquet as pq

    from smart_ocr_ray.ops.text_analysis import ngram_novelty

    rng = random.Random(42)
    vocab = [f"w{i}" for i in range(12)]
    texts = [
        " ".join(rng.choice(vocab) for _ in range(rng.randint(3, 40)))
        for _ in range(300)
    ]
    sf = tmp_path / "nni"; sf.mkdir()
    pq.write_table(
        pa.Table.from_pydict({
            "doc_id": pa.array(range(300), pa.int64()),
            "text": pa.array(texts, pa.string()),
        }),
        sf / "documents.parquet",
        row_group_size=25,  # many row groups -> many input blocks
    )
    rows = ngram_novelty(str(sf)).take_all()

    # Python reference: per-doc distinct trigram sets + first-owner.
    import hashlib
    seen: set[str] = set()
    ref = {}
    for d, t in enumerate(texts):
        toks = t.lower().split()
        keys = {
            hashlib.md5(" ".join(toks[i:i + 3]).encode()).hexdigest()[:16]
            for i in range(len(toks) - 2)
        }
        if not keys:
            continue
        ref[d] = (len(keys), len(keys - seen))
        seen |= keys

    got = {r["doc_id"]: (r["n_distinct"], r["n_novel"]) for r in rows}
    assert got == ref
    # the invariant itself: every gram novel exactly once
    assert sum(nn for _, nn in got.values()) == len(seen)


def test_graph_ann_search_recall_and_bounds(ray_session):
    """Graph beam search: high recall vs exact cosine top-k at default
    parameters (the audit that pins the approximation, as
    lsh_recall_eval pins LSH), deterministic across runs, and every
    result node is graph-reachable within `hops` of the medoid entry
    (the walk cannot teleport)."""
    from smart_ocr_ray.ops.similarity import (
        _centroid_medoid,
        embedding_knn_graph,
        graph_ann_recall,
        graph_ann_search,
    )

    sf = "/root/testdata/sf0.001"
    rec = graph_ann_recall(sf).take_all()
    assert len(rec) == 5
    assert sum(r["n_common"] for r in rec) >= 45  # >= 90% mean recall

    out1 = graph_ann_search(sf).take_all()
    out2 = graph_ann_search(sf).take_all()
    key = lambda r: (r["query_id"], r["rank"])  # noqa: E731
    assert sorted(out1, key=key) == sorted(out2, key=key)
    assert {r["rank"] for r in out1} == set(range(1, 11))

    # reachability: BFS over the knn graph from the entry point
    entry = _centroid_medoid(sf)
    edges = {}
    for r in embedding_knn_graph(sf, k=10).take_all():
        edges.setdefault(int(r["vec_id"]), []).append(int(r["nbr"]))
    seen = {entry}
    frontier = [entry]
    for _ in range(5):
        frontier = [n for v in frontier for n in edges.get(v, []) if n not in seen]
        seen.update(frontier)
    assert {int(r["vec_id"]) for r in out1} <= seen


def test_graph_ann_serving_cache(ray_session, monkeypatch):
    """The serving index is session-cached: after one search has built
    the (graph, embeddings, entry) triple for a corpus, a second search
    must NOT rebuild the kNN graph (the ~70% cost center) and must
    return byte-identical results off the cached index."""
    from smart_ocr_ray.ops import similarity

    sf = "/root/testdata/sf0.001"
    cold = similarity.graph_ann_search(sf).take_all()
    assert similarity._SERVING_CACHE  # populated by the cold call

    def _boom(*a, **kw):  # a rebuild on the warm path is a cache miss
        raise AssertionError("kNN graph rebuilt despite warm cache")

    monkeypatch.setattr(similarity, "embedding_knn_graph", _boom)
    monkeypatch.setattr(similarity, "_centroid_medoid", _boom)
    warm = similarity.graph_ann_search(sf).take_all()
    key = lambda r: (r["query_id"], r["rank"])  # noqa: E731
    assert sorted(cold, key=key) == sorted(warm, key=key)


def test_robots_filter_longest_match(ray_session, tmp_path):
    """robots_filter: RFC 9309 longest-match with allow-beating-
    disallow on the synthesized per-host rules — verified against a
    per-row Python reference on a crafted url set covering allow-
    overrides-disallow, plain disallow, second disallow, no-match,
    and bare-host (path '/') cases."""
    import hashlib

    import pyarrow as pa
    import pyarrow.parquet as pq

    from smart_ocr_ray.ops.urls import robots_filter

    host = "h.test"
    seed = hashlib.md5(host.encode()).hexdigest()
    a, b, c = seed[0], seed[1], seed[2]
    urls = [
        f"https://{host}/{a}{b}/deep",   # allow (longest) overrides d1
        f"https://{host}/{a}zz",          # d1 only -> disallowed
        f"https://{host}/{c}x",           # d2 (if c != a) or d1
        f"https://{host}/zzz",            # no rule (unless z collides)
        f"https://{host}",                # bare host -> path '/'
    ]
    d = tmp_path / "robots"; d.mkdir()
    pq.write_table(pa.Table.from_pydict({"url": pa.array(urls, pa.string())}), d / "p.parquet")
    out = {r["url"]: r for r in robots_filter(str(d)).take_all()}

    def ref(path):
        rules = [("disallow", "/" + a), ("allow", "/" + a + b), ("disallow", "/" + c)]
        best = None
        for kind, rp in rules:
            if path.startswith(rp):
                key = (len(rp), kind == "allow")
                if best is None or key > best[0]:
                    best = (key, kind, rp)
        if best is None:
            return True, ""
        return best[1] == "allow", f"{best[1]}:{best[2]}"

    for u in urls:
        path = u.split(host, 1)[1] or "/"
        want_ok, want_rule = ref(path)
        assert out[u]["allowed"] == want_ok, (u, out[u], want_rule)
        assert out[u]["matched_rule"] == want_rule, (u, out[u])
    assert out[f"https://{host}/{a}{b}/deep"]["allowed"]
    assert not out[f"https://{host}/{a}zz"]["allowed"]


def test_mojibake_repair_known_values(ray_session, tmp_path):
    """mojibake_repair: a crafted cp1252 double-encoding corpus
    repairs to the exact expected strings (verified via md5) with
    exact fix counts; clean text is untouched; the bank round-trips
    (each broken form IS the cp1252 mis-decoding of its target)."""
    import hashlib

    import pyarrow as pa
    import pyarrow.parquet as pq

    from smart_ocr_ray.ops.mojibake import MOJIBAKE_BANK, mojibake_repair

    for broken, fixed in MOJIBAKE_BANK:
        assert fixed.encode("utf-8").decode("cp1252") == broken

    # doc_ids chosen so the deterministic seeding adds nothing:
    # id % 3 == 2 and id % 5 != 0  ->  2, 8, 14
    rows = {
        2: ("cafÃ© crÃ¨me â€“ itâ€™s fine", "café crème – it’s fine", 4),
        8: ("plain ascii stays put", "plain ascii stays put", 0),
        14: ("naÃ¯ve stays broken (not in bank) Ã©", "naÃ¯ve stays broken (not in bank) é", 1),
    }
    sf = tmp_path / "moji"; sf.mkdir()
    pq.write_table(
        pa.Table.from_pydict({
            "doc_id": pa.array(list(rows), pa.int64()),
            "text": pa.array([v[0] for v in rows.values()], pa.string()),
        }),
        sf / "documents.parquet",
    )
    out = {r["doc_id"]: r for r in mojibake_repair(str(sf)).take_all()}
    for doc_id, (_src, want, n) in rows.items():
        assert out[doc_id]["n_fixes"] == n, (doc_id, out[doc_id])
        assert out[doc_id]["fixed_md5"] == hashlib.md5(want.encode()).hexdigest(), doc_id


def test_sitemap_discovery_multi_host(ray_session, tmp_path):
    """sitemap_discovery: per-host build→parse→diff matches a Python
    reference on a multi-host corpus — listed/crawled md5 coins, two
    synthetic always-discovered urls per host, and the parsed-XML
    counts (a serializer/parser mismatch would break them)."""
    import hashlib

    import pyarrow as pa
    import pyarrow.parquet as pq

    from smart_ocr_ray.ops.urls import sitemap_discovery

    urls = [
        f"https://h{k}.test/p/{i}" for k in range(3) for i in range(40)
    ]
    d = tmp_path / "pages"; d.mkdir()
    pq.write_table(pa.Table.from_pydict({"url": pa.array(urls, pa.string())}), d / "p.parquet")
    out = {r["host"]: r for r in sitemap_discovery(str(d)).take_all()}
    assert set(out) == {"h0.test", "h1.test", "h2.test"}
    for k in range(3):
        host = f"h{k}.test"
        hu = [u for u in urls if f"//{host}/" in u]
        listed = [u for u in hu if hashlib.md5(u.encode()).hexdigest()[0] in "02468ace"]
        known = [u for u in listed if hashlib.md5(u.encode()).hexdigest()[1] in "02468ace"]
        r = out[host]
        assert r["n_listed"] == len(listed) + 2
        assert r["n_known"] == len(known)
        assert r["n_discovered"] == len(listed) - len(known) + 2
        assert r["n_listed"] == r["n_known"] + r["n_discovered"]


def test_zorder_cells_pruning(ray_session, tmp_path):
    """zorder_cells: matches a pure-Python Morton reference on a
    crafted events table, and shows the property the layout exists
    for — the mid-range octave query on BOTH dims prunes most cells
    (a single-key sort could only bound one dimension)."""
    import datetime as dt
    import random

    import pyarrow as pa
    import pyarrow.parquet as pq

    from smart_ocr_ray.ops.storage import zorder_cells

    rng = random.Random(3)
    t0 = dt.datetime(2024, 1, 1)
    n = 4000
    users = [rng.randrange(1000) for _ in range(n)]
    hours = [rng.randrange(500) for _ in range(n)]
    sf = tmp_path / "zo"; sf.mkdir()
    pq.write_table(
        pa.Table.from_pydict({
            "event_id": pa.array(range(n), pa.int64()),
            "ts": pa.array(
                [t0 + dt.timedelta(hours=h) for h in hours],
                pa.timestamp("us"),
            ),
            "user_id": pa.array(users, pa.int64()),
            "event_type": pa.array(["click"] * n),
            "value": pa.array([0.0] * n),
            "props": pa.array([""] * n),
        }),
        sf / "events.parquet",
    )

    umin, uspan = min(users), max(1, max(users) - min(users))
    h0 = [int((t0 + dt.timedelta(hours=h) - dt.datetime(1970, 1, 1))
              .total_seconds()) // 3600 for h in hours]
    hmin, hspan = min(h0), max(1, max(h0) - min(h0))
    ref = {}
    for u0, hh in zip(users, h0):
        un = (u0 - umin) * 65535 // uspan
        hn = (hh - hmin) * 65535 // hspan
        z = 0
        for i in range(16):
            z |= ((un >> i) & 1) << (2 * i)
            z |= ((hn >> i) & 1) << (2 * i + 1)
        c = z >> 24
        r = ref.setdefault(c, [0, un, un, hn, hn])
        r[0] += 1
        r[1], r[2] = min(r[1], un), max(r[2], un)
        r[3], r[4] = min(r[3], hn), max(r[4], hn)
    q1, q2 = 65535 * 3 // 8, 65535 * 4 // 8
    rows = zorder_cells(str(sf)).take_all()
    assert {r["cell"] for r in rows} == set(ref)
    for r in rows:
        n_, umn, umx, hmn, hmx = ref[r["cell"]]
        assert (r["n_rows"], r["u_min"], r["u_max"], r["h_min"], r["h_max"]) \
            == (n_, umn, umx, hmn, hmx)
        overlap = umn <= q2 and umx >= q1 and hmn <= q2 and hmx >= q1
        assert r["pruned"] == (0 if overlap else 1)
    pruned = sum(r["pruned"] for r in rows)
    # the 2-D point: the octave query touches ~1/8 of each axis, so
    # the vast majority of quadtree cells are skippable
    assert pruned > len(rows) * 3 // 4
    assert pruned < len(rows)  # and the query does hit something


def test_cdc_dedup_self_healing(ray_session, tmp_path):
    """cdc_dedup: matches a pure-Python reference of the frozen
    Manber-anchor rule, and exhibits the CDC property the fixed-window
    passes lack — inserting ONE token near the front of a copied
    document shifts every later position, yet chunking re-syncs at the
    next anchor, so most of the copy's chunks still dedup against the
    original."""
    import hashlib
    import random

    import pyarrow as pa
    import pyarrow.parquet as pq

    from smart_ocr_ray.ops.dedup import cdc_dedup

    md5 = lambda s: hashlib.md5(s.encode()).hexdigest()  # noqa: E731
    rng = random.Random(7)
    vocab = [f"tok{i}" for i in range(200)]
    base = [rng.choice(vocab) for _ in range(400)]
    mutated = base[:5] + ["zzz_inserted"] + base[5:]
    texts = {
        0: " ".join(base),
        1: " ".join(mutated),
        2: " ".join(rng.choice(vocab) for _ in range(100)),  # unrelated
        3: "",  # no tokens -> no output row
    }
    sf = tmp_path / "cdc"; sf.mkdir()
    pq.write_table(
        pa.Table.from_pydict({
            "doc_id": pa.array(sorted(texts), pa.int64()),
            "text": pa.array([texts[k] for k in sorted(texts)], pa.string()),
        }),
        sf / "documents.parquet",
    )

    def chunks_of(text):
        toks = text.lower().split()
        out, start = [], 0
        for i, tok in enumerate(toks):
            if md5(tok)[0] == "0" or i == len(toks) - 1:
                out.append(toks[start : i + 1])
                start = i + 1
        return out

    from collections import Counter

    owners = Counter()
    per_doc = {}
    for d, t in texts.items():
        cs = chunks_of(t)
        per_doc[d] = cs
        for key in {md5(" ".join(c))[:16] for c in cs}:
            owners[key] += 1
    rows = {r["doc_id"]: r for r in cdc_dedup(str(sf)).take_all()}
    assert set(rows) == {0, 1, 2}
    for d in rows:
        cs = per_doc[d]
        hot = [c for c in cs if owners[md5(" ".join(c))[:16]] >= 2]
        ntok = len(texts[d].split())
        r = rows[d]
        assert r["n_tokens"] == ntok
        assert r["n_chunks"] == len(cs)
        assert r["n_hot_chunks"] == len(hot)
        assert r["covered_tokens"] == sum(len(c) for c in hot)
        assert r["coverage_e6"] == 1_000_000 * sum(len(c) for c in hot) // ntok
    # self-healing: the single insertion perturbs only the chunk it
    # lands in; everything after the next anchor re-syncs, so the
    # mutated copy still dedups most of its tokens against the base.
    assert rows[1]["coverage_e6"] > 600_000
    # and the unrelated doc shares nothing
    assert rows[2]["n_hot_chunks"] == 0


def test_cdc_delta_reuse(ray_session, tmp_path):
    """cdc_delta: per-doc chunk reuse vs the synthesized prev snapshot
    matches a Python reference of the frozen rules, unchanged docs
    (doc_id % 3 == 2) reuse 100%, and the pure-insertion mutation
    (doc_id % 3 == 0) still reuses most tokens — the anchor re-sync
    that motivates CDC over positional chunking."""
    import hashlib
    import random

    import pyarrow as pa
    import pyarrow.parquet as pq

    from smart_ocr_ray.ops.dedup import _cdc_spans, cdc_delta

    md5 = lambda s: hashlib.md5(s.encode()).hexdigest()  # noqa: E731
    rng = random.Random(11)
    vocab = [f"w{i}" for i in range(300)]
    texts = {
        d: " ".join(rng.choice(vocab) for _ in range(rng.randint(50, 400)))
        for d in range(30)
    }
    sf = tmp_path / "cdl"; sf.mkdir()
    pq.write_table(
        pa.Table.from_pydict({
            "doc_id": pa.array(sorted(texts), pa.int64()),
            "text": pa.array([texts[d] for d in sorted(texts)], pa.string()),
        }),
        sf / "documents.parquet",
    )

    def chunk_keys(toks):
        return [
            (md5(" ".join(toks[s:e]))[:16], e - s) for s, e in _cdc_spans(toks)
        ]

    store = set()
    for d, t in texts.items():
        toks = t.lower().split()
        prev = (["drift0"] + toks if d % 3 == 0
                else toks[1:] if d % 3 == 1 else toks)
        store.update(k for k, _ in chunk_keys(prev))
    rows = {r["doc_id"]: r for r in cdc_delta(str(sf)).take_all()}
    assert set(rows) == set(texts)
    for d, t in texts.items():
        cks = chunk_keys(t.lower().split())
        new = [(k, n) for k, n in cks if k not in store]
        ntok = len(t.split())
        r = rows[d]
        assert r["n_tokens"] == ntok
        assert r["n_chunks"] == len(cks)
        assert r["n_new_chunks"] == len(new)
        assert r["new_tokens"] == sum(n for _, n in new)
        assert r["reuse_e6"] == 1_000_000 * (ntok - r["new_tokens"]) // ntok
    unchanged = [rows[d]["reuse_e6"] for d in texts if d % 3 == 2]
    assert unchanged and all(v == 1_000_000 for v in unchanged)
    inserted = [rows[d]["reuse_e6"] for d in texts if d % 3 == 0]
    assert sum(inserted) / len(inserted) > 600_000


def test_sitemap_index_chunked(ray_session, tmp_path):
    """sitemap_index: hash-sharded child sitemaps + parsed index match
    a Python reference per host — n_sitemaps = distinct chunks over
    advertised urls (including a tiny host whose synthetic urls land
    in chunks with no page urls, the stage-2 inline-build path), and
    the url totals agree with sitemap_discovery exactly."""
    import hashlib

    import pyarrow as pa
    import pyarrow.parquet as pq

    from smart_ocr_ray.ops.urls import sitemap_discovery, sitemap_index

    md5 = lambda s: hashlib.md5(s.encode()).hexdigest()  # noqa: E731
    # h0/h1: 40 urls each; tiny.test: ONE url — its two synthetic urls
    # almost surely hash to chunks with no page url (16 chunks).
    urls = [f"https://h{k}.test/p/{i}" for k in range(2) for i in range(40)]
    urls.append("https://tiny.test/only")
    d = tmp_path / "pages"; d.mkdir()
    pq.write_table(
        pa.Table.from_pydict({"url": pa.array(urls, pa.string())}),
        d / "p.parquet",
    )
    out = {r["host"]: r for r in sitemap_index(str(d)).take_all()}
    disc = {r["host"]: r for r in sitemap_discovery(str(d)).take_all()}
    assert set(out) == {"h0.test", "h1.test", "tiny.test"}
    for host in out:
        hu = [u for u in urls if f"//{host}/" in u]
        listed = [u for u in hu if md5(u)[0] in "02468ace"]
        known = [u for u in listed if md5(u)[1] in "02468ace"]
        seed = md5(host)[:4]
        adv = listed + [f"https://{host}/new/{seed}/{i}" for i in (0, 1)]
        chunks = {int(md5(u)[2], 16) % 16 for u in adv}
        r = out[host]
        assert r["n_sitemaps"] == len(chunks)
        assert r["n_listed"] == len(adv)
        assert r["n_known"] == len(known)
        assert r["n_discovered"] == len(adv) - len(known)
        # totals identical to the unsharded op
        for col in ("n_listed", "n_known", "n_discovered"):
            assert r[col] == disc[host][col]
    # the tiny host: 1 page url -> at most 1 page chunk, so at least
    # one synthetic chunk was built inline by the host rollup
    tiny_listed = [u for u in ["https://tiny.test/only"] if md5(u)[0] in "02468ace"]
    assert out["tiny.test"]["n_sitemaps"] >= 2 - len(tiny_listed)


def test_corpus_drift_tv(ray_session, tmp_path):
    """corpus_drift: exact TV distance on crafted corpora — identical
    halves give 0, disjoint vocabularies give 1e6, and a hand-built
    mixed case matches the cross-multiplied integer formula."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from smart_ocr_ray.ops.text_analysis import corpus_drift

    def write(texts, name):
        sf = tmp_path / name; sf.mkdir()
        pq.write_table(
            pa.Table.from_pydict({
                "doc_id": pa.array(sorted(texts), pa.int64()),
                "text": pa.array([texts[k] for k in sorted(texts)], pa.string()),
            }),
            sf / "documents.parquet",
        )
        return str(sf)

    # identical mixes on both sides -> TV 0
    (r,) = corpus_drift(
        write({0: "a b c", 1: "a b c", 2: "a b c", 3: "a b c"}, "same")
    ).take_all()
    assert r["tv_e6"] == 0 and r["vocab_union"] == 3

    # disjoint vocabularies -> TV 1
    (r,) = corpus_drift(write({0: "x y", 1: "p q"}, "disj")).take_all()
    assert r["tv_e6"] == 1_000_000
    assert (r["vocab_a"], r["vocab_b"], r["vocab_union"]) == (2, 2, 4)

    # mixed: side A = 'a a b' (N1=3), side B = 'a c' (N2=2)
    # S = |2*2-1*3| + |1*2-0| + |0-1*3| = 1 + 2 + 3 = 6
    # TV = 6 / (2*3*2) = 0.5
    (r,) = corpus_drift(write({0: "a a b", 1: "a c"}, "mix")).take_all()
    assert (r["n_tokens_a"], r["n_tokens_b"]) == (3, 2)
    assert r["tv_e6"] == 500_000


def test_kcenter_greedy_diversity(ray_session):
    """kcenter_greedy: valid Gonzalez trace — seed is the lowest
    vec_id, picks are distinct, nearest_sim is non-decreasing (each
    new center is the farthest remaining point, so gaps only close),
    and step 2 is the true argmin of similarity to the seed."""
    import numpy as np
    import pyarrow.parquet as pq

    from smart_ocr_ray.ops.similarity import kcenter_greedy

    sf = "/root/testdata/sf0.001"
    rows = sorted(kcenter_greedy(sf).take_all(), key=lambda r: r["step"])
    assert [r["step"] for r in rows] == [1, 2, 3, 4, 5]
    assert len({r["vec_id"] for r in rows}) == 5
    sims_seq = [r["nearest_sim_e3"] for r in rows[1:]]
    assert all(a <= b for a, b in zip(sims_seq, sims_seq[1:]))

    t = pq.read_table(f"{sf}/embeddings.parquet", columns=["vec_id", "embedding"])
    ids = np.asarray(t.column("vec_id").to_pylist())
    m = ids < 400
    ids = ids[m]
    emb = np.asarray([np.asarray(e, float) for e in t.column("embedding").to_pylist()])[m]
    emb = emb / np.linalg.norm(emb, axis=1, keepdims=True)
    order = np.argsort(ids)
    ids, emb = ids[order], emb[order]
    assert rows[0]["vec_id"] == int(ids[0])
    s0 = np.round(1000 * emb @ emb[0]).astype(np.int64)
    s0[0] = np.iinfo(np.int64).max
    assert rows[1]["vec_id"] == int(ids[np.argmin(s0)])
    assert rows[1]["nearest_sim_e3"] == int(s0.min())


def test_redirect_resolve_chains(ray_session, tmp_path):
    """redirect_resolve: matches a Python reference chain-follow on a
    crafted url set, chain lengths are data-dependent (the corpus
    exercises hops 0 and >=1), and the follow-depth budget flags
    still-redirecting chains."""
    import hashlib

    import pyarrow as pa
    import pyarrow.parquet as pq

    from smart_ocr_ray.ops.urls import redirect_resolve

    md5 = lambda s: hashlib.md5(s.encode()).hexdigest()  # noqa: E731
    urls = [f"https://h.test/p/{i}" for i in range(300)]
    d = tmp_path / "rr"; d.mkdir()
    pq.write_table(
        pa.Table.from_pydict({"url": pa.array(urls, pa.string())}),
        d / "p.parquet",
    )

    def ref(u, max_hops=8):
        host = u[: u.index("/", 8)]
        cur, h = u, 0
        while h < max_hops and md5(cur)[3] in "0123":
            cur = f"{host}/r/{md5(cur)[4:12]}"
            h += 1
        still = h == max_hops and md5(cur)[3] in "0123"
        return cur, h, 0 if still else 1

    rows = {r["url"]: r for r in redirect_resolve(str(d)).take_all()}
    assert set(rows) == set(urls)
    hop_counts = set()
    for u in urls:
        fin, h, term = ref(u)
        r = rows[u]
        assert (r["final_url"], r["n_hops"], r["terminated"]) == (fin, h, term)
        hop_counts.add(h)
    assert 0 in hop_counts and max(hop_counts) >= 2  # geometric chains


def test_coreset_greedy_submodular(ray_session):
    """coreset_greedy: the greedy trace is valid — k distinct picks,
    strictly increasing objective, non-increasing marginal gains (the
    submodularity certificate for facility location), and step 1
    picks the argmax of total similarity mass."""
    import numpy as np

    from smart_ocr_ray.ops.similarity import coreset_greedy

    sf = "/root/testdata/sf0.001"
    rows = sorted(coreset_greedy(sf).take_all(), key=lambda r: r["step"])
    assert [r["step"] for r in rows] == [1, 2, 3, 4, 5]
    assert len({r["vec_id"] for r in rows}) == 5
    gains = [r["gain"] for r in rows]
    assert all(g > 0 for g in gains)
    assert all(a >= b for a, b in zip(gains, gains[1:]))  # submodular
    objs = [r["objective"] for r in rows]
    assert all(o2 == o1 + g for o1, o2, g in zip(objs, objs[1:], gains[1:]))

    # step-1 ground truth: argmax_c sum_p round(1000 cos(p, c))
    import pyarrow.parquet as pq

    t = pq.read_table(f"{sf}/embeddings.parquet", columns=["vec_id", "embedding"])
    ids = np.asarray(t.column("vec_id").to_pylist())
    m = ids < 400
    ids = ids[m]
    emb = np.asarray([np.asarray(e, float) for e in t.column("embedding").to_pylist()])[m]
    emb = emb / np.linalg.norm(emb, axis=1, keepdims=True)
    order = np.argsort(ids)
    ids, emb = ids[order], emb[order]
    sims = np.round(1000 * emb @ emb.T).astype(np.int64)
    best = int(ids[np.argmax(sims.sum(axis=0))])
    assert rows[0]["vec_id"] == best


def test_minhash_recall_eval(ray_session):
    """minhash_recall_eval: counts and e6 ratios equal a direct
    recomputation from the two constituent ops' own outputs on
    sf0.001, and the audit's whole point holds — MinHash at 64 perms
    finds the (near-)duplicate mass (high recall) on this corpus."""
    from smart_ocr_ray.ops.dedup import (
        dedup_minhash_lsh,
        minhash_recall_eval,
        ngram_jaccard_pairs,
    )

    sf = "/root/testdata/sf0.001"
    exact = {
        (r["left_id"], r["right_id"])
        for r in ngram_jaccard_pairs(sf).take_all()
        if r["jaccard_sim"] >= 0.7
    }
    est = {
        (r["left_id"], r["right_id"])
        for r in dedup_minhash_lsh(sf).take_all()
        if r["left_id"] < 300 and r["right_id"] < 300
    }
    common = len(exact & est)
    (row,) = minhash_recall_eval(sf).take_all()
    assert (row["n_exact"], row["n_est"], row["n_common"]) == (
        len(exact), len(est), common)
    assert row["recall_e6"] == (
        1_000_000 * common // len(exact) if exact else 1_000_000)
    assert row["precision_e6"] == (
        1_000_000 * common // len(est) if est else 1_000_000)
    assert row["n_exact"] > 0 and row["recall_e6"] >= 800_000


def test_date_extract_priority(ray_session, tmp_path):
    """date_extract: meta beats ISO beats textual; textual converts
    with zero-padding; candidate counting sees all forms; dateless
    docs report ''. doc_ids chosen so each % 4 class appears with
    hand-computable month/day seeds."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from smart_ocr_ray.ops.text_analysis import date_extract

    # text of doc 8 additionally carries its own ISO date: the meta
    # tag must still win, and n_dates must count both
    texts = {
        8: "see 2019-12-31 notes",  # %4==0: meta seeded (m=9, d=9)
        5: "plain words",           # %4==1: textual (June 6, 2022)
        6: "changelog host",        # %4==2: ISO (2021-07-07)
        7: "no dates here",         # %4==3: nothing
    }
    sf = tmp_path / "dates"; sf.mkdir()
    pq.write_table(
        pa.Table.from_pydict({
            "doc_id": pa.array(sorted(texts), pa.int64()),
            "text": pa.array([texts[k] for k in sorted(texts)], pa.string()),
        }),
        sf / "documents.parquet",
    )
    rows = {r["doc_id"]: r for r in date_extract(str(sf)).take_all()}
    assert rows[8]["best_date"] == "2023-09-09" and rows[8]["n_dates"] == 2
    assert rows[5]["best_date"] == "2022-06-06" and rows[5]["n_dates"] == 1
    assert rows[6]["best_date"] == "2021-07-07" and rows[6]["n_dates"] == 1
    assert rows[7]["best_date"] == "" and rows[7]["n_dates"] == 0


def test_charset_sniff_kernel(ray_session, tmp_path):
    """charset_sniff: the byte-level kernel distinguishes the four
    encodings on a crafted corpus — BOMs win, bare UTF-8 validates,
    and the Latin-1 é byte (0xE9) is correctly rejected by strict
    UTF-8 — with exact byte/char accounting."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from smart_ocr_ray.ops.mojibake import charset_sniff

    texts = {0: "plain", 1: "bom", 2: "wide", 3: "legacy"}
    sf = tmp_path / "cs"; sf.mkdir()
    pq.write_table(
        pa.Table.from_pydict({
            "doc_id": pa.array(sorted(texts), pa.int64()),
            "text": pa.array([texts[k] for k in sorted(texts)], pa.string()),
        }),
        sf / "documents.parquet",
    )
    rows = {r["doc_id"]: r for r in charset_sniff(str(sf)).take_all()}
    # "plain café" = 10 chars; é is 2 utf-8 bytes -> 11 utf-8 bytes
    assert (rows[0]["charset"], rows[0]["n_bytes"], rows[0]["n_chars"]) == ("utf-8", 11, 10)
    # "bom café" = 8 chars, 9 utf-8 bytes + 3 BOM
    assert (rows[1]["charset"], rows[1]["n_bytes"], rows[1]["n_chars"]) == ("utf-8-sig", 12, 8)
    # "wide café" = 9 chars -> 18 + 2 BOM bytes
    assert (rows[2]["charset"], rows[2]["n_bytes"], rows[2]["n_chars"]) == ("utf-16le", 20, 9)
    # "legacy café" = 11 chars -> 11 latin-1 bytes (0xE9 not valid utf-8)
    assert (rows[3]["charset"], rows[3]["n_bytes"], rows[3]["n_chars"]) == ("latin-1", 11, 11)


def test_incremental_hourly_ivm(ray_session, tmp_path):
    """incremental_hourly: the maintained view (base + update deltas)
    equals a full recompute over the corrected log on a crafted
    multi-window table — counts unchanged by updates, +1.5 (150 on the
    exact e2 int64 grid) per corrected row landing in the right
    window; integer sums make the identity bit-for-bit."""
    import datetime as dt

    import pyarrow as pa
    import pyarrow.parquet as pq

    from smart_ocr_ray.ops.relational import incremental_hourly

    t0 = dt.datetime(2024, 1, 1)
    rows = [
        (1, 0, "click", 1.0), (7, 10, "click", 2.25),   # id 7 corrected
        (17, 70, "click", 3.0),                         # id 17 corrected
        (3, 65, "click", 4.0), (4, 130, "view", 5.5),
        (27, 135, "view", 0.25),                        # corrected
    ]
    sf = tmp_path / "ivm"; sf.mkdir()
    pq.write_table(
        pa.Table.from_pydict({
            "event_id": pa.array([r[0] for r in rows], pa.int64()),
            "ts": pa.array([t0 + dt.timedelta(minutes=r[1]) for r in rows], pa.timestamp("us")),
            "user_id": pa.array([0] * len(rows), pa.int64()),
            "event_type": pa.array([r[2] for r in rows]),
            "value": pa.array([r[3] for r in rows], pa.float64()),
            "props": pa.array([""] * len(rows)),
        }),
        sf / "events.parquet",
    )
    got = {
        (r["event_type"], r["window_start"].hour): (
            r["n_events"], r["sum_value_e2"],
        )
        for r in incremental_hourly(str(sf)).take_all()
    }
    assert got == {
        ("click", 0): (2, 100 + 225 + 150),
        ("click", 1): (2, 300 + 150 + 400),
        ("view", 2): (2, 550 + 25 + 150),
    }


def test_local_supplier_volume_q5(ray_session):
    """local_supplier_volume: the 6-way Q5 join chain (two hash joins
    + three broadcast lookups) matches DuckDB running the literal Q5
    SQL on the same tables, including the same-nation constraint and
    the one-year window."""
    import duckdb

    from smart_ocr_ray.ops.relational import local_supplier_volume

    sf = "/root/testdata/sf0.001"
    got = {
        r["n_name"]: r["revenue_e4"]
        for r in local_supplier_volume(sf).take_all()
    }
    con = duckdb.connect()
    want = dict(
        con.execute(f"""
            SELECT n_name,
                   CAST(sum(CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT)
                            * (100 - CAST(floor(l_discount * 100 + 0.5)
                                          AS BIGINT))) AS BIGINT)
            FROM '{sf}/lineitem.parquet'
            JOIN '{sf}/orders.parquet'   ON l_orderkey = o_orderkey
            JOIN '{sf}/customer.parquet' ON o_custkey = c_custkey
            JOIN '{sf}/supplier.parquet' ON l_suppkey = s_suppkey
            JOIN '{sf}/nation.parquet'   ON c_nationkey = n_nationkey
            JOIN '{sf}/region.parquet'   ON n_regionkey = r_regionkey
            WHERE s_nationkey = c_nationkey AND r_name = 'ASIA'
              AND o_orderdate >= DATE '1996-01-01'
              AND o_orderdate <  DATE '1997-01-01'
            GROUP BY n_name
        """).fetchall()
    )
    assert got == want and got


def test_classifier_agreement_kappa(ray_session):
    """classifier_agreement: the 2x2 table and kappa equal a Python
    recomputation from the two gates' own outputs on sf0.001 (join on
    docs scored by both, frozen e6 floor formulas)."""
    from smart_ocr_ray.ops.text_analysis import (
        classifier_agreement,
        quality_classifier,
        quality_filter,
    )

    sf = "/root/testdata/sf0.001"
    fk = {r["doc_id"]: int(r["keep"]) for r in quality_filter(sf).take_all()}
    ck = {r["doc_id"]: int(r["keep"]) for r in quality_classifier(sf).take_all()}
    both = sorted(set(fk) & set(ck))
    n = len(both)
    n11 = sum(1 for d in both if fk[d] == 1 and ck[d] == 1)
    n10 = sum(1 for d in both if fk[d] == 1 and ck[d] == 0)
    n01 = sum(1 for d in both if fk[d] == 0 and ck[d] == 1)
    n00 = n - n11 - n10 - n01
    p_o = 1_000_000 * (n11 + n00) // n
    p_e = 1_000_000 * ((n11 + n10) * (n11 + n01) + (n01 + n00) * (n10 + n00)) // (n * n)
    num, den = 1_000_000 * (p_o - p_e), 1_000_000 - p_e
    kappa = 0 if den == 0 else (-((-num) // den) if num < 0 else num // den)

    (row,) = classifier_agreement(sf).take_all()
    assert (row["n_docs"], row["n11"], row["n10"], row["n01"], row["n00"]) == (
        n, n11, n10, n01, n00)
    assert (row["p_o_e6"], row["p_e_e6"], row["kappa_e6"]) == (p_o, p_e, kappa)
    assert n > 0 and 0 < row["p_o_e6"] <= 1_000_000


def test_compression_quality(ray_session, tmp_path):
    """compression_quality: a highly repetitive doc deflates below
    the keep threshold while natural-ish prose stays above; values
    equal the stdlib zlib level-9 kernel exactly; empty docs report
    ratio 1e6 and keep."""
    import random
    import zlib

    import pyarrow as pa
    import pyarrow.parquet as pq

    from smart_ocr_ray.ops.text_analysis import compression_quality

    rng = random.Random(9)
    vocab = [f"word{i}" for i in range(5000)]
    texts = {
        0: "spam " * 3000,                                     # repetitive
        1: " ".join(rng.choice(vocab) for _ in range(3000)),   # diverse
        2: "",                                                 # empty
    }
    sf = tmp_path / "cq"; sf.mkdir()
    pq.write_table(
        pa.Table.from_pydict({
            "doc_id": pa.array(sorted(texts), pa.int64()),
            "text": pa.array([texts[k] for k in sorted(texts)], pa.string()),
        }),
        sf / "documents.parquet",
    )
    rows = {r["doc_id"]: r for r in compression_quality(str(sf)).take_all()}
    for d, t in texts.items():
        raw = t.encode()
        comp = len(zlib.compress(raw, 9))
        r = rows[d]
        assert (r["raw_bytes"], r["zlib_bytes"]) == (len(raw), comp)
        assert r["ratio_e6"] == (1_000_000 * comp // len(raw) if raw else 1_000_000)
    assert rows[0]["keep"] == 0 and rows[0]["ratio_e6"] < 250_000
    assert rows[1]["keep"] == 1 and rows[1]["ratio_e6"] > 250_000
    assert rows[2]["keep"] == 1 and rows[2]["ratio_e6"] == 1_000_000


def test_script_profile_majority(ray_session, tmp_path):
    """script_profile: per-script counts and the name-ascending
    first-max majority rule on crafted mixed-script docs, including
    the all-zero fallback and a Han-majority page with Latin noise."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from smart_ocr_ray.ops.text_analysis import script_profile

    texts = {
        4: "",                     # %5==4: no snippet, no text -> fallback
        9: "abc",                  # latin only
        14: "你好世界你好 ok",     # han 6 > latin 2
        19: "ab",                  # %5==4 again, latin
        5: "xy",                   # %5==0: + Cyrillic snippet (9 chars > 2)
    }
    sf = tmp_path / "script"; sf.mkdir()
    pq.write_table(
        pa.Table.from_pydict({
            "doc_id": pa.array(sorted(texts), pa.int64()),
            "text": pa.array([texts[k] for k in sorted(texts)], pa.string()),
        }),
        sf / "documents.parquet",
    )
    rows = {r["doc_id"]: r for r in script_profile(str(sf)).take_all()}
    assert rows[4]["majority"] == "latin" and rows[4]["n_latin"] == 0
    assert rows[9]["majority"] == "latin" and rows[9]["n_latin"] == 3
    assert rows[14]["majority"] == "han"
    assert rows[14]["n_han"] == 6 and rows[14]["n_latin"] == 2
    assert rows[19]["majority"] == "latin"
    assert rows[5]["majority"] == "cyrillic"
    assert rows[5]["n_cyrillic"] == 9 and rows[5]["n_latin"] == 2


def test_gif_frame_phash(ray_session, tmp_path):
    """gif_frame_phash: the aHash kernel is perceptual (small pixel
    noise keeps the signature, inversion flips it), and the op's
    buckets over really-decoded frames match an independent Python
    reconstruction from the md5-hex stream (the oracle's arithmetic,
    re-derived here without the decoder)."""
    import hashlib

    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    from smart_ocr_ray.ops.multimodal import _ahash64, gif_frame_phash

    rng = np.random.default_rng(17)
    # high-contrast structure: cells sit far from the global mean, so
    # small pixel noise cannot flip signature bits
    img = np.where(
        np.arange(20)[:, None] < 10, 40, 200
    ).astype(np.uint8) * np.ones((1, 30), np.uint8)
    noisy = np.clip(
        img.astype(np.int16) + rng.integers(-2, 3, img.shape), 0, 255
    ).astype(np.uint8)
    assert _ahash64(img) == _ahash64(noisy)          # perceptual
    assert _ahash64(img) != _ahash64(255 - img)      # and discriminative
    assert len(_ahash64(img)) == 64

    texts = {d: f"doc number {d} body" for d in range(12)}
    texts[7] = texts[3]  # identical text -> identical frame streams
    sf = tmp_path / "ph"; sf.mkdir()
    pq.write_table(
        pa.Table.from_pydict({
            "doc_id": pa.array(sorted(texts), pa.int64()),
            "text": pa.array([texts[d] for d in sorted(texts)], pa.string()),
        }),
        sf / "documents.parquet",
    )

    ref: dict = {}
    for d, t in texts.items():
        if d % 9 == 4:
            continue  # truncated payload, no decoded frames
        seed = hashlib.md5(t.encode()).hexdigest()
        stream = (seed * 40).encode("ascii")
        w, h, nf = 8 + d % 24, 8 + (d * 5) % 24, 2 + d % 3
        for f in range(nf):
            gray = np.frombuffer(stream[f * 7 : f * 7 + w * h], np.uint8)
            key = _ahash64(gray.reshape(h, w))
            ref.setdefault(key, []).append((f"gif://doc/{d}", f))
    rows = {r["ahash"]: r for r in gif_frame_phash(str(sf)).take_all()}
    assert set(rows) == set(ref)
    for k, members in ref.items():
        members.sort()
        r = rows[k]
        assert r["n_frames"] == len(members)
        assert r["n_urls"] == len({u for u, _ in members})
        assert (r["rep_url"], r["rep_frame"]) == members[0]


def test_readability_counts(ray_session, tmp_path):
    """readability: hand-computed words/sentences/syllables on crafted
    docs — vowel-run syllables with the zero-vowel floor, [.!?]+
    sentence runs with the no-punctuation floor, empty docs excluded —
    and the frozen e3 floor-division formulas."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from smart_ocr_ray.ops.text_analysis import readability

    texts = {
        0: "The cat sat on the mat. It was happy!",
        1: "xyz qrst",        # zero-vowel words -> 1 syllable each, S floor
        2: "",                 # no words -> excluded
        3: "Wait... what?! Ok", # runs: "..." "?!" -> 2 sentences
    }
    sf = tmp_path / "read"; sf.mkdir()
    pq.write_table(
        pa.Table.from_pydict({
            "doc_id": pa.array(sorted(texts), pa.int64()),
            "text": pa.array([texts[k] for k in sorted(texts)], pa.string()),
        }),
        sf / "documents.parquet",
    )
    rows = {r["doc_id"]: r for r in readability(str(sf)).take_all()}
    assert set(rows) == {0, 1, 3}
    expect = {
        0: (9, 2, 10),  # "happy!" has runs 'a' + 'y' = 2; the rest 1 each
        1: (2, 1, 2),   # floors: no vowels -> 1 each; no punct -> S=1
        3: (3, 2, 3),   # runs: wait('ai') what('a') ok('o'); "..." "?!"
    }
    for d, (W, S, Syl) in expect.items():
        r = rows[d]
        assert (r["n_words"], r["n_sentences"], r["n_syllables"]) == (W, S, Syl)
        assert r["fk_grade_e3"] == (390 * W) // S + (11800 * Syl) // W - 15590
        assert r["ease_e3"] == 206_835 - (1015 * W) // S - (84_600 * Syl) // W


def test_events_late_watermark(ray_session, tmp_path):
    """events_late: hand-computed watermark classification on a
    crafted out-of-order arrival log (on-time / late / dropped, global
    watermark across event types, first arrival never late), plus a
    2000-event randomized corpus over many row groups checked against
    a Python reference — the multi-block prefix-scan path."""
    import datetime as dt
    import random

    import pyarrow as pa
    import pyarrow.parquet as pq

    from smart_ocr_ray.ops.relational import events_late

    t0 = dt.datetime(2024, 1, 1)

    def write(rows, path, rg):
        pq.write_table(
            pa.Table.from_pydict({
                "event_id": pa.array([r[0] for r in rows], pa.int64()),
                "ts": pa.array(
                    [t0 + dt.timedelta(minutes=r[1]) for r in rows],
                    pa.timestamp("us"),
                ),
                "user_id": pa.array([0] * len(rows), pa.int64()),
                "event_type": pa.array([r[2] for r in rows]),
                "value": pa.array([0.0] * len(rows)),
                "props": pa.array([""] * len(rows)),
            }),
            path, row_group_size=rg,
        )

    # minutes from t0; arrival order = event_id
    crafted = [
        (1, 600, "click"),   # 10:00  first -> on time
        (2, 585, "click"),   # 09:45  wm 09:30 -> on time
        (3, 560, "click"),   # 09:20  wm 09:30 -> late
        (4, 480, "click"),   # 08:00  wm 09:30 -> late + dropped
        (5, 630, "click"),   # 10:30  on time, watermark advances
        (6, 599, "click"),   # 09:59  wm 10:00 -> late
        (7, 540, "view"),    # 09:00  wm 10:00 -> late (global watermark)
    ]
    d1 = tmp_path / "late1"; d1.mkdir()
    write(crafted, d1 / "events.parquet", 2)
    got = {
        (r["event_type"], r["window_start"].hour): (
            r["n_events"], r["n_late"], r["n_dropped"])
        for r in events_late(str(d1)).take_all()
    }
    assert got == {
        ("click", 10): (2, 0, 0),
        ("click", 9): (3, 2, 0),
        ("click", 8): (1, 1, 1),
        ("view", 9): (1, 1, 0),
    }

    rng = random.Random(5)
    big = [
        (i, rng.randrange(0, 48 * 60), rng.choice(["click", "view"]))
        for i in range(2000)
    ]
    d2 = tmp_path / "late2"; d2.mkdir()
    write(big, d2 / "events.parquet", 50)
    ref: dict = {}
    hi = None
    for _, m, typ in big:  # already in event_id order
        tus = m * 60
        late = hi is not None and tus < hi - 1800
        dropped = hi is not None and tus < hi - 5400
        key = (typ, m // 60)
        n, l, dr = ref.get(key, (0, 0, 0))
        ref[key] = (n + 1, l + late, dr + dropped)
        hi = tus if hi is None else max(hi, tus)
    got2 = {
        (r["event_type"],
         int((r["window_start"] - t0).total_seconds()) // 3600): (
            r["n_events"], r["n_late"], r["n_dropped"])
        for r in events_late(str(d2)).take_all()
    }
    assert got2 == ref
    # small segments force the cross-segment seed path (the 2000
    # events span ~16 watermark segments instead of one)
    got3 = {
        (r["event_type"],
         int((r["window_start"] - t0).total_seconds()) // 3600): (
            r["n_events"], r["n_late"], r["n_dropped"])
        for r in events_late(str(d2), seg_size=128).take_all()
    }
    assert got3 == ref


def test_events_disorder_buckets(ray_session, tmp_path):
    """events_disorder: every severity bucket fires on a crafted
    arrival log (on-time, sub-minute, sub-hour, sub-day, >= 1 day)
    with hand-computed counts; bucket names sort in severity order."""
    import datetime as dt

    import pyarrow as pa
    import pyarrow.parquet as pq

    from smart_ocr_ray.ops.relational import events_disorder

    t0 = dt.datetime(2024, 1, 2)
    rows = [  # (event_id, minutes-from-t0)
        (1, 600.0),    # first -> on_time
        (2, 585.0),    # 15 min late -> 2_lt_1h
        (3, 480.0),    # 2 h late -> 3_lt_1d
        (4, 630.0),    # new max -> on_time
        (5, 629.5),    # 30 s late -> 1_lt_1m
        (6, -870.0),   # 25 h late -> 4_ge_1d
    ]
    sf = tmp_path / "dis"; sf.mkdir()
    pq.write_table(
        pa.Table.from_pydict({
            "event_id": pa.array([r[0] for r in rows], pa.int64()),
            "ts": pa.array(
                [t0 + dt.timedelta(minutes=r[1]) for r in rows],
                pa.timestamp("us"),
            ),
            "user_id": pa.array([0] * len(rows), pa.int64()),
            "event_type": pa.array(["click"] * len(rows)),
            "value": pa.array([0.0] * len(rows)),
            "props": pa.array([""] * len(rows)),
        }),
        sf / "events.parquet",
    )
    got = [(r["bucket"], r["n_events"]) for r in events_disorder(str(sf)).take_all()]
    assert got == [
        ("0_on_time", 2), ("1_lt_1m", 1), ("2_lt_1h", 1),
        ("3_lt_1d", 1), ("4_ge_1d", 1),
    ]


def test_events_debounce_chain_semantics(ray_session, tmp_path):
    """events_debounce: the kept-chain recurrence (windows restart at
    each KEPT event) on a crafted burst — distinguishes the chain rule
    from lag()-debounce: events at t=0,40,80,120 with a 60s window
    keep {0, 80} (lag-debounce would keep only t=0... and bucket
    rules would differ again); separate (user, type) streams are
    independent; equal-ts ties order by event_id."""
    import datetime as dt

    import pyarrow as pa
    import pyarrow.parquet as pq

    from smart_ocr_ray.ops.relational import events_debounce

    t0 = dt.datetime(2024, 1, 1)
    rows = [
        # burst: 0, 40, 80, 120 s -> chain keeps 0 and 80 and NOT 120
        (1, 0, 7, "click"), (2, 40, 7, "click"),
        (3, 80, 7, "click"), (4, 120, 7, "click"),
        (5, 140, 7, "click"),                       # 140 >= 80+60 -> kept
        (6, 10, 7, "purchase"),                     # other type independent
        (7, 0, 8, "click"),                         # other user independent
        (8, 0, 9, "click"), (9, 0, 9, "click"),     # equal ts: id 8 kept
    ]
    sf = tmp_path / "deb"; sf.mkdir()
    pq.write_table(
        pa.Table.from_pydict({
            "event_id": pa.array([r[0] for r in rows], pa.int64()),
            "ts": pa.array([t0 + dt.timedelta(seconds=r[1]) for r in rows],
                           pa.timestamp("us")),
            "user_id": pa.array([r[2] for r in rows], pa.int64()),
            "event_type": pa.array([r[3] for r in rows], pa.string()),
            "value": pa.array([1.0] * len(rows), pa.float64()),
        }),
        sf / "events.parquet",
    )
    kept = sorted(r["event_id"] for r in events_debounce(str(sf)).take_all())
    assert kept == [1, 3, 5, 6, 7, 8]


def test_coreset_kcenter_empty_subset(ray_session):
    """coreset_greedy / kcenter_greedy on an empty bounded subset
    (max_vec_id=0 selects nothing) return typed empty tables instead
    of raising IndexError (ADVICE r4)."""
    from smart_ocr_ray.ops.similarity import coreset_greedy, kcenter_greedy

    sf = "/root/testdata/sf0.001"
    for fn, cols in (
        (coreset_greedy, ["step", "vec_id", "gain", "objective"]),
        (kcenter_greedy, ["step", "vec_id", "nearest_sim_e3"]),
    ):
        ds = fn(sf, max_vec_id=0)
        assert ds.count() == 0
        assert [f.name for f in ds.schema().base_schema] == cols


def test_dedup_bcubed_matches_python_reference(ray_session):
    """dedup_bcubed: the contingency-collapsed B-cubed sums equal a
    direct per-document Python recomputation from the clustering's own
    output and the exact-content gold groups on sf0.001 — pinning the
    n_cg * ((1e6*n_cg) // size) collapse and the singleton fill."""
    import hashlib
    from collections import Counter

    import pyarrow.parquet as pq

    from smart_ocr_ray.ops.dedup import dedup_bcubed, dedup_clusters

    sf = "/root/testdata/sf0.001"
    pred = {
        int(r["doc_id"]): int(r["cluster_id"])
        for r in dedup_clusters(sf).take_all()
    }
    t = pq.read_table(f"{sf}/documents.parquet", columns=["doc_id", "text"])
    docs = list(
        zip(t.column("doc_id").to_pylist(), t.column("text").to_pylist())
    )
    cid = {
        int(d): pred.get(int(d), -int(d) - 1) for d, _ in docs
    }
    gid = {
        int(d): hashlib.md5((txt or "").encode()).hexdigest()[:16]
        for d, txt in docs
    }
    size_c = Counter(cid.values())
    size_g = Counter(gid.values())
    n_cg = Counter((cid[d], gid[d]) for d in cid)
    sum_p = sum(
        (1_000_000 * n_cg[(cid[d], gid[d])]) // size_c[cid[d]] for d in cid
    )
    sum_r = sum(
        (1_000_000 * n_cg[(cid[d], gid[d])]) // size_g[gid[d]] for d in cid
    )
    (row,) = dedup_bcubed(sf).take_all()
    assert row["n_docs"] == len(docs)
    assert row["sum_p_e6"] == sum_p
    assert row["sum_r_e6"] == sum_r
    assert row["mean_p_e6"] == sum_p // len(docs)
    assert row["mean_r_e6"] == sum_r // len(docs)
    # the synthetic corpus has exact duplicates the MinHash chain must
    # cluster: recall meaningfully above zero, precision sane
    assert 0 < row["mean_r_e6"] <= 1_000_000
    assert 0 < row["mean_p_e6"] <= 1_000_000


def test_domain_quality_wilson_properties(ray_session):
    """domain_quality_wilson: exact agreement with a per-source Python
    recomputation (math.isqrt Wilson at z=2) on sf0.001, plus the two
    properties the op exists for: the bound never exceeds the raw rate,
    and a small perfect source cannot outrank a large near-perfect one
    (the small-sample penalty)."""
    import math
    from collections import defaultdict

    import pyarrow.parquet as pq

    from smart_ocr_ray.ops.text_analysis import (
        domain_quality_wilson,
        quality_reason,
    )

    sf = "/root/testdata/sf0.001"
    t = pq.read_table(
        f"{sf}/documents.parquet", columns=["source", "text", "lang"]
    )
    agg = defaultdict(lambda: [0, 0])
    for s, txt, lang in zip(
        t.column("source").to_pylist(),
        t.column("text").to_pylist(),
        t.column("lang").to_pylist(),
    ):
        agg[s][0] += 1
        agg[s][1] += 1 if quality_reason(txt or "", lang) == "" else 0
    want = {}
    for s, (n, k) in agg.items():
        x = (10**12 * (k * (n - k) + n)) // n
        lb = (1_000_000 * (k + 2) - 2 * math.isqrt(x)) // (n + 4)
        want[s] = (n, k, (1_000_000 * k) // n, lb)
    rows = domain_quality_wilson(sf).take_all()
    got = {
        r["source"]: (
            r["n_docs"], r["n_passed"], r["pass_rate_e6"], r["wilson_lb_e6"]
        )
        for r in rows
    }
    assert got == want
    # ordered by (wilson desc, source asc)
    keys = [(-r["wilson_lb_e6"], r["source"]) for r in rows]
    assert keys == sorted(keys)
    for r in rows:
        assert r["wilson_lb_e6"] <= r["pass_rate_e6"]
    # small-sample penalty: 3/3 scores below 950/1000
    small = (1_000_000 * 5 - 2 * math.isqrt((10**12 * (0 + 3)) // 3)) // 7
    big_x = (10**12 * (950 * 50 + 1000)) // 1000
    big = (1_000_000 * 952 - 2 * math.isqrt(big_x)) // 1004
    assert small < big


def test_pii_by_domain_matches_per_doc_counts(ray_session):
    """pii_by_domain: the per-source rollup equals summing pii_scrub's
    own per-doc counts grouped by the documents table's source — the
    no-drift composition the oracle encodes."""
    from collections import defaultdict

    import pyarrow.parquet as pq

    from smart_ocr_ray.ops.pii import pii_by_domain, pii_scrub

    sf = "/root/testdata/sf0.001"
    src_of = dict(
        zip(
            *[
                pq.read_table(
                    f"{sf}/documents.parquet", columns=["doc_id", "source"]
                ).column(c).to_pylist()
                for c in ("doc_id", "source")
            ]
        )
    )
    agg = defaultdict(lambda: [0, 0, 0, 0])
    for r in pii_scrub(sf).take_all():
        a = agg[src_of[r["doc_id"]]]
        a[0] += 1
        a[1] += r["n_emails"]
        a[2] += r["n_phones"]
        a[3] += r["n_ips"]
    got = {
        r["source"]: (
            r["n_docs"], r["n_emails"], r["n_phones"], r["n_ips"],
            r["pii_per_doc_e6"],
        )
        for r in pii_by_domain(sf).take_all()
    }
    want = {
        s: (n, e, p, i, (1_000_000 * (e + p + i)) // n)
        for s, (n, e, p, i) in agg.items()
    }
    assert got == want and got
