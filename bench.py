"""Benchmark runner — prints ONE JSON line with the headline metric.

Headline: documents/sec of the flagship extraction pipeline (read →
analyze → explode → actor-pool extract → groupby(url) assemble →
write_parquet) over the pages corpus derived from $GRAFT_SF_DIR's
documents table. Additional per-query timings cover the dedup /
similarity / relational operator families.

    python bench.py                # sf dir from $GRAFT_SF_DIR (default sf0.1)
    python bench.py --scaling      # fresh-process runs at N and 4N CPUs
                                   # (default 4/16), reports throughputs
                                   # + scaling efficiency

This script OWNS its Ray session (scripts and the test fixture do;
library code never does).
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys
import time

SF_DIR = os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.1")
NUM_CPUS = int(os.environ.get("RAY_GRAFT_CPUS", "32"))
# Corpus replication factor (distinct urls per FIXTURES.md §2 scale
# knobs): makes compute dominate fixed pipeline startup so throughput
# and scaling-efficiency numbers measure the engine, not session setup.
REPLICATE = int(os.environ.get("GRAFT_BENCH_REPLICATE", "32"))


def _pages_path(sf_dir: str) -> str:
    """Materialize the deterministic pages corpus derived from the
    sf dir's documents table, sharded into multiple parquet files so
    the read stage parallelizes (cached per sf_dir under /tmp)."""
    import pyarrow.parquet as pq

    from smart_ocr_ray.fixtures import pages_from_documents

    import pyarrow as pa
    import pyarrow.compute as pc

    import zlib

    from smart_ocr_ray.fixtures import FIXTURES_VERSION

    # Content-signed cache key (same rationale as __ray_entry__._pages_path):
    # a fixtures change or a different corpus with the same basename must
    # never serve a stale cached corpus.
    doc_path = os.path.join(sf_dir, "documents.parquet")
    st = os.stat(doc_path)
    sig = zlib.crc32(
        f"{os.path.abspath(doc_path)}:{st.st_size}:{int(st.st_mtime)}:{FIXTURES_VERSION}".encode()
    )
    rows_per_shard_key = os.environ.get("GRAFT_BENCH_ROWS_PER_SHARD", "1024")
    tag = os.path.basename(os.path.normpath(sf_dir)) or "sf"
    path = f"/tmp/smart_ocr_ray_pages_{tag}_x{REPLICATE}_r{rows_per_shard_key}_{sig:08x}"
    if not os.path.exists(os.path.join(path, "_SUCCESS")):
        base = pages_from_documents(sf_dir)
        tmp = path + ".tmp"
        shutil.rmtree(tmp, ignore_errors=True)
        os.makedirs(tmp, exist_ok=True)
        # ~1k-row shard files. Interleaved A/B at 16 CPUs measured
        # 1024 vs 2048 rows/shard as equal within VM jitter (15.8 vs
        # 15.9 s minima) — with tasks >> cores either way, the 1.0-7.7s
        # per-task spread amortizes; 1024 is kept as the truer many-
        # shard corpus shape. The pre-shuffle coalesce bounds the
        # groupby slice count regardless of file count.
        rows_per_shard = int(os.environ.get("GRAFT_BENCH_ROWS_PER_SHARD", "1024"))
        for r in range(REPLICATE):
            # Distinct urls per replica; payloads shared (FIXTURES.md
            # bench scale knob: repetition with distinct urls).
            urls = pc.binary_join_element_wise(
                base.column("url").cast(pa.string()), f"#r{r}", ""
            )
            replica = base.set_column(0, "url", urls)
            for s, start in enumerate(range(0, replica.num_rows, rows_per_shard)):
                pq.write_table(
                    replica.slice(start, rows_per_shard),
                    os.path.join(tmp, f"shard-{r:04d}-{s:04d}.parquet"),
                )
        open(os.path.join(tmp, "_SUCCESS"), "w").close()
        shutil.rmtree(path, ignore_errors=True)
        os.replace(tmp, path)
    return path


def run_bench() -> dict:
    import ray
    import ray.data

    # A deep streaming pipeline on few cores otherwise starves its
    # expensive stage: the default per-operator resource reservation
    # (50%) holds CPU slots for downstream operators even while they
    # are idle behind the shuffle barrier (measured 1.8x at 4 CPUs).
    ray.data.DataContext.get_current().op_resource_reservation_enabled = False

    ray.init(
        address="local", num_cpus=NUM_CPUS, include_dashboard=False, logging_level="ERROR"
    )
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

    from smart_ocr_ray.ops import dedup, relational, similarity, text_analysis
    from smart_ocr_ray.pipelines.extract_pipeline import extract_from_parquet

    pages_path = _pages_path(SF_DIR)

    # Warm the OS page cache (untimed) so we measure compute + shuffle.
    for name in os.listdir(pages_path):
        with open(os.path.join(pages_path, name), "rb") as f:
            while f.read(1 << 24):
                pass

    queries: dict[str, float] = {}

    # Untimed warmup: spawn the full worker pool and import the library
    # in every worker, so the timed run measures the engine rather than
    # interpreter startup (a fresh worker costs ~1s of imports).
    @ray.remote(num_cpus=1)
    def _warm() -> int:
        import smart_ocr_ray.stages.extract  # noqa: F401
        import smart_ocr_ray.stages.assemble  # noqa: F401

        return os.getpid()

    ray.get([_warm.remote() for _ in range(NUM_CPUS * 2)])
    first_shard = os.path.join(
        pages_path, sorted(f for f in os.listdir(pages_path) if f.endswith(".parquet"))[0]
    )
    for _ in extract_from_parquet(first_shard).limit(64).iter_batches(batch_format="pyarrow"):
        pass

    # --- headline: extraction pipeline, consumed by write_parquet ---
    # Best of N runs: with every core busy the wall time of a single run
    # jitters ±30% from OS/page-cache noise; the minimum is the stable
    # estimate of achievable throughput.
    n_runs = int(os.environ.get("GRAFT_BENCH_RUNS", "3"))
    out_dir = "/tmp/bench_extracted"
    headline_sec = float("inf")
    for _ in range(n_runs):
        shutil.rmtree(out_dir, ignore_errors=True)
        t0 = time.perf_counter()
        ds = extract_from_parquet(pages_path)
        ds.write_parquet(out_dir)
        headline_sec = min(headline_sec, time.perf_counter() - t0)
    queries["extract_pipeline"] = round(headline_sec, 3)
    import pyarrow.parquet as pq

    n_docs = sum(
        pq.read_metadata(os.path.join(pages_path, f)).num_rows
        for f in os.listdir(pages_path)
        if f.endswith(".parquet")
    )

    # --- operator-family queries (each consumed fully) ---
    def timed(name: str, fn) -> None:
        t = time.perf_counter()
        result = fn(SF_DIR)
        # Consume the dataset without driver materialization of payloads.
        total = 0
        for batch in result.iter_batches(batch_format="pyarrow"):
            total += batch.num_rows
        queries[name] = round(time.perf_counter() - t, 3)

    if os.environ.get("GRAFT_BENCH_HEADLINE") != "1":
        timed("dedup_exact", dedup.dedup_exact)
        timed("dedup_normalized", dedup.dedup_normalized)
        timed("dedup_minhash_lsh", dedup.dedup_minhash_lsh)
        timed("dedup_incremental_minhash", dedup.dedup_incremental_minhash)
        timed("minhash_recall_eval", dedup.minhash_recall_eval)
        timed("dedup_bcubed", dedup.dedup_bcubed)
        timed("ann_cosine_topk", similarity.ann_cosine_topk)
        timed("graph_ann_search", similarity.graph_ann_search)
        # Warm serving path: the index built above is session-cached
        # (_ann_index), so this times the beam walk alone — the
        # build-once / search-many amortization a serving deployment
        # gets.
        timed("graph_ann_warm", similarity.graph_ann_search)
        timed("embedding_kmeans", similarity.embedding_kmeans)
        timed("coreset_greedy", similarity.coreset_greedy)
        timed("kcenter_greedy", similarity.kcenter_greedy)
        timed("doc_quality", text_analysis.quality)
        timed("readability", text_analysis.readability)
        timed("gopher_rules", text_analysis.gopher_rules)
        timed("domain_quality_wilson", text_analysis.domain_quality_wilson)
        timed("domain_stats", text_analysis.domain_stats)
        timed("line_dedup", dedup.line_dedup)
        timed("substring_dedup", dedup.substring_dedup)
        timed("cdc_dedup", dedup.cdc_dedup)
        timed("cdc_delta", dedup.cdc_delta)
        timed("winnow_pairs", dedup.winnow_pairs)
        timed("tfidf_top_terms", text_analysis.tfidf_top_terms)
        timed("bm25_topk", text_analysis.bm25_topk)

        from smart_ocr_ray.ops.graph import graph_pagerank

        timed("graph_pagerank", graph_pagerank)
        timed("pricing_summary", relational.pricing_summary)
        timed("events_hourly", relational.events_hourly)
        timed("supplier_part_counts", relational.supplier_part_counts)

        from smart_ocr_ray.ops.pii import pii_by_domain, pii_scrub

        timed("pii_scrub", pii_scrub)
        timed("pii_by_domain", pii_by_domain)

        from smart_ocr_ray.ops.links import link_graph

        timed("link_graph", lambda _sf: link_graph(pages_path))

        from smart_ocr_ray.ops.links import link_components

        timed("link_components", lambda _sf: link_components(pages_path))

        from smart_ocr_ray.ops.links import link_communities

        timed("link_communities", lambda _sf: link_communities(pages_path))

        from smart_ocr_ray.ops.links import link_ppr

        timed("link_ppr", lambda _sf: link_ppr(pages_path))
        timed("dsir_weights", text_analysis.dsir_weights)
        timed("source_caps", text_analysis.source_caps)
        timed("ccnet_buckets", text_analysis.ccnet_buckets)

        from smart_ocr_ray.ops.curation import corpus_curation

        timed("corpus_curation", corpus_curation)
        timed("events_range_join", relational.events_range_join)
        timed("events_hll_hourly", relational.events_hll_hourly)
        timed("pmi_pairs", text_analysis.pmi_pairs)
        timed("bigram_lm", text_analysis.bigram_lm)
        timed("bpe_merges", text_analysis.bpe_merges)
        timed("bpe_encode", text_analysis.bpe_encode)
        timed("crawl_diff", dedup.crawl_diff)

        from smart_ocr_ray.ops.urls import url_canonical

        timed("url_canonical", url_canonical)
        timed("pq_encode", similarity.pq_encode)
        timed("pq_search", similarity.pq_search)
        timed("curriculum_rank", text_analysis.curriculum_rank)

        from smart_ocr_ray.ops.curation import blocklist_filter

        timed("blocklist_filter", blocklist_filter)
        timed("repetition_strip", text_analysis.repetition_strip)
        timed("quality_classifier", text_analysis.quality_classifier)
        timed("dsir_resample", text_analysis.dsir_resample)
        timed("topic_classify", text_analysis.topic_classify)
        timed("item_cooccurrence", relational.item_cooccurrence)
        timed("embedding_outliers", similarity.embedding_outliers)
        timed("semantic_decontam", similarity.semantic_decontam)
        timed("events_running_total", relational.events_running_total)
        timed("events_anomaly", relational.events_anomaly)
        timed("mixture_temperature", text_analysis.mixture_temperature)
        timed("weighted_sample_join", relational.weighted_sample_join)

        from smart_ocr_ray.ops.links import link_triangles

        timed("link_triangles", lambda _sf: link_triangles(pages_path))

        from smart_ocr_ray.ops.links import page_structure

        timed("page_structure", lambda _sf: page_structure(pages_path))
        timed("events_decayed", relational.events_decayed)
        timed("trending_terms", text_analysis.trending_terms)
        timed("length_quality_spearman", text_analysis.length_quality_spearman)
        timed("sample_stratified_k", text_analysis.sample_stratified_k)
        timed("corpus_profile", text_analysis.corpus_profile)
        timed("rrf_fuse", similarity.rrf_fuse)
        timed("dedup_weights", dedup.dedup_weights)
        timed("winnow_containment", dedup.winnow_containment)
        timed("bm25_search", text_analysis.bm25_search)

        from smart_ocr_ray.ops.links import section_graph

        timed("section_graph", lambda _sf: section_graph(pages_path))

        from smart_ocr_ray.ops.links import link_harmonic

        timed("link_harmonic", lambda _sf: link_harmonic(pages_path))

        from smart_ocr_ray.ops.links import link_hits

        timed("link_hits", lambda _sf: link_hits(pages_path))

        from smart_ocr_ray.ops.links import link_clustering

        timed("link_clustering", lambda _sf: link_clustering(pages_path))

        from smart_ocr_ray.ops.links import section_profile

        timed("section_profile", lambda _sf: section_profile(pages_path))

        from smart_ocr_ray.ops.links import link_frontier

        timed("link_frontier", lambda _sf: link_frontier(pages_path))

        from smart_ocr_ray.ops.links import link_kcore

        timed("link_kcore", lambda _sf: link_kcore(pages_path))

        from smart_ocr_ray.ops.links import crawl_schedule

        timed("crawl_schedule", lambda _sf: crawl_schedule(pages_path))

        from smart_ocr_ray.ops.links import link_walks

        timed("link_walks", lambda _sf: link_walks(pages_path))
        timed("ngram_cardinality", text_analysis.ngram_cardinality)
        timed("dedup_simhash_clusters", dedup.dedup_simhash_clusters)
        timed("lang_length_quantiles", text_analysis.lang_length_quantiles)

        from smart_ocr_ray.ops.urls import url_templates

        timed("url_templates", lambda _sf: url_templates(pages_path))

        from smart_ocr_ray.ops.storage import shard_plan

        timed("shard_plan", lambda _sf: shard_plan(pages_path))

        from smart_ocr_ray.ops.storage import zorder_cells

        timed("zorder_cells", zorder_cells)
        timed("code_switch_spans", text_analysis.code_switch_spans)
        timed("majority_lang_strip", text_analysis.majority_lang_strip)
        timed("script_profile", text_analysis.script_profile)
        timed("compression_quality", text_analysis.compression_quality)
        timed("classifier_agreement", text_analysis.classifier_agreement)
        timed("date_extract", text_analysis.date_extract)
        timed("corpus_drift", text_analysis.corpus_drift)
        timed("tokenizer_fertility", text_analysis.tokenizer_fertility)
        timed("cluster_safe_split", text_analysis.cluster_safe_split)
        timed("bigram_surprisal", text_analysis.bigram_surprisal)
        timed("bot_users", relational.bot_users)
        timed("ngram_novelty", text_analysis.ngram_novelty)

        from smart_ocr_ray.ops.links import link_degree_hist

        timed("link_degree_hist", lambda _sf: link_degree_hist(pages_path))

        from smart_ocr_ray.ops.multimodal import frame_dedup, media_from_pages

        timed(
            "frame_dedup",
            lambda _sf: frame_dedup(
                media_from_pages(
                    ray.data.read_parquet(pages_path, columns=["url", "html"])
                )
            ),
        )

        from smart_ocr_ray.ops.multimodal import gif_frame_features

        timed("gif_frames", gif_frame_features)

        from smart_ocr_ray.ops.multimodal import gif_frame_phash

        timed("gif_frame_phash", gif_frame_phash)

        from smart_ocr_ray.ops.multimodal import gif_frame_dedup

        timed("gif_frame_dedup", gif_frame_dedup)

        from smart_ocr_ray.ops.audio import wav_features

        timed("wav_features", wav_features)

        from smart_ocr_ray.ops.mojibake import charset_sniff, mojibake_repair
        from smart_ocr_ray.ops.urls import robots_filter

        timed("robots_filter", lambda _sf: robots_filter(pages_path))
        timed("mojibake_repair", mojibake_repair)
        timed("charset_sniff", charset_sniff)

        from smart_ocr_ray.ops.urls import sitemap_discovery, sitemap_index

        timed("sitemap_discovery", lambda _sf: sitemap_discovery(pages_path))
        # Chunked variant: (host, chunk)-parallel child sitemaps — on
        # this single-host bench corpus the speedup vs the row above
        # IS the headroom-#2 fix being measured.
        timed("sitemap_index", lambda _sf: sitemap_index(pages_path))

        from smart_ocr_ray.ops.urls import redirect_resolve

        timed("redirect_resolve", lambda _sf: redirect_resolve(pages_path))
        timed("events_debounce", relational.events_debounce)
        timed("events_late", relational.events_late)
        timed("local_supplier_volume", relational.local_supplier_volume)
        timed("incremental_hourly", relational.incremental_hourly)
        timed("events_disorder", relational.events_disorder)

    ray.shutdown()

    docs_per_sec = n_docs / headline_sec if headline_sec > 0 else 0.0
    return {
        "metric": "extract_pipeline_docs_per_sec",
        "value": round(docs_per_sec, 2),
        "unit": "docs/sec",
        "headline_sec": round(headline_sec, 3),
        "n_docs": n_docs,
        "queries": queries,
        "sf": SF_DIR,
        "num_cpus": NUM_CPUS,
    }


def run_scaling() -> dict:
    """Same job in fresh processes at N and 4N CPUs on identical input;
    efficiency = (throughput_hi / throughput_lo) / (hi / lo).

    Default pair 4 vs 16 (override with GRAFT_SCALING_LO/HI): both
    levels then stay inside the box's memory-bandwidth envelope. At 32
    CPUs this single node saturates DRAM (total remote work inflates
    ~1.5x vs the same job at 8 CPUs), which contaminates an 8-vs-32
    measurement with node-level contention that a real multi-node
    cluster — one DRAM complex per node — does not exhibit; 4-vs-16 is
    the faithful single-box proxy for cluster scaling. Both pairs are
    recorded in BASELINE.md."""

    def _run(ncpu: int) -> dict:
        env = dict(os.environ, RAY_GRAFT_CPUS=str(ncpu), GRAFT_BENCH_HEADLINE="1")
        env.setdefault("GRAFT_BENCH_RUNS", "1")
        out = subprocess.run(
            [sys.executable, os.path.abspath(__file__)],
            env=env, capture_output=True, text=True, check=True,
        ).stdout
        return json.loads(out.strip().splitlines()[-1])

    lo = int(os.environ.get("GRAFT_SCALING_LO", "4"))
    hi = int(os.environ.get("GRAFT_SCALING_HI", "16"))
    # Interleave lo/hi samples so host-level CPU-steal periods (this is
    # a VM; single-run wall jitters up to ±30%) bias both levels
    # equally; take the per-level minimum across rounds. 6 rounds (r3):
    # 4-round samples straddled a steal-heavy day at 0.727-0.800 while
    # a 6-round sample caught clean windows at both levels (0.874) —
    # deeper minima are the effective defense on a shared host.
    rounds = int(os.environ.get("GRAFT_SCALING_ROUNDS", "6"))
    r_lo, r_hi = None, None
    for _ in range(rounds):
        cur_lo = _run(lo)
        cur_hi = _run(hi)
        if r_lo is None or cur_lo["headline_sec"] < r_lo["headline_sec"]:
            r_lo = cur_lo
        if r_hi is None or cur_hi["headline_sec"] < r_hi["headline_sec"]:
            r_hi = cur_hi
    eff = (r_lo["headline_sec"] / r_hi["headline_sec"]) / (hi / lo)
    return {
        "metric": "scaling_efficiency",
        "value": round(eff, 3),
        "unit": "ratio",
        "cpus_lo": lo,
        "cpus_hi": hi,
        "sec_lo": r_lo["headline_sec"],
        "sec_hi": r_hi["headline_sec"],
        "docs_per_sec_lo": r_lo["value"],
        "docs_per_sec_hi": r_hi["value"],
        "sf": SF_DIR,
    }


if __name__ == "__main__":
    if "--scaling" in sys.argv:
        print(json.dumps(run_scaling()))
    else:
        print(json.dumps(run_bench()))
