"""Benchmark harness — headline pipelines over $GRAFT_SF_DIR.

Prints ONE JSON line:
  {"metric": ..., "value": <total sec>, "unit": "sec",
   "queries": {name: sec, ...}, "sf": ..., "num_cpus": N,
   "pagerank": {...edges/sec per superstep...}}

``--scaling`` runs the headline PageRank job twice in FRESH processes at
num_cpus=8 and num_cpus=32 on the same input (the sandbox proxy for N
vs 4N cluster nodes) and reports both throughputs plus scaling
efficiency = (thr_32 / thr_8) / 4.

The PageRank headline graph is a deterministic synthetic power-law
digraph (seed 42) sized by the scale factor; everything else runs over
the $GRAFT_SF_DIR parquet tables. No wall-clock-dependent inputs.
"""

from __future__ import annotations

import json
import logging
import os
import subprocess
import sys
import time

SF_DIR = os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.1")
NUM_CPUS = int(os.environ.get("RAY_GRAFT_CPUS", "32"))

# headline graph: ~10M deduplicated edges
PR_NODES = int(os.environ.get("BENCH_PR_NODES", "1000000"))
PR_AVG_DEG = 10
PR_ITERS = 10


def _init_ray():
    import ray

    if not ray.is_initialized():
        ray.init(
            address="local",
            num_cpus=NUM_CPUS,
            include_dashboard=False,
            logging_level=logging.ERROR,
        )
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False
    logging.getLogger("ray.data").setLevel(logging.ERROR)


def bench_pagerank() -> dict:
    """Fixed-iteration PageRank on the deterministic power-law graph:
    reports edges/sec per superstep (the BASELINE.json north metric)."""
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from parallel_pagerank_ray.pipelines.graph_build import Graph
    from parallel_pagerank_ray.pipelines.pagerank import pagerank
    from parallel_pagerank_ray.sources.pages import powerlaw_edges

    from parallel_pagerank_ray.pipelines.pagerank_actors import pagerank_bsp
    from parallel_pagerank_ray.stages.csr_store import EdgeShardStore

    e = powerlaw_edges(PR_NODES, PR_AVG_DEG, seed=42)
    edges = rd.from_arrow(
        pa.table({"src": e[:, 0], "dst": e[:, 1]})
    ).repartition(NUM_CPUS)
    t0 = time.time()
    g = Graph.from_int_edges(edges, dedup=True)
    build_s = time.time() - t0
    n_edges = g.edges.count()
    # per-superstep metric: 5 supersteps suffice for the Dataset engine
    # (per-execution cost is flat) and halve its wall/variance share
    ds_iters = 5
    t0 = time.time()
    run = pagerank(g, d=0.85, tol=0.0, max_iters=ds_iters)
    iter_s = time.time() - t0
    del run
    store = EdgeShardStore.build(g.edges, n=g.n, num_parts=8)
    pagerank_bsp(g, d=0.85, tol=0.0, max_iters=2, store=store)  # warm
    t0 = time.time()
    pagerank_bsp(g, d=0.85, tol=0.0, max_iters=PR_ITERS, store=store)
    bsp_s = time.time() - t0
    # float32 exchange leg: halves wire bytes for multi-node clusters;
    # single-node it should measure within noise of float64 (plasma is
    # shared memory) — benchmarked so the cluster-targeted mode can't rot
    t0 = time.time()
    pagerank_bsp(
        g, d=0.85, tol=0.0, max_iters=PR_ITERS, store=store,
        exchange_dtype="float32",
    )
    bsp32_s = time.time() - t0
    # north-metric second half: iterations-to-convergence at an L1
    # tolerance (pagerank_mpi.c exit semantics) on the same graph/store
    conv_tol = float(os.environ.get("BENCH_PR_TOL", "1e-6"))
    t0 = time.time()
    conv = pagerank_bsp(g, d=0.85, tol=conv_tol, max_iters=500, store=store)
    conv_s = time.time() - t0
    # SCC leg: trim + FW-BW coloring on the same directed graph (the
    # round-4 web-structure operator) — end-to-end incl. its two
    # store builds
    from parallel_pagerank_ray.pipelines.scc import scc_bsp

    t0 = time.time()
    scc_run = scc_bsp(g)
    scc_s = time.time() - t0
    return {
        "scc": {
            "wall_sec": round(scc_s, 2),
            "supersteps": scc_run.iterations,
            "outer_rounds": scc_run.outer_rounds,
            # end-to-end throughput (supersteps are frontier-sparse,
            # so per-superstep edges/s would overstate)
            "edges_per_sec": round(n_edges / scc_s, 1),
        },
        "convergence": {
            "tol": conv_tol,
            "iterations": conv.iterations,
            "exit_reason": conv.exit_reason,
            "final_l1": conv.history[-1]["l1"] if conv.history else None,
            "wall_sec": round(conv_s, 3),
            "edges_per_sec": round(
                n_edges * conv.iterations / conv_s, 1
            ) if conv.iterations else None,
        },
        "n_vertices": g.n,
        "n_edges": int(n_edges),
        "iterations": PR_ITERS,
        "build_sec": round(build_s, 3),
        "dataset_engine": {
            "iterate_sec": round(iter_s, 3),
            "sec_per_superstep": round(iter_s / ds_iters, 4),
            "edges_per_sec_per_superstep": round(n_edges * ds_iters / iter_s, 1),
        },
        "bsp_engine": {
            "iterate_sec": round(bsp_s, 3),
            "sec_per_superstep": round(bsp_s / PR_ITERS, 4),
            "edges_per_sec_per_superstep": round(n_edges * PR_ITERS / bsp_s, 1),
            # dense exchange: each of P parts ships an n-long segment
            # set per superstep -> P * n * dtype bytes on the wire
            "exchange_bytes_per_superstep": _exchange_bytes(g.n, store, 8),
            "exchange_MB_per_sec": round(
                _exchange_bytes(g.n, store, 8) / (bsp_s / PR_ITERS) / 1e6, 1
            ),
        },
        "bsp_engine_f32_exchange": {
            "iterate_sec": round(bsp32_s, 3),
            "sec_per_superstep": round(bsp32_s / PR_ITERS, 4),
            "edges_per_sec_per_superstep": round(n_edges * PR_ITERS / bsp32_s, 1),
            "exchange_bytes_per_superstep": _exchange_bytes(g.n, store, 4),
            "exchange_MB_per_sec": round(
                _exchange_bytes(g.n, store, 4) / (bsp32_s / PR_ITERS) / 1e6, 1
            ),
        },
        # headline = best engine (both oracle-exact; see tests/)
        "sec_per_superstep": round(min(iter_s / ds_iters, bsp_s / PR_ITERS), 4),
        "edges_per_sec_per_superstep": round(
            n_edges / min(iter_s / ds_iters, bsp_s / PR_ITERS), 1
        ),
    }


def _exchange_bytes(n: int, store, dtype_size: int) -> int:
    """Per-superstep BSP exchange traffic: each of P parts ships its
    contribution segments covering all n vertices -> P * n * dtype
    bytes cross the wire (plasma single-node; network on a cluster)."""
    P = max(1, -(-n // store.part_size))
    return P * n * dtype_size


def bench_scale10m() -> dict:
    """Standing 10M-vertex / ~100M-edge leg (VERDICT r3 item 7): graph
    build, BSP PageRank superstep (f64 + f32 exchange) and connected
    components end-to-end, each round — so scale regressions surface
    the way sweep regressions do. Skip with BENCH_10M=0."""
    import pyarrow as pa
    import ray.data as rd

    from parallel_pagerank_ray.pipelines.components_actors import (
        connected_components_bsp,
    )
    from parallel_pagerank_ray.pipelines.graph_build import Graph
    from parallel_pagerank_ray.pipelines.pagerank_actors import pagerank_bsp
    from parallel_pagerank_ray.sources.pages import powerlaw_edges
    from parallel_pagerank_ray.stages.csr_store import EdgeShardStore

    n_nodes = int(os.environ.get("BENCH_10M_NODES", "10000000"))
    e = powerlaw_edges(n_nodes, PR_AVG_DEG, seed=42)
    edges = rd.from_arrow(
        pa.table({"src": e[:, 0], "dst": e[:, 1]})
    ).repartition(NUM_CPUS)
    del e
    t0 = time.time()
    g = Graph.from_int_edges(edges, dedup=True)
    n_edges = int(g.edges.count())
    build_s = time.time() - t0
    t0 = time.time()
    store = EdgeShardStore.build(g.edges, n=g.n, num_parts=32)
    store_s = time.time() - t0
    pagerank_bsp(g, d=0.85, tol=0.0, max_iters=1, store=store)  # warm
    iters = 5
    t0 = time.time()
    pagerank_bsp(g, d=0.85, tol=0.0, max_iters=iters, store=store)
    pr_s = time.time() - t0
    t0 = time.time()
    pagerank_bsp(
        g, d=0.85, tol=0.0, max_iters=iters, store=store,
        exchange_dtype="float32",
    )
    pr32_s = time.time() - t0
    t0 = time.time()
    cc = connected_components_bsp(g)
    cc_s = time.time() - t0
    return {
        "n_vertices": g.n,
        "n_edges": n_edges,
        "build_sec": round(build_s, 2),
        "store_sec": round(store_s, 2),
        "pagerank_sec_per_superstep": round(pr_s / iters, 4),
        "pagerank_edges_per_sec_per_superstep": round(
            n_edges * iters / pr_s, 1
        ),
        "exchange_bytes_per_superstep": _exchange_bytes(g.n, store, 8),
        "exchange_MB_per_sec": round(
            _exchange_bytes(g.n, store, 8) / (pr_s / iters) / 1e6, 1
        ),
        "f32_sec_per_superstep": round(pr32_s / iters, 4),
        "f32_exchange_bytes_per_superstep": _exchange_bytes(g.n, store, 4),
        "f32_exchange_MB_per_sec": round(
            _exchange_bytes(g.n, store, 4) / (pr32_s / iters) / 1e6, 1
        ),
        "components_sec": round(cc_s, 2),
        "components_iterations": cc.iterations,
    }


def bench_llm10x() -> dict:
    """Standing 10x-corpus LLM-pipeline leg (VERDICT r4 item 6):
    dedup_keepers (MinHash-LSH -> candidate-graph CC -> keepers) and
    dsir_weights over a 50k-document deterministic corpus — 10x the
    sf0.1 documents table, with seeded near-dup injection so LSH has
    real work. Skip with BENCH_LLM10X=0; scripts/bench_llm10x.py runs
    the same leg standalone (incl. a 500k/100x variant)."""
    import subprocess

    out = subprocess.run(
        [sys.executable, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                      "scripts", "bench_llm10x.py")],
        capture_output=True, text=True,
        env={**os.environ, "PYTHONPATH": os.path.dirname(os.path.abspath(__file__))},
        timeout=900,
    )
    for line in reversed(out.stdout.strip().splitlines()):
        if line.startswith("{"):
            return json.loads(line)
    return {"error": (out.stderr or out.stdout)[-500:]}


def bench_queries() -> dict[str, float]:
    """Wall time of the non-headline pipelines over $GRAFT_SF_DIR."""
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    import __ray_entry__ as E

    names = [
        "pages_extract_text",
        "link_edges",
        "edges_supplier_part",
        "pagerank_supplier_part_top20",
        "components_copurchase",
        "bipartite_components",
        "butterfly_stats",
        "butterflies_per_part",
        "labelprop_copurchase",
        "triangles_copurchase",
        "kcore_copurchase",
        "bfs_copurchase",
        "closeness_copurchase",
        "spcount_copurchase",
        "betweenness_copurchase",
        "local_clustering",
        "random_walks_copurchase",
        "random_walks_weighted_copurchase",
        "hits_supplier_part",
        "host_edges",
        "host_crawl_stats",
        "host_cocitation",
        "pagerank_hosts_top10",
        "pages_anchors",
        "chunk_docs",
        "bloom_membership",
        "postings_top_tokens",
        "degree_assortativity",
        "pagerank_weighted_top20",
        "labelprop_weighted_copurchase",
        "community_stats",
        "sssp_weighted_copurchase",
        "neighbor_sample",
        "revenue_by_nation",
        "distinct_parts_per_nation",
        "doc_repetition",
        "top_tokens",
        "distinct_orders_kmv",
        "price_quantiles",
        "text_stats",
        "dedup_exact",
        "doc_fingerprints",
        "winnow_candidates",
        "tfidf_search",
        "decontaminate",
        "dedup_keepers",
        "dedup_minhash_lsh",
        "dedup_simhash",
        "paragraph_dedup",
        "knn_cosine",
        "knn_ivf",
        "embedding_near_dup",
        "scc_hosts",
        "bowtie_hosts",
        "host_reciprocity",
        "spam_mass_hosts",
        "canonical_urls",
        "pseudo_diameter_copurchase",
        "pagerank_incremental_top20",
        "ktruss_copurchase",
        "harmonic_copurchase",
        "link_prediction_copurchase",
        "events_hourly",
        "sessionize",
        "events_asof",
        "pricing_summary",
        "top_customers",
        "price_band_match",
        "embed_docs",
        "katz_pages",
        "mis_copurchase",
        "coloring_copurchase",
        "matching_copurchase",
        "events_running",
        "events_daily_pivot",
        "pricing_rollup",
        "pack_docs",
        "balance_sources",
        "pricing_cube",
        "parts_intersect_except",
        "condensation_hosts",
        "kmeans_embeddings",
        "semantic_dedup",
        "line_filter",
        "neighborhood_hll",
        "salsa_supplier_part",
        "dsir_weights",
        "cluster_balanced_sample",
        "ppr_push_copurchase",
        "sweep_cut_copurchase",
        "split_corpus",
        "crawl_frontier",
        "frequent_triples",
        "lang_mixing",
        "coreness_copurchase",
        "msf_copurchase",
        "dup_span_stats",
        "phrase_search",
        "retention_cohorts",
        "wl_colors",
        "wl_class_sizes",
        "resolve_redirects",
        "countmin_top_tokens",
        "cooccurrence_top_tokens",
        "quantity_moments",
        "large_volume_orders",
        "rich_club",
        "link_churn_hosts",
        "components_incremental",
        "funnel_users",
        "community_graph",
        "lineitem_checksum",
        "host_mirror_scores",
        "hll_users_by_type",
        "shortest_path_trace",
        "shingle_novelty",
        "vocab_growth",
        "late_orders_by_priority",
        "shipping_priority",
        "forecast_revenue",
        "promo_revenue",
        "top_supplier_quarter",
        "disjunctive_revenue",
        "waiting_suppliers",
        "idle_customers",
        "cheapest_supplier",
        "order_count_distribution",
        "volume_shipping",
        "returned_item_revenue",
        "small_quantity_revenue",
        "skyline_orders",
        "embedding_gram",
        "four_cliques",
        "partition_cut",
        "landmark_distances",
        "coarsen_copurchase",
        "quota_mix",
        "temporal_reach",
        "temporal_latest",
        "densest_copurchase",
        "node2vec_copurchase",
        "simrank_hosts",
        "lm_buckets",
        "quality_classifier",
        "ktruss_deep_copurchase",
        "trussness_copurchase",
        "modularity_moves_copurchase",
        "modularity_moves_weighted",
        "louvain_copurchase",
        "lpa_refine_copurchase",
        "vertex_features",
        "jaccard_sparsify_copurchase",
        "bpe_merges",
        "bpe_token_counts",
        "market_share",
        "peak_concurrency",
        "event_transitions",
        "four_cycles",
        "bm25_search",
        "rrf_fusion",
        "linkpred_train",
        "linkpred_auc",
        "edge_betweenness",
        "robustness_curve",
        "percolation_curve",
        "table_profile",
        "bridges",
        "two_edge_components",
        "anomalous_hours",
        "joint_degree_matrix",
        "jaccard_set_join",
        "inter_event_gaps",
        "docs_jsonl_checksum",
        "docs_csv_checksum",
        "articulation_copurchase",
        "biconn_summary",
        "dag_paths_copurchase",
        "triad_census_links",
        "ema_users",
        "eigencentrality_copurchase",
        "order_quartiles",
        "two_edge_cuts",
        "coverage_select",
        "lca_copurchase",
        "edit1_customers",
        "edit2_customers",
        "session_overlaps",
        "component_wl_classes",
        "split_by_source",
        "docs_ipc_checksum",
        "contrastive_pairs",
    ]
    qs = E.queries()
    out: dict[str, float] = {}
    import ray.data as rd

    for name in names:
        t0 = time.time()
        res = qs[name](SF_DIR)
        if isinstance(res, rd.Dataset):
            res.materialize()
        out[name] = round(time.time() - t0, 2)
    return out


def run_once(include_queries: bool = True) -> dict:
    import ray

    _init_ray()
    t0 = time.time()
    # Accumulated plasma garbage degrades whoever runs LAST (measured
    # both ways: the 10M-edge headline first slowed the query sweep up
    # to 2.5x; a 32-query sweep first slowed the headline superstep
    # ~3x). Restarting the Ray session between the phases gives each a
    # clean object store for the cost of one extra init (~5 s).
    queries = bench_queries() if include_queries else {}
    if include_queries:
        ray.shutdown()
        _init_ray()
    pr = bench_pagerank()
    scale10m = None
    if os.environ.get("BENCH_10M", "1") != "0":
        # own fresh session: the 100M-edge build floods the object
        # store and would degrade nothing else this way
        ray.shutdown()
        _init_ray()
        scale10m = bench_scale10m()
    llm10x = None
    if os.environ.get("BENCH_LLM10X", "1") != "0":
        ray.shutdown()  # subprocess owns its own Ray session
        llm10x = bench_llm10x()
        _init_ray()
    total = time.time() - t0
    import ray

    result = {
        "metric": "headline pipelines wall time (pagerank edges/sec in .pagerank)",
        "value": round(total, 2),
        "unit": "sec",
        "queries": queries,
        "sf": SF_DIR,
        "num_cpus": NUM_CPUS,
        "pagerank": pr,
        "scale_10m": scale10m,
        "llm_10x": llm10x,
    }
    ray.shutdown()
    return result


SCALING_PAGES = "/tmp/bench_pages_300k_heavy/pages"
SCALING_N_PAGES = 300_000
SCALING_DEG = 12
SCALING_FILLER_PARAS = 30  # ~4.7 KB html/page, Common-Crawl-ish weight
# weak-scaling corpus: pages proportional to CPUs (N_PAGES * cpus / 32)
SCALING_WEAK_PAGES = "/tmp/bench_pages_weak_{n}/pages"


def _write_corpus(path: str, n_pages: int, n_files: int = 32) -> None:
    """Write the corpus as a DIRECTORY of n_files parquet files — a
    single giant file reads as ONE task and serializes the whole
    pipeline behind it (measured: 13 s single-task read vs ~1 s across
    32 readers). Mirrors real web-corpus layout (many WARC shards)."""
    if os.path.exists(path):
        return
    import pyarrow.parquet as pq

    from parallel_pagerank_ray.sources.pages import pages_table, powerlaw_edges

    e = powerlaw_edges(n_pages, SCALING_DEG, seed=42)
    t = pages_table("bench", n_pages, e, filler_paras=SCALING_FILLER_PARAS)
    tmp = path + ".tmp"
    os.makedirs(tmp, exist_ok=True)
    per = -(-n_pages // n_files)
    for i in range(n_files):
        sl = t.slice(i * per, per)
        if sl.num_rows:
            pq.write_table(sl, os.path.join(tmp, f"part-{i:04d}.parquet"))
    os.replace(tmp, path)


def _ensure_scaling_corpus() -> None:
    """Deterministic page corpora for the scaling runs (cached)."""
    _write_corpus(SCALING_PAGES, SCALING_N_PAGES)
    for cpus in (8, 32):
        n = SCALING_N_PAGES * cpus // 32
        _write_corpus(SCALING_WEAK_PAGES.format(n=n), n)


def run_scaling_worker() -> dict:
    """One fresh-session measurement at $RAY_GRAFT_CPUS CPUs:
    (a) link extraction over the cached page corpus (CPU-bound stage),
    (b) BSP PageRank supersteps on the deterministic power-law graph."""
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from parallel_pagerank_ray.pipelines.graph_build import (
        Graph,
        links_from_pages,
    )
    from parallel_pagerank_ray.pipelines.pagerank_actors import pagerank_bsp
    from parallel_pagerank_ray.sources.pages import powerlaw_edges
    from parallel_pagerank_ray.stages.csr_store import EdgeShardStore

    _init_ray()
    pages = rd.read_parquet(SCALING_PAGES).repartition(128).materialize()
    links_from_pages(pages).count()  # warm workers
    # best-of-3: single-shot legs vary ±30% run-to-run on this shared
    # box; min wall time per leg is the standard noise-robust estimator
    t_extract = float("inf")
    n_links = 0
    for _ in range(3):
        t0 = time.time()
        n_links = links_from_pages(pages).count()
        t_extract = min(t_extract, time.time() - t0)

    e = powerlaw_edges(PR_NODES, PR_AVG_DEG, seed=42)
    edges = rd.from_arrow(
        pa.table({"src": e[:, 0], "dst": e[:, 1]})
    ).repartition(NUM_CPUS).materialize()
    g = Graph(n=PR_NODES, edges=edges)
    store = EdgeShardStore.build(edges, n=PR_NODES, num_parts=32)
    pagerank_bsp(g, d=0.85, tol=0.0, max_iters=2, num_parts=32, store=store)
    t_iter = float("inf")
    for _ in range(2):
        t0 = time.time()
        pagerank_bsp(
            g, d=0.85, tol=0.0, max_iters=PR_ITERS, num_parts=32, store=store
        )
        t_iter = min(t_iter, time.time() - t0)

    # full end-to-end pipeline (the north-star job): pages -> extract
    # links -> dedup + vid assignment -> BSP PageRank -> ranks count.
    # Strong scaling: fixed 300k-page corpus. Weak scaling: corpus
    # proportional to CPUs (pages * cpus/32) — the closest single-node
    # proxy for N -> 4N nodes with data growing with the cluster.
    def full_pipeline(path: str) -> int:
        pages = rd.read_parquet(path)
        g = Graph.from_pages(pages)
        run = pagerank_bsp(g, d=0.85, tol=0.0, max_iters=5)
        return run.ranks.count()

    t_full = float("inf")
    for _ in range(2):
        t0 = time.time()
        full_pipeline(SCALING_PAGES)
        t_full = min(t_full, time.time() - t0)

    n_weak = SCALING_N_PAGES * NUM_CPUS // 32
    weak_path = SCALING_WEAK_PAGES.format(n=n_weak)
    t_weak = float("inf")
    for _ in range(2):
        t0 = time.time()
        full_pipeline(weak_path)
        t_weak = min(t_weak, time.time() - t0)

    import ray

    ray.shutdown()
    return {
        "num_cpus": NUM_CPUS,
        "extract_sec": round(t_extract, 3),
        "pages_per_sec": round(SCALING_N_PAGES / t_extract, 1),
        "n_links": int(n_links),
        "pagerank_sec_per_superstep": round(t_iter / PR_ITERS, 4),
        "pagerank_edges_per_sec": round(store.num_edges * PR_ITERS / t_iter, 1),
        "full_pipeline_sec": round(t_full, 3),
        "full_pipeline_pages_per_sec": round(SCALING_N_PAGES / t_full, 1),
        "full_weak_n_pages": n_weak,
        "full_weak_sec": round(t_weak, 3),
    }


def run_scaling() -> dict:
    """Same jobs in fresh processes at 8 and 32 CPUs (the sandbox proxy
    for N vs 4N nodes; see BASELINE.md §C for interpretation)."""
    _ensure_scaling_corpus()
    results = {}
    for cpus in (8, 32):
        env = dict(os.environ)
        env["RAY_GRAFT_CPUS"] = str(cpus)
        proc = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--scaling-worker"],
            capture_output=True,
            text=True,
            env=env,
            timeout=1800,
        )
        line = proc.stdout.strip().splitlines()[-1]
        results[cpus] = json.loads(line)
    ex8, ex32 = results[8]["pages_per_sec"], results[32]["pages_per_sec"]
    pr8 = results[8]["pagerank_edges_per_sec"]
    pr32 = results[32]["pagerank_edges_per_sec"]
    fp8 = results[8]["full_pipeline_pages_per_sec"]
    fp32 = results[32]["full_pipeline_pages_per_sec"]
    # weak: 4x the data on 4x the CPUs should take the SAME time
    weak_eff = round(results[8]["full_weak_sec"] / results[32]["full_weak_sec"], 3)
    return {
        "metric": "scaling efficiency 8 -> 32 cpus (fresh sessions, same input)",
        "value": round((ex32 / ex8) / 4.0, 3),
        "unit": "efficiency",
        "extract": {
            "throughput_8": ex8,
            "throughput_32": ex32,
            "efficiency": round((ex32 / ex8) / 4.0, 3),
        },
        "full_pipeline": {
            "throughput_8": fp8,
            "throughput_32": fp32,
            "strong_efficiency": round((fp32 / fp8) / 4.0, 3),
            "weak_efficiency": weak_eff,
            "weak_note": (
                "t(75k pages @ 8 cpus) / t(300k pages @ 32 cpus): 4x data on "
                "4x CPUs, >= 0.8 means the end-to-end job absorbs 4x "
                "resources at constant wall time"
            ),
        },
        "pagerank_superstep": {
            "throughput_8": pr8,
            "throughput_32": pr32,
            "efficiency": round((pr32 / pr8) / 4.0, 3),
            "note": (
                "single-node proxy: supersteps are memory-bandwidth-bound "
                "(~1 FLOP/byte), so extra CPUs on ONE node add no bandwidth; "
                "on a real N->4N cluster aggregate memory+network bandwidth "
                "scales with nodes"
            ),
        },
        "detail": {str(k): v for k, v in results.items()},
    }


if __name__ == "__main__":
    if "--scaling" in sys.argv:
        print(json.dumps(run_scaling()))
    elif "--scaling-worker" in sys.argv:
        print(json.dumps(run_scaling_worker()))
    elif "--pagerank-only" in sys.argv:
        print(json.dumps(run_once(include_queries=False)))
    else:
        print(json.dumps(run_once()))
