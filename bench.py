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

    e = powerlaw_edges(PR_NODES, PR_AVG_DEG, seed=42)
    edges = rd.from_arrow(
        pa.table({"src": e[:, 0], "dst": e[:, 1]})
    ).repartition(NUM_CPUS)
    t0 = time.time()
    g = Graph.from_int_edges(edges, dedup=True)
    build_s = time.time() - t0
    n_edges = g.edges.count()
    t0 = time.time()
    run = pagerank(g, d=0.85, tol=0.0, max_iters=PR_ITERS)
    iter_s = time.time() - t0
    del run
    return {
        "n_vertices": g.n,
        "n_edges": int(n_edges),
        "iterations": PR_ITERS,
        "build_sec": round(build_s, 3),
        "iterate_sec": round(iter_s, 3),
        "sec_per_superstep": round(iter_s / PR_ITERS, 4),
        "edges_per_sec_per_superstep": round(n_edges * PR_ITERS / iter_s, 1),
    }


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
        "triangles_copurchase",
        "text_stats",
        "dedup_exact",
        "dedup_minhash_lsh",
        "dedup_simhash",
        "knn_cosine",
        "embedding_near_dup",
        "events_hourly",
        "sessionize",
        "pricing_summary",
        "top_customers",
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
    _init_ray()
    t0 = time.time()
    pr = bench_pagerank()
    queries = bench_queries() if include_queries else {}
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
    }
    ray.shutdown()
    return result


def run_scaling() -> dict:
    """Same PageRank job in fresh processes at 8 and 32 CPUs."""
    results = {}
    for cpus in (8, 32):
        env = dict(os.environ)
        env["RAY_GRAFT_CPUS"] = str(cpus)
        proc = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--pagerank-only"],
            capture_output=True,
            text=True,
            env=env,
            timeout=1800,
        )
        line = proc.stdout.strip().splitlines()[-1]
        results[cpus] = json.loads(line)
    thr8 = results[8]["pagerank"]["edges_per_sec_per_superstep"]
    thr32 = results[32]["pagerank"]["edges_per_sec_per_superstep"]
    return {
        "metric": "pagerank scaling efficiency (8 -> 32 cpus, fresh sessions)",
        "value": round((thr32 / thr8) / 4.0, 3),
        "unit": "efficiency",
        "throughput_8": thr8,
        "throughput_32": thr32,
        "speedup": round(thr32 / thr8, 2),
        "sf": SF_DIR,
        "detail": {str(k): v["pagerank"] for k, v in results.items()},
    }


if __name__ == "__main__":
    if "--scaling" in sys.argv:
        print(json.dumps(run_scaling()))
    elif "--pagerank-only" in sys.argv:
        print(json.dumps(run_once(include_queries=False)))
    else:
        print(json.dumps(run_once()))
