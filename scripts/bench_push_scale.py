"""One-off scale demonstration for the ACL push engine: 10M-vertex /
~100M-edge power-law digraph, seed at the max-degree vertex — verifies
the frontier-local claim (wire traffic and wall time track the push
frontier, not the graph) at the standing 10M bench scale.

Usage: python scripts/bench_push_scale.py [n_vertices] [avg_deg]
Prints one JSON line.
"""

from __future__ import annotations

import json
import logging
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 10_000_000
    avg = int(sys.argv[2]) if len(sys.argv) > 2 else 10
    import ray

    if not ray.is_initialized():
        ray.init(
            address="local",
            num_cpus=32,
            include_dashboard=False,
            logging_level=logging.ERROR,
        )
    logging.getLogger("ray.data").setLevel(logging.ERROR)
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    from parallel_pagerank_ray.pipelines.graph_build import Graph
    from parallel_pagerank_ray.pipelines.ppr_push import ppr_push
    from parallel_pagerank_ray.sources.edge_list import edges_dataset
    from parallel_pagerank_ray.sources.pages import powerlaw_edges

    t0 = time.time()
    e = powerlaw_edges(n, avg, seed=42)
    gen_sec = time.time() - t0
    t0 = time.time()
    g = Graph.from_int_edges(edges_dataset(e, num_blocks=64))
    build_sec = time.time() - t0
    seed = int(np.bincount(e[:, 0]).argmax())  # max out-degree vertex
    t0 = time.time()
    run = ppr_push(g, seed=seed, eps=10**6)
    push_sec = time.time() - t0
    support = run.scores.count()
    out = {
        "n": n,
        "edges": int(len(e)),
        "seed": seed,
        "gen_sec": round(gen_sec, 2),
        "build_sec": round(build_sec, 2),
        "push_sec": round(push_sec, 2),
        "rounds": run.iterations,
        "support_rows": int(support),
        "active_per_round": [h["active"] for h in run.history],
    }
    print(json.dumps(out))
    ray.shutdown()


if __name__ == "__main__":
    main()
