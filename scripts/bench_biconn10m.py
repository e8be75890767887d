"""Standing 10M-vertex / ~100M-edge biconnectivity ladder leg
(VERDICT r4 item 2): the full distributed path — BSP forest, packed
anti-join non-tree split, BSP tree-sweep shards (no join ladder),
auxiliary-graph CC, articulation fold. Prints one JSON line.

Usage: python scripts/bench_biconn10m.py [n_nodes] [avg_deg]
"""
import json
import os
import sys
import time

import numpy as np
import ray

ray.init(
    address="local",
    num_cpus=int(os.environ.get("RAY_GRAFT_CPUS", "32")),
    include_dashboard=False,
    logging_level="ERROR",
)
import logging

logging.getLogger("ray.data").setLevel(logging.ERROR)
from ray.data import DataContext

DataContext.get_current().enable_progress_bars = False

import pyarrow as pa
import ray.data as rd

from parallel_pagerank_ray.pipelines.biconnectivity import (
    articulation_points,
    biconnectivity,
)
from parallel_pagerank_ray.pipelines.graph_build import Graph
from parallel_pagerank_ray.sources.pages import powerlaw_edges
from parallel_pagerank_ray.stages.agg import distinct

n_nodes = int(sys.argv[1]) if len(sys.argv) > 1 else 10_000_000
avg_deg = int(sys.argv[2]) if len(sys.argv) > 2 else 10

t0 = time.time()
e = powerlaw_edges(n_nodes, avg_deg, seed=42)
lo = np.minimum(e[:, 0], e[:, 1])
hi = np.maximum(e[:, 0], e[:, 1])
m = lo != hi
canon = np.unique(np.stack([lo[m], hi[m]], axis=1), axis=0)
del e, lo, hi, m
g = Graph.from_int_edges(
    rd.from_arrow(
        pa.table({"src": canon[:, 0], "dst": canon[:, 1]})
    ).repartition(int(os.environ.get("RAY_GRAFT_CPUS", "32"))),
    dedup=False,
)
del canon
g.edges = g.edges.materialize()
n_edges = g.edges.count()
gen_s = time.time() - t0

t0 = time.time()
run = biconnectivity(g)
biconn_s = time.time() - t0
t0 = time.time()
n_blocks = distinct(run.blocks.select_columns(["block"]), ["block"]).count()
n_art = articulation_points(g, run=run).count()
fold_s = time.time() - t0

print(
    json.dumps(
        {
            "n_vertices": g.n,
            "n_edges": int(n_edges),
            "gen_sec": round(gen_s, 1),
            "biconn_sec": round(biconn_s, 1),
            "fold_sec": round(fold_s, 1),
            "n_blocks": int(n_blocks),
            "n_articulation": int(n_art),
            "path": "bsp_ladder" if run.local is None else "local",
        }
    )
)
ray.shutdown()
