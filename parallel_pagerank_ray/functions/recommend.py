"""Graph characteristics analysis + engine recommendation.

Parity with the reference dashboard's analytics layer
(/root/reference/dashboard/app.py:439-501 computes num_nodes/num_edges/
density/avg degrees/isolated count/scale-free flag with networkx;
app.py:529-665 maps size and density tiers to a Serial/Pthreads/MPI
recommendation). Here the SAME characteristics are computed
DISTRIBUTED (bucketed aggregates over the edge Dataset — no networkx,
no driver-side graph), and the recommendation maps to this engine's
execution choices:

- reference Serial  (< 100 nodes)   -> either engine; the NumPy oracle
  is equally fine at this size
- reference Pthreads (< 10k nodes)  -> BSP actor engine (shared-memory
  analog: stateful shards on one node's cores)
- reference MPI     (>= 10k nodes)  -> BSP while the rank vector fits
  full-vector exchange, Dataset engine above it (streaming, bounded
  memory, checkpointable)
- density / scale-free / isolated-node notes carry over with the same
  thresholds (density > 0.5 dense, < 0.1 sparse; scale-free when < 20%
  of vertices hold > max_degree/2 and max > 3x avg).
"""

from __future__ import annotations

from typing import Any

import numpy as np
import pyarrow as pa
import ray.data as rd

from parallel_pagerank_ray.stages.agg import global_agg, grouped_agg

_FULL_VEC_MAX = 256 << 20  # pagerank_actors/components_actors bound


def analyze_graph(n: int, edges: rd.Dataset) -> dict[str, Any] | None:
    """Distributed graph characteristics (reference app.py:439-501).

    ``edges`` is the (src, dst) Dataset; ``n`` the vertex-space size.
    One bucketed aggregate over the endpoint rows + one tiny histogram
    to the driver — O(E) rows shuffled once, never a driver-side graph.
    """
    if n == 0:
        return None

    def endpoints(t: pa.Table) -> pa.Table:
        v = pa.concat_arrays(
            [t.column("src").combine_chunks(), t.column("dst").combine_chunks()]
        )
        return pa.table({"vid": v})

    deg = grouped_agg(
        edges.map_batches(endpoints, batch_format="pyarrow"),
        ["vid"],
        {"deg": ("vid", "count")},
    ).materialize()
    # (deg -> n_vertices) histogram is tiny (distinct degree values)
    hist_rows = grouped_agg(
        deg, ["deg"], {"n_vertices": ("vid", "count")}, num_buckets=8
    ).take_all()
    degrees = np.array([r["deg"] for r in hist_rows], dtype=np.int64)
    counts = np.array([r["n_vertices"] for r in hist_rows], dtype=np.int64)

    m = global_agg(edges, {"n_edges": ("src", "count")})
    n_edges = int(m["n_edges"])
    n_touched = int(counts.sum())  # vertices with >= 1 edge (either dir)
    n_isolated = n - n_touched
    density = n_edges / (n * (n - 1)) if n > 1 else 0.0
    avg_degree = float((degrees * counts).sum() / n) if n else 0.0
    max_degree = int(degrees.max()) if len(degrees) else 0

    # reference scale-free proxy (app.py:482-487): few vertices hold
    # > max_degree/2, and the max is far above the average
    if len(degrees) > 1:
        high = int(counts[degrees > max_degree * 0.5].sum())
        is_scale_free = high < n_touched * 0.2 and max_degree > avg_degree * 3
    else:
        is_scale_free = False

    if density > 0.8:
        graph_type = "Dense"
    elif density > 0.3:
        graph_type = "Moderate"
    else:
        graph_type = "Sparse"

    return {
        "num_nodes": n,
        "num_edges": n_edges,
        "density": density,
        "graph_type": graph_type,
        "avg_degree": avg_degree,
        "max_degree": max_degree,
        "num_isolated": n_isolated,
        "is_scale_free": is_scale_free,
        "edges_per_node": n_edges / n,
    }


def recommend_engine(
    analysis: dict[str, Any], cpus: int | None = None
) -> dict[str, Any]:
    """Map graph characteristics to an engine choice + notes
    (reference tiering, app.py:548-560, re-targeted at this engine)."""
    n = int(analysis["num_nodes"])
    notes: list[str] = []
    if n < 100:
        notes.append(
            "Small graph: any engine; fixed per-superstep costs dominate."
        )
        engine = "bsp"
    elif n < 10_000:
        notes.append(
            "Medium graph: BSP actor engine (stateful shards, ~ms "
            "supersteps) — the shared-memory-parallel tier."
        )
        engine = "bsp"
    elif n * 8 <= _FULL_VEC_MAX:
        notes.append(
            "Large graph, rank vector fits full-vector exchange: BSP "
            "actor engine — the distributed tier."
        )
        engine = "bsp"
    else:
        notes.append(
            "Very large graph: Dataset engine (streaming segment "
            "exchange, bounded memory, per-iteration checkpoints)."
        )
        engine = "dataset"
    if analysis["density"] > 0.5:
        notes.append("Dense: high compute per vertex; parallel engines win big.")
    elif analysis["density"] < 0.1:
        notes.append("Sparse: per-superstep fixed cost dominates at small n.")
    if analysis["is_scale_free"]:
        notes.append(
            "Scale-free: hub skew — hubs are chunked map-side "
            "(csr_store._iter_adj); watch per-shard balance."
        )
    if analysis["num_isolated"] > 0:
        notes.append(
            f"{analysis['num_isolated']} isolated vertices: dangling mass "
            "is redistributed each superstep (no overhead beyond that)."
        )
    return {"engine": engine, "notes": notes}
