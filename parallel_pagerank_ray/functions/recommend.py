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


def reference_report(analysis: dict[str, Any]) -> dict[str, Any]:
    """Dashboard-parity recommendation payload: the reference's full
    analytics output (/root/reference/dashboard/app.py:549-612) as one
    JSON-able document — the same size/density/structure/isolated
    tier texts, the same best-method pick, and the same per-method
    complexity + expected-performance predictions with the reference's
    exact thresholds. The dashboard's Status / "Actual Time" columns
    are subprocess RUN state (which executables exist / last run), not
    graph analytics, so they are not reproduced here.
    """
    n = int(analysis["num_nodes"])
    e = int(analysis["num_edges"])
    density = float(analysis["density"])

    recommendations: list[dict[str, str]] = []
    # size tier (app.py:548-560)
    if n < 100:
        recommendations.append(
            {
                "kind": "size",
                "tier": "Small Graph",
                "text": "Serial implementation is optimal for graphs "
                "this size; parallel overhead would outweigh benefits.",
            }
        )
        best_method = "Serial"
    elif n < 10_000:
        recommendations.append(
            {
                "kind": "size",
                "tier": "Medium Graph",
                "text": "Pthreads typically performs best at this size "
                "on multi-core systems.",
            }
        )
        best_method = "Pthreads"
    else:
        recommendations.append(
            {
                "kind": "size",
                "tier": "Large Graph",
                "text": "MPI is recommended at this size, especially "
                "on clusters.",
            }
        )
        best_method = "MPI"
    # density tier (app.py:562-566)
    if density > 0.5:
        recommendations.append(
            {
                "kind": "density",
                "tier": "Dense Graph",
                "text": "High edge density means more computation per "
                "node; parallel methods should show significant speedup.",
            }
        )
    elif density < 0.1:
        recommendations.append(
            {
                "kind": "density",
                "tier": "Sparse Graph",
                "text": "Low edge density means less computation; "
                "serial may suffice unless the graph is very large.",
            }
        )
    # structure (app.py:568-570)
    if analysis["is_scale_free"]:
        recommendations.append(
            {
                "kind": "structure",
                "tier": "Scale-Free Structure",
                "text": "Uneven degree distribution; parallel methods "
                "may show load imbalance — monitor utilization.",
            }
        )
    # isolated nodes (app.py:572-573)
    if analysis["num_isolated"] > 0:
        recommendations.append(
            {
                "kind": "isolated",
                "tier": "Isolated Nodes",
                "text": f"{analysis['num_isolated']} isolated nodes "
                "detected; they don't affect PageRank but add overhead.",
            }
        )

    # per-method predictions (app.py:580-612), same thresholds
    predictions: list[dict[str, str]] = []
    for method in ("Serial", "Pthreads", "MPI"):
        if method == "Serial":
            complexity = f"O({e} x I)"
            expected = "Baseline performance - no parallelization overhead"
        elif method == "Pthreads":
            complexity = f"O({e} x I / P)"
            if n > 1000 and density > 0.2:
                expected = "Good speedup expected (2-4x on 4 cores)"
            elif n > 100:
                expected = "Moderate speedup expected (1.5-2x on 4 cores)"
            else:
                expected = "Limited speedup (small graph - overhead dominates)"
        else:
            complexity = f"O({e} x I / P + comm)"
            if n > 10_000:
                expected = "Good speedup expected (scales with processes)"
            elif n > 1000:
                expected = "Moderate speedup (network overhead)"
            else:
                expected = "Overhead may dominate (small graph)"
        predictions.append(
            {
                "method": method,
                "complexity": complexity,
                "expected_performance": expected,
            }
        )

    return {
        "best_method": best_method,
        "recommendations": recommendations,
        "performance_prediction": predictions,
    }
