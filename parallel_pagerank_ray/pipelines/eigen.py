"""Eigenvector centrality via integer-renormalized power iteration.

The spectral influence measure (Bonacich centrality): the dominant
eigenvector of the undirected adjacency matrix. The reference engine
stops at PageRank (pagerank_mpi.c); eigenvector centrality is the
undamped, degree-unnormalized member of the same power-iteration
family — PageRank's scatter machinery with a different normalization.

Float power iteration is not bit-reproducible across partitionings, so
the engine runs the recurrence in INTEGER arithmetic:

    x_0      = 1                      (every vertex with an edge)
    y_k      = A x_{k-1}              (int64 neighbor sums)
    x_k      = (y_k * SCALE) // max(y_k)   (floor division)

Every x_k is an exact function of the graph alone — any parallelism,
and a SQL recursive CTE, reproduce identical vectors. After enough
iterations x_k/SCALE approximates the dominant eigenvector scaled to
max = 1; convergence is geometric in the spectral gap (the standard
power-iteration bound), and the INTEGER sequence itself is the gated
artifact, so the gate is value-exact regardless of how far the float
limit is.

Scale shape (the dag_paths fast-path contract): O(V) state on the
driver under ``broadcast_max``; each iteration broadcasts x once via
ray.put and runs ONE stateless scan of the (never-moved) edge table +
one bucketed per-vertex combine — no per-iteration shuffle joins.
Overflow guard: max_deg * SCALE must stay under 2^62 (raised, not
wrapped).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray.data as rd

from parallel_pagerank_ray.stages.agg import grouped_agg, resolve_num_buckets

_SCALE = 1_000_000


def eigenvector_centrality(
    edges: rd.Dataset,
    n: int,
    iterations: int = 12,
    scale: int = _SCALE,
    num_buckets: int | None = None,
    broadcast_max: int = 50_000_000,
) -> rd.Dataset:
    """(vid, score) int64 for every vertex of the canonical simple
    undirected edge table (src < dst, distinct, no self-loops);
    score = x_iterations in the integer recurrence above
    (score of the max-central vertex = ``scale``).
    """
    if iterations < 1:
        raise ValueError("iterations >= 1")
    if num_buckets is None:
        num_buckets = resolve_num_buckets(edges)
    edges = edges.select_columns(["src", "dst"]).materialize()
    empty = rd.from_arrow(
        pa.table(
            {"vid": pa.array([], pa.int64()),
             "score": pa.array([], pa.int64())}
        )
    )
    if edges.count() == 0:
        return empty
    if n > broadcast_max:
        raise ValueError(
            "eigenvector_centrality dense driver state needs "
            f"n <= broadcast_max ({broadcast_max}); shard the vector "
            "through the BSP rank-exchange engine for larger graphs"
        )
    import ray as _ray

    # vertex presence from one degree combine
    def both(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "vid": pa.concat_arrays(
                    [
                        t.column("src").combine_chunks(),
                        t.column("dst").combine_chunks(),
                    ]
                )
            }
        )

    deg = grouped_agg(
        edges.map_batches(both, batch_format="pyarrow"),
        ["vid"],
        {"deg": ("vid", "count")},
        num_buckets=num_buckets,
    )
    dt = pa.concat_tables(_ray.get(deg.to_arrow_refs()))
    vids = dt.column("vid").to_numpy(zero_copy_only=False)
    max_deg = int(dt.column("deg").to_numpy(zero_copy_only=False).max())
    # y <= max_deg * scale, and the renormalization computes y * scale
    if max_deg * scale * scale >= (1 << 62):
        raise OverflowError(
            "eigenvector_centrality int64 headroom exhausted: "
            f"max_deg {max_deg} x scale^2 {scale * scale}; lower scale"
        )
    present = np.zeros(n, dtype=bool)
    present[vids] = True
    x = present.astype(np.int64)

    for _ in range(iterations):
        ref = _ray.put(x)

        def spread(t: pa.Table) -> pa.Table:
            xv = _ray.get(ref)
            s = t.column("src").to_numpy(zero_copy_only=False)
            d = t.column("dst").to_numpy(zero_copy_only=False)
            return pa.table(
                {
                    "vid": pa.array(np.concatenate([s, d]), pa.int64()),
                    "y": pa.array(
                        np.concatenate([xv[d], xv[s]]), pa.int64()
                    ),
                }
            )

        agg = grouped_agg(
            edges.map_batches(spread, batch_format="pyarrow"),
            ["vid"],
            {"y": ("y", "sum")},
            num_buckets=num_buckets,
        )
        at = pa.concat_tables(_ray.get(agg.to_arrow_refs()))
        y = np.zeros(n, dtype=np.int64)
        y[at.column("vid").to_numpy(zero_copy_only=False)] = at.column(
            "y"
        ).to_numpy(zero_copy_only=False)
        ymax = int(y.max())
        if ymax == 0:
            break
        x = (y * np.int64(scale)) // np.int64(ymax)

    return rd.from_arrow(
        pa.table(
            {
                "vid": pa.array(vids, pa.int64()),
                "score": pa.array(x[vids], pa.int64()),
            }
        )
    )
