"""Batch lowest-common-ancestor / tree-distance queries on the BFS
forest.

The tree-query primitive over the engine's deterministic min-parent BFS
spanning forest (``bridges.bfs_forest``): for a batch of vertex pairs
(a, b), the LCA in the forest and the forest path length
dist = depth(a) + depth(b) - 2 * depth(lca). Pairs in different
components (or touching a vertex with no edge) resolve to
lca = dist = -1. Because the forest is canonical and SQL-replayable,
the whole answer table is value-exact against an ancestor-closure
oracle.

Scale shape: the forest's parent/depth vectors (2 x 8 bytes per
non-isolated vertex) broadcast ONCE via ray.put; the query table — the
big side — streams through one stateless map_batches whose kernel runs
the classic two-phase pointer walk VECTORIZED across the whole batch
(align depths, then step both sides; loop length = forest depth <=
graph eccentricity, tiny for web graphs — each step is one numpy
gather over the batch). No shuffle at all. Above ``broadcast_max``
non-isolated vertices this raises — route through a binary-lifting
join ladder (the bridges P table) when a >5M-vertex forest needs
driver-free LCA.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray.data as rd

from parallel_pagerank_ray.pipelines.graph_build import Graph
from parallel_pagerank_ray.stages.agg import resolve_num_buckets


def tree_lca(
    graph: Graph,
    queries: rd.Dataset,
    num_buckets: int | None = None,
    max_depth: int = 10_000,
    broadcast_max: int = 5_000_000,
) -> rd.Dataset:
    """(qid, a, b, lca, dist) for every row of ``queries`` (columns
    qid, a, b), against the min-parent BFS forest of ``graph``."""
    from parallel_pagerank_ray.pipelines.bridges import bfs_forest
    from parallel_pagerank_ray.util import count_rows_once

    if num_buckets is None:
        num_buckets = resolve_num_buckets(graph.edges)
    n = graph.n
    par, _dep = bfs_forest(graph, num_buckets, max_depth=max_depth)
    n_par, par = count_rows_once(par)
    if n_par > broadcast_max:
        raise ValueError(
            "tree_lca dense parent vector needs the forest under "
            f"broadcast_max ({broadcast_max}); use the binary-lifting "
            "join ladder for larger forests"
        )
    import ray as _ray

    parent = np.arange(n, dtype=np.int64)  # roots (and isolates) = self
    depth = np.zeros(n, dtype=np.int64)
    present = np.zeros(n, dtype=bool)
    maxd = 0
    if n_par:
        pt = pa.concat_tables(_ray.get(par.to_arrow_refs()))
        vid = pt.column("vid").to_numpy(zero_copy_only=False)
        parent[vid] = pt.column("parent").to_numpy(zero_copy_only=False)
        dep_v = pt.column("depth").to_numpy(zero_copy_only=False)
        depth[vid] = dep_v
        present[vid] = True
        present[parent[vid]] = True  # roots
        maxd = int(dep_v.max())
    ref = _ray.put((parent, depth, present, maxd))

    def kernel(t: pa.Table) -> pa.Table:
        par_v, dep_v, pres, md = _ray.get(ref)
        a = t.column("a").to_numpy(zero_copy_only=False).astype(np.int64)
        b = t.column("b").to_numpy(zero_copy_only=False).astype(np.int64)
        ok = (
            (a >= 0) & (a < len(pres)) & (b >= 0) & (b < len(pres))
        )
        ok &= np.where(ok, pres[np.clip(a, 0, len(pres) - 1)], False)
        ok &= np.where(ok, pres[np.clip(b, 0, len(pres) - 1)], False)
        x = np.where(ok, a, 0)
        y = np.where(ok, b, 0)
        da = dep_v[x].copy()
        db = dep_v[y].copy()
        # phase 1: lift the deeper side to the shallower depth
        for _ in range(md):
            m = da > db
            m2 = db > da
            if not (m.any() or m2.any()):
                break
            x[m] = par_v[x[m]]
            da[m] -= 1
            y[m2] = par_v[y[m2]]
            db[m2] -= 1
        # phase 2: step both until they meet (roots self-loop, so
        # cross-component pairs never meet — bounded walk then -1)
        for _ in range(md + 1):
            m = x != y
            if not m.any():
                break
            x[m] = par_v[x[m]]
            y[m] = par_v[y[m]]
        met = ok & (x == y)
        lca = np.where(met, x, -1)
        av = np.clip(a, 0, len(dep_v) - 1)  # clip: not-ok rows are masked
        bv = np.clip(b, 0, len(dep_v) - 1)
        dist = np.where(met, dep_v[av] + dep_v[bv] - 2 * dep_v[x], -1)
        return pa.table(
            {
                "qid": t.column("qid"),
                "a": t.column("a"),
                "b": t.column("b"),
                "lca": pa.array(lca.astype(np.int64), pa.int64()),
                "dist": pa.array(dist.astype(np.int64), pa.int64()),
            }
        )

    return queries.select_columns(["qid", "a", "b"]).map_batches(
        kernel, batch_format="pyarrow"
    )
