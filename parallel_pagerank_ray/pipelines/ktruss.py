"""k-truss decomposition: the maximal subgraph in which every edge is
supported by at least k-2 triangles (Cohen 2008) — the standard
"cohesive community core" refinement of k-core for web/social graphs.

Synchronous edge peeling, the truss analogue of the k-core pipeline:

    support  enumerate triangles over the CURRENT edge set (degree-
             oriented wedge generation, the triangles.py kernel, with
             the wedge's CENTER kept so every matched triangle can
             credit all three of its edges), one bucketed count per
             canonical edge
    peel     edges with support < k-2 die; repeat until a round kills
             nothing

Round count = truss peel depth. Per-round cost is the triangle
enumeration O(sum deg_oriented^2) — the price every exact distributed
truss pays; the wedge stage inherits the triangles.py hub-orientation
bound (each wedge is generated at its lowest-degree endpoint).
Triangle matching broadcasts the packed oriented-edge key set while it
fits ``broadcast_max`` (8 B/edge, one plasma copy per node) and falls
back to a hash semi-join beyond it.
"""

from __future__ import annotations

import numpy as np
import ray
import ray.data as rd

from parallel_pagerank_ray.pipelines.graph_build import Graph
from parallel_pagerank_ray.pipelines.triangles import (
    _prepare_oriented,
    _simple_undirected,
)
from parallel_pagerank_ray.stages.agg import (
    grouped_agg,
    pairs_within_groups,
)
from parallel_pagerank_ray.util import drop_empty_blocks, safe_join


def _triangle_edge_credits(
    graph_n: int,
    edges: rd.Dataset,
    num_partitions: int | None,
    num_buckets: int | None,
    broadcast_max: int,
) -> rd.Dataset:
    """(src, dst, sup) for every canonical edge that closes >= 1
    triangle of the CURRENT edge set — each triangle credits all three
    edges. Edges in no triangle simply have no row (support 0)."""
    g = Graph(n=graph_n, edges=edges)
    _, _, oriented, num_partitions, num_buckets = _prepare_oriented(
        g, num_partitions, num_buckets, edges_simple=True
    )
    oriented = oriented.materialize()
    nb = np.int64(graph_n)

    def wedge_rows(grp: dict[str, np.ndarray]) -> dict[str, np.ndarray]:
        # neighbor lists ordered by the orientation key (deg, vid): an
        # emitted pair (a, b) closes iff oriented edge (a, b) exists
        order = np.lexsort((grp["v"], grp["deg_v"], grp["u"]))
        u = grp["u"][order]
        v = grp["v"][order]
        ai, bi = pairs_within_groups(
            (u, np.arange(len(u), dtype=np.int64)),
            np.arange(len(u), dtype=np.int64),
        )
        return {"a": v[ai], "b": v[bi], "c": u[ai]}

    wedges = drop_empty_blocks(
        oriented.groupby("bucket").map_groups(wedge_rows, batch_format="numpy")
    )

    n_edges = oriented.count()
    if graph_n < (1 << 31) and n_edges <= broadcast_max:
        key_parts = [
            blk.column("u").to_numpy().astype(np.int64) * nb
            + blk.column("v").to_numpy().astype(np.int64)
            for blk in ray.get(oriented.to_arrow_refs())
            if blk.num_rows
        ]
        keys = (
            np.sort(np.concatenate(key_parts))
            if key_parts
            else np.array([], dtype=np.int64)
        )
        keys_ref = ray.put(keys)

        def match(b: dict[str, np.ndarray]) -> dict[str, np.ndarray]:
            ks = ray.get(keys_ref)
            wk = b["a"] * nb + b["b"]
            if not len(ks) or not len(wk):
                e = np.array([], dtype=np.int64)
                return {"a": e, "b": e, "c": e}
            pos = np.searchsorted(ks, wk)
            ok = pos < len(ks)
            m = np.zeros(len(wk), dtype=bool)
            m[ok] = ks[pos[ok]] == wk[ok]
            return {"a": b["a"][m], "b": b["b"][m], "c": b["c"][m]}

        triangles = wedges.map_batches(match, batch_format="numpy")
    else:  # hash semi-join fallback (edge set too big to broadcast)
        triangles = safe_join(
            wedges,
            oriented.select_columns(["u", "v"]),
            join_type="inner",
            num_partitions=num_partitions,
            on=("a", "b"),
            right_on=("u", "v"),
        ).select_columns(["a", "b", "c"])

    def credits(b: dict[str, np.ndarray]) -> dict[str, np.ndarray]:
        a, bb, c = b["a"], b["b"], b["c"]
        s = np.concatenate([np.minimum(a, bb), np.minimum(c, a), np.minimum(c, bb)])
        d = np.concatenate([np.maximum(a, bb), np.maximum(c, a), np.maximum(c, bb)])
        return {"src": s, "dst": d}

    return grouped_agg(
        drop_empty_blocks(triangles).map_batches(credits, batch_format="numpy"),
        ["src", "dst"],
        {"sup": ("src", "count")},
        num_buckets=num_buckets,
    )


def ktruss_edges(
    graph: Graph,
    k: int,
    num_partitions: int | None = None,
    num_buckets: int | None = None,
    broadcast_max: int = 50_000_000,
    max_rounds: int = 100_000,
    edges_simple: bool = False,
) -> rd.Dataset:
    """Surviving canonical edges (src, dst) of the k-truss. ``k >= 3``
    (k=2 is the whole simple graph). Deterministic: synchronous rounds,
    so the result is partitioning-invariant and SQL-reproducible."""
    if k < 3:
        raise ValueError("k-truss needs k >= 3 (k=2 is the input graph)")
    edges = (
        graph.edges.select_columns(["src", "dst"])
        if edges_simple
        else _simple_undirected(graph.edges)
    ).materialize()
    need = k - 2
    for _ in range(max_rounds):
        n_before = edges.count()
        if n_before == 0:
            break
        sup = _triangle_edge_credits(
            graph.n, edges, num_partitions, num_buckets, broadcast_max
        )
        keep = sup.map_batches(
            lambda b, t=need: {
                "src": b["src"][b["sup"] >= t],
                "dst": b["dst"][b["sup"] >= t],
            },
            batch_format="numpy",
        ).materialize()
        n_after = keep.count()
        edges = keep
        if n_after == n_before:
            break
    if edges.count() == 0:  # schema-stable empty result
        import pyarrow as pa

        return rd.from_arrow(
            pa.table(
                {
                    "src": pa.array([], type=pa.int64()),
                    "dst": pa.array([], type=pa.int64()),
                }
            )
        )
    return edges
