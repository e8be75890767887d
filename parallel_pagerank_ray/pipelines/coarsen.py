"""Graph coarsening by matching contraction — the first level of a
multilevel partitioner (METIS-style): contract a deterministic maximal
matching (pipelines/matching.py handshake rounds), merge each matched
pair into the supervertex min(u, partner), and aggregate parallel
edges into integer weights.

Halves the vertex count (minus unmatched vertices) while preserving
cut structure — the standard preprocessing step before an expensive
partition/community optimization runs on the small coarse graph.
Everything is integer and the matching is parallelism-independent, so
the coarse graph is bit-identical at any shard count.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data as rd

from parallel_pagerank_ray.pipelines.graph_build import Graph
from parallel_pagerank_ray.pipelines.matching import matching_bsp
from parallel_pagerank_ray.stages.agg import grouped_agg
from parallel_pagerank_ray.util import safe_join


def coarsen_graph(
    graph: Graph,
    num_parts: int | None = None,
    edges_canonical: bool = False,
    broadcast_max: int = 50_000_000,
) -> rd.Dataset:
    """Coarse weighted edge table (csrc, cdst, w): each canonical
    simple edge maps both endpoints through super(v) = min(v,
    matched partner(v)) (or v itself when unmatched), internal edges
    of a contracted pair drop, and parallel edges sum into ``w``.

    Scale shape: the matching's pair table is <= n/2 rows; while n
    fits ``broadcast_max`` the supervertex map rides one plasma
    ``ray.put`` of an int64 vector and contraction is a stateless
    vectorized gather per batch (zero shuffles before the final
    grouped combine). Past the guard it degrades to two hash
    left_outer joins (src and dst through the pair table) — same
    results, tested by shrinking the guard.
    """
    n = graph.n
    empty = pa.table(
        {
            "csrc": pa.array([], pa.int64()),
            "cdst": pa.array([], pa.int64()),
            "w": pa.array([], pa.int64()),
        }
    )
    if n == 0:
        return rd.from_arrow(empty)
    run = matching_bsp(graph, num_parts=num_parts, edges_canonical=edges_canonical)
    if edges_canonical:
        canon = graph.edges
    else:
        from parallel_pagerank_ray.pipelines.triangles import _simple_undirected

        canon = _simple_undirected(graph.edges)

    if n <= broadcast_max:
        sup = np.arange(n, dtype=np.int64)
        for blk in ray.get(run.pairs.to_arrow_refs()):
            if blk.num_rows:
                # pairs are canonical (src < dst): the larger endpoint
                # contracts onto the smaller
                sup[blk.column("dst").to_numpy().astype(np.int64)] = (
                    blk.column("src").to_numpy().astype(np.int64)
                )
        sup_ref = ray.put(sup)

        def contract(t: pa.Table) -> pa.Table:
            m = ray.get(sup_ref)
            s = m[t.column("src").to_numpy(zero_copy_only=False)]
            d = m[t.column("dst").to_numpy(zero_copy_only=False)]
            keep = s != d
            s, d = s[keep], d[keep]
            lo = np.minimum(s, d)
            hi = np.maximum(s, d)
            return pa.table(
                {
                    "csrc": pa.array(lo, pa.int64()),
                    "cdst": pa.array(hi, pa.int64()),
                    "one": pa.array(np.ones(len(lo), dtype=np.int64)),
                }
            )

        mapped = canon.map_batches(contract, batch_format="pyarrow")
    else:  # hash-join fallback past the broadcast guard
        def pair_map(t: pa.Table) -> pa.Table:
            return pa.table(
                {
                    "vid": t.column("dst"),
                    "sup": t.column("src"),
                }
            )

        pmap = run.pairs.map_batches(pair_map, batch_format="pyarrow")
        j1 = safe_join(
            canon,
            pmap,
            join_type="left_outer",
            num_partitions=_parts(),
            on=("src",),
            right_on=("vid",),
        )

        def fold_src(t: pa.Table) -> pa.Table:
            s = pc.coalesce(t.column("sup"), t.column("src"))
            return pa.table({"s": s, "dst": t.column("dst")})

        j2 = safe_join(
            j1.map_batches(fold_src, batch_format="pyarrow"),
            pmap,
            join_type="left_outer",
            num_partitions=_parts(),
            on=("dst",),
            right_on=("vid",),
        )

        def fold_dst(t: pa.Table) -> pa.Table:
            s = pc.cast(t.column("s"), pa.int64()).to_numpy(
                zero_copy_only=False
            )
            d = (
                pc.cast(
                    pc.coalesce(t.column("sup"), t.column("dst")), pa.int64()
                )
                .to_numpy(zero_copy_only=False)
            )
            keep = s != d
            s, d = s[keep], d[keep]
            lo = np.minimum(s, d)
            hi = np.maximum(s, d)
            return pa.table(
                {
                    "csrc": pa.array(lo, pa.int64()),
                    "cdst": pa.array(hi, pa.int64()),
                    "one": pa.array(np.ones(len(lo), dtype=np.int64)),
                }
            )

        mapped = j2.map_batches(fold_dst, batch_format="pyarrow")

    return grouped_agg(
        mapped, ["csrc", "cdst"], {"w": ("one", "sum")}
    )


def _parts() -> int:
    from parallel_pagerank_ray.pipelines.graph_build import (
        _default_join_partitions,
    )

    return _default_join_partitions()
