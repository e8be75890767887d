"""Partitioning diagnostics: edge-cut and load per partition under the
two vertex-partitioning schemes the engine's BSP exchanges choose
between — hash (vid % P) and contiguous range (vid // ceil(n/P), the
CSR shard layout of stages/csr_store.py).

The north rule requires partitioning / shuffle / skew to be handled
EXPLICITLY; this operator makes the trade-off measurable per graph:
``n_cut`` is the cross-partition traffic a scatter pays per superstep,
``n_edges`` per destination partition is the gather load whose max
bounds the straggler. One pass over the edge table, two bincounts per
batch, a P-sized combine — no shuffle of the edges themselves.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray.data as rd

from parallel_pagerank_ray.pipelines.graph_build import Graph
from parallel_pagerank_ray.stages.agg import grouped_agg


def partition_edge_cut(graph: Graph, num_parts: int = 8) -> rd.Dataset:
    """Per (scheme, part): destination-assigned edge count and the
    number of those edges whose source lives in a DIFFERENT partition.

    Output (scheme, part, n_edges, n_cut), one row per scheme ∈
    {hash, range} × part ∈ 0..P-1 that receives at least one edge.
    Integer-exact and partition-invariant (sums of per-batch
    bincounts).
    """
    n, p = graph.n, int(num_parts)
    if p <= 0:
        raise ValueError("num_parts must be positive")
    part_size = max(1, -(-n // p))  # ceil(n / p), CSR shard rule

    def partial(t: pa.Table) -> pa.Table:
        src = t.column("src").to_numpy(zero_copy_only=False).astype(np.int64)
        dst = t.column("dst").to_numpy(zero_copy_only=False).astype(np.int64)
        schemes, parts_, n_edges, n_cut = [], [], [], []
        for name, ps, pd_ in (
            ("hash", src % p, dst % p),
            ("range", src // part_size, dst // part_size),
        ):
            load = np.bincount(pd_, minlength=p)
            cut = np.bincount(pd_[ps != pd_], minlength=p)
            nz = np.flatnonzero(load)
            schemes.append(np.full(len(nz), name, dtype=object))
            parts_.append(nz.astype(np.int64))
            n_edges.append(load[nz].astype(np.int64))
            n_cut.append(cut[nz].astype(np.int64))
        return pa.table(
            {
                "scheme": pa.array(np.concatenate(schemes), pa.string()),
                "part": pa.array(np.concatenate(parts_), pa.int64()),
                "n_edges": pa.array(np.concatenate(n_edges), pa.int64()),
                "n_cut": pa.array(np.concatenate(n_cut), pa.int64()),
            }
        )

    return grouped_agg(
        graph.edges.map_batches(partial, batch_format="pyarrow"),
        ["scheme", "part"],
        {"n_edges": ("n_edges", "sum"), "n_cut": ("n_cut", "sum")},
    )
