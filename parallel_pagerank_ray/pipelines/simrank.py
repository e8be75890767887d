"""SimRank structural similarity (Jeh & Widom, KDD'02), integer-exact
scaled variant.

    s(a, a) = SCALE
    s_{k+1}(a, b) = (C_num * Σ_{i∈I(a), j∈I(b)} s_k(i, j))
                    // (C_den * |I(a)| * |I(b)|)        for a ≠ b

with C = C_num/C_den (default 3/5 = 0.6) and scores scaled by 10^6 —
floor division keeps every value int64-exact, so the DuckDB oracle
replays the iterations verbatim (integer sums are order-independent,
unlike the float original).

Deployment/scale contract (documented, guarded): all-pairs SimRank
state is Θ(n²) pairs by definition, so the operator targets COARSENED
graphs — the host webgraph, a community condensation — exactly where
link-analysis practice runs it. The edge list of such a graph is the
small side: it is pulled once under ``broadcast_max_edges`` and shipped
via ``ray.put`` (one plasma copy); the O(n²) PAIR-STATE table is the
Dataset being iterated — partitioned, never driver-resident. Each
iteration is one vectorized fan-out ``map_batches`` (pair (i,j) scatters
to out(i) × out(j) via index arithmetic, no Python row loop) + one
bucketed grouped sum + one stateless rescale pass.

Beyond-reference capability (the reference computes PageRank only); no
counterpart file.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray
import ray.data as rd

from parallel_pagerank_ray.stages.agg import grouped_agg

SCALE = 1_000_000


def simrank(
    g,
    iters: int = 3,
    c_num: int = 3,
    c_den: int = 5,
    broadcast_max_edges: int = 5_000_000,
    num_buckets: int | None = None,
) -> rd.Dataset:
    """All-pairs integer SimRank after ``iters`` iterations:
    (u, v, simrank) rows for every pair with a nonzero score, u != v
    included once per direction (symmetric); diagonal omitted (it is
    SCALE by definition). Empty graph -> empty result.
    """
    empty = pa.table(
        {
            "u": pa.array([], pa.int64()),
            "v": pa.array([], pa.int64()),
            "simrank": pa.array([], pa.int64()),
        }
    )
    if g.n == 0:
        return rd.from_arrow(empty)
    n_edges = g.edges.count()
    if n_edges > broadcast_max_edges:
        raise ValueError(
            f"simrank: {n_edges} edges > broadcast_max_edges="
            f"{broadcast_max_edges}. All-pairs SimRank state is Θ(n²); "
            "coarsen the graph first (host_graph / community_graph) — "
            "that is also the standard deployment."
        )

    # one bounded pull: the coarse graph's edge list -> out-neighbor CSR
    # + in-degree vector, ray.put once, read zero-copy in every task
    eparts = [
        (t.column("src").to_numpy(), t.column("dst").to_numpy())
        for t in ray.get(g.edges.select_columns(["src", "dst"]).to_arrow_refs())
        if t.num_rows
    ]
    src = np.concatenate([s for s, _ in eparts]).astype(np.int64)
    dst = np.concatenate([d for _, d in eparts]).astype(np.int64)
    n = int(g.n)
    order = np.lexsort((dst, src))
    src, dst = src[order], dst[order]
    outdeg = np.bincount(src, minlength=n).astype(np.int64)
    indptr = np.concatenate([[0], np.cumsum(outdeg)]).astype(np.int64)
    indeg = np.bincount(dst, minlength=n).astype(np.int64)
    csr_ref = ray.put((indptr, dst, outdeg, indeg))

    diag = rd.from_arrow(
        pa.table(
            {
                "u": pa.array(np.arange(n, dtype=np.int64), pa.int64()),
                "v": pa.array(np.arange(n, dtype=np.int64), pa.int64()),
                "s": pa.array(np.full(n, SCALE, dtype=np.int64), pa.int64()),
            }
        )
    )

    def fan_out(t: pa.Table) -> pa.Table:
        """(u, v, s) pair rows -> raw contributions (a, b, s) for every
        a in out(u) x b in out(v), fully vectorized index arithmetic."""
        out_empty = pa.table(
            {
                "a": pa.array([], pa.int64()),
                "b": pa.array([], pa.int64()),
                "s": pa.array([], pa.int64()),
            }
        )
        if t.num_rows == 0:
            return out_empty
        indptr, adj, outdeg, _indeg = ray.get(csr_ref)
        u = t.column("u").to_numpy(zero_copy_only=False)
        v = t.column("v").to_numpy(zero_copy_only=False)
        s = t.column("s").to_numpy(zero_copy_only=False)
        la, lb = outdeg[u], outdeg[v]
        per_row = la * lb
        total = int(per_row.sum())
        if total == 0:
            return out_empty
        row = np.repeat(np.arange(len(u), dtype=np.int64), per_row)
        offs = np.concatenate([[0], np.cumsum(per_row)[:-1]])
        pos = np.arange(total, dtype=np.int64) - offs[row]
        ai, bi = pos // lb[row], pos % lb[row]
        return pa.table(
            {
                "a": pa.array(adj[indptr[u[row]] + ai], pa.int64()),
                "b": pa.array(adj[indptr[v[row]] + bi], pa.int64()),
                "s": pa.array(s[row], pa.int64()),
            }
        )

    def rescale(t: pa.Table) -> pa.Table:
        _indptr, _adj, _outdeg, indeg = ray.get(csr_ref)
        a = t.column("a").to_numpy(zero_copy_only=False)
        b = t.column("b").to_numpy(zero_copy_only=False)
        ssum = t.column("s").to_numpy(zero_copy_only=False)
        keep = a != b  # the diagonal is pinned at SCALE by definition
        a, b, ssum = a[keep], b[keep], ssum[keep]
        s = (np.int64(c_num) * ssum) // (
            np.int64(c_den) * indeg[a] * indeg[b]
        )
        nz = s > 0
        return pa.table(
            {
                "u": pa.array(a[nz], pa.int64()),
                "v": pa.array(b[nz], pa.int64()),
                "s": pa.array(s[nz], pa.int64()),
            }
        )

    s_k = diag
    for _ in range(iters):
        contrib = s_k.map_batches(fan_out, batch_format="pyarrow")
        summed = grouped_agg(
            contrib, ["a", "b"], {"s": ("s", "sum")}, num_buckets=num_buckets
        )
        off = summed.map_batches(rescale, batch_format="pyarrow")
        s_k = diag.union(off).materialize()

    def drop_diag(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        t = t.filter(pc.invert(pc.equal(t.column("u"), t.column("v"))))
        return t.rename_columns(["u", "v", "simrank"])

    return s_k.map_batches(drop_diag, batch_format="pyarrow")
