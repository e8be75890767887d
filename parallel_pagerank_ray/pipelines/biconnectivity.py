"""Biconnected components and articulation points via Tarjan-Vishkin.

Sequential articulation-point detection is Hopcroft-Tarjan DFS low-link
(as a C/MPI engine would inherit it) — DFS does not distribute. This is
the canonical PRAM alternative (Tarjan & Vishkin, "An efficient parallel
biconnectivity algorithm", SIAM J. Comput. 1985), which works over ANY
rooted spanning tree; we run it over the engine's deterministic
min-parent BFS forest (``bridges.bfs_forest``), which is SHALLOW
(depth <= graph eccentricity), so every tree sweep below is
O(diameter) rounds — web graphs keep that tiny.

A BFS forest has a property the classic presentation can't assume: every
non-tree edge is a CROSS edge (endpoints' depths differ by at most 1,
and the only depth-(d-1) ancestor of a vertex is its parent — so a
non-tree edge is never ancestor/descendant). That makes rule 1 below
unconditional and removes the back-edge case entirely.

Construction (all deterministic — no hashing, no Monte Carlo):

  1. spanning forest: par = (vid, parent, depth) min-parent BFS rows;
  2. component-LOCAL preorder pre(v) (children visited in vid order,
     root = 0) and subtree size nd(v): subtree(v) is exactly the
     interval [pre(v), pre(v)+nd(v)-1] of its component's numbering —
     intervals are only ever compared within one component, so no
     cross-component offset is needed;
  3. low(v) / high(v) = min / max over subtree(v) of
     base(x) = min/max(pre(x), pre(w) for non-tree edges (x, w));
  4. auxiliary graph G'' on the NON-ROOT vertices (vertex w stands for
     the tree edge (parent(w), w)):
       rule 1 — every non-tree edge (u, w) connects u ~ w (both ends
                are non-root: a depth-1 vertex's only depth-0 neighbor
                is its parent, so non-tree edges never touch a root);
       rule 2 — a tree edge (v, w) with v NON-root connects w ~ v iff
                subtree(w) escapes subtree(v):
                low(w) < pre(v)  or  high(w) > pre(v) + nd(v) - 1;
  5. blocks = connected components of G'' (one BSP min-propagation
     run); the block of tree edge (parent(w), w) is comp(w), a
     non-tree edge (u, w) shares its endpoints' (equal) block; a tree
     edge isolated in G'' is its own singleton block (a bridge);
  6. articulation points: non-root v with some child c where
     block(c) != block(v); a root is articulated iff its children span
     >= 2 distinct blocks.

Scale shape: one CC run + one BFS + one bucketed min-parent combine
(the shared forest), one packed anti-join (non-tree split), one
grouped min/max (base), O(depth) level-synchronous rounds for the
three tree sweeps (each round touches two adjacent BFS levels via one
bucketed combine / grouped kernel), one unconditional map over the
non-tree edges (rule 1 IS the non-tree table — zero extra movement),
one CC run over G'', and one bucketed combine for the articulation
fold. No step holds a component on one worker. The broadcast fast
path pulls only O(#non-isolated vertices) rows under ``broadcast_max``
(the bridges idiom) and is force-tested equal to the distributed
ladder at bound 0.

Reference anchor: the reference engine has no biconnectivity pass at
all (its analytics stop at PageRank/components — pagerank_mpi.c); this
operator extends the same CSR/BSP machinery to the standard
cut-vertex/block decomposition a link-graph engine needs for backbone
and mirror analysis.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray.data as rd

from parallel_pagerank_ray.pipelines.bridges import (
    bfs_forest,
    forest_pairs,
    nontree_edges,
)
from parallel_pagerank_ray.pipelines.graph_build import Graph
from parallel_pagerank_ray.stages.agg import grouped_agg, resolve_num_buckets
from parallel_pagerank_ray.util import drop_empty_blocks, safe_join

INT64_MAX_B = np.iinfo(np.int64).max


@dataclass
class BiconnRun:
    """blocks: (vid, block) — block id of tree edge (parent(vid), vid)
    for every non-root vertex; block = min member vid of its G''
    component. par: the forest rows. nt: non-tree edges. n: |V|.
    local: dense numpy arrays stashed by the driver-local fast path
    (``is_child``, ``parent``, ``block`` over [0, n)) so the
    articulation / edge-block folds skip their joins on small
    graphs; None when a distributed path produced the run."""

    blocks: rd.Dataset
    par: rd.Dataset
    nt: rd.Dataset
    n: int
    local: dict | None = None


def _empty(cols: dict[str, pa.DataType]) -> rd.Dataset:
    return rd.from_arrow(
        pa.table({c: pa.array([], t) for c, t in cols.items()})
    )


def _tree_arrays(par_tbl: pa.Table):
    """vid/parent/depth int64 arrays sorted by (depth, parent, vid)."""
    vid = par_tbl.column("vid").to_numpy(zero_copy_only=False)
    parent = par_tbl.column("parent").to_numpy(zero_copy_only=False)
    depth = par_tbl.column("depth").to_numpy(zero_copy_only=False)
    order = np.lexsort((vid, parent, depth))
    return vid[order], parent[order], depth[order]


def _pre_nd_fast(
    vid: np.ndarray, parent: np.ndarray, depth: np.ndarray, n: int
) -> tuple[np.ndarray, np.ndarray]:
    """Dense pre / nd arrays (index = vid; component-local preorder,
    children in vid order). Vectorized per BFS level: one bottom-up
    np.add.at sweep for nd, one top-down segmented-cumsum sweep for
    pre. Roots (vertices never appearing as a child) have pre = 0."""
    pre = np.zeros(n, dtype=np.int64)
    nd = np.ones(n, dtype=np.int64)
    if len(vid) == 0:
        return pre, nd
    maxd = int(depth.max())
    # level slice boundaries in the (depth, parent, vid)-sorted arrays
    starts = np.searchsorted(depth, np.arange(1, maxd + 2))
    # bottom-up: nd[parent] += nd[child], deepest level first
    for d in range(maxd, 0, -1):
        lo, hi = starts[d - 1], starts[d]
        np.add.at(nd, parent[lo:hi], nd[vid[lo:hi]])
    # top-down: children of one parent are consecutive and vid-sorted;
    # pre(c_i) = pre(parent) + 1 + sum(nd of prior siblings)
    for d in range(1, maxd + 1):
        lo, hi = starts[d - 1], starts[d]
        p = parent[lo:hi]
        v = vid[lo:hi]
        sib = np.concatenate(([0], np.cumsum(nd[v])[:-1]))
        first = np.concatenate(([True], p[1:] != p[:-1]))
        base = np.where(first, sib, 0)
        np.maximum.accumulate(base, out=base)
        pre[v] = pre[p] + 1 + (sib - base)
    return pre, nd


def _lowhigh_fast(
    vid: np.ndarray,
    parent: np.ndarray,
    depth: np.ndarray,
    base_min: np.ndarray,
    base_max: np.ndarray,
) -> tuple[np.ndarray, np.ndarray]:
    """Subtree min/max fold of base over the forest (dense arrays,
    index = vid), bottom-up by level."""
    low = base_min.copy()
    high = base_max.copy()
    if len(vid) == 0:
        return low, high
    maxd = int(depth.max())
    starts = np.searchsorted(depth, np.arange(1, maxd + 2))
    for d in range(maxd, 0, -1):
        lo, hi = starts[d - 1], starts[d]
        np.minimum.at(low, parent[lo:hi], low[vid[lo:hi]])
        np.maximum.at(high, parent[lo:hi], high[vid[lo:hi]])
    return low, high


def _base_minmax(
    nt: rd.Dataset, pre_ref, num_buckets: int
) -> rd.Dataset:
    """(vid, bmin, bmax) = min/max preorder over each vertex's non-tree
    neighbors — the non-self part of base(x). One stateless map over
    the non-tree edges (pre broadcast once via ray.put) + one bucketed
    combine; the edge table never moves whole."""

    def incident(t: pa.Table) -> pa.Table:
        import ray

        pre = ray.get(pre_ref)
        s = t.column("src").to_numpy(zero_copy_only=False)
        d = t.column("dst").to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "vid": pa.array(np.concatenate([s, d]), pa.int64()),
                "p": pa.array(
                    np.concatenate([pre[d], pre[s]]), pa.int64()
                ),
            }
        )

    return grouped_agg(
        nt.map_batches(incident, batch_format="pyarrow"),
        ["vid"],
        {"bmin": ("p", "min"), "bmax": ("p", "max")},
        num_buckets=num_buckets,
    )


def _cc_min_label(src: np.ndarray, dst: np.ndarray, n: int) -> np.ndarray:
    """Dense min-label connected components (comp = min member vid) via
    propagation + pointer jumping; vertices with no incident edge keep
    comp = self."""
    comp = np.arange(n, dtype=np.int64)
    if len(src) == 0:
        return comp
    s = np.concatenate([src, dst])
    d = np.concatenate([dst, src])
    while True:
        new = comp.copy()
        np.minimum.at(new, d, comp[s])
        while True:
            nn = new[new]
            if np.array_equal(nn, new):
                break
            new = nn
        if np.array_equal(new, comp):
            break
        comp = new
    return comp


def _biconn_local(
    es: np.ndarray, ed: np.ndarray, n: int, max_depth: int
) -> BiconnRun:
    """Driver-local Tarjan-Vishkin (same construction as the module
    docstring, all dense numpy): BFS forest, preorder intervals,
    low/high folds, auxiliary-graph CC. Exact and identical to the
    distributed paths — parity-tested in test_biconnectivity. The
    dense arrays are stashed on the run so the articulation and
    edge-block folds are driver-local too."""
    from parallel_pagerank_ray.pipelines.bridges import _bfs_forest_local

    childs, parents, depths, _dist = _bfs_forest_local(
        es, ed, n, max_depth=max_depth
    )
    # forest pair keys (canonical) -> non-tree split
    nbig = np.int64(n)
    fkey = np.minimum(childs, parents) * nbig + np.maximum(childs, parents)
    ekey = es * nbig + ed
    is_tree = np.isin(ekey, fkey)
    nts, ntd = es[~is_tree], ed[~is_tree]
    # sweeps over the (depth, parent, vid)-sorted tree arrays
    order = np.lexsort((childs, parents, depths))
    vid, parent, depth = childs[order], parents[order], depths[order]
    pre, nd = _pre_nd_fast(vid, parent, depth, n)
    base_min = pre.copy()
    base_max = pre.copy()
    if len(nts):
        np.minimum.at(base_min, nts, pre[ntd])
        np.minimum.at(base_min, ntd, pre[nts])
        np.maximum.at(base_max, nts, pre[ntd])
        np.maximum.at(base_max, ntd, pre[nts])
    low, high = _lowhigh_fast(vid, parent, depth, base_min, base_max)
    is_child = np.zeros(n, dtype=bool)
    is_child[vid] = True
    m = is_child[parent] & (
        (low[vid] < pre[parent])
        | (high[vid] > pre[parent] + nd[parent] - 1)
    )
    gs = np.concatenate([nts, np.minimum(vid, parent)[m]])
    gd = np.concatenate([ntd, np.maximum(vid, parent)[m]])
    comp = _cc_min_label(gs, gd, n)
    block = comp  # isolated-in-G'' vertices keep comp = self
    blocks_tbl = pa.table(
        {
            "vid": pa.array(childs, pa.int64()),
            "block": pa.array(block[childs], pa.int64()),
        }
    )
    par_tbl = pa.table(
        {
            "vid": pa.array(childs, pa.int64()),
            "parent": pa.array(parents, pa.int64()),
            "depth": pa.array(depths, pa.int64()),
        }
    )
    nt_tbl = pa.table(
        {
            "src": pa.array(nts, pa.int64()),
            "dst": pa.array(ntd, pa.int64()),
        }
    )
    return BiconnRun(
        blocks=rd.from_arrow(blocks_tbl),
        par=rd.from_arrow(par_tbl),
        nt=rd.from_arrow(nt_tbl),
        n=n,
        local={
            "is_child": is_child,
            "parent": parents,
            "childs": childs,
            "block": block,
            "nts": nts,
            "ntd": ntd,
        },
    )


def biconnectivity(
    graph: Graph,
    num_buckets: int | None = None,
    max_depth: int = 10_000,
    broadcast_max: int = 5_000_000,
    local_max_edges: int = 2_000_000,
) -> BiconnRun:
    """Tarjan-Vishkin over the min-parent BFS forest (module
    docstring). Requires ``graph.edges`` canonical simple (src < dst,
    distinct, no self-loops). Deterministic and exact."""
    from parallel_pagerank_ray.pipelines.components_actors import (
        connected_components_bsp,
    )

    n = graph.n
    empty_blocks = _empty({"vid": pa.int64(), "block": pa.int64()})
    empty_edges = _empty({"src": pa.int64(), "dst": pa.int64()})
    if n == 0:
        return BiconnRun(blocks=empty_blocks, par=empty_edges, nt=empty_edges, n=0)
    if n > 3_000_000_000:  # pragma: no cover - packed key contract
        raise ValueError("biconnectivity packed anti-join needs n < 3e9")
    if num_buckets is None:
        num_buckets = resolve_num_buckets(graph.edges)
    edges = graph.edges.select_columns(["src", "dst"]).materialize()
    ne = edges.count()
    if ne == 0:
        return BiconnRun(
            blocks=empty_blocks,
            par=_empty(
                {"vid": pa.int64(), "parent": pa.int64(), "depth": pa.int64()}
            ),
            nt=empty_edges,
            n=n,
        )
    if ne <= local_max_edges and n <= 20_000_000:
        from parallel_pagerank_ray.util import pull_table

        et = pull_table(edges, ["src", "dst"])
        return _biconn_local(
            et.column("src").to_numpy(zero_copy_only=False),
            et.column("dst").to_numpy(zero_copy_only=False),
            n,
            max_depth,
        )

    import os as _os
    import time as _time

    _dbg = bool(_os.environ.get("PPR_BICONN_DEBUG"))
    _t = _time.time()

    def _tick(label: str) -> None:
        nonlocal _t
        if _dbg:
            print(f"[biconn] {label}: {_time.time() - _t:.1f}s", flush=True)
        _t = _time.time()

    par, _dep = bfs_forest(graph, num_buckets, max_depth=max_depth)
    _tick("bfs_forest")
    nt = nontree_edges(edges, forest_pairs(par), n).materialize()
    _tick("nontree")

    from parallel_pagerank_ray.util import count_rows_once

    n_par, par = count_rows_once(par)
    if n_par <= broadcast_max:
        import ray as _ray

        pt = pa.concat_tables(_ray.get(par.to_arrow_refs()))
        vid, parent, depth = _tree_arrays(pt)
        pre, nd = _pre_nd_fast(vid, parent, depth, n)
        base_min = pre.copy()
        base_max = pre.copy()
        if nt.count():
            pre_ref = _ray.put(pre)
            bm = _base_minmax(nt, pre_ref, num_buckets)
            bt = pa.concat_tables(_ray.get(bm.to_arrow_refs()))
            bv = bt.column("vid").to_numpy(zero_copy_only=False)
            base_min[bv] = np.minimum(
                base_min[bv],
                bt.column("bmin").to_numpy(zero_copy_only=False),
            )
            base_max[bv] = np.maximum(
                base_max[bv],
                bt.column("bmax").to_numpy(zero_copy_only=False),
            )
        low, high = _lowhigh_fast(vid, parent, depth, base_min, base_max)
        # rule 2: tree edge (v=parent, w=child) with v non-root whose
        # child subtree escapes v's subtree
        is_child = np.zeros(n, dtype=bool)
        is_child[vid] = True  # non-root <=> appears as a child
        m = is_child[parent] & (
            (low[vid] < pre[parent])
            | (high[vid] > pre[parent] + nd[parent] - 1)
        )
        rule2 = pa.table(
            {
                "src": pa.array(np.minimum(vid, parent)[m], pa.int64()),
                "dst": pa.array(np.maximum(vid, parent)[m], pa.int64()),
            }
        )
        gpp = nt if len(rule2) == 0 else nt.union(rd.from_arrow(rule2))
    else:
        par = par.materialize()
        rule2_ds = _sweeps_bsp(par, nt, n)
        gpp = nt.union(rule2_ds)
    _tick("sweeps+rule2")

    gpp = drop_empty_blocks(gpp).materialize()
    _tick("gpp materialize")
    if gpp.count() == 0:
        # forest-only graph: every tree edge is its own singleton block
        blocks = par.select_columns(["vid"]).map_batches(
            lambda t: pa.table({"vid": t.column("vid"),
                                "block": t.column("vid")}),
            batch_format="pyarrow",
        ).materialize()
        return BiconnRun(blocks=blocks, par=par, nt=nt, n=n)
    comp = connected_components_bsp(Graph(n=n, edges=gpp)).components
    _tick("gpp CC")
    blocks = safe_join(
        par.select_columns(["vid"]),
        comp.rename_columns({"vid": "__c", "comp": "block"}),
        join_type="left_outer",
        num_partitions=8,
        on=("vid",),
        right_on=("__c",),
    )

    def fill(t: pa.Table) -> pa.Table:
        v = t.column("vid")
        return pa.table(
            {"vid": v, "block": pc.coalesce(t.column("block"), v)}
        )

    blocks = blocks.map_batches(fill, batch_format="pyarrow").materialize()
    _tick("blocks join")
    return BiconnRun(blocks=blocks, par=par, nt=nt, n=n)


import ray as _ray_mod


@_ray_mod.remote
def _route_par_block(block, part_size: int):
    """Split one (vid, parent, depth) forest block two ways: by vid
    owner (child-side state) and by parent owner (children index) —
    the _register_block idiom; one plasma put per (block, part)."""
    import ray

    if block.num_rows == 0 or "vid" not in block.schema.names:
        return {}, {}
    vid = block.column("vid").to_numpy(zero_copy_only=False)
    parent = block.column("parent").to_numpy(zero_copy_only=False)
    depth = block.column("depth").to_numpy(zero_copy_only=False)
    by_vid: dict[int, "ray.ObjectRef"] = {}
    parts = vid // part_size
    for p in np.unique(parts):
        m = parts == p
        by_vid[int(p)] = ray.put(
            (
                np.ascontiguousarray(vid[m]),
                np.ascontiguousarray(parent[m]),
                np.ascontiguousarray(depth[m]),
            )
        )
    by_parent: dict[int, "ray.ObjectRef"] = {}
    parts = parent // part_size
    for p in np.unique(parts):
        m = parts == p
        by_parent[int(p)] = ray.put(
            (
                np.ascontiguousarray(parent[m]),
                np.ascontiguousarray(vid[m]),
            )
        )
    return by_vid, by_parent


@_ray_mod.remote
def _route_nt_block(block, part_size: int):
    """Split one non-tree (src, dst) block into provider pairs
    (w_owner gets (w, u) for BOTH orientations): after the pre sweep
    each shard emits pre[w] to owner(u) — one exchange of O(2|nt|)."""
    import ray

    if block.num_rows == 0 or "src" not in block.schema.names:
        return {}
    s = block.column("src").to_numpy(zero_copy_only=False)
    d = block.column("dst").to_numpy(zero_copy_only=False)
    w = np.concatenate([s, d])
    u = np.concatenate([d, s])
    parts = w // part_size
    out: dict[int, "ray.ObjectRef"] = {}
    for p in np.unique(parts):
        m = parts == p
        out[int(p)] = ray.put(
            (np.ascontiguousarray(w[m]), np.ascontiguousarray(u[m]))
        )
    return out


@_ray_mod.remote
class _TreeSweepShard:
    """One vertex-range shard of the BSP tree-sweep engine (the kcore /
    components_actors harness shape): dense per-range state, routed
    per-level exchanges. Each of the three sweeps moves every forest
    vertex exactly once across all its rounds — O(n) total wire, no
    per-level joins (replaces the join-per-level Dataset ladder that
    measured 312 s at 10M/100M)."""

    def __init__(
        self,
        part: int,
        n: int,
        part_size: int,
        par_vid_refs: list,
        par_parent_refs: list,
        nt_refs: list,
    ) -> None:
        self.n = n
        self.part_size = part_size
        self.base = part * part_size
        self.size = max(0, min(part_size, n - self.base))
        size = self.size
        self.parent_g = np.full(size, -1, dtype=np.int64)
        self.depth = np.full(size, -1, dtype=np.int64)
        if par_vid_refs:
            chunks = _ray_mod.get(par_vid_refs)
            vid = np.concatenate([c[0] for c in chunks]) - self.base
            par = np.concatenate([c[1] for c in chunks])
            dep = np.concatenate([c[2] for c in chunks])
            self.parent_g[vid] = par
            self.depth[vid] = dep
        self.is_child = self.depth >= 0
        # children index: (p_loc, child_vid) sorted; aligned slots for
        # the child's nd / low / high filled during the bottom-up sweeps
        if par_parent_refs:
            chunks = _ray_mod.get(par_parent_refs)
            ploc = np.concatenate([c[0] for c in chunks]) - self.base
            cvid = np.concatenate([c[1] for c in chunks])
            order = np.lexsort((cvid, ploc))
            self.ip_ploc = ploc[order]
            self.ip_cvid = cvid[order]
        else:
            self.ip_ploc = np.array([], dtype=np.int64)
            self.ip_cvid = np.array([], dtype=np.int64)
        self.ck = self.ip_ploc * np.int64(n + 1) + self.ip_cvid
        self.child_nd = np.ones(len(self.ck), dtype=np.int64)
        self.child_low = np.zeros(len(self.ck), dtype=np.int64)
        self.child_high = np.zeros(len(self.ck), dtype=np.int64)
        # roots: appear as a parent, never as a child -> depth 0
        if len(self.ip_ploc):
            is_parent = np.zeros(size, dtype=bool)
            is_parent[self.ip_ploc] = True
            root = is_parent & ~self.is_child
            self.depth[root] = 0
        self.nd = np.ones(size, dtype=np.int64)
        self.pre = np.zeros(size, dtype=np.int64)
        self.low = np.zeros(size, dtype=np.int64)
        self.high = np.zeros(size, dtype=np.int64)
        if nt_refs:
            chunks = _ray_mod.get(nt_refs)
            self.nt_w = np.concatenate([c[0] for c in chunks]) - self.base
            self.nt_u = np.concatenate([c[1] for c in chunks])
        else:
            self.nt_w = np.array([], dtype=np.int64)
            self.nt_u = np.array([], dtype=np.int64)

    def max_depth(self) -> int:
        return int(self.depth.max()) if self.size else -1

    def _route(self, targets: np.ndarray, *cols: np.ndarray) -> list:
        """Group rows by owner shard of ``targets``; one plasma put per
        owner: [(owner_part, ref((targets, *cols))), ...]."""
        if not len(targets):
            return []
        owners = targets // self.part_size
        order = np.argsort(owners, kind="stable")
        owners = owners[order]
        arrs = [targets[order]] + [c[order] for c in cols]
        uniq, starts = np.unique(owners, return_index=True)
        bounds = starts.tolist() + [len(owners)]
        return [
            (
                int(p),
                _ray_mod.put(
                    tuple(a[bounds[i] : bounds[i + 1]] for a in arrs)
                ),
            )
            for i, p in enumerate(uniq)
        ]

    def _record(self, pl: np.ndarray, cv: np.ndarray, slot: np.ndarray,
                vals: np.ndarray) -> None:
        pos = np.searchsorted(self.ck, pl * np.int64(self.n + 1) + cv)
        slot[pos] = vals

    # ---- bottom-up nd ----
    def nd_emit(self, d: int) -> list:
        idx = np.nonzero(self.is_child & (self.depth == d))[0]
        return self._route(
            self.parent_g[idx], self.base + idx, self.nd[idx]
        )

    def nd_absorb(self, refs: list) -> None:
        for pg, cv, ndv in _ray_mod.get(list(refs)):
            pl = pg - self.base
            np.add.at(self.nd, pl, ndv)
            self._record(pl, cv, self.child_nd, ndv)

    # ---- top-down pre (component-local preorder; roots = 0) ----
    def pre_emit(self, d: int) -> list:
        if not len(self.ck):
            return []
        sel = np.nonzero(self.depth[self.ip_ploc] == d)[0]
        if not len(sel):
            return []
        p = self.ip_ploc[sel]
        v = self.ip_cvid[sel]
        ndv = self.child_nd[sel]
        sib = np.concatenate(([0], np.cumsum(ndv)[:-1]))
        first = np.concatenate(([True], p[1:] != p[:-1]))
        start = np.where(first, sib, 0)
        np.maximum.accumulate(start, out=start)
        pre_c = self.pre[p] + 1 + (sib - start)
        return self._route(v, pre_c)

    def pre_absorb(self, refs: list) -> None:
        for cv, pv in _ray_mod.get(list(refs)):
            self.pre[cv - self.base] = pv

    # ---- base = min/max(pre(self), pre(non-tree neighbors)) ----
    def base_init(self) -> None:
        self.low = self.pre.copy()
        self.high = self.pre.copy()

    def base_emit(self) -> list:
        return self._route(self.nt_u, self.pre[self.nt_w])

    def base_absorb(self, refs: list) -> None:
        for u, pv in _ray_mod.get(list(refs)):
            ul = u - self.base
            np.minimum.at(self.low, ul, pv)
            np.maximum.at(self.high, ul, pv)

    # ---- bottom-up low/high fold ----
    def lh_emit(self, d: int) -> list:
        idx = np.nonzero(self.is_child & (self.depth == d))[0]
        return self._route(
            self.parent_g[idx],
            self.base + idx,
            self.low[idx],
            self.high[idx],
        )

    def lh_absorb(self, refs: list) -> None:
        for pg, cv, lo, hi in _ray_mod.get(list(refs)):
            pl = pg - self.base
            np.minimum.at(self.low, pl, lo)
            np.maximum.at(self.high, pl, hi)
            self._record(pl, cv, self.child_low, lo)
            self._record(pl, cv, self.child_high, hi)

    # ---- rule 2, evaluated shard-locally (no joins) ----
    def rule2_table(self):
        if not len(self.ck):
            return pa.table(
                {
                    "src": pa.array([], pa.int64()),
                    "dst": pa.array([], pa.int64()),
                }
            )
        pl = self.ip_ploc
        esc = self.is_child[pl] & (
            (self.child_low < self.pre[pl])
            | (self.child_high > self.pre[pl] + self.nd[pl] - 1)
        )
        v = self.base + pl[esc]
        c = self.ip_cvid[esc]
        return pa.table(
            {
                "src": pa.array(np.minimum(v, c), pa.int64()),
                "dst": pa.array(np.maximum(v, c), pa.int64()),
            }
        )


def _sweeps_bsp(par: rd.Dataset, nt: rd.Dataset, n: int) -> rd.Dataset:
    """Run the three Tarjan-Vishkin tree sweeps on the BSP shard engine
    and return the rule-2 edge Dataset. ``par`` and ``nt`` must be
    materialized; their blocks are routed into the shards via plasma
    (the driver never holds the forest)."""
    from parallel_pagerank_ray.stages.csr_store import (
        cap_num_parts,
        per_actor_cpus,
    )

    cpus = int(_ray_mod.cluster_resources().get("CPU", 8))
    num_parts = cap_num_parts(min(256, max(4, cpus)), n)
    part_size = max(1, -(-n // num_parts))
    P = max(1, -(-n // part_size))

    routed_par = _ray_mod.get(
        [
            _route_par_block.remote(b, part_size)
            for b in par.to_arrow_refs()
        ]
    )
    routed_nt = _ray_mod.get(
        [_route_nt_block.remote(b, part_size) for b in nt.to_arrow_refs()]
    )
    par_vid: dict[int, list] = {}
    par_parent: dict[int, list] = {}
    for by_vid, by_par in routed_par:
        for p, r in by_vid.items():
            par_vid.setdefault(p, []).append(r)
        for p, r in by_par.items():
            par_parent.setdefault(p, []).append(r)
    nt_by: dict[int, list] = {}
    for d in routed_nt:
        for p, r in d.items():
            nt_by.setdefault(p, []).append(r)

    per_actor = per_actor_cpus(P)
    actors = [
        _TreeSweepShard.options(num_cpus=per_actor).remote(
            p,
            n,
            part_size,
            par_vid.get(p, []),
            par_parent.get(p, []),
            nt_by.get(p, []),
        )
        for p in range(P)
    ]
    try:
        maxd = max(_ray_mod.get([a.max_depth.remote() for a in actors]))

        def exchange(emits: list) -> list:
            inbox: list[list] = [[] for _ in range(P)]
            for row in emits:
                for p, ref in row:
                    inbox[p].append(ref)
            return inbox

        for d in range(maxd, 0, -1):
            inbox = exchange(
                _ray_mod.get([a.nd_emit.remote(d) for a in actors])
            )
            _ray_mod.get(
                [actors[p].nd_absorb.remote(inbox[p]) for p in range(P)]
            )
        for d in range(0, maxd):
            inbox = exchange(
                _ray_mod.get([a.pre_emit.remote(d) for a in actors])
            )
            _ray_mod.get(
                [actors[p].pre_absorb.remote(inbox[p]) for p in range(P)]
            )
        _ray_mod.get([a.base_init.remote() for a in actors])
        inbox = exchange(
            _ray_mod.get([a.base_emit.remote() for a in actors])
        )
        _ray_mod.get(
            [actors[p].base_absorb.remote(inbox[p]) for p in range(P)]
        )
        for d in range(maxd, 0, -1):
            inbox = exchange(
                _ray_mod.get([a.lh_emit.remote(d) for a in actors])
            )
            _ray_mod.get(
                [actors[p].lh_absorb.remote(inbox[p]) for p in range(P)]
            )
        tables = [a.rule2_table.remote() for a in actors]
        _ray_mod.wait(tables, num_returns=len(tables))
        out = rd.from_arrow_refs(tables).materialize()
    finally:
        for a in actors:
            _ray_mod.kill(a)
    return drop_empty_blocks(out)


def articulation_points(
    graph: Graph,
    num_buckets: int | None = None,
    max_depth: int = 10_000,
    broadcast_max: int = 5_000_000,
    local_max_edges: int = 2_000_000,
    run: BiconnRun | None = None,
) -> rd.Dataset:
    """All cut vertices of the undirected simple graph, as (vid,) rows.

    v (non-root) is articulated iff some child edge's block differs
    from v's parent-edge block; a root iff its children span >= 2
    blocks — one bucketed min/max combine over (parent, child-block)
    rows plus one join against the parents' own blocks.
    """
    if num_buckets is None:
        num_buckets = resolve_num_buckets(graph.edges)
    if run is None:
        run = biconnectivity(
            graph,
            num_buckets=num_buckets,
            max_depth=max_depth,
            broadcast_max=broadcast_max,
            local_max_edges=local_max_edges,
        )
    if run.local is not None:
        loc = run.local
        childs, block = loc["childs"], loc["block"]
        if len(childs) == 0:
            return _empty({"vid": pa.int64()})
        parents = loc["parent"]
        n = run.n
        bmin = np.full(n, INT64_MAX_B, dtype=np.int64)
        bmax = np.full(n, -1, dtype=np.int64)
        np.minimum.at(bmin, parents, block[childs])
        np.maximum.at(bmax, parents, block[childs])
        pu = np.unique(parents)
        root = ~loc["is_child"][pu]
        own = block[pu]
        m = np.where(
            root,
            bmin[pu] != bmax[pu],
            (bmin[pu] != own) | (bmax[pu] != own),
        )
        return rd.from_arrow(pa.table({"vid": pa.array(pu[m], pa.int64())}))
    if run.par.count() == 0:
        return _empty({"vid": pa.int64()})
    child_blocks = safe_join(
        run.par.select_columns(["vid", "parent"]),
        run.blocks.rename_columns({"vid": "__b"}),
        join_type="inner",
        num_partitions=8,
        on=("vid",),
        right_on=("__b",),
    ).select_columns(["parent", "block"])
    span = grouped_agg(
        child_blocks,
        ["parent"],
        {"bmin": ("block", "min"), "bmax": ("block", "max")},
        num_buckets=num_buckets,
    )
    own = safe_join(
        span,
        run.blocks.rename_columns({"vid": "__v", "block": "own"}),
        join_type="left_outer",  # roots have no own block
        num_partitions=8,
        on=("parent",),
        right_on=("__v",),
    )

    def pick(df: pd.DataFrame) -> pd.DataFrame:
        bmin = df["bmin"].to_numpy()
        bmax = df["bmax"].to_numpy()
        own_b = df["own"].to_numpy()
        root = pd.isna(df["own"]).to_numpy()
        m = np.where(root, bmin != bmax, (bmin != own_b) | (bmax != own_b))
        return pd.DataFrame(
            {"vid": df["parent"].to_numpy().astype(np.int64)[m]}
        )

    return drop_empty_blocks(own.map_batches(pick, batch_format="pandas"))


def biconnected_edge_blocks(
    graph: Graph,
    num_buckets: int | None = None,
    max_depth: int = 10_000,
    broadcast_max: int = 5_000_000,
    local_max_edges: int = 2_000_000,
    run: BiconnRun | None = None,
) -> rd.Dataset:
    """Every canonical edge tagged with its block id:
    (src, dst, block); block = min non-root member vid of the block's
    G'' component. Tree edge (parent(w), w) -> block(w); a non-tree
    edge shares its endpoints' (provably equal) block."""
    if num_buckets is None:
        num_buckets = resolve_num_buckets(graph.edges)
    if run is None:
        run = biconnectivity(
            graph,
            num_buckets=num_buckets,
            max_depth=max_depth,
            broadcast_max=broadcast_max,
            local_max_edges=local_max_edges,
        )
    if run.local is not None:
        loc = run.local
        childs, parents, block = loc["childs"], loc["parent"], loc["block"]
        if len(childs) == 0:
            return _empty(
                {"src": pa.int64(), "dst": pa.int64(), "block": pa.int64()}
            )
        nts, ntd = loc["nts"], loc["ntd"]
        return rd.from_arrow(
            pa.table(
                {
                    "src": pa.array(
                        np.concatenate(
                            [np.minimum(childs, parents), nts]
                        ),
                        pa.int64(),
                    ),
                    "dst": pa.array(
                        np.concatenate(
                            [np.maximum(childs, parents), ntd]
                        ),
                        pa.int64(),
                    ),
                    "block": pa.array(
                        np.concatenate([block[childs], block[nts]]),
                        pa.int64(),
                    ),
                }
            )
        )
    if run.par.count() == 0:
        return _empty(
            {"src": pa.int64(), "dst": pa.int64(), "block": pa.int64()}
        )

    tree = safe_join(
        run.par.select_columns(["vid", "parent"]),
        run.blocks.rename_columns({"vid": "__b"}),
        join_type="inner",
        num_partitions=8,
        on=("vid",),
        right_on=("__b",),
    )

    def canon_tree(t: pa.Table) -> pa.Table:
        v = t.column("vid").to_numpy(zero_copy_only=False)
        p = t.column("parent").to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "src": pa.array(np.minimum(v, p), pa.int64()),
                "dst": pa.array(np.maximum(v, p), pa.int64()),
                "block": t.column("block"),
            }
        )

    out = tree.map_batches(canon_tree, batch_format="pyarrow")
    if run.nt.count():
        ntb = safe_join(
            run.nt,
            run.blocks.rename_columns({"vid": "__b"}),
            join_type="inner",
            num_partitions=8,
            on=("src",),
            right_on=("__b",),
        ).select_columns(["src", "dst", "block"])
        out = out.union(ntb)
    return drop_empty_blocks(out)
