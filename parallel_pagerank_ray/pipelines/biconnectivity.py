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
        import ray as _ray

        et = pa.concat_tables(_ray.get(edges.to_arrow_refs()))
        return _biconn_local(
            et.column("src").to_numpy(zero_copy_only=False),
            et.column("dst").to_numpy(zero_copy_only=False),
            n,
            max_depth,
        )

    par, _dep = bfs_forest(graph, num_buckets, max_depth=max_depth)
    nt = nontree_edges(edges, forest_pairs(par), n).materialize()

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
        par_m, pre_ds, nd_ds, low_ds, high_ds = _sweeps_distributed(
            par, nt, num_buckets
        )
        par = par_m
        # rule 2 assembled by joins keyed on child (w) and parent (v)
        w_side = safe_join(
            safe_join(
                par,
                low_ds.rename_columns({"vid": "__l", "low": "low"}),
                join_type="inner",
                num_partitions=8,
                on=("vid",),
                right_on=("__l",),
            ),
            high_ds.rename_columns({"vid": "__h", "high": "high"}),
            join_type="inner",
            num_partitions=8,
            on=("vid",),
            right_on=("__h",),
        )
        v_info = safe_join(
            safe_join(
                # v non-root <=> v itself has a par row
                par.select_columns(["vid"]).rename_columns({"vid": "pv"}),
                pre_ds.rename_columns({"vid": "__p", "pre": "ppre"}),
                join_type="inner",
                num_partitions=8,
                on=("pv",),
                right_on=("__p",),
            ),
            nd_ds.rename_columns({"vid": "__n", "nd": "pnd"}),
            join_type="inner",
            num_partitions=8,
            on=("pv",),
            right_on=("__n",),
        )
        joined = safe_join(
            w_side,
            v_info,
            join_type="inner",
            num_partitions=8,
            on=("parent",),
            right_on=("pv",),
        )

        def rule2_rows(t: pa.Table) -> pa.Table:
            w = t.column("vid").to_numpy(zero_copy_only=False)
            v = t.column("parent").to_numpy(zero_copy_only=False)
            lo = t.column("low").to_numpy(zero_copy_only=False)
            hi = t.column("high").to_numpy(zero_copy_only=False)
            pv = t.column("ppre").to_numpy(zero_copy_only=False)
            nv = t.column("pnd").to_numpy(zero_copy_only=False)
            m = (lo < pv) | (hi > pv + nv - 1)
            return pa.table(
                {
                    "src": pa.array(np.minimum(w, v)[m], pa.int64()),
                    "dst": pa.array(np.maximum(w, v)[m], pa.int64()),
                }
            )

        gpp = nt.union(
            drop_empty_blocks(
                joined.map_batches(rule2_rows, batch_format="pyarrow")
            )
        )

    gpp = drop_empty_blocks(gpp).materialize()
    if gpp.count() == 0:
        # forest-only graph: every tree edge is its own singleton block
        blocks = par.select_columns(["vid"]).map_batches(
            lambda t: pa.table({"vid": t.column("vid"),
                                "block": t.column("vid")}),
            batch_format="pyarrow",
        ).materialize()
        return BiconnRun(blocks=blocks, par=par, nt=nt, n=n)
    comp = connected_components_bsp(Graph(n=n, edges=gpp)).components
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
    return BiconnRun(blocks=blocks, par=par, nt=nt, n=n)


def _sweeps_distributed(
    par: rd.Dataset, nt: rd.Dataset, num_buckets: int
) -> tuple[rd.Dataset, rd.Dataset, rd.Dataset, rd.Dataset, rd.Dataset]:
    """Level-synchronous tree sweeps over Datasets (the fallback above
    ``broadcast_max``): bottom-up nd, top-down pre, bottom-up low/high.
    O(depth) rounds; each round moves only two adjacent BFS levels.
    Returns (par materialized, pre, nd, low, high) Datasets keyed by
    vid; pre additionally covers the roots (pre = 0)."""
    par = par.materialize()
    maxd_val = par.max("depth")
    maxd = int(maxd_val) if maxd_val is not None else 0

    def level(ds: rd.Dataset, d: int) -> rd.Dataset:
        return ds.filter(expr=f"depth == {d}").materialize()

    lev = {d: level(par, d) for d in range(1, maxd + 1)}

    # ---- bottom-up nd ----
    nd_lev: dict[int, rd.Dataset] = {}
    child_sum: rd.Dataset | None = None
    for d in range(maxd, 0, -1):
        cur = lev[d].select_columns(["vid", "parent"])
        if child_sum is None:
            base = cur.map_batches(
                lambda t: t.append_column(
                    "nd", pa.array(np.ones(len(t), dtype=np.int64))
                ),
                batch_format="pyarrow",
            )
        else:
            j = safe_join(
                cur,
                child_sum.rename_columns({"parent": "__p", "s": "s"}),
                join_type="left_outer",
                num_partitions=8,
                on=("vid",),
                right_on=("__p",),
            )

            def add_nd(t: pa.Table) -> pa.Table:
                s = pc.coalesce(t.column("s"), pa.scalar(0, pa.int64()))
                return pa.table(
                    {
                        "vid": t.column("vid"),
                        "parent": t.column("parent"),
                        "nd": pc.add(s, pa.scalar(1, pa.int64())),
                    }
                )

            base = j.map_batches(add_nd, batch_format="pyarrow")
        nd_lev[d] = base.materialize()
        child_sum = grouped_agg(
            nd_lev[d].select_columns(["parent", "nd"]),
            ["parent"],
            {"s": ("nd", "sum")},
            num_buckets=num_buckets,
        ).materialize()
    nd_ds = (
        rd.from_arrow(
            pa.table({"vid": pa.array([], pa.int64()),
                      "nd": pa.array([], pa.int64())})
        )
        if not nd_lev
        else _union_all(
            [v.select_columns(["vid", "nd"]) for v in nd_lev.values()]
        )
    )

    # ---- top-down pre (component-local; roots = 0) ----
    roots = (
        grouped_agg(
            par.select_columns(["parent"]),
            ["parent"],
            {"c": ("parent", "count")},
            num_buckets=num_buckets,
        )
        .select_columns(["parent"])
        .rename_columns({"parent": "vid"})
    )
    root_par_vids = par.select_columns(["vid"])
    from parallel_pagerank_ray.util import anti_join

    root_only = anti_join(roots, root_par_vids, on="vid")
    pre_lev: dict[int, rd.Dataset] = {
        0: root_only.map_batches(
            lambda t: t.append_column(
                "pre", pa.array(np.zeros(len(t), dtype=np.int64))
            ),
            batch_format="pyarrow",
        ).materialize()
    }
    pre_all = [pre_lev[0]]
    for d in range(1, maxd + 1):
        parents = pre_lev[d - 1]
        cur = nd_lev[d]  # (vid, parent, nd)
        j = safe_join(
            cur,
            parents.rename_columns({"vid": "__pp", "pre": "ppre"}),
            join_type="inner",
            num_partitions=8,
            on=("parent",),
            right_on=("__pp",),
        )

        def keyed(df: pd.DataFrame) -> pd.DataFrame:
            df = df.copy()
            df["__b"] = (
                df["parent"].to_numpy().astype(np.int64) % num_buckets
            )
            return df

        def cumpre(g: pd.DataFrame) -> pd.DataFrame:
            order = np.lexsort(
                (g["vid"].to_numpy(), g["parent"].to_numpy())
            )
            s = g.iloc[order]
            ndv = s["nd"].to_numpy().astype(np.int64)
            grp = s.groupby("parent", sort=False)
            sib = grp["nd"].cumsum().to_numpy().astype(np.int64) - ndv
            return pd.DataFrame(
                {
                    "vid": s["vid"].to_numpy(),
                    "pre": s["ppre"].to_numpy().astype(np.int64) + 1 + sib,
                }
            )

        pre_lev[d] = (
            j.map_batches(keyed, batch_format="pandas")
            .groupby("__b")
            .map_groups(cumpre, batch_format="pandas")
            # rename_columns downstream needs Arrow blocks, not the
            # pandas blocks map_groups emits
            .map_batches(lambda t: t, batch_format="pyarrow")
            .materialize()
        )
        pre_all.append(pre_lev[d])
    pre_ds = _union_all(pre_all).materialize()

    # ---- base = min/max(pre(self), pre(non-tree neighbors)) ----
    if nt.count() == 0:
        base = pre_ds.map_batches(
            lambda t: pa.table(
                {
                    "vid": t.column("vid"),
                    "bmin": t.column("pre"),
                    "bmax": t.column("pre"),
                }
            ),
            batch_format="pyarrow",
        ).materialize()
        return _finish_sweeps(par, pre_ds, nd_ds, base, lev, maxd, num_buckets)
    nt_min = grouped_agg(
        _union_all(
            [
                safe_join(
                    nt.select_columns(["src", "dst"]),
                    pre_ds.rename_columns({"vid": "__v", "pre": "p"}),
                    join_type="inner",
                    num_partitions=8,
                    on=("dst",),
                    right_on=("__v",),
                ).select_columns(["src", "p"]).rename_columns({"src": "vid"}),
                safe_join(
                    nt.select_columns(["src", "dst"]),
                    pre_ds.rename_columns({"vid": "__v", "pre": "p"}),
                    join_type="inner",
                    num_partitions=8,
                    on=("src",),
                    right_on=("__v",),
                ).select_columns(["dst", "p"]).rename_columns({"dst": "vid"}),
            ]
        ),
        ["vid"],
        {"bmin": ("p", "min"), "bmax": ("p", "max")},
        num_buckets=num_buckets,
    )
    base = safe_join(
        pre_ds,
        nt_min.rename_columns({"vid": "__v"}),
        join_type="left_outer",
        num_partitions=8,
        on=("vid",),
        right_on=("__v",),
    )

    def base_rows(t: pa.Table) -> pa.Table:
        p = t.column("pre")
        return pa.table(
            {
                "vid": t.column("vid"),
                "bmin": pc.min_element_wise(p, pc.coalesce(t.column("bmin"), p)),
                "bmax": pc.max_element_wise(p, pc.coalesce(t.column("bmax"), p)),
            }
        )

    base = base.map_batches(base_rows, batch_format="pyarrow").materialize()
    return _finish_sweeps(par, pre_ds, nd_ds, base, lev, maxd, num_buckets)


def _finish_sweeps(
    par: rd.Dataset,
    pre_ds: rd.Dataset,
    nd_ds: rd.Dataset,
    base: rd.Dataset,
    lev: dict,
    maxd: int,
    num_buckets: int,
):
    # ---- bottom-up low/high fold of base over subtrees ----
    low_lev: dict[int, rd.Dataset] = {}
    child_fold: rd.Dataset | None = None
    for d in range(maxd, 0, -1):
        cur = safe_join(
            lev[d].select_columns(["vid", "parent"]),
            base.rename_columns({"vid": "__v"}),
            join_type="inner",
            num_partitions=8,
            on=("vid",),
            right_on=("__v",),
        )
        if child_fold is not None:
            cur = safe_join(
                cur,
                child_fold.rename_columns(
                    {"parent": "__p", "cmin": "cmin", "cmax": "cmax"}
                ),
                join_type="left_outer",
                num_partitions=8,
                on=("vid",),
                right_on=("__p",),
            )

            def folded(t: pa.Table) -> pa.Table:
                bmin = t.column("bmin")
                bmax = t.column("bmax")
                return pa.table(
                    {
                        "vid": t.column("vid"),
                        "parent": t.column("parent"),
                        "low": pc.min_element_wise(
                            bmin, pc.coalesce(t.column("cmin"), bmin)
                        ),
                        "high": pc.max_element_wise(
                            bmax, pc.coalesce(t.column("cmax"), bmax)
                        ),
                    }
                )

            cur = cur.map_batches(folded, batch_format="pyarrow")
        else:
            cur = cur.rename_columns({"bmin": "low", "bmax": "high"})
        low_lev[d] = cur.materialize()
        child_fold = grouped_agg(
            low_lev[d].select_columns(["parent", "low", "high"]),
            ["parent"],
            {"cmin": ("low", "min"), "cmax": ("high", "max")},
            num_buckets=num_buckets,
        ).materialize()
    lowhigh = _union_all(
        [v.select_columns(["vid", "low", "high"]) for v in low_lev.values()]
    ).materialize()
    low_ds = lowhigh.select_columns(["vid", "low"])
    high_ds = lowhigh.select_columns(["vid", "high"])
    return par, pre_ds, nd_ds, low_ds, high_ds


def _union_all(parts: list[rd.Dataset]) -> rd.Dataset:
    out = parts[0]
    for p in parts[1:]:
        out = out.union(p)
    return out


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
