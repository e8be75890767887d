"""Bridge (cut-edge) detection via the cycle-space XOR sketch.

A bridge is an edge whose removal disconnects its component — the
edge-connectivity primitive behind mirror detection, backbone
extraction and 2-edge-connected decomposition. Sequential Tarjan DFS
does not distribute; this uses the linear-sketch construction from the
graph-streaming literature (Ahn-Guha-McGregor-style cycle space):

  1. spanning forest F = the BFS tree from each component's minimum
     vertex with the min-parent rule (parent(v) = smallest neighbor
     one level closer to the root) — deterministic, SQL-replayable,
     and SHALLOW: depth(F) <= graph eccentricity, so the subtree fold
     below runs in O(log diameter) rounds (a Boruvka/DFS forest can be
     a Theta(n)-deep path; the BFS tree never is);
  2. every NON-tree edge gets a 62-bit label (md5 of the canonical
     pair — fixed seed, so the "random" labels are deterministic and a
     SQL oracle replays them);
  3. a tree edge's accumulated label = XOR of the labels of the
     non-tree edges whose tree path covers it, computed as the XOR of
     per-vertex incident-label values over one side's subtree
     (endpoints inside the subtree pair up and cancel); the subtree
     fold routes every vertex's value to each of its ancestors via
     duplicate-free binary lifting (jump pointers J_k(x) = 2^k-th
     ancestor; ancestors in (2^k, 2^(k+1)] of x = ancestors within
     2^k of J_k(x) — disjoint ranges, so no dedup shuffle per round);
  4. bridge <=> accumulated label == 0. Non-tree edges are never
     bridges; a covered tree edge XORs a nonempty set of independent
     62-bit values, which is 0 with probability 2^-62 per edge
     (Monte-Carlo one-sided, deterministic given the md5 seed — the
     standard cycle-sketch guarantee; the SQL gate replays the exact
     same labels, so the check is value-exact regardless).

Scale shape: one BSP connected-components run (roots), one
multi-source BSP BFS (levels), min-parent = one bucketed combine,
non-tree split = one packed anti-join, values = one grouped XOR, the
ancestor table = O(log diameter) joins totalling the tree's path
decomposition (n x depth rows), one grouped XOR fold. No step holds a
component on one worker; no driver pull beyond scalars.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data as rd

from parallel_pagerank_ray.pipelines.graph_build import Graph, undirected_edges
from parallel_pagerank_ray.stages.agg import grouped_agg, grouped_xor
from parallel_pagerank_ray.util import anti_join, drop_empty_blocks, safe_join

_LABEL_MOD = np.int64(1) << 62  # labels in [0, 2^62): int64-safe, SQL-safe


def _edge_labels(t: pa.Table) -> pa.Table:
    from parallel_pagerank_ray.functions.hashing import md5_u64

    s = t.column("src").to_numpy(zero_copy_only=False)
    d = t.column("dst").to_numpy(zero_copy_only=False)
    lab = np.fromiter(
        (md5_u64(f"br|{a}|{b}") % int(_LABEL_MOD) for a, b in zip(s, d)),
        np.int64,
        len(s),
    )
    return pa.table(
        {
            "src": t.column("src"),
            "dst": t.column("dst"),
            "lab": pa.array(lab, pa.int64()),
        }
    )


def _bfs_forest_local(
    src: np.ndarray, dst: np.ndarray, n: int, max_depth: int = 10_000
) -> tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
    """Driver-local min-parent BFS forest — bit-identical semantics to
    the BSP path below (roots = component minima, levels = multi-source
    BFS, parent = smallest neighbor one level closer), all vectorized
    numpy. Returns (child_vids, parents, depths, dist) where dist is
    dense over [0, n) (isolated vertices are their own roots at 0, as
    the BSP engine reports them). Used under ``local_max_edges``: at
    web scale the thinned backbone graphs this family runs on are tiny
    relative to the corpus, and six BSP actor pools cost more than the
    whole computation."""
    s = np.concatenate([src, dst])
    d = np.concatenate([dst, src])
    order = np.lexsort((d, s))
    s, d = s[order], d[order]
    indptr = np.searchsorted(s, np.arange(n + 1, dtype=np.int64))
    # components: min-label propagation + pointer jumping to fixpoint
    comp = np.arange(n, dtype=np.int64)
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
    roots = np.unique(comp)
    dist = np.full(n, -1, dtype=np.int64)
    dist[roots] = 0
    frontier = roots
    depth = 0
    while len(frontier) and depth < max_depth:
        depth += 1
        lo = indptr[frontier]
        lens = indptr[frontier + 1] - lo
        m = lens > 0
        lo, lens = lo[m], lens[m]
        if not len(lo):
            break
        csum = np.concatenate(([0], np.cumsum(lens)[:-1]))
        pos = (
            np.arange(int(lens.sum()))
            - np.repeat(csum, lens)
            + np.repeat(lo, lens)
        )
        nbrs = np.unique(d[pos])
        fresh = nbrs[dist[nbrs] < 0]
        dist[fresh] = depth
        frontier = fresh
    cand = (dist[s] >= 0) & (dist[s] + 1 == dist[d])
    cs, cd = s[cand], d[cand]
    parent = np.full(n, np.iinfo(np.int64).max, dtype=np.int64)
    np.minimum.at(parent, cd, cs)
    childs = np.unique(cd)
    return childs, parent[childs], dist[childs], dist


def bfs_forest(
    graph: Graph,
    num_buckets: int,
    max_depth: int = 10_000,
    broadcast_max: int = 20_000_000,
    local_max_edges: int = 2_000_000,
) -> tuple[rd.Dataset, rd.Dataset]:
    """The deterministic min-parent BFS spanning forest shared by the
    bridge sketch and Tarjan-Vishkin biconnectivity: roots = component
    minima (one BSP connected-components run), levels = one multi-source
    BSP BFS from the roots, parent(v) = the SMALLEST neighbor one level
    closer to the root (one bucketed combine). Returns

      par: (vid, parent, depth) for every NON-ROOT vertex incident to
           an edge, materialized
      dep: (vid, dist) BFS levels for every vertex in the edge set,
           materialized

    The forest is shallow (depth <= graph eccentricity) and fully
    SQL-replayable — both downstream algorithms rely on each property.
    """
    from parallel_pagerank_ray.pipelines.bfs import bfs_distances_bsp
    from parallel_pagerank_ray.pipelines.components_actors import (
        connected_components_bsp,
    )
    from parallel_pagerank_ray.stages.csr_store import edge_count_hint

    ne = edge_count_hint(graph.edges)
    if (
        ne is not None
        and ne <= local_max_edges
        and 0 < graph.n <= 20_000_000
    ):
        from parallel_pagerank_ray.util import pull_table

        et = pull_table(graph.edges, ["src", "dst"])
        childs, parents, depths, dist = _bfs_forest_local(
            et.column("src").to_numpy(zero_copy_only=False),
            et.column("dst").to_numpy(zero_copy_only=False),
            graph.n,
            max_depth=max_depth,
        )
        par = rd.from_arrow(
            pa.table(
                {
                    "vid": pa.array(childs, pa.int64()),
                    "parent": pa.array(parents, pa.int64()),
                    "depth": pa.array(depths, pa.int64()),
                }
            )
        ).materialize()
        dep = rd.from_arrow(
            pa.table(
                {
                    "vid": pa.array(
                        np.arange(graph.n, dtype=np.int64), pa.int64()
                    ),
                    "dist": pa.array(dist, pa.int64()),
                }
            )
        ).materialize()
        return par, dep

    comp = connected_components_bsp(graph).components
    roots = grouped_agg(
        comp.select_columns(["comp"]),
        ["comp"],
        {"c": ("comp", "count")},
        num_buckets=num_buckets,
    ).select_columns(["comp"]).rename_columns({"comp": "vid"})
    dep = (
        bfs_distances_bsp(graph, sources_ds=roots, max_depth=max_depth)
        .distances.select_columns(["vid", "dist"])
        .materialize()
    )

    edges = graph.edges.select_columns(["src", "dst"])
    fc = undirected_edges(edges, dedup=False)

    # attach BFS levels to both endpoints. Fast path: the dist vector
    # is O(#vertices-in-edges) — broadcast it once via ray.put and test
    # both endpoints in ONE stateless map instead of two hash-shuffle
    # joins of the closure (the dominant cost of the sparse gates).
    from parallel_pagerank_ray.util import count_rows_once

    n_dep, dep = count_rows_once(dep)
    if n_dep <= broadcast_max and graph.n <= 50_000_000:
        import ray as _ray

        dt = pa.concat_tables(_ray.get(dep.to_arrow_refs()))
        dist = np.full(graph.n, np.int64(-1), dtype=np.int64)
        dist[dt.column("vid").to_numpy(zero_copy_only=False)] = dt.column(
            "dist"
        ).to_numpy(zero_copy_only=False)
        dref = _ray.put(dist)

        def parent_cand_bcast(t: pa.Table) -> pa.Table:
            dv_all = _ray.get(dref)
            s = t.column("src").to_numpy(zero_copy_only=False)
            d = t.column("dst").to_numpy(zero_copy_only=False)
            du = dv_all[s]
            dv = dv_all[d]
            m = (du >= 0) & (du + 1 == dv)  # src one level above dst
            return pa.table(
                {
                    "vid": pa.array(d[m], pa.int64()),
                    "parent": pa.array(s[m], pa.int64()),
                    "depth": pa.array(dv[m], pa.int64()),
                }
            )

        cand = fc.map_batches(parent_cand_bcast, batch_format="pyarrow")
    else:
        j1 = safe_join(
            fc,
            dep.rename_columns({"vid": "__u", "dist": "du"}),
            join_type="inner",
            num_partitions=8,
            on=("src",),
            right_on=("__u",),
        )
        j2 = safe_join(
            j1,
            dep.rename_columns({"vid": "__v", "dist": "dv"}),
            join_type="inner",
            num_partitions=8,
            on=("dst",),
            right_on=("__v",),
        )

        def parent_cand(t: pa.Table) -> pa.Table:
            du = t.column("du").to_numpy(zero_copy_only=False)
            dv = t.column("dv").to_numpy(zero_copy_only=False)
            m = du + 1 == dv  # src one level above dst
            return pa.table(
                {
                    "vid": t.column("dst").filter(pa.array(m)),
                    "parent": t.column("src").filter(pa.array(m)),
                    "depth": pa.array(dv[m], pa.int64()),
                }
            )

        cand = j2.map_batches(parent_cand, batch_format="pyarrow")

    par = grouped_agg(
        cand,
        ["vid"],
        {"parent": ("parent", "min"), "depth": ("depth", "min")},
        num_buckets=num_buckets,
    ).materialize()
    return par, dep


def forest_pairs(par: rd.Dataset) -> rd.Dataset:
    """Canonical (src < dst) edge rows of the spanning forest."""

    def forest_rows(t: pa.Table) -> pa.Table:
        u = t.column("parent").to_numpy(zero_copy_only=False)
        v = t.column("vid").to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "src": pa.array(np.minimum(u, v), pa.int64()),
                "dst": pa.array(np.maximum(u, v), pa.int64()),
            }
        )

    return par.map_batches(forest_rows, batch_format="pyarrow").materialize()


def nontree_edges(
    edges: rd.Dataset, forest: rd.Dataset, n: int
) -> rd.Dataset:
    """Edges of the canonical simple edge set NOT in the spanning
    forest, via one packed anti-join (keys need n < 3e9)."""

    def pack(b: dict[str, np.ndarray]) -> dict[str, np.ndarray]:
        b["__key"] = b["src"] * np.int64(n) + b["dst"]
        return b

    return anti_join(
        edges.map_batches(pack, batch_format="numpy"),
        forest.map_batches(pack, batch_format="numpy").select_columns(
            ["__key"]
        ),
        on="__key",
        # the forest key set is 8 B/vertex — broadcastable far beyond
        # the generic blocklist default (one plasma copy per node,
        # searchsorted per batch beats a 2x100M-row hash anti-join)
        broadcast_max=20_000_000,
    ).select_columns(["src", "dst"])


def edge_cut_sigs(
    graph: Graph,
    num_buckets: int | None = None,
    max_depth: int = 10_000,
    broadcast_max: int = 5_000_000,
) -> rd.Dataset:
    """Cycle-space signature of EVERY edge: (src, dst, sig, is_tree).
    A non-tree edge's sig is its own 62-bit md5 label; a tree edge's
    sig is the XOR of the labels of the non-tree edges covering it.
    Downstream (whp-exact, same guarantee as the module docstring):

      sig == 0 and is_tree       <=> the edge is a BRIDGE (1-cut)
      sig(e) == sig(f) != 0      <=> {e, f} is a minimal 2-edge cut
                                     (the classic cut-class property of
                                     the cycle-space sketch)

    Same input contract as ``bridges`` (canonical simple edges).
    """
    from parallel_pagerank_ray.stages.agg import resolve_num_buckets

    n = graph.n
    empty = rd.from_arrow(
        pa.table(
            {
                "src": pa.array([], pa.int64()),
                "dst": pa.array([], pa.int64()),
                "sig": pa.array([], pa.int64()),
                "is_tree": pa.array([], pa.int64()),
            }
        )
    )
    if n == 0:
        return empty
    if n > 3_000_000_000:  # pragma: no cover - packed key contract
        raise ValueError("bridges packed anti-join needs n < 3e9")
    if num_buckets is None:
        num_buckets = resolve_num_buckets(graph.edges)
    edges = graph.edges.select_columns(["src", "dst"]).materialize()
    if edges.count() == 0:
        return empty

    # 1. roots = component minima; levels = multi-source BFS; the BFS
    # tree with the min-parent rule is the spanning forest
    par, dep = bfs_forest(graph, num_buckets, max_depth=max_depth)
    forest = forest_pairs(par)

    # 2. non-tree edges + labels
    nt = nontree_edges(edges, forest, n)
    ntl = nt.map_batches(_edge_labels, batch_format="pyarrow")

    # 3. per-vertex value = XOR of incident non-tree labels
    def incident(t: pa.Table) -> pa.Table:
        return pa.concat_tables(
            [
                pa.table({"vid": t.column("src"), "lab": t.column("lab")}),
                pa.table({"vid": t.column("dst"), "lab": t.column("lab")}),
            ]
        )

    val = grouped_xor(
        ntl.map_batches(incident, batch_format="pyarrow"),
        "vid",
        "lab",
        num_buckets=num_buckets,
    ).materialize()
    def tree_sig0(t: pa.Table) -> pa.Table:
        z = pa.array(np.zeros(len(t), np.int64))
        return pa.table(
            {
                "src": t.column("src"),
                "dst": t.column("dst"),
                "sig": z,
                "is_tree": pa.array(np.ones(len(t), np.int64)),
            }
        )

    if val.count() == 0:
        # no non-tree edge anywhere: the graph IS its forest, every
        # edge is a bridge (also sidesteps Dataset.join's schema-less
        # empty-side failure mode)
        return forest.map_batches(tree_sig0, batch_format="pyarrow")

    def nt_rows(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "src": t.column("src"),
                "dst": t.column("dst"),
                "sig": t.column("lab"),
                "is_tree": pa.array(np.zeros(len(t), np.int64)),
            }
        )

    nt_sigs = ntl.map_batches(nt_rows, batch_format="pyarrow")

    # fast path: the fold state is (vid, parent, depth, val) — one row
    # per non-root vertex. Under the broadcast bound, pull it once and
    # run the bottom-up XOR in numpy (the msf broadcast-path idiom);
    # the distributed lifting below computes the identical labels and
    # is force-tested equal at bound 0
    from parallel_pagerank_ray.util import count_rows_once

    n_par, par = count_rows_once(par)
    if n_par <= broadcast_max:
        import ray as _ray

        pt = pa.concat_tables(_ray.get(par.to_arrow_refs()))
        vt = pa.concat_tables(_ray.get(val.to_arrow_refs()))
        vids = pt.column("vid").to_numpy(zero_copy_only=False)
        pars = pt.column("parent").to_numpy(zero_copy_only=False)
        deps = pt.column("depth").to_numpy(zero_copy_only=False)
        acc = np.zeros(n, dtype=np.int64)
        acc[vt.column("vid").to_numpy(zero_copy_only=False)] = vt.column(
            "lab"
        ).to_numpy(zero_copy_only=False)
        order = np.argsort(-deps, kind="stable")
        vids, pars, deps = vids[order], pars[order], deps[order]
        labels = np.empty(len(vids), dtype=np.int64)
        lo = 0
        while lo < len(vids):
            hi = lo + int(np.searchsorted(-deps[lo:], -deps[lo], "right"))
            labels[lo:hi] = acc[vids[lo:hi]]
            np.bitwise_xor.at(acc, pars[lo:hi], acc[vids[lo:hi]])
            lo = hi
        tree = rd.from_arrow(
            pa.table(
                {
                    "src": pa.array(np.minimum(vids, pars), pa.int64()),
                    "dst": pa.array(np.maximum(vids, pars), pa.int64()),
                    "sig": pa.array(labels, pa.int64()),
                    "is_tree": pa.array(
                        np.ones(len(vids), np.int64), pa.int64()
                    ),
                }
            )
        )
        return tree.union(nt_sigs)

    # 4. ancestor pairs via duplicate-free binary lifting: P = proper
    # ancestors within 2^k steps, J = the exact-2^k jump pointer;
    # ancestors in (2^k, 2^(k+1)] of x = ancestors within 2^k of
    # J(x) — disjoint ranges, so the union needs no dedup shuffle
    maxd_row = dep.max("dist") if dep.count() else None
    maxd = int(maxd_row) if maxd_row is not None else 0
    P = (
        par.select_columns(["vid", "parent"])
        .rename_columns({"vid": "x", "parent": "a"})
        .materialize()
    )
    J = P  # exact-1 jump
    horizon = 1
    while horizon < maxd:
        shifted = safe_join(
            J,
            P.rename_columns({"x": "__m", "a": "b"}),
            join_type="inner",
            num_partitions=8,
            on=("a",),
            right_on=("__m",),
        ).select_columns(["x", "b"]).rename_columns({"b": "a"})
        newJ = safe_join(
            J,
            J.rename_columns({"x": "__m", "a": "b"}),
            join_type="inner",
            num_partitions=8,
            on=("a",),
            right_on=("__m",),
        ).select_columns(["x", "b"]).rename_columns({"b": "a"})
        # shifted = ancestors of J(x) within 2^k = ancestors of x at
        # distances (2^k, 2^(k+1)] — disjoint from P, union is dedup-free
        P = P.union(shifted).materialize()
        J = newJ.materialize()
        horizon *= 2

    # 5. label(edge above v) = val(v) XOR (XOR of val(x) over proper
    # descendants x): route every x's val to each ancestor, fold
    desc_vals = safe_join(
        P,
        val.rename_columns({"vid": "__v"}),
        join_type="inner",
        num_partitions=8,
        on=("x",),
        right_on=("__v",),
    ).select_columns(["a", "lab"]).rename_columns({"a": "vid"})
    sub = grouped_xor(
        desc_vals.union(val),
        "vid",
        "lab",
        num_buckets=num_buckets,
    )
    lab_edges = safe_join(
        par,
        sub.rename_columns({"vid": "__s", "lab": "sub"}),
        join_type="left_outer",
        num_partitions=8,
        on=("vid",),
        right_on=("__s",),
    )

    def finish(df: pd.DataFrame) -> pd.DataFrame:
        u = df["parent"].astype(np.int64).to_numpy()
        v = df["vid"].astype(np.int64).to_numpy()
        lab = df["sub"].fillna(0).astype(np.int64).to_numpy()
        return pd.DataFrame(
            {
                "src": np.minimum(u, v),
                "dst": np.maximum(u, v),
                "sig": lab,
                "is_tree": np.ones(len(u), np.int64),
            }
        )

    out = lab_edges.map_batches(finish, batch_format="pandas")
    return drop_empty_blocks(out).union(nt_sigs)


def bridges(
    graph: Graph,
    num_buckets: int | None = None,
    max_depth: int = 10_000,
    broadcast_max: int = 5_000_000,
) -> rd.Dataset:
    """All bridges of the undirected simple graph as canonical
    (src, dst) rows, src < dst. Requires ``graph.edges`` canonical
    simple (src < dst, distinct, no self-loops) — the triangle-family
    certificate. Deterministic (md5-seeded sketch; whp-exact, see
    module docstring). Packed anti-join keys need n < 3e9.
    """
    sigs = edge_cut_sigs(
        graph,
        num_buckets=num_buckets,
        max_depth=max_depth,
        broadcast_max=broadcast_max,
    )

    def pick(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        m = pc.and_(
            pc.equal(t.column("sig"), pa.scalar(0, pa.int64())),
            pc.equal(t.column("is_tree"), pa.scalar(1, pa.int64())),
        )
        f = t.filter(m)
        return pa.table({"src": f.column("src"), "dst": f.column("dst")})

    return drop_empty_blocks(sigs.map_batches(pick, batch_format="pyarrow"))


def two_edge_cuts(
    graph: Graph,
    num_buckets: int | None = None,
    max_depth: int = 10_000,
    broadcast_max: int = 5_000_000,
    max_class: int = 10_000,
) -> rd.Dataset:
    """All minimal 2-edge cutsets {e, f} (removing both disconnects a
    component; neither is a bridge alone), whp-exact via the classic
    cut-class property of the cycle-space sketch: two edges form a
    2-cut iff their signatures are EQUAL and nonzero. Output one row
    per unordered pair, canonical packed order:
    (src1, dst1, src2, dst2).

    Scale shape: one ``edge_cut_sigs`` run, then ONE bucketed shuffle
    keyed on the signature and a vectorized all-pairs kernel per
    signature class. A class of k edges (a k-edge bond chain, e.g. one
    long induced cycle) yields C(k, 2) pairs; classes larger than
    ``max_class`` emit no pairs (the LSH hub-guard rule — deterministic
    function of class size, reproduced by the SQL oracle's HAVING).
    """
    from parallel_pagerank_ray.stages.agg import (
        grouped_agg,
        pairs_within_groups,
        resolve_num_buckets,
    )

    if num_buckets is None:
        num_buckets = resolve_num_buckets(graph.edges)
    n = graph.n
    empty = rd.from_arrow(
        pa.table(
            {
                "src1": pa.array([], pa.int64()),
                "dst1": pa.array([], pa.int64()),
                "src2": pa.array([], pa.int64()),
                "dst2": pa.array([], pa.int64()),
            }
        )
    )
    if n == 0:
        return empty
    sigs = edge_cut_sigs(
        graph,
        num_buckets=num_buckets,
        max_depth=max_depth,
        broadcast_max=broadcast_max,
    )
    nb = np.int64(n)

    def keyed(t: pa.Table) -> pa.Table:
        sg = t.column("sig").to_numpy(zero_copy_only=False)
        m = sg != 0
        s_ = t.column("src").to_numpy(zero_copy_only=False)[m]
        d_ = t.column("dst").to_numpy(zero_copy_only=False)[m]
        sg = sg[m]
        return pa.table(
            {
                "sig": pa.array(sg, pa.int64()),
                "packed": pa.array(s_ * nb + d_, pa.int64()),
                "bucket": pa.array(sg % np.int64(num_buckets), pa.int64()),
            }
        )

    def pairs(g: pd.DataFrame) -> pd.DataFrame:
        a, b = pairs_within_groups(
            (
                g["sig"].to_numpy().astype(np.int64),
                g["packed"].to_numpy().astype(np.int64),
            ),
            g["packed"].to_numpy().astype(np.int64),
            max_group=max_class,
        )
        return pd.DataFrame(
            {
                "src1": a // nb,
                "dst1": a % nb,
                "src2": b // nb,
                "dst2": b % nb,
            }
        )

    out = (
        sigs.map_batches(keyed, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(pairs, batch_format="pandas")
    )
    return drop_empty_blocks(out)


def two_edge_components(
    graph: Graph,
    num_buckets: int | None = None,
    broadcast_max: int = 5_000_000,
) -> rd.Dataset:
    """2-edge-connected components: delete every bridge, then label the
    remaining graph's connected components (the classic bridge-tree
    construction's vertex side). Output (vid, comp2) for every endpoint
    of the ORIGINAL edge set — comp2 = min vid of the 2ecc; a vertex
    isolated by bridge removal is its own singleton class.

    Same input contract and guarantees as ``bridges`` (canonical simple
    edges; md5-seeded whp-exact sketch). Cost = one bridges() run + one
    packed anti-join + one BSP connected-components run.
    """
    import pyarrow as pa

    from parallel_pagerank_ray.pipelines.components_actors import (
        connected_components_bsp,
    )
    from parallel_pagerank_ray.stages.agg import resolve_num_buckets

    n = graph.n
    if n == 0:
        return rd.from_arrow(
            pa.table(
                {"vid": pa.array([], pa.int64()),
                 "comp2": pa.array([], pa.int64())}
            )
        )
    if num_buckets is None:
        num_buckets = resolve_num_buckets(graph.edges)
    edges = graph.edges.select_columns(["src", "dst"]).materialize()
    br = bridges(
        graph, num_buckets=num_buckets, broadcast_max=broadcast_max
    ).materialize()

    def pack(b: dict[str, np.ndarray]) -> dict[str, np.ndarray]:
        b["__key"] = b["src"] * np.int64(n) + b["dst"]
        return b

    if br.count():
        kept = anti_join(
            edges.map_batches(pack, batch_format="numpy"),
            br.map_batches(pack, batch_format="numpy").select_columns(
                ["__key"]
            ),
            on="__key",
        ).select_columns(["src", "dst"]).materialize()
    else:
        kept = edges
    comp = connected_components_bsp(Graph(n=n, edges=kept)).components
    verts = grouped_agg(
        undirected_edges(edges, dedup=False),
        ["src"],
        {"c": ("dst", "count")},
        num_buckets=num_buckets,
    ).select_columns(["src"]).rename_columns({"src": "vid"})
    out = safe_join(
        verts,
        comp.rename_columns({"vid": "__v", "comp": "comp2"}),
        join_type="inner",
        num_partitions=8,
        on=("vid",),
        right_on=("__v",),
    ).select_columns(["vid", "comp2"])
    return drop_empty_blocks(out)
