"""Exact triangle counting (undirected simple closure of the digraph).

Standard distributed compact-forward: orient each undirected edge from
the endpoint with smaller (degree, vid) to the larger — bounding every
oriented out-degree at O(sqrt(E)), the skew-taming step (SURVEY.md §7.6,
"heaviest shuffle, needs skew salting") — then

    wedges   bucket(u) -> vectorized all-pairs of each u's out-neighbors
    closure  wedges ∪ oriented-edges -> bucketed (a,b) sum: a wedge
             (a,b) closes a triangle iff oriented edge (a,b) exists

All wide steps run on the bucketed vectorized shuffle (stages/agg.py) —
Ray Data's groupby().aggregate() per-row path is avoided throughout.
The count is exact and parallelism-independent (integer arithmetic
only). Matches ``oracle.triangle_count``.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray.data as rd

from parallel_pagerank_ray.pipelines.graph_build import Graph, dedup_edges
from parallel_pagerank_ray.stages.agg import grouped_agg, pairs_within_groups
from parallel_pagerank_ray.util import drop_empty_blocks, safe_join


def _simple_undirected(edges: rd.Dataset) -> rd.Dataset:
    """Canonical (min,max) form, self-loops dropped, deduplicated."""

    def canon(t: pa.Table) -> pa.Table:
        s, d = t.column("src"), t.column("dst")
        lo = pc.min_element_wise(s, d)
        hi = pc.max_element_wise(s, d)
        tbl = pa.table({"src": lo, "dst": hi})
        return tbl.filter(pc.invert(pc.equal(tbl.column("src"), tbl.column("dst"))))

    return dedup_edges(edges.map_batches(canon, batch_format="pyarrow"))


_pairs_within_groups = pairs_within_groups


def _prepare_oriented(
    graph: Graph,
    num_partitions: int | None,
    num_buckets: int | None,
    edges_simple: bool,
):
    """Shared prelude of the triangle pipelines: canonical simple
    closure, undirected degree table, compact-forward orientation.
    Returns (und, deg, oriented, num_partitions, num_buckets)."""
    n = graph.n
    if num_partitions is None:
        # bound by cluster CPUs: join aggregators reserve resources, and
        # more partitions than CPUs can wedge a small session
        import ray as _ray

        cpus = int(_ray.cluster_resources().get("CPU", 8))
        num_partitions = max(2, min(max(8, cpus), n // 100_000 + 2))
    und = (
        graph.edges if edges_simple else _simple_undirected(graph.edges)
    ).materialize()
    if num_buckets is None:
        # wedge work per group is quadratic in hub out-degree, so the
        # group count must outrun the CPU count for the scheduler to
        # hide hub-bucket stragglers: 32 groups on 32 CPUs ran 4.4x
        # slower than 128 at sf0.1. Scale with edges, floor 128.
        num_buckets = max(128, min(4096, und.count() // 10_000))

    # undirected degree per vertex (both endpoints count)
    def both_dirs(t: pa.Table) -> pa.Table:
        v = pa.concat_arrays(
            [t.column("src").combine_chunks(), t.column("dst").combine_chunks()]
        )
        return pa.table({"vid": v})

    deg = grouped_agg(
        und.map_batches(both_dirs, batch_format="pyarrow"),
        ["vid"],
        {"deg": ("vid", "count")},
        num_buckets=num_buckets,
    ).materialize()

    def _orient_arrays(
        s: np.ndarray, d: np.ndarray, ds_: np.ndarray, dd_: np.ndarray
    ) -> dict[str, np.ndarray]:
        # lexicographic (deg, vid) comparison — no n^2 composite key,
        # int64-safe at any vertex count
        fwd = (ds_ < dd_) | ((ds_ == dd_) & (s < d))
        u = np.where(fwd, s, d)
        v = np.where(fwd, d, s)
        deg_v = np.where(fwd, dd_, ds_)
        return {
            "u": u,
            "v": v,
            "deg_v": deg_v,
            "bucket": u % num_buckets,
        }

    if n * 8 <= 256 << 20:
        # degree-vector broadcast (one plasma copy per node, indexed
        # zero-copy in every task) replaces TWO hash joins — the same
        # small-side-broadcast rule as knn/triangle closure. Join path
        # below remains the unbounded-n fallback.
        import ray as _ray

        deg_vec = np.zeros(n, dtype=np.int64)
        for blk in _ray.get(deg.to_arrow_refs()):
            deg_vec[blk.column("vid").to_numpy()] = blk.column("deg").to_numpy()
        deg_ref = _ray.put(deg_vec)

        def orient_bcast(batch: dict[str, np.ndarray]) -> dict[str, np.ndarray]:
            dv = _ray.get(deg_ref)
            s, d = batch["src"], batch["dst"]
            return _orient_arrays(s, d, dv[s], dv[d])

        oriented = und.map_batches(orient_bcast, batch_format="numpy").materialize()
    else:
        # attach degree to both endpoints (hash joins), orient by (deg, vid)
        e = safe_join(
            und,
            deg,
            join_type="inner",
            num_partitions=num_partitions,
            on=("src",),
            right_on=("vid",),
        ).rename_columns({"deg": "deg_src"})
        e = safe_join(
            e,
            deg,
            join_type="inner",
            num_partitions=num_partitions,
            on=("dst",),
            right_on=("vid",),
        ).rename_columns({"deg": "deg_dst"})

        def orient(batch: dict[str, np.ndarray]) -> dict[str, np.ndarray]:
            return _orient_arrays(
                batch["src"],
                batch["dst"],
                batch["deg_src"].astype(np.int64),
                batch["deg_dst"].astype(np.int64),
            )

        oriented = e.map_batches(orient, batch_format="numpy").materialize()
    return und, deg, oriented, num_partitions, num_buckets


def triangle_count(
    graph: Graph,
    num_partitions: int | None = None,
    num_buckets: int | None = None,
    edges_simple: bool = False,
) -> int:
    """``edges_simple=True`` certifies ``graph.edges`` is already the
    simple undirected canonical form (src < dst, distinct, no self
    loops) and skips the canonicalization dedup shuffle."""
    n = graph.n
    if n == 0:
        return 0
    _, _, oriented, num_partitions, num_buckets = _prepare_oriented(
        graph, num_partitions, num_buckets, edges_simple
    )
    n_oriented = oriented.count()

    # Fast path: broadcast the oriented edge set (8 B/edge key, one
    # plasma copy per node) and count closing wedges inside the wedge
    # stage — eliminates the O(wedges) shuffle entirely. Falls back to
    # the shuffle path when the key space or edge count outgrows it.
    if n < (1 << 31) and n_oriented <= 50_000_000:
        import ray as _ray

        nb = np.int64(n)
        key_parts = [
            (blk.column("u").to_numpy().astype(np.int64) * nb
             + blk.column("v").to_numpy().astype(np.int64))
            for blk in _ray.get(oriented.to_arrow_refs())
        ]
        edge_keys = np.sort(np.concatenate(key_parts)) if key_parts else np.array([], dtype=np.int64)
        keys_ref = _ray.put(edge_keys)

        def wedge_count(g: dict[str, np.ndarray]) -> dict[str, np.ndarray]:
            keys = _ray.get(keys_ref)
            order = np.lexsort((g["v"], g["deg_v"], g["u"]))
            u = g["u"][order]
            v = g["v"][order]
            a, b = _pairs_within_groups((u, np.arange(len(u))), v)
            if len(a) == 0:
                return {"tri": np.array([0], dtype=np.int64)}
            wk = a * nb + b
            if len(keys) == 0:
                return {"tri": np.array([0], dtype=np.int64)}
            pos = np.searchsorted(keys, wk)
            valid = pos < len(keys)
            match = np.zeros(len(wk), dtype=bool)
            match[valid] = keys[pos[valid]] == wk[valid]
            return {"tri": np.array([int(match.sum())], dtype=np.int64)}

        parts = (
            oriented.groupby("bucket")
            .map_groups(wedge_count, batch_format="numpy")
            .take_all()
        )
        return int(sum(r["tri"] for r in parts))

    def wedges(g: dict[str, np.ndarray]) -> dict[str, np.ndarray]:
        # neighbor lists ordered by the orientation key (deg, vid) so an
        # emitted pair (a,b) satisfies k(a) < k(b): the wedge closes iff
        # the oriented edge (a,b) exists
        order = np.lexsort((g["v"], g["deg_v"], g["u"]))
        u = g["u"][order]
        v = g["v"][order]
        a, b = _pairs_within_groups((u, np.arange(len(u))), v)
        z = np.zeros(len(a), dtype=np.int64)
        return {"a": a, "b": b, "w": z + 1, "is_edge": z}

    wedge_ds = oriented.groupby("bucket").map_groups(wedges, batch_format="numpy")

    def edge_rows(batch: dict[str, np.ndarray]) -> dict[str, np.ndarray]:
        z = np.zeros(len(batch["u"]), dtype=np.int64)
        return {"a": batch["u"], "b": batch["v"], "w": z, "is_edge": z + 1}

    closure = drop_empty_blocks(wedge_ds).union(
        oriented.map_batches(edge_rows, batch_format="numpy")
    )
    per_pair = grouped_agg(
        closure,
        ["a", "b"],
        {"w": ("w", "sum"), "is_edge": ("is_edge", "sum")},
        num_buckets=num_buckets,
    )

    def matched(batch: dict[str, np.ndarray]) -> dict[str, np.ndarray]:
        tri = np.where(batch["is_edge"] > 0, batch["w"], 0)
        return {"tri": np.array([tri.sum()], dtype=np.int64)}

    parts = per_pair.map_batches(matched, batch_format="numpy").take_all()
    return int(sum(r["tri"] for r in parts))


def triangle_count_doulion(
    graph: Graph,
    rate_pct: int = 25,
    salt: str = "doulion",
    num_partitions: int | None = None,
    edges_simple: bool = False,
) -> tuple[int, int]:
    """DOULION-style approximate triangle count (Tsourakakis et al.,
    KDD'09): keep each undirected-canonical edge with probability
    p = rate_pct/100, count triangles on the sampled subgraph, scale by
    1/p^3. Returns ``(estimate, sampled_count)``.

    Sampling is the engine's deterministic md5 hash (``functions.
    sampling._bucket`` over the "src,dst" key) — the same edge is in or
    out across runs, partitionings, and the DuckDB oracle, so both the
    sampled count and the estimate are integer-exact and value-checkable
    (the scale uses integer floor division, not float math). Work drops
    by ~p on the edge phases and ~p^3 on the wedge phase; the stateless
    hash filter adds no shuffle.
    """
    from parallel_pagerank_ray.functions.sampling import _bucket

    if graph.n == 0:
        return 0, 0

    def keep(t: pa.Table) -> pa.Table:
        s = t.column("src").to_pylist()
        d = t.column("dst").to_pylist()
        mask = pa.array(
            [_bucket(f"{a},{b}", salt) < rate_pct for a, b in zip(s, d)]
        )
        return t.filter(mask)

    canon = graph.edges if edges_simple else _simple_undirected(graph.edges)
    samp = canon.map_batches(keep, batch_format="pyarrow")
    g2 = Graph.from_int_edges(samp, dedup=False)
    sampled = triangle_count(g2, num_partitions=num_partitions, edges_simple=True)
    est = sampled * 100**3 // rate_pct**3
    return est, sampled


def per_vertex_triangles(
    graph: Graph,
    num_partitions: int | None = None,
    num_buckets: int | None = None,
    edges_simple: bool = False,
) -> rd.Dataset:
    """Per-vertex triangle counts + local clustering coefficient:
    (vid, tri, deg, lcc) for every vertex with degree >= 1.

    Same compact-forward orientation as ``triangle_count``; each closed
    wedge (center u, out-neighbors a < b) credits all three corners.
    tri/deg are int64-exact; lcc = (2.0*tri) / (deg*(deg-1.0)) is one
    IEEE division of exact-integer operands (0.0 for deg < 2) —
    bit-reproducible at any parallelism.

    Scale shape: the broadcast fast path ships the sorted oriented key
    set once (8 B/edge, same 50M-edge bound as the count) and the
    per-bucket output is pre-combined (vid, tri) rows, O(3*triangles)
    before the final sum; the fallback routes wedge rows + edge marks
    through one bucketed shuffle keyed on the closing pair.
    """
    n = graph.n
    if n == 0:
        return rd.from_items([])
    und, deg, oriented, num_partitions, num_buckets = _prepare_oriented(
        graph, num_partitions, num_buckets, edges_simple
    )
    n_oriented = oriented.count()
    nb = np.int64(n)

    if n < (1 << 31) and n_oriented <= 50_000_000:
        import ray as _ray

        key_parts = [
            (blk.column("u").to_numpy().astype(np.int64) * nb
             + blk.column("v").to_numpy().astype(np.int64))
            for blk in _ray.get(oriented.to_arrow_refs())
        ]
        edge_keys = (
            np.sort(np.concatenate(key_parts))
            if key_parts
            else np.array([], dtype=np.int64)
        )
        keys_ref = _ray.put(edge_keys)

        def wedge_corners(g: dict[str, np.ndarray]) -> dict[str, np.ndarray]:
            keys = _ray.get(keys_ref)
            order = np.lexsort((g["v"], g["deg_v"], g["u"]))
            u = g["u"][order]
            v = g["v"][order]
            idx = np.arange(len(u))
            ia, ib = _pairs_within_groups((u, idx), idx)
            empty = {
                "vid": np.array([], dtype=np.int64),
                "tri": np.array([], dtype=np.int64),
            }
            if len(ia) == 0 or len(keys) == 0:
                return empty
            a, b = v[ia], v[ib]
            wk = a * nb + b
            pos = np.searchsorted(keys, wk)
            valid = pos < len(keys)
            match = np.zeros(len(wk), dtype=bool)
            match[valid] = keys[pos[valid]] == wk[valid]
            if not match.any():
                return empty
            corners = np.concatenate([u[ia][match], a[match], b[match]])
            ids, cnt = np.unique(corners, return_counts=True)
            return {"vid": ids, "tri": cnt.astype(np.int64)}

        tri_rows = oriented.groupby("bucket").map_groups(
            wedge_corners, batch_format="numpy"
        )
    else:
        # shuffle fallback: wedge rows carry their center; edge rows mark
        # closing pairs; one bucketed exchange keyed on the pair
        def wedges_c(g: dict[str, np.ndarray]) -> dict[str, np.ndarray]:
            order = np.lexsort((g["v"], g["deg_v"], g["u"]))
            u = g["u"][order]
            v = g["v"][order]
            idx = np.arange(len(u))
            ia, ib = _pairs_within_groups((u, idx), idx)
            a, b = v[ia], v[ib]
            return {
                "a": a,
                "b": b,
                "c": u[ia],
                "is_edge": np.zeros(len(a), dtype=np.int64),
                "pb": ((a % np.int64(2147483647)) * np.int64(1_000_151)
                       + b % np.int64(2147483647)) % np.int64(num_buckets),
            }

        def edge_marks(batch: dict[str, np.ndarray]) -> dict[str, np.ndarray]:
            a, b = batch["u"], batch["v"]
            return {
                "a": a,
                "b": b,
                "c": np.full(len(a), -1, dtype=np.int64),
                "is_edge": np.ones(len(a), dtype=np.int64),
                "pb": ((a % np.int64(2147483647)) * np.int64(1_000_151)
                       + b % np.int64(2147483647)) % np.int64(num_buckets),
            }

        closure = drop_empty_blocks(
            oriented.groupby("bucket").map_groups(wedges_c, batch_format="numpy")
        ).union(oriented.map_batches(edge_marks, batch_format="numpy"))

        def corners_in_bucket(g: dict[str, np.ndarray]) -> dict[str, np.ndarray]:
            # bucket-LOCAL dense codes: a global a*n+b key wraps int64
            # for n > ~2^32, which is exactly the regime this fallback
            # serves; local ids keep the pair key < |bucket vocab|^2
            vals = np.unique(np.concatenate([g["a"], g["b"]]))
            la = np.searchsorted(vals, g["a"]).astype(np.int64)
            lb = np.searchsorted(vals, g["b"]).astype(np.int64)
            key = la * np.int64(len(vals)) + lb
            edge_keys = np.unique(key[g["is_edge"] == 1])
            wm = (g["is_edge"] == 0) & np.isin(key, edge_keys)
            empty = {
                "vid": np.array([], dtype=np.int64),
                "tri": np.array([], dtype=np.int64),
            }
            if not wm.any():
                return empty
            corners = np.concatenate([g["c"][wm], g["a"][wm], g["b"][wm]])
            ids, cnt = np.unique(corners, return_counts=True)
            return {"vid": ids, "tri": cnt.astype(np.int64)}

        tri_rows = closure.groupby("pb").map_groups(
            corners_in_bucket, batch_format="numpy"
        )

    # every deg>=1 vertex appears in the output (tri = 0 when it closes
    # no wedge); final sum collapses the per-bucket partials
    def zero_rows(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "vid": t.column("vid"),
                "tri": pa.array(
                    np.zeros(t.num_rows, dtype=np.int64), type=pa.int64()
                ),
            }
        )

    tri_all = grouped_agg(
        drop_empty_blocks(tri_rows).union(
            deg.map_batches(zero_rows, batch_format="pyarrow")
        ),
        ["vid"],
        {"tri": ("tri", "sum")},
        num_buckets=num_buckets,
    )

    def _lcc(tri: np.ndarray, d: np.ndarray) -> np.ndarray:
        lcc = np.zeros(len(d), dtype=np.float64)
        m = d >= 2
        lcc[m] = (2.0 * tri[m]) / (d[m] * (d[m] - 1.0))
        return lcc

    if n * 8 <= 256 << 20:
        # degree-vector broadcast (same bound/pattern as the orient fast
        # path) replaces the vid hash join — one shuffle fewer
        import ray as _ray

        deg_vec = np.zeros(n, dtype=np.int64)
        for blk in _ray.get(deg.to_arrow_refs()):
            deg_vec[blk.column("vid").to_numpy()] = blk.column("deg").to_numpy()
        deg_ref2 = _ray.put(deg_vec)

        def finish_bcast(batch: dict[str, np.ndarray]) -> dict[str, np.ndarray]:
            dv = _ray.get(deg_ref2)
            tri = batch["tri"].astype(np.int64)
            d = dv[batch["vid"]]
            return {
                "vid": batch["vid"],
                "tri": tri,
                "deg": d,
                "lcc": _lcc(tri, d),
            }

        return tri_all.map_batches(finish_bcast, batch_format="numpy")

    joined = safe_join(
        tri_all,
        deg,
        join_type="inner",
        num_partitions=num_partitions,
        on=("vid",),
    )

    def finish(batch: dict[str, np.ndarray]) -> dict[str, np.ndarray]:
        tri = batch["tri"].astype(np.int64)
        d = batch["deg"].astype(np.int64)
        return {"vid": batch["vid"], "tri": tri, "deg": d, "lcc": _lcc(tri, d)}

    return joined.map_batches(finish, batch_format="numpy")


def triangle_list(
    graph: Graph,
    num_partitions: int | None = None,
    num_buckets: int | None = None,
    edges_simple: bool = False,
    broadcast_max: int = 50_000_000,
) -> rd.Dataset:
    """Enumerate triangles as numerically-sorted (a, b, c) rows —
    the candidate generator for clique-pruned Apriori (frequent
    triples) and motif analyses.

    Same compact-forward orientation + broadcast-key wedge check as
    ``triangle_count``'s fast path; each closed wedge emits one row,
    so output size is exactly the triangle count (pre-sorted inside
    the wedge kernel, no later dedup). The oriented edge set must fit
    the broadcast guard (8 B/edge, one plasma copy per node — the
    50M-edge bound shared with triangle_count); enumeration beyond it
    needs the wedge-shuffle closure path, which this caller-facing
    list variant deliberately does not hide behind the same name.
    """
    n = graph.n
    if n == 0:
        return rd.from_items([])
    _, _, oriented, num_partitions, num_buckets = _prepare_oriented(
        graph, num_partitions, num_buckets, edges_simple
    )
    n_oriented = oriented.count()
    if n >= (1 << 31) or n_oriented > broadcast_max:  # pragma: no cover
        raise ValueError(
            "triangle_list: oriented edge set exceeds the broadcast "
            "guard; use the wedge-shuffle path (triangle_count fallback "
            "shape) for enumeration at this scale"
        )
    import ray as _ray

    nb = np.int64(n)
    key_parts = [
        (blk.column("u").to_numpy().astype(np.int64) * nb
         + blk.column("v").to_numpy().astype(np.int64))
        for blk in _ray.get(oriented.to_arrow_refs())
    ]
    edge_keys = (
        np.sort(np.concatenate(key_parts))
        if key_parts
        else np.array([], dtype=np.int64)
    )
    keys_ref = _ray.put(edge_keys)

    def closed_wedges(g: dict[str, np.ndarray]) -> dict[str, np.ndarray]:
        keys = _ray.get(keys_ref)
        order = np.lexsort((g["v"], g["deg_v"], g["u"]))
        u = g["u"][order]
        v = g["v"][order]
        a, b = _pairs_within_groups((u, np.arange(len(u))), v)
        empty = {
            "a": np.array([], dtype=np.int64),
            "b": np.array([], dtype=np.int64),
            "c": np.array([], dtype=np.int64),
        }
        if len(a) == 0 or len(keys) == 0:
            return empty
        # centers: _pairs_within_groups pairs rank indices within each
        # u-group; recover the center as the group key of each pair
        starts = np.flatnonzero(np.r_[True, u[1:] != u[:-1]])
        lens = np.diff(np.r_[starts, len(u)])
        centers = np.repeat(u[starts], (lens * (lens - 1)) // 2)
        wk = a * nb + b
        pos = np.searchsorted(keys, wk)
        valid = pos < len(keys)
        match = np.zeros(len(wk), dtype=bool)
        match[valid] = keys[pos[valid]] == wk[valid]
        if not match.any():
            return empty
        tri = np.stack([centers[match], a[match], b[match]], axis=1)
        tri.sort(axis=1)  # numeric (a < b < c) output order
        return {"a": tri[:, 0], "b": tri[:, 1], "c": tri[:, 2]}

    from parallel_pagerank_ray.util import drop_empty_blocks

    return drop_empty_blocks(
        oriented.groupby("bucket").map_groups(
            closed_wedges, batch_format="numpy"
        )
    )


def four_clique_count(
    graph: Graph,
    num_partitions: int | None = None,
    num_buckets: int | None = None,
    edges_simple: bool = False,
    broadcast_max: int = 50_000_000,
) -> int:
    """Exact 4-clique count — the next motif up from triangles.

    For every enumerated triangle (a < b < c) the candidates x are
    exactly c's canonical neighbors ABOVE c, which form a CONTIGUOUS
    slice of the sorted packed key array (key = src * n + dst,
    src < dst): two searchsorteds bound the slice, one ranges-gather
    expands it, and two more binary searches verify (a, x) and (b, x).
    Fully vectorized per batch; integer count, partition-invariant.

    Scale: rides triangle_list's broadcast guard (one plasma copy of
    the canonical key set, <= ``broadcast_max`` edges at 8 B/edge);
    work is sum over triangles of deg_above(c) — the compact-forward
    analog for cliques (kClist's ordering argument). Beyond the guard
    the wedge-shuffle closure path generalizes; this caller-facing
    exact variant deliberately raises instead of hiding that switch.
    """
    n = graph.n
    if n == 0:
        return 0
    if n >= (1 << 31):  # pragma: no cover - key packing bound
        raise ValueError("four_clique_count: n >= 2^31 overflows key packing")
    tris = triangle_list(
        graph,
        num_partitions=num_partitions,
        num_buckets=num_buckets,
        edges_simple=edges_simple,
        broadcast_max=broadcast_max,
    )
    simple = (
        graph.edges if edges_simple else _simple_undirected(graph.edges)
    )
    import ray as _ray

    nb = np.int64(n)
    key_parts = [
        (blk.column("src").to_numpy().astype(np.int64) * nb
         + blk.column("dst").to_numpy().astype(np.int64))
        for blk in _ray.get(simple.to_arrow_refs())
        if blk.num_rows
    ]
    keys = (
        np.sort(np.concatenate(key_parts))
        if key_parts
        else np.array([], dtype=np.int64)
    )
    keys_ref = _ray.put(keys)

    def partial(g: dict[str, np.ndarray]) -> dict[str, np.ndarray]:
        ks = _ray.get(keys_ref)
        a = g["a"].astype(np.int64)
        b = g["b"].astype(np.int64)
        c = g["c"].astype(np.int64)
        if len(c) == 0 or len(ks) == 0:
            return {"cnt": np.array([0], dtype=np.int64)}
        lo = np.searchsorted(ks, c * nb + c + 1)
        hi = np.searchsorted(ks, (c + 1) * nb)
        lens = hi - lo
        total = int(lens.sum())
        if total == 0:
            return {"cnt": np.array([0], dtype=np.int64)}
        rep = np.repeat(np.arange(len(c)), lens)
        offs = np.arange(total) - np.repeat(
            np.cumsum(lens) - lens, lens
        )
        pos = np.repeat(lo, lens) + offs
        x = ks[pos] - c[rep] * nb  # neighbors of c above c
        ka = a[rep] * nb + x
        kb = b[rep] * nb + x
        pa_ = np.searchsorted(ks, ka)
        pb_ = np.searchsorted(ks, kb)
        ok = (pa_ < len(ks)) & (pb_ < len(ks))
        ok[ok] &= (ks[pa_[ok]] == ka[ok]) & (ks[pb_[ok]] == kb[ok])
        return {"cnt": np.array([int(ok.sum())], dtype=np.int64)}

    parts = tris.map_batches(partial, batch_format="numpy").take_all()
    return int(sum(int(r["cnt"]) for r in parts))


import ray as _ray_tri


@_ray_tri.remote
def _c4_producer(csr, lo: int, hi: int, n: int, span: int,
                 max_center_degree: "int | None"):
    """Wedge-pair keys (a*n+b packed) for centers [lo, hi), partitioned
    by key range — one plasma put per reducer. ``csr`` = (indptr, dst)
    read zero-copy. Degree-class batching keeps generation fully
    vectorized (one 2-D gather per distinct degree)."""
    indptr, d2 = csr
    deg = np.diff(indptr[lo : hi + 1])
    keys = []
    dropped = 0
    for k in np.unique(deg):
        if k < 2:
            continue
        if max_center_degree is not None and k > max_center_degree:
            dropped += int((deg == k).sum())
            continue
        centers = np.nonzero(deg == k)[0] + lo
        iu, ju = np.triu_indices(int(k), 1)
        mat = d2[indptr[centers][:, None] + np.arange(int(k))[None, :]]
        keys.append(
            mat[:, iu].ravel() * np.int64(n) + mat[:, ju].ravel()
        )
    if not keys:
        return [], dropped
    key = np.concatenate(keys)
    del keys
    order = np.argsort(key // span, kind="stable")
    key = key[order]
    qb = key // span
    uniq, starts = np.unique(qb, return_index=True)
    bounds = starts.tolist() + [len(key)]
    return [
        (int(q), _ray_tri.put(key[bounds[i] : bounds[i + 1]]))
        for i, q in enumerate(uniq)
    ], dropped


@_ray_tri.remote
def _c4_reducer(refs: list, q: int, span: int) -> tuple[int, int]:
    """Sum C(multiplicity, 2) over the pair keys in range
    [q*span, (q+1)*span) via one dense int32 bincount — the global
    pair-count merge without a Dataset shuffle. Returns
    (cycle_pair_partial, wedge_count_partial)."""
    chunks = [c for c in _ray_tri.get(list(refs)) if len(c)]
    if not chunks:
        return 0, 0
    key = np.concatenate(chunks) - np.int64(q) * span
    del chunks
    total = len(key)
    cnt = np.bincount(key, minlength=span)
    sq = int(np.dot(cnt, cnt))
    return (sq - total) // 2, total


def _four_cycle_fast(
    und: rd.Dataset, n: int, max_center_degree: "int | None"
) -> "dict[str, int] | None":
    """Raw-task C4 kernel for mid-size graphs (n <= 40k, closure
    <= 30M rows): the pair-count merge runs as P producer tasks
    (degree-class-batched wedge generation, key-range partition) into
    Q reducer tasks (dense bincount per key range) — one routed plasma
    exchange instead of the 100M-row grouped_agg shuffle (measured
    9.7 s of the 13.9 s gate wall at sf0.1). Exact, identical to the
    Dataset path (parity-tested); returns None when out of bounds so
    the caller falls through."""
    from parallel_pagerank_ray.stages.csr_store import edge_count_hint

    if n == 0 or n > 40_000:
        return None
    ne = edge_count_hint(und)
    if ne is None or ne > 30_000_000:
        return None
    et = pa.concat_tables(
        _ray_tri.get(und.select_columns(["src", "dst"]).to_arrow_refs())
    )
    s2 = et.column("src").to_numpy(zero_copy_only=False)
    d2 = et.column("dst").to_numpy(zero_copy_only=False)
    order = np.lexsort((d2, s2))
    s2, d2 = s2[order], d2[order]
    indptr = np.searchsorted(s2, np.arange(n + 1, dtype=np.int64))
    deg = np.diff(indptr)
    wedges = (deg * (deg - 1) // 2)
    csr_ref = _ray_tri.put((indptr, np.ascontiguousarray(d2)))
    cpus = int(_ray_tri.cluster_resources().get("CPU", 8))
    P = Q = max(2, min(32, cpus))
    span = -(-(n * n) // Q)
    # center ranges balanced by wedge count, not vertex count (skew)
    cum = np.concatenate(([0], np.cumsum(wedges)))
    cuts = np.searchsorted(
        cum, np.linspace(0, cum[-1], P + 1), side="left"
    )
    cuts[0], cuts[-1] = 0, n
    produced = _ray_tri.get(
        [
            _c4_producer.remote(
                csr_ref, int(cuts[i]), int(cuts[i + 1]), n, span,
                max_center_degree,
            )
            for i in range(P)
            if cuts[i] < cuts[i + 1]
        ]
    )
    inbox: list[list] = [[] for _ in range(Q)]
    dropped = 0
    for routed, drop in produced:
        dropped += drop
        for q, ref in routed:
            inbox[q].append(ref)
    parts = _ray_tri.get(
        [
            _c4_reducer.remote(inbox[q], q, span)
            for q in range(Q)
            if inbox[q]
        ]
    )
    cycle_pairs = int(sum(p[0] for p in parts))
    return {
        "four_cycles": cycle_pairs // 2,
        "cycle_pairs": cycle_pairs,
        "dropped_centers": int(dropped),
    }


def four_cycle_count(
    graph: Graph,
    num_buckets: int | None = None,
    max_center_degree: int | None = None,
    edges_simple: bool = False,
    fast: bool = True,
) -> dict[str, int]:
    """Exact 4-cycle (quadrilateral, chords allowed) count over the
    simple undirected closure, via the opposite-pair identity

        2 * C4 = sum over vertex pairs a < c of C(cn(a, c), 2)

    — every 4-cycle a-v-c-x is counted once from each of its two
    opposite pairs ({a,c} and {v,x}), so the co-wedge pair total is
    exactly twice the cycle count. Returns {"four_cycles",
    "cycle_pairs", "dropped_centers"} (all int; four_cycles =
    cycle_pairs // 2).

    Scale shape: the wedge stage is the same co-citation kernel as
    link prediction — bucket the symmetric closure by CENTER, all
    pairs of each center's (distinct) neighbor list via the vectorized
    in-group kernel, group size = center degree, guarded by
    ``max_center_degree`` (centers above the cap emit no wedges and
    are COUNTED in dropped_centers; the drop is a pure function of
    degree, SQL-reproducible with one HAVING). With a cap in force the
    reported count is the deterministic capped variant (floor of the
    surviving pair total / 2) — exact when dropped_centers == 0.
    """
    from parallel_pagerank_ray.pipelines.graph_build import undirected_edges
    from parallel_pagerank_ray.stages.agg import resolve_num_buckets

    canon = graph.edges if edges_simple else _simple_undirected(graph.edges)
    und = undirected_edges(canon, dedup=False).materialize()
    if fast:
        got = _four_cycle_fast(und, graph.n, max_center_degree)
        if got is not None:
            return got
    if num_buckets is None:
        num_buckets = resolve_num_buckets(und)

    def bucketed(b: dict[str, np.ndarray]) -> dict[str, np.ndarray]:
        return {
            "src": b["src"],
            "dst": b["dst"],
            "__b": (b["src"] % num_buckets).astype(np.int64),
        }

    def wedge_pairs(g) -> dict[str, np.ndarray]:
        import pandas as pd

        ctr = g["src"].to_numpy()
        nbr = g["dst"].to_numpy()
        a, b = _pairs_within_groups(
            (ctr, nbr), nbr, max_group=max_center_degree
        )
        if not len(a):
            return pd.DataFrame(
                {
                    "a": np.array([], dtype=np.int64),
                    "b": np.array([], dtype=np.int64),
                    "cn": np.array([], dtype=np.int64),
                }
            )
        order = np.lexsort((b, a))
        a, b = a[order], b[order]
        new = np.ones(len(a), dtype=bool)
        new[1:] = (a[1:] != a[:-1]) | (b[1:] != b[:-1])
        idx = np.nonzero(new)[0]
        cnt = np.diff(np.append(idx, len(a)))
        return pd.DataFrame(
            {"a": a[idx], "b": b[idx], "cn": cnt.astype(np.int64)}
        )

    cn = grouped_agg(
        und.map_batches(bucketed, batch_format="numpy")
        .groupby("__b")
        .map_groups(wedge_pairs, batch_format="pandas"),
        ["a", "b"],
        {"cn": ("cn", "sum")},
        num_buckets=num_buckets,
    )

    def pair_partial(b: dict[str, np.ndarray]) -> dict[str, np.ndarray]:
        c = b["cn"]
        return {
            "pp": np.array([int((c * (c - 1) // 2).sum())], dtype=np.int64)
        }

    parts = cn.map_batches(pair_partial, batch_format="numpy").take_all()
    cycle_pairs = int(sum(r["pp"] for r in parts))

    dropped = 0
    if max_center_degree is not None:
        deg = grouped_agg(
            und, ["src"], {"deg": ("dst", "count")}, num_buckets=num_buckets
        )
        dparts = deg.map_batches(
            lambda b: {
                "d": np.array(
                    [int((b["deg"] > max_center_degree).sum())], np.int64
                )
            },
            batch_format="numpy",
        ).take_all()
        dropped = int(sum(r["d"] for r in dparts))
    return {
        "four_cycles": cycle_pairs // 2,
        "cycle_pairs": cycle_pairs,
        "dropped_centers": dropped,
    }


def directed_triangle_census(
    edges: rd.Dataset,
    n: int,
    num_buckets: int | None = None,
    broadcast_max_edges: int = 50_000_000,
) -> rd.Dataset:
    """Directed triangle census of a simple digraph: one row
    (n_cyclic, n_transitive) — cyclic = a->b->c->a (each counted once;
    the wedge pass sees it 3x, divided out), transitive = wedges
    a->b->c closed by the shortcut a->c (each such triangle has exactly
    one shortcut, so counted once). Self-loops are dropped; duplicate
    edges must already be deduplicated (link_edges contract).

    Scale shape: wedges are generated per MID vertex — one bucketed
    shuffle of (mid, neighbor, dir) rows, then an in-list x out-list
    cross product per mid inside the bucket kernel (cost = sum of
    in-deg x out-deg, the directed wedge count; split hub mids
    upstream if a vertex's product is pathological). Closure testing
    follows the triangle_count idiom: under ``broadcast_max_edges``
    the packed edge-key array ships once via ray.put and each kernel
    counts matches with a searchsorted (no wedge shuffle at all);
    above it, wedge and edge rows union into ONE bucketed combine
    keyed on the pair. Both paths are exact and force-tested equal.
    """
    from parallel_pagerank_ray.stages.agg import resolve_num_buckets

    if num_buckets is None:
        num_buckets = resolve_num_buckets(edges)
    nb = np.int64(n)

    def clean(t: pa.Table) -> pa.Table:
        s = t.column("src").to_numpy(zero_copy_only=False)
        d = t.column("dst").to_numpy(zero_copy_only=False)
        m = s != d
        return pa.table(
            {
                "src": pa.array(s[m], pa.int64()),
                "dst": pa.array(d[m], pa.int64()),
            }
        )

    e = edges.select_columns(["src", "dst"]).map_batches(
        clean, batch_format="pyarrow"
    ).materialize()
    one_row = lambda cyc, trans: rd.from_arrow(  # noqa: E731
        pa.table(
            {
                "n_cyclic": pa.array([int(cyc)], pa.int64()),
                "n_transitive": pa.array([int(trans)], pa.int64()),
            }
        )
    )
    n_edges = e.count()
    if n_edges == 0:
        return one_row(0, 0)

    def mid_rows(b: dict[str, np.ndarray]) -> dict[str, np.ndarray]:
        s, d = b["src"], b["dst"]
        return {
            "mid": np.concatenate([d, s]),
            "nbr": np.concatenate([s, d]),
            "dir": np.concatenate(
                [np.zeros(len(s), np.int64), np.ones(len(s), np.int64)]
            ),
            "bucket": np.concatenate([d, s]) % np.int64(num_buckets),
        }

    routed = e.map_batches(mid_rows, batch_format="numpy")

    if n < (1 << 31) and n_edges <= broadcast_max_edges:
        import ray as _ray

        key_parts = [
            (blk.column("src").to_numpy(zero_copy_only=False) * nb
             + blk.column("dst").to_numpy(zero_copy_only=False))
            for blk in _ray.get(e.to_arrow_refs())
        ]
        keys_ref = _ray.put(np.sort(np.concatenate(key_parts)))

        def census(g: dict[str, np.ndarray]) -> dict[str, np.ndarray]:
            keys = _ray.get(keys_ref)
            order = np.lexsort((g["nbr"], g["dir"], g["mid"]))
            mid = g["mid"][order]
            nbr = g["nbr"][order]
            dr = g["dir"][order]
            runs = np.concatenate(([True], mid[1:] != mid[:-1]))
            starts = np.flatnonzero(runs)
            ends = np.concatenate((starts[1:], [len(mid)]))
            cyc = trans = 0
            for lo, hi in zip(starts, ends):
                split = lo + int(np.searchsorted(dr[lo:hi], 1))
                ins = nbr[lo:split]
                outs = nbr[split:hi]
                if len(ins) == 0 or len(outs) == 0:
                    continue
                a = np.repeat(ins, len(outs))
                c = np.tile(outs, len(ins))
                keep = a != c
                a, c = a[keep], c[keep]
                for key, acc in ((a * nb + c, "t"), (c * nb + a, "y")):
                    pos = np.searchsorted(keys, key)
                    valid = pos < len(keys)
                    hits = np.zeros(len(key), dtype=bool)
                    hits[valid] = keys[pos[valid]] == key[valid]
                    if acc == "t":
                        trans += int(hits.sum())
                    else:
                        cyc += int(hits.sum())
            return {
                "cyc": np.array([cyc], np.int64),
                "trans": np.array([trans], np.int64),
            }

        parts = (
            routed.groupby("bucket")
            .map_groups(census, batch_format="numpy")
            .take_all()
        )
        cyc = sum(int(r["cyc"]) for r in parts)
        trans = sum(int(r["trans"]) for r in parts)
        return one_row(cyc // 3, trans)

    # shuffle fallback: wedge pairs + forward/reverse edge marks into
    # one bucketed combine keyed on the ordered pair
    def wedge_pairs(g: dict[str, np.ndarray]) -> dict[str, np.ndarray]:
        order = np.lexsort((g["nbr"], g["dir"], g["mid"]))
        mid = g["mid"][order]
        nbr = g["nbr"][order]
        dr = g["dir"][order]
        runs = np.concatenate(([True], mid[1:] != mid[:-1]))
        starts = np.flatnonzero(runs)
        ends = np.concatenate((starts[1:], [len(mid)]))
        aa, cc = [], []
        for lo, hi in zip(starts, ends):
            split = lo + int(np.searchsorted(dr[lo:hi], 1))
            ins = nbr[lo:split]
            outs = nbr[split:hi]
            if len(ins) == 0 or len(outs) == 0:
                continue
            a = np.repeat(ins, len(outs))
            c = np.tile(outs, len(ins))
            keep = a != c
            aa.append(a[keep])
            cc.append(c[keep])
        ea = np.array([], dtype=np.int64)
        a = np.concatenate(aa) if aa else ea
        c = np.concatenate(cc) if cc else ea
        z = np.zeros(len(a), dtype=np.int64)
        return {"x": a, "y": c, "w": z + 1, "fwd": z, "rev": z}

    wedge_ds = drop_empty_blocks(
        routed.groupby("bucket").map_groups(wedge_pairs, batch_format="numpy")
    )

    def edge_marks(b: dict[str, np.ndarray]) -> dict[str, np.ndarray]:
        s, d = b["src"], b["dst"]
        z = np.zeros(len(s), dtype=np.int64)
        return {
            "x": np.concatenate([s, d]),
            "y": np.concatenate([d, s]),
            "w": np.concatenate([z, z]),
            "fwd": np.concatenate([z + 1, z]),
            "rev": np.concatenate([z, z + 1]),
        }

    per_pair = grouped_agg(
        wedge_ds.union(e.map_batches(edge_marks, batch_format="numpy")),
        ["x", "y"],
        {"w": ("w", "sum"), "fwd": ("fwd", "sum"), "rev": ("rev", "sum")},
        num_buckets=num_buckets,
    )

    def fold(b: dict[str, np.ndarray]) -> dict[str, np.ndarray]:
        return {
            "cyc": np.array([int((b["w"] * (b["rev"] > 0)).sum())], np.int64),
            "trans": np.array([int((b["w"] * (b["fwd"] > 0)).sum())], np.int64),
        }

    parts = per_pair.map_batches(fold, batch_format="numpy").take_all()
    cyc = sum(int(r["cyc"]) for r in parts)
    trans = sum(int(r["trans"]) for r in parts)
    return one_row(cyc // 3, trans)
