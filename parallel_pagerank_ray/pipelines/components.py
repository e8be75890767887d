"""Weakly connected components via distributed min-label propagation.

Semantics = union-find over the undirected closure (component id = the
minimum vid in the component) — the exact-match oracle in
``parallel_pagerank_ray.oracle.connected_components``. The reference has
no CC implementation; this reuses the PageRank superstep shape
(scatter over CSR shards -> groupby-min gather) on the same harness
(SURVEY.md §7.6):

    scatter  comps.map_batches(MinLabelScatter)   # candidates = comp[src]
    gather   .groupby("dst").aggregate(Min comp, Min old)
    update   changed = comp != old; loop until Σ changed == 0

Integer min-propagation is order-independent, so results are exact at
any parallelism / partition count.
"""

from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np
import ray.data as rd

from parallel_pagerank_ray.pipelines.graph_build import Graph, undirected_edges
from parallel_pagerank_ray.stages.csr_store import (
    EdgeShardStore,
    MinLabelDenseScatter,
    MinLabelScatter,
)
from parallel_pagerank_ray.state.checkpoint import CheckpointManager

DENSE_SEGMENT_MAX_BYTES = 32 << 20  # same bound as pipelines/pagerank.py


def _dense_gather_min(ps: int):
    """Fused per-bucket min-combine + changed count for the dense path."""

    def gather(g: dict[str, np.ndarray]) -> dict[str, np.ndarray]:
        kinds = g["kind"]
        a, b = g["a"], g["b"]
        base = int(g["bucket"][0]) * ps
        cand: np.ndarray | None = None
        vid_parts: list[np.ndarray] = []
        comp_parts: list[np.ndarray] = []
        for i in range(len(kinds)):
            if kinds[i] == 0:
                seg = np.frombuffer(a[i], dtype=np.int64)
                if cand is None:
                    cand = seg.copy()
                else:
                    np.minimum(cand, seg, out=cand)
            else:
                vid_parts.append(np.frombuffer(a[i], dtype=np.int64))
                comp_parts.append(np.frombuffer(b[i], dtype=np.int64))
        vids = np.concatenate(vid_parts)
        old = np.concatenate(comp_parts)
        if cand is None:
            new = old
        else:
            new = np.minimum(old, cand[vids - base])
        return {
            "vid": vids,
            "comp": new,
            "changed": (new != old).astype(np.int64),
        }

    return gather


@dataclass
class ComponentsRun:
    components: rd.Dataset  # (vid, comp)
    iterations: int
    history: list[dict] = field(default_factory=list)


def _shortcut_transforms(props: rd.Dataset, ps: int) -> rd.Dataset:
    """Append one distributed pointer-jump (comp[v] <- comp[comp[v]])
    to an UNMATERIALIZED propagation output — both shuffles run in one
    streaming execution.

    Labels always name a member of the vertex's own component with
    comp[u] <= u, so jumping preserves exact min-label semantics while
    compounding propagation reach — alternated with the neighbor-min
    round it drops total rounds from O(diameter) to O(log n).

    Shape: every vertex sends one request row to the bucket owning its
    label, ownership rows carry the bucket's label slice; one bucketed
    shuffle resolves all lookups vectorized. Traffic O(n) rows. The
    propagation round's per-vertex ``changed`` flag rides along as
    ``pch`` so one count pass covers both phases.
    """

    def msgs(b: dict[str, np.ndarray]) -> dict[str, np.ndarray]:
        n = len(b["vid"])
        return {
            "bucket": np.concatenate([b["comp"] // ps, b["vid"] // ps]),
            "kind": np.concatenate(
                [np.ones(n, dtype=np.int64), np.zeros(n, dtype=np.int64)]
            ),
            "vid": np.concatenate([b["vid"], b["vid"]]),
            "val": np.concatenate([b["comp"], b["comp"]]),
            "pch": np.concatenate([b["changed"], np.zeros(n, dtype=np.int64)]),
        }

    def resolve(g: dict[str, np.ndarray]) -> dict[str, np.ndarray]:
        base = np.int64(g["bucket"][0]) * ps
        om = g["kind"] == 0
        slice_ = np.full(ps, -1, dtype=np.int64)
        slice_[g["vid"][om] - base] = g["val"][om]
        rm = ~om
        rvid = g["vid"][rm]
        tgt = g["val"][rm]
        new = slice_[tgt - base]
        return {
            "vid": rvid,
            "comp": new,
            "changed": (new != tgt).astype(np.int64),
            "pch": g["pch"][rm],
        }

    return (
        props.map_batches(msgs, batch_format="numpy")
        .groupby("bucket")
        .map_groups(resolve, batch_format="numpy")
    )


def connected_components(
    graph: Graph,
    num_parts: int | None = None,
    max_iters: int = 10_000,
    workdir: str | None = None,
    checkpoint_every: int = 5,
) -> ComponentsRun:
    n = graph.n
    if n == 0:
        return ComponentsRun(components=rd.from_items([]), iterations=0)
    if num_parts is None:
        num_parts = max(4, min(256, n // 100_000 + 4))
    # min-propagation is duplicate-invariant: skip the closure dedup shuffle
    und = undirected_edges(graph.edges, dedup=False)
    store = EdgeShardStore.build(und, n=n, num_parts=num_parts)
    use_dense = store.part_size * 8 <= DENSE_SEGMENT_MAX_BYTES
    scatter_fn = (
        MinLabelDenseScatter(store) if use_dense else MinLabelScatter(store)
    )
    dense_gather = _dense_gather_min(store.part_size)

    ckpt: CheckpointManager | None = None
    it = 0
    history: list[dict] = []
    comps: rd.Dataset | None = None
    if workdir is not None:
        ckpt = CheckpointManager(
            workdir=workdir,
            algo="components",
            fingerprint={"n": n, "num_edges": store.num_edges},
        )
        got = ckpt.latest()
        if got is not None:
            it, comps, meta = got
            comps = comps.materialize()
            history = [dict(meta, iter=it)]
            if meta.get("converged"):
                return ComponentsRun(components=comps, iterations=it, history=history)

    if comps is None:
        comps = (
            rd.range(n)
            .map_batches(
                lambda b: {"vid": b["id"], "comp": b["id"].astype(np.int64)},
                batch_format="numpy",
            )
            .materialize()
        )

    def gather_min(g: dict[str, np.ndarray]) -> dict[str, np.ndarray]:
        # integer min is order-independent — no pre-sort needed
        u, inv = np.unique(g["dst"], return_inverse=True)
        comp = np.full(len(u), np.iinfo(np.int64).max, dtype=np.int64)
        old = comp.copy()
        np.minimum.at(comp, inv, g["comp"])
        np.minimum.at(old, inv, g["old"])
        return {"vid": u, "comp": comp, "changed": (comp != old).astype(np.int64)}

    while it < max_iters:
        # neighbor-min propagation + pointer-jump fused into ONE
        # streaming execution (two bucketed shuffles, no intermediate
        # materialization)
        prop = (
            comps.map_batches(scatter_fn, batch_format="numpy", batch_size=None)
            .groupby("bucket")
            .map_groups(
                dense_gather if use_dense else gather_min, batch_format="numpy"
            )
        )
        new = _shortcut_transforms(prop, store.part_size).materialize()

        def counts_partial(b: dict[str, np.ndarray]) -> dict[str, np.ndarray]:
            return {
                "p": np.array([b["pch"].sum()], dtype=np.int64),
                "j": np.array([b["changed"].sum()], dtype=np.int64),
            }

        rows = new.map_batches(counts_partial, batch_format="numpy").take_all()
        changed = int(sum(r["p"] for r in rows))
        jumped = int(sum(r["j"] for r in rows))
        it += 1
        comps = new  # scatter reads vid/comp; extra columns are harmless
        metrics = {
            "iter": it,
            "changed": changed,
            "jumped": jumped,
            "converged": changed == 0,
        }
        history.append(metrics)
        if ckpt is not None and (changed == 0 or it % checkpoint_every == 0):
            ckpt.save_iter(it, comps, metrics)
        if changed == 0:
            break
    return ComponentsRun(components=comps, iterations=it, history=history)


def bipartite_components(
    graph: Graph,
    num_parts: int | None = None,
    broadcast_max_bytes: int = 256 << 20,
) -> rd.Dataset:
    """Per-component bipartiteness via the DOUBLE COVER: a component C
    is bipartite iff its bipartite double cover (vertex (v, side),
    edges (u,0)-(v,1) and (u,1)-(v,0)) splits into exactly TWO
    components over C — an odd cycle connects the two sides.
    Output: (comp, n_vertices, n_cover_comps, bipartite).

    Scale shape: ONE run of the BSP connected-components engine on the
    2x cover (the cover is a stateless map over the edges) — the base
    labeling is recoverable from the cover labels with no second CC
    run: with min-vid labels and the (v, side) -> 2v + side numbering,
    every v in base component C (min vid m) has
    min(label(v,0), label(v,1)) = 2m, so base_comp(v) =
    min(cover pair) // 2 exactly reproduces the base min-vid CC.
    Under the n*8 B broadcast guard the fold + per-component distinct
    count run on one driver pass over the O(n) label table (the
    community_stats vector idiom); beyond it, the second CC run + join
    fallback keeps memory bounded at any n. Isolated vertices are
    bipartite by convention (their cover is two singletons)."""
    import pyarrow as pa

    from parallel_pagerank_ray.pipelines.components_actors import (
        connected_components_bsp,
    )
    from parallel_pagerank_ray.pipelines.graph_build import (
        _default_join_partitions,
    )
    from parallel_pagerank_ray.stages.agg import distinct, grouped_agg
    from parallel_pagerank_ray.util import safe_join

    join_parts = _default_join_partitions()

    def cover(t: pa.Table) -> pa.Table:
        src = t.column("src").to_numpy(zero_copy_only=False).astype(np.int64)
        dst = t.column("dst").to_numpy(zero_copy_only=False).astype(np.int64)
        keep = src != dst
        src, dst = src[keep], dst[keep]
        return pa.table(
            {
                "src": pa.array(
                    np.concatenate([2 * src, 2 * src + 1]), pa.int64()
                ),
                "dst": pa.array(
                    np.concatenate([2 * dst + 1, 2 * dst]), pa.int64()
                ),
            }
        )

    cover_g = Graph(
        n=2 * graph.n,
        edges=graph.edges.select_columns(["src", "dst"]).map_batches(
            cover, batch_format="pyarrow"
        ),
    )
    cov = connected_components_bsp(cover_g, num_parts=num_parts).components

    if graph.n * 8 <= broadcast_max_bytes:
        # one driver pass over the O(n) cover-label table: recover the
        # base labeling (min of the pair // 2), then the per-component
        # distinct cover-comp count — no second CC run, no joins
        import ray as _ray

        lab2 = np.full(2 * graph.n, np.iinfo(np.int64).max, dtype=np.int64)
        for blk in _ray.get(cov.to_arrow_refs()):
            if blk.num_rows:
                lab2[blk.column("vid").to_numpy()] = blk.column(
                    "comp"
                ).to_numpy()
        c0 = lab2[0::2]
        c1 = lab2[1::2]
        base_lab = np.minimum(c0, c1) // 2
        comps, sizes_arr = np.unique(base_lab, return_counts=True)
        # distinct (base comp, cover comp) pairs over both sides
        pair_keys = np.unique(
            np.stack(
                [np.concatenate([base_lab, base_lab]),
                 np.concatenate([c0, c1])],
                axis=1,
            ),
            axis=0,
        )
        ncov = np.bincount(
            np.searchsorted(comps, pair_keys[:, 0]), minlength=len(comps)
        ).astype(np.int64)
        return rd.from_arrow(
            pa.table(
                {
                    "comp": pa.array(comps, pa.int64()),
                    "n_vertices": pa.array(
                        sizes_arr.astype(np.int64), pa.int64()
                    ),
                    "n_cover_comps": pa.array(ncov, pa.int64()),
                    "bipartite": pa.array(ncov == 2, pa.bool_()),
                }
            )
        )

    base = connected_components_bsp(graph, num_parts=num_parts).components

    def fold_side(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        vid2 = t.column("vid").to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "vid": pa.array(vid2 // 2, pa.int64()),
                "ccomp": pc.cast(t.column("comp"), pa.int64()),
            }
        )

    folded = cov.map_batches(fold_side, batch_format="pyarrow")
    pairs = safe_join(
        base,
        folded.rename_columns({"vid": "__cv"}),
        join_type="inner",
        num_partitions=join_parts,
        on=("vid",),
        right_on=("__cv",),
    ).select_columns(["comp", "ccomp"])
    dpairs = distinct(pairs, ["comp", "ccomp"])
    counts = grouped_agg(
        dpairs, ["comp"], {"n_cover_comps": ("ccomp", "count")}
    )
    sizes = grouped_agg(base, ["comp"], {"n_vertices": ("vid", "count")})
    out = safe_join(
        sizes,
        counts.rename_columns({"comp": "__c"}),
        join_type="inner",
        num_partitions=join_parts,
        on=("comp",),
        right_on=("__c",),
    ).select_columns(["comp", "n_vertices", "n_cover_comps"])

    def flag(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        return t.append_column(
            "bipartite", pc.equal(t.column("n_cover_comps"), pa.scalar(2))
        )

    return out.map_batches(flag, batch_format="pyarrow")


def _curve_legs_local(
    s: np.ndarray, d: np.ndarray, n: int, legs: list
) -> list:
    """Driver-local curve evaluation shared by robustness_curve and
    percolation_curve under their local_max_edges bound: each leg is a
    numpy edge mask + min-label CC + endpoint/component fold — the
    per-leg BSP actor pools cost more than the whole computation on the
    thinned backbone graphs these gates run on. ``legs`` is a list of
    (label, keep_mask); returns the (label, n_vertices, n_edges,
    giant, n_comp) rows, identical to the distributed path
    (parity-tested)."""
    from parallel_pagerank_ray.pipelines.biconnectivity import (
        _cc_min_label,
    )

    rows = []
    for label, keep in legs:
        fs, fd = s[keep], d[keep]
        ne = len(fs)
        if ne == 0:
            rows.append((label, 0, 0, 0, 0))
            continue
        comp = _cc_min_label(fs, fd, n)
        verts = np.unique(np.concatenate([fs, fd]))
        cv = comp[verts]
        _, sizes = np.unique(cv, return_counts=True)
        rows.append(
            (label, len(verts), ne, int(sizes.max()), len(sizes))
        )
    return rows


def robustness_curve(
    graph: Graph,
    ks: tuple[int, ...] = (0, 10, 100),
    num_buckets: int | None = None,
    local_max_edges: int = 2_000_000,
) -> rd.Dataset:
    """Targeted-attack robustness: remove the top-k highest-degree
    vertices (total order: degree DESC, vid ASC over the undirected
    simple degree) and re-measure the surviving structure. One row per
    k: (k_removed, n_vertices, n_edges, giant_size, n_components) —
    vertices/components are over the ENDPOINTS of surviving edges
    (a vertex that loses every edge leaves the measured graph), the
    classic Albert-Jeong-Barabasi hub-ablation curve.

    Requires ``graph.edges`` canonical simple (src < dst, distinct) —
    the triangle-family certificate.

    Scale shape: one degree aggregation; the hub set is a driver pull
    BOUNDED by max(ks) rows (the caller's contract — ks are curve
    sample points, not data-sized), broadcast once per leg; each leg
    is one stateless edge filter + one BSP connected-components run,
    so the whole curve costs |ks| CC runs and never materializes more
    than the comp-size table.
    """
    import pyarrow as pa
    import ray

    from parallel_pagerank_ray.pipelines.components_actors import (
        connected_components_bsp,
    )
    from parallel_pagerank_ray.stages.agg import global_agg, grouped_agg
    from parallel_pagerank_ray.util import safe_join

    if num_buckets is None:
        from parallel_pagerank_ray.stages.agg import resolve_num_buckets

        num_buckets = resolve_num_buckets(graph.edges)
    edges = graph.edges.select_columns(["src", "dst"]).materialize()
    if edges.count() <= local_max_edges and graph.n <= 20_000_000:
        from parallel_pagerank_ray.util import pull_table

        et = pull_table(edges, ["src", "dst"])
        s = et.column("src").to_numpy(zero_copy_only=False)
        d = et.column("dst").to_numpy(zero_copy_only=False)
        degv = np.bincount(
            np.concatenate([s, d]), minlength=graph.n
        ).astype(np.int64)
        # total order: degree DESC, vid ASC
        order = np.lexsort((np.arange(graph.n), -degv))
        kmax_l = max(ks) if ks else 0
        hubs_l = order[:kmax_l]
        legs = []
        for k in ks:
            hm = np.zeros(graph.n, dtype=bool)
            hm[hubs_l[:k]] = True
            legs.append((int(k), ~(hm[s] | hm[d])))
        rows = _curve_legs_local(s, d, graph.n, legs)
        cols = list(zip(*rows)) if rows else [[], [], [], [], []]
        return rd.from_arrow(
            pa.table(
                {
                    "k_removed": pa.array(list(cols[0]), pa.int64()),
                    "n_vertices": pa.array(list(cols[1]), pa.int64()),
                    "n_edges": pa.array(list(cols[2]), pa.int64()),
                    "giant_size": pa.array(list(cols[3]), pa.int64()),
                    "n_components": pa.array(list(cols[4]), pa.int64()),
                }
            )
        )
    deg = grouped_agg(
        undirected_edges(edges, dedup=False),
        ["src"],
        {"deg": ("dst", "count")},
        num_buckets=num_buckets,
    )
    kmax = max(ks) if ks else 0
    hubs = (
        deg.sort(["deg", "src"], descending=[True, False])
        .limit(kmax)
        .to_pandas()["src"]
        .to_numpy()
        .astype(np.int64)
        if kmax
        else np.array([], dtype=np.int64)
    )
    rows = []
    for k in ks:
        hubset = np.sort(hubs[:k])
        ref = ray.put(hubset)

        def drop_hubs(t: pa.Table) -> pa.Table:
            hs = ray.get(ref)
            if not len(hs):
                return t
            s = t.column("src").to_numpy(zero_copy_only=False)
            d = t.column("dst").to_numpy(zero_copy_only=False)
            keep = ~(np.isin(s, hs) | np.isin(d, hs))
            return t.filter(pa.array(keep))

        fe = edges.map_batches(drop_hubs, batch_format="pyarrow").materialize()
        n_edges = fe.count()
        if n_edges == 0:
            rows.append((k, 0, 0, 0, 0))
            continue
        verts = grouped_agg(
            undirected_edges(fe, dedup=False),
            ["src"],
            {"one": ("dst", "count")},
            num_buckets=num_buckets,
        ).select_columns(["src"]).rename_columns({"src": "vid"})
        run = connected_components_bsp(Graph(n=graph.n, edges=fe))
        sizes = grouped_agg(
            safe_join(
                verts,
                run.components,
                join_type="inner",
                num_partitions=8,
                on=("vid",),
            ),
            ["comp"],
            {"size": ("vid", "count")},
            num_buckets=num_buckets,
        )
        g = global_agg(
            sizes,
            {
                "n_vertices": ("size", "sum"),
                "giant": ("size", "max"),
                "n_comp": ("size", "count"),
            },
        )
        rows.append(
            (k, int(g["n_vertices"]), n_edges, int(g["giant"]), int(g["n_comp"]))
        )
    cols = list(zip(*rows)) if rows else [[], [], [], [], []]
    return rd.from_arrow(
        pa.table(
            {
                "k_removed": pa.array(list(cols[0]), pa.int64()),
                "n_vertices": pa.array(list(cols[1]), pa.int64()),
                "n_edges": pa.array(list(cols[2]), pa.int64()),
                "giant_size": pa.array(list(cols[3]), pa.int64()),
                "n_components": pa.array(list(cols[4]), pa.int64()),
            }
        )
    )


def percolation_curve(
    graph: Graph,
    pcts: tuple[int, ...] = (0, 30, 60),
    num_buckets: int | None = None,
    local_max_edges: int = 2_000_000,
) -> rd.Dataset:
    """Random-failure percolation: delete each edge independently with
    probability pct/100 (md5-keyed on the canonical pair, so the
    "random" subset is deterministic and SQL-replayable) and re-measure
    the surviving structure — the bond-percolation complement of the
    targeted-attack ``robustness_curve``. One row per pct:
    (pct_removed, n_vertices, n_edges, giant_size, n_components), with
    vertices/components over surviving-edge endpoints.

    Edge e = (src, dst) survives leg pct iff
    md5_u64("pc|src|dst") % 100 >= pct.

    Requires canonical simple edges. Scale shape: each leg is one
    stateless edge filter + one BSP connected-components run — no
    driver pull beyond the comp-size scalars.
    """
    import pyarrow as pa

    from parallel_pagerank_ray.functions.hashing import md5_u64
    from parallel_pagerank_ray.pipelines.components_actors import (
        connected_components_bsp,
    )
    from parallel_pagerank_ray.stages.agg import global_agg, grouped_agg
    from parallel_pagerank_ray.util import safe_join

    if num_buckets is None:
        from parallel_pagerank_ray.stages.agg import resolve_num_buckets

        num_buckets = resolve_num_buckets(graph.edges)
    edges = graph.edges.select_columns(["src", "dst"]).materialize()
    if edges.count() <= local_max_edges and graph.n <= 20_000_000:
        import ray as _ray

        # the md5 leg key is computed ONCE, distributed (it is the
        # only per-row Python cost); the legs themselves are numpy
        def add_key(t: pa.Table) -> pa.Table:
            s = t.column("src").to_numpy(zero_copy_only=False)
            d = t.column("dst").to_numpy(zero_copy_only=False)
            key = np.fromiter(
                (md5_u64(f"pc|{a}|{b}") % 100 for a, b in zip(s, d)),
                np.int64,
                len(s),
            )
            return t.append_column("__k", pa.array(key, pa.int64()))

        from parallel_pagerank_ray.util import pull_table

        et = pull_table(
            edges.map_batches(add_key, batch_format="pyarrow"),
            ["src", "dst", "__k"],
        )
        s = et.column("src").to_numpy(zero_copy_only=False)
        d = et.column("dst").to_numpy(zero_copy_only=False)
        key = et.column("__k").to_numpy(zero_copy_only=False)
        legs = [(int(p), key >= int(p)) for p in pcts]
        rows = _curve_legs_local(s, d, graph.n, legs)
        cols = list(zip(*rows)) if rows else [[], [], [], [], []]
        return rd.from_arrow(
            pa.table(
                {
                    "pct_removed": pa.array(list(cols[0]), pa.int64()),
                    "n_vertices": pa.array(list(cols[1]), pa.int64()),
                    "n_edges": pa.array(list(cols[2]), pa.int64()),
                    "giant_size": pa.array(list(cols[3]), pa.int64()),
                    "n_components": pa.array(list(cols[4]), pa.int64()),
                }
            )
        )
    rows = []
    for pct in pcts:
        def drop_edges(t: pa.Table, _p=int(pct)) -> pa.Table:
            if _p <= 0:
                return t
            s = t.column("src").to_numpy(zero_copy_only=False)
            d = t.column("dst").to_numpy(zero_copy_only=False)
            keep = np.fromiter(
                (
                    md5_u64(f"pc|{a}|{b}") % 100 >= _p
                    for a, b in zip(s, d)
                ),
                bool,
                len(s),
            )
            return t.filter(pa.array(keep))

        fe = edges.map_batches(drop_edges, batch_format="pyarrow").materialize()
        n_edges = fe.count()
        if n_edges == 0:
            rows.append((int(pct), 0, 0, 0, 0))
            continue
        verts = grouped_agg(
            undirected_edges(fe, dedup=False),
            ["src"],
            {"one": ("dst", "count")},
            num_buckets=num_buckets,
        ).select_columns(["src"]).rename_columns({"src": "vid"})
        run = connected_components_bsp(Graph(n=graph.n, edges=fe))
        sizes = grouped_agg(
            safe_join(
                verts,
                run.components,
                join_type="inner",
                num_partitions=8,
                on=("vid",),
            ),
            ["comp"],
            {"size": ("vid", "count")},
            num_buckets=num_buckets,
        )
        g = global_agg(
            sizes,
            {
                "n_vertices": ("size", "sum"),
                "giant": ("size", "max"),
                "n_comp": ("size", "count"),
            },
        )
        rows.append(
            (int(pct), int(g["n_vertices"]), n_edges, int(g["giant"]), int(g["n_comp"]))
        )
    cols = list(zip(*rows)) if rows else [[], [], [], [], []]
    return rd.from_arrow(
        pa.table(
            {
                "pct_removed": pa.array(list(cols[0]), pa.int64()),
                "n_vertices": pa.array(list(cols[1]), pa.int64()),
                "n_edges": pa.array(list(cols[2]), pa.int64()),
                "giant_size": pa.array(list(cols[3]), pa.int64()),
                "n_components": pa.array(list(cols[4]), pa.int64()),
            }
        )
    )
