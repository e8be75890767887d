"""1-WL color refinement (Weisfeiler-Leman) over the undirected graph.

Beyond-reference capability (the reference computes no structural
fingerprints; closest surface is PageRank's per-vertex iteration at
/root/reference/pagerank_mpi/pagerank_mpi.c:132-231). Iterated
neighborhood refinement is the standard structural-equivalence /
graph-fingerprinting primitive — on a webgraph it groups pages whose
local link structure is indistinguishable (template/boilerplate
detection at the graph level, the structural sibling of the text-side
winnowing fingerprints in pipelines/dedup.py).

    color_0(v)  = deg(v)
    color_t(v)  = ( h(color_{t-1}(v)) + sum_{u ~ v} g(color_{t-1}(u)) ) mod p

with p = 2^31-1 and h, g the SQL-safe affine/product hash chains of
functions/hashing.py policy (every intermediate product < 2^62 in both
numpy int64 and DuckDB BIGINT). Summing per-neighbor hashes mod p is
the ORDER-FREE multiset combiner (hash-sum WL): it avoids the sorted
Horner fold's per-vertex sequential pass, so the round is one bucketed
grouped_agg — the PageRank gather shape — instead of a ragged ordered
sweep. Two multisets collide only if their g-image sums collide mod p
(~2^-31 per pair per round); refinement still strictly partitions by
structure in the non-adversarial case, and the whole computation is
bit-reproducible at any parallelism and value-checkable against a
DuckDB recursive CTE.

Scale shape: per round one partitioned hash join (neighbor colors onto
the closure by dst) + one bucketed grouped_agg keyed on src — no dense
vector, no driver materialization; rounds are few and fixed (WL
stabilizes in O(diameter) rounds; 3 is the conventional fingerprint
depth). Per-vertex gather sums deg(v) terms < 2^31 each, so int64 is
safe to deg < 2^31 (beyond that, pre-mod the map-side partials).
"""

from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np
import ray.data as rd

from parallel_pagerank_ray.pipelines.graph_build import Graph, undirected_edges

P31 = (1 << 31) - 1
# g (neighbor hash): product of two independent affine chains mod p
WL_GA1, WL_GB1 = 1_000_003, 12_345
WL_GA2, WL_GB2 = 999_983, 54_321
# h (own-color chain)
WL_HA, WL_HB = 1_000_033, 271_828


def wl_g(c: np.ndarray) -> np.ndarray:
    """Neighbor multiset element hash, int64 in [0, p)."""
    c = np.asarray(c, dtype=np.int64)
    a = (c * WL_GA1 + WL_GB1) % P31
    b = (c * WL_GA2 + WL_GB2) % P31
    return (a * b) % P31


def wl_h(c: np.ndarray) -> np.ndarray:
    """Own-color chain hash, int64 in [0, p)."""
    c = np.asarray(c, dtype=np.int64)
    return (c * WL_HA + WL_HB) % P31


@dataclass
class WLRun:
    colors: rd.Dataset  # (vid, color) int64, every vertex 0..n-1
    rounds: int
    history: list[dict] = field(default_factory=list)


def wl_refine(
    graph: Graph,
    rounds: int = 3,
    num_partitions: int | None = None,
    broadcast_max: int = 50_000_000,
    local_max_edges: int = 2_000_000,
) -> WLRun:
    """1-WL refinement colors after ``rounds`` synchronous rounds over
    the deduplicated undirected simple closure of ``graph.edges``.

    Dedup closure is REQUIRED: the refinement hashes the neighbor
    MULTISET, so a duplicated closure row would double-count its
    neighbor. Isolated vertices (vid < graph.n with no closure edge)
    refine on their own-color chain alone and all share a color.

    Returns every vertex 0..n-1 with its final color. Deterministic,
    partitioning-invariant (mod-p sums are order-free), value-exact
    against the DuckDB recursive-CTE oracle in __ray_entry__.
    """
    import pyarrow as pa
    import pyarrow.compute as pc

    from parallel_pagerank_ray.pipelines.graph_build import (
        _default_join_partitions,
    )
    from parallel_pagerank_ray.stages.agg import grouped_agg
    from parallel_pagerank_ray.util import safe_join

    if rounds < 0:
        raise ValueError("wl_refine needs rounds >= 0")
    n = graph.n
    if n == 0:
        return WLRun(colors=rd.from_items([]), rounds=0)
    if num_partitions is None:
        num_partitions = _default_join_partitions()

    und = undirected_edges(graph.edges, dedup=True).materialize()
    if und.count() <= local_max_edges and n <= 20_000_000:
        # driver-local rounds (identical mod-p arithmetic, parity-forced
        # in tests): per-round Ray shuffles dominate on the small
        # backbone graphs this runs on
        from parallel_pagerank_ray.util import pull_table

        import pyarrow as pa

        et = pull_table(und, ["src", "dst"])
        s = et.column("src").to_numpy(zero_copy_only=False)
        d = et.column("dst").to_numpy(zero_copy_only=False)
        colors = np.zeros(n, dtype=np.int64)
        np.add.at(colors, s, 1)  # color_0 = closure degree
        history = []
        for r in range(1, rounds + 1):
            raw = np.zeros(n, dtype=np.int64)
            np.add.at(raw, s, wl_g(colors[d]))
            colors = (wl_h(colors) + (raw % P31)) % P31
            history.append({"round": r})
        return WLRun(
            colors=rd.from_arrow(
                pa.table(
                    {
                        "vid": pa.array(
                            np.arange(n, dtype=np.int64), pa.int64()
                        ),
                        "color": pa.array(colors, pa.int64()),
                    }
                )
            ),
            rounds=rounds,
            history=history,
        )
    if n <= broadcast_max:
        return _wl_refine_broadcast(und, n, rounds)

    # color_0 = degree over the simple closure (0 for isolated vids)
    deg = grouped_agg(
        und.map_batches(
            lambda t: pa.table(
                {
                    "vid": t.column("src"),
                    "one": pa.array(
                        np.ones(t.num_rows, dtype=np.int64), pa.int64()
                    ),
                }
            ),
            batch_format="pyarrow",
        ),
        ["vid"],
        {"color": ("one", "sum")},
    )
    base = rd.range(n).map_batches(
        lambda b: {"vid": b["id"].astype(np.int64)}, batch_format="numpy"
    )
    colors = safe_join(
        base,
        deg,
        join_type="left_outer",
        num_partitions=num_partitions,
        on=("vid",),
    ).map_batches(
        lambda t: pa.table(
            {
                "vid": t.column("vid"),
                "color": pc.coalesce(
                    t.column("color"), pa.scalar(0, pa.int64())
                ),
            }
        ),
        batch_format="pyarrow",
    )
    history: list[dict] = []
    for r in range(1, rounds + 1):
        colors = colors.materialize()

        # own-color chain term, one row per vertex
        def own(t: pa.Table) -> pa.Table:
            c = t.column("color").to_numpy(zero_copy_only=False)
            return pa.table({"vid": t.column("vid"), "term": wl_h(c)})

        self_terms = colors.map_batches(own, batch_format="pyarrow")

        # neighbor terms: color of dst hashed through g, keyed by src
        j = safe_join(
            und,
            colors,
            join_type="inner",
            num_partitions=num_partitions,
            on=("dst",),
            right_on=("vid",),
        )

        def nb(t: pa.Table) -> pa.Table:
            c = t.column("color").to_numpy(zero_copy_only=False)
            return pa.table({"vid": t.column("src"), "term": wl_g(c)})

        nb_terms = j.map_batches(nb, batch_format="pyarrow")

        summed = grouped_agg(
            self_terms.union(nb_terms), ["vid"], {"s": ("term", "sum")}
        )

        def fold(t: pa.Table) -> pa.Table:
            s = t.column("s").to_numpy(zero_copy_only=False)
            return pa.table(
                {"vid": t.column("vid"), "color": (s % P31).astype(np.int64)}
            )

        colors = summed.map_batches(fold, batch_format="pyarrow")
        history.append({"round": r})
    return WLRun(colors=colors.materialize(), rounds=rounds, history=history)


def _wl_refine_broadcast(und: rd.Dataset, n: int, rounds: int) -> WLRun:
    """Broadcast fast path: the color vector (n int64, one ``ray.put``
    per round, zero-copy read in every task) replaces the per-round
    hash join; the neighbor-sum shuffle stays ONE bucketed grouped_agg
    whose result (<= n rows) is the only driver pull — bounded by the
    caller's ``broadcast_max`` guard. Identical results to the join
    path (tested by shrinking the guard)."""
    import pyarrow as pa
    import ray

    from parallel_pagerank_ray.stages.agg import grouped_agg

    deg_tbl = grouped_agg(
        und.map_batches(
            lambda t: pa.table(
                {
                    "vid": t.column("src"),
                    "one": pa.array(
                        np.ones(t.num_rows, dtype=np.int64), pa.int64()
                    ),
                }
            ),
            batch_format="pyarrow",
        ),
        ["vid"],
        {"d": ("one", "sum")},
    ).to_pandas()
    colors = np.zeros(n, dtype=np.int64)
    colors[deg_tbl["vid"].to_numpy()] = deg_tbl["d"].to_numpy()
    history: list[dict] = []
    for r in range(1, rounds + 1):
        ref = ray.put(colors)

        def nb(t: pa.Table) -> pa.Table:
            c = ray.get(ref)
            return pa.table(
                {
                    "vid": t.column("src"),
                    "term": wl_g(
                        c[t.column("dst").to_numpy(zero_copy_only=False)]
                    ),
                }
            )

        s_tbl = grouped_agg(
            und.map_batches(nb, batch_format="pyarrow"),
            ["vid"],
            {"s": ("term", "sum")},
        ).to_pandas()
        S = np.zeros(n, dtype=np.int64)
        S[s_tbl["vid"].to_numpy()] = s_tbl["s"].to_numpy() % P31
        colors = (wl_h(colors) + S) % P31
        history.append({"round": r})
    out = rd.from_arrow(
        pa.table(
            {"vid": np.arange(n, dtype=np.int64), "color": colors}
        )
    )
    return WLRun(colors=out, rounds=rounds, history=history)


def wl_class_sizes(run: WLRun) -> rd.Dataset:
    """Color-class histogram (color, cnt) of a refinement — the graph's
    structural fingerprint summary (two graphs with different histograms
    are 1-WL-distinguishable)."""
    from parallel_pagerank_ray.stages.agg import grouped_agg

    import pyarrow as pa

    counted = run.colors.map_batches(
        lambda t: pa.table(
            {
                "color": t.column("color"),
                "one": pa.array(
                    np.ones(t.num_rows, dtype=np.int64), pa.int64()
                ),
            }
        ),
        batch_format="pyarrow",
    )
    return grouped_agg(counted, ["color"], {"cnt": ("one", "sum")})


def component_wl_classes(
    graph: Graph,
    rounds: int = 3,
    num_buckets: int | None = None,
) -> rd.Dataset:
    """Isomorphism-class fingerprints of the graph's connected
    components: (n_vertices, fp, n_components) — fp = the order-free
    mod-2^31-1 multiset hash (sum of ``wl_g`` over member colors) of
    the component's round-``rounds`` 1-WL colors. Components with the
    same (size, fp) are 1-WL-indistinguishable — the structure-dedup
    primitive for spotting repeated templated subgraphs (boilerplate
    nav cliques, mirrored site trees). 1-WL is the standard sound
    filter: different fingerprints PROVE non-isomorphism; equal
    fingerprints are a candidate class (exact for trees and almost all
    graphs).

    Scale shape: one BSP connected-components run + one WL refinement
    (both existing primitives), one vid-keyed join, one bucketed
    per-component combine, one tiny class count. Deterministic and
    SQL-replayable end to end.
    """
    import pyarrow as pa

    from parallel_pagerank_ray.pipelines.components_actors import (
        connected_components_bsp,
    )
    from parallel_pagerank_ray.stages.agg import grouped_agg, resolve_num_buckets
    from parallel_pagerank_ray.util import drop_empty_blocks, safe_join

    if num_buckets is None:
        num_buckets = resolve_num_buckets(graph.edges)
    empty = rd.from_arrow(
        pa.table(
            {
                "n_vertices": pa.array([], pa.int64()),
                "fp": pa.array([], pa.int64()),
                "n_components": pa.array([], pa.int64()),
            }
        )
    )
    if graph.n == 0 or graph.edges.count() == 0:
        return empty
    if graph.edges.count() <= 500_000 and graph.n <= 2_000_000:
        # driver-local fold: CC labels + WL colors + per-component
        # (size, fp) in dense numpy — identical arithmetic to the
        # join/combine path below (parity-forced in tests)
        from parallel_pagerank_ray.pipelines.biconnectivity import (
            _cc_min_label,
        )
        from parallel_pagerank_ray.util import pull_table

        n = graph.n
        et = pull_table(
            graph.edges.select_columns(["src", "dst"]).materialize(),
            ["src", "dst"],
        )
        s = et.column("src").to_numpy(zero_copy_only=False)
        d = et.column("dst").to_numpy(zero_copy_only=False)
        comp_arr = _cc_min_label(s, d, n)
        ct = pull_table(
            wl_refine(graph, rounds=rounds).colors.materialize(),
            ["vid", "color"],
        )
        colors_arr = np.zeros(n, dtype=np.int64)
        colors_arr[ct.column("vid").to_numpy(zero_copy_only=False)] = (
            ct.column("color").to_numpy(zero_copy_only=False)
        )
        verts = np.unique(np.concatenate([s, d]))
        cv = comp_arr[verts]
        gvals = wl_g(colors_arr[verts])
        raw = np.zeros(n, dtype=np.int64)
        np.add.at(raw, cv, gvals)
        cnt = np.bincount(cv, minlength=n)
        mask = cnt > 0
        fp = raw[mask] % np.int64(P31)
        nv = cnt[mask].astype(np.int64)
        pairs = np.stack([nv, fp], axis=1)
        uniq, counts = np.unique(pairs, axis=0, return_counts=True)
        return rd.from_arrow(
            pa.table(
                {
                    "n_vertices": pa.array(uniq[:, 0], pa.int64()),
                    "fp": pa.array(uniq[:, 1], pa.int64()),
                    "n_components": pa.array(
                        counts.astype(np.int64), pa.int64()
                    ),
                }
            )
        )
    comp = connected_components_bsp(graph).components
    # restrict to edge-bearing vertices: the BSP components table (and
    # the WL color table) cover every vid 0..n-1, but an isolated
    # vertex is not a component of the EDGE graph this fingerprints
    verts = grouped_agg(
        undirected_edges(graph.edges, dedup=False).select_columns(["src"]),
        ["src"],
        {"c": ("src", "count")},
        num_buckets=num_buckets,
    ).select_columns(["src"]).rename_columns({"src": "__e"})
    comp = safe_join(
        comp,
        verts,
        join_type="inner",
        num_partitions=8,
        on=("vid",),
        right_on=("__e",),
    ).select_columns(["vid", "comp"])
    colors = wl_refine(graph, rounds=rounds).colors
    j = safe_join(
        comp,
        colors.rename_columns({"vid": "__v"}),
        join_type="inner",
        num_partitions=8,
        on=("vid",),
        right_on=("__v",),
    )

    def hashed(t: pa.Table) -> pa.Table:
        c = t.column("color").to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "comp": t.column("comp"),
                "g": pa.array(wl_g(c), pa.int64()),
                "one": pa.array(np.ones(len(c), np.int64), pa.int64()),
            }
        )

    per_comp = grouped_agg(
        j.map_batches(hashed, batch_format="pyarrow"),
        ["comp"],
        {"fp": ("g", "sum"), "n_vertices": ("one", "sum")},
        num_buckets=num_buckets,
    )

    def finish(t: pa.Table) -> pa.Table:
        fp = t.column("fp").to_numpy(zero_copy_only=False) % np.int64(P31)
        return pa.table(
            {
                "n_vertices": t.column("n_vertices"),
                "fp": pa.array(fp, pa.int64()),
                "one": pa.array(np.ones(len(fp), np.int64), pa.int64()),
            }
        )

    return drop_empty_blocks(
        grouped_agg(
            per_comp.map_batches(finish, batch_format="pyarrow"),
            ["n_vertices", "fp"],
            {"n_components": ("one", "sum")},
            num_buckets=num_buckets,
        )
    )
