"""Minimum spanning forest — deterministic distributed Boruvka.

Beyond-reference capability (the reference has no weighted-graph
algorithms at all). Classic Boruvka over the canonical weighted
undirected edge set, derandomized by the total edge order

    key(e) = (w, lo, hi)   lexicographic, lo < hi canonical pair

which makes the MSF UNIQUE: every round each alive component picks its
minimum-key crossing edge (cut property -> the edge is in the MSF),
components hook along the picked edges, and the pointer forest is
contracted by doubling. Hook cycles are always 2-cycles sharing one
edge (keys strictly decrease around any longer cycle), resolved by
making the smaller component id the root — the same rule the DuckDB
oracle replays, so the final edge set is value-exact on both sides.

Scale shape (everything is Datasets; no driver materialization):
  - per round, TWO hash joins attach current component labels to the
    surviving crossing-edge set (which shrinks every round), then ONE
    component-keyed bucket shuffle finds each component's min edge
    vectorized in-bucket;
  - hook tables hold ONE ROW PER ALIVE COMPONENT (halves every round);
    the 2-cycle fix is one self-join and pointer doubling is
    O(log depth) self-joins of that small table;
  - rounds are <= log2(n) because every alive component merges.
At 100 TB the dominant cost is the label-attach joins over the edge
set; picked/contracted edges drop out of the working set after each
round, so total traffic is a geometric series over the input.
"""

from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray.data as rd

from parallel_pagerank_ray.pipelines.graph_build import (
    Graph,
    _default_join_partitions,
)
from parallel_pagerank_ray.stages.agg import distinct, resolve_num_buckets
from parallel_pagerank_ray.util import drop_empty_blocks, safe_join


@dataclass
class MSFRun:
    edges: rd.Dataset  # (src, dst, w) canonical src < dst forest edges
    rounds: int
    history: list[dict] = field(default_factory=list)


def _canonical_edges(graph: Graph) -> rd.Dataset:
    """Distinct (lo, hi, w) with lo < hi from a (possibly symmetric)
    weighted edge set; self-loops never belong to a spanning forest."""

    def canon(t: pa.Table) -> pa.Table:
        src = t.column("src").to_numpy(zero_copy_only=False).astype(np.int64)
        dst = t.column("dst").to_numpy(zero_copy_only=False).astype(np.int64)
        w = t.column("w").to_numpy(zero_copy_only=False).astype(np.int64)
        keep = src != dst
        lo = np.minimum(src[keep], dst[keep])
        hi = np.maximum(src[keep], dst[keep])
        return pa.table(
            {
                "lo": pa.array(lo, pa.int64()),
                "hi": pa.array(hi, pa.int64()),
                "w": pa.array(w[keep], pa.int64()),
            }
        )

    return distinct(
        graph.edges.map_batches(canon, batch_format="pyarrow"),
        ["lo", "hi", "w"],
    )


def _attach_comps(
    edges: rd.Dataset, labels: rd.Dataset, nparts: int
) -> rd.Dataset:
    """(lo, hi, w, cu, cv) — current component of both endpoints."""
    e = safe_join(
        edges,
        labels.rename_columns({"vid": "__lu", "comp": "cu"}),
        join_type="inner",
        num_partitions=nparts,
        on=("lo",),
        right_on=("__lu",),
    ).select_columns(["lo", "hi", "w", "cu"])
    e = safe_join(
        e,
        labels.rename_columns({"vid": "__lv", "comp": "cv"}),
        join_type="inner",
        num_partitions=nparts,
        on=("hi",),
        right_on=("__lv",),
    ).select_columns(["lo", "hi", "w", "cu", "cv"])
    return e


def _min_edge_per_comp(cross: rd.Dataset, num_buckets: int) -> rd.Dataset:
    """One row per alive component: its minimum-(w, lo, hi) crossing
    edge and the component on the other side."""

    def both_dirs(t: pa.Table) -> pa.Table:
        cu = t.column("cu").to_numpy(zero_copy_only=False)
        cv = t.column("cv").to_numpy(zero_copy_only=False)
        lo = t.column("lo").to_numpy(zero_copy_only=False)
        hi = t.column("hi").to_numpy(zero_copy_only=False)
        w = t.column("w").to_numpy(zero_copy_only=False)
        comp = np.concatenate([cu, cv])
        other = np.concatenate([cv, cu])
        lo2 = np.concatenate([lo, lo])
        hi2 = np.concatenate([hi, hi])
        w2 = np.concatenate([w, w])
        # map-side combine: keep each comp's local min before the shuffle
        order = np.lexsort((hi2, lo2, w2, comp))
        comp, other, lo2, hi2, w2 = (
            a[order] for a in (comp, other, lo2, hi2, w2)
        )
        first = np.concatenate(([True], comp[1:] != comp[:-1]))
        return pa.table(
            {
                "comp": pa.array(comp[first], pa.int64()),
                "other": pa.array(other[first], pa.int64()),
                "lo": pa.array(lo2[first], pa.int64()),
                "hi": pa.array(hi2[first], pa.int64()),
                "w": pa.array(w2[first], pa.int64()),
                "__b": pa.array(
                    comp[first] % np.int64(num_buckets), pa.int64()
                ),
            }
        )

    def best(g: pd.DataFrame) -> pd.DataFrame:
        order = np.lexsort(
            (
                g["hi"].to_numpy(),
                g["lo"].to_numpy(),
                g["w"].to_numpy(),
                g["comp"].to_numpy(),
            )
        )
        s = g.iloc[order]
        first = np.concatenate(
            ([True], s["comp"].to_numpy()[1:] != s["comp"].to_numpy()[:-1])
        )
        return s.loc[first, ["comp", "other", "lo", "hi", "w"]]

    return (
        drop_empty_blocks(cross.map_batches(both_dirs, batch_format="pyarrow"))
        .groupby("__b")
        .map_groups(best, batch_format="pandas")
    )


def _fix_two_cycles(best: rd.Dataset, nparts: int) -> rd.Dataset:
    """Pointer table (c, par): par = hook target, except the smaller
    endpoint of each mutual (2-cycle) hook becomes its own root."""
    def mark(t: pa.Table) -> pa.Table:
        # map_groups upstream emits pandas blocks; rebuild as Arrow here
        return pa.table(
            {
                "__rc": pc.cast(t.column("comp"), pa.int64()),
                "__ro": pc.cast(t.column("other"), pa.int64()),
                "__mutual": pa.array(np.ones(t.num_rows, dtype=np.int8)),
            }
        )

    joined = safe_join(
        best.select_columns(["comp", "other"]),
        best.select_columns(["comp", "other"]).map_batches(
            mark, batch_format="pyarrow"
        ),
        join_type="left_outer",
        num_partitions=nparts,
        on=("comp", "other"),
        right_on=("__ro", "__rc"),
    )

    def resolve(t: pa.Table) -> pa.Table:
        c = t.column("comp").to_numpy(zero_copy_only=False)
        d = t.column("other").to_numpy(zero_copy_only=False)
        mutual = pc.is_valid(t.column("__mutual")).to_numpy(
            zero_copy_only=False
        )
        par = np.where(mutual & (c < d), c, d)
        return pa.table(
            {
                "c": pa.array(c, pa.int64()),
                "par": pa.array(par, pa.int64()),
            }
        )

    return joined.map_batches(resolve, batch_format="pyarrow")


def _pointer_double(par: rd.Dataset, nparts: int, max_jumps: int = 64) -> rd.Dataset:
    """Flatten the pointer forest: par <- par[par] until fixpoint."""
    par = par.materialize()
    for _ in range(max_jumps):
        j = safe_join(
            par,
            par.rename_columns({"c": "__pc", "par": "__pp"}),
            join_type="inner",
            num_partitions=nparts,
            on=("par",),
            right_on=("__pc",),
        )

        def jump(t: pa.Table) -> pa.Table:
            return pa.table(
                {
                    "c": t.column("c"),
                    "par": t.column("__pp"),
                    "__ch": pc.cast(
                        pc.not_equal(t.column("par"), t.column("__pp")),
                        pa.int64(),
                    ),
                }
            )

        j = j.map_batches(jump, batch_format="pyarrow").materialize()
        changed = j.sum("__ch")
        par = j.drop_columns(["__ch"]).materialize()
        if not changed:
            return par
    raise RuntimeError("pointer doubling did not converge")


def _msf_broadcast(
    graph: Graph, edges: rd.Dataset, num_buckets: int, max_rounds: int
) -> MSFRun:
    """Fast path: the dense comp vector (n int64) broadcasts via
    ray.put each round, so endpoint-component lookup and the crossing
    filter run inside ONE map pass per round — the only shuffle is the
    per-component min-edge bucket exchange. The hook/contract step
    pulls one row per alive component to the driver (bounded by the
    caller's ``broadcast_max`` guard; halves every round) and the
    pointer forest flattens in numpy."""
    import ray

    n = graph.n
    comp = np.arange(n, dtype=np.int64)
    forest_lo: list[np.ndarray] = []
    forest_hi: list[np.ndarray] = []
    forest_w: list[np.ndarray] = []
    history: list[dict] = []
    rounds = 0
    for rounds in range(1, max_rounds + 1):
        comp_ref = ray.put(comp)

        def attach(t: pa.Table) -> pa.Table:
            c = ray.get(comp_ref)
            lo = t.column("lo").to_numpy(zero_copy_only=False)
            hi = t.column("hi").to_numpy(zero_copy_only=False)
            w = t.column("w").to_numpy(zero_copy_only=False)
            keep = c[lo] != c[hi]
            return pa.table(
                {
                    "lo": pa.array(lo[keep], pa.int64()),
                    "hi": pa.array(hi[keep], pa.int64()),
                    "w": pa.array(w[keep], pa.int64()),
                    "cu": pa.array(c[lo[keep]], pa.int64()),
                    "cv": pa.array(c[hi[keep]], pa.int64()),
                }
            )

        cross = drop_empty_blocks(
            edges.map_batches(attach, batch_format="pyarrow")
        ).materialize()
        n_cross = cross.count()
        history.append({"round": rounds, "crossing_edges": int(n_cross)})
        if n_cross == 0:
            rounds -= 1
            break
        best = _min_edge_per_comp(cross, num_buckets).to_pandas()
        c = best["comp"].to_numpy().astype(np.int64)
        d = best["other"].to_numpy().astype(np.int64)
        lo = best["lo"].to_numpy().astype(np.int64)
        hi = best["hi"].to_numpy().astype(np.int64)
        w = best["w"].to_numpy().astype(np.int64)
        # 2-cycle fix: mutual hooks root at the smaller comp id
        order = np.argsort(c)
        c, d, lo, hi, w = c[order], d[order], lo[order], hi[order], w[order]
        pos = np.searchsorted(c, d)
        pos_c = np.clip(pos, 0, len(c) - 1)
        mutual = (c[pos_c] == d) & (d[pos_c] == c)
        par = np.arange(n, dtype=np.int64)
        par[c] = np.where(mutual & (c < d), c, d)
        # pointer doubling on the hook forest (cycle-free after the fix)
        while True:
            nxt = par[par]
            if np.array_equal(nxt, par):
                break
            par = nxt
        comp = par[comp]
        keep = np.unique(
            np.stack((lo, hi, w), axis=1), axis=0
        )
        forest_lo.append(keep[:, 0])
        forest_hi.append(keep[:, 1])
        forest_w.append(keep[:, 2])
        edges = cross.select_columns(["lo", "hi", "w"]).materialize()
    else:
        raise RuntimeError("boruvka did not converge within max_rounds")

    if forest_lo:
        t = pa.table(
            {
                "src": pa.array(np.concatenate(forest_lo), pa.int64()),
                "dst": pa.array(np.concatenate(forest_hi), pa.int64()),
                "w": pa.array(np.concatenate(forest_w), pa.int64()),
            }
        )
    else:
        t = pa.table(
            {
                "src": pa.array([], pa.int64()),
                "dst": pa.array([], pa.int64()),
                "w": pa.array([], pa.int64()),
            }
        )
    return MSFRun(edges=rd.from_arrow(t), rounds=rounds, history=history)


def msf_boruvka(
    graph: Graph,
    num_buckets: int | None = None,
    max_rounds: int = 64,
    broadcast_max: int = 50_000_000,
) -> MSFRun:
    """Minimum spanning forest of the canonical weighted undirected
    edge set under the (w, lo, hi) total order. Returns the unique
    forest as (src, dst, w) rows, src < dst.

    While the vertex-id space fits ``broadcast_max`` (dense comp vector
    <= 400 MB at the default), the broadcast fast path runs one shuffle
    per round; past the guard the all-Dataset join path below computes
    the identical forest with hash joins end to end (tested equal by
    shrinking the guard)."""
    nparts = _default_join_partitions()
    edges = _canonical_edges(graph).materialize()
    if num_buckets is None:
        num_buckets = resolve_num_buckets(edges)
    if graph.n <= broadcast_max:
        return _msf_broadcast(graph, edges, num_buckets, max_rounds)
    labels = distinct(
        edges.select_columns(["lo"])
        .rename_columns({"lo": "vid"})
        .union(edges.select_columns(["hi"]).rename_columns({"hi": "vid"})),
        ["vid"],
    )

    def ident(t: pa.Table) -> pa.Table:
        return t.append_column("comp", t.column("vid"))

    labels = labels.map_batches(ident, batch_format="pyarrow").materialize()

    forest_parts: list[rd.Dataset] = []
    history: list[dict] = []
    rounds = 0
    for rounds in range(1, max_rounds + 1):
        attached = _attach_comps(edges, labels, nparts)

        def crossing(t: pa.Table) -> pa.Table:
            return t.filter(pc.not_equal(t.column("cu"), t.column("cv")))

        cross = drop_empty_blocks(
            attached.map_batches(crossing, batch_format="pyarrow")
        ).materialize()
        n_cross = cross.count()
        history.append({"round": rounds, "crossing_edges": int(n_cross)})
        if n_cross == 0:
            rounds -= 1
            break
        best = _min_edge_per_comp(cross, num_buckets).materialize()
        forest_parts.append(
            distinct(best.select_columns(["lo", "hi", "w"]), ["lo", "hi", "w"])
            .materialize()
        )
        par = _fix_two_cycles(best, nparts)
        par = _pointer_double(par, nparts)
        relabel = safe_join(
            labels,
            par.rename_columns({"c": "__c", "par": "__root"}),
            join_type="left_outer",
            num_partitions=nparts,
            on=("comp",),
            right_on=("__c",),
        )

        def apply(t: pa.Table) -> pa.Table:
            return pa.table(
                {
                    "vid": t.column("vid"),
                    "comp": pc.coalesce(
                        t.column("__root"), t.column("comp")
                    ),
                }
            )

        labels = relabel.map_batches(apply, batch_format="pyarrow").materialize()
        # contracted-away edges (now internal) never need scanning again
        edges = distinct(
            cross.select_columns(["lo", "hi", "w"]), ["lo", "hi", "w"]
        ).materialize()
    else:
        raise RuntimeError("boruvka did not converge within max_rounds")

    if forest_parts:
        forest = forest_parts[0]
        for p in forest_parts[1:]:
            forest = forest.union(p)
        forest = distinct(forest, ["lo", "hi", "w"])
    else:
        forest = rd.from_arrow(
            pa.table(
                {
                    "lo": pa.array([], pa.int64()),
                    "hi": pa.array([], pa.int64()),
                    "w": pa.array([], pa.int64()),
                }
            )
        )
    forest = forest.rename_columns({"lo": "src", "hi": "dst"}).select_columns(
        ["src", "dst", "w"]
    )
    return MSFRun(edges=forest, rounds=rounds, history=history)
