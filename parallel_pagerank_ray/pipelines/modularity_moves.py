"""Parallel Louvain-style modularity moves (one-level community
refinement) on the BSP actor harness.

Beyond-reference capability: the classic Louvain local-move phase,
parallelized the way Grappolo-family engines do — synchronous rounds
where every vertex simultaneously evaluates moving into a neighboring
community — with a deterministic MONOTONE rule that makes the result
exact, oscillation-free, and SQL-replayable:

    a vertex v in community a may move only to a community c < a
    (monotone min-id), choosing the candidate with the largest
    integer-scaled modularity gain

        gain(c) = 4m * (k_vc - k_va) - 2 * deg_v * (tot_c - tot_a + deg_v)

    (the standard unweighted Louvain delta-Q multiplied by 4m^2 — all
    int64), moving iff gain > 0, ties -> smallest c. Synchronous
    simultaneous moves, fixed round count. Monotone ids rule out the
    A<->B swap oscillation synchronous Louvain is prone to.

Harness shape = label_prop_actors.py (LPA votes ARE the k_vc table):

    scatter  every shard locally combines (dst, src_comm) vote counts
             per destination shard — ONE plasma put per dest shard
    gather   every shard merges its incoming votes, applies the move
             rule with the round's community-degree totals, updates its
             local comm slice, and returns its movers' (old, new, deg)
             deltas

The driver maintains the community-degree total vector ``tot``
(init = closure degree, updated incrementally from the returned move
deltas — exact integer bookkeeping) and broadcasts it once per round
(ray.put, zero-copy read per shard): n*8 B driver state and per-round
traffic, the same dense-exchange class as components_actors; the
routed swap-in (tot sharded by community id, two extra sparse
exchanges per round) is the >2^33-vertex path.

Overflow: |gain| <= 4m*deg_max + 2*deg_max*(2*tot_max) <= 12*m*deg_max,
validated at init against 2^63 (the HITS guard idiom).

Modularity is non-decreasing in practice (planted-partition pytest
checks Q improves); like all synchronous local-move phases this is a
heuristic round, not a Q-optimal partition — the value contract is
exact replay, gated against a recursive-CTE DuckDB oracle.
"""

from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np
import ray
import ray.data as rd

from parallel_pagerank_ray.pipelines.graph_build import Graph, undirected_edges
from parallel_pagerank_ray.stages.csr_store import (
    EdgeShardStore,
    cap_num_parts,
    per_actor_cpus,
)


@ray.remote
def _route_label_block(block, part_size: int) -> dict:
    """Split one (vid, comm) labeling block into per-part plasma
    arrays (the seed-routing idiom — the driver never holds the
    labeling)."""
    if block.num_rows == 0 or "vid" not in block.schema.names:
        return {}
    v = block.column("vid").to_numpy().astype(np.int64)
    c = block.column("comm").to_numpy().astype(np.int64)
    parts = v // part_size
    out: dict[int, "ray.ObjectRef"] = {}
    for p in np.unique(parts):
        m = parts == p
        out[int(p)] = ray.put(
            (np.ascontiguousarray(v[m]), np.ascontiguousarray(c[m]))
        )
    return out


@dataclass
class ModularityMovesRun:
    labels: rd.Dataset  # (vid, comm)
    iterations: int
    history: list[dict] = field(default_factory=list)


@ray.remote
class _ModShard:
    def __init__(
        self, part: int, part_refs: list, n: int, part_size: int
    ) -> None:
        self.n = n
        self.part_size = part_size
        self.base = part * part_size
        self.size = max(0, min(part_size, n - self.base))
        if part_refs:
            chunks = ray.get(part_refs)
            src = np.concatenate([c[0] for c in chunks]) - self.base
            dst = np.concatenate([c[1] for c in chunks])
            if len(chunks[0]) > 2:  # weighted closure rides a w column
                from parallel_pagerank_ray.stages.csr_store import int_weights

                w = int_weights(np.concatenate([c[2] for c in chunks]))
            else:
                w = None
        else:
            src = np.array([], dtype=np.int64)
            dst = np.array([], dtype=np.int64)
            w = None
        if w is None:
            self.deg = np.bincount(src, minlength=self.size).astype(np.int64)
        else:
            self.deg = np.zeros(self.size, dtype=np.int64)
            np.add.at(self.deg, src, w)
        # pre-bucket edges by destination shard once (reused every round)
        db = dst // part_size
        order = np.argsort(db, kind="stable")
        self.src = src[order]
        self.w = w[order] if w is not None else None
        self.dst_local = (dst - db * part_size)[order]
        db_s = db[order]
        self.bucket_ids = np.unique(db_s).astype(np.int64)
        bounds = np.searchsorted(db_s, self.bucket_ids, "left").tolist() + [
            len(db_s)
        ]
        self._slices = [
            (int(bounds[i]), int(bounds[i + 1]))
            for i in range(len(self.bucket_ids))
        ]
        self.comm = self.base + np.arange(self.size, dtype=np.int64)

    def deg_slice(self):
        return self.deg

    def set_labels(self, refs: list) -> None:
        """Adopt an initial community labeling (routed per-part
        (vids, comms) arrays — the coarse-seeding path: vote keys in
        round 1 start compressed instead of one-community-per-vertex)."""
        for vids, comms in ray.get(list(refs)):
            self.comm[vids - self.base] = comms

    def tot_partial(self):
        """Sparse (comm, deg-sum) partial over the local slice — the
        driver's tot-vector init under a non-identity labeling."""
        u, inv = np.unique(self.comm, return_inverse=True)
        s = np.zeros(len(u), dtype=np.int64)
        np.add.at(s, inv, self.deg)
        return u, s

    def scatter(self) -> list:
        """[(dest_shard, ref((keys, cnts))), ...] — locally-combined
        neighbor-community vote masses keyed local_dst * n + comm
        (edge count when unweighted, int64 weight sum when weighted)."""
        out = []
        nbig = np.int64(self.n)
        for bid, (lo, hi) in zip(self.bucket_ids, self._slices):
            key = self.dst_local[lo:hi] * nbig + self.comm[self.src[lo:hi]]
            if self.w is None:
                u, cnt = np.unique(key, return_counts=True)
                cnt = cnt.astype(np.int64)
            else:
                u, inv = np.unique(key, return_inverse=True)
                cnt = np.zeros(len(u), dtype=np.int64)
                np.add.at(cnt, inv, self.w[lo:hi])
            out.append((int(bid), ray.put((u, cnt))))
        return out

    def gather_move(self, refs: list, tot: np.ndarray, m: int):
        """Merge incoming votes, apply the monotone move rule, update
        the local comm slice; return the movers' (vid, old_comm,
        new_comm, deg) arrays for the driver's tot bookkeeping."""
        empty = np.array([], dtype=np.int64)
        incoming = ray.get(list(refs))
        if not incoming:
            return empty, empty, empty, empty
        keys = np.concatenate([k for k, _ in incoming])
        cnts = np.concatenate([c for _, c in incoming])
        u, inv = np.unique(keys, return_inverse=True)
        k = np.zeros(len(u), dtype=np.int64)
        np.add.at(k, inv, cnts)
        nbig = np.int64(self.n)
        d = (u // nbig).astype(np.int64)  # local dst index
        c = (u % nbig).astype(np.int64)  # candidate community
        a = self.comm[d]
        # k_va: the vote row whose community equals v's own (0 if none)
        va = np.zeros(self.size, dtype=np.int64)
        own = c == a
        va[d[own]] = k[own]
        cand = c < a
        if not cand.any():
            return empty, empty, empty, empty
        d, c, k = d[cand], c[cand], k[cand]
        a = self.comm[d]
        degv = self.deg[d]
        gain = 4 * m * (k - va[d]) - 2 * degv * (
            tot[c] - tot[a] + degv
        )
        pos = gain > 0
        if not pos.any():
            return empty, empty, empty, empty
        d, c, gain = d[pos], c[pos], gain[pos]
        # per-dst argmax: (dst asc, gain desc, c asc), take first
        order = np.lexsort((c, -gain, d))
        ds_, cs_ = d[order], c[order]
        first = np.concatenate(([True], ds_[1:] != ds_[:-1]))
        win_d, win_c = ds_[first], cs_[first]
        old = self.comm[win_d].copy()
        self.comm[win_d] = win_c
        return self.base + win_d, old, win_c, self.deg[win_d]

    def slice_table(self):
        import pyarrow as pa

        vids = self.base + np.arange(self.size, dtype=np.int64)
        return pa.table({"vid": vids, "comm": self.comm})


def modularity_moves_bsp(
    graph: Graph,
    rounds: int = 3,
    num_parts: int | None = None,
    edges_canonical: bool = False,
    edges_symmetric: bool = False,
    init_labels: "rd.Dataset | None" = None,
) -> ModularityMovesRun:
    """``rounds`` synchronous monotone modularity-move rounds over the
    simple undirected closure; returns (vid, comm) for every vertex.
    ``edges_canonical=True`` certifies src < dst distinct no-self-loop
    input (skips the closure dedup shuffle).

    ``init_labels``: an optional (vid, comm) Dataset seeding the
    community state (comm ids must live in [0, n), e.g. an LPA or CC
    labeling) — routed per shard, never materialized on the driver.
    Coarse seeding also compresses round-1 vote keys, the dominant
    cost when every vertex starts as its own community.

    ``edges_symmetric=True``: the input already holds every undirected
    edge in BOTH directions — the closure step is skipped. A ``w``
    column makes the moves WEIGHTED (k_vc / degrees / totals / m are
    int64 weight sums — the standard weighted-Louvain gain); weighted
    input must be passed with ``edges_symmetric=True``, the same
    contract as weighted LPA (the closure builder drops w)."""
    n = graph.n
    if n == 0:
        return ModularityMovesRun(labels=rd.from_items([]), iterations=0)
    if num_parts is None:
        cpus = int(ray.cluster_resources().get("CPU", 8))
        num_parts = cap_num_parts(min(256, max(4, cpus // 4)), n)
    try:
        weighted = "w" in (graph.edges.schema().names or [])
    except Exception:  # pragma: no cover
        weighted = False
    if weighted and not edges_symmetric:
        raise ValueError(
            "weighted modularity moves need the pre-built symmetric "
            "weighted closure; pass edges_symmetric=True to certify"
        )
    if edges_symmetric:
        und = graph.edges
    else:
        und = undirected_edges(graph.edges, dedup=not edges_canonical)
    store = EdgeShardStore.build(und, n=n, num_parts=num_parts)
    if store.part_size * n >= (1 << 63):  # pragma: no cover
        raise ValueError(
            "composite vote key would overflow int64; reduce part count"
        )
    P = max(1, -(-n // store.part_size))
    per_actor = per_actor_cpus(P)
    actors = [
        _ModShard.options(num_cpus=per_actor).remote(
            p, store.part_refs.get(p, []), n, store.part_size
        )
        for p in range(P)
    ]
    deg_parts = ray.get([a.deg_slice.remote() for a in actors])
    deg = (
        np.concatenate(deg_parts) if deg_parts else np.zeros(0, np.int64)
    )
    m = int(deg.sum()) // 2  # exact for weighted AND unweighted closures
    deg_max = int(deg.max()) if len(deg) else 0
    if m and 12 * m * max(1, deg_max) >= (1 << 63):  # pragma: no cover
        raise ValueError(
            "integer modularity gain would overflow int64 "
            f"(12 * m * deg_max = {12 * m * deg_max}); this graph needs "
            "the float-gain variant"
        )
    if init_labels is not None:
        dicts = ray.get(
            [
                _route_label_block.remote(b, store.part_size)
                for b in init_labels.to_arrow_refs()
            ]
        )
        label_refs: dict[int, list] = {}
        for dd in dicts:
            for p, ref in dd.items():
                label_refs.setdefault(p, []).append(ref)
        ray.get(
            [
                actors[p].set_labels.remote(label_refs.get(p, []))
                for p in range(P)
            ]
        )
        tot = np.zeros(n, dtype=np.int64)
        for u, s in ray.get([a.tot_partial.remote() for a in actors]):
            np.add.at(tot, u, s)
    else:
        tot = deg.astype(np.int64).copy()  # init: singleton communities
    it = 0
    history: list[dict] = []
    for _ in range(rounds):
        mats = ray.get([a.scatter.remote() for a in actors])
        inbox: list[list] = [[] for _ in range(P)]
        for row in mats:
            for bid, ref in row:
                inbox[bid].append(ref)
        tot_ref = ray.put(tot)
        deltas = ray.get(
            [
                actors[p].gather_move.remote(inbox[p], tot_ref, m)
                for p in range(P)
            ]
        )
        moved = 0
        for _vids, old, new, dv in deltas:
            if len(old):
                np.subtract.at(tot, old, dv)
                np.add.at(tot, new, dv)
                moved += len(old)
        it += 1
        history.append({"iter": it, "moved": int(moved)})
        if moved == 0:
            break
    tables = [a.slice_table.remote() for a in actors]
    ray.wait(tables, num_returns=len(tables))
    for a in actors:
        ray.kill(a)
    return ModularityMovesRun(
        labels=rd.from_arrow_refs(tables), iterations=it, history=history
    )


def louvain_two_level(
    graph: Graph,
    rounds1: int = 3,
    rounds2: int = 3,
    num_parts: int | None = None,
    edges_canonical: bool = False,
    broadcast_max_bytes: int = 256 << 20,
) -> ModularityMovesRun:
    """Two-level Louvain: a monotone move phase over the input graph,
    contraction to the community quotient graph (edge weight = count
    of canonical edges between two communities; intra-community edges
    drop — the self-loop-free quotient, so level 2 optimizes the
    quotient's modularity, the standard coarsening heuristic this
    repo's matching-coarsener also uses), a WEIGHTED move phase over
    the quotient, and composition comm(v) = level2(level1(v)).

    Scale shape: level-1/level-2 are the BSP move engine above; the
    contraction is one map over the canonical edges (community labels
    broadcast as an n*8 B vector under ``broadcast_max_bytes``, two
    hash joins beyond) + one bucketed weight combine; the composition
    re-broadcasts the level-2 label vector the same way. Quotient
    vertex ids live in the SAME [0, n) id space (community ids are
    vertex ids), so no re-densification pass is needed.
    """
    from parallel_pagerank_ray.stages.agg import grouped_agg
    from parallel_pagerank_ray.util import drop_empty_blocks, safe_join

    n = graph.n
    if n == 0:
        return ModularityMovesRun(labels=rd.from_items([]), iterations=0)
    if edges_canonical:
        canon = graph.edges
    else:
        from parallel_pagerank_ray.pipelines.triangles import (
            _simple_undirected,
        )

        canon = _simple_undirected(graph.edges).materialize()
    l1 = modularity_moves_bsp(
        Graph(n=n, edges=canon),
        rounds=rounds1,
        num_parts=num_parts,
        edges_canonical=True,
    )
    lab1 = l1.labels.materialize()

    if n * 8 <= broadcast_max_bytes:
        lab_vec = np.full(n, -1, dtype=np.int64)
        for blk in ray.get(lab1.to_arrow_refs()):
            if blk.num_rows:
                lab_vec[blk.column("vid").to_numpy()] = blk.column(
                    "comm"
                ).to_numpy()
        lab_ref = ray.put(lab_vec)

        def quotient_rows(b: dict) -> dict:
            lv = ray.get(lab_ref)
            cs = lv[b["src"].astype(np.int64)]
            cd = lv[b["dst"].astype(np.int64)]
            keep = cs != cd
            cs, cd = cs[keep], cd[keep]
            return {
                "src": np.minimum(cs, cd),
                "dst": np.maximum(cs, cd),
                "w": np.ones(int(keep.sum()), dtype=np.int64),
            }

        qrows = canon.map_batches(quotient_rows, batch_format="numpy")
    else:  # join fallback (the community_stats attach shape)
        cpus = int(ray.cluster_resources().get("CPU", 8))
        jp = max(8, cpus)
        e1 = safe_join(
            canon.select_columns(["src", "dst"]),
            lab1,
            join_type="inner",
            num_partitions=jp,
            on=("src",),
            right_on=("vid",),
        ).rename_columns({"comm": "cs"})
        e2 = safe_join(
            e1.select_columns(["dst", "cs"]),
            lab1,
            join_type="inner",
            num_partitions=jp,
            on=("dst",),
            right_on=("vid",),
        ).rename_columns({"comm": "cd"})

        def quotient_rows_joined(b: dict) -> dict:
            cs = b["cs"].astype(np.int64)
            cd = b["cd"].astype(np.int64)
            keep = cs != cd
            cs, cd = cs[keep], cd[keep]
            return {
                "src": np.minimum(cs, cd),
                "dst": np.maximum(cs, cd),
                "w": np.ones(int(keep.sum()), dtype=np.int64),
            }

        qrows = e2.map_batches(quotient_rows_joined, batch_format="numpy")
    qcanon = grouped_agg(
        drop_empty_blocks(qrows), ["src", "dst"], {"w": ("w", "sum")}
    )

    def symmetric(b: dict) -> dict:
        s = b["src"].astype(np.int64)
        d = b["dst"].astype(np.int64)
        w = b["w"].astype(np.float64)
        return {
            "src": np.concatenate([s, d]),
            "dst": np.concatenate([d, s]),
            "w": np.concatenate([w, w]),
        }

    qsym = qcanon.map_batches(symmetric, batch_format="numpy").materialize()
    if qsym.count() == 0:
        # level 1 merged every edge inside a community: the quotient
        # has no edges and level 2 is the identity
        return ModularityMovesRun(
            labels=lab1, iterations=l1.iterations, history=l1.history
        )
    l2 = modularity_moves_bsp(
        Graph(n=n, edges=qsym),
        rounds=rounds2,
        num_parts=num_parts,
        edges_symmetric=True,
    )
    lab2 = l2.labels.materialize()

    if n * 8 <= broadcast_max_bytes:
        l2_vec = np.arange(n, dtype=np.int64)
        for blk in ray.get(lab2.to_arrow_refs()):
            if blk.num_rows:
                l2_vec[blk.column("vid").to_numpy()] = blk.column(
                    "comm"
                ).to_numpy()
        l2_ref = ray.put(l2_vec)

        def compose(b: dict) -> dict:
            lv2 = ray.get(l2_ref)
            return {
                "vid": b["vid"].astype(np.int64),
                "comm": lv2[b["comm"].astype(np.int64)],
            }

        final = lab1.map_batches(compose, batch_format="numpy")
    else:
        cpus = int(ray.cluster_resources().get("CPU", 8))
        jp = max(8, cpus)
        final = safe_join(
            lab1.rename_columns({"comm": "c1"}),
            lab2.rename_columns({"vid": "__qv", "comm": "comm"}),
            join_type="inner",
            num_partitions=jp,
            on=("c1",),
            right_on=("__qv",),
        ).select_columns(["vid", "comm"])
    return ModularityMovesRun(
        labels=final,
        iterations=l1.iterations + l2.iterations,
        history=l1.history + l2.history,
    )
