"""k-truss decomposition: the maximal subgraph in which every edge is
supported by at least k-2 triangles (Cohen 2008) — the standard
"cohesive community core" refinement of k-core for web/social graphs.

Synchronous edge peeling, the truss analogue of the k-core pipeline:

    support  enumerate triangles over the CURRENT edge set (degree-
             oriented wedge generation, the triangles.py kernel, with
             the wedge's CENTER kept so every matched triangle can
             credit all three of its edges), one bucketed count per
             canonical edge
    peel     edges with support < k-2 die; repeat until a round kills
             nothing

Round count = truss peel depth. Per-round cost is the triangle
enumeration O(sum deg_oriented^2) — the price every exact distributed
truss pays; the wedge stage inherits the triangles.py hub-orientation
bound (each wedge is generated at its lowest-degree endpoint).
Triangle matching broadcasts the packed oriented-edge key set while it
fits ``broadcast_max`` (8 B/edge, one plasma copy per node) and falls
back to a hash semi-join beyond it.
"""

from __future__ import annotations

import numpy as np
import ray
import ray.data as rd

from parallel_pagerank_ray.pipelines.graph_build import Graph
from parallel_pagerank_ray.pipelines.triangles import (
    _prepare_oriented,
    _simple_undirected,
)
from parallel_pagerank_ray.stages.agg import (
    grouped_agg,
    pairs_within_groups,
)
from parallel_pagerank_ray.util import drop_empty_blocks, safe_join


def _triangle_edge_credits(
    graph_n: int,
    edges: rd.Dataset,
    num_partitions: int | None,
    num_buckets: int | None,
    broadcast_max: int,
) -> rd.Dataset:
    """(src, dst, sup) for every canonical edge that closes >= 1
    triangle of the CURRENT edge set — each triangle credits all three
    edges. Edges in no triangle simply have no row (support 0)."""
    g = Graph(n=graph_n, edges=edges)
    _, _, oriented, num_partitions, num_buckets = _prepare_oriented(
        g, num_partitions, num_buckets, edges_simple=True
    )
    oriented = oriented.materialize()
    nb = np.int64(graph_n)

    def wedge_rows(grp: dict[str, np.ndarray]) -> dict[str, np.ndarray]:
        # neighbor lists ordered by the orientation key (deg, vid): an
        # emitted pair (a, b) closes iff oriented edge (a, b) exists
        order = np.lexsort((grp["v"], grp["deg_v"], grp["u"]))
        u = grp["u"][order]
        v = grp["v"][order]
        ai, bi = pairs_within_groups(
            (u, np.arange(len(u), dtype=np.int64)),
            np.arange(len(u), dtype=np.int64),
        )
        return {"a": v[ai], "b": v[bi], "c": u[ai]}

    wedges = drop_empty_blocks(
        oriented.groupby("bucket").map_groups(wedge_rows, batch_format="numpy")
    )

    n_edges = oriented.count()
    if graph_n < (1 << 31) and n_edges <= broadcast_max:
        key_parts = [
            blk.column("u").to_numpy().astype(np.int64) * nb
            + blk.column("v").to_numpy().astype(np.int64)
            for blk in ray.get(oriented.to_arrow_refs())
            if blk.num_rows
        ]
        keys = (
            np.sort(np.concatenate(key_parts))
            if key_parts
            else np.array([], dtype=np.int64)
        )
        keys_ref = ray.put(keys)

        def match(b: dict[str, np.ndarray]) -> dict[str, np.ndarray]:
            ks = ray.get(keys_ref)
            wk = b["a"] * nb + b["b"]
            if not len(ks) or not len(wk):
                e = np.array([], dtype=np.int64)
                return {"a": e, "b": e, "c": e}
            pos = np.searchsorted(ks, wk)
            ok = pos < len(ks)
            m = np.zeros(len(wk), dtype=bool)
            m[ok] = ks[pos[ok]] == wk[ok]
            return {"a": b["a"][m], "b": b["b"][m], "c": b["c"][m]}

        triangles = wedges.map_batches(match, batch_format="numpy")
    else:  # hash semi-join fallback (edge set too big to broadcast)
        triangles = safe_join(
            wedges,
            oriented.select_columns(["u", "v"]),
            join_type="inner",
            num_partitions=num_partitions,
            on=("a", "b"),
            right_on=("u", "v"),
        ).select_columns(["a", "b", "c"])

    def credits(b: dict[str, np.ndarray]) -> dict[str, np.ndarray]:
        a, bb, c = b["a"], b["b"], b["c"]
        s = np.concatenate([np.minimum(a, bb), np.minimum(c, a), np.minimum(c, bb)])
        d = np.concatenate([np.maximum(a, bb), np.maximum(c, a), np.maximum(c, bb)])
        return {"src": s, "dst": d}

    return grouped_agg(
        drop_empty_blocks(triangles).map_batches(credits, batch_format="numpy"),
        ["src", "dst"],
        {"sup": ("src", "count")},
        num_buckets=num_buckets,
    )


def ktruss_edges(
    graph: Graph,
    k: int,
    num_partitions: int | None = None,
    num_buckets: int | None = None,
    broadcast_max: int = 50_000_000,
    max_rounds: int = 100_000,
    edges_simple: bool = False,
) -> rd.Dataset:
    """Surviving canonical edges (src, dst) of the k-truss. ``k >= 3``
    (k=2 is the whole simple graph). Deterministic: synchronous rounds,
    so the result is partitioning-invariant and SQL-reproducible."""
    if k < 3:
        raise ValueError("k-truss needs k >= 3 (k=2 is the input graph)")
    edges = (
        graph.edges.select_columns(["src", "dst"])
        if edges_simple
        else _simple_undirected(graph.edges)
    ).materialize()
    need = k - 2
    for _ in range(max_rounds):
        n_before = edges.count()
        if n_before == 0:
            break
        sup = _triangle_edge_credits(
            graph.n, edges, num_partitions, num_buckets, broadcast_max
        )
        keep = sup.map_batches(
            lambda b, t=need: {
                "src": b["src"][b["sup"] >= t],
                "dst": b["dst"][b["sup"] >= t],
            },
            batch_format="numpy",
        ).materialize()
        n_after = keep.count()
        edges = keep
        if n_after == n_before:
            break
    if edges.count() == 0:  # schema-stable empty result
        import pyarrow as pa

        return rd.from_arrow(
            pa.table(
                {
                    "src": pa.array([], type=pa.int64()),
                    "dst": pa.array([], type=pa.int64()),
                }
            )
        )
    return edges


# ---------------------------------------------------------------------------
# Incremental BSP engine: triangles enumerated ONCE, supports maintained
# by decrement — the deep-peel scale path. `ktruss_edges` above pays a
# full triangle re-enumeration per round (fine for shallow peels, k=3
# converges in ~2 rounds); a deep peel (k=10 on the co-purchase graph
# runs 8 rounds; adversarial graphs run hundreds) multiplies that cost
# by the round count. This engine is the truss analogue of
# pipelines/kcore.py instead: replicate each triangle to the owner
# shard of EACH of its three edges, then peel with broadcast kill
# rounds — every (triangle, edge) incidence is charged exactly once
# across the whole run.
#
#     prep    canonicalize edges (src < dst, distinct, no self loops),
#             enumerate triangles once (triangle_list), route replicas
#             (local_edge, other1, other2) by the local edge's src part
#     init    per-shard support = one bincount over local-edge slots
#     round   driver broadcasts last round's globally-killed edge keys
#             (ONE ray.put, zero-copy read in every shard); shards find
#             hit replicas through three per-slot sorted indexes
#             (searchsorted range expansion, the kcore peel idiom),
#             mark those triangles dead, decrement the local edge's
#             support when it survived the round, and report local
#             edges that fell below k-2
#
# A triangle dies exactly once (all replicas observe the same broadcast
# stream), so total work is O(T log T) for the slot indexes + O(T)
# decrements; per-round traffic is only the newly-killed key list
# (sums to <= E keys over the run — no dense exchange). Synchronous
# simultaneous kills keep the sequential truss-peel invariant: after
# every round support(e) = #{triangles with all three edges alive}.
#
# Packed edge keys (src * n + dst) bound n < ~3.0e9; triangle_list's
# broadcast guard (n < 2^31, oriented edges <= 50M/plasma copy) binds
# first — beyond it, feed the shards from the wedge-shuffle
# enumeration instead (the peel itself never materializes anything
# dense).

from dataclasses import dataclass, field

from parallel_pagerank_ray.stages.csr_store import (
    EdgeShardStore,
    cap_num_parts,
    per_actor_cpus,
)


@dataclass
class KTrussRun:
    edges: rd.Dataset  # (src, dst) canonical edges of the k-truss
    iterations: int
    history: list[dict] = field(default_factory=list)


@ray.remote
def _register_replicas(block, part_size: int, n: int):
    """Split one triangle block (a < b < c rows) into per-part replica
    arrays (local src, local dst, other-edge keys); put each. Each
    triangle lands on the owner shard of each of its three edges:
    (a,b) and (a,c) on shard(a), (b,c) on shard(b)."""
    if block.num_rows == 0 or "a" not in block.schema.names:
        return {}
    a = block.column("a").to_numpy().astype(np.int64)
    b = block.column("b").to_numpy().astype(np.int64)
    c = block.column("c").to_numpy().astype(np.int64)
    nb = np.int64(n)
    k_ab = a * nb + b
    k_ac = a * nb + c
    k_bc = b * nb + c
    es = np.concatenate([a, a, b])
    ed = np.concatenate([b, c, c])
    o1 = np.concatenate([k_ac, k_ab, k_ab])
    o2 = np.concatenate([k_bc, k_bc, k_ac])
    parts = es // part_size
    out: dict[int, ray.ObjectRef] = {}
    for p in np.unique(parts):
        m = parts == p
        out[int(p)] = ray.put(
            (
                np.ascontiguousarray(es[m]),
                np.ascontiguousarray(ed[m]),
                np.ascontiguousarray(o1[m]),
                np.ascontiguousarray(o2[m]),
            )
        )
    return out


@ray.remote
class _KTrussShard:
    def __init__(
        self,
        part: int,
        edge_refs: list,
        rep_refs: list,
        n: int,
        part_size: int,
        k: int,
    ) -> None:
        self.thr = k - 2
        nb = np.int64(n)
        if edge_refs:
            chunks = ray.get(edge_refs)
            src = np.concatenate([ch[0] for ch in chunks])
            dst = np.concatenate([ch[1] for ch in chunks])
        else:
            src = dst = np.array([], dtype=np.int64)
        keys = src * nb + dst
        if keys.size and not bool(np.all(keys[1:] >= keys[:-1])):
            keys = np.sort(keys)  # store is (src,dst)-sorted; defense only
        self.keys = keys
        self.support = np.zeros(len(keys), dtype=np.int64)
        self.alive = np.ones(len(keys), dtype=bool)
        if rep_refs:
            chunks = ray.get(rep_refs)
            res = np.concatenate([ch[0] for ch in chunks])
            red = np.concatenate([ch[1] for ch in chunks])
            o1 = np.concatenate([ch[2] for ch in chunks])
            o2 = np.concatenate([ch[3] for ch in chunks])
        else:
            res = red = o1 = o2 = np.array([], dtype=np.int64)
        rkey = res * nb + red
        # triangles only exist on edges of the canonical set, so every
        # rkey is present by construction — no equality re-check needed
        self.le = np.searchsorted(keys, rkey)
        np.add.at(self.support, self.le, 1)
        # trussness bookkeeping (used by the rising-threshold driver;
        # the fixed-k driver ignores it): edges dying while the
        # threshold is k-2 have truss number k-1
        self.truss = np.full(len(keys), 2, dtype=np.int64)
        self.talive = np.ones(len(rkey), dtype=bool)
        # per-slot sorted indexes: replicas hit by a killed edge key
        # are one searchsorted range per slot — each replica is found
        # at most once per slot over the whole run
        self.slots = []
        for vals in (rkey, o1, o2):
            order = np.argsort(vals, kind="stable")
            self.slots.append((vals[order], order))

    def initial_kill(self):
        doomed = np.nonzero(self.alive & (self.support < self.thr))[0]
        self.alive[doomed] = False
        self.truss[doomed] = self.thr + 1
        return self.keys[doomed]

    def raise_k(self, k: int):
        """Adopt truss threshold k (support floor k-2); kill and
        report local edges now below it — the rising-threshold driver
        (trussness_bsp) calls this between peel fixpoints, mirroring
        kcore's _CorenessShard.raise_k."""
        self.thr = k - 2
        return self.initial_kill()

    def alive_count(self) -> int:
        return int(self.alive.sum())

    def truss_table(self, n: int):
        import pyarrow as pa

        nb = np.int64(n)
        return pa.table(
            {
                "src": pa.array(self.keys // nb, pa.int64()),
                "dst": pa.array(self.keys % nb, pa.int64()),
                "trussness": pa.array(self.truss, pa.int64()),
            }
        )

    def _hits(self, killed: np.ndarray) -> np.ndarray:
        pos_parts = []
        for svals, order in self.slots:
            lo = np.searchsorted(svals, killed, "left")
            hi = np.searchsorted(svals, killed, "right")
            lens = hi - lo
            m = lens > 0
            if not m.any():
                continue
            lo, lens = lo[m], lens[m]
            csum = np.concatenate(([0], np.cumsum(lens)[:-1]))
            pos = (
                np.arange(int(lens.sum()))
                - np.repeat(csum, lens)
                + np.repeat(lo, lens)
            )
            pos_parts.append(order[pos])
        if not pos_parts:
            return np.array([], dtype=np.int64)
        return np.unique(np.concatenate(pos_parts))

    def peel(self, killed: np.ndarray) -> np.ndarray:
        """Apply one round of globally-broadcast edge deaths; return
        local edges that fell below k-2 (their packed keys)."""
        if len(killed):
            hits = self._hits(killed)
            hits = hits[self.talive[hits]]
            if len(hits):
                self.talive[hits] = False
                le = self.le[hits]
                p = np.searchsorted(killed, self.keys[le])
                in_killed = np.zeros(len(le), dtype=bool)
                valid = p < len(killed)
                in_killed[valid] = killed[p[valid]] == self.keys[le[valid]]
                dec = self.alive[le] & ~in_killed
                if dec.any():
                    np.subtract.at(self.support, le[dec], 1)
        doomed = np.nonzero(self.alive & (self.support < self.thr))[0]
        self.alive[doomed] = False
        self.truss[doomed] = self.thr + 1
        return self.keys[doomed]

    def slice_table(self, n: int):
        import pyarrow as pa

        keys = self.keys[self.alive]
        nb = np.int64(n)
        return pa.table(
            {
                "src": pa.array(keys // nb, pa.int64()),
                "dst": pa.array(keys % nb, pa.int64()),
            }
        )


def ktruss_bsp(
    graph: Graph,
    k: int,
    num_parts: int | None = None,
    edges_canonical: bool = False,
) -> KTrussRun:
    """Edges of the k-truss of the simple undirected closure of
    ``graph.edges``, on the incremental BSP engine (module docs above).
    ``edges_canonical=True`` certifies the input is already
    undirected-canonical (src < dst, globally distinct, no self
    loops), skipping the closure dedup shuffle.

    Shard state is O(E_p + T_p) — edge slices plus the triangle
    replicas incident to them; no full-n or full-E vectors anywhere.
    Same fixpoint as ``ktruss_edges`` (both synchronous peels).
    """
    n = graph.n
    if n == 0:
        return KTrussRun(edges=rd.from_items([]), iterations=0)
    if edges_canonical:
        canon = graph.edges
    else:
        canon = _simple_undirected(graph.edges).materialize()
    if k <= 2:
        # support >= 0 == k-2 for every edge; nothing ever peels
        return KTrussRun(edges=canon, iterations=0)
    if num_parts is None:
        cpus = int(ray.cluster_resources().get("CPU", 8))
        num_parts = cap_num_parts(min(256, max(4, cpus)), n)
    from parallel_pagerank_ray.pipelines.triangles import triangle_list

    tri = triangle_list(Graph(n=n, edges=canon), edges_simple=True)
    store = EdgeShardStore.build(
        canon, n=n, num_parts=num_parts, sort_by=["src", "dst"]
    )
    rep_dicts = ray.get(
        [
            _register_replicas.remote(b, store.part_size, n)
            for b in tri.to_arrow_refs()
        ]
    )
    rep_refs: dict[int, list] = {}
    for d in rep_dicts:
        for p, ref in d.items():
            rep_refs.setdefault(p, []).append(ref)
    P = max(1, -(-n // store.part_size))
    per_actor = per_actor_cpus(P)
    actors = [
        _KTrussShard.options(num_cpus=per_actor).remote(
            p,
            store.part_refs.get(p, []),
            rep_refs.get(p, []),
            n,
            store.part_size,
            k,
        )
        for p in range(P)
    ]
    killed_parts = ray.get([a.initial_kill.remote() for a in actors])
    newly_killed = (
        np.concatenate(killed_parts)
        if killed_parts
        else np.array([], dtype=np.int64)
    )
    it = 0
    history: list[dict] = [{"iter": 0, "killed": int(len(newly_killed))}]
    while len(newly_killed):
        newly_killed.sort()  # searchsorted targets in peel()
        ref = ray.put(newly_killed)
        parts = ray.get([a.peel.remote(ref) for a in actors])
        newly_killed = np.concatenate(parts)
        it += 1
        history.append({"iter": it, "killed": int(len(newly_killed))})
    tables = [a.slice_table.remote(n) for a in actors]
    ray.wait(tables, num_returns=len(tables))
    for a in actors:
        ray.kill(a)
    return KTrussRun(
        edges=rd.from_arrow_refs(tables), iterations=it, history=history
    )


def jaccard_sparsify(
    graph: Graph,
    tau_num: int,
    tau_den: int,
    num_partitions: int | None = None,
    num_buckets: int | None = None,
    broadcast_max: int = 50_000_000,
    edges_simple: bool = False,
    broadcast_max_bytes: int = 256 << 20,
) -> rd.Dataset:
    """Local-similarity graph sparsification (Satuluri et al.): keep
    the canonical edges whose neighborhood Jaccard similarity

        J(u, v) = |N(u) ∩ N(v)| / |N(u) ∪ N(v)|
                = sup / (deg_u + deg_v - 2 - sup)          (simple graph)

    is at least tau_num / tau_den — evaluated as the INTEGER predicate
    ``tau_den * sup >= tau_num * (deg_u + deg_v - 2 - sup)``, so the
    result is bit-exact and SQL-reproducible (no float division).

    Returns (src, dst, sup) for the kept edges. sup is each edge's
    common-neighbor count, one triangle-credit pass
    (``_triangle_edge_credits`` — the k-truss support kernel);
    edges closing no triangle have J = 0 and are dropped (tau > 0 is
    required: a 0 threshold keeps everything and needs no sparsifier).
    Degrees attach via a broadcast vector when n*8 B fits
    ``broadcast_max_bytes`` (one plasma copy, zero joins) and two hash
    joins on the (vid, deg) table beyond it."""
    if tau_num <= 0 or tau_den <= 0:
        raise ValueError("jaccard_sparsify needs a positive tau_num/tau_den")
    from parallel_pagerank_ray.stages.agg import grouped_agg as _gagg
    from parallel_pagerank_ray.util import safe_join as _sjoin

    edges = (
        graph.edges.select_columns(["src", "dst"])
        if edges_simple
        else _simple_undirected(graph.edges)
    ).materialize()
    if num_partitions is None:
        cpus = int(ray.cluster_resources().get("CPU", 8))
        num_partitions = max(8, cpus)
    sup = _triangle_edge_credits(
        graph.n, edges, num_partitions, num_buckets, broadcast_max
    )
    from parallel_pagerank_ray.pipelines.graph_build import undirected_edges

    und = undirected_edges(edges, dedup=False)
    degs = _gagg(
        und.map_batches(
            lambda b: {
                "vid": b["src"],
                "deg": np.ones(len(b["src"]), dtype=np.int64),
            },
            batch_format="numpy",
        ),
        ["vid"],
        {"deg": ("deg", "sum")},
    )
    from parallel_pagerank_ray.util import drop_empty_blocks as _dropz

    if graph.n * 8 <= broadcast_max_bytes:
        # broadcast fast path (the community_stats idiom): one dense
        # degree vector in plasma, zero joins
        deg_vec = np.zeros(graph.n, dtype=np.int64)
        for blk in ray.get(degs.to_arrow_refs()):
            if blk.num_rows:
                deg_vec[blk.column("vid").to_numpy()] = blk.column(
                    "deg"
                ).to_numpy()
        deg_ref = ray.put(deg_vec)

        def keep_bcast(b: dict, p=int(tau_num), q=int(tau_den)) -> dict:
            deg = ray.get(deg_ref)
            sup_ = b["sup"].astype(np.int64)
            s = b["src"].astype(np.int64)
            d = b["dst"].astype(np.int64)
            m = q * sup_ >= p * (deg[s] + deg[d] - 2 - sup_)
            return {"src": s[m], "dst": d[m], "sup": sup_[m]}

        return _dropz(sup.map_batches(keep_bcast, batch_format="numpy"))
    j = _sjoin(
        sup, degs, join_type="inner",
        num_partitions=num_partitions, on=("src",), right_on=("vid",),
    ).rename_columns({"deg": "du"})
    j = _sjoin(
        j.select_columns(["src", "dst", "sup", "du"]),
        degs,
        join_type="inner",
        num_partitions=num_partitions,
        on=("dst",),
        right_on=("vid",),
    ).rename_columns({"deg": "dv"})

    def keep(b: dict, p=int(tau_num), q=int(tau_den)) -> dict:
        sup_ = b["sup"].astype(np.int64)
        du = b["du"].astype(np.int64)
        dv = b["dv"].astype(np.int64)
        m = q * sup_ >= p * (du + dv - 2 - sup_)
        return {
            "src": b["src"][m].astype(np.int64),
            "dst": b["dst"][m].astype(np.int64),
            "sup": sup_[m],
        }

    return _dropz(j.map_batches(keep, batch_format="numpy"))


def trussness_bsp(
    graph: Graph,
    num_parts: int | None = None,
    edges_canonical: bool = False,
) -> KTrussRun:
    """Full truss decomposition: (src, dst, trussness) for every
    canonical edge — trussness(e) = the largest k with e in the
    k-truss (>= 2; triangle-free edges get exactly 2). One incremental
    peeling pass with a RISING threshold on the ktruss_bsp shard
    harness (the truss analogue of kcore's coreness_bsp): peel to the
    fixpoint at k, then k += 1, until no edge survives. Triangles are
    still enumerated ONCE and every (triangle, edge) incidence is
    charged at most once across ALL thresholds — total work stays
    O(T log T) + one O(E_p) scan per threshold step; the threshold
    rises at most (max trussness) times.

    The ``edges`` field of the returned run holds the full
    (src, dst, trussness) table. Matches ``oracle.trussness``."""
    n = graph.n
    if n == 0:
        return KTrussRun(edges=rd.from_items([]), iterations=0)
    if edges_canonical:
        canon = graph.edges
    else:
        canon = _simple_undirected(graph.edges).materialize()
    if num_parts is None:
        cpus = int(ray.cluster_resources().get("CPU", 8))
        num_parts = cap_num_parts(min(256, max(4, cpus)), n)
    from parallel_pagerank_ray.pipelines.triangles import triangle_list

    tri = triangle_list(Graph(n=n, edges=canon), edges_simple=True)
    store = EdgeShardStore.build(
        canon, n=n, num_parts=num_parts, sort_by=["src", "dst"]
    )
    rep_dicts = ray.get(
        [
            _register_replicas.remote(b, store.part_size, n)
            for b in tri.to_arrow_refs()
        ]
    )
    rep_refs: dict[int, list] = {}
    for d in rep_dicts:
        for p, ref in d.items():
            rep_refs.setdefault(p, []).append(ref)
    P = max(1, -(-n // store.part_size))
    per_actor = per_actor_cpus(P)
    actors = [
        _KTrussShard.options(num_cpus=per_actor).remote(
            p,
            store.part_refs.get(p, []),
            rep_refs.get(p, []),
            n,
            store.part_size,
            3,  # starting threshold k=3 (k=2 keeps every edge)
        )
        for p in range(P)
    ]
    it = 0
    k = 3
    history: list[dict] = []
    while True:
        killed_parts = ray.get([a.raise_k.remote(k) for a in actors])
        newly_killed = (
            np.concatenate(killed_parts)
            if killed_parts
            else np.array([], dtype=np.int64)
        )
        history.append({"iter": it, "k": k, "killed": int(len(newly_killed))})
        while len(newly_killed):
            newly_killed.sort()
            ref = ray.put(newly_killed)
            parts = ray.get([a.peel.remote(ref) for a in actors])
            newly_killed = np.concatenate(parts)
            it += 1
            history.append(
                {"iter": it, "k": k, "killed": int(len(newly_killed))}
            )
        if sum(ray.get([a.alive_count.remote() for a in actors])) == 0:
            break
        k += 1
    tables = [a.truss_table.remote(n) for a in actors]
    ray.wait(tables, num_returns=len(tables))
    for a in actors:
        ray.kill(a)
    return KTrussRun(
        edges=rd.from_arrow_refs(tables), iterations=it, history=history
    )
