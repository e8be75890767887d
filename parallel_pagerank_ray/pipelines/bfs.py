"""Multi-source BFS hop distances on the BSP actor harness.

Beyond-reference capability (the reference has no reachability /
shortest-path operator). Frontier-sparse supersteps, the classic
Pregel BFS:

    expand  each shard walks ONLY its local frontier's CSR ranges and
            emits the candidate destination ids (deduplicated locally),
            one plasma put per shard
    absorb  each shard scans the candidate lists, keeps the ids it
            owns that are still unreached, stamps them dist = round,
            and they become its next local frontier

Per-round traffic is O(frontier out-edges), not O(n): every vertex
enters a candidate list only until it is reached, so total exchange
over the whole run is O(E) worst case. Shard state is O(E_p + size)
(its edge slice + its dist slice) — no full-n vectors, any vertex
count fits. Round count = graph eccentricity of the source set.
Integer hop counts are order-independent -> exact at any parallelism;
matches ``oracle.bfs_distances``.
"""

from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np
import ray
import ray.data as rd

from parallel_pagerank_ray.pipelines.graph_build import Graph, undirected_edges
from parallel_pagerank_ray.stages.csr_store import (
    cap_num_parts,
    EdgeShardStore,
    edge_count_hint,
    per_actor_cpus,
    sweep_num_parts,
)


@ray.remote
def _route_seed_block(block, part_size: int) -> dict:
    """Split one (vid,) seed block into per-part plasma arrays — the
    routed seeding path's producer (the _register_block idiom)."""
    if block.num_rows == 0 or "vid" not in block.schema.names:
        return {}
    v = block.column("vid").to_numpy().astype(np.int64)
    parts = v // part_size
    out: dict[int, "ray.ObjectRef"] = {}
    for p in np.unique(parts):
        out[int(p)] = ray.put(np.ascontiguousarray(v[parts == p]))
    return out


@dataclass
class BFSRun:
    distances: rd.Dataset  # (vid, dist) for REACHED vertices only
    iterations: int
    history: list[dict] = field(default_factory=list)


@ray.remote
class _BFSShard:
    def __init__(self, part: int, part_refs: list, n: int, part_size: int) -> None:
        self.base = part * part_size
        self.size = max(0, min(part_size, n - self.base))
        self.part_size = part_size
        if part_refs:
            chunks = ray.get(part_refs)
            src = np.concatenate([c[0] for c in chunks]) - self.base
            dst = np.concatenate([c[1] for c in chunks])
        else:
            src = np.array([], dtype=np.int64)
            dst = np.array([], dtype=np.int64)
        # local CSR by src (EdgeShardStore delivers src-sorted chunks;
        # re-sort defensively only if a caller handed unordered refs)
        if src.size and not bool(np.all(src[1:] >= src[:-1])):
            order = np.argsort(src, kind="stable")
            src = src[order]
            dst = dst[order]
        self.dst_sorted = dst
        self.indptr = np.searchsorted(src, np.arange(self.size + 1, dtype=np.int64))
        self.dist = np.full(self.size, -1, dtype=np.int64)
        self.frontier = np.array([], dtype=np.int64)  # local indices

    def seed(self, sources: np.ndarray) -> int:
        local = sources[(sources >= self.base) & (sources < self.base + self.size)]
        local = local - self.base
        self.dist[local] = 0
        self.frontier = local
        return int(len(local))

    def seed_refs(self, refs: list) -> int:
        """Routed seeding: ``refs`` hold global source ids already
        routed to THIS shard (one plasma array per producing block) —
        the driver never materializes the seed set. Same semantics as
        ``seed``."""
        parts = [c for c in ray.get(list(refs)) if len(c)]
        if not parts:
            self.frontier = np.array([], dtype=np.int64)
            return 0
        src = np.unique(np.concatenate(parts))
        return self.seed(src)

    def expand(self) -> list:
        """Candidate destinations of the local frontier, ROUTED by
        owner shard: ``[(owner_part, ref(ids)), ...]``. Routing keeps
        the absorb-side volume at O(total candidates) across the whole
        exchange — an unrouted broadcast makes every shard concatenate
        every list, O(P x total), which measured pathological at
        P=32 / 10M vertices."""
        f = self.frontier
        if len(f) == 0:
            return []
        lens = self.indptr[f + 1] - self.indptr[f]
        m = lens > 0
        f, lens = f[m], lens[m]
        if len(f) == 0:
            return []
        starts = self.indptr[f]
        csum = np.concatenate(([0], np.cumsum(lens)[:-1]))
        pos = np.arange(int(lens.sum())) - np.repeat(csum, lens) + np.repeat(starts, lens)
        ids = np.unique(self.dst_sorted[pos])
        owners = ids // self.part_size  # sorted, since ids is sorted
        uniq = np.unique(owners)
        bounds = np.searchsorted(owners, uniq, "left").tolist() + [len(ids)]
        return [
            (int(p), ray.put(ids[bounds[i] : bounds[i + 1]]))
            for i, p in enumerate(uniq)
        ]

    def absorb(self, refs: list, depth: int) -> int:
        """Stamp owned, still-unreached candidates with ``depth``; they
        become the next local frontier. Returns how many were reached.
        ``refs`` holds only lists routed to THIS shard; each is sorted
        and in-range by construction."""
        cands = [c for c in ray.get(list(refs)) if len(c)]
        if not cands:
            self.frontier = np.array([], dtype=np.int64)
            return 0
        local = np.unique(np.concatenate(cands)) - self.base
        fresh = local[self.dist[local] < 0]
        self.dist[fresh] = depth
        self.frontier = fresh
        return int(len(fresh))

    def slice_table(self):
        import pyarrow as pa

        reached = np.nonzero(self.dist >= 0)[0]
        return pa.table(
            {"vid": self.base + reached, "dist": self.dist[reached]}
        )

    def reset(self) -> None:
        """Forget all distances (reuse the shard for another seed set —
        the CSR build is the expensive part, the dist vector is not)."""
        self.dist.fill(-1)
        self.frontier = np.array([], dtype=np.int64)

    def snapshot(self) -> None:
        """Stash the current dist slice (one stash per landmark,
        between reset()s — landmark_distances' per-shard columns)."""
        if not hasattr(self, "_snaps"):
            self._snaps = []
        self._snaps.append(self.dist.copy())

    def snapshot_table(self):
        """(vid, d0..d{L-1}) over the local slice from the stashed
        snapshots — the landmark sketch assembles shard-locally, no
        joins, no extra exchange."""
        import pyarrow as pa

        cols = {"vid": self.base + np.arange(self.size, dtype=np.int64)}
        for i, d in enumerate(getattr(self, "_snaps", [])):
            cols[f"d{i}"] = d
        return pa.table(cols)

    def hist(self) -> np.ndarray:
        """Distance histogram over the local slice (index = distance,
        value = count; index 0 counts the seeds). O(ecc) wire size —
        the integer partial behind harmonic centrality's canonical
        sequential fold."""
        reached = self.dist >= 0
        if not reached.any():
            return np.zeros(0, dtype=np.int64)
        return np.bincount(self.dist[reached]).astype(np.int64)

    def far_vertex(self) -> tuple[int, int]:
        """(max local distance, min vid at that distance) — the O(1)
        partial behind the pseudo-diameter double sweep; (-1, -1) when
        nothing local is reached."""
        reached = np.nonzero(self.dist >= 0)[0]
        if not len(reached):
            return (-1, -1)
        dmax = int(self.dist[reached].max())
        at = reached[self.dist[reached] == dmax]
        return (dmax, int(self.base + at.min()))

    def stats(self) -> tuple[int, int, int]:
        """(n_reached, sum_of_distances, max_distance) over the local
        slice — integer partials for closeness/eccentricity, O(1) wire
        size. max_distance is -1 when nothing local is reached."""
        reached = self.dist >= 0
        n = int(reached.sum())
        return (
            n,
            int(self.dist[reached].sum()),
            int(self.dist[reached].max()) if n else -1,
        )


def _run_bfs_rounds(
    actors: list,
    P: int,
    seed_arr: "np.ndarray | None",
    max_depth: int,
    seed_refs: "dict[int, list] | None" = None,
) -> tuple[int, list[dict]]:
    """Seed + expand/absorb rounds to fixpoint over an existing shard
    pool. Shared by single-sweep BFS and the per-seed closeness loop
    (which reuses the pool across seeds — the CSR build dominates, the
    rounds are ~ms). ``seed_refs`` (part -> routed plasma refs) seeds
    without the driver ever holding the source array."""
    if seed_refs is not None:
        total = sum(
            ray.get(
                [
                    actors[p].seed_refs.remote(seed_refs.get(p, []))
                    for p in range(P)
                ]
            )
        )
    else:
        total = sum(ray.get([a.seed.remote(seed_arr) for a in actors]))
    it = 0
    history: list[dict] = [{"iter": 0, "reached": total}]
    while total and it < max_depth:
        it += 1
        routed = ray.get([a.expand.remote() for a in actors])
        inbox: list[list] = [[] for _ in range(P)]
        for row in routed:
            for p, ref in row:
                inbox[p].append(ref)
        total = sum(
            ray.get([actors[p].absorb.remote(inbox[p], it) for p in range(P)])
        )
        history.append({"iter": it, "reached": total})
    if total == 0:
        it -= 1  # the final empty round reached nothing
    return max(it, 0), history


def bfs_distances_bsp(
    graph: Graph,
    sources: "list[int] | None" = None,
    directed: bool = False,
    num_parts: int | None = None,
    max_depth: int = 10_000,
    store: EdgeShardStore | None = None,
    sources_ds: "rd.Dataset | None" = None,
) -> BFSRun:
    """Hop distances from ``sources`` (closest source wins). The
    undirected mode (default) walks the symmetric closure WITHOUT a
    dedup shuffle — BFS is duplicate-invariant, so closure duplicates
    are harmless. A prebuilt ``store`` (holding the matching closure)
    skips the closure + shard shuffle.

    ``sources_ds``: a (vid,) Dataset of seeds ROUTED per shard instead
    of pulled to the driver — the seed path for source sets too large
    to hold in one array (e.g. a giant SCC's members feeding the
    bowtie sweeps). Mutually exclusive with ``sources``."""
    n = graph.n
    if sources is not None and sources_ds is not None:
        raise ValueError("pass sources OR sources_ds, not both")
    if n == 0 or (sources_ds is None and not sources):
        return BFSRun(distances=rd.from_items([]), iterations=0)
    src_arr = None
    if sources_ds is None:
        src_arr = np.unique(np.asarray(sources, dtype=np.int64))
        if src_arr.min() < 0 or src_arr.max() >= n:
            # validate before any store build / actor spawn
            raise ValueError(f"source vid out of range [0, {n})")
    else:
        from parallel_pagerank_ray.stages.agg import global_agg

        # one materialization: the validation scan and the per-part
        # routing below must not each execute a lazy upstream chain
        sources_ds = sources_ds.materialize()
        m = global_agg(
            sources_ds, {"lo": ("vid", "min"), "hi": ("vid", "max")}
        )
        if m["lo"] is None:
            return BFSRun(distances=rd.from_items([]), iterations=0)
        if int(m["lo"]) < 0 or int(m["hi"]) >= n:
            raise ValueError(f"source vid out of range [0, {n})")
    if store is None:
        if num_parts is None:
            # frontier exchange is sparse (no dense per-part vectors):
            # edge-scaled shard count, one per CPU at web scale.
            # Metadata probe only — never execute a lazy chain to size
            # a parallelism knob (it would run again in the build)
            ne = edge_count_hint(graph.edges)
            if ne is None:
                cpus = int(ray.cluster_resources().get("CPU", 8))
                num_parts = cap_num_parts(min(256, max(4, cpus)), n)
            else:
                num_parts = sweep_num_parts(ne if directed else 2 * ne)
        edges = (
            graph.edges if directed else undirected_edges(graph.edges, dedup=False)
        )
        store = EdgeShardStore.build(edges, n=n, num_parts=num_parts)
    P = max(1, -(-n // store.part_size))
    per_actor = per_actor_cpus(P)
    actors = [
        _BFSShard.options(num_cpus=per_actor).remote(
            p, store.part_refs.get(p, []), n, store.part_size
        )
        for p in range(P)
    ]
    if sources_ds is not None:
        dicts = ray.get(
            [
                _route_seed_block.remote(b, store.part_size)
                for b in sources_ds.to_arrow_refs()
            ]
        )
        seed_refs: dict[int, list] = {}
        for d in dicts:
            for p, ref in d.items():
                seed_refs.setdefault(p, []).append(ref)
        it, history = _run_bfs_rounds(
            actors, P, None, max_depth, seed_refs=seed_refs
        )
    else:
        it, history = _run_bfs_rounds(actors, P, src_arr, max_depth)
    tables = [a.slice_table.remote() for a in actors]
    ray.wait(tables, num_returns=len(tables))
    for a in actors:
        ray.kill(a)
    return BFSRun(distances=rd.from_arrow_refs(tables), iterations=it, history=history)


def shortest_path_trace(
    graph: Graph,
    source: int = 0,
    target: int | None = None,
    broadcast_max: int = 50_000_000,
) -> rd.Dataset:
    """One explicit shortest path source -> target over the undirected
    closure, reconstructed by the deterministic MIN-PARENT rule:
    parent(v) = min{ u ~ v : dist(u) = dist(v) - 1 }. ``target=None``
    picks the farthest reachable vertex (max dist, tie -> smallest
    vid). Output (pos, vid, dist): pos 0 = source, pos d = target.

    The "show me the route" companion to the distance map (navigation,
    provenance chains, why-is-this-page-reachable). Scale shape: one
    BFS (frontier-sparse BSP), then ONE stateless pass over the
    closure with the broadcast distance vector emitting candidate
    parents + one bucketed grouped min; the backtrack is a <= ecc-step
    driver walk over the broadcast parent array. Shares the BSP
    engines' dense per-vertex vector envelope (``broadcast_max``
    guards the two n-sized pulls)."""
    import pyarrow as pa

    from parallel_pagerank_ray.pipelines.graph_build import undirected_edges
    from parallel_pagerank_ray.stages.agg import grouped_agg

    n = graph.n
    if n == 0:
        return rd.from_items([])
    if n > broadcast_max:
        raise ValueError(
            "shortest_path_trace: n exceeds broadcast_max — raise the "
            "guard (the trace needs one dense dist vector, the same "
            "envelope as the BSP engines)"
        )
    run = bfs_distances_bsp(graph, [int(source)])
    dist_df = run.distances.to_pandas()
    dist = np.full(n, -1, dtype=np.int64)
    dist[dist_df["vid"].to_numpy()] = dist_df["dist"].to_numpy()
    reached = dist >= 0
    if target is None:
        dmax = dist[reached].max()
        target = int(np.nonzero(reached & (dist == dmax))[0].min())
    t = int(target)
    if not reached[t]:
        raise ValueError(f"target {t} unreachable from {source}")
    dist_ref = ray.put(dist)

    def cand(b: dict[str, np.ndarray]) -> dict[str, np.ndarray]:
        d = ray.get(dist_ref)
        src, dst = b["src"], b["dst"]
        ok = (d[src] >= 0) & (d[dst] >= 0) & (d[src] + 1 == d[dst])
        return {"v": dst[ok], "p": src[ok]}

    par_df = grouped_agg(
        undirected_edges(graph.edges, dedup=False).map_batches(
            cand, batch_format="numpy"
        ),
        ["v"],
        {"p": ("p", "min")},
    ).to_pandas()
    par = np.full(n, -1, dtype=np.int64)
    par[par_df["v"].to_numpy()] = par_df["p"].to_numpy()
    path = [t]
    cur = t
    while cur != int(source):
        cur = int(par[cur])
        path.append(cur)
    path.reverse()
    pv = np.array(path, dtype=np.int64)
    return rd.from_arrow(
        pa.table(
            {
                "pos": np.arange(len(pv), dtype=np.int64),
                "vid": pv,
                "dist": dist[pv],
            }
        )
    )


def landmark_distances(
    graph: Graph,
    landmarks: list[int],
    store: EdgeShardStore | None = None,
    num_parts: int | None = None,
    max_depth: int = 10_000,
) -> rd.Dataset:
    """Per-vertex hop distances to a panel of landmark vertices —
    the landmark/pivot distance sketch (Potamias et al.'s landmark
    embedding): d(u, v) is later estimated in O(|L|) by
    min_l d(u, l) + d(l, v) without touching the graph.

    One frontier-sparse BFS per landmark over ONE shared shard pool
    (the CSR build is the expensive part; reset() between landmarks is
    O(size)); each shard stashes its dist slice per landmark and emits
    the final (vid, d0..d{L-1}) table locally — no joins, no exchange
    beyond the BFS frontiers themselves. -1 = unreachable. Integer
    hops -> exact at any parallelism.

    Scale: L is small by contract (4-16); state is O(E_p + L*size) per
    shard; total traffic L * O(E) worst case.
    """
    import pyarrow as pa

    n = graph.n
    cols = ["vid"] + [f"d{i}" for i in range(len(landmarks))]
    if n == 0 or not landmarks:
        return rd.from_arrow(
            pa.table({c: pa.array([], pa.int64()) for c in cols})
        )
    marks = [int(l) for l in landmarks]
    if min(marks) < 0 or max(marks) >= n:
        raise ValueError(f"landmark vid out of range [0, {n})")
    if store is None:
        ne = edge_count_hint(graph.edges)
        if num_parts is None:
            num_parts = (
                sweep_num_parts(2 * ne)
                if ne is not None
                else cap_num_parts(8, n)
            )
        und = undirected_edges(graph.edges, dedup=False)
        store = EdgeShardStore.build(und, n=n, num_parts=num_parts)
    P = max(1, -(-n // store.part_size))
    per_actor = per_actor_cpus(P)
    actors = [
        _BFSShard.options(num_cpus=per_actor).remote(
            p, store.part_refs.get(p, []), n, store.part_size
        )
        for p in range(P)
    ]
    for i, l in enumerate(marks):
        if i:
            ray.get([a.reset.remote() for a in actors])
        _run_bfs_rounds(actors, P, np.array([l], dtype=np.int64), max_depth)
        ray.get([a.snapshot.remote() for a in actors])
    tables = [a.snapshot_table.remote() for a in actors]
    ray.wait(tables, num_returns=len(tables))
    for a in actors:
        ray.kill(a)
    return rd.from_arrow_refs(tables)
