"""Time-respecting (temporal) reachability over timestamped edges.

Beyond-reference capability: the reference's graph is static; a crawl
corpus is not — every link carries the capture time of the page it
was observed on. A temporal path must respect time (Wu et al., "Path
Problems in Temporal Graphs", VLDB 2014): edge (u, v, t) is
traversable only if the walker reached u by time t, and arrival at v
is then t itself. ``earliest_arrival_bsp`` computes the earliest
arrival time at every vertex from a source set — "when could
information first have propagated here through the crawl graph".

Same frontier-relaxation BSP shape as pipelines/sssp.py (routed
sparse exchange, min-combine per destination), with the relaxation
rule swapped:

    SSSP      cand(v) = arr(u) + w(u,v)      for every edge of u
    temporal  cand(v) = t(u,v)               only where t >= arr(u)

Lowering arr(u) only ever ENLARGES the eligible edge set (t >= arr is
monotone in arr), so re-expanding every eligible edge of each improved
vertex is a correct monotone min-relaxation: integer arrival times,
min is order-independent -> exact at any parallelism, rounds bounded
by the longest temporal path's hop count. Shard state is
O(E_p + size); per-round traffic is O(frontier out-edges).
"""

from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np
import ray
import ray.data as rd

from parallel_pagerank_ray.stages.csr_store import (
    cap_num_parts,
    EdgeShardStore,
    int_weights,
    per_actor_cpus,
)

_INF = np.iinfo(np.int64).max


@dataclass
class TemporalRun:
    arrivals: rd.Dataset  # (vid, arrival) for REACHED vertices only
    iterations: int
    history: list[dict] = field(default_factory=list)


@ray.remote
class _TemporalShard:
    def __init__(self, part: int, part_refs: list, n: int, part_size: int) -> None:
        self.base = part * part_size
        self.size = max(0, min(part_size, n - self.base))
        self.part_size = part_size
        if part_refs:
            chunks = ray.get(part_refs)
            src = np.concatenate([c[0] for c in chunks]) - self.base
            dst = np.concatenate([c[1] for c in chunks])
            if len(chunks[0]) < 3:
                raise ValueError(
                    "temporal reachability needs a timestamped edge "
                    "store (t in the w column)"
                )
            t = int_weights(np.concatenate([c[2] for c in chunks]), min_value=0)
        else:
            src = np.array([], dtype=np.int64)
            dst = np.array([], dtype=np.int64)
            t = np.array([], dtype=np.int64)
        # local CSR by src (store delivers src-sorted chunks)
        if src.size and not bool(np.all(src[1:] >= src[:-1])):
            order = np.argsort(src, kind="stable")
            src, dst, t = src[order], dst[order], t[order]
        self.dst_sorted = dst
        self.t_sorted = t
        self.indptr = np.searchsorted(src, np.arange(self.size + 1, dtype=np.int64))
        self.arr = np.full(self.size, _INF, dtype=np.int64)
        self.frontier = np.array([], dtype=np.int64)  # local indices

    def seed(self, sources: np.ndarray, t0: int) -> int:
        local = sources[(sources >= self.base) & (sources < self.base + self.size)]
        local = local - self.base
        self.arr[local] = t0
        self.frontier = local
        return int(len(local))

    def expand(self) -> list:
        """Eligible-edge candidates (dst, t) of the local frontier
        (t >= arr(src) — time-respecting), min-combined per dst and
        ROUTED by owner shard."""
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
        ok = self.t_sorted[pos] >= np.repeat(self.arr[f], lens)
        pos = pos[ok]
        if not len(pos):
            return []
        cand_t = self.t_sorted[pos]
        cand_v = self.dst_sorted[pos]
        ids, inv = np.unique(cand_v, return_inverse=True)
        best = np.full(len(ids), _INF, dtype=np.int64)
        np.minimum.at(best, inv, cand_t)
        owners = ids // self.part_size  # sorted (ids is sorted)
        uniq = np.unique(owners)
        bounds = np.searchsorted(owners, uniq, "left").tolist() + [len(ids)]
        return [
            (int(p), ray.put((ids[bounds[i] : bounds[i + 1]],
                              best[bounds[i] : bounds[i + 1]])))
            for i, p in enumerate(uniq)
        ]

    def absorb(self, refs: list) -> int:
        pairs = [p for p in ray.get(list(refs)) if len(p[0])]
        if not pairs:
            self.frontier = np.array([], dtype=np.int64)
            return 0
        ids = np.concatenate([p[0] for p in pairs]) - self.base
        vals = np.concatenate([p[1] for p in pairs])
        cur = self.arr.copy()
        np.minimum.at(self.arr, ids, vals)
        improved = np.nonzero(self.arr < cur)[0]
        self.frontier = improved
        return int(len(improved))

    def slice_table(self):
        import pyarrow as pa

        reached = np.nonzero(self.arr < _INF)[0]
        return pa.table(
            {"vid": self.base + reached, "arrival": self.arr[reached]}
        )


def earliest_arrival_bsp(
    edges: rd.Dataset,
    n: int,
    sources: list[int],
    t0: int = 0,
    num_parts: int | None = None,
    max_rounds: int = 100_000,
    store: EdgeShardStore | None = None,
) -> TemporalRun:
    """Earliest arrival time at every vertex from ``sources`` (start
    time ``t0``) over a temporal edge table (src, dst, w=t) with
    integer edge timestamps. Edges are taken as-is (directed)."""
    if n == 0 or not sources:
        return TemporalRun(arrivals=rd.from_items([]), iterations=0)
    src_arr = np.unique(np.asarray(sources, dtype=np.int64))
    if src_arr.min() < 0 or src_arr.max() >= n:
        raise ValueError(f"source vid out of range [0, {n})")
    if store is None:
        try:
            names = edges.schema().names
        except Exception:  # pragma: no cover - schema probe best effort
            names = []
        if "w" not in (names or []):
            raise ValueError(
                "temporal reachability needs edge timestamps in the w "
                "column of the edge table"
            )
        if num_parts is None:
            cpus = int(ray.cluster_resources().get("CPU", 8))
            num_parts = cap_num_parts(min(256, max(4, cpus)), n)
        store = EdgeShardStore.build(edges, n=n, num_parts=num_parts)
    P = max(1, -(-n // store.part_size))
    per_actor = per_actor_cpus(P)
    actors = [
        _TemporalShard.options(num_cpus=per_actor).remote(
            p, store.part_refs.get(p, []), n, store.part_size
        )
        for p in range(P)
    ]
    total = sum(ray.get([a.seed.remote(src_arr, int(t0)) for a in actors]))
    it = 0
    history: list[dict] = [{"iter": 0, "improved": total}]
    while total and it < max_rounds:
        it += 1
        routed = ray.get([a.expand.remote() for a in actors])
        inbox: list[list] = [[] for _ in range(P)]
        for row in routed:
            for p, ref in row:
                inbox[p].append(ref)
        total = sum(
            ray.get([actors[p].absorb.remote(inbox[p]) for p in range(P)])
        )
        history.append({"iter": it, "improved": total})
    if total == 0:
        it -= 1  # the final round improved nothing
    tables = [a.slice_table.remote() for a in actors]
    ray.wait(tables, num_returns=len(tables))
    for a in actors:
        ray.kill(a)
    return TemporalRun(
        arrivals=rd.from_arrow_refs(tables), iterations=max(it, 0), history=history
    )


def latest_departure_bsp(
    edges: rd.Dataset,
    n: int,
    targets: list[int],
    horizon: int,
    num_parts: int | None = None,
    max_rounds: int = 100_000,
) -> TemporalRun:
    """Latest departure time from every vertex that can still reach
    ``targets`` by ``horizon`` through a time-respecting path (the dual
    of earliest arrival in Wu et al.): edge (u, v, t) is usable leaving
    u at time t only if t <= ld(v), and then ld(u) >= t.

    Implemented as a pure REDUCTION onto ``earliest_arrival_bsp`` on
    the reversed edge table with clock flipped around the horizon
    (t' = horizon - t): eligibility t' >= arr'(v) <=> t <= ld(v), and
    min-combining t' is max-combining t. Edges captured after the
    horizon (t' < 0) are unusable and filtered before the store build,
    so the shard validator's nonnegative-timestamp contract holds.
    Output column ``departure`` = horizon - arrival'; a row means the
    vertex can reach a target in time. Integer max-relaxation -> exact
    at any parallelism."""
    if n == 0 or not targets:
        return TemporalRun(arrivals=rd.from_items([]), iterations=0)
    hz = int(horizon)

    def flip(t):
        import pyarrow as pa
        import pyarrow.compute as pc

        w = t.column("w")
        keep = pc.less_equal(w, pa.scalar(float(hz), type=w.type))
        t = t.filter(keep)
        return pa.table(
            {
                "src": t.column("dst"),
                "dst": t.column("src"),
                "w": pc.subtract(pa.scalar(float(hz), type=w.type), t.column("w")),
            }
        )

    rev = edges.map_batches(flip, batch_format="pyarrow")
    run = earliest_arrival_bsp(
        rev, n, sources=targets, t0=0, num_parts=num_parts, max_rounds=max_rounds
    )

    def unflip(t):
        import pyarrow as pa
        import pyarrow.compute as pc

        arr = t.column("arrival")
        return pa.table(
            {
                "vid": t.column("vid"),
                "departure": pc.subtract(pa.scalar(hz, type=arr.type), arr),
            }
        )

    return TemporalRun(
        arrivals=run.arrivals.map_batches(unflip, batch_format="pyarrow"),
        iterations=run.iterations,
        history=run.history,
    )
