"""Deterministic second-order (node2vec-style) biased walks.

Beyond-reference capability, extending pipelines/random_walk.py's
first-order corpus generator: node2vec (Grover & Leskovec, KDD 2016)
biases each step by the PREVIOUS vertex — from v having arrived from u,
a candidate neighbor x of v is weighted

    w_return  if x == u            (node2vec alpha = 1/p)
    w_inout   if x in N(u)         (alpha = 1, distance-1 from u)
    w_far     otherwise            (alpha = 1/q, distance-2 from u)

with INTEGER weights (scale the 1/p, 1, 1/q ratios to integers), so the
cumulative-weight slot pick stays exact: r = H(seed, widx, step, v, u)
mod W, move to the first dst-ascending neighbor whose cumulative bias
weight exceeds r. The hash mixes the first-order walk hash with the
previous vertex (one more affine round + squaring mod 2^31-1; every
intermediate < 2^62, so the same arithmetic runs in DuckDB BIGINT and
the corpus is a pure graph function — identical at any parallelism).

Scale shape — the reason this is TWO routed exchanges per step: the
bias needs both N(v) (candidates) and N(u) (distance-1 membership),
which live on different shards. Real node2vec implementations
pre-build per-edge alias tables of total size O(sum_v deg(v)^2) —
impossible at web scale. Instead each step routes (walk, u,
candidates=N(v)) from v's owner to u's owner, which answers the
membership query with one searchsorted against its sorted (src * n +
dst) edge keys, draws the slot, and routes the walk to the next
vertex's owner. Per-step traffic is O(sum deg(v) over active walks) —
the information-theoretic minimum for exact second-order bias without
precomputed tables. Step 0 defines prev = seed: no candidate equals
prev (simple graph) and every candidate is in N(prev) = N(v), so the
first hop is the uniform slot pick over equal w_inout weights.
"""

from __future__ import annotations

import numpy as np
import ray
import ray.data as rd

from parallel_pagerank_ray.pipelines.graph_build import Graph, undirected_edges
from parallel_pagerank_ray.pipelines.random_walk import salt64, walk_hash, WalkRun
from parallel_pagerank_ray.stages.csr_store import (
    cap_num_parts,
    EdgeShardStore,
    per_actor_cpus,
)

_P31 = np.uint64(2147483647)


def node2vec_hash(
    s64: int,
    seed: np.ndarray,
    widx: np.ndarray,
    step: int,
    vid: np.ndarray,
    prev: np.ndarray,
) -> np.ndarray:
    """First-order walk hash mixed with the previous vertex: one more
    affine round + squaring mod 2^31-1 (intermediates < 2^62)."""
    h = walk_hash(s64, seed, widx, step, vid)
    h = (h * np.uint64(31) + prev.astype(np.uint64) % _P31) % _P31
    return (h * h + h) % _P31


@ray.remote
class _N2VShard:
    def __init__(self, part: int, part_refs: list, n: int, part_size: int,
                 s64: int, w_return: int, w_inout: int, w_far: int) -> None:
        self.base = part * part_size
        self.size = max(0, min(part_size, n - self.base))
        self.part_size = part_size
        self.n = n
        self.s64 = s64
        self.w = (np.int64(w_return), np.int64(w_inout), np.int64(w_far))
        if part_refs:
            chunks = ray.get(part_refs)
            src = np.concatenate([c[0] for c in chunks]) - self.base
            dst = np.concatenate([c[1] for c in chunks])
        else:
            src = np.array([], dtype=np.int64)
            dst = np.array([], dtype=np.int64)
        if src.size:
            lex_ok = bool(
                np.all(
                    (src[1:] > src[:-1])
                    | ((src[1:] == src[:-1]) & (dst[1:] >= dst[:-1]))
                )
            )
            if not lex_ok:
                order = np.lexsort((dst, src))
                src, dst = src[order], dst[order]
        self.dst = dst
        self.indptr = np.searchsorted(src, np.arange(self.size + 1, dtype=np.int64))
        # sorted membership keys for the distance-1 test: (u, x) is an
        # edge iff (u - base) * n + x is present (lexsort makes the key
        # array sorted by construction)
        self.keys = src * np.int64(n) + dst
        self._rows: list[tuple] = []

    def _flatten(self, lo: np.ndarray, lens: np.ndarray) -> np.ndarray:
        csum = np.concatenate(([0], np.cumsum(lens)[:-1]))
        return (
            np.arange(int(lens.sum())) - np.repeat(csum, lens) + np.repeat(lo, lens)
        )

    def record_and_query(self, refs: list, step: int, last: bool) -> list:
        """Phase A at v's owner: record the walk rows at ``step``; if
        not last, enumerate N(v) per walk and route (walk, prev,
        candidates) to prev's owner."""
        inbox = [c for c in ray.get(list(refs)) if len(c[0])]
        if not inbox:
            return []
        seed = np.concatenate([c[0] for c in inbox])
        widx = np.concatenate([c[1] for c in inbox])
        v = np.concatenate([c[2] for c in inbox])
        prev = np.concatenate([c[3] for c in inbox])
        self._rows.append((seed, widx, np.full(len(v), step, dtype=np.int64), v))
        if last:
            return []
        local = v - self.base
        lo = self.indptr[local]
        deg = self.indptr[local + 1] - lo
        alive = deg > 0
        if not alive.any():
            return []
        seed, widx, v, prev = seed[alive], widx[alive], v[alive], prev[alive]
        lo, deg = lo[alive], deg[alive]
        owners = prev // self.part_size
        order = np.argsort(owners, kind="stable")
        seed, widx, v, prev = seed[order], widx[order], v[order], prev[order]
        lo, deg, owners = lo[order], deg[order], owners[order]
        flat = self.dst[self._flatten(lo, deg)]
        walk_bounds = np.concatenate(([0], np.cumsum(deg)))
        uniq, starts = np.unique(owners, return_index=True)
        starts = starts.tolist() + [len(v)]
        return [
            (
                int(pown),
                ray.put(
                    (
                        seed[starts[i] : starts[i + 1]],
                        widx[starts[i] : starts[i + 1]],
                        v[starts[i] : starts[i + 1]],
                        prev[starts[i] : starts[i + 1]],
                        deg[starts[i] : starts[i + 1]],
                        flat[walk_bounds[starts[i]] : walk_bounds[starts[i + 1]]],
                    )
                ),
            )
            for i, pown in enumerate(uniq)
        ]

    def score_and_advance(self, refs: list, step: int) -> list:
        """Phase B at prev's owner: distance-1 membership against the
        local edge keys, bias weights, slot draw, route each walk to
        its next vertex's owner."""
        inbox = [c for c in ray.get(list(refs)) if len(c[0])]
        if not inbox:
            return []
        seed = np.concatenate([c[0] for c in inbox])
        widx = np.concatenate([c[1] for c in inbox])
        v = np.concatenate([c[2] for c in inbox])
        prev = np.concatenate([c[3] for c in inbox])
        deg = np.concatenate([c[4] for c in inbox])
        cand = np.concatenate([c[5] for c in inbox])
        w_ret, w_in, w_far = self.w
        prev_rep = np.repeat(prev, deg)
        qkey = (prev_rep - self.base) * np.int64(self.n) + cand
        pos = np.searchsorted(self.keys, qkey)
        ok = pos < len(self.keys)
        member = np.zeros(len(cand), dtype=bool)
        member[ok] = self.keys[pos[ok]] == qkey[ok]
        bw = np.where(
            cand == prev_rep, w_ret, np.where(member, w_in, w_far)
        ).astype(np.int64)
        cw = np.cumsum(bw)
        offs = np.concatenate(([0], np.cumsum(deg)[:-1]))
        base_prev = np.where(offs > 0, cw[offs - 1], 0)
        tot = cw[offs + deg - 1] - base_prev
        h = node2vec_hash(self.s64, seed, widx, step + 1, v, prev)
        r = (h % tot.astype(np.uint64)).astype(np.int64)
        pick = np.searchsorted(cw, base_prev + r, side="right")
        nxt = cand[pick]
        owners = nxt // self.part_size
        order = np.argsort(owners, kind="stable")
        seed, widx, nxt, v, owners = (
            seed[order], widx[order], nxt[order], v[order], owners[order]
        )
        uniq, starts = np.unique(owners, return_index=True)
        starts = starts.tolist() + [len(nxt)]
        return [
            (
                int(pown),
                ray.put(
                    (
                        seed[starts[i] : starts[i + 1]],
                        widx[starts[i] : starts[i + 1]],
                        nxt[starts[i] : starts[i + 1]],
                        v[starts[i] : starts[i + 1]],
                    )
                ),
            )
            for i, pown in enumerate(uniq)
        ]

    def table(self):
        import pyarrow as pa

        if not self._rows:
            return pa.table(
                {
                    "seed": pa.array([], type=pa.int64()),
                    "widx": pa.array([], type=pa.int64()),
                    "step": pa.array([], type=pa.int64()),
                    "vid": pa.array([], type=pa.int64()),
                }
            )
        return pa.table(
            {
                "seed": np.concatenate([r[0] for r in self._rows]),
                "widx": np.concatenate([r[1] for r in self._rows]),
                "step": np.concatenate([r[2] for r in self._rows]),
                "vid": np.concatenate([r[3] for r in self._rows]),
            }
        )


def node2vec_walks_bsp(
    graph: Graph,
    seeds: list[int],
    walks_per_seed: int = 4,
    length: int = 8,
    w_return: int = 1,
    w_inout: int = 4,
    w_far: int = 2,
    salt: str = "n2v",
    num_parts: int | None = None,
    edges_canonical: bool = False,
) -> WalkRun:
    """Second-order biased walks over the SIMPLE undirected closure of
    ``graph.edges``. The integer bias weights encode node2vec's
    (1/p, 1, 1/q): the defaults (1, 4, 2) are p=4, q=2 — homophilic
    (BFS-ish) exploration. All three weights must be >= 1 so every
    walk's total slot weight is positive."""
    n = graph.n
    if n == 0 or not seeds or walks_per_seed <= 0:
        return WalkRun(walks=rd.from_items([]), iterations=0)
    if min(w_return, w_inout, w_far) < 1:
        raise ValueError("bias weights must be integers >= 1")
    seed_arr = np.asarray([int(s) for s in seeds], dtype=np.int64)
    if seed_arr.min() < 0 or seed_arr.max() >= n:
        raise ValueError(f"seed vid out of range [0, {n})")
    if length < 0:
        raise ValueError("length must be >= 0")
    if num_parts is None:
        cpus = int(ray.cluster_resources().get("CPU", 8))
        num_parts = cap_num_parts(min(256, max(4, cpus)), n)
    if edges_canonical:
        canon = graph.edges
    else:
        from parallel_pagerank_ray.pipelines.triangles import _simple_undirected

        canon = _simple_undirected(graph.edges)
    simple = undirected_edges(canon, dedup=False)
    store = EdgeShardStore.build(
        simple, n=n, num_parts=num_parts, sort_by=["src", "dst"]
    )
    P = max(1, -(-n // store.part_size))
    per_actor = per_actor_cpus(P)
    s64 = salt64(salt)
    actors = [
        _N2VShard.options(num_cpus=per_actor).remote(
            p, store.part_refs.get(p, []), n, store.part_size, s64,
            int(w_return), int(w_inout), int(w_far),
        )
        for p in range(P)
    ]
    # initial routed positions: every (seed, widx) at the seed, prev =
    # seed (step-0 convention documented in the module docstring)
    seeds_rep = np.repeat(seed_arr, walks_per_seed)
    widx = np.tile(np.arange(walks_per_seed, dtype=np.int64), len(seed_arr))
    owners = seeds_rep // store.part_size
    inbox: list[list] = [[] for _ in range(P)]
    order = np.argsort(owners, kind="stable")
    s_o, w_o, own_o = seeds_rep[order], widx[order], owners[order]
    uniq, starts = np.unique(own_o, return_index=True)
    starts = starts.tolist() + [len(s_o)]
    for i, pown in enumerate(uniq):
        sl = slice(starts[i], starts[i + 1])
        inbox[int(pown)].append(
            ray.put((s_o[sl], w_o[sl], s_o[sl], s_o[sl]))
        )
    history: list[dict] = []
    for step in range(length + 1):
        last = step == length
        routed_q = ray.get(
            [
                actors[p].record_and_query.remote(inbox[p], step, last)
                for p in range(P)
            ]
        )
        if last:
            break
        qbox: list[list] = [[] for _ in range(P)]
        n_q = 0
        for row in routed_q:
            for p, ref in row:
                qbox[p].append(ref)
                n_q += 1
        if n_q == 0:
            break  # every walk is stranded on a degree-0 vertex
        routed_w = ray.get(
            [actors[p].score_and_advance.remote(qbox[p], step) for p in range(P)]
        )
        inbox = [[] for _ in range(P)]
        for row in routed_w:
            for p, ref in row:
                inbox[p].append(ref)
        history.append({"step": step, "buckets": n_q})
    tables = [a.table.remote() for a in actors]
    ray.wait(tables, num_returns=len(tables))
    for a in actors:
        ray.kill(a)
    return WalkRun(
        walks=rd.from_arrow_refs(tables), iterations=length, history=history
    )
