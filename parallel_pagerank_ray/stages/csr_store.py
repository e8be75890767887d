"""CSR edge shards in the Ray object store + scatter actor stages.

The reference broadcasts the FULL CSR graph to every MPI rank
(/root/reference/pagerank_mpi/pagerank_mpi.c:404-415) — O(N+E) memory per
process, its real scalability ceiling. Here the edge table is sharded by
source-vertex range (``part = src // part_size``); each shard is a pair
of src-sorted int64 arrays placed in the object store ONCE
(``ray.put`` per part). Scatter stages are actor pools
(``map_batches(Cls, concurrency=...)``) that lazily ``ray.get`` only the
shards their batches touch — plasma shares one physical copy per node
across all actors, so nothing is replicated per worker.

Execution mode: the scatter stages are plain callables. Passed as an
INSTANCE to ``map_batches`` they run as stateless tasks — Ray Data
re-creates actor pools on every execution, so for an iterative driver
loop (one execution per superstep) tasks are ~8x lower latency than a
``map_batches(Cls, concurrency=...)`` actor pool, while the per-worker
module-level shard cache below gives the same load-once-per-process
behavior an actor's ``__init__`` would. Passing the CLASS with
``fn_constructor_kwargs={"store": store}`` still works for long
single-execution pipelines.

Skew handling (north rule: explicit high-degree-hub splitting):
``_iter_adj`` walks a batch's adjacency in bounded-size chunks of edge
positions, so a hub with any out-degree is processed as several
fixed-size slices whose per-edge contribution ``rank/deg`` is unchanged
(arithmetic-neutral). Each chunk is locally combined per destination
(np.unique + bincount) before it enters the gather shuffle — the
map-side combine that caps a hot destination at one row per chunk.
"""

from __future__ import annotations

import math
from dataclasses import dataclass, field
from typing import Iterator

import numpy as np
import ray
import ray.data as rd

INT64_MAX = np.iinfo(np.int64).max


@ray.remote
def _register_block(block, part_size: int) -> dict[int, "ray.ObjectRef"]:
    """Split one src-sorted Arrow block into per-part arrays; put each.
    A ``w`` column (edge weights) rides along as a third array when the
    block has one — consumers detect weighted chunks by tuple length."""
    if block.num_rows == 0 or "src" not in block.schema.names:
        return {}
    src = block.column("src").to_numpy()
    dst = block.column("dst").to_numpy()
    w = (
        block.column("w").to_numpy().astype(np.float64)
        if "w" in block.schema.names
        else None
    )
    parts = src // part_size
    out: dict[int, ray.ObjectRef] = {}
    for p in np.unique(parts):
        m = parts == p
        arrs = (np.ascontiguousarray(src[m]), np.ascontiguousarray(dst[m]))
        if w is not None:
            arrs = arrs + (np.ascontiguousarray(w[m]),)
        out[int(p)] = ray.put(arrs)
    return out


@dataclass
class EdgeShardStore:
    """Handle to the sharded edge table: per-part object refs.

    ``part_refs[p]`` is an ordered list of refs; concatenating their
    arrays yields the part's edges sorted by src (block order from the
    global sort is preserved at build).
    """

    n: int
    part_size: int
    num_edges: int
    part_refs: dict[int, list] = field(default_factory=dict)

    @classmethod
    def build(
        cls,
        edges: rd.Dataset,
        n: int,
        num_parts: int,
        sort_by: str | list[str] = "src",
    ) -> "EdgeShardStore":
        """Routing is ALWAYS by src part; ``sort_by`` only fixes the
        order WITHIN each part's concatenated chunks. "src" (default)
        yields the CSR layout the scatter stages binary-search;
        "dst" yields dst-sorted shards for consumers that index by
        destination (k-core's decrement lookup); ["src", "dst"] yields
        rank-indexable adjacency lists (random walks) — same one
        all-to-all sort either way, no per-shard re-sort afterwards."""
        num_parts = max(1, num_parts)
        part_size = max(1, math.ceil(n / num_parts))
        sorted_edges = edges.sort(sort_by).materialize()
        num_edges = sorted_edges.count()
        block_refs = sorted_edges.to_arrow_refs()
        dicts = ray.get(
            [_register_block.remote(b, part_size) for b in block_refs]
        )
        part_refs: dict[int, list] = {}
        for d in dicts:  # block order == global src order
            for p, ref in d.items():
                part_refs.setdefault(p, []).append(ref)
        return cls(n=n, part_size=part_size, num_edges=num_edges, part_refs=part_refs)


# Per-worker-process cache of concatenated multi-chunk shards, keyed by the
# chunk refs. Worker processes are reused across tasks and executions, so
# this persists across supersteps (actor-like amortization without actors).
# Single-chunk shards are returned as zero-copy plasma views and need no
# caching (ray.get of a local object is a hash lookup).
_CONCAT_CACHE: dict[tuple, tuple[np.ndarray, np.ndarray]] = {}
_CONCAT_CACHE_MAX_EDGES = 1 << 27  # ~2 GiB of int64 pairs per worker process


def edge_count_hint(ds) -> "int | None":
    """Metadata-only row-count probe (None when unknown). Sizing a
    shard pool must NEVER execute a lazy pipeline just to pick a
    parallelism knob — ``Dataset.count()`` on an unmaterialized chain
    runs the whole upstream once, and the store build then runs it
    again."""
    try:
        n = ds._logical_plan.dag.infer_metadata().num_rows
    except Exception:
        return None
    return int(n) if n is not None else None


def sweep_num_parts(num_edges: int, edges_per_part: int = 2_000_000) -> int:
    """Shard count for sparse-frontier sweep engines (BFS / closeness /
    sigma / betweenness): scale with EDGES, capped at one shard per
    CPU. At web scale this is one-per-CPU (the per-shard init argsort
    dominates and parallelizes); at bench scale it avoids paying ~45 ms
    of actor-process startup per shard for shards holding a few
    thousand edges each — 32 actors cost ~1.4 s to spawn, the sweeps
    themselves run in ~0.5 s. Results are shard-count-invariant for
    every consumer (integer sweeps; betweenness uses the canonical
    global fold order), so this is a latency knob only."""
    cpus = int(ray.cluster_resources().get("CPU", 8))
    return int(min(256, max(2, cpus), max(4, num_edges // edges_per_part + 1)))


def cap_num_parts(num_parts: int, n: int, min_part: int = 16384) -> int:
    """Cap a BSP engine's shard count by VERTEX range: never more than
    ceil(n / min_part) shards. Each BSP round is a full actor
    round-trip, so a 2k-vertex graph split over 32 shards pays 32× the
    per-round sync cost (and 32 actor spawns) for no compute win; at
    16k+ vertices per shard a 10M-vertex graph keeps one shard per CPU
    unchanged. Results are partition-invariant for every BSP consumer
    — this is a latency knob only."""
    return int(min(num_parts, max(1, -(-n // min_part))))


def int_weights(w: "np.ndarray", min_value: int = 1) -> "np.ndarray":
    """Validate-then-cast edge weights to int64 (>= ``min_value``;
    default positive).

    The engine's integer-weight contract (weighted SSSP/LPA/walks) must
    REJECT non-integer float weights, not silently truncate them:
    ``astype(np.int64)`` turns w=2.7 into 2 and quietly changes
    shortest-path distances / vote masses. Mirrors _WalkShard's rint
    round-trip; integer inputs skip the float check. ``not (wi >= m)``
    (rather than ``min < m``) also catches NaN from parquet nulls.
    ``min_value=0`` admits epoch-offset edge timestamps (temporal
    reachability), where 0 is a legal capture time."""
    import numpy as np

    msg = (
        "edge weights must be positive integers"
        if min_value == 1
        else f"edge weights must be integers >= {min_value}"
    )
    if np.issubdtype(w.dtype, np.floating):
        wi = np.rint(w).astype(np.int64)
        if not np.array_equal(wi.astype(np.float64), w):
            raise ValueError(msg)
    else:
        wi = w.astype(np.int64)
    if len(wi) and not bool((wi >= min_value).all()):
        raise ValueError(msg)
    return wi


def per_actor_cpus(num_parts: int) -> float:
    """Fractional CPU reservation per BSP shard actor, FLOORED so that
    ``num_parts * per_actor <= cpus - 1``: long-lived actors reserving
    every CPU deadlock any plain Ray task (``rd.from_arrow_refs``
    schedules a 1-CPU metadata task), and rounding UP (e.g.
    7/16 -> 0.44, total 7.04 of 7) reopens that window. One definition
    shared by every BSP engine (pagerank/components/labelprop/kcore/
    bfs/hits)."""
    cpus = max(2.0, float(ray.cluster_resources().get("CPU", 8)))
    return math.floor(min(1.0, max(0.01, (cpus - 1.0) / num_parts)) * 100) / 100


class _ShardedScatter:
    """Base for scatter stages: lazy per-part shard fetch + chunked
    adjacency iteration (hub splitting + bounded memory)."""

    def __init__(self, store: EdgeShardStore, chunk: int = 1 << 21) -> None:
        self.store = store
        self.chunk = chunk

    def _shard(self, part: int) -> tuple[np.ndarray, np.ndarray]:
        refs = self.store.part_refs[part]
        if len(refs) == 1:
            got = ray.get(refs[0])  # zero-copy plasma-backed views
            return got[0], got[1]  # drop a w column (weighted store)
        key = tuple(r.hex() for r in refs)
        got = _CONCAT_CACHE.get(key)
        if got is None:
            chunks = ray.get(list(refs))
            got = (
                np.concatenate([c[0] for c in chunks]),
                np.concatenate([c[1] for c in chunks]),
            )
            if (
                sum(len(v[0]) for v in _CONCAT_CACHE.values()) + len(got[0])
                > _CONCAT_CACHE_MAX_EDGES
            ):
                _CONCAT_CACHE.clear()
            _CONCAT_CACHE[key] = got
        return got

    def _iter_adj(
        self, vids: np.ndarray
    ) -> Iterator[tuple[np.ndarray, np.ndarray, np.ndarray]]:
        """Yield (owner_index_into_batch, out_degree_of_owner, dst_vids)
        in chunks of <= self.chunk edges."""
        order = np.argsort(vids, kind="stable")
        v_sorted = vids[order]
        parts = v_sorted // self.store.part_size
        for p in np.unique(parts):
            if int(p) not in self.store.part_refs:
                continue  # no edges from this vid range
            m = parts == p
            sv = v_sorted[m]
            pos = order[m]
            src_arr, dst_arr = self._shard(int(p))
            lo = np.searchsorted(src_arr, sv, "left")
            hi = np.searchsorted(src_arr, sv, "right")
            deg = hi - lo
            keep = deg > 0
            if not keep.any():
                continue
            sv, pos, lo, deg = sv[keep], pos[keep], lo[keep], deg[keep]
            cum = np.concatenate(([0], np.cumsum(deg)))
            total = int(cum[-1])
            for cs in range(0, total, self.chunk):
                ce = min(cs + self.chunk, total)
                span = np.arange(cs, ce)
                owner = np.searchsorted(cum, span, "right") - 1
                eidx = lo[owner] + (span - cum[owner])
                yield pos[owner], deg[owner], dst_arr[eidx]


class PageRankScatter(_ShardedScatter):
    """ranks batch (vid, rank, out_deg) -> contribution rows + ownership rows.

    Ownership rows (dst=vid, contrib=0, p0=rank, deg=out_deg) guarantee
    every vertex survives the gather groupby and carry p0/out_deg through
    it, so the update stage can compute the error and the next dangling
    mass without a join. Contribution rows are locally pre-summed per dst
    (map-side combine) — the distributed equivalent of the reference's
    scatter loop at pagerank_mpi.c:178-192.
    """

    def __call__(self, batch: dict[str, np.ndarray]) -> Iterator[dict]:
        vids = batch["vid"]
        ranks = batch["rank"]
        deg = batch["out_deg"]
        ps = self.store.part_size
        z = np.zeros(len(vids), dtype=np.float64)
        yield {
            "dst": vids,
            "contrib": z,
            "p0": ranks,
            "deg": deg.astype(np.int64),
            "bucket": vids // ps,  # gather shuffle key == CSR partition
        }
        for owner, odeg, dsts in self._iter_adj(vids):
            w = ranks[owner] / odeg  # p0[src]/out_deg[src], pagerank_mpi.c:181
            u, inv = np.unique(dsts, return_inverse=True)
            sums = np.bincount(inv, weights=w)
            yield {
                "dst": u,
                "contrib": sums,
                "p0": np.zeros(len(u), dtype=np.float64),
                "deg": np.zeros(len(u), dtype=np.int64),
                "bucket": u // ps,
            }


class PageRankDenseScatter(_ShardedScatter):
    """Dense-segment scatter: per (input block, destination bucket) emit
    ONE row carrying a dense float64 contribution segment (as bytes)
    plus per-bucket ownership arrays (vids, p0, out_deg as bytes).

    The gather then shuffles O(blocks x parts) small rows instead of
    O(E) per-edge rows and sums segments vectorized — at web scale this
    is the regime where E/blocks >= n (each block touches most of a
    bucket's vertex range); the row-based ``PageRankScatter`` remains
    the sparse-regime fallback. Accumulation order is fixed by the
    ``origin`` column (min vid of the producing block), so per-vertex
    float sums are deterministic at any parallelism.
    """

    def __call__(self, batch: dict[str, np.ndarray]) -> Iterator[dict]:
        vids = batch["vid"]
        ranks = batch["rank"]
        deg = batch["out_deg"].astype(np.int64)
        if len(vids) == 0:
            return
        ps = self.store.part_size
        origin = int(vids.min())
        ob = vids // ps
        for p in np.unique(ob):
            m = ob == p
            yield {
                "bucket": np.array([int(p)], dtype=np.int64),
                "kind": np.array([1], dtype=np.int64),
                "origin": np.array([origin], dtype=np.int64),
                "a": [vids[m].astype(np.int64).tobytes()],
                "b": [ranks[m].astype(np.float64).tobytes()],
                "c": [deg[m].tobytes()],
            }
        acc: dict[int, np.ndarray] = {}
        for owner, odeg, dsts in self._iter_adj(vids):
            w = ranks[owner] / odeg  # pagerank_mpi.c:181
            pb = dsts // ps
            for p in np.unique(pb):
                m = pb == p
                add = np.bincount(dsts[m] - p * ps, weights=w[m], minlength=ps)
                seg = acc.get(int(p))
                acc[int(p)] = add if seg is None else seg + add
        for p, seg in acc.items():
            yield {
                "bucket": np.array([p], dtype=np.int64),
                "kind": np.array([0], dtype=np.int64),
                "origin": np.array([origin], dtype=np.int64),
                "a": [seg.tobytes()],
                "b": [b""],
                "c": [b""],
            }


class MinLabelDenseScatter(_ShardedScatter):
    """Dense-segment variant of MinLabelScatter: per (block, bucket) one
    int64 min-candidate segment (bytes column) + per-bucket ownership
    rows (vids + current comps as bytes). Same shape as
    PageRankDenseScatter; min replaces sum, so no ordering is needed at
    all (fully order-independent, exact)."""

    def __call__(self, batch: dict[str, np.ndarray]) -> Iterator[dict]:
        vids = batch["vid"]
        comp = batch["comp"]
        if len(vids) == 0:
            return
        ps = self.store.part_size
        ob = vids // ps
        for p in np.unique(ob):
            m = ob == p
            yield {
                "bucket": np.array([int(p)], dtype=np.int64),
                "kind": np.array([1], dtype=np.int64),
                "a": [vids[m].astype(np.int64).tobytes()],
                "b": [comp[m].astype(np.int64).tobytes()],
            }
        acc: dict[int, np.ndarray] = {}
        for owner, _odeg, dsts in self._iter_adj(vids):
            pb = dsts // ps
            for p in np.unique(pb):
                m = pb == p
                seg = acc.get(int(p))
                if seg is None:
                    seg = np.full(ps, INT64_MAX, dtype=np.int64)
                    acc[int(p)] = seg
                np.minimum.at(seg, dsts[m] - p * ps, comp[owner][m])
        for p, seg in acc.items():
            yield {
                "bucket": np.array([p], dtype=np.int64),
                "kind": np.array([0], dtype=np.int64),
                "a": [seg.tobytes()],
                "b": [b""],
            }


class MinLabelScatter(_ShardedScatter):
    """Connected components / min-label propagation scatter.

    Input batch (vid, comp); store must hold the UNDIRECTED closure.
    Emits ownership rows (dst=vid, comp=own, old=own) and per-chunk
    min-combined candidate rows (dst, comp=min incoming, old=INT64_MAX);
    gather = groupby(dst).min(comp), min(old).
    """

    def __call__(self, batch: dict[str, np.ndarray]) -> Iterator[dict]:
        vids = batch["vid"]
        comp = batch["comp"]
        ps = self.store.part_size
        yield {"dst": vids, "comp": comp, "old": comp, "bucket": vids // ps}
        for owner, _odeg, dsts in self._iter_adj(vids):
            u, inv = np.unique(dsts, return_inverse=True)
            mins = np.full(len(u), INT64_MAX, dtype=np.int64)
            np.minimum.at(mins, inv, comp[owner])
            yield {
                "dst": u,
                "comp": mins,
                "old": np.full(len(u), INT64_MAX, dtype=np.int64),
                "bucket": u // ps,
            }


class LabelCountScatter(_ShardedScatter):
    """Synchronous LPA scatter over the undirected closure.

    Input batch (vid, label). Emits ownership rows
    (dst=vid, label=own, cnt=0, own=label) and locally combined
    (dst, label, cnt, own=-1) rows; gather = groupby([dst, label])
    .sum(cnt).max(own), then an argmax-per-dst pick stage.
    """

    def __call__(self, batch: dict[str, np.ndarray]) -> Iterator[dict]:
        vids = batch["vid"]
        labels = batch["label"]
        nbig = np.int64(self.store.n)
        ps = self.store.part_size
        yield {
            "dst": vids,
            "label": labels,
            "cnt": np.zeros(len(vids), dtype=np.int64),
            "own": labels,
            "bucket": vids // ps,
        }
        for owner, _odeg, dsts in self._iter_adj(vids):
            lab = labels[owner]
            db = dsts // ps
            for b in np.unique(db):
                m = db == b
                # composite (local dst, label): needs part_size * n < 2^63
                # (guard at build) — holds at 10^12 vertices with <=4M parts
                key = (dsts[m] - b * ps) * nbig + lab[m]
                u, inv = np.unique(key, return_inverse=True)
                cnt = np.bincount(inv)
                d = (u // nbig).astype(np.int64) + b * ps
                yield {
                    "dst": d,
                    "label": (u % nbig).astype(np.int64),
                    "cnt": cnt.astype(np.int64),
                    "own": np.full(len(u), -1, dtype=np.int64),
                    "bucket": np.full(len(u), b, dtype=np.int64),
                }
