"""BSP actor-pool PageRank: stateful rank shards, plasma segment exchange.

The Dataset engine (pipelines/pagerank.py) pays one streaming-executor
execution per superstep (~0.5-1 s of scheduling + shuffle machinery).
For the iterative inner loop that fixed cost dominates at realistic
sizes, so this engine keeps the BSP loop on raw Ray actors — the
explicitly-sanctioned exception for state the Dataset API can't hold
(SURVEY.md ST1/ST2; north rule: "stateful actor-pool partitions holding
CSR shards"):

- P ``_RankShard`` actors, each holding ONE partition's edges (fetched
  zero-copy from the same ``EdgeShardStore`` plasma objects the Dataset
  engine uses) plus its mutable rank slice. Nothing is replicated —
  unlike the reference, which broadcasts the whole CSR to every rank
  (/root/reference/pagerank_mpi/pagerank_mpi.c:404-415).
- A superstep is two actor rounds: ``scatter`` (per-edge rank/deg
  weights bincount-accumulated into one dense float64 segment per
  destination partition, each ``ray.put`` once) and ``gather_update``
  (sum incoming segments in fixed partition order — deterministic — and
  apply the normative update ``p1 = d*(contrib + dangling/N) + (1-d)/N``,
  pagerank_mpi.c:195). Convergence scalars travel as tiny returns, the
  Allreduce equivalents of pagerank_mpi.c:159-213.
- Dual stop rule preserved exactly: loop-top ``max_err <= tol``
  (pagerank_mpi.c:141) + in-loop ``l1 < tol`` break (c:221-226).
- Checkpoint: each actor writes its own ``part=<p>.parquet`` under
  ``iter=<k>/`` (per-partition lineage, north rule); resume loads only
  the actor's own file. Layout matches state/checkpoint.py (_SUCCESS +
  lineage.json) so a resumed run reproduces the uninterrupted run
  bit-for-bit.

Scaling: per-superstep traffic is P * n * 8 bytes of segments moved
through the object store; compute is O(E/P) per actor. On a cluster the
actors spread across nodes (Ray schedules by CPU); segments move
node-to-node exactly once.
"""

from __future__ import annotations

import json
import math
import os
from dataclasses import dataclass, field

import numpy as np
import ray

from parallel_pagerank_ray.pipelines.graph_build import Graph
from parallel_pagerank_ray.stages.csr_store import (
    EdgeShardStore,
    cap_num_parts,
    per_actor_cpus,
)

# full-vector scatter when the whole rank vector fits one plasma object
_FULL_VEC_MAX = 256 << 20


@ray.remote
class _RankShard:
    def __init__(
        self,
        part: int,
        part_refs: list,
        n: int,
        num_parts: int,
        part_size: int,
        d: float,
        e_ref=None,
        init_ref=None,
        exchange_dtype: str = "float64",
    ) -> None:
        self.part = part
        self.n = n
        self.num_parts = num_parts
        self.part_size = part_size
        self.d = d
        # wire format for scattered contribution segments. float32
        # halves superstep traffic (the engine is exchange-bandwidth
        # bound); ranks and accumulation stay float64, so only the
        # per-shard partial sums are rounded (one rounding per shard per
        # element, ~1e-7 relative). Opt-in: NOT bit-identical to the
        # float64 reference arithmetic — keep the default for anything
        # value-checked against an oracle.
        self.xdtype = np.dtype(exchange_dtype)
        self.base = part * part_size
        self.size = max(0, min(part_size, n - self.base))

        if part_refs:
            chunks = ray.get(part_refs)
            src = np.concatenate([c[0] for c in chunks])
            dst = np.concatenate([c[1] for c in chunks])
            wts = (
                np.concatenate([c[2] for c in chunks])
                if len(chunks[0]) > 2
                else None
            )
        else:
            src = np.array([], dtype=np.int64)
            dst = np.array([], dtype=np.int64)
            wts = None
        # out-degree of the local vertex slice (src is in-range by build)
        self.deg = np.bincount(src - self.base, minlength=self.size).astype(np.int64)
        if wts is None:
            self.wf = None
        else:
            # weighted random walk: per-edge factor w_e / W(src), W =
            # out-weight sum, fixed for the run. Weights must be
            # positive so the dangling predicate (deg == 0) coincides
            # with W == 0.
            # not (all > 0) also catches NaN (from null parquet values),
            # which would sail through a `min() <= 0` check and produce
            # silent all-NaN ranks
            if len(wts) and not bool((wts > 0.0).all()):
                raise ValueError("edge weights must be positive and non-null")
            W = np.bincount(src - self.base, weights=wts, minlength=self.size)
            self._src_local = src - self.base
            self.wf = wts / W[self._src_local] if len(wts) else wts
        # full-vector mode (n*8 bytes <= _FULL_VEC_MAX): scatter is one
        # bincount over the whole id space + one ray.put; receivers take
        # zero-copy slices. Otherwise: route edges once by destination
        # partition and emit one dense segment per bucket (bounded alloc).
        self.full_vec = n * 8 <= _FULL_VEC_MAX
        if self.full_vec:
            self._dst = dst
            # sparse exchange: when this shard's edges touch few
            # destinations (touched < n/4), ship (idx, val) pairs
            # instead of a dense n-vector — O(touched) traffic on very
            # sparse graphs. The switch is a pure function of the static
            # edge set, so the exchange form is deterministic; per-slot
            # accumulation order matches the dense bincount exactly.
            touched = np.unique(dst)
            self._sparse = len(touched) * 4 < n and len(touched) > 0
            if self._sparse:
                self._touched = touched
                self._dst_compressed = np.searchsorted(touched, dst)
        else:
            db = dst // part_size
            order = np.argsort(db, kind="stable")
            self._perm = order
            db_s = db[order]
            dst_s = dst[order]
            self.bucket_ids = np.unique(db_s).astype(np.int64)
            bounds = np.searchsorted(db_s, self.bucket_ids, "left").tolist() + [
                len(db_s)
            ]
            self._slices = [
                (int(bounds[i]), int(bounds[i + 1]))
                for i in range(len(self.bucket_ids))
            ]
            self._dst_local = dst_s - db_s * part_size
        # personalization slice (reference's Node.e, implemented): None
        # means uniform 1/n and preserves the reference arithmetic exactly
        if e_ref is None:
            self.e = None
            self.ranks = np.full(self.size, 1.0 / n, dtype=np.float64)
        else:
            # e_ref is a plasma ObjectRef auto-resolved by Ray at call
            # time (zero-copy view); slice this shard's range
            full_e = e_ref if isinstance(e_ref, np.ndarray) else ray.get(e_ref)
            self.e = np.asarray(
                full_e[self.base : self.base + self.size], dtype=np.float64
            ).copy()
            self.ranks = self.e.copy()
        if init_ref is not None:
            # warm start (incremental PageRank): previous run's ranks
            # replace the uniform/e init; the fixpoint is unchanged, the
            # iteration count drops when the graph changed little
            full_i = (
                init_ref if isinstance(init_ref, np.ndarray) else ray.get(init_ref)
            )
            self.ranks = np.asarray(
                full_i[self.base : self.base + self.size], dtype=np.float64
            ).copy()

    def dangling_part(self) -> float:
        return float(self.ranks[self.deg == 0].sum())

    def scatter(self) -> list:
        """Contribution segments for every destination partition, placed
        in plasma; returns [(bucket, ref), ...]. Full-vector mode returns
        one ref tagged bucket=-1 (receivers slice zero-copy)."""
        if self.wf is not None:
            w = self.ranks[self._src_local] * self.wf
        else:
            safe = np.maximum(self.deg, 1)
            w = np.repeat(self.ranks / safe, self.deg)  # deg=0 emits nothing
        if self.full_vec:
            if self._sparse:
                vals = np.bincount(
                    self._dst_compressed, weights=w, minlength=len(self._touched)
                )
                return [(-2, ray.put((self._touched, vals.astype(self.xdtype, copy=False))))]
            vec = np.bincount(self._dst, weights=w, minlength=self.n)
            return [(-1, ray.put(vec.astype(self.xdtype, copy=False)))]
        wp = w[self._perm]
        out = []
        for bid, (lo, hi) in zip(self.bucket_ids, self._slices):
            bsize = max(0, min(self.part_size, self.n - int(bid) * self.part_size))
            seg = np.bincount(
                self._dst_local[lo:hi], weights=wp[lo:hi], minlength=bsize
            )
            out.append((int(bid), ray.put(seg.astype(self.xdtype, copy=False))))
        return out

    def gather_update(self, seg_refs: list, dang: float) -> tuple[float, float, float]:
        """Sum incoming segments (fixed partition order -> deterministic)
        and apply the reference update; returns (l1, max_err, dangling)."""
        contrib = np.zeros(self.size, dtype=np.float64)
        # one batched get (zero-copy plasma views), summed in list order
        for seg in ray.get(list(seg_refs)):
            if isinstance(seg, tuple):  # sparse (sorted idx, vals)
                idx, vals = seg
                lo = np.searchsorted(idx, self.base)
                hi = np.searchsorted(idx, self.base + self.size)
                # idx entries are unique -> fancy += is exact
                contrib[idx[lo:hi] - self.base] += vals[lo:hi]
            elif len(seg) == self.n and self.n != self.size:
                contrib += seg[self.base : self.base + self.size]
            else:
                contrib += seg[: self.size]
        p0 = self.ranks
        d = self.d
        # normative operand order — pagerank_mpi.c:195 (uniform case);
        # personalized form replaces 1/n with e_v
        if self.e is None:
            p1 = d * (contrib + dang / self.n) + (1.0 - d) / self.n
        else:
            p1 = d * (contrib + dang * self.e) + (1.0 - d) * self.e
        err = np.abs(p1 - p0)
        self.ranks = p1
        return (
            float(err.sum()),
            float(err.max()) if self.size else 0.0,
            float(p1[self.deg == 0].sum()),
        )

    def slice_table(self):
        import pyarrow as pa

        vids = self.base + np.arange(self.size, dtype=np.int64)
        return pa.table(
            {"vid": vids, "rank": self.ranks, "out_deg": self.deg}
        )

    def save(self, iter_dir: str) -> None:
        import pyarrow.parquet as pq

        pq.write_table(self.slice_table(), os.path.join(iter_dir, f"part={self.part}.parquet"))

    def load(self, iter_dir: str) -> None:
        import pyarrow.parquet as pq

        t = pq.read_table(os.path.join(iter_dir, f"part={self.part}.parquet"))
        self.ranks = t.column("rank").to_numpy().astype(np.float64)


@dataclass
class BSPPageRankRun:
    ranks: "ray.data.Dataset"
    iterations: int
    exit_reason: str
    history: list[dict] = field(default_factory=list)


def _ckpt_root(workdir: str) -> str:
    return os.path.join(workdir, "pagerank_bsp")


def _lineage_path(workdir: str) -> str:
    return os.path.join(_ckpt_root(workdir), "lineage.json")


def pagerank_bsp(
    graph: Graph,
    d: float = 0.85,
    tol: float = 1e-6,
    max_iters: int = 1000,
    num_parts: int | None = None,
    store: EdgeShardStore | None = None,
    workdir: str | None = None,
    checkpoint_every: int = 0,
    personalization: "np.ndarray | None" = None,
    init_ranks: "np.ndarray | None" = None,
    fault_hook=None,
    max_recoveries: int = 3,
    exchange_dtype: str = "float64",
) -> BSPPageRankRun:
    """Power-iteration PageRank on the BSP actor engine.

    Results match pipelines.pagerank.pagerank (and the NumPy oracle)
    within 1e-6 with identical iteration counts; per-superstep cost is
    two actor rounds instead of a Dataset execution.
    ``checkpoint_every=0`` disables checkpointing; K>0 writes every K
    iterations (each actor writes only its own partition file).

    ``exchange_dtype="float32"`` halves superstep exchange bytes:
    contribution segments cross the wire as float32 while ranks and
    accumulation stay float64. Intended for MULTI-NODE clusters where
    the exchange crosses the network; single-node (plasma = shared
    memory) it measures within noise because the cast's extra copy
    offsets the bandwidth saved. Results match the float64 run within
    ~1e-7 relative, NOT bit-for-bit — keep the float64 default for
    oracle-value-checked outputs.

    Self-healing: if a shard actor dies mid-run (node loss, OOM kill),
    the pool is respawned and state reloads from the latest complete
    per-partition checkpoint (or restarts from init when none exists) —
    up to ``max_recoveries`` times, then the error propagates. A
    recovered run produces bit-identical results (float64 round-trips
    parquet exactly). ``fault_hook(it, actors)`` is a test seam invoked
    at each loop top for injecting failures.
    """
    import ray.data as rd

    n = graph.n
    if n == 0:
        return BSPPageRankRun(ranks=rd.from_items([]), iterations=0, exit_reason="l1")
    if num_parts is None:
        cpus = int(ray.cluster_resources().get("CPU", 8))
        num_parts = cap_num_parts(
            min(256, max(4, cpus // 4, math.ceil(n / 4_000_000))), n
        )
    if store is None:
        store = EdgeShardStore.build(graph.edges, n=n, num_parts=num_parts)
    P = max(1, -(-n // store.part_size))  # actual partition count
    # fractional CPU reservation: all P shards must be schedulable even
    # when P > cluster CPUs (the OS time-shares the numpy bursts); on a
    # multi-node cluster Ray still spreads shards by the fraction.
    # MUST leave >=1 whole CPU free or any plain task (e.g. Dataset
    # metadata fetches) deadlocks behind the actor reservations.
    per_actor = per_actor_cpus(P)
    # personalization broadcast once; each shard slices its range.
    # (At 10^12-vertex scale pass e as parquet read per shard instead.)
    e_ref = (
        ray.put(np.asarray(personalization, dtype=np.float64))
        if personalization is not None
        else None
    )
    # warm start: full vector broadcast once like personalization (at
    # 10^12-vertex scale pass ranks as parquet read per shard instead)
    init_ref = (
        ray.put(np.asarray(init_ranks, dtype=np.float64))
        if init_ranks is not None
        else None
    )
    def _spawn_actors() -> list:
        return [
            _RankShard.options(num_cpus=per_actor).remote(
                p, store.part_refs.get(p, []), n, P, store.part_size, d,
                e_ref, init_ref, exchange_dtype,
            )
            for p in range(P)
        ]

    actors = _spawn_actors()

    import hashlib as _hashlib

    fingerprint = {
        "n": n,
        "num_edges": store.num_edges,
        "d": d,
        "tol": tol,
        "max_iters": max_iters,
        "num_parts": P,
        "exchange_dtype": exchange_dtype,
        "e_md5": (
            _hashlib.md5(
                np.asarray(personalization, dtype=np.float64).tobytes()
            ).hexdigest()
            if personalization is not None
            else None
        ),
        "init_md5": (
            _hashlib.md5(
                np.asarray(init_ranks, dtype=np.float64).tobytes()
            ).hexdigest()
            if init_ranks is not None
            else None
        ),
    }
    it = 0
    history: list[dict] = []
    max_err = np.inf
    dangling: float | None = None

    lineage: dict | None = None
    if workdir is not None:
        try:
            with open(_lineage_path(workdir)) as f:
                lineage = json.load(f)
        except (OSError, json.JSONDecodeError):
            lineage = None
        if lineage is not None and lineage.get("fingerprint") != fingerprint:
            lineage = None
        if lineage is not None:
            root = _ckpt_root(workdir)
            # resumable = _SUCCESS present AND the iter is in lineage —
            # a crash between the two writes must fall back to the
            # previous complete iteration, not KeyError
            done = [
                int(name.split("=", 1)[1])
                for name in os.listdir(root)
                if name.startswith("iter=")
                and os.path.exists(os.path.join(root, name, "_SUCCESS"))
                and name.split("=", 1)[1] in lineage["iters"]
            ]
            if done:
                it = max(done)
                meta = lineage["iters"][str(it)]
                ray.get(
                    [a.load.remote(os.path.join(root, f"iter={it}")) for a in actors]
                )
                max_err = float(meta["max_err"])
                dangling = float(meta["dangling_next"])
                history = [dict(meta, iter=it)]
                if meta.get("converged"):
                    refs = [a.slice_table.remote() for a in actors]
                    ray.wait(refs, num_returns=len(refs))
                    for a in actors:
                        ray.kill(a)
                    return BSPPageRankRun(
                        ranks=rd.from_arrow_refs(refs),
                        iterations=it,
                        exit_reason=str(meta["exit_reason"]),
                        history=history,
                    )

    _dbg = bool(os.environ.get("PPR_DEBUG"))
    if dangling is None:
        if _dbg:
            print("bsp: waiting for shard init", flush=True)
        dangling = float(sum(ray.get([a.dangling_part.remote() for a in actors])))
        if _dbg:
            print("bsp: shards ready", flush=True)

    def _reload_latest(new_actors: list):
        """After respawning the pool, load the latest complete
        checkpoint (None -> restart from init)."""
        if workdir is None or not checkpoint_every:
            return None
        try:
            with open(_lineage_path(workdir)) as f:
                lin = json.load(f)
        except (OSError, json.JSONDecodeError):
            return None
        if lin.get("fingerprint") != fingerprint:
            return None
        root = _ckpt_root(workdir)
        done = [
            int(nm.split("=", 1)[1])
            for nm in os.listdir(root)
            if nm.startswith("iter=")
            and os.path.exists(os.path.join(root, nm, "_SUCCESS"))
            and nm.split("=", 1)[1] in lin["iters"]
        ]
        if not done:
            return None
        k = max(done)
        ray.get(
            [a.load.remote(os.path.join(root, f"iter={k}")) for a in new_actors]
        )
        return k, lin["iters"][str(k)], lin

    recoveries = 0
    exit_reason = "max_iters"
    while max_err > tol and it < max_iters:
        if fault_hook is not None:
            fault_hook(it, actors)
        dang = float(dangling)
        try:
            mats = ray.get([a.scatter.remote() for a in actors])
            if _dbg:
                print(f"bsp: iter {it} scatter done", flush=True)
            inbox: list[list] = [[] for _ in range(P)]
            for row in mats:  # actor order 0..P-1 -> deterministic sums
                for bid, ref in row:
                    if bid < 0:  # full-vector: every partition slices it
                        for b in range(P):
                            inbox[b].append(ref)
                    else:
                        inbox[bid].append(ref)
            partials = ray.get(
                [
                    actors[p].gather_update.remote(inbox[p], dang)
                    for p in range(P)
                ]
            )
        except ray.exceptions.RayActorError:
            if recoveries >= max_recoveries:
                raise
            recoveries += 1
            for a in actors:
                try:
                    ray.kill(a)
                except Exception:
                    pass
            actors = _spawn_actors()
            got = _reload_latest(actors)
            if got is not None:
                it, meta, lineage = got
                max_err = float(meta["max_err"])
                dangling = float(meta["dangling_next"])
                history.append(
                    {"recovered": True, "resumed_iter": it, "attempt": recoveries}
                )
                if meta.get("converged"):  # l1-exit state: don't iterate on
                    exit_reason = str(meta["exit_reason"])
                    break
            else:  # no usable checkpoint: restart from init
                it = 0
                max_err = np.inf
                dangling = float(
                    sum(ray.get([a.dangling_part.remote() for a in actors]))
                )
                history.append(
                    {"recovered": True, "resumed_iter": 0, "attempt": recoveries}
                )
            continue
        if _dbg:
            print(f"bsp: iter {it} gather done", flush=True)
        l1 = float(sum(p[0] for p in partials))
        max_err = float(max(p[1] for p in partials))
        dangling = float(sum(p[2] for p in partials))
        it += 1
        converged = l1 < tol or max_err <= tol
        if l1 < tol:
            exit_reason = "l1"  # pagerank_mpi.c:221-226
        elif max_err <= tol:
            exit_reason = "max_err"
        metrics = {
            "iter": it,
            "l1": l1,
            "max_err": max_err,
            "dangling": dang,
            "dangling_next": dangling,
            "converged": converged,
            "exit_reason": exit_reason if converged else "",
        }
        history.append(metrics)
        if workdir is not None and checkpoint_every and (
            converged or it % checkpoint_every == 0
        ):
            root = _ckpt_root(workdir)
            final = os.path.join(root, f"iter={it}")
            tmp = final + ".tmp"
            os.makedirs(tmp, exist_ok=True)
            if not os.path.exists(final):
                ray.get([a.save.remote(tmp) for a in actors])
                os.replace(tmp, final)
                with open(os.path.join(final, "_SUCCESS"), "w") as f:
                    f.write("")
            lineage = (
                lineage
                if lineage is not None
                else {"algo": "pagerank_bsp", "fingerprint": fingerprint, "iters": {}}
            )
            lineage["iters"][str(it)] = metrics
            tmp_l = _lineage_path(workdir) + ".tmp"
            with open(tmp_l, "w") as f:
                json.dump(lineage, f, indent=1, sort_keys=True)
            os.replace(tmp_l, _lineage_path(workdir))
        if l1 < tol:
            break

    refs = [a.slice_table.remote() for a in actors]
    # driver owns the returned tables; they survive actor death. Kill
    # BEFORE any Dataset call so the CPU reservations are released.
    ray.wait(refs, num_returns=len(refs))
    for a in actors:
        ray.kill(a)
    ranks = rd.from_arrow_refs(refs)
    return BSPPageRankRun(
        ranks=ranks, iterations=it, exit_reason=exit_reason, history=history
    )
