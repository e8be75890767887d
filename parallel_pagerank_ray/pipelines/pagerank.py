"""Distributed power-iteration PageRank as Ray Data supersteps.

Semantics replicate the reference's ``Distributed_PageRank_csr``
(/root/reference/pagerank_mpi/pagerank_mpi.c:132-231) exactly:

- uniform init ``1/N`` (Random_P_E, pagerank_mpi.c:44-54);
- per-superstep dangling mass ``Σ p0[out_deg==0]`` redistributed
  uniformly (pagerank_mpi.c:166-174);
- update ``p1 = d*(contrib + dangling/N) + (1-d)/N`` with the normative
  operand order (pagerank_mpi.c:195);
- dual stop rule: loop-top ``max_err <= tol`` (pagerank_mpi.c:141) plus
  in-loop ``l1 < tol`` break (pagerank_mpi.c:221-226).

The execution shape is the opposite of the reference's replicated dense
vector + Allgatherv (pagerank_mpi.c:143-160): ranks live in a Dataset of
(vid, rank, out_deg) rows; each superstep is

    scatter  ranks.map_batches(PageRankScatter actor pool)   # O(E) local
    gather   .groupby("dst").aggregate(Sum contrib/p0/deg)   # the shuffle
    update   .map_batches(vectorized rank update)            # O(N) local

Metrics (l1, max_err, next dangling mass) come from one cheap aggregate
pass over the materialized new ranks — the Allreduce equivalents at
pagerank_mpi.c:159,174,212-213. Nothing is ever globally replicated.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any

import numpy as np
import ray.data as rd

from parallel_pagerank_ray.pipelines.graph_build import Graph
from parallel_pagerank_ray.stages.csr_store import (
    EdgeShardStore,
    PageRankDenseScatter,
    PageRankScatter,
)
from parallel_pagerank_ray.state.checkpoint import CheckpointManager

# dense-segment gather when a bucket's float segment fits comfortably in
# a worker heap (32 MiB); the row-based path is the sparse/huge-n fallback
DENSE_SEGMENT_MAX_BYTES = 32 << 20


@dataclass
class PageRankRun:
    ranks: rd.Dataset  # (vid, rank) — also carries out_deg
    iterations: int
    exit_reason: str  # "l1" | "max_err" | "max_iters"
    history: list[dict[str, float]] = field(default_factory=list)


def _init_ranks(graph: Graph, num_parts: int | None = None) -> rd.Dataset:
    n = graph.n

    def add_rank(batch: dict[str, np.ndarray]) -> dict[str, np.ndarray]:
        return {
            "vid": batch["vid"],
            "rank": np.full(len(batch["vid"]), 1.0 / n, dtype=np.float64),
            "out_deg": batch["out_deg"].astype(np.int64),
        }

    return graph.init_vertex_table(num_parts=num_parts).map_batches(
        add_rank, batch_format="numpy"
    )


def _make_dense_gather_update(d: float, n: int, ps: int, dang: float):
    """Fused per-bucket gather + rank update for the dense-segment path.

    Segment rows (kind=0) are summed in ``origin`` order (deterministic);
    ownership rows (kind=1) carry each vertex's p0/out_deg so no join is
    needed. Update arithmetic is the normative pagerank_mpi.c:195 form.
    """

    def gather_update(g: dict[str, np.ndarray]) -> dict[str, np.ndarray]:
        order = np.argsort(g["origin"], kind="stable")
        kinds = g["kind"][order]
        a, b, c = g["a"][order], g["b"][order], g["c"][order]
        base = int(g["bucket"][0]) * ps
        contrib: np.ndarray | None = None
        vid_parts: list[np.ndarray] = []
        p0_parts: list[np.ndarray] = []
        deg_parts: list[np.ndarray] = []
        for i in range(len(kinds)):
            if kinds[i] == 0:
                seg = np.frombuffer(a[i], dtype=np.float64)
                contrib = seg.copy() if contrib is None else contrib + seg
            else:
                vid_parts.append(np.frombuffer(a[i], dtype=np.int64))
                p0_parts.append(np.frombuffer(b[i], dtype=np.float64))
                deg_parts.append(np.frombuffer(c[i], dtype=np.int64))
        vids = np.concatenate(vid_parts)
        p0 = np.concatenate(p0_parts)
        deg = np.concatenate(deg_parts)
        cv = (
            contrib[vids - base]
            if contrib is not None
            else np.zeros(len(vids), dtype=np.float64)
        )
        # normative operand order — pagerank_mpi.c:195
        p1 = d * (cv + dang / n) + (1.0 - d) / n
        err = np.abs(p1 - p0)  # pagerank_mpi.c:203-209
        return {
            "vid": vids,
            "rank": p1,
            "out_deg": deg,
            "err": err,
            "dangling_rank": np.where(deg == 0, p1, 0.0),
        }

    return gather_update


def _gather_combine(g: dict[str, np.ndarray]) -> dict[str, np.ndarray]:
    """Vectorized per-bucket gather: sum contrib/p0/deg per dst.

    Rows are lexsorted before accumulation so per-dst float sums are
    order-deterministic at any parallelism (SURVEY.md §4 determinism).
    """
    order = np.lexsort((g["contrib"], g["dst"]))
    dst = g["dst"][order]
    u, inv = np.unique(dst, return_inverse=True)
    return {
        "dst": u,
        "contrib": np.bincount(inv, weights=g["contrib"][order]),
        "p0": np.bincount(inv, weights=g["p0"][order]),
        "out_deg": np.bincount(inv, weights=g["deg"][order]).astype(np.int64),
    }


def _dangling_mass(ranks: rd.Dataset) -> float:
    def partial(batch: dict[str, np.ndarray]) -> dict[str, np.ndarray]:
        m = batch["out_deg"] == 0
        return {
            "dangling_rank": np.array([batch["rank"][m].sum()]),
            "k": np.array([batch["vid"].min() if len(batch["vid"]) else -1]),
        }

    rows = sorted(
        ranks.map_batches(partial, batch_format="numpy").take_all(),
        key=lambda r: r["k"],
    )
    return float(sum(r["dangling_rank"] for r in rows))


def pagerank(
    graph: Graph,
    d: float = 0.85,
    tol: float = 1e-6,
    max_iters: int = 1000,
    num_parts: int | None = None,
    workdir: str | None = None,
    checkpoint_every: int = 1,
    store: EdgeShardStore | None = None,
) -> PageRankRun:
    """Run PageRank to convergence; optionally checkpoint + resume.

    ``workdir`` enables per-iteration Parquet checkpoints with lineage;
    if a matching checkpoint exists the loop resumes from it and the
    final ranks are identical to an uninterrupted run (float64
    round-trips exactly through Parquet).
    """
    n = graph.n
    if n == 0:
        return PageRankRun(ranks=rd.from_items([]), iterations=0, exit_reason="l1")
    try:
        names = graph.edges.schema().names
    except Exception:
        names = []
    if "w" in (names or []):
        # the Dataset engine's scatter is unweighted; ignoring w would
        # silently compute the wrong fixpoint
        raise ValueError(
            "weighted edge table: use pagerank_bsp (the BSP engine "
            "picks the w column up from the shard store)"
        )
    if num_parts is None:
        # Dense-gather traffic is num_parts * n * 8 bytes per superstep, so
        # fewer/larger parts win until scatter tasks starve CPUs (~cpus/4)
        # or a segment outgrows the worker heap (part <= 4M vertices).
        import math as _math

        import ray as _ray

        cpus = int(_ray.cluster_resources().get("CPU", 8))
        num_parts = max(4, cpus // 4, _math.ceil(n / 4_000_000))
        num_parts = min(num_parts, 256)
    if store is None:
        store = EdgeShardStore.build(graph.edges, n=n, num_parts=num_parts)

    ckpt: CheckpointManager | None = None
    it = 0
    history: list[dict[str, float]] = []
    ranks: rd.Dataset | None = None
    dangling: float | None = None
    max_err = np.inf

    if workdir is not None:
        ckpt = CheckpointManager(
            workdir=workdir,
            algo="pagerank",
            fingerprint={
                "n": n,
                "num_edges": store.num_edges,
                "d": d,
                "tol": tol,
                "max_iters": max_iters,
            },
        )
        got = ckpt.latest()
        if got is not None:
            it, ranks, meta = got
            ranks = ranks.materialize()
            dangling = float(meta["dangling_next"])
            max_err = float(meta["max_err"])
            history = [dict(meta, iter=it)]
            if meta.get("converged"):
                return PageRankRun(
                    ranks=ranks,
                    iterations=it,
                    exit_reason=str(meta["exit_reason"]),
                    history=history,
                )

    if ranks is None:
        ranks = _init_ranks(graph, num_parts=num_parts).materialize()
        dangling = _dangling_mass(ranks)

    # Stateless-task scatter: per-superstep executions re-create actor
    # pools, so a callable instance (tasks) is much lower latency; shard
    # fetches stay zero-copy/cached per worker process (see csr_store).
    use_dense = store.part_size * 8 <= DENSE_SEGMENT_MAX_BYTES
    scatter_fn = (
        PageRankDenseScatter(store) if use_dense else PageRankScatter(store)
    )
    exit_reason = "max_iters"
    # loop-top guard: pagerank_mpi.c:141
    while max_err > tol and it < max_iters:
        dang = float(dangling)

        def update(batch: dict[str, np.ndarray], _dang=dang) -> dict[str, np.ndarray]:
            contrib = batch["contrib"]
            p0 = batch["p0"]
            out_deg = batch["out_deg"]
            # normative operand order — pagerank_mpi.c:195
            p1 = d * (contrib + _dang / n) + (1.0 - d) / n
            err = np.abs(p1 - p0)  # pagerank_mpi.c:203-209
            return {
                "vid": batch["dst"],
                "rank": p1,
                "out_deg": out_deg,
                "err": err,
                "dangling_rank": np.where(out_deg == 0, p1, 0.0),
            }

        scattered = ranks.map_batches(
            scatter_fn, batch_format="numpy", batch_size=None
        )
        if use_dense:
            new = (
                scattered.groupby("bucket")
                .map_groups(
                    _make_dense_gather_update(d, n, store.part_size, dang),
                    batch_format="numpy",
                )
                .materialize()
            )
        else:
            new = (
                scattered.groupby("bucket")  # ~num_parts values, the only shuffle
                .map_groups(_gather_combine, batch_format="numpy")
                .map_batches(update, batch_format="numpy")
                .materialize()
            )

        def metrics_partial(b: dict[str, np.ndarray]) -> dict[str, np.ndarray]:
            return {
                "l1": np.array([b["err"].sum()]),
                "mx": np.array([b["err"].max() if len(b["err"]) else 0.0]),
                "dng": np.array([b["dangling_rank"].sum()]),
                "k": np.array([b["vid"].min() if len(b["vid"]) else -1]),
            }

        # per-block partials combined in sorted order -> deterministic sums
        rows = sorted(
            new.map_batches(metrics_partial, batch_format="numpy").take_all(),
            key=lambda r: r["k"],
        )
        l1 = float(sum(r["l1"] for r in rows))
        max_err = float(max((r["mx"] for r in rows), default=0.0))
        dangling = float(sum(r["dng"] for r in rows))
        it += 1
        converged = l1 < tol or max_err <= tol
        if l1 < tol:
            exit_reason = "l1"  # pagerank_mpi.c:221-226
        elif max_err <= tol:
            exit_reason = "max_err"
        metrics: dict[str, Any] = {
            "iter": it,
            "l1": l1,
            "max_err": max_err,
            "dangling": dang,
            "dangling_next": dangling,
            "converged": converged,
            "exit_reason": exit_reason if converged else "",
        }
        history.append(metrics)
        # `new` carries (vid, rank, out_deg, err, dangling_rank); the next
        # scatter reads only the first three — no second materialization.
        ranks = new
        if ckpt is not None and (converged or it % checkpoint_every == 0):
            ckpt.save_iter(
                it, new.select_columns(["vid", "rank", "out_deg"]), metrics
            )
        if l1 < tol:
            break

    return PageRankRun(
        ranks=ranks, iterations=it, exit_reason=exit_reason, history=history
    )
