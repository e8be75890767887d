"""Closeness centrality for a seed set, on the BFS shard harness.

Beyond-reference capability (the reference's only per-vertex score is
PageRank, /root/reference/pagerank_mpi/pagerank_mpi.c:132-231). For
each seed s the engine runs one frontier-sparse BFS sweep and reduces
the distance slice to two int64 partials per shard — (n_reached,
sum_dist) — so the wire cost per seed is O(P), not O(n). The shard
pool (CSR build = the expensive part) is built ONCE and reused across
seeds via ``reset()``; rounds are ~ms on real link graphs.

Closeness here is the Wasserman–Faust form for possibly-disconnected
graphs::

    C(s) = ((r-1)/(n-1)) * ((r-1)/sum_d)  =  (r-1)^2 / ((n-1)*sum_d)

with r = vertices reached from s (incl. s) and sum_d = sum of hop
distances. All inputs are exact int64 and the score is ONE IEEE
division of exactly-representable operands, so the result is
bit-reproducible at any parallelism (the driver-gate float policy).

At 10^12-vertex scale the per-seed sweep is the same O(E) total
exchange as BFS; computing closeness for ALL vertices is O(nE) and out
of scope — the operator is for seed panels (landmark centrality),
which is how closeness is estimated at web scale anyway.
"""

from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np
import pyarrow as pa
import ray

from parallel_pagerank_ray.pipelines.bfs import _BFSShard, _run_bfs_rounds
from parallel_pagerank_ray.pipelines.graph_build import Graph, undirected_edges
from parallel_pagerank_ray.stages.csr_store import EdgeShardStore, per_actor_cpus


@dataclass
class ClosenessRun:
    table: pa.Table  # (source, n_reached, sum_dist, closeness)
    history: list[dict] = field(default_factory=list)


def closeness_centrality_bsp(
    graph: Graph,
    sources: list[int],
    directed: bool = False,
    num_parts: int | None = None,
    max_depth: int = 10_000,
) -> ClosenessRun:
    """Per-seed closeness over ``graph`` (undirected closure by
    default, duplicate edges harmless — BFS is duplicate-invariant).

    Returns one row per source in input order: ``source, n_reached,
    sum_dist, ecc`` (int64-exact; ``ecc`` = eccentricity within the
    reachable set, 0 for isolated seeds — the max over a seed panel is
    the standard pseudo-diameter lower bound) and ``closeness`` (0.0
    for isolated seeds). The result is O(|sources|) rows — a
    driver-side table, not a Dataset.
    """
    n = graph.n
    if n == 0 or not sources:
        return ClosenessRun(
            table=pa.table(
                {
                    "source": pa.array([], type=pa.int64()),
                    "n_reached": pa.array([], type=pa.int64()),
                    "sum_dist": pa.array([], type=pa.int64()),
                    "ecc": pa.array([], type=pa.int64()),
                    "closeness": pa.array([], type=pa.float64()),
                }
            )
        )
    src_list = [int(s) for s in sources]
    if min(src_list) < 0 or max(src_list) >= n:
        raise ValueError(f"source vid out of range [0, {n})")
    if num_parts is None:
        # sparse frontier exchange -> shards are cheap, one per CPU
        cpus = int(ray.cluster_resources().get("CPU", 8))
        num_parts = min(256, max(4, cpus))
    edges = graph.edges if directed else undirected_edges(graph.edges, dedup=False)
    store = EdgeShardStore.build(edges, n=n, num_parts=num_parts)
    P = max(1, -(-n // store.part_size))
    per_actor = per_actor_cpus(P)
    actors = [
        _BFSShard.options(num_cpus=per_actor).remote(
            p, store.part_refs.get(p, []), n, store.part_size
        )
        for p in range(P)
    ]
    rows: list[tuple[int, int, int, int, float]] = []
    history: list[dict] = []
    for s in src_list:
        seed = np.array([s], dtype=np.int64)
        it, _ = _run_bfs_rounds(actors, P, seed, max_depth)
        parts = ray.get([a.stats.remote() for a in actors])
        r = sum(c for c, _, _ in parts)
        sum_d = sum(d for _, d, _ in parts)
        ecc = max(m for _, _, m in parts)  # 0 for isolated seeds
        if sum_d > 0:
            # (r-1)^2 / ((n-1)*sum_d): exact-int operands, one division
            closeness = ((r - 1.0) * (r - 1.0)) / ((n - 1.0) * float(sum_d))
        else:
            closeness = 0.0
        rows.append((s, r, sum_d, ecc, closeness))
        history.append({"source": s, "iterations": it, "reached": r})
        ray.get([a.reset.remote() for a in actors])
    for a in actors:
        ray.kill(a)
    return ClosenessRun(
        table=pa.table(
            {
                "source": pa.array([r[0] for r in rows], type=pa.int64()),
                "n_reached": pa.array([r[1] for r in rows], type=pa.int64()),
                "sum_dist": pa.array([r[2] for r in rows], type=pa.int64()),
                "ecc": pa.array([r[3] for r in rows], type=pa.int64()),
                "closeness": pa.array([r[4] for r in rows], type=pa.float64()),
            }
        ),
        history=history,
    )
