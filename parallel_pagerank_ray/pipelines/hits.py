"""HITS hubs & authorities (Kleinberg) over the directed graph.

Beyond-reference capability: the classic companion to PageRank for
link analysis (the reference implements only PageRank,
/root/reference/pagerank_mpi/pagerank_mpi.c:132-231).

UNNORMALIZED fixed-iteration variant: h_0 = 1; a_t[v] = sum of
h_{t-1}[u] over edges (u, v); h_t[u] = sum of a_t[v] over edges
(u, v). Skipping the per-iteration norm keeps every value an INTEGER
(norms only rescale — the hub/authority ordering is identical), so
the scores are bit-exact at any parallelism AND value-checkable
against a DuckDB recursive CTE — no float-accumulation-order caveats
like the PageRank top-k gate. Magnitudes grow ~(mean degree)^2 per
iteration; the driver asserts the int64 headroom each round and the
default ``iters=2`` holds to ~1e14 on degree-3000 graphs.

Engines:
- BSP actor shards (default when n * 8 B fits the dense exchange):
  per iteration one dense int64 scatter/exchange for the authority
  sum and one assembled-vector read for the hub sum — same traffic
  shape as a PageRank superstep.
- Dataset fallback (any n, bounded memory): the same two sums as
  bucketed ``grouped_agg`` shuffles over (dst, h[src]) /
  (src, a[dst]) rows with the vector attached by broadcast lookup —
  used automatically above the dense-exchange bound.
"""

from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np
import ray
import ray.data as rd

from parallel_pagerank_ray.pipelines.graph_build import Graph
from parallel_pagerank_ray.stages.csr_store import cap_num_parts, EdgeShardStore, per_actor_cpus

_FULL_VEC_MAX = 256 << 20
_INT64_GUARD = 1 << 61  # one more degree-weighted sum must not overflow


@dataclass
class HITSRun:
    scores: rd.Dataset  # (vid, auth, hub) int64
    iterations: int
    history: list[dict] = field(default_factory=list)


@ray.remote
class _HITSShard:
    def __init__(self, part: int, part_refs: list, n: int, part_size: int) -> None:
        self.n = n
        self.base = part * part_size
        self.size = max(0, min(part_size, n - self.base))
        if part_refs:
            chunks = ray.get(part_refs)
            self.src = np.concatenate([c[0] for c in chunks]) - self.base
            self.dst = np.concatenate([c[1] for c in chunks])
        else:
            self.src = np.array([], dtype=np.int64)
            self.dst = np.array([], dtype=np.int64)
        self.h = np.ones(self.size, dtype=np.int64)
        self.a = np.zeros(self.size, dtype=np.int64)

    def scatter_auth(self):
        """Dense authority contributions: add h[src] at each dst."""
        cand = np.zeros(self.n, dtype=np.int64)
        if len(self.src):
            np.add.at(cand, self.dst, self.h[self.src])
        return ray.put(cand)

    def gather_auth(self, refs: list) -> int:
        a = np.zeros(self.size, dtype=np.int64)
        for cand in ray.get(list(refs)):
            a += cand[self.base : self.base + self.size]
        self.a = a
        return int(a.max()) if self.size else 0

    def a_slice(self):
        return ray.put(self.a)

    def hub_update(self, slice_refs: list) -> int:
        full = np.concatenate(ray.get(list(slice_refs)))
        h = np.zeros(self.size, dtype=np.int64)
        if len(self.src):
            np.add.at(h, self.src, full[self.dst])
        self.h = h
        return int(h.max()) if self.size else 0

    def slice_table(self):
        import pyarrow as pa

        vids = self.base + np.arange(self.size, dtype=np.int64)
        return pa.table({"vid": vids, "auth": self.a, "hub": self.h})


def hits_bsp(graph: Graph, iters: int = 2, num_parts: int | None = None) -> HITSRun:
    """Integer HITS scores after ``iters`` full (authority, hub)
    update pairs. Falls back to the Dataset engine when n outgrows the
    dense exchange. Raises on int64 overflow risk (lower ``iters``)."""
    if iters < 1:
        raise ValueError("HITS needs iters >= 1")
    n = graph.n
    if n == 0:
        return HITSRun(scores=rd.from_items([]), iterations=0)
    if n * 8 > _FULL_VEC_MAX:
        return hits_dataset(graph, iters=iters)
    if num_parts is None:
        cpus = int(ray.cluster_resources().get("CPU", 8))
        num_parts = cap_num_parts(min(256, max(4, cpus // 4)), n)
    store = EdgeShardStore.build(graph.edges, n=n, num_parts=num_parts)
    P = max(1, -(-n // store.part_size))
    per_actor = per_actor_cpus(P)
    actors = [
        _HITSShard.options(num_cpus=per_actor).remote(
            p, store.part_refs.get(p, []), n, store.part_size
        )
        for p in range(P)
    ]
    def _check(val: int, it: int) -> None:
        # the invariant each PHASE needs from the previous one: inputs
        # <= 2^61/n keep the next sum-of-<=n-terms under 2^61. Checking
        # only once per iteration would let hub_update wrap int64
        # silently (h_t can reach outdeg * a_max) before the guard ran.
        if val > _INT64_GUARD // max(1, n):
            for a in actors:
                ray.kill(a)
            raise OverflowError(
                f"HITS int64 headroom exhausted at iter {it} "
                f"(max score {val}); lower iters"
            )

    history: list[dict] = []
    for it in range(1, iters + 1):
        refs = ray.get([a.scatter_auth.remote() for a in actors])
        amax = max(ray.get([a.gather_auth.remote(refs) for a in actors]))
        _check(amax, it)  # BEFORE hub_update reads the auth vector
        slices = ray.get([a.a_slice.remote() for a in actors])
        hmax = max(ray.get([a.hub_update.remote(slices) for a in actors]))
        history.append({"iter": it, "auth_max": amax, "hub_max": hmax})
        _check(hmax, it)  # before the next iteration's scatter_auth
    tables = [a.slice_table.remote() for a in actors]
    ray.wait(tables, num_returns=len(tables))
    for a in actors:
        ray.kill(a)
    return HITSRun(
        scores=rd.from_arrow_refs(tables), iterations=iters, history=history
    )


def hits_dataset(
    graph: Graph, iters: int = 2, num_partitions: int | None = None
) -> HITSRun:
    """Dataset-engine HITS: bounded memory at ANY vertex count — the
    score vector lives as a (vid, val) Dataset, never as a dense
    array. Each update is one partitioned hash join (scores onto the
    edge table by its contribution end) plus one bucketed grouped_agg
    shuffle; vertices absent from a score table contribute 0, which an
    inner join drops for free. Integer results are identical to
    ``hits_bsp`` (tested)."""
    import pyarrow as pa

    from parallel_pagerank_ray.pipelines.graph_build import _default_join_partitions
    from parallel_pagerank_ray.stages.agg import global_agg, grouped_agg
    from parallel_pagerank_ray.util import safe_join

    if iters < 1:
        raise ValueError("HITS needs iters >= 1")
    n = graph.n
    if n == 0:
        return HITSRun(scores=rd.from_items([]), iterations=0)
    if num_partitions is None:
        num_partitions = _default_join_partitions()
    edges = graph.edges

    def ones(b: dict[str, np.ndarray]) -> dict[str, np.ndarray]:
        return {"vid": b["id"], "val": np.ones(len(b["id"]), dtype=np.int64)}

    h = rd.range(n).map_batches(ones, batch_format="numpy").materialize()
    a = None
    history: list[dict] = []

    def _weighted_sum(scores: rd.Dataset, join_on: str, group_on: str) -> rd.Dataset:
        """sum of scores[join_on-end] grouped by the other end."""
        j = safe_join(
            edges,
            scores,
            join_type="inner",
            num_partitions=num_partitions,
            on=(join_on,),
            right_on=("vid",),
        )
        return grouped_agg(
            j, [group_on], {"val": ("val", "sum")}
        ).rename_columns({group_on: "vid"}).materialize()

    for it in range(1, iters + 1):
        a = _weighted_sum(h, "src", "dst")
        amax = int(global_agg(a, {"m": ("val", "max")})["m"])
        # check BETWEEN the two sums: the hub sum can reach
        # outdeg * amax and wrap int64 before an end-of-iter guard
        if amax > _INT64_GUARD // max(1, n):
            raise OverflowError(f"HITS int64 headroom exhausted at iter {it}")
        h = _weighted_sum(a, "dst", "src")
        hmax = int(global_agg(h, {"m": ("val", "max")})["m"])
        history.append({"iter": it, "score_max": max(amax, hmax)})
        if hmax > _INT64_GUARD // max(1, n):
            raise OverflowError(f"HITS int64 headroom exhausted at iter {it}")

    # final table: every vertex, 0 where a score table has no row
    base = rd.range(n).map_batches(
        lambda b: {"vid": b["id"]}, batch_format="numpy"
    )
    out = safe_join(
        base,
        a.rename_columns({"val": "auth"}),
        join_type="left_outer",
        num_partitions=num_partitions,
        on=("vid",),
    )
    out = safe_join(
        out,
        h.rename_columns({"val": "hub"}),
        join_type="left_outer",
        num_partitions=num_partitions,
        on=("vid",),
    )

    def fill(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        z = pa.scalar(0, type=pa.int64())
        return pa.table(
            {
                "vid": t.column("vid"),
                "auth": pc.fill_null(t.column("auth"), z),
                "hub": pc.fill_null(t.column("hub"), z),
            }
        )

    return HITSRun(
        scores=out.map_batches(fill, batch_format="pyarrow"),
        iterations=iters,
        history=history,
    )
