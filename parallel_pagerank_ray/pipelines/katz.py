"""Katz centrality (truncated, integer-scaled) over the directed graph.

Beyond-reference capability: the classic walk-counting companion to
PageRank (the reference implements only PageRank,
/root/reference/pagerank_mpi/pagerank_mpi.c:132-231). Katz scores
vertices by attenuated counts of incoming walks of every length:

    katz[v] = sum_{k=1..L} alpha^k * walks_k[v],
    walks_k = (A^T)^k * 1   (number of directed walks of length k
                             ending at v)

With alpha = 1/2 and truncation at L the score scaled by 2^L,

    score[v] = sum_{k=1..L} 2^(L-k) * walks_k[v],

is a pure int64 quantity: bit-exact at any parallelism and
value-checkable against a DuckDB recursive CTE — the same
integer-exactness policy as HITS (pipelines/hits.py). Magnitudes grow
~(mean in-degree)^k, guarded against int64 overflow each iteration.

Engines (the HITS split, pipelines/hits.py:17-25):
- BSP actor shards when the dense n-vector exchange fits: one dense
  int64 scatter per iteration — the PageRank superstep traffic shape.
- Dataset fallback at any n: the walk-count update is one partitioned
  hash join (scores onto edges by src) + one bucketed grouped_agg
  shuffle per iteration; bounded memory, never a dense vector.
"""

from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np
import ray
import ray.data as rd

from parallel_pagerank_ray.pipelines.graph_build import Graph
from parallel_pagerank_ray.stages.csr_store import EdgeShardStore, per_actor_cpus

_FULL_VEC_MAX = 256 << 20
_INT64_GUARD = 1 << 61


@dataclass
class KatzRun:
    scores: rd.Dataset  # (vid, score) int64, score scaled by 2^L
    iterations: int
    history: list[dict] = field(default_factory=list)


@ray.remote
class _KatzShard:
    """One src-range shard: holds the walk-count slice x and the
    accumulated score slice for vids [base, base+size)."""

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
        self.x = np.ones(self.size, dtype=np.int64)  # walks_0 = 1
        self.acc = np.zeros(self.size, dtype=np.int64)

    def scatter(self):
        """Dense walk contributions: add x[src] at each dst."""
        cand = np.zeros(self.n, dtype=np.int64)
        if len(self.src):
            np.add.at(cand, self.dst, self.x[self.src])
        return ray.put(cand)

    def gather(self, refs: list, weight: int) -> int:
        """x <- sum of candidate slices; acc += weight * x."""
        x = np.zeros(self.size, dtype=np.int64)
        for cand in ray.get(list(refs)):
            x += cand[self.base : self.base + self.size]
        self.x = x
        self.acc += weight * x
        return int(x.max()) if self.size else 0

    def slice_table(self):
        import pyarrow as pa

        vids = self.base + np.arange(self.size, dtype=np.int64)
        return pa.table({"vid": vids, "score": self.acc})


def katz_bsp(
    graph: Graph, length: int = 4, num_parts: int | None = None
) -> KatzRun:
    """Integer-scaled truncated Katz scores (alpha=1/2, scaled 2^L)
    after ``length`` walk-count iterations. Falls back to the Dataset
    engine when n outgrows the dense exchange. Raises on int64
    overflow risk (lower ``length``)."""
    if length < 1:
        raise ValueError("Katz needs length >= 1")
    n = graph.n
    if n == 0:
        return KatzRun(scores=rd.from_items([]), iterations=0)
    if n * 8 > _FULL_VEC_MAX:
        return katz_dataset(graph, length=length)
    if num_parts is None:
        cpus = int(ray.cluster_resources().get("CPU", 8))
        num_parts = min(256, max(4, cpus // 4))
    store = EdgeShardStore.build(graph.edges, n=n, num_parts=num_parts)
    P = max(1, -(-n // store.part_size))
    per_actor = per_actor_cpus(P)
    actors = [
        _KatzShard.options(num_cpus=per_actor).remote(
            p, store.part_refs.get(p, []), n, store.part_size
        )
        for p in range(P)
    ]
    history: list[dict] = []
    try:
        for k in range(1, length + 1):
            weight = 1 << (length - k)
            refs = ray.get([a.scatter.remote() for a in actors])
            xmax = max(
                ray.get([a.gather.remote(refs, weight) for a in actors])
            )
            history.append({"iter": k, "walks_max": xmax})
            # next scatter sums <= n terms of <= xmax, each then
            # weighted <= 2^(L-1): both must stay under 2^61
            if xmax > _INT64_GUARD // max(1, n * (1 << (length - 1))):
                raise OverflowError(
                    f"Katz int64 headroom exhausted at iter {k} "
                    f"(max walk count {xmax}); lower length"
                )
        tables = [a.slice_table.remote() for a in actors]
        ray.wait(tables, num_returns=len(tables))
    finally:
        for a in actors:
            ray.kill(a)
    return KatzRun(
        scores=rd.from_arrow_refs(tables), iterations=length, history=history
    )


def katz_dataset(
    graph: Graph, length: int = 4, num_partitions: int | None = None
) -> KatzRun:
    """Dataset-engine Katz: bounded memory at ANY vertex count — the
    walk-count vector lives as a (vid, val) Dataset. Per iteration one
    partitioned hash join + one bucketed grouped_agg shuffle; the
    score accumulator is a lazy union of weighted walk tables folded
    by one final grouped_agg. Integer results identical to
    ``katz_bsp`` (tested)."""
    import pyarrow as pa

    from parallel_pagerank_ray.pipelines.graph_build import _default_join_partitions
    from parallel_pagerank_ray.stages.agg import global_agg, grouped_agg
    from parallel_pagerank_ray.util import safe_join

    if length < 1:
        raise ValueError("Katz needs length >= 1")
    n = graph.n
    if n == 0:
        return KatzRun(scores=rd.from_items([]), iterations=0)
    if num_partitions is None:
        num_partitions = _default_join_partitions()
    edges = graph.edges

    def ones(b: dict[str, np.ndarray]) -> dict[str, np.ndarray]:
        return {"vid": b["id"], "val": np.ones(len(b["id"]), dtype=np.int64)}

    x = rd.range(n).map_batches(ones, batch_format="numpy").materialize()
    weighted: list[rd.Dataset] = []
    history: list[dict] = []
    for k in range(1, length + 1):
        j = safe_join(
            edges,
            x,
            join_type="inner",
            num_partitions=num_partitions,
            on=("src",),
            right_on=("vid",),
        )
        x = (
            grouped_agg(j, ["dst"], {"val": ("val", "sum")})
            .rename_columns({"dst": "vid"})
            .materialize()
        )
        xmax_row = global_agg(x, {"m": ("val", "max")})
        xmax = int(xmax_row["m"]) if xmax_row["m"] is not None else 0
        history.append({"iter": k, "walks_max": xmax})
        if xmax > _INT64_GUARD // max(1, n * (1 << (length - 1))):
            raise OverflowError(
                f"Katz int64 headroom exhausted at iter {k}; lower length"
            )
        w = 1 << (length - k)

        def scale(t: pa.Table, _w: int = w) -> pa.Table:
            import pyarrow.compute as pc

            return pa.table(
                {
                    "vid": t.column("vid"),
                    "val": pc.multiply(t.column("val"), pa.scalar(_w, pa.int64())),
                }
            )

        weighted.append(x.map_batches(scale, batch_format="pyarrow"))

    acc = weighted[0]
    for w_ds in weighted[1:]:
        acc = acc.union(w_ds)
    acc = grouped_agg(acc, ["vid"], {"score": ("val", "sum")})

    # final table: every vertex, 0 where no walk ever arrived
    base = rd.range(n).map_batches(
        lambda b: {"vid": b["id"]}, batch_format="numpy"
    )
    out = safe_join(
        base,
        acc,
        join_type="left_outer",
        num_partitions=num_partitions,
        on=("vid",),
    )

    def fill(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        return pa.table(
            {
                "vid": t.column("vid"),
                "score": pc.fill_null(
                    t.column("score"), pa.scalar(0, pa.int64())
                ),
            }
        )

    return KatzRun(
        scores=out.map_batches(fill, batch_format="pyarrow"),
        iterations=length,
        history=history,
    )
