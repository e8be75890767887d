"""BSP actor-pool connected components: min-label fixed point on
stateful shards (same harness shape as pipelines/pagerank_actors.py).

Each of P shards holds its slice of the undirected closure's edges and
its label slice; a superstep is scatter (per-shard elementwise
``np.minimum``-combined dense int64 candidate vector, one plasma put)
followed by gather (min over incoming vectors + own labels, count
changes). Integer min is order-independent, so results are exact at any
parallelism — identical to ``oracle.connected_components``.

Full-vector mode only (n * 8 bytes <= 256 MiB per put); larger graphs
fall back to the Dataset engine (pipelines/components.py), whose
per-bucket row gather has bounded memory.
"""

from __future__ import annotations


import numpy as np
import ray

from parallel_pagerank_ray.pipelines.components import (
    ComponentsRun,
    connected_components,
)
from parallel_pagerank_ray.pipelines.graph_build import Graph, undirected_edges
from parallel_pagerank_ray.stages.csr_store import cap_num_parts, EdgeShardStore, per_actor_cpus

_FULL_VEC_MAX = 256 << 20
INT64_MAX = np.iinfo(np.int64).max


@ray.remote
class _CompShard:
    def __init__(self, part: int, part_refs: list, n: int, part_size: int) -> None:
        self.n = n
        self.base = part * part_size
        self.size = max(0, min(part_size, n - self.base))
        if part_refs:
            chunks = ray.get(part_refs)
            src = np.concatenate([c[0] for c in chunks]) - self.base
            dst = np.concatenate([c[1] for c in chunks])
        else:
            src = np.array([], dtype=np.int64)
            dst = np.array([], dtype=np.int64)
        # local CSR by src: the frontier scatter walks only the edge
        # ranges of vertices whose label changed last round.
        # EdgeShardStore's build contract (csr_store.py: block order ==
        # global src order) already delivers src-sorted chunks, so the
        # O(E log E) sort is normally a no-op — verify with one O(E)
        # pass and only sort when a caller handed us unordered refs.
        if src.size and not bool(np.all(src[1:] >= src[:-1])):
            order = np.argsort(src, kind="stable")
            src = src[order]
            dst = dst[order]
        self.src_sorted = src
        self.dst_sorted = dst
        self.indptr = np.searchsorted(
            self.src_sorted, np.arange(self.size + 1, dtype=np.int64)
        )
        self.comp = self.base + np.arange(self.size, dtype=np.int64)
        # frontier = labels that changed since they last scattered;
        # everything is fresh in round 0
        self.frontier = np.ones(self.size, dtype=bool)

    def scatter(self):
        """Dense candidate vector from FRONTIER vertices only: a label
        can only decrease, so a vertex whose label did not change since
        it last scattered cannot improve any neighbor — min-propagation
        stays exact while late rounds touch few edges."""
        cand = np.full(self.n, INT64_MAX, dtype=np.int64)
        active = np.nonzero(self.frontier)[0]
        if len(active) * 2 >= self.size:
            # dense frontier (early rounds): re-scattering unchanged
            # vertices is redundant but exact for min-propagation, and
            # one straight pass over ALL edges beats building the
            # per-vertex position index (3 repeat/cumsum allocations of
            # O(E)) when most vertices are active anyway
            if len(self.dst_sorted):
                np.minimum.at(
                    cand, self.dst_sorted, self.comp[self.src_sorted]
                )
        elif len(active):
            lens = self.indptr[active + 1] - self.indptr[active]
            m = lens > 0
            active, lens = active[m], lens[m]
            if len(active):
                starts = self.indptr[active]
                csum = np.concatenate(([0], np.cumsum(lens)[:-1]))
                pos = (
                    np.arange(int(lens.sum()))
                    - np.repeat(csum, lens)
                    + np.repeat(starts, lens)
                )
                dst_sel = self.dst_sorted[pos]
                lab_sel = self.comp[np.repeat(active, lens)]
                np.minimum.at(cand, dst_sel, lab_sel)
        return ray.put(cand)

    def gather_update(self, refs: list) -> int:
        new = self.comp.copy()
        for cand in ray.get(list(refs)):
            np.minimum(new, cand[self.base : self.base + self.size], out=new)
        self.frontier = new != self.comp
        changed = int(self.frontier.sum())
        self.comp = new
        return changed

    def comp_slice(self):
        return ray.put(self.comp)

    def compress(self, slice_refs: list) -> int:
        """Pointer-jumping: comp[v] <- comp[comp[...]] to the local
        fixpoint, using the assembled full label vector (one zero-copy
        read per peer slice). Labels only ever move to another member of
        the same component (invariant: comp[v] is a vertex id in v's
        component with comp[u] <= u), so exactness is preserved while
        the round count drops from O(diameter) to O(log n)."""
        full = np.concatenate(ray.get(list(slice_refs)))
        cur = self.comp
        while True:
            nxt = full[cur]
            if np.array_equal(nxt, cur):
                break
            cur = nxt
        moved = cur != self.comp
        self.frontier |= moved  # jumped labels must re-scatter next round
        changed = int(moved.sum())
        self.comp = cur.copy()
        return changed

    def slice_table(self):
        import pyarrow as pa

        vids = self.base + np.arange(self.size, dtype=np.int64)
        return pa.table({"vid": vids, "comp": self.comp})


def connected_components_bsp(
    graph: Graph,
    num_parts: int | None = None,
    max_iters: int = 10_000,
    local_max_edges: int = 500_000,
) -> ComponentsRun:
    """Exact weakly connected components on the BSP actor engine;
    falls back to the Dataset engine when n is too large for
    full-vector exchange. Under ``local_max_edges`` (and n <= 2M) the
    min-label + pointer-jumping fixpoint runs driver-local in dense
    numpy — identical labels (comp = min member vid at any
    parallelism), parity-forced in tests; the bound keeps mid-size
    inputs (sf0.1 benches, the 10M leg) on the BSP engine."""
    import ray.data as rd

    n = graph.n
    if n == 0:
        return ComponentsRun(components=rd.from_items([]), iterations=0)
    if n * 8 > _FULL_VEC_MAX:
        return connected_components(graph, num_parts=num_parts, max_iters=max_iters)
    from parallel_pagerank_ray.stages.csr_store import edge_count_hint

    ne = edge_count_hint(graph.edges)
    if ne is not None and ne <= local_max_edges and n <= 2_000_000:
        import pyarrow as pa

        from parallel_pagerank_ray.pipelines.biconnectivity import (
            _cc_min_label,
        )

        from parallel_pagerank_ray.util import pull_table

        et = pull_table(graph.edges, ["src", "dst"])
        comp = _cc_min_label(
            et.column("src").to_numpy(zero_copy_only=False),
            et.column("dst").to_numpy(zero_copy_only=False),
            n,
        )
        return ComponentsRun(
            components=rd.from_arrow(
                pa.table(
                    {
                        "vid": pa.array(
                            np.arange(n, dtype=np.int64), pa.int64()
                        ),
                        "comp": pa.array(comp, pa.int64()),
                    }
                )
            ).materialize(),
            iterations=1,
        )
    if num_parts is None:
        cpus = int(ray.cluster_resources().get("CPU", 8))
        num_parts = cap_num_parts(min(256, max(4, cpus // 4)), n)
    # min-propagation is duplicate-invariant: skip the closure dedup shuffle
    und = undirected_edges(graph.edges, dedup=False)
    store = EdgeShardStore.build(und, n=n, num_parts=num_parts)
    P = max(1, -(-n // store.part_size))
    per_actor = per_actor_cpus(P)
    actors = [
        _CompShard.options(num_cpus=per_actor).remote(
            p, store.part_refs.get(p, []), n, store.part_size
        )
        for p in range(P)
    ]
    it = 0
    history: list[dict] = []
    while it < max_iters:
        refs = ray.get([a.scatter.remote() for a in actors])
        changed = sum(ray.get([a.gather_update.remote(refs) for a in actors]))
        jumped = 0
        if changed:
            # pointer-jumping after each propagation round: O(log n)
            # total rounds on high-diameter graphs (vs O(diameter))
            slices = ray.get([a.comp_slice.remote() for a in actors])
            jumped = sum(ray.get([a.compress.remote(slices) for a in actors]))
        it += 1
        history.append(
            {
                "iter": it,
                "changed": changed,
                "jumped": jumped,
                "converged": changed == 0,
            }
        )
        if changed == 0:
            break
    tables = [a.slice_table.remote() for a in actors]
    ray.wait(tables, num_returns=len(tables))
    for a in actors:
        ray.kill(a)
    return ComponentsRun(
        components=rd.from_arrow_refs(tables), iterations=it, history=history
    )
