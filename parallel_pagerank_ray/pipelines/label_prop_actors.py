"""BSP actor-pool label propagation: sparse vote exchange on stateful
shards (same harness shape as pagerank_actors / components_actors).

LPA votes are (dst, label, count) rows — too sparse for the dense
vector exchange CC uses — so each superstep is:

    scatter  every shard locally combines its outgoing votes per
             (destination, label) and puts ONE (key, cnt) array pair per
             destination shard in plasma
    gather   every shard merges its incoming vote arrays (np.add.at on
             composite keys), picks argmax with the (max count, min
             label) tie-break, counts changes

Semantics identical to ``pipelines.label_prop`` / ``oracle.
label_propagation``: synchronous rounds, undirected simple neighbors,
isolated vertices keep their label, stop when nothing changes (the
returned iteration count excludes the final no-change round, matching
the oracle). Integer counts + total-order tie-break -> exact at any
parallelism.

Per-superstep cost is two actor rounds (~ms) instead of a Dataset
execution (~1.5 s) — the same fixed-cost argument as pagerank_actors.
Composite (local dst, label) keys need part_size * n < 2^63; beyond
that the Dataset engine (bounded memory) is the fallback.
"""

from __future__ import annotations


import numpy as np
import ray

from parallel_pagerank_ray.pipelines.graph_build import Graph, undirected_edges
from parallel_pagerank_ray.pipelines.label_prop import LabelPropRun, label_propagation
from parallel_pagerank_ray.stages.csr_store import cap_num_parts, EdgeShardStore, per_actor_cpus


@ray.remote
class _LPAShard:
    def __init__(
        self, part: int, part_refs: list, n: int, part_size: int
    ) -> None:
        self.n = n
        self.part_size = part_size
        self.base = part * part_size
        self.size = max(0, min(part_size, n - self.base))
        if part_refs:
            chunks = ray.get(part_refs)
            src = np.concatenate([c[0] for c in chunks]) - self.base
            dst = np.concatenate([c[1] for c in chunks])
            if len(chunks[0]) > 2:
                from parallel_pagerank_ray.stages.csr_store import int_weights

                w = int_weights(np.concatenate([c[2] for c in chunks]))
            else:
                w = None
        else:
            src = np.array([], dtype=np.int64)
            dst = np.array([], dtype=np.int64)
            w = None
        # pre-bucket edges by destination shard once (reused every round)
        db = dst // part_size
        order = np.argsort(db, kind="stable")
        self.src = src[order]
        self.w = w[order] if w is not None else None
        self.dst_local = (dst - db * part_size)[order]
        db_s = db[order]
        self.bucket_ids = np.unique(db_s).astype(np.int64)
        bounds = np.searchsorted(db_s, self.bucket_ids, "left").tolist() + [
            len(db_s)
        ]
        self._slices = [
            (int(bounds[i]), int(bounds[i + 1]))
            for i in range(len(self.bucket_ids))
        ]
        self.labels = self.base + np.arange(self.size, dtype=np.int64)

    def scatter(self) -> list:
        """[(dest_shard, ref((keys, cnts))), ...]: locally-combined vote
        counts keyed by local_dst * n + label. With edge weights the
        vote mass is the int64 weight sum instead of the edge count —
        integer arithmetic either way, so the tally stays exact."""
        out = []
        lab = self.labels
        nbig = np.int64(self.n)
        for bid, (lo, hi) in zip(self.bucket_ids, self._slices):
            key = self.dst_local[lo:hi] * nbig + lab[self.src[lo:hi]]
            if self.w is None:
                u, cnt = np.unique(key, return_counts=True)
                cnt = cnt.astype(np.int64)
            else:
                # int64 accumulation (bincount's float weights would
                # round above 2^53)
                u, inv = np.unique(key, return_inverse=True)
                cnt = np.zeros(len(u), dtype=np.int64)
                np.add.at(cnt, inv, self.w[lo:hi])
            out.append((int(bid), ray.put((u, cnt))))
        return out

    def gather_pick(self, refs: list) -> int:
        """Merge incoming votes, per-dst argmax with (max count, min
        label) tie-break; isolated/no-vote vertices keep their label.
        Returns the change count."""
        incoming = ray.get(list(refs))
        if not incoming:
            return 0
        keys = np.concatenate([k for k, _ in incoming])
        cnts = np.concatenate([c for _, c in incoming])
        u, inv = np.unique(keys, return_inverse=True)
        tot = np.zeros(len(u), dtype=np.int64)
        np.add.at(tot, inv, cnts)
        nbig = np.int64(self.n)
        d = (u // nbig).astype(np.int64)  # local dst
        l = (u % nbig).astype(np.int64)
        # per-dst argmax: sort (dst asc, cnt desc, label asc), take first
        order = np.lexsort((l, -tot, d))
        ds_, ls_ = d[order], l[order]
        first = (
            np.concatenate(([True], ds_[1:] != ds_[:-1]))
            if len(ds_)
            else np.array([], dtype=bool)
        )
        win_d, win_l = ds_[first], ls_[first]
        new = self.labels.copy()
        new[win_d] = win_l
        changed = int((new != self.labels).sum())
        self.labels = new
        return changed

    def slice_table(self):
        import pyarrow as pa

        vids = self.base + np.arange(self.size, dtype=np.int64)
        return pa.table({"vid": vids, "label": self.labels})


def label_propagation_bsp(
    graph: Graph,
    max_iters: int = 10,
    num_parts: int | None = None,
    edges_canonical: bool = False,
    edges_symmetric: bool = False,
) -> LabelPropRun:
    """Synchronous LPA on the BSP actor engine; exact match to
    ``oracle.label_propagation`` (tested). Falls back to the Dataset
    engine when the composite vote key would overflow int64.

    ``edges_canonical=True``: input is undirected-canonical (src < dst,
    globally distinct), so the symmetric closure creates no duplicates
    and its dedup shuffle (an all-to-all over the doubled edge table)
    is skipped. Vote counts are identical either way.

    ``edges_symmetric=True``: input already contains every undirected
    edge in BOTH directions — the closure step is skipped entirely.

    A ``w`` column makes the votes WEIGHTED (mass = int64 weight sum
    per label; same (max mass, min label) tie-break); weighted input
    must be passed with ``edges_symmetric=True`` — the closure builder
    drops the weight column, so asymmetric weighted input is rejected
    rather than silently half-weighted. Matches
    ``oracle.label_propagation_weighted``.
    """
    import ray.data as rd

    n = graph.n
    if n == 0:
        return LabelPropRun(labels=rd.from_items([]), iterations=0)
    if num_parts is None:
        cpus = int(ray.cluster_resources().get("CPU", 8))
        num_parts = cap_num_parts(min(256, max(4, cpus // 4)), n)
    try:
        weighted = "w" in (graph.edges.schema().names or [])
    except Exception:
        weighted = False
    if weighted and not edges_symmetric:
        raise ValueError(
            "weighted LPA input must be the pre-built symmetric "
            "weighted closure; pass edges_symmetric=True to certify"
        )
    if edges_symmetric:
        und = graph.edges
    else:
        und = undirected_edges(graph.edges, dedup=not edges_canonical)
    store = EdgeShardStore.build(und, n=n, num_parts=num_parts)
    if store.part_size * n >= (1 << 63):
        if weighted:
            raise ValueError(
                "composite vote key would overflow int64 and the "
                "Dataset LPA fallback is unweighted; reduce part count"
            )
        return label_propagation(
            graph,
            max_iters=max_iters,
            num_parts=num_parts,
            edges_canonical=edges_canonical,
        )
    P = max(1, -(-n // store.part_size))
    per_actor = per_actor_cpus(P)
    actors = [
        _LPAShard.options(num_cpus=per_actor).remote(
            p, store.part_refs.get(p, []), n, store.part_size
        )
        for p in range(P)
    ]
    it = 0
    history: list[dict] = []
    while it < max_iters:
        # a no-change round leaves labels identical, so no rollback is
        # needed — only the iteration count bookkeeping differs (oracle
        # counts rounds that changed something)
        mats = ray.get([a.scatter.remote() for a in actors])
        inbox: list[list] = [[] for _ in range(P)]
        for row in mats:
            for bid, ref in row:
                inbox[bid].append(ref)
        changed = sum(
            ray.get([actors[p].gather_pick.remote(inbox[p]) for p in range(P)])
        )
        it += 1
        history.append({"iter": it, "changed": changed})
        if changed == 0:
            it -= 1  # oracle counts rounds that changed something
            break
    tables = [a.slice_table.remote() for a in actors]
    ray.wait(tables, num_returns=len(tables))
    for a in actors:
        ray.kill(a)
    return LabelPropRun(
        labels=rd.from_arrow_refs(tables), iterations=it, history=history
    )
