"""Synchronous label propagation (LPA) on the superstep harness.

Semantics (normative, matches ``oracle.label_propagation``): every round
each vertex simultaneously adopts the most frequent label among its
undirected neighbors, ties broken by the smallest label; isolated
vertices keep their own label; stop when no label changes or after
``max_iters`` rounds. Deterministic at any parallelism because the
tie-break is a total order.

Shape: scatter (locally combined (dst, label, cnt) votes from CSR
shards) -> gather groupby([dst, label]).sum(cnt) -> per-dst argmax pick
(map_groups) -> changed count.
"""

from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np
import ray.data as rd

from parallel_pagerank_ray.pipelines.graph_build import Graph, undirected_edges
from parallel_pagerank_ray.stages.csr_store import EdgeShardStore, LabelCountScatter


@dataclass
class LabelPropRun:
    labels: rd.Dataset  # (vid, label)
    iterations: int
    history: list[dict] = field(default_factory=list)


def _make_gather_pick(nbig: int, ps: int):
    """Vectorized per-bucket LPA step: combine (dst,label) vote counts,
    then argmax per dst with the (max count, min label) tie-break.

    Integer counts + total-order tie-break -> order-independent, exact
    at any parallelism. Replaces a per-vertex map_groups (Python call
    per vertex) with three lexsorts per bucket.
    """

    def gather_pick(g: dict[str, np.ndarray]) -> dict[str, np.ndarray]:
        dst, lab, cnt, own = g["dst"], g["label"], g["cnt"], g["own"]
        # current label per dst (exactly one ownership row per vertex)
        om = own >= 0
        odst, oown = dst[om], own[om]
        oorder = np.argsort(odst, kind="stable")
        odst, oown = odst[oorder], oown[oorder]

        # combined vote counts per (dst, label); composite key uses the
        # bucket-local dst so part_size * n < 2^63 suffices at any n
        b = np.int64(dst[0] // ps)
        key = (dst - b * ps) * np.int64(nbig) + lab
        u, inv = np.unique(key, return_inverse=True)
        cnts = np.bincount(inv, weights=cnt).astype(np.int64)
        m = cnts > 0
        d2 = (u[m] // nbig).astype(np.int64) + b * ps
        l2 = (u[m] % nbig).astype(np.int64)
        c2 = cnts[m]
        # per-dst argmax: sort (dst asc, cnt desc, label asc), take first
        order = np.lexsort((l2, -c2, d2))
        d2s, l2s = d2[order], l2[order]
        first = np.concatenate(([True], d2s[1:] != d2s[:-1])) if len(d2s) else np.array([], dtype=bool)
        win_dst, win_lab = d2s[first], l2s[first]

        chosen = oown.copy()  # isolated vertices keep their label
        pos = np.searchsorted(odst, win_dst)
        chosen[pos] = win_lab
        return {
            "vid": odst,
            "label": chosen,
            "changed": (chosen != oown).astype(np.int64),
        }

    return gather_pick


def label_propagation(
    graph: Graph,
    max_iters: int = 10,
    num_parts: int | None = None,
    edges_canonical: bool = False,
) -> LabelPropRun:
    """``edges_canonical=True`` certifies the input edge table is
    undirected-canonical (src < dst, globally distinct). The symmetric
    closure of such a table has no (u,v)/(v,u) duplicates and no self
    loops, so the closure-level dedup — an all-to-all over the DOUBLED
    edge table — is skipped. Vote counts are unchanged: each undirected
    edge still contributes exactly one vote per endpoint."""
    n = graph.n
    if n == 0:
        return LabelPropRun(labels=rd.from_items([]), iterations=0)
    if num_parts is None:
        num_parts = max(4, min(256, n // 100_000 + 4))
    und = undirected_edges(graph.edges, dedup=not edges_canonical)
    store = EdgeShardStore.build(und, n=n, num_parts=num_parts)
    assert store.part_size * n < (1 << 63), (
        "composite (local dst, label) key needs part_size * n < 2^63 — "
        "raise num_parts"
    )
    scatter_fn = LabelCountScatter(store)

    labels = (
        rd.range(n)
        .map_batches(
            lambda b: {"vid": b["id"], "label": b["id"].astype(np.int64)},
            batch_format="numpy",
        )
        .materialize()
    )

    gather_pick = _make_gather_pick(n, store.part_size)
    it = 0
    history: list[dict] = []
    while it < max_iters:
        new = (
            labels.map_batches(scatter_fn, batch_format="numpy", batch_size=None)
            .groupby("bucket")
            .map_groups(gather_pick, batch_format="numpy")
            .materialize()
        )

        def changed_partial(b: dict[str, np.ndarray]) -> dict[str, np.ndarray]:
            return {"c": np.array([b["changed"].sum()], dtype=np.int64)}

        changed = int(
            sum(
                r["c"]
                for r in new.map_batches(
                    changed_partial, batch_format="numpy"
                ).take_all()
            )
        )
        it += 1
        labels = new  # scatter reads vid/label; extra column harmless
        history.append({"iter": it, "changed": changed})
        if changed == 0:
            it -= 1  # oracle counts rounds that changed something
            break
    return LabelPropRun(labels=labels, iterations=it, history=history)
