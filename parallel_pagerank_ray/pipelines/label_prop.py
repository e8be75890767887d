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
import pandas as pd
import ray.data as rd
from ray.data.aggregate import Max, Sum

from parallel_pagerank_ray.pipelines.graph_build import Graph, undirected_edges
from parallel_pagerank_ray.stages.csr_store import EdgeShardStore, LabelCountScatter


@dataclass
class LabelPropRun:
    labels: rd.Dataset  # (vid, label)
    iterations: int
    history: list[dict] = field(default_factory=list)


def _pick(group: pd.DataFrame) -> pd.DataFrame:
    own = int(group["own"].max())  # ownership row carries the current label
    votes = group[group["cnt"] > 0]
    if len(votes) == 0:
        chosen = own  # isolated vertex keeps its label
    else:
        # max count, then min label (deterministic tie-break)
        votes = votes.sort_values(["cnt", "label"], ascending=[False, True])
        chosen = int(votes["label"].iloc[0])
    return pd.DataFrame(
        {
            "vid": [int(group["dst"].iloc[0])],
            "label": np.array([chosen], dtype=np.int64),
            "changed": np.array([int(chosen != own)], dtype=np.int64),
        }
    )


def label_propagation(
    graph: Graph,
    max_iters: int = 10,
    num_parts: int | None = None,
) -> LabelPropRun:
    n = graph.n
    if n == 0:
        return LabelPropRun(labels=rd.from_items([]), iterations=0)
    assert n < (1 << 31), "composite (dst,label) key needs n^2 < 2^63"
    if num_parts is None:
        num_parts = max(4, min(256, n // 100_000 + 4))
    und = undirected_edges(graph.edges)
    store = EdgeShardStore.build(und, n=n, num_parts=num_parts)
    scatter_fn = LabelCountScatter(store)

    labels = (
        rd.range(n)
        .map_batches(
            lambda b: {"vid": b["id"], "label": b["id"].astype(np.int64)},
            batch_format="numpy",
        )
        .materialize()
    )

    it = 0
    history: list[dict] = []
    while it < max_iters:
        new = (
            labels.map_batches(scatter_fn, batch_format="numpy", batch_size=None)
            .groupby(["dst", "label"])
            .aggregate(Sum("cnt", alias_name="cnt"), Max("own", alias_name="own"))
            .groupby("dst")
            .map_groups(_pick, batch_format="pandas")
            .materialize()
        )
        changed = int(new.aggregate(Sum("changed", alias_name="c"))["c"] or 0)
        it += 1
        labels = new.select_columns(["vid", "label"]).materialize()
        history.append({"iter": it, "changed": changed})
        if changed == 0:
            it -= 1  # oracle counts rounds that changed something
            break
    return LabelPropRun(labels=labels, iterations=it, history=history)
