"""Exact triangle counting (undirected simple closure of the digraph).

Standard distributed compact-forward: orient each undirected edge from
the endpoint with smaller (degree, vid) to the larger — bounding every
oriented out-degree at O(sqrt(E)), the skew-taming step (SURVEY.md §7.6,
"heaviest shuffle, needs skew salting") — then

    wedges   groupby(src).map_groups: all ordered pairs of out-neighbors
    closure  wedges ∪ oriented-edges -> groupby((a,b)).sum: a wedge
             (a,b) closes a triangle iff oriented edge (a,b) exists

Everything is Dataset-native (three groupby shuffles + one join); the
count is exact and parallelism-independent (integer arithmetic only).
Matches ``oracle.triangle_count``.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray.data as rd
from ray.data.aggregate import Count, Sum

from parallel_pagerank_ray.pipelines.graph_build import Graph, dedup_edges
from parallel_pagerank_ray.util import safe_join


def _simple_undirected(edges: rd.Dataset) -> rd.Dataset:
    """Canonical (min,max) form, self-loops dropped, deduplicated."""

    def canon(t: pa.Table) -> pa.Table:
        s, d = t.column("src"), t.column("dst")
        lo = pc.min_element_wise(s, d)
        hi = pc.max_element_wise(s, d)
        tbl = pa.table({"src": lo, "dst": hi})
        return tbl.filter(pc.invert(pc.equal(tbl.column("src"), tbl.column("dst"))))

    return dedup_edges(edges.map_batches(canon, batch_format="pyarrow"))


def triangle_count(graph: Graph, num_partitions: int | None = None) -> int:
    n = graph.n
    if n == 0:
        return 0
    assert n < (1 << 31), "orientation key needs n^2 < 2^63"
    if num_partitions is None:
        num_partitions = max(2, min(64, n // 100_000 + 2))
    und = _simple_undirected(graph.edges).materialize()

    # undirected degree per vertex (both endpoints count)
    def both_dirs(t: pa.Table) -> pa.Table:
        v = pa.concat_arrays(
            [t.column("src").combine_chunks(), t.column("dst").combine_chunks()]
        )
        return pa.table({"vid": v})

    deg = (
        und.map_batches(both_dirs, batch_format="pyarrow")
        .groupby("vid")
        .aggregate(Count(alias_name="deg"))
    )

    # attach degree to both endpoints (hash joins), orient by (deg, vid)
    deg = deg.materialize()
    e = safe_join(
        und,
        deg,
        join_type="inner",
        num_partitions=num_partitions,
        on=("src",),
        right_on=("vid",),
    ).rename_columns({"deg": "deg_src"})
    e = safe_join(
        e,
        deg,
        join_type="inner",
        num_partitions=num_partitions,
        on=("dst",),
        right_on=("vid",),
    ).rename_columns({"deg": "deg_dst"})

    nbig = np.int64(n)

    def orient(batch: dict[str, np.ndarray]) -> dict[str, np.ndarray]:
        s, d = batch["src"], batch["dst"]
        ks = batch["deg_src"].astype(np.int64) * nbig + s
        kd = batch["deg_dst"].astype(np.int64) * nbig + d
        fwd = ks < kd
        return {
            "u": np.where(fwd, s, d),
            "v": np.where(fwd, d, s),
            "kv": np.where(fwd, kd, ks),  # orientation key of the head
        }

    oriented = e.map_batches(orient, batch_format="numpy").materialize()

    def wedges(group: pd.DataFrame) -> pa.Table:
        # returns Arrow so the union below sees one block type throughout
        nb = group.sort_values("kv")["v"].to_numpy()
        m = len(nb)
        if m < 2:
            empty = np.array([], dtype=np.int64)
            return pa.table({"a": empty, "b": empty, "w": empty, "is_edge": empty})
        i, j = np.triu_indices(m, k=1)
        return pa.table(
            {
                "a": nb[i],
                "b": nb[j],
                "w": np.ones(len(i), dtype=np.int64),
                "is_edge": np.zeros(len(i), dtype=np.int64),
            }
        )

    wedge_ds = oriented.groupby("u").map_groups(wedges, batch_format="pandas")

    def edge_rows(batch: dict[str, np.ndarray]) -> dict[str, np.ndarray]:
        z = np.zeros(len(batch["u"]), dtype=np.int64)
        return {"a": batch["u"], "b": batch["v"], "w": z, "is_edge": z + 1}

    closure = wedge_ds.union(oriented.map_batches(edge_rows, batch_format="numpy"))
    per_pair = closure.groupby(["a", "b"]).aggregate(
        Sum("w", alias_name="w"), Sum("is_edge", alias_name="is_edge")
    )

    def matched(batch: dict[str, np.ndarray]) -> dict[str, np.ndarray]:
        tri = np.where(batch["is_edge"] > 0, batch["w"], 0)
        return {"tri": np.array([tri.sum()], dtype=np.int64)}

    agg = per_pair.map_batches(matched, batch_format="numpy").aggregate(
        Sum("tri", alias_name="t")
    )
    return int(agg["t"] or 0)
