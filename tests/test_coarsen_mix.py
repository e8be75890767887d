"""coarsen_graph and quota_mix laws — both merge paths, exact quotas."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray.data as rd

from parallel_pagerank_ray.functions.sampling import quota_mix
from parallel_pagerank_ray.pipelines.coarsen import coarsen_graph
from parallel_pagerank_ray.pipelines.graph_build import Graph
from parallel_pagerank_ray.pipelines.matching import matching_bsp
from parallel_pagerank_ray.sources.pages import powerlaw_edges


def _graph(e: np.ndarray) -> Graph:
    return Graph.from_int_edges(
        rd.from_arrow(
            pa.table(
                {
                    "src": pa.array(e[:, 0], pa.int64()),
                    "dst": pa.array(e[:, 1], pa.int64()),
                }
            )
        )
    )


def test_coarsen_laws_and_join_fallback_parity():
    e = powerlaw_edges(200, 5, seed=13)
    g = _graph(e)
    coarse = (
        coarsen_graph(g)
        .to_pandas()
        .sort_values(["csrc", "cdst"])
        .reset_index(drop=True)
    )
    # canonical simple closure of the input
    canon = {
        (min(s, d), max(s, d)) for s, d in e if s != d
    }
    pairs = matching_bsp(g).pairs.to_pandas()
    sup = np.arange(g.n, dtype=np.int64)
    sup[pairs["dst"].to_numpy()] = pairs["src"].to_numpy()
    internal = sum(
        1 for (a, b) in canon if sup[a] == sup[b]
    )
    # every matched pair's edge is internal; weights conserve edges
    assert internal >= len(pairs)
    assert coarse["w"].sum() == len(canon) - internal
    # coarse endpoints are supervertex representatives, canonical order
    reps = set(sup.tolist())
    assert set(coarse["csrc"]).issubset(reps)
    assert set(coarse["cdst"]).issubset(reps)
    assert (coarse["csrc"] < coarse["cdst"]).all()
    # the hash-join fallback (guard forced to 0) is value-identical
    coarse2 = (
        coarsen_graph(g, broadcast_max=0)
        .to_pandas()
        .sort_values(["csrc", "cdst"])
        .reset_index(drop=True)
    )
    assert coarse2.equals(coarse)


def test_quota_mix_exact_sizes_and_partition_invariance():
    n = 400
    groups = [f"g{i % 5}" for i in range(n)]
    tbl = pa.table(
        {
            "k": pa.array(np.arange(n), pa.int64()),
            "grp": pa.array(groups, pa.string()),
        }
    )
    weights = {"g0": 3, "g1": 1, "g2": 0, "g3": 2, "g4": 4}
    total, sum_w = 100, 10
    for nparts in (1, 7):
        ds = rd.from_arrow(tbl).repartition(nparts)
        out = quota_mix(ds, "k", "grp", weights, total=total, salt="t")
        df = out.to_pandas().sort_values("k").reset_index(drop=True)
        sizes = df.groupby("grp").size().to_dict()
        for gname, w in weights.items():
            want = min(80, (total * w) // sum_w) if w > 0 else 0
            assert sizes.get(gname, 0) == want, (gname, sizes)
        if nparts == 1:
            base = df
    # same selected keys regardless of partitioning
    ds7 = quota_mix(
        rd.from_arrow(tbl).repartition(7), "k", "grp", weights, 100, salt="t"
    )
    assert (
        ds7.to_pandas().sort_values("k")["k"].tolist()
        == base["k"].tolist()
    )


def test_quota_mix_quota_capped_at_group_size():
    tbl = pa.table(
        {
            "k": pa.array(np.arange(10), pa.int64()),
            "grp": pa.array(["a"] * 3 + ["b"] * 7, pa.string()),
        }
    )
    out = quota_mix(
        rd.from_arrow(tbl), "k", "grp", {"a": 9, "b": 1}, total=100
    ).to_pandas()
    sizes = out.groupby("grp").size().to_dict()
    # a's quota 100*9//10 = 90 capped at 3; b gets 100*1//10 = 10 -> 7
    assert sizes == {"a": 3, "b": 7}
