"""Community quality statistics: integer-exact modularity sufficient
statistics per community over the simple undirected closure.

Beyond-reference capability: given any (vid, label) assignment (LPA,
CC, or external), emit per community

    size            member count
    deg_sum         sum of closure degrees over members (2m_c + ext)
    internal_edges  canonical edges with both endpoints in the community

— the sufficient statistics of Newman modularity
(Q = Σ_c [ internal_c/m − (deg_sum_c / 2m)² ]); the statistics are
int64-exact and SQL-value-checkable, the float Q is one driver-side
fold the caller owns (cross-community float accumulation is excluded
from the value gate by policy).

Scale shape: the label attachment is a broadcast vector when n·8 B
fits plasma comfortably and two hash joins beyond; every downstream
row is a per-batch pre-combined (label, partial) triple, so ONE
bucketed shuffle produces the result regardless of community count.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data as rd

from parallel_pagerank_ray.pipelines.graph_build import Graph
from parallel_pagerank_ray.stages.agg import grouped_agg
from parallel_pagerank_ray.util import safe_join


def _stat_rows(
    ls: np.ndarray, ld: np.ndarray
) -> dict[str, np.ndarray]:
    """Per-batch combined (label, size=0, deg_sum, internal) rows from
    the two endpoint-label arrays of canonical edges."""
    cat = np.concatenate([ls, ld])
    u, c = np.unique(cat, return_counts=True)
    rows = {
        "label": u,
        "size": np.zeros(len(u), dtype=np.int64),
        "deg_sum": c.astype(np.int64),
        "internal_edges": np.zeros(len(u), dtype=np.int64),
    }
    m = ls == ld
    if m.any():
        ui, ci = np.unique(ls[m], return_counts=True)
        rows2 = {
            "label": ui,
            "size": np.zeros(len(ui), dtype=np.int64),
            "deg_sum": np.zeros(len(ui), dtype=np.int64),
            "internal_edges": ci.astype(np.int64),
        }
        rows = {k: np.concatenate([rows[k], rows2[k]]) for k in rows}
    return rows


def community_stats(
    graph: Graph,
    labels: rd.Dataset,
    edges_canonical: bool = False,
    num_partitions: int | None = None,
    num_buckets: int | None = None,
    broadcast_max_bytes: int = 256 << 20,
) -> rd.Dataset:
    """(label, size, deg_sum, internal_edges) per community.

    ``labels`` is a (vid, label) Dataset covering every vertex;
    ``edges_canonical`` certifies ``graph.edges`` is already the simple
    undirected canonical form (src < dst, distinct, no self loops)."""
    n = graph.n
    if edges_canonical:
        canon = graph.edges
    else:
        from parallel_pagerank_ray.pipelines.triangles import _simple_undirected

        canon = _simple_undirected(graph.edges)

    def size_rows(t: pa.Table) -> pa.Table:
        u, c = np.unique(t.column("label").to_numpy(), return_counts=True)
        z = np.zeros(len(u), dtype=np.int64)
        return pa.table(
            {
                "label": u,
                "size": c.astype(np.int64),
                "deg_sum": z,
                "internal_edges": z,
            }
        )

    sizes = labels.select_columns(["label"]).map_batches(
        size_rows, batch_format="pyarrow"
    )

    if n * 8 <= broadcast_max_bytes:
        lab_vec = np.full(n, -1, dtype=np.int64)
        for blk in ray.get(labels.to_arrow_refs()):
            if blk.num_rows:
                lab_vec[blk.column("vid").to_numpy()] = blk.column(
                    "label"
                ).to_numpy()
        lab_ref = ray.put(lab_vec)

        def edge_rows(batch: dict[str, np.ndarray]) -> dict[str, np.ndarray]:
            lab = ray.get(lab_ref)
            return _stat_rows(lab[batch["src"]], lab[batch["dst"]])

        edge_stats = canon.map_batches(edge_rows, batch_format="numpy")
    else:
        if num_partitions is None:
            cpus = int(ray.cluster_resources().get("CPU", 8))
            num_partitions = max(8, cpus)
        e = safe_join(
            canon,
            labels,
            join_type="inner",
            num_partitions=num_partitions,
            on=("src",),
            right_on=("vid",),
        ).rename_columns({"label": "ls"})
        e = safe_join(
            e.select_columns(["dst", "ls"]),
            labels,
            join_type="inner",
            num_partitions=num_partitions,
            on=("dst",),
            right_on=("vid",),
        ).rename_columns({"label": "ld"})

        def edge_rows_joined(batch: dict[str, np.ndarray]) -> dict[str, np.ndarray]:
            return _stat_rows(
                batch["ls"].astype(np.int64), batch["ld"].astype(np.int64)
            )

        edge_stats = e.map_batches(edge_rows_joined, batch_format="numpy")

    return grouped_agg(
        sizes.union(edge_stats),
        ["label"],
        {
            "size": ("size", "sum"),
            "deg_sum": ("deg_sum", "sum"),
            "internal_edges": ("internal_edges", "sum"),
        },
        num_buckets=num_buckets,
    )


def modularity(stats: pd.DataFrame) -> float:
    """Driver-side Newman modularity from the exact statistics
    (float fold — outside the bit-exact family by design)."""
    two_m = float(stats["deg_sum"].sum())
    if two_m == 0:
        return 0.0
    m = two_m / 2.0
    return float(
        (stats["internal_edges"] / m - (stats["deg_sum"] / two_m) ** 2).sum()
    )


def rich_club(
    graph,
    ks: tuple[int, ...] = (1, 2, 4, 8, 16, 32),
    broadcast_max: int = 50_000_000,
) -> rd.Dataset:
    """Rich-club statistics (Zhou & Mondragon 2004): for each degree
    threshold k, the subgraph induced by vertices of closure degree > k
    — (k, n_nodes, n_edges, phi) with phi = (2.0*E_k) / (N_k*(N_k-1)),
    the edge density among the "rich" vertices (0.0 when N_k < 2).

    Integer counts are exact; phi is one product + one division of
    exact int64 operands (bit-identical numpy/DuckDB per the float
    policy). Scale shape: one degree aggregate, two partitioned hash
    joins attaching endpoint degrees to the canonical edge half, then
    per-batch partial counts per threshold — the shuffle after the
    joins moves |ks| rows per batch.
    """
    from parallel_pagerank_ray.pipelines.graph_build import (
        _default_join_partitions,
        undirected_edges,
    )
    from parallel_pagerank_ray.stages.agg import grouped_agg
    from parallel_pagerank_ray.util import (
        count_rows_once,
        drop_empty_blocks,
        safe_join,
    )

    ks = tuple(sorted(set(int(k) for k in ks)))
    num_partitions = _default_join_partitions()
    und = undirected_edges(graph.edges, dedup=True).materialize()

    deg = grouped_agg(
        und.map_batches(
            lambda t: pa.table(
                {
                    "vid": t.column("src"),
                    "one": pa.array(
                        np.ones(t.num_rows, dtype=np.int64), pa.int64()
                    ),
                }
            ),
            batch_format="pyarrow",
        ),
        ["vid"],
        {"d": ("one", "sum")},
    ).materialize()

    half = und.map_batches(
        lambda t: t.filter(pc.less(t.column("src"), t.column("dst"))),
        batch_format="pyarrow",
    )
    n_deg, deg = count_rows_once(deg)
    if n_deg <= broadcast_max:
        # broadcast fast path: the degree table ships once via ray.put
        # and both endpoint attaches become zero-copy searchsorted
        # lookups inside the edge partial — no joins. Fallback below is
        # identical (tested by shrinking the guard).
        import ray

        tbls = [t for t in ray.get(deg.to_arrow_refs()) if t.num_rows]
        dv = np.concatenate([t.column("vid").to_numpy() for t in tbls])
        dd = np.concatenate([t.column("d").to_numpy() for t in tbls])
        order = np.argsort(dv)
        deg_ref = ray.put((dv[order], dd[order]))
        j = half

        def edge_partial(t: pa.Table) -> pa.Table:
            keys, vals = ray.get(deg_ref)
            # every edge endpoint has degree >= 1 -> exact hits
            da = vals[np.searchsorted(keys, t.column("src").to_numpy())]
            db = vals[np.searchsorted(keys, t.column("dst").to_numpy())]
            md = np.minimum(da, db)
            return pa.table(
                {
                    "k": pa.array(np.array(ks, dtype=np.int64)),
                    "n_edges": pa.array(
                        np.array(
                            [(md > k).sum() for k in ks], dtype=np.int64
                        )
                    ),
                }
            )

    else:
        j = safe_join(
            safe_join(
                half,
                deg.rename_columns({"vid": "va", "d": "da"}),
                join_type="inner",
                num_partitions=num_partitions,
                on=("src",),
                right_on=("va",),
            ),
            deg.rename_columns({"vid": "vb", "d": "db"}),
            join_type="inner",
            num_partitions=num_partitions,
            on=("dst",),
            right_on=("vb",),
        )

        def edge_partial(t: pa.Table) -> pa.Table:
            md = np.minimum(
                t.column("da").to_numpy(zero_copy_only=False),
                t.column("db").to_numpy(zero_copy_only=False),
            )
            return pa.table(
                {
                    "k": pa.array(np.array(ks, dtype=np.int64)),
                    "n_edges": pa.array(
                        np.array(
                            [(md > k).sum() for k in ks], dtype=np.int64
                        )
                    ),
                }
            )

    def node_partial(t: pa.Table) -> pa.Table:
        d = t.column("d").to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "k": pa.array(np.array(ks, dtype=np.int64)),
                "n_nodes": pa.array(
                    np.array([(d > k).sum() for k in ks], dtype=np.int64)
                ),
            }
        )

    e_cnt = grouped_agg(
        drop_empty_blocks(j.map_batches(edge_partial, batch_format="pyarrow")),
        ["k"],
        {"n_edges": ("n_edges", "sum")},
        num_buckets=1,
    )
    n_cnt = grouped_agg(
        drop_empty_blocks(
            deg.map_batches(node_partial, batch_format="pyarrow")
        ),
        ["k"],
        {"n_nodes": ("n_nodes", "sum")},
        num_buckets=1,
    )
    out = safe_join(
        n_cnt, e_cnt, join_type="left_outer", num_partitions=2, on=("k",)
    )

    def finish(df: pd.DataFrame) -> pd.DataFrame:
        nn = df["n_nodes"].astype(np.int64).to_numpy()
        ee = df["n_edges"].fillna(0).astype(np.int64).to_numpy()
        phi = np.where(nn >= 2, (2.0 * ee) / np.maximum(nn * (nn - 1), 1), 0.0)
        return pd.DataFrame(
            {
                "k": df["k"].astype(np.int64),
                "n_nodes": nn,
                "n_edges": ee,
                "phi": phi,
            }
        )

    return out.map_batches(finish, batch_format="pandas")


def community_graph(
    graph,
    labels: rd.Dataset,
    num_partitions: int | None = None,
    broadcast_max: int = 50_000_000,
) -> rd.Dataset:
    """Contract the graph by a (vid, label) assignment into the
    weighted community supergraph: (label_a, label_b, w) with
    label_a <= label_b canonical, w = canonical closure edges between
    the two communities (label_a == label_b rows count internal
    edges) — the coarsening step of multilevel graph algorithms
    (Louvain's aggregation phase / multilevel partitioning).

    Scale shape: two partitioned hash joins attach endpoint labels to
    the canonical closure half, then one bucketed grouped_agg on the
    canonical label pair; the supergraph is community-count-sized.
    """
    from parallel_pagerank_ray.pipelines.graph_build import (
        _default_join_partitions,
        undirected_edges,
    )
    from parallel_pagerank_ray.stages.agg import grouped_agg
    from parallel_pagerank_ray.util import safe_join

    from parallel_pagerank_ray.util import count_rows_once

    if num_partitions is None:
        num_partitions = _default_join_partitions()
    labels = labels.select_columns(["vid", "label"])
    half = undirected_edges(graph.edges, dedup=True).map_batches(
        lambda t: t.filter(pc.less(t.column("src"), t.column("dst"))),
        batch_format="pyarrow",
    )
    n_lab, labels = count_rows_once(labels)
    if n_lab <= broadcast_max:
        # broadcast fast path: the label table ships once via ray.put;
        # both endpoint attaches become searchsorted lookups (no joins)
        tbls = [t for t in ray.get(labels.to_arrow_refs()) if t.num_rows]
        lv = np.concatenate([t.column("vid").to_numpy() for t in tbls])
        ll = np.concatenate([t.column("label").to_numpy() for t in tbls])
        order = np.argsort(lv)
        lab_ref = ray.put((lv[order], ll[order]))

        def canon_b(t: pa.Table) -> pa.Table:
            keys, vals = ray.get(lab_ref)
            la = vals[np.searchsorted(keys, t.column("src").to_numpy())]
            lb = vals[np.searchsorted(keys, t.column("dst").to_numpy())]
            return pa.table(
                {
                    "label_a": np.minimum(la, lb),
                    "label_b": np.maximum(la, lb),
                    "one": np.ones(len(la), dtype=np.int64),
                }
            )

        return grouped_agg(
            half.map_batches(canon_b, batch_format="pyarrow"),
            ["label_a", "label_b"],
            {"w": ("one", "sum")},
        )
    j = safe_join(
        safe_join(
            half,
            labels.rename_columns({"vid": "va", "label": "la"}),
            join_type="inner",
            num_partitions=num_partitions,
            on=("src",),
            right_on=("va",),
        ),
        labels.rename_columns({"vid": "vb", "label": "lb"}),
        join_type="inner",
        num_partitions=num_partitions,
        on=("dst",),
        right_on=("vb",),
    )

    def canon(t: pa.Table) -> pa.Table:
        la = t.column("la").to_numpy(zero_copy_only=False)
        lb = t.column("lb").to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "label_a": np.minimum(la, lb),
                "label_b": np.maximum(la, lb),
                "one": np.ones(len(la), dtype=np.int64),
            }
        )

    return grouped_agg(
        j.map_batches(canon, batch_format="pyarrow"),
        ["label_a", "label_b"],
        {"w": ("one", "sum")},
    )
