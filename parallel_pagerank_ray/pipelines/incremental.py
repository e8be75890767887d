"""Incremental PageRank: fold delta edges into an existing graph and
warm-start from the previous ranks.

Power iteration converges to the same fixpoint from any start vector;
when the graph changed little, starting from the previous run's ranks
cuts the iteration count (tested: strictly fewer iterations than cold
on a one-edge delta). The reference has no incremental path — an MPI
job recomputes from scratch.

Only integer-vid graphs are supported: their vertex ids are stable
under edge additions (``Graph.from_int_edges`` keeps the ids as given).
Url-keyed graphs re-enumerate vids when new urls appear, so a previous
rank vector does not align — rebuild and run cold there, or persist the
url->vid mapping and remap explicitly.
"""

from __future__ import annotations

import numpy as np
import ray.data as rd

from parallel_pagerank_ray.pipelines.graph_build import Graph, dedup_edges
from parallel_pagerank_ray.pipelines.pagerank_actors import (
    BSPPageRankRun,
    pagerank_bsp,
)


def incremental_pagerank(
    old_graph: Graph,
    old_ranks: np.ndarray,
    delta_edges: rd.Dataset,
    **pagerank_kwargs,
) -> tuple[Graph, BSPPageRankRun]:
    """(old graph, ranks indexed by vid, delta (src, dst) edges) ->
    (merged graph, warm-started run).

    New edges union + dedup with the old edge table (one bucketed
    distinct — the delta never rescans old pages); vertices appearing
    only in the delta extend the id space and start at 1/n_new like a
    cold vertex. At web scale pass ``old_graph`` as the persisted
    ``Graph.load`` artifact and ranks from the last checkpoint.
    """
    merged = dedup_edges(old_graph.edges.union(delta_edges))
    g2 = Graph.from_int_edges(merged, dedup=False)
    old_ranks = np.asarray(old_ranks, dtype=np.float64)
    init = np.full(g2.n, 1.0 / g2.n, dtype=np.float64)
    init[: len(old_ranks)] = old_ranks
    run = pagerank_bsp(g2, init_ranks=init, **pagerank_kwargs)
    return g2, run


def incremental_components(
    base_labels: rd.Dataset,
    delta_edges: rd.Dataset,
    broadcast_max: int = 5_000_000,
    num_partitions: int | None = None,
) -> rd.Dataset:
    """Fold a batch of NEW edges into an existing min-label components
    labeling without recomputing over the base graph: (vid, comp)
    equal to a full CC run over base ∪ delta (tested + SQL-gated).

    Incremental view maintenance for the webgraph: a crawl round adds
    links; only the LABEL-CONTRACTION graph (one node per base
    component touched by the delta, one edge per delta edge whose
    endpoints disagree) needs solving — its size is bounded by the
    DELTA, never the corpus. Steps:

      1. two partitioned hash joins attach endpoint labels to the
         delta (an endpoint unknown to the base keeps itself as its
         label — new vertices are singletons in min-label CC; note the
         OUTPUT covers exactly ``base_labels``' vertex set, so callers
         introducing brand-new vids union their singleton rows into
         ``base_labels`` first);
      2. the distinct disagreeing label pairs form the contraction
         graph; while it fits ``broadcast_max`` a driver union-find
         resolves it exactly (min label per merged group — the only
         driver materialization, delta-bounded); beyond the guard the
         pairs recurse through the Dataset CC engine;
      3. one broadcast lookup remaps base labels (np.searchsorted on
         the sorted touched-label array; untouched labels pass through
         unchanged).
    """
    import pyarrow as pa
    import pyarrow.compute as pc
    import ray

    from parallel_pagerank_ray.pipelines.graph_build import (
        _default_join_partitions,
    )
    from parallel_pagerank_ray.stages.agg import distinct
    from parallel_pagerank_ray.util import count_rows_once, safe_join

    if num_partitions is None:
        num_partitions = _default_join_partitions()
    # engines may carry internal columns (the Dataset CC's convergence
    # flags) — the contract here is exactly (vid, comp)
    base_labels = base_labels.select_columns(["vid", "comp"])

    def attach(edges: rd.Dataset, key: str, out: str) -> rd.Dataset:
        j = safe_join(
            edges,
            base_labels.rename_columns({"vid": "__v", "comp": out}),
            join_type="left_outer",
            num_partitions=num_partitions,
            on=(key,),
            right_on=("__v",),
        )

        def fill(t: pa.Table) -> pa.Table:
            cols = {
                c: t.column(c)
                for c in t.column_names
                if c not in ("__v", out)
            }
            cols[out] = pc.coalesce(t.column(out), t.column(key))
            return pa.table(cols)

        return j.map_batches(fill, batch_format="pyarrow")

    lab = attach(attach(delta_edges, "src", "ca"), "dst", "cb")
    pairs = distinct(
        lab.map_batches(
            lambda t: t.select(["ca", "cb"]).filter(
                pc.not_equal(t.column("ca"), t.column("cb"))
            ),
            batch_format="pyarrow",
        ),
        ["ca", "cb"],
    )
    n_pairs, pairs = count_rows_once(pairs)
    if n_pairs == 0:
        return base_labels
    if n_pairs <= broadcast_max:
        tbls = [
            t for t in ray.get(pairs.to_arrow_refs()) if t.num_rows
        ]
        ca = np.concatenate([t.column("ca").to_numpy() for t in tbls])
        cb = np.concatenate([t.column("cb").to_numpy() for t in tbls])
        # driver union-find with min-label roots
        parent: dict[int, int] = {}

        def find(x: int) -> int:
            r = x
            while parent.get(r, r) != r:
                r = parent[r]
            while parent.get(x, x) != x:
                parent[x], x = r, parent[x]
            return r

        for a, b in zip(ca.tolist(), cb.tolist()):
            ra, rb = find(a), find(b)
            if ra != rb:
                lo, hi = (ra, rb) if ra < rb else (rb, ra)
                parent[hi] = lo
        touched = sorted(parent)
        keys = np.array(touched, dtype=np.int64)
        vals = np.array([find(k) for k in touched], dtype=np.int64)
        mapping_ref = ray.put((keys, vals))

        def remap(t: pa.Table) -> pa.Table:
            k, v = ray.get(mapping_ref)
            comp = t.column("comp").to_numpy(zero_copy_only=False)
            idx = np.searchsorted(k, comp)
            idx = np.clip(idx, 0, max(len(k) - 1, 0))
            hit = (len(k) > 0) & (k[idx] == comp) if len(k) else np.zeros(
                len(comp), dtype=bool
            )
            out = np.where(hit, v[idx] if len(k) else comp, comp)
            return pa.table({"vid": t.column("vid"), "comp": out})

        return base_labels.map_batches(remap, batch_format="pyarrow")

    # scale fallback: solve the contraction graph with the BSP CC
    # engine (labels as vids; self-falls-back to the Dataset engine
    # past the full-vector bound), then remap via a partitioned join
    from parallel_pagerank_ray.pipelines.components_actors import (
        connected_components_bsp as connected_components,
    )
    from parallel_pagerank_ray.pipelines.graph_build import Graph

    cg = Graph.from_int_edges(
        pairs.rename_columns({"ca": "src", "cb": "dst"}), dedup=False
    )
    sol = connected_components(cg).components
    j = safe_join(
        base_labels,
        sol.rename_columns({"vid": "__l", "comp": "__r"}),
        join_type="left_outer",
        num_partitions=num_partitions,
        on=("comp",),
        right_on=("__l",),
    )

    def fold(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "vid": t.column("vid"),
                "comp": pc.coalesce(t.column("__r"), t.column("comp")),
            }
        )

    return j.map_batches(fold, batch_format="pyarrow")
