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
