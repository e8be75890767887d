"""parallel_pagerank_ray — a Ray-Data-native link-graph analytics engine.

Built from scratch with the query/data-processing capabilities of the
reference `lavanyaarathi/Parallel-PageRank` (an MPI power-iteration
PageRank over a CSR graph, /root/reference/pagerank_mpi/pagerank_mpi.c),
re-expressed as streaming `ray.data.Dataset` pipelines:

- pages (Common-Crawl-style Parquet) -> extract text+links (map_batches)
- links -> vertices -> deduplicated edge table -> degrees (groupby shuffles)
- PageRank / connected components / label propagation / triangle count as
  scatter (CSR-shard actor pool) -> gather (groupby on dst) supersteps
- training-data ops: exact & near dedup, ANN, text analysis

Nothing here calls ray.init()/ray.shutdown(); the caller owns the session.
"""

__version__ = "0.1.0"

# Lazy re-exports of the user-facing API (PEP 562): keeps
# `import parallel_pagerank_ray` free of ray/numpy import cost until a
# symbol is actually used.
_EXPORTS = {
    "Graph": "parallel_pagerank_ray.pipelines.graph_build",
    "pagerank": "parallel_pagerank_ray.pipelines.pagerank",
    "pagerank_bsp": "parallel_pagerank_ray.pipelines.pagerank_actors",
    "incremental_pagerank": "parallel_pagerank_ray.pipelines.incremental",
    "connected_components": "parallel_pagerank_ray.pipelines.components",
    "connected_components_bsp": "parallel_pagerank_ray.pipelines.components_actors",
    "label_propagation": "parallel_pagerank_ray.pipelines.label_prop",
    "label_propagation_bsp": "parallel_pagerank_ray.pipelines.label_prop_actors",
    "triangle_count": "parallel_pagerank_ray.pipelines.triangles",
    "exact_dedup": "parallel_pagerank_ray.pipelines.dedup",
    "minhash_lsh_candidates": "parallel_pagerank_ray.pipelines.dedup",
    "simhash_candidates": "parallel_pagerank_ray.pipelines.dedup",
    "knn_brute": "parallel_pagerank_ray.pipelines.similarity",
    "knn_lsh": "parallel_pagerank_ray.pipelines.similarity",
    "knn_ivf": "parallel_pagerank_ray.pipelines.similarity",
    "asof_join": "parallel_pagerank_ray.pipelines.events",
    "sessionize": "parallel_pagerank_ray.pipelines.events",
    "range_join": "parallel_pagerank_ray.pipelines.relational",
    "resumable_write_parquet": "parallel_pagerank_ray.state.sink",
}

__all__ = sorted(_EXPORTS)


def __getattr__(name: str):
    if name in _EXPORTS:
        import importlib

        return getattr(importlib.import_module(_EXPORTS[name]), name)
    raise AttributeError(f"module {__name__!r} has no attribute {name!r}")
