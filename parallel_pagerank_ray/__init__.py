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
