"""community_stats vs direct computation — int64-exact on both the
broadcast and join paths; modularity sanity."""

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data as rd

from parallel_pagerank_ray.pipelines.community import community_stats, modularity
from parallel_pagerank_ray.pipelines.graph_build import Graph
from parallel_pagerank_ray.sources.edge_list import edges_dataset


def _direct(n, e, lab):
    canon = set()
    for u, v in np.asarray(e).reshape(-1, 2):
        u, v = int(u), int(v)
        if u != v:
            canon.add((min(u, v), max(u, v)))
    out: dict[int, list[int]] = {}
    for v in range(n):
        out.setdefault(int(lab[v]), [0, 0, 0])[0] += 1
    for u, v in canon:
        out[int(lab[u])][1] += 1
        out[int(lab[v])][1] += 1
        if lab[u] == lab[v]:
            out[int(lab[u])][2] += 1
    return {
        k: tuple(vals) for k, vals in out.items()
    }  # label -> (size, deg_sum, internal)


def _labels_ds(lab):
    return rd.from_arrow(
        pa.table(
            {
                "vid": np.arange(len(lab), dtype=np.int64),
                "label": np.asarray(lab, dtype=np.int64),
            }
        )
    ).repartition(3)


def _got(stats_ds):
    df = stats_ds.to_pandas()
    return {
        int(r["label"]): (int(r["size"]), int(r["deg_sum"]), int(r["internal_edges"]))
        for _, r in df.iterrows()
    }


def test_community_stats_exact(graphs):
    for name in ("small", "medium", "two_comps"):
        n, e = graphs[name]
        g = Graph.from_int_edges(edges_dataset(e, num_blocks=2))
        lab = np.arange(n) % 3  # arbitrary assignment
        got = _got(community_stats(g, _labels_ds(lab), num_buckets=4))
        assert got == _direct(n, e, lab), name


def test_community_stats_join_fallback(graphs):
    from parallel_pagerank_ray.pipelines import community as C

    n, e = graphs["medium"]
    g = Graph.from_int_edges(edges_dataset(e, num_blocks=2))
    lab = np.arange(n) % 2
    got = _got(
        C.community_stats(
            g, _labels_ds(lab), num_buckets=4,
            broadcast_max_bytes=0, num_partitions=4,  # force the join path
        )
    )
    assert got == _direct(n, e, lab)


def test_modularity_perfect_split():
    # two disjoint triangles labeled by component: Q = 1/2
    e = [(0, 1), (1, 2), (0, 2), (3, 4), (4, 5), (3, 5)]
    g = Graph.from_int_edges(edges_dataset(e, num_blocks=1))
    lab = np.array([0, 0, 0, 1, 1, 1])
    stats = community_stats(g, _labels_ds(lab), num_buckets=2).to_pandas()
    q = modularity(stats)
    assert abs(q - 0.5) < 1e-12
    # degenerate: everything in one community -> Q = 0
    stats1 = community_stats(
        g, _labels_ds(np.zeros(6, dtype=np.int64)), num_buckets=2
    ).to_pandas()
    assert abs(modularity(stats1)) < 1e-12


def test_community_graph_contraction():
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from parallel_pagerank_ray.pipelines.community import community_graph
    from parallel_pagerank_ray.pipelines.graph_build import Graph
    from parallel_pagerank_ray.sources.edge_list import edges_dataset

    # two triangles bridged by one edge; labels: {0,1,2}->0, {3,4,5}->3
    e = [(0, 1), (1, 2), (0, 2), (3, 4), (4, 5), (3, 5), (2, 3)]
    g = Graph.from_int_edges(edges_dataset(e, num_blocks=2))
    labels = rd.from_arrow(
        pa.table(
            {
                "vid": pa.array(list(range(6)), pa.int64()),
                "label": pa.array([0, 0, 0, 3, 3, 3], pa.int64()),
            }
        )
    )
    got = (
        community_graph(g, labels)
        .to_pandas()
        .sort_values(["label_a", "label_b"])
        .reset_index(drop=True)
    )
    assert got.values.tolist() == [[0, 0, 3], [0, 3, 1], [3, 3, 3]]


def test_community_graph_join_fallback_identical():
    import pyarrow as pa
    import ray.data as rd

    from parallel_pagerank_ray.pipelines.community import community_graph
    from parallel_pagerank_ray.pipelines.graph_build import Graph
    from parallel_pagerank_ray.sources.edge_list import edges_dataset
    from parallel_pagerank_ray.sources.pages import powerlaw_edges

    e = powerlaw_edges(100, 3, seed=4)
    g = Graph.from_int_edges(edges_dataset([tuple(r) for r in e], num_blocks=3))
    labels = rd.from_arrow(
        pa.table(
            {
                "vid": pa.array(list(range(100)), pa.int64()),
                "label": pa.array([v % 7 for v in range(100)], pa.int64()),
            }
        )
    )
    a = (
        community_graph(g, labels)
        .to_pandas()
        .sort_values(["label_a", "label_b"])
        .reset_index(drop=True)
    )
    b = (
        community_graph(g, labels, broadcast_max=0)
        .to_pandas()
        .sort_values(["label_a", "label_b"])
        .reset_index(drop=True)
    )
    assert a.equals(b)
