"""pages -> links -> vertices -> dedup edges -> degrees (SURVEY.md §7.2-3)."""

import numpy as np
import ray.data as rd

from parallel_pagerank_ray.pipelines.graph_build import Graph, undirected_edges
from parallel_pagerank_ray.sources.edge_list import edges_dataset, read_edge_list
from parallel_pagerank_ray.sources.pages import page_url


def vid_map(graph: Graph, name: str, n: int) -> dict[int, int]:
    """reference-vid -> engine-vid via the url bijection."""
    verts = graph.vertices.to_pandas()
    url_to_vid = dict(zip(verts["url"], verts["vid"]))
    return {v: url_to_vid[page_url(name, v)] for v in range(n)}


def test_graph_from_pages_matches_edge_set(pages_dir, graphs):
    for name in ("small", "dangling4", "two_comps"):
        n, edges = graphs[name]
        g = Graph.from_pages(rd.read_parquet(str(pages_dir / f"{name}.parquet")))
        assert g.n == n
        m = vid_map(g, name, n)
        got = {(r["src"], r["dst"]) for r in g.edges.take_all()}
        want = {(m[int(u)], m[int(v)]) for u, v in edges}
        assert got == want


def test_dedup_and_reference_n_semantics():
    # duplicate edges collapse; N = max id + 1 even with id gaps
    ds = edges_dataset([(0, 1), (0, 1), (0, 1), (5, 1)])
    g = Graph.from_int_edges(ds)
    assert g.n == 6
    assert sorted((r["src"], r["dst"]) for r in g.edges.take_all()) == [(0, 1), (5, 1)]


def test_init_vertex_table_has_all_vids_and_degrees():
    g = Graph.from_int_edges(edges_dataset([(0, 1), (0, 2), (3, 0)]))
    rows = {r["vid"]: r["out_deg"] for r in g.init_vertex_table().take_all()}
    assert rows == {0: 2, 1: 0, 2: 0, 3: 1}


def test_read_edge_list_skips_comments(tmp_path):
    p = tmp_path / "g.txt"
    p.write_text("# header\n0\t1\n\n2 3\n# tail\n1 2\n")
    ds = read_edge_list(str(p))
    assert sorted((r["src"], r["dst"]) for r in ds.take_all()) == [(0, 1), (1, 2), (2, 3)]


def test_undirected_closure():
    und = undirected_edges(edges_dataset([(0, 1), (1, 0), (1, 2), (2, 2)]))
    got = sorted((r["src"], r["dst"]) for r in und.take_all())
    assert got == [(0, 1), (1, 0), (1, 2), (2, 1)]


def test_vertex_ids_dense_and_deterministic(pages_dir):
    ds = rd.read_parquet(str(pages_dir / "medium.parquet"))
    g1 = Graph.from_pages(ds)
    g2 = Graph.from_pages(ds.repartition(4))
    v1 = sorted((r["url"], r["vid"]) for r in g1.vertices.take_all())
    v2 = sorted((r["url"], r["vid"]) for r in g2.vertices.take_all())
    assert v1 == v2  # same bijection at any parallelism
    vids = sorted(v for _, v in v1)
    assert vids == list(range(g1.n))  # dense 0..N-1
    assert np.int64(g1.n) == 10


def test_attribute_mixing_matrix():
    import pandas as pd
    import ray.data as rd

    from parallel_pagerank_ray.pipelines.graph_build import attribute_mixing

    links = pd.DataFrame(
        {
            "src_url": ["a", "a", "b", "c", "c", "c"],
            "dst_url": ["b", "c", "c", "a", "a", "b"],
        }
    )
    attrs = pd.DataFrame(
        {"url": ["a", "b", "c"], "lang": ["en", "en", "de"]}
    )
    got = (
        attribute_mixing(
            rd.from_pandas(links).repartition(2), rd.from_pandas(attrs)
        )
        .to_pandas()
        .sort_values(["src_attr", "dst_attr"])
        .reset_index(drop=True)
    )
    want = pd.DataFrame(
        {
            "src_attr": ["de", "de", "en", "en"],
            "dst_attr": ["de", "en", "de", "en"],
            "n": [0, 3, 2, 1],
        }
    )
    # de->de never occurs: absent row, not zero row
    want = want[want.n > 0].reset_index(drop=True)
    pd.testing.assert_frame_equal(got, want, check_dtype=False)
    # join-path fallback parity (broadcast_max=0 forces it)
    slow = (
        attribute_mixing(
            rd.from_pandas(links).repartition(2),
            rd.from_pandas(attrs),
            broadcast_max=0,
        )
        .to_pandas()
        .sort_values(["src_attr", "dst_attr"])
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(slow, want, check_dtype=False)


def test_joint_degree_matrix_matches_numpy():
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from parallel_pagerank_ray.pipelines.graph_build import (
        joint_degree_matrix,
    )
    from parallel_pagerank_ray.sources.pages import powerlaw_edges

    e = powerlaw_edges(80, 4, seed=2)
    lo = np.minimum(e[:, 0], e[:, 1])
    hi = np.maximum(e[:, 0], e[:, 1])
    m = lo != hi
    canon = np.unique(np.stack([lo[m], hi[m]], axis=1), axis=0)
    ds = rd.from_arrow(
        pa.table(
            {
                "src": pa.array(canon[:, 0], pa.int64()),
                "dst": pa.array(canon[:, 1], pa.int64()),
            }
        )
    ).repartition(3)
    got = (
        joint_degree_matrix(ds)
        .to_pandas()
        .sort_values(["band_lo", "band_hi"])
        .reset_index(drop=True)
    )
    deg = np.zeros(canon.max() + 1, dtype=np.int64)
    for a, b in canon:
        deg[a] += 1
        deg[b] += 1
    band = np.int64(np.floor(np.log2(deg, where=deg > 0)))
    want: dict = {}
    for a, b in canon:
        k = (min(band[a], band[b]), max(band[a], band[b]))
        want[k] = want.get(k, 0) + 1
    assert {
        (int(r.band_lo), int(r.band_hi)): int(r.n_edges)
        for r in got.itertuples()
    } == want
