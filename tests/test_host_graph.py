"""Host-level graph coarsening: projection, rollup, weighted PageRank
on the coarsened graph — all vs direct/NumPy oracles."""

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data as rd

from parallel_pagerank_ray import oracle
from parallel_pagerank_ray.pipelines.host_graph import (
    host_edges,
    host_graph,
    host_of,
)

LINKS = [
    # (src_url, dst_url): 3 hosts, self- and cross-host links, dups
    ("https://a.ex/p1", "https://b.ex/p9"),
    ("https://a.ex/p1", "https://b.ex/p8"),
    ("https://a.ex/p2", "https://a.ex/p1"),
    ("https://b.ex/p9", "https://c.ex/"),
    ("https://b.ex/p8", "https://c.ex/x"),
    ("https://b.ex/p8", "https://a.ex/p2"),
    ("https://c.ex/x", "https://a.ex/p1"),
    ("https://c.ex/x", "https://a.ex/p2"),
]


def _links_ds(blocks=3):
    t = pa.table(
        {
            "src_url": [s for s, _ in LINKS],
            "dst_url": [d for _, d in LINKS],
        }
    )
    return rd.from_arrow(t).repartition(blocks)


def test_host_of_vectorized():
    urls = pa.chunked_array(
        [["https://a.ex/p/q", "http://b.ex", "https://c.ex/"]]
    )
    assert host_of(urls).to_pylist() == ["a.ex", "b.ex", "c.ex"]


def test_host_of_non_hierarchical_urls():
    # link extraction passes mailto:/javascript:/relative hrefs through;
    # the host projection must map them to "" instead of crashing
    urls = pa.chunked_array(
        [["mailto:a@b.ex", "javascript:void(0)", "tel:+1555",
          "/relative/path", "", "ftp://files.ex/x"]]
    )
    assert host_of(urls).to_pylist() == ["", "", "", "", "", "files.ex"]


def _expected_host_counts(drop_self):
    rows = [
        (s.split("/")[2], d.split("/")[2]) for s, d in LINKS
    ]
    if drop_self:
        rows = [r for r in rows if r[0] != r[1]]
    return (
        pd.DataFrame(rows, columns=["src_host", "dst_host"])
        .groupby(["src_host", "dst_host"])
        .size()
        .reset_index(name="w")
        .sort_values(["src_host", "dst_host"])
        .reset_index(drop=True)
    )


def test_host_edges_rollup_exact():
    for drop_self in (False, True):
        got = (
            host_edges(_links_ds(), drop_self=drop_self)
            .to_pandas()
            .sort_values(["src_host", "dst_host"])
            .reset_index(drop=True)
        )
        want = _expected_host_counts(drop_self)
        assert got["w"].dtype == np.int64
        pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_host_graph_weighted_pagerank_vs_oracle():
    from parallel_pagerank_ray.pipelines.pagerank_actors import pagerank_bsp

    g = host_graph(_links_ds(), drop_self=True)
    verts = g.vertices.to_pandas()
    host_by_vid = dict(zip(verts["vid"], verts["url"]))
    assert g.n == 3 and len(host_by_vid) == 3

    # oracle over the manually coarsened weighted graph, mapped to vids
    want_edges = _expected_host_counts(drop_self=True)
    vid_by_host = {h: v for v, h in host_by_vid.items()}
    e = np.array(
        [
            (vid_by_host[s], vid_by_host[d])
            for s, d in zip(want_edges["src_host"], want_edges["dst_host"])
        ],
        dtype=np.int64,
    )
    w = want_edges["w"].to_numpy().astype(np.float64)
    run = pagerank_bsp(g, d=0.85, tol=1e-6, num_parts=2)
    tr = oracle.pagerank_weighted(g.n, e, w, d=0.85, tol=1e-6)
    got = run.ranks.to_pandas().sort_values("vid")["rank"].to_numpy()
    assert np.allclose(got, tr.ranks, atol=1e-9)
    assert run.iterations == tr.iterations


def test_host_cocitation_exact():
    from parallel_pagerank_ray.pipelines.host_graph import host_cocitation

    got = (
        host_cocitation(_links_ds(), num_buckets=4)
        .to_pandas()
        .sort_values(["host_a", "host_b"])
        .reset_index(drop=True)
    )
    # direct: distinct (src_host, dst_host) pairs; w = shared targets
    hp = sorted({(s.split("/")[2], d.split("/")[2]) for s, d in LINKS})
    by_target: dict = {}
    for s, d in hp:
        by_target.setdefault(d, set()).add(s)
    want: dict = {}
    for srcs in by_target.values():
        srcs = sorted(srcs)
        for i in range(len(srcs)):
            for j in range(i + 1, len(srcs)):
                want[(srcs[i], srcs[j])] = want.get((srcs[i], srcs[j]), 0) + 1
    rows = {(r["host_a"], r["host_b"]): r["w"] for _, r in got.iterrows()}
    assert rows == want


def test_host_cocitation_join_fallback_identical():
    """broadcast_max=0 forces the hash-join attach path; the output
    must be identical to the guarded broadcast fast path."""
    from parallel_pagerank_ray.pipelines.host_graph import host_cocitation

    fast = (
        host_cocitation(_links_ds(), num_buckets=4)
        .to_pandas()
        .sort_values(["host_a", "host_b"])
        .reset_index(drop=True)
    )
    joined = (
        host_cocitation(_links_ds(), num_buckets=4, broadcast_max=0)
        .to_pandas()
        .sort_values(["host_a", "host_b"])
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(
        joined[["host_a", "host_b", "w"]], fast[["host_a", "host_b", "w"]],
        check_dtype=False,
    )


def test_trustrank_weighted_personalized_vs_oracle():
    """Weighted + personalized pagerank together (the TrustRank /
    spam-mass combination): engine matches the numpy oracle with
    identical iteration counts, and spam mass orders sanely."""
    from parallel_pagerank_ray.pipelines.pagerank_actors import pagerank_bsp

    g = host_graph(_links_ds(), drop_self=True)
    verts = g.vertices.to_pandas()
    vid_by_host = {h: v for h, v in zip(verts["url"], verts["vid"])}
    want_edges = _expected_host_counts(drop_self=True)
    e = np.array(
        [
            (vid_by_host[s], vid_by_host[d])
            for s, d in zip(want_edges["src_host"], want_edges["dst_host"])
        ],
        dtype=np.int64,
    )
    w = want_edges["w"].to_numpy().astype(np.float64)
    seed_host = sorted(vid_by_host)[0]
    ev = np.zeros(g.n, dtype=np.float64)
    ev[vid_by_host[seed_host]] = 1.0
    run = pagerank_bsp(
        g, d=0.85, tol=1e-6, num_parts=2, personalization=ev
    )
    tr = oracle.pagerank_weighted(g.n, e, w, d=0.85, tol=1e-6, e=ev)
    got = run.ranks.to_pandas().sort_values("vid")["rank"].to_numpy()
    assert np.allclose(got, tr.ranks, atol=1e-12)
    assert run.iterations == tr.iterations

    base = oracle.pagerank_weighted(g.n, e, w, d=0.85, tol=1e-6)
    mass = (base.ranks - tr.ranks) / base.ranks
    # the trusted seed's own mass must be minimal
    assert int(np.argmin(mass)) == vid_by_host[seed_host]


def test_crawl_frontier_politeness():
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import ray.data as rd

    from parallel_pagerank_ray.pipelines.host_graph import crawl_frontier

    urls = [
        f"https://h{i % 3}.ex.org/p{i}" for i in range(40)
    ] + ["https://lone.example/only"]
    pages = rd.from_arrow(pa.table({"url": urls})).repartition(4)
    got = crawl_frontier(pages).to_pandas().sort_values("slot")
    H = got["host"].nunique()
    assert H == 4
    # slots unique; slot mod H identifies the host -> any H consecutive
    # slots touch each host at most once
    assert got["slot"].is_unique
    hrank = {h: i for i, h in enumerate(sorted(got["host"].unique()))}
    assert (got["slot"] % H == got["host"].map(hrank)).all()
    # per-host positions are dense 0..n_h-1 in url order
    for h, g in got.groupby("host"):
        g = g.sort_values("url")
        assert g["pos"].tolist() == list(range(len(g)))
        assert (np.diff(g.sort_values("pos")["slot"].to_numpy()) == H).all()


def test_link_churn_classes():
    import pyarrow as pa
    import ray.data as rd

    from parallel_pagerank_ray.pipelines.host_graph import link_churn

    def links(rows):
        return rd.from_arrow(
            pa.table(
                {
                    "src_url": pa.array(
                        [f"https://{h}/p{i}" for h, i, _ in rows]
                    ),
                    "dst_url": pa.array([d for _, _, d in rows]),
                }
            )
        )

    a = links(
        [
            ("x.com", 0, "t1"),
            ("x.com", 0, "t1"),  # duplicate — distinct-counted once
            ("x.com", 1, "t2"),
            ("y.com", 2, "t3"),
        ]
    )
    b = links(
        [
            ("x.com", 0, "t1"),  # stable
            ("x.com", 1, "t9"),  # t2 removed, t9 added
            ("y.com", 3, "t3"),  # y.com/p2->t3 removed, p3->t3 added
        ]
    )
    got = (
        link_churn(a, b)
        .to_pandas()
        .set_index("host")
        .sort_index()
    )
    assert got.loc["x.com"].tolist() == [1, 1, 1]  # added, removed, stable
    assert got.loc["y.com"].tolist() == [1, 1, 0]


def test_host_mirror_scores_exact():
    import pyarrow as pa
    import ray.data as rd

    from parallel_pagerank_ray.pipelines.host_graph import (
        host_mirror_scores,
    )

    # a and b are perfect mirrors (same 2 targets); c shares 1 of 3
    rows = [
        ("https://a/x", "https://t1/"), ("https://a/y", "https://t2/"),
        ("https://b/x", "https://t1/"), ("https://b/y", "https://t2/"),
        ("https://c/x", "https://t1/"), ("https://c/y", "https://t3/"),
        ("https://c/z", "https://t4/"),
    ]
    links = rd.from_arrow(
        pa.table(
            {
                "src_url": pa.array([r[0] for r in rows]),
                "dst_url": pa.array([r[1] for r in rows]),
            }
        )
    )
    got = (
        host_mirror_scores(links)
        .to_pandas()
        .set_index(["host_a", "host_b"])
        .sort_index()
    )
    assert got.loc[("a", "b")].tolist() == [2, 2, 1.0]
    assert got.loc[("a", "c")].tolist() == [1, 4, 0.25]
    assert got.loc[("b", "c")].tolist() == [1, 4, 0.25]
