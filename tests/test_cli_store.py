"""CLI smoke (in-process), resumable graph store, BSP components."""

from __future__ import annotations

import json

import numpy as np
import pytest

from parallel_pagerank_ray import oracle
from parallel_pagerank_ray.pipelines.components_actors import connected_components_bsp
from parallel_pagerank_ray.pipelines.graph_build import Graph
from parallel_pagerank_ray.sources.edge_list import edges_dataset, read_edge_list


def test_graph_write_load_roundtrip(graphs, tmp_path):
    n, e = graphs["medium"]
    g = Graph.from_int_edges(edges_dataset(e, num_blocks=2))
    g.write(str(tmp_path / "g"))
    g2 = Graph.load(str(tmp_path / "g"))
    assert g2.n == g.n
    a = g.edges.to_pandas().sort_values(["src", "dst"]).to_numpy()
    b = g2.edges.to_pandas().sort_values(["src", "dst"]).to_numpy()
    assert np.array_equal(a, b)


def test_edge_list_reader(tmp_path, graphs):
    n, e = graphs["small"]
    path = tmp_path / "g.txt"
    lines = ["# comment", "", "junk line"]
    lines += [f"{u}\t{v}" for u, v in e]
    path.write_text("\n".join(lines) + "\n")
    got = (
        read_edge_list(str(path))
        .to_pandas()
        .sort_values(["src", "dst"])
        .to_numpy()
    )
    want = np.array(sorted(map(tuple, e)))
    assert np.array_equal(got, want)


@pytest.mark.parametrize("name", ["small", "two_comps", "dangling4"])
def test_components_bsp_exact(graphs, name):
    n, e = graphs[name]
    g = Graph.from_int_edges(edges_dataset(e, num_blocks=2))
    run = connected_components_bsp(g, num_parts=2)
    got = run.components.to_pandas().sort_values("vid")["comp"].to_numpy()
    assert np.array_equal(got, oracle.connected_components(n, e))


def test_cli_run_pagerank(tmp_path, graphs, pages_dir):
    # in-process CLI (ray already initialised by the session fixture;
    # cli.main's guarded init is a no-op)
    from parallel_pagerank_ray import cli

    n, e = graphs["small"]
    edge_file = tmp_path / "small.txt"
    edge_file.write_text("\n".join(f"{u} {v}" for u, v in e) + "\n")
    wd = str(tmp_path / "out")
    rc = cli.cmd_run(
        cli_args(
            algo="pagerank", edges=str(edge_file), workdir=wd,
            tol=1e-4, engine="bsp",
        )
    )
    assert rc == 0
    metrics = json.loads((tmp_path / "out" / "ranks_metrics.json").read_text())
    tr = oracle.pagerank(n, np.unique(np.array(e), axis=0), tol=1e-4)
    assert metrics["iterations"] == tr.iterations

    import pyarrow.parquet as pq

    got = (
        pq.read_table(str(tmp_path / "out" / "ranks"))
        .to_pandas()
        .sort_values("vid")["rank"]
        .to_numpy()
    )
    assert np.allclose(got, tr.ranks, atol=1e-6)


def cli_args(**kw):
    import argparse

    defaults = dict(
        pages=None, edges=None, graph=None, workdir="/tmp/ppr_out",
        tol=1e-6, damping=0.85, max_iters=1000, engine="dataset",
        checkpoint=False, algo="pagerank", plots=False,
        k=2, sources="0", directed=False, hits_iters=2,
        walks_per_seed=4, walk_length=8, salt="rw",
    )
    defaults.update(kw)
    return argparse.Namespace(**defaults)


def test_cli_run_kcore_bfs_hits(tmp_path, graphs):
    import pyarrow.parquet as pq

    from parallel_pagerank_ray import cli

    n, e = graphs["medium"]
    edge_file = tmp_path / "medium.txt"
    edge_file.write_text("\n".join(f"{u} {v}" for u, v in e) + "\n")

    wd = str(tmp_path / "kc")
    assert cli.cmd_run(cli_args(algo="kcore", edges=str(edge_file), workdir=wd, k=3)) == 0
    got = sorted(pq.read_table(wd + "/kcore").to_pandas()["vid"].tolist())
    assert got == sorted(np.nonzero(oracle.kcore(n, np.array(e), 3))[0].tolist())

    wd = str(tmp_path / "bf")
    assert cli.cmd_run(
        cli_args(algo="bfs", edges=str(edge_file), workdir=wd, sources="0,3")
    ) == 0
    df = pq.read_table(wd + "/bfs").to_pandas().sort_values("vid")
    want = oracle.bfs_distances(n, np.array(e), [0, 3])
    assert dict(zip(df["vid"], df["dist"])) == {
        i: int(d) for i, d in enumerate(want) if d >= 0
    }

    wd = str(tmp_path / "ht")
    assert cli.cmd_run(
        cli_args(algo="hits", edges=str(edge_file), workdir=wd, engine="bsp")
    ) == 0
    df = pq.read_table(wd + "/hits").to_pandas().sort_values("vid")
    wa, wh = oracle.hits_scores(n, np.array(e), iters=2)
    assert df["auth"].tolist() == wa.tolist()
    assert df["hub"].tolist() == wh.tolist()


def test_rank_histogram_matches_numpy(graphs):
    from parallel_pagerank_ray.functions.metrics import rank_histogram
    from parallel_pagerank_ray.pipelines.pagerank import pagerank

    n, e = graphs["medium"]
    g = Graph.from_int_edges(edges_dataset(e, num_blocks=2))
    run = pagerank(g, tol=1e-6, num_parts=2)
    counts, edges = rank_histogram(run.ranks, bins=5)
    vals = run.ranks.to_pandas()["rank"].to_numpy()
    want, wedges = np.histogram(vals, bins=5, range=(vals.min(), vals.max()))
    assert np.array_equal(counts, want)
    assert np.allclose(edges, wedges)


def test_parse_reference_stdout():
    from parallel_pagerank_ray.functions.metrics import parse_reference_stdout

    text = (
        "Iteration 1, Max Error: 0.100000, L1 Norm: 0.400000\n"
        "Iteration 2, Max Error: 0.010000, L1 Norm: 0.040000\n"
        "Converged based on L1 norm: 0.000040 < 0.000100\n"
        "P_t1[0] = 0.25\nP_t1[1] = 0.75\n"
        "Total time = 0.123 seconds\n"
    )
    got = parse_reference_stdout(text)
    assert len(got["iterations"]) == 2 and got["iterations"][1]["l1"] == 0.04
    assert got["total_time"] == 0.123
    assert got["ranks"] == {0: 0.25, 1: 0.75}
    assert got["converged_l1"]


def test_cli_personalized_pagerank(tmp_path, graphs):
    import pyarrow as pa
    import pyarrow.parquet as pq

    from parallel_pagerank_ray import cli

    n, e = graphs["small"]
    edge_file = tmp_path / "small.txt"
    edge_file.write_text("\n".join(f"{u} {v}" for u, v in e) + "\n")
    evec = np.zeros(n)
    evec[1] = 1.0
    pq.write_table(
        pa.table({"vid": np.arange(n, dtype=np.int64), "e": evec}),
        tmp_path / "e.parquet",
    )
    wd = str(tmp_path / "out")
    rc = cli.cmd_run(
        cli_args(
            algo="pagerank", edges=str(edge_file), workdir=wd, tol=1e-8,
            personalization=str(tmp_path / "e.parquet"),
        )
    )
    assert rc == 0
    import json as _json

    tr = oracle.pagerank(n, np.unique(np.array(e), axis=0), tol=1e-8, e=evec)
    got = (
        __import__("pyarrow.parquet", fromlist=["read_table"])
        .read_table(str(tmp_path / "out" / "ranks"))
        .to_pandas()
        .sort_values("vid")["rank"]
        .to_numpy()
    )
    assert np.allclose(got, tr.ranks, atol=1e-6)
    metrics = _json.loads((tmp_path / "out" / "ranks_metrics.json").read_text())
    assert metrics["iterations"] == tr.iterations


def test_edge_list_roundtrip(tmp_path):
    import numpy as np

    from parallel_pagerank_ray.sources.edge_list import (
        edges_dataset,
        read_edge_list,
        write_edge_list,
    )

    e = [(0, 1), (1, 2), (2, 0), (5, 3)]
    path = str(tmp_path / "g.txt")
    n = write_edge_list(edges_dataset(e), path, header="test graph\n4 edges")
    assert n == 4
    first = open(path).readline()
    assert first.startswith("#")
    back = read_edge_list(path).to_pandas().sort_values(["src", "dst"])
    assert list(map(tuple, back.to_numpy())) == sorted(e)


def test_analyze_and_recommend():
    from parallel_pagerank_ray.functions.recommend import (
        analyze_graph,
        recommend_engine,
    )
    from parallel_pagerank_ray.pipelines.graph_build import Graph
    from parallel_pagerank_ray.sources.edge_list import edges_dataset

    # star graph: hub degree n-1 -> scale-free per the reference proxy
    n = 60
    star = [(0, i) for i in range(1, n)]
    g = Graph.from_int_edges(edges_dataset(star))
    a = analyze_graph(g.n, g.edges)
    assert a["num_nodes"] == n and a["num_edges"] == n - 1
    assert a["max_degree"] == n - 1 and a["is_scale_free"]
    assert a["num_isolated"] == 0
    rec = recommend_engine(a)
    assert rec["engine"] == "bsp"
    assert any("Scale-free" in s for s in rec["notes"])

    # ring graph: uniform degree -> not scale-free; id gap -> isolated
    ring = [(i, (i + 1) % 50) for i in range(50)] + [(52, 53)]
    g2 = Graph.from_int_edges(edges_dataset(ring))
    a2 = analyze_graph(g2.n, g2.edges)
    assert not a2["is_scale_free"]
    assert a2["num_isolated"] == 2  # vids 50, 51 untouched by any edge


def test_cli_run_with_plots(tmp_path, graphs):
    import os

    from parallel_pagerank_ray import cli

    n, e = graphs["small"]
    edge_file = tmp_path / "g.txt"
    edge_file.write_text("\n".join(f"{u} {v}" for u, v in e) + "\n")
    wd = str(tmp_path / "out")
    rc = cli.cmd_run(
        cli_args(
            algo="pagerank", edges=str(edge_file), workdir=wd,
            tol=1e-4, engine="bsp", plots=True,
        )
    )
    assert rc == 0
    for name in ("convergence.svg", "topk.svg", "rank_histogram.svg"):
        assert os.path.exists(os.path.join(wd, name)), name


def test_cli_analyze_command(tmp_path):
    from parallel_pagerank_ray import cli

    e = [(0, i) for i in range(1, 30)]
    edge_file = tmp_path / "g.txt"
    edge_file.write_text("\n".join(f"{u} {v}" for u, v in e) + "\n")
    assert cli.cmd_analyze(cli_args(edges=str(edge_file))) == 0


def test_cli_plot_empty_workdir(tmp_path):
    from parallel_pagerank_ray import cli

    args = cli_args(workdir=str(tmp_path))
    args.topk = 20
    assert cli.cmd_plot(args) == 0  # no artifacts -> no-op, no crash


def test_read_resumable_empty_dir(tmp_path):
    import os

    from parallel_pagerank_ray.state.sink import read_resumable

    d = str(tmp_path / "empty")
    os.makedirs(d)
    assert read_resumable(d).count() == 0


def test_cli_weighted_pagerank_parquet_edges(tmp_path, graphs):
    import pyarrow as pa
    import pyarrow.parquet as pq

    from parallel_pagerank_ray import cli

    n, e = graphs["medium"]
    rng = np.random.default_rng(6)
    w = rng.integers(1, 4, size=len(e)).astype(np.float64)
    pq.write_table(
        pa.table({"src": e[:, 0], "dst": e[:, 1], "w": w}),
        tmp_path / "we.parquet",
    )
    wd = str(tmp_path / "out")
    rc = cli.cmd_run(
        cli_args(
            algo="pagerank", edges=str(tmp_path / "we.parquet"),
            workdir=wd, tol=1e-6, engine="bsp",
        )
    )
    assert rc == 0
    got = (
        pq.read_table(wd + "/ranks")
        .to_pandas()
        .sort_values("vid")["rank"]
        .to_numpy()
    )
    tr = oracle.pagerank_weighted(n, e, w, tol=1e-6)
    assert np.allclose(got, tr.ranks, atol=1e-9)


def test_cli_sssp_weighted(tmp_path, graphs):
    import pyarrow as pa
    import pyarrow.parquet as pq

    from parallel_pagerank_ray import cli

    n, e = graphs["medium"]
    rng = np.random.default_rng(7)
    w = rng.integers(1, 6, size=len(e)).astype(np.float64)
    pq.write_table(
        pa.table({"src": e[:, 0], "dst": e[:, 1], "w": w}),
        tmp_path / "we.parquet",
    )
    wd = str(tmp_path / "out")
    rc = cli.cmd_run(
        cli_args(algo="sssp", edges=str(tmp_path / "we.parquet"),
                 workdir=wd, sources="0")
    )
    assert rc == 0
    df = pq.read_table(wd + "/sssp").to_pandas()
    want = oracle.sssp_weighted(n, e, w.astype(np.int64), [0])
    assert dict(zip(df["vid"], df["dist"])) == {
        i: int(d) for i, d in enumerate(want) if d >= 0
    }


def test_cli_closeness_spcount_walks(tmp_path, graphs):
    import pyarrow.parquet as pq

    from parallel_pagerank_ray import cli

    n, e = graphs["medium"]
    edge_file = tmp_path / "medium.txt"
    edge_file.write_text("\n".join(f"{u} {v}" for u, v in e) + "\n")

    wd = str(tmp_path / "cl")
    assert cli.cmd_run(
        cli_args(algo="closeness", edges=str(edge_file), workdir=wd, sources="0,2")
    ) == 0
    df = pq.read_table(wd + "/closeness").to_pandas().sort_values("source")
    for _, row in df.iterrows():
        dist = oracle.bfs_distances(n, np.array(e), [int(row["source"])])
        reach = dist[dist >= 0]
        assert (row["n_reached"], row["sum_dist"], row["ecc"]) == (
            len(reach), int(reach.sum()), int(reach.max()),
        )

    wd = str(tmp_path / "sp")
    assert cli.cmd_run(
        cli_args(algo="spcount", edges=str(edge_file), workdir=wd, sources="0")
    ) == 0
    df = pq.read_table(wd + "/spcount").to_pandas().sort_values("vid")
    dist, sigma = oracle.shortest_path_counts(n, np.array(e), 0)
    got = dict(zip(df["vid"], zip(df["dist"], df["sigma"])))
    want = {v: (int(dist[v]), int(sigma[v])) for v in range(n) if dist[v] >= 0}
    assert {k: (int(a), int(b)) for k, (a, b) in got.items()} == want

    wd = str(tmp_path / "wk")
    assert cli.cmd_run(
        cli_args(algo="walks", edges=str(edge_file), workdir=wd,
                 sources="0,1", walks_per_seed=2, walk_length=5)
    ) == 0
    df = pq.read_table(wd + "/walks").to_pandas()
    got = sorted(zip(df["seed"], df["widx"], df["step"], df["vid"]))
    want = sorted(oracle.random_walks(n, np.array(e), [0, 1], 2, 5))
    assert [(int(a), int(b), int(c), int(d)) for a, b, c, d in got] == want


def test_cli_betweenness_and_directed_rejection(tmp_path, graphs):
    import pyarrow.parquet as pq
    import pytest

    from parallel_pagerank_ray import cli

    n, e = graphs["medium"]
    edge_file = tmp_path / "medium.txt"
    edge_file.write_text("\n".join(f"{u} {v}" for u, v in e) + "\n")

    wd = str(tmp_path / "bt")
    assert cli.cmd_run(
        cli_args(algo="betweenness", edges=str(edge_file), workdir=wd, sources="0,1")
    ) == 0
    df = pq.read_table(wd + "/betweenness").to_pandas()
    want = oracle.betweenness_from_sources(n, np.array(e), [0, 1])
    got = dict(zip(df["vid"], df["btw"]))
    for v in range(n):
        assert abs(got.get(v, 0.0) - want[v]) < 1e-9, v

    with pytest.raises(SystemExit, match="undirected closure"):
        cli.cmd_run(
            cli_args(algo="betweenness", edges=str(edge_file),
                     workdir=wd, sources="0", directed=True)
        )


def test_reference_report_golden_fixtures():
    """Dashboard-parity analyze payload pinned against golden files on
    the reference's three committed fixtures (VERDICT r3 item 8). The
    golden docs also pin the tier thresholds: any drift in the ported
    heuristics (app.py:549-612) shows as a diff here."""
    import json
    import os

    from parallel_pagerank_ray.functions.recommend import (
        analyze_graph,
        recommend_engine,
        reference_report,
    )
    from parallel_pagerank_ray.pipelines.graph_build import Graph
    from parallel_pagerank_ray.sources.edge_list import read_edge_list

    fixtures = {
        "small": "/root/reference/pagerank_mpi/small_graph.txt",
        "medium": "/root/reference/sample_graphs/medium_graph.txt",
        "large": "/root/reference/sample_graphs/large_graph.txt",
    }
    golden_dir = os.path.join(os.path.dirname(__file__), "golden")
    for name, path in fixtures.items():
        if not os.path.exists(path):
            continue  # reference tree absent in some environments
        g = Graph.from_int_edges(read_edge_list(path).materialize())
        analysis = analyze_graph(g.n, g.edges)
        doc = {
            "analysis": analysis,
            "recommendation": recommend_engine(analysis),
            "reference_report": reference_report(analysis),
        }
        with open(os.path.join(golden_dir, f"analyze_{name}.json")) as f:
            want = json.load(f)
        # round-trip through json so float repr matches the golden file
        assert json.loads(json.dumps(doc, sort_keys=True)) == want, name


def test_reference_report_tiers():
    """Tier boundaries of the dashboard-parity payload: the reference's
    size thresholds (100 / 10k) and prediction strings."""
    from parallel_pagerank_ray.functions.recommend import reference_report

    base = {
        "num_edges": 5000,
        "density": 0.3,
        "is_scale_free": False,
        "num_isolated": 0,
    }
    small = reference_report({**base, "num_nodes": 99})
    med = reference_report({**base, "num_nodes": 100})
    large = reference_report({**base, "num_nodes": 10_000})
    assert small["best_method"] == "Serial"
    assert med["best_method"] == "Pthreads"
    assert large["best_method"] == "MPI"
    preds = {p["method"]: p for p in large["performance_prediction"]}
    assert preds["Serial"]["complexity"] == "O(5000 x I)"
    assert preds["Pthreads"]["expected_performance"].startswith("Good speedup")
    assert preds["MPI"]["expected_performance"].startswith("Moderate speedup")
    # dense flag fires above 0.5
    dense = reference_report({**base, "num_nodes": 50, "density": 0.6})
    kinds = {r["kind"] for r in dense["recommendations"]}
    assert "density" in kinds


def test_cli_run_articulation_bridges(tmp_path, graphs):
    import pyarrow.parquet as pq

    from parallel_pagerank_ray import cli

    # two triangles joined by a bridge: articulation {2, 3}, bridge (2,3)
    e = [(0, 1), (1, 2), (0, 2), (2, 3), (3, 4), (4, 5), (3, 5)]
    edge_file = tmp_path / "biconn.txt"
    edge_file.write_text("\n".join(f"{u} {v}" for u, v in e) + "\n")

    # brute articulation oracle on the simple undirected closure
    canon = {(min(a, b), max(a, b)) for a, b in e if a != b}
    import collections

    adj = collections.defaultdict(set)
    for a, b in canon:
        adj[a].add(b)
        adj[b].add(a)

    def ncomp(skip):
        seen = {skip}
        c = 0
        for v in sorted(adj):
            if v in seen:
                continue
            c += 1
            st = [v]
            seen.add(v)
            while st:
                x = st.pop()
                for y in adj[x]:
                    if y not in seen:
                        seen.add(y)
                        st.append(y)
        return c

    base = ncomp(-1)
    exp_art = sorted(v for v in adj if ncomp(v) > base)

    wd = str(tmp_path / "ap")
    assert cli.cmd_run(
        cli_args(algo="articulation", edges=str(edge_file), workdir=wd)
    ) == 0
    got = sorted(pq.read_table(wd + "/articulation").to_pandas()["vid"])
    assert got == exp_art

    exp_br = {
        ed for ed in canon
        if _ncomp_without(adj, canon, ed) > base
    }
    wd = str(tmp_path / "br")
    assert cli.cmd_run(
        cli_args(algo="bridges", edges=str(edge_file), workdir=wd)
    ) == 0
    df = pq.read_table(wd + "/bridges").to_pandas()
    assert {(int(a), int(b)) for a, b in zip(df["src"], df["dst"])} == exp_br


def _ncomp_without(adj, canon, drop):
    import collections

    a2 = collections.defaultdict(set)
    for a, b in canon:
        if (a, b) == drop:
            continue
        a2[a].add(b)
        a2[b].add(a)
    seen = set()
    c = 0
    for v in sorted(adj):
        if v in seen:
            continue
        c += 1
        st = [v]
        seen.add(v)
        while st:
            x = st.pop()
            for y in a2.get(x, ()):
                if y not in seen:
                    seen.add(y)
                    st.append(y)
    return c
