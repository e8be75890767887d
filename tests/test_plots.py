"""SVG plot writers (S8 parity: reference renders PNGs via matplotlib;
this container has no plotting lib, so the engine emits stdlib SVG)."""

from __future__ import annotations

import json
import os

from parallel_pagerank_ray.functions import plots


def test_convergence_svg(tmp_path):
    hist = [
        {"iter": i, "l1": 10.0 ** (-i), "max_err": 5.0 * 10.0 ** (-i - 1)}
        for i in range(1, 8)
    ]
    p = plots.write_convergence_svg(hist, str(tmp_path / "conv.svg"))
    s = open(p).read()
    assert s.startswith("<svg") and s.count("<polyline") == 2
    assert "l1" in s and "max_err" in s


def test_topk_and_histogram_svg(tmp_path):
    p = plots.write_topk_svg(
        [f"v{i}" for i in range(30)], [1.0 / (i + 1) for i in range(30)],
        str(tmp_path / "topk.svg"), k=20,
    )
    s = open(p).read()
    assert s.count("<rect") >= 20  # 20 bars + frame/background
    p = plots.write_rank_histogram_svg(
        [i / 10 for i in range(11)], [i * 3 for i in range(10)],
        str(tmp_path / "hist.svg"),
    )
    assert open(p).read().startswith("<svg")


def test_scaling_svg(tmp_path):
    p = plots.write_scaling_svg({8: 100.0, 32: 330.0}, str(tmp_path / "s.svg"))
    s = open(p).read()
    assert "measured" in s and "ideal" in s


def test_cli_plot_renders_run_artifacts(tmp_path, ray_session):
    from parallel_pagerank_ray import cli

    # minimal run artifacts: metrics with history + ranks parquet
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    wd = str(tmp_path)
    with open(os.path.join(wd, "ranks_metrics.json"), "w") as f:
        json.dump(
            {"history": [{"iter": 1, "l1": 0.5, "max_err": 0.1}]}, f
        )
    os.makedirs(os.path.join(wd, "ranks"), exist_ok=True)
    pq.write_table(
        pa.table(
            {
                "vid": pa.array(np.arange(50, dtype=np.int64)),
                "rank": pa.array(np.linspace(0.1, 0.001, 50)),
            }
        ),
        os.path.join(wd, "ranks", "part-0.parquet"),
    )
    assert cli.main(["plot", "--workdir", wd]) == 0
    for name in ("convergence.svg", "topk.svg", "rank_histogram.svg"):
        assert os.path.exists(os.path.join(wd, name)), name


def test_report_html_self_contained(ray_session, tmp_path):
    """write_report_html assembles the dashboard-parity analytics into
    one self-contained HTML file: summary, characteristics,
    recommendation, top-k table, and three inline SVGs."""
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from parallel_pagerank_ray.functions.report import write_report_html
    from parallel_pagerank_ray.pipelines.graph_build import Graph
    from parallel_pagerank_ray.pipelines.pagerank_actors import pagerank_bsp
    from parallel_pagerank_ray.sources.pages import powerlaw_edges

    e = powerlaw_edges(80, 3, seed=5)
    g = Graph.from_int_edges(
        rd.from_arrow(
            pa.table(
                {
                    "src": pa.array(e[:, 0], pa.int64()),
                    "dst": pa.array(e[:, 1], pa.int64()),
                }
            )
        )
    )
    run = pagerank_bsp(g, tol=1e-4, max_iters=50)
    path = write_report_html(g, run, str(tmp_path / "report.html"), top_k=5)
    html_text = open(path, encoding="utf-8").read()
    for needle in (
        "Run summary",
        "Graph characteristics",
        "Engine recommendation",
        "Top ranks",
        "PageRank convergence",
        "Rank distribution",
    ):
        assert needle in html_text
    assert html_text.count("<svg") >= 2  # convergence + topk + histogram
    assert "</html>" in html_text
