"""CLI entry point — the engine's user-extension surface (SURVEY.md
§2.10 replaces the reference's ``pagerank_mpi <file> <N> <threshold> <d>``
argv interface and the Python drivers' subprocess plumbing).

    python -m parallel_pagerank_ray run pagerank --pages pages.parquet \
        --workdir /tmp/out --tol 1e-4 --damping 0.85 --engine bsp
    python -m parallel_pagerank_ray run components --edges edges.txt
    python -m parallel_pagerank_ray build --pages pages.parquet --workdir g/

Inputs: ``--pages`` (Parquet, input_hint schema), ``--edges`` (Parquet
with src/dst int64 columns, or a reference-format text edge list), or
``--graph`` (a directory written by ``build``). Outputs: result Parquet
under ``--workdir`` plus a metrics JSON per run. The CLI owns the Ray
session (guarded init); library code never calls ray.init.
"""

from __future__ import annotations

import argparse
import json
import logging
import os
import sys
import time


def _load_graph(args):
    import ray.data as rd

    from parallel_pagerank_ray.pipelines.graph_build import Graph

    if args.graph:
        return Graph.load(args.graph)
    if args.pages:
        return Graph.from_pages(rd.read_parquet(args.pages))
    if args.edges:
        if args.edges.endswith((".txt", ".tsv", ".edges")):
            from parallel_pagerank_ray.sources.edge_list import read_edge_list

            return Graph.from_int_edges(read_edge_list(args.edges))
        ds = rd.read_parquet(args.edges)
        if "w" in (ds.schema().names or []):
            # weighted edge table: the (src, dst)-only dedup would drop
            # w; a weighted table is taken as the caller's final edge
            # set (pagerank_bsp picks the weights up from the store)
            return Graph.from_int_edges(ds, dedup=False)
        return Graph.from_int_edges(ds)
    raise SystemExit("one of --pages / --edges / --graph is required")


def _write_result(ds, workdir: str, name: str, metrics: dict) -> None:
    os.makedirs(workdir, exist_ok=True)
    ds.write_parquet(os.path.join(workdir, name))
    with open(os.path.join(workdir, f"{name}_metrics.json"), "w") as f:
        json.dump(metrics, f, indent=1, sort_keys=True)


def cmd_run(args) -> int:
    g = _load_graph(args)
    t0 = time.time()
    if args.algo == "pagerank":
        e_vec = None
        if getattr(args, "personalization", None):
            import numpy as np
            import pyarrow.parquet as pq

            t = (
                pq.read_table(args.personalization, columns=["vid", "e"])
                .to_pandas()
                .sort_values("vid")
            )
            e_vec = t["e"].to_numpy(dtype=np.float64)
        # personalization and edge weights are BSP-only: record the
        # engine actually used (the Dataset engine would drop weights)
        try:
            weighted = "w" in (g.edges.schema().names or [])
        except Exception:
            weighted = False
        engine_used = (
            "bsp"
            if (args.engine == "bsp" or e_vec is not None or weighted)
            else "dataset"
        )
        if engine_used == "bsp":
            from parallel_pagerank_ray.pipelines.pagerank_actors import pagerank_bsp

            run = pagerank_bsp(
                g, d=args.damping, tol=args.tol, max_iters=args.max_iters,
                workdir=args.workdir if args.checkpoint else None,
                checkpoint_every=1 if args.checkpoint else 0,
                personalization=e_vec,
            )
        else:
            from parallel_pagerank_ray.pipelines.pagerank import pagerank

            run = pagerank(
                g, d=args.damping, tol=args.tol, max_iters=args.max_iters,
                workdir=args.workdir if args.checkpoint else None,
            )
        metrics = {
            "algo": "pagerank", "engine": engine_used,
            "iterations": run.iterations, "exit_reason": run.exit_reason,
            "history": run.history, "secs": round(time.time() - t0, 3),
        }
        _write_result(
            run.ranks.select_columns(["vid", "rank"]), args.workdir, "ranks", metrics
        )
    elif args.algo == "components":
        if args.engine == "bsp":
            from parallel_pagerank_ray.pipelines.components_actors import (
                connected_components_bsp,
            )

            run = connected_components_bsp(g)
        else:
            from parallel_pagerank_ray.pipelines.components import (
                connected_components,
            )

            run = connected_components(
                g, workdir=args.workdir if args.checkpoint else None
            )
        metrics = {
            "algo": "components", "engine": args.engine,
            "iterations": run.iterations, "secs": round(time.time() - t0, 3),
        }
        _write_result(run.components, args.workdir, "components", metrics)
    elif args.algo == "labelprop":
        if args.engine == "bsp":
            from parallel_pagerank_ray.pipelines.label_prop_actors import (
                label_propagation_bsp,
            )

            run = label_propagation_bsp(g, max_iters=args.max_iters)
        else:
            from parallel_pagerank_ray.pipelines.label_prop import (
                label_propagation,
            )

            run = label_propagation(g, max_iters=args.max_iters)
        metrics = {
            "algo": "labelprop", "engine": args.engine,
            "iterations": run.iterations,
            "secs": round(time.time() - t0, 3),
        }
        _write_result(run.labels, args.workdir, "labels", metrics)
    elif args.algo == "triangles":
        from parallel_pagerank_ray.pipelines.triangles import triangle_count

        tri = triangle_count(g)
        os.makedirs(args.workdir, exist_ok=True)
        with open(os.path.join(args.workdir, "triangles.json"), "w") as f:
            json.dump(
                {"triangles": tri, "secs": round(time.time() - t0, 3)}, f
            )
        print(f"triangles: {tri}")
        return 0
    elif args.algo == "kcore":
        from parallel_pagerank_ray.pipelines.kcore import kcore_bsp

        run = kcore_bsp(g, k=args.k)
        metrics = {
            "algo": "kcore", "engine": "bsp", "k": args.k,
            "iterations": run.iterations, "secs": round(time.time() - t0, 3),
        }
        _write_result(run.members, args.workdir, "kcore", metrics)
    elif args.algo == "bfs":
        from parallel_pagerank_ray.pipelines.bfs import bfs_distances_bsp

        sources = [int(s) for s in args.sources.split(",")]
        run = bfs_distances_bsp(g, sources, directed=args.directed)
        metrics = {
            "algo": "bfs", "engine": "bsp", "sources": sources,
            "directed": args.directed, "iterations": run.iterations,
            "secs": round(time.time() - t0, 3),
        }
        _write_result(run.distances, args.workdir, "bfs", metrics)
    elif args.algo == "sssp":
        from parallel_pagerank_ray.pipelines.sssp import sssp_bsp

        sources = [int(s) for s in args.sources.split(",")]
        run = sssp_bsp(g, sources)
        metrics = {
            "algo": "sssp", "engine": "bsp", "sources": sources,
            "iterations": run.iterations, "secs": round(time.time() - t0, 3),
        }
        _write_result(run.distances, args.workdir, "sssp", metrics)
    elif args.algo == "closeness":
        from parallel_pagerank_ray.pipelines.centrality import (
            closeness_centrality_bsp,
        )

        sources = [int(s) for s in args.sources.split(",")]
        run = closeness_centrality_bsp(g, sources, directed=args.directed)
        import ray.data as rd

        metrics = {
            "algo": "closeness", "engine": "bsp", "sources": sources,
            "directed": args.directed, "history": run.history,
            "secs": round(time.time() - t0, 3),
        }
        _write_result(rd.from_arrow(run.table), args.workdir, "closeness", metrics)
    elif args.algo == "betweenness":
        from parallel_pagerank_ray.pipelines.centrality import betweenness_bsp

        if args.directed:
            raise SystemExit(
                "betweenness runs on the undirected closure only "
                "(drop --directed)"
            )
        sources = [int(s) for s in args.sources.split(",")]
        run = betweenness_bsp(g, sources)
        metrics = {
            "algo": "betweenness", "engine": "bsp", "sources": sources,
            "history": run.history, "secs": round(time.time() - t0, 3),
        }
        _write_result(run.scores, args.workdir, "betweenness", metrics)
    elif args.algo == "spcount":
        from parallel_pagerank_ray.pipelines.centrality import (
            shortest_path_counts_bsp,
        )

        sources = [int(s) for s in args.sources.split(",")]
        run = shortest_path_counts_bsp(g, sources, directed=args.directed)
        metrics = {
            "algo": "spcount", "engine": "bsp", "sources": sources,
            "directed": args.directed, "history": run.history,
            "secs": round(time.time() - t0, 3),
        }
        _write_result(run.counts, args.workdir, "spcount", metrics)
    elif args.algo == "walks":
        from parallel_pagerank_ray.pipelines.random_walk import random_walks_bsp

        sources = [int(s) for s in args.sources.split(",")]
        run = random_walks_bsp(
            g, sources, walks_per_seed=args.walks_per_seed,
            length=args.walk_length, directed=args.directed, salt=args.salt,
        )
        metrics = {
            "algo": "walks", "engine": "bsp", "sources": sources,
            "walks_per_seed": args.walks_per_seed,
            "length": args.walk_length, "salt": args.salt,
            "directed": args.directed, "iterations": run.iterations,
            "secs": round(time.time() - t0, 3),
        }
        _write_result(run.walks, args.workdir, "walks", metrics)
    elif args.algo == "hits":
        from parallel_pagerank_ray.pipelines.hits import hits_bsp, hits_dataset

        fn = hits_bsp if args.engine == "bsp" else hits_dataset
        run = fn(g, iters=args.hits_iters)
        metrics = {
            "algo": "hits", "engine": args.engine,
            "iterations": run.iterations, "secs": round(time.time() - t0, 3),
        }
        _write_result(run.scores, args.workdir, "hits", metrics)
    elif args.algo == "articulation":
        from parallel_pagerank_ray.pipelines.biconnectivity import (
            articulation_points,
            biconnectivity,
        )
        from parallel_pagerank_ray.pipelines.graph_build import Graph
        from parallel_pagerank_ray.pipelines.triangles import (
            _simple_undirected,
        )

        g = Graph(n=g.n, edges=_simple_undirected(g.edges).materialize())
        brun = biconnectivity(g)
        ap = articulation_points(g, run=brun).materialize()
        metrics = {
            "algo": "articulation",
            "n_articulation": ap.count(),
            "secs": round(time.time() - t0, 3),
        }
        _write_result(ap, args.workdir, "articulation", metrics)
    elif args.algo == "bridges":
        from parallel_pagerank_ray.pipelines.bridges import bridges
        from parallel_pagerank_ray.pipelines.graph_build import Graph
        from parallel_pagerank_ray.pipelines.triangles import (
            _simple_undirected,
        )

        g = Graph(n=g.n, edges=_simple_undirected(g.edges).materialize())
        br = bridges(g).materialize()
        metrics = {
            "algo": "bridges",
            "n_bridges": br.count(),
            "secs": round(time.time() - t0, 3),
        }
        _write_result(br, args.workdir, "bridges", metrics)
    else:  # pragma: no cover
        raise SystemExit(f"unknown algo {args.algo}")
    print(json.dumps({k: metrics[k] for k in metrics if k != "history"}))
    if getattr(args, "plots", False):
        args.topk = 20
        cmd_plot(args)
    return 0


def cmd_build(args) -> int:
    g = _load_graph(args)
    g.write(args.workdir)
    print(json.dumps({"n": g.n, "edges": g.edges.count(), "workdir": args.workdir}))
    return 0


def cmd_plot(args) -> int:
    """Render SVG charts from a finished run's artifacts (the engine's
    equivalent of the reference's matplotlib PNG scripts,
    /root/reference/visualization/visualize_pagerank.py)."""
    import numpy as np

    from parallel_pagerank_ray.functions.plots import (
        write_convergence_svg,
        write_rank_histogram_svg,
        write_topk_svg,
    )

    os.makedirs(args.workdir, exist_ok=True)
    written = []
    metrics_path = os.path.join(args.workdir, "ranks_metrics.json")
    if os.path.exists(metrics_path):
        with open(metrics_path) as f:
            metrics = json.load(f)
        if metrics.get("history"):
            written.append(
                write_convergence_svg(
                    metrics["history"],
                    os.path.join(args.workdir, "convergence.svg"),
                )
            )
    ranks_dir = os.path.join(args.workdir, "ranks")
    if os.path.isdir(ranks_dir):
        import pyarrow.parquet as pq

        t = pq.read_table(ranks_dir, columns=["vid", "rank"])
        ranks = t.column("rank").to_numpy()
        vids = t.column("vid").to_numpy()
        order = np.lexsort((vids, -ranks))[: args.topk]
        written.append(
            write_topk_svg(
                [str(v) for v in vids[order]],
                ranks[order].tolist(),
                os.path.join(args.workdir, "topk.svg"),
                k=args.topk,
            )
        )
        counts, edges = np.histogram(ranks, bins=20)
        written.append(
            write_rank_histogram_svg(
                edges.tolist(),
                counts.tolist(),
                os.path.join(args.workdir, "rank_histogram.svg"),
            )
        )
    print(json.dumps({"written": written}))
    return 0


def cmd_analyze(args) -> int:
    """Graph characteristics + engine recommendation (the reference
    dashboard's analytics layer, computed distributed)."""
    from parallel_pagerank_ray.functions.recommend import (
        analyze_graph,
        recommend_engine,
        reference_report,
    )

    g = _load_graph(args)
    analysis = analyze_graph(g.n, g.edges)
    out = {"analysis": analysis}
    if analysis is not None:
        out["recommendation"] = recommend_engine(analysis)
        # dashboard-parity payload (the reference UI's full analytics
        # document: tier texts, best method, per-method predictions)
        out["reference_report"] = reference_report(analysis)
    print(json.dumps(out, indent=1, sort_keys=True))
    return 0


def cmd_report(args) -> int:
    """Self-contained HTML analysis report (the headless equivalent of
    the reference's Streamlit dashboard): graph characteristics +
    engine recommendation + PageRank convergence / top-k / rank
    distribution, all inline SVG in ONE file under --workdir."""
    from parallel_pagerank_ray.functions.report import write_report_html
    from parallel_pagerank_ray.pipelines.pagerank_actors import pagerank_bsp

    g = _load_graph(args)
    run = pagerank_bsp(
        g, d=args.damping, tol=args.tol, max_iters=args.max_iters
    )
    path = write_report_html(
        g,
        run,
        os.path.join(args.workdir, "report.html"),
        top_k=args.topk,
    )
    print(json.dumps({"report": path, "iterations": run.iterations}))
    return 0


def main(argv: list[str] | None = None) -> int:
    p = argparse.ArgumentParser(prog="parallel_pagerank_ray")
    sub = p.add_subparsers(dest="cmd", required=True)

    def add_io(sp):
        sp.add_argument("--pages")
        sp.add_argument("--edges")
        sp.add_argument("--graph")
        sp.add_argument("--workdir", default="/tmp/ppr_out")

    run = sub.add_parser("run")
    run.add_argument(
        "algo",
        choices=[
            "pagerank", "components", "labelprop", "triangles",
            "kcore", "bfs", "sssp", "hits", "closeness", "spcount",
            "betweenness", "walks", "articulation", "bridges",
        ],
    )
    add_io(run)
    run.add_argument("--k", type=int, default=2, help="k for kcore")
    run.add_argument(
        "--sources", default="0",
        help="comma-separated source vids (bfs/sssp/closeness/spcount/walks)",
    )
    run.add_argument(
        "--directed", action="store_true",
        help="walk the directed edges (bfs/closeness/spcount/walks)",
    )
    run.add_argument(
        "--walks-per-seed", type=int, default=4, help="walks per source"
    )
    run.add_argument(
        "--walk-length", type=int, default=8, help="steps per walk"
    )
    run.add_argument(
        "--salt", default="rw", help="walk-hash salt (varies the corpus)"
    )
    run.add_argument(
        "--hits-iters", type=int, default=2,
        help="HITS update pairs (int64 headroom bounds this)",
    )
    run.add_argument("--tol", type=float, default=1e-6)
    run.add_argument("--damping", type=float, default=0.85)
    run.add_argument("--max-iters", type=int, default=1000)
    run.add_argument("--engine", choices=["dataset", "bsp"], default="dataset")
    run.add_argument(
        "--personalization",
        help="parquet with (vid, e) columns — restart vector (BSP engine)",
    )
    run.add_argument("--checkpoint", action="store_true")
    run.add_argument(
        "--plots", action="store_true",
        help="render convergence/top-k/histogram SVGs after the run",
    )
    run.set_defaults(fn=cmd_run)

    build = sub.add_parser("build")
    add_io(build)
    build.set_defaults(fn=cmd_build)

    plot = sub.add_parser("plot")
    plot.add_argument("--workdir", default="/tmp/ppr_out")
    plot.add_argument("--topk", type=int, default=20)
    plot.set_defaults(fn=cmd_plot)

    analyze = sub.add_parser("analyze")
    add_io(analyze)
    analyze.set_defaults(fn=cmd_analyze)

    report = sub.add_parser("report")
    add_io(report)
    report.add_argument("--tol", type=float, default=1e-6)
    report.add_argument("--damping", type=float, default=0.85)
    report.add_argument("--max-iters", type=int, default=1000)
    report.add_argument("--topk", type=int, default=20)
    report.set_defaults(fn=cmd_report)

    args = p.parse_args(argv)

    if args.cmd == "plot":  # pure driver-side artifact rendering
        return args.fn(args)

    import ray

    if not ray.is_initialized():
        # under `ray job submit` RAY_ADDRESS points at the cluster —
        # attach to it; standalone runs default to a local session
        ray.init(
            address=os.environ.get("RAY_ADDRESS", "local"),
            include_dashboard=False,
            logging_level=logging.ERROR,
        )
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False
    try:
        return args.fn(args)
    finally:
        ray.shutdown()


if __name__ == "__main__":  # pragma: no cover
    sys.exit(main())
