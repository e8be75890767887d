"""Checkpoint-contract recovery: a torn/incomplete iteration directory
(no _SUCCESS) must be ignored and resume must fall back to the last
complete iteration; components resume also covered."""

from __future__ import annotations

import os
import shutil

import numpy as np

from parallel_pagerank_ray.pipelines.components import connected_components
from parallel_pagerank_ray.pipelines.graph_build import Graph
from parallel_pagerank_ray.pipelines.pagerank import pagerank
from parallel_pagerank_ray.sources.edge_list import edges_dataset


def test_torn_checkpoint_falls_back(graphs, tmp_path):
    n, e = graphs["medium"]
    g = Graph.from_int_edges(edges_dataset(e, num_blocks=2))
    full = pagerank(g, tol=1e-6, num_parts=2)
    ref = full.ranks.to_pandas().sort_values("vid")["rank"].to_numpy()

    wd = str(tmp_path / "ck")
    pagerank(g, tol=1e-6, max_iters=5, num_parts=2, workdir=wd)
    root = os.path.join(wd, "pagerank")
    # simulate a crash mid-write of iteration 6: directory exists, no _SUCCESS
    torn = os.path.join(root, "iter=6")
    shutil.copytree(os.path.join(root, "iter=5"), torn)
    os.remove(os.path.join(torn, "_SUCCESS"))
    # corrupt the torn copy so reading it would give wrong results
    for f in os.listdir(torn):
        if f.endswith(".parquet"):
            open(os.path.join(torn, f), "wb").close()

    res = pagerank(g, tol=1e-6, num_parts=2, workdir=wd)
    got = res.ranks.to_pandas().sort_values("vid")["rank"].to_numpy()
    assert res.iterations == full.iterations
    assert np.array_equal(got, ref)


def test_fingerprint_mismatch_ignores_checkpoint(graphs, tmp_path):
    n, e = graphs["medium"]
    g = Graph.from_int_edges(edges_dataset(e, num_blocks=2))
    wd = str(tmp_path / "ck")
    pagerank(g, tol=1e-4, max_iters=3, num_parts=2, workdir=wd)
    # different tolerance -> different fingerprint -> fresh run, right count
    from parallel_pagerank_ray import oracle

    run = pagerank(g, tol=1e-6, num_parts=2, workdir=str(tmp_path / "other"))
    tr = oracle.pagerank(n, np.unique(e, axis=0), tol=1e-6)
    assert run.iterations == tr.iterations


def test_components_resume(graphs, tmp_path):
    n, e = graphs["two_comps"]
    g = Graph.from_int_edges(edges_dataset(e, num_blocks=2))
    full = connected_components(g, num_parts=2)
    ref = full.components.to_pandas().sort_values("vid")["comp"].to_numpy()

    wd = str(tmp_path / "ck")
    part = connected_components(
        g, num_parts=2, max_iters=2, workdir=wd, checkpoint_every=1
    )
    assert part.iterations == 2
    res = connected_components(g, num_parts=2, workdir=wd, checkpoint_every=1)
    got = res.components.to_pandas().sort_values("vid")["comp"].to_numpy()
    assert np.array_equal(got, ref)
