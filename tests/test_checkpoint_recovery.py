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


def test_bsp_actor_death_self_heals(tmp_path, graphs):
    """Kill a shard actor mid-run: the pool respawns, reloads the last
    complete checkpoint, and the final ranks are bit-identical to an
    uninterrupted run."""
    import numpy as np
    import ray

    from parallel_pagerank_ray.pipelines.graph_build import Graph
    from parallel_pagerank_ray.pipelines.pagerank_actors import pagerank_bsp
    from parallel_pagerank_ray.sources.edge_list import edges_dataset

    n, e = graphs["medium"]
    g = Graph.from_int_edges(edges_dataset(e, num_blocks=2))

    clean = pagerank_bsp(g, tol=1e-8)
    want = clean.ranks.to_pandas().sort_values("vid")["rank"].to_numpy()

    killed = {"done": False}

    def kill_once(it, actors):
        if it == 2 and not killed["done"]:
            killed["done"] = True
            ray.kill(actors[0])

    run = pagerank_bsp(
        g,
        tol=1e-8,
        workdir=str(tmp_path),
        checkpoint_every=1,
        fault_hook=kill_once,
    )
    got = run.ranks.to_pandas().sort_values("vid")["rank"].to_numpy()
    assert killed["done"]
    assert any(h.get("recovered") for h in run.history)
    assert run.iterations == clean.iterations
    assert np.array_equal(got, want)  # bit-identical recovery


def test_bsp_actor_death_without_checkpoint_restarts(graphs):
    """No checkpoints: recovery restarts from init and still converges
    to the oracle-exact result."""
    import numpy as np
    import ray

    from parallel_pagerank_ray import oracle
    from parallel_pagerank_ray.pipelines.graph_build import Graph
    from parallel_pagerank_ray.pipelines.pagerank_actors import pagerank_bsp
    from parallel_pagerank_ray.sources.edge_list import edges_dataset

    n, e = graphs["small"]
    g = Graph.from_int_edges(edges_dataset(e, num_blocks=1))
    killed = {"done": False}

    def kill_once(it, actors):
        if it == 1 and not killed["done"]:
            killed["done"] = True
            ray.kill(actors[-1])

    run = pagerank_bsp(g, tol=1e-8, fault_hook=kill_once)
    got = run.ranks.to_pandas().sort_values("vid")["rank"].to_numpy()
    tr = oracle.pagerank(n, np.unique(np.array(e), axis=0), tol=1e-8)
    assert killed["done"]
    assert np.allclose(got, tr.ranks, atol=1e-12)
    assert run.iterations == tr.iterations


def test_resumable_sink_skips_finished_buckets(tmp_path):
    import os
    import shutil

    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from parallel_pagerank_ray.state.sink import (
        read_resumable,
        resumable_write_parquet,
    )

    t = pa.table(
        {
            "k": pa.array(np.arange(5000, dtype=np.int64) % 97),
            "v": pa.array(np.arange(5000, dtype=np.int64)),
        }
    )
    ds = rd.from_arrow(t).repartition(4)
    out = str(tmp_path / "sink")
    r1 = resumable_write_parquet(ds, out, keys=["k"], num_buckets=8)
    assert r1 == {"written": 8, "skipped": 0}
    back = read_resumable(out).to_pandas().sort_values("v").reset_index(drop=True)
    assert len(back) == 5000 and back["v"].tolist() == list(range(5000))

    # simulate a crashed partition: remove one bucket entirely and
    # leave another's half-written tmp dir behind
    shutil.rmtree(os.path.join(out, "bucket=00003"))
    os.makedirs(os.path.join(out, "bucket=00005.tmp"), exist_ok=True)
    mtimes = {
        d: os.path.getmtime(os.path.join(out, d, "part.parquet"))
        for d in os.listdir(out)
        if d.startswith("bucket=") and not d.endswith(".tmp")
    }
    r2 = resumable_write_parquet(ds, out, keys=["k"], num_buckets=8)
    assert r2 == {"written": 1, "skipped": 7}
    for d, m in mtimes.items():
        assert os.path.getmtime(os.path.join(out, d, "part.parquet")) == m, d
    back = read_resumable(out).to_pandas()
    assert len(back) == 5000


def test_resumable_sink_all_done_is_noop(tmp_path):
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from parallel_pagerank_ray.state.sink import resumable_write_parquet

    t = pa.table({"k": pa.array(np.arange(100, dtype=np.int64))})
    ds = rd.from_arrow(t)
    out = str(tmp_path / "s")
    resumable_write_parquet(ds, out, keys=["k"], num_buckets=4)
    r = resumable_write_parquet(ds, out, keys=["k"], num_buckets=4)
    assert r == {"written": 0, "skipped": 4}
