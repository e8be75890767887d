"""Checkpoint/resume demonstration at bench scale (VERDICT r2 item 6).

Phases (each in its own process group / fresh Ray session):
  A. checkpointed run (checkpoint_every=2) — the parent SIGKILLs the
     WHOLE process group once lineage.json shows iteration >= 4, so the
     driver, raylet and workers all die mid-superstep (a real node
     loss, not a polite max_iters stop).
  B. the same invocation against the same workdir — resumes from the
     latest complete per-partition checkpoint and finishes all 10
     iterations; prints the final rank md5.
  C. control session: uninterrupted no-checkpoint run (reference hash +
     baseline superstep time) and an uninterrupted checkpointed run
     (checkpoint overhead per superstep), sharing one graph/store build.

PASS = B's final md5 == C's reference md5 (bit-identical: float64
round-trips Parquet exactly) and B's history records the resume.

Usage: python scripts/bench_resume.py [n_nodes] [avg_deg]
Defaults to the 10M-vertex / ~100M-edge headline-scale graph; the
pytest-scale equivalent lives in tests/test_bsp.py and
tests/test_checkpoint_recovery.py. Prints ONE JSON line.
"""

from __future__ import annotations

import hashlib
import json
import logging
import os
import signal
import subprocess
import sys
import time

import numpy as np

# Ray workers resolve the package from the driver's CWD, not sys.path —
# anchor everything at the repo root regardless of where this is run
_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
os.chdir(_REPO_ROOT)
sys.path.insert(0, _REPO_ROOT)

N_NODES =int(sys.argv[1]) if len(sys.argv) > 1 and sys.argv[1].isdigit() else 10_000_000
AVG_DEG = int(sys.argv[2]) if len(sys.argv) > 2 and sys.argv[2].isdigit() else 10
ITERS = 10
CKPT_EVERY = 2
WORKDIR = f"/tmp/bench_resume_{N_NODES}"
NUM_CPUS = int(os.environ.get("RAY_GRAFT_CPUS", "32"))
KILL_AT = int(os.environ.get("PPR_RESUME_KILL_AT", "4"))


def _session():
    import ray

    ray.init(
        address="local",
        num_cpus=NUM_CPUS,
        include_dashboard=False,
        logging_level=logging.ERROR,
    )
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False
    logging.getLogger("ray.data").setLevel(logging.ERROR)


def _graph_and_store():
    import pyarrow as pa
    import ray.data as rd

    from parallel_pagerank_ray.pipelines.graph_build import Graph
    from parallel_pagerank_ray.sources.pages import powerlaw_edges
    from parallel_pagerank_ray.stages.csr_store import EdgeShardStore

    e = powerlaw_edges(N_NODES, AVG_DEG, seed=42)
    edges = rd.from_arrow(
        pa.table({"src": e[:, 0], "dst": e[:, 1]})
    ).repartition(NUM_CPUS)
    g = Graph.from_int_edges(edges, dedup=True)
    store = EdgeShardStore.build(g.edges, n=g.n, num_parts=32)
    return g, store


def _rank_md5(run) -> str:
    df = run.ranks.to_pandas().sort_values("vid")
    return hashlib.md5(
        df["rank"].to_numpy(dtype=np.float64).tobytes()
    ).hexdigest()


if "--victim" in sys.argv or "--resume" in sys.argv:
    # child process: checkpointed run against WORKDIR. The victim is
    # SIGKILLed by the parent mid-run; the resume completes and prints
    # its result as the last stdout line. A fresh-process resume shows
    # up as history[0]["iter"] == the resumed checkpoint (first_iter).
    _session()
    from parallel_pagerank_ray.pipelines.pagerank_actors import pagerank_bsp

    g, store = _graph_and_store()
    t0 = time.time()
    run = pagerank_bsp(
        g, d=0.85, tol=0.0, max_iters=ITERS, store=store,
        workdir=WORKDIR, checkpoint_every=CKPT_EVERY,
    )
    wall = time.time() - t0
    resumed = [h for h in run.history if h.get("recovered") or "resumed_iter" in h]
    print(json.dumps({
        "md5": _rank_md5(run),
        "iterations": run.iterations,
        "wall_sec": round(wall, 2),
        "resume_events": resumed,
        "first_iter": run.history[0].get("iter") if run.history else None,
    }))
    import ray

    ray.shutdown()
    sys.exit(0)

if "--control" in sys.argv:
    _session()
    from parallel_pagerank_ray.pipelines.pagerank_actors import pagerank_bsp

    g, store = _graph_and_store()
    pagerank_bsp(g, d=0.85, tol=0.0, max_iters=2, store=store)  # warm
    t0 = time.time()
    ref = pagerank_bsp(g, d=0.85, tol=0.0, max_iters=ITERS, store=store)
    plain_s = time.time() - t0
    ref_md5 = _rank_md5(ref)
    t0 = time.time()
    ck = pagerank_bsp(
        g, d=0.85, tol=0.0, max_iters=ITERS, store=store,
        workdir=WORKDIR + "_control", checkpoint_every=CKPT_EVERY,
    )
    ck_s = time.time() - t0
    assert _rank_md5(ck) == ref_md5, "checkpointing changed results"
    print(json.dumps({
        "md5": ref_md5,
        "n_edges": store.num_edges,
        "plain_sec_per_superstep": round(plain_s / ITERS, 4),
        "ckpt_sec_per_superstep": round(ck_s / ITERS, 4),
        "ckpt_overhead_per_superstep": round((ck_s - plain_s) / ITERS, 4),
        "ckpt_overhead_pct": round(100.0 * (ck_s - plain_s) / plain_s, 1),
    }))
    import ray

    ray.shutdown()
    sys.exit(0)


def _spawn(flag: str) -> subprocess.Popen:
    return subprocess.Popen(
        [sys.executable, os.path.abspath(__file__), str(N_NODES), str(AVG_DEG), flag],
        stdout=subprocess.PIPE,
        stderr=subprocess.DEVNULL,
        text=True,
        start_new_session=True,  # own process group: the kill takes
        # driver + raylet + workers down together (no orphaned raylets)
    )


def _lineage_iters() -> list[int]:
    try:
        with open(os.path.join(WORKDIR, "pagerank_bsp", "lineage.json")) as f:
            return sorted(int(k) for k in json.load(f)["iters"])
    except Exception:
        return []


def main() -> None:
    import shutil

    import numpy as np  # noqa: F401

    shutil.rmtree(WORKDIR, ignore_errors=True)
    shutil.rmtree(WORKDIR + "_control", ignore_errors=True)

    victim = _spawn("--victim")
    t0 = time.time()
    killed_at = None
    while time.time() - t0 < 1800:
        its = _lineage_iters()
        if its and its[-1] >= KILL_AT:
            os.killpg(victim.pid, signal.SIGKILL)
            killed_at = its[-1]
            break
        if victim.poll() is not None:
            raise SystemExit("victim finished before the kill — graph too small?")
        time.sleep(0.1)
    victim.wait()
    time.sleep(2)

    resume = _spawn("--resume")
    out, _ = resume.communicate(timeout=1800)
    res = json.loads(out.strip().splitlines()[-1])

    control = _spawn("--control")
    out, _ = control.communicate(timeout=1800)
    ctl = json.loads(out.strip().splitlines()[-1])

    print(json.dumps({
        "metric": "checkpoint/resume at bench scale",
        "n_vertices": N_NODES,
        "n_edges": ctl["n_edges"],
        "iters": ITERS,
        "checkpoint_every": CKPT_EVERY,
        "killed_at_checkpoint_iter": killed_at,
        "resume": res,
        "control": ctl,
        "bit_identical": res["md5"] == ctl["md5"],
    }))


if __name__ == "__main__":
    main()
