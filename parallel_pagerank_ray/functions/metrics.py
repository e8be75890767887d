"""Metrics utilities: rank histograms (SURVEY.md A7) and the tiny
reference-stdout parser kept for cross-checking against the reference
binaries if they are ever run (S6 — the reference uses regex-parsed
stdout as its data interchange format, compare_methods.py:49-134;
this engine's structured metrics tables replace it)."""

from __future__ import annotations

import re

import numpy as np
import ray.data as rd


def rank_histogram(
    ranks: rd.Dataset, bins: int = 20, lo: float | None = None,
    hi: float | None = None, col: str = "rank",
) -> tuple[np.ndarray, np.ndarray]:
    """Distributed histogram: per-batch ``np.histogram`` partials summed
    on the driver (A7: app.py:427, visualize_pagerank.py:187-198).

    Returns (counts[bins], edges[bins+1]). When lo/hi are omitted one
    cheap min/max pass fixes the range so every partial uses identical
    edges.
    """
    if lo is None or hi is None:
        from parallel_pagerank_ray.stages.agg import global_agg

        m = global_agg(ranks, {"lo": (col, "min"), "hi": (col, "max")})
        lo = float(m["lo"]) if lo is None else lo
        hi = float(m["hi"]) if hi is None else hi
    if hi <= lo:
        hi = lo + 1e-12
    edges = np.linspace(lo, hi, bins + 1)

    def partial(b: dict[str, np.ndarray]) -> dict[str, np.ndarray]:
        c, _ = np.histogram(b[col], bins=edges)
        return {"c": c.astype(np.int64), "bin": np.arange(bins, dtype=np.int64)}

    rows = ranks.map_batches(partial, batch_format="numpy").take_all()
    counts = np.zeros(bins, dtype=np.int64)
    for r in rows:
        counts[int(r["bin"])] += int(r["c"])
    return counts, edges


_ITER_RE = re.compile(
    r"Iteration\s+(\d+),\s*Max Error:\s*([0-9.eE+-]+),\s*L1 Norm:\s*([0-9.eE+-]+)"
)
_TIME_RE = re.compile(r"Total time\s*=\s*([0-9.eE+-]+)\s*seconds")
_RANK_RE = re.compile(r"P_t1\[(\d+)\]\s*=\s*([0-9.eE+-]+)")


def parse_reference_stdout(text: str) -> dict:
    """Parse the reference binaries' stdout metrics lines
    (pagerank_mpi.c:216,223,446; rank lines printed by the serial/
    pthreads variants, regexes mirrored from compare_methods.py:49-134)."""
    iters = [
        {"iter": int(m[0]), "max_err": float(m[1]), "l1": float(m[2])}
        for m in _ITER_RE.findall(text)
    ]
    t = _TIME_RE.search(text)
    ranks = {int(i): float(v) for i, v in _RANK_RE.findall(text)}
    return {
        "iterations": iters,
        "total_time": float(t.group(1)) if t else None,
        "ranks": ranks,
        "converged_l1": "Converged based on L1 norm" in text,
    }
