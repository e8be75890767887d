"""Neighborhood function N(r) — how many (source, target) pairs are
within distance r — the classic web-graph distance/effective-diameter
analysis (ANF: Palmer et al. 2002, KDD; HyperANF: Boldi & Vigna 2011,
WWW). The reference engine has no distance analytics; this is a
beyond-reference link-graph operator.

Two modes sharing one BSP round shape, expressed entirely in Dataset
ops (one hash join + one bucketed grouped_agg per round; the driver
sees one scalar per radius, never data):

- ``exact``: the reachability state IS the sparse pair table
  (v, w) = "w is within r hops of v". Merge = exact distinct; N(r) =
  the table's row count. State is Θ(Σ|B(v,r)|) rows — quadratic in
  the worst case — so this is the validation/small-graph mode.
- ``hll``: per-vertex HyperLogLog registers as a LONG table
  (vid, reg, val), only non-zero entries stored. Merge = grouped max
  (associative, duplicate-invariant, order-invariant), so the 100 TB
  path exchanges O(E·m_present) integer rows per round — the
  HyperANF design. Hashing is the repo's SQL-reproducible mod-2³¹-1
  scheme; the estimator denominator is an EXACT int64 (terms
  2^(30-reg), absent registers contribute 2^30), so the sketch is
  value-checked — same registers, same denominator, same single
  division — at any parallelism, not just row-counted.

Both propagate over OUT-edges as given: pass the symmetric closure
(``undirected_edges(dedup=False)`` — max/distinct merges are
duplicate-invariant) for undirected balls.

No small/large-range HLL corrections: the raw estimator is the gated
quantity; calibrated cardinalities apply the standard corrections to
``denom_scaled`` downstream.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data as rd

from parallel_pagerank_ray.stages.agg import distinct, grouped_agg
from parallel_pagerank_ray.util import safe_join

# SQL-safe hash params (vid * A + B fits int64 for vid < 2^42)
HLL_A = 1_000_081
HLL_B = 12_345
P31 = (1 << 31) - 1
_DENOM_SHIFT = 30  # term = 2^(30 - reg); rho <= 28 for b=4


def _hll_est(denom_scaled: int, m: int) -> float:
    # alpha_16 = 0.673 (Flajolet et al. 2007, m=16); single division
    # of exact operands — identical literal expression in the oracle
    return (0.673 * 256.0 * 1073741824.0) / float(denom_scaled)


def neighborhood_function(
    edges: rd.Dataset,
    max_radius: int,
    mode: str = "exact",
    m: int = 16,
    num_partitions: int | None = None,
    num_buckets: int | None = None,
) -> pd.DataFrame:
    """N(r) for r = 0..max_radius over an int-vid (src, dst) Dataset.

    Returns a small driver DataFrame (one row per radius — bounded by
    max_radius, never by data): exact -> (radius, pairs); hll ->
    (radius, denom_scaled, est).
    """
    if mode not in ("exact", "hll"):
        raise ValueError(f"neighborhood_function: unknown mode {mode!r}")
    if max_radius < 0:
        raise ValueError("neighborhood_function: max_radius must be >= 0")
    if mode == "hll" and m != 16:
        raise ValueError("hll mode: estimator constants are wired for m=16")
    if num_partitions is None:
        from parallel_pagerank_ray.pipelines.graph_build import (
            _default_join_partitions,
        )

        num_partitions = _default_join_partitions()

    edges = edges.select_columns(["src", "dst"]).materialize()
    verts = distinct(
        edges.select_columns(["src"]).union(
            edges.select_columns(["dst"]).rename_columns({"dst": "src"})
        ),
        ["src"],
        num_buckets=num_buckets,
    ).rename_columns({"src": "vid"})

    radius = np.arange(max_radius + 1, dtype=np.int64)

    if mode == "exact":

        def init(t: pa.Table) -> pa.Table:
            v = t.column("vid")
            return pa.table({"v": v, "w": v})

        state = verts.map_batches(init, batch_format="pyarrow").materialize()
        totals = [state.count()]
        for _ in range(max_radius):
            contrib = (
                safe_join(
                    edges,
                    state,
                    join_type="inner",
                    num_partitions=num_partitions,
                    on=("dst",),
                    right_on=("v",),
                )
                .select_columns(["src", "w"])
                .rename_columns({"src": "v"})
            )
            state = distinct(
                state.union(contrib), ["v", "w"], num_buckets=num_buckets
            ).materialize()
            totals.append(state.count())
        return pd.DataFrame(
            {"radius": radius, "pairs": np.array(totals, dtype=np.int64)}
        )

    # hll: sparse (vid, reg, val) registers, absent => 0
    n_verts = verts.materialize().count()

    def init(t: pa.Table) -> pa.Table:
        vid = t.column("vid").to_numpy(zero_copy_only=False).astype(np.int64)
        h = (vid * HLL_A + HLL_B) % P31
        reg = (h % m).astype(np.int64)
        x = (h // m) | (1 << 27)
        rho = np.log2(x & -x).astype(np.int64) + 1
        return pa.table(
            {
                "vid": pa.array(vid, pa.int64()),
                "reg": pa.array(reg, pa.int64()),
                "val": pa.array(rho, pa.int64()),
            }
        )

    def present_deficit(t: pa.Table) -> pa.Table:
        # each present register with val >= 1 replaces a 2^30 default
        # term with 2^(30-val): deficit = 2^30 - 2^(30-val), an exact
        # int64 summed at any order/parallelism
        val = t.column("val").to_numpy(zero_copy_only=False)
        d = (np.int64(1) << _DENOM_SHIFT) - (
            np.int64(1) << (_DENOM_SHIFT - val)
        )
        return pa.table({"d": pa.array(d, pa.int64())})

    def denom(state: rd.Dataset) -> int:
        from parallel_pagerank_ray.stages.agg import global_agg

        got = global_agg(
            state.map_batches(present_deficit, batch_format="pyarrow"),
            {"s": ("d", "sum")},
        )["s"]
        return n_verts * m * (1 << _DENOM_SHIFT) - int(got or 0)

    state = verts.map_batches(init, batch_format="pyarrow").materialize()
    totals = [denom(state)]
    for _ in range(max_radius):
        contrib = (
            safe_join(
                edges,
                state,
                join_type="inner",
                num_partitions=num_partitions,
                on=("dst",),
                right_on=("vid",),
            )
            .select_columns(["src", "reg", "val"])
            .rename_columns({"src": "vid"})
        )
        state = grouped_agg(
            state.union(contrib),
            ["vid", "reg"],
            {"val": ("val", "max")},
            num_buckets=num_buckets,
        ).materialize()
        totals.append(denom(state))

    return pd.DataFrame(
        {
            "radius": radius,
            "denom_scaled": np.array(totals, dtype=np.int64),
            "est": [_hll_est(t, m) for t in totals],
        }
    )
