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
- ``hll``: per-vertex HyperLogLog registers as a WIDE table — one
  row per vertex, m int64 columns. Merge = m grouped-max aggs
  (associative, duplicate-invariant, order-invariant), so the 100 TB
  path exchanges O(E) rows per round with map-side pre-folding — the
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


def effective_diameter(nf: pd.DataFrame, q: float = 0.9) -> pd.DataFrame:
    """q-effective diameter from an exact N(r) curve (ANF's headline
    product): the interpolated radius at which N(r) first reaches
    q * N(max_radius) — "90% of connected pairs are within d_eff hops".

    Pure driver fold over the <= max_radius+1 curve rows. The float
    arithmetic is a fixed expression over exact int64 pair counts
    (one multiply for the threshold, one division for the linear
    interpolation), reproduced literally by the DuckDB oracle, so the
    result is value-exact. Counts are relative to the curve's horizon:
    if the curve was truncated before the true diameter, d_eff is the
    within-horizon effective diameter (document the horizon).

    Output: one row (q, n_pairs_max, d_eff).
    """
    if "pairs" not in nf.columns:
        raise ValueError(
            "effective_diameter needs an exact-mode curve (pairs column); "
            "hll curves estimate cardinalities, not exact quantiles"
        )
    pairs = nf.sort_values("radius")["pairs"].to_numpy().astype(np.int64)
    nmax = int(pairs[-1])
    x = q * np.float64(nmax)
    r = int(np.argmax(pairs.astype(np.float64) >= x))
    if r == 0:
        d = np.float64(0.0)
    else:
        d = (np.float64(r) - 1.0) + (x - np.float64(pairs[r - 1])) / (
            np.float64(pairs[r]) - np.float64(pairs[r - 1])
        )
    return pd.DataFrame(
        {
            "q": np.array([q], dtype=np.float64),
            "n_pairs_max": np.array([nmax], dtype=np.int64),
            "d_eff": np.array([d], dtype=np.float64),
        }
    )


def _hll_est(denom_scaled: int, m: int) -> float:
    # alpha_16 = 0.673 (Flajolet et al. 2007, m=16); single division
    # of exact operands — identical literal expression in the oracle
    return (0.673 * 256.0 * 1073741824.0) / float(denom_scaled)


def _exact_broadcast(
    edges: rd.Dataset,
    verts: rd.Dataset,
    max_radius: int,
    radius: np.ndarray,
    broadcast_max: int,
    num_buckets: int | None,
) -> pd.DataFrame | None:
    """Broadcast fast path for the exact N(r) curve: when the edge
    table fits the guard (and vids pack into an int64 pair key), ship
    the src-sorted edge arrays ONCE via ray.put and expand every
    source's ball INSIDE map_batches over the partitioned vertex set —
    classic multi-source BFS with frontier-only expansion (one
    searchsorted gather + one packed-key merge per radius, all numpy).
    The only exchange is max_radius+1 int64 partial counts per task —
    no joins, no per-round state shuffle. Returns None past the guard
    (the pair-table BSP below is the beyond-plasma shape)."""
    import ray

    ne = edges.count()  # edges is materialized by the caller
    if ne > broadcast_max:
        return None
    tabs = [t for t in ray.get(edges.to_arrow_refs()) if t.num_rows]
    if tabs:
        src = np.concatenate(
            [t.column("src").to_numpy(zero_copy_only=False) for t in tabs]
        ).astype(np.int64)
        dst = np.concatenate(
            [t.column("dst").to_numpy(zero_copy_only=False) for t in tabs]
        ).astype(np.int64)
    else:
        src = np.array([], dtype=np.int64)
        dst = np.array([], dtype=np.int64)
    stride = int(max(src.max(initial=-1), dst.max(initial=-1))) + 1
    if stride > 3_000_000_000:  # v*stride+w must fit int64
        return None
    order = np.argsort(src, kind="stable")
    ref = ray.put((src[order], dst[order]))

    def counts(t: pa.Table) -> pa.Table:
        ss, dd = ray.get(ref)
        v = t.column("vid").to_numpy(zero_copy_only=False).astype(np.int64)
        out = np.zeros(max_radius + 1, dtype=np.int64)
        out[0] = len(v)
        ball = np.sort(v * stride + v)  # packed (source, vertex) keys
        fv, fw = v, v  # frontier pairs
        for r in range(1, max_radius + 1):
            if len(fv):
                a = np.searchsorted(ss, fw, "left")
                b = np.searchsorted(ss, fw, "right")
                lens = b - a
                m = lens > 0
                if m.any():
                    a2, lens2 = a[m], lens[m]
                    csum = np.concatenate(([0], np.cumsum(lens2)[:-1]))
                    pos = (
                        np.arange(int(lens2.sum()))
                        - np.repeat(csum, lens2)
                        + np.repeat(a2, lens2)
                    )
                    key = np.unique(
                        np.repeat(fv[m], lens2) * stride + dd[pos]
                    )
                    # sorted set-difference: keys not already in ball
                    idx = np.minimum(
                        np.searchsorted(ball, key), len(ball) - 1
                    )
                    new = key[ball[idx] != key] if len(ball) else key
                    ball = np.sort(np.concatenate([ball, new]))
                    fv, fw = new // stride, new % stride
                else:
                    fv = fw = np.array([], dtype=np.int64)
            out[r] = len(ball)
        return pa.table(
            {
                "radius": pa.array(radius, pa.int64()),
                "pairs": pa.array(out, pa.int64()),
            }
        )

    parts = verts.map_batches(counts, batch_format="pyarrow")
    tot = grouped_agg(
        parts, ["radius"], {"pairs": ("pairs", "sum")}, num_buckets=num_buckets
    ).to_pandas()
    tot = (
        tot.set_index("radius")["pairs"]
        .reindex(radius, fill_value=0)  # empty vertex set -> all-zero curve
        .to_numpy()
        .astype(np.int64)
    )
    return pd.DataFrame({"radius": radius, "pairs": tot})


def neighborhood_function(
    edges: rd.Dataset,
    max_radius: int,
    mode: str = "exact",
    m: int = 16,
    num_partitions: int | None = None,
    num_buckets: int | None = None,
    broadcast_max: int = 5_000_000,
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
        fast = _exact_broadcast(
            edges, verts, max_radius, radius, broadcast_max, num_buckets
        )
        if fast is not None:
            return fast

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

    # hll: WIDE register layout — one row per vertex, m int64 columns
    # v0..v{m-1}. One row per edge crosses the wire per round (vs m
    # rows in a long layout: measured 29 s -> wide cut at sf0.1); the
    # max-merge is m parallel max aggs over vid, and grouped_agg's
    # map-side partial pre-folds duplicate dsts before the shuffle.
    reg_cols = [f"v{i}" for i in range(m)]
    merge_specs = {c: (c, "max") for c in reg_cols}

    def init_regs(vid: np.ndarray) -> np.ndarray:
        h = (vid * HLL_A + HLL_B) % P31
        reg = (h % m).astype(np.int64)
        x = (h // m) | (1 << 27)
        rho = np.log2(x & -x).astype(np.int64) + 1
        regs = np.zeros((len(vid), m), dtype=np.int64)
        regs[np.arange(len(vid)), reg] = rho
        return regs

    # Broadcast fast path: when the vertex set fits the guard, the
    # n x m register matrix lives as ONE plasma object per round
    # (ray.put, zero-copy numpy view in every task); each round is a
    # single stateless pass over the edges (searchsorted gather +
    # per-batch reduceat pre-fold) + one bucketed grouped max whose
    # output is bounded by n rows — no join, no state shuffle. The
    # driver holds only guard-bounded arrays, mirroring the repo's
    # broadcast_max contract (relational.py attaches); past the guard
    # the join path below is the 100 TB shape.
    vp = verts.materialize()
    n_verts = vp.count()
    if n_verts <= broadcast_max:
        import ray

        vids = np.sort(vp.to_pandas()["vid"].to_numpy().astype(np.int64))
        regs = init_regs(vids)

        def denom_np(r: np.ndarray) -> int:
            return int((np.int64(1) << (_DENOM_SHIFT - r)).sum())

        empty = pa.table(
            {c: pa.array([], pa.int64()) for c in ["vid"] + reg_cols}
        )
        totals = [denom_np(regs)]
        for _ in range(max_radius):
            ref = ray.put((vids, regs))

            def scatter(t: pa.Table, _ref=ref) -> pa.Table:
                vs, rg = ray.get(_ref)
                src = (
                    t.column("src")
                    .to_numpy(zero_copy_only=False)
                    .astype(np.int64)
                )
                if len(src) == 0:
                    return empty
                dst = (
                    t.column("dst")
                    .to_numpy(zero_copy_only=False)
                    .astype(np.int64)
                )
                order = np.argsort(src, kind="stable")
                s = src[order]
                rm = rg[np.searchsorted(vs, dst[order])]
                bounds = np.flatnonzero(np.r_[True, s[1:] != s[:-1]])
                folded = np.maximum.reduceat(rm, bounds, axis=0)
                cols = {"vid": pa.array(s[bounds], pa.int64())}
                for i, c in enumerate(reg_cols):
                    cols[c] = pa.array(folded[:, i], pa.int64())
                return pa.table(cols)

            fp = grouped_agg(
                edges.map_batches(scatter, batch_format="pyarrow"),
                ["vid"],
                merge_specs,
                num_buckets=num_buckets,
            ).to_pandas()
            if len(fp):
                # union with each vertex's own registers; grouped vids
                # are distinct so fancy assignment is a plain max-merge
                idx = np.searchsorted(
                    vids, fp["vid"].to_numpy().astype(np.int64)
                )
                new = regs.copy()
                new[idx] = np.maximum(
                    new[idx], fp[reg_cols].to_numpy().astype(np.int64)
                )
                regs = new
            totals.append(denom_np(regs))
        return pd.DataFrame(
            {
                "radius": radius,
                "denom_scaled": np.array(totals, dtype=np.int64),
                "est": [_hll_est(t, m) for t in totals],
            }
        )

    def init(t: pa.Table) -> pa.Table:
        vid = t.column("vid").to_numpy(zero_copy_only=False).astype(np.int64)
        onehot = init_regs(vid)
        cols = {"vid": pa.array(vid, pa.int64())}
        for i, c in enumerate(reg_cols):
            cols[c] = pa.array(onehot[:, i], pa.int64())
        return pa.table(cols)

    def row_terms(t: pa.Table) -> pa.Table:
        # per-vertex denominator contribution Σ_i 2^(30 - v_i); val=0
        # (never-touched register) contributes the 2^30 default term —
        # exact int64, associative at any order/parallelism
        s = np.zeros(t.num_rows, dtype=np.int64)
        for c in reg_cols:
            v = t.column(c).to_numpy(zero_copy_only=False)
            s += np.int64(1) << (_DENOM_SHIFT - v)
        return pa.table({"d": pa.array(s, pa.int64())})

    def denom(state: rd.Dataset) -> int:
        from parallel_pagerank_ray.stages.agg import global_agg

        got = global_agg(
            state.map_batches(row_terms, batch_format="pyarrow"),
            {"s": ("d", "sum")},
        )["s"]
        return int(got or 0)

    state = vp.map_batches(init, batch_format="pyarrow").materialize()
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
            .select_columns(["src"] + reg_cols)
            .rename_columns({"src": "vid"})
        )
        state = grouped_agg(
            state.union(contrib),
            ["vid"],
            merge_specs,
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
