"""SALSA link analysis (Lempel & Moran 2000, WWW) — the stochastic
HITS variant whose stationary scores have a CLOSED FORM, so unlike
HITS/PageRank no float iteration is needed and the result is
value-exact at any parallelism:

- authority score of a = (|A_j| / |A|) * (indeg(a) / sum indeg over
  a's bipartite-support-graph component A_j)
- hub score symmetric with out-degrees.

The whole computation is therefore: one distinct edge set, one
connected-components run over the bipartite support graph (hub slot
2v, authority slot 2v+1 — id spaces kept disjoint so a node id acting
as both hub and authority stays two chain states, the SALSA setup),
two degree aggregations, two per-component sums, and a final scalar
expression. Scores are emitted with their exact int64 numerator
(comp_size * deg) and denominator (total * comp_deg) plus the single
float64 division — the repo's bit-reproducible value pattern.

Scale shape: CC is the repo's pointer-jumping BSP
(`pipelines/components.py`); degrees and component sums are bucketed
`grouped_agg` shuffles of (id, int) rows; the only driver scalars are
the two side totals. Nothing quadratic, nothing dense.

The reference engine has no SALSA (its HITS lives in the dashboard,
`/root/reference/dashboard/app.py`); this is a beyond-reference
link-graph operator.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray.data as rd

from parallel_pagerank_ray.stages.agg import distinct, grouped_agg
from parallel_pagerank_ray.util import safe_join


def _side_scores(
    deg: rd.Dataset,
    comps: rd.Dataset,
    side: str,
    bip_offset: int,
    num_partitions: int | None,
    num_buckets: int | None,
) -> rd.Dataset:
    """(id, deg) + bipartite comp labels -> scored side table."""

    def to_bip(t: pa.Table) -> pa.Table:
        vid = t.column("id").to_numpy(zero_copy_only=False).astype(np.int64)
        return t.append_column(
            "bid", pa.array(2 * vid + bip_offset, pa.int64())
        )

    labeled = (
        safe_join(
            deg.map_batches(to_bip, batch_format="pyarrow"),
            comps,
            join_type="inner",
            num_partitions=num_partitions,
            on=("bid",),
            right_on=("vid",),
        )
        .select_columns(["id", "deg", "comp"])
        .materialize()
    )
    total = labeled.count()
    per_comp = grouped_agg(
        labeled,
        ["comp"],
        {"comp_deg": ("deg", "sum"), "comp_size": ("deg", "count")},
        num_buckets=num_buckets,
    )
    joined = safe_join(
        labeled,
        per_comp,
        join_type="inner",
        num_partitions=num_partitions,
        on=("comp",),
    )

    def score(t: pa.Table) -> pa.Table:
        d = t.column("deg").to_numpy(zero_copy_only=False).astype(np.int64)
        cs = (
            t.column("comp_size")
            .to_numpy(zero_copy_only=False)
            .astype(np.int64)
        )
        cd = (
            t.column("comp_deg")
            .to_numpy(zero_copy_only=False)
            .astype(np.int64)
        )
        num = cs * d
        den = np.int64(total) * cd
        return pa.table(
            {
                "side": pa.array([side] * t.num_rows, pa.string()),
                "vid": t.column("id"),
                "deg": pa.array(d, pa.int64()),
                "comp_size": pa.array(cs, pa.int64()),
                "comp_deg": pa.array(cd, pa.int64()),
                "total": pa.array(
                    np.full(t.num_rows, total, dtype=np.int64), pa.int64()
                ),
                # single division of exact int64 operands (both < 2^53
                # by the guard below) — bit-identical in any engine
                "score": pa.array(
                    num.astype(np.float64) / den.astype(np.float64),
                    pa.float64(),
                ),
            }
        )

    return joined.map_batches(score, batch_format="pyarrow")


def _side_scores_bcast(
    deg: rd.Dataset,
    comp_ref,
    side: str,
    bip_offset: int,
    num_buckets: int | None,
) -> rd.Dataset:
    """Broadcast fast path: the dense bipartite comp vector rides in
    plasma (one copy per node, zero-copy reads); comp attach and the
    final score are stateless maps, so a side costs one degree agg +
    one tiny per-comp agg and NO joins."""
    import ray

    from parallel_pagerank_ray.stages.agg import grouped_agg

    def attach(t: pa.Table) -> pa.Table:
        cv = ray.get(comp_ref)
        vid = t.column("id").to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table(
            {
                "id": t.column("id"),
                "deg": t.column("deg"),
                "comp": pa.array(cv[2 * vid + bip_offset], pa.int64()),
            }
        )

    labeled = deg.map_batches(attach, batch_format="pyarrow").materialize()
    pc_tbl = grouped_agg(
        labeled,
        ["comp"],
        {"comp_deg": ("deg", "sum"), "comp_size": ("deg", "count")},
        num_buckets=num_buckets,
    ).to_pandas()  # <= #components rows, bounded by the broadcast guard
    comps_sorted = np.sort(pc_tbl["comp"].to_numpy().astype(np.int64))
    order = np.argsort(pc_tbl["comp"].to_numpy().astype(np.int64))
    cdeg = pc_tbl["comp_deg"].to_numpy().astype(np.int64)[order]
    csize = pc_tbl["comp_size"].to_numpy().astype(np.int64)[order]
    total = int(csize.sum())
    side_ref = ray.put((comps_sorted, cdeg, csize))

    def score(t: pa.Table) -> pa.Table:
        cs_, cd_, sz_ = ray.get(side_ref)
        d = t.column("deg").to_numpy(zero_copy_only=False).astype(np.int64)
        comp = t.column("comp").to_numpy(zero_copy_only=False)
        idx = np.searchsorted(cs_, comp)
        cs = sz_[idx]
        cd = cd_[idx]
        num = cs * d
        den = np.int64(total) * cd
        return pa.table(
            {
                "side": pa.array([side] * t.num_rows, pa.string()),
                "vid": t.column("id"),
                "deg": pa.array(d, pa.int64()),
                "comp_size": pa.array(cs, pa.int64()),
                "comp_deg": pa.array(cd, pa.int64()),
                "total": pa.array(
                    np.full(t.num_rows, total, dtype=np.int64), pa.int64()
                ),
                "score": pa.array(
                    num.astype(np.float64) / den.astype(np.float64),
                    pa.float64(),
                ),
            }
        )

    return labeled.map_batches(score, batch_format="pyarrow")


def salsa_scores(
    edges: rd.Dataset,
    dedup: bool = True,
    num_parts: int | None = None,
    num_partitions: int | None = None,
    num_buckets: int | None = None,
    broadcast_max: int = 50_000_000,
) -> rd.Dataset:
    """SALSA hub + authority scores of a directed (src, dst) graph.

    Output: (side 'auth'|'hub', vid, deg, comp_size, comp_deg, total,
    score) — one row per node with outgoing (hub) / incoming (auth)
    support-graph edges; the exact integer operands ride along so the
    float score is auditable.
    """
    # BSP actor CC (full-vector exchange) — ~6x faster than the Dataset
    # engine's per-round sort shuffles at bench scale; it self-falls-
    # back to the Dataset engine when n exceeds the full-vector bound,
    # and min-label results are engine-invariant.
    from parallel_pagerank_ray.pipelines.components_actors import (
        connected_components_bsp as connected_components,
    )
    from parallel_pagerank_ray.pipelines.graph_build import (
        Graph,
        _default_join_partitions,
    )

    if num_partitions is None:
        num_partitions = _default_join_partitions()

    edges = edges.select_columns(["src", "dst"])
    if dedup:
        edges = distinct(edges, ["src", "dst"], num_buckets=num_buckets)
    edges = edges.materialize()

    def to_bip(t: pa.Table) -> pa.Table:
        src = t.column("src").to_numpy(zero_copy_only=False).astype(np.int64)
        dst = t.column("dst").to_numpy(zero_copy_only=False).astype(np.int64)
        if len(src) and (
            src.max() >= (1 << 52) or dst.max() >= (1 << 52)
        ):  # pragma: no cover - guard
            raise ValueError(
                "salsa_scores: vid >= 2^52 would overflow the bipartite "
                "slot ids / exact float operands"
            )
        return pa.table(
            {
                "src": pa.array(2 * src, pa.int64()),
                "dst": pa.array(2 * dst + 1, pa.int64()),
            }
        )

    bip = edges.map_batches(to_bip, batch_format="pyarrow")
    g = Graph.from_int_edges(bip, dedup=False)
    comps = connected_components(g, num_parts=num_parts).components

    indeg = grouped_agg(
        edges, ["dst"], {"deg": ("dst", "count")}, num_buckets=num_buckets
    ).rename_columns({"dst": "id"})
    outdeg = grouped_agg(
        edges, ["src"], {"deg": ("src", "count")}, num_buckets=num_buckets
    ).rename_columns({"src": "id"})

    if g.n <= broadcast_max:
        # the comp labels are a dense [0, n) int64 vector — one plasma
        # copy per node (8 B/vertex, the kcore/triangles guard bound);
        # both sides then run join-free
        import ray

        comp_vec = np.empty(g.n, dtype=np.int64)
        for blk in ray.get(comps.to_arrow_refs()):
            if blk.num_rows:
                comp_vec[
                    blk.column("vid").to_numpy(zero_copy_only=False)
                ] = blk.column("comp").to_numpy(zero_copy_only=False)
        comp_ref = ray.put(comp_vec)
        auth = _side_scores_bcast(indeg, comp_ref, "auth", 1, num_buckets)
        hub = _side_scores_bcast(outdeg, comp_ref, "hub", 0, num_buckets)
        return auth.union(hub)

    auth = _side_scores(indeg, comps, "auth", 1, num_partitions, num_buckets)
    hub = _side_scores(outdeg, comps, "hub", 0, num_partitions, num_buckets)
    return auth.union(hub)
