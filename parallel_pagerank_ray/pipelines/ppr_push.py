"""Local-push personalized PageRank (Andersen–Chung–Lang, FOCS 2006 —
the PageRank-Nibble seed-set expansion primitive): starting from unit
mass at a seed vertex, repeatedly "push" residual mass — a fraction
alpha sticks at the vertex, the rest spreads to out-neighbors — until
every vertex's residual per unit out-degree falls below eps. Touches
only the seed's neighborhood, never the whole graph: THE local
community / spam-neighborhood primitive at crawl scale.

Exactness design (the repo pattern): all mass is INTEGER (seed starts
with ``scale``), alpha is the rational ``alpha_num/alpha_den``, every
split is a floor division with the dust retained at the pushing
vertex, and rounds are SYNCHRONOUS — every currently-eligible vertex
pushes simultaneously, so the result is independent of partitioning
and vertex order and a DuckDB recursive CTE replays it bit-exactly
(sequential ACL push is order-dependent; the synchronous variant is
not). Per push of residual r:

    gain  = (alpha_num * r) // alpha_den        -> p += gain
    rem   = r - gain
    share = (rem - rem // 2) // deg             -> each out-neighbor
    r_new = rem - share * deg                   (keep + dust stays)

Vertices with deg = 0 (dangling) or r < eps * deg never push.
Eligible residual is >= eps >= alpha_den, so every push moves >= 1
unit into p and total residual strictly decreases: the loop
terminates; ``max_rounds`` is a replayable cap, not a heuristic.

BSP shape (kcore-style shard actors, `stages/csr_store.py`): each
shard holds the CSR slice of its vertex range plus int64 (p, r)
vectors; a round is one simultaneous local push + a ROUTED sparse
exchange — each shard pre-sums its outgoing (dst, amount) pairs per
destination shard, so wire traffic is O(frontier edges), never a
dense vector. The driver sees only per-round active counts.
"""

from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np
import ray
import ray.data as rd

from parallel_pagerank_ray.pipelines.graph_build import Graph
from parallel_pagerank_ray.stages.csr_store import (
    cap_num_parts,
    EdgeShardStore,
    per_actor_cpus,
)


@dataclass
class PushRun:
    scores: rd.Dataset  # (vid, p, r) rows with p > 0 or r > 0
    iterations: int
    history: list[dict] = field(default_factory=list)


_RANK_INF = np.int64(1) << 40  # sentinel rank for vertices outside the sweep


@ray.remote
def _rank_partial(t) -> tuple[int, int]:
    # sort stages emit schema-less zero-row blocks at scale — skip them
    if t.num_rows == 0:
        return 0, 0
    return t.num_rows, int(t.column("deg").to_numpy(zero_copy_only=False).sum())


@ray.remote
def _rank_finalize(t, rank0: int):
    import pyarrow as pa

    return t.append_column(
        "rank",
        pa.array(rank0 + 1 + np.arange(t.num_rows, dtype=np.int64), pa.int64()),
    )


@ray.remote
def _cut_partial(t) -> tuple[int, int, int, int]:
    if t.num_rows == 0:
        return 0, 0, 0, 0
    g = lambda c: int(t.column(c).to_numpy(zero_copy_only=False).sum())
    return t.num_rows, g("deg"), g("ca"), g("cb")


@ray.remote
def _cut_finalize(t, vol0: int, ca0: int, cb0: int, two_m: int):
    import pyarrow as pa

    deg = t.column("deg").to_numpy(zero_copy_only=False)
    ca = t.column("ca").to_numpy(zero_copy_only=False)
    cb = t.column("cb").to_numpy(zero_copy_only=False)
    vol = vol0 + np.cumsum(deg, dtype=np.int64)
    cut = (ca0 + np.cumsum(ca, dtype=np.int64)) - (
        cb0 + np.cumsum(cb, dtype=np.int64)
    )
    den = np.minimum(vol, two_m - vol)
    # single division of exact int64 operands; S = whole graph -> 1.0
    phi = np.where(
        den == 0, 1.0, cut.astype(np.float64) / den.astype(np.float64)
    )
    return pa.table(
        {
            "k": t.column("rank"),
            "vid": t.column("vid"),
            "cut": pa.array(cut, pa.int64()),
            "vol": pa.array(vol, pa.int64()),
            "phi": pa.array(phi, pa.float64()),
        }
    )


def _sweep_cut_broadcast(
    pos: rd.Dataset,
    canon_edges: rd.Dataset,
    m: int,
    key_scale: int,
    num_buckets: int | None,
) -> rd.Dataset:
    """Broadcast fast path for :func:`sweep_cut` — the push support is
    bounded by the ACL contract (|support| <= scale/eps pushes), so the
    (vid -> rank) map ships ONCE via ``ray.put`` and the whole sweep is
    two vectorized passes over the canonical edges (degree histogram,
    then entering/closing rank histograms), each reduced by the
    engine's bucketed combine to <= |support| rows. No joins, no sorts,
    no per-edge shuffle; identical int64 arithmetic to the join path
    (parity-tested by shrinking ``broadcast_max`` to 0)."""
    import pyarrow as pa

    from parallel_pagerank_ray.stages.agg import grouped_agg

    out_schema = pa.schema(
        [
            ("k", pa.int64()),
            ("vid", pa.int64()),
            ("cut", pa.int64()),
            ("vol", pa.int64()),
            ("phi", pa.float64()),
        ]
    )
    parts = [t for t in ray.get(pos.to_arrow_refs()) if t.num_rows]
    if not parts:
        return rd.from_arrow(out_schema.empty_table())
    vids = np.concatenate(
        [t.column("vid").to_numpy(zero_copy_only=False) for t in parts]
    ).astype(np.int64)
    pmass = np.concatenate(
        [t.column("p").to_numpy(zero_copy_only=False) for t in parts]
    ).astype(np.int64)
    order = np.argsort(vids, kind="stable")
    vids, pmass = vids[order], pmass[order]
    n = len(vids)
    sup_ref = ray.put(vids)

    def deg_partial(t: pa.Table) -> pa.Table:
        sup = ray.get(sup_ref)
        both = np.concatenate(
            [
                t.column("src").to_numpy(zero_copy_only=False),
                t.column("dst").to_numpy(zero_copy_only=False),
            ]
        )
        i = np.searchsorted(sup, both)
        ok = (i < len(sup)) & (np.take(sup, i, mode="clip") == both)
        ii, cnt = np.unique(i[ok], return_counts=True)
        return pa.table(
            {
                "i": pa.array(ii.astype(np.int64), pa.int64()),
                "c": pa.array(cnt.astype(np.int64), pa.int64()),
            }
        )

    degt = grouped_agg(
        canon_edges.map_batches(deg_partial, batch_format="pyarrow"),
        ["i"],
        {"deg": ("c", "sum")},
        num_buckets=num_buckets,
    ).to_pandas()
    deg = np.zeros(n, dtype=np.int64)
    if len(degt):
        deg[degt["i"].to_numpy()] = degt["deg"].to_numpy()
    inside = deg > 0  # inner-join semantics: support ∩ edge vertices
    if not inside.any():
        return rd.from_arrow(out_schema.empty_table())
    s_vid, s_deg, s_p = vids[inside], deg[inside], pmass[inside]
    key = (s_p * np.int64(key_scale)) // s_deg
    sweep = np.lexsort((s_vid, -key))  # key desc, vid asc
    n_s = len(s_vid)
    rank_full = np.full(n, _RANK_INF, dtype=np.int64)
    r_sub = np.empty(n_s, dtype=np.int64)
    r_sub[sweep] = 1 + np.arange(n_s, dtype=np.int64)
    rank_full[inside] = r_sub
    rank_ref = ray.put(rank_full)

    def cut_rows(t: pa.Table) -> pa.Table:
        sup = ray.get(sup_ref)
        rk = ray.get(rank_ref)

        def look(col):
            v = t.column(col).to_numpy(zero_copy_only=False)
            i = np.searchsorted(sup, v)
            ok = (i < len(sup)) & (np.take(sup, i, mode="clip") == v)
            r = np.where(ok, np.take(rk, i, mode="clip"), _RANK_INF)
            return r

        ra, rb = look("src"), look("dst")
        enter = np.concatenate([ra[ra < _RANK_INF], rb[rb < _RANK_INF]])
        both = np.maximum(ra, rb)
        both = both[both < _RANK_INF]
        er, ec = np.unique(enter, return_counts=True)
        br, bc = np.unique(both, return_counts=True)
        return pa.table(
            {
                "rank": pa.array(
                    np.concatenate([er, br]).astype(np.int64), pa.int64()
                ),
                "ca": pa.array(
                    np.concatenate(
                        [ec, np.zeros(len(br), dtype=np.int64)]
                    ).astype(np.int64),
                    pa.int64(),
                ),
                "cb": pa.array(
                    np.concatenate([np.zeros(len(er), dtype=np.int64), 2 * bc]).astype(
                        np.int64
                    ),
                    pa.int64(),
                ),
            }
        )

    hist = grouped_agg(
        canon_edges.map_batches(cut_rows, batch_format="pyarrow"),
        ["rank"],
        {"ca": ("ca", "sum"), "cb": ("cb", "sum")},
        num_buckets=num_buckets,
    ).to_pandas()
    ca = np.zeros(n_s, dtype=np.int64)
    cb = np.zeros(n_s, dtype=np.int64)
    if len(hist):
        ri = hist["rank"].to_numpy() - 1
        ca[ri] = hist["ca"].to_numpy()
        cb[ri] = hist["cb"].to_numpy()
    vol = np.cumsum(s_deg[sweep], dtype=np.int64)
    cut = np.cumsum(ca, dtype=np.int64) - np.cumsum(cb, dtype=np.int64)
    den = np.minimum(vol, 2 * m - vol)
    phi = np.where(den == 0, 1.0, cut.astype(np.float64) / den.astype(np.float64))
    return rd.from_arrow(
        pa.table(
            {
                "k": pa.array(1 + np.arange(n_s, dtype=np.int64), pa.int64()),
                "vid": pa.array(s_vid[sweep], pa.int64()),
                "cut": pa.array(cut, pa.int64()),
                "vol": pa.array(vol, pa.int64()),
                "phi": pa.array(phi, pa.float64()),
            }
        )
    )


def sweep_cut(
    scores: rd.Dataset,
    canon_edges: rd.Dataset,
    key_scale: int = 1 << 20,
    num_buckets: int | None = None,
    num_partitions: int | None = None,
    broadcast_max: int = 2_000_000,
) -> rd.Dataset:
    """PageRank-Nibble's second half: order the push support (p > 0)
    by degree-normalized score and report every prefix's conductance.

    ``canon_edges`` is the CANONICAL simple undirected edge set
    (src < dst, distinct); degrees/volumes are over its symmetric
    closure. Output one row per support vertex:
    (k, vid, cut, vol, phi) where S_k = the top-k prefix, cut = edges
    leaving S_k, vol = sum of degrees inside, phi = cut / min(vol,
    2m - vol) — the argmin row is the ACL local community.

    Exactness: the sweep order is the integer key (p * key_scale) //
    deg descending (vid ascending tie-break) — p <= scale, so the
    product is bounded — and every cut/vol is an int64 prefix sum:
    cut(k) = #edges whose min endpoint rank <= k minus #edges whose
    max endpoint rank <= k (an edge is cut exactly while one endpoint
    is inside). phi is one float64 division. DuckDB replays all of it
    with window functions.

    Scale shape: the sweep table is the push SUPPORT, frontier-local
    by ACL's guarantee (|support| <= scale / eps pushes) — never the
    whole graph. Two range-sorts of that table; prefix sums are
    per-sorted-block cumsums plus a driver fold of #blocks scalar
    offsets (the only driver pulls).
    """
    from parallel_pagerank_ray.pipelines.graph_build import (
        _default_join_partitions,
        undirected_edges,
    )
    from parallel_pagerank_ray.stages.agg import grouped_agg
    from parallel_pagerank_ray.util import (
        count_rows_once,
        drop_empty_blocks,
        safe_join,
    )

    if num_partitions is None:
        num_partitions = _default_join_partitions()
    canon_edges = canon_edges.select_columns(["src", "dst"]).materialize()
    m = canon_edges.count()
    pos = scores.filter(expr="p > 0").select_columns(["vid", "p"])
    n_pos, pos = count_rows_once(pos)
    if n_pos <= broadcast_max:
        return _sweep_cut_broadcast(pos, canon_edges, m, key_scale, num_buckets)
    deg = grouped_agg(
        undirected_edges(canon_edges, dedup=False),
        ["src"],
        {"deg": ("src", "count")},
        num_buckets=num_buckets,
    ).rename_columns({"src": "vid"})

    def keyed(t):
        import pyarrow as pa

        p = t.column("p").to_numpy(zero_copy_only=False)
        d = t.column("deg").to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "vid": t.column("vid"),
                "deg": t.column("deg"),
                "key": pa.array((p * np.int64(key_scale)) // d, pa.int64()),
            }
        )

    support = (
        safe_join(
            pos,
            deg,
            join_type="inner",
            num_partitions=num_partitions,
            on=("vid",),
        )
        .map_batches(keyed, batch_format="pyarrow")
        .sort(["key", "vid"], descending=[True, False])
        .materialize()
    )
    refs = support.to_arrow_refs()
    partials = ray.get([_rank_partial.remote(r) for r in refs])
    fin, acc = [], 0
    for r, (n_rows, _dsum) in zip(refs, partials):
        if n_rows:
            fin.append(_rank_finalize.remote(r, acc))
            acc += n_rows
    ranked = rd.from_arrow_refs(fin).materialize()

    # cut(k) by inclusion-exclusion (inner joins only — no outer join
    # for edges with one endpoint outside the support):
    #   cut(k) = #[ra<=k] + #[rb<=k] - 2 * #[both<=k]
    # where ra/rb are the endpoint ranks of edges whose src/dst is in
    # the support and "both" counts edges with BOTH endpoints ranked
    # (at max(ra, rb) the edge stops being cut).
    rk = ranked.select_columns(["vid", "rank"])
    e1 = safe_join(
        canon_edges,
        rk.rename_columns({"vid": "__v1", "rank": "ra"}),
        join_type="inner",
        num_partitions=num_partitions,
        on=("src",),
        right_on=("__v1",),
    ).materialize()
    e2 = safe_join(
        e1.select_columns(["dst", "ra"]),
        rk.rename_columns({"vid": "__v2", "rank": "rb"}),
        join_type="inner",
        num_partitions=num_partitions,
        on=("dst",),
        right_on=("__v2",),
    )
    eb = safe_join(
        canon_edges,
        rk.rename_columns({"vid": "__v3", "rank": "rb"}),
        join_type="inner",
        num_partitions=num_partitions,
        on=("dst",),
        right_on=("__v3",),
    )

    def enter_rows(col):
        def fn(t):
            import pyarrow as pa

            z = pa.array(np.zeros(t.num_rows, dtype=np.int64), pa.int64())
            neg = pa.array(np.full(t.num_rows, -1, dtype=np.int64), pa.int64())
            one = pa.array(np.ones(t.num_rows, dtype=np.int64), pa.int64())
            return pa.table(
                {"rank": t.column(col), "vid": neg, "deg": z, "ca": one, "cb": z}
            )

        return fn

    def both_rows(t):
        import pyarrow as pa

        ra = t.column("ra").to_numpy(zero_copy_only=False)
        rb = t.column("rb").to_numpy(zero_copy_only=False)
        z = pa.array(np.zeros(t.num_rows, dtype=np.int64), pa.int64())
        neg = pa.array(np.full(t.num_rows, -1, dtype=np.int64), pa.int64())
        return pa.table(
            {
                "rank": pa.array(np.maximum(ra, rb), pa.int64()),
                "vid": neg,
                "deg": z,
                "ca": z,
                "cb": pa.array(np.full(t.num_rows, 2, dtype=np.int64)),
            }
        )

    def base_rows(t):
        import pyarrow as pa

        z = pa.array(np.zeros(t.num_rows, dtype=np.int64), pa.int64())
        return pa.table(
            {
                "rank": t.column("rank"),
                "vid": t.column("vid"),
                "deg": t.column("deg"),
                "ca": z,
                "cb": z,
            }
        )

    wide = grouped_agg(
        ranked.map_batches(base_rows, batch_format="pyarrow")
        .union(e1.map_batches(enter_rows("ra"), batch_format="pyarrow"))
        .union(eb.map_batches(enter_rows("rb"), batch_format="pyarrow"))
        .union(e2.map_batches(both_rows, batch_format="pyarrow")),
        ["rank"],
        {
            "vid": ("vid", "max"),
            "deg": ("deg", "max"),
            "ca": ("ca", "sum"),
            "cb": ("cb", "sum"),
        },
        num_buckets=num_buckets,
    )
    wide = drop_empty_blocks(wide).sort("rank").materialize()
    refs = wide.to_arrow_refs()
    partials = ray.get([_cut_partial.remote(r) for r in refs])
    out_refs = []
    vol0 = ca0 = cb0 = 0
    for r, (n_rows, dsum, casum, cbsum) in zip(refs, partials):
        if n_rows:
            out_refs.append(_cut_finalize.remote(r, vol0, ca0, cb0, 2 * m))
            vol0 += dsum
            ca0 += casum
            cb0 += cbsum
    return rd.from_arrow_refs(out_refs)



@ray.remote
class _PushShard:
    def __init__(
        self,
        part: int,
        part_refs: list,
        n: int,
        part_size: int,
        num_parts: int,
        alpha_num: int,
        alpha_den: int,
        eps: int,
        seed: int,
        scale: int,
    ) -> None:
        self.an, self.ad, self.eps = alpha_num, alpha_den, eps
        self.part_size, self.num_parts = part_size, num_parts
        self.base = part * part_size
        self.size = max(0, min(part_size, n - self.base))
        if part_refs:
            chunks = ray.get(part_refs)
            src = np.concatenate([c[0] for c in chunks]) - self.base
            dst = np.concatenate([c[1] for c in chunks])
        else:
            src = np.array([], dtype=np.int64)
            dst = np.array([], dtype=np.int64)
        if src.size and not bool(np.all(src[1:] >= src[:-1])):
            order = np.argsort(src, kind="stable")  # pragma: no cover
            src, dst = src[order], dst[order]
        self.dst = dst
        counts = np.bincount(src, minlength=self.size).astype(np.int64)
        self.deg = counts
        self.indptr = np.concatenate(([0], np.cumsum(counts)))
        self.p = np.zeros(self.size, dtype=np.int64)
        self.r = np.zeros(self.size, dtype=np.int64)
        if self.base <= seed < self.base + self.size:
            self.r[seed - self.base] = scale

    def step(self):
        """One synchronous push over this shard's eligible vertices.
        Returns (n_active, [(dst_ids, amounts) per destination part])
        with per-part partial sums already combined shard-side."""
        active = np.nonzero((self.deg > 0) & (self.r >= self.eps * self.deg))[0]
        out: list = [None] * self.num_parts
        if len(active) == 0:
            return 0, out
        rv = self.r[active]
        gain = (self.an * rv) // self.ad
        self.p[active] += gain
        rem = rv - gain
        degs = self.deg[active]
        share = (rem - rem // 2) // degs
        self.r[active] = rem - share * degs
        lo = self.indptr[active]
        pos = (
            np.arange(int(degs.sum()))
            - np.repeat(np.concatenate(([0], np.cumsum(degs)[:-1])), degs)
            + np.repeat(lo, degs)
        )
        dsts = self.dst[pos]
        amounts = np.repeat(share, degs)
        target = dsts // self.part_size
        order = np.argsort(target, kind="stable")
        dsts, amounts, target = dsts[order], amounts[order], target[order]
        bounds = np.searchsorted(target, np.arange(self.num_parts + 1))
        for q in range(self.num_parts):
            sl = slice(bounds[q], bounds[q + 1])
            if sl.start == sl.stop:
                continue
            u, inv = np.unique(dsts[sl], return_inverse=True)
            acc = np.zeros(len(u), dtype=np.int64)
            np.add.at(acc, inv, amounts[sl])
            out[q] = (u, acc)
        return int(len(active)), out

    def apply(self, chunks: list) -> None:
        """Add routed incoming (dst, amount) pairs to local residuals."""
        for ids, amounts in chunks:
            np.add.at(self.r, ids - self.base, amounts)

    def slice_table(self):
        import pyarrow as pa

        keep = np.nonzero((self.p > 0) | (self.r > 0))[0]
        return pa.table(
            {
                "vid": pa.array(self.base + keep, pa.int64()),
                "p": pa.array(self.p[keep], pa.int64()),
                "r": pa.array(self.r[keep], pa.int64()),
            }
        )


def ppr_push(
    graph: Graph,
    seed: int,
    alpha_num: int = 3,
    alpha_den: int = 20,
    eps: int = 1_000_000,
    scale: int = 10**12,
    max_rounds: int = 50,
    num_parts: int | None = None,
) -> PushRun:
    """Synchronous integer ACL push from ``seed`` over ``graph.edges``
    (directed as given; pass a symmetric closure for undirected
    semantics). Requires eps >= alpha_den (every push then strictly
    drains residual — termination) and scale * alpha_num < 2^62.
    """
    if not (0 <= seed < graph.n):
        raise ValueError(f"ppr_push: seed {seed} outside [0, {graph.n})")
    if eps < alpha_den:
        raise ValueError("ppr_push: eps < alpha_den breaks the drain bound")
    if not (0 < alpha_num < alpha_den):
        raise ValueError("ppr_push: need 0 < alpha_num < alpha_den")
    n = graph.n
    if num_parts is None:
        cpus = int(ray.cluster_resources().get("CPU", 8))
        num_parts = cap_num_parts(min(256, max(4, cpus)), n)
    store = EdgeShardStore.build(graph.edges, n=n, num_parts=num_parts)
    P = max(1, -(-n // store.part_size))
    per_actor = per_actor_cpus(P)
    actors = [
        _PushShard.options(num_cpus=per_actor).remote(
            p,
            store.part_refs.get(p, []),
            n,
            store.part_size,
            P,
            alpha_num,
            alpha_den,
            eps,
            seed,
            scale,
        )
        for p in range(P)
    ]
    it = 0
    history: list[dict] = []
    while it < max_rounds:
        results = ray.get([a.step.remote() for a in actors])
        n_active = sum(r[0] for r in results)
        history.append({"iter": it, "active": int(n_active)})
        if n_active == 0:
            break
        it += 1
        applies = []
        for q, a in enumerate(actors):
            chunks = [r[1][q] for r in results if r[1][q] is not None]
            if chunks:
                applies.append(a.apply.remote(chunks))
        if applies:
            ray.wait(applies, num_returns=len(applies))
    tables = [a.slice_table.remote() for a in actors]
    ray.wait(tables, num_returns=len(tables))
    for a in actors:
        ray.kill(a)
    return PushRun(
        scores=rd.from_arrow_refs(tables), iterations=it, history=history
    )
