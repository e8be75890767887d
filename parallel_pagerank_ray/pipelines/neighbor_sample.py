"""Deterministic multi-hop neighbor sampling (GraphSAGE-style
minibatch preparation; Hamilton et al. 2017).

Beyond-reference capability: GNN training pipelines sample a bounded
neighborhood per seed vertex instead of materializing full k-hop
balls. Sampling here is a pure function of (salt, src, dst) — each
vertex keeps the ``fanout`` out-edges with the SMALLEST hash under a
salted mod-2^31-1 mixing chain — so the sample is identical across
runs, partitionings, and the DuckDB oracle (rank by the same integer
expression + QUALIFY), making a normally-random operator
value-checkable.

Per hop: the current frontier ships as ONE broadcast sorted id array
(ray.put, zero-copy membership test per batch), the edge scan keeps
only frontier sources, and the per-source top-fanout runs on the
bucketed grouped_topk shuffle (moves only the frontier's out-edges).
Frontier size is bounded by seeds x prod(fanouts). At web scale the
per-hop edge scan would ride the src-partitioned edge layout instead
of a full scan — the membership filter is pushed into the read in
either case.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa
import ray
import ray.data as rd

from parallel_pagerank_ray.functions import hashing as H
from parallel_pagerank_ray.pipelines.graph_build import Graph


_MIX_A = np.uint64(1_000_151)
_MIX_B = np.uint64(1_000_121)


def _edge_hash(salt: str, src: np.ndarray, dst: np.ndarray) -> np.ndarray:
    """Vectorized mod-2^31-1 edge-ranking hash (every product < 2^62,
    so DuckDB BIGINT reproduces it exactly — see the gate oracle). One
    md5 digests the SALT (once per call, not per edge); the per-edge
    mixing is an affine chain plus a squaring round, which is ample for
    sampling determinism — a per-edge md5 loop here was the only
    Python-per-row hot path in the engine."""
    p = H.P31
    s64 = np.uint64(
        int.from_bytes(hashlib.md5(salt.encode("utf-8")).digest()[:8], "big")
        % int(p)
    )
    # reduce mod p before every multiply: operands < 2^31, multipliers
    # < 2^20 -> every intermediate < 2^62 (BIGINT- and uint64-safe)
    h = (src.astype(np.uint64) % p) * _MIX_A % p
    h = (h + dst.astype(np.uint64) % p) % p
    h = h * _MIX_B % p
    h = (h + s64) % p
    h = (h * h + h) % p  # non-affine scramble
    return h.view(np.int64)


def neighbor_sample(
    graph: Graph,
    seeds: list[int],
    fanouts: list[int] = (5, 3),
    salt: str = "ns",
    num_buckets: int | None = None,
) -> rd.Dataset:
    """Sampled edge set per hop: (hop, src, dst, h) rows, hop = 1..len
    (fanouts). Hop k keeps, for every vertex in hop k-1's frontier,
    its ``fanouts[k-1]`` out-edges with the smallest hash (ties by
    dst — a total order, so the boundary is deterministic)."""
    from parallel_pagerank_ray.stages.agg import grouped_topk
    from parallel_pagerank_ray.util import drop_empty_blocks

    frontier = np.unique(np.asarray(list(seeds), dtype=np.int64))
    hops: list[rd.Dataset] = []
    for hop, fanout in enumerate(fanouts, start=1):
        if len(frontier) == 0:
            break
        ref = ray.put(frontier)  # sorted

        def pick(t: pa.Table, _hop=hop) -> pa.Table:
            f = ray.get(ref)
            src = t.column("src").to_numpy()
            dst = t.column("dst").to_numpy()
            pos = np.searchsorted(f, src)
            valid = pos < len(f)
            m = np.zeros(len(src), dtype=bool)
            m[valid] = f[pos[valid]] == src[valid]
            src, dst = src[m], dst[m]
            return pa.table(
                {
                    "hop": pa.array(np.full(len(src), _hop, dtype=np.int64)),
                    "src": pa.array(src),
                    "dst": pa.array(dst),
                    "h": pa.array(_edge_hash(salt, src, dst)),
                }
            )

        cand = drop_empty_blocks(
            graph.edges.map_batches(pick, batch_format="pyarrow")
        )
        sampled = grouped_topk(
            cand,
            ["src"],
            ["h", "dst"],
            [True, True],
            k=fanout,
            num_buckets=num_buckets,
        ).materialize()
        hops.append(sampled)
        nxt = np.unique(
            np.concatenate(
                [
                    blk.column("dst").to_numpy()
                    for blk in ray.get(sampled.to_arrow_refs())
                    if blk.num_rows
                ]
                or [np.array([], dtype=np.int64)]
            )
        )
        frontier = nxt
    if not hops:
        return rd.from_arrow(
            pa.table(
                {
                    "hop": pa.array([], pa.int64()),
                    "src": pa.array([], pa.int64()),
                    "dst": pa.array([], pa.int64()),
                    "h": pa.array([], pa.int64()),
                }
            )
        )
    out = hops[0]
    for d in hops[1:]:
        out = out.union(d)
    return out
