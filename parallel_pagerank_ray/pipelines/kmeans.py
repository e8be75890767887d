"""Distributed Lloyd's k-means over an embedding column — the
semantic-clustering stage of a training-data pipeline (data mixing,
cluster-balanced sampling, SemDeDup-style semantic dedup all start
from exactly this assignment).

Beyond-reference capability (the reference has no vector operators).
Scale shape per iteration: the k x dim centroid matrix broadcasts via
``ray.put``; ONE map_batches pass computes assignments and per-batch
partial sums (k*dim long-format rows per batch, never raw vectors);
one tiny grouped_agg combines them; the driver folds k*dim rows into
the next centroid matrix. No all-to-all shuffle of the input ever —
at 10^12 rows the only wide traffic is the k*dim partials.

Bit-reproducible by construction (the driver-gate float policy):
vectors quantize once via floor(x * scale) -> int64 (floor, not
round: no tie rule), distances accumulate in a FIXED dim order
(strict left fold, identical to DuckDB list_reduce), per-cluster sums
are exact int64 at any parallelism, and each centroid coordinate is
ONE IEEE division of exact operands — so assignments match the
chained-CTE SQL oracle exactly, at any shard count. Ties (equal
distance) pick the lowest cluster id on both sides.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray
import ray.data as rd

from parallel_pagerank_ray.pipelines.similarity import (
    _rows_to_matrix,
    _to_matrix,
)


def _scaled(t: pa.Table, scale: float) -> np.ndarray:
    return np.floor(_to_matrix(t.column("embedding")) * scale)


def _distances(x: np.ndarray, cent: np.ndarray) -> np.ndarray:
    """(n, k) squared distances, accumulated dim-by-dim — the strict
    left fold the SQL oracle's list_reduce performs."""
    d = np.zeros((x.shape[0], cent.shape[0]), dtype=np.float64)
    for j in range(x.shape[1]):
        t = x[:, j][:, None] - cent[None, :, j]
        d += t * t
    return d


def kmeans_assign(
    embeddings: rd.Dataset,
    k: int = 10,
    iters: int = 3,
    scale: float = 1_000_000.0,
    num_buckets: int | None = None,
    include_vecs: bool = False,
) -> rd.Dataset:
    """(vec_id, cluster) after ``iters`` Lloyd iterations seeded with
    the k smallest vec_ids' vectors (cluster j = j-th smallest).
    ``include_vecs=True`` carries the embedding column through the
    final assignment map (for downstream per-cluster kernels, e.g.
    semantic dedup) without a join back to the input."""
    from parallel_pagerank_ray.stages.agg import grouped_agg

    if iters < 1:
        raise ValueError("kmeans_assign: iters must be >= 1")
    emb = embeddings.select_columns(["vec_id", "embedding"]).materialize()
    seed = emb.sort("vec_id").limit(k).to_arrow_refs()
    seed_t = pa.concat_tables(
        [t for t in ray.get(seed) if t.num_rows]
    ).sort_by("vec_id")
    cent = _scaled(seed_t, scale)  # float64 ints; cluster j = row j
    k = cent.shape[0]
    dim = cent.shape[1]

    for it in range(iters - 1):
        ref = ray.put(cent)

        def partials(t: pa.Table, ref=ref) -> pd.DataFrame:
            c = ray.get(ref)
            x = _scaled(t, scale)
            cl = np.argmin(_distances(x, c), axis=1)
            s = np.zeros((c.shape[0], x.shape[1]), dtype=np.int64)
            np.add.at(s, cl, x.astype(np.int64))
            cnt = np.bincount(cl, minlength=c.shape[0]).astype(np.int64)
            nz = np.nonzero(cnt)[0]
            # long format: one (cluster, dim, s, n) row per coordinate
            return pd.DataFrame(
                {
                    "cluster": np.repeat(nz, x.shape[1]),
                    "dim": np.tile(
                        np.arange(x.shape[1], dtype=np.int64), len(nz)
                    ),
                    "s": s[nz].ravel(),
                    "n": np.repeat(cnt[nz], x.shape[1]),
                }
            )

        sums = grouped_agg(
            emb.map_batches(partials, batch_format="pyarrow"),
            ["cluster", "dim"],
            {"s": ("s", "sum"), "n": ("n", "sum")},
            num_buckets=num_buckets,
        ).to_pandas()
        nxt = cent.copy()  # empty clusters keep their previous centroid
        if len(sums):
            ci = sums["cluster"].to_numpy(dtype=np.int64)
            di = sums["dim"].to_numpy(dtype=np.int64)
            nxt[ci, di] = sums["s"].to_numpy(dtype=np.int64).astype(
                np.float64
            ) / sums["n"].to_numpy(dtype=np.int64).astype(np.float64)
        cent = nxt

    ref = ray.put(cent)

    def assign(t: pa.Table, ref=ref) -> pa.Table:
        c = ray.get(ref)
        x = _scaled(t, scale)
        cl = np.argmin(_distances(x, c), axis=1)
        cols = {
            "vec_id": pa.array(
                t.column("vec_id").to_numpy(zero_copy_only=False),
                pa.int64(),
            ),
            "cluster": pa.array(cl.astype(np.int64), pa.int64()),
        }
        if include_vecs:
            cols["embedding"] = t.column("embedding")
        return pa.table(cols)

    return emb.map_batches(assign, batch_format="pyarrow")


def semantic_dedup(
    embeddings: rd.Dataset,
    k: int = 10,
    iters: int = 3,
    threshold: float = 0.3,
    scale: float = 1_000_000.0,
) -> rd.Dataset:
    """SemDeDup-style semantic deduplication (Abbas et al. 2023,
    arXiv:2303.09540): cluster the embedding space with k-means, then
    inside each cluster drop every vector that has a cosine-similar
    (>= threshold) neighbor with a SMALLER vec_id — the deterministic
    keep-min-id rule, so the flag is a pure function of the input.

    Output: (vec_id, cluster, keep). Pairwise work is blocked by the
    kmeans cluster (never global): at 10^9 vectors pick k ~ n/1000 so
    each cluster's all-pairs matmul is ~10^6 ops; the cluster ids ride
    along from the assignment map (``include_vecs=True``), so the only
    wide step beyond kmeans itself is the one groupby(cluster).
    Cosine is float64 (matching DuckDB list_cosine_similarity);
    thresholds follow the driver-gate float policy (data is generated
    so no similarity sits at the threshold boundary).
    """

    def flags(group: pd.DataFrame) -> pd.DataFrame:
        g = group.sort_values("vec_id")
        ids = g["vec_id"].to_numpy(dtype=np.int64)
        cl = g["cluster"].to_numpy(dtype=np.int64)
        if len(ids) < 2:
            return pd.DataFrame(
                {"vec_id": ids, "cluster": cl, "keep": np.ones(len(ids), bool)}
            )
        mat = _rows_to_matrix(g["embedding"])
        norms = np.linalg.norm(mat, axis=1, keepdims=True)
        norms[norms == 0] = 1.0
        unit = mat / norms
        sims = unit @ unit.T
        # keep[i] = no j < i (smaller vec_id) with sims[j, i] >= tau
        hit = np.triu(sims >= threshold, k=1)
        keep = ~hit.any(axis=0)
        return pd.DataFrame({"vec_id": ids, "cluster": cl, "keep": keep})

    assigned = kmeans_assign(
        embeddings, k=k, iters=iters, scale=scale, include_vecs=True
    )
    from parallel_pagerank_ray.util import drop_empty_blocks

    return drop_empty_blocks(
        assigned.groupby("cluster").map_groups(flags, batch_format="pandas")
    )
