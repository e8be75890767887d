"""Approximate/exact nearest-neighbor search over an embedding column.

Two paths over an ``embeddings``-shaped table
(``vec_id:int64, embedding:list<float>, ...``):

- ``knn_brute``: exact top-k cosine. The (small) query matrix is placed
  in the object store ONCE (``ray.put``) and read zero-copy inside every
  map task — broadcast join, not a shuffle. Each batch does one float64
  matmul and emits only its local top-k rows per query; a final
  per-query reduce (groupby + map_groups) merges partials. Traffic is
  O(num_queries * k * num_blocks), never O(n).
- ``knn_lsh``: scale path 1 — random-hyperplane LSH: the corpus is
  shuffled once by code bucket and only buckets within ``probe_hamming``
  of a query's code are ever scored. Recall < 1 by design; tested
  against ``knn_brute`` in pytest.
- ``knn_ivf``: scale path 2 — IVF with a k-means coarse quantizer
  trained driver-side on a bounded sample; each query probes its
  ``nprobe`` nearest cells. Scanned fraction ~= nprobe / n_cells.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray
import ray.data as rd

from parallel_pagerank_ray.util import drop_empty_blocks


def _to_matrix(col: pa.ChunkedArray | pa.Array) -> np.ndarray:
    """list<float> column -> (n, dim) float64 matrix, zero-copy values."""
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    flat = col.flatten().to_numpy(zero_copy_only=False)
    n = len(col)
    return flat.reshape(n, -1).astype(np.float64, copy=False)


def _rows_to_matrix(col) -> np.ndarray:
    """pandas Series of fixed-length vectors -> (n, dim) float64 matrix.

    One C-level concatenate over the row arrays (Ray's pandas block
    layout stores a list<float> column as ndarray rows) — no per-row
    Python in the bucket-kernel hot path; falls back to a per-row
    build only for ragged/odd inputs."""
    vals = col.to_numpy()
    try:
        return np.concatenate(vals).astype(np.float64, copy=False).reshape(
            len(vals), -1
        )
    except ValueError:
        return np.asarray([np.asarray(v, dtype=np.float64) for v in vals])


def _normalize(mat: np.ndarray) -> np.ndarray:
    norms = np.linalg.norm(mat, axis=1, keepdims=True)
    norms[norms == 0] = 1.0
    return mat / norms


class _BruteScore:
    """Stateless scoring task: batch x broadcast-queries matmul -> local
    top-k rows (query_id, neighbor_id, sim). The query matrix ref is
    resolved via ray.get per task — plasma keeps one copy per node."""

    def __init__(self, queries_ref, k: int, id_col: str, vec_col: str) -> None:
        self.queries_ref = queries_ref
        self.k = k
        self.id_col = id_col
        self.vec_col = vec_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        q_ids, q_mat = ray.get(self.queries_ref)
        ids = batch.column(self.id_col).to_numpy()
        mat = _normalize(_to_matrix(batch.column(self.vec_col)))
        sims = q_mat @ mat.T  # (Q, B)
        # mask self-matches
        self_m = q_ids[:, None] == ids[None, :]
        sims[self_m] = -np.inf
        k = min(self.k, sims.shape[1])
        # partial top-k per query within this batch, assembled with the
        # same repeat/ravel/finite-mask pattern as score_bucket — no
        # per-row Python in this per-corpus-batch hot path
        part = np.argpartition(-sims, kth=k - 1, axis=1)[:, :k]
        top = sims[np.arange(len(q_ids))[:, None], part].ravel()
        keep = np.isfinite(top)
        return pa.table(
            {
                "query_id": pa.array(
                    np.repeat(q_ids.astype(np.int64), k)[keep]
                ),
                "neighbor_id": pa.array(
                    ids[part.ravel()[keep]].astype(np.int64)
                ),
                "sim": pa.array(top[keep], type=pa.float64()),
            }
        )


def knn_brute(
    embs: rd.Dataset,
    queries: rd.Dataset | tuple[np.ndarray, np.ndarray],
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    include_sim: bool = False,
) -> rd.Dataset:
    """Exact cosine top-k of every query against the full embedding table.

    ``queries``: small Dataset (same schema) or a prefetched
    (ids, matrix) pair; it is broadcast once via ``ray.put``.
    Deterministic tie-break: (sim desc, neighbor_id asc).
    """
    if isinstance(queries, rd.Dataset):
        # small query set by contract — fetch driver-side and broadcast
        qt = pa.Table.from_pylist(queries.select_columns([id_col, vec_col]).take_all())
        q_ids = qt.column(id_col).to_numpy()
        q_mat = _to_matrix(qt.column(vec_col))
        order = np.argsort(q_ids)
        queries = (q_ids[order], q_mat[order])
    q_ids, q_mat = queries
    q_mat = _normalize(np.asarray(q_mat, dtype=np.float64))
    q_ids = np.asarray(q_ids, dtype=np.int64)
    queries_ref = ray.put((q_ids, q_mat))

    partials = embs.select_columns([id_col, vec_col]).map_batches(
        _BruteScore(queries_ref, k, id_col, vec_col), batch_format="pyarrow"
    )

    def final_topk(group: pd.DataFrame) -> pd.DataFrame:
        g = group.sort_values(["sim", "neighbor_id"], ascending=[False, True]).head(k)
        out = g[["query_id", "neighbor_id"]].reset_index(drop=True)
        if include_sim:
            out["sim"] = g["sim"].to_numpy()
        return out

    out = partials.groupby("query_id").map_groups(final_topk, batch_format="pandas")
    return drop_empty_blocks(out)


def load_queries(
    embs_path: str, where_ids: set[int], id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> tuple[np.ndarray, np.ndarray]:
    """Driver-side fetch of a small query set (filter pushed to the read)."""
    import pyarrow.parquet as pq

    t = pq.read_table(embs_path, columns=[id_col, vec_col])
    ids = t.column(id_col).to_numpy()
    mask = np.isin(ids, list(where_ids))
    idx = np.nonzero(mask)[0]
    mat = _to_matrix(t.column(vec_col))[idx]
    order = np.argsort(ids[idx])
    return ids[idx][order], mat[order]


class _LSHCode:
    """Stateful stage: sign-random-projection bucket code per vector.

    The (dim x bits) Gaussian projection is built once per actor from a
    fixed seed — identical codes on every worker.
    """

    def __init__(self, dim: int, bits: int, seed: int, id_col: str, vec_col: str):
        rng = np.random.default_rng(seed)
        self.planes = rng.standard_normal((dim, bits))
        self.id_col = id_col
        self.vec_col = vec_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        mat = _to_matrix(batch.column(self.vec_col))
        bits = (mat @ self.planes) > 0
        codes = (bits * (1 << np.arange(bits.shape[1], dtype=np.int64))).sum(axis=1)
        return pa.table(
            {
                "vec_id": batch.column(self.id_col),
                "code": pa.array(codes, type=pa.int64()),
            }
        )


def lsh_codes(
    embs: rd.Dataset,
    dim: int,
    bits: int = 12,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    concurrency: int = 4,
) -> rd.Dataset:
    """(vec_id, code) — the bucket assignment for LSH-blocked ANN."""
    return embs.select_columns([id_col, vec_col]).map_batches(
        _LSHCode,
        fn_constructor_kwargs={
            "dim": dim,
            "bits": bits,
            "seed": seed,
            "id_col": id_col,
            "vec_col": vec_col,
        },
        batch_format="pyarrow",
        concurrency=concurrency,
    )


def _append_code(batch: pa.Table, planes_ref, vec_col: str) -> pa.Table:
    """Append the sign-random-projection code to each row. The (dim x
    bits) projection travels via one ray.put (zero-copy per node); plain
    tasks — an actor pool here could deadlock the downstream shuffle on
    small CPU counts by reserving every core."""
    planes = ray.get(planes_ref)
    mat = _to_matrix(batch.column(vec_col))
    bits = (mat @ planes) > 0
    codes = (bits * (1 << np.arange(bits.shape[1], dtype=np.int64))).sum(axis=1)
    return batch.append_column("code", pa.array(codes, type=pa.int64()))


def knn_lsh(
    embs: rd.Dataset,
    queries: tuple[np.ndarray, np.ndarray],
    dim: int,
    k: int = 5,
    bits: int = 10,
    probe_hamming: int = 2,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    log_scan_stats: bool = False,
) -> rd.Dataset:
    """ANN with a PRUNED scan: the corpus is shuffled ONCE by its LSH
    code (<= 2^bits buckets), and each bucket is scored only against the
    queries probing it (Hamming(query code, bucket code) <=
    ``probe_hamming``). Buckets no query probes are never matmul'd —
    the scanned fraction is sum_{i<=probe} C(bits, i) / 2^bits in
    expectation (~17% at bits=10, probe=3) and is logged per run.
    Results are identical to the score-and-mask formulation (the
    candidate set is the same); recall < 1 vs knn_brute by design.

    Same output schema as ``knn_brute``: (query_id, neighbor_id), ties
    broken by (sim desc, neighbor_id asc).
    """
    import logging

    q_ids, q_mat = queries
    q_mat64 = _normalize(np.asarray(q_mat, dtype=np.float64))
    rng = np.random.default_rng(seed)
    planes = rng.standard_normal((dim, bits))
    q_codes = (
        ((np.asarray(q_mat, dtype=np.float64) @ planes) > 0)
        * (1 << np.arange(bits, dtype=np.int64))
    ).sum(axis=1)
    queries_ref = ray.put((np.asarray(q_ids, dtype=np.int64), q_mat64, q_codes))

    import functools

    planes_ref = ray.put(planes)
    with_code = embs.select_columns([id_col, vec_col]).map_batches(
        functools.partial(_append_code, planes_ref=planes_ref, vec_col=vec_col),
        batch_format="pyarrow",
    )

    def score_bucket(g: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame(
            {
                "query_id": np.array([], dtype=np.int64),
                "neighbor_id": np.array([], dtype=np.int64),
                "sim": np.array([], dtype=np.float64),
            }
        )
        qi, qm, qc = ray.get(queries_ref)
        code = np.int64(g["code"].iloc[0])
        ham = np.zeros(len(qc), dtype=np.int64)
        xor = qc ^ code
        for b in range(bits):
            ham += (xor >> b) & 1
        probe = ham <= probe_hamming
        if not probe.any():
            return empty  # bucket pruned: no matmul, no scan
        ids = g[id_col].to_numpy()
        mat = _normalize(_rows_to_matrix(g[vec_col]))
        sims = qm[probe] @ mat.T
        sims[qi[probe][:, None] == ids[None, :]] = -np.inf
        kk = min(k, sims.shape[1])
        part = np.argpartition(-sims, kth=kk - 1, axis=1)[:, :kk]
        # vectorized result assembly: rows = queries repeated k-wide,
        # columns = the argpartition picks, -inf self-matches masked
        qsel = qi[probe]
        flat = part.ravel()
        svals = sims[np.repeat(np.arange(len(qsel)), kk), flat]
        keep = np.isfinite(svals)
        return pd.DataFrame(
            {
                "query_id": np.repeat(qsel, kk)[keep],
                "neighbor_id": ids[flat][keep].astype(np.int64),
                "sim": svals[keep],
            }
        )

    partials = with_code.groupby("code").map_groups(
        score_bucket, batch_format="pandas"
    )

    def final_topk(group: pd.DataFrame) -> pd.DataFrame:
        g = group.sort_values(["sim", "neighbor_id"], ascending=[False, True]).head(k)
        return g[["query_id", "neighbor_id"]].reset_index(drop=True)

    out = drop_empty_blocks(partials).groupby("query_id").map_groups(
        final_topk, batch_format="pandas"
    )
    # scanned-fraction telemetry: expected fraction is free; the
    # MEASURED fraction (which occupied buckets any query actually
    # probes) costs one tiny aggregate over (code, count) rows — opt-in
    import math

    frac = sum(math.comb(bits, i) for i in range(probe_hamming + 1)) / (1 << bits)
    log = logging.getLogger(__name__)
    log.info(
        "knn_lsh: bits=%d probe=%d -> expected scanned fraction %.1f%% of buckets",
        bits,
        probe_hamming,
        100.0 * frac,
    )
    if log_scan_stats:
        from parallel_pagerank_ray.stages.agg import grouped_agg

        rows = grouped_agg(
            with_code.select_columns(["code"]),
            ["code"],
            {"n": ("code", "count")},
            num_buckets=8,
        ).take_all()
        codes_arr = np.array([r["code"] for r in rows], dtype=np.int64)
        sizes = np.array([r["n"] for r in rows], dtype=np.int64)
        xor = q_codes[:, None] ^ codes_arr[None, :]
        ham = np.zeros_like(xor)
        for b in range(bits):
            ham += (xor >> b) & 1
        probed = (ham <= probe_hamming).any(axis=0)
        log.info(
            "knn_lsh measured: %d/%d occupied buckets probed (%.1f%%), "
            "%d/%d vectors scanned (%.1f%%)",
            int(probed.sum()),
            len(codes_arr),
            100.0 * probed.mean() if len(codes_arr) else 0.0,
            int(sizes[probed].sum()),
            int(sizes.sum()),
            100.0 * sizes[probed].sum() / max(int(sizes.sum()), 1),
        )
    return drop_empty_blocks(out)


def _kmeans(sample: np.ndarray, k: int, iters: int = 10, seed: int = 42) -> np.ndarray:
    """Deterministic Lloyd k-means on a driver-side sample (coarse
    quantizer training). Centroids are L2-normalized so nearest-centroid
    assignment under dot product == cosine."""
    rng = np.random.default_rng(seed)
    sample = _normalize(np.asarray(sample, dtype=np.float64))
    k = min(k, len(sample))
    centroids = sample[rng.choice(len(sample), size=k, replace=False)]
    for _ in range(iters):
        assign = np.argmax(sample @ centroids.T, axis=1)
        for c in range(k):
            members = sample[assign == c]
            if len(members):
                centroids[c] = members.mean(axis=0)
            else:  # deterministic reseed from the farthest point
                far = np.argmin((sample @ centroids.T).max(axis=1))
                centroids[c] = sample[far]
        centroids = _normalize(centroids)
    return centroids


def knn_ivf(
    embs: rd.Dataset,
    queries: tuple[np.ndarray, np.ndarray],
    k: int = 5,
    n_cells: int = 64,
    nprobe: int = 4,
    train_size: int = 2048,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> rd.Dataset:
    """IVF ANN: k-means coarse quantizer -> corpus shuffled ONCE by cell
    -> each cell scored only against queries probing it (its centroid is
    among the query's ``nprobe`` nearest). The scale path alongside
    ``knn_lsh``: scanned fraction ~= nprobe / n_cells; recall < 1 vs
    ``knn_brute`` by design (tested in pytest).

    The quantizer trains driver-side on a ``train_size`` sample (one
    ``limit().take_all()`` — the ONLY driver materialization, bounded by
    train_size) and is broadcast via one ``ray.put``. Output schema
    matches ``knn_brute``: (query_id, neighbor_id).
    """
    q_ids, q_mat = queries
    q_mat64 = _normalize(np.asarray(q_mat, dtype=np.float64))
    q_ids = np.asarray(q_ids, dtype=np.int64)

    sample_rows = embs.select_columns([vec_col]).limit(train_size).take_all()
    if not sample_rows:
        import pyarrow as _pa

        return rd.from_arrow(
            _pa.table(
                {
                    "query_id": _pa.array([], type=_pa.int64()),
                    "neighbor_id": _pa.array([], type=_pa.int64()),
                }
            )
        )
    sample = np.asarray(
        [np.asarray(r[vec_col], dtype=np.float64) for r in sample_rows]
    )
    centroids = _kmeans(sample, n_cells, seed=seed)
    cent_ref = ray.put(centroids)
    # per-query probed cells (driver-side: Q x n_cells is tiny)
    nprobe = min(nprobe, len(centroids))
    q_cells = np.argsort(-(q_mat64 @ centroids.T), axis=1)[:, :nprobe]
    queries_ref = ray.put((q_ids, q_mat64, q_cells))

    def assign_cell(batch: pa.Table, cent_ref=cent_ref) -> pa.Table:
        cents = ray.get(cent_ref)
        mat = _normalize(_to_matrix(batch.column(vec_col)))
        cells = np.argmax(mat @ cents.T, axis=1).astype(np.int64)
        return batch.append_column("cell", pa.array(cells))

    with_cell = embs.select_columns([id_col, vec_col]).map_batches(
        assign_cell, batch_format="pyarrow"
    )

    def score_cell(g: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame(
            {
                "query_id": np.array([], dtype=np.int64),
                "neighbor_id": np.array([], dtype=np.int64),
                "sim": np.array([], dtype=np.float64),
            }
        )
        qi, qm, qc = ray.get(queries_ref)
        cell = np.int64(g["cell"].iloc[0])
        probe = (qc == cell).any(axis=1)
        if not probe.any():
            return empty  # cell pruned: never scored
        ids = g[id_col].to_numpy()
        mat = _normalize(_rows_to_matrix(g[vec_col]))
        sims = qm[probe] @ mat.T
        sims[qi[probe][:, None] == ids[None, :]] = -np.inf
        kk = min(k, sims.shape[1])
        part = np.argpartition(-sims, kth=kk - 1, axis=1)[:, :kk]
        # vectorized result assembly: rows = queries repeated k-wide,
        # columns = the argpartition picks, -inf self-matches masked
        qsel = qi[probe]
        flat = part.ravel()
        svals = sims[np.repeat(np.arange(len(qsel)), kk), flat]
        keep = np.isfinite(svals)
        return pd.DataFrame(
            {
                "query_id": np.repeat(qsel, kk)[keep],
                "neighbor_id": ids[flat][keep].astype(np.int64),
                "sim": svals[keep],
            }
        )

    partials = with_cell.groupby("cell").map_groups(
        score_cell, batch_format="pandas"
    )

    def final_topk(group: pd.DataFrame) -> pd.DataFrame:
        g = group.sort_values(["sim", "neighbor_id"], ascending=[False, True]).head(k)
        return g[["query_id", "neighbor_id"]].reset_index(drop=True)

    out = drop_empty_blocks(partials).groupby("query_id").map_groups(
        final_topk, batch_format="pandas"
    )
    return drop_empty_blocks(out)
