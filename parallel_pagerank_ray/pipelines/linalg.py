"""Distributed numerical-linear-algebra sufficient statistics over an
embedding column.

Beyond-reference capability (the reference has no vector analytics):
the Gram matrix G = Σ_rows q qᵀ — the sufficient statistic of PCA /
covariance / whitening over an embedding corpus. The classic scale
shape for tall-skinny X (N rows × d dims, N ≫ d): each batch computes
its own d×d int64 partial with ONE matmul, the reduce is a bucketed
grouped sum over d(d+1)/2 upper-triangle cells — constant-size state
per task, one tiny shuffle, never an N×N or driver-side N×d object.

Values are FLOOR-quantized (q = floor(x · scale) in float64; the
multiply by a power of two is exact in IEEE754 and floor has no
rounding-mode ambiguity), so the int64 Gram is bit-reproducible by the
DuckDB oracle at any parallelism. The float covariance / eigenvectors
are one driver-side fold over the d×d result the caller owns.

Overflow bound: a cell sums N · (scale·max|x|)² — with scale=1024 and
unit-normalized embeddings that is N < 2^63/2^20 ≈ 8.8e12 rows; lower
``scale`` (or split the corpus and fold the int64 partials) beyond.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray.data as rd

from parallel_pagerank_ray.stages.agg import grouped_agg


def embedding_gram(
    embeddings: rd.Dataset,
    vec_col: str = "embedding",
    scale: int = 1024,
    num_buckets: int | None = None,
) -> rd.Dataset:
    """Upper-triangle Gram matrix of the floor-quantized embedding
    column: (i, j, gram, n_rows) with 0-based i <= j, all int64-exact.

    ``n_rows`` (the row count, replicated per cell) makes the result a
    self-contained covariance sufficient statistic together with the
    first-moment cells: pass the same Dataset with a constant 1.0
    column prepended to get sums and counts in one call if needed.
    """

    def partial(t: pa.Table) -> pa.Table:
        col = t.column(vec_col)
        if t.num_rows == 0:
            return pa.table(
                {
                    "i": pa.array([], pa.int64()),
                    "j": pa.array([], pa.int64()),
                    "gram": pa.array([], pa.int64()),
                    "n_rows": pa.array([], pa.int64()),
                }
            )
        flat = col.combine_chunks()
        if isinstance(flat, pa.ChunkedArray):
            flat = flat.chunk(0)
        d = len(flat[0])
        x = (
            flat.flatten()
            .to_numpy(zero_copy_only=False)
            .astype(np.float64)
            .reshape(t.num_rows, d)
        )
        q = np.floor(x * float(scale)).astype(np.int64)
        g = q.T @ q  # one exact int64 matmul per batch
        iu, ju = np.triu_indices(d)
        return pa.table(
            {
                "i": pa.array(iu.astype(np.int64), pa.int64()),
                "j": pa.array(ju.astype(np.int64), pa.int64()),
                "gram": pa.array(g[iu, ju], pa.int64()),
                "n_rows": pa.array(
                    np.full(len(iu), t.num_rows, dtype=np.int64), pa.int64()
                ),
            }
        )

    parts = embeddings.select_columns([vec_col]).map_batches(
        partial, batch_format="pyarrow"
    )
    return grouped_agg(
        parts,
        ["i", "j"],
        {"gram": ("gram", "sum"), "n_rows": ("n_rows", "sum")},
        num_buckets=num_buckets,
    )
