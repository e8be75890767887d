"""Document embedding stage — model-inference plumbing with a
deterministic fake model.

Real embedding models are not in this container (BUILD brief: stub
model scoring behind a deterministic fake), so ``FakeEmbedder`` maps
each document to a ``dim``-vector derived from its token hashes:

    e_j(doc) = sum over token OCCURRENCES of (((h(tok) mod p) * A_j + B_j) mod p)

with ``h`` the md5-u64 token hash and p = 2^31-1 (every product < 2^62).
INTEGER sums — order-independent and bit-reproducible, so the stage is
value-checkable against a DuckDB oracle like the sketches
(functions/hashing.py). ``normalized()`` converts to unit float vectors
for the ANN/near-dup pipelines (docs -> embed -> knn chains).

The stage shape is the real thing: a callable CLASS for
``map_batches(FakeEmbedder, fn_constructor_kwargs=..., concurrency=N)``
— weights (A, B) built once per actor in ``__init__``, batched
vectorized "inference" in ``__call__``. Swapping in a real model
changes only the constructor and the kernel, not the pipeline.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from parallel_pagerank_ray.functions import hashing as H


def embed_params(dim: int, seed: int = 1234) -> tuple[np.ndarray, np.ndarray]:
    """Per-dimension affine params < 2^31-1 (SQL-safe products)."""
    rng = np.random.default_rng(seed)
    p = int(H.P31)
    a = rng.integers(1, p, size=dim, dtype=np.uint64)
    b = rng.integers(0, p, size=dim, dtype=np.uint64)
    return a, b


class FakeEmbedder:
    """Actor-pool stage: (doc_id, text) -> (doc_id, e0..e{dim-1} int64).

    One md5 per DISTINCT token in the batch; the per-doc sums run as one
    reduceat over the occurrence rows per dimension chunk.
    """

    def __init__(self, dim: int = 8, seed: int = 1234) -> None:
        import re

        from parallel_pagerank_ray.functions.textstats import TOKEN_RE

        self.token = re.compile(TOKEN_RE)
        self.dim = dim
        self.a, self.b = embed_params(dim, seed=seed)

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_numpy()
        texts = batch.column("text").to_pylist()
        token_lists = [self.token.findall(t.lower()) for t in texts]
        D = len(ids)
        counts = np.fromiter((len(t) for t in token_lists), dtype=np.int64, count=D)
        out = np.zeros((D, self.dim), dtype=np.int64)
        nz = np.nonzero(counts)[0]
        if len(nz):
            all_tokens = [t for lst in token_lists for t in lst]
            vocab, inv = np.unique(
                np.array(all_tokens, dtype=object), return_inverse=True
            )
            vh = np.array([H.md5_u64(t) for t in vocab], dtype=np.uint64) % H.P31
            proj = (vh[:, None] * self.a[None, :] + self.b[None, :]) % H.P31
            tok_rows = proj[inv].astype(np.int64)  # (T, dim)
            starts = np.zeros(len(nz), dtype=np.int64)
            np.cumsum(counts[nz][:-1], out=starts[1:])
            out[nz] = np.add.reduceat(tok_rows, starts, axis=0)
        cols = {"doc_id": pa.array(ids)}
        for j in range(self.dim):
            cols[f"e{j}"] = pa.array(out[:, j])
        return pa.table(cols)


def normalized(emb_table: pa.Table, dim: int) -> np.ndarray:
    """(D, dim) unit float64 matrix from an embed output table."""
    mat = np.stack(
        [emb_table.column(f"e{j}").to_numpy().astype(np.float64) for j in range(dim)],
        axis=1,
    )
    norms = np.linalg.norm(mat, axis=1, keepdims=True)
    norms[norms == 0] = 1.0
    return mat / norms
