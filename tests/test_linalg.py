"""embedding_gram vs a one-shot numpy Gram — int64-exact."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow.parquet as pq
import ray.data as rd

from parallel_pagerank_ray.pipelines.linalg import embedding_gram

SF = "/root/testdata/sf0.001"


def _dense(df: pd.DataFrame, d: int) -> np.ndarray:
    g = np.zeros((d, d), dtype=np.int64)
    g[df["i"], df["j"]] = df["gram"]
    return g


def test_embedding_gram_full_corpus_vs_numpy():
    t = pq.read_table(f"{SF}/embeddings.parquet", columns=["embedding"])
    x = np.asarray(t.column("embedding").to_pylist(), dtype=np.float64)
    q = np.floor(x * 1024.0).astype(np.int64)
    want = q.T @ q
    d = x.shape[1]

    got = embedding_gram(
        rd.read_parquet(f"{SF}/embeddings.parquet", columns=["embedding"])
    ).to_pandas()
    assert len(got) == d * (d + 1) // 2
    assert (got["n_rows"] == len(x)).all()
    dense = _dense(got, d)
    iu, ju = np.triu_indices(d)
    assert np.array_equal(dense[iu, ju], want[iu, ju])


def test_embedding_gram_partition_invariance():
    t = pq.read_table(f"{SF}/embeddings.parquet", columns=["embedding"])
    ds = rd.from_arrow(t)
    a = (
        embedding_gram(ds)
        .to_pandas()
        .sort_values(["i", "j"])
        .reset_index(drop=True)
    )
    b = (
        embedding_gram(ds.repartition(7))
        .to_pandas()
        .sort_values(["i", "j"])
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(a, b)


def test_embedding_gram_empty():
    t = pq.read_table(f"{SF}/embeddings.parquet", columns=["embedding"])
    got = embedding_gram(rd.from_arrow(t.slice(0, 0))).to_pandas()
    assert len(got) == 0
