"""Similarity search: brute-force exactness + LSH recall."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray.data as rd

from parallel_pagerank_ray.pipelines.similarity import knn_brute, knn_lsh

N, DIM, K, Q = 200, 32, 5, 8


def _embs():
    rng = np.random.default_rng(11)
    mat = rng.standard_normal((N, DIM))
    ids = np.arange(N, dtype=np.int64)
    t = pa.table(
        {
            "vec_id": pa.array(ids),
            "embedding": pa.array([list(map(float, v)) for v in mat]),
        }
    )
    return rd.from_arrow(t).repartition(4), ids, mat


def _numpy_topk(ids, mat, q_ids, k):
    norm = mat / np.linalg.norm(mat, axis=1, keepdims=True)
    out = set()
    for qi in q_ids:
        sims = norm[qi] @ norm.T
        sims[qi] = -np.inf
        order = np.lexsort((ids, -sims))[:k]
        for nb in order:
            out.add((int(qi), int(ids[nb])))
    return out


def test_knn_brute_exact():
    ds, ids, mat = _embs()
    q_ids = np.arange(Q, dtype=np.int64)
    got = knn_brute(ds, (q_ids, mat[:Q]), k=K).to_pandas()
    got_set = set(zip(got.query_id, got.neighbor_id))
    assert got_set == _numpy_topk(ids, mat, q_ids, K)


def test_knn_lsh_recall():
    ds, ids, mat = _embs()
    q_ids = np.arange(Q, dtype=np.int64)
    truth = _numpy_topk(ids, mat, q_ids, K)
    import logging

    records = []

    class _Cap(logging.Handler):
        def emit(self, record):
            records.append(record.getMessage())

    lg = logging.getLogger("parallel_pagerank_ray.pipelines.similarity")
    h = _Cap(); lg.addHandler(h); lg.setLevel(logging.INFO)
    try:
        got = knn_lsh(
            ds, (q_ids, mat[:Q]), dim=DIM, k=K, bits=8, probe_hamming=3,
            log_scan_stats=True,
        ).to_pandas()
    finally:
        lg.removeHandler(h)
    measured = [m for m in records if "measured" in m]
    assert measured and "% " not in measured[0]  # logged a measured line
    got_set = set(zip(got.query_id, got.neighbor_id))
    recall = len(got_set & truth) / len(truth)
    assert recall >= 0.4  # approximate by design; bucketing must not collapse
    assert len(got) <= Q * K


def test_knn_ivf_recall():
    from parallel_pagerank_ray.pipelines.similarity import knn_ivf

    ds, ids, mat = _embs()
    q_ids = np.arange(Q, dtype=np.int64)
    truth = _numpy_topk(ids, mat, q_ids, K)
    got = knn_ivf(
        ds, (q_ids, mat[:Q]), k=K, n_cells=8, nprobe=3, train_size=200
    ).to_pandas()
    got_set = set(zip(got.query_id, got.neighbor_id))
    recall = len(got_set & truth) / len(truth)
    assert recall >= 0.5  # nprobe/n_cells = 3/8 of cells scanned
    assert len(got) <= Q * K


def test_fake_embedder_chain():
    """docs -> FakeEmbedder -> near-dup chain: identical docs must embed
    identically; the stage output is deterministic across runs."""
    import pyarrow as pa
    import ray.data as rd

    from parallel_pagerank_ray.functions.embed import FakeEmbedder, normalized

    texts = ["the quick brown fox", "lazy dog sleeps", "the quick brown fox", ""]
    t = pa.table(
        {
            "doc_id": pa.array(range(4), type=pa.int64()),
            "text": pa.array(texts),
        }
    )
    ds = rd.from_arrow(t).repartition(2)
    out = (
        ds.map_batches(FakeEmbedder, fn_constructor_kwargs={"dim": 8},
                       batch_format="pyarrow", concurrency=1)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    cols = [f"e{j}" for j in range(8)]
    assert out.loc[0, cols].tolist() == out.loc[2, cols].tolist()
    assert out.loc[3, cols].tolist() == [0] * 8  # no tokens -> zero vector
    # normalized() gives unit vectors usable by the ANN ops
    import pyarrow as _pa

    mat = normalized(_pa.Table.from_pandas(out), 8)
    assert np.allclose(np.linalg.norm(mat[:3], axis=1), 1.0)
