"""Greedy max-coverage selection vs a sequential set-cover oracle."""

from __future__ import annotations

import numpy as np
import pandas as pd
import ray.data as rd

from parallel_pagerank_ray.functions import hashing as H
from parallel_pagerank_ray.pipelines.coverage import coverage_select


def _docs(texts):
    return rd.from_pandas(
        pd.DataFrame(
            {
                "doc_id": np.arange(len(texts), dtype=np.int64),
                "text": texts,
            }
        )
    ).repartition(3)


def _greedy_oracle(texts, k, shingle_k):
    sets = {
        i: set(np.unique(H.shingle_hashes31(t, shingle_k)).tolist())
        for i, t in enumerate(texts)
    }
    covered: set = set()
    out = []
    for rank in range(1, k + 1):
        best = None
        for i in sorted(sets):
            gain = len(sets[i] - covered)
            if gain > 0 and (best is None or gain > best[1]):
                best = (i, gain)
        if best is None:
            break
        out.append((rank, best[0], best[1]))
        covered |= sets[best[0]]
    return out


def test_greedy_trajectory_matches_oracle(ray_session):
    rng = np.random.default_rng(7)
    vocab = ["alpha", "bravo", "charlie", "delta", "echo", "foxtrot"]
    texts = [
        " ".join(rng.choice(vocab, size=rng.integers(5, 30)))
        for _ in range(40)
    ]
    got = coverage_select(_docs(texts), k=8, shingle_k=5).to_pandas()
    exp = _greedy_oracle(texts, 8, 5)
    assert list(zip(got["rank"], got["doc_id"], got["gain"])) == exp


def test_stops_when_coverage_exhausted(ray_session):
    # 3 distinct docs + duplicates: after 3 picks nothing adds coverage
    texts = ["aaaaaaaaaa", "bbbbbbbbbb", "cccccccccc"] * 4
    got = coverage_select(_docs(texts), k=10, shingle_k=4).to_pandas()
    assert len(got) == 3
    assert sorted(got["doc_id"]) == [0, 1, 2]  # ties -> smallest doc_id
