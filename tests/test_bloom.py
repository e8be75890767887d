"""Bloom membership vs a direct reference implementation — exact,
including deterministic false positives at small m."""

import numpy as np
import pyarrow as pa
import ray.data as rd

from parallel_pagerank_ray.functions.bloom import (
    BLOOM_A,
    BLOOM_B,
    bit_positions,
    bloom_build,
)
from parallel_pagerank_ray.functions.hashing import P31, md5_u64


def _docs(texts, blocks=3):
    return rd.from_arrow(
        pa.table(
            {"doc_id": pa.array(range(len(texts)), pa.int64()), "text": texts}
        )
    ).repartition(blocks)


def _reference_hits(corpus, probes, m, k):
    bits = set()
    for t in corpus:
        x = md5_u64(t) % int(P31)
        for i in range(k):
            bits.add((x * BLOOM_A[i] + BLOOM_B[i]) % int(P31) % m)
    out = []
    for t in probes:
        x = md5_u64(t) % int(P31)
        out.append(
            int(all((x * BLOOM_A[i] + BLOOM_B[i]) % int(P31) % m in bits
                    for i in range(k)))
        )
    return out


def test_bloom_no_false_negatives_and_exact_fp_parity():
    corpus = [f"doc number {i}" for i in range(0, 60, 2)]
    probes = [f"doc number {i}" for i in range(60)] + ["novel text"]
    # tiny m forces false positives; parity must hold exactly
    for m in (64, 256, 1 << 14):
        bloom = bloom_build(_docs(corpus), "text", m=m, k=3)
        got = (
            bloom.probe(_docs(probes), "text", keep=("doc_id",))
            .to_pandas()
            .sort_values("doc_id")["maybe_in_corpus"]
            .tolist()
        )
        want = _reference_hits(corpus, probes, m, 3)
        assert got == want, m
        # no false negatives: every corpus member hits
        members = set(corpus)
        for t, h in zip(probes, want):
            if t in members:
                assert h == 1, (m, t)


def test_bloom_partition_invariance():
    corpus = [f"line {i}" for i in range(40)]
    probes = [f"line {i}" for i in range(80)]
    a = bloom_build(_docs(corpus, blocks=2), "text", m=512)
    b = bloom_build(_docs(corpus, blocks=7), "text", m=512)
    ga = a.probe(_docs(probes, blocks=5), "text", keep=("doc_id",)).to_pandas()
    gb = b.probe(_docs(probes, blocks=2), "text", keep=("doc_id",)).to_pandas()
    assert (
        ga.sort_values("doc_id")["maybe_in_corpus"].tolist()
        == gb.sort_values("doc_id")["maybe_in_corpus"].tolist()
    )


def test_bit_positions_bounds():
    keys = np.array([md5_u64(f"k{i}") for i in range(100)], dtype=np.uint64)
    pos = bit_positions(keys, 128, 3)
    assert pos.shape == (100, 3)
    assert int(pos.max()) < 128


def test_bloom_rejects_oversized_m():
    import pytest

    from parallel_pagerank_ray.functions.bloom import bloom_build

    with pytest.raises(ValueError, match="mod-2\\^31-1"):
        bloom_build(_docs(["a"]), "text", m=(1 << 31))  # > 2^31 - 1
