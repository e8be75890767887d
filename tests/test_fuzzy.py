"""FastSS edit-distance-1 join vs brute-force Levenshtein."""

from __future__ import annotations

import numpy as np
import pandas as pd
import ray.data as rd

from parallel_pagerank_ray.pipelines.fuzzy import edit1_join


def _lev(a: str, b: str) -> int:
    if len(a) < len(b):
        a, b = b, a
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(
                min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (ca != cb))
            )
        prev = cur
    return prev[-1]


def _brute(vals):
    vals = sorted(set(vals))
    return {
        (a, b)
        for i, a in enumerate(vals)
        for b in vals[i + 1 :]
        if _lev(a, b) <= 1
    }


def _run(vals):
    ds = rd.from_pandas(pd.DataFrame({"name": vals})).repartition(3)
    df = edit1_join(ds, "name").to_pandas()
    return {(a, b) for a, b in zip(df.get("s1", []), df.get("s2", []))}


def test_random_words_match_bruteforce(ray_session):
    rng = np.random.default_rng(4)
    alphabet = list("abcd")
    vals = [
        "".join(rng.choice(alphabet, size=rng.integers(1, 7)))
        for _ in range(150)
    ]
    assert _run(vals) == _brute(vals)


def test_edge_shapes(ray_session):
    # substitutions, insertions at both ends, repeated-char deletions,
    # ED-2 traps ("ab"/"ba" share deletion keys but are ED 2)
    vals = ["ab", "ba", "aab", "aa", "xaa", "aax", "hello", "hallo",
            "hell", "ello", "xyz"]
    assert _run(vals) == _brute(vals)


def _brute_ed(a: str, b: str) -> int:
    import numpy as _np

    prev = _np.arange(len(b) + 1)
    for i, ca in enumerate(a, 1):
        cur = _np.empty(len(b) + 1, dtype=_np.int64)
        cur[0] = i
        for j, cb in enumerate(b, 1):
            cur[j] = min(
                prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (ca != cb)
            )
        prev = cur
    return int(prev[-1])


def test_edit2_join_matches_bruteforce(ray_session):
    """edit2_join == all distinct pairs with true Levenshtein <= 2 on
    a vocabulary crafted to include substitutions, transpositions
    (ED 2 same length beyond hamming), 1/2-length gaps, and far pairs."""
    import itertools

    import ray.data as rd

    from parallel_pagerank_ray.pipelines.fuzzy import edit2_join

    rng = np.random.default_rng(17)
    alpha = list("abcd")
    vocab = {"", "a", "ab", "ba", "abc", "bca", "abcd", "acbd", "abcdef"}
    while len(vocab) < 60:
        vocab.add(
            "".join(rng.choice(alpha, size=rng.integers(1, 8)))
        )
    vocab = sorted(vocab)
    expected = {
        (a, b)
        for a, b in itertools.combinations(vocab, 2)
        if _brute_ed(a, b) <= 2
    }
    got = (
        edit2_join(
            rd.from_items([{"s": v} for v in vocab]).repartition(4), "s"
        )
        .to_pandas()
    )
    got_pairs = {
        (min(a, b), max(a, b)) for a, b in zip(got["s1"], got["s2"])
    }
    assert got_pairs == expected


def test_edit2_join_partition_invariance(ray_session):
    import ray.data as rd

    from parallel_pagerank_ray.pipelines.fuzzy import edit2_join

    vocab = [f"item{i:03d}" for i in range(40)] + ["itm007", "item77"]
    a = edit2_join(rd.from_items([{"s": v} for v in vocab]), "s")
    b = edit2_join(
        rd.from_items([{"s": v} for v in vocab]).repartition(7),
        "s",
        num_buckets=3,
    )
    pa_ = sorted(map(tuple, a.to_pandas().to_numpy().tolist()))
    pb_ = sorted(map(tuple, b.to_pandas().to_numpy().tolist()))
    assert pa_ == pb_
