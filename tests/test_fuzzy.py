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
