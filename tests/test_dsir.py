"""DSIR affinity vs a from-scratch Python counting oracle."""

import re
from collections import Counter

import numpy as np
import pandas as pd
import ray.data as rd

from parallel_pagerank_ray.functions.dsir import dsir_affinity

DOCS = [
    (0, "the cat sat on the mat", "en"),
    (1, "the cat ate the fish", "en"),
    (2, "der hund und die katze", "de"),
    (3, "die katze und der fisch und der hund", "de"),
    (4, "the fish and the cat", "en"),
    (5, "one", "de"),  # single token: no bigram, omitted
    (6, "", "de"),  # empty: omitted
]
TOKEN = re.compile(r"[a-z0-9]+")


def _oracle(docs, target_langs):
    def bigrams(text):
        t = TOKEN.findall(text.lower())
        return [f"{a} {b}" for a, b in zip(t, t[1:])]

    rcnt, tcnt = Counter(), Counter()
    for _i, text, lang in docs:
        bs = bigrams(text)
        rcnt.update(bs)
        if lang in target_langs:
            tcnt.update(bs)
    rtot, ttot = sum(rcnt.values()), sum(tcnt.values())
    rows = []
    for i, text, _lang in docs:
        bs = bigrams(text)
        if not bs:
            continue
        ar = sum(rcnt[b] for b in bs)
        at = sum(tcnt[b] for b in bs)
        rows.append(
            {
                "doc_id": i,
                "n_bigrams": len(bs),
                "aff_raw": ar,
                "aff_target": at,
                "score": np.float64(at * rtot) / np.float64(ar * ttot),
            }
        )
    return pd.DataFrame(rows)


def _run(blocks):
    ds = rd.from_pandas(
        pd.DataFrame(DOCS, columns=["doc_id", "text", "lang"])
    ).repartition(blocks)
    target = ds.filter(expr="lang == 'en'").select_columns(
        ["doc_id", "text"]
    )
    got = dsir_affinity(ds.select_columns(["doc_id", "text"]), target)
    return got.to_pandas().sort_values("doc_id").reset_index(drop=True)


def test_matches_counting_oracle():
    got = _run(blocks=3)
    want = _oracle(DOCS, {"en"})
    pd.testing.assert_frame_equal(
        got.astype({"n_bigrams": np.int64}), want, check_dtype=False
    )
    # exact float equality too (single division of exact ints)
    assert np.array_equal(got["score"].to_numpy(), want["score"].to_numpy())


def test_short_docs_omitted():
    got = _run(blocks=2)
    assert set(got["doc_id"]) == {0, 1, 2, 3, 4}


def test_target_like_scores_above_one():
    got = _run(blocks=2).set_index("doc_id")
    # pure-English docs are target-like (>1); pure-German below 1
    assert got.loc[0, "score"] > 1.0 > got.loc[2, "score"]


def test_partition_invariant():
    pd.testing.assert_frame_equal(_run(1), _run(4))


def test_empty_target_raises():
    import pytest

    ds = rd.from_pandas(
        pd.DataFrame(DOCS, columns=["doc_id", "text", "lang"])
    )
    with pytest.raises(ValueError, match="target corpus has no bigrams"):
        dsir_affinity(
            ds.select_columns(["doc_id", "text"]),
            ds.filter(expr="lang == 'xx'").select_columns(["doc_id", "text"]),
        )
