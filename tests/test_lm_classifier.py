"""LM familiarity buckets and hashed linear classifier vs from-scratch
Python counting oracles."""

import math
import re
from collections import Counter

import numpy as np
import pandas as pd
import ray.data as rd

from parallel_pagerank_ray.functions.classifier import (
    classify_docs,
    weight_table,
)
from parallel_pagerank_ray.functions.hashing import md5_u64
from parallel_pagerank_ray.functions.lm import lm_familiarity

DOCS = [
    (0, "the cat sat on the mat"),
    (1, "the cat ate the fish"),
    (2, "the cat sat on the mat"),  # duplicate: identical score as 0
    (3, "zq xv qqj kkz"),           # rare bigrams -> tail
    (4, "the fish and the cat sat"),
    (5, "one"),                     # single token: no bigram, omitted
    (6, ""),                        # empty: omitted everywhere
    (7, "the cat the cat the cat"),
    (8, "fish ate the mat and sat on one"),
]
TOKEN = re.compile(r"[a-z0-9_]+")


def _bigrams(text):
    t = TOKEN.findall(text.lower())
    return [f"{a} {b}" for a, b in zip(t, t[1:])]


def _lm_oracle(docs):
    rcnt = Counter()
    for _i, text in docs:
        rcnt.update(_bigrams(text))
    rows = []
    for i, text in docs:
        bs = _bigrams(text)
        if not bs:
            continue
        score = sum(int(math.log2(rcnt[b])) for b in bs)
        rows.append((i, len(bs), score, score * 1_000_000 // len(bs)))
    n = len(rows)
    svals = sorted(r[3] for r in rows)
    t1, t2 = svals[(n + 2) // 3 - 1], svals[(2 * n + 2) // 3 - 1]
    out = []
    for i, nb, sc, ss in rows:
        b = "head" if ss > t2 else ("middle" if ss > t1 else "tail")
        out.append((i, nb, sc, ss, b))
    return pd.DataFrame(
        out,
        columns=["doc_id", "n_bigrams", "lm_score", "score_scaled", "bucket"],
    )


def _docs_ds(parallelism=3):
    return rd.from_pandas(
        pd.DataFrame(
            {"doc_id": [i for i, _ in DOCS], "text": [t for _, t in DOCS]}
        )
    ).repartition(parallelism)


def test_lm_familiarity_matches_oracle():
    got = (
        lm_familiarity(_docs_ds())
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    want = _lm_oracle(DOCS).sort_values("doc_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(
        got[want.columns.tolist()], want, check_dtype=False
    )
    # duplicate documents score identically; rare-bigram doc lands tail
    by_id = got.set_index("doc_id")
    assert by_id.loc[0, "score_scaled"] == by_id.loc[2, "score_scaled"]
    assert by_id.loc[3, "bucket"] == "tail"
    assert set(got["bucket"]) <= {"head", "middle", "tail"}


def test_lm_familiarity_partition_invariant():
    a = lm_familiarity(_docs_ds(1)).to_pandas().sort_values("doc_id")
    b = lm_familiarity(_docs_ds(5)).to_pandas().sort_values("doc_id")
    pd.testing.assert_frame_equal(
        a.reset_index(drop=True), b.reset_index(drop=True)
    )


def test_lm_familiarity_empty():
    empty = rd.from_pandas(
        pd.DataFrame({"doc_id": pd.Series([], dtype=np.int64),
                      "text": pd.Series([], dtype=str)})
    )
    got = lm_familiarity(empty)
    assert got.count() == 0
    # Ray 2.49 drops columns in to_pandas() of an all-empty Dataset;
    # the schema itself must stay stable
    assert set(got.schema().names) == {
        "doc_id", "n_bigrams", "lm_score", "score_scaled", "bucket"
    }


def _clf_oracle(docs, dim=512):
    w = weight_table(dim)
    rows = []
    for i, text in docs:
        toks = TOKEN.findall(text.lower())
        if not toks:
            continue
        score = int(sum(int(w[md5_u64(t) % dim]) for t in toks))
        rows.append((i, len(toks), score, "keep" if score > 0 else "drop"))
    return pd.DataFrame(
        rows, columns=["doc_id", "n_tokens", "clf_score", "label"]
    )


def test_classifier_matches_oracle():
    got = (
        classify_docs(_docs_ds())
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    want = _clf_oracle(DOCS).sort_values("doc_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(
        got[want.columns.tolist()], want, check_dtype=False
    )
    # zero-token docs omitted
    assert 6 not in set(got["doc_id"])
    assert 5 in set(got["doc_id"])


def test_weight_table_deterministic_and_bounded():
    w = weight_table()
    assert w.min() >= -8 and w.max() <= 8
    assert np.array_equal(w, weight_table())
    # non-degenerate: both signs present
    assert (w > 0).any() and (w < 0).any()
