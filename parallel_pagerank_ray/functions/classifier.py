"""Hashed-feature linear quality classifier (the fastText-style
"looks like reference text?" scorer GPT-3/LLaMA-class pipelines run
over every crawl document), integer-exact variant.

A real deployment loads trained float weights; floats are not
bit-reproducible across engines, so the gate variant scores with a
DETERMINISTIC integer weight vector — the plumbing (hashing-trick
features, per-actor weight table, vectorized per-batch scoring, keep /
drop labelling) is exactly the production shape, and a trained int8 /
quantized model drops in by replacing ``weight_table``.

    feature(t)  = md5_u64(token) mod dim          (hashing trick)
    w(j)        = ((j * A + B) mod P31) mod 17 - 8  in [-8, 8]
    score(d)    = sum over d's token occurrences of w(feature(t))
    label(d)    = 'keep' if score > 0 else 'drop'

All int64; md5 + affine arithmetic reproduce verbatim in the DuckDB
oracle. Scale shape: one stateless tokenize+score pass (map-side only,
no shuffle); the weight table is dim int64s built once per actor in
``__init__``. Documents with zero tokens carry no features and are
omitted (inner semantics, matching the SQL GROUP BY).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import ray.data as rd

from parallel_pagerank_ray.functions.hashing import md5_u64
from parallel_pagerank_ray.functions.textstats import TOKEN_RE
from parallel_pagerank_ray.pipelines.random_walk import salt64

P31 = (1 << 31) - 1
DIM = 512
A_SALT = "qclf_a"
B_SALT = "qclf_b"


def weight_table(dim: int = DIM) -> np.ndarray:
    """Deterministic integer weights in [-8, 8]: one affine mod-P31
    round over the feature index, seeded by fixed salts."""
    a = salt64(A_SALT) % P31
    b = salt64(B_SALT) % P31
    j = np.arange(dim, dtype=np.int64)
    return ((j * a + b) % P31) % 17 - 8


class HashedLinearScorer:
    """documents batch -> (doc_id, n_tokens, clf_score, label).

    Stateful map_batches stage: the weight table (and in a real
    deployment, the trained model) is built once per actor here, never
    per batch."""

    def __init__(self, dim: int = DIM) -> None:
        import re

        self.dim = dim
        self.w = weight_table(dim)
        self.token = re.compile(TOKEN_RE)

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        toks = batch["text"].astype(str).str.lower().str.findall(TOKEN_RE)
        lens = toks.map(len).to_numpy(dtype=np.int64)
        keep = lens > 0
        if not keep.any():
            return pd.DataFrame(
                {
                    "doc_id": pd.Series([], dtype=np.int64),
                    "n_tokens": pd.Series([], dtype=np.int64),
                    "clf_score": pd.Series([], dtype=np.int64),
                    "label": pd.Series([], dtype=str),
                }
            )
        flat = np.concatenate([t for t in toks.to_numpy() if t])
        # hash each DISTINCT token once per batch, then gather
        uniq, inv = np.unique(flat, return_inverse=True)
        feats = np.array(
            [md5_u64(t) % self.dim for t in uniq], dtype=np.int64
        )
        wtok = self.w[feats[inv]]
        # per-doc segment sums over the flattened token stream
        ends = np.cumsum(lens[keep])
        starts = np.concatenate([[0], ends[:-1]])
        csum = np.concatenate([[0], np.cumsum(wtok)])
        score = csum[ends] - csum[starts]
        return pd.DataFrame(
            {
                "doc_id": batch["doc_id"].to_numpy()[keep].astype(np.int64),
                "n_tokens": lens[keep],
                "clf_score": score.astype(np.int64),
                "label": np.where(score > 0, "keep", "drop"),
            }
        )


def classify_docs(docs: rd.Dataset, dim: int = DIM) -> rd.Dataset:
    """Score every document with the hashed linear classifier — one
    stateless-shaped actor-pool pass, no shuffle."""
    return docs.select_columns(["doc_id", "text"]).map_batches(
        HashedLinearScorer,
        fn_constructor_kwargs={"dim": dim},
        concurrency=(1, 8),
        batch_format="pandas",
    )
