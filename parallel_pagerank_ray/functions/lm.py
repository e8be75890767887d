"""CCNet-style language-model familiarity bucketing (Wenzek et al.
2020, "CCNet: Extracting High Quality Monolingual Datasets from Web
Crawl Data"), integer-exact variant.

CCNet scores each document with a KenLM n-gram perplexity and splits the
corpus into head/middle/tail tertiles; training pipelines keep head (or
head+middle). Float log-probabilities are not bit-reproducible across
engines, so this operator gates the integer sufficient statistic
instead: the per-document FAMILIARITY

    lm_score(d)     = sum over d's bigram occurrences b of
                      ilog2(corpus_count(b))        (ilog2 = floor log2)
    score_scaled(d) = lm_score * 10^6 // n_bigrams(d)

— an unsmoothed frequency-LM log-likelihood with floor-log2 in place of
log2, exactly int64. High score = the document's bigrams are common in
the corpus (familiar, head); low = rare/garbled (tail). Buckets are
value thresholds at the exact ascending-rank positions ceil(n/3) and
ceil(2n/3) (ties share a bucket), so the rule is a pure function of the
multiset of scores — reproducible in SQL with row_number().

Scale shape: ONE tokenize pass builds the per-doc bigram table, whose
fold is also the corpus count table (no second scan); one string-keyed
hash join per-doc-vs-counts; one per-doc grouped_agg; the threshold
pick is a (distinct score -> count) histogram walk — bounded by the
score domain, never a corpus sort. Document text never leaves the
tokenize pass. Mirrors the reference's quality-gating role
(dashboard/app.py filters by degree heuristics); no counterpart file.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data as rd

from parallel_pagerank_ray.functions.dsir import _per_doc_bigrams
from parallel_pagerank_ray.stages.agg import grouped_agg
from parallel_pagerank_ray.util import safe_join

SCALE = 1_000_000


def _ilog2(x: np.ndarray) -> np.ndarray:
    """floor(log2(x)) for int64 x >= 1, exact via the frexp exponent
    (x = m * 2^e with 0.5 <= m < 1 -> floor log2 = e - 1; frexp is
    exact for every integer < 2^53)."""
    _, e = np.frexp(x.astype(np.float64))
    return (e - 1).astype(np.int64)


def lm_familiarity(
    docs: rd.Dataset,
    num_buckets: int | None = None,
    num_partitions: int | None = None,
) -> rd.Dataset:
    """Per-document integer LM familiarity + head/middle/tail bucket.

    Output: (doc_id, n_bigrams, lm_score, score_scaled, bucket) — one
    row per document with at least one bigram (>= 2 tokens); shorter
    docs carry no n-gram model mass and are omitted by definition.
    """
    if num_partitions is None:
        from parallel_pagerank_ray.pipelines.graph_build import (
            _default_join_partitions,
        )

        num_partitions = _default_join_partitions()

    empty = pa.table(
        {
            "doc_id": pa.array([], pa.int64()),
            "n_bigrams": pa.array([], pa.int64()),
            "lm_score": pa.array([], pa.int64()),
            "score_scaled": pa.array([], pa.int64()),
            "bucket": pa.array([], pa.string()),
        }
    )
    per_doc = _per_doc_bigrams(docs).materialize()
    if per_doc.count() == 0:
        # hash-join/groupby on an all-empty Dataset trips Arrow; the
        # scored table is definitionally empty anyway
        return rd.from_arrow(empty)
    counts = grouped_agg(
        per_doc, ["bigram"], {"rcnt": ("cnt", "sum")}, num_buckets=num_buckets
    )
    joined = safe_join(
        per_doc,
        counts,
        join_type="inner",
        num_partitions=num_partitions,
        on=("bigram",),
    )

    def contrib(tb: pa.Table) -> pa.Table:
        cnt = tb.column("cnt").to_numpy(zero_copy_only=False)
        rc = tb.column("rcnt").to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "doc_id": tb.column("doc_id"),
                "cnt": tb.column("cnt"),
                "c": pa.array(cnt * _ilog2(rc), pa.int64()),
            }
        )

    scored = grouped_agg(
        joined.map_batches(contrib, batch_format="pyarrow"),
        ["doc_id"],
        {"n_bigrams": ("cnt", "sum"), "lm_score": ("c", "sum")},
        num_buckets=num_buckets,
    )

    def scale(tb: pa.Table) -> pa.Table:
        s = tb.column("lm_score").to_numpy(zero_copy_only=False)
        n = tb.column("n_bigrams").to_numpy(zero_copy_only=False)
        return tb.append_column(
            "score_scaled", pa.array(s * np.int64(SCALE) // n, pa.int64())
        )

    scored = scored.map_batches(scale, batch_format="pyarrow").materialize()

    # tertile thresholds from the (distinct score -> count) histogram —
    # bounded by the score domain (<= 10^6 * ilog2(corpus) distinct
    # values in practice), never a full-corpus sort or pull
    hist = grouped_agg(
        scored.select_columns(["score_scaled"]),
        ["score_scaled"],
        {"cnt": ("score_scaled", "count")},
        num_buckets=num_buckets,
    ).to_pandas()
    if len(hist) == 0:
        return rd.from_arrow(empty)
    hist = hist.sort_values("score_scaled", kind="stable")
    vals = hist["score_scaled"].to_numpy()
    cum = np.cumsum(hist["cnt"].to_numpy().astype(np.int64))
    n = int(cum[-1])
    # value at 1-indexed ascending position k: first distinct value
    # whose cumulative count reaches k
    k1, k2 = (n + 2) // 3, (2 * n + 2) // 3
    t1 = int(vals[int(np.searchsorted(cum, k1, "left"))])
    t2 = int(vals[int(np.searchsorted(cum, k2, "left"))])

    def bucket(tb: pa.Table) -> pa.Table:
        s = tb.column("score_scaled").to_numpy(zero_copy_only=False)
        b = np.where(s > t2, "head", np.where(s > t1, "middle", "tail"))
        return tb.append_column("bucket", pa.array(b, pa.string()))

    return scored.map_batches(bucket, batch_format="pyarrow")
