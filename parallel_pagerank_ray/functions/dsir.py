"""DSIR-style data selection (Xie et al. 2023, NeurIPS — "Data
Selection for Language Models via Importance Resampling"), integer-
exact variant: score each raw document by how much its hashed-n-gram
(here: bigram) distribution looks like a TARGET corpus relative to the
raw corpus.

DSIR proper uses log-probability ratios of bag-of-n-gram models; logs
are not bit-reproducible across engines, so this operator gates the
exact integer sufficient statistics instead and emits the importance
score as ONE float64 division of exact int64 products (the repo's
bit-reproducible pattern):

    aff_target(d) = sum over d's bigrams b of cnt_d(b) * tcnt(b)
    aff_raw(d)    = sum over d's bigrams b of cnt_d(b) * rcnt(b)
    score(d)      = (aff_target * raw_total) / (aff_raw * target_total)

i.e. the ratio of d's target-model mass share to its raw-model mass
share under unsmoothed frequency models — >1 means target-like.
Resampling/top-k selection consumes `score` downstream.

Scale shape: ONE tokenize pass over the raw corpus (the per-doc bigram
table), whose fold is also the corpus count table; one `bigram_counts`
pass over the target; one count-combine union (no outer join); one
string-keyed hash join of the per-doc table against the combined
counts; one per-doc grouped_agg. Document text never leaves the
tokenize passes. At
crawl scale the bigram key would be the hashed bucket id
(`hashing.shingle_hashes31`-style) rather than the string — same
pipeline, narrower key; the string key keeps the DuckDB oracle exact.

Products stay < 2^53 (exact in float64) while
total_bigram_occurrences * max_doc_affinity < 2^53 — holds through
sf1-scale corpora; beyond that, gate the scalars and ship the score
as the (num, den) pair only.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data as rd

from parallel_pagerank_ray.functions.textstats import TOKEN_RE, bigram_counts
from parallel_pagerank_ray.stages.agg import global_agg, grouped_agg
from parallel_pagerank_ray.util import safe_join


def _per_doc_bigrams(docs: rd.Dataset) -> rd.Dataset:
    """(doc_id, bigram, cnt) — per-document bigram multiplicities,
    same tokenizer/boundary rules as ``bigram_counts``."""

    def explode(b: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame(
            {
                "doc_id": pd.Series([], dtype=np.int64),
                "bigram": pd.Series([], dtype=str),
                "cnt": pd.Series([], dtype=np.int64),
            }
        )
        toks = b["text"].astype(str).str.lower().str.findall(TOKEN_RE)
        keep = [
            (i, t) for i, t in zip(b["doc_id"].to_numpy(), toks.to_numpy())
            if len(t) >= 2
        ]
        if not keep:
            return empty
        ids = np.array([i for i, _t in keep], dtype=np.int64)
        arrs = [t for _i, t in keep]
        flat = np.concatenate(arrs)
        lens = np.array([len(a) for a in arrs], dtype=np.int64)
        ends = np.cumsum(lens) - 1
        valid = np.ones(len(flat) - 1, dtype=bool)
        valid[ends[:-1]] = False
        left = pd.Series(flat[:-1][valid])
        right = pd.Series(flat[1:][valid])
        doc = np.repeat(ids, lens - 1)
        g = (
            pd.DataFrame({"doc_id": doc, "bigram": left + " " + right})
            .groupby(["doc_id", "bigram"], sort=False)
            .size()
            .reset_index(name="cnt")
        )
        g["cnt"] = g["cnt"].astype(np.int64)
        return g

    return docs.select_columns(["doc_id", "text"]).map_batches(
        explode, batch_format="pandas"
    )


def dsir_affinity(
    docs: rd.Dataset,
    target: rd.Dataset,
    num_buckets: int | None = None,
    num_partitions: int | None = None,
) -> rd.Dataset:
    """Per-document DSIR sufficient statistics + importance score.

    Output: (doc_id, n_bigrams, aff_raw, aff_target, score) — one row
    per document with at least one bigram (>= 2 tokens); shorter docs
    have no n-gram model mass and are omitted by definition.
    """
    if num_partitions is None:
        from parallel_pagerank_ray.pipelines.graph_build import (
            _default_join_partitions,
        )

        num_partitions = _default_join_partitions()

    per_doc = _per_doc_bigrams(docs).materialize()
    # corpus counts fold the per-doc table (no second text scan);
    # Σ_d cnt_d(b) over docs == the corpus bigram multiset
    r = grouped_agg(
        per_doc, ["bigram"], {"cnt": ("cnt", "sum")}, num_buckets=num_buckets
    )
    t = bigram_counts(target, num_buckets=num_buckets)
    raw_total = int(global_agg(r, {"s": ("cnt", "sum")})["s"] or 0)
    target_total = int(global_agg(t, {"s": ("cnt", "sum")})["s"] or 0)
    if target_total == 0:
        raise ValueError("dsir_affinity: target corpus has no bigrams")

    # combined (bigram, rcnt, tcnt) without an outer join: tag, union,
    # sum — absent target bigrams fold to tcnt = 0
    def tag(which: str):
        def fn(tb: pa.Table) -> pa.Table:
            c = tb.column("cnt")
            z = pa.array(np.zeros(tb.num_rows, dtype=np.int64), pa.int64())
            return pa.table(
                {
                    "bigram": tb.column("bigram"),
                    "rcnt": c if which == "r" else z,
                    "tcnt": c if which == "t" else z,
                }
            )

        return fn

    combined = grouped_agg(
        r.map_batches(tag("r"), batch_format="pyarrow").union(
            t.map_batches(tag("t"), batch_format="pyarrow")
        ),
        ["bigram"],
        {"rcnt": ("rcnt", "sum"), "tcnt": ("tcnt", "sum")},
        num_buckets=num_buckets,
    )

    joined = safe_join(
        per_doc,
        combined,
        join_type="inner",
        num_partitions=num_partitions,
        on=("bigram",),
    )

    def products(tb: pa.Table) -> pa.Table:
        cnt = tb.column("cnt").to_numpy(zero_copy_only=False)
        rc = tb.column("rcnt").to_numpy(zero_copy_only=False)
        tc = tb.column("tcnt").to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "doc_id": tb.column("doc_id"),
                "cnt": tb.column("cnt"),
                "pr": pa.array(cnt * rc, pa.int64()),
                "pt": pa.array(cnt * tc, pa.int64()),
            }
        )

    per_doc = grouped_agg(
        joined.map_batches(products, batch_format="pyarrow"),
        ["doc_id"],
        {
            "n_bigrams": ("cnt", "sum"),
            "aff_raw": ("pr", "sum"),
            "aff_target": ("pt", "sum"),
        },
        num_buckets=num_buckets,
    )

    def score(tb: pa.Table) -> pa.Table:
        ar = tb.column("aff_raw").to_numpy(zero_copy_only=False)
        at = tb.column("aff_target").to_numpy(zero_copy_only=False)
        # single division of exact int64 products; aff_raw >= n_bigrams
        # >= 1 for every emitted row, so the denominator is never 0
        s = (at * np.int64(raw_total)).astype(np.float64) / (
            ar * np.int64(target_total)
        ).astype(np.float64)
        return tb.append_column("score", pa.array(s, pa.float64()))

    return per_doc.map_batches(score, batch_format="pyarrow")
