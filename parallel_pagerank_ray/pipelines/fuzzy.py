"""Edit-distance-1 self-join (FastSS deletion-neighborhood blocking).

The fuzzy-key primitive of entity resolution: all unordered pairs of
DISTINCT strings within Levenshtein distance 1 (one substitution,
insertion or deletion apart) — typo'd ids, off-by-one serials, OCR
slips. Pairwise comparison is quadratic in the vocabulary; the classic
FastSS blocking makes it linear: every string emits itself plus its
len(s) single-character-deletion variants as KEYS, and any two strings
within ED 1 provably share a key (equal: trivially; substitution:
delete the differing position from both; insert/delete: the shorter
string IS a deletion variant of the longer). Sharing a key only bounds
ED <= 2, so candidates get an exact vectorized ED<=1 verify:

  equal length L:   hamming distance <= 1  (a single same-length edit
                    can only be a substitution)
  length diff 1:    common-prefix + common-suffix >= len(shorter)
                    (the one-gap alignment)

Scale shape: one distinct pass over the values, one key-hash bucket
shuffle of the (key, string) table (the only wide step; key-group pair
generation is the LSH bucket kernel with the standard ``max_key_group``
hub cap), one distinct combine over candidate pairs, and a stateless
vectorized verify map. Variant generation is VOCABULARY-bounded (runs
over distinct strings, never the corpus) and each string's work is
O(len); the verify packs each candidate batch into uint8 matrices per
length class — no per-character Python in either hot kernel.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data as rd

from parallel_pagerank_ray.stages.agg import (
    distinct,
    pairs_within_groups,
    resolve_num_buckets,
)
from parallel_pagerank_ray.util import drop_empty_blocks


def _verify_ed1(s1: np.ndarray, s2: np.ndarray) -> np.ndarray:
    """Exact ED<=1 mask for candidate string pairs (ascii fast path,
    per-pair Python fallback only for non-ascii rows)."""
    out = np.zeros(len(s1), dtype=bool)
    if len(s1) == 0:
        return out
    l1 = np.fromiter((len(x) for x in s1), np.int64, len(s1))
    l2 = np.fromiter((len(x) for x in s2), np.int64, len(s2))

    def pack(strs, width):
        m = np.zeros((len(strs), width), dtype=np.uint8)
        for i, x in enumerate(strs):  # row loop; each row one memcpy
            b = x.encode("ascii", "replace").ljust(width, b"\0")
            m[i] = np.frombuffer(b, dtype=np.uint8)
        return m

    ascii_ok = np.fromiter(
        (x.isascii() and y.isascii() for x, y in zip(s1, s2)),
        bool,
        len(s1),
    )
    for la, lb in set(zip(l1.tolist(), l2.tolist())):
        grp = (l1 == la) & (l2 == lb) & ascii_ok
        if not grp.any():
            continue
        idx = np.flatnonzero(grp)
        if abs(la - lb) > 1:
            continue
        a = pack(s1[idx], max(la, 1))
        b = pack(s2[idx], max(lb, 1))
        if la == lb:
            out[idx] = (a != b).sum(axis=1) <= 1
        else:
            lo, hi = (a, b) if la < lb else (b, a)
            L = min(la, lb)
            if L == 0:
                out[idx] = True  # "" vs single char
                continue
            eq_pre = hi[:, :L] == lo[:, :L]
            pre = np.where(
                eq_pre.all(axis=1), L, eq_pre.argmin(axis=1)
            )
            eq_suf = hi[:, 1 : L + 1] == lo[:, :L]
            rev = eq_suf[:, ::-1]
            suf = np.where(rev.all(axis=1), L, rev.argmin(axis=1))
            out[idx] = pre + suf >= L
    # exact fallback for non-ascii candidates (rare by contract)
    for i in np.flatnonzero(~ascii_ok):
        a, b = s1[i], s2[i]
        if abs(len(a) - len(b)) > 1:
            continue
        if len(a) == len(b):
            out[i] = sum(x != y for x, y in zip(a, b)) <= 1
        else:
            lo, hi = (a, b) if len(a) < len(b) else (b, a)
            p = 0
            while p < len(lo) and lo[p] == hi[p]:
                p += 1
            out[i] = lo[p:] == hi[p + 1 :]
    return out


def edit1_join(
    values: rd.Dataset,
    column: str,
    num_buckets: int | None = None,
    max_key_group: int = 10_000,
) -> rd.Dataset:
    """All unordered pairs (s1 < s2) of distinct ``column`` strings at
    Levenshtein distance exactly <= 1 (distinct inputs, so always 1).
    ``max_key_group``: deletion-key groups larger than this emit no
    pairs (hub guard — a deterministic function of group size)."""
    from parallel_pagerank_ray.functions.hashing import md5_u64

    if num_buckets is None:
        num_buckets = resolve_num_buckets(values)
    toks = distinct(
        # pyarrow rename map (not Dataset.rename_columns): tolerant of
        # pandas-origin blocks, fused into the read
        values.map_batches(
            lambda t: pa.table({"s": t.column(column)}),
            batch_format="pyarrow",
        ),
        ["s"],
        num_buckets=num_buckets,
    )

    def variants(df: pd.DataFrame) -> pd.DataFrame:
        keys: list[str] = []
        owners: list[str] = []
        for s in df["s"].astype(str):
            keys.append(s)
            owners.append(s)
            for i in range(len(s)):
                keys.append(s[:i] + s[i + 1 :])
                owners.append(s)
        b = np.fromiter(
            (md5_u64(k) % num_buckets for k in keys), np.int64, len(keys)
        )
        return pd.DataFrame({"key": keys, "s": owners, "bucket": b})

    def pairs(g: pd.DataFrame) -> pd.DataFrame:
        # fixed-width unicode arrays: np.lexsort can't sort object dtype
        key = g["key"].to_numpy().astype(str)
        s = g["s"].to_numpy().astype(str)
        a, b = pairs_within_groups(
            (key, s),
            s,
            max_group=max_key_group,
        )
        if len(a) == 0:
            return pd.DataFrame({"s1": [], "s2": []}).astype(str)
        m = a != b  # same string via two different deletion keys
        return pd.DataFrame({"s1": a[m], "s2": b[m]})

    cand = distinct(
        toks.map_batches(variants, batch_format="pandas")
        .groupby("bucket")
        .map_groups(pairs, batch_format="pandas"),
        ["s1", "s2"],
        num_buckets=num_buckets,
    )

    def verify(df: pd.DataFrame) -> pd.DataFrame:
        s1 = df["s1"].to_numpy(dtype=object)
        s2 = df["s2"].to_numpy(dtype=object)
        m = _verify_ed1(s1, s2)
        return pd.DataFrame({"s1": s1[m], "s2": s2[m]})

    return drop_empty_blocks(cand.map_batches(verify, batch_format="pandas"))
