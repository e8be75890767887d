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


def _pack_matrix(strs: np.ndarray, width: int) -> np.ndarray:
    m = np.zeros((len(strs), max(width, 1)), dtype=np.uint8)
    for i, x in enumerate(strs):  # row loop; each row one memcpy
        b = x.encode("ascii", "replace").ljust(max(width, 1), b"\0")
        m[i] = np.frombuffer(b, dtype=np.uint8)
    return m


def _lev_band2(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """Exact Levenshtein <= 2 mask for same-length-class candidate
    matrices ``a`` (N, la) / ``b`` (N, lb) with |la - lb| <= 2: the
    classic banded DP (band width 5 = 2k+1), vectorized over the N
    axis — the j-loop runs over the 5 band offsets per row, so the
    whole verify is O(la * 5) numpy ops regardless of batch size.
    Distances saturate at 9 (int8-safe)."""
    N, la = a.shape
    lb = b.shape[1]
    INF = np.int8(9)
    prev = np.full((N, 5), INF, dtype=np.int8)
    for o in range(0, 3):  # row 0: D[0, j] = j, band slots o = j
        if o <= lb:
            prev[:, o + 2] = o
    for i in range(1, la + 1):
        cur = np.full((N, 5), INF, dtype=np.int8)
        for o in range(-2, 3):
            j = i + o
            if j < 0 or j > lb:
                continue
            best = np.full(N, INF, dtype=np.int8)
            if o + 1 <= 2:  # deletion from a: D[i-1, j] + 1
                best = np.minimum(best, prev[:, o + 3] + np.int8(1))
            if o - 1 >= -2 and j >= 1:  # insertion: D[i, j-1] + 1
                best = np.minimum(best, cur[:, o + 1] + np.int8(1))
            if j >= 1:  # match / substitution: D[i-1, j-1] + cost
                cost = (a[:, i - 1] != b[:, j - 1]).astype(np.int8)
                best = np.minimum(best, prev[:, o + 2] + cost)
            cur[:, o + 2] = np.minimum(best, INF)
        prev = cur
    return prev[:, (lb - la) + 2] <= 2


def _lev_py(a: str, b: str, k: int) -> bool:
    """Plain capped DP for the non-ascii fallback rows."""
    if abs(len(a) - len(b)) > k:
        return False
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i] + [0] * len(b)
        for j, cb in enumerate(b, 1):
            cur[j] = min(
                prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (ca != cb)
            )
        if min(cur) > k:
            return False
        prev = cur
    return prev[-1] <= k


def _verify_ed2(s1: np.ndarray, s2: np.ndarray) -> np.ndarray:
    """Exact ED <= 2 mask (banded-DP ascii fast path per length class;
    per-pair capped DP only for non-ascii rows)."""
    out = np.zeros(len(s1), dtype=bool)
    if len(s1) == 0:
        return out
    l1 = np.fromiter((len(x) for x in s1), np.int64, len(s1))
    l2 = np.fromiter((len(x) for x in s2), np.int64, len(s2))
    ascii_ok = np.fromiter(
        (x.isascii() and y.isascii() for x, y in zip(s1, s2)),
        bool,
        len(s1),
    )
    for la, lb in set(zip(l1.tolist(), l2.tolist())):
        if abs(la - lb) > 2:
            continue
        grp = (l1 == la) & (l2 == lb) & ascii_ok
        if not grp.any():
            continue
        idx = np.flatnonzero(grp)
        out[idx] = _lev_band2(
            _pack_matrix(s1[idx], la), _pack_matrix(s2[idx], lb)
        )
    for i in np.flatnonzero(~ascii_ok):
        out[i] = _lev_py(s1[i], s2[i], 2)
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


def edit2_join(
    values: rd.Dataset,
    column: str,
    num_buckets: int | None = None,
    max_key_group: int = 10_000,
) -> rd.Dataset:
    """All unordered pairs (s1 < s2) of distinct ``column`` strings
    within Levenshtein distance 2 — the two-deletion FastSS extension
    (VERDICT r4 item 5): every string emits its up-to-2-deletion
    neighborhood (deduplicated per string, O(len^2/2) keys), and any
    two strings with ED <= 2 provably share a key (Bocek et al. 2007:
    align the edit script; deleting the edited positions from both
    sides meets in a common subsequence reachable by <= 2 deletions
    from each). Sharing a key only bounds ED <= 4, so candidates get
    the exact vectorized banded-DP verify (``_lev_band2``).

    Scale shape: identical to ``edit1_join`` — one distinct pass over
    the vocabulary, one key-hash bucket shuffle (``max_key_group`` hub
    cap), one distinct candidate combine, one stateless verify map.
    Key volume per string is quadratic in length, so this operator is
    for SHORT fuzzy keys (ids, names, serials), the FastSS contract.
    """
    from parallel_pagerank_ray.functions.hashing import md5_u64

    if num_buckets is None:
        num_buckets = resolve_num_buckets(values)
    toks = distinct(
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
            d1 = {s[:i] + s[i + 1 :] for i in range(len(s))}
            vs = {s} | d1
            for t in d1:
                vs.update(t[:i] + t[i + 1 :] for i in range(len(t)))
            keys.extend(vs)
            owners.extend([s] * len(vs))
        b = np.fromiter(
            (md5_u64(k) % num_buckets for k in keys), np.int64, len(keys)
        )
        return pd.DataFrame({"key": keys, "s": owners, "bucket": b})

    def pairs(g: pd.DataFrame) -> pd.DataFrame:
        key = g["key"].to_numpy().astype(str)
        s = g["s"].to_numpy().astype(str)
        a, b = pairs_within_groups((key, s), s, max_group=max_key_group)
        if len(a) == 0:
            return pd.DataFrame({"s1": [], "s2": []}).astype(str)
        m = a != b
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
        m = _verify_ed2(s1, s2)
        return pd.DataFrame({"s1": s1[m], "s2": s2[m]})

    return drop_empty_blocks(cand.map_batches(verify, batch_format="pandas"))
