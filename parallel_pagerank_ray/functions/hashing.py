"""Deterministic hashing primitives for dedup: shingles, MinHash,
SimHash, rolling fingerprints. Pure NumPy, fixed seeds — the same doc
always produces the same signature in any process, and the identical
arithmetic is expressible in DuckDB SQL (the value-check oracles in
__ray_entry__ reproduce every kernel exactly).
"""

from __future__ import annotations

import numpy as np

# SQL-reproducible modulus/multipliers: every product stays < 2^62, so
# the identical arithmetic runs in both numpy uint64 and DuckDB BIGINT
# (no wraparound anywhere) — the near-dup sketches become value-checkable
# against a DuckDB oracle.
P31 = np.uint64((1 << 31) - 1)  # Mersenne prime 2147483647
SHINGLE_R = np.uint64(1_000_003)
BAND_R1 = np.uint64(1_000_033)
BAND_R2 = np.uint64(1_000_037)


def shingle_hashes31(text: str, k: int = 5) -> np.ndarray:
    """One Horner codepoint hash mod 2^31-1 per k-char window position
    (positions 0..max(len-k, 0); a text shorter than k is one window,
    0-padded). Equals the DuckDB expression
    ``((...(ascii(substr(text,x,1)) * R + ascii(substr(text,x+1,1))) % p
    ...)`` per position — see __ray_entry__ oracle SQL. Duplicates are
    kept: MinHash minima are unaffected by multiplicity."""
    codes = np.frombuffer(text.encode("utf-32-le"), dtype=np.uint32).astype(
        np.uint64
    )
    if len(codes) < k:
        codes = np.pad(codes, (0, k - len(codes)))
    win = np.lib.stride_tricks.sliding_window_view(codes, k)
    h = np.zeros(len(win), dtype=np.uint64)
    for i in range(k):
        h = (h * SHINGLE_R + win[:, i]) % P31
    return h


def minhash_params31(num_perm: int, seed: int = 42) -> tuple[np.ndarray, np.ndarray]:
    """Permutation params a, b < 2^31-1 (SQL-safe products)."""
    rng = np.random.default_rng(seed)
    p = int(P31)
    a = rng.integers(1, p, size=num_perm, dtype=np.uint64)
    b = rng.integers(0, p, size=num_perm, dtype=np.uint64)
    return a, b


def minhash_signatures31(
    hash_lists: list[np.ndarray], a: np.ndarray, b: np.ndarray
) -> np.ndarray:
    """Batch MinHash: (D, num_perm) uint64, sig[d, j] = min over doc d's
    shingle hashes of (a_j * h + b_j) % (2^31-1). Vectorized across the
    whole batch — one in-place (mul, add, mod) pass plus a unit-stride
    segmented min per permutation; no per-doc Python loop, one S-sized
    temp total. (The per-perm row loop beats a (S, chunk) 2-D reduceat
    4x: axis-0 reduceat strides across rows, and the 2-D temps cost
    allocation bandwidth.) Every ``hash_lists`` entry must be non-empty
    (shingle_hashes31 guarantees >= 1 window)."""
    D = len(hash_lists)
    if D == 0:
        return np.empty((0, len(a)), dtype=np.uint64)
    lens = np.fromiter((len(h) for h in hash_lists), dtype=np.int64, count=D)
    flat = np.concatenate(hash_lists)
    starts = np.zeros(D, dtype=np.int64)
    np.cumsum(lens[:-1], out=starts[1:])
    sig = np.empty((len(a), D), dtype=np.uint64)
    vals = np.empty(len(flat), dtype=np.uint64)
    for j in range(len(a)):
        np.multiply(flat, a[j], out=vals)
        vals += b[j]
        vals %= P31
        sig[j, :] = np.minimum.reduceat(vals, starts)
    return np.ascontiguousarray(sig.T)


def band_keys31(sig: np.ndarray, bands: int) -> tuple[np.ndarray, np.ndarray]:
    """Fold each band's signature rows into TWO independent Horner keys
    mod 2^31-1 -> (D, bands) x2. Buckets are grouped on the exact
    (band, key1, key2) tuple; a cross-bucket collision needs both folds
    to collide (~2^-62)."""
    D, P = sig.shape
    r = P // bands
    folded = sig[:, : r * bands].reshape(D, bands, r)
    k1 = np.zeros((D, bands), dtype=np.uint64)
    k2 = np.zeros((D, bands), dtype=np.uint64)
    for i in range(r):
        k1 = (k1 * BAND_R1 + folded[:, :, i]) % P31
        k2 = (k2 * BAND_R2 + folded[:, :, i]) % P31
    return k1, k2


def winnow_select(h: np.ndarray, w: int) -> tuple[np.ndarray, np.ndarray]:
    """Winnowing fingerprint selection (Schleimer–Wilkerson–Aiken,
    SIGMOD'03 — the MOSS scheme): over every window of ``w``
    consecutive k-gram hashes select the minimum, RIGHTMOST position on
    ties; return the distinct selected (position, hash) pairs in
    position order. Guarantees a fingerprint in every length-(w+k-1)
    character span while storing ~2/(w+1) of the hashes. A sequence
    shorter than ``w`` is one window. Integer min is order-free, so the
    selection is trivially partition- and SQL-reproducible."""
    n = len(h)
    if n == 0:
        return np.array([], dtype=np.int64), np.array([], dtype=np.uint64)
    ww = min(w, n)
    win = np.lib.stride_tricks.sliding_window_view(h, ww)
    # rightmost argmin = (ww-1) - argmin of the reversed window
    am = (ww - 1) - win[:, ::-1].argmin(axis=1)
    pos = np.arange(len(win), dtype=np.int64) + am
    upos = np.unique(pos)
    return upos, h[upos]


def md5_u64(s: str) -> int:
    """First 8 md5 digest bytes, big-endian — equals DuckDB's
    ``CAST(('0x' || substr(md5(s), 1, 16)) AS UBIGINT)``."""
    import hashlib

    return int.from_bytes(hashlib.md5(s.encode("utf-8")).digest()[:8], "big")


def simhash_batch(token_lists: list[list[str]]) -> np.ndarray:
    """Batch 64-bit SimHash over md5-u64 token hashes: (D,) uint64.
    Bit b is set iff the +1/-1 vote sum over token OCCURRENCES is > 0;
    zero-token docs hash to 0. md5 runs once per distinct token in the
    batch (vocabulary, not occurrences); the vote tally is one reduceat.
    """
    D = len(token_lists)
    fp = np.zeros(D, dtype=np.uint64)
    if D == 0:
        return fp
    counts = np.fromiter((len(t) for t in token_lists), dtype=np.int64, count=D)
    nz = np.nonzero(counts)[0]
    if len(nz) == 0:
        return fp
    all_tokens = [t for lst in token_lists for t in lst]
    vocab, inv = np.unique(np.array(all_tokens, dtype=object), return_inverse=True)
    vh = np.array([md5_u64(t) for t in vocab], dtype=np.uint64)
    bits = ((vh[:, None] >> np.arange(64, dtype=np.uint64)) & np.uint64(1)).astype(
        np.int64
    )  # (V, 64)
    tb = bits[inv]  # (T, 64) occurrence bit rows
    nz_counts = counts[nz]
    starts = np.zeros(len(nz), dtype=np.int64)
    np.cumsum(nz_counts[:-1], out=starts[1:])
    sums = np.add.reduceat(tb, starts, axis=0)  # (Dnz, 64)
    votes = 2 * sums - nz_counts[:, None]
    fp[nz] = ((votes > 0).astype(np.uint64) << np.arange(64, dtype=np.uint64)).sum(
        axis=1
    )
    return fp


def hamming64(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    x = np.bitwise_xor(a.astype(np.uint64), b.astype(np.uint64))
    # popcount via unpackbits on the byte view
    return np.unpackbits(x.view(np.uint8).reshape(len(x), 8), axis=1).sum(axis=1)


