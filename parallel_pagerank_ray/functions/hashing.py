"""Deterministic hashing primitives for dedup: shingles, MinHash,
SimHash, rolling fingerprints. Pure NumPy, fixed seeds — the same doc
always produces the same signature in any process.
"""

from __future__ import annotations

import numpy as np

_MERSENNE = np.uint64((1 << 61) - 1)
_FNV_OFFSET = np.uint64(0xCBF29CE484222325)
_FNV_PRIME = np.uint64(0x100000001B3)


def char_shingles(text: str, k: int = 5) -> np.ndarray:
    """Distinct k-char shingle hashes (uint64) via vectorized FNV-1a."""
    b = np.frombuffer(text.encode("utf-8"), dtype=np.uint8)
    if len(b) < k:
        b = np.pad(b, (0, k - len(b)))
    # sliding windows (n-k+1, k)
    win = np.lib.stride_tricks.sliding_window_view(b, k)
    h = np.full(len(win), _FNV_OFFSET, dtype=np.uint64)
    with np.errstate(over="ignore"):
        for i in range(k):
            h ^= win[:, i].astype(np.uint64)
            h *= _FNV_PRIME
    return np.unique(h)


def token_hashes(tokens: list[str]) -> np.ndarray:
    """uint64 hash per token (SimHash features): blake2b-8 digest —
    C-speed per token, deterministic across processes (unlike built-in
    ``hash`` under PYTHONHASHSEED)."""
    import hashlib

    out = np.empty(len(tokens), dtype=np.uint64)
    for j, t in enumerate(tokens):
        out[j] = int.from_bytes(
            hashlib.blake2b(t.encode("utf-8"), digest_size=8).digest(), "little"
        )
    return out


def minhash_params(num_perm: int, seed: int = 42) -> tuple[np.ndarray, np.ndarray]:
    rng = np.random.default_rng(seed)
    a = rng.integers(1, (1 << 61) - 1, size=num_perm, dtype=np.uint64)
    b = rng.integers(0, (1 << 61) - 1, size=num_perm, dtype=np.uint64)
    return a, b


def minhash_signature(
    shingles: np.ndarray, a: np.ndarray, b: np.ndarray
) -> np.ndarray:
    """(num_perm,) uint64 signature: min over ((a*x+b) mod 2^61-1)."""
    if len(shingles) == 0:
        return np.zeros(len(a), dtype=np.uint64)
    with np.errstate(over="ignore"):
        # (S, P) — wraparound mult then mersenne mod keeps values uniform
        vals = (shingles[:, None] * a[None, :] + b[None, :]) % _MERSENNE
    return vals.min(axis=0)


def band_keys(sig: np.ndarray, bands: int) -> np.ndarray:
    """Fold the signature into ``bands`` uint64 bucket keys (LSH)."""
    rows = len(sig) // bands
    folded = sig[: rows * bands].reshape(bands, rows)
    h = np.full(bands, _FNV_OFFSET, dtype=np.uint64)
    with np.errstate(over="ignore"):
        for i in range(rows):
            h ^= folded[:, i]
            h *= _FNV_PRIME
    return h


def simhash(weights_hashes: np.ndarray) -> np.uint64:
    """64-bit SimHash from feature hashes (unit weights)."""
    if len(weights_hashes) == 0:
        return np.uint64(0)
    bits = (weights_hashes[:, None] >> np.arange(64, dtype=np.uint64)) & np.uint64(1)
    votes = bits.sum(axis=0) * 2 - len(weights_hashes)  # +1 / -1 tally
    out = np.uint64(0)
    for i in range(64):
        if votes[i] > 0:
            out |= np.uint64(1) << np.uint64(i)
    return out


def hamming64(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    x = np.bitwise_xor(a.astype(np.uint64), b.astype(np.uint64))
    # popcount via unpackbits on the byte view
    return np.unpackbits(x.view(np.uint8).reshape(len(x), 8), axis=1).sum(axis=1)


def jaccard(a: np.ndarray, b: np.ndarray) -> float:
    """Exact Jaccard of two distinct-hash sets (sorted unique arrays)."""
    inter = len(np.intersect1d(a, b, assume_unique=True))
    union = len(a) + len(b) - inter
    return inter / union if union else 1.0
