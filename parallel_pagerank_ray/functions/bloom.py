"""Bloom-filter membership against a reference corpus — the
incremental-dedup primitive for training-data pipelines (probe a new
shard against yesterday's corpus without shipping the corpus).

Beyond-reference capability. Everything is a pure function of the
corpus: keys are md5-u64 of the content, the k bit positions are fixed
affine chains mod 2^31-1 then mod m (every product < 2^62 — the same
arithmetic runs in DuckDB BIGINT, so membership INCLUDING the
deterministic false positives is value-checkable in SQL).

Scale shape: the build emits per-batch-distinct bit positions (≤ k
rows per distinct key, collapsed again by a bucketed distinct), then
packs one bitmap (np.packbits — m BITS, not bytes) on the driver and
ships it ONCE via ray.put — probes read it zero-copy. The mod-2^31-1
chain bounds m at 2^31-1 bits (enforced): a full-width filter is
256 MiB packed and serves ~150M keys at ~1% false-positive rate with
k=3; beyond that, partition the keyspace (e.g. by key hash) and build
one filter per partition.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray
import ray.data as rd

from parallel_pagerank_ray.functions.hashing import P31, md5_u64

# fixed affine hash family (SQL literals; multipliers < 2^20 keep every
# product < 2^51 in BIGINT/uint64)
BLOOM_A = (1_000_151, 1_000_121, 1_000_003)
BLOOM_B = (17, 53, 97)


def _keys_u64(texts: list) -> np.ndarray:
    return np.array(
        [md5_u64(t if isinstance(t, str) else t.decode("utf-8")) for t in texts],
        dtype=np.uint64,
    )


def bit_positions(keys: np.ndarray, m: int, k: int = 3) -> np.ndarray:
    """(len(keys), k) uint64 bit positions: ((x%p)*a_i + b_i) % p % m."""
    x = keys % P31
    out = np.empty((len(keys), k), dtype=np.uint64)
    for i in range(k):
        out[:, i] = (x * np.uint64(BLOOM_A[i]) + np.uint64(BLOOM_B[i])) % P31 % np.uint64(m)
    return out


def bloom_build(
    ds: rd.Dataset, text_col: str, m: int = 1 << 16, k: int = 3
) -> "BloomRef":
    """Build the bitmap over ``ds[text_col]`` (distributed position
    emission, bucketed distinct, one driver pack + ray.put)."""
    if k > len(BLOOM_A):
        raise ValueError(f"k <= {len(BLOOM_A)} supported (fixed hash family)")
    if not 0 < m <= int(P31):
        # positions are residues mod 2^31-1: a larger m would leave the
        # bits beyond 2^31-1 permanently dead (silent fp blowup)
        raise ValueError(f"m must be in (0, {int(P31)}] (mod-2^31-1 chain)")

    def emit(t: pa.Table) -> pa.Table:
        keys = _keys_u64(t.column(text_col).to_pylist())
        pos = np.unique(bit_positions(keys, m, k))
        return pa.table({"b": pos.astype(np.int64)})

    from parallel_pagerank_ray.stages.agg import distinct

    pos_ds = distinct(ds.map_batches(emit, batch_format="pyarrow"), ["b"])
    bits = np.zeros(m, dtype=bool)
    for blk in ray.get(pos_ds.to_arrow_refs()):
        if blk.num_rows:
            bits[blk.column("b").to_numpy()] = True
    # ship m BITS, not m bytes: packbits cuts the broadcast 8x
    return BloomRef(m=m, k=k, ref=ray.put(np.packbits(bits, bitorder="little")))


class BloomRef:
    """Handle to a built filter (bitmap in plasma, read zero-copy)."""

    def __init__(self, m: int, k: int, ref) -> None:
        self.m = m
        self.k = k
        self.ref = ref

    def probe(
        self,
        ds: rd.Dataset,
        text_col: str,
        keep: tuple[str, ...] = (),
        out_col: str = "maybe_in_corpus",
    ) -> rd.Dataset:
        """Add ``out_col`` (int64 0/1): 1 iff every bit position of the
        row's key is set — deterministic, including false positives."""
        m, k, ref = self.m, self.k, self.ref

        def probe_batch(t: pa.Table) -> pa.Table:
            packed = ray.get(ref)  # little-endian packed bit array
            keys = _keys_u64(t.column(text_col).to_pylist())
            if len(keys):
                pos = bit_positions(keys, m, k).astype(np.int64)
                hit = (
                    (packed[pos >> 3] >> (pos & 7).astype(np.uint8)) & 1
                ).astype(bool).all(axis=1)
            else:
                hit = np.zeros(0, dtype=bool)
            cols = {c: t.column(c) for c in keep}
            cols[out_col] = pa.array(hit.astype(np.int64), type=pa.int64())
            return pa.table(cols)

        return ds.map_batches(probe_batch, batch_format="pyarrow")
