"""KMV (k-minimum-values) distinct-count sketch.

Beyond-reference capability: cardinality estimation for training-data
pipelines (how many distinct urls / orders / shingles) without a
global distinct shuffle. The k smallest 63-bit hash values of the
column determine the estimate (k-1) * 2^63 / kth_min (Bar-Yossef et
al. 2002 / Beyer et al. 2007 "distinct sampling").

Scale shape: each block contributes its local k smallest hashes (any
global k-minimum is a local k-minimum of its block), the driver merges
O(blocks * k) integers — no shuffle at all. The md5-derived hash and
the estimate's float64 arithmetic are reproduced exactly in DuckDB
(see __ray_entry__ oracle), so both the kth_min and the estimate are
value-checkable.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa
import ray
import ray.data as rd

_TWO63 = 9223372036854775808.0  # 2^63, exact in float64


def _h63(values: set[str]) -> np.ndarray:
    """63-bit md5 hash per distinct string — first 8 digest bytes
    big-endian, shifted right 1 (== DuckDB
    CAST(('0x'||substr(md5(v),1,16)) AS UBIGINT) >> 1)."""
    return np.array(
        sorted(
            int.from_bytes(hashlib.md5(v.encode("utf-8")).digest()[:8], "big") >> 1
            for v in values
        ),
        dtype=np.int64,
    )


def kmv_distinct(ds: rd.Dataset, col: str, k: int = 512) -> rd.Dataset:
    """Single-row Dataset: (k, n_kept, kth_min, n_distinct_est).

    Values hash by their string form (``CAST(v AS VARCHAR)`` in the
    oracle). Fewer than k distinct hashes -> the count is exact and
    reported as the estimate; kth_min is then the largest kept hash
    (0 on an empty input).
    """

    def partial(b: pa.Table) -> pa.Table:
        vals = {str(v) for v in b.column(col).to_pylist() if v is not None}
        return pa.table({"h": _h63(vals)[:k]})

    parts = ds.select_columns([col]).map_batches(partial, batch_format="pyarrow")
    chunks = [
        blk.column("h").to_numpy()
        for blk in ray.get(parts.materialize().to_arrow_refs())
    ]
    hs = np.unique(np.concatenate(chunks)) if chunks else np.array([], dtype=np.int64)
    n_kept = int(min(len(hs), k))
    if len(hs) >= k:
        kth = int(hs[k - 1])
        est = (k - 1) * _TWO63 / float(kth)
    else:
        kth = int(hs[-1]) if len(hs) else 0
        est = float(len(hs))
    return rd.from_arrow(
        pa.table(
            {
                "k": pa.array([k], type=pa.int64()),
                "n_kept": pa.array([n_kept], type=pa.int64()),
                "kth_min": pa.array([kth], type=pa.int64()),
                "n_distinct_est": pa.array([est], type=pa.float64()),
            }
        )
    )
