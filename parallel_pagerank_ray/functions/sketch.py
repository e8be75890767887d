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
import pandas as pd
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


# Count-min sketch params — SQL-safe affine chains (every product
# < 2^62 in int64/BIGINT; functions/hashing.py policy). d=4 rows.
CM_W = 2048
CM_PARAMS = (
    (1_000_003, 17),
    (999_983, 911),
    (1_000_033, 271_829),
    (999_979, 65_537),
)
_P31 = (1 << 31) - 1


def _cm_x(tokens) -> np.ndarray:
    """Per-token base hash x = md5_u64(token) % (2^31-1)."""
    return np.array(
        [
            int.from_bytes(hashlib.md5(t.encode("utf-8")).digest()[:8], "big")
            % _P31
            for t in tokens
        ],
        dtype=np.int64,
    )


def cm_positions(x: np.ndarray, w: int = CM_W) -> np.ndarray:
    """(len(x), d) counter positions: ((a_j*x + b_j) % (2^31-1)) % w."""
    x = np.asarray(x, dtype=np.int64)
    return np.stack(
        [((a * x + b) % _P31) % w for a, b in CM_PARAMS], axis=1
    )


def countmin_cells(docs, w: int = CM_W):
    """Count-min sketch of the corpus token stream: one (j, pos, c) row
    per NON-ZERO counter (zeros implicit; the dense sketch is d x w).

    Heavy-hitter shape: each batch pre-counts its tokens and folds them
    into per-(j,pos) partial counters — the shuffle moves at most
    d*w rows per batch regardless of batch token count — then one
    bucketed grouped_agg sums cells. The sketch size is a CONSTANT
    (d*w), so any consumer may hold the whole sketch; the corpus text
    never leaves the first map.
    """
    from parallel_pagerank_ray.functions.textstats import TOKEN_RE
    from parallel_pagerank_ray.stages.agg import grouped_agg

    d = len(CM_PARAMS)

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        toks = b["text"].astype(str).str.lower().str.findall(TOKEN_RE)
        arrs = [t for t in toks.to_numpy() if t]
        if not arrs:
            return pd.DataFrame(
                {
                    "j": pd.Series([], dtype=np.int64),
                    "pos": pd.Series([], dtype=np.int64),
                    "c": pd.Series([], dtype=np.int64),
                }
            )
        vc = pd.Series(np.concatenate(arrs)).value_counts()
        pos = cm_positions(_cm_x(vc.index.to_numpy()), w)  # (T, d)
        cnt = vc.to_numpy(dtype=np.int64)
        dense = np.zeros((d, w), dtype=np.int64)
        for j in range(d):
            np.add.at(dense[j], pos[:, j], cnt)
        jj, pp = np.nonzero(dense)
        return pd.DataFrame(
            {"j": jj.astype(np.int64), "pos": pp.astype(np.int64),
             "c": dense[jj, pp]}
        )

    parts = docs.select_columns(["text"]).map_batches(
        partial, batch_format="pandas"
    )
    return grouped_agg(parts, ["j", "pos"], {"c": ("c", "sum")})


def countmin_estimates(docs, tokens: list[str], w: int = CM_W):
    """(token, est) point queries against the corpus count-min sketch:
    est = min over the d rows of the token's counter — an upper bound
    on the true frequency (classic CM guarantee, tested). The sketch
    (<= d*w rows, a constant) is the only driver pull."""
    import ray.data as rd

    cells = countmin_cells(docs, w=w).to_pandas()
    d = len(CM_PARAMS)
    dense = np.zeros((d, w), dtype=np.int64)
    dense[cells["j"].to_numpy(), cells["pos"].to_numpy()] = cells[
        "c"
    ].to_numpy()
    pos = cm_positions(_cm_x(tokens), w)
    est = dense[np.arange(d)[None, :], pos].min(axis=1)
    return rd.from_arrow(
        pa.table(
            {
                "token": pa.array(tokens, pa.string()),
                "est": pa.array(est, pa.int64()),
            }
        )
    )


def table_checksum(ds, cols: list[str]):
    """Order-free integrity checksum of a table over integer columns:
    one row (n_rows, checksum) with

        checksum = sum over rows of H(row) mod 2^31-1,
        H(row)   = Horner fold of the columns mod 2^31-1
                   (multiplier 1000003, then one squaring round so
                   single-column tables don't collapse to a plain sum)

    The anti-entropy primitive: two replicas / a resumed write and its
    source compare one integer instead of shuffling rows; ADDITIVE mod
    p, so the reduce is order- and partition-free (bit-identical at
    any parallelism) and runs as per-batch partials + a driver fold of
    one integer per batch. SQL-reproducible (hashing-policy
    arithmetic)."""
    from parallel_pagerank_ray.stages.agg import global_agg

    P = _P31

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        h = np.zeros(len(b), dtype=np.int64)
        for c in cols:
            v = b[c].to_numpy().astype(np.int64) % P
            h = (h * 1_000_003 + v) % P
        h = (h * h + h) % P  # squaring round
        return pd.DataFrame(
            {
                "n_rows": pd.Series([np.int64(len(b))]),
                "checksum": pd.Series([np.int64(h.sum() % P)]),
            }
        )

    parts = ds.select_columns(cols).map_batches(
        partial, batch_format="pandas"
    )
    agg = global_agg(
        parts, {"n_rows": ("n_rows", "sum"), "checksum": ("checksum", "sum")}
    )
    return rd.from_arrow(
        pa.table(
            {
                "n_rows": pa.array(
                    [int(agg["n_rows"] or 0)], pa.int64()
                ),
                "checksum": pa.array(
                    [int(agg["checksum"] or 0) % _int(P)], pa.int64()
                ),
            }
        )
    )


def _int(x) -> int:
    return int(x)
