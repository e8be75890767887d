"""Deterministic hash-based sampling — the reproducible alternative to
``Dataset.random_sample`` for training-data pipelines: the same key is
always in or out of the sample, across runs, partitionings, and engines
(md5 is shared with the DuckDB oracle).
"""

from __future__ import annotations

import hashlib

import pyarrow as pa
import ray.data as rd


def _bucket(key: str, salt: str) -> int:
    h = hashlib.md5((salt + key).encode("utf-8")).hexdigest()
    return int(h[:8], 16) % 100


def hash_sample(
    ds: rd.Dataset, key_col: str, rate_pct: int, salt: str = ""
) -> rd.Dataset:
    """Keep rows whose md5(salt + str(key)) top-32-bits mod 100 < rate_pct.

    Stateless vectorizable filter (md5 runs at C speed per row); no
    shuffle, no RNG state — safe to re-run and to fan out.
    """

    def keep(t: pa.Table) -> pa.Table:
        keys = t.column(key_col).to_pylist()
        mask = pa.array([_bucket(str(k), salt) < rate_pct for k in keys])
        return t.filter(mask)

    return ds.map_batches(keep, batch_format="pyarrow")
