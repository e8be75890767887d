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


def stratified_sample(
    ds: rd.Dataset,
    key_col: str,
    group_col: str,
    rates_pct: dict,
    default_pct: int = 0,
    salt: str = "",
) -> rd.Dataset:
    """Per-group deterministic sampling: a row whose group maps to rate
    r keeps iff md5(salt + str(key)) top-32-bits mod 100 < r. Groups
    absent from ``rates_pct`` use ``default_pct``.

    The training-data rebalancing primitive (e.g. downsample boilerplate
    sources, keep all curated ones) with the same reproducibility
    contract as ``hash_sample``: membership depends only on the key, not
    on partitioning, ordering, or RNG state. Stateless filter, no
    shuffle.
    """

    def keep(t: pa.Table) -> pa.Table:
        keys = t.column(key_col).to_pylist()
        groups = t.column(group_col).to_pylist()
        mask = pa.array(
            [
                _bucket(str(k), salt) < rates_pct.get(g, default_pct)
                for k, g in zip(keys, groups)
            ]
        )
        return t.filter(mask)

    return ds.map_batches(keep, batch_format="pyarrow")
