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


def balance_sources(
    ds: rd.Dataset,
    key_col: str = "doc_id",
    group_col: str = "source",
    salt: str = "",
) -> rd.Dataset:
    """Mixture balancing: deterministically downsample every group to
    (approximately) the smallest group's size — the measure-then-
    resample step that flattens a skewed source mix before training.

    Rates are integer percents ``floor(100 * min_count / count_g)``
    computed from ONE tiny count aggregate (rows = #groups, the only
    driver pull — bounded by the group cardinality contract), then
    applied as the same stateless md5 filter as ``stratified_sample``:
    membership depends only on the key, never on partitioning or RNG
    state, so the kept set is reproducible across engines and runs.
    """
    from parallel_pagerank_ray.stages.agg import grouped_agg

    def one(t: pa.Table) -> pa.Table:
        import numpy as np

        return t.append_column(
            "__one", pa.array(np.ones(len(t), dtype="int64"))
        )

    counts = grouped_agg(
        ds.select_columns([group_col]).map_batches(one, batch_format="pyarrow"),
        [group_col],
        {"c": ("__one", "sum")},
    ).take_all()
    if not counts:
        return ds.filter(lambda row: False)
    mn = min(int(r["c"]) for r in counts)
    rates = {r[group_col]: (100 * mn) // int(r["c"]) for r in counts}
    return stratified_sample(
        ds, key_col, group_col, rates, default_pct=0, salt=salt
    )


def split_corpus(
    ds: rd.Dataset,
    key_col: str,
    splits: tuple = (("train", 98), ("val", 1), ("test", 1)),
    salt: str = "",
) -> rd.Dataset:
    """Deterministic disjoint-and-exhaustive corpus split (the
    train/val/test assignment stage): the md5 bucket (same hash as
    ``hash_sample``) is carved into consecutive percent ranges, so
    every key lands in EXACTLY one split, stable across runs,
    partitionings, and engines — no leakage between splits by
    construction. Stateless map, no shuffle.

    ``splits`` is ((name, pct), ...) summing to 100.
    """
    if sum(p for _n, p in splits) != 100:
        raise ValueError("split_corpus: split percents must sum to 100")
    names, bounds, acc = [], [], 0
    for name, pct in splits:
        acc += pct
        names.append(name)
        bounds.append(acc)

    def assign(t: pa.Table) -> pa.Table:
        keys = t.column(key_col).to_pylist()
        out = []
        for k in keys:
            b = _bucket(str(k), salt)
            for name, hi in zip(names, bounds):
                if b < hi:
                    out.append(name)
                    break
        return t.append_column("split", pa.array(out, pa.string()))

    return ds.map_batches(assign, batch_format="pyarrow")
