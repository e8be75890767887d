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


def quota_mix(
    ds: rd.Dataset,
    key_col: str,
    group_col: str,
    weights: dict,
    total: int,
    salt: str = "",
) -> rd.Dataset:
    """EXACT-quota weighted mixing: group g receives exactly
    ``min(count_g, total * w_g // sum(w))`` rows — the data-mixing
    recipe step where the mixture proportions are a stated contract
    (e.g. "20% code, 30% wiki"), not an expected value.

    Selection within a group is the quota smallest rows by
    (md5(salt+key) first-8-hex value, key) — a rank, not a probability
    gate — so unlike ``stratified_sample`` the output SIZE is exact
    and still deterministic across runs, partitionings, and engines.
    Groups absent from ``weights`` contribute nothing.

    Scale shape: one tiny count aggregate (rows = #groups) fixes the
    integer quotas; then a grouped-top-k with PER-GROUP k — map-side
    prune caps each batch at quota_g rows per group before the bucket
    shuffle, so traffic is O(sum quotas * blocks) regardless of corpus
    size, and the final per-group head runs on pre-pruned buckets.
    """
    import numpy as np
    import pandas as pd

    from parallel_pagerank_ray.stages.agg import (
        bucket_of,
        grouped_agg,
        resolve_num_buckets,
    )
    from parallel_pagerank_ray.util import drop_empty_blocks

    if total < 0:
        raise ValueError("total must be >= 0")
    sum_w = sum(int(w) for w in weights.values())
    if sum_w <= 0:
        raise ValueError("weights must sum to a positive integer")

    def one(t: pa.Table) -> pa.Table:
        import numpy as _np

        return t.append_column(
            "__one", pa.array(_np.ones(len(t), dtype="int64"))
        )

    counts = grouped_agg(
        ds.select_columns([group_col]).map_batches(one, batch_format="pyarrow"),
        [group_col],
        {"c": ("__one", "sum")},
    ).take_all()
    quotas = {}
    for r in counts:
        g = r[group_col]
        w = int(weights.get(g, 0))
        if w > 0:
            quotas[g] = min(int(r["c"]), (total * w) // sum_w)
    num_buckets = resolve_num_buckets(ds)

    def rank_val(keys: "pd.Series") -> "np.ndarray":
        return np.array(
            [
                int(
                    hashlib.md5(
                        (salt + str(k)).encode("utf-8")
                    ).hexdigest()[:8],
                    16,
                )
                for k in keys
            ],
            dtype=np.int64,
        )

    def head_quota(df: "pd.DataFrame") -> "pd.DataFrame":
        df = df.sort_values(
            ["__rk", key_col], kind="stable"
        )
        kept = df.groupby(group_col, sort=False, group_keys=False).apply(
            lambda g: g.head(quotas.get(g.name, 0))
        )
        return kept.reset_index(drop=True)

    def partial(df: "pd.DataFrame") -> "pd.DataFrame":
        if len(df) == 0:
            return pd.DataFrame()
        df = df[df[group_col].isin(list(quotas))].copy()
        if len(df) == 0:
            return pd.DataFrame()
        df["__rk"] = rank_val(df[key_col])
        df = head_quota(df)
        if len(df) == 0:
            return pd.DataFrame()
        df["__b"] = bucket_of(df, [group_col], num_buckets)
        return df

    def final(g: "pd.DataFrame") -> "pd.DataFrame":
        out = head_quota(g.drop(columns="__b"))
        return out.drop(columns="__rk")

    return drop_empty_blocks(
        ds.select_columns([key_col, group_col])
        .map_batches(partial, batch_format="pandas")
        .groupby("__b")
        .map_groups(final, batch_format="pandas")
    )
