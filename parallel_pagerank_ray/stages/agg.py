"""Bucketed vectorized aggregation — the engine's shuffle workhorse.

Ray Data 2.49's ``groupby(keys).aggregate(...)`` materializes each key
group through a per-row Python path: measured locally, a 100k-row
single-key Sum takes ~24 s and grows with both rows and group count,
while a hash-bucket shuffle (``groupby(bucket)`` over ~32 distinct
values) followed by a vectorized pandas/numpy combine inside each
bucket handles 1M rows / 200k distinct keys in <1 s. Every
high-cardinality aggregation in this engine therefore runs as:

    map_batches: per-batch partial combine (map-side combiner)
               + deterministic hash bucket of the key columns
    groupby("__b"): the only wide shuffle — ~num_buckets groups
    map_groups:  vectorized final combine per bucket

This is also the explicit-partitioning story for 100 TB: the bucket
count is the partition count, the bucket function is stable across
stages (reuse one key -> co-partitioned stages), and a hot key only
ever costs one bucket (salt by appending a secondary column to
``keys`` when a single key group itself overflows a worker).

``global_agg`` does the same for whole-dataset scalars: per-batch
partial rows -> driver-side combine of a handful of rows (replacing
``Dataset.aggregate``'s per-row path). Partials are combined in sorted
order so results are independent of block arrival order.
"""

from __future__ import annotations

import math
from typing import Iterable, Mapping

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data as rd

from parallel_pagerank_ray.util import drop_empty_blocks

_HASH_KEY = "0123456789123456"  # fixed -> deterministic across processes

# spec: out_col -> (in_col, how); how in {"sum", "min", "max", "count"}
Spec = Mapping[str, tuple[str | None, str]]

# target bytes per shuffle bucket (one map_groups group = one worker's
# working set); override for tests / tuning via PPR_TARGET_BUCKET_BYTES
DEFAULT_TARGET_BUCKET_BYTES = 128 << 20


def resolve_num_buckets(
    ds: rd.Dataset, floor: int = 32, target_bytes: int | None = None
) -> int:
    """Scale the shuffle bucket count to the input size.

    A fixed bucket count means ~input_bytes/buckets lands in ONE
    map_groups group (one worker): fine at test scale, OOM at 100 TB.
    Returns ceil(size / target) clamped to [floor, 65536] when the size
    is knowable from metadata (Parquet reads, materialized datasets);
    falls back to ``floor`` when the size would require executing the
    plan (mid-pipeline transforms) — at scale, callers there either
    materialize first or pass an explicit count. Bucket count only
    affects parallelism, never results (deterministic key hash).
    """
    if target_bytes is None:
        import os

        target_bytes = int(
            os.environ.get("PPR_TARGET_BUCKET_BYTES", DEFAULT_TARGET_BUCKET_BYTES)
        )
    try:
        # metadata-only probe; Dataset.size_bytes() would execute the
        # plan when metadata is missing, which we must never do here
        size = ds._logical_plan.dag.infer_metadata().size_bytes
    except Exception:
        size = None
    if size is None:
        return floor
    return int(max(floor, min(65536, -(-size // target_bytes))))


def bucket_of(df: pd.DataFrame, keys: list[str], num_buckets: int) -> np.ndarray:
    h = pd.util.hash_pandas_object(df[keys], index=False, hash_key=_HASH_KEY)
    return (h % np.uint64(num_buckets)).astype(np.int64)


def _bucket_arrow(t: pa.Table, keys: list[str], num_buckets: int) -> pa.Array:
    """Deterministic bucket id per row of an Arrow table. Runs on the
    ALREADY-COLLAPSED partial (one row per distinct key in the batch),
    so the pandas conversion here touches only the small key columns."""
    h = pd.util.hash_pandas_object(
        t.select(keys).to_pandas(), index=False, hash_key=_HASH_KEY
    )
    return pa.array((h.to_numpy() % np.uint64(num_buckets)).astype(np.int64))


def _combine_arrow(t: pa.Table, keys: list[str], specs: Spec) -> pa.Table:
    """Vectorized groupby-combine on Arrow (Acero) — no pandas blocks.

    ``count`` means row count (count_all). Aggregates are algebraic
    (sum/min/max/count) over int/string columns in this engine, so
    result values are independent of within-group order.
    """
    aggs: list[tuple] = []
    produced: dict[str, str] = {}  # arrow output name -> out col
    count_outs: list[str] = []
    dup_outs: list[tuple[str, str]] = []  # (dup out name, source out name)
    for out, (col, how) in specs.items():
        if how == "count":
            count_outs.append(out)
        elif f"{col}_{how}" in produced:
            # two spec entries sharing (col, how): Arrow would emit two
            # columns with the SAME name and the rename would map both
            # to the last out — alias the duplicate off the first
            dup_outs.append((out, produced[f"{col}_{how}"]))
        else:
            aggs.append((col, how))
            produced[f"{col}_{how}"] = out
    if count_outs:
        aggs.append(([], "count_all"))
        produced["count_all"] = count_outs[0]
    g = t.group_by(keys, use_threads=False).aggregate(aggs)
    g = g.rename_columns([produced.get(n, n) for n in g.column_names])
    for extra in count_outs[1:]:
        g = g.append_column(extra, g.column(count_outs[0]))
    for extra, src in dup_outs:
        g = g.append_column(extra, g.column(src))
    # keys first, then spec columns (stable public layout)
    return g.select(keys + list(specs))


def grouped_agg(
    ds: rd.Dataset,
    keys: Iterable[str],
    specs: Spec,
    num_buckets: int | None = None,
) -> rd.Dataset:
    """Distributed groupby-aggregate, vectorized end to end.

    Output: one row per distinct key combo with the spec'd columns.
    ``count`` partials are summed in the final combine (algebraic
    aggregates only — sum/min/max/count).
    """
    keys = list(keys)
    if num_buckets is None:
        num_buckets = resolve_num_buckets(ds)
    final_specs: Spec = {
        out: (out, "sum" if how == "count" else how)
        for out, (_c, how) in specs.items()
    }

    def partial(t: pa.Table) -> pa.Table:
        r = _combine_arrow(t, keys, specs)
        return r.append_column("__b", _bucket_arrow(r, keys, num_buckets))

    def final(g: pa.Table) -> pa.Table:
        return _combine_arrow(g.drop_columns(["__b"]), keys, final_specs)

    out = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("__b")
        .map_groups(final, batch_format="pyarrow")
    )
    return drop_empty_blocks(out)


def distinct(
    ds: rd.Dataset, keys: Iterable[str], num_buckets: int | None = None
) -> rd.Dataset:
    """Distinct key combos (exact dedup) via the bucketed path."""
    keys = list(keys)
    if num_buckets is None:
        num_buckets = resolve_num_buckets(ds)

    def partial(t: pa.Table) -> pa.Table:
        r = t.select(keys).group_by(keys, use_threads=False).aggregate([])
        return r.append_column("__b", _bucket_arrow(r, keys, num_buckets))

    def final(g: pa.Table) -> pa.Table:
        t = g.drop_columns(["__b"])
        return t.group_by(keys, use_threads=False).aggregate([])

    out = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("__b")
        .map_groups(final, batch_format="pyarrow")
    )
    return drop_empty_blocks(out)


def grouped_topk(
    ds: rd.Dataset,
    group_cols: Iterable[str],
    order_cols: Iterable[str],
    ascending: Iterable[bool],
    k: int,
    num_buckets: int | None = None,
) -> rd.Dataset:
    """Top-k rows per group (window-rank semantics), bucketed.

    Map-side prune: each batch keeps at most k rows per group before the
    shuffle, so traffic is O(groups * k * blocks) regardless of row
    count. Deterministic when ``order_cols`` is a total order.
    """
    group_cols = list(group_cols)
    order_cols = list(order_cols)
    ascending = list(ascending)
    if num_buckets is None:
        num_buckets = resolve_num_buckets(ds)

    def topk(df: pd.DataFrame) -> pd.DataFrame:
        return (
            df.sort_values(order_cols, ascending=ascending, kind="stable")
            .groupby(group_cols, sort=False)
            .head(k)
        )

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        if len(df) == 0:
            return pd.DataFrame()
        r = topk(df)
        r = r.copy()
        r["__b"] = bucket_of(r, group_cols, num_buckets)
        return r

    def final(g: pd.DataFrame) -> pa.Table:
        return pa.Table.from_pandas(
            topk(g.drop(columns="__b")), preserve_index=False
        )

    out = (
        ds.map_batches(partial, batch_format="pandas")
        .groupby("__b")
        .map_groups(final, batch_format="pandas")
    )
    return drop_empty_blocks(out)


def pairs_within_groups(
    sort_keys: tuple[np.ndarray, ...],
    values: np.ndarray,
    max_group: int | None = None,
) -> tuple[np.ndarray, np.ndarray]:
    """All ordered pairs (values[i], values[j]) with i<j inside each run
    of equal group keys — fully vectorized (no per-group Python).

    sort_keys = (*group_keys, order_within_group); a group is a run of
    rows equal on EVERY group key (exact tuple equality — no folded
    composite hash, so distinct buckets never merge on a hash
    collision). Emitted pairs follow the within-group order. Used by
    triangle wedges and LSH-bucket pair generation.

    ``max_group``: the hub-skew guard — groups with MORE than this many
    rows emit NO pairs (the standard MinHash-LSH move for boilerplate
    fingerprints / templated-page buckets whose all-pairs output would
    be quadratic in the hub size). The drop rule is a pure function of
    group size, so a SQL oracle reproduces it with one HAVING clause.
    """
    *groups, sub = sort_keys
    order = np.lexsort((sub, *reversed(groups)))
    gss = [g[order] for g in groups]
    vs = values[order]
    n = len(vs)
    if n == 0:
        e = np.array([], dtype=values.dtype)
        return e, e
    new_run = np.zeros(n, dtype=bool)
    new_run[0] = True
    for gs in gss:
        new_run[1:] |= gs[1:] != gs[:-1]
    run_id = np.cumsum(new_run) - 1
    run_len = np.bincount(run_id)
    start = np.concatenate(([0], np.cumsum(run_len)[:-1]))
    local = np.arange(n) - start[run_id]
    rep = run_len[run_id] - local - 1  # each row pairs with the rows after it
    if max_group is not None:
        rep[run_len[run_id] > max_group] = 0  # hub groups: no pairs
    total = int(rep.sum())
    if total == 0:
        e = np.array([], dtype=values.dtype)
        return e, e
    a_pos = np.repeat(np.arange(n), rep)
    csum = np.concatenate(([0], np.cumsum(rep)[:-1]))
    b_off = np.arange(total) - np.repeat(csum, rep) + 1
    b_pos = a_pos + b_off
    return vs[a_pos], vs[b_pos]


def global_agg(ds: rd.Dataset, specs: Spec) -> dict[str, float | int]:
    """Whole-dataset scalar aggregates: per-batch partial rows combined
    driver-side in sorted order (deterministic w.r.t. block order).

    Returns {out_col: value}; sums of empty input are 0, min/max None.
    """
    cols = list(specs)

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        if len(df) == 0:
            return pd.DataFrame()
        row: dict[str, list] = {}
        for out, (col, how) in specs.items():
            if how == "count":
                row[out] = [len(df)]
            else:
                row[out] = [getattr(df[col], how)()]
        return pd.DataFrame(row)

    parts = ds.map_batches(partial, batch_format="pandas").take_all()
    if not parts:
        return {
            out: (0 if how in ("sum", "count") else None)
            for out, (_c, how) in specs.items()
        }
    pdf = pd.DataFrame(parts).sort_values(cols, kind="stable")
    result: dict[str, float | int] = {}
    for out, (_col, how) in specs.items():
        s = pdf[out]
        if how in ("sum", "count"):
            result[out] = s.sum()
        elif how == "min":
            result[out] = s.min()
        else:
            result[out] = s.max()
    return result


def grouped_exact_quantiles(
    ds: rd.Dataset,
    group_cols: "list[str]",
    col: str,
    qs: "list[float]",
    num_buckets: int | None = None,
) -> rd.Dataset:
    """Exact discrete quantiles PER GROUP: (group..., q, value) with
    DuckDB ``quantile_disc`` semantics — value at sorted index
    max(0, ceil(q * n) - 1) within the group.

    Fully distributed (unlike ``exact_quantiles``' driver walk): one
    bucketed grouped_agg builds the per-(group, value) histogram, then
    a per-group kernel walks each group's cumulative counts. Scale
    contract: one GROUP's distinct-value histogram fits a worker —
    bounded domains (prices-in-cents, lengths, degrees); pre-round or
    bucket unbounded columns first. Use binary-exact q values so
    ceil(q * n) has no cross-engine float rounding edge."""
    import math

    group_cols = list(group_cols)
    hist = grouped_agg(
        ds.select_columns(group_cols + [col]),
        group_cols + [col],
        {"cnt": (col, "count")},
        num_buckets=num_buckets,
    )

    def per_group(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(col, kind="stable")
        vals = g[col].to_numpy()
        cum = np.cumsum(g["cnt"].to_numpy().astype(np.int64))
        n = int(cum[-1])
        out = {c: np.repeat(g[c].iloc[:1].to_numpy(), len(qs)) for c in group_cols}
        out["q"] = np.array([float(q) for q in qs], dtype=np.float64)
        out["value"] = np.array(
            [
                int(vals[int(np.searchsorted(cum, max(0, math.ceil(q * n) - 1) + 1, "left"))])
                for q in qs
            ],
            dtype=np.int64,
        )
        return pd.DataFrame(out)

    from parallel_pagerank_ray.util import drop_empty_blocks as _deb

    return _deb(
        hist.groupby(group_cols).map_groups(per_group, batch_format="pandas")
    )


def exact_quantiles(
    ds: rd.Dataset, col: str, qs: list[float], num_buckets: int | None = None
) -> rd.Dataset:
    """Exact discrete quantiles of an integer column: (q, value) rows
    with DuckDB ``quantile_disc`` semantics — value at sorted index
    max(0, ceil(q * n) - 1).

    Histogram route: one bucketed grouped_agg counts occurrences per
    DISTINCT value, the driver sorts the (value, count) table and walks
    the cumulative counts. Scale assumption (documented, standard for
    histogram quantiles): the DISTINCT-value table fits the driver —
    bounded domains like prices-in-cents, lengths, degrees; for
    unbounded domains pre-round or bucket the column first. Use
    binary-exact q values (0.25, 0.5, 0.125, ...) so ceil(q * n) has no
    cross-engine float rounding edge.
    """
    import ray

    hist = grouped_agg(
        ds.select_columns([col]),
        [col],
        {"cnt": (col, "count")},
        num_buckets=num_buckets,
    )
    blocks = [
        (blk.column(col).to_numpy(), blk.column("cnt").to_numpy())
        for blk in ray.get(hist.materialize().to_arrow_refs())
        if blk.num_rows
    ]
    if not blocks:
        return rd.from_arrow(
            pa.table({"q": pa.array([], pa.float64()),
                      "value": pa.array([], pa.int64())})
        )
    vals = np.concatenate([v for v, _ in blocks])
    cnts = np.concatenate([c for _, c in blocks]).astype(np.int64)
    order = np.argsort(vals, kind="stable")
    vals, cnts = vals[order], cnts[order]
    cum = np.cumsum(cnts)
    n = int(cum[-1])
    out_q, out_v = [], []
    for q in qs:
        idx = max(0, math.ceil(q * n) - 1)
        pos = int(np.searchsorted(cum, idx + 1, "left"))
        out_q.append(float(q))
        out_v.append(int(vals[pos]))
    return rd.from_arrow(
        pa.table({"q": pa.array(out_q, pa.float64()),
                  "value": pa.array(out_v, pa.int64())})
    )


def grouped_xor(
    ds: rd.Dataset,
    key: str,
    col: str,
    num_buckets: int | None = None,
) -> rd.Dataset:
    """Distributed per-key bitwise-XOR fold (int64) — XOR is
    commutative/associative, so the result is order- and
    partitioning-independent like the algebraic aggregates. Two-level:
    per-batch reduceat partials, then the bucketed combine. Used by the
    cycle-space bridge sketch.
    """
    if num_buckets is None:
        num_buckets = resolve_num_buckets(ds)

    def combine(t: pa.Table) -> pa.Table:
        k = t.column(key).to_numpy(zero_copy_only=False)
        v = t.column(col).to_numpy(zero_copy_only=False).astype(np.int64)
        if not len(k):
            return pa.table(
                {key: pa.array([], pa.int64()), col: pa.array([], pa.int64())}
            )
        order = np.argsort(k, kind="stable")
        k, v = k[order], v[order]
        starts = np.flatnonzero(np.r_[True, k[1:] != k[:-1]])
        out = np.bitwise_xor.reduceat(v, starts)
        return pa.table(
            {key: pa.array(k[starts], pa.int64()),
             col: pa.array(out, pa.int64())}
        )

    def partial(t: pa.Table) -> pa.Table:
        r = combine(t)
        return r.append_column("__b", _bucket_arrow(r, [key], num_buckets))

    def final(g: pa.Table) -> pa.Table:
        return combine(g.drop_columns(["__b"]))

    return drop_empty_blocks(
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("__b")
        .map_groups(final, batch_format="pyarrow")
    )
