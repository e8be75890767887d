"""Relational operator parity: filter -> groupby-agg, join -> top-k, and
the table-derived edge lists the graph pipelines run on.

These exercise the generic Dataset operators (read-with-column-pruning,
filter, groupby-aggregate, hash join, sort+limit) against the TPC-H-ish
test tables; every query has an exact DuckDB oracle in __ray_entry__.

Monetary aggregates use integer cents (exact, order-independent) — see
pipelines/events.py.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data as rd

from parallel_pagerank_ray.pipelines.graph_build import dedup_edges
from parallel_pagerank_ray.util import drop_empty_blocks, safe_join


def read_table(sf_dir: str, name: str, columns: list[str] | None = None) -> rd.Dataset:
    """Column-pruned parquet read of one test table."""
    return rd.read_parquet(f"{sf_dir}/{name}.parquet", columns=columns)


def pricing_summary(lineitem: rd.Dataset, cutoff: str = "1998-09-02") -> rd.Dataset:
    """TPC-H Q1 shape: shipdate filter -> groupby(flag, status) sums.

    Output: (l_returnflag, l_linestatus, sum_qty_cents, sum_price_cents,
    n_rows), integer-exact.
    """
    cut = np.datetime64(cutoff + "T00:00:00", "us")

    def keyed(t: pa.Table) -> pa.Table:
        t = t.filter(pc.less_equal(t.column("l_shipdate"), pa.scalar(cut)))
        qty = pc.cast(pc.round(pc.multiply(t.column("l_quantity"), 100.0)), pa.int64())
        price = pc.cast(
            pc.round(pc.multiply(t.column("l_extendedprice"), 100.0)), pa.int64()
        )
        return pa.table(
            {
                "l_returnflag": t.column("l_returnflag"),
                "l_linestatus": t.column("l_linestatus"),
                "qty_cents": qty,
                "price_cents": price,
            }
        )

    from parallel_pagerank_ray.stages.agg import grouped_agg

    return grouped_agg(
        lineitem.select_columns(
            ["l_returnflag", "l_linestatus", "l_quantity", "l_extendedprice", "l_shipdate"]
        ).map_batches(keyed, batch_format="pyarrow"),
        ["l_returnflag", "l_linestatus"],
        {
            "sum_qty_cents": ("qty_cents", "sum"),
            "sum_price_cents": ("price_cents", "sum"),
            "n_rows": ("qty_cents", "count"),
        },
    )


def top_customers(
    orders: rd.Dataset, customer: rd.Dataset, k: int = 10, num_partitions: int = 8
) -> rd.Dataset:
    """orders ⋈ customer -> revenue per customer -> top-k.

    Output: (c_custkey, c_name, n_orders, revenue_cents), sorted by
    (revenue desc, custkey asc) — deterministic tie-break — limited to k.
    """

    def cents(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "o_custkey": t.column("o_custkey"),
                "cents": pc.cast(
                    pc.round(pc.multiply(t.column("o_totalprice"), 100.0)), pa.int64()
                ),
            }
        )

    from parallel_pagerank_ray.stages.agg import grouped_agg

    rev = grouped_agg(
        orders.select_columns(["o_custkey", "o_totalprice"]).map_batches(
            cents, batch_format="pyarrow"
        ),
        ["o_custkey"],
        {
            "n_orders": ("cents", "count"),
            "revenue_cents": ("cents", "sum"),
        },
    )
    joined = safe_join(
        rev,
        customer.select_columns(["c_custkey", "c_name"]),
        join_type="inner",
        num_partitions=num_partitions,
        on=("o_custkey",),
        right_on=("c_custkey",),
    )
    out = joined.sort(["revenue_cents", "o_custkey"], descending=[True, False]).limit(k)

    def project(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "c_custkey": df["o_custkey"].astype(np.int64),
                "c_name": df["c_name"],
                "n_orders": df["n_orders"].astype(np.int64),
                "revenue_cents": df["revenue_cents"].astype(np.int64),
            }
        )

    return out.map_batches(project, batch_format="pandas")


def revenue_by_nation(
    orders: rd.Dataset,
    customer: rd.Dataset,
    nation: rd.Dataset,
    region: rd.Dataset,
    num_partitions: int | None = None,
    broadcast_max: int = 5_000_000,
) -> rd.Dataset:
    """TPC-H Q5 shape: orders ⋈ customer ⋈ nation ⋈ region, revenue
    rolled up per nation. One row per nation with >= 1 ordering
    customer: (r_name, n_name, n_customers, n_orders, revenue_cents),
    integer-exact.

    The scale plan, not the naive one: revenue pre-aggregates per
    customer BELOW the join (the only big-big join ships one row per
    ordering customer, never per order), and the nation/region
    dimension tables (25 + 5 rows) attach via ONE broadcast dict —
    ``ray.put`` once, zero-copy lookup per batch — instead of two more
    shuffle joins.
    """
    import ray

    from parallel_pagerank_ray.stages.agg import grouped_agg

    if num_partitions is None:
        from parallel_pagerank_ray.pipelines.graph_build import (
            _default_join_partitions,
        )

        num_partitions = _default_join_partitions()

    def cents(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "o_custkey": t.column("o_custkey"),
                "cents": pc.cast(
                    pc.round(pc.multiply(t.column("o_totalprice"), 100.0)),
                    pa.int64(),
                ),
            }
        )

    rev = grouped_agg(
        orders.select_columns(["o_custkey", "o_totalprice"]).map_batches(
            cents, batch_format="pyarrow"
        ),
        ["o_custkey"],
        {"n_orders": ("cents", "count"), "cents": ("cents", "sum")},
    )
    # customer -> nationkey attach: broadcast while the customer table
    # is genuinely small side (<= broadcast_max rows; it is O(SF) —
    # 150M at sf1000, where the hash join below takes over). Same
    # guard contract as resolve_edges / distinct_parts_per_nation.
    from parallel_pagerank_ray.util import count_rows_once

    n_cust, cust = count_rows_once(
        customer.select_columns(["c_custkey", "c_nationkey"])
    )
    cidx = None
    if n_cust <= broadcast_max:
        ct = pa.concat_tables(ray.get(cust.to_arrow_refs()))
        cidx = pd.Index(ct.column("c_custkey").to_numpy())
        if not cidx.is_unique:
            # get_indexer requires unique keys; a duplicated custkey
            # must keep the hash-join's fan-out semantics, not crash
            cidx = None
    if cidx is not None:
        cmap_ref = ray.put((cidx, ct.column("c_nationkey").to_numpy()))

        def attach_nation(df: pd.DataFrame) -> pd.DataFrame:
            idx, v = ray.get(cmap_ref)
            pos = idx.get_indexer(df["o_custkey"].to_numpy())
            m = pos >= 0  # inner-join semantics: drop unknown custkeys
            out = df.loc[m].reset_index(drop=True)
            out["c_nationkey"] = v[pos[m]]
            return out

        cust_rev = rev.map_batches(attach_nation, batch_format="pandas")
    else:
        cust_rev = safe_join(
            rev,
            cust,
            join_type="inner",
            num_partitions=num_partitions,
            on=("o_custkey",),
            right_on=("c_custkey",),
        )
    per_nation = grouped_agg(
        cust_rev,
        ["c_nationkey"],
        {
            "n_customers": ("o_custkey", "count"),
            "n_orders": ("n_orders", "sum"),
            "revenue_cents": ("cents", "sum"),
        },
    )
    # dimension attach: nation ⋈ region is 25 x 5 rows — broadcast it
    ndf = nation.to_pandas().merge(
        region.to_pandas(), left_on="n_regionkey", right_on="r_regionkey"
    )
    dim_ref = ray.put(
        {
            int(k): (nm, rn)
            for k, nm, rn in zip(ndf["n_nationkey"], ndf["n_name"], ndf["r_name"])
        }
    )

    def attach(df: pd.DataFrame) -> pd.DataFrame:
        dim = ray.get(dim_ref)
        names = df["c_nationkey"].astype(np.int64).map(lambda k: dim[k])
        return pd.DataFrame(
            {
                "r_name": [t[1] for t in names],
                "n_name": [t[0] for t in names],
                "n_customers": df["n_customers"].astype(np.int64),
                "n_orders": df["n_orders"].astype(np.int64),
                "revenue_cents": df["revenue_cents"].astype(np.int64),
            }
        )

    return per_nation.map_batches(attach, batch_format="pandas")


def supplier_part_edges(sf_dir: str) -> rd.Dataset:
    """Directed bipartite edge table (src=l_suppkey, dst=l_partkey),
    deduplicated. Parts have no out-edges -> heavy dangling mass, the
    PageRank dangling-redistribution path under load."""
    li = read_table(sf_dir, "lineitem", columns=["l_suppkey", "l_partkey"])
    edges = li.rename_columns({"l_suppkey": "src", "l_partkey": "dst"})
    return dedup_edges(edges)


def copurchase_edges(
    sf_dir: str, num_buckets: int | None = None, dedup: bool = True
) -> rd.Dataset:
    """Undirected-canonical co-purchase graph: parts appearing in the
    same order, (src < dst), deduplicated.

    Implemented as ONE bucketed shuffle of (orderkey, partkey) rows +
    vectorized in-order pair generation (pairs_within_groups), replacing
    the order-key self-join (a full hash join materializing every
    cross-pair row was ~4x slower at sf0.1). Market-basket graphs are
    hub-skewed in PARTS but the shuffle key is the ORDER key, whose
    group size is the basket size — naturally bounded, no salt needed.
    """
    from parallel_pagerank_ray.stages.agg import (
        pairs_within_groups,
        resolve_num_buckets,
    )

    li = read_table(sf_dir, "lineitem", columns=["l_orderkey", "l_partkey"])
    if num_buckets is None:
        num_buckets = resolve_num_buckets(li)

    def bucketed(b: dict[str, np.ndarray]) -> dict[str, np.ndarray]:
        b["__b"] = (b["l_orderkey"] % num_buckets).astype(np.int64)
        return b

    def pairs(g: pd.DataFrame) -> pd.DataFrame:
        order = g["l_orderkey"].to_numpy()
        part = g["l_partkey"].to_numpy()
        # within each order, sorted parts -> all i<j pairs have a<=b
        a, b = pairs_within_groups((order, part), part)
        keep = a < b  # drop same-part repeats within an order
        # per-bucket pre-dedup: shrink the global-distinct shuffle input
        return pd.DataFrame({"src": a[keep], "dst": b[keep]}).drop_duplicates()

    out = (
        li.map_batches(bucketed, batch_format="numpy")
        .groupby("__b")
        .map_groups(pairs, batch_format="pandas")
    )
    # dedup=False skips the global-distinct shuffle for consumers that
    # are duplicate-invariant (CC min-label; triangles dedups internally
    # in _simple_undirected) — pairs are already per-bucket distinct
    return dedup_edges(out) if dedup else out


def coorder_pair_counts(
    sf_dir: str, num_buckets: int | None = None
) -> rd.Dataset:
    """Canonical co-purchase pair multiplicities: (src, dst, w) with
    src < dst and w = number of DISTINCT orders containing both parts
    — the wedge-count table of the bipartite order-part graph.

    Same single bucketed shuffle as ``copurchase_edges`` (order key ->
    basket-bounded groups, no hub salt needed); per-bucket the
    (order, pair) rows dedup exactly (an order lives in one bucket),
    then one grouped count per canonical pair. Shared by
    ``copurchase_weighted_edges`` (graph weights) and
    ``butterfly_stats`` / ``butterflies_per_part`` (K2,2 counting)."""
    from parallel_pagerank_ray.stages.agg import (
        grouped_agg,
        pairs_within_groups,
        resolve_num_buckets,
    )

    li = read_table(sf_dir, "lineitem", columns=["l_orderkey", "l_partkey"])
    if num_buckets is None:
        num_buckets = resolve_num_buckets(li)

    def bucketed(b: dict[str, np.ndarray]) -> dict[str, np.ndarray]:
        b["__b"] = (b["l_orderkey"] % num_buckets).astype(np.int64)
        return b

    def pairs(g: pd.DataFrame) -> pd.DataFrame:
        # dedup (order, part) FIRST: each canonical pair then appears
        # exactly once per order containing it, so the global count per
        # (src, dst) IS the distinct-order weight
        d0 = g[["l_orderkey", "l_partkey"]].drop_duplicates()
        order = d0["l_orderkey"].to_numpy()
        part = d0["l_partkey"].to_numpy()
        a, b = pairs_within_groups((order, part), part)
        keep = a < b
        return pd.DataFrame({"src": a[keep], "dst": b[keep]})

    per_order_pairs = (
        li.map_batches(bucketed, batch_format="numpy")
        .groupby("__b")
        .map_groups(pairs, batch_format="pandas")
    )
    return grouped_agg(
        per_order_pairs,
        ["src", "dst"],
        {"w": ("src", "count")},
        num_buckets=num_buckets,
    )


def copurchase_weighted_edges(
    sf_dir: str, num_buckets: int | None = None
) -> rd.Dataset:
    """Symmetric weighted co-purchase graph: (src, dst, w), w = number
    of DISTINCT orders containing both parts, each canonical pair
    emitted in both directions (undirected random-walk input for
    weighted PageRank). One bucketed shuffle + one grouped count via
    ``coorder_pair_counts``."""
    canon = coorder_pair_counts(sf_dir, num_buckets)

    def sym(t: pa.Table) -> pa.Table:
        import pyarrow.compute as _pc

        w = _pc.cast(t.column("w"), pa.float64())
        return pa.table(
            {
                "src": pa.concat_arrays(
                    [t.column("src").combine_chunks(),
                     t.column("dst").combine_chunks()]
                ),
                "dst": pa.concat_arrays(
                    [t.column("dst").combine_chunks(),
                     t.column("src").combine_chunks()]
                ),
                "w": pa.concat_arrays([w.combine_chunks(), w.combine_chunks()]),
            }
        )

    return canon.map_batches(sym, batch_format="pyarrow")


def _append_bf(t: pa.Table) -> pa.Table:
    """Per-pair butterfly contribution C(w, 2): each pair of distinct
    orders sharing the same part pair closes one K2,2 rectangle."""
    w = t.column("w").to_numpy(zero_copy_only=False).astype(np.int64)
    return t.append_column("bf", pa.array(w * (w - 1) // 2, pa.int64()))


def butterfly_stats(
    sf_dir: str, num_buckets: int | None = None
) -> rd.Dataset:
    """Global butterfly (K2,2) census of the bipartite order-part graph
    (the bipartite analogue of triangle counting, the motif behind
    bipartite clustering coefficients). One row:

        n_part_pairs   -- part pairs sharing >= 1 order
        n_coorders     -- wedges: (order, part-pair) incidences
        n_butterflies  -- sum over part pairs C(w, 2)

    Scale shape: the per-pair table is bounded by sum C(basket, 2)
    (basket-bounded groups — the same bound copurchase_edges relies
    on); only three scalars reach the driver via global_agg's
    per-block partials."""
    from parallel_pagerank_ray.stages.agg import global_agg

    canon = coorder_pair_counts(sf_dir, num_buckets).map_batches(
        _append_bf, batch_format="pyarrow"
    )
    tot = global_agg(
        canon,
        {
            "n_part_pairs": ("w", "count"),
            "n_coorders": ("w", "sum"),
            "n_butterflies": ("bf", "sum"),
        },
    )
    return rd.from_items([{k: int(v) for k, v in tot.items()}])


def butterflies_per_part(
    sf_dir: str, k: int = 20, num_buckets: int | None = None
) -> rd.Dataset:
    """Top-k parts by butterfly participation b(p) = sum_q C(w(p,q), 2)
    — the per-vertex butterfly support on the part side, deterministic
    order (n_butterflies desc, part asc). Output: (part, n_butterflies).

    Scale shape: explode each canonical pair to both endpoints (2 rows)
    -> one bucketed grouped sum keyed on part -> global top-k sort of
    the per-part table (|parts| rows, not |pairs|)."""
    from parallel_pagerank_ray.stages.agg import grouped_agg

    canon = coorder_pair_counts(sf_dir, num_buckets).map_batches(
        _append_bf, batch_format="pyarrow"
    )

    def explode(t: pa.Table) -> pa.Table:
        bf = t.column("bf").combine_chunks()
        return pa.table(
            {
                "part": pa.concat_arrays(
                    [
                        t.column("src").combine_chunks(),
                        t.column("dst").combine_chunks(),
                    ]
                ),
                "bf": pa.concat_arrays([bf, bf]),
            }
        )

    per = grouped_agg(
        canon.map_batches(explode, batch_format="pyarrow"),
        ["part"],
        {"n_butterflies": ("bf", "sum")},
    )
    return per.sort(
        ["n_butterflies", "part"], descending=[True, False]
    ).limit(k)


def range_join(
    points: rd.Dataset,
    intervals: rd.Dataset,
    val_col: str,
    lo_col: str,
    hi_col: str,
    point_id: str,
    interval_id: str,
    bucket_width_cents: int = 10_000,
) -> rd.Dataset:
    """Interval-overlap join: (interval_id, point_id) for every point
    with ``lo <= val <= hi`` (float comparisons, same semantics as SQL
    BETWEEN). Ray Data has no range join; this is the standard bucketed
    composition: intervals replicate to every fixed-width value bucket
    they overlap (vectorized), points land in one bucket, ONE shuffle
    co-locates candidates, and each bucket does a bounded vectorized
    containment test. Values are bucketed by integer cents so bucket
    assignment is exact for 2-decimal data; the membership test itself
    stays float. Partitioning assumption: interval spans are bounded
    relative to the bucket width (occupancy per bucket fits a worker).
    """
    W = np.int64(bucket_width_cents)

    def interval_rows(df: pd.DataFrame) -> pd.DataFrame:
        lo = df[lo_col].to_numpy(dtype=np.float64)
        hi = df[hi_col].to_numpy(dtype=np.float64)
        ids = df[interval_id].to_numpy()
        b0 = np.round(lo * 100.0).astype(np.int64) // W
        b1 = np.round(hi * 100.0).astype(np.int64) // W
        reps = np.maximum(b1 - b0 + 1, 0)
        idx = np.repeat(np.arange(len(ids)), reps)
        csum = np.concatenate(([0], np.cumsum(reps)[:-1]))
        local = np.arange(int(reps.sum())) - np.repeat(csum, reps)
        return pd.DataFrame(
            {
                "bucket": b0[idx] + local,
                "kind": np.zeros(len(idx), dtype=np.int64),
                "id": ids[idx],
                "lo": lo[idx],
                "hi": hi[idx],
            }
        )

    def point_rows(df: pd.DataFrame) -> pd.DataFrame:
        v = df[val_col].to_numpy(dtype=np.float64)
        return pd.DataFrame(
            {
                "bucket": np.round(v * 100.0).astype(np.int64) // W,
                "kind": np.ones(len(v), dtype=np.int64),
                "id": df[point_id].to_numpy(),
                "lo": v,
                "hi": v,
            }
        )

    msgs = intervals.map_batches(interval_rows, batch_format="pandas").union(
        points.map_batches(point_rows, batch_format="pandas")
    )

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        im = g["kind"].to_numpy() == 0
        ilo = g["lo"].to_numpy()[im]
        ihi = g["hi"].to_numpy()[im]
        iid = g["id"].to_numpy()[im]
        pm = ~im
        pv = g["lo"].to_numpy()[pm]
        pid = g["id"].to_numpy()[pm]
        if not len(iid) or not len(pid):
            return pd.DataFrame(
                {
                    interval_id: np.array([], dtype=np.int64),
                    point_id: np.array([], dtype=np.int64),
                }
            )
        m = (pv[None, :] >= ilo[:, None]) & (pv[None, :] <= ihi[:, None])
        ii, pp = np.nonzero(m)
        return pd.DataFrame({interval_id: iid[ii], point_id: pid[pp]})

    out = msgs.groupby("bucket").map_groups(per_bucket, batch_format="pandas")
    return drop_empty_blocks(out)


def distinct_parts_per_nation(
    lineitem: rd.Dataset,
    supplier: rd.Dataset,
    nation: rd.Dataset,
    num_buckets: int | None = None,
    broadcast_max: int = 5_000_000,
) -> rd.Dataset:
    """COUNT(DISTINCT) by group at scale: distinct parts ever shipped
    by each nation's suppliers — (n_name, n_parts), integer-exact.

    Shape: per-batch distinct (suppkey, partkey) pairs first (map-side
    combine), ONE bucketed global distinct, then the supplier->nation
    map (10^4 rows) and nation names (25 rows) attach via broadcast
    lookups — the naive plan's two shuffle joins never happen, and no
    stage ever materializes per-occurrence rows past the first map.
    """
    import ray

    from parallel_pagerank_ray.stages.agg import distinct, grouped_agg

    pairs = distinct(
        lineitem.select_columns(["l_suppkey", "l_partkey"]),
        ["l_suppkey", "l_partkey"],
        num_buckets=num_buckets,
    )
    # supplier->nation attach: the supplier table is O(SF) rows (10M at
    # sf1000) — broadcast the dict only while it is genuinely small
    # side, else hash-join (same guard contract as resolve_edges)
    from parallel_pagerank_ray.util import count_rows_once

    n_sup, supplier = count_rows_once(supplier)
    if n_sup <= broadcast_max:
        sup = pa.concat_tables(ray.get(supplier.to_arrow_refs()))
        sup_map: dict[int, int] = dict(
            zip(
                sup.column("s_suppkey").to_pylist(),
                sup.column("s_nationkey").to_pylist(),
            )
        )
        sup_ref = ray.put(sup_map)

        def to_nation(df: pd.DataFrame) -> pd.DataFrame:
            lookup = ray.get(sup_ref)
            return pd.DataFrame(
                {
                    "nationkey": df["l_suppkey"].map(lookup).astype(np.int64),
                    "l_partkey": df["l_partkey"].to_numpy(),
                }
            )

        keyed = pairs.map_batches(to_nation, batch_format="pandas")
    else:
        from parallel_pagerank_ray.pipelines.graph_build import (
            _default_join_partitions,
        )
        from parallel_pagerank_ray.util import safe_join

        def _cast64(t: pa.Table) -> pa.Table:
            # match the broadcast path's int64 nationkey so the output
            # schema never depends on which side of the guard ran
            i = t.schema.get_field_index("nationkey")
            return t.set_column(
                i, "nationkey", pc.cast(t.column("nationkey"), pa.int64())
            )

        keyed = safe_join(
            pairs,
            supplier.select_columns(["s_suppkey", "s_nationkey"]),
            join_type="inner",
            num_partitions=_default_join_partitions(),
            on=("l_suppkey",),
            right_on=("s_suppkey",),
        ).rename_columns({"s_nationkey": "nationkey"}).select_columns(
            ["nationkey", "l_partkey"]
        ).map_batches(_cast64, batch_format="pyarrow")

    nk_pairs = distinct(
        keyed,
        ["nationkey", "l_partkey"],
        num_buckets=num_buckets,
    )
    counts = grouped_agg(
        nk_pairs,
        ["nationkey"],
        {"n_parts": ("l_partkey", "count")},
        num_buckets=8,
    )
    nat = pa.concat_tables(ray.get(nation.to_arrow_refs()))
    names = dict(
        zip(nat.column("n_nationkey").to_pylist(), nat.column("n_name").to_pylist())
    )
    names_ref = ray.put(names)

    def attach(df: pd.DataFrame) -> pd.DataFrame:
        lookup = ray.get(names_ref)
        return pd.DataFrame(
            {
                "n_name": df["nationkey"].map(lookup),
                "n_parts": df["n_parts"].astype(np.int64),
            }
        )

    return counts.map_batches(attach, batch_format="pandas")


def daily_type_pivot(events: rd.Dataset, types: list[str] | None = None) -> rd.Dataset:
    """Pivot (conditional aggregation): one row per day with a count
    column per event type plus the total — ``count(*) FILTER (WHERE
    event_type = t)`` for a FIXED type vocabulary (a pivot's output
    schema must be static; unknown types land in nothing but the
    total). Output: (day, n_<type>..., n_total), integer-exact.

    Scale shape: the indicator columns are built vectorized in the map
    stage, so the single bucketed groupby ships one int64 row per
    (batch, day) — never raw events; no per-type scan."""
    if types is None:
        types = ["click", "error", "purchase", "signup", "view"]

    from parallel_pagerank_ray.stages.agg import grouped_agg

    def keyed(df: pd.DataFrame) -> pd.DataFrame:
        et = df["event_type"].to_numpy()
        out = {"day": df["ts"].dt.floor("D")}
        for t in types:
            out[f"n_{t}"] = (et == t).astype(np.int64)
        out["n_total"] = np.ones(len(df), dtype=np.int64)
        return pd.DataFrame(out)

    return grouped_agg(
        events.select_columns(["ts", "event_type"]).map_batches(
            keyed, batch_format="pandas"
        ),
        ["day"],
        {f"n_{t}": (f"n_{t}", "sum") for t in types}
        | {"n_total": ("n_total", "sum")},
    )


def pricing_rollup(
    lineitem: rd.Dataset, cutoff: str = "1998-09-02", cube: bool = False
) -> rd.Dataset:
    """GROUP BY ROLLUP(l_returnflag, l_linestatus): the finest level
    plus per-flag subtotals plus the grand total, NULL-filled like SQL.
    ``cube=True`` adds the per-status margin (GROUP BY CUBE).
    Output: (l_returnflag, l_linestatus, sum_qty_cents, n_rows).

    Scale shape — hierarchical re-aggregation, the only sane ROLLUP
    plan at 100 TB: the raw table is aggregated ONCE to the finest
    grouping (a few dozen rows); every coarser level re-aggregates
    that tiny result, so adding rollup levels costs nothing extra on
    the big side."""
    finest = pricing_summary(lineitem, cutoff=cutoff).materialize()

    from parallel_pagerank_ray.stages.agg import grouped_agg

    def fine(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "l_returnflag": t.column("l_returnflag"),
                "l_linestatus": t.column("l_linestatus"),
                "sum_qty_cents": t.column("sum_qty_cents"),
                "n_rows": t.column("n_rows"),
            }
        )

    by_flag = grouped_agg(
        finest,
        ["l_returnflag"],
        {"sum_qty_cents": ("sum_qty_cents", "sum"), "n_rows": ("n_rows", "sum")},
        num_buckets=1,
    )

    def null_status(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "l_returnflag": t.column("l_returnflag"),
                "l_linestatus": pa.nulls(len(t), pa.string()),
                "sum_qty_cents": t.column("sum_qty_cents"),
                "n_rows": t.column("n_rows"),
            }
        )

    margins = [by_flag.map_batches(null_status, batch_format="pyarrow")]
    if cube:
        by_status = grouped_agg(
            finest,
            ["l_linestatus"],
            {"sum_qty_cents": ("sum_qty_cents", "sum"), "n_rows": ("n_rows", "sum")},
            num_buckets=1,
        )

        def null_flag(t: pa.Table) -> pa.Table:
            return pa.table(
                {
                    "l_returnflag": pa.nulls(len(t), pa.string()),
                    "l_linestatus": t.column("l_linestatus"),
                    "sum_qty_cents": t.column("sum_qty_cents"),
                    "n_rows": t.column("n_rows"),
                }
            )

        margins.append(by_status.map_batches(null_flag, batch_format="pyarrow"))

    from parallel_pagerank_ray.stages.agg import global_agg

    tot = global_agg(
        finest,
        {"sum_qty_cents": ("sum_qty_cents", "sum"), "n_rows": ("n_rows", "sum")},
    )
    grand = rd.from_arrow(
        pa.table(
            {
                "l_returnflag": pa.nulls(1, pa.string()),
                "l_linestatus": pa.nulls(1, pa.string()),
                "sum_qty_cents": pa.array(
                    [int(tot["sum_qty_cents"] or 0)], pa.int64()
                ),
                "n_rows": pa.array([int(tot["n_rows"] or 0)], pa.int64()),
            }
        )
    )
    out = finest.map_batches(fine, batch_format="pyarrow")
    for m in margins:
        out = out.union(m)
    return out.union(grand)


def pricing_cube(lineitem: rd.Dataset, cutoff: str = "1998-09-02") -> rd.Dataset:
    """GROUP BY CUBE(l_returnflag, l_linestatus): every grouping-set
    margin of the pricing summary, NULL-filled like SQL. Same
    hierarchical re-aggregation shape as the ROLLUP — the extra
    per-status level re-aggregates the few-dozen-row finest result,
    never the raw table, so the 2^k grouping sets of a CUBE cost one
    big-side aggregate total."""
    return pricing_rollup(lineitem, cutoff=cutoff, cube=True)


def parts_intersect_except(
    lineitem: rd.Dataset,
    supplier: rd.Dataset,
    nation_a: int = 0,
    nation_b: int = 1,
    nation_c: int = 2,
    num_buckets: int | None = None,
    broadcast_max: int = 5_000_000,
) -> rd.Dataset:
    """Distributed set algebra over shipment facts: parts shipped by
    BOTH nation_a's and nation_b's suppliers EXCEPT any part shipped
    by nation_c's — SQL INTERSECT/EXCEPT, output (p_partkey),
    integer-exact.

    Shape: per-batch distinct (suppkey, partkey) pairs first, the
    relevant suppliers (three nations' worth) attach through the
    standard broadcast guard, then ONE bucketed groupby folds
    per-part presence indicators (max) and a stateless filter applies
    the set expression — the three operand sets and their
    intersections never materialize separately, and nothing ships
    per-occurrence rows."""
    import ray

    from parallel_pagerank_ray.stages.agg import distinct, grouped_agg
    from parallel_pagerank_ray.util import count_rows_once

    pairs = distinct(
        lineitem.select_columns(["l_suppkey", "l_partkey"]),
        ["l_suppkey", "l_partkey"],
        num_buckets=num_buckets,
    )
    nat = (int(nation_a), int(nation_b), int(nation_c))

    def keep(t: pa.Table) -> pa.Table:
        # fixed metadata-free schema: blocks of a filtered projection
        # must concat cleanly on the broadcast path
        nk = pc.cast(t.column("s_nationkey"), pa.int64())
        t = pa.table(
            {
                "s_suppkey": pc.cast(t.column("s_suppkey"), pa.int64()),
                "s_nationkey": nk,
            }
        )
        return t.filter(
            pc.is_in(
                t.column("s_nationkey"), value_set=pa.array(list(nat), pa.int64())
            )
        )

    sup3 = supplier.select_columns(["s_suppkey", "s_nationkey"]).map_batches(
        keep, batch_format="pyarrow"
    )
    n_sup, sup3 = count_rows_once(sup3)
    if n_sup <= broadcast_max:
        # zero-row blocks of a filtered projection come back schema-less
        # (Ray 2.49) — drop them before the concat
        parts = [t for t in ray.get(sup3.to_arrow_refs()) if t.num_rows]
        tbl = pa.concat_tables(parts) if parts else None
        lookup: dict[int, int] = (
            dict(
                zip(
                    tbl.column("s_suppkey").to_pylist(),
                    tbl.column("s_nationkey").to_pylist(),
                )
            )
            if tbl is not None
            else {}
        )
        ref = ray.put(lookup)

        def ind(df: pd.DataFrame) -> pd.DataFrame:
            nk = df["l_suppkey"].map(ray.get(ref)).to_numpy(dtype=np.float64,
                                                            na_value=np.nan)
            out = pd.DataFrame(
                {
                    "l_partkey": df["l_partkey"].to_numpy(),
                    "in_a": (nk == nat[0]).astype(np.int64),
                    "in_b": (nk == nat[1]).astype(np.int64),
                    "in_c": (nk == nat[2]).astype(np.int64),
                }
            )
            # rows from other nations contribute nothing — drop before
            # the shuffle
            m = (out["in_a"] | out["in_b"] | out["in_c"]).to_numpy() > 0
            return out[m]

        keyed = pairs.map_batches(ind, batch_format="pandas")
    else:  # pragma: no cover - exercised via forced-tiny-bound test
        from parallel_pagerank_ray.pipelines.graph_build import (
            _default_join_partitions,
        )
        from parallel_pagerank_ray.util import safe_join

        j = safe_join(
            pairs,
            sup3,
            join_type="inner",
            num_partitions=_default_join_partitions(),
            on=("l_suppkey",),
            right_on=("s_suppkey",),
        )

        def ind_join(df: pd.DataFrame) -> pd.DataFrame:
            nk = df["s_nationkey"].to_numpy()
            return pd.DataFrame(
                {
                    "l_partkey": df["l_partkey"].to_numpy(),
                    "in_a": (nk == nat[0]).astype(np.int64),
                    "in_b": (nk == nat[1]).astype(np.int64),
                    "in_c": (nk == nat[2]).astype(np.int64),
                }
            )

        keyed = j.map_batches(ind_join, batch_format="pandas")
    agg = grouped_agg(
        keyed,
        ["l_partkey"],
        {
            "in_a": ("in_a", "max"),
            "in_b": ("in_b", "max"),
            "in_c": ("in_c", "max"),
        },
        num_buckets=num_buckets,
    )

    def pick(t: pa.Table) -> pa.Table:
        m = pc.and_(
            pc.and_(
                pc.equal(t.column("in_a"), 1), pc.equal(t.column("in_b"), 1)
            ),
            pc.equal(t.column("in_c"), 0),
        )
        return pa.table(
            {"p_partkey": pc.cast(t.filter(m).column("l_partkey"), pa.int64())}
        )

    return agg.map_batches(pick, batch_format="pyarrow")


def frequent_triples(
    baskets: rd.Dataset,
    strong_pairs: rd.Dataset,
    min_support: int = 2,
    num_partitions: int | None = None,
    num_buckets: int | None = None,
    broadcast_max_triples: int = 5000,
) -> rd.Dataset:
    """Clique-pruned Apriori level 3 — frequent itemsets of size 3:
    triples whose EVERY pair is frequent (the Apriori candidate rule;
    for k=3 that is exactly a triangle of the frequent-pair graph),
    support-counted against the basket table and thresholded.

    ``baskets``: distinct (o, i) basket-membership rows.
    ``strong_pairs``: canonical (src < dst) frequent pairs.
    Output: (a, b, c, support) with a < b < c, support >= min_support.

    Scale shape: candidates come from `triangles.triangle_list`
    (bucketed wedge kernel, broadcast edge keys — output is exactly
    the triangle count, never all item triples); support counting is
    three hash joins that narrow monotonically (candidate x orders of
    a, then semi-joined on (b, o), then (c, o)) plus one bucketed
    count — the classic distributed Apriori shape.
    """
    from parallel_pagerank_ray.pipelines.graph_build import Graph
    from parallel_pagerank_ray.pipelines.triangles import triangle_list
    from parallel_pagerank_ray.stages.agg import grouped_agg

    if num_partitions is None:
        from parallel_pagerank_ray.pipelines.graph_build import (
            _default_join_partitions,
        )

        num_partitions = _default_join_partitions()
    strong_pairs = strong_pairs.select_columns(["src", "dst"]).materialize()
    g = Graph.from_int_edges(strong_pairs, dedup=False)
    tris = triangle_list(
        g,
        num_partitions=num_partitions,
        num_buckets=num_buckets,
        edges_simple=True,  # canonical (src < dst, distinct) by contract
    )
    # identity Arrow pass: pandas-origin blocks break Ray's fused
    # Project/rename on the join sides (rename_columns on a DataFrame)
    baskets = (
        baskets.select_columns(["o", "i"])
        .map_batches(lambda t: t, batch_format="pyarrow")
        .materialize()
    )

    # Broadcast fast path: the Apriori-pruned candidate set is tiny by
    # construction (triangles of the FREQUENT-pair graph). While its
    # distinct item universe fits 8 int64 bitmask words (<= 504 items),
    # ship (items, triples) once via ray.put, reduce baskets to
    # per-order candidate-item bitmasks with the bucketed combine (sum
    # of distinct 1<<bit terms == OR, since basket rows are distinct
    # (o, i)), and count each triple's support as a vectorized
    # three-bit AND over order masks — zero joins, baskets shuffled
    # once as (o, W words) rows that only cover orders touching a
    # candidate item. Beyond the guard: the three-join Apriori shape
    # below (parity-tested by forcing the fallback).
    tris = tris.materialize()
    cand = (
        tris.to_pandas()
        if tris.count() <= min(broadcast_max_triples, 5000)
        else None
    )
    items = (
        np.unique(cand[["a", "b", "c"]].to_numpy().ravel())
        if cand is not None and len(cand)
        else None
    )
    if cand is not None and (len(cand) == 0 or len(items) <= 504):
        import pyarrow as pa

        if len(cand) == 0:
            return rd.from_arrow(
                pa.table(
                    {
                        "a": pa.array([], pa.int64()),
                        "b": pa.array([], pa.int64()),
                        "c": pa.array([], pa.int64()),
                        "support": pa.array([], pa.int64()),
                    }
                )
            )
        n_words = (len(items) + 62) // 63
        item_ref = ray.put(items)

        def mask_rows(t: pa.Table) -> pa.Table:
            it = ray.get(item_ref)
            iv = t.column("i").to_numpy(zero_copy_only=False)
            idx = np.searchsorted(it, iv)
            ok = (idx < len(it)) & (np.take(it, idx, mode="clip") == iv)
            o = t.column("o").to_numpy(zero_copy_only=False)[ok]
            idx = idx[ok]
            cols = {"o": pa.array(o.astype(np.int64), pa.int64())}
            for w in range(n_words):
                inw = (idx // 63) == w
                bits = np.where(
                    inw, np.int64(1) << (idx % 63).astype(np.int64), 0
                )
                cols[f"w{w}"] = pa.array(bits.astype(np.int64), pa.int64())
            return pa.table(cols)

        masks = grouped_agg(
            baskets.map_batches(mask_rows, batch_format="pyarrow"),
            ["o"],
            {f"w{w}": (f"w{w}", "sum") for w in range(n_words)},
            num_buckets=num_buckets,
        )
        tri_items = cand[["a", "b", "c"]].to_numpy()
        tri_idx = np.searchsorted(items, tri_items)  # (C, 3) bit indexes
        tri_ref = ray.put(tri_idx)

        def support_partial(t: pa.Table) -> pa.Table:
            ti = ray.get(tri_ref)
            words = [
                t.column(f"w{w}").to_numpy(zero_copy_only=False)
                for w in range(n_words)
            ]
            sup = np.empty(len(ti), dtype=np.int64)
            for c, (ia, ib, ic) in enumerate(ti):
                ok = (
                    (words[ia // 63] >> (ia % 63)) & 1
                ) & (
                    (words[ib // 63] >> (ib % 63)) & 1
                ) & (
                    (words[ic // 63] >> (ic % 63)) & 1
                )
                sup[c] = int(ok.sum())
            keep = sup > 0
            return pa.table(
                {
                    "t": pa.array(
                        np.arange(len(ti), dtype=np.int64)[keep], pa.int64()
                    ),
                    "n": pa.array(sup[keep], pa.int64()),
                }
            )

        hist = grouped_agg(
            masks.map_batches(support_partial, batch_format="pyarrow"),
            ["t"],
            {"support": ("n", "sum")},
            num_buckets=num_buckets,
        ).to_pandas()
        sup = np.zeros(len(cand), dtype=np.int64)
        if len(hist):
            sup[hist["t"].to_numpy()] = hist["support"].to_numpy()
        keep = sup >= int(min_support)
        return rd.from_arrow(
            pa.table(
                {
                    "a": pa.array(tri_items[keep, 0], pa.int64()),
                    "b": pa.array(tri_items[keep, 1], pa.int64()),
                    "c": pa.array(tri_items[keep, 2], pa.int64()),
                    "support": pa.array(sup[keep], pa.int64()),
                }
            )
        )

    j = safe_join(
        tris,
        baskets,
        join_type="inner",
        num_partitions=num_partitions,
        on=("a",),
        right_on=("i",),
    )
    j = safe_join(
        j,
        baskets.rename_columns({"o": "__o2", "i": "__i2"}),
        join_type="inner",
        num_partitions=num_partitions,
        on=("b", "o"),
        right_on=("__i2", "__o2"),
    )
    j = safe_join(
        j,
        baskets.rename_columns({"o": "__o3", "i": "__i3"}),
        join_type="inner",
        num_partitions=num_partitions,
        on=("c", "o"),
        right_on=("__i3", "__o3"),
    )
    sup = grouped_agg(
        j.select_columns(["a", "b", "c"]),
        ["a", "b", "c"],
        {"support": ("a", "count")},
        num_buckets=num_buckets,
    )
    return sup.filter(expr=f"support >= {int(min_support)}")


def small_quantity_revenue(lineitem: rd.Dataset) -> rd.Dataset:
    """TPC-H Q17 shape, integer-exact: revenue from lineitems whose
    quantity is below 20% of their part's average quantity. The float
    avg comparison ``qty < 0.2 * avg(qty)`` is cross-multiplied into
    pure integers: ``5 * qty_cents * n_part < sum_qty_cents_part``.
    Output: one row (revenue_cents, n_small).

    Scale shape: ONE part-keyed bucket shuffle of (partkey, qty, price)
    cents rows; each bucket holds every lineitem of its parts, so the
    in-bucket kernel computes per-part (sum, count) and folds the
    small-row revenue partial locally; a driver-side fold of one tiny
    row per bucket finishes. No join, no second scan.
    """
    from parallel_pagerank_ray.stages.agg import resolve_num_buckets

    num_buckets = resolve_num_buckets(lineitem)

    def keyed(t: pa.Table) -> pa.Table:
        qty = pc.cast(
            pc.round(pc.multiply(t.column("l_quantity"), 100.0)), pa.int64()
        )
        price = pc.cast(
            pc.round(pc.multiply(t.column("l_extendedprice"), 100.0)), pa.int64()
        )
        part = pc.cast(t.column("l_partkey"), pa.int64())
        bucket = pa.array(
            part.to_numpy(zero_copy_only=False) % np.int64(num_buckets),
            type=pa.int64(),
        )
        return pa.table(
            {"part": part, "q": qty, "p": price, "bucket": bucket}
        )

    def fold(g: pd.DataFrame) -> pd.DataFrame:
        s = g.groupby("part", sort=False)["q"].transform("sum").to_numpy()
        c = g.groupby("part", sort=False)["q"].transform("size").to_numpy()
        small = 5 * g["q"].to_numpy() * c < s
        return pd.DataFrame(
            {
                "revenue_cents": [int(g["p"].to_numpy()[small].sum())],
                "n_small": [int(small.sum())],
            }
        )

    parts = (
        lineitem.select_columns(["l_partkey", "l_quantity", "l_extendedprice"])
        .map_batches(keyed, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(fold, batch_format="pandas")
    )
    out = drop_empty_blocks(parts).to_pandas()
    return pd.DataFrame(
        {
            "revenue_cents": [int(out["revenue_cents"].sum())],
            "n_small": [int(out["n_small"].sum())],
        }
    )


def quantity_moments(lineitem: rd.Dataset) -> rd.Dataset:
    """Exact grouped moment sufficient statistics of l_quantity per
    (l_returnflag, l_linestatus): (n, s1, s2, s3) integer power sums.

    The distributed-statistics primitive: mean/variance/skewness are
    single closed-form combinations of these four int64-exact sums, so
    shipping the sums (one tiny row per group) instead of the moments
    keeps every reduce bit-reproducible at any parallelism (the
    driver-gate float policy). quantities are integral by TPC-H
    construction (validated); s3 <= 50^3 * rows stays under int64 to
    ~7e13 rows per group.
    """
    from parallel_pagerank_ray.stages.agg import grouped_agg

    def powers(t: pa.Table) -> pa.Table:
        q = t.column("l_quantity").to_numpy()
        qi = np.round(q).astype(np.int64)
        if not np.array_equal(qi.astype(np.float64), q):
            raise ValueError("quantity_moments: non-integral l_quantity")
        return pa.table(
            {
                "l_returnflag": t.column("l_returnflag"),
                "l_linestatus": t.column("l_linestatus"),
                "q1": pa.array(qi, pa.int64()),
                "q2": pa.array(qi * qi, pa.int64()),
                "q3": pa.array(qi * qi * qi, pa.int64()),
            }
        )

    return grouped_agg(
        lineitem.select_columns(
            ["l_returnflag", "l_linestatus", "l_quantity"]
        ).map_batches(powers, batch_format="pyarrow"),
        ["l_returnflag", "l_linestatus"],
        {
            "n": ("q1", "count"),
            "s1": ("q1", "sum"),
            "s2": ("q2", "sum"),
            "s3": ("q3", "sum"),
        },
    )


def large_volume_orders(
    lineitem: rd.Dataset,
    orders: rd.Dataset,
    customer: rd.Dataset,
    min_qty: int = 250,
    k: int = 20,
    num_partitions: int | None = None,
    broadcast_max: int = 5_000_000,
) -> rd.Dataset:
    """TPC-H Q18 shape (large-volume customers): orders whose lineitem
    quantity sum exceeds ``min_qty``, joined back to orders ⋈ customer,
    top-k by (o_totalprice desc, o_orderkey asc).

    Output: (c_custkey, c_name, o_orderkey, o_orderdate, total_qty,
    o_totalprice_cents). Scale shape: the HAVING filter runs on the
    aggregated per-order table (one row per order, already a ~4x
    reduction) and typically keeps a tiny fraction — both downstream
    joins see only surviving orders; money moves as exact cents.
    """
    from parallel_pagerank_ray.pipelines.graph_build import (
        _default_join_partitions,
    )
    from parallel_pagerank_ray.stages.agg import grouped_agg

    if num_partitions is None:
        num_partitions = _default_join_partitions()

    def qty(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "l_orderkey": t.column("l_orderkey"),
                "q": pc.cast(pc.round(t.column("l_quantity")), pa.int64()),
            }
        )

    per_order = grouped_agg(
        lineitem.select_columns(["l_orderkey", "l_quantity"]).map_batches(
            qty, batch_format="pyarrow"
        ),
        ["l_orderkey"],
        {"total_qty": ("q", "sum")},
    ).map_batches(
        lambda t: t.filter(
            pc.greater(t.column("total_qty"), pa.scalar(min_qty, pa.int64()))
        ),
        batch_format="pyarrow",
    )
    # the HAVING filter keeps a tiny fraction of orders by design —
    # while the survivors fit the broadcast guard, ship (orderkey,
    # total_qty) once via ray.put and turn the orders attach into a
    # zero-copy searchsorted filter (no shuffle of the full orders
    # table); beyond the guard fall back to the partitioned hash join
    import ray

    from parallel_pagerank_ray.util import count_rows_once

    n_big, per_order = count_rows_once(per_order)
    ocols = ["o_orderkey", "o_custkey", "o_totalprice", "o_orderdate"]
    if 0 < n_big <= broadcast_max:
        tbls = [
            t for t in ray.get(per_order.to_arrow_refs()) if t.num_rows
        ]
        ok = np.concatenate(
            [t.column("l_orderkey").to_numpy() for t in tbls]
        )
        tq = np.concatenate(
            [t.column("total_qty").to_numpy() for t in tbls]
        )
        order_ = np.argsort(ok)
        big_ref = ray.put((ok[order_], tq[order_]))

        def attach_orders(t: pa.Table) -> pa.Table:
            keys, qty = ray.get(big_ref)
            o = t.column("o_orderkey").to_numpy()
            idx = np.clip(np.searchsorted(keys, o), 0, len(keys) - 1)
            hit = keys[idx] == o
            kept = t.filter(pa.array(hit))
            return pa.table(
                {
                    "l_orderkey": kept.column("o_orderkey"),
                    "total_qty": pa.array(
                        qty[idx[hit]], pa.int64()
                    ),
                    "o_custkey": kept.column("o_custkey"),
                    "o_totalprice": kept.column("o_totalprice"),
                    "o_orderdate": kept.column("o_orderdate"),
                }
            )

        with_orders = orders.select_columns(ocols).map_batches(
            attach_orders, batch_format="pyarrow"
        )
    else:
        with_orders = safe_join(
            per_order,
            orders.select_columns(ocols),
            join_type="inner",
            num_partitions=num_partitions,
            on=("l_orderkey",),
            right_on=("o_orderkey",),
        )
    with_cust = safe_join(
        with_orders,
        customer.select_columns(["c_custkey", "c_name"]),
        join_type="inner",
        num_partitions=num_partitions,
        on=("o_custkey",),
        right_on=("c_custkey",),
    )

    def project(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "c_custkey": df["o_custkey"].astype(np.int64),
                "c_name": df["c_name"],
                "o_orderkey": df["l_orderkey"].astype(np.int64),
                "o_orderdate": pd.to_datetime(df["o_orderdate"]).dt.strftime(
                    "%Y-%m-%d %H:%M:%S"
                ),
                "total_qty": df["total_qty"].astype(np.int64),
                "o_totalprice_cents": np.round(
                    df["o_totalprice"].to_numpy() * 100.0
                ).astype(np.int64),
            }
        )

    return (
        with_cust.map_batches(project, batch_format="pandas")
        .sort(
            ["o_totalprice_cents", "o_orderkey"], descending=[True, False]
        )
        .limit(k)
    )


def late_orders_by_priority(
    lineitem: rd.Dataset,
    orders: rd.Dataset,
    grace_days: int = 60,
    num_partitions: int | None = None,
) -> rd.Dataset:
    """TPC-H Q4 shape (EXISTS decorrelation): count orders per
    o_orderpriority having AT LEAST ONE lineitem shipped more than
    ``grace_days`` after the order date -> (o_orderpriority,
    n_late_orders).

    The correlated EXISTS rewrites to an aggregate: per-order MAX
    shipdate (one bucketed grouped max — the only big shuffle), one
    partitioned join to orders, a vectorized date comparison, and a
    tiny priority rollup. Timestamps compare as int64 microseconds.
    """
    from parallel_pagerank_ray.pipelines.graph_build import (
        _default_join_partitions,
    )
    from parallel_pagerank_ray.stages.agg import grouped_agg

    if num_partitions is None:
        num_partitions = _default_join_partitions()

    def ship_us(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "l_orderkey": t.column("l_orderkey"),
                "ship_us": pc.cast(t.column("l_shipdate"), pa.int64()),
            }
        )

    max_ship = grouped_agg(
        lineitem.select_columns(["l_orderkey", "l_shipdate"]).map_batches(
            ship_us, batch_format="pyarrow"
        ),
        ["l_orderkey"],
        {"max_ship_us": ("ship_us", "max")},
    )
    j = safe_join(
        max_ship,
        orders.select_columns(
            ["o_orderkey", "o_orderdate", "o_orderpriority"]
        ),
        join_type="inner",
        num_partitions=num_partitions,
        on=("l_orderkey",),
        right_on=("o_orderkey",),
    )
    grace_us = np.int64(grace_days) * 86_400 * 1_000_000

    def late(t: pa.Table) -> pa.Table:
        od = pc.cast(t.column("o_orderdate"), pa.int64())
        is_late = pc.greater(
            t.column("max_ship_us"),
            pc.add(od, pa.scalar(int(grace_us), pa.int64())),
        )
        kept = t.filter(is_late)
        return pa.table(
            {
                "o_orderpriority": kept.column("o_orderpriority"),
                "one": pa.array(
                    np.ones(kept.num_rows, dtype=np.int64), pa.int64()
                ),
            }
        )

    return grouped_agg(
        j.map_batches(late, batch_format="pyarrow"),
        ["o_orderpriority"],
        {"n_late_orders": ("one", "sum")},
    )


def order_count_distribution(
    orders: rd.Dataset,
    customer: rd.Dataset,
    priority: str | None = "1-URGENT",
) -> rd.Dataset:
    """TPC-H Q13 shape: the distribution of per-customer order counts
    INCLUDING customers with zero matching orders — (c_count,
    custdist), integer-exact. ``priority`` filters the orders side
    (the stand-in for Q13's comment NOT LIKE predicate); None counts
    all orders.

    Scale plan: no outer join at all. The per-customer counts are one
    bucketed grouped_agg; the zero bucket is |customer| minus the
    count table's row count — two scalars — because o_custkey is a
    foreign key into customer (TPC-H referential integrity; customers
    the orders table never references are exactly the zero bucket).
    The histogram over counts is a second tiny grouped_agg.
    """
    from parallel_pagerank_ray.stages.agg import grouped_agg

    o = orders.select_columns(["o_custkey", "o_orderpriority"])
    if priority is not None:
        o = o.filter(expr=f"o_orderpriority == '{priority}'")
    per_cust = grouped_agg(
        o.select_columns(["o_custkey"]),
        ["o_custkey"],
        {"c_count": ("o_custkey", "count")},
    ).materialize()
    n_ordering = per_cust.count()
    n_customers = customer.select_columns(["c_custkey"]).count()
    dist = grouped_agg(
        per_cust.select_columns(["c_count"]),
        ["c_count"],
        {"custdist": ("c_count", "count")},
    )
    zeros = int(n_customers - n_ordering)
    if zeros > 0:
        z = rd.from_arrow(
            pa.table(
                {
                    "c_count": pa.array([0], pa.int64()),
                    "custdist": pa.array([zeros], pa.int64()),
                }
            )
        )
        dist = dist.union(z)
    return dist


def volume_shipping(
    lineitem: rd.Dataset,
    orders: rd.Dataset,
    customer: rd.Dataset,
    supplier: rd.Dataset,
    nation: rd.Dataset,
    num_partitions: int | None = None,
    broadcast_max: int = 5_000_000,
) -> rd.Dataset:
    """TPC-H Q7 shape: cross-nation trade volume — for every ordered
    (supplier nation, customer nation, ship year) with supp != cust,
    the summed discounted revenue. Revenue is the integer
    cent-percent unit round(price*100) * (100 - round(disc*100)), so
    the result is int64-exact.

    Scale plan: supplier -> nation is a broadcast dict (supplier is
    the small side by contract, guarded); lineitem pre-aggregates
    revenue per (l_orderkey, supp_nation, year) BELOW the big join so
    the orders join ships one row per (order, supp-nation, year)
    triple, never per line item; customer nation attaches under the
    same broadcast guard with a hash-join fallback.
    """
    from parallel_pagerank_ray.stages.agg import grouped_agg
    from parallel_pagerank_ray.util import count_rows_once

    if num_partitions is None:
        from parallel_pagerank_ray.pipelines.graph_build import (
            _default_join_partitions,
        )

        num_partitions = _default_join_partitions()

    # supplier -> nationkey broadcast (guarded: supplier is O(SF)·10k)
    n_sup, sup = count_rows_once(
        supplier.select_columns(["s_suppkey", "s_nationkey"])
    )
    if n_sup > broadcast_max:
        raise ValueError(
            "volume_shipping: supplier side exceeds broadcast_max "
            f"({n_sup} > {broadcast_max}); partition the supplier "
            "attach with safe_join before widening the guard"
        )
    st = pa.concat_tables(ray.get(sup.to_arrow_refs()))
    sidx = pd.Index(st.column("s_suppkey").to_numpy())
    sref = ray.put((sidx, st.column("s_nationkey").to_numpy()))

    def rev_rows(t: pa.Table) -> pa.Table:
        idx, v = ray.get(sref)
        pos = idx.get_indexer(t.column("l_suppkey").to_numpy())
        m = pos >= 0
        t = t.filter(pa.array(m))
        cents = pc.cast(
            pc.round(pc.multiply(t.column("l_extendedprice"), 100.0)),
            pa.int64(),
        )
        dpct = pc.cast(
            pc.round(pc.multiply(t.column("l_discount"), 100.0)), pa.int64()
        )
        rev = pc.multiply(cents, pc.subtract(pa.scalar(100, pa.int64()), dpct))
        return pa.table(
            {
                "l_orderkey": t.column("l_orderkey"),
                "supp_nation": pa.array(v[pos[m]], pa.int64()),
                "l_year": pc.cast(pc.year(t.column("l_shipdate")), pa.int64()),
                "rev": rev,
            }
        )

    per_order = grouped_agg(
        lineitem.select_columns(
            ["l_orderkey", "l_suppkey", "l_extendedprice", "l_discount", "l_shipdate"]
        ).map_batches(rev_rows, batch_format="pyarrow"),
        ["l_orderkey", "supp_nation", "l_year"],
        {"rev": ("rev", "sum")},
    )
    # customer -> nationkey broadcast under the same guard contract;
    # the orders (orderkey -> custkey) map is O(SF) too — when both
    # fit, the order join disappears into ONE map over the rollup
    # (orderkey -> custkey -> cust_nation); hash joins beyond
    n_cust, cust = count_rows_once(
        customer.select_columns(["c_custkey", "c_nationkey"])
    )
    cidx = None
    if n_cust <= broadcast_max:
        ct = pa.concat_tables(ray.get(cust.to_arrow_refs()))
        cidx = pd.Index(ct.column("c_custkey").to_numpy())
        if not cidx.is_unique:
            cidx = None
    ords = orders.select_columns(["o_orderkey", "o_custkey"])
    n_ord, ords = count_rows_once(ords)
    oidx = None
    if cidx is not None and n_ord <= broadcast_max:
        ot = pa.concat_tables(ray.get(ords.to_arrow_refs()))
        oidx = pd.Index(ot.column("o_orderkey").to_numpy())
        if not oidx.is_unique:  # pragma: no cover - orderkey is a PK
            oidx = None
    if cidx is not None and oidx is not None:
        cref = ray.put((cidx, ct.column("c_nationkey").to_numpy()))
        oref = ray.put((oidx, ot.column("o_custkey").to_numpy()))

        def attach_cust_nation(df: pd.DataFrame) -> pd.DataFrame:
            odx, ck = ray.get(oref)
            idx, v = ray.get(cref)
            opos = odx.get_indexer(df["l_orderkey"].to_numpy())
            m1 = opos >= 0
            custkey = ck[opos[m1]]
            pos = idx.get_indexer(custkey)
            m2 = pos >= 0
            out = df.loc[m1, ["supp_nation", "l_year", "rev"]].reset_index(
                drop=True
            )
            out = out.loc[m2].reset_index(drop=True)
            out["cust_nation"] = v[pos[m2]]
            return out

        labeled = per_order.map_batches(
            attach_cust_nation, batch_format="pandas"
        )
    else:
        j = safe_join(
            per_order,
            ords,
            join_type="inner",
            num_partitions=num_partitions,
            on=("l_orderkey",),
            right_on=("o_orderkey",),
        )
        if cidx is not None:
            cref = ray.put((cidx, ct.column("c_nationkey").to_numpy()))

            def attach_cust(df: pd.DataFrame) -> pd.DataFrame:
                idx, v = ray.get(cref)
                pos = idx.get_indexer(df["o_custkey"].to_numpy())
                m = pos >= 0
                out = df.loc[
                    m, ["supp_nation", "l_year", "rev"]
                ].reset_index(drop=True)
                out["cust_nation"] = v[pos[m]]
                return out

            labeled = j.map_batches(attach_cust, batch_format="pandas")
        else:
            labeled = safe_join(
                j,
                cust,
                join_type="inner",
                num_partitions=num_partitions,
                on=("o_custkey",),
                right_on=("c_custkey",),
            ).rename_columns({"c_nationkey": "cust_nation"})
    per_pair = grouped_agg(
        labeled,
        ["supp_nation", "cust_nation", "l_year"],
        {"revenue": ("rev", "sum")},
    ).filter(expr="supp_nation != cust_nation")
    # nation-name attach: 25 rows, one broadcast dict
    ndf = nation.select_columns(["n_nationkey", "n_name"]).to_pandas()
    dref = ray.put(dict(zip(ndf["n_nationkey"].astype(int), ndf["n_name"])))

    def names(df: pd.DataFrame) -> pd.DataFrame:
        dim = ray.get(dref)
        return pd.DataFrame(
            {
                "supp_nation": df["supp_nation"].astype(np.int64).map(dim),
                "cust_nation": df["cust_nation"].astype(np.int64).map(dim),
                "l_year": df["l_year"].astype(np.int64),
                "revenue": df["revenue"].astype(np.int64),
            }
        )

    return per_pair.map_batches(names, batch_format="pandas")


def returned_item_revenue(
    customer: rd.Dataset,
    orders: rd.Dataset,
    lineitem: rd.Dataset,
    nation: rd.Dataset,
    date_from: str = "1996-01-01",
    date_to: str = "1996-04-01",
    k: int = 20,
    num_partitions: int | None = None,
) -> rd.Dataset:
    """TPC-H Q10 shape: the top-k customers by revenue lost to
    returned items (l_returnflag = 'R') for orders placed in
    [date_from, date_to) — (c_custkey, c_name, n_name, acctbal_cents,
    revenue), revenue the int64 cent-percent unit of Q7.

    Scale plan: returned revenue pre-aggregates per order below the
    join; the orders side is date-filtered AT THE SCAN; one hash join
    orders->revenue, one bucketed per-customer grouped_agg, a bounded
    global top-k, and the customer/nation attributes attach to only
    k rows via one more (tiny) join.
    """
    from parallel_pagerank_ray.stages.agg import grouped_agg, grouped_topk

    if num_partitions is None:
        from parallel_pagerank_ray.pipelines.graph_build import (
            _default_join_partitions,
        )

        num_partitions = _default_join_partitions()
    lo = np.datetime64(date_from + "T00:00:00", "us")
    hi = np.datetime64(date_to + "T00:00:00", "us")

    def rev_rows(t: pa.Table) -> pa.Table:
        t = t.filter(pc.equal(t.column("l_returnflag"), pa.scalar("R")))
        cents = pc.cast(
            pc.round(pc.multiply(t.column("l_extendedprice"), 100.0)),
            pa.int64(),
        )
        dpct = pc.cast(
            pc.round(pc.multiply(t.column("l_discount"), 100.0)), pa.int64()
        )
        return pa.table(
            {
                "l_orderkey": t.column("l_orderkey"),
                "rev": pc.multiply(
                    cents, pc.subtract(pa.scalar(100, pa.int64()), dpct)
                ),
            }
        )

    per_order = grouped_agg(
        lineitem.select_columns(
            ["l_orderkey", "l_returnflag", "l_extendedprice", "l_discount"]
        ).map_batches(rev_rows, batch_format="pyarrow"),
        ["l_orderkey"],
        {"rev": ("rev", "sum")},
    )

    def window(t: pa.Table) -> pa.Table:
        keep = pc.and_(
            pc.greater_equal(t.column("o_orderdate"), pa.scalar(lo)),
            pc.less(t.column("o_orderdate"), pa.scalar(hi)),
        )
        t = t.filter(keep)
        return t.select(["o_orderkey", "o_custkey"])

    in_window = orders.select_columns(
        ["o_orderkey", "o_custkey", "o_orderdate"]
    ).map_batches(window, batch_format="pyarrow")
    # the date window prunes orders hard; broadcast the (orderkey ->
    # custkey) map under the count_rows_once guard so the revenue
    # rollup attaches its customer key map-side — the hash join stays
    # for window sizes beyond the guard
    from parallel_pagerank_ray.util import count_rows_once

    n_win, in_window = count_rows_once(in_window)
    widx = None
    if n_win <= 5_000_000:
        wt = pa.concat_tables(ray.get(in_window.to_arrow_refs()))
        widx = pd.Index(wt.column("o_orderkey").to_numpy())
        if not widx.is_unique:  # pragma: no cover - orderkey is a PK
            widx = None
    if widx is not None:
        win_ref = ray.put(
            (widx, wt.column("o_custkey").to_numpy().astype(np.int64))
        )

        def attach_cust(t: pa.Table) -> pa.Table:
            idx, ck = ray.get(win_ref)
            pos = idx.get_indexer(t.column("l_orderkey").to_numpy())
            hit = pos >= 0  # inner-join semantics
            return pa.table(
                {
                    "o_custkey": pa.array(ck[pos[hit]], pa.int64()),
                    "rev": pa.array(
                        t.column("rev").to_numpy()[hit], pa.int64()
                    ),
                }
            )

        joined = per_order.map_batches(attach_cust, batch_format="pyarrow")
    else:
        joined = safe_join(
            per_order,
            in_window,
            join_type="inner",
            num_partitions=num_partitions,
            on=("l_orderkey",),
            right_on=("o_orderkey",),
        )
    per_cust = grouped_agg(
        joined,
        ["o_custkey"],
        {"revenue": ("rev", "sum")},
    )
    top = grouped_topk(
        per_cust.map_batches(
            lambda t: t.append_column(
                "g", pa.array(np.zeros(t.num_rows, dtype=np.int64))
            ),
            batch_format="pyarrow",
        ),
        group_cols=["g"],
        order_cols=["revenue", "o_custkey"],
        ascending=[False, True],
        k=k,
    ).drop_columns(["g"])
    # attribute attach: top is k-bounded, so pull it (k rows — the
    # contract-bounded driver pull every top-k query already makes),
    # broadcast its key set, and SEMI-FILTER the customer scan instead
    # of hash-joining the whole customer table against 20 rows (a hash
    # join shuffles BOTH sides regardless of the small side's size)
    top_df = top.to_pandas()
    keys = np.sort(top_df["o_custkey"].to_numpy().astype(np.int64))
    keys_ref = ray.put(keys)

    def cust_hits(t: pa.Table) -> pa.Table:
        ks = ray.get(keys_ref)
        ck = t.column("c_custkey").to_numpy()
        pos = np.searchsorted(ks, ck)
        hit = (
            (pos < len(ks)) & (ks[np.minimum(pos, len(ks) - 1)] == ck)
            if len(ks)
            else np.zeros(len(ck), dtype=bool)
        )
        return t.filter(pa.array(hit))

    cust_df = (
        customer.select_columns(
            ["c_custkey", "c_name", "c_nationkey", "c_acctbal"]
        )
        .map_batches(cust_hits, batch_format="pyarrow")
        .to_pandas()  # <= k rows by construction
    )
    ndf = nation.select_columns(["n_nationkey", "n_name"]).to_pandas()
    dim = dict(zip(ndf["n_nationkey"].astype(int), ndf["n_name"]))
    merged = top_df.merge(
        cust_df, left_on="o_custkey", right_on="c_custkey", how="inner"
    ).sort_values(["revenue", "o_custkey"], ascending=[False, True])
    out = pd.DataFrame(
        {
            "c_custkey": merged["o_custkey"].astype(np.int64),
            "c_name": merged["c_name"],
            "n_name": merged["c_nationkey"].astype(np.int64).map(dim),
            "acctbal_cents": np.round(
                merged["c_acctbal"].to_numpy() * 100.0
            ).astype(np.int64),
            "revenue": merged["revenue"].astype(np.int64),
        }
    )
    return rd.from_pandas(out)


def _skyline_kernel(
    d: np.ndarray, p: np.ndarray
) -> np.ndarray:
    """Boolean survive-mask of the 2-D skyline (minimize d, maximize
    p; strict Pareto dominance — equal (d, p) pairs all survive).
    Vectorized: per-date max via reduceat on the date-sorted groups,
    running cummax over dates, one gather back per row."""
    if not len(d):
        return np.zeros(0, dtype=bool)
    order = np.argsort(d, kind="stable")
    ds, ps = d[order], p[order]
    starts = np.flatnonzero(np.r_[True, ds[1:] != ds[:-1]])
    gmax = np.maximum.reduceat(ps, starts)  # per-date max price
    cmax = np.maximum.accumulate(gmax)  # max over dates <= g
    prev = np.r_[np.int64(np.iinfo(np.int64).min), cmax[:-1]]  # < g
    gid = np.cumsum(np.r_[False, ds[1:] != ds[:-1]])
    keep_sorted = (ps == cmax[gid]) & (ps > prev[gid])
    keep = np.zeros(len(d), dtype=bool)
    keep[order] = keep_sorted
    return keep


def skyline_orders(
    orders: rd.Dataset,
    broadcast_max: int = 5_000_000,
) -> rd.Dataset:
    """Skyline / Pareto frontier of the orders table — every order not
    strictly dominated on (earlier-or-equal o_orderdate, higher-or-
    equal o_totalprice): (o_orderkey, o_orderdate, price_cents),
    integer-exact. The classic multi-criteria operator Ray Data lacks.

    Scale plan: the skyline is MAP-SIDE PRUNABLE — dominated rows of a
    batch can never re-enter the global skyline, so each task keeps
    only its local frontier (typically O(log n) of the batch for
    independent dims) and only frontiers travel. The merge applies the
    same kernel to the concatenated candidates: one guarded driver
    fold while the candidate union fits ``broadcast_max``, else a
    single-partition distributed pass (the standard serial skyline
    merge — the candidate set is the data-dependent bound).
    """
    from parallel_pagerank_ray.util import count_rows_once

    def local(t: pa.Table) -> pa.Table:
        d = pc.cast(t.column("o_orderdate"), pa.int64()).to_numpy(
            zero_copy_only=False
        )
        p = (
            pc.cast(
                pc.round(pc.multiply(t.column("o_totalprice"), 100.0)),
                pa.int64(),
            )
            .to_numpy(zero_copy_only=False)
            .astype(np.int64)
        )
        keep = _skyline_kernel(d, p)
        kept = t.filter(pa.array(keep))
        return pa.table(
            {
                "o_orderkey": kept.column("o_orderkey"),
                "date_us": pa.array(d[keep], pa.int64()),
                "price_cents": pa.array(p[keep], pa.int64()),
            }
        )

    cand = orders.select_columns(
        ["o_orderkey", "o_orderdate", "o_totalprice"]
    ).map_batches(local, batch_format="pyarrow")
    n_cand, cand = count_rows_once(cand)

    def merge(t: pa.Table) -> pa.Table:
        d = t.column("date_us").to_numpy(zero_copy_only=False)
        p = t.column("price_cents").to_numpy(zero_copy_only=False)
        return t.filter(pa.array(_skyline_kernel(d, p)))

    if n_cand <= broadcast_max:
        import ray

        tabs = [t for t in ray.get(cand.to_arrow_refs()) if t.num_rows]
        merged = (
            merge(pa.concat_tables(tabs))
            if tabs
            else pa.table(
                {
                    "o_orderkey": pa.array([], pa.int64()),
                    "date_us": pa.array([], pa.int64()),
                    "price_cents": pa.array([], pa.int64()),
                }
            )
        )
        out = rd.from_arrow(merged)
    else:
        out = drop_empty_blocks(
            cand.repartition(1).map_batches(
                merge, batch_format="pyarrow", batch_size=None
            )
        )
    return out


def profile_table(
    ds: rd.Dataset,
    int_cols: list[str],
    cents_cols: list[str],
    num_buckets: int | None = None,
) -> rd.Dataset:
    """Column-profile statistics (the df.describe() of the engine) for
    a table's numeric columns: one row per column with
    (col_name, n, n_null, n_distinct, min_v, max_v, sum_v) — all
    int64-exact (``cents_cols`` are profiled in integer cents; a column
    with no non-null values reports min_v = max_v = 0 by convention).

    Scale shape: the scalar stats are per-batch partials folded by one
    tiny |cols|-row combine; n_distinct is ONE (col, value)-pair
    shuffle (the only wide step — the exact-distinct contract; swap in
    the KMV sketch for an approximate profile without the shuffle).
    """
    import pyarrow as pa

    from parallel_pagerank_ray.stages.agg import grouped_agg
    from parallel_pagerank_ray.util import drop_empty_blocks, safe_join

    if num_buckets is None:
        from parallel_pagerank_ray.stages.agg import resolve_num_buckets

        num_buckets = resolve_num_buckets(ds)
    cols = list(int_cols) + list(cents_cols)
    cents = set(cents_cols)
    I64MAX = np.iinfo(np.int64).max
    I64MIN = np.iinfo(np.int64).min

    def canon_arrays(t: pa.Table):
        for c in cols:
            col = t.column(c)
            valid = pc.is_valid(col)
            if c in cents:
                col = pc.cast(
                    pc.round(pc.multiply(pc.cast(col, pa.float64()), 100.0)),
                    pa.int64(),
                )
            else:
                col = pc.cast(col, pa.int64())
            yield c, col, valid

    def partials(t: pa.Table) -> pa.Table:
        names, ns, nulls, mins, maxs, sums = [], [], [], [], [], []
        for c, col, valid in canon_arrays(t):
            v = col.filter(valid)
            names.append(c)
            ns.append(t.num_rows)
            nulls.append(t.num_rows - len(v))
            a = v.to_numpy(zero_copy_only=False)
            mins.append(int(a.min()) if len(a) else I64MAX)
            maxs.append(int(a.max()) if len(a) else I64MIN)
            sums.append(int(a.sum()) if len(a) else 0)
        return pa.table(
            {
                "col_name": pa.array(names, pa.string()),
                "n": pa.array(ns, pa.int64()),
                "n_null": pa.array(nulls, pa.int64()),
                "min_v": pa.array(mins, pa.int64()),
                "max_v": pa.array(maxs, pa.int64()),
                "sum_v": pa.array(sums, pa.int64()),
            }
        )

    def pairs(t: pa.Table) -> pa.Table:
        parts = []
        for c, col, valid in canon_arrays(t):
            v = col.filter(valid)
            parts.append(
                pa.table(
                    {
                        "col_name": pa.array([c] * len(v), pa.string()),
                        "v": v,
                    }
                )
            )
        return pa.concat_tables(parts) if parts else pa.table(
            {"col_name": pa.array([], pa.string()),
             "v": pa.array([], pa.int64())}
        )

    src = ds.select_columns(cols).materialize()
    stats = grouped_agg(
        src.map_batches(partials, batch_format="pyarrow"),
        ["col_name"],
        {
            "n": ("n", "sum"),
            "n_null": ("n_null", "sum"),
            "min_v": ("min_v", "min"),
            "max_v": ("max_v", "max"),
            "sum_v": ("sum_v", "sum"),
        },
        num_buckets=4,
    )
    dist = grouped_agg(
        grouped_agg(
            drop_empty_blocks(
                src.map_batches(pairs, batch_format="pyarrow")
            ),
            ["col_name", "v"],
            {"c": ("v", "count")},
            num_buckets=num_buckets,
        ),
        ["col_name"],
        {"n_distinct": ("v", "count")},
        num_buckets=4,
    )
    out = safe_join(
        stats,
        dist,
        join_type="left_outer",
        num_partitions=4,
        on=("col_name",),
    )

    def finish(df: pd.DataFrame) -> pd.DataFrame:
        nd = df["n_distinct"].fillna(0).astype(np.int64)
        all_null = (df["n"] - df["n_null"]) == 0
        return pd.DataFrame(
            {
                "col_name": df["col_name"],
                "n": df["n"].astype(np.int64),
                "n_null": df["n_null"].astype(np.int64),
                "n_distinct": nd,
                "min_v": np.where(all_null, 0, df["min_v"]).astype(np.int64),
                "max_v": np.where(all_null, 0, df["max_v"]).astype(np.int64),
                "sum_v": df["sum_v"].astype(np.int64),
            }
        )

    return out.map_batches(finish, batch_format="pandas").sort("col_name")


def order_quartiles(orders: rd.Dataset) -> rd.Dataset:
    """NTILE(4) of each customer's orders by total price — the
    equal-height bucketing window function (the one member of the SQL
    window family running_window/lag/pivot don't cover). Output one
    row per order: (o_orderkey, o_custkey, quartile), quartile in 1..4
    following the standard NTILE rule exactly: with cnt orders, the
    first cnt % 4 buckets hold ceil(cnt/4) rows, the rest floor(cnt/4),
    assigned in (o_totalprice, o_orderkey) order — integer-exact and
    deterministic (price compared in cents).

    Scale shape: ONE hash shuffle keyed by o_custkey % B; the
    in-bucket kernel is a lexsort plus closed-form vectorized bucket
    arithmetic over every customer at once (no per-customer Python).
    """
    from parallel_pagerank_ray.stages.agg import resolve_num_buckets

    num_buckets = resolve_num_buckets(orders)

    def keyed(df: pd.DataFrame) -> pd.DataFrame:
        cust = df["o_custkey"].to_numpy().astype(np.int64)
        return pd.DataFrame(
            {
                "o_orderkey": df["o_orderkey"].to_numpy().astype(np.int64),
                "o_custkey": cust,
                "cents": np.round(
                    df["o_totalprice"].to_numpy() * 100.0
                ).astype(np.int64),
                "bucket": cust % np.int64(num_buckets),
            }
        )

    def ntile4(g: pd.DataFrame) -> pd.DataFrame:
        order = np.lexsort(
            (
                g["o_orderkey"].to_numpy(),
                g["cents"].to_numpy(),
                g["o_custkey"].to_numpy(),
            )
        )
        cust = g["o_custkey"].to_numpy()[order]
        okey = g["o_orderkey"].to_numpy()[order]
        new = np.concatenate(([True], cust[1:] != cust[:-1]))
        run_id = np.cumsum(new) - 1
        starts = np.flatnonzero(new)
        cnt = np.diff(np.append(starts, len(cust)))[run_id]
        pos = np.arange(len(cust)) - starts[run_id]
        big = cnt // 4 + 1          # size of the first cnt%4 buckets
        nbig = cnt % 4
        cut = nbig * big            # rows covered by the big buckets
        small = np.maximum(cnt // 4, 1)
        q = np.where(
            pos < cut,
            pos // big,
            nbig + (pos - cut) // small,
        )
        return pd.DataFrame(
            {
                "o_orderkey": okey,
                "o_custkey": cust,
                "quartile": (q + 1).astype(np.int64),
            }
        )

    out = (
        orders.select_columns(["o_orderkey", "o_custkey", "o_totalprice"])
        .map_batches(keyed, batch_format="pandas")
        .groupby("bucket")
        .map_groups(ntile4, batch_format="pandas")
    )
    from parallel_pagerank_ray.util import drop_empty_blocks

    return drop_empty_blocks(out)
