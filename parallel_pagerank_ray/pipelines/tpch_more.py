"""The remaining classic TPC-H query shapes over the test tables —
each one exercises a DISTINCT distributed operator pattern the earlier
relational queries don't: 3-way join + per-order top-k (Q3), pure
scan-filter-aggregate (Q6), ratio-of-sums over a fact⋈dim join (Q14),
global argmax with ties (Q15), disjunctive multi-clause predicate join
(Q19), double semi/anti-join decorrelation (Q21), scalar-broadcast
threshold + anti-join (Q22), and per-group argmin with a packed
tie-break (Q2's shape without a partsupp table).

All monetary arithmetic is integer (cents / cents×pct units) so every
aggregate is order-independent and bit-reproducible; the only floats
are single divisions of two exact int64s (the repo-wide gate policy).
Adaptations to the available schema (no l_shipmode / l_commitdate /
partsupp) are noted per function.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray.data as rd

from parallel_pagerank_ray.util import anti_join, safe_join

_US_PER_DAY = 86_400 * 1_000_000


def _default_parts() -> int:
    from parallel_pagerank_ray.pipelines.graph_build import (
        _default_join_partitions,
    )

    return _default_join_partitions()


def _cents(col: pa.ChunkedArray) -> pa.ChunkedArray:
    return pc.cast(pc.round(pc.multiply(col, 100.0)), pa.int64())


def _ts_us(s: str) -> int:
    return int(np.datetime64(s + "T00:00:00", "us").astype(np.int64))


def shipping_priority(
    customer: rd.Dataset,
    orders: rd.Dataset,
    lineitem: rd.Dataset,
    segment: str = "BUILDING",
    cutoff: str = "1996-06-01",
    k: int = 10,
    num_partitions: int | None = None,
    broadcast_max: int = 5_000_000,
) -> rd.Dataset:
    """TPC-H Q3: revenue of not-yet-shipped orders for one market
    segment -> top-k orders by revenue.

    Output (o_orderkey, revenue_units, date_us), revenue_units =
    sum(price_cents * (100 - disc_pct)), sorted by (revenue desc,
    orderkey asc) — deterministic tie-break.

    Scale: the segment filter prunes customer before its only join;
    lineitem collapses to per-order partials before touching orders,
    so the wide join moves |orders in window| rows, never lineitems.
    """
    if num_partitions is None:
        num_partitions = _default_parts()
    cut = _ts_us(cutoff)

    def cust_keys(t: pa.Table) -> pa.Table:
        t = t.filter(pc.equal(t.column("c_mktsegment"), pa.scalar(segment)))
        return t.select(["c_custkey"])

    def order_rows(t: pa.Table) -> pa.Table:
        d = pc.cast(t.column("o_orderdate"), pa.int64())
        t = t.append_column("date_us", d)
        return t.filter(
            pc.less(t.column("date_us"), pa.scalar(cut, pa.int64()))
        ).select(["o_orderkey", "o_custkey", "date_us"])

    def rev_rows(t: pa.Table) -> pa.Table:
        ship = pc.cast(t.column("l_shipdate"), pa.int64())
        t = t.filter(pc.greater(ship, pa.scalar(cut, pa.int64())))
        price = _cents(t.column("l_extendedprice"))
        disc = _cents(t.column("l_discount"))
        rev = pc.multiply(price, pc.subtract(pa.scalar(100, pa.int64()), disc))
        return pa.table(
            {"l_orderkey": t.column("l_orderkey"), "rev": rev}
        )

    from parallel_pagerank_ray.stages.agg import grouped_agg
    from parallel_pagerank_ray.util import count_rows_once

    cust_small = customer.select_columns(
        ["c_custkey", "c_mktsegment"]
    ).map_batches(cust_keys, batch_format="pyarrow")
    window_orders = orders.select_columns(
        ["o_orderkey", "o_custkey", "o_orderdate"]
    ).map_batches(order_rows, batch_format="pyarrow")
    # the segment customer-key set and the date-windowed order table
    # are both O(SF): broadcast each under the count_rows_once guard
    # (semi-filter orders by custkey; attach date_us to the revenue
    # rollup map-side) — hash joins only beyond the bound
    import ray as _ray

    n_cust, cust_small = count_rows_once(cust_small)
    if n_cust <= broadcast_max:
        ct = pa.concat_tables(_ray.get(cust_small.to_arrow_refs()))
        ckeys = np.sort(ct.column("c_custkey").to_numpy())
        ckeys_ref = _ray.put(ckeys)

        def seg_filter(t: pa.Table) -> pa.Table:
            ks = _ray.get(ckeys_ref)
            ck = t.column("o_custkey").to_numpy()
            pos = np.searchsorted(ks, ck)
            hit = (
                (pos < len(ks)) & (ks[np.minimum(pos, len(ks) - 1)] == ck)
                if len(ks)
                else np.zeros(len(ck), dtype=bool)
            )
            return t.filter(pa.array(hit))

        seg_orders = window_orders.map_batches(
            seg_filter, batch_format="pyarrow"
        )
    else:
        seg_orders = safe_join(
            window_orders,
            cust_small,
            join_type="inner",
            num_partitions=num_partitions,
            on=("o_custkey",),
            right_on=("c_custkey",),
        )
    per_order = grouped_agg(
        lineitem.select_columns(
            ["l_orderkey", "l_extendedprice", "l_discount", "l_shipdate"]
        ).map_batches(rev_rows, batch_format="pyarrow"),
        ["l_orderkey"],
        {"revenue_units": ("rev", "sum")},
    )
    seg_small = seg_orders.select_columns(["o_orderkey", "date_us"])
    n_seg, seg_small = count_rows_once(seg_small)
    if n_seg <= broadcast_max:
        st = pa.concat_tables(_ray.get(seg_small.to_arrow_refs()))
        sidx = pd.Index(st.column("o_orderkey").to_numpy())
        dates_ref = _ray.put(
            (sidx, st.column("date_us").to_numpy().astype(np.int64))
        )

        def attach_date(t: pa.Table) -> pa.Table:
            idx, du = _ray.get(dates_ref)
            pos = idx.get_indexer(t.column("l_orderkey").to_numpy())
            hit = pos >= 0  # inner-join semantics
            return pa.table(
                {
                    "l_orderkey": pa.array(
                        t.column("l_orderkey").to_numpy()[hit], pa.int64()
                    ),
                    "revenue_units": pa.array(
                        t.column("revenue_units").to_numpy()[hit],
                        pa.int64(),
                    ),
                    "date_us": pa.array(du[pos[hit]], pa.int64()),
                }
            )

        j = per_order.map_batches(attach_date, batch_format="pyarrow")
    else:
        j = safe_join(
            per_order,
            seg_small,
            join_type="inner",
            num_partitions=num_partitions,
            on=("l_orderkey",),
            right_on=("o_orderkey",),
        )
    out = j.sort(["revenue_units", "l_orderkey"], descending=[True, False]).limit(k)

    def project(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "o_orderkey": df["l_orderkey"].astype(np.int64),
                "revenue_units": df["revenue_units"].astype(np.int64),
                "date_us": df["date_us"].astype(np.int64),
            }
        )

    return out.map_batches(project, batch_format="pandas")


def forecast_revenue(
    lineitem: rd.Dataset,
    year_start: str = "1996-01-01",
    disc_lo: int = 5,
    disc_hi: int = 7,
    qty_max: int = 24,
) -> rd.Dataset:
    """TPC-H Q6: revenue increase from dropping small discounts — one
    scan, three filters, one global sum. Output one row
    (revenue_units, n_lineitems), revenue_units = sum(price_cents *
    disc_pct). The embarrassingly-parallel baseline every engine
    should hit storage bandwidth on.
    """
    lo = _ts_us(year_start)
    hi = _ts_us(f"{int(year_start[:4]) + 1}-01-01")

    def partial(t: pa.Table) -> pa.Table:
        ship = pc.cast(t.column("l_shipdate"), pa.int64())
        disc = _cents(t.column("l_discount"))
        qty = _cents(t.column("l_quantity"))
        mask = pc.and_(
            pc.and_(
                pc.greater_equal(ship, pa.scalar(lo, pa.int64())),
                pc.less(ship, pa.scalar(hi, pa.int64())),
            ),
            pc.and_(
                pc.and_(
                    pc.greater_equal(disc, pa.scalar(disc_lo, pa.int64())),
                    pc.less_equal(disc, pa.scalar(disc_hi, pa.int64())),
                ),
                pc.less(qty, pa.scalar(qty_max * 100, pa.int64())),
            ),
        )
        t2 = t.filter(mask)
        price = _cents(t2.column("l_extendedprice"))
        disc2 = _cents(t2.column("l_discount"))
        return pa.table({"rev": pc.multiply(price, disc2)})

    from parallel_pagerank_ray.stages.agg import global_agg

    g = global_agg(
        lineitem.select_columns(
            ["l_shipdate", "l_discount", "l_quantity", "l_extendedprice"]
        ).map_batches(partial, batch_format="pyarrow"),
        {"revenue_units": ("rev", "sum"), "n_lineitems": ("rev", "count")},
    )
    return rd.from_arrow(
        pa.table(
            {
                "revenue_units": pa.array(
                    [int(g["revenue_units"])], pa.int64()
                ),
                "n_lineitems": pa.array([int(g["n_lineitems"])], pa.int64()),
            }
        )
    )


def promo_revenue(
    lineitem: rd.Dataset,
    part: rd.Dataset,
    month: str = "1996-09",
    promo_type: str = "PROMO",
    num_partitions: int | None = None,
    broadcast_max: int = 5_000_000,
) -> rd.Dataset:
    """TPC-H Q14: share of one month's revenue from promo parts.
    Output one row (promo_units, total_units, promo_ratio) where
    promo_ratio = (100 * promo) / total as the single float division
    of two exact int64s.

    Adapted: the schema's p_type is a bare class ('PROMO'), not a
    three-word TPC-H type, so the match is equality, not a prefix.

    Scale: the month filter prunes lineitem to ~1/84 before the join;
    the part side ships only (p_partkey, is_promo int8).
    """
    if num_partitions is None:
        num_partitions = _default_parts()
    y, m = int(month[:4]), int(month[5:7])
    lo = _ts_us(f"{y:04d}-{m:02d}-01")
    ny, nm = (y + 1, 1) if m == 12 else (y, m + 1)
    hi = _ts_us(f"{ny:04d}-{nm:02d}-01")

    def li_rows(t: pa.Table) -> pa.Table:
        ship = pc.cast(t.column("l_shipdate"), pa.int64())
        t = t.filter(
            pc.and_(
                pc.greater_equal(ship, pa.scalar(lo, pa.int64())),
                pc.less(ship, pa.scalar(hi, pa.int64())),
            )
        )
        price = _cents(t.column("l_extendedprice"))
        disc = _cents(t.column("l_discount"))
        rev = pc.multiply(price, pc.subtract(pa.scalar(100, pa.int64()), disc))
        return pa.table({"l_partkey": t.column("l_partkey"), "rev": rev})

    def part_rows(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "p_partkey": t.column("p_partkey"),
                "is_promo": pc.cast(
                    pc.equal(t.column("p_type"), pa.scalar(promo_type)),
                    pa.int64(),
                ),
            }
        )

    parts_small = part.select_columns(["p_partkey", "p_type"]).map_batches(
        part_rows, batch_format="pyarrow"
    )
    # part is the genuinely small side (O(SF) rows): broadcast the
    # promo flags once (ray.put, zero-copy per batch) and fuse the
    # month filter + flag attach + revenue split into ONE lineitem
    # pass — same guard contract as revenue_by_nation; hash join only
    # beyond broadcast_max.
    from parallel_pagerank_ray.stages.agg import global_agg
    from parallel_pagerank_ray.util import count_rows_once

    n_parts, parts_small = count_rows_once(parts_small)
    pidx = None
    if n_parts <= broadcast_max:
        import ray

        pt = pa.concat_tables(ray.get(parts_small.to_arrow_refs()))
        pidx = pd.Index(pt.column("p_partkey").to_numpy())
        if not pidx.is_unique:  # get_indexer needs unique keys
            pidx = None
    if pidx is not None:
        flags_ref = ray.put(
            (pidx, pt.column("is_promo").to_numpy().astype(np.int64))
        )

        def li_split(t: pa.Table) -> pa.Table:
            t = li_rows(t)
            idx, flags = ray.get(flags_ref)
            pos = idx.get_indexer(t.column("l_partkey").to_numpy())
            rev = t.column("rev").to_numpy()
            hit = pos >= 0  # inner-join semantics: unmatched rows drop
            is_promo = flags[pos[hit]]
            rev = rev[hit]
            return pa.table(
                {
                    "promo": pa.array(rev * is_promo, pa.int64()),
                    "total": pa.array(rev, pa.int64()),
                }
            )

        g = global_agg(
            lineitem.select_columns(
                ["l_partkey", "l_extendedprice", "l_discount", "l_shipdate"]
            ).map_batches(li_split, batch_format="pyarrow"),
            {
                "promo_units": ("promo", "sum"),
                "total_units": ("total", "sum"),
            },
        )
    else:
        j = safe_join(
            lineitem.select_columns(
                ["l_partkey", "l_extendedprice", "l_discount", "l_shipdate"]
            ).map_batches(li_rows, batch_format="pyarrow"),
            parts_small,
            join_type="inner",
            num_partitions=num_partitions,
            on=("l_partkey",),
            right_on=("p_partkey",),
        )

        def split(t: pa.Table) -> pa.Table:
            rev = t.column("rev")
            return pa.table(
                {
                    "promo": pc.multiply(rev, t.column("is_promo")),
                    "total": rev,
                }
            )

        g = global_agg(
            j.map_batches(split, batch_format="pyarrow"),
            {
                "promo_units": ("promo", "sum"),
                "total_units": ("total", "sum"),
            },
        )
    promo, total = int(g["promo_units"]), int(g["total_units"])
    ratio = (
        np.float64(100 * promo) / np.float64(total) if total else np.float64(0)
    )
    return rd.from_arrow(
        pa.table(
            {
                "promo_units": pa.array([promo], pa.int64()),
                "total_units": pa.array([total], pa.int64()),
                "promo_ratio": pa.array([float(ratio)], pa.float64()),
            }
        )
    )


def top_supplier(
    lineitem: rd.Dataset,
    supplier: rd.Dataset,
    quarter_start: str = "1996-01-01",
    num_partitions: int | None = None,
) -> rd.Dataset:
    """TPC-H Q15: supplier(s) with the maximum revenue in one quarter
    — global argmax WITH ties (the reference query keeps every
    supplier equal to the max). Output (s_suppkey, s_name,
    total_revenue_units) sorted by suppkey.

    Scale: lineitem collapses to |suppliers| partials (one bucketed
    combine); the bounded per-supplier table materializes ONCE and
    serves both the max probe and the equality filter — no second
    scan of the fact table (the r3-ADVICE single-scan guard rule).
    """
    if num_partitions is None:
        num_partitions = _default_parts()
    lo = _ts_us(quarter_start)
    y, m = int(quarter_start[:4]), int(quarter_start[5:7])
    nm = m + 3
    ny, nm = (y + 1, nm - 12) if nm > 12 else (y, nm)
    hi = _ts_us(f"{ny:04d}-{nm:02d}-01")

    def li_rows(t: pa.Table) -> pa.Table:
        ship = pc.cast(t.column("l_shipdate"), pa.int64())
        t = t.filter(
            pc.and_(
                pc.greater_equal(ship, pa.scalar(lo, pa.int64())),
                pc.less(ship, pa.scalar(hi, pa.int64())),
            )
        )
        price = _cents(t.column("l_extendedprice"))
        disc = _cents(t.column("l_discount"))
        rev = pc.multiply(price, pc.subtract(pa.scalar(100, pa.int64()), disc))
        return pa.table({"l_suppkey": t.column("l_suppkey"), "rev": rev})

    from parallel_pagerank_ray.stages.agg import global_agg, grouped_agg

    per_supp = grouped_agg(
        lineitem.select_columns(
            ["l_suppkey", "l_extendedprice", "l_discount", "l_shipdate"]
        ).map_batches(li_rows, batch_format="pyarrow"),
        ["l_suppkey"],
        {"total_revenue_units": ("rev", "sum")},
    ).materialize()  # bounded: one row per supplier
    g = global_agg(per_supp, {"mx": ("total_revenue_units", "max")})
    mx = g["mx"]
    if mx is None:
        return rd.from_arrow(
            pa.table(
                {
                    "s_suppkey": pa.array([], pa.int64()),
                    "s_name": pa.array([], pa.string()),
                    "total_revenue_units": pa.array([], pa.int64()),
                }
            )
        )
    winners = per_supp.filter(
        expr=f"total_revenue_units == {int(mx)}"
    )
    j = safe_join(
        winners,
        supplier.select_columns(["s_suppkey", "s_name"]),
        join_type="inner",
        num_partitions=num_partitions,
        on=("l_suppkey",),
        right_on=("s_suppkey",),
    )

    def project(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "s_suppkey": df["l_suppkey"].astype(np.int64),
                "s_name": df["s_name"],
                "total_revenue_units": df["total_revenue_units"].astype(
                    np.int64
                ),
            }
        )

    return j.map_batches(project, batch_format="pandas").sort("s_suppkey")


DISJUNCT_CLAUSES: list[tuple[str, int, int, int, int]] = [
    # (p_brand, size_lo, size_hi, qty_lo, qty_hi) — all inclusive
    ("Brand#12", 1, 5, 1, 11),
    ("Brand#23", 1, 10, 10, 20),
    ("Brand#34", 1, 15, 20, 30),
]


def disjunctive_revenue(
    lineitem: rd.Dataset,
    part: rd.Dataset,
    clauses: list[tuple[str, int, int, int, int]] | None = None,
    num_partitions: int | None = None,
) -> rd.Dataset:
    """TPC-H Q19: revenue matched by an OR of (brand, size-range,
    quantity-range) clauses — the disjunctive-predicate join no
    single-column pushdown can serve. Output one row (revenue_units,
    n_lineitems).

    Adapted: the schema has no l_shipmode / p_container, so each
    clause is (p_brand, p_size range, l_quantity range).

    Scale: part ships only (key, brand-id int8, size); the clause
    disjunction evaluates vectorized AFTER the key join; lineitem is
    pre-pruned to the union of quantity ranges (the only predicate
    that applies to it alone).
    """
    if clauses is None:
        clauses = DISJUNCT_CLAUSES
    if num_partitions is None:
        num_partitions = _default_parts()
    qty_lo = min(c[3] for c in clauses) * 100
    qty_hi = max(c[4] for c in clauses) * 100

    def li_rows(t: pa.Table) -> pa.Table:
        qty = _cents(t.column("l_quantity"))
        t = t.append_column("qty_cents", qty)
        t = t.filter(
            pc.and_(
                pc.greater_equal(
                    t.column("qty_cents"), pa.scalar(qty_lo, pa.int64())
                ),
                pc.less_equal(
                    t.column("qty_cents"), pa.scalar(qty_hi, pa.int64())
                ),
            )
        )
        price = _cents(t.column("l_extendedprice"))
        disc = _cents(t.column("l_discount"))
        rev = pc.multiply(price, pc.subtract(pa.scalar(100, pa.int64()), disc))
        return pa.table(
            {
                "l_partkey": t.column("l_partkey"),
                "qty_cents": t.column("qty_cents"),
                "rev": rev,
            }
        )

    brands = [c[0] for c in clauses]

    def part_rows(t: pa.Table) -> pa.Table:
        bid = pc.index_in(t.column("p_brand"), pa.array(brands))
        t = pa.table(
            {
                "p_partkey": t.column("p_partkey"),
                "brand_id": pc.cast(
                    pc.fill_null(bid, -1), pa.int64()
                ),
                "p_size": pc.cast(t.column("p_size"), pa.int64()),
            }
        )
        return t.filter(
            pc.greater_equal(t.column("brand_id"), pa.scalar(0, pa.int64()))
        )

    j = safe_join(
        lineitem.select_columns(
            ["l_partkey", "l_quantity", "l_extendedprice", "l_discount"]
        ).map_batches(li_rows, batch_format="pyarrow"),
        part.select_columns(["p_partkey", "p_brand", "p_size"]).map_batches(
            part_rows, batch_format="pyarrow"
        ),
        join_type="inner",
        num_partitions=num_partitions,
        on=("l_partkey",),
        right_on=("p_partkey",),
    )

    def clause_mask(t: pa.Table) -> pa.Table:
        bid = t.column("brand_id").to_numpy(zero_copy_only=False)
        size = t.column("p_size").to_numpy(zero_copy_only=False)
        qty = t.column("qty_cents").to_numpy(zero_copy_only=False)
        keep = np.zeros(t.num_rows, dtype=bool)
        for i, (_b, slo, shi, qlo, qhi) in enumerate(clauses):
            keep |= (
                (bid == i)
                & (size >= slo)
                & (size <= shi)
                & (qty >= qlo * 100)
                & (qty <= qhi * 100)
            )
        return pa.table({"rev": t.column("rev").filter(pa.array(keep))})

    from parallel_pagerank_ray.stages.agg import global_agg

    g = global_agg(
        j.map_batches(clause_mask, batch_format="pyarrow"),
        {"revenue_units": ("rev", "sum"), "n_lineitems": ("rev", "count")},
    )
    return rd.from_arrow(
        pa.table(
            {
                "revenue_units": pa.array(
                    [int(g["revenue_units"])], pa.int64()
                ),
                "n_lineitems": pa.array([int(g["n_lineitems"])], pa.int64()),
            }
        )
    )


def waiting_suppliers(
    lineitem: rd.Dataset,
    orders: rd.Dataset,
    supplier: rd.Dataset,
    grace_days: int = 30,
    k: int = 20,
    num_partitions: int | None = None,
    broadcast_max: int = 5_000_000,
) -> rd.Dataset:
    """TPC-H Q21 shape: suppliers who were the SOLE late supplier on a
    multi-supplier order — a correlated EXISTS (another supplier
    shipped the order) plus NOT EXISTS (another supplier was also
    late), decorrelated into two per-order aggregates. Output
    (s_suppkey, s_name, numwait) top-k by (numwait desc, suppkey asc).

    Adapted: no l_commitdate/l_receiptdate in the schema, so "late" =
    the supplier's last shipment left more than ``grace_days`` after
    the order date (the late_orders_by_priority rule).

    Scale: lineitem collapses to one row per (order, supplier) before
    anything joins; both decorrelation aggregates and the qualifying
    join reuse the SAME orderkey partitioning; supplier names attach
    to a k-bounded result.
    """
    if num_partitions is None:
        num_partitions = _default_parts()
    from parallel_pagerank_ray.stages.agg import grouped_agg

    def ship_rows(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "l_orderkey": t.column("l_orderkey"),
                "l_suppkey": t.column("l_suppkey"),
                "ship_us": pc.cast(t.column("l_shipdate"), pa.int64()),
            }
        )

    per_os = grouped_agg(
        lineitem.select_columns(
            ["l_orderkey", "l_suppkey", "l_shipdate"]
        ).map_batches(ship_rows, batch_format="pyarrow"),
        ["l_orderkey", "l_suppkey"],
        {"max_ship_us": ("ship_us", "max")},
    )

    def date_rows(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "o_orderkey": t.column("o_orderkey"),
                "odate_us": pc.cast(t.column("o_orderdate"), pa.int64()),
            }
        )

    dates = orders.select_columns(["o_orderkey", "o_orderdate"]).map_batches(
        date_rows, batch_format="pyarrow"
    )
    grace_us = np.int64(grace_days) * _US_PER_DAY
    # orders dates are the small side (O(SF) rows): broadcast the
    # (orderkey -> orderdate) map under the count_rows_once guard and
    # compute the late flag inside the per-(order, supplier) rollup's
    # consumer map — no hash join; safe_join beyond the guard.
    from parallel_pagerank_ray.util import count_rows_once

    n_orders, dates = count_rows_once(dates)
    didx = None
    if n_orders <= broadcast_max:
        import ray as _ray

        dt = pa.concat_tables(_ray.get(dates.to_arrow_refs()))
        didx = pd.Index(dt.column("o_orderkey").to_numpy())
        if not didx.is_unique:  # pragma: no cover - orderkey is a PK
            didx = None
    if didx is not None:
        import ray as _ray

        dates_ref = _ray.put(
            (didx, dt.column("odate_us").to_numpy().astype(np.int64))
        )

        def flag_bcast(t: pa.Table) -> pa.Table:
            idx, od = _ray.get(dates_ref)
            pos = idx.get_indexer(t.column("l_orderkey").to_numpy())
            hit = pos >= 0  # inner-join semantics
            ms = t.column("max_ship_us").to_numpy()[hit]
            late = (ms > od[pos[hit]] + int(grace_us)).astype(np.int64)
            return pa.table(
                {
                    "l_orderkey": pa.array(
                        t.column("l_orderkey").to_numpy()[hit], pa.int64()
                    ),
                    "l_suppkey": pa.array(
                        t.column("l_suppkey").to_numpy()[hit], pa.int64()
                    ),
                    "late": pa.array(late, pa.int64()),
                }
            )

        flagged = per_os.map_batches(
            flag_bcast, batch_format="pyarrow"
        ).materialize()
    else:
        j = safe_join(
            per_os,
            dates,
            join_type="inner",
            num_partitions=num_partitions,
            on=("l_orderkey",),
            right_on=("o_orderkey",),
        )

        def flag(t: pa.Table) -> pa.Table:
            late = pc.cast(
                pc.greater(
                    t.column("max_ship_us"),
                    pc.add(
                        t.column("odate_us"),
                        pa.scalar(int(grace_us), pa.int64()),
                    ),
                ),
                pa.int64(),
            )
            return pa.table(
                {
                    "l_orderkey": t.column("l_orderkey"),
                    "l_suppkey": t.column("l_suppkey"),
                    "late": late,
                }
            )

        flagged = j.map_batches(flag, batch_format="pyarrow").materialize()
    per_order = grouped_agg(
        flagged,
        ["l_orderkey"],
        {"n_supp": ("late", "count"), "n_late": ("late", "sum")},
    )

    def sole_late_keys(t: pa.Table) -> pa.Table:
        # qualifying orders: >= 2 suppliers, exactly 1 late
        return pa.table(
            {
                "l_orderkey": t.filter(
                    pc.and_(
                        pc.greater(
                            t.column("n_supp"), pa.scalar(1, pa.int64())
                        ),
                        pc.equal(
                            t.column("n_late"), pa.scalar(1, pa.int64())
                        ),
                    )
                ).column("l_orderkey")
            }
        )

    qual_keys = per_order.map_batches(
        sole_late_keys, batch_format="pyarrow"
    )
    # the qualifying-order key set is bounded by the order count: same
    # broadcast-vs-join guard for the semi-join back onto late rows
    n_qual, qual_keys = count_rows_once(qual_keys)
    if n_qual <= broadcast_max:
        import ray as _ray

        qk = pa.concat_tables(_ray.get(qual_keys.to_arrow_refs()))
        keys_sorted = np.sort(qk.column("l_orderkey").to_numpy())
        keys_ref = _ray.put(keys_sorted)

        def semi(t: pa.Table) -> pa.Table:
            ks = _ray.get(keys_ref)
            t = t.filter(pc.equal(t.column("late"), pa.scalar(1, pa.int64())))
            ok_ = t.column("l_orderkey").to_numpy()
            pos = np.searchsorted(ks, ok_)
            hit = (pos < len(ks)) & (ks[np.minimum(pos, len(ks) - 1)] == ok_) if len(ks) else np.zeros(len(ok_), bool)
            return t.filter(pa.array(hit))

        qualifying = flagged.map_batches(semi, batch_format="pyarrow")
    else:
        q = safe_join(
            flagged.filter(expr="late == 1"),
            per_order,
            join_type="inner",
            num_partitions=num_partitions,
            on=("l_orderkey",),
        )

        def qualify(t: pa.Table) -> pa.Table:
            return t.filter(
                pc.and_(
                    pc.greater(t.column("n_supp"), pa.scalar(1, pa.int64())),
                    pc.equal(t.column("n_late"), pa.scalar(1, pa.int64())),
                )
            )

        qualifying = q.map_batches(qualify, batch_format="pyarrow")
    per_supp = grouped_agg(
        qualifying.select_columns(["l_suppkey", "late"]),
        ["l_suppkey"],
        {"numwait": ("late", "sum")},
    )
    sup_small = supplier.select_columns(["s_suppkey", "s_name"])
    n_supp, sup_small = count_rows_once(sup_small)
    if n_supp <= broadcast_max:
        import ray as _ray

        st = pa.concat_tables(_ray.get(sup_small.to_arrow_refs()))
        sidx = pd.Index(st.column("s_suppkey").to_numpy())
        names_ref = _ray.put((sidx, st.column("s_name").to_pylist()))

        def attach_names(df: pd.DataFrame) -> pd.DataFrame:
            idx, names = _ray.get(names_ref)
            pos = idx.get_indexer(df["l_suppkey"].to_numpy())
            hit = pos >= 0
            df = df[hit]
            return pd.DataFrame(
                {
                    "l_suppkey": df["l_suppkey"].astype(np.int64),
                    "s_name": [names[p] for p in pos[hit]],
                    "numwait": df["numwait"].astype(np.int64),
                }
            )

        named = per_supp.map_batches(attach_names, batch_format="pandas")
    else:
        named = safe_join(
            per_supp,
            sup_small,
            join_type="inner",
            num_partitions=num_partitions,
            on=("l_suppkey",),
            right_on=("s_suppkey",),
        )
    out = named.sort(["numwait", "l_suppkey"], descending=[True, False]).limit(k)

    def project(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "s_suppkey": df["l_suppkey"].astype(np.int64),
                "s_name": df["s_name"],
                "numwait": df["numwait"].astype(np.int64),
            }
        )

    return out.map_batches(project, batch_format="pandas")


def idle_customers(
    customer: rd.Dataset,
    orders: rd.Dataset,
    since: str = "1999-01-01",
) -> rd.Dataset:
    """TPC-H Q22 shape: per nation, the count and total balance of
    LAPSED customers — above-average positive account balance and no
    order on or after ``since``. Output (c_nationkey, n_cust,
    total_acctbal_cents) per nation.

    Adapted: the schema has no c_phone, so the grouping key is
    c_nationkey instead of the phone country code; and every synthetic
    customer has at least one lifetime order, so the NOT EXISTS is
    against the recent-order subset (same anti-join shape,
    non-vacuous result).

    The above-average comparison is EXACT integer cross-multiplication
    (acctbal_cents * n_positive > sum_positive_cents) — no float mean
    ever exists, so the result is bit-identical at any parallelism.
    Scale: the threshold is two scalars from one bounded global_agg;
    the anti-join broadcasts the distinct buyer keys under its guard
    and degrades to a hash join past it.
    """
    from parallel_pagerank_ray.stages.agg import global_agg, grouped_agg

    def bal_rows(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "c_custkey": t.column("c_custkey"),
                "c_nationkey": pc.cast(t.column("c_nationkey"), pa.int64()),
                "bal_cents": _cents(t.column("c_acctbal")),
            }
        )

    cust = (
        customer.select_columns(["c_custkey", "c_nationkey", "c_acctbal"])
        .map_batches(bal_rows, batch_format="pyarrow")
        .materialize()  # read once: threshold probe + filter reuse blocks
    )
    pos = cust.filter(expr="bal_cents > 0")
    g = global_agg(
        pos, {"s": ("bal_cents", "sum"), "n": ("bal_cents", "count")}
    )
    s, n = int(g["s"]), int(g["n"])

    def above_avg(t: pa.Table) -> pa.Table:
        if not n:
            return t.slice(0, 0)
        return t.filter(
            pc.greater(
                pc.multiply(t.column("bal_cents"), pa.scalar(n, pa.int64())),
                pa.scalar(s, pa.int64()),
            )
        )

    rich = cust.map_batches(above_avg, batch_format="pyarrow")
    cut = _ts_us(since)

    def recent(t: pa.Table) -> pa.Table:
        d = pc.cast(t.column("o_orderdate"), pa.int64())
        return t.filter(
            pc.greater_equal(d, pa.scalar(cut, pa.int64()))
        ).select(["o_custkey"])

    idle = anti_join(
        rich,
        orders.select_columns(["o_custkey", "o_orderdate"]).map_batches(
            recent, batch_format="pyarrow"
        ),
        on="c_custkey",
        right_on="o_custkey",
    )
    return grouped_agg(
        idle,
        ["c_nationkey"],
        {
            "n_cust": ("bal_cents", "count"),
            "total_acctbal_cents": ("bal_cents", "sum"),
        },
    )


def cheapest_supplier_per_part(
    lineitem: rd.Dataset,
    supplier: rd.Dataset,
    num_partitions: int | None = None,
    broadcast_max: int = 5_000_000,
) -> rd.Dataset:
    """TPC-H Q2's shape without a partsupp table: for every part, the
    supplier offering the MINIMUM observed price (min l_extendedprice
    across its lineitems), ties broken by the smaller suppkey — the
    per-group argmin pattern. Output (l_partkey, s_suppkey, s_name,
    min_price_cents).

    The argmin is ONE packed int64 min — pack = price_cents * 2^31 +
    suppkey (price_cents < 2^32-ish is validated; suppkey < 2^31) — so
    it rides the same bucketed combine as any sum, needs no join back
    to the fact table, and is deterministic by construction.
    """
    if num_partitions is None:
        num_partitions = _default_parts()
    from parallel_pagerank_ray.stages.agg import grouped_agg

    SHIFT = np.int64(1) << 31

    def packed(t: pa.Table) -> pa.Table:
        price = _cents(t.column("l_extendedprice")).to_numpy(
            zero_copy_only=False
        )
        supp = t.column("l_suppkey").to_numpy(zero_copy_only=False)
        if len(price) and (
            price.max() >= (1 << 32) or supp.max() >= SHIFT or price.min() < 0
        ):
            raise ValueError(
                "packed argmin needs price_cents < 2^32 and suppkey < 2^31"
            )
        return pa.table(
            {
                "l_partkey": t.column("l_partkey"),
                "pack": pa.array(price * SHIFT + supp, pa.int64()),
            }
        )

    mins = grouped_agg(
        lineitem.select_columns(
            ["l_partkey", "l_suppkey", "l_extendedprice"]
        ).map_batches(packed, batch_format="pyarrow"),
        ["l_partkey"],
        {"min_pack": ("pack", "min")},
    )

    def unpack(t: pa.Table) -> pa.Table:
        p = t.column("min_pack").to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "l_partkey": t.column("l_partkey"),
                "s_suppkey": pa.array(p % SHIFT, pa.int64()),
                "min_price_cents": pa.array(p // SHIFT, pa.int64()),
            }
        )

    # the supplier dimension is tiny at every TPC-H scale (100 rows/SF)
    # — broadcast it once via ray.put instead of hash-shuffling the
    # whole argmin result; the join path stays as the unbounded fallback
    from parallel_pagerank_ray.util import count_rows_once

    sup = supplier.select_columns(["s_suppkey", "s_name"])
    n_sup, sup = count_rows_once(sup)
    if n_sup <= broadcast_max:
        import ray as _ray

        st = pa.concat_tables(_ray.get(sup.to_arrow_refs()))
        keys = st.column("s_suppkey").to_numpy(zero_copy_only=False)
        order = np.argsort(keys, kind="stable")
        # sorted key array + aligned name array: membership and lookup
        # are one np.searchsorted + one Arrow take per batch — no
        # per-row Python dict probes (ADVICE r4)
        skeys = keys[order].astype(np.int64)
        snames = st.column("s_name").take(pa.array(order))
        ref = _ray.put((skeys, snames))

        def attach(t: pa.Table) -> pa.Table:
            skeys, snames = _ray.get(ref)
            p = t.column("min_pack").to_numpy(zero_copy_only=False)
            supp = p % SHIFT
            if len(skeys) == 0:
                pos_c = np.zeros(len(supp), np.int64)
                keep = np.zeros(len(supp), bool)
            else:
                pos_c = np.minimum(
                    np.searchsorted(skeys, supp), len(skeys) - 1
                )
                keep = skeys[pos_c] == supp
            return pa.table(
                {
                    "l_partkey": t.column("l_partkey").filter(
                        pa.array(keep)
                    ),
                    "s_suppkey": pa.array(supp[keep], pa.int64()),
                    "s_name": snames.take(pa.array(pos_c[keep])),
                    "min_price_cents": pa.array(
                        (p // SHIFT)[keep], pa.int64()
                    ),
                }
            )

        return mins.map_batches(attach, batch_format="pyarrow")

    j = safe_join(
        mins.map_batches(unpack, batch_format="pyarrow"),
        sup,
        join_type="inner",
        num_partitions=num_partitions,
        on=("s_suppkey",),
    )
    return j.select_columns(
        ["l_partkey", "s_suppkey", "s_name", "min_price_cents"]
    )


def market_share(
    lineitem: rd.Dataset,
    orders: rd.Dataset,
    customer: rd.Dataset,
    supplier: rd.Dataset,
    part: rd.Dataset,
    nation: pd.DataFrame,
    region: pd.DataFrame,
    target_nation: int = 7,
    region_name: str = "ASIA",
    p_type: str = "STANDARD",
    year_lo: int = 1996,
    year_hi: int = 1997,
    num_partitions: int | None = None,
    broadcast_max: int = 5_000_000,
) -> rd.Dataset:
    """TPC-H Q8: the target nation's share of a region's market for one
    part type, per order year. Output (o_year, nation_units,
    total_units, mkt_share) where *_units = sum(price_cents *
    (100 - disc_pct)) over lineitems of qualifying orders, split by
    whether the SUPPLIER sits in ``target_nation``; mkt_share is the
    single float division of the two exact int64s.

    Scale shape: the three dimension sides (part-type keys, region
    customer keys, supplier-nation flags) are O(dim) and broadcast
    once via ``ray.put``; the one O(SF) intermediate — the
    region+window (orderkey -> year) map — is broadcast only under
    ``broadcast_max`` and otherwise hash-joined. lineitem is scanned
    once, collapses to (year, flag) partials inside the scan, and the
    final exchange is at most 2 x |years| rows.
    """
    if num_partitions is None:
        num_partitions = _default_parts()
    import ray as _ray

    from parallel_pagerank_ray.stages.agg import grouped_agg
    from parallel_pagerank_ray.util import count_rows_once

    lo = _ts_us(f"{year_lo}-01-01")
    hi = _ts_us(f"{year_hi + 1}-01-01")
    rkeys = region.loc[region["r_name"] == region_name, "r_regionkey"]
    rkey = int(rkeys.iloc[0]) if len(rkeys) else -1
    region_nations = set(
        int(x)
        for x in nation.loc[
            nation["n_regionkey"] == rkey, "n_nationkey"
        ].tolist()
    )

    # dimension broadcasts: part-type keys and supplier-nation flags
    pt = pa.concat_tables(
        _ray.get(
            part.select_columns(["p_partkey", "p_type"])
            .map_batches(
                lambda t: t.filter(
                    pc.equal(t.column("p_type"), pa.scalar(p_type))
                ).select(["p_partkey"]),
                batch_format="pyarrow",
            )
            .to_arrow_refs()
        )
    )
    pkeys_ref = _ray.put(np.sort(pt.column("p_partkey").to_numpy()))
    st = pa.concat_tables(
        _ray.get(
            supplier.select_columns(["s_suppkey", "s_nationkey"]).to_arrow_refs()
        )
    )
    sidx = pd.Index(st.column("s_suppkey").to_numpy())
    sflag = (
        st.column("s_nationkey").to_numpy().astype(np.int64) == target_nation
    ).astype(np.int64)
    supp_ref = _ray.put((sidx, sflag))

    # region customer keys (O(SF x segment) — dimension-grade, sorted set)
    reg_arr = np.array(sorted(region_nations), dtype=np.int64)
    reg_ref = _ray.put(reg_arr)

    def cust_keys(t: pa.Table) -> pa.Table:
        reg = _ray.get(reg_ref)
        nk = t.column("c_nationkey").to_numpy().astype(np.int64)
        return t.filter(pa.array(np.isin(nk, reg))).select(["c_custkey"])

    ckeys = pa.concat_tables(
        _ray.get(
            customer.select_columns(["c_custkey", "c_nationkey"])
            .map_batches(cust_keys, batch_format="pyarrow")
            .to_arrow_refs()
        )
    )
    ckeys_ref = _ray.put(np.sort(ckeys.column("c_custkey").to_numpy()))

    def order_rows(t: pa.Table) -> pa.Table:
        d = pc.cast(t.column("o_orderdate"), pa.int64())
        t = t.append_column("date_us", d)
        t = t.filter(
            pc.and_(
                pc.greater_equal(t.column("date_us"), pa.scalar(lo, pa.int64())),
                pc.less(t.column("date_us"), pa.scalar(hi, pa.int64())),
            )
        )
        ks = _ray.get(ckeys_ref)
        ck = t.column("o_custkey").to_numpy()
        pos = np.searchsorted(ks, ck)
        hit = (
            (pos < len(ks)) & (ks[np.minimum(pos, len(ks) - 1)] == ck)
            if len(ks)
            else np.zeros(len(ck), dtype=bool)
        )
        t = t.filter(pa.array(hit))
        du = t.column("date_us").to_numpy()
        # exact calendar year from the us timestamp (dates are midnight UTC)
        year = (
            du.astype("datetime64[us]").astype("datetime64[Y]").astype(np.int64)
            + 1970
        )
        return pa.table(
            {
                "o_orderkey": t.column("o_orderkey"),
                "o_year": pa.array(year, pa.int64()),
            }
        )

    window_orders = orders.select_columns(
        ["o_orderkey", "o_custkey", "o_orderdate"]
    ).map_batches(order_rows, batch_format="pyarrow")

    def li_rows(t: pa.Table) -> pa.Table:
        pk = _ray.get(pkeys_ref)
        lp = t.column("l_partkey").to_numpy()
        pos = np.searchsorted(pk, lp)
        hit = (
            (pos < len(pk)) & (pk[np.minimum(pos, len(pk) - 1)] == lp)
            if len(pk)
            else np.zeros(len(lp), dtype=bool)
        )
        t = t.filter(pa.array(hit))
        price = _cents(t.column("l_extendedprice"))
        disc = _cents(t.column("l_discount"))
        rev = pc.multiply(price, pc.subtract(pa.scalar(100, pa.int64()), disc))
        idx, fl = _ray.get(supp_ref)
        spos = idx.get_indexer(t.column("l_suppkey").to_numpy())
        flag = np.where(spos >= 0, fl[np.maximum(spos, 0)], 0)
        return pa.table(
            {
                "l_orderkey": t.column("l_orderkey"),
                "rev": rev,
                "rev_nation": pc.multiply(rev, pa.array(flag, pa.int64())),
            }
        )

    li = lineitem.select_columns(
        ["l_orderkey", "l_partkey", "l_suppkey", "l_extendedprice", "l_discount"]
    ).map_batches(li_rows, batch_format="pyarrow")

    n_ord, window_orders = count_rows_once(window_orders)
    if n_ord <= broadcast_max:
        ot = pa.concat_tables(_ray.get(window_orders.to_arrow_refs()))
        oidx = pd.Index(ot.column("o_orderkey").to_numpy())
        years_ref = _ray.put(
            (oidx, ot.column("o_year").to_numpy().astype(np.int64))
        )

        def attach_year(t: pa.Table) -> pa.Table:
            idx, yr = _ray.get(years_ref)
            pos = idx.get_indexer(t.column("l_orderkey").to_numpy())
            hit = pos >= 0
            return pa.table(
                {
                    "o_year": pa.array(yr[pos[hit]], pa.int64()),
                    "rev": t.column("rev").filter(pa.array(hit)),
                    "rev_nation": t.column("rev_nation").filter(pa.array(hit)),
                }
            )

        j = li.map_batches(attach_year, batch_format="pyarrow")
    else:
        j = safe_join(
            li,
            window_orders,
            join_type="inner",
            num_partitions=num_partitions,
            on=("l_orderkey",),
            right_on=("o_orderkey",),
        ).select_columns(["o_year", "rev", "rev_nation"])

    g = grouped_agg(
        j,
        ["o_year"],
        {
            "nation_units": ("rev_nation", "sum"),
            "total_units": ("rev", "sum"),
        },
    )

    def share(df: pd.DataFrame) -> pd.DataFrame:
        df["mkt_share"] = df["nation_units"].astype(np.int64) / df[
            "total_units"
        ].astype(np.int64)
        return df[["o_year", "nation_units", "total_units", "mkt_share"]]

    return g.map_batches(share, batch_format="pandas").sort("o_year")
