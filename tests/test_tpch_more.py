"""Law tests for the remaining TPC-H shapes (tpch_more.py) on tiny
hand-built tables — argmax ties, argmin tie-break, sole-late-supplier
semantics. The value-exact DuckDB gates run in the oracle sweep."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pytest
import ray.data as rd

from parallel_pagerank_ray.pipelines.tpch_more import (
    cheapest_supplier_per_part,
    top_supplier,
    waiting_suppliers,
)


def _ts(s: str) -> np.datetime64:
    return np.datetime64(s + "T00:00:00", "us")


def _li(rows):
    # rows: (orderkey, suppkey, partkey, extendedprice, discount, shipdate)
    return rd.from_arrow(
        pa.table(
            {
                "l_orderkey": pa.array([r[0] for r in rows], pa.int64()),
                "l_suppkey": pa.array([r[1] for r in rows], pa.int64()),
                "l_partkey": pa.array([r[2] for r in rows], pa.int64()),
                "l_extendedprice": pa.array(
                    [float(r[3]) for r in rows], pa.float64()
                ),
                "l_discount": pa.array(
                    [float(r[4]) for r in rows], pa.float64()
                ),
                "l_shipdate": pa.array(
                    [_ts(r[5]) for r in rows], pa.timestamp("us")
                ),
            }
        )
    )


def _supp(keys):
    return rd.from_arrow(
        pa.table(
            {
                "s_suppkey": pa.array(keys, pa.int64()),
                "s_name": pa.array([f"S{k}" for k in keys], pa.string()),
            }
        )
    )


def test_top_supplier_keeps_all_ties():
    # suppliers 1 and 2 both gross exactly 100.00 undiscounted in-window
    li = _li(
        [
            (1, 1, 1, 100.0, 0.0, "1996-02-01"),
            (2, 2, 1, 50.0, 0.0, "1996-02-02"),
            (3, 2, 1, 50.0, 0.0, "1996-03-01"),
            (4, 3, 1, 99.0, 0.0, "1996-02-03"),
            (5, 1, 1, 999.0, 0.0, "1997-01-01"),  # out of window
        ]
    )
    out = top_supplier(li, _supp([1, 2, 3])).to_pandas()
    assert out["s_suppkey"].tolist() == [1, 2]
    assert out["total_revenue_units"].tolist() == [100_00 * 100] * 2


def test_cheapest_supplier_tiebreak_min_suppkey():
    li = _li(
        [
            (1, 7, 10, 5.0, 0.0, "1996-01-01"),
            (2, 3, 10, 5.0, 0.0, "1996-01-02"),  # same price, smaller key
            (3, 9, 10, 6.0, 0.0, "1996-01-03"),
            (4, 9, 11, 1.0, 0.0, "1996-01-04"),
        ]
    )
    out = (
        cheapest_supplier_per_part(li, _supp([3, 7, 9]))
        .to_pandas()
        .sort_values("l_partkey")
        .reset_index(drop=True)
    )
    assert out["l_partkey"].tolist() == [10, 11]
    assert out["s_suppkey"].tolist() == [3, 9]
    assert out["min_price_cents"].tolist() == [500, 100]


def test_cheapest_supplier_pack_guard():
    li = _li([(1, 5, 10, 50_000_000.0, 0.0, "1996-01-01")])
    with pytest.raises((ValueError, Exception)):
        cheapest_supplier_per_part(li, _supp([5])).to_pandas()


def test_waiting_suppliers_sole_late_only():
    def ords(rows):
        return rd.from_arrow(
            pa.table(
                {
                    "o_orderkey": pa.array([r[0] for r in rows], pa.int64()),
                    "o_orderdate": pa.array(
                        [_ts(r[1]) for r in rows], pa.timestamp("us")
                    ),
                }
            )
        )

    li = _li(
        [
            # order 1: suppliers 1 (late) and 2 (on time) -> 1 qualifies
            (1, 1, 1, 1.0, 0.0, "1996-03-15"),
            (1, 2, 1, 1.0, 0.0, "1996-01-05"),
            # order 2: suppliers 1 and 2 BOTH late -> nobody qualifies
            (2, 1, 1, 1.0, 0.0, "1996-06-01"),
            (2, 2, 1, 1.0, 0.0, "1996-06-02"),
            # order 3: single supplier, late -> no other supplier, skip
            (3, 1, 1, 1.0, 0.0, "1996-09-01"),
        ]
    )
    orders = ords([(1, "1996-01-01"), (2, "1996-01-01"), (3, "1996-01-01")])
    out = waiting_suppliers(li, orders, _supp([1, 2]), grace_days=30).to_pandas()
    assert out["s_suppkey"].tolist() == [1]
    assert out["numwait"].tolist() == [1]


def test_promo_revenue_broadcast_and_join_paths_agree():
    from parallel_pagerank_ray.pipelines.tpch_more import promo_revenue

    li = _li(
        [
            (1, 1, 10, 1000.0, 0.10, "1996-09-03"),
            (1, 1, 11, 500.0, 0.00, "1996-09-20"),
            (2, 2, 10, 200.0, 0.05, "1996-10-01"),  # outside month
            (3, 1, 12, 300.0, 0.00, "1996-09-10"),  # partkey w/o part row
        ]
    )
    part = rd.from_arrow(
        pa.table(
            {
                "p_partkey": pa.array([10, 11], pa.int64()),
                "p_type": pa.array(["PROMO", "STANDARD"], pa.string()),
            }
        )
    )
    fast = promo_revenue(li, part).to_pandas()
    slow = promo_revenue(li, part, broadcast_max=0).to_pandas()
    assert fast.equals(slow)
    # promo: 100000 cents * (100 - 10) = 9000000; total adds 50000*100
    assert int(fast["promo_units"][0]) == 100000 * 90
    assert int(fast["total_units"][0]) == 100000 * 90 + 50000 * 100


def test_market_share_hand_graph():
    # two years, one STANDARD part; nation-7 supplier takes half of 1996
    # revenue and none of 1997
    import pandas as pd

    from parallel_pagerank_ray.pipelines.tpch_more import market_share

    li = rd.from_arrow(
        pa.table(
            {
                "l_orderkey": pa.array([1, 1, 2, 3], pa.int64()),
                "l_partkey": pa.array([10, 10, 10, 20], pa.int64()),
                "l_suppkey": pa.array([100, 200, 200, 100], pa.int64()),
                "l_extendedprice": pa.array(
                    [100.0, 100.0, 50.0, 77.0], pa.float64()
                ),
                "l_discount": pa.array([0.0, 0.0, 0.0, 0.0], pa.float64()),
            }
        )
    )
    orders = rd.from_arrow(
        pa.table(
            {
                "o_orderkey": pa.array([1, 2, 3], pa.int64()),
                "o_custkey": pa.array([1, 1, 1], pa.int64()),
                "o_orderdate": pa.array(
                    [_ts("1996-05-01"), _ts("1997-05-01"), _ts("1996-06-01")],
                    pa.timestamp("us"),
                ),
            }
        )
    )
    cust = rd.from_arrow(
        pa.table(
            {
                "c_custkey": pa.array([1], pa.int64()),
                "c_nationkey": pa.array([2], pa.int32()),
            }
        )
    )
    supp = rd.from_arrow(
        pa.table(
            {
                "s_suppkey": pa.array([100, 200], pa.int64()),
                "s_nationkey": pa.array([7, 3], pa.int32()),
            }
        )
    )
    part = rd.from_arrow(
        pa.table(
            {
                "p_partkey": pa.array([10, 20], pa.int64()),
                "p_type": pa.array(["STANDARD", "PROMO"], pa.string()),
            }
        )
    )
    nation = pd.DataFrame({"n_nationkey": [2, 7], "n_regionkey": [2, 2]})
    region = pd.DataFrame({"r_regionkey": [2], "r_name": ["ASIA"]})
    out = market_share(
        li, orders, cust, supp, part, nation, region
    ).to_pandas()
    # part 20 (PROMO) excluded entirely
    assert out["o_year"].tolist() == [1996, 1997]
    assert out["nation_units"].tolist() == [100_00 * 100, 0]
    assert out["total_units"].tolist() == [200_00 * 100, 50_00 * 100]
    assert out["mkt_share"].tolist() == [0.5, 0.0]


def test_market_share_join_fallback_matches_broadcast():
    # broadcast_max=0 forces the safe_join path; results must be identical
    import pandas as pd

    from parallel_pagerank_ray.pipelines.tpch_more import market_share

    rng = np.random.default_rng(7)
    n = 400
    li = rd.from_arrow(
        pa.table(
            {
                "l_orderkey": pa.array(
                    rng.integers(1, 60, n).astype(np.int64), pa.int64()
                ),
                "l_partkey": pa.array(
                    rng.integers(1, 8, n).astype(np.int64), pa.int64()
                ),
                "l_suppkey": pa.array(
                    rng.integers(1, 6, n).astype(np.int64), pa.int64()
                ),
                "l_extendedprice": pa.array(
                    np.round(rng.uniform(1, 500, n), 2), pa.float64()
                ),
                "l_discount": pa.array(
                    np.round(rng.integers(0, 10, n) / 100.0, 2), pa.float64()
                ),
            }
        )
    )
    days = rng.integers(0, 1460, 60)
    orders = rd.from_arrow(
        pa.table(
            {
                "o_orderkey": pa.array(np.arange(1, 61), pa.int64()),
                "o_custkey": pa.array(
                    rng.integers(1, 12, 60).astype(np.int64), pa.int64()
                ),
                "o_orderdate": pa.array(
                    np.datetime64("1995-01-01", "us")
                    + days.astype("timedelta64[D]").astype("timedelta64[us]"),
                    pa.timestamp("us"),
                ),
            }
        )
    )
    cust = rd.from_arrow(
        pa.table(
            {
                "c_custkey": pa.array(np.arange(1, 12), pa.int64()),
                "c_nationkey": pa.array(
                    (np.arange(1, 12) % 25).astype(np.int32), pa.int32()
                ),
            }
        )
    )
    supp = rd.from_arrow(
        pa.table(
            {
                "s_suppkey": pa.array(np.arange(1, 6), pa.int64()),
                "s_nationkey": pa.array(
                    np.array([7, 3, 7, 1, 2], np.int32), pa.int32()
                ),
            }
        )
    )
    part = rd.from_arrow(
        pa.table(
            {
                "p_partkey": pa.array(np.arange(1, 8), pa.int64()),
                "p_type": pa.array(
                    ["STANDARD", "PROMO"] * 3 + ["STANDARD"], pa.string()
                ),
            }
        )
    )
    nation = pd.DataFrame(
        {"n_nationkey": np.arange(25), "n_regionkey": np.arange(25) % 5}
    )
    region = pd.DataFrame(
        {"r_regionkey": np.arange(5), "r_name": ["AFRICA", "AMERICA", "ASIA", "EUROPE", "MIDDLE EAST"]}
    )
    a = market_share(li, orders, cust, supp, part, nation, region).to_pandas()
    b = market_share(
        li, orders, cust, supp, part, nation, region, broadcast_max=0
    ).to_pandas()
    pd.testing.assert_frame_equal(
        a.reset_index(drop=True), b.reset_index(drop=True)
    )
