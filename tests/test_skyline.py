"""Skyline / Pareto frontier operator — kernel laws + oracle parity."""

from __future__ import annotations

import duckdb
import numpy as np
import pytest
import ray.data as rd

from parallel_pagerank_ray.pipelines.relational import (
    _skyline_kernel,
    read_table,
    skyline_orders,
)

SF = "/root/testdata/sf0.001"


def brute_skyline(d: np.ndarray, p: np.ndarray) -> np.ndarray:
    """O(n^2) definition: row i survives iff no row strictly dominates
    it (d_j <= d_i, p_j >= p_i, with at least one strict)."""
    n = len(d)
    keep = np.ones(n, dtype=bool)
    for i in range(n):
        dom = (
            (d <= d[i])
            & (p >= p[i])
            & ((d < d[i]) | (p > p[i]))
        )
        if dom.any():
            keep[i] = False
    return keep


def test_skyline_kernel_matches_brute_force():
    rng = np.random.default_rng(42)
    for n in (0, 1, 7, 200):
        d = rng.integers(0, 20, size=n).astype(np.int64)
        p = rng.integers(0, 50, size=n).astype(np.int64)
        got = _skyline_kernel(d, p)
        assert got.tolist() == brute_skyline(d, p).tolist()


def test_skyline_kernel_ties_all_survive():
    # equal (d, p) pairs do not dominate each other -> all survive
    d = np.array([3, 3, 3, 1], dtype=np.int64)
    p = np.array([9, 9, 9, 9], dtype=np.int64)
    keep = _skyline_kernel(d, p)
    assert keep.tolist() == [False, False, False, True]
    d2 = np.array([1, 1], dtype=np.int64)
    p2 = np.array([5, 5], dtype=np.int64)
    assert _skyline_kernel(d2, p2).tolist() == [True, True]


def test_skyline_kernel_idempotent_and_prune_safe():
    # applying the kernel to any superset of the skyline that contains
    # the full skyline yields the same skyline (map-side prune safety)
    rng = np.random.default_rng(7)
    d = rng.integers(0, 30, size=300).astype(np.int64)
    p = rng.integers(0, 30, size=300).astype(np.int64)
    keep = _skyline_kernel(d, p)
    # local prune on two halves, then merge
    h = 150
    k1 = _skyline_kernel(d[:h], p[:h])
    k2 = _skyline_kernel(d[h:], p[h:])
    dm = np.r_[d[:h][k1], d[h:][k2]]
    pm = np.r_[p[:h][k1], p[h:][k2]]
    km = _skyline_kernel(dm, pm)
    merged = sorted(zip(dm[km].tolist(), pm[km].tolist()))
    direct = sorted(zip(d[keep].tolist(), p[keep].tolist()))
    assert merged == direct


@pytest.fixture(scope="module")
def ddb():
    con = duckdb.connect()
    con.sql(f"CREATE VIEW orders AS SELECT * FROM '{SF}/orders.parquet'")
    yield con
    con.close()


def _oracle(con) -> list[tuple]:
    return sorted(
        map(
            tuple,
            con.sql(
                """
        WITH o AS (
          SELECT o_orderkey, epoch_us(o_orderdate) AS date_us,
                 CAST(round(o_totalprice * 100) AS BIGINT) AS price_cents
          FROM orders),
        pd AS (SELECT date_us, max(price_cents) AS pmax FROM o GROUP BY 1),
        cm AS (SELECT date_us,
                      max(pmax) OVER (ORDER BY date_us) AS cmax,
                      max(pmax) OVER (ORDER BY date_us
                        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
                        AS pbefore
               FROM pd)
        SELECT a.o_orderkey, a.date_us, a.price_cents
        FROM o a JOIN cm ON cm.date_us = a.date_us
        WHERE a.price_cents = cm.cmax
          AND (cm.pbefore IS NULL OR a.price_cents > cm.pbefore)
        """
            ).fetchall(),
        )
    )


def test_skyline_orders_vs_duckdb_both_merge_paths(ddb):
    orders = read_table(
        SF, "orders", ["o_orderkey", "o_orderdate", "o_totalprice"]
    )
    exp = _oracle(ddb)
    got = sorted(
        map(tuple, skyline_orders(orders).to_pandas().itertuples(index=False))
    )
    assert got == exp
    # force the distributed single-partition merge path
    got2 = sorted(
        map(
            tuple,
            skyline_orders(orders, broadcast_max=0)
            .to_pandas()
            .itertuples(index=False),
        )
    )
    assert got2 == exp
