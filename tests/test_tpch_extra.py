"""Q13/Q7/Q10-style relational operators vs DuckDB — integer-exact."""

from __future__ import annotations

import duckdb
import numpy as np
import pandas as pd
import pytest
import ray.data as rd

from parallel_pagerank_ray.pipelines.relational import (
    order_count_distribution,
    read_table,
    returned_item_revenue,
    volume_shipping,
)

SF = "/root/testdata/sf0.001"
TABLES = ["customer", "orders", "lineitem", "supplier", "nation"]


@pytest.fixture(scope="module")
def ddb():
    con = duckdb.connect()
    for t in TABLES:
        con.sql(
            f"CREATE VIEW {t} AS SELECT * FROM '{SF}/{t}.parquet'"
        )
    yield con
    con.close()


def test_order_count_distribution_vs_duckdb(ddb):
    got = (
        order_count_distribution(
            read_table(SF, "orders"), read_table(SF, "customer")
        )
        .to_pandas()
        .sort_values("c_count")
        .reset_index(drop=True)
    )
    exp = ddb.sql(
        """
        WITH per AS (SELECT o_custkey, CAST(count(*) AS BIGINT) AS c_count
                     FROM orders WHERE o_orderpriority = '1-URGENT'
                     GROUP BY 1)
        SELECT c_count, CAST(count(*) AS BIGINT) AS custdist
        FROM per GROUP BY 1
        UNION ALL
        SELECT 0, (SELECT count(*) FROM customer) - (SELECT count(*) FROM per)
        ORDER BY c_count
        """
    ).df()
    exp = exp[exp["custdist"] > 0].reset_index(drop=True)
    assert got["c_count"].tolist() == exp["c_count"].tolist()
    assert got["custdist"].tolist() == exp["custdist"].tolist()
    # the distribution accounts for EVERY customer exactly once
    n_cust = ddb.sql("SELECT count(*) FROM customer").fetchone()[0]
    assert int(got["custdist"].sum()) == n_cust


def test_order_count_distribution_no_zero_bucket():
    # every customer orders -> no zero row emitted
    orders = rd.from_pandas(
        pd.DataFrame(
            {
                "o_custkey": np.array([1, 1, 2], dtype=np.int64),
                "o_orderpriority": ["1-URGENT"] * 3,
            }
        )
    )
    customer = rd.from_pandas(
        pd.DataFrame({"c_custkey": np.array([1, 2], dtype=np.int64)})
    )
    got = (
        order_count_distribution(orders, customer)
        .to_pandas()
        .sort_values("c_count")
    )
    assert got["c_count"].tolist() == [1, 2]
    assert got["custdist"].tolist() == [1, 1]


def test_volume_shipping_vs_duckdb(ddb):
    got = (
        volume_shipping(
            read_table(SF, "lineitem"),
            read_table(SF, "orders"),
            read_table(SF, "customer"),
            read_table(SF, "supplier"),
            read_table(SF, "nation"),
        )
        .to_pandas()
        .sort_values(["supp_nation", "cust_nation", "l_year"])
        .reset_index(drop=True)
    )
    exp = ddb.sql(
        """
        WITH rev AS (
          SELECT l.l_orderkey, s.s_nationkey AS sn,
                 CAST(EXTRACT(year FROM l.l_shipdate) AS BIGINT) AS l_year,
                 CAST(round(l.l_extendedprice * 100) AS BIGINT)
                   * (100 - CAST(round(l.l_discount * 100) AS BIGINT)) AS rev
          FROM lineitem l JOIN supplier s ON s.s_suppkey = l.l_suppkey)
        SELECT ns.n_name AS supp_nation, nc.n_name AS cust_nation,
               r.l_year, CAST(sum(r.rev) AS BIGINT) AS revenue
        FROM rev r
        JOIN orders o ON o.o_orderkey = r.l_orderkey
        JOIN customer c ON c.c_custkey = o.o_custkey
        JOIN nation ns ON ns.n_nationkey = r.sn
        JOIN nation nc ON nc.n_nationkey = c.c_nationkey
        WHERE r.sn <> c.c_nationkey
        GROUP BY 1, 2, 3 ORDER BY 1, 2, 3
        """
    ).df()
    assert len(got) == len(exp)
    for c in ["supp_nation", "cust_nation", "l_year", "revenue"]:
        assert got[c].tolist() == exp[c].tolist()


def test_volume_shipping_join_fallback_identical():
    # broadcast_max=0 forces the customer hash-join path (the supplier
    # side guard raises by contract instead)
    args = [
        read_table(SF, "lineitem"),
        read_table(SF, "orders"),
        read_table(SF, "customer"),
        read_table(SF, "supplier"),
        read_table(SF, "nation"),
    ]
    with pytest.raises(ValueError):
        volume_shipping(*args, broadcast_max=0)
    fast = (
        volume_shipping(*args)
        .to_pandas()
        .sort_values(["supp_nation", "cust_nation", "l_year"])
        .reset_index(drop=True)
    )
    slow = (
        volume_shipping(*args, broadcast_max=15)  # > suppliers, < customers
        .to_pandas()
        .sort_values(["supp_nation", "cust_nation", "l_year"])
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(fast, slow[fast.columns])


def test_returned_item_revenue_vs_duckdb(ddb):
    got = (
        returned_item_revenue(
            read_table(SF, "customer"),
            read_table(SF, "orders"),
            read_table(SF, "lineitem"),
            read_table(SF, "nation"),
        )
        .to_pandas()
        .sort_values(["revenue", "c_custkey"], ascending=[False, True])
        .reset_index(drop=True)
    )
    exp = ddb.sql(
        """
        WITH per_order AS (
          SELECT l_orderkey,
                 CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)
                      * (100 - CAST(round(l_discount * 100) AS BIGINT)))
                      AS BIGINT) AS rev
          FROM lineitem WHERE l_returnflag = 'R' GROUP BY 1),
        per_cust AS (
          SELECT o.o_custkey, CAST(sum(p.rev) AS BIGINT) AS revenue
          FROM per_order p JOIN orders o ON o.o_orderkey = p.l_orderkey
          WHERE o.o_orderdate >= TIMESTAMP '1996-01-01'
            AND o.o_orderdate < TIMESTAMP '1996-04-01'
          GROUP BY 1)
        SELECT p.o_custkey AS c_custkey, c.c_name, n.n_name,
               CAST(round(c.c_acctbal * 100) AS BIGINT) AS acctbal_cents,
               p.revenue
        FROM per_cust p
        JOIN customer c ON c.c_custkey = p.o_custkey
        JOIN nation n ON n.n_nationkey = c.c_nationkey
        ORDER BY p.revenue DESC, p.o_custkey LIMIT 20
        """
    ).df()
    assert len(got) == 20
    for c in ["c_custkey", "c_name", "n_name", "acctbal_cents", "revenue"]:
        assert got[c].tolist() == exp[c].tolist()
