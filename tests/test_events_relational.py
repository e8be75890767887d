"""Events windows/sessionization, relational aggregates vs DuckDB, and
multimodal stage plumbing."""

from __future__ import annotations

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
import ray.data as rd

from parallel_pagerank_ray.functions.multimodal import DecodeImage, PayloadMeta
from parallel_pagerank_ray.pipelines.events import hourly_rollup, sessionize
from parallel_pagerank_ray.pipelines.relational import (
    pricing_summary,
    read_table,
    top_customers,
)

SF = "/root/testdata/sf0.001"


def _events_df():
    rng = np.random.default_rng(5)
    n = 500
    ts = pd.Timestamp("2024-01-01") + pd.to_timedelta(
        np.sort(rng.integers(0, 86400 * 3, n)), unit="s"
    )
    return pd.DataFrame(
        {
            "ts": ts,
            "user_id": rng.integers(0, 20, n).astype(np.int64),
            "event_type": np.array(["a", "b", "c"])[rng.integers(0, 3, n)],
            "value": np.round(rng.random(n) * 100, 2),
        }
    )


def test_hourly_rollup_matches_pandas():
    df = _events_df()
    got = (
        hourly_rollup(rd.from_pandas(df))
        .to_pandas()
        .sort_values(["hour", "event_type"])
        .reset_index(drop=True)
    )
    exp = (
        df.assign(
            hour=df["ts"].dt.floor("h"),
            cents=np.round(df["value"].to_numpy() * 100).astype(np.int64),
        )
        .groupby(["hour", "event_type"])
        .agg(n_events=("cents", "size"), value_cents=("cents", "sum"))
        .reset_index()
        .sort_values(["hour", "event_type"])
        .reset_index(drop=True)
    )
    assert len(got) == len(exp)
    assert (got["n_events"].to_numpy() == exp["n_events"].to_numpy()).all()
    assert (got["value_cents"].to_numpy() == exp["value_cents"].to_numpy()).all()


def test_sessionize_matches_reference():
    df = _events_df()
    got = sessionize(rd.from_pandas(df), gap_minutes=30).to_pandas()
    got = got.sort_values("user_id").reset_index(drop=True)
    exp_rows = []
    for uid, g in df.groupby("user_id"):
        ts = np.sort(g["ts"].to_numpy().astype("datetime64[us]").astype(np.int64))
        n_sessions = 1 + int((np.diff(ts) > 30 * 60 * 1_000_000).sum())
        exp_rows.append((uid, len(g), n_sessions))
    exp = pd.DataFrame(exp_rows, columns=["user_id", "n_events", "n_sessions"])
    assert got.to_dict("records") == exp.to_dict("records")


@pytest.fixture(scope="module")
def ddb():
    con = duckdb.connect()
    for t in ["lineitem", "orders", "customer"]:
        con.sql(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF}/{t}.parquet')"
        )
    return con


def test_pricing_summary_vs_duckdb(ddb):
    got = (
        pricing_summary(read_table(SF, "lineitem"))
        .to_pandas()
        .sort_values(["l_returnflag", "l_linestatus"])
        .reset_index(drop=True)
    )
    exp = ddb.sql(
        """
        SELECT l_returnflag, l_linestatus,
               CAST(sum(CAST(round(l_quantity*100) AS BIGINT)) AS BIGINT) AS sum_qty_cents,
               CAST(sum(CAST(round(l_extendedprice*100) AS BIGINT)) AS BIGINT) AS sum_price_cents,
               count(*) AS n_rows
        FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
        GROUP BY 1, 2 ORDER BY 1, 2
        """
    ).df()
    for c in ["sum_qty_cents", "sum_price_cents", "n_rows"]:
        assert (got[c].to_numpy() == exp[c].to_numpy()).all()


def test_top_customers_vs_duckdb(ddb):
    got = top_customers(
        read_table(SF, "orders"), read_table(SF, "customer"), k=10
    ).to_pandas()
    exp = ddb.sql(
        """
        SELECT c.c_custkey, count(*) AS n_orders,
               CAST(sum(CAST(round(o.o_totalprice*100) AS BIGINT)) AS BIGINT) AS revenue_cents
        FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
        GROUP BY 1 ORDER BY revenue_cents DESC, c.c_custkey LIMIT 10
        """
    ).df()
    assert got["c_custkey"].tolist() == exp["c_custkey"].tolist()
    assert got["revenue_cents"].tolist() == exp["revenue_cents"].tolist()


def test_revenue_by_nation_vs_duckdb(ddb):
    from parallel_pagerank_ray.pipelines.relational import revenue_by_nation

    for t in ("nation", "region"):
        ddb.sql(
            f"CREATE VIEW IF NOT EXISTS {t} AS "
            f"SELECT * FROM read_parquet('{SF}/{t}.parquet')"
        )
    got = (
        revenue_by_nation(
            read_table(SF, "orders", ["o_custkey", "o_totalprice"]),
            read_table(SF, "customer", ["c_custkey", "c_nationkey"]),
            read_table(SF, "nation"),
            read_table(SF, "region"),
        )
        .to_pandas()
        .sort_values(["r_name", "n_name"])
        .reset_index(drop=True)
    )
    exp = ddb.sql(
        """
        WITH rev AS (
          SELECT o_custkey, count(*) AS n_orders,
                 CAST(sum(CAST(round(o_totalprice*100) AS BIGINT)) AS BIGINT) AS cents
          FROM orders GROUP BY 1)
        SELECT r.r_name, n.n_name, count(*) AS n_customers,
               CAST(sum(rev.n_orders) AS BIGINT) AS n_orders,
               CAST(sum(rev.cents) AS BIGINT) AS revenue_cents
        FROM rev
        JOIN customer c ON c.c_custkey = rev.o_custkey
        JOIN nation n ON n.n_nationkey = c.c_nationkey
        JOIN region r ON r.r_regionkey = n.n_regionkey
        GROUP BY 1, 2 ORDER BY 1, 2
        """
    ).df()
    assert got["n_name"].tolist() == exp["n_name"].tolist()
    for c in ("n_customers", "n_orders", "revenue_cents"):
        assert got[c].to_numpy().tolist() == exp[c].to_numpy().tolist()


def test_revenue_by_nation_join_fallback_identical():
    """broadcast_max=0 forces the customer hash-join path; identical
    output to the broadcast fast path."""
    from parallel_pagerank_ray.pipelines.relational import revenue_by_nation

    args = (
        read_table(SF, "orders", ["o_custkey", "o_totalprice"]),
        read_table(SF, "customer", ["c_custkey", "c_nationkey"]),
        read_table(SF, "nation"),
        read_table(SF, "region"),
    )
    fast = (
        revenue_by_nation(*args)
        .to_pandas().sort_values(["r_name", "n_name"]).reset_index(drop=True)
    )
    joined = (
        revenue_by_nation(*args, broadcast_max=0)
        .to_pandas().sort_values(["r_name", "n_name"]).reset_index(drop=True)
    )
    for c in fast.columns:
        assert fast[c].tolist() == joined[c].tolist(), c


def test_distinct_parts_per_nation_join_fallback_identical():
    """broadcast_max=0 forces the supplier hash-join path; the output
    must be identical to the broadcast fast path."""
    from parallel_pagerank_ray.pipelines.relational import (
        distinct_parts_per_nation,
    )

    args = (
        read_table(SF, "lineitem", ["l_suppkey", "l_partkey"]),
        read_table(SF, "supplier", ["s_suppkey", "s_nationkey"]),
        read_table(SF, "nation", ["n_nationkey", "n_name"]),
    )
    fast = (
        distinct_parts_per_nation(*args, num_buckets=8)
        .to_pandas().sort_values("n_name").reset_index(drop=True)
    )
    joined = (
        distinct_parts_per_nation(*args, num_buckets=8, broadcast_max=0)
        .to_pandas().sort_values("n_name").reset_index(drop=True)
    )
    assert fast["n_name"].tolist() == joined["n_name"].tolist()
    assert fast["n_parts"].tolist() == joined["n_parts"].tolist()


def test_parts_intersect_except_join_fallback_identical():
    """broadcast_max=0 forces the supplier hash-join path; identical
    set-expression output to the broadcast fast path, and both agree
    with a pandas reference on the same inputs."""
    import pandas as pd

    from parallel_pagerank_ray.pipelines.relational import (
        parts_intersect_except,
    )

    args = (
        read_table(SF, "lineitem", ["l_suppkey", "l_partkey"]),
        read_table(SF, "supplier", ["s_suppkey", "s_nationkey"]),
    )
    fast = (
        parts_intersect_except(*args, num_buckets=8)
        .to_pandas()
    )
    fast_keys = sorted(fast["p_partkey"].tolist()) if len(fast.columns) else []
    joined = (
        parts_intersect_except(*args, num_buckets=8, broadcast_max=0)
        .to_pandas()
    )
    joined_keys = (
        sorted(joined["p_partkey"].tolist()) if len(joined.columns) else []
    )
    li = read_table(SF, "lineitem", ["l_suppkey", "l_partkey"]).to_pandas()
    sup = read_table(SF, "supplier", ["s_suppkey", "s_nationkey"]).to_pandas()
    m = li.merge(sup, left_on="l_suppkey", right_on="s_suppkey")
    sets = [
        set(m.loc[m["s_nationkey"] == k, "l_partkey"].tolist())
        for k in (0, 1, 2)
    ]
    want = sorted((sets[0] & sets[1]) - sets[2])
    assert fast_keys == want
    assert joined_keys == want


def test_multimodal_stages():
    payloads = [b"\x00\x01binary-ish" * 50, b"tiny", b""]
    t = pa.table(
        {
            "doc_id": pa.array([1, 2, 3], type=pa.int64()),
            "payload": pa.array(payloads, type=pa.binary()),
        }
    )
    ds = rd.from_arrow(t)
    meta = (
        ds.map_batches(PayloadMeta(), batch_format="pyarrow")
        .to_pandas()
        .sort_values("doc_id")
    )
    assert meta["n_bytes"].tolist() == [len(p) for p in payloads]

    fake = (
        ds.map_batches(DecodeImage(fake=True), batch_format="pyarrow")
        .to_pandas()
        .sort_values("doc_id")
    )
    assert set(fake.columns) == {"doc_id", "height", "width", "mean_luma"}
    assert (fake["height"] >= 1).all() and (fake["width"] >= 1).all()

    # real decode path: decodes with PIL where available, raises a
    # clear NotImplementedError at construction where it is not
    try:
        import PIL.Image  # noqa: F401

        has_pil = True
    except ImportError:
        has_pil = False
    if not has_pil:
        with pytest.raises(NotImplementedError):
            DecodeImage(fake=False)
    else:
        import io

        import pyarrow as _pa

        buf = io.BytesIO()
        PIL.Image.new("RGB", (4, 3), (255, 255, 255)).save(buf, format="PNG")
        img_ds = rd.from_arrow(
            _pa.table(
                {
                    "doc_id": _pa.array([0], type=_pa.int64()),
                    "payload": _pa.array([buf.getvalue()], type=_pa.binary()),
                }
            )
        )
        real = (
            img_ds.map_batches(DecodeImage(fake=False), batch_format="pyarrow")
            .to_pandas()
        )
        assert real["height"].tolist() == [3] and real["width"].tolist() == [4]
        assert real["mean_luma"].iloc[0] == 1.0


def test_hopping_rollup_matches_reference():
    from parallel_pagerank_ray.pipelines.events import hopping_rollup

    df = _events_df()
    got = (
        hopping_rollup(rd.from_pandas(df), 60, 30)
        .to_pandas()
        .sort_values(["win_start", "event_type"])
        .reset_index(drop=True)
    )
    ts = df["ts"].to_numpy().astype("datetime64[us]").astype(np.int64)
    hop = 30 * 60 * 1_000_000
    rows = []
    for j in (0, 1):
        d = df.copy()
        d["win_start"] = ((ts // hop) * hop - j * hop).astype("datetime64[us]")
        rows.append(d)
    exp = (
        pd.concat(rows)
        .assign(cents=lambda d: np.round(d["value"].to_numpy() * 100).astype(np.int64))
        .groupby(["win_start", "event_type"])
        .agg(n_events=("cents", "size"), value_cents=("cents", "sum"))
        .reset_index()
        .sort_values(["win_start", "event_type"])
        .reset_index(drop=True)
    )
    assert len(got) == len(exp)
    assert (got["n_events"].to_numpy() == exp["n_events"].to_numpy()).all()
    assert (got["value_cents"].to_numpy() == exp["value_cents"].to_numpy()).all()


def test_resize_and_frame_sample_stages():
    import pyarrow as pa

    from parallel_pagerank_ray.functions.multimodal import (
        ResizeImage,
        SampleFrames,
    )

    t = pa.table(
        {
            "doc_id": pa.array([0, 1], type=pa.int64()),
            "payload": pa.array([b"img-a", b"img-b"], type=pa.binary()),
        }
    )
    ds = rd.from_arrow(t)
    resized = (
        ds.map_batches(
            ResizeImage,
            fn_constructor_kwargs={"height": 32, "width": 16, "fake": True},
            batch_format="pyarrow",
            concurrency=1,
        )
        .to_pandas()
        .sort_values("doc_id")
    )
    assert resized["height"].tolist() == [32, 32]
    assert resized["width"].tolist() == [16, 16]
    assert resized["payload"].iloc[0] != resized["payload"].iloc[1]

    frames = (
        ds.map_batches(
            SampleFrames,
            fn_constructor_kwargs={"n_frames": 3, "fake": True},
            batch_format="pyarrow",
            concurrency=1,
        )
        .to_pandas()
        .sort_values(["doc_id", "frame_idx"])
    )
    assert len(frames) == 6  # 2 docs x 3 frames (flat-map explosion)
    assert frames["frame_idx"].tolist() == [0, 1, 2, 0, 1, 2]
    assert len(set(map(bytes, frames["frame_payload"]))) == 6

    with pytest.raises(NotImplementedError):
        SampleFrames(fake=False)


def test_asof_join_matches_pandas_merge_asof():
    from parallel_pagerank_ray.pipelines.events import asof_join

    rng = np.random.default_rng(17)
    n = 400
    base = pd.Timestamp("2024-01-01").value // 1000
    left = pd.DataFrame(
        {
            "lid": np.arange(n, dtype=np.int64),
            "key": rng.integers(0, 12, n).astype(np.int64),
            "ts": (base + np.sort(rng.integers(0, 10**9, n))).astype(
                "datetime64[us]"
            ),
        }
    )
    right = pd.DataFrame(
        {
            "rid": np.arange(1000, 1000 + n, dtype=np.int64),
            "key": rng.integers(0, 12, n).astype(np.int64),
            "ts": (base + np.sort(rng.integers(0, 10**9, n))).astype(
                "datetime64[us]"
            ),
        }
    )
    got = (
        asof_join(
            rd.from_pandas(left).repartition(3),
            rd.from_pandas(right).repartition(3),
            by_col="key",
            ts_col="ts",
            left_id="lid",
            right_id="rid",
        )
        .to_pandas()
        .sort_values("lid")
        .reset_index(drop=True)
    )
    exp = pd.merge_asof(
        left.sort_values("ts"),
        right.sort_values("ts"),
        on="ts",
        by="key",
        direction="backward",
    ).dropna(subset=["rid"])
    exp = exp.sort_values("lid").reset_index(drop=True)
    assert got["lid"].tolist() == exp["lid"].astype(np.int64).tolist()
    assert got["rid"].tolist() == exp["rid"].astype(np.int64).tolist()


def test_asof_join_no_right_rows():
    from parallel_pagerank_ray.pipelines.events import asof_join

    left = pd.DataFrame(
        {
            "lid": np.array([1, 2], dtype=np.int64),
            "key": np.array([0, 1], dtype=np.int64),
            "ts": pd.to_datetime(["2024-01-01", "2024-01-02"]),
        }
    )
    right = left.rename(columns={"lid": "rid"}).iloc[:0]
    out = asof_join(
        rd.from_pandas(left),
        rd.from_pandas(right),
        by_col="key",
        ts_col="ts",
        left_id="lid",
        right_id="rid",
    ).to_pandas()
    assert len(out) == 0  # inner as-of: nothing matches


def test_range_join_no_overlap():
    from parallel_pagerank_ray.pipelines.relational import range_join

    points = pd.DataFrame(
        {
            "pid": np.array([1, 2], dtype=np.int64),
            "v": np.array([10.0, 20.0]),
        }
    )
    intervals = pd.DataFrame(
        {
            "iid": np.array([7], dtype=np.int64),
            "lo": np.array([100.0]),
            "hi": np.array([200.0]),
        }
    )
    out = range_join(
        rd.from_pandas(points),
        rd.from_pandas(intervals),
        val_col="v",
        lo_col="lo",
        hi_col="hi",
        point_id="pid",
        interval_id="iid",
    ).to_pandas()
    assert len(out) == 0


def test_windowed_topk_users_vs_duckdb(ddb):
    from parallel_pagerank_ray.pipelines.events import windowed_topk_users

    ddb.sql(
        f"CREATE VIEW IF NOT EXISTS events AS "
        f"SELECT * FROM read_parquet('{SF}/events.parquet')"
    )
    got = (
        windowed_topk_users(read_table(SF, "events"), k=3)
        .to_pandas()
        .sort_values(["hour", "value_cents", "user_id"],
                     ascending=[True, False, True])
        .reset_index(drop=True)
    )
    exp = ddb.sql(
        """
        WITH pu AS (
          SELECT date_trunc('hour', ts) AS hour, user_id,
                 CAST(sum(CAST(round(value*100) AS BIGINT)) AS BIGINT)
                   AS value_cents
          FROM events GROUP BY 1, 2)
        SELECT hour, user_id, value_cents FROM pu
        QUALIFY row_number() OVER (
          PARTITION BY hour ORDER BY value_cents DESC, user_id) <= 3
        ORDER BY hour, value_cents DESC, user_id
        """
    ).df()
    assert got["user_id"].tolist() == exp["user_id"].tolist()
    assert got["value_cents"].tolist() == exp["value_cents"].tolist()
    assert (got.groupby("hour").size() <= 3).all()


def test_hourly_distinct_users():
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import ray.data as rd

    from parallel_pagerank_ray.pipelines.events import hourly_distinct_users

    ts = pd.to_datetime(
        [
            "2024-01-01 10:05", "2024-01-01 10:55", "2024-01-01 10:59",
            "2024-01-01 11:01", "2024-01-01 11:30",
        ]
    )
    ev = pd.DataFrame({"ts": ts, "user_id": [1, 1, 2, 1, 3]})
    ds = rd.from_arrow(pa.Table.from_pandas(ev)).repartition(2)
    got = (
        hourly_distinct_users(ds)
        .to_pandas()
        .sort_values("hour")
        .reset_index(drop=True)
    )
    assert got["n_users"].tolist() == [2, 2]  # hour 10: {1,2}; 11: {1,3}


def test_running_window_matches_pandas():
    from parallel_pagerank_ray.pipelines.events import running_window

    df = _events_df()
    df["event_id"] = np.arange(len(df), dtype=np.int64)
    got = (
        running_window(rd.from_pandas(df))
        .to_pandas()
        .sort_values("event_id")
        .reset_index(drop=True)
    )
    s = df.assign(
        cents=np.round(df["value"].to_numpy() * 100).astype(np.int64)
    ).sort_values(["user_id", "ts", "event_id"])
    grp = s.groupby("user_id", sort=False)["cents"]
    exp = (
        pd.DataFrame(
            {
                "event_id": s["event_id"].to_numpy(),
                "rn": (grp.cumcount() + 1).to_numpy(),
                "run_sum_cents": grp.cumsum().to_numpy(),
                "run_max_cents": grp.cummax().to_numpy(),
            }
        )
        .sort_values("event_id")
        .reset_index(drop=True)
    )
    assert len(got) == len(df)
    for c in ("rn", "run_sum_cents", "run_max_cents"):
        assert (got[c].to_numpy() == exp[c].to_numpy()).all(), c


def test_running_window_partition_invariance():
    from parallel_pagerank_ray.pipelines.events import running_window

    df = _events_df()
    df["event_id"] = np.arange(len(df), dtype=np.int64)
    a = (
        running_window(rd.from_pandas(df))
        .to_pandas()
        .sort_values("event_id")
        .reset_index(drop=True)
    )
    b = (
        running_window(rd.from_pandas(df).repartition(7))
        .to_pandas()
        .sort_values("event_id")
        .reset_index(drop=True)
    )
    assert a.equals(b)


def test_daily_type_pivot_matches_pandas():
    from parallel_pagerank_ray.pipelines.relational import daily_type_pivot

    df = _events_df()
    got = (
        daily_type_pivot(rd.from_pandas(df), types=["a", "b", "c"])
        .to_pandas()
        .sort_values("day")
        .reset_index(drop=True)
    )
    day = df["ts"].dt.floor("D")
    exp = (
        pd.DataFrame(
            {
                "day": day,
                **{
                    f"n_{t}": (df["event_type"] == t).astype(np.int64)
                    for t in ("a", "b", "c")
                },
                "n_total": 1,
            }
        )
        .groupby("day")
        .sum()
        .reset_index()
        .sort_values("day")
        .reset_index(drop=True)
    )
    assert len(got) == len(exp)
    for c in ("n_a", "n_b", "n_c", "n_total"):
        assert (got[c].to_numpy() == exp[c].to_numpy()).all(), c


def test_pricing_rollup_matches_duckdb():
    from parallel_pagerank_ray.pipelines.relational import pricing_rollup

    li = read_table(SF, "lineitem")
    got = pricing_rollup(li).to_pandas()
    exp = duckdb.sql(
        f"""
        SELECT l_returnflag, l_linestatus,
               CAST(sum(CAST(round(l_quantity * 100) AS BIGINT)) AS BIGINT)
                 AS sum_qty_cents,
               count(*) AS n_rows
        FROM '{SF}/lineitem.parquet'
        WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
        GROUP BY ROLLUP(l_returnflag, l_linestatus)
        """
    ).df()
    key = ["l_returnflag", "l_linestatus"]
    got = got.fillna({"l_returnflag": "", "l_linestatus": ""}).sort_values(key).reset_index(drop=True)
    exp = exp.fillna({"l_returnflag": "", "l_linestatus": ""}).sort_values(key).reset_index(drop=True)
    assert len(got) == len(exp)
    assert (got["sum_qty_cents"].to_numpy() == exp["sum_qty_cents"].to_numpy()).all()
    assert (got["n_rows"].to_numpy() == exp["n_rows"].to_numpy()).all()


def test_frequent_triples_brute_force():
    from itertools import combinations

    import numpy as np
    import pandas as pd
    import ray.data as rd

    from parallel_pagerank_ray.pipelines.relational import frequent_triples

    rng = np.random.default_rng(4)
    rows = sorted(
        {
            (int(o), int(i))
            for o, i in zip(rng.integers(0, 25, 400), rng.integers(0, 15, 400))
        }
    )
    baskets = pd.DataFrame(rows, columns=["o", "i"])
    by_order: dict = {}
    for o, i in rows:
        by_order.setdefault(o, set()).add(i)

    def support(items):
        return sum(1 for s in by_order.values() if set(items) <= s)

    strong = sorted(
        {
            (a, b)
            for s in by_order.values()
            for a, b in combinations(sorted(s), 2)
            if support((a, b)) >= 2
        }
    )
    want = sorted(
        (a, b, c, support((a, b, c)))
        for a, b, c in combinations(range(15), 3)
        if (a, b) in set(strong) and (b, c) in set(strong)
        and (a, c) in set(strong) and support((a, b, c)) >= 2
    )
    got = frequent_triples(
        rd.from_pandas(baskets).repartition(3),
        rd.from_pandas(pd.DataFrame(strong, columns=["src", "dst"])),
        min_support=2,
    ).to_pandas().sort_values(["a", "b", "c"])
    assert list(map(tuple, got.to_numpy())) == want
    assert len(want) > 0  # the fixture actually exercises the path
    # join-path fallback parity (broadcast_max_triples=0 forces it)
    slow = frequent_triples(
        rd.from_pandas(baskets).repartition(3),
        rd.from_pandas(pd.DataFrame(strong, columns=["src", "dst"])),
        min_support=2,
        broadcast_max_triples=0,
    ).to_pandas().sort_values(["a", "b", "c"])
    assert list(map(tuple, slow.to_numpy())) == want


def test_retention_cohorts_matches_pandas():
    from parallel_pagerank_ray.pipelines.events import retention_cohorts

    df = _events_df()
    got = (
        retention_cohorts(rd.from_pandas(df))
        .to_pandas()
        .sort_values(["cohort_day", "active_day"])
        .reset_index(drop=True)
    )
    ud = df.assign(day=df["ts"].dt.strftime("%Y-%m-%d"))[
        ["user_id", "day"]
    ].drop_duplicates()
    cohort = ud.groupby("user_id")["day"].min().rename("cohort_day")
    want = (
        ud.join(cohort, on="user_id")
        .groupby(["cohort_day", "day"])
        .size()
        .reset_index(name="n_users")
        .rename(columns={"day": "active_day"})
        .sort_values(["cohort_day", "active_day"])
        .reset_index(drop=True)
    )
    assert len(got) == len(want)
    assert (got["cohort_day"].to_numpy() == want["cohort_day"].to_numpy()).all()
    assert (got["active_day"].to_numpy() == want["active_day"].to_numpy()).all()
    assert (got["n_users"].to_numpy() == want["n_users"].to_numpy()).all()
    # every cohort's first cell is the diagonal (cohort_day == active_day)
    first = got.groupby("cohort_day")["active_day"].min()
    assert (first.index == first.to_numpy()).all()


def test_small_quantity_revenue_vs_duckdb(ddb):
    from parallel_pagerank_ray.pipelines.relational import (
        read_table,
        small_quantity_revenue,
    )

    got = small_quantity_revenue(read_table(SF, "lineitem"))
    want = ddb.sql(
        """
        WITH l AS (SELECT l_partkey,
                          CAST(round(l_quantity * 100) AS BIGINT) AS q,
                          CAST(round(l_extendedprice * 100) AS BIGINT) AS pr
                   FROM lineitem),
        t AS (SELECT l_partkey, sum(q) AS s, count(*) AS c FROM l GROUP BY 1)
        SELECT CAST(coalesce(sum(CASE WHEN 5 * l.q * t.c < t.s THEN l.pr END),
                    0) AS BIGINT) AS revenue_cents,
               CAST(coalesce(sum(CASE WHEN 5 * l.q * t.c < t.s THEN 1 END),
                    0) AS BIGINT) AS n_small
        FROM l JOIN t USING (l_partkey)
        """
    ).df()
    assert int(got["revenue_cents"][0]) == int(want["revenue_cents"][0])
    assert int(got["n_small"][0]) == int(want["n_small"][0])
    assert int(got["n_small"][0]) > 0


def test_butterfly_stats_known_baskets(tmp_path):
    # baskets: o1={1,2,3}, o2={1,2,3}, o3={1,2}, o4={4,5},
    # o5={1,2} with a duplicate lineitem row for part 2 (distinct-order
    # semantics must ignore it)
    import pyarrow as pa
    import pyarrow.parquet as pq

    from parallel_pagerank_ray.pipelines.relational import (
        butterflies_per_part,
        butterfly_stats,
    )

    rows = [
        (1, 1), (1, 2), (1, 3),
        (2, 1), (2, 2), (2, 3),
        (3, 1), (3, 2),
        (4, 4), (4, 5),
        (5, 1), (5, 2), (5, 2),
    ]
    pq.write_table(
        pa.table(
            {
                "l_orderkey": pa.array([r[0] for r in rows], pa.int64()),
                "l_partkey": pa.array([r[1] for r in rows], pa.int64()),
            }
        ),
        str(tmp_path / "lineitem.parquet"),
    )
    # pair weights: (1,2)->4, (1,3)->2, (2,3)->2, (4,5)->1
    got = butterfly_stats(str(tmp_path)).to_pandas().iloc[0]
    assert int(got["n_part_pairs"]) == 4
    assert int(got["n_coorders"]) == 9
    assert int(got["n_butterflies"]) == 6 + 1 + 1 + 0

    per = butterflies_per_part(str(tmp_path), k=3).to_pandas()
    assert list(zip(per["part"].astype(int), per["n_butterflies"].astype(int))) == [
        (1, 7), (2, 7), (3, 2)
    ]


def test_quantity_moments_vs_duckdb(ddb):
    from parallel_pagerank_ray.pipelines.relational import quantity_moments

    got = (
        quantity_moments(read_table(SF, "lineitem"))
        .to_pandas()
        .sort_values(["l_returnflag", "l_linestatus"])
        .reset_index(drop=True)
    )
    exp = ddb.sql(
        """
        SELECT l_returnflag, l_linestatus, count(*) AS n,
               CAST(sum(CAST(round(l_quantity) AS BIGINT)) AS BIGINT) AS s1,
               CAST(sum(CAST(round(l_quantity) AS BIGINT)
                      * CAST(round(l_quantity) AS BIGINT)) AS BIGINT) AS s2,
               CAST(sum(CAST(round(l_quantity) AS BIGINT)
                      * CAST(round(l_quantity) AS BIGINT)
                      * CAST(round(l_quantity) AS BIGINT)) AS BIGINT) AS s3
        FROM lineitem GROUP BY 1, 2 ORDER BY 1, 2
        """
    ).df()
    for c in ["n", "s1", "s2", "s3"]:
        assert (got[c].to_numpy() == exp[c].to_numpy()).all()
    # closed-form law: group variance from sufficient stats is finite,
    # non-negative (n*s2 >= s1^2 by Cauchy-Schwarz)
    assert (
        got["n"].to_numpy() * got["s2"].to_numpy()
        >= got["s1"].to_numpy() ** 2
    ).all()


def test_large_volume_orders_vs_duckdb(ddb):
    from parallel_pagerank_ray.pipelines.relational import (
        large_volume_orders,
    )

    got = (
        large_volume_orders(
            read_table(SF, "lineitem"),
            read_table(SF, "orders"),
            read_table(SF, "customer"),
            min_qty=150,
            k=12,
        )
        .to_pandas()
        .reset_index(drop=True)
    )
    exp = ddb.sql(
        """
        WITH po AS (
          SELECT l_orderkey,
                 CAST(sum(CAST(round(l_quantity) AS BIGINT)) AS BIGINT)
                   AS total_qty
          FROM lineitem GROUP BY 1 HAVING total_qty > 150)
        SELECT c.c_custkey, c.c_name, po.l_orderkey AS o_orderkey,
               strftime(o.o_orderdate, '%Y-%m-%d %H:%M:%S') AS o_orderdate,
               po.total_qty,
               CAST(round(o.o_totalprice * 100) AS BIGINT)
                 AS o_totalprice_cents
        FROM po
        JOIN orders o ON o.o_orderkey = po.l_orderkey
        JOIN customer c ON c.c_custkey = o.o_custkey
        ORDER BY o_totalprice_cents DESC, o_orderkey LIMIT 12
        """
    ).df()
    assert len(got) == 12
    for c in got.columns:
        assert (got[c].to_numpy() == exp[c].to_numpy()).all(), c


def test_funnel_conversion_ordering():
    import pyarrow as pa
    import ray.data as rd

    from parallel_pagerank_ray.pipelines.events import funnel_conversion

    rows = [
        # u1 completes in order
        (1, "view", 10), (1, "click", 20), (1, "purchase", 30),
        # u2 clicks BEFORE viewing -> stops at view
        (2, "click", 5), (2, "view", 10),
        # u3 views+clicks, purchase EXACTLY at click time (not strictly
        # after) -> stops at click
        (3, "view", 1), (3, "click", 2), (3, "purchase", 2),
        # u4 never views
        (4, "click", 1), (4, "purchase", 2),
    ]
    ev = rd.from_arrow(
        pa.table(
            {
                "user_id": pa.array([r[0] for r in rows], pa.int64()),
                "event_type": pa.array([r[1] for r in rows], pa.string()),
                "ts": pa.array(
                    [r[2] * 1_000_000 for r in rows], pa.timestamp("us")
                ),
            }
        )
    ).repartition(3)
    got = (
        funnel_conversion(ev, steps=("view", "click", "purchase"))
        .to_pandas()
        .sort_values("step")
    )
    assert got["n_users"].tolist() == [3, 2, 1]
    assert got["event_type"].tolist() == ["view", "click", "purchase"]


def test_funnel_join_fallback_identical():
    import pyarrow as pa
    import ray.data as rd

    from parallel_pagerank_ray.pipelines.events import funnel_conversion

    rng_rows = [
        (u, t, (u * 7 + k) * 1_000_000)
        for u in range(20)
        for k, t in enumerate(("view", "click", "purchase"))
    ]
    ev = rd.from_arrow(
        pa.table(
            {
                "user_id": pa.array([r[0] for r in rng_rows], pa.int64()),
                "event_type": pa.array(
                    [r[1] for r in rng_rows], pa.string()
                ),
                "ts": pa.array(
                    [r[2] for r in rng_rows], pa.timestamp("us")
                ),
            }
        )
    ).repartition(4)
    a = funnel_conversion(ev).to_pandas()
    b = funnel_conversion(ev, broadcast_max=0).to_pandas()
    assert a.equals(b)


def test_large_volume_orders_join_fallback_identical():
    from parallel_pagerank_ray.pipelines.relational import (
        large_volume_orders,
    )

    kw = dict(min_qty=150, k=12)
    a = large_volume_orders(
        read_table(SF, "lineitem"),
        read_table(SF, "orders"),
        read_table(SF, "customer"),
        **kw,
    ).to_pandas()
    b = large_volume_orders(
        read_table(SF, "lineitem"),
        read_table(SF, "orders"),
        read_table(SF, "customer"),
        broadcast_max=0,
        **kw,
    ).to_pandas()
    assert a.equals(b)


def test_hll_users_by_type_registers():
    import pyarrow as pa
    import ray.data as rd

    from parallel_pagerank_ray.pipelines.events import hll_users_by_type
    from parallel_pagerank_ray.pipelines.neighborhood import HLL_A, HLL_B

    P31 = (1 << 31) - 1
    m = 16
    rows = [(u % 37, "a" if u % 2 else "b") for u in range(500)]
    ev = rd.from_arrow(
        pa.table(
            {
                "user_id": pa.array([r[0] for r in rows], pa.int64()),
                "event_type": pa.array([r[1] for r in rows], pa.string()),
            }
        )
    ).repartition(5)
    got = {
        (r.event_type, r.r): r.rho
        for r in hll_users_by_type(ev, m=m).to_pandas().itertuples()
    }
    want: dict = {}
    for u, t in rows:
        h = (u * HLL_A + HLL_B) % P31
        r = h % m
        x = (h // m) | (1 << 27)
        rho = (x & -x).bit_length()
        want[(t, r)] = max(want.get((t, r), 0), rho)
    assert got == want
    # merge law: registers of the union == elementwise max of the parts
    eva = ev.filter(lambda row: row["event_type"] == "a")
    a_regs = {
        (r.event_type, r.r): r.rho
        for r in hll_users_by_type(eva, m=m).to_pandas().itertuples()
    }
    assert a_regs == {k: v for k, v in want.items() if k[0] == "a"}


def test_late_orders_by_priority_vs_duckdb(ddb):
    from parallel_pagerank_ray.pipelines.relational import (
        late_orders_by_priority,
    )

    got = (
        late_orders_by_priority(
            read_table(SF, "lineitem"), read_table(SF, "orders"),
            grace_days=30,
        )
        .to_pandas()
        .sort_values("o_orderpriority")
        .reset_index(drop=True)
    )
    exp = ddb.sql(
        """
        WITH ms AS (SELECT l_orderkey, max(l_shipdate) AS m
                    FROM lineitem GROUP BY 1)
        SELECT o.o_orderpriority, count(*) AS n
        FROM ms JOIN orders o ON o.o_orderkey = ms.l_orderkey
        WHERE ms.m > o.o_orderdate + INTERVAL 30 DAY
        GROUP BY 1 ORDER BY 1
        """
    ).df()
    assert got["o_orderpriority"].tolist() == exp["o_orderpriority"].tolist()
    assert got["n_late_orders"].tolist() == exp["n"].tolist()


def _ev_table(ts_us, types):
    return pa.table(
        {
            "ts": pa.array(
                np.asarray(ts_us, np.int64).astype("datetime64[us]"),
                pa.timestamp("us"),
            ),
            "event_type": pa.array(list(types), pa.string()),
        }
    )


def test_peak_concurrency_end_exclusive_tie():
    from parallel_pagerank_ray.pipelines.events import peak_concurrency

    s = 1_000_000  # 1 second in us
    ttl = 300  # seconds
    # B starts exactly when A ends -> never overlap (peak 1); C overlaps B
    ts = [0, ttl * s, ttl * s + 5 * s]
    out = peak_concurrency(
        rd.from_arrow(_ev_table(ts, ["x", "x", "x"])), ttl_seconds=ttl
    ).to_pandas()
    assert out["peak"].tolist() == [2]
    assert out["peak_t_us"].tolist() == [ttl * s + 5 * s]


def test_peak_concurrency_multiblock_matches_bruteforce():
    from parallel_pagerank_ray.pipelines.events import peak_concurrency

    rng = np.random.default_rng(11)
    n = 500
    ts = np.sort(rng.integers(0, 3_000_000_000, n)).astype(np.int64)
    rng.shuffle(ts)
    types = np.array(["a", "b", "c"])[rng.integers(0, 3, n)]
    ds = rd.from_arrow(_ev_table(ts, types)).repartition(7)
    out = (
        peak_concurrency(ds, ttl_seconds=60)
        .to_pandas()
        .set_index("event_type")
    )
    ttl_us = 60 * 1_000_000
    for et in ["a", "b", "c"]:
        t0 = np.sort(ts[types == et])
        bounds = np.concatenate(
            [
                np.stack([t0, np.ones_like(t0)], axis=1),
                np.stack([t0 + ttl_us, -np.ones_like(t0)], axis=1),
            ]
        )
        order = np.lexsort((bounds[:, 1], bounds[:, 0]))
        run = np.cumsum(bounds[order, 1])
        peak = int(run.max())
        first_t = int(bounds[order][np.argmax(run == peak), 0])
        assert int(out.loc[et, "peak"]) == peak
        assert int(out.loc[et, "peak_t_us"]) == first_t


def test_event_transitions_matches_pandas():
    from parallel_pagerank_ray.pipelines.events import event_transitions

    rng = np.random.default_rng(3)
    n = 300
    df = pd.DataFrame(
        {
            "event_id": np.arange(n, dtype=np.int64),
            "ts": pd.to_datetime(
                rng.integers(0, 10_000, n), unit="s"
            ).astype("datetime64[us]"),
            "user_id": rng.integers(0, 20, n).astype(np.int64),
            "event_type": np.array(["a", "b", "c", "d"])[
                rng.integers(0, 4, n)
            ],
        }
    )
    got = (
        event_transitions(
            rd.from_arrow(pa.Table.from_pandas(df)).repartition(5)
        )
        .to_pandas()
        .sort_values(["prev_type", "next_type"])
        .reset_index(drop=True)
    )
    s = df.sort_values(["user_id", "ts", "event_id"])
    prev = s.groupby("user_id")["event_type"].shift(1)
    want = (
        pd.DataFrame({"prev_type": prev, "next_type": s["event_type"]})
        .dropna()
        .groupby(["prev_type", "next_type"])
        .size()
        .reset_index(name="n")
        .sort_values(["prev_type", "next_type"])
        .reset_index(drop=True)
    )
    assert got["prev_type"].tolist() == want["prev_type"].tolist()
    assert got["next_type"].tolist() == want["next_type"].tolist()
    assert got["n"].tolist() == want["n"].tolist()


def test_table_profile_matches_pandas():
    from parallel_pagerank_ray.pipelines.relational import profile_table

    df = pd.DataFrame(
        {
            "a": np.array([1, 2, 2, 7, -3], np.int64),
            "b": [1.25, None, 0.5, 1.25, 2.0],
        }
    )
    got = (
        profile_table(
            rd.from_arrow(pa.Table.from_pandas(df)).repartition(3),
            int_cols=["a"],
            cents_cols=["b"],
        )
        .to_pandas()
        .set_index("col_name")
    )
    assert got.loc["a"].tolist() == [5, 0, 4, -3, 7, 9]
    # b in cents: [125, null, 50, 125, 200]
    assert got.loc["b"].tolist() == [5, 1, 3, 50, 200, 500]


def test_table_profile_all_null_column():
    from parallel_pagerank_ray.pipelines.relational import profile_table

    df = pd.DataFrame({"a": np.array([4, 4], np.int64),
                       "b": [None, None]})
    got = (
        profile_table(
            rd.from_arrow(pa.Table.from_pandas(df)),
            int_cols=["a"],
            cents_cols=["b"],
        )
        .to_pandas()
        .set_index("col_name")
    )
    assert got.loc["b"].tolist() == [2, 2, 0, 0, 0, 0]


def test_anomalous_hours_matches_pandas():
    from parallel_pagerank_ray.pipelines.events import anomalous_hours

    rng = np.random.default_rng(5)
    n = 400
    ts = rng.integers(0, 50 * 3600, n) * 1_000_000
    ts[:30] = 7 * 3600 * 1_000_000 + rng.integers(0, 3600, 30) * 1_000_000
    df = pd.DataFrame(
        {"ts": pd.to_datetime(ts, unit="us").astype("datetime64[us]")}
    )
    got = (
        anomalous_hours(
            rd.from_arrow(pa.Table.from_pandas(df)).repartition(4)
        )
        .to_pandas()
        .sort_values("hour_us")
        .reset_index(drop=True)
    )
    hours = (ts // 3_600_000_000) * 3_600_000_000
    vc = pd.Series(hours).value_counts()
    nn, s, s2 = len(vc), int(vc.sum()), int((vc**2).sum())
    want = vc[(vc * nn - s) ** 2 > 4 * (nn * s2 - s * s)].sort_index()
    assert got["hour_us"].tolist() == want.index.tolist()
    assert got["cnt"].tolist() == want.tolist()


def test_inter_event_gaps_matches_pandas():
    from parallel_pagerank_ray.pipelines.events import inter_event_gaps

    df = _events_df().reset_index(drop=True)
    df["event_id"] = np.arange(len(df), dtype=np.int64)
    got = (
        inter_event_gaps(rd.from_pandas(df))
        .to_pandas()
        .sort_values("user_id")
        .reset_index(drop=True)
    )
    rows = []
    for uid, g in df.groupby("user_id"):
        g = g.sort_values(["ts", "event_id"], kind="stable")
        t = g["ts"].to_numpy().astype("datetime64[us]").astype(np.int64)
        if len(t) < 2:
            continue
        gaps = np.sort(np.diff(t))
        rows.append(
            (
                int(uid),
                len(t),
                len(gaps),
                int(gaps.min()),
                int(gaps.max()),
                int(gaps.sum()),
                int(gaps[(len(gaps) + 1) // 2 - 1]),
            )
        )
    exp = pd.DataFrame(
        rows,
        columns=[
            "user_id", "n_events", "n_gaps", "gap_min_us",
            "gap_max_us", "gap_sum_us", "gap_p50_us",
        ],
    )
    pd.testing.assert_frame_equal(
        got[exp.columns].astype("int64"), exp.astype("int64")
    )


def test_inter_event_gaps_single_event_users_excluded():
    from parallel_pagerank_ray.pipelines.events import inter_event_gaps

    df = pd.DataFrame(
        {
            "event_id": np.array([0, 1, 2], dtype=np.int64),
            "user_id": np.array([1, 1, 2], dtype=np.int64),
            "ts": pd.to_datetime(
                ["2024-01-01 00:00:00", "2024-01-01 00:00:05", "2024-01-01 00:00:00"]
            ),
        }
    )
    out = inter_event_gaps(rd.from_pandas(df)).to_pandas()
    assert out["user_id"].tolist() == [1]
    assert out["gap_sum_us"].tolist() == [5_000_000]


def test_ema_user_cents_matches_sequential():
    from parallel_pagerank_ray.pipelines.events import ema_user_cents

    df = _events_df()
    df["event_id"] = np.arange(len(df), dtype=np.int64)
    got = (
        ema_user_cents(rd.from_pandas(df), shift=3)
        .to_pandas()
        .sort_values("event_id")
        .reset_index(drop=True)
    )
    # sequential per-user reference: plain Python recursion
    s = df.assign(
        cents=np.round(df["value"].to_numpy() * 100).astype(np.int64)
    ).sort_values(["user_id", "ts", "event_id"])
    state: dict = {}
    rows = []
    for eid, uid, cents in zip(s["event_id"], s["user_id"], s["cents"]):
        prev = state.get(uid)
        cur = int(cents) if prev is None else (prev * 7 + int(cents)) // 8
        state[uid] = cur
        rows.append((eid, cur))
    exp = (
        pd.DataFrame(rows, columns=["event_id", "ema_cents"])
        .sort_values("event_id")
        .reset_index(drop=True)
    )
    assert len(got) == len(df)
    assert (got["ema_cents"].to_numpy() == exp["ema_cents"].to_numpy()).all()


def test_ema_user_cents_partition_invariance():
    from parallel_pagerank_ray.pipelines.events import ema_user_cents

    df = _events_df()
    df["event_id"] = np.arange(len(df), dtype=np.int64)
    a = (
        ema_user_cents(rd.from_pandas(df))
        .to_pandas()
        .sort_values("event_id")
        .reset_index(drop=True)
    )
    b = (
        ema_user_cents(rd.from_pandas(df).repartition(7))
        .to_pandas()
        .sort_values("event_id")
        .reset_index(drop=True)
    )
    assert a.equals(b)


def test_order_quartiles_ntile_rule():
    from parallel_pagerank_ray.pipelines.relational import order_quartiles

    rng = np.random.default_rng(3)
    n = 400
    df = pd.DataFrame(
        {
            "o_orderkey": np.arange(n, dtype=np.int64),
            "o_custkey": rng.integers(0, 37, n).astype(np.int64),
            "o_totalprice": np.round(rng.random(n) * 1000, 2),
        }
    )
    got = (
        order_quartiles(rd.from_pandas(df).repartition(5))
        .to_pandas()
        .sort_values("o_orderkey")
        .reset_index(drop=True)
    )
    # reference: exact NTILE rule per customer
    s = df.assign(
        cents=np.round(df["o_totalprice"].to_numpy() * 100).astype(np.int64)
    ).sort_values(["o_custkey", "cents", "o_orderkey"])
    exp = {}
    for _, grp in s.groupby("o_custkey", sort=False):
        cnt = len(grp)
        big, nbig = cnt // 4 + 1, cnt % 4
        for pos, okey in enumerate(grp["o_orderkey"]):
            if pos < nbig * big:
                exp[okey] = pos // big + 1
            else:
                exp[okey] = nbig + (pos - nbig * big) // max(cnt // 4, 1) + 1
    assert len(got) == n
    assert all(exp[k] == q for k, q in zip(got["o_orderkey"], got["quartile"]))


def test_session_overlaps_matches_bruteforce():
    from parallel_pagerank_ray.pipelines.events import session_overlaps

    df = _events_df()
    got = (
        session_overlaps(rd.from_pandas(df).repartition(4), cell_minutes=45)
        .to_pandas()
        .sort_values(["user1", "user2"])
        .reset_index(drop=True)
    )
    # brute force: derive sessions sequentially, test all pairs
    gap = np.int64(30 * 60 * 1_000_000)
    iv = []
    s = df.sort_values(["user_id", "ts"])
    for uid, grp in s.groupby("user_id"):
        ts = grp["ts"].to_numpy().astype("datetime64[us]").astype(np.int64)
        start = ts[0]
        prev = ts[0]
        for t in ts[1:]:
            if t - prev > gap:
                iv.append((uid, start, prev))
                start = t
            prev = t
        iv.append((uid, start, prev))
    import collections

    exp = collections.Counter()
    for i in range(len(iv)):
        for j in range(i + 1, len(iv)):
            (u1, s1, e1), (u2, s2, e2) = iv[i], iv[j]
            if u1 != u2 and s1 <= e2 and s2 <= e1:
                exp[(min(u1, u2), max(u1, u2))] += 1
    gotc = {
        (int(a), int(b)): int(n)
        for a, b, n in zip(got["user1"], got["user2"], got["n_pairs"])
    }
    assert gotc == dict(exp)
