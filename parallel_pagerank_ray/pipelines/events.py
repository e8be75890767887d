"""Event-stream operators: tumbling-window rollups and gap sessionization.

The reference has no streaming/windowed semantics (SURVEY.md §2.9); these
are the windowed-aggregate operators a training-data pipeline needs over
an ``events``-shaped table (event_id, ts, user_id, event_type, value).

Monetary sums are carried as integer cents (``round(value*100)``) so the
distributed sum is exact and order-independent — float accumulation
order across partitions is not reproducible, integer sums are.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray.data as rd

from parallel_pagerank_ray.stages.agg import grouped_agg, resolve_num_buckets
from parallel_pagerank_ray.util import drop_empty_blocks


def hourly_rollup(events: rd.Dataset) -> rd.Dataset:
    """Tumbling 1-hour window x event_type: (hour, event_type, n_events,
    value_cents). One groupby shuffle; the window key is computed
    vectorized in the map stage (pre-aggregation happens map-side inside
    Ray Data's groupby)."""

    def keyed(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "hour": df["ts"].dt.floor("h"),
                "event_type": df["event_type"],
                "cents": np.round(df["value"].to_numpy() * 100.0).astype(np.int64),
            }
        )

    return grouped_agg(
        events.select_columns(["ts", "event_type", "value"]).map_batches(
            keyed, batch_format="pandas"
        ),
        ["hour", "event_type"],
        {
            "n_events": ("cents", "count"),
            "value_cents": ("cents", "sum"),
        },
    )


def hourly_distinct_users(events: rd.Dataset) -> rd.Dataset:
    """Tumbling 1-hour window exact COUNT(DISTINCT user_id):
    (hour, n_users). Two-level shape that never moves raw events:
    per-batch distinct (hour, user) pairs first (map-side combine),
    one bucketed global distinct, then a tiny per-hour count — the
    standard exact windowed-cardinality plan at scale."""
    from parallel_pagerank_ray.stages.agg import distinct, grouped_agg

    def keyed(df: pd.DataFrame) -> pd.DataFrame:
        out = pd.DataFrame(
            {"hour": df["ts"].dt.floor("h"), "user_id": df["user_id"]}
        )
        return out.drop_duplicates()

    pairs = distinct(
        events.select_columns(["ts", "user_id"]).map_batches(
            keyed, batch_format="pandas"
        ),
        ["hour", "user_id"],
    )
    return grouped_agg(pairs, ["hour"], {"n_users": ("user_id", "count")})


def hopping_rollup(
    events: rd.Dataset, size_minutes: int = 60, hop_minutes: int = 30
) -> rd.Dataset:
    """Hopping (sliding) window x event_type: each event lands in
    ``size/hop`` overlapping windows; output (win_start, event_type,
    n_events, value_cents).

    The window replication happens vectorized in the map stage (flat-map:
    one row -> size/hop rows keyed by window start), then one bucketed
    groupby — the standard scale shape for sliding aggregates (no
    per-window scan).
    """
    assert size_minutes % hop_minutes == 0, "size must be a multiple of hop"
    k = size_minutes // hop_minutes
    hop_us = np.int64(hop_minutes * 60 * 1_000_000)

    def keyed(df: pd.DataFrame) -> pd.DataFrame:
        ts = df["ts"].to_numpy().astype("datetime64[us]").astype(np.int64)
        cents = np.round(df["value"].to_numpy() * 100.0).astype(np.int64)
        et = df["event_type"].to_numpy()
        # newest window containing ts starts at floor(ts/hop)*hop; the
        # k-1 earlier hops also contain it
        base = (ts // hop_us) * hop_us
        starts = base[:, None] - hop_us * np.arange(k)[None, :]
        rep = np.repeat(np.arange(len(ts)), k)
        return pd.DataFrame(
            {
                "win_start": starts.reshape(-1).astype("datetime64[us]"),
                "event_type": et[rep],
                "cents": cents[rep],
            }
        )

    rolled = grouped_agg(
        events.select_columns(["ts", "event_type", "value"]).map_batches(
            keyed, batch_format="pandas"
        ),
        ["win_start", "event_type"],
        {"n_events": ("cents", "count"), "value_cents": ("cents", "sum")},
    )
    return rolled


def sessionize(events: rd.Dataset, gap_minutes: int = 30) -> rd.Dataset:
    """Gap-based sessions per user: (user_id, n_events, n_sessions).

    groupby(user_id) co-locates each user's events; the per-group kernel
    sorts by ts and counts gaps > ``gap_minutes`` — vectorized numpy, no
    cross-user state. Partitioning assumption: one user's events fit one
    worker (true at any realistic skew; salt by day for pathological
    users).
    """
    gap_us = np.int64(gap_minutes * 60 * 1_000_000)
    # size-aware: a fixed count would put bytes/32 of events in one
    # worker at scale; user_id % N keeps per-user colocation at any N
    num_buckets = resolve_num_buckets(events)

    def add_bucket(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "user_id": df["user_id"],
                "ts": df["ts"],
                "bucket": df["user_id"].to_numpy() % num_buckets,
            }
        )

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        # vectorized over every user in the bucket: sort (user, ts), a
        # session break is a >gap diff that is not a user boundary
        uid = g["user_id"].to_numpy()
        ts = g["ts"].to_numpy().astype("datetime64[us]").astype(np.int64)
        order = np.lexsort((ts, uid))
        uid, ts = uid[order], ts[order]
        new_user = np.concatenate(([True], uid[1:] != uid[:-1]))
        gap = np.concatenate(([False], np.diff(ts) > gap_us)) & ~new_user
        users = uid[new_user]
        run_id = np.cumsum(new_user) - 1
        n_events = np.bincount(run_id)
        n_sessions = 1 + np.bincount(run_id, weights=gap).astype(np.int64)
        return pd.DataFrame(
            {
                "user_id": users,
                "n_events": n_events.astype(np.int64),
                "n_sessions": n_sessions,
            }
        )

    out = (
        events.select_columns(["user_id", "ts"])
        .map_batches(add_bucket, batch_format="pandas")
        .groupby("bucket")
        .map_groups(per_bucket, batch_format="pandas")
    )
    return drop_empty_blocks(out)


def asof_join(
    left: rd.Dataset,
    right: rd.Dataset,
    by_col: str,
    ts_col: str,
    left_id: str,
    right_id: str,
    num_buckets: int | None = None,
) -> rd.Dataset:
    """Backward as-of join: for each left row, the LATEST right row with
    ``right.ts <= left.ts`` within the same ``by_col`` key (ties on ts
    broken by the larger ``right_id``). Unmatched left rows are dropped
    (inner as-of). Output: (left_id, right_id, by_col).

    Ray Data has no as-of join; this is the bucketed composition the
    engine uses for every keyed-ordered operator: one shuffle keyed by
    ``by_col % B`` (co-locates each key's rows), then a per-bucket
    vectorized merge — one lexsort + one running maximum over the
    interleaved rows, no per-key Python. Partitioning assumption: one
    key's rows fit a worker (same contract as sessionize; salt by time
    range for pathological keys).
    """
    from parallel_pagerank_ray.stages.agg import resolve_num_buckets

    if num_buckets is None:
        num_buckets = max(resolve_num_buckets(left), resolve_num_buckets(right))

    def tag(side: int):
        def fn(df: pd.DataFrame) -> pd.DataFrame:
            idc = left_id if side else right_id
            return pd.DataFrame(
                {
                    "by": df[by_col].to_numpy(),
                    "ts": df[ts_col].to_numpy().astype("datetime64[us]").astype(np.int64),
                    "flag": np.full(len(df), side, dtype=np.int64),
                    "rid": df[idc].to_numpy(),
                    "bucket": (df[by_col].to_numpy() % num_buckets).astype(np.int64),
                }
            )

        return fn

    msgs = left.map_batches(tag(1), batch_format="pandas").union(
        right.map_batches(tag(0), batch_format="pandas")
    )

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        by = g["by"].to_numpy()
        ts = g["ts"].to_numpy()
        flag = g["flag"].to_numpy()
        rid = g["rid"].to_numpy()
        # rights sort before lefts at equal (by, ts); among equal-ts
        # rights the larger rid sorts last -> running max picks it
        order = np.lexsort((rid, flag, ts, by))
        by, ts, flag, rid = by[order], ts[order], flag[order], rid[order]
        pos = np.where(flag == 0, np.arange(len(by)), -1)
        last_right = np.maximum.accumulate(pos)
        lm = flag == 1
        cand = last_right[lm]
        ok = cand >= 0
        # a carried-over right row from the previous key is filtered by
        # the key-equality check
        ok[ok] &= by[cand[ok]] == by[lm][ok]
        out_left = rid[lm][ok]
        out_right = rid[cand[ok]]
        return pd.DataFrame(
            {
                left_id: out_left,
                right_id: out_right,
                by_col: by[lm][ok],
            }
        )

    out = msgs.groupby("bucket").map_groups(merge, batch_format="pandas")
    return drop_empty_blocks(out)


def windowed_topk_users(events: rd.Dataset, k: int = 3) -> rd.Dataset:
    """Per tumbling 1-hour window: top-k users by summed spend —
    window aggregation composed with per-group ranking. Output
    (hour, user_id, value_cents), <= k rows per hour, ordered total by
    (value_cents DESC, user_id) inside each window so the boundary is
    deterministic. Two bucketed shuffles: the (hour, user) sum, then
    grouped_topk keyed by hour (map-side prune keeps at most k rows
    per window per batch)."""
    from parallel_pagerank_ray.stages.agg import grouped_agg, grouped_topk

    def keyed(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "hour": df["ts"].dt.floor("h"),
                "user_id": df["user_id"].astype(np.int64),
                "cents": np.round(df["value"].to_numpy() * 100.0).astype(np.int64),
            }
        )

    per_user = grouped_agg(
        events.select_columns(["ts", "user_id", "value"]).map_batches(
            keyed, batch_format="pandas"
        ),
        ["hour", "user_id"],
        {"value_cents": ("cents", "sum")},
    )
    return grouped_topk(
        per_user,
        ["hour"],
        ["value_cents", "user_id"],
        [False, True],
        k=k,
    )


def running_window(events: rd.Dataset) -> rd.Dataset:
    """Ordered prefix scans per user — the SQL window-function family
    ``f(...) OVER (PARTITION BY user_id ORDER BY ts, event_id ROWS
    UNBOUNDED PRECEDING)``. Output one row per event:
    (event_id, user_id, rn, run_sum_cents, run_max_cents) with

        rn            = row_number() within the user's timeline
        run_sum_cents = running sum of integer cents (exact: the scan
                        order is the total order (ts, event_id), so the
                        int64 prefix sum is bit-reproducible at any
                        parallelism)
        run_max_cents = running max of cents

    Scale shape: ONE hash shuffle keyed by user_id % B co-locates each
    user's events; the per-bucket kernel is a single lexsort plus
    C-implemented segmented scans (pandas groupby cumsum/cummax/
    cumcount) over every user in the bucket — no per-user Python.
    Partitioning assumption: one user's events fit a worker (same
    contract as sessionize; salt by time range for pathological users).
    """
    num_buckets = resolve_num_buckets(events)

    def keyed(df: pd.DataFrame) -> pd.DataFrame:
        uid = df["user_id"].to_numpy()
        return pd.DataFrame(
            {
                "event_id": df["event_id"].to_numpy(),
                "user_id": uid,
                "ts": df["ts"].to_numpy().astype("datetime64[us]").astype(np.int64),
                "cents": np.round(df["value"].to_numpy() * 100.0).astype(np.int64),
                "bucket": (uid % num_buckets).astype(np.int64),
            }
        )

    def scans(g: pd.DataFrame) -> pd.DataFrame:
        order = np.lexsort(
            (g["event_id"].to_numpy(), g["ts"].to_numpy(), g["user_id"].to_numpy())
        )
        s = g.iloc[order]
        grp = s.groupby("user_id", sort=False)["cents"]
        return pd.DataFrame(
            {
                "event_id": s["event_id"].to_numpy(),
                "user_id": s["user_id"].to_numpy(),
                "rn": (grp.cumcount() + 1).to_numpy().astype(np.int64),
                "run_sum_cents": grp.cumsum().to_numpy().astype(np.int64),
                "run_max_cents": grp.cummax().to_numpy().astype(np.int64),
            }
        )

    out = (
        events.select_columns(["event_id", "user_id", "ts", "value"])
        .map_batches(keyed, batch_format="pandas")
        .groupby("bucket")
        .map_groups(scans, batch_format="pandas")
    )
    return drop_empty_blocks(out)


def retention_cohorts(events: rd.Dataset) -> rd.Dataset:
    """Cohort retention triangle: (cohort_day, active_day, n_users) —
    n_users = users whose FIRST-ever active day is cohort_day and who
    were also active on active_day (the standard product-analytics
    retention matrix).

    Scale shape: raw events collapse map-side to distinct (user, day)
    pairs before anything moves; ONE user-keyed bucket shuffle then
    lets the in-bucket kernel see each user's full day set, compute
    the cohort (min day) and emit (cohort, day) rows; a final tiny
    grouped_agg counts per (cohort, active) cell. Days travel as
    '%Y-%m-%d' strings — integer/string-exact end to end.
    """
    num_buckets = resolve_num_buckets(events)

    def pairs(df: pd.DataFrame) -> pd.DataFrame:
        out = pd.DataFrame(
            {
                "user_id": df["user_id"].astype(np.int64),
                "day": df["ts"].dt.strftime("%Y-%m-%d"),
            }
        ).drop_duplicates()
        out["bucket"] = (
            out["user_id"].to_numpy() % np.int64(num_buckets)
        ).astype(np.int64)
        return out

    def cohorted(g: pd.DataFrame) -> pd.DataFrame:
        g = g.drop_duplicates(["user_id", "day"])
        cohort = g.groupby("user_id", sort=False)["day"].transform("min")
        return pd.DataFrame(
            {
                "cohort_day": cohort.to_numpy(),
                "active_day": g["day"].to_numpy(),
                "user_id": g["user_id"].to_numpy(),
            }
        )

    cells = (
        events.select_columns(["user_id", "ts"])
        .map_batches(pairs, batch_format="pandas")
        .groupby("bucket")
        .map_groups(cohorted, batch_format="pandas")
    )
    return grouped_agg(
        drop_empty_blocks(cells),
        ["cohort_day", "active_day"],
        {"n_users": ("user_id", "count")},
    )


def funnel_conversion(
    events: rd.Dataset,
    steps: tuple[str, ...] = ("view", "click", "purchase"),
    num_partitions: int | None = None,
    broadcast_max: int = 5_000_000,
) -> rd.Dataset:
    """Ordered funnel conversion: per step, how many users reached it
    IN ORDER — a user reaches step k at the earliest event of type
    steps[k] strictly after their step-(k-1) reach time. Output one
    row per step: (step, event_type, n_users), n_users non-increasing.

    The product-analytics staple. Scale shape: per step ONE filtered
    grouped-min (bucketed combine) and ONE attach against the previous
    step's (user, t) table — which only ever SHRINKS: while it fits
    ``broadcast_max`` it ships once via ray.put and the attach is a
    zero-copy searchsorted filter (no join); beyond the guard it falls
    back to a partitioned hash join, decided PER STEP (funnels narrow,
    so deep steps usually broadcast even when step 1 joins). No
    per-user map_groups, no sort. Timestamps compare as int64
    microseconds; counts are exact."""
    from parallel_pagerank_ray.pipelines.graph_build import (
        _default_join_partitions,
    )
    from parallel_pagerank_ray.stages.agg import grouped_agg
    from parallel_pagerank_ray.util import safe_join

    if not steps:
        raise ValueError("funnel_conversion needs >= 1 step")
    if num_partitions is None:
        num_partitions = _default_join_partitions()
    ev = events.select_columns(["user_id", "event_type", "ts"])

    def typed(step: str):
        def inner(t: pa.Table) -> pa.Table:
            keep = t.filter(pc.equal(t.column("event_type"), step))
            return pa.table(
                {
                    "user_id": keep.column("user_id"),
                    "tus": pc.cast(keep.column("ts"), pa.int64()),
                }
            )

        return inner

    import ray

    reach: rd.Dataset | None = None
    reach_ref = None  # (sorted user array, aligned reach times) or None
    counts: list[tuple[int, str, int]] = []
    for i, step in enumerate(steps):
        cand = ev.map_batches(typed(step), batch_format="pyarrow")
        if reach_ref is not None:
            # broadcast fast path: the previous step's (user, t) table
            # fits the guard — filter with one zero-copy lookup, no join
            def bfilter(t: pa.Table, _ref=reach_ref) -> pa.Table:
                users, times = ray.get(_ref)
                u = t.column("user_id").to_numpy(zero_copy_only=False)
                idx = np.searchsorted(users, u)
                idx = np.clip(idx, 0, max(len(users) - 1, 0))
                hit = (users[idx] == u) if len(users) else np.zeros(
                    len(u), dtype=bool
                )
                after = np.zeros(len(u), dtype=bool)
                after[hit] = (
                    t.column("tus").to_numpy(zero_copy_only=False)[hit]
                    > times[idx[hit]]
                )
                return t.filter(pa.array(after))

            cand = cand.map_batches(bfilter, batch_format="pyarrow")
        elif reach is not None:
            j = safe_join(
                cand,
                reach.rename_columns({"user_id": "__u", "t": "__t"}),
                join_type="inner",
                num_partitions=num_partitions,
                on=("user_id",),
                right_on=("__u",),
            )
            cand = j.map_batches(
                lambda t: t.filter(
                    pc.greater(t.column("tus"), t.column("__t"))
                ).select(["user_id", "tus"]),
                batch_format="pyarrow",
            )
        reach = grouped_agg(
            cand, ["user_id"], {"t": ("tus", "min")}
        ).materialize()
        n_reach = reach.count()
        counts.append((i + 1, step, n_reach))
        if n_reach <= broadcast_max:
            tbls = [t for t in ray.get(reach.to_arrow_refs()) if t.num_rows]
            if tbls:
                users = np.concatenate(
                    [t.column("user_id").to_numpy() for t in tbls]
                )
                times = np.concatenate(
                    [t.column("t").to_numpy() for t in tbls]
                )
                order = np.argsort(users)
                reach_ref = ray.put((users[order], times[order]))
            else:
                reach_ref = ray.put(
                    (
                        np.array([], dtype=np.int64),
                        np.array([], dtype=np.int64),
                    )
                )
        else:
            reach_ref = None
    return rd.from_arrow(
        pa.table(
            {
                "step": pa.array([c[0] for c in counts], pa.int64()),
                "event_type": pa.array([c[1] for c in counts], pa.string()),
                "n_users": pa.array(
                    [np.int64(c[2]) for c in counts], pa.int64()
                ),
            }
        )
    )


def hll_users_by_type(events: rd.Dataset, m: int = 16) -> rd.Dataset:
    """Per-group HyperLogLog registers: for each event_type the max
    rho per touched register -> (event_type, r, rho) — the mergeable
    approximate-distinct-per-group sketch (one tiny sketch per group
    instead of a distinct shuffle; merging two time ranges = register
    max). Register values are EXACT integers (hashing-policy affine
    chain, same arithmetic as pipelines/neighborhood.py HyperANF), so
    the gate value-checks the sketch itself; the float estimate is one
    driver-side fold the caller owns.

    Scale shape: one stateless map (vectorized hash + rho) and ONE
    bucketed grouped max whose key space is |groups| x m — constant
    per group regardless of user count."""
    from parallel_pagerank_ray.pipelines.neighborhood import HLL_A, HLL_B
    from parallel_pagerank_ray.stages.agg import grouped_agg

    P31 = (1 << 31) - 1

    def regs(t: pa.Table) -> pa.Table:
        u = t.column("user_id").to_numpy(zero_copy_only=False).astype(
            np.int64
        )
        h = (u * HLL_A + HLL_B) % P31
        r = (h % m).astype(np.int64)
        x = (h // m) | (1 << 27)
        rho = np.log2(x & -x).astype(np.int64) + 1
        return pa.table(
            {
                "event_type": t.column("event_type"),
                "r": pa.array(r, pa.int64()),
                "rho": pa.array(rho, pa.int64()),
            }
        )

    return grouped_agg(
        events.select_columns(["event_type", "user_id"]).map_batches(
            regs, batch_format="pyarrow"
        ),
        ["event_type", "r"],
        {"rho": ("rho", "max")},
    )


def peak_concurrency(
    events: rd.Dataset, ttl_seconds: int = 300
) -> rd.Dataset:
    """Peak interval overlap per event type — every event opens a
    [ts, ts + ttl) activity interval; report, per event_type, the
    maximum number of simultaneously-open intervals and the earliest
    microsecond timestamp at which that peak is first attained.
    Output (event_type, peak, peak_t_us), sorted by event_type.

    Exactness: the classic +1/-1 boundary sweep over the total order
    (event_type, t, d) with d = -1 (close) sorting BEFORE d = +1
    (open) at equal t — end-exclusive intervals, so an interval ending
    exactly when another starts never overlaps it. Every running count
    is an int64 prefix sum over that total order, so the result is
    bit-reproducible at any parallelism and DuckDB replays it with one
    window function.

    Scale shape: ONE range-sort of the 2x|events| boundary table; the
    prefix sums are per-sorted-block segmented cumsums plus a driver
    fold of #blocks x #types scalar carries (the only driver pull) —
    no event_type ever needs to fit one worker, unlike a naive
    groupby(event_type).map_groups scan.
    """
    import ray

    ttl_us = int(ttl_seconds) * 1_000_000

    def deltas(t: pa.Table) -> pa.Table:
        ts = pc.cast(t.column("ts"), pa.int64()).to_numpy(
            zero_copy_only=False
        )
        et = np.asarray(t.column("event_type").to_pylist(), dtype=object)
        n = len(ts)
        return pa.table(
            {
                "event_type": pa.array(
                    np.concatenate([et, et]), pa.string()
                ),
                "t": pa.array(
                    np.concatenate([ts, ts + ttl_us]), pa.int64()
                ),
                "d": pa.array(
                    np.concatenate(
                        [np.ones(n, np.int64), np.full(n, -1, np.int64)]
                    ),
                    pa.int64(),
                ),
            }
        )

    boundary = (
        events.select_columns(["ts", "event_type"])
        .map_batches(deltas, batch_format="pyarrow")
        .sort(["event_type", "t", "d"])
        .materialize()
    )
    refs = boundary.to_arrow_refs()

    @ray.remote
    def block_sums(tbl: pa.Table):
        if tbl.num_rows == 0:
            return []
        df = tbl.to_pandas()
        g = df.groupby("event_type", sort=False)["d"].sum()
        return list(zip(g.index.tolist(), g.to_numpy().tolist()))

    @ray.remote
    def block_peak(tbl: pa.Table, carry: dict):
        if tbl.num_rows == 0:
            return []
        df = tbl.to_pandas()
        run = df.groupby("event_type", sort=False)["d"].cumsum().to_numpy()
        base = (
            df["event_type"].map(lambda s: carry.get(s, 0)).to_numpy()
        )
        run = run + base
        df["run"] = run
        out = []
        for et, g in df.groupby("event_type", sort=False):
            r = g["run"].to_numpy()
            peak = int(r.max())
            first = int(g["t"].to_numpy()[int(np.argmax(r == peak))])
            out.append((et, peak, first))
        return out

    sums = ray.get([block_sums.remote(r) for r in refs])
    carries: list[dict] = []
    acc: dict[str, int] = {}
    live = []
    for r, s in zip(refs, sums):
        if not s:
            continue
        carries.append(dict(acc))
        live.append(r)
        for et, dsum in s:
            acc[et] = acc.get(et, 0) + int(dsum)
    peaks = ray.get(
        [
            block_peak.remote(r, ray.put(c) if len(c) > 64 else c)
            for r, c in zip(live, carries)
        ]
    )
    best: dict[str, tuple[int, int]] = {}
    for block in peaks:
        for et, peak, first in block:
            cur = best.get(et)
            if cur is None or peak > cur[0]:
                best[et] = (peak, first)
            # equal peak in a LATER block never improves: blocks are in
            # (event_type, t) order, so the first block reaching the
            # global max holds the earliest attaining timestamp
    rows = sorted(best.items())
    return rd.from_arrow(
        pa.table(
            {
                "event_type": pa.array([r[0] for r in rows], pa.string()),
                "peak": pa.array(
                    [r[1][0] for r in rows], pa.int64()
                ),
                "peak_t_us": pa.array(
                    [r[1][1] for r in rows], pa.int64()
                ),
            }
        )
    )


def event_transitions(events: rd.Dataset) -> rd.Dataset:
    """Per-user event-type transition counts — the next-action Markov
    sufficient statistic behind session-based recommendation: for every
    user's timeline ordered by the total order (ts, event_id), count
    adjacent (prev_type, next_type) pairs globally. Output
    (prev_type, next_type, n), n int64.

    Scale shape: ONE hash shuffle keyed user_id % B co-locates each
    user's events (the sessionize/running_window contract); the
    per-bucket kernel is a lexsort + shifted-array compare over every
    user in the bucket (no per-user Python), emitting per-bucket
    (prev, next) count partials; a tiny |types|^2 combine finishes.
    """
    num_buckets = resolve_num_buckets(events)

    def keyed(df: pd.DataFrame) -> pd.DataFrame:
        uid = df["user_id"].to_numpy()
        return pd.DataFrame(
            {
                "user_id": uid,
                "event_id": df["event_id"].to_numpy(),
                "ts": df["ts"].to_numpy().astype("datetime64[us]").astype(np.int64),
                "event_type": df["event_type"].astype(str).to_numpy(),
                "bucket": (uid % num_buckets).astype(np.int64),
            }
        )

    def pairs(g: pd.DataFrame) -> pd.DataFrame:
        order = np.lexsort(
            (
                g["event_id"].to_numpy(),
                g["ts"].to_numpy(),
                g["user_id"].to_numpy(),
            )
        )
        uid = g["user_id"].to_numpy()[order]
        et = g["event_type"].to_numpy()[order]
        if len(uid) < 2:
            return pd.DataFrame(
                {
                    "prev_type": pd.Series([], dtype=str),
                    "next_type": pd.Series([], dtype=str),
                    "n": pd.Series([], dtype=np.int64),
                }
            )
        same = uid[1:] == uid[:-1]
        out = (
            pd.DataFrame(
                {"prev_type": et[:-1][same], "next_type": et[1:][same]}
            )
            .groupby(["prev_type", "next_type"], sort=False)
            .size()
            .reset_index(name="n")
        )
        out["n"] = out["n"].astype(np.int64)
        return out

    return grouped_agg(
        events.select_columns(["event_id", "user_id", "ts", "event_type"])
        .map_batches(keyed, batch_format="pandas")
        .groupby("bucket")
        .map_groups(pairs, batch_format="pandas"),
        ["prev_type", "next_type"],
        {"n": ("n", "sum")},
        num_buckets=8,
    )


def anomalous_hours(events: rd.Dataset, k_sigma: int = 2) -> rd.Dataset:
    """Hours whose event count deviates from the corpus mean by more
    than ``k_sigma`` standard deviations — the basic traffic-anomaly
    screen, computed EXACTLY in integers (no float mean/std ever
    exists):

        flag(x)  <=>  (x*N - S)^2 * 1 > k^2 * (N*S2 - S^2) / N ...
        cleared of denominators:  N * (x*N - S)^2 > k^2 * N * (N*S2 - S^2) / N
        i.e.  (x*N - S)^2 > k^2 * (N*S2 - S^2)

    with N = #hours, S = sum of counts, S2 = sum of squared counts
    ((x - S/N)^2 > k^2 * (S2/N - (S/N)^2) cross-multiplied by N^2).
    Output (hour_us, cnt) for flagged hours. int64 contract:
    k^2 * N * S2 must fit (validated) — at web scale pre-aggregate per
    shard, the sufficient statistic is three scalars.

    Scale shape: one bucketed hourly combine + one 3-scalar global
    fold + one stateless filter — no shuffle beyond the hourly counts.
    """
    hourly = grouped_agg(
        events.select_columns(["ts"]).map_batches(
            lambda t: pa.table(
                {
                    "hour_us": pc.multiply(
                        pc.divide(pc.cast(t.column("ts"), pa.int64()),
                                  pa.scalar(3_600_000_000, pa.int64())),
                        pa.scalar(3_600_000_000, pa.int64()),
                    ),
                    "one": pa.array(
                        np.ones(t.num_rows, np.int64), pa.int64()
                    ),
                }
            ),
            batch_format="pyarrow",
        ),
        ["hour_us"],
        {"cnt": ("one", "sum")},
    ).materialize()

    from parallel_pagerank_ray.stages.agg import global_agg

    def sq(t: pa.Table) -> pa.Table:
        c = t.column("cnt")
        return pa.table(
            {"cnt": c, "cnt2": pc.multiply(c, c)}
        )

    g = global_agg(
        hourly.map_batches(sq, batch_format="pyarrow"),
        {"n": ("cnt", "count"), "s": ("cnt", "sum"), "s2": ("cnt2", "sum")},
    )
    n, s, s2 = int(g["n"] or 0), int(g["s"] or 0), int(g["s2"] or 0)
    if n == 0:
        return hourly.filter(expr="cnt < 0")  # empty, schema kept
    if k_sigma * k_sigma * n * s2 > 2**62:
        raise ValueError(
            "anomalous_hours int64 overflow: pre-scale the counts"
        )
    thresh = k_sigma * k_sigma * (n * s2 - s * s)

    def flag(t: pa.Table) -> pa.Table:
        x = t.column("cnt").to_numpy(zero_copy_only=False)
        dev = x * n - s
        keep = dev * dev > thresh
        return t.filter(pa.array(keep))

    return hourly.map_batches(flag, batch_format="pyarrow")


def inter_event_gaps(events: rd.Dataset) -> rd.Dataset:
    """Per-user inter-arrival statistics — the window-lag family
    (``t - lag(t) OVER (PARTITION BY user_id ORDER BY ts, event_id)``)
    folded to one row per user with >= 2 events:

        (user_id, n_events, n_gaps, gap_min_us, gap_max_us,
         gap_sum_us, gap_p50_us)

    All integer microseconds (exact); gap_p50_us follows the repo's
    quantile_disc rule — sorted-gap element at index ceil(0.5*n) - 1 —
    so the DuckDB oracle matches hash-exact.

    Scale shape: ONE hash shuffle keyed by user_id % B (same contract
    as running_window / sessionize: one user's events fit a worker);
    the per-bucket kernel is a single lexsort, one vectorized diff, and
    C-implemented pandas groupby folds — no per-user Python. The median
    needs no second shuffle: gaps are already co-located per user, so a
    (user, gap) sort + cumcount index-pick inside the same kernel is
    exact.
    """
    num_buckets = resolve_num_buckets(events)

    def keyed(df: pd.DataFrame) -> pd.DataFrame:
        uid = df["user_id"].to_numpy()
        return pd.DataFrame(
            {
                "event_id": df["event_id"].to_numpy(),
                "user_id": uid,
                "ts": df["ts"].to_numpy().astype("datetime64[us]").astype(np.int64),
                "bucket": (uid % num_buckets).astype(np.int64),
            }
        )

    def fold(g: pd.DataFrame) -> pd.DataFrame:
        order = np.lexsort(
            (g["event_id"].to_numpy(), g["ts"].to_numpy(), g["user_id"].to_numpy())
        )
        uid = g["user_id"].to_numpy()[order]
        t = g["ts"].to_numpy()[order]
        if len(uid) < 2:
            return pd.DataFrame()
        same = uid[1:] == uid[:-1]
        gdf = pd.DataFrame(
            {"user_id": uid[1:][same], "gap": (t[1:] - t[:-1])[same]}
        )
        if len(gdf) == 0:
            return pd.DataFrame()
        agg = (
            gdf.groupby("user_id", sort=True)["gap"]
            .agg(n_gaps="size", gap_min_us="min", gap_max_us="max", gap_sum_us="sum")
            .reset_index()
        )
        # discrete median: per-user sorted gaps, element at ceil(n/2)-1
        s = gdf.sort_values(["user_id", "gap"], kind="stable")
        pos = s.groupby("user_id", sort=False).cumcount().to_numpy()
        n = s.groupby("user_id", sort=False)["gap"].transform("size").to_numpy(np.int64)
        med = s.loc[pos == (n + 1) // 2 - 1, ["user_id", "gap"]].rename(
            columns={"gap": "gap_p50_us"}
        )
        out = agg.merge(med, on="user_id")
        out["n_events"] = (out["n_gaps"] + 1).astype(np.int64)
        for c in ("n_gaps", "gap_min_us", "gap_max_us", "gap_sum_us", "gap_p50_us"):
            out[c] = out[c].astype(np.int64)
        return out[
            [
                "user_id",
                "n_events",
                "n_gaps",
                "gap_min_us",
                "gap_max_us",
                "gap_sum_us",
                "gap_p50_us",
            ]
        ]

    out = (
        events.select_columns(["event_id", "user_id", "ts"])
        .map_batches(keyed, batch_format="pandas")
        .groupby("bucket")
        .map_groups(fold, batch_format="pandas")
    )
    return drop_empty_blocks(out)


def ema_user_cents(events: rd.Dataset, shift: int = 3) -> rd.Dataset:
    """Per-user exponential moving average of event value — the
    classic RECURSIVE per-key scan (ema_t depends on ema_{t-1}), the
    one window shape ``running_window``'s associative cumsums can't
    express. Integer-exact by construction: alpha = 1/2**shift and

        ema_1 = cents_1
        ema_t = (ema_{t-1} * (2**shift - 1) + cents_t) // 2**shift

    (floor division, int64), so every parallel run and a SQL
    recursive CTE reproduce identical values — no float decay drift.
    Output one row per event: (event_id, user_id, rn, ema_cents), rn
    the 1-based position in the user's (ts, event_id) timeline.

    Scale shape: ONE hash shuffle keyed by user_id % B co-locates each
    user's events (the running_window contract); the in-bucket kernel
    is a lexsort plus a POSITION-SYNCHRONOUS numpy sweep — iteration k
    updates row k of EVERY user in the bucket at once (one gather, one
    multiply-add-shift, one scatter), so the Python loop runs
    max-events-per-user times, not rows times. Floor division by a
    power of two is a right shift on the non-negative intermediate;
    negative cents are handled by numpy floor_divide (still exact).
    """
    if shift < 1 or shift > 31:
        raise ValueError("shift must be in [1, 31]")
    num_buckets = resolve_num_buckets(events)
    mul = np.int64((1 << shift) - 1)
    den = np.int64(1 << shift)

    def keyed(df: pd.DataFrame) -> pd.DataFrame:
        uid = df["user_id"].to_numpy()
        return pd.DataFrame(
            {
                "event_id": df["event_id"].to_numpy(),
                "user_id": uid,
                "ts": df["ts"].to_numpy().astype("datetime64[us]").astype(np.int64),
                "cents": np.round(df["value"].to_numpy() * 100.0).astype(np.int64),
                "bucket": (uid % num_buckets).astype(np.int64),
            }
        )

    def sweep(g: pd.DataFrame) -> pd.DataFrame:
        if len(g) == 0:
            return pd.DataFrame(
                {
                    "event_id": np.array([], dtype=np.int64),
                    "user_id": np.array([], dtype=np.int64),
                    "rn": np.array([], dtype=np.int64),
                    "ema_cents": np.array([], dtype=np.int64),
                }
            )
        order = np.lexsort(
            (g["event_id"].to_numpy(), g["ts"].to_numpy(), g["user_id"].to_numpy())
        )
        uid = g["user_id"].to_numpy()[order]
        cents = g["cents"].to_numpy()[order].astype(np.int64)
        # rn-1 per row (users are contiguous runs after the lexsort)
        new_run = np.concatenate(([True], uid[1:] != uid[:-1]))
        run_id = np.cumsum(new_run) - 1
        starts = np.flatnonzero(new_run)
        pos = np.arange(len(uid)) - starts[run_id]
        # position-synchronous: rows regrouped by pos; iteration k
        # folds every user's k-th event against its (k-1)-th state
        by_pos = np.lexsort((run_id, pos))
        ema = np.empty(len(uid), dtype=np.int64)
        state = np.empty(int(run_id[-1]) + 1 if len(uid) else 0, dtype=np.int64)
        lo = 0
        pos_sorted = pos[by_pos]
        while lo < len(uid):
            hi = lo + int(
                np.searchsorted(pos_sorted[lo:], pos_sorted[lo], "right")
            )
            rows = by_pos[lo:hi]
            users = run_id[rows]
            if pos_sorted[lo] == 0:
                state[users] = cents[rows]
            else:
                state[users] = (state[users] * mul + cents[rows]) // den
            ema[rows] = state[users]
            lo = hi
        return pd.DataFrame(
            {
                "event_id": g["event_id"].to_numpy()[order],
                "user_id": uid,
                "rn": (pos + 1).astype(np.int64),
                "ema_cents": ema,
            }
        )

    out = (
        events.select_columns(["event_id", "user_id", "ts", "value"])
        .map_batches(keyed, batch_format="pandas")
        .groupby("bucket")
        .map_groups(sweep, batch_format="pandas")
    )
    return drop_empty_blocks(out)


def session_intervals(
    events: rd.Dataset, gap_minutes: int = 30
) -> rd.Dataset:
    """Gap-based session INTERVALS per user: (user_id, s_start, s_end)
    in epoch microseconds — the interval form of ``sessionize`` (same
    gap rule, same user-bucket shuffle; one extra segment min/max)."""
    gap_us = np.int64(gap_minutes * 60 * 1_000_000)
    num_buckets = resolve_num_buckets(events)

    def add_bucket(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "user_id": df["user_id"],
                "ts": df["ts"],
                "bucket": df["user_id"].to_numpy() % num_buckets,
            }
        )

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        uid = g["user_id"].to_numpy()
        ts = g["ts"].to_numpy().astype("datetime64[us]").astype(np.int64)
        order = np.lexsort((ts, uid))
        uid, ts = uid[order], ts[order]
        new_user = np.concatenate(([True], uid[1:] != uid[:-1]))
        brk = new_user | np.concatenate(([True], np.diff(ts) > gap_us))
        sid = np.cumsum(brk) - 1
        starts = np.flatnonzero(brk)
        ends = np.concatenate((starts[1:], [len(ts)])) - 1
        return pd.DataFrame(
            {
                "user_id": uid[starts],
                "s_start": ts[starts],
                "s_end": ts[ends],
            }
        )

    out = (
        events.select_columns(["user_id", "ts"])
        .map_batches(add_bucket, batch_format="pandas")
        .groupby("bucket")
        .map_groups(per_bucket, batch_format="pandas")
    )
    return drop_empty_blocks(out)


def session_overlaps(
    events: rd.Dataset,
    gap_minutes: int = 30,
    cell_minutes: int | None = None,
    num_buckets: int | None = None,
) -> rd.Dataset:
    """Interval-OVERLAP self-join over per-user sessions: for every
    user pair (user1 < user2), the number of session pairs that
    overlap in time — the co-presence statistic (as-of and range joins
    exist elsewhere; this is the missing interval-join shape). Exact
    integer counts.

    Scale shape: sessions derive from one user-bucket shuffle; every
    interval then emits one row per ``cell_minutes`` time cell it
    covers, and ONE cell-keyed bucket shuffle co-locates co-temporal
    intervals. The per-cell kernel is the all-pairs bucket kernel;
    a pair is COUNTED exactly once, in the cell where the later
    interval starts (both provably cover it). Cell width trades
    replication (long sessions span more cells) against cell
    population (peak-hour cells hold more intervals) — the standard
    interval-join blocking. Sessions of one user are disjoint by
    construction, so all overlapping pairs are cross-user.
    """
    from parallel_pagerank_ray.stages.agg import global_agg, pairs_within_groups

    if num_buckets is None:
        num_buckets = resolve_num_buckets(events)
    iv = session_intervals(events, gap_minutes=gap_minutes).materialize()
    if cell_minutes is None:
        # auto width = the MEAN interval length (deterministic integer
        # division; the output is cell-invariant, the width only trades
        # replication vs cell population), clamped to [1 min, 7 days]
        agg = global_agg(
            iv.map_batches(
                lambda t: pa.table(
                    {
                        "d": pc.subtract(
                            t.column("s_end"), t.column("s_start")
                        )
                    }
                ),
                batch_format="pyarrow",
            ),
            {"sum_d": ("d", "sum"), "n": ("d", "count")},
        )
        n_iv = int(agg["n"] or 0)
        mean_us = (int(agg["sum_d"]) // n_iv) if n_iv else 0
        cell_us = np.int64(
            min(max(mean_us, 60 * 1_000_000), 7 * 86_400 * 1_000_000)
        )
    else:
        cell_us = np.int64(cell_minutes * 60 * 1_000_000)

    def cells(df: pd.DataFrame) -> pd.DataFrame:
        uid = df["user_id"].to_numpy().astype(np.int64)
        s = df["s_start"].to_numpy().astype(np.int64)
        e = df["s_end"].to_numpy().astype(np.int64)
        c0 = s // cell_us
        nc = (e // cell_us - c0 + 1).astype(np.int64)
        idx = np.repeat(np.arange(len(uid)), nc)
        off = np.arange(len(idx)) - np.repeat(
            np.concatenate(([0], np.cumsum(nc)[:-1])), nc
        )
        cell = c0[idx] + off
        return pd.DataFrame(
            {
                "cell": cell,
                "user_id": uid[idx],
                "s_start": s[idx],
                "s_end": e[idx],
                "bucket": cell % np.int64(num_buckets),
            }
        )

    def pair_counts(g: pd.DataFrame) -> pd.DataFrame:
        cell = g["cell"].to_numpy().astype(np.int64)
        uid = g["user_id"].to_numpy().astype(np.int64)
        s = g["s_start"].to_numpy().astype(np.int64)
        e = g["s_end"].to_numpy().astype(np.int64)
        local = np.arange(len(cell))
        a, b = pairs_within_groups((cell, local), local)
        if len(a) == 0:
            return pd.DataFrame(
                {
                    "user1": np.array([], np.int64),
                    "user2": np.array([], np.int64),
                    "n": np.array([], np.int64),
                }
            )
        keep = (
            (uid[a] != uid[b])
            & (s[a] <= e[b])
            & (s[b] <= e[a])
            # exactly-once rule: count in the later start's cell
            & (np.maximum(s[a], s[b]) // cell_us == cell[a])
        )
        a, b = a[keep], b[keep]
        u1 = np.minimum(uid[a], uid[b])
        u2 = np.maximum(uid[a], uid[b])
        part = pd.DataFrame({"user1": u1, "user2": u2})
        out = part.groupby(["user1", "user2"], as_index=False).size()
        return out.rename(columns={"size": "n"})

    counts = (
        iv.map_batches(cells, batch_format="pandas")
        .groupby("bucket")
        .map_groups(pair_counts, batch_format="pandas")
    )
    return grouped_agg(
        drop_empty_blocks(counts),
        ["user1", "user2"],
        {"n_pairs": ("n", "sum")},
        num_buckets=num_buckets,
    )
