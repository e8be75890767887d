"""Temporal earliest-arrival reachability vs a brute-force oracle."""

import numpy as np
import pytest

from parallel_pagerank_ray.pipelines.temporal import earliest_arrival_bsp
from parallel_pagerank_ray.sources.edge_list import edges_dataset

_INF = np.iinfo(np.int64).max


def _edges_ds(rows, blocks=2):
    import pyarrow as pa
    import ray.data as rd

    t = pa.table(
        {
            "src": pa.array([r[0] for r in rows], pa.int64()),
            "dst": pa.array([r[1] for r in rows], pa.int64()),
            "w": pa.array([float(r[2]) for r in rows], pa.float64()),
        }
    )
    return rd.from_arrow(t).repartition(blocks)


def _brute(n, rows, sources, t0):
    """Label-correcting fixpoint: arr(v) = min over eligible edges."""
    arr = np.full(n, _INF, dtype=np.int64)
    for s in sources:
        arr[s] = t0
    changed = True
    while changed:
        changed = False
        for u, v, t in rows:
            if arr[u] != _INF and t >= arr[u] and t < arr[v]:
                arr[v] = t
                changed = True
    return {i: int(a) for i, a in enumerate(arr) if a != _INF}


def _got(run):
    df = run.arrivals.to_pandas()
    return dict(zip(df["vid"].tolist(), df["arrival"].tolist()))


def test_temporal_basic_time_respecting():
    # 0->1 at t=5, 1->2 at t=3 (stale: captured before arrival at 1),
    # 1->3 at t=7 (fresh). 2 is unreachable through time.
    rows = [(0, 1, 5), (1, 2, 3), (1, 3, 7)]
    run = earliest_arrival_bsp(_edges_ds(rows), 4, [0], t0=0, num_parts=2)
    assert _got(run) == {0: 0, 1: 5, 3: 7}


def test_temporal_start_time_gates_first_hop():
    rows = [(0, 1, 5), (0, 2, 9)]
    run = earliest_arrival_bsp(_edges_ds(rows), 3, [0], t0=6, num_parts=2)
    assert _got(run) == {0: 6, 2: 9}


def test_temporal_later_path_unlocks_earlier_edge():
    # direct 0->2 at t=10; detour 0->1 (t=1) -> 2 (t=2) arrives at 2
    # earlier. A non-temporal SSSP over min edge time cannot express
    # this; earliest arrival must be 2.
    rows = [(0, 2, 10), (0, 1, 1), (1, 2, 2)]
    run = earliest_arrival_bsp(_edges_ds(rows), 3, [0], t0=0, num_parts=2)
    assert _got(run) == {0: 0, 1: 1, 2: 2}


def test_temporal_random_vs_brute_all_partitionings():
    rng = np.random.default_rng(3)
    n = 60
    m = 400
    rows = [
        (int(a), int(b), int(t))
        for a, b, t in zip(
            rng.integers(0, n, m),
            rng.integers(0, n, m),
            rng.integers(0, 50, m),
        )
        if a != b
    ]
    want = _brute(n, rows, [0, 7], t0=4)
    for parts in (1, 3, 8):
        run = earliest_arrival_bsp(
            _edges_ds(rows, blocks=3), n, [0, 7], t0=4, num_parts=parts
        )
        assert _got(run) == want, parts


def test_temporal_validation():
    rows = [(0, 1, 5)]
    with pytest.raises(ValueError, match="out of range"):
        earliest_arrival_bsp(_edges_ds(rows), 2, [9])
    with pytest.raises(ValueError, match="timestamps"):
        earliest_arrival_bsp(edges_dataset([(0, 1)], num_blocks=1), 2, [0])
    assert earliest_arrival_bsp(_edges_ds(rows), 0, []).arrivals.count() == 0


def _brute_ld(n, rows, targets, horizon):
    """Fixpoint: ld(u) = max t over edges (u,v,t), t <= ld(v)."""
    NEG = -1
    ld = np.full(n, NEG, dtype=np.int64)
    for s in targets:
        ld[s] = horizon
    changed = True
    while changed:
        changed = False
        for u, v, t in rows:
            if t <= horizon and ld[v] != NEG and t <= ld[v] and t > ld[u]:
                ld[u] = t
                changed = True
    return {i: int(a) for i, a in enumerate(ld) if a != NEG}


def test_latest_departure_basic():
    from parallel_pagerank_ray.pipelines.temporal import latest_departure_bsp

    # 0->1 at t=5, 1->2(target) at t=3: to use the t=3 edge you must
    # leave 1 by 3, but you can only get to 1 at 5 -> irrelevant; the
    # question is departures TOWARD the target.  ld(1)=3, and 0->1@5
    # needs 5 <= ld(1)=3 -> 0 cannot reach 2.  0->1@2 would work.
    rows = [(0, 1, 5), (1, 2, 3), (3, 1, 1)]
    run = latest_departure_bsp(_edges_ds(rows), 4, [2], horizon=10, num_parts=2)
    got = _got_col(run, "departure")
    assert got == {2: 10, 1: 3, 3: 1}


def test_latest_departure_vs_brute():
    from parallel_pagerank_ray.pipelines.temporal import latest_departure_bsp

    rng = np.random.default_rng(9)
    n, m = 50, 350
    rows = [
        (int(a), int(b), int(t))
        for a, b, t in zip(
            rng.integers(0, n, m),
            rng.integers(0, n, m),
            rng.integers(0, 60, m),  # some past the horizon of 45
        )
        if a != b
    ]
    want = _brute_ld(n, rows, [0, 5], horizon=45)
    for parts in (1, 4):
        run = latest_departure_bsp(
            _edges_ds(rows, blocks=3), n, [0, 5], horizon=45, num_parts=parts
        )
        assert _got_col(run, "departure") == want, parts


def _got_col(run, col):
    df = run.arrivals.to_pandas()
    return dict(zip(df["vid"].tolist(), df[col].tolist()))
