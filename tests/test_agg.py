"""Bucketed aggregation: size-aware bucket count + result invariance.

VERDICT r1 finding 2: fixed small bucket counts put ~input/32 bytes in
ONE worker at scale. resolve_num_buckets must grow with input size, and
the bucket count must never change results (it is parallelism only).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
import ray.data as rd

from parallel_pagerank_ray.stages.agg import grouped_agg, resolve_num_buckets


@pytest.fixture(scope="module")
def keyed_ds():
    rng = np.random.default_rng(5)
    t = pa.table(
        {
            "k": pa.array(rng.integers(0, 500, size=20_000), type=pa.int64()),
            "v": pa.array(rng.integers(0, 1000, size=20_000), type=pa.int64()),
        }
    )
    return rd.from_arrow(t).repartition(4).materialize()


def test_resolve_num_buckets_scales_with_size(keyed_ds, monkeypatch):
    # materialized dataset -> size known from metadata; force a tiny
    # target so the count must exceed the floor
    monkeypatch.setenv("PPR_TARGET_BUCKET_BYTES", "4096")
    nb = resolve_num_buckets(keyed_ds)
    assert nb > 32
    monkeypatch.setenv("PPR_TARGET_BUCKET_BYTES", str(1 << 40))
    assert resolve_num_buckets(keyed_ds) == 32  # floor


def test_resolve_num_buckets_unknown_size_falls_back():
    ds = rd.range(100).map_batches(lambda b: b, batch_format="numpy")
    assert resolve_num_buckets(ds, floor=7) == 7


def test_bucket_count_never_changes_results(keyed_ds, monkeypatch):
    def run(nb):
        out = grouped_agg(
            keyed_ds,
            ["k"],
            {"s": ("v", "sum"), "n": ("v", "count"), "m": ("v", "min")},
            num_buckets=nb,
        )
        return out.to_pandas().sort_values("k").reset_index(drop=True)

    base = run(8)
    monkeypatch.setenv("PPR_TARGET_BUCKET_BYTES", "4096")
    auto = grouped_agg(
        keyed_ds, ["k"], {"s": ("v", "sum"), "n": ("v", "count"), "m": ("v", "min")}
    ).to_pandas().sort_values("k").reset_index(drop=True)
    pd.testing.assert_frame_equal(base, auto)
    pd.testing.assert_frame_equal(base, run(101))


def test_duplicate_col_how_spec(keyed_ds):
    """Two spec entries sharing (col, how) must both be produced
    (ADVICE r2: Arrow emits two same-named columns and the rename
    mapped both to the last out name, breaking the final select)."""
    got = (
        grouped_agg(
            keyed_ds,
            ["k"],
            {
                "x": ("v", "sum"),
                "y": ("v", "sum"),
                "c1": ("k", "count"),
                "c2": ("k", "count"),
            },
            num_buckets=8,
        )
        .to_pandas()
        .sort_values("k")
        .reset_index(drop=True)
    )
    df = keyed_ds.to_pandas()
    want = (
        df.groupby("k")
        .agg(x=("v", "sum"), c1=("v", "size"))
        .reset_index()
        .sort_values("k")
        .reset_index(drop=True)
    )
    assert got["x"].tolist() == want["x"].tolist()
    assert got["y"].tolist() == want["x"].tolist()
    assert got["c1"].tolist() == want["c1"].tolist()
    assert got["c2"].tolist() == want["c1"].tolist()


def test_grouped_exact_quantiles_matches_numpy():
    """Per-group quantile_disc semantics: value at sorted index
    max(0, ceil(q*n)-1) within each group, at any partitioning."""
    import math

    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import ray.data as rd

    from parallel_pagerank_ray.stages.agg import grouped_exact_quantiles

    rng = np.random.default_rng(3)
    g = rng.integers(0, 4, 500)
    v = rng.integers(-1000, 1000, 500)
    ds = rd.from_arrow(
        pa.table({"grp": pa.array(g), "v": pa.array(v)})
    ).repartition(7)
    qs = [0.25, 0.5, 0.75]
    got = (
        grouped_exact_quantiles(ds, ["grp"], "v", qs)
        .to_pandas()
        .sort_values(["grp", "q"])
        .reset_index(drop=True)
    )
    for grp in range(4):
        vals = np.sort(v[g == grp])
        n = len(vals)
        for q in qs:
            want = int(vals[max(0, math.ceil(q * n) - 1)])
            row = got[(got.grp == grp) & (got.q == q)]
            assert int(row["value"].iloc[0]) == want, (grp, q)


def test_anti_join_broadcast_and_fallback():
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import ray.data as rd

    from parallel_pagerank_ray.util import anti_join

    left = rd.from_arrow(
        pa.table(
            {
                "k": pa.array(np.arange(20, dtype=np.int64)),
                "x": pa.array([f"v{i}" for i in range(20)]),
            }
        )
    ).repartition(3)
    right = rd.from_arrow(
        pa.table({"k": pa.array([3, 3, 7, 11, 99], type=pa.int64())})
    ).repartition(2)
    want = sorted(set(range(20)) - {3, 7, 11})
    for bmax in (5_000_000, 0):
        got = (
            anti_join(left, right, on="k", broadcast_max=bmax)
            .to_pandas()
            .sort_values("k")
        )
        assert got["k"].tolist() == want, bmax
        assert got["x"].tolist() == [f"v{i}" for i in want], bmax
