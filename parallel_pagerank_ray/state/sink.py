"""Resumable partitioned Parquet sink.

Brief requirement: "write partitioned Parquet (one directory per input
shard / key range) so a failed run can skip finished partitions; never
one giant file". ``resumable_write_parquet`` hash-partitions the rows
by key into ``num_buckets`` directories, each written atomically
(tmp -> rename + ``_SUCCESS``); a re-run SKIPS buckets whose marker
exists, so a crashed job redoes only its unfinished partitions.

The bucket function is the engine's deterministic key hash
(stages/agg.bucket_of), so a resume sees the same rows -> same buckets
at any parallelism. Writing happens INSIDE the bucketed map_groups —
only each bucket's rows ever co-locate, nothing materializes
driver-side. Paths must be on shared storage on a multi-node cluster
(same contract as state/checkpoint.py).
"""

from __future__ import annotations

import os

import numpy as np
import pandas as pd
import ray.data as rd

from parallel_pagerank_ray.stages.agg import bucket_of, resolve_num_buckets


def _bucket_dir(path: str, b: int) -> str:
    return os.path.join(path, f"bucket={b:05d}")


def resumable_write_parquet(
    ds: rd.Dataset,
    path: str,
    keys: list[str],
    num_buckets: int | None = None,
) -> dict[str, int]:
    """Write ``ds`` as ``path/bucket=<b>/part.parquet`` + ``_SUCCESS``
    per bucket, skipping buckets already complete. Returns
    {"written": n, "skipped": n}.

    ``num_buckets`` must match between the failed and resumed run (it
    defaults to the size-aware resolver, which is deterministic for the
    same input); rows are routed by the deterministic key hash.
    """
    if num_buckets is None:
        num_buckets = resolve_num_buckets(ds)
    os.makedirs(path, exist_ok=True)
    done = {
        b
        for b in range(num_buckets)
        if os.path.exists(os.path.join(_bucket_dir(path, b), "_SUCCESS"))
    }
    if len(done) == num_buckets:  # nothing to do: avoid an all-empty shuffle
        return {"written": 0, "skipped": num_buckets}

    def route(df: pd.DataFrame) -> pd.DataFrame:
        if len(df) == 0:
            return pd.DataFrame()
        out = df.copy()
        out["__b"] = bucket_of(df, keys, num_buckets)
        return out[~out["__b"].isin(done)]

    def write_bucket(g: pd.DataFrame) -> pd.DataFrame:
        import pyarrow as pa
        import pyarrow.parquet as pq

        b = int(g["__b"].iloc[0])
        final = _bucket_dir(path, b)
        tmp = final + ".tmp"
        # a crash between rename and marker leaves a marker-less final
        # dir: clear it so the atomic rename can land
        if os.path.exists(final):
            import shutil

            shutil.rmtree(final)
        if os.path.exists(tmp):
            import shutil

            shutil.rmtree(tmp)
        os.makedirs(tmp)
        pq.write_table(
            pa.Table.from_pandas(
                g.drop(columns="__b").reset_index(drop=True),
                preserve_index=False,
            ),
            os.path.join(tmp, "part.parquet"),
        )
        os.replace(tmp, final)
        with open(os.path.join(final, "_SUCCESS"), "w") as f:
            f.write("")
        return pd.DataFrame({"bucket": np.array([b], dtype=np.int64)})

    written_rows = (
        ds.map_batches(route, batch_format="pandas")
        .groupby("__b")
        .map_groups(write_bucket, batch_format="pandas")
        .take_all()
    )
    return {"written": len(written_rows), "skipped": len(done)}


def read_resumable(path: str) -> rd.Dataset:
    """Read back a resumable-sink directory (complete buckets only)."""
    dirs = sorted(
        os.path.join(path, d)
        for d in os.listdir(path)
        if d.startswith("bucket=")
        and os.path.exists(os.path.join(path, d, "_SUCCESS"))
    )
    if not dirs:  # nothing complete yet
        return rd.from_items([])
    return rd.read_parquet([os.path.join(d, "part.parquet") for d in dirs])
