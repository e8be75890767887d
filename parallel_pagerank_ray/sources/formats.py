"""Row-format sources/sinks beyond Parquet: JSONL and CSV.

The reference's ingest surface is whitespace edge-list text
(/root/reference/pagerank_mpi/csr_graph.c:23-47) plus the Python
tooling's CSV exports; a Ray-Data engine additionally needs the
training-data interchange formats — newline-delimited JSON (the
universal crawl/LLM-corpus format) and CSV — as first-class
partitioned sources AND sinks.

Both directions stream: ``Dataset.write_json`` / ``write_csv`` emit one
file per block into a directory (resumable, never one giant file);
``read_json`` / ``read_csv`` parallelize over files and use Arrow
readers under the hood. ``table_checksum`` is the roundtrip fidelity
probe: an order-insensitive per-group (count, char-sum, md5-XOR)
fingerprint that any lossless write->read cycle must preserve, with the
md5 fold chosen to be DuckDB-replayable
(CAST('0x' || substr(md5(text), 1, 16) AS UBIGINT), hashing.md5_u64).

CSV contract: delimiter-safe via Arrow quoting; embedded newlines in
text columns are NOT supported by the default reader config — JSONL is
the format for free-form text (the standard crawl-pipeline choice).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import ray.data as rd

from parallel_pagerank_ray.functions.hashing import md5_u64
from parallel_pagerank_ray.stages.agg import resolve_num_buckets
from parallel_pagerank_ray.util import drop_empty_blocks

_HASH_MOD = np.int64(1) << 62


def write_jsonl(ds: rd.Dataset, path: str) -> None:
    """Partitioned newline-delimited JSON under ``path`` (a dir)."""
    ds.write_json(path)


def read_jsonl(path: str) -> rd.Dataset:
    """Read a JSONL file or directory of JSONL files."""
    return rd.read_json(path)


def write_csv(ds: rd.Dataset, path: str) -> None:
    """Partitioned CSV (Arrow-quoted) under ``path`` (a dir)."""
    ds.write_csv(path)


def read_csv(path: str) -> rd.Dataset:
    """Read a CSV file or directory of CSV files."""
    return rd.read_csv(path)


def table_checksum(
    ds: rd.Dataset, group_col: str = "source", text_col: str = "text"
) -> rd.Dataset:
    """Order-insensitive per-group content fingerprint:
    (group_col, n_rows, sum_chars, text_hash_xor) with
    text_hash_xor = XOR over rows of md5_u64(text) % 2^62 (int64,
    DuckDB-replayable). Map-side partial combine per batch, then one
    tiny bucketed final fold — the shuffle moves one row per group per
    batch regardless of row count.
    """
    num_buckets = resolve_num_buckets(ds)

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        if len(df) == 0:
            return pd.DataFrame()
        txt = df[text_col].astype(str)
        h = np.fromiter(
            (md5_u64(t) % int(_HASH_MOD) for t in txt), np.int64, len(df)
        )
        ln = txt.str.len().to_numpy(np.int64)
        t = pd.DataFrame({group_col: df[group_col], "h": h, "ln": ln})
        t = t.sort_values(group_col, kind="stable")
        keys = t[group_col].to_numpy()
        starts = np.flatnonzero(
            np.concatenate(([True], keys[1:] != keys[:-1]))
        )
        out = pd.DataFrame(
            {
                group_col: keys[starts],
                "n_rows": np.diff(
                    np.concatenate((starts, [len(keys)]))
                ).astype(np.int64),
                "sum_chars": np.add.reduceat(
                    t["ln"].to_numpy(), starts
                ).astype(np.int64),
                "text_hash_xor": np.bitwise_xor.reduceat(
                    t["h"].to_numpy(), starts
                ).astype(np.int64),
            }
        )
        out["__b"] = (
            np.fromiter(
                (md5_u64("ck|" + str(x)) for x in out[group_col]),
                np.uint64,
                len(out),
            )
            % np.uint64(num_buckets)
        ).astype(np.int64)
        return out

    def final(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(group_col, kind="stable")
        keys = g[group_col].to_numpy()
        starts = np.flatnonzero(
            np.concatenate(([True], keys[1:] != keys[:-1]))
        )
        return pd.DataFrame(
            {
                group_col: keys[starts],
                "n_rows": np.add.reduceat(
                    g["n_rows"].to_numpy(np.int64), starts
                ).astype(np.int64),
                "sum_chars": np.add.reduceat(
                    g["sum_chars"].to_numpy(np.int64), starts
                ).astype(np.int64),
                "text_hash_xor": np.bitwise_xor.reduceat(
                    g["text_hash_xor"].to_numpy(np.int64), starts
                ).astype(np.int64),
            }
        )

    out = (
        ds.select_columns([group_col, text_col])
        .map_batches(partial, batch_format="pandas")
        .groupby("__b")
        .map_groups(final, batch_format="pandas")
    )
    return drop_empty_blocks(out)


def write_ipc(ds: rd.Dataset, path: str) -> None:
    """Partitioned Arrow IPC (Feather v2 container) under ``path`` —
    the zero-parse interchange sink (Ray 2.49 has no native IPC sink;
    this one streams: each block serializes itself to one
    content-addressed ``part-<md5>.arrow`` file from inside the task,
    so a re-run overwrites identical bytes and is never
    wall-clock-dependent). Byte-identical blocks share one file on
    disk; a ``manifest.json`` written by the driver records every
    block's file WITH multiplicity, so ``read_ipc`` reconstructs the
    exact row multiset, and stale ``.arrow`` files left by a prior
    write of different data are deleted (only the tiny one-row-per-
    block path table ever reaches the driver)."""
    import hashlib
    import json
    import os
    from collections import Counter

    import pyarrow as pa

    os.makedirs(path, exist_ok=True)

    def dump(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table({"name": pa.array([], pa.string())})
        sink = pa.BufferOutputStream()
        with pa.ipc.new_file(sink, t.schema) as w:
            w.write_table(t)
        buf = sink.getvalue()
        name = "part-" + hashlib.md5(buf.to_pybytes()).hexdigest() + ".arrow"
        fn = os.path.join(path, name)
        with open(fn, "wb") as f:
            f.write(buf.to_pybytes())
        return pa.table({"name": pa.array([name], pa.string())})

    names = [
        r["name"]
        for r in ds.map_batches(dump, batch_format="pyarrow").take_all()
    ]
    counts = Counter(names)
    for fn in os.listdir(path):
        if fn.endswith(".arrow") and fn not in counts:
            os.remove(os.path.join(path, fn))
    manifest = {
        "files": [
            {"name": n, "count": c} for n, c in sorted(counts.items())
        ]
    }
    tmp = os.path.join(path, "manifest.json.tmp")
    with open(tmp, "w") as f:
        json.dump(manifest, f)
    os.replace(tmp, os.path.join(path, "manifest.json"))


def read_ipc(path: str) -> rd.Dataset:
    """Read a directory of Arrow IPC files written by ``write_ipc``:
    parallel over the manifest-listed files (one binary read task per
    file), decoded zero-copy inside the map and repeated per the
    manifest multiplicity (byte-identical blocks share a file on
    disk). Falls back to a plain glob for directories without a
    manifest; an empty directory reads as an empty dataset instead of
    raising."""
    import glob as _glob
    import json
    import os

    import pyarrow as pa

    mf = os.path.join(path, "manifest.json")
    if os.path.exists(mf):
        with open(mf) as f:
            spec = json.load(f)["files"]
        counts = {
            os.path.abspath(os.path.join(path, e["name"])): int(e["count"])
            for e in spec
        }
    else:
        counts = {
            os.path.abspath(f): 1
            for f in sorted(_glob.glob(f"{path}/*.arrow"))
        }
    if not counts:
        return rd.from_arrow(pa.table({}))
    files = sorted(counts)

    def decode(t: pa.Table) -> pa.Table:
        parts = []
        for fn, b in zip(
            t.column("path").to_pylist(), t.column("bytes").to_pylist()
        ):
            tab = pa.ipc.open_file(pa.BufferReader(b)).read_all()
            parts.extend([tab] * counts.get(os.path.abspath(fn), 1))
        return pa.concat_tables(parts) if parts else pa.table({})

    return drop_empty_blocks(
        rd.read_binary_files(files, include_paths=True).map_batches(
            decode, batch_format="pyarrow"
        )
    )
