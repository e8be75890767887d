"""JSONL/CSV source+sink roundtrip fidelity (sources/formats.py)."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data as rd

from parallel_pagerank_ray.functions.hashing import md5_u64
from parallel_pagerank_ray.sources import formats


def _docs(n=200):
    rng = np.random.default_rng(11)
    words = "alpha beta gamma delta epsilon zeta eta theta".split()
    texts = [
        " ".join(rng.choice(words, size=rng.integers(3, 12)))
        + (', with "quotes" and, commas' if i % 7 == 0 else "")
        for i in range(n)
    ]
    return pa.table(
        {
            "doc_id": pa.array(range(n), pa.int64()),
            "source": pa.array([f"s{i % 5}" for i in range(n)]),
            "text": pa.array(texts),
        }
    )


def _expected_checksum(t: pa.Table) -> pd.DataFrame:
    df = t.to_pandas()
    rows = []
    for src, g in df.groupby("source"):
        h = np.int64(0)
        for x in g["text"]:
            h ^= np.int64(md5_u64(x) % (1 << 62))
        rows.append((src, len(g), int(g["text"].str.len().sum()), int(h)))
    return pd.DataFrame(
        rows, columns=["source", "n_rows", "sum_chars", "text_hash_xor"]
    ).sort_values("source").reset_index(drop=True)


def _got(ds) -> pd.DataFrame:
    return (
        formats.table_checksum(ds, "source", "text")
        .to_pandas()
        .sort_values("source")
        .reset_index(drop=True)
    )


def test_jsonl_roundtrip_checksum(tmp_path):
    t = _docs()
    formats.write_jsonl(rd.from_arrow(t), str(tmp_path / "j"))
    back = formats.read_jsonl(str(tmp_path / "j"))
    pd.testing.assert_frame_equal(_got(back), _expected_checksum(t))


def test_csv_roundtrip_checksum(tmp_path):
    t = _docs()
    formats.write_csv(rd.from_arrow(t), str(tmp_path / "c"))
    back = formats.read_csv(str(tmp_path / "c"))
    pd.testing.assert_frame_equal(_got(back), _expected_checksum(t))


def test_checksum_matches_direct(tmp_path):
    t = _docs(50)
    pd.testing.assert_frame_equal(
        _got(rd.from_arrow(t)), _expected_checksum(t)
    )


def test_ipc_roundtrip_preserves_rows(ray_session, tmp_path):
    import pandas as pd

    from parallel_pagerank_ray.sources.formats import read_ipc, write_ipc

    df = pd.DataFrame(
        {
            "doc_id": np.arange(37, dtype=np.int64),
            "source": [f"s{i % 3}" for i in range(37)],
            "text": [f"line {i}\nwith newline\tand tab" for i in range(37)],
        }
    )
    path = str(tmp_path / "ipc")
    write_ipc(rd.from_pandas(df).repartition(5), path)
    back = (
        read_ipc(path)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    assert back.equals(df.sort_values("doc_id").reset_index(drop=True))


def test_ipc_duplicate_blocks_not_collapsed(ray_session, tmp_path):
    """Byte-identical blocks share one file on disk but the manifest
    multiplicity restores every row (ADVICE r4: content-only naming
    silently dropped duplicate blocks)."""
    from parallel_pagerank_ray.sources.formats import read_ipc, write_ipc

    one = pa.table({"x": pa.array([1, 2, 3], pa.int64())})
    ds = rd.from_arrow([one, one, one])  # three identical blocks
    path = str(tmp_path / "dup")
    write_ipc(ds, path)
    back = read_ipc(path).to_pandas()
    assert len(back) == 9
    assert sorted(back["x"]) == [1, 1, 1, 2, 2, 2, 3, 3, 3]


def test_ipc_rewrite_clears_stale_files(ray_session, tmp_path):
    """Re-writing different data into the same directory must not leak
    the previous run's blocks into a subsequent read."""
    from parallel_pagerank_ray.sources.formats import read_ipc, write_ipc

    path = str(tmp_path / "rw")
    write_ipc(
        rd.from_arrow(pa.table({"x": pa.array(range(100), pa.int64())}))
        .repartition(4),
        path,
    )
    write_ipc(
        rd.from_arrow(pa.table({"x": pa.array([7, 8], pa.int64())})), path
    )
    back = read_ipc(path).to_pandas()
    assert sorted(back["x"]) == [7, 8]


def test_ipc_empty_roundtrip(ray_session, tmp_path):
    from parallel_pagerank_ray.sources.formats import read_ipc, write_ipc

    path = str(tmp_path / "empty")
    write_ipc(
        rd.from_arrow(pa.table({"x": pa.array([], pa.int64())})), path
    )
    assert read_ipc(path).count() == 0
