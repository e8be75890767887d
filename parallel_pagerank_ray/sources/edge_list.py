"""Reference-compatible edge-list text reader (SURVEY.md S1/S2).

The reference ingests whitespace/tab-separated ``from to`` int pairs, one
per line, skipping ``#`` comment lines
(/root/reference/pagerank_mpi/csr_graph.c:16-27 and the tolerant Python
parsers at dashboard/app.py:443-454). Here it is a Ray Data pipeline:
``read_text`` -> vectorized parse in ``map_batches`` (Arrow compute
kernels, no per-row Python).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray.data as rd


def _parse_batch(batch: pa.Table) -> pa.Table:
    lines = pc.utf8_trim_whitespace(batch.column("text"))
    # drop comments and blank lines (csr_graph.c:18; app.py:1567)
    keep = pc.and_(
        pc.invert(pc.starts_with(lines, "#")), pc.greater(pc.utf8_length(lines), 0)
    )
    lines = lines.filter(keep)
    # tolerant parse (the reference's Python parsers skip unparsable
    # lines, dashboard/app.py:443-454): keep only "int int ..." lines
    valid = pc.match_substring_regex(lines, r"^-?\d+\s+-?\d+(\s|$)")
    lines = lines.filter(valid)
    parts = pc.split_pattern_regex(lines, r"\s+")
    src = pc.cast(pc.list_element(parts, 0), pa.int64())
    dst = pc.cast(pc.list_element(parts, 1), pa.int64())
    return pa.table({"src": src, "dst": dst})


def read_edge_list(paths: str | list[str]) -> rd.Dataset:
    """Text edge-list file(s) -> Dataset[src: int64, dst: int64].

    Duplicate edges and self-loops are preserved (the reference keeps
    both, csr_graph.c:49-57); dedup is a separate, explicit operator.
    """
    return rd.read_text(paths).map_batches(_parse_batch, batch_format="pyarrow")


def edges_dataset(edges: np.ndarray | list, num_blocks: int = 1) -> rd.Dataset:
    """In-memory (E,2) int array -> edges Dataset (test/bench helper)."""
    e = np.asarray(edges, dtype=np.int64).reshape(-1, 2)
    tbl = pa.table({"src": e[:, 0], "dst": e[:, 1]})
    ds = rd.from_arrow(tbl)
    return ds.repartition(num_blocks) if num_blocks > 1 else ds


def write_edge_list(
    edges: rd.Dataset, path: str, header: str | None = None
) -> int:
    """Edges Dataset -> reference-format text edge list ("src dst" rows,
    '#' comment header) for interop with the reference tools
    (csr_graph.c:18 comment skip; benchmark drivers read this format).

    Streams block-by-block through ``iter_batches`` into ONE file —
    interop artifacts are small by definition; big graphs ship as
    partitioned Parquet (``Graph.write``). Returns the edge count.
    """
    n = 0
    with open(path, "w") as f:
        if header:
            for line in header.splitlines():
                f.write(f"# {line}\n")
        for batch in edges.iter_batches(batch_format="numpy"):
            src, dst = batch["src"], batch["dst"]
            f.write(
                "\n".join(f"{s} {d}" for s, d in zip(src.tolist(), dst.tolist()))
            )
            f.write("\n")
            n += len(src)
    return n
