"""Sliding-window document chunking for training-data preparation.

Beyond-reference LLM-pipeline operator (the reference processes no
text at all): split each document into fixed-size character windows
with overlap — the standard context-window prep step before
tokenization. Flat-map stage (one doc row -> ceil(len/stride) chunk
rows); deterministic pure function of the text, so distributed output
is identical at any parallelism and the DuckDB oracle reproduces it
with substr arithmetic.

Window rule (normative): ``stride = size - overlap``; chunk k covers
codepoints [k*stride, k*stride + size) for k in 0..ceil(len/stride)-1;
empty documents emit no chunks. The last chunks may be shorter than
``size``; a trailing chunk shorter than ``overlap`` is still emitted
(it is the only place its final codepoints appear at a window start —
droppers can filter on chunk length downstream).

At 100 TB this stage is shape-critical: chunk rows are ~size/stride x
the input bytes, so it runs as a streaming map with no shuffle, and
chunk ids are (doc_id, k) — no global counter, no coordination.
"""

from __future__ import annotations

import pyarrow as pa


class ChunkDocuments:
    """map_batches stage: (doc_id, text, ...) -> (doc_id, chunk_id, chunk).

    Per-row string slicing is the payload op (like HTML parsing);
    everything around it stays Arrow. ``chunk_id`` is the within-doc
    window index k — deterministic, partition-independent.
    """

    def __init__(
        self,
        size: int = 512,
        overlap: int = 64,
        id_col: str = "doc_id",
        text_col: str = "text",
    ) -> None:
        if size <= 0:
            raise ValueError("size must be positive")
        if not 0 <= overlap < size:
            raise ValueError("overlap must satisfy 0 <= overlap < size")
        self.size = size
        self.stride = size - overlap
        self.id_col = id_col
        self.text_col = text_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch.column(self.id_col).to_pylist()
        texts = batch.column(self.text_col).to_pylist()
        out_ids: list = []
        out_k: list[int] = []
        out_chunk: list[str] = []
        size, stride = self.size, self.stride
        for i, t in zip(ids, texts):
            if not t:
                continue
            for k in range(-(-len(t) // stride)):
                out_ids.append(i)
                out_k.append(k)
                out_chunk.append(t[k * stride : k * stride + size])
        return pa.table(
            {
                self.id_col: pa.array(
                    out_ids, type=batch.schema.field(self.id_col).type
                ),
                "chunk_id": pa.array(out_k, type=pa.int64()),
                "chunk": pa.array(out_chunk, type=pa.string()),
            }
        )


def pack_docs(
    docs,
    budget: int = 1000,
    group_col: str = "source",
    id_col: str = "doc_id",
    len_col: str = "n_chars",
):
    """Sequence packing: greedy first-fit of documents into fixed
    ``budget``-length bins, per ``group_col``, in ``id_col`` order —
    the standard pre-tokenization packing step that turns ragged
    documents into near-full training sequences.

    Normative rule (deterministic, SQL-reproducible): within a group,
    docs sorted by id are appended to the current bin while the bin's
    length sum stays <= budget; otherwise a new bin starts. A doc
    longer than the budget gets its own bin (a fresh bin always takes
    at least one doc). Output: (doc_id, group, bin_id) with bin_id
    numbered 0.. per group.

    Scale shape: ONE hash shuffle keyed by the group co-locates each
    group's rows; the per-group kernel is a cumsum + O(#bins)
    searchsorted bisections — never a per-doc Python loop. Packing is
    sequential within a group BY DEFINITION (bin boundaries depend on
    every prior doc), so the group is the parallelism unit; salt the
    group key upstream if one group outweighs a worker.
    """
    import numpy as np
    import pandas as pd
    import ray.data as rd  # noqa: F401

    from parallel_pagerank_ray.stages.agg import bucket_of, resolve_num_buckets
    from parallel_pagerank_ray.util import drop_empty_blocks

    num_buckets = resolve_num_buckets(docs)

    def keyed(df: pd.DataFrame) -> pd.DataFrame:
        out = pd.DataFrame(
            {
                id_col: df[id_col].to_numpy(),
                group_col: df[group_col].to_numpy(),
                len_col: df[len_col].to_numpy(),
            }
        )
        out["bucket"] = bucket_of(out, [group_col], num_buckets)
        return out

    def pack(g: pd.DataFrame) -> pd.DataFrame:
        ids = g[id_col].to_numpy()
        grp = g[group_col].to_numpy()
        lens = g[len_col].to_numpy().astype(np.int64)
        order = np.lexsort((ids, grp))
        ids, grp, lens = ids[order], grp[order], lens[order]
        new_grp = np.concatenate(([True], grp[1:] != grp[:-1]))
        bin_id = np.empty(len(ids), dtype=np.int64)
        # per group: cumsum + bisect to the last doc that still fits;
        # O(#bins) bisections, not O(#docs) Python steps
        starts = np.nonzero(new_grp)[0]
        bounds = np.concatenate((starts, [len(ids)]))
        for gi in range(len(starts)):
            lo, hi = bounds[gi], bounds[gi + 1]
            cum = np.concatenate(([0], np.cumsum(lens[lo:hi])))
            s, b = 0, 0
            nloc = hi - lo
            while s < nloc:
                e = int(np.searchsorted(cum, cum[s] + budget, side="right")) - 1
                e = max(e, s + 1)  # a fresh bin always takes one doc
                bin_id[lo + s : lo + e] = b
                s, b = e, b + 1
        return pd.DataFrame(
            {id_col: ids, group_col: grp, "bin_id": bin_id}
        )

    out = (
        docs.select_columns([id_col, group_col, len_col])
        .map_batches(keyed, batch_format="pandas")
        .groupby("bucket")
        .map_groups(pack, batch_format="pandas")
    )
    return drop_empty_blocks(out)
