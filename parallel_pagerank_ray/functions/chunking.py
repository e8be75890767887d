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
