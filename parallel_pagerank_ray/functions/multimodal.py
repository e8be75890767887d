"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Images/audio/video ride through the engine as ``binary`` columns with
metadata columns beside them; the Ray-side plumbing (schema, actor-pool
stage shape, batch sizing, output layout) is real and tested, while the
actual codec work is stubbed — the decode libraries are not in this
container (see BUILD brief: "STUB the decode step behind a
clearly-marked NotImplementedError or a deterministic fake").

Stages (all callable classes -> ``map_batches(Cls, concurrency=N,
batch_size=B)`` actor pools; one-time setup in __init__):

- ``PayloadMeta``  — (id, n_bytes, payload_md5) from any binary column;
                     pure metadata pass, REAL.
- ``DecodeImage``  — binary -> (height, width, mean_luma). ``fake=True``
                     derives deterministic pseudo-features from the
                     payload hash (testable plumbing); ``fake=False``
                     raises NotImplementedError (no codec libs here).

Large payloads need small batches: a 1 MiB-payload column at
batch_size=1024 is a 1 GiB batch — callers size ``batch_size`` so
batch x concurrency fits the worker heap.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa


def _as_bytes(v: bytes | str) -> bytes:
    return v.encode("utf-8") if isinstance(v, str) else bytes(v)


class PayloadMeta:
    """Binary column -> metadata rows (id, n_bytes, payload_md5)."""

    def __init__(self, id_col: str = "doc_id", payload_col: str = "payload") -> None:
        self.id_col = id_col
        self.payload_col = payload_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        payloads = [_as_bytes(v) for v in batch.column(self.payload_col).to_pylist()]
        return pa.table(
            {
                self.id_col: batch.column(self.id_col),
                "n_bytes": pa.array([len(p) for p in payloads], type=pa.int64()),
                "payload_md5": pa.array(
                    [hashlib.md5(p).hexdigest() for p in payloads], type=pa.string()
                ),
            }
        )


class DecodeImage:
    """STUB decode stage: binary image -> (id, height, width, mean_luma).

    ``fake=True``: deterministic pseudo-decode from the md5 digest —
    exercises the full actor-pool path (schema, batching, output layout)
    without codec libraries. ``fake=False``: NotImplementedError — wire a
    real decoder (PIL/ffmpeg) here when the runtime image has one; the
    surrounding pipeline does not change.
    """

    def __init__(
        self, id_col: str = "doc_id", payload_col: str = "payload", fake: bool = False
    ) -> None:
        self.id_col = id_col
        self.payload_col = payload_col
        self.fake = fake

    def __call__(self, batch: pa.Table) -> pa.Table:
        if not self.fake:
            raise NotImplementedError(
                "image decode requires codec libraries not present in this "
                "environment; construct DecodeImage(fake=True) for the "
                "deterministic test double"
            )
        payloads = [_as_bytes(v) for v in batch.column(self.payload_col).to_pylist()]
        h = [hashlib.md5(p).digest() for p in payloads]
        height = np.array([1 + d[0] for d in h], dtype=np.int64)
        width = np.array([1 + d[1] for d in h], dtype=np.int64)
        luma = np.array([d[2] / 255.0 for d in h], dtype=np.float64)
        return pa.table(
            {
                self.id_col: batch.column(self.id_col),
                "height": pa.array(height),
                "width": pa.array(width),
                "mean_luma": pa.array(luma),
            }
        )
