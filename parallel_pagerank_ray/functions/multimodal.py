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
    """Decode stage: binary image -> (id, height, width, mean_luma).

    ``fake=True``: deterministic pseudo-decode from the md5 digest —
    exercises the full actor-pool path (schema, batching, output layout)
    without codec libraries, and is value-checked against a DuckDB
    oracle (__ray_entry__).

    ``fake=False``: decodes with PIL when importable (one import probe
    per actor in __init__, not per batch); raises NotImplementedError at
    construction when no codec library is present — this container has
    none, so the real path is exercised only where PIL exists. The
    surrounding pipeline (schema, batching, actor signature) is
    identical either way.
    """

    def __init__(
        self, id_col: str = "doc_id", payload_col: str = "payload", fake: bool = False
    ) -> None:
        self.id_col = id_col
        self.payload_col = payload_col
        self.fake = fake
        self._pil = None
        if not fake:
            try:
                import PIL.Image as _pil  # type: ignore[import-not-found]

                self._pil = _pil
            except ImportError as ex:
                raise NotImplementedError(
                    "DecodeImage(fake=False) needs PIL, which is not in "
                    "this environment; construct DecodeImage(fake=True) "
                    "for the deterministic test double"
                ) from ex

    def _decode_real(self, payloads: list[bytes]) -> pa.Table | dict:
        import io

        h, w, luma = [], [], []
        for p in payloads:
            img = self._pil.open(io.BytesIO(p))
            gray = np.asarray(img.convert("L"), dtype=np.float64)
            h.append(img.height)
            w.append(img.width)
            luma.append(float(gray.mean()) / 255.0 if gray.size else 0.0)
        return {
            "height": np.array(h, dtype=np.int64),
            "width": np.array(w, dtype=np.int64),
            "mean_luma": np.array(luma, dtype=np.float64),
        }

    def __call__(self, batch: pa.Table) -> pa.Table:
        payloads = [_as_bytes(v) for v in batch.column(self.payload_col).to_pylist()]
        if self.fake:
            d = [hashlib.md5(p).digest() for p in payloads]
            cols = {
                "height": np.array([1 + x[0] for x in d], dtype=np.int64),
                "width": np.array([1 + x[1] for x in d], dtype=np.int64),
                "mean_luma": np.array([x[2] / 255.0 for x in d], dtype=np.float64),
            }
        else:
            cols = self._decode_real(payloads)
        return pa.table(
            {
                self.id_col: batch.column(self.id_col),
                "height": pa.array(cols["height"]),
                "width": pa.array(cols["width"]),
                "mean_luma": pa.array(cols["mean_luma"]),
            }
        )
