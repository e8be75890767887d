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


class ResizeImage:
    """Resize stage: (id, payload) -> (id, payload, height, width).

    ``fake=True`` emits a deterministic resized payload (md5-chained
    bytes of the target size's fingerprint) so the batch-size /
    actor-pool / output-layout plumbing is real and testable without
    codec libs; ``fake=False`` resizes with PIL when importable and
    raises NotImplementedError at construction otherwise. Output
    payloads are bounded by (h, w) — the stage SHRINKS memory, so it
    belongs before any shuffle of image columns.
    """

    def __init__(
        self,
        height: int,
        width: int,
        id_col: str = "doc_id",
        payload_col: str = "payload",
        fake: bool = False,
    ) -> None:
        self.h = height
        self.w = width
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
                    "ResizeImage(fake=False) needs PIL; use fake=True for "
                    "the deterministic test double"
                ) from ex

    def __call__(self, batch: pa.Table) -> pa.Table:
        payloads = [_as_bytes(v) for v in batch.column(self.payload_col).to_pylist()]
        if self.fake:
            out = [
                hashlib.md5(p + b"%dx%d" % (self.h, self.w)).digest()
                for p in payloads
            ]
        else:
            import io

            out = []
            for p in payloads:
                img = self._pil.open(io.BytesIO(p)).resize((self.w, self.h))
                buf = io.BytesIO()
                img.save(buf, format="PNG")
                out.append(buf.getvalue())
        n = len(payloads)
        return pa.table(
            {
                self.id_col: batch.column(self.id_col),
                "payload": pa.array(out, type=pa.binary()),
                "height": pa.array([self.h] * n, type=pa.int64()),
                "width": pa.array([self.w] * n, type=pa.int64()),
            }
        )


class SampleFrames:
    """Video frame-sampling stage: (id, payload) -> one row per sampled
    frame (id, frame_idx, frame_payload).

    Flat-map shape (1 -> n_frames rows) — the row explosion every video
    pipeline needs, with bounded batches (callers size batch_size so
    batch x n_frames x frame_bytes fits the worker heap). ``fake=True``
    derives deterministic per-frame bytes from the payload hash;
    ``fake=False`` raises NotImplementedError (no ffmpeg here) — wire a
    real demuxer in its place without touching the pipeline shape.
    """

    def __init__(
        self,
        n_frames: int = 4,
        id_col: str = "doc_id",
        payload_col: str = "payload",
        fake: bool = False,
    ) -> None:
        if not fake:
            raise NotImplementedError(
                "SampleFrames(fake=False) needs a video demuxer (ffmpeg), "
                "not present in this environment; use fake=True for the "
                "deterministic test double"
            )
        self.n_frames = n_frames
        self.id_col = id_col
        self.payload_col = payload_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch.column(self.id_col).to_pylist()
        payloads = [_as_bytes(v) for v in batch.column(self.payload_col).to_pylist()]
        out_id, out_idx, out_fp = [], [], []
        for i, p in zip(ids, payloads):
            for f in range(self.n_frames):
                out_id.append(i)
                out_idx.append(f)
                out_fp.append(hashlib.md5(p + b"#%d" % f).digest())
        return pa.table(
            {
                self.id_col: pa.array(out_id, type=pa.int64()),
                "frame_idx": pa.array(out_idx, type=pa.int64()),
                "frame_payload": pa.array(out_fp, type=pa.binary()),
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
