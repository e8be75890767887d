"""Per-iteration checkpointing with lineage metadata (resumable iteration).

The reference has no checkpointing (an MPI job dies and restarts from
scratch). North rule: "checkpoints rank vectors and frontier state per
partition with lineage metadata for resumable iteration".

Layout (one directory per iteration, written atomically):

    workdir/<algo>/iter=<k>/part-*.parquet      # partitioned state table
    workdir/<algo>/iter=<k>/_SUCCESS            # completeness marker
    workdir/<algo>/lineage.json                 # params + per-iter metrics

Resume = find the highest iter with a _SUCCESS marker whose lineage
fingerprint matches the current run's inputs/params, read its Parquet,
continue the driver loop from there. State values round-trip float64
exactly through Parquet, so a resumed run reproduces the uninterrupted
run bit-for-bit.
"""

from __future__ import annotations

import json
import os
from dataclasses import dataclass
from typing import Any

import ray.data as rd


@dataclass
class CheckpointManager:
    workdir: str
    algo: str
    fingerprint: dict[str, Any]  # {n, num_edges, params...} — must match to resume

    @property
    def _root(self) -> str:
        return os.path.join(self.workdir, self.algo)

    def _lineage_path(self) -> str:
        return os.path.join(self._root, "lineage.json")

    def _read_lineage(self) -> dict[str, Any] | None:
        try:
            with open(self._lineage_path()) as f:
                return json.load(f)
        except (OSError, json.JSONDecodeError):
            return None

    def _write_lineage(self, lineage: dict[str, Any]) -> None:
        os.makedirs(self._root, exist_ok=True)
        tmp = self._lineage_path() + ".tmp"
        with open(tmp, "w") as f:
            json.dump(lineage, f, indent=1, sort_keys=True)
        os.replace(tmp, self._lineage_path())  # atomic

    def save_iter(self, it: int, state: rd.Dataset, metrics: dict[str, Any]) -> None:
        """Write iteration state atomically + append metrics to lineage."""
        final = os.path.join(self._root, f"iter={it}")
        tmp = final + ".tmp"
        os.makedirs(self._root, exist_ok=True)
        if os.path.exists(final):
            return  # already complete (idempotent resume)
        state.write_parquet(tmp)
        os.replace(tmp, final)
        with open(os.path.join(final, "_SUCCESS"), "w") as f:
            f.write("")
        lineage = self._read_lineage() or {
            "algo": self.algo,
            "fingerprint": self.fingerprint,
            "iters": {},
        }
        lineage["iters"][str(it)] = metrics
        self._write_lineage(lineage)

    def latest(self) -> tuple[int, rd.Dataset, dict[str, Any]] | None:
        """Highest complete iteration matching this run's fingerprint."""
        lineage = self._read_lineage()
        if lineage is None or lineage.get("fingerprint") != self.fingerprint:
            return None
        best = -1
        for name in os.listdir(self._root):
            if name.startswith("iter=") and not name.endswith(".tmp"):
                k = int(name.split("=", 1)[1])
                # resumable = data dir complete AND its metrics made it
                # into lineage.json — a crash between the _SUCCESS write
                # and the lineage write leaves a complete-looking dir
                # with no metrics; fall back to the previous iteration
                if os.path.exists(
                    os.path.join(self._root, name, "_SUCCESS")
                ) and str(k) in lineage["iters"]:
                    best = max(best, k)
        if best < 0:
            return None
        ds = rd.read_parquet(os.path.join(self._root, f"iter={best}"))
        metrics = lineage["iters"][str(best)]
        return best, ds, metrics
