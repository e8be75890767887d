"""Greedy max-coverage corpus selection (submodular data curation).

Pick the k documents that together cover the most distinct k-gram
shingle hashes — the lazy-greedy facility-location/max-cover selection
used to curate diverse training subsets (each pick maximizes MARGINAL
new coverage, the 1-1/e-approximate submodular greedy). Deterministic:
gain ties break to the smaller doc_id; hashes are the engine's
mod-2^31-1 Horner chain, so a SQL oracle replays the whole greedy
trajectory exactly.

Scale shape: the text is scanned ONCE into a (doc_id, h) per-doc
distinct shingle table (the only stage that touches raw text); each of
the k rounds is one stateless pass over that table against the
broadcast covered-hash array (sorted int64, searchsorted membership —
ships via ray.put once per round) + one bucketed per-doc combine + a
per-block argmax fold (driver sees #blocks rows, never the gain
table). The covered array grows by at most one document's distinct
shingles per round, so driver state is O(k x max-doc-shingles).
k passes over the shingle table is the documented cost — k is small
(a selection budget), the corpus is what's large.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data as rd

from parallel_pagerank_ray.stages.agg import grouped_agg, resolve_num_buckets


def coverage_select(
    docs: rd.Dataset,
    k: int = 10,
    shingle_k: int = 8,
    num_buckets: int | None = None,
) -> rd.Dataset:
    """(rank, doc_id, gain): the greedy max-coverage selection of up to
    ``k`` docs; rank 1-based in pick order, gain = number of distinct
    shingle hashes the pick adds. Stops early when no document adds
    coverage."""
    from parallel_pagerank_ray.functions import hashing as H

    if k < 1:
        raise ValueError("k >= 1")
    if num_buckets is None:
        num_buckets = resolve_num_buckets(docs)
    import ray as _ray

    def shingles(b: pd.DataFrame) -> pd.DataFrame:
        ids = []
        hs = []
        for doc_id, text in zip(
            b["doc_id"].astype(np.int64), b["text"].astype(str)
        ):
            u = np.unique(H.shingle_hashes31(text, shingle_k))
            ids.append(np.full(len(u), doc_id, dtype=np.int64))
            hs.append(u.astype(np.int64))
        e = np.array([], dtype=np.int64)
        return pd.DataFrame(
            {
                "doc_id": np.concatenate(ids) if ids else e,
                "h": np.concatenate(hs) if hs else e,
            }
        )

    sh = (
        docs.select_columns(["doc_id", "text"])
        .map_batches(shingles, batch_format="pandas")
        .materialize()
    )

    covered = np.array([], dtype=np.int64)
    picks: list[tuple[int, int, int]] = []
    for rank in range(1, k + 1):
        ref = _ray.put(covered)

        def partial(b: dict[str, np.ndarray]) -> dict[str, np.ndarray]:
            cov = _ray.get(ref)
            h = b["h"]
            m = np.ones(len(h), dtype=bool)
            if len(cov):
                pos = np.searchsorted(cov, h)
                ok = pos < len(cov)
                hit = np.zeros(len(h), dtype=bool)
                hit[ok] = cov[pos[ok]] == h[ok]
                m = ~hit
            d, c = np.unique(b["doc_id"][m], return_counts=True)
            return {"doc_id": d, "gain": c.astype(np.int64)}

        gains = grouped_agg(
            sh.map_batches(partial, batch_format="numpy"),
            ["doc_id"],
            {"gain": ("gain", "sum")},
            num_buckets=num_buckets,
        )

        def best(b: dict[str, np.ndarray]) -> dict[str, np.ndarray]:
            if len(b["doc_id"]) == 0:
                return {
                    "doc_id": np.array([], np.int64),
                    "gain": np.array([], np.int64),
                }
            # max gain, tie -> min doc_id
            i = np.lexsort((b["doc_id"], -b["gain"]))[0]
            return {
                "doc_id": b["doc_id"][i : i + 1],
                "gain": b["gain"][i : i + 1],
            }

        tops = gains.map_batches(best, batch_format="numpy").take_all()
        if not tops:
            break
        win = min(tops, key=lambda r: (-int(r["gain"]), int(r["doc_id"])))
        gain, doc = int(win["gain"]), int(win["doc_id"])
        if gain <= 0:  # pragma: no cover - partial() never emits zeros
            break
        picks.append((rank, doc, gain))
        new_rows = sh.filter(expr=f"doc_id == {doc}").take_all()
        new_h = np.array([r["h"] for r in new_rows], dtype=np.int64)
        covered = np.union1d(covered, new_h)

    return rd.from_arrow(
        pa.table(
            {
                "rank": pa.array([p[0] for p in picks], pa.int64()),
                "doc_id": pa.array([p[1] for p in picks], pa.int64()),
                "gain": pa.array([p[2] for p in picks], pa.int64()),
            }
        )
    )
