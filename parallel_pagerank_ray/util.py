"""Small Dataset utilities."""

from __future__ import annotations

import ray
import ray.data as rd


def drop_empty_blocks(ds: rd.Dataset) -> rd.Dataset:
    """Materialize and drop zero-row blocks.

    ``groupby().map_groups()`` emits one schema-less empty block per
    empty sort partition; ``Dataset.join`` (hash shuffle) rejects such
    blocks on the build side ("No match ... for key field"). This keeps
    only non-empty blocks without moving any rows (refs only; metadata
    is inspected via the developer API, falling back to fetching blocks
    if it changes shape across Ray versions).
    """
    mat = ds.materialize()
    refs: list = []
    try:
        for bundle in mat.iter_internal_ref_bundles():
            for block_ref, meta in zip(bundle.block_refs, bundle.metadata):
                if meta.num_rows is None or meta.num_rows > 0:
                    refs.append(block_ref)
    except AttributeError:  # developer API moved; fall back to fetching
        all_refs = mat.to_arrow_refs()
        refs = [r for r, t in zip(all_refs, ray.get(all_refs)) if t.num_rows > 0]
    if not refs:
        return mat
    return rd.from_arrow_refs(refs)


def pull_table(ds: rd.Dataset, cols: list[str]):
    """Driver pull of a SMALL dataset as one Arrow table of exactly
    ``cols`` (callers guard size first). Empty blocks out of join
    chains can carry stale pre-projection schemas (the
    safe_join/drop_empty_blocks failure mode), so each block is
    re-projected before the concat; an all-empty dataset returns an
    empty table with the right columns."""
    import pyarrow as pa

    blocks = [
        t.select(cols) for t in ray.get(ds.to_arrow_refs()) if t.num_rows
    ]
    if blocks:
        return pa.concat_tables(blocks)
    return pa.table({c: pa.array([], pa.int64()) for c in cols})


def count_rows_once(ds: rd.Dataset) -> tuple[int, rd.Dataset]:
    """(row_count, dataset) without executing a lazy chain twice.

    ``Dataset.count()`` on an unmaterialized chain runs the whole
    upstream once — and a broadcast-vs-join guard that counts, then
    executes the chosen path, scans the input twice. Probe the
    metadata first (free for parquet reads / simple projections); only
    when the plan cannot answer from metadata, materialize ONCE and
    return the materialized dataset so the caller's chosen path reuses
    the same blocks."""
    from parallel_pagerank_ray.stages.csr_store import edge_count_hint

    hint = edge_count_hint(ds)
    if hint is not None:
        return hint, ds
    mat = ds.materialize()
    return mat.count(), mat


def anti_join(
    left: rd.Dataset,
    right: rd.Dataset,
    on: str,
    right_on: str | None = None,
    broadcast_max: int = 5_000_000,
    num_partitions: int | None = None,
) -> rd.Dataset:
    """Rows of ``left`` whose ``on`` key does NOT appear in ``right`` —
    the blocklist/decontamination filter shape.

    Scale shape: the distinct right-key set broadcasts once via
    ``ray.put`` while it fits ``broadcast_max`` (blocklists are small
    by nature), and each left batch filters with one vectorized
    ``np.isin`` — zero shuffles, left never moves. Beyond the guard it
    degrades to one hash left_outer join + null filter (same results;
    tested by shrinking the guard)."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.compute as pc

    from parallel_pagerank_ray.stages.agg import distinct

    right_on = right_on or on
    keys = distinct(right.select_columns([right_on]), [right_on])
    n_keys, keys = count_rows_once(keys)
    if n_keys <= broadcast_max:
        parts = [
            t.column(right_on).to_numpy()
            for t in ray.get(keys.to_arrow_refs())
            if t.num_rows
        ]
        arr = np.sort(np.concatenate(parts)) if parts else np.array([])
        key_ref = ray.put(arr)

        def drop(t: pa.Table) -> pa.Table:
            # block is pre-sorted at broadcast: membership is one
            # searchsorted per batch (np.isin would re-sort the whole
            # key array inside every task)
            block = ray.get(key_ref)
            vals = t.column(on).to_numpy()
            if len(block) == 0:
                return t
            pos = np.minimum(
                np.searchsorted(block, vals), len(block) - 1
            )
            return t.filter(pa.array(block[pos] != vals))

        return left.map_batches(drop, batch_format="pyarrow")

    # scale fallback: hash join with a marker column, keep null marker
    from parallel_pagerank_ray.pipelines.graph_build import (
        _default_join_partitions,
    )

    if num_partitions is None:
        num_partitions = _default_join_partitions()

    def mark(t: pa.Table) -> pa.Table:
        return t.append_column(
            "__present", pa.array(np.ones(t.num_rows, dtype=np.int8))
        )

    marked = keys.map_batches(mark, batch_format="pyarrow")
    joined = safe_join(
        left,
        marked,
        join_type="left_outer",
        num_partitions=num_partitions,
        on=(on,),
        right_on=(right_on,),
    )

    def keep_missing(t: pa.Table) -> pa.Table:
        return t.filter(pc.is_null(t.column("__present"))).drop_columns(
            ["__present"]
            + ([right_on] if right_on != on and right_on in t.column_names else [])
        )

    return joined.map_batches(keep_missing, batch_format="pyarrow")


def _strip_meta(t) -> "object":
    """Zero-copy schema-metadata strip (shares all buffers). Parquet-
    and pandas-origin blocks carry a b'pandas' metadata dict that makes
    ``pyarrow.Schema`` UNHASHABLE, so Ray 2.49's hash-shuffle join logs
    'Failed to hash the schemas (for deduplication)' per aggregator and
    skips its schema dedup. Fused into the upstream execution, so it
    adds no extra pass."""
    return t.replace_schema_metadata(None) if t.schema.metadata else t


def safe_join(
    left: rd.Dataset,
    right: rd.Dataset,
    join_type: str,
    num_partitions: int,
    on: tuple,
    right_on: tuple | None = None,
) -> rd.Dataset:
    """``Dataset.join`` with empty-block compaction on both sides.

    Ray 2.49's hash-shuffle join raises ``ArrowInvalid: No match ... for
    key field`` when a side contains a zero-row block with an empty
    schema (produced by map_groups / flat-map stages that emit nothing
    for some partitions). Compacting refs first costs one
    materialization per side but no row movement.
    """
    left = left.map_batches(_strip_meta, batch_format="pyarrow")
    right = right.map_batches(_strip_meta, batch_format="pyarrow")
    return drop_empty_blocks(left).join(
        drop_empty_blocks(right),
        join_type=join_type,
        num_partitions=num_partitions,
        on=on,
        right_on=right_on,
    )
