"""Deduplication operators for training-data pipelines.

Beyond-reference capabilities (the reference keeps duplicate edges,
/root/reference/pagerank_mpi/csr_graph.c:49-57, and has no document
dedup at all). Five methods over a ``documents``-shaped table
(``doc_id:int64, text:string, ...``):

- ``exact_dedup``        — content-hash groupby: one shuffle keyed by
                           md5(text); keeper = min doc_id per group.
- ``shingle_jaccard_pairs`` — exact k-char-shingle Jaccard for every
                           pair inside a partition key (``group_col``),
                           i.e. blocked pairwise dedup. At 100 TB the
                           block key is the LSH bucket / domain / shard;
                           only in-block pairs are ever materialized.
- ``minhash_lsh_candidates`` — shingle -> MinHash(num_perm) -> band
                           fold -> groupby(band, key) -> in-bucket
                           pairs. The standard near-dup scale path: one
                           shuffle of (bands x docs) small rows, never
                           O(n^2).
- ``simhash_candidates`` — 64-bit SimHash, banded by 16-bit prefix
                           chunks (a Hamming-<=k lookup must collide on
                           at least one of 4 bands when k <= 3; larger k
                           is a recall heuristic), verified in-bucket by
                           exact Hamming distance.
- ``embedding_near_dup`` — cosine >= threshold pairs inside a bucket
                           column (cluster / LSH bucket), vectorized
                           numpy matmul per group.

Partitioning assumptions are explicit: blocked methods only compare
within ``group_col`` — the caller picks a key whose blocks fit one
worker (source/domain at test scale, LSH bucket at web scale).
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data as rd

from parallel_pagerank_ray.functions import hashing as H
from parallel_pagerank_ray.stages.agg import (
    distinct,
    grouped_agg,
    pairs_within_groups,
    resolve_num_buckets,
)
from parallel_pagerank_ray.util import drop_empty_blocks


def add_fingerprint(docs: rd.Dataset) -> rd.Dataset:
    """(doc_id, fingerprint=md5(text)) — the exact-dedup shuffle key."""

    def fp(batch: pa.Table) -> pa.Table:
        texts = batch.column("text").to_pylist()
        return pa.table(
            {
                "doc_id": batch.column("doc_id"),
                "fingerprint": pa.array(
                    [hashlib.md5(t.encode("utf-8")).hexdigest() for t in texts],
                    type=pa.string(),
                ),
            }
        )

    return docs.map_batches(fp, batch_format="pyarrow")


def exact_dedup(docs: rd.Dataset) -> rd.Dataset:
    """Hash-partition by content hash; keep min doc_id per group.

    Output: (fingerprint, keeper, n_dups). Single groupby shuffle on the
    16-byte hash — at 100 TB this moves only (hash, id) pairs, never the
    text.
    """
    return grouped_agg(
        add_fingerprint(docs),
        ["fingerprint"],
        {"keeper": ("doc_id", "min"), "n_dups": ("doc_id", "count")},
    )


def _distinct_shingles(text: str, k: int) -> set[str]:
    if len(text) < k:
        return {text} if text else set()
    return {text[i : i + k] for i in range(len(text) - k + 1)}


def shingle_jaccard_pairs(
    docs: rd.Dataset, k: int = 5, group_col: str = "source"
) -> rd.Dataset:
    """Exact k-char-shingle Jaccard for every in-block pair.

    Output: (doc_a, doc_b, jaccard) for doc_a < doc_b sharing
    ``group_col``. Blocked pairwise comparison — the all-pairs cost is
    bounded per block, and blocks shuffle independently.
    """

    def pairs(group: pd.DataFrame) -> pd.DataFrame:
        g = group.sort_values("doc_id").reset_index(drop=True)
        ids = g["doc_id"].to_numpy()
        sets = [_distinct_shingles(t, k) for t in g["text"]]
        a_out: list[int] = []
        b_out: list[int] = []
        j_out: list[float] = []
        for i in range(len(ids)):
            for jx in range(i + 1, len(ids)):
                inter = len(sets[i] & sets[jx])
                union = len(sets[i]) + len(sets[jx]) - inter
                a_out.append(int(ids[i]))
                b_out.append(int(ids[jx]))
                j_out.append(inter / union if union else 1.0)
        return pd.DataFrame(
            {
                "doc_a": np.array(a_out, dtype=np.int64),
                "doc_b": np.array(b_out, dtype=np.int64),
                "jaccard": np.array(j_out, dtype=np.float64),
            }
        )

    out = (
        docs.select_columns(["doc_id", "text", group_col])
        .groupby(group_col)
        .map_groups(pairs, batch_format="pandas")
    )
    return drop_empty_blocks(out)


class _SignatureStage:
    """Per-doc MinHash signature + LSH band keys (callable batch stage).

    MinHash permutation params are built ONCE in __init__ (on the
    driver; the instance ships in the task closure), not per batch. The whole batch is hashed with
    vectorized mod-2^31-1 arithmetic (hashing.shingle_hashes31 /
    minhash_signatures31) — no per-doc/per-band Python loops — and the
    identical arithmetic is expressible in DuckDB SQL, so the candidate
    set is value-checkable end to end (__ray_entry__ oracle)."""

    def __init__(self, num_perm: int, bands: int, k: int, seed: int = 42) -> None:
        self.a, self.b = H.minhash_params31(num_perm, seed=seed)
        self.bands = bands
        self.k = k

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_numpy()
        texts = batch.column("text").to_pylist()
        hash_lists = [H.shingle_hashes31(t, self.k) for t in texts]
        sig = H.minhash_signatures31(hash_lists, self.a, self.b)
        k1, k2 = H.band_keys31(sig, self.bands)
        B = self.bands
        return pa.table(
            {
                "band": pa.array(
                    np.tile(np.arange(B, dtype=np.int32), len(ids))
                ),
                "key1": pa.array(k1.reshape(-1).view(np.int64)),
                "key2": pa.array(k2.reshape(-1).view(np.int64)),
                "doc_id": pa.array(np.repeat(ids, B)),
            }
        )


def _lsh_signature_rows(
    docs: rd.Dataset,
    num_perm: int,
    bands: int,
    k: int,
    concurrency: int | None,
) -> rd.Dataset:
    """Shared (band, key1, key2, doc_id) row stage for the LSH candidate
    and overflow-telemetry queries."""
    return docs.select_columns(["doc_id", "text"]).map_batches(
        _SignatureStage(num_perm=num_perm, bands=bands, k=k),
        batch_format="pyarrow",
        concurrency=concurrency,
    )


def minhash_lsh_candidates(
    docs: rd.Dataset,
    num_perm: int = 128,
    bands: int = 16,
    k: int = 5,
    concurrency: int | None = None,
    max_bucket: int | None = None,
) -> rd.Dataset:
    """MinHash + LSH near-dup candidate pairs: (doc_a, doc_b), doc_a < doc_b.

    shingle -> signature (task map; the ~2 KB permutation params are
    built once on the driver and shipped inside the task closure — an
    actor pool's spin-up cost buys nothing for state this small) ->
    explode to (band, key, doc_id) rows -> groupby bucket -> in-bucket
    pairs -> global pair dedup (second groupby). Both shuffles move only
    small integer rows. ``concurrency=None`` lets every CPU run the
    signature stage (fixed caps serialize at high core counts).

    ``max_bucket``: hub-skew guard — an LSH bucket (band, key1, key2)
    holding MORE than this many docs emits no pairs. A templated page
    shared by 10M docs would otherwise force 5e13 in-bucket pairs in one
    group; true near-dup pairs still surface through their other bands.
    The drop is a pure function of bucket size (deterministic,
    SQL-reproducible); dropped buckets are observable via
    ``lsh_bucket_overflow``.
    """
    sig_rows = _lsh_signature_rows(docs, num_perm, bands, k, concurrency)

    # meta-bucket the (band, key) LSH buckets so each map_groups call
    # handles thousands of buckets vectorized (pairs_within_groups) —
    # one Python call per tiny bucket is ~1 ms x O(docs*bands) otherwise.
    # mb is a pure function of the bucket tuple, so a bucket never
    # splits across meta-groups; exactness comes from the tuple grouping
    # inside bucket_pairs.
    meta = 64

    def add_meta(b: pa.Table) -> pa.Table:
        k1 = b.column("key1").to_numpy().view(np.uint64)
        k2 = b.column("key2").to_numpy().view(np.uint64)
        band = b.column("band").to_numpy().astype(np.int64)
        mb = (
            k1 ^ (k2 * np.uint64(0x9E3779B9)) ^ (band.view(np.uint64) * np.uint64(0x85EBCA6B))
        ) % np.uint64(meta)
        return b.append_column("mb", pa.array(mb.astype(np.int64)))

    def bucket_pairs(group: pd.DataFrame) -> pd.DataFrame:
        band = group["band"].to_numpy().astype(np.int64)
        key1 = group["key1"].to_numpy()
        key2 = group["key2"].to_numpy()
        ids = group["doc_id"].to_numpy()
        # exact (band, key1, key2) tuple grouping — a folded composite
        # hash could merge distinct LSH buckets on a collision and emit
        # spurious pairs. One doc appears at most once per (band, key)
        # tuple, so the run length IS the bucket's doc count and
        # max_group enforces the global per-bucket cap here with no
        # extra shuffle.
        a, b = pairs_within_groups(
            (band, key1, key2, ids), ids, max_group=max_bucket
        )
        return pd.DataFrame({"doc_a": a, "doc_b": b})

    pairs = (
        sig_rows.map_batches(add_meta, batch_format="pyarrow")
        .groupby("mb")
        .map_groups(bucket_pairs, batch_format="pandas")
    )
    return distinct(drop_empty_blocks(pairs), ["doc_a", "doc_b"])


def lsh_bucket_overflow(
    docs: rd.Dataset,
    num_perm: int = 128,
    bands: int = 16,
    k: int = 5,
    max_bucket: int = 1000,
    concurrency: int | None = None,
) -> rd.Dataset:
    """Overflow telemetry for ``minhash_lsh_candidates(max_bucket=...)``:
    (band, key1, key2, size) for every LSH bucket whose doc count
    exceeds the cap — i.e. exactly the buckets the candidate kernel
    drops. One bucketed grouped_agg over the small signature rows;
    integer-exact and SQL-reproducible."""
    import pyarrow.compute as pc

    sig_rows = _lsh_signature_rows(docs, num_perm, bands, k, concurrency)
    sizes = grouped_agg(
        sig_rows,
        ["band", "key1", "key2"],
        {"size": ("doc_id", "count")},
    )

    def over(t: pa.Table) -> pa.Table:
        return t.filter(pc.greater(t.column("size"), max_bucket))

    return sizes.map_batches(over, batch_format="pyarrow")


class _SimhashStage:
    """Callable batch stage: 64-bit SimHash per doc, exploded into
    16-bit prefix-band rows for Hamming-bucketed candidate generation.

    Fingerprints are batch-vectorized (hashing.simhash_batch): md5 per
    distinct token, one reduceat vote tally — no per-doc bit loops. The
    md5-u64 token hash is DuckDB-expressible, making the (doc_a, doc_b,
    hamming) output value-checkable (__ray_entry__ oracle)."""

    def __init__(self, num_bands: int = 4) -> None:
        import re

        from parallel_pagerank_ray.functions.textstats import TOKEN_RE

        self.token = re.compile(TOKEN_RE)
        self.num_bands = num_bands

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_numpy()
        texts = batch.column("text").to_pylist()
        token_lists = [self.token.findall(t.lower()) for t in texts]
        fp = H.simhash_batch(token_lists)  # (D,) uint64
        B = self.num_bands
        keys = (
            (fp[:, None] >> (np.uint64(16) * np.arange(B, dtype=np.uint64)))
            & np.uint64(0xFFFF)
        ).astype(np.int64)  # (D, B)
        return pa.table(
            {
                "band": pa.array(np.tile(np.arange(B, dtype=np.int32), len(ids))),
                "key": pa.array(keys.reshape(-1)),
                "doc_id": pa.array(np.repeat(ids, B)),
                "simhash": pa.array(np.repeat(fp.view(np.int64), B)),
            }
        )


def simhash_candidates(
    docs: rd.Dataset, max_hamming: int = 8, concurrency: int | None = None
) -> rd.Dataset:
    """SimHash near-dup pairs: (doc_a, doc_b, hamming), hamming <= max.

    Bucketing: docs colliding on any 16-bit prefix band are compared by
    exact Hamming distance (complete for hamming <= 3 by pigeonhole over
    4 bands; a recall heuristic above that). Pair dedup keeps min
    hamming (identical for all copies of a pair). The fingerprint stage
    runs as a task map — its only state (one compiled regex) ships in
    the task closure, so no actor pool spin-up.
    """
    rows = docs.select_columns(["doc_id", "text"]).map_batches(
        _SimhashStage(), batch_format="pyarrow", concurrency=concurrency
    )

    meta = 64

    def add_meta(b: pa.Table) -> pa.Table:
        k = b.column("key").to_numpy()
        band = b.column("band").to_numpy().astype(np.int64)
        mb = (
            k.view(np.uint64) ^ (band.view(np.uint64) * np.uint64(0x9E3779B9))
        ) % np.uint64(meta)
        return b.append_column("mb", pa.array(mb.astype(np.int64)))

    def bucket_pairs(group: pd.DataFrame) -> pd.DataFrame:
        band = group["band"].to_numpy().astype(np.int64)
        key = group["key"].to_numpy()
        ids = group["doc_id"].to_numpy()
        sims = group["simhash"].to_numpy().astype(np.int64).view(np.uint64)
        idx = np.arange(len(ids))
        ai, bi = pairs_within_groups((band, key, ids), idx)
        empty = {
            "doc_a": np.array([], dtype=np.int64),
            "doc_b": np.array([], dtype=np.int64),
            "hamming": np.array([], dtype=np.int64),
        }
        if len(ai) == 0:
            return pd.DataFrame(empty)
        ham = H.hamming64(sims[ai], sims[bi]).astype(np.int64)
        keep = ham <= max_hamming
        if not keep.any():
            return pd.DataFrame(empty)
        return pd.DataFrame(
            {"doc_a": ids[ai][keep], "doc_b": ids[bi][keep], "hamming": ham[keep]}
        )

    pairs = (
        rows.map_batches(add_meta, batch_format="pyarrow")
        .groupby("mb")
        .map_groups(bucket_pairs, batch_format="pandas")
    )
    return grouped_agg(
        drop_empty_blocks(pairs),
        ["doc_a", "doc_b"],
        {"hamming": ("hamming", "min")},
    )


def embedding_near_dup(
    embs: rd.Dataset,
    threshold: float,
    bucket_col: str = "label",
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> rd.Dataset:
    """Cosine-similarity >= threshold pairs inside each bucket.

    Output: (vec_a, vec_b) with vec_a < vec_b. Pairwise work is blocked
    by ``bucket_col`` (a cluster id / LSH bucket at scale); within a
    bucket it is one float64 matmul, not a Python loop.
    """

    def pairs(group: pd.DataFrame) -> pd.DataFrame:
        g = group.sort_values(id_col)
        ids = g[id_col].to_numpy()
        empty = {
            "vec_a": np.array([], dtype=np.int64),
            "vec_b": np.array([], dtype=np.int64),
        }
        if len(ids) < 2:
            return pd.DataFrame(empty)
        mat = np.asarray([np.asarray(v, dtype=np.float64) for v in g[vec_col]])
        norms = np.linalg.norm(mat, axis=1, keepdims=True)
        norms[norms == 0] = 1.0
        sims = (mat / norms) @ (mat / norms).T
        i, j = np.triu_indices(len(ids), k=1)
        keep = sims[i, j] >= threshold
        if not keep.any():
            return pd.DataFrame(empty)
        return pd.DataFrame({"vec_a": ids[i][keep], "vec_b": ids[j][keep]})

    out = (
        embs.select_columns([id_col, vec_col, bucket_col])
        .groupby(bucket_col)
        .map_groups(pairs, batch_format="pandas")
    )
    return drop_empty_blocks(out)


def winnow_fingerprints(
    docs: rd.Dataset, k: int = 8, w: int = 4
) -> rd.Dataset:
    """Winnowing document fingerprints (Schleimer–Wilkerson–Aiken,
    SIGMOD'03): (doc_id, pos, fp) — per doc, the distinct
    rightmost-tie minima over every window of ``w`` consecutive
    k-char-gram hashes (the MOSS plagiarism-detection fingerprint,
    the standard rolling-hash doc signature for containment/overlap
    detection where MinHash only captures whole-document similarity).

    Scale shape: stateless flat-map (no shuffle); output is ~2/(w+1)
    of the k-gram stream. Hashes are the engine's mod-2^31-1 Horner
    chain, so selection is integer-exact and the DuckDB oracle
    reproduces every row (hash-gated)."""

    def stage(b: pd.DataFrame) -> pd.DataFrame:
        ids: list[np.ndarray] = []
        poss: list[np.ndarray] = []
        fps: list[np.ndarray] = []
        for doc_id, text in zip(
            b["doc_id"].astype(np.int64), b["text"].astype(str)
        ):
            h = H.shingle_hashes31(text, k)
            pos, fp = H.winnow_select(h, w)
            ids.append(np.full(len(pos), doc_id, dtype=np.int64))
            poss.append(pos)
            fps.append(fp.astype(np.int64))
        e = np.array([], dtype=np.int64)
        return pd.DataFrame(
            {
                "doc_id": np.concatenate(ids) if ids else e,
                "pos": np.concatenate(poss) if poss else e,
                "fp": np.concatenate(fps) if fps else e,
            }
        )

    return docs.select_columns(["doc_id", "text"]).map_batches(
        stage, batch_format="pandas"
    )


def winnow_candidates(
    docs: rd.Dataset,
    k: int = 8,
    w: int = 4,
    min_shared: int = 2,
    num_buckets: int | None = None,
    max_df: int | None = None,
) -> rd.Dataset:
    """Near-dup/containment candidates from shared winnowing
    fingerprints: (doc_a, doc_b, shared) with doc_a < doc_b and
    shared >= ``min_shared`` distinct fingerprints in common.

    Shape: distinct (doc_id, fp) first (a fp repeated inside one doc
    counts once), pair generation with the bucketed in-group kernel
    keyed on fp.

    ``max_df``: hub-skew guard — a fingerprint whose doc frequency
    exceeds the cap emits NO pairs (boilerplate/license-header
    fingerprints shared by millions of docs would otherwise go
    quadratic inside one group). The bucket key is ``fp % num_buckets``
    so a fingerprint's full posting lands in ONE group and the in-group
    run length IS its global df — the cap is enforced exactly with no
    extra shuffle, deterministically (pure function of df), and the
    DuckDB oracle reproduces it with one HAVING clause. Dropped
    fingerprints are observable via ``winnow_overflow``."""
    dfp = distinct(winnow_fingerprints(docs, k=k, w=w), ["doc_id", "fp"])
    if num_buckets is None:
        from parallel_pagerank_ray.stages.agg import resolve_num_buckets

        num_buckets = resolve_num_buckets(dfp)

    def bucketed(b: dict[str, np.ndarray]) -> dict[str, np.ndarray]:
        b["__b"] = (b["fp"] % num_buckets).astype(np.int64)
        return b

    def pairs(g: pd.DataFrame) -> pd.DataFrame:
        a, b2 = pairs_within_groups(
            (g["fp"].to_numpy(), g["doc_id"].to_numpy()),
            g["doc_id"].to_numpy(),
            max_group=max_df,
        )
        out = (
            pd.DataFrame({"doc_a": a, "doc_b": b2})
            .groupby(["doc_a", "doc_b"], sort=False)
            .size()
            .reset_index(name="shared")
        )
        out["shared"] = out["shared"].astype(np.int64)
        return out

    counts = grouped_agg(
        dfp.map_batches(bucketed, batch_format="numpy")
        .groupby("__b")
        .map_groups(pairs, batch_format="pandas"),
        ["doc_a", "doc_b"],
        {"shared": ("shared", "sum")},
        num_buckets=num_buckets,
    )

    def thresh(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        return t.filter(pc.greater_equal(t.column("shared"), min_shared))

    return counts.map_batches(thresh, batch_format="pyarrow")


def winnow_overflow(
    docs: rd.Dataset, k: int = 8, w: int = 4, max_df: int = 1000
) -> rd.Dataset:
    """Overflow telemetry for ``winnow_candidates(max_df=...)``:
    (fp, df) for every winnowing fingerprint whose doc frequency
    exceeds the cap — exactly the fingerprints the candidate kernel
    drops. One bucketed grouped_agg over the distinct (doc_id, fp)
    rows; integer-exact and SQL-reproducible."""
    import pyarrow.compute as pc

    dfp = distinct(winnow_fingerprints(docs, k=k, w=w), ["doc_id", "fp"])
    sizes = grouped_agg(dfp, ["fp"], {"df": ("doc_id", "count")})

    def over(t: pa.Table) -> pa.Table:
        return t.filter(pc.greater(t.column("df"), max_df))

    return sizes.map_batches(over, batch_format="pyarrow")


def contamination_flags(
    docs: rd.Dataset,
    benchmark_docs: rd.Dataset,
    k: int = 16,
    broadcast_max: int = 50_000_000,
) -> rd.Dataset:
    """Benchmark decontamination: (doc_id, n_hits, contaminated) —
    n_hits = number of k-char-gram POSITIONS in the doc whose hash
    appears anywhere in the benchmark corpus (the standard n-gram
    overlap rule for removing eval-set contamination from training
    data). Integer-exact, SQL-gated.

    Shape: the benchmark side is small by definition (an eval set) —
    its distinct shingle hashes are collected once and broadcast via
    ray.put. Beyond ``broadcast_max`` hashes the set is split into
    sorted hash-RANGE chunks of at most ``broadcast_max`` each, every
    chunk placed in plasma separately, and each corpus task folds its
    membership counts chunk by chunk (disjoint ranges sum exactly) —
    the operator degrades instead of failing, matching the broadcast
    guard contract used elsewhere (host_cocitation, revenue_by_nation).
    The corpus side is one stateless map: vectorized shingle hashing +
    searchsorted membership per chunk. No shuffle at all.
    """
    import ray

    bench_parts = [
        np.unique(
            np.concatenate(
                [H.shingle_hashes31(t, k) for t in b["text"].astype(str)]
            )
            if len(b)
            else np.array([], dtype=np.uint64)
        )
        for b in benchmark_docs.select_columns(["text"]).iter_batches(
            batch_format="pandas"
        )
    ]
    bench = (
        np.unique(np.concatenate(bench_parts))
        if bench_parts
        else np.array([], dtype=np.uint64)
    )
    # sorted hash-range chunks, each <= broadcast_max (usually one)
    n_chunks = max(1, -(-len(bench) // broadcast_max))
    chunk_refs = [
        ray.put(np.ascontiguousarray(c)) for c in np.array_split(bench, n_chunks)
    ]

    def flag(b: pd.DataFrame) -> pd.DataFrame:
        ids = b["doc_id"].astype(np.int64).to_numpy()
        hits = np.zeros(len(ids), dtype=np.int64)
        doc_hashes = [H.shingle_hashes31(t, k) for t in b["text"].astype(str)]
        for ref in chunk_refs:
            bh = ray.get(ref)
            if not len(bh):
                continue
            for i, h in enumerate(doc_hashes):
                pos = np.searchsorted(bh, h)
                ok = pos < len(bh)
                hits[i] += int(np.count_nonzero(bh[pos[ok]] == h[ok]))
        return pd.DataFrame(
            {"doc_id": ids, "n_hits": hits, "contaminated": hits > 0}
        )

    return docs.select_columns(["doc_id", "text"]).map_batches(
        flag, batch_format="pandas"
    )


def dedup_keepers(
    docs: rd.Dataset,
    candidate_pairs: rd.Dataset,
    pair_cols: tuple[str, str] = ("doc_a", "doc_b"),
    broadcast_max: int = 5_000_000,
) -> rd.Dataset:
    """The dedup ENDGAME: collapse near-dup candidate pairs into
    clusters and pick one keeper per cluster — (doc_id, keeper) for
    EVERY doc in ``docs`` (and only those), keeper = min doc_id in its
    connected component of the candidate graph (isolated docs keep
    themselves). Compose with any candidate generator (MinHash-LSH,
    SimHash, winnowing, embedding near-dup).

    Shape: only docs that appear in a candidate pair enter the CC — the
    paired ids are densified first (``assign_int_ids``), so the BSP
    component vectors are sized by the CANDIDATE set, never by
    max(doc_id): sparse/hashed 64-bit ids cost nothing, and ids absent
    from ``docs`` never produce phantom rows. While the paired set fits
    ``broadcast_max`` (the common case — candidates ≪ corpus) the whole
    cluster->keeper resolution folds driver-side in numpy and attaches
    to the corpus via ONE broadcast map (zero joins); beyond the guard
    it degrades to hash joins + a distributed min-per-component
    aggregate (same results, tested by shrinking the guard)."""
    import ray

    from parallel_pagerank_ray.pipelines.components_actors import (
        connected_components_bsp,
    )
    from parallel_pagerank_ray.pipelines.graph_build import (
        Graph,
        _default_join_partitions,
        assign_int_ids,
    )
    from parallel_pagerank_ray.util import safe_join

    a, b = pair_cols

    def self_keeper(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        ids64 = pc.cast(t.column("doc_id"), pa.int64())
        return pa.table({"doc_id": ids64, "keeper": ids64})

    # one empty typed block unioned onto every return path so an empty
    # corpus still yields the (doc_id, keeper) int64 schema
    schema_block = rd.from_arrow(
        pa.table(
            {
                "doc_id": pa.array([], type=pa.int64()),
                "keeper": pa.array([], type=pa.int64()),
            }
        )
    )

    endpoints = (
        candidate_pairs.select_columns([a])
        .rename_columns({a: "doc_id"})
        .union(candidate_pairs.select_columns([b]).rename_columns({b: "doc_id"}))
    )
    vmap = assign_int_ids(distinct(endpoints, ["doc_id"])).materialize()
    m = vmap.count()
    docs_ids = docs.select_columns(["doc_id"])
    if m == 0:  # no candidates (or empty corpus): everyone keeps themselves
        return schema_block.union(
            docs_ids.map_batches(self_keeper, batch_format="pyarrow")
        )

    if m <= broadcast_max:
        vt = pa.concat_tables(
            [t for t in ray.get(vmap.to_arrow_refs()) if t.num_rows]
        ).combine_chunks()
        doc_ids = vt.column("doc_id").to_numpy()
        vids = vt.column("vid").to_numpy()
        doc_of = np.empty(m, dtype=np.int64)  # dense vid -> original doc_id
        doc_of[vids] = doc_ids
        idx = pd.Index(doc_ids)
        map_ref = ray.put((idx, vids))

        def to_dense(df: pd.DataFrame) -> pd.DataFrame:
            ix, vv = ray.get(map_ref)
            return pd.DataFrame(
                {
                    "src": vv[ix.get_indexer(df[a].to_numpy())],
                    "dst": vv[ix.get_indexer(df[b].to_numpy())],
                }
            )

        edges = candidate_pairs.select_columns([a, b]).map_batches(
            to_dense, batch_format="pandas"
        )
        g = Graph(n=m, edges=edges.materialize())
        comp_rows = pa.concat_tables(
            [
                t
                for t in ray.get(
                    connected_components_bsp(g).components.materialize()
                    .to_arrow_refs()
                )
                if t.num_rows
            ]
        ).combine_chunks()
        cvid = comp_rows.column("vid").to_numpy()
        ccomp = comp_rows.column("comp").to_numpy()
        # keeper per component = min ORIGINAL doc_id (dense assignment
        # is not order-preserving, so min dense vid is not enough)
        keeper_of = np.full(m, np.iinfo(np.int64).max, dtype=np.int64)
        np.minimum.at(keeper_of, ccomp, doc_of[cvid])
        keeper_by_doc = np.empty(m, dtype=np.int64)
        keeper_by_doc[cvid] = keeper_of[ccomp]
        keep_ref = ray.put((idx, keeper_by_doc[vids]))

        def attach(df: pd.DataFrame) -> pd.DataFrame:
            ix, kp = ray.get(keep_ref)
            ids = df["doc_id"].to_numpy().astype(np.int64)
            pos = ix.get_indexer(ids)
            out = ids.copy()  # isolated docs keep themselves
            hit = pos >= 0
            out[hit] = kp[pos[hit]]
            return pd.DataFrame({"doc_id": ids, "keeper": out})

        return schema_block.union(
            docs_ids.map_batches(attach, batch_format="pandas")
        )

    # scale fallback: hash joins end to end, no driver vectors
    nparts = _default_join_partitions()
    e1 = safe_join(
        candidate_pairs.select_columns([a, b]),
        vmap,
        join_type="inner",
        num_partitions=nparts,
        on=(a,),
        right_on=("doc_id",),
    ).rename_columns({"vid": "src"})
    edges = (
        safe_join(
            e1.select_columns([b, "src"]),
            vmap,
            join_type="inner",
            num_partitions=nparts,
            on=(b,),
            right_on=("doc_id",),
        )
        .rename_columns({"vid": "dst"})
        .select_columns(["src", "dst"])
    )
    g = Graph(n=m, edges=edges.materialize())
    comp = connected_components_bsp(g).components  # (vid, comp)
    withdoc = safe_join(
        comp,
        vmap,
        join_type="inner",
        num_partitions=nparts,
        on=("vid",),
    )  # (vid, comp, doc_id)
    keepers = grouped_agg(
        withdoc.select_columns(["comp", "doc_id"]),
        ["comp"],
        {"keeper": ("doc_id", "min")},
    )
    paired = safe_join(
        withdoc.select_columns(["doc_id", "comp"]),
        keepers,
        join_type="inner",
        num_partitions=nparts,
        on=("comp",),
    ).select_columns(["doc_id", "keeper"])
    joined = safe_join(
        docs_ids,
        paired.rename_columns({"doc_id": "p_doc_id"}),
        join_type="left_outer",
        num_partitions=nparts,
        on=("doc_id",),
        right_on=("p_doc_id",),
    )

    def coalesce(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        ids64 = pc.cast(t.column("doc_id"), pa.int64())
        kp = pc.coalesce(pc.cast(t.column("keeper"), pa.int64()), ids64)
        return pa.table({"doc_id": ids64, "keeper": kp})

    return schema_block.union(joined.map_batches(coalesce, batch_format="pyarrow"))


def dup_span_stats(
    docs: rd.Dataset, k: int = 20, num_buckets: int | None = None
) -> rd.Dataset:
    """Per-document duplicated-substring mass (the exact-substring
    dedup statistic of Lee et al., "Deduplicating Training Data Makes
    Language Models Better", ACL'22): a k-char window POSITION counts
    as duplicated when its hash occurs at >= 2 positions anywhere in
    the corpus — in another document or elsewhere in the same one.
    Output: (doc_id, n_windows, dup_windows, dup_frac), dup_frac a
    single exact-integer DOUBLE division.

    Scale shape: the text is scanned ONCE — a stateless map emits
    per-doc (h, c) partials where c is the number of positions of
    hash h inside the doc, so in-doc repeats collapse before anything
    moves and the raw text never shuffles. The only wide exchange is
    one hash-keyed bucket shuffle of those partials: each bucket holds
    every occurrence row of its hashes, so the in-bucket kernel knows
    each hash's GLOBAL position count, marks the duplicated ones, and
    folds per-doc (windows, duplicated) sums — then one doc_id-keyed
    grouped_agg combines the ~one-row-per-(doc, bucket) partials.
    Hashes are the engine's mod-2^31-1 Horner chain, so counts are
    integer-exact and the DuckDB oracle reproduces them (hash
    collisions are consistent on both sides by construction).
    """

    def spans(b: pd.DataFrame) -> pd.DataFrame:
        ids: list[np.ndarray] = []
        hs: list[np.ndarray] = []
        cs: list[np.ndarray] = []
        for doc_id, text in zip(
            b["doc_id"].astype(np.int64), b["text"].astype(str)
        ):
            uniq, cnt = np.unique(H.shingle_hashes31(text, k), return_counts=True)
            ids.append(np.full(len(uniq), doc_id, dtype=np.int64))
            hs.append(uniq.astype(np.int64))
            cs.append(cnt.astype(np.int64))
        e = np.array([], dtype=np.int64)
        return pd.DataFrame(
            {
                "doc_id": np.concatenate(ids) if ids else e,
                "h": np.concatenate(hs) if hs else e,
                "c": np.concatenate(cs) if cs else e,
            }
        )

    t = docs.select_columns(["doc_id", "text"]).map_batches(
        spans, batch_format="pandas"
    )
    if num_buckets is None:
        num_buckets = resolve_num_buckets(t)

    def bucketed(b: dict[str, np.ndarray]) -> dict[str, np.ndarray]:
        b["__b"] = (b["h"] % num_buckets).astype(np.int64)
        return b

    def fold(g: pd.DataFrame) -> pd.DataFrame:
        tot = g.groupby("h")["c"].transform("sum").to_numpy()
        c = g["c"].to_numpy()
        part = pd.DataFrame(
            {"doc_id": g["doc_id"], "w": c, "d": c * (tot >= 2)}
        )
        return part.groupby("doc_id", as_index=False)[["w", "d"]].sum()

    per = (
        drop_empty_blocks(t.map_batches(bucketed, batch_format="numpy"))
        .groupby("__b")
        .map_groups(fold, batch_format="pandas")
    )
    agg = grouped_agg(
        per,
        ["doc_id"],
        {"n_windows": ("w", "sum"), "dup_windows": ("d", "sum")},
        num_buckets=num_buckets,
    )

    def frac(tt: pa.Table) -> pa.Table:
        nw = tt.column("n_windows").to_numpy().astype(np.int64)
        dw = tt.column("dup_windows").to_numpy().astype(np.int64)
        return tt.append_column(
            "dup_frac", pa.array(dw / nw, type=pa.float64())
        )

    return agg.map_batches(frac, batch_format="pyarrow")


def shingle_novelty(docs: rd.Dataset, k: int = 5) -> rd.Dataset:
    """Per-document novelty against everything crawled BEFORE it
    (doc_id order): (doc_id, n_shingles, n_novel, novelty) where
    n_shingles = the doc's distinct k-gram shingle count, n_novel =
    shingles whose GLOBAL first occurrence (min doc_id) is this doc,
    novelty = n_novel / n_shingles (one exact-operand division).

    The dedup-curriculum statistic (how much genuinely new text a doc
    adds — boilerplate-heavy pages score ~0); the streaming analogue
    of exact dedup that needs no per-order state: "first occurrence"
    is an order-free grouped MIN over the shingle table. Scale shape:
    one stateless shingle flat-map (text never leaves it), one
    bucketed grouped min keyed on the shingle hash, then two tiny
    per-doc aggregates + one join of #docs-sized tables.
    """
    import pyarrow.compute as pc

    from parallel_pagerank_ray.functions.hashing import shingle_hashes31
    from parallel_pagerank_ray.pipelines.graph_build import (
        _default_join_partitions,
    )
    from parallel_pagerank_ray.stages.agg import grouped_agg
    from parallel_pagerank_ray.util import safe_join

    def sh_rows(b: pd.DataFrame) -> pd.DataFrame:
        ids: list[np.ndarray] = []
        hs: list[np.ndarray] = []
        for did, text in zip(b["doc_id"].to_numpy(), b["text"].to_numpy()):
            h = np.unique(shingle_hashes31(str(text), k=k))
            ids.append(np.full(len(h), did, dtype=np.int64))
            hs.append(h.astype(np.int64))
        if not ids:
            return pd.DataFrame(
                {
                    "doc_id": pd.Series([], dtype=np.int64),
                    "h": pd.Series([], dtype=np.int64),
                }
            )
        return pd.DataFrame(
            {"doc_id": np.concatenate(ids), "h": np.concatenate(hs)}
        )

    rows = docs.select_columns(["doc_id", "text"]).map_batches(
        sh_rows, batch_format="pandas"
    )
    firsts = grouped_agg(rows, ["h"], {"first_doc": ("doc_id", "min")})
    novel = grouped_agg(
        firsts.rename_columns({"first_doc": "doc_id"}),
        ["doc_id"],
        {"n_novel": ("h", "count")},
    )
    totals = grouped_agg(rows, ["doc_id"], {"n_shingles": ("h", "count")})
    j = safe_join(
        totals,
        novel.rename_columns({"doc_id": "__d"}),
        join_type="left_outer",
        num_partitions=_default_join_partitions(),
        on=("doc_id",),
        right_on=("__d",),
    )

    def fin(df: pd.DataFrame) -> pd.DataFrame:
        tot = df["n_shingles"].astype(np.int64).to_numpy()
        nov = df["n_novel"].fillna(0).astype(np.int64).to_numpy()
        return pd.DataFrame(
            {
                "doc_id": df["doc_id"].astype(np.int64),
                "n_shingles": tot,
                "n_novel": nov,
                "novelty": nov / tot,
            }
        )

    return j.map_batches(fin, batch_format="pandas")


def _word_shingle_rows(docs: rd.Dataset, k: int) -> rd.Dataset:
    """(doc_id, shingle) rows — DISTINCT lowercase word k-grams per doc.

    Tokens are ``[A-Za-z0-9_]+`` runs (textstats.TOKEN_RE — the
    SQL-reproducible tokenizer); a shingle is k consecutive tokens
    joined by one space. Docs with fewer than k tokens emit nothing.
    Stateless flat map; the regex compiles once per task closure.
    """
    import re

    from parallel_pagerank_ray.functions.textstats import TOKEN_RE

    token_re = re.compile(TOKEN_RE)

    def stage(b: pd.DataFrame) -> pa.Table:
        ids: list[int] = []
        shs: list[str] = []
        for doc_id, text in zip(b["doc_id"], b["text"]):
            toks = token_re.findall(str(text).lower())
            ss = {
                " ".join(toks[i : i + k])
                for i in range(len(toks) - k + 1)
            }
            ids.extend([int(doc_id)] * len(ss))
            shs.extend(ss)
        return pa.table(
            {
                "doc_id": pa.array(ids, pa.int64()),
                "shingle": pa.array(shs, pa.string()),
            }
        )

    return docs.select_columns(["doc_id", "text"]).map_batches(
        stage, batch_format="pandas"
    )


def set_similarity_join(
    docs: rd.Dataset,
    k: int = 5,
    tau_num: int = 1,
    tau_den: int = 2,
    num_buckets: int | None = None,
    max_group: int | None = None,
    broadcast_max: int = 2_000_000,
) -> rd.Dataset:
    """EXACT Jaccard-threshold self-join over word-k-shingle sets with
    df-ordered prefix filtering (the PPJoin family's lossless filter).

    Output: (doc_a, doc_b, inter, size_a, size_b) for every doc pair
    with Jaccard(A, B) = inter/union >= tau_num/tau_den, doc_a < doc_b —
    all-integer, so the DuckDB all-pairs oracle matches hash-exact.
    Unlike ``minhash_lsh_candidates`` (probabilistic recall) or
    ``shingle_jaccard_pairs`` (caller-blocked), this is the exact
    global join.

    Scale shape (beyond-reference; the reference has no set-similarity
    operator): a doc's CANDIDATE key set is only its prefix — the
    p = s - ceil(tau*s) + 1 globally RAREST shingles under the total
    order (df ASC, shingle ASC). Two sets with J >= tau must share a
    prefix shingle (pigeonhole on the ceil(tau*s) suppressed suffix), so
    the filter is lossless; prefix shingle groups are rare by
    construction, so candidate generation never touches the boilerplate
    head of the df distribution. Stages: one shingle flat-map, then
    exactly THREE bucketed shuffles of small rows — (1) by shingle:
    df attached as a per-group transform (no separate groupby + join),
    (2) by doc: the per-doc prefix prune (vectorized cumcount mask),
    (3) by shingle: in-bucket pair generation (pairs_within_groups,
    same kernel as LSH; exact in-group shingle identity via factorize,
    no hash folding) with the set sizes CARRIED on the pair rows so no
    size-attach join ever runs — then exact verification = two joins +
    one grouped count over candidate x shingle rows only. No O(n^2)
    step; cost tracks candidate volume, which the length filter
    (den*min_size >= num*max_size) additionally prunes.

    Contract: run ``exact_dedup`` first at crawl scale — exact-duplicate
    clusters legitimately produce quadratic output (every pair has
    J = 1), so the pair count is a property of the data, not the
    algorithm. ``max_group`` mirrors the LSH hub guard for the
    candidate stage (prefix-shingle groups larger than the cap emit no
    pairs; recall-affecting, telemetry via the returned drop being
    observable in a df query — default None = exact).

    ``broadcast_max``: when the RAW candidate-pair volume is under the
    bound, verification runs driver-side in pandas on only the
    candidate docs' shingle rows (semi-filtered by a broadcast doc-id
    set — one streaming pass, no shuffle); past it, the distributed
    path (distinct -> two joins -> grouped count) computes the
    identical rows and is force-tested equal at bound 0.
    """
    from parallel_pagerank_ray.pipelines.graph_build import (
        _default_join_partitions,
    )
    from parallel_pagerank_ray.util import safe_join

    if not (0 < tau_num <= tau_den):
        raise ValueError("need 0 < tau_num/tau_den <= 1")
    nparts = _default_join_partitions()
    tok = _word_shingle_rows(docs, k).materialize()
    if num_buckets is None:
        num_buckets = resolve_num_buckets(tok)

    from parallel_pagerank_ray.stages.agg import bucket_of

    # shuffle 1 (by shingle): every row of a shingle lands in one
    # bucket, so df is a local per-group transform — no groupby + join
    def sh_bucket(b: pd.DataFrame) -> pd.DataFrame:
        if len(b) == 0:
            return pd.DataFrame()
        b = b.copy()
        b["__b"] = bucket_of(b, ["shingle"], num_buckets)
        return b

    def with_df(g: pd.DataFrame) -> pd.DataFrame:
        g = g.drop(columns="__b").copy()
        g["df"] = (
            g.groupby("shingle", sort=False)["doc_id"]
            .transform("size")
            .astype(np.int64)
        )
        return g

    wd = (
        tok.map_batches(sh_bucket, batch_format="pandas")
        .groupby("__b")
        .map_groups(with_df, batch_format="pandas")
    )

    # shuffle 2 (by doc): per-doc prefix = the p rarest shingles under
    # the (df ASC, shingle ASC) total order
    def doc_bucket(b: pd.DataFrame) -> pd.DataFrame:
        if len(b) == 0:
            return pd.DataFrame()
        b = b.copy()
        b["__b"] = bucket_of(b, ["doc_id"], num_buckets)
        return b

    def prefix(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(
            ["doc_id", "df", "shingle"], kind="stable"
        ).reset_index(drop=True)
        grp = g.groupby("doc_id", sort=False)
        s = grp["shingle"].transform("size").to_numpy(np.int64)
        pos = grp.cumcount().to_numpy(np.int64)
        p = s - (tau_num * s + tau_den - 1) // tau_den + 1
        keep = pos < p
        out = g.loc[keep, ["doc_id", "shingle"]].copy()
        out["s"] = s[keep]
        return out

    pre = (
        wd.map_batches(doc_bucket, batch_format="pandas")
        .groupby("__b")
        .map_groups(prefix, batch_format="pandas")
    )

    # shuffle 3 (by shingle): pairs within each prefix-shingle group.
    # In-group shingle identity via factorize (exact string grouping,
    # no hash folding); ids ascend within a group, so pairs come out
    # canonical doc_a < doc_b, and each side's set size rides along so
    # the output needs no size-attach join.
    def cand_pairs(g: pd.DataFrame) -> pd.DataFrame:
        if len(g) == 0:
            return pd.DataFrame(
                {
                    "doc_a": np.array([], np.int64),
                    "doc_b": np.array([], np.int64),
                    "size_a": np.array([], np.int64),
                    "size_b": np.array([], np.int64),
                }
            )
        g = g.drop(columns="__b")
        codes = pd.factorize(g["shingle"], sort=False)[0].astype(np.int64)
        ids = g["doc_id"].to_numpy(np.int64)
        ss = g["s"].to_numpy(np.int64)
        a, b = pairs_within_groups((codes, ids), ids, max_group=max_group)
        sa, sb = pairs_within_groups((codes, ids), ss, max_group=max_group)
        # length filter: J >= tau needs min_size*den >= max_size*num
        m = np.minimum(sa, sb) * tau_den >= np.maximum(sa, sb) * tau_num
        return pd.DataFrame(
            {"doc_a": a[m], "doc_b": b[m], "size_a": sa[m], "size_b": sb[m]}
        )

    raw = drop_empty_blocks(
        pre.map_batches(sh_bucket, batch_format="pandas")
        .groupby("__b")
        .map_groups(cand_pairs, batch_format="pandas")
    )

    empty = rd.from_arrow(
        pa.table(
            {
                "doc_a": pa.array([], pa.int64()),
                "doc_b": pa.array([], pa.int64()),
                "inter": pa.array([], pa.int64()),
                "size_a": pa.array([], pa.int64()),
                "size_b": pa.array([], pa.int64()),
            }
        )
    )
    from parallel_pagerank_ray.util import count_rows_once

    n_raw, raw = count_rows_once(raw)
    if n_raw == 0:
        return empty

    if n_raw <= broadcast_max:
        # fast path: candidates fit the driver bound. Pull the pairs,
        # semi-filter the shingle table to candidate docs with ONE
        # broadcast streaming pass (no shuffle), verify with vectorized
        # pandas merges — identical rows to the distributed tail below
        # (force-tested at bound 0).
        import ray as _ray

        cdf = (
            pa.concat_tables(
                _ray.get(raw.to_arrow_refs()), promote_options="default"
            )
            .to_pandas()
            .drop_duplicates(["doc_a", "doc_b"])
        )
        doc_ids = np.unique(
            np.concatenate(
                [cdf["doc_a"].to_numpy(np.int64), cdf["doc_b"].to_numpy(np.int64)]
            )
        )
        ids_ref = _ray.put(doc_ids)

        def semi(t: pa.Table) -> pa.Table:
            import ray as _r

            keep_ids = _r.get(ids_ref)
            d = t.column("doc_id").to_numpy(zero_copy_only=False)
            pos = np.searchsorted(keep_ids, d)
            ok = pos < len(keep_ids)
            m = np.zeros(len(d), dtype=bool)
            m[ok] = keep_ids[pos[ok]] == d[ok]
            return t.filter(pa.array(m))

        tdf = pa.concat_tables(
            _ray.get(
                tok.map_batches(semi, batch_format="pyarrow")
                .materialize()
                .to_arrow_refs()
            ),
            promote_options="default",
        ).to_pandas()
        m1 = cdf.merge(
            tdf.rename(columns={"doc_id": "doc_a"}), on="doc_a"
        )
        m2 = m1.merge(
            tdf.rename(columns={"doc_id": "doc_b"}), on=["doc_b", "shingle"]
        )
        grp = (
            m2.groupby(["doc_a", "doc_b", "size_a", "size_b"], sort=False)
            .size()
            .reset_index(name="inter")
        )
        it = grp["inter"].to_numpy(np.int64)
        sa = grp["size_a"].to_numpy(np.int64)
        sb = grp["size_b"].to_numpy(np.int64)
        mth = it * tau_den >= tau_num * (sa + sb - it)
        return rd.from_arrow(
            pa.table(
                {
                    "doc_a": pa.array(
                        grp["doc_a"].to_numpy(np.int64)[mth], pa.int64()
                    ),
                    "doc_b": pa.array(
                        grp["doc_b"].to_numpy(np.int64)[mth], pa.int64()
                    ),
                    "inter": pa.array(it[mth], pa.int64()),
                    "size_a": pa.array(sa[mth], pa.int64()),
                    "size_b": pa.array(sb[mth], pa.int64()),
                }
            )
        )

    cands = distinct(
        raw,
        ["doc_a", "doc_b", "size_a", "size_b"],
        num_buckets=num_buckets,
    ).materialize()

    # exact verify: |A ∩ B| = matched (candidate, shingle) rows; the
    # carried sizes ride through both joins and the grouped count
    ca = safe_join(
        cands,
        tok.rename_columns({"doc_id": "__a"}),
        join_type="inner",
        num_partitions=nparts,
        on=("doc_a",),
        right_on=("__a",),
    )
    matched = safe_join(
        ca,
        tok.rename_columns({"doc_id": "__d", "shingle": "__sh"}),
        join_type="inner",
        num_partitions=nparts,
        on=("doc_b", "shingle"),
        right_on=("__d", "__sh"),
    )
    inter = grouped_agg(
        matched.select_columns(["doc_a", "doc_b", "size_a", "size_b"]),
        ["doc_a", "doc_b", "size_a", "size_b"],
        {"inter": ("doc_a", "count")},
        num_buckets=num_buckets,
    )

    def thresh(t: pa.Table) -> pa.Table:
        it = t.column("inter").to_numpy(zero_copy_only=False)
        sa = t.column("size_a").to_numpy(zero_copy_only=False)
        sb = t.column("size_b").to_numpy(zero_copy_only=False)
        m = it * tau_den >= tau_num * (sa + sb - it)
        return pa.table(
            {
                "doc_a": t.column("doc_a").filter(pa.array(m)),
                "doc_b": t.column("doc_b").filter(pa.array(m)),
                "inter": pa.array(it[m], pa.int64()),
                "size_a": pa.array(sa[m], pa.int64()),
                "size_b": pa.array(sb[m], pa.int64()),
            }
        )

    out = inter.map_batches(thresh, batch_format="pyarrow")
    return drop_empty_blocks(out)


def contrastive_pairs(
    docs: rd.Dataset,
    neg_attempts: int = 2,
    salt: str = "cp",
    num_buckets: int | None = None,
) -> rd.Dataset:
    """Deterministic contrastive training table over the corpus:
    (doc_a, doc_b, label) with label 1 = MinHash-LSH near-duplicate
    candidate pairs (the positives an embedding/reranker trainer mines
    from a crawl) and label 0 = hash-sampled verified NON-candidate
    pairs — the text analogue of ``linkpred_training_set``.

    Rules (all md5/mod-p keyed, replayed verbatim by the SQL oracle):
      positives  ``minhash_lsh_candidates(docs)`` (doc_a < doc_b)
      negatives  per positive and attempt j in 1..neg_attempts,
                 u = md5_u64(f"{salt}|a|doc_a|doc_b|j") % n_docs,
                 v = md5_u64(f"{salt}|b|doc_a|doc_b|j") % n_docs,
                 canonicalized, self-pairs dropped, candidate pairs
                 removed by packed anti-join, deduplicated — realized
                 count <= neg_attempts x positives (the standard
                 rejection-sampling contract).

    Requires dense doc_ids in [0, n_docs) (the corpus contract).
    Scale shape: positives = the LSH pipeline (banded, hub-cappable);
    negatives = a bounded flat-map + ONE packed anti-join; doc text
    never moves beyond the LSH signature stage.
    """
    from parallel_pagerank_ray.functions.hashing import md5_u64
    from parallel_pagerank_ray.stages.agg import distinct, global_agg
    from parallel_pagerank_ray.util import anti_join

    if num_buckets is None:
        num_buckets = resolve_num_buckets(docs)
    empty = rd.from_arrow(
        pa.table(
            {
                "doc_a": pa.array([], pa.int64()),
                "doc_b": pa.array([], pa.int64()),
                "label": pa.array([], pa.int64()),
            }
        )
    )
    mx = global_agg(docs.select_columns(["doc_id"]), {"m": ("doc_id", "max")})
    if mx["m"] is None:
        return empty
    n_docs = int(mx["m"]) + 1
    pos = minhash_lsh_candidates(docs).materialize()
    if pos.count() == 0:
        return empty

    def pos_rows(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "doc_a": t.column("doc_a"),
                "doc_b": t.column("doc_b"),
                "label": pa.array(
                    np.ones(t.num_rows, dtype=np.int64), pa.int64()
                ),
            }
        )

    def neg_candidates(t: pa.Table) -> pa.Table:
        a = t.column("doc_a").to_numpy(zero_copy_only=False)
        b = t.column("doc_b").to_numpy(zero_copy_only=False)
        us, vs = [], []
        for x, y in zip(a, b):
            for j in range(1, neg_attempts + 1):
                us.append(md5_u64(f"{salt}|a|{x}|{y}|{j}") % n_docs)
                vs.append(md5_u64(f"{salt}|b|{x}|{y}|{j}") % n_docs)
        u = np.array(us, dtype=np.int64)
        v = np.array(vs, dtype=np.int64)
        lo = np.minimum(u, v)
        hi = np.maximum(u, v)
        m = lo != hi
        return pa.table(
            {
                "doc_a": pa.array(lo[m], pa.int64()),
                "doc_b": pa.array(hi[m], pa.int64()),
            }
        )

    def pack(bt: dict[str, np.ndarray]) -> dict[str, np.ndarray]:
        bt["__key"] = bt["doc_a"] * np.int64(n_docs) + bt["doc_b"]
        return bt

    negs = distinct(
        anti_join(
            pos.map_batches(neg_candidates, batch_format="pyarrow")
            .map_batches(pack, batch_format="numpy"),
            pos.map_batches(pack, batch_format="numpy").select_columns(
                ["__key"]
            ),
            on="__key",
        ).select_columns(["doc_a", "doc_b"]),
        ["doc_a", "doc_b"],
        num_buckets=num_buckets,
    )

    def neg_rows(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "doc_a": t.column("doc_a"),
                "doc_b": t.column("doc_b"),
                "label": pa.array(
                    np.zeros(t.num_rows, dtype=np.int64), pa.int64()
                ),
            }
        )

    return pos.map_batches(pos_rows, batch_format="pyarrow").union(
        drop_empty_blocks(negs.map_batches(neg_rows, batch_format="pyarrow"))
    )


def paragraph_dedup(
    docs: rd.Dataset,
    sep: str = "\n",
    num_buckets: int | None = None,
    max_pos: int = 1_000_000,
    broadcast_max: int = 50_000_000,
) -> rd.Dataset:
    """C4-style exact cross-document paragraph dedup (Raffel et al.
    2020 deduplicate repeated spans corpus-wide; this is the paragraph
    variant): every distinct paragraph keeps only its globally-FIRST
    occurrence — min (doc_id, position) — and each document is
    reassembled from its surviving paragraphs in original order
    (possibly to the empty string). The classic boilerplate-stripping
    pass of a crawl pipeline: navigation chrome / repeated legal
    footers collapse to one occurrence.

    Scale shape: one vectorized flat-map split (doc_id, pos, para),
    one bucketed min combine keyed by the paragraph string (winner
    pk = doc_id * max_pos + pos), winner-pk set broadcast (8 B per
    distinct paragraph, one plasma copy) + searchsorted membership
    per batch, one doc-bucketed reassembly; above ``broadcast_max``
    distinct paragraphs the winner set hash-joins back instead.
    Deterministic and SQL-replayable (string_split +
    generate_subscripts + min-over-pk replay the same construction).
    """
    import ray

    from parallel_pagerank_ray.util import safe_join

    if num_buckets is None:
        num_buckets = resolve_num_buckets(docs)
    mp = np.int64(max_pos)

    def split_rows(df: pd.DataFrame) -> pd.DataFrame:
        parts = df["text"].astype(str).str.split(sep)
        lens = parts.str.len().to_numpy().astype(np.int64)
        if lens.size and int(lens.max()) >= max_pos:
            raise ValueError(
                f"paragraph_dedup needs < {max_pos} paragraphs per doc"
            )
        doc = np.repeat(df["doc_id"].to_numpy().astype(np.int64), lens)
        total = int(lens.sum())
        csum = np.concatenate(([0], np.cumsum(lens)[:-1]))
        pos = np.arange(total, dtype=np.int64) - np.repeat(csum, lens)
        para = np.concatenate(parts.to_numpy()) if total else np.array([], object)
        return pd.DataFrame(
            {"doc_id": doc, "pos": pos, "para": para, "pk": doc * mp + pos}
        )

    occ = docs.select_columns(["doc_id", "text"]).map_batches(
        split_rows, batch_format="pandas"
    ).materialize()
    winners = grouped_agg(
        occ.select_columns(["para", "pk"]),
        ["para"],
        {"wpk": ("pk", "min")},
        num_buckets=num_buckets,
    ).materialize()
    n_win = winners.count()
    if n_win <= broadcast_max:
        from parallel_pagerank_ray.util import pull_table

        wpks = np.sort(
            pull_table(winners, ["wpk"]).column("wpk").to_numpy(
                zero_copy_only=False
            )
        )
        ref = ray.put(wpks)

        def keep(df: pd.DataFrame) -> pd.DataFrame:
            w = ray.get(ref)
            pk = df["pk"].to_numpy()
            if not len(w):
                return df.iloc[0:0]
            p = np.minimum(np.searchsorted(w, pk), len(w) - 1)
            return df[w[p] == pk]

        kept = occ.map_batches(keep, batch_format="pandas")
    else:  # pragma: no cover - exercised via shrunken bound in tests
        j = safe_join(
            occ,
            winners.rename_columns({"para": "__p"}),
            join_type="inner",
            num_partitions=8,
            on=("para",),
            right_on=("__p",),
        )
        kept = j.filter(expr="pk == wpk").select_columns(
            ["doc_id", "pos", "para"]
        )

    def bucketed(df: pd.DataFrame) -> pd.DataFrame:
        df = df[["doc_id", "pos", "para"]].copy()
        df["__b"] = df["doc_id"].to_numpy().astype(np.int64) % num_buckets
        return df

    def assemble(g: pd.DataFrame) -> pd.DataFrame:
        order = np.lexsort(
            (g["pos"].to_numpy(), g["doc_id"].to_numpy())
        )
        s = g.iloc[order]
        out = s.groupby("doc_id", sort=True)["para"].agg(sep.join)
        return pd.DataFrame(
            {"doc_id": out.index.to_numpy(np.int64), "text": out.to_numpy()}
        )

    assembled = (
        kept.map_batches(bucketed, batch_format="pandas")
        .groupby("__b")
        .map_groups(assemble, batch_format="pandas")
        # rename_columns downstream needs Arrow blocks, not the pandas
        # blocks map_groups emits
        .map_batches(lambda t: t, batch_format="pyarrow")
    )
    # docs whose every paragraph was stripped reassemble to ''
    out = safe_join(
        docs.select_columns(["doc_id"]),
        assembled.rename_columns({"doc_id": "__d"}),
        join_type="left_outer",
        num_partitions=8,
        on=("doc_id",),
        right_on=("__d",),
    )

    def fill(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        return pa.table(
            {
                "doc_id": t.column("doc_id"),
                "text": pc.coalesce(t.column("text"), pa.scalar("")),
            }
        )

    return drop_empty_blocks(out.map_batches(fill, batch_format="pyarrow"))
